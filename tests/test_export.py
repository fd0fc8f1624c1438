"""Resumable deterministic shard export (pipelines/export.py)."""

import glob
import hashlib
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from scrappy_ray.pipelines.export import export_shards

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus(n=200, parts=1):
    t = pa.table({"doc_id": list(range(n)),
                  "text": [f"doc {i} body" for i in range(n)]})
    return ray.data.from_arrow(t).repartition(parts)


def _file_hashes(d):
    return {
        os.path.basename(f): hashlib.md5(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(os.path.join(d, "shard-*.parquet")))
    }


def test_export_deterministic_across_layouts(tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    r1 = export_shards(_corpus(parts=1), a, num_shards=4)
    r2 = export_shards(_corpus(parts=7), b, num_shards=4)
    assert r1["rows"] == r2["rows"] == 200
    assert _file_hashes(a) == _file_hashes(b)  # byte-identical shards
    total = sum(pq.read_metadata(f).num_rows
                for f in glob.glob(os.path.join(a, "shard-*.parquet")))
    assert total == 200
    # every row routed once; shard content sorted by (key, id)
    ids = sorted(sum((pq.read_table(f)["doc_id"].to_pylist()
                      for f in glob.glob(os.path.join(a, "shard-*.parquet"))), []))
    assert ids == list(range(200))


def test_export_resume_skips_done_shards(tmp_path):
    out = str(tmp_path / "out")
    export_shards(_corpus(), out, num_shards=4)
    before = _file_hashes(out)
    # simulate a crash that lost one shard: marker + file gone
    os.remove(os.path.join(out, "_DONE.0002"))
    os.remove(os.path.join(out, "shard-0002.parquet"))
    r = export_shards(_corpus(), out, num_shards=4)
    assert r["written"] == [2]
    assert sorted(r["skipped"]) == [0, 1, 3]
    assert _file_hashes(out) == before  # rebuilt shard byte-identical
    # fully-done export is a no-op
    r2 = export_shards(_corpus(), out, num_shards=4)
    assert r2["written"] == [] and r2["rows"] == 0
    assert not os.path.isdir(os.path.join(out, "_export_parts"))
