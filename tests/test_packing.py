"""Sequence packing (concat-and-chunk) + deterministic shuffle tests."""

import re

import numpy as np
import pyarrow as pa
import pytest

import ray

from scrappy_ray.functions.packing import SEP_TOKEN, pack_sequences
from scrappy_ray.functions.sampling import KNUTH, deterministic_shuffle


def _ref_pack(texts_by_id: dict[int, str], T: int):
    """Pure-python reference: concat tokens (with separator) in id
    order, cut into T-token windows."""
    stream: list[str] = []
    for i in sorted(texts_by_id):
        stream.extend(re.split(r"\s+", texts_by_id[i].strip() + " " + SEP_TOKEN))
    out = []
    for w in range(0, len(stream), T):
        piece = stream[w:w + T]
        out.append({"seq_id": w // T, "text": " ".join(piece),
                    "n_tokens": len(piece)})
    return out


def _rows(ds):
    return sorted(ds.take_all(), key=lambda r: r["seq_id"])


def test_pack_sequences_matches_reference(ray_session):
    texts = {i: " ".join(f"w{i}_{j}" for j in range(5 + (i * 7) % 11))
             for i in range(40)}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[i] for i in sorted(texts)])})
    got = _rows(pack_sequences(ray.data.from_arrow(tbl), seq_tokens=16,
                               num_buckets=8))
    want = _ref_pack(texts, 16)
    assert [dict(r) for r in got] == want
    # every window full except possibly the last
    assert all(r["n_tokens"] == 16 for r in got[:-1])


def test_pack_sequences_layout_and_bucket_invariance(ray_session):
    texts = {i: " ".join(f"t{j}" for j in range((i * 13) % 17 + 1))
             for i in range(30)}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[i] for i in sorted(texts)])})
    want = _ref_pack(texts, 8)
    for nb, parts in [(1, 1), (5, 3), (16, 7)]:
        ds = ray.data.from_arrow(tbl).repartition(parts)
        got = _rows(pack_sequences(ds, seq_tokens=8, num_buckets=nb))
        assert [dict(r) for r in got] == want, (nb, parts)


def test_pack_sequences_empty_docs_and_sep(ray_session):
    # an empty document contributes ['', '<eod>'] — same as the oracle
    texts = {0: "a b c", 1: "", 2: "d"}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[i] for i in sorted(texts)])})
    got = _rows(pack_sequences(ray.data.from_arrow(tbl), seq_tokens=4,
                               num_buckets=2))
    want = _ref_pack(texts, 4)
    assert [dict(r) for r in got] == want
    joined = " ".join(r["text"] for r in got)
    assert joined.count(SEP_TOKEN) == 3


def test_pack_sequences_empty_input(ray_session):
    tbl = pa.table({"doc_id": pa.array([], pa.int64()),
                    "text": pa.array([], pa.string())})
    out = pack_sequences(ray.data.from_arrow(tbl), seq_tokens=8)
    assert out.count() == 0


def test_pack_sequences_id_range_hint(ray_session):
    texts = {i: f"x{i} y{i}" for i in range(10)}
    tbl = pa.table({"doc_id": pa.array(sorted(texts), pa.int64()),
                    "text": pa.array([texts[i] for i in sorted(texts)])})
    got = _rows(pack_sequences(ray.data.from_arrow(tbl), seq_tokens=5,
                               num_buckets=4, id_range=(0, 9)))
    assert [dict(r) for r in got] == _ref_pack(texts, 5)


def test_deterministic_shuffle_order_and_stability(ray_session):
    ids = np.arange(200, dtype=np.int64)
    tbl = pa.table({"doc_id": pa.array(ids)})
    out = deterministic_shuffle(ray.data.from_arrow(tbl).repartition(4),
                                salt=13).take_all()
    got_ids = [r["doc_id"] for r in out]
    # expected: sort by ((id+13)*K) % 2^32, tie-break id
    key = ((ids.astype(np.uint64) + np.uint64(13)) * np.uint64(KNUTH)) % (
        np.uint64(1) << np.uint64(32))
    want = ids[np.lexsort((ids, key))].tolist()
    assert got_ids == want
    assert sorted(got_ids) == ids.tolist()  # a permutation
    assert [r["shuffle_key"] for r in out] == sorted(key.astype(np.int64).tolist())
    # different salt ⇒ different (decorrelated) order
    out2 = deterministic_shuffle(ray.data.from_arrow(tbl), salt=14).take_all()
    assert [r["doc_id"] for r in out2] != got_ids
