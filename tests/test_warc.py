"""WARC source/sink tests (pure-stdlib ISO 28500 reader/writer)."""

import gzip
import shutil

import pyarrow as pa
import pytest

import ray

from scrappy_ray.sources.warc import (
    _record_bytes,
    parse_warc_bytes,
    read_warc,
    write_warc_datasink,
)


def _mk(tmp_path, name, blobs, compress=False):
    p = tmp_path / name
    data = b"".join(blobs)
    p.write_bytes(gzip.compress(data) if compress else data)
    return str(p)


def test_parse_single_record():
    rec = _record_bytes("http://x.test/a", b"<html>hi</html>", "2026-01-01T00:00:00Z", 7)
    out = parse_warc_bytes(rec)
    assert len(out) == 1
    r = out[0]
    assert r["warc_type"] == "response"
    assert r["target_uri"] == "http://x.test/a"
    assert r["http_status"] == 200
    assert r["http_content_type"].startswith("text/html")
    assert r["payload"] == b"<html>hi</html>"


def test_parse_multi_and_gzip_members():
    recs = [_record_bytes(f"http://x.test/{i}", f"body{i}".encode(),
                          "2026-01-01T00:00:00Z", i) for i in range(5)]
    # plain concatenation
    out = parse_warc_bytes(b"".join(recs))
    assert [r["payload"] for r in out] == [f"body{i}".encode() for i in range(5)]
    # per-record gzip members concatenated (the .warc.gz convention)
    gz = b"".join(gzip.compress(r) for r in recs)
    out2 = parse_warc_bytes(gz)
    assert [r["target_uri"] for r in out2] == [f"http://x.test/{i}" for i in range(5)]


def test_parse_truncated_tail_and_malformed():
    rec = _record_bytes("http://x.test/a", b"ok", "2026-01-01T00:00:00Z", 1)
    out = parse_warc_bytes(rec + b"WARC/1.0\r\nWARC-Type: resp")  # truncated
    assert len(out) == 1
    with pytest.raises(ValueError):
        parse_warc_bytes(b"NOT-A-WARC\r\n\r\n")


def test_parse_non_response_record_filtered(tmp_path, ray_session):
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Type: application/warc-fields\r\n"
            b"Content-Length: 9\r\n\r\nrobots: x\r\n\r\n")
    rec = _record_bytes("http://x.test/a", b"hi", "2026-01-01T00:00:00Z", 1)
    path = _mk(tmp_path, "f.warc", [info, rec])
    rows = read_warc(path).take_all()
    assert len(rows) == 1 and rows[0]["target_uri"] == "http://x.test/a"
    rows_all = read_warc(path, types=()).take_all()
    assert {r["warc_type"] for r in rows_all} == {"warcinfo", "response"}


def test_roundtrip_dataset(tmp_path, ray_session):
    out_dir = str(tmp_path / "warcs")
    tbl = pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "url": pa.array([f"http://corpus.test/doc/{i}" for i in range(50)]),
        "payload": pa.array([f"text of doc {i} é".encode() for i in range(50)],
                            pa.binary()),
    })
    n = write_warc_datasink(ray.data.from_arrow(tbl).repartition(4), out_dir)
    assert n == 50
    back = read_warc(out_dir).take_all()
    assert len(back) == 50
    got = sorted((r["target_uri"], r["payload"]) for r in back)
    want = sorted((f"http://corpus.test/doc/{i}",
                   f"text of doc {i} é".encode()) for i in range(50))
    assert got == want
    assert all(r["http_status"] == 200 for r in back)
    shutil.rmtree(out_dir, ignore_errors=True)
