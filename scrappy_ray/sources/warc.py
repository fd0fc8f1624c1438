"""WARC (Web ARChive, ISO 28500) source + sink — pure stdlib.

WARC is the container Common Crawl and every serious crawler archive
ship in: a stream of records, each a CRLF-framed header block
(``WARC/1.0`` + ``Name: value`` lines, mandatory ``Content-Length``)
followed by exactly ``Content-Length`` payload bytes and a blank-line
terminator. ``.warc.gz`` files gzip each record as its OWN member so a
reader can seek to any member boundary — the stdlib ``gzip`` module
decompresses multi-member streams transparently, which is all a
whole-file reader needs. Format reference: the public ISO 28500 /
IIPC WARC 1.1 spec; no third-party warc library is used (none exists
in this container).

Ray-Data-first shape:

- ``read_warc(paths)`` → ``ray.data.read_binary_files`` (one block per
  archive file — WARC files are written ~1 GiB each precisely so that
  file == work unit) → one vectorized ``map_batches`` parse producing
  ``(warc_type, record_id, target_uri, warc_date, content_type,
  http_status, http_content_type, payload)`` rows. HTTP response
  records additionally split the stored HTTP message into status /
  headers / body so downstream text stages get the body bytes
  directly.
- ``write_warc_datasink(ds, out_dir)`` → ``map_batches`` writer, one
  ``.warc.gz`` shard per input block (named by the block's minimum id —
  deterministic given a partitioning, resumable per shard), emitting
  one ``response`` record per row.

Parsing is per-record Python over header lines — bounded work per
record exactly like the multimodal decoders (the payload dominates and
is sliced, not scanned), and archives parallelize per-file.
"""

from __future__ import annotations

import gzip
import io
import zlib

import numpy as np
import pyarrow as pa

CRLF = b"\r\n"
_SCHEMA = pa.schema([
    ("warc_type", pa.string()),
    ("record_id", pa.string()),
    ("target_uri", pa.string()),
    ("warc_date", pa.string()),
    ("content_type", pa.string()),
    ("http_status", pa.int64()),
    ("http_content_type", pa.string()),
    ("payload", pa.binary()),
])


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # multi-member gzip: stdlib gzip concatenates members
        return gzip.decompress(data)
    return data


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes (plain or gzipped) into record
    dicts matching ``_SCHEMA``. Tolerates trailing garbage after the
    last well-formed record (truncated tail files), raises on a
    malformed header block."""
    data = _maybe_gunzip(data)
    out: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while data.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            break
        head_end = data.find(CRLF + CRLF, pos)
        if head_end < 0:
            break  # truncated tail
        head = data[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"not a WARC record header at byte {pos}: {lines[0][:40]!r}")
        fields: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(f"WARC record at byte {pos} lacks Content-Length") from e
        body = data[head_end + 4:head_end + 4 + clen]
        pos = head_end + 4 + clen
        rec = {
            "warc_type": fields.get("warc-type", ""),
            "record_id": fields.get("warc-record-id", ""),
            "target_uri": fields.get("warc-target-uri", ""),
            "warc_date": fields.get("warc-date", ""),
            "content_type": fields.get("content-type", ""),
            "http_status": None,
            "http_content_type": None,
            "payload": body,
        }
        if rec["warc_type"] == "response" and rec["content_type"].startswith("application/http"):
            status, ctype, http_body = _split_http(body)
            rec["http_status"], rec["http_content_type"] = status, ctype
            rec["payload"] = http_body
        out.append(rec)
    return out


def _split_http(msg: bytes) -> tuple[int | None, str | None, bytes]:
    """Split a stored HTTP response message into (status, content-type,
    body). Returns the raw message as body if it isn't HTTP-shaped."""
    head_end = msg.find(CRLF + CRLF)
    if head_end < 0 or not msg.startswith(b"HTTP/"):
        return None, None, msg
    lines = msg[:head_end].decode("utf-8", "replace").split("\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, None, msg
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, msg[head_end + 4:]


def read_warc(paths, types: tuple[str, ...] = ("response",), **read_kwargs):
    """WARC source: one Dataset row per record of the given WARC
    type(s). ``paths`` is a file/dir/list as accepted by
    ``ray.data.read_binary_files``; each archive file parses in one
    task (Common Crawl sizes archives ~1 GiB for exactly this file ==
    work-unit parallelism)."""
    import ray.data

    files = ray.data.read_binary_files(paths, **read_kwargs)
    want = set(types)

    def parse(batch: pa.Table) -> pa.Table:
        recs: list[dict] = []
        for blob in batch.column("bytes"):
            recs.extend(r for r in parse_warc_bytes(blob.as_py())
                        if not want or r["warc_type"] in want)
        return pa.Table.from_pylist(recs, schema=_SCHEMA)

    return files.map_batches(parse, batch_format="pyarrow")


def _record_bytes(url: str, payload: bytes, date: str, seq: int,
                  http_content_type: str = "text/html; charset=utf-8") -> bytes:
    http = (f"HTTP/1.1 200 OK\r\nContent-Type: {http_content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode() + payload
    head = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:uuid:{seq:032x}>\r\n"
        f"WARC-Date: {date}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return head + http + CRLF + CRLF


def write_warc_datasink(ds, out_dir: str, url_col: str = "url",
                        payload_col: str = "payload", id_col: str = "doc_id",
                        date: str = "2026-01-01T00:00:00Z",
                        compress: bool = True) -> int:
    """WARC sink: one ``.warc.gz`` shard per input block (named by the
    block's min id — deterministic given a partitioning, so a re-run
    overwrites rather than duplicates), each record its own gzip member
    per the WARC convention. Returns the number of records written."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    ext = "warc.gz" if compress else "warc"

    def write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"n": pa.array([], pa.int64())})
        ids = np.asarray(batch.column(id_col).cast(pa.int64()), dtype=np.int64)
        buf = io.BytesIO()
        for url, pay, i in zip(batch.column(url_col).to_pylist(),
                               batch.column(payload_col).to_pylist(), ids):
            raw = pay if isinstance(pay, bytes) else str(pay).encode()
            rec = _record_bytes(str(url), raw, date, int(i))
            if compress:
                gz = zlib.compressobj(6, zlib.DEFLATED, 16 + zlib.MAX_WBITS)
                buf.write(gz.compress(rec) + gz.flush())
            else:
                buf.write(rec)
        path = os.path.join(out_dir, f"part-{int(ids.min()):012d}.{ext}")
        with open(path, "wb") as f:
            f.write(buf.getvalue())
        return pa.table({"n": pa.array([batch.num_rows], pa.int64())})

    written = ds.map_batches(write, batch_format="pyarrow").sum("n")
    return int(written or 0)
