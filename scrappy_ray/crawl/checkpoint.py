"""Crawl checkpoint manifest + seen-set snapshots.

Layout under ``ckpt_dir``::

    manifest.json                   # rounds completed, metrics, config
    page_store/bucket=*/...         # hash-partitioned pages (one-time)
    round-0000/frontier/*.parquet   # items ready at the START of round r
    round-0000/extraction/*.parquet # per-document extraction output
    seen/round-0000/shard-*.bin     # seen-set snapshot AFTER round r
    budget/round-0000.json          # token-bucket state AFTER round r

A round r is complete iff the manifest lists it. Resume restores the
seen/budget snapshots of the last complete round and re-executes from
``round-{r+1}/frontier`` — re-running a half-finished round is
idempotent because every side effect (seen marks, parquet writes) is
reconstructed from the pre-round snapshot (lineage per partition:
each extraction file carries the round + frontier it derived from).

The reference has no crawl checkpointing at all (SURVEY.md §4); its
only memo is the Sesame repository read-through
(/root/reference/lib/scrappy/agent/agent.rb:165-213)."""

from __future__ import annotations

import json
import os


def round_dir(ckpt_dir: str, rnd: int) -> str:
    # NB: no '=' in the path — ray.data.read_parquet would hive-infer a
    # partition column from it and collide with the real 'round' column
    return os.path.join(ckpt_dir, f"round-{rnd:04d}")


def frontier_dir(ckpt_dir: str, rnd: int) -> str:
    return os.path.join(round_dir(ckpt_dir, rnd), "frontier")


def extraction_dir(ckpt_dir: str, rnd: int) -> str:
    return os.path.join(round_dir(ckpt_dir, rnd), "extraction")


def manifest_path(ckpt_dir: str) -> str:
    return os.path.join(ckpt_dir, "manifest.json")


def load_manifest(ckpt_dir: str) -> dict | None:
    p = manifest_path(ckpt_dir)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def save_manifest(ckpt_dir: str, manifest: dict) -> None:
    p = manifest_path(ckpt_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, p)  # atomic: a round is complete iff listed here


def save_seen_snapshot(ckpt_dir: str, rnd: int, snaps: list[bytes]) -> None:
    from ..state.seen import ROUTING

    d = os.path.join(ckpt_dir, "seen", f"round-{rnd:04d}")
    os.makedirs(d, exist_ok=True)
    # snapshots are per-shard state, valid only under the routing that
    # produced them — stamp (routing, num_shards) once per checkpoint
    rp = os.path.join(ckpt_dir, "seen", "ROUTING")
    if not os.path.exists(rp):
        with open(rp, "w") as f:
            f.write(f"{ROUTING}:{len(snaps)}")
    for i, b in enumerate(snaps):
        with open(os.path.join(d, f"shard-{i}.bin"), "wb") as f:
            f.write(b)


def check_seen_routing(ckpt_dir: str, num_shards: int) -> None:
    """Refuse to resume seen snapshots written under a different
    shard-routing scheme or shard count — keys would land in the wrong
    shards and the crawl would silently re-crawl (or skip) URLs."""
    from ..state.seen import ROUTING

    rp = os.path.join(ckpt_dir, "seen", "ROUTING")
    got = None
    if os.path.exists(rp):
        with open(rp) as f:
            got = f.read().strip()
    want = f"{ROUTING}:{num_shards}"
    if got != want:
        raise RuntimeError(
            f"seen-set checkpoint at {ckpt_dir!r} was written under routing "
            f"{got or 'pre-versioning (md5 v0)'} but this build routes with {want}; "
            "restart the crawl with a fresh ckpt_dir (or matching seen_shards)."
        )


def load_seen_snapshot(ckpt_dir: str, rnd: int) -> list[bytes]:
    d = os.path.join(ckpt_dir, "seen", f"round-{rnd:04d}")
    out = []
    i = 0
    while os.path.exists(os.path.join(d, f"shard-{i}.bin")):
        with open(os.path.join(d, f"shard-{i}.bin"), "rb") as f:
            out.append(f.read())
        i += 1
    return out


def save_budget_snapshot(ckpt_dir: str, rnd: int, state: list[dict]) -> None:
    d = os.path.join(ckpt_dir, "budget")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, f"round-{rnd:04d}.json"), "w") as f:
        json.dump(state, f)


def load_budget_snapshot(ckpt_dir: str, rnd: int) -> list[dict] | None:
    p = os.path.join(ckpt_dir, "budget", f"round-{rnd:04d}.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)
