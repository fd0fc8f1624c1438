"""Learned-BPE trainer + encoder (functions/bpe.py).

The trainer is cross-checked against an independent dict-based
reference implementation written here (same spec: overlapping pairs
counted per position, leftmost-first merge within runs, smallest
(left_id, right_id) tie-break) — not against itself.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from scrappy_ray.functions.bpe import (
    END,
    BPEEncoder,
    _learn_from_types,
    bpe_token_stats,
    learn_bpe,
)


def _ref_learn(words, counts, num_merges):
    """Naive reference: list-of-symbols per word type, full recount."""
    chars = sorted(set("".join(words)))
    sym_ids = {s: i for i, s in enumerate(chars + [END])}
    seqs = [list(w) + [END] for w in words]
    merges = []
    for _ in range(num_merges):
        S = len(sym_ids)
        pair_cnt = {}
        for seq, c in zip(seqs, counts):
            for i in range(len(seq) - 1):
                k = sym_ids[seq[i]] * S + sym_ids[seq[i + 1]]
                pair_cnt[k] = pair_cnt.get(k, 0) + c
        if not pair_cnt:
            break
        best_n = max(pair_cnt.values())
        if best_n < 2:
            break
        k = min(kk for kk, v in pair_cnt.items() if v == best_n)
        inv = {v: s for s, v in sym_ids.items()}
        a, b = inv[k // S], inv[k % S]
        merges.append((a, b))
        sym_ids[a + b] = len(sym_ids)
        for seq in seqs:
            i = 0
            while i < len(seq) - 1:
                if seq[i] == a and seq[i + 1] == b:
                    seq[i : i + 2] = [a + b]
                i += 1
    return merges


def test_trainer_matches_reference_implementation():
    words = np.array(["low", "lower", "newest", "widest", "wideness"])
    counts = np.array([5, 2, 6, 3, 2])
    got = _learn_from_types(words, counts, 12)
    want = _ref_learn(list(words), list(counts), 12)
    assert got == want


def test_trainer_handles_overlapping_runs():
    # 'aaaa' has three 'aa' positions; leftmost-first merging gives
    # aa|aa (2 symbols), then 'aaaa' on the next merge
    words = np.array(["aaaa", "aaaa"])
    counts = np.array([3, 3])
    got = _learn_from_types(words, counts, 2)
    want = _ref_learn(list(words), list(counts), 2)
    assert got == want
    assert got[0] == ("a", "a")


def test_learn_bpe_layout_invariant(ray_session):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(
        ["the quick brown fox", "the lazy dog", "the the quick dog",
         "brown dogs and foxes", "quick quick brown"] * 4)]
    a = learn_bpe(ray.data.from_items(rows).repartition(1), 15, min_count=1)
    b = learn_bpe(ray.data.from_items(rows).repartition(7), 15, min_count=1)
    assert a == b
    assert len(a) == 15


def test_encoder_counts_and_cache():
    merges = [("l", "o"), ("lo", "w"), ("low", END)]
    enc = BPEEncoder(merges)
    assert enc._encode_len("low") == 1          # low</w>
    assert enc._encode_len("lows") == 3         # low s </w>
    assert enc._encode_len("zzz") == 4          # z z z </w>
    assert enc._cache["low"] == 1               # cache populated
    batch = pa.table({"doc_id": [1, 2, 3],
                      "text": ["low low", "lows", ""]})
    out = enc(batch)
    assert out.column("n_bpe_learned").to_pylist() == [2, 3, 1]  # "" -> [</w>]


def test_bpe_token_stats_end_to_end(ray_session):
    rows = [{"doc_id": i, "text": "low lower lowest"} for i in range(6)]
    ds = ray.data.from_items(rows)
    merges = learn_bpe(ds, 5, min_count=1)
    out = bpe_token_stats(ds, merges, concurrency=2).sort("doc_id").to_pandas()
    assert len(out) == 6
    assert out["n_bpe_learned"].nunique() == 1  # identical docs
    assert (out["n_bpe_learned"] > 0).all()
    # merges compress: learned count strictly below char-level count
    char_level = len("lowlowerlowest") + 3  # chars + 3 END symbols
    assert int(out["n_bpe_learned"].iloc[0]) < char_level


def test_learn_bpe_empty_and_min_count(ray_session):
    empty = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64()),
                                          "text": pa.array([], pa.string())}))
    assert learn_bpe(empty, 5) == []
    # min_count prunes hapax types: only the repeated word survives,
    # and a single word type still yields its internal merges
    ds = ray.data.from_items([{"doc_id": 0, "text": "abc abc xyz"}])
    m = learn_bpe(ds, 3, min_count=2)
    assert all("x" not in a + b and "y" not in a + b for a, b in m)


def test_merge_table_roundtrip(tmp_path):
    from scrappy_ray.functions.bpe import load_merges, save_merges

    merges = [("l", "o"), ("lo", "w"), ("low", END)]
    p = str(tmp_path / "merges.parquet")
    save_merges(merges, p)
    assert load_merges(p) == merges
    enc = BPEEncoder(load_merges(p))
    assert enc._encode_len("low") == 1
