"""Deterministic sampling operators for training-data mixing.

Sampling at 100 TB must be (a) a streaming filter — no shuffle, no
global state, (b) reproducible across runs and resumes, (c) exactly
re-expressible in SQL for the oracle. All three fall out of hashing
the document id with a Knuth multiplicative hash (public, TAOCP §6.4)
instead of drawing randoms:

    keep  ⇔  ((id + salt) * 2654435761) mod 2^32  <  rate * 2^32

(the salt is added BEFORE the multiply: an additive-after-multiply salt
only shifts every hash by ``salt``, leaving near-identical keep sets;
pre-multiply salting shifts the window by ``salt * K mod 2^32`` —
~0.618 * 2^32 per unit — so different salts give decorrelated subsets)

The uint64 wraparound on the numpy side equals the exact arithmetic on
the SQL side because 2^32 divides 2^64. ``salt`` decorrelates
independent samples of the same table (two different salts give two
independent-looking subsets).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

KNUTH = 2654435761  # 2^32 / phi, Knuth's multiplicative constant
_MOD = np.uint64(1) << np.uint64(32)


def _hash_bucket(ids: np.ndarray, salt: int) -> np.ndarray:
    """((id + salt) * K) mod 2^32 as uint64 — non-negative ids only.
    The uint64 wraparound matches SQL HUGEINT arithmetic exactly
    because 2^32 divides 2^64 (see module docstring)."""
    h = (ids.astype(np.uint64) + np.uint64(salt)) * np.uint64(KNUTH)
    return h % _MOD


def threshold_for(rate: float) -> int:
    """The integer keep-threshold for a [0,1] rate (floor, so both the
    numpy filter and the SQL oracle compare against the same int)."""
    return int(rate * (1 << 32))


def hash_sample(ds, rate: float, id_col: str = "doc_id", salt: int = 0):
    """Deterministic Bernoulli(rate) sample keyed on the id column —
    one vectorized streaming filter, stable across runs/resumes."""
    thr = np.uint64(threshold_for(rate))

    def flt(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        return batch.filter(pa.array(_hash_bucket(ids, salt) < thr))

    return ds.map_batches(flt, batch_format="pyarrow")


def stratified_sample(ds, rates: dict[str, float], strat_col: str = "source",
                      id_col: str = "doc_id", salt: int = 0,
                      default_rate: float = 0.0):
    """Per-stratum deterministic sampling — THE data-mixing primitive
    (e.g. keep 100% of wiki, 10% of CC, 0% of the rest). The rate
    table is the broadcast small side (one entry per stratum); rows
    filter in one streaming pass with a vectorized threshold lookup."""
    strata = pa.array(sorted(rates), pa.string())
    thrs = np.array(
        [threshold_for(rates[s]) for s in sorted(rates)] + [threshold_for(default_rate)],
        dtype=np.uint64,
    )

    def flt(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        # stratum -> threshold: one index_in kernel + one fancy-index
        # (missing strata map to the default-rate slot)
        idx = np.asarray(
            pc.fill_null(
                pc.index_in(pc.cast(batch.column(strat_col), pa.string()),
                            value_set=strata),
                len(thrs) - 1,
            ).cast(pa.int64()),
            dtype=np.int64,
        )
        return batch.filter(pa.array(_hash_bucket(ids, salt) < thrs[idx]))

    return ds.map_batches(flt, batch_format="pyarrow")


def deterministic_shuffle(ds, id_col: str = "doc_id", salt: int = 0,
                          key_col: str = "shuffle_key"):
    """Deterministic global shuffle for training-data output order.

    Pretraining wants examples in a reproducible pseudo-random order
    (so a resumed/re-run job writes byte-identical shards), which
    ``Dataset.random_shuffle`` cannot give. Re-keying every row with
    the same Knuth hash the samplers use and range-sorting on
    ``(key, id)`` yields a total order that is (a) decorrelated from
    the input order, (b) a pure function of ``(id, salt)`` — stable
    across runs, resumes and block layouts — and (c) executed as Ray
    Data's distributed range-partitioned sort, i.e. one all-to-all
    exchange, the same cost as any shuffle. The id tie-break makes the
    order total even across hash collisions. The key column is kept in
    the output (callers can drop it) so downstream stages and the SQL
    oracle can verify placement without re-deriving the hash.
    """

    def keyed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        k = _hash_bucket(ids, salt).astype(np.int64)
        return batch.append_column(key_col, pa.array(k, pa.int64()))

    return ds.map_batches(keyed, batch_format="pyarrow").sort([key_col, id_col])


def mix_corpus(ds, rates: dict[str, float], strat_col: str = "source",
               id_col: str = "doc_id", salt: int = 0,
               epoch_col: str = "epoch", default_rate: float = 0.0):
    """Deterministic corpus mixing with UP-sampling (the Pile/Dolma
    epoch-weighting primitive): a stratum's rate may exceed 1 — every
    row emits ``floor(rate)`` full copies plus one more iff its Knuth
    hash clears the fractional threshold, so a rate of 2.3 yields
    exactly ~2.3 copies per doc, reproducibly. Copies carry an
    ``epoch`` index so a downstream ``deterministic_shuffle`` (salted
    per epoch) decorrelates repeats. One streaming pass — no shuffle,
    no state, stable across runs/resumes/block layouts; the rate table
    is O(strata) and closure-broadcast."""
    strata = sorted(rates)

    def _split(r: float) -> tuple[int, int]:
        b = int(r)
        return b, threshold_for(r - b)

    bases, fthrs = zip(*[_split(rates[s]) for s in strata] + [_split(default_rate)])
    base = np.array(bases, np.int64)
    fthr = np.array(fthrs, np.uint64)
    sarr = pa.array(strata, pa.string())

    def expand(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()), dtype=np.int64)
        idx = np.asarray(
            pc.fill_null(
                pc.index_in(pc.cast(batch.column(strat_col), pa.string()),
                            value_set=sarr),
                len(base) - 1,
            ).cast(pa.int64()),
            dtype=np.int64,
        )
        h = _hash_bucket(ids, salt)
        copies = base[idx] + (h < fthr[idx]).astype(np.int64)
        ridx = np.repeat(np.arange(len(ids), dtype=np.int64), copies)
        out = batch.take(pa.array(ridx, pa.int64()))
        starts = np.concatenate([[0], np.cumsum(copies)[:-1]]).astype(np.int64)
        epoch = np.arange(int(copies.sum()), dtype=np.int64) - np.repeat(starts, copies)
        return out.append_column(epoch_col, pa.array(epoch, pa.int64()))

    return ds.map_batches(expand, batch_format="pyarrow")


def mixture_rates(sizes: dict[str, int], weights: dict[str, float],
                  temperature: float = 1.0,
                  target_total: int | None = None) -> dict[str, float]:
    """Per-source sampling/up-sampling rates realizing a target mixture
    (the multilingual-LM recipe: p_i ∝ w_i^(1/T), Conneau & Lample '19
    — T>1 flattens the mix toward uniform, T=1 keeps the raw weights).

    Driver-side pure math over O(sources) numbers — feed the result to
    ``stratified_sample`` (all rates ≤ 1) or ``mix_corpus`` (rates may
    exceed 1 when a small high-weight source must repeat for epochs).
    ``target_total`` defaults to ``sum(sizes)`` (re-mix at corpus
    size); rates are reproducible floats — quantize upstream only if
    two engines must agree bit-for-bit."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    srcs = sorted(sizes)
    if set(weights) - set(sizes):
        raise ValueError(f"weights for unknown sources: {sorted(set(weights) - set(sizes))}")
    w = np.array([max(float(weights.get(s, 0.0)), 0.0) for s in srcs], np.float64)
    n = np.array([max(int(sizes[s]), 0) for s in srcs], np.float64)
    p = w ** (1.0 / temperature)
    tot_p = p.sum()
    if tot_p <= 0:
        return {s: 0.0 for s in srcs}
    p /= tot_p
    total = float(target_total if target_total is not None else n.sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        rates = np.where(n > 0, p * total / np.maximum(n, 1e-300), 0.0)
    return {s: float(r) for s, r in zip(srcs, rates)}


def leakage_safe_split(ds, train_rate: float = 0.9, text_col: str = "text",
                       id_col: str = "doc_id", key_tokens: int = 8,
                       salt: int = 17):
    """Train/test split that cannot leak (near-)duplicates across the
    boundary — the standard eval-hygiene requirement (Lee et al. '21,
    "Deduplicating Training Data Makes Language Models Better", §5):
    splitting per-document puts copies of one text on both sides.
    Documents group by the prefix fingerprint (the mirror_sources /
    dup_histogram cluster key); each cluster's ROOT (min id) is hashed
    ONCE with the sampling module's Knuth filter and the whole cluster
    follows its root's side. Output ``(doc_id, root, split)``.

    Scale shape: one hash-aggregate min per cluster key + one
    distributed hash join back (exactly the ``exact_dedup`` shape),
    then a streaming vectorized filter — no driver state. For true
    NEAR-dup safety swap the fingerprint for dedup_components labels;
    the split mechanics are identical.
    """
    from ..common import drop_empty_blocks
    from .dedup import _md5_col

    thr = np.uint64(threshold_for(train_rate))

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column(text_col), pa.string()), " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, key_tokens), " ")
        return pa.table({
            id_col: batch.column(id_col),
            "content_key": _md5_col(prefix.to_pylist()),
        })

    # materialized ONCE: the root aggregate and the join both consume
    # the keyed table — lazily each would re-md5 the whole corpus
    k = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    roots = (k.groupby("content_key").min(id_col)
             .map_batches(lambda t: t.rename_columns(["content_key", "root"]),
                          batch_format="pyarrow"))
    j = drop_empty_blocks(k).join(drop_empty_blocks(roots), "inner", 8,
                                  on=("content_key",))

    def tag(batch: pa.Table) -> pa.Table:
        root = np.asarray(pc.cast(batch.column("root"), pa.int64()))
        train = _hash_bucket(root, salt) < thr
        return pa.table({
            id_col: batch.column(id_col),
            "root": pa.array(root, pa.int64()),
            "split": pa.array(np.where(train, "train", "test")),
        })

    return j.map_batches(tag, batch_format="pyarrow")


def group_sample(ds, k: int, group_col: str = "source", id_col: str = "doc_id",
                 salt: str = "gs1"):
    """Deterministic k-per-group sample: within each group keep the k
    rows whose ``md5(salt|id)`` sorts lowest — a seedless reservoir
    substitute (same contract as ``hash_sample``: stable across runs,
    block layouts, and cluster sizes, so an oracle and a re-run agree
    bit-for-bit). The standard per-domain spot-check draw (k docs per
    source for human eval / quality calibration).

    Scale shape: the hash is an Arrow-kernel-fed md5 per batch (shared
    ``_md5_col`` so the DuckDB oracle orders identically), then
    ``top_k_per_group`` — a per-block partial top-k bounds the shuffle
    to ≤k rows per (group, block), and the exact per-group cut runs in
    ``map_groups``; the output is O(groups × k), never O(corpus).
    """
    from ..pipelines.relational import top_k_per_group
    from .dedup import _md5_col

    def keyed(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column(id_col), pa.string())
        seeded = pc.binary_join_element_wise(
            pa.array([salt] * batch.num_rows, pa.string()), ids, "|")
        return pa.table({
            group_col: batch.column(group_col),
            id_col: batch.column(id_col),
            "h": _md5_col(seeded.to_pylist()),
        })

    out = top_k_per_group(
        ds.map_batches(keyed, batch_format="pyarrow"),
        group_col=group_col, key="h", k=k, descending=False,
        tiebreak=id_col,
    )
    return out.drop_columns(["h"])


def weighted_sample(ds, k: int, weight_col: str, id_col: str = "doc_id",
                    salt: int = 7):
    """Deterministic weighted sample WITHOUT replacement (Efraimidis &
    Spirakis 2006, "Weighted random sampling with a reservoir"): each
    row gets key u^(1/w) with u a seedless hash-uniform in (0,1); the k
    largest keys ARE a weight-proportional sample. Distributed as a
    per-block partial top-k + one tiny merge (relational.top_k) — no
    global sort, no RNG state, stable across runs and resumes. Rows
    with weight <= 0 are excluded (their exponent is undefined in the
    oracle too)."""
    from ..pipelines.relational import top_k

    def keyed(batch: pa.Table) -> pa.Table:
        ids = np.asarray(pc.cast(batch.column(id_col), pa.int64()),
                         dtype=np.int64)
        w = np.asarray(pc.cast(batch.column(weight_col), pa.float64()))
        # u in (0,1): the +0.5 keeps u off both endpoints so u^(1/w) is
        # never an exact 0/1 tie; arithmetic mirrors the SQL oracle
        u = (_hash_bucket(ids, salt).astype(np.float64) + 0.5) / 4294967296.0
        with np.errstate(invalid="ignore"):
            key = u ** (1.0 / w)
        t = pa.table({
            id_col: batch.column(id_col),
            weight_col: batch.column(weight_col),
            "skey": pa.array(key, pa.float64()),
        })
        return t.filter(pa.array(w > 0))

    picked = top_k(ds.map_batches(keyed, batch_format="pyarrow"),
                   key="skey", k=k, descending=True, tiebreak=id_col)
    return picked.drop_columns(["skey"])
