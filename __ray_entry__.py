"""Driver contract for the graft builder (Ray Data target).

``queries()`` exposes one entry per implemented operator/pipeline from
SURVEY.md §2 + the training-data ops; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for everything SQL-expressible (same column
names, floats rounded identically on both sides). Crawl/extraction
pipelines run over the deterministic synthetic pages table
(BASELINE.json input_hint shape, generated under /tmp) and are
rows-only checks.

Ray is initialised by the driver BEFORE this module is imported: no
ray.init()/ray.shutdown() here or below.
"""

from __future__ import annotations

import os
import sys
import tempfile
from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

# make `scrappy_ray` importable regardless of the driver's cwd
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

ROUND = 4  # float rounding applied identically in Ray + SQL outputs


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _read_table(sf_dir: str, table: str, columns=None,
                filter=None) -> pa.Table:
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{table}.parquet"),
                         columns=columns, filters=filter)


# ---------------------------------------------------------------- relational


def _q_tpch_q1(sf_dir: str):
    from ray.data.aggregate import Count, Mean, Sum

    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"])

    def disc_price(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        dp = pc.multiply(batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return batch.append_column("disc_price", dp)

    out = (
        ds.map_batches(disc_price, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
        .sort(["l_returnflag", "l_linestatus"])
    )
    return round_cols(out, ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc"], ROUND)


def _q_top_orders(sf_dir: str):
    from scrappy_ray.pipelines.relational import top_k

    ds = _read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return top_k(ds, "o_totalprice", 10, descending=True, tiebreak="o_orderkey")


def _q_region_customers(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    from scrappy_ray.pipelines.relational import broadcast_join, round_cols

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def widen(b: pa.Table) -> pa.Table:  # align join key dtypes
        import pyarrow.compute as pc

        return b.set_column(b.column_names.index("c_nationkey"), "n_nationkey", pc.cast(b.column("c_nationkey"), pa.int32()))

    cust = cust.map_batches(widen, batch_format="pyarrow")
    nation = _read_table(sf_dir, "nation")
    region = _read_table(sf_dir, "region")
    nr = nation.join(region, keys="n_regionkey", right_keys="r_regionkey")  # driver-side small⋈small
    joined = broadcast_join(cust, nr.select(["n_nationkey", "r_name"]), on="n_nationkey")
    out = (
        joined.groupby("r_name")
        .aggregate(Count(alias_name="n_customers"), Mean("c_acctbal", alias_name="avg_acctbal"))
        .sort("r_name")
    )
    return round_cols(out, ["avg_acctbal"], ROUND)


def _q_events_daily(sf_dir: str):
    from ray.data.aggregate import Count, Sum

    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def day_of(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        day = pc.strftime(batch.column("ts"), format="%Y-%m-%d")
        return pa.table({"day": day, "event_type": batch.column("event_type"), "value": batch.column("value")})

    out = (
        ds.map_batches(day_of, batch_format="pyarrow")
        .groupby(["day", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .sort(["day", "event_type"])
    )
    return round_cols(out, ["sum_value"], ROUND)


def _q_revenue_by_priority(sf_dir: str):
    from ray.data.aggregate import Sum

    from scrappy_ray.pipelines.relational import round_cols

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def rev(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        r = pc.multiply(batch.column("l_extendedprice"), pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return pa.table({"o_orderkey": batch.column("l_orderkey"), "revenue": r})

    li_rev = li.map_batches(rev, batch_format="pyarrow")
    joined = li_rev.join(orders, join_type="inner", num_partitions=8, on=("o_orderkey",))
    out = joined.groupby("o_orderpriority").aggregate(Sum("revenue", alias_name="revenue")).sort("o_orderpriority")
    return round_cols(out, ["revenue"], ROUND)


def _q_orders_per_customer(sf_dir: str):
    """TPC-H Q13 shape: LEFT OUTER hash join (customers keep their
    zero-order rows) + two-level aggregation — exercises Ray Data's
    native distributed left_outer join."""
    cust = _read(sf_dir, "customer", columns=["c_custkey"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderkey"])
    j = cust.join(orders, join_type="left_outer", num_partitions=8,
                  on=("c_custkey",), right_on=("o_custkey",))

    def has_order(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "c_custkey": batch.column("c_custkey"),
            "has": pc.cast(pc.is_valid(batch.column("o_orderkey")), pa.int64()),
        })

    per_cust = (
        j.map_batches(has_order, batch_format="pyarrow")
        .groupby("c_custkey").sum("has")
    )

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({"c_count": batch.column("sum(has)")})

    return (
        per_cust.map_batches(shape, batch_format="pyarrow")
        .groupby("c_count").count()
        .rename_columns(["c_count", "custdist"])
        .sort(["custdist", "c_count"], descending=[True, True])
    )


def _q_customers_no_urgent(sf_dir: str):
    """LEFT ANTI join: customers with no URGENT order — Ray Data's
    native distributed anti join over a filter-pruned right side,
    oracled vs NOT EXISTS."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    urgent = orders.filter(
        expr="o_orderpriority == '1-URGENT'"
    ).select_columns(["o_custkey"])
    return cust.join(
        urgent, join_type="left_anti", num_partitions=8,
        on=("c_custkey",), right_on=("o_custkey",),
    ).sort("c_custkey")


def _q_distinct_event_types(sf_dir: str):
    from scrappy_ray.functions.dedup import _distinct

    ds = _read(sf_dir, "events", columns=["event_type"])
    return _distinct(ds, ["event_type"]).sort("event_type")


def _q_revisit_stats(sf_dir: str):
    from scrappy_ray.functions.webtext import revisit_stats

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return revisit_stats(ds).sort("user_id")


def _q_revisit_stats_salted(sf_dir: str):
    """revisit_stats with hot-key salting forced ON (threshold 50, so
    the busiest users split into contiguous time chunks and re-merge;
    functions/webtext.py::revisit_stats_salted) — output identical to
    the unsalted operator, proven against the SAME SQL oracle."""
    from scrappy_ray.functions.webtext import revisit_stats_salted

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return revisit_stats_salted(ds, hot_threshold=50,
                                n_salt=4).sort("user_id")


def _q_sessionize(sf_dir: str):
    from scrappy_ray.pipelines.relational import sessionize

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return sessionize(ds, gap_minutes=30).sort("user_id")


def _q_rolling_window(sf_dir: str):
    """Per-user ordered analytic window (trailing moving average,
    LAG, running sum) — groupby(user).map_groups with vectorized
    shifted adds (pipelines/relational.py::rolling_window); oracled
    against DuckDB window functions over the identical frame."""
    from scrappy_ray.pipelines.relational import rolling_window

    ds = _read(sf_dir, "events", columns=["user_id", "ts", "event_id", "value"])
    out = rolling_window(
        ds, "user_id", "ts", "value", "event_id", window=4, lag=1, digits=ROUND
    )

    def nullfree(batch: pa.Table) -> pa.Table:
        # hash-oracle hygiene: LAG's leading null becomes a sentinel so
        # the value compare never meets NaN (library semantics keep the
        # null; only this oracled surface coalesces)
        import pyarrow.compute as pc

        i = batch.column_names.index("lag_value")
        return batch.set_column(i, "lag_value", pc.fill_null(batch.column("lag_value"), -1.0))

    return out.map_batches(nullfree, batch_format="pyarrow").sort(["user_id", "event_id"])


def _q_events_window(sf_dir: str):
    """Tumbling 6-hour window aggregate — the batch expression of a
    stream window (ray_guide.md 'Streaming-shaped workloads'): window =
    floor(epoch/21600), vectorized in Arrow; oracle uses the same
    bucketing in SQL."""
    from ray.data.aggregate import Count, Sum

    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "events", columns=["ts", "event_type", "value"])

    def win(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        epoch = pc.cast(batch.column("ts"), pa.int64())  # µs
        w = pc.divide(epoch, pa.scalar(21_600_000_000, pa.int64()))
        return pa.table(
            {"win": pc.cast(w, pa.int64()), "event_type": batch.column("event_type"), "value": batch.column("value")}
        )

    out = (
        ds.map_batches(win, batch_format="pyarrow")
        .groupby(["win", "event_type"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .sort(["win", "event_type"])
    )
    return round_cols(out, ["sum_value"], ROUND)


def _q_filter_pushdown(sf_dir: str):
    """Predicate + projection pruned at the read (read_parquet filter)."""
    import pyarrow.dataset as pads
    import ray.data

    from ray.data.aggregate import Count, Sum

    from scrappy_ray.pipelines.relational import round_cols

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_discount") >= 0.05),
    )
    out = ds.aggregate(
        Count(alias_name="n"),
        Sum("l_quantity", alias_name="sum_qty"),
        Sum("l_extendedprice", alias_name="sum_price"),
    )
    t = pa.table({k: [v] for k, v in out.items()})
    return round_cols(t, ["sum_qty", "sum_price"], ROUND)


def _q_mktsegment(sf_dir: str):
    from ray.data.aggregate import Count, Mean

    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "customer", columns=["c_mktsegment", "c_acctbal"])
    out = (
        ds.groupby("c_mktsegment")
        .aggregate(Count(alias_name="n"), Mean("c_acctbal", alias_name="avg_acctbal"))
        .sort("c_mktsegment")
    )
    return round_cols(out, ["avg_acctbal"], ROUND)


def _q_part_types(sf_dir: str):
    from ray.data.aggregate import Count, Max, Min

    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "part", columns=["p_type", "p_retailprice"])
    out = (
        ds.groupby("p_type")
        .aggregate(
            Count(alias_name="n"),
            Min("p_retailprice", alias_name="min_price"),
            Max("p_retailprice", alias_name="max_price"),
        )
        .sort("p_type")
    )
    return round_cols(out, ["min_price", "max_price"], ROUND)


def _q_supplier_nation(sf_dir: str):
    from ray.data.aggregate import Count

    from scrappy_ray.pipelines.relational import broadcast_join

    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def widen(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.set_column(
            b.column_names.index("s_nationkey"), "n_nationkey", pc.cast(b.column("s_nationkey"), pa.int32())
        )

    nation = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    joined = broadcast_join(sup.map_batches(widen, batch_format="pyarrow"), nation, on="n_nationkey")
    return joined.groupby("n_name").aggregate(Count(alias_name="n_suppliers")).sort("n_name")


# ------------------------------------------------------------ training-data


def _q_dedup_exact(sf_dir: str):
    from scrappy_ray.functions.dedup import exact_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return exact_dedup(ds, ids_only=True).sort("doc_id")


def _q_readability(sf_dir: str):
    from scrappy_ray.functions.textstats import readability

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return readability(ds).sort("doc_id")


def _q_token_stats(sf_dir: str):
    from scrappy_ray.functions.textstats import token_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return token_stats(ds).select_columns(["doc_id", "n_chars", "n_tokens"]).sort("doc_id")


def _q_punct_ratio(sf_dir: str):
    from scrappy_ray.functions.textstats import quality_scores
    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = quality_scores(ds).select_columns(["doc_id", "punct_ratio", "digit_ratio"]).sort("doc_id")
    return round_cols(out, ["punct_ratio", "digit_ratio"], 6)


def _q_gopher_rules(sf_dir: str):
    """Gopher filter-rule set (Rae et al. '21): per-doc published
    quality signals + conjunctive keep verdict, one streaming Arrow
    pass (functions/textstats.py::gopher_stats)."""
    from scrappy_ray.functions.textstats import gopher_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return gopher_stats(ds, digits=ROUND).sort("doc_id")


def _q_repetition(sf_dir: str):
    from scrappy_ray.functions.textstats import repetition_stats
    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = repetition_stats(ds).sort("doc_id")
    return round_cols(out, ["top_unigram_frac", "top_bigram_frac", "dup_line_frac"], 6)


def _q_chunk_docs(sf_dir: str):
    from scrappy_ray.functions.textstats import chunk_documents

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return chunk_documents(ds, chunk_tokens=16, overlap=4).sort(["doc_id", "chunk_id"])


def _q_pack_sequences(sf_dir: str):
    from scrappy_ray.functions.packing import pack_sequences

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return pack_sequences(ds, seq_tokens=16, num_buckets=16).sort("seq_id")


def _q_shuffle_det(sf_dir: str):
    import numpy as np

    from scrappy_ray.functions.sampling import deterministic_shuffle

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    # head-100 of the shuffled order, with explicit rank so the check is
    # order-independent but still verifies the distributed sort's order
    head = deterministic_shuffle(ds, salt=13).limit(100).to_pandas()
    head["rank"] = np.arange(len(head), dtype=np.int64)
    return head[["rank", "doc_id", "shuffle_key"]]


def _q_perplexity(sf_dir: str):
    from scrappy_ray.functions.lm import perplexity_scores
    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    out = perplexity_scores(ds).sort("doc_id")
    out = round_cols(out, ["avg_logprob"], 6)
    return round_cols(out, ["ppl"], 4)


def _q_top_per_group(sf_dir: str):
    from scrappy_ray.pipelines.relational import top_k_per_group

    # top-3 most valuable events per user, orderkey-tiebroken
    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    out = top_k_per_group(ds, group_col="user_id", key="value", k=3,
                          descending=True, tiebreak="event_id")
    return out.sort(["user_id", "value", "event_id"],
                    descending=[False, True, False])


def _q_value_quantiles(sf_dir: str):
    from scrappy_ray.pipelines.relational import group_quantiles

    ds = _read(sf_dir, "events", columns=["user_id", "value"])
    return group_quantiles(ds, "user_id", "value", [0.5, 0.95]).sort("user_id")


def _q_pivot_events(sf_dir: str):
    from scrappy_ray.pipelines.relational import pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cats = ["click", "view", "purchase", "signup", "error"]
    return pivot_counts(ds, row_col="user_id", col_col="event_type",
                        categories=cats).sort("user_id")


_VALUE_BANDS = [
    (0.0, 25.0, "tiny"), (25.0, 75.0, "low"),
    (75.0, 150.0, "mid"), (150.0, 190.0, "high"),
]  # values >= 190 deliberately fall outside every band (null label)


def _q_range_join(sf_dir: str):
    from scrappy_ray.pipelines.relational import range_join_broadcast

    bands = pa.table({
        "lo": pa.array([b[0] for b in _VALUE_BANDS], pa.float64()),
        "hi": pa.array([b[1] for b in _VALUE_BANDS], pa.float64()),
        "band": pa.array([b[2] for b in _VALUE_BANDS], pa.string()),
    })
    ds = _read(sf_dir, "events", columns=["event_id", "value"])
    return range_join_broadcast(ds, bands, value_col="value").sort("event_id")


def _q_fuzzy_join(sf_dir: str):
    """Blocked approximate-string join: part names vs deterministically
    typo'd probes (one char deleted past the 4-char blocking prefix)."""
    from scrappy_ray.functions.fuzzy import fuzzy_join

    part = _read(sf_dir, "part", columns=["p_partkey", "p_name"])

    def probes(batch: pa.Table) -> pa.Table:
        keys = batch.column("p_partkey").to_pylist()
        names = batch.column("p_name").to_pylist()
        typo = []
        for k, n in zip(keys, names):
            pos = 4 + (k % (len(n) - 4))
            typo.append(n[:pos] + n[pos + 1:])
        return pa.table({
            "probe_id": pa.array(keys, pa.int64()),
            "probe": pa.array(typo, pa.string()),
        })

    left = part.map_batches(probes, batch_format="pyarrow")
    # distinct_values: part names repeat ~30x per name — distances run
    # once per distinct (probe, name) pair, rows expand back via joins
    out = fuzzy_join(left, part, "probe", "p_name", max_dist=2,
                     block_chars=4, distinct_values=True)
    return out.select_columns(["probe_id", "p_partkey", "dist"]) \
              .sort(["probe_id", "p_partkey"])


def _q_asof_join(sf_dir: str):
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Sum

    from scrappy_ray.pipelines.relational import asof_join, round_cols

    events = _read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def prep_left(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "t_us": pc.cast(batch.column("ts"), pa.int64()),
        })

    left = events.map_batches(prep_left, batch_format="pyarrow")

    # pre-aggregate orders per (cust, day): makes the right side unique
    # on (key, time) so the as-of match is deterministic
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"])
    ragg = orders.groupby(["o_custkey", "o_orderdate"]).aggregate(
        Count(on="o_orderkey", alias_name="n_orders"),
        Max(on="o_orderkey", alias_name="max_orderkey"),
        Sum(on="o_totalprice", alias_name="sum_price"),
    )
    ragg = round_cols(ragg, ["sum_price"], 4)

    def prep_right(batch: pa.Table) -> pa.Table:
        # Ray's aggregate path can degrade the timestamp key to second
        # precision — normalize to us before the epoch cast
        d_us = pc.cast(pc.cast(batch.column("o_orderdate"), pa.timestamp("us")),
                       pa.int64())
        return pa.table({
            "user_id": batch.column("o_custkey"),
            "rt_us": d_us,
            "order_ts_us": d_us,
            "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            "max_orderkey": batch.column("max_orderkey"),
            "sum_price": batch.column("sum_price"),
        })

    right = ragg.map_batches(prep_right, batch_format="pyarrow")
    out = asof_join(left, right, by="user_id", left_on="t_us", right_on="rt_us",
                    left_cols=["event_id"],
                    right_cols=["order_ts_us", "n_orders", "max_orderkey", "sum_price"])

    def final(batch: pa.Table) -> pa.Table:
        names = {"order_ts_us_r": "order_ts_us", "n_orders_r": "n_orders",
                 "max_orderkey_r": "max_orderkey", "sum_price_r": "sum_price"}
        return batch.rename_columns([names.get(c, c) for c in batch.column_names])

    return out.map_batches(final, batch_format="pyarrow").sort("event_id")


def _q_paragraph_dedup(sf_dir: str):
    import pyarrow.compute as pc

    from scrappy_ray.functions.dedup import paragraph_dedup

    # synthesize multi-paragraph docs with planted corpus-wide dups:
    # doc i = own text + "\n" + doc (i+1)%N's text (same construction
    # in the SQL oracle)
    tbl = _read_table(sf_dir, "documents", columns=["doc_id", "text"])
    n = tbl.num_rows
    ids = np.asarray(tbl.column("doc_id"))
    order = np.argsort(ids)
    texts = np.asarray(tbl.column("text").to_pylist(), dtype=object)[order]
    nxt = {int(ids[order][i]): texts[(i + 1) % n] for i in range(n)}

    def inject(batch: pa.Table) -> pa.Table:
        own = pc.cast(batch.column("text"), pa.string()).to_pylist()
        did = batch.column("doc_id").to_pylist()
        merged = [f"{t}\n{nxt[i]}" for i, t in zip(did, own)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(merged, pa.string())})

    import ray.data

    ds = ray.data.from_arrow(tbl).map_batches(inject, batch_format="pyarrow")
    return paragraph_dedup(ds).sort("doc_id")


def _q_snapshot_diff(sf_dir: str):
    """Recrawl delta: two synthetic crawl snapshots derived
    deterministically from documents (drop id%7, mutate id%5, add
    id%11) diffed by content fingerprint — ONE distributed full_outer
    join + a vectorized status kernel (functions/webtext.py)."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.dedup import _md5_col
    from scrappy_ray.functions.webtext import snapshot_diff

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def old_side(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string())
        url = pc.binary_join_element_wise(pa.scalar("http://c.test/"), ids, pa.scalar(""))
        return pa.table({
            "url": url,
            "fingerprint": _md5_col(
                pc.fill_null(pc.cast(batch.column("text"), pa.string()), "").to_pylist()
            ),
        })

    def new_side(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(pc.cast(batch.column("doc_id"), pa.int64()), dtype=np.int64)
        txt = pc.fill_null(pc.cast(batch.column("text"), pa.string()), "").to_pylist()
        urls, fps = [], []
        for i, t in zip(ids.tolist(), txt):  # planted-fixture builder, not a hot path
            if i % 7 != 0:
                urls.append(f"http://c.test/{i}")
                fps.append(t + ("!" if i % 5 == 0 else ""))
            if i % 11 == 0:
                urls.append(f"http://c.test/added/{i}")
                fps.append(f"new:{i}")
        return pa.table({"url": pa.array(urls, pa.string()),
                         "fingerprint": _md5_col(fps)})

    old = docs.map_batches(old_side, batch_format="pyarrow")
    new = docs.map_batches(new_side, batch_format="pyarrow")
    return snapshot_diff(old, new).sort("url")


def _q_inverted_search(sf_dir: str):
    """Conjunctive (AND) term retrieval — a pure streaming pass, no
    index needed for ad-hoc terms (functions/index.py)."""
    from scrappy_ray.functions.index import search_all_terms

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return search_all_terms(ds, ["join", "scan", "window"]).sort("doc_id")


def _q_index_lookup(sf_dir: str):
    """Inverted-index build (ONE corpus groupby → one postings row per
    token, distributed) + broadcast point-probe of three terms; the
    postings list serializes to a comma-joined string so the value
    hash covers the full posting order."""
    from scrappy_ray.functions.index import build_inverted_index, lookup_postings

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    idx = build_inverted_index(ds)
    out = lookup_postings(idx, ["hash", "scan", "the"])

    def as_str(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = pc.binary_join(
            pc.cast(batch.column("postings"), pa.large_list(pa.string())), ","
        )
        return pa.table({"token": batch.column("token"),
                         "df": batch.column("df"),
                         "postings_str": s})

    return out.map_batches(as_str, batch_format="pyarrow").sort("token")


def _q_collocations(sf_dir: str):
    from scrappy_ray.functions.lm import collocations

    ds = _read(sf_dir, "documents", columns=["text"])
    return collocations(ds, min_count=5, k=20)


def _q_top_ngrams(sf_dir: str):
    from scrappy_ray.functions.lm import bigram_counts

    ds = _read(sf_dir, "documents", columns=["text"])
    _, bi = bigram_counts(ds)

    def shape(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["w1", "w2", "c"])

    # top-20 corpus bigrams: the all-to-all already reduced to distinct
    # n-grams; the sort is over that (small) table only
    return (bi.map_batches(shape, batch_format="pyarrow")
              .sort(["c", "w1", "w2"], descending=[True, False, False])
              .limit(20))


def _q_decontaminate(sf_dir: str):
    """Benchmark 8-gram decontamination: docs with ``doc_id % 5 == 0``
    act as the synthetic eval suite; every other document is flagged
    with its benchmark-overlapping-window count. Broadcast hash-set
    membership — one streaming pass, no shuffle
    (functions/decontam.py)."""
    from scrappy_ray.functions.decontam import benchmark_ngram_set, decontaminate

    N = 8

    def _keep(is_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = np.asarray(batch.column("doc_id")) % 5 == 0
            return batch.filter(pa.array(m if is_bench else ~m))

        return f

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])
    bench = docs.map_batches(_keep(True), batch_format="pyarrow")
    corpus = docs.map_batches(_keep(False), batch_format="pyarrow")
    hashes = benchmark_ngram_set(bench, n=N)
    return (
        decontaminate(corpus, hashes, n=N, mode="flag")
        .drop_columns(["text"])
        .sort("doc_id")
    )


def _q_tfidf(sf_dir: str):
    """Top-3 TF-IDF terms per document (DF shuffle O(terms×blocks) +
    broadcast-DF scoring pass; functions/tfidf.py). Rounded-score
    ranking keeps the order engine-reproducible."""
    from scrappy_ray.functions.tfidf import tfidf_topk

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return tfidf_topk(ds, k=3, round_digits=ROUND).sort(["doc_id", "rnk"])


def _q_approx_distinct(sf_dir: str):
    """HyperLogLog approximate distinct users per event type (p=12,
    ~1.6% std err; deterministic fixed-key hashing → golden-oracled).
    The shuffle moves O(groups × blocks) 4 KiB register rows, never
    the data (functions/sketch.py)."""
    from scrappy_ray.functions.sketch import approx_distinct_by_group

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct_by_group(ds, "event_type", "user_id", p=12).sort("event_type")


def _q_approx_quantiles(sf_dir: str):
    """Approximate per-event-type value quantiles from a deterministic
    mergeable bottom-k-by-hash sample (k=512, ~2% rank err; exact for
    groups <= k; functions/sketch.py). Layout-independent →
    golden-oracled."""
    from scrappy_ray.functions.sketch import approx_quantiles_by_group

    ds = _read(sf_dir, "events", columns=["event_type", "event_id", "value"])
    return approx_quantiles_by_group(
        ds, "event_type", "value", "event_id", [0.5, 0.9], k=512, digits=ROUND
    ).sort("event_type")


def _q_heavy_hitters(sf_dir: str):
    """Exact top-20 most-ordered parts via two-pass heavy hitters
    (per-batch Misra–Gries candidate summaries merged by sum, then a
    broadcast exact recount of candidates only — functions/sketch.py).
    Exact here by certificate: per-batch distinct part keys ≤ m, so no
    summary truncates and candidate recall is total."""
    from scrappy_ray.functions.sketch import heavy_hitters

    ds = _read(sf_dir, "lineitem", columns=["l_partkey"])
    return heavy_hitters(ds, "l_partkey", k=20, m=4096)


def _q_heavy_hitters_by_group(sf_dir: str):
    """Exact top-3 most active users per event type via the per-group
    two-pass heavy-hitter plan (per-batch per-group Misra–Gries
    summaries → broadcast candidate recount — functions/sketch.py)."""
    from scrappy_ray.functions.sketch import heavy_hitters_by_group

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return heavy_hitters_by_group(ds, "event_type", "user_id",
                                  k=3).sort(["event_type", "rnk"])


def _q_incremental_near_dedup(sf_dir: str):
    """Near-dup analogue of incremental_dedup: MinHash-band the new
    docs and probe a frozen reference band index (doc_id % 4 == 0
    slice) — flags LSH candidates without touching the reference again
    (functions/dedup.py::minhash_band_index/incremental_near_dedup).
    Deterministic (fixed permutation params) → golden-oracled."""
    from scrappy_ray.functions.dedup import (
        incremental_near_dedup, minhash_band_index)

    new = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def ref_slice(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch.column("doc_id"))
        return batch.filter(pa.array(ids % 4 == 0))

    ref = new.map_batches(ref_slice, batch_format="pyarrow")
    idx = minhash_band_index(ref)
    return incremental_near_dedup(new, idx).sort("doc_id")


def _q_compression_ratio(sf_dir: str):
    """zlib information-density signal per document (boilerplate is
    highly compressible, base64 junk is not —
    functions/textstats.py::compression_stats). Deterministic for a
    fixed zlib build → golden-oracled."""
    from scrappy_ray.functions.textstats import compression_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return compression_stats(ds).sort("doc_id")


def _q_incremental_dedup(sf_dir: str):
    """Snapshot-update dedup: drop any document whose exact text is
    already in the frozen reference slice (doc_id % 4 == 0) — the
    continuous-crawl shape (functions/dedup.py::incremental_exact_dedup;
    broadcast ref-hash set under the threshold, left-anti join above)."""
    from scrappy_ray.functions.dedup import incremental_exact_dedup

    new = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def ref_slice(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch.column("doc_id"))
        return batch.filter(pa.array(ids % 4 == 0))

    ref = new.map_batches(ref_slice, batch_format="pyarrow")
    out = incremental_exact_dedup(new, ref)
    return out.select_columns(["doc_id", "source"]).sort("doc_id")


def _q_substr_dedup(sf_dir: str):
    """ExactSubstr duplicated-span removal (Lee et al. '21): plant a
    12-token span from the first document into every doc_id % 5 == 0
    document, then remove every token covered by a corpus-duplicated
    10-token window (functions/substr_dedup.py — window-count shuffle
    + broadcast dup-set + vectorized span-union removal). SQL-oracled
    exactly: the oracle plants the same span and applies the same rule
    on token strings."""
    import ray.data

    from scrappy_ray.functions.substr_dedup import dedup_substrings

    tbl = _read_table(sf_dir, "documents", columns=["doc_id", "text"])
    first = tbl.sort_by("doc_id").slice(0, 1)
    donor = " ".join(first.column("text")[0].as_py().strip().split()[:12])

    def inject(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.asarray(batch.column("doc_id"))
        texts = batch.column("text").to_pylist()
        out = [f"{t} {donor}" if i % 5 == 0 else t
               for i, t in zip(ids, texts)]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "text": pa.array(out, pa.string())})

    ds = ray.data.from_arrow(tbl).map_batches(inject, batch_format="pyarrow")
    return dedup_substrings(ds, n=10).sort("doc_id")


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup (Abbas et al. '23): k-means cluster the embeddings
    (layout-independent sampled quantizer), prune near-dups within each
    cluster only — O(Σ cluster²) pairwise work as one groupby, keeping
    each dup group's farthest-from-centroid member
    (functions/semdedup.py). Deterministic → golden-oracled."""
    from scrappy_ray.functions.semdedup import semantic_dedup

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return semantic_dedup(ds, eps=0.05, n_clusters=8,
                          sample_size=512).sort("vec_id")


def _q_quality_classify(sf_dir: str):
    """GPT-3/CCNet-style quality-classifier distillation: weak labels
    come from the expensive heuristic gate (quality_kernel composite ≥
    0.55 — the reference side), a hashed-BoW Adagrad logistic model is
    trained on a deterministic bottom-k-by-hash sample per class, and
    the broadcast weights score every document in one streaming pass
    (functions/classifier.py). The tf-normalized features can express
    the gate's token-fraction terms, so the student genuinely learns
    it. Deterministic end-to-end (no RNG; layout-independent sample) →
    golden-oracled."""
    from scrappy_ray.functions.classifier import quality_classify

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def label(batch: pa.Table) -> pa.Table:
        import numpy as np

        from scrappy_ray.functions.textstats import quality_kernel

        q = np.asarray(quality_kernel(batch.column("text"))["quality"])
        return batch.append_column(
            "label", pa.array((q >= 0.55).astype("int64"), pa.int64()))

    ds = ds.map_batches(label, batch_format="pyarrow")
    out = quality_classify(ds, "label", dim=1 << 14, sample_k=512,
                           iters=300, threshold=0.5)
    return out.sort("doc_id")


def _q_hash_sample(sf_dir: str):
    from scrappy_ray.functions.sampling import hash_sample

    ds = _read(sf_dir, "documents", columns=["doc_id"])
    return hash_sample(ds, rate=0.25, salt=7).sort("doc_id")


def _q_mix_corpus(sf_dir: str):
    """Deterministic epoch-weighted mixing (up-sampling rates > 1):
    src0 at 2.5 epochs, src1 at 1, src2 at 0.25, everything else
    dropped — one streaming pass (functions/sampling.py::mix_corpus)."""
    from scrappy_ray.functions.sampling import mix_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return mix_corpus(
        ds, {"src0": 2.5, "src1": 1.0, "src2": 0.25}, salt=11
    ).sort(["doc_id", "epoch"])


def _q_stratified_sample(sf_dir: str):
    from scrappy_ray.functions.sampling import stratified_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    out = stratified_sample(
        ds, {"src0": 1.0, "src1": 0.5, "src2": 0.1},
        strat_col="source", salt=3, default_rate=0.05,
    )
    return out.sort("doc_id")


def _q_mirror_sources(sf_dir: str):
    from scrappy_ray.functions.webtext import mirror_sources

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return mirror_sources(ds, key_tokens=8, min_sources=2).sort("content_key")


def _q_dup_histogram(sf_dir: str):
    from scrappy_ray.functions.webtext import dup_histogram

    ds = _read(sf_dir, "documents", columns=["text"])
    return dup_histogram(ds, key_tokens=8)


def _q_url_templates(sf_dir: str):
    """Per-(host, path-template) URL census (functions/webtext.py::
    url_template_stats): digit runs collapse via one shared RE2 kernel;
    per-batch partial aggregates bound the shuffle to O(templates)."""
    from scrappy_ray.functions.webtext import url_template_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        _trap_urls_table, batch_format="pyarrow"
    )
    return url_template_stats(ds).sort(["host", "template"])


def _q_graph_reciprocity(sf_dir: str):
    """Per-node link reciprocity (functions/graph.py::reciprocity_table):
    distinct edges ⋈ their own reversal, two hash aggregates."""
    from scrappy_ray.functions.graph import reciprocity_table

    return reciprocity_table(_synth_edges(sf_dir)).sort("node")


def _q_script_mix(sf_dir: str):
    """Per-document Unicode script composition (functions/textstats.py::
    script_mix): RE2 strip+length per class, pure streaming map."""
    from scrappy_ray.functions.textstats import script_mix

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return script_mix(ds).sort("doc_id")


def _q_group_sample(sf_dir: str):
    """Deterministic k-per-group sample (functions/sampling.py::
    group_sample): md5-ordered heads via the partial top-k-per-group."""
    from scrappy_ray.functions.sampling import group_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"])
    return group_sample(ds, k=5, group_col="source", id_col="doc_id",
                        salt="gs1").sort(["source", "doc_id"])


def _q_rank_windows(sf_dir: str):
    """SQL ranking windows (pipelines/analytics.py::rank_windows):
    row_number / rank / dense_rank / ntile(4) per user, vectorized
    run-length ranking inside groupby().map_groups."""
    from scrappy_ray.pipelines.analytics import rank_windows

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return rank_windows(ds, key_col="user_id", order_col="value",
                        id_col="event_id", ntiles=4).sort(
                            ["user_id", "rn"])


def _q_rollup_orders(sf_dir: str):
    """GROUP BY ROLLUP (pipelines/analytics.py::rollup_counts): exact
    integer-cents sums at (priority, status), (priority) and grand
    total; the coarser levels derive from the O(groups) fine level."""
    from scrappy_ray.pipelines.analytics import rollup_counts

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    t = rollup_counts(ds, "o_orderpriority", "o_orderstatus",
                      "o_totalprice", scale=2)
    return t.sort_by([("o_orderpriority", "ascending"),
                      ("o_orderstatus", "ascending")])


def _q_funnel(sf_dir: str):
    """Ordered funnel view→click→purchase (pipelines/analytics.py::
    funnel_counts): per-batch partial min-ts per (user, step), strict
    time ordering between first occurrences."""
    from scrappy_ray.pipelines.analytics import funnel_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type", "ts"])
    return funnel_counts(ds, "user_id", "event_type", "ts",
                         steps=["view", "click", "purchase"])


def _q_retention(sf_dir: str):
    """Cohort retention (pipelines/analytics.py::retention_cohorts):
    distinct active days per user → first-day cohort → per (cohort,
    offset) user counts; both shuffles pre-reduced per batch."""
    from scrappy_ray.pipelines.analytics import retention_cohorts

    ds = _read(sf_dir, "events", columns=["user_id", "ts"])
    return retention_cohorts(ds, "user_id", "ts").sort(
        ["cohort_day", "day_offset"])


def _q_events_resample(sf_dir: str):
    """Dense 6-hour resample with gap fill (pipelines/analytics.py::
    resample_counts): exact fixed-point value sums; empty buckets emit
    (0, NULL)."""
    from scrappy_ray.pipelines.analytics import resample_counts

    ds = _read(sf_dir, "events", columns=["ts", "value"])
    return resample_counts(ds, "ts", "value", hours=6, scale=6)


def _q_unpivot_events(sf_dir: str):
    """Wide→long melt of the per-user event-type pivot
    (pipelines/analytics.py::unpivot): pure streaming explode, the
    inverse of pivot_events."""
    from scrappy_ray.pipelines.analytics import unpivot
    from scrappy_ray.pipelines.relational import pivot_counts

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    cats = ["click", "view", "purchase", "signup", "error"]
    wide = pivot_counts(ds, row_col="user_id", col_col="event_type",
                        categories=cats)
    return unpivot(wide, row_col="user_id",
                   value_cols=[f"n_{c}" for c in cats],
                   name_col="event_type", value_name="n",
                   strip_prefix="n_").sort(["user_id", "event_type"])


def _q_leakage_split(sf_dir: str):
    from scrappy_ray.functions.sampling import leakage_safe_split

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return leakage_safe_split(ds, train_rate=0.9).sort("doc_id")


def _q_domain_stats(sf_dir: str):
    from scrappy_ray.functions.webtext import domain_stats
    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    out = domain_stats(ds).sort("source")
    return round_cols(out, ["mean_quality"], 6)


def _q_domain_filter(sf_dir: str):
    from scrappy_ray.functions.webtext import domain_filter

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "text"])
    out = domain_filter(ds, min_docs=10, min_quality=0.55)
    return out.select_columns(["doc_id", "source"]).sort("doc_id")


def _q_sim_topk(sf_dir: str):
    from scrappy_ray.functions.similarity import topk_cosine

    emb = _read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qmask = [i for i, v in enumerate(emb.column("vec_id").to_pylist()) if v < 8]
    queries = np.array([emb.column("embedding")[i].as_py() for i in qmask], dtype=np.float64)
    qids = [emb.column("vec_id")[i].as_py() for i in qmask]
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = topk_cosine(ds, queries, k=5, query_ids=qids)
    return out.select_columns(["query_id", "neighbor_id", "rank"]).sort(["query_id", "rank"])


def _q_dedup_minhash(sf_dir: str):
    from scrappy_ray.functions.dedup import minhash_lsh_pairs, ngram_jaccard_verify

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, num_perm=32, bands=8, concurrency=2)
    return ngram_jaccard_verify(pairs, ds, threshold=0.5).select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])


def _q_dedup_simhash(sf_dir: str):
    from scrappy_ray.functions.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3).sort(["id_a", "id_b"])


def _q_dedup_embedding(sf_dir: str):
    """The sf embeddings are near-orthogonal random vectors (max pair
    cosine ≈0.48), so near-dups are PLANTED: the first 20 vectors are
    duplicated with slight noise at vec_id+1_000_000; the operator must
    recover exactly those pairs."""
    import ray.data

    from scrappy_ray.functions.dedup import embedding_pairs

    emb = _read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    base = emb.slice(0, 20)
    rng = np.random.RandomState(5)
    dup_vecs = [
        (np.array(v, dtype=np.float32) + rng.normal(0, 0.01, len(v)).astype(np.float32)).tolist()
        for v in base.column("embedding").to_pylist()
    ]
    dups = pa.table(
        {
            "vec_id": pa.array([v + 1_000_000 for v in base.column("vec_id").to_pylist()], pa.int64()),
            "embedding": pa.array(dup_vecs, emb.schema.field("embedding").type),
        }
    )
    ds = ray.data.from_arrow(pa.concat_tables([emb, dups]))
    return embedding_pairs(ds, threshold=0.95).select_columns(["id_a", "id_b"]).sort(["id_a", "id_b"])


def _q_lang_id(sf_dir: str):
    from scrappy_ray.functions.textstats import lang_id

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return lang_id(ds).select_columns(["doc_id", "lang_pred"]).sort("doc_id")


def _q_bpe_tokens(sf_dir: str):
    """Learned-BPE tokenizer: ONE distributed word-type count trains the
    merge table (driver work O(word types), Zipf-bounded); encoding is a
    cached actor-pool pass (functions/bpe.py). Deterministic (exact
    counts, smallest-pair-key tie-break) → golden-oracled."""
    from scrappy_ray.functions.bpe import bpe_token_stats, learn_bpe

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    merges = learn_bpe(ds, num_merges=200, min_count=2)
    return bpe_token_stats(ds, merges, concurrency=2).sort("doc_id")


def _q_fingerprint(sf_dir: str):
    from scrappy_ray.functions.textstats import fingerprint

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return fingerprint(ds).sort("doc_id")


def _q_quality(sf_dir: str):
    from scrappy_ray.functions.textstats import quality_scores
    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return round_cols(
        quality_scores(ds).sort("doc_id"),
        ["punct_ratio", "digit_ratio", "upper_ratio", "mean_word_len", "stopword_ratio", "quality"],
        6,
    )


def _q_quality_buckets(sf_dir: str):
    """Exact quality-decile assignment (curriculum bucketing) via the
    low-cardinality histogram trick — the only shuffle is a
    groupby(quality).count(); cutpoints fold on the driver in
    O(distinct values) and broadcast into one searchsorted pass
    (functions/sketch.py::value_buckets)."""
    from scrappy_ray.functions.sketch import value_buckets
    from scrappy_ray.functions.textstats import quality_scores
    from scrappy_ray.pipelines.relational import round_cols

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    q = round_cols(
        quality_scores(ds).select_columns(["doc_id", "quality"]), ["quality"], 6
    )
    return value_buckets(q, "quality", k=10).sort("doc_id")


def _q_ann_ivf(sf_dir: str):
    from scrappy_ray.functions.similarity import ivf_topk

    emb = _read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qmask = [i for i, v in enumerate(emb.column("vec_id").to_pylist()) if v < 8]
    queries = np.array([emb.column("embedding")[i].as_py() for i in qmask], dtype=np.float64)
    qids = [emb.column("vec_id")[i].as_py() for i in qmask]
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return ivf_topk(ds, queries, k=5, query_ids=qids).select_columns(
        ["query_id", "neighbor_id", "rank"]
    ).sort(["query_id", "rank"])


def _q_dedup_components(sf_dir: str):
    """Cluster-exact near-dup keep set: minhash pairs → connected
    components → keep min id per component."""
    from scrappy_ray.functions.dedup import dedup_by_components, minhash_lsh_pairs

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    pairs = minhash_lsh_pairs(ds, num_perm=32, bands=8, concurrency=2).materialize()
    return dedup_by_components(ds, pairs).select_columns(["doc_id"]).sort("doc_id")


def _q_ann_lsh(sf_dir: str):
    from scrappy_ray.functions.similarity import lsh_topk

    emb = _read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    qmask = [i for i, v in enumerate(emb.column("vec_id").to_pylist()) if v < 8]
    queries = np.array([emb.column("embedding")[i].as_py() for i in qmask], dtype=np.float64)
    qids = [emb.column("vec_id")[i].as_py() for i in qmask]
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return lsh_topk(ds, queries, k=5, query_ids=qids).select_columns(
        ["query_id", "neighbor_id", "rank"]
    ).sort(["query_id", "rank"])


def _q_corpus_clean(sf_dir: str):
    """Flagship training-data composition: exact dedup → MinHash near-dup
    CC dedup → language + quality filters; returns the surviving doc ids
    (deterministic → golden-oracled)."""
    from scrappy_ray.pipelines.corpus import clean_corpus

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    kept, _stats = clean_corpus(ds)
    return kept.select_columns(["doc_id"]).sort("doc_id")


def _q_mm_decode(sf_dir: str):
    import ray.data

    from scrappy_ray.functions.multimodal import decode_images, make_fake_image

    ids = _read_table(sf_dir, "embeddings", columns=["vec_id"]).column("vec_id").to_pylist()[:200]
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "payload": pa.array(
                [make_fake_image(8 + i % 8, 8 + i % 5, seed=i) for i in ids], pa.binary()
            ),
        }
    )
    return decode_images(ray.data.from_arrow(tbl)).sort("id")


def _q_mm_decode_png(sf_dir: str):
    """REAL image decode, no third-party codec (functions/multimodal
    .py::StdlibPngDecoder): deterministic RGB-gradient PNGs (cycling
    scanline filters 0–4 so every un-filter branch runs) decoded by
    the real=True actor pool — width/height/mean_px/phash per image.
    Golden-backed oracle (not SQL-expressible)."""
    import ray.data

    from scrappy_ray.functions.multimodal import (decode_images,
                                                  png_encode_filtered)

    ids = _read_table(sf_dir, "embeddings",
                      columns=["vec_id"]).column("vec_id").to_pylist()[:100]

    def grad(i: int) -> bytes:
        w, h = 6 + i % 6, 4 + i % 4
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = (np.arange(w, dtype=np.uint32) * (17 + i) % 256
                        ).astype(np.uint8)
        img[:, :, 1] = (np.arange(h, dtype=np.uint32)[:, None] * (29 + i)
                        % 256).astype(np.uint8)
        img[:, :, 2] = (i * 7) % 256
        return png_encode_filtered(img)

    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "payload": pa.array([grad(i) for i in ids], pa.binary()),
    })
    return decode_images(ray.data.from_arrow(tbl), real=True).sort("id")


def _q_mm_decode_jpeg(sf_dir: str):
    """REAL baseline-JPEG decode, no third-party codec (functions/
    jpeg.py via multimodal.StdlibJpegDecoder): deterministic fixtures
    cycling grayscale / RGB 4:4:4 / RGB 4:2:0 / restart-marker
    variants plus PROGRESSIVE (SOF2) encodes, so every decoder path
    (single + multi component, chroma sync, RSTn, all four
    progressive scan types) runs — width/height/mean_px/phash per
    image.
    Golden-backed oracle (not SQL-expressible)."""
    import ray.data

    from scrappy_ray.functions.jpeg import jpeg_encode
    from scrappy_ray.functions.multimodal import StdlibJpegDecoder

    ids = _read_table(sf_dir, "embeddings",
                      columns=["vec_id"]).column("vec_id").to_pylist()[:64]

    def fixture(i: int) -> bytes:
        w, h = 16 + (i * 7) % 24, 12 + (i * 5) % 20
        yy, xx = np.mgrid[0:h, 0:w]
        if i % 5 == 0:  # grayscale
            img = ((xx * (3 + i) + yy * (5 + i)) % 256).astype(np.uint8)
            return jpeg_encode(img, quality=90)
        img = np.stack([(xx * (3 + i)) % 256, (yy * (5 + i)) % 256,
                        (xx + yy + i) % 256], axis=-1).astype(np.uint8)
        if i % 5 == 1:
            return jpeg_encode(img, quality=85, subsampling="444")
        if i % 5 == 2:
            return jpeg_encode(img, quality=75, subsampling="420")
        if i % 5 == 3:
            return jpeg_encode(img, quality=85, subsampling="420",
                               restart_interval=2)
        from scrappy_ray.functions.jpeg import jpeg_encode_progressive

        return jpeg_encode_progressive(img, quality=80,
                                       subsampling="420")

    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "payload": pa.array([fixture(i) for i in ids], pa.binary()),
    })
    return ray.data.from_arrow(tbl).map_batches(
        StdlibJpegDecoder, batch_format="pyarrow", zero_copy_batch=True,
        batch_size=16, concurrency=2).sort("id")


def _q_img_dedup(sf_dir: str):
    """Image near-duplicate pairs (functions/multimodal.py::
    image_near_dup_pairs): 20 distinct base images each published 3×
    (PNG lossless + JPEG Q95 + JPEG Q85 — the re-encoded-mirror
    pattern of real crawls) → real stdlib decode → 64-bit dHash →
    banded Hamming buckets → verified pairs. Every within-group pair
    and no cross-group pair survives. Golden-backed oracle (not
    SQL-expressible)."""
    import ray.data

    from scrappy_ray.functions.jpeg import jpeg_encode
    from scrappy_ray.functions.multimodal import (image_near_dup_pairs,
                                                  png_encode_filtered)

    ids = []
    payloads = []
    for g in range(20):
        # coarse per-group random blocks (8x8 cells upsampled 5x7):
        # structurally distinct dHashes across groups, and blocky
        # content that survives JPEG re-encode within a few bits
        rng = np.random.RandomState(1000 + g)
        base = np.kron(rng.randint(0, 256, (8, 8), dtype=np.int64),
                       np.ones((5, 7), np.int64)).astype(np.uint8)
        rgb = np.stack([base, base, base], axis=-1)
        variants = [png_encode_filtered(rgb),
                    jpeg_encode(base, quality=95),
                    jpeg_encode(base, quality=85)]
        for v, payload in enumerate(variants):
            ids.append(g * 10 + v)
            payloads.append(payload)
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    return image_near_dup_pairs(
        ray.data.from_arrow(tbl)).sort(["id_a", "id_b"])


def _q_img_resize(sf_dir: str):
    """Image resize/thumbnail stage (functions/multimodal.py::
    resize_images): mixed PNG + JPEG + GIF + BMP fixtures (and one
    garbage payload) → real magic-sniffed decode → area-mean resample to
    16×12 → REAL PNG re-encode. Deterministic output bytes.
    Golden-backed oracle."""
    import ray.data

    from scrappy_ray.functions.jpeg import jpeg_encode
    from scrappy_ray.functions.multimodal import (png_encode_filtered,
                                                  resize_images)

    from scrappy_ray.functions.gif import bmp_encode_gray, gif_encode_gray

    ids = []
    payloads = []
    for i in range(30):
        rng = np.random.RandomState(3000 + i)
        base = np.kron(rng.randint(0, 256, (6, 8), dtype=np.int64),
                       np.ones((7, 6), np.int64)).astype(np.uint8)
        if i % 5 == 0:
            payloads.append(png_encode_filtered(
                np.stack([base] * 3, axis=-1)))
        elif i % 5 == 1:
            payloads.append(jpeg_encode(base, quality=92))
        elif i % 5 == 2:
            payloads.append(jpeg_encode(base, quality=80,
                                        subsampling="444"))
        elif i % 5 == 3:
            payloads.append(gif_encode_gray(base, interlace=i % 10 == 3))
        else:
            payloads.append(bmp_encode_gray(base,
                                            bottom_up=i % 10 == 4))
        ids.append(i)
    ids.append(99)
    payloads.append(b"not an image")
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    out = resize_images(ray.data.from_arrow(tbl), out_w=16, out_h=12)

    def digest(t: pa.Table) -> pa.Table:
        # driver-comparable projection: the raw PNG bytes hashed to a
        # hex digest (binary columns don't survive the hash compare)
        import hashlib

        shas = [None if p is None
                else hashlib.blake2b(p, digest_size=12).hexdigest()
                for p in t.column("payload").to_pylist()]
        nb = [None if p is None else len(p)
              for p in t.column("payload").to_pylist()]
        return pa.table({
            "id": t.column("id"),
            "payload_sha": pa.array(shas, pa.string()),
            "n_bytes": pa.array(nb, pa.int64()),
            "width": t.column("width"),
            "height": t.column("height"),
            "ok": t.column("ok"),
        })

    return out.map_batches(digest, batch_format="pyarrow").sort("id")


def _q_audio_dedup(sf_dir: str):
    """Audio near-duplicate pairs (functions/multimodal.py::
    audio_near_dup_pairs): 12 distinct 8-segment melodies, each
    published 3× (full gain, 0.4× gain, 30-frame trim — the
    re-encoded-mirror pattern for audio) → real WAV decode →
    energy-delta fingerprint → banded Hamming pairs. Every
    within-group pair, no cross-group pair. Golden-backed oracle."""
    import io
    import wave

    import ray.data

    from scrappy_ray.functions.multimodal import audio_near_dup_pairs

    def melody_pcm(seed: int) -> np.ndarray:
        rng = np.random.RandomState(seed)
        segs = []
        sr = 8000
        for s in range(8):
            f = float(rng.choice([220, 294, 330, 392, 440, 523]))
            amp = float(rng.uniform(0.2, 0.9))
            t = np.arange(500, dtype=np.float64) / sr
            segs.append(np.sin(2 * np.pi * f * t) * amp)
        return np.concatenate(segs)

    def to_wav(x: np.ndarray, gain: float = 1.0) -> bytes:
        pcm = np.round(np.clip(x * gain, -1, 1) * 32767.0).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    ids = []
    payloads = []
    for g in range(12):
        x = melody_pcm(4000 + g)
        for v, payload in enumerate([to_wav(x), to_wav(x, gain=0.4),
                                     to_wav(x[:-30])]):
            ids.append(g * 10 + v)
            payloads.append(payload)
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    return audio_near_dup_pairs(
        ray.data.from_arrow(tbl)).sort(["id_a", "id_b"])


def _q_audio_resample(sf_dir: str):
    """Audio sample-rate normalization (functions/multimodal.py::
    resample_audio): tones at mixed source rates (8/11.025/22.05 kHz,
    mono + stereo, plus one garbage payload) → real WAV decode →
    linear resample to 16 kHz mono → real WAV re-encode, projected
    to payload digests for the driver compare. Golden-backed."""
    import ray.data

    from scrappy_ray.functions.multimodal import (make_fake_wav,
                                                  resample_audio)

    ids = []
    payloads = []
    rates = [8000, 11025, 22050]
    for i in range(24):
        ids.append(i)
        payloads.append(make_fake_wav(
            220 + 30 * (i % 7), n_frames=400 + 50 * (i % 5),
            sample_rate=rates[i % 3], amplitude=0.3 + 0.05 * (i % 4),
            n_channels=1 + i % 2))
    ids.append(99)
    payloads.append(b"not audio")
    tbl = pa.table({"id": pa.array(ids, pa.int64()),
                    "payload": pa.array(payloads, pa.binary())})
    out = resample_audio(ray.data.from_arrow(tbl), target_rate=16000)

    def digest(t: pa.Table) -> pa.Table:
        import hashlib

        pl = t.column("payload").to_pylist()
        return pa.table({
            "id": t.column("id"),
            "payload_sha": pa.array(
                [None if p is None
                 else hashlib.blake2b(p, digest_size=12).hexdigest()
                 for p in pl], pa.string()),
            "sample_rate": t.column("sample_rate"),
            "n_frames": t.column("n_frames"),
            "ok": t.column("ok"),
        })

    return out.map_batches(digest, batch_format="pyarrow").sort("id")


def _q_mm_dedup_clusters(sf_dir: str):
    """Cross-modal dedup composition: the same corpus row carries
    text, an image payload, and an audio payload; near-dup pairs are
    hunted independently per modality (simhash text / dHash image /
    energy-fingerprint audio — all through the shared banding) and
    the UNION of the three pair sets feeds dedup_by_components, so a
    mirror is caught if ANY modality survives re-encoding. 12 groups
    of 3 mirrors (each group linked by a different modality mix) + 6
    singletons → keep-set of component-min ids. Golden-backed."""
    import ray.data

    from scrappy_ray.functions.dedup import (dedup_by_components,
                                             simhash_pairs)
    from scrappy_ray.functions.jpeg import jpeg_encode
    from scrappy_ray.functions.multimodal import (audio_near_dup_pairs,
                                                  image_near_dup_pairs,
                                                  png_encode_filtered)

    import io
    import wave

    def wav(seed: int, gain: float = 1.0, trim: int = 0) -> bytes:
        rng = np.random.RandomState(seed)
        segs = []
        for _ in range(8):
            f = float(rng.choice([220, 294, 330, 392, 440, 523]))
            amp = float(rng.uniform(0.2, 0.9))
            t = np.arange(500, dtype=np.float64) / 8000
            segs.append(np.sin(2 * np.pi * f * t) * amp)
        x = np.concatenate(segs)
        if trim:
            x = x[:-trim]
        pcm = np.round(np.clip(x * gain, -1, 1) * 32767.0).astype(np.int16)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(pcm.tobytes())
        return buf.getvalue()

    def image(seed: int, quality: int | None) -> bytes:
        rng = np.random.RandomState(seed)
        base = np.kron(rng.randint(0, 256, (8, 8), dtype=np.int64),
                       np.ones((5, 7), np.int64)).astype(np.uint8)
        if quality is None:
            return png_encode_filtered(np.stack([base] * 3, axis=-1))
        return jpeg_encode(base, quality=quality)

    # wide vocab so "distinct" random texts are simhash-distant (a
    # 10-word vocab makes every bag-of-words look alike)
    words = np.array([f"w{n:04d}" for n in range(4000)])
    rows = {"doc_id": [], "text": [], "image": [], "audio": []}
    for g in range(12):
        rng = np.random.RandomState(7000 + g)
        base_text = " ".join(rng.choice(words, 120))
        for v in range(3):
            rows["doc_id"].append(g * 10 + v)
            link = g % 3  # which modality ties this group together
            # the linking modality stays a near-dup; the others are
            # made DISTINCT per variant (unique seeds) to prove the
            # union is what catches the mirror
            if link == 0:  # text link: same words, tiny edit
                rows["text"].append(base_text + " extra" * min(v, 1)
                                    + " more" * (v == 2))
                rows["image"].append(image(9000 + g * 10 + v, 95))
                rows["audio"].append(wav(9500 + g * 10 + v))
            elif link == 1:  # image link: re-encoded same image
                rng2 = np.random.RandomState(7100 + g * 10 + v)
                rows["text"].append(" ".join(rng2.choice(words, 120)))
                rows["image"].append(image(8000 + g,
                                           [None, 95, 85][v]))
                rows["audio"].append(wav(9600 + g * 10 + v))
            else:  # audio link: gain/trim variants of one melody
                rng2 = np.random.RandomState(7200 + g * 10 + v)
                rows["text"].append(" ".join(rng2.choice(words, 120)))
                rows["image"].append(image(9100 + g * 10 + v, 95))
                rows["audio"].append(wav(8100 + g,
                                         gain=[1.0, 0.4, 1.0][v],
                                         trim=[0, 0, 30][v]))
    for s in range(6):
        rng2 = np.random.RandomState(7300 + s)
        rows["doc_id"].append(500 + s)
        rows["text"].append(" ".join(rng2.choice(words, 120)))
        rows["image"].append(image(9800 + s, 95))
        rows["audio"].append(wav(9900 + s))

    tbl = pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "text": pa.array(rows["text"], pa.string()),
        "image": pa.array(rows["image"], pa.binary()),
        "audio": pa.array(rows["audio"], pa.binary()),
    })
    ds = ray.data.from_arrow(tbl)

    def proj(col: str):
        return ds.map_batches(
            lambda t, c=col: pa.table({"id": t.column("doc_id"),
                                       "payload": t.column(c)}),
            batch_format="pyarrow")

    tp = simhash_pairs(ds, text_col="text", id_col="doc_id")
    ip = image_near_dup_pairs(proj("image")).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b"]),
        batch_format="pyarrow")
    ap = audio_near_dup_pairs(proj("audio")).map_batches(
        lambda t: t.rename_columns(["id_a", "id_b"]),
        batch_format="pyarrow")
    pairs = tp.union(ip).union(ap).materialize()
    return (dedup_by_components(ds, pairs, id_col="doc_id")
            .select_columns(["doc_id"]).sort("doc_id"))


def _q_mm_frames_apng(sf_dir: str):
    """REAL video-container frame sampling, no third-party codec
    (functions/multimodal.py::ApngFrameSampler): deterministic APNG
    animations (per-id frame count and size, cycling scanline
    filters) sampled at stride 2 by the real=True actor pool — one
    row per sampled, actually-decoded frame. Golden-backed oracle."""
    import ray.data

    from scrappy_ray.functions.multimodal import apng_encode, sample_frames

    ids = _read_table(sf_dir, "embeddings",
                      columns=["vec_id"]).column("vec_id").to_pylist()[:60]

    def vid(i: int) -> bytes:
        w, h, n = 4 + i % 5, 3 + i % 4, 3 + i % 6
        frames = []
        for f in range(n):
            img = np.zeros((h, w, 3), np.uint8)
            img[:, :, 0] = (np.arange(w, dtype=np.uint32) * (11 + i + f)
                            % 256).astype(np.uint8)
            img[:, :, 1] = (np.arange(h, dtype=np.uint32)[:, None]
                            * (13 + f) % 256).astype(np.uint8)
            img[:, :, 2] = (i * 5 + f * 3) % 256
            frames.append(img)
        return apng_encode(frames)

    tbl = pa.table({
        "id": pa.array(ids, pa.int64()),
        "payload": pa.array([vid(i) for i in ids], pa.binary()),
    })
    return sample_frames(ray.data.from_arrow(tbl), stride=2,
                         real=True).sort(["id", "frame_idx"])


def _q_audio_decode(sf_dir: str):
    """Audio column stage with a REAL decoder (stdlib WAV/PCM — no
    third-party codec needed, unlike the image/video seams): decode
    deterministic sine-tone WAVs and extract duration/RMS/peak in an
    actor-pool pass sized for large binaries
    (functions/multimodal.py::WavAudioDecoder)."""
    import ray.data

    from scrappy_ray.functions.multimodal import decode_audio, make_fake_wav

    ids = _read_table(sf_dir, "embeddings", columns=["vec_id"]).column("vec_id").to_pylist()[:200]
    tbl = pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "payload": pa.array(
                [make_fake_wav(100.0 + (i % 20) * 10.0,
                               n_frames=320 + (i % 5) * 80,
                               amplitude=0.2 + (i % 4) * 0.2) for i in ids],
                pa.binary(),
            ),
        }
    )
    return decode_audio(ray.data.from_arrow(tbl)).sort("id")


def _messy_urls_table(batch: pa.Table) -> pa.Table:
    """Deterministic messy URL per document (shared by the Ray query
    and — as the same string expression — the SQL oracle): uppercase
    scheme+host, default port, alternating trailing slash + fragment,
    and a 50-way path collision so canonical groups have real dups."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src = np.asarray(batch.column("source").to_pylist(), dtype=str)
    url = np.char.add("HTTP://", np.char.add(np.char.upper(src), ".TEST:80/Doc/"))
    url = np.char.add(url, (ids % 50).astype(str))
    url = np.char.add(url, np.where(ids % 2 == 0, "/", ""))
    url = np.char.add(url, np.where(ids % 4 == 0, "#frag", ""))
    return pa.table({"doc_id": batch.column("doc_id"), "url": pa.array(url.tolist(), pa.string())})


def _q_url_dedup(sf_dir: str):
    from scrappy_ray.functions.webtext import url_dedup

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        _messy_urls_table, batch_format="pyarrow"
    )
    return url_dedup(ds, url_col="url", id_col="doc_id").sort("canonical_url")


def _trap_urls_table(batch: pa.Table) -> pa.Table:
    """Deterministic trap-shaped URL per document (Ray and SQL share
    the expression): source-derived host, doc_id%8 path segments,
    query string on doc_id%3 — hosts whose ids skew deep/query-heavy
    trip the trap verdict."""
    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    src = np.asarray(batch.column("source").to_pylist(), dtype=str)
    url = np.char.add("http://", np.char.add(src, ".test/"))
    url = np.char.add(url, np.char.multiply("s/", (ids % 8).astype(int)))
    url = np.char.add(
        url, np.where(ids % 3 == 0, np.char.add("?p=", (ids % 20).astype(str)), "")
    )
    return pa.table({"doc_id": batch.column("doc_id"),
                     "url": pa.array(url.tolist(), pa.string())})


def _q_url_traps(sf_dir: str):
    """Per-host crawler-trap signals (functions/webtext.py::
    url_trap_stats): partial per-batch host aggregates → one
    O(hosts×blocks) groupby → depth/query-ratio verdicts."""
    from scrappy_ray.functions.webtext import url_trap_stats

    ds = _read(sf_dir, "documents", columns=["doc_id", "source"]).map_batches(
        _trap_urls_table, batch_format="pyarrow"
    )
    return url_trap_stats(ds, max_query_ratio=0.4, max_depth=7).sort("host")


def _q_pii_scrub(sf_dir: str):
    import pyarrow.compute as pc

    from scrappy_ray.functions.webtext import scrub_pii_array

    def add_pii_and_scrub(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        sid = pc.cast(batch.column("doc_id"), pa.string())
        phone4 = pc.utf8_lpad(pa.array((ids % 10000).astype(str).tolist()), width=4, padding="0")
        ip3 = pa.array((ids % 256).astype(str).tolist())
        ip4 = pa.array((ids % 100).astype(str).tolist())
        parts = [
            pc.cast(batch.column("text"), pa.string()),
            pa.array([" contact user"] * batch.num_rows), sid,
            pa.array(["@example.com or +1 (555) 010-"] * batch.num_rows), phone4,
            pa.array([" ip 10.0."] * batch.num_rows), ip3,
            pa.array(["."] * batch.num_rows), ip4,
        ]
        messy = pc.binary_join_element_wise(*parts, "")
        return pa.table({"doc_id": batch.column("doc_id"), "scrubbed": scrub_pii_array(messy)})

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(add_pii_and_scrub, batch_format="pyarrow").sort("doc_id")


def _q_span_removal(sf_dir: str):
    """Dolma-style span attributes (functions/spans.py): a regex
    tagger emits a standalone (doc_id, start, end, tag) attribute
    table; the applier folds it per doc, LEFT OUTER joins back and
    cuts the spans — tag once, re-apply policy cheaply. Oracled
    against a single-pass regexp_replace deletion."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.spans import apply_span_removal, tag_spans
    from scrappy_ray.functions.webtext import PII_PATTERNS

    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def inject(batch: pa.Table) -> pa.Table:
        sid = pc.cast(batch.column("doc_id"), pa.string())
        messy = pc.binary_join_element_wise(
            pc.cast(batch.column("text"), pa.string()),
            pa.scalar(" contact user"), sid,
            pa.scalar("@example.com for details"), "")
        return pa.table({"doc_id": batch.column("doc_id"), "text": messy})

    messy = docs.map_batches(inject, batch_format="pyarrow")
    email_pat = PII_PATTERNS[0][0]
    spans = tag_spans(messy, email_pat, "email", concurrency=2)
    return apply_span_removal(messy, spans, tags=["email"]).sort("doc_id")


def _q_normalize_text(sf_dir: str):
    import pyarrow.compute as pc

    from scrappy_ray.functions.webtext import normalize_text_array

    def mess_and_norm(batch: pa.Table) -> pa.Table:
        t = pc.cast(batch.column("text"), pa.string())
        # inject NFD combining accents + whitespace runs, then normalize
        t = pc.replace_substring(t, pattern="a", replacement="á")
        t = pc.replace_substring(t, pattern=" ", replacement="\t \t")
        return pa.table(
            {"doc_id": batch.column("doc_id"), "normalized": normalize_text_array(t)}
        )

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(mess_and_norm, batch_format="pyarrow").sort("doc_id")


# ------------------------------------------------------------- link graph


def _synth_edges(sf_dir: str):
    """Deterministic link graph over doc_ids — ring (src → src+1 mod N,
    so every node has out- AND in-degree ≥ 1: the SQL oracle then needs
    no dangling-mass or missing-node terms) plus 0–3 arithmetic extras
    per node; DISTINCT to mirror the oracle's edge-set semantics."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.dedup import _distinct

    n = _read_table(sf_dir, "documents", columns=["doc_id"]).num_rows

    def explode(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("doc_id"), pa.int64()).combine_chunks().to_numpy(
            zero_copy_only=False
        )
        srcs, dsts = [d], [(d + 1) % n]
        for i in (1, 2, 3):
            m = (d % 3) >= i
            srcs.append(d[m])
            dsts.append((d[m] * 31 + i * 17) % n)
        src = np.concatenate(srcs)
        dst = np.concatenate(dsts)
        keep = src != dst
        return pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})

    edges = _read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        explode, batch_format="pyarrow"
    )
    return _distinct(edges, ["src", "dst"])


_PR_DAMP, _PR_ITERS, _PR_IROUND = 0.85, 10, 9


def _q_pagerank(sf_dir: str):
    import pyarrow.compute as pc

    from scrappy_ray.functions.graph import pagerank

    n = _read_table(sf_dir, "documents", columns=["doc_id"]).num_rows
    nodes = _read(sf_dir, "documents", columns=["doc_id"])
    ranks = pagerank(
        _synth_edges(sf_dir),
        nodes,
        node_col="doc_id",
        damping=_PR_DAMP,
        iters=_PR_ITERS,
        iter_round=_PR_IROUND,
    )

    def norm(batch: pa.Table) -> pa.Table:
        # ranks ~1/N don't survive a fixed-digit final round; report the
        # N-normalized rank (mean 1.0) quantized to 1e-6 — via integer
        # scaling (round(x·1e6, 0)/1e6), NOT round(x, 6): engines pick
        # different adjacent doubles for the same unrepresentable
        # rounded decimal (same failure mode _graph_sqls documents)
        r = pc.divide(
            pc.round(
                pc.multiply(
                    pc.multiply(batch.column("rank"), pa.scalar(float(n))),
                    pa.scalar(1e6),
                ),
                ndigits=0,
                round_mode="half_towards_infinity",
            ),
            pa.scalar(1e6),
        )
        return pa.table({"node": batch.column("node"), "rank_norm": r})

    return ranks.map_batches(norm, batch_format="pyarrow").sort("node")


def _q_graph_degrees(sf_dir: str):
    from scrappy_ray.functions.graph import degree_table

    return degree_table(_synth_edges(sf_dir)).sort("node")


_EDGES_SQL = """
    nodes AS (SELECT doc_id AS node FROM documents),
    nn AS (SELECT count(*) AS c, count(*)::DOUBLE AS n FROM documents),
    edges AS (
      SELECT DISTINCT src, dst FROM (
        SELECT node AS src, (node + 1) % (SELECT c FROM nn) AS dst FROM nodes
        UNION ALL
        SELECT node AS src, (node * 31 + i * 17) % (SELECT c FROM nn) AS dst
        FROM nodes CROSS JOIN generate_series(1, 3) t(i)
        WHERE i <= node % 3
      ) WHERE src != dst
    )"""


def _graph_sqls() -> dict[str, str]:
    """PageRank as unrolled CTEs (one per power iteration) — DuckDB's
    recursive CTEs disallow referencing the working table inside the
    aggregate+outer-join step, so the fixed iteration count is unrolled.
    The arithmetic mirrors functions/graph.py::pagerank quantized mode
    EXACTLY: ranks are exact integer "units" (multiples of 10^-{ir}),
    per-edge contributions are rounded to whole units BEFORE the sum
    (integer sums are order-independent — plain double sums differ in
    the last ulp between engines/block layouts and flip quantization
    ties), and every literal is ::DOUBLE (bare `0.85` is a DuckDB
    DECIMAL: `(1 - 0.85)/n` in exact decimal arithmetic yields a
    different teleport double than IEEE `(1.0 - 0.85)/n` — a 1-ulp
    gap that flips ties, measured at sf0.01 node 483)."""
    scale = f"{10.0 ** _PR_IROUND:.1f}::DOUBLE"
    damp = f"{_PR_DAMP!r}::DOUBLE"
    # teleport in units, evaluated with the same op order as the Python
    # driver: ((1.0 - d) / n) * scale
    tele = f"((1.0::DOUBLE - {damp}) / (SELECT n FROM nn)) * {scale}"
    parts = [
        "WITH " + _EDGES_SQL + ",",
        "    deg AS (SELECT src, count(*)::DOUBLE AS outdeg FROM edges GROUP BY src),",
        "    wedges AS (SELECT e.src, e.dst, 1.0::DOUBLE / d.outdeg AS w"
        " FROM edges e JOIN deg d ON d.src = e.src),",
        f"    pr0 AS (SELECT node, round({scale} / (SELECT n FROM nn), 0)"
        " AS rank FROM nodes),",
    ]
    for k in range(_PR_ITERS):
        parts.append(
            f"""    pr{k + 1} AS (
      SELECT n2.node,
             round({tele}
                    + {damp} * coalesce(c.contrib, 0.0::DOUBLE), 0) AS rank
      FROM nodes n2 LEFT JOIN (
        SELECT e.dst AS node, sum(round(p.rank * e.w, 0)) AS contrib
        FROM pr{k} p JOIN wedges e ON e.src = p.node
        GROUP BY e.dst) c ON c.node = n2.node),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT node, round(((rank / {scale}) * (SELECT n FROM nn))"
        f" * 1000000.0::DOUBLE, 0) / 1000000.0::DOUBLE AS rank_norm"
        f" FROM pr{_PR_ITERS} ORDER BY node"
    )
    return {
        "pagerank": "\n".join(parts),
        "graph_degrees": "WITH "
        + _EDGES_SQL
        + """
    SELECT node, CAST(SUM(out_d) AS BIGINT) AS out_degree,
           CAST(SUM(in_d) AS BIGINT) AS in_degree
    FROM (SELECT src AS node, 1 AS out_d, 0 AS in_d FROM edges
          UNION ALL SELECT dst, 0, 1 FROM edges)
    GROUP BY node ORDER BY node""",
        "graph_reciprocity": "WITH "
        + _EDGES_SQL
        + """
    SELECT e1.src AS node, COUNT(*)::BIGINT AS n_out,
           COUNT(e2.src)::BIGINT AS n_reciprocal,
           ROUND(COUNT(e2.src)::DOUBLE / COUNT(*), 6) AS reciprocity
    FROM edges e1 LEFT JOIN edges e2
      ON e2.src = e1.dst AND e2.dst = e1.src
    GROUP BY e1.src ORDER BY node""",
        "graph_triangles": "WITH "
        + _EDGES_SQL
        + """,
    u AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
          FROM edges),
    t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
          FROM u e1 JOIN u e2 ON e2.a = e1.b
          JOIN u e3 ON e3.a = e1.a AND e3.b = e2.b)
    SELECT node, COUNT(*)::BIGINT AS n_triangles
    FROM (SELECT x AS node FROM t
          UNION ALL SELECT y FROM t
          UNION ALL SELECT z FROM t)
    GROUP BY node ORDER BY node""",
    }


# ----------------------------------------------------------------- crawl


def _q_anchor_texts(sf_dir: str):
    import ray.data

    from scrappy_ray.functions.webtext import anchor_texts
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for

    ds = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return anchor_texts(ds).sort("dst")


def _q_main_content(sf_dir: str):
    import ray.data

    from scrappy_ray.functions.boilerplate import extract_main_content
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for

    ds = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return extract_main_content(ds).sort("url")


def _q_extract_triples(sf_dir: str):
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for, triples_table

    return triples_table(pages_dir_for(sf_dir)).sort(["url", "s", "p", "o", "lit"])


def _q_extract_text(sf_dir: str):
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for, text_table

    return text_table(pages_dir_for(sf_dir)).sort("url")


def _q_serialize_roundtrip(sf_dir: str):
    """S4/S7 sink round trip as an oracle query: extraction triples →
    partitioned ntriples sink (one .nt shard per block) → ntriples
    SOURCE → rows. Freezes the serializer's term normalization (CURIE
    expansion, bnode mangling, literal escaping) and the parser's
    inverse at the value level."""
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for, triples_table
    from scrappy_ray.sources.serializers import read_ntriples, write_ntriples

    td = tempfile.mkdtemp(prefix="nt_roundtrip_", dir="/tmp")
    write_ntriples(triples_table(pages_dir_for(sf_dir)).select_columns(["s", "p", "o", "lit"]), td)
    return read_ntriples(td).sort(["s", "p", "o", "lit"])


def _q_warc_roundtrip(sf_dir: str):
    """WARC sink → WARC source round trip as an oracle query: the
    documents table becomes per-block ``.warc.gz`` shards (ISO 28500
    response records, one gzip member each — the Common Crawl layout),
    read back by the WARC source and projected to (doc_id, text).
    Oracled against the documents table itself, so it freezes record
    framing, HTTP message split, and multi-member gzip handling."""
    import pyarrow.compute as pc

    from scrappy_ray.sources.warc import read_warc, write_warc_datasink

    out_dir = tempfile.mkdtemp(prefix="warc_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_payload(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "url": pc.binary_join_element_wise(
                pa.scalar("http://corpus.test/doc/"),
                pc.cast(batch.column("doc_id"), pa.string()), pa.scalar("")),
            "payload": pc.cast(
                pc.fill_null(pc.cast(batch.column("text"), pa.string()), ""),
                pa.binary()),
        })

    write_warc_datasink(docs.map_batches(to_payload, batch_format="pyarrow"),
                        out_dir)

    def project(batch: pa.Table) -> pa.Table:
        ids = pc.cast(
            pc.replace_substring_regex(batch.column("target_uri"), r"^.*/", ""),
            pa.int64())
        return pa.table({"doc_id": ids,
                         "text": pc.cast(batch.column("payload"), pa.string())})

    return read_warc(out_dir).map_batches(project, batch_format="pyarrow").sort("doc_id")


def _q_sitemap_parse(sf_dir: str):
    """Sitemap source round trip (sources/sitemap.py): one synthetic
    <urlset> per source (built by groupby(source) from documents),
    parsed back distributed; the oracle rebuilds the SAME (url,
    lastmod) rows straight from documents — the parser must invert the
    builder exactly."""
    import pyarrow.compute as pc

    from scrappy_ray.sources.sitemap import parse_sitemaps

    docs = _read(sf_dir, "documents", columns=["doc_id", "source"])

    def build(g: pa.Table) -> pa.Table:
        g = g.sort_by([("doc_id", "ascending")])
        ids = g.column("doc_id").to_pylist()
        src = g.column("source")[0].as_py()
        entries = "".join(
            f"<url><loc>http://{src}.test/doc/{i}</loc>"
            f"<lastmod>2026-01-{1 + i % 28:02d}</lastmod></url>"
            for i in ids
        )
        return pa.table({"xml": pa.array(
            [f'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{entries}</urlset>'],
            pa.string())})

    sitemaps = docs.groupby("source").map_groups(build, batch_format="pyarrow")
    out = parse_sitemaps(sitemaps, concurrency=2)

    def shape(batch: pa.Table) -> pa.Table:
        return pa.table({"url": batch.column("url"),
                         "lastmod": batch.column("lastmod")})

    return out.map_batches(shape, batch_format="pyarrow").sort("url")


def _q_jsonl_roundtrip(sf_dir: str):
    """JSONL sink → source round trip (the standard LLM-corpus
    interchange format), via Ray Data's native write_json/read_json —
    per-block shards out, schema-inferred stream back; oracled against
    the source table so escaping and type round-tripping are frozen."""
    import ray.data

    out_dir = tempfile.mkdtemp(prefix="jsonl_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    docs.write_json(out_dir)
    return (
        ray.data.read_json(out_dir)
        .select_columns(["doc_id", "text", "lang", "source"])
        .sort("doc_id")
    )


def _q_jsonl_gz_roundtrip(sf_dir: str):
    """Compressed-JSONL round trip (.jsonl.gz — the shipping format of
    public webtext corpora): gzip out via Arrow's codec, stream back."""
    import ray.data
    from ray.data.datasource.filename_provider import FilenameProvider

    class _GzNames(FilenameProvider):
        def get_filename_for_block(self, block, write_uuid, task_index, block_index):
            return f"{write_uuid}_{task_index:06}_{block_index:06}.jsonl.gz"

    out_dir = tempfile.mkdtemp(prefix="jsonl_gz_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    docs.write_json(out_dir, arrow_open_stream_args={"compression": "gzip"},
                    filename_provider=_GzNames())
    return (
        ray.data.read_json(out_dir,
                           arrow_open_stream_args={"compression": "gzip"})
        .select_columns(["doc_id", "text", "lang", "source"])
        .sort("doc_id")
    )


def _q_csv_roundtrip(sf_dir: str):
    """CSV sink → source round trip (metadata-table interchange):
    quoting/escaping and type inference frozen against the source."""
    import ray.data

    out_dir = tempfile.mkdtemp(prefix="csv_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    docs.write_csv(out_dir)
    return (
        ray.data.read_csv(out_dir)
        .select_columns(["doc_id", "text", "lang", "source"])
        .sort("doc_id")
    )


def _q_ipc_roundtrip(sf_dir: str):
    """Arrow IPC (Feather V2) sink → source round trip
    (sources/ipc.py): the zero-parse warm-shard interchange format —
    zstd-compressed buffers out, per-file parse tasks back; oracled
    against the source table so typing round-trips bit-for-bit."""
    from scrappy_ray.sources.ipc import read_ipc, write_ipc

    out_dir = tempfile.mkdtemp(prefix="ipc_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "lang", "source"])
    write_ipc(docs, out_dir, compression="zstd")
    return (
        read_ipc(out_dir)
        .select_columns(["doc_id", "text", "lang", "source"])
        .sort("doc_id")
    )


def _q_robots_stats(sf_dir: str):
    import ray.data

    from scrappy_ray.functions.webtext import robots_stats
    from scrappy_ray.pipelines.crawl_pipeline import pages_dir_for

    ds = ray.data.read_parquet(pages_dir_for(sf_dir), columns=["url", "html"])
    return robots_stats(ds).sort("host")


def _q_export_roundtrip(sf_dir: str):
    """Resumable deterministic shard export → read-back round trip
    (pipelines/export.py): documents spill into hash-routed shard
    parts, compact into sorted atomic shard files with _DONE markers,
    and must read back row-identical to the source."""
    import ray.data

    from scrappy_ray.pipelines.export import export_shards

    out_dir = tempfile.mkdtemp(prefix="export_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    export_shards(docs, out_dir, num_shards=4)
    import glob as _g

    return (
        ray.data.read_parquet(sorted(_g.glob(os.path.join(out_dir, "shard-*.parquet"))))
        .sort("doc_id")
    )


def _q_crawl_bfs(sf_dir: str):
    from scrappy_ray.pipelines.crawl_pipeline import crawl_job

    ckpt = tempfile.mkdtemp(prefix="crawl_bfs_", dir="/tmp")
    res = crawl_job(sf_dir, ckpt, depth=-1)
    return res.schedule_table()


def _q_crawl_politeness(sf_dir: str):
    from scrappy_ray.pipelines.crawl_pipeline import crawl_job

    ckpt = tempfile.mkdtemp(prefix="crawl_pol_", dir="/tmp")
    res = crawl_job(sf_dir, ckpt, depth=-1, host_budget=5, robots=True)
    return res.schedule_table().sort_by([("round", "ascending"), ("seq", "ascending")])


def _q_crawl_priority(sf_dir: str):
    """Priority-frontier crawl (north_star scheduler mode): per-host
    politeness grants rank by (priority desc, seq) and a global round
    budget pops the best K granted rows per superstep. Semantics are
    simulator-parity-tested (tests/test_crawl.py); this query freezes
    the value-level output."""
    from scrappy_ray.pipelines.crawl_pipeline import crawl_job

    ckpt = tempfile.mkdtemp(prefix="crawl_prio_", dir="/tmp")
    res = crawl_job(
        sf_dir, ckpt, depth=-1, host_budget=5,
        frontier_order="priority", priority_fn="short_url", round_budget=12,
    )
    return res.schedule_table().sort_by([("round", "ascending"), ("seq", "ascending")])


def _q_crawl_hostrank(sf_dir: str):
    """Authority-driven recrawl (pipelines/rankcrawl.py): host-level
    PageRank of the previous crawl's link graph → frozen (host, score)
    parquet → priority crawl whose frontier pops high-authority hosts
    first. Deterministic (quantized PageRank + deterministic crawl) →
    golden-oracled."""
    from scrappy_ray.pipelines.crawl_pipeline import crawl_job, pages_dir_for
    from scrappy_ray.pipelines.rankcrawl import host_rank_table

    tmp = tempfile.mkdtemp(prefix="crawl_hostrank_", dir="/tmp")
    scores = os.path.join(tmp, "host_scores.parquet")
    host_rank_table(pages_dir_for(sf_dir), scores, iters=5)
    res = crawl_job(
        sf_dir, os.path.join(tmp, "ckpt"), depth=-1, host_budget=5,
        frontier_order="priority", priority_fn=f"host_rank:{scores}",
        round_budget=12,
    )
    return res.schedule_table().sort_by([("round", "ascending"), ("seq", "ascending")])


# ------------------------------------------------------ eighth wave: stats


def _q_weighted_sample(sf_dir: str):
    """Weight-proportional sample without replacement (functions/
    sampling.py::weighted_sample): Efraimidis-Spirakis keys u^(1/w) on
    the shared Knuth hash, distributed partial top-k — no RNG state."""
    from scrappy_ray.functions.sampling import weighted_sample

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return weighted_sample(ds, k=100, weight_col="n_chars",
                           id_col="doc_id", salt=7).sort("doc_id")


def _q_source_overlap(sf_dir: str):
    """Content-identity set algebra between two sources (functions/
    webtext.py::source_overlap): INTERSECT / EXCEPT from two bit
    columns, one O(distinct-keys) shuffle, no joins."""
    from scrappy_ray.functions.webtext import source_overlap

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return source_overlap(ds, "src0", "src1").sort("content_key")


def _q_salted_join(sf_dir: str):
    """Skew-safe salted hash join (pipelines/relational.py::
    salted_join): hot keys fan out over ``salts`` shuffle partitions,
    small side replicated once per salt. Output ≡ the plain join."""
    import pyarrow.compute as pc  # noqa: F401  (closure import pattern)

    from scrappy_ray.pipelines.relational import salted_join

    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_name", "c_mktsegment"]).map_batches(
        lambda t: t.rename_columns(["o_custkey", "c_name", "c_mktsegment"]),
        batch_format="pyarrow")
    out = salted_join(orders, cust, on="o_custkey", salts=4,
                      num_partitions=8)
    return out.select_columns(
        ["o_orderkey", "o_custkey", "c_name", "c_mktsegment"]
    ).sort("o_orderkey")


def _q_profile_table(sf_dir: str):
    """Per-column dataset profile (functions/stats.py::profile_table):
    block-side deduped (column, value) pairs bound the distinct-count
    shuffle; min/max/null reduce over an O(columns × blocks) table."""
    from scrappy_ray.functions.stats import profile_table

    ds = _read(sf_dir, "documents",
               columns=["doc_id", "lang", "source", "n_chars"])
    return profile_table(ds, ["doc_id", "lang", "source", "n_chars"]
                         ).sort_by([("col_name", "ascending")])


def _q_group_corr(sf_dir: str):
    """Per-source Pearson corr(n_chars, n_tokens) (functions/stats.py::
    group_corr): exact int64 moment sums per batch, O(groups) shuffle,
    float math once on the aggregated table in oracle operation order."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.stats import group_corr

    ds = _read(sf_dir, "documents", columns=["source", "text", "n_chars"])

    def with_tokens(batch: pa.Table) -> pa.Table:
        nt = pc.list_value_length(
            pc.split_pattern(pc.cast(batch.column("text"), pa.string()), " "))
        return pa.table({
            "source": batch.column("source"),
            "n_chars": batch.column("n_chars"),
            "n_tokens": pc.cast(nt, pa.int64()),
        })

    return group_corr(ds.map_batches(with_tokens, batch_format="pyarrow"),
                      "source", "n_chars", "n_tokens", digits=6)


def _q_group_outliers(sf_dir: str):
    """Per-group z-score outliers (functions/stats.py::group_outliers):
    exact int64 (n, Σx, Σx²) sums → tiny (mean, sd) table broadcast
    back into a streaming filter; z rounded before the threshold."""
    from scrappy_ray.functions.stats import group_outliers

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    # 1.5σ, not the textbook 2.0: the synthetic n_chars is near-uniform
    # per source (max |z| ≈ √3), so 2.0 would select nothing at any SF.
    return group_outliers(ds, "source", "n_chars", "doc_id",
                          z_thresh=1.5, digits=6).sort("doc_id")


def _q_session_ids(sf_dir: str):
    """Per-event session assignment (pipelines/analytics.py::
    session_ids): 30-min inactivity gap, (ts, id)-ordered cumsum per
    user inside groupby().map_groups."""
    from scrappy_ray.pipelines.analytics import session_ids

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return session_ids(ds).sort("event_id")


def _q_event_transitions(sf_dir: str):
    """Markov transition counts (pipelines/analytics.py::
    event_transitions): per-user bigram partials inside map_groups,
    O(types²) global aggregate."""
    from scrappy_ray.pipelines.analytics import event_transitions

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return event_transitions(ds)


def _q_value_histogram(sf_dir: str):
    """Equi-width histogram of events.value (pipelines/analytics.py::
    value_histogram): tiny min/max pass then streaming per-block
    bincounts; bin arithmetic in oracle IEEE operation order."""
    from scrappy_ray.pipelines.analytics import value_histogram

    ds = _read(sf_dir, "events", columns=["value"])
    return value_histogram(ds, "value", nbins=20)


def _q_cube_orders(sf_dir: str):
    """GROUP BY CUBE (pipelines/analytics.py::cube_counts): ROLLUP's
    levels plus the status-only margin, all derived from one O(groups)
    fine aggregate."""
    from scrappy_ray.pipelines.analytics import cube_counts

    ds = _read(sf_dir, "orders",
               columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    t = cube_counts(ds, "o_orderpriority", "o_orderstatus",
                    "o_totalprice", scale=2)
    return t.sort_by([("o_orderpriority", "ascending"),
                      ("o_orderstatus", "ascending")])


def _q_mode_event_type(sf_dir: str):
    """Deterministic per-user modal event type (pipelines/
    relational.py::mode_per_group): partial (user, type) counts then a
    top-1 cut with lexicographic tie-break."""
    from scrappy_ray.pipelines.relational import mode_per_group

    ds = _read(sf_dir, "events", columns=["user_id", "event_type"])
    return mode_per_group(ds, "user_id", "event_type").sort("user_id")


def _q_bloom_semi_join(sf_dir: str):
    """Bloom-prefiltered semi-join (pipelines/relational.py::
    bloom_semi_join): docs whose content fingerprint appears among the
    src0 reference keys — the constant-size-broadcast decontamination
    shape; exact join confirm makes the output oracle-equal."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.dedup import _md5_col
    from scrappy_ray.pipelines.relational import bloom_semi_join

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column("text"), pa.string()),
                                " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, 8), " ")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "source": batch.column("source"),
            "content_key": _md5_col(prefix.to_pylist()),
        })

    docs = _read(sf_dir, "documents",
                 columns=["doc_id", "text", "source"]).map_batches(
        keyed, batch_format="pyarrow")
    ref = docs.filter(expr="source == 'src0'").select_columns(["content_key"])
    out = bloom_semi_join(docs, "content_key", ref, "content_key")
    return out.select_columns(["doc_id"]).sort("doc_id")


def _q_graph_triangles(sf_dir: str):
    """Per-node triangle counts (functions/graph.py::triangle_counts):
    degree-oriented wedge join (the O(E^1.5) shape) — the triangle set,
    and therefore the per-node counts, equal the oracle's id-ordered
    enumeration."""
    from scrappy_ray.functions.graph import triangle_counts

    return triangle_counts(_synth_edges(sf_dir))


def _q_mad_outliers(sf_dir: str):
    """Robust per-group outliers (functions/stats.py::mad_outliers):
    |x − median| > 1.5 × MAD, exact integer medians
    (percentile_disc), two tiny broadcast tables around one streaming
    pass."""
    from scrappy_ray.functions.stats import mad_outliers

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return mad_outliers(ds, "source", "n_chars", "doc_id",
                        k=1.5).sort("doc_id")


def _q_distinct_users(sf_dir: str):
    """Exact COUNT(DISTINCT user) per event type (functions/stats.py::
    distinct_count_by_group): per-block deduped pairs, two hash
    aggregates — the exact companion of the approx_distinct HLL."""
    from scrappy_ray.functions.stats import distinct_count_by_group

    ds = _read(sf_dir, "events", columns=["event_type", "user_id"])
    return distinct_count_by_group(ds, "event_type", "user_id")


def _q_dist_windows(sf_dir: str):
    """PERCENT_RANK / CUME_DIST per user (pipelines/analytics.py::
    dist_windows): run-length ranks normalized to [0,1], rounded like
    the oracle."""
    from scrappy_ray.pipelines.analytics import dist_windows

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "value"])
    return dist_windows(ds, "user_id", "value", "event_id").sort("event_id")


def _q_char_entropy(sf_dir: str):
    """Per-doc Shannon character entropy (functions/textstats.py::
    char_entropy): one utf-32 buffer + uint64 (doc, char) keys +
    np.unique per batch — the low-entropy filler-document signal."""
    from scrappy_ray.functions.textstats import char_entropy

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return char_entropy(ds).sort("doc_id")


def _q_partition_prune(sf_dir: str):
    """Resumable partitioned output + partition-pruned read-back:
    write_parquet(partition_cols=['source']) lays one directory per
    source (a failed 100 TB run skips finished partitions; SURVEY §7
    resumability), then the read back opens ONLY the src3 directory —
    the other partitions never leave storage."""
    import glob as _g

    import ray.data

    out_dir = tempfile.mkdtemp(prefix="partition_prune_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    docs.write_parquet(out_dir, partition_cols=["source"])
    part = os.path.join(out_dir, "source=src3")
    files = sorted(_g.glob(os.path.join(part, "*.parquet")))
    return (ray.data.read_parquet(files)
            .select_columns(["doc_id", "n_chars"]).sort("doc_id"))


def _q_hopping_windows(sf_dir: str):
    """Overlapping 2h-window / 1h-hop aggregate (pipelines/
    analytics.py::hopping_windows): vectorized in-batch fan-out +
    partial (window, n, cents) aggregates — O(windows × blocks)
    shuffle, no range join."""
    from scrappy_ray.pipelines.analytics import hopping_windows

    H = 3_600_000_000
    ds = _read(sf_dir, "events", columns=["ts", "value"])
    return hopping_windows(ds, "ts", "value", window_us=2 * H, hop_us=H)


def _q_first_last(sf_dir: str):
    """Join-free ARG_MIN/ARG_MAX per user (pipelines/relational.py::
    first_last_per_group): each block ships 2 rows per (group, block);
    the (ts, event_id) tiebreaker makes first/last total-ordered."""
    from scrappy_ray.pipelines.relational import first_last_per_group

    ds = _read(sf_dir, "events",
               columns=["user_id", "ts", "event_id", "event_type"])
    return first_last_per_group(ds, "user_id", ["ts", "event_id"],
                                "event_type").sort("user_id")


def _q_group_summary(sf_dir: str):
    """Per-source summary stats (functions/stats.py::group_summary):
    exact int64 moments + min/max in one partial pass, float math once
    in oracle operation order."""
    from scrappy_ray.functions.stats import group_summary

    ds = _read(sf_dir, "documents", columns=["source", "n_chars"])
    return group_summary(ds, "source", "n_chars", digits=6)


def _q_weighted_mean(sf_dir: str):
    """Quantity-weighted mean discount per returnflag (functions/
    stats.py::weighted_mean): exact fixed-point Σ(w·x)/Σw — the
    drift-free distributed weighted average."""
    from scrappy_ray.functions.stats import weighted_mean

    ds = _read(sf_dir, "lineitem",
               columns=["l_returnflag", "l_discount", "l_quantity"])
    return weighted_mean(ds, "l_returnflag", "l_discount", "l_quantity",
                         value_scale=4, weight_scale=2, digits=6)


def _q_embedding_norms(sf_dir: str):
    """Per-vector L2 norms (functions/similarity.py::embedding_norms):
    1e-6-quantized int64 squares so the row sums are exact — numpy
    pairwise vs SQL sequential float summation can't diverge."""
    from scrappy_ray.functions.similarity import embedding_norms

    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return embedding_norms(ds).sort("vec_id")


def _q_calendar_profile(sf_dir: str):
    """Event load calendar (pipelines/analytics.py::calendar_profile):
    (dow, hour) counts from one shared epoch-arithmetic formula —
    O(168 × blocks) shuffle."""
    from scrappy_ray.pipelines.analytics import calendar_profile

    return calendar_profile(_read(sf_dir, "events", columns=["ts"]))


def _q_type_token_ratio(sf_dir: str):
    """Per-doc lexical diversity (functions/textstats.py::
    type_token_ratio): dictionary-encode + uint64 (doc, code) keys +
    one np.unique per batch."""
    from scrappy_ray.functions.textstats import type_token_ratio

    ds = _read(sf_dir, "documents", columns=["doc_id", "text"])
    return type_token_ratio(ds).sort("doc_id")


def _q_vocab_by_source(sf_dir: str):
    """Exact vocabulary size per source (functions/webtext.py::
    vocab_by_source): block-side deduped (source, token) pairs over
    the exploded token stream."""
    from scrappy_ray.functions.webtext import vocab_by_source

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return vocab_by_source(ds)


def _q_source_vocab_jaccard(sf_dir: str):
    """Pairwise source vocabulary Jaccard (functions/webtext.py::
    source_vocab_jaccard): distinct-pair self-join on token, final
    math on the O(sources²) table."""
    from scrappy_ray.functions.webtext import source_vocab_jaccard

    ds = _read(sf_dir, "documents", columns=["text", "source"])
    return source_vocab_jaccard(ds)


def _q_global_rank(sf_dir: str):
    """Distributed global ROW_NUMBER + uniform quantile transform
    (pipelines/relational.py::global_rank): O(distinct values) driver
    prefix-sum, per-value-group local ranks — zipWithIndex without a
    global sort materialization."""
    from scrappy_ray.pipelines.relational import global_rank

    ds = _read(sf_dir, "documents", columns=["doc_id", "n_chars"])
    return global_rank(ds, "n_chars", "doc_id").sort("doc_id")


def _q_user_growth(sf_dir: str):
    """Cumulative-distinct user growth (pipelines/analytics.py::
    user_growth): first-seen day per user via one min aggregate, then
    an O(days) driver cumsum — never a per-day distinct over prefixes."""
    from scrappy_ray.pipelines.analytics import user_growth

    return user_growth(_read(sf_dir, "events",
                             columns=["user_id", "ts"]))


def _q_longest_session(sf_dir: str):
    """Longest session per user — a composition: session_ids assigns
    per-event sessions, a count aggregate sizes them, and
    top_k_per_group cuts the max (ties -> lowest session id)."""
    from scrappy_ray.pipelines.analytics import session_ids
    from scrappy_ray.pipelines.relational import top_k_per_group

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    sized = (session_ids(ds)
             .groupby(["user_id", "session_id"]).count()
             .map_batches(lambda t: t.rename_columns(
                 ["user_id", "session_id", "n_events"]),
                 batch_format="pyarrow"))
    return top_k_per_group(sized, "user_id", key="n_events", k=1,
                           descending=True,
                           tiebreak="session_id").sort("user_id")


def _q_daily_quantiles(sf_dir: str):
    """Quantile bands over time — p50/p95 of value per epoch-day
    (composition: a day-bucket map + relational.group_quantiles).
    The time-series twin of value_quantiles."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.relational import group_quantiles

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["ts", "value"])

    def day_of(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column("ts"), pa.int64())
        return pa.table({
            "day": pc.divide(ts, DAY_US),
            "value": batch.column("value"),
        })

    return group_quantiles(ds.map_batches(day_of, batch_format="pyarrow"),
                           "day", "value", [0.5, 0.95],
                           digits=4).sort("day")


def _q_type_cooccurrence(sf_dir: str):
    """Unordered event-type co-occurrence per user (pipelines/
    analytics.py::type_cooccurrence): distinct-pair self-join on user,
    fanout ≤ types² per user."""
    from scrappy_ray.pipelines.analytics import type_cooccurrence

    return type_cooccurrence(_read(sf_dir, "events",
                                   columns=["user_id", "event_type"]))


def _q_rfm_customers(sf_dir: str):
    """RFM segmentation inputs per customer: most recent order day
    (epoch-day), order count, exact-cents monetary total — one
    partial-aggregated groupby over orders."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _cents

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "orders",
               columns=["o_custkey", "o_orderdate", "o_totalprice"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "o_custkey": batch.column("o_custkey"),
            "d": pc.divide(pc.cast(batch.column("o_orderdate"),
                                   pa.int64()), DAY_US),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
            "c": _cents(batch.column("o_totalprice"), 2),
        })
        g = t.group_by(["o_custkey"]).aggregate(
            [("d", "max"), ("one", "sum"), ("c", "sum")])
        return g.rename_columns(["o_custkey", "last_day", "n_orders",
                                 "cents"])

    from ray.data.aggregate import Max, Sum

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("o_custkey")
           .aggregate(Max("last_day", alias_name="last_day"),
                      Sum("n_orders", alias_name="n_orders"),
                      Sum("cents", alias_name="cents")))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": batch.column("o_custkey"),
            "last_day": pc.cast(batch.column("last_day"), pa.int64()),
            "n_orders": pc.cast(batch.column("n_orders"), pa.int64()),
            "total_spend": pc.divide(
                pc.cast(batch.column("cents"), pa.float64()), 100.0),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort(
        "o_custkey")


def _q_dup_rate_by_source(sf_dir: str):
    """Duplication audit per source: docs vs distinct content keys,
    dup_ratio = 1 − distinct/docs — per-block deduped pairs + two hash
    aggregates (the distinct_count_by_group discipline over the shared
    md5-prefix fingerprint)."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.dedup import _md5_col
    from scrappy_ray.functions.stats import distinct_count_by_group
    from scrappy_ray.pipelines.analytics import _to_table

    ds = _read(sf_dir, "documents", columns=["text", "source"])

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column("text"), pa.string()),
                                " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, 8), " ")
        return pa.table({
            "source": batch.column("source"),
            "content_key": _md5_col(prefix.to_pylist()),
        })

    keyed_ds = ds.map_batches(keyed, batch_format="pyarrow").materialize()
    counts = _to_table(keyed_ds.groupby("source").count()).rename_columns(
        ["source", "n_docs"])
    distinct = _to_table(distinct_count_by_group(keyed_ds, "source",
                                                 "content_key"))
    n_by = {counts.column("source")[i].as_py():
            counts.column("n_docs")[i].as_py()
            for i in range(counts.num_rows)}
    src = sorted(n_by)
    nd = {distinct.column("source")[i].as_py():
          distinct.column("n_distinct")[i].as_py()
          for i in range(distinct.num_rows)}
    n = np.array([n_by[s] for s in src], np.int64)
    d = np.array([nd[s] for s in src], np.int64)
    return pa.table({
        "source": pa.array(src, pa.string()),
        "n_docs": pa.array(n, pa.int64()),
        "n_distinct": pa.array(d, pa.int64()),
        "dup_ratio": pc.round(
            pa.array(1.0 - d / n, pa.float64()), ndigits=6,
            round_mode="half_towards_infinity"),
    })


def _q_late_events(sf_dir: str):
    """Per-user event-time watermark flags (pipelines/analytics.py::
    late_events): running-max accumulate per arrival order; late =
    watermark already passed the event's own time."""
    from scrappy_ray.pipelines.analytics import late_events

    ds = _read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    return late_events(ds).sort("event_id")


def _q_json_field_stats(sf_dir: str):
    """Per-type aggregate of the JSON props field (pipelines/
    analytics.py::json_field_stats): vectorized RE2 extract, exact
    int64 sums, no per-row json.loads."""
    from scrappy_ray.pipelines.analytics import json_field_stats

    return json_field_stats(_read(sf_dir, "events",
                                  columns=["event_type", "props"]))


def _q_embedding_dim_stats(sf_dir: str):
    """Per-dimension embedding mean/variance (functions/similarity.py::
    embedding_dim_stats): quantized-exact int64 moments per dimension —
    the embedding-drift monitor."""
    from scrappy_ray.functions.similarity import embedding_dim_stats

    ds = _read(sf_dir, "embeddings", columns=["embedding"])
    return embedding_dim_stats(ds, dims=64)


def _q_chi_square(sf_dir: str):
    """Chi-square contingency audit over (source, lang) (functions/
    stats.py::chi_square_cells): observed vs independence-expected per
    cell, one O(cells) shuffle."""
    from scrappy_ray.functions.stats import chi_square_cells

    ds = _read(sf_dir, "documents", columns=["source", "lang"])
    return chi_square_cells(ds, "source", "lang")


def _q_daily_change(sf_dir: str):
    """Day-over-day event-count change per type: O(types × days)
    partial counts, then a per-type LAG inside map_groups (composition
    of the analytics primitives)."""
    import pyarrow.compute as pc

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "event_type": batch.column("event_type"),
            "day": pc.divide(pc.cast(batch.column("ts"), pa.int64()),
                             DAY_US),
            "one": pa.array(np.ones(batch.num_rows, np.int64)),
        })
        g = t.group_by(["event_type", "day"]).aggregate([("one", "sum")])
        return g.rename_columns(["event_type", "day", "n"])

    counts = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["event_type", "day"]).sum("n")
              .map_batches(lambda t: t.rename_columns(
                  ["event_type", "day", "n"]), batch_format="pyarrow"))

    def lagged(group: pa.Table) -> pa.Table:
        g = group.sort_by([("day", "ascending")])
        n = np.asarray(pc.cast(g.column("n"), pa.int64()))
        prev = np.r_[np.int64(-1), n[:-1]]
        have = prev >= 0
        with np.errstate(divide="ignore", invalid="ignore"):
            chg = (n - prev) / prev
        return pa.table({
            "event_type": g.column("event_type"),
            "day": pc.cast(g.column("day"), pa.int64()),
            "n": pa.array(n, pa.int64()),
            "prev_n": pa.array(np.where(have, prev, 0), pa.int64(),
                               mask=~have),
            "pct_change": pc.round(
                pa.array(chg, pa.float64(), mask=~have), ndigits=6,
                round_mode="half_towards_infinity"),
        })

    return (counts.groupby("event_type")
            .map_groups(lagged, batch_format="pyarrow")
            .sort(["event_type", "day"]))


def _q_dedup_best(sf_dir: str):
    """Exact dedup keeping the BEST representative (longest text, tie →
    lowest id) instead of min-id — the content-key groups cut by
    top_k_per_group on (n_chars desc, doc_id asc)."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.dedup import _md5_col
    from scrappy_ray.pipelines.relational import top_k_per_group

    ds = _read(sf_dir, "documents", columns=["doc_id", "text", "n_chars"])

    def keyed(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(pc.cast(batch.column("text"), pa.string()),
                                " ")
        prefix = pc.binary_join(pc.list_slice(toks, 0, 8), " ")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_chars": batch.column("n_chars"),
            "content_key": _md5_col(prefix.to_pylist()),
        })

    kept = top_k_per_group(ds.map_batches(keyed, batch_format="pyarrow"),
                           "content_key", key="n_chars", k=1,
                           descending=True, tiebreak="doc_id")
    return kept.select_columns(["doc_id", "n_chars"]).sort("doc_id")


def _q_orc_roundtrip(sf_dir: str):
    """ORC source+sink round trip (sources/orcfile.py): one atomic
    shard per block out, per-file parse with column pruning back —
    the Hive/Spark-warehouse interchange format."""
    import glob as _g

    from scrappy_ray.sources.orcfile import read_orc, write_orc

    out_dir = tempfile.mkdtemp(prefix="orc_roundtrip_", dir="/tmp")
    docs = _read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    write_orc(docs.repartition(4), out_dir)
    files = sorted(_g.glob(os.path.join(out_dir, "*.orc")))
    return read_orc(files, columns=["doc_id", "text"]).sort("doc_id")


def _q_rolling_median(sf_dir: str):
    """Trailing 5-row moving median per user (pipelines/relational.py::
    rolling_median): one np.median over a sliding window view — the
    robust smoother."""
    from scrappy_ray.pipelines.relational import rolling_median

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "value"])
    return rolling_median(ds, "user_id", "ts", "value", "event_id",
                          window=5).sort("event_id")


def _q_longest_streak(sf_dir: str):
    """Gaps-and-islands per user (pipelines/relational.py::
    longest_streak): longest run of the same event type under the
    (ts, id) order, deterministic tie-break."""
    from scrappy_ray.pipelines.relational import longest_streak

    ds = _read(sf_dir, "events",
               columns=["event_id", "user_id", "ts", "event_type"])
    return longest_streak(ds, "user_id", "ts", "event_type",
                          "event_id").sort("user_id")


def _q_winsorize(sf_dir: str):
    """Per-source winsorization of n_chars to the exact [p05, p95]
    percentile_disc band (functions/stats.py::winsorize): two grouped
    percentiles broadcast around one streaming clip."""
    from scrappy_ray.functions.stats import winsorize

    ds = _read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    return winsorize(ds, "source", "n_chars", "doc_id",
                     lo_q=0.05, hi_q=0.95).sort("doc_id")


def _q_user_entropy(sf_dir: str):
    """Per-user behavioral entropy (pipelines/analytics.py::
    user_entropy): exact (user, type) counts, -Σ p·log2 p once per
    user — the single-action-bot signal."""
    from scrappy_ray.pipelines.analytics import user_entropy

    return user_entropy(_read(sf_dir, "events",
                              columns=["user_id", "event_type"]))


def _q_conversion_time(sf_dir: str):
    """Funnel latency view→purchase (pipelines/analytics.py::
    conversion_time): O(users) first-seen pair table, exact disc
    percentiles of the delay in seconds."""
    from scrappy_ray.pipelines.analytics import conversion_time

    return conversion_time(_read(
        sf_dir, "events", columns=["user_id", "event_type", "ts"]))


def _q_tpch_q3(sf_dir: str):
    """TPC-H Q3 shape (shipping-priority top-10): segment-filtered
    customers gate orders (broadcast keep-set), the filtered order
    side broadcast-joins into lineitem, exact-cents revenue per order,
    distributed top-10. Revenue stays integer through the cut so the
    top-k boundary can't flip on float drift."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.relational import broadcast_join, top_k

    cust = _read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_mktsegment"])
    keep = cust.filter(pc.equal(cust.column("c_mktsegment"),
                                "BUILDING")).column("c_custkey")
    keep = keep.combine_chunks()
    orders = _read_table(sf_dir, "orders",
                         columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.filter(pc.is_in(orders.column("o_custkey"),
                                    value_set=keep))
    small = pa.table({
        "l_orderkey": orders.column("o_orderkey"),
        "o_orderdate": orders.column("o_orderdate"),
    })

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def cents(batch: pa.Table) -> pa.Table:
        rev = pc.multiply(
            pc.multiply(batch.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    batch.column("l_discount"))),
            pa.scalar(100.0))
        c = pc.cast(pc.round(rev, round_mode="half_towards_infinity"),
                    pa.int64())
        t = pa.table({"l_orderkey": batch.column("l_orderkey"),
                      "o_orderdate": batch.column("o_orderdate"),
                      "c": c})
        g = t.group_by(["l_orderkey", "o_orderdate"]).aggregate(
            [("c", "sum")])
        return g.rename_columns(["l_orderkey", "o_orderdate", "c"])

    joined = broadcast_join(li, small, on="l_orderkey")
    agg = (joined.map_batches(cents, batch_format="pyarrow")
           .groupby(["l_orderkey", "o_orderdate"]).sum("c")
           .map_batches(lambda t: t.rename_columns(
               ["l_orderkey", "o_orderdate", "c"]), batch_format="pyarrow"))
    top = top_k(agg, key="c", k=10, descending=True, tiebreak="l_orderkey")

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "revenue": pc.divide(pc.cast(batch.column("c"), pa.float64()),
                                 100.0),
            "o_orderdate": pc.strftime(batch.column("o_orderdate"),
                                       "%Y-%m-%d"),
        })

    return top.map_batches(finalize, batch_format="pyarrow")


def _q_tpch_q5(sf_dir: str):
    """TPC-H Q5 shape (local-supplier volume per nation): ONE
    distributed hash join (lineitem ⋈ orders — the two corpus-sized
    sides), every dimension broadcast (customer/supplier nation maps,
    nation names), exact-cents revenue, O(nations) output."""
    import pyarrow.compute as pc

    from scrappy_ray.common import drop_empty_blocks

    cust = _read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_nationkey"])
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_nationkey"])
    nat = _read_table(sf_dir, "nation",
                      columns=["n_nationkey", "n_name"])
    ckeys = cust.column("c_custkey").combine_chunks()
    cnat = np.asarray(cust.column("c_nationkey"), dtype=np.int64)
    skeys = supp.column("s_suppkey").combine_chunks()
    snat = np.asarray(supp.column("s_nationkey"), dtype=np.int64)
    nkeys = nat.column("n_nationkey").combine_chunks()
    nnames = np.asarray(nat.column("n_name").to_pylist(), dtype=object)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    joined = drop_empty_blocks(li).join(drop_empty_blocks(orders),
                                        "inner", 8, on=("l_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        ci = np.asarray(pc.fill_null(pc.index_in(
            batch.column("o_custkey"), value_set=ckeys), -1).cast(
                pa.int64()), dtype=np.int64)
        si = np.asarray(pc.fill_null(pc.index_in(
            batch.column("l_suppkey"), value_set=skeys), -1).cast(
                pa.int64()), dtype=np.int64)
        ok = (ci >= 0) & (si >= 0)
        ok &= cnat[np.maximum(ci, 0)] == snat[np.maximum(si, 0)]
        b = batch.filter(pa.array(ok))
        if b.num_rows == 0:
            return pa.table({"n_name": pa.array([], pa.string()),
                             "c": pa.array([], pa.int64())})
        ni = np.asarray(pc.fill_null(pc.index_in(
            pa.array(cnat[np.asarray(pc.cast(pc.index_in(
                b.column("o_custkey"), value_set=ckeys), pa.int64()),
                dtype=np.int64)], pa.int64()),
            value_set=nkeys), -1).cast(pa.int64()), dtype=np.int64)
        rev = pc.multiply(
            pc.multiply(b.column("l_extendedprice"),
                        pc.subtract(pa.scalar(1.0),
                                    b.column("l_discount"))),
            pa.scalar(100.0))
        c = np.asarray(pc.cast(pc.round(
            rev, round_mode="half_towards_infinity"), pa.int64()),
            dtype=np.int64)
        t = pa.table({"n_name": pa.array(nnames[ni], pa.string()),
                      "c": pa.array(c, pa.int64())})
        g = t.group_by(["n_name"]).aggregate([("c", "sum")])
        return g.rename_columns(["n_name", "c"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("n_name").sum("c"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.table({
            "n_name": batch.column("n_name"),
            "revenue": pc.divide(
                pc.cast(batch.column("sum(c)"), pa.float64()), 100.0),
        })

    return agg.map_batches(finalize, batch_format="pyarrow").sort("n_name")


def _q_tpch_q18(sf_dir: str):
    """TPC-H Q18 shape (large-volume orders): per-order quantity sums
    via per-block partial aggregates (the one O(orders) shuffle Q18
    inherently needs), HAVING-filter BEFORE any join so only the tiny
    qualifying set (threshold-bounded by construction) is gathered and
    broadcast back over orders; customer names resolved from a
    broadcast dim. No order row ever crosses a second shuffle."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "q": pc.cast(batch.column("l_quantity"), pa.int64()),
        })
        return t.group_by(["l_orderkey"]).aggregate(
            [("q", "sum")]).rename_columns(["l_orderkey", "q"])

    sums = (li.map_batches(partial, batch_format="pyarrow")
            .groupby("l_orderkey").sum("q")
            .map_batches(lambda t: t.rename_columns(["l_orderkey", "q"])
                         .filter(pc.greater(t.column(1), 250)),
                         batch_format="pyarrow"))
    big = _to_table(sums)  # ≤ the HAVING-qualifying orders: tiny
    okeys = big.column("l_orderkey").combine_chunks()
    oqty = np.asarray(big.column("q"), dtype=np.int64)

    cust = _read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ckeys = cust.column("c_custkey").combine_chunks()
    cnames = np.asarray(cust.column("c_name").to_pylist(), dtype=object)

    def pick(batch: pa.Table) -> pa.Table:
        oi = np.asarray(pc.fill_null(pc.index_in(
            batch.column("o_orderkey"), value_set=okeys), -1).cast(
                pa.int64()), dtype=np.int64)
        b = batch.filter(pa.array(oi >= 0))
        if b.num_rows == 0:
            return pa.table({
                "c_name": pa.array([], pa.string()),
                "o_custkey": pa.array([], pa.int64()),
                "o_orderkey": pa.array([], pa.int64()),
                "o_orderdate": pa.array([], pa.timestamp("us")),
                "o_totalprice": pa.array([], pa.float64()),
                "sum_qty": pa.array([], pa.int64()),
            })
        oi = oi[oi >= 0]
        ci = np.asarray(pc.cast(pc.index_in(
            b.column("o_custkey"), value_set=ckeys), pa.int64()),
            dtype=np.int64)
        return pa.table({
            "c_name": pa.array(cnames[ci], pa.string()),
            "o_custkey": pc.cast(b.column("o_custkey"), pa.int64()),
            "o_orderkey": pc.cast(b.column("o_orderkey"), pa.int64()),
            "o_orderdate": pc.cast(b.column("o_orderdate"),
                                   pa.timestamp("us")),
            "o_totalprice": pc.cast(b.column("o_totalprice"), pa.float64()),
            "sum_qty": pa.array(oqty[oi], pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate",
                            "o_totalprice"])
    out = _to_table(orders.map_batches(pick, batch_format="pyarrow"))
    return out.sort_by([("o_totalprice", "descending"),
                        ("o_orderkey", "ascending")]).slice(0, 100)


def _q_tpch_q4(sf_dir: str):
    """TPC-H Q4 shape (EXISTS semi-join + aggregate): orders with at
    least one returned lineitem, counted per priority. The matching
    orderkey set is ~half the orders — far too big to broadcast — so:
    block-local dedup of filtered lineitem keys, one hash-distinct
    shuffle, a distributed inner join against a 2-column orders
    projection (semi-join via pre-distincted keys), then per-block
    partial priority counts into an O(priorities) groupby."""
    import pyarrow.compute as pc

    from scrappy_ray.common import drop_empty_blocks

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def rkeys(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        return (t.select(["l_orderkey"])
                .group_by(["l_orderkey"]).aggregate([]))

    keys = (li.map_batches(rkeys, batch_format="pyarrow")
            .groupby("l_orderkey").count()
            .map_batches(lambda t: t.select(["l_orderkey"]),
                         batch_format="pyarrow"))
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
        batch_format="pyarrow")
    joined = drop_empty_blocks(keys).join(drop_empty_blocks(orders),
                                          "inner", 8, on=("l_orderkey",))

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_orderpriority"]).aggregate([([], "count_all")])
        return g.rename_columns(["o_orderpriority", "c"])

    agg = (joined.map_batches(partial, batch_format="pyarrow")
           .groupby("o_orderpriority").sum("c"))
    return agg.map_batches(
        lambda t: t.rename_columns(["o_orderpriority", "order_count"]),
        batch_format="pyarrow").sort("o_orderpriority")


def _q_group_linreg(sf_dir: str):
    """Per-source OLS fit of n_tokens on n_chars (functions/stats.py::
    group_linreg): exact int64 moment partials per batch, O(sources)
    shuffle, slope/intercept/R² float math once in oracle op order."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.stats import group_linreg

    ds = _read(sf_dir, "documents", columns=["source", "text", "n_chars"])

    def with_tokens(batch: pa.Table) -> pa.Table:
        nt = pc.list_value_length(
            pc.split_pattern(pc.cast(batch.column("text"), pa.string()), " "))
        return pa.table({
            "source": batch.column("source"),
            "n_chars": batch.column("n_chars"),
            "n_tokens": pc.cast(nt, pa.int64()),
        })

    return group_linreg(ds.map_batches(with_tokens, batch_format="pyarrow"),
                        "source", "n_chars", "n_tokens", digits=6)


def _q_autocorr(sf_dir: str):
    """Lag-1 value autocorrelation per (event_type, day)
    (pipelines/analytics.py::lag1_autocorr): day-bounded map_groups,
    exact cents-quantized integer moments, one float pass per group."""
    from scrappy_ray.pipelines.analytics import lag1_autocorr

    return lag1_autocorr(_read(sf_dir, "events",
                               columns=["event_id", "ts", "event_type",
                                        "value"]))


def _q_skyline(sf_dir: str):
    """Pareto frontier of parts — cheapest price for the largest size
    (pipelines/relational.py::skyline): per-block vectorized local
    frontier, tiny union gathered once, one final pass; driver memory
    O(frontier) regardless of table size."""
    from scrappy_ray.pipelines.relational import skyline

    out = skyline(_read(sf_dir, "part",
                        columns=["p_partkey", "p_retailprice", "p_size"]),
                  "p_retailprice", "p_size")
    return out.sort_by([("p_partkey", "ascending")])


def _q_type_sequences(sf_dir: str):
    """Per-user ordered event-type trajectory (pipelines/analytics.py::
    type_sequences): the SQL string_agg(... ORDER BY) shape as one
    binary_join per group, O(users) output rows."""
    from scrappy_ray.pipelines.analytics import type_sequences

    return type_sequences(_read(
        sf_dir, "events", columns=["event_id", "user_id", "ts",
                                   "event_type"]))


def _q_full_outer_daily(sf_dir: str):
    """FULL OUTER JOIN of two per-day grouped slices, rewritten
    join-free (pipelines/analytics.py::daily_compare): per-block
    partial (day, views, purchases) counts + one O(days) groupby-sum;
    missing days coalesce to 0 without any join."""
    from scrappy_ray.pipelines.analytics import daily_compare

    return daily_compare(_read(sf_dir, "events",
                               columns=["ts", "event_type"]),
                         "view", "purchase")


def _q_event_gaps(sf_dir: str):
    """Inter-event gap percentiles per type (pipelines/analytics.py::
    event_gaps): vectorized int64-µs diffs inside map_groups, exact
    disc percentiles — the engagement-cadence view."""
    from scrappy_ray.pipelines.analytics import event_gaps

    return event_gaps(_read(
        sf_dir, "events", columns=["event_id", "user_id", "ts",
                                   "event_type"]))


def _q_redirect_chains(sf_dir: str):
    """Redirect-chain resolution (functions/graph.py::
    resolve_pointers): pointer doubling over a synthetic acyclic
    301-graph (doc_id → doc_id-1 where doc_id % 4 ≠ 0) — chain length
    halves per all-to-all, the distributed list-ranking shape; oracled
    against a DuckDB recursive CTE."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.graph import resolve_pointers

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pc.not_equal(pc.bit_wise_and(d, pa.scalar(3, pa.int64())),
                            pa.scalar(0, pa.int64()))
        t = pa.table({"src": d, "dst": pc.subtract(
            d, pa.scalar(1, pa.int64()))})
        return t.filter(keep)

    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return resolve_pointers(edges)


def _q_badwords_filter(sf_dir: str):
    """C4-style blocklist policy report (functions/webtext.py::
    badword_stats): one pc.is_in over the flattened token array per
    batch, O(sources) partial rows per block."""
    from scrappy_ray.functions.webtext import badword_stats

    return badword_stats(_read(sf_dir, "documents",
                               columns=["text", "source"]),
                         ["dup", "spark", "stream"])


def _q_graph_bfs(sf_dir: str):
    """Multi-source BFS link distance (functions/graph.py::
    bfs_depths): min hops from the seed set (doc_id % 16 == 0) over a
    synthetic chain+skip graph (doc_id → +1 and → +4) — frontier
    expansion, one all-to-all per round, every node expanded once;
    oracled against a DuckDB recursive CTE with UNION dedup."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.graph import bfs_depths

    docs = _read(sf_dir, "documents", columns=["doc_id"])
    mx = docs.max("doc_id")

    def mk_edges(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("doc_id"), pa.int64())
        parts = []
        for step in (1, 4):
            dst = pc.add(d, pa.scalar(step, pa.int64()))
            t = pa.table({"src": d, "dst": dst})
            parts.append(t.filter(pc.less_equal(
                dst, pa.scalar(mx, pa.int64()))))
        return pa.concat_tables(parts)

    def mk_seeds(batch: pa.Table) -> pa.Table:
        d = pc.cast(batch.column("doc_id"), pa.int64())
        keep = pc.equal(pc.bit_wise_and(d, pa.scalar(15, pa.int64())),
                        pa.scalar(0, pa.int64()))
        return pa.table({"v": d}).filter(keep)

    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    seeds = docs.map_batches(mk_seeds, batch_format="pyarrow")
    return bfs_depths(edges, seeds)


def _q_weekly_active(sf_dir: str):
    """Trailing-7-day distinct users per day — WAU
    (pipelines/analytics.py::weekly_active): sliding DISTINCT via
    deduped (day, user) pairs fanned out to their windows, one hash
    dedup + count; shuffles narrow int pairs, never events."""
    from scrappy_ray.pipelines.analytics import weekly_active

    return weekly_active(_read(sf_dir, "events",
                               columns=["ts", "user_id"]))


def _q_length_gini(sf_dir: str):
    """Per-source Gini of document length (functions/stats.py::
    group_gini): sorted-index identity with exact int64 moments —
    the inequality-of-attention audit."""
    from scrappy_ray.functions.stats import group_gini

    return group_gini(_read(sf_dir, "documents",
                            columns=["source", "n_chars"]),
                      "source", "n_chars")


def _q_source_kl(sf_dir: str):
    """Per-source token-distribution KL vs the corpus
    (functions/webtext.py::source_kl): exact count tables, distributed
    token join, 1e-9-quantized int64 term sums so the float total is
    order-independent — the domain-drift monitor."""
    from scrappy_ray.functions.webtext import source_kl

    return source_kl(_read(sf_dir, "documents",
                           columns=["text", "source"]))


def _q_bounce_rate(sf_dir: str):
    """Single-event-session share per day (pipelines/analytics.py::
    bounce_rate): the 30-min-gap session split shared with
    session_ids, rolled up by the day each session starts."""
    from scrappy_ray.pipelines.analytics import bounce_rate

    return bounce_rate(_read(sf_dir, "events",
                             columns=["event_id", "user_id", "ts"]))


def _q_component_sizes(sf_dir: str):
    """Connected-component sizes (functions/graph.py::component_sizes):
    distributed min-label propagation (the Kiveris-et-al. MapReduce CC
    reused from the dedup family) over a synthetic two-rail graph
    (doc_id → +1 within each 10-block, plus a +10 bridge per 20-block)
    so every component needs multi-round label merging; edge-less
    nodes coalesce to singletons via a left-outer join.

    INVARIANT: the oracle SQL's closed form ``(doc_id // 20) * 20 AS
    root`` is equivalent to min-label CC only while the generator's
    doc_ids are contiguous 0..N−1 (true today: 0..499 at sf0.001). If
    the generator ever offsets or sparsifies doc_ids, the chain/bridge
    construction splits components and parity diverges — re-derive the
    edges from rank-over-doc_id before blaming the CC engine."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.graph import component_sizes

    docs = _read(sf_dir, "documents", columns=["doc_id"])

    def mk_edges(batch: pa.Table) -> pa.Table:
        import numpy as np

        d = np.asarray(pc.cast(batch.column("doc_id"), pa.int64()))
        chain = d[d % 10 != 9]
        bridge = d[d % 20 == 0]
        return pa.table({
            "src": pa.array(np.concatenate([chain, bridge]), pa.int64()),
            "dst": pa.array(np.concatenate([chain + 1, bridge + 10]),
                            pa.int64()),
        })

    edges = docs.map_batches(mk_edges, batch_format="pyarrow")
    return component_sizes(edges, docs, node_col="doc_id")


def _q_weighted_median(sf_dir: str):
    """Exact per-group weighted median (functions/stats.py::
    weighted_median): block-local (group, value)→Σw collapse so the
    shuffle moves O(distinct values), then a per-group cumsum pick —
    integer 2·cum ≥ tot, no float compare."""
    from scrappy_ray.functions.stats import weighted_median

    return weighted_median(
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_quantity", "l_linenumber"]),
        "l_returnflag", "l_quantity", "l_linenumber")


def _q_last_touch(sf_dir: str):
    """Last-touch attribution for purchases (pipelines/analytics.py::
    last_touch): per-user LAG as a vectorized shift inside map_groups,
    pre-counted per group, O(event types) final rollup."""
    from scrappy_ray.pipelines.analytics import last_touch

    return last_touch(_read(
        sf_dir, "events",
        columns=["event_id", "user_id", "ts", "event_type"]))


def _q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape — cheapest supplier per part (pipelines/
    relational.py::argmin_per_group): per-block one-candidate-per-group
    cut (O(groups × blocks) rows shuffle, never the fact rows), final
    per-group pick, then an O(parts) ⋈ supplier hash join for the
    name; both join sides empty-block-guarded."""
    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.relational import argmin_per_group

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    am = argmin_per_group(li, "l_partkey",
                          ["l_extendedprice", "l_suppkey"],
                          ["l_suppkey", "l_extendedprice"])
    am = am.map_batches(
        lambda t: t.rename_columns(["l_partkey", "s_suppkey",
                                    "min_price"]),
        batch_format="pyarrow")
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    out = drop_empty_blocks(am).join(drop_empty_blocks(sup), "inner", 8,
                                     on=("s_suppkey",))
    return out.sort("l_partkey")


def _q_revenue_share(sf_dir: str):
    """Revenue ratio-to-total per ship month (pipelines/relational.py::
    revenue_share): exact cents²-int64 block partials, one O(months)
    groupby, share computed on the gathered tiny table — the
    SUM/SUM-OVER() window without a second pass."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.relational import revenue_share

    return revenue_share(
        _read(sf_dir, "lineitem",
              columns=["l_shipdate", "l_extendedprice", "l_discount"]),
        lambda b: pc.strftime(b.column("l_shipdate"), "%Y-%m"),
        "ship_month")


def _q_tpch_q14(sf_dir: str):
    """TPC-H Q14 shape (promo revenue percent): lineitems shipped in
    1996 ⋈ part on partkey — the part side reduced to a 2-column
    (partkey, is_promo) projection and broadcast (ray.put once,
    index_in probe per batch; the classic Q14 map-side join) — then
    one exact cents²-int64 conditional-sum partial per block and a
    single-row global rollup. No wide shuffle anywhere."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table
    from scrappy_ray.pipelines.relational import broadcast_join

    part = _to_table(_read(sf_dir, "part",
                           columns=["p_partkey", "p_type"]).map_batches(
        lambda t: pa.table({
            "l_partkey": t.column("p_partkey"),
            "is_promo": pc.equal(t.column("p_type"), "PROMO"),
        }), batch_format="pyarrow"))
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def window(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        lo = pa.scalar(np.datetime64("1996-01-01", "us"),
                       pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"),
                       pa.timestamp("us"))
        return batch.filter(pc.and_(pc.greater_equal(sd, lo),
                                    pc.less(sd, hi)))

    joined = broadcast_join(li.map_batches(window, batch_format="pyarrow"),
                            part, on="l_partkey", select=["is_promo"])

    def partial(batch: pa.Table) -> pa.Table:
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(batch.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(batch.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        r = p * d
        promo = np.asarray(batch.column("is_promo"))
        return pa.table({"promo": pa.array([int(r[promo].sum())], pa.int64()),
                         "total": pa.array([int(r.sum())], pa.int64())})

    parts = _to_table(joined.map_batches(partial, batch_format="pyarrow"))
    promo = float(pc.sum(parts.column("promo")).as_py() or 0)
    total = float(pc.sum(parts.column("total")).as_py() or 1)
    return pa.table({"promo_revenue": pc.round(
        pa.array([100.0 * promo / total], pa.float64()), ndigits=6,
        round_mode="half_towards_infinity")})


def _q_tpch_q10(sf_dir: str):
    """TPC-H Q10 shape (returned-item customers, top 20 by lost
    revenue): lineitem(R) ⋈ orders-in-window on orderkey (both sides
    big → distributed hash join of 2-3-column projections, block-local
    partial sums BEFORE the join shrink the lineitem side to O(orders
    touched)), exact cents²-int64 revenue per customer, distributed
    top-20, then the 20-key table broadcast against customer for the
    name — the big customer table is probed, never shuffled."""
    import pyarrow.compute as pc

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table
    from scrappy_ray.pipelines.relational import top_k

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_returnflag", "l_extendedprice",
                        "l_discount"])

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("l_returnflag"), "R"))
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(t.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        g = pa.table({"l_orderkey": t.column("l_orderkey"),
                      "r": pa.array(p * d, pa.int64())})
        return (g.group_by(["l_orderkey"]).aggregate([("r", "sum")])
                .rename_columns(["l_orderkey", "r"]))

    per_order = (li.map_batches(partial, batch_format="pyarrow")
                 .groupby("l_orderkey").sum("r")
                 .map_batches(lambda t: t.rename_columns(
                     ["l_orderkey", "r"]), batch_format="pyarrow"))

    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def owindow(batch: pa.Table) -> pa.Table:
        od = batch.column("o_orderdate")
        lo = pa.scalar(np.datetime64("1996-01-01", "us"),
                       pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"),
                       pa.timestamp("us"))
        t = batch.filter(pc.and_(pc.greater_equal(od, lo),
                                 pc.less(od, hi)))
        return pa.table({"l_orderkey": t.column("o_orderkey"),
                         "o_custkey": t.column("o_custkey")})

    joined = drop_empty_blocks(per_order).join(
        drop_empty_blocks(orders.map_batches(owindow,
                                             batch_format="pyarrow")),
        "inner", 8, on=("l_orderkey",))
    per_cust = (joined.groupby("o_custkey").sum("r")
                .map_batches(lambda t: pa.table({
                    "c_custkey": t.column("o_custkey"),
                    "revenue": pc.round(pc.divide(pc.cast(
                        t.column("sum(r)"), pa.float64()),
                        pa.scalar(10000.0)), ndigits=2,
                        round_mode="half_towards_infinity"),
                }), batch_format="pyarrow"))
    top = _to_table(top_k(per_cust, "revenue", 20, descending=True,
                          tiebreak="c_custkey"))

    from scrappy_ray.pipelines.relational import broadcast_join

    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    named = broadcast_join(cust, top, on="c_custkey",
                           select=["revenue"])
    return named.sort(["revenue", "c_custkey"],
                      descending=[True, False])


def _q_tpch_q6(sf_dir: str):
    """TPC-H Q6 shape (forecast revenue change): pure filter + global
    sum — no join, no shuffle at all. Column-pruned 3-column read,
    vectorized window/discount/quantity mask per block, exact
    cents²-int64 partial per block, one-row gather. The shape that
    shows the read-side pruning story: at 100 TB only the three
    needed columns and the row groups passing min/max stats move."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    li = _read(sf_dir, "lineitem",
               columns=["l_shipdate", "l_discount", "l_quantity",
                        "l_extendedprice"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        lo = pa.scalar(np.datetime64("1996-01-01", "us"),
                       pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1997-01-01", "us"),
                       pa.timestamp("us"))
        disc = pc.cast(batch.column("l_discount"), pa.float64())
        mask = pc.and_(pc.and_(pc.greater_equal(sd, lo), pc.less(sd, hi)),
                       pc.and_(pc.greater_equal(disc, pa.scalar(0.05)),
                               pc.and_(pc.less_equal(disc, pa.scalar(0.07)),
                                       pc.less(batch.column("l_quantity"),
                                               pa.scalar(24.0)))))
        t = batch.filter(mask)
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_discount"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        return pa.table({"r": pa.array([int((p * d).sum())], pa.int64())})

    parts = _to_table(li.map_batches(partial, batch_format="pyarrow"))
    total = int(pc.sum(parts.column("r")).as_py() or 0)
    return pa.table({"revenue": pc.round(
        pa.array([total / 10000.0], pa.float64()), ndigits=2,
        round_mode="half_towards_infinity")})


def _q_nation_revenue_share(sf_dir: str):
    """Revenue ratio-to-total per supplier nation: the supplier →
    nation-name mapping reduced to a 2-column projection and broadcast
    into the lineitem stream (ray.put once, index_in probe per batch),
    then the same exact cents²-int64 partial + O(nations) rollup as
    revenue_share — a join-derived group key without shuffling the
    fact table."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table
    from scrappy_ray.pipelines.relational import (broadcast_join,
                                                  revenue_share)

    sup = _to_table(_read(sf_dir, "supplier",
                          columns=["s_suppkey", "s_nationkey"]))
    nat = _to_table(_read(sf_dir, "nation",
                          columns=["n_nationkey", "n_name"]))
    pos = pc.index_in(sup.column("s_nationkey"),
                      value_set=nat.column("n_nationkey").combine_chunks())
    sup_nat = pa.table({
        "l_suppkey": sup.column("s_suppkey"),
        "n_name": nat.column("n_name").take(pos),
    })
    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount"])
    joined = broadcast_join(li, sup_nat, on="l_suppkey",
                            select=["n_name"])
    return revenue_share(joined, lambda b: b.column("n_name"), "n_name")


def _q_tpch_q17(sf_dir: str):
    """TPC-H Q17 shape (small-quantity order revenue): the correlated
    subquery rewritten as aggregate → join-back → filtered aggregate.
    Pass 1 builds the O(parts) per-part 0.2·avg(qty) threshold table
    from exact block partials (whole-number quantities sum exactly in
    float64, so sum/count is order-independent and the threshold double
    matches DuckDB's AVG bit-for-bit); pass 2 re-reads a 3-column
    lineitem projection, distributed-joins it against the threshold
    table on partkey, filters qty < thr per block, and gathers one
    exact cents-int64 row per block."""
    import pyarrow.compute as pc

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def avg_partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"l_partkey": batch.column("l_partkey"),
                      "s": pc.cast(batch.column("l_quantity"),
                                   pa.float64()),
                      "c": pa.array(np.ones(batch.num_rows, np.int64))})
        g = t.group_by(["l_partkey"]).aggregate([("s", "sum"),
                                                 ("c", "sum")])
        return g.rename_columns(["l_partkey", "s", "c"])

    thr = (li.map_batches(avg_partial, batch_format="pyarrow")
           .groupby("l_partkey").sum(["s", "c"])
           .map_batches(lambda t: pa.table({
               "l_partkey": t.column("l_partkey"),
               "thr": pc.multiply(pa.scalar(0.2), pc.divide(
                   t.column("sum(s)"),
                   pc.cast(t.column("sum(c)"), pa.float64()))),
           }), batch_format="pyarrow"))

    joined = drop_empty_blocks(li).join(drop_empty_blocks(thr), "inner",
                                        8, on=("l_partkey",))

    def rev_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.less(pc.cast(batch.column("l_quantity"),
                                         pa.float64()),
                                 batch.column("thr")))
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        return pa.table({"r": pa.array([int(p.sum())], pa.int64())})

    parts = _to_table(joined.map_batches(rev_partial,
                                         batch_format="pyarrow"))
    total = int(pc.sum(parts.column("r")).as_py() or 0)
    return pa.table({"avg_yearly": pc.round(
        pa.array([(total / 100.0) / 7.0], pa.float64()), ndigits=2,
        round_mode="half_towards_infinity")})


def _q_tpch_q15(sf_dir: str):
    """TPC-H Q15 shape (top supplier, ties kept): per-supplier exact
    cents²-int64 revenue rollup over a ship-date window (block
    partials → O(suppliers) groupby), global max via Dataset.max (no
    gather), equality filter keeps every tied winner, and the tiny
    winner table broadcast-probes supplier for the name."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table
    from scrappy_ray.pipelines.relational import broadcast_join

    li = _read(sf_dir, "lineitem",
               columns=["l_suppkey", "l_extendedprice", "l_discount",
                        "l_shipdate"])

    def partial(batch: pa.Table) -> pa.Table:
        sd = batch.column("l_shipdate")
        lo = pa.scalar(np.datetime64("1996-01-01", "us"),
                       pa.timestamp("us"))
        hi = pa.scalar(np.datetime64("1996-04-01", "us"),
                       pa.timestamp("us"))
        t = batch.filter(pc.and_(pc.greater_equal(sd, lo),
                                 pc.less(sd, hi)))
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(t.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        g = pa.table({"l_suppkey": t.column("l_suppkey"),
                      "r": pa.array(p * d, pa.int64())})
        return (g.group_by(["l_suppkey"]).aggregate([("r", "sum")])
                .rename_columns(["l_suppkey", "r"]))

    per_supp = (li.map_batches(partial, batch_format="pyarrow")
                .groupby("l_suppkey").sum("r")
                .map_batches(lambda t: t.rename_columns(
                    ["l_suppkey", "r"]), batch_format="pyarrow")
                .materialize())  # O(suppliers); consumed twice (max + filter)
    best = per_supp.max("r")
    if best is None:  # ship-date window matched no rows
        return pa.table({"s_suppkey": pa.array([], pa.int64()),
                         "s_name": pa.array([], pa.string()),
                         "total_rev": pa.array([], pa.float64())})
    winners = _to_table(per_supp.filter(
        expr=f"r == {int(best)}").map_batches(
        lambda t: pa.table({
            "s_suppkey": t.column("l_suppkey"),
            "total_rev": pc.round(pc.divide(pc.cast(t.column("r"),
                                                    pa.float64()),
                                            pa.scalar(10000.0)),
                                  ndigits=2,
                                  round_mode="half_towards_infinity"),
        }), batch_format="pyarrow"))
    sup = _read(sf_dir, "supplier", columns=["s_suppkey", "s_name"])
    return broadcast_join(sup, winners, on="s_suppkey",
                          select=["total_rev"]).sort("s_suppkey")


def _q_tpch_q13(sf_dir: str):
    """TPC-H Q13 shape (customer order-count distribution): the
    two-level aggregate — orders filtered and counted per customer
    (one narrow groupby, O(customers) output), the count distribution
    from a second O(distinct counts) groupby, and the zero-order
    customer row derived by subtraction from the table row count (no
    customer⋈orders join at all)."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    n_cust = _read(sf_dir, "customer", columns=["c_custkey"]).count()
    orders = _read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"])

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.not_equal(b.column("o_orderpriority"),
                                     "1-URGENT")).select(["o_custkey"])

    dist = (orders.map_batches(flt, batch_format="pyarrow")
            .groupby("o_custkey").count()
            .map_batches(lambda t: pa.table({
                "c_count": pc.cast(t.column("count()"), pa.int64())}),
                batch_format="pyarrow")
            .groupby("c_count").count())
    d = _to_table(dist)
    cc = np.asarray(d.column("c_count"), dtype=np.int64)
    cd = np.asarray(pc.cast(d.column("count()"), pa.int64()),
                    dtype=np.int64)
    n_zero = n_cust - int(cd.sum())
    if n_zero > 0:  # an empty c_count=0 group has no SQL-side row
        cc = np.r_[cc, 0]
        cd = np.r_[cd, n_zero]
    return pa.table({"c_count": pa.array(cc, pa.int64()),
                     "custdist": pa.array(cd, pa.int64())}).sort_by(
        [("custdist", "descending"), ("c_count", "descending")])


def _q_tpch_q22(sf_dir: str):
    """TPC-H Q22 shape (global-threshold + anti-join + rollup):
    above-average-balance customers with no URGENT orders, per nation.
    The scalar subquery is an exact integer comparison — cents·N >
    Σcents with (Σcents, N) from one-row block partials — so the
    threshold cannot drift from DuckDB's float AVG; the anti-join is
    the distributed LEFT ANTI against the distinct urgent-customer
    keys; the nation rollup broadcasts the tiny nation map."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    cust = _read(sf_dir, "customer",
                 columns=["c_custkey", "c_nationkey", "c_acctbal"])

    def bal_partial(b: pa.Table) -> pa.Table:
        pos = b.filter(pc.greater(b.column("c_acctbal"), 0.0))
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(pos.column("c_acctbal"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64())
        return pa.table({
            "s": pa.array([pc.sum(cents).as_py() or 0], pa.int64()),
            "n": pa.array([pos.num_rows], pa.int64())})

    bal = _to_table(cust.map_batches(bal_partial, batch_format="pyarrow"))
    sum_cents = int(pc.sum(bal.column("s")).as_py() or 0)
    n_pos = int(pc.sum(bal.column("n")).as_py() or 0)

    def urgent(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t.column("o_orderpriority"),
                                 "1-URGENT")) \
                .select(["o_custkey"]).rename_columns(["c_custkey"])

    okeys = (_read(sf_dir, "orders",
                   columns=["o_custkey", "o_orderpriority"])
             .map_batches(urgent, batch_format="pyarrow")
             .groupby("c_custkey").count()
             .select_columns(["c_custkey"]))

    def above(b: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(b.column("c_acctbal"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64())
        return b.filter(pc.greater(
            pc.multiply(cents, pa.scalar(n_pos, pa.int64())),
            pa.scalar(sum_cents, pa.int64())))

    rich = cust.map_batches(above, batch_format="pyarrow")
    no_urgent = drop_empty_blocks(rich).join(
        drop_empty_blocks(okeys), "left_anti", 8, on=("c_custkey",))

    nat = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    name_by_key = np.empty(
        int(pc.max(nat.column("n_nationkey")).as_py()) + 1, dtype=object)
    for k, nm in zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()):
        name_by_key[k] = nm

    def roll(b: pa.Table) -> pa.Table:
        nk = np.asarray(pc.cast(b.column("c_nationkey"), pa.int64()),
                        dtype=np.int64)
        cents = pc.cast(pc.round(pc.multiply(
            pc.cast(b.column("c_acctbal"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64())
        t = pa.table({"nation": pa.array(name_by_key[nk], pa.string()),
                      "n1": pa.array(np.ones(b.num_rows, np.int64)),
                      "cents": cents})
        return (t.group_by(["nation"])
                .aggregate([("n1", "sum"), ("cents", "sum")])
                .rename_columns(["nation", "n1", "cents"]))

    agg = _to_table(no_urgent.map_batches(roll, batch_format="pyarrow")
                    .groupby("nation")
                    .aggregate(Sum("n1", alias_name="numcust"),
                               Sum("cents", alias_name="sc")))
    if agg.num_rows == 0:
        return pa.table({"nation": pa.array([], pa.string()),
                         "numcust": pa.array([], pa.int64()),
                         "totacctbal": pa.array([], pa.float64())})
    return pa.table({
        "nation": agg.column("nation"),
        "numcust": pc.cast(agg.column("numcust"), pa.int64()),
        "totacctbal": pc.round(
            pc.divide(pc.cast(agg.column("sc"), pa.float64()),
                      pa.scalar(100.0)),
            ndigits=2, round_mode="half_towards_infinity"),
    }).sort_by([("nation", "ascending")])


def _q_tpch_q12(sf_dir: str):
    """TPC-H Q12 shape (shipping-lateness counts per order priority;
    l_shipmode absent from the generator, o_orderpriority stands in):
    ONE distributed hash join of the two corpus-sized projections,
    then vectorized int64 timestamp arithmetic and conditional-count
    partials per block — O(priorities) output."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    li = _read(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderdate",
                            "o_orderpriority"]).map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow")
    joined = drop_empty_blocks(li).join(drop_empty_blocks(orders),
                                        "inner", 8, on=("l_orderkey",))
    late_us = 60 * 86400 * 1_000_000

    def partial(b: pa.Table) -> pa.Table:
        ship = pc.cast(b.column("l_shipdate"), pa.int64())
        od = pc.cast(b.column("o_orderdate"), pa.int64())
        late = pc.cast(pc.greater(pc.subtract(ship, od),
                                  pa.scalar(late_us, pa.int64())),
                       pa.int64())
        t = pa.table({
            "o_orderpriority": b.column("o_orderpriority"),
            "late": late,
            "ontime": pc.subtract(pa.scalar(1, pa.int64()), late)})
        return (t.group_by(["o_orderpriority"])
                .aggregate([("late", "sum"), ("ontime", "sum")])
                .rename_columns(["o_orderpriority", "late", "ontime"]))

    q = _to_table(joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("o_orderpriority")
                  .aggregate(Sum("late", alias_name="late_count"),
                             Sum("ontime", alias_name="ontime_count")))
    return pa.table({
        "o_orderpriority": q.column("o_orderpriority"),
        "late_count": pc.cast(q.column("late_count"), pa.int64()),
        "ontime_count": pc.cast(q.column("ontime_count"), pa.int64()),
    }).sort_by([("o_orderpriority", "ascending")])


def _q_tpch_q7(sf_dir: str):
    """TPC-H Q7 shape (cross-nation trade volume per ship year): one
    lineitem⋈orders hash join (the two corpus-sized sides), every
    dimension broadcast as a numpy lookup (customer/supplier nation
    maps), exact cents²-int64 partials, O(nations² × years) output."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    cust = _read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_nationkey"])
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_nationkey"])
    nat = _read_table(sf_dir, "nation", columns=["n_nationkey", "n_name"])
    ckeys = cust.column("c_custkey").combine_chunks()
    cnat = np.asarray(cust.column("c_nationkey"), dtype=np.int64)
    skeys = supp.column("s_suppkey").combine_chunks()
    snat = np.asarray(supp.column("s_nationkey"), dtype=np.int64)
    name_by_key = np.empty(
        int(pc.max(nat.column("n_nationkey")).as_py()) + 1, dtype=object)
    for k, nm in zip(nat.column("n_nationkey").to_pylist(),
                     nat.column("n_name").to_pylist()):
        name_by_key[k] = nm

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                        "l_discount", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    joined = drop_empty_blocks(li).join(drop_empty_blocks(orders),
                                        "inner", 8, on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        ci = np.asarray(pc.cast(pc.fill_null(pc.index_in(
            b.column("o_custkey"), value_set=ckeys), -1), pa.int64()),
            dtype=np.int64)
        si = np.asarray(pc.cast(pc.fill_null(pc.index_in(
            b.column("l_suppkey"), value_set=skeys), -1), pa.int64()),
            dtype=np.int64)
        ok = (ci >= 0) & (si >= 0)
        sn = snat[np.maximum(si, 0)]
        cn = cnat[np.maximum(ci, 0)]
        ok &= sn != cn
        b2 = b.filter(pa.array(ok))
        if b2.num_rows == 0:
            return pa.table({"supp_nation": pa.array([], pa.string()),
                             "cust_nation": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64())})
        sn = sn[ok]
        cn = cn[ok]
        yr = pc.cast(pc.year(b2.column("l_shipdate")), pa.int64())
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(b2.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(b2.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        t = pa.table({"supp_nation": pa.array(name_by_key[sn], pa.string()),
                      "cust_nation": pa.array(name_by_key[cn], pa.string()),
                      "l_year": yr,
                      "r": pa.array(p * d, pa.int64())})
        return (t.group_by(["supp_nation", "cust_nation", "l_year"])
                .aggregate([("r", "sum")])
                .rename_columns(["supp_nation", "cust_nation",
                                 "l_year", "r"]))

    q = _to_table(joined.map_batches(partial, batch_format="pyarrow")
                  .groupby(["supp_nation", "cust_nation", "l_year"])
                  .aggregate(Sum("r", alias_name="rc")))
    return pa.table({
        "supp_nation": q.column("supp_nation"),
        "cust_nation": q.column("cust_nation"),
        "l_year": q.column("l_year"),
        "revenue": pc.round(
            pc.divide(pc.cast(q.column("rc"), pa.float64()),
                      pa.scalar(10000.0)),
            ndigits=2, round_mode="half_towards_infinity"),
    }).sort_by([("supp_nation", "ascending"), ("cust_nation", "ascending"),
                ("l_year", "ascending")])


def _q_tpch_q8(sf_dir: str):
    """TPC-H Q8 shape (market share of one supplier nation, per order
    year, for a region's customers and one part type): part filter
    pushed as a broadcast is_in BEFORE the hash join (prunes the big
    side), dims broadcast as numpy lookups, exact cents²-int64
    conditional partials, O(years) output with the share computed on
    the gathered tiny table."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    target, region, ptype = "NATION_1", "AMERICA", "ECONOMY"
    cust = _read_table(sf_dir, "customer",
                       columns=["c_custkey", "c_nationkey"])
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_nationkey"])
    nat = _read_table(sf_dir, "nation",
                      columns=["n_nationkey", "n_name", "n_regionkey"])
    reg = _read_table(sf_dir, "region",
                      columns=["r_regionkey", "r_name"])
    rkey = {r["r_name"]: r["r_regionkey"]
            for r in reg.to_pylist()}[region]
    nk_max = int(pc.max(nat.column("n_nationkey")).as_py())
    in_region = np.zeros(nk_max + 1, bool)
    is_target = np.zeros(nk_max + 1, bool)
    for r in nat.to_pylist():
        in_region[r["n_nationkey"]] = r["n_regionkey"] == rkey
        is_target[r["n_nationkey"]] = r["n_name"] == target
    part = _read_table(sf_dir, "part", columns=["p_partkey", "p_type"])
    pkeys = part.filter(pc.equal(part.column("p_type"), ptype)) \
                .column("p_partkey").combine_chunks()
    ckeys = cust.column("c_custkey").combine_chunks()
    cnat = np.asarray(cust.column("c_nationkey"), dtype=np.int64)
    skeys = supp.column("s_suppkey").combine_chunks()
    snat = np.asarray(supp.column("s_nationkey"), dtype=np.int64)

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount"]).map_batches(
        lambda b: b.filter(pc.is_valid(pc.index_in(
            b.column("l_partkey"), value_set=pkeys))),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey",
                            "o_orderdate"]).map_batches(
        lambda t: t.rename_columns(
            ["l_orderkey", "o_custkey", "o_orderdate"]),
        batch_format="pyarrow")
    joined = drop_empty_blocks(li).join(drop_empty_blocks(orders),
                                        "inner", 8, on=("l_orderkey",))

    def partial(b: pa.Table) -> pa.Table:
        ci = np.asarray(pc.cast(pc.fill_null(pc.index_in(
            b.column("o_custkey"), value_set=ckeys), -1), pa.int64()),
            dtype=np.int64)
        si = np.asarray(pc.cast(pc.fill_null(pc.index_in(
            b.column("l_suppkey"), value_set=skeys), -1), pa.int64()),
            dtype=np.int64)
        ok = (ci >= 0) & (si >= 0)
        cn = cnat[np.maximum(ci, 0)]
        ok &= in_region[cn]
        b2 = b.filter(pa.array(ok))
        if b2.num_rows == 0:
            return pa.table({"o_year": pa.array([], pa.int64()),
                             "t": pa.array([], pa.int64()),
                             "r": pa.array([], pa.int64())})
        sn = snat[np.maximum(si, 0)][ok]
        yr = pc.cast(pc.year(b2.column("o_orderdate")), pa.int64())
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(b2.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(b2.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        vol = p * d
        t = pa.table({
            "o_year": yr,
            "t": pa.array(np.where(is_target[sn], vol, 0), pa.int64()),
            "r": pa.array(vol, pa.int64())})
        return (t.group_by(["o_year"])
                .aggregate([("t", "sum"), ("r", "sum")])
                .rename_columns(["o_year", "t", "r"]))

    q = _to_table(joined.map_batches(partial, batch_format="pyarrow")
                  .groupby("o_year")
                  .aggregate(Sum("t", alias_name="ts"),
                             Sum("r", alias_name="rs")))
    if q.num_rows == 0:
        return pa.table({"o_year": pa.array([], pa.int64()),
                         "mkt_share": pa.array([], pa.float64())})
    ts = np.asarray(pc.cast(q.column("ts"), pa.int64()), dtype=np.int64)
    rs = np.asarray(pc.cast(q.column("rs"), pa.int64()), dtype=np.int64)
    return pa.table({
        "o_year": q.column("o_year"),
        "mkt_share": pc.round(
            pa.array(ts / np.maximum(rs, 1), pa.float64()), ndigits=6,
            round_mode="half_towards_infinity"),
    }).sort_by([("o_year", "ascending")])


def _q_tpch_q21(sf_dir: str):
    """TPC-H Q21 shape (sole-latest-shipper on multi-supplier orders;
    commit/receipt dates absent from the generator, max-shipdate
    uniqueness stands in for the waiting test): per-(order, supplier)
    max shipdate from block partials, per-order (max, supplier-count)
    rollup, argmax-uniqueness via one more narrow count — four
    O(order×supplier-pairs) shuffles, supplier names broadcast, top 10
    with a total-order tie-break."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])

    def part_ss(b: pa.Table) -> pa.Table:
        t = pa.table({"l_orderkey": b.column("l_orderkey"),
                      "l_suppkey": b.column("l_suppkey"),
                      "sd": pc.cast(b.column("l_shipdate"), pa.int64())})
        return (t.group_by(["l_orderkey", "l_suppkey"])
                .aggregate([("sd", "max")])
                .rename_columns(["l_orderkey", "l_suppkey", "sd"]))

    ss = (li.map_batches(part_ss, batch_format="pyarrow")
          .groupby(["l_orderkey", "l_suppkey"]).max("sd")
          .map_batches(lambda t: t.rename_columns(
              ["l_orderkey", "l_suppkey", "smax"]),
              batch_format="pyarrow")).materialize()
    om = (ss.groupby("l_orderkey")
          .aggregate(Max("smax", alias_name="omax"),
                     Count(alias_name="nsupp")))
    j = drop_empty_blocks(ss).join(drop_empty_blocks(om), "inner", 8,
                                   on=("l_orderkey",))
    cand = j.filter(expr="nsupp >= 2 and smax == omax").materialize()
    nat = cand.groupby("l_orderkey").count().map_batches(
        lambda t: t.rename_columns(["l_orderkey", "n_at_max"]),
        batch_format="pyarrow")
    sole = drop_empty_blocks(cand).join(
        drop_empty_blocks(nat), "inner", 8,
        on=("l_orderkey",)).filter(expr="n_at_max == 1")
    per_supp = _to_table(sole.groupby("l_suppkey").count())
    if per_supp.num_rows == 0:
        return pa.table({"s_name": pa.array([], pa.string()),
                         "numwait": pa.array([], pa.int64())})
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_name"])
    skeys = supp.column("s_suppkey").combine_chunks()
    snames = np.asarray(supp.column("s_name").to_pylist(), dtype=object)
    si = np.asarray(pc.cast(pc.index_in(
        per_supp.column("l_suppkey"), value_set=skeys), pa.int64()),
        dtype=np.int64)
    return pa.table({
        "s_name": pa.array(snames[si], pa.string()),
        "numwait": pc.cast(per_supp.column("count()"), pa.int64()),
    }).sort_by([("numwait", "descending"),
                ("s_name", "ascending")]).slice(0, 10)


def _q_churned_customers(sf_dir: str):
    """Temporal churn (ordered before the cutoff, never after): ONE
    narrow groupby — per-customer (min, max, count) of order dates
    from int64 block partials via Dataset aggregates — then a
    vectorized cutoff filter; no join at all (the churn anti-join
    collapses into a HAVING on the per-key max)."""
    import pandas as pd
    import pyarrow.compute as pc
    from ray.data.aggregate import Count, Max, Min

    from scrappy_ray.pipelines.analytics import _to_table

    cut_us = int(pd.Timestamp("2000-01-01").value // 1000)
    orders = _read(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])
    per_cust = (orders.map_batches(
        lambda b: pa.table({
            "o_custkey": b.column("o_custkey"),
            "d": pc.cast(b.column("o_orderdate"), pa.int64())}),
        batch_format="pyarrow")
        .groupby("o_custkey")
        .aggregate(Min("d", alias_name="first_d"),
                   Max("d", alias_name="last_d"),
                   Count(alias_name="n_orders")))
    churn = _to_table(per_cust.filter(expr=f"last_d < {cut_us}"))
    return pa.table({
        "c_custkey": churn.column("o_custkey"),
        "n_orders": pc.cast(churn.column("n_orders"), pa.int64()),
        "last_order": pc.cast(churn.column("last_d"), pa.timestamp("us")),
    }).sort_by([("c_custkey", "ascending")])


def _q_ship_latency_p95(sf_dir: str):
    """Exact per-supplier p95 ship latency in days (the low-cardinality
    histogram trick, functions/sketch.py family): latencies quantize to
    whole days, so ONE (supplier, day)-histogram shuffle is exact at
    any corpus size; the driver folds O(suppliers × distinct days)
    cumulative counts into discrete 0.95-quantiles (DuckDB
    quantile_disc semantics: smallest value with cum ≥ ⌈0.95·n⌉)."""
    import math

    import pyarrow.compute as pc

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    day_us = 86400 * 1_000_000
    li = _read(sf_dir, "lineitem",
               columns=["l_orderkey", "l_suppkey", "l_shipdate"])
    om = _read(sf_dir, "orders",
               columns=["o_orderkey", "o_orderdate"]).map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_orderdate"]),
        batch_format="pyarrow")
    joined = drop_empty_blocks(li).join(drop_empty_blocks(om), "inner", 8,
                                        on=("l_orderkey",))

    def part(b: pa.Table) -> pa.Table:
        lat = pc.cast(pc.divide(pc.subtract(
            pc.cast(b.column("l_shipdate"), pa.int64()),
            pc.cast(b.column("o_orderdate"), pa.int64())),
            pa.scalar(day_us, pa.int64())), pa.int64())
        t = pa.table({"l_suppkey": b.column("l_suppkey"), "lat": lat,
                      "n": pa.array(np.ones(b.num_rows, np.int64))})
        return (t.group_by(["l_suppkey", "lat"]).aggregate([("n", "sum")])
                .rename_columns(["l_suppkey", "lat", "n"]))

    hist = _to_table(joined.map_batches(part, batch_format="pyarrow")
                     .groupby(["l_suppkey", "lat"]).sum("n"))
    if hist.num_rows == 0:
        return pa.table({"l_suppkey": pa.array([], pa.int64()),
                         "p95_days": pa.array([], pa.int64())})
    sk = np.asarray(hist.column("l_suppkey"), dtype=np.int64)
    lat = np.asarray(hist.column("lat"), dtype=np.int64)
    cnt = np.asarray(pc.cast(hist.column("sum(n)"), pa.int64()),
                     dtype=np.int64)
    order = np.lexsort((lat, sk))
    sk, lat, cnt = sk[order], lat[order], cnt[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    bounds = np.r_[starts, len(sk)]
    keys, p95s = [], []
    for i, s in enumerate(starts):
        e = bounds[i + 1]
        c = np.cumsum(cnt[s:e])
        idx = int(np.searchsorted(c, math.ceil(0.95 * c[-1])))
        keys.append(int(sk[s]))
        p95s.append(int(lat[s:e][idx]))
    return pa.table({
        "l_suppkey": pa.array(keys, pa.int64()),
        "p95_days": pa.array(p95s, pa.int64()),
    }).sort_by([("l_suppkey", "ascending")])


def _q_label_centroids(sf_dir: str):
    """Per-label embedding centroid (functions/similarity.py::
    label_centroids): the class-prototype vector aggregate —
    1e-6-quantized int64 per-(label, dim) partials, O(labels × dims)
    narrow shuffle, one float division at the end."""
    from scrappy_ray.functions.similarity import label_centroids

    return label_centroids(_read(sf_dir, "embeddings",
                                 columns=["label", "embedding"]))


def _q_knn_classify(sf_dir: str):
    """k-NN majority-vote classification (5-NN cosine, leave-self-out)
    for the vec_id < 8 query set: the distributed top-k pass is
    functions/similarity.py::topk_cosine (per-block argpartition
    against the broadcast query matrix, O(Q·k) rows per block to the
    final cut); neighbor labels come from one streaming is_in filter
    over the embeddings table (broadcast key set, O(Q·k) survivors
    gathered); the majority vote with smallest-label tie-break runs on
    that tiny table."""
    import pyarrow.compute as pc

    from scrappy_ray.functions.similarity import topk_cosine
    from scrappy_ray.pipelines.analytics import _to_table

    from scrappy_ray.functions.similarity import _as_matrix

    qtbl = _read_table(sf_dir, "embeddings",
                       columns=["vec_id", "embedding"],
                       filter=pc.field("vec_id") < 8)
    qtbl = qtbl.sort_by([("vec_id", "ascending")])
    queries = _as_matrix(qtbl.column("embedding"))
    qids = qtbl.column("vec_id").to_pylist()
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    nn = _to_table(topk_cosine(ds, queries, k=5, query_ids=qids)
                   .select_columns(["query_id", "neighbor_id"]))

    nbr_ids = pc.unique(nn.column("neighbor_id"))
    lab_ds = _read(sf_dir, "embeddings", columns=["vec_id", "label"])
    labels = _to_table(lab_ds.map_batches(
        lambda t: t.filter(pc.is_in(t.column("vec_id"),
                                    value_set=nbr_ids)),
        batch_format="pyarrow"))

    lpos = pc.index_in(nn.column("neighbor_id"),
                       value_set=labels.column("vec_id").combine_chunks())
    voted = pa.table({
        "query_id": nn.column("query_id"),
        "label": pc.cast(labels.column("label").take(lpos), pa.int64()),
    })
    counts = (voted.group_by(["query_id", "label"])
              .aggregate([([], "count_all")])
              .rename_columns(["query_id", "label", "c"])
              .sort_by([("query_id", "ascending"), ("c", "descending"),
                        ("label", "ascending")]))
    qcol = np.asarray(counts.column("query_id"))
    first = np.flatnonzero(np.r_[True, qcol[1:] != qcol[:-1]])
    top = counts.take(pa.array(first, pa.int64()))
    return pa.table({"query_id": top.column("query_id"),
                     "pred_label": top.column("label")})


def _q_tpch_q19(sf_dir: str):
    """TPC-H Q19 shape (disjunctive-predicate revenue): the OR-of-ANDs
    over joined attributes — part's (brand, size) broadcast as a
    2-extra-column projection into the lineitem stream (map-side
    join), then ONE vectorized compound mask per block (three
    (brand, size-range, quantity-range) disjuncts as Arrow boolean
    kernels — the predicate never leaves the batch), exact
    cents²-int64 one-row partials, single gather."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table
    from scrappy_ray.pipelines.relational import broadcast_join

    part = _to_table(_read(sf_dir, "part",
                           columns=["p_partkey", "p_brand",
                                    "p_size"]).map_batches(
        lambda t: pa.table({"l_partkey": t.column("p_partkey"),
                            "p_brand": t.column("p_brand"),
                            "p_size": t.column("p_size")}),
        batch_format="pyarrow"))
    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_quantity", "l_extendedprice",
                        "l_discount"])
    joined = broadcast_join(li, part, on="l_partkey",
                            select=["p_brand", "p_size"])

    def partial(batch: pa.Table) -> pa.Table:
        qty = pc.cast(batch.column("l_quantity"), pa.float64())
        size = pc.cast(batch.column("p_size"), pa.int64())
        brand = batch.column("p_brand")

        def disjunct(b, qlo, qhi, slo, shi):
            return pc.and_(
                pc.and_(pc.equal(brand, b),
                        pc.and_(pc.greater_equal(
                            qty, pa.scalar(float(qlo))),
                            pc.less_equal(qty, pa.scalar(float(qhi))))),
                pc.and_(pc.greater_equal(size, pa.scalar(slo, pa.int64())),
                        pc.less_equal(size, pa.scalar(shi, pa.int64()))))

        mask = pc.or_(pc.or_(disjunct("Brand#1", 1, 11, 1, 5),
                             disjunct("Brand#2", 10, 20, 1, 10)),
                      disjunct("Brand#3", 20, 30, 1, 15))
        t = batch.filter(mask)
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(t.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        return pa.table({"r": pa.array([int((p * d).sum())], pa.int64())})

    parts = _to_table(joined.map_batches(partial, batch_format="pyarrow"))
    total = int(pc.sum(parts.column("r")).as_py() or 0)
    return pa.table({"revenue": pc.round(
        pa.array([total / 10000.0], pa.float64()), ndigits=2,
        round_mode="half_towards_infinity")})


def _q_tpch_q2(sf_dir: str):
    """TPC-H Q2 shape (min-cost supplier per part in a region, ties
    kept). The reference's partsupp table doesn't exist in this
    corpus, so the supply cost is the stand-in MIN exact-cents
    l_extendedprice per (part, supplier) pair — same correlated
    MIN-subquery shape. Region suppliers and size-filtered parts are
    driver-side dimension reads (O(suppliers)/O(parts) — q8/q19
    precedent); lineitem streams through one is_in-pruned cents
    partial, the pair mins and per-part mins are two narrow groupbys
    over O(pairs) rows, the tie-keeping equality is a distributed
    hash join, and the final sort+limit runs on the tiny qualified
    table."""
    import pyarrow.compute as pc

    from scrappy_ray.common import drop_empty_blocks
    from scrappy_ray.pipelines.analytics import _to_table

    region = "EUROPE"
    reg = _read_table(sf_dir, "region",
                      columns=["r_regionkey", "r_name"])
    rkey = {r["r_name"]: r["r_regionkey"]
            for r in reg.to_pylist()}[region]
    nat = _read_table(sf_dir, "nation",
                      columns=["n_nationkey", "n_name", "n_regionkey"])
    nname = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()
             if r["n_regionkey"] == rkey}
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_name", "s_acctbal",
                                "s_nationkey"])
    supp = supp.filter(pc.is_in(
        supp.column("s_nationkey"),
        value_set=pa.array(sorted(nname), pa.int64())))
    skeys = pc.cast(supp.column("s_suppkey"), pa.int64()).combine_chunks()
    sname = supp.column("s_name").combine_chunks()
    sbal = np.asarray(supp.column("s_acctbal"), dtype=np.float64)
    snat = np.asarray(supp.column("s_nationkey"), dtype=np.int64)

    part = _read_table(sf_dir, "part",
                       columns=["p_partkey", "p_type", "p_size"],
                       filter=pc.field("p_size") >= 20)
    pkeys = pc.cast(part.column("p_partkey"), pa.int64()).combine_chunks()
    ptype = part.column("p_type").combine_chunks()

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def cost_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(pc.index_in(b.column("l_suppkey"),
                                            value_set=skeys)),
                    pc.is_valid(pc.index_in(b.column("l_partkey"),
                                            value_set=pkeys)))
        t = b.filter(m)
        c = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64())
        g = pa.table({"l_partkey": t.column("l_partkey"),
                      "l_suppkey": t.column("l_suppkey"),
                      "c": c}).group_by(
            ["l_partkey", "l_suppkey"]).aggregate([("c", "min")])
        return g.rename_columns(["l_partkey", "l_suppkey", "c"])

    pairs = (li.map_batches(cost_partial, batch_format="pyarrow")
             .groupby(["l_partkey", "l_suppkey"]).min("c")
             .map_batches(lambda t: t.rename_columns(
                 ["l_partkey", "l_suppkey", "c"]),
                 batch_format="pyarrow")).materialize()
    mins = (pairs.groupby("l_partkey").min("c")
            .map_batches(lambda t: pa.table({
                "l_partkey": t.column("l_partkey"),
                "mc": t.column("min(c)")}), batch_format="pyarrow"))
    best = drop_empty_blocks(pairs).join(drop_empty_blocks(mins),
                                         "inner", 8, on=("l_partkey",))
    best = best.filter(expr="c == mc")

    def attach(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s_acctbal": pa.array([], pa.float64()),
                             "s_name": pa.array([], pa.string()),
                             "n_name": pa.array([], pa.string()),
                             "p_partkey": pa.array([], pa.int64()),
                             "p_type": pa.array([], pa.string()),
                             "supplycost": pa.array([], pa.float64())})
        si = np.asarray(pc.cast(pc.index_in(
            pc.cast(t.column("l_suppkey"), pa.int64()), value_set=skeys),
            pa.int64()), dtype=np.int64)
        pi = pc.index_in(pc.cast(t.column("l_partkey"), pa.int64()),
                         value_set=pkeys)
        # vectorized nationkey -> name (no per-row Python)
        nlut = np.empty(max(nname) + 1, dtype=object)
        for k, v in nname.items():
            nlut[k] = v
        nn = pa.array(nlut[snat[si]], pa.string())
        return pa.table({
            "s_acctbal": pa.array(sbal[si], pa.float64()),
            "s_name": sname.take(pa.array(si, pa.int64())),
            "n_name": nn,
            "p_partkey": pc.cast(t.column("l_partkey"), pa.int64()),
            "p_type": ptype.take(pi),
            "supplycost": pc.divide(
                pc.cast(t.column("c"), pa.float64()), pa.scalar(100.0)),
        })

    out = best.map_batches(attach, batch_format="pyarrow").sort(
        key=["s_acctbal", "n_name", "s_name", "p_partkey"],
        descending=[True, False, False, False]).limit(100)
    return _to_table(out)


def _q_tpch_q9(sf_dir: str):
    """TPC-H Q9 shape (product-type profit by nation and year). No
    partsupp ⇒ the cost term is the stand-in qty × p_retailprice
    cents (same join-per-row profit expression). Part filter (name
    LIKE %widget%) and the supplier→nation map are driver-side dims
    broadcast into ONE lineitem pass; profit accumulates as exact
    cents²-int64 per (nation, year) block partials → narrow groupby
    sum → O(nations × years) gather."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    nat = _read_table(sf_dir, "nation",
                      columns=["n_nationkey", "n_name"])
    nmap = {r["n_nationkey"]: r["n_name"] for r in nat.to_pylist()}
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_nationkey"])
    skeys = pc.cast(supp.column("s_suppkey"), pa.int64()).combine_chunks()
    snat = np.asarray(supp.column("s_nationkey"), dtype=np.int64)
    part = _read_table(sf_dir, "part",
                       columns=["p_partkey", "p_name", "p_retailprice"])
    part = part.filter(pc.match_substring(part.column("p_name"),
                                          "widget"))
    pkeys = pc.cast(part.column("p_partkey"), pa.int64()).combine_chunks()
    pcents = np.asarray(pc.cast(pc.round(pc.multiply(
        pc.cast(part.column("p_retailprice"), pa.float64()),
        pa.scalar(100.0)), ndigits=0), pa.int64()))

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_extendedprice", "l_discount", "l_shipdate"])

    def partial(b: pa.Table) -> pa.Table:
        pi = np.asarray(pc.cast(pc.fill_null(pc.index_in(
            b.column("l_partkey"), value_set=pkeys), -1), pa.int64()),
            dtype=np.int64)
        ok = pi >= 0
        t = b.filter(pa.array(ok))
        pi = pi[ok]
        si = np.asarray(pc.cast(pc.index_in(
            t.column("l_suppkey"), value_set=skeys), pa.int64()),
            dtype=np.int64)
        nk = snat[si]
        yr = np.asarray(t.column("l_shipdate"),
                        dtype="datetime64[us]").astype(
            "datetime64[Y]").astype(np.int64) + 1970
        p = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        d = np.asarray(pc.cast(pc.round(pc.multiply(
            pc.subtract(pa.scalar(1.0),
                        pc.cast(t.column("l_discount"), pa.float64())),
            pa.scalar(100.0)), ndigits=0), pa.int64()))
        qty = np.asarray(t.column("l_quantity")).astype(np.int64)
        amount = p * d - qty * pcents[pi] * 10
        g = pa.table({"nk": pa.array(nk, pa.int64()),
                      "o_year": pa.array(yr, pa.int64()),
                      "a": pa.array(amount, pa.int64())}).group_by(
            ["nk", "o_year"]).aggregate([("a", "sum")])
        return g.rename_columns(["nk", "o_year", "a"])

    g = _to_table(li.map_batches(partial, batch_format="pyarrow")
                  .groupby(["nk", "o_year"]).sum("a"))
    nn = pa.array([nmap[int(k)] for k in
                   np.asarray(g.column("nk"), dtype=np.int64)],
                  pa.string())
    return pa.table({
        "nation": nn,
        "o_year": pc.cast(g.column("o_year"), pa.int64()),
        "sum_profit": pc.divide(
            pc.cast(g.column("sum(a)"), pa.float64()),
            pa.scalar(10000.0)),
    }).sort_by([("nation", "ascending"), ("o_year", "descending")])


def _q_tpch_q11(sf_dir: str):
    """TPC-H Q11 shape (important stock value, HAVING > fraction of
    the global total). No partsupp ⇒ value per part is the exact
    cents-int64 sum of l_extendedprice for one region's suppliers.
    One narrow per-part groupby from block partials; the global total
    is a Dataset.sum over the SAME materialized grouped result (no
    second scan, no driver gather of the fact stream); the HAVING
    filter and the final sort run on the O(parts) table."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    nat = _read_table(sf_dir, "nation",
                      columns=["n_nationkey", "n_regionkey"])
    nkeys = [r["n_nationkey"] for r in nat.to_pylist()
             if r["n_regionkey"] == 2]
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_nationkey"])
    supp = supp.filter(pc.is_in(supp.column("s_nationkey"),
                                value_set=pa.array(sorted(nkeys),
                                                   pa.int64())))
    skeys = pc.cast(supp.column("s_suppkey"), pa.int64()).combine_chunks()

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_extendedprice"])

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(pc.index_in(b.column("l_suppkey"),
                                             value_set=skeys)))
        c = pc.cast(pc.round(pc.multiply(
            pc.cast(t.column("l_extendedprice"), pa.float64()),
            pa.scalar(100.0)), ndigits=0), pa.int64())
        g = pa.table({"l_partkey": t.column("l_partkey"),
                      "v": c}).group_by(["l_partkey"]).aggregate(
            [("v", "sum")])
        return g.rename_columns(["l_partkey", "v"])

    vals = (li.map_batches(partial, batch_format="pyarrow")
            .groupby("l_partkey").sum("v")).materialize()
    total = int(vals.sum("sum(v)") or 0)
    nparts = max(vals.count(), 1)
    # scale-invariant HAVING: value > 2x the mean per-part value
    # (exact int arithmetic on both sides; TPC-H's fixed fraction
    # would select 0 rows once the part count grows with sf)
    thr = total * 2 // nparts
    kept = vals.map_batches(
        lambda t: t.filter(pc.greater(t.column("sum(v)"),
                                      pa.scalar(thr, pa.int64()))),
        batch_format="pyarrow")
    out = _to_table(kept)
    return pa.table({
        "p_partkey": pc.cast(out.column("l_partkey"), pa.int64()),
        "value": pc.divide(pc.cast(out.column("sum(v)"), pa.float64()),
                           pa.scalar(100.0)),
    }).sort_by([("value", "descending"), ("p_partkey", "ascending")])


def _q_tpch_q16(sf_dir: str):
    """TPC-H Q16 shape (supplier count per brand/type/size bucket with
    NOT-IN supplier exclusion). The part/supplier relation is the
    DISTINCT (l_partkey, l_suppkey) projection of lineitem (no
    partsupp in this corpus). Block-local pair dedupe → attach the
    broadcast (brand, type, size) dims → ONE distributed distinct on
    (brand, type, size, suppkey) → block-partial counts → O(buckets)
    final groupby. The NOT-IN is a vectorized is_in on the broadcast
    excluded-supplier set."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    part = _read_table(sf_dir, "part",
                       columns=["p_partkey", "p_brand", "p_type",
                                "p_size"])
    sizes = pa.array([1, 9, 14, 19, 23, 36, 45, 49], pa.int64())
    part = part.filter(pc.and_(
        pc.and_(pc.not_equal(part.column("p_brand"), "Brand#13"),
                pc.not_equal(part.column("p_type"), "PROMO")),
        pc.is_in(pc.cast(part.column("p_size"), pa.int64()),
                 value_set=sizes)))
    pkeys = pc.cast(part.column("p_partkey"), pa.int64()).combine_chunks()
    pbrand = part.column("p_brand").combine_chunks()
    ptype = part.column("p_type").combine_chunks()
    psize = np.asarray(part.column("p_size"), dtype=np.int64)

    supp = _read_table(sf_dir, "supplier", columns=["s_suppkey"])
    sk = np.asarray(pc.cast(supp.column("s_suppkey"), pa.int64()))
    bad = pa.array(sorted(sk[sk % 7 == 3].tolist()), pa.int64())

    li = _read(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pair_partial(b: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(pc.index_in(b.column("l_partkey"),
                                            value_set=pkeys)),
                    pc.invert(pc.is_in(
                        pc.cast(b.column("l_suppkey"), pa.int64()),
                        value_set=bad)))
        t = b.filter(m)
        pi = pc.index_in(pc.cast(t.column("l_partkey"), pa.int64()),
                         value_set=pkeys)
        g = pa.table({
            "p_brand": pbrand.take(pi),
            "p_type": ptype.take(pi),
            "p_size": pa.array(psize[np.asarray(pi, dtype=np.int64)],
                               pa.int64()),
            "l_suppkey": pc.cast(t.column("l_suppkey"), pa.int64()),
        }).group_by(["p_brand", "p_type", "p_size",
                     "l_suppkey"]).aggregate([])
        return g

    distinct = (li.map_batches(pair_partial, batch_format="pyarrow")
                .groupby(["p_brand", "p_type", "p_size", "l_suppkey"])
                .count())

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["p_brand", "p_type", "p_size"]).aggregate(
            [([], "count_all")])
        return g.rename_columns(["p_brand", "p_type", "p_size", "n"])

    out = _to_table(distinct.map_batches(count_partial,
                                         batch_format="pyarrow")
                    .groupby(["p_brand", "p_type", "p_size"]).sum("n"))
    return pa.table({
        "p_brand": out.column("p_brand"),
        "p_type": out.column("p_type"),
        "p_size": pc.cast(out.column("p_size"), pa.int64()),
        "supplier_cnt": pc.cast(out.column("sum(n)"), pa.int64()),
    }).sort_by([("supplier_cnt", "descending"),
                ("p_brand", "ascending"), ("p_type", "ascending"),
                ("p_size", "ascending")])


def _q_tpch_q20(sf_dir: str):
    """TPC-H Q20 shape (suppliers with excess availability of a named
    part family). Availability per (part, supplier) is the stand-in
    all-time qty sum vs 2× the qty shipped in one year (no partsupp's
    availqty here; same nested-aggregate semi-join chain). Name-
    filtered part keys broadcast-prune the lineitem stream; per-pair
    (total, in-window) sums come from block partials → one narrow
    pair groupby; the qualifying supplier set is tiny and joins the
    driver-side supplier/nation dims for the output."""
    import pyarrow.compute as pc

    from scrappy_ray.pipelines.analytics import _to_table

    part = _read_table(sf_dir, "part", columns=["p_partkey", "p_name"])
    part = part.filter(pc.starts_with(part.column("p_name"), "small"))
    pkeys = pc.cast(part.column("p_partkey"), pa.int64()).combine_chunks()

    li = _read(sf_dir, "lineitem",
               columns=["l_partkey", "l_suppkey", "l_quantity",
                        "l_shipdate"])
    lo = pa.scalar(np.datetime64("1997-01-01", "us"), pa.timestamp("us"))
    hi = pa.scalar(np.datetime64("1998-01-01", "us"), pa.timestamp("us"))

    def partial(b: pa.Table) -> pa.Table:
        t = b.filter(pc.is_valid(pc.index_in(b.column("l_partkey"),
                                             value_set=pkeys)))
        qty = np.asarray(t.column("l_quantity")).astype(np.int64)
        sd = t.column("l_shipdate")
        inwin = np.asarray(pc.and_(pc.greater_equal(sd, lo),
                                   pc.less(sd, hi)))
        g = pa.table({
            "l_partkey": t.column("l_partkey"),
            "l_suppkey": t.column("l_suppkey"),
            "tq": pa.array(qty, pa.int64()),
            "yq": pa.array(np.where(inwin, qty, 0), pa.int64()),
        }).group_by(["l_partkey", "l_suppkey"]).aggregate(
            [("tq", "sum"), ("yq", "sum")])
        return g.rename_columns(["l_partkey", "l_suppkey", "tq", "yq"])

    pairs = (li.map_batches(partial, batch_format="pyarrow")
             .groupby(["l_partkey", "l_suppkey"]).sum(["tq", "yq"]))
    qual = pairs.map_batches(
        lambda t: t.filter(pc.and_(
            pc.greater(t.column("sum(yq)"), pa.scalar(0, pa.int64())),
            pc.greater(t.column("sum(tq)"),
                       pc.multiply(pa.scalar(2, pa.int64()),
                                   t.column("sum(yq)"))))),
        batch_format="pyarrow")
    sset = _to_table(qual.select_columns(["l_suppkey"]))
    skeys = set(np.asarray(pc.cast(sset.column("l_suppkey"), pa.int64()))
                .tolist())

    nat = _read_table(sf_dir, "nation",
                      columns=["n_nationkey", "n_regionkey"])
    nk = {r["n_nationkey"] for r in nat.to_pylist()
          if r["n_regionkey"] in (1, 3)}
    supp = _read_table(sf_dir, "supplier",
                       columns=["s_suppkey", "s_name", "s_acctbal",
                                "s_nationkey"])
    rows = [(r["s_name"], r["s_acctbal"]) for r in supp.to_pylist()
            if r["s_suppkey"] in skeys and r["s_nationkey"] in nk]
    rows.sort()
    return pa.table({
        "s_name": pa.array([r[0] for r in rows], pa.string()),
        "s_acctbal": pa.array([r[1] for r in rows], pa.float64()),
    })


# ---------------------------------------------------------------- contract


def entry() -> Any:
    """Flagship smoke pipeline on sf0.001: exact-dedup the documents
    table then token-stat the survivors (join of two engine ops)."""
    from scrappy_ray.functions.dedup import exact_dedup
    from scrappy_ray.functions.textstats import token_stats

    sf = "/root/testdata/sf0.001"
    kept = exact_dedup(_read(sf, "documents", columns=["doc_id", "text"]))
    return token_stats(kept).sort("doc_id")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "tpch_q1": _q_tpch_q1,
        "top_orders": _q_top_orders,
        "region_customers": _q_region_customers,
        "events_daily": _q_events_daily,
        "revenue_by_priority": _q_revenue_by_priority,
        "distinct_event_types": _q_distinct_event_types,
        "orders_per_customer": _q_orders_per_customer,
        "customers_no_urgent": _q_customers_no_urgent,
        "sessionize": _q_sessionize,
        "revisit_stats": _q_revisit_stats,
        "revisit_stats_salted": _q_revisit_stats_salted,
        "rolling_window": _q_rolling_window,
        "events_window": _q_events_window,
        "filter_pushdown": _q_filter_pushdown,
        "mktsegment": _q_mktsegment,
        "part_types": _q_part_types,
        "supplier_nation": _q_supplier_nation,
        "dedup_exact": _q_dedup_exact,
        "url_dedup": _q_url_dedup,
        "url_traps": _q_url_traps,
        "pii_scrub": _q_pii_scrub,
        "span_removal": _q_span_removal,
        "normalize_text": _q_normalize_text,
        "token_stats": _q_token_stats,
        "readability": _q_readability,
        "punct_ratio": _q_punct_ratio,
        "repetition": _q_repetition,
        "gopher_rules": _q_gopher_rules,
        "chunk_docs": _q_chunk_docs,
        "pack_sequences": _q_pack_sequences,
        "shuffle_det": _q_shuffle_det,
        "perplexity": _q_perplexity,
        "value_quantiles": _q_value_quantiles,
        "pivot_events": _q_pivot_events,
        "top_per_group": _q_top_per_group,
        "range_join": _q_range_join,
        "asof_join": _q_asof_join,
        "fuzzy_join": _q_fuzzy_join,
        "paragraph_dedup": _q_paragraph_dedup,
        "top_ngrams": _q_top_ngrams,
        "collocations": _q_collocations,
        "inverted_search": _q_inverted_search,
        "snapshot_diff": _q_snapshot_diff,
        "index_lookup": _q_index_lookup,
        "hash_sample": _q_hash_sample,
        "stratified_sample": _q_stratified_sample,
        "mix_corpus": _q_mix_corpus,
        "decontaminate": _q_decontaminate,
        "tfidf_topk": _q_tfidf,
        "approx_distinct": _q_approx_distinct,
        "approx_quantiles": _q_approx_quantiles,
        "heavy_hitters": _q_heavy_hitters,
        "heavy_hitters_by_group": _q_heavy_hitters_by_group,
        "quality_classify": _q_quality_classify,
        "semantic_dedup": _q_semantic_dedup,
        "substr_dedup": _q_substr_dedup,
        "incremental_dedup": _q_incremental_dedup,
        "incremental_near_dedup": _q_incremental_near_dedup,
        "compression_ratio": _q_compression_ratio,
        "mirror_sources": _q_mirror_sources,
        "dup_histogram": _q_dup_histogram,
        "rank_windows": _q_rank_windows,
        "rollup_orders": _q_rollup_orders,
        "funnel": _q_funnel,
        "retention": _q_retention,
        "events_resample": _q_events_resample,
        "unpivot_events": _q_unpivot_events,
        "url_templates": _q_url_templates,
        "graph_reciprocity": _q_graph_reciprocity,
        "script_mix": _q_script_mix,
        "group_sample": _q_group_sample,
        "ipc_roundtrip": _q_ipc_roundtrip,
        "leakage_split": _q_leakage_split,
        "domain_stats": _q_domain_stats,
        "domain_filter": _q_domain_filter,
        "sim_topk": _q_sim_topk,
        "dedup_minhash": _q_dedup_minhash,
        "dedup_simhash": _q_dedup_simhash,
        "dedup_embedding": _q_dedup_embedding,
        "lang_id": _q_lang_id,
        "fingerprint": _q_fingerprint,
        "bpe_tokens": _q_bpe_tokens,
        "quality_scores": _q_quality,
        "quality_buckets": _q_quality_buckets,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "dedup_components": _q_dedup_components,
        "corpus_clean": _q_corpus_clean,
        "mm_decode": _q_mm_decode,
        "mm_decode_png": _q_mm_decode_png,
        "mm_decode_jpeg": _q_mm_decode_jpeg,
        "img_dedup": _q_img_dedup,
        "img_resize": _q_img_resize,
        "audio_dedup": _q_audio_dedup,
        "mm_dedup_clusters": _q_mm_dedup_clusters,
        "audio_resample": _q_audio_resample,
        "mm_frames_apng": _q_mm_frames_apng,
        "audio_decode": _q_audio_decode,
        "extract_triples": _q_extract_triples,
        "extract_text": _q_extract_text,
        "main_content": _q_main_content,
        "anchor_texts": _q_anchor_texts,
        "serialize_roundtrip": _q_serialize_roundtrip,
        "warc_roundtrip": _q_warc_roundtrip,
        "jsonl_roundtrip": _q_jsonl_roundtrip,
        "jsonl_gz_roundtrip": _q_jsonl_gz_roundtrip,
        "csv_roundtrip": _q_csv_roundtrip,
        "robots_stats": _q_robots_stats,
        "export_roundtrip": _q_export_roundtrip,
        "sitemap_parse": _q_sitemap_parse,
        "pagerank": _q_pagerank,
        "graph_degrees": _q_graph_degrees,
        "crawl_bfs": _q_crawl_bfs,
        "crawl_politeness": _q_crawl_politeness,
        "crawl_priority": _q_crawl_priority,
        "crawl_hostrank": _q_crawl_hostrank,
        "weighted_sample": _q_weighted_sample,
        "source_overlap": _q_source_overlap,
        "salted_join": _q_salted_join,
        "profile_table": _q_profile_table,
        "group_corr": _q_group_corr,
        "group_outliers": _q_group_outliers,
        "session_ids": _q_session_ids,
        "event_transitions": _q_event_transitions,
        "value_histogram": _q_value_histogram,
        "cube_orders": _q_cube_orders,
        "mode_event_type": _q_mode_event_type,
        "bloom_semi_join": _q_bloom_semi_join,
        "graph_triangles": _q_graph_triangles,
        "mad_outliers": _q_mad_outliers,
        "distinct_users": _q_distinct_users,
        "dist_windows": _q_dist_windows,
        "char_entropy": _q_char_entropy,
        "partition_prune": _q_partition_prune,
        "hopping_windows": _q_hopping_windows,
        "first_last": _q_first_last,
        "group_summary": _q_group_summary,
        "weighted_mean": _q_weighted_mean,
        "embedding_norms": _q_embedding_norms,
        "calendar_profile": _q_calendar_profile,
        "type_token_ratio": _q_type_token_ratio,
        "vocab_by_source": _q_vocab_by_source,
        "source_vocab_jaccard": _q_source_vocab_jaccard,
        "global_rank": _q_global_rank,
        "user_growth": _q_user_growth,
        "longest_session": _q_longest_session,
        "daily_quantiles": _q_daily_quantiles,
        "type_cooccurrence": _q_type_cooccurrence,
        "rfm_customers": _q_rfm_customers,
        "dup_rate_by_source": _q_dup_rate_by_source,
        "late_events": _q_late_events,
        "json_field_stats": _q_json_field_stats,
        "embedding_dim_stats": _q_embedding_dim_stats,
        "chi_square": _q_chi_square,
        "daily_change": _q_daily_change,
        "dedup_best": _q_dedup_best,
        "orc_roundtrip": _q_orc_roundtrip,
        "rolling_median": _q_rolling_median,
        "longest_streak": _q_longest_streak,
        "winsorize": _q_winsorize,
        "user_entropy": _q_user_entropy,
        "conversion_time": _q_conversion_time,
        "tpch_q3": _q_tpch_q3,
        "tpch_q5": _q_tpch_q5,
        "type_sequences": _q_type_sequences,
        "full_outer_daily": _q_full_outer_daily,
        "event_gaps": _q_event_gaps,
        "redirect_chains": _q_redirect_chains,
        "badwords_filter": _q_badwords_filter,
        "graph_bfs": _q_graph_bfs,
        "weekly_active": _q_weekly_active,
        "length_gini": _q_length_gini,
        "source_kl": _q_source_kl,
        "bounce_rate": _q_bounce_rate,
        "tpch_q18": _q_tpch_q18,
        "tpch_q4": _q_tpch_q4,
        "group_linreg": _q_group_linreg,
        "autocorr": _q_autocorr,
        "skyline": _q_skyline,
        "component_sizes": _q_component_sizes,
        "weighted_median": _q_weighted_median,
        "last_touch": _q_last_touch,
        "cheapest_supplier": _q_cheapest_supplier,
        "revenue_share": _q_revenue_share,
        "tpch_q14": _q_tpch_q14,
        "tpch_q10": _q_tpch_q10,
        "tpch_q6": _q_tpch_q6,
        "nation_revenue_share": _q_nation_revenue_share,
        "tpch_q17": _q_tpch_q17,
        "tpch_q15": _q_tpch_q15,
        "label_centroids": _q_label_centroids,
        "knn_classify": _q_knn_classify,
        "tpch_q19": _q_tpch_q19,
        "tpch_q13": _q_tpch_q13,
        "tpch_q22": _q_tpch_q22,
        "tpch_q12": _q_tpch_q12,
        "tpch_q7": _q_tpch_q7,
        "tpch_q8": _q_tpch_q8,
        "tpch_q21": _q_tpch_q21,
        "churned_customers": _q_churned_customers,
        "ship_latency_p95": _q_ship_latency_p95,
        "tpch_q2": _q_tpch_q2,
        "tpch_q9": _q_tpch_q9,
        "tpch_q11": _q_tpch_q11,
        "tpch_q16": _q_tpch_q16,
        "tpch_q20": _q_tpch_q20,
    }


def _sql_word_list(words) -> str:
    return "[" + ",".join(f"'{w}'" for w in sorted(words)) + "]"


def _SAMPLING_SQLS() -> dict[str, str]:
    """Sampling oracles share the Knuth hash + integer thresholds with
    the Ray kernels (imported, not copied, so they cannot drift)."""
    from scrappy_ray.functions.sampling import KNUTH, threshold_for

    h = f"((CAST(doc_id AS HUGEINT) + {{salt}}) * {KNUTH}) % 4294967296"
    return {
        "hash_sample": f"""
            SELECT doc_id FROM documents
            WHERE {h.format(salt=7)} < {threshold_for(0.25)}
            ORDER BY doc_id
        """,
        "stratified_sample": f"""
            SELECT doc_id, source FROM documents
            WHERE {h.format(salt=3)} <
              CASE source
                WHEN 'src0' THEN {threshold_for(1.0)}
                WHEN 'src1' THEN {threshold_for(0.5)}
                WHEN 'src2' THEN {threshold_for(0.1)}
                ELSE {threshold_for(0.05)}
              END
            ORDER BY doc_id
        """,
        "mix_corpus": f"""
            SELECT doc_id, source,
                   CAST(UNNEST(range(CASE source
                     WHEN 'src0' THEN 2 + (({h.format(salt=11)}) < {threshold_for(0.5)})::INT
                     WHEN 'src1' THEN 1
                     WHEN 'src2' THEN 0 + (({h.format(salt=11)}) < {threshold_for(0.25)})::INT
                     ELSE 0 END)) AS BIGINT) AS epoch
            FROM documents ORDER BY doc_id, epoch
        """,
        "shuffle_det": f"""
            SELECT CAST(row_number() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) - 1
                     AS rank,
                   doc_id, CAST(shuffle_key AS BIGINT) AS shuffle_key
            FROM (SELECT doc_id, {h.format(salt=13)} AS shuffle_key FROM documents)
            ORDER BY rank LIMIT 100
        """,
        "weighted_sample": f"""
            SELECT doc_id, n_chars FROM (
              SELECT doc_id, n_chars,
                     POWER(({h.format(salt=7)} + 0.5) / 4294967296.0,
                           1.0 / n_chars) AS skey
              FROM documents WHERE n_chars > 0
              ORDER BY skey DESC, doc_id LIMIT 100)
            ORDER BY doc_id
        """,
        "leakage_split": f"""
            WITH k AS (
              SELECT doc_id,
                     md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key
              FROM documents),
            r AS (SELECT content_key, MIN(doc_id) AS root
                  FROM k GROUP BY content_key)
            SELECT k.doc_id, r.root,
                   CASE WHEN ((CAST(r.root AS HUGEINT) + 17) * {KNUTH})
                          % 4294967296 < {threshold_for(0.9)}
                        THEN 'train' ELSE 'test' END AS split
            FROM k JOIN r USING (content_key)
            ORDER BY k.doc_id
        """,
    }


# the quality composite over the `base` intermediate columns (shared by
# quality_scores / domain_stats / domain_filter so it cannot drift)
_QUAL_EXPR = """LEAST(n_tokens_i / 20.0, 1.0) * 0.3
    + LEAST(punct_i / GREATEST(n_chars_i, 1.0) * 20.0, 1.0) * 0.2
    + (1.0 - LEAST(digit_i / GREATEST(n_chars_i, 1.0) * 5.0, 1.0)) * 0.2
    + LEAST(stop_i / GREATEST(n_tokens_i, 1.0) * 3.0, 1.0) * 0.3"""


def _lang_quality_sqls() -> dict[str, str]:
    """SQL oracles that re-express the textstats heuristics with DuckDB
    list lambdas — the SAME stopword lists as the Ray kernels (imported,
    not copied, so they cannot drift)."""
    from scrappy_ray.functions.textstats import _EN, _ES

    en, es = _sql_word_list(_EN), _sql_word_list(_ES)
    toks = "regexp_split_to_array(TRIM(text), '\\s+')"
    ltoks = "regexp_split_to_array(TRIM(LOWER(text)), '\\s+')"
    base = f"""
      SELECT doc_id, source,
        LENGTH(text) AS n_chars_i,
        LEN({toks}) AS n_tokens_i,
        LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS punct_i,
        LENGTH(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_i,
        LENGTH(regexp_replace(text, '[^A-Z]', '', 'g')) AS upper_i,
        len(list_filter({ltoks}, tk -> list_contains({en}, tk) OR list_contains({es}, tk))) AS stop_i,
        len(list_filter({ltoks}, tk -> list_contains({en}, tk))) AS en_c,
        len(list_filter({ltoks}, tk -> list_contains({es}, tk))) AS es_c
      FROM documents"""
    return {
        "lang_id": f"""
            SELECT doc_id,
                   CASE WHEN en_c > es_c THEN 'en'
                        WHEN es_c > en_c THEN 'es'
                        ELSE 'und' END AS lang_pred
            FROM ({base}) ORDER BY doc_id
        """,
        "quality_scores": f"""
            SELECT doc_id,
                   CAST(n_chars_i AS BIGINT) AS n_chars,
                   CAST(n_tokens_i AS BIGINT) AS n_tokens,
                   ROUND(punct_i / GREATEST(n_chars_i, 1.0), 6) AS punct_ratio,
                   ROUND(digit_i / GREATEST(n_chars_i, 1.0), 6) AS digit_ratio,
                   ROUND(upper_i / GREATEST(n_chars_i, 1.0), 6) AS upper_ratio,
                   ROUND(n_chars_i / GREATEST(n_tokens_i, 1.0), 6) AS mean_word_len,
                   ROUND(stop_i / GREATEST(n_tokens_i, 1.0), 6) AS stopword_ratio,
                   ROUND(LEAST(n_tokens_i / 20.0, 1.0) * 0.3
                         + LEAST(punct_i / GREATEST(n_chars_i, 1.0) * 20.0, 1.0) * 0.2
                         + (1.0 - LEAST(digit_i / GREATEST(n_chars_i, 1.0) * 5.0, 1.0)) * 0.2
                         + LEAST(stop_i / GREATEST(n_tokens_i, 1.0) * 3.0, 1.0) * 0.3, 6) AS quality
            FROM ({base}) ORDER BY doc_id
        """,
        "quality_buckets": f"""
            WITH s AS (SELECT doc_id, ROUND({_QUAL_EXPR}, 6) AS quality FROM ({base})),
            c AS (SELECT [{", ".join(
                f"percentile_disc({i / 10}) WITHIN GROUP (ORDER BY quality)"
                for i in range(1, 10))}] AS cuts FROM s)
            SELECT s.doc_id, s.quality,
                   CAST(len(list_filter(c.cuts, x -> x < s.quality)) AS BIGINT) AS bucket
            FROM s, c ORDER BY s.doc_id
        """,
        "domain_stats": f"""
            SELECT source, COUNT(*) AS n_docs,
                   ROUND(AVG({_QUAL_EXPR}), 6) AS mean_quality
            FROM ({base}) GROUP BY source ORDER BY source
        """,
        "domain_filter": f"""
            SELECT doc_id, source FROM documents
            WHERE source IN (
              SELECT source FROM ({base})
              GROUP BY source
              HAVING COUNT(*) >= 10 AND AVG({_QUAL_EXPR}) >= 0.55)
            ORDER BY doc_id
        """,
    }


# Queries whose values are deterministic but not SQL-expressible get a
# FROZEN-GOLDEN oracle: the committed sf0.01 output parquet (regenerated
# by tools/gen_oracle_goldens.py) read back by DuckDB. This checks
# value-level determinism/regressions; the semantics themselves are
# covered by the pytest suite (simulator parity, planted-dup recovery,
# byte-exact extraction goldens).
_GOLDEN_ORACLES = {
    "approx_distinct": "ORDER BY event_type",
    "approx_quantiles": "ORDER BY event_type",
    "quality_classify": "ORDER BY doc_id",
    "semantic_dedup": "ORDER BY vec_id",
    "fingerprint": "ORDER BY doc_id",
    "bpe_tokens": "ORDER BY doc_id",
    "dedup_simhash": "ORDER BY id_a, id_b",
    "dedup_minhash": "ORDER BY id_a, id_b",
    "dedup_embedding": "ORDER BY id_a, id_b",
    "dedup_components": "ORDER BY doc_id",
    "corpus_clean": "ORDER BY doc_id",
    "ann_lsh": "ORDER BY query_id, rank",
    "ann_ivf": "ORDER BY query_id, rank",
    "mm_decode": "ORDER BY id",
    "mm_decode_png": "ORDER BY id",
    "mm_decode_jpeg": "ORDER BY id",
    "img_dedup": "ORDER BY id_a, id_b",
    "img_resize": "ORDER BY id",
    "audio_dedup": "ORDER BY id_a, id_b",
    "mm_dedup_clusters": "ORDER BY doc_id",
    "audio_resample": "ORDER BY id",
    "mm_frames_apng": "ORDER BY id, frame_idx",
    "audio_decode": "ORDER BY id",
    "compression_ratio": "ORDER BY doc_id",
    "incremental_near_dedup": "ORDER BY doc_id",
    "extract_triples": "ORDER BY url, s, p, o, lit",
    "extract_text": "ORDER BY url",
    "main_content": "ORDER BY url",
    "anchor_texts": "ORDER BY dst",
    "robots_stats": "ORDER BY host",
    "serialize_roundtrip": "ORDER BY s, p, o, lit",
    "crawl_bfs": "ORDER BY seq",
    "crawl_politeness": "ORDER BY round, seq",
    "crawl_priority": "ORDER BY round, seq",
    "crawl_hostrank": "ORDER BY round, seq",
}


def _golden_oracle_sqls() -> dict[str, str]:
    out = {}
    for name, order in _GOLDEN_ORACLES.items():
        path = os.path.join(_REPO, "tests", "golden", "oracle", f"{name}.parquet")
        if os.path.exists(path):
            out[name] = f"SELECT * FROM read_parquet('{path}') {order}"
    return out


def oracle_sql() -> dict[str, str]:
    out = _oracle_sql_static()
    out.update(_lang_quality_sqls())
    out.update(_graph_sqls())
    out.update(_golden_oracle_sqls())
    # the salted variant must equal the unsalted operator exactly —
    # same oracle
    out["revisit_stats_salted"] = out["revisit_stats"]
    return out


def _oracle_sql_static() -> dict[str, str]:
    return {
        "tpch_q1": f"""
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), {ROUND}) AS sum_qty,
                   ROUND(SUM(l_extendedprice), {ROUND}) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), {ROUND}) AS sum_disc_price,
                   ROUND(AVG(l_quantity), {ROUND}) AS avg_qty,
                   ROUND(AVG(l_discount), {ROUND}) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus
        """,
        "top_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
        """,
        "fuzzy_join": """
            WITH probes AS (
              SELECT p_partkey AS probe_id,
                     substr(p_name, 1, 4 + (p_partkey % (len(p_name) - 4)))
                       || substr(p_name, 4 + (p_partkey % (len(p_name) - 4)) + 2)
                       AS probe
              FROM part)
            SELECT pr.probe_id, p.p_partkey,
                   levenshtein(pr.probe, p.p_name) AS dist
            FROM probes pr JOIN part p
              ON substr(pr.probe, 1, 4) = substr(p.p_name, 1, 4)
            WHERE levenshtein(pr.probe, p.p_name) <= 2
            ORDER BY pr.probe_id, p.p_partkey
        """,
        "mirror_sources": """
            WITH k AS (
              SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key,
                     source
              FROM documents)
            SELECT content_key, COUNT(DISTINCT source) AS n_sources,
                   STRING_AGG(DISTINCT source, ',' ORDER BY source) AS sources
            FROM k GROUP BY content_key
            HAVING COUNT(DISTINCT source) >= 2
            ORDER BY content_key
        """,
        "dup_histogram": """
            WITH k AS (
              SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key
              FROM documents),
            g AS (SELECT content_key, COUNT(*) AS sz FROM k GROUP BY content_key)
            SELECT sz AS size, COUNT(*) AS n_groups FROM g
            GROUP BY sz ORDER BY sz
        """,
        "source_overlap": """
            WITH f AS (
              SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key,
                     MAX(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS a,
                     MAX(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS b
              FROM documents WHERE source IN ('src0', 'src1')
              GROUP BY content_key)
            SELECT content_key,
                   CASE WHEN a = 1 AND b = 1 THEN 'intersect'
                        WHEN a = 1 THEN 'except_a'
                        ELSE 'except_b' END AS op
            FROM f ORDER BY content_key
        """,
        "salted_join": """
            SELECT o_orderkey, o_custkey, c_name, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey
        """,
        "profile_table": """
            SELECT * FROM (
              SELECT 'doc_id' AS col_name, COUNT(*) AS n_rows,
                     COUNT(*) - COUNT(doc_id) AS n_nulls,
                     COUNT(DISTINCT doc_id) AS n_distinct,
                     CAST(MIN(doc_id) AS VARCHAR) AS min_v,
                     CAST(MAX(doc_id) AS VARCHAR) AS max_v
              FROM documents
              UNION ALL
              SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
                     COUNT(DISTINCT lang), MIN(lang), MAX(lang)
              FROM documents
              UNION ALL
              SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
                     COUNT(DISTINCT source), MIN(source), MAX(source)
              FROM documents
              UNION ALL
              SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
                     COUNT(DISTINCT n_chars),
                     CAST(MIN(n_chars) AS VARCHAR),
                     CAST(MAX(n_chars) AS VARCHAR)
              FROM documents)
            ORDER BY col_name
        """,
        "group_corr": """
            WITH b AS (
              SELECT source, n_chars AS x,
                     LEN(string_split(text, ' ')) AS y
              FROM documents),
            m AS (SELECT source, COUNT(*) AS n,
                         SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
                         SUM(y*y) AS syy, SUM(x*y) AS sxy
                  FROM b GROUP BY source)
            SELECT source, n,
                   ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                         / SQRT(CAST(n*sxx - sx*sx AS DOUBLE)
                                * (n*syy - sy*sy)), 6) AS corr_xy
            FROM m ORDER BY source
        """,
        "group_outliers": """
            WITH m AS (
              SELECT source, COUNT(*) AS n, SUM(n_chars) AS sx,
                     SUM(n_chars * n_chars) AS sxx
              FROM documents GROUP BY source),
            z AS (
              SELECT d.doc_id, d.source, d.n_chars,
                     ROUND((d.n_chars - CAST(m.sx AS DOUBLE) / m.n)
                           / SQRT((CAST(m.sxx AS DOUBLE)
                                   - CAST(m.sx AS DOUBLE) * m.sx / m.n)
                                  / (m.n - 1)), 6) AS z
              FROM documents d JOIN m USING (source) WHERE m.n > 1)
            SELECT doc_id, source, n_chars, z FROM z
            WHERE ABS(z) > 1.5 ORDER BY doc_id
        """,
        "tpch_q3": """
            SELECT l.l_orderkey,
                   SUM(CAST(ROUND(l.l_extendedprice
                                  * (1 - l.l_discount) * 100)
                            AS BIGINT)) / 100.0 AS revenue,
                   strftime(o.o_orderdate, '%Y-%m-%d') AS o_orderdate
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE c.c_mktsegment = 'BUILDING'
            GROUP BY l.l_orderkey, o.o_orderdate
            ORDER BY SUM(CAST(ROUND(l.l_extendedprice
                                    * (1 - l.l_discount) * 100)
                              AS BIGINT)) DESC, l.l_orderkey
            LIMIT 10
        """,
        "tpch_q5": """
            SELECT n.n_name,
                   SUM(CAST(ROUND(l.l_extendedprice
                                  * (1 - l.l_discount) * 100)
                            AS BIGINT)) / 100.0 AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
                         AND s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "type_sequences": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id)
                     AS type_seq,
                   COUNT(*)::BIGINT AS n
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "full_outer_daily": """
            WITH v AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                              COUNT(*)::BIGINT AS c
                       FROM events WHERE event_type = 'view'
                       GROUP BY day),
            p AS (SELECT strftime(ts, '%Y-%m-%d') AS day,
                         COUNT(*)::BIGINT AS c
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY day)
            SELECT COALESCE(v.day, p.day) AS day,
                   COALESCE(v.c, 0)::BIGINT AS views,
                   COALESCE(p.c, 0)::BIGINT AS purchases
            FROM v FULL OUTER JOIN p ON v.day = p.day ORDER BY day
        """,
        "event_gaps": """
            WITH g AS (
              SELECT event_type,
                     epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id)
                       AS gap_us
              FROM events)
            SELECT event_type,
                   CAST(percentile_disc(0.5)
                        WITHIN GROUP (ORDER BY gap_us) AS DOUBLE)
                     AS p50,
                   CAST(percentile_disc(0.9)
                        WITHIN GROUP (ORDER BY gap_us) AS DOUBLE)
                     AS p90,
                   CAST(percentile_disc(0.99)
                        WITHIN GROUP (ORDER BY gap_us) AS DOUBLE)
                     AS p99,
                   COUNT(gap_us)::BIGINT AS n
            FROM g WHERE gap_us IS NOT NULL
            GROUP BY event_type ORDER BY event_type
        """,
        "redirect_chains": """
            WITH RECURSIVE edges AS (
              SELECT doc_id AS src, doc_id - 1 AS dst
              FROM documents WHERE doc_id % 4 <> 0),
            walk(src, cur, hops) AS (
              SELECT src, dst, 1 FROM edges
              UNION ALL
              SELECT w.src, e.dst, w.hops + 1
              FROM walk w JOIN edges e ON w.cur = e.src)
            SELECT w.src AS src, w.cur AS final,
                   CAST(w.hops AS BIGINT) AS hops
            FROM walk w
            WHERE w.cur NOT IN (SELECT src FROM edges)
            ORDER BY src
        """,
        "badwords_filter": """
            SELECT source, COUNT(*)::BIGINT AS docs,
                   SUM(CASE WHEN nb > 0 THEN 1 ELSE 0 END)::BIGINT
                     AS flagged,
                   SUM(nb)::BIGINT AS bad_tokens
            FROM (SELECT source,
                         len(list_filter(
                             str_split(text, ' '),
                             x -> list_contains(['dup','spark','stream'],
                                                x))) AS nb
                  FROM documents)
            GROUP BY source ORDER BY source
        """,
        "graph_bfs": """
            WITH RECURSIVE m AS (SELECT MAX(doc_id) AS mx FROM documents),
            e AS (
              SELECT doc_id AS src, doc_id + 1 AS dst
              FROM documents, m WHERE doc_id + 1 <= mx
              UNION ALL
              SELECT doc_id, doc_id + 4 FROM documents, m
              WHERE doc_id + 4 <= mx),
            bfs(v, d) AS (
              SELECT doc_id, 0 FROM documents WHERE doc_id % 16 = 0
              UNION
              SELECT e.dst, b.d + 1 FROM bfs b JOIN e ON e.src = b.v
              WHERE b.d < 8)
            SELECT v, CAST(MIN(d) AS BIGINT) AS depth
            FROM bfs GROUP BY v ORDER BY v
        """,
        "weekly_active": """
            WITH du AS (SELECT DISTINCT epoch_us(ts) // 86400000000
                                 AS day, user_id
                        FROM events),
            dd AS (SELECT DISTINCT day FROM du)
            SELECT dd.day AS day,
                   COUNT(DISTINCT du.user_id)::BIGINT AS wau
            FROM dd JOIN du ON du.day BETWEEN dd.day - 6 AND dd.day
            GROUP BY dd.day ORDER BY dd.day
        """,
        "length_gini": """
            WITH r AS (
              SELECT source, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY n_chars, doc_id) AS i,
                     COUNT(*) OVER (PARTITION BY source) AS n,
                     SUM(n_chars) OVER (PARTITION BY source) AS s
              FROM documents)
            SELECT source, MAX(n)::BIGINT AS n,
                   ROUND(2.0 * SUM(i * n_chars) / (MAX(n) * MAX(s))
                         - (MAX(n) + 1.0) / MAX(n), 6) AS gini
            FROM r GROUP BY source ORDER BY source
        """,
        "source_kl": """
            WITH st AS (
              SELECT source, tok, COUNT(*)::BIGINT AS c
              FROM (SELECT source, unnest(str_split(text, ' ')) AS tok
                    FROM documents)
              GROUP BY source, tok),
            s AS (SELECT source, SUM(c)::BIGINT AS n
                  FROM st GROUP BY source),
            gt AS (SELECT tok, SUM(c)::BIGINT AS gc FROM st GROUP BY tok),
            g AS (SELECT SUM(c)::DOUBLE AS gn FROM st)
            SELECT st.source,
                   ROUND(SUM(CAST(ROUND(
                       (st.c / CAST(s.n AS DOUBLE))
                       * log2((st.c / CAST(s.n AS DOUBLE))
                              / (gt.gc / g.gn)) * 1e9) AS BIGINT))
                     / 1e9, 6) AS kl_bits
            FROM st JOIN s USING (source) JOIN gt USING (tok)
                 CROSS JOIN g
            GROUP BY st.source ORDER BY st.source
        """,
        "bounce_rate": """
            WITH o AS (
              SELECT user_id, event_id, epoch_us(ts) AS t,
                     LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                       AS prev
              FROM events),
            s AS (
              SELECT user_id, t,
                     SUM(CASE WHEN prev IS NULL
                              OR t - prev > 1800000000
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY t, event_id
                             ROWS UNBOUNDED PRECEDING) AS sid
              FROM o),
            ses AS (SELECT user_id, sid,
                           MIN(t) // 86400000000 AS day,
                           COUNT(*) AS sz
                    FROM s GROUP BY user_id, sid)
            SELECT CAST(day AS BIGINT) AS day,
                   COUNT(*)::BIGINT AS n_sessions,
                   SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)::BIGINT
                     AS n_bounces,
                   ROUND(SUM(CASE WHEN sz = 1 THEN 1 ELSE 0 END)
                         / CAST(COUNT(*) AS DOUBLE), 6) AS bounce_rate
            FROM ses GROUP BY day ORDER BY day
        """,
        "tpch_q18": """
            WITH s AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                       AS sum_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
            SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice, s.sum_qty
            FROM s JOIN orders o ON o.o_orderkey = s.l_orderkey
                   JOIN customer c ON c.c_custkey = o.o_custkey
            ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 100
        """,
        "tpch_q4": """
            SELECT o_orderpriority, COUNT(*)::BIGINT AS order_count
            FROM orders o
            WHERE EXISTS (SELECT 1 FROM lineitem l
                          WHERE l.l_orderkey = o.o_orderkey
                            AND l.l_returnflag = 'R')
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "group_linreg": """
            WITH d AS (
              SELECT source, n_chars AS x,
                     len(string_split(text, ' ')) AS y
              FROM documents),
            m AS (SELECT source, COUNT(*)::BIGINT AS n,
                         SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
                         SUM(x*x)::BIGINT AS sxx, SUM(y*y)::BIGINT AS syy,
                         SUM(x*y)::BIGINT AS sxy
                  FROM d GROUP BY source)
            SELECT source, n,
                   ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                         / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
                   ROUND(CAST(sy AS DOUBLE)/n
                         - (CAST(n*sxy - sx*sy AS DOUBLE)
                            / CAST(n*sxx - sx*sx AS DOUBLE))
                           * (CAST(sx AS DOUBLE)/n), 6) AS intercept,
                   CASE WHEN n*syy - sy*sy > 0 THEN
                     ROUND((CAST(n*sxy - sx*sy AS DOUBLE)
                            * CAST(n*sxy - sx*sy AS DOUBLE))
                           / (CAST(n*sxx - sx*sx AS DOUBLE)
                              * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                   END AS r2
            FROM m WHERE n*sxx - sx*sx > 0
            ORDER BY source
        """,
        "autocorr": """
            WITH e AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     CAST(ROUND(CAST(value AS DOUBLE) * 100) AS BIGINT)
                       AS q,
                     ts, event_id
              FROM events),
            l AS (
              SELECT event_type, day, q AS y,
                     LAG(q) OVER (PARTITION BY event_type, day
                                  ORDER BY ts, event_id) AS x
              FROM e),
            p AS (SELECT event_type, day, x, y FROM l WHERE x IS NOT NULL),
            m AS (SELECT event_type, day, COUNT(*)::BIGINT AS n,
                         SUM(x)::BIGINT AS sx, SUM(y)::BIGINT AS sy,
                         SUM(x*x)::BIGINT AS sxx, SUM(y*y)::BIGINT AS syy,
                         SUM(x*y)::BIGINT AS sxy
                  FROM p GROUP BY event_type, day)
            SELECT event_type, CAST(day AS BIGINT) AS day,
                   n AS n_pairs,
                   ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                         / sqrt(CAST(n*sxx - sx*sx AS DOUBLE)
                                * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                     AS autocorr
            FROM m WHERE n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
            ORDER BY event_type, day
        """,
        "skyline": """
            SELECT p.p_partkey, p.p_retailprice, p.p_size
            FROM part p
            WHERE NOT EXISTS (
              SELECT 1 FROM part q
              WHERE q.p_retailprice <= p.p_retailprice
                AND q.p_size >= p.p_size
                AND (q.p_retailprice < p.p_retailprice
                     OR q.p_size > p.p_size))
            ORDER BY p.p_partkey
        """,
        "user_entropy": """
            WITH c AS (SELECT user_id, event_type, COUNT(*)::BIGINT AS n
                       FROM events GROUP BY user_id, event_type),
            t AS (SELECT user_id, SUM(n) AS tot FROM c GROUP BY user_id)
            SELECT c.user_id, CAST(t.tot AS BIGINT) AS n_events,
                   ROUND(-SUM((c.n / CAST(t.tot AS DOUBLE))
                              * log2(c.n / CAST(t.tot AS DOUBLE)))
                         + 0.0, 6) AS entropy
            FROM c JOIN t USING (user_id)
            GROUP BY c.user_id, t.tot ORDER BY c.user_id
        """,
        "conversion_time": """
            WITH m AS (
              SELECT user_id,
                     MIN(CASE WHEN event_type = 'view' THEN ts END)
                       AS t0,
                     MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                       AS t1
              FROM events GROUP BY user_id),
            d AS (SELECT (epoch_us(t1) - epoch_us(t0)) / 1000000.0
                           AS delta
                  FROM m WHERE t0 IS NOT NULL AND t1 IS NOT NULL
                        AND t1 > t0)
            SELECT COUNT(*)::BIGINT AS n_converted,
                   ROUND(percentile_disc(0.5)
                         WITHIN GROUP (ORDER BY delta), 4) AS p50_s,
                   ROUND(percentile_disc(0.95)
                         WITHIN GROUP (ORDER BY delta), 4) AS p95_s
            FROM d
        """,
        "winsorize": """
            WITH c AS (
              SELECT source,
                     percentile_disc(0.05) WITHIN GROUP (ORDER BY n_chars)
                       AS lo,
                     percentile_disc(0.95) WITHIN GROUP (ORDER BY n_chars)
                       AS hi
              FROM documents GROUP BY source)
            SELECT d.doc_id, d.source, d.n_chars,
                   CAST(LEAST(GREATEST(d.n_chars, c.lo), c.hi) AS BIGINT)
                     AS clipped
            FROM documents d JOIN c USING (source)
            ORDER BY d.doc_id
        """,
        "rolling_median": """
            SELECT event_id, user_id,
                   ROUND(median(value) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                         6) AS med
            FROM events ORDER BY event_id
        """,
        "longest_streak": """
            WITH o AS (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn,
                     ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                        ORDER BY ts, event_id) AS rn_t
              FROM events),
            runs AS (SELECT user_id, event_type,
                            COUNT(*)::BIGINT AS len, MIN(rn) AS start_rn
                     FROM o GROUP BY user_id, event_type, rn - rn_t),
            r AS (SELECT user_id, event_type AS streak_value,
                         len AS streak_len,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY len DESC,
                                                     event_type,
                                                     start_rn) AS pick
                  FROM runs)
            SELECT user_id, streak_value, streak_len FROM r
            WHERE pick = 1 ORDER BY user_id
        """,
        "orc_roundtrip": """
            SELECT doc_id, text FROM documents ORDER BY doc_id
        """,
        "daily_change": """
            WITH c AS (
              SELECT event_type,
                     epoch_us(ts) // 86400000000 AS day,
                     COUNT(*)::BIGINT AS n
              FROM events GROUP BY event_type, day),
            l AS (SELECT event_type, CAST(day AS BIGINT) AS day, n,
                         LAG(n) OVER (PARTITION BY event_type
                                      ORDER BY day) AS prev_n
                  FROM c)
            SELECT event_type, day, n, prev_n,
                   ROUND((n - prev_n) / CAST(prev_n AS DOUBLE), 6)
                     AS pct_change
            FROM l ORDER BY event_type, day
        """,
        "dedup_best": """
            WITH k AS (
              SELECT doc_id, n_chars,
                     md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key
              FROM documents),
            r AS (SELECT doc_id, n_chars,
                         ROW_NUMBER() OVER (PARTITION BY content_key
                                            ORDER BY n_chars DESC, doc_id)
                           AS rn
                  FROM k)
            SELECT doc_id, n_chars FROM r WHERE rn = 1 ORDER BY doc_id
        """,
        "embedding_dim_stats": """
            WITH q AS (
              SELECT i,
                     CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                          AS BIGINT) AS v
              FROM embeddings CROSS JOIN generate_series(1, 64) t(i)),
            m AS (SELECT i, COUNT(*) AS n, SUM(v) AS sx,
                         SUM(v * v) AS sxx
                  FROM q GROUP BY i)
            SELECT CAST(i AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
                   ROUND((CAST(sx AS DOUBLE) / n) / 1000000.0, 6)
                     AS mean_v,
                   ROUND(((CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * sx / n) / (n - 1))
                         / (1000000.0 * 1000000.0), 6) AS var_v
            FROM m ORDER BY dim
        """,
        "chi_square": """
            WITH o AS (SELECT source, lang, COUNT(*)::BIGINT AS obs
                       FROM documents GROUP BY source, lang),
            grid AS (SELECT r.source, c.lang, COALESCE(o.obs, 0) AS obs
                     FROM (SELECT DISTINCT source FROM o) r
                     CROSS JOIN (SELECT DISTINCT lang FROM o) c
                     LEFT JOIN o ON o.source = r.source
                                AND o.lang = c.lang),
            r AS (SELECT source, SUM(obs) AS rt FROM grid GROUP BY source),
            c AS (SELECT lang, SUM(obs) AS ct FROM grid GROUP BY lang),
            n AS (SELECT SUM(obs) AS tot FROM grid),
            e AS (SELECT g.source, g.lang, g.obs,
                         CAST(r.rt AS DOUBLE) * c.ct / n.tot AS exp
                  FROM grid g, r, c, n
                  WHERE r.source = g.source AND c.lang = g.lang)
            SELECT source, lang, CAST(obs AS BIGINT) AS obs,
                   ROUND(exp, 6) AS expected,
                   ROUND((obs - exp) * (obs - exp) / exp, 6) AS contrib
            FROM e ORDER BY source, lang
        """,
        "json_field_stats": """
            WITH e AS (
              SELECT event_type,
                     CAST(json_extract(props, '$.k') AS BIGINT) AS v
              FROM events)
            SELECT event_type, COUNT(*)::BIGINT AS n,
                   SUM(COALESCE(v, 0))::BIGINT AS sum_v,
                   SUM(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT
                     AS n_missing,
                   ROUND(CAST(SUM(COALESCE(v, 0)) AS DOUBLE) / COUNT(*), 6)
                     AS mean_v
            FROM e GROUP BY event_type ORDER BY event_type
        """,
        "late_events": """
            SELECT event_id, user_id,
                   CASE WHEN COALESCE(
                          MAX(epoch_us(ts)) OVER (
                            PARTITION BY user_id ORDER BY event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING),
                          -4611686018427387904) - 1800000000
                        > epoch_us(ts)
                        THEN 1 ELSE 0 END AS is_late
            FROM events ORDER BY event_id
        """,
        "type_cooccurrence": """
            WITH p AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   COUNT(*)::BIGINT AS n_users
            FROM p a JOIN p b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY type_a, type_b ORDER BY type_a, type_b
        """,
        "rfm_customers": """
            SELECT o_custkey,
                   CAST(MAX(epoch_us(o_orderdate) // 86400000000)
                        AS BIGINT) AS last_day,
                   COUNT(*)::BIGINT AS n_orders,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
                     AS total_spend
            FROM orders GROUP BY o_custkey ORDER BY o_custkey
        """,
        "dup_rate_by_source": """
            WITH k AS (
              SELECT source,
                     md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key
              FROM documents)
            SELECT source, COUNT(*)::BIGINT AS n_docs,
                   COUNT(DISTINCT content_key)::BIGINT AS n_distinct,
                   ROUND(1.0 - COUNT(DISTINCT content_key) / COUNT(*), 6)
                     AS dup_ratio
            FROM k GROUP BY source ORDER BY source
        """,
        "daily_quantiles": """
            SELECT epoch_us(ts) // 86400000000 AS day,
                   round(percentile_disc(0.5)
                         WITHIN GROUP (ORDER BY value), 4) AS p50,
                   round(percentile_disc(0.95)
                         WITHIN GROUP (ORDER BY value), 4) AS p95,
                   COUNT(*)::BIGINT AS n
            FROM events GROUP BY day ORDER BY day
        """,
        "user_growth": """
            WITH f AS (
              SELECT user_id,
                     MIN(epoch_us(ts) // 86400000000) AS day
              FROM events GROUP BY user_id),
            c AS (SELECT day, COUNT(*)::BIGINT AS new_users
                  FROM f GROUP BY day)
            SELECT CAST(day AS BIGINT) AS day, new_users,
                   CAST(SUM(new_users) OVER (ORDER BY day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
            FROM c ORDER BY day
        """,
        "longest_session": """
            WITH s AS (
              SELECT event_id, user_id,
                     SUM(CASE WHEN prev IS NULL
                              OR epoch_us(ts) - epoch_us(prev)
                                 > 1800000000
                         THEN 1 ELSE 0 END)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
              FROM (SELECT event_id, user_id, ts,
                           LAG(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
                    FROM events)),
            c AS (SELECT user_id, CAST(session_id AS BIGINT)
                           AS session_id,
                         COUNT(*)::BIGINT AS n_events
                  FROM s GROUP BY user_id, session_id),
            r AS (SELECT user_id, session_id, n_events,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY n_events DESC,
                                                     session_id) AS rn
                  FROM c)
            SELECT user_id, session_id, n_events FROM r WHERE rn = 1
            ORDER BY user_id
        """,
        "global_rank": """
            SELECT doc_id, n_chars,
                   CAST(ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
                        AS BIGINT) AS rn,
                   ROUND((ROW_NUMBER() OVER (ORDER BY n_chars, doc_id)
                          - 1)
                         / (COUNT(*) OVER () - 1.0), 6) AS qnorm
            FROM documents ORDER BY doc_id
        """,
        "type_token_ratio": """
            SELECT doc_id,
                   LEN(string_split(text, ' '))::BIGINT AS n_tokens,
                   LEN(list_distinct(string_split(text, ' ')))::BIGINT
                     AS n_types,
                   ROUND(LEN(list_distinct(string_split(text, ' ')))::DOUBLE
                         / LEN(string_split(text, ' ')), 6) AS ttr
            FROM documents ORDER BY doc_id
        """,
        "vocab_by_source": """
            SELECT source, COUNT(DISTINCT token)::BIGINT AS n_distinct
            FROM (SELECT source, UNNEST(string_split(text, ' ')) AS token
                  FROM documents)
            GROUP BY source ORDER BY source
        """,
        "source_vocab_jaccard": """
            WITH p AS (
              SELECT DISTINCT source, token
              FROM (SELECT source, UNNEST(string_split(text, ' '))
                      AS token FROM documents)),
            s AS (SELECT source, COUNT(*) AS sz FROM p GROUP BY source),
            i AS (SELECT a.source AS src_a, b.source AS src_b,
                         COUNT(*) AS n_common
                  FROM p a JOIN p b
                    ON a.token = b.token AND a.source < b.source
                  GROUP BY a.source, b.source)
            SELECT i.src_a, i.src_b, i.n_common::BIGINT AS n_common,
                   ROUND(i.n_common::DOUBLE
                         / (sa.sz + sb.sz - i.n_common), 6) AS jaccard
            FROM i JOIN s sa ON sa.source = i.src_a
                   JOIN s sb ON sb.source = i.src_b
            ORDER BY src_a, src_b
        """,
        "embedding_norms": """
            SELECT vec_id,
                   ROUND(SQRT(CAST(list_sum(list_transform(embedding,
                           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                     AS BIGINT)
                                * CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                       AS BIGINT))) AS DOUBLE))
                         / 1000000.0, 6) AS l2_norm
            FROM embeddings ORDER BY vec_id
        """,
        "calendar_profile": """
            SELECT CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT)
                     AS dow,
                   CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT)
                     AS hour,
                   COUNT(*)::BIGINT AS n
            FROM events GROUP BY dow, hour ORDER BY dow, hour
        """,
        "group_summary": """
            WITH m AS (
              SELECT source, COUNT(*) AS n, SUM(n_chars) AS sx,
                     SUM(n_chars * n_chars) AS sxx,
                     MIN(n_chars) AS min_v, MAX(n_chars) AS max_v
              FROM documents GROUP BY source)
            SELECT source, n, min_v, max_v,
                   ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean_v,
                   ROUND(SQRT((CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * sx / n)
                              / (n - 1)), 6) AS sd_v
            FROM m ORDER BY source
        """,
        "weighted_mean": """
            SELECT l_returnflag,
                   ROUND((SUM(W * X)::DOUBLE / SUM(W)) / 10000.0, 6)
                     AS wavg
            FROM (SELECT l_returnflag,
                         CAST(ROUND(l_quantity * 100) AS BIGINT) AS W,
                         CAST(ROUND(l_discount * 10000) AS BIGINT) AS X
                  FROM lineitem)
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "hopping_windows": """
            WITH b AS (
              SELECT time_bucket(INTERVAL '1 hour', ts) AS w, value
              FROM events
              UNION ALL
              SELECT time_bucket(INTERVAL '1 hour', ts)
                       - INTERVAL '1 hour', value
              FROM events)
            SELECT w AS window_start, COUNT(*)::BIGINT AS n,
                   SUM(CAST(ROUND(value * 100) AS BIGINT)) / 100.0
                     AS sum_value
            FROM b GROUP BY w ORDER BY w
        """,
        "first_last": """
            WITH o AS (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn_a,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts DESC, event_id DESC)
                       AS rn_d
              FROM events)
            SELECT user_id,
                   MAX(CASE WHEN rn_a = 1 THEN event_type END) AS first_v,
                   MAX(CASE WHEN rn_d = 1 THEN event_type END) AS last_v
            FROM o GROUP BY user_id ORDER BY user_id
        """,
        "char_entropy": """
            WITH c AS (
              SELECT doc_id, ch, COUNT(*)::DOUBLE AS n
              FROM (SELECT doc_id,
                           UNNEST(regexp_extract_all(text, '[\\s\\S]'))
                             AS ch
                    FROM documents)
              GROUP BY doc_id, ch),
            t AS (SELECT doc_id, SUM(n) AS tot FROM c GROUP BY doc_id)
            SELECT c.doc_id,
                   ROUND(-SUM((c.n / t.tot) * log2(c.n / t.tot)), 6)
                     AS entropy
            FROM c JOIN t USING (doc_id)
            GROUP BY c.doc_id ORDER BY c.doc_id
        """,
        "partition_prune": """
            SELECT doc_id, n_chars FROM documents
            WHERE source = 'src3' ORDER BY doc_id
        """,
        "mad_outliers": """
            WITH med AS (
              SELECT source,
                     percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)
                       AS med
              FROM documents GROUP BY source),
            dev AS (
              SELECT d.doc_id, d.source, d.n_chars,
                     ABS(d.n_chars - m.med) AS dev
              FROM documents d JOIN med m USING (source)),
            mad AS (
              SELECT source,
                     percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)
                       AS mad
              FROM dev GROUP BY source)
            SELECT v.doc_id, v.source, v.n_chars,
                   CAST(v.dev AS BIGINT) AS dev
            FROM dev v JOIN mad m USING (source)
            WHERE v.dev > 1.5 * m.mad
            ORDER BY v.doc_id
        """,
        "distinct_users": """
            SELECT event_type,
                   COUNT(DISTINCT user_id)::BIGINT AS n_distinct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "dist_windows": """
            SELECT event_id, user_id,
                   ROUND(PERCENT_RANK() OVER (PARTITION BY user_id
                                              ORDER BY value), 6) AS pr,
                   ROUND(CUME_DIST() OVER (PARTITION BY user_id
                                           ORDER BY value), 6) AS cd
            FROM events ORDER BY event_id
        """,
        "cube_orders": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*)::BIGINT AS n,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
                     AS sum_v
            FROM orders
            GROUP BY CUBE (o_orderpriority, o_orderstatus)
            ORDER BY o_orderpriority, o_orderstatus
        """,
        "mode_event_type": """
            WITH c AS (SELECT user_id, event_type, COUNT(*) AS n
                       FROM events GROUP BY user_id, event_type),
            r AS (SELECT user_id, event_type, n,
                         ROW_NUMBER() OVER (PARTITION BY user_id
                                            ORDER BY n DESC, event_type)
                           AS rn
                  FROM c)
            SELECT user_id, event_type, n FROM r WHERE rn = 1
            ORDER BY user_id
        """,
        "bloom_semi_join": """
            WITH k AS (
              SELECT DISTINCT
                     md5(array_to_string(string_split(text, ' ')[1:8], ' '))
                       AS content_key
              FROM documents WHERE source = 'src0')
            SELECT d.doc_id FROM documents d
            JOIN k ON md5(array_to_string(string_split(d.text, ' ')[1:8],
                                          ' ')) = k.content_key
            ORDER BY d.doc_id
        """,
        "session_ids": """
            SELECT event_id, user_id,
                   CAST(SUM(CASE WHEN prev IS NULL
                                 OR epoch_us(ts) - epoch_us(prev) > 1800000000
                            THEN 1 ELSE 0 END)
                        OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS session_id
            FROM (SELECT event_id, user_id, ts,
                         LAG(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev
                  FROM events)
            ORDER BY event_id
        """,
        "event_transitions": """
            WITH o AS (
              SELECT user_id, event_type,
                     LAG(event_type) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) AS prev
              FROM events)
            SELECT prev AS from_type, event_type AS to_type,
                   COUNT(*) AS n
            FROM o WHERE prev IS NOT NULL
            GROUP BY prev, event_type ORDER BY from_type, to_type
        """,
        "value_histogram": """
            WITH m AS (SELECT MIN(value) AS mn, MAX(value) AS mx
                       FROM events),
            b AS (SELECT LEAST(CAST(FLOOR((value - mn)
                                          / ((mx - mn) / 20.0)) AS BIGINT),
                               19) AS bin
                  FROM events, m)
            SELECT bin, ROUND(mn + bin * ((mx - mn) / 20.0), 6) AS lo,
                   COUNT(*) AS n
            FROM b, m GROUP BY bin, mn, mx ORDER BY bin
        """,
        "region_customers": f"""
            SELECT r.r_name, COUNT(*) AS n_customers,
                   ROUND(AVG(c.c_acctbal), {ROUND}) AS avg_acctbal
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name ORDER BY r.r_name
        """,
        "events_daily": f"""
            SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), {ROUND}) AS sum_value
            FROM events GROUP BY day, event_type ORDER BY day, event_type
        """,
        "revenue_by_priority": f"""
            SELECT o.o_orderpriority,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), {ROUND}) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
        """,
        "distinct_event_types": """
            SELECT DISTINCT event_type FROM events ORDER BY event_type
        """,
        "orders_per_customer": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey)
            GROUP BY c_count ORDER BY custdist DESC, c_count DESC
        """,
        "customers_no_urgent": """
            SELECT c_custkey, c_mktsegment FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            ORDER BY c_custkey
        """,
        "sessionize": """
            SELECT user_id,
                   CAST(1 + COALESCE(SUM(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM (
              SELECT user_id,
                     epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts) AS gap_us
              FROM events
            ) t GROUP BY user_id ORDER BY user_id
        """,
        "rolling_window": f"""
            SELECT user_id, event_id,
                   ROUND(AVG(value) OVER w, {ROUND}) AS mavg,
                   COALESCE(LAG(value, 1) OVER w, -1.0) AS lag_value,
                   ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                          ROWS UNBOUNDED PRECEDING), {ROUND}) AS running_sum
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
            ORDER BY user_id, event_id
        """,
        "events_window": f"""
            SELECT epoch_us(ts) // 21600000000 AS win, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), {ROUND}) AS sum_value
            FROM events GROUP BY win, event_type ORDER BY win, event_type
        """,
        "filter_pushdown": f"""
            SELECT COUNT(*) AS n, ROUND(SUM(l_quantity), {ROUND}) AS sum_qty,
                   ROUND(SUM(l_extendedprice), {ROUND}) AS sum_price
            FROM lineitem WHERE l_discount >= 0.05
        """,
        "mktsegment": f"""
            SELECT c_mktsegment, COUNT(*) AS n,
                   ROUND(AVG(c_acctbal), {ROUND}) AS avg_acctbal
            FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment
        """,
        "part_types": f"""
            SELECT p_type, COUNT(*) AS n,
                   ROUND(MIN(p_retailprice), {ROUND}) AS min_price,
                   ROUND(MAX(p_retailprice), {ROUND}) AS max_price
            FROM part GROUP BY p_type ORDER BY p_type
        """,
        "supplier_nation": """
            SELECT n.n_name, COUNT(*) AS n_suppliers
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            GROUP BY n.n_name ORDER BY n.n_name
        """,
        "dedup_exact": """
            SELECT MIN(doc_id) AS doc_id FROM documents
            GROUP BY md5(text) ORDER BY doc_id
        """,
        "url_traps": r"""
            WITH urls AS (
              SELECT 'http://' || source || '.test/'
                       || repeat('s/', doc_id % 8)
                       || CASE WHEN doc_id % 3 = 0
                               THEN '?p=' || CAST(doc_id % 20 AS VARCHAR)
                               ELSE '' END AS url
              FROM documents),
            p AS (
              SELECT regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS host,
                     length(regexp_replace(url, '[^/]', '', 'g')) - 2 AS depth,
                     CASE WHEN url LIKE '%?%' THEN 1 ELSE 0 END AS q,
                     length(url) AS ulen
              FROM urls)
            SELECT host, COUNT(*)::BIGINT AS n_urls,
                   MAX(depth)::BIGINT AS max_depth,
                   ROUND(SUM(depth)::DOUBLE / COUNT(*), 4) AS mean_depth,
                   ROUND(SUM(q)::DOUBLE / COUNT(*), 4) AS query_ratio,
                   ROUND(SUM(ulen)::DOUBLE / COUNT(*), 4) AS mean_len,
                   (ROUND(SUM(q)::DOUBLE / COUNT(*), 4) > 0.4
                    OR MAX(depth) >= 7) AS trap
            FROM p GROUP BY host ORDER BY host
        """,
        "rank_windows": """
            SELECT user_id, event_id,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY value, event_id) AS rn,
                   rank() OVER (PARTITION BY user_id ORDER BY value) AS rnk,
                   dense_rank() OVER (PARTITION BY user_id
                                      ORDER BY value) AS drnk,
                   ntile(4) OVER (PARTITION BY user_id
                                  ORDER BY value, event_id) AS tile
            FROM events ORDER BY user_id, rn
        """,
        "rollup_orders": """
            SELECT o_orderpriority, o_orderstatus,
                   COUNT(*)::BIGINT AS n,
                   SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0
                     AS sum_v
            FROM orders
            GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
            ORDER BY o_orderpriority, o_orderstatus
        """,
        "funnel": """
            WITH m AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                     min(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                     min(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
              FROM events GROUP BY user_id)
            SELECT * FROM (
              SELECT 0::BIGINT AS step_idx, 'view' AS step,
                     COUNT(t0)::BIGINT AS n_users FROM m
              UNION ALL
              SELECT 1::BIGINT, 'click',
                     COUNT(CASE WHEN t1 > t0 THEN 1 END)::BIGINT FROM m
              UNION ALL
              SELECT 2::BIGINT, 'purchase',
                     COUNT(CASE WHEN t2 > t1 AND t1 > t0 THEN 1 END)::BIGINT
              FROM m)
            ORDER BY step_idx
        """,
        "retention": """
            WITH d AS (
              SELECT DISTINCT user_id, date_trunc('day', ts) AS day
              FROM events),
            c AS (SELECT user_id, MIN(day) AS cohort_day
                  FROM d GROUP BY user_id)
            SELECT c.cohort_day,
                   CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT)
                     AS day_offset,
                   COUNT(*)::BIGINT AS n_users
            FROM d JOIN c USING (user_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "events_resample": """
            WITH a AS (
              SELECT make_timestamp((epoch_us(ts) // 21600000000)
                                    * 21600000000) AS bucket,
                     COUNT(*)::BIGINT AS n_events,
                     SUM(CAST(ROUND(value * 1000000) AS BIGINT)) / 1000000.0
                       AS sum_value
              FROM events GROUP BY 1),
            r AS (
              SELECT unnest(generate_series(mn, mx, INTERVAL '6 hours'))
                       AS bucket
              FROM (SELECT MIN(bucket) AS mn, MAX(bucket) AS mx FROM a))
            SELECT r.bucket, COALESCE(a.n_events, 0)::BIGINT AS n_events,
                   a.sum_value
            FROM r LEFT JOIN a USING (bucket) ORDER BY r.bucket
        """,
        "unpivot_events": """
            WITH p AS (
              SELECT user_id,
                     CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                     CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                     CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                     CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                     CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
              FROM events GROUP BY user_id)
            SELECT user_id, et AS event_type, n FROM (
              SELECT user_id, 'click' AS et, n_click AS n FROM p
              UNION ALL SELECT user_id, 'view', n_view FROM p
              UNION ALL SELECT user_id, 'purchase', n_purchase FROM p
              UNION ALL SELECT user_id, 'signup', n_signup FROM p
              UNION ALL SELECT user_id, 'error', n_error FROM p)
            ORDER BY user_id, event_type
        """,
        "url_templates": r"""
            WITH urls AS (
              SELECT 'http://' || source || '.test/'
                       || repeat('s/', doc_id % 8)
                       || CASE WHEN doc_id % 3 = 0
                               THEN '?p=' || CAST(doc_id % 20 AS VARCHAR)
                               ELSE '' END AS url
              FROM documents),
            t AS (
              SELECT regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)', 1) AS host,
                     regexp_replace(url, '[0-9]+', '<n>', 'g') AS template,
                     url
              FROM urls)
            SELECT host, template, COUNT(*)::BIGINT AS n_urls,
                   MIN(url) AS sample_url
            FROM t GROUP BY host, template ORDER BY host, template
        """,
        "script_mix": r"""
            WITH m AS (
              SELECT doc_id, length(text) AS n,
                     length(regexp_replace(text, '[^\p{Latin}]', '', 'g')) AS l,
                     length(regexp_replace(text, '[^0-9]', '', 'g')) AS d,
                     length(regexp_replace(text, '[^\s]', '', 'g')) AS s
              FROM documents)
            SELECT doc_id, n::BIGINT AS n_chars,
                   CASE WHEN n > 0 THEN ROUND(l::DOUBLE / n, 6) END AS latin_ratio,
                   CASE WHEN n > 0 THEN ROUND(d::DOUBLE / n, 6) END AS digit_ratio,
                   CASE WHEN n > 0 THEN ROUND(s::DOUBLE / n, 6) END AS space_ratio,
                   CASE WHEN n > 0 THEN ROUND((n - l - d - s)::DOUBLE / n, 6) END
                     AS other_ratio
            FROM m ORDER BY doc_id
        """,
        "group_sample": r"""
            SELECT source, doc_id FROM (
              SELECT source, doc_id,
                     row_number() OVER (
                       PARTITION BY source
                       ORDER BY md5('gs1|' || CAST(doc_id AS VARCHAR)), doc_id)
                       AS rn
              FROM documents)
            WHERE rn <= 5 ORDER BY source, doc_id
        """,
        "url_dedup": r"""
            WITH urls AS (
              SELECT doc_id,
                     'HTTP://' || UPPER(source) || '.TEST:80/Doc/'
                       || CAST(doc_id % 50 AS VARCHAR)
                       || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
                       || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
              FROM documents)
            SELECT lower(regexp_replace(regexp_replace(regexp_replace(
                       url, '#.*$', ''), ':(80|443)(/|$)', '\2', 'g'), '/+$', ''))
                     AS canonical_url,
                   MIN(doc_id) AS doc_id
            FROM urls GROUP BY canonical_url ORDER BY canonical_url
        """,
        "span_removal": r"""
            WITH messy AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com for details' AS t
              FROM documents)
            SELECT doc_id,
                   regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '', 'g')
                     AS text
            FROM messy ORDER BY doc_id
        """,
        "pii_scrub": r"""
            WITH messy AS (
              SELECT doc_id,
                     text || ' contact user' || CAST(doc_id AS VARCHAR)
                       || '@example.com or +1 (555) 010-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                       || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                       || '.' || CAST(doc_id % 100 AS VARCHAR) AS t
              FROM documents)
            SELECT doc_id,
                   regexp_replace(regexp_replace(regexp_replace(t,
                     '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                     '\+?\d[\d() -]{7,}\d', '<PHONE>', 'g'),
                     '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS scrubbed
            FROM messy ORDER BY doc_id
        """,
        "normalize_text": r"""
            WITH messy AS (
              SELECT doc_id,
                     replace(replace(text, 'a', 'a' || chr(769)),
                             ' ', chr(9) || ' ' || chr(9)) AS t
              FROM documents)
            SELECT doc_id,
                   trim(regexp_replace(nfc_normalize(t), '\s+', ' ', 'g')) AS normalized
            FROM messy ORDER BY doc_id
        """,
        "gopher_rules": rf"""
            WITH docs AS (
              SELECT doc_id, coalesce(text, '') AS text,
                     regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS toks,
                     str_split(coalesce(text, ''), chr(10)) AS lines
              FROM documents),
            s AS (
              SELECT doc_id, len(toks) AS n_words,
                ROUND(list_aggregate(list_transform(toks, w -> len(w)), 'sum')::DOUBLE
                      / greatest(len(toks), 1), {ROUND}) AS mean_word_len,
                ROUND(((len(text) - len(replace(text, '#', '')))
                     + (len(text) - len(replace(text, '…', '')))
                     + (len(text) - len(replace(text, '...', ''))) / 3)::DOUBLE
                      / greatest(len(toks), 1), {ROUND}) AS symbol_ratio,
                ROUND(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))::DOUBLE
                      / greatest(len(toks), 1), {ROUND}) AS alpha_word_frac,
                (list_contains(toks, 'the')::INT + list_contains(toks, 'be')::INT
                 + list_contains(toks, 'to')::INT + list_contains(toks, 'of')::INT
                 + list_contains(toks, 'and')::INT + list_contains(toks, 'that')::INT
                 + list_contains(toks, 'have')::INT + list_contains(toks, 'with')::INT
                )::BIGINT AS n_required_stops,
                ROUND(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))::DOUBLE
                      / greatest(len(lines), 1), {ROUND}) AS bullet_line_frac,
                ROUND(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))::DOUBLE
                      / greatest(len(lines), 1), {ROUND}) AS ellipsis_line_frac
              FROM docs)
            SELECT *,
                   (n_words BETWEEN 50 AND 100000
                    AND mean_word_len BETWEEN 3.0 AND 10.0
                    AND symbol_ratio <= 0.1 AND alpha_word_frac >= 0.8
                    AND n_required_stops >= 2 AND bullet_line_frac <= 0.9
                    AND ellipsis_line_frac <= 0.3) AS keep
            FROM s ORDER BY doc_id
        """,
        "snapshot_diff": """
            WITH old AS (
              SELECT 'http://c.test/' || doc_id AS url,
                     md5(coalesce(text, '')) AS fp FROM documents),
            new AS (
              SELECT 'http://c.test/' || doc_id AS url,
                     md5(coalesce(text, '') ||
                         CASE WHEN doc_id % 5 = 0 THEN '!' ELSE '' END) AS fp
              FROM documents WHERE doc_id % 7 <> 0
              UNION ALL
              SELECT 'http://c.test/added/' || doc_id, md5('new:' || doc_id)
              FROM documents WHERE doc_id % 11 = 0)
            SELECT COALESCE(o.url, n.url) AS url,
                   CASE WHEN n.url IS NULL THEN 'removed'
                        WHEN o.url IS NULL THEN 'added'
                        WHEN o.fp = n.fp THEN 'unchanged'
                        ELSE 'changed' END AS status
            FROM old o FULL JOIN new n ON o.url = n.url
            ORDER BY url
        """,
        "inverted_search": r"""
            SELECT doc_id, count(*)::BIGINT AS n_matches FROM (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS tok
              FROM documents)
            WHERE tok IN ('join', 'scan', 'window')
            GROUP BY doc_id HAVING count(DISTINCT tok) = 3
            ORDER BY doc_id
        """,
        "index_lookup": r"""
            SELECT tok AS token, count(DISTINCT doc_id)::BIGINT AS df,
                   array_to_string(list_sort(list(DISTINCT doc_id)), ',') AS postings_str
            FROM (
              SELECT doc_id,
                     unnest(regexp_split_to_array(trim(coalesce(text, '')), '\s+')) AS tok
              FROM documents)
            WHERE tok IN ('hash', 'scan', 'the')
            GROUP BY tok ORDER BY token
        """,
        "repetition": r"""
            WITH docs AS (SELECT doc_id, text,
                                 regexp_split_to_array(trim(text), '\s+') AS toks
                          FROM documents),
            ucnt AS (SELECT doc_id, tok, count(*) c FROM
                       (SELECT doc_id, unnest(toks) AS tok FROM docs) GROUP BY 1, 2),
            utop AS (SELECT doc_id, max(c) mx, sum(c) tot FROM ucnt GROUP BY 1),
            bcnt AS (SELECT doc_id, bg, count(*) c FROM
                       (SELECT doc_id,
                               unnest(list_transform(range(1, len(toks)),
                                      i -> toks[i] || ' ' || toks[i + 1])) AS bg
                        FROM docs) GROUP BY 1, 2),
            btop AS (SELECT doc_id, max(c) mx, sum(c) tot FROM bcnt GROUP BY 1)
            SELECT d.doc_id,
                   round(utop.mx::DOUBLE / utop.tot, 6) AS top_unigram_frac,
                   round(coalesce(btop.mx::DOUBLE / btop.tot, 0), 6) AS top_bigram_frac,
                   round(1.0 - len(list_distinct(str_split(d.text, chr(10))))::DOUBLE
                           / len(str_split(d.text, chr(10))), 6) AS dup_line_frac
            FROM docs d JOIN utop USING (doc_id) LEFT JOIN btop USING (doc_id)
            ORDER BY d.doc_id
        """,
        "value_quantiles": """
            SELECT user_id,
                   round(percentile_disc(0.5) WITHIN GROUP (ORDER BY value), 4) AS p50,
                   round(percentile_disc(0.95) WITHIN GROUP (ORDER BY value), 4) AS p95,
                   count(*) AS n
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "pivot_events": """
            SELECT user_id,
                   CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
                   CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
                   CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
                   CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
            FROM events GROUP BY user_id ORDER BY user_id
        """,
        "top_per_group": """
            SELECT event_id, user_id, value FROM (
              SELECT event_id, user_id, value,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY value DESC, event_id) AS rn
              FROM events) t
            WHERE rn <= 3
            ORDER BY user_id, value DESC, event_id
        """,
        "range_join": """
            WITH bands(lo, hi, band) AS (VALUES
              (0.0, 25.0, 'tiny'), (25.0, 75.0, 'low'),
              (75.0, 150.0, 'mid'), (150.0, 190.0, 'high'))
            SELECT e.event_id, e.value, b.band
            FROM events e LEFT JOIN bands b
              ON e.value >= b.lo AND e.value < b.hi
            ORDER BY e.event_id
        """,
        "asof_join": """
            WITH r AS (SELECT o_custkey AS user_id,
                              epoch_us(o_orderdate) AS rt_us,
                              count(*) AS n_orders,
                              max(o_orderkey) AS max_orderkey,
                              round(sum(o_totalprice), 4) AS sum_price
                       FROM orders GROUP BY 1, 2),
            e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events)
            SELECT e.event_id, e.user_id, e.t_us,
                   r.rt_us AS order_ts_us, r.n_orders, r.max_orderkey, r.sum_price
            FROM e ASOF LEFT JOIN r
              ON e.user_id = r.user_id AND e.t_us >= r.rt_us
            ORDER BY e.event_id
        """,
        "paragraph_dedup": r"""
            WITH n AS (SELECT count(*) c FROM documents),
            multi AS (
              SELECT a.doc_id, a.text || chr(10) || b.text AS text
              FROM documents a
              JOIN documents b ON b.doc_id = (a.doc_id + 1) % (SELECT c FROM n)),
            paras AS (
              SELECT doc_id,
                     unnest(str_split(text, chr(10))) AS para,
                     unnest(range(1, len(str_split(text, chr(10))) + 1)) AS idx
              FROM multi),
            firsts AS (SELECT para, min(doc_id * 1000000 + idx) AS k
                       FROM paras GROUP BY para)
            SELECT p.doc_id,
                   string_agg(p.para, chr(10) ORDER BY p.idx) AS text_deduped
            FROM paras p
            JOIN firsts f ON p.para = f.para AND p.doc_id * 1000000 + p.idx = f.k
            GROUP BY p.doc_id ORDER BY p.doc_id
        """,
        "heavy_hitters": """
            SELECT l_partkey, count(*) AS c FROM lineitem
            GROUP BY l_partkey ORDER BY c DESC, l_partkey LIMIT 20
        """,
        "incremental_dedup": """
            SELECT doc_id, source FROM documents
            WHERE md5(text) NOT IN
              (SELECT md5(text) FROM documents WHERE doc_id % 4 = 0)
            ORDER BY doc_id
        """,
        "substr_dedup": r"""
            WITH donor AS (
              SELECT array_to_string(
                       (regexp_split_to_array(trim(text), '\s+'))[1:12], ' ') AS d
              FROM documents
              WHERE doc_id = (SELECT min(doc_id) FROM documents)
            ),
            docs AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(
                       CASE WHEN doc_id % 5 = 0
                            THEN text || ' ' || (SELECT d FROM donor)
                            ELSE text END), '\s+') AS toks
              FROM documents
            ),
            w AS (SELECT doc_id, i, array_to_string(toks[i:i+9], ' ') AS ng
                  FROM docs, LATERAL unnest(range(1, len(toks) - 8)) t(i)),
            dup AS (SELECT ng FROM w GROUP BY ng HAVING count(*) >= 2),
            hits AS (SELECT doc_id, i FROM w WHERE ng IN (SELECT ng FROM dup)),
            cov AS (SELECT DISTINCT doc_id, j
                    FROM hits, LATERAL unnest(range(i, i + 10)) t(j)),
            tok AS (SELECT doc_id, j, toks[j] AS tk
                    FROM docs, LATERAL unnest(range(1, len(toks) + 1)) t(j)),
            kept AS (SELECT t.doc_id, t.j, t.tk
                     FROM tok t LEFT JOIN cov c
                       ON t.doc_id = c.doc_id AND t.j = c.j
                     WHERE c.doc_id IS NULL)
            SELECT d.doc_id,
                   coalesce(string_agg(k.tk, ' ' ORDER BY k.j), '') AS text_deduped,
                   len(any_value(d.toks)) - count(k.tk) AS n_removed
            FROM docs d LEFT JOIN kept k USING (doc_id)
            GROUP BY d.doc_id ORDER BY d.doc_id
        """,
        "heavy_hitters_by_group": """
            WITH c AS (SELECT event_type, user_id, count(*) AS c
                       FROM events GROUP BY event_type, user_id),
            r AS (SELECT *, row_number() OVER
                    (PARTITION BY event_type ORDER BY c DESC, user_id) AS rnk
                  FROM c)
            SELECT event_type, user_id, c, rnk FROM r
            WHERE rnk <= 3 ORDER BY event_type, rnk
        """,
        "top_ngrams": r"""
            WITH docs AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
                          FROM documents),
            bg AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                          unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
                   FROM docs)
            SELECT w1, w2, count(*) AS c FROM bg GROUP BY w1, w2
            ORDER BY c DESC, w1, w2 LIMIT 20
        """,
        "collocations": r"""
            WITH docs AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
                          FROM documents),
            uni AS (SELECT w, count(*) c FROM
                      (SELECT unnest(toks) AS w FROM docs) GROUP BY w),
            bg AS (SELECT unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                          unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
                   FROM docs),
            bi AS (SELECT w1, w2, count(*) c FROM bg GROUP BY w1, w2
                   HAVING count(*) >= 5),
            t AS (SELECT (SELECT sum(c) FROM uni) AS t1,
                         (SELECT sum(c) FROM bi0) AS t2),
            bi0 AS (SELECT w1, w2, count(*) c FROM bg GROUP BY w1, w2)
            SELECT b.w1, b.w2, b.c,
                   round(ln((b.c / t.t2) / ((u1.c / t.t1) * (u2.c / t.t1))), 6)
                     AS pmi
            FROM bi b JOIN uni u1 ON b.w1 = u1.w
                      JOIN uni u2 ON b.w2 = u2.w, t
            ORDER BY pmi DESC, b.w1, b.w2 LIMIT 20
        """,
        "hash_sample": _SAMPLING_SQLS()["hash_sample"],
        "stratified_sample": _SAMPLING_SQLS()["stratified_sample"],
        "mix_corpus": _SAMPLING_SQLS()["mix_corpus"],
        "shuffle_det": _SAMPLING_SQLS()["shuffle_det"],
        "leakage_split": _SAMPLING_SQLS()["leakage_split"],
        "weighted_sample": _SAMPLING_SQLS()["weighted_sample"],
        "warc_roundtrip": """
            SELECT doc_id, text FROM documents ORDER BY doc_id
        """,
        "jsonl_roundtrip": """
            SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id
        """,
        "jsonl_gz_roundtrip": """
            SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id
        """,
        "csv_roundtrip": """
            SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id
        """,
        "ipc_roundtrip": """
            SELECT doc_id, text, lang, source FROM documents ORDER BY doc_id
        """,
        "readability": r"""
            WITH c AS (
              SELECT doc_id,
                     GREATEST(len(regexp_extract_all(text, '\S+')), 1) AS words,
                     GREATEST(len(regexp_extract_all(text, '[.!?]')), 1) AS sents,
                     GREATEST(len(regexp_extract_all(text, '[aeiouyAEIOUY]+')), 1)
                       AS syll
              FROM documents)
            SELECT doc_id, words AS n_words, sents AS n_sentences,
                   syll AS n_syllables,
                   ROUND(206.835 - 1.015 * (words / sents)
                                 - 84.6 * (syll / words), 4) AS flesch
            FROM c ORDER BY doc_id
        """,
        "revisit_stats": """
            WITH o AS (
              SELECT user_id, ts, event_type,
                     lag(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events)
            SELECT user_id, COUNT(*) AS n_obs,
                   CAST(COALESCE(SUM(CASE WHEN prev IS NOT NULL
                                      AND event_type <> prev
                                     THEN 1 ELSE 0 END), 0) AS BIGINT)
                     AS n_changes,
                   CASE WHEN COUNT(*) > 1 THEN
                     ROUND(SUM(CASE WHEN prev IS NOT NULL
                                     AND event_type <> prev
                                    THEN 1 ELSE 0 END) / (COUNT(*) - 1.0), 6)
                   END AS change_rate,
                   CASE WHEN COUNT(*) > 1 THEN
                     ROUND(((epoch_us(MAX(ts)) - epoch_us(MIN(ts)))
                            / (COUNT(*) - 1.0)) / 1000000.0, 6)
                   END AS mean_gap_s
            FROM o GROUP BY user_id ORDER BY user_id
        """,
        "export_roundtrip": """
            SELECT doc_id, text, source FROM documents ORDER BY doc_id
        """,
        "sitemap_parse": """
            SELECT 'http://' || source || '.test/doc/' || doc_id AS url,
                   '2026-01-' || lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0')
                     AS lastmod
            FROM documents ORDER BY url
        """,
        "decontaminate": r"""
            WITH bench AS (SELECT regexp_split_to_array(trim(text), '\s+') AS toks
                           FROM documents WHERE doc_id % 5 = 0),
            bng AS (SELECT DISTINCT array_to_string(toks[i:i+7], ' ') AS ng
                    FROM bench, LATERAL unnest(range(1, len(toks) - 6)) t(i)),
            docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                     FROM documents WHERE doc_id % 5 <> 0),
            dng AS (SELECT doc_id, array_to_string(toks[i:i+7], ' ') AS ng
                    FROM docs, LATERAL unnest(range(1, len(toks) - 6)) t(i)),
            hits AS (SELECT doc_id, count(*) AS c FROM dng
                     WHERE ng IN (SELECT ng FROM bng) GROUP BY doc_id)
            SELECT d.doc_id, coalesce(h.c, 0) AS n_hits,
                   CAST(coalesce(h.c, 0) > 0 AS BIGINT) AS contaminated
            FROM docs d LEFT JOIN hits h USING (doc_id)
            ORDER BY d.doc_id
        """,
        "tfidf_topk": r"""
            WITH docs AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
                          FROM documents),
            n AS (SELECT count(*) AS n_docs FROM docs),
            pairs AS (SELECT doc_id, unnest(toks) AS term FROM docs),
            tf AS (SELECT doc_id, term, count(*) AS tf FROM pairs GROUP BY doc_id, term),
            df AS (SELECT term, count(DISTINCT doc_id) AS df FROM pairs GROUP BY term),
            scored AS (SELECT t.doc_id, t.term,
                              round(t.tf * ln(n.n_docs / d.df), 4) AS score
                       FROM tf t JOIN df d USING (term), n),
            ranked AS (SELECT *, row_number() OVER
                         (PARTITION BY doc_id ORDER BY score DESC, term) AS rnk
                       FROM scored)
            SELECT doc_id, term, score, rnk FROM ranked
            WHERE rnk <= 3 ORDER BY doc_id, rnk
        """,
        "perplexity": r"""
            WITH docs AS (SELECT doc_id,
                                 regexp_split_to_array(trim(text), '\s+') AS toks
                          FROM documents),
            c1 AS (SELECT w, count(*) c FROM
                     (SELECT unnest(toks) AS w FROM docs) GROUP BY w),
            v AS (SELECT count(*) n FROM c1),
            bg AS (SELECT doc_id,
                          unnest(list_transform(range(1, len(toks)), i -> toks[i])) AS w1,
                          unnest(list_transform(range(1, len(toks)), i -> toks[i + 1])) AS w2
                   FROM docs),
            c12 AS (SELECT w1, w2, count(*) c FROM bg GROUP BY w1, w2),
            scored AS (SELECT bg.doc_id,
                              ln((c12.c + 1.0) / (c1.c + (SELECT n FROM v))) AS lp
                       FROM bg JOIN c12 ON bg.w1 = c12.w1 AND bg.w2 = c12.w2
                               JOIN c1 ON bg.w1 = c1.w)
            SELECT doc_id, count(*) AS n_bigrams,
                   round(avg(lp), 6) AS avg_logprob,
                   round(exp(-avg(lp)), 4) AS ppl
            FROM scored GROUP BY doc_id ORDER BY doc_id
        """,
        "chunk_docs": r"""
            WITH docs AS (SELECT doc_id,
                                 regexp_split_to_array(trim(text), '\s+') AS toks
                          FROM documents),
            ck AS (SELECT doc_id, toks,
                     unnest(range(0, CASE WHEN len(toks) <= 16 THEN 1
                                          ELSE CAST(ceil((len(toks) - 16) / 12.0) AS BIGINT) + 1
                                     END)) AS chunk_id
                   FROM docs)
            SELECT doc_id, chunk_id,
                   array_to_string(toks[chunk_id * 12 + 1 : chunk_id * 12 + 16], ' ') AS chunk_text,
                   len(toks[chunk_id * 12 + 1 : chunk_id * 12 + 16]) AS n_tokens
            FROM ck ORDER BY doc_id, chunk_id
        """,
        "pack_sequences": r"""
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text) || ' <eod>', '\s+') AS tk
              FROM documents),
            cnt AS (SELECT doc_id, tk, len(tk) AS n FROM toks),
            offs AS (
              SELECT doc_id, tk, n,
                     CAST(COALESCE(SUM(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                          AS BIGINT) AS s
              FROM cnt),
            wins AS (
              SELECT doc_id, tk, n, s,
                     unnest(range(s // 16, ((s + n - 1) // 16) + 1)) AS seq_id
              FROM offs),
            parts AS (
              SELECT seq_id, doc_id,
                     tk[GREATEST(seq_id * 16 - s, 0) + 1 :
                        LEAST((seq_id + 1) * 16 - s, n)] AS piece
              FROM wins)
            SELECT seq_id,
                   string_agg(array_to_string(piece, ' '), ' ' ORDER BY doc_id) AS text,
                   CAST(SUM(len(piece)) AS BIGINT) AS n_tokens
            FROM parts GROUP BY seq_id ORDER BY seq_id
        """,
        "token_stats": """
            SELECT doc_id, LENGTH(text) AS n_chars,
                   LEN(regexp_split_to_array(TRIM(text), '\\s+')) AS n_tokens
            FROM documents ORDER BY doc_id
        """,
        "punct_ratio": """
            SELECT doc_id,
                   ROUND(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         / GREATEST(LENGTH(text), 1.0), 6) AS punct_ratio,
                   ROUND(LENGTH(regexp_replace(text, '[^0-9]', '', 'g'))
                         / GREATEST(LENGTH(text), 1.0), 6) AS digit_ratio
            FROM documents ORDER BY doc_id
        """,
        "sim_topk": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id < 8)
            SELECT query_id, neighbor_id, rank FROM (
              SELECT q.qid AS query_id, e.vec_id AS neighbor_id,
                     CAST(row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY list_cosine_similarity(q.qe, e.embedding::DOUBLE[]) DESC, e.vec_id
                     ) AS INTEGER) AS rank
              FROM q, embeddings e WHERE e.vec_id <> q.qid
            ) WHERE rank <= 5 ORDER BY query_id, rank
        """,
        "component_sizes": """
            SELECT (doc_id // 20) * 20 AS root, COUNT(*)::BIGINT AS size
            FROM documents GROUP BY 1 ORDER BY 1
        """,
        "weighted_median": """
            WITH c AS (SELECT l_returnflag, l_quantity AS v,
                              SUM(l_linenumber)::BIGINT AS w
                       FROM lineitem GROUP BY 1, 2),
            r AS (SELECT l_returnflag, v,
                         SUM(w) OVER (PARTITION BY l_returnflag
                                      ORDER BY v) AS cum,
                         SUM(w) OVER (PARTITION BY l_returnflag) AS tot
                  FROM c)
            SELECT l_returnflag, MIN(v) AS wmedian
            FROM r WHERE 2 * cum >= tot
            GROUP BY l_returnflag ORDER BY l_returnflag
        """,
        "last_touch": """
            WITH o AS (SELECT user_id, event_type,
                              LAG(event_type) OVER (
                                PARTITION BY user_id
                                ORDER BY ts, event_id) AS prev_type
                       FROM events)
            SELECT prev_type, COUNT(*)::BIGINT AS n
            FROM o WHERE event_type = 'purchase'
                    AND prev_type IS NOT NULL
            GROUP BY prev_type ORDER BY prev_type
        """,
        "cheapest_supplier": """
            WITH r AS (SELECT l_partkey, l_suppkey, l_extendedprice,
                              ROW_NUMBER() OVER (
                                PARTITION BY l_partkey
                                ORDER BY l_extendedprice, l_suppkey
                              ) AS rn
                       FROM lineitem)
            SELECT r.l_partkey, r.l_suppkey AS s_suppkey,
                   r.l_extendedprice AS min_price, s.s_name
            FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE rn = 1 ORDER BY l_partkey
        """,
        "revenue_share": """
            WITH g AS (
              SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                       AS r
              FROM lineitem GROUP BY 1)
            SELECT ship_month, ROUND(r / 10000.0, 2) AS revenue,
                   ROUND(r / SUM(r) OVER (), 6) AS share
            FROM g ORDER BY ship_month
        """,
        "tpch_q14": """
            WITH j AS (
              SELECT (p.p_type = 'PROMO') AS is_promo,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) AS r
              FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
              WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
                AND l.l_shipdate <  TIMESTAMP '1997-01-01')
            SELECT ROUND(100.0 * SUM(CASE WHEN is_promo THEN r
                                          ELSE 0 END)::DOUBLE
                         / SUM(r)::DOUBLE, 6) AS promo_revenue
            FROM j
        """,
        "tpch_q10": """
            WITH rev AS (
              SELECT o.o_custkey AS c_custkey,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                       AS r
              FROM lineitem l
              JOIN orders o ON o.o_orderkey = l.l_orderkey
              WHERE l.l_returnflag = 'R'
                AND o.o_orderdate >= TIMESTAMP '1996-01-01'
                AND o.o_orderdate <  TIMESTAMP '1997-01-01'
              GROUP BY 1),
            t AS (SELECT c_custkey, ROUND(r / 10000.0, 2) AS revenue
                  FROM rev ORDER BY revenue DESC, c_custkey LIMIT 20)
            SELECT c.c_custkey, c.c_name, t.revenue
            FROM t JOIN customer c USING (c_custkey)
            ORDER BY t.revenue DESC, c.c_custkey
        """,
        "tpch_q6": """
            SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * CAST(ROUND(l_discount * 100) AS BIGINT))
                         / 10000.0, 2) AS revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "nation_revenue_share": """
            WITH g AS (
              SELECT n.n_name,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                       AS r
              FROM lineitem l
              JOIN supplier s ON s.s_suppkey = l.l_suppkey
              JOIN nation n ON n.n_nationkey = s.s_nationkey
              GROUP BY 1)
            SELECT n_name, ROUND(r / 10000.0, 2) AS revenue,
                   ROUND(r / SUM(r) OVER (), 6) AS share
            FROM g ORDER BY n_name
        """,
        "tpch_q17": """
            WITH a AS (SELECT l_partkey, 0.2 * AVG(l_quantity) AS thr
                       FROM lineitem GROUP BY 1)
            SELECT ROUND((SUM(CAST(ROUND(l_extendedprice * 100)
                                   AS BIGINT)) / 100.0) / 7.0, 2)
                     AS avg_yearly
            FROM lineitem l JOIN a USING (l_partkey)
            WHERE l.l_quantity < a.thr
        """,
        "tpch_q15": """
            WITH r AS (
              SELECT l_suppkey,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l_discount) * 100) AS BIGINT))
                       AS tot
              FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                AND l_shipdate <  TIMESTAMP '1996-04-01'
              GROUP BY 1)
            SELECT s.s_suppkey, s.s_name,
                   ROUND(tot / 10000.0, 2) AS total_rev
            FROM r JOIN supplier s ON s.s_suppkey = r.l_suppkey
            WHERE tot = (SELECT MAX(tot) FROM r)
            ORDER BY s.s_suppkey
        """,
        "label_centroids": """
            WITH q AS (
              SELECT label, i AS dim,
                     CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000)
                          AS BIGINT) AS v
              FROM embeddings CROSS JOIN generate_series(1, 64) t(i))
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(dim AS BIGINT) AS dim,
                   COUNT(*)::BIGINT AS n,
                   ROUND((CAST(SUM(v) AS DOUBLE) / COUNT(*))
                         / 1000000.0, 6) AS centroid
            FROM q GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "knn_classify": """
            WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
                       FROM embeddings WHERE vec_id < 8),
            nn AS (
              SELECT qid, neighbor_id FROM (
                SELECT q.qid, e.vec_id AS neighbor_id,
                       row_number() OVER (
                         PARTITION BY q.qid
                         ORDER BY list_cosine_similarity(
                           q.qe, e.embedding::DOUBLE[]) DESC, e.vec_id
                       ) AS rank
                FROM q, embeddings e WHERE e.vec_id <> q.qid)
              WHERE rank <= 5),
            v AS (SELECT qid, l.label, COUNT(*) AS c
                  FROM nn JOIN embeddings l ON l.vec_id = nn.neighbor_id
                  GROUP BY 1, 2)
            SELECT qid AS query_id, CAST(label AS BIGINT) AS pred_label
            FROM (SELECT qid, label,
                         ROW_NUMBER() OVER (PARTITION BY qid
                                            ORDER BY c DESC, label) AS rn
                  FROM v)
            WHERE rn = 1 ORDER BY query_id
        """,
        "tpch_q13": """
            WITH co AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
                        FROM customer LEFT OUTER JOIN orders
                          ON c_custkey = o_custkey
                          AND o_orderpriority <> '1-URGENT'
                        GROUP BY c_custkey)
            SELECT CAST(c_count AS BIGINT) AS c_count,
                   COUNT(*)::BIGINT AS custdist
            FROM co GROUP BY c_count
            ORDER BY custdist DESC, c_count DESC
        """,
        "tpch_q22": """
            WITH s AS (SELECT CAST(SUM(CAST(ROUND(c_acctbal * 100)
                                            AS BIGINT)) AS BIGINT) AS sc,
                              COUNT(*)::BIGINT AS n
                       FROM customer WHERE c_acctbal > 0.0)
            SELECT n_name AS nation, COUNT(*)::BIGINT AS numcust,
                   ROUND(SUM(c_acctbal), 2) AS totacctbal
            FROM customer c JOIN nation n ON c_nationkey = n_nationkey
            WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT)
                    * (SELECT n FROM s) > (SELECT sc FROM s)
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey
                                AND o.o_orderpriority = '1-URGENT')
            GROUP BY nation ORDER BY nation
        """,
        "tpch_q12": """
            SELECT o_orderpriority,
                   CAST(SUM(CASE WHEN l_shipdate > o_orderdate
                                      + INTERVAL 60 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS late_count,
                   CAST(SUM(CASE WHEN l_shipdate <= o_orderdate
                                      + INTERVAL 60 DAY
                                 THEN 1 ELSE 0 END) AS BIGINT)
                     AS ontime_count
            FROM orders o JOIN lineitem l ON o_orderkey = l_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        "tpch_q7": """
            SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                   CAST(EXTRACT(year FROM l_shipdate) AS BIGINT)
                     AS l_year,
                   ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * CAST(ROUND((1 - l_discount) * 100)
                                    AS BIGINT)) / 10000.0, 2) AS revenue
            FROM lineitem l
            JOIN orders o ON o_orderkey = l_orderkey
            JOIN customer c ON c_custkey = o_custkey
            JOIN supplier s ON s_suppkey = l_suppkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE n1.n_name <> n2.n_name
            GROUP BY supp_nation, cust_nation, l_year
            ORDER BY supp_nation, cust_nation, l_year
        """,
        "tpch_q8": """
            SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT)
                     AS o_year,
                   ROUND(SUM(CASE WHEN n2.n_name = 'NATION_1'
                                  THEN CAST(ROUND(l_extendedprice * 100)
                                            AS BIGINT)
                                       * CAST(ROUND((1 - l_discount)
                                                    * 100) AS BIGINT)
                                  ELSE 0 END)::DOUBLE
                         / GREATEST(SUM(
                             CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * CAST(ROUND((1 - l_discount) * 100)
                                    AS BIGINT)), 1)::DOUBLE,
                         6) AS mkt_share
            FROM lineitem l
            JOIN part p ON p_partkey = l_partkey
            JOIN orders o ON o_orderkey = l_orderkey
            JOIN customer c ON c_custkey = o_custkey
            JOIN supplier s ON s_suppkey = l_suppkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region r ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
            GROUP BY o_year ORDER BY o_year
        """,
        "tpch_q21": """
            WITH ss AS (SELECT l_orderkey, l_suppkey,
                               MAX(l_shipdate) AS smax
                        FROM lineitem GROUP BY l_orderkey, l_suppkey),
            om AS (SELECT l_orderkey, MAX(smax) AS omax,
                          COUNT(*) AS nsupp
                   FROM ss GROUP BY l_orderkey),
            at_max AS (SELECT ss.l_orderkey, ss.l_suppkey,
                              COUNT(*) OVER (PARTITION BY ss.l_orderkey)
                                AS n_at_max
                       FROM ss JOIN om USING (l_orderkey)
                       WHERE om.nsupp >= 2 AND ss.smax = om.omax)
            SELECT s_name, COUNT(*)::BIGINT AS numwait
            FROM at_max JOIN supplier ON s_suppkey = l_suppkey
            WHERE n_at_max = 1
            GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10
        """,
        "churned_customers": """
            SELECT o_custkey AS c_custkey, COUNT(*)::BIGINT AS n_orders,
                   MAX(o_orderdate) AS last_order
            FROM orders
            GROUP BY o_custkey
            HAVING MAX(o_orderdate) < TIMESTAMP '2000-01-01'
            ORDER BY c_custkey
        """,
        "ship_latency_p95": """
            SELECT l_suppkey,
                   CAST(quantile_disc(
                       CAST((epoch_us(l_shipdate) - epoch_us(o_orderdate))
                            // 86400000000 AS BIGINT), 0.95) AS BIGINT)
                     AS p95_days
            FROM lineitem l JOIN orders o ON o_orderkey = l_orderkey
            GROUP BY l_suppkey ORDER BY l_suppkey
        """,
        "tpch_q19": """
            SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * CAST(ROUND((1 - l_discount) * 100)
                                    AS BIGINT))
                         / 10000.0, 2) AS revenue
            FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
            WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1
                     AND 11 AND p.p_size BETWEEN 1 AND 5)
               OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10
                     AND 20 AND p.p_size BETWEEN 1 AND 10)
               OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20
                     AND 30 AND p.p_size BETWEEN 1 AND 15)
        """,
        "tpch_q2": """
            WITH rs AS (
              SELECT s_suppkey, s_name, s_acctbal, n_name
              FROM supplier JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              WHERE r_name = 'EUROPE'),
            cost AS (
              SELECT l_partkey, l_suppkey,
                     MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS c
              FROM lineitem JOIN rs ON l_suppkey = rs.s_suppkey
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_size >= 20)
              GROUP BY 1, 2),
            m AS (SELECT l_partkey, MIN(c) AS mc FROM cost GROUP BY 1)
            SELECT s_acctbal, s_name, n_name, p.p_partkey, p.p_type,
                   cost.c / 100.0 AS supplycost
            FROM cost JOIN m ON cost.l_partkey = m.l_partkey
                            AND cost.c = m.mc
            JOIN rs ON cost.l_suppkey = rs.s_suppkey
            JOIN part p ON cost.l_partkey = p.p_partkey
            ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
            LIMIT 100
        """,
        "tpch_q9": """
            SELECT n_name AS nation,
                   CAST(YEAR(l_shipdate) AS BIGINT) AS o_year,
                   SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * CAST(ROUND((1 - l_discount) * 100) AS BIGINT)
                       - CAST(l_quantity AS BIGINT)
                         * CAST(ROUND(p_retailprice * 100) AS BIGINT)
                         * 10) / 10000.0 AS sum_profit
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN part ON l_partkey = p_partkey
            WHERE p_name LIKE '%widget%'
            GROUP BY 1, 2 ORDER BY nation, o_year DESC
        """,
        "tpch_q11": """
            WITH v AS (
              SELECT l_partkey,
                     SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
                       AS val
              FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              WHERE n_regionkey = 2
              GROUP BY 1)
            SELECT l_partkey AS p_partkey, val / 100.0 AS value
            FROM v WHERE val > (SELECT SUM(val) * 2 // COUNT(*) FROM v)
            ORDER BY value DESC, p_partkey
        """,
        "tpch_q16": """
            WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey
                        FROM lineitem)
            SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
                   COUNT(DISTINCT l_suppkey)::BIGINT AS supplier_cnt
            FROM ps JOIN part ON l_partkey = p_partkey
            WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
              AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
              AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                    WHERE s_suppkey % 7 = 3)
            GROUP BY 1, 2, 3
            ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        """,
        "tpch_q20": """
            WITH q AS (
              SELECT l_partkey, l_suppkey,
                     SUM(CAST(l_quantity AS BIGINT)) AS total_qty,
                     SUM(CASE WHEN l_shipdate >= TIMESTAMP '1997-01-01'
                               AND l_shipdate < TIMESTAMP '1998-01-01'
                              THEN CAST(l_quantity AS BIGINT)
                              ELSE 0 END) AS y_qty
              FROM lineitem
              WHERE l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'small%')
              GROUP BY 1, 2)
            SELECT DISTINCT s_name, s_acctbal
            FROM q JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE q.y_qty > 0 AND q.total_qty > 2 * q.y_qty
              AND n_regionkey IN (1, 3)
            ORDER BY s_name
        """,
    }
