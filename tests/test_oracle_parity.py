"""In-suite DuckDB oracle parity: run a few of __ray_entry__'s oracled
queries against their SQL on sf0.001, the same comparison the driver
does at sf0.01 (order-insensitive, floats rounded identically)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"
FAST_QUERIES = [
    "tpch_q1", "dedup_exact", "token_stats", "sessionize", "events_window",
    "sim_topk", "repetition", "chunk_docs", "hash_sample", "stratified_sample",
    "range_join", "asof_join", "top_per_group", "pivot_events", "value_quantiles",
    "top_ngrams", "perplexity", "paragraph_dedup", "decontaminate", "tfidf_topk",
    "heavy_hitters", "heavy_hitters_by_group", "substr_dedup",
    "incremental_dedup", "pack_sequences", "shuffle_det", "warc_roundtrip",
    "pagerank", "graph_degrees", "rolling_window", "gopher_rules",
    "mix_corpus", "inverted_search", "index_lookup", "jsonl_roundtrip",
    "orders_per_customer", "customers_no_urgent", "snapshot_diff",
    "quality_buckets", "export_roundtrip", "url_traps", "span_removal",
    "sitemap_parse",
    "mirror_sources", "fuzzy_join", "collocations", "dup_histogram",
    "revisit_stats", "readability", "leakage_split", "csv_roundtrip",
    "jsonl_gz_roundtrip",
    "url_templates", "graph_reciprocity", "script_mix", "group_sample",
    "ipc_roundtrip",
    "rank_windows", "rollup_orders", "funnel", "retention",
    "events_resample", "unpivot_events",
    "weighted_sample", "source_overlap", "salted_join", "profile_table",
    "group_corr", "group_outliers",
    "session_ids", "event_transitions", "value_histogram", "cube_orders",
    "mode_event_type", "bloom_semi_join",
    "graph_triangles", "mad_outliers", "distinct_users", "dist_windows",
    "char_entropy", "partition_prune", "hopping_windows", "first_last",
    "group_summary", "weighted_mean", "embedding_norms", "calendar_profile",
    "type_token_ratio", "vocab_by_source", "source_vocab_jaccard",
    "global_rank", "user_growth", "longest_session", "daily_quantiles",
    "type_cooccurrence", "rfm_customers", "dup_rate_by_source", "late_events", "json_field_stats", "embedding_dim_stats", "chi_square", "daily_change", "dedup_best", "orc_roundtrip", "rolling_median", "longest_streak", "winsorize", "user_entropy", "conversion_time", "tpch_q3", "tpch_q5",
    "type_sequences", "full_outer_daily", "event_gaps", "redirect_chains",
    "badwords_filter",
    "graph_bfs", "weekly_active", "length_gini", "source_kl",
    "bounce_rate",
    "tpch_q18", "tpch_q4", "group_linreg", "autocorr", "skyline",
    "component_sizes", "weighted_median", "last_touch",
    "cheapest_supplier", "revenue_share", "tpch_q14", "tpch_q10",
    "tpch_q6", "nation_revenue_share", "tpch_q17", "tpch_q15",
    "label_centroids", "knn_classify", "tpch_q19",
    "distinct_event_types", "domain_filter", "domain_stats", "events_daily",
    "filter_pushdown", "lang_id", "mktsegment", "normalize_text",
    "part_types", "pii_scrub", "punct_ratio", "quality_scores",
    "region_customers", "revenue_by_priority", "supplier_nation",
    "top_orders", "url_dedup", "revisit_stats_salted",
    "tpch_q13", "tpch_q22", "tpch_q12", "tpch_q7", "tpch_q8", "tpch_q21",
    "churned_customers", "ship_latency_p95",
    "tpch_q2", "tpch_q9", "tpch_q11", "tpch_q16", "tpch_q20",
]


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("name", FAST_QUERIES)
def test_query_matches_oracle(name, oracle_con):
    import __ray_entry__ as E

    res = E.queries()[name](SF)
    df = res if isinstance(res, pd.DataFrame) else res.to_pandas()
    odf = oracle_con.execute(E.oracle_sql()[name]).fetchdf()

    assert sorted(df.columns) == sorted(odf.columns)
    assert len(df) == len(odf)
    a = df[sorted(df.columns)].sort_values(sorted(df.columns)).reset_index(drop=True)
    b = odf[sorted(odf.columns)].sort_values(sorted(odf.columns)).reset_index(drop=True)
    for c in a.columns:
        if a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
            # equal_nan: nullable numerics (e.g. LAG's first row) reach
            # pandas as NaN on BOTH sides and must compare equal
            assert np.allclose(a[c].astype(float), b[c].astype(float),
                               atol=1e-9, equal_nan=True), c
        else:
            assert (a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy()).all(), c


def test_every_query_is_verified_in_suite():
    """Coverage meta-test (r4 verdict ask #8): every queries() entry
    must be verified by SOMETHING in the suite — sf0.001 DuckDB parity
    (FAST_QUERIES), the frozen golden-oracle set (_GOLDEN_ORACLES), or
    an explicit slow-list entry with a reason. A new query cannot
    silently skip in-suite verification."""
    import __ray_entry__ as E

    SLOW_EXPLICIT = {
        # name: reason it cannot run at sf0.001 in-suite
    }
    covered = set(FAST_QUERIES) | set(E._GOLDEN_ORACLES) | set(SLOW_EXPLICIT)
    missing = sorted(set(E.queries()) - covered)
    assert not missing, (
        f"queries with no in-suite verification: {missing} — add to "
        "FAST_QUERIES (sf0.001 SQL parity), _GOLDEN_ORACLES (frozen "
        "golden), or SLOW_EXPLICIT (with a reason)")
    stale = sorted(set(FAST_QUERIES) - set(E.queries()))
    assert not stale, f"FAST_QUERIES entries with no query: {stale}"
