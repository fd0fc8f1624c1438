"""Eighth/ninth-wave operator tests: weighted sampling, source set
algebra, skew-safe salted join, the dataset-statistics module,
event-sequence analytics (sessions, transitions, histogram, cube,
mode) and the Bloom-prefiltered semi-join."""

import os

import numpy as np
import pyarrow as pa


def _tt(ds):
    if isinstance(ds, pa.Table):
        return ds
    tabs = list(ds.iter_batches(batch_format="pyarrow"))
    if not tabs:  # iter_batches skips 0-row blocks entirely
        sch = ds.schema()
        return (getattr(sch, "base_schema", None) or sch).empty_table()
    return pa.concat_tables(tabs)


def test_weighted_sample_matches_bruteforce(ray_session):
    import ray.data

    from scrappy_ray.functions.sampling import KNUTH, weighted_sample

    n, k, salt = 200, 25, 7
    w = np.array([0.0] + [float((i * 13) % 40 + 1) for i in range(1, n)])
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "w": pa.array(w, pa.float64())})

    # brute-force oracle: same Efraimidis-Spirakis key, computed locally
    h = ((np.arange(n, dtype=np.uint64) + np.uint64(salt))
         * np.uint64(KNUTH)) % np.uint64(1 << 32)
    u = (h.astype(np.float64) + 0.5) / 4294967296.0
    with np.errstate(divide="ignore"):
        key = u ** (1.0 / w)
    order = sorted(range(1, n), key=lambda i: (-key[i], i))
    expect = sorted(order[:k])

    for nblocks in (1, 7):
        ds = ray.data.from_arrow(tbl).repartition(nblocks)
        got = sorted(_tt(weighted_sample(ds, k=k, weight_col="w",
                                         id_col="doc_id", salt=salt))
                     .column("doc_id").to_pylist())
        assert got == expect  # block-layout independent, zero-weight excluded
    assert 0 not in expect


def test_weighted_sample_favors_heavy_rows(ray_session):
    import ray.data

    from scrappy_ray.functions.sampling import weighted_sample

    n = 400
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        # first half weight 1, second half weight 50
        "w": pa.array([1.0] * (n // 2) + [50.0] * (n // 2), pa.float64()),
    })
    got = _tt(weighted_sample(ray.data.from_arrow(tbl).repartition(4),
                              k=40, weight_col="w", id_col="doc_id"))
    heavy = sum(1 for d in got.column("doc_id").to_pylist() if d >= n // 2)
    assert heavy >= 30  # weight-proportional, not uniform


def test_source_overlap_planted(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import source_overlap

    tbl = pa.table({
        "text": pa.array([
            "common one two three four five six seven trailing-a",
            "common one two three four five six seven trailing-b",
            "only-a x1 x2 x3 x4 x5 x6 x7 t",
            "only-b y1 y2 y3 y4 y5 y6 y7 t",
            "other z1 z2 z3 z4 z5 z6 z7 t",  # src2: filtered out entirely
        ]),
        "source": pa.array(["src0", "src1", "src0", "src1", "src2"]),
    })
    out = _tt(source_overlap(ray.data.from_arrow(tbl).repartition(3),
                             "src0", "src1").sort("content_key"))
    assert sorted(out.column("op").to_pylist()) == [
        "except_a", "except_b", "intersect"]
    assert out.num_rows == 3  # the src2-only key never enters the pass


def test_salted_join_equals_plain_join(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import salted_join

    # hot key 1 dominates: every row of it lands in one partition unsalted
    big = pa.table({"k": pa.array([1] * 40 + [2] * 6 + [3] * 2, pa.int64()),
                    "v": pa.array(range(48), pa.int64())})
    small = pa.table({"k": pa.array([1, 2, 4], pa.int64()),
                      "name": pa.array(["a", "b", "d"])})
    out = _tt(salted_join(ray.data.from_arrow(big).repartition(5),
                          ray.data.from_arrow(small),
                          on="k", salts=4).sort("v"))
    assert out.num_rows == 46  # 40 + 6; k=3 unmatched, k=4 small-only
    assert "_salt" not in out.column_names
    exp_name = {1: "a", 2: "b"}
    rows = out.to_pylist()
    assert all(r["name"] == exp_name[r["k"]] for r in rows)
    assert sorted(r["v"] for r in rows) == list(range(46))


def test_profile_table_counts(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import profile_table

    tbl = pa.table({
        "i": pa.array([1, 2, 2, None, 5, None], pa.int64()),
        "s": pa.array(["b", "a", None, "a", "c", "c"]),
    })
    out = profile_table(ray.data.from_arrow(tbl).repartition(3), ["i", "s"])
    rows = {r["col_name"]: r for r in out.to_pylist()}
    assert rows["i"] == {"col_name": "i", "n_rows": 6, "n_nulls": 2,
                         "n_distinct": 3, "min_v": "1", "max_v": "5"}
    assert rows["s"] == {"col_name": "s", "n_rows": 6, "n_nulls": 1,
                         "n_distinct": 3, "min_v": "a", "max_v": "c"}


def test_group_corr_exact_endpoints(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import group_corr

    n = 20
    tbl = pa.table({
        "g": pa.array(["pos"] * n + ["neg"] * n + ["flat"] * n),
        "x": pa.array(list(range(n)) * 3, pa.int64()),
        "y": pa.array([2 * i + 1 for i in range(n)]
                      + [100 - 3 * i for i in range(n)]
                      + [7] * n, pa.int64()),
    })
    out = group_corr(ray.data.from_arrow(tbl).repartition(5), "g", "x", "y")
    rows = {r["g"]: r for r in out.to_pylist()}
    assert rows["pos"]["corr_xy"] == 1.0  # exact: integer moments, no drift
    assert rows["neg"]["corr_xy"] == -1.0
    assert rows["flat"]["corr_xy"] is None  # zero variance -> null
    assert all(r["n"] == n for r in rows.values())


def test_group_outliers_planted(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import group_outliers

    tbl = pa.table({
        "g": pa.array(["a"] * 11 + ["b"] * 3),
        "v": pa.array([10] * 10 + [1000] + [5, 6, 7], pa.int64()),
        "id": pa.array(range(14), pa.int64()),
    })
    out = _tt(group_outliers(ray.data.from_arrow(tbl).repartition(4),
                             "g", "v", "id", z_thresh=2.0))
    rows = out.to_pylist()
    assert [r["id"] for r in rows] == [10]  # only the planted spike
    assert abs(rows[0]["z"] - 3.015113) < 1e-6  # sample-sd z, rounded @6


def test_session_ids_gap_assignment(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import session_ids

    US = 1_000_000
    ev = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
        "ts": pa.array([s * US for s in [0, 60, 120, 4000, 10, 20, 5000,
                                         5030]], pa.timestamp("us")),
    })
    out = _tt(session_ids(ray.data.from_arrow(ev).repartition(3))
              .sort("event_id"))
    # user 1 gaps: 60 s, 60 s, 3880 s (> 30 min -> new session)
    assert out.column("session_id").to_pylist() == [1, 1, 1, 2, 1, 1, 2, 2]


def test_event_transitions_bigram_counts(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import event_transitions

    US = 1_000_000
    ev = pa.table({
        "event_id": pa.array(range(8), pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 2, 2, 2, 2], pa.int64()),
        "ts": pa.array([s * US for s in [0, 1, 2, 3, 0, 1, 2, 3]],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "a", "c", "x", "y", "x", "y"]),
    })
    out = _tt(event_transitions(ray.data.from_arrow(ev).repartition(3)))
    got = {(r["from_type"], r["to_type"]): r["n"] for r in out.to_pylist()}
    assert got == {("a", "b"): 1, ("b", "a"): 1, ("a", "c"): 1,
                   ("x", "y"): 2, ("y", "x"): 1}


def test_value_histogram_bins(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import value_histogram

    vals = pa.table({"value": pa.array([0.0, 1.0, 2.5, 5.0, 9.9, 10.0],
                                       pa.float64())})
    out = _tt(value_histogram(ray.data.from_arrow(vals).repartition(2),
                              "value", nbins=5))
    rows = {r["bin"]: r for r in out.to_pylist()}
    # width 2.0: [0,2)->2, [2,4)->1, [4,6)->1, [8,10]->2 (max lands in
    # the last bin via the min(floor, nbins-1) clamp)
    assert {b: r["n"] for b, r in rows.items()} == {0: 2, 1: 1, 2: 1, 4: 2}
    assert rows[4]["lo"] == 8.0


def test_cube_counts_margins(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import cube_counts

    t = pa.table({
        "a": pa.array(["x", "x", "y", "y"]),
        "b": pa.array(["p", "q", "p", "p"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
    })
    out = cube_counts(ray.data.from_arrow(t).repartition(2),
                      "a", "b", "v", scale=2)
    assert out.num_rows == 8  # 3 fine + 2 a-margins + 2 b-margins + total
    rows = out.to_pylist()
    bp = [r for r in rows if r["a"] is None and r["b"] == "p"][0]
    assert bp["n"] == 3 and abs(bp["sum_v"] - 8.0) < 1e-9
    tot = [r for r in rows if r["a"] is None and r["b"] is None][0]
    assert tot["n"] == 4 and abs(tot["sum_v"] - 10.0) < 1e-9


def test_mode_per_group_deterministic_ties(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import mode_per_group

    ev = pa.table({"u": pa.array([1, 1, 1, 2, 2, 2], pa.int64()),
                   "t": pa.array(["a", "b", "b", "x", "y", "x"])})
    out = _tt(mode_per_group(ray.data.from_arrow(ev).repartition(3),
                             "u", "t").sort("u"))
    assert out.to_pylist() == [{"u": 1, "t": "b", "n": 2},
                               {"u": 2, "t": "x", "n": 2}]
    # equal counts -> lexicographically smallest value wins
    tie = pa.table({"u": pa.array([1, 1], pa.int64()),
                    "t": pa.array(["z", "a"])})
    out2 = _tt(mode_per_group(ray.data.from_arrow(tie).repartition(2),
                              "u", "t"))
    assert out2.to_pylist() == [{"u": 1, "t": "a", "n": 1}]


def test_bloom_semi_join_exact(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import bloom_semi_join

    big = pa.table({"key": pa.array([f"k{i}" for i in range(1000)]),
                    "id": pa.array(range(1000), pa.int64())})
    # duplicated small side: the distinct step must dedup before joining
    small = pa.table({"ref": pa.array([f"k{i}"
                                       for i in range(0, 1000, 37)] * 2)})
    out = _tt(bloom_semi_join(ray.data.from_arrow(big).repartition(4), "key",
                              ray.data.from_arrow(small).repartition(2),
                              "ref").sort("id"))
    assert out.column("id").to_pylist() == sorted(range(0, 1000, 37))


def test_triangle_counts_k4(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import triangle_counts

    # K4 on {0..3} (4 triangles, each node in 3) + a pendant edge +
    # duplicate and reversed edges that DISTINCT canonicalization eats
    edges = pa.table({
        "src": pa.array([0, 0, 0, 1, 1, 2, 4, 2, 1], pa.int64()),
        "dst": pa.array([1, 2, 3, 2, 3, 3, 5, 0, 0], pa.int64()),
    })
    out = _tt(triangle_counts(ray.data.from_arrow(edges).repartition(3)))
    assert out.to_pylist() == [{"node": n, "n_triangles": 3}
                               for n in range(4)]


def test_triangle_counts_no_triangles(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import triangle_counts

    # a path graph has wedges but no closing edges
    edges = pa.table({"src": pa.array([0, 1, 2], pa.int64()),
                      "dst": pa.array([1, 2, 3], pa.int64())})
    out = _tt(triangle_counts(ray.data.from_arrow(edges).repartition(2)))
    assert out.num_rows == 0


def test_mad_outliers_spike_resistant(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import mad_outliers

    # one huge spike: the MEDIAN threshold ignores its magnitude, so
    # only the spike itself is flagged (a mean/sd rule would widen)
    t = pa.table({
        "g": pa.array(["a"] * 9),
        "v": pa.array([10, 11, 12, 10, 11, 12, 10, 11, 500], pa.int64()),
        "id": pa.array(range(9), pa.int64()),
    })
    out = _tt(mad_outliers(ray.data.from_arrow(t).repartition(3),
                           "g", "v", "id", k=3.0))
    rows = out.to_pylist()
    assert [r["id"] for r in rows] == [8]
    assert rows[0]["dev"] == 489  # |500 - median 11|


def test_distinct_count_by_group(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import distinct_count_by_group

    t = pa.table({"g": pa.array(["x", "x", "x", "y", "y"]),
                  "u": pa.array([1, 1, 2, 3, 3], pa.int64())})
    out = _tt(distinct_count_by_group(
        ray.data.from_arrow(t).repartition(3), "g", "u"))
    assert out.to_pylist() == [{"g": "x", "n_distinct": 2},
                               {"g": "y", "n_distinct": 1}]


def test_dist_windows_ties(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import dist_windows

    ev = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([1] * 5, pa.int64()),
        "value": pa.array([10.0, 20.0, 20.0, 30.0, 40.0], pa.float64()),
    })
    out = _tt(dist_windows(ray.data.from_arrow(ev).repartition(2),
                           "user_id", "value", "event_id")
              .sort("event_id"))
    # SQL ranks 1,2,2,4,5: PERCENT_RANK=(r-1)/(n-1), CUME_DIST=hi/n
    assert [r["pr"] for r in out.to_pylist()] == [0.0, 0.25, 0.25, 0.75, 1.0]
    assert [r["cd"] for r in out.to_pylist()] == [0.2, 0.6, 0.6, 0.8, 1.0]


def test_char_entropy_known_values(ray_session):
    import ray.data

    from scrappy_ray.functions.textstats import char_entropy

    t = pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array(["aaaa",        # one symbol -> 0 bits
                          "abab",        # two equiprobable -> 1 bit
                          "abcd",        # four equiprobable -> 2 bits
                          "aé\né",       # unicode + newline counted
                          ""]),          # empty: no distribution, no row
    })
    out = _tt(char_entropy(ray.data.from_arrow(t).repartition(3))
              .sort("doc_id"))
    rows = {r["doc_id"]: r["entropy"] for r in out.to_pylist()}
    assert rows[0] == 0.0
    assert rows[1] == 1.0
    assert rows[2] == 2.0
    # "aé\né": counts a=1, é=2, \n=1 over 4 -> 1.5 bits
    assert abs(rows[3] - 1.5) < 1e-9
    assert 4 not in rows


def test_partitioned_write_prunes(ray_session, tmp_path):
    import glob

    import ray.data

    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "source": pa.array(["a", "b", "a", "b", "c", "a"]),
        "v": pa.array(range(6), pa.int64()),
    })
    out = str(tmp_path / "parts")
    ray.data.from_arrow(t).repartition(2).write_parquet(
        out, partition_cols=["source"])
    # one directory per partition -> a resumable run can skip finished ones
    assert sorted(os.path.basename(p) for p in glob.glob(out + "/source=*")) \
        == ["source=a", "source=b", "source=c"]
    back = _tt(ray.data.read_parquet(
        sorted(glob.glob(out + "/source=a/*.parquet")))
        .select_columns(["doc_id", "v"]).sort("doc_id"))
    assert back.column("doc_id").to_pylist() == [0, 2, 5]


def test_hopping_windows_overlap(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import hopping_windows

    H = 3600 * 1_000_000
    ev = pa.table({
        "ts": pa.array([0, H // 2, H, H + 1, 3 * H], pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0], pa.float64()),
    })
    out = _tt(hopping_windows(ray.data.from_arrow(ev).repartition(2),
                              "ts", "value", window_us=2 * H, hop_us=H))
    # each event lands in 2 windows (2h window, 1h hop)
    assert [(r["n"], r["sum_value"]) for r in out.to_pylist()] == [
        (2, 3.0), (4, 15.0), (2, 12.0), (1, 16.0), (1, 16.0)]


def test_first_last_per_group_total_order(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import first_last_per_group

    t = pa.table({
        "u": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "ts": pa.array([5, 1, 3, 9, 2], pa.int64()),
        "id": pa.array(range(5), pa.int64()),
        "t": pa.array(["c", "a", "b", "z", "y"]),
    })
    out = _tt(first_last_per_group(ray.data.from_arrow(t).repartition(3),
                                   "u", ["ts", "id"], "t").sort("u"))
    assert out.to_pylist() == [{"u": 1, "first_v": "a", "last_v": "c"},
                               {"u": 2, "first_v": "y", "last_v": "z"}]


def test_group_summary_moments(ray_session):
    import math

    import ray.data

    from scrappy_ray.functions.stats import group_summary

    t = pa.table({"g": pa.array(["a"] * 4 + ["b"] * 2),
                  "v": pa.array([1, 2, 3, 4, 7, 7], pa.int64())})
    out = group_summary(ray.data.from_arrow(t).repartition(3), "g", "v")
    rows = {r["g"]: r for r in out.to_pylist()}
    assert rows["a"] == {"g": "a", "n": 4, "min_v": 1, "max_v": 4,
                         "mean_v": 2.5,
                         "sd_v": round(math.sqrt(5 / 3), 6)}
    assert rows["b"]["sd_v"] is None  # zero variance -> null, not 0/NaN


def test_weighted_mean_exact(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import weighted_mean

    t = pa.table({
        "g": pa.array(["x", "x", "y"]),
        "val": pa.array([0.10, 0.20, 0.05], pa.float64()),
        "wt": pa.array([1.0, 3.0, 2.0], pa.float64()),
    })
    out = weighted_mean(ray.data.from_arrow(t).repartition(2),
                        "g", "val", "wt")
    # (1*0.1 + 3*0.2)/4 = 0.175 exactly (fixed-point, no float drift)
    assert out.to_pylist() == [{"g": "x", "wavg": 0.175},
                               {"g": "y", "wavg": 0.05}]


def test_embedding_norms_exact(ray_session):
    import ray.data

    from scrappy_ray.functions.similarity import embedding_norms

    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[3.0, 4.0], [0.0, 0.0], []],
                              pa.list_(pa.float32())),
    })
    out = _tt(embedding_norms(ray.data.from_arrow(t).repartition(2))
              .sort("vec_id"))
    rows = {r["vec_id"]: r["l2_norm"] for r in out.to_pylist()}
    assert rows[0] == 5.0
    assert rows[1] == 0.0
    assert rows[2] == 0.0  # empty vector: norm 0, not a reduceat artifact


def test_calendar_profile_epoch_arithmetic(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import calendar_profile

    DAY, HOUR = 86_400_000_000, 3_600_000_000
    # 1970-01-01 was a Thursday (dow 4 with Sunday=0)
    ev = pa.table({"ts": pa.array(
        [0, HOUR, 3 * DAY + 5 * HOUR, 3 * DAY + 5 * HOUR + 1],
        pa.timestamp("us"))})
    out = _tt(calendar_profile(ray.data.from_arrow(ev).repartition(2)))
    assert out.to_pylist() == [
        {"dow": 0, "hour": 5, "n": 2},   # Thu+3 = Sunday
        {"dow": 4, "hour": 0, "n": 1},
        {"dow": 4, "hour": 1, "n": 1},
    ]


def test_type_token_ratio(ray_session):
    import ray.data

    from scrappy_ray.functions.textstats import type_token_ratio

    docs = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(["a b a b", "x y z w", "q q q q"]),
    })
    out = _tt(type_token_ratio(ray.data.from_arrow(docs).repartition(2))
              .sort("doc_id"))
    assert [r["ttr"] for r in out.to_pylist()] == [0.5, 1.0, 0.25]
    assert [r["n_types"] for r in out.to_pylist()] == [2, 4, 1]


def test_vocab_and_jaccard_by_source(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import (source_vocab_jaccard,
                                               vocab_by_source)

    docs = pa.table({
        "doc_id": pa.array(range(3), pa.int64()),
        "text": pa.array(["a b c", "b c d", "x y"]),
        "source": pa.array(["s1", "s2", "s3"]),
    })
    ds = ray.data.from_arrow(docs).repartition(2)
    v = _tt(vocab_by_source(ds))
    assert v.to_pylist() == [{"source": "s1", "n_distinct": 3},
                             {"source": "s2", "n_distinct": 3},
                             {"source": "s3", "n_distinct": 2}]
    j = source_vocab_jaccard(ds)
    # s1={a,b,c} vs s2={b,c,d}: 2 common / 4 union; s3 disjoint -> no row
    assert j.to_pylist() == [{"src_a": "s1", "src_b": "s2",
                              "n_common": 2, "jaccard": 0.5}]


def test_global_rank_dense_and_quantile(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import global_rank

    t = pa.table({
        "id": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "v": pa.array([30, 10, 20, 10, 30], pa.int64()),
    })
    out = _tt(global_rank(ray.data.from_arrow(t).repartition(3),
                          "v", "id").sort("id"))
    # (v, id) total order: (10,11)=1 (10,13)=2 (20,12)=3 (30,10)=4 (30,14)=5
    assert [r["rn"] for r in out.to_pylist()] == [4, 1, 3, 2, 5]
    assert [r["qnorm"] for r in out.to_pylist()] == [0.75, 0.0, 0.5, 0.25, 1.0]


def test_user_growth_cumulative(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import user_growth

    DAY = 86_400_000_000
    ev = pa.table({
        "user_id": pa.array([1, 2, 1, 3, 2, 4], pa.int64()),
        "ts": pa.array([0, 0, DAY, DAY, 2 * DAY, 2 * DAY],
                       pa.timestamp("us")),
    })
    out = user_growth(ray.data.from_arrow(ev).repartition(3))
    assert out.to_pylist() == [
        {"day": 0, "new_users": 2, "cum_users": 2},
        {"day": 1, "new_users": 1, "cum_users": 3},   # user 1 returns
        {"day": 2, "new_users": 1, "cum_users": 4},   # user 2 returns
    ]


def test_profile_table_approx_distinct(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import profile_table

    n = 5000
    t = pa.table({
        "pk": pa.array(range(n), pa.int64()),          # all distinct
        "cat": pa.array([f"c{i % 7}" for i in range(n)]),
    })
    out = profile_table(ray.data.from_arrow(t).repartition(4),
                        ["pk", "cat"], approx=True)
    rows = {r["col_name"]: r for r in out.to_pylist()}
    # HLL p=12: ~1.6% expected error; allow 5%
    assert abs(rows["pk"]["n_distinct"] - n) / n < 0.05
    assert rows["cat"]["n_distinct"] == 7  # small sets are near-exact
    # the non-distinct fields are unchanged by the approx path
    assert rows["pk"]["n_rows"] == n and rows["pk"]["min_v"] == "0"


def test_triangle_counts_local_equals_distributed(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import triangle_counts

    # pseudo-random-ish deterministic graph + a planted K5 (10 triangles)
    n = 60
    src, dst = [], []
    for i in range(n):
        src += [i, i]
        dst += [(i * 7 + 3) % n, (i * 13 + 5) % n]
        if i % 4 == 0:
            src.append(i)
            dst.append((i + 1) % n)
    for x in range(5):
        for y in range(x + 1, 5):
            src.append(x)
            dst.append(y)
    edges = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
    ds = ray.data.from_arrow(edges).repartition(4)
    local = _tt(triangle_counts(ds))  # gate: local path
    dist = _tt(triangle_counts(ds, force_distributed=True))
    assert local.to_pylist() == dist.to_pylist()
    assert local.num_rows > 0  # the graph actually has triangles


def test_type_cooccurrence_pairs(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import type_cooccurrence

    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2, 3], pa.int64()),
        "event_type": pa.array(["a", "b", "a", "a", "c", "a"]),
    })
    out = _tt(type_cooccurrence(ray.data.from_arrow(ev).repartition(3)))
    # user1 {a,b}, user2 {a,c}, user3 {a}: pairs (a,b)=1, (a,c)=1
    assert out.to_pylist() == [
        {"type_a": "a", "type_b": "b", "n_users": 1},
        {"type_a": "a", "type_b": "c", "n_users": 1},
    ]


def test_late_events_watermark(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import late_events

    US = 1_000_000
    # arrival order = event_id; event 3 arrives carrying a timestamp
    # 40 min older than the watermark (max seen 3600s - 1800s) -> late;
    # event 4 is only 10 min behind the max -> on time
    ev = pa.table({
        "event_id": pa.array(range(5), pa.int64()),
        "user_id": pa.array([1] * 5, pa.int64()),
        "ts": pa.array([s * US for s in [0, 3600, 1200, 600, 3000]],
                       pa.timestamp("us")),
    })
    out = _tt(late_events(ray.data.from_arrow(ev).repartition(2))
              .sort("event_id"))
    assert out.column("is_late").to_pylist() == [0, 0, 1, 1, 0]


def test_json_field_stats_missing_field(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import json_field_stats

    ev = pa.table({
        "event_type": pa.array(["a", "a", "b", "b"]),
        "props": pa.array(['{"k": 5}', '{"k": -2}', '{"other": 1}',
                           '{"k": 10}']),
    })
    out = json_field_stats(ray.data.from_arrow(ev).repartition(2))
    rows = {r["event_type"]: r for r in out.to_pylist()}
    assert rows["a"] == {"event_type": "a", "n": 2, "sum_v": 3,
                         "n_missing": 0, "mean_v": 1.5}
    assert rows["b"]["n_missing"] == 1 and rows["b"]["sum_v"] == 10


def test_embedding_dim_stats_known(ray_session):
    import ray.data

    from scrappy_ray.functions.similarity import embedding_dim_stats

    t = pa.table({
        "embedding": pa.array([[1.0, 0.0], [3.0, 0.0], [5.0, 0.0]],
                              pa.list_(pa.float32())),
    })
    out = embedding_dim_stats(ray.data.from_arrow(t).repartition(2),
                              dims=2)
    rows = {r["dim"]: r for r in out.to_pylist()}
    assert rows[1]["mean_v"] == 3.0 and rows[1]["var_v"] == 4.0
    assert rows[2]["mean_v"] == 0.0 and rows[2]["var_v"] == 0.0


def test_chi_square_independent_vs_skewed(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import chi_square_cells

    # perfectly independent 2x2 -> every contribution 0
    t = pa.table({"r": pa.array(["a"] * 4 + ["b"] * 4),
                  "c": pa.array(["x", "x", "y", "y"] * 2)})
    out = chi_square_cells(ray.data.from_arrow(t).repartition(3), "r", "c")
    assert all(r["contrib"] == 0.0 for r in out.to_pylist())
    assert all(r["expected"] == 2.0 for r in out.to_pylist())
    # fully dependent -> large contributions
    t2 = pa.table({"r": pa.array(["a"] * 4 + ["b"] * 4),
                   "c": pa.array(["x"] * 4 + ["y"] * 4)})
    out2 = chi_square_cells(ray.data.from_arrow(t2).repartition(3),
                            "r", "c")
    assert sum(r["contrib"] for r in out2.to_pylist()) == 8.0  # = n


def test_orc_roundtrip_source_sink(ray_session, tmp_path):
    import glob

    import ray.data

    from scrappy_ray.sources.orcfile import read_orc, write_orc

    tbl = pa.table({
        "doc_id": pa.array(range(10), pa.int64()),
        "text": pa.array([f"doc {i} ø" for i in range(10)]),
        "payload": pa.array([bytes([i]) * 3 for i in range(10)],
                            pa.binary()),
    })
    out_dir = str(tmp_path / "orc")
    n = write_orc(ray.data.from_arrow(tbl).repartition(3), out_dir)
    assert n == 10
    files = sorted(glob.glob(out_dir + "/*.orc"))
    assert len(files) == 3  # one atomic shard per block
    back = _tt(read_orc(files).sort("doc_id")).combine_chunks()
    assert back.select(["doc_id", "text", "payload"]).equals(
        tbl.select(["doc_id", "text", "payload"]))
    # column pruning: unrequested columns never decoded
    pruned = _tt(read_orc(files, columns=["doc_id"]).sort("doc_id"))
    assert pruned.column_names == ["doc_id"]


def test_rolling_median_spike_resistant(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import rolling_median

    ev = pa.table({
        "event_id": pa.array(range(6), pa.int64()),
        "user_id": pa.array([1] * 6, pa.int64()),
        "ts": pa.array(range(6), pa.int64()),
        "value": pa.array([10.0, 10.0, 1000.0, 10.0, 10.0, 10.0],
                          pa.float64()),
    })
    out = _tt(rolling_median(ray.data.from_arrow(ev).repartition(2),
                             "user_id", "ts", "value", "event_id",
                             window=3).sort("event_id"))
    # the spike never moves the median (warm-up rows 0-1 use prefixes)
    assert [r["med"] for r in out.to_pylist()] == [
        10.0, 10.0, 10.0, 10.0, 10.0, 10.0]


def test_longest_streak_islands(ray_session):
    import ray.data

    from scrappy_ray.pipelines.relational import longest_streak

    ev = pa.table({
        "event_id": pa.array(range(7), pa.int64()),
        "user_id": pa.array([1] * 5 + [2] * 2, pa.int64()),
        "ts": pa.array([0, 1, 2, 3, 4, 0, 1], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "b", "b", "x", "y"]),
    })
    out = _tt(longest_streak(ray.data.from_arrow(ev).repartition(3),
                             "user_id", "ts", "event_type", "event_id")
              .sort("user_id"))
    assert out.to_pylist() == [
        {"user_id": 1, "streak_value": "b", "streak_len": 3},
        # user 2 ties at len 1: lexicographically smallest value wins
        {"user_id": 2, "streak_value": "x", "streak_len": 1},
    ]


def test_winsorize_clips_tails(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import winsorize

    t = pa.table({
        "g": pa.array(["a"] * 10),
        "v": pa.array([1, 2, 3, 4, 5, 6, 7, 8, 9, 100], pa.int64()),
        "id": pa.array(range(10), pa.int64()),
    })
    out = _tt(winsorize(ray.data.from_arrow(t).repartition(3),
                        "g", "v", "id", lo_q=0.2, hi_q=0.8)
              .sort("id"))
    # p20 = 2, p80 = 8 (percentile_disc: actual data values)
    assert [r["clipped"] for r in out.to_pylist()] == [
        2, 2, 3, 4, 5, 6, 7, 8, 8, 8]
    assert [r["v"] for r in out.to_pylist()][-1] == 100  # original kept


def test_user_entropy_diversity(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import user_entropy

    ev = pa.table({
        "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
        "event_type": pa.array(["a", "b", "c", "d", "x", "x"]),
    })
    out = user_entropy(ray.data.from_arrow(ev).repartition(3))
    rows = {r["user_id"]: r for r in out.to_pylist()}
    assert rows[1]["entropy"] == 2.0  # 4 equiprobable types
    assert rows[2]["entropy"] == 0.0  # single-action user (not -0.0)
    assert str(rows[2]["entropy"])[0] != "-"


def test_conversion_time_percentiles(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import conversion_time

    US = 1_000_000
    rows = []
    # users 1..3 convert after 10/20/30 s; user 4 purchases BEFORE
    # viewing (no conversion); user 5 never purchases
    for uid, (tv, tp) in enumerate([(0, 10), (0, 20), (0, 30),
                                    (50, 40), (0, None)], start=1):
        rows.append((uid, "view", tv))
        if tp is not None:
            rows.append((uid, "purchase", tp))
    ev = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
    })
    out = conversion_time(ray.data.from_arrow(ev).repartition(3))
    assert out.to_pylist() == [
        {"n_converted": 3, "p50_s": 20.0, "p95_s": 30.0}]


def test_resolve_pointers_chain(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import resolve_pointers

    # 10→9→8(terminal), 5→4(terminal), 2→1→0(terminal)
    edges = pa.table({"src": pa.array([10, 9, 5, 2, 1], pa.int64()),
                      "dst": pa.array([9, 8, 4, 1, 0], pa.int64())})
    out = _tt(resolve_pointers(ray.data.from_arrow(edges)))
    got = {r["src"]: (r["final"], r["hops"]) for r in out.to_pylist()}
    assert got == {10: (8, 2), 9: (8, 1), 5: (4, 1), 2: (0, 2), 1: (0, 1)}


def test_resolve_pointers_long_chain_log_rounds(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import resolve_pointers

    # one 64-link chain: 64→63→…→0 — must resolve within the
    # max_iters=8 pointer-doubling budget (⌈log2 64⌉ = 6 < 8), which a
    # one-hop-per-round walk could not
    n = 64
    edges = pa.table({"src": pa.array(range(1, n + 1), pa.int64()),
                      "dst": pa.array(range(0, n), pa.int64())})
    out = _tt(resolve_pointers(ray.data.from_arrow(edges), max_iters=8))
    got = {r["src"]: (r["final"], r["hops"]) for r in out.to_pylist()}
    assert got[n] == (0, n)
    assert got[1] == (0, 1)
    assert len(got) == n


def test_daily_compare_missing_side_is_zero(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import daily_compare

    ts = pa.array([1_700_000_000_000_000 + d * 86_400_000_000
                   for d in [0, 0, 0, 1, 2, 2]], pa.timestamp("us"))
    ty = pa.array(["view", "view", "purchase", "view", "purchase",
                   "purchase"])
    out = _tt(daily_compare(
        ray.data.from_arrow(pa.table({"ts": ts, "event_type": ty})),
        "view", "purchase"))
    rows = out.to_pylist()
    assert [(r["views"], r["purchases"]) for r in rows] == [
        (2, 1), (1, 0), (0, 2)]


def test_badword_stats_counts(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import badword_stats

    tbl = pa.table({
        "text": pa.array(["bad bad good", "good fine", "bad x", "clean"]),
        "source": pa.array(["a", "a", "b", "b"]),
    })
    out = _tt(badword_stats(ray.data.from_arrow(tbl), ["bad"]))
    rows = {r["source"]: r for r in out.to_pylist()}
    assert rows["a"]["docs"] == 2 and rows["a"]["flagged"] == 1
    assert rows["a"]["bad_tokens"] == 2
    assert rows["b"]["docs"] == 2 and rows["b"]["flagged"] == 1
    assert rows["b"]["bad_tokens"] == 1


def test_event_gaps_known_values(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import event_gaps

    base = 1_700_000_000_000_000
    # user 1: events at +0s, +10s, +40s  → gaps 10s, 30s
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([base, base + 10_000_000, base + 40_000_000],
                       pa.timestamp("us")),
        "event_type": pa.array(["a", "b", "b"]),
    })
    out = _tt(event_gaps(ray.data.from_arrow(tbl)))
    rows = {r["event_type"]: r for r in out.to_pylist()}
    assert set(rows) == {"b"}  # only later events carry a gap
    assert rows["b"]["n"] == 2
    assert rows["b"]["p50"] == 10_000_000.0
    assert rows["b"]["p99"] == 30_000_000.0


def test_type_sequences_order(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import type_sequences

    tbl = pa.table({
        "event_id": pa.array([3, 1, 2], pa.int64()),
        "user_id": pa.array([7, 7, 7], pa.int64()),
        "ts": pa.array([30, 10, 20], pa.timestamp("us")),
        "event_type": pa.array(["c", "a", "b"]),
    })
    out = _tt(type_sequences(ray.data.from_arrow(tbl)))
    assert out.to_pylist() == [{"user_id": 7, "type_seq": "a,b,c", "n": 3}]


def test_bfs_depths_min_over_sources(ray_session):
    import ray.data

    from scrappy_ray.functions.graph import bfs_depths

    # seeds {0, 10}; 0→1→2→3, 10→3 — node 3 must take the 1-hop path
    edges = pa.table({"src": pa.array([0, 1, 2, 10], pa.int64()),
                      "dst": pa.array([1, 2, 3, 3], pa.int64())})
    seeds = pa.table({"v": pa.array([0, 10], pa.int64())})
    out = _tt(bfs_depths(ray.data.from_arrow(edges),
                         ray.data.from_arrow(seeds)))
    got = {r["v"]: r["depth"] for r in out.to_pylist()}
    assert got == {0: 0, 10: 0, 1: 1, 2: 2, 3: 1}


def test_weekly_active_sliding_distinct(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import weekly_active

    day = 86_400_000_000
    # user 1 on days 0 and 2; user 2 on day 2 — WAU(0)=1, WAU(2)=2;
    # day 1 absent from data ⇒ no row for it
    tbl = pa.table({
        "ts": pa.array([0, 2 * day, 2 * day + 5], pa.timestamp("us")),
        "user_id": pa.array([1, 1, 2], pa.int64()),
    })
    out = _tt(weekly_active(ray.data.from_arrow(tbl)))
    assert out.to_pylist() == [{"day": 0, "wau": 1}, {"day": 2, "wau": 2}]


def test_group_gini_extremes(ray_session):
    import ray.data

    from scrappy_ray.functions.stats import group_gini

    tbl = pa.table({
        "source": pa.array(["eq"] * 4 + ["uneq"] * 4),
        "v": pa.array([5, 5, 5, 5, 0, 0, 0, 100], pa.int64()),
    })
    out = _tt(group_gini(ray.data.from_arrow(tbl), "source", "v"))
    rows = {r["source"]: r["gini"] for r in out.to_pylist()}
    assert rows["eq"] == 0.0
    assert rows["uneq"] == 0.75  # one holder of everything among 4


def test_source_kl_identical_distribution_is_zero(ray_session):
    import ray.data

    from scrappy_ray.functions.webtext import source_kl

    # both sources have the exact same token distribution → corpus
    # distribution equals each source's → KL = 0 for both
    tbl = pa.table({
        "text": pa.array(["a a b", "a a b"]),
        "source": pa.array(["s1", "s2"]),
    })
    out = _tt(source_kl(ray.data.from_arrow(tbl)))
    assert [r["kl_bits"] for r in out.to_pylist()] == [0.0, 0.0]


def test_bounce_rate_known_sessions(ray_session):
    import ray.data

    from scrappy_ray.pipelines.analytics import bounce_rate

    day = 86_400_000_000
    hour = 3_600_000_000
    # user 1: two events 5 min apart on day 0 (one session, not a
    # bounce); user 2: one event day 0 (bounce) + one event day 1
    # after a >30-min gap (second session, bounce)
    tbl = pa.table({
        "event_id": pa.array([1, 2, 3, 4], pa.int64()),
        "user_id": pa.array([1, 1, 2, 2], pa.int64()),
        "ts": pa.array([0, 300_000_000, 2 * hour, day + hour],
                       pa.timestamp("us")),
    })
    out = _tt(bounce_rate(ray.data.from_arrow(tbl)))
    rows = {r["day"]: r for r in out.to_pylist()}
    assert rows[0]["n_sessions"] == 2 and rows[0]["n_bounces"] == 1
    assert rows[0]["bounce_rate"] == 0.5
    assert rows[1]["n_sessions"] == 1 and rows[1]["n_bounces"] == 1
