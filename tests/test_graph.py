"""Link-graph operators: degrees + distributed PageRank."""

import numpy as np
import pyarrow as pa
import pytest


def _edges_ds(pairs):
    import ray.data

    src, dst = (list(x) for x in zip(*pairs)) if pairs else ([], [])
    return ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )


def _dense_pagerank(pairs, n, damping=0.85, iters=10):
    """Reference: dense power iteration with uniform dangling
    redistribution — the textbook formulation the operator must match."""
    outdeg = np.zeros(n)
    for s, _ in pairs:
        outdeg[s] += 1
    M = np.zeros((n, n))
    for s, d in pairs:
        M[d, s] = 1.0 / outdeg[s]
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[outdeg == 0].sum()
        r = (1 - damping) / n + damping * (M @ r + dangling / n)
    return r


@pytest.mark.usefixtures("ray_session")
def test_degree_table_counts():
    from scrappy_ray.functions.graph import degree_table

    ds = _edges_ds([(0, 1), (0, 2), (1, 2), (3, 0)])
    t = degree_table(ds).sort("node").take_all()
    got = {r["node"]: (r["out_degree"], r["in_degree"]) for r in t}
    assert got == {0: (2, 1), 1: (1, 1), 2: (0, 2), 3: (1, 0)}


@pytest.mark.usefixtures("ray_session")
def test_pagerank_ring_is_uniform():
    from scrappy_ray.functions.graph import pagerank

    n = 6
    ds = _edges_ds([(i, (i + 1) % n) for i in range(n)])
    out = pagerank(ds, iters=8, iter_round=None).sort("node").take_all()
    assert len(out) == n
    for r in out:
        assert r["rank"] == pytest.approx(1.0 / n, abs=1e-12)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_reference_with_dangling():
    """Graph with a dangling node (4) and a hub (0): distributed result
    must match the dense textbook iteration, including uniform
    redistribution of the dangling mass."""
    import ray.data

    from scrappy_ray.functions.graph import pagerank

    pairs = [(0, 1), (0, 2), (0, 3), (1, 0), (2, 0), (3, 4), (5, 0), (5, 4)]
    n = 6
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))
    got = pagerank(_edges_ds(pairs), nodes, iters=12, iter_round=None).sort("node").take_all()
    want = _dense_pagerank(pairs, n, iters=12)
    assert len(got) == n
    total = 0.0
    for r in got:
        assert r["rank"] == pytest.approx(want[r["node"]], abs=1e-9)
        total += r["rank"]
    assert total == pytest.approx(1.0, abs=1e-9)  # dangling mass conserved


@pytest.mark.usefixtures("ray_session")
def test_pagerank_derives_node_universe_from_edges():
    from scrappy_ray.functions.graph import pagerank

    pairs = [(7, 9), (9, 7), (9, 11)]  # 11 appears only as a dst
    out = pagerank(_edges_ds(pairs), iters=5, iter_round=None).sort("node").take_all()
    assert [r["node"] for r in out] == [7, 9, 11]
    want = {7: 0, 9: 1, 11: 2}
    dense = _dense_pagerank([(want[a], want[b]) for a, b in pairs], 3, iters=5)
    for r in out:
        assert r["rank"] == pytest.approx(dense[want[r["node"]]], abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_layout_invariance():
    """Same edge multiset split across different block layouts must give
    identical (rounded) ranks — the property the SQL oracle relies on."""
    import ray.data

    from scrappy_ray.functions.graph import pagerank

    rng = np.random.RandomState(7)
    n = 40
    src = rng.randint(0, n, 300).astype(np.int64)
    dst = (src * 13 + rng.randint(1, n, 300)) % n
    keep = src != dst
    t = pa.table({"src": pa.array(src[keep]), "dst": pa.array(dst[keep])})
    nodes = ray.data.from_arrow(pa.table({"node": pa.array(range(n), pa.int64())}))

    a = pagerank(ray.data.from_arrow(t), nodes, iters=6).sort("node").take_all()
    shards = [t.slice(0, 17), t.slice(17, 100), t.slice(117)]
    b = pagerank(ray.data.from_arrow(shards), nodes, iters=6).sort("node").take_all()
    assert [r["rank"] for r in a] == [r["rank"] for r in b]


def test_pagerank_local_path_bit_identical_to_distributed(ray_session):
    """The threshold-gated driver-side fast path must reproduce the
    distributed join+groupby iteration BIT-FOR-BIT in quantized mode
    (whole-unit sums are exact, hence order- and path-independent)."""
    import ray.data

    from scrappy_ray.functions.graph import pagerank

    rng = np.random.RandomState(3)
    src = rng.randint(0, 60, 300)
    dst = rng.randint(0, 60, 300)
    keep = src != dst
    edges = pa.table({"src": pa.array(src[keep], pa.int64()),
                      "dst": pa.array(dst[keep], pa.int64())})
    ds = ray.data.from_arrow(edges)
    a = pagerank(ds, iters=6).to_pandas().sort_values("node").reset_index(drop=True)
    b = (pagerank(ray.data.from_arrow(edges).repartition(5), iters=6,
                  force_distributed=True)
         .to_pandas().sort_values("node").reset_index(drop=True))
    assert a.equals(b)  # exact, not approx
