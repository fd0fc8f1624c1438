"""Link-graph analytics over distributed edge lists: degrees + PageRank.

Why this lives here: the reference is a web crawler (SURVEY §2.4
C1–C11, reference `lib/scrappy/agent/agent.rb` crawl loop), and the
natural companion of a web-scale crawl is link-graph scoring — the
priority frontier (`crawl/priority.py`) consumes any per-URL score, and
PageRank over the discovered link graph is the canonical one
(Page/Brin/Motwani/Winograd 1998, "The PageRank citation ranking").

100 TB design notes
-------------------
- Edges are a Dataset of ``(src, dst)`` rows and never leave the
  cluster. Out-degrees are one groupby-count over src; the weighted
  edge table ``(src, dst, w=1/outdeg)`` is built by ONE distributed
  hash join and reused by every power iteration.
- Each iteration is: hash join (weighted edges ⋈ ranks on src) → a
  cheap vectorized multiply → union with the zero-contribution node
  base → one groupby-sum over dst. Two all-to-alls over O(E) rows per
  iteration — the unavoidable cost of topology-driven propagation —
  plus O(V) rank rows materialized in the object store between
  iterations (same order as the crawl seen-set; spillable). Driver
  state is scalars only (total rank / dangling mass), never a
  per-node structure.
- Dangling mass (rank held by zero-out-degree nodes) is redistributed
  uniformly. The dangler table is found ONCE (left-anti of nodes vs
  out-degrees); each iteration sums ranks over it — exactly zero work
  when the graph has no danglers.
- ``iter_round=k`` runs the iteration on exact integer unit ranks
  (multiples of 10^-k) with per-edge contributions rounded to whole
  units, making every groupby-sum order-independent — this is what
  makes a value-hash SQL oracle possible for an iterative float
  algorithm (see ``pagerank``'s docstring for the failure modes of
  plain per-iteration decimal rounding, all measured).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..common import drop_empty_blocks


def out_degrees(edges, src: str = "src"):
    """Per-source out-degree: one groupby-count. Columns: (src, out_degree)."""
    return edges.groupby(src).aggregate(Count(alias_name="out_degree"))


def degree_table(edges, src: str = "src", dst: str = "dst"):
    """Per-node in/out degree. One union + one groupby (no join): each
    edge contributes an (node, 1, 0) row for its src and (node, 0, 1)
    for its dst; missing directions come out as 0, so isolated-in-one-
    direction nodes appear without a second outer-join pass."""

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        one = pa.array([1] * n, pa.int64())
        zero = pa.array([0] * n, pa.int64())
        s = pa.table({"node": pc.cast(batch.column(src), pa.int64()), "out_d": one, "in_d": zero})
        d = pa.table({"node": pc.cast(batch.column(dst), pa.int64()), "out_d": zero, "in_d": one})
        return pa.concat_tables([s, d])

    return (
        edges.map_batches(explode, batch_format="pyarrow")
        .groupby("node")
        .aggregate(Sum("out_d", alias_name="out_degree"), Sum("in_d", alias_name="in_degree"))
    )


def weighted_edges(edges, src: str = "src", dst: str = "dst", num_partitions: int = 8):
    """(src, dst, w=1.0/outdeg(src)) — the join is done ONCE here and the
    result reused by every PageRank iteration (10 iterations over 100 TB
    of edges must not pay 10 degree joins)."""
    deg = out_degrees(edges, src)

    def weigh(batch: pa.Table) -> pa.Table:
        w = pc.divide(pa.scalar(1.0), pc.cast(batch.column("out_degree"), pa.float64()))
        return pa.table(
            {
                "src": pc.cast(batch.column(src), pa.int64()),
                "dst": pc.cast(batch.column(dst), pa.int64()),
                "w": w,
            }
        )

    joined = drop_empty_blocks(edges).join(
        drop_empty_blocks(deg), join_type="inner", num_partitions=num_partitions, on=(src,)
    )
    return joined.map_batches(weigh, batch_format="pyarrow")


def pagerank(
    edges,
    nodes=None,
    *,
    damping: float = 0.85,
    iters: int = 10,
    iter_round: int | None = 9,
    src: str = "src",
    dst: str = "dst",
    node_col: str = "node",
    num_partitions: int = 8,
    small_graph_threshold: int = 2_000_000,
    force_distributed: bool = False,
):
    """Distributed PageRank power iteration; returns (node, rank) with
    Σ rank ≈ 1. ``nodes`` is the node universe (Dataset with
    ``node_col``); when None it is derived as distinct(src ∪ dst) —
    one extra shuffle, so pass it when the caller already knows it
    (a crawl knows its URL universe from the seen-set).

    rank'(v) = (1−d)/n + d·(Σ_{u→v} rank(u)/outdeg(u) + dangling/n)

    ``iter_round=k`` switches to QUANTIZED iteration for cross-engine /
    cross-run bit-reproducibility (the SQL-oracle mode): ranks are
    stored as exact integer multiples of 10^-k ("units") and every edge
    contribution is rounded to a whole unit BEFORE the groupby-sum.
    Integer sums below 2^53 are exact and therefore ORDER-INDEPENDENT —
    plain float sums differ in the last ulp between engines/block
    layouts, and a 1-ulp difference at a quantization tie (common here:
    w = 1/2 or 1/4 puts contributions exactly on half-unit boundaries)
    flips a rank and cascades. Cost: ≤½ unit of mass leak per edge per
    iteration (10^-9 relative at k=9) — irrelevant to ranking.
    ``iter_round=None`` is the textbook float iteration.

    When BOTH node and edge counts fit ``small_graph_threshold`` the
    iteration runs on driver-side numpy arrays instead of 10×(hash
    join + groupby) Ray jobs — at toy/bench scale the per-job actor
    startup dominates by 10×+, and the quantized math makes the two
    paths BIT-IDENTICAL (whole-unit float64 sums are exact and
    order-independent; parity-tested). ``force_distributed=True``
    zeroes the gate — the same pattern as the crawl driver's
    small-round thresholds.
    """
    # the edge pipeline is consumed up to three times (node derivation,
    # the small-graph gate's count, and whichever iteration path runs);
    # materialize once so a lazy upstream (e.g. an extraction pass)
    # doesn't re-execute per consumer. Peak object-store residency is
    # unchanged: edges and the weighted table coexist during the join
    # either way.
    edges = edges.materialize()
    if nodes is None:

        def both_ends(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    node_col: pa.concat_arrays(
                        [
                            pc.cast(batch.column(src), pa.int64()).combine_chunks(),
                            pc.cast(batch.column(dst), pa.int64()).combine_chunks(),
                        ]
                    )
                }
            )

        nodes = (
            edges.map_batches(both_ends, batch_format="pyarrow")
            .groupby(node_col)
            .aggregate(Count(alias_name="_c"))
            .select_columns([node_col])
        )

    # Zero-contribution base rows: unioned into every iteration's
    # groupby so nodes with no in-links keep a row (teleport-only rank)
    # without a per-iteration outer join.
    def zero_part(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(batch.column(node_col), pa.int64()),
                "part": pa.array([0.0] * batch.num_rows, pa.float64()),
            }
        )

    zeros = nodes.map_batches(zero_part, batch_format="pyarrow").materialize()
    n = zeros.count()
    if n == 0:
        return ray.data.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "rank": pa.array([], pa.float64())})
        )

    if (
        not force_distributed
        and n <= small_graph_threshold
        and edges.count() <= small_graph_threshold
    ):
        # gate BEFORE weighted_edges: the out-degree join is itself a
        # distributed job the local path replaces with one bincount
        return _pagerank_local(zeros, edges, src, dst, n, damping, iters, iter_round)

    we = weighted_edges(edges, src, dst, num_partitions).materialize()

    # Dangling mass is computed STRUCTURALLY — the unit-sum of nodes
    # with outdeg 0, found ONCE up front — never as a float difference
    # of totals (in quantized mode the per-edge rounding leak would be
    # indistinguishable from real dangling mass, and in float mode a
    # noise threshold would be needed). The per-iteration cost is one
    # join against the (usually tiny or empty) dangler table.
    danglers = (
        drop_empty_blocks(zeros)
        .join(
            drop_empty_blocks(we.groupby("src").aggregate(Count(alias_name="_d"))),
            join_type="left_outer",
            num_partitions=num_partitions,
            on=("node",),
            right_on=("src",),
        )
        .map_batches(
            lambda b: b.filter(pc.is_null(b.column("_d"))).select(["node"]),
            batch_format="pyarrow",
        )
        .materialize()
    )
    # the filter leaves 0-row (schema-degraded) blocks that break the
    # per-iteration join's right-side key resolution — drop them once
    danglers = drop_empty_blocks(danglers)
    n_danglers = danglers.count()

    quant = iter_round is not None
    scale = 10.0 ** iter_round if quant else 1.0
    # the "rank" column holds exact integer UNITS in quantized mode
    init = scale / n
    teleport = ((1.0 - damping) / n) * scale

    def seed(batch: pa.Table) -> pa.Table:
        r = pa.array([init] * batch.num_rows, pa.float64())
        if quant:
            r = pc.round(r, ndigits=0, round_mode="half_towards_infinity")
        return pa.table({"node": batch.column("node"), "rank": r})

    ranks = zeros.map_batches(seed, batch_format="pyarrow").materialize()

    for _ in range(iters):
        contrib = drop_empty_blocks(we).join(
            drop_empty_blocks(ranks),
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("node",),
        )

        def part(batch: pa.Table) -> pa.Table:
            p = pc.multiply(batch.column("w"), batch.column("rank"))
            if quant:  # whole units: exact int64-range doubles sum exactly
                p = pc.round(p, ndigits=0, round_mode="half_towards_infinity")
            return pa.table({"node": batch.column("dst"), "part": p})

        parts = (
            contrib.map_batches(part, batch_format="pyarrow")
            .union(zeros)
            .groupby("node")
            .aggregate(Sum("part", alias_name="contrib"))
            .materialize()
        )
        dangling = 0.0
        if n_danglers:
            dangling = (
                drop_empty_blocks(ranks)
                .join(
                    danglers,
                    join_type="inner",
                    num_partitions=num_partitions,
                    on=("node",),
                )
                .sum("rank")
                or 0.0
            )
        bump = teleport + damping * dangling / n

        def update(batch: pa.Table) -> pa.Table:
            r = pc.add(
                pa.scalar(bump), pc.multiply(pa.scalar(damping), batch.column("contrib"))
            )
            if quant:
                r = pc.round(r, ndigits=0, round_mode="half_towards_infinity")
            return pa.table({"node": batch.column("node"), "rank": r})

        ranks = parts.map_batches(update, batch_format="pyarrow").materialize()

    if not quant:
        return ranks

    def unscale(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node"),
                "rank": pc.divide(batch.column("rank"), pa.scalar(scale)),
            }
        )

    return ranks.map_batches(unscale, batch_format="pyarrow")


def _pagerank_local(zeros, edges, src: str, dst: str, n: int, damping: float,
                    iters: int, iter_round: int | None):
    """Small-graph fast path: the SAME iteration as the distributed
    loop on driver-side numpy arrays (threshold-gated by the caller).
    Bit-identical to the distributed path in quantized mode: per-edge
    contributions round to whole units BEFORE the sum, whole-unit
    float64 sums are exact (≤ 2^53) hence order-independent, the edge
    weight is the identical ``1.0 / outdeg`` double, and the bump
    expression reuses the identical float expression order. All ranks
    are positive, so half-away-from-zero == floor(x + 0.5)."""
    ztbl = pa.concat_tables(zeros.iter_batches(batch_format="pyarrow"))
    nodes = np.sort(
        np.asarray(pc.cast(ztbl.column("node"), pa.int64()), dtype=np.int64)
    )
    etbl = pa.concat_tables(edges.iter_batches(batch_format="pyarrow"))
    s = np.asarray(pc.cast(etbl.column(src), pa.int64()), dtype=np.int64)
    d = np.asarray(pc.cast(etbl.column(dst), pa.int64()), dtype=np.int64)
    si = np.searchsorted(nodes, s)
    di = np.searchsorted(nodes, d)
    outdeg = np.bincount(si, minlength=n).astype(np.float64)
    w = 1.0 / outdeg[si]  # same double as weighted_edges' 1.0/outdeg
    dangler = np.ones(n, bool)
    dangler[si] = False

    quant = iter_round is not None
    scale = 10.0 ** iter_round if quant else 1.0
    init = scale / n
    teleport = ((1.0 - damping) / n) * scale

    def rnd(x):
        return np.floor(x + 0.5) if quant else x

    r = np.full(n, rnd(np.float64(init)), np.float64)
    for _ in range(iters):
        pe = rnd(w * r[si])
        contrib = np.bincount(di, weights=pe, minlength=n)
        dangling = float(r[dangler].sum()) if dangler.any() else 0.0
        bump = teleport + damping * dangling / n
        r = rnd(bump + damping * contrib)

    out = r / scale if quant else r
    return ray.data.from_arrow(
        pa.table({"node": pa.array(nodes, pa.int64()),
                  "rank": pa.array(out, pa.float64())})
    )


def reciprocity_table(edges, src: str = "src", dst: str = "dst",
                      num_partitions: int = 8, digits: int = 6):
    """Per-node link reciprocity over a directed edge list: of a node's
    distinct out-links, how many link BACK — the classic link-spam /
    mirror-ring signal (link farms reciprocate near 1.0; organic webs
    sit far lower), a direct companion of the authority scores above
    for crawl prioritization. Output one row per node with out-links:
    ``(node, n_out, n_reciprocal, reciprocity)``.

    Scale shape (100 TB edge list): DISTINCT edges is one hash
    aggregate; the reciprocal set is ONE distributed hash join of the
    distinct edges against their own reversal on the compound
    (src, dst) key — O(E) both sides, no driver state. Per-node counts
    then come from a UNION + one groupby-sum (the ``degree_table``
    no-join trick): edge rows tag (o=1, r=0), reciprocal-survivor rows
    tag (o=0, r=1) — no second join, and a graph with ZERO reciprocal
    pairs degrades to an empty union arm rather than an empty join
    side (a 0-row groupby output loses its schema in Ray 2.49 and
    would poison a join's key resolution).
    """
    uniq = edges.groupby([src, dst]).count().drop_columns(["count()"]) \
                .materialize()  # feeds both union arms below

    def swap(batch: pa.Table) -> pa.Table:
        return pa.table({src: batch.column(dst), dst: batch.column(src)})

    rev = uniq.map_batches(swap, batch_format="pyarrow")
    recip_edges = drop_empty_blocks(uniq).join(
        drop_empty_blocks(rev), "inner", num_partitions, on=(src, dst))

    def tag(o: int, r: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return pa.table({
                "node": pc.cast(batch.column(src), pa.int64()),
                "o": pa.array(np.full(n, o, np.int64)),
                "r": pa.array(np.full(n, r, np.int64)),
            })
        return f

    out = (
        uniq.map_batches(tag(1, 0), batch_format="pyarrow")
        .union(recip_edges.map_batches(tag(0, 1), batch_format="pyarrow"))
        .groupby("node")
        .aggregate(Sum("o", alias_name="n_out"),
                   Sum("r", alias_name="n_reciprocal"))
    )

    def finalize(batch: pa.Table) -> pa.Table:
        n = pc.cast(batch.column("n_out"), pa.int64())
        r = pc.cast(pc.fill_null(batch.column("n_reciprocal"), 0), pa.int64())
        ratio = pc.round(
            pc.divide(pc.cast(r, pa.float64()), pc.cast(n, pa.float64())),
            ndigits=digits, round_mode="half_towards_infinity")
        return pa.table({
            "node": pc.cast(batch.column("node"), pa.int64()),
            "n_out": n,
            "n_reciprocal": r,
            "reciprocity": ratio,
        })

    return out.map_batches(finalize, batch_format="pyarrow")


def _triangles_local(a: np.ndarray, b: np.ndarray) -> pa.Table:
    """Driver-side triangle counting over canonical (a < b) distinct
    edges: degree-oriented neighbor lists + one np.intersect1d per
    edge — O(E·d̄·log d̄), no Ray jobs. Same output as the distributed
    path (parity-tested)."""
    nodes, codes = np.unique(np.concatenate([a, b]), return_inverse=True)
    ca, cb = codes[: len(a)], codes[len(a):]
    deg = np.bincount(codes, minlength=len(nodes))
    # orient low (deg, id) -> high; node codes are id-ordered already
    key = deg.astype(np.int64) * (len(nodes) + 1) + np.arange(len(nodes))
    a_low = key[ca] <= key[cb]
    u = np.where(a_low, ca, cb)
    v = np.where(a_low, cb, ca)
    order = np.argsort(u, kind="stable")
    u, v = u[order], v[order]
    starts = np.flatnonzero(np.r_[True, u[1:] != u[:-1]])
    ends = np.r_[starts[1:], len(u)]
    nbr = {int(u[s]): np.sort(v[s:e]) for s, e in zip(starts, ends)}
    tri = np.zeros(len(nodes), np.int64)
    for x, ys in nbr.items():
        for y in ys:
            common = np.intersect1d(ys, nbr.get(int(y), _EMPTY_I64),
                                    assume_unique=True)
            if len(common):
                tri[x] += len(common)
                tri[int(y)] += len(common)
                np.add.at(tri, common, 1)
    hit = tri > 0
    return pa.table({
        "node": pa.array(nodes[hit], pa.int64()),
        "n_triangles": pa.array(tri[hit], pa.int64()),
    })


_EMPTY_I64 = np.zeros(0, np.int64)


def triangle_counts(edges, src: str = "src", dst: str = "dst",
                    num_partitions: int = 8,
                    small_graph_threshold: int = 1_000_000,
                    force_distributed: bool = False):
    """Per-node triangle participation counts over the UNDIRECTED
    distinct edge set — the classic cohesion / link-farm density
    signal. Output ``(node, n_triangles)`` for every node in ≥1
    triangle.

    Scale shape: the naive wedge join explodes quadratically on hub
    nodes, so edges are DEGREE-ORIENTED first (each undirected edge
    points from its lower-(degree, id) endpoint to the higher — the
    standard O(E^1.5) total-wedge bound; Suri & Vassilvitskii 2011
    "Counting triangles and the curse of the last reducer"): wedges
    join oriented edges with themselves on the shared LOW endpoint, so
    a hub of degree D contributes wedges only through neighbors that
    outrank it, not D². Every triangle is found exactly once (at its
    unique lowest-oriented vertex); the per-node counts are therefore
    orientation-independent and match the id-ordered SQL enumeration.
    Three distributed hash joins, one union explode, one groupby —
    no driver state beyond plans."""

    def canon(batch: pa.Table) -> pa.Table:
        s = pc.cast(batch.column(src), pa.int64())
        d = pc.cast(batch.column(dst), pa.int64())
        a, b = pc.min_element_wise(s, d), pc.max_element_wise(s, d)
        t = pa.table({"a": a, "b": b})
        return t.filter(pc.not_equal(t.column("a"), t.column("b")))

    und = (edges.map_batches(canon, batch_format="pyarrow")
           .groupby(["a", "b"]).count().drop_columns(["count()"])
           .materialize())  # feeds degrees, orientation and the close join

    if not force_distributed and und.count() <= small_graph_threshold:
        # toy/medium graphs: the three distributed joins cost ~9 s of
        # per-job overhead on a 13k-edge graph (measured, bench r4s4)
        # that one driver-side pass replaces — the pagerank local-path
        # precedent; the distinct edge set is small by the gate
        import pyarrow as _pa

        t = _pa.concat_tables(list(und.iter_batches(batch_format="pyarrow")))
        if t.num_rows == 0:
            return ray.data.from_arrow(pa.table({
                "node": pa.array([], pa.int64()),
                "n_triangles": pa.array([], pa.int64())}))
        return ray.data.from_arrow(_triangles_local(
            np.asarray(pc.cast(t.column("a"), pa.int64()), dtype=np.int64),
            np.asarray(pc.cast(t.column("b"), pa.int64()), dtype=np.int64)))

    def endpoints(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            batch.column("a").combine_chunks().cast(pa.int64()),
            batch.column("b").combine_chunks().cast(pa.int64())])})

    deg = (und.map_batches(endpoints, batch_format="pyarrow")
           .groupby("node").count()
           .map_batches(lambda t: t.rename_columns(["node", "deg"]),
                        batch_format="pyarrow"))

    def ren(cols: list[str]):
        return lambda t: t.rename_columns(cols)

    da = deg.map_batches(ren(["a", "deg_a"]), batch_format="pyarrow")
    db = deg.map_batches(ren(["b", "deg_b"]), batch_format="pyarrow")
    withdeg = drop_empty_blocks(
        drop_empty_blocks(und).join(drop_empty_blocks(da), "inner",
                                    num_partitions, on=("a",))
    ).join(drop_empty_blocks(db), "inner", num_partitions, on=("b",))

    def orient(batch: pa.Table) -> pa.Table:
        a = np.asarray(pc.cast(batch.column("a"), pa.int64()))
        b = np.asarray(pc.cast(batch.column("b"), pa.int64()))
        dga = np.asarray(pc.cast(batch.column("deg_a"), pa.int64()))
        dgb = np.asarray(pc.cast(batch.column("deg_b"), pa.int64()))
        # low endpoint u by (deg, id); a<b already, so ties go to a
        a_low = dga <= dgb
        return pa.table({"u": pa.array(np.where(a_low, a, b)),
                         "v": pa.array(np.where(a_low, b, a))})

    ori = withdeg.map_batches(orient, batch_format="pyarrow").materialize()

    w2 = ori.map_batches(ren(["u", "w"]), batch_format="pyarrow")
    wedges = drop_empty_blocks(ori).join(
        drop_empty_blocks(w2), "inner", num_partitions, on=("u",))

    def ordered(batch: pa.Table) -> pa.Table:
        # one candidate per unordered neighbor pair; id order matches
        # the canonical (a, b) key of the closing edge
        v = np.asarray(pc.cast(batch.column("v"), pa.int64()))
        w = np.asarray(pc.cast(batch.column("w"), pa.int64()))
        u = np.asarray(pc.cast(batch.column("u"), pa.int64()))
        m = v < w
        return pa.table({"u": pa.array(u[m]),
                         "a": pa.array(np.minimum(v, w)[m]),
                         "b": pa.array(np.maximum(v, w)[m])})

    empty = pa.table({"node": pa.array([], pa.int64()),
                      "n_triangles": pa.array([], pa.int64())})
    cand = wedges.map_batches(ordered, batch_format="pyarrow").materialize()
    if cand.count() == 0:
        # a wedge-free (or triangle-free-by-construction) graph: joining
        # an all-empty side poisons Arrow key resolution (0-row blocks
        # lose their schema in Ray 2.49), so short-circuit the typed
        # empty result instead
        return ray.data.from_arrow(empty)
    tris = drop_empty_blocks(cand).join(
        drop_empty_blocks(und), "inner", num_partitions, on=("a", "b"))
    tris = tris.materialize()
    if tris.count() == 0:
        return ray.data.from_arrow(empty)

    def explode3(batch: pa.Table) -> pa.Table:
        return pa.table({"node": pa.concat_arrays([
            batch.column(c).combine_chunks().cast(pa.int64())
            for c in ("u", "a", "b")])})

    return (tris.map_batches(explode3, batch_format="pyarrow")
            .groupby("node").count()
            .map_batches(ren(["node", "n_triangles"]),
                         batch_format="pyarrow")
            .sort("node"))


def resolve_pointers(edges, src: str = "src", dst: str = "dst",
                     max_iters: int = 32, num_partitions: int = 8):
    """Terminal resolution over an acyclic pointer table — redirect
    chains (HTTP 301 graphs a crawler accumulates), alias tables,
    union-find parent arrays: for every ``src`` the final node reached
    by following pointers, plus the hop count.

    Pointer doubling (the Wyllie-style list-ranking jump): each round
    joins the label table AGAINST ITSELF on (cur == src), so unresolved
    chain length HALVES per round — a length-L chain resolves in
    ⌈log2 L⌉ all-to-alls instead of L. Per round: one inner join
    (advance), one left-anti (rows already at a terminal), one union;
    labels stay O(V) rows of three int64s in the object store and the
    driver holds only the moved-row count. Cycles would never resolve —
    ``max_iters`` guards; callers feed acyclic pointer sets.
    """
    import ray.data

    from ..common import drop_empty_blocks

    def init(batch: pa.Table) -> pa.Table:
        return pa.table({
            "src": pc.cast(batch.column(src), pa.int64()),
            "cur": pc.cast(batch.column(dst), pa.int64()),
            "hops": pa.array(np.ones(batch.num_rows, np.int64)),
        })

    labels = drop_empty_blocks(
        edges.map_batches(init, batch_format="pyarrow")).materialize()

    def as_map(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["m_src", "m_cur", "m_hops"])

    for _ in range(max_iters):
        pmap = labels.map_batches(as_map, batch_format="pyarrow")
        moved = drop_empty_blocks(labels).join(
            drop_empty_blocks(pmap), "inner", num_partitions,
            on=("cur",), right_on=("m_src",))
        if moved.count() == 0:
            break

        def advance(batch: pa.Table) -> pa.Table:
            return pa.table({
                "src": batch.column("src"),
                "cur": batch.column("m_cur"),
                "hops": pc.add(batch.column("hops"),
                               batch.column("m_hops")),
            })

        done = drop_empty_blocks(labels).join(
            drop_empty_blocks(pmap), "left_anti", num_partitions,
            on=("cur",), right_on=("m_src",))
        labels = (
            moved.map_batches(advance, batch_format="pyarrow")
            .union(done.select_columns(["src", "cur", "hops"]))
            .materialize()
        )

    def final(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["src", "final", "hops"])

    return labels.map_batches(final, batch_format="pyarrow").sort("src")


def bfs_depths(edges, seeds, src: str = "src", dst: str = "dst",
               seed_col: str = "v", max_rounds: int = 64,
               num_partitions: int = 8):
    """Multi-source BFS over a directed edge Dataset: minimum hop
    count from ANY seed to every reachable node — the crawl-depth /
    link-distance primitive (how far is each page from the seed list).

    Classic frontier expansion on the data plane: each round joins the
    current frontier against the edge table (one all-to-all over
    O(frontier-adjacent edges)), dedups candidate nodes with a
    min-depth hash aggregate, and anti-joins against the visited label
    table so every node is expanded EXACTLY once — total work is
    O(E + V·rounds) rows shuffled across ≤ diameter rounds. Labels
    live in the object store; the driver sees only per-round counts.
    """
    import ray.data

    from ..common import drop_empty_blocks

    def as_labels(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(seed_col), pa.int64())
        return pa.table({"v": v, "depth": pa.array(
            np.zeros(len(v), np.int64))})

    labels = drop_empty_blocks(
        seeds.map_batches(as_labels, batch_format="pyarrow")).materialize()
    frontier = labels

    for _ in range(max_rounds):
        def ren_edge(batch: pa.Table) -> pa.Table:
            return pa.table({
                "e_src": pc.cast(batch.column(src), pa.int64()),
                "e_dst": pc.cast(batch.column(dst), pa.int64()),
            })

        nxt = drop_empty_blocks(frontier).join(
            drop_empty_blocks(edges.map_batches(ren_edge,
                                                batch_format="pyarrow")),
            "inner", num_partitions, on=("v",), right_on=("e_src",))
        if nxt.count() == 0:
            break

        def step(batch: pa.Table) -> pa.Table:
            return pa.table({
                "v": batch.column("e_dst"),
                "depth": pc.add(batch.column("depth"),
                                pa.scalar(1, pa.int64())),
            })

        # min-depth per candidate (a node can arrive from several
        # frontier parents in the same round), then drop already-
        # visited nodes
        cand = (nxt.map_batches(step, batch_format="pyarrow")
                .groupby("v").min("depth")
                .map_batches(lambda t: t.rename_columns(["v", "depth"]),
                             batch_format="pyarrow"))
        new = drop_empty_blocks(cand).join(
            drop_empty_blocks(labels), "left_anti", num_partitions,
            on=("v",)).materialize()
        if new.count() == 0:
            break
        labels = labels.union(new).materialize()
        frontier = new

    return labels.sort("v")


def component_sizes(edges, nodes, node_col: str = "doc_id",
                    src: str = "src", dst: str = "dst",
                    num_partitions: int = 8):
    """Connected-component sizes of an undirected graph: reuses the
    distributed min-label propagation from the dedup family
    (functions/dedup.py::connected_components_distributed — Kiveris et
    al.'s MapReduce CC as join + union + groupby-Min; converges in
    O(component diameter) rounds, every step a Dataset op). Nodes that
    appear in no edge become their own singleton component via a
    left-outer join (coalesce root ← id) — the node table streams, the
    label table shuffles O(nodes), nothing gathers to the driver.
    Returns an O(components) table (root, size) sorted by root."""
    from .dedup import connected_components_distributed

    pairs = edges.map_batches(
        lambda t: pa.table({"id_a": t.column(src), "id_b": t.column(dst)}),
        batch_format="pyarrow")
    labels = connected_components_distributed(pairs)
    nds = nodes.map_batches(
        lambda t: pa.table({"id": pc.cast(t.column(node_col), pa.int64())}),
        batch_format="pyarrow")
    joined = drop_empty_blocks(nds).join(
        drop_empty_blocks(labels), "left_outer", num_partitions,
        on=("id",))

    def coalesce(batch: pa.Table) -> pa.Table:
        root = pc.coalesce(pc.cast(batch.column("root"), pa.int64()),
                           pc.cast(batch.column("id"), pa.int64()))
        return pa.table({"root": root})

    sizes = (joined.map_batches(coalesce, batch_format="pyarrow")
             .groupby("root").count())
    return sizes.map_batches(
        lambda t: t.rename_columns(["root", "size"]),
        batch_format="pyarrow").sort("root")
