"""Crawl-equivalence tests (SURVEY.md §5): the Ray superstep crawler
must reproduce the single-threaded reference-semantics simulator
exactly — ordering, seen set, triples, byte-identical text — plus
politeness, robots, and checkpoint-resume behavior."""

import shutil

import pyarrow.dataset as pads
import pytest

from scrappy_ray.crawl.driver import CrawlConfig, run_crawl
from scrappy_ray.crawl.simulator import (
    fifo_reference_crawl,
    lookup_from_config,
    superstep_crawl_sim,
)
from scrappy_ray.sources.testgen import seed_urls


def sched_tuples(result):
    t = result.schedule_table()
    return list(zip(t["seq"].to_pylist(), t["url"].to_pylist(), t["depth"].to_pylist()))


def sim_tuples(sim):
    return [(r["seq"], r["url"], r["depth"]) for r in sim.schedule]


def exec_order(result):
    t = result.schedule_table().sort_by([("round", "ascending"), ("seq", "ascending")])
    return list(zip(t["round"].to_pylist(), t["seq"].to_pylist(), t["url"].to_pylist()))


def sim_exec_order(sim):
    return [(r["round"], r["seq"], r["url"]) for r in sim.schedule]


def sim_exec_sorted(sim):
    """(round, seq)-sorted sim schedule — the right comparison in
    priority mode, where within-round execution order is priority
    order, not seq order (the driver's schedule table carries no
    within-round order either way)."""
    return sorted(sim_exec_order(sim))


def test_fifo_equals_superstep(synth_web):
    cfg, kb = synth_web
    lookup = lookup_from_config(cfg)
    seeds = seed_urls(cfg)
    fifo = fifo_reference_crawl(lookup, kb, seeds, depth=-1)
    sup = superstep_crawl_sim(lookup, kb, seeds, depth=-1)
    assert sim_tuples(fifo) == sim_tuples(sup)
    assert fifo.seen == sup.seen
    assert set(fifo.triples) == set(sup.triples)


def test_fifo_equals_superstep_finite_depth(synth_web):
    cfg, kb = synth_web
    lookup = lookup_from_config(cfg)
    seeds = [f"http://site0.test/"]
    for depth in (0, 1, 2):
        fifo = fifo_reference_crawl(lookup, kb, seeds, depth=depth)
        sup = superstep_crawl_sim(lookup, kb, seeds, depth=depth)
        assert sim_tuples(fifo) == sim_tuples(sup), f"depth={depth}"


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1)
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
        )
    )
    assert sched_tuples(res) == sim_tuples(sup)
    ray_triples = {
        (r["s"], r["p"], r["o"], r["lit"])
        for r in pads.dataset(res.triples_path).to_table().to_pylist()
    }
    assert ray_triples == set(sup.triples)
    texts = {r["curl"]: r["text"] for r in pads.dataset(res.text_path).to_table().to_pylist()}
    for url, t in sup.texts.items():
        if t:
            assert texts[url] == t  # byte-identical extracted text


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_politeness_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1, host_budget=4
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            host_budget=4,
        )
    )
    assert exec_order(res) == sim_exec_order(sup)
    # politeness invariant: ≤ budget fetches per host per round
    t = res.schedule_table().to_pylist()
    from collections import Counter

    from scrappy_ray.support import complete_uri, host_of

    per = Counter((r["round"], host_of(complete_uri(r["url"]))) for r in t)
    hosty = {k: v for k, v in per.items() if k[1]}
    assert max(hosty.values()) <= 4


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_robots(synth_web, synth_pages_dir, tmp_path):
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1, robots=True
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            robots=True,
        )
    )
    assert sched_tuples(res) == sim_tuples(sup)
    # /private/ never scheduled
    assert not any("/private/" in r["url"] for r in res.schedule_table().to_pylist())


@pytest.mark.usefixtures("ray_session")
def test_crawl_resume_identical(synth_web, synth_pages_dir, tmp_path):
    """Kill after k rounds; resume must produce the identical schedule
    (checkpoint lineage, SURVEY.md §4)."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    full_dir = str(tmp_path / "full")
    part_dir = str(tmp_path / "part")
    mk = lambda d, rounds: CrawlConfig(
        pages_path=synth_pages_dir,
        kb_yaml=synth_kb_yaml(),
        seeds=seed_urls(cfg),
        ckpt_dir=d,
        depth=-1,
        num_buckets=4,
        extract_concurrency=2,
        max_rounds=rounds,
    )
    full = run_crawl(mk(full_dir, 50))
    run_crawl(mk(part_dir, 2))  # "killed" after 2 rounds
    resumed = run_crawl(mk(part_dir, 50))  # resume from manifest
    assert sched_tuples(resumed) == sched_tuples(full)
    full_triples = {
        tuple(r.values()) for r in pads.dataset(full.triples_path).to_table().to_pylist()
    }
    res_triples = {
        tuple(r.values()) for r in pads.dataset(resumed.triples_path).to_table().to_pylist()
    }
    assert full_triples == res_triples


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_cuckoo_seen_matches_exact(synth_web, synth_pages_dir, tmp_path):
    """The cuckoo-filter seen set (10^10 design point) reproduces the
    exact-set crawl on this corpus (no false positives at this load)."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1)
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            seen_mode="cuckoo",
            seen_capacity_per_shard=100_000,
        )
    )
    assert sched_tuples(res) == sim_tuples(sup)


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_bloom_seen_matches_exact(synth_web, synth_pages_dir, tmp_path):
    """The bloom-filter seen set (the north_star's named alternative to
    cuckoo) reproduces the exact-set crawl on this corpus, including
    delta-snapshot checkpointing through every round."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1)
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            seen_mode="bloom",
            seen_capacity_per_shard=100_000,
        )
    )
    assert sched_tuples(res) == sim_tuples(sup)


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_shuffle_path_matches(synth_web, synth_pages_dir, tmp_path):
    """Force the at-scale Dataset shuffle path (small_round_threshold=0)
    — must equal the driver-side fast path and the simulator."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1)
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            small_round_threshold=0,
        )
    )
    assert sched_tuples(res) == sim_tuples(sup)


@pytest.mark.usefixtures("ray_session")
def test_url_only_seen_mode(synth_web, synth_pages_dir, tmp_path):
    """url_only_seen (the 10^10 design point): a url is crawled once
    regardless of remaining depth — a superset-dedup of the reference's
    (url, depth) pairs."""
    cfg, kb = synth_web
    from collections import Counter

    from scrappy_ray.sources.testgen import synth_kb_yaml

    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=[f"http://site0.test/"],
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=4,
            num_buckets=4,
            extract_concurrency=2,
            url_only_seen=True,
        )
    )
    urls = [r["url"] for r in res.schedule_table().to_pylist()]
    assert urls and max(Counter(urls).values()) == 1


@pytest.mark.usefixtures("ray_session")
def test_crawl_resume_with_politeness_and_robots(synth_web, synth_pages_dir, tmp_path):
    """Resume restores seen-set deltas AND token-bucket state: a
    politeness+robots crawl killed mid-run must finish identically to
    an uninterrupted one (exercises budget snapshot restore)."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    mk = lambda d, rounds: CrawlConfig(
        pages_path=synth_pages_dir,
        kb_yaml=synth_kb_yaml(),
        seeds=seed_urls(cfg),
        ckpt_dir=d,
        depth=-1,
        num_buckets=4,
        extract_concurrency=2,
        host_budget=4,
        robots=True,
        max_rounds=rounds,
    )
    full = run_crawl(mk(str(tmp_path / "full"), 60))
    run_crawl(mk(str(tmp_path / "part"), 3))  # killed after 3 rounds
    resumed = run_crawl(mk(str(tmp_path / "part"), 60))
    assert exec_order(resumed) == exec_order(full)


@pytest.mark.usefixtures("ray_session")
def test_wide_seed_distributed_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    """The scaling-bench configuration — a wide fixed seed list (big
    rounds from round 0, production-frontier shape) with every adaptive
    driver-side threshold zeroed (all work in Ray workers) — must still
    reproduce the simulator's schedule exactly."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import host_url, synth_kb_yaml

    seeds = []
    for k in range(cfg.n_hosts):
        seeds.append(f"{host_url(k)}/")
        seeds.extend(f"{host_url(k)}/art/{i}" for i in range(3))
    sup = superstep_crawl_sim(lookup_from_config(cfg), kb, seeds, depth=-1)
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seeds,
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            small_round_threshold=0,
            driver_round_threshold=0,
            finalize_small_bytes=0,
        )
    )
    assert sched_tuples(res) == sim_tuples(sup)
    ray_triples = {
        (r["s"], r["p"], r["o"], r["lit"])
        for r in pads.dataset(res.triples_path).to_table().to_pylist()
    }
    assert ray_triples == set(sup.triples)


def test_priority_fn_arrow_py_parity():
    """The vectorized Arrow priority kernels must match the scalar
    simulator forms exactly (the parity the crawl tests rest on)."""
    import pyarrow as pa

    from scrappy_ray.crawl.priority import priority_arrow, priority_py

    urls = ["http://a.test/", "http://a.test/art/1", "http://b.test/x?ref=2", ""]
    depths = [3, 2, -1, 0]
    ua, da = pa.array(urls, pa.string()), pa.array(depths, pa.int32())
    for fn in ("short_url", "depth"):
        vec = priority_arrow(fn, ua, da).to_pylist()
        scalar = [priority_py(fn, u, d) for u, d in zip(urls, depths)]
        assert vec == scalar, fn


def test_priority_sim_reorders_but_visits_same_set(synth_web):
    """Priority mode changes the execution ORDER (short URLs first)
    but an exhaustive crawl still visits the identical (url, depth)
    set — scheduling is a reorder, never a drop."""
    cfg, kb = synth_web
    lookup = lookup_from_config(cfg)
    seeds = seed_urls(cfg)
    fifo = superstep_crawl_sim(lookup, kb, seeds, depth=-1, host_budget=3)
    prio = superstep_crawl_sim(
        lookup, kb, seeds, depth=-1, host_budget=3,
        frontier_order="priority", round_budget=8,
    )
    assert fifo.seen == prio.seen
    assert sim_exec_order(fifo) != sim_exec_order(prio)
    # round budget honored every round
    by_round: dict = {}
    for r in prio.schedule:
        by_round.setdefault(r["round"], []).append(r)
    for rows in by_round.values():
        assert len(rows) <= 8


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_priority_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    """Priority frontier, driver-side small path: per-host grants rank
    by (priority desc, seq) and the global round budget pops the best
    K granted rows — must equal the simulator exactly."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1,
        host_budget=4, frontier_order="priority", round_budget=10,
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            host_budget=4,
            frontier_order="priority",
            round_budget=10,
        )
    )
    assert exec_order(res) == sim_exec_sorted(sup)


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_round_budget_no_host_budget(synth_web, synth_pages_dir, tmp_path):
    """Round budget alone (no politeness): pure global top-K priority
    queue per superstep."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1,
        frontier_order="priority", round_budget=6,
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            frontier_order="priority",
            round_budget=6,
        )
    )
    assert exec_order(res) == sim_exec_sorted(sup)


@pytest.mark.usefixtures("ray_session")
def test_priority_distributed_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    """Priority frontier through the at-scale path: priority-ranked
    politeness marking in the external host-hash shuffle PLUS the
    distributed round-budget top-K (per-block partial top-K → one
    merge task → broadcast seq keep-set filters)."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1,
        host_budget=4, frontier_order="priority", round_budget=10,
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            host_budget=4,
            frontier_order="priority",
            round_budget=10,
            small_round_threshold=0,
            driver_round_threshold=0,
            finalize_small_bytes=0,
        )
    )
    assert exec_order(res) == sim_exec_sorted(sup)
    # budget-overflow rounds must take the FUSED mark (narrow top-K
    # pass + one full-row mark/spill per bucket), not the fallback mark
    # shuffle: the only 'marked' dir allowed is round 0's flat seed
    # frontier. (Overflow rounds DID occur — executed == budget.)
    import glob as _g

    assert any(r["executed"] == 10 and r["deferred"] > 0 for r in res.manifest["rounds"])
    marked = _g.glob(str(tmp_path / "ckpt" / "round-*" / "marked"))
    assert [m for m in marked if "round-0000" not in m] == []


@pytest.mark.usefixtures("ray_session")
def test_priority_resume_identical(synth_web, synth_pages_dir, tmp_path):
    """Checkpoint/resume in priority mode: the priority column survives
    the frontier parquet round-trip and deferred rows re-compete with
    their original (priority, seq)."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    mk = lambda d, rounds: CrawlConfig(
        pages_path=synth_pages_dir,
        kb_yaml=synth_kb_yaml(),
        seeds=seed_urls(cfg),
        ckpt_dir=d,
        depth=-1,
        num_buckets=4,
        extract_concurrency=2,
        host_budget=4,
        frontier_order="priority",
        round_budget=10,
        max_rounds=rounds,
    )
    full = run_crawl(mk(str(tmp_path / "full"), 80))
    run_crawl(mk(str(tmp_path / "part"), 3))  # killed after 3 rounds
    resumed = run_crawl(mk(str(tmp_path / "part"), 80))
    assert exec_order(resumed) == exec_order(full)


@pytest.mark.usefixtures("ray_session")
def test_politeness_distributed_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    """Politeness marking through the at-scale path (external host-hash
    shuffle + vectorized per-bucket rank-mark) must reproduce the
    simulator's (round, seq) execution order exactly."""
    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1, host_budget=4
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            host_budget=4,
            small_round_threshold=0,
            driver_round_threshold=0,
            finalize_small_bytes=0,
        )
    )
    assert exec_order(res) == sim_exec_order(sup)


@pytest.mark.usefixtures("ray_session")
def test_politeness_fused_mark_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    """Distributed politeness via the FUSED mark path (host-hash
    bucketed frontier → per-bucket rank-mark with defer-spill side
    effect, no mark shuffle / marked write): must equal the simulator,
    and the bucketed hb_* frontier layout must actually be produced
    (proving the fused branch ran, not the flat-frontier fallback)."""
    import glob
    import os

    cfg, kb = synth_web
    from scrappy_ray.sources.testgen import synth_kb_yaml

    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1, host_budget=4
    )
    ckpt = str(tmp_path / "ckpt")
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=ckpt,
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            host_budget=4,
            small_round_threshold=0,
            driver_round_threshold=0,
            mark_buckets=4,
        )
    )
    assert exec_order(res) == sim_exec_order(sup)
    hb = glob.glob(os.path.join(ckpt, "round-*", "frontier", "hb_*"))
    assert hb, "expected host-hash-bucketed frontier dirs (fused mark path)"


def test_priority_fn_host_rank_arrow_py_parity(tmp_path):
    """Table-backed host_rank priority: vectorized == scalar, unknown
    hosts and unparseable urls score 0."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrappy_ray.crawl.priority import priority_arrow, priority_py

    p = str(tmp_path / "scores.parquet")
    pq.write_table(pa.table({"host": ["a.test", "b.test"],
                             "score": [0.9, 0.2]}), p)
    fn = f"host_rank:{p}"
    urls = ["http://a.test/x", "http://b.test/", "http://c.test/y",
            "not-a-url", "https://a.test/deep/page?q=1"]
    depths = [1, 2, 3, 4, 5]
    ua = pa.array(urls, pa.string())
    da = pa.array(depths, pa.int32())
    vec = priority_arrow(fn, ua, da).to_pylist()
    scalar = [priority_py(fn, u, d) for u, d in zip(urls, depths)]
    assert vec == scalar == [0.9, 0.2, 0.0, 0.0, 0.9]


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_host_rank_matches_simulator(synth_web, synth_pages_dir, tmp_path):
    """host_rank priority frontier: the Ray crawl and the simulator
    must schedule identically when both read the same frozen
    (host, score) table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrappy_ray.sources.testgen import synth_kb_yaml

    cfg, kb = synth_web
    p = str(tmp_path / "scores.parquet")
    # deliberately invert natural order: the LAST host wins
    pq.write_table(pa.table({"host": ["site0.test", "site1.test", "site2.test"],
                             "score": [0.05, 0.1, 0.85]}), p)
    fn = f"host_rank:{p}"
    sup = superstep_crawl_sim(
        lookup_from_config(cfg), kb, seed_urls(cfg), depth=-1,
        host_budget=4, frontier_order="priority", round_budget=10,
        priority_fn=fn,
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=synth_pages_dir,
            kb_yaml=synth_kb_yaml(),
            seeds=seed_urls(cfg),
            ckpt_dir=str(tmp_path / "ckpt"),
            depth=-1,
            num_buckets=4,
            extract_concurrency=2,
            host_budget=4,
            frontier_order="priority",
            round_budget=10,
            priority_fn=fn,
        )
    )
    assert exec_order(res) == sim_exec_sorted(sup)


@pytest.mark.usefixtures("ray_session")
def test_host_rank_table_deterministic(synth_pages_dir, tmp_path):
    """host-level PageRank scores: valid distribution, deterministic
    across runs (quantized iteration), hub host ranked first."""
    from scrappy_ray.pipelines.rankcrawl import host_rank_table

    p1, p2 = str(tmp_path / "s1.parquet"), str(tmp_path / "s2.parquet")
    t1 = host_rank_table(synth_pages_dir, p1, iters=5)
    t2 = host_rank_table(synth_pages_dir, p2, iters=5)
    assert t1.equals(t2)
    scores = dict(zip(t1["host"].to_pylist(), t1["score"].to_pylist()))
    assert abs(sum(scores.values()) - 1.0) < 1e-6
    assert max(scores, key=scores.get) == "site0.test"


def _delay_web():
    """Two-host tiny web matching the synth KB's index shape:
    siteslow.test declares Crawl-delay 30, sitefast.test doesn't.
    Returns (pages dict url→html, seeds)."""
    pages = {}
    for host, delay in (("siteslow.test", "Crawl-delay: 30\n"), ("sitefast.test", "")):
        base = f"http://{host}"
        links = "".join(f'<a href="/a/{j}">a{j}</a>' for j in range(10))
        pages[f"{base}/"] = (
            f'<html><body><div class="pagination">{links}</div></body></html>'
        )
        pages[f"{base}/robots.txt"] = "User-agent: *\nDisallow: /private/\n" + delay
        for j in range(10):
            pages[f"{base}/a/{j}"] = f"<html><body><h2>p{j} of {host}</h2></body></html>"
    return pages, ["http://siteslow.test/", "http://sitefast.test/"]


def test_parse_robots_crawl_delay():
    from scrappy_ray.state.robots import parse_robots

    r = parse_robots("User-agent: *\nDisallow: /x/\nCrawl-delay: 12.5\n")
    assert r.crawl_delay == 12.5 and r.disallow == ["/x/"]
    # other agents' delay does not apply; junk value ignored
    assert parse_robots("User-agent: bot\nCrawl-delay: 9\n").crawl_delay is None
    assert parse_robots("User-agent: *\nCrawl-delay: soon\n").crawl_delay is None
    assert parse_robots(None).crawl_delay is None


@pytest.mark.usefixtures("ray_session")
def test_ray_crawl_robots_delay_matches_simulator(tmp_path):
    """robots Crawl-delay → per-host politeness rate: the Ray crawl
    (token-bucket shards with pushed overrides) must schedule exactly
    like the simulator's replicated buckets; the delayed host must
    execute at its reduced rate."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrappy_ray.kb import load_kb
    from scrappy_ray.sources.testgen import synth_kb_yaml

    pages, seeds = _delay_web()
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(
        pa.table({"url": list(pages), "html": [p.encode() for p in pages.values()]}),
        str(pdir / "pages.parquet"),
    )
    kb = load_kb(synth_kb_yaml())
    sup = superstep_crawl_sim(
        lambda u: pages.get(u), kb, seeds, depth=-1,
        host_budget=5, robots=True, robots_delay_round_s=60.0,
    )
    res = run_crawl(
        CrawlConfig(
            pages_path=str(pdir), kb_yaml=synth_kb_yaml(), seeds=seeds,
            ckpt_dir=str(tmp_path / "ckpt"), depth=-1, num_buckets=2,
            extract_concurrency=2, host_budget=5, robots=True,
            robots_delay_round_s=60.0,
        )
    )
    assert exec_order(res) == sim_exec_order(sup)
    # the delayed host runs at rate 2/round after the seed round
    t = res.schedule_table().to_pandas()
    slow = t[t.url.str.contains("siteslow.test")].groupby("round").size()
    fast = t[t.url.str.contains("sitefast.test")].groupby("round").size()
    assert slow.max() == 2 and fast.max() == 5
