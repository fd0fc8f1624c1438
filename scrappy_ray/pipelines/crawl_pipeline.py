"""End-to-end extraction pipelines over a pages table (the §7.3
"minimum slice": read → map_batches(ExtractorActor) → outputs), plus
the full crawl job wrapper used by the query surface.

The synthetic web used by these pipelines is generated deterministically
under /tmp (BASELINE.json input_hint shape); scale is keyed by name."""

from __future__ import annotations

import os

import pyarrow as pa

from ..sources.testgen import SynthWebConfig, generate_parquet, seed_urls, synth_kb_yaml
from ..stages.extract_stage import ExtractPages

_SCALES = {
    # sf dir name → synthetic web size (hosts, pages/host)
    "sf0.001": SynthWebConfig(n_hosts=3, pages_per_host=12),
    "sf0.01": SynthWebConfig(n_hosts=4, pages_per_host=25),
    "sf0.1": SynthWebConfig(n_hosts=8, pages_per_host=400),
    # the bench/scaling corpus: big enough that extraction compute
    # dominates fixed per-job overhead at 32 CPUs (~640k pages)
    "bench": SynthWebConfig(n_hosts=16, pages_per_host=40_000),
    "bench160": SynthWebConfig(n_hosts=16, pages_per_host=10_000),
}
_DEFAULT = SynthWebConfig(n_hosts=3, pages_per_host=12)


def synth_cfg_for(sf_dir: str) -> SynthWebConfig:
    name = os.path.basename(os.path.normpath(sf_dir))
    return _SCALES.get(name, _DEFAULT)


def pages_dir_for(sf_dir: str, use_ray: bool = False) -> str:
    cfg = synth_cfg_for(sf_dir)
    d = f"/tmp/scrappy_ray_pages/{os.path.basename(os.path.normpath(sf_dir))}-{cfg.n_hosts}x{cfg.pages_per_host}"
    if not os.path.exists(os.path.join(d, "_DONE")):
        generate_parquet(cfg, d, use_ray=use_ray)
        with open(os.path.join(d, "_DONE"), "w") as f:
            f.write("ok")
    return d


def extract_all(pages_path: str, kb_yaml: str | None = None, concurrency: int | None = None,
                batch_size: int = 64, depth: int = -1, use_actors: bool = False):
    """Whole-table extraction (no frontier): every page through the
    extraction stage. Columns pruned at the read (url, html).

    Default is task-based (process-cached KB — uses every CPU, no
    actor-pool startup); pass ``use_actors=True`` for the actor-pool
    variant (the right shape when per-worker state is heavy, e.g. a
    model)."""
    import ray.data

    ds = ray.data.read_parquet(pages_path, columns=["url", "html"])

    def prep(batch: pa.Table) -> pa.Table:
        urls = batch.column("url")
        n = batch.num_rows
        return pa.table(
            {
                "url": urls,
                "curl": urls,
                "depth": pa.array([depth] * n, pa.int32()),
                "seq": pa.array(range(n), pa.int64()),
                "round": pa.array([0] * n, pa.int32()),
                "html": batch.column("html"),
            }
        )

    prepped = ds.map_batches(prep, batch_format="pyarrow")
    yaml_text = kb_yaml or synth_kb_yaml()
    if use_actors:
        return prepped.map_batches(
            ExtractPages,
            fn_constructor_kwargs={"kb_yaml": yaml_text},
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=batch_size,
            concurrency=concurrency or 4,
        )
    from ..stages.extract_stage import make_extract_fn

    return prepped.map_batches(
        make_extract_fn(yaml_text),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def triples_table(pages_path: str, **kw):
    """(url, s, p, o, lit) cleaned triples for every page."""
    from ..crawl.driver import _explode_clean_triples

    ex = extract_all(pages_path, **kw)

    def explode(batch: pa.Table) -> pa.Table:
        # vectorized: flatten list<struct>, repeat the doc url by list
        # length, mask the engine-internal type markers, then per-doc
        # distinct via an Arrow group_by (each doc appears in exactly
        # one input row, so within-batch distinct == per-doc distinct)
        import numpy as np
        import pyarrow.compute as pc

        from ..crawl.driver import _CLEAN_DROP_TYPES

        col = batch.column("triples")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        lens = pc.list_value_length(col).fill_null(0).to_numpy(zero_copy_only=False)
        if not int(lens.sum()):
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "s": pa.array([], pa.string()),
                    "p": pa.array([], pa.string()),
                    "o": pa.array([], pa.string()),
                    "lit": pa.array([], pa.bool_()),
                }
            )
        urls = batch.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        url_rep = urls.take(pa.array(np.repeat(np.arange(batch.num_rows), lens), pa.int64()))
        flat = pc.list_flatten(col)
        s, p, o, lit = flat.field("s"), flat.field("p"), flat.field("o"), flat.field("lit")
        drop = pc.and_(pc.equal(p, "rdf:type"), pc.is_in(o, value_set=_CLEAN_DROP_TYPES))
        keep = pc.invert(pc.fill_null(drop, False))
        t = pa.table(
            {
                "url": pc.cast(url_rep.filter(keep), pa.string()),
                "s": pc.cast(s.filter(keep), pa.string()),
                "p": pc.cast(p.filter(keep), pa.string()),
                "o": pc.cast(o.filter(keep), pa.string()),
                "lit": pc.cast(lit.filter(keep), pa.bool_()),
            }
        )
        return t.group_by(["url", "s", "p", "o", "lit"]).aggregate([])

    return ex.map_batches(explode, batch_format="pyarrow")


def text_table(pages_path: str, **kw):
    ex = extract_all(pages_path, **kw)
    return ex.filter(expr="fetched == True").select_columns(["url", "text"])


def crawl_job(sf_dir: str, ckpt_dir: str, depth: int = -1, host_budget=None, robots=False,
              concurrency: int = 4, seen_mode: str = "exact", num_buckets: int | None = None,
              max_rounds: int = 100, small_round_threshold: int | None = None,
              seeds: list[str] | None = None, force_distributed: bool = False,
              frontier_order: str = "fifo", priority_fn: str = "short_url",
              round_budget: int | None = None,
              robots_delay_round_s: float = 0.0):
    """Full crawl over the synthetic web for an sf scale.

    ``seeds`` overrides the default one-root-per-host list (a
    production crawl seeds a large fixed URL list, so rounds are big
    from round 0). ``force_distributed`` zeroes every adaptive
    driver-side threshold so ALL work runs in Ray workers — the
    cluster-faithful mode used by the scaling bench (on one box the
    driver process is otherwise an unaccounted extra worker at low
    parallelism)."""
    from ..crawl.driver import CrawlConfig, run_crawl

    from ..stages.fetch import default_num_buckets

    cfg = synth_cfg_for(sf_dir)
    pages_path = pages_dir_for(sf_dir)
    if num_buckets is None:
        num_buckets = default_num_buckets(pages_path)
    if small_round_threshold is None:
        small_round_threshold = int(os.environ.get("SCRAPPY_SMALL_ROUND_THRESHOLD", "100000"))
    kw = {}
    if force_distributed:
        kw = {"small_round_threshold": 0, "driver_round_threshold": 0, "finalize_small_bytes": 0}
    else:
        kw = {"small_round_threshold": small_round_threshold}
    return run_crawl(
        CrawlConfig(
            pages_path=pages_path,
            kb_yaml=synth_kb_yaml(),
            seeds=seeds if seeds is not None else seed_urls(cfg),
            ckpt_dir=ckpt_dir,
            depth=depth,
            num_buckets=num_buckets,
            extract_concurrency=concurrency,
            host_budget=host_budget,
            robots=robots,
            seen_mode=seen_mode,
            max_rounds=max_rounds,
            frontier_order=frontier_order,
            priority_fn=priority_fn,
            round_budget=round_budget,
            robots_delay_round_s=robots_delay_round_s,
            **kw,
        )
    )
