"""CLI mirroring the reference's `scrappy -g URI` surface
(/root/reference/bin/scrappy:24-64) against a pages Parquet table.

    python -m scrappy_ray get URL [URL...] \
        --pages PAGES_PARQUET --kb KB_YAML \
        [-l DEPTH] [-f ntriples|json|ejson|yarf|rdfxml|rdf] [--budget N] [--robots] \
        [--ckpt DIR] [--dump DIR] [--order fifo|priority] [--round-budget K] \
        [--seen-mode exact|cuckoo|bloom]

Options map to the reference: -l/--levels (bin/scrappy:27),
-f/--format (bin/scrappy:31), politeness delay → per-host budget
(bin/scrappy:41 — upgraded semantics per north_rule), --dump
(bin/scrappy:35 → Dumper)."""

from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv=None):
    p = argparse.ArgumentParser(prog="scrappy_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("get", help="crawl + extract starting at seed URL(s)")
    g.add_argument("urls", nargs="+")
    g.add_argument("--pages", required=True, help="pages parquet path/dir")
    g.add_argument("--kb", required=True, help="KB YAML file")
    g.add_argument("-l", "--levels", type=int, default=-1, help="depth (-1 = unbounded)")
    from .sources.serializers import SERIALIZERS

    g.add_argument("-f", "--format", default="ntriples", choices=sorted(SERIALIZERS))
    sv = sub.add_parser("server", help="HTTP extraction + admin service (bin/scrappy -s)")
    sv.add_argument("--pages", required=True, help="pages parquet path/dir")
    sv.add_argument("--kb", required=True, help="KB YAML file")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("-p", "--port", type=int, default=3434)  # reference default port, bin/scrappy:47
    g.add_argument("--budget", type=float, default=None, help="per-host items/round")
    g.add_argument("--robots", action="store_true")
    g.add_argument("--robots-delay-round-s", type=float, default=0.0,
                   help="honor robots Crawl-delay: per-host rate = "
                        "min(budget, max(1, S/delay)) for a nominal "
                        "round of S seconds (0 = ignore Crawl-delay)")
    g.add_argument("--ckpt", default=None, help="checkpoint dir (resume if it exists)")
    g.add_argument("--dump", default=None, help="dump per-url files to this dir (Dumper sink)")
    g.add_argument("--order", default="fifo", choices=["fifo", "priority"],
                   help="frontier order: fifo (reference parity) or priority")
    g.add_argument("--priority-fn", default="short_url", choices=["short_url", "depth"],
                   help="priority function for --order priority")
    g.add_argument("--round-budget", type=int, default=None,
                   help="global cap on executions per round (priority queue pop size)")
    g.add_argument("--seen-mode", default="exact", choices=["exact", "cuckoo", "bloom"],
                   help="URL-seen backend (cuckoo/bloom for the 10^10 design point)")

    args = p.parse_args(argv)

    if args.cmd == "server":
        from .kb.loader import load_kb_file
        from .server import EngineState, make_server
        from .stages.fetch import build_page_store, default_num_buckets, store_dir_for

        nb = default_num_buckets(args.pages)
        store = store_dir_for(args.pages, nb)
        build_page_store(args.pages, store, nb)  # auto-inits Ray for the build only
        kb = load_kb_file(args.kb)
        srv = make_server(EngineState(kb=kb, pages_store=store, num_buckets=nb),
                          host=args.host, port=args.port)
        print(f"scrappy_ray server on http://{args.host}:{srv.server_address[1]}", flush=True)
        try:
            srv.serve_forever()
        except KeyboardInterrupt:
            srv.shutdown()
        return 0

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from .crawl.driver import CrawlConfig, run_crawl
    from .sources.serializers import dump_per_url, serialize

    ckpt = args.ckpt or tempfile.mkdtemp(prefix="scrappy_ray_", dir="/tmp")
    with open(args.kb) as f:
        kb_yaml = f.read()
    res = run_crawl(
        CrawlConfig(
            pages_path=args.pages,
            kb_yaml=kb_yaml,
            seeds=args.urls,
            ckpt_dir=ckpt,
            depth=args.levels,
            host_budget=args.budget,
            robots=args.robots,
            frontier_order=args.order,
            priority_fn=args.priority_fn,
            round_budget=args.round_budget,
            robots_delay_round_s=args.robots_delay_round_s,
            seen_mode=args.seen_mode,
        )
    )
    import pyarrow.dataset as pads

    triples = [
        (r["s"], r["p"], r["o"], r["lit"])
        for r in pads.dataset(res.triples_path).to_table().sort_by(
            [("s", "ascending"), ("p", "ascending"), ("o", "ascending")]
        ).to_pylist()
    ]
    out = serialize(triples, args.format)
    if isinstance(out, bytes):  # png — the one binary serializer
        sys.stdout.buffer.write(out)
    else:
        sys.stdout.write(out)
    if args.dump:
        rows = pads.dataset(
            [f for r in res.manifest["rounds"] for f in __import__("glob").glob(
                f"{ckpt}/round-{r['round']:04d}/extraction/*.parquet")]
        ).to_table(columns=["url", "triples", "fetched"]).to_pylist()
        # the reference dumps only fetched HTML pages (agent.rb:231-233)
        dump_per_url([r for r in rows if r["fetched"]], args.dump, args.format)
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
