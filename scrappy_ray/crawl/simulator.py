"""Single-threaded reference-semantics crawl simulators (the goldens).

Two implementations whose agreement is the correctness argument for
the Ray crawler (SURVEY.md §5):

1. ``fifo_reference_crawl`` — a literal clone of the reference's
   workers=1 FIFO loop: MapReduce::Queue pop/push_unless_done
   (/root/reference/lib/scrappy/agent/map_reduce.rb:17-74) driving
   Agent#map link discovery (/root/reference/lib/scrappy/agent/
   agent.rb:37-93). Seen-set equality is on the (url, depth) pair
   (map_reduce.rb:40-42).

2. ``superstep_crawl_sim`` — the BFS-superstep semantics the Ray
   driver implements (rounds; within a round items execute in global
   discovery-seq order; per-host politeness budget defers excess items
   to the next round, keeping their seq; robots filtering drops
   candidates before they are marked seen).

With politeness and robots off, (2) produces the identical schedule
sequence as (1) — proven by tests/test_crawl.py — and the Ray driver
must match (2) exactly under any parallelism.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from ..extractor.core import clean_triples, extract_record
from ..kb.model import KB
from ..support import complete_uri, host_of


@dataclass
class SimResult:
    # executed order: rows (seq, url, depth, round)
    schedule: list = field(default_factory=list)
    seen: set = field(default_factory=set)  # (url, depth) pairs
    triples: list = field(default_factory=list)  # final cleaned distinct
    texts: dict = field(default_factory=dict)  # url -> extracted text
    records: list = field(default_factory=list)


def fifo_reference_crawl(lookup, kb: KB, seeds: list[str], depth: int, max_steps: int = 100000) -> SimResult:
    """The reference's workers=1 behavior. ``lookup(url) -> html|None``
    plays the role of the pages table ("fetching" = lookup)."""
    res = SimResult()
    queue = deque({"url": u, "depth": depth} for u in seeds)
    seen_pairs = set()  # history ∪ items, as (url, depth)
    for item in queue:
        seen_pairs.add((item["url"], item["depth"]))
    all_triples: list = []
    seq = 0
    while queue and seq < max_steps:
        item = queue.popleft()
        url = complete_uri(item["url"])
        rec = extract_record(kb, url, lookup(url), item["depth"])
        res.schedule.append({"seq": seq, "url": item["url"], "depth": item["depth"], "round": -1})
        res.seen.add((item["url"], item["depth"]))
        res.texts[url] = rec["text"]
        res.records.append(rec)
        all_triples.extend(rec["triples"])
        for link in rec["links"]:
            key = (link["url"], link["depth"])
            if key not in seen_pairs:  # push_unless_done
                seen_pairs.add(key)
                queue.append(dict(link))
        seq += 1
    res.triples = clean_triples(all_triples)
    return res


def superstep_crawl_sim(
    lookup,
    kb: KB,
    seeds: list[str],
    depth: int,
    host_budget: int | None = None,
    robots: bool = False,
    max_rounds: int = 1000,
    frontier_order: str = "fifo",
    priority_fn: str = "short_url",
    round_budget: int | None = None,
    robots_delay_round_s: float = 0.0,
) -> SimResult:
    """The BFS-superstep semantics of the Ray driver, in-process.

    ``frontier_order="priority"`` replays the driver's priority
    frontier: items carry ``priority_py(priority_fn, url, depth)``;
    per-host grants rank by (priority desc, seq) and the optional
    global ``round_budget`` keeps only the best K granted items per
    round (the rest defer with seq + priority intact)."""
    from ..state.robots import parse_robots
    from .priority import priority_py

    res = SimResult()
    robots_cache: dict[str, object] = {}

    def robots_allows(url: str) -> bool:
        if not robots:
            return True
        cu = complete_uri(url)
        host = host_of(cu)
        if not host:
            return True
        if host not in robots_cache:
            body = lookup(f"http://{host}/robots.txt")
            robots_cache[host] = parse_robots(body)
        return robots_cache[host].allowed(cu)

    # robots Crawl-delay → per-host token buckets (the driver's
    # HostBudgetShard semantics, replicated exactly: burst = min(budget,
    # rate) for overridden hosts, lazy refill by elapsed rounds,
    # granted = min(wanted, int(tokens))). Active only when the flag is
    # on — the legacy fixed per-round count stays byte-compatible with
    # the frozen goldens otherwise.
    bk_tokens: dict[str, float] = {}
    bk_round: dict[str, int] = {}

    def host_rate(h: str) -> float | None:
        """Overridden rate for h, or None (use the plain budget)."""
        if not (robots and robots_delay_round_s > 0) or host_budget is None:
            return None
        if h not in robots_cache:
            robots_cache[h] = parse_robots(lookup(f"http://{h}/robots.txt"))
        d = robots_cache[h].crawl_delay
        if d and d > 0:
            return min(float(host_budget), max(1.0, robots_delay_round_s / d))
        return None

    def bucket_quota(h: str, wanted: int, rnd: int) -> int:
        rate = host_rate(h)
        r = float(host_budget) if rate is None else rate
        burst = float(host_budget) if rate is None else min(float(host_budget), rate)
        last = bk_round.get(h)
        tok = bk_tokens.get(h, burst)
        if last is not None and rnd > last:
            tok = min(burst, tok + r * (rnd - last))
        granted = min(wanted, int(tok))
        bk_tokens[h] = tok - granted
        bk_round[h] = rnd
        return granted

    ready = [{"url": u, "depth": depth, "seq": i} for i, u in enumerate(seeds)]
    seen_pairs = {(it["url"], it["depth"]) for it in ready}
    next_seq = len(ready)
    all_triples: list = []

    def order_key(it):
        if frontier_order == "fifo":
            return (it["seq"],)
        return (-priority_py(priority_fn, it["url"], it["depth"]), it["seq"])

    for rnd in range(max_rounds):
        if not ready:
            break
        ready.sort(key=order_key)
        if host_budget is not None and robots_delay_round_s > 0:
            wanted: dict[str, int] = {}
            for it in ready:
                h = host_of(complete_uri(it["url"]))
                wanted[h] = wanted.get(h, 0) + 1
            quota = {h: bucket_quota(h, n, rnd) for h, n in wanted.items()}
            used = {}
            execute, deferred = [], []
            for it in ready:
                h = host_of(complete_uri(it["url"]))
                if used.get(h, 0) < quota[h]:
                    used[h] = used.get(h, 0) + 1
                    execute.append(it)
                else:
                    deferred.append(it)
        elif host_budget is not None:
            used: dict[str, int] = {}
            execute, deferred = [], []
            for it in ready:
                h = host_of(complete_uri(it["url"]))
                if used.get(h, 0) < host_budget:
                    used[h] = used.get(h, 0) + 1
                    execute.append(it)
                else:
                    deferred.append(it)
        else:
            execute, deferred = list(ready), []
        if round_budget is not None and len(execute) > round_budget:
            # global top-K of the granted set by the same order key
            deferred = execute[round_budget:] + deferred
            execute = execute[:round_budget]

        candidates = []  # (parent_seq, link_idx, url, depth)
        for it in execute:
            url = complete_uri(it["url"])
            rec = extract_record(kb, url, lookup(url), it["depth"])
            res.schedule.append(
                {"seq": it["seq"], "url": it["url"], "depth": it["depth"], "round": rnd}
            )
            res.seen.add((it["url"], it["depth"]))
            res.texts[url] = rec["text"]
            res.records.append(rec)
            all_triples.extend(rec["triples"])
            for li, link in enumerate(rec["links"]):
                candidates.append((it["seq"], li, link["url"], link["depth"]))

        # within-round first-wins dedup on (url, depth) by (parent_seq, idx)
        best: dict = {}
        for ps, li, u, d in candidates:
            key = (u, d)
            if key not in best or (ps, li) < best[key][:2]:
                best[key] = (ps, li, u, d)
        fresh = sorted(best.values())
        new_items = []
        for ps, li, u, d in fresh:
            if (u, d) in seen_pairs:
                continue
            if not robots_allows(u):
                continue
            seen_pairs.add((u, d))
            new_items.append({"url": u, "depth": d, "seq": next_seq})
            next_seq += 1
        ready = deferred + new_items

    res.triples = clean_triples(all_triples)
    return res


def lookup_from_config(cfg):
    """Simulator lookup over the synthetic web config. EXACT url match,
    like the page-store fetch: a URL not in the pages table is a miss
    (the reference's fetch-error → empty triples path,
    agent.rb:231-237) — e.g. the ?ref=… link variants."""
    from ..sources.testgen import all_urls, page_for_url

    table = {u: page_for_url(cfg, u)[0].encode() for u in all_urls(cfg)}
    return table.get
