"""robots.txt cache actors.

The reference has no robots support (its Mechanize agent fetches
unconditionally, /root/reference/lib/scrappy/agent/blind_agent.rb:13);
the north_star requires a robots.txt cache as part of the politeness
layer. In this environment "fetching" robots.txt = looking up
``http://{host}/robots.txt`` in the pages table, so the cache actor is
constructed with the page-store path and resolves misses itself.

Rules are parsed with a minimal, deterministic subset: ``User-agent:
*`` sections' ``Disallow:`` prefixes (the synthetic corpus emits
exactly this shape). Missing robots.txt ⇒ allow all.
"""

from __future__ import annotations

from urllib.parse import urlparse

import ray

from ..support import host_of


class RobotsRules:
    __slots__ = ("disallow", "crawl_delay")

    def __init__(self, disallow: list[str], crawl_delay: float | None = None):
        self.disallow = disallow
        self.crawl_delay = crawl_delay

    def allowed(self, url: str) -> bool:
        try:
            path = urlparse(url).path or "/"
        except ValueError:
            return True
        return not any(d and path.startswith(d) for d in self.disallow)


def parse_robots(body) -> RobotsRules:
    if body is None:
        return RobotsRules([])
    if isinstance(body, bytes):
        body = body.decode("utf-8", "ignore")
    disallow: list[str] = []
    crawl_delay: float | None = None
    applies = False
    for line in body.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = (p.strip() for p in line.split(":", 1))
        kl = k.lower()
        if kl == "user-agent":
            applies = v == "*"
        elif kl == "disallow" and applies:
            disallow.append(v)
        elif kl == "crawl-delay" and applies:
            try:
                crawl_delay = float(v)
            except ValueError:
                pass  # non-numeric delay: ignore, per de-facto practice
    return RobotsRules(disallow, crawl_delay)


@ray.remote(num_cpus=0)
class RobotsShard:
    """Caches parsed rules per host; misses are resolved by a lookup
    against the bucket-partitioned page store."""

    def __init__(self, store_dir: str, num_buckets: int):
        self.store_dir = store_dir
        self.num_buckets = num_buckets
        self.cache: dict[str, RobotsRules] = {}

    def _fetch_rules(self, host: str) -> RobotsRules:
        from ..stages.fetch import lookup_urls

        url = f"http://{host}/robots.txt"
        found = lookup_urls(self.store_dir, self.num_buckets, [url], columns=["url", "html"])
        if not found:
            return RobotsRules([])
        return parse_robots(found[0]["html"])

    def crawl_delays(self, hosts: list[str]) -> list:
        """Per-host robots Crawl-delay seconds (None when unset) —
        feeds the politeness pool's per-host rate overrides."""
        out = []
        for host in hosts:
            rules = self.cache.get(host)
            if rules is None:
                rules = self._fetch_rules(host)
                self.cache[host] = rules
            out.append(rules.crawl_delay)
        return out

    def allowed(self, pairs: list[tuple[str, str]]) -> list[bool]:
        """pairs: (host, url) → allowed mask."""
        out = []
        for host, url in pairs:
            if not host:
                out.append(True)
                continue
            rules = self.cache.get(host)
            if rules is None:
                rules = self._fetch_rules(host)
                self.cache[host] = rules
            out.append(rules.allowed(url))
        return out


class RobotsCachePool:
    def __init__(self, store_dir: str, num_buckets: int, num_shards: int = 4):
        self.num_shards = num_shards
        self.shards = [RobotsShard.remote(store_dir, num_buckets) for _ in range(num_shards)]

    def crawl_delays(self, hosts: list[str]) -> dict:
        """host → robots Crawl-delay seconds (absent hosts omitted)."""
        from .politeness import HostBudgetPool

        per_shard: dict[int, list[str]] = {}
        for h in hosts:
            per_shard.setdefault(HostBudgetPool.shard_of(h, self.num_shards), []).append(h)
        futures = {s: self.shards[s].crawl_delays.remote(hs)
                   for s, hs in per_shard.items()}
        out = {}
        for s, hs in per_shard.items():
            for h, d in zip(hs, ray.get(futures[s])):
                if d is not None:
                    out[h] = d
        return out

    def allowed(self, urls: list[str]) -> list[bool]:
        from .politeness import HostBudgetPool

        per_shard: dict[int, list[int]] = {}
        hosts = [host_of(u) for u in urls]
        for i, h in enumerate(hosts):
            per_shard.setdefault(HostBudgetPool.shard_of(h, self.num_shards), []).append(i)
        futures = {
            s: self.shards[s].allowed.remote([(hosts[i], urls[i]) for i in idxs])
            for s, idxs in per_shard.items()
        }
        mask = [True] * len(urls)
        for s, idxs in per_shard.items():
            for i, ok in zip(idxs, ray.get(futures[s])):
                mask[i] = ok
        return mask
