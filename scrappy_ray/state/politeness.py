"""Per-host politeness token buckets.

The reference's only politeness is a global inter-request delay that
forces a single worker (/root/reference/lib/scrappy/agent/agent.rb:217,
/root/reference/bin/scrappy:41). The north_rule requires per-host
politeness that still scales: a pool of token-bucket actors sharded by
``hash(host)``, consulted once per (host, round) — NOT per URL — so
actor traffic is O(distinct hosts/round).

Superstep semantics: each round a host may execute up to
``floor(available_tokens)`` items; the driver defers the rest to the
next round (keeping their discovery seq, so deferred items run first
within their host next round). Tokens refill by ``rate_per_round`` up
to ``burst``.
"""

from __future__ import annotations

import hashlib

import ray


@ray.remote(num_cpus=0)
class HostBudgetShard:
    def __init__(self, rate_per_round: float, burst: float | None = None):
        self.rate = rate_per_round
        self.burst = burst if burst is not None else rate_per_round
        self.tokens: dict[str, float] = {}
        self.round_of: dict[str, int] = {}
        # per-host rate overrides (robots Crawl-delay → slower hosts);
        # an overridden host's burst equals its rate
        self.rate_of: dict[str, float] = {}

    def set_rates(self, rates: dict[str, float]) -> None:
        self.rate_of.update(rates)

    def grant(self, requests: list[tuple[str, int]], rnd: int) -> list[int]:
        """requests: (host, n_wanted) → n_granted per host. Refills
        lazily by the number of rounds elapsed since last grant."""
        out = []
        for host, wanted in requests:
            rate = self.rate_of.get(host, self.rate)
            burst = min(self.burst, rate) if host in self.rate_of else self.burst
            last = self.round_of.get(host)
            tok = self.tokens.get(host, burst)
            if last is not None and rnd > last:
                tok = min(burst, tok + rate * (rnd - last))
            granted = min(wanted, int(tok))
            self.tokens[host] = tok - granted
            self.round_of[host] = rnd
            out.append(granted)
        return out

    def state(self) -> dict:
        return {"tokens": self.tokens, "round_of": self.round_of,
                "rate_of": self.rate_of}

    def restore(self, st: dict) -> None:
        self.tokens = dict(st["tokens"])
        self.round_of = dict(st["round_of"])
        self.rate_of = dict(st.get("rate_of", {}))  # pre-override snapshots lack it


class HostBudgetPool:
    def __init__(self, rate_per_round: float, num_shards: int = 4, burst: float | None = None):
        self.num_shards = num_shards
        self.shards = [HostBudgetShard.remote(rate_per_round, burst) for _ in range(num_shards)]

    @staticmethod
    def shard_of(host: str, num_shards: int) -> int:
        return int.from_bytes(hashlib.md5(host.encode("utf-8", "ignore")).digest()[:4], "big") % num_shards

    def grant(self, host_counts: dict[str, int], rnd: int) -> dict[str, int]:
        per_shard: dict[int, list[str]] = {}
        for h in host_counts:
            per_shard.setdefault(self.shard_of(h, self.num_shards), []).append(h)
        futures = {
            s: self.shards[s].grant.remote([(h, host_counts[h]) for h in hosts], rnd)
            for s, hosts in per_shard.items()
        }
        out = {}
        for s, hosts in per_shard.items():
            for h, g in zip(hosts, ray.get(futures[s])):
                out[h] = g
        return out

    def set_rates(self, rates: dict[str, float]) -> None:
        """Push per-host rate overrides (shard-routed, one RPC per
        shard touched)."""
        per_shard: dict[int, dict[str, float]] = {}
        for h, r in rates.items():
            per_shard.setdefault(self.shard_of(h, self.num_shards), {})[h] = r
        ray.get([self.shards[s].set_rates.remote(d) for s, d in per_shard.items()])

    def snapshot(self) -> list[dict]:
        return ray.get([s.state.remote() for s in self.shards])

    def restore(self, snaps: list[dict]) -> None:
        ray.get([s.restore.remote(st) for s, st in zip(self.shards, snaps)])
