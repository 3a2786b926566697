"""StatsActor — the distributed stats collector (SURVEY.md §2.5 T7).

Replaces ``scrapy/statscollectors.py::MemoryStatsCollector``'s process-local
counter dict with a single tiny actor fed idempotent per-batch increments
(content-derived batch ids make task retries safe).  Counters are small; the
actor is num_cpus=0 and never on the data path.
"""

from __future__ import annotations

from collections import defaultdict


class StatsCollector:
    def __init__(self) -> None:
        self._rounds: dict[int, dict[str, int]] = defaultdict(lambda: defaultdict(int))
        self._by_shard: dict[tuple[int, int], dict[str, int]] = defaultdict(
            lambda: defaultdict(int)
        )
        self._seen_batches: set[str] = set()

    def inc(self, rnd: int, shard_id: int, batch_id: str, counters: dict) -> None:
        if batch_id in self._seen_batches:
            return
        self._seen_batches.add(batch_id)
        for k, v in counters.items():
            self._rounds[rnd][k] += v
            self._by_shard[(rnd, shard_id)][k] += v

    # -- diagnostics only (SCRAPY_RAY_STAGE_TIMING=1): never merged into the
    # round metrics the oracle compares
    def inc_timing(self, rnd: int, t: dict) -> None:
        if not hasattr(self, "_timing"):
            self._timing = defaultdict(lambda: defaultdict(float))
        agg = self._timing[rnd]
        for k, v in t.items():
            agg[k] += v
            mk = "max_" + k
            if v > agg[mk]:
                agg[mk] = v
        agg["tasks"] += 1

    def timing(self) -> dict:
        return (
            {r: dict(v) for r, v in self._timing.items()}
            if hasattr(self, "_timing")
            else {}
        )

    def get_round(self, rnd: int) -> dict:
        return dict(self._rounds.get(rnd, {}))

    def totals(self) -> dict:
        out: dict[str, int] = defaultdict(int)
        for m in self._rounds.values():
            for k, v in m.items():
                out[k] += v
        return dict(out)

    def dump(self) -> dict:
        return {
            "rounds": {k: dict(v) for k, v in self._rounds.items()},
            "by_shard": {f"{r}:{s}": dict(v) for (r, s), v in self._by_shard.items()},
        }
