"""Per-node push-aggregation actor for the expand -> frontier fan-in.

Design (CrawlConfig.push_aggregators docstring has the RPC arithmetic):
every expand task sends its whole candidate payload — all touched shards,
tagged — to ONE aggregator in a single ``absorb`` RPC; the driver calls
``flush`` once per round (after the results write barrier, before the
next resolve and before any checkpoint), and each aggregator forwards ONE
batched ``push_many`` per shard it buffered for.  Fan-in per shard drops
from O(tasks) RPCs per round to O(aggregators).

Exactness: the per-(task-batch, shard) idempotency key travels verbatim
from the task through the aggregator to ``FrontierShard.push`` — a
replayed task re-absorbs under the same key and the shard drops it
exactly as in direct mode.  Aggregators hold NO durable state: a flush
always precedes the round's checkpoint, so a killed run replays the
whole round and rebuilds any lost buffers from scratch.
"""

from __future__ import annotations


class PushAggregator:
    """Buffers (batch_id, table, counters) items per shard between the
    expand stage and the round barrier; ``flush`` forwards them batched."""

    def __init__(self, shards: list):
        self.shards = shards
        self._buf: dict[int, list[tuple]] = {}

    def absorb(self, items: list[tuple]) -> int:
        """items: [(batch_id, shard_id, table, early_deduped, latencies,
        cookies), ...] — one entry per shard the task's batch touches."""
        for batch_id, sh, tbl, early, lat, cookies in items:
            self._buf.setdefault(sh, []).append(
                (batch_id, tbl, early, lat, cookies)
            )
        return len(items)

    def flush(self) -> int:
        """Forward every buffered item, ONE push_many RPC per shard; block
        until all land so the caller's barrier semantics hold."""
        import ray

        refs = [
            self.shards[sh].push_many.remote(batch)
            for sh, batch in self._buf.items()
        ]
        n = sum(len(b) for b in self._buf.values())
        self._buf = {}
        ray.get(refs)
        return n
