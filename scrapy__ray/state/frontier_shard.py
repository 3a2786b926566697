"""FrontierShard — the sharded scheduler + URL-seen actor.

One long-lived Ray actor per host-hash shard replaces the reference's
process-local trio of scheduler priority queue + dupefilter set + robots
cache (``scrapy/core/scheduler.py::Scheduler``,
``scrapy/dupefilters.py::RFPDupeFilter``,
``scrapy/downloadermiddlewares/robotstxt.py::RobotsTxtMiddleware``).
This is the one place the Dataset API genuinely can't express the
semantics — a shared mutable index with cross-round state — so it drops to a
raw Ray actor per the build rules; everything data-parallel (fetch, extract,
expand) stays in map_batches tasks.

Protocol per BSP round k (semantics frozen in scrapy__ray/config.py):
  * expand tasks call ``push(batch_id, table)`` with candidate rows for this
    shard (idempotent by content-derived batch_id — safe under task retry);
  * after the round-k Dataset execution completes (the BSP barrier), the
    driver calls ``resolve(k+1)``: merge pending + pushed candidates, sort by
    order key, exact/cuckoo dedup, robots filter, per-host budget split into
    scheduled (returned as an Arrow table) and deferred (kept as pending).

Partitioning assumption (documented per SURVEY.md): a given host — and
therefore a given fingerprint — maps to exactly one shard
(``host_hash % num_shards``), so per-shard ordered dedup equals the oracle's
global ordered dedup, and per-host politeness budgets never span shards.

Scale note: pending rows are held as Python tuples (urls only, no bodies);
at 10^10-URL scale this becomes a columnar spill file per shard — the
checkpoint format (parquet pending + serialized seen-set) is already that.
"""

from __future__ import annotations

import os
import pickle
import time
import urllib.robotparser

import pyarrow as pa
import pyarrow.parquet as pq

from scrapy__ray.config import CrawlConfig
from scrapy__ray.schema import FRONTIER_COLS, FRONTIER_SCHEMA, SCHEDULED_SCHEMA
from scrapy__ray.state.seen import SeenSet

# tuple layout == FRONTIER_COLS order
_URL, _HOST, _HH, _FP, _PRIO, _DEPTH, _DISC, _PARENT, _LIDX, _RETRY, _REDIR, _SKIP = range(12)


def order_key(row: tuple) -> tuple:
    """The frozen total order: (-priority, disc_round, parent_url, link_idx)."""
    return (-row[_PRIO], row[_DISC], row[_PARENT], row[_LIDX])


class FrontierShard:
    def __init__(
        self,
        shard_id: int,
        cfg: CrawlConfig,
        robots_txt: dict[str, str] | None = None,
    ):
        self.shard_id = shard_id
        self.cfg = cfg
        self.seen = SeenSet(
            mode=cfg.dedup,
            capacity=1 << 20,
            keep_exact_sidecar=True,
        )
        self.pending: list[tuple] = []  # deferred candidates (skip_dedup=True)
        self._pushed: list[tuple] = []
        self._push_ids: set[str] = set()
        self._early_deduped = 0  # expand-side pre-dropped dups, next resolve
        # AutoThrottle state: host -> current delay (s); per-round int-µs
        # latency accumulator host -> [sum_us, n] (ints: order-independent)
        self._host_delay: dict[str, float] = {}
        self._lat_acc: dict[str, list[int]] = {}
        self._robots_txt = robots_txt or {}
        self._robots: dict[str, urllib.robotparser.RobotFileParser | None] = {}
        self.metrics: dict[int, dict] = {}
        self.last_scheduled = 0

    # ------------------------------------------------------------------ push
    def push(
        self,
        batch_id: str,
        table: pa.Table,
        early_deduped: int = 0,
        latencies: dict[str, list[int]] | None = None,
    ) -> int:
        """Absorb candidate rows (idempotent by batch_id).  ``early_deduped``
        is the count of duplicates the expand task already dropped for this
        shard (exact-equivalent within-batch pre-dedup); it is credited to
        this shard's NEXT resolve() metrics, where the oracle counts them.
        ``latencies`` (host -> [sum_us, n] over the batch's 200 responses)
        feeds the AutoThrottle delay update applied at the next resolve."""
        if batch_id in self._push_ids:
            return 0  # retried task — already absorbed
        self._push_ids.add(batch_id)
        self._early_deduped += early_deduped
        if latencies:
            for host, (s, n) in latencies.items():
                acc = self._lat_acc.setdefault(host, [0, 0])
                acc[0] += s
                acc[1] += n
        cols = [table[c].to_pylist() for c in FRONTIER_COLS]
        rows = list(zip(*cols))
        self._pushed.extend(rows)
        return len(rows)

    # ---------------------------------------------------------------- robots
    def _allowed(self, host: str, url: str) -> bool:
        rp = self._robots.get(host, False)
        if rp is False:
            txt = self._robots_txt.get(host)
            if txt is None:
                rp = None
            else:
                rp = urllib.robotparser.RobotFileParser()
                rp.parse(txt.splitlines())
            self._robots[host] = rp
        return True if rp is None else rp.can_fetch(self.cfg.user_agent, url)

    # --------------------------------------------------------------- resolve
    def resolve(self, rnd: int, chunk_rows: int | None = None) -> list:
        t0 = time.monotonic()
        cfg = self.cfg
        m = dict(
            fetched=0, deduped=0, deferred=0, robots_denied=0, errors=0,
            retried=0, redirects=0, offsite=0, scheduled=0,
        )
        rows = self.pending + self._pushed
        self.pending = []
        self._pushed = []
        self._push_ids.clear()
        m["deduped"] += self._early_deduped
        self._early_deduped = 0
        # candidates entering this round (the oracle's "frontier non-empty"
        # test) — the engine uses it to record a final all-deduped round
        m["incoming"] = len(rows)
        rows.sort(key=order_key)

        # 1. dedup (ordered test-and-insert)
        passed: list[tuple] = []
        for r in rows:
            if r[_SKIP]:
                self.seen.insert(r[_FP])
                passed.append(r)
            elif self.seen.check_and_insert(r[_FP]):
                m["deduped"] += 1
            else:
                passed.append(r)

        # 2. robots
        if cfg.robots_obey:
            kept = []
            for r in passed:
                if self._allowed(r[_HOST], r[_URL]):
                    kept.append(r)
                else:
                    m["robots_denied"] += 1
            passed = kept

        # 2b. AutoThrottle delay update (from round-k latencies, before
        # round-k+1 scheduling — same timing as the oracle)
        if cfg.autothrottle_enabled and self._lat_acc:
            for host, (s, n) in self._lat_acc.items():
                observed = (s / n) / 1e6  # mean latency, seconds
                target = observed / cfg.autothrottle_target_concurrency
                d0 = self._host_delay.get(host, cfg.autothrottle_start_delay)
                nd = (d0 + target) / 2.0
                nd = min(max(nd, cfg.download_delay), cfg.autothrottle_max_delay)
                self._host_delay[host] = nd
            self._lat_acc = {}

        # 3. per-host budget -> scheduled | deferred (rows already in order)
        def host_delay(host: str) -> float:
            if cfg.autothrottle_enabled:
                d = self._host_delay.get(host, cfg.autothrottle_start_delay)
            else:
                d = cfg.download_delay
            # delay <= 0 (politeness off) => unbounded budget, not a
            # ZeroDivisionError; mirrored in CrawlConfig.per_host_budget
            return d if d > 0 else 0.0

        ranks: dict[str, int] = {}
        sched: list[tuple] = []
        seqs: list[int] = []
        vtimes: list[float] = []
        for r in passed:
            rank = ranks.get(r[_HOST], 0)
            ranks[r[_HOST]] = rank + 1
            delay = host_delay(r[_HOST])
            budget = (
                max(1, int(cfg.round_duration / delay)) if delay > 0 else (1 << 62)
            )
            if rank < budget:
                sched.append(r)
                seqs.append(rank)
                vtimes.append(rnd * cfg.round_duration + rank * delay)
            else:
                # deferred: mark skip_dedup so re-entry is a pure re-insert
                self.pending.append(r[:_SKIP] + (True,))
                m["deferred"] += 1

        m["scheduled"] = len(sched)
        m["wall_s"] = time.monotonic() - t0
        self.metrics[rnd] = m
        self.last_scheduled = len(sched)

        cols = list(zip(*sched)) if sched else [[] for _ in FRONTIER_COLS]
        arrays = [
            pa.array(list(col), type=f.type)
            for col, f in zip(cols, FRONTIER_SCHEMA)
        ]
        arrays += [
            pa.array([rnd] * len(sched), pa.int32()),
            pa.array(seqs, pa.int32()),
            pa.array(vtimes, pa.float64()),
        ]
        table = pa.Table.from_arrays(arrays, schema=SCHEDULED_SCHEMA)

        # Return the schedule as ~chunk_rows-row object-store slices rather
        # than one block: one-task-per-shard makes the slowest shard gate
        # every BSP round (measured 0.60 scaling efficiency at 32 cpus);
        # many small blocks let the task pool load-balance and keep sparse
        # late rounds parallel.  Chunks preserve row order, so per-host
        # fetch order is untouched.  The engine passes chunk_rows sized to
        # ~3 tasks/cpu for the round.
        import ray

        chunk = max(1, int(chunk_rows or self.cfg.scheduled_chunk_rows))
        refs = [
            ray.put(table.slice(off, chunk))
            for off in range(0, table.num_rows, chunk)
        ]
        return refs

    # ---------------------------------------------------------------- status
    def status(self, rnd: int) -> dict:
        m = dict(self.metrics.get(rnd, {}))
        m["pending"] = len(self.pending)
        m["seen"] = len(self.seen)
        m["last_scheduled"] = self.last_scheduled
        m["fp_false_positives"] = self.seen.false_positive_checks
        return m

    def seen_fingerprints(self) -> set[bytes]:
        return self.seen.exact_fingerprints()

    # ------------------------------------------------------------ checkpoint
    def _rows_table(self, rows: list[tuple]) -> pa.Table:
        cols = list(zip(*rows)) if rows else [[] for _ in FRONTIER_COLS]
        return pa.Table.from_arrays(
            [pa.array(list(c), type=f.type) for c, f in zip(cols, FRONTIER_SCHEMA)],
            schema=FRONTIER_SCHEMA,
        )

    def checkpoint(self, ckpt_dir: str, rnd: int) -> None:
        """Persist the full frontier state: deferred (pending) rows AND the
        candidates already pushed for round rnd+1 during round rnd's
        execution — both are needed to resume exactly."""
        os.makedirs(ckpt_dir, exist_ok=True)
        pq.write_table(
            self._rows_table(self.pending),
            os.path.join(ckpt_dir, f"pending-{self.shard_id}.parquet"),
        )
        pq.write_table(
            self._rows_table(self._pushed),
            os.path.join(ckpt_dir, f"pushed-{self.shard_id}.parquet"),
        )
        with open(os.path.join(ckpt_dir, f"seen-{self.shard_id}.bin"), "wb") as f:
            f.write(self.seen.serialize())
        with open(os.path.join(ckpt_dir, f"meta-{self.shard_id}.pkl"), "wb") as f:
            pickle.dump(
                {
                    "round": rnd,
                    "metrics": self.metrics,
                    "early_deduped": self._early_deduped,
                    "host_delay": self._host_delay,
                    "lat_acc": self._lat_acc,
                },
                f,
            )

    def _read_rows(self, path: str) -> list[tuple]:
        tbl = pq.read_table(path)
        cols = [tbl[c].to_pylist() for c in FRONTIER_COLS]
        return list(zip(*cols))

    def restore(self, ckpt_dir: str) -> int:
        self.pending = self._read_rows(
            os.path.join(ckpt_dir, f"pending-{self.shard_id}.parquet")
        )
        self._pushed = self._read_rows(
            os.path.join(ckpt_dir, f"pushed-{self.shard_id}.parquet")
        )
        with open(os.path.join(ckpt_dir, f"seen-{self.shard_id}.bin"), "rb") as f:
            self.seen = SeenSet.deserialize(f.read())
        with open(os.path.join(ckpt_dir, f"meta-{self.shard_id}.pkl"), "rb") as f:
            d = pickle.load(f)
        self.metrics = d["metrics"]
        self._early_deduped = d.get("early_deduped", 0)
        self._host_delay = d.get("host_delay", {})
        self._lat_acc = d.get("lat_acc", {})
        self._push_ids.clear()
        return d["round"]

    def ping(self) -> int:
        return self.shard_id
