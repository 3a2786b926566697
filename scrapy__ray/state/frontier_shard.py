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

Scale posture (round-2): pending/pushed live as ARROW TABLES end to end —
push() appends the pushed table without any per-row Python conversion,
resolve() sorts with Arrow's stable multi-key kernel (C++, not a Python
tuple sort) and does budget assignment with vectorized pandas; per-row
Python survives only where the semantics are inherently per-row (the
ordered seen-set test-and-insert and per-URL robots ``can_fetch``).

Spill layout (round-3, the 10^10-URL path): pending beyond
``cfg.pending_spill_rows`` compacts into a parquet BASE file sorted by
``(host, order-key)`` with an in-memory per-host ``(offset, count,
consumed)`` index (hosts ≪ rows).  Each resolve() reads ONLY each host's
next-``budget`` head rows from the base — O(scheduled) rows via row-group
pruning, never O(pending) — so a shard whose backlog is 10^6× its per-round
schedule re-reads none of it.  Correctness of head-reading (byte-identity
with the full-read path, proven by the forced-spill equivalence test):

  * every base row has ``skip_dedup=True`` (it was deferred after passing
    dedup) so dedup can never drop it, and it passed robots once against
    rules that are static for the crawl, so robots can never drop it;
  * therefore the ``budget_h`` head rows of host h read from the base all
    survive to the budget step and outrank (same frozen order key, base
    sorted by it) any unread base row of h — an unread row can never make
    the round's top-``budget_h`` and deferring it unread is exact.

Head rows that lose the budget race to higher-priority pushed rows return
to the in-memory pending and re-compact later; ``consumed`` advances by
rows read regardless, so the base is append-consumed and dropped when
drained.  Compaction (sort + rewrite) is O(pending) but runs only when the
in-memory side exceeds the threshold, amortizing it over the rows that
triggered it; a leveled multi-generation base would amortize further at
the extreme tail and is a documented extension, not needed for the read
bound.
"""

from __future__ import annotations

import os
import pickle
import time
import urllib.robotparser

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from scrapy__ray.config import CrawlConfig
from scrapy__ray.schema import FRONTIER_COLS, FRONTIER_SCHEMA, SCHEDULED_SCHEMA
from scrapy__ray.state.seen import SeenSet

#: The frozen total order (Arrow sort-key form): (-priority, disc_round,
#: parent_url, link_idx).  Arrow's sort_indices is stable, matching the
#: oracle's stable Python sort on the equivalent key tuple.
_ORDER_KEYS = [
    ("priority", "descending"),
    ("disc_round", "ascending"),
    ("parent_url", "ascending"),
    ("link_idx", "ascending"),
]

_EMPTY = FRONTIER_SCHEMA.empty_table()

#: Spill-base parquet row-group size: the granularity of the head read.
#: Small groups keep the per-host overshoot (rows materialized beyond the
#: budget heads) bounded at ~one group per active host.
_SPILL_RG_ROWS = 4096

_SPILL_DIR = "/tmp/scrapy__ray_spill"


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
        self.pending: pa.Table = _EMPTY  # deferred candidates (skip_dedup=True)
        # spill base: (host, order)-sorted parquet + per-host consume index
        self._base_path: str | None = None
        self._base_gen = 0
        self._base_hosts: list[str] = []
        self._base_off = np.zeros(0, dtype=np.int64)
        self._base_cnt = np.zeros(0, dtype=np.int64)
        self._base_consumed = np.zeros(0, dtype=np.int64)
        self._base_rg_starts = np.zeros(1, dtype=np.int64)
        self._spill_rows_read = 0  # physical rows materialized from the base
        self._spill_rows_written = 0
        self._pushed: list[pa.Table] = []
        self._push_ids: set[str] = set()
        self._early_deduped = 0  # expand-side pre-dropped dups, next resolve
        # AutoThrottle state: host -> current delay (s); per-round int-µs
        # latency accumulator host -> [sum_us, n] (ints: order-independent)
        self._host_delay: dict[str, float] = {}
        self._lat_acc: dict[str, list[int]] = {}
        # M9 cookie jar: (cookiejar id, host) -> {name: value}; _cookie_acc
        # stages cookies observed during the running round, merged at the
        # next resolve (max-value rule — see config.py COOKIES semantics).
        # The jar-id key dimension is the meta['cookiejar'] analogue:
        # id 0 is the default jar; distinct ids on one host never mix.
        self._jar: dict[tuple[int, str], dict[str, str]] = {}
        self._cookie_acc: dict[tuple[int, str], dict[str, str]] = {}
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
        cookies: dict[str, dict[str, str]] | None = None,
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
        if cookies:
            for jar_key, kv in cookies.items():  # jar_key = (jar id, host)
                jar = self._cookie_acc.setdefault(jar_key, {})
                for k, v in kv.items():
                    if k not in jar or v > jar[k]:  # max-value merge rule
                        jar[k] = v
        # columnar absorb: keep the Arrow table as-is (schema-aligned), no
        # per-row Python conversion on the push path
        if table.num_rows:
            self._pushed.append(table.select(FRONTIER_COLS).cast(FRONTIER_SCHEMA))
        return table.num_rows

    def push_many(self, items: list[tuple]) -> int:
        """Batched pushes from a PushAggregator (state/push_agg.py): each
        item carries its ORIGINAL per-(task-batch, shard) idempotency key,
        so absorbing a batch is exactly absorbing its items in sequence —
        replays dedup per item, and push order never affects resolve output
        (candidates are re-sorted by order key there)."""
        return sum(self.push(*item) for item in items)

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

    # ------------------------------------------------------- spill base mgmt
    def _budget_for(self, host: str) -> int:
        """Per-host fetch budget for the CURRENT delay state — must match
        the vectorized budget computation in resolve() step 3 exactly (int
        truncation included), since it bounds how many base rows are read."""
        cfg = self.cfg
        if cfg.autothrottle_enabled:
            d = self._host_delay.get(host, cfg.autothrottle_start_delay)
        else:
            d = cfg.download_delay
        if d <= 0:
            return 1 << 62
        return max(1, int(cfg.round_duration / d))

    def _drop_base(self) -> None:
        if self._base_path is not None and os.path.exists(self._base_path):
            os.unlink(self._base_path)
        self._base_path = None
        self._base_hosts = []
        self._base_off = np.zeros(0, dtype=np.int64)
        self._base_cnt = np.zeros(0, dtype=np.int64)
        self._base_consumed = np.zeros(0, dtype=np.int64)
        self._base_rg_starts = np.zeros(1, dtype=np.int64)

    def _base_remaining(self) -> int:
        if self._base_path is None:
            return 0
        return int((self._base_cnt - self._base_consumed).sum())

    def _base_unconsumed_table(self) -> pa.Table:
        """Full remaining base rows — O(pending); used only by compaction
        and checkpointing, never by resolve()."""
        if self._base_path is None:
            return _EMPTY
        t = pq.read_table(self._base_path)
        if self._base_consumed.sum():
            pos = np.arange(t.num_rows, dtype=np.int64)
            hi = np.searchsorted(self._base_off, pos, "right") - 1
            keep = pos >= self._base_off[hi] + self._base_consumed[hi]
            t = t.filter(pa.array(keep))
        return t.cast(FRONTIER_SCHEMA)

    def _compact(self) -> None:
        """Merge in-memory pending + unconsumed base rows into a fresh base
        sorted by (host, order-key) with a per-host offset index."""
        parts = [
            t for t in (self._base_unconsumed_table(), self.pending) if t.num_rows
        ]
        self.pending = _EMPTY
        self._drop_base()
        if not parts:
            return
        full = pa.concat_tables(parts).combine_chunks()
        full = full.take(
            pc.sort_indices(
                full, sort_keys=[("host", "ascending")] + _ORDER_KEYS
            )
        )
        self._base_gen += 1
        os.makedirs(_SPILL_DIR, exist_ok=True)
        path = (
            f"{_SPILL_DIR}/shard-{self.shard_id}-{os.getpid()}"
            f"-{self._base_gen}.parquet"
        )
        pq.write_table(full, path, row_group_size=_SPILL_RG_ROWS)
        self._spill_rows_written += full.num_rows
        hosts = np.asarray(full["host"].to_pylist(), dtype=object)
        change = np.nonzero(hosts[1:] != hosts[:-1])[0] + 1
        offs = np.concatenate([[0], change]).astype(np.int64)
        self._base_path = path
        self._base_hosts = [str(h) for h in hosts[offs]]
        self._base_off = offs
        self._base_cnt = np.diff(
            np.concatenate([offs, [len(hosts)]])
        ).astype(np.int64)
        self._base_consumed = np.zeros(len(offs), dtype=np.int64)
        md = pq.ParquetFile(path).metadata
        rg_rows = [md.row_group(i).num_rows for i in range(md.num_row_groups)]
        self._base_rg_starts = np.concatenate([[0], np.cumsum(rg_rows)]).astype(
            np.int64
        )

    def _read_base_heads(self) -> pa.Table:
        """Each host's next-``budget`` pending rows from the sorted base —
        the O(scheduled) read (module docstring has the exactness proof).
        Advances ``consumed`` by the rows taken: they either schedule or
        return to the in-memory pending."""
        if self._base_path is None:
            return _EMPTY
        rem = self._base_cnt - self._base_consumed
        act = np.nonzero(rem > 0)[0]
        if not len(act):
            self._drop_base()
            return _EMPTY
        budgets = np.array(
            [self._budget_for(self._base_hosts[i]) for i in act], dtype=np.int64
        )
        takes = np.minimum(rem[act], budgets)
        starts = self._base_off[act] + self._base_consumed[act]
        stops = starts + takes
        rg_first = np.searchsorted(self._base_rg_starts, starts, "right") - 1
        rg_last = np.searchsorted(self._base_rg_starts, stops - 1, "right") - 1
        rgs = sorted(
            {int(g) for a, b in zip(rg_first, rg_last) for g in range(a, b + 1)}
        )
        pf = pq.ParquetFile(self._base_path)
        tbl = pf.read_row_groups(rgs)
        self._spill_rows_read += tbl.num_rows
        abs_pos = np.concatenate(
            [
                np.arange(self._base_rg_starts[g], self._base_rg_starts[g + 1])
                for g in rgs
            ]
        )
        ii = np.searchsorted(starts, abs_pos, "right") - 1
        sel = (ii >= 0) & (abs_pos < stops[np.clip(ii, 0, None)])
        heads = tbl.filter(pa.array(sel)).cast(FRONTIER_SCHEMA)
        self._base_consumed[act] += takes
        if not self._base_remaining():
            self._drop_base()
        return heads

    def _store_pending(self, t: pa.Table) -> None:
        """Keep newly deferred rows columnar in-heap; past the threshold,
        compact them (plus any base remainder) into the sorted spill base."""
        self.pending = t
        spill_rows = getattr(self.cfg, "pending_spill_rows", 0) or 0
        if spill_rows and t.num_rows > spill_rows:
            self._compact()

    # --------------------------------------------------------------- resolve

    def resolve(self, rnd: int, chunk_rows: int | None = None) -> list:
        t0 = time.monotonic()
        cfg = self.cfg
        m = dict(
            fetched=0, deduped=0, deferred=0, robots_denied=0, errors=0,
            retried=0, redirects=0, offsite=0, scheduled=0,
        )
        # State merges FIRST (cookie jar + AutoThrottle delays): the base
        # head read below sizes per-host reads with the SAME delays the
        # budget step uses, so read-budget >= schedule-budget always holds.
        # Same BSP-barrier timing as before — both merges depend only on
        # round-(k-1) accumulators, nothing earlier in resolve touched them.
        if self._cookie_acc:
            for jar_key, kv in self._cookie_acc.items():
                jar = self._jar.setdefault(jar_key, {})
                for k, v in kv.items():
                    if k not in jar or v > jar[k]:
                        jar[k] = v
            self._cookie_acc = {}
        if cfg.autothrottle_enabled and self._lat_acc:
            for host, (s, n_) in self._lat_acc.items():
                observed = (s / n_) / 1e6  # mean latency, seconds
                target = observed / cfg.autothrottle_target_concurrency
                d0 = self._host_delay.get(host, cfg.autothrottle_start_delay)
                nd = (d0 + target) / 2.0
                nd = min(max(nd, cfg.download_delay), cfg.autothrottle_max_delay)
                self._host_delay[host] = nd
            self._lat_acc = {}

        base_before = self._base_remaining()
        heads = self._read_base_heads()
        unread = base_before - heads.num_rows  # stays deferred, never touched
        tables = [
            t for t in [self.pending, heads] + self._pushed if t.num_rows
        ]
        self.pending = _EMPTY
        self._pushed = []
        self._push_ids.clear()
        m["deduped"] += self._early_deduped
        self._early_deduped = 0
        combined = (
            pa.concat_tables(tables).combine_chunks() if tables else _EMPTY
        )
        # candidates entering this round (the oracle's "frontier non-empty"
        # test) — the engine uses it to record a final all-deduped round.
        # Unread base rows are part of the frontier even though resolve
        # never materialized them.
        n = combined.num_rows
        m["incoming"] = n + unread

        if n:
            # frozen total order, Arrow stable multi-key sort (C++):
            # equal-key rows keep append order exactly like the previous
            # stable Python tuple sort
            combined = combined.take(pc.sort_indices(combined, sort_keys=_ORDER_KEYS))

        # 1. dedup (ordered test-and-insert — inherently sequential per row:
        #    the Nth occurrence's fate depends on the N-1 before it)
        if n:
            fps = combined["fingerprint"].to_pylist()
            skips = combined["skip_dedup"].to_numpy(zero_copy_only=False)
            keep = np.ones(n, dtype=bool)
            seen = self.seen
            for i in range(n):
                if skips[i]:
                    seen.insert(fps[i])
                elif seen.check_and_insert(fps[i]):
                    keep[i] = False
            m["deduped"] += int(n - keep.sum())
            passed = combined.filter(pa.array(keep)) if not keep.all() else combined
        else:
            passed = combined

        # 2. robots (per-URL can_fetch — path-sensitive, so per-row; hosts
        #    without a robots.txt short-circuit to allowed)
        if cfg.robots_obey and passed.num_rows:
            hosts = passed["host"].to_pylist()
            urls = passed["url"].to_pylist()
            rmask = np.fromiter(
                (self._allowed(h, u) for h, u in zip(hosts, urls)),
                dtype=bool,
                count=len(hosts),
            )
            m["robots_denied"] += int(len(hosts) - rmask.sum())
            if not rmask.all():
                passed = passed.filter(pa.array(rmask))

        # (cookie-jar merge and AutoThrottle delay update — formerly steps
        # 2a/2b — run at the TOP of resolve so the base head read sees the
        # same delays; semantics unchanged, see comment there)

        # 3. per-host budget -> scheduled | deferred, fully vectorized:
        #    rank = order-preserving per-host cumcount (rows are sorted),
        #    budget from each host's politeness delay
        np_ = passed.num_rows
        if np_:
            import pandas as pd

            hosts_s = pd.Series(passed["host"].to_pylist())
            uniq = hosts_s.unique()
            if cfg.autothrottle_enabled:
                dmap = {
                    h: self._host_delay.get(h, cfg.autothrottle_start_delay)
                    for h in uniq
                }
            else:
                dmap = dict.fromkeys(uniq, cfg.download_delay)
            # delay <= 0 (politeness off) => unbounded budget, not a
            # ZeroDivisionError; mirrored in CrawlConfig.per_host_budget
            delay = hosts_s.map(dmap).to_numpy(dtype=np.float64)
            rank = hosts_s.groupby(hosts_s, sort=False).cumcount().to_numpy()
            budget = np.where(
                delay > 0,
                np.maximum(1, (cfg.round_duration / np.where(delay > 0, delay, 1.0)).astype(np.int64)),
                1 << 62,
            )
            sched_mask = rank < budget
            sched_tbl = passed.filter(pa.array(sched_mask))
            seqs = rank[sched_mask].astype(np.int32)
            vtimes = rnd * cfg.round_duration + rank[sched_mask] * delay[sched_mask]
            deferred = passed.filter(pa.array(~sched_mask))
            if deferred.num_rows:
                # deferred: mark skip_dedup so re-entry is a pure re-insert
                si = deferred.schema.get_field_index("skip_dedup")
                deferred = deferred.set_column(
                    si,
                    "skip_dedup",
                    pa.array(np.ones(deferred.num_rows, dtype=bool)),
                )
            self._store_pending(deferred)
            # unread base rows are deferred too — they carry to round k+1
            # without ever being materialized this round
            m["deferred"] += deferred.num_rows + unread
        else:
            sched_tbl = _EMPTY
            seqs = np.array([], dtype=np.int32)
            vtimes = np.array([], dtype=np.float64)
            self._store_pending(_EMPTY)
            m["deferred"] += unread

        m["scheduled"] = sched_tbl.num_rows
        m["wall_s"] = time.monotonic() - t0
        self.metrics[rnd] = m
        self.last_scheduled = sched_tbl.num_rows

        if cfg.cookies_enabled and sched_tbl.num_rows:
            jar_hdr = {
                jk: "; ".join(f"{k}={v}" for k, v in sorted(kv.items()))
                for jk, kv in self._jar.items()
            }
            cookie_col = [
                jar_hdr.get((j, h), "")
                for j, h in zip(
                    sched_tbl["cookiejar"].to_pylist(),
                    sched_tbl["host"].to_pylist(),
                )
            ]
        else:
            cookie_col = [""] * sched_tbl.num_rows
        table = (
            sched_tbl.append_column(
                "round", pa.array(np.full(sched_tbl.num_rows, rnd, dtype=np.int32))
            )
            .append_column("fetch_seq_in_host", pa.array(seqs, pa.int32()))
            .append_column("fetch_vtime", pa.array(vtimes, pa.float64()))
            .append_column("cookies", pa.array(cookie_col, pa.string()))
            .cast(SCHEDULED_SCHEMA)
        )

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
    def _pending_table(self) -> pa.Table:
        """Full deferred set (in-memory + base remainder) — checkpoint only."""
        parts = [
            t
            for t in (self.pending, self._base_unconsumed_table())
            if t.num_rows
        ]
        if not parts:
            return _EMPTY
        return pa.concat_tables(parts).combine_chunks()

    def _pending_rows(self) -> int:
        """Row count without materializing the spill base (index counts)."""
        return self.pending.num_rows + self._base_remaining()

    def status(self, rnd: int) -> dict:
        m = dict(self.metrics.get(rnd, {}))
        m["pending"] = self._pending_rows()
        m["seen"] = len(self.seen)
        m["last_scheduled"] = self.last_scheduled
        m["fp_false_positives"] = self.seen.false_positive_checks
        m["spill_rows_read"] = self._spill_rows_read
        m["spill_rows_written"] = self._spill_rows_written
        return m

    def seen_fingerprints(self) -> set[bytes]:
        return self.seen.exact_fingerprints()

    # ------------------------------------------------------------ checkpoint
    def checkpoint(self, ckpt_dir: str, rnd: int) -> None:
        """Persist the full frontier state: deferred (pending) rows AND the
        candidates already pushed for round rnd+1 during round rnd's
        execution — both are needed to resume exactly."""
        os.makedirs(ckpt_dir, exist_ok=True)
        pq.write_table(
            self._pending_table(),
            os.path.join(ckpt_dir, f"pending-{self.shard_id}.parquet"),
        )
        pq.write_table(
            pa.concat_tables(self._pushed) if self._pushed else _EMPTY,
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
                    "jar": self._jar,
                    "cookie_acc": self._cookie_acc,
                },
                f,
            )

    def restore(self, ckpt_dir: str) -> int:
        self._store_pending(
            pq.read_table(
                os.path.join(ckpt_dir, f"pending-{self.shard_id}.parquet")
            ).cast(FRONTIER_SCHEMA)
        )
        pushed = pq.read_table(
            os.path.join(ckpt_dir, f"pushed-{self.shard_id}.parquet")
        ).cast(FRONTIER_SCHEMA)
        self._pushed = [pushed] if pushed.num_rows else []
        with open(os.path.join(ckpt_dir, f"seen-{self.shard_id}.bin"), "rb") as f:
            self.seen = SeenSet.deserialize(f.read())
        with open(os.path.join(ckpt_dir, f"meta-{self.shard_id}.pkl"), "rb") as f:
            d = pickle.load(f)
        self.metrics = d["metrics"]
        self._early_deduped = d.get("early_deduped", 0)
        self._host_delay = d.get("host_delay", {})
        self._lat_acc = d.get("lat_acc", {})
        self._jar = d.get("jar", {})
        self._cookie_acc = d.get("cookie_acc", {})
        self._push_ids.clear()
        return d["round"]

    def ping(self) -> int:
        return self.shard_id
