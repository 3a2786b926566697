"""The Ray-Data-native BSP crawl engine (SURVEY.md §3.4).

Replaces the reference's single-threaded reactor control loop
(``scrapy/core/engine.py::ExecutionEngine._next_request``) with a round-based
bulk-synchronous loop over Datasets + sharded frontier actors:

    round k:
      [FrontierShard x S].resolve(k)        # dedup + robots + budget (actors)
      -> ray.data.from_arrow_refs(refs)     # scheduled rows, one block/shard
      -> map_batches(fetch_batch)           # simulated fetch, partition-cached
      -> map_batches(extract_batch)         # byte-exact text + links; drop html
      -> map_batches(expand_push_batch)     # filters; push candidates to shards
      -> write_parquet(results/round=k)     # the BSP barrier + the output sink
      checkpoint: shard pending+seen state, metrics, _COMMITTED marker

Design notes (scale rationale):
  * The frontier exchange is a hash shuffle BY CONSTRUCTION — expand tasks
    push each candidate to the shard that owns its host_hash.  Using
    ``Dataset.repartition(keys=[...])`` per round was measured to re-spawn
    hash-shuffle aggregator pools per execution (~seconds of fixed overhead
    per round); pushing into the long-lived shard actors gives the same
    partitioning with per-round overhead in milliseconds, and the stable
    seen-set/scheduler state must live in those actors anyway.
  * One Ray Data streaming execution per round; all stages are stateless
    tasks, so warm worker processes are reused across rounds (no actor-pool
    respawn); per-process LRU caches hold corpus partitions.
  * Results land as one parquet directory per round — the resumability unit.
    A killed run restarts from the last _COMMITTED checkpoint and reproduces
    byte-identical subsequent rounds (tested).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from dataclasses import dataclass, field
from functools import partial

import pyarrow as pa
import pyarrow.parquet as pq

import fixtures.gen as fxgen
from scrapy__ray.config import CrawlConfig
from scrapy__ray.schema import FRONTIER_SCHEMA, METRICS_SCHEMA
from scrapy__ray.stages.crawl_stages import (
    expand_push_batch,
    extract_batch,
    fetch_batch,
    warc_tee_batch,
)
from scrapy__ray.pipelines.util import _install_log_filter
from scrapy__ray.stages.stats import StatsCollector
from scrapy__ray.state.frontier_shard import FrontierShard
from scrapy__ray.functions.fingerprint import fingerprint_canonical
from scrapy__ray.functions.url import host_of

_install_log_filter()  # silence Ray's benign schema-hash warning (see util)

_METRIC_KEYS = [
    "fetched", "deduped", "deferred", "robots_denied", "errors",
    "retried", "redirects", "offsite", "scheduled",
]


@dataclass
class CrawlSummary:
    rounds: int
    total_fetched: int
    totals: dict
    out_dir: str
    round_metrics: list = field(default_factory=list)
    urls_per_sec: float = 0.0
    wall_s: float = 0.0
    phase_s: dict = field(default_factory=dict)


class CrawlEngine:
    def __init__(
        self,
        corpus_dir: str,
        out_dir: str,
        cfg: CrawlConfig | None = None,
        resume: bool = False,
    ):
        import ray

        self.corpus_dir = corpus_dir
        self.out_dir = out_dir
        self.cfg = cfg or CrawlConfig()
        self.start_round = 0
        self.total_fetched = 0
        S = self.cfg.num_shards

        robots_t = pq.read_table(os.path.join(corpus_dir, "robots.parquet"))
        robots = dict(
            zip(robots_t["host"].to_pylist(), robots_t["robots_txt"].to_pylist())
        )
        per_shard_robots: list[dict[str, str]] = [{} for _ in range(S)]
        for h, txt in robots.items():
            per_shard_robots[fxgen.host_hash(h) % S][h] = txt

        ShardActor = ray.remote(FrontierShard)
        # per-shard CPU share: 0.1 spreads shards across nodes on a real
        # cluster, but must shrink when S x 0.1 would exceed HALF the
        # cluster's CPUs (64 shards on a 4-cpu test session would deadlock
        # actor scheduling otherwise) — shards are state actors, mostly
        # idle between resolve calls, so a smaller reservation only affects
        # placement, not correctness
        total_cpus = ray.cluster_resources().get("CPU", 8.0)
        shard_cpu = min(0.1, (total_cpus / 2.0) / max(S, 1))
        self.shards = [
            ShardActor.options(num_cpus=shard_cpu, max_restarts=0).remote(
                i, self.cfg, per_shard_robots[i]
            )
            for i in range(S)
        ]
        self.stats = ray.remote(StatsCollector).options(num_cpus=0).remote()
        # optional per-node push-aggregation layer (config.py docstring has
        # the RPC arithmetic; state/push_agg.py the exactness argument).
        # SPREAD scheduling places one per node when sized to the cluster.
        self.aggregators = None
        if self.cfg.push_aggregators > 0:
            from scrapy__ray.state.push_agg import PushAggregator

            Agg = ray.remote(PushAggregator)
            self.aggregators = [
                Agg.options(num_cpus=0, scheduling_strategy="SPREAD").remote(
                    self.shards
                )
                for _ in range(self.cfg.push_aggregators)
            ]
        # decode-once plasma corpus cache (sources/corpus.py); threaded so
        # first-touch loads of different partitions decode in parallel
        from scrapy__ray.sources.corpus import CorpusPartRegistry

        self.registry = (
            ray.remote(CorpusPartRegistry)
            .options(num_cpus=0, max_concurrency=32)
            .remote()
        )
        # pre-warm: fire one decode per partition now (fire-and-forget) so
        # round 0's tasks find published refs instead of stampeding the
        # registry — the first-touch queue cost was ~4 cpu-s per round-0
        # task at 32 cpus, a pure fixed cost on the scaling-efficiency rule
        from scrapy__ray.sources.corpus import corpus_meta

        meta = corpus_meta(corpus_dir)
        self._net_mode = meta.get("type") == "net"
        if meta.get("type") not in ("fsdir", "net") and not meta.get("gzip"):
            for p in range(int(meta.get("n_parts", 0))):
                self.registry.get_part.remote(corpus_dir, p)

        ckpt_round = self._latest_checkpoint() if resume else None
        if ckpt_round is not None:
            ray.get(
                [s.restore.remote(self._ckpt_dir(ckpt_round)) for s in self.shards]
            )
            with open(os.path.join(self._ckpt_dir(ckpt_round), "state.json")) as f:
                st = json.load(f)
            self.start_round = st["round"] + 1
            self.total_fetched = st["total_fetched"]
            # pre-resume per-round metrics: replayed into run() so a resumed
            # run's metrics.parquet equals an uninterrupted run's
            self._prior_round_metrics = st.get("round_metrics", [])
            # drop any partially-written later round outputs (the WARC
            # sink follows the results sink's round-directory contract)
            for sub in ("results", "warc"):
                root = os.path.join(out_dir, sub)
                if os.path.isdir(root):
                    for d in sorted(os.listdir(root)):
                        r = int(d.rsplit("-", 1)[1])
                        if r > st["round"]:
                            shutil.rmtree(os.path.join(root, d))
        else:
            if os.path.exists(out_dir):
                shutil.rmtree(out_dir)
            os.makedirs(out_dir, exist_ok=True)
            self._push_seeds()

    # ------------------------------------------------------------------ util
    def _ckpt_dir(self, rnd: int) -> str:
        return os.path.join(self.out_dir, "ckpt", f"round={rnd:05d}")

    def _latest_checkpoint(self) -> int | None:
        root = os.path.join(self.out_dir, "ckpt")
        if not os.path.isdir(root):
            return None
        committed = [
            int(d.split("=")[1])
            for d in os.listdir(root)
            if os.path.exists(os.path.join(root, d, "_COMMITTED"))
        ]
        return max(committed) if committed else None

    def _push_seeds(self) -> None:
        """Seeds -> frontier round 0 (Spider.start_requests, dont_filter=True);
        optionally expanded with sitemap-listed urls (P6, dedup applies)."""
        import ray

        t = pq.read_table(os.path.join(self.corpus_dir, "seeds.parquet"))
        S = self.cfg.num_shards
        rows_by_shard: dict[int, list[tuple]] = {}
        n_seeds = t.num_rows
        # optional per-seed Request.meta analogues: a seeds.parquet may
        # carry cookiejar (int) / meta_proxy (string) columns — the
        # multi-identity crawl entry point; descendants inherit them
        jars = (
            t["cookiejar"].to_pylist()
            if "cookiejar" in t.schema.names
            else [0] * n_seeds
        )
        mproxies = (
            t["meta_proxy"].to_pylist()
            if "meta_proxy" in t.schema.names
            else [""] * n_seeds
        )
        for url, order, jar, mp in zip(
            t["url"].to_pylist(), t["seed_order"].to_pylist(), jars, mproxies
        ):
            host = host_of(url)
            hh = fxgen.host_hash(host)
            row = (
                url, host, hh, fingerprint_canonical(url), 0, 0, -1, "",
                int(order), 0, 0, True, int(jar or 0), mp or "",
            )
            rows_by_shard.setdefault(hh % S, []).append(row)

        sm_path = os.path.join(self.corpus_dir, "sitemaps.parquet")
        sm_idx: dict[str, int] = {}  # per-sitemap-host running link_idx
        if self.cfg.sitemap_seeds and os.path.exists(sm_path):
            from scrapy__ray.functions.linkextract import parse_sitemap_urls

            sm = pq.read_table(sm_path)
            for sm_host, xml in zip(
                sm["host"].to_pylist(), sm["sitemap_xml"].to_pylist()
            ):
                for url in parse_sitemap_urls(xml):
                    host = host_of(url)
                    hh = fxgen.host_hash(host)
                    l = sm_idx.get(sm_host, 0)
                    sm_idx[sm_host] = l + 1
                    row = (
                        url, host, hh, fingerprint_canonical(url), 0, 0, -1,
                        f"sitemap:{sm_host}", l, 0, 0, False, 0, "",
                    )
                    rows_by_shard.setdefault(hh % S, []).append(row)
        # full SitemapSpider traversal (P6 completeness): robots.txt
        # ``Sitemap:`` directives -> sitemap-index recursion -> urlset
        # pages, with .xml.gz bodies inflated; sitemap_docs.parquet holds
        # (url, body) for every sitemap document of the corpus
        smd_path = os.path.join(self.corpus_dir, "sitemap_docs.parquet")
        if self.cfg.sitemap_seeds and os.path.exists(smd_path):
            from scrapy__ray.functions.linkextract import walk_sitemaps
            from scrapy__ray.functions.url import canonicalize_url

            smd = pq.read_table(smd_path)
            docs = {
                canonicalize_url(u): b
                for u, b in zip(
                    smd["url"].to_pylist(), smd["body"].to_pylist()
                )
            }
            rt = pq.read_table(os.path.join(self.corpus_dir, "robots.parquet"))
            robots_map = dict(
                zip(rt["host"].to_pylist(), rt["robots_txt"].to_pylist())
            )
            for sm_host, url in walk_sitemaps(robots_map, docs):
                host = host_of(url)
                hh = fxgen.host_hash(host)
                l = sm_idx.get(sm_host, 0)
                sm_idx[sm_host] = l + 1
                row = (
                    url, host, hh, fingerprint_canonical(url), 0, 0, -1,
                    f"sitemap:{sm_host}", l, 0, 0, False, 0, "",
                )
                rows_by_shard.setdefault(hh % S, []).append(row)
        refs = []
        for sh, rows in rows_by_shard.items():
            cols = list(zip(*rows))
            tbl = pa.Table.from_arrays(
                [
                    pa.array(list(c), type=f.type)
                    for c, f in zip(cols, FRONTIER_SCHEMA)
                ],
                schema=FRONTIER_SCHEMA,
            )
            refs.append(self.shards[sh].push.remote(f"seeds:{sh}", tbl))
        ray.get(refs)

    # ------------------------------------------------------------------- run
    def run(self) -> CrawlSummary:
        import ray

        cfg = self.cfg
        t_start = time.monotonic()
        # per-phase wall accounting (resolve barrier / dataset exec+write /
        # driver bookkeeping / checkpoint) — drives scaling-efficiency work;
        # summed per run and exposed on the summary as `phase_s`
        phases = {"resolve": 0.0, "exec": 0.0, "driver": 0.0, "ckpt": 0.0}
        round_metrics: list[dict] = [
            dict(m) for m in getattr(self, "_prior_round_metrics", [])
        ]
        rnd = self.start_round
        last_done: int | None = None  # last round with a results barrier
        self._last_ckpt: int | None = None
        # once the final all-deduped resolve has consumed shard state, a
        # snapshot would no longer correspond to any completed round
        state_past_last_done = False
        while rnd < cfg.max_rounds:
            if cfg.max_pages is not None and self.total_fetched >= cfg.max_pages:
                break
            # resolve returns a LIST of ~chunk_rows block refs per shard;
            # chunk adapts to last round's volume: ~3 tasks per cpu.  The
            # 2048-row floor guards the push-RPC fan-out (tasks x shards
            # per round): A/B-measured on sf-scale at 32 cpus, floor 512
            # (96 tasks/round) ran 22% SLOWER than floor 2048 (26
            # tasks/round) — per-task push fan-out dominates the extra
            # load-balance granularity.  Do not lower it.
            t_ph = time.monotonic()
            cpus = int(ray.cluster_resources().get("CPU", 8))
            chunk = max(
                cfg.scheduled_chunk_rows,
                -(-getattr(self, "_last_sched", 0) // (cpus * 3)),
            )
            ref_lists = ray.get(
                [s.resolve.remote(rnd, chunk) for s in self.shards]
            )
            shard_stats = ray.get([s.status.remote(rnd) for s in self.shards])
            phases["resolve"] += time.monotonic() - t_ph
            n_sched = sum(st["scheduled"] for st in shard_stats)
            self._last_sched = n_sched
            if n_sched == 0:
                # The oracle counts a round whenever the frontier was
                # non-empty, even if every candidate was deduped or
                # robots-denied and nothing got scheduled (a crawl that
                # saturates by dedup ends this way).  Mirror it: record the
                # shard-derived metrics for this final round, then stop.
                state_past_last_done = True
                if any(st.get("incoming", 0) for st in shard_stats):
                    m = {k: 0 for k in _METRIC_KEYS}
                    for st in shard_stats:
                        for k in ("deduped", "deferred", "robots_denied",
                                  "scheduled"):
                            m[k] += st.get(k, 0)
                    m["round"] = rnd
                    round_metrics.append(m)
                    rnd += 1
                break
            sched_refs = [r for lst in ref_lists for r in lst]

            t_ph = time.monotonic()
            ds = ray.data.from_arrow_refs(sched_refs)
            fetched = ds.map_batches(
                partial(
                    fetch_batch,
                    corpus_dir=self.corpus_dir,
                    download_maxsize=cfg.download_maxsize,
                    cache_dir=(
                        os.path.join(self.out_dir, "httpcache")
                        if cfg.http_cache
                        else None
                    ),
                    registry=self.registry,
                    download_timeout=cfg.download_timeout,
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
            if cfg.warc_export:
                # S4 WARC sink: tee the raw bodies out BEFORE extract
                # drops the html column (see warc_tee_batch)
                fetched = fetched.map_batches(
                    partial(
                        warc_tee_batch,
                        warc_dir=os.path.join(self.out_dir, "warc"),
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            results = (
                fetched.map_batches(
                    partial(extract_batch, ajax_detect=cfg.ajaxcrawl_enabled),
                    batch_format="pyarrow",
                    batch_size=None,
                )
                .map_batches(
                    partial(
                        expand_push_batch,
                        cfg=cfg,
                        shards=self.shards,
                        stats=self.stats,
                        aggregators=self.aggregators,
                        net_mode=self._net_mode,
                    ),
                    batch_format="pyarrow",
                    batch_size=None,
                )
            )
            res_dir = os.path.join(self.out_dir, "results", f"round-{rnd:05d}")
            # the write is the BSP execution barrier: pushes complete first
            if cfg.output_format == "json":
                results.write_json(res_dir)
            elif cfg.output_format == "csv":
                results.write_csv(res_dir)
            elif cfg.output_format == "parquet":
                results.write_parquet(res_dir)
            else:
                raise ValueError(
                    f"unknown output_format {cfg.output_format!r} "
                    "(expected parquet | json | csv)"
                )

            # drain the aggregation layer INSIDE the barrier: every buffered
            # candidate lands on its shard before metrics/checkpoint/resolve
            if self.aggregators is not None:
                ray.get([a.flush.remote() for a in self.aggregators])
            phases["exec"] += time.monotonic() - t_ph
            t_ph = time.monotonic()
            last_done = rnd
            fetch_m = ray.get(self.stats.get_round.remote(rnd))
            self.total_fetched += fetch_m.get("fetched", 0)
            m = {k: 0 for k in _METRIC_KEYS}
            for st in shard_stats:
                for k in ("deduped", "deferred", "robots_denied", "scheduled"):
                    m[k] += st.get(k, 0)
            for k in ("fetched", "errors", "retried", "redirects", "offsite"):
                m[k] += fetch_m.get(k, 0)
            m["round"] = rnd
            round_metrics.append(m)

            # checkpoint cadence: every Nth completed round (snapshots are
            # self-contained, so skipping intermediates only bounds how much
            # work a crash replays — resume stays byte-identical)
            phases["driver"] += time.monotonic() - t_ph
            if (rnd + 1) % max(1, cfg.checkpoint_every_n) == 0:
                t_ph = time.monotonic()
                self._checkpoint(rnd, round_metrics)
                phases["ckpt"] += time.monotonic() - t_ph
            rnd += 1

        # final checkpoint if the cadence skipped the last completed round
        # (skipped when the trailing all-deduped resolve already consumed
        # shard state — an older checkpoint then resumes identically)
        if (
            last_done is not None
            and self._last_ckpt != last_done
            and not state_past_last_done
        ):
            self._checkpoint(last_done, round_metrics)

        wall = time.monotonic() - t_start
        if os.environ.get("SCRAPY_RAY_STAGE_TIMING") == "1":
            tm = ray.get(self.stats.timing.remote())
            agg: dict[str, float] = {}
            for rm in tm.values():
                for k, v in rm.items():
                    if k.startswith("max_"):
                        agg[k] = max(agg.get(k, 0.0), v)
                    else:
                        agg[k] = agg.get(k, 0.0) + v
            phases["stages"] = {k: round(v, 3) for k, v in sorted(agg.items())}
        totals = {k: sum(m[k] for m in round_metrics) for k in _METRIC_KEYS}
        self._write_metrics(round_metrics)
        return CrawlSummary(
            rounds=rnd,
            total_fetched=self.total_fetched,
            totals=totals,
            out_dir=self.out_dir,
            round_metrics=round_metrics,
            urls_per_sec=(self.total_fetched / wall if wall > 0 else 0.0),
            wall_s=wall,
            phase_s={k: (v if isinstance(v, dict) else round(v, 3))
                     for k, v in phases.items()},
        )

    def _checkpoint(self, rnd: int, round_metrics: list[dict]) -> None:
        import ray

        ckpt = self._ckpt_dir(rnd)
        ray.get([s.checkpoint.remote(ckpt, rnd) for s in self.shards])
        with open(os.path.join(ckpt, "state.json"), "w") as f:
            json.dump(
                {
                    "round": rnd,
                    "total_fetched": self.total_fetched,
                    "round_metrics": round_metrics,
                },
                f,
            )
        with open(os.path.join(ckpt, "_COMMITTED"), "w") as f:
            f.write("ok")
        self._last_ckpt = rnd

    def _write_metrics(self, round_metrics: list[dict]) -> None:
        cols = {
            "round": [m["round"] for m in round_metrics],
            "shard_id": [-1] * len(round_metrics),
            **{
                k: [m[k] for m in round_metrics]
                for k in _METRIC_KEYS
                if k != "scheduled"
            },
            "scheduled": [m["scheduled"] for m in round_metrics],
            "wall_s": [0.0] * len(round_metrics),
        }
        tbl = pa.Table.from_arrays(
            [pa.array(cols[f.name], type=f.type) for f in METRICS_SCHEMA],
            schema=METRICS_SCHEMA,
        )
        pq.write_table(tbl, os.path.join(self.out_dir, "metrics.parquet"))

    # ------------------------------------------------------------ inspection
    def seen_fingerprints(self) -> set[bytes]:
        import ray

        out: set[bytes] = set()
        for s in ray.get([s.seen_fingerprints.remote() for s in self.shards]):
            out |= s
        return out

    def shutdown(self) -> None:
        import ray

        for a in self.shards + [self.stats, self.registry]:
            ray.kill(a)


def crawl(
    corpus_dir: str,
    out_dir: str,
    cfg: CrawlConfig | None = None,
    resume: bool = False,
    keep_engine: bool = False,
):
    """Library entry point (the CrawlerRunner analogue, SURVEY.md §3.2)."""
    eng = CrawlEngine(corpus_dir, out_dir, cfg=cfg, resume=resume)
    summary = eng.run()
    if keep_engine:
        return summary, eng
    eng.shutdown()
    return summary
