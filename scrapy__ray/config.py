"""Pinned crawl configuration + the frozen BSP crawl semantics.

Setting names keep the reference's vocabulary (SURVEY.md §2.10) where the
semantics match (``scrapy/settings/default_settings.py``).  Correctness
fixtures pin the values in FIXTURES.md §5.

THE CRAWL SEMANTICS (frozen — oracle.py and engine.py implement EXACTLY this;
they share scalar functions and the fixture fault model but no orchestration
code, so oracle-vs-engine equivalence is a real check):

Frontier row identity: canonical url + 20-byte fingerprint.  Order key =
``(-priority, disc_round, parent_url, link_idx)`` ascending; seeds have
``(0, -1, "", seed_order)``.  Priority: higher = sooner (Scrapy semantics);
BFO via DEPTH_PRIORITY=1 -> child priority = -child_depth.

Round k (a politeness epoch of ``round_duration`` virtual seconds):
 1. DEDUP  per host-hash shard, candidates in order-key order: rows with
    skip_dedup insert their fingerprint and always pass (dont_filter
    analogue — pinned divergence from Scrapy, which never records
    dont_filter fingerprints; recording keeps "no url fetched twice"
    invariant); else seen fingerprint -> drop (deduped++), unseen ->
    insert + pass.
 2. ROBOTS (if ROBOTSTXT_OBEY): host's robots.txt (stdlib urllib.
    robotparser) disallows url for USER_AGENT -> drop (robots_denied++).
    Runs after the dedup insert, mirroring scheduler-then-downloader order.
 3. SCHEDULE per host: sort by order key, take first per_host_budget
    (= round_duration / DOWNLOAD_DELAY); rest -> deferred to round k+1
    with skip_dedup=True, order key + priority unchanged (deferred++).
    fetch_seq_in_host = rank; virtual fetch time = k*round_duration +
    rank*DOWNLOAD_DELAY (the politeness invariant).
 4. FETCH (simulated by corpus lookup; fault model fixtures/faults.py):
    503 -> retry_count < RETRY_TIMES ? re-emit next round {retry_count+1,
          priority += RETRY_PRIORITY_ADJUST, skip_dedup=True, key unchanged,
          retried++} : drop (errors++)
    301 -> redirect_count < REDIRECT_MAX_TIMES ? candidate {url=Location,
          priority += 2, same depth, disc_round=k, parent_url=source url,
          link_idx=-1, redirect_count+1, skip_dedup=False, redirects++}
          : drop (errors++)
    404 -> errors++, terminal.   200 -> fetched++, extract text + links.
 5. EXPAND 200 pages: per out_link (canonical, page-order l): offsite
    (allowed_domains suffix match) -> drop offsite++; len(url) >
    URLLENGTH_LIMIT -> drop; child_depth = depth+1 > DEPTH_LIMIT -> drop;
    else candidate {priority=-child_depth*DEPTH_PRIORITY, disc_round=k,
    parent_url=page url, link_idx=l, skip_dedup=False}.
 6. frontier_{k+1} = deferred ∪ retries ∪ redirects ∪ links.  Stop when
    empty, or round == max_rounds, or (checked between rounds)
    total fetched >= CLOSESPIDER_PAGECOUNT.

COOKIES (M9, scrapy/downloadermiddlewares/cookies.py analogue; frozen):
 * jar granularity = host (the default single-cookiejar Scrapy spider where
   cookies are domain-scoped; per-request cookiejar meta keys are out of
   scope).  The jar lives in the host's FrontierShard.
 * responses observed during round k (fixtures/faults.py::set_cookies — the
   simulated Set-Cookie headers) merge into the jar BETWEEN rounds; every
   request scheduled in round k carries the jar as of the END of round k-1,
   serialized "name=value; ..." sorted by name (results column
   ``cookies_sent``).  BSP-barrier timing, same as AutoThrottle — a pinned,
   documented divergence from Scrapy's per-response async timing, required
   for deterministic equivalence under parallel fetch.
 * merge rule: per cookie name keep the lexicographically GREATEST value
   (order-independent; Scrapy's last-write-wins depends on arrival timing).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class CrawlConfig:
    allowed_domains: tuple[str, ...] = ("example",)
    # CrawlSpider Rule / LinkExtractor allow/deny url regexes (SURVEY.md P5:
    # scrapy/linkextractors/lxmlhtml.py allow/deny).  Applied to canonical
    # links BEFORE the offsite filter (Scrapy drops at extraction, so denied
    # links never reach the offsite stat); empty allow = allow everything.
    # Drops are silent, as in the reference.
    link_allow: tuple[str, ...] = ()
    link_deny: tuple[str, ...] = ()
    depth_limit: int = 6  # DEPTH_LIMIT (0 = unlimited)
    depth_priority: int = 1  # DEPTH_PRIORITY (1 -> BFO)
    download_delay: float = 1.0  # DOWNLOAD_DELAY, virtual seconds
    round_duration: float = 8.0  # politeness epoch length
    robots_obey: bool = True  # ROBOTSTXT_OBEY
    cookies_enabled: bool = True  # COOKIES_ENABLED (M9; semantics above)
    retry_times: int = 2  # RETRY_TIMES
    retry_priority_adjust: int = -1  # RETRY_PRIORITY_ADJUST
    redirect_max_times: int = 20  # REDIRECT_MAX_TIMES
    redirect_priority_adjust: int = 2
    # MetaRefreshMiddleware (M5): a 200 page whose html carries
    # <meta http-equiv=refresh content="N; url=T"> with N <= maxdelay is
    # treated as a redirect to T (urljoin'd against the page url, NOT the
    # <base>, mirroring scrapy/downloadermiddlewares/redirect.py::
    # MetaRefreshMiddleware); its text is not extracted, its links not
    # followed, and the fetch-log row keeps status 200 with null text.
    metarefresh_enabled: bool = True  # METAREFRESH_ENABLED
    metarefresh_maxdelay: float = 100.0  # METAREFRESH_MAXDELAY
    # M15 AjaxCrawlMiddleware (scrapy/downloadermiddlewares/ajaxcrawl.py,
    # AJAXCRAWL_ENABLED — off by default upstream too): a 200 HTML page
    # whose first 4096 bytes contain <meta name="fragment" content="!"> is
    # AJAX-crawlable; its body is not surfaced (null text, no links, the
    # fetch-log row keeps status 200) and the engine re-requests the
    # escaped-fragment variant (functions/url.py::escaped_fragment_url)
    # with unchanged priority/depth, counted in the redirects metric like
    # M5 hops.  Pages already carrying _escaped_fragment_ never re-expand
    # (the meta['ajax_crawlable'] loop guard).  Pinned order vs M5: the
    # meta-refresh check runs FIRST (response middlewares run highest
    # priority first: MetaRefresh 580 before AjaxCrawl 560).
    ajaxcrawl_enabled: bool = False  # AJAXCRAWL_ENABLED
    # M10 HttpProxyMiddleware (scrapy/downloadermiddlewares/httpproxy.py):
    # upstream reads urllib.request.getproxies() once at init (http_proxy /
    # no_proxy env convention) and stamps request.meta['proxy'] unless the
    # host is bypassed.  Offline analogue: ``http_proxy`` is the proxy URL
    # for the corpus's http scheme; ``no_proxy`` is the comma-separated
    # bypass list ('*' = bypass all; an entry matches the exact hostname or
    # any dot-suffix, urllib.request.proxy_bypass_environment semantics).
    # The effective proxy per request is stamped on every results row
    # (``proxy`` column — the meta['proxy'] analogue); the downloader slot
    # key stays the HOST (upstream _get_slot_key ignores the proxy), so
    # politeness/budgeting are untouched.  Per-request meta['proxy']
    # overrides have no analogue (no per-request meta in the row model;
    # documented out).
    http_proxy: str = ""
    no_proxy: str = ""
    # AutoThrottle (T2, scrapy/extensions/throttle.py): per-host adaptive
    # delay.  Law (frozen; engine and oracle implement identically): only
    # status-200 responses update; per round, observed = mean latency of the
    # host's 200s (integer-microsecond inputs, so accumulation order can't
    # change the sum); target = observed / target_concurrency;
    # delay <- clamp((delay + target)/2, [download_delay, max_delay]);
    # starting delay = start_delay.  Budget and virtual fetch times use the
    # host's current delay.  Pinned divergence: Scrapy also raises delay on
    # error responses ("never decrease on error"); here errors simply don't
    # update, which the shared oracle makes falsifiable.
    autothrottle_enabled: bool = False  # AUTOTHROTTLE_ENABLED
    autothrottle_start_delay: float = 5.0  # AUTOTHROTTLE_START_DELAY
    autothrottle_max_delay: float = 60.0  # AUTOTHROTTLE_MAX_DELAY
    autothrottle_target_concurrency: float = 1.0
    url_length_limit: int = 2083  # URLLENGTH_LIMIT
    # DOWNLOAD_MAXSIZE (S2): a body larger than this aborts the download;
    # Scrapy surfaces it as a download error (terminal, no retry by default
    # since CancelledError is not in RETRY_EXCEPTIONS) -> errors++ here.
    download_maxsize: int = 1 << 30
    # DOWNLOAD_TIMEOUT for the real-socket net handler (sources/netfetch):
    # upstream defaults to 180 s; 15 s suits the loopback/sandbox scale and
    # bounds how long one dead host can stall a fetch task.  Ignored by the
    # simulated corpus (no network).
    download_timeout: float = 15.0
    max_rounds: int = 10_000
    max_pages: int | None = None  # CLOSESPIDER_PAGECOUNT
    dedup: str = "exact"  # "exact" | "cuckoo"
    num_shards: int = 8  # seen-set shard actors
    # Push-aggregation layer for multi-node fan-in (0 = direct pushes).
    # Direct mode costs tasks x touched-shards RPCs per round — fine on one
    # node (26 tasks x 8 shards), quadratic trouble at the design point
    # (3 tasks/cpu x 3,200 cpus = 9,600 tasks x 32 shards ≈ 300k RPCs per
    # round converging on 32 actors).  With A aggregators (deploy one per
    # node via the SPREAD scheduling the engine requests), each task sends
    # ONE absorb RPC to its aggregator and the driver flushes A x S
    # combined pushes per round: 9,600 + 100x32 ≈ 12.8k RPCs, and each
    # shard receives A batched calls instead of 9,600.  Exactness is
    # untouched: aggregators forward the per-(task-batch, shard) idempotency
    # keys verbatim and flush BEFORE the round's checkpoint/resolve, so the
    # shard-visible push sequence is a batched permutation of direct mode —
    # push absorb order never affects resolve output (order-key sort).
    push_aggregators: int = 0
    # FLOOR on rows per scheduled block emitted by resolve(): the task
    # granularity of the fetch/extract/expand stage.  The engine adapts the
    # actual chunk so each round yields ~3 tasks per cpu — fine enough that
    # the slowest shard can't gate the BSP round, coarse enough that the
    # per-task push fan-out (one RPC per touched shard) stays amortized
    # (fixed 4096 chunks measured 3x slower at 8 cpus: 8x the push RPCs).
    scheduled_chunk_rows: int = 2048
    # Deferred-candidate rows a FrontierShard keeps in-heap between rounds;
    # beyond this the pending set compacts into a (host, order-key)-sorted
    # parquet base (JOBDIR disk-queue analogue, scrapy/squeues.py) from
    # which each resolve reads only every host's next-budget head rows —
    # O(scheduled), not O(pending) (frontier_shard.py docstring has the
    # exactness proof).  0 disables spilling.
    pending_spill_rows: int = 1_000_000
    # Checkpoint cadence: persist shard state + _COMMITTED every N completed
    # rounds (plus once at run end).  Checkpoints are pure snapshots, so a
    # crash loses at most N-1 rounds of work and the resume is still
    # byte-identical (the engine re-runs from the last committed round and
    # drops any later partial outputs).  Each checkpoint writes the full
    # pending+seen state — GBs per round on big crawls — so the bench runs
    # with a coarser cadence while the correctness fixtures keep 1.
    checkpoint_every_n: int = 1
    # S5 HTTP-cache analogue (HTTPCACHE_ENABLED; scrapy/extensions/
    # httpcache.py::FilesystemCacheStorage + DummyPolicy — cache every
    # response, serve every hit).  Fetch results persist under
    # <out_dir>/httpcache keyed by request fingerprint, so a resume that
    # replays rounds past the last committed checkpoint refetches NOTHING
    # (zero corpus/network lookups for pre-crash work — tested by deleting
    # the corpus pages before the resume).  Off by default, like upstream.
    http_cache: bool = False
    user_agent: str = "scrapy__ray"
    concurrency: int | None = None  # fetch/extract pool size (None = auto)
    # SitemapSpider analogue (P6): when True, urls listed in the corpus's
    # sitemaps.parquet become additional round-0 seeds (dedup applies —
    # unlike start_urls they are NOT dont_filter'd), ordered after the seed
    # list via parent_url = "sitemap:<host>".
    sitemap_seeds: bool = False
    # FeedExporter analogue (SURVEY.md S4, scrapy/extensions/feedexport.py):
    # per-round results sink format. parquet is the resumable default;
    # json = JSON-lines, csv for interop (FEED_FORMAT vocabulary).
    output_format: str = "parquet"  # "parquet" | "json" | "csv"
    # WARC response-archive sink (S4/S6 completeness; the scrapy-warcio
    # ecosystem's export surface): when True, every 200 fetch's RAW BODY is
    # additionally written as Common-Crawl-layout multi-member .warc.gz
    # shards under <out>/warc/round-XXXXX/ by a tee stage between fetch
    # and extract (extract drops html, so the tee is the last point the
    # bytes exist).  Shards are deterministic (content-named, mtime=0,
    # sha1 record ids) and idempotent under task retry; resume deletes
    # partially-written later rounds exactly like the results sink.
    warc_export: bool = False

    @property
    def per_host_budget(self) -> int:
        # download_delay <= 0 (politeness off) => effectively unbounded
        if self.download_delay <= 0:
            return 1 << 62
        return max(1, int(self.round_duration / self.download_delay))


#: FIXTURES.md §5 pinned correctness config.
FIXTURE_CONFIG = CrawlConfig()
