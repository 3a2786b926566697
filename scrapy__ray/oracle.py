"""Pure-Python single-process reference crawl simulator (SURVEY.md §5.2).

Implements EXACTLY the frozen semantics of scrapy__ray/config.py's docstring,
with plain dicts/lists/sets — no Ray, no Arrow, no shared orchestration code
with the engine.  It stands in for the reference crawler (the mount was empty,
SURVEY.md §0): engine-vs-oracle equivalence of the URL-seen set, per-host
fetch order, round assignment, extracted text bytes, and metric totals is the
correctness gate for every fixture corpus.
"""

from __future__ import annotations

import re
import urllib.robotparser
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from fixtures import faults
from scrapy__ray.config import CrawlConfig
from scrapy__ray.functions.fingerprint import fingerprint_canonical
from scrapy__ray.functions.linkextract import (
    compiled_link_rules,
    link_passes_rules,
    links_from_hrefs,
    resolve_redirect,
)
from scrapy__ray.functions.textextract import extract_page_full
from scrapy__ray.functions.url import (
    escaped_fragment_url,
    host_of,
    url_is_from_any_domain,
)

# M15 detection, written independently of the engine's copy in
# stages/crawl_stages.py (same pinned contract: ASCII meta-fragment tag,
# bytes regex over the first 4096 raw bytes)
_AJAX_META_RE = re.compile(
    rb"<meta\s+name=[\"']fragment[\"']\s+content=[\"']![\"']\s*/?>",
    re.IGNORECASE,
)


def _oracle_proxy(host: str, http_proxy: str, no_proxy: str) -> str:
    """Independent M10 mirror of functions/url.py::effective_proxy (same
    pinned urllib no_proxy convention, separately written).  ``*`` is
    special only as the WHOLE RAW no_proxy value (urllib compares the
    unstripped string, so ``' * '`` does NOT bypass); as a list entry it
    is a literal that matches nothing."""
    if no_proxy == "*":
        return ""
    entries = [e.strip().lower() for e in no_proxy.split(",") if e.strip()]
    for e in entries:
        while e.startswith("."):
            e = e[1:]
        if e and (host == e or host.endswith("." + e)):
            return ""
    return http_proxy


@dataclass
class Candidate:
    url: str
    host: str
    priority: int
    depth: int
    disc_round: int
    parent_url: str
    link_idx: int
    retry_count: int = 0
    redirect_count: int = 0
    skip_dedup: bool = False
    # per-request meta analogues (inherited parent -> child, mirroring
    # the engine's frontier columns): jar id 0 = default jar; meta_proxy
    # "" = env-convention proxy
    cookiejar: int = 0
    meta_proxy: str = ""

    def order_key(self):
        return (-self.priority, self.disc_round, self.parent_url, self.link_idx)


@dataclass
class OracleResult:
    # (url, round, host, fetch_seq_in_host, status, depth) — every fetch attempt
    fetch_log: list[tuple] = field(default_factory=list)
    # url -> extracted text for every 200 fetch
    texts: dict[str, str] = field(default_factory=dict)
    # (url, round) -> Cookie header sent with that fetch attempt (M9)
    cookies_sent: dict[tuple, str] = field(default_factory=dict)
    seen: set[bytes] = field(default_factory=set)
    seen_urls: set[str] = field(default_factory=set)
    metrics: list[dict] = field(default_factory=list)
    rounds: int = 0
    # url -> effective proxy stamped on its requests (M10; '' = direct)
    proxies: dict[str, str] = field(default_factory=dict)

    def totals(self) -> dict:
        keys = [
            "fetched", "deduped", "deferred", "robots_denied",
            "errors", "retried", "redirects", "offsite",
        ]
        return {k: sum(m[k] for m in self.metrics) for k in keys}


def load_corpus(corpus_dir: str):
    import gzip as _gzip
    import os

    pages = pq.read_table(f"{corpus_dir}/pages")
    htmls = pages["html"].to_pylist()
    if "content_encoding" in pages.schema.names:  # gzip fixture variant (M6)
        htmls = [
            _gzip.decompress(h) if enc == "gzip" else h
            for h, enc in zip(htmls, pages["content_encoding"].to_pylist())
        ]
    page_html = dict(zip(pages["url"].to_pylist(), htmls))
    hosts = pq.read_table(f"{corpus_dir}/hosts.parquet")
    n_pages = dict(zip(hosts["host"].to_pylist(), hosts["n_pages"].to_pylist()))
    robots = pq.read_table(f"{corpus_dir}/robots.parquet")
    robots_txt = dict(
        zip(robots["host"].to_pylist(), robots["robots_txt"].to_pylist())
    )
    seeds_t = pq.read_table(f"{corpus_dir}/seeds.parquet")
    n_seeds = seeds_t.num_rows
    seed_jars = (
        seeds_t["cookiejar"].to_pylist()
        if "cookiejar" in seeds_t.schema.names
        else [0] * n_seeds
    )
    seed_proxies = (
        seeds_t["meta_proxy"].to_pylist()
        if "meta_proxy" in seeds_t.schema.names
        else [""] * n_seeds
    )
    seeds = list(
        zip(
            seeds_t["url"].to_pylist(),
            seeds_t["seed_order"].to_pylist(),
            seed_jars,
            seed_proxies,
        )
    )
    sitemaps = []
    sm_path = os.path.join(corpus_dir, "sitemaps.parquet")
    if os.path.exists(sm_path):
        sm = pq.read_table(sm_path)
        sitemaps = list(
            zip(sm["host"].to_pylist(), sm["sitemap_xml"].to_pylist())
        )
    sitemap_docs: dict[str, bytes] = {}
    smd_path = os.path.join(corpus_dir, "sitemap_docs.parquet")
    if os.path.exists(smd_path):
        from scrapy__ray.functions.url import canonicalize_url

        smd = pq.read_table(smd_path)
        sitemap_docs = {
            canonicalize_url(u): b
            for u, b in zip(smd["url"].to_pylist(), smd["body"].to_pylist())
        }
    return page_html, n_pages, robots_txt, seeds, sitemaps, sitemap_docs


class OracleCrawl:
    def __init__(self, corpus_dir: str, config: CrawlConfig | None = None):
        self.cfg = config or CrawlConfig()
        (
            self.page_html,
            self.n_pages,
            robots_txt,
            self.seeds,
            self.sitemaps,
            self.sitemap_docs,
        ) = load_corpus(corpus_dir)
        self._robots_txt = robots_txt
        self._robots: dict[str, urllib.robotparser.RobotFileParser] = {}
        for host, txt in robots_txt.items():
            rp = urllib.robotparser.RobotFileParser()
            rp.parse(txt.splitlines())
            self._robots[host] = rp

    def _allowed(self, host: str, url: str) -> bool:
        rp = self._robots.get(host)
        if rp is None:
            return True
        return rp.can_fetch(self.cfg.user_agent, url)

    def run(self) -> OracleResult:
        cfg = self.cfg
        res = OracleResult()
        host_delay: dict[str, float] = {}  # AutoThrottle per-host state
        # M9 cookie jar: (jar id, host) -> cookies (meta['cookiejar'] keys)
        jar: dict[tuple, dict[str, str]] = {}
        cookie_acc: dict[tuple, dict[str, str]] = {}  # observed this round

        def delay_of(host: str) -> float:
            if cfg.autothrottle_enabled:
                return host_delay.get(host, cfg.autothrottle_start_delay)
            return cfg.download_delay
        frontier: list[Candidate] = [
            Candidate(
                url=u, host=host_of(u), priority=0, depth=0, disc_round=-1,
                parent_url="", link_idx=int(order), skip_dedup=True,
                cookiejar=int(jar or 0), meta_proxy=mp or "",
            )
            for u, order, jar, mp in self.seeds
        ]
        if cfg.sitemap_seeds:
            from scrapy__ray.functions.linkextract import (
                parse_sitemap_urls,
                walk_sitemaps,
            )

            sm_idx: dict[str, int] = {}
            for sm_host, xml in self.sitemaps:
                for u in parse_sitemap_urls(xml):
                    l = sm_idx.get(sm_host, 0)
                    sm_idx[sm_host] = l + 1
                    frontier.append(
                        Candidate(
                            url=u, host=host_of(u), priority=0, depth=0,
                            disc_round=-1, parent_url=f"sitemap:{sm_host}",
                            link_idx=l, skip_dedup=False,
                        )
                    )
            if self.sitemap_docs:
                for sm_host, u in walk_sitemaps(
                    self._robots_txt, self.sitemap_docs
                ):
                    l = sm_idx.get(sm_host, 0)
                    sm_idx[sm_host] = l + 1
                    frontier.append(
                        Candidate(
                            url=u, host=host_of(u), priority=0, depth=0,
                            disc_round=-1, parent_url=f"sitemap:{sm_host}",
                            link_idx=l, skip_dedup=False,
                        )
                    )
        total_fetched = 0

        for rnd in range(cfg.max_rounds):
            if not frontier:
                break
            if cfg.max_pages is not None and total_fetched >= cfg.max_pages:
                break
            m = dict(
                round=rnd, fetched=0, deduped=0, deferred=0, robots_denied=0,
                errors=0, retried=0, redirects=0, offsite=0,
            )
            nxt: list[Candidate] = []

            # cookie-jar merge: round-(k-1) Set-Cookies apply from round k
            # (BSP-barrier timing; max-value rule — config.py COOKIES)
            if cookie_acc:
                for jar_key, kv in cookie_acc.items():
                    j = jar.setdefault(jar_key, {})
                    for k, v in kv.items():
                        if k not in j or v > j[k]:
                            j[k] = v
                cookie_acc = {}

            # 1. DEDUP in global order-key order (same-fp rows share a shard,
            #    so per-shard and global processing agree).
            frontier.sort(key=Candidate.order_key)
            passed: list[Candidate] = []
            for c in frontier:
                fp = fingerprint_canonical(c.url)
                if c.skip_dedup:
                    res.seen.add(fp)
                    res.seen_urls.add(c.url)
                    passed.append(c)
                elif fp in res.seen:
                    m["deduped"] += 1
                else:
                    res.seen.add(fp)
                    res.seen_urls.add(c.url)
                    passed.append(c)

            # 2. ROBOTS
            if cfg.robots_obey:
                kept = []
                for c in passed:
                    if self._allowed(c.host, c.url):
                        kept.append(c)
                    else:
                        m["robots_denied"] += 1
                passed = kept

            # 3. SCHEDULE: per host, order-key rank < budget
            by_host: dict[str, list[Candidate]] = {}
            for c in passed:
                by_host.setdefault(c.host, []).append(c)
            scheduled: list[tuple[Candidate, int]] = []
            for host, rows in by_host.items():
                rows.sort(key=Candidate.order_key)
                d = delay_of(host)
                # delay <= 0 => unbounded budget (mirrors FrontierShard)
                budget = max(1, int(cfg.round_duration / d)) if d > 0 else (1 << 62)
                for rank, c in enumerate(rows):
                    if rank < budget:
                        scheduled.append((c, rank))
                    else:
                        c.skip_dedup = True
                        nxt.append(c)
                        m["deferred"] += 1

            # 4. FETCH + 5. EXPAND
            lat_acc: dict[str, list[int]] = {}  # host -> [sum_us, n] of 200s
            for c, rank in sorted(
                scheduled, key=lambda t: (t[0].host, t[1])
            ):
                url = c.url
                status = faults.status_of(url, c.retry_count)
                if url not in self.page_html:
                    status = faults.STATUS_NOTFOUND
                elif len(self.page_html[url]) > cfg.download_maxsize:
                    status = faults.STATUS_TOOBIG
                res.fetch_log.append((url, rnd, c.host, rank, status, c.depth))
                if cfg.http_proxy or c.meta_proxy:
                    # meta['proxy'] wins outright (HttpProxyMiddleware
                    # skips when 'proxy' is already in meta — no_proxy is
                    # not consulted for it)
                    res.proxies[url] = c.meta_proxy or _oracle_proxy(
                        c.host, cfg.http_proxy, cfg.no_proxy
                    )
                if cfg.cookies_enabled:
                    jk = (c.cookiejar, c.host)
                    res.cookies_sent[(url, rnd)] = "; ".join(
                        f"{k}={v}" for k, v in sorted(jar.get(jk, {}).items())
                    )
                    observed = faults.set_cookies(url, status)
                    if observed:
                        j = cookie_acc.setdefault(jk, {})
                        for k, v in observed.items():
                            if k not in j or v > j[k]:
                                j[k] = v
                if status == faults.STATUS_OK and cfg.autothrottle_enabled:
                    acc = lat_acc.setdefault(c.host, [0, 0])
                    acc[0] += faults.latency_us(url)
                    acc[1] += 1
                if status == faults.STATUS_RETRY:
                    if c.retry_count < cfg.retry_times:
                        c.retry_count += 1
                        c.priority += cfg.retry_priority_adjust
                        c.skip_dedup = True
                        nxt.append(c)
                        m["retried"] += 1
                    else:
                        m["errors"] += 1
                    continue
                if status == faults.STATUS_REDIRECT:
                    if c.redirect_count < cfg.redirect_max_times:
                        loc = faults.redirect_target(
                            url, c.host, self.n_pages.get(c.host, 0)
                        )
                        nxt.append(
                            Candidate(
                                url=loc, host=host_of(loc),
                                priority=c.priority + cfg.redirect_priority_adjust,
                                depth=c.depth, disc_round=rnd, parent_url=url,
                                link_idx=-1, redirect_count=c.redirect_count + 1,
                                cookiejar=c.cookiejar, meta_proxy=c.meta_proxy,
                            )
                        )
                        m["redirects"] += 1
                    else:
                        m["errors"] += 1
                    continue
                if status != faults.STATUS_OK:
                    m["errors"] += 1
                    continue

                html = self.page_html[url]
                text, hrefs, base_href, mr = extract_page_full(html)
                if (
                    cfg.metarefresh_enabled
                    and mr is not None
                    and mr[0] <= cfg.metarefresh_maxdelay
                ):
                    # M5 meta-refresh: html-level redirect, body not parsed
                    if c.redirect_count < cfg.redirect_max_times:
                        loc = resolve_redirect(url, mr[1])
                        nxt.append(
                            Candidate(
                                url=loc, host=host_of(loc),
                                priority=c.priority + cfg.redirect_priority_adjust,
                                depth=c.depth, disc_round=rnd, parent_url=url,
                                link_idx=-1, redirect_count=c.redirect_count + 1,
                                cookiejar=c.cookiejar, meta_proxy=c.meta_proxy,
                            )
                        )
                        m["redirects"] += 1
                    else:
                        m["errors"] += 1
                    continue
                if (
                    cfg.ajaxcrawl_enabled
                    and "_escaped_fragment_" not in url
                    and _AJAX_META_RE.search(html[:4096])
                ):
                    # M15 (checked AFTER M5, the pinned middleware order):
                    # body never surfaced; re-request the escaped-fragment
                    # variant with unchanged priority/depth/redirect-count;
                    # counted as a redirect hop (config.py docstring)
                    nxt.append(
                        Candidate(
                            url=escaped_fragment_url(url), host=c.host,
                            priority=c.priority, depth=c.depth,
                            disc_round=rnd, parent_url=url, link_idx=-1,
                            redirect_count=c.redirect_count,
                            cookiejar=c.cookiejar, meta_proxy=c.meta_proxy,
                        )
                    )
                    m["redirects"] += 1
                    continue
                m["fetched"] += 1
                total_fetched += 1
                res.texts[url] = text
                allow_re, deny_re = compiled_link_rules(
                    cfg.link_allow, cfg.link_deny
                )
                for l, link in enumerate(links_from_hrefs(hrefs, url, base_href)):
                    if not link_passes_rules(link, allow_re, deny_re):
                        continue
                    if not url_is_from_any_domain(link, list(cfg.allowed_domains)):
                        m["offsite"] += 1
                        continue
                    if len(link) > cfg.url_length_limit:
                        continue
                    child_depth = c.depth + 1
                    if cfg.depth_limit and child_depth > cfg.depth_limit:
                        continue
                    nxt.append(
                        Candidate(
                            url=link, host=host_of(link),
                            priority=-child_depth * cfg.depth_priority,
                            depth=child_depth, disc_round=rnd,
                            parent_url=url, link_idx=l,
                            cookiejar=c.cookiejar, meta_proxy=c.meta_proxy,
                        )
                    )

            # AutoThrottle update: round-k latencies shape round-k+1 budgets
            if cfg.autothrottle_enabled:
                for host, (s, n_) in lat_acc.items():
                    observed = (s / n_) / 1e6
                    target = observed / cfg.autothrottle_target_concurrency
                    d0 = host_delay.get(host, cfg.autothrottle_start_delay)
                    nd = (d0 + target) / 2.0
                    host_delay[host] = min(
                        max(nd, cfg.download_delay), cfg.autothrottle_max_delay
                    )

            res.metrics.append(m)
            res.rounds = rnd + 1
            frontier = nxt
        return res


def run_oracle(corpus_dir: str, config: CrawlConfig | None = None) -> OracleResult:
    return OracleCrawl(corpus_dir, config).run()
