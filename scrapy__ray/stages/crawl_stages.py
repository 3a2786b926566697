"""Per-round map_batches stages: fetch -> extract -> expand+push.

All three are stateless task functions over Arrow batches (zero-copy from the
object store); per-process caches in sources/corpus.py amortize partition
loads, so no actor pools need respawning each BSP round.  The wide binary
``html`` column exists only between fetch and extract and is dropped
immediately after parsing (SURVEY.md §7 hard-part 4).

Stage mapping to the reference (SURVEY.md §2):
  fetch_batch   = downloader + DownloadTimeout/UserAgent stamping (S2, M7/M8)
  extract_batch = Scraper.call_spider -> parse() text + LinkExtractor (P1-P4)
  expand_push   = Retry/Redirect middlewares (M3/M4), Offsite (M2),
                  UrlLength (M13), Depth (F5) + scheduler enqueue (push)
"""

from __future__ import annotations

import hashlib
import os as _os
import re
import time as _time

import pyarrow as pa

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
    effective_proxy,
    escaped_fragment_url,
    host_of,
    url_is_from_any_domain,
)
from scrapy__ray.schema import RESULTS_SCHEMA, FRONTIER_SCHEMA, FRONTIER_COLS
from scrapy__ray.sources.corpus import host_page_counts, lookup_html

import fixtures.gen as fxgen


# --------------------------------------------------------- stage diagnostics
# SCRAPY_RAY_STAGE_TIMING=1: per-stage wall accumulates in this process
# global (the three stages of one block run fused in one task, so the
# read-and-reset in expand_push_batch attributes them to that block) and
# ships to the StatsCollector's side channel — never the oracle metrics.
_STAGE_TIMING = _os.environ.get("SCRAPY_RAY_STAGE_TIMING") == "1"
_STAGE_T = {"fetch": 0.0, "extract": 0.0}


def _stage_add(name: str, dt: float) -> None:
    # a module-level named function: cloudpickle ships closures that call it
    # BY REFERENCE, so accumulation lands in the worker's module global (a
    # closure mutating _STAGE_T directly gets a by-value copy instead, and
    # the expand-stage read-out sees zeros)
    _STAGE_T[name] += dt


def _stage_timed(name):
    def deco(fn):
        if not _STAGE_TIMING:
            return fn

        def wrapped(*a, **kw):
            t0 = _time.monotonic()
            try:
                return fn(*a, **kw)
            finally:
                _stage_add(name, _time.monotonic() - t0)

        wrapped.__name__ = fn.__name__
        wrapped.__qualname__ = fn.__qualname__
        wrapped.__module__ = fn.__module__
        return wrapped

    return deco


# ------------------------------------------------------------------- fetch
def _cache_path(cache_dir: str, fp: bytes, rc: int) -> str:
    """S5 HTTP-cache layout (scrapy/extensions/httpcache.py::
    FilesystemCacheStorage): fingerprint-keyed, first-byte sharded dirs.
    The key also includes the retry attempt because the simulated fault
    model is attempt-dependent (a 503 first try succeeds on retry); a real
    deployment keys on the fingerprint alone, per the DummyPolicy."""
    h = fp.hex()
    return f"{cache_dir}/{h[:2]}/{h}-{rc}.pkl"


def _cache_get(cache_dir: str, fp: bytes, rc: int):
    import pickle

    try:
        with open(_cache_path(cache_dir, fp, rc), "rb") as f:
            return pickle.load(f)
    except (OSError, pickle.PickleError, EOFError):
        return None


def _cache_put(cache_dir: str, fp: bytes, rc: int, entry: tuple) -> None:
    """Atomic S5 cache write (tmp + rename) — ONE definition shared by the
    simulated and net fetch paths so the protocol cannot fork."""
    import os
    import pickle

    path = _cache_path(cache_dir, fp, rc)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        pickle.dump(entry, f)
    os.replace(tmp, path)


@_stage_timed("fetch")
def fetch_batch(
    batch: pa.Table,
    *,
    corpus_dir: str,
    download_maxsize: int = 1 << 30,
    cache_dir: str | None = None,
    registry=None,
    download_timeout: float = 15.0,
) -> pa.Table:
    """Simulated fetch: corpus lookup + deterministic fault model.
    Bodies over ``download_maxsize`` abort (status TOOBIG -> errors).

    With a ``registry`` (CorpusPartRegistry handle) and no http-cache the
    lookup is fully vectorized against plasma-shared url-sorted partitions —
    one ``np.searchsorted`` + ``take`` per (batch, partition), html bytes
    never materialize as Python objects here.  The row-wise path remains for
    fsdir mirrors, gzip variant corpora and the S5 http-cache, and is the
    semantics reference the vectorized path must byte-match
    (test_crawl_equivalence covers both through the engine).

    ``cache_dir`` enables the S5 HTTP-cache analogue (DummyPolicy: cache
    everything, serve every hit): each fetch result persists keyed by
    request fingerprint, and a replayed round — a resume re-executing work
    past the last committed checkpoint — is served entirely from the cache
    with ZERO corpus (network) lookups.  Writes are atomic (tmp + rename)
    so a crash mid-write can only lose an entry, never corrupt one."""
    from scrapy__ray.sources.corpus import corpus_meta

    meta = corpus_meta(corpus_dir)
    if (
        registry is not None
        and cache_dir is None
        and meta.get("type") not in ("fsdir", "net")
        and not meta.get("gzip")
    ):
        return _fetch_batch_vectorized(
            batch, corpus_dir, meta, download_maxsize, registry
        )
    if meta.get("type") == "net":
        return _fetch_batch_net(
            batch, download_maxsize, cache_dir, download_timeout
        )
    return _fetch_batch_rowwise(batch, corpus_dir, download_maxsize, cache_dir)


def _fetch_batch_vectorized(
    batch: pa.Table,
    corpus_dir: str,
    meta: dict,
    download_maxsize: int,
    registry,
) -> pa.Table:
    import numpy as np
    import pyarrow.compute as pc

    from scrapy__ray.sources.corpus import shared_part_lookup

    n = batch.num_rows
    if n == 0:
        return _fetch_batch_rowwise(batch, corpus_dir, download_maxsize, None)
    urls = batch["url"].to_pylist()
    hosts = batch["host"].to_pylist()
    retries = batch["retry_count"].to_numpy(zero_copy_only=False)
    hh = batch["host_hash"].to_numpy(zero_copy_only=False)
    n_parts = meta["n_parts"]
    parts = (hh % n_parts).astype(np.int64)
    url_arr = batch["url"].combine_chunks()

    # data: URIs carry their body in the url itself — no corpus partition
    data_rows = [i for i, u in enumerate(urls) if u.startswith("data:")]
    if data_rows:
        parts = parts.copy()
        parts[data_rows] = -1

    # one index_in + take per touched partition, scattered back to row order
    order = np.argsort(parts, kind="stable")
    sorted_parts = parts[order]
    bounds = np.nonzero(np.diff(sorted_parts))[0] + 1
    group_starts = np.concatenate([[0], bounds, [n]])
    pieces: list[pa.Array] = []
    for gi in range(len(group_starts) - 1):
        lo, hi = int(group_starts[gi]), int(group_starts[gi + 1])
        g_idx = order[lo:hi]
        part = int(parts[g_idx[0]])
        sub = url_arr.take(pa.array(g_idx, pa.int64()))
        if part < 0:
            from scrapy__ray.sources.datauri import parse_data_uri

            got = pa.array(
                [parse_data_uri(urls[i]) for i in g_idx], pa.binary()
            )
        else:
            u_sorted, h_col, u_col = shared_part_lookup(
                corpus_dir, part, registry
            )
            got = None
            if u_sorted is not None and len(u_sorted):
                try:
                    q = np.asarray([urls[i] for i in g_idx], dtype="S")
                except UnicodeEncodeError:
                    q = None  # non-ASCII query urls: index_in below
                if q is not None:
                    # O(log n) per query row against the plasma-resident
                    # sorted view — no per-call value_set re-hash (index_in
                    # re-hashed the whole 20k-url partition per batch)
                    width = u_sorted.dtype.itemsize
                    qq = q.astype(u_sorted.dtype)
                    pos = np.searchsorted(u_sorted, qq)
                    pos_c = np.minimum(pos, len(u_sorted) - 1)
                    valid = u_sorted[pos_c] == qq
                    if q.dtype.itemsize > width:
                        # astype truncated: a truncation can collide with a
                        # real key, so over-width queries are never found
                        valid &= np.char.str_len(q) <= width
                    idx = pa.array(pos_c, pa.int64(), mask=~valid)
                    got = h_col.take(idx)
            if got is None:
                idx = pc.index_in(sub, value_set=u_col)
                got = h_col.take(idx)
            if isinstance(got, pa.ChunkedArray):
                got = (
                    got.chunk(0)
                    if got.num_chunks == 1
                    else pa.concat_arrays(got.chunks)
                )
        pieces.append(got)
    merged = pa.concat_arrays(pieces) if pieces else pa.array([], pa.binary())
    inv = np.empty(n, dtype=np.int64)
    inv[order] = np.arange(n)
    html_col = merged.take(pa.array(inv, pa.int64()))

    found = html_col.is_valid().to_numpy(zero_copy_only=False)
    lens = pc.binary_length(html_col).fill_null(0).to_numpy(zero_copy_only=False)
    n_pages = host_page_counts(corpus_dir)

    # fault model per row (one sha1 per url covers status + latency)
    import hashlib as _hl

    statuses = np.empty(n, dtype=np.int32)
    lat = np.empty(n, dtype=np.float32)
    locations = [""] * n
    for i, url in enumerate(urls):
        if url.startswith(("file://", "data:")):
            if not found[i]:
                statuses[i] = faults.STATUS_NOTFOUND
            elif lens[i] > download_maxsize:
                statuses[i] = faults.STATUS_TOOBIG
            else:
                statuses[i] = faults.STATUS_OK
            lat[i] = 0.0
            continue
        d = _hl.sha1(url.encode("utf-8")).digest()
        lat[i] = 5.0 + (d[1] / 255.0) * 45.0
        if not found[i]:
            statuses[i] = faults.STATUS_NOTFOUND
        elif lens[i] > download_maxsize:
            statuses[i] = faults.STATUS_TOOBIG
        else:
            b0 = d[0] % 100
            if b0 < 3:
                statuses[i] = (
                    faults.STATUS_RETRY if retries[i] == 0 else faults.STATUS_OK
                )
            elif b0 == 3:
                statuses[i] = faults.STATUS_REDIRECT
                locations[i] = faults.redirect_target(
                    url, hosts[i], n_pages.get(hosts[i], 0)
                )
            elif b0 == 4:
                statuses[i] = faults.STATUS_NOTFOUND
            else:
                statuses[i] = faults.STATUS_OK

    ok = pa.array(statuses == faults.STATUS_OK)
    html_final = pc.if_else(ok, html_col, pa.scalar(None, pa.binary()))
    return (
        batch.append_column("status", pa.array(statuses, pa.int32()))
        .append_column("html", html_final)
        .append_column("location", pa.array(locations, pa.string()))
        .append_column("latency_ms", pa.array(lat, pa.float32()))
    )


def _fetch_batch_rowwise(
    batch: pa.Table,
    corpus_dir: str,
    download_maxsize: int = 1 << 30,
    cache_dir: str | None = None,
) -> pa.Table:
    import os
    import pickle

    urls = batch["url"].to_pylist()
    hhs = batch["host_hash"].to_pylist()
    hosts = batch["host"].to_pylist()
    retries = batch["retry_count"].to_pylist()
    fps = batch["fingerprint"].to_pylist() if cache_dir else [b""] * len(urls)
    n_pages = host_page_counts(corpus_dir)

    statuses, htmls, locations, lat = [], [], [], []
    for url, hh, host, rc, fp in zip(urls, hhs, hosts, retries, fps):
        cached = _cache_get(cache_dir, fp, rc) if cache_dir else None
        if cached is not None:
            status, html, loc = cached
        else:
            if url.startswith("data:"):
                # S3 data: handler — the body IS the url (sources/datauri)
                from scrapy__ray.sources.datauri import parse_data_uri

                html = parse_data_uri(url)
            else:
                html = lookup_html(corpus_dir, hh, url)
            if html is None:
                status = faults.STATUS_NOTFOUND
            elif len(html) > download_maxsize:
                status = faults.STATUS_TOOBIG
            elif url.startswith(("file://", "data:")):
                # S3 file:// handler: a local read either succeeds or
                # misses — the 503/301 fault model is a property of the
                # simulated network corpus, not of disk (sources/fsdir.py)
                status = faults.STATUS_OK
            else:
                status = faults.status_of(url, rc)
            loc = (
                faults.redirect_target(url, host, n_pages.get(host, 0))
                if status == faults.STATUS_REDIRECT
                else ""
            )
            html = html if status == faults.STATUS_OK else None
            if cache_dir:
                _cache_put(cache_dir, fp, rc, (status, html, loc))
        statuses.append(status)
        htmls.append(html)
        locations.append(loc)
        # file:// / data: fetches report zero simulated network latency
        # (AutoThrottle then floors at its configured minimum, like Scrapy
        # on localhost)
        lat.append(
            0.0
            if url.startswith(("file://", "data:"))
            else faults.latency_ms(url)
        )

    return (
        batch.append_column("status", pa.array(statuses, pa.int32()))
        .append_column("html", pa.array(htmls, pa.binary()))
        .append_column("location", pa.array(locations, pa.string()))
        .append_column("latency_ms", pa.array(lat, pa.float32()))
    )


def _fetch_batch_net(
    batch: pa.Table,
    download_maxsize: int,
    cache_dir: str | None,
    download_timeout: float,
) -> pa.Table:
    """S2 over real sockets (sources/netfetch.py): cache hits replay with
    zero latency; misses fetch CONCURRENTLY through a small thread pool —
    one dead host then costs one timeout, not len(batch) of them.  The
    per-host round budget still bounds request volume (politeness in the
    BSP model is budget-per-round, not inter-request spacing; SURVEY §2.5)."""
    from concurrent.futures import ThreadPoolExecutor

    from scrapy__ray.sources.netfetch import http_fetch

    urls = batch["url"].to_pylist()
    retries = batch["retry_count"].to_pylist()
    fps = batch["fingerprint"].to_pylist() if cache_dir else [b""] * len(urls)

    results: list[tuple | None] = [None] * len(urls)  # (status, html, loc, lat)
    todo: list[int] = []
    for i, (rc, fp) in enumerate(zip(retries, fps)):
        cached = _cache_get(cache_dir, fp, rc) if cache_dir else None
        if cached is not None:
            results[i] = (*cached, 0.0)  # replayed: no network happened
        else:
            todo.append(i)
    if todo:
        with ThreadPoolExecutor(max_workers=min(8, len(todo))) as pool:
            fetched = list(
                pool.map(
                    lambda i: http_fetch(
                        urls[i],
                        timeout=download_timeout,
                        maxsize=download_maxsize,
                    ),
                    todo,
                )
            )
        for i, r in zip(todo, fetched):
            results[i] = r
            if cache_dir:
                _cache_put(cache_dir, fps[i], retries[i], r[:3])
    return (
        batch.append_column(
            "status", pa.array([r[0] for r in results], pa.int32())
        )
        .append_column("html", pa.array([r[1] for r in results], pa.binary()))
        .append_column(
            "location", pa.array([r[2] for r in results], pa.string())
        )
        .append_column(
            "latency_ms", pa.array([r[3] for r in results], pa.float32())
        )
    )


# ---------------------------------------------------------------- warc tee
#: WARC-Date base for fetch_vtime (virtual seconds) -> absolute time:
#: pinned to the corpus epoch AS UTC so record dates are deterministic
#: (machine-TZ-independent) and a resumed run rewrites identical shards
def _warc_epoch_us() -> int:
    from datetime import timezone

    return int(
        fxgen.EPOCH.replace(tzinfo=timezone.utc).timestamp() * 1_000_000
    )


_WARC_EPOCH_US = _warc_epoch_us()


def warc_tee_batch(batch: pa.Table, *, warc_dir: str) -> pa.Table:
    """Pass-through tee between fetch and extract (S4 WARC sink): every
    STATUS_OK row's raw body becomes a WARC/1.0 response record in one
    multi-member ``.warc.gz`` shard per (round, batch).  The shard name is
    the sha1 of (round, urls) — the same identity as the push batch_sig —
    so a retried task atomically rewrites the SAME file with the SAME
    bytes (content-derived record ids, mtime=0 gzip members).  Rows with
    no body (errors, redirects, cache-miss 404s) are skipped, matching a
    web archive's response-records-only layout."""
    import os

    from scrapy__ray.sources.warc import write_warc_shard

    n = batch.num_rows
    if n == 0:
        return batch
    rnd = batch["round"][0].as_py()
    urls = batch["url"].to_pylist()
    statuses = batch["status"].to_pylist()
    htmls = batch["html"].to_pylist()
    vtimes = batch["fetch_vtime"].to_pylist()
    rows = [
        (u, _WARC_EPOCH_US + int(v * 1_000_000), h)
        for u, st, h, v in zip(urls, statuses, htmls, vtimes)
        if st == faults.STATUS_OK and h is not None
    ]
    if rows:
        sig = hashlib.sha1(
            (str(rnd) + "\x00" + "\x00".join(urls)).encode()
        ).hexdigest()
        d = os.path.join(warc_dir, f"round-{rnd:05d}")
        os.makedirs(d, exist_ok=True)
        write_warc_shard(rows, os.path.join(d, f"{sig}.warc.gz"))
    return batch


# ----------------------------------------------------------------- extract
#: M15 detection (scrapy/utils/response.py::_has_ajaxcrawlable_variant):
#: <meta name="fragment" content="!"> scanned over the first 4096 raw
#: bytes — a bytes regex, encoding-agnostic for the ASCII tag (pinned
#: contract, mirrored by the oracle)
_AJAX_META_RE = re.compile(
    rb"<meta\s+name=[\"']fragment[\"']\s+content=[\"']![\"']\s*/?>",
    re.IGNORECASE,
)


@_stage_timed("extract")
def extract_batch(batch: pa.Table, *, ajax_detect: bool = False) -> pa.Table:
    """html -> (byte-exact text, canonical out_links, meta-refresh target,
    ajax-crawlable flag); drops html.  The cfg gates (metarefresh enabled /
    maxdelay, ajaxcrawl enabled) are applied downstream in expand, which
    owns the config; ``ajax_detect`` is passed by the engine from
    cfg.ajaxcrawl_enabled so the per-page prefix regex costs nothing in
    the (default) disabled mode."""
    statuses = batch["status"].to_pylist()
    htmls = batch["html"].to_pylist()
    urls = batch["url"].to_pylist()
    texts: list[str | None] = []
    links: list[list[str]] = []
    mr_urls: list[str] = []
    mr_delays: list[float] = []
    ajax_flags: list[bool] = []
    memo: dict = {}  # per-batch href-resolution cache (pages share hosts)
    for st, html, url in zip(statuses, htmls, urls):
        if st == faults.STATUS_OK and html is not None:
            text, hrefs, base, mr = extract_page_full(html)
            texts.append(text)
            links.append(links_from_hrefs(hrefs, url, base, _memo=memo))
            if mr is not None:
                mr_urls.append(resolve_redirect(url, mr[1]))
                mr_delays.append(mr[0])
            else:
                mr_urls.append("")
                mr_delays.append(-1.0)
            ajax_flags.append(
                bool(ajax_detect and _AJAX_META_RE.search(html[:4096]))
            )
        else:
            texts.append(None)
            links.append([])
            mr_urls.append("")
            mr_delays.append(-1.0)
            ajax_flags.append(False)
    batch = batch.drop_columns(["html"])
    return (
        batch.append_column("extracted_text", pa.array(texts, pa.string()))
        .append_column("out_links", pa.array(links, pa.list_(pa.string())))
        .append_column("meta_refresh_url", pa.array(mr_urls, pa.string()))
        .append_column("meta_refresh_delay", pa.array(mr_delays, pa.float64()))
        .append_column("ajax_crawlable", pa.array(ajax_flags, pa.bool_()))
    )


# ------------------------------------------------------------ expand + push
def _candidate(
    url, priority, depth, disc_round, parent, lidx, retry, redir, skip,
    jar=0, mproxy="", _hc=None,
):
    ident = _hc.get(url) if _hc is not None else None
    if ident is None:
        host = host_of(url)
        ident = (host, fxgen.host_hash(host), fingerprint_canonical(url))
        if _hc is not None:
            _hc[url] = ident
    host, hh, fp = ident
    return (
        url, host, hh, fp, priority, depth,
        disc_round, parent, lidx, retry, redir, skip, jar, mproxy,
    )


def expand_push_batch(
    batch: pa.Table,
    *,
    cfg: CrawlConfig,
    shards: list,
    stats,
    aggregators: list | None = None,
    net_mode: bool = False,
) -> pa.Table:
    """Build next-round candidates, push them to FrontierShards (idempotent),
    emit the results rows.  Semantics: config.py steps 4-6.

    ``net_mode``: True when the corpus is a live-network ("net") corpus —
    AutoThrottle (T2) then accumulates the MEASURED per-row ``latency_ms``
    from the real fetch instead of the simulated fault-model latency, so a
    live crawl adapts host delays to observed network behavior."""
    import ray

    t_expand0 = _time.monotonic() if _STAGE_TIMING else 0.0
    rnd = batch["round"][0].as_py() if batch.num_rows else -1
    cols = {c: batch[c].to_pylist() for c in batch.column_names}
    n = batch.num_rows
    m = dict(fetched=0, errors=0, retried=0, redirects=0, offsite=0)
    cands: list[tuple] = []
    n_links_col: list[int] = []
    mr_rows: list[int] = []  # meta-refresh rows: null their text in results
    host_cache: dict[str, tuple] = {}  # url -> (host, host_hash, fingerprint)
    lat_acc: dict[str, list[int]] = {}  # AutoThrottle: host -> [sum_us, n]
    cookie_acc: dict[str, dict[str, str]] = {}  # M9: host -> observed cookies
    allow_re, deny_re = compiled_link_rules(cfg.link_allow, cfg.link_deny)

    for i in range(n):
        st = cols["status"][i]
        url = cols["url"][i]
        if st == faults.STATUS_OK and cfg.autothrottle_enabled:
            acc = lat_acc.setdefault(cols["host"][i], [0, 0])
            if net_mode:
                acc[0] += int(round(float(cols["latency_ms"][i]) * 1000.0))
            else:
                acc[0] += faults.latency_us(url)
            acc[1] += 1
        if cfg.cookies_enabled:
            observed = faults.set_cookies(url, st)
            if observed:
                # jar identity = (cookiejar id, host): meta['cookiejar']
                # separation — two identities on one host never mix jars
                jar = cookie_acc.setdefault(
                    (cols["cookiejar"][i], cols["host"][i]), {}
                )
                for k, v in observed.items():
                    if k not in jar or v > jar[k]:  # max-value merge rule
                        jar[k] = v
        if st == faults.STATUS_RETRY:
            n_links_col.append(0)
            if cols["retry_count"][i] < cfg.retry_times:
                m["retried"] += 1
                cands.append(
                    (
                        url, cols["host"][i], cols["host_hash"][i],
                        cols["fingerprint"][i],
                        cols["priority"][i] + cfg.retry_priority_adjust,
                        cols["depth"][i], cols["disc_round"][i],
                        cols["parent_url"][i], cols["link_idx"][i],
                        cols["retry_count"][i] + 1, cols["redirect_count"][i],
                        True, cols["cookiejar"][i], cols["meta_proxy"][i],
                    )
                )
            else:
                m["errors"] += 1
        elif st == faults.STATUS_REDIRECT:
            n_links_col.append(0)
            if cols["redirect_count"][i] < cfg.redirect_max_times:
                m["redirects"] += 1
                cands.append(
                    _candidate(
                        cols["location"][i],
                        cols["priority"][i] + cfg.redirect_priority_adjust,
                        cols["depth"][i], rnd, url, -1, 0,
                        cols["redirect_count"][i] + 1, False,
                        cols["cookiejar"][i], cols["meta_proxy"][i],
                    )
                )
            else:
                m["errors"] += 1
        elif st != faults.STATUS_OK:
            n_links_col.append(0)
            m["errors"] += 1
        elif (
            cfg.metarefresh_enabled
            and cols["meta_refresh_url"][i]
            and cols["meta_refresh_delay"][i] <= cfg.metarefresh_maxdelay
        ):
            # M5: html-level redirect — body not given to the spider
            n_links_col.append(0)
            mr_rows.append(i)
            if cols["redirect_count"][i] < cfg.redirect_max_times:
                m["redirects"] += 1
                cands.append(
                    _candidate(
                        cols["meta_refresh_url"][i],
                        cols["priority"][i] + cfg.redirect_priority_adjust,
                        cols["depth"][i], rnd, url, -1, 0,
                        cols["redirect_count"][i] + 1, False,
                        cols["cookiejar"][i], cols["meta_proxy"][i],
                        _hc=host_cache,
                    )
                )
            else:
                m["errors"] += 1
        elif (
            cfg.ajaxcrawl_enabled
            and cols["ajax_crawlable"][i]
            and "_escaped_fragment_" not in url
        ):
            # M15: AJAX-crawlable page — body never surfaced; re-request
            # the escaped-fragment variant with UNCHANGED priority/depth/
            # redirect-count (AjaxCrawlMiddleware request.replace keeps
            # them; the _escaped_fragment_ guard is the loop bound, the
            # meta['ajax_crawlable'] analogue).  Counted as a redirect hop.
            n_links_col.append(0)
            mr_rows.append(i)
            m["redirects"] += 1
            cands.append(
                _candidate(
                    escaped_fragment_url(url), cols["priority"][i],
                    cols["depth"][i], rnd, url, -1, 0,
                    cols["redirect_count"][i], False,
                    cols["cookiejar"][i], cols["meta_proxy"][i],
                    _hc=host_cache,
                )
            )
        else:
            m["fetched"] += 1
            out_links = cols["out_links"][i]
            n_links_col.append(len(out_links))
            depth = cols["depth"][i]
            for l, link in enumerate(out_links):
                if not link_passes_rules(link, allow_re, deny_re):
                    continue
                if not url_is_from_any_domain(link, cfg.allowed_domains):
                    m["offsite"] += 1
                    continue
                if len(link) > cfg.url_length_limit:
                    continue
                child_depth = depth + 1
                if cfg.depth_limit and child_depth > cfg.depth_limit:
                    continue
                cands.append(
                    _candidate(
                        link, -child_depth * cfg.depth_priority, child_depth,
                        rnd, url, l, 0, 0, False,
                        cols["cookiejar"][i], cols["meta_proxy"][i],
                        _hc=host_cache,
                    )
                )

    # ---- within-batch candidate pre-dedup ---------------------------------
    # Exactness argument: the shard processes its candidates in order-key
    # order.  For two same-fingerprint candidates d1 < d2 (both
    # skip_dedup=False), by the time d2 is checked, d1 has either inserted
    # the fingerprint or been dropped because it was already present — in
    # both cases d2 is ALWAYS counted deduped.  Dropping every non-minimal
    # duplicate here and adding the count to the deduped metric therefore
    # yields the identical seen set, schedule, and metric totals, while
    # shrinking the pushed volume by the page->link fan-in factor.
    # skip_dedup rows (retries, deferrals) are never merged — dont_filter
    # semantics bypass dedup entirely.  The drop COUNT is attributed to the
    # owning shard and surfaces in that shard's NEXT resolve() metrics,
    # matching the oracle, which counts duplicate drops in the round that
    # schedules (round k+1), not the round that discovers (round k).
    S = len(shards)
    best: dict[bytes, tuple] = {}
    keep: list[tuple] = []
    early_dedup: dict[int, int] = {}
    for c in cands:
        if c[11]:  # skip_dedup
            keep.append(c)
            continue
        okey = (-c[4], c[6], c[7], c[8])
        prev = best.get(c[3])
        if prev is None:
            best[c[3]] = (okey, c)
            continue
        if okey < prev[0]:
            best[c[3]] = (okey, c)
        early_dedup[c[2] % S] = early_dedup.get(c[2] % S, 0) + 1
    cands = keep + [v[1] for v in best.values()]

    # ---- push candidates to their shards, idempotently --------------------
    batch_sig = hashlib.sha1(
        (str(rnd) + "\x00" + "\x00".join(cols["url"])).encode()
    ).hexdigest()
    by_shard: dict[int, list[tuple]] = {}
    for c in cands:
        by_shard.setdefault(c[2] % S, []).append(c)
    for sh in early_dedup:
        by_shard.setdefault(sh, [])
    # latency + cookie feedback goes to the batch's OWN shard (all rows of a
    # scheduled block share one shard; hosts map to exactly one shard)
    own_shard = (
        int(cols["host_hash"][0] % S) if (n and (lat_acc or cookie_acc)) else None
    )
    if own_shard is not None:
        by_shard.setdefault(own_shard, [])
    push_refs = []
    agg_items = []  # aggregated mode: whole payload in ONE absorb RPC
    for sh, rows in by_shard.items():
        tcols = list(zip(*rows)) if rows else [[] for _ in FRONTIER_SCHEMA.names]
        tbl = pa.Table.from_arrays(
            [
                pa.array(list(col), type=f.type)
                for col, f in zip(tcols, FRONTIER_SCHEMA)
            ],
            schema=FRONTIER_SCHEMA,
        )
        item = (
            f"{batch_sig}:{sh}",
            tbl,
            early_dedup.get(sh, 0),
            lat_acc if sh == own_shard else None,
            cookie_acc if sh == own_shard else None,
        )
        if aggregators:
            agg_items.append((item[0], sh) + item[1:])
        else:
            push_refs.append(shards[sh].push.remote(*item))
    if aggregators and agg_items:
        # deterministic aggregator choice by batch signature; the ack only
        # guarantees BUFFERED — the driver's flush (inside the round
        # barrier) guarantees landed-on-shard before resolve/checkpoint
        agg = aggregators[int(batch_sig[:8], 16) % len(aggregators)]
        push_refs.append(agg.absorb.remote(agg_items))
    if stats is not None:
        shard_id = int(cols["host_hash"][0] % S) if n else -1
        push_refs.append(stats.inc.remote(rnd, shard_id, batch_sig, m))
    t_push0 = _time.monotonic() if _STAGE_TIMING else 0.0
    ray.get(push_refs)  # ensure pushes land before the execution barrier
    if _STAGE_TIMING and stats is not None:
        now = _time.monotonic()
        stats.inc_timing.remote(
            rnd,
            {
                "fetch": _STAGE_T["fetch"],
                "extract": _STAGE_T["extract"],
                "expand": t_push0 - t_expand0,
                "push_wait": now - t_push0,
            },
        )
        _STAGE_T["fetch"] = 0.0
        _STAGE_T["extract"] = 0.0

    # ---- results rows ------------------------------------------------------
    keep = [
        "url", "host", "status", "round", "fetch_seq_in_host", "fetch_vtime",
        "depth", "priority", "parent_url", "retry_count", "redirect_count",
        "latency_ms", "cookies",
    ]
    # M10: effective proxy per request row — an explicit meta_proxy wins
    # outright (HttpProxyMiddleware skips when 'proxy' is already in meta,
    # so no_proxy is NOT consulted for it); otherwise the env convention
    # (pure function of host + cfg, host-memoized; '' = unset/bypassed)
    proxy_memo: dict[str, str] = {}
    proxies = []
    for h, u, mp in zip(cols["host"], cols["url"], cols["meta_proxy"]):
        if mp:
            proxies.append(mp)
            continue
        p = proxy_memo.get(h)
        if p is None:
            p = effective_proxy(u, cfg.http_proxy, cfg.no_proxy)
            proxy_memo[h] = p
        proxies.append(p)
    out = (
        batch.select(keep + ["extracted_text"])
        .rename_columns(keep[:-1] + ["cookies_sent", "extracted_text"])
        .append_column("n_links", pa.array(n_links_col, pa.int32()))
        .append_column("proxy", pa.array(proxies, pa.string()))
        .append_column(
            "cookiejar", pa.array(cols["cookiejar"], pa.int32())
        )
    )
    if mr_rows:
        texts = cols["extracted_text"]
        for i in mr_rows:
            texts[i] = None
        out = out.set_column(
            out.schema.get_field_index("extracted_text"),
            "extracted_text",
            pa.array(texts, pa.string()),
        )
    return out.cast(RESULTS_SCHEMA)
