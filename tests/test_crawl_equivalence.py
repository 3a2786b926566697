"""Engine-vs-oracle equivalence — the core correctness gate (SURVEY.md §5.2).

For each fixture config: identical URL-seen set, identical per-host fetch
order and global round assignment, byte-identical extracted text per url
against the corpus ``text`` column, and identical per-round metrics.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

import fixtures.gen as fxgen
from scrapy__ray.config import CrawlConfig

SMALL = fxgen.default_dir("sf-small")


@pytest.fixture(scope="session")
def small_corpus():
    fxgen.generate("sf-small", SMALL)
    return SMALL


def _engine_results(out_dir):
    return pq.read_table(os.path.join(out_dir, "results"))


def _assert_equivalent(corpus, out_dir, summary, oracle_res):
    # metric totals + round count
    ot = oracle_res.totals()
    for k, v in ot.items():
        assert summary.totals[k] == v, (k, summary.totals, ot)
    assert summary.rounds == oracle_res.rounds

    res = _engine_results(out_dir)
    # fetch log: exact same set of (url, round, host, seq, status)
    engine_log = set(
        zip(
            res["url"].to_pylist(),
            res["round"].to_pylist(),
            res["host"].to_pylist(),
            res["fetch_seq_in_host"].to_pylist(),
            res["status"].to_pylist(),
        )
    )
    oracle_log = {(u, r, h, s, st) for (u, r, h, s, st, _d) in oracle_res.fetch_log}
    assert engine_log == oracle_log

    # byte-identical text per url vs the corpus oracle column
    pages = pq.read_table(os.path.join(corpus, "pages"), columns=["url", "text"])
    expect = dict(zip(pages["url"].to_pylist(), pages["text"].to_pylist()))
    # status-200 rows whose body was never surfaced (M5 meta-refresh hops,
    # M15 ajax stubs) carry null text and are NOT counted fetched by the
    # oracle; every surfaced text must match the corpus column byte-exactly
    # and the surfaced count must equal the oracle's fetched total
    n200 = 0
    for url, st, text in zip(
        res["url"].to_pylist(), res["status"].to_pylist(),
        res["extracted_text"].to_pylist(),
    ):
        if st == 200 and text is not None:
            n200 += 1
            assert text == expect[url], url
    assert n200 == ot["fetched"]

    # per-round metrics
    em = {m["round"]: m for m in summary.round_metrics}
    for om in oracle_res.metrics:
        e = em[om["round"]]
        for k in ("fetched", "deduped", "deferred", "robots_denied",
                  "errors", "retried", "redirects", "offsite"):
            assert e[k] == om[k], (om["round"], k, e, om)


@pytest.mark.parametrize(
    "name,cfg",
    [
        ("pinned", CrawlConfig()),
        ("tight", CrawlConfig(round_duration=2.0)),
        ("deep-noRobots", CrawlConfig(depth_limit=8, robots_obey=False)),
        # CrawlSpider Rule allow/deny (P5): deny odd-numbered pages, so the
        # crawl graph itself changes shape and both sides must agree
        ("linkrules", CrawlConfig(link_deny=(r"/p/\d*[13579]$",))),
        # DOWNLOAD_MAXSIZE (S2): bodies over the median page size abort ->
        # terminal errors; their links are never followed
        ("maxsize", CrawlConfig(download_maxsize=574)),
        # AutoThrottle (T2): per-host adaptive budgets; delays start at 5s
        # (budget 1) and converge toward the clamp as latencies arrive, so
        # schedule shapes differ per round and both sides must track the
        # same EWMA state
        ("autothrottle", CrawlConfig(autothrottle_enabled=True)),
        # depth_limit=0 (unlimited): the crawl saturates by DEDUP, not the
        # depth cap — the final round's frontier is entirely duplicate, so
        # the engine must record that all-deduped round exactly like the
        # oracle (round count + deduped totals); regression for the
        # n_sched==0 early-break bug
        ("unlimited-depth", CrawlConfig(depth_limit=0)),
        # many-shard + push-aggregation layer (multi-node realism): 64
        # frontier shards with every expand push routed through 4
        # PushAggregator actors and flushed at the round barrier — the
        # shard-visible push sequence must stay an exact permutation of
        # direct mode, so the whole crawl (seen set, order, metrics) must
        # still equal the shard-agnostic oracle
        ("manyshard-agg", CrawlConfig(num_shards=64, push_aggregators=4)),
    ],
)
def test_engine_matches_oracle(ray_session, small_corpus, name, cfg):
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    out = f"/tmp/crawl_out/eq-{name}"
    summary, eng = crawl(small_corpus, out, cfg=cfg, keep_engine=True)
    oracle_res = run_oracle(small_corpus, cfg)
    try:
        _assert_equivalent(small_corpus, out, summary, oracle_res)
        # URL-seen set equality (north rule: "URL-seen set must match")
        assert eng.seen_fingerprints() == oracle_res.seen
    finally:
        eng.shutdown()


def test_ajaxcrawl_equivalence(ray_session):
    """M15 AjaxCrawlMiddleware: on the sf-ajax corpus (stub pages carrying
    <meta name="fragment" content="!">, real content at the
    ?_escaped_fragment_= variant), the engine must match the oracle with
    the middleware ON (stubs surface nothing, escaped variants fetched)
    AND OFF (stubs are terminal pages, byte-identical stub text)."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    corpus = fxgen.generate("sf-ajax", fxgen.default_dir("sf-ajax"))
    for name, cfg in [
        ("on", CrawlConfig(ajaxcrawl_enabled=True)),
        ("off", CrawlConfig()),
    ]:
        out = f"/tmp/crawl_out/ajax-{name}"
        summary, eng = crawl(corpus, out, cfg=cfg, keep_engine=True)
        oracle_res = run_oracle(corpus, cfg)
        try:
            _assert_equivalent(corpus, out, summary, oracle_res)
            assert eng.seen_fingerprints() == oracle_res.seen
        finally:
            eng.shutdown()
        fetched_urls = _engine_results(out)["url"].to_pylist()
        n_esc = sum("_escaped_fragment_" in u for u in fetched_urls)
        if name == "on":
            assert n_esc > 0, "enabled run never exercised the ajax hop"
        else:
            assert n_esc == 0, "disabled run must never request variants"


def test_proxy_stamping_equivalence(ray_session, small_corpus):
    """M10 HttpProxyMiddleware: the crawl is byte-identical with a proxy
    configured (the slot key stays the host, so nothing about ordering or
    politeness may change), and the per-request effective-proxy stamping
    (proxy column vs the oracle's independently-written bypass logic)
    agrees url-for-url, with both proxied and no_proxy-bypassed hosts
    exercised."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    purl = "http://proxy.example:8080"
    cfg = CrawlConfig(http_proxy=purl, no_proxy="h3.example, .h7.example")
    out = "/tmp/crawl_out/proxy"
    summary, eng = crawl(small_corpus, out, cfg=cfg, keep_engine=True)
    oracle_res = run_oracle(small_corpus, cfg)
    try:
        _assert_equivalent(small_corpus, out, summary, oracle_res)
        assert eng.seen_fingerprints() == oracle_res.seen
    finally:
        eng.shutdown()
    res = _engine_results(out)
    got = dict(zip(res["url"].to_pylist(), res["proxy"].to_pylist()))
    assert set(got) == set(oracle_res.proxies)
    assert not {u for u in got if got[u] != oracle_res.proxies[u]}
    vals = set(got.values())
    assert "" in vals and purl in vals


def test_resume_with_push_aggregators(ray_session, small_corpus):
    """Kill/resume byte-identity THROUGH the aggregation layer: buffered
    aggregator state must never leak into a checkpoint (flush precedes it
    inside the round barrier), so a killed aggregated run resumes exactly
    like the uninterrupted direct-mode run."""
    from scrapy__ray.engine import crawl

    direct = crawl(small_corpus, "/tmp/crawl_out/agg-direct", cfg=CrawlConfig())
    agg_cfg = CrawlConfig(num_shards=16, push_aggregators=2)
    crawl(
        small_corpus, "/tmp/crawl_out/agg-part",
        cfg=CrawlConfig(num_shards=16, push_aggregators=2, max_rounds=3),
    )
    resumed = crawl(
        small_corpus, "/tmp/crawl_out/agg-part", cfg=agg_cfg, resume=True
    )
    assert resumed.total_fetched == direct.total_fetched

    key = lambda t: sorted(
        zip(
            t["url"].to_pylist(), t["round"].to_pylist(),
            t["fetch_seq_in_host"].to_pylist(), t["status"].to_pylist(),
            t["extracted_text"].to_pylist(),
        )
    )
    assert key(_engine_results("/tmp/crawl_out/agg-part")) == key(
        _engine_results("/tmp/crawl_out/agg-direct")
    )


def test_resume_from_checkpoint(ray_session, small_corpus):
    """Kill/resume byte-identity (SURVEY.md §4.3): stop after 3 rounds,
    resume in a fresh engine, final outputs identical to uninterrupted."""
    from scrapy__ray.engine import crawl

    cfg = CrawlConfig()
    full = crawl(small_corpus, "/tmp/crawl_out/resume-full", cfg=cfg)

    cfg3 = CrawlConfig(max_rounds=3)
    crawl(small_corpus, "/tmp/crawl_out/resume-part", cfg=cfg3)
    resumed = crawl(
        small_corpus, "/tmp/crawl_out/resume-part", cfg=cfg, resume=True
    )
    assert resumed.total_fetched == full.total_fetched

    a = _engine_results("/tmp/crawl_out/resume-full")
    b = _engine_results("/tmp/crawl_out/resume-part")
    key = lambda t: sorted(
        zip(
            t["url"].to_pylist(), t["round"].to_pylist(),
            t["fetch_seq_in_host"].to_pylist(), t["status"].to_pylist(),
            t["extracted_text"].to_pylist(),
        )
    )
    assert key(a) == key(b)

    # a resumed run's metrics.parquet must equal an uninterrupted run's —
    # pre-resume rounds are replayed from the checkpoint state
    ma = pq.read_table("/tmp/crawl_out/resume-full/metrics.parquet")
    mb = pq.read_table("/tmp/crawl_out/resume-part/metrics.parquet")
    assert ma.to_pydict() == mb.to_pydict()


def test_resume_with_checkpoint_cadence(ray_session, small_corpus):
    """checkpoint_every_n > 1: the partial run commits only every 4th round
    (plus the final one), so the resume replays the uncommitted tail — the
    final outputs must still be byte-identical to an uninterrupted run."""
    from scrapy__ray.engine import crawl

    cfg = CrawlConfig(checkpoint_every_n=4)
    full = crawl(small_corpus, "/tmp/crawl_out/cad-full", cfg=cfg)

    # stop after 6 rounds: rounds 0-3 committed by cadence, 4-5 by the
    # final-round checkpoint at round 5 -> delete round-5's checkpoint to
    # simulate a crash BETWEEN cadence points, forcing a genuine replay
    import glob
    import shutil

    cfg6 = CrawlConfig(checkpoint_every_n=4, max_rounds=6)
    crawl(small_corpus, "/tmp/crawl_out/cad-part", cfg=cfg6)
    for d in glob.glob("/tmp/crawl_out/cad-part/ckpt/round=0000[45]"):
        shutil.rmtree(d)
    resumed = crawl(
        small_corpus, "/tmp/crawl_out/cad-part", cfg=cfg, resume=True
    )
    assert resumed.total_fetched == full.total_fetched

    a = _engine_results("/tmp/crawl_out/cad-full")
    b = _engine_results("/tmp/crawl_out/cad-part")
    key = lambda t: sorted(
        zip(
            t["url"].to_pylist(), t["round"].to_pylist(),
            t["fetch_seq_in_host"].to_pylist(), t["status"].to_pylist(),
            t["extracted_text"].to_pylist(),
        )
    )
    assert key(a) == key(b)
    ma = pq.read_table("/tmp/crawl_out/cad-full/metrics.parquet")
    mb = pq.read_table("/tmp/crawl_out/cad-part/metrics.parquet")
    assert ma.to_pydict() == mb.to_pydict()


def _key(t):
    return sorted(
        zip(
            t["url"].to_pylist(), t["round"].to_pylist(),
            t["fetch_seq_in_host"].to_pylist(), t["status"].to_pylist(),
            t["extracted_text"].to_pylist(),
        )
    )


def test_http_cache_resume_zero_refetch(ray_session, small_corpus):
    """S5 HTTP cache (DummyPolicy): a resume that replays rounds past the
    last committed checkpoint must refetch NOTHING — proven by handing the
    resumed engine a corpus whose pages are GONE.  Any corpus lookup would
    turn into a 404 and change the fetch log; byte-identity means every
    replayed fetch was served from the fingerprint-keyed cache."""
    import glob
    import shutil

    from scrapy__ray.engine import crawl

    cfg = CrawlConfig(http_cache=True, checkpoint_every_n=4)
    out = "/tmp/crawl_out/cache-run"
    full = crawl(small_corpus, out, cfg=cfg)
    want = _key(_engine_results(out))

    # keep only the earliest committed checkpoint -> the resume replays
    # every later round
    ckpts = sorted(glob.glob(os.path.join(out, "ckpt", "round=*")))
    assert len(ckpts) >= 2, "need a multi-checkpoint run for a real replay"
    for d in ckpts[1:]:
        shutil.rmtree(d)

    # a corpus clone WITHOUT pages (fresh path also defeats the per-process
    # partition cache, which is keyed by corpus_dir)
    gutted = "/tmp/crawl_out/cache-gutted-corpus"
    if os.path.exists(gutted):
        shutil.rmtree(gutted)
    shutil.copytree(small_corpus, gutted, ignore=shutil.ignore_patterns("pages"))

    resumed = crawl(gutted, out, cfg=cfg, resume=True)
    assert resumed.total_fetched == full.total_fetched
    assert _key(_engine_results(out)) == want

    # control: the same replay WITHOUT the cache must detect the gutted
    # corpus (404s) — proving this test can actually catch refetches
    cfg_nc = CrawlConfig(checkpoint_every_n=4)
    out2 = "/tmp/crawl_out/cache-control"
    crawl(small_corpus, out2, cfg=cfg_nc)
    want2 = _key(_engine_results(out2))
    ckpts2 = sorted(glob.glob(os.path.join(out2, "ckpt", "round=*")))
    for d in ckpts2[1:]:
        shutil.rmtree(d)
    crawl(gutted, out2, cfg=cfg_nc, resume=True)
    assert _key(_engine_results(out2)) != want2


def test_cuckoo_mode_close_to_exact(ray_session, small_corpus):
    """Cuckoo dedup: same crawl within the FP bound (here: no FPs expected
    at this scale); FP counter reported."""
    from scrapy__ray.engine import crawl

    exact = crawl(small_corpus, "/tmp/crawl_out/ck-exact", cfg=CrawlConfig())
    cuckoo = crawl(
        small_corpus, "/tmp/crawl_out/ck-cuckoo", cfg=CrawlConfig(dedup="cuckoo")
    )
    assert cuckoo.total_fetched == exact.total_fetched
    assert cuckoo.totals == exact.totals
