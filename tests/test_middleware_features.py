"""Middleware-feature coverage: meta-refresh (M5), CrawlSpider link rules
(P5), and feed-export sink formats (S4) — scalar vectors plus a synthetic
mini-corpus driven through BOTH the engine and the oracle."""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import fixtures.gen as fxgen
from fixtures import faults
from scrapy__ray.config import CrawlConfig
from scrapy__ray.functions.linkextract import (
    compiled_link_rules,
    link_passes_rules,
    resolve_redirect,
)
from scrapy__ray.functions.textextract import extract_page_full, extract_text

HOST = "mr0.example"  # pages 0-4 are all status 200 under the fault model


# --------------------------------------------------------------- scalars
@pytest.mark.parametrize(
    "html,expect",
    [
        (b'<html><head><meta http-equiv="refresh" content="0; url=/p/2">'
         b"</head><body>x</body></html>", (0.0, "/p/2")),
        (b'<html><head><meta http-equiv="Refresh" content="5;URL=\'next.html\'">'
         b"</head><body>x</body></html>", (5.0, "next.html")),
        (b'<html><head><meta http-equiv="refresh" content="300"></head>'
         b"<body>x</body></html>", None),  # no url -> plain reload, ignored
        (b"<html><head></head><body>no meta</body></html>", None),
    ],
)
def test_meta_refresh_parse(html, expect):
    _t, _h, _b, mr = extract_page_full(html)
    assert mr == expect


def test_meta_refresh_resolution():
    assert (
        resolve_redirect("http://h.example/p/1", "/p/2")
        == "http://h.example/p/2"
    )
    assert (
        resolve_redirect("http://h.example/a/b", "c?z=1&a=2")
        == "http://h.example/a/c?a=2&z=1"  # canonical: params sorted
    )


def test_link_rules_predicates():
    allow_re, deny_re = compiled_link_rules((r"/p/\d+",), (r"[13579]$",))
    assert link_passes_rules("http://h.example/p/2", allow_re, deny_re)
    assert not link_passes_rules("http://h.example/p/3", allow_re, deny_re)
    assert not link_passes_rules("http://h.example/other", allow_re, deny_re)
    none_a, none_d = compiled_link_rules((), ())
    assert link_passes_rules("anything", none_a, none_d)


# ------------------------------------------------- synthetic mini corpus
def _page(title: str, body: str) -> bytes:
    return (
        f"<html><head><title>{title}</title></head>\n"
        f"<body>{body}</body></html>"
    ).encode()


@pytest.fixture(scope="module")
def mr_corpus(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("mr-corpus"))
    urls = [faults.page_url(HOST, j) for j in range(5)]
    htmls = [
        _page("p0", '<p>zero</p><ul><li><a href="/p/1">a</a></li>'
                    '<li><a href="/p/4">b</a></li></ul>'),
        (b'<html><head><title>p1</title>'
         b'<meta http-equiv="refresh" content="0; url=/p/2"></head>\n'
         b"<body><p>refresh page</p></body></html>"),
        _page("p2", '<p>two</p><ul><li><a href="/p/3">c</a></li></ul>'),
        _page("p3", "<p>three</p>"),
        _page("p4", "<p>four</p>"),
    ]
    os.makedirs(os.path.join(out, "pages"))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([fxgen.EPOCH] * 5, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([extract_text(h) for h in htmls], pa.string()),
                "lang": pa.array(["en"] * 5, pa.string()),
            },
            schema=fxgen.PAGES_SCHEMA,
        ),
        os.path.join(out, "pages", "part-0.parquet"),
    )
    pq.write_table(
        pa.table({"url": pa.array([urls[0]], pa.string()),
                  "seed_order": pa.array([0], pa.int32())}),
        os.path.join(out, "seeds.parquet"),
    )
    pq.write_table(
        pa.table({"host": pa.array([HOST], pa.string()),
                  "robots_txt": pa.array(["User-agent: *\nAllow: /\n"], pa.string())}),
        os.path.join(out, "robots.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([HOST], pa.string()),
                "host_index": pa.array([0], pa.int32()),
                "n_pages": pa.array([5], pa.int32()),
                "host_hash": pa.array([fxgen.host_hash(HOST)], pa.uint64()),
            }
        ),
        os.path.join(out, "hosts.parquet"),
    )
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"n_parts": 1}, f)
    return out


_MR_CFG = CrawlConfig(allowed_domains=("example",), num_shards=2)


def _fetched_urls(out_dir):
    t = pq.read_table(os.path.join(out_dir, "results"))
    return {
        u for u, st, tx in zip(
            t["url"].to_pylist(), t["status"].to_pylist(),
            t["extracted_text"].to_pylist(),
        )
        if st == 200 and tx is not None
    }


def test_meta_refresh_engine_vs_oracle(ray_session, mr_corpus):
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    out = "/tmp/crawl_out/mr-test"
    summary = crawl(mr_corpus, out, cfg=_MR_CFG)
    oracle = run_oracle(mr_corpus, _MR_CFG)

    assert summary.totals == {**summary.totals, **oracle.totals()}
    # the refresh fired and its target was crawled
    assert oracle.totals()["redirects"] >= 1
    target = faults.page_url(HOST, 2)
    assert target in oracle.texts
    assert _fetched_urls(out) == set(oracle.texts)
    # the refresh page itself logged status 200 but contributed no text
    t = pq.read_table(os.path.join(out, "results"))
    row = {
        u: tx for u, tx in zip(
            t["url"].to_pylist(), t["extracted_text"].to_pylist()
        )
    }
    assert row[faults.page_url(HOST, 1)] is None


def test_metarefresh_disabled_parses_body(ray_session, mr_corpus):
    from scrapy__ray.oracle import run_oracle

    cfg = CrawlConfig(
        allowed_domains=("example",), metarefresh_enabled=False, num_shards=2
    )
    oracle = run_oracle(mr_corpus, cfg)
    # p/1 now fetched as a normal page; p/2 unreachable (no links to it)
    assert faults.page_url(HOST, 1) in oracle.texts
    assert faults.page_url(HOST, 2) not in oracle.texts
    assert oracle.totals()["redirects"] == 0


# ------------------------------------------- gzip variant + sitemap seeds
def test_gzip_corpus_equivalence(ray_session):
    """M6: the sf-gzip corpus stores 'gzip' Content-Encoding pages; fetch
    decompresses before extract, and engine==oracle on the whole crawl."""
    import pyarrow.parquet as pq_

    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle
    from scrapy__ray.functions.textextract import extract_text
    import gzip as _gzip

    corpus = fxgen.generate("sf-gzip", fxgen.default_dir("sf-gzip"))
    pages = pq_.read_table(os.path.join(corpus, "pages"))
    assert "content_encoding" in pages.schema.names
    encs = pages["content_encoding"].to_pylist()
    n_gzip = sum(1 for e in encs if e == "gzip")
    assert n_gzip > 0
    # byte-identity THROUGH the decompression path for every gzip'd page
    for h, e, txt in zip(
        pages["html"].to_pylist(), encs, pages["text"].to_pylist()
    ):
        if e == "gzip":
            assert extract_text(_gzip.decompress(h)) == txt

    cfg = CrawlConfig()
    s = crawl(corpus, "/tmp/crawl_out/gzip-eq", cfg=cfg)
    o = run_oracle(corpus, cfg)
    assert {k: s.totals[k] for k in o.totals()} == o.totals()
    assert s.total_fetched == o.totals()["fetched"]


def test_sitemap_seed_expansion(ray_session):
    """P6: sitemap-listed urls join round 0; engine==oracle, and the
    sitemap host's listed pages are all crawled."""
    import pyarrow.parquet as pq_

    from scrapy__ray.engine import crawl
    from scrapy__ray.functions.linkextract import parse_sitemap_urls
    from scrapy__ray.oracle import run_oracle

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    cfg = CrawlConfig(sitemap_seeds=True)
    s = crawl(corpus, "/tmp/crawl_out/sitemap-eq", cfg=cfg)
    o = run_oracle(corpus, cfg)
    assert {k: s.totals[k] for k in o.totals()} == o.totals()

    sm = pq_.read_table(os.path.join(corpus, "sitemaps.parquet"))
    listed = parse_sitemap_urls(sm["sitemap_xml"][0].as_py())
    hosts = pq_.read_table(os.path.join(corpus, "hosts.parquet"))
    n1 = dict(zip(hosts["host"].to_pylist(), hosts["n_pages"].to_pylist()))[
        "h1.example"
    ]
    assert len(listed) == min(10, n1) >= 1
    t = pq_.read_table(
        os.path.join("/tmp/crawl_out/sitemap-eq", "results"), columns=["url"]
    )
    fetched = set(t["url"].to_pylist())
    assert set(listed) <= fetched

    # without sitemap seeds the oracle fetches no more pages than with
    o_plain = run_oracle(corpus, CrawlConfig())
    assert o.totals()["fetched"] >= o_plain.totals()["fetched"]


def test_json_sink(ray_session, mr_corpus):
    from scrapy__ray.engine import crawl

    out = "/tmp/crawl_out/mr-json"
    summary = crawl(
        mr_corpus, out,
        cfg=CrawlConfig(
            allowed_domains=("example",), output_format="json", num_shards=2
        ),
    )
    files = glob.glob(os.path.join(out, "results", "round-*", "*.json"))
    assert files
    rows = sum(1 for f in files for _line in open(f))
    # one results row per fetch attempt (200s + the meta-refresh page)
    parq = crawl(mr_corpus, "/tmp/crawl_out/mr-parq", cfg=_MR_CFG)
    t = pq.read_table("/tmp/crawl_out/mr-parq/results")
    assert rows == t.num_rows
    assert summary.total_fetched == parq.total_fetched


def test_cookie_vectors():
    """M9 server model: deterministic, 200-only, host sid + b0-gated trk."""
    url = "http://h1.example/p/0"
    c = faults.set_cookies(url, 200)
    assert set(c) >= {"sid"}
    assert c == faults.set_cookies(url, 200)  # deterministic
    assert faults.set_cookies(url, 404) == {}
    assert faults.set_cookies(url, 503) == {}
    # sid is per-host: same host, different page -> same sid
    c2 = faults.set_cookies("http://h1.example/p/1", 200)
    assert c2["sid"] == c["sid"]
    assert faults.set_cookies("http://h2.example/p/0", 200)["sid"] != c["sid"]


def test_cookies_engine_vs_oracle(ray_session):
    """M9: per-(url, round) Cookie headers byte-identical engine vs oracle,
    and cookies actually flow (jar non-empty after round 0)."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    cfg = CrawlConfig()
    crawl(corpus, "/tmp/crawl_out/cookies-eq", cfg=cfg)
    o = run_oracle(corpus, cfg)

    t = pq.read_table(
        "/tmp/crawl_out/cookies-eq/results", columns=["url", "round", "cookies_sent"]
    )
    engine = {
        (u, r): c
        for u, r, c in zip(
            t["url"].to_pylist(), t["round"].to_pylist(), t["cookies_sent"].to_pylist()
        )
    }
    assert engine == o.cookies_sent
    # round 0 requests carry no cookies; later rounds carry the host sid
    assert all(c == "" for (u, r), c in engine.items() if r == 0)
    later = [c for (u, r), c in engine.items() if r >= 2]
    assert later and any("sid=" in c for c in later)


def test_cookies_disabled(ray_session):
    """COOKIES_ENABLED=False: no header stamped anywhere, engine==oracle."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    cfg = CrawlConfig(cookies_enabled=False, max_rounds=6)
    crawl(corpus, "/tmp/crawl_out/cookies-off", cfg=cfg)
    o = run_oracle(corpus, cfg)
    t = pq.read_table("/tmp/crawl_out/cookies-off/results", columns=["cookies_sent"])
    assert set(t["cookies_sent"].to_pylist()) == {""}
    assert o.cookies_sent == {}


def test_pending_spill_equivalence(ray_session):
    """Force the frontier's parquet spill on every round (threshold 1 row)
    and assert the crawl is byte-equivalent to the oracle — spill/reload
    must be a pure persistence detail."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    cfg = CrawlConfig(pending_spill_rows=1)
    s = crawl(corpus, "/tmp/crawl_out/spill-eq", cfg=cfg)
    o = run_oracle(corpus, CrawlConfig())  # spill threshold is engine-only
    assert {k: s.totals[k] for k in o.totals()} == o.totals()
    assert s.total_fetched == o.totals()["fetched"]
    t = pq.read_table("/tmp/crawl_out/spill-eq/results", columns=["url", "extracted_text", "status"])
    eng_texts = {
        u: x
        for u, x, st in zip(
            t["url"].to_pylist(), t["extracted_text"].to_pylist(), t["status"].to_pylist()
        )
        if st == 200 and x is not None
    }
    assert eng_texts == o.texts


# --------------------------------------- per-request meta (M9/M10 analogues)
_JA, _JB = "ja0.example", "jc0.example"  # every page 0-5 is status-200


@pytest.fixture(scope="module")
def meta_corpus(tmp_path_factory):
    """Two hosts forcing jar separation to BIND: seed jar 0 crawls _JA's
    own chain while seed jar 7 (on _JB, with a meta_proxy override)
    cross-links into novel _JA pages — so round 1 fetches _JA under BOTH
    jars, one with the sid cookie observed in round 0, one with an empty
    jar.  A host-level jar could never produce two different Cookie
    headers on one host in one round."""
    out = str(tmp_path_factory.mktemp("meta-corpus"))
    pages = {}  # url -> html bytes

    def page(host, j, links):
        body = "".join(f'<a href="{l}">x</a>' for l in links)
        return (
            f"<html><body><p>pg {host} {j}</p>{body}</body></html>".encode()
        )

    links_a = {0: ["/p/1", "/p/2"], 1: [], 2: [], 3: [], 4: [], 5: []}
    for j, ls in links_a.items():
        pages[faults.page_url(_JA, j)] = page(_JA, j, ls)
    pages[faults.page_url(_JB, 0)] = page(
        _JB, 0, [faults.page_url(_JA, 3), faults.page_url(_JA, 4)]
    )

    os.makedirs(os.path.join(out, "pages"))
    urls = sorted(pages)
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([fxgen.EPOCH] * len(urls), pa.timestamp("us")),
                "html": pa.array([pages[u] for u in urls], pa.binary()),
                "text": pa.array(
                    [extract_text(pages[u]) for u in urls], pa.string()
                ),
                "lang": pa.array(["en"] * len(urls), pa.string()),
            },
            schema=fxgen.PAGES_SCHEMA,
        ),
        os.path.join(out, "pages", "part-0.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "url": pa.array(
                    [faults.page_url(_JA, 0), faults.page_url(_JB, 0)],
                    pa.string(),
                ),
                "seed_order": pa.array([0, 1], pa.int32()),
                "cookiejar": pa.array([0, 7], pa.int32()),
                "meta_proxy": pa.array(
                    ["", "http://tunnel.example:9999"], pa.string()
                ),
            }
        ),
        os.path.join(out, "seeds.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([_JA, _JB], pa.string()),
                "robots_txt": pa.array(
                    ["User-agent: *\nAllow: /\n"] * 2, pa.string()
                ),
            }
        ),
        os.path.join(out, "robots.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([_JA, _JB], pa.string()),
                "host_index": pa.array([0, 1], pa.int32()),
                "n_pages": pa.array([6, 1], pa.int32()),
                "host_hash": pa.array(
                    [fxgen.host_hash(_JA), fxgen.host_hash(_JB)], pa.uint64()
                ),
            }
        ),
        os.path.join(out, "hosts.parquet"),
    )
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"n_parts": 1}, f)
    return out


def test_per_request_meta_cookiejar_and_proxy_equivalence(ray_session, meta_corpus):
    """M9 meta['cookiejar'] + M10 meta['proxy'] analogues: per-seed jar ids
    and proxy overrides ride the frontier as columns, inherit
    parent->child, and the engine's cookies_sent / proxy / cookiejar
    outputs equal the independently-written oracle's — with jar
    separation actually exercised (same host, same round, two different
    Cookie headers under two jars)."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    cfg = CrawlConfig(allowed_domains=("example",), num_shards=2)
    crawl(meta_corpus, "/tmp/crawl_out/meta-eq", cfg=cfg)
    o = run_oracle(meta_corpus, cfg)

    t = pq.read_table(
        "/tmp/crawl_out/meta-eq/results",
        columns=["url", "round", "host", "status", "cookies_sent", "proxy",
                 "cookiejar"],
    )
    engine = {
        (u, r): c
        for u, r, c in zip(
            t["url"].to_pylist(), t["round"].to_pylist(),
            t["cookies_sent"].to_pylist(),
        )
    }
    assert engine == o.cookies_sent

    # proxy: the jar-7 subtree carries the explicit override (including
    # its cross-host fetches on _JA), jar-0 rows stay direct
    proxy_of = dict(zip(t["url"].to_pylist(), t["proxy"].to_pylist()))
    jar_of = dict(zip(t["url"].to_pylist(), t["cookiejar"].to_pylist()))
    got = {u: p for u, p in proxy_of.items() if p}
    assert got == o.proxies
    for u, j in jar_of.items():
        assert proxy_of[u] == ("http://tunnel.example:9999" if j == 7 else ""), u
    assert sorted(set(jar_of.values())) == [0, 7]

    # jar separation binds: _JA is fetched in one round under both jars
    # with DIFFERENT Cookie headers (sid vs empty)
    mixed = {}
    for u, r, h, st, c in zip(
        t["url"].to_pylist(), t["round"].to_pylist(), t["host"].to_pylist(),
        t["status"].to_pylist(), t["cookies_sent"].to_pylist(),
    ):
        if st == 200 and h == _JA:
            mixed.setdefault(r, set()).add(c)
    assert any(len(v) > 1 for v in mixed.values()), mixed


# --------------------------------------------- P6: sitemap-index recursion
_SM_HOST = "ja0.example"  # pages 0-5 all status-200 (shared probe result)


@pytest.fixture(scope="module")
def sitemap_index_corpus(tmp_path_factory):
    """A corpus whose robots.txt carries a ``Sitemap:`` directive pointing
    at a GZIP sitemap-INDEX document, which recurses into one gzip and one
    plain child urlset — the full scrapy/utils/sitemap.py traversal
    surface (robots directive, .xml.gz inflate, index recursion)."""
    import gzip as _gzip

    out = str(tmp_path_factory.mktemp("smx-corpus"))
    urls = [faults.page_url(_SM_HOST, j) for j in range(6)]
    # seed page links NOWHERE: every page beyond p/0 is reachable ONLY
    # through the sitemap traversal
    htmls = [
        f"<html><body><p>page {j}</p></body></html>".encode() for j in range(6)
    ]
    os.makedirs(os.path.join(out, "pages"))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([fxgen.EPOCH] * 6, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([extract_text(h) for h in htmls], pa.string()),
                "lang": pa.array(["en"] * 6, pa.string()),
            },
            schema=fxgen.PAGES_SCHEMA,
        ),
        os.path.join(out, "pages", "part-0.parquet"),
    )
    pq.write_table(
        pa.table({"url": pa.array([urls[0]], pa.string()),
                  "seed_order": pa.array([0], pa.int32())}),
        os.path.join(out, "seeds.parquet"),
    )
    base = f"http://{_SM_HOST}"
    robots = (
        "User-agent: *\nAllow: /\n"
        f"Sitemap: {base}/sitemap-index.xml.gz\n"
    )
    pq.write_table(
        pa.table({"host": pa.array([_SM_HOST], pa.string()),
                  "robots_txt": pa.array([robots], pa.string())}),
        os.path.join(out, "robots.parquet"),
    )

    def urlset(js):
        locs = "".join(f"<url><loc>{faults.page_url(_SM_HOST, j)}</loc></url>"
                       for j in js)
        return (
            '<?xml version="1.0"?><urlset '
            f'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">{locs}</urlset>'
        ).encode()

    index = (
        '<?xml version="1.0"?><sitemapindex '
        'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        f"<sitemap><loc>{base}/sm-a.xml.gz</loc></sitemap>"
        f"<sitemap><loc>{base}/sm-b.xml</loc></sitemap>"
        f"<sitemap><loc>{base}/sitemap-index.xml.gz</loc></sitemap>"  # cycle
        f"<sitemap><loc>{base}/missing.xml</loc></sitemap>"  # unknown doc
        "</sitemapindex>"
    ).encode()
    pq.write_table(
        pa.table(
            {
                "url": pa.array(
                    [f"{base}/sitemap-index.xml.gz", f"{base}/sm-a.xml.gz",
                     f"{base}/sm-b.xml"],
                    pa.string(),
                ),
                "body": pa.array(
                    [_gzip.compress(index), _gzip.compress(urlset([1, 2, 3])),
                     urlset([4, 5])],
                    pa.binary(),
                ),
            }
        ),
        os.path.join(out, "sitemap_docs.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([_SM_HOST], pa.string()),
                "host_index": pa.array([0], pa.int32()),
                "n_pages": pa.array([6], pa.int32()),
                "host_hash": pa.array([fxgen.host_hash(_SM_HOST)], pa.uint64()),
            }
        ),
        os.path.join(out, "hosts.parquet"),
    )
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"n_parts": 1}, f)
    return out


def test_sitemap_index_recursion_equivalence(ray_session, sitemap_index_corpus):
    """Robots ``Sitemap:`` directive -> gzip sitemap-index -> gzip + plain
    child urlsets: all listed pages crawled, cycle and missing-doc entries
    ignored, engine==oracle; with sitemap_seeds off only the seed page is
    reachable (the corpus has no links)."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.oracle import run_oracle

    cfg = CrawlConfig(allowed_domains=("example",), sitemap_seeds=True,
                      num_shards=2)
    s = crawl(sitemap_index_corpus, "/tmp/crawl_out/smx-eq", cfg=cfg)
    o = run_oracle(sitemap_index_corpus, cfg)
    assert {k: s.totals[k] for k in o.totals()} == o.totals()
    assert s.total_fetched == o.totals()["fetched"] == 6

    t = pq.read_table("/tmp/crawl_out/smx-eq/results",
                      columns=["url", "status", "parent_url"])
    fetched = {u for u, st in zip(t["url"].to_pylist(), t["status"].to_pylist())
               if st == 200}
    assert fetched == {faults.page_url(_SM_HOST, j) for j in range(6)}
    parents = set(t["parent_url"].to_pylist())
    assert f"sitemap:{_SM_HOST}" in parents

    # the control: without the traversal, pages 1-5 are unreachable
    o_plain = run_oracle(
        sitemap_index_corpus,
        CrawlConfig(allowed_domains=("example",), num_shards=2),
    )
    assert o_plain.totals()["fetched"] == 1
