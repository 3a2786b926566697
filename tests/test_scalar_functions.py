"""Table-driven byte-exact tests for the scalar core (SURVEY.md §5.2 item 1)."""

from __future__ import annotations

import gzip
import json
import os

import pytest

from scrapy__ray.functions import (
    canonicalize_url,
    decode_html,
    extract_links,
    extract_text,
    host_of,
    request_fingerprint,
    url_is_from_any_domain,
    urljoin_with_base,
)
from scrapy__ray.functions.fingerprint import fingerprint_canonical

VEC = os.path.join(os.path.dirname(__file__), "vectors")


def _load(name):
    with open(os.path.join(VEC, name)) as f:
        return [json.loads(line) for line in f if line.strip()]


# ---------------------------------------------------------------- canonical


@pytest.mark.parametrize("vec", _load("canonical.jsonl"), ids=lambda v: v["case"])
def test_canonicalize_vectors(vec):
    got = canonicalize_url(vec["in"])
    assert got == vec["out"], vec["case"]
    assert canonicalize_url(got) == got, "idempotence: " + vec["case"]


def test_fingerprint_equivalence_classes():
    # shuffled params + fragment + case + default port all collapse
    variants = [
        "http://h0.example/p/5?b=2&a=1#frag",
        "HTTP://H0.EXAMPLE:80/p/5?a=1&b=2",
        "http://h0.example/p/%35?b=2&a=1",
    ]
    fps = {request_fingerprint(u) for u in variants}
    assert len(fps) == 1
    assert len(request_fingerprint(variants[0])) == 20
    # distinct urls -> distinct fingerprints
    assert request_fingerprint("http://h0.example/p/6") not in fps
    # hot-path variant agrees with the general one on canonical urls
    cu = canonicalize_url(variants[0])
    assert fingerprint_canonical(cu) == request_fingerprint(variants[0])


def test_host_and_domain_helpers():
    assert host_of("http://H0.Example:8080/p/1") == "h0.example"
    assert host_of("http://user:pw@h0.example/p") == "h0.example"
    assert url_is_from_any_domain("http://h0.example/p", ["example"])
    assert url_is_from_any_domain("http://example/p", ["example"])
    assert not url_is_from_any_domain("http://external.invalid/x", ["example"])
    assert not url_is_from_any_domain("http://notexample.com/x", ["example"])


def test_urljoin_with_base():
    page = "http://h0.example/a/b/page.html"
    assert urljoin_with_base(page, None, "/p/1") == "http://h0.example/p/1"
    assert urljoin_with_base(page, None, "p/1") == "http://h0.example/a/b/p/1"
    assert urljoin_with_base(page, None, "../p/1") == "http://h0.example/a/p/1"
    assert (
        urljoin_with_base(page, "http://h9.example/base/", "p/1")
        == "http://h9.example/base/p/1"
    )
    assert (
        urljoin_with_base(page, "/root/", "p/1") == "http://h0.example/root/p/1"
    )


# ---------------------------------------------------------------- extraction


@pytest.mark.parametrize("vec", _load("textextract.jsonl"), ids=lambda v: v["case"])
def test_extract_text_vectors(vec):
    assert extract_text(vec["html"].encode("utf-8")) == vec["text"]


def test_encoding_precedence():
    # declared charset wins
    body = "<p>café</p>".encode("latin-1")
    assert "café" in decode_html(body, declared="iso-8859-1")
    # meta charset within first 4 KiB
    meta = b'<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9</p></body></html>'
    assert extract_text(meta) == "café"
    meta2 = (
        b'<html><head><meta http-equiv="Content-Type" '
        b'content="text/html; charset=iso-8859-1"></head><body><p>caf\xe9</p></body></html>'
    )
    assert extract_text(meta2) == "café"
    # BOM beats the utf-8 fallback and is stripped
    bom = "﻿".encode("utf-8")[0:3] + "<p>ok</p>".encode("utf-8")
    assert extract_text(bom) == "ok"
    # fallback utf-8 with errors=replace never raises
    assert extract_text(b"<p>\xff\xfe\xfa</p>") != ""


def test_extract_links_rules():
    page = "http://h0.example/p/0"
    html = (
        b"<html><head><base href='/base/'></head><body>"
        b"<ul>"
        b"<li><a href='p/1'>a</a></li>"
        b"<li><a href='/p/2'>b</a></li>"
        b"<li><a href='http://h1.example/p/0'>c</a></li>"
        b"<li><a href='mailto:x@y.z'>d</a></li>"
        b"<li><a href='javascript:void(0)'>e</a></li>"
        b"<li><a href='/img/file.jpg'>f</a></li>"
        b"<li><a href='/doc.pdf'>g</a></li>"
        b"<li><a href='/p/2#frag'>dup-of-b</a></li>"
        b"<li><a href=' p/1 '>ws-dup-of-a</a></li>"
        b"<li><area href='/p/3'></li>"
        b"</ul></body></html>"
    )
    links = extract_links(html, page)
    assert links == [
        "http://h0.example/base/p/1",  # relative resolves against <base>
        "http://h0.example/p/2",
        "http://h1.example/p/0",
        "http://h0.example/p/3",
    ]


def test_extract_links_no_base():
    html = b"<a href='p/1'>x</a><a href='archive.tar.gz'>y</a>"
    assert extract_links(html, "http://h0.example/p/0") == ["http://h0.example/p/p/1"]


def test_gzip_roundtrip_helper():
    # compression-middleware analogue (SURVEY.md M6): gzipped body variant
    raw = b"<p>zipped</p>"
    assert extract_text(gzip.decompress(gzip.compress(raw))) == "zipped"


# ------------------------------------------------------- M10 / M15 scalars


@pytest.mark.parametrize(
    "url,http_proxy,no_proxy,expect",
    [
        ("http://h1.example/p/0", "", "", ""),
        ("http://h1.example/p/0", "http://px.example:3128", "", "http://px.example:3128"),
        ("http://h1.example/p/0", "http://px.example:3128", "*", ""),
        # whitespace-padded star is NOT the raw '*' string — urllib's
        # proxy_bypass_environment treats it as a literal entry (no bypass)
        ("http://h1.example/p/0", "http://px.example:3128", " * ",
         "http://px.example:3128"),
        # '*' as a LIST ENTRY is a literal, not a wildcard (urllib checks
        # the whole raw string only) — h2 stays proxied, h1 bypassed by name
        ("http://h2.example/p/0", "http://px.example:3128", "h1.example,*", "http://px.example:3128"),
        ("http://h1.example/p/0", "http://px.example:3128", "h1.example,*", ""),
        ("http://h3.example/p/0", "http://px.example:3128", "h3.example", ""),
        # dot-suffix entry matches subdomains, not the bare parent
        ("http://a.h3.example/p/0", "http://px.example:3128", ".h3.example", ""),
        ("http://h3.example/p/0", "http://px.example:3128", ".h3.example", ""),
        ("http://xh3.example/p/0", "http://px.example:3128", "h3.example", "http://px.example:3128"),
        # comma list, whitespace, case-insensitive hosts
        ("http://H5.example/p/0", "http://px.example:3128", " h4.example , h5.example ", ""),
    ],
    ids=["unset", "proxied", "star", "star-ws", "star-in-list-other",
         "star-in-list-named", "exact", "dotsub", "dotexact",
         "nosuffixtrick", "list"],
)
def test_effective_proxy_vectors(url, http_proxy, no_proxy, expect):
    from scrapy__ray.functions.url import effective_proxy

    assert effective_proxy(url, http_proxy, no_proxy) == expect
    # the oracle's independently-written mirror must agree on every vector
    from scrapy__ray.oracle import _oracle_proxy

    assert _oracle_proxy(host_of(url), http_proxy, no_proxy) == expect


def test_escaped_fragment_url():
    from scrapy__ray.functions.url import escaped_fragment_url

    assert (
        escaped_fragment_url("http://h0.example/p/2")
        == "http://h0.example/p/2?_escaped_fragment_="
    )
    assert (
        escaped_fragment_url("http://h0.example/p/9?a=1&b=2")
        == "http://h0.example/p/9?a=1&b=2&_escaped_fragment_="
    )


def test_effective_proxy_conforms_to_cpython_bypass():
    """Enumerated conformance against urllib.request.proxy_bypass_environment
    (the convention both implementations pin): every (host, no_proxy)
    combination must agree on bypass-vs-proxy — this is the fuzz that
    caught the '*'-as-list-entry divergence in review."""
    from itertools import combinations
    from urllib.request import proxy_bypass_environment

    from scrapy__ray.functions.url import effective_proxy
    from scrapy__ray.oracle import _oracle_proxy

    hosts = ["h1.example", "a.h1.example", "xh1.example", "h2.example"]
    pool = ["h1.example", ".h1.example", "*", " * ", "h2.example",
            " h1.example ", ""]
    cases = [""]
    for r in (1, 2, 3):
        cases += [",".join(c) for c in combinations(pool, r)]
    px = "http://px.example:3128"
    for h in hosts:
        for np_ in cases:
            expect_bypass = bool(proxy_bypass_environment(h, {"no": np_}))
            got = effective_proxy(f"http://{h}/p/0", px, np_)
            assert (got == "") == expect_bypass, (h, np_, got)
            assert _oracle_proxy(h, px, np_) == got, (h, np_)


def test_charset_guess_precedence5():
    """P2 precedence 5 (the chardet slot of w3lib's html_to_unicode,
    filled by the run-length heuristic): undeclared legacy pages decode
    back to their true text byte-exactly; declared/meta/BOM/valid-UTF-8
    pages are untouched by the guess."""
    from scrapy__ray.functions.encoding import decode_html, guess_charset

    ru = "Пример страницы на русском языке — длинные слова кириллицей."
    fr = "Un été à Genève: café, crème brûlée, déjà vu, garçon, où ça?"
    de = "Die Küche in München: schön, größer, Straße, fünf Häuser."
    page = "<html><body><p>{}</p></body></html>"

    assert guess_charset(page.format(ru).encode("cp1251")) == "cp1251"
    assert guess_charset(page.format(fr).encode("latin-1")) == "cp1252"
    assert guess_charset(page.format(de).encode("latin-1")) == "cp1252"
    # whole round trip through the extract-facing decoder
    assert decode_html(page.format(ru).encode("cp1251")) == page.format(ru)
    assert decode_html(page.format(fr).encode("latin-1")) == page.format(fr)
    # valid UTF-8 (incl. pure ASCII) never reaches the legacy guess
    assert guess_charset(page.format(ru).encode("utf-8")) == "utf-8"
    assert guess_charset(b"plain ascii only") == "utf-8"
    # declared charset still outranks the guess (precedence 1)
    assert decode_html(page.format(ru).encode("cp1251"), declared="cp1251") == page.format(ru)


def test_charset_guess_crawl_byte_identity(ray_session, tmp_path):
    """End-to-end over the engine: a corpus of UNDECLARED cp1251 and
    latin-1 pages (no meta, no BOM) must extract byte-identical text —
    the input_hint's per-row invariant through the new precedence-5 path."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    import fixtures.gen as fxgen
    from fixtures import faults
    from scrapy__ray.engine import crawl
    from scrapy__ray.functions.textextract import extract_text

    host = "enc0.example"
    texts = {
        0: "Стартовая страница — русский текст без объявления кодировки",
        1: "Une page française sans déclaration d'encodage: été, garçon",
        2: "Noch eine Seite: Müller, Straße, größer, schön und fünf",
    }
    encs = {0: "cp1251", 1: "latin-1", 2: "latin-1"}
    out = str(tmp_path / "enc-corpus")
    os.makedirs(os.path.join(out, "pages"))
    urls, htmls = [], []
    for j, txt in texts.items():
        links = "".join(
            f'<a href="/p/{k}">x</a>' for k in range(j + 1, len(texts))
        )
        urls.append(faults.page_url(host, j))
        htmls.append(
            f"<html><body><p>{txt}</p>{links}</body></html>".encode(encs[j])
        )
    pq.write_table(
        pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array([fxgen.EPOCH] * len(urls), pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([extract_text(h) for h in htmls], pa.string()),
                "lang": pa.array(["xx"] * len(urls), pa.string()),
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
        pa.table({"host": pa.array([host], pa.string()),
                  "robots_txt": pa.array(["User-agent: *\nAllow: /\n"], pa.string())}),
        os.path.join(out, "robots.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array([host], pa.string()),
                "host_index": pa.array([0], pa.int32()),
                "n_pages": pa.array([len(urls)], pa.int32()),
                "host_hash": pa.array([fxgen.host_hash(host)], pa.uint64()),
            }
        ),
        os.path.join(out, "hosts.parquet"),
    )
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"n_parts": 1}, f)

    from scrapy__ray.config import CrawlConfig

    crawl(out, str(tmp_path / "enc-out"),
          cfg=CrawlConfig(allowed_domains=("example",), num_shards=2))
    res = pq.read_table(str(tmp_path / "enc-out") + "/results",
                        columns=["url", "status", "extracted_text"])
    got = {
        u: t
        for u, s, t in zip(res["url"].to_pylist(), res["status"].to_pylist(),
                           res["extracted_text"].to_pylist())
        if s == 200
    }
    for j, txt in texts.items():
        u = faults.page_url(host, j)
        if u in got:  # fault model may 404/retry some page; 200s must match
            assert txt in got[u], (j, got[u])
    assert sum(1 for j in texts if faults.page_url(host, j) in got) >= 2
