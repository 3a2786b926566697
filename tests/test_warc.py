"""WARC source round-trip: the byte-level evidence that reading pages from
Common-Crawl-style ``.warc.gz`` shards reproduces the parquet corpus
exactly (url, warc_ts to the microsecond, html bytes), plus framing unit
tests for the payload cases that break separator-scanning parsers.
"""

from __future__ import annotations

import glob
import gzip
import hashlib
import os
from urllib.parse import urlsplit

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from scrapy__ray.sources.warc import (
    parse_warc,
    read_warc,
    warc_mirror,
    write_warc_shard,
)


def _roundtrip(rows, **kw):
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.warc.gz")
        write_warc_shard(rows, path, **kw)
        with open(path, "rb") as f:
            return parse_warc(f.read())


TRICKY = [
    # payload containing a fake record boundary — Content-Length framing
    # must NOT split here
    ("http://a.example/x", 1_600_000_000_123_456, b"<p>\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\n</p>"),
    ("http://a.example/empty", 0, b""),
    ("http://b.example/unicode/é", 1_700_000_000_000_000, "<h1>café</h1>".encode()),
    # zero-microsecond timestamp still writes/parses the fractional form
    ("http://c.example/whole-second", 1_500_000_000_000_000, b"<i>x</i>"),
]


def test_roundtrip_tricky_payloads():
    urls, tss, htmls = _roundtrip(TRICKY)
    assert urls == [r[0] for r in TRICKY]
    assert tss == [r[1] for r in TRICKY]
    assert htmls == [r[2] for r in TRICKY]


def test_roundtrip_plain_uncompressed():
    urls, tss, htmls = _roundtrip(TRICKY, per_record_gzip=False)
    assert (urls, tss, htmls) == (
        [r[0] for r in TRICKY],
        [r[1] for r in TRICKY],
        [r[2] for r in TRICKY],
    )


def test_warcinfo_record_skipped_and_members_concatenate():
    """The leading warcinfo record parses (framing) but emits no row, and
    each record is its own gzip member — the Common Crawl layout."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "t.warc.gz")
        write_warc_shard(TRICKY[:2], path)
        raw = open(path, "rb").read()
        # 1 warcinfo + 2 responses = 3 gzip members
        assert raw.count(b"\x1f\x8b\x08") == 3
        plain = gzip.decompress(raw)
        assert plain.startswith(b"WARC/1.0\r\nWARC-Type: warcinfo")
        urls, _, _ = parse_warc(raw)
        assert len(urls) == 2


def test_non_warc_input_raises():
    with pytest.raises(ValueError):
        parse_warc(b"HTTP/1.1 200 OK\r\n\r\nnope\r\n\r\n")


def test_warc_mirror_matches_parquet_corpus(ray_session):
    """End to end: mirror the fixture corpus to .warc.gz, read it back as
    a Dataset, and compare EVERY record digest against the parquet truth —
    the per-host rollup crawl_warc_source serves to the driver."""
    import fixtures.gen as fxgen

    from scrapy__ray.pipelines.crawlq import crawl_warc_source

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    got = crawl_warc_source("unused")

    rows = []
    for f in sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet"))):
        t = pq.read_table(f, columns=["url", "warc_ts", "html"])
        ts_us = t["warc_ts"].cast("int64").to_pylist()
        for u, s, h in zip(t["url"].to_pylist(), ts_us, t["html"].to_pylist()):
            dig = int.from_bytes(
                hashlib.sha1(
                    u.encode() + b"|" + str(s).encode() + b"|" + h
                ).digest()[:4],
                "big",
            )
            rows.append((urlsplit(u).netloc, 1, len(h), dig))
    want = (
        pd.DataFrame(rows, columns=["host", "n_pages", "html_bytes", "digest_sum"])
        .groupby("host", as_index=False)
        .sum()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"n_pages": np.int64}), want, check_dtype=False
    )


def test_url_templates_oracle(ray_session):
    """crawl_url_templates vs an independent pure-Python mirror (urlsplit
    + re, no pandas str ops) over every corpus URL."""
    import re
    from collections import Counter

    import fixtures.gen as fxgen

    from scrapy__ray.pipelines.crawlq import _TRAP_MIN_URLS, crawl_url_templates

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    got = crawl_url_templates("unused")

    counts: Counter = Counter()
    for f in sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet"))):
        for u in pq.read_table(f, columns=["url"]).column("url").to_pylist():
            sp = urlsplit(u)
            rest = sp.path
            if sp.query:
                rest += "?" + sp.query
            if sp.fragment:
                rest += "#" + sp.fragment
            rest = re.sub(r"=[^&#]*", "=", rest)
            rest = re.sub(r"\d+", "{d}", rest)
            counts[(sp.netloc, rest)] += 1
    want = (
        pd.DataFrame(
            [(h, t, n) for (h, t), n in counts.items() if n >= _TRAP_MIN_URLS],
            columns=["host", "template", "n_urls"],
        )
        .sort_values(["host", "template"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(want) > 0  # the fixture's /p/{d} family is detected


def test_warc_mirror_cache_invalidates_on_source_change(tmp_path):
    """The mirror is keyed by source identity: touching a pages partition
    regenerates, an unchanged corpus reuses."""
    import fixtures.gen as fxgen

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    d1 = warc_mirror(corpus)
    m1 = os.stat(os.path.join(d1, "_COMPLETE")).st_mtime_ns
    d2 = warc_mirror(corpus)
    assert d1 == d2
    assert os.stat(os.path.join(d2, "_COMPLETE")).st_mtime_ns == m1


def test_crawl_warc_sink_roundtrip(ray_session, tmp_path):
    """S4 WARC sink: with warc_export=True the crawl tees every 200
    body into per-(round, batch) .warc.gz shards; parsing ALL shards
    reproduces exactly the set of (url, html-bytes) the corpus served to
    200-fetched urls — and the shard set is deterministic (two fresh
    crawls byte-identical file-for-file)."""
    import fixtures.gen as fxgen
    from scrapy__ray.config import CrawlConfig
    from scrapy__ray.engine import crawl
    from scrapy__ray.sources.warc import parse_warc

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    cfg = CrawlConfig(warc_export=True)

    def run(out):
        crawl(corpus, out, cfg=cfg)
        got: dict[str, bytes] = {}
        shard_hashes = {}
        for p in sorted(glob.glob(os.path.join(out, "warc", "*", "*.warc.gz"))):
            with open(p, "rb") as f:
                data = f.read()
            shard_hashes[os.path.relpath(p, out)] = hashlib.sha1(data).hexdigest()
            urls, ts, htmls = parse_warc(data)
            for u, h in zip(urls, htmls):
                got[u] = h
        return out, got, shard_hashes

    out, got, hashes = run(str(tmp_path / "w1"))

    # every 200-status result row has its exact corpus body archived
    res = pq.read_table(os.path.join(out, "results"),
                        columns=["url", "status"])
    ok_urls = {u for u, st in zip(res["url"].to_pylist(),
                                  res["status"].to_pylist()) if st == 200}
    pages = pq.read_table(os.path.join(corpus, "pages"),
                          columns=["url", "html"])
    expect = dict(zip(pages["url"].to_pylist(), pages["html"].to_pylist()))
    archived_expected = {u for u in ok_urls if u in expect}
    assert archived_expected and set(got) == archived_expected
    for u in got:
        assert got[u] == expect[u], u

    # determinism: a second fresh crawl writes the identical shard set
    _, got2, hashes2 = run(str(tmp_path / "w2"))
    assert hashes == hashes2 and got2 == got


def test_crawl_warc_sink_resume_drops_partial_rounds(ray_session, tmp_path):
    """Resume contract parity with the results sink: WARC round dirs past
    the last committed checkpoint are dropped and rewritten, so a killed
    run's archive equals an uninterrupted run's."""
    import fixtures.gen as fxgen
    from scrapy__ray.config import CrawlConfig
    from scrapy__ray.engine import crawl
    from scrapy__ray.sources.warc import parse_warc

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))

    def warc_map(out):
        got = {}
        for p in sorted(glob.glob(os.path.join(out, "warc", "*", "*.warc.gz"))):
            with open(p, "rb") as f:
                urls, _ts, htmls = parse_warc(f.read())
            got.update(zip(urls, htmls))
        return got

    full = str(tmp_path / "full")
    crawl(corpus, full, cfg=CrawlConfig(warc_export=True))

    part = str(tmp_path / "part")
    crawl(corpus, part, cfg=CrawlConfig(warc_export=True, max_rounds=3))
    crawl(corpus, part, cfg=CrawlConfig(warc_export=True), resume=True)
    assert warc_map(part) == warc_map(full)
