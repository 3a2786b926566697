"""Block-level webtext semantics: the main-content block walker and the
paragraph-dedup unit extractor (pure DOM functions — no Ray).  The
engine-vs-oracle equivalence for crawl_main_content / crawl_paragraph_dedup
runs in the driver-mimic suite (test_queries_vs_duckdb.py) against the
independent regex oracles."""

from __future__ import annotations

from scrapy__ray.functions.cssselect import parse_dom
from scrapy__ray.pipelines.crawlq import (
    _LINK_DENSITY_MAX,
    _norm_ws,
    _page_blocks,
    _page_units,
)


def test_page_blocks_topmost_only():
    # the ul nested inside blockquote belongs to the blockquote block;
    # the div is transparent (not a block tag) so its p IS a block
    html = (
        b"<html><body>"
        b"<blockquote>quote <ul><li><a href='/x'>nav</a></li></ul></blockquote>"
        b"<div><p>content here</p></div>"
        b"</body></html>"
    )
    blocks = _page_blocks(parse_dom(html))
    assert [b[0] for b in blocks] == ["quote nav", "content here"]


def test_page_blocks_link_density():
    html = (
        b"<html><body>"
        b"<p>plain paragraph with no anchors</p>"
        b"<ul><li><a href='/a'>anchor 0</a></li><li><a href='/b'>anchor 1</a></li></ul>"
        b"<p><a href='/c'>tiny</a> mostly plain text around the link here</p>"
        b"</body></html>"
    )
    blocks = _page_blocks(parse_dom(html))
    dens = [link / tot for _t, tot, link in blocks]
    assert dens[0] == 0.0
    assert dens[1] == 1.0  # all anchor text -> dropped by the 0.5 rule
    assert 0.0 < dens[2] < _LINK_DENSITY_MAX


def test_page_blocks_link_chars_capped_by_total():
    # anchor text 'a b' normalizes to 3 chars but the block total 'ab'
    # (no surrounding whitespace) could normalize shorter; the cap keeps
    # density <= 1.0 by contract
    html = b"<html><body><p><a href='/x'>a\nb</a></p></body></html>"
    (_txt, tot, link), = _page_blocks(parse_dom(html))
    assert link <= tot


def test_page_units_distinct_within_page():
    html = (
        b"<html><body>"
        b"<p>dup text</p><p>dup text</p><p>other</p>"
        b"<ul><li><a href='/x'>nav item</a></li><li><a href='/y'>nav item</a></li></ul>"
        b"<p>  </p>"
        b"</body></html>"
    )
    units = _page_units(parse_dom(html))
    assert units == sorted({"dup text", "other", "nav item"})


def test_norm_ws_collapses_all_whitespace():
    assert _norm_ws("  a\t\nb   c ") == "a b c"
