"""Vector tests for the CSS-subset selector (SURVEY.md §2.6 P3).

Mirrors the upstream test style of ``tests/test_linkextractors.py`` (dozens
of hand-written html/selector/expected triples) — the expected values here
are derived BY HAND from the CSS semantics parsel implements, not from the
implementation, so they are an independent gate.
"""

from __future__ import annotations

import pytest

from scrapy__ray.functions.cssselect import (
    SelectorError,
    css_extract,
    css_select,
    parse_dom,
)

DOC = b"""<html><head><title>The Title</title><meta charset="utf-8"></head>
<body>
<h1 id="main" class="big hero">Heading</h1>
<p class="intro">intro <b>bold</b> tail</p>
<p class="intro outro">both</p>
<p>plain</p>
<ul class="nav">
  <li><a href="/one">One</a></li>
  <li class="sel"><a href="/two" rel="next" data-id="7">Two</a></li>
</ul>
<div><div class="note"><span>nested</span></div><span>shallow</span></div>
<img src="/x.png" alt="pic">
</body></html>"""

VECTORS = [
    # (selector, expected css_extract output)
    ("title::text", ["The Title"]),
    ("h1::text", ["Heading"]),
    ("h1.big::text", ["Heading"]),
    ("h1.big.hero::text", ["Heading"]),
    ("h1.missing::text", []),
    ("#main::text", ["Heading"]),
    ("h1#main.big::text", ["Heading"]),
    ("p::text", ["intro bold tail", "both", "plain"]),
    ("p.intro::text", ["intro bold tail", "both"]),
    ("p.intro.outro::text", ["both"]),
    ("ul li a::attr(href)", ["/one", "/two"]),
    ("ul > li > a::attr(href)", ["/one", "/two"]),
    ("li.sel a::attr(href)", ["/two"]),
    ("a[rel]::attr(href)", ["/two"]),
    ("a[rel=next]::attr(href)", ["/two"]),
    ('a[rel="next"]::attr(data-id)', ["7"]),
    ("a[rel=prev]::attr(href)", []),
    # ::attr skips matches lacking the attribute
    ("a::attr(rel)", ["next"]),
    # child vs descendant: BOTH spans have a div parent (outer div and
    # div.note), so `div > span` matches both; restricting the parent
    # compound separates them
    ("div > span::text", ["nested", "shallow"]),
    ("div.note > span::text", ["nested"]),
    ("div > div > span::text", ["nested"]),
    ("div span::text", ["nested", "shallow"]),
    ("div.note span::text", ["nested"]),
    # comma groups, document order, no duplicates
    ("h1, p.intro::text", ["Heading", "intro bold tail", "both"]),
    ("p, p.intro::text", ["intro bold tail", "both", "plain"]),
    # void element attributes
    ("img::attr(alt)", ["pic"]),
    ("img::attr(src)", ["/x.png"]),
    # universal
    ("ul *::attr(href)", ["/one", "/two"]),
    # sibling combinators (round 3): h1 + p = adjacent, h1 ~ p = general
    ("h1 + p::text", ["intro bold tail"]),
    ("h1 ~ p::text", ["intro bold tail", "both", "plain"]),
    ("p.intro + p::text", ["both", "plain"]),
    ("p + p.intro::text", ["both"]),
    ("ul + div span::text", ["nested", "shallow"]),
    ("h1 + ul::text", []),  # adjacent must be the IMMEDIATELY preceding one
    ("p ~ ul li a::attr(href)", ["/one", "/two"]),
    # attribute operators (round 3)
    ("a[rel^=ne]::attr(href)", ["/two"]),
    ("a[rel$=xt]::attr(href)", ["/two"]),
    ("a[rel*=ex]::attr(href)", ["/two"]),
    ("a[rel^=xt]::attr(href)", []),
    ("h1[class~=hero]::text", ["Heading"]),
    ("h1[class~=her]::text", []),  # ~= is whole-word, not substring
    ('a[href|="/two"]::attr(rel)', ["next"]),
    # quoted attribute values containing whitespace / '>' must parse
    ('a[data-id="7"]::attr(href)', ["/two"]),
    # compact combinators without spaces
    ("ul>li>a::attr(href)", ["/one", "/two"]),
    ("h1+p::text", ["intro bold tail"]),
    ("h1~p.intro::text", ["intro bold tail", "both"]),
    # pseudo-classes (round 3).  body's element children are
    # h1=1, p.intro=2, p.intro.outro=3, p=4, ul=5, div=6, img=7.
    ("li:first-child a::attr(href)", ["/one"]),
    ("li:last-child a::attr(href)", ["/two"]),
    ("h1:first-child::text", ["Heading"]),
    ("p:first-of-type::text", ["intro bold tail"]),
    ("p:last-of-type::text", ["plain"]),
    ("p:nth-child(2)::text", ["intro bold tail"]),
    ("p:nth-child(odd)::text", ["both"]),
    ("p:nth-child(even)::text", ["intro bold tail", "plain"]),
    ("p:nth-child(2n)::text", ["intro bold tail", "plain"]),
    ("p:nth-child(2n + 1)::text", ["both"]),  # spaces inside the formula
    ("p:nth-child(n+3)::text", ["both", "plain"]),
    ("p:nth-child(-n+3)::text", ["intro bold tail", "both"]),
    ("p:nth-of-type(2)::text", ["both"]),
    ("p:nth-last-of-type(1)::text", ["plain"]),
    ("ul li:nth-child(2) a::attr(href)", ["/two"]),
    ("div span:only-child::text", ["nested"]),
    ("li a:only-child::attr(href)", ["/one", "/two"]),
    # :not
    ("p:not(.intro)::text", ["plain"]),
    ("p:not([class])::text", ["plain"]),
    ("li:not(.sel) a::attr(href)", ["/one"]),
    ("a:not([rel])::attr(href)", ["/one"]),
    ("p:not(.intro):not(.outro)::text", ["plain"]),
    # pseudo-class composed with combinators
    ("ul.nav > li:last-child > a::attr(data-id)", ["7"]),
    ("h1 ~ p:last-of-type::text", ["plain"]),
]


@pytest.mark.parametrize("selector,expected", VECTORS, ids=[v[0] for v in VECTORS])
def test_vector(selector, expected):
    assert css_extract(DOC, selector) == expected


def test_malformed_unclosed_tags():
    html = b"<ul><li>one<li>two</ul><p>after"
    assert css_extract(html, "li::text") == ["one", "two"]
    assert css_extract(html, "p::text") == ["after"]


def test_entities_decoded():
    assert css_extract(b"<p>a &amp; b &#169;</p>", "p::text") == ["a & b \xa9"]


def test_nested_same_tag_close():
    html = b"<div>a<div>b</div>c</div>"
    assert css_extract(html, "div::text") == ["abc", "b"]


def test_latin1_meta_charset():
    html = '<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9</p></body></html>'.encode(
        "latin-1"
    )
    assert css_extract(html, "p::text") == ["café"]


def test_bom_utf8():
    html = b"\xef\xbb\xbf<p>ok</p>"
    assert css_extract(html, "p::text") == ["ok"]


def test_element_without_pseudo_returns_text():
    assert css_extract(b"<p>x<b>y</b></p>", "p") == ["xy"]


def test_select_returns_nodes_in_doc_order():
    root = parse_dom(DOC)
    tags = [n.tag for n in css_select(root, "p, h1")]
    assert tags == ["h1", "p", "p", "p"]


def test_bad_selectors_raise():
    for bad in ["", ">", "> p", "p >", "p ~", "+ p", "p > > q", ":hover",
                "a[unclosed", "p:nth-child", "p:nth-child(x)",
                "p:nth-child(2n+", "p:first-child(2)", "p:not()",
                "p:not(:not(a))", "p:not(a b)", "p::text em"]:
        with pytest.raises(SelectorError):
            css_select(parse_dom(DOC), bad)


def test_descendant_backtracking():
    """'div > span em': the em's NEAREST span ancestor has a q parent, but
    a higher span has the div parent — greedy nearest-ancestor locking
    returned a false negative here (advice r2)."""
    html = b"<div><span><q><span><em>x</em></span></q></span></div>"
    assert css_extract(html, "div > span em::text") == ["x"]
    # and the chain still fails when NO span ancestor has a div parent
    html2 = b"<section><span><q><span><em>x</em></span></q></span></section>"
    assert css_extract(html2, "div > span em::text") == []


def test_quoted_attr_value_with_space_and_gt():
    html = b'<p title="a > b">one</p><p title="c">two</p>'
    assert css_extract(html, 'p[title="a > b"]::text') == ["one"]
    assert css_extract(html, 'p[title="a > b"], p[title=c]::text') == [
        "one",
        "two",
    ]


def test_per_group_pseudo_elements():
    # parsel applies each group's pseudo independently
    assert css_extract(DOC, "h1::text, li.sel a::attr(href)") == [
        "Heading",
        "/two",
    ]
    # same element, text + attr groups: both extractions survive dedup
    assert css_extract(DOC, "a[rel]::attr(rel), a[rel]::text") == [
        "next",
        "Two",
    ]


def test_sibling_of_text_nodes_skipped():
    # text between siblings must not break adjacency
    html = b"<div><h2>t</h2> some text <p>x</p></div>"
    assert css_extract(html, "h2 + p::text") == ["x"]


def test_re_extract_parsel_semantics():
    """Selector.re surface: no groups -> full matches; groups -> group
    values flattened; a group named 'extract' -> one search() result per
    string; re_first -> first or default."""
    from scrapy__ray.functions.cssselect import re_extract, re_first

    strings = ["price: $10.50 or $3", "no price", "sale $7.25!"]
    assert re_extract(strings, r"\$\d+(?:\.\d+)?") == ["$10.50", "$3", "$7.25"]
    assert re_extract(strings, r"\$(\d+)(?:\.(\d+))?") == [
        "10", "50", "3", "", "7", "25"
    ]
    assert re_extract(strings, r"\$(?P<extract>\d+)") == ["10", "7"]
    assert re_first(strings, r"\$(\d+\.\d+)") == "10.50"
    assert re_first(strings, r"euro") is None
    assert re_first(strings, r"euro", default="-") == "-"
    # composes with the selector extractors
    from scrapy__ray.functions.cssselect import css_extract

    html = b'<ul><li>item 3 of 9</li><li>item 4 of 9</li></ul>'
    got = re_extract(css_extract(html, "li::text"), r"item (\d+)")
    assert got == ["3", "4"]


def test_re_extract_none_group_skipped():
    """Sixth review pass: a match whose optional named 'extract' group did
    not participate yields None — parsel skips it (never emits None), so
    re_first falls through to the caller's default."""
    from scrapy__ray.functions.cssselect import re_extract, re_first

    assert re_extract(["item x"], r"(?P<extract>\d+)? ?x") == []
    assert re_first(["item x"], r"(?P<extract>\d+)? ?x", default="D") == "D"
    assert re_extract(["item 7 x"], r"(?P<extract>\d+)? ?x") == ["7"]
