"""Vector tests for the XPath-1.0-subset evaluator (SURVEY.md P3).

Expected values are hand-derived from the XPath 1.0 spec (and match
lxml/parsel behavior for every case): positional-predicate binding
(``//x[1]`` = first x CHILD of each parent, ``(//x)[1]`` = first overall),
reverse-axis numbering, node-set comparison ("some node matches"),
string(node-set) = first node, text NODES vs recursive string-value.
"""

from __future__ import annotations

import pytest

from scrapy__ray.functions.xpath import (
    XPathError,
    xpath_extract,
    xpath_select,
)

DOC = b"""<html><head><title>My Title</title></head><body>
<div id="main" class="box top">
  <h1>Head &amp; One</h1>
  <ul><li><a href="/a">A</a></li><li><a href="/b">B</a></li>
      <li class="x"><a href="/c">C</a></li></ul>
  <p>first para</p><p>second <em>emph</em> para</p>
</div>
<div class="box"><span>s1</span><span>s2</span><p>third</p></div>
</body></html>"""

VECTORS = [
    # basic paths and axes
    ("//title/text()", ["My Title"]),
    ("/html/head/title/text()", ["My Title"]),
    ("//h1/text()", ["Head & One"]),  # entities decoded by the parser
    ("//li/a/@href", ["/a", "/b", "/c"]),
    ("//ul/descendant::a/@href", ["/a", "/b", "/c"]),
    ("//div[@id='main']//a/@href", ["/a", "/b", "/c"]),
    (".//title/text()", ["My Title"]),  # relative from the document root
    # attributes
    ("//li[@class='x']/a/@href", ["/c"]),
    ("//li[@class]/a/@href", ["/c"]),
    ("//div[@class]/@class", ["box top", "box"]),
    ("//*[@id='main']/h1/text()", ["Head & One"]),
    # positional predicates: per-parent for steps, global for (...)
    ("//ul/li[1]/a/text()", ["A"]),
    ("//ul/li[last()]/a/text()", ["C"]),
    ("//p[1]/text()", ["first para", "third"]),
    ("(//p)[1]/text()", ["first para"]),
    ("(//li)[2]/a/@href", ["/b"]),
    ("//li[position()<=2]/a/@href", ["/a", "/b"]),
    ("//span[position()=2]/text()", ["s2"]),
    ("//div[2]/span[2]/text()", ["s2"]),
    ("(//a)[last()]/@href", ["/c"]),
    # text nodes vs recursive string-value
    ("//p[em]/text()", ["second ", " para"]),
    ("//p[em]", ["second emph para"]),
    # existence / boolean predicates
    ("//li[not(@class)]/a/@href", ["/a", "/b"]),
    ("//div[@class='box top' and @id='main']/h1/text()", ["Head & One"]),
    ("//li[@class='x' or position()=1]/a/@href", ["/a", "/c"]),
    ("//div[span]/p/text()", ["third"]),
    ("//div[not(span)]/h1/text()", ["Head & One"]),
    # string functions (node-set arg = string-value of FIRST node)
    ("//a[starts-with(@href, '/b')]/text()", ["B"]),
    ("//a[contains(@href, 'c')]/text()", ["C"]),
    ("//p[contains(., 'emph')]/em/text()", ["emph"]),
    ("//p[contains(text(), 'para')]/text()", ["first para"]),
    ("string(//title)", ["My Title"]),
    ("normalize-space(//p[em])", ["second emph para"]),
    ("concat(//h1/text(), '!')", ["Head & One!"]),
    # scalars at top level
    ("count(//li)", ["3"]),
    ("count(//div/span)", ["2"]),
    ("string-length(//title)", ["8"]),
    # parent and sibling axes
    ("//em/..", ["second emph para"]),
    ("//em/parent::p/text()", ["second ", " para"]),
    ("//span[1]/following-sibling::*", ["s2", "third"]),
    ("//span/following-sibling::p/text()", ["third"]),
    ("//p[. = 'third']/preceding-sibling::span[1]/text()", ["s2"]),
    ("//p[. = 'third']/preceding-sibling::span[2]/text()", ["s1"]),
    # union (doc order, deduplicated)
    ("//h1/text() | //span/text()", ["Head & One", "s1", "s2"]),
    ("//em/text() | //em/text()", ["emph"]),
    # numeric comparison against a node-set ("some node" semantics)
    ("//div[count(span) > 1]/p/text()", ["third"]),
    ("//ul[count(li) = 3]/li[1]/a/text()", ["A"]),
    # node() test
    ("//em/self::em/text()", ["emph"]),
    ("//ul/node()[1]/a/text()", ["A"]),
]


@pytest.mark.parametrize("expr,expected", VECTORS, ids=[v[0] for v in VECTORS])
def test_vector(expr, expected):
    assert xpath_extract(DOC, expr) == expected


def test_select_returns_items_in_doc_order():
    from scrapy__ray.functions.cssselect import parse_dom

    root = parse_dom(DOC)
    nodes = xpath_select(root, "//span | //h1")
    assert [n.tag for n in nodes] == ["h1", "span", "span"]


def test_scalar_select():
    from scrapy__ray.functions.cssselect import parse_dom

    root = parse_dom(DOC)
    assert xpath_select(root, "count(//li)") == 3.0
    assert xpath_select(root, "string(//title)") == "My Title"
    assert xpath_select(root, "contains(//title, 'Title')") is True


def test_attribute_wildcard():
    assert xpath_extract(DOC, "//div[1]/@*") == ["main", "box top"]


def test_reverse_axis_position_is_nearest_first():
    # preceding-sibling::*[1] must be the NEAREST preceding sibling
    assert xpath_extract(DOC, "//p[.='third']/preceding-sibling::*[1]/text()") == [
        "s2"
    ]


def test_double_slash_binding_vs_parenthesized():
    # the classic confusion pair, pinned explicitly
    doc = b"<d><x><i>1</i><i>2</i></x><x><i>3</i></x></d>"
    assert xpath_extract(doc, "//i[1]/text()") == ["1", "3"]
    assert xpath_extract(doc, "(//i)[1]/text()") == ["1"]


def test_filter_with_trailing_steps():
    assert xpath_extract(DOC, "(//ul)[1]/li[2]/a/@href") == ["/b"]


def test_equality_nodeset_any_match():
    # = against a node-set is true if ANY node matches
    doc = b"<r><a>x</a><a>y</a><b>y</b></r>"
    assert xpath_extract(doc, "//r[a = 'y']/b/text()") == ["y"]
    assert xpath_extract(doc, "//r[a = 'z']/b/text()") == []
    # != is also "some node" semantics, NOT "no node equals"
    assert xpath_extract(doc, "//r[a != 'x']/b/text()") == ["y"]


def test_gzip_fixtureless_encoding_paths():
    # latin-1 via meta charset and BOM'd utf-8, through the shared decoder
    latin = '<html><head><meta charset="iso-8859-1"></head><body><p>caf\xe9</p></body></html>'.encode(
        "latin-1"
    )
    assert xpath_extract(latin, "//p/text()") == ["caf\xe9"]
    bom = "﻿<html><body><p>中文</p></body></html>".encode("utf-8-sig")
    assert xpath_extract(bom.lstrip(b""), "//p/text()") == ["中文"]


BAD = [
    "//a[",
    "//a]",
    "namespace::x",  # unsupported axis
    "//a[@x=]",
    "//$var",
    "",
    "//",
    "//a | 3",  # union operands must be paths
    "document('x')",  # unsupported function (XSLT, not XPath 1.0 core)
]


@pytest.mark.parametrize("expr", BAD)
def test_bad_expressions_raise(expr):
    with pytest.raises(XPathError):
        xpath_select_or_raise(expr)


def xpath_select_or_raise(expr):
    from scrapy__ray.functions.cssselect import parse_dom

    return xpath_select(parse_dom(DOC), expr)


def test_nodeset_vs_boolean_uses_boolean_conversion():
    """XPath 1.0 3.4: node-set vs boolean compares boolean(node-set) —
    non-empty test — NOT per-node string truthiness.  An empty <a> element
    still makes //a = true() succeed (regression: the per-node rule
    converted the empty string-value to false)."""
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_select

    root = parse_dom(b"<html><body><a href='x'></a><p>t</p></body></html>")
    assert len(xpath_select(root, "//p[../a = true()]")) == 1
    assert len(xpath_select(root, "//p[../q = true()]")) == 0
    assert len(xpath_select(root, "//p[../q != true()]")) == 1
    assert len(xpath_select(root, "//p[../a = false()]")) == 0


def test_extract_many_matches_single():
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import (
        xpath_compile,
        xpath_extract,
        xpath_extract_many,
    )

    root = parse_dom(DOC)
    exprs = ["//title", "//h1", "//li/a/@href", "//p", "count(//a)"]
    many = xpath_extract_many(root, [xpath_compile(e) for e in exprs])
    for e, got in zip(exprs, many):
        assert got == xpath_extract(root, e)


def test_string_function_library():
    """XPath 1.0 §4.2/§4.4 function vectors, including the spec's own
    substring() edge cases (1-based, round-half-toward-+inf on start and
    length) and translate()'s first-occurrence-wins/deletion semantics."""
    import math

    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_select

    r = parse_dom(b"<html><body><ul><li>3</li><li>4.5</li></ul></body></html>")
    vectors = [
        ('substring("12345", 2, 3)', "234"),
        ('substring("12345", 1.5, 2.6)', "234"),  # spec example
        ('substring("12345", 0, 3)', "12"),       # spec example
        ('substring("12345", 2)', "2345"),
        ('substring-before("1999/04/01", "/")', "1999"),
        ('substring-after("1999/04/01", "/")', "04/01"),
        ('substring-before("abc", "x")', ""),
        ('substring-after("abc", "x")', ""),
        ('translate("bar", "abc", "ABC")', "BAr"),
        ('translate("--aaa--", "abc-", "ABC")', "AAA"),  # spec: delete '-'
        ("number(' 12.5 ')", 12.5),
        ('boolean("")', False),
        ('boolean("x")', True),
        ("floor(2.6)", 2.0),
        ("ceiling(2.1)", 3.0),
        ("round(2.5)", 3.0),  # half toward +inf
        ("sum(//li)", 7.5),
        ("local-name(//ul)", "ul"),
        ('concat(substring-before("a=b", "="), ":", substring-after("a=b", "="))', "a:b"),
    ]
    for expr, want in vectors:
        assert xpath_select(r, expr) == want, expr
    assert math.isnan(xpath_select(r, 'number("abc")'))
    assert xpath_select(r, 'substring("12345", number("nan"), 3)') == ""
    # predicate usage — the scraping idiom these exist for
    assert len(xpath_select(r, '//li[number(.) > 4]')) == 1
    assert len(xpath_select(r, '//li[substring(., 1, 1) = "3"]')) == 1


def test_number_grammar_and_inf_edges():
    """Review-pass regressions: (a) the XPath 1.0 Number grammar rejects
    Python-float leniencies ('1e5', '+5', 'inf', '5_0' are all NaN);
    (b) floor()/ceiling() pass infinities through instead of raising;
    (c) name()/local-name() of an EMPTY node-set is '' (§4.1), never the
    context node's name."""
    import math

    from scrapy__ray.functions.xpath import xpath_select
    from scrapy__ray.functions.cssselect import parse_dom

    r = parse_dom("<div><p>x</p></div>")
    for bad in ('number("1e5")', 'number("+5")', 'number("inf")',
                'number("Infinity")', 'number("5_0")', 'number("1.2.3")'):
        assert math.isnan(xpath_select(r, bad)), bad
    assert xpath_select(r, 'number("-3.5")') == -3.5
    assert xpath_select(r, 'number(".5")') == 0.5
    assert xpath_select(r, 'number("5.")') == 5.0
    # infinities are unreachable through the public grammar (arithmetic is
    # out of scope and the Number grammar rejects 'inf'), but the
    # floor/ceiling guard must still pass them through rather than raise
    # OverflowError if an extension ever produces one
    from scrapy__ray.functions import xpath as _xp

    assert _xp._xpath_round(math.inf) == math.inf
    assert xpath_select(r, "local-name(//absent)") == ""
    assert xpath_select(r, "name(//absent)") == ""
    assert len(xpath_select(r, '//p[name(//absent) = ""]')) == 1


def test_arithmetic_grammar_and_semantics():
    """XPath 1.0 §3.5 arithmetic: precedence, left-associativity, IEEE
    division, dividend-sign mod, unary minus, and the §3.7 operator-vs-
    NCName disambiguation for * / div / mod."""
    import math

    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_select

    r = parse_dom("<ul><li>1</li><li>2</li><li>3</li><li>4</li><li>5</li></ul>")
    vectors = [
        ("2 + 3 * 4", 14.0),
        ("(2 + 3) * 4", 20.0),
        ("10 div 4", 2.5),
        ("7 - 4 - 2", 1.0),          # left-assoc: (7-4)-2
        ("100 div 10 div 5", 2.0),   # left-assoc: (100/10)/5
        ("5 mod 2", 1.0),
        ("5 mod -2", 1.0),           # dividend sign
        ("-5 mod 2", -1.0),
        ("4-2", 2.0),                # '-' after a number lexes as operator
        ("- 3 + 5", 2.0),
        ("--3", 3.0),                # unary minus nests
        ("1 div 0", math.inf),
        ("-1 div 0", -math.inf),
        ("count(//li) * 2", 10.0),
        ("sum(//li) - 15", 0.0),
        ('number("2") + number("0.5")', 2.5),
    ]
    for expr, want in vectors:
        assert xpath_select(r, expr) == want, expr
    assert math.isnan(xpath_select(r, "0 div 0"))
    assert math.isnan(xpath_select(r, "5 mod 0"))
    assert math.isnan(xpath_select(r, '1 + number("abc")'))

    # the scraping idioms arithmetic unlocks
    odd = xpath_select(r, "//li[position() mod 2 = 1]")
    assert [n.content[0] for n in odd] == ["1", "3", "5"]
    penult = xpath_select(r, "//li[last() - 1]")
    assert [n.content[0] for n in penult] == ["4"]
    assert xpath_select(r, 'substring("hello", string-length("hello") - 2)') == "llo"

    # §3.7: 'div'/'mod' as ELEMENT NAMES where an operand is expected
    d = parse_dom("<div>8</div><p><mod>3</mod></p>")
    assert xpath_select(d, "number(//div) div 2") == 4.0
    assert xpath_select(d, "number(//div) mod number(//mod)") == 2.0
    assert len(xpath_select(d, "//div")) == 1
    assert len(xpath_select(d, "//mod")) == 1
    # comparison chains stay left-associative: (1 < 2) = true()
    assert xpath_select(d, "1 < 2 = true()") is True


def test_ancestor_following_preceding_axes():
    """The four late-round-3 axes, semantics pinned to the spec (and lxml):
    ancestor/ancestor-or-self are reverse axes ([1] = nearest); following
    is everything after in doc order minus own descendants; preceding is
    everything before minus ancestors (reverse numbering)."""
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_extract, xpath_select

    root = parse_dom(DOC)
    # ancestor: nearest-first numbering
    assert xpath_extract(DOC, "//em/ancestor::div[1]/@id") == ["main"]
    assert xpath_extract(DOC, "//em/ancestor::p/text()") == ["second ", " para"]
    assert xpath_select(root, "count(//em/ancestor::*)") == 4.0  # p div body html
    # ancestor-or-self: self numbers first
    assert [n.tag for n in xpath_select(root, "(//em)[1]/ancestor-or-self::*[1]")] == ["em"]
    # ancestor from an attribute node goes through the owning element
    assert [n.tag for n in xpath_select(root, "(//a)[1]/@href/ancestor::ul")] == ["ul"]
    # following: after in doc order, own descendants excluded
    assert xpath_extract(DOC, "//h1/following::p") == [
        "first para", "second emph para", "third"
    ]
    assert xpath_select(root, "count(//ul/following::a)") == 0.0  # a's are inside ul
    assert xpath_extract(DOC, "//ul/following::span/text()") == ["s1", "s2"]
    # preceding: before in doc order, ancestors excluded, [1] = nearest
    assert xpath_extract(DOC, "//p[.='third']/preceding::a/@href") == ["/a", "/b", "/c"]
    assert xpath_extract(DOC, "//p[.='third']/preceding::a[1]/@href") == ["/c"]
    assert xpath_select(root, "count(//em/preceding::div)") == 0.0  # div is an ancestor
    assert xpath_extract(DOC, "//em/preceding::h1/text()") == ["Head & One"]


def test_review_pass_regressions_inf_string_and_attr_following():
    """Fifth review pass: (a) string() of ±Infinity returns the §4.2
    spellings instead of raising OverflowError (reachable now that div
    exists); (b) following:: from an ATTRIBUTE includes the owning
    element's children — an attribute has no descendants to exclude, and
    the children follow it in document order (lxml agrees)."""
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_extract, xpath_select

    r = parse_dom("<p>x</p>")
    assert xpath_select(r, "string(1 div 0)") == "Infinity"
    assert xpath_select(r, "string(-1 div 0)") == "-Infinity"
    assert xpath_select(r, 'concat("v=", 1 div 0)') == "v=Infinity"
    assert xpath_extract(b"<p>x</p>", "1 div 0") == ["Infinity"]

    d = parse_dom('<div id="d"><span>in</span></div><p>after</p>')
    got = [n.tag for n in xpath_select(d, "//div/@id/following::*")]
    assert got == ["span", "p"], got
    # preceding from an attribute still excludes the owner's ancestors
    assert [n.tag for n in xpath_select(d, "//p/preceding::span")] == ["span"]


def test_xpath_variables_kwargs_surface():
    """parsel's variable binding: sel.xpath('//a[@href=$u]', u=url).
    Strings, numbers (coerced to XPath float), and booleans bind; an
    unbound variable fails loudly."""
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import (
        XPathError,
        xpath_extract,
        xpath_select,
    )

    assert xpath_extract(DOC, "//a[@href=$u]/text()", u="/b") == ["B"]
    assert xpath_extract(DOC, "//li[position()=$i]/a/@href", i=2) == ["/b"]
    root = parse_dom(DOC)
    assert xpath_select(root, "count(//li) = $n", n=3) is True
    assert xpath_select(root, "$greeting", greeting="hi") == "hi"
    assert xpath_select(root, "$x + 1", x=2) == 3.0
    assert xpath_select(root, "contains(//title, $t)", t="Title") is True
    with pytest.raises(XPathError):
        xpath_select(root, "//a[@href=$nope]")


def test_variables_accept_numpy_scalars():
    """Sixth review pass: numpy scalars — the natural output of this
    repo's pandas pipelines — must coerce to XPath float like Python
    numbers, keeping positional-predicate and comparison semantics."""
    import numpy as np

    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_extract, xpath_select

    assert xpath_extract(DOC, "//li[$i]/a/@href", i=np.int64(2)) == ["/b"]
    root = parse_dom(DOC)
    assert xpath_select(root, "count(//li) = $n", n=np.int64(3)) is True
    assert xpath_select(root, "$x + 1", x=np.float64(1.5)) == 2.5


def test_id_function():
    """§4.1 id(): string arg splits on whitespace; node-set arg takes each
    node's string-value; results in doc order, deduped; duplicate IDs
    resolve to the FIRST element in doc order (the pinned HTML
    convention, _Env.id_map)."""
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_select

    html = (
        '<html><body><p id="a">one</p><div id="b"><span id="c">x</span>'
        '</div><p id="a">dup</p><ul><li data-ref="b c">r</li>'
        '<li data-ref="c">s</li></ul></body></html>'
    )
    dom = parse_dom(html)
    assert [n.attrs.get("id") for n in xpath_select(dom, "id('a')")] == ["a"]
    # first-in-doc-order wins for the duplicated id
    assert xpath_select(dom, "string(id('a'))") == "one"
    assert [n.tag for n in xpath_select(dom, "id('b c')")] == ["div", "span"]
    # doc order regardless of token order; dedup across tokens
    assert [n.tag for n in xpath_select(dom, "id('c b c')")] == ["div", "span"]
    # node-set argument: string-values of BOTH li/@data-ref attrs
    assert [n.tag for n in xpath_select(dom, "id(//li/@data-ref)")] == [
        "div", "span",
    ]
    assert xpath_select(dom, "id('zzz')") == []
    assert xpath_select(dom, "count(id(//li/@data-ref))") == 2.0
    # composes with paths
    assert xpath_select(dom, "id('b')/span/text()") != []


def test_lang_function():
    """§4.3 lang(): nearest self-or-ancestor xml:lang (HTML ``lang``
    accepted as fallback — documented divergence), case-insensitive,
    '-' sublanguage suffix ignored; no attribute anywhere -> false."""
    from scrapy__ray.functions.cssselect import parse_dom

    html = (
        '<html lang="en"><body>'
        '<div xml:lang="en-US"><p id="us">a</p></div>'
        '<div lang="FR"><p id="fr">b</p><span lang="de" id="de">c</span></div>'
        "</body></html>"
    )
    dom = parse_dom(html)
    # inherited from <html lang="en">
    assert xpath_select(dom, "count(//body[lang('en')])") == 1.0
    # xml:lang="en-US" matches 'en' (sublanguage) and 'en-us' (case-fold)
    assert [n.attrs["id"] for n in xpath_select(dom, "//p[lang('en')]")] == [
        "us"
    ]
    assert xpath_select(dom, "count(//p[@id='us'][lang('en-US')])") == 1.0
    assert xpath_select(dom, "count(//p[@id='us'][lang('en-GB')])") == 0.0
    # nearest ancestor wins: the fr div overrides the html root
    assert [n.attrs["id"] for n in xpath_select(dom, "//p[lang('fr')]")] == [
        "fr"
    ]
    assert xpath_select(dom, "count(//span[lang('de')])") == 1.0
    assert xpath_select(dom, "count(//span[lang('fr')])") == 0.0
    # 'en' does NOT match a bare prefix request for 'en-US'
    assert xpath_select(dom, "count(//body[lang('en-US')])") == 0.0
    # text node context resolves through its parent element
    assert xpath_select(dom, "count(//p[@id='fr']/text()[lang('fr')])") == 1.0
    # attributeless document -> false everywhere
    dom2 = parse_dom("<html><body><p>x</p></body></html>")
    assert xpath_select(dom2, "count(//p[lang('en')])") == 0.0
