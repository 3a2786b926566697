"""Fast HTML scanner vs PageParser — the fast path must be byte-identical
on every document it accepts (returning None = defer to the reference is
always safe).  Fuzzes both a generic text alphabet and an adversarial
markup-fragment composer biased toward the constructs where stdlib
HTMLParser semantics are subtle (quotes, slashes, charrefs, bad end tags)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from scrapy__ray.functions.textextract import PageParser, _fast_scan


def _reference(s: str):
    p = PageParser()
    p.feed(s)
    p.close()
    return p.text(), p.hrefs, p.base_href, p.meta_refresh


def _check(s: str):
    fast = _fast_scan(s)
    if fast is None:
        return  # fallback: reference semantics apply by construction
    assert fast.text() == _reference(s)[0], repr(s)
    ref = _reference(s)
    assert (fast.hrefs, fast.base_href, fast.meta_refresh) == ref[1:], repr(s)


@given(st.text(alphabet="<>/&;=\"' abh1pXl\n\t.#%-!?", max_size=120))
@settings(max_examples=400, deadline=None)
def test_fastscan_fuzz_markup_chars(s):
    _check(s)


_FRAGMENTS = st.sampled_from(
    [
        "<p>", "</p>", "<P >", "</p >", "<br/>", "<br />",
        "<a href=\"/x/1\">", "<a href='/y'>", "<a href=/bare>",
        "<a href=\"a&amp;b\">", "<a title=\"t\" href=\"/z\">",
        "<a href>", "<a>", "</a>", "<area href=\"/m\"/>",
        "<base href=\"http://b.example/\">", "<base href=\"/second\">",
        "<meta http-equiv=\"refresh\" content=\"5; url=/next\">",
        "<meta http-equiv=refresh content=\"0;url='/q'\">",
        "<ul><li>", "</li></ul>", "<h1>", "</h1>", "<div >", "</div>",
        "text", "a &amp; b", "x &lt; y", "&#65;", "mid&novalid;dle",
        "&", "& ", "trail&am", "<weird-tag>", "</weird-tag>",
        "<a href=\"x\"y=\"z\">", "<a href=\"a b\">", "<em>", "</em>",
        "<span a=1 b=2>", "<p a='1'b=\"2\">", "<a HREF=\"/caps\">",
        "<A href=\"/CAPS\">", "</p junk>", "<p/>", "<a/>", "< p>",
        "<a href=\"\">", "<a href=\" /ws \">",
    ]
)


@given(st.lists(_FRAGMENTS, max_size=25))
@settings(max_examples=400, deadline=None)
def test_fastscan_fuzz_fragments(frags):
    _check("".join(frags))


def test_fastscan_accepts_corpus_shape():
    html = (
        "<html><head><title>h1.example page 0</title></head>\n"
        "<body><h1>h1.example page 0</h1>\n"
        "<p>lorem ipsum</p>\n"
        '<ul><li><a href="/p/1">anchor 0</a></li>'
        '<li><a href="../p/2?a=1&amp;b=2">anchor 1</a></li></ul>\n'
        "</body></html>"
    )
    fast = _fast_scan(html)
    assert fast is not None
    assert (fast.text(), fast.hrefs, fast.base_href, fast.meta_refresh) == _reference(
        html
    )


def test_fastscan_defers_hard_constructs():
    for s in (
        "<!DOCTYPE html><p>x</p>",
        "<!-- c --><p>x</p>",
        "<?pi?><p>x</p>",
        "<script>var a=1;</script>",
        "<style>.x{}</style>",
        "<noscript>n</noscript>",
        "<template>t</template>",
        "<p>a\x00b</p>",
        "<p>x</p>trail&am",
    ):
        assert _fast_scan(s) is None, s
