"""Property-based gates for the byte-exact scalar core (hypothesis).

These guard the invariants the crawl's correctness proofs lean on:
canonicalization idempotence, fingerprint equivalence classes, and — most
load-bearing — that the per-batch link-resolution memo NEVER changes
link_from_hrefs output (the hot-path optimization must be a pure cache).
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from scrapy__ray.functions.fingerprint import request_fingerprint
from scrapy__ray.functions.linkextract import links_from_hrefs
from scrapy__ray.functions.textextract import extract_text
from scrapy__ray.functions.url import canonicalize_url, host_of

_host = st.from_regex(r"[a-z][a-z0-9]{0,10}(\.[a-z]{2,7}){1,2}", fullmatch=True)
_path_seg = st.from_regex(r"[A-Za-z0-9._~%-]{0,12}", fullmatch=True)
_query_key = st.from_regex(r"[a-z]{1,5}", fullmatch=True)


@st.composite
def urls(draw):
    host = draw(_host)
    segs = draw(st.lists(_path_seg, max_size=4))
    q = draw(st.dictionaries(_query_key, _path_seg, max_size=3))
    frag = draw(st.sampled_from(["", "#x", "#frag"]))
    path = "/" + "/".join(segs) if segs else ""
    query = "&".join(f"{k}={v}" for k, v in q.items())
    return f"http://{host}{path}" + (f"?{query}" if query else "") + frag


@settings(max_examples=200, deadline=None)
@given(urls())
def test_canonicalize_idempotent(u):
    c = canonicalize_url(u)
    assert canonicalize_url(c) == c


@settings(max_examples=200, deadline=None)
@given(urls())
def test_fingerprint_ignores_fragment(u):
    base = u.split("#", 1)[0]
    assert request_fingerprint(u) == request_fingerprint(base + "#other")


@settings(max_examples=100, deadline=None)
@given(
    st.dictionaries(_query_key, _path_seg, min_size=2, max_size=4),
    _host,
)
def test_fingerprint_query_order_invariant(q, host):
    items = list(q.items())
    u1 = f"http://{host}/p?" + "&".join(f"{k}={v}" for k, v in items)
    u2 = f"http://{host}/p?" + "&".join(f"{k}={v}" for k, v in reversed(items))
    assert request_fingerprint(u1) == request_fingerprint(u2)


_href = st.one_of(
    st.from_regex(r"(/|\.\./|)[A-Za-z0-9._/-]{0,15}", fullmatch=True),
    st.from_regex(r"https?://[a-z]{1,8}\.example/[A-Za-z0-9/-]{0,10}", fullmatch=True),
    st.sampled_from(
        ["", "  ", "mailto:x@y.z", "javascript:void(0)", "/img/a.jpg",
         "?b=2&a=1", "#frag", "p/3?b=2&a=1#z"]
    ),
)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(_href, max_size=10),
    urls(),
    st.one_of(st.none(), st.sampled_from(["/", "/base/", "http://cdn.example/"])),
)
def test_link_memo_is_pure_cache(hrefs, page_url, base):
    page_url = page_url.split("#", 1)[0] or "http://h.example/p/0"
    plain = links_from_hrefs(hrefs, page_url, base)
    memo: dict = {}
    memoized = links_from_hrefs(hrefs, page_url, base, _memo=memo)
    again = links_from_hrefs(hrefs, page_url, base, _memo=memo)  # warm hits
    assert plain == memoized == again


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=300))
def test_extract_text_total(function_input):
    """extract_text never raises on arbitrary (possibly broken) html and
    never emits blank lines or trailing newlines."""
    out = extract_text(function_input.encode("utf-8", "replace"))
    assert not out.endswith("\n")
    assert all(line.strip() == line and line for line in out.split("\n")) or out == ""


@settings(max_examples=100, deadline=None)
@given(urls())
def test_host_of_is_lowercase_no_port(u):
    h = host_of(u)
    assert h == h.lower()
    assert ":" not in h


# ------------------------------------------------------- BPE merge helpers
_sym = st.text(alphabet=st.characters(blacklist_categories=("Cs", "Zs"), blacklist_characters="\n\t\r "), min_size=1, max_size=4)


@settings(max_examples=150, deadline=None)
@given(st.lists(_sym, min_size=1, max_size=12), _sym, _sym)
def test_bpe_apply_preserves_concatenation(syms, left, right):
    """Merging never changes the underlying word: the concatenation of the
    symbol sequence is invariant under any _bpe_apply."""
    from scrapy__ray.pipelines.qualityops import _bpe_apply

    merged = _bpe_apply(tuple(syms), left, right)
    assert "".join(merged) == "".join(syms)
    # a merged sequence never contains the adjacent pair again UNLESS the
    # pair overlaps its own merge output (left==right-style run effects);
    if left != right and left + right != left:
        for a, b in zip(merged, merged[1:]):
            assert not (a == left and b == right)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.lists(_sym, min_size=1, max_size=8), st.integers(min_value=1, max_value=50)), min_size=0, max_size=8))
def test_bpe_pair_counts_total(words):
    """Sum of all pair counts == sum over words of (len-1)*count — every
    adjacency counted exactly once, weighted by word frequency."""
    from scrapy__ray.pipelines.qualityops import _bpe_pair_counts

    pc = _bpe_pair_counts([tuple(w) for w, _ in words], [c for _, c in words])
    assert sum(pc.values()) == sum((len(w) - 1) * c for w, c in words)


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=200))
def test_norm_ws_idempotent(s):
    from scrapy__ray.pipelines.crawlq import _norm_ws

    once = _norm_ws(s)
    assert _norm_ws(once) == once
    assert "  " not in once and once == once.strip()


# ------------------------------------------------- link fastpath soundness
def _links_reference(hrefs, page_url, base_href):
    """The pre-fastpath resolution pipeline, verbatim: urljoin_with_base ->
    scheme/extension filters -> canonicalize_url, per-page dedup keeping
    first occurrence.  The fastpath in links_from_hrefs must be
    output-identical to this on EVERY input."""
    from urllib.parse import urlsplit

    from scrapy__ray.functions.linkextract import (
        _ALLOWED_SCHEMES,
        _HTML5_WS,
        _has_ignored_extension,
    )
    from scrapy__ray.functions.url import urljoin_with_base

    out, seen = [], set()
    for href in hrefs:
        href = href.strip(_HTML5_WS)
        if not href:
            continue
        absu = urljoin_with_base(page_url, base_href, href)
        parts = urlsplit(absu)
        if parts.scheme not in _ALLOWED_SCHEMES or _has_ignored_extension(
            parts.path
        ):
            continue
        canon = canonicalize_url(absu)
        if canon in seen:
            continue
        seen.add(canon)
        out.append(canon)
    return out


_HREF_CHARS = st.sampled_from(list("abcXYZ09_-./%?#: \tqz"))
_HREFS = st.lists(
    st.one_of(
        st.text(_HREF_CHARS, min_size=0, max_size=14).map(lambda s: "/" + s),
        st.text(_HREF_CHARS, min_size=0, max_size=14),
        st.sampled_from(
            ["/p/1", "/p/2/", "/", "/a_b-c/x", "/p/1?q=2", "/p/1#f",
             "/img/x.jpg", "p/3", "../up", "./here", "//other.example/p",
             "http://h9.example/p/0", "mailto:x@y", "/p//double",
             "/P/Upper", "/p/%41", ""],
        ),
    ),
    min_size=0,
    max_size=12,
)
_PAGES_ST = st.sampled_from(
    [
        "http://h0.example/p/0",
        "https://sub.h1.example/a/b/c",
        "http://h2.example/",
        "http://h3.example",  # no path — prefix fastpath must decline
        "http://H4.Example/p/0",  # uppercase host — decline
        "http://h5.example:8080/p/0",  # port — decline
        "http://h6.example/p/0?x=1",  # query page — decline
        # trailing root dot: canonicalize_url strips it, so the fastpath
        # MUST decline (the review-caught divergence)
        "http://h7.example./p/0",
        "http://.h8.example/p/0",  # leading dot — decline
        "http://h9..example/p/0",  # empty label — decline
    ]
)
_BASES_ST = st.sampled_from([None, "/base/", "http://h7.example/b/"])


@settings(max_examples=400, deadline=None)
@given(hrefs=_HREFS, page=_PAGES_ST, base=_BASES_ST)
def test_link_fastpath_equals_slowpath(hrefs, page, base):
    """links_from_hrefs (with its memo and fastpath) is output-identical
    to the verbatim slow pipeline on arbitrary href soup — the soundness
    gate for the dot-free absolute-path shortcut."""
    assert links_from_hrefs(hrefs, page, base, _memo={}) == _links_reference(
        hrefs, page, base
    )
    # memo reuse across repeated calls must not change results either
    memo: dict = {}
    for _ in range(2):
        assert links_from_hrefs(hrefs, page, base, _memo=memo) == \
            _links_reference(hrefs, page, base)
