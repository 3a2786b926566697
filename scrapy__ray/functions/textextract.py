"""HTML -> text extraction — THE byte-identity contract (FIXTURES.md §3, frozen).

Plays the role of the reference spider's parse output
(``scrapy/core/scraper.py::Scraper.call_spider`` -> spider ``parse`` callback,
SURVEY.md §2.6 P1/P3).  General XPath/CSS selection is an explicit non-goal;
the contract is this deterministic DOM-text serialization, implemented with
only stdlib ``html.parser`` (no lxml/bs4 in the environment):

  1. decode bytes per the encoding precedence (encoding.py)
  2. drop content inside <script> <style> <template> <noscript> and comments
  3. block elements emit "\\n" boundaries; inline elements emit nothing
  4. character data concatenated with entities decoded (convert_charrefs)
  5. split on "\\n", strip each line, drop empties, join with "\\n";
     no trailing newline

A single parse pass (PageParser) also collects <a>/<area> hrefs and the first
<base href> so the hot extract stage walks each document exactly once.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from scrapy__ray.functions.encoding import decode_html

# <meta http-equiv=refresh content="N[; url=TARGET]"> — the w3lib
# get_meta_refresh grammar subset Scrapy's MetaRefreshMiddleware consumes
# (scrapy/downloadermiddlewares/redirect.py::MetaRefreshMiddleware).
_META_REFRESH_RE = re.compile(
    r"^\s*([\d.]+)\s*(?:[;,]\s*url\s*=\s*['\"]?\s*([^'\"]*?)\s*['\"]?)?\s*$",
    re.IGNORECASE,
)

BLOCK_TAGS = frozenset(
    "html body div p h1 h2 h3 h4 h5 h6 ul ol li table tr td th br title head".split()
)
INLINE_TAGS = frozenset("a b i em strong span code".split())
SKIP_TAGS = frozenset("script style template noscript".split())
LINK_TAGS = frozenset(("a", "area"))


class PageParser(HTMLParser):
    """One-pass text + link + base collector."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._chunks: list[str] = []
        self.hrefs: list[str] = []
        self.base_href: str | None = None
        self.meta_refresh: tuple[float, str] | None = None  # (delay s, raw url)

    # -- tag handling -------------------------------------------------------
    def _on_tag(self, tag: str) -> None:
        if tag in BLOCK_TAGS:
            self._chunks.append("\n")

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in SKIP_TAGS:
            self._skip += 1
            return
        self._on_tag(tag)
        if tag in LINK_TAGS:
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.hrefs.append(v)
                    break
        elif tag == "base" and self.base_href is None:
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.base_href = v
                    break
        elif tag == "meta" and self.meta_refresh is None:
            ad = {k: v for k, v in attrs if v is not None}
            if (ad.get("http-equiv") or "").strip().lower() == "refresh":
                m = _META_REFRESH_RE.match(ad.get("content") or "")
                if m and m.group(2):
                    self.meta_refresh = (float(m.group(1)), m.group(2))

    def handle_endtag(self, tag: str) -> None:
        if tag in SKIP_TAGS:
            if self._skip:
                self._skip -= 1
            return
        self._on_tag(tag)

    def handle_startendtag(self, tag: str, attrs) -> None:
        # <br/> etc. — treat like a start tag (void elements).
        self.handle_starttag(tag, attrs)

    # -- character data -----------------------------------------------------
    def handle_data(self, data: str) -> None:
        if not self._skip and data:
            self._chunks.append(data)

    # comments, PIs, declarations: dropped (default no-op handlers)

    # -- result -------------------------------------------------------------
    def text(self) -> str:
        lines = "".join(self._chunks).split("\n")
        return "\n".join(s for s in (ln.strip() for ln in lines) if s)


# ---------------------------------------------------------------------------
# fast scanner — byte-identical to PageParser on the "easy HTML" subset
# ---------------------------------------------------------------------------
# PageParser (stdlib HTMLParser) costs ~1 ms per 3 KB page — 75% of the whole
# extract stage (profiled).  The scanner below tokenizes with one compiled
# regex and replicates parse_starttag's exact attribute algorithm (same
# tagfind_tolerant / attrfind_tolerant regexes, same quote-strip + unescape),
# returning None — "use the reference parser" — whenever the document
# contains any construct whose HTMLParser semantics it does not model
# (declarations, comments, PIs, CDATA elements, stray '<', end-tag attrs,
# ambiguous trailing charrefs).  parse_page() falls back transparently, so
# PageParser stays THE contract; tests/test_textextract fuzz both paths
# against each other.

from html import unescape as _unescape
from html.parser import attrfind_tolerant, tagfind_tolerant

_FAST_TAG_RE = re.compile(
    r"""<(/?)([a-zA-Z][^\t\n\r\f />\x00]*)((?:"[^"]*"|'[^']*'|[^"'>])*)>"""
)
# end-tag names HTMLParser's endtagfind accepts (narrower than start tags)
_END_NAME_RE = re.compile(r"[a-zA-Z][-.a-zA-Z0-9:_]*\Z")
# the overwhelmingly common link shape: one double-quoted href, no charrefs
_HREF_ONLY_RE = re.compile(r"\s+href=\"([^\"&]*)\"\s*\Z")
_WS_OR_SEMI = re.compile(r"[\s;]")


class FastPage:
    """Result of the fast scan, same read surface as PageParser."""

    __slots__ = ("_chunks", "hrefs", "base_href", "meta_refresh")

    def __init__(self, chunks, hrefs, base_href, meta_refresh):
        self._chunks = chunks
        self.hrefs = hrefs
        self.base_href = base_href
        self.meta_refresh = meta_refresh

    def text(self) -> str:
        lines = "".join(self._chunks).split("\n")
        return "\n".join(s for s in (ln.strip() for ln in lines) if s)


# tag-classification codes for the scan loop's per-document memo
_T_NONE, _T_BLOCK, _T_LINK, _T_BASE, _T_META, _T_BAD = 0, 1, 2, 3, 4, 5
_MISS = object()


def _classify(closing: str, name: str) -> int:
    if closing:
        # HTMLParser endtagfind: '</ name \s* >' only; odd name chars take
        # bogus-comment paths the scanner does not model
        if not _END_NAME_RE.match(name):
            return _T_BAD
        return _T_BLOCK if name.lower() in BLOCK_TAGS else _T_NONE
    tag = name.lower()
    if tag == "a" or tag == "area":
        return _T_LINK
    if tag == "base":
        return _T_BASE
    if tag == "meta":
        return _T_META
    return _T_BLOCK if tag in BLOCK_TAGS else _T_NONE


def _fast_scan(s: str) -> FastPage | None:
    """Scan *s*; None when PageParser semantics are required."""
    if "<!" in s or "<?" in s or "\x00" in s:
        return None
    low = s.lower()
    if "<script" in low or "<style" in low or "<template" in low or "<noscript" in low:
        return None
    # one C pass: [text, closing, name, attrtext, text, ...]; every '<'
    # must have been consumed by a tag token, else semantics are unknown
    parts = _FAST_TAG_RE.split(s)
    n = len(parts)
    if s.count("<") != n // 4:
        return None
    chunks: list[str] = []
    hrefs: list[str] = []
    base_href: str | None = None
    meta_refresh: tuple[float, str] | None = None
    app = chunks.append
    kind_memo: dict = {}
    href_memo: dict = {}
    for j in range(1, n, 4):
        seg = parts[j - 1]
        if seg:
            app(_unescape(seg))
        closing = parts[j]
        name = parts[j + 1]
        attrtext = parts[j + 2]
        key = name if not closing else "/" + name
        kind = kind_memo.get(key, -1)
        if kind < 0:
            kind = _classify(closing, name)
            kind_memo[key] = kind
        if kind == _T_NONE:
            if closing and attrtext and attrtext.strip():
                return None
            continue
        if kind == _T_BLOCK:
            if closing and attrtext and attrtext.strip():
                return None
            app("\n")
            continue
        if kind == _T_BAD:
            return None
        if kind == _T_LINK:
            if attrtext in href_memo:
                href = href_memo[attrtext]
            else:
                hm = _HREF_ONLY_RE.match(attrtext)
                if hm is not None:
                    href = hm.group(1)
                else:
                    attrs = _parse_attrs("<" + name + attrtext + ">")
                    if attrs is None:
                        return None
                    href = None
                    for k, v in attrs:
                        if k == "href" and v is not None:
                            href = v
                            break
                href_memo[attrtext] = href
            if href is not None:
                hrefs.append(href)
            continue
        # base / meta (rare): full attribute parse
        attrs = _parse_attrs("<" + name + attrtext + ">")
        if attrs is None:
            return None
        if kind == _T_BASE:
            if base_href is None:
                for k, v in attrs:
                    if k == "href" and v is not None:
                        base_href = v
                        break
        elif meta_refresh is None:
            ad = {k: v for k, v in attrs if v is not None}
            if (ad.get("http-equiv") or "").strip().lower() == "refresh":
                mm = _META_REFRESH_RE.match(ad.get("content") or "")
                if mm and mm.group(2):
                    meta_refresh = (float(mm.group(1)), mm.group(2))
    tail = parts[n - 1]
    if tail:
        amppos = tail.rfind("&", max(0, len(tail) - 34))
        if amppos >= 0 and not _WS_OR_SEMI.search(tail, amppos):
            # HTMLParser defers (and at close drops) a trailing ambiguous
            # charref — rare; let the reference parser decide
            return None
        app(_unescape(tail))
    return FastPage(chunks, hrefs, base_href, meta_refresh)


def _parse_attrs(token: str):
    """parse_starttag's exact attribute loop over one '<...>' token;
    None when the token isn't fully consumed the way HTMLParser would."""
    tm = tagfind_tolerant.match(token, 1)
    if tm is None:
        return None
    k = tm.end()
    endpos = len(token)
    attrs: list[tuple[str, str | None]] = []
    while k < endpos:
        am = attrfind_tolerant.match(token, k)
        if not am:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif (
            attrvalue[:1] == "'" == attrvalue[-1:]
            or attrvalue[:1] == '"' == attrvalue[-1:]
        ):
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = _unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = am.end()
    if token[k:endpos].strip() not in (">", "/>"):
        return None
    return attrs


def parse_page(html: bytes, declared_encoding: str | None = None) -> PageParser:
    s = decode_html(html, declared_encoding)
    fast = _fast_scan(s)
    if fast is not None:
        return fast
    p = PageParser()
    p.feed(s)
    p.close()
    return p


def extract_text(html: bytes, declared_encoding: str | None = None) -> str:
    """The frozen extraction function: html bytes -> text, byte-exact."""
    return parse_page(html, declared_encoding).text()


def extract_page(
    html: bytes, declared_encoding: str | None = None
) -> tuple[str, list[str], str | None]:
    """One-pass hot-path variant: (text, raw_hrefs_in_order, base_href)."""
    p = parse_page(html, declared_encoding)
    return p.text(), p.hrefs, p.base_href


def extract_page_full(
    html: bytes, declared_encoding: str | None = None
) -> tuple[str, list[str], str | None, tuple[float, str] | None]:
    """(text, hrefs, base_href, meta_refresh) in one parse pass."""
    p = parse_page(html, declared_encoding)
    return p.text(), p.hrefs, p.base_href, p.meta_refresh
