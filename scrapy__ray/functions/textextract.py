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


def parse_page(html: bytes, declared_encoding: str | None = None) -> PageParser:
    p = PageParser()
    p.feed(decode_html(html, declared_encoding))
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
