"""Link extraction (SURVEY.md §2.6 P4).

Mirrors the reference ``scrapy/linkextractors/lxmlhtml.py::LxmlLinkExtractor``
defaults: <a>/<area> href attributes, HTML5-whitespace-stripped, resolved
against the page's effective base (<base href> honored), schemes outside the
upstream valid set (http/https/file/ftp, ``LxmlLinkExtractor._is_valid_url``)
dropped, the standard IGNORED_EXTENSIONS suffix list dropped, and per-page
dedup by canonical form keeping first occurrence order (unique=True).

Outputs CANONICAL absolute urls (pinned divergence, documented: the reference
keeps the safe-but-non-canonical url on the Request and canonicalizes only
inside the fingerprint; this engine's frontier stores the canonical url as
the single identity, which fingerprints identically).
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import urlsplit

from scrapy__ray.functions.url import canonicalize_url, urljoin_with_base
from scrapy__ray.functions.textextract import extract_page

# Public Scrapy default: scrapy/linkextractors/__init__.py::IGNORED_EXTENSIONS
IGNORED_EXTENSIONS = frozenset(
    # archives
    "7z 7zip bz2 rar tar tar.gz xz zip "
    # images
    "mng pct bmp gif jpg jpeg png pst psp tif tiff ai drw dxf eps ps svg cdr ico webp "
    # audio
    "mp3 wma ogg wav ra aac mid au aiff "
    # video
    "3gp asf asx avi mov mp4 mpg qt rm swf wmv m4a m4v flv webm "
    # office suites
    "xls xlsx ppt pptx pps doc docx odt ods odg odp "
    # other
    "css pdf exe bin rss dmg iso apk".split()
)

# upstream LxmlLinkExtractor._is_valid_url set — file/ftp links are followed
# when a matching handler exists (sources/fsdir.py serves file://)
_ALLOWED_SCHEMES = ("http", "https", "file", "ftp")
_HTML5_WS = "\t\n\x0c\r "

# Fast resolve+canonicalize path for the dominant real-web href shape:
# an absolute-path reference of plain unreserved characters (no dots, so
# no ".."/"." segments and no extension; no "%?#:@" so no quoting, query
# sorting or authority semantics; nonempty segments so no "//").  For a
# page url of the matching plain form (lowercase http(s) host of
# dot-separated label segments — no leading/trailing/double dot, since
# canonicalize_url strips a trailing root dot; no port / userinfo /
# query), RFC 3986 resolution is literally scheme://host + href and
# canonicalize_url() is the identity — verified exhaustively by
# tests/test_scalar_properties.py::test_link_fastpath_equals_slowpath.
_FAST_HREF_RE = re.compile(r"^/(?:[A-Za-z0-9_\-]+/)*[A-Za-z0-9_\-]*$")
_FAST_PREFIX_RE = re.compile(
    r"^(https?://[a-z0-9\-]+(?:\.[a-z0-9\-]+)*)/[^?#]*$"
)


def _has_ignored_extension(path: str) -> bool:
    name = path.rsplit("/", 1)[-1].lower()
    if "." not in name:
        return False
    ext = name.split(".", 1)[1]
    # match the longest suffix too ("tar.gz") and the last suffix ("gz"-style)
    return ext in IGNORED_EXTENSIONS or name.rsplit(".", 1)[-1] in IGNORED_EXTENSIONS


def links_from_hrefs(
    hrefs: list[str],
    page_url: str,
    base_href: str | None,
    _memo: dict | None = None,
) -> list[str]:
    """href attributes -> ordered, per-page-unique canonical absolute urls.

    ``_memo`` (optional, per-batch) caches href resolution across pages:
    relative-reference resolution depends only on the base's directory, so
    the cache key is (page_dir, base_href, href) — exact because query-only
    / fragment-only / empty hrefs (whose resolution involves more of the
    base url) fall back to a full-page-url key.  Inside one crawl batch the
    same relative hrefs repeat across a host's pages (real link graphs are
    window-local), making this a large constant-factor win in the expand
    stage.
    """
    out: list[str] = []
    seen: set[str] = set()
    if _memo is None:
        _memo = {}
    page_dir = page_url.rsplit("/", 1)[0] if "?" not in page_url else page_url
    for href in hrefs:
        href = href.strip(_HTML5_WS)
        if not href:
            continue
        if href[0] in "?#":
            key = (page_url, base_href, href)
        else:
            key = (page_dir, base_href, href)
        canon = _memo.get(key, _MISS)
        if canon is _MISS:
            if base_href is None and _FAST_HREF_RE.match(href):
                prefix = _memo.get(("#prefix", page_url), _MISS)
                if prefix is _MISS:
                    m = _FAST_PREFIX_RE.match(page_url)
                    prefix = m.group(1) if m else None
                    _memo[("#prefix", page_url)] = prefix
                if prefix is not None:
                    # dot-free safe path on a plain http(s) page: resolved
                    # url = prefix + href, already canonical, never an
                    # ignored extension — skip urllib entirely
                    canon = prefix + href
            if canon is _MISS:
                absu = urljoin_with_base(page_url, base_href, href)
                parts = urlsplit(absu)
                if parts.scheme not in _ALLOWED_SCHEMES or _has_ignored_extension(
                    parts.path
                ):
                    canon = None
                else:
                    canon = canonicalize_url(absu)
            _memo[key] = canon
        if canon is None or canon in seen:
            continue
        seen.add(canon)
        out.append(canon)
    return out


_MISS = object()


# --------------------------------------------- CrawlSpider Rule predicates
# SURVEY.md P5: scrapy/spiders/crawl.py::Rule + LinkExtractor allow/deny.
# Applied to canonical links before the offsite filter (Scrapy drops these
# at extraction time, silently).
@lru_cache(maxsize=8)
def compiled_link_rules(allow: tuple, deny: tuple):
    """allow/deny url regex tuples -> compiled (allow_re, deny_re);
    empty allow means allow-everything (LinkExtractor default)."""
    return (
        re.compile("|".join(allow)) if allow else None,
        re.compile("|".join(deny)) if deny else None,
    )


def link_passes_rules(link: str, allow_re, deny_re) -> bool:
    if allow_re is not None and not allow_re.search(link):
        return False
    if deny_re is not None and deny_re.search(link):
        return False
    return True


# SitemapSpider analogue (SURVEY.md P6, scrapy/utils/sitemap.py): pull the
# <loc> entries out of a urlset/sitemapindex document.  Regex, not an XML
# parser, mirroring the reference's tolerance of loosely-valid sitemaps.
_SITEMAP_LOC_RE = re.compile(r"<loc>\s*(.*?)\s*</loc>", re.S | re.I)


def parse_sitemap_urls(xml: str) -> list[str]:
    """sitemap.xml text -> ordered canonical urls."""
    return [canonicalize_url(u) for u in _SITEMAP_LOC_RE.findall(xml)]


def robots_sitemap_urls(robots_txt: str) -> list[str]:
    """``Sitemap:`` directive urls from a robots.txt, in file order
    (``scrapy/utils/sitemap.py::sitemap_urls_from_robots``: the key is
    case-insensitive, the value runs to end of line)."""
    out = []
    for line in robots_txt.splitlines():
        k, _, v = line.partition(":")
        if k.strip().lower() == "sitemap" and v.strip():
            out.append(v.strip())
    return out


def sitemap_entries(body: bytes) -> tuple[bool, list[str]]:
    """One sitemap document -> (is_index, ordered canonical locs).

    Gzip bodies (``.xml.gz``, the standard large-sitemap transport) are
    inflated first by magic-byte check (``scrapy/utils/gz.py::gunzip``);
    ``<sitemapindex>`` documents return their CHILD SITEMAP urls (the
    caller recurses, ``SitemapSpider._parse_sitemap``), ``<urlset>``
    documents return page urls."""
    import gzip as _gzip

    if body[:2] == b"\x1f\x8b":
        body = _gzip.decompress(body)
    text = body.decode("utf-8", "replace")
    is_index = "<sitemapindex" in text
    return is_index, [canonicalize_url(u) for u in _SITEMAP_LOC_RE.findall(text)]


def walk_sitemaps(
    robots_txt_by_host: dict[str, str], docs: dict[str, bytes]
) -> list[tuple[str, str]]:
    """Full SitemapSpider traversal: for each host (dict order), start from
    its robots.txt ``Sitemap:`` directives and depth-first recurse through
    sitemap-index documents (cycle-guarded, unknown docs skipped), yielding
    ordered (host, page_url) pairs.  ``docs`` maps canonical sitemap url ->
    raw body bytes (plain XML or gzip)."""
    out: list[tuple[str, str]] = []
    for host, txt in robots_txt_by_host.items():
        seen_sm: set[str] = set()
        stack = [canonicalize_url(u) for u in robots_sitemap_urls(txt)][::-1]
        while stack:
            sm = stack.pop()
            if sm in seen_sm or sm not in docs:
                continue
            seen_sm.add(sm)
            is_index, locs = sitemap_entries(docs[sm])
            if is_index:
                stack.extend(locs[::-1])  # DFS, preserving document order
            else:
                out.extend((host, u) for u in locs)
    return out


def resolve_redirect(page_url: str, location: str) -> str:
    """Location header / meta-refresh target -> canonical absolute url.
    Plain urljoin against the page url (Scrapy's Redirect/MetaRefresh
    middlewares ignore <base> here)."""
    from urllib.parse import urljoin

    return canonicalize_url(urljoin(page_url, location))


def extract_links(
    html: bytes, page_url: str, declared_encoding: str | None = None
) -> list[str]:
    _text, hrefs, base_href = extract_page(html, declared_encoding)
    return links_from_hrefs(hrefs, page_url, base_href)
