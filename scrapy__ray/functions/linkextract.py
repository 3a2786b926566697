"""Link extraction (SURVEY.md §2.6 P4).

Mirrors the reference ``scrapy/linkextractors/lxmlhtml.py::LxmlLinkExtractor``
defaults: <a>/<area> href attributes, HTML5-whitespace-stripped, resolved
against the page's effective base (<base href> honored), non-http(s) schemes
dropped, the standard IGNORED_EXTENSIONS suffix list dropped, and per-page
dedup by canonical form keeping first occurrence order (unique=True).

Outputs CANONICAL absolute urls (pinned divergence, documented: the reference
keeps the safe-but-non-canonical url on the Request and canonicalizes only
inside the fingerprint; this engine's frontier stores the canonical url as
the single identity, which fingerprints identically).
"""

from __future__ import annotations

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

_ALLOWED_SCHEMES = ("http", "https")
_HTML5_WS = "\t\n\x0c\r "


def _has_ignored_extension(path: str) -> bool:
    name = path.rsplit("/", 1)[-1].lower()
    if "." not in name:
        return False
    ext = name.split(".", 1)[1]
    # match the longest suffix too ("tar.gz") and the last suffix ("gz"-style)
    return ext in IGNORED_EXTENSIONS or name.rsplit(".", 1)[-1] in IGNORED_EXTENSIONS


def links_from_hrefs(
    hrefs: list[str], page_url: str, base_href: str | None
) -> list[str]:
    """href attributes -> ordered, per-page-unique canonical absolute urls."""
    out: list[str] = []
    seen: set[str] = set()
    for href in hrefs:
        href = href.strip(_HTML5_WS)
        if not href:
            continue
        absu = urljoin_with_base(page_url, base_href, href)
        parts = urlsplit(absu)
        if parts.scheme not in _ALLOWED_SCHEMES:
            continue
        if _has_ignored_extension(parts.path):
            continue
        canon = canonicalize_url(absu)
        if canon in seen:
            continue
        seen.add(canon)
        out.append(canon)
    return out


def extract_links(
    html: bytes, page_url: str, declared_encoding: str | None = None
) -> list[str]:
    _text, hrefs, base_href = extract_page(html, declared_encoding)
    return links_from_hrefs(hrefs, page_url, base_href)
