"""URL scalar functions — canonicalization, joining, host extraction.

Semantics modeled on the reference's vendored ``w3lib.url::canonicalize_url``
(used by ``scrapy/utils/request.py::RequestFingerprinter.fingerprint`` and
``scrapy/linkextractors/lxmlhtml.py::LxmlLinkExtractor``) and
``scrapy/utils/url.py::url_is_from_any_domain``.  The exact behavior is pinned
by the vector table in tests/vectors/canonical.jsonl (FIXTURES.md §4); where
w3lib corner-cases are version-dependent, the vectors are the contract.

Canonicalization rules (FIXTURES.md §4):
  * scheme + host lowercased; default port stripped (http:80, https:443)
  * fragment stripped
  * query parsed with keep_blank_values=True, pairs sorted by (key, value),
    re-encoded with uppercase-hex percent escapes (space -> %20)
  * path percent-normalized per segment: escapes of unreserved chars decoded
    (%41 -> A), everything else re-encoded uppercase-hex, utf-8 for non-ASCII
  * empty path -> "/"
  * idempotent: canonicalize(canonicalize(u)) == canonicalize(u)
"""

from __future__ import annotations

from urllib.parse import (
    parse_qsl,
    quote,
    unquote_to_bytes,
    urlsplit,
    urlunsplit,
    urljoin,
)

# RFC 3986 unreserved + sub-delims + ":@" are kept verbatim in path segments.
_PATH_SEGMENT_SAFE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "-._~!$&'()*+,;=:@"
)
# Inside a decoded query key/value everything structural must be re-escaped.
_QUERY_PIECE_SAFE = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789" "-._~"
)

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21", "ws": "80", "wss": "443"}


def _requote(text: str, safe: str) -> str:
    """Fully percent-decode then re-encode with uppercase hex.

    Decoding happens on an already-delimited piece (a path segment or a query
    key/value), so decoded structural characters ('/', '&', '=') cannot change
    the URL's structure — they are re-escaped by quote().  quote() emits
    uppercase hex, which gives the pinned %XX normalization for free, and the
    decode step collapses escapes of unreserved characters (%41 -> A).
    """
    return quote(unquote_to_bytes(text), safe=safe)


def _canonical_netloc(scheme: str, netloc: str) -> str:
    userinfo, sep, hostport = netloc.rpartition("@")
    host, _, port = hostport.partition(":")
    host = host.lower().rstrip(".")
    if port and port == _DEFAULT_PORTS.get(scheme):
        port = ""
    hostport = host + (":" + port if port else "")
    return (userinfo + sep + hostport) if sep else hostport


def canonicalize_url(url: str) -> str:
    """Canonical form used for fingerprinting and frontier identity."""
    url = url.strip()
    scheme, netloc, path, query, _fragment = urlsplit(url)
    scheme = scheme.lower()
    netloc = _canonical_netloc(scheme, netloc)

    # Path: normalize escapes per segment; empty path -> "/"
    if path:
        path = "/".join(_requote(seg, _PATH_SEGMENT_SAFE) for seg in path.split("/"))
    if not path:
        path = "/"

    # Query: decode pairs, sort, re-encode.  keep_blank_values=True keeps
    # "?a=" (pinned).  A bare "?" (empty query) is dropped by urlunsplit.
    if query:
        pairs = parse_qsl(query, keep_blank_values=True)
        pairs.sort()
        query = "&".join(
            "%s=%s"
            % (_requote(k, _QUERY_PIECE_SAFE), _requote(v, _QUERY_PIECE_SAFE))
            for k, v in pairs
        )

    return urlunsplit((scheme, netloc, path, query, ""))


def host_of(url: str) -> str:
    """Downloader slot key: lowercase hostname, no port, no userinfo.

    Mirrors ``scrapy/core/downloader/__init__.py::Downloader.get_slot_key``
    (hostname-based slots, the settings-default behavior).
    """
    host = urlsplit(url).hostname
    return (host or "").rstrip(".")


def url_is_from_any_domain(url: str, domains: list[str] | tuple[str, ...]) -> bool:
    """Suffix domain match, per ``scrapy/utils/url.py::url_is_from_any_domain``."""
    host = host_of(url).lower()
    if not host:
        return False
    for d in domains:
        d = d.lower()
        if host == d or host.endswith("." + d):
            return True
    return False


def urljoin_with_base(page_url: str, base_href: str | None, href: str) -> str:
    """Resolve *href* against the page's effective base URL.

    HTML5 base handling (``scrapy/http/response/text.py::TextResponse.urljoin``
    + lxml's base_url extraction in the reference LinkExtractor): the first
    ``<base href>`` in the document, itself resolved against the page URL,
    becomes the base for every relative href.
    """
    base = urljoin(page_url, base_href.strip()) if base_href else page_url
    return urljoin(base, href.strip())


def effective_proxy(url: str, http_proxy: str, no_proxy: str) -> str:
    """The proxy a request for *url* would carry (M10,
    ``scrapy/downloadermiddlewares/httpproxy.py::HttpProxyMiddleware``):
    ``http_proxy`` unless the url's hostname is bypassed by ``no_proxy``
    (comma-separated; ``*`` bypasses everything ONLY when it is the
    entire no_proxy string — as a list entry it is a literal name that
    matches no hostname; an entry matches the exact hostname or any
    dot-suffix — the ``urllib.request.proxy_bypass_environment``
    convention, leading dots ignored; verified against CPython's
    implementation by fuzz vectors).  Returns '' for no proxy.

    The bypass-all check compares the RAW string (``no_proxy == '*'``):
    CPython's ``proxy_bypass_environment`` only special-cases the exact
    string ``'*'``, so a whitespace-padded ``' * '`` does NOT bypass —
    it becomes a literal list entry matching no hostname."""
    if not http_proxy:
        return ""
    if no_proxy == "*":
        return ""
    host = host_of(url)
    for entry in no_proxy.split(","):
        entry = entry.strip().lower().lstrip(".")
        if not entry:
            continue
        if host == entry or host.endswith("." + entry):
            return ""
    return http_proxy


def escaped_fragment_url(url: str) -> str:
    """The AJAX-crawling-scheme variant URL (M15,
    ``scrapy/downloadermiddlewares/ajaxcrawl.py::AjaxCrawlMiddleware``):
    an AJAX-crawlable page (``<meta name="fragment" content="!">``) is
    re-requested with an empty ``_escaped_fragment_`` query parameter —
    the w3lib ``add_or_replace_parameter(url, '_escaped_fragment_', '')``
    contract for a URL that does not already carry the parameter."""
    return url + ("&" if "?" in url else "?") + "_escaped_fragment_="
