"""Deterministic fault + variant model for the synthetic corpus (FIXTURES.md §2).

Shared by the corpus generator (fixtures/gen.py), the simulated fetch source
(scrapy__ray/sources/corpus.py) and the oracle (scrapy__ray/oracle.py) so all
three agree byte-for-byte.  This module is the *simulated server's* behavior —
engine logic never parses url structure; only the fixture fetch model does.

Fault injection, keyed on ``b0 = sha1(url)[0] % 100`` of the canonical url:
  b0 < 3   -> 503 on first attempt, 200 on retry  (RetryMiddleware path, M3)
  b0 == 3  -> 301 redirect to page (j+7) mod n_host (RedirectMiddleware, M4)
  b0 == 4  -> 404 terminal, no extract
  else     -> 200

Encoding variants, same byte:
  90 <= b0 <= 94 -> body latin-1 with <meta charset="iso-8859-1"> + non-ASCII
  b0 == 95       -> utf-8 BOM prefix
  b0 == 96       -> gzip variant corpus only (main corpus: plain utf-8)
"""

from __future__ import annotations

import hashlib
from urllib.parse import urlsplit

STATUS_OK = 200
STATUS_RETRY = 503
STATUS_REDIRECT = 301
STATUS_NOTFOUND = 404
# body exceeded DOWNLOAD_MAXSIZE — not an HTTP status (Scrapy raises a
# download exception); negative so it can't collide with server codes
STATUS_TOOBIG = -1


def url_byte(url: str) -> int:
    return hashlib.sha1(url.encode("utf-8")).digest()[0] % 100


def page_url(host: str, j: int) -> str:
    """Canonical url of page j on host; pages with j%10==9 carry a sorted query."""
    base = f"http://{host}/p/{j}"
    return base + "?a=1&b=2" if j % 10 == 9 else base


def page_index(url: str) -> int | None:
    """Inverse of page_url: j, or None for non-page urls (robots, sitemap)."""
    path = urlsplit(url).path
    if not path.startswith("/p/"):
        return None
    try:
        return int(path[3:])
    except ValueError:
        return None


def status_of(url: str, attempt: int) -> int:
    """HTTP status for fetching *url* on the given attempt (0-based)."""
    b0 = url_byte(url)
    if b0 < 3:
        return STATUS_RETRY if attempt == 0 else STATUS_OK
    if b0 == 3:
        return STATUS_REDIRECT
    if b0 == 4:
        return STATUS_NOTFOUND
    return STATUS_OK


def redirect_target(url: str, host: str, n_pages: int) -> str:
    """Location header for a 301 page: page (j+7) mod n_host, canonical form."""
    j = page_index(url)
    if j is None or n_pages <= 0:
        return url
    return page_url(host, (j + 7) % n_pages)


def encoding_variant(url: str) -> str:
    """'latin1' | 'bom' | 'gzip' | 'utf8' for the page body encoding."""
    b0 = url_byte(url)
    if 90 <= b0 <= 94:
        return "latin1"
    if b0 == 95:
        return "bom"
    if b0 == 96:
        return "gzip"
    return "utf8"


def set_cookies(url: str, status: int) -> dict[str, str]:
    """Cookies the simulated server sets on this response (M9 model).

    Frozen semantics shared by engine and oracle: every 200 response sets a
    per-host session cookie ``sid``; responses whose fault byte is in
    [5, 8] additionally set a per-url tracking cookie ``trk``.  Values are
    deterministic sha1 prefixes, so cookie state is a pure function of the
    set of (url, 200) responses observed — order-independent under the
    max-value merge rule (scrapy__ray/config.py)."""
    if status != STATUS_OK:
        return {}
    host = urlsplit(url).hostname or ""
    out = {"sid": hashlib.sha1(f"sid:{host}".encode()).hexdigest()[:8]}
    if 5 <= url_byte(url) <= 8:
        out["trk"] = hashlib.sha1(f"trk:{url}".encode()).hexdigest()[:8]
    return out


def latency_ms(url: str) -> float:
    """Deterministic simulated latency (bench realism; no scheduling effect)."""
    return 5.0 + (hashlib.sha1(url.encode("utf-8")).digest()[1] / 255.0) * 45.0


def latency_us(url: str) -> int:
    """Integer-microsecond latency — pure int math so AutoThrottle's EWMA
    inputs are exactly associative across any accumulation order (engine
    shards sum pushes in arbitrary order; oracle sums in fetch order)."""
    return 5000 + hashlib.sha1(url.encode("utf-8")).digest()[1] * 45000 // 255
