"""HTML encoding resolution (SURVEY.md §2.6 P2).

Mirrors the precedence of ``scrapy/http/response/text.py::TextResponse.encoding``
(backed by the reference's vendored ``w3lib.encoding``), minus the chardet
guessing step (no chardet dependency in this environment — pinned in
FIXTURES.md, which only generates cases 1-4):

  1. charset forced by the caller (e.g. a Content-Type header)
  2. BOM sniffing (utf-8-sig, utf-16/32 LE/BE)
  3. ``<meta charset=...>`` / ``<meta http-equiv=content-type ...>`` within
     the first 4096 bytes
  4. utf-8 fallback

Decoding always uses errors="replace", like TextResponse.text.
"""

from __future__ import annotations

import codecs
import re

_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_BE, "utf-32-be"),
    (codecs.BOM_UTF32_LE, "utf-32-le"),
    (codecs.BOM_UTF8, "utf-8"),
    (codecs.BOM_UTF16_BE, "utf-16-be"),
    (codecs.BOM_UTF16_LE, "utf-16-le"),
)

# <meta charset="..."> and <meta http-equiv="Content-Type" content="...charset=...">
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+?(?:
            charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)
         )""",
    re.IGNORECASE | re.VERBOSE,
)

_HEAD_BYTES = 4096


def _normalize(name: str) -> str | None:
    try:
        return codecs.lookup(name).name
    except (LookupError, TypeError):
        return None


def resolve_encoding(html: bytes, declared: str | None = None) -> tuple[str, bytes]:
    """Return (codec_name, body_without_bom) per the precedence above."""
    if declared:
        enc = _normalize(declared)
        if enc:
            return enc, html
    for bom, enc in _BOMS:
        if html.startswith(bom):
            return enc, html[len(bom):]
    m = _META_CHARSET_RE.search(html[:_HEAD_BYTES])
    if m:
        enc = _normalize(m.group(1).decode("ascii", "replace"))
        if enc:
            return enc, html
    return "utf-8", html


def decode_html(html: bytes, declared: str | None = None) -> str:
    enc, body = resolve_encoding(html, declared)
    return body.decode(enc, errors="replace")
