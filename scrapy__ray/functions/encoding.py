"""HTML encoding resolution (SURVEY.md §2.6 P2).

Mirrors the precedence of ``scrapy/http/response/text.py::TextResponse.encoding``
(backed by the reference's vendored ``w3lib.encoding``):

  1. charset forced by the caller (e.g. a Content-Type header)
  2. BOM sniffing (utf-8-sig, utf-16/32 LE/BE)
  3. ``<meta charset=...>`` / ``<meta http-equiv=content-type ...>`` within
     the first 4096 bytes
  4. strict-UTF-8 validation: a body that decodes strictly is UTF-8
  5. byte-distribution guess for undeclared legacy pages — the chardet
     slot of ``w3lib.encoding::html_to_unicode``, filled with a stdlib
     heuristic instead of the (absent) chardet dependency: among bytes
     >= 0x80, the MEAN RUN LENGTH discriminates whole-script text
     (Cyrillic cp1251 words are unbroken high-byte runs) from
     accent-sparse Western text (isolated high bytes inside ASCII
     words) — the same language-density prior statistical detectors
     lean on, reduced to its decisive feature
  6. utf-8 fallback (pure-ASCII and pathological bodies)

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


#: precedence-5 sample bound: guessing reads at most this many body bytes
_GUESS_BYTES = 16384

#: mean high-byte run length at/above which the body reads as whole-script
#: (every letter non-ASCII -> cp1251 Cyrillic); below, accent-sparse
#: Western (cp1252 — the HTML5 latin-1 superset, w3lib's Western default)
_RUN_LEN_CUTOFF = 2.5


def _run_length_guess(body: bytes) -> str:
    """The precedence-5 legacy discriminator alone (body is known NOT to
    be valid UTF-8): one pass of high-byte run-length statistics over the
    first _GUESS_BYTES bytes."""
    sample = body[:_GUESS_BYTES]
    runs: list[int] = []
    cur = 0
    for b in sample:
        if b >= 0x80:
            cur += 1
        elif cur:
            runs.append(cur)
            cur = 0
    if cur:
        runs.append(cur)
    if not runs:
        return "utf-8"  # invalid UTF-8 only past the sample: keep fallback
    mean_run = sum(runs) / len(runs)
    return "cp1251" if mean_run >= _RUN_LEN_CUTOFF else "cp1252"


def guess_charset(body: bytes) -> str:
    """Precedence-5 heuristic (see module docstring).  Deterministic and
    cheap: strict-UTF-8 first, then the run-length discriminator."""
    try:
        body.decode("utf-8", "strict")
        return "utf-8"
    except UnicodeDecodeError:
        return _run_length_guess(body)


def _declared_or_sniffed(
    html: bytes, declared: str | None
) -> tuple[str | None, bytes]:
    """Precedence 1-3: (codec | None, body_without_bom)."""
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
    return None, html


def resolve_encoding(html: bytes, declared: str | None = None) -> tuple[str, bytes]:
    """Return (codec_name, body_without_bom) per the precedence above."""
    enc, body = _declared_or_sniffed(html, declared)
    return (enc or guess_charset(body)), body


def decode_html(html: bytes, declared: str | None = None) -> str:
    """Decode per the precedence chain WITHOUT double work on the common
    undeclared-UTF-8 page: the strict validation decode IS the result
    when it succeeds (resolve_encoding + a second decode would scan the
    body twice — this is the extract hot path)."""
    enc, body = _declared_or_sniffed(html, declared)
    if enc:
        return body.decode(enc, errors="replace")
    try:
        return body.decode("utf-8", "strict")
    except UnicodeDecodeError:
        return body.decode(_run_length_guess(body), errors="replace")
