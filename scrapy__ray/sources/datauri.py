"""data: URI download-handler analogue (SURVEY.md §2.1 S3).

Scrapy's ``DataURIDownloadHandler`` (scrapy/core/downloader/handlers/
datauri.py, backed by w3lib.url.parse_data_uri) answers a ``data:`` request
from the url itself — no network, no fault model.  The analogue decodes the
RFC 2397 payload at fetch time (stages/crawl_stages.fetch_batch routes the
scheme here before any corpus lookup): base64 when the media-type header
ends in ``;base64``, percent-decoding otherwise.  A malformed URI is a 404,
mirroring the handler's error path.  ``data:`` urls have no authority, so
they share the empty-host downloader slot and are never robots-checked
(no host to fetch robots.txt from) — both consistent with upstream.
"""

from __future__ import annotations

import base64
import binascii
from urllib.parse import unquote_to_bytes


def parse_data_uri(url: str) -> bytes | None:
    """Decoded body bytes of an RFC 2397 ``data:`` URI, or None if malformed
    (missing comma separator or undecodable base64 payload)."""
    if not url.startswith("data:"):
        return None
    header, sep, payload = url[5:].partition(",")
    if not sep:
        return None
    if header.rsplit(";", 1)[-1].lower() == "base64":
        try:
            # strict alphabet check: a corrupted payload must 404, not
            # silently decode to garbage bytes
            return base64.b64decode(payload.encode("ascii"), validate=True)
        except (binascii.Error, ValueError, UnicodeEncodeError):
            return None
    return unquote_to_bytes(payload)
