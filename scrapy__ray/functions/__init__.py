"""Byte-exact scalar functions (SURVEY.md §2.8) — the correctness core.

Everything here is pure Python / stdlib, deterministic, and pinned by
table-driven vector tests in tests/vectors/.  The Ray stages vectorize over
Arrow columns by calling these per value (url work) or with pyarrow.compute
kernels where possible.
"""

from scrapy__ray.functions.url import (
    canonicalize_url,
    host_of,
    url_is_from_any_domain,
    urljoin_with_base,
)
from scrapy__ray.functions.fingerprint import request_fingerprint
from scrapy__ray.functions.encoding import decode_html, resolve_encoding
from scrapy__ray.functions.textextract import extract_text, extract_page
from scrapy__ray.functions.linkextract import extract_links

__all__ = [
    "canonicalize_url",
    "host_of",
    "url_is_from_any_domain",
    "urljoin_with_base",
    "request_fingerprint",
    "decode_html",
    "resolve_encoding",
    "extract_text",
    "extract_page",
    "extract_links",
]
