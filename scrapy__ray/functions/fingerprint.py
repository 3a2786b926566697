"""Request fingerprinting — the exact-dedup identity (SURVEY.md §2.2 D1).

Mirrors ``scrapy/utils/request.py::RequestFingerprinter.fingerprint``:
a 20-byte SHA1 over (method, canonical_url, body), headers excluded.  The
2.6 vs 2.7 serialization difference is irrelevant for GET + empty body —
same inputs always map to the same digest — so this pins a single stable
serialization: ``sha1(method \\n canonical_url \\n body)``.
"""

from __future__ import annotations

import hashlib

from scrapy__ray.functions.url import canonicalize_url


def request_fingerprint(url: str, method: str = "GET", body: bytes = b"") -> bytes:
    """20-byte SHA1 fingerprint of a request; url is canonicalized first."""
    h = hashlib.sha1()
    h.update(method.encode("ascii"))
    h.update(b"\n")
    h.update(canonicalize_url(url).encode("utf-8"))
    h.update(b"\n")
    h.update(body)
    return h.digest()


def fingerprint_canonical(canonical_url: str) -> bytes:
    """Fingerprint for an ALREADY-canonical GET url (hot-path variant).

    The frontier stores canonical urls, so the per-batch vectorized stage
    skips re-canonicalization.
    """
    h = hashlib.sha1()
    h.update(b"GET\n")
    h.update(canonical_url.encode("utf-8"))
    h.update(b"\n")
    return h.digest()
