"""file:// download-handler analogue (SURVEY.md §2.1 S3): crawl a wget-style
on-disk mirror — one first-level directory per host, HTML files below it —
through the SAME engine, frontier, politeness and extract stages as the
parquet corpus.

Scrapy's ``FileDownloadHandler`` (scrapy/core/downloader/handlers/file.py)
turns a ``file://`` request into a local read with no fault model; the
analogue keeps the engine machinery (the host directory is the
downloader-slot key, so per-host fairness and dedup behave identically) but
pins fault injection OFF for the ``file`` scheme: a read either succeeds
(200) or misses (404) — 503/301 injection is a property of the simulated
NETWORK corpus, not of disk (see stages/crawl_stages.fetch_batch).

Layout contract (a wget/httrack mirror): ``<root>/<host>/<path>``, url =
``file://<host>/<path>``.  ``build_fsdir_corpus`` writes ONLY metadata next
to the engine's other inputs — hosts.parquet, seeds.parquet, allow-all
robots.parquet, and ``meta.json {"type": "fsdir", "root": ...}`` — bodies
are read from the mirror at fetch time, exactly like the real handler, so
the corpus dir stays O(hosts) however large the mirror is.  At cluster
scale the mirror lives on a shared filesystem; the per-partition fetch
tasks read only the files their frontier slice names.
"""

from __future__ import annotations

import json
import os
import posixpath
from urllib.parse import unquote, urlsplit

import pyarrow as pa
import pyarrow.parquet as pq

import fixtures.gen as fxgen

_HTML_EXTS = (".html", ".htm")


def mirror_url(host: str, relpath: str) -> str:
    """``file://<host>/<relpath>`` for a file at ``<root>/<host>/<relpath>``."""
    return f"file://{host}/{relpath}"


def body_path(root: str, url: str) -> str | None:
    """Filesystem path for a ``file://`` url under the mirror root, or None
    for a url that escapes the mirror (dot-segments, absolute tricks) — the
    handler's directory-traversal guard."""
    parts = urlsplit(url)
    if parts.scheme != "file" or not parts.netloc:
        return None
    rel = unquote(parts.path).lstrip("/")
    norm = posixpath.normpath(rel)
    if norm.startswith("..") or posixpath.isabs(norm):
        return None
    host = parts.netloc.lower().rstrip(".")
    if "/" in host or host in (".", ".."):
        return None
    return os.path.join(root, host, norm)


def read_body(root: str, url: str) -> bytes | None:
    """The fetch: one local read; None = 404."""
    path = body_path(root, url)
    if path is None or not os.path.isfile(path):
        return None
    with open(path, "rb") as f:
        return f.read()


def build_fsdir_corpus(html_root: str, out_dir: str) -> str:
    """Scan a mirror tree and write the metadata corpus the engine consumes.

    Hosts are the first-level directories that contain at least one
    ``.html``/``.htm`` file (recursively).  Seed per host: ``index.html`` at
    the host root when present, else the lexicographically first HTML file —
    deterministic, like the parquet fixture's page-0 seeds.  Robots is
    allow-all (the file handler never consults robots).
    """
    html_root = os.path.abspath(html_root)
    hosts: list[str] = []
    files_by_host: dict[str, list[str]] = {}
    for entry in sorted(os.listdir(html_root)):
        hdir = os.path.join(html_root, entry)
        if not os.path.isdir(hdir):
            continue
        if entry != entry.lower():
            # canonicalization lowercases the url netloc, so a
            # mixed-case host directory could never round-trip url->path
            # on a case-sensitive filesystem; wget mirrors lowercase
            # hostnames (DNS is case-insensitive), so require the same
            raise ValueError(
                f"mirror host directory must be lowercase: {entry!r}"
            )
        rels: list[str] = []
        for dirpath, _dirnames, filenames in os.walk(hdir):
            for fn in filenames:
                if fn.lower().endswith(_HTML_EXTS):
                    rels.append(
                        os.path.relpath(os.path.join(dirpath, fn), hdir).replace(
                            os.sep, "/"
                        )
                    )
        if rels:
            host = entry.lower()
            hosts.append(host)
            files_by_host[host] = sorted(rels)

    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "host_index": pa.array(range(len(hosts)), pa.int32()),
                "n_pages": pa.array(
                    [len(files_by_host[h]) for h in hosts], pa.int32()
                ),
                "host_hash": pa.array(
                    [fxgen.host_hash(h) for h in hosts], pa.uint64()
                ),
            }
        ),
        os.path.join(out_dir, "hosts.parquet"),
        compression="zstd",
    )
    seed_urls = []
    for h in hosts:
        rels = files_by_host[h]
        seed = "index.html" if "index.html" in rels else rels[0]
        seed_urls.append(mirror_url(h, seed))
    pq.write_table(
        pa.table(
            {
                "url": pa.array(seed_urls, pa.string()),
                "seed_order": pa.array(range(len(seed_urls)), pa.int32()),
            }
        ),
        os.path.join(out_dir, "seeds.parquet"),
        compression="zstd",
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "robots_txt": pa.array([""] * len(hosts), pa.string()),
            }
        ),
        os.path.join(out_dir, "robots.parquet"),
        compression="zstd",
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"type": "fsdir", "root": html_root, "version": 1}, f)
    return out_dir
