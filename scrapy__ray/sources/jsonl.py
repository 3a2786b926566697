"""JSONL source (S4's inverse: feed-export format as INPUT).

Real corpora arrive as JSON-lines dumps at least as often as Parquet
(Common Crawl derivative sets, API exports, feed snapshots).  This module
gives the engine that source format: a deterministic JSONL mirror of a
testdata table (materialized once per (sf_dir, table), keyed like the
fixture-corpus cache) and a `ray.data.read_json` reader over it, so a
pipeline over JSONL input is the SAME Dataset pipeline — only the leading
read node changes.

Scale notes: `read_json` shards by file; the materializer writes one file
per parquet row-group so a multi-node read parallelizes the same way the
parquet read does (never one giant file — the resumable-output rule applied
to a source mirror).  Field order inside each JSON object is pinned
(sorted keys) so the mirror is byte-deterministic.
"""

from __future__ import annotations

import json
import os

import pyarrow.parquet as pq


def jsonl_mirror(sf_dir: str, table: str) -> str:
    """Materialize ``<sf_dir>/<table>.parquet`` as a JSONL directory
    (one .jsonl file per parquet row-group) and return its path.  Cached
    by SOURCE IDENTITY: the completion marker records the parquet's
    (mtime_ns, size), so a regenerated source invalidates the mirror
    instead of silently serving stale rows; the cache key hashes the full
    sf_dir (a path-flattening key collides: '/a/b_c' vs '/a/b/c').  A
    rebuild clears old part files first so a shrunken source can't leave
    stale trailing shards behind."""
    import hashlib
    import shutil

    src = f"{sf_dir}/{table}.parquet"
    st = os.stat(src)
    ident = f"{st.st_mtime_ns}:{st.st_size}"
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:16]
    out_dir = f"/tmp/scrapy__ray_jsonl/{key}/{table}"
    marker = os.path.join(out_dir, "_COMPLETE")
    try:
        with open(marker) as f:
            if f.read() == ident:
                return out_dir
    except OSError:
        pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    pf = pq.ParquetFile(src)
    for g in range(pf.num_row_groups):
        rows = pf.read_row_group(g).to_pylist()
        part = os.path.join(out_dir, f"part-{g:05d}.jsonl")
        # pid-unique temp name: two concurrent mirror writers must not
        # interleave into the same file (the crawl checkpoint convention)
        tmp = f"{part}.tmp-{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r, sort_keys=True, ensure_ascii=False, default=str))
                f.write("\n")
        os.replace(tmp, part)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        f.write(ident)
    os.replace(mtmp, marker)
    return out_dir


def read_jsonl(sf_dir: str, table: str):
    """`ray.data.read_json` over the JSONL mirror of a testdata table."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_json(jsonl_mirror(sf_dir, table))
