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
    (one .jsonl file per parquet row-group) and return its path; cached —
    subsequent calls reuse the files if complete."""
    key = sf_dir.strip("/").replace("/", "_")
    out_dir = f"/tmp/scrapy__ray_jsonl/{key}/{table}"
    marker = os.path.join(out_dir, "_COMPLETE")
    if os.path.exists(marker):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    pf = pq.ParquetFile(f"{sf_dir}/{table}.parquet")
    for g in range(pf.num_row_groups):
        rows = pf.read_row_group(g).to_pylist()
        part = os.path.join(out_dir, f"part-{g:05d}.jsonl")
        tmp = part + ".tmp"
        with open(tmp, "w", encoding="utf-8") as f:
            for r in rows:
                f.write(json.dumps(r, sort_keys=True, ensure_ascii=False, default=str))
                f.write("\n")
        os.replace(tmp, part)  # atomic per file, like the checkpoint writes
    with open(marker, "w") as f:
        f.write("ok")
    return out_dir


def read_jsonl(sf_dir: str, table: str):
    """`ray.data.read_json` over the JSONL mirror of a testdata table."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_json(jsonl_mirror(sf_dir, table))
