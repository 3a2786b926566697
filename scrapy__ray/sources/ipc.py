"""Arrow IPC (Feather v2) source — the zero-parse columnar input format.

Streaming / training-data stacks exchange Arrow IPC files at least as
often as Parquet (Arrow Flight payloads, dataset snapshots, feature-store
dumps); this module gives the engine that source format with the same
mirror-cache shape as sources/jsonl.py: a deterministic IPC mirror of a
testdata table (one ``.arrow`` file per parquet row-group, so a
multi-node ``ray.data.read_arrow`` — or the per-file fallback here —
parallelizes exactly like the parquet read; never one giant file) and a
reader returning the usual Dataset.  Unlike JSONL, the IPC roundtrip is
TYPE-EXACT by construction (Arrow schema serialized verbatim, list and
timestamp columns included), which is what the docs_ipc_source gate
proves against a plain parquet SELECT.
"""

from __future__ import annotations

import hashlib
import os
import shutil

import pyarrow as pa
import pyarrow.ipc as pa_ipc
import pyarrow.parquet as pq


def ipc_mirror(sf_dir: str, table: str) -> str:
    """Materialize ``<sf_dir>/<table>.parquet`` as an Arrow-IPC directory
    (one .arrow file per parquet row-group) and return its path.  Cache
    identity + atomic-write discipline mirror sources/jsonl.py (source
    (mtime_ns, size) marker, hashed sf_dir key, pid-unique temp names,
    full clear before rebuild)."""
    src = f"{sf_dir}/{table}.parquet"
    st = os.stat(src)
    ident = f"{st.st_mtime_ns}:{st.st_size}"
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:16]
    out_dir = f"/tmp/scrapy__ray_ipc/{key}/{table}"
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
        tbl = pf.read_row_group(g)
        part = os.path.join(out_dir, f"part-{g:05d}.arrow")
        tmp = f"{part}.tmp-{os.getpid()}"
        with pa_ipc.new_file(tmp, tbl.schema) as w:
            w.write_table(tbl)
        os.replace(tmp, part)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        f.write(ident)
    os.replace(mtmp, marker)
    return out_dir


def read_ipc(sf_dir: str, table: str, columns: list[str] | None = None):
    """Dataset over the IPC mirror of a testdata table: one read task per
    shard file (``from_items`` of paths -> ``flat_map``-style map_batches
    opening each memory-mapped file), so the read parallelizes and
    column-prunes like ``read_parquet`` without materializing anything on
    the driver."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    d = ipc_mirror(sf_dir, table)
    paths = sorted(
        os.path.join(d, f) for f in os.listdir(d) if f.endswith(".arrow")
    )

    def load(batch: pa.Table) -> pa.Table:
        tbls = []
        for p in batch["path"].to_pylist():
            with pa.memory_map(p) as src:
                t = pa_ipc.open_file(src).read_all()
            tbls.append(t.select(columns) if columns else t)
        return pa.concat_tables(tbls)

    return rd.from_items([{"path": p} for p in paths]).map_batches(
        load, batch_format="pyarrow", batch_size=1
    )
