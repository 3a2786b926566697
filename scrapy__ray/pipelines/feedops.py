"""Feed-spider pipelines (P7): XML / CSV node streams as Ray Data stages.

Each query serializes its batch of ``documents`` rows into a feed payload
(an RSS-ish XML document / a CSV file) and then drives the generic node
iterators from functions/feedparse.py over it — the XMLFeedSpider /
CSVFeedSpider shape (feed in, one parsed record per node out) with a strict
roundtrip oracle: the parsed stream must equal a plain SELECT of the same
columns, proving parse(serialize(x)) == x through real stdlib parsers.
"""

from __future__ import annotations

from xml.sax.saxutils import escape

import pyarrow as pa

from scrapy__ray.functions.feedparse import iter_csv_rows, iter_xml_nodes
from scrapy__ray.pipelines.util import read_parquet

_COLS = ["doc_id", "lang", "source", "n_chars"]


def _batch_rows(t: pa.Table) -> list[dict]:
    # one to_pylist per column, not O(rows x cols) ChunkedArray scalar gets
    cols = {c: t[c].to_pylist() for c in _COLS}
    return [dict(zip(_COLS, vals)) for vals in zip(*(cols[c] for c in _COLS))]


def _emit(parsed: list[dict[str, str]]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([int(r["doc_id"]) for r in parsed], pa.int64()),
            "lang": pa.array([r["lang"] for r in parsed], pa.string()),
            "source": pa.array([r["source"] for r in parsed], pa.string()),
            "n_chars": pa.array([int(r["n_chars"]) for r in parsed], pa.int64()),
        }
    )


def docs_xmlfeed(sf_dir: str):
    """XMLFeedSpider analogue: batch -> RSS-ish <channel><item>...</item>
    payload -> iter_xml_nodes(itertag="item") -> one row per node."""
    ds = read_parquet(sf_dir, "documents", columns=_COLS)

    def roundtrip(t: pa.Table) -> pa.Table:
        items = "".join(
            "<item>"
            + "".join(f"<{c}>{escape(str(r[c]))}</{c}>" for c in _COLS)
            + "</item>"
            for r in _batch_rows(t)
        )
        xml = f'<?xml version="1.0"?><rss><channel>{items}</channel></rss>'
        return _emit(iter_xml_nodes(xml, "item"))

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def docs_csvfeed(sf_dir: str):
    """CSVFeedSpider analogue: batch -> CSV payload (header line + quoted
    fields) -> iter_csv_rows -> one row per line."""
    import csv
    import io

    ds = read_parquet(sf_dir, "documents", columns=_COLS)

    def roundtrip(t: pa.Table) -> pa.Table:
        buf = io.StringIO()
        w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL)
        w.writerow(_COLS)
        for r in _batch_rows(t):
            w.writerow([r[c] for c in _COLS])
        return _emit(iter_csv_rows(buf.getvalue()))

    return ds.map_batches(roundtrip, batch_format="pyarrow")


def docs_jsonl_source(sf_dir: str):
    """JSONL as a SOURCE format (sources/jsonl.py): the documents table is
    mirrored once to a sharded .jsonl directory (one file per parquet
    row-group — multi-node reads parallelize like the parquet read), read
    back with ``ray.data.read_json``, and every downstream row must equal
    a plain SELECT of the parquet original — proving the JSON write→read
    roundtrip (types, unicode text, field order) is lossless, so any
    pipeline in this repo runs unchanged over JSONL input by swapping only
    the leading read node."""
    from scrapy__ray.sources.jsonl import read_jsonl

    ds = read_jsonl(sf_dir, "documents")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "lang": t["lang"].cast(pa.string()),
                "source": t["source"].cast(pa.string()),
                "n_chars": t["n_chars"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def docs_ipc_source(sf_dir: str):
    """Arrow IPC (Feather v2) as a SOURCE format (sources/ipc.py): the
    documents table is mirrored once to a sharded .arrow directory (one
    file per parquet row-group — multi-node reads parallelize like the
    parquet read), read back as memory-mapped IPC with column pruning in
    the read task, and every row must equal a plain SELECT of the parquet
    original.  Unlike the JSONL gate this roundtrip is type-exact by
    construction; the gate proves the shard/mirror/zero-copy plumbing."""
    from scrapy__ray.sources.ipc import read_ipc

    ds = read_ipc(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "lang": t["lang"].cast(pa.string()),
                "source": t["source"].cast(pa.string()),
                "n_chars": t["n_chars"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_FEED_SQL = "SELECT doc_id, lang, source, n_chars FROM documents"

QUERIES = {
    "docs_xmlfeed": (docs_xmlfeed, _FEED_SQL),
    "docs_csvfeed": (docs_csvfeed, _FEED_SQL),
    "docs_jsonl_source": (docs_jsonl_source, _FEED_SQL),
    "docs_ipc_source": (docs_ipc_source, _FEED_SQL),
}
