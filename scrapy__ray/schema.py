"""Arrow schemas for every dataflow table (SURVEY.md §1.2 — schemas built once).

The reference is schemaless (dict-shaped Items, ``meta`` side-channels);
here every column the Scrapy ``Request.meta`` dict carried implicitly
(depth, retry count, redirect chain, priority) is an explicit typed column.
"""

from __future__ import annotations

import pyarrow as pa

#: Input corpus (authoritative shape from BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

#: Frontier candidate rows (replaces scheduler queues + Request.meta).
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("host_hash", pa.uint64()),
        ("fingerprint", pa.binary()),
        ("priority", pa.int32()),
        ("depth", pa.int32()),
        ("disc_round", pa.int32()),
        ("parent_url", pa.string()),
        ("link_idx", pa.int32()),
        ("retry_count", pa.int32()),
        ("redirect_count", pa.int32()),
        ("skip_dedup", pa.bool_()),
        # Per-request Request.meta analogues (M9 meta['cookiejar'], M10
        # meta['proxy'] — scrapy/downloadermiddlewares/{cookies,httpproxy}.py
        # meta contracts): explicit typed columns, inherited parent->child
        # (the row-model equivalent of a spider threading meta through its
        # Requests).  cookiejar 0 = the default jar; meta_proxy "" = fall
        # back to the env-convention proxy.
        ("cookiejar", pa.int32()),
        ("meta_proxy", pa.string()),
    ]
)
FRONTIER_COLS = [f.name for f in FRONTIER_SCHEMA]

#: Scheduled fetches (frontier row + politeness slot assignment).
SCHEDULED_SCHEMA = pa.schema(
    list(FRONTIER_SCHEMA)
    + [
        ("round", pa.int32()),
        ("fetch_seq_in_host", pa.int32()),
        ("fetch_vtime", pa.float64()),
        # Cookie header stamped by the owning shard's jar at schedule time
        # (M9 CookiesMiddleware analogue); "" when no cookies / disabled
        ("cookies", pa.string()),
    ]
)

#: Fetch + extract results — one row per fetch attempt (any status);
#: fetch lineage columns (url, parent_url, round, seq, host) satisfy the
#: north rule's per-partition lineage requirement.
RESULTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status", pa.int32()),
        ("round", pa.int32()),
        ("fetch_seq_in_host", pa.int32()),
        ("fetch_vtime", pa.float64()),
        ("depth", pa.int32()),
        ("priority", pa.int32()),
        ("parent_url", pa.string()),
        ("retry_count", pa.int32()),
        ("redirect_count", pa.int32()),
        ("latency_ms", pa.float32()),
        ("cookies_sent", pa.string()),
        ("extracted_text", pa.string()),
        ("n_links", pa.int32()),
        ("proxy", pa.string()),  # M10: effective proxy (meta_proxy wins)
        ("cookiejar", pa.int32()),  # M9: which jar stamped cookies_sent
    ]
)

#: Per-(round, shard) metrics (replaces the stats-collector counter dict).
METRICS_SCHEMA = pa.schema(
    [
        ("round", pa.int32()),
        ("shard_id", pa.int32()),
        ("fetched", pa.int64()),
        ("deduped", pa.int64()),
        ("deferred", pa.int64()),
        ("robots_denied", pa.int64()),
        ("errors", pa.int64()),
        ("retried", pa.int64()),
        ("redirects", pa.int64()),
        ("offsite", pa.int64()),
        ("scheduled", pa.int64()),
        ("wall_s", pa.float64()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
