"""sf0.1-scale oracle pass for the heaviest shuffle pipelines (round-2
verdict item 8): every oracle otherwise checks at sf0.01, where partition
counts are small — a partition-count-dependent bug (mis-keyed exchange,
block-order assumption, per-partition final that isn't associative) could
pass at sf0.01 and corrupt results at 10x the rows.  Run with
``pytest -m slow``; the standard gate deselects these via pytest.ini.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.1"

pytestmark = pytest.mark.slow


def _canon(d: pd.DataFrame) -> pd.DataFrame:
    d = d[sorted(d.columns)]
    return d.sort_values(list(d.columns)).reset_index(drop=True)


def _con():
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "documents", "embeddings",
              "customer", "nation", "part", "supplier", "region"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _run(name: str):
    import __ray_entry__ as e

    r = e.queries()[name](SF_DIR)
    return _canon(r if isinstance(r, pd.DataFrame) else r.to_pandas())


@pytest.mark.parametrize(
    "name",
    [
        # SQL-oracled heavy-shuffle pipelines
        "user_sessions",          # sessionization: hash by user + diff pass
        "events_asof_orders",     # as-of join: two-sided exchange
        "top_revenue_orders",     # partial top-k -> orderkey shuffle
        "docs_jaccard_dups",      # inverted index, 3 exchanges (capped)
        "docs_dup_clusters",      # jaccard pairs -> connected components
        "parts_small_qty_revenue",  # per-key agg + LARGE x LARGE join back
        "docs_token_spectrum",    # token exchange + count-of-count fold
        "docs_pmi_bigrams",       # bigram exchange (+ joins above threshold)
        "docs_inverted_index",    # term-keyed postings exchange
        "events_funnel",          # user-keyed step-min co-location
        "lineitem_local_supplier_volume",  # Q5 star join: fact x fact + dims
    ],
)
def test_sql_oracle_at_sf01(ray_session, name):
    import __ray_entry__ as e

    mine = _run(name)
    theirs = _canon(_con().execute(e.oracle_sql()[name]).fetchdf())
    pd.testing.assert_frame_equal(
        mine, theirs, check_dtype=False, check_exact=True
    )


@pytest.mark.parametrize(
    "name",
    [
        "docs_minhash_lsh",        # shingle -> band -> bucket chain
        "docs_dup_clusters_minhash",
        "docs_cdc_dups",           # chunk exchange + join + per-doc fold
    ],
)
def test_materialized_oracle_at_sf01(ray_session, name):
    """MinHash chain vs the independent single-process oracle computed AT
    sf0.1 (oracle_ext is scale-parameterized)."""
    from scrapy__ray import oracle_ext

    mine = _run(name)
    path = oracle_ext.materialize(SF_DIR)[name]
    theirs = _canon(duckdb.sql(f"SELECT * FROM read_parquet('{path}')").df())
    pd.testing.assert_frame_equal(
        mine, theirs, check_dtype=False, check_exact=True
    )
