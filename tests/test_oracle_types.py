"""HUGEINT-proofing for every inline oracle SQL string.

DuckDB's SUM over any integer type (BIGINT, INTEGER, even a CASE WHEN 1
ELSE 0 END) returns HUGEINT (int128), which the driver's value-hash
comparator hashes differently from the engine's int64 even when every
value is numerically identical — exactly the round-3 failure mode of
orders_priority_rollup / late_shipment_priority (VERDICT round 3, "What's
wrong" #1).  This test DESCRIBEs all 100+ inline oracles against the
sf0.001 views and fails if ANY column types out as HUGEINT/UHUGEINT, so
queries the driver has never sampled are immunized too.

The materialized-parquet oracles (oracle_ext.py: SELECT * FROM
read_parquet(...)) are excluded: Parquet has no int128 type, so DuckDB
can never produce HUGEINT from them, and running them here would execute
every pure-Python oracle just to check types.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _inline_sqls() -> dict[str, str]:
    import __ray_entry__ as e

    return {
        name: sql
        for name, (_fn, sql) in e._all_queries().items()
        if sql is not None
    }


INLINE = sorted(_inline_sqls().items())


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


@pytest.mark.parametrize("name,sql", INLINE, ids=[n for n, _ in INLINE])
def test_oracle_types_no_hugeint(con, name, sql):
    info = con.execute(f"DESCRIBE {sql}").fetchall()
    bad = [
        (col, typ)
        for col, typ, *_ in info
        if "HUGEINT" in typ.upper()
    ]
    assert not bad, (
        f"{name}: oracle SQL produces HUGEINT column(s) {bad} — wrap the "
        f"offending SUM in CAST(... AS BIGINT) so the driver's value-hash "
        f"matches the engine's int64 output"
    )
