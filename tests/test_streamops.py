"""Stream-op gates: HLL accuracy bound (its real correctness check, since
approximate ops carry no SQL oracle) and as-of join spot semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd

from scrapy__ray.pipelines.streamops import _hll_estimate, _hll_partial

SF_DIR = "/root/testdata/sf0.01"


def test_hll_accuracy_law():
    """Pure-sketch property: estimate within 5% for 10^2..10^5 cardinalities,
    and merging split sketches equals the single-pass sketch."""
    for n in (100, 5_000, 100_000):
        vals = [f"user-{i}" for i in range(n)]
        est = _hll_estimate(_hll_partial(vals))
        assert abs(est - n) / n < 0.05, (n, est)
        # mergeability: max of halves == whole
        a = _hll_partial(vals[: n // 2])
        b = _hll_partial(vals[n // 2:])
        merged = np.maximum(a, b)
        assert _hll_estimate(merged) == est


def test_events_approx_users_close_to_exact(ray_session):
    import duckdb

    from scrapy__ray.pipelines.streamops import events_approx_users

    approx = events_approx_users(SF_DIR).to_pandas()["approx_distinct_users"][0]
    exact = duckdb.sql(
        f"SELECT COUNT(DISTINCT user_id) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchone()[0]
    assert abs(approx - exact) / exact < 0.05, (approx, exact)


def test_asof_join_matches_duckdb(ray_session):
    import duckdb

    from scrapy__ray.pipelines.streamops import EVENTS_ASOF_SQL, events_asof_orders

    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    mine = (
        events_asof_orders(SF_DIR)
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    theirs = (
        con.execute(EVENTS_ASOF_SQL)
        .fetchdf()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)
