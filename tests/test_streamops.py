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


def test_range_join_boundary_semantics():
    """Window is [view_ts, view_ts + 1h): purchase at the view instant is
    IN, at exactly +1h is OUT, other users never match, and purchase-less
    views surface with zeros (pure DuckDB — the engine-vs-oracle gate runs
    in the generic driver-mimic suite)."""
    import duckdb

    from scrapy__ray.pipelines.streamops import EVENTS_RANGE_SQL

    c = duckdb.connect()
    c.execute(
        "CREATE VIEW events AS SELECT * FROM (VALUES "
        "(1, TIMESTAMP '2024-01-01 10:00:00', 7, 'view', 0.0, ''),"
        "(2, TIMESTAMP '2024-01-01 10:00:00', 7, 'purchase', 5.0, ''),"   # t+0: in
        "(3, TIMESTAMP '2024-01-01 10:59:59', 7, 'purchase', 2.0, ''),"   # in
        "(4, TIMESTAMP '2024-01-01 11:00:00', 7, 'purchase', 9.0, ''),"   # t+1h: out
        "(5, TIMESTAMP '2024-01-01 10:30:00', 8, 'purchase', 3.0, ''),"   # other user
        "(6, TIMESTAMP '2024-01-01 09:00:00', 9, 'view', 0.0, '')"        # no purchases
        ") AS t(event_id, ts, user_id, event_type, value, props)"
    )
    rows = {r[0]: r for r in c.execute(EVENTS_RANGE_SQL).fetchall()}
    assert rows[1] == (1, 2, 7.0)   # purchases 2 and 3 only
    assert rows[6] == (6, 0, 0.0)   # zero-surfacing
    assert set(rows) == {1, 6}      # only views produce rows


def test_heavy_hitters_match_exact_topk(ray_session):
    """CMS top-20 vs the exact top-20 at sf0.001: with 2048 counters and
    ~dozens of keys the sketch should recover the exact set with zero or
    near-zero overcount (overcount is one-sided by construction)."""
    import duckdb

    from scrapy__ray.pipelines.streamops import events_heavy_hitters

    sf = "/root/testdata/sf0.001"
    got = events_heavy_hitters(sf).to_pandas()
    con = duckdb.connect()
    exact = con.execute(
        f"SELECT user_id, COUNT(*) c FROM read_parquet('{sf}/events.parquet') "
        "GROUP BY 1 ORDER BY c DESC, user_id LIMIT 20"
    ).fetchdf()
    k = min(len(got), len(exact))
    overlap = len(set(got.user_id[:k]) & set(exact.user_id[:k]))
    assert overlap >= k - 2
    # one-sided error: estimates never undercount the true frequency
    truth = dict(
        con.execute(
            f"SELECT user_id, COUNT(*) FROM read_parquet('{sf}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    for uid, est in zip(got.user_id, got.est_count):
        assert est >= truth.get(int(uid), 0)


def test_funnel_window_edge_semantics(ray_session, tmp_path):
    """Pinned funnel boundaries: a same-microsecond event does NOT advance
    the funnel (strict lower bound); an event exactly at the window edge
    DOES (inclusive upper bound); one past it does not.  Engine and SQL
    mirror agree on a corpus built to sit exactly on those edges."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.streamops import (
        _FUNNEL_WINDOW_US,
        EVENTS_FUNNEL_SQL,
        events_funnel,
    )

    t0 = 1_700_000_000_000_000  # µs epoch
    w = _FUNNEL_WINDOW_US
    rows = [
        # user 1: same-µs click must not count; edge click + edge purchase do
        (1, "view", t0),
        (1, "click", t0),           # strict >: ignored
        (1, "click", t0 + w),       # exactly at edge: qualifies
        (1, "purchase", t0 + 2 * w),  # edge from the click: qualifies
        # user 2: click one µs past the window
        (2, "view", t0),
        (2, "click", t0 + w + 1),   # past edge: does not qualify
        # user 3: purchase BEFORE the click can never convert
        (3, "view", t0),
        (3, "purchase", t0 + 1),
        (3, "click", t0 + 2),
        (3, "purchase", t0 + 2),    # same µs as click completion: ignored
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = events_funnel(str(tmp_path)).to_pandas()
    assert got["n_users"].tolist() == [3, 2, 1], got
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    want = con.execute(EVENTS_FUNNEL_SQL).df()
    assert got.values.tolist() == want.values.tolist()


def test_events_approx_users_by_type_accuracy(ray_session):
    import duckdb

    from scrapy__ray.pipelines.streamops import events_approx_users_by_type

    got = events_approx_users_by_type(SF_DIR).to_pandas()
    exact = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(DISTINCT user_id) FROM "
            f"read_parquet('{SF_DIR}/events.parquet') GROUP BY 1"
        ).fetchall()
    )
    assert set(got.event_type) == set(exact)
    for et, est in zip(got.event_type, got.approx_distinct_users):
        assert abs(est - exact[et]) / exact[et] < 0.05, (et, est, exact[et])


def test_markov_transitions_tie_and_user_boundaries(ray_session, tmp_path):
    """Pinned sequencing semantics: same-timestamp events order by
    event_id (the LAG tiebreak both sides declare), and no transition
    crosses a user boundary.  Engine and SQL mirror agree on a corpus
    built to sit exactly on those edges."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.streamops import (
        EVENTS_MARKOV_SQL,
        events_markov_transitions,
    )

    t0 = 1_700_000_000_000_000
    #           user  type       ts        event_id orders the t0 tie
    rows = [
        (10, "view", t0),
        (10, "click", t0),       # same µs: event_id decides view->click
        (10, "purchase", t0 + 5),
        (20, "click", t0),       # user boundary: no purchase->click edge
        (20, "view", t0 + 1),
    ]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
            "value": pa.array([0.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")

    got = (
        events_markov_transitions(str(tmp_path))
        .sort_values(["src_type", "dst_type"])
        .reset_index(drop=True)
    )
    want = {("view", "click"): 1, ("click", "purchase"): 1, ("click", "view"): 1}
    assert {
        (r.src_type, r.dst_type): r.n_transitions for r in got.itertuples()
    } == want
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{tmp_path}/events.parquet')"
    )
    sql = (
        con.execute(EVENTS_MARKOV_SQL)
        .df()
        .sort_values(["src_type", "dst_type"])
        .reset_index(drop=True)
    )
    assert got.values.tolist() == sql.values.tolist()


def test_hourly_anomaly_zscore_law(ray_session):
    """Population z-scores of a type's own hours must sum to ~0 and their
    squares to ~n (the defining identities), and the engine must agree with
    a from-scratch pandas recompute of counts/mean/std at full precision."""
    from scrapy__ray.pipelines.streamops import events_hourly_anomaly

    out = events_hourly_anomaly(SF_DIR).to_pandas()
    assert len(out) and (out["n_events"] > 0).all()
    for _t, g in out.groupby("event_type"):
        # rounding to 6 digits bounds each |error| by 5e-7
        assert abs(g["z"].sum()) < 5e-7 * len(g) + 1e-9
        assert abs((g["z"] ** 2).sum() - len(g)) < 1e-4 * len(g)

    ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["ts", "event_type"])
    hours = ev["ts"].values.astype("datetime64[us]").astype("int64") // 3_600_000_000
    h = (
        pd.DataFrame({"event_type": ev["event_type"], "hour": hours, "cnt": 1})
        .groupby(["event_type", "hour"], as_index=False)
        .sum()
    )
    stats = h.groupby("event_type")["cnt"].agg(["mean", "std", "count"])
    merged = out.merge(h, on=["event_type", "hour"])
    st = stats.loc[merged["event_type"]].reset_index(drop=True)
    # population std = sample std * sqrt((n-1)/n)
    psd = st["std"].values * np.sqrt((st["count"].values - 1) / st["count"].values)
    want = (merged["cnt"].values - st["mean"].values) / psd
    assert np.allclose(merged["z"].values, want, atol=2e-6)


def test_bottomk_quantile_rank_error(ray_session):
    """Bottom-k (KMV) quantile-sample accuracy law: every reported qXX must
    sit within rank distance ~5*sqrt(q(1-q)/k) of the true quantile of the
    FULL per-type value distribution (Chernoff bound on a uniform
    k-sample; k=512 -> worst-case tolerance ~0.111 at q=0.5), and the
    sample-size column must equal min(k, type count)."""
    import duckdb

    from scrapy__ray.pipelines.streamops import (
        _BOTTOMK_K,
        _BOTTOMK_QS,
        events_value_bottomk_quantiles,
    )

    got = events_value_bottomk_quantiles(SF_DIR).to_pandas()
    con = duckdb.connect()
    full = con.execute(
        f"SELECT event_type, value FROM read_parquet('{SF_DIR}/events.parquet') "
        "WHERE value IS NOT NULL"
    ).fetchdf()
    assert len(got) == full["event_type"].nunique()
    for _, row in got.iterrows():
        vals = np.sort(
            full.loc[full["event_type"] == row["event_type"], "value"].to_numpy()
        )
        n = len(vals)
        assert row["n_sample"] == min(_BOTTOMK_K, n)
        for q in _BOTTOMK_QS:
            v = row[f"q{int(q * 100)}"]
            # rank of the reported value in the FULL distribution
            rank = np.searchsorted(vals, v, side="left") / max(n - 1, 1)
            tol = 5.0 * (q * (1 - q) / _BOTTOMK_K) ** 0.5
            assert abs(rank - q) <= tol, (row["event_type"], q, rank, tol)
