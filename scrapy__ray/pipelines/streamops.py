"""Stream-shaped custom operators Ray Data lacks natively: as-of join and
an approximate-distinct (HyperLogLog) sketch.

Both follow the repo's exchange rules (scrapy__ray/pipelines/util.py):
hash-partition by key then vectorized per-partition work for the as-of
join; mergeable per-block sketches + driver merge for HLL (a sketch IS a
combiner, so no shuffle at all).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy__ray.pipelines.util import (
    collect_arrow,
    driver_agg,
    ensure_ctx,
    hash_partition_map,
    read_parquet,
    round_col,
    shuffle_agg,
)


# ------------------------------------------------------------- as-of join
def events_asof_orders(sf_dir: str):
    """As-of join: each event matched to the user's most recent order at or
    before the event time (events.user_id = orders.o_custkey), then rolled
    up per event_type.  Ray Data has no as-of join; this composes one from
    a tagged union -> hash-partition by key -> per-partition pd.merge_asof
    (each partition holds every row of its keys, so backward matching is
    exact).  Lags accumulate exactly via vectorized (whole-days,
    remainder-µs) int64 partials — a raw µs sum overflows int64 at ~10^5
    decade-scale lags (caught by the sf0.1 slow leg as negative averages)
    — merged at the driver with Python arbitrary-precision ints, matching
    DuckDB's HUGEINT SUM."""
    ensure_ctx()
    ev = read_parquet(sf_dir, "events", columns=["user_id", "ts", "event_type"])
    od = read_parquet(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def tag_ev(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].values,
                "ts": df["ts"].values,
                "event_type": df["event_type"].values,
                "__side": 0,
            }
        )

    def tag_od(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["o_custkey"].values,
                "ts": df["o_orderdate"].values,
                "event_type": "",
                "__side": 1,
            }
        )

    both = ev.map_batches(tag_ev, batch_format="pandas", batch_size=None).union(
        od.map_batches(tag_od, batch_format="pandas", batch_size=None)
    )

    def asof_partial(df: pd.DataFrame) -> pd.DataFrame:
        e = df[df["__side"] == 0].sort_values("ts", kind="mergesort")
        o = (
            df[df["__side"] == 1][["user_id", "ts"]]
            .rename(columns={"ts": "order_ts"})
            .sort_values("order_ts", kind="mergesort")
        )
        if not len(e):
            return pd.DataFrame(
                {"event_type": [], "n_events": [], "n_matched": [], "lag_us": []}
            )
        m = pd.merge_asof(
            e, o, left_on="ts", right_on="order_ts", by="user_id",
            direction="backward",
        )
        matched = m["order_ts"].notna()
        lag = np.zeros(len(m), dtype=np.int64)
        lag[matched.values] = (
            m.loc[matched, "ts"].values.astype("datetime64[us]").astype("int64")
            - m.loc[matched, "order_ts"].values.astype("datetime64[us]").astype("int64")
        )
        # overflow-safe exact accumulation: split each lag into whole days
        # and a <1-day µs remainder; both per-type sums stay orders of
        # magnitude below 2^63 for any realistic partition (days sum is
        # rows x ~10^4, remainder sum rows x 8.64e10)
        _DAY_US = 86_400_000_000
        g = pd.DataFrame(
            {
                "event_type": m["event_type"].values,
                "n_events": 1,
                "n_matched": matched.astype("int64").values,
                "lag_days_i": lag // _DAY_US,
                "lag_rem_us": lag % _DAY_US,
            }
        )
        return g.groupby("event_type", as_index=False).sum()

    part = hash_partition_map(both, ["user_id"], asof_partial)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        # few rows (partitions x event types): exact Python-int merge —
        # int64 would overflow the total µs sum at 10^5+ decade-scale lags
        df = df.copy()
        for c in ("n_events", "n_matched", "lag_days_i", "lag_rem_us"):
            df[c] = df[c].astype(object)
        return df.groupby("event_type", as_index=False).sum()

    out = driver_agg(part, lambda d: d, final)
    _DAY_US = 86_400_000_000
    lag_us_total = [
        int(d) * _DAY_US + int(r)
        for d, r in zip(out["lag_days_i"], out["lag_rem_us"])
    ]
    avg_days = np.array(
        [
            float(t) / float(n) / 86_400_000_000.0 if n > 0 else np.nan
            for t, n in zip(lag_us_total, out["n_matched"])
        ],
        dtype=np.float64,
    )
    return pa.table(
        {
            "event_type": out["event_type"],
            "n_events": pa.array(out["n_events"].astype("int64"), pa.int64()),
            "n_matched": pa.array(out["n_matched"].astype("int64"), pa.int64()),
            "avg_lag_days": pa.array(round_col(avg_days, 2), pa.float64()),
        }
    )


EVENTS_ASOF_SQL = """
SELECT event_type, COUNT(*) AS n_events, COUNT(o_orderdate) AS n_matched,
       ROUND(SUM(CASE WHEN o_orderdate IS NOT NULL
                 THEN epoch_us(ts) - epoch_us(o_orderdate) ELSE 0 END)
             / NULLIF(COUNT(o_orderdate), 0) / 86400000000.0, 2) AS avg_lag_days
FROM events ASOF LEFT JOIN orders
  ON user_id = o_custkey AND ts >= o_orderdate
GROUP BY event_type
"""


# ----------------------------------------------------- HyperLogLog sketch
_HLL_P = 12  # 4096 registers, ~1.6% standard error


def _hll_partial(values) -> np.ndarray:
    regs = np.zeros(1 << _HLL_P, dtype=np.uint8)
    for v in values:
        h = int.from_bytes(
            hashlib.blake2b(str(v).encode(), digest_size=8).digest(), "big"
        )
        idx = h >> (64 - _HLL_P)
        w = h << _HLL_P & ((1 << 64) - 1)  # remaining bits at the top
        rho = 64 - w.bit_length() + 1 if w else (64 - _HLL_P) + 1
        if rho > regs[idx]:
            regs[idx] = rho
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(2.0 ** -regs.astype(np.float64))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return est


def events_approx_users(sf_dir: str):
    """Approximate distinct user count via HyperLogLog(p=12): each block
    produces a 4 KB register vector (a mergeable sketch — the ultimate
    pre-aggregation), merged on the driver by element-wise max.  At 10^10
    rows the shuffle for an exact distinct moves every key once; the sketch
    moves 4 KB per block.  Approximate -> rows-only check; the pytest gate
    asserts <5% relative error vs the exact count."""
    ds = read_parquet(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        regs = _hll_partial(df["user_id"].values)
        return pd.DataFrame({"regs": [regs.tobytes()]})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        merged = np.zeros(1 << _HLL_P, dtype=np.uint8)
        for b in df["regs"]:
            merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
        return pd.DataFrame({"approx_distinct_users": [int(round(_hll_estimate(merged)))]})

    out = driver_agg(ds, partial, final)
    return pa.table(
        {"approx_distinct_users": pa.array(out["approx_distinct_users"], pa.int64())}
    )


def events_approx_users_by_type(sf_dir: str):
    """GROUPED approximate distinct: one HyperLogLog sketch PER event_type,
    merged by (group, register-max) on the driver — the sketch-per-key
    combiner pattern for low-cardinality groups (each block ships
    #groups × 4 KB regardless of row count; a billion-key group costs the
    same 4 KB as a thousand-key one).  High-cardinality grouping would
    instead hash-partition the keys and sketch per partition — documented,
    not needed for an event-type rollup.  Approximate -> rows-only check;
    the pytest gate asserts <5% relative error per group vs the exact
    count."""
    ds = read_parquet(sf_dir, "events", columns=["event_type", "user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for et, g in df.groupby("event_type"):
            rows.append((et, _hll_partial(g["user_id"].values).tobytes()))
        return pd.DataFrame(rows, columns=["event_type", "regs"])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = []
        for et, g in df.groupby("event_type"):
            merged = np.zeros(1 << _HLL_P, dtype=np.uint8)
            for b in g["regs"]:
                merged = np.maximum(merged, np.frombuffer(b, dtype=np.uint8))
            out.append((et, int(round(_hll_estimate(merged)))))
        return pd.DataFrame(out, columns=["event_type", "approx_distinct_users"])

    out = driver_agg(ds, partial, final).sort_values("event_type")
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "approx_distinct_users": pa.array(
                out["approx_distinct_users"], pa.int64()
            ),
        }
    )


# -------------------------------------------- histogram-sketch quantiles
_QBIN_WIDTH = 100.0
_QUANTILES = (0.5, 0.9, 0.99)


def lineitem_price_quantiles(sf_dir: str):
    """Approximate quantiles of l_extendedprice from a fixed-width histogram
    sketch: each block reduces to (bin -> count) with bin = floor(price /
    100) — a mergeable sketch like the HLL above, so the whole corpus
    aggregates with NO shuffle, only O(#bins x #blocks) tiny partials to
    the driver.  The p-quantile is the lower edge of the first bin whose
    cumulative count reaches ceil(p x N): deterministic (unlike sampled or
    t-digest quantiles), error bounded by the bin width, and therefore
    exactly mirrorable in SQL for a hash-checked oracle."""
    import math

    ds = read_parquet(sf_dir, "lineitem", columns=["l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(
            df["l_extendedprice"].to_numpy(np.float64) / _QBIN_WIDTH
        ).astype(np.int64)
        g = pd.DataFrame({"bin": bins}).groupby("bin", as_index=False).size()
        return g.rename(columns={"size": "c"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bin", as_index=False)["c"].sum().sort_values("bin")
        cum = g["c"].cumsum().to_numpy()
        n = int(cum[-1])
        bins = g["bin"].to_numpy()
        qs, vals = [], []
        for q in _QUANTILES:
            rank = math.ceil(q * n)
            idx = int(np.searchsorted(cum, rank))
            qs.append(q)
            vals.append(bins[idx] * _QBIN_WIDTH)
        return pd.DataFrame({"quantile": qs, "approx_price": vals})

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "quantile": pa.array(out["quantile"], pa.float64()),
            "approx_price": pa.array(out["approx_price"], pa.float64()),
        }
    )


LINEITEM_QUANTILES_SQL = f"""
WITH b AS (
  SELECT floor(l_extendedprice / {_QBIN_WIDTH})::BIGINT AS bin, COUNT(*) AS c
  FROM lineitem GROUP BY 1
),
n AS (SELECT SUM(c) AS n FROM b),
cum AS (SELECT bin, SUM(c) OVER (ORDER BY bin) AS cc FROM b),
qs AS (SELECT unnest([{", ".join(str(q) for q in _QUANTILES)}]) AS quantile)
SELECT qs.quantile, MIN(cum.bin) * {_QBIN_WIDTH} AS approx_price
FROM qs CROSS JOIN n
JOIN cum ON cum.cc >= ceiling(qs.quantile * n.n)
GROUP BY qs.quantile
"""


# ------------------------------------------------ count-min heavy hitters
_CMS_W = 2048  # counters per row
_CMS_D = 4  # hash rows
_CMS_TOPK = 20


def _cms_add(cms: np.ndarray, keys, counts) -> None:
    """Add ``counts`` occurrences of each key into the d x w sketch."""
    for key, c in zip(keys, counts):
        kb = str(key).encode()
        for d in range(_CMS_D):
            h = int.from_bytes(
                hashlib.blake2b(kb, digest_size=8, salt=bytes([d] * 8)).digest(),
                "big",
            )
            cms[d, h % _CMS_W] += int(c)


def _cms_query(cms: np.ndarray, key) -> int:
    kb = str(key).encode()
    est = None
    for d in range(_CMS_D):
        h = int.from_bytes(
            hashlib.blake2b(kb, digest_size=8, salt=bytes([d] * 8)).digest(), "big"
        )
        v = int(cms[d, h % _CMS_W])
        est = v if est is None else min(est, v)
    return est


def events_heavy_hitters(sf_dir: str):
    """Heavy hitters over user_id via a count-min sketch (Cormode &
    Muthukrishnan 2005): each block folds its rows into a d=4 x w=2048
    int64 sketch PLUS its local top candidates; sketches merge by
    element-wise ADD (a linear sketch — partition-order-independent, so
    the result is deterministic), and the candidate set is the DENSE key
    range [min_uid, max_uid] carried as two scalars — NOT per-block local
    tops, whose membership would depend on block boundaries and make the
    result nondeterministic vs the single-process oracle.  The driver
    ranks every candidate by its CMS estimate (ties to the smaller
    user_id) and returns the top 20 with estimated counts.
    Mergeable-sketch pattern: 64 KB + two scalars per block move, never
    the keys themselves — the exact-counting alternative is a full
    shuffle of every row at 10^10 scale.  Dense-id enumeration is the
    documented variant (guarded at 10M ids); a sparse/huge key space
    needs a heavy-keeper heap alongside the sketch, in which case use the
    exact global top-k (docs_topk_ngrams pattern) instead.  Estimates
    overcount by design (eps*N with prob 1-delta); approximate ->
    materialized independent oracle."""
    ds = read_parquet(sf_dir, "events", columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"cms": [], "lo": [], "hi": []})
        vc = df["user_id"].value_counts()
        cms = np.zeros((_CMS_D, _CMS_W), np.int64)
        _cms_add(cms, vc.index.to_numpy(), vc.to_numpy())
        u = df["user_id"].to_numpy(np.int64)
        return pd.DataFrame(
            {"cms": [cms.tobytes()], "lo": [int(u.min())], "hi": [int(u.max())]}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cms = np.zeros((_CMS_D, _CMS_W), np.int64)
        for cb in df["cms"]:
            cms += np.frombuffer(cb, np.int64).reshape(_CMS_D, _CMS_W)
        lo, hi = int(df["lo"].min()), int(df["hi"].max())
        if hi - lo >= 10_000_000:
            raise ValueError(
                "events_heavy_hitters dense-id variant: key range too wide"
            )
        ranked = sorted(
            ((_cms_query(cms, k), k) for k in range(lo, hi + 1)),
            key=lambda t: (-t[0], t[1]),
        )[:_CMS_TOPK]
        return pd.DataFrame(
            {
                "user_id": [k for _e, k in ranked],
                "est_count": [e for e, _k in ranked],
            }
        )

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].astype("int64"), pa.int64()),
            "est_count": pa.array(out["est_count"].astype("int64"), pa.int64()),
        }
    )


# ---------------------------------------------------------- range join
_RANGE_US = 3_600_000_000  # 1-hour attribution window
_RANGE_LEFT = "view"  # window-owning side
_RANGE_RIGHT = "purchase"  # attributed side


def events_range_join(sf_dir: str):
    """Interval (range) join — the attribution-window shape: for every
    'view' event, the count and value-sum of the same user's 'purchase'
    events inside [view_ts, view_ts + 1 hour).  Ray Data has no interval
    join; this is the canonical bucketed composition: bucket width = the
    window length, so every window overlaps AT MOST TWO buckets —
    purchases land in exactly one (user, bucket) partition and each view
    is REPLICATED into the <= 2 buckets its window touches, which makes
    every (view, purchase) match occur in exactly one partition (the
    purchase's bucket), with no double counting by construction.  View
    replicas also emit zero partials so purchase-less views surface with
    n_purchases = 0; the <= 2 partials per view merge in one tiny
    event_id exchange.  Partitioning assumption (documented): matches are
    equi-keyed by user — the range predicate alone never crosses a
    (user, bucket) partition."""
    ensure_ctx()
    ev = read_parquet(
        sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type", "value"]
    )

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["ts"].values.astype("datetime64[us]").astype("int64")
        uid = df["user_id"].values.astype(np.int64)
        eid = df["event_id"].values.astype(np.int64)
        val = df["value"].values.astype(np.float64)
        is_r = (df["event_type"] == _RANGE_RIGHT).values
        is_l = (df["event_type"] == _RANGE_LEFT).values
        # right side: one row in its own bucket
        out = [
            pd.DataFrame(
                {
                    "user_id": uid[is_r],
                    "bucket": ts_us[is_r] // _RANGE_US,
                    "ts_us": ts_us[is_r],
                    "value": val[is_r],
                    "event_id": np.int64(-1),
                    "win_lo": np.int64(0),
                    "__side": np.int8(0),
                }
            )
        ]
        # left side: replica per touched bucket (1 when window-aligned)
        lo = ts_us[is_l]
        b0 = lo // _RANGE_US
        b1 = (lo + _RANGE_US - 1) // _RANGE_US
        dup = b1 != b0
        out.append(
            pd.DataFrame(
                {
                    "user_id": np.concatenate([uid[is_l], uid[is_l][dup]]),
                    "bucket": np.concatenate([b0, b1[dup]]),
                    "ts_us": np.int64(0),
                    "value": 0.0,
                    "event_id": np.concatenate([eid[is_l], eid[is_l][dup]]),
                    "win_lo": np.concatenate([lo, lo[dup]]),
                    "__side": np.int8(1),
                }
            )
        )
        return pd.concat(out, ignore_index=True)

    both = ev.map_batches(tag, batch_format="pandas", batch_size=None)

    def range_partial(df: pd.DataFrame) -> pd.DataFrame:
        r = df[df["__side"] == 0][["user_id", "bucket", "ts_us", "value"]]
        l = df[df["__side"] == 1][["user_id", "bucket", "event_id", "win_lo"]]
        # zero partial per view replica: purchase-less views must surface
        parts = pd.DataFrame(
            {"event_id": l["event_id"].values, "n": np.int64(0), "v": 0.0}
        )
        if len(r) and len(l):
            m = r.merge(l, on=["user_id", "bucket"])
            hit = (m["ts_us"].values >= m["win_lo"].values) & (
                m["ts_us"].values < m["win_lo"].values + _RANGE_US
            )
            m = m[hit]
            parts = pd.concat(
                [
                    parts,
                    pd.DataFrame(
                        {
                            "event_id": m["event_id"].values,
                            "n": np.int64(1),
                            "v": m["value"].values,
                        }
                    ),
                ],
                ignore_index=True,
            )
        return parts.groupby("event_id", as_index=False).sum()

    part = hash_partition_map(both, ["user_id", "bucket"], range_partial)

    out = collect_arrow(
        shuffle_agg(
            part,
            ["event_id"],
            lambda df: df.groupby("event_id", as_index=False).sum(),
            lambda df: df.groupby("event_id", as_index=False).sum(),
        ),
        pa.schema(
            [("event_id", pa.int64()), ("n", pa.int64()), ("v", pa.float64())]
        ),
    ).to_pandas()
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].astype("int64"), pa.int64()),
            "n_purchases": pa.array(out["n"].astype("int64"), pa.int64()),
            "value_sum": round_col(out["v"], 2),
        }
    )


EVENTS_RANGE_SQL = f"""
SELECT v.event_id,
       COUNT(p.ts)::BIGINT AS n_purchases,
       ROUND(COALESCE(SUM(p.value), 0), 2) AS value_sum
FROM events v
LEFT JOIN events p
  ON p.user_id = v.user_id
 AND p.event_type = '{_RANGE_RIGHT}'
 AND p.ts >= v.ts
 AND epoch_us(p.ts) < epoch_us(v.ts) + {_RANGE_US}
WHERE v.event_type = '{_RANGE_LEFT}'
GROUP BY v.event_id
"""


# ------------------------------------------------------- cohort retention
def events_cohort_retention(sf_dir: str):
    """Classic cohort-retention matrix: users grouped by first-seen DAY
    (their cohort), counting distinct users active at each day offset —
    (cohort_day, day_offset, n_users).

    ONE exchange total: hash-partition the block-distinct (user_id, day)
    rows by user_id — a user's whole history lands in one partition, so the
    partition computes that user's cohort (min day), its distinct day
    offsets, and a partial (cohort_day, day_offset, count) cell table whose
    driver sum is exact (users are partition-disjoint, so no cell is
    double-counted).  The naive form of this query is a self-join of events
    against its own min-aggregate; co-locating by the correlation key
    deletes the join entirely — the same decorrelation the sessionization
    op uses.  Integer day arithmetic only."""
    ds = read_parquet(sf_dir, "events", columns=["ts", "user_id"])

    def active_rows(df: pd.DataFrame) -> pd.DataFrame:
        days = df["ts"].values.astype("datetime64[us]").astype("int64") // 86_400_000_000
        g = pd.DataFrame({"user_id": df["user_id"].values, "day": days})
        return g.drop_duplicates()

    active = ds.map_batches(active_rows, batch_format="pandas")

    def per_user_cells(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()  # block-level distinct -> partition-exact
        cohort = d.groupby("user_id")["day"].transform("min")
        cells = pd.DataFrame(
            {
                "cohort_day": cohort.values,
                "day_offset": d["day"].values - cohort.values,
            }
        )
        g = cells.groupby(["cohort_day", "day_offset"], as_index=False).size()
        return g.rename(columns={"size": "n_users"})

    cells = hash_partition_map(active, ["user_id"], per_user_cells)
    out = driver_agg(
        cells,
        lambda df: df,
        lambda df: df.groupby(["cohort_day", "day_offset"], as_index=False)[
            "n_users"
        ].sum(),
    )
    return pa.table(
        {
            "cohort_day": pa.array(out["cohort_day"].astype("int64"), pa.int64()),
            "day_offset": pa.array(out["day_offset"].astype("int64"), pa.int64()),
            "n_users": pa.array(out["n_users"].astype("int64"), pa.int64()),
        }
    )


EVENTS_COHORT_SQL = """
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day
  FROM events
),
first AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id)
SELECT f.cohort_day, a.day - f.cohort_day AS day_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM act a JOIN first f USING (user_id)
GROUP BY f.cohort_day, day_offset
"""


# ----------------------------------------------------- salted hot-key join
_SALT_FANOUT = 8  # replicas of each per-user total; salt = event_id % this
_SHARE_TOPK = 50
_SHARE_FIX = 1_000_000  # share as integer millionths (exact floor division)


def events_value_share_topk(sf_dir: str):
    """Top-_SHARE_TOPK events by their share of the emitting user's total
    value — the decorrelated fact-vs-its-own-aggregate join, executed as a
    SALTED shuffle_join: real event logs are Zipf-skewed in user_id, so an
    unsalted exchange sends a hot user's entire row set to ONE partition
    (the straggler that gates the stage).  Here every per-user total is
    replicated _SALT_FANOUT times and each fact row joins on the composite
    key user_id*F + (event_id mod F), spreading a hot key over F partitions
    at the cost of F small-side copies — the standard skew-mitigation
    trade.  The share is exact integer arithmetic end to end:
    value_cents * 1e6 // total_cents over a NON-NEGATIVE domain (the
    WHERE value >= 0 filter is part of the query's contract on both
    sides, and users whose filtered total is zero are excluded: numpy //
    floor-divides while DuckDB // truncates toward zero, so the two only
    agree when numerator and denominator are non-negative and the
    denominator is positive — the restriction that makes 'exact mirror'
    true rather than asserted).  The top-k moves K rows per partition
    (the top_revenue shape), never the fact table."""
    ds = read_parquet(sf_dir, "events", columns=["event_id", "user_id", "value"])

    def cents(df: pd.DataFrame) -> pd.DataFrame:
        v = df["value"].to_numpy("float64")
        keep = v >= 0
        return pd.DataFrame(
            {
                "event_id": df["event_id"].astype("int64").values[keep],
                "user_id": df["user_id"].astype("int64").values[keep],
                "cents": np.rint(v[keep] * 100).astype("int64"),
            }
        )

    facts = ds.map_batches(cents, batch_format="pandas").materialize()

    def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False)["cents"].sum().rename(
            columns={"cents": "total_cents"}
        )

    def tot_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False)["total_cents"].sum()

    totals = shuffle_agg(facts, ["user_id"], tot_partial, tot_final)

    F = _SALT_FANOUT

    def salt_facts(df: pd.DataFrame) -> pd.DataFrame:
        uk = df["user_id"].values * F + df["event_id"].values % F
        return pd.DataFrame(
            {"uk": uk, "event_id": df["event_id"].values, "cents": df["cents"].values}
        )

    def replicate_totals(df: pd.DataFrame) -> pd.DataFrame:
        reps = pd.concat(
            [
                pd.DataFrame(
                    {
                        "uk": df["user_id"].values * F + s,
                        "total_cents": df["total_cents"].values,
                    }
                )
                for s in range(F)
            ],
            ignore_index=True,
        )
        return reps

    from scrapy__ray.pipelines.util import shuffle_join

    joined = shuffle_join(
        facts.map_batches(salt_facts, batch_format="pandas"),
        totals.map_batches(replicate_totals, batch_format="pandas"),
        on="uk",
        left_cols=["uk", "event_id", "cents"],
        right_cols=["uk", "total_cents"],
    )

    def head_partial(df: pd.DataFrame) -> pd.DataFrame:
        # total > 0 guaranteed: only non-negative cents enter, and a user
        # with any fact row has total >= that row's cents >= 0; a user
        # whose rows are ALL zero still has total 0 — exclude, as the SQL
        # side's t.total_cents > 0 does
        pos = df["total_cents"].values > 0
        share = (
            df["cents"].values[pos] * _SHARE_FIX // df["total_cents"].values[pos]
        )
        g = pd.DataFrame({"event_id": df["event_id"].values[pos], "share_fix": share})
        g = g.sort_values(["share_fix", "event_id"], ascending=[False, True])
        return g.head(_SHARE_TOPK)

    out = driver_agg(
        joined,
        head_partial,
        lambda df: df.sort_values(
            ["share_fix", "event_id"], ascending=[False, True]
        ).head(_SHARE_TOPK),
    )
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].astype("int64"), pa.int64()),
            "share_fix": pa.array(out["share_fix"].astype("int64"), pa.int64()),
        }
    )


EVENTS_SHARE_SQL = f"""
WITH c AS (
  SELECT event_id, user_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE value >= 0
),
t AS (SELECT user_id, SUM(cents) AS total_cents FROM c GROUP BY user_id)
SELECT c.event_id,
       -- integer // (BIGINT / is DOUBLE division, whose nearest-rounding
       -- can flip the floor at large totals).  DuckDB // truncates toward
       -- zero while the engine floor-divides: identical ONLY on the
       -- non-negative domain both sides pin (value >= 0, total > 0)
       CAST(c.cents * {_SHARE_FIX} // t.total_cents AS BIGINT) AS share_fix
FROM c JOIN t USING (user_id)
WHERE t.total_cents > 0
ORDER BY share_fix DESC, c.event_id LIMIT {_SHARE_TOPK}
"""


# ------------------------------------------- semi-structured (JSON) column
def events_props_stats(sf_dir: str):
    """Aggregate over a JSON payload column (events.props — the
    semi-structured sidecar every real event log carries): parse each
    row's JSON, extract the integer field 'k', and roll up per event_type
    (count, rows-with-k, exact integer sum, min, max — the latter three
    NULL for a type with no valid k, matching SQL aggregate semantics).
    'Valid k' is pinned strictly on BOTH sides: top-level JSON object with
    an integer-typed k — JSON true, "5", 2.7, non-objects (null/5/[1]) and
    malformed strings all read as missing, never coerced.  The parse is a
    plain vectorizable map; the rollup is the low-cardinality
    driver-reduce path (no shuffle).  SQL mirror guards with
    json_valid + json_type so it errors and coerces nowhere the engine
    doesn't."""
    import json as _json

    ds = read_parquet(sf_dir, "events", columns=["event_type", "props"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = []
        for p in df["props"]:
            v = None
            if p:
                try:
                    doc = _json.loads(p)
                    # non-object payloads (null, scalars, arrays) have no k
                    v = doc.get("k") if isinstance(doc, dict) else None
                except (ValueError, TypeError):
                    v = None
            # bool is an int subclass in Python; JSON true must not read as 1
            ks.append(v if isinstance(v, int) and not isinstance(v, bool) else None)
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].values,
                "k": pd.array(ks, dtype="Int64"),
            }
        )
        out = g.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"),
            n_with_k=("k", "count"),
            # min_count=1: an all-missing group must stay NA (SQL SUM over
            # zero non-NULLs is NULL, not 0)
            k_sum=("k", lambda s: s.sum(min_count=1)),
            k_min=("k", "min"),
            k_max=("k", "max"),
        )
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            n_events=("n_events", "sum"),
            n_with_k=("n_with_k", "sum"),
            k_sum=("k_sum", lambda s: s.sum(min_count=1)),
            k_min=("k_min", "min"),
            k_max=("k_max", "max"),
        )

    out = driver_agg(ds, partial, final)

    def nullable(col) -> list:
        return [None if pd.isna(v) else int(v) for v in col]

    return pa.table(
        {
            "event_type": pa.array(out["event_type"], pa.string()),
            "n_events": pa.array(out["n_events"].astype("int64"), pa.int64()),
            "n_with_k": pa.array(out["n_with_k"].astype("int64"), pa.int64()),
            "k_sum": pa.array(nullable(out["k_sum"]), pa.int64()),
            "k_min": pa.array(nullable(out["k_min"]), pa.int64()),
            "k_max": pa.array(nullable(out["k_max"]), pa.int64()),
        }
    )


EVENTS_PROPS_SQL = """
WITH x AS (
  SELECT event_type,
         CASE WHEN props IS NOT NULL AND json_valid(props)
                   AND json_type(props) = 'OBJECT'
                   AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
              THEN CAST(json_extract(props, '$.k') AS BIGINT) END AS k
  FROM events
)
SELECT event_type, COUNT(*) AS n_events, COUNT(k) AS n_with_k,
       CAST(SUM(k) AS BIGINT) AS k_sum, MIN(k) AS k_min, MAX(k) AS k_max
FROM x GROUP BY event_type
"""


# ------------------------------------------------------------ funnel analysis
_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW_US = 86_400_000_000  # 24 h conversion window per step


def events_funnel(sf_dir: str):
    """Ordered-step conversion funnel with a per-step conversion window
    (the classic product-analytics query): step 1 counts users with any
    'view' event; step k counts users whose earliest QUALIFYING step-k
    event lies strictly after their step-(k-1) completion time and within
    _FUNNEL_WINDOW_US of it, where "completion time" is itself the earliest
    qualifying time — greedy earliest-completion semantics, strict lower
    bound / inclusive upper bound pinned on both sides (a same-microsecond
    event does not advance the funnel; one exactly at the window edge
    does).

    ONE hash exchange total: the rows of the three step types (pruned in
    the scan) hash-partition by user_id, so each user's full history lands
    in one partition and the per-step earliest-completion times resolve
    with vectorized groupby mins — the naive form is a k-deep chain of the
    event table self-joined against its own min-aggregate, deleted here by
    co-locating on the correlation key (the sessionization/cohort shape).
    Partials are (step, n_users) rows; users are partition-disjoint so the
    driver sum is exact.  Zero-user steps are emitted explicitly to match
    the SQL mirror's constant three-row shape."""
    ds = read_parquet(sf_dir, "events", columns=["user_id", "event_type", "ts"])

    def keep_steps(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(_FUNNEL_STEPS)]

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        counts: list[int] = []
        if len(df) == 0:
            counts = [0] * len(_FUNNEL_STEPS)
        else:
            us = df["user_id"].values
            ts = df["ts"].values.astype("datetime64[us]").astype("int64")
            et = df["event_type"].values
            prev: pd.Series | None = None  # user_id -> completion time so far
            for name in _FUNNEL_STEPS:
                mask = et == name
                g = pd.DataFrame({"u": us[mask], "t": ts[mask]})
                if prev is not None:
                    p = g["u"].map(prev)
                    g = g[
                        p.notna()
                        & (g["t"].values > p.values)
                        & (g["t"].values <= p.values + _FUNNEL_WINDOW_US)
                    ]
                prev = g.groupby("u")["t"].min()
                counts.append(len(prev))
        return pd.DataFrame(
            {
                "step": np.arange(1, len(_FUNNEL_STEPS) + 1, dtype=np.int64),
                "n_users": np.asarray(counts, dtype=np.int64),
            }
        )

    partials = hash_partition_map(
        ds.map_batches(keep_steps, batch_format="pandas"), ["user_id"], per_user
    )
    out = driver_agg(
        partials,
        lambda df: df,
        lambda df: df.groupby("step", as_index=False)["n_users"].sum(),
    ).sort_values("step")
    return pa.table(
        {
            "step": pa.array(out["step"].astype("int64"), pa.int64()),
            "event_type": pa.array(
                [_FUNNEL_STEPS[s - 1] for s in out["step"]], pa.string()
            ),
            "n_users": pa.array(out["n_users"].astype("int64"), pa.int64()),
        }
    )


EVENTS_FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t
    AND epoch_us(e.ts) <= epoch_us(s1.t) + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t
    AND epoch_us(e.ts) <= epoch_us(s2.t) + {_FUNNEL_WINDOW_US}
  GROUP BY e.user_id
)
SELECT * FROM (
  SELECT 1 AS step, '{_FUNNEL_STEPS[0]}' AS event_type,
         (SELECT COUNT(*) FROM s1) AS n_users
  UNION ALL
  SELECT 2, '{_FUNNEL_STEPS[1]}', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 3, '{_FUNNEL_STEPS[2]}', (SELECT COUNT(*) FROM s3)
) ORDER BY step
"""


# ---------------------------------------------------- Markov transitions
def events_markov_transitions(sf_dir: str):
    """User-journey Markov transition counts: for each user's event stream
    ordered by (ts, event_id), count every consecutive (src_type ->
    dst_type) step across the corpus — the sequential-pattern primitive
    behind journey analysis, next-event prediction baselines, and funnel
    discovery.  The self-join-free plan: ONE user-keyed hash exchange
    co-locates each user's history, the partition sorts once and takes a
    vectorized per-user shift (the LAG window), and the (src, dst) partial
    counts — at most |event_types|² rows per partition — fold at the
    driver.  All-integer counts: order-independent, exact."""
    ds = read_parquet(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type"])

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"src_type": pd.Series([], dtype=str),
                 "dst_type": pd.Series([], dtype=str),
                 "n_transitions": pd.Series([], dtype="int64")}
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        src = df.groupby("user_id", sort=False)["event_type"].shift()
        pairs = pd.DataFrame({"src_type": src, "dst_type": df["event_type"]})
        pairs = pairs[pairs["src_type"].notna()]
        return pairs.groupby(["src_type", "dst_type"], as_index=False).agg(
            n_transitions=("dst_type", "size")
        )

    per_part = hash_partition_map(ds, ["user_id"], transitions)
    return driver_agg(
        per_part,
        lambda df: df,
        lambda df: df.groupby(["src_type", "dst_type"], as_index=False).agg(
            n_transitions=("n_transitions", "sum")
        ),
    )


EVENTS_MARKOV_SQL = """
WITH seq AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events)
SELECT prev_type AS src_type, event_type AS dst_type,
       COUNT(*)::BIGINT AS n_transitions
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, event_type
"""


# ------------------------------------------------ hourly anomaly detection
def events_hourly_anomaly(sf_dir: str):
    """Z-score anomaly detection over tumbling 1-hour windows, per event
    type — the monitoring query behind 'this hour's traffic is 3σ off for
    this event class'.  Emits every (type, hour) with its count and z-score
    against the type's own hourly distribution (population moments).

    Shape: ONE exchange total.  Per-block (event_type, hour) count partials
    hash-shuffle by the window key (the events_hourly posture — window-key
    cardinality grows with the time span, not the corpus); the per-type
    moment reduction (n, Σc, Σc²) then folds on the driver because the
    post-agg table is bounded by types × hours, independent of input rows.
    Moments are exact int64 and z is computed in the one float64 op order
    the SQL text mirrors, so rounding to 6 digits is hash-stable.  Types
    whose hourly counts are constant (zero variance) are excluded on both
    sides — no z is defined for them."""
    ds = read_parquet(sf_dir, "events", columns=["ts", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hours = (
            df["ts"].values.astype("datetime64[us]").astype("int64")
            // 3_600_000_000
        )
        g = pd.DataFrame(
            {"event_type": df["event_type"].values, "hour": hours, "n_events": 1}
        )
        return g.groupby(["event_type", "hour"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "hour"], as_index=False).sum()

    out = collect_arrow(
        shuffle_agg(ds, ["event_type", "hour"], partial, final),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("hour", pa.int64()),
                ("n_events", pa.int64()),
            ]
        ),
    ).to_pandas()

    cnt = out["n_events"].astype("int64")
    g = out.groupby("event_type")["n_events"]
    n = g.transform("size").astype("int64")
    s1 = g.transform("sum").astype("int64")
    s2 = (
        out.assign(c2=cnt * cnt)
        .groupby("event_type")["c2"]
        .transform("sum")
        .astype("int64")
    )
    var_num = n * s2 - s1 * s1  # n²·population-variance, exact int64
    keep = (n >= 2) & (var_num > 0)
    # pinned float64 op order, mirrored term-for-term by the SQL text
    mean = s1.astype("float64") / n.astype("float64")
    sd = np.sqrt(var_num.astype("float64") / (n * n).astype("float64"))
    with np.errstate(divide="ignore", invalid="ignore"):
        # sd=0 rows are masked out by `keep` below; silence the transient
        # divide-by-zero warnings their z would otherwise emit
        z = (cnt.astype("float64") - mean) / sd
    res = out[keep].reset_index(drop=True)
    return pa.table(
        {
            "event_type": pa.array(res["event_type"], pa.string()),
            "hour": pa.array(res["hour"].astype("int64"), pa.int64()),
            "n_events": pa.array(res["n_events"].astype("int64"), pa.int64()),
            "z": round_col(z[keep].reset_index(drop=True), 6),
        }
    )


EVENTS_ANOMALY_SQL = """
WITH h AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
         COUNT(*)::BIGINT AS n_events
  FROM events GROUP BY event_type, hour
), s AS (
  SELECT event_type, COUNT(*)::BIGINT AS n, SUM(n_events)::BIGINT AS s1,
         SUM(n_events * n_events)::BIGINT AS s2
  FROM h GROUP BY event_type
)
SELECT h.event_type, h.hour, h.n_events,
       ROUND((CAST(h.n_events AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
             / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE) / CAST(n * n AS DOUBLE)),
             6) AS z
FROM h JOIN s USING (event_type)
WHERE n >= 2 AND n * s2 - s1 * s1 > 0
"""


# ------------------------------------------- bottom-k quantile sample (KMV)
#: sample size per event_type (the k of the bottom-k/KMV construction);
#: rank-error of a quantile from a k-sample is O(1/sqrt(k)) w.h.p.
_BOTTOMK_K = 512
_BOTTOMK_QS = (0.25, 0.5, 0.75, 0.9)


def events_value_bottomk_quantiles(sf_dir: str):
    """Approximate per-type value quantiles from a DETERMINISTIC bottom-k
    (KMV) sample — the order-independent quantile sketch: rank every event
    by md5(event_id) and keep the k hash-smallest per event_type, so the
    sample is a pure function of the data MULTISET (merge order, block
    boundaries and partitioning cannot change it — unlike KLL/t-digest,
    whose compactions are order-sensitive and can never be bit-reproduced
    by an independent oracle).  Quantile rule (pinned): for q in
    {.25,.5,.75,.9}, the sorted sample's element at floor(q*(m-1)) —
    an order STATISTIC, no interpolation arithmetic, so engine and SQL
    return the identical double bit-for-bit.

    Scale shape: per-block partial bottom-k caps the exchange at k rows
    per (block, type); ONE hash exchange by event_type; the final
    per-partition bottom-k + order stats are vectorized.  At 10^10 events
    the full per-type value column never exists anywhere — exactly what
    the exact grouped-quantile op (lineitem_price_quantiles) cannot do.
    Oracle: inline SQL (DuckDB md5 of the same decimal string mirrors the
    rank), the strongest gate class."""
    import math

    ds = read_parquet(
        sf_dir, "events", columns=["event_id", "event_type", "value"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["value"].notna()]
        if not len(df):
            return pd.DataFrame(
                {"event_type": [], "value": [], "h": [], "event_id": []}
            )
        h = [
            hashlib.md5(str(int(i)).encode()).hexdigest()
            for i in df["event_id"]
        ]
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].values,
                "value": df["value"].values,
                "h": h,
                "event_id": df["event_id"].astype("int64").values,
            }
        )
        g = g.sort_values(["event_type", "h", "event_id"], kind="mergesort")
        return g.groupby("event_type", sort=False).head(_BOTTOMK_K)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "event_type": [], "n_sample": [],
            **{f"q{int(q * 100)}": [] for q in _BOTTOMK_QS},
        }
        if len(df):
            g = df.sort_values(["event_type", "h", "event_id"], kind="mergesort")
            samp = g.groupby("event_type", sort=False).head(_BOTTOMK_K)
            for et, grp in samp.groupby("event_type"):
                vals = np.sort(grp["value"].to_numpy(dtype=np.float64))
                m = len(vals)
                cols["event_type"].append(et)
                cols["n_sample"].append(m)
                for q in _BOTTOMK_QS:
                    cols[f"q{int(q * 100)}"].append(
                        float(vals[int(math.floor(q * (m - 1)))])
                    )
        return pd.DataFrame(cols)

    out = shuffle_agg(ds, ["event_type"], partial, final)
    schema = pa.schema(
        [("event_type", pa.string()), ("n_sample", pa.int64())]
        + [(f"q{int(q * 100)}", pa.float64()) for q in _BOTTOMK_QS]
    )
    return collect_arrow(out, schema)


EVENTS_BOTTOMK_SQL = f"""
WITH ranked AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
         ) AS rn
  FROM events WHERE value IS NOT NULL
), ordered AS (
  SELECT event_type, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS vr,
         COUNT(*) OVER (PARTITION BY event_type) AS m
  FROM ranked WHERE rn <= {_BOTTOMK_K}
)
SELECT event_type,
       CAST(MAX(m) AS BIGINT) AS n_sample,
       MAX(CASE WHEN vr = CAST(FLOOR(0.25*(m-1)) AS BIGINT)+1 THEN value END) AS q25,
       MAX(CASE WHEN vr = CAST(FLOOR(0.5*(m-1))  AS BIGINT)+1 THEN value END) AS q50,
       MAX(CASE WHEN vr = CAST(FLOOR(0.75*(m-1)) AS BIGINT)+1 THEN value END) AS q75,
       MAX(CASE WHEN vr = CAST(FLOOR(0.9*(m-1))  AS BIGINT)+1 THEN value END) AS q90
FROM ordered GROUP BY event_type
"""


QUERIES = {
    "events_asof_orders": (events_asof_orders, EVENTS_ASOF_SQL),
    "events_value_bottomk_quantiles": (
        events_value_bottomk_quantiles,
        EVENTS_BOTTOMK_SQL,
    ),
    "events_approx_users": (events_approx_users, None),
    "events_approx_users_by_type": (events_approx_users_by_type, None),
    "lineitem_price_quantiles": (lineitem_price_quantiles, LINEITEM_QUANTILES_SQL),
    "events_range_join": (events_range_join, EVENTS_RANGE_SQL),
    "events_heavy_hitters": (events_heavy_hitters, None),
    "events_cohort_retention": (events_cohort_retention, EVENTS_COHORT_SQL),
    "events_value_share_topk": (events_value_share_topk, EVENTS_SHARE_SQL),
    "events_props_stats": (events_props_stats, EVENTS_PROPS_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "events_markov_transitions": (events_markov_transitions, EVENTS_MARKOV_SQL),
    "events_hourly_anomaly": (events_hourly_anomaly, EVENTS_ANOMALY_SQL),
}
