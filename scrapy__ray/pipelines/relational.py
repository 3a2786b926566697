"""Relational query pipelines over the testdata tables — idiomatic Ray Data.

Each query exists as (ray_pipeline, oracle_sql) with IDENTICAL output column
names and rounding, so the driver's order-insensitive value-hash compare is
meaningful.  Scale patterns exercised:
  * column-pruned reads (``read_parquet(columns=...)``)
  * combiner + driver reduce for low-cardinality aggregates (``driver_agg``:
    partial per block, tiny concat on the driver — no shuffle at all)
  * partial-agg -> hash-shuffle -> vectorized final for high-cardinality
    aggregates (``shuffle_agg``; native groupby().aggregate() measured at
    ~200 µs/group — see util.ensure_ctx docstring — so it is never used)
  * broadcast-small-side joins (``ray.put`` once, process-cached lookup)
  * hash-partitioned vectorized sessionization (``hash_partition_map``)

Floating-point note: parallel partial sums associate differently than
DuckDB's serial aggregation; every float output is rounded coarsely enough
(documented per query) that the ≤1e-8-relative association error can't flip
a rounded digit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy__ray.pipelines.util import (
    arrow_out,
    broadcast,
    collect_arrow,
    driver_agg,
    hash_partition_map,
    lookup_broadcast,
    read_parquet,
    round_col,
    shuffle_agg,
    shuffle_join,
)

_Q1_CUTOFF = "1998-09-02"


# ------------------------------------------------------------------ Q1-like
def lineitem_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: 4 groups — combiner per block + driver reduce."""
    ds = read_parquet(
        sf_dir, "lineitem",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    )
    cutoff = np.datetime64(_Q1_CUTOFF, "us")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["l_shipdate"].values.astype("datetime64[us]") <= cutoff]
        disc_price = df["l_extendedprice"].values * (1.0 - df["l_discount"].values)
        g = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].values,
                "l_linestatus": df["l_linestatus"].values,
                "qty": df["l_quantity"].values,
                "base": df["l_extendedprice"].values,
                "disc_price": disc_price,
                "charge": disc_price * (1.0 + df["l_tax"].values),
                "n": 1,
            }
        )
        return g.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["l_returnflag", "l_linestatus"], as_index=False).sum()

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "l_returnflag": out["l_returnflag"],
            "l_linestatus": out["l_linestatus"],
            "sum_qty": round_col(out["qty"], 0),
            "sum_base_price": round_col(out["base"], 0),
            "sum_disc_price": round_col(out["disc_price"], 0),
            "sum_charge": round_col(out["charge"], 0),
            "avg_qty": round_col(out["qty"] / out["n"], 4),
            "count_order": pa.array(out["n"].astype("int64"), pa.int64()),
        }
    )


LINEITEM_PRICING_SQL = f"""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 0) AS sum_qty,
       ROUND(SUM(l_extendedprice), 0) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 0) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 0) AS sum_charge,
       ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# ------------------------------------------------------- top-k by aggregate
def top_revenue_orders(sf_dir: str):
    """Global top-10 orders by summed revenue: partial per block ->
    hash-shuffle by l_orderkey -> per-partition exact sum + local top-10 ->
    driver merge of 16×10 candidate rows.  The shuffle moves one row per
    (orderkey, block); the driver sees O(partitions × k) rows only."""
    ds = read_parquet(
        sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = df["l_extendedprice"].values * (1.0 - df["l_discount"].values)
        g = pd.DataFrame({"l_orderkey": df["l_orderkey"].values, "rev": rev})
        return g.groupby("l_orderkey", as_index=False).sum()

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False).sum()
        return g.sort_values(["rev", "l_orderkey"], ascending=[False, True]).head(10)

    cand = shuffle_agg(ds, ["l_orderkey"], partial, final_topk)
    out = (
        collect_arrow(
            cand,
            pa.schema([("l_orderkey", pa.int64()), ("rev", pa.float64())]),
        )
        .to_pandas()
        .sort_values(["rev", "l_orderkey"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "l_orderkey": pa.array(out["l_orderkey"], pa.int64()),
            "revenue": round_col(out["rev"], 2),
        }
    )


TOP_REVENUE_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
GROUP BY l_orderkey
ORDER BY SUM(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
LIMIT 10
"""


# ------------------------------------------------- broadcast dimension join
def customer_nation_rollup(sf_dir: str):
    """customer ⋈ nation ⋈ region with both small sides broadcast once;
    ~125 output groups -> combiner + driver reduce."""
    import pyarrow.parquet as pq

    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    r_name = dict(zip(region["r_regionkey"].to_pylist(), region["r_name"].to_pylist()))
    dim = {
        nk: (nn, r_name[rk])
        for nk, nn, rk in zip(
            nation["n_nationkey"].to_pylist(),
            nation["n_name"].to_pylist(),
            nation["n_regionkey"].to_pylist(),
        )
    }
    dim_ref = broadcast(dim)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = lookup_broadcast(dim_ref)
        keys = df["c_nationkey"].values
        g = pd.DataFrame(
            {
                "n_name": [d[k][0] for k in keys],
                "r_name": [d[k][1] for k in keys],
                "n_customers": 1,
                "bal": df["c_acctbal"].values,
            }
        )
        return g.groupby(["n_name", "r_name"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["n_name", "r_name"], as_index=False).sum()

    ds = read_parquet(sf_dir, "customer", columns=["c_nationkey", "c_acctbal"])
    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "n_name": out["n_name"],
            "r_name": out["r_name"],
            "n_customers": pa.array(out["n_customers"].astype("int64"), pa.int64()),
            "acctbal_sum": round_col(out["bal"], 2),
        }
    )


CUSTOMER_NATION_SQL = """
SELECT n_name, r_name, COUNT(*) AS n_customers,
       ROUND(SUM(c_acctbal), 2) AS acctbal_sum
FROM customer
JOIN nation ON n_nationkey = c_nationkey
JOIN region ON r_regionkey = n_regionkey
GROUP BY n_name, r_name
"""


# --------------------------------------------------------- filter + groupby
def order_priority_counts(sf_dir: str):
    ds = read_parquet(sf_dir, "orders", columns=["o_orderpriority", "o_orderdate"])
    lo = np.datetime64("1996-01-01", "us")
    hi = np.datetime64("1997-01-01", "us")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["o_orderdate"].values.astype("datetime64[us]")
        df = df[(d >= lo) & (d < hi)]
        g = df.groupby("o_orderpriority", as_index=False).size()
        return g.rename(columns={"size": "n_orders"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_orderpriority", as_index=False)["n_orders"].sum()

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "o_orderpriority": out["o_orderpriority"],
            "n_orders": pa.array(out["n_orders"].astype("int64"), pa.int64()),
        }
    )


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY o_orderpriority
"""


# ------------------------------------------------------- event-time windows
def events_hourly(sf_dir: str):
    """Tumbling 1-hour windows — Ray Data has no event-time machinery, so the
    window key is a computed column and the window an ordinary grouped
    aggregation (SURVEY.md §2.7: the BSP round loop is the only ordering
    mechanism).  Window-key cardinality grows with the time span, so this
    takes the hash-shuffle path, not the driver reduce."""
    ds = read_parquet(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hours = df["ts"].values.astype("datetime64[us]").astype("int64") // 3_600_000_000
        g = pd.DataFrame(
            {
                "event_type": df["event_type"].values,
                "hour": hours,
                "n_events": 1,
                "v": df["value"].values,
            }
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
                ("v", pa.float64()),
            ]
        ),
    ).to_pandas()
    return pa.table(
        {
            "event_type": out["event_type"],
            "hour": pa.array(out["hour"].astype("int64"), pa.int64()),
            "n_events": pa.array(out["n_events"].astype("int64"), pa.int64()),
            "value_sum": round_col(out["v"], 2),
        }
    )


EVENTS_HOURLY_SQL = """
SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS value_sum
FROM events
GROUP BY event_type, hour
"""


# --------------------------------------------------------- sessionization
SESSION_GAP_US = 1_800_000_000  # 30 virtual minutes


def user_sessions(sf_dir: str):
    """Per-user session counting (30-min inactivity gap): hash-partition by
    user so each partition holds whole users, then one fully-vectorized
    sort + diff pass per partition — no per-group UDF dispatch."""
    ds = read_parquet(sf_dir, "events", columns=["user_id", "ts"])

    def sess(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"])
        ts = df["ts"].values.astype("datetime64[us]").astype("int64")
        uid = df["user_id"].values
        same_user = np.concatenate([[False], uid[1:] == uid[:-1]])
        gap = np.concatenate([[0], np.diff(ts)])
        brk = same_user & (gap > SESSION_GAP_US)
        g = pd.DataFrame({"user_id": uid, "one": 1, "brk": brk.astype("int64")})
        out = g.groupby("user_id", as_index=False).sum()
        return pd.DataFrame(
            {
                "user_id": out["user_id"],
                "n_events": out["one"],
                "n_sessions": out["brk"] + 1,
            }
        )

    out = collect_arrow(
        hash_partition_map(ds, ["user_id"], sess),
        pa.schema(
            [
                ("user_id", pa.int64()),
                ("n_events", pa.int64()),
                ("n_sessions", pa.int64()),
            ]
        ),
    )
    return out


USER_SESSIONS_SQL = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
)
SELECT user_id, COUNT(*) AS n_events,
       (1 + COALESCE(SUM(brk), 0))::BIGINT AS n_sessions
FROM d GROUP BY user_id
"""


# ------------------------------------------------- large-large shuffle join
def orders_by_nation(sf_dir: str):
    """orders ⋈ customer on custkey — both sides large, so this is the
    repartition (shuffle) join from util.shuffle_join, not a broadcast —
    then a low-cardinality rollup via driver reduce."""
    orders = read_parquet(sf_dir, "orders", columns=["o_custkey", "o_orderpriority"])
    cust = read_parquet(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda df: df.rename(columns={"c_custkey": "o_custkey"}),
        batch_format="pandas",
        batch_size=None,
    )
    joined = shuffle_join(orders, cust, on="o_custkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["c_nationkey", "o_orderpriority"], as_index=False).size()
        return g.rename(columns={"size": "n_orders"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["c_nationkey", "o_orderpriority"], as_index=False)[
            "n_orders"
        ].sum()

    out = driver_agg(joined, partial, final)
    return pa.table(
        {
            "c_nationkey": pa.array(out["c_nationkey"], pa.int64()),
            "o_orderpriority": out["o_orderpriority"],
            "n_orders": pa.array(out["n_orders"].astype("int64"), pa.int64()),
        }
    )


ORDERS_BY_NATION_SQL = """
SELECT c_nationkey, o_orderpriority, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_nationkey, o_orderpriority
"""


# --------------------------------------------------------- sliding windows
_WIN_US = 3_600_000_000  # 1 h window
_SLIDE_US = 900_000_000  # 15 min slide -> each event in 4 windows


def events_sliding_windows(sf_dir: str):
    """Sliding event-time windows (1 h / 15 min): each event expands into
    window-start keys inside map_batches (the flat-map), then the grouped
    aggregation takes the hash-shuffle path."""
    ds = read_parquet(sf_dir, "events", columns=["ts", "event_type", "value"])
    k = _WIN_US // _SLIDE_US

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].values.astype("datetime64[us]").astype("int64")
        base = t // _SLIDE_US
        frames = []
        for i in range(k):
            frames.append(
                pd.DataFrame(
                    {
                        "event_type": df["event_type"].values,
                        "win_start_us": (base - i) * _SLIDE_US,
                        "n_events": 1,
                        "v": df["value"].values,
                    }
                )
            )
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["event_type", "win_start_us"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["event_type", "win_start_us"], as_index=False).sum()

    out = collect_arrow(
        shuffle_agg(ds, ["event_type", "win_start_us"], expand, final),
        pa.schema(
            [
                ("event_type", pa.string()),
                ("win_start_us", pa.int64()),
                ("n_events", pa.int64()),
                ("v", pa.float64()),
            ]
        ),
    ).to_pandas()
    return pa.table(
        {
            "event_type": out["event_type"],
            "win_start_us": pa.array(out["win_start_us"].astype("int64"), pa.int64()),
            "n_events": pa.array(out["n_events"].astype("int64"), pa.int64()),
            "value_sum": round_col(out["v"], 2),
        }
    )


EVENTS_SLIDING_SQL = """
SELECT event_type,
       (epoch_us(ts) // 900000000 - k) * 900000000 AS win_start_us,
       COUNT(*) AS n_events, ROUND(SUM(value), 2) AS value_sum
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY event_type, win_start_us
"""


# ------------------------------------------------- window functions (rank)
def orders_rank_window(sf_dir: str):
    """ROW_NUMBER / RANK window functions: top-3 orders per customer by
    totalprice.  The distributed window-function pattern: ONE hash exchange
    by the PARTITION BY key (every row of a customer lands in exactly one
    partition), then a vectorized per-partition sort + cumcount/rank — no
    per-group UDF dispatch, no global sort.  At 10^10 rows the exchange is
    the only all-to-all and the output is O(3 x customers)."""
    ds = read_parquet(
        sf_dir, "orders", columns=["o_custkey", "o_orderkey", "o_totalprice"]
    )

    def rank_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df.assign(rn=pd.Series(dtype="int64"), rnk=pd.Series(dtype="int64"))
        df = df.sort_values(
            ["o_custkey", "o_totalprice", "o_orderkey"],
            ascending=[True, False, True],
            kind="mergesort",
        ).reset_index(drop=True)
        df["rn"] = df.groupby("o_custkey").cumcount() + 1
        df["rnk"] = (
            df.groupby("o_custkey")["o_totalprice"]
            .rank(method="min", ascending=False)
            .astype("int64")
        )
        return df[df["rn"] <= 3]

    out = hash_partition_map(ds, ["o_custkey"], rank_part)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("o_custkey", pa.int64()),
                ("o_orderkey", pa.int64()),
                ("o_totalprice", pa.float64()),
                ("rn", pa.int64()),
                ("rnk", pa.int64()),
            ]
        ),
    )


ORDERS_RANK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn,
         RANK() OVER (PARTITION BY o_custkey
                      ORDER BY o_totalprice DESC) AS rnk
  FROM orders) WHERE rn <= 3
"""


# ---------------------------------------------------- ROLLUP (grouping sets)
def orders_priority_rollup(sf_dir: str):
    """GROUP BY ROLLUP(priority, year): subtotal rows at every prefix
    level plus the grand total.  Scale shape: aggregate ONCE at the finest
    grain (combiner per block -> driver reduce over O(groups x blocks)
    rows — 5 priorities x 7 years here), then derive the coarser levels by
    re-aggregating the tiny finest-grain table on the driver; the raw
    input is scanned exactly once regardless of how many rollup levels
    exist.  Money is summed in exact integer cents so every level is
    order-independent and hash-exact vs the SQL."""
    ds = read_parquet(
        sf_dir, "orders", columns=["o_orderpriority", "o_orderdate", "o_totalprice"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        yr = (
            df["o_orderdate"]
            .values.astype("datetime64[Y]")
            .astype("int64")
            + 1970
        )
        cents = np.round(df["o_totalprice"].values * 100.0).astype("int64")
        g = pd.DataFrame(
            {
                "priority": df["o_orderpriority"].values,
                "yr": yr,
                "order_count": 1,
                "total_cents": cents,
            }
        )
        return g.groupby(["priority", "yr"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        fine = df.groupby(["priority", "yr"], as_index=False).sum()
        l2 = pd.DataFrame(
            {
                "priority": fine["priority"],
                "yr": fine["yr"].astype("int64").astype(str),
                "order_count": fine["order_count"],
                "total_cents": fine["total_cents"],
            }
        )
        l1 = fine.groupby("priority", as_index=False)[
            ["order_count", "total_cents"]
        ].sum()
        l1.insert(1, "yr", "ALL")
        l0 = pd.DataFrame(
            {
                "priority": ["ALL"],
                "yr": ["ALL"],
                "order_count": [int(fine["order_count"].sum())],
                "total_cents": [int(fine["total_cents"].sum())],
            }
        )
        return pd.concat([l2, l1, l0], ignore_index=True)

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "priority": pa.array(out["priority"], pa.string()),
            "yr": pa.array(out["yr"], pa.string()),
            "order_count": pa.array(out["order_count"].astype("int64"), pa.int64()),
            "total_cents": pa.array(out["total_cents"].astype("int64"), pa.int64()),
        }
    )


ORDERS_ROLLUP_SQL = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(CAST(CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS VARCHAR),
                'ALL') AS yr,
       COUNT(*) AS order_count,
       CAST(SUM(CAST(o_totalprice * 100 AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ROLLUP(o_orderpriority, CAST(EXTRACT(year FROM o_orderdate) AS INTEGER))
"""


# --------------------------------------- TPC-H Q17 shape: correlated avg
#: part rows at or below this broadcast as a (partkey -> brand) dict
#: (~50 B/row; 10M rows ≈ 500 MB is the sane ceiling); above it the brand
#: lookup is a shuffle_join — TPC-H part is SF x 200k rows, so the design
#: point exceeds any driver.
_PART_BROADCAST_MAX = 10_000_000


def parts_small_qty_revenue(sf_dir: str):
    """Revenue locked in unusually small orders, per brand (the TPC-H Q17
    'correlated scalar aggregate' shape): lineitems whose quantity is below
    0.2x their part's average quantity, summed as exact integer cents and
    grouped by p_brand.

    Scale pattern: the textbook decorrelation is aggregate-then-join-back
    (two exchanges, the fact table scanned twice).  Co-locating by the
    correlation key does strictly better: ONE hash exchange of the pruned
    fact columns by l_partkey puts every part's rows in one partition,
    which computes that part's (cnt, qsum) AND filters its own rows
    locally — the join is gone and lineitem is scanned once.  The
    predicate is evaluated EXACTLY in integers (qty < 0.2*avg  <=>
    5*qty*cnt < qsum — no float division anywhere); the SQL oracle states
    the identical integer form.

    Part-dimension regime (TPC-H part GROWS with SF — 2x10^8 rows at
    SF=1000, NOT broadcastable at the design point): at or below
    _PART_BROADCAST_MAX rows the (partkey -> brand) dict is broadcast once
    and applied inside the same partition pass; above it the filtered
    (partkey, cents) rows shuffle_join against the part dataset on partkey
    — forced + compared in tests."""
    import pyarrow.parquet as _pq

    li = read_parquet(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )
    n_parts = _pq.read_metadata(sf_dir + "/part.parquet").num_rows
    small_part = n_parts <= _PART_BROADCAST_MAX
    if small_part:
        pt = _pq.read_table(sf_dir + "/part.parquet", columns=["p_partkey", "p_brand"])
        brand_ref = broadcast(
            dict(zip(pt["p_partkey"].to_pylist(), pt["p_brand"].to_pylist()))
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].to_numpy("int64")
        g = pd.DataFrame({"k": df["l_partkey"].to_numpy("int64"), "q": q})
        grp = g.groupby("k")
        cnt = grp["q"].transform("size").to_numpy("int64")
        qsum = grp["q"].transform("sum").to_numpy("int64")
        keep = 5 * q * cnt < qsum
        cents = np.rint(
            df["l_extendedprice"].to_numpy("float64")[keep] * 100
        ).astype("int64")
        sub = pd.DataFrame({"l_partkey": g["k"].to_numpy()[keep], "cents": cents})
        if small_part:
            brands = lookup_broadcast(brand_ref)
            sub["p_brand"] = sub["l_partkey"].map(brands)
            return sub.groupby("p_brand", as_index=False).agg(
                revenue_cents=("cents", "sum"), n_items=("cents", "size")
            )
        return sub

    cells = hash_partition_map(li, ["l_partkey"], per_part)

    if not small_part:
        part_ds = read_parquet(sf_dir, "part", columns=["p_partkey", "p_brand"])

        def as_partkey(df: pd.DataFrame) -> pd.DataFrame:
            return df.rename(columns={"p_partkey": "l_partkey"})

        joined = shuffle_join(
            cells,
            part_ds.map_batches(as_partkey, batch_format="pandas"),
            on="l_partkey",
            left_cols=["l_partkey", "cents"],
            right_cols=["l_partkey", "p_brand"],
        )
        cells = joined.map_batches(
            lambda df: df.groupby("p_brand", as_index=False).agg(
                revenue_cents=("cents", "sum"), n_items=("cents", "size")
            ),
            batch_format="pandas",
        )

    out = driver_agg(
        cells,
        lambda df: df,
        lambda df: df.groupby("p_brand", as_index=False)[
            ["revenue_cents", "n_items"]
        ].sum(),
    )
    out["revenue"] = round_col(out["revenue_cents"].to_numpy("float64") / 100.0, 2)
    return pa.table(
        {
            "p_brand": pa.array(out["p_brand"], pa.string()),
            "n_items": pa.array(out["n_items"].astype("int64"), pa.int64()),
            "revenue": pa.array(out["revenue"], pa.float64()),
        }
    )


PARTS_SMALL_QTY_SQL = """
WITH per_part AS (
  SELECT l_partkey, COUNT(*) AS cnt,
         SUM(CAST(l_quantity AS BIGINT)) AS qsum
  FROM lineitem GROUP BY l_partkey
),
small AS (
  SELECT l.l_partkey,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT) AS cents
  FROM lineitem l JOIN per_part a USING (l_partkey)
  WHERE 5 * CAST(l.l_quantity AS BIGINT) * a.cnt < a.qsum
)
SELECT p.p_brand,
       COUNT(*) AS n_items,
       SUM(s.cents) / 100.0 AS revenue
FROM small s JOIN part p ON s.l_partkey = p.p_partkey
GROUP BY p.p_brand
"""


# ------------------------------------------------- global total-order sort
_SORTED_HEAD_N = 100


def events_sorted_head(sf_dir: str):
    """First _SORTED_HEAD_N events in global (ts, event_id) order via Ray
    Data's NATIVE distributed sort — the one all-to-all operator the rest
    of the suite deliberately avoids (top-k wants per-partition heads +
    driver merge, the top_revenue_orders shape, which moves K rows instead
    of all of them).  This query exists to cover the total-order operator
    itself: the shape a sorted OUTPUT (time-ordered training shards,
    merge-ready parquet runs) genuinely needs, where every row must move
    anyway.  Range-partitioned sample sort under the hood; limit() then
    reads only the head blocks."""
    ds = read_parquet(sf_dir, "events", columns=["event_id", "ts"])
    head = ds.sort(["ts", "event_id"]).limit(_SORTED_HEAD_N)
    out = head.to_pandas()
    us = out["ts"].values.astype("datetime64[us]").astype("int64")
    return pa.table(
        {
            "event_id": pa.array(out["event_id"].astype("int64"), pa.int64()),
            "ts_us": pa.array(us, pa.int64()),
        }
    )


EVENTS_SORTED_HEAD_SQL = f"""
SELECT event_id, epoch_us(ts) AS ts_us
FROM events ORDER BY ts, event_id LIMIT {_SORTED_HEAD_N}
"""


# -------------------------------------------------- skyline (Pareto) query
def lineitem_skyline(sf_dir: str):
    """Skyline / Pareto-dominance query (Börzsönyi et al. 2001; the
    preference-query family PAPERS.md's top-k-skyline entry builds on):
    line items not dominated on (price minimized, quantity maximized) —
    row A dominates B iff price_A ≤ price_B ∧ qty_A ≥ qty_B with at least
    one strict.

    The skyline operator is NATURALLY mergeable — a globally non-dominated
    row is non-dominated in its own block, so skyline(∪blocks) =
    skyline(∪ local skylines): each block folds to its local skyline (a
    2-d skyline of n rows is the classic sort-by-(price asc, qty desc) +
    strictly-increasing-qty scan over DISTINCT value pairs; expected
    O(log n) survivors on independent dims), and the driver applies the
    same scan to the tiny union.  No exchange at all — the combiner
    pattern at its purest.  Duplicate (price, qty) rows all survive
    together (neither dominates the other: no strict inequality); money in
    exact integer cents, so dominance tests are integer compares.  SQL
    mirror: the textbook NOT EXISTS dominance query."""
    ds = read_parquet(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"],
    )

    def to_typed(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].values,
                "l_linenumber": df["l_linenumber"].values,
                "price_cents": np.rint(df["l_extendedprice"].values * 100).astype(
                    np.int64
                ),
                "qty": np.rint(df["l_quantity"].values).astype(np.int64),
            }
        )

    def local_skyline(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        pairs = (
            df[["price_cents", "qty"]]
            .drop_duplicates()
            .sort_values(["price_cents", "qty"], ascending=[True, False])
        )
        q = pairs["qty"].values
        # keep a distinct pair iff its qty strictly exceeds every earlier
        # pair's (earlier = price <, or price == with qty >): shifted
        # running max, vectorized
        cummax_before = np.concatenate(
            ([np.iinfo(np.int64).min], np.maximum.accumulate(q)[:-1])
        )
        kept = pairs[q > cummax_before]
        return df.merge(kept, on=["price_cents", "qty"], how="inner")

    out = driver_agg(
        ds.map_batches(to_typed, batch_format="pandas"), local_skyline, local_skyline
    )
    return pa.table(
        {
            "l_orderkey": pa.array(out["l_orderkey"].astype("int64"), pa.int64()),
            "l_linenumber": pa.array(
                out["l_linenumber"].astype("int64"), pa.int64()
            ),
            "price_cents": pa.array(out["price_cents"].astype("int64"), pa.int64()),
            "qty": pa.array(out["qty"].astype("int64"), pa.int64()),
        }
    )


LINEITEM_SKYLINE_SQL = """
WITH c AS (
  SELECT l_orderkey, l_linenumber,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_cents,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty
  FROM lineitem
)
SELECT * FROM c a
WHERE NOT EXISTS (
  SELECT 1 FROM c b
  WHERE b.price_cents <= a.price_cents AND b.qty >= a.qty
    AND (b.price_cents < a.price_cents OR b.qty > a.qty)
)
"""


# --------------------------------------------- TPC-H Q5: star-schema join
_Q5_REGION = "ASIA"
_Q5_DATE_LO = "1995-01-01"
_Q5_DATE_HI = "1997-01-01"  # exclusive


def lineitem_local_supplier_volume(sf_dir: str):
    """The TPC-H Q5 shape — revenue from orders where the supplier and the
    customer share a nation, per nation of one region, over a date range.
    Six tables: the classic star-schema plan is ONE fact×fact shuffle join
    (lineitem ⋈ date-filtered orders on orderkey) with every dimension
    broadcast (supplier→nation, customer→nation, nation→name, region
    filter folded into the nation map).  The correlated predicate
    s_nationkey = c_nationkey evaluates per joined row from the two
    broadcast maps; the rollup is 25-key driver reduce.

    Money exact: revenue = Σ cents(l_extendedprice)·(100 − disc100), an
    int64 in 10⁻⁴ dollars (`revenue_fix`), so partial-sum order cannot
    change a bit; the SQL mirror states the identical integer expression."""
    import pyarrow.parquet as _pq

    # dimension tables are read driver-side: plain pq.read_table, not a
    # Ray Data job per 25-row table (the customer_nation_rollup convention)
    nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = _pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    region_keys = set(reg.loc[reg["r_name"] == _Q5_REGION, "r_regionkey"])
    nation_name = {
        int(k): str(n)
        for k, n, rk in zip(nat["n_nationkey"], nat["n_name"], nat["n_regionkey"])
        if rk in region_keys
    }
    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cust = _pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    dims = broadcast(
        {
            "sup": dict(zip(sup["s_suppkey"].astype(int), sup["s_nationkey"].astype(int))),
            "cust": dict(zip(cust["c_custkey"].astype(int), cust["c_nationkey"].astype(int))),
            "nation": nation_name,
        }
    )

    lo = np.datetime64(_Q5_DATE_LO, "us").astype("int64")
    hi = np.datetime64(_Q5_DATE_HI, "us").astype("int64")
    orders = read_parquet(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def order_side(df: pd.DataFrame) -> pd.DataFrame:
        d = lookup_broadcast(dims)
        ts = df["o_orderdate"].values.astype("datetime64[us]").astype("int64")
        keep = (ts >= lo) & (ts < hi)
        g = df[keep]
        cnat = g["o_custkey"].map(d["cust"])
        # region filter folds in here: a customer outside the region's
        # nations can never contribute
        in_region = cnat.map(lambda k: k in d["nation"]).values
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].values[in_region],
                "c_nat": cnat.values[in_region].astype(np.int64),
            }
        )

    line = read_parquet(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    )

    def line_side(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(df["l_extendedprice"].values * 100).astype(np.int64)
        disc = np.rint(df["l_discount"].values * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].values,
                "l_suppkey": df["l_suppkey"].values,
                "rev_fix": cents * (100 - disc),
            }
        )

    joined = shuffle_join(
        line.map_batches(line_side, batch_format="pandas"),
        orders.map_batches(order_side, batch_format="pandas"),
        on="o_orderkey",
        left_cols=["o_orderkey", "l_suppkey", "rev_fix"],
        right_cols=["o_orderkey", "c_nat"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = lookup_broadcast(dims)
        snat = df["l_suppkey"].map(d["sup"]).values
        local = snat == df["c_nat"].values
        g = pd.DataFrame(
            {
                "n_name": df["c_nat"].values[local],
                "revenue_fix": df["rev_fix"].values[local],
            }
        )
        out = g.groupby("n_name", as_index=False)["revenue_fix"].sum()
        out["n_name"] = out["n_name"].map(d["nation"])
        return out

    out = driver_agg(
        joined,
        partial,
        lambda df: df.groupby("n_name", as_index=False)["revenue_fix"].sum(),
    ).sort_values(["revenue_fix", "n_name"], ascending=[False, True])
    return pa.table(
        {
            "n_name": pa.array(out["n_name"], pa.string()),
            "revenue_fix": pa.array(out["revenue_fix"].astype("int64"), pa.int64()),
        }
    )


LINEITEM_Q5_SQL = f"""
SELECT n.n_name,
       CAST(SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))) AS BIGINT)
         AS revenue_fix
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q5_REGION}'
  AND s.s_nationkey = c.c_nationkey
  AND o.o_orderdate >= TIMESTAMP '{_Q5_DATE_LO}'
  AND o.o_orderdate <  TIMESTAMP '{_Q5_DATE_HI}'
GROUP BY n.n_name
ORDER BY revenue_fix DESC, n_name
"""


# ------------------------------------------------------- Q21 waiting suppliers
# TPC-H Q21 adapted to the available columns: "late" = shipped more than
# _Q21_LATE_DAYS after the order date (the schema has no commit/receipt
# dates).  The interesting plan shape is the multi-EXISTS correlated
# subquery pair: EXISTS(another supplier in the order) AND NOT EXISTS
# (another LATE supplier in the order) — both decorrelate into per-order
# aggregates once lineitem is co-located by orderkey.
_Q21_LATE_DAYS = 60
_Q21_STATUS = "F"


def lineitem_waiting_suppliers(sf_dir: str):
    """Suppliers who were the SOLE late supplier of a multi-supplier
    finished order (the TPC-H Q21 shape), with how many such orders.

    Plan: ONE fact×fact shuffle join (lineitem ⋈ status-filtered orders on
    orderkey — the Q5 exchange) whose output partitions hold whole orders,
    so both EXISTS subqueries collapse into vectorized per-partition
    aggregates: per (order, supplier) late-flags, then per-order supplier
    and late-supplier counts, then the filter late & n_supp>=2 & n_late==1
    — no second pass over the fact table, no self-join.  Supplier counts
    are low-cardinality (suppliers ≪ lineitems) → driver fold; names
    attach from the driver-read supplier dimension."""
    import pyarrow.parquet as _pq

    sup = _pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas()
    name_of = dict(zip(sup["s_suppkey"].astype(int), sup["s_name"].astype(str)))

    orders = read_parquet(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderstatus"]
    )

    def order_side(df: pd.DataFrame) -> pd.DataFrame:
        g = df[df["o_orderstatus"] == _Q21_STATUS]
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].values,
                "odate_us": g["o_orderdate"].values.astype("datetime64[us]").astype(
                    "int64"
                ),
            }
        )

    line = read_parquet(
        sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey", "l_shipdate"]
    )

    def line_side(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderkey": df["l_orderkey"].values,
                "l_suppkey": df["l_suppkey"].values,
                "ship_us": df["l_shipdate"].values.astype("datetime64[us]").astype(
                    "int64"
                ),
            }
        )

    joined = shuffle_join(
        line.map_batches(line_side, batch_format="pandas"),
        orders.map_batches(order_side, batch_format="pandas"),
        on="o_orderkey",
        left_cols=["o_orderkey", "l_suppkey", "ship_us"],
        right_cols=["o_orderkey", "odate_us"],
    )

    late_us = _Q21_LATE_DAYS * 86_400_000_000

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "l_suppkey": pd.Series([], dtype="int64"),
                    "numwait": pd.Series([], dtype="int64"),
                }
            )
        late = (
            df["ship_us"].values.astype(np.int64)
            > df["odate_us"].values.astype(np.int64) + late_us
        ).astype(np.int64)
        g = (
            pd.DataFrame(
                {
                    "o_orderkey": df["o_orderkey"].values,
                    "l_suppkey": df["l_suppkey"].values,
                    "late": late,
                }
            )
            .groupby(["o_orderkey", "l_suppkey"], as_index=False)["late"]
            .max()
        )
        o = g.groupby("o_orderkey").agg(
            n_supp=("l_suppkey", "size"), n_late=("late", "sum")
        )
        g = g.merge(o, on="o_orderkey")
        w = g[(g["late"] == 1) & (g["n_supp"] >= 2) & (g["n_late"] == 1)]
        out = w.groupby("l_suppkey", as_index=False).size()
        return out.rename(columns={"size": "numwait"})

    out = driver_agg(
        joined,
        per_order,
        lambda df: df.groupby("l_suppkey", as_index=False)["numwait"].sum(),
    )
    return pa.table(
        {
            "s_name": pa.array(
                [name_of[int(k)] for k in out["l_suppkey"]], pa.string()
            ),
            "numwait": pa.array(out["numwait"].astype("int64"), pa.int64()),
        }
    )


LINEITEM_Q21_SQL = f"""
WITH ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL {_Q21_LATE_DAYS} DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE o.o_orderstatus = '{_Q21_STATUS}'
  GROUP BY 1, 2
),
ord AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM ls GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM ls JOIN ord USING (l_orderkey)
JOIN supplier s ON s.s_suppkey = ls.l_suppkey
WHERE ls.late = 1 AND ord.n_supp >= 2 AND ord.n_late = 1
GROUP BY s.s_name
"""


# ------------------------------------------- Q13 customer order distribution
def customer_order_distribution(sf_dir: str):
    """Distribution of per-customer order counts INCLUDING the zero bucket
    (the TPC-H Q13 left-outer-join shape).

    The outer join never materializes: orders hash-aggregate to per-custkey
    counts (high-cardinality → shuffle_agg), the counts-of-counts spectrum
    folds to the driver as mergeable partials (distinct c_count values grow
    ~log of the max count — the token-spectrum posture), and the zero bucket
    is arithmetic: total customers (a count combiner over the customer
    table) minus customers holding at least one order (the spectrum's own
    mass).  Exact integers throughout."""
    orders = read_parquet(sf_dir, "orders", columns=["o_custkey"])

    per_cust = shuffle_agg(
        orders,
        ["o_custkey"],
        lambda df: df.groupby("o_custkey", as_index=False).size(),
        lambda df: df.groupby("o_custkey", as_index=False)["size"].sum(),
    )

    def spectrum_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"c_count": df["size"].values.astype(np.int64)})
        out = g.groupby("c_count", as_index=False).size()
        return out.rename(columns={"size": "custdist"})

    spectrum = driver_agg(
        per_cust,
        spectrum_partial,
        lambda df: df.groupby("c_count", as_index=False)["custdist"].sum(),
    )

    n_customers = driver_agg(
        read_parquet(sf_dir, "customer", columns=["c_custkey"]),
        lambda df: pd.DataFrame({"n": [np.int64(len(df))]}),
        lambda df: df,
    )["n"].sum()
    zero = int(n_customers) - int(spectrum["custdist"].sum())
    out = pd.concat(
        [spectrum, pd.DataFrame({"c_count": [0], "custdist": [zero]})],
        ignore_index=True,
    )
    out = out[out["custdist"] > 0]
    return pa.table(
        {
            "c_count": pa.array(out["c_count"].astype("int64"), pa.int64()),
            "custdist": pa.array(out["custdist"].astype("int64"), pa.int64()),
        }
    )


CUSTOMER_ORDER_DIST_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c LEFT OUTER JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""


# --------------------------------------------------------- event-type pivot
_PIVOT_TYPES = ["click", "view", "purchase", "signup", "error"]
_DAY_US = 86_400_000_000


def events_type_pivot(sf_dir: str):
    """Per-day event-type PIVOT: one row per day, one count column per
    event type plus the purchase value sum — the conditional-aggregation
    rewrite of PIVOT (wide layout from a long table).  Pivoting is just a
    grouped aggregate whose columns are predicates, so the shuffle_agg
    partials are already wide: each block ships one row per day, not one
    per (day, type).  Day cardinality grows with the time span →
    hash-shuffle path (the events_hourly posture)."""
    ds = read_parquet(sf_dir, "events", columns=["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].values.astype("datetime64[us]").astype("int64") // _DAY_US
        types = df["event_type"].values
        d = pd.DataFrame({"day": day})
        for t in _PIVOT_TYPES:
            d[f"n_{t}"] = (types == t).astype(np.int64)
        d["pv"] = np.where(types == "purchase", df["value"].values, 0.0)
        return d.groupby("day", as_index=False).sum()

    out = collect_arrow(
        shuffle_agg(
            ds,
            ["day"],
            partial,
            lambda df: df.groupby("day", as_index=False).sum(),
        ),
        pa.schema(
            [("day", pa.int64())]
            + [(f"n_{t}", pa.int64()) for t in _PIVOT_TYPES]
            + [("pv", pa.float64())]
        ),
    ).to_pandas()
    cols = {"day": pa.array(out["day"].astype("int64"), pa.int64())}
    for t in _PIVOT_TYPES:
        cols[f"n_{t}"] = pa.array(out[f"n_{t}"].astype("int64"), pa.int64())
    cols["purchase_value"] = round_col(out["pv"], 2)
    return pa.table(cols)


EVENTS_PIVOT_SQL = f"""
SELECT epoch_us(ts) // {_DAY_US} AS day,
  {", ".join(f"CAST(COUNT(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}" for t in _PIVOT_TYPES)},
  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0 END), 2)
    AS purchase_value
FROM events
GROUP BY day
"""


# --------------------------------------------- grouped exact quantiles
_GQ_QUANTILES = [0.25, 0.5, 0.75, 0.9]


def lineitem_quantity_quantiles(sf_dir: str):
    """EXACT per-group quantiles of l_quantity per l_returnflag, via
    value-count compaction: quantity is a small-domain integer (1..50), so
    each block folds to (flag, qty, count) partials whose total size is
    O(#flags × #distinct values × #blocks) — independent of row count —
    and the driver takes each group's cumulative-count rank ceil(q·n).
    The distributed exact-quantile recipe whenever the value domain
    compacts (integers, cents, bucketed floats); contrast with
    lineitem_price_quantiles, whose fixed-width histogram handles the
    non-compacting domain approximately.  Deterministic, exactly
    SQL-mirrorable (same rank rule in a window cumulative)."""
    import math

    ds = read_parquet(sf_dir, "lineitem", columns=["l_returnflag", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"].values,
                "qty": df["l_quantity"].values.astype(np.int64),
            }
        )
        return (
            g.groupby(["l_returnflag", "qty"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["l_returnflag", "qty"], as_index=False)["c"]
            .sum()
            .sort_values(["l_returnflag", "qty"])
        )
        rows = {"l_returnflag": [], "quantile": [], "qty": []}
        for flag, seg in g.groupby("l_returnflag"):
            cum = seg["c"].cumsum().to_numpy()
            qtys = seg["qty"].to_numpy()
            n = int(cum[-1])
            for q in _GQ_QUANTILES:
                rank = math.ceil(q * n)
                rows["l_returnflag"].append(flag)
                rows["quantile"].append(q)
                rows["qty"].append(int(qtys[int(np.searchsorted(cum, rank))]))
        return pd.DataFrame(rows)

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "l_returnflag": pa.array(out["l_returnflag"], pa.string()),
            "quantile": pa.array(out["quantile"], pa.float64()),
            "qty": pa.array(out["qty"], pa.int64()),
        }
    )


LINEITEM_GQ_SQL = f"""
WITH b AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
n AS (SELECT l_returnflag, SUM(c) AS n FROM b GROUP BY 1),
cum AS (
  SELECT l_returnflag, qty,
         SUM(c) OVER (PARTITION BY l_returnflag ORDER BY qty) AS cc
  FROM b
),
qs AS (SELECT unnest([{", ".join(str(q) for q in _GQ_QUANTILES)}]) AS quantile)
SELECT n.l_returnflag, qs.quantile, CAST(MIN(cum.qty) AS BIGINT) AS qty
FROM qs CROSS JOIN n
JOIN cum ON cum.l_returnflag = n.l_returnflag
        AND cum.cc >= ceiling(qs.quantile * n.n)
GROUP BY 1, 2
"""


# ------------------------------------------------------------- Q3 shape
_Q3_SEGMENT = "BUILDING"
_Q3_DATE = "1995-03-15"


def segment_top_orders(sf_dir: str):
    """Top-10 unshipped-revenue orders for one market segment (the TPC-H Q3
    three-table join + grouped-revenue + global-top-k shape).

    customer is the SMALL side (filtered to one segment, key column only) →
    broadcast semi-join inside the orders scan; orders×lineitem is the
    LARGE×LARGE leg → ONE hash exchange on orderkey (shuffle_join), revenue
    summed in exact integer hundredths-of-cents per partition, per-partition
    top-10 partials merged on the driver (10 rows × #partitions).  No float
    crosses the exchange, so accumulation order is irrelevant."""
    cutoff = np.datetime64(_Q3_DATE, "us")

    seg_keys = driver_agg(
        read_parquet(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"]),
        lambda df: df.loc[df["c_mktsegment"] == _Q3_SEGMENT, ["c_custkey"]],
        lambda df: df,
    )
    seg_ref = broadcast(set(seg_keys["c_custkey"].astype(np.int64).tolist()))

    orders = read_parquet(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def open_orders(df: pd.DataFrame) -> pd.DataFrame:
        keys = lookup_broadcast(seg_ref)
        d = df[
            (df["o_orderdate"].values.astype("datetime64[us]") < cutoff)
            & df["o_custkey"].isin(keys)
        ]
        return pd.DataFrame(
            {
                "l_orderkey": d["o_orderkey"].values.astype(np.int64),
                "o_orderdate": d["o_orderdate"].values.astype("datetime64[us]"),
            }
        )

    open_o = orders.map_batches(
        arrow_out(open_orders), batch_format="pandas", batch_size=None
    )

    li = read_parquet(
        sf_dir,
        "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def late_items(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_shipdate"].values.astype("datetime64[us]") > cutoff]
        # exact integer hundredths of cents: price has 2 decimals, discount 2
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].values.astype(np.int64),
                "rev_cc": price_c * (100 - disc_c),
            }
        )

    late = li.map_batches(
        arrow_out(late_items), batch_format="pandas", batch_size=None
    )

    joined = shuffle_join(
        late,
        open_o,
        on="l_orderkey",
        left_cols=["l_orderkey", "rev_cc"],
        right_cols=["l_orderkey", "o_orderdate"],
    )

    def part_topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["l_orderkey", "rev_cc", "o_orderdate"]]
        g = df.groupby(["l_orderkey", "o_orderdate"], as_index=False)[
            "rev_cc"
        ].sum()
        return g.sort_values(
            ["rev_cc", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(10)

    out = driver_agg(
        joined,
        part_topk,
        lambda df: df.sort_values(
            ["rev_cc", "l_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(10),
    )
    return pa.table(
        {
            "l_orderkey": pa.array(out["l_orderkey"].astype("int64"), pa.int64()),
            "revenue": pa.array(
                (out["rev_cc"].astype("int64") / 10000.0).round(2), pa.float64()
            ),
            "o_orderdate": pa.array(
                out["o_orderdate"].values.astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
        }
    )


SEGMENT_TOP_ORDERS_SQL = f"""
SELECT l_orderkey,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS revenue,
       o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = '{_Q3_SEGMENT}'
  AND o.o_orderdate < TIMESTAMP '{_Q3_DATE}'
  AND l.l_shipdate > TIMESTAMP '{_Q3_DATE}'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) DESC,
         l_orderkey
LIMIT 10
"""


# ------------------------------------------------------------ Q14 shape
_Q14_FROM = "1995-09-01"
_Q14_TO = "1995-10-01"


def promo_revenue_share(sf_dir: str):
    """Promotion revenue share for one month (the TPC-H Q14 broadcast-join +
    conditional-aggregate shape): part is the classic SMALL dimension →
    its promo flag broadcasts once as a keyset (at 100 TB part is ~1/1000
    of lineitem; the keyset is partkeys whose p_type starts with PROMO),
    the lineitem scan folds two exact-integer sums per block, the driver
    adds scalars.  ZERO exchanges.  Share reported in integer millionths
    (exact floor division) so the oracle compare is bit-stable."""
    promo = driver_agg(
        read_parquet(sf_dir, "part", columns=["p_partkey", "p_type"]),
        lambda df: df.loc[
            df["p_type"].str.startswith("PROMO"), ["p_partkey"]
        ],
        lambda df: df,
    )
    promo_ref = broadcast(set(promo["p_partkey"].astype(np.int64).tolist()))
    lo = np.datetime64(_Q14_FROM, "us")
    hi = np.datetime64(_Q14_TO, "us")

    li = read_parquet(
        sf_dir,
        "lineitem",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].values.astype("datetime64[us]")
        d = df[(ship >= lo) & (ship < hi)]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        is_promo = d["l_partkey"].isin(lookup_broadcast(promo_ref)).values
        return pd.DataFrame(
            {"promo_cc": [rev[is_promo].sum()], "total_cc": [rev.sum()]}
        )

    tot = driver_agg(li, partial, lambda df: df.sum())
    promo_cc, total_cc = int(tot["promo_cc"]), int(tot["total_cc"])
    share_ppm = (1_000_000 * promo_cc) // total_cc if total_cc else 0
    return pa.table(
        {
            "promo_share_ppm": pa.array([share_ppm], pa.int64()),
            "promo_revenue": pa.array([round(promo_cc / 10000.0, 2)], pa.float64()),
            "total_revenue": pa.array([round(total_cc / 10000.0, 2)], pa.float64()),
        }
    )


PROMO_REVENUE_SQL = f"""
WITH j AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_cc,
         (p_type LIKE 'PROMO%') AS is_promo
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{_Q14_FROM}'
    AND l_shipdate < TIMESTAMP '{_Q14_TO}'
)
SELECT CAST((1000000 * SUM(CASE WHEN is_promo THEN rev_cc ELSE 0 END))
         // SUM(rev_cc) AS BIGINT) AS promo_share_ppm,
       ROUND(SUM(CASE WHEN is_promo THEN rev_cc ELSE 0 END) / 10000.0, 2)
         AS promo_revenue,
       ROUND(SUM(rev_cc) / 10000.0, 2) AS total_revenue
FROM j
"""


# --------------------------------------------- Q22 shape with a Bloom filter
_BLOOM_M = 1 << 22  # bits (512 KiB packed) — sized for ~10^5 distinct keys
_BLOOM_K = 4  # hash functions; FP ~7e-5 at 10^5 keys


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer (Steele et al. 2014, public domain) — the
    standard 64-bit integer mix; vectorized, uint64 wraparound is the
    intended arithmetic."""
    x = x.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def _bloom_positions(keys: np.ndarray) -> np.ndarray:
    """k bit positions per key, shape (len(keys), k).  Kirsch-Mitzenmacher
    double hashing: pos_i = (h1 + i*h2) mod m — two mixes give k
    independent-enough probes (Kirsch & Mitzenmacher 2006)."""
    h1 = _splitmix64(keys)
    h2 = _splitmix64(keys ^ np.uint64(0xA5A5A5A5A5A5A5A5)) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    with np.errstate(over="ignore"):
        return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(_BLOOM_M)).astype(
            np.int64
        )


def _bloom_pack(positions: np.ndarray) -> np.ndarray:
    bm = np.zeros(_BLOOM_M // 8, dtype=np.uint8)
    flat = positions.ravel()
    np.bitwise_or.at(bm, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
    return bm


def _bloom_test(bm: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """True where ALL k bits are set (key maybe-present)."""
    bits = (bm[positions >> 3] >> (positions & 7).astype(np.uint8)) & 1
    return bits.all(axis=1)


_DORMANT_CUTOFF = "2000-07-01"


def customers_no_orders_bloom(sf_dir: str):
    """High-balance DORMANT customers — no orders on/after the cutoff date —
    per nation (the TPC-H Q22 anti-join shape) with a broadcast BLOOM FILTER
    pruning the anti-join's probe side before the exchange.

    Three narrow passes, one small exchange:
      1. exact positive-balance average as integer scalars (sum-cents, n) —
         the qualifying predicate is the cross-multiplied integer compare
         ``cents*n > sum_cents``, so no float boundary can disagree with
         the SQL oracle;
      2. orders fold to a 512-KiB Bloom bitmap (mergeable: per-block packed
         bitmaps OR-reduced on the driver — the HLL posture with bits
         instead of registers).  A Bloom filter has no false negatives, so
         a qualifying customer whose probes MISS is proven order-less and
         skips the exchange entirely;
      3. only maybe-present customers travel: union with per-block-distinct
         order custkeys, ONE hash exchange on custkey, per-partition exact
         anti (drops the Bloom's ~7e-5 false positives), tiny driver
         rollup by nation (25 groups).

    At 10^10 orders the bitmap scales as distinct-custkeys bits (m ≈ 10n
    for 1% FP) and merges as a tree reduce; the win is that the CUSTOMER
    side of the exchange shrinks to true-order-holders + εn instead of
    every qualifying row.  In TPC-H data most customers do hold orders, so
    the pruning is modest here — the pattern's payoff is probe-miss-heavy
    anti/semi joins (e.g. decontamination screens); measured prune fraction
    is asserted > 0 in tests/test_relational_features.py."""
    cust = read_parquet(
        sf_dir, "customer", columns=["c_custkey", "c_nationkey", "c_acctbal"]
    )

    # pass 1: exact threshold scalars
    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].values * 100).astype(np.int64)
        pos = cents[cents > 0]
        return pd.DataFrame({"s": [pos.sum()], "n": [np.int64(len(pos))]})

    tot = driver_agg(cust, bal_partial, lambda df: df.sum())
    sum_cents, n_pos = int(tot["s"]), int(tot["n"])

    # pass 2: mergeable Bloom bitmap over RECENT order custkeys
    cut = np.datetime64(_DORMANT_CUTOFF, "us")
    orders = read_parquet(sf_dir, "orders", columns=["o_custkey", "o_orderdate"])

    def bloom_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_orderdate"].values.astype("datetime64[us]") >= cut]
        keys = np.unique(d["o_custkey"].values.astype(np.int64))
        bm = _bloom_pack(_bloom_positions(keys.astype(np.uint64)))
        return pd.DataFrame({"bm": [bm.tobytes()]})

    merged = driver_agg(
        orders,
        bloom_partial,
        lambda df: pd.DataFrame(
            {
                "bm": [
                    np.bitwise_or.reduce(
                        np.stack(
                            [np.frombuffer(b, dtype=np.uint8) for b in df["bm"]]
                        ),
                        axis=0,
                    ).tobytes()
                ]
            }
        ),
    )
    bloom_ref = broadcast(np.frombuffer(merged["bm"].iloc[0], dtype=np.uint8))

    # pass 3: qualify + probe; bloom-miss rows are final immediately
    def qualify(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.round(df["c_acctbal"].values * 100).astype(np.int64)
        keep = cents * np.int64(n_pos) > np.int64(sum_cents)
        df = df[keep].copy()
        if not len(df):
            return pd.DataFrame(
                {"c_custkey": pd.Series([], dtype="int64"),
                 "c_nationkey": pd.Series([], dtype="int64"),
                 "cents": pd.Series([], dtype="int64"),
                 "maybe": pd.Series([], dtype="int64")}
            )
        bm = lookup_broadcast(bloom_ref)
        hit = _bloom_test(bm, _bloom_positions(df["c_custkey"].values.astype(np.uint64)))
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"].values.astype(np.int64),
                "c_nationkey": df["c_nationkey"].values.astype(np.int64),
                "cents": np.round(df["c_acctbal"].values * 100).astype(np.int64),
                "maybe": hit.astype(np.int64),
            }
        )

    qualified = cust.map_batches(
        arrow_out(qualify), batch_format="pandas", batch_size=None
    )

    def cust_side(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["maybe"] == 1]
        return pd.DataFrame(
            {
                "c_custkey": d["c_custkey"].values,
                "c_nationkey": d["c_nationkey"].values,
                "cents": d["cents"].values,
                "side": np.zeros(len(d), dtype=np.int64),
            }
        )

    def order_side(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["o_orderdate"].values.astype("datetime64[us]") >= cut]
        keys = np.unique(d["o_custkey"].values.astype(np.int64))
        return pd.DataFrame(
            {
                "c_custkey": keys,
                "c_nationkey": np.zeros(len(keys), dtype=np.int64),
                "cents": np.zeros(len(keys), dtype=np.int64),
                "side": np.ones(len(keys), dtype=np.int64),
            }
        )

    both = qualified.map_batches(
        arrow_out(cust_side), batch_format="pandas", batch_size=None
    ).union(
        orders.map_batches(arrow_out(order_side), batch_format="pandas", batch_size=None)
    )

    def anti(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["c_nationkey", "cents"]]
        holders = set(df.loc[df["side"] == 1, "c_custkey"].values.tolist())
        d = df[(df["side"] == 0) & ~df["c_custkey"].isin(holders)]
        return d[["c_nationkey", "cents"]]

    anti_rows = hash_partition_map(both, ["c_custkey"], arrow_out(anti))

    # bloom-miss rows (maybe == 0) are definite antis — no exchange needed
    def miss_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["maybe"] == 0]
        return d[["c_nationkey", "cents"]]

    misses = qualified.map_batches(
        arrow_out(miss_rows), batch_format="pandas", batch_size=None
    )

    def roll_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_nationkey", as_index=False).agg(
            numcust=("cents", "size"), cents=("cents", "sum")
        )
        return g

    out = driver_agg(
        anti_rows.union(misses),
        roll_partial,
        lambda df: df.groupby("c_nationkey", as_index=False).sum(),
    )
    return pa.table(
        {
            "c_nationkey": pa.array(out["c_nationkey"].astype("int64"), pa.int64()),
            "numcust": pa.array(out["numcust"].astype("int64"), pa.int64()),
            "totacctbal": pa.array(
                (out["cents"].astype("int64") / 100.0).round(2), pa.float64()
            ),
        }
    )


CUSTOMERS_NO_ORDERS_SQL = f"""
WITH pos AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0
)
SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) / 100.0, 2)
         AS totacctbal
FROM customer, pos
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c_custkey
      AND o.o_orderdate >= TIMESTAMP '{_DORMANT_CUTOFF}'
  )
GROUP BY 1
"""


# ------------------------------------------------------------ Q18 shape
_Q18_QTY = 250


def large_volume_orders(sf_dir: str):
    """Orders whose total line quantity exceeds a threshold, with their
    customer — the TPC-H Q18 HAVING-SUM + join-back shape, top-100.

    Quantity sums travel ONE hash exchange on orderkey (partial per-block
    groupby first, so the exchange carries one row per (orderkey, block));
    qualifying orderkeys stay a dataset and shuffle-join back to orders on
    the SAME key.  The global top-100 (totalprice desc — in exact cents —
    then orderdate, orderkey) merges 100-row per-partition partials on the
    driver, and only the ≤100 winning custkeys' names are fetched via a
    parquet predicate-pushdown read — the customer table itself never
    loads.  Quantities are integral in this corpus; summed as int64 so no
    float crosses the exchange."""
    li = read_parquet(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", as_index=False)["l_quantity"].sum()
        return pd.DataFrame(
            {
                "l_orderkey": g["l_orderkey"].values.astype(np.int64),
                "qty": np.round(g["l_quantity"].values).astype(np.int64),
            }
        )

    def qty_final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        g = df.groupby("l_orderkey", as_index=False)["qty"].sum()
        return g[g["qty"] > _Q18_QTY]

    big = shuffle_agg(li, ["l_orderkey"], qty_partial, arrow_out(qty_final))

    orders = read_parquet(
        sf_dir, "orders",
        columns=["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"],
    )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].values.astype(np.int64),
                "o_custkey": df["o_custkey"].values.astype(np.int64),
                "price_c": np.round(df["o_totalprice"].values * 100).astype(
                    np.int64
                ),
                "o_orderdate": df["o_orderdate"].values.astype("datetime64[us]"),
            }
        )

    op = orders.map_batches(
        arrow_out(o_proj), batch_format="pandas", batch_size=None
    )
    joined = shuffle_join(
        big,
        op,
        on="l_orderkey",
        left_cols=["l_orderkey", "qty"],
        right_cols=["l_orderkey", "o_custkey", "price_c", "o_orderdate"],
    )

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["price_c", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True],
            kind="mergesort",
        ).head(100)

    out = driver_agg(joined, topk, topk)

    import pyarrow.parquet as pq

    custkeys = sorted({int(k) for k in out["o_custkey"]})
    names = {}
    if custkeys:
        nt = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name"],
            filters=[("c_custkey", "in", custkeys)],
        )
        names = dict(
            zip(nt["c_custkey"].to_pylist(), nt["c_name"].to_pylist())
        )
    return pa.table(
        {
            "c_name": pa.array(
                [names[int(k)] for k in out["o_custkey"]], pa.string()
            ),
            "c_custkey": pa.array(out["o_custkey"].astype("int64"), pa.int64()),
            "o_orderkey": pa.array(out["l_orderkey"].astype("int64"), pa.int64()),
            "o_orderdate": pa.array(
                out["o_orderdate"].values.astype("datetime64[us]"),
                pa.timestamp("us"),
            ),
            "o_totalprice": pa.array(
                (out["price_c"].astype("int64") / 100.0).round(2), pa.float64()
            ),
            "total_qty": pa.array(out["qty"].astype("int64"), pa.int64()),
        }
    )


LARGE_VOLUME_SQL = f"""
SELECT c_name,
       CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       o_orderdate,
       ROUND(o_totalprice, 2) AS o_totalprice,
       CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(CAST(ROUND(l_quantity) AS BIGINT)) > {_Q18_QTY}
ORDER BY CAST(ROUND(o_totalprice * 100) AS BIGINT) DESC, o_orderdate, o_orderkey
LIMIT 100
"""


# ------------------------------------------------------------ Q15 shape
_Q15_FROM = "1996-01-01"
_Q15_TO = "1996-04-01"


def top_supplier_revenue(sf_dir: str):
    """Suppliers whose quarterly revenue EQUALS the global maximum — the
    TPC-H Q15 view + argmax shape (ties kept, like the spec's subquery).

    Per-supplier totals travel one hash exchange on suppkey (partial
    per-block groupby first); the global max is then a SCALAR driver
    reduce over that already-aggregated dataset (one row per supplier per
    partition — tiny), never over lineitem.  Winning suppliers (≥1 row,
    ~always 1) fetch their names via parquet predicate pushdown.  Revenue
    in exact integer hundredths-of-cents end to end; the float division
    happens once, on the final ≤handful of rows."""
    lo = np.datetime64(_Q15_FROM, "us")
    hi = np.datetime64(_Q15_TO, "us")
    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].values.astype("datetime64[us]")
        d = df[(ship >= lo) & (ship < hi)]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        g = pd.DataFrame(
            {
                "s_suppkey": d["l_suppkey"].values.astype(np.int64),
                "rev_cc": price_c * (100 - disc_c),
            }
        ).groupby("s_suppkey", as_index=False)["rev_cc"].sum()
        return g

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df.groupby("s_suppkey", as_index=False)["rev_cc"].sum()

    totals = shuffle_agg(li, ["s_suppkey"], partial, arrow_out(final))
    winners = driver_agg(
        totals,
        lambda df: df[df["rev_cc"] == df["rev_cc"].max()] if len(df) else df,
        lambda df: df[df["rev_cc"] == df["rev_cc"].max()].sort_values(
            "s_suppkey"
        ),
    )

    import pyarrow.parquet as pq

    keys = sorted(int(k) for k in winners["s_suppkey"])
    names = {}
    if keys:
        nt = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name"],
            filters=[("s_suppkey", "in", keys)],
        )
        names = dict(zip(nt["s_suppkey"].to_pylist(), nt["s_name"].to_pylist()))
    return pa.table(
        {
            "s_suppkey": pa.array(
                winners["s_suppkey"].astype("int64"), pa.int64()
            ),
            "s_name": pa.array(
                [names[int(k)] for k in winners["s_suppkey"]], pa.string()
            ),
            "total_revenue": pa.array(
                (winners["rev_cc"].astype("int64") / 10000.0).round(2),
                pa.float64(),
            ),
        }
    )


TOP_SUPPLIER_SQL = f"""
WITH rev AS (
  SELECT CAST(l_suppkey AS BIGINT) AS s_suppkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_cc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{_Q15_FROM}'
    AND l_shipdate < TIMESTAMP '{_Q15_TO}'
  GROUP BY 1
)
SELECT r.s_suppkey, s.s_name, ROUND(r.rev_cc / 10000.0, 2) AS total_revenue
FROM rev r JOIN supplier s ON r.s_suppkey = s.s_suppkey
WHERE r.rev_cc = (SELECT MAX(rev_cc) FROM rev)
ORDER BY r.s_suppkey
"""


# ------------------------------------------------------------- Q7 shape
_Q7_NATIONS = ("NATION_1", "NATION_2")
_Q7_FROM = "1995-01-01"
_Q7_TO = "1996-12-31"


def nation_trade_volume(sf_dir: str):
    """Shipping volume between two nations by (supplier nation, customer
    nation, year) — the TPC-H Q7 two-dimension-join shape.

    Supplier is the smallest table: its (suppkey → nation) map for JUST
    the two nations broadcasts once and turns the supplier join into a
    semi-filter inside the lineitem scan.  Customer is too large to
    broadcast at the design point, so it takes the honest path: lineitem
    (pre-filtered, with supp_nation + year attached) shuffle-joins orders
    on orderkey, then the result shuffle-joins the two-nation slice of
    customer on custkey — two exchanges, both on the natural keys.  The
    4-pair × few-years rollup is a driver reduce.  Revenue in exact
    integer hundredths-of-cents across both exchanges."""
    lo = np.datetime64(_Q7_FROM, "us")
    hi = np.datetime64(_Q7_TO + "T23:59:59.999999", "us")

    nat = driver_agg(
        read_parquet(sf_dir, "nation", columns=["n_nationkey", "n_name"]),
        lambda df: df[df["n_name"].isin(list(_Q7_NATIONS))],
        lambda df: df,
    )
    nkeys = dict(
        zip(nat["n_nationkey"].astype(np.int64), nat["n_name"])
    )
    supp = driver_agg(
        read_parquet(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"]),
        lambda df: df[df["s_nationkey"].isin(list(nkeys))],
        lambda df: df,
    )
    supp_ref = broadcast(
        {
            int(k): nkeys[int(n)]
            for k, n in zip(supp["s_suppkey"], supp["s_nationkey"])
        }
    )

    li = read_parquet(
        sf_dir, "lineitem",
        columns=[
            "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
            "l_shipdate",
        ],
    )

    def li_pass(df: pd.DataFrame) -> pd.DataFrame:
        smap = lookup_broadcast(supp_ref)
        ship = df["l_shipdate"].values.astype("datetime64[us]")
        d = df[(ship >= lo) & (ship <= hi) & df["l_suppkey"].isin(smap)]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].values.astype(np.int64),
                "supp_nation": d["l_suppkey"].map(smap).values,
                "l_year": d["l_shipdate"]
                .dt.year.values.astype(np.int64),
                "rev_cc": price_c * (100 - disc_c),
            }
        )

    lif = li.map_batches(arrow_out(li_pass), batch_format="pandas", batch_size=None)

    orders = read_parquet(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].values.astype(np.int64),
                "o_custkey": df["o_custkey"].values.astype(np.int64),
            }
        )

    op = orders.map_batches(
        arrow_out(o_proj), batch_format="pandas", batch_size=None
    )
    j1 = shuffle_join(
        lif,
        op,
        on="l_orderkey",
        left_cols=["l_orderkey", "supp_nation", "l_year", "rev_cc"],
        right_cols=["l_orderkey", "o_custkey"],
    )

    cust = read_parquet(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def c_slice(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_nationkey"].isin(list(nkeys))]
        return pd.DataFrame(
            {
                "o_custkey": d["c_custkey"].values.astype(np.int64),
                "cust_nation": d["c_nationkey"].map(
                    {k: v for k, v in nkeys.items()}
                ).values,
            }
        )

    cp = cust.map_batches(
        arrow_out(c_slice), batch_format="pandas", batch_size=None
    )
    j2 = shuffle_join(
        j1,
        cp,
        on="o_custkey",
        left_cols=["o_custkey", "supp_nation", "l_year", "rev_cc"],
        right_cols=["o_custkey", "cust_nation"],
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["supp_nation"] != df["cust_nation"]]
        if not len(d):
            return pd.DataFrame(
                {
                    "supp_nation": pd.Series([], dtype=object),
                    "cust_nation": pd.Series([], dtype=object),
                    "l_year": pd.Series([], dtype=np.int64),
                    "rev_cc": pd.Series([], dtype=np.int64),
                }
            )
        return d.groupby(
            ["supp_nation", "cust_nation", "l_year"], as_index=False
        )["rev_cc"].sum()

    out = driver_agg(
        j2,
        pair_partial,
        lambda df: df.groupby(
            ["supp_nation", "cust_nation", "l_year"], as_index=False
        )["rev_cc"]
        .sum()
        .sort_values(["supp_nation", "cust_nation", "l_year"]),
    )
    return pa.table(
        {
            "supp_nation": pa.array(out["supp_nation"], pa.string()),
            "cust_nation": pa.array(out["cust_nation"], pa.string()),
            "l_year": pa.array(out["l_year"].astype("int64"), pa.int64()),
            "revenue": pa.array(
                (out["rev_cc"].astype("int64") / 10000.0).round(2), pa.float64()
            ),
        }
    )


NATION_TRADE_SQL = f"""
SELECT sn.n_name AS supp_nation,
       cn.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = '{_Q7_NATIONS[0]}' AND cn.n_name = '{_Q7_NATIONS[1]}')
    OR (sn.n_name = '{_Q7_NATIONS[1]}' AND cn.n_name = '{_Q7_NATIONS[0]}'))
  AND l_shipdate BETWEEN TIMESTAMP '{_Q7_FROM}' AND TIMESTAMP '{_Q7_TO} 23:59:59.999999'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# ------------------------------------------------------------- Q19 shape
_Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#14", 1, 15, 20, 30),
)


def brand_filtered_revenue(sf_dir: str):
    """Revenue under a DISJUNCTION of (brand, size-range, quantity-range)
    conjunctions — the TPC-H Q19 multi-branch-predicate shape.

    The part-side predicate of each branch compiles to a broadcast
    partkey → branch-id map (each branch's qualifying parts are a small
    slice of an already-small dimension); the lineitem scan is then ONE
    vectorized pass that maps partkey → branch and applies that branch's
    quantity range — the whole disjunction evaluates without any join or
    exchange, and blocks fold to a single scalar partial.  Output in exact
    cents, divided once at the end."""
    parts = driver_agg(
        read_parquet(sf_dir, "part", columns=["p_partkey", "p_brand", "p_size"]),
        lambda df: df[
            np.logical_or.reduce(
                [
                    (df["p_brand"].values == b)
                    & (df["p_size"].values >= s_lo)
                    & (df["p_size"].values <= s_hi)
                    for b, s_lo, s_hi, _, _ in _Q19_BRANCHES
                ]
            )
        ],
        lambda df: df,
    )
    branch_of = {}
    for i, (b, s_lo, s_hi, _, _) in enumerate(_Q19_BRANCHES):
        m = (
            (parts["p_brand"] == b)
            & (parts["p_size"] >= s_lo)
            & (parts["p_size"] <= s_hi)
        )
        for k in parts.loc[m, "p_partkey"]:
            branch_of[int(k)] = i
    part_ref = broadcast(branch_of)
    q_lo = np.array([b[3] for b in _Q19_BRANCHES], dtype=np.float64)
    q_hi = np.array([b[4] for b in _Q19_BRANCHES], dtype=np.float64)

    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bmap = lookup_broadcast(part_ref)
        branch = df["l_partkey"].map(bmap).values
        hit = ~pd.isna(branch)
        d, branch = df[hit], branch[hit].astype(np.int64)
        qty = d["l_quantity"].values
        ok = (qty >= q_lo[branch]) & (qty <= q_hi[branch])
        d = d[ok]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        rev = price_c * (100 - disc_c)
        return pd.DataFrame(
            {"rev_cc": [rev.sum()], "n": [np.int64(len(d))]}
        )

    tot = driver_agg(li, partial, lambda df: df.sum())
    return pa.table(
        {
            "revenue": pa.array(
                [round(int(tot["rev_cc"]) / 10000.0, 2)], pa.float64()
            ),
            "n_items": pa.array([int(tot["n"])], pa.int64()),
        }
    )


BRAND_FILTERED_SQL = f"""
SELECT ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                 * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
             / 10000.0, 2) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE (p_brand = '{_Q19_BRANCHES[0][0]}' AND p_size BETWEEN {_Q19_BRANCHES[0][1]} AND {_Q19_BRANCHES[0][2]} AND l_quantity BETWEEN {_Q19_BRANCHES[0][3]} AND {_Q19_BRANCHES[0][4]})
   OR (p_brand = '{_Q19_BRANCHES[1][0]}' AND p_size BETWEEN {_Q19_BRANCHES[1][1]} AND {_Q19_BRANCHES[1][2]} AND l_quantity BETWEEN {_Q19_BRANCHES[1][3]} AND {_Q19_BRANCHES[1][4]})
   OR (p_brand = '{_Q19_BRANCHES[2][0]}' AND p_size BETWEEN {_Q19_BRANCHES[2][1]} AND {_Q19_BRANCHES[2][2]} AND l_quantity BETWEEN {_Q19_BRANCHES[2][3]} AND {_Q19_BRANCHES[2][4]})
"""


QUERIES = {
    "lineitem_pricing_summary": (lineitem_pricing_summary, LINEITEM_PRICING_SQL),
    "orders_by_nation": (orders_by_nation, ORDERS_BY_NATION_SQL),
    "lineitem_local_supplier_volume": (
        lineitem_local_supplier_volume,
        LINEITEM_Q5_SQL,
    ),
    "lineitem_skyline": (lineitem_skyline, LINEITEM_SKYLINE_SQL),
    "events_sliding_windows": (events_sliding_windows, EVENTS_SLIDING_SQL),
    "top_revenue_orders": (top_revenue_orders, TOP_REVENUE_SQL),
    "customer_nation_rollup": (customer_nation_rollup, CUSTOMER_NATION_SQL),
    "order_priority_counts": (order_priority_counts, ORDER_PRIORITY_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "user_sessions": (user_sessions, USER_SESSIONS_SQL),
    "orders_rank_window": (orders_rank_window, ORDERS_RANK_SQL),
    "orders_priority_rollup": (orders_priority_rollup, ORDERS_ROLLUP_SQL),
    "parts_small_qty_revenue": (parts_small_qty_revenue, PARTS_SMALL_QTY_SQL),
    "events_sorted_head": (events_sorted_head, EVENTS_SORTED_HEAD_SQL),
    "lineitem_waiting_suppliers": (lineitem_waiting_suppliers, LINEITEM_Q21_SQL),
    "customer_order_distribution": (
        customer_order_distribution,
        CUSTOMER_ORDER_DIST_SQL,
    ),
    "events_type_pivot": (events_type_pivot, EVENTS_PIVOT_SQL),
    "lineitem_quantity_quantiles": (lineitem_quantity_quantiles, LINEITEM_GQ_SQL),
    "segment_top_orders": (segment_top_orders, SEGMENT_TOP_ORDERS_SQL),
    "promo_revenue_share": (promo_revenue_share, PROMO_REVENUE_SQL),
    "customers_no_orders_bloom": (
        customers_no_orders_bloom,
        CUSTOMERS_NO_ORDERS_SQL,
    ),
    "large_volume_orders": (large_volume_orders, LARGE_VOLUME_SQL),
    "top_supplier_revenue": (top_supplier_revenue, TOP_SUPPLIER_SQL),
    "nation_trade_volume": (nation_trade_volume, NATION_TRADE_SQL),
    "brand_filtered_revenue": (brand_filtered_revenue, BRAND_FILTERED_SQL),
}
