"""Second wave of TPC-H-shape relational pipelines (Q2/Q8/Q10/Q11/Q12/Q16/Q17).

Same contract as pipelines/relational.py: every query is (ray_pipeline,
oracle_sql) with IDENTICAL column names and rounding; money travels as exact
int64 hundredths-of-cents (``price_c * (100 - disc_c)``) so parallel partial
sums associate freely and the single float division happens on the final tiny
result.  The corpus has no partsupp table and no commit/receipt dates, so the
four queries that need them (Q2, Q11, Q12, Q16) are adapted to the available
columns while keeping the distributed SHAPE that makes each interesting:

  * Q10  — selective fact filter -> ONE orderkey shuffle join -> custkey
           exchange -> driver top-k -> pushdown dimension fetch for winners.
  * Q17  — correlated per-part AVG subquery decorrelated by co-location:
           one partkey exchange makes the group-average and the
           below-threshold sum a single vectorized local pass.
  * Q8   — two-exchange star join (orderkey then custkey) with the three
           genuinely small dimensions (part keyset, supplier flag, nation
           region set) broadcast once.
  * Q12  — ONE orderkey exchange, vectorized date math, conditional counts.
  * Q11  — global-scalar HAVING threshold: the scalar folds from the SAME
           partials that feed the group exchange (no second fact pass).
  * Q16  — COUNT DISTINCT via per-block pair dedup -> group exchange ->
           local nunique, with a broadcast NOT-IN supplier blocklist.
  * Q2   — correlated per-part MIN over an integer unit cost, decorrelated
           by one partkey exchange; ties kept like the spec's subquery.
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

# ------------------------------------------------------------- Q10 shape
_Q10_FROM = "1995-10-01"
_Q10_TO = "1996-01-01"


def returned_item_customers(sf_dir: str):
    """Top-20 customers by revenue lost to returned items in one quarter —
    the TPC-H Q10 shape.

    The 'R' returnflag filter and the quarter filter prune both fact sides
    BEFORE the single orderkey shuffle join; revenue then takes a custkey
    exchange (partial per-block groupby first), per-partition top-20s merge
    on the driver, and only the ≤20 winners' customer rows (plus the tiny
    nation map, broadcast) are fetched via parquet predicate pushdown — the
    customer table never loads.  Revenue is exact int64 hundredths-of-cents
    end to end; ordering (rev desc, custkey) is therefore deterministic."""
    lo = np.datetime64(_Q10_FROM, "us")
    hi = np.datetime64(_Q10_TO, "us")

    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_returnflag"].values == "R"]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "l_orderkey": d["l_orderkey"].values.astype(np.int64),
                    "rev_cc": price_c * (100 - disc_c),
                }
            )
            .groupby("l_orderkey", as_index=False)["rev_cc"]
            .sum()
        )

    lrev = li.map_batches(
        arrow_out(li_partial), batch_format="pandas", batch_size=None
    )

    orders = read_parquet(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"].values.astype("datetime64[us]")
        d = df[(dt >= lo) & (dt < hi)]
        return pd.DataFrame(
            {
                "l_orderkey": d["o_orderkey"].values.astype(np.int64),
                "o_custkey": d["o_custkey"].values.astype(np.int64),
            }
        )

    op = orders.map_batches(arrow_out(o_proj), batch_format="pandas", batch_size=None)
    joined = shuffle_join(
        lrev, op, on="l_orderkey",
        left_cols=["l_orderkey", "rev_cc"],
        right_cols=["l_orderkey", "o_custkey"],
    )

    def c_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", as_index=False)["rev_cc"].sum()

    def c_final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        g = df.groupby("o_custkey", as_index=False)["rev_cc"].sum()
        return g.sort_values(
            ["rev_cc", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(20)

    top = driver_agg(
        shuffle_agg(joined, ["o_custkey"], c_partial, arrow_out(c_partial)),
        c_final,
        c_final,
    )

    import pyarrow.parquet as pq

    keys = sorted(int(k) for k in top["o_custkey"])
    attrs: dict[int, tuple] = {}
    if keys:
        ct = pq.read_table(
            f"{sf_dir}/customer.parquet",
            columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
            filters=[("c_custkey", "in", keys)],
        )
        nt = pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        )
        nmap = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
        for k, nm, ab, nk in zip(
            ct["c_custkey"].to_pylist(), ct["c_name"].to_pylist(),
            ct["c_acctbal"].to_pylist(), ct["c_nationkey"].to_pylist(),
        ):
            attrs[int(k)] = (nm, float(ab), nmap[nk])
    ck = [int(k) for k in top["o_custkey"]]
    return pa.table(
        {
            "c_custkey": pa.array(ck, pa.int64()),
            "c_name": pa.array([attrs[k][0] for k in ck], pa.string()),
            "revenue": pa.array(
                round_col(top["rev_cc"].astype("int64") / 10000.0, 2), pa.float64()
            ),
            "c_acctbal": pa.array([attrs[k][1] for k in ck], pa.float64()),
            "n_name": pa.array([attrs[k][2] for k in ck], pa.string()),
        }
    )


RETURNED_ITEM_SQL = f"""
WITH rev AS (
  SELECT CAST(o_custkey AS BIGINT) AS c_custkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev_cc
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{_Q10_FROM}'
    AND o_orderdate < TIMESTAMP '{_Q10_TO}'
  GROUP BY 1
  ORDER BY rev_cc DESC, c_custkey
  LIMIT 20
)
SELECT r.c_custkey, c.c_name, ROUND(r.rev_cc / 10000.0, 2) AS revenue,
       c.c_acctbal, n.n_name
FROM rev r
JOIN customer c ON r.c_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


# ------------------------------------------------------------- Q17 shape
_Q17_BRAND = "Brand#1"


def small_qty_avg_yearly(sf_dir: str):
    """Average yearly revenue lost if small-quantity orders (below 20% of
    the part's average order quantity) went unfilled — the TPC-H Q17
    correlated-AVG-subquery shape for one brand.

    The brand's partkeys broadcast once (part is the small dimension); ONE
    partkey exchange then co-locates each part's lineitems so the
    correlated subquery decorrelates into a vectorized local pass: per-part
    transform('sum')/('size') gives the group average and the qty <
    0.2*avg test becomes the exact integer inequality 5*qty*n < qty_sum
    (quantities are integral in this corpus).  Only one partial scalar per
    partition reaches the driver."""
    import pyarrow.parquet as pq

    pt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_brand", "=", _Q17_BRAND)],
    )
    keyset = broadcast(set(pt["p_partkey"].to_pylist()))

    li = read_parquet(
        sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"]
    )

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_partkey"].isin(lookup_broadcast(keyset)).values]
        return pd.DataFrame(
            {
                "l_partkey": d["l_partkey"].values.astype(np.int64),
                "qty": np.round(d["l_quantity"].values).astype(np.int64),
                "price_c": np.round(d["l_extendedprice"].values * 100).astype(
                    np.int64
                ),
            }
        )

    filtered = li.map_batches(arrow_out(pre), batch_format="pandas", batch_size=None)

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"sum_c": pd.Series([], dtype=np.int64)})
        g = df.groupby("l_partkey")["qty"]
        qty_sum = g.transform("sum").values
        n = g.transform("size").values
        keep = 5 * df["qty"].values * n < qty_sum
        return pd.DataFrame({"sum_c": [int(df["price_c"].values[keep].sum())]})

    parts = hash_partition_map(filtered, ["l_partkey"], arrow_out(per_part))
    tot = driver_agg(parts, lambda df: df, lambda df: df.sum())
    return pa.table(
        {
            "avg_yearly": pa.array(
                [round(int(tot["sum_c"]) / 100.0 / 7.0, 2)], pa.float64()
            )
        }
    )


SMALL_QTY_SQL = f"""
WITH l AS (
  SELECT l_partkey,
         CAST(ROUND(l_quantity) AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS price_c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = '{_Q17_BRAND}'
), w AS (
  SELECT price_c, qty,
         SUM(qty) OVER (PARTITION BY l_partkey) AS qty_sum,
         COUNT(*) OVER (PARTITION BY l_partkey) AS n
  FROM l
)
SELECT ROUND(COALESCE(SUM(price_c), 0) / 100.0 / 7.0, 2) AS avg_yearly
FROM w WHERE 5 * qty * n < qty_sum
"""


# -------------------------------------------------------------- Q8 shape
_Q8_NATION = "NATION_2"
_Q8_REGION = "ASIA"
_Q8_TYPE = "ECONOMY"


def nation_market_share(sf_dir: str):
    """Per-year market share of one supplying nation within one region's
    customers for one part type — the TPC-H Q8 star-join shape.

    Three genuinely small sides broadcast once: the type's partkey set,
    the supplier→is-nation flag map, and the region's nationkey set.  The
    two LARGE joins are hash exchanges: lineitem↔orders on orderkey, then
    ↔customer on custkey — at 100 TB neither orders nor customer is
    broadcastable, so both ride the repartition join on their natural
    keys.  Shares leave as exact integer ppm (floor division) plus rounded
    float revenues; the division happens once per year row on the driver."""
    import pyarrow.parquet as pq

    pt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey"],
        filters=[("p_type", "=", _Q8_TYPE)],
    )
    part_ref = broadcast(set(pt["p_partkey"].to_pylist()))

    st = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    nt = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name", "n_regionkey"]
    )
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    region_keys = {
        rk for rk, rn in zip(
            rt["r_regionkey"].to_pylist(), rt["r_name"].to_pylist()
        ) if rn == _Q8_REGION
    }
    nation_names = dict(
        zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist())
    )
    region_nations = broadcast(
        {
            nk for nk, rk in zip(
                nt["n_nationkey"].to_pylist(), nt["n_regionkey"].to_pylist()
            ) if rk in region_keys
        }
    )
    supp_flag = broadcast(
        {
            int(sk): nation_names[nk] == _Q8_NATION
            for sk, nk in zip(
                st["s_suppkey"].to_pylist(), st["s_nationkey"].to_pylist()
            )
        }
    )

    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
                 "l_discount"],
    )

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_partkey"].isin(lookup_broadcast(part_ref)).values]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        flags = lookup_broadcast(supp_flag)
        return pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].values.astype(np.int64),
                "rev_cc": price_c * (100 - disc_c),
                "is_nation": d["l_suppkey"].map(flags).values.astype(bool),
            }
        )

    lrev = li.map_batches(arrow_out(li_proj), batch_format="pandas", batch_size=None)

    orders = read_parquet(
        sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].values.astype(np.int64),
                "o_custkey": df["o_custkey"].values.astype(np.int64),
                "o_year": pd.DatetimeIndex(df["o_orderdate"]).year.values.astype(
                    np.int64
                ),
            }
        )

    op = orders.map_batches(arrow_out(o_proj), batch_format="pandas", batch_size=None)
    j1 = shuffle_join(
        lrev, op, on="l_orderkey",
        left_cols=["l_orderkey", "rev_cc", "is_nation"],
        right_cols=["l_orderkey", "o_custkey", "o_year"],
    )

    cust = read_parquet(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def c_proj(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["c_nationkey"].isin(lookup_broadcast(region_nations)).values]
        return pd.DataFrame(
            {"o_custkey": d["c_custkey"].values.astype(np.int64), "in_region": True}
        )

    cp = cust.map_batches(arrow_out(c_proj), batch_format="pandas", batch_size=None)
    j2 = shuffle_join(
        j1, cp, on="o_custkey",
        left_cols=["o_custkey", "rev_cc", "is_nation", "o_year"],
        right_cols=["o_custkey", "in_region"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame(
            {
                "o_year": df["o_year"].values,
                "nation_cc": np.where(df["is_nation"].values, df["rev_cc"].values, 0),
                "total_cc": df["rev_cc"].values,
            }
        )
        return g.groupby("o_year", as_index=False).sum()

    out = driver_agg(
        j2, partial, lambda df: df.groupby("o_year", as_index=False).sum()
    ).sort_values("o_year")
    share_ppm = np.where(
        out["total_cc"].values > 0,
        (1_000_000 * out["nation_cc"].values) // out["total_cc"].values,
        0,
    )
    return pa.table(
        {
            "o_year": pa.array(out["o_year"].astype("int64"), pa.int64()),
            "mkt_share_ppm": pa.array(share_ppm.astype("int64"), pa.int64()),
            "nation_revenue": pa.array(
                round_col(out["nation_cc"].astype("int64") / 10000.0, 2),
                pa.float64(),
            ),
            "total_revenue": pa.array(
                round_col(out["total_cc"].astype("int64") / 10000.0, 2),
                pa.float64(),
            ),
        }
    )


MARKET_SHARE_SQL = f"""
WITH j AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev_cc,
         (ns.n_name = '{_Q8_NATION}') AS is_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier s ON l_suppkey = s.s_suppkey
  JOIN nation ns ON s.s_nationkey = ns.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer c ON o_custkey = c.c_custkey
  JOIN nation nc ON c.c_nationkey = nc.n_nationkey
  JOIN region r ON nc.n_regionkey = r.r_regionkey
  WHERE p_type = '{_Q8_TYPE}' AND r.r_name = '{_Q8_REGION}'
)
SELECT o_year,
       CAST((1000000 * SUM(CASE WHEN is_nation THEN rev_cc ELSE 0 END))
            // SUM(rev_cc) AS BIGINT) AS mkt_share_ppm,
       ROUND(SUM(CASE WHEN is_nation THEN rev_cc ELSE 0 END) / 10000.0, 2)
         AS nation_revenue,
       ROUND(SUM(rev_cc) / 10000.0, 2) AS total_revenue
FROM j GROUP BY o_year ORDER BY o_year
"""


# ------------------------------------------------------------- Q12 shape
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def late_shipment_priority(sf_dir: str):
    """Urgent-vs-other order counts bucketed by ship delay — the TPC-H Q12
    conditional-count shape, adapted to the corpus (no shipmode/commit
    dates; the synthetic shipdate can even precede the order date, hence
    the 'early' bucket).

    ONE orderkey shuffle join, then the date math and the two conditional
    counts are a single vectorized pass per partition; 4 buckets × 2
    counters fold on the driver."""
    li = read_parquet(sf_dir, "lineitem", columns=["l_orderkey", "l_shipdate"])

    def li_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["l_orderkey"].values.astype(np.int64),
                "ship_us": df["l_shipdate"].values.astype("datetime64[us]").astype(
                    np.int64
                ),
            }
        )

    lp = li.map_batches(arrow_out(li_proj), batch_format="pandas", batch_size=None)

    orders = read_parquet(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].values.astype(np.int64),
                "order_us": df["o_orderdate"].values.astype("datetime64[us]").astype(
                    np.int64
                ),
                "high": df["o_orderpriority"].isin(_Q12_HIGH).values,
            }
        )

    op = orders.map_batches(arrow_out(o_proj), batch_format="pandas", batch_size=None)
    joined = shuffle_join(
        lp, op, on="l_orderkey",
        left_cols=["l_orderkey", "ship_us"],
        right_cols=["l_orderkey", "order_us", "high"],
    )
    day_us = 86_400_000_000

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        delay = (df["ship_us"].values - df["order_us"].values) // day_us
        bucket = np.full(len(df), "30-90", dtype=object)
        bucket[delay < 0] = "early"
        bucket[(delay >= 0) & (delay < 30)] = "<30"
        bucket[delay >= 90] = ">90"
        high = df["high"].values
        g = pd.DataFrame(
            {
                "delay_bucket": bucket,
                "high_line_count": high.astype(np.int64),
                "low_line_count": (~high).astype(np.int64),
            }
        )
        return g.groupby("delay_bucket", as_index=False).sum()

    out = driver_agg(
        joined, partial,
        lambda df: df.groupby("delay_bucket", as_index=False).sum(),
    ).sort_values("delay_bucket")
    return pa.table(
        {
            "delay_bucket": pa.array(out["delay_bucket"], pa.string()),
            "high_line_count": pa.array(
                out["high_line_count"].astype("int64"), pa.int64()
            ),
            "low_line_count": pa.array(
                out["low_line_count"].astype("int64"), pa.int64()
            ),
        }
    )


LATE_SHIPMENT_SQL = f"""
SELECT CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) < 0 THEN 'early'
            WHEN DATEDIFF('day', o_orderdate, l_shipdate) < 30 THEN '<30'
            WHEN DATEDIFF('day', o_orderdate, l_shipdate) < 90 THEN '30-90'
            ELSE '>90' END AS delay_bucket,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY delay_bucket ORDER BY delay_bucket
"""


# ------------------------------------------------------------- Q11 shape
# part qualifies if its revenue share exceeds 1.5x the average share —
# scale-independent (Q11's 0.0001/SF fraction, reformulated so the report
# is non-trivial at every sf) and exact: 2*n_parts*value > 3*total in int64.


def important_parts_value(sf_dir: str):
    """Parts holding an outsized share of total revenue — the TPC-H Q11
    global-scalar HAVING shape (value > 1.5x the mean part value), adapted
    to lineitem revenue since the corpus has no partsupp.

    The per-block partials feed BOTH consumers: the partkey hash exchange
    (group totals) and, crucially, the global threshold — which folds from
    per-PARTITION scalar sums of the already-aggregated exchange output,
    so the fact table is scanned exactly once.  The filtered report stays
    a Dataset until the final collect; everything compares in exact int64
    hundredths-of-cents."""
    li = read_parquet(
        sf_dir, "lineitem", columns=["l_partkey", "l_extendedprice", "l_discount"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        price_c = np.round(df["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(df["l_discount"].values * 100).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "p_partkey": df["l_partkey"].values.astype(np.int64),
                    "value_cc": price_c * (100 - disc_c),
                }
            )
            .groupby("p_partkey", as_index=False)["value_cc"]
            .sum()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        return df.groupby("p_partkey", as_index=False)["value_cc"].sum()

    totals = shuffle_agg(li, ["p_partkey"], partial, arrow_out(final)).materialize()
    scalar = driver_agg(
        totals,
        lambda df: pd.DataFrame(
            {"s": [int(df["value_cc"].sum())], "n": [len(df)]}
        ),
        lambda df: df.sum(),
    )
    total, n_parts = int(scalar["s"]), int(scalar["n"])
    thr_ref = broadcast((n_parts, total))

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        n, tot = lookup_broadcast(thr_ref)
        return df[2 * n * df["value_cc"].values > 3 * tot]

    out = collect_arrow(
        totals.map_batches(arrow_out(keep), batch_format="pandas", batch_size=None),
        pa.schema([("p_partkey", pa.int64()), ("value_cc", pa.int64())]),
    ).to_pandas().sort_values(
        ["value_cc", "p_partkey"], ascending=[False, True], kind="mergesort"
    )
    return pa.table(
        {
            "p_partkey": pa.array(out["p_partkey"].astype("int64"), pa.int64()),
            "value": pa.array(
                round_col(out["value_cc"].astype("int64") / 10000.0, 2),
                pa.float64(),
            ),
        }
    )


IMPORTANT_PARTS_SQL = """
WITH v AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS value_cc
  FROM lineitem GROUP BY 1
)
SELECT p_partkey, ROUND(value_cc / 10000.0, 2) AS value
FROM v
WHERE 2 * (SELECT COUNT(*) FROM v) * value_cc > 3 * (SELECT SUM(value_cc) FROM v)
ORDER BY value_cc DESC, p_partkey
"""


# ------------------------------------------------------------- Q16 shape
_Q16_EXCL_BRAND = "Brand#1"
_Q16_SIZES = (1, 2, 3, 4, 5, 6, 7, 8)


def parts_supplier_counts(sf_dir: str):
    """Distinct-supplier counts per (brand, type, size) for non-excluded
    parts, skipping blocklisted suppliers — the TPC-H Q16 COUNT DISTINCT +
    NOT IN shape (the complaint filter adapted to s_acctbal < 0).

    Part attributes broadcast once (the small dimension, as in Q14); the
    supplier blocklist is a pushdown-filtered read of only matching rows.
    Distinct pairs dedup per block FIRST, so the (brand, type, size) hash
    exchange carries at most |groups|×|suppliers| rows per block, then a
    local vectorized nunique finishes each group in one call."""
    import pyarrow.parquet as pq

    pt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    )
    attr = {
        int(k): (b, t, int(s))
        for k, b, t, s in zip(
            pt["p_partkey"].to_pylist(), pt["p_brand"].to_pylist(),
            pt["p_type"].to_pylist(), pt["p_size"].to_pylist(),
        )
        if b != _Q16_EXCL_BRAND and int(s) in _Q16_SIZES
    }
    attr_ref = broadcast(attr)
    bt = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey"],
        filters=[("s_acctbal", "<", 0.0)],
    )
    block_ref = broadcast(set(bt["s_suppkey"].to_pylist()))

    li = read_parquet(sf_dir, "lineitem", columns=["l_partkey", "l_suppkey"])

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        amap = lookup_broadcast(attr_ref)
        d = df[
            df["l_partkey"].isin(amap).values
            & ~df["l_suppkey"].isin(lookup_broadcast(block_ref)).values
        ].drop_duplicates()
        trip = d["l_partkey"].map(amap)
        return pd.DataFrame(
            {
                "p_brand": [t[0] for t in trip],
                "p_type": [t[1] for t in trip],
                "p_size": np.array([t[2] for t in trip], dtype=np.int64),
                "l_suppkey": d["l_suppkey"].values.astype(np.int64),
            }
        ).drop_duplicates()

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {
                    "p_brand": pd.Series([], dtype=object),
                    "p_type": pd.Series([], dtype=object),
                    "p_size": pd.Series([], dtype=np.int64),
                    "supplier_cnt": pd.Series([], dtype=np.int64),
                }
            )
        g = (
            df.groupby(["p_brand", "p_type", "p_size"], as_index=False)["l_suppkey"]
            .nunique()
            .rename(columns={"l_suppkey": "supplier_cnt"})
        )
        g["supplier_cnt"] = g["supplier_cnt"].astype(np.int64)
        return g

    pair_ds = li.map_batches(arrow_out(pairs), batch_format="pandas", batch_size=None)
    out = collect_arrow(
        hash_partition_map(
            pair_ds, ["p_brand", "p_type", "p_size"], arrow_out(count_distinct)
        ),
        pa.schema(
            [
                ("p_brand", pa.string()),
                ("p_type", pa.string()),
                ("p_size", pa.int64()),
                ("supplier_cnt", pa.int64()),
            ]
        ),
    )
    return out


PARTS_SUPPLIER_SQL = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{_Q16_EXCL_BRAND}'
  AND p_size IN ({", ".join(str(s) for s in _Q16_SIZES)})
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# -------------------------------------------------------------- Q2 shape
_Q2_TYPE = "STANDARD"
_Q2_MAX_SIZE = 10
_Q2_REGION = "EUROPE"


def min_cost_supplier(sf_dir: str):
    """Cheapest supplier(s) per qualifying part within one region — the
    TPC-H Q2 correlated-MIN-subquery shape, with unit cost adapted to
    lineitem (integer cents-per-unit, exact floor division) since the
    corpus has no partsupp.

    Part keyset and the region's supplier set broadcast once; per-block
    partial mins per (part, supplier) ride ONE partkey exchange, where the
    correlated MIN decorrelates into a local groupby-min + equality mask
    (ties kept, like the spec).  Winners are a tiny set: their supplier
    attributes come from a pushdown read and the top-100 (acctbal desc)
    sorts on the driver."""
    import pyarrow.parquet as pq

    pt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_size"],
        filters=[("p_type", "=", _Q2_TYPE), ("p_size", "<=", _Q2_MAX_SIZE)],
    )
    part_ref = broadcast(set(pt["p_partkey"].to_pylist()))

    nt = pq.read_table(f"{sf_dir}/nation.parquet")
    rt = pq.read_table(f"{sf_dir}/region.parquet")
    region_keys = {
        rk for rk, rn in zip(rt["r_regionkey"].to_pylist(), rt["r_name"].to_pylist())
        if rn == _Q2_REGION
    }
    region_nations = {
        nk for nk, rk in zip(
            nt["n_nationkey"].to_pylist(), nt["n_regionkey"].to_pylist()
        ) if rk in region_keys
    }
    st = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    )
    supp_ref = broadcast(
        {
            int(sk) for sk, nk in zip(
                st["s_suppkey"].to_pylist(), st["s_nationkey"].to_pylist()
            ) if nk in region_nations
        }
    )

    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice"],
    )

    def unit_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df[
            df["l_partkey"].isin(lookup_broadcast(part_ref)).values
            & df["l_suppkey"].isin(lookup_broadcast(supp_ref)).values
        ]
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        qty = np.round(d["l_quantity"].values).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "p_partkey": d["l_partkey"].values.astype(np.int64),
                    "s_suppkey": d["l_suppkey"].values.astype(np.int64),
                    "unit_c": price_c // qty,
                }
            )
            .groupby(["p_partkey", "s_suppkey"], as_index=False)["unit_c"]
            .min()
        )

    def winners_local(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        g = df.groupby(["p_partkey", "s_suppkey"], as_index=False)["unit_c"].min()
        mn = g.groupby("p_partkey")["unit_c"].transform("min").values
        return g[g["unit_c"].values == mn]

    pre = li.map_batches(
        arrow_out(unit_partial), batch_format="pandas", batch_size=None
    )
    win = collect_arrow(
        hash_partition_map(pre, ["p_partkey"], arrow_out(winners_local)),
        pa.schema(
            [
                ("p_partkey", pa.int64()),
                ("s_suppkey", pa.int64()),
                ("unit_c", pa.int64()),
            ]
        ),
    ).to_pandas()

    keys = sorted(set(int(k) for k in win["s_suppkey"]))
    attrs: dict[int, tuple] = {}
    if keys:
        at = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_acctbal", "s_nationkey"],
            filters=[("s_suppkey", "in", keys)],
        )
        nmap = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
        for k, nm, ab, nk in zip(
            at["s_suppkey"].to_pylist(), at["s_name"].to_pylist(),
            at["s_acctbal"].to_pylist(), at["s_nationkey"].to_pylist(),
        ):
            attrs[int(k)] = (nm, float(ab), nmap[nk])
    win["s_name"] = [attrs[int(k)][0] for k in win["s_suppkey"]]
    win["s_acctbal"] = [attrs[int(k)][1] for k in win["s_suppkey"]]
    win["n_name"] = [attrs[int(k)][2] for k in win["s_suppkey"]]
    win = win.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True],
        kind="mergesort",
    ).head(100)
    return pa.table(
        {
            "s_acctbal": pa.array(win["s_acctbal"], pa.float64()),
            "s_name": pa.array(win["s_name"], pa.string()),
            "n_name": pa.array(win["n_name"], pa.string()),
            "p_partkey": pa.array(win["p_partkey"].astype("int64"), pa.int64()),
            "cost": pa.array(
                round_col(win["unit_c"].astype("int64") / 100.0, 2), pa.float64()
            ),
        }
    )


MIN_COST_SQL = f"""
WITH cost AS (
  SELECT CAST(l_partkey AS BIGINT) AS p_partkey,
         CAST(l_suppkey AS BIGINT) AS s_suppkey,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             // CAST(ROUND(l_quantity) AS BIGINT)) AS unit_c
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = '{_Q2_REGION}'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_type = '{_Q2_TYPE}' AND p_size <= {_Q2_MAX_SIZE})
  GROUP BY 1, 2
), m AS (
  SELECT p_partkey, MIN(unit_c) AS mn FROM cost GROUP BY 1
)
SELECT s.s_acctbal, s.s_name, n.n_name, c.p_partkey,
       ROUND(c.unit_c / 100.0, 2) AS cost
FROM cost c
JOIN m ON c.p_partkey = m.p_partkey AND c.unit_c = m.mn
JOIN supplier s ON c.s_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, c.p_partkey
LIMIT 100
"""


QUERIES = {
    "returned_item_customers": (returned_item_customers, RETURNED_ITEM_SQL),
    "small_qty_avg_yearly": (small_qty_avg_yearly, SMALL_QTY_SQL),
    "nation_market_share": (nation_market_share, MARKET_SHARE_SQL),
    "late_shipment_priority": (late_shipment_priority, LATE_SHIPMENT_SQL),
    "important_parts_value": (important_parts_value, IMPORTANT_PARTS_SQL),
    "parts_supplier_counts": (parts_supplier_counts, PARTS_SUPPLIER_SQL),
    "min_cost_supplier": (min_cost_supplier, MIN_COST_SQL),
}
