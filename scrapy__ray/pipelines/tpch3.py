"""Third (final) wave of TPC-H-shape relational pipelines: Q4/Q6/Q9/Q20.

Completes the 22-shape sweep (Q1/Q3/Q5/Q7/Q8/Q10-Q19/Q21/Q22 live in
pipelines/relational.py and pipelines/tpch2.py).  Same contract as those
modules: every query is (ray_pipeline, oracle_sql) with IDENTICAL column
names and rounding; money travels as exact int64 hundredths-of-cents so
parallel partial sums associate freely.  The corpus has no partsupp table
and no commit/receipt dates (see tpch2.py header), so Q4/Q9/Q20 keep the
distributed SHAPE that makes each interesting while adapting predicates to
the available columns:

  * Q6  — the no-join pushdown scan: column-pruned read, vectorized triple
          predicate, one int64 partial sum per block, driver fold.  The
          cheapest possible query and the floor for scan throughput.
  * Q4  — EXISTS decorrelated as a distinct-semi-join: the fact side
          dedups orderkeys per block BEFORE the single orderkey exchange,
          so the shuffle moves one row per (orderkey, block), and the
          within-partition distinct equals the global distinct because
          the exchange co-locates all copies of a key.
  * Q9  — profit rollup: both dimensions broadcast (part keyset+cost map,
          supplier→nation map), the fact partial-aggregates by
          (orderkey, nation) before its only exchange (the orderkey join
          that fetches the order year), final (nation, year) rollup is
          175 groups — driver fold, no second exchange.
  * Q20 — nested aggregate (share-of-total) decorrelated by co-location:
          ONE partkey exchange makes the per-(part,supplier) sum and the
          per-part total a single vectorized local pass; the >50%%-share
          filter then needs no self-join across partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy__ray.pipelines.util import (
    arrow_out,
    driver_agg,
    read_parquet,
    round_col,
    shuffle_agg,
    shuffle_join,
)

# ------------------------------------------------------------- Q6 shape
_Q6_FROM = "1996-01-01"
_Q6_TO = "1997-01-01"
_Q6_DISC_LO_C = 5  # discount in integer cents-of-percent: 0.05..0.07
_Q6_DISC_HI_C = 7
_Q6_MAX_QTY = 24


def forecast_revenue_change(sf_dir: str):
    """Revenue increase from eliminating small discounts — the TPC-H Q6
    shape: no join at all, just a column-pruned scan (4 of 11 lineitem
    columns leave storage), a vectorized triple predicate, and an exact
    int64 partial sum per block folded on the driver.

    revenue = SUM(l_extendedprice * l_discount) over one shipping year,
    discount in [0.05, 0.07], quantity < 24.  Discounts are compared in
    integer hundredths (the corpus has 11 distinct discount levels, all
    exact hundredths) so the predicate is integer equality-range, not a
    float epsilon test."""
    lo = np.datetime64(_Q6_FROM, "us")
    hi = np.datetime64(_Q6_TO, "us")
    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["l_shipdate"].values.astype("datetime64[us]")
        disc_c = np.round(df["l_discount"].values * 100).astype(np.int64)
        keep = (
            (d >= lo)
            & (d < hi)
            & (disc_c >= _Q6_DISC_LO_C)
            & (disc_c <= _Q6_DISC_HI_C)
            & (df["l_quantity"].values < _Q6_MAX_QTY)
        )
        price_c = np.round(
            df["l_extendedprice"].values[keep] * 100
        ).astype(np.int64)
        rev = int((price_c * disc_c[keep]).sum())
        return pd.DataFrame({"rev_cc": [rev]})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        total = int(df["rev_cc"].sum()) if len(df) else 0
        return pd.DataFrame({"revenue": [round(total / 10000.0, 2)]})

    return pa.Table.from_pandas(
        driver_agg(li, arrow_out(partial), final), preserve_index=False
    )


FORECAST_REVENUE_SQL = f"""
SELECT ROUND(COALESCE(SUM(
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * CAST(ROUND(l_discount * 100) AS BIGINT)), 0) / 10000.0, 2)
       AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{_Q6_FROM}'
  AND l_shipdate < TIMESTAMP '{_Q6_TO}'
  AND CAST(ROUND(l_discount * 100) AS BIGINT) BETWEEN {_Q6_DISC_LO_C} AND {_Q6_DISC_HI_C}
  AND l_quantity < {_Q6_MAX_QTY}
"""


# ------------------------------------------------------------- Q4 shape
_Q4_FROM = "1996-07-01"
_Q4_TO = "1996-10-01"


def orders_with_returns_priority(sf_dir: str):
    """Priority histogram of one quarter's orders that had at least one
    returned line — the TPC-H Q4 EXISTS shape (the corpus has no
    commit/receipt dates, so the EXISTS predicate is l_returnflag = 'R'
    instead of commit < receipt; the distributed shape is identical).

    EXISTS decorrelates to a distinct-semi-join: the lineitem side filters
    to returned lines, projects ONLY the orderkey, and dedups per block
    before the exchange, so the single orderkey shuffle moves at most one
    row per (orderkey, block).  The within-partition distinct after the
    join equals the global distinct because the hash exchange co-locates
    every copy of a key; the final 5-group priority count is a driver
    fold."""
    lo = np.datetime64(_Q4_FROM, "us")
    hi = np.datetime64(_Q4_TO, "us")

    li = read_parquet(sf_dir, "lineitem", columns=["l_orderkey", "l_returnflag"])

    def li_keys(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["l_returnflag"].values == "R"]
        return pd.DataFrame(
            {"o_orderkey": np.unique(d["l_orderkey"].values.astype(np.int64))}
        )

    lkeys = li.map_batches(arrow_out(li_keys), batch_format="pandas", batch_size=None)

    orders = read_parquet(
        sf_dir, "orders", columns=["o_orderkey", "o_orderdate", "o_orderpriority"]
    )

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        dt = df["o_orderdate"].values.astype("datetime64[us]")
        d = df[(dt >= lo) & (dt < hi)]
        return pd.DataFrame(
            {
                "o_orderkey": d["o_orderkey"].values.astype(np.int64),
                "o_orderpriority": d["o_orderpriority"].values,
            }
        )

    op = orders.map_batches(arrow_out(o_proj), batch_format="pandas", batch_size=None)

    joined = shuffle_join(
        op, lkeys, on="o_orderkey",
        left_cols=["o_orderkey", "o_orderpriority"],
        right_cols=["o_orderkey"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # one orders row × k deduped-per-block lineitem copies -> distinct
        # within the partition IS the global distinct (key-co-located)
        d = df.drop_duplicates("o_orderkey")
        g = d.groupby("o_orderpriority", as_index=False).size()
        return g.rename(columns={"size": "order_count"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"o_orderpriority": pd.Series([], dtype=object),
                 "order_count": pd.Series([], dtype=np.int64)}
            )
        g = df.groupby("o_orderpriority", as_index=False)["order_count"].sum()
        g["order_count"] = g["order_count"].astype(np.int64)
        return g.sort_values("o_orderpriority", kind="mergesort").reset_index(
            drop=True
        )

    return pa.Table.from_pandas(
        driver_agg(joined, arrow_out(partial), final), preserve_index=False
    )


ORDERS_WITH_RETURNS_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_Q4_FROM}'
  AND o_orderdate < TIMESTAMP '{_Q4_TO}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ------------------------------------------------------------- Q9 shape
_Q9_NAME_SUBSTR = "red"


def product_type_profit(sf_dir: str):
    """Profit by (supplier nation, order year) over parts whose name
    contains a substring — the TPC-H Q9 shape.  The corpus has no partsupp
    table, so per-unit supply cost is the part's retail price (the join
    tree and exchange structure are unchanged; only the cost column's
    source table differs).

    Both dimension sides are genuinely small and broadcast once via the
    object store: the name-filtered part keyset with its cost map
    (~2k keys/sf0.01), and the supplier→nation-name map (customer of the
    join is the fact scan, which never shuffles for them).  The fact
    partial-aggregates profit by (orderkey, nation) per block, so the
    single orderkey exchange — the join that fetches each order's year —
    moves one row per (orderkey, nation, block).  The final rollup is
    (25 nations × 7 years) groups: a driver fold, no second exchange.

    profit_cc = extprice_c·(100−disc_c) − qty·retail_c·100, exact int64
    hundredths-of-cents end to end."""
    import pyarrow.parquet as pq
    import ray

    pt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    )
    names = pt["p_name"].to_pylist()
    keep = [i for i, nm in enumerate(names) if _Q9_NAME_SUBSTR in nm]
    sub = pt.take(keep)
    cost_map = {
        int(k): int(round(float(v) * 100))
        for k, v in zip(
            sub["p_partkey"].to_pylist(), sub["p_retailprice"].to_pylist()
        )
    }

    st = pq.read_table(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"])
    nt = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    nmap = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
    sup_nation = {
        int(s): nmap[nk]
        for s, nk in zip(st["s_suppkey"].to_pylist(), st["s_nationkey"].to_pylist())
    }
    cost_ref = ray.put(cost_map)
    sup_ref = ray.put(sup_nation)

    li = read_parquet(
        sf_dir, "lineitem",
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey",
            "l_quantity", "l_extendedprice", "l_discount",
        ],
    )

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        cmap = ray.get(cost_ref)
        smap = ray.get(sup_ref)
        pk = df["l_partkey"].values.astype(np.int64)
        mask = np.fromiter((int(k) in cmap for k in pk), dtype=bool, count=len(pk))
        d = df[mask]
        if not len(d):
            return pd.DataFrame(
                {"l_orderkey": pd.Series([], dtype=np.int64),
                 "nation": pd.Series([], dtype=object),
                 "profit_cc": pd.Series([], dtype=np.int64)}
            )
        price_c = np.round(d["l_extendedprice"].values * 100).astype(np.int64)
        disc_c = np.round(d["l_discount"].values * 100).astype(np.int64)
        qty = np.round(d["l_quantity"].values).astype(np.int64)
        retail_c = np.fromiter(
            (cmap[int(k)] for k in d["l_partkey"].values.astype(np.int64)),
            dtype=np.int64, count=len(d),
        )
        out = pd.DataFrame(
            {
                "l_orderkey": d["l_orderkey"].values.astype(np.int64),
                "nation": [
                    smap[int(s)] for s in d["l_suppkey"].values.astype(np.int64)
                ],
                "profit_cc": price_c * (100 - disc_c) - qty * retail_c * 100,
            }
        )
        return out.groupby(["l_orderkey", "nation"], as_index=False)[
            "profit_cc"
        ].sum()

    lp = li.map_batches(arrow_out(li_partial), batch_format="pandas", batch_size=None)

    orders = read_parquet(sf_dir, "orders", columns=["o_orderkey", "o_orderdate"])

    def o_proj(df: pd.DataFrame) -> pd.DataFrame:
        yr = df["o_orderdate"].values.astype("datetime64[Y]").astype(np.int64) + 1970
        return pd.DataFrame(
            {
                "l_orderkey": df["o_orderkey"].values.astype(np.int64),
                "o_year": yr.astype(np.int64),
            }
        )

    op = orders.map_batches(arrow_out(o_proj), batch_format="pandas", batch_size=None)

    joined = shuffle_join(
        lp, op, on="l_orderkey",
        left_cols=["l_orderkey", "nation", "profit_cc"],
        right_cols=["l_orderkey", "o_year"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["nation", "o_year"], as_index=False)["profit_cc"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"nation": pd.Series([], dtype=object),
                 "o_year": pd.Series([], dtype=np.int64),
                 "profit": pd.Series([], dtype=np.float64)}
            )
        g = df.groupby(["nation", "o_year"], as_index=False)["profit_cc"].sum()
        g["profit"] = round_col(g["profit_cc"].astype("int64") / 10000.0, 2)
        g["o_year"] = g["o_year"].astype(np.int64)
        return g.sort_values(
            ["nation", "o_year"], ascending=[True, False], kind="mergesort"
        )[["nation", "o_year", "profit"]].reset_index(drop=True)

    return pa.Table.from_pandas(
        driver_agg(joined, arrow_out(partial), final), preserve_index=False
    )


PRODUCT_PROFIT_SQL = f"""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(SUM(
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l.l_discount * 100) AS BIGINT))
         - CAST(ROUND(l.l_quantity) AS BIGINT)
           * CAST(ROUND(p.p_retailprice * 100) AS BIGINT) * 100
       ) / 10000.0, 2) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE p.p_name LIKE '%{_Q9_NAME_SUBSTR}%'
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# ------------------------------------------------------------- Q20 shape
_Q20_NAME_PREFIX = "small"
_Q20_FROM = "1996-01-01"
_Q20_TO = "1998-01-01"


def dominant_part_suppliers(sf_dir: str):
    """Suppliers who shipped MORE THAN HALF of some qualifying part's total
    shipped quantity in a window — the TPC-H Q20 nested-aggregate semi-join
    shape (the corpus has no partsupp availqty, so the 50%%-of-demand
    threshold compares a supplier's shipped share against the part's total
    from the same fact table; the decorrelation structure is identical).

    The name-filtered part keyset broadcasts once; the fact side
    partial-aggregates quantity by (partkey, suppkey) per block; then ONE
    partkey exchange co-locates each part's rows so the per-part total and
    the >50%% share filter are a single vectorized transform — the nested
    aggregate never becomes a self-join across partitions.  The distinct
    winning suppliers (≤|supplier|) are collected and their names fetched
    via parquet predicate pushdown; the supplier table never fully loads."""
    import pyarrow.parquet as pq
    import ray

    pt = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"])
    keyset = {
        int(k)
        for k, nm in zip(pt["p_partkey"].to_pylist(), pt["p_name"].to_pylist())
        if nm.startswith(_Q20_NAME_PREFIX)
    }
    keys_ref = ray.put(keyset)
    lo = np.datetime64(_Q20_FROM, "us")
    hi = np.datetime64(_Q20_TO, "us")

    li = read_parquet(
        sf_dir, "lineitem",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keys_ref)
        d = df["l_shipdate"].values.astype("datetime64[us]")
        pk = df["l_partkey"].values.astype(np.int64)
        mask = (
            (d >= lo) & (d < hi)
            & np.fromiter((int(k) in ks for k in pk), dtype=bool, count=len(pk))
        )
        d2 = df[mask]
        out = pd.DataFrame(
            {
                "l_partkey": d2["l_partkey"].values.astype(np.int64),
                "l_suppkey": d2["l_suppkey"].values.astype(np.int64),
                "qty": np.round(d2["l_quantity"].values).astype(np.int64),
            }
        )
        return out.groupby(["l_partkey", "l_suppkey"], as_index=False)["qty"].sum()

    def dominate(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64)})
        g = df.groupby(["l_partkey", "l_suppkey"], as_index=False)["qty"].sum()
        tot = g.groupby("l_partkey")["qty"].transform("sum")
        win = g[2 * g["qty"].values > tot.values]
        return pd.DataFrame(
            {"s_suppkey": np.unique(win["l_suppkey"].values.astype(np.int64))}
        )

    winners = shuffle_agg(li, ["l_partkey"], partial, arrow_out(dominate))

    def p2(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates("s_suppkey")

    def f2(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64)})
        return df.drop_duplicates("s_suppkey").sort_values("s_suppkey").reset_index(
            drop=True
        )

    top = driver_agg(winners, arrow_out(p2), f2)
    keys = [int(k) for k in top["s_suppkey"]]
    if keys:
        st = pq.read_table(
            f"{sf_dir}/supplier.parquet",
            columns=["s_suppkey", "s_name", "s_nationkey"],
            filters=[("s_suppkey", "in", keys)],
        )
        nt = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
        nmap = dict(zip(nt["n_nationkey"].to_pylist(), nt["n_name"].to_pylist()))
        attrs = {
            int(k): (nm, nmap[nk])
            for k, nm, nk in zip(
                st["s_suppkey"].to_pylist(), st["s_name"].to_pylist(),
                st["s_nationkey"].to_pylist(),
            )
        }
    else:
        attrs = {}
    return pa.table(
        {
            "s_suppkey": pa.array(keys, pa.int64()),
            "s_name": pa.array([attrs[k][0] for k in keys], pa.string()),
            "n_name": pa.array([attrs[k][1] for k in keys], pa.string()),
        }
    )


DOMINANT_SUPPLIERS_SQL = f"""
WITH q AS (
  SELECT CAST(l_partkey AS BIGINT) AS l_partkey,
         CAST(l_suppkey AS BIGINT) AS l_suppkey,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
  FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{_Q20_NAME_PREFIX}%')
    AND l_shipdate >= TIMESTAMP '{_Q20_FROM}'
    AND l_shipdate < TIMESTAMP '{_Q20_TO}'
  GROUP BY 1, 2
), t AS (
  SELECT l_partkey, SUM(qty) AS tot FROM q GROUP BY 1
)
SELECT DISTINCT q.l_suppkey AS s_suppkey, s.s_name, n.n_name
FROM q
JOIN t ON q.l_partkey = t.l_partkey
JOIN supplier s ON q.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE 2 * q.qty > t.tot
ORDER BY s_suppkey
"""


QUERIES = {
    "forecast_revenue_change": (forecast_revenue_change, FORECAST_REVENUE_SQL),
    "orders_with_returns_priority": (
        orders_with_returns_priority, ORDERS_WITH_RETURNS_SQL,
    ),
    "product_type_profit": (product_type_profit, PRODUCT_PROFIT_SQL),
    "dominant_part_suppliers": (dominant_part_suppliers, DOMINANT_SUPPLIERS_SQL),
}
