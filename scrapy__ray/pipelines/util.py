"""Shared Ray-Data pipeline helpers: broadcast lookups, partial aggregation.

The scale patterns used by every query module:
  * broadcast_ref / lookup — small side (dimension table, query matrix,
    vocab) is ``ray.put`` ONCE and read inside tasks from a process-level
    cache, never re-shipped per batch (SURVEY.md §2.7 broadcast join).
  * pre_aggregate — combine inside map_batches first so the groupby shuffle
    moves one row per (key, batch) instead of every input row.
"""

from __future__ import annotations

import logging
from typing import Any

# process-level cache: ObjectRef hex -> deserialized object (one fetch per
# worker process, shared across tasks and rounds)
_REF_CACHE: dict[str, Any] = {}


class _DropSchemaHashWarning(logging.Filter):
    """Ray's unify_schemas() tries ``set(schemas)`` as a fast path;
    pandas-format blocks carry a PandasBlockSchema (holds numpy dtype
    objects) that is not hashable, so every unify logs "Failed to hash the
    schemas (for deduplication): unhashable type ..." and then proceeds
    correctly down the slow path.  Pandas blocks are this repo's deliberate
    vectorized-aggregation format (see module docstring), so silence exactly
    that benign message instead of spamming thousands of lines per bench
    run.  Installed at import time so worker processes (which import this
    module to unpickle stage functions) filter it too, not just the driver.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        return "Failed to hash the schemas" not in record.getMessage()


def _install_log_filter() -> None:
    tp_logger = logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    )
    if not any(isinstance(f, _DropSchemaHashWarning) for f in tp_logger.filters):
        tp_logger.addFilter(_DropSchemaHashWarning())


_install_log_filter()


def broadcast(obj: Any):
    import ray

    return ray.put(obj)


def lookup_broadcast(ref) -> Any:
    import ray

    key = ref.hex()
    if key not in _REF_CACHE:
        _REF_CACHE[key] = ray.get(ref)
    return _REF_CACHE[key]


def ensure_ctx() -> None:
    """Pin the Ray Data context for query pipelines: hash-based shuffle.

    Measured on this Ray (2.49): native ``groupby().aggregate()`` costs
    ~200-700 µs PER GROUP regardless of shuffle strategy (51 s for 2M rows /
    250k groups at 4 cpus), while partial-aggregate -> ``repartition(keys=…)``
    hash shuffle -> per-block vectorized final runs the same job in 3.5 s.
    All aggregations here therefore use the partial/final helpers below;
    repartition(keys=…) requires the HASH_SHUFFLE strategy.
    """
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.enable_progress_bars = False
    _install_log_filter()


def read_parquet(sf_dir: str, table: str, columns: list[str] | None = None):
    """Column-pruned parquet read of one testdata table."""
    import ray.data as rd

    ensure_ctx()
    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def driver_agg(ds, partial_fn, final_fn):
    """Combiner + driver reduce for LOW-cardinality aggregations.

    ``partial_fn`` (pandas in/out) combines each block down to one row per
    group; the small partials are concatenated on the driver and finished by
    ``final_fn``.  No shuffle at all — scalable because the collected size is
    O(#groups × #blocks), independent of input rows.
    """
    import pandas as pd

    # materialize first: consuming a lazy dataset triggers a limit-1 schema
    # peek that re-executes the upstream pipeline (costly after a shuffle)
    md = ds.map_batches(
        partial_fn, batch_format="pandas", batch_size=None
    ).materialize()
    parts = list(md.iter_batches(batch_format="pandas", batch_size=None))
    return final_fn(pd.concat(parts, ignore_index=True))


def shuffle_agg(ds, keys: list[str], partial_fn, final_fn, num_partitions: int = 16):
    """Partial-aggregate -> hash-shuffle by ``keys`` -> per-block final.

    The scalable exchange for HIGH-cardinality aggregations: the shuffle
    moves one row per (key, block), and the final combine inside each
    hash partition is a vectorized pandas groupby, not a per-group call.
    Returns a Dataset (one block per partition).
    """
    ensure_ctx()
    return (
        ds.map_batches(partial_fn, batch_format="pandas", batch_size=None)
        .repartition(num_partitions, keys=keys, sort=False)
        .map_batches(final_fn, batch_format="pandas", batch_size=None)
    )


def hash_partition_map(ds, keys: list[str], fn, num_partitions: int = 16):
    """Hash-partition by ``keys`` then apply ``fn`` per partition block.

    The map_groups replacement: ``fn`` (pandas in/out) sees every row of each
    key group in exactly one call, without Ray's per-group UDF dispatch
    (measured ~200 µs/group — prohibitive beyond ~10k groups)."""
    ensure_ctx()
    return ds.repartition(num_partitions, keys=keys, sort=False).map_batches(
        fn, batch_format="pandas", batch_size=None
    )


def collect_arrow(ds, schema) -> Any:
    """Materialize a (small) Dataset result as one pa.Table, preserving the
    declared schema even when every block is empty — an empty Ray Dataset
    otherwise surfaces as a zero-column DataFrame and fails schema compares."""
    import pyarrow as pa
    import ray

    # materialize() THEN to_arrow_refs: to_arrow_refs on a lazy dataset
    # first runs a limit-1 schema peek that executes the whole upstream
    # shuffle a second time (measured 2x wall on every shuffle query);
    # also avoids iter_batches' prefetch machinery, which was observed to
    # stall the driver for minutes on multi-stage shuffle outputs.
    tbls = [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]
    if not tbls:
        return schema.empty_table()
    return pa.concat_tables([t.select(schema.names).cast(schema) for t in tbls])


def shuffle_join(
    left,
    right,
    on: str,
    num_partitions: int = 16,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
):
    """Distributed hash equi-join of two LARGE datasets (neither broadcast):
    tag each side, union, hash-partition by the key, then pandas-merge the
    two sides inside each partition.  One shuffle total; the classic
    repartition-join expressed in Ray Data primitives.  Column names must
    be disjoint apart from ``on``.  Returns a Dataset of joined rows.
    (Small-side joins should use broadcast + lookup_broadcast instead.)

    Each side's column list is captured up front (pass ``left_cols`` /
    ``right_cols`` to skip the one-block schema peek) so the per-partition
    split selects columns EXPLICITLY — inferring them via ``dropna(axis=1)``
    would also drop a real column that happens to be all-null within one
    partition, and a one-sided partition would yield a zero-column frame.
    """
    import pandas as pd

    ensure_ctx()
    if left_cols is None:
        left_cols = list(left.schema().names)
    if right_cols is None:
        right_cols = list(right.schema().names)
    joined_cols = list(left_cols) + [c for c in right_cols if c != on]

    def tag(side: int):
        def _t(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["__side"] = side
            return df

        return _t

    both = left.map_batches(
        tag(0), batch_format="pandas", batch_size=None
    ).union(right.map_batches(tag(1), batch_format="pandas", batch_size=None))

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        l = df[df["__side"] == 0][left_cols]
        r = df[df["__side"] == 1][right_cols]
        if not len(l) or not len(r):
            return pd.DataFrame({c: [] for c in joined_cols})
        return l.merge(r, on=on, how="inner")[joined_cols]

    return both.repartition(num_partitions, keys=[on], sort=False).map_batches(
        merge, batch_format="pandas", batch_size=None
    )


def round_col(values, digits: int):
    """Round a float column the same way the oracle SQL's ROUND() does.

    DuckDB ROUND(x, n) rounds half away from zero on doubles; numpy rounds
    half to even.  Use the decimal-shift trick with away-from-zero to match.
    """
    import numpy as np

    arr = np.asarray(values, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
