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


class _DropEmptySchemaDrift(logging.Filter):
    """A hash-shuffle partition that receives zero rows finalizes to a
    zero-column block; the streaming executor then warns "Operator produced
    a RefBundle with a different schema ... new schema: ." once per such
    block.  Empty partitions are routine at small fixture scale (16-way
    shuffle of a 500-row table) and an empty block cannot mislay rows, so
    drop exactly the empty-new-schema variant — REAL schema drift (two
    non-empty schemas) still logs, which is the variant that signals bugs.
    """

    def filter(self, record: logging.LogRecord) -> bool:
        msg = record.getMessage()
        return not (
            "RefBundle with a different schema" in msg
            and "new schema: . This may lead" in msg
        )


def _install_log_filter() -> None:
    tp_logger = logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    )
    if not any(isinstance(f, _DropSchemaHashWarning) for f in tp_logger.filters):
        tp_logger.addFilter(_DropSchemaHashWarning())
    ex_logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _DropEmptySchemaDrift) for f in ex_logger.filters):
        ex_logger.addFilter(_DropEmptySchemaDrift())


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
    # Aggregator actors default to 0.0625 CPU per partition => one 16-way
    # shuffle op RESERVES a full CPU for its (mostly idle) aggregator pool.
    # A DAG with several exchanges (shuffle_agg x2 + shuffle_join x2 in the
    # near-dup pipelines) then reserves every core on a small node and the
    # map tasks starve — observed as a full deadlock at num_cpus=4.  The
    # aggregators only burn CPU during finalization, so oversubscribing
    # them is safe; reserve a token amount instead.
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.005
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.005
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


def auto_partitions() -> int:
    """Shuffle fan-out sized to the cluster, not a constant.

    cpus/2 partitions (floor 16, cap 512).  Each partition costs one
    aggregator-actor spawn PER EXECUTION, and that fixed cost is the
    dominant term for moderate exchanges — measured on sf0.1 at 32 cpus,
    the same query ran 5.8 s / 8.8 s / 12.5 s at 16 / 32 / 64 partitions
    (near-linear in partition count, data constant).  cpus/2 keeps the
    count growing with the cluster (a 256-core cluster gets 128-way
    exchanges) without quadrupling spin-up on one node.  At the true
    100-TB point, callers must pass an explicit ``num_partitions`` sized to
    data_bytes / target_partition_bytes — the default optimizes the
    exchange-count-heavy moderate-size regime.
    """
    import ray

    cpus = 8.0
    if ray.is_initialized():
        cpus = ray.cluster_resources().get("CPU", 8.0)
    return max(16, min(512, int(cpus) // 2))


def arrow_out(fn):
    """Wrap a pandas-in/pandas-out stage fn so its OUTPUT blocks are plain
    Arrow tables with no schema metadata.  Two reasons every stage feeding a
    hash-shuffle exchange uses this:
      * the exchange then moves Arrow blocks (zero-copy serialization)
        instead of pickled pandas frames;
      * pa.Table.from_pandas stamps a ``pandas`` metadata dict that makes
        the schema UNHASHABLE (hash(schema) -> "unhashable type: 'dict'"),
        which defeats Ray's schema-dedup fast path and logs a warning per
        unify inside every aggregator actor — processes our logging filter
        can't reach.  Stripping the metadata fixes the root cause.
    """
    import pandas as pd
    import pyarrow as pa

    def _f(df: pd.DataFrame):
        out = fn(df)
        if isinstance(out, pa.Table):
            return out.replace_schema_metadata(None)
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(
            None
        )

    return _f


def shuffle_agg(
    ds, keys: list[str], partial_fn, final_fn, num_partitions: int | None = None
):
    """Partial-aggregate -> hash-shuffle by ``keys`` -> per-block final.

    The scalable exchange for HIGH-cardinality aggregations: the shuffle
    moves one row per (key, block), and the final combine inside each
    hash partition is a vectorized pandas groupby, not a per-group call.
    Returns a Dataset (one block per partition).
    """
    ensure_ctx()
    return (
        ds.map_batches(arrow_out(partial_fn), batch_format="pandas", batch_size=None)
        .repartition(num_partitions or auto_partitions(), keys=keys, sort=False)
        .map_batches(final_fn, batch_format="pandas", batch_size=None)
    )


def hash_partition_map(
    ds,
    keys: list[str],
    fn,
    num_partitions: int | None = None,
    batch_format: str = "pandas",
):
    """Hash-partition by ``keys`` then apply ``fn`` per partition block.

    The map_groups replacement: ``fn`` sees every row of each key group in
    exactly one call, without Ray's per-group UDF dispatch (measured
    ~200 µs/group — prohibitive beyond ~10k groups).  ``batch_format``
    picks ``fn``'s view: "pandas" (default) or "pyarrow" — Arrow fns see
    the exchange output zero-copy."""
    ensure_ctx()
    # normalize input blocks to metadata-free Arrow before the exchange
    # (native-format pass-through: Arrow blocks cross untouched, pandas
    # blocks convert once) — see arrow_out for why
    return ds.map_batches(
        arrow_out(lambda b: b), batch_format=None, batch_size=None
    ).repartition(
        num_partitions or auto_partitions(), keys=keys, sort=False
    ).map_batches(fn, batch_format=batch_format, batch_size=None)


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
    num_partitions: int | None = None,
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
):
    """Distributed hash equi-join of two LARGE datasets (neither broadcast):
    tag each side, union, hash-partition by the key in ONE exchange, then
    pandas-merge the two sides inside each partition — the classic
    repartition join.  Correctness does not depend on any block ORDER:
    both sides travel through the same exchange and every output partition
    holds all rows of its key range from both sides.  (A previous
    partition-ZIP formulation — repartition each side separately and merge
    block i with block i — was retired after it flaked: materialized block
    order is finalization-completion order, not guaranteed partition
    order, so index-zipping can silently misalign partitions.)

    Tag blocks are metadata-free Arrow with the other side's columns as
    null columns (see arrow_out for why), and integer join keys arriving
    as float64 (a pandas NaN-promotion artifact in chained joins) are
    restored before hashing — float 3.0 and int 3 hash differently.
    Key contract: the join key must be integer-valued OR a string (ids
    like doc_id/orderkey, or token/hash keys like term/text_hash —
    qualityops joins on both).  Strings never enter the NaN-promotion
    path because each side is split to Arrow while still typed, so only
    floating keys need the restore-cast; a float key column whose values
    are not all integral would be silently truncated by it, so the tag
    stage raises TypeError instead of guessing.

    Column names must be disjoint apart from ``on``.  Pass ``left_cols`` /
    ``right_cols`` to prune early and skip the schema peek.  Returns a
    Dataset of joined rows.  (Small-side joins should use broadcast +
    lookup_broadcast instead.)
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    ensure_ctx()
    if left_cols is None:
        left_cols = list(left.schema().names)
    if right_cols is None:
        right_cols = list(right.schema().names)
    joined_cols = list(left_cols) + [c for c in right_cols if c != on]
    union_cols = [on] + [c for c in left_cols if c != on] + [
        c for c in right_cols if c != on
    ]

    def tag(side: int, own: list[str]):
        # native-format stage: Arrow blocks pass through with ZERO
        # conversion (column select + null-pad + one int32 literal column);
        # pandas blocks convert once.  The previous batch_format="pandas"
        # formulation forced Arrow->pandas->Arrow per block on every
        # exchange input — pure conversion overhead on the hottest helper
        # in the repo (round-3 review item).
        def _t(block) -> pa.Table:
            if not isinstance(block, pa.Table):
                block = pa.Table.from_pandas(block, preserve_index=False)
            n = block.num_rows
            cols = {}
            for c in union_cols:
                if c in own:
                    arr = block[c]
                    if c == on and pa.types.is_floating(arr.type):
                        vals = arr.to_numpy(zero_copy_only=False)
                        if not np.all(vals == np.floor(vals)):
                            raise TypeError(
                                f"shuffle_join key {on!r} is float with "
                                "non-integral values; the int-restore cast "
                                "would truncate — join on an integer key"
                            )
                        arr = arr.cast(pa.int64())
                    cols[c] = arr
                else:
                    cols[c] = pa.nulls(n)
            cols["__side"] = pa.array(np.full(n, side, dtype=np.int32))
            return pa.table(cols).replace_schema_metadata(None)

        return _t

    both = left.map_batches(
        tag(0, left_cols), batch_format=None, batch_size=None
    ).union(
        right.map_batches(tag(1, right_cols), batch_format=None, batch_size=None)
    )

    def merge(block) -> pa.Table:
        # split sides while still ARROW: the unified block's columns are
        # typed int64/binary/... WITH nulls from the other side's rows;
        # converting the whole block to pandas first would promote every
        # null-bearing integer column to float64 and the float values
        # would then hash/compare differently downstream (observed as
        # duplicated keys after a chained aggregation).  After filtering
        # to one side, that side's own columns are null-free, and the
        # per-partition join itself is pyarrow's Acero hash join — no
        # pandas round-trip at all (round-4 review item: the pandas merge
        # was the hottest remaining conversion in the repo).  Null-key
        # semantics note: Acero drops null join keys (SQL semantics,
        # matching the DuckDB oracles); pandas merge matched NaN==NaN.
        # Join keys here are ids/hashes and non-null by contract.
        import pyarrow.compute as pc

        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0 or "__side" not in block.schema.names:
            return pa.table({c: pa.nulls(0) for c in joined_cols})
        side = block["__side"]
        l = block.filter(pc.equal(side, 0)).select(left_cols)
        r = block.filter(pc.equal(side, 1)).select(right_cols)
        if not l.num_rows or not r.num_rows:
            return pa.table({c: pa.nulls(0) for c in joined_cols})

        def _concrete(t: pa.Table) -> pa.Table:
            # Acero rejects null-typed non-key columns ("Data type null is
            # not supported in join non-key field"); an all-null payload
            # column (degenerate but legal) is cast to float64, the same
            # NaN column the retired pandas merge produced.
            for i, f in enumerate(t.schema):
                if pa.types.is_null(f.type):
                    t = t.set_column(
                        i, f.name, t.column(i).cast(pa.float64())
                    )
            return t

        out = _concrete(l).join(_concrete(r), keys=on, join_type="inner")
        return out.select(joined_cols).replace_schema_metadata(None)

    return both.repartition(
        num_partitions or auto_partitions(), keys=[on], sort=False
    ).map_batches(merge, batch_format=None, batch_size=None)


def round_col(values, digits: int):
    """Round a float column the same way the oracle SQL's ROUND() does.

    DuckDB ROUND(x, n) rounds half away from zero on doubles; numpy rounds
    half to even.  Use the decimal-shift trick with away-from-zero to match.
    """
    import numpy as np

    arr = np.asarray(values, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
