"""Bloom-filter anti-join invariants (customers_no_orders_bloom) plus unit
tests for the vectorized SplitMix64 / Kirsch-Mitzenmacher probe helpers.

The driver-mimic suite (test_queries_vs_duckdb) already hash-checks the
query end-to-end; these tests pin the properties the query's CORRECTNESS
depends on — a Bloom filter must never report a present key as absent —
and the property that makes it WORTH running: a measurable fraction of
qualifying probes miss and skip the exchange.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from scrapy__ray.pipelines.relational import (
    _BLOOM_K,
    _BLOOM_M,
    _DORMANT_CUTOFF,
    _bloom_pack,
    _bloom_positions,
    _bloom_test,
    _splitmix64,
)

SF_DIR = "/root/testdata/sf0.01"


def test_splitmix64_vectorized_matches_scalar():
    # scalar reference implementation of the SplitMix64 finalizer
    def ref(x: int) -> int:
        mask = 0xFFFFFFFFFFFFFFFF
        x = (x + 0x9E3779B97F4A7C15) & mask
        x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & mask
        x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & mask
        return x ^ (x >> 31)

    keys = np.array([0, 1, 2, 12345, 2**31, 2**63 - 1], dtype=np.uint64)
    got = _splitmix64(keys)
    assert [int(v) for v in got] == [ref(int(k)) for k in keys]


def test_bloom_positions_shape_and_range():
    keys = np.arange(1000, dtype=np.uint64)
    pos = _bloom_positions(keys)
    assert pos.shape == (1000, _BLOOM_K)
    assert pos.min() >= 0 and pos.max() < _BLOOM_M


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.RandomState(7)
    present = np.unique(rng.randint(0, 2**62, size=50_000).astype(np.uint64))
    absent = np.unique(rng.randint(2**62, 2**63, size=50_000).astype(np.uint64))
    bm = _bloom_pack(_bloom_positions(present))
    # no false negatives — every inserted key tests positive
    assert _bloom_test(bm, _bloom_positions(present)).all()
    # false-positive rate near the analytic bound for m/n ≈ 84, k=4
    fp = _bloom_test(bm, _bloom_positions(absent)).mean()
    assert fp < 0.01


def test_bloom_merge_is_union():
    a = np.arange(0, 1000, dtype=np.uint64)
    b = np.arange(1000, 2000, dtype=np.uint64)
    merged = np.bitwise_or(
        _bloom_pack(_bloom_positions(a)), _bloom_pack(_bloom_positions(b))
    )
    both = _bloom_pack(_bloom_positions(np.arange(0, 2000, dtype=np.uint64)))
    assert np.array_equal(merged, both)


def test_dormant_bloom_prunes_and_agrees_with_exact(ray_session):
    """On the real sf0.01 tables: (1) every bloom-MISS customer is truly
    dormant (no false negatives end-to-end); (2) the miss set is non-empty
    (the filter actually prunes the exchange)."""
    cust = pq.read_table(
        f"{SF_DIR}/customer.parquet", columns=["c_custkey", "c_acctbal"]
    ).to_pandas()
    orders = pq.read_table(
        f"{SF_DIR}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).to_pandas()
    cut = np.datetime64(_DORMANT_CUTOFF, "us")
    recent = set(
        orders.loc[
            orders["o_orderdate"].values.astype("datetime64[us]") >= cut,
            "o_custkey",
        ].tolist()
    )
    bm = _bloom_pack(
        _bloom_positions(np.array(sorted(recent), dtype=np.uint64))
    )
    probes = cust["c_custkey"].values.astype(np.uint64)
    hit = _bloom_test(bm, _bloom_positions(probes))
    missed = cust.loc[~hit, "c_custkey"]
    # (1) a miss is PROOF of absence
    assert not any(k in recent for k in missed)
    # (2) pruning is real on this data
    assert len(missed) > 0
