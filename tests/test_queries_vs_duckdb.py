"""Driver-mimic: every queries() entry vs its oracle_sql() on sf0.01.

Mirrors the harness compare (row count + schema + order-insensitive values,
columns sorted by name) so CORRECTNESS_r{N}.json holds no surprises.
Rows-only queries are executed for determinism/shape but have no SQL side.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _pairs():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as e

    # exactly what the driver sees: queries() + oracle_sql(), where
    # oracle_sql() includes the materialized pure-Python oracles
    # (scrapy__ray/oracle_ext.py) for the deterministic non-SQL queries
    fns = e._all_queries()
    sqls = e.oracle_sql()
    return {n: (fn, sqls.get(n)) for n, (fn, _s) in fns.items()}


SQL_QUERIES = [(n, fn, sql) for n, (fn, sql) in _pairs().items() if sql is not None]
ROWS_ONLY = [(n, fn) for n, (fn, sql) in _pairs().items() if sql is None]


@pytest.mark.parametrize("name,fn,sql", SQL_QUERIES, ids=[n for n, _, _ in SQL_QUERIES])
def test_query_matches_oracle(ray_session, con, name, fn, sql):
    mine = _canon(_to_df(fn(SF_DIR)))
    theirs = _canon(con.execute(sql).fetchdf())
    assert len(mine) == len(theirs), (name, len(mine), len(theirs))
    assert list(mine.columns) == list(theirs.columns), name
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only_query_runs(ray_session, name, fn):
    df = _to_df(fn(SF_DIR))
    assert df.shape[0] >= 0
    assert df.shape[1] >= 1


def test_minhash_large_regime_matches_small(ray_session, monkeypatch):
    """Force the shuffle-join verify path (the corpus-scale regime) and
    assert it yields byte-identical pairs to the pushdown fast path."""
    import scrapy__ray.pipelines.textops as textops

    small = _canon(_to_df(textops.docs_minhash_lsh(SF_DIR)))
    monkeypatch.setattr(textops, "_MINHASH_PUSHDOWN_MAX_IDS", 0)
    # the per-process result memo would otherwise return the fast-path
    # table verbatim and never execute the forced regime
    monkeypatch.setattr(textops, "_MINHASH_MEMO", {})
    large = _canon(_to_df(textops.docs_minhash_lsh(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_jaccard_sizes_shuffle_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the >_SIZES_BROADCAST_MAX regime (shuffle_agg sizes + two
    shuffle_joins — the 10^10-doc path) and assert byte-identical pairs."""
    import scrapy__ray.pipelines.textops as textops

    small = _canon(_to_df(textops.docs_jaccard_dups(SF_DIR)))
    monkeypatch.setattr(textops, "_SIZES_BROADCAST_MAX", 0)
    monkeypatch.setattr(textops, "_JACCARD_MEMO", {})
    large = _canon(_to_df(textops.docs_jaccard_dups(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_tfidf_vocab_shuffle_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the >_VOCAB_BROADCAST_MAX_DOCS regime (term-keyed shuffle_join
    for df — vocabulary never broadcast) and assert identical top terms."""
    import scrapy__ray.pipelines.qualityops as qualityops

    small = _canon(_to_df(qualityops.docs_tfidf_top_terms(SF_DIR)))
    monkeypatch.setattr(qualityops, "_VOCAB_BROADCAST_MAX_DOCS", 0)
    large = _canon(_to_df(qualityops.docs_tfidf_top_terms(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_bpe_train_dataset_regime_matches_driver(ray_session, monkeypatch):
    """Force the >_BPE_DRIVER_MAX_DOCS regime (word table stays a Dataset;
    per-iteration mergeable pair folds + broadcast merge rewrites) and
    assert the merge table is bit-identical to the driver-local loop."""
    import scrapy__ray.pipelines.qualityops as qualityops

    small = _canon(_to_df(qualityops.docs_bpe_train(SF_DIR)))
    monkeypatch.setattr(qualityops, "_BPE_DRIVER_MAX_DOCS", 0)
    large = _canon(_to_df(qualityops.docs_bpe_train(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_paragraph_dedup_join_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the >_BOILER_BROADCAST_MAX regime (inner shuffle_join + zero-
    partial union — the hot-set-too-big-for-driver path) and assert
    identical per-page boilerplate stats."""
    import scrapy__ray.pipelines.crawlq as crawlq

    small = _canon(_to_df(crawlq.crawl_paragraph_dedup(SF_DIR)))
    monkeypatch.setattr(crawlq, "_BOILER_BROADCAST_MAX", 0)
    large = _canon(_to_df(crawlq.crawl_paragraph_dedup(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_parts_small_qty_join_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the >_PART_BROADCAST_MAX regime (brand lookup via shuffle_join
    on partkey — the SF-scaled-part path) and assert identical rollup."""
    import scrapy__ray.pipelines.relational as relational

    small = _canon(_to_df(relational.parts_small_qty_revenue(SF_DIR)))
    monkeypatch.setattr(relational, "_PART_BROADCAST_MAX", 0)
    large = _canon(_to_df(relational.parts_small_qty_revenue(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_dedup_incremental_join_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the >_SNAPSHOT_BROADCAST_MAX regime (distinct snapshot hashes
    as a dataset, semi-join via inner join + zero-partial union) and assert
    identical flags."""
    import scrapy__ray.pipelines.textops as textops

    small = _canon(_to_df(textops.docs_dedup_incremental(SF_DIR)))
    monkeypatch.setattr(textops, "_SNAPSHOT_BROADCAST_MAX", 0)
    large = _canon(_to_df(textops.docs_dedup_incremental(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


# (events_cohort_retention needs no forced-regime test: the rewrite is a
# single user-keyed exchange with no join and no broadcast/dataset split —
# the SQL-oracle equality above is the full correctness gate.)


def test_pmi_join_regime_matches_broadcast(ray_session, monkeypatch):
    """Force the >_PMI_BROADCAST_MAX_DOCS regime (unigram counts attached
    via two token-keyed shuffle_joins — vocabulary never broadcast) and
    assert identical top collocations."""
    import scrapy__ray.pipelines.textops as textops

    small = _canon(_to_df(textops.docs_pmi_bigrams(SF_DIR)))
    monkeypatch.setattr(textops, "_PMI_BROADCAST_MAX_DOCS", 0)
    large = _canon(_to_df(textops.docs_pmi_bigrams(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_containment_sizes_shuffle_regime_matches_broadcast(ray_session, monkeypatch):
    """docs_containment_dups through the forced >_SIZES_BROADCAST_MAX
    regime (shuffle_agg sizes + two shuffle_joins) — identical pairs to the
    broadcast regime, same contract as the jaccard sibling."""
    import scrapy__ray.pipelines.textops as textops

    small = _canon(_to_df(textops.docs_containment_dups(SF_DIR)))
    monkeypatch.setattr(textops, "_SIZES_BROADCAST_MAX", 0)
    large = _canon(_to_df(textops.docs_containment_dups(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_edit_dups_large_regime_matches_small(ray_session, monkeypatch):
    """Force the endpoint shuffle-join verify path for the edit-distance
    pair verifier and assert byte-identical similarities."""
    import scrapy__ray.pipelines.textops as textops

    small = _canon(_to_df(textops.docs_edit_dups(SF_DIR)))
    monkeypatch.setattr(textops, "_MINHASH_PUSHDOWN_MAX_IDS", 0)
    large = _canon(_to_df(textops.docs_edit_dups(SF_DIR)))
    pd.testing.assert_frame_equal(small, large, check_dtype=False, check_exact=True)


def test_token_edit_distance_matches_classic_dp():
    """The row-rolling min-accumulate kernel vs the textbook full-matrix DP
    on randomized token lists (including empty and identical lists)."""
    import random

    from scrapy__ray.pipelines.textops import _token_edit_distance

    def classic(a, b):
        n, m = len(a), len(b)
        prev = list(range(m + 1))
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[m]

    rng = random.Random(7)
    vocab = ["a", "b", "c", "d", "e"]
    cases = [([], []), ([], ["a"]), (["a", "b"], []), (["a"], ["a"])]
    for _ in range(60):
        a = [rng.choice(vocab) for _ in range(rng.randrange(0, 15))]
        b = [rng.choice(vocab) for _ in range(rng.randrange(0, 15))]
        cases.append((a, b))
    for a, b in cases:
        assert _token_edit_distance(a, b) == classic(a, b), (a, b)
