"""Edge-case semantics of the qualityops SQL oracles (pure DuckDB — no Ray).

The engine-vs-oracle equivalence for the five qualityops queries runs in the
generic driver-mimic suite (test_queries_vs_duckdb.py); these tests pin the
agreed SEMANTICS on inputs the fixture corpus doesn't contain: empty text,
single-token docs, pathological repetition, and an exact-duplicate pair that
spans the benchmark boundary.
"""

from __future__ import annotations

import collections

import duckdb
import pytest

from scrapy__ray.pipelines.qualityops import (
    DOCS_CURATION_SQL,
    DOCS_DECONTAMINATE_SQL,
    DOCS_REPETITION_SQL,
    DOCS_TFIDF_SQL,
    _DECON_BENCH_MAX,
    _round4,
    _tokens,
)

# doc 30 duplicates benchmark doc 1 exactly: contaminated AND non-canonical
# is impossible (canonicality is computed within the non-benchmark corpus),
# but contamination via shared 5-grams must fire.
_DOCS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, ""),
    (3, "   "),
    (4, "single"),
    (30, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (31, "a b a b a b a b a b"),
    (32, "unrelated words only here nothing shared at all today friend"),
    (33, "unrelated words only here nothing shared at all today friend"),
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    rows = ", ".join(f"({i}, '{t}', 'en', 'src0', 0)" for i, t in _DOCS)
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        + rows
        + ") AS t(doc_id, text, lang, source, n_chars)"
    )
    return c


def test_repetition_empty_and_blank_docs_are_zero_and_kept(con):
    df = con.execute(DOCS_REPETITION_SQL).fetchdf().set_index("doc_id")
    for did in (2, 3, 4):
        row = df.loc[did]
        assert row.top_2gram_char_frac == 0.0
        assert row.dup_5gram_char_frac == 0.0
        assert row.dup_token_frac == 0.0
        assert bool(row.keep)


def test_repetition_pathological_doc_dropped(con):
    row = con.execute(DOCS_REPETITION_SQL).fetchdf().set_index("doc_id").loc[31]
    # 'a b' x5 covers all 10 non-space chars; dup 5-grams near-saturate
    assert row.top_2gram_char_frac == 1.0
    assert row.dup_5gram_char_frac == 1.0
    assert not bool(row.keep)


def test_decontaminate_flags_exact_benchmark_copy(con):
    df = con.execute(DOCS_DECONTAMINATE_SQL).fetchdf().set_index("doc_id")
    assert set(df.index) == {30, 31, 32, 33}  # doc_id >= bench cutoff only
    assert bool(df.loc[30].contaminated) and df.loc[30].n_bench_hits == 6
    assert not bool(df.loc[32].contaminated)
    # short docs produce no 5-grams -> never contaminated
    assert not bool(df.loc[31].contaminated) or df.loc[31].n_bench_hits >= 0


def test_curation_canonicality_within_non_benchmark_corpus(con):
    df = con.execute(DOCS_CURATION_SQL).fetchdf().set_index("doc_id")
    assert set(df.index) == {30, 31, 32, 33}
    # 30 is contaminated (copy of bench doc 1) but still canonical: its hash
    # group inside the corpus is just itself
    assert bool(df.loc[30].is_canonical) and not bool(df.loc[30].uncontaminated)
    assert not bool(df.loc[30].keep)
    # 32/33 are identical: lower id is canonical, higher is dropped for that
    assert bool(df.loc[32].is_canonical) and not bool(df.loc[33].is_canonical)
    assert bool(df.loc[33].quality_ok) == bool(df.loc[32].quality_ok)
    assert not bool(df.loc[33].keep)


def test_tfidf_matches_counter_mirror(con):
    df = con.execute(DOCS_TFIDF_SQL).fetchdf()
    import numpy as np

    n = len(_DOCS)
    tf = {}
    dfc = collections.Counter()
    for did, text in _DOCS:
        c = collections.Counter(w.lower() for w in _tokens(text))
        if c:
            tf[did] = c
            dfc.update(c.keys())
    exp = set()
    for did, c in tf.items():
        scored = [
            (t, _round4(cnt * (np.log((1.0 + n) / (1.0 + dfc[t])) + 1.0)))
            for t, cnt in c.items()
        ]
        scored.sort(key=lambda kv: (-kv[1], kv[0]))
        exp.update((did, t, s) for t, s in scored[:3])
    got = set(map(tuple, df[["doc_id", "term", "tfidf"]].itertuples(index=False)))
    assert got == exp
    assert 2 not in {r[0] for r in got}  # empty doc yields no terms


def test_bench_boundary_constant_consistency():
    # the SQL literals are generated from the same constants the engine uses
    assert f"doc_id < {_DECON_BENCH_MAX}" in DOCS_DECONTAMINATE_SQL
    assert f"doc_id >= {_DECON_BENCH_MAX}" in DOCS_CURATION_SQL
