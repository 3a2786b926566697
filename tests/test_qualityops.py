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

SF_DIR = "/root/testdata/sf0.01"

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


# ------------------------------------------------------- sequence packing
def test_pack_sequences_sql_semantics(con):
    """Pin the packing contract on the edge docs: empty/whitespace docs
    emit nothing; spans are contiguous, cover every doc's tokens exactly
    once, and respect the _SEQ_LEN boundary."""
    from scrapy__ray.pipelines.qualityops import DOCS_PACK_SQL, _SEQ_LEN

    rows = con.execute(DOCS_PACK_SQL).fetchall()
    by_doc = collections.defaultdict(int)
    for doc_id, seq_id, tok_start, tok_count in rows:
        assert 0 <= tok_start < _SEQ_LEN
        assert 1 <= tok_count <= _SEQ_LEN - tok_start
        by_doc[doc_id] += tok_count
    # every non-empty doc's token count is fully covered, empties absent
    for doc_id, text in _DOCS:
        n = len(_tokens(text))
        if n == 0:
            assert doc_id not in by_doc
        else:
            assert by_doc[doc_id] == n
    # global stream: sequence s gets exactly _SEQ_LEN tokens except the last
    per_seq = collections.defaultdict(int)
    for _d, s, _ts, tc in rows:
        per_seq[s] += tc
    seqs = sorted(per_seq)
    total = sum(len(_tokens(t)) for _i, t in _DOCS)
    assert seqs == list(range(total // _SEQ_LEN + (1 if total % _SEQ_LEN else 0)))
    for s in seqs[:-1]:
        assert per_seq[s] == _SEQ_LEN
    assert per_seq[seqs[-1]] == total - _SEQ_LEN * (len(seqs) - 1)


def test_pack_sequences_straddle():
    """A doc longer than _SEQ_LEN straddles sequences with correct offsets."""
    from scrapy__ray.pipelines.qualityops import DOCS_PACK_SQL, _SEQ_LEN

    c = duckdb.connect()
    long_text = " ".join(["w"] * (_SEQ_LEN + 7))
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, 'a b c', 'en', 's', 0), (2, '{long_text}', 'en', 's', 0)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    rows = sorted(c.execute(DOCS_PACK_SQL).fetchall())
    # doc 1: tokens 0..2 of seq 0; doc 2: tokens 3.._SEQ_LEN-1 of seq 0
    # (that's _SEQ_LEN-3 tokens) then 10 tokens at the start of seq 1
    assert rows == [
        (1, 0, 0, 3),
        (2, 0, 3, _SEQ_LEN - 3),
        (2, 1, 0, 10),
    ]


# ------------------------------------------- DSIR importance weights
def test_dsir_ratio_table_spec():
    """The shared spec function: Laplace smoothing, target/raw asymmetry,
    integer fixing — checked against hand-computed values."""
    import math

    import numpy as np

    from scrapy__ray.pipelines.qualityops import _DSIR_BUCKETS, dsir_ratio_table

    c_all = np.zeros(_DSIR_BUCKETS, np.int64)
    c_tgt = np.zeros(_DSIR_BUCKETS, np.int64)
    c_all[0], c_tgt[0] = 100, 90   # target-enriched bucket
    c_all[1], c_tgt[1] = 100, 0    # target-absent bucket
    rt = dsir_ratio_table(c_all, c_tgt)
    tgt_tot = 90 + _DSIR_BUCKETS
    all_tot = 200 + _DSIR_BUCKETS
    exp0 = (math.log(91 / tgt_tot) - math.log(101 / all_tot)) * 1e6
    assert rt[0] == int(math.copysign(math.floor(abs(exp0) + 0.5), exp0))
    # the target-absent bucket scores far below the target-enriched one
    assert rt[1] < rt[0]
    exp1 = (math.log(1 / tgt_tot) - math.log(101 / all_tot)) * 1e6
    assert rt[1] == int(math.copysign(math.floor(abs(exp1) + 0.5), exp1))
    # untouched buckets: log(1/tgt_tot) - log(1/all_tot) = log(all/tgt) > 0
    exp_empty = math.log(all_tot / tgt_tot) * 1e6
    assert rt[2] == int(math.floor(exp_empty + 0.5))


def test_dsir_buckets_features():
    from scrapy__ray.pipelines.qualityops import _dsir_buckets

    assert len(_dsir_buckets("")) == 0
    assert len(_dsir_buckets("one")) == 1          # 1 unigram, 0 bigrams
    assert len(_dsir_buckets("one two three")) == 5  # 3 + 2
    # determinism
    assert list(_dsir_buckets("a b")) == list(_dsir_buckets("a b"))


def test_lm_nll_table_spec():
    """Hand-check the NLL table: unseen buckets score log(total+B), seen
    buckets less; integer fixing is half-up in 1e-6-nat units."""
    import math

    import numpy as np

    from scrapy__ray.pipelines.qualityops import _LM_BUCKETS, lm_nll_table

    c = np.zeros(_LM_BUCKETS, np.int64)
    c[5] = 99
    t = lm_nll_table(c)
    total = 99 + _LM_BUCKETS
    assert t[5] == int(math.floor((math.log(total) - math.log(100)) * 1e6 + 0.5))
    assert t[0] == int(math.floor(math.log(total / 1) * 1e6 + 0.5))
    assert t[5] < t[0]


def test_lm_trigrams_normalization():
    from scrapy__ray.pipelines.qualityops import _lm_trigrams

    # whitespace runs collapse before trigram extraction (shared contract)
    assert list(_lm_trigrams("a   b")) == list(_lm_trigrams("a b"))
    assert len(_lm_trigrams("")) == 0
    assert len(_lm_trigrams("ab")) == 0
    assert len(_lm_trigrams("abc")) == 1
    assert len(_lm_trigrams("abcd")) == 2


# ------------------------------------------- cross-doc substring dedup
def test_substring_dups_sql_semantics():
    from scrapy__ray.pipelines.qualityops import DOCS_SUBSTRING_SQL, _SUBSTR_W

    c = duckdb.connect()
    w = _SUBSTR_W
    # doc 1 and 2 share their first W tokens verbatim; doc 3 is unique;
    # doc 4 is too short for any window; doc 5 repeats ITS OWN window
    # (within-doc repeats are distinct-collapsed, not cross-doc shares)
    shared = " ".join(f"t{i}" for i in range(w))
    uniq1 = " ".join(f"u{i}" for i in range(w))
    uniq2 = " ".join(f"v{i}" for i in range(w))
    self_rep = " ".join(f"s{i % w}" for i in range(2 * w))
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, '{shared} {uniq1}', 'en', 's', 0),"
        f"(2, '{shared} {uniq2}', 'en', 's', 0),"
        f"(3, '{uniq1.replace('u', 'w')}', 'en', 's', 0),"
        f"(4, 'short doc', 'en', 's', 0),"
        f"(5, '{self_rep}', 'en', 's', 0)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    rows = {r[0]: r for r in c.execute(DOCS_SUBSTRING_SQL).fetchall()}
    assert 4 not in rows  # < W tokens -> absent
    # docs 1/2: 2W tokens -> W+1 distinct windows; exactly 1 (the first) shared
    assert rows[1][1] == w + 1 and rows[1][2] == 1
    assert rows[2][1] == w + 1 and rows[2][2] == 1
    assert rows[3][2] == 0 and rows[3][4]  # unique doc keeps
    # doc 5: tokens s0..s{w-1} repeated twice -> every window is a rotation;
    # distinct windows = w (cyclic), none shared cross-doc
    assert rows[5][1] == w and rows[5][2] == 0 and rows[5][4]
    # keep flag threshold: shared_frac of doc 1 = 1/(w+1) <= 0.5 -> keep
    assert rows[1][4]


def test_substring_dups_fully_duplicated_pair_dropped():
    from scrapy__ray.pipelines.qualityops import DOCS_SUBSTRING_SQL, _SUBSTR_W

    c = duckdb.connect()
    text = " ".join(f"x{i}" for i in range(_SUBSTR_W + 3))
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, '{text}', 'en', 's', 0), (2, '{text}', 'en', 's', 0)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    rows = {r[0]: r for r in c.execute(DOCS_SUBSTRING_SQL).fetchall()}
    for d in (1, 2):
        assert rows[d][3] == 1.0 and not rows[d][4]  # 100% shared -> drop


def test_dup_token_frac_rounding_boundary():
    """159-distinct-of-160 tokens: (n-distinct)/n = 1/160 = 0.00625 rounds
    to 0.0063; the algebraically-equal 1 - distinct/n floats to
    0.006249999... and rounds to 0.0062 — the engine must compute the
    subtract-first form the SQL oracle uses (review r3 finding)."""
    from scrapy__ray.pipelines.qualityops import DOCS_REPETITION_SQL, _round4

    toks = [f"t{i}" for i in range(159)] + ["t0"]
    assert _round4((160 - 159) / 160) == 0.0063
    assert _round4(1.0 - 159 / 160) == 0.0062  # the broken form, for contrast
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, '{' '.join(toks)}', 'en', 's', 0)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    sql_val = c.execute(DOCS_REPETITION_SQL).fetchdf().dup_token_frac[0]
    assert sql_val == 0.0063 == _round4((160 - 159) / 160)


def test_chunk_overlap_sql_semantics():
    """Pin the chunking contract: n <= C -> one full chunk; stride steps;
    short tail; coverage of every token position."""
    from scrapy__ray.pipelines.qualityops import (
        DOCS_CHUNK_SQL, _CHUNK_LEN, _CHUNK_STRIDE,
    )

    C, S = _CHUNK_LEN, _CHUNK_STRIDE
    c = duckdb.connect()
    mk = lambda n: " ".join(f"t{i}" for i in range(n))
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        f"(1, '{mk(5)}', 'en', 's', 0),"        # tiny: one 5-token chunk
        f"(2, '{mk(C)}', 'en', 's', 0),"        # exactly C: one chunk
        f"(3, '{mk(C + 1)}', 'en', 's', 0),"    # C+1: second chunk at S
        f"(4, '{mk(2 * S + C)}', 'en', 's', 0)," # three full strides
        "(5, '', 'en', 's', 0)"
        ") AS t(doc_id, text, lang, source, n_chars)"
    )
    rows = collections.defaultdict(list)
    for doc_id, k, st, ln in c.execute(DOCS_CHUNK_SQL).fetchall():
        rows[doc_id].append((k, st, ln))
    assert rows[1] == [(0, 0, 5)]
    assert rows[2] == [(0, 0, C)]
    assert rows[3] == [(0, 0, C), (1, S, C + 1 - S)]
    assert rows[4] == [(0, 0, C), (1, S, C), (2, 2 * S, C)]
    assert 5 not in rows
    # coverage: every token index of doc 4 falls in >= 1 chunk
    n = 2 * S + C
    covered = set()
    for _k, st, ln in rows[4]:
        covered.update(range(st, st + ln))
    assert covered == set(range(n))


def test_bpe_merge_helpers_sennrich_example():
    """The paper's worked example: {'low':5,'lower':2,'newest':6,'widest':3}.
    First three merges: (e,s) 9 — the lexicographic winner of the 9-count
    tie with (s,t) — then (es,t) 9, then (l,o) 7."""
    from scrapy__ray.pipelines.qualityops import (
        _bpe_apply,
        _bpe_best,
        _bpe_pair_counts,
    )

    table = {
        tuple("low"): 5,
        tuple("lower"): 2,
        tuple("newest"): 6,
        tuple("widest"): 3,
    }
    expected = [("e", "s", 9), ("es", "t", 9), ("l", "o", 7)]
    for left, right, cnt in expected:
        (bl, br), bc = _bpe_best(_bpe_pair_counts(table.keys(), table.values()))
        assert (bl, br, bc) == (left, right, cnt)
        table = {_bpe_apply(s, bl, br): c for s, c in table.items()}
    assert tuple("newest".replace("est", "\x00")) not in table  # sanity
    assert ("n", "e", "w", "est") in table
    assert ("w", "i", "d", "est") in table
    assert ("lo", "w") in table and ("lo", "w", "e", "r") in table


def test_bpe_apply_overlapping_run_left_to_right():
    from scrapy__ray.pipelines.qualityops import _bpe_apply, _bpe_pair_counts

    # counting sees every adjacency (3 in 'aaaa'); applying merges
    # left-to-right non-overlapping -> ('aa','aa'), odd run keeps the tail
    assert _bpe_pair_counts([tuple("aaaa")], [1])[("a", "a")] == 3
    assert _bpe_apply(tuple("aaaa"), "a", "a") == ("aa", "aa")
    assert _bpe_apply(tuple("aaaaa"), "a", "a") == ("aa", "aa", "a")
    assert _bpe_apply(("x",), "a", "a") == ("x",)


def test_bpe_best_is_total_order():
    import collections as _c

    from scrapy__ray.pipelines.qualityops import _bpe_best

    assert _bpe_best(_c.Counter()) is None
    pairs = _c.Counter({("b", "a"): 5, ("a", "z"): 5, ("a", "b"): 4})
    assert _bpe_best(pairs) == (("a", "z"), 5)


def test_bpe_encode_applies_merges_in_learned_order():
    """apply_bpe contract: characters, then each learned op once, in rank
    order, left-to-right non-overlapping — 'lower' under [(l,o),(lo,w)]
    segments to (low, e, r), and a word containing no merge pair stays
    fully character-split."""
    from scrapy__ray.pipelines.qualityops import _bpe_apply

    ops = [("l", "o"), ("lo", "w")]
    syms = tuple("lower")
    for left, right in ops:
        syms = _bpe_apply(syms, left, right)
    assert syms == ("low", "e", "r")

    syms = tuple("xyz")
    for left, right in ops:
        syms = _bpe_apply(syms, left, right)
    assert syms == ("x", "y", "z")


def test_split_assign_thresholds_and_determinism():
    """The split function is a pure per-row rule: lowercase fixed-width hex
    compares lexicographically = numerically, the train fraction lands
    within rounding of 0xcccd/0x10000, and membership is reproducible."""
    import hashlib

    from scrapy__ray.pipelines.qualityops import _SPLIT_TRAIN_LT, _SPLIT_VAL_LT

    assert abs(int(_SPLIT_TRAIN_LT, 16) / 0x10000 - 0.8) < 1e-4
    assert abs(int(_SPLIT_VAL_LT, 16) / 0x10000 - 0.9) < 1e-4
    n = 200_000
    counts = {"train": 0, "val": 0, "test": 0}
    for i in range(n):
        h = hashlib.md5(str(i).encode()).hexdigest()[:4]
        s = "train" if h < _SPLIT_TRAIN_LT else ("val" if h < _SPLIT_VAL_LT else "test")
        counts[s] += 1
    assert abs(counts["train"] / n - 0.8) < 0.01
    assert abs(counts["val"] / n - 0.1) < 0.005
    assert abs(counts["test"] / n - 0.1) < 0.005
    # hex-string comparison == numeric comparison at fixed width
    assert ("cccc" < _SPLIT_TRAIN_LT) and (int("cccc", 16) < int(_SPLIT_TRAIN_LT, 16))
    assert ("cccd" >= _SPLIT_TRAIN_LT) and (int("cccd", 16) >= int(_SPLIT_TRAIN_LT, 16))


def test_importance_sample_is_topk_and_weight_skewed(ray_session):
    """Gumbel-top-k must (a) return exactly k rows whose keys dominate every
    unselected doc's key is the oracle's job; here we check the cheap
    invariants: k rows, key = log_weight + Gumbel(doc_id) re-derivable per
    row, and the sample's mean log-weight exceeds the corpus mean (that is
    the point of importance resampling)."""
    from scrapy__ray.pipelines.qualityops import (
        _DSIR_SAMPLE_K,
        _dsir_gumbel_int,
        docs_importance_sample,
        docs_importance_weights,
    )

    got = docs_importance_sample(SF_DIR).to_pandas()
    assert len(got) == _DSIR_SAMPLE_K
    assert got["doc_id"].is_unique
    w = docs_importance_weights(SF_DIR).to_pandas()
    merged = got.merge(w, on="doc_id")
    assert len(merged) == _DSIR_SAMPLE_K
    # key re-derivation: key == log_weight + gumbel(doc_id), both in 1e-6
    # units (log_weight is rounded to 4 digits in BOTH outputs, so compare
    # through the unrounded gumbel to 4-digit tolerance)
    g = merged["doc_id"].map(lambda d: _dsir_gumbel_int(int(d)) / 1e6)
    assert ((merged["key"] - g) - merged["log_weight_x"]).abs().max() < 2e-4
    assert got["log_weight"].mean() > w["log_weight"].mean()
