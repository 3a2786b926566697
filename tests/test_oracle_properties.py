"""Third-implementation property tests for the round-3 SQL oracles.

The driver gate compares ENGINE vs SQL — if both encoded the same
misunderstanding, it would pass anyway.  These tests pit each SQL oracle
against a THIRD, deliberately naive pure-Python implementation on random
hypothesis-generated inputs (pure DuckDB, no Ray), so a shared-spec bug
has to fool three independent formulations to survive.
"""

from __future__ import annotations

import duckdb
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from scrapy__ray.pipelines.qualityops import (
    DOCS_CHUNK_SQL,
    DOCS_PACK_SQL,
    DOCS_SUBSTRING_SQL,
    _CHUNK_LEN,
    _CHUNK_STRIDE,
    _SEQ_LEN,
    _SUBSTR_KEEP_MAX,
    _SUBSTR_W,
    _round4,
)
from scrapy__ray.pipelines.streamops import _RANGE_US, EVENTS_RANGE_SQL

# small token alphabet => plenty of cross-doc collisions for substring dups
_tok = st.sampled_from(["aa", "bb", "cc", "dd"])
_doc = st.lists(_tok, min_size=0, max_size=30).map(" ".join)


def _docs_view(con, texts):
    rows = ", ".join(f"({i}, '{t}', 'en', 's', 0)" for i, t in enumerate(texts))
    con.execute(
        "CREATE OR REPLACE VIEW documents AS SELECT * FROM (VALUES "
        + rows
        + ") AS t(doc_id, text, lang, source, n_chars)"
    )


@given(st.lists(_doc, min_size=1, max_size=12))
@settings(max_examples=40, deadline=None)
def test_pack_sequences_sql_vs_naive(texts):
    con = duckdb.connect()
    _docs_view(con, texts)
    got = sorted(map(tuple, con.execute(DOCS_PACK_SQL).fetchall()))
    # naive: walk the concatenated token stream one doc at a time
    exp = []
    pos = 0
    for doc_id, t in enumerate(texts):
        n = len(t.split()) if t.strip() else 0
        for off in range(n):
            g = pos + off
            seq, in_seq = divmod(g, _SEQ_LEN)
            exp.append((doc_id, seq, in_seq))
        pos += n
    # fold per-token rows into (doc, seq) spans
    spans = {}
    for doc_id, seq, in_seq in exp:
        k = (doc_id, seq)
        lo, cnt = spans.get(k, (in_seq, 0))
        spans[k] = (min(lo, in_seq), cnt + 1)
    exp_spans = sorted((d, s, lo, c) for (d, s), (lo, c) in spans.items())
    assert got == exp_spans


@given(st.lists(_doc, min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_chunk_overlap_sql_vs_naive(texts):
    con = duckdb.connect()
    _docs_view(con, texts)
    got = sorted(map(tuple, con.execute(DOCS_CHUNK_SQL).fetchall()))
    exp = []
    for doc_id, t in enumerate(texts):
        n = len(t.split()) if t.strip() else 0
        if n == 0:
            continue
        k = 0
        while True:
            start = k * _CHUNK_STRIDE
            exp.append((doc_id, k, start, min(_CHUNK_LEN, n - start)))
            if start + _CHUNK_LEN >= n:
                break
            k += 1
    assert got == sorted(exp)


@given(st.lists(_doc, min_size=1, max_size=10))
@settings(max_examples=40, deadline=None)
def test_substring_dups_sql_vs_naive(texts):
    con = duckdb.connect()
    _docs_view(con, texts)
    got = sorted(map(tuple, con.execute(DOCS_SUBSTRING_SQL).fetchall()))
    windows = {}
    for doc_id, t in enumerate(texts):
        toks = t.split() if t.strip() else []
        if len(toks) < _SUBSTR_W:
            continue
        windows[doc_id] = {
            " ".join(toks[i : i + _SUBSTR_W])
            for i in range(len(toks) - _SUBSTR_W + 1)
        }
    dfreq = {}
    for ws in windows.values():
        for w in ws:
            dfreq[w] = dfreq.get(w, 0) + 1
    exp = []
    for doc_id, ws in windows.items():
        n = len(ws)
        s = sum(1 for w in ws if dfreq[w] >= 2)
        frac = _round4(s / n)
        exp.append((doc_id, n, s, frac, frac <= _SUBSTR_KEEP_MAX))
    assert got == sorted(exp)


@given(
    st.lists(
        st.tuples(
            st.integers(0, 2),                      # user
            st.integers(0, 8_000_000_000),          # µs offset (~2.2 h span)
            st.sampled_from(["view", "purchase", "click"]),
            st.integers(0, 50),                     # value in whole units
        ),
        min_size=1,
        max_size=25,
    )
)
@settings(max_examples=40, deadline=None)
def test_range_join_sql_vs_naive(rows):
    con = duckdb.connect()
    vals = ", ".join(
        f"({i}, TIMESTAMP '2024-01-01 00:00:00' + INTERVAL ({us}) MICROSECOND,"
        f" {u}, '{ty}', {v}.0, '')"
        for i, (u, us, ty, v) in enumerate(rows)
    )
    con.execute(
        "CREATE OR REPLACE VIEW events AS SELECT * FROM (VALUES "
        + vals
        + ") AS t(event_id, ts, user_id, event_type, value, props)"
    )
    got = sorted(map(tuple, con.execute(EVENTS_RANGE_SQL).fetchall()))
    exp = []
    for i, (u, us, ty, _v) in enumerate(rows):
        if ty != "view":
            continue
        n, s = 0, 0
        for _j, (u2, us2, ty2, v2) in enumerate(rows):
            if ty2 == "purchase" and u2 == u and us <= us2 < us + _RANGE_US:
                n += 1
                s += v2
        exp.append((i, n, float(s)))
    assert got == sorted(exp)


def test_pca_moment_partials_block_split_invariant():
    """emb_pca's design claim: the exact-integer scatter makes the final
    eigen output bit-identical for ANY block split and merge order."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from scrapy__ray.pipelines.simops import _pca_moment_partial, _pca_merge

    rng = np.random.default_rng(7)
    emb = rng.normal(scale=0.4, size=(257, 16))
    ids = np.arange(257, dtype=np.int64)

    def tbl(sl):
        return pa.table(
            {
                "vec_id": pa.array(ids[sl], pa.int64()),
                "embedding": pa.array(list(emb[sl]), pa.list_(pa.float32())),
            }
        )

    whole = _pca_merge(_pca_moment_partial(tbl(slice(None))))
    splits = [
        [slice(0, 100), slice(100, 257)],
        [slice(0, 1), slice(1, 256), slice(256, 257)],
        [slice(0, 257, 2), slice(1, 257, 2)],
    ]
    for parts in splits:
        df = pd.concat(
            [_pca_moment_partial(tbl(s)) for s in reversed(parts)],
            ignore_index=True,
        )
        got = _pca_merge(df)
        assert got["eigenvalue"].tolist() == whole["eigenvalue"].tolist()
        assert got["explained_ratio"].tolist() == whole["explained_ratio"].tolist()
