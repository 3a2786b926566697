"""Text / training-data operators over the ``documents`` table.

The large-scale-pipeline operator set: exact + near deduplication, document
fingerprinting, token statistics, language ID, quality scoring, and the
multimodal plumbing stub — each as a Ray Data pipeline; SQL-expressible ones
carry a DuckDB oracle with identical column names.

Tokenization contract shared by engine and SQL:
    tokens  = regex split of trim(text) on \\s+
    n_chars = len(regexp_replace(trim(text), '\\s+', '', 'g'))
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from scrapy__ray.pipelines.util import (
    collect_arrow,
    driver_agg,
    ensure_ctx,
    hash_partition_map,
    read_parquet,
    round_col,
    shuffle_agg,
    shuffle_join,
)

_PAIR_SCHEMA = pa.schema(
    [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("jaccard", pa.float64())]
)

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else []


# ------------------------------------------------------------- exact dedup
def docs_exact_dedup(sf_dir: str):
    """Exact dedup: content-hash inside map_batches (vectorizable stage),
    then partial-agg -> hash-shuffle by hash -> per-partition first pick —
    the canonical 'hash-partition + per-group first' pattern."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def hashed(t: pa.Table) -> pa.Table:
        h = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.table({"text_hash": pa.array(h, pa.string()), "doc_id": t["doc_id"]})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_hash", as_index=False).agg(
            n_dups=("doc_id", "size"), keep_doc_id=("doc_id", "min")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_hash", as_index=False).agg(
            n_dups=("n_dups", "sum"), keep_doc_id=("keep_doc_id", "min")
        )

    out = collect_arrow(
        shuffle_agg(
            ds.map_batches(hashed, batch_format="pyarrow"),
            ["text_hash"], partial, final,
        ),
        pa.schema(
            [
                ("text_hash", pa.string()),
                ("n_dups", pa.int64()),
                ("keep_doc_id", pa.int64()),
            ]
        ),
    )
    return out


DOCS_EXACT_DEDUP_SQL = """
SELECT md5(text) AS text_hash, COUNT(*) AS n_dups, MIN(doc_id) AS keep_doc_id
FROM documents GROUP BY md5(text)
"""


# ------------------------------------------------------------- token stats
def docs_token_stats(sf_dir: str):
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        ids, ntok, avglen = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _tokens(text)
            n = len(toks)
            chars = sum(len(w) for w in toks)
            ids.append(did)
            ntok.append(n)
            avglen.append(chars / n if n else 0.0)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "avg_token_len": pa.array(round_col(avglen, 4), pa.float64()),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


DOCS_TOKEN_STATS_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tokens,
       CASE WHEN trim(text) = '' THEN 0.0
            ELSE ROUND(len(regexp_replace(trim(text), '\\s+', '', 'g'))::DOUBLE
                 / len(regexp_split_to_array(trim(text), '\\s+')), 4) END AS avg_token_len
FROM documents
"""


# -------------------------------------------------- grouped quality stats
def docs_stats_by_lang(sf_dir: str):
    """Few (lang, source) groups -> combiner + driver reduce, no shuffle."""
    ds = read_parquet(sf_dir, "documents", columns=["lang", "source", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), chars=("n_chars", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_docs", "sum"), chars=("chars", "sum")
        )

    out = driver_agg(ds, partial, final)
    return pa.table(
        {
            "lang": out["lang"],
            "source": out["source"],
            "n_docs": pa.array(out["n_docs"].astype("int64"), pa.int64()),
            "sum_chars": pa.array(out["chars"].astype("int64"), pa.int64()),
            "avg_chars": round_col(out["chars"] / out["n_docs"], 2),
        }
    )


DOCS_STATS_BY_LANG_SQL = """
SELECT lang, source, COUNT(*) AS n_docs, SUM(n_chars)::BIGINT AS sum_chars,
       ROUND(SUM(n_chars)::DOUBLE / COUNT(*), 2) AS avg_chars
FROM documents GROUP BY lang, source
"""


# --------------------------------------------------- document fingerprint
def docs_fingerprint(sf_dir: str):
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fingerprint": pa.array(
                    [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()],
                    pa.string(),
                ),
            }
        )

    return ds.map_batches(fp, batch_format="pyarrow")


DOCS_FINGERPRINT_SQL = "SELECT doc_id, md5(text) AS fingerprint FROM documents"


# ------------------------------------------- exact token-set Jaccard dups
JACCARD_THRESHOLD = 0.5
#: max-containment cutoff for the asymmetric detector: |A∩B| / min(|A|,|B|)
#: ≥ 0.9 means the smaller doc's token set is ≥90% inside the larger one
CONTAINMENT_THRESHOLD = 0.9


_PAIR_EMPTY = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])


def _segment_pairs(t: pa.Table, seg_cols: list[str]) -> pa.Table:
    """Within each key segment of a hash partition, emit all doc_id pairs
    (a < b).  Arrow-native since round 5 (the exchange delivers Arrow
    blocks; the old pandas formulation converted the huge posting-list
    block both ways per partition): dictionary-encode the segment key to
    integer codes, lexsort, find boundaries, meshgrid per segment —
    vectorized inside segments, no per-group UDF dispatch."""
    if t.num_rows == 0:
        return _PAIR_EMPTY.empty_table()
    if len(seg_cols) == 1:
        key_arr = t.column(seg_cols[0])
    else:
        key_arr = pc.binary_join_element_wise(
            *[pc.cast(t.column(c), pa.string()) for c in seg_cols], "\x00"
        )
    if isinstance(key_arr, pa.ChunkedArray):
        key_arr = key_arr.combine_chunks()
    codes = pc.dictionary_encode(key_arr).indices.to_numpy(
        zero_copy_only=False
    )
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, codes))
    codes_s, ids_s = codes[order], ids[order]
    bounds = np.concatenate(
        [[0], np.nonzero(codes_s[1:] != codes_s[:-1])[0] + 1, [len(codes_s)]]
    )
    # skip singleton segments BEFORE the Python loop: with near-unique
    # features (n-gram shingles) almost every posting list has df=1 and
    # cannot pair — iterating them dominated wall time (measured 8x on the
    # shingle variant)
    lens = np.diff(bounds)
    pairing = np.nonzero(lens >= 2)[0]
    out_a, out_b = [], []
    for gi in pairing:
        seg = ids_s[bounds[gi] : bounds[gi + 1]]
        a, b = np.meshgrid(seg, seg, indexing="ij")
        m = a < b
        out_a.append(a[m])
        out_b.append(b[m])
    if not out_a:
        return _PAIR_EMPTY.empty_table()
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def _df_capped_segments(t: pa.Table, max_df: int | None) -> pa.Table:
    """Drop tokens whose document frequency exceeds ``max_df``.  The input is
    hash-partitioned by ``w``, so a token's full posting list is in exactly
    one partition and df = partition-wide value count — the cap costs one
    dictionary-encode.  Arrow in/out (zero-copy from the exchange)."""
    if max_df is None or t.num_rows == 0:
        return t
    w = t.column("w")
    if isinstance(w, pa.ChunkedArray):
        w = w.combine_chunks()
    enc = pc.dictionary_encode(w)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    counts = np.bincount(idx, minlength=len(enc.dictionary))
    return t.filter(pa.array(counts[idx] <= max_df))


# Production document-frequency cap for the exact-Jaccard pair expansion: a
# token appearing in d documents emits d²/2 candidate pairs, so uncapped
# hot tokens (stopwords) are quadratic in corpus size.  1000 bounds any
# token's pair contribution at ~500k rows while leaving every
# discriminative token intact — at sf0.01 oracle scale (max df 402) the
# cap does not bind, so the correctness gate compares the full result.
# Pass max_df=None explicitly for the uncapped (quadratic) variant.
JACCARD_MAX_DF = 1000

#: docs_jaccard_dups result memo, keyed by (sf_dir, max_df) — see docstring
_JACCARD_MEMO: dict[tuple, object] = {}

#: Jaccard size-lookup regime switch: corpora at or below this many docs
#: broadcast the per-doc set-size table (16 B/doc -> ≤ 32 MB) instead of
#: running a shuffle_agg + two shuffle_joins; above it the all-dataset
#: path keeps the driver out of the data plane entirely.
_SIZES_BROADCAST_MAX = 2_000_000


def _ngrams(text: str, n: int = 3) -> set[str]:
    """Distinct word n-gram shingles (contract mirrored by the SQL oracle:
    docs with fewer than n tokens contribute none)."""
    toks = _tokens(text)
    return {
        " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
    } if len(toks) >= n else set()


def docs_jaccard_dups(sf_dir: str, max_df: int | None = JACCARD_MAX_DF):
    """Exact token-set Jaccard near-dup pairs via a distributed inverted
    index — no driver-side reads anywhere:

      explode (token, doc) -> hash-partition by token (the inverted index,
      materialized once and reused by both branches)
        branch A: per-token-segment co-occurrence pairs -> partial counts ->
                  hash-shuffle by pair -> |A∩B|
        branch B: per-doc token counts -> hash-shuffle by doc -> |A| sizes
      -> shuffle-join A with B on doc_a then doc_b -> threshold.

    ``max_df`` prunes tokens whose document frequency exceeds it BEFORE the
    quadratic pair expansion — the standard hot-token defence at corpus
    scale (a token in d docs yields d² pairs).  The cap redefines the token
    universe for BOTH intersections and set sizes, so engine and SQL stay
    exactly equal for every ``max_df`` because the SQL oracle applies the
    identical df filter (docs_jaccard_sql shares the default).  The
    production default JACCARD_MAX_DF makes the operator subquadratic by
    construction; ``max_df=None`` opts into the exact uncapped variant.
    """
    # memoized per (sf_dir, max_df) like the pinned crawl (crawlq._CRAWL_MEMO):
    # docs_dup_clusters chains this exact pair set, so one bench/driver pass
    # would otherwise run the whole detector twice.  The pair table is the
    # near-dup set — orders of magnitude smaller than the corpus.
    key = (sf_dir, max_df)
    if key not in _JACCARD_MEMO:
        _JACCARD_MEMO[key] = _set_jaccard_pairs(
            sf_dir, lambda text: set(_tokens(text)), max_df
        )
    return _JACCARD_MEMO[key]


def docs_containment_dups(sf_dir: str, max_df: int | None = JACCARD_MAX_DF):
    """Asymmetric near-dup pairs by max-containment — |A∩B| / min(|A|,|B|)
    ≥ CONTAINMENT_THRESHOLD over token sets (Broder's containment measure,
    the quote/boilerplate-wrap detector: a short doc pasted inside a long
    one scores ~1.0 where symmetric Jaccard dilutes toward |A|/|B|).  Same
    distributed inverted-index core and df-cap defence as
    docs_jaccard_dups; only the verify formula differs, so the scale
    posture is identical (subquadratic by construction at the production
    ``max_df``)."""
    return _set_jaccard_pairs(
        sf_dir, lambda text: set(_tokens(text)), max_df, score="containment"
    )


def docs_ngram_jaccard_dups(sf_dir: str, max_df: int | None = JACCARD_MAX_DF):
    """Exact 3-gram-shingle Jaccard near-dup pairs — the n-gram variant of
    the dedup family (same distributed inverted-index core, feature = word
    trigram instead of token).  Shingles are near-unique by construction
    (document frequency is naturally tiny), so this is the well-conditioned
    exact detector on corpora whose token vocabulary is stopword-dense;
    MinHash+LSH (docs_minhash_lsh) approximates exactly this measure."""
    return _set_jaccard_pairs(sf_dir, _ngrams, max_df)


def _set_jaccard_pairs(
    sf_dir: str, feature_fn, max_df: int | None, score: str = "jaccard"
):
    """Shared set-similarity core: ``feature_fn(text) -> set[str]`` defines
    the universe; everything downstream (inverted index, df cap, pair
    counting, size join, threshold) is feature-agnostic.  ``score`` picks
    the pair measure: ``"jaccard"`` = |A∩B|/|A∪B| ≥ JACCARD_THRESHOLD,
    ``"containment"`` = |A∩B|/min(|A|,|B|) ≥ CONTAINMENT_THRESHOLD (the
    asymmetric detector — a small doc embedded in a big one scores ~1.0
    where Jaccard dilutes toward 0)."""
    if score == "containment":
        score_col, score_thr = "containment", CONTAINMENT_THRESHOLD

        def score_fn(i, sz_a, sz_b):
            return i / np.minimum(sz_a, sz_b)

    else:
        score_col, score_thr = "jaccard", JACCARD_THRESHOLD

        def score_fn(i, sz_a, sz_b):
            return i / (sz_a + sz_b - i)

    out_schema = pa.schema(
        [("doc_a", pa.int64()), ("doc_b", pa.int64()), (score_col, pa.float64())]
    )
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        toks, ids = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for w in feature_fn(text):
                toks.append(w)
                ids.append(did)
        return pa.table({"w": pa.array(toks, pa.string()), "doc_id": pa.array(ids, pa.int64())})

    # the inverted index: every posting list of a token in one partition;
    # materialized so the pair branch and the size branch execute it once
    from scrapy__ray.pipelines.util import auto_partitions

    inverted = (
        ds.map_batches(explode, batch_format="pyarrow")
        .repartition(auto_partitions(), keys=["w"], sort=False)
        .map_batches(
            lambda t: _df_capped_segments(t, max_df),
            batch_format="pyarrow",
            batch_size=None,
        )
        .materialize()
    )

    # branch A: intersection counts per candidate pair
    pair_rows = inverted.map_batches(
        lambda t: _segment_pairs(t, ["w"]), batch_format="pyarrow", batch_size=None
    )

    def partial_count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).size()
        return g.rename(columns={"size": "i"})

    def final_count(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["doc_a", "doc_b"], as_index=False)["i"].sum()

    inter = shuffle_agg(pair_rows, ["doc_a", "doc_b"], partial_count, final_count)

    # branch B: |token set| per doc (post-cap) — TWO-REGIME like the
    # MinHash verify path.  Below _SIZES_BROADCAST_MAX documents the sizes
    # table (16 B/doc) folds to the driver via mergeable partials over the
    # already-materialized inverted index (ZERO extra exchanges) and rides
    # back as a broadcast lookup, replacing a shuffle_agg + two
    # shuffle_joins whose fixed aggregator spin-up dwarfs the data at
    # bench scale.  Above the threshold — the 10^10-doc design point,
    # where a sizes dict would not fit the driver — the original
    # all-dataset path runs unchanged.
    import pyarrow.parquet as _pq

    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def partial_sizes(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).size()
        return g.rename(columns={"size": "sz"})

    if n_docs <= _SIZES_BROADCAST_MAX:
        from scrapy__ray.pipelines.util import broadcast, driver_agg, lookup_broadcast

        sz_df = driver_agg(
            inverted,
            partial_sizes,
            lambda df: df.groupby("doc_id", as_index=False)["sz"].sum(),
        )
        ref = broadcast(
            dict(zip(sz_df["doc_id"].astype(np.int64), sz_df["sz"].astype(np.int64)))
        )

        def verify_bcast(df: pd.DataFrame) -> pd.DataFrame:
            if not len(df):
                return pd.DataFrame({"doc_a": [], "doc_b": [], score_col: []})
            m = lookup_broadcast(ref)
            i = df["i"].values.astype(np.float64)
            sz_a = df["doc_a"].map(m).values.astype(np.float64)
            sz_b = df["doc_b"].map(m).values.astype(np.float64)
            j = score_fn(i, sz_a, sz_b)
            keep = j >= score_thr
            return pd.DataFrame(
                {
                    "doc_a": df["doc_a"].values[keep].astype(np.int64),
                    "doc_b": df["doc_b"].values[keep].astype(np.int64),
                    score_col: round_col(j[keep], 4),
                }
            )

        return collect_arrow(
            inter.map_batches(verify_bcast, batch_format="pandas", batch_size=None),
            out_schema,
        )

    # materialized: BOTH endpoint joins below consume sizes — without it
    # Ray re-executes the doc_id shuffle_agg over the inverted index per
    # consumer (review r3 double-scan family); one row per doc, tiny
    sizes = shuffle_agg(
        inverted,
        ["doc_id"],
        partial_sizes,
        lambda df: df.groupby("doc_id", as_index=False)["sz"].sum(),
    ).materialize()

    # shuffle-join the pair stream with sizes on each endpoint
    with_a = shuffle_join(
        inter,
        sizes.map_batches(
            lambda df: df.rename(columns={"doc_id": "doc_a", "sz": "sz_a"}),
            batch_format="pandas",
            batch_size=None,
        ),
        on="doc_a",
        left_cols=["doc_a", "doc_b", "i"],
        right_cols=["doc_a", "sz_a"],
    )
    with_ab = shuffle_join(
        with_a,
        sizes.map_batches(
            lambda df: df.rename(columns={"doc_id": "doc_b", "sz": "sz_b"}),
            batch_format="pandas",
            batch_size=None,
        ),
        on="doc_b",
        left_cols=["doc_a", "doc_b", "i", "sz_a"],
        right_cols=["doc_b", "sz_b"],
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_a": [], "doc_b": [], score_col: []})
        i = df["i"].values.astype(np.float64)
        j = score_fn(
            i,
            df["sz_a"].values.astype(np.float64),
            df["sz_b"].values.astype(np.float64),
        )
        keep = j >= score_thr
        return pd.DataFrame(
            {
                "doc_a": df["doc_a"].values[keep].astype(np.int64),
                "doc_b": df["doc_b"].values[keep].astype(np.int64),
                score_col: round_col(j[keep], 4),
            }
        )

    return collect_arrow(
        with_ab.map_batches(verify, batch_format="pandas", batch_size=None),
        out_schema,
    )


def docs_jaccard_sql(max_df: int | None = JACCARD_MAX_DF) -> str:
    """DuckDB mirror of docs_jaccard_dups, including the optional df cap —
    the capped token universe applies to sizes AND intersections, exactly as
    in the engine, so engine==SQL holds for every ``max_df`` (the default
    mirrors JACCARD_MAX_DF; pass None for the uncapped variant)."""
    df_filter = (
        f"""tok0 AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tok0 GROUP BY w),
tok AS (SELECT doc_id, tok0.w FROM tok0 JOIN dfreq ON dfreq.w = tok0.w
        WHERE df <= {max_df})"""
        if max_df is not None
        else """tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
)"""
    )
    return f"""
WITH {df_filter},
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::DOUBLE AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(i / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE i / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
"""


DOCS_JACCARD_SQL = docs_jaccard_sql()


def docs_containment_sql(max_df: int | None = JACCARD_MAX_DF) -> str:
    """DuckDB mirror of docs_containment_dups: identical token universe and
    df cap as docs_jaccard_sql; only the final measure changes to
    i / LEAST(|A|, |B|)."""
    df_filter = (
        f"""tok0 AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
),
dfreq AS (SELECT w, COUNT(*) AS df FROM tok0 GROUP BY w),
tok AS (SELECT doc_id, tok0.w FROM tok0 JOIN dfreq ON dfreq.w = tok0.w
        WHERE df <= {max_df})"""
        if max_df is not None
        else """tok AS (
  SELECT doc_id, unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
)"""
    )
    return f"""
WITH {df_filter},
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::DOUBLE AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(i / LEAST(sa.n, sb.n), 4) AS containment
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE i / LEAST(sa.n, sb.n) >= {CONTAINMENT_THRESHOLD}
"""


DOCS_CONTAINMENT_SQL = docs_containment_sql()


def docs_ngram_jaccard_sql(max_df: int | None = JACCARD_MAX_DF) -> str:
    """DuckDB mirror of docs_ngram_jaccard_dups: identical 3-gram shingle
    contract (docs under 3 tokens contribute nothing) and df cap."""
    shingles = """sh0 AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, greatest(len(arr)-1, 1)),
           i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]))) AS w
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
        FROM documents WHERE trim(text) <> '')
  WHERE len(arr) >= 3
)"""
    df_filter = (
        f"""{shingles},
dfreq AS (SELECT w, COUNT(*) AS df FROM sh0 GROUP BY w),
tok AS (SELECT doc_id, sh0.w FROM sh0 JOIN dfreq ON dfreq.w = sh0.w
        WHERE df <= {max_df})"""
        if max_df is not None
        else shingles.replace("sh0 AS", "tok AS")
    )
    return f"""
WITH {df_filter},
sz AS (SELECT doc_id, COUNT(*) AS n FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*)::DOUBLE AS i
  FROM tok a JOIN tok b ON a.w = b.w AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, ROUND(i / (sa.n + sb.n - i), 4) AS jaccard
FROM inter
JOIN sz sa ON sa.doc_id = doc_a
JOIN sz sb ON sb.doc_id = doc_b
WHERE i / (sa.n + sb.n - i) >= {JACCARD_THRESHOLD}
"""


DOCS_NGRAM_JACCARD_SQL = docs_ngram_jaccard_sql()


# ------------------------------------------------------- global top-k n-grams
_TOPK_NGRAMS = 20


def docs_topk_ngrams(sf_dir: str):
    """Global top-20 word trigrams by occurrence count — the canonical
    high-cardinality top-k: per-block partial counts (combiner) ->
    hash-shuffle by shingle -> exact per-partition counts -> per-partition
    top-20 -> driver merges partitions x 20 rows.  A shingle lives in
    exactly one partition, so the global top-20 is a subset of the union of
    per-partition top-20s.  Ties break on the shingle string, mirrored by
    the SQL ORDER BY."""
    ds = read_parquet(sf_dir, "documents", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            toks = _tokens(text)
            out.extend(
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            )
        return pa.table({"shingle": pa.array(out, pa.string())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("shingle", as_index=False).size()
        return g.rename(columns={"size": "n"})

    def topk_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("shingle", as_index=False)["n"].sum()
        g = g.sort_values(["n", "shingle"], ascending=[False, True])
        return g.head(_TOPK_NGRAMS)

    per_part = shuffle_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["shingle"], partial, topk_final,
    )
    merged = collect_arrow(
        per_part,
        pa.schema([("shingle", pa.string()), ("n", pa.int64())]),
    ).to_pandas()
    merged = merged.sort_values(["n", "shingle"], ascending=[False, True]).head(
        _TOPK_NGRAMS
    )
    return pa.table(
        {
            "shingle": pa.array(merged["shingle"], pa.string()),
            "n": pa.array(merged["n"].astype("int64"), pa.int64()),
        }
    )


DOCS_TOPK_NGRAMS_SQL = f"""
WITH sh AS (
  SELECT unnest(list_transform(range(1, greatest(len(arr)-1, 1)),
         i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2])) AS shingle
  FROM (SELECT regexp_split_to_array(trim(text), '\\s+') AS arr
        FROM documents WHERE trim(text) <> '')
  WHERE len(arr) >= 3
)
SELECT shingle, COUNT(*) AS n FROM sh GROUP BY shingle
ORDER BY n DESC, shingle LIMIT {_TOPK_NGRAMS}
"""


# ------------------------------------------------------------- mirror sources
_MIRROR_K = 5  # shingle width (words)
_MIRROR_MIN_SHARED = 5  # a pair survives with >= this many shared shingles


def docs_mirror_sources(sf_dir: str):
    """Mirrored-source detection (the Bharat-Broder mirror-classification
    signal computed over Broder shingles): two sources are mirror candidates
    when they share many DISTINCT word 5-shingles.  Per surviving pair:
    shared-shingle count, each side's distinct-shingle total, min-side
    containment, and Jaccard resemblance.

    Distributed shape — two exchanges, nothing driver-side until the tiny
    pair table:

      map_batches: tokenize + shingle + per-block DISTINCT (source, shingle)
        — the combiner bounding exchange 1 at one row per (source, shingle,
        block)
      -> exchange 1 (key=shingle): co-locates every copy of a shingle, so
        the within-partition distinct and the per-shingle source pairs are
        globally complete; the same partition pass emits per-source
        distinct-shingle totals as marker rows (source_b='', impossible as
        a real source name) — both as PARTIAL counts
      -> exchange 2 (key=source pair): sums partials; rows entering it are
        one per (pair-or-source, partition), << corpus
      -> driver: map totals onto pairs (sources << docs by construction),
        score, threshold.

    A hot shingle (boilerplate present in every source) expands to at most
    sources^2/2 pair rows — bounded by SOURCE cardinality, not corpus size,
    which is why this needs no df cap where the doc-level Jaccard pair
    expansion did.  At web scale exchange 1 would carry a 64/128-bit Rabin
    fingerprint of the shingle; here it carries the string itself so the
    shared count is exactly the SQL oracle's string-equality count (a
    fingerprint collision could silently merge two distinct shingles)."""
    ds = read_parquet(sf_dir, "documents", columns=["source", "text"])

    def shingled(t: pa.Table) -> pa.Table:
        src_out: list[str] = []
        sh_out: list[str] = []
        for src, text in zip(t["source"].to_pylist(), t["text"].to_pylist()):
            for sh in _ngrams(text, _MIRROR_K):
                src_out.append(src)
                sh_out.append(sh)
        df = pd.DataFrame({"source": src_out, "shingle": sh_out})
        df = df.drop_duplicates()  # per-block combiner
        return pa.table(
            {
                "source": pa.array(df["source"], pa.string()),
                "shingle": pa.array(df["shingle"], pa.string()),
            }
        )

    def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
        # exchange 1 co-located all copies of each shingle here, so this
        # distinct is globally exact for the shingles in this partition
        df = df.drop_duplicates(["shingle", "source"])
        tot = df.groupby("source", as_index=False).size()
        tot.columns = ["source_a", "n"]
        tot["source_b"] = ""
        m = df.merge(df, on="shingle")  # vectorized per-shingle pair expand
        m = m[m["source_x"] < m["source_y"]]
        pairs = m.groupby(["source_x", "source_y"], as_index=False).size()
        pairs.columns = ["source_a", "source_b", "n"]
        return pd.concat(
            [pairs, tot[["source_a", "source_b", "n"]]], ignore_index=True
        )

    def sum_n(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source_a", "source_b"], as_index=False)["n"].sum()

    agg = shuffle_agg(
        hash_partition_map(
            ds.map_batches(shingled, batch_format="pyarrow"),
            ["shingle"],
            pair_partials,
        ),
        ["source_a", "source_b"],
        sum_n,
        sum_n,
    )
    tbl = collect_arrow(
        agg,
        pa.schema(
            [
                ("source_a", pa.string()),
                ("source_b", pa.string()),
                ("n", pa.int64()),
            ]
        ),
    ).to_pandas()
    tot = tbl[tbl["source_b"] == ""].set_index("source_a")["n"]
    pairs = tbl[(tbl["source_b"] != "") & (tbl["n"] >= _MIRROR_MIN_SHARED)]
    shared = pairs["n"].to_numpy(dtype="int64")
    n_a = pairs["source_a"].map(tot).to_numpy(dtype="int64")
    n_b = pairs["source_b"].map(tot).to_numpy(dtype="int64")
    return pa.table(
        {
            "source_a": pa.array(pairs["source_a"], pa.string()),
            "source_b": pa.array(pairs["source_b"], pa.string()),
            "shared": pa.array(shared, pa.int64()),
            "n_a": pa.array(n_a, pa.int64()),
            "n_b": pa.array(n_b, pa.int64()),
            "containment": pa.array(
                round_col(shared / np.minimum(n_a, n_b), 4), pa.float64()
            ),
            "resemblance": pa.array(
                round_col(shared / (n_a + n_b - shared), 4), pa.float64()
            ),
        }
    )


DOCS_MIRROR_SOURCES_SQL = f"""
WITH sh AS (
  SELECT DISTINCT source, shingle FROM (
    SELECT source,
           unnest(list_transform(range(1, len(arr)-{_MIRROR_K - 2}),
             i -> arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' ||
                  arr[i+3] || ' ' || arr[i+4])) AS shingle
    FROM (SELECT source, regexp_split_to_array(trim(text), '\\s+') AS arr
          FROM documents WHERE trim(text) <> '')
    WHERE len(arr) >= {_MIRROR_K}
  )
),
n AS (SELECT source, COUNT(*) AS n FROM sh GROUP BY source),
p AS (
  SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS shared
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.source < b.source
  GROUP BY 1, 2 HAVING COUNT(*) >= {_MIRROR_MIN_SHARED}
)
SELECT p.source_a, p.source_b, p.shared, na.n AS n_a, nb.n AS n_b,
       ROUND(p.shared::DOUBLE / LEAST(na.n, nb.n), 4) AS containment,
       ROUND(p.shared::DOUBLE / (na.n + nb.n - p.shared), 4) AS resemblance
FROM p
JOIN n na ON na.source = p.source_a
JOIN n nb ON nb.source = p.source_b
"""


# ------------------------------------------- incremental (cross-snapshot) dedup
#: snapshot slice: sources src0..src9 model the previously-ingested corpus
#: snapshot; the rest is the new batch being deduped AGAINST it (the
#: production shape: each crawl increment dedups against the accumulated
#: index, not just within itself).
_SNAPSHOT_SOURCES = tuple(f"src{i}" for i in range(10))
#: at or below this many snapshot docs the snapshot hash set broadcasts
#: (16 B/doc); above it the membership test is a shuffle semi-join on the
#: content hash — a 10^10-doc snapshot index lives in hash partitions.
_SNAPSHOT_BROADCAST_MAX = 10_000_000


def docs_dedup_incremental(sf_dir: str):
    """Dedup the NEW batch against the accumulated snapshot: flag every
    non-snapshot document whose exact text already exists in the snapshot
    slice, returning (doc_id, is_dup) for the new batch.  Both sides hash
    in map_batches; below _SNAPSHOT_BROADCAST_MAX snapshot docs the
    snapshot's md5 set folds to the driver (mergeable set partials) and
    broadcasts; above it the new batch inner-shuffle_joins the DISTINCT
    snapshot hashes and flips flags via zero-partial union (forced in CI).
    Exact SQL mirror (semi-join on md5)."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text", "source"])

    def hashed(t: pa.Table) -> pa.Table:
        snap = [s in _SNAPSHOT_SOURCES for s in t["source"].to_pylist()]
        h = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t["text"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "h": pa.array(h, pa.string()),
                "snap": pa.array(snap, pa.bool_()),
            }
        )

    hs = ds.map_batches(hashed, batch_format="pyarrow").materialize()
    import pyarrow.parquet as _pq

    n_snap_bound = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def new_rows(df: pd.DataFrame) -> pd.DataFrame:
        d = df[~df["snap"]]
        return pd.DataFrame({"doc_id": d["doc_id"].values, "h": d["h"].values})

    new = hs.map_batches(new_rows, batch_format="pandas")

    if n_snap_bound <= _SNAPSHOT_BROADCAST_MAX:
        from scrapy__ray.pipelines.util import broadcast, lookup_broadcast

        snap_sets = driver_agg(
            hs,
            lambda df: pd.DataFrame({"h": df[df["snap"]]["h"].unique()}),
            lambda df: df.drop_duplicates("h"),
        )
        ref = broadcast(set(snap_sets["h"]))

        def flag(df: pd.DataFrame) -> pd.DataFrame:
            s = lookup_broadcast(ref)
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].values,
                    "is_dup": df["h"].isin(s).values,
                }
            )

        out_ds = new.map_batches(flag, batch_format="pandas")
    else:
        # consumed twice below (join left side + zero-partial union):
        # unmaterialized lineage would re-run the hash pass per consumer
        new = new.materialize()

        def snap_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"h": df[df["snap"]]["h"].unique()})

        snap_hashes = shuffle_agg(
            hs,
            ["h"],
            snap_rows,
            lambda df: df.drop_duplicates("h"),
        )
        joined = shuffle_join(
            new, snap_hashes, on="h", left_cols=["doc_id", "h"], right_cols=["h"]
        )

        def dup_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].values,
                    "is_dup": np.ones(len(df), np.int64),
                }
            )

        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "doc_id": df["doc_id"].values,
                    "is_dup": np.zeros(len(df), np.int64),
                }
            )

        unioned = joined.map_batches(dup_rows, batch_format="pandas").union(
            new.map_batches(zero_rows, batch_format="pandas")
        )

        def fin_partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("doc_id", as_index=False)["is_dup"].max()

        flagged = shuffle_agg(unioned, ["doc_id"], fin_partial, fin_partial)
        out_ds = flagged.map_batches(
            lambda df: pd.DataFrame(
                {"doc_id": df["doc_id"].values, "is_dup": df["is_dup"].astype(bool).values}
            ),
            batch_format="pandas",
        )

    return collect_arrow(
        out_ds, pa.schema([("doc_id", pa.int64()), ("is_dup", pa.bool_())])
    )


_SNAP_SQL_LIST = ", ".join(f"'{s}'" for s in _SNAPSHOT_SOURCES)
DOCS_DEDUP_INCR_SQL = f"""
WITH snap AS (
  SELECT DISTINCT md5(text) AS h FROM documents WHERE source IN ({_SNAP_SQL_LIST})
)
SELECT d.doc_id,
       (md5(d.text) IN (SELECT h FROM snap)) AS is_dup
FROM documents d WHERE d.source NOT IN ({_SNAP_SQL_LIST})
"""


# --------------------------------------------- token frequency spectrum
def docs_token_spectrum(sf_dir: str):
    """Frequency-of-frequencies over the corpus token counts (the
    Good-Turing / Zipf spectrum: how many distinct tokens occur exactly k
    times — the LM-smoothing and vocabulary-sizing diagnostic): per-token
    exact counts via ONE hash exchange, then the spectrum itself folds to
    the driver as mergeable (k, n_tokens) partials — second exchange
    avoided because distinct k values grow ~log(corpus).  Exact integer
    counts, SQL-mirrored."""
    ds = read_parquet(sf_dir, "documents", columns=["text"])

    def explode(t: pa.Table) -> pa.Table:
        out: list[str] = []
        for text in t["text"].to_pylist():
            out.extend(_tokens(text))
        return pa.table({"tok": pa.array(out, pa.string())})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("tok", as_index=False).size()
        return g.rename(columns={"size": "n"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("tok", as_index=False)["n"].sum()

    per_token = shuffle_agg(
        ds.map_batches(explode, batch_format="pyarrow"), ["tok"], partial, final
    )

    def spec_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n", as_index=False).size()
        return g.rename(columns={"n": "occurrences", "size": "n_tokens"})

    out = driver_agg(
        per_token,
        spec_partial,
        lambda df: df.groupby("occurrences", as_index=False)["n_tokens"].sum(),
    )
    out = out.sort_values("occurrences").reset_index(drop=True)
    return pa.table(
        {
            "occurrences": pa.array(out["occurrences"].astype("int64"), pa.int64()),
            "n_tokens": pa.array(out["n_tokens"].astype("int64"), pa.int64()),
        }
    )


DOCS_TOKEN_SPECTRUM_SQL = """
WITH tok AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
  FROM documents WHERE trim(text) <> ''
),
tc AS (SELECT tok, COUNT(*) AS n FROM tok GROUP BY tok)
SELECT n AS occurrences, COUNT(*) AS n_tokens
FROM tc GROUP BY n ORDER BY occurrences
"""


# --------------------------------------------------- stratified sampling
_STRATA_K = 3


def docs_sample_stratified(sf_dir: str):
    """Deterministic stratified sample: k documents per language, selected
    by md5(doc_id) rank — the standard reproducible-sampling pattern for
    training-data curation (hash rank is stable across runs, cluster
    layouts, and engines, unlike RANDOM()).  One hash-shuffle by the
    stratum key; each partition holds whole strata, so the per-partition
    rank-and-head is exact."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "lang"])

    def hashed(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "h": pa.array(
                    [hashlib.md5(str(i).encode()).hexdigest() for i in ids],
                    pa.string(),
                ),
            }
        )

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["doc_id", "lang"]]
        df = df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
        return df.groupby("lang", as_index=False).head(_STRATA_K)[
            ["doc_id", "lang"]
        ]

    out = hash_partition_map(
        ds.map_batches(hashed, batch_format="pyarrow"), ["lang"], pick
    )
    return collect_arrow(
        out, pa.schema([("doc_id", pa.int64()), ("lang", pa.string())])
    )


DOCS_SAMPLE_STRATIFIED_SQL = f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (
  PARTITION BY lang ORDER BY md5(doc_id::VARCHAR), doc_id) <= {_STRATA_K}
"""


# ----------------------------------------------------- MinHash + LSH dups
_MINHASH_K = 128
_BANDS = 32  # 32 bands x 4 rows


def _minhash_params():
    """Multiply-shift hash family over uint64 (mod-2^64 wraparound is the
    modulus): h_i(x) = a_i*x + b_i with odd a_i — vectorizes as pure uint64
    numpy, no Python-int math in the hot loop."""
    rng = np.random.Generator(np.random.PCG64(42))
    a = rng.integers(0, 1 << 63, size=_MINHASH_K, dtype=np.uint64) * 2 + 1
    b = rng.integers(0, 1 << 63, size=_MINHASH_K, dtype=np.uint64)
    return a, b


def _shingles(text: str, n: int = 3) -> set[int]:
    toks = _tokens(text)
    out = set()
    for i in range(max(0, len(toks) - n + 1)):
        s = " ".join(toks[i : i + n])
        out.add(int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big"))
    return out


_MINHASH_PUSHDOWN_MAX_IDS = 50_000


def docs_minhash_lsh(sf_dir: str):
    # memoized like docs_jaccard_dups: docs_dup_clusters_minhash chains
    # this exact pair set in the same process (pa.Table, immutable)
    if sf_dir not in _MINHASH_MEMO:
        _MINHASH_MEMO[sf_dir] = _docs_minhash_lsh(sf_dir)
    return _MINHASH_MEMO[sf_dir]


_MINHASH_MEMO: dict[str, object] = {}


def _docs_minhash_lsh(sf_dir: str):
    """MinHash(128) + LSH(32x4) near-dup pairs, Jaccard>=0.5 verified on true
    shingle sets.  shingle->minhash per batch; band rows explode;
    hash-partition by (band, band_hash) buckets gives candidates; pair dedup
    via a second hash shuffle.  Exact verification is two-path by candidate
    volume — LSH guarantees candidates ≪ corpus, so the choice is between
    fixed exchange overhead and unbounded memory, never a corpus read:
      * ≤ _MINHASH_PUSHDOWN_MAX_IDS distinct candidate docs: parquet
        predicate-pushdown read of exactly those rows (row-group pruned,
        O(candidates) — the approved pattern from simops._filtered_vecs),
        shingles recomputed locally.  This skips two shuffle-joins whose
        fixed cost dwarfs the data at small candidate counts.
      * above the threshold: SHUFFLE-JOIN the candidate pairs against the
        per-doc shingle-set dataset on doc_a then doc_b — no driver-side
        corpus read, no whole-text broadcast at any scale (the round-1
        version broadcast every document text; corpus-scale driver OOM).
    Approximate by construction -> parquet-materialized oracle; determinism
    comes from the fixed PCG64(42) permutations (either path yields
    byte-identical pairs)."""
    A, B = _minhash_params()
    rows_per_band = _MINHASH_K // _BANDS

    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(t: pa.Table) -> pa.Table:
        out_band, out_hash, out_doc = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _shingles(text)
            if not sh:
                continue
            shv = np.array(sorted(sh), dtype=np.uint64)
            with np.errstate(over="ignore"):  # mod-2^64 wraparound intended
                mh = (A[:, None] * shv[None, :] + B[:, None]).min(axis=1)
            mh_bytes = mh.astype(">u8").tobytes()
            for bi in range(_BANDS):
                h = hashlib.blake2b(
                    mh_bytes[bi * rows_per_band * 8 : (bi + 1) * rows_per_band * 8],
                    digest_size=8,
                ).hexdigest()
                out_band.append(bi)
                out_hash.append(h)
                out_doc.append(did)
        return pa.table(
            {
                "band": pa.array(out_band, pa.int32()),
                "bh": pa.array(out_hash, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
            }
        )

    cands = hash_partition_map(
        ds.map_batches(band_rows, batch_format="pyarrow"),
        ["band", "bh"],
        lambda t: _segment_pairs(t, ["band", "bh"]),
        batch_format="pyarrow",
    )
    # per-block pre-dedup, then count the candidate stream ONCE (cheap
    # metadata after materialize) to pick the dedup+verify regime
    pair2 = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    cands_md = cands.map_batches(
        lambda t: t.group_by(["doc_a", "doc_b"]).aggregate([]),
        batch_format="pyarrow",
        batch_size=None,
    ).materialize()

    if cands_md.count() <= 2 * _MINHASH_PUSHDOWN_MAX_IDS:
        # SMALL regime (the LSH-typical one): cross-band pair dedup on the
        # driver and shingle verification against a parquet
        # predicate-pushdown read of exactly the candidate docs — skips
        # three exchanges whose fixed cost dwarfs this data volume
        import pyarrow.parquet as pq

        cand_df = (
            collect_arrow(cands_md, pair2)
            .to_pandas()
            .drop_duplicates(["doc_a", "doc_b"])
        )
        cand_ids = sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"]))
        docs = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filters=[("doc_id", "in", [int(i) for i in cand_ids])],
        )
        sh = {
            did: _shingles(text)
            for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist())
        }
        out_a, out_b, out_j = [], [], []
        for a, b in sorted(zip(cand_df["doc_a"], cand_df["doc_b"])):
            sa, sb = sh.get(a), sh.get(b)
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_THRESHOLD:
                out_a.append(int(a))
                out_b.append(int(b))
                out_j.append(j)
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(round_col(out_j, 4), pa.float64()),
            }
        ).cast(_PAIR_SCHEMA)

    # LARGE regime: nothing is ever collected to the driver — pair-keyed
    # hash-shuffle dedup, then shuffle-join the pairs against the shingle
    # dataset on each endpoint
    uniq = shuffle_agg(
        cands_md,
        ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
    )

    # per-doc true shingle sets as a dataset; packed uint64 BYTES, not a
    # list column — ragged lists round-trip through pandas blocks as
    # variable-shaped tensor extensions and break the shuffle concat
    def shingle_rows(t: pa.Table) -> pa.Table:
        ids, sets_ = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            sh = _shingles(text)
            if sh:
                ids.append(did)
                sets_.append(np.array(sorted(sh), dtype=np.uint64).tobytes())
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sh": pa.array(sets_, pa.binary()),
            }
        )

    # materialized: both endpoint joins consume the shingle dataset —
    # unmaterialized, each join re-reads the corpus and re-hashes every
    # shingle (review r3 double-scan family).  One packed-bytes row per
    # doc; the object store spills it rather than re-scanning 100 TB twice
    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow").materialize()

    with_a = shuffle_join(
        uniq,
        shingles.map_batches(
            lambda t: t.rename_columns(["doc_a", "sh_a"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        on="doc_a",
        left_cols=["doc_a", "doc_b"],
        right_cols=["doc_a", "sh_a"],
    )
    with_ab = shuffle_join(
        with_a,
        shingles.map_batches(
            lambda t: t.rename_columns(["doc_b", "sh_b"]),
            batch_format="pyarrow",
            batch_size=None,
        ),
        on="doc_b",
        left_cols=["doc_a", "doc_b", "sh_a"],
        right_cols=["doc_b", "sh_b"],
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for a, b, sa, sb in zip(
            df["doc_a"], df["doc_b"], df["sh_a"], df["sh_b"]
        ):
            sa = set(np.frombuffer(sa, dtype=np.uint64))
            sb = set(np.frombuffer(sb, dtype=np.uint64))
            j = len(sa & sb) / len(sa | sb)
            if j >= JACCARD_THRESHOLD:
                out_a.append(a)
                out_b.append(b)
                out_j.append(j)
        return pd.DataFrame(
            {
                "doc_a": np.array(out_a, dtype=np.int64),
                "doc_b": np.array(out_b, dtype=np.int64),
                "jaccard": round_col(out_j, 4) if out_j else np.array([]),
            }
        )

    return collect_arrow(
        with_ab.map_batches(verify, batch_format="pandas", batch_size=None),
        _PAIR_SCHEMA,
    )


# --------------------------------------- edit-distance pair verification
def _token_edit_distance(a_toks: list[str], b_toks: list[str]) -> int:
    """Token-level Levenshtein distance — exact integer DP, one numpy row
    per a-token.  The insertion chain (cur[j] = min(cur[j], cur[j-1]+1))
    is the only sequential dependency; it resolves in one vectorized
    min-accumulate because min over k≤j of (cand[k] + (j-k)) equals
    (running-min of cand[k]-k) + j."""
    n, m = len(a_toks), len(b_toks)
    if not n or not m:
        return max(n, m)
    vocab: dict[str, int] = {}
    b_ids = np.fromiter((vocab.setdefault(t, len(vocab)) for t in b_toks),
                        np.int64, m)
    a_ids = [vocab.get(t, -1) for t in a_toks]
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    cand = np.empty(m + 1, np.int64)
    for i, ai in enumerate(a_ids, 1):
        cand[0] = i
        np.minimum(prev[1:] + 1, prev[:-1] + (b_ids != ai), out=cand[1:])
        prev = np.minimum.accumulate(cand - idx) + idx
    return int(prev[m])


def docs_edit_dups(sf_dir: str):
    """Edit-similarity verification of the MinHash-LSH near-dup pairs: for
    every LSH-verified pair, the token-level Levenshtein similarity
    1 - dist/max(len) — the second-stage verifier fuzzy-dedup pipelines
    run on candidate pairs (shingle Jaccard is order-blind; edit
    similarity is not, so a pair of shuffled-paragraph mirrors scores high
    on Jaccard and low here).

    Scale shape: the pair set is ≪ corpus by the LSH guarantee, so the
    texts reach their pairs exactly as the minhash verifier's two-regime
    contract: ≤ _MINHASH_PUSHDOWN_MAX_IDS candidate docs -> parquet
    predicate-pushdown read of just those rows; the large regime is the
    same two endpoint shuffle-joins as _docs_minhash_lsh (pairs and texts
    both stay datasets).  The DP itself is exact integer arithmetic —
    byte-identical to the single-process oracle."""
    import pyarrow.parquet as pq

    pairs = docs_minhash_lsh(sf_dir)  # memoized pa.Table
    cand_df = pairs.select(["doc_a", "doc_b"]).to_pandas()
    cand_ids = sorted(set(cand_df["doc_a"]) | set(cand_df["doc_b"]))

    def _pair_sims(rows, ta_list, tb_list):
        out_a, out_b, out_s = [], [], []
        for (a, b), ta, tb in zip(rows, ta_list, tb_list):
            d = _token_edit_distance(ta, tb)
            denom = max(len(ta), len(tb))
            out_a.append(int(a))
            out_b.append(int(b))
            out_s.append(1.0 - d / denom if denom else 1.0)
        return out_a, out_b, out_s

    if len(cand_ids) <= _MINHASH_PUSHDOWN_MAX_IDS:
        docs = pq.read_table(
            f"{sf_dir}/documents.parquet",
            columns=["doc_id", "text"],
            filters=[("doc_id", "in", [int(i) for i in cand_ids])],
        )
        toks = {
            did: _tokens(text)
            for did, text in zip(
                docs["doc_id"].to_pylist(), docs["text"].to_pylist()
            )
        }
        rows = sorted(zip(cand_df["doc_a"], cand_df["doc_b"]))
        out_a, out_b, out_s = _pair_sims(
            rows,
            [toks.get(a, []) for a, _ in rows],
            [toks.get(b, []) for _, b in rows],
        )
        return pa.table(
            {
                "doc_a": pa.array(out_a, pa.int64()),
                "doc_b": pa.array(out_b, pa.int64()),
                "edit_sim": pa.array(round_col(out_s, 4), pa.float64()),
            }
        )

    # LARGE regime (force-tested): pairs stay a dataset; each endpoint's
    # text arrives via the same repartition-join the minhash verifier uses
    import ray.data as rd

    ensure_ctx()
    pr = rd.from_arrow(pairs.select(["doc_a", "doc_b"]))
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    with_a = shuffle_join(
        pr,
        ds.map_batches(
            lambda df: df.rename(columns={"doc_id": "doc_a", "text": "text_a"}),
            batch_format="pandas",
            batch_size=None,
        ),
        on="doc_a",
        left_cols=["doc_a", "doc_b"],
        right_cols=["doc_a", "text_a"],
    )
    with_ab = shuffle_join(
        with_a,
        ds.map_batches(
            lambda df: df.rename(columns={"doc_id": "doc_b", "text": "text_b"}),
            batch_format="pandas",
            batch_size=None,
        ),
        on="doc_b",
        left_cols=["doc_a", "doc_b", "text_a"],
        right_cols=["doc_b", "text_b"],
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_s = _pair_sims(
            list(zip(df["doc_a"], df["doc_b"])),
            [_tokens(t) for t in df["text_a"]],
            [_tokens(t) for t in df["text_b"]],
        )
        return pd.DataFrame(
            {
                "doc_a": np.array(out_a, dtype=np.int64),
                "doc_b": np.array(out_b, dtype=np.int64),
                "edit_sim": round_col(out_s, 4) if out_s else np.array([]),
            }
        )

    return collect_arrow(
        with_ab.map_batches(verify, batch_format="pandas", batch_size=None),
        pa.schema(
            [
                ("doc_a", pa.int64()),
                ("doc_b", pa.int64()),
                ("edit_sim", pa.float64()),
            ]
        ),
    )


# ----------------------------------------------------------------- SimHash
def _simhash_batch(texts: list[str]) -> list[int]:
    """64-bit SimHash per text over the token multiset (deterministic
    blake2b token hashes), returned as SIGNED int64 two's complement —
    the storable Arrow representation shared by docs_simhash and
    docs_simhash_dups."""
    shifts = np.arange(64, dtype=np.uint64)
    out = []
    for text in texts:
        toks = _tokens(text)
        if not toks:
            out.append(0)
            continue
        hs = np.array(
            [
                int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
                for w in toks
            ],
            dtype=np.uint64,
        )
        # bit-count per position, vectorized over (token, bit)
        bits = ((hs[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
        acc = 2 * bits.sum(axis=0) - len(toks)
        v = int(((acc > 0).astype(np.uint64) << shifts).sum(dtype=np.uint64))
        out.append(v - (1 << 64) if v >= (1 << 63) else v)  # two's complement
    return out


def docs_simhash(sf_dir: str):
    """64-bit SimHash over token multiset (deterministic blake2b token
    hashes); independent pure-Python oracle in oracle_ext."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def sim(t: pa.Table) -> pa.Table:
        out = _simhash_batch(t["text"].to_pylist())
        return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.int64())})

    return ds.map_batches(sim, batch_format="pyarrow")


# SimHash pair search (Manku, Jain & Sarma, WWW 2007 — the Google crawl
# near-dup detector): pairs at hamming distance <= _SIMHAM_K over 64-bit
# fingerprints.  Banding into _SIMHAM_BANDS equal blocks is EXACT by
# pigeonhole (k < bands: a pair differing in <= 3 bits agrees on >= 1 of
# the 4 16-bit blocks), so unlike MinHash LSH there is no recall loss and
# a brute-force oracle matches byte-exactly.
_SIMHAM_K = 3
_SIMHAM_BANDS = 4
_POP8 = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized popcount of a uint64 array via the byte LUT (numpy 1.26
    has no bitwise_count)."""
    x = x.astype(np.uint64, copy=False)
    out = np.zeros(x.shape, dtype=np.int64)
    for k in range(8):
        out += _POP8[((x >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)]
    return out


def docs_simhash_dups(sf_dir: str):
    """Near-dup pairs at SimHash hamming distance <= 3 (Manku et al. 2007).

    One fingerprint pass (the docs_simhash stage), then each doc explodes
    to 4 (band, 16-bit block value) rows; ONE hash exchange on the band
    key co-locates every candidate bucket, where pairs verify by XOR
    popcount against the fingerprints they carry; a second narrow
    pair-keyed exchange dedups hits that agree on multiple bands.  Text
    never shuffles — the exchange moves 4 × 20-byte rows per doc.

    Scale: bucket sizes follow fingerprint-block collisions — near-uniform
    for distinct content, but identical-fingerprint groups (exact dups)
    pair quadratically, the same bounded blowup the Jaccard family caps
    with max_df; the dup-cluster consumer (pipelines/dedup.py) is the
    stated keep-set path.  Banding is exact (pigeonhole), so recall is 1.0
    by construction — the brute-force O(N²) oracle in oracle_ext matches
    byte-exactly."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def band_rows(t: pa.Table) -> pa.Table:
        fps = np.array(_simhash_batch(t["text"].to_pylist()), dtype=np.int64)
        ids = t["doc_id"].to_numpy()
        ufp = fps.astype(np.uint64)
        bands = []
        for bi in range(_SIMHAM_BANDS):
            bk = ((ufp >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
            bands.append(
                pa.table(
                    {
                        "band": pa.array(np.full(len(ids), bi, np.int32)),
                        "bk": pa.array(bk),
                        "doc_id": pa.array(ids, pa.int64()),
                        "fp": pa.array(fps, pa.int64()),
                    }
                )
            )
        return pa.concat_tables(bands)

    def bucket_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "doc_a": pd.Series([], dtype="int64"),
                "doc_b": pd.Series([], dtype="int64"),
                "hamming": pd.Series([], dtype="int64"),
            }
        )
        if not len(df):
            return empty
        df = df.sort_values(["band", "bk", "doc_id"], kind="mergesort")
        key = df["band"].to_numpy(np.int64) * 65536 + df["bk"].to_numpy(np.int64)
        ids = df["doc_id"].to_numpy(np.int64)
        fps = df["fp"].to_numpy(np.int64).astype(np.uint64)
        bounds = np.concatenate(
            [[0], np.nonzero(key[1:] != key[:-1])[0] + 1, [len(key)]]
        )
        lens = np.diff(bounds)
        out_a, out_b, out_h = [], [], []
        for gi in np.nonzero(lens >= 2)[0]:
            s, e = bounds[gi], bounds[gi + 1]
            a_idx, b_idx = np.triu_indices(e - s, k=1)
            ham = _popcount64(fps[s:e][a_idx] ^ fps[s:e][b_idx])
            keep = ham <= _SIMHAM_K
            out_a.append(ids[s:e][a_idx][keep])
            out_b.append(ids[s:e][b_idx][keep])
            out_h.append(ham[keep])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "doc_a": np.concatenate(out_a),
                "doc_b": np.concatenate(out_b),
                "hamming": np.concatenate(out_h),
            }
        )

    cands = hash_partition_map(
        ds.map_batches(band_rows, batch_format="pyarrow"), ["band", "bk"], bucket_pairs
    )
    deduped = hash_partition_map(
        cands,
        ["doc_a", "doc_b"],
        lambda df: df.drop_duplicates(["doc_a", "doc_b"]),
    )
    return collect_arrow(
        deduped,
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("hamming", pa.int64())]
        ),
    )


# -------------------------------------------------------------- language ID
_LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "value", "key"},
    "de": {"der", "die", "und", "das", "ist", "ein", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "un", "est"},
}


def docs_langid(sf_dir: str):
    """Stopword-overlap language ID heuristic (rows-only; deterministic)."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def lid(t: pa.Table) -> pa.Table:
        preds = []
        for text in t["text"].to_pylist():
            toks = set(_tokens(text))
            scores = {
                lang: len(toks & prof) for lang, prof in _LANG_PROFILES.items()
            }
            preds.append(max(sorted(scores), key=lambda k: scores[k]))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(preds, pa.string()),
                "lang_actual": t["lang"],
            }
        )

    return ds.map_batches(lid, batch_format="pyarrow")


# ---------------------------------------------------- BPE-ish token count
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def docs_bpe_tokens(sf_dir: str):
    """Sub-word-style token counting with a BPE-ish pre-tokenizer regex
    (letter runs | digit runs | single punctuation), the standard first
    stage of byte-pair tokenizers — vectorized map_batches, no shuffle."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def count(t: pa.Table) -> pa.Table:
        n = [len(_BPE_RE.findall(x)) for x in t["text"].to_pylist()]
        return pa.table(
            {"doc_id": t["doc_id"], "n_bpe_tokens": pa.array(n, pa.int64())}
        )

    return ds.map_batches(count, batch_format="pyarrow")


DOCS_BPE_TOKENS_SQL = """
SELECT doc_id,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9[:space:]]'))::BIGINT
           AS n_bpe_tokens
FROM documents
"""


# ------------------------------------------------ rolling-hash fingerprint
_RH_BASE = 1_000_003
_RH_MOD = (1 << 61) - 1


def docs_rolling_fingerprint(sf_dir: str):
    """Karp-Rabin polynomial rolling hash over the token stream — the
    content-defined fingerprint family (no SQL analogue; deterministic).
    Vectorized per document with numpy modular Horner evaluation."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def fp(t: pa.Table) -> pa.Table:
        out = []
        for text in t["text"].to_pylist():
            h = 0
            for w in _tokens(text):
                tok_h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
                h = (h * _RH_BASE + tok_h) % _RH_MOD
            out.append(h)
        return pa.table(
            {"doc_id": t["doc_id"], "rolling_fp": pa.array(out, pa.int64())}
        )

    return ds.map_batches(fp, batch_format="pyarrow")
_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")
_PUNCT = set(".,;:!?'\"()[]{}-")


def docs_quality(sf_dir: str):
    """Per-document quality signals for training-data filtering: token
    count, mean token length, punctuation ratio, stopword ratio, and a
    keep/drop flag — one vectorizable map_batches pass, no shuffle."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    stop = set(_STOPWORDS)

    def score(t: pa.Table) -> pa.Table:
        ids, ntok, punct_r, stop_r, keep = [], [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _tokens(text)
            n = len(toks)
            n_chars = sum(len(w) for w in toks)
            n_punct = sum(1 for ch in text if ch in _PUNCT)
            n_stop = sum(1 for w in toks if w.lower() in stop)
            pr = n_punct / n_chars if n_chars else 0.0
            sr = n_stop / n if n else 0.0
            ids.append(did)
            ntok.append(n)
            punct_r.append(pr)
            stop_r.append(sr)
            keep.append(n >= 10 and pr < 0.3)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(ntok, pa.int64()),
                "punct_ratio": pa.array(round_col(punct_r, 4), pa.float64()),
                "stopword_ratio": pa.array(round_col(stop_r, 4), pa.float64()),
                "keep": pa.array(keep, pa.bool_()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


DOCS_QUALITY_SQL = """
WITH b AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
         len(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_chars,
         len(text) - len(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS n_punct,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                   w -> lower(w) IN ('the','a','and','of','to','in','is'))) END AS n_stop
  FROM documents
)
SELECT doc_id, n_tokens::BIGINT AS n_tokens,
       ROUND(CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars END, 4) AS punct_ratio,
       ROUND(CASE WHEN n_tokens = 0 THEN 0.0 ELSE n_stop::DOUBLE / n_tokens END, 4) AS stopword_ratio,
       (n_tokens >= 10 AND (CASE WHEN n_chars = 0 THEN 0.0 ELSE n_punct::DOUBLE / n_chars END) < 0.3) AS keep
FROM b
"""


# ------------------------------------------------- normalization + PII scrub
_WS_COLLAPSE = re.compile(r"\s+")
_EMAIL_RE = re.compile(r"[A-Za-z0-9_.]+@[A-Za-z0-9.-]+")


def docs_normalize(sf_dir: str):
    """Text normalization for training-data prep: trim, collapse internal
    whitespace to single spaces, lowercase — one vectorizable map_batches
    pass, no shuffle.  SQL mirror uses the identical transform chain."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def norm(t: pa.Table) -> pa.Table:
        out = [
            _WS_COLLAPSE.sub(" ", x.strip()).lower() for x in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "norm_text": pa.array(out, pa.string()),
                "n_chars_norm": pa.array([len(x) for x in out], pa.int64()),
            }
        )

    return ds.map_batches(norm, batch_format="pyarrow")


DOCS_NORMALIZE_SQL = """
SELECT doc_id,
       lower(regexp_replace(trim(text), '\\s+', ' ', 'g')) AS norm_text,
       len(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))::BIGINT AS n_chars_norm
FROM documents
"""


def docs_scrub_pii(sf_dir: str):
    """PII scrubbing stage: mask email addresses with <EMAIL> and count the
    redactions.  The fixture corpus carries no PII, so the query plants a
    deterministic contact line on every doc_id % 7 == 0 document BEFORE
    scrubbing (mirrored exactly in the SQL), making the scrub path a real,
    hash-checked transform instead of a no-op."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def scrub(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        texts = [
            (x + f" contact: user{d}@example.com" if d % 7 == 0 else x)
            for d, x in zip(ids, t["text"].to_pylist())
        ]
        scrubbed, counts = [], []
        for x in texts:
            s, n = _EMAIL_RE.subn("<EMAIL>", x)
            scrubbed.append(s)
            counts.append(n)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "scrubbed": pa.array(scrubbed, pa.string()),
                "n_redacted": pa.array(counts, pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


DOCS_SCRUB_PII_SQL = """
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || doc_id || '@example.com'
              ELSE text END AS t
  FROM documents
)
SELECT doc_id,
       regexp_replace(t, '[A-Za-z0-9_.]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g') AS scrubbed,
       len(regexp_extract_all(t, '[A-Za-z0-9_.]+@[A-Za-z0-9.-]+'))::BIGINT AS n_redacted
FROM planted
"""


# ----------------------------------------------------- multimodal stub
class MediaDecodeStub:
    """Actor-pool stage for opaque binary media columns (SURVEY.md S6 media
    pipelines).  Real decode libs (PIL/ffmpeg) are absent in this container,
    so decode is a deterministic fake over the payload bytes; the Ray-side
    plumbing — actor pool, __init__-once setup, Arrow binary batches, typed
    metadata output — is real and tested."""

    def __init__(self):
        self._md5 = hashlib.md5  # stands in for model/codec load

    def __call__(self, t: pa.Table) -> pa.Table:
        payloads = [x.encode("utf-8") for x in t["text"].to_pylist()]
        n = [len(p) for p in payloads]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_bytes": pa.array(n, pa.int64()),
                "payload_md5": pa.array(
                    [self._md5(p).hexdigest() for p in payloads], pa.string()
                ),
                "fake_width": pa.array([(x % 64) + 1 for x in n], pa.int64()),
                "fake_height": pa.array([((x // 64) % 64) + 1 for x in n], pa.int64()),
            }
        )


def media_meta_stub(sf_dir: str):
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        MediaDecodeStub, batch_format="pyarrow", batch_size=256, concurrency=2
    )


class FrameSampleStub:
    """Actor-pool stage for the video-frame-sampling shape (S6/media at
    scale): payloads are opaque byte streams, ``__init__`` stands in for
    the once-per-actor codec load, and ``__call__`` samples 4 evenly-spaced
    fixed-width frames per payload.  Real decoding is deterministic fake
    slicing (no ffmpeg in this container); the Ray plumbing — actor pool,
    SMALL batch_size (large payloads x concurrency must fit worker heap),
    per-frame digests — is the real pattern."""

    FRAMES = 4
    FRAME_W = 16

    def __init__(self):
        self._md5 = hashlib.md5  # stands in for codec/model load

    def __call__(self, t: pa.Table) -> pa.Table:
        ids, n_frames, digests = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            step = len(text) // self.FRAMES
            frames = [
                text[i * step : i * step + self.FRAME_W] for i in range(self.FRAMES)
            ]
            ids.append(did)
            n_frames.append(len(frames))
            digests.append(":".join(self._md5(f.encode()).hexdigest() for f in frames))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_frames": pa.array(n_frames, pa.int64()),
                "frame_md5s": pa.array(digests, pa.string()),
            }
        )


def media_framesample_stub(sf_dir: str):
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        FrameSampleStub, batch_format="pyarrow", batch_size=64, concurrency=2
    )


class EmbedStub:
    """Actor-pool stage for the batched-model-inference shape (S6/media →
    similarity chaining): ``__init__`` stands in for the once-per-actor
    model load (here: the fixed unit query vector), ``__call__`` runs the
    whole batch through one vectorized "inference" (a matmul against the
    fake embeddings).  The embedding itself is a deterministic fake — the
    8 leading md5 bytes of the payload (no torch in this container) — so
    the op is exactly SQL-mirrorable while the Ray plumbing (actor pool,
    batch-level vectorization, model in __init__) is the real pattern."""

    DIM = 8

    def __init__(self):
        import numpy as _np

        # the "model": the uniform unit vector.  Held by the actor as the
        # real batched-inference shape demands; the dot product below is
        # computed as a row SUM (bit-exact vs the SQL mirror's SUM) rather
        # than emb @ q — the general matmul is NOT IEEE-identical to
        # sum/(sqrt(D)*sqrt(ss)) and a row landing on a .00005 rounding
        # boundary would flip the 4-dp compare (~1 row per 200k measured)
        self._q = _np.ones(self.DIM) / _np.sqrt(float(self.DIM))

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hexes = [hashlib.md5(x.encode()).hexdigest() for x in t["text"].to_pylist()]
        emb = np.array(
            [[int(h[2 * i : 2 * i + 2], 16) for i in range(self.DIM)] for h in hexes],
            dtype=np.float64,
        )
        ss = (emb * emb).sum(axis=1)
        cos = emb.sum(axis=1) / (np.sqrt(float(self.DIM)) * np.sqrt(ss))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "emb_csv": pa.array(
                    [",".join(str(int(v)) for v in row) for row in emb], pa.string()
                ),
                "cos_uniform": pa.array(round_col(cos, 4), pa.float64()),
            }
        )


def media_embed_stub(sf_dir: str):
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    return ds.map_batches(
        EmbedStub, batch_format="pyarrow", batch_size=128, concurrency=2
    )


# --------------------------------------------------- winnowing fingerprints
_WINNOW_K = 20  # char k-gram length (~4 fixture tokens — discriminative)
_WINNOW_W = 8  # winnowing window (guarantee: any match >= k+w-1 chars shows)
_WINNOW_MIN_SHARED = 4  # pair reported when >= this many fingerprints shared
_WINNOW_MAX_DF = 1000  # same quadratic-pair-expansion cap as JACCARD_MAX_DF
_WINNOW_MOD = (1 << 31) - 1
_WINNOW_BASE = 257


def _winnow_fps(text: str) -> set[int]:
    """Winnowing (Schleimer/Wilkerson/Aiken 2003, plain variant): polynomial
    hash of every k-char-gram, then per w-window select the minimum
    (rightmost on ties — NOT the paper's "robust" tie rule, which re-picks
    the previously selected position to lower density; as a fingerprint
    VALUE set the two rules only differ in density, and the k+w-1
    shared-substring guarantee holds for both).  Vectorized: Horner across
    k shifted byte arrays, one sliding-window argmin.  Docs shorter than
    k+w-1 chars degrade to the rightmost global minimum (one fingerprint);
    docs shorter than k have none."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.int64)
    n = len(b) - _WINNOW_K + 1
    if n <= 0:
        return set()
    h = np.zeros(n, dtype=np.int64)
    for j in range(_WINNOW_K):
        h = (h * _WINNOW_BASE + b[j : j + n]) % _WINNOW_MOD
    if n < _WINNOW_W:
        return {int(h[n - 1 - np.argmin(h[::-1])])}
    win = np.lib.stride_tricks.sliding_window_view(h, _WINNOW_W)
    idx = _WINNOW_W - 1 - np.argmin(win[:, ::-1], axis=1)
    pos = np.unique(np.arange(len(win)) + idx)
    return set(h[pos].tolist())


def docs_winnow_dups(sf_dir: str):
    """Cross-document overlap detection via winnowed fingerprints (the
    MOSS algorithm, Schleimer et al. 2003): per-doc LOCAL fingerprint
    selection (density 2/(w+1), guaranteed to surface any shared substring
    of >= k+w-1 chars), then pairs of documents sharing >=
    _WINNOW_MIN_SHARED selected fingerprints.  A distinct dedup family
    from Jaccard/MinHash: selection is positional, so it detects long
    verbatim overlaps (plagiarism/boilerplate) that set-similarity
    dilutes away in long documents.

    Scale shape: fingerprinting is a pure map (the winnowed set is
    ~2/(w+1) of the k-gram count — here ~22% — and only fingerprints,
    never text, leave the scan); ONE hash exchange builds the inverted
    index with the same df cap as the Jaccard family (a fingerprint's
    posting list lives in one partition, hot boilerplate fingerprints
    bounded at _WINNOW_MAX_DF); pair counting rides the existing
    partial-agg shuffle.  O(shared-fp pairs), never O(N^2) docs."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        fps, ids = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for fp in _winnow_fps(text):
                fps.append(fp)
                ids.append(did)
        return pa.table(
            {"w": pa.array(fps, pa.int64()), "doc_id": pa.array(ids, pa.int64())}
        )

    from scrapy__ray.pipelines.util import auto_partitions

    inverted = (
        ds.map_batches(explode, batch_format="pyarrow")
        .repartition(auto_partitions(), keys=["w"], sort=False)
        .map_batches(
            lambda t: _df_capped_segments(t, _WINNOW_MAX_DF),
            batch_format="pyarrow",
            batch_size=None,
        )
    )
    pair_rows = inverted.map_batches(
        lambda t: _segment_pairs(t, ["w"]), batch_format="pyarrow", batch_size=None
    )

    def partial_count(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["doc_a", "doc_b"], as_index=False).size()
        return g.rename(columns={"size": "shared"})

    def final_count(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["doc_a", "doc_b"], as_index=False)["shared"].sum()
        return out[out["shared"] >= _WINNOW_MIN_SHARED]

    out = shuffle_agg(pair_rows, ["doc_a", "doc_b"], partial_count, final_count)
    return collect_arrow(
        out,
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("shared", pa.int64())]
        ),
    )


# ------------------------------------------------- blocklist term matching
#: pinned multi-pattern blocklist.  Every pattern is BORDERLESS (no proper
#: prefix equals a suffix), so occurrences cannot self-overlap and the
#: Aho-Corasick total-match count equals the SQL oracle's non-overlapping
#: REPLACE-based count — asserted at import time below.
_BLOCK_TERMS = ("slow scan", "spark", "spar", "value table", "part hash", "big vector")
for _t in _BLOCK_TERMS:
    # hard check, not assert: python -O must not silently drop the
    # invariant the SQL-oracle equivalence rests on
    if any(_t[:i] == _t[-i:] for i in range(1, len(_t))):
        raise ValueError(f"blocklist term {_t!r} has a border; see docstring")
_BLOCK_THRESHOLD = 3  # blocked when total matches >= this


class BlocklistMatcher:
    """Aho-Corasick multi-pattern matcher as an actor-pool stage: the
    automaton (goto trie + BFS failure links + per-node output counts) is
    built ONCE per actor in __init__ — the stateful-stage pattern for any
    large pattern set (URL blocklists, banned-phrase lists), where
    per-batch recompilation would dominate.  Matching is one pass per doc
    regardless of pattern count; patterns may share prefixes and overlap
    in the text (substring semantics, crossing word boundaries — 'spar'
    matches inside 'spark', both are counted)."""

    def __init__(self):
        goto: list[dict[str, int]] = [{}]
        out: list[int] = [0]
        for term in _BLOCK_TERMS:
            s = 0
            for ch in term:
                if ch not in goto[s]:
                    goto.append({})
                    out.append(0)
                    goto[s][ch] = len(goto) - 1
                s = goto[s][ch]
            out[s] += 1
        fail = [0] * len(goto)
        queue = list(goto[0].values())
        i = 0
        while i < len(queue):
            s = queue[i]
            i += 1
            for ch, t in goto[s].items():
                queue.append(t)
                f = fail[s]
                while f and ch not in goto[f]:
                    f = fail[f]
                fail[t] = goto[f].get(ch, 0) if goto[f].get(ch, 0) != t else 0
                out[t] += out[fail[t]]
        self._goto, self._fail, self._out = goto, fail, out

    def _count(self, text: str) -> int:
        goto, fail, out = self._goto, self._fail, self._out
        s = total = 0
        for ch in text:
            while s and ch not in goto[s]:
                s = fail[s]
            s = goto[s].get(ch, 0)
            if out[s]:
                total += out[s]
        return total

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = [self._count(x) for x in texts]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_matches": pa.array(n, pa.int64()),
                "blocked": pa.array([x >= _BLOCK_THRESHOLD for x in n], pa.bool_()),
            }
        )


def docs_blocklist(sf_dir: str):
    """Blocklist screening over the corpus: total blocklisted-term matches
    per document and the keep/block flag.  Scale shape: pure actor-pool
    map (the automaton lives in actor memory, documents stream through in
    Arrow batches); no exchange at all.  The SQL oracle counts each term
    by REPLACE-shrinkage — exact because the pinned terms are borderless
    (see _BLOCK_TERMS)."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    return collect_arrow(
        ds.map_batches(
            BlocklistMatcher, batch_format="pyarrow", batch_size=256, concurrency=2
        ),
        pa.schema(
            [("doc_id", pa.int64()), ("n_matches", pa.int64()), ("blocked", pa.bool_())]
        ),
    )


_BLOCK_COUNT_EXPR = " + ".join(
    f"(length(text) - length(replace(text, '{t}', ''))) / {len(t)}"
    for t in _BLOCK_TERMS
)
DOCS_BLOCKLIST_SQL = f"""
SELECT doc_id,
       CAST({_BLOCK_COUNT_EXPR} AS BIGINT) AS n_matches,
       CAST({_BLOCK_COUNT_EXPR} AS BIGINT) >= {_BLOCK_THRESHOLD} AS blocked
FROM documents
"""


_EMBED_TERMS = ", ".join(
    f"CAST('0x' || substring(md5(text), {2 * i + 1}, 2) AS INTEGER)"
    for i in range(8)
)
MEDIA_EMBED_SQL = f"""
WITH e AS (SELECT doc_id, [{_EMBED_TERMS}] AS v FROM documents)
SELECT doc_id,
       array_to_string(v, ',') AS emb_csv,
       ROUND(list_sum(list_transform(v, x -> x::DOUBLE))
             / (sqrt(8.0) * sqrt(list_sum(list_transform(v, x -> (x*x)::DOUBLE)))),
             4) AS cos_uniform
FROM e
"""


MEDIA_FRAMESAMPLE_SQL = """
SELECT doc_id, 4::BIGINT AS n_frames,
       md5(substring(text, 0*(len(text)//4)+1, 16)) || ':' ||
       md5(substring(text, 1*(len(text)//4)+1, 16)) || ':' ||
       md5(substring(text, 2*(len(text)//4)+1, 16)) || ':' ||
       md5(substring(text, 3*(len(text)//4)+1, 16)) AS frame_md5s
FROM documents
"""


MEDIA_META_SQL = """
SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS payload_md5,
       ((octet_length(encode(text)) % 64) + 1)::BIGINT AS fake_width,
       (((octet_length(encode(text)) // 64) % 64) + 1)::BIGINT AS fake_height
FROM documents
"""


# ------------------------------------------------------- PMI collocations
_PMI_MIN_COUNT = 5  # candidate floor: bigrams seen fewer times carry no signal
_PMI_TOPK = 20
#: at or below this many corpus documents the unigram-count table is
#: bounded well under driver/worker heap and broadcasts once (skipping
#: both unigram-attachment joins — 1 exchange instead of 4); above it —
#: the web-corpus regime where the vocabulary fits neither a broadcast
#: nor the driver — the shuffle_join path runs (forced + compared in CI)
_PMI_BROADCAST_MAX_DOCS = 200_000


def docs_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-_PMI_TOPK word bigrams by pointwise mutual
    information, PMI = ln( (c_ab/N_b) / ((c_a/N_u)(c_b/N_u)) ), among
    bigrams occurring ≥ _PMI_MIN_COUNT times.  Float evaluation order is
    pinned to the SQL mirror's parse tree — (c_ab·N_u·N_u) / (c_a·c_b·N_b)
    left-associated in float64, ln, then ROUND-half-away to 6 dp — so the
    hash compare is exact (ln() here and DuckDB's resolve to the same
    libm, the docs_bm25_topk precedent).  Ties after rounding break on the
    bigram string both sides.

    Scale shape: ONE corpus scan emits block-combined (kind, key, n)
    partials for unigrams and bigrams together; totals N_u/N_b fold to the
    driver as two scalars.  Two regimes on corpus size (both bit-identical;
    the join regime is forced and compared in CI): at or below
    _PMI_BROADCAST_MAX_DOCS docs the unigram table broadcasts once and the
    bigram exchange computes PMI in place (1 exchange); above it the two
    unigram attachments are shuffle_joins on the left/right token
    (vocabulary never broadcast and never driver-side — the tfidf
    corpus-regime posture; 4 exchanges).  Per-partition top-k then a
    driver merge of partitions × k rows."""
    import math

    import pyarrow.parquet as _pq

    ds = read_parquet(sf_dir, "documents", columns=["text"])
    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def tagged_counts(df: pd.DataFrame) -> pd.DataFrame:
        uni: dict[str, int] = {}
        big: dict[str, int] = {}
        for text in df["text"]:
            toks = _tokens(text)
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for i in range(len(toks) - 1):
                bg = toks[i] + " " + toks[i + 1]
                big[bg] = big.get(bg, 0) + 1
        return pd.DataFrame(
            {
                "kind": np.concatenate(
                    [
                        np.zeros(len(uni), dtype=np.int8),
                        np.ones(len(big), dtype=np.int8),
                    ]
                ),
                "key": list(uni.keys()) + list(big.keys()),
                "n": np.fromiter(
                    list(uni.values()) + list(big.values()),
                    np.int64,
                    len(uni) + len(big),
                ),
            }
        )

    tagged = ds.map_batches(tagged_counts, batch_format="pandas").materialize()

    totals = driver_agg(
        tagged,
        lambda df: df.groupby("kind", as_index=False)["n"].sum(),
        lambda df: df.groupby("kind", as_index=False)["n"].sum(),
    )
    _EMPTY_OUT = pa.table(
        {
            "bigram": pa.array([], pa.string()),
            "c_ab": pa.array([], pa.int64()),
            "pmi": pa.array([], pa.float64()),
        }
    )
    uni_tot = totals.loc[totals["kind"] == 0, "n"]
    big_tot = totals.loc[totals["kind"] == 1, "n"]
    if len(uni_tot) == 0 or len(big_tot) == 0:
        # no tokens / no bigrams anywhere: the SQL mirror returns zero rows
        return _EMPTY_OUT
    n_uni = int(uni_tot.iloc[0])
    n_big = int(big_tot.iloc[0])

    def side(kind: int):
        return tagged.map_batches(
            lambda df, k=kind: df[df["kind"] == k][["key", "n"]],
            batch_format="pandas",
        )

    agg = lambda df: df.groupby("key", as_index=False)["n"].sum()  # noqa: E731

    def pmi_of(cab, ca, cb) -> float:
        # mirror the SQL parse tree exactly, step by step in float64
        num = (float(cab) * float(n_uni)) * float(n_uni)
        den = (float(ca) * float(cb)) * float(n_big)
        return math.log(num / den)

    _EMPTY = pd.DataFrame({"bigram": [], "c_ab": [], "pmi": []}).astype(
        {"c_ab": "int64", "pmi": "float64"}
    )

    if n_docs <= _PMI_BROADCAST_MAX_DOCS:
        from scrapy__ray.pipelines.util import broadcast, lookup_broadcast

        uni_counts = driver_agg(side(0), agg, agg)
        ref = broadcast(
            dict(zip(uni_counts["key"], (int(v) for v in uni_counts["n"])))
        )

        def big_final_scored(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("key", as_index=False)["n"].sum()
            g = g[g["n"] >= _PMI_MIN_COUNT]
            if len(g) == 0:
                return _EMPTY
            lut = lookup_broadcast(ref)
            pmis = []
            for key, cab in zip(g["key"], g["n"]):
                l, r = key.split(" ")
                pmis.append(pmi_of(cab, lut[l], lut[r]))
            out = pd.DataFrame(
                {
                    "bigram": g["key"].values,
                    "c_ab": g["n"].values.astype(np.int64),
                    "pmi": round_col(pmis, 6),
                }
            )
            out = out.sort_values(["pmi", "bigram"], ascending=[False, True])
            return out.head(_PMI_TOPK)

        scored = shuffle_agg(side(1), ["key"], agg, big_final_scored)
    else:
        uni = shuffle_agg(side(0), ["key"], agg, agg)

        def big_final(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("key", as_index=False)["n"].sum()
            g = g[g["n"] >= _PMI_MIN_COUNT]
            parts = g["key"].str.split(" ")
            return pd.DataFrame(
                {
                    "bigram": g["key"].values,
                    "left": parts.str[0].values,
                    "right": parts.str[1].values,
                    "c_ab": g["n"].values,
                }
            )

        big = shuffle_agg(side(1), ["key"], agg, big_final)

        with_a = shuffle_join(
            big,
            uni.map_batches(
                lambda df: df.rename(columns={"key": "left", "n": "c_a"}),
                batch_format="pandas",
            ),
            on="left",
            left_cols=["left", "bigram", "right", "c_ab"],
            right_cols=["left", "c_a"],
        )
        with_ab = shuffle_join(
            with_a,
            uni.map_batches(
                lambda df: df.rename(columns={"key": "right", "n": "c_b"}),
                batch_format="pandas",
            ),
            on="right",
            left_cols=["right", "bigram", "c_ab", "c_a"],
            right_cols=["right", "c_b"],
        )

        def score_head(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return _EMPTY
            g = pd.DataFrame(
                {
                    "bigram": df["bigram"].values,
                    "c_ab": df["c_ab"].values.astype(np.int64),
                    "pmi": round_col(
                        [
                            pmi_of(cab, ca, cb)
                            for cab, ca, cb in zip(
                                df["c_ab"], df["c_a"], df["c_b"]
                            )
                        ],
                        6,
                    ),
                }
            )
            g = g.sort_values(["pmi", "bigram"], ascending=[False, True])
            return g.head(_PMI_TOPK)

        scored = with_ab.map_batches(score_head, batch_format="pandas")

    out = driver_agg(
        scored,
        lambda df: df,
        lambda df: df.sort_values(["pmi", "bigram"], ascending=[False, True]).head(
            _PMI_TOPK
        ),
    )
    return pa.table(
        {
            "bigram": pa.array(out["bigram"], pa.string()),
            "c_ab": pa.array(out["c_ab"].astype("int64"), pa.int64()),
            "pmi": pa.array(out["pmi"], pa.float64()),
        }
    )


DOCS_PMI_SQL = f"""
WITH t AS (
  SELECT regexp_split_to_array(trim(text), '\\s+') AS a
  FROM documents WHERE trim(text) <> ''
),
uni AS (
  SELECT w AS token, COUNT(*) AS c
  FROM (SELECT unnest(a) AS w FROM t) GROUP BY w
),
nu AS (SELECT SUM(c) AS n_uni FROM uni),
big AS (
  SELECT a[i] AS l, a[i+1] AS r, a[i] || ' ' || a[i+1] AS bigram
  FROM t CROSS JOIN UNNEST(range(1, len(a))) AS s(i)
),
bc AS (
  SELECT bigram, MIN(l) AS l, MIN(r) AS r, COUNT(*) AS c_ab
  FROM big GROUP BY bigram HAVING COUNT(*) >= {_PMI_MIN_COUNT}
),
nb AS (SELECT COUNT(*) AS n_big FROM big)
SELECT bc.bigram, bc.c_ab,
       ROUND(ln((bc.c_ab::DOUBLE * nu.n_uni * nu.n_uni)
                / (ua.c::DOUBLE * ub.c * nb.n_big)), 6) AS pmi
FROM bc
JOIN uni ua ON ua.token = bc.l
JOIN uni ub ON ub.token = bc.r
CROSS JOIN nu CROSS JOIN nb
QUALIFY row_number() OVER (ORDER BY pmi DESC, bc.bigram) <= {_PMI_TOPK}
ORDER BY pmi DESC, bigram
"""


# ------------------------------------------ content-defined chunking dedup
# CDC (the storage/backup dedup family — Muthitacharoen et al. 2001 LBFS,
# FastCDC 2016): chunk boundaries are chosen where a rolling hash of the
# LAST _CDC_WINDOW bytes hits a mask, so boundaries are a function of local
# CONTENT, not position — an insertion shifts at most the chunks it touches
# and the stream re-synchronizes at the next content-defined cut (the
# property fixed-window substring dedup lacks; property-tested).
_CDC_WINDOW = 8
_CDC_MASK = np.uint64(31)  # cut when h & 31 == 0 -> ~32-byte average chunks
_CDC_MIN = 8  # smallest chunk the greedy walk accepts
_CDC_MAX = 128  # forced cut beyond this
_CDC_BASE = 0x100000001B3  # odd multiplier (FNV prime), arithmetic mod 2^64
_CDC_POW = np.array(
    [pow(_CDC_BASE, _CDC_WINDOW - 1 - j, 2**64) for j in range(_CDC_WINDOW)],
    dtype=np.uint64,
)


def _cdc_chunks(data: bytes) -> list[str]:
    """Deterministic CDC chunker, pinned contract (the oracle and the naive
    property-test chunker reimplement it independently):
      * h(p) = Σ_{j=0..W-1} BASE^(W-1-j)·byte[p-W+1+j]  (mod 2^64), the
        polynomial hash of the W bytes ENDING at 0-based position p;
      * p is a candidate cut (chunk ends at p inclusive) iff h(p) & 31 == 0
        and p ≥ W-1 and p ≤ n-2 (a cut must leave a non-empty tail);
      * greedy walk from the doc start: accept the first candidate giving a
        chunk of ≥ _CDC_MIN bytes; if none within _CDC_MAX bytes, force a
        cut at exactly _CDC_MAX; the remainder is the final chunk (any
        length ≥ 1).
    Returns md5 hexdigests (128-bit: content hashes used as exchange keys
    collide by birthday at 64 bits on the 10^10-doc design point)."""
    n = len(data)
    if n == 0:
        return []
    if n >= _CDC_WINDOW:
        b = np.frombuffer(data, np.uint8).astype(np.uint64)
        h = np.zeros(n - _CDC_WINDOW + 1, np.uint64)
        for j in range(_CDC_WINDOW):
            h += b[j : j + n - _CDC_WINDOW + 1] * _CDC_POW[j]
        cand = np.nonzero((h & _CDC_MASK) == 0)[0] + (_CDC_WINDOW - 1)
    else:
        cand = np.empty(0, dtype=np.int64)
    cuts: list[int] = []
    last = 0
    while True:
        lo = last + _CDC_MIN - 1
        hi = last + _CDC_MAX - 1
        i = int(np.searchsorted(cand, lo))
        if i < len(cand) and cand[i] <= min(hi, n - 2):
            last = int(cand[i]) + 1
            cuts.append(last)
        elif hi <= n - 2:
            last = hi + 1
            cuts.append(last)
        else:
            cuts.append(n)
            break
    out: list[str] = []
    prev = 0
    for c in cuts:
        out.append(hashlib.md5(data[prev:c]).hexdigest())
        prev = c
    return out


def docs_cdc_dups(sf_dir: str):
    """Cross-document duplicated-content fraction via CDC chunks: per doc,
    how many of its DISTINCT chunk hashes occur in at least one other doc,
    and the duplicated fraction (round-half-away 4 dp, computed in exact
    integers as (2·10⁴·dup + total) // (2·total)).  Documents whose text
    encodes to zero bytes produce no chunks and are absent from the output
    (pinned; the oracle mirrors).

    Scale shape: the corpus is scanned once; only (doc_id, 16-byte chunk
    hash) rows ever leave the scan — the text itself is never shuffled.
    Exchange 1 hash-partitions the rows by chunk, where each chunk's
    distinct-doc count is simply its LOCAL group size (rows are
    (doc, chunk)-distinct by construction) and per-doc partials emit in
    place — co-locating on the correlation key deletes the former
    count-then-join-back pair (the decorrelation-by-co-location pattern);
    exchange 2 folds per-doc totals by doc_id.  Oracle: independent
    pure-Python chunker + Counter (oracle_ext.oracle_docs_cdc_dups),
    materialized."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def chunk_rows(df: pd.DataFrame) -> pd.DataFrame:
        ids: list[int] = []
        chunks: list[str] = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            for ch in set(_cdc_chunks(text.encode("utf-8"))):
                ids.append(int(doc_id))
                chunks.append(ch)
        return pd.DataFrame({"doc_id": np.asarray(ids, dtype=np.int64), "chunk": chunks})

    rows = ds.map_batches(chunk_rows, batch_format="pandas")

    def per_chunk(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"doc_id": [], "one": [], "dup": []}
            ).astype({"doc_id": "int64", "one": "int64", "dup": "int64"})
        n_docs = df.groupby("chunk")["doc_id"].transform("size")
        g = pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "one": np.ones(len(df), dtype=np.int64),
                "dup": (n_docs.values >= 2).astype(np.int64),
            }
        )
        return g.groupby("doc_id", as_index=False).sum()

    joined = hash_partition_map(rows, ["chunk"], per_chunk)

    def doc_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False).sum()

    def doc_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", as_index=False).sum()
        total = g["one"].values.astype(np.int64)
        dup = g["dup"].values.astype(np.int64)
        frac = (2 * 10_000 * dup + total) // (2 * total) / 1e4
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].values,
                "n_chunks": total,
                "n_dup_chunks": dup,
                "dup_frac": frac,
            }
        )

    out = shuffle_agg(joined, ["doc_id"], doc_partial, doc_final)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_chunks", pa.int64()),
                ("n_dup_chunks", pa.int64()),
                ("dup_frac", pa.float64()),
            ]
        ),
    )


# ------------------------------------------------ C4-style span dedup
_SPAN_W = 10  # tokens per non-overlapping span


def docs_span_dedup(sf_dir: str):
    """C4-style duplicate-span removal (Raffel et al. 2020, the "discard all
    but one of any three-sentence span occurring more than once" dedup step,
    adapted to fixed 10-token spans — the synthetic corpus has no sentence
    punctuation): every occurrence of a span that appears more than once
    ACROSS THE CORPUS is removed except the globally first one (ordered by
    (doc_id, span ordinal)), and each document is rebuilt from its kept
    spans, single-space joined.

    Scale shape: explode to (span, doc_id, ord) rows inside map_batches;
    exchange 1 hash-partitions by span so keeper election is one local
    vectorized sort + ``duplicated(keep='first')`` per partition
    (hash_partition_map — no per-group dispatch) and only the REMOVAL list
    (doc_id, ord of non-keeper duplicate occurrences — tiny) survives;
    exchange 2 is the tag/union repartition-join of removals with the
    document texts by doc_id, outer on the doc side so removal-free docs
    pass through, rebuilding each partition's docs locally.  The driver
    never sees the corpus; both exchanges move O(tokens) and O(dups)."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        spans: list[str] = []
        ids: list[int] = []
        ords: list[int] = []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _tokens(text)
            for k in range(0, len(toks), _SPAN_W):
                spans.append(" ".join(toks[k : k + _SPAN_W]))
                ids.append(did)
                ords.append(k // _SPAN_W + 1)
        return pa.table(
            {
                "span": pa.array(spans, pa.string()),
                "doc_id": pa.array(ids, pa.int64()),
                "ord": pa.array(ords, pa.int64()),
            }
        )

    def removals(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": [], "ord": []}).astype(
                {"doc_id": "int64", "ord": "int64"}
            )
        # all occurrences of a span are in THIS partition: global keeper =
        # first row in (doc_id, ord) order; duplicated() marks the rest
        df = df.sort_values(["span", "doc_id", "ord"], kind="mergesort")
        return df.loc[df.duplicated("span", keep="first"), ["doc_id", "ord"]]

    rem = hash_partition_map(
        ds.map_batches(explode, batch_format="pyarrow"), ["span"], removals
    )

    # tag/union rebuild exchange: docs (side 0) + removals (side 1) by doc_id
    def tag_docs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text": t["text"],
                "ord": pa.nulls(t.num_rows, pa.int64()),
                "__side": pa.array(np.zeros(t.num_rows, dtype=np.int32)),
            }
        )

    def tag_rem(df: pd.DataFrame) -> pa.Table:
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64)),
                "text": pa.nulls(len(df), pa.string()),
                "ord": pa.array(df["ord"].to_numpy(np.int64)),
                "__side": pa.array(np.ones(len(df), dtype=np.int32)),
            }
        )

    both = ds.map_batches(tag_docs, batch_format="pyarrow").union(
        rem.map_batches(tag_rem, batch_format="pandas", batch_size=None)
    )

    def rebuild(block) -> pa.Table:
        import pyarrow.compute as pc

        if not isinstance(block, pa.Table):
            block = pa.Table.from_pandas(block, preserve_index=False)
        if block.num_rows == 0 or "__side" not in block.schema.names:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "clean_text": pa.array([], pa.string()),
                    "n_spans": pa.array([], pa.int64()),
                    "n_removed": pa.array([], pa.int64()),
                }
            )
        side = block["__side"]
        docs = block.filter(pc.equal(side, 0))
        remt = block.filter(pc.equal(side, 1))
        removed: dict[int, set[int]] = {}
        for did, o in zip(remt["doc_id"].to_pylist(), remt["ord"].to_pylist()):
            removed.setdefault(did, set()).add(o)
        ids, cleans, nspans, nrem = [], [], [], []
        for did, text in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
            toks = _tokens(text)
            n_sp = (len(toks) + _SPAN_W - 1) // _SPAN_W
            gone = removed.get(did, ())
            kept: list[str] = []
            for k in range(n_sp):
                if (k + 1) not in gone:
                    kept.extend(toks[k * _SPAN_W : (k + 1) * _SPAN_W])
            ids.append(did)
            cleans.append(" ".join(kept))
            nspans.append(n_sp)
            nrem.append(len(gone))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(cleans, pa.string()),
                "n_spans": pa.array(nspans, pa.int64()),
                "n_removed": pa.array(nrem, pa.int64()),
            }
        )

    from scrapy__ray.pipelines.util import auto_partitions, ensure_ctx

    ensure_ctx()
    out = both.repartition(auto_partitions(), keys=["doc_id"], sort=False).map_batches(
        rebuild, batch_format=None, batch_size=None
    )
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("clean_text", pa.string()),
                ("n_spans", pa.int64()),
                ("n_removed", pa.int64()),
            ]
        ),
    )


# ------------------------------------------------------ phrase search
#: pinned query phrase (positional exact match; present at every sf scale)
_PHRASE = ("a", "key", "column")


def docs_phrase_search(sf_dir: str):
    """Exact positional phrase search (the IR phrase-query primitive the
    positional variant of docs_inverted_index exists for): documents
    containing the pinned 3-token phrase as CONSECUTIVE tokens, with
    overlapping-occurrence count and the 1-based position of the first hit.

    Shape: embarrassingly parallel — one map_batches scan, no exchange;
    only matching (doc_id, n_hits, first_pos) rows leave the scan.  At
    index-backed scale the same result comes from intersecting positional
    postings of the phrase terms (document-at-a-time with position offsets);
    the scan form is the oracle-exact baseline and the right plan for
    one-off phrases, matching Lucene's rule of thumb that a rare-term scan
    beats index maintenance for ad-hoc single queries."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    k = len(_PHRASE)

    def scan(t: pa.Table) -> pa.Table:
        ids, hits, firsts = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            toks = _tokens(text)
            n = 0
            first = 0
            for i in range(len(toks) - k + 1):
                if tuple(toks[i : i + k]) == _PHRASE:
                    n += 1
                    if not first:
                        first = i + 1
            if n:
                ids.append(did)
                hits.append(n)
                firsts.append(first)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_hits": pa.array(hits, pa.int64()),
                "first_pos": pa.array(firsts, pa.int64()),
            }
        )

    return collect_arrow(
        ds.map_batches(scan, batch_format="pyarrow"),
        pa.schema(
            [("doc_id", pa.int64()), ("n_hits", pa.int64()), ("first_pos", pa.int64())]
        ),
    )


DOCS_PHRASE_SEARCH_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
),
pos AS (
  SELECT doc_id, i
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i) g
  WHERE ts[i] = 'a' AND ts[i+1] = 'key' AND ts[i+2] = 'column'
)
SELECT doc_id, COUNT(*)::BIGINT AS n_hits, MIN(i)::BIGINT AS first_pos
FROM pos GROUP BY doc_id
"""


DOCS_SPAN_DEDUP_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
              ELSE regexp_split_to_array(trim(text), '\s+') END AS ts
  FROM documents
),
spans AS (
  SELECT doc_id, ((i-1)//10)+1 AS ord, array_to_string(ts[i:i+9], ' ') AS span
  FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts), 10)) AS i) g
),
marked AS (
  SELECT doc_id, ord, span,
         COUNT(*) OVER (PARTITION BY span) AS n,
         ROW_NUMBER() OVER (PARTITION BY span ORDER BY doc_id, ord) AS rn
  FROM spans
),
per_doc AS (SELECT doc_id, COUNT(*) AS n_spans FROM spans GROUP BY doc_id),
kept AS (
  SELECT doc_id, string_agg(span, ' ' ORDER BY ord) AS clean_text,
         COUNT(*) AS n_kept
  FROM marked WHERE n = 1 OR rn = 1 GROUP BY doc_id
)
SELECT t.doc_id,
       COALESCE(k.clean_text, '') AS clean_text,
       COALESCE(p.n_spans, 0) AS n_spans,
       COALESCE(p.n_spans, 0) - COALESCE(k.n_kept, 0) AS n_removed
FROM toks t
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN kept k USING (doc_id)
"""


QUERIES = {
    "docs_exact_dedup": (docs_exact_dedup, DOCS_EXACT_DEDUP_SQL),
    "docs_span_dedup": (docs_span_dedup, DOCS_SPAN_DEDUP_SQL),
    "docs_phrase_search": (docs_phrase_search, DOCS_PHRASE_SEARCH_SQL),
    "docs_token_stats": (docs_token_stats, DOCS_TOKEN_STATS_SQL),
    "docs_stats_by_lang": (docs_stats_by_lang, DOCS_STATS_BY_LANG_SQL),
    "docs_fingerprint": (docs_fingerprint, DOCS_FINGERPRINT_SQL),
    "docs_jaccard_dups": (docs_jaccard_dups, DOCS_JACCARD_SQL),
    "docs_containment_dups": (docs_containment_dups, DOCS_CONTAINMENT_SQL),
    "docs_ngram_jaccard_dups": (docs_ngram_jaccard_dups, DOCS_NGRAM_JACCARD_SQL),
    "docs_topk_ngrams": (docs_topk_ngrams, DOCS_TOPK_NGRAMS_SQL),
    "docs_mirror_sources": (docs_mirror_sources, DOCS_MIRROR_SOURCES_SQL),
    "docs_pmi_bigrams": (docs_pmi_bigrams, DOCS_PMI_SQL),
    "docs_token_spectrum": (docs_token_spectrum, DOCS_TOKEN_SPECTRUM_SQL),
    "docs_dedup_incremental": (docs_dedup_incremental, DOCS_DEDUP_INCR_SQL),
    "docs_sample_stratified": (docs_sample_stratified, DOCS_SAMPLE_STRATIFIED_SQL),
    "docs_quality": (docs_quality, DOCS_QUALITY_SQL),
    "docs_bpe_tokens": (docs_bpe_tokens, DOCS_BPE_TOKENS_SQL),
    "docs_rolling_fingerprint": (docs_rolling_fingerprint, None),
    "docs_winnow_dups": (docs_winnow_dups, None),
    "docs_cdc_dups": (docs_cdc_dups, None),
    "docs_minhash_lsh": (docs_minhash_lsh, None),
    "docs_edit_dups": (docs_edit_dups, None),
    "docs_simhash": (docs_simhash, None),
    "docs_simhash_dups": (docs_simhash_dups, None),
    "docs_langid": (docs_langid, None),
    "docs_normalize": (docs_normalize, DOCS_NORMALIZE_SQL),
    "docs_scrub_pii": (docs_scrub_pii, DOCS_SCRUB_PII_SQL),
    "docs_blocklist": (docs_blocklist, DOCS_BLOCKLIST_SQL),
    "media_meta_stub": (media_meta_stub, MEDIA_META_SQL),
    "media_framesample_stub": (media_framesample_stub, MEDIA_FRAMESAMPLE_SQL),
    "media_embed_stub": (media_embed_stub, MEDIA_EMBED_SQL),
}
