"""Corpus-quality operators for LLM training-data curation.

Three pipelines over the ``documents`` table, each with an exact DuckDB SQL
oracle (identical column names, shared tokenization contract from
``textops``: tokens = regex split of trim(text) on \\s+; n_chars =
len(regexp_replace(trim(text), '\\s+', '', 'g'))):

* ``docs_repetition_signals`` — Gopher-style repetition filters (Rae et al.
  2021, "Scaling Language Models", table A1): fraction of characters in the
  most frequent word {2,3,4}-gram, fraction of characters in duplicated
  5-grams, and duplicate-token fraction.  The fixture corpus has no
  newlines, so the line/paragraph variants of the Gopher family degenerate
  (every doc is one line) and are folded into the token-level signals.
* ``docs_decontaminate`` — benchmark n-gram decontamination: flag every
  corpus document sharing a 5-gram with a FIXED, SMALL benchmark set
  (modeled as doc_id < 25 — the standard eval-set holdout shape).  The
  benchmark side is read with parquet predicate pushdown and broadcast via
  ``ray.put`` ONCE; at the 100 TB design point the corpus side streams and
  the benchmark set (an eval suite, not a corpus slice) stays O(MBs).
* ``docs_tfidf_top_terms`` — distributed TF-IDF, top-3 terms per document:
  per-doc term counts in one map_batches pass (no shuffle: a document is
  one row); below the vocab threshold df folds to the driver and rides
  back as a broadcast; above it ONE hash exchange by term co-locates each
  term's tf rows so df is computed in place (a 100 TB corpus's vocabulary
  fits neither a broadcast nor the driver); final hash partition by
  doc_id for the exact per-doc top-k.

No reference file citations: /root/reference is empty (SURVEY.md §0); the
Gopher signal definitions follow the published paper.
"""

from __future__ import annotations

import collections
import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy__ray.pipelines.util import (
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

_WS = re.compile(r"\s+")


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else []


def _round4(x: float) -> float:
    # scalar half-away-from-zero, matching SQL ROUND(x, 4) (round_col's
    # contract) for per-row computed fractions
    return float(np.sign(x) * np.floor(abs(x) * 1e4 + 0.5) / 1e4)


#: TF-IDF df-lookup regime switch: at or below this many documents the
#: vocabulary comfortably broadcasts (term->df dict); above it the
#: term-keyed shuffle path keeps every node out of single-node territory.
_VOCAB_BROADCAST_MAX_DOCS = 200_000

# ------------------------------------------------- Gopher repetition signals
_REP_THRESH = {2: 0.20, 3: 0.18, 4: 0.16}  # Gopher table A1 top-ngram caps
_DUP5_THRESH = 0.15  # Gopher dup-ngram cap (n=5 row)


def _gopher_signals(ws: list[str], n_chars: int) -> tuple[dict[int, float], float]:
    """The shared repetition-signal core (used by docs_repetition_signals
    AND the fused curation pass — one definition, one set of tie-breaks):
    tops[n] = char fraction of the most frequent word n-gram (overlapping
    occurrences, ties to the lexicographically smallest gram), dup5 = char
    fraction of duplicate 5-grams (occurrences beyond the first, capped)."""
    n = len(ws)
    tops: dict[int, float] = {}
    for gn in (2, 3, 4):
        if n < gn or not n_chars:
            tops[gn] = 0.0
            continue
        c = collections.Counter(
            " ".join(ws[i : i + gn]) for i in range(n - gn + 1)
        )
        g, cnt = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        tops[gn] = _round4(cnt * len(g.replace(" ", "")) / n_chars)
    if n < 5 or not n_chars:
        dup5 = 0.0
    else:
        c5 = collections.Counter(" ".join(ws[i : i + 5]) for i in range(n - 4))
        extra = sum(
            (cnt - 1) * len(g.replace(" ", ""))
            for g, cnt in c5.items()
            if cnt > 1
        )
        dup5 = _round4(min(1.0, extra / n_chars))
    return tops, dup5


def _gopher_keep(tops: dict[int, float], dup5: float) -> bool:
    return (
        tops[2] <= _REP_THRESH[2]
        and tops[3] <= _REP_THRESH[3]
        and tops[4] <= _REP_THRESH[4]
        and dup5 <= _DUP5_THRESH
    )


def docs_repetition_signals(sf_dir: str):
    """Per-document repetition metrics: for n in {2,3,4} the fraction of
    non-space characters covered by the single most frequent word n-gram
    (count x chars(ngram) / n_chars, tie broken to the lexicographically
    smallest ngram; occurrences are counted with overlap, so a degenerate
    'a b a b ...' doc can exceed 1.0 — the filter direction is unaffected),
    the fraction of characters in duplicate 5-grams (occurrences beyond
    the first, capped at 1.0), the duplicate-token fraction, and the
    Gopher keep flag.  One vectorizable map_batches pass
    per block — a per-document metric needs no shuffle, so this streams at
    any corpus size."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def signals(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out = {
            "top_2gram_char_frac": [],
            "top_3gram_char_frac": [],
            "top_4gram_char_frac": [],
            "dup_5gram_char_frac": [],
            "dup_token_frac": [],
            "keep": [],
        }
        for text in t["text"].to_pylist():
            ws = _tokens(text)
            n_chars = sum(len(w) for w in ws)
            tops, dup5 = _gopher_signals(ws, n_chars)
            # (n - distinct)/n, NOT 1 - distinct/n: the float results differ
            # at the 4-decimal rounding boundary (e.g. 1/160) and the SQL
            # oracle computes the subtract-first form
            dupt = _round4((len(ws) - len(set(ws))) / len(ws)) if ws else 0.0
            keep = _gopher_keep(tops, dup5)
            out["top_2gram_char_frac"].append(tops[2])
            out["top_3gram_char_frac"].append(tops[3])
            out["top_4gram_char_frac"].append(tops[4])
            out["dup_5gram_char_frac"].append(dup5)
            out["dup_token_frac"].append(dupt)
            out["keep"].append(keep)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                **{
                    k: pa.array(v, pa.float64())
                    for k, v in out.items()
                    if k != "keep"
                },
                "keep": pa.array(out["keep"], pa.bool_()),
            }
        )

    return ds.map_batches(signals, batch_format="pyarrow")


def _ngram_cte(n: int, src: str = "base") -> str:
    """SQL fragment: explode ``arr`` (1-based) into word n-grams."""
    joined = " || ' ' || ".join(f"arr[i+{k}]" for k in range(n))
    return (
        f"SELECT doc_id, unnest(list_transform(range(1, len(arr) - {n - 2}), "
        f"i -> {joined.replace('arr[i+0]', 'arr[i]')})) AS g "
        f"FROM {src} WHERE len(arr) >= {n}"
    )


DOCS_REPETITION_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS arr,
         len(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_chars
  FROM documents
),
c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(2)}) GROUP BY 1, 2),
c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(3)}) GROUP BY 1, 2),
c4 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(4)}) GROUP BY 1, 2),
c5 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(5)}) GROUP BY 1, 2),
t2 AS (SELECT doc_id, c * len(replace(g, ' ', '')) AS chars FROM c2
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
t3 AS (SELECT doc_id, c * len(replace(g, ' ', '')) AS chars FROM c3
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
t4 AS (SELECT doc_id, c * len(replace(g, ' ', '')) AS chars FROM c4
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
d5 AS (SELECT doc_id, SUM((c - 1) * len(replace(g, ' ', ''))) AS chars
       FROM c5 WHERE c > 1 GROUP BY doc_id),
f AS (
  SELECT b.doc_id,
    ROUND(COALESCE(t2.chars, 0)::DOUBLE / NULLIF(b.n_chars, 0), 4) AS top_2gram_char_frac,
    ROUND(COALESCE(t3.chars, 0)::DOUBLE / NULLIF(b.n_chars, 0), 4) AS top_3gram_char_frac,
    ROUND(COALESCE(t4.chars, 0)::DOUBLE / NULLIF(b.n_chars, 0), 4) AS top_4gram_char_frac,
    CASE WHEN b.n_chars = 0 THEN 0.0
         ELSE ROUND(LEAST(1.0, COALESCE(d5.chars, 0)::DOUBLE / b.n_chars), 4)
    END AS dup_5gram_char_frac,
    CASE WHEN len(arr) = 0 THEN 0.0
         ELSE ROUND((len(arr) - len(list_distinct(arr)))::DOUBLE / len(arr), 4)
    END AS dup_token_frac
  FROM base b
  LEFT JOIN t2 ON b.doc_id = t2.doc_id
  LEFT JOIN t3 ON b.doc_id = t3.doc_id
  LEFT JOIN t4 ON b.doc_id = t4.doc_id
  LEFT JOIN d5 ON b.doc_id = d5.doc_id
)
SELECT doc_id,
  COALESCE(top_2gram_char_frac, 0.0) AS top_2gram_char_frac,
  COALESCE(top_3gram_char_frac, 0.0) AS top_3gram_char_frac,
  COALESCE(top_4gram_char_frac, 0.0) AS top_4gram_char_frac,
  COALESCE(dup_5gram_char_frac, 0.0) AS dup_5gram_char_frac,
  dup_token_frac,
  (COALESCE(top_2gram_char_frac, 0.0) <= {_REP_THRESH[2]}
   AND COALESCE(top_3gram_char_frac, 0.0) <= {_REP_THRESH[3]}
   AND COALESCE(top_4gram_char_frac, 0.0) <= {_REP_THRESH[4]}
   AND COALESCE(dup_5gram_char_frac, 0.0) <= {_DUP5_THRESH}) AS keep
FROM f
"""


# ------------------------------------------------------- decontamination
_DECON_BENCH_MAX = 25  # doc_id < 25 models the fixed benchmark/eval set
_DECON_N = 5


def _bench_shingles(sf_dir: str) -> frozenset[str]:
    """Benchmark-side 5-gram set via parquet predicate pushdown: row-group
    statistics prune the scan to the benchmark ids — at the design point
    the corpus is 10^10 docs and this must read O(benchmark), not O(corpus)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["text"],
        filters=[("doc_id", "<", _DECON_BENCH_MAX)],
    )
    out: set[str] = set()
    for text in t["text"].to_pylist():
        ws = _tokens(text)
        out.update(
            " ".join(ws[i : i + _DECON_N]) for i in range(len(ws) - _DECON_N + 1)
        )
    return frozenset(out)


def docs_decontaminate(sf_dir: str):
    """Benchmark decontamination: for every non-benchmark document, the
    number of distinct 5-grams it shares with the benchmark set and a
    contaminated flag.  The benchmark shingle set is built once on the
    driver (pushdown read of the fixed benchmark rows), ``ray.put`` once,
    and read from the object store inside every map task — the canonical
    broadcast-small-side pattern; the corpus side streams block by block."""
    ref = broadcast(_bench_shingles(sf_dir))
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def check(t: pa.Table) -> pa.Table:
        bench = lookup_broadcast(ref)
        ids, hits = [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did < _DECON_BENCH_MAX:
                continue
            ws = _tokens(text)
            grams = {
                " ".join(ws[i : i + _DECON_N])
                for i in range(len(ws) - _DECON_N + 1)
            }
            ids.append(did)
            hits.append(len(grams & bench))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "n_bench_hits": pa.array(hits, pa.int64()),
                "contaminated": pa.array([h > 0 for h in hits], pa.bool_()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


DOCS_DECONTAMINATE_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS arr
  FROM documents
),
dg AS (SELECT DISTINCT doc_id, g FROM ({_ngram_cte(_DECON_N)})),
bench AS (SELECT DISTINCT g FROM dg WHERE doc_id < {_DECON_BENCH_MAX}),
hits AS (
  SELECT dg.doc_id, COUNT(*) AS n_bench_hits
  FROM dg JOIN bench USING (g)
  WHERE dg.doc_id >= {_DECON_BENCH_MAX}
  GROUP BY dg.doc_id
)
SELECT d.doc_id,
       COALESCE(h.n_bench_hits, 0)::BIGINT AS n_bench_hits,
       COALESCE(h.n_bench_hits, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id >= {_DECON_BENCH_MAX}
"""


# ------------------------------------------------------------------ TF-IDF
_TFIDF_K = 3


def docs_tfidf_top_terms(sf_dir: str):
    """Top-3 TF-IDF terms per document (smooth idf: ln((1+N)/(1+df)) + 1).

    Shape: (1) per-doc term counts in one map_batches pass — a document is
    a single row, so tf needs no exchange; (2+3) document frequency and
    its attachment in ONE hash exchange by term: co-locating each term's
    tf rows makes df(term) the local row count (a 100 TB corpus's
    vocabulary cannot be broadcast, and the former shuffle_agg +
    shuffle_join pair moved the same rows twice); (4) hash
    partition by doc_id, exact per-doc top-3 on (rounded tfidf DESC, term).
    Ranking uses the ROUNDED score on both engine and oracle sides so the
    selected set is identical under float formatting differences."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata count — no scan

    def term_counts(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for term, c in collections.Counter(
                w.lower() for w in _tokens(text)
            ).items():
                ids.append(did)
                terms.append(term)
                tfs.append(c)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    # materialize: tf feeds both the docfreq shuffle_agg and the join —
    # without it Ray re-reads and re-tokenizes the corpus per consumer
    tf = ds.map_batches(term_counts, batch_format="pyarrow").materialize()

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("term", as_index=False).size()
        return g.rename(columns={"size": "df"})

    def df_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("term", as_index=False)["df"].sum()

    # TWO-REGIME df lookup (the Jaccard-sizes pattern): below
    # _VOCAB_BROADCAST_MAX_DOCS the vocabulary is bounded well under
    # broadcast size, so document frequency folds to the driver via
    # mergeable partials over the materialized tf table (no exchange) and
    # rides back as a broadcast dict — skipping the term shuffle_agg AND
    # the term shuffle_join (2 of the 4 exchanges).  Above it — corpus
    # scale, vocabulary too large for any single node — the all-dataset
    # path below runs unchanged.
    if n_docs <= _VOCAB_BROADCAST_MAX_DOCS:
        dfreq = driver_agg(tf, df_partial, df_final)
        df_map = broadcast(
            {t: int(d) for t, d in zip(dfreq["term"], dfreq["df"])}
        )

        def attach_df(df: pd.DataFrame) -> pd.DataFrame:
            m = lookup_broadcast(df_map)
            return df.assign(df=df["term"].map(m).astype(np.int64))

        joined = tf.map_batches(attach_df, batch_format="pandas")
    else:
        # decorrelation-by-co-location (the Q17/cohort trick): ONE hash
        # exchange of the tf rows by term puts every term's rows in one
        # partition, where df(term) is just the per-term row count (tf has
        # one row per (doc, term)) — the former shuffle_agg + shuffle_join
        # pair over the same rows collapses into a single exchange
        def attach_df_local(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                df=df.groupby("term")["doc_id"].transform("size").astype(np.int64)
            )

        joined = hash_partition_map(tf, ["term"], attach_df_local)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"doc_id": [], "term": [], "tfidf": []})
        idf = np.log((1.0 + n_docs) / (1.0 + df["df"].to_numpy(np.float64))) + 1.0
        df = df.assign(tfidf=round_col(df["tf"].to_numpy(np.float64) * idf, 4))
        df = df.sort_values(
            ["doc_id", "tfidf", "term"], ascending=[True, False, True],
            kind="mergesort",
        )
        return df.groupby("doc_id", as_index=False).head(_TFIDF_K)[
            ["doc_id", "term", "tfidf"]
        ]

    out = hash_partition_map(joined, ["doc_id"], topk)
    return collect_arrow(
        out,
        pa.schema(
            [("doc_id", pa.int64()), ("term", pa.string()), ("tfidf", pa.float64())]
        ),
    )


DOCS_TFIDF_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
  FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT doc_id, lower(w) AS term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
n AS (SELECT COUNT(*) AS n FROM documents)
SELECT doc_id, term, tfidf FROM (
  SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * (ln((1.0 + n.n) / (1.0 + df.df)) + 1.0), 4) AS tfidf
  FROM tf JOIN df USING (term) CROSS JOIN n
)
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) <= {_TFIDF_K}
"""


# ------------------------------------------------------- source mixing
def docs_source_mix(sf_dir: str):
    """Data-mixing weights per source: document/token counts, the source's
    share of the corpus, and the up/down-sampling weight that would flatten
    the mix to uniform-over-sources (weight = target_frac / actual_frac) —
    the bookkeeping every multi-source pretraining mix needs.  Source
    cardinality is tiny (corpus provenance labels), so this is the
    combiner + driver-reduce shape: one row per (source, block) moves."""
    ds = read_parquet(sf_dir, "documents", columns=["source", "text"])

    def counts(t: pa.Table) -> pa.Table:
        ntok = [len(_tokens(x)) for x in t["text"].to_pylist()]
        return pa.table(
            {"source": t["source"], "n_tokens": pa.array(ntok, pa.int64())}
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("source", as_index=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), n_tokens=("n_tokens", "sum")
        )
        total = g["n_docs"].sum()
        frac = g["n_docs"].to_numpy(np.float64) / total
        target = 1.0 / len(g)
        return g.assign(
            doc_frac=round_col(frac, 4), mix_weight=round_col(target / frac, 4)
        ).sort_values("source")

    return driver_agg(ds.map_batches(counts, batch_format="pyarrow"), partial, final)


DOCS_SOURCE_MIX_SQL = """
WITH s AS (
  SELECT source, COUNT(*) AS n_docs,
         SUM(CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END) AS n_tokens
  FROM documents GROUP BY source
),
t AS (SELECT SUM(n_docs) AS total, COUNT(*) AS n_sources FROM s)
SELECT source, n_docs, n_tokens::BIGINT AS n_tokens,
       ROUND(n_docs::DOUBLE / t.total, 4) AS doc_frac,
       ROUND((1.0 / t.n_sources) / (n_docs::DOUBLE / t.total), 4) AS mix_weight
FROM s CROSS JOIN t
ORDER BY source
"""


# ------------------------------------------------- composed curation keep-set
def docs_curation_pipeline(sf_dir: str):
    """Flagship composed curation: the keep-set a pretraining corpus build
    actually wants — quality filter AND repetition filter AND benchmark
    decontamination AND exact-dedup canonicality, over the non-benchmark
    corpus (doc_id >= the benchmark holdout).

    Shape: ONE fused map_batches pass computes text_hash + the three
    per-document flags (the benchmark shingle set rides along as a
    broadcast object — no extra read of the corpus per filter, unlike
    running the four queries separately); one hash-shuffle by text_hash
    finds each content group's canonical (min) doc_id; one shuffle_join
    brings the canonical id back to the rows.  Two exchanges total for a
    four-filter pipeline — at 100 TB the fusion is the difference between
    one corpus scan and four."""
    from scrapy__ray.pipelines.textops import _PUNCT

    ref = broadcast(_bench_shingles(sf_dir))
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def flags(t: pa.Table) -> pa.Table:
        import hashlib

        bench = lookup_broadcast(ref)
        ids, hashes, q_ok, r_ok, unc = [], [], [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            if did < _DECON_BENCH_MAX:
                continue
            ws = _tokens(text)
            n = len(ws)
            n_chars = sum(len(w) for w in ws)
            n_punct = sum(1 for ch in text if ch in _PUNCT)
            pr = n_punct / n_chars if n_chars else 0.0
            tops, dup5 = _gopher_signals(ws, n_chars)
            grams = {
                " ".join(ws[i : i + _DECON_N])
                for i in range(n - _DECON_N + 1)
            }
            ids.append(did)
            hashes.append(hashlib.md5(text.encode("utf-8")).hexdigest())
            q_ok.append(n >= 10 and pr < 0.3)
            r_ok.append(_gopher_keep(tops, dup5))
            unc.append(not (grams & bench))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text_hash": pa.array(hashes, pa.string()),
                "quality_ok": pa.array(q_ok, pa.bool_()),
                "repetition_ok": pa.array(r_ok, pa.bool_()),
                "uncontaminated": pa.array(unc, pa.bool_()),
            }
        )

    # materialize: flagged feeds BOTH the canonical shuffle_agg and the
    # shuffle_join below — unmaterialized, Ray re-executes the fused flags
    # pass (the expensive corpus scan) once per consumer.  The table is
    # narrow (doc_id + md5 hex + 3 bools ≈ 50 B/row), so holding it in the
    # object store keeps the corpus scan at exactly one.
    flagged = ds.map_batches(flags, batch_format="pyarrow").materialize()

    def canon_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_hash", as_index=False).agg(
            keep_doc_id=("doc_id", "min")
        )

    def canon_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("text_hash", as_index=False)["keep_doc_id"].min()

    canonical = shuffle_agg(
        flagged.select_columns(["text_hash", "doc_id"]),
        ["text_hash"], canon_partial, canon_final,
    )

    joined = shuffle_join(
        flagged, canonical, on="text_hash",
        left_cols=[
            "text_hash", "doc_id", "quality_ok", "repetition_ok", "uncontaminated"
        ],
        right_cols=["text_hash", "keep_doc_id"],
    )

    def verdict(df: pd.DataFrame) -> pa.Table:
        is_canon = df["doc_id"].to_numpy() == df["keep_doc_id"].to_numpy()
        keep = (
            df["quality_ok"].to_numpy(bool)
            & df["repetition_ok"].to_numpy(bool)
            & df["uncontaminated"].to_numpy(bool)
            & is_canon
        )
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "quality_ok": pa.array(df["quality_ok"].to_numpy(bool)),
                "repetition_ok": pa.array(df["repetition_ok"].to_numpy(bool)),
                "uncontaminated": pa.array(df["uncontaminated"].to_numpy(bool)),
                "is_canonical": pa.array(is_canon),
                "keep": pa.array(keep),
            }
        )

    out = joined.map_batches(verdict, batch_format="pandas", batch_size=None)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("quality_ok", pa.bool_()),
                ("repetition_ok", pa.bool_()),
                ("uncontaminated", pa.bool_()),
                ("is_canonical", pa.bool_()),
                ("keep", pa.bool_()),
            ]
        ),
    )


DOCS_CURATION_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS arr,
         len(regexp_replace(trim(text), '\\s+', '', 'g')) AS n_chars
  FROM documents WHERE doc_id >= {_DECON_BENCH_MAX}
),
c2 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(2)}) GROUP BY 1, 2),
c3 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(3)}) GROUP BY 1, 2),
c4 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(4)}) GROUP BY 1, 2),
c5 AS (SELECT doc_id, g, COUNT(*) AS c FROM ({_ngram_cte(5)}) GROUP BY 1, 2),
t2 AS (SELECT doc_id, c * len(replace(g, ' ', '')) AS chars FROM c2
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
t3 AS (SELECT doc_id, c * len(replace(g, ' ', '')) AS chars FROM c3
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
t4 AS (SELECT doc_id, c * len(replace(g, ' ', '')) AS chars FROM c4
       QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY c DESC, g) = 1),
d5 AS (SELECT doc_id, SUM((c - 1) * len(replace(g, ' ', ''))) AS chars
       FROM c5 WHERE c > 1 GROUP BY doc_id),
full_base AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS arr
  FROM documents
),
dg AS (SELECT DISTINCT doc_id, g FROM ({_ngram_cte(_DECON_N, 'full_base')})),
bench AS (SELECT DISTINCT g FROM dg WHERE doc_id < {_DECON_BENCH_MAX}),
hits AS (
  SELECT dg.doc_id, COUNT(*) AS n FROM dg JOIN bench USING (g)
  WHERE dg.doc_id >= {_DECON_BENCH_MAX} GROUP BY dg.doc_id
),
f AS (
  SELECT b.doc_id,
    (len(b.arr) >= 10 AND
     (CASE WHEN b.n_chars = 0 THEN 0.0 ELSE
       (len(b.text) - len(regexp_replace(b.text, '[.,;:!?''"()\\[\\]{{}}-]', '', 'g')))::DOUBLE
       / b.n_chars END) < 0.3) AS quality_ok,
    (COALESCE(ROUND(t2.chars::DOUBLE / NULLIF(b.n_chars, 0), 4), 0.0) <= {_REP_THRESH[2]}
     AND COALESCE(ROUND(t3.chars::DOUBLE / NULLIF(b.n_chars, 0), 4), 0.0) <= {_REP_THRESH[3]}
     AND COALESCE(ROUND(t4.chars::DOUBLE / NULLIF(b.n_chars, 0), 4), 0.0) <= {_REP_THRESH[4]}
     AND (CASE WHEN b.n_chars = 0 THEN 0.0
               ELSE ROUND(LEAST(1.0, COALESCE(d5.chars, 0)::DOUBLE / b.n_chars), 4)
          END) <= {_DUP5_THRESH}) AS repetition_ok,
    COALESCE(h.n, 0) = 0 AS uncontaminated,
    b.doc_id = MIN(b.doc_id) OVER (PARTITION BY md5(b.text)) AS is_canonical
  FROM base b
  LEFT JOIN t2 ON b.doc_id = t2.doc_id
  LEFT JOIN t3 ON b.doc_id = t3.doc_id
  LEFT JOIN t4 ON b.doc_id = t4.doc_id
  LEFT JOIN d5 ON b.doc_id = d5.doc_id
  LEFT JOIN hits h ON b.doc_id = h.doc_id
)
SELECT doc_id, quality_ok, repetition_ok, uncontaminated, is_canonical,
       (quality_ok AND repetition_ok AND uncontaminated AND is_canonical) AS keep
FROM f
"""


# ------------------------------------------------------- sequence packing
_SEQ_LEN = 512  # tokens per training sequence
_PACK_BUCKET = 1024  # docs per prefix-sum bucket (level-1 unit)


def docs_pack_sequences(sf_dir: str):
    """GPT-style sequence packing: concatenate every document's token
    stream in doc_id order and chunk the stream into fixed _SEQ_LEN-token
    training sequences; emit one row per (document x sequence) overlap:
    (doc_id, seq_id, tok_start [offset inside the sequence], tok_count).
    Documents straddle sequence boundaries, exactly like production LLM
    pretraining packing; empty docs contribute nothing.

    Distribution: the global token offset of each document is a prefix sum
    over doc_id order — computed in two levels so nothing is ever
    sequential over the corpus:
      1. one map pass reduces each doc to (doc_id, n_tok) — 16-byte rows;
         the narrow counts table is materialized once (the only reuse);
      2. bucket sums (bucket = doc_id // _PACK_BUCKET) fold to the driver
         via mergeable partials; the driver cumsums #buckets scalars (at
         10^10 docs / 1024 ≈ 10^7 buckets — a few hundred MB is the
         documented ceiling; a third level amortizes beyond) and
         broadcasts the exclusive bucket offsets with ray.put;
      3. one hash exchange of the counts table by bucket co-locates each
         bucket's ≤1024 docs; within a partition the per-doc start is
         bucket_offset + within-bucket cumsum, and span rows are emitted
         fully vectorized (np.repeat + segmented arange).
    The text column never crosses an exchange."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        ntok = np.fromiter(
            (len(_tokens(t)) for t in df["text"]), np.int64, len(df)
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_tok": ntok,
                "bucket": df["doc_id"].to_numpy(np.int64) // _PACK_BUCKET,
            }
        )

    cnt = ds.map_batches(counts, batch_format="pandas").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)["n_tok"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)["n_tok"].sum()

    sums = driver_agg(cnt, partial, final).sort_values("bucket")
    max_bucket = int(sums["bucket"].max()) if len(sums) else 0
    offsets = np.zeros(max_bucket + 2, np.int64)
    np.add.at(offsets, sums["bucket"].to_numpy(np.int64) + 1,
              sums["n_tok"].to_numpy(np.int64))
    offsets = np.cumsum(offsets)  # offsets[b] = tokens before bucket b
    off_ref = broadcast(offsets)

    def emit(df: pd.DataFrame) -> pd.DataFrame:
        off = lookup_broadcast(off_ref)
        df = df.sort_values(["bucket", "doc_id"])
        ntok = df["n_tok"].to_numpy(np.int64)
        bucket = df["bucket"].to_numpy(np.int64)
        cum = np.cumsum(ntok) - ntok  # within-partition exclusive cumsum
        # reset the cumsum at each bucket boundary (a partition holds many)
        starts_idx = np.flatnonzero(np.r_[True, bucket[1:] != bucket[:-1]])
        base = np.repeat(cum[starts_idx], np.diff(np.r_[starts_idx, len(cum)]))
        tok_begin = off[bucket] + (cum - base)
        tok_end = tok_begin + ntok
        keep = ntok > 0
        tok_begin, tok_end = tok_begin[keep], tok_end[keep]
        doc_id = df["doc_id"].to_numpy(np.int64)[keep]
        lo = tok_begin // _SEQ_LEN
        hi = (tok_end - 1) // _SEQ_LEN
        reps = (hi - lo + 1).astype(np.int64)
        if not len(reps):
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype="int64"),
                 "seq_id": pd.Series([], dtype="int64"),
                 "tok_start": pd.Series([], dtype="int64"),
                 "tok_count": pd.Series([], dtype="int64")}
            )
        ridx = np.repeat(np.arange(len(reps)), reps)
        intra = np.arange(reps.sum()) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        seq = lo[ridx] + intra
        a = np.maximum(tok_begin[ridx], seq * _SEQ_LEN)
        b = np.minimum(tok_end[ridx], (seq + 1) * _SEQ_LEN)
        return pd.DataFrame(
            {"doc_id": doc_id[ridx], "seq_id": seq,
             "tok_start": a - seq * _SEQ_LEN, "tok_count": b - a}
        )

    out = hash_partition_map(cnt, ["bucket"], emit)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("seq_id", pa.int64()),
                ("tok_start", pa.int64()),
                ("tok_count", pa.int64()),
            ]
        ),
    )


DOCS_PACK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tok
  FROM documents
),
c AS (
  SELECT doc_id, n_tok,
         COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS tok_begin
  FROM t
),
s AS (SELECT doc_id, tok_begin, tok_begin + n_tok AS tok_end FROM c WHERE n_tok > 0),
ex AS (
  SELECT doc_id, tok_begin, tok_end,
         unnest(generate_series(tok_begin // {_SEQ_LEN}, (tok_end - 1) // {_SEQ_LEN}))::BIGINT AS seq_id
  FROM s
)
SELECT doc_id, seq_id,
       (GREATEST(tok_begin, seq_id * {_SEQ_LEN}) - seq_id * {_SEQ_LEN})::BIGINT AS tok_start,
       (LEAST(tok_end, (seq_id + 1) * {_SEQ_LEN})
        - GREATEST(tok_begin, seq_id * {_SEQ_LEN}))::BIGINT AS tok_count
FROM ex
"""


# ------------------------------------------- DSIR-style importance weights
# Data Selection via Importance Resampling (Xie et al. 2023): score each
# document by how much more likely its hashed-ngram bag is under a TARGET
# distribution than under the RAW corpus distribution.
_DSIR_BUCKETS = 4096
_DSIR_TARGET_LANG = "en"
_DSIR_SCALE = 1_000_000  # per-bucket log-ratios fixed to 1e-6 integers


def _dsir_buckets(text: str) -> np.ndarray:
    """Hashed feature-occurrence buckets of a doc: unigrams + bigrams of the
    shared whitespace tokens, blake2b-hashed mod _DSIR_BUCKETS."""
    import hashlib

    toks = _tokens(text)
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(f.encode(), digest_size=8).digest(), "big"
            )
            % _DSIR_BUCKETS
            for f in feats
        ),
        np.int64,
        len(feats),
    )


def docs_importance_weights(sf_dir: str):
    """Per-document DSIR importance weight: with Laplace-smoothed hashed-
    ngram distributions p (docs with lang == 'en', the target) and q (whole
    corpus), weight = sum over the doc's feature occurrences of
    log(p_bucket) - log(q_bucket).  The per-bucket log-ratio is fixed to an
    int64 of 1e-6 units BEFORE the per-doc sum, so the sum is exact integer
    arithmetic — order-independent across block boundaries and bit-equal to
    the single-process oracle (a float sum would differ in the last ulp
    between numpy pairwise and sequential summation).

    Scale: two streaming passes over the corpus.  Pass 1 folds per-block
    (bucket, count_all, count_target) partials — at most _DSIR_BUCKETS rows
    per block — to the driver (mergeable sketch, no shuffle).  The driver
    builds the 4096-entry log-ratio table and broadcasts it once; pass 2
    scores each doc independently.  Feature hashing is the same per-token
    blake2b work as the MinHash stage — CPU-bound map, no exchange at all."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ref = _dsir_ratio_ref(ds)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rt = lookup_broadcast(ref)
        n_feat = np.empty(len(df), np.int64)
        w_int = np.empty(len(df), np.int64)
        for i, text in enumerate(df["text"]):
            b = _dsir_buckets(text)
            n_feat[i] = len(b)
            w_int[i] = int(rt[b].sum())
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_feat": n_feat,
                "log_weight": round_col(w_int / _DSIR_SCALE, 4),
            }
        )

    out = ds.map_batches(score, batch_format="pandas")
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_feat", pa.int64()),
                ("log_weight", pa.float64()),
            ]
        ),
    )


def _dsir_ratio_ref(ds):
    """Pass 1 of the DSIR pipelines, shared by the weight and resampling
    ops: fold per-block (bucket, count_all, count_target) partials to the
    driver (mergeable sketch, ≤_DSIR_BUCKETS rows per block, no shuffle),
    build the int-fixed log-ratio table, broadcast it once."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c_all = np.zeros(_DSIR_BUCKETS, np.int64)
        c_tgt = np.zeros(_DSIR_BUCKETS, np.int64)
        for text, lang in zip(df["text"], df["lang"]):
            b = _dsir_buckets(text)
            np.add.at(c_all, b, 1)
            if lang == _DSIR_TARGET_LANG:
                np.add.at(c_tgt, b, 1)
        nz = np.flatnonzero(c_all)
        return pd.DataFrame(
            {"bucket": nz, "c_all": c_all[nz], "c_tgt": c_tgt[nz]}
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)[["c_all", "c_tgt"]].sum()

    counts = driver_agg(ds, partial, final)
    c_all = np.zeros(_DSIR_BUCKETS, np.int64)
    c_tgt = np.zeros(_DSIR_BUCKETS, np.int64)
    c_all[counts["bucket"].to_numpy(np.int64)] = counts["c_all"]
    c_tgt[counts["bucket"].to_numpy(np.int64)] = counts["c_tgt"]
    return broadcast(dsir_ratio_table(c_all, c_tgt))


def dsir_ratio_table(c_all: np.ndarray, c_tgt: np.ndarray) -> np.ndarray:
    """Laplace-smoothed per-bucket log(p_target/q_all), fixed to int64
    units of 1/_DSIR_SCALE with half-away-from-zero rounding.  Built with
    SCALAR math.log on the driver (4096 entries — negligible): numpy's
    SIMD log can differ from libm's scalar log by an ulp, and an ulp at a
    half-integer boundary would flip an entry vs the independent oracle's
    math.log table, breaking the exact-integer-sum guarantee downstream."""
    import math

    tgt_tot = float(c_tgt.sum() + _DSIR_BUCKETS)
    all_tot = float(c_all.sum() + _DSIR_BUCKETS)
    out = np.empty(_DSIR_BUCKETS, np.int64)
    for k in range(_DSIR_BUCKETS):
        r = (
            math.log((int(c_tgt[k]) + 1) / tgt_tot)
            - math.log((int(c_all[k]) + 1) / all_tot)
        ) * _DSIR_SCALE
        out[k] = int(math.copysign(math.floor(abs(r) + 0.5), r))
    return out


# --------------------------------------------- DSIR importance RESAMPLING
_DSIR_SAMPLE_K = 100


def _dsir_gumbel_int(doc_id: int) -> int:
    """Deterministic Gumbel noise for one doc in 1e-6 int units: u is the
    top 53 bits of md5(decimal doc_id) mapped into (0,1) (the +0.5 keeps it
    strictly interior, so neither log can hit 0), g = -log(-log(u)).
    Scalar math.log per the dsir_ratio_table ulp policy — an ulp flip at a
    rounding boundary would reorder the race vs the oracle's table."""
    import math

    h = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "big") >> 11
    u = (h + 0.5) / float(1 << 53)
    g = -math.log(-math.log(u)) * _DSIR_SCALE
    return int(math.copysign(math.floor(abs(g) + 0.5), g))


def docs_importance_sample(sf_dir: str):
    """The RESAMPLING step of DSIR (Xie et al. 2023 §2: select examples by
    sampling without replacement proportional to exp(importance weight)):
    Gumbel-top-k — add per-doc deterministic Gumbel noise to the log-weight
    and keep the _DSIR_SAMPLE_K largest keys, which is exactly sampling
    k docs without replacement from softmax(log_weight) (Vieira 2014; Kool,
    van Hoof & Welling 2019, "Stochastic beams and where to find them").
    The 'randomness' is a hash of doc_id, so reruns and the independent
    oracle pick the identical sample.

    Scale shape: pass 1 is the shared _dsir_ratio_ref driver fold (no
    shuffle); pass 2 scores each doc and keeps only its block's top-k, the
    driver merges O(k·blocks) candidate rows — the per-partition-heads
    top-k posture, NO global sort, text never shuffled.  Keys are exact
    int64 (1e-6 units) so the global order is split- and platform-exact."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text", "lang"])
    ref = _dsir_ratio_ref(ds)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["key_i", "doc_id"], ascending=[False, True], kind="stable"
        )
        return df.head(_DSIR_SAMPLE_K)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        rt = lookup_broadcast(ref)
        w_int = np.empty(len(df), np.int64)
        key_i = np.empty(len(df), np.int64)
        for i, (doc_id, text) in enumerate(zip(df["doc_id"], df["text"])):
            b = _dsir_buckets(text)
            w = int(rt[b].sum())
            w_int[i] = w
            key_i[i] = w + _dsir_gumbel_int(int(doc_id))
        return topk(
            pd.DataFrame(
                {
                    "doc_id": df["doc_id"].to_numpy(np.int64),
                    "w_int": w_int,
                    "key_i": key_i,
                }
            )
        )

    out = driver_agg(ds, score, topk)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].astype("int64"), pa.int64()),
            "log_weight": round_col(out["w_int"].astype("int64") / _DSIR_SCALE, 4),
            "key": pa.array(
                out["key_i"].astype("int64") / _DSIR_SCALE, pa.float64()
            ),
        }
    )


# --------------------------------------- CCNet-style LM quality bucketing
# CCNet (Wenzek et al. 2020) buckets documents into head/middle/tail thirds
# by the perplexity of a language model trained on a clean target corpus.
# The analogue here: a hashed char-trigram model trained on the lang='en'
# documents, per-doc average negative log-likelihood, and third-cuts taken
# from a mergeable fixed-width histogram sketch (bin-granular, like the
# quantile op — deterministic without a global sort).
_LM_BUCKETS = 65536
_LM_SCALE = 1_000_000  # per-trigram NLL fixed to 1e-6-nat int64 units
_LM_BIN = 10_000  # histogram bin width: 0.01 nats in the same units


def _lm_trigrams(text: str) -> np.ndarray:
    """Hashed char-trigram occurrence buckets over the whitespace-normalized
    text (tokens joined by single spaces — the shared contract)."""
    import hashlib

    norm = " ".join(_tokens(text))
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.blake2b(
                    norm[i : i + 3].encode(), digest_size=8
                ).digest(),
                "big",
            )
            % _LM_BUCKETS
            for i in range(max(0, len(norm) - 2))
        ),
        np.int64,
        max(0, len(norm) - 2),
    )


def lm_nll_table(counts: np.ndarray) -> np.ndarray:
    """Laplace-smoothed per-bucket negative log-likelihood
    -log((c+1)/(total+B)), fixed to int64 units of 1/_LM_SCALE nats.
    Scalar math.log for the same ulp-at-the-rounding-boundary reason as
    dsir_ratio_table (the oracle builds its table with math.log)."""
    import math

    total = float(counts.sum() + _LM_BUCKETS)
    log_total = math.log(total)
    out = np.empty(_LM_BUCKETS, np.int64)
    for k in range(_LM_BUCKETS):
        out[k] = int(
            math.floor((log_total - math.log(int(counts[k]) + 1)) * _LM_SCALE + 0.5)
        )
    return out


def docs_lm_quality(sf_dir: str):
    """Per-document LM quality: avg char-trigram NLL under the en-trained
    model, plus the CCNet head/middle/tail bucket by corpus thirds.

    Determinism: the per-trigram NLL is fixed to integer 1e-6-nat units
    before any per-doc sum, so scores are exact integer arithmetic; the
    third-cuts are bin indexes (0.01-nat bins) chosen from the merged
    histogram, so bucket labels are bin-granular — documents sharing a bin
    share a bucket (documented sketch semantics, mirrored by the oracle).

    Scale: pass 1 streams the target slice into a 64k-bucket count sketch
    (mergeable partials -> driver -> broadcast NLL table, ~0.5 MB); pass 2
    streams the corpus once, emitting a NARROW (doc_id, nll_int, n_tri,
    bin) table that is materialized (24 B/row); the histogram fold and the
    final labeling pass both run over that narrow table — the text column
    is read exactly twice and never shuffled.  Docs with no trigram score
    nll=0 (bin 0) and land in whatever bucket the cuts give bin 0."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text", "lang"])

    def train(df: pd.DataFrame) -> pd.DataFrame:
        c = np.zeros(_LM_BUCKETS, np.int64)
        for text, lang in zip(df["text"], df["lang"]):
            if lang == _DSIR_TARGET_LANG:
                b = _lm_trigrams(text)
                np.add.at(c, b, 1)
        nz = np.flatnonzero(c)
        return pd.DataFrame({"bucket": nz, "c": c[nz]})

    def train_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bucket", as_index=False)["c"].sum()

    tr = driver_agg(ds, train, train_final)
    counts = np.zeros(_LM_BUCKETS, np.int64)
    counts[tr["bucket"].to_numpy(np.int64)] = tr["c"]
    ref = broadcast(lm_nll_table(counts))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        nt = lookup_broadcast(ref)
        n = len(df)
        nll_int = np.zeros(n, np.int64)
        n_tri = np.zeros(n, np.int64)
        for i, text in enumerate(df["text"]):
            b = _lm_trigrams(text)
            n_tri[i] = len(b)
            if len(b):
                nll_int[i] = int(nt[b].sum()) // len(b)  # avg, floor to units
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "nll_int": nll_int,
                "n_tri": n_tri,
                "bin": nll_int // _LM_BIN,
            }
        )

    scored = ds.map_batches(score, batch_format="pandas").materialize()

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bin", as_index=False).size().rename(columns={"size": "c"})

    def hist_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("bin", as_index=False)["c"].sum()

    h = driver_agg(scored, hist, hist_final).sort_values("bin")
    cum = h["c"].cumsum().to_numpy()
    n_docs = int(cum[-1])
    bins = h["bin"].to_numpy()
    import math

    cut1 = bins[int(np.searchsorted(cum, math.ceil(n_docs / 3)))]
    cut2 = bins[int(np.searchsorted(cum, math.ceil(2 * n_docs / 3)))]

    def label(df: pd.DataFrame) -> pd.DataFrame:
        b = df["bin"].to_numpy(np.int64)
        bucket = np.where(b <= cut1, "head", np.where(b <= cut2, "middle", "tail"))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "nll": round_col(df["nll_int"].to_numpy(np.int64) / _LM_SCALE, 4),
                "ppl_bucket": bucket,
            }
        )

    out = scored.map_batches(label, batch_format="pandas")
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("nll", pa.float64()),
                ("ppl_bucket", pa.string()),
            ]
        ),
    )


# ------------------------------------------ cross-document substring dedup
# Exact-substring duplication across documents (the signal behind Lee et
# al. 2022 "Deduplicating Training Data Makes Language Models Better"):
# a W-token window occurring verbatim in >= 2 documents marks both.  The
# paper's suffix array is replaced by the shuffle-native equivalent —
# distinct windows exchanged once, grouped by window, document frequency
# folded back per doc.  W = 8 here (the paper uses 50 BPE tokens; the
# fixture docs are ~50-120 words, so 8 keeps the signal observable at test
# scale — one module constant to change).
_SUBSTR_W = 8
_SUBSTR_KEEP_MAX = 0.5  # keep docs with <= 50% of windows shared


def docs_substring_dups(sf_dir: str):
    """Per-document cross-corpus substring duplication: n_windows (DISTINCT
    W-token windows in the doc), n_shared (those appearing in >= 2 docs),
    shared_frac, and the keep flag.  Docs with fewer than W tokens have no
    windows and are absent (pinned contract, mirrored by the oracle).

    Scale: the only wide exchange carries one row per DISTINCT (window,
    doc) pair — O(total tokens) rows, the same volume class as the Jaccard
    inverted index.  Windows travel as strings so equality is exactly the
    SQL oracle's (a 64-bit window hash is the documented 8x-narrower
    optimization, at the cost of birthday collisions the oracle can't
    mirror).  The per-window partition emits per-doc PARTIALS (doc_id,
    n, s), so the second exchange by doc_id moves at most #docs x
    #partitions tiny rows."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    W = _SUBSTR_W

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        out_doc: list[int] = []
        out_g: list[str] = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            toks = _tokens(text)
            if len(toks) < W:
                continue
            seen = {" ".join(toks[i : i + W]) for i in range(len(toks) - W + 1)}
            out_doc.extend([int(doc_id)] * len(seen))
            out_g.extend(seen)
        return pd.DataFrame({"doc_id": pd.Series(out_doc, dtype="int64"),
                             "g": pd.Series(out_g, dtype="object")})

    grams = ds.map_batches(windows, batch_format="pandas")

    def per_gram(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby("g")["doc_id"].transform("size")
        shared = (d >= 2).astype(np.int64)
        g = pd.DataFrame({"doc_id": df["doc_id"], "s": shared})
        agg = g.groupby("doc_id", as_index=False).agg(
            n=("s", "size"), s=("s", "sum")
        )
        return agg

    partials = hash_partition_map(grams, ["g"], per_gram)

    def by_doc(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("doc_id", as_index=False)[["n", "s"]].sum()

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby("doc_id", as_index=False)[["n", "s"]].sum()
        frac = round_col(
            df["s"].to_numpy(np.float64) / df["n"].to_numpy(np.float64), 4
        )
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].to_numpy(np.int64),
                "n_windows": df["n"].to_numpy(np.int64),
                "n_shared": df["s"].to_numpy(np.int64),
                "shared_frac": frac,
                "keep": frac <= _SUBSTR_KEEP_MAX,
            }
        )

    out = shuffle_agg(partials, ["doc_id"], by_doc, finish)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_windows", pa.int64()),
                ("n_shared", pa.int64()),
                ("shared_frac", pa.float64()),
                ("keep", pa.bool_()),
            ]
        ),
    )


DOCS_SUBSTRING_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS arr
  FROM documents
),
dg AS (SELECT DISTINCT doc_id, g FROM ({_ngram_cte(_SUBSTR_W)})),
dfreq AS (SELECT g, COUNT(*) AS d FROM dg GROUP BY g),
per AS (
  SELECT dg.doc_id, COUNT(*)::BIGINT AS n_windows,
         SUM(CASE WHEN dfreq.d >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_shared
  FROM dg JOIN dfreq USING (g) GROUP BY dg.doc_id
)
SELECT doc_id, n_windows, n_shared,
       ROUND(n_shared::DOUBLE / n_windows, 4) AS shared_frac,
       ROUND(n_shared::DOUBLE / n_windows, 4) <= {_SUBSTR_KEEP_MAX} AS keep
FROM per
"""


# ------------------------------------------------ RAG-style chunking
_CHUNK_LEN = 128  # tokens per retrieval chunk
_CHUNK_STRIDE = 96  # stride (=> 32-token overlap)


def docs_chunk_overlap(sf_dir: str):
    """Overlapping retrieval chunks per document: windows of _CHUNK_LEN
    tokens every _CHUNK_STRIDE (the standard RAG indexing slice), one row
    per (doc_id, chunk_id) with token offsets.  Chunk k starts at
    k*stride; the last chunk is the first one whose start + len reaches
    the end (it may be short).  Empty docs emit nothing.  Purely per-doc —
    a single map pass, no exchange at any scale."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    C, S = _CHUNK_LEN, _CHUNK_STRIDE

    def chunks(df: pd.DataFrame) -> pd.DataFrame:
        ids, ks, starts, lens = [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            n = len(_tokens(text))
            if n == 0:
                continue
            kmax = max(0, -(-(n - C) // S))  # ceil((n-C)/S), 0 when n <= C
            for k in range(kmax + 1):
                ids.append(int(doc_id))
                ks.append(k)
                starts.append(k * S)
                lens.append(min(C, n - k * S))
        return pd.DataFrame(
            {
                "doc_id": pd.Series(ids, dtype="int64"),
                "chunk_id": pd.Series(ks, dtype="int64"),
                "tok_start": pd.Series(starts, dtype="int64"),
                "tok_len": pd.Series(lens, dtype="int64"),
            }
        )

    out = ds.map_batches(chunks, batch_format="pandas")
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("chunk_id", pa.int64()),
                ("tok_start", pa.int64()),
                ("tok_len", pa.int64()),
            ]
        ),
    )


DOCS_CHUNK_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END::BIGINT AS n_tok
  FROM documents
),
ex AS (
  SELECT doc_id, n_tok,
         unnest(generate_series(0,
           CAST(ceil(GREATEST(n_tok - {_CHUNK_LEN}, 0)::DOUBLE
                     / {_CHUNK_STRIDE}) AS BIGINT)))::BIGINT AS chunk_id
  FROM t WHERE n_tok > 0
)
SELECT doc_id, chunk_id,
       (chunk_id * {_CHUNK_STRIDE})::BIGINT AS tok_start,
       LEAST({_CHUNK_LEN}, n_tok - chunk_id * {_CHUNK_STRIDE})::BIGINT AS tok_len
FROM ex
"""


# ----------------------------------------------------------- BM25 retrieval
_BM25_TERMS = ("dup", "spark", "window")  # rare + two mid-frequency terms
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


def docs_bm25_topk(sf_dir: str):
    """Okapi BM25 top-k retrieval for a fixed query (Robertson & Zaragoza
    2009; k1=1.2, b=0.75, Lucene idf = ln(1 + (N-df+0.5)/(df+0.5))) — the
    sparse-retrieval sibling of emb_ann_topk.

    Scale shape: ONE corpus scan builds a narrow per-doc feature row
    (dl + per-query-term tf — the query is a constant, so tf is a fixed
    set of columns, not a term exchange); the materialized feature table
    feeds (a) an integer combiner->driver reduce for N/Σdl/df — exact,
    order-independent — and (b) the scoring map.  Scores are fixed to
    integer millionths per term BEFORE the per-doc sum (the repo's
    int-fixed pattern), so accumulation order can never flip a digit vs
    the SQL oracle, and the global top-k rides the integer sum.  Only the
    final sort/limit exchanges anything.

    For AD-HOC queries at the 100 TB design point the same shape holds
    (terms broadcast, df from a precomputed term-stats table instead of
    the in-flight reduce)."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata — no scan

    terms = _BM25_TERMS

    def feats(t: pa.Table) -> pa.Table:
        ids, dls = [], []
        tfs: list[list[int]] = [[] for _ in terms]
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            ws = [w.lower() for w in _tokens(text)]
            c = collections.Counter(ws)
            ids.append(did)
            dls.append(len(ws))
            for k, term in enumerate(terms):
                tfs[k].append(c.get(term, 0))
        cols = {
            "doc_id": pa.array(ids, pa.int64()),
            "dl": pa.array(dls, pa.int64()),
        }
        for k in range(len(terms)):
            cols[f"tf{k}"] = pa.array(tfs[k], pa.int64())
        return pa.table(cols)

    # materialize: the narrow feature table feeds both the stats reduce
    # and the scoring pass (unmaterialized = double corpus scan)
    fds = ds.map_batches(feats, batch_format="pyarrow").materialize()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        row = {"sumdl": int(df["dl"].sum())}
        for k in range(len(terms)):
            row[f"df{k}"] = int((df[f"tf{k}"] > 0).sum())
        return pd.DataFrame([row])

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([df.sum(numeric_only=True).astype("int64")])

    stats = driver_agg(fds, partial, final).iloc[0]
    avgdl = float(stats["sumdl"]) / float(n_docs)
    # idf per query term, computed ONCE (ln matches DuckDB at the
    # millionth-fixing granularity — the established ulp contract)
    idf = np.array(
        [
            np.log(
                1.0 + (float(n_docs) - float(stats[f"df{k}"]) + 0.5)
                / (float(stats[f"df{k}"]) + 0.5)
            )
            for k in range(len(terms))
        ]
    )
    idf_ref = broadcast((idf, avgdl))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        idfs, ad = lookup_broadcast(idf_ref)
        dl = df["dl"].to_numpy(np.float64)
        denom_dl = _BM25_K1 * (
            (1.0 - _BM25_B) + (_BM25_B * dl) / ad
        )
        sci = np.zeros(len(df), dtype=np.int64)
        any_tf = np.zeros(len(df), dtype=bool)
        for k in range(len(idfs)):
            tf = df[f"tf{k}"].to_numpy(np.float64)
            contrib = idfs[k] * tf * (_BM25_K1 + 1.0) / (tf + denom_dl)
            ci = np.floor(contrib * 1000000.0 + 0.5).astype(np.int64)
            mask = tf > 0
            sci += np.where(mask, ci, 0)
            any_tf |= mask
        out = pd.DataFrame({"doc_id": df["doc_id"], "sci": sci})
        return out[any_tf]

    scored = fds.map_batches(score, batch_format="pandas")
    top = scored.sort(["sci", "doc_id"], descending=[True, False]).limit(
        _BM25_TOPK
    )

    def fin(t: pa.Table) -> pa.Table:
        sci = np.asarray(t["sci"].to_pylist(), dtype=np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "bm25": pa.array(sci / 1000000.0, pa.float64()),
            }
        )

    return collect_arrow(
        top.map_batches(fin, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64()), ("bm25", pa.float64())]),
    )


_BM25_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM25_TERMS)
DOCS_BM25_SQL = f"""
WITH tok AS (
  SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
),
dl0 AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
alldl AS (
  SELECT d.doc_id, COALESCE(dl0.dl, 0) AS dl
  FROM documents d LEFT JOIN dl0 USING (doc_id)
),
stats AS (
  SELECT COUNT(*)::DOUBLE AS n, SUM(dl)::DOUBLE / COUNT(*) AS avgdl
  FROM alldl
),
tf AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf FROM tok
  WHERE w IN ({_BM25_TERMS_SQL}) GROUP BY 1, 2
),
df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
contrib AS (
  SELECT tf.doc_id,
         CAST(ROUND(
           ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_BM25_K1} + 1.0)
           / (tf.tf + {_BM25_K1} * ((1.0 - {_BM25_B})
              + ({_BM25_B} * alldl.dl) / stats.avgdl))
           * 1000000.0) AS BIGINT) AS ci
  FROM tf JOIN df USING (term) JOIN alldl USING (doc_id) CROSS JOIN stats
),
s AS (SELECT doc_id, SUM(ci) AS sci FROM contrib GROUP BY doc_id)
SELECT doc_id, sci / 1000000.0 AS bm25 FROM s
QUALIFY row_number() OVER (ORDER BY sci DESC, doc_id) <= {_BM25_TOPK}
"""


# ----------------------------------------------- BPE tokenizer-merge training
# Byte-pair-encoding merge learning (Sennrich et al. 2016, "Neural Machine
# Translation of Rare Words with Subword Units", algorithm 1): iteratively
# merge the most frequent adjacent symbol pair.  The standard efficiency
# trick makes this tractable at corpus scale: merges operate on the DISTINCT
# WORD table (word, count), never the corpus — one streaming count pass over
# the documents, then K iterations over a table whose size is the
# vocabulary, orders of magnitude smaller than the input.
_BPE_NUM_MERGES = 12
#: at or below this many corpus documents the word table provably fits the
#: driver (vocab ≤ tokens ≤ docs × doc-length) and the merge loop runs
#: locally on the collected counts; above it — the 10^10-doc design point,
#: where a web vocabulary is 10^8+ words — the word table stays a Dataset
#: and each iteration is a mergeable pair-count fold (rows ≤ distinct
#: adjacent pairs, far below vocab) + one broadcast merge applied in
#: map_batches.  Both regimes are exact-integer and bit-identical (forced
#: and compared in tests).
_BPE_DRIVER_MAX_DOCS = 2_000_000


def _bpe_pair_counts(syms_list, counts) -> collections.Counter:
    """Weighted adjacent-pair counts over (symbol-tuple, word-count) rows.
    Overlapping occurrences all count, per the reference algorithm
    (get_stats in the paper's appendix counts every zip(word, word[1:])
    position)."""
    pairs: collections.Counter = collections.Counter()
    for syms, c in zip(syms_list, counts):
        for i in range(len(syms) - 1):
            pairs[(syms[i], syms[i + 1])] += int(c)
    return pairs


def _bpe_apply(syms: tuple, left: str, right: str) -> tuple:
    """Merge every (left, right) adjacency left-to-right, non-overlapping —
    'aaaa' under merge (a,a) becomes ('aa','aa'), matching the reference
    algorithm's single-pass replace."""
    out = []
    i, n = 0, len(syms)
    merged = left + right
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _bpe_best(pairs: collections.Counter):
    """Deterministic argmax: highest count, ties broken by lexicographically
    smallest (left, right) — order-independent regardless of how the counts
    were accumulated."""
    if not pairs:
        return None
    return min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))


def docs_bpe_train(sf_dir: str):
    """Learn the first ``_BPE_NUM_MERGES`` BPE merges over the corpus:
    symbols start as the characters of each whitespace token (merges never
    cross word boundaries), each rank merges the globally most frequent
    adjacent pair.  Returns (rank, left, right, pair_count) — fewer rows if
    the pair supply is exhausted first.

    Scale: the corpus is read EXACTLY ONCE (per-block word Counters ->
    mergeable (word, count) partials).  Below _BPE_DRIVER_MAX_DOCS the word
    table folds to the driver (driver_agg) and the merge loop runs locally.
    Above it, the word table becomes a hash-shuffled Dataset of
    (symbols, count) rows and each iteration costs one mergeable pair-count
    fold to the driver plus one broadcast merge rewrite — K passes over the
    vocabulary, zero further passes over the corpus, no shuffle after the
    initial word-count exchange.  All arithmetic is integer counts with a
    total-order tie-break, so block boundaries cannot change the result.
    Oracle: independent pure-Python implementation
    (oracle_ext.oracle_docs_bpe_train), materialized to parquet."""
    import pyarrow.parquet as _pq

    ds = read_parquet(sf_dir, "documents", columns=["text"])
    n_docs = _pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def word_partial(df: pd.DataFrame) -> pd.DataFrame:
        c: collections.Counter = collections.Counter()
        for text in df["text"]:
            c.update(_tokens(text))
        return pd.DataFrame(
            {"word": list(c.keys()), "c": np.fromiter(c.values(), np.int64, len(c))}
        )

    merges: list[tuple[int, str, str, int]] = []

    if n_docs <= _BPE_DRIVER_MAX_DOCS:
        wc = driver_agg(
            ds,
            word_partial,
            lambda df: df.groupby("word", as_index=False)["c"].sum(),
        )
        table = {
            tuple(w): int(c) for w, c in zip(wc["word"], wc["c"])
        }
        for rank in range(1, _BPE_NUM_MERGES + 1):
            best = _bpe_best(_bpe_pair_counts(table.keys(), table.values()))
            if best is None:
                break
            (left, right), cnt = best
            merges.append((rank, left, right, cnt))
            table = {
                _bpe_apply(syms, left, right): c for syms, c in table.items()
            }
    else:
        words = shuffle_agg(
            ds.map_batches(word_partial, batch_format="pandas"),
            ["word"],
            lambda df: df.groupby("word", as_index=False)["c"].sum(),
            lambda df: df.groupby("word", as_index=False)["c"].sum(),
        ).materialize()

        def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
            pc = _bpe_pair_counts(
                [tuple(w.split("\n")) for w in df["word"]], df["c"]
            )
            return pd.DataFrame(
                {
                    "left": [p[0] for p in pc],
                    "right": [p[1] for p in pc],
                    "c": np.fromiter(pc.values(), np.int64, len(pc)),
                }
            )

        # symbols ride as a newline-joined string column: _tokens splits
        # on \s+, so a token can contain NO whitespace character — newline
        # is the one separator class guaranteed absent from any symbol
        # (a NUL, by contrast, is legal inside a parquet string token)
        def to_syms(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"word": ["\n".join(w) for w in df["word"]], "c": df["c"]}
            )

        words = words.map_batches(to_syms, batch_format="pandas").materialize()
        for rank in range(1, _BPE_NUM_MERGES + 1):
            pc = driver_agg(
                words,
                pair_partial,
                lambda df: df.groupby(["left", "right"], as_index=False)["c"].sum(),
            )
            if len(pc) == 0:
                break
            pairs = collections.Counter(
                {
                    (l, r): int(c)
                    for l, r, c in zip(pc["left"], pc["right"], pc["c"])
                }
            )
            (left, right), cnt = _bpe_best(pairs)
            merges.append((rank, left, right, cnt))
            ref = broadcast((left, right))

            def apply_merge(df: pd.DataFrame) -> pd.DataFrame:
                lft, rgt = lookup_broadcast(ref)
                return pd.DataFrame(
                    {
                        "word": [
                            "\n".join(
                                _bpe_apply(tuple(w.split("\n")), lft, rgt)
                            )
                            for w in df["word"]
                        ],
                        "c": df["c"],
                    }
                )

            # materialize per iteration or each driver_agg re-executes the
            # whole merge lineage from the original word table
            words = words.map_batches(
                apply_merge, batch_format="pandas"
            ).materialize()

    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


# ----------------------------------------------------- inverted-index build
_IDX_MIN_DF = 10  # emit postings only for terms in at least this many docs
_IDX_POSTINGS = 5  # top docs kept per term, by (tf desc, doc_id asc)


def docs_inverted_index(sf_dir: str):
    """Search-index construction (the IR artifact BM25/TF-IDF presuppose):
    for every term with document frequency ≥ _IDX_MIN_DF, its df and a
    postings head — the top-_IDX_POSTINGS documents by (tf desc, doc_id),
    serialized 'doc_id:tf,doc_id:tf,…'.  Tokens are lowercased whitespace
    words (the bm25/tfidf contract).

    Scale shape: one corpus scan emits (doc_id, term, tf) rows — a document
    is one row, so tf needs no exchange — then ONE hash exchange by term
    co-locates each term's postings; df is the local row count and the
    postings head a vectorized sort + groupby-head inside the partition.
    The full index (all postings, partitioned by term hash) would be
    written per-partition from exactly this exchange; the bounded head
    keeps the oracle compare exact.  SQL mirror: window-ranked
    string_agg."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def term_rows(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for did, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for term, c in collections.Counter(
                w.lower() for w in _tokens(text)
            ).items():
                ids.append(did)
                terms.append(term)
                tfs.append(c)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    def per_term(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"term": [], "df": [], "postings": []}).astype(
                {"df": "int64"}
            )
        counts = df.groupby("term", as_index=False).size().rename(
            columns={"size": "df"}
        )
        counts = counts[counts["df"] >= _IDX_MIN_DF]
        s = df.sort_values(
            ["term", "tf", "doc_id"], ascending=[True, False, True]
        )
        head = s.groupby("term").head(_IDX_POSTINGS)
        post = (
            head.assign(
                s=head["doc_id"].astype(str) + ":" + head["tf"].astype(str)
            )
            .groupby("term", as_index=False)["s"]
            .agg(",".join)
            .rename(columns={"s": "postings"})
        )
        return counts.merge(post, on="term", how="inner")

    out = hash_partition_map(
        ds.map_batches(term_rows, batch_format="pyarrow"), ["term"], per_term
    )
    return collect_arrow(
        out,
        pa.schema(
            [("term", pa.string()), ("df", pa.int64()), ("postings", pa.string())]
        ),
    )


DOCS_INVERTED_SQL = f"""
WITH tok AS (
  SELECT doc_id, lower(unnest(regexp_split_to_array(trim(text), '\\s+'))) AS w
  FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT doc_id, w AS term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
agg AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
  HAVING COUNT(*) >= {_IDX_MIN_DF}
),
ranked AS (
  SELECT term, doc_id, tf,
         row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rn
  FROM tf
),
p AS (
  SELECT term,
         string_agg(doc_id || ':' || tf, ',' ORDER BY tf DESC, doc_id) AS postings
  FROM ranked WHERE rn <= {_IDX_POSTINGS} GROUP BY term
)
SELECT agg.term, agg.df, p.postings FROM agg JOIN p USING (term)
"""


def docs_bpe_encode(sf_dir: str):
    """Apply the learned BPE merges to the corpus (Sennrich et al. 2016
    apply_bpe: each word starts as its characters, the learned operations
    apply IN LEARNED ORDER, each as one left-to-right non-overlapping
    rewrite — exactly the evolution the training loop performed).  Returns
    per doc (doc_id, n_words, n_subwords, head_subwords) where
    head_subwords is the first 8 subwords space-joined (subwords contain no
    whitespace, so the join is unambiguous).

    Scale: training touches the corpus once (docs_bpe_train's contract);
    the ~K learned merges broadcast once via ray.put, and the encode pass
    is a single map_batches with ZERO exchanges.  Each batch encodes its
    DISTINCT words once (word-level memoization — the standard apply_bpe
    cache; web text is Zipf so distinct words ≪ tokens).  Oracle:
    independent pure-Python learner + encoder
    (oracle_ext.oracle_docs_bpe_encode), materialized to parquet."""
    merges_tbl = docs_bpe_train(sf_dir)
    merges = list(
        zip(merges_tbl["left"].to_pylist(), merges_tbl["right"].to_pylist())
    )
    ref = broadcast(merges)

    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "text"])

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        ops = lookup_broadcast(ref)
        cache: dict[str, tuple] = {}

        def enc(word: str) -> tuple:
            syms = cache.get(word)
            if syms is None:
                syms = tuple(word)
                for left, right in ops:
                    if len(syms) > 1:
                        syms = _bpe_apply(syms, left, right)
                cache[word] = syms
            return syms

        n_words = np.zeros(len(df), dtype=np.int64)
        n_subwords = np.zeros(len(df), dtype=np.int64)
        heads: list[str] = []
        for i, text in enumerate(df["text"]):
            words = _tokens(text)
            n_words[i] = len(words)
            head: list[str] = []
            total = 0
            for w in words:
                s = enc(w)
                total += len(s)
                if len(head) < 8:
                    head.extend(s[: 8 - len(head)])
            n_subwords[i] = total
            heads.append(" ".join(head))
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].values,
                "n_words": n_words,
                "n_subwords": n_subwords,
                "head_subwords": heads,
            }
        )

    return collect_arrow(
        ds.map_batches(encode, batch_format="pandas"),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("n_words", pa.int64()),
                ("n_subwords", pa.int64()),
                ("head_subwords", pa.string()),
            ]
        ),
    )


# ------------------------------------------------ deterministic split assign
# train/val/test thresholds on the first 4 hex digits of md5(doc_id): 16-bit
# space, 0xcccd/0x10000 = 80.0008%, 0xe667/0x10000 = 90.0009% — the standard
# hash-bucket split (stable across runs, engines, and cluster layouts, and
# membership is decidable per row with zero coordination, unlike RANDOM() or
# a global row_number() cut).
_SPLIT_TRAIN_LT = "cccd"
_SPLIT_VAL_LT = "e667"


def docs_split_assign(sf_dir: str):
    """Deterministic train/val/test split + per (source, split) composition
    rollup — the bookkeeping a reproducible pretraining-data build needs
    before writing split-partitioned output.  Split membership is a pure
    function of md5(doc_id) (hex-string thresholds; lowercase hex compares
    lexicographically = numerically at fixed width), so every row routes
    itself inside one map pass: ZERO exchanges, combiner + driver reduce
    over (source × split ≤ 3·|sources|) partial rows per block."""
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def assign(t: pa.Table) -> pa.Table:
        h4 = [
            hashlib.md5(str(i).encode()).hexdigest()[:4]
            for i in t["doc_id"].to_pylist()
        ]
        split = [
            "train" if h < _SPLIT_TRAIN_LT else ("val" if h < _SPLIT_VAL_LT else "test")
            for h in h4
        ]
        return pa.table(
            {
                "source": t["source"],
                "split": pa.array(split, pa.string()),
                "n_chars": t["n_chars"],
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "split"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["source", "split"], as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum")
        )

    return driver_agg(ds.map_batches(assign, batch_format="pyarrow"), partial, final)


DOCS_SPLIT_SQL = f"""
WITH assigned AS (
  SELECT source, n_chars,
         CASE WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '{_SPLIT_TRAIN_LT}'
                THEN 'train'
              WHEN substr(md5(doc_id::VARCHAR), 1, 4) < '{_SPLIT_VAL_LT}'
                THEN 'val'
              ELSE 'test' END AS split
  FROM documents)
SELECT source, split, COUNT(*)::BIGINT AS n_docs, SUM(n_chars)::BIGINT AS sum_chars
FROM assigned GROUP BY source, split
"""


# ------------------------------------------------ global shuffle → shards
def docs_shuffle_shards(sf_dir: str):
    """Deterministic global shuffle into training output shards — the last
    step of a pre-training curation pipeline: every document gets a shard
    (uniform via md5) and a within-shard position (rank of the md5 hex, so
    the order is a reproducible pseudo-random permutation, stable across
    runs, engines and cluster layouts — unlike ``random_shuffle()``).

    Scale shape: ONE hash exchange keyed by shard, then each shard sorts
    independently inside its partition — at the 100 TB design point the
    shard is also the parquet write partition, so no global sort and no
    driver materialization; shard count just grows with the corpus.
    """
    ds = read_parquet(sf_dir, "documents", columns=["doc_id", "n_chars"])

    def hashed(t: pa.Table) -> pa.Table:
        hx = [hashlib.md5(str(i).encode()).hexdigest() for i in t["doc_id"].to_pylist()]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": t["n_chars"],
                "hx": pa.array(hx, pa.string()),
                "shard": pa.array([int(h[0], 16) for h in hx], pa.int64()),
            }
        )

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["shard", "hx", "doc_id"], kind="mergesort").reset_index(drop=True)
        df["pos"] = df.groupby("shard").cumcount().astype("int64")
        return df[["doc_id", "shard", "pos", "n_chars"]]

    out = hash_partition_map(
        ds.map_batches(hashed, batch_format="pyarrow"), ["shard"], rank
    )
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("shard", pa.int64()),
                ("pos", pa.int64()),
                ("n_chars", pa.int64()),
            ]
        ),
    )


DOCS_SHUFFLE_SHARDS_SQL = """
WITH h AS (
  SELECT doc_id, n_chars, md5(doc_id::VARCHAR) AS hx FROM documents
)
SELECT doc_id,
       (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1)::BIGINT AS shard,
       (row_number() OVER (
          PARTITION BY substr(hx, 1, 1) ORDER BY hx, doc_id) - 1)::BIGINT AS pos,
       n_chars
FROM h
"""


QUERIES = {
    "docs_repetition_signals": (docs_repetition_signals, DOCS_REPETITION_SQL),
    "docs_decontaminate": (docs_decontaminate, DOCS_DECONTAMINATE_SQL),
    "docs_tfidf_top_terms": (docs_tfidf_top_terms, DOCS_TFIDF_SQL),
    "docs_source_mix": (docs_source_mix, DOCS_SOURCE_MIX_SQL),
    "docs_curation_pipeline": (docs_curation_pipeline, DOCS_CURATION_SQL),
    "docs_pack_sequences": (docs_pack_sequences, DOCS_PACK_SQL),
    "docs_importance_weights": (docs_importance_weights, None),
    "docs_importance_sample": (docs_importance_sample, None),
    "docs_lm_quality": (docs_lm_quality, None),
    "docs_substring_dups": (docs_substring_dups, DOCS_SUBSTRING_SQL),
    "docs_chunk_overlap": (docs_chunk_overlap, DOCS_CHUNK_SQL),
    "docs_bm25_topk": (docs_bm25_topk, DOCS_BM25_SQL),
    "docs_bpe_train": (docs_bpe_train, None),
    "docs_bpe_encode": (docs_bpe_encode, None),
    "docs_inverted_index": (docs_inverted_index, DOCS_INVERTED_SQL),
    "docs_split_assign": (docs_split_assign, DOCS_SPLIT_SQL),
    "docs_shuffle_shards": (docs_shuffle_shards, DOCS_SHUFFLE_SHARDS_SQL),
}
