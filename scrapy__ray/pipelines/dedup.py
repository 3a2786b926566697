"""Dup-cluster resolution: near-dup PAIRS -> connected components -> keep-set.

The operator a training-data pipeline actually ends with (round-1 verdict's
top missing LLM-data op): the near-dup detectors (exact Jaccard, MinHash+LSH,
SimHash, embedding cosine) emit *pairs*; consuming pipelines need the
transitive closure — one canonical representative per duplicate CLUSTER and a
keep/drop flag per document.

Distributed algorithm: iterated min-label propagation (the hash-shuffle
formulation of union-find's leader election, cf. the "Hash-to-Min" /
large-star-small-star family used for MapReduce connected components):

    labels_0[v] = v
    repeat:  labels_{t+1}[v] = min(labels_t[v], min over neighbors u of labels_t[u])
    until no label changes

Each iteration is one shuffle_join (propagate labels across edges) plus one
shuffle_agg (min per node); convergence needs O(diameter) rounds — near-dup
clusters are dense (quasi-cliques), so 2-3 rounds in practice.  Nothing ever
materializes per-cluster state in one process; the partitioning key is the
node id throughout.  Convergence detection is a single driver-side scalar
(sum of labels, strictly decreasing until fixpoint).

Scrapy analogue: ``scrapy/dupefilters.py::RFPDupeFilter`` resolves EXACT
duplicates via the seen-set; nothing upstream covers transitive near-dup
resolution, which is why SURVEY.md §2 lists it under the training-data ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy__ray.pipelines.util import (
    collect_arrow,
    driver_agg,
    read_parquet,
    shuffle_agg,
    shuffle_join,
)

_CLUSTER_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("cluster_rep", pa.int64()), ("keep", pa.bool_())]
)


_SMALL_PAIRS_THRESHOLD = 200_000


def pairs_to_clusters(pairs_ds, nodes_ds, max_iters: int = 50):
    """Resolve (doc_a, doc_b) pair Dataset + doc_id node Dataset into the
    (doc_id, cluster_rep, keep) keep-set.

    Two regimes by PAIR volume (near-dup pairs ≪ corpus by construction —
    the node side is never the discriminator and never collected):
      * ≤ _SMALL_PAIRS_THRESHOLD pairs: union-find over the collected pair
        set on the driver, then ONE distributed map over the nodes with the
        broadcast rep map (O(pair-docs) small side — the classic
        broadcast-join).  Skips ~4 shuffle executions per propagation
        round whose fixed cost dwarfs this volume.
      * above: iterated min-label propagation — per round one
        label-propagation shuffle-join keyed by node and one
        min-aggregation keyed by node; the driver holds only a convergence
        scalar.  Converges in O(component diameter) rounds (near-dup
        clusters are quasi-cliques: 2-3).
    Both paths yield the identical labeling (component-minimum rep);
    tests force each path and compare.

    Caller contract: create the input datasets AFTER util.ensure_ctx() (any
    util.read_parquet does this) — datasets snapshot their DataContext at
    creation, and the distributed path's repartition(keys=...) needs
    HASH_SHUFFLE in that snapshot."""
    import ray.data as rd

    if pairs_ds.count() <= _SMALL_PAIRS_THRESHOLD:
        return _clusters_small(pairs_ds, nodes_ds)

    # undirected edges, both directions, as (src, dst)
    def both_dirs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    def init_labels(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {"node": pa.array(ids, pa.int64()), "label": pa.array(ids, pa.int64())}
        )

    labels = nodes_ds.map_batches(init_labels, batch_format="pyarrow").materialize()

    def label_sum(ds) -> int:
        return int(
            driver_agg(
                ds,
                lambda df: pd.DataFrame({"s": [df["label"].sum()]}),
                lambda df: df[["s"]].sum().to_frame().T,
            )["s"].iloc[0]
        )

    def min_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("node", as_index=False)["label"].min()

    prev = label_sum(labels)
    converged = False
    for _ in range(max_iters):
        # propagate: each edge (src, dst) carries src's label to dst
        contrib = shuffle_join(
            edges,
            labels.map_batches(
                lambda t: t.rename_columns(["src", "label"]),
                batch_format="pyarrow",
            ),
            on="src",
            left_cols=["src", "dst"],
            right_cols=["src", "label"],
        ).map_batches(
            lambda t: t.select(["dst", "label"]).rename_columns(["node", "label"]),
            batch_format="pyarrow",
        )
        labels = shuffle_agg(
            contrib.union(labels), ["node"], min_partial, min_partial
        ).materialize()
        # sever plan/stats ancestry per round (blocks stay in the object
        # store): the chained join+union+agg operator tree otherwise grows
        # by several stats nodes per round and Ray's recursive DatasetStats
        # summarization hits Python's recursion limit near ~20 rounds —
        # found by crawl_seed_distance, whose BFS genuinely iterates to the
        # graph diameter; near-dup clusters converge in 2-3 rounds but the
        # 50-round budget exists precisely for long chain components
        labels = rd.from_arrow_refs(labels.to_arrow_refs())
        cur = label_sum(labels)
        if cur == prev:  # labels only ever decrease; equal sum == fixpoint
            converged = True
            break
        prev = cur
    if not converged:
        # silent mid-propagation labels would emit multiple keep=True rows
        # per true component — refuse rather than return wrong clusters
        # (a diameter > max_iters component, e.g. a 300k-doc chain of
        # pairwise near-identical paginated docs, is the realistic trigger)
        raise RuntimeError(
            f"pairs_to_clusters did not converge within {max_iters} "
            "min-label propagation rounds; component diameter exceeds the "
            "iteration budget — raise max_iters"
        )

    def finish(t: pa.Table) -> pa.Table:
        node = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(node, pa.int64()),
                "cluster_rep": pa.array(lab, pa.int64()),
                "keep": pa.array(node == lab, pa.bool_()),
            }
        )

    return collect_arrow(
        labels.map_batches(finish, batch_format="pyarrow"), _CLUSTER_SCHEMA
    )


def _clusters_small(pairs_ds, nodes_ds):
    """Driver union-find over a small pair set + one distributed labeling
    pass over the nodes with the broadcast rep map."""
    from scrapy__ray.pipelines.util import broadcast, lookup_broadcast

    pairs = collect_arrow(
        pairs_ds, pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    )
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rep = {x: find(x) for x in list(parent)}
    rep_ref = broadcast({k: v for k, v in rep.items() if k != v})

    def label(t: pa.Table) -> pa.Table:
        m = lookup_broadcast(rep_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = np.array([m.get(int(i), int(i)) for i in ids], dtype=np.int64)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "cluster_rep": pa.array(lab, pa.int64()),
                "keep": pa.array(ids == lab, pa.bool_()),
            }
        )

    return collect_arrow(
        nodes_ds.map_batches(label, batch_format="pyarrow"), _CLUSTER_SCHEMA
    )


def docs_dup_clusters(sf_dir: str):
    """Keep-set over the exact-Jaccard near-dup pairs: every document mapped
    to its duplicate-cluster representative (min doc_id in the connected
    component of the pair graph; singletons keep themselves).

    Uses the exact-Jaccard detector so the whole chain — pair detection AND
    transitive resolution — is mirrored by the DuckDB oracle (recursive CTE
    over the identical pair SQL).  The pair stage runs with the production
    JACCARD_MAX_DF document-frequency cap (subquadratic by default; the
    oracle SQL applies the identical cap).  The same ``pairs_to_clusters``
    core consumes MinHash/SimHash/cosine pair streams unchanged."""
    import ray.data as rd

    from scrapy__ray.pipelines.textops import docs_jaccard_dups

    pairs = docs_jaccard_dups(sf_dir)  # pa.Table of (doc_a, doc_b, jaccard)
    nodes = read_parquet(sf_dir, "documents", columns=["doc_id"])
    return pairs_to_clusters(rd.from_arrow(pairs.select(["doc_a", "doc_b"])), nodes)


def docs_dup_clusters_minhash(sf_dir: str):
    """Keep-set over the MinHash+LSH near-dup pairs — the corpus-scale
    chain (LSH detection is subquadratic where exact Jaccard is not).
    Oracle: a pure-Python union-find over the independently-computed
    MinHash pairs, materialized to parquet by oracle_ext."""
    import ray.data as rd

    from scrapy__ray.pipelines.textops import docs_minhash_lsh

    pairs = docs_minhash_lsh(sf_dir)
    nodes = read_parquet(sf_dir, "documents", columns=["doc_id"])
    return pairs_to_clusters(rd.from_arrow(pairs.select(["doc_a", "doc_b"])), nodes)


def emb_dup_clusters(sf_dir: str):
    """Keep-set over the embedding-cosine near-dup pairs — same
    ``pairs_to_clusters`` core, third detector modality (exact Jaccard,
    MinHash, embedding cosine).  Oracle: recursive CTE over the identical
    cosine-pair SQL."""
    import ray.data as rd

    from scrapy__ray.pipelines.simops import emb_cosine_dups
    from scrapy__ray.pipelines.util import ensure_ctx, read_parquet

    ensure_ctx()
    pairs = emb_cosine_dups(sf_dir)  # pa.Table (vec_a, vec_b, cos)
    nodes = read_parquet(sf_dir, "embeddings", columns=["vec_id"]).map_batches(
        lambda t: t.rename_columns(["doc_id"]), batch_format="pyarrow"
    )
    out = pairs_to_clusters(
        rd.from_arrow(
            pairs.select(["vec_a", "vec_b"]).rename_columns(["doc_a", "doc_b"])
        ),
        nodes,
    )
    return out.rename_columns(["vec_id", "cluster_rep", "keep"])


def _emb_dup_clusters_sql() -> str:
    from scrapy__ray.pipelines.simops import EMB_COS_DUP_SQL

    pair_sql = EMB_COS_DUP_SQL.strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  {pair_sql}
),
edges AS (
  SELECT vec_a AS a, vec_b AS b FROM pairs
  UNION
  SELECT vec_b AS a, vec_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT node AS vec_id, MIN(r)::BIGINT AS cluster_rep, (node = MIN(r)) AS keep
FROM reach GROUP BY node
"""


def _dup_clusters_sql() -> str:
    from scrapy__ray.pipelines.textops import docs_jaccard_sql

    pair_sql = docs_jaccard_sql().strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  {pair_sql}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
)
SELECT node AS doc_id, MIN(r)::BIGINT AS cluster_rep, (node = MIN(r)) AS keep
FROM reach GROUP BY node
"""


def docs_dup_keep_best(sf_dir: str):
    """Quality-aware canonical selection over the exact-Jaccard dup
    clusters: instead of keeping the MIN-doc_id member (docs_dup_clusters'
    keep flag — an arbitrary canonical), keep the LONGEST member of each
    cluster (max token count, tie-break lowest doc_id) — the standard
    curation rule for near-dup canonicals (the longest version of a
    boilerplate-wrapped page is usually the most complete).  Output one
    row per document: (doc_id, cluster_rep, n_tokens, keep), sorted by
    doc_id.

    Shape: the cluster labels (already resolved by pairs_to_clusters) and
    a narrow (doc_id, n_tokens) token-count pass shuffle-join on doc_id,
    then ONE hash exchange keyed by cluster_rep elects the argmax inside
    each partition with a vectorized sort+first — no per-group UDF
    dispatch, no driver-side cluster state.  Token counts reuse
    docs_quality's tokenizer, whose SQL mirror is already oracle-proven,
    so the WHOLE chain (capped pair SQL -> recursive-CTE closure ->
    window-function argmax) has an exact DuckDB oracle."""
    import ray.data as rd

    from scrapy__ray.pipelines.textops import _tokens
    from scrapy__ray.pipelines.util import hash_partition_map

    clusters = docs_dup_clusters(sf_dir)  # pa.Table (doc_id, cluster_rep, keep)
    clusters_ds = rd.from_arrow(clusters.select(["doc_id", "cluster_rep"]))

    def count_tokens(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(
                    [len(_tokens(x)) for x in t["text"].to_pylist()], pa.int64()
                ),
            }
        )

    ntok = read_parquet(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow"
    )
    joined = shuffle_join(
        clusters_ds,
        ntok,
        on="doc_id",
        left_cols=["doc_id", "cluster_rep"],
        right_cols=["doc_id", "n_tokens"],
    )

    def elect(df: pd.DataFrame):
        if not len(df) or "doc_id" not in df.columns:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "cluster_rep": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "keep": pa.array([], pa.bool_()),
                }
            )
        df = df.sort_values(
            ["cluster_rep", "n_tokens", "doc_id"], ascending=[True, False, True]
        )
        keep = df.groupby("cluster_rep").cumcount() == 0
        return pa.table(
            {
                "doc_id": pa.array(df["doc_id"].to_numpy(np.int64), pa.int64()),
                "cluster_rep": pa.array(
                    df["cluster_rep"].to_numpy(np.int64), pa.int64()
                ),
                "n_tokens": pa.array(df["n_tokens"].to_numpy(np.int64), pa.int64()),
                "keep": pa.array(keep.to_numpy(), pa.bool_()),
            }
        )

    out = collect_arrow(
        hash_partition_map(joined, ["cluster_rep"], elect),
        pa.schema(
            [
                ("doc_id", pa.int64()),
                ("cluster_rep", pa.int64()),
                ("n_tokens", pa.int64()),
                ("keep", pa.bool_()),
            ]
        ),
    )
    df = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _dup_keep_best_sql() -> str:
    from scrapy__ray.pipelines.textops import docs_jaccard_sql

    pair_sql = docs_jaccard_sql().strip().rstrip(";")
    return f"""
WITH RECURSIVE pairs AS (
  {pair_sql}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT reach.node, e.b FROM reach JOIN edges e ON e.a = reach.r
),
clusters AS (
  SELECT node AS doc_id, MIN(r)::BIGINT AS cluster_rep FROM reach GROUP BY node
),
tok AS (
  SELECT doc_id,
         (CASE WHEN trim(text) = '' THEN 0
               ELSE len(regexp_split_to_array(trim(text), '\\s+')) END)::BIGINT
           AS n_tokens
  FROM documents
)
SELECT c.doc_id, c.cluster_rep, t.n_tokens,
       (ROW_NUMBER() OVER (
          PARTITION BY c.cluster_rep
          ORDER BY t.n_tokens DESC, c.doc_id ASC) = 1) AS keep
FROM clusters c JOIN tok t USING (doc_id)
ORDER BY c.doc_id
"""


DOCS_DUP_CLUSTERS_SQL = _dup_clusters_sql()

EMB_DUP_CLUSTERS_SQL = _emb_dup_clusters_sql()

DOCS_DUP_KEEP_BEST_SQL = _dup_keep_best_sql()


QUERIES = {
    "docs_dup_clusters": (docs_dup_clusters, DOCS_DUP_CLUSTERS_SQL),
    "docs_dup_clusters_minhash": (docs_dup_clusters_minhash, None),
    "docs_dup_keep_best": (docs_dup_keep_best, DOCS_DUP_KEEP_BEST_SQL),
    "emb_dup_clusters": (emb_dup_clusters, EMB_DUP_CLUSTERS_SQL),
}
