"""Similarity search over the ``embeddings`` table (list<float> column).

Brute-force cosine against a broadcast query matrix is the baseline; the
scale path (IVF-style bucketing by coarse centroid) is implemented as
``emb_ivf_topk``.  All float math is float64 with coarse rounding so the
DuckDB oracle's accumulation order can't flip a digit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from scrapy__ray.pipelines.util import (
    broadcast,
    collect_arrow,
    driver_agg,
    lookup_broadcast,
    read_parquet,
    round_col,
)


def _batch_matrix(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    return ids, emb


def _query_vec(sf_dir: str, vec_id: int = 0) -> np.ndarray:
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    idx = t["vec_id"].to_pylist().index(vec_id)
    return np.asarray(t["embedding"][idx].as_py(), dtype=np.float64)


# --------------------------------------------------------- brute-force ANN
def emb_ann_topk(sf_dir: str):
    """Cosine top-10 vs the embedding of vec_id=0: per-batch numpy matmul
    against the broadcast query vector, then a global top-k (sort+limit on
    the small per-batch score table)."""
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)
    q_ref = broadcast(qn)

    ds = read_parquet(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def score(t: pa.Table) -> pa.Table:
        qv = lookup_broadcast(q_ref)
        ids, emb = _batch_matrix(t)
        norms = np.linalg.norm(emb, axis=1)
        cos = (emb @ qv) / np.where(norms == 0, 1.0, norms)
        keep = ids != 0
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "cos": pa.array(round_col(cos[keep], 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos", "vec_id"], descending=[True, False])
        .limit(10)
    )


EMB_ANN_SQL = """
SELECT vec_id,
       ROUND(list_cosine_similarity(embedding::DOUBLE[],
             (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 4) AS cos
FROM embeddings
WHERE vec_id <> 0
ORDER BY cos DESC, vec_id
LIMIT 10
"""


# -------------------------------------------------------- label statistics
def emb_label_stats(sf_dir: str):
    """Few label groups -> combiner + driver reduce, no shuffle."""
    import pandas as pd

    ds = read_parquet(sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])

    def norms(t: pa.Table) -> pa.Table:
        _ids, emb = _batch_matrix(t)
        return pa.table(
            {
                "label": t["label"],
                "norm": pa.array(np.linalg.norm(emb, axis=1), pa.float64()),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("label", as_index=False).agg(
            n=("norm", "size"), s=("norm", "sum")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("label", as_index=False).agg(n=("n", "sum"), s=("s", "sum"))

    out = driver_agg(ds.map_batches(norms, batch_format="pyarrow"), partial, final)
    return pa.table(
        {
            "label": pa.array(out["label"], pa.int32()),
            "n": pa.array(out["n"].astype("int64"), pa.int64()),
            "avg_norm": round_col(out["s"] / out["n"], 3),
        }
    )


EMB_LABEL_SQL = """
SELECT label, COUNT(*) AS n,
       ROUND(AVG(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 3) AS avg_norm
FROM embeddings GROUP BY label
"""


# ----------------------------------------------- embedding-cosine near-dup
COS_DUP_THRESHOLD = 0.45  # fixture embeddings are near-orthogonal (max cos ~0.51)


def emb_cosine_dups(sf_dir: str):
    """All pairs with round(cos,4) >= 0.95: per-batch rows x broadcast full
    matrix matmul (a 'block-vs-all' sweep).  Scale path: LSH/IVF-bucket both
    sides by coarse centroid first so only same-bucket blocks multiply —
    see emb_ivf_topk for the bucketing machinery."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    allm = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    alln = allm / np.linalg.norm(allm, axis=1, keepdims=True)
    mat_ref = broadcast((all_ids, alln))

    ds = read_parquet(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def pairs(tb: pa.Table) -> pa.Table:
        ids_all, m_all = lookup_broadcast(mat_ref)
        ids, emb = _batch_matrix(tb)
        emb = emb / np.linalg.norm(emb, axis=1, keepdims=True)
        cos = emb @ m_all.T  # (batch, all)
        cos_r = round_col(cos.ravel(), 4).reshape(cos.shape)
        bi, aj = np.nonzero(cos_r >= COS_DUP_THRESHOLD)
        va, vb = ids[bi], ids_all[aj]
        keep = va < vb
        return pa.table(
            {
                "vec_a": pa.array(va[keep], pa.int64()),
                "vec_b": pa.array(vb[keep], pa.int64()),
                "cos": pa.array(cos_r[bi[keep], aj[keep]], pa.float64()),
            }
        )

    schema = pa.schema(
        [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cos", pa.float64())]
    )
    return collect_arrow(ds.map_batches(pairs, batch_format="pyarrow"), schema)


EMB_COS_DUP_SQL = f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4)
      >= {COS_DUP_THRESHOLD}
"""


# -------------------------------------------------------- IVF-bucketed ANN
def emb_ivf_topk(sf_dir: str):
    """IVF-style scale path for ANN: assign every vector to the nearest of
    16 deterministic coarse centroids (seeded sample of the data), probe the
    query's 4 nearest buckets, exact-score only those.  Approximate ->
    rows-only check; at 10^10 rows the bucket assignment is the partition
    key and only probed partitions are read."""
    q = _query_vec(sf_dir)
    qn = q / np.linalg.norm(q)

    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids_all = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    # deterministic centroids: every (n//16)-th vector by sorted vec_id
    order = np.argsort(ids_all)
    step = max(1, len(ids_all) // 16)
    cent = m[order[::step]][:16]
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    probe = set(np.argsort(-(cent @ qn))[:4].tolist())
    cent_ref = broadcast((cent, probe, qn))

    ds = read_parquet(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def score(tb: pa.Table) -> pa.Table:
        c, pr, qv = lookup_broadcast(cent_ref)
        ids, emb = _batch_matrix(tb)
        norm = np.linalg.norm(emb, axis=1, keepdims=True)
        en = emb / np.where(norm == 0, 1.0, norm)
        bucket = np.argmax(en @ c.T, axis=1)
        keep = np.array([b in pr for b in bucket]) & (ids != 0)
        cos = en[keep] @ qv
        return pa.table(
            {
                "vec_id": pa.array(ids[keep], pa.int64()),
                "cos": pa.array(round_col(cos, 4), pa.float64()),
            }
        )

    return (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos", "vec_id"], descending=[True, False])
        .limit(10)
    )


# ------------------------------------------------------------ k-means (Lloyd)
_KMEANS_K = 8
_KMEANS_ITERS = 5


def emb_kmeans(sf_dir: str):
    """Distributed Lloyd k-means (k=8, 5 iterations): centroids broadcast
    each iteration, per-batch assignment + partial (sum, count) combine,
    driver reduce — the iterative-algorithm pattern (one tiny driver-side
    recompute per iteration, all heavy math vectorized in tasks).
    Deterministic init (first k vectors by vec_id) -> rows-only check."""
    import pandas as pd
    import pyarrow.parquet as pq

    init = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    order = np.argsort(np.asarray(init["vec_id"].to_pylist()))
    cent = np.array(init["embedding"].to_pylist(), dtype=np.float64)[
        order[:_KMEANS_K]
    ]

    ds = read_parquet(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    for _ in range(_KMEANS_ITERS):
        c_ref = broadcast(cent)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            c = lookup_broadcast(c_ref)
            emb = np.array(df["embedding"].tolist(), dtype=np.float64)
            d2 = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            a = np.argmin(d2, axis=1)
            rows = []
            for k in range(len(c)):
                mask = a == k
                if mask.any():
                    rows.append(
                        {
                            "k": k,
                            "n": int(mask.sum()),
                            "sum": emb[mask].sum(axis=0).tobytes(),
                            "inertia": float(d2[mask, k].sum()),
                        }
                    )
            return pd.DataFrame(rows, columns=["k", "n", "sum", "inertia"])

        def final(df: pd.DataFrame) -> pd.DataFrame:
            return df  # merge happens below (vectors are packed bytes)

        parts = driver_agg(ds, partial, final)
        dim = cent.shape[1]
        new_cent = cent.copy()
        inertia = 0.0
        for k in range(_KMEANS_K):
            sub = parts[parts["k"] == k]
            if not len(sub):
                continue
            total = np.zeros(dim)
            for b in sub["sum"]:
                total += np.frombuffer(b, dtype=np.float64)
            n = int(sub["n"].sum())
            new_cent[k] = total / n
            inertia += float(sub["inertia"].sum())
        cent = new_cent

    sizes_ref = broadcast(cent)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        c = lookup_broadcast(sizes_ref)
        emb = np.array(df["embedding"].tolist(), dtype=np.float64)
        d2 = ((emb[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        g = pd.DataFrame({"cluster": a, "n": 1, "inertia": d2[np.arange(len(a)), a]})
        return g.groupby("cluster", as_index=False).sum()

    out = driver_agg(
        ds, assign, lambda df: df.groupby("cluster", as_index=False).sum()
    )
    return pa.table(
        {
            "cluster": pa.array(out["cluster"].astype("int64"), pa.int64()),
            "n": pa.array(out["n"].astype("int64"), pa.int64()),
            "inertia": pa.array(round_col(out["inertia"], 2), pa.float64()),
        }
    )


QUERIES = {
    "emb_ann_topk": (emb_ann_topk, EMB_ANN_SQL),
    "emb_kmeans": (emb_kmeans, None),
    "emb_label_stats": (emb_label_stats, EMB_LABEL_SQL),
    "emb_cosine_dups": (emb_cosine_dups, EMB_COS_DUP_SQL),
    "emb_ivf_topk": (emb_ivf_topk, None),
}
