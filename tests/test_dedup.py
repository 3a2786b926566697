"""Unit tests for the dup-cluster keep-set operator (pipelines/dedup.py)."""

from __future__ import annotations

import pyarrow as pa

SF_DIR = "/root/testdata/sf0.01"


def _run(pairs: list[tuple[int, int]], nodes: list[int]):
    import ray.data as rd

    from scrapy__ray.pipelines.dedup import pairs_to_clusters
    from scrapy__ray.pipelines.util import ensure_ctx

    # datasets snapshot their DataContext at creation: HASH_SHUFFLE must be
    # set BEFORE from_arrow or the distributed path's repartition(keys=...)
    # raises (read_parquet-based callers get this via util.read_parquet)
    ensure_ctx()

    pairs_t = pa.table(
        {
            "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
            "doc_b": pa.array([b for _, b in pairs], pa.int64()),
        }
    )
    nodes_ds = rd.from_arrow(pa.table({"doc_id": pa.array(nodes, pa.int64())}))
    t = pairs_to_clusters(rd.from_arrow(pairs_t), nodes_ds)
    return {
        r["doc_id"]: (r["cluster_rep"], r["keep"]) for r in t.to_pylist()
    }


def test_two_components_and_singletons(ray_session):
    # components: {1,2,3} via chain, {10,11}; singletons 20, 21
    out = _run([(1, 2), (2, 3), (10, 11)], [1, 2, 3, 10, 11, 20, 21])
    assert out[1] == (1, True)
    assert out[2] == (1, False)
    assert out[3] == (1, False)
    assert out[10] == (10, True)
    assert out[11] == (10, False)
    assert out[20] == (20, True)
    assert out[21] == (21, True)


def test_long_chain_converges_distributed(ray_session, monkeypatch):
    # force the distributed min-label path: a 12-node path graph needs
    # several propagation rounds (diameter 11)
    import scrapy__ray.pipelines.dedup as dedup

    monkeypatch.setattr(dedup, "_SMALL_PAIRS_THRESHOLD", -1)
    n = 5  # diameter 4: needs >1 propagation round, bounded test cost
    out = _run([(i, i + 1) for i in range(n - 1)], list(range(n)))
    assert all(out[i] == (0, i == 0) for i in range(n))


def test_both_paths_identical(ray_session, monkeypatch):
    import scrapy__ray.pipelines.dedup as dedup

    pairs = [(1, 2), (2, 3), (10, 11), (11, 12), (3, 1)]
    nodes = list(range(15))
    small = _run(pairs, nodes)
    monkeypatch.setattr(dedup, "_SMALL_PAIRS_THRESHOLD", -1)
    large = _run(pairs, nodes)
    assert small == large


def test_no_pairs_all_keep(ray_session):
    out = _run([], [5, 6, 7])
    assert out == {5: (5, True), 6: (6, True), 7: (7, True)}


def test_cos_block_pair_orientation_order_independent():
    """Cross-block cosine pairs must survive regardless of which block has
    the higher ids — materialized block order is completion order (the
    va<vb filter once silently dropped every pair when the high-id block
    came first)."""
    import numpy as np

    from scrapy__ray.pipelines.simops import _cos_block_pair

    def block(ids, vecs):
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float64())),
            }
        )

    v = np.eye(3)[0]
    hi = block([10, 11], [v, v])  # identical vectors -> cos 1.0
    lo = block([1, 2], [v, v])
    fwd = _cos_block_pair(lo, hi).to_pylist()
    rev = _cos_block_pair(hi, lo).to_pylist()
    key = lambda r: (r["vec_a"], r["vec_b"])
    assert sorted(fwd, key=key) == sorted(rev, key=key)
    assert len(fwd) == 4  # 2x2 cross pairs, all kept and oriented
    assert all(r["vec_a"] < r["vec_b"] for r in fwd)
    # diagonal case still dedups the symmetric matrix
    diag = _cos_block_pair(block([1, 2], [v, v]), None).to_pylist()
    assert diag == [{"vec_a": 1, "vec_b": 2, "cos": 1.0}]


def test_exact_cosine_guard_routes_to_bucketed(ray_session, monkeypatch):
    """Above EXACT_COS_MAX_ROWS the exact all-pairs variant must refuse
    (pointing at the bucketed path) unless force_exact=True opts in."""
    import pytest

    import scrapy__ray.pipelines.simops as simops

    sf = "/root/testdata/sf0.001"
    monkeypatch.setattr(simops, "EXACT_COS_MAX_ROWS", 3)
    with pytest.raises(ValueError, match="bucketed"):
        simops.emb_cosine_dups(sf)
    out = simops.emb_cosine_dups(sf, force_exact=True)
    assert out.num_rows > 0


# ---------------------------------------------------------------- CDC chunker
def _naive_cdc(data: bytes) -> list[bytes]:
    """Third implementation for the property gates: per-position window sum
    with explicit byte indexing, returning the raw chunk byte strings."""
    BASE, W, MASK, MN, MX = 0x100000001B3, 8, 31, 8, 128
    n = len(data)
    chunks = []
    last = 0
    while last < n:
        cut = None
        p = last + MN - 1
        while p <= min(last + MX - 1, n - 2):
            if p >= W - 1:
                h = 0
                for j in range(W):
                    h = (h + pow(BASE, W - 1 - j, 2**64) * data[p - W + 1 + j]) % 2**64
                if h & MASK == 0:
                    cut = p + 1
                    break
            p += 1
        if cut is None:
            if last + MX - 1 <= n - 2:
                cut = last + MX
            else:
                chunks.append(data[last:])
                break
        chunks.append(data[last:cut])
        last = cut
    return chunks


def test_cdc_chunks_match_naive_reimplementation():
    import hashlib
    import random

    from scrapy__ray.pipelines.textops import _cdc_chunks

    rng = random.Random(42)
    for trial in range(50):
        n = rng.randrange(0, 700)
        data = bytes(rng.randrange(256) for _ in range(n))
        want = [hashlib.md5(c).hexdigest() for c in _naive_cdc(data)]
        assert _cdc_chunks(data) == want, (trial, n)


def test_cdc_chunk_size_law():
    """Every chunk is in [MIN, MAX] bytes except the final one (>= 1)."""
    import random

    from scrapy__ray.pipelines.textops import _CDC_MAX, _CDC_MIN

    rng = random.Random(7)
    for _ in range(20):
        data = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 2000)))
        sizes = [len(c) for c in _naive_cdc(data)]
        assert sum(sizes) == len(data)
        for s in sizes[:-1]:
            assert _CDC_MIN <= s <= _CDC_MAX
        assert 1 <= sizes[-1] <= _CDC_MAX


def test_cdc_self_synchronization():
    """THE property that distinguishes CDC from fixed-window chunking: a
    prefix insertion shifts every fixed-window boundary, but content-defined
    boundaries re-synchronize — the perturbed doc shares most chunk hashes
    with the original."""
    import random

    from scrapy__ray.pipelines.textops import _cdc_chunks

    rng = random.Random(11)
    data = bytes(rng.randrange(256) for _ in range(1500))
    orig = set(_cdc_chunks(data))
    shifted = set(_cdc_chunks(bytes([1, 2, 3, 4, 5]) + data))
    overlap = len(orig & shifted) / len(orig)
    assert overlap >= 0.8, overlap


def test_popcount64_matches_python():
    import numpy as np

    from scrapy__ray.pipelines.textops import _popcount64

    rng = np.random.Generator(np.random.PCG64(7))
    xs = rng.integers(0, 1 << 63, size=1000, dtype=np.uint64) * 2 + rng.integers(
        0, 2, size=1000, dtype=np.uint64
    )
    got = _popcount64(xs)
    want = [bin(int(x)).count("1") for x in xs]
    assert got.tolist() == want
    assert _popcount64(np.array([0, 0xFFFFFFFFFFFFFFFF], np.uint64)).tolist() == [0, 64]


def test_simhash_banding_is_exact_by_pigeonhole():
    """The recall-1.0 claim docs_simhash_dups rests on: ANY pair of 64-bit
    fingerprints at hamming distance <= 3 agrees exactly on at least one
    of the 4 16-bit blocks; at distance 4 a counterexample exists."""
    import numpy as np

    rng = np.random.Generator(np.random.PCG64(11))
    for _ in range(500):
        a = int(rng.integers(0, 1 << 62)) * 4 + int(rng.integers(0, 4))
        flips = rng.choice(64, size=int(rng.integers(0, 4)), replace=False)
        b = a
        for f in flips:
            b ^= 1 << int(f)
        shared = any(
            ((a >> (16 * i)) & 0xFFFF) == ((b >> (16 * i)) & 0xFFFF)
            for i in range(4)
        )
        assert shared, (hex(a), hex(b), flips)
    # distance 4, one flip per block: no block survives
    a = 0
    b = (1 << 0) | (1 << 16) | (1 << 32) | (1 << 48)
    assert not any(
        ((a >> (16 * i)) & 0xFFFF) == ((b >> (16 * i)) & 0xFFFF) for i in range(4)
    )


def test_sq_topk_recall_vs_exact(ray_session):
    """SQ8 keeps full dimensionality, so its top-10 must strongly overlap the
    exact float-dot top-10 (PQ-style rank inversions stay possible)."""
    import numpy as np
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.simops import emb_sq_topk

    got = emb_sq_topk(SF_DIR).to_pandas()
    assert list(got.columns) == ["vec_id", "qdot"]
    assert len(got) == 10
    # descending quantized score, vec_id tiebreak
    assert (got["qdot"].values[:-1] >= got["qdot"].values[1:]).all()

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = emb[np.nonzero(ids == 0)[0][0]]
    score = emb @ q
    mask = ids != 0
    exact = ids[mask][np.argsort(-score[mask], kind="stable")[:10]]
    assert len(set(got["vec_id"]) & set(exact.tolist())) >= 5


def test_centroid_outliers_are_the_farthest(ray_session):
    """Every reported member must be at least as far from its centroid as
    every unreported member of the same cluster (brute-force check)."""
    import numpy as np
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.simops import (
        _OUTLIER_K,
        _OUTLIER_TOPN,
        _seed_centroids,
        emb_centroid_outliers,
    )

    got = emb_centroid_outliers(SF_DIR).to_pandas()
    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    cent = _seed_centroids(SF_DIR, _OUTLIER_K)
    d2 = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    di = np.floor(d2[np.arange(len(a)), a] * 1e6 + 0.5).astype(np.int64)
    for k in range(_OUTLIER_K):
        member_ids = ids[a == k]
        member_di = di[a == k]
        rep = got[got["cluster"] == k]
        assert len(rep) == min(_OUTLIER_TOPN, len(member_ids))
        if not len(rep):
            continue
        floor_i = np.int64(round(rep["dist"].min() * 1e6))
        outside = member_di[~np.isin(member_ids, rep["vec_id"].values)]
        assert not len(outside) or outside.max() <= floor_i


def test_mmr_select_properties(ray_session):
    """MMR invariants: rank 1 is the pure-relevance argmax; vec_ids are
    unique; the chosen score sequence is non-increasing (each step every
    candidate's score can only drop, and the pool only shrinks); and the
    greedy pick dominates every skipped candidate at its step under the
    integer objective."""
    import numpy as np
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.simops import emb_mmr_select

    got = emb_mmr_select(SF_DIR).to_pandas()
    assert list(got["rank"]) == list(range(1, 21))
    assert got["vec_id"].nunique() == 20
    s = got["mmr_fix"].to_numpy()
    assert (s[:-1] >= s[1:]).all()

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    emb = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    q = emb[np.nonzero(ids == 0)[0][0]]
    qn = q / np.linalg.norm(q)
    keep = ids != 0
    ids, emb = ids[keep], emb[keep]
    norms = np.linalg.norm(emb, axis=1)
    cos = (emb @ qn) / np.where(norms == 0, 1.0, norms)
    top_rel = ids[np.lexsort((ids, -cos))[0]]
    assert got.loc[0, "vec_id"] == top_rel
