"""Materialized pure-Python oracles for deterministic rows-only queries.

Round-1 left 11 ``queries()`` entries with ``err: no_oracle`` in the driver's
CORRECTNESS report — not because they are unverifiable, but because their
semantics aren't ANSI-SQL-expressible (crawl BSP ordering, MinHash banding,
Lloyd iterations, HyperLogLog).  Every one of them IS deterministic under the
repo's pinned seeds, so this module computes each query's expected output with
an INDEPENDENT single-process implementation (plain Python / plain numpy — no
Ray, no shared pipeline code), writes it to parquet, and ``__ray_entry__``
exposes ``SELECT * FROM read_parquet('<path>')`` as the oracle SQL.  The
driver then gets full rows+schema+hash evidence instead of a rows-only check.

Independence notes per family:
- crawl_* : produced by ``scrapy__ray.oracle`` — the pure-Python reference
  crawl simulator that stands in for the (empty-mount) reference crawler; it
  shares only the byte-exact scalar functions (SURVEY.md §2.8), exactly like
  the equivalence tests in tests/test_crawl_equivalence.py.
- docs_simhash / docs_rolling_fingerprint / docs_minhash_lsh : re-derived
  with plain-Python integer arithmetic (the pipelines use vectorized uint64
  numpy) from the spec constants (blake2b token hashes, PCG64(42) multiply-
  shift params, 32x4 banding, Jaccard>=0.5).
- docs_langid : re-derived from the stopword profiles.
- emb_kmeans / emb_ivf_topk / emb_cosine_dups_bucketed : single-process
  numpy mirrors of the published algorithm (Lloyd, IVF probe) with the same
  deterministic seeds; the pipelines distribute the same math.
- events_approx_users : plain-Python HyperLogLog(p=12) — register maxima are
  partition-order-independent, so the sketch is exactly reproducible.
"""

from __future__ import annotations

import hashlib
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

_WS = re.compile(r"\s+")


def _round_away(values, digits: int) -> np.ndarray:
    """Round half away from zero — the SQL-ROUND-compatible rounding the
    pipelines use for every value that lands in a hashed column (numpy/
    Python ``round`` are half-to-even and can differ at exact ties)."""
    arr = np.asarray(values, dtype=np.float64)
    scale = 10.0 ** digits
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


def _tokens(text: str) -> list[str]:
    t = text.strip()
    return _WS.split(t) if t else []


def _h64(data: bytes) -> int:
    return int.from_bytes(hashlib.blake2b(data, digest_size=8).digest(), "big")


def _read_docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t["doc_id"].to_pylist(), t["text"].to_pylist()


# --------------------------------------------------------------- documents
def oracle_docs_simhash(sf_dir: str) -> pd.DataFrame:
    ids, texts = _read_docs(sf_dir)
    out = []
    for text in texts:
        toks = _tokens(text)
        if not toks:
            out.append(0)
            continue
        acc = [0] * 64
        for w in toks:
            h = _h64(w.encode())
            for i in range(64):
                acc[i] += 1 if (h >> i) & 1 else -1
        v = sum(1 << i for i in range(64) if acc[i] > 0)
        out.append(v - (1 << 64) if v >= (1 << 63) else v)
    return pd.DataFrame({"doc_id": ids, "simhash": pd.array(out, dtype="int64")})


def oracle_docs_simhash_dups(sf_dir: str) -> pd.DataFrame:
    """Brute-force O(N²) hamming pair search over the independently derived
    simhash fingerprints — exact because the engine's banding is lossless
    (pigeonhole: k=3 differing bits over 4 blocks leaves one block equal)."""
    sh = oracle_docs_simhash(sf_dir).sort_values("doc_id")
    ids = sh["doc_id"].to_numpy(np.int64)
    fps = sh["simhash"].to_numpy(np.int64).astype(np.uint64)
    out_a, out_b, out_h = [], [], []
    # chunk rows so the pairwise XOR block stays small
    step = 512
    for s in range(0, len(ids), step):
        x = fps[s : s + step]
        xor = x[:, None] ^ fps[None, s:]  # only j >= s (upper block)
        ham = np.zeros(xor.shape, dtype=np.int64)
        for k in range(8):
            ham += np.array(
                [bin(i).count("1") for i in range(256)], dtype=np.uint8
            )[((xor >> np.uint64(8 * k)) & np.uint64(0xFF)).astype(np.uint8)]
        ii, jj = np.nonzero(ham <= 3)
        gi, gj = ii + s, jj + s
        keep = gi < gj
        out_a.append(ids[gi[keep]])
        out_b.append(ids[gj[keep]])
        out_h.append(ham[ii[keep], jj[keep]])
    a = np.concatenate(out_a) if out_a else np.array([], np.int64)
    b = np.concatenate(out_b) if out_b else np.array([], np.int64)
    h = np.concatenate(out_h) if out_h else np.array([], np.int64)
    return pd.DataFrame(
        {
            "doc_a": pd.array(a, dtype="int64"),
            "doc_b": pd.array(b, dtype="int64"),
            "hamming": pd.array(h, dtype="int64"),
        }
    )


_LANG_PROFILES = {
    "en": {"the", "and", "of", "a", "to", "in", "is", "value", "key"},
    "de": {"der", "die", "und", "das", "ist", "ein", "nicht"},
    "fr": {"le", "la", "et", "les", "des", "un", "est"},
}


def oracle_docs_langid(sf_dir: str) -> pd.DataFrame:
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    preds = []
    for text in t["text"].to_pylist():
        toks = set(_tokens(text))
        best_lang, best_score = None, -1
        for lang in sorted(_LANG_PROFILES):  # ties -> alphabetically first
            score = len(toks & _LANG_PROFILES[lang])
            if score > best_score:
                best_lang, best_score = lang, score
        preds.append(best_lang)
    return pd.DataFrame(
        {
            "doc_id": t["doc_id"].to_pylist(),
            "lang_pred": preds,
            "lang_actual": t["lang"].to_pylist(),
        }
    )


_RH_BASE = 1_000_003
_RH_MOD = (1 << 61) - 1


def oracle_docs_rolling_fingerprint(sf_dir: str) -> pd.DataFrame:
    ids, texts = _read_docs(sf_dir)
    out = []
    for text in texts:
        h = 0
        for w in _tokens(text):
            h = (h * _RH_BASE + _h64(w.encode())) % _RH_MOD
        out.append(h)
    return pd.DataFrame({"doc_id": ids, "rolling_fp": pd.array(out, dtype="int64")})


def oracle_docs_winnow_dups(sf_dir: str) -> pd.DataFrame:
    """Single-process winnowing mirror (spec pinned in
    textops.docs_winnow_dups): ROLLING-hash recurrence (vs the engine's
    vectorized k-term Horner — same values, different algorithm) over every
    k-char gram, per-window minimum (as a VALUE set the tie rule is
    irrelevant), df-capped inverted index, pairs sharing >= min_shared
    fingerprints."""
    k, w, min_shared, max_df = 20, 8, 4, 1000
    mod, base = (1 << 31) - 1, 257
    pk = pow(base, k - 1, mod)
    ids, texts = _read_docs(sf_dir)
    doc_fps: dict[int, set[int]] = {}
    for did, text in zip(ids, texts):
        bs = text.encode("utf-8")
        n = len(bs) - k + 1
        if n <= 0:
            doc_fps[did] = set()
            continue
        h = 0
        for c in bs[:k]:
            h = (h * base + c) % mod
        hs = [h]
        for i in range(1, n):
            h = ((h - bs[i - 1] * pk) * base + bs[i + k - 1]) % mod
            hs.append(h)
        if n < w:
            doc_fps[did] = {min(hs)}
        else:
            doc_fps[did] = {min(hs[s : s + w]) for s in range(n - w + 1)}
    df_count: dict[int, int] = {}
    for fps in doc_fps.values():
        for fp in fps:
            df_count[fp] = df_count.get(fp, 0) + 1
    postings: dict[int, list[int]] = {}
    for did in sorted(doc_fps):
        for fp in doc_fps[did]:
            if df_count[fp] <= max_df:
                postings.setdefault(fp, []).append(did)
    shared: dict[tuple[int, int], int] = {}
    for members in postings.values():
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                key = (members[i], members[j])
                shared[key] = shared.get(key, 0) + 1
    rows = sorted((a, b, s) for (a, b), s in shared.items() if s >= min_shared)
    return pd.DataFrame(
        {
            "doc_a": pd.array([r[0] for r in rows], dtype="int64"),
            "doc_b": pd.array([r[1] for r in rows], dtype="int64"),
            "shared": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def _shingle_set(text: str, n: int = 3) -> set[int]:
    toks = _tokens(text)
    return {
        _h64(" ".join(toks[i : i + n]).encode())
        for i in range(max(0, len(toks) - n + 1))
    }


def oracle_docs_minhash_lsh(sf_dir: str) -> pd.DataFrame:
    K, BANDS = 128, 32
    rows_per_band = K // BANDS
    rng = np.random.Generator(np.random.PCG64(42))  # spec constants
    A = (rng.integers(0, 1 << 63, size=K, dtype=np.uint64) * 2 + 1).tolist()
    B = rng.integers(0, 1 << 63, size=K, dtype=np.uint64).tolist()
    mask = (1 << 64) - 1

    ids, texts = _read_docs(sf_dir)
    shingles = {did: _shingle_set(tx) for did, tx in zip(ids, texts)}

    buckets: dict[tuple[int, str], list[int]] = {}
    for did in ids:
        sh = shingles[did]
        if not sh:
            continue
        mh = [min(((a * x + b) & mask) for x in sh) for a, b in zip(A, B)]
        for bi in range(BANDS):
            seg = b"".join(
                v.to_bytes(8, "big")
                for v in mh[bi * rows_per_band : (bi + 1) * rows_per_band]
            )
            buckets.setdefault(
                (bi, hashlib.blake2b(seg, digest_size=8).hexdigest()), []
            ).append(did)

    cands = set()
    for members in buckets.values():
        members = sorted(members)
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cands.add((members[i], members[j]))

    out_a, out_b, out_j = [], [], []
    for a, b in sorted(cands):
        sa, sb = shingles[a], shingles[b]
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            out_a.append(a)
            out_b.append(b)
            out_j.append(float(_round_away([j], 4)[0]))
    return pd.DataFrame(
        {
            "doc_a": pd.array(out_a, dtype="int64"),
            "doc_b": pd.array(out_b, dtype="int64"),
            "jaccard": pd.array(out_j, dtype="float64"),
        }
    )


def oracle_docs_edit_dups(sf_dir: str) -> pd.DataFrame:
    """Token-level Levenshtein similarity over the oracle's OWN minhash-LSH
    pair set — classic full-matrix DP in plain Python (no numpy trick, no
    shared code with the engine's row-rolling min-accumulate kernel)."""
    pairs = oracle_docs_minhash_lsh(sf_dir)
    ids, texts = _read_docs(sf_dir)
    toks = {i: _tokens(t) for i, t in zip(ids, texts)}

    def lev(a: list[str], b: list[str]) -> int:
        n, m = len(a), len(b)
        if not n or not m:
            return max(n, m)
        prev = list(range(m + 1))
        for i in range(1, n + 1):
            cur = [i] + [0] * m
            for j in range(1, m + 1):
                cur[j] = min(
                    prev[j] + 1,
                    cur[j - 1] + 1,
                    prev[j - 1] + (a[i - 1] != b[j - 1]),
                )
            prev = cur
        return prev[m]

    rows = []
    for a, b in sorted(zip(pairs["doc_a"], pairs["doc_b"])):
        ta, tb = toks.get(a, []), toks.get(b, [])
        d = lev(ta, tb)
        denom = max(len(ta), len(tb))
        sim = 1.0 - d / denom if denom else 1.0
        rows.append((int(a), int(b), float(_round_away([sim], 4)[0])))
    return pd.DataFrame(rows, columns=["doc_a", "doc_b", "edit_sim"]).astype(
        {"doc_a": "int64", "doc_b": "int64", "edit_sim": "float64"}
    )


def oracle_docs_dup_clusters_minhash(sf_dir: str) -> pd.DataFrame:
    """Union-find over the independently-computed MinHash pairs -> the
    (doc_id, cluster_rep, keep) keep-set the distributed min-label
    propagation must converge to."""
    pairs = oracle_docs_minhash_lsh(sf_dir)
    ids, _ = _read_docs(sf_dir)
    parent = {d: d for d in ids}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(d, find(d)) for d in ids]
    return pd.DataFrame(
        {
            "doc_id": pd.array([r[0] for r in rows], dtype="int64"),
            "cluster_rep": pd.array([r[1] for r in rows], dtype="int64"),
            "keep": [r[0] == r[1] for r in rows],
        }
    )


# -------------------------------------------------------------- embeddings
def _read_embeddings(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t["vec_id"].to_pylist(), dtype=np.int64)
    m = np.array(t["embedding"].to_pylist(), dtype=np.float64)
    order = np.argsort(ids)
    return ids[order], m[order]


def oracle_emb_kmeans(sf_dir: str) -> pd.DataFrame:
    k, iters = 8, 5
    ids, emb = _read_embeddings(sf_dir)
    cent = emb[np.searchsorted(ids, np.arange(k))].copy()
    for _ in range(iters):
        d2 = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        for ki in range(k):
            m = a == ki
            if m.any():
                cent[ki] = emb[m].sum(axis=0) / m.sum()
    d2 = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    rows = []
    for ki in sorted(set(a.tolist())):
        m = a == ki
        rows.append(
            {
                "cluster": ki,
                "n": int(m.sum()),
                "inertia": float(_round_away([d2[m, ki].sum()], 2)[0]),
            }
        )
    df = pd.DataFrame(rows)
    return df.astype({"cluster": "int64", "n": "int64", "inertia": "float64"})


def _seed_centroids_np(ids: np.ndarray, emb: np.ndarray, k: int) -> np.ndarray:
    step = max(1, len(ids) // k)
    want = np.arange(k) * step
    return emb[np.searchsorted(ids, want)].copy()


def oracle_emb_sq_topk(sf_dir: str) -> pd.DataFrame:
    """Single-process SQ8 mirror: global per-dim min/max (exact, order-free),
    affine uint8 codes, decoded-space dot with per-dim integer fixing vs the
    decoded vec_id=0 query."""
    ids, emb = _read_embeddings(sf_dir)
    lo, hi = emb.min(axis=0), emb.max(axis=0)
    span = hi - lo
    span[span <= 0] = 1.0
    codes = np.clip(np.floor((emb - lo) / span * 255 + 0.5), 0, 255).astype(np.int64)
    dec = lo + codes * (span / 255)
    qdec = dec[np.searchsorted(ids, 0)]
    score = (
        np.floor(dec * qdec[None, :] * 1_000_000.0 + 0.5).astype(np.int64).sum(axis=1)
    )
    mask = ids != 0
    s, i = score[mask], ids[mask]
    order = np.lexsort((i, -s))[:10]
    return pd.DataFrame(
        {"vec_id": i[order], "qdot": s[order] / 1_000_000.0}
    ).astype({"vec_id": "int64", "qdot": "float64"})


def oracle_emb_centroid_outliers(sf_dir: str) -> pd.DataFrame:
    """Assign to nearest seed centroid (first-min tie), µ-fixed squared L2,
    10 farthest per cluster (distance desc, vec_id asc)."""
    ids, emb = _read_embeddings(sf_dir)
    cent = _seed_centroids_np(ids, emb, 8)
    d2 = ((emb[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
    a = np.argmin(d2, axis=1)
    di = np.floor(d2[np.arange(len(a)), a] * 1_000_000.0 + 0.5).astype(np.int64)
    df = pd.DataFrame({"cluster": a.astype(np.int64), "vec_id": ids, "dist_i": di})
    df = df.sort_values(
        ["cluster", "dist_i", "vec_id"], ascending=[True, False, True], kind="stable"
    )
    df = df.groupby("cluster", as_index=False).head(10)
    return pd.DataFrame(
        {
            "cluster": df["cluster"].astype("int64"),
            "vec_id": df["vec_id"].astype("int64"),
            "dist": df["dist_i"].astype("int64") / 1_000_000.0,
        }
    ).reset_index(drop=True)


def oracle_emb_ivf_topk(sf_dir: str) -> pd.DataFrame:
    ids, emb = _read_embeddings(sf_dir)
    q = emb[np.searchsorted(ids, 0)]
    qn = q / np.linalg.norm(q)
    cent = _seed_centroids_np(ids, emb, 16)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    probe = set(np.argsort(-(cent @ qn))[:4].tolist())
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    en = emb / np.where(norm == 0, 1.0, norm)
    bucket = np.argmax(en @ cent.T, axis=1)
    keep = np.array([b in probe for b in bucket]) & (ids != 0)
    cos = _round_away(en[keep] @ qn, 4)
    kept_ids = ids[keep]
    order = np.lexsort((kept_ids, -cos))[:10]
    return pd.DataFrame(
        {
            "vec_id": pd.array(kept_ids[order], dtype="int64"),
            "cos": pd.array(cos[order], dtype="float64"),
        }
    )


def oracle_emb_cosine_dups_bucketed(sf_dir: str) -> pd.DataFrame:
    n_buckets, probes, threshold = 16, 4, 0.45  # mirror simops constants
    ids, emb = _read_embeddings(sf_dir)
    cent = _seed_centroids_np(ids, emb, n_buckets)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    en = emb / np.where(norm == 0, 1.0, norm)
    sim = en @ cent.T
    top = np.argsort(-sim, axis=1)[:, :probes]
    found: dict[tuple[int, int], float] = {}
    for b in range(n_buckets):
        members = np.nonzero((top == b).any(axis=1))[0]
        if len(members) < 2:
            continue
        sub = en[members]
        cos = _round_away((sub @ sub.T).ravel(), 4).reshape(len(members), len(members))
        ai, bj = np.nonzero(cos >= threshold)
        for i, j in zip(ai, bj):
            va, vb = int(ids[members[i]]), int(ids[members[j]])
            if va < vb:
                found[(va, vb)] = float(cos[i, j])
    items = sorted(found.items())
    return pd.DataFrame(
        {
            "vec_a": pd.array([k[0] for k, _ in items], dtype="int64"),
            "vec_b": pd.array([k[1] for k, _ in items], dtype="int64"),
            "cos": pd.array([v for _, v in items], dtype="float64"),
        }
    )


def oracle_emb_srp_lsh_dups(sf_dir: str) -> pd.DataFrame:
    """Single-process SRP-LSH mirror (spec pinned in simops.emb_srp_lsh_dups):
    64 sign bits from exact int64 dots of 1024-quantized vectors against
    PCG64(202) integer hyperplanes, 4×16-bit bands, bucket members verify
    with round(cos,4) >= 0.45."""
    scale, threshold = 1024, 0.45  # mirror simops constants
    ids, emb = _read_embeddings(sf_dir)
    rng = np.random.Generator(np.random.PCG64(202))
    planes = rng.integers(-scale, scale + 1, size=(64, emb.shape[1]), dtype=np.int64)
    q = np.rint(emb * scale).astype(np.int64)
    bits = (q @ planes.T) > 0
    weights = np.uint64(1) << np.arange(64, dtype=np.uint64)
    sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1, dtype=np.uint64)
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    en = emb / np.where(norm == 0, 1.0, norm)
    found: dict[tuple[int, int], float] = {}
    for bi in range(4):
        bk = ((sig >> np.uint64(16 * bi)) & np.uint64(0xFFFF)).astype(np.int64)
        for v in np.unique(bk):
            members = np.nonzero(bk == v)[0]
            if len(members) < 2:
                continue
            sub = en[members]
            cos = _round_away((sub @ sub.T).ravel(), 4).reshape(
                len(members), len(members)
            )
            ai, bj = np.nonzero(cos >= threshold)
            for i, j in zip(ai, bj):
                va, vb = int(ids[members[i]]), int(ids[members[j]])
                if va < vb:
                    found[(va, vb)] = float(cos[i, j])
    items = sorted(found.items())
    return pd.DataFrame(
        {
            "vec_a": pd.array([k[0] for k, _ in items], dtype="int64"),
            "vec_b": pd.array([k[1] for k, _ in items], dtype="int64"),
            "cos": pd.array([v for _, v in items], dtype="float64"),
        }
    )


def oracle_emb_semdedup(sf_dir: str) -> pd.DataFrame:
    """Single-process SemDeDup mirror (spec pinned in simops.emb_semdedup):
    deterministic seed-centroid assignment, then per-cluster greedy pruning
    over the FULL pairwise cosine matrix (the engine never materializes
    that matrix — it streams incremental matmuls against the kept set)."""
    k, eps = 16, 0.45  # mirror simops constants
    ids, emb = _read_embeddings(sf_dir)
    cent = _seed_centroids_np(ids, emb, k)
    cent = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    norm = np.linalg.norm(emb, axis=1, keepdims=True)
    en = emb / np.where(norm == 0, 1.0, norm)
    sim = en @ cent.T
    cluster = np.argmax(sim, axis=1)
    csim = _round_away(sim[np.arange(len(ids)), cluster], 4)
    keep = np.zeros(len(ids), dtype=bool)
    for c in range(k):
        members = np.nonzero(cluster == c)[0]
        if not len(members):
            continue
        cos = _round_away((en[members] @ en[members].T).ravel(), 4).reshape(
            len(members), len(members)
        )
        order = np.lexsort((ids[members], csim[members]))
        kept: list[int] = []
        for local in order:
            if kept and cos[local, kept].max() >= eps:
                continue
            kept.append(local)
            keep[members[local]] = True
    out = pd.DataFrame(
        {
            "vec_id": pd.array(ids, dtype="int64"),
            "cluster": pd.array(cluster.astype(np.int32), dtype="int32"),
            "centroid_sim": pd.array(csim, dtype="float64"),
            "keep": pd.array(keep, dtype="bool"),
        }
    )
    return out.sort_values("vec_id").reset_index(drop=True)


def oracle_emb_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Single-process PQ/ADC mirror (spec pinned in simops.emb_pq_topk):
    seed-row codebooks, first-minimum code assignment, integer-millionth
    ADC table summed per vector."""
    m_sub, k = 8, 16  # mirror simops constants
    ids, emb = _read_embeddings(sf_dir)
    cent = _seed_centroids_np(ids, emb, k)
    q = emb[np.searchsorted(ids, 0)]
    dim = cent.shape[1]
    dsub = dim // m_sub
    total = np.zeros(len(ids), dtype=np.int64)
    for m in range(m_sub):
        c = cent[:, m * dsub:(m + 1) * dsub]
        d2q = ((q[m * dsub:(m + 1) * dsub] - c) ** 2).sum(axis=1)
        lut = np.floor(d2q * 1000000.0 + 0.5).astype(np.int64)
        d2 = ((emb[:, None, m * dsub:(m + 1) * dsub] - c[None, :, :]) ** 2).sum(axis=2)
        total += lut[np.argmin(d2, axis=1)]
    keep = ids != 0
    kept_ids, kept = ids[keep], total[keep]
    order = np.lexsort((kept_ids, kept))[:10]
    return pd.DataFrame(
        {
            "vec_id": pd.array(kept_ids[order], dtype="int64"),
            "adist": pd.array(kept[order] / 1000000.0, dtype="float64"),
        }
    )


def oracle_emb_ivfpq_topk(sf_dir: str) -> pd.DataFrame:
    """Single-process IVFADC mirror (spec pinned in simops.emb_ivfpq_topk):
    seed-row coarse centroids + residual codebook, stable-argsort probe
    selection, first-minimum assignments, integer-millionth per-bucket ADC
    tables."""
    c_coarse, nprobe, m_sub, k = 8, 2, 8, 16
    ids, emb = _read_embeddings(sf_dir)
    coarse = _seed_centroids_np(ids, emb, c_coarse)
    seeds = _seed_centroids_np(ids, emb, k)
    q = emb[np.searchsorted(ids, 0)]
    dim = coarse.shape[1]
    dsub = dim // m_sub
    d2s = ((seeds[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    rcb = seeds - coarse[np.argmin(d2s, axis=1)]
    d2q = ((q[None, :] - coarse) ** 2).sum(axis=1)
    probe = np.argsort(d2q, kind="stable")[:nprobe]
    d2all = ((emb[:, None, :] - coarse[None, :, :]) ** 2).sum(axis=2)
    bucket = np.argmin(d2all, axis=1)
    keep = np.isin(bucket, probe) & (ids != 0)
    kids, res, kb = ids[keep], emb[keep] - coarse[bucket[keep]], bucket[keep]
    total = np.zeros(len(kids), dtype=np.int64)
    for m in range(m_sub):
        sl = slice(m * dsub, (m + 1) * dsub)
        lut = np.zeros((c_coarse, k), dtype=np.int64)
        for b in probe:
            r = q - coarse[b]
            d2 = ((r[sl] - rcb[:, sl]) ** 2).sum(axis=1)
            lut[b] = np.floor(d2 * 1000000.0 + 0.5).astype(np.int64)
        codes = np.argmin(
            ((res[:, None, sl] - rcb[None, :, sl]) ** 2).sum(axis=2), axis=1
        )
        total += lut[kb, codes]
    order = np.lexsort((kids, total))[:10]
    return pd.DataFrame(
        {
            "vec_id": pd.array(kids[order], dtype="int64"),
            "adist": pd.array(total[order] / 1000000.0, dtype="float64"),
        }
    )


# ------------------------------------------------------------------ events
def oracle_events_approx_users(sf_dir: str) -> pd.DataFrame:
    p = 12
    m = 1 << p
    regs = [0] * m
    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    for v in t["user_id"].to_pylist():
        h = _h64(str(v).encode())
        idx = h >> (64 - p)
        w = (h << p) & ((1 << 64) - 1)
        rho = 64 - w.bit_length() + 1 if w else (64 - p) + 1
        if rho > regs[idx]:
            regs[idx] = rho
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / float(np.sum(2.0 ** -np.asarray(regs, dtype=np.float64)))
    zeros = regs.count(0)
    if est <= 2.5 * m and zeros:
        est = m * float(np.log(m / zeros))
    return pd.DataFrame({"approx_distinct_users": pd.array([int(round(est))], dtype="int64")})


def oracle_events_approx_users_by_type(sf_dir: str) -> pd.DataFrame:
    """Grouped HLL mirror (contract pinned in
    pipelines/streamops.events_approx_users_by_type): one p=12 sketch per
    event_type over blake2b-64 user hashes — register maxes are
    order-independent, so the distributed merge is bit-identical to this
    single pass."""
    p = 12
    m = 1 << p
    t = pq.read_table(
        f"{sf_dir}/events.parquet", columns=["event_type", "user_id"]
    )
    regs: dict[str, list[int]] = {}
    for et, v in zip(t["event_type"].to_pylist(), t["user_id"].to_pylist()):
        r = regs.setdefault(et, [0] * m)
        h = _h64(str(v).encode())
        idx = h >> (64 - p)
        w = (h << p) & ((1 << 64) - 1)
        rho = 64 - w.bit_length() + 1 if w else (64 - p) + 1
        if rho > r[idx]:
            r[idx] = rho
    rows = []
    alpha = 0.7213 / (1 + 1.079 / m)
    for et in sorted(regs):
        r = regs[et]
        est = alpha * m * m / float(np.sum(2.0 ** -np.asarray(r, dtype=np.float64)))
        zeros = r.count(0)
        if est <= 2.5 * m and zeros:
            est = m * float(np.log(m / zeros))
        rows.append((et, int(round(est))))
    return pd.DataFrame(
        rows, columns=["event_type", "approx_distinct_users"]
    ).astype({"approx_distinct_users": "int64"})


# ------------------------------------------------------------------- crawl
def _oracle_crawl():
    """Run the pure-Python reference crawl simulator on the pinned sf-small
    fixture corpus (the same run the equivalence tests compare against)."""
    import fixtures.gen as fxgen
    from scrapy__ray.config import CrawlConfig
    from scrapy__ray.oracle import run_oracle

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    return run_oracle(corpus, CrawlConfig()), corpus


def oracle_crawl_fetch_log(res) -> pd.DataFrame:
    df = pd.DataFrame(
        res.fetch_log,
        columns=["url", "round", "host", "fetch_seq_in_host", "status", "depth"],
    )
    df = df.sort_values(["round", "host", "fetch_seq_in_host"]).reset_index(drop=True)
    return df.astype(
        {
            "round": "int64",
            "fetch_seq_in_host": "int64",
            "status": "int64",
            "depth": "int64",
        }
    )


def oracle_crawl_metrics(res) -> pd.DataFrame:
    # engine rounds carry a 'scheduled' counter; derive it for the oracle as
    # fetch attempts per round (every scheduled row is fetched exactly once)
    df = pd.DataFrame(res.metrics)
    per_round = pd.DataFrame(res.fetch_log, columns=["u", "round", "h", "s", "st", "d"])
    sched = per_round.groupby("round").size()
    df["scheduled"] = df["round"].map(sched).fillna(0).astype("int64")
    cols = [
        "fetched", "deduped", "deferred", "robots_denied", "errors",
        "retried", "redirects", "offsite", "scheduled", "round",
    ]
    return df[cols].astype({c: "int64" for c in cols})


def oracle_crawl_host_summary(res) -> pd.DataFrame:
    df = pd.DataFrame(
        res.fetch_log,
        columns=["url", "round", "host", "seq", "status", "depth"],
    )
    df["ok"] = (df["status"] == 200).astype("int64")
    df["err"] = (df["status"] != 200).astype("int64")
    # extracted text exists only for parsed 200s (meta-refresh 200s carry none)
    df["text_chars"] = [
        len(res.texts.get(u, "")) if s == 200 else 0
        for u, s in zip(df["url"], df["status"])
    ]
    g = df.groupby("host", as_index=False).agg(
        n_fetches=("status", "size"),
        n_ok=("ok", "sum"),
        n_err=("err", "sum"),
        text_chars=("text_chars", "sum"),
        depth_sum=("depth", "sum"),
    )
    g["mean_depth"] = np.round(g["depth_sum"] / g["n_fetches"], 3)
    g = g.drop(columns="depth_sum").sort_values("host").reset_index(drop=True)
    return g.astype(
        {
            "n_fetches": "int64",
            "n_ok": "int64",
            "n_err": "int64",
            "text_chars": "int64",
            "mean_depth": "float64",
        }
    )


def _oracle_link_graph(corpus: str):
    """Single-process intra-corpus link graph (spec pinned in
    crawlq._link_edges): P4 extractor per page (the scalar function is
    byte-vector-tested; graph construction and all counting here are
    independent of the Ray pipeline), membership-restricted, self-loops
    dropped.  Returns (urls, edges) with edges = list[(src, dst)]."""
    import gzip as _gzip

    from scrapy__ray.functions.linkextract import extract_links

    t = pq.read_table(corpus + "/pages")
    urls = t["url"].to_pylist()
    htmls = t["html"].to_pylist()
    if "content_encoding" in t.schema.names:
        htmls = [
            _gzip.decompress(h) if enc == "gzip" else h
            for h, enc in zip(htmls, t["content_encoding"].to_pylist())
        ]
    members = set(urls)
    edges = []
    for u, html in zip(urls, htmls):
        for link in extract_links(html, u):
            if link != u and link in members:
                edges.append((u, link))
    return urls, edges


def oracle_crawl_inlinks(corpus: str) -> pd.DataFrame:
    from scrapy__ray.functions.url import host_of

    _urls, edges = _oracle_link_graph(corpus)
    indeg: dict[str, int] = {}
    hosts: dict[str, set] = {}
    for src, dst in edges:
        indeg[dst] = indeg.get(dst, 0) + 1
        hosts.setdefault(dst, set()).add(host_of(src))
    rows = sorted(indeg)
    return pd.DataFrame(
        {
            "url": rows,
            "in_degree": pd.array([indeg[u] for u in rows], dtype="int64"),
            "n_src_hosts": pd.array([len(hosts[u]) for u in rows], dtype="int64"),
        }
    )


def oracle_crawl_triangles(corpus: str) -> pd.DataFrame:
    """Naive single-process triangle count mirror (spec pinned in
    crawlq.crawl_triangles): undirected simple graph from the link edges
    (both directions collapse to one {a,b}), per-vertex triangle
    participation via pairwise neighbor-set intersection, top-20 by
    (n_triangles desc, url).  Independent of the Ray pipeline's oriented
    wedge-join — different algorithm, same answer."""
    _urls, edges = _oracle_link_graph(corpus)
    adj: dict[str, set] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    tri: dict[str, int] = {}
    for v, ns in adj.items():
        ns_s = sorted(ns)
        c = 0
        for i, u in enumerate(ns_s):
            au = adj[u]
            for w in ns_s[i + 1 :]:
                if w in au:
                    c += 1
        if c:
            tri[v] = c
    top = sorted(tri, key=lambda u: (-tri[u], u))[:20]
    return pd.DataFrame(
        {
            "url": top,
            "n_triangles": pd.array([tri[u] for u in top], dtype="int64"),
        }
    )


def oracle_crawl_clustering_coef(corpus: str) -> pd.DataFrame:
    """Local-clustering-coefficient mirror (spec pinned in
    crawlq.crawl_clustering_coef): naive per-vertex neighbor-set
    intersection for the triangle count (independent of the Ray pipeline's
    oriented wedge join), coefficient = ONE IEEE division 2.0·T/(d·(d−1))
    for d ≥ 2 else 0, all pages, sorted by url."""
    urls, edges = _oracle_link_graph(corpus)
    adj: dict[str, set] = {u: set() for u in urls}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    rows = sorted(urls)
    deg, tri, coef = [], [], []
    for v in rows:
        ns = sorted(adj[v])
        c = 0
        for i, u in enumerate(ns):
            au = adj[u]
            for w in ns[i + 1 :]:
                if w in au:
                    c += 1
        d = len(ns)
        deg.append(d)
        tri.append(c)
        coef.append(2.0 * c / (d * (d - 1)) if d >= 2 else 0.0)
    return pd.DataFrame(
        {
            "url": rows,
            "degree": pd.array(deg, dtype="int64"),
            "n_triangles": pd.array(tri, dtype="int64"),
            "coef": pd.array(coef, dtype="float64"),
        }
    )


def oracle_crawl_hyperball(corpus: str) -> pd.DataFrame:
    """HyperBall mirror (spec pinned in crawlq.crawl_hyperball): the same
    HLL(p=6) register/estimator law run single-process over a dict of
    bytearrays — 8 hop-synchronous rounds of register-max along out-edges
    (new round's sketch built strictly from the PREVIOUS round's, like the
    distributed kernel), then the estimate with small-range correction.
    The register sum runs in sequential register order on both sides, so
    the float64 result is bit-identical, not statistically close."""
    import hashlib
    import math

    urls, edges = _oracle_link_graph(corpus)
    p, m = 6, 64
    regs: dict[str, bytearray] = {}
    for u in urls:
        r = bytearray(m)
        h = int.from_bytes(
            hashlib.blake2b(u.encode(), digest_size=8).digest(), "big"
        )
        idx = h >> (64 - p)
        w = (h << p) & ((1 << 64) - 1)
        r[idx] = 64 - w.bit_length() + 1 if w else (64 - p) + 1
        regs[u] = r
    out_adj: dict[str, list[str]] = {}
    for s, d in edges:
        out_adj.setdefault(s, []).append(d)
    for _ in range(8):
        new = {u: bytearray(r) for u, r in regs.items()}
        for s, nbrs in out_adj.items():
            tgt = new[s]
            for d in nbrs:
                src_regs = regs[d]
                for i in range(m):
                    if src_regs[i] > tgt[i]:
                        tgt[i] = src_regs[i]
        regs = new
    rows = []
    for u in sorted(urls):
        r = regs[u]
        fm = float(m)
        alpha = 0.7213 / (1 + 1.079 / fm)
        est = alpha * fm * fm / sum(2.0 ** -int(b) for b in r)
        zeros = sum(1 for b in r if b == 0)
        if est <= 2.5 * fm and zeros:
            est = fm * math.log(fm / zeros)
        rows.append((u, round(est, 2)))
    return pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "est_ball": pd.array([r[1] for r in rows], dtype="float64"),
        }
    )


def oracle_crawl_components(corpus: str) -> pd.DataFrame:
    """Weakly-connected-components mirror (spec pinned in
    crawlq.crawl_components): classic path-compressed union-find over the
    single-process link-graph edges, every page a node (isolated pages are
    singletons), one row per component with the lexicographically-smallest
    member url as representative, page count and distinct-host count,
    sorted (n_pages desc, component asc).  Independent of the Ray
    pipeline's rank-id min-label machinery."""
    from scrapy__ray.functions.url import host_of

    urls, edges = _oracle_link_graph(corpus)
    parent: dict[str, str] = {u: u for u in urls}

    def find(u: str) -> str:
        root = u
        while parent[root] != root:
            root = parent[root]
        while parent[u] != root:
            parent[u], u = root, parent[u]
        return root

    for s, d in edges:
        rs, rd_ = find(s), find(d)
        if rs != rd_:
            parent[rd_] = rs
    comps: dict[str, list[str]] = {}
    for u in urls:
        comps.setdefault(find(u), []).append(u)
    rows = []
    for members in comps.values():
        rows.append(
            (
                min(members),
                len(members),
                len({host_of(u) for u in members}),
            )
        )
    rows.sort(key=lambda r: (-r[1], r[0]))
    return pd.DataFrame(
        {
            "component": [r[0] for r in rows],
            "n_pages": pd.array([r[1] for r in rows], dtype="int64"),
            "n_hosts": pd.array([r[2] for r in rows], dtype="int64"),
        }
    )


def oracle_crawl_kcore(corpus: str) -> pd.DataFrame:
    """k-core mirror (spec pinned in crawlq.crawl_kcore): classic
    Batagelj–Zaveršnik peeling — pop vertices in increasing current-degree
    order (lazy-deletion heap), a vertex's core number is its degree at
    removal, and a neighbor's degree only decrements while it exceeds the
    popped vertex's (so degrees never fall below the current k).
    Undirected simple graph (both directions collapse, self-loops
    dropped); isolated pages core 0.  Independent of the Ray pipeline's
    h-index fixed point — different algorithm, same answer."""
    import heapq

    urls, edges = _oracle_link_graph(corpus)
    adj: dict[str, set] = {u: set() for u in urls}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    deg = {u: len(a) for u, a in adj.items()}
    heap = [(d, u) for u, d in deg.items()]
    heapq.heapify(heap)
    core: dict[str, int] = {}
    while heap:
        d, u = heapq.heappop(heap)
        if u in core or d != deg[u]:  # removed already / stale heap entry
            continue
        core[u] = d
        for v in adj[u]:
            if v not in core and deg[v] > d:
                deg[v] -= 1
                heapq.heappush(heap, (deg[v], v))
    rows = sorted(urls)
    return pd.DataFrame(
        {
            "url": rows,
            "core": pd.array([core[u] for u in rows], dtype="int64"),
        }
    )


def oracle_crawl_seed_distance(corpus: str) -> pd.DataFrame:
    """Multi-source BFS mirror (spec pinned in crawlq.crawl_seed_distance):
    stdlib deque BFS over the directed single-process link edges from the
    seeds.parquet list; reachable pages only, sorted (dist asc, url asc)."""
    from collections import deque

    import pyarrow.parquet as pq

    _urls, edges = _oracle_link_graph(corpus)
    seeds = sorted(
        set(pq.read_table(corpus + "/seeds.parquet", columns=["url"])["url"].to_pylist())
    )
    adj: dict[str, list[str]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    dist: dict[str, int] = {u: 0 for u in seeds}
    q = deque(seeds)
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    rows = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))
    return pd.DataFrame(
        {
            "url": [r[0] for r in rows],
            "dist": pd.array([r[1] for r in rows], dtype="int64"),
        }
    )


def oracle_crawl_domain_graph(corpus: str) -> pd.DataFrame:
    """Host-level webgraph mirror (spec pinned in crawlq.crawl_domain_graph):
    plain dict scan over the single-process link edges — per (src_host,
    dst_host): total links and distinct linking pages, self-host edges
    included, sorted (n_links desc, src_host, dst_host)."""
    from scrapy__ray.functions.url import host_of

    _urls, edges = _oracle_link_graph(corpus)
    links: dict[tuple[str, str], int] = {}
    pages: dict[tuple[str, str], set] = {}
    for s, d in edges:
        k = (host_of(s), host_of(d))
        links[k] = links.get(k, 0) + 1
        pages.setdefault(k, set()).add(s)
    keys = sorted(links, key=lambda k: (-links[k], k[0], k[1]))
    return pd.DataFrame(
        {
            "src_host": [k[0] for k in keys],
            "dst_host": [k[1] for k in keys],
            "n_links": pd.array([links[k] for k in keys], dtype="int64"),
            "n_src_pages": pd.array([len(pages[k]) for k in keys], dtype="int64"),
        }
    )


def oracle_crawl_hits(corpus: str) -> pd.DataFrame:
    """Integer-exact HITS mirror (spec pinned in crawlq.crawl_hits): 5
    alternating iterations, each half renormalized to 10^12 mass by floor
    division, top-20 by (authority desc, url).  Plain dict loops over the
    independent single-process graph."""
    iters, fix, topk = 5, 10**12, 20
    urls, edges = _oracle_link_graph(corpus)
    urls = sorted(set(urls))
    n = len(urls)
    hub = {u: fix // n for u in urls}
    auth = {u: 0 for u in urls}

    def renorm(raw: dict) -> dict:
        total = sum(raw.values())
        if total == 0:
            return {u: 0 for u in urls}
        return {u: raw.get(u, 0) * fix // total for u in urls}

    for _ in range(iters):
        acc: dict[str, int] = {}
        for s, d in edges:
            acc[d] = acc.get(d, 0) + hub.get(s, 0)
        auth = renorm(acc)
        acc = {}
        for s, d in edges:
            acc[s] = acc.get(s, 0) + auth.get(d, 0)
        hub = renorm(acc)

    top = sorted(urls, key=lambda u: (-auth[u], u))[:topk]
    return pd.DataFrame(
        {
            "url": top,
            "auth_fix": [auth[u] for u in top],
            "hub_fix": [hub[u] for u in top],
        }
    )


def oracle_crawl_pagerank(corpus: str) -> pd.DataFrame:
    """Integer-exact PageRank mirror (spec pinned in crawlq.crawl_pagerank):
    5 iterations, damping 85/100 via floor division on 10^12 total mass,
    dangling mass pooled then floor-divided per node."""
    iters, fix, dnum, dden, topk = 5, 10**12, 85, 100, 20
    urls, edges = _oracle_link_graph(corpus)
    n = len(urls)
    outdeg: dict[str, int] = {}
    for src, _dst in edges:
        outdeg[src] = outdeg.get(src, 0) + 1
    scores = {u: fix // n for u in urls}
    base = fix * (dden - dnum) // (dden * n)
    for _ in range(iters):
        incoming = {u: 0 for u in urls}
        dangling = 0
        for u in urls:
            s = scores[u]
            if outdeg.get(u, 0) == 0:
                dangling += s * dnum // dden
        for src, dst in edges:
            incoming[dst] += scores[src] * dnum // (dden * outdeg[src])
        dshare = dangling // n
        scores = {u: base + dshare + incoming[u] for u in urls}
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:topk]
    return pd.DataFrame(
        {
            "url": [u for u, _ in top],
            "score_fix": pd.array([s for _, s in top], dtype="int64"),
        }
    )


def _decode_fixture_html(raw: bytes) -> str:
    """Independent mini-mirror of the P2 encoding precedence for the
    fixture corpus's three encoding variants (BOM, meta-charset latin-1,
    plain utf-8) — deliberately NOT the engine's encoding.py."""
    if raw.startswith(b"\xef\xbb\xbf"):
        return raw[3:].decode("utf-8")
    head = raw[:4096].lower()
    if b'charset="iso-8859-1"' in head or b"charset=iso-8859-1" in head:
        return raw.decode("latin-1")
    return raw.decode("utf-8")


def oracle_crawl_css_extract(corpus: str) -> pd.DataFrame:
    """Regex-based independent extraction of the css-selector query's
    targets (title::text, h1::text, li>a hrefs, first p::text).  The engine
    side walks a DOM built by html.parser; this side uses regular
    expressions + html.unescape over the same raw markup — two genuinely
    different implementations that must agree on the fixture corpus."""
    import gzip
    import html as htmllib

    t = pq.read_table(corpus + "/pages")
    htmls = t["html"].to_pylist()
    if "content_encoding" in t.schema.names:
        htmls = [
            gzip.decompress(h) if enc == "gzip" else h
            for h, enc in zip(htmls, t["content_encoding"].to_pylist())
        ]
    title_re = re.compile(r"<title>(.*?)</title>", re.S)
    h1_re = re.compile(r"<h1>(.*?)</h1>", re.S)
    a_re = re.compile(r'<li><a href="([^"]*)">')
    p_re = re.compile(r"<p>(.*?)</p>", re.S)
    tag_re = re.compile(r"<[^>]+>")
    rows = {"url": [], "title": [], "h1": [], "n_anchors": [], "anchors": [], "first_para": []}
    for url, raw in zip(t["url"].to_pylist(), htmls):
        s = _decode_fixture_html(raw)
        mt = title_re.search(s)
        mh = h1_re.search(s)
        anchors = a_re.findall(s)
        mp = p_re.search(s)
        rows["url"].append(url)
        rows["title"].append(htmllib.unescape(mt.group(1)) if mt else "")
        rows["h1"].append(htmllib.unescape(mh.group(1)) if mh else "")
        rows["n_anchors"].append(len(anchors))
        rows["anchors"].append("\n".join(anchors))
        rows["first_para"].append(
            htmllib.unescape(tag_re.sub("", mp.group(1))) if mp else ""
        )
    df = pd.DataFrame(rows)
    return df.astype({"n_anchors": "int64"})


def oracle_crawl_extract_identity(corpus: str) -> pd.DataFrame:
    t = pq.read_table(corpus + "/pages", columns=["url"])
    return pd.DataFrame(
        {"url": t["url"].to_pylist(), "text_matches": True}
    ).astype({"text_matches": "bool"})


# ----------------------------------------------------------- materializer
def oracle_docs_importance_weights(sf_dir: str) -> pd.DataFrame:
    """Single-process DSIR mirror (Xie et al. 2023 spec pinned in
    pipelines/qualityops.py): hashed unigram+bigram buckets (blake2b mod
    4096), Laplace-smoothed log(p_en/q_all) per bucket fixed to 1e-6 int64
    units, per-doc weight = exact integer sum over feature occurrences.
    Plain Python loops + math.log — no shared pipeline code."""
    import math

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    B = 4096

    def buckets(text: str) -> list[int]:
        toks = _tokens(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [_h64(f.encode()) % B for f in feats]

    per_doc = [buckets(t) for t in texts]
    c_all = [0] * B
    c_tgt = [0] * B
    for bs, lang in zip(per_doc, langs):
        for b in bs:
            c_all[b] += 1
            if lang == "en":
                c_tgt[b] += 1
    tgt_tot = float(sum(c_tgt) + B)
    all_tot = float(sum(c_all) + B)
    ratio_int = []
    for k in range(B):
        r = (math.log((c_tgt[k] + 1) / tgt_tot)
             - math.log((c_all[k] + 1) / all_tot)) * 1_000_000
        ratio_int.append(int(math.copysign(math.floor(abs(r) + 0.5), r)))
    rows = []
    for doc_id, bs in zip(ids, per_doc):
        w = sum(ratio_int[b] for b in bs)
        rows.append((doc_id, len(bs), float(_round_away(w / 1_000_000, 4))))
    return pd.DataFrame(rows, columns=["doc_id", "n_feat", "log_weight"])


def oracle_docs_importance_sample(sf_dir: str) -> pd.DataFrame:
    """Gumbel-top-k mirror of the DSIR resampling step: same int-fixed
    weights as oracle_docs_importance_weights, plus per-doc Gumbel noise
    from md5(decimal doc_id) (53-bit uniform, scalar math.log), top-100 by
    integer key desc then doc_id."""
    import hashlib
    import math

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    B = 4096

    def buckets(text: str) -> list[int]:
        toks = _tokens(text)
        feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [_h64(f.encode()) % B for f in feats]

    per_doc = [buckets(t) for t in texts]
    c_all = [0] * B
    c_tgt = [0] * B
    for bs, lang in zip(per_doc, langs):
        for b in bs:
            c_all[b] += 1
            if lang == "en":
                c_tgt[b] += 1
    tgt_tot = float(sum(c_tgt) + B)
    all_tot = float(sum(c_all) + B)
    ratio_int = []
    for k in range(B):
        r = (math.log((c_tgt[k] + 1) / tgt_tot)
             - math.log((c_all[k] + 1) / all_tot)) * 1_000_000
        ratio_int.append(int(math.copysign(math.floor(abs(r) + 0.5), r)))
    rows = []
    for doc_id, bs in zip(ids, per_doc):
        w = sum(ratio_int[b] for b in bs)
        h = int.from_bytes(
            hashlib.md5(str(doc_id).encode()).digest()[:8], "big"
        ) >> 11
        u = (h + 0.5) / float(1 << 53)
        g = -math.log(-math.log(u)) * 1_000_000
        key = w + int(math.copysign(math.floor(abs(g) + 0.5), g))
        rows.append((doc_id, w, key))
    rows.sort(key=lambda r: (-r[2], r[0]))
    rows = rows[:100]
    return pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "log_weight": [float(_round_away(r[1] / 1_000_000, 4)) for r in rows],
            "key": [r[2] / 1_000_000.0 for r in rows],
        }
    )


def oracle_docs_lm_quality(sf_dir: str) -> pd.DataFrame:
    """Single-process CCNet-analogue mirror (spec pinned in
    pipelines/qualityops.py): hashed char-trigram counts over the en slice,
    Laplace NLL fixed to 1e-6-nat int64 units, per-doc avg by integer floor
    division, 0.01-nat histogram bins, head/middle/tail cuts at corpus
    thirds.  Plain Python + math.log — no shared pipeline code."""
    import math

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text", "lang"],
    )
    ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    B, SCALE, BIN = 65536, 1_000_000, 10_000

    def trigrams(text: str) -> list[int]:
        norm = " ".join(_tokens(text))
        return [
            _h64(norm[i : i + 3].encode()) % B for i in range(max(0, len(norm) - 2))
        ]

    per_doc = [trigrams(t) for t in texts]
    counts = [0] * B
    for tris, lang in zip(per_doc, langs):
        if lang == "en":
            for b in tris:
                counts[b] += 1
    total = float(sum(counts) + B)
    nll_tab = [int(math.floor((math.log(total) - math.log(c + 1)) * SCALE + 0.5))
               for c in counts]
    nll_int = []
    for tris in per_doc:
        nll_int.append(sum(nll_tab[b] for b in tris) // len(tris) if tris else 0)
    bins = [v // BIN for v in nll_int]
    order = sorted(bins)
    n = len(order)
    # bin holding the ceil(n/3)-th / ceil(2n/3)-th smallest score
    cut1 = order[math.ceil(n / 3) - 1]
    cut2 = order[math.ceil(2 * n / 3) - 1]
    rows = [
        (
            doc_id,
            float(_round_away(v / SCALE, 4)),
            "head" if b <= cut1 else "middle" if b <= cut2 else "tail",
        )
        for doc_id, v, b in zip(ids, nll_int, bins)
    ]
    return pd.DataFrame(rows, columns=["doc_id", "nll", "ppl_bucket"])


def oracle_events_heavy_hitters(sf_dir: str) -> pd.DataFrame:
    """Single-process count-min mirror (spec in pipelines/streamops.py):
    d=4 x w=2048 salted-blake2b sketch over user_id, dense [min,max]
    candidate range, top 20 by (estimate DESC, user_id).  A CMS is a
    linear sketch, so adding all rows in one pass here equals the
    engine's per-block partial sums exactly."""
    tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"), columns=["user_id"])
    users = tbl.column("user_id").to_pylist()
    D, W, K = 4, 2048, 20

    def idx(key, d):
        h = int.from_bytes(
            hashlib.blake2b(
                str(key).encode(), digest_size=8, salt=bytes([d] * 8)
            ).digest(),
            "big",
        )
        return h % W

    cms = [[0] * W for _ in range(D)]
    from collections import Counter

    for k, c in Counter(users).items():
        for d in range(D):
            cms[d][idx(k, d)] += c
    lo, hi = min(users), max(users)
    if hi - lo >= 10_000_000:
        # mirror the engine's dense-id guard (streamops.events_heavy_hitters):
        # fail fast instead of enumerating a sparse/wide id range for hours
        raise ValueError(
            "events_heavy_hitters oracle: user_id range too wide for dense "
            f"candidate enumeration ({lo}..{hi})"
        )
    est = {k: min(cms[d][idx(k, d)] for d in range(D)) for k in range(lo, hi + 1)}
    ranked = sorted(est.items(), key=lambda t: (-t[1], t[0]))[:K]
    return pd.DataFrame(
        {"user_id": [k for k, _ in ranked], "est_count": [e for _, e in ranked]}
    )


_BLOCK_RE = re.compile(
    r"<(p|ul|ol|h1|h2|h3|pre|blockquote|table)\b[^>]*>(.*?)</\1>", re.S
)
_A_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.S)
_TAG_RE = re.compile(r"<[^>]+>")


def _block_text(inner: str) -> str:
    import html as htmllib

    return " ".join(htmllib.unescape(_TAG_RE.sub("", inner)).split())


def _page_htmls(corpus: str) -> tuple[list[str], list[str]]:
    import gzip

    t = pq.read_table(corpus + "/pages")
    htmls = t["html"].to_pylist()
    if "content_encoding" in t.schema.names:
        htmls = [
            gzip.decompress(h) if enc == "gzip" else h
            for h, enc in zip(htmls, t["content_encoding"].to_pylist())
        ]
    return t["url"].to_pylist(), [_decode_fixture_html(h) for h in htmls]


def oracle_crawl_main_content(corpus: str) -> pd.DataFrame:
    """Regex-based independent mirror of the link-density main-content
    query (contract pinned in pipelines/crawlq.crawl_main_content): blocks
    via a tag-alternation scan (the fixture corpus nests no block inside
    another — same structural reliance as oracle_crawl_css_extract), text
    normalized by whitespace collapse, kept when non-empty and
    anchor-chars/total-chars < 0.5."""
    import hashlib

    urls, htmls = _page_htmls(corpus)
    rows = {"url": [], "n_blocks": [], "n_kept": [], "main_chars": [], "main_md5": []}
    for url, s in zip(urls, htmls):
        kept = []
        n_blocks = 0
        for m in _BLOCK_RE.finditer(s):
            inner = m.group(2)
            txt = _block_text(inner)
            link = sum(len(_block_text(a)) for a in _A_RE.findall(inner))
            n_blocks += 1
            if len(txt) > 0 and min(link, len(txt)) / len(txt) < 0.5:
                kept.append(txt)
        joined = "\n".join(kept)
        rows["url"].append(url)
        rows["n_blocks"].append(n_blocks)
        rows["n_kept"].append(len(kept))
        rows["main_chars"].append(len(joined))
        rows["main_md5"].append(hashlib.md5(joined.encode("utf-8")).hexdigest())
    df = pd.DataFrame(rows)
    return df.astype({"n_blocks": "int64", "n_kept": "int64", "main_chars": "int64"})


_UNIT_RE = re.compile(r"<(p|li)\b[^>]*>(.*?)</\1>", re.S)


def oracle_crawl_paragraph_dedup(corpus: str) -> pd.DataFrame:
    """Independent mirror of the CCNet-style block-text page-frequency
    dedup: distinct normalized <p>/<li> texts per page, Counter of distinct
    pages per text, boilerplate = on >= 5 pages."""
    urls, htmls = _page_htmls(corpus)
    per_page: list[tuple[str, set]] = []
    freq: dict[str, int] = {}
    for url, s in zip(urls, htmls):
        texts = {
            _block_text(m.group(2)) for m in _UNIT_RE.finditer(s)
        } - {""}
        per_page.append((url, texts))
        for t in texts:
            freq[t] = freq.get(t, 0) + 1
    rows = {"url": [], "n_units": [], "n_boiler": [], "boiler_frac": []}
    for url, texts in per_page:
        if not texts:
            continue  # pages with zero units emit no block rows engine-side
        nb = sum(1 for t in texts if freq[t] >= 5)
        rows["url"].append(url)
        rows["n_units"].append(len(texts))
        rows["n_boiler"].append(nb)
        rows["boiler_frac"].append(float(_round_away([nb / len(texts)], 4)[0]))
    df = pd.DataFrame(rows)
    return df.astype({"n_units": "int64", "n_boiler": "int64"})


_ANCHOR_RE = re.compile(r'<a\b[^>]*?href="([^"]*)"[^>]*>(.*?)</a>', re.S)
_BASE_RE = re.compile(r'<base\b[^>]*?href="([^"]*)"')


def oracle_crawl_anchor_text(corpus: str) -> pd.DataFrame:
    """Independent mirror of the anchor-text aggregation: regex scan for
    (href, inner) pairs (vs the engine's DOM walk), reusing ONLY the
    byte-vector-tested href canonicalizer; Counter aggregation + explicit
    top-1 pick by (count desc, text asc)."""
    from collections import Counter, defaultdict

    from scrapy__ray.functions.linkextract import links_from_hrefs

    urls, htmls = _page_htmls(corpus)
    members = set(urls)
    counts: dict[str, Counter] = defaultdict(Counter)
    for url, s in zip(urls, htmls):
        mb = _BASE_RE.search(s)
        base = mb.group(1) if mb else None
        for href, inner in _ANCHOR_RE.findall(s):
            txt = _block_text(inner)
            if not txt:
                continue
            resolved = links_from_hrefs([href], url, base)
            if resolved and resolved[0] in members and resolved[0] != url:
                counts[resolved[0]][txt] += 1
    rows = {
        "url": [],
        "top_anchor": [],
        "top_anchor_n": [],
        "n_variants": [],
        "n_anchors": [],
    }
    for dst, c in counts.items():
        top_text, top_n = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
        rows["url"].append(dst)
        rows["top_anchor"].append(top_text)
        rows["top_anchor_n"].append(top_n)
        rows["n_variants"].append(len(c))
        rows["n_anchors"].append(sum(c.values()))
    df = pd.DataFrame(rows)
    return df.astype(
        {"top_anchor_n": "int64", "n_variants": "int64", "n_anchors": "int64"}
    )


def oracle_docs_bpe_train(sf_dir: str) -> pd.DataFrame:
    """Single-process BPE merge learning (Sennrich et al. 2016 algorithm 1,
    contract pinned in pipelines/qualityops.docs_bpe_train): words = regex
    whitespace tokens, symbols start as characters, 12 merge rounds, each
    picks the (count-max, then lexicographically smallest) adjacent pair,
    overlaps all counted, merges applied left-to-right non-overlapping.
    Plain dict/list loops — no shared pipeline code."""
    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["text"])
    word_count: dict[str, int] = {}
    for text in tbl.column("text").to_pylist():
        for w in _tokens(text):
            word_count[w] = word_count.get(w, 0) + 1

    vocab: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in word_count.items()
    ]
    ranks, lefts, rights, counts = [], [], [], []
    for rank in range(1, 13):
        stats: dict[tuple[str, str], int] = {}
        for syms, c in vocab:
            for a, b in zip(syms, syms[1:]):
                stats[(a, b)] = stats.get((a, b), 0) + c
        if not stats:
            break
        best_pair, best_c = None, -1
        for p, c in stats.items():
            if c > best_c or (c == best_c and p < best_pair):
                best_pair, best_c = p, c
        la, rb = best_pair
        ranks.append(rank)
        lefts.append(la)
        rights.append(rb)
        counts.append(best_c)
        new_vocab = []
        for syms, c in vocab:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab.append((out, c))
        vocab = new_vocab
    return pd.DataFrame(
        {"rank": ranks, "left": lefts, "right": rights, "pair_count": counts}
    )


def oracle_docs_cdc_dups(sf_dir: str) -> pd.DataFrame:
    """Single-process CDC chunk dedup (contract pinned in
    pipelines/textops._cdc_chunks / docs_cdc_dups): polynomial rolling hash
    of the trailing 8 bytes (base 0x100000001B3 mod 2^64), cut when
    h & 31 == 0, min 8 / max 128 greedy walk, md5 chunk ids, per-doc
    DISTINCT chunks, dup = chunk present in ≥2 docs, fraction
    (2e4·dup + total) // (2·total) / 1e4.  Plain per-position loops — no
    shared chunker code."""
    import hashlib as _hashlib

    BASE, W, MASK, MN, MX = 0x100000001B3, 8, 31, 8, 128
    M = 2**64
    POWS = [pow(BASE, W - 1 - j, M) for j in range(W)]

    def chunks(data: bytes) -> set:
        n = len(data)
        if n == 0:
            return set()
        cand = []
        for p in range(W - 1, n - 1):
            h = 0
            for j in range(W):
                h = (h + POWS[j] * data[p - W + 1 + j]) % M
            if h & MASK == 0:
                cand.append(p)
        out = set()
        last = 0
        while True:
            cut = None
            for p in cand:
                if last + MN - 1 <= p <= last + MX - 1:
                    cut = p + 1
                    break
            if cut is None and last + MX - 1 <= n - 2:
                cut = last + MX
            if cut is None:
                out.add(_hashlib.md5(data[last:]).hexdigest())
                return out
            out.add(_hashlib.md5(data[last:cut]).hexdigest())
            last = cut

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    per_doc: dict[int, set] = {}
    freq: dict[str, int] = {}
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        cs = chunks(text.encode("utf-8"))
        if not cs:
            continue
        per_doc[doc_id] = cs
        for c in cs:
            freq[c] = freq.get(c, 0) + 1
    rows = []
    for doc_id, cs in per_doc.items():
        total = len(cs)
        dup = sum(1 for c in cs if freq[c] >= 2)
        rows.append(
            (doc_id, total, dup, (2 * 10_000 * dup + total) // (2 * total) / 1e4)
        )
    return pd.DataFrame(
        rows, columns=["doc_id", "n_chunks", "n_dup_chunks", "dup_frac"]
    ).astype({"doc_id": "int64", "n_chunks": "int64", "n_dup_chunks": "int64"})


def oracle_emb_pca(sf_dir: str) -> pd.DataFrame:
    """Single-process PCA (contract pinned in pipelines/simops.emb_pca):
    int-fix components as round(x * 2^16) int64, form the EXACT integer
    scatter matrix n*M - s*sT in Python ints, divide once into float64,
    top-8 eigenvalues of np.linalg.eigvalsh (descending) and
    explained-variance ratios, both rounded to 8 dp with np.round."""
    import numpy as np

    tbl = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    emb = np.array(tbl.column("embedding").to_pylist(), dtype=np.float64)
    x = np.rint(emb * 65536).astype(np.int64)
    n, d = x.shape
    m = x.T @ x
    s = x.sum(axis=0, dtype=np.int64)
    denom = float(n) * float(n) * float(65536) * float(65536)
    cov = np.array(
        [
            [
                float(n * int(m[i][j]) - int(s[i]) * int(s[j])) / denom
                for j in range(d)
            ]
            for i in range(d)
        ],
        dtype=np.float64,
    )
    ev = np.linalg.eigvalsh(cov)[::-1][:8]
    trace = float(np.trace(cov))
    return pd.DataFrame(
        {
            "component": np.arange(1, len(ev) + 1, dtype=np.int64),
            "eigenvalue": np.round(ev, 8),
            "explained_ratio": np.round(ev / trace, 8),
        }
    )


def oracle_docs_bpe_encode(sf_dir: str) -> pd.DataFrame:
    """Single-process BPE application (Sennrich et al. 2016 apply_bpe,
    contract pinned in pipelines/qualityops.docs_bpe_encode): learn the
    merge table with the plain-Python loop above, then encode every word —
    characters, merges applied in learned order, each left-to-right
    non-overlapping.  Per doc: word count, subword count, first 8 subwords
    space-joined."""
    merges_df = oracle_docs_bpe_train(sf_dir)
    ops = list(zip(merges_df["left"], merges_df["right"]))
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    cache: dict[str, list[str]] = {}

    def enc(word: str) -> list[str]:
        if word in cache:
            return cache[word]
        syms = list(word)
        for la, rb in ops:
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == rb:
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        cache[word] = syms
        return syms

    doc_ids, n_words, n_subwords, heads = [], [], [], []
    for doc_id, text in zip(
        tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist()
    ):
        words = _tokens(text)
        total, head = 0, []
        for w in words:
            s = enc(w)
            total += len(s)
            if len(head) < 8:
                head.extend(s[: 8 - len(head)])
        doc_ids.append(doc_id)
        n_words.append(len(words))
        n_subwords.append(total)
        heads.append(" ".join(head))
    return pd.DataFrame(
        {
            "doc_id": doc_ids,
            "n_words": n_words,
            "n_subwords": n_subwords,
            "head_subwords": heads,
        }
    )


def oracle_crawl_warc_source(corpus: str) -> pd.DataFrame:
    """Independent mirror of the WARC round-trip rollup: digests every page
    straight FROM THE PARQUET PARTITIONS (never touching the .warc.gz
    shards), so a hash match proves the engine's warc_mirror → read_warc
    path reproduced every (url, warc_ts, html) byte-exactly."""
    import glob
    from urllib.parse import urlsplit

    rows = []
    for f in sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet"))):
        t = pq.read_table(f, columns=["url", "warc_ts", "html"])
        ts_us = t["warc_ts"].cast("int64").to_pylist()
        for u, s, h in zip(t["url"].to_pylist(), ts_us, t["html"].to_pylist()):
            dig = int.from_bytes(
                hashlib.sha1(
                    u.encode() + b"|" + str(s).encode() + b"|" + h
                ).digest()[:4],
                "big",
            )
            rows.append((urlsplit(u).netloc, 1, len(h), dig))
    return (
        pd.DataFrame(rows, columns=["host", "n_pages", "html_bytes", "digest_sum"])
        .groupby("host", as_index=False)
        .sum()
        .sort_values("host")
        .reset_index(drop=True)
        .astype({"n_pages": "int64", "html_bytes": "int64", "digest_sum": "int64"})
    )


def oracle_crawl_url_templates(corpus: str) -> pd.DataFrame:
    """Independent mirror of the URL-template trap miner: urlsplit + plain
    ``re`` per URL (the pipeline uses one pandas extract + two vectorized
    str.replace passes over the whole column) with a Counter rollup."""
    import glob
    from collections import Counter
    from urllib.parse import urlsplit

    from scrapy__ray.pipelines.crawlq import _TRAP_MIN_URLS

    counts: Counter = Counter()
    for f in sorted(glob.glob(os.path.join(corpus, "pages", "*.parquet"))):
        for u in pq.read_table(f, columns=["url"]).column("url").to_pylist():
            sp = urlsplit(u)
            rest = sp.path
            if sp.query:
                rest += "?" + sp.query
            if sp.fragment:
                rest += "#" + sp.fragment
            rest = re.sub(r"=[^&#]*", "=", rest)
            rest = re.sub(r"\d+", "{d}", rest)
            counts[(sp.netloc, rest)] += 1
    return (
        pd.DataFrame(
            [(h, t, n) for (h, t), n in counts.items() if n >= _TRAP_MIN_URLS],
            columns=["host", "template", "n_urls"],
        )
        .sort_values(["host", "template"])
        .reset_index(drop=True)
        .astype({"n_urls": "int64"})
    )


# ----------------------------------------------------- media (BMP) family
# Independent byte-level mirrors of pipelines/mediaops.py: struct/bytes
# parsing with Python-int arithmetic (the engine decodes with numpy), the
# same pinned contracts (floor-rule NN resize, *10^4 int-fixed means,
# gray*64 >= sum ahash threshold, blake2b projection stream).  The BMP
# mirror parquet itself is shared INPUT (sources/media.py), not an oracle
# surface.


def _odecode_bmp(data: bytes) -> list[list[tuple[int, int, int]]]:
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = int.from_bytes(data[10:14], "little")
    w = int.from_bytes(data[18:22], "little", signed=True)
    h = int.from_bytes(data[22:26], "little", signed=True)
    bpp = int.from_bytes(data[28:30], "little")
    if bpp != 24 or h <= 0:
        raise ValueError("unsupported BMP")
    row = w * 3
    stride = row + ((-row) % 4)
    px: list[list[tuple[int, int, int]]] = []
    for y in range(h - 1, -1, -1):  # bottom-up storage -> top-first rows
        base = off + y * stride
        px.append(
            [
                (data[base + 3 * x + 2], data[base + 3 * x + 1], data[base + 3 * x])
                for x in range(w)
            ]
        )
    return px


def _onn_resize(px: list, side: int) -> list:
    h, w = len(px), len(px[0])
    return [
        [px[(i * h) // side][(j * w) // side] for j in range(side)]
        for i in range(side)
    ]


def _omedia_rows(sf_dir: str):
    from scrapy__ray.sources.media import media_mirror

    t = pq.read_table(media_mirror(sf_dir), columns=["doc_id", "image"])
    return list(zip(t["doc_id"].to_pylist(), t["image"].to_pylist()))


def oracle_media_bmp_stats(sf_dir: str) -> pd.DataFrame:
    rows = []
    for did, data in _omedia_rows(sf_dir):
        px = _odecode_bmp(data)
        h, w = len(px), len(px[0])
        n = h * w
        rs = sum(p[0] for r in px for p in r)
        gs = sum(p[1] for r in px for p in r)
        bs = sum(p[2] for r in px for p in r)
        rows.append(
            (did, w, h, rs * 10**4 // n, gs * 10**4 // n, bs * 10**4 // n)
        )
    return pd.DataFrame(
        rows,
        columns=["doc_id", "width", "height", "r_mean_fix", "g_mean_fix", "b_mean_fix"],
    ).sort_values("doc_id").reset_index(drop=True)


def _oproj_matrix() -> list[list[int]]:
    import hashlib as _hl

    n = 16 * 16 * 3
    cols = []
    for c in range(8):
        buf = b""
        while len(buf) < n:
            buf += _hl.blake2b(
                f"mediaproj-{c}-{len(buf)}".encode(), digest_size=64
            ).digest()
        cols.append([buf[i] % 7 - 3 for i in range(n)])
    return cols  # 8 columns of length 768


def oracle_media_resize_embed(sf_dir: str) -> pd.DataFrame:
    P = _oproj_matrix()
    rows = []
    for did, data in _omedia_rows(sf_dir):
        small = _onn_resize(_odecode_bmp(data), 16)
        flat = [v for r in small for p in r for v in p]  # row-major RGB
        rows.append([did] + [sum(f * pc for f, pc in zip(flat, P[c])) for c in range(8)])
    return pd.DataFrame(
        rows, columns=["doc_id"] + [f"e{c}" for c in range(8)]
    ).sort_values("doc_id").reset_index(drop=True)


def oracle_media_ahash_dups(sf_dir: str) -> pd.DataFrame:
    groups: dict[str, list[int]] = {}
    for did, data in _omedia_rows(sf_dir):
        # shared oracle ahash kernel (_oahash) — one definition for the
        # image-dedup and video oracles
        groups.setdefault(f"{_oahash(_odecode_bmp(data)):016x}", []).append(did)
    rows = []
    for hx, ids in groups.items():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append((ids[i], ids[j], hx))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "ahash"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )


def _odecode_png(data: bytes) -> list[list[tuple[int, ...]]]:
    """Independent PNG decoder: pure-Python ints + stdlib zlib, the five
    spec filters reconstructed scalar-at-a-time exactly as ISO/IEC 15948
    §9 writes them (the engine decodes with numpy row vectors).  Returns
    top-first rows of (r, g, b) or (r, g, b, a) tuples."""
    import zlib as _z

    if data[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG")
    off, w, h, nch = 8, -1, -1, -1
    idat = b""
    while off < len(data):
        ln = int.from_bytes(data[off : off + 4], "big")
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        if (
            int.from_bytes(data[off + 8 + ln : off + 12 + ln], "big")
            != _z.crc32(tag + payload) & 0xFFFFFFFF
        ):
            raise ValueError("PNG CRC mismatch")
        if tag == b"IHDR":
            w = int.from_bytes(payload[0:4], "big")
            h = int.from_bytes(payload[4:8], "big")
            if payload[8] != 8 or payload[9] not in (2, 6) or any(payload[10:13]):
                raise ValueError("unsupported PNG")
            nch = 3 if payload[9] == 2 else 4
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        off += 12 + ln
    raw = _z.decompress(idat)
    stride = 1 + w * nch
    rows: list[list[int]] = []
    prior = [0] * (w * nch)
    for y in range(h):
        line = raw[y * stride : (y + 1) * stride]
        ft, filt = line[0], list(line[1:])
        recon = [0] * (w * nch)
        for i in range(w * nch):
            a = recon[i - nch] if i >= nch else 0  # left
            b = prior[i]  # up
            c = prior[i - nch] if i >= nch else 0  # up-left
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) // 2
            elif ft == 4:
                p = a + b - c
                pa_, pb, pcc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa_ <= pb and pa_ <= pcc) else (b if pb <= pcc else c)
            else:
                raise ValueError("bad filter")
            recon[i] = (filt[i] + pred) % 256
        rows.append(recon)
        prior = recon
    return [
        [tuple(r[x * nch : (x + 1) * nch]) for x in range(w)] for r in rows
    ]


def _opng_rows(sf_dir: str):
    from scrapy__ray.sources.media import png_mirror

    t = pq.read_table(png_mirror(sf_dir), columns=["doc_id", "image"])
    return list(zip(t["doc_id"].to_pylist(), t["image"].to_pylist()))


def oracle_media_png_stats(sf_dir: str) -> pd.DataFrame:
    rows = []
    for did, data in _opng_rows(sf_dir):
        px = _odecode_png(data)
        h, w, c = len(px), len(px[0]), len(px[0][0])
        n = h * w
        sums = [sum(p[ch] for r in px for p in r) for ch in range(c)]
        rows.append(
            (
                did, w, h, c,
                sums[0] * 10**4 // n, sums[1] * 10**4 // n,
                sums[2] * 10**4 // n,
                sums[3] * 10**4 // n if c == 4 else -1,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "doc_id", "width", "height", "channels",
            "r_mean_fix", "g_mean_fix", "b_mean_fix", "a_mean_fix",
        ],
    ).sort_values("doc_id").reset_index(drop=True)


def _opng_rgb(data: bytes) -> list[list[tuple[int, int, int]]]:
    """Alpha dropped — the pinned image_decode_rgb contract."""
    return [[p[:3] for p in r] for r in _odecode_png(data)]


def oracle_media_png_resize_embed(sf_dir: str) -> pd.DataFrame:
    P = _oproj_matrix()
    rows = []
    for did, data in _opng_rows(sf_dir):
        small = _onn_resize(_opng_rgb(data), 16)
        flat = [v for r in small for p in r for v in p]
        rows.append(
            [did] + [sum(f * pc for f, pc in zip(flat, P[c])) for c in range(8)]
        )
    return pd.DataFrame(
        rows, columns=["doc_id"] + [f"e{c}" for c in range(8)]
    ).sort_values("doc_id").reset_index(drop=True)


def oracle_media_png_ahash_dups(sf_dir: str) -> pd.DataFrame:
    groups: dict[str, list[int]] = {}
    for did, data in _opng_rows(sf_dir):
        groups.setdefault(f"{_oahash(_opng_rgb(data)):016x}", []).append(did)
    rows = []
    for hx, ids in groups.items():
        ids = sorted(ids)
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                rows.append((ids[i], ids[j], hx))
    return (
        pd.DataFrame(rows, columns=["doc_a", "doc_b", "ahash"])
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
        .astype({"doc_a": "int64", "doc_b": "int64"})
    )


def _odecode_wav(data: bytes) -> tuple[list[int], int]:
    """Independent canonical-PCM-WAV parser: int.from_bytes per sample,
    Python ints throughout (the engine decodes with numpy)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    rate = int.from_bytes(data[24:28], "little")
    bits = int.from_bytes(data[34:36], "little")
    if bits != 16 or data[36:40] != b"data":
        raise ValueError("unsupported WAV")
    n = int.from_bytes(data[40:44], "little")
    samples = [
        int.from_bytes(data[44 + 2 * i:46 + 2 * i], "little", signed=True)
        for i in range(n // 2)
    ]
    return samples, rate


def _oaudio_rows(sf_dir: str):
    from scrapy__ray.sources.media import audio_mirror

    t = pq.read_table(audio_mirror(sf_dir), columns=["doc_id", "audio"])
    return list(zip(t["doc_id"].to_pylist(), t["audio"].to_pylist()))


def oracle_media_wav_stats(sf_dir: str) -> pd.DataFrame:
    rows = []
    for did, data in _oaudio_rows(sf_dir):
        s, rate = _odecode_wav(data)
        energy = sum(v * v for v in s) // len(s)
        zc = sum(1 for a, b in zip(s, s[1:]) if (a < 0) != (b < 0))
        rows.append((did, rate, len(s), energy, zc))
    return pd.DataFrame(
        rows,
        columns=["doc_id", "sample_rate", "n_samples", "energy_fix", "zero_cross"],
    ).sort_values("doc_id").reset_index(drop=True)


def oracle_media_wav_framesample(sf_dir: str) -> pd.DataFrame:
    rows = []
    for did, data in _oaudio_rows(sf_dir):
        s, _rate = _odecode_wav(data)
        frames = []
        fi = 0
        for start in range(0, len(s) - 200 + 1, 400):
            w = s[start:start + 200]
            frames.append((sum(v * v for v in w), fi))
            fi += 1
        frames.sort(key=lambda e: (-e[0], e[1]))
        for en, idx in frames[:3]:
            rows.append((did, idx, en))
    return (
        pd.DataFrame(rows, columns=["doc_id", "frame_idx", "energy"])
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "frame_idx": "int64", "energy": "int64"})
    )


def oracle_emb_mmr_select(sf_dir: str) -> pd.DataFrame:
    """Independent MMR mirror (contract pinned in simops._mmr_rerank):
    full-table scan, per-pair np.dot similarities (vs the engine's block
    matmuls), the same 6dp half-away-from-zero quantization to ints
    BEFORE any comparison, integer 7*rel - 3*maxsim scores, vec_id
    tie-break."""
    import numpy as _np

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    ids = _np.asarray(t["vec_id"].to_pylist(), dtype=_np.int64)
    emb = _np.array(t["embedding"].to_pylist(), dtype=_np.float64)
    q = emb[_np.nonzero(ids == 0)[0][0]]
    qn = q / _np.sqrt(float(_np.dot(q, q)))

    def fix6(x: float) -> int:
        s = -1 if x < 0 else 1
        return s * int(abs(x) * 10**6 + 0.5)

    keep = ids != 0
    ids, emb = ids[keep], emb[keep]
    rel = []
    for v in emb:
        nv = _np.sqrt(float(_np.dot(v, v))) or 1.0
        rel.append(fix6(float(_np.dot(v, qn)) / nv))
    rel = _np.asarray(rel, dtype=_np.int64)
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))[:200]
    pids = ids[order]
    prel = rel[order]
    unit = []
    for i in order:
        nv = _np.sqrt(float(_np.dot(emb[i], emb[i]))) or 1.0
        unit.append(emb[i] / nv)
    n = len(pids)
    taken = [False] * n
    max_sim = [0] * n
    rows = []
    for rank in range(1, min(20, n) + 1):
        best = None
        for i in range(n):
            if taken[i]:
                continue
            sc = 7 * int(prel[i]) - 3 * max_sim[i]
            if best is None or (sc, -int(pids[i])) > (best[1], -int(pids[best[0]])):
                best = (i, sc)
        i, sc = best
        rows.append((rank, int(pids[i]), sc))
        taken[i] = True
        for j in range(n):
            s = fix6(float(_np.dot(unit[j], unit[i])))
            if s > max_sim[j]:
                max_sim[j] = s
    return pd.DataFrame(rows, columns=["rank", "vec_id", "mmr_fix"]).astype(
        {"rank": "int64", "vec_id": "int64", "mmr_fix": "int64"}
    )


def _oahash(px: list) -> int:
    """Independent average-hash (list-of-rows pixels, Python ints)."""
    small = _onn_resize(px, 8)
    gray = [p[0] * 299 + p[1] * 587 + p[2] * 114 for r in small for p in r]
    total = sum(gray)
    bits = 0
    for g in gray:
        bits = (bits << 1) | (1 if g * 64 >= total else 0)
    return bits


def _odecode_video(data: bytes) -> list:
    if data[:4] != b"VID0":
        raise ValueError("not VID0")
    n = int.from_bytes(data[4:8], "little")
    off = 8
    frames = []
    for _ in range(n):
        ln = int.from_bytes(data[off:off + 4], "little")
        off += 4
        frames.append(_odecode_bmp(data[off:off + ln]))
        off += ln
    return frames


def _ovideo_rows(sf_dir: str):
    from scrapy__ray.sources.media import video_mirror

    t = pq.read_table(video_mirror(sf_dir), columns=["doc_id", "video"])
    return list(zip(t["doc_id"].to_pylist(), t["video"].to_pylist()))


def oracle_media_video_framesample(sf_dir: str) -> pd.DataFrame:
    rows = []
    for did, data in _ovideo_rows(sf_dir):
        hashes = [_oahash(f) for f in _odecode_video(data)]
        for fi in range(0, len(hashes), 4):
            rows.append((did, fi, f"{hashes[fi]:016x}"))
    return (
        pd.DataFrame(rows, columns=["doc_id", "frame_idx", "ahash"])
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "frame_idx": "int64", "ahash": "string"})
    )


def oracle_media_video_shot_changes(sf_dir: str) -> pd.DataFrame:
    rows = []
    for did, data in _ovideo_rows(sf_dir):
        hashes = [_oahash(f) for f in _odecode_video(data)]
        for fi in range(1, len(hashes)):
            d = bin(hashes[fi] ^ hashes[fi - 1]).count("1")
            if d >= 8:
                rows.append((did, fi, d))
    return (
        pd.DataFrame(rows, columns=["doc_id", "frame_idx", "hamming"])
        .sort_values(["doc_id", "frame_idx"])
        .reset_index(drop=True)
        .astype({"doc_id": "int64", "frame_idx": "int64", "hamming": "int64"})
    )


_SF_ORACLES = {
    "emb_mmr_select": oracle_emb_mmr_select,
    "media_bmp_stats": oracle_media_bmp_stats,
    "media_resize_embed": oracle_media_resize_embed,
    "media_ahash_dups": oracle_media_ahash_dups,
    "media_png_stats": oracle_media_png_stats,
    "media_png_resize_embed": oracle_media_png_resize_embed,
    "media_png_ahash_dups": oracle_media_png_ahash_dups,
    "media_wav_stats": oracle_media_wav_stats,
    "media_wav_framesample": oracle_media_wav_framesample,
    "media_video_framesample": oracle_media_video_framesample,
    "media_video_shot_changes": oracle_media_video_shot_changes,
    "docs_simhash": oracle_docs_simhash,
    "docs_simhash_dups": oracle_docs_simhash_dups,
    "docs_langid": oracle_docs_langid,
    "docs_rolling_fingerprint": oracle_docs_rolling_fingerprint,
    "docs_minhash_lsh": oracle_docs_minhash_lsh,
    "docs_dup_clusters_minhash": oracle_docs_dup_clusters_minhash,
    "emb_kmeans": oracle_emb_kmeans,
    "emb_ivf_topk": oracle_emb_ivf_topk,
    "emb_cosine_dups_bucketed": oracle_emb_cosine_dups_bucketed,
    "emb_srp_lsh_dups": oracle_emb_srp_lsh_dups,
    "emb_semdedup": oracle_emb_semdedup,
    "emb_pq_topk": oracle_emb_pq_topk,
    "docs_winnow_dups": oracle_docs_winnow_dups,
    "emb_ivfpq_topk": oracle_emb_ivfpq_topk,
    "events_approx_users": oracle_events_approx_users,
    "events_approx_users_by_type": oracle_events_approx_users_by_type,
    "docs_importance_weights": oracle_docs_importance_weights,
    "docs_lm_quality": oracle_docs_lm_quality,
    "events_heavy_hitters": oracle_events_heavy_hitters,
    "docs_bpe_train": oracle_docs_bpe_train,
    "docs_bpe_encode": oracle_docs_bpe_encode,
    "emb_pca": oracle_emb_pca,
    "docs_cdc_dups": oracle_docs_cdc_dups,
    "emb_sq_topk": oracle_emb_sq_topk,
    "docs_importance_sample": oracle_docs_importance_sample,
    "docs_edit_dups": oracle_docs_edit_dups,
    "emb_centroid_outliers": oracle_emb_centroid_outliers,
}

_cache: dict[str, dict[str, str]] = {}


def materialize(sf_dir: str) -> dict[str, str]:
    """Compute every materialized oracle for ``sf_dir`` (crawl oracles are
    sf-independent — they run on the pinned fixture corpus), write each to
    parquet under /tmp, and return {query_name: parquet_path}.  Cached per
    process: the driver calls oracle_sql() once, the tests once per session.
    """
    if sf_dir in _cache:
        return _cache[sf_dir]
    tag = sf_dir.strip("/").replace("/", "_")
    out_dir = f"/tmp/oracle_ext/{tag}"
    os.makedirs(out_dir, exist_ok=True)

    def write(name: str, df: pd.DataFrame) -> str:
        # atomic publish: a concurrent process (pytest collection + the
        # driver share this fixed path) must never read a half-written file
        path = f"{out_dir}/{name}.parquet"
        tmp = f"{path}.tmp-{os.getpid()}"
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
        os.replace(tmp, path)
        return path

    paths: dict[str, str] = {}
    for name, fn in _SF_ORACLES.items():
        paths[name] = write(name, fn(sf_dir))
    res, corpus = _oracle_crawl()
    for name, df in (
        ("crawl_fetch_log", oracle_crawl_fetch_log(res)),
        ("crawl_metrics", oracle_crawl_metrics(res)),
        ("crawl_host_summary", oracle_crawl_host_summary(res)),
        ("crawl_extract_identity", oracle_crawl_extract_identity(corpus)),
        ("crawl_css_extract", oracle_crawl_css_extract(corpus)),
        # the xpath query extracts the same targets through a different
        # engine; the regex oracle is independent of both
        ("crawl_xpath_extract", oracle_crawl_css_extract(corpus)),
        ("crawl_inlinks", oracle_crawl_inlinks(corpus)),
        ("crawl_pagerank", oracle_crawl_pagerank(corpus)),
        ("crawl_hits", oracle_crawl_hits(corpus)),
        ("crawl_triangles", oracle_crawl_triangles(corpus)),
        ("crawl_components", oracle_crawl_components(corpus)),
        ("crawl_hyperball", oracle_crawl_hyperball(corpus)),
        ("crawl_kcore", oracle_crawl_kcore(corpus)),
        ("crawl_clustering_coef", oracle_crawl_clustering_coef(corpus)),
        ("crawl_domain_graph", oracle_crawl_domain_graph(corpus)),
        ("crawl_seed_distance", oracle_crawl_seed_distance(corpus)),
        ("crawl_main_content", oracle_crawl_main_content(corpus)),
        ("crawl_paragraph_dedup", oracle_crawl_paragraph_dedup(corpus)),
        ("crawl_anchor_text", oracle_crawl_anchor_text(corpus)),
        ("crawl_warc_source", oracle_crawl_warc_source(corpus)),
        ("crawl_url_templates", oracle_crawl_url_templates(corpus)),
    ):
        paths[name] = write(name, df)
    _cache[sf_dir] = paths
    return paths


def oracle_sql_ext(sf_dir: str | None = None) -> dict[str, str]:
    """SQL oracles for the materialized set: plain reads of the expected
    parquet, runnable by any DuckDB connection regardless of view setup.

    Scale contract: ``oracle_sql()`` takes no sf_dir by driver design, so
    the expected rows are materialized for the scale the driver evaluates
    correctness at — sf0.01 per the harness spec (override with
    GRAFT_ORACLE_SF_DIR if a different harness evaluates elsewhere).  The
    crawl_* oracles are sf-independent (pinned fixture corpus)."""
    sf_dir = sf_dir or os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    return {
        name: f"SELECT * FROM read_parquet('{path}')"
        for name, path in materialize(sf_dir).items()
    }
