"""Link-graph operators: the forced >threshold PageRank regime.

The broadcast regime (and crawl_inlinks) are covered by the driver-mimic
suite against the materialized oracles; this forces the distributed
score-dataset regime (shuffle_join per iteration, zero-partial union
update) and asserts it is bit-identical to the oracle — the same
both-paths-identical contract as pipelines/dedup.py.
"""

from __future__ import annotations

import pandas as pd
import pytest


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_pagerank_distributed_regime_matches_oracle(ray_session, monkeypatch):
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_pagerank

    monkeypatch.setattr(cq, "_PR_BROADCAST_MAX", 0)
    r = cq.crawl_pagerank("unused")
    mine = _canon(r.to_pandas() if not isinstance(r, pd.DataFrame) else r)
    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_pagerank(corpus))
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)


def test_hits_distributed_regime_matches_oracle(ray_session, monkeypatch):
    """Force the >threshold HITS regime (score Dataset, shuffle_join relay
    per half-iteration, zero-partial union carrying the idle vector) and
    assert it is bit-identical to the independent single-process oracle —
    which the broadcast regime already matches via the driver-mimic suite,
    so transitively both engine regimes agree."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_hits

    monkeypatch.setattr(cq, "_PR_BROADCAST_MAX", 0)
    r = cq.crawl_hits("unused")
    mine = _canon(r.to_pandas() if not isinstance(r, pd.DataFrame) else r)
    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_hits(corpus))
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)


def test_triangles_distributed_regime_matches_oracle(ray_session, monkeypatch):
    """Force the >threshold triangles regime (degree attached to both edge
    endpoints via two shuffle_joins — no O(N) rank-map broadcast) and
    assert bit-identity to the independent neighbor-set-intersection
    oracle; the broadcast regime matches it via the driver-mimic suite,
    so transitively both engine regimes agree."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_triangles

    monkeypatch.setattr(cq, "_PR_BROADCAST_MAX", 0)
    r = cq.crawl_triangles("unused")
    mine = _canon(r.to_pandas() if not isinstance(r, pd.DataFrame) else r)
    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_triangles(corpus))
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)


def test_components_both_regimes_match_oracle(ray_session, monkeypatch):
    """crawl_components through BOTH pairs_to_clusters regimes (driver
    union-find and forced min-label propagation) must equal the independent
    union-find oracle — the same both-paths-identical contract as
    pipelines/dedup.py."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    import scrapy__ray.pipelines.dedup as dd
    from scrapy__ray.oracle_ext import oracle_crawl_components

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_components(corpus))

    small = _canon(cq.crawl_components("unused").to_pandas())
    pd.testing.assert_frame_equal(small, theirs, check_dtype=False, check_exact=True)

    monkeypatch.setattr(dd, "_SMALL_PAIRS_THRESHOLD", 0)
    dist = _canon(cq.crawl_components("unused").to_pandas())
    pd.testing.assert_frame_equal(dist, theirs, check_dtype=False, check_exact=True)


def test_seed_distance_small_regime_matches_oracle(ray_session):
    """crawl_seed_distance (default driver-BFS regime) must equal the
    independent deque-BFS oracle on the fixture corpus."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_seed_distance

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_seed_distance(corpus))
    small = _canon(cq.crawl_seed_distance("unused").to_pandas())
    pd.testing.assert_frame_equal(small, theirs, check_dtype=False, check_exact=True)


def test_min_dist_propagate_matches_bfs(ray_session):
    """The distributed BFS kernel (shuffle_join relay + min shuffle_agg +
    per-round lineage severing) on a synthetic multi-round graph: a chain
    forcing ~8 propagation rounds plus a branch, an extra shortcut edge,
    and an unreachable island.  Equal to a driver BFS, and the island must
    stay at the unreach sentinel."""
    import pyarrow as pa
    import ray.data as rd

    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    # chain 0->1->...->8, branch 2->20->21, shortcut 0->5, island 30->31
    edges = [(i, i + 1) for i in range(8)] + [(2, 20), (20, 21), (0, 5), (30, 31)]
    nodes = sorted({u for e in edges for u in e})
    unreach = 999
    e_tbl = pa.table(
        {
            "src": pa.array([f"n{a}" for a, _ in edges], pa.string()),
            "dst": pa.array([f"n{b}" for _, b in edges], pa.string()),
        }
    )
    l_tbl = pa.table(
        {
            "node": pa.array([f"n{u}" for u in nodes], pa.string()),
            "dist": pa.array(
                [0 if u == 0 else unreach for u in nodes], pa.int64()
            ),
        }
    )
    out = cq._min_dist_propagate(
        rd.from_arrow(e_tbl), rd.from_arrow(l_tbl).materialize(), unreach
    )
    got = {
        r["node"]: r["dist"]
        for t in __import__("ray").get(out.materialize().to_arrow_refs())
        for r in t.to_pylist()
    }
    # driver BFS reference
    from collections import deque

    adj: dict = {}
    for a, b in edges:
        adj.setdefault(f"n{a}", []).append(f"n{b}")
    want = {f"n{u}": unreach for u in nodes}
    want["n0"] = 0
    q = deque(["n0"])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if want[v] == unreach:
                want[v] = want[u] + 1
                q.append(v)
    assert got == want


@pytest.mark.slow
def test_seed_distance_distributed_regime_matches_oracle(ray_session, monkeypatch):
    """crawl_seed_distance through the FORCED delta-frontier propagation
    regime on the real fixture corpus (123-hop chain → 124 hop-synchronous
    rounds) must equal the deque-BFS oracle — the same both-paths-identical
    contract as crawl_components.  ~3-4 min at 16 cpus, hence slow-marked;
    the kernel itself is unit-tested fast on a synthetic graph above."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_seed_distance

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_seed_distance(corpus))
    monkeypatch.setattr(cq, "_BFS_SMALL_EDGES", 0)
    dist = _canon(cq.crawl_seed_distance("unused").to_pandas())
    pd.testing.assert_frame_equal(dist, theirs, check_dtype=False, check_exact=True)


def test_kcore_small_regime_matches_oracle(ray_session):
    """crawl_kcore (default driver h-index regime) must equal the
    independent Batagelj–Zaveršnik peeling oracle on the fixture corpus —
    two different algorithms whose agreement is the h-index/coreness
    theorem, not shared code."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_kcore

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_kcore(corpus))
    mine = _canon(cq.crawl_kcore("unused").to_pandas())
    pd.testing.assert_frame_equal(mine, theirs, check_dtype=False, check_exact=True)


def test_kcore_distributed_kernel_both_relays(ray_session, monkeypatch):
    """_kcore_distributed on a synthetic graph with hand-checkable core
    numbers — K4 clique (core 3) glued by a bridge to a triangle (core 2),
    a 6-node path (core 1), and an isolated node (core 0) — through BOTH
    relay regimes (broadcast label vector and forced shuffle_join), each
    equal to the driver fixed point and to the known answer."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    # nodes 0-3: K4; 4-6: triangle; bridge 3-4; 7-12: path; 13: isolated
    edges = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(4, 5), (4, 6), (5, 6), (3, 4)]
        + [(i, i + 1) for i in range(7, 12)]
    )
    want = np.array([3, 3, 3, 3, 2, 2, 2, 1, 1, 1, 1, 1, 1, 0], dtype=np.int64)
    n = 14
    ea = np.array([min(e) for e in edges], dtype=np.int64)
    eb = np.array([max(e) for e in edges], dtype=np.int64)
    pairs = rd.from_arrow(
        pa.table({"ea": pa.array(ea, pa.int64()), "eb": pa.array(eb, pa.int64())})
    ).materialize()

    assert np.array_equal(cq._kcore_driver(n, ea, eb), want)
    got_bcast = cq._kcore_distributed(pairs, n)
    assert np.array_equal(got_bcast, want)
    monkeypatch.setattr(cq, "_KCORE_BROADCAST_LABELS", 0)
    got_join = cq._kcore_distributed(pairs, n)
    assert np.array_equal(got_join, want)


@pytest.mark.slow
def test_kcore_distributed_regime_matches_oracle(ray_session, monkeypatch):
    """crawl_kcore through the FORCED distributed h-index propagation on
    the real fixture corpus.  The 123-hop chain is the h-index worst case
    (labels peel one hop per round from the chain ends → ~62 rounds),
    hence slow-marked; the kernel is unit-tested fast on a synthetic graph
    above."""
    import fixtures.gen as fxgen
    import scrapy__ray.pipelines.crawlq as cq
    from scrapy__ray.oracle_ext import oracle_crawl_kcore

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    theirs = _canon(oracle_crawl_kcore(corpus))
    monkeypatch.setattr(cq, "_KCORE_SMALL_EDGES", 0)
    dist = _canon(cq.crawl_kcore("unused").to_pandas())
    pd.testing.assert_frame_equal(dist, theirs, check_dtype=False, check_exact=True)
