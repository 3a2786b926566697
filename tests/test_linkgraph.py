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
