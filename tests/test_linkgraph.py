"""Link-graph operators: the forced >threshold PageRank regime.

The broadcast regime (and crawl_inlinks) are covered by the driver-mimic
suite against the materialized oracles; this forces the distributed
score-dataset regime (shuffle_join per iteration, zero-partial union
update) and asserts it is bit-identical to the oracle — the same
both-paths-identical contract as pipelines/dedup.py.
"""

from __future__ import annotations

import pandas as pd


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
