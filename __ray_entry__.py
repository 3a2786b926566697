"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship pipeline — the BSP crawl over the
Common-Crawl-style pages corpus that BASELINE.json's input_hint mandates
(synthesized deterministically per FIXTURES.md; the TPC-H-ish sf tables are
not the crawl input).  ``queries()`` exposes every implemented operator
pipeline; SQL-expressible ones have a DuckDB oracle in ``oracle_sql()`` with
IDENTICAL column names; crawl/sketch/approximate ops are rows-only and their
real correctness gate is tests/ (oracle equivalence, byte-identity, resume).

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship: pinned-config crawl on the sf-small fixture corpus ->
    results DataFrame (url, round, host, seq, status, extracted text)."""
    import pandas as pd
    import pyarrow.parquet as pq

    import fixtures.gen as fxgen
    from scrapy__ray.config import CrawlConfig
    from scrapy__ray.engine import crawl

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    out = "/tmp/crawl_out/entry"
    crawl(corpus, out, cfg=CrawlConfig())
    return (
        pq.read_table(out + "/results")
        .to_pandas()
        .sort_values(["round", "host", "fetch_seq_in_host"])
        .reset_index(drop=True)
    )


def _all_queries() -> dict[str, tuple[Callable[[str], Any], str | None]]:
    from scrapy__ray.pipelines import (
        crawlq,
        dedup,
        feedops,
        mediaops,
        qualityops,
        relational,
        simops,
        streamops,
        textops,
        tpch2,
        tpch3,
    )

    out: dict[str, tuple[Callable[[str], Any], str | None]] = {}
    for mod in (
        relational, tpch2, tpch3, textops, qualityops, dedup, feedops, simops,
        streamops, mediaops, crawlq,
    ):
        out.update(mod.QUERIES)
    return out


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """ANSI-SQL oracles for SQL-expressible pipelines, plus materialized
    parquet oracles (SELECT * FROM read_parquet(...)) for the deterministic
    non-SQL ones — computed by scrapy__ray/oracle_ext.py's independent
    single-process reference implementations at call time."""
    from scrapy__ray.oracle_ext import oracle_sql_ext

    out = {
        name: sql for name, (_fn, sql) in _all_queries().items() if sql is not None
    }
    implemented = set(_all_queries())
    for name, sql in oracle_sql_ext().items():
        if name in implemented and name not in out:
            out[name] = sql
    return out
