"""Crawl-engine queries for the driver's correctness harness.

These run the flagship crawl (the capability the reference repo exists for)
over the deterministic fixture corpus (FIXTURES.md) — NOT over the TPC-H-ish
``sf_dir`` tables, because the crawl's input is the Common-Crawl-style
``pages`` table that BASELINE.json's input_hint mandates and FIXTURES.md
synthesizes.  They are deterministic (seed 42 end-to-end) but not
SQL-expressible, so the driver records the weaker rows-only check; the REAL
correctness gate for the crawl is tests/test_crawl_equivalence.py's
engine-vs-oracle comparison (seen set, order, text bytes, metrics).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

import fixtures.gen as fxgen
from scrapy__ray.config import CrawlConfig


def _corpus() -> str:
    return fxgen.generate("sf-small", fxgen.default_dir("sf-small"))


_CRAWL_MEMO: dict[tuple, object] = {}


def _pinned_crawl():
    """Run the pinned-config crawl once per process and reuse its output:
    crawl_fetch_log / crawl_metrics / crawl_host_summary all analyze the
    SAME deterministic run, so re-crawling per query would triple the
    driver's correctness wall for identical bytes."""
    from scrapy__ray.engine import crawl

    corpus = _corpus()
    key = (corpus,)
    if key not in _CRAWL_MEMO:
        out = "/tmp/crawl_out/q-pinned"
        _CRAWL_MEMO[key] = (crawl(corpus, out, cfg=CrawlConfig()), out)
    return _CRAWL_MEMO[key]


def crawl_fetch_log(sf_dir: str) -> pd.DataFrame:
    """Full pinned-config crawl; returns the fetch log (url, round, host,
    fetch_seq_in_host, status, depth) — the crawl-ordering artifact."""
    _summary, out = _pinned_crawl()
    res = pq.read_table(
        out + "/results",
        columns=["url", "round", "host", "fetch_seq_in_host", "status", "depth"],
    )
    return res.to_pandas().sort_values(["round", "host", "fetch_seq_in_host"]).reset_index(drop=True)


def crawl_extract_identity(sf_dir: str):
    """Byte-identity of the extract stage over the whole corpus: Dataset ->
    map_batches(extract) -> per-url match flag vs the oracle text column."""
    import ray.data as rd

    from scrapy__ray.functions.textextract import extract_text

    corpus = _corpus()
    ds = rd.read_parquet(corpus + "/pages", columns=["url", "html", "text"])

    def check(t: pa.Table) -> pa.Table:
        ok = [
            extract_text(h) == x
            for h, x in zip(t["html"].to_pylist(), t["text"].to_pylist())
        ]
        return pa.table(
            {
                "url": t["url"],
                "text_matches": pa.array(ok, pa.bool_()),
            }
        )

    return ds.map_batches(check, batch_format="pyarrow")


def crawl_metrics(sf_dir: str) -> pd.DataFrame:
    """Per-round crawl metrics table (fetched/deduped/deferred/... per round)."""
    summary, _out = _pinned_crawl()
    return pd.DataFrame(summary.round_metrics)


def crawl_host_summary(sf_dir: str):
    """Analytics over the engine's own output: per-host fetch counts,
    status mix, mean depth and text volume — a Ray Data pipeline reading
    the partitioned results parquet the crawl just wrote (the
    'resumable-output-as-a-table' contract)."""
    import numpy as np
    import ray.data as rd

    from scrapy__ray.pipelines.util import collect_arrow, ensure_ctx, shuffle_agg

    _summary, out = _pinned_crawl()
    ensure_ctx()  # BEFORE read_parquet: the dataset captures its DataContext
    ds = rd.read_parquet(
        out + "/results",
        columns=["host", "status", "depth", "extracted_text"],
    )

    def partial(df):
        df = df.assign(
            ok=(df["status"] == 200).astype("int64"),
            err=(df["status"] != 200).astype("int64"),
            text_chars=df["extracted_text"].fillna("").str.len().astype("int64"),
        )
        return (
            df.groupby("host", as_index=False)
            .agg(
                n_fetches=("status", "size"), n_ok=("ok", "sum"),
                n_err=("err", "sum"), depth_sum=("depth", "sum"),
                text_chars=("text_chars", "sum"),
            )
        )

    def final(df):
        g = df.groupby("host", as_index=False).sum()
        g["mean_depth"] = np.round(g["depth_sum"] / g["n_fetches"], 3)
        return g.drop(columns="depth_sum")

    # host cardinality is unbounded at the 10^8-host design point, so this
    # rollup takes the hash-shuffle path (partial per block -> shuffle by
    # host -> vectorized final), never a driver-side concat (round-1 finding)
    res = collect_arrow(
        shuffle_agg(ds, ["host"], partial, final),
        pa.schema(
            [
                ("host", pa.string()),
                ("n_fetches", pa.int64()),
                ("n_ok", pa.int64()),
                ("n_err", pa.int64()),
                ("text_chars", pa.int64()),
                ("mean_depth", pa.float64()),
            ]
        ),
    )
    return (
        pa.Table.from_pandas(
            res.to_pandas().sort_values("host").reset_index(drop=True),
            preserve_index=False,
        )
    )


def crawl_css_extract(sf_dir: str):
    """CSS-subset selector pipeline (SURVEY.md P3) over the corpus pages:
    per page, ``title::text``, ``h1::text``, ``li > a::attr(href)`` and the
    first ``p::text`` — the parsel/`response.css` surface re-expressed as a
    vectorizable map_batches stage.  Oracle: an INDEPENDENT regex+unescape
    extraction (oracle_ext.oracle_crawl_css_extract) materialized to
    parquet; the byte-level vector gate is tests/test_cssselect.py."""
    import ray.data as rd

    from scrapy__ray.functions.cssselect import css_extract, parse_dom

    corpus = _corpus()
    # column-pruned read, plus the content_encoding sidecar when the gzip
    # corpus variant carries one (schema peek on parquet metadata is free)
    names = rd.read_parquet(corpus + "/pages").schema().names
    cols = ["url", "html"] + (
        ["content_encoding"] if "content_encoding" in names else []
    )
    ds = rd.read_parquet(corpus + "/pages", columns=cols)

    def sel(t: pa.Table) -> pa.Table:
        import gzip as _gzip

        htmls = t["html"].to_pylist()
        if "content_encoding" in t.schema.names:
            # M6 transport-level gzip: decode before parsing, exactly as
            # the download path does (oracle side mirrors this)
            htmls = [
                _gzip.decompress(h) if enc == "gzip" else h
                for h, enc in zip(htmls, t["content_encoding"].to_pylist())
            ]
        titles, h1s, n_a, anchors, paras = [], [], [], [], []
        for html in htmls:
            dom = parse_dom(html)
            ti = css_extract(dom, "title::text")
            h1 = css_extract(dom, "h1::text")
            hrefs = css_extract(dom, "li > a::attr(href)")
            ps = css_extract(dom, "p::text")
            titles.append(ti[0] if ti else "")
            h1s.append(h1[0] if h1 else "")
            n_a.append(len(hrefs))
            anchors.append("\n".join(hrefs))
            paras.append(ps[0] if ps else "")
        return pa.table(
            {
                "url": t["url"],
                "title": pa.array(titles, pa.string()),
                "h1": pa.array(h1s, pa.string()),
                "n_anchors": pa.array(n_a, pa.int64()),
                "anchors": pa.array(anchors, pa.string()),
                "first_para": pa.array(paras, pa.string()),
            }
        )

    return ds.map_batches(sel, batch_format="pyarrow")


def crawl_xpath_extract(sf_dir: str):
    """XPath-subset selector pipeline (SURVEY.md P3, the `response.xpath`
    surface) over the corpus pages — the same extraction targets as
    crawl_css_extract but through the left-to-right XPath evaluator
    (functions/xpath.py), a genuinely different algorithm from both the
    CSS matcher and the regex oracle.  Oracle: the same INDEPENDENT
    regex+unescape extraction, materialized under this query's name."""
    import ray.data as rd

    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_extract

    corpus = _corpus()
    names = rd.read_parquet(corpus + "/pages").schema().names
    cols = ["url", "html"] + (
        ["content_encoding"] if "content_encoding" in names else []
    )
    ds = rd.read_parquet(corpus + "/pages", columns=cols)

    def sel(t: pa.Table) -> pa.Table:
        import gzip as _gzip

        htmls = t["html"].to_pylist()
        if "content_encoding" in t.schema.names:
            htmls = [
                _gzip.decompress(h) if enc == "gzip" else h
                for h, enc in zip(htmls, t["content_encoding"].to_pylist())
            ]
        titles, h1s, n_a, anchors, paras = [], [], [], [], []
        for html in htmls:
            dom = parse_dom(html)
            ti = xpath_extract(dom, "//title")
            h1 = xpath_extract(dom, "//h1")
            hrefs = xpath_extract(dom, "//li/a/@href")
            ps = xpath_extract(dom, "//p")
            titles.append(ti[0] if ti else "")
            h1s.append(h1[0] if h1 else "")
            n_a.append(len(hrefs))
            anchors.append("\n".join(hrefs))
            paras.append(ps[0] if ps else "")
        return pa.table(
            {
                "url": t["url"],
                "title": pa.array(titles, pa.string()),
                "h1": pa.array(h1s, pa.string()),
                "n_anchors": pa.array(n_a, pa.int64()),
                "anchors": pa.array(anchors, pa.string()),
                "first_para": pa.array(paras, pa.string()),
            }
        )

    return ds.map_batches(sel, batch_format="pyarrow")


QUERIES = {
    "crawl_fetch_log": (crawl_fetch_log, None),
    "crawl_extract_identity": (crawl_extract_identity, None),
    "crawl_metrics": (crawl_metrics, None),
    "crawl_host_summary": (crawl_host_summary, None),
    "crawl_css_extract": (crawl_css_extract, None),
    "crawl_xpath_extract": (crawl_xpath_extract, None),
}
