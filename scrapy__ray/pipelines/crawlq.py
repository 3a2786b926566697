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

import numpy as np
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


def _pages_ds(corpus: str):
    """Column-pruned pages read (url, html) plus the content_encoding
    sidecar when the gzip corpus variant carries one — the schema peek on
    parquet metadata is free.  Single definition: the css/xpath/link-graph
    pipelines must all decode identically."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    # the DataContext is captured at dataset creation: HASH_SHUFFLE must be
    # pinned BEFORE the read exists or a later repartition(keys=...) on a
    # derived dataset (paragraph dedup, link graph) rejects the strategy
    ensure_ctx()
    names = rd.read_parquet(corpus + "/pages").schema().names
    cols = ["url", "html"] + (
        ["content_encoding"] if "content_encoding" in names else []
    )
    return rd.read_parquet(corpus + "/pages", columns=cols)


def _decoded_htmls(t: pa.Table) -> list[bytes]:
    """M6 transport-level gzip: decode before parsing, exactly as the
    download path does (the oracle side mirrors this)."""
    import gzip as _gzip

    htmls = t["html"].to_pylist()
    if "content_encoding" in t.schema.names:
        htmls = [
            _gzip.decompress(h) if enc == "gzip" else h
            for h, enc in zip(htmls, t["content_encoding"].to_pylist())
        ]
    return htmls


def crawl_css_extract(sf_dir: str):
    """CSS-subset selector pipeline (SURVEY.md P3) over the corpus pages:
    per page, ``title::text``, ``h1::text``, ``li > a::attr(href)`` and the
    first ``p::text`` — the parsel/`response.css` surface re-expressed as a
    vectorizable map_batches stage.  Oracle: an INDEPENDENT regex+unescape
    extraction (oracle_ext.oracle_crawl_css_extract) materialized to
    parquet; the byte-level vector gate is tests/test_cssselect.py."""
    from scrapy__ray.functions.cssselect import css_extract, parse_dom

    corpus = _corpus()
    ds = _pages_ds(corpus)

    def sel(t: pa.Table) -> pa.Table:
        htmls = _decoded_htmls(t)
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
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.xpath import xpath_compile, xpath_extract_many

    corpus = _corpus()
    ds = _pages_ds(corpus)
    # constant selectors: parse ONCE per task, not once per page; the four
    # evaluations then share one parsed DOM and one doc-order index
    asts = [
        xpath_compile(e) for e in ("//title", "//h1", "//li/a/@href", "//p")
    ]

    def sel(t: pa.Table) -> pa.Table:
        htmls = _decoded_htmls(t)
        titles, h1s, n_a, anchors, paras = [], [], [], [], []
        for html in htmls:
            ti, h1, hrefs, ps = xpath_extract_many(parse_dom(html), asts)
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


# ---------------------------------------------------------- web link graph
_PR_ITERS = 5  # power-iteration rounds (pinned; oracle mirrors)
_PR_FIX = 10**12  # total PageRank mass, integer-fixed
_PR_DAMP_NUM, _PR_DAMP_DEN = 85, 100  # damping 0.85 as an exact ratio
_PR_TOPK = 20
#: node-count ceiling for the broadcast-scores regime: above this the
#: per-iteration score table (≈40 B/url) would exceed driver/worker heap
#: comfort and the shuffle_join regime takes over (same spirit as the
#: jaccard-sizes / tfidf-vocab two-regime thresholds in textops.py)
_PR_BROADCAST_MAX = 2_000_000

_EDGES_MEMO: dict[tuple[str, str], object] = {}


def _link_edges(corpus: str):
    """Intra-corpus link-graph edges (src, dst, src_host) as a materialized
    Dataset: ONE pass over the pages table runs the P4 LinkExtractor per
    page and keeps links that resolve to another corpus page (the membership
    set broadcasts — one url string per page, the small side by definition;
    at >10^8 pages the documented alternative is a semi-join exchange
    against the url column).  Self-loops dropped; per-page dedup is P4's
    ``unique=True`` semantics.  Memoized per corpus because inlinks and
    pagerank both consume it in one driver pass."""
    import ray

    from scrapy__ray.functions.linkextract import extract_links
    from scrapy__ray.functions.url import host_of
    from scrapy__ray.pipelines.util import broadcast, ensure_ctx, lookup_broadcast

    # key the memo by Ray job too: the cached value is a MaterializedDataset
    # whose object refs die with the Ray session — a recycled driver
    # (shutdown + init) must recompute, not dereference dead blocks
    job_id = ray.get_runtime_context().get_job_id()
    memo_key = (corpus, job_id)
    if memo_key in _EDGES_MEMO:
        return _EDGES_MEMO[memo_key]
    # evict dead-session entries: their MaterializedDatasets hold block
    # metadata + object refs that died with the previous Ray job
    for k in [k for k in _EDGES_MEMO if k[1] != job_id]:
        del _EDGES_MEMO[k]
    # the DataContext is captured at dataset creation: HASH_SHUFFLE must be
    # set BEFORE the edge dataset exists or a later repartition(keys=...)
    # on it rejects the strategy
    ensure_ctx()

    url_set = set(pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist())
    set_ref = broadcast(url_set)
    ds = _pages_ds(corpus)

    def edge_batch(t: pa.Table) -> pa.Table:
        members = lookup_broadcast(set_ref)
        htmls = _decoded_htmls(t)
        src, dst, shost = [], [], []
        for u, html in zip(t["url"].to_pylist(), htmls):
            h = host_of(u)
            for link in extract_links(html, u):
                if link != u and link in members:
                    src.append(u)
                    dst.append(link)
                    shost.append(h)
        return pa.table(
            {
                "src": pa.array(src, pa.string()),
                "dst": pa.array(dst, pa.string()),
                "src_host": pa.array(shost, pa.string()),
            }
        )

    _EDGES_MEMO[memo_key] = ds.map_batches(
        edge_batch, batch_format="pyarrow"
    ).materialize()
    return _EDGES_MEMO[memo_key]


def crawl_inlinks(sf_dir: str):
    """In-link summary per corpus page: in-degree and number of DISTINCT
    linking hosts (the anchor-graph features a ranking/spam pipeline
    derives).  Shape: the edge scan (one pass, P4 extractor) then one hash
    exchange keyed by dst; distinct hosts ride the same exchange as
    (dst, src_host) partial rows, so df-style per-key state never leaves
    its partition.  Oracle: independent single-process graph build in
    oracle_ext (same P4 scalar extractor — byte-vector-tested — different
    graph/count code)."""
    from scrapy__ray.pipelines.util import collect_arrow, shuffle_agg

    corpus = _corpus()
    edges = _link_edges(corpus)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "src_host"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "src_host"], as_index=False)["cnt"].sum()
        out = g.groupby("dst", as_index=False).agg(
            in_degree=("cnt", "sum"), n_src_hosts=("src_host", "nunique")
        )
        return out.rename(columns={"dst": "url"})

    out = shuffle_agg(edges, ["dst"], partial, final)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("url", pa.string()),
                ("in_degree", pa.int64()),
                ("n_src_hosts", pa.int64()),
            ]
        ),
    )


def crawl_pagerank(sf_dir: str):
    """Integer-exact PageRank over the corpus link graph, _PR_ITERS power
    iterations, damping 85/100, top-_PR_TOPK pages.  All arithmetic is
    int64 on _PR_FIX total mass (shares via integer floor-division), so
    every partial sum is order-independent and the distributed result is
    bit-identical to the single-process oracle — the same int-fixing
    policy as the ADC/BM25/DSIR operators.

    Two regimes on node count N (threshold _PR_BROADCAST_MAX):
    - N <= threshold (fixture + testdata scale): per-src shares are
      precomputed on the driver and BROADCAST (the k-means shape); each
      iteration is one pass over the materialized edge dataset emitting
      per-dst partial sums, merged by driver reduce.  Edges stream; the
      driver holds only the O(N) score vector.
    - N > threshold: scores live as a Dataset; each iteration
      shuffle_joins edges with scores on src (one exchange), partial-sums
      contributions, and shuffle_aggs by dst (second exchange) — nothing
      O(N) on the driver.  Forced in tests via monkeypatching the
      threshold; both paths must agree bit-for-bit.

    Dangling mass (nodes with no intra-corpus out-links) is pooled and
    redistributed uniformly each iteration, floor-division per node."""
    corpus = _corpus()
    edges = _link_edges(corpus)
    urls = sorted(
        pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist()
    )
    n = len(urls)

    from scrapy__ray.pipelines.util import driver_agg

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("src", as_index=False).size().rename(columns={"size": "d"})

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("src", as_index=False)["d"].sum()

    deg = driver_agg(edges, deg_partial, deg_final)
    outdeg = dict(zip(deg["src"], deg["d"].astype("int64")))

    scores = {u: _PR_FIX // n for u in urls}
    base = _PR_FIX * (_PR_DAMP_DEN - _PR_DAMP_NUM) // (_PR_DAMP_DEN * n)

    if n <= _PR_BROADCAST_MAX:
        from scrapy__ray.pipelines.util import broadcast, lookup_broadcast

        for _ in range(_PR_ITERS):
            share = {
                u: (s * _PR_DAMP_NUM) // (_PR_DAMP_DEN * outdeg[u])
                for u, s in scores.items()
                if outdeg.get(u, 0) > 0
            }
            dangling = sum(
                s * _PR_DAMP_NUM // _PR_DAMP_DEN
                for u, s in scores.items()
                if outdeg.get(u, 0) == 0
            )
            share_ref = broadcast(share)

            def contrib(df: pd.DataFrame) -> pd.DataFrame:
                sh = lookup_broadcast(share_ref)
                c = df["src"].map(sh).astype("int64")
                g = pd.DataFrame({"dst": df["dst"].values, "c": c.values})
                return g.groupby("dst", as_index=False).sum()

            inc = driver_agg(
                edges,
                contrib,
                lambda df: df.groupby("dst", as_index=False)["c"].sum(),
            )
            incoming = dict(zip(inc["dst"], inc["c"].astype("int64")))
            dshare = dangling // n
            scores = {u: base + dshare + incoming.get(u, 0) for u in urls}
    else:  # pragma: no cover — exercised via monkeypatched threshold in tests
        scores = _pagerank_distributed(edges, urls, outdeg, base)

    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:_PR_TOPK]
    return pa.table(
        {
            "url": pa.array([u for u, _ in top], pa.string()),
            "score_fix": pa.array([s for _, s in top], pa.int64()),
        }
    )


def _pagerank_distributed(edges, urls, outdeg, base):
    """The >threshold regime: scores live as a Dataset keyed by url; each
    iteration costs one shuffle_join (edges x scores on src) plus one
    shuffle_agg by dst — the score update itself stays distributed via a
    zero-partial union (every url emits a (dst=url, c=0, outdeg) row from
    the score dataset, so pages nobody links to still get base+dangling
    mass, the events_range_join left-outer trick).  The driver holds only
    the dangling-pot scalar per iteration.  Returns the final score dict
    (collected ONCE at the end for the caller's top-k; at true scale the
    top-k would stay distributed: per-partition head + driver merge, the
    top_revenue shape)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import driver_agg, shuffle_agg, shuffle_join

    n = len(urls)
    scores_ds = rd.from_arrow(
        pa.table(
            {
                "src": pa.array(urls, pa.string()),
                "score": pa.array([_PR_FIX // n] * n, pa.int64()),
                "outdeg": pa.array([outdeg.get(u, 0) for u in urls], pa.int64()),
            }
        )
    ).materialize()

    for _ in range(_PR_ITERS):
        # dangling pot: tiny driver reduce over the score dataset
        def dang_partial(df: pd.DataFrame) -> pd.DataFrame:
            m = df["outdeg"].values == 0
            pot = (df["score"].values[m] * _PR_DAMP_NUM // _PR_DAMP_DEN).sum()
            return pd.DataFrame({"pot": [int(pot)]})

        pot = int(
            driver_agg(scores_ds, dang_partial, lambda df: df.sum().to_frame().T)[
                "pot"
            ].iloc[0]
        )
        dshare = pot // n

        joined = shuffle_join(
            edges,
            scores_ds,
            on="src",
            left_cols=["src", "dst"],
            right_cols=["src", "score", "outdeg"],
        )

        def contrib(t: pa.Table) -> pa.Table:
            import numpy as np

            score = np.asarray(t["score"].to_pylist(), dtype=np.int64)
            od = np.asarray(t["outdeg"].to_pylist(), dtype=np.int64)
            c = score * _PR_DAMP_NUM // (_PR_DAMP_DEN * np.maximum(od, 1))
            return pa.table(
                {
                    "dst": t["dst"],
                    "c": pa.array(c, pa.int64()),
                    "outdeg": pa.array(np.zeros(len(c), dtype=np.int64), pa.int64()),
                }
            )

        def zero_rows(t: pa.Table) -> pa.Table:
            import numpy as np

            return pa.table(
                {
                    "dst": t["src"],
                    "c": pa.array(np.zeros(t.num_rows, dtype=np.int64), pa.int64()),
                    "outdeg": t["outdeg"],
                }
            )

        unioned = joined.map_batches(contrib, batch_format="pyarrow").union(
            scores_ds.map_batches(zero_rows, batch_format="pyarrow")
        )

        def upd_partial(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("dst", as_index=False).agg(
                c=("c", "sum"), outdeg=("outdeg", "max")
            )

        def upd_final(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("dst", as_index=False).agg(
                c=("c", "sum"), outdeg=("outdeg", "max")
            )
            return pd.DataFrame(
                {
                    "src": g["dst"].values,
                    "score": (base + dshare + g["c"].values).astype("int64"),
                    "outdeg": g["outdeg"].astype("int64").values,
                }
            )

        scores_ds = shuffle_agg(unioned, ["dst"], upd_partial, upd_final).materialize()

    final = driver_agg(scores_ds, lambda df: df, lambda df: df)
    return dict(zip(final["src"], final["score"].astype("int64")))


# ------------------------------------------- main-content extraction (webtext)
#: jusText/trafilatura-style block classification: a block whose text is
#: mostly anchor text is navigation boilerplate.  Pinned contract shared
#: with the independent regex oracle: blocks = top-most elements with one
#: of these tags; text normalized by whitespace collapse; a block is KEPT
#: when it has any text and anchor-chars / total-chars < _LINK_DENSITY_MAX.
_BLOCK_TAGS = frozenset(
    {"p", "ul", "ol", "h1", "h2", "h3", "pre", "blockquote", "table"}
)
_LINK_DENSITY_MAX = 0.5


def _norm_ws(s: str) -> str:
    return " ".join(s.split())


def _page_blocks(dom) -> list[tuple[str, int, int]]:
    """Doc-ordered (tag, total_chars, link_chars) + normalized text per
    TOP-MOST block element (a block nested in another block belongs to its
    ancestor).  Returns [(norm_text, total_chars, link_chars), ...]."""
    out = []

    def walk(node) -> None:
        for c in node.children():
            if c.tag in _BLOCK_TAGS:
                txt = _norm_ws(c.text())
                link = sum(
                    len(_norm_ws(d.text())) for d in c.iter() if d.tag == "a"
                )
                out.append((txt, len(txt), min(link, len(txt))))
            else:
                walk(c)

    walk(dom)
    return out


def crawl_main_content(sf_dir: str):
    """Link-density main-content extraction over the corpus pages (the
    jusText / trafilatura boilerplate heuristic, the step between raw HTML
    and every docs_* text operator in a real webtext pipeline): per page,
    classify each top-most block element by anchor-text density, keep the
    low-density blocks, and emit (url, n_blocks, n_kept, main_chars,
    main_md5) where main_md5 hashes the kept blocks' normalized text joined
    by newline — full content equality without shipping wide strings.

    Scale: pure map_batches over the column-pruned pages read — zero
    exchanges; the DOM walk is the same per-page cost as the css/xpath
    stages.  Oracle: INDEPENDENT regex block scanner + html.unescape
    (oracle_ext.oracle_crawl_main_content), materialized to parquet."""
    import hashlib as _hl

    from scrapy__ray.functions.cssselect import parse_dom

    corpus = _corpus()
    ds = _pages_ds(corpus)

    def extract(t: pa.Table) -> pa.Table:
        htmls = _decoded_htmls(t)
        n_blocks, n_kept, main_chars, main_md5 = [], [], [], []
        for html in htmls:
            blocks = _page_blocks(parse_dom(html))
            kept = [
                txt
                for txt, tot, link in blocks
                if tot > 0 and link / tot < _LINK_DENSITY_MAX
            ]
            joined = "\n".join(kept)
            n_blocks.append(len(blocks))
            n_kept.append(len(kept))
            main_chars.append(len(joined))
            main_md5.append(_hl.md5(joined.encode("utf-8")).hexdigest())
        return pa.table(
            {
                "url": t["url"],
                "n_blocks": pa.array(n_blocks, pa.int64()),
                "n_kept": pa.array(n_kept, pa.int64()),
                "main_chars": pa.array(main_chars, pa.int64()),
                "main_md5": pa.array(main_md5, pa.string()),
            }
        )

    from scrapy__ray.pipelines.util import collect_arrow

    return collect_arrow(
        ds.map_batches(extract, batch_format="pyarrow"),
        pa.schema(
            [
                ("url", pa.string()),
                ("n_blocks", pa.int64()),
                ("n_kept", pa.int64()),
                ("main_chars", pa.int64()),
                ("main_md5", pa.string()),
            ]
        ),
    )


# --------------------------------------- paragraph-level boilerplate dedup
#: CCNet / RefinedWeb line-level dedup: a block text occurring on many
#: DISTINCT pages is boilerplate.  Dedup units here = <p> and <li> block
#: texts (whitespace-normalized); threshold = distinct-page count >= this.
_BOILER_MIN_PAGES = 5
#: at or below this many hot (>= threshold) texts the hot set is collected
#: and broadcast (the Zipf head — nav strings, footers — is tiny relative
#: to the corpus); above it the flagging runs as a shuffle_join on the
#: block-hash, nothing collected.  Forced + compared in tests.
_BOILER_BROADCAST_MAX = 1_000_000


def _page_units(dom) -> list[str]:
    """Distinct whitespace-normalized texts of every <p> and <li> element
    of the page (distinct WITHIN the page: page-frequency counts pages,
    not repetitions — the CCNet per-shard dedup contract)."""
    seen = set()
    for n in dom.iter():
        if n.tag in ("p", "li"):
            t = _norm_ws(n.text())
            if t:
                seen.add(t)
    return sorted(seen)


def crawl_paragraph_dedup(sf_dir: str):
    """Paragraph/line-level boilerplate detection over the corpus pages
    (CCNet Wenzek et al. 2020 §3.1 / RefinedWeb line-dedup): hash every
    page's distinct <p>/<li> block texts, count DISTINCT PAGES per text
    across the corpus (one hash exchange on the 16-byte block hash), flag
    texts on >= _BOILER_MIN_PAGES pages as boilerplate, and emit per page
    (url, n_units, n_boiler, boiler_frac).

    Scale: exchange rows are (hash, url) pairs — O(total blocks), narrow;
    the page-frequency table lives in hash partitions.  The hot tail is
    Zipf-headed, so below _BOILER_BROADCAST_MAX hot texts the flag set
    rides back as one broadcast (second corpus pass is exchange-free);
    above it a shuffle_join on the hash keeps the driver out of the data
    plane.  Oracle: INDEPENDENT regex scanner + Counter
    (oracle_ext.oracle_crawl_paragraph_dedup), materialized."""
    import hashlib as _hl

    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.pipelines.util import (
        broadcast,
        collect_arrow,
        lookup_broadcast,
        round_col,
        shuffle_agg,
        shuffle_join,
    )

    corpus = _corpus()
    ds = _pages_ds(corpus)

    def units(t: pa.Table) -> pa.Table:
        htmls = _decoded_htmls(t)
        urls, hashes = [], []
        for u, html in zip(t["url"].to_pylist(), htmls):
            for txt in _page_units(parse_dom(html)):
                urls.append(u)
                hashes.append(
                    # 128-bit: the oracle counts by exact TEXT, so a hash
                    # collision here would silently merge two texts' page
                    # counts — birthday bound puts 64-bit collisions at the
                    # 10^10-page design point (~2^32 distinct texts), while
                    # 128-bit keeps the probability ~1e-18
                    _hl.blake2b(txt.encode("utf-8"), digest_size=16).hexdigest()
                )
        return pa.table(
            {"url": pa.array(urls, pa.string()), "h": pa.array(hashes, pa.string())}
        )

    # (url, h) rows are distinct by construction (per-page set) — page
    # frequency per hash = plain row count after the exchange
    blocks = ds.map_batches(units, batch_format="pyarrow").materialize()

    def pf_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False).size().rename(columns={"size": "pf"})

    def pf_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("h", as_index=False)["pf"].sum()

    pf = shuffle_agg(blocks, ["h"], pf_partial, pf_final)
    # vectorized filter: pf is this query's widest intermediate (one row
    # per distinct block text) — a per-row lambda filter would dispatch
    # Python per row, the cost class util.ensure_ctx bans for groupby
    hot = pf.map_batches(
        lambda df: df[df["pf"] >= _BOILER_MIN_PAGES], batch_format="pandas"
    ).materialize()

    if hot.count() <= _BOILER_BROADCAST_MAX:
        hot_set: set[str] = set()
        for t in hot.iter_batches(batch_format="pyarrow"):
            hot_set.update(t["h"].to_pylist())
        ref = broadcast(hot_set)

        def flag(df: pd.DataFrame) -> pd.DataFrame:
            hs = lookup_broadcast(ref)
            return pd.DataFrame(
                {
                    "url": df["url"].values,
                    "b": df["h"].isin(hs).astype("int64").values,
                }
            )

        flagged = blocks.map_batches(flag, batch_format="pandas")
    else:
        # shuffle_join is inner; left-outer semantics via the zero-partial
        # union (the pagerank/events_range_join trick): every block emits a
        # b=0 row, every (block x hot) match emits a b=1 row, and the final
        # per-url sum over both is exactly the broadcast regime's answer
        joined = shuffle_join(
            blocks, hot, on="h", left_cols=["url", "h"], right_cols=["h", "pf"]
        )

        def one_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": df["url"].values,
                    "b": np.ones(len(df), dtype=np.int64),
                    "u": np.zeros(len(df), dtype=np.int64),
                }
            )

        def zero_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": df["url"].values,
                    "b": np.zeros(len(df), dtype=np.int64),
                    "u": np.ones(len(df), dtype=np.int64),
                }
            )

        flagged = joined.map_batches(one_rows, batch_format="pandas").union(
            blocks.map_batches(zero_rows, batch_format="pandas")
        )

    def page_partial(df: pd.DataFrame) -> pd.DataFrame:
        if "u" in df.columns:  # join regime: unit rows and boiler rows split
            return df.groupby("url", as_index=False).agg(
                n_units=("u", "sum"), n_boiler=("b", "sum")
            )
        return df.groupby("url", as_index=False).agg(
            n_units=("b", "size"), n_boiler=("b", "sum")
        )

    def page_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("url", as_index=False)[["n_units", "n_boiler"]].sum()
        g["boiler_frac"] = round_col(
            g["n_boiler"].to_numpy("float64") / g["n_units"].to_numpy("float64"), 4
        )
        return g

    out = shuffle_agg(flagged, ["url"], page_partial, page_final)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("url", pa.string()),
                ("n_units", pa.int64()),
                ("n_boiler", pa.int64()),
                ("boiler_frac", pa.float64()),
            ]
        ),
    )


# ----------------------------------------------------- HITS hubs/authorities
_HITS_ITERS = 5
_HITS_FIX = 10**12  # each vector renormalized to this integer mass
_HITS_TOPK = 20


def crawl_hits(sf_dir: str):
    """HITS hubs & authorities (Kleinberg 1999) over the corpus link graph,
    _HITS_ITERS alternating iterations, top-_HITS_TOPK pages by authority.
    Integer-exact variant: scores live on _HITS_FIX total mass and each
    half-iteration renormalizes by integer floor division (L1-to-FIX
    instead of the paper's L2 — convergence only needs a consistent
    normalization, and integer mass makes every partial sum
    order-independent, the pagerank/ADC/BM25 policy), so the distributed
    result is bit-identical to the single-process oracle.

    Two regimes on node count N (threshold _PR_BROADCAST_MAX, shared with
    PageRank — same ≈40 B/url score-table heap bound):
    - N <= threshold (the pagerank broadcast regime — the k-means
      pattern): the edge dataset streams twice per iteration (auth pass
      keyed by dst, hub pass keyed by src), scores broadcast each pass,
      per-key partial sums merged by driver reduce; the driver holds only
      the O(N) score vectors.
    - N > threshold: hub/auth live as ONE score Dataset keyed by url;
      each half-iteration is the `_pagerank_distributed` construction —
      shuffle_join (edges x scores on the in-key, one exchange) relaying
      the in-score across each edge, zero-partial union so every url
      keeps a row (and carries the NOT-being-updated vector through the
      exchange), shuffle_agg by the out-key — nothing O(N) on the
      driver; only the renorm total (one scalar) folds there.  Forced in
      tests via monkeypatching the threshold; both paths must agree
      bit-for-bit.

    Oracle: independent single-process implementation
    (oracle_ext.oracle_crawl_hits), materialized."""
    from scrapy__ray.pipelines.util import broadcast, driver_agg, lookup_broadcast

    corpus = _corpus()
    edges = _link_edges(corpus)
    # set(): the node universe is DISTINCT urls — a duplicated page row
    # must not double-count in n or emit twice in the top-k (the oracle
    # dedups identically)
    urls = sorted(
        set(pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist())
    )
    n = len(urls)

    if n > _PR_BROADCAST_MAX:
        auth, hub = _hits_distributed(edges, urls)
    else:
        hub = {u: _HITS_FIX // n for u in urls}
        auth = {u: 0 for u in urls}

        def propagate(score_ref, key_in: str, key_out: str):
            """One half-iteration: sum broadcast scores over edges grouped
            by key_out (auth pass: in=src, out=dst; hub pass: in=dst,
            out=src)."""

            def contrib(df: pd.DataFrame) -> pd.DataFrame:
                sc = lookup_broadcast(score_ref)
                c = df[key_in].map(sc).fillna(0).astype("int64")
                g = pd.DataFrame({"u": df[key_out].values, "c": c.values})
                return g.groupby("u", as_index=False).sum()

            inc = driver_agg(
                edges, contrib, lambda df: df.groupby("u", as_index=False)["c"].sum()
            )
            return dict(zip(inc["u"], inc["c"].astype("int64")))

        def renorm(raw: dict) -> dict:
            total = sum(raw.values())
            if total == 0:
                return {u: 0 for u in urls}
            return {u: raw.get(u, 0) * _HITS_FIX // total for u in urls}

        for _ in range(_HITS_ITERS):
            auth = renorm(propagate(broadcast(hub), "src", "dst"))
            hub = renorm(propagate(broadcast(auth), "dst", "src"))

    top = sorted(urls, key=lambda u: (-auth[u], u))[:_HITS_TOPK]
    return pa.table(
        {
            "url": pa.array(top, pa.string()),
            "auth_fix": pa.array([auth[u] for u in top], pa.int64()),
            "hub_fix": pa.array([hub[u] for u in top], pa.int64()),
        }
    )


def _hits_distributed(edges, urls):
    """The >threshold HITS regime: hub/auth live as one Dataset keyed by
    url; each half-iteration costs one shuffle_join (edges x scores on the
    in-key) plus one shuffle_agg by the out-key, with the zero-partial
    union keeping a row per url (pages receiving no mass renorm to 0, and
    the vector NOT being updated rides the exchange as the zero rows'
    ``keep`` column — exactly one zero row per url, so a plain group sum
    reconstructs it).  The driver holds only the renorm total per
    half-iteration.  Renorm is ``raw * _HITS_FIX // total`` in Python-int
    arithmetic (the product overflows int64 — same policy as the
    broadcast regime and the oracle), run INSIDE the distributed map over
    score partitions, ~O(N/partitions) ints per task.  Returns (auth,
    hub) dicts — collected ONCE at the end for the caller's top-k; at
    true scale the top-k would stay distributed (per-partition head +
    driver merge, the top_revenue shape)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import driver_agg, shuffle_agg, shuffle_join

    n = len(urls)
    scores = rd.from_arrow(
        pa.table(
            {
                "u": pa.array(urls, pa.string()),
                "hub": pa.array([_HITS_FIX // n] * n, pa.int64()),
                "auth": pa.array([0] * n, pa.int64()),
            }
        )
    ).materialize()

    def half(scores_ds, key_in: str, key_out: str, in_col: str, out_col: str):
        """auth pass: key_in=src, key_out=dst, in_col=hub, out_col=auth;
        hub pass is the mirror image."""

        def relay_rows(t: pa.Table) -> pa.Table:
            return pa.table({key_in: t["u"], "s": t[in_col]})

        joined = shuffle_join(
            edges,
            scores_ds.map_batches(relay_rows, batch_format="pyarrow"),
            on=key_in,
            left_cols=[key_in, key_out],
            right_cols=[key_in, "s"],
        )

        def contrib(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, dtype=np.int64)
            return pa.table(
                {
                    "u": t[key_out],
                    "c": t["s"].cast(pa.int64()),
                    "keep": pa.array(z, pa.int64()),
                }
            )

        def zero_rows(t: pa.Table) -> pa.Table:
            z = np.zeros(t.num_rows, dtype=np.int64)
            return pa.table(
                {"u": t["u"], "c": pa.array(z, pa.int64()), "keep": t[in_col]}
            )

        unioned = joined.map_batches(contrib, batch_format="pyarrow").union(
            scores_ds.map_batches(zero_rows, batch_format="pyarrow")
        )

        def agg(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("u", as_index=False).agg(
                c=("c", "sum"), keep=("keep", "sum")
            )

        raw = shuffle_agg(unioned, ["u"], agg, agg).materialize()

        def tot_partial(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"t": [int(df["c"].sum())]})

        total = int(
            driver_agg(raw, tot_partial, lambda df: df.sum().to_frame().T)["t"].iloc[0]
        )

        def renorm(df: pd.DataFrame) -> pd.DataFrame:
            new = (
                [int(r) * _HITS_FIX // total for r in df["c"]]
                if total
                else [0] * len(df)
            )
            out = {"u": df["u"].values, in_col: df["keep"].astype("int64").values}
            out[out_col] = np.array(new, dtype=np.int64)
            return pd.DataFrame(out)[["u", "hub", "auth"]]

        return raw.map_batches(renorm, batch_format="pandas").materialize()

    for _ in range(_HITS_ITERS):
        scores = half(scores, "src", "dst", "hub", "auth")
        scores = half(scores, "dst", "src", "auth", "hub")

    final = driver_agg(scores, lambda df: df, lambda df: df)
    return (
        dict(zip(final["u"], final["auth"].astype("int64"))),
        dict(zip(final["u"], final["hub"].astype("int64"))),
    )


# ---------------------------------------------------- triangle counting
_TRI_TOPK = 20


def crawl_triangles(sf_dir: str):
    """Per-vertex triangle participation over the UNDIRECTED corpus link
    graph, top-_TRI_TOPK by (count desc, url) — the clustering-coefficient
    primitive of web-graph analytics.

    Algorithm: degree-ordered wedge join (the compact-forward / MapReduce
    node-iterator++ construction — Suri & Vassilvitskii, WWW 2011): orient
    every undirected edge from lower to higher (degree, url) rank, emit
    wedges only at each vertex's ORIENTED out-neighbors (bounding per-vertex
    wedge fanout by O(sqrt(m)) amortized — a hub's quadratic wedge blowup is
    exactly what the orientation removes), then close wedges against the
    oriented edge set.  Each triangle closes exactly one wedge.

    Exchanges: (1) canonical-pair hash dedup of the directed edges;
    (2) wedge generation grouped by wedge center; (3) tag/union hash join
    of wedges with edges on the closing pair; (4) per-vertex count fold.
    Two regimes on vertex count (threshold _PR_BROADCAST_MAX): at or
    below, the rank map (url -> undirected degree) broadcasts — one int
    per vertex, the k-means/pagerank small-side posture; above it the
    ranks attach to both edge endpoints via two shuffle_joins against the
    degree Dataset (same downstream exchanges, no O(N) broadcast), forced
    + bit-compared in tests.  Both regimes carry the higher endpoint's
    degree on each oriented edge so wedge generation never needs the
    global map.  Oracle: independent naive neighbor-set-intersection
    implementation (oracle_ext.oracle_crawl_triangles), materialized."""
    from scrapy__ray.pipelines.util import collect_arrow

    corpus = _corpus()
    counts, _deg_fn = _per_vertex_triangles(corpus)  # deg never collected
    tbl = collect_arrow(
        counts.map_batches(
            lambda df: df.rename(columns={"c": "n_triangles"}),
            batch_format="pandas",
            batch_size=None,
        ),
        pa.schema([("url", pa.string()), ("n_triangles", pa.int64())]),
    )
    df = tbl.to_pandas().sort_values(
        ["n_triangles", "url"], ascending=[False, True]
    ).head(_TRI_TOPK)
    return pa.Table.from_pandas(df.reset_index(drop=True), preserve_index=False)


def _per_vertex_triangles(corpus: str):
    """Shared triangle-count kernel (algorithm + exchange plan pinned in
    the crawl_triangles docstring): returns (counts Dataset [(url, c)] —
    one row per triangle-participating vertex, deg_fn — a ZERO-ARG
    callable collecting the undirected-degree DataFrame [(u, d)] on
    demand, so crawl_triangles (which discards it) never pays an O(N)
    driver collect in the >threshold regime; only the
    clustering-coefficient consumer's final all-pages report calls it)."""
    from scrapy__ray.pipelines.util import (
        broadcast,
        driver_agg,
        hash_partition_map,
        lookup_broadcast,
        shuffle_agg,
        shuffle_join,
    )

    edges = _link_edges(corpus)

    # exchange 1: undirected canonical pairs, deduped where both live
    def canon(t: pa.Table) -> pa.Table:
        src = t["src"].to_pylist()
        dst = t["dst"].to_pylist()
        a = [s if s < d else d for s, d in zip(src, dst)]
        b = [d if s < d else s for s, d in zip(src, dst)]
        return pa.table(
            {"a": pa.array(a, pa.string()), "b": pa.array(b, pa.string())}
        )

    und = hash_partition_map(
        edges.map_batches(canon, batch_format="pyarrow"),
        ["a", "b"],
        lambda df: df.drop_duplicates(["a", "b"]),
    ).materialize()  # consumed by degree pass, wedge pass and closing join

    # undirected degrees, aggregated distributed (one narrow exchange);
    # collected to a driver frame only for the regime probe + the
    # clustering-coefficient consumer's final report
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.concat([df["a"].rename("u"), df["b"].rename("u")]).to_frame()
        return g.groupby("u", as_index=False).size().rename(columns={"size": "d"})

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("u", as_index=False)["d"].sum()

    deg_ds = shuffle_agg(und, ["u"], deg_partial, deg_final).materialize()
    n_vertices = deg_ds.count()

    def deg_fn():
        return driver_agg(deg_ds, lambda df: df, deg_final)

    if n_vertices <= _PR_BROADCAST_MAX:
        deg = deg_fn()
        deg_fn = lambda: deg  # already collected for the rank map
        rank_ref = broadcast(dict(zip(deg["u"], deg["d"].astype("int64"))))

        # orient lo->hi by (degree, url) rank; carry the HIGHER endpoint's
        # degree so downstream wedge sorting never needs the global map
        def orient(df: pd.DataFrame) -> pd.DataFrame:
            rk = lookup_broadcast(rank_ref)
            lo, hi, dhi = [], [], []
            for a, b in zip(df["a"], df["b"]):
                if (rk[a], a) < (rk[b], b):
                    lo.append(a)
                    hi.append(b)
                    dhi.append(rk[b])
                else:
                    lo.append(b)
                    hi.append(a)
                    dhi.append(rk[a])
            return pd.DataFrame(
                {"lo": lo, "hi": hi, "dhi": np.asarray(dhi, dtype=np.int64)}
            )

        oriented = und.map_batches(orient, batch_format="pandas").materialize()
    else:
        # >threshold regime: attach each endpoint's degree via two
        # shuffle_joins against the degree Dataset — no O(N) broadcast
        def as_a(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"a": df["u"].values, "da": df["d"].astype("int64").values}
            )

        def as_b(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"b": df["u"].values, "db": df["d"].astype("int64").values}
            )

        j1 = shuffle_join(
            und,
            deg_ds.map_batches(as_a, batch_format="pandas"),
            on="a",
            left_cols=["a", "b"],
            right_cols=["a", "da"],
        )
        j2 = shuffle_join(
            j1,
            deg_ds.map_batches(as_b, batch_format="pandas"),
            on="b",
            left_cols=["a", "b", "da"],
            right_cols=["b", "db"],
        )

        def orient2(df: pd.DataFrame):
            if not len(df):
                return pa.table(
                    {
                        "lo": pa.array([], pa.string()),
                        "hi": pa.array([], pa.string()),
                        "dhi": pa.array([], pa.int64()),
                    }
                )
            a = df["a"].to_numpy(dtype=object)
            b = df["b"].to_numpy(dtype=object)
            da = df["da"].to_numpy(dtype=np.int64)
            db = df["db"].to_numpy(dtype=np.int64)
            first = (da < db) | ((da == db) & (a < b))
            return pa.table(
                {
                    "lo": pa.array(np.where(first, a, b), pa.string()),
                    "hi": pa.array(np.where(first, b, a), pa.string()),
                    "dhi": pa.array(np.where(first, db, da), pa.int64()),
                }
            )

        oriented = j2.map_batches(orient2, batch_format="pandas").materialize()

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        ctr, u, w = [], [], []
        for v, grp in df.groupby("lo")[["hi", "dhi"]]:
            ns = sorted(zip(grp["hi"], grp["dhi"]), key=lambda x: (x[1], x[0]))
            for i in range(len(ns)):
                for j in range(i + 1, len(ns)):
                    ctr.append(v)
                    u.append(ns[i][0])
                    w.append(ns[j][0])
        return pd.DataFrame({"v": ctr, "k": [f"{x}\x00{y}" for x, y in zip(u, w)]})

    wedge_ds = hash_partition_map(oriented, ["lo"], wedges)

    # exchange 3: close wedges against the oriented edge set on the pair key
    edge_keys = oriented.map_batches(
        lambda df: pd.DataFrame(
            {"k": [f"{x}\x00{y}" for x, y in zip(df["lo"], df["hi"])],
             "present": np.ones(len(df), dtype=np.int64)}
        ),
        batch_format="pandas",
    )
    closed = shuffle_join(
        wedge_ds, edge_keys, on="k", left_cols=["k", "v"], right_cols=["k", "present"]
    )

    # exchange 4: each closed wedge = one triangle; +1 to all three vertices
    def explode_vertices(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"url": [], "c": []}).astype({"c": "int64"})
        us, ws = zip(*(k.split("\x00") for k in df["k"]))
        out = pd.DataFrame(
            {"url": list(df["v"]) + list(us) + list(ws),
             "c": np.ones(3 * len(df), dtype=np.int64)}
        )
        return out.groupby("url", as_index=False)["c"].sum()

    counts = shuffle_agg(
        closed.map_batches(explode_vertices, batch_format="pandas", batch_size=None),
        ["url"],
        lambda df: df.groupby("url", as_index=False)["c"].sum(),
        lambda df: df.groupby("url", as_index=False)["c"].sum(),
    )
    return counts, deg_fn


def crawl_clustering_coef(sf_dir: str):
    """Local clustering coefficient per page over the undirected corpus
    link graph — c(v) = 2·T(v) / (d(v)·(d(v)−1)) for degree ≥ 2, else 0 —
    plus the inputs (degree, triangle count) per row; ALL corpus pages,
    isolated ones included, sorted by url.  The hub-vs-community signal:
    link farms and boilerplate nav rings have high coefficients at high
    degree, genuine hubs low ones.

    Reuses the degree-ordered wedge-join triangle kernel
    (_per_vertex_triangles — exchanges and the broadcast rank-map posture
    documented there); the coefficient itself is one vectorized divide in
    the final fold.  The float is ONE IEEE division of two exact int64
    products, so the independent naive oracle
    (oracle_ext.oracle_crawl_clustering_coef, materialized) is
    bit-identical, not approximately close."""
    from scrapy__ray.pipelines.util import collect_arrow

    corpus = _corpus()
    counts, deg_fn = _per_vertex_triangles(corpus)
    deg = deg_fn()
    tbl = collect_arrow(
        counts,
        pa.schema([("url", pa.string()), ("c", pa.int64())]),
    )
    tri = dict(zip(tbl["url"].to_pylist(), tbl["c"].to_pylist()))
    degs = dict(zip(deg["u"], deg["d"].astype("int64")))
    urls = sorted(
        pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist()
    )
    d = np.array([degs.get(u, 0) for u in urls], dtype=np.int64)
    t = np.array([tri.get(u, 0) for u in urls], dtype=np.int64)
    denom = d * (d - 1)
    coef = np.divide(
        2.0 * t, denom, out=np.zeros(len(urls)), where=denom > 0
    )
    df = pd.DataFrame(
        {
            "url": urls,
            "degree": pd.array(d, dtype="int64"),
            "n_triangles": pd.array(t, dtype="int64"),
            "coef": pd.array(coef, dtype="float64"),
        }
    )
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------------- anchor-text aggregation
def crawl_anchor_text(sf_dir: str):
    """Per-target-page anchor-text summary over the corpus link graph (the
    classic IR indexing signal — anchor text describes the TARGET page):
    every <a> element whose href resolves to an intra-corpus url (P4's
    canonicalization, self-loops dropped, empty texts dropped) contributes
    one (dst, text) occurrence; per dst emit the most common anchor text
    (ties: lexicographically smallest), its occurrence count, the distinct
    variant count and total occurrences.

    Scale: one pass over the pages (DOM walk, membership broadcast — the
    _link_edges posture; the >10^8-page semi-join alternative is the same
    as documented there), then ONE hash exchange on dst carrying
    (dst, text, cnt) partials — anchor vocabularies are Zipf-headed, so
    partial counting collapses most volume before the exchange.  Oracle:
    independent regex scanner + Counter (reusing only the byte-vector-
    tested href canonicalizer), materialized."""
    from scrapy__ray.functions.cssselect import parse_dom
    from scrapy__ray.functions.linkextract import links_from_hrefs
    from scrapy__ray.pipelines.util import (
        broadcast,
        collect_arrow,
        lookup_broadcast,
        shuffle_agg,
    )

    corpus = _corpus()
    url_set = set(pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist())
    set_ref = broadcast(url_set)
    ds = _pages_ds(corpus)

    def anchors(t: pa.Table) -> pa.Table:
        members = lookup_broadcast(set_ref)
        memo: dict = {}
        dsts, texts = [], []
        for u, html in zip(t["url"].to_pylist(), _decoded_htmls(t)):
            dom = parse_dom(html)
            base = next(
                (
                    n.attrs["href"]
                    for n in dom.iter()
                    if n.tag == "base" and "href" in n.attrs
                ),
                None,
            )
            for n in dom.iter():
                if n.tag != "a" or "href" not in n.attrs:
                    continue
                txt = _norm_ws(n.text())
                if not txt:
                    continue
                resolved = links_from_hrefs([n.attrs["href"]], u, base, memo)
                if resolved and resolved[0] in members and resolved[0] != u:
                    dsts.append(resolved[0])
                    texts.append(txt)
        return pa.table(
            {
                "dst": pa.array(dsts, pa.string()),
                "text": pa.array(texts, pa.string()),
            }
        )

    occ = ds.map_batches(anchors, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "text"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["dst", "text"], as_index=False)["cnt"].sum()
        # per-dst top-1 by (cnt desc, text asc) — total order, exchange-safe
        g = g.sort_values(["dst", "cnt", "text"], ascending=[True, False, True])
        top = g.drop_duplicates("dst", keep="first")
        tot = g.groupby("dst", as_index=False).agg(
            n_variants=("text", "size"), n_anchors=("cnt", "sum")
        )
        out = top.merge(tot, on="dst")
        return pd.DataFrame(
            {
                "url": out["dst"].values,
                "top_anchor": out["text"].values,
                "top_anchor_n": out["cnt"].astype("int64").values,
                "n_variants": out["n_variants"].astype("int64").values,
                "n_anchors": out["n_anchors"].astype("int64").values,
            }
        )

    out = shuffle_agg(occ, ["dst"], partial, final)
    return collect_arrow(
        out,
        pa.schema(
            [
                ("url", pa.string()),
                ("top_anchor", pa.string()),
                ("top_anchor_n", pa.int64()),
                ("n_variants", pa.int64()),
                ("n_anchors", pa.int64()),
            ]
        ),
    )


# -------------------------------------------- weakly-connected components
def crawl_components(sf_dir: str):
    """Weakly-connected components of the corpus link graph — the web-graph
    partitioning primitive (site/community discovery, crawl-partition
    sizing): every page is a node, every intra-corpus link an undirected
    edge; emit one row per component with its representative url (the
    lexicographically smallest member), page count and distinct-host count,
    sorted (n_pages desc, component asc).  Isolated pages are singleton
    components.

    Node ids are each url's rank in the sorted url list — the url set is
    already driver-resident for _link_edges' membership broadcast (same
    small-side posture, same documented >10^8 semi-join alternative), and
    rank ids make the component-MINIMUM id the component's
    lexicographically-smallest url, so the dedup machinery's min-label
    semantics directly yield the representative.  Components resolve via
    pipelines.dedup.pairs_to_clusters (two regimes: driver union-find under
    200k edges, iterated min-label propagation above — tests force both).
    Per-component fold is ONE hash exchange keyed by rep carrying
    (rep, host, pages) partials; host cardinality per component is tiny
    (hosts ≪ pages), so partials collapse before the exchange.  Oracle:
    independent union-find (oracle_ext.oracle_crawl_components),
    materialized."""
    import ray.data as rd

    from scrapy__ray.functions.url import host_of
    from scrapy__ray.pipelines.dedup import pairs_to_clusters
    from scrapy__ray.pipelines.util import (
        broadcast,
        collect_arrow,
        ensure_ctx,
        lookup_broadcast,
        shuffle_agg,
    )

    corpus = _corpus()
    edges = _link_edges(corpus)

    urls = sorted(
        pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist()
    )
    id_ref = broadcast({u: i for i, u in enumerate(urls)})
    urls_ref = broadcast(urls)

    def to_pairs(t: pa.Table) -> pa.Table:
        ids = lookup_broadcast(id_ref)
        a = np.fromiter(
            (ids[s] for s in t["src"].to_pylist()), dtype=np.int64, count=t.num_rows
        )
        b = np.fromiter(
            (ids[d] for d in t["dst"].to_pylist()), dtype=np.int64, count=t.num_rows
        )
        # canonical lo<hi orientation; duplicates are harmless to both
        # cluster regimes (set-union / min-agg are idempotent)
        return pa.table(
            {
                "doc_a": pa.array(np.minimum(a, b), pa.int64()),
                "doc_b": pa.array(np.maximum(a, b), pa.int64()),
            }
        )

    pairs_ds = edges.map_batches(to_pairs, batch_format="pyarrow")

    def to_nodes(t: pa.Table) -> pa.Table:
        ids = lookup_broadcast(id_ref)
        return pa.table(
            {
                "doc_id": pa.array(
                    [ids[u] for u in t["url"].to_pylist()], pa.int64()
                )
            }
        )

    ensure_ctx()
    nodes_ds = rd.read_parquet(corpus + "/pages", columns=["url"]).map_batches(
        to_nodes, batch_format="pyarrow"
    )
    labels = pairs_to_clusters(pairs_ds, nodes_ds)

    def attach(t: pa.Table) -> pa.Table:
        us = lookup_broadcast(urls_ref)
        doc = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "rep": t["cluster_rep"],
                "host": pa.array([host_of(us[i]) for i in doc], pa.string()),
                "pages": pa.array(np.ones(len(doc), dtype=np.int64), pa.int64()),
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["rep", "host"], as_index=False)["pages"].sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"rep": pd.array([], dtype="int64"),
                 "n_pages": pd.array([], dtype="int64"),
                 "n_hosts": pd.array([], dtype="int64")}
            )
        g = df.groupby("rep")
        out = g["pages"].sum().rename("n_pages").to_frame()
        out["n_hosts"] = g["host"].nunique()
        return out.reset_index()

    per_rep = shuffle_agg(
        rd.from_arrow(labels).map_batches(attach, batch_format="pyarrow"),
        ["rep"],
        partial,
        final,
    )

    def name_rep(df: pd.DataFrame) -> pd.DataFrame:
        us = lookup_broadcast(urls_ref)
        return pd.DataFrame(
            {
                "component": [us[int(r)] for r in df["rep"]],
                "n_pages": df["n_pages"].astype("int64").values,
                "n_hosts": df["n_hosts"].astype("int64").values,
            }
        )

    tbl = collect_arrow(
        per_rep.map_batches(name_rep, batch_format="pandas", batch_size=None),
        pa.schema(
            [
                ("component", pa.string()),
                ("n_pages", pa.int64()),
                ("n_hosts", pa.int64()),
            ]
        ),
    )
    df = (
        tbl.to_pandas()
        .sort_values(["n_pages", "component"], ascending=[False, True])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


# ---------------------------------------------------- multi-source seed BFS
#: hop-synchronous propagation runs DIAMETER rounds (the Pregel BFS law).
#: Real webgraph diameters are ~20-30 hops; the budget is sized for the
#: pathological chain-shaped corpora the fixture generator produces
#: (sf-small max seed distance = 123 — paginated next-page chains).
_BFS_MAX_ROUNDS = 256
_BFS_SMALL_EDGES = 200_000
#: frontier rows at or under this broadcast as a driver dict (node→dist,
#: ~100 B/row → ≤50 MB object) so the relay needs NO exchange; above it the
#: relay is a shuffle_join — the standard broadcast-vs-shuffle join choice.
_BFS_BROADCAST_FRONTIER = 500_000


def _min_dist_propagate(edges, labels, unreach: int):
    """Delta-frontier BFS (the distributed multi-source BFS kernel, shared
    spec with crawl_seed_distance and unit-tested standalone on synthetic
    graphs).  Per round only the FRONTIER — the nodes whose distance
    improved last round — relays dist+1 across its out-edges.  The
    hop-synchronous invariant (unit edge weights, all seeds at 0) means a
    node's distance is final the round it first improves, so every node
    relays at most once and total relay volume is O(E) over the WHOLE run
    — not O(E·diameter) as full re-relabeling would cost, which is the
    difference between usable and unusable on the 123-hop chain corpora
    the fixture generator produces.  Relay regime by frontier size:

      * ≤ _BFS_BROADCAST_FRONTIER rows: the frontier broadcasts as a
        node→dist dict and the relay is a map_batches filter over the
        materialized edge set — no exchange on the relay side;
      * above: shuffle_join(edges, frontier) — one exchange carrying
        E + |frontier| rows (wide BFS levels on flat graphs).

    The merge is ONE labels+contrib exchange keyed by node whose
    per-partition final computes the new minimum AND flags improvements
    (label rows tagged old=1, contrib rows old=0); the improved rows ARE
    the next frontier, and an empty frontier is the exact convergence
    signal.  Frontier extraction runs as per-block remote tasks over the
    just-materialized label refs — blocks never gather on the driver
    except the ≤threshold frontier rows themselves.  Plan/stats ancestry
    is severed per round via to_arrow_refs/from_arrow_refs: the chained
    union+agg operator tree otherwise grows several stats nodes per round
    and Ray's recursive DatasetStats summarization blows Python's
    recursion limit near ~20 rounds (blocks stay in the object store).

    ``edges``: Dataset[(src, dst, ...)]; ``labels``: materialized
    Dataset[(node, dist)] with seeds at 0 and everything else at
    ``unreach``.  Raises on non-convergence within _BFS_MAX_ROUNDS rather
    than returning partial distances (the pairs_to_clusters contract)."""
    import ray
    import ray.data as rd

    from scrapy__ray.pipelines.util import (
        broadcast,
        lookup_broadcast,
        shuffle_agg,
        shuffle_join,
    )

    # the edge set is re-scanned every round — pin its blocks once
    edges = edges.materialize()

    def _empty_front() -> pa.Table:
        return pa.table(
            {"node": pa.array([], pa.string()), "dist": pa.array([], pa.int64())}
        )

    @ray.remote(num_returns=2)
    def split_block(t: pa.Table, first: bool):
        """(frontier rows of one label block, their count).  Round 0's
        frontier is every node already under ``unreach`` (the seeds);
        later rounds read the merge's improvement flag."""
        import pyarrow.compute as pc

        if t.num_rows == 0 or "node" not in t.column_names:
            return _empty_front(), 0
        mask = (
            pc.less(t["dist"], unreach)
            if first
            else pc.equal(t["imp"], pa.scalar(1, pa.int8()))
        )
        f = t.filter(mask).select(["node", "dist"])
        return f, f.num_rows

    def tag_old(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                    "old": pa.array([], pa.int8()),
                }
            )
        t = t.select(["node", "dist"])
        return t.append_column(
            "old", pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8())
        )

    def relay(t: pa.Table) -> pa.Table:
        # Arrow in/out so EMPTY partitions keep typed columns — an empty
        # pandas frame degrades to null-typed Arrow and poisons schema
        # unification downstream
        return pa.table(
            {
                "node": t["dst"],
                "dist": pa.array(
                    np.minimum(
                        t["dist"].to_numpy(zero_copy_only=False) + 1, unreach
                    ),
                    pa.int64(),
                ),
                "old": pa.array(np.zeros(t.num_rows, dtype=np.int8), pa.int8()),
            }
        )

    def merge_partial(df: pd.DataFrame):
        if not len(df) or "node" not in df.columns:
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                    "old": pa.array([], pa.int8()),
                }
            )
        g = df.groupby(["node", "old"], as_index=False)["dist"].min()
        return pa.table(
            {
                "node": pa.array(g["node"], pa.string()),
                "dist": pa.array(g["dist"], pa.int64()),
                "old": pa.array(g["old"].astype(np.int8), pa.int8()),
            }
        )

    def merge_final(df: pd.DataFrame):
        if not len(df) or "node" not in df.columns:
            return pa.table(
                {
                    "node": pa.array([], pa.string()),
                    "dist": pa.array([], pa.int64()),
                    "imp": pa.array([], pa.int8()),
                }
            )
        newmin = df.groupby("node")["dist"].min()
        oldmin = (
            df[df["old"] == 1]
            .groupby("node")["dist"]
            .min()
            .reindex(newmin.index)
            .fillna(unreach)
        )
        return pa.table(
            {
                "node": pa.array(newmin.index, pa.string()),
                "dist": pa.array(newmin.to_numpy(np.int64), pa.int64()),
                "imp": pa.array(
                    (newmin.to_numpy(np.int64) < oldmin.to_numpy(np.int64)).astype(
                        np.int8
                    ),
                    pa.int8(),
                ),
            }
        )

    def drop_imp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _empty_front()
        return t.select(["node", "dist"])

    refs = labels.to_arrow_refs()
    first = True
    for _ in range(_BFS_MAX_ROUNDS):
        parts = [split_block.remote(r, first) for r in refs]
        f_refs = [p[0] for p in parts]
        n_front = sum(ray.get([p[1] for p in parts]))
        if n_front == 0:  # no node improved — distances are final
            out = rd.from_arrow_refs(refs)
            if not first:
                out = out.map_batches(drop_imp, batch_format="pyarrow")
            return out
        if n_front <= _BFS_BROADCAST_FRONTIER:
            fdict: dict[str, int] = {}
            for t in ray.get(f_refs):
                for n, d in zip(t["node"].to_pylist(), t["dist"].to_pylist()):
                    fdict[n] = d
            f_ref = broadcast(fdict)

            def relay_broadcast(t: pa.Table, _ref=f_ref) -> pa.Table:
                fd = lookup_broadcast(_ref)
                srcs = t["src"].to_pylist()
                keep = [i for i, s in enumerate(srcs) if s in fd]
                if not keep:
                    return pa.table(
                        {
                            "node": pa.array([], pa.string()),
                            "dist": pa.array([], pa.int64()),
                            "old": pa.array([], pa.int8()),
                        }
                    )
                idx = pa.array(keep, pa.int64())
                return pa.table(
                    {
                        "node": t["dst"].take(idx),
                        "dist": pa.array(
                            np.fromiter(
                                (min(fd[srcs[i]] + 1, unreach) for i in keep),
                                dtype=np.int64,
                                count=len(keep),
                            ),
                            pa.int64(),
                        ),
                        "old": pa.array(
                            np.zeros(len(keep), dtype=np.int8), pa.int8()
                        ),
                    }
                )

            contrib = edges.map_batches(relay_broadcast, batch_format="pyarrow")
        else:
            frontier = rd.from_arrow_refs(f_refs).map_batches(
                lambda t: (
                    t.rename_columns(["src", "dist"])
                    if t.num_rows
                    else pa.table(
                        {
                            "src": pa.array([], pa.string()),
                            "dist": pa.array([], pa.int64()),
                        }
                    )
                ),
                batch_format="pyarrow",
            )
            contrib = shuffle_join(
                edges,
                frontier,
                on="src",
                left_cols=["src", "dst"],
                right_cols=["src", "dist"],
            ).map_batches(relay, batch_format="pyarrow", batch_size=None)
        labels_tagged = rd.from_arrow_refs(refs).map_batches(
            tag_old, batch_format="pyarrow"
        )
        labels = shuffle_agg(
            contrib.union(labels_tagged), ["node"], merge_partial, merge_final
        ).materialize()
        refs = labels.to_arrow_refs()
        first = False
    raise RuntimeError(
        f"min-distance propagation did not converge within "
        f"{_BFS_MAX_ROUNDS} rounds; graph diameter exceeds the budget"
    )


def crawl_seed_distance(sf_dir: str):
    """Minimum hop distance from the seed list to every reachable page over
    the DIRECTED link graph — the static mirror of crawl depth (what
    DEPTH_LIMIT prunes against) and the standard multi-source BFS
    primitive.  Output: (url, dist) for reachable pages, seeds at 0,
    sorted (dist asc, url asc).

    Two regimes by edge volume (the pairs_to_clusters posture):
      * ≤ _BFS_SMALL_EDGES: driver BFS over the collected edge list —
        edges ≪ pages-with-html, the node side is never collected;
      * above: iterated min-distance propagation — per round one
        shuffle_join keyed by src relaying dist+1 across edges and one
        min shuffle_agg keyed by node; the driver holds one convergence
        scalar (sum of capped distances, strictly decreasing until
        fixpoint).  O(graph diameter) rounds, ≤ _BFS_MAX_ROUNDS (refuses
        rather than returning partial distances, like pairs_to_clusters).
    Oracle: independent deque BFS (oracle_ext.oracle_crawl_seed_distance),
    materialized."""
    from scrapy__ray.pipelines.util import collect_arrow, ensure_ctx

    corpus = _corpus()
    edges = _link_edges(corpus)
    ensure_ctx()
    seeds = pq.read_table(corpus + "/seeds.parquet", columns=["url"])[
        "url"
    ].to_pylist()
    seed_set = set(seeds)
    out_schema = pa.schema([("url", pa.string()), ("dist", pa.int64())])

    n_edges = edges.count()
    if n_edges <= _BFS_SMALL_EDGES:
        from collections import deque

        adj: dict[str, list[str]] = {}
        for t in ray_get_blocks(edges):
            for s, d in zip(t["src"].to_pylist(), t["dst"].to_pylist()):
                adj.setdefault(s, []).append(d)
        dist: dict[str, int] = {u: 0 for u in seed_set}
        q = deque(sorted(seed_set))
        while q:
            u = q.popleft()
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    q.append(v)
        rows = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))
        return pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "dist": pa.array([r[1] for r in rows], pa.int64()),
            }
        )

    # distributed regime: min-distance propagation over string-keyed labels
    unreach = int(_BFS_MAX_ROUNDS + 1)

    def init_labels(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        d = np.fromiter(
            (0 if u in seed_set else unreach for u in urls),
            dtype=np.int64,
            count=len(urls),
        )
        return pa.table(
            {"node": pa.array(urls, pa.string()), "dist": pa.array(d, pa.int64())}
        )

    import ray.data as rd

    labels = (
        rd.read_parquet(corpus + "/pages", columns=["url"])
        .map_batches(init_labels, batch_format="pyarrow")
        .materialize()
    )
    labels = _min_dist_propagate(edges, labels, unreach)

    def finish(t: pa.Table) -> pa.Table:
        d = t["dist"].to_numpy(zero_copy_only=False)
        keep = d < unreach
        return pa.table(
            {
                "url": pa.array(
                    np.asarray(t["node"].to_pylist(), dtype=object)[keep],
                    pa.string(),
                ),
                "dist": pa.array(d[keep], pa.int64()),
            }
        )

    tbl = collect_arrow(
        labels.map_batches(finish, batch_format="pyarrow"), out_schema
    )
    df = tbl.to_pandas().sort_values(["dist", "url"]).reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def ray_get_blocks(ds):
    """Arrow blocks of a (small) materialized Dataset on the driver."""
    import ray

    return [t for t in ray.get(ds.materialize().to_arrow_refs()) if t.num_rows]


# ------------------------------------------------- host-level domain graph
def crawl_domain_graph(sf_dir: str):
    """Host-to-host link adjacency over the corpus — the Common-Crawl-style
    host-level webgraph (the unit of crawl partitioning, politeness budgets
    and domain-authority signals): one row per (src_host, dst_host) pair
    with total link count and distinct linking-page count, self-host edges
    included (they dominate real webgraphs and the intra/inter split is a
    consumer-side filter), sorted (n_links desc, src_host, dst_host).

    Scale: ONE hash exchange keyed by the host pair carrying
    (src_host, dst_host, src_page, cnt) partials — host-pair cardinality is
    quadratic in HOSTS, not pages, so partials collapse the page dimension
    before the exchange.  Oracle: independent single-process link-graph
    scan (oracle_ext.oracle_crawl_domain_graph), materialized."""
    from scrapy__ray.functions.url import host_of
    from scrapy__ray.pipelines.util import collect_arrow, shuffle_agg

    corpus = _corpus()
    edges = _link_edges(corpus)

    def host_rows(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "src_host": t["src_host"],
                "dst_host": pa.array(
                    [host_of(d) for d in t["dst"].to_pylist()], pa.string()
                ),
                "src": t["src"],
            }
        )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["src_host", "dst_host", "src"], as_index=False).size()
        return g.rename(columns={"size": "cnt"})

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame(
                {"src_host": pd.array([], dtype="str"),
                 "dst_host": pd.array([], dtype="str"),
                 "n_links": pd.array([], dtype="int64"),
                 "n_src_pages": pd.array([], dtype="int64")}
            )
        g = df.groupby(["src_host", "dst_host"])
        out = g["cnt"].sum().rename("n_links").to_frame()
        out["n_src_pages"] = g["src"].nunique()
        return out.reset_index()

    per_pair = shuffle_agg(
        edges.map_batches(host_rows, batch_format="pyarrow"),
        ["src_host", "dst_host"],
        partial,
        final,
    )
    tbl = collect_arrow(
        per_pair,
        pa.schema(
            [
                ("src_host", pa.string()),
                ("dst_host", pa.string()),
                ("n_links", pa.int64()),
                ("n_src_pages", pa.int64()),
            ]
        ),
    )
    df = (
        tbl.to_pandas()
        .sort_values(
            ["n_links", "src_host", "dst_host"], ascending=[False, True, True]
        )
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(df, preserve_index=False)


# ------------------------------------------------------------- HyperBall
_HB_P = 6  #: 64 registers -> 64 B sketch per node (HyperBall's design point:
#: the per-node state must be tiny because every round ships one sketch per
#: edge; p=6 gives ~13% standard error, irrelevant to the correctness gate
#: because the oracle pins the IDENTICAL register/estimator law — the match
#: is exact, not statistical)
_HB_RADIUS = 8  #: fixed ball radius — bounded rounds, diameter-independent


def _hb_init_regs(url: str) -> bytes:
    """One-element HLL(p=_HB_P) register vector for a node's own url."""
    import hashlib

    m = 1 << _HB_P
    regs = bytearray(m)
    h = int.from_bytes(hashlib.blake2b(url.encode(), digest_size=8).digest(), "big")
    idx = h >> (64 - _HB_P)
    w = (h << _HB_P) & ((1 << 64) - 1)
    regs[idx] = 64 - w.bit_length() + 1 if w else (64 - _HB_P) + 1
    return bytes(regs)


def _hb_estimate(regs: bytes) -> float:
    """HLL estimate with small-range correction.  Sequential register-order
    summation, mirrored LITERALLY by the oracle: the raw sum spans ~2^0 to
    2^-59 and is not exactly representable in float64, so a different
    summation order could differ in the last ulp — both sides sum in the
    same order to keep the match bit-exact."""
    import math

    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / sum(2.0 ** -int(b) for b in regs)
    zeros = sum(1 for b in regs if b == 0)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def crawl_hyperball(sf_dir: str):
    """HyperBall (Boldi & Vigna, "In-Core Computation of Geometric
    Centralities with HyperBall") over the corpus link graph: per page an
    HLL(p=6) sketch of the out-ball {u : dist(v→u) ≤ _HB_RADIUS}, grown by
    _HB_RADIUS hop-synchronous rounds of register-max merges
    (ball(v, r+1) = ball(v, r) ∪ union of ball(w, r) over out-neighbors
    w).  Output (url, est_ball) — the sketch's cardinality estimate,
    rounded to 2 decimals — sorted by url.  This is THE webgraph
    neighborhood-function algorithm: exact ball sizes need O(N) state per
    node, the sketch needs 64 bytes, and register-max is commutative /
    associative / idempotent, so merge order (and therefore block order)
    cannot change the result.

    Scale: sketches live as a Dataset (node, 64 B regs); each round is one
    shuffle_join keyed by dst (relay each node's sketch to its
    in-neighbors' merge) + one register-max shuffle_agg keyed by node —
    2 exchanges/round carrying E+N sketch rows, bounded rounds, nothing
    per-node on the driver.  Plan lineage severed per round (the
    pairs_to_clusters posture).  Oracle: independent single-process
    dict-of-bytearrays implementation of the same pinned law
    (oracle_ext.oracle_crawl_hyperball), materialized."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import (
        collect_arrow,
        ensure_ctx,
        shuffle_agg,
        shuffle_join,
    )

    corpus = _corpus()
    edges = _link_edges(corpus).materialize()
    ensure_ctx()

    def init_batch(t: pa.Table) -> pa.Table:
        urls = t["url"].to_pylist()
        return pa.table(
            {
                "node": pa.array(urls, pa.string()),
                "regs": pa.array([_hb_init_regs(u) for u in urls], pa.binary()),
            }
        )

    sketches = (
        rd.read_parquet(corpus + "/pages", columns=["url"])
        .map_batches(init_batch, batch_format="pyarrow")
        .materialize()
    )

    def _empty_sketch() -> pa.Table:
        return pa.table(
            {"node": pa.array([], pa.string()), "regs": pa.array([], pa.binary())}
        )

    def merge_max(df: pd.DataFrame):
        # per-node register max, vectorized: stable-sort by node, stack the
        # fixed-width buffers, np.maximum.reduceat at group boundaries
        if not len(df) or "node" not in df.columns:
            return _empty_sketch()
        order = np.argsort(df["node"].to_numpy(), kind="stable")
        nodes = df["node"].to_numpy()[order]
        mat = np.frombuffer(
            b"".join(df["regs"].to_numpy()[order]), dtype=np.uint8
        ).reshape(len(df), 1 << _HB_P)
        starts = np.r_[0, np.flatnonzero(nodes[1:] != nodes[:-1]) + 1]
        red = np.maximum.reduceat(mat, starts, axis=0)
        return pa.table(
            {
                "node": pa.array(nodes[starts], pa.string()),
                "regs": pa.array([r.tobytes() for r in red], pa.binary()),
            }
        )

    def relay(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "src" not in t.column_names:
            return _empty_sketch()
        return pa.table({"node": t["src"], "regs": t["regs"]})

    for _ in range(_HB_RADIUS):
        contrib = shuffle_join(
            edges,
            sketches.map_batches(
                lambda t: (
                    pa.table({"dst": t["node"], "regs": t["regs"]})
                    if t.num_rows
                    else pa.table(
                        {
                            "dst": pa.array([], pa.string()),
                            "regs": pa.array([], pa.binary()),
                        }
                    )
                ),
                batch_format="pyarrow",
            ),
            on="dst",
            left_cols=["src", "dst"],
            right_cols=["dst", "regs"],
        ).map_batches(relay, batch_format="pyarrow", batch_size=None)
        sketches = shuffle_agg(
            contrib.union(sketches), ["node"], merge_max, merge_max
        ).materialize()
        sketches = rd.from_arrow_refs(sketches.to_arrow_refs())

    def finish(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return pa.table(
                {
                    "url": pa.array([], pa.string()),
                    "est_ball": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "url": t["node"],
                "est_ball": pa.array(
                    [round(_hb_estimate(r), 2) for r in t["regs"].to_pylist()],
                    pa.float64(),
                ),
            }
        )

    tbl = collect_arrow(
        sketches.map_batches(finish, batch_format="pyarrow"),
        pa.schema([("url", pa.string()), ("est_ball", pa.float64())]),
    )
    df = tbl.to_pandas().sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


# --------------------------------------------------------------- k-core
#: undirected edge count at or under which the whole (deduplicated) edge
#: list gathers on the driver and the h-index fixed point runs in numpy —
#: the pairs_to_clusters small-regime posture (edges ≪ corpus bytes).
_KCORE_SMALL_EDGES = 200_000
#: node count at or under which each round's labels broadcast as a
#: node→h dict (≤ ~16 B/row) so the relay needs no exchange; above it the
#: relay is a shuffle_join keyed by neighbor — the _BFS_BROADCAST_FRONTIER
#: choice applied to a full (non-delta) label set.
_KCORE_BROADCAST_LABELS = 500_000
#: h-index propagation converges in far fewer rounds than BFS on the same
#: graph (labels drop geometrically toward coreness; Lü et al. 2016 report
#: tens of rounds on real webgraphs) — but the guard exists for the same
#: reason as _BFS_MAX_ROUNDS: refuse rather than return wrong cores.
_KCORE_MAX_ROUNDS = 512


def _hindex_per_node(node: np.ndarray, val: np.ndarray, n_nodes: int) -> np.ndarray:
    """h-index of each node's value multiset, vectorized: lexsort by
    (node, val desc); within a node's run the sorted values v_1 ≥ v_2 ≥ …
    make "v_i ≥ i" a prefix property, so h = count of positions with
    v_i ≥ i.  Nodes with no rows get 0."""
    if not len(node):
        return np.zeros(n_nodes, dtype=np.int64)
    order = np.lexsort((-val, node))
    sn, sv = node[order], val[order]
    boundary = np.flatnonzero(np.r_[True, sn[1:] != sn[:-1]])
    run_len = np.diff(np.r_[boundary, len(sn)])
    rank = np.arange(len(sn), dtype=np.int64) - np.repeat(boundary, run_len) + 1
    hits = (sv >= rank).astype(np.int64)
    return np.bincount(sn, weights=hits, minlength=n_nodes).astype(np.int64)


def _kcore_driver(n_nodes: int, ea: np.ndarray, eb: np.ndarray) -> np.ndarray:
    """Driver-side h-index fixed point over a deduplicated undirected edge
    list (ea[i]—eb[i], no self-loops, no duplicates): start every node at
    its degree, then repeatedly replace each node's label with the h-index
    of its neighbors' labels; the sequence is monotone non-increasing and
    its fixed point is the core number (Lü, Chen, Ren, Zhang, Zhang & Zhou,
    "The H-index of a network node and its relation to degree and
    coreness", Nature Communications 2016).  Deliberately a DIFFERENT
    algorithm from the oracle's Batagelj–Zaveršnik peeling — the
    both-paths-identical contract."""
    node = np.concatenate([ea, eb])
    nbr = np.concatenate([eb, ea])
    labels = np.bincount(node, minlength=n_nodes).astype(np.int64)
    for _ in range(_KCORE_MAX_ROUNDS):
        new = np.minimum(labels, _hindex_per_node(node, labels[nbr], n_nodes))
        if np.array_equal(new, labels):
            return labels
        labels = new
    raise RuntimeError(
        f"k-core h-index iteration did not converge within "
        f"{_KCORE_MAX_ROUNDS} rounds"
    )


def crawl_kcore(sf_dir: str):
    """Core number of every page in the corpus link graph — THE webgraph
    density / spam-farm / community-strength signal (a page is in the
    k-core iff it survives repeatedly deleting all nodes of degree < k).
    Graph law: undirected simple graph over the corpus pages — both link
    directions collapse to one edge, per-pair duplicates and self-loops
    dropped; isolated pages have core 0.  Output (url, core), sorted by
    url.

    Two regimes, tests force both (the pairs_to_clusters contract):

      * ≤ _KCORE_SMALL_EDGES undirected edges: the deduplicated edge ID
        list gathers on the driver (edges ≪ corpus — same posture as
        crawl_components' union-find regime) and _kcore_driver runs the
        h-index fixed point in numpy;
      * above: distributed h-index propagation — labels live as a Dataset
        (node, h) starting at degree; per round the neighbor labels relay
        across the directed edge set (broadcast dict ≤ _KCORE_BROADCAST_
        LABELS nodes, shuffle_join keyed by neighbor above), ONE exchange
        keyed by node computes each node's neighbor-h-index and flags
        drops, and per-block remote counts of the flag give the driver a
        single convergence scalar.  Plan lineage severed per round via
        to_arrow_refs/from_arrow_refs (the _min_dist_propagate posture).

    Both regimes compute the same h-index law; the oracle
    (oracle_ext.oracle_crawl_kcore, materialized) is an independent
    Batagelj–Zaveršnik bucket peeling — different algorithm, same answer
    by the 2016 h-index/coreness theorem."""
    import ray
    import ray.data as rd

    from scrapy__ray.pipelines.util import (
        broadcast,
        collect_arrow,
        ensure_ctx,
        hash_partition_map,
        lookup_broadcast,
        shuffle_join,
    )

    corpus = _corpus()
    ensure_ctx()
    urls = sorted(
        pq.read_table(corpus + "/pages", columns=["url"])["url"].to_pylist()
    )
    n_nodes = len(urls)
    id_ref = broadcast({u: i for i, u in enumerate(urls)})

    def to_pairs(t: pa.Table) -> pa.Table:
        ids = lookup_broadcast(id_ref)
        a = np.fromiter(
            (ids[s] for s in t["src"].to_pylist()), dtype=np.int64, count=t.num_rows
        )
        b = np.fromiter(
            (ids[d] for d in t["dst"].to_pylist()), dtype=np.int64, count=t.num_rows
        )
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        keep = lo != hi
        return pa.table(
            {
                "ea": pa.array(lo[keep], pa.int64()),
                "eb": pa.array(hi[keep], pa.int64()),
            }
        )

    # degree semantics need DISTINCT undirected edges (the raw link set has
    # both directions): one hash exchange keyed by the pair dedupes
    pairs = hash_partition_map(
        _link_edges(corpus).map_batches(to_pairs, batch_format="pyarrow"),
        ["ea", "eb"],
        lambda df: df.drop_duplicates(["ea", "eb"]),
    ).materialize()
    n_edges = pairs.count()

    if n_edges <= _KCORE_SMALL_EDGES:
        if n_edges:
            tbl = pa.concat_tables(
                [t for t in ray.get(pairs.to_arrow_refs()) if t.num_rows]
            )
            ea = tbl["ea"].to_numpy(zero_copy_only=False)
            eb = tbl["eb"].to_numpy(zero_copy_only=False)
        else:
            ea = eb = np.array([], dtype=np.int64)
        core = _kcore_driver(n_nodes, ea, eb)
    else:
        core = _kcore_distributed(pairs, n_nodes)

    df = pd.DataFrame({"url": urls, "core": pd.array(core, dtype="int64")})
    df = df.sort_values("url").reset_index(drop=True)
    return pa.Table.from_pandas(df, preserve_index=False)


def _kcore_distributed(pairs, n_nodes: int) -> np.ndarray:
    """Distributed h-index propagation (see crawl_kcore docstring).  Takes
    the deduplicated undirected pair Dataset [(ea, eb)], returns the core
    number per node id as a dense numpy array (the label set is one int64
    per node — driver-resident by the same small-side posture as the url
    list itself; the ROUNDS never gather more than convergence scalars)."""
    import ray
    import ray.data as rd

    from scrapy__ray.pipelines.util import (
        broadcast,
        hash_partition_map,
        lookup_broadcast,
        shuffle_agg,
        shuffle_join,
    )

    def both_dirs(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pa.concat_arrays(
                    [t["ea"].combine_chunks(), t["eb"].combine_chunks()]
                ),
                "nbr": pa.concat_arrays(
                    [t["eb"].combine_chunks(), t["ea"].combine_chunks()]
                ),
            }
        )

    edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()

    # initial labels = degree: partial-sum per block, one exchange by node
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("node", as_index=False).size()
        return g.rename(columns={"size": "h"})

    def deg_final(df: pd.DataFrame) -> pa.Table:
        if not len(df) or "node" not in df.columns:
            return _kcore_empty_labels()
        g = df.groupby("node", as_index=False)["h"].sum()
        return pa.table(
            {
                "node": pa.array(g["node"].to_numpy(np.int64), pa.int64()),
                "h": pa.array(g["h"].to_numpy(np.int64), pa.int64()),
            }
        )

    labels = shuffle_agg(edges, ["node"], deg_partial, deg_final).materialize()

    def tag_old(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _kcore_empty_tagged()
        t = t.select(["node", "h"])
        return t.append_column(
            "old", pa.array(np.ones(t.num_rows, dtype=np.int8), pa.int8())
        )

    def merge_final(df: pd.DataFrame) -> pa.Table:
        if not len(df) or "node" not in df.columns:
            return pa.table(
                {
                    "node": pa.array([], pa.int64()),
                    "h": pa.array([], pa.int64()),
                    "imp": pa.array([], pa.int8()),
                }
            )
        old = df[df["old"] == 1].set_index("node")["h"]
        c = df[df["old"] == 0]
        if len(c):
            node = c["node"].to_numpy(np.int64)
            val = c["h"].to_numpy(np.int64)
            # per-node h-index inside this hash partition (every contrib
            # row of a node lands here — the exchange key is the node)
            order = np.lexsort((-val, node))
            sn, sv = node[order], val[order]
            boundary = np.flatnonzero(np.r_[True, sn[1:] != sn[:-1]])
            run_len = np.diff(np.r_[boundary, len(sn)])
            rank = (
                np.arange(len(sn), dtype=np.int64)
                - np.repeat(boundary, run_len)
                + 1
            )
            hits = (sv >= rank).astype(np.int64)
            hidx = pd.Series(hits, index=sn).groupby(level=0).sum()
        else:
            hidx = pd.Series(dtype=np.int64)
        hidx = hidx.reindex(old.index).fillna(old).astype(np.int64)
        new = np.minimum(old.to_numpy(np.int64), hidx.to_numpy(np.int64))
        return pa.table(
            {
                "node": pa.array(old.index.to_numpy(np.int64), pa.int64()),
                "h": pa.array(new, pa.int64()),
                "imp": pa.array(
                    (new < old.to_numpy(np.int64)).astype(np.int8), pa.int8()
                ),
            }
        )

    @ray.remote
    def count_imp(t: pa.Table) -> int:
        import pyarrow.compute as pc

        if t.num_rows == 0 or "imp" not in t.column_names:
            return 0
        return pc.sum(t["imp"]).as_py() or 0

    def drop_imp(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or "node" not in t.column_names:
            return _kcore_empty_labels()
        return t.select(["node", "h"])

    refs = labels.to_arrow_refs()
    for rnd in range(_KCORE_MAX_ROUNDS):
        if n_nodes <= _KCORE_BROADCAST_LABELS:
            # dense node-id-indexed label vector (ids are url ranks, 8 B/
            # node) — the relay becomes one vectorized fancy-index
            ldense = np.zeros(n_nodes, dtype=np.int64)
            for t in ray.get(refs):
                if t.num_rows and "node" in t.column_names:
                    ldense[t["node"].to_numpy(zero_copy_only=False)] = t[
                        "h"
                    ].to_numpy(zero_copy_only=False)
            l_ref = broadcast(ldense)

            def relay_broadcast(t: pa.Table, _ref=l_ref) -> pa.Table:
                ld = lookup_broadcast(_ref)
                nb = t["nbr"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "node": t["node"],
                        "h": pa.array(ld[nb], pa.int64()),
                        "old": pa.array(
                            np.zeros(t.num_rows, dtype=np.int8), pa.int8()
                        ),
                    }
                )

            contrib = edges.map_batches(relay_broadcast, batch_format="pyarrow")
        else:
            lbl = rd.from_arrow_refs(refs).map_batches(
                lambda t: (
                    t.select(["node", "h"]).rename_columns(["nbr", "h"])
                    if t.num_rows and "node" in t.column_names
                    else pa.table(
                        {
                            "nbr": pa.array([], pa.int64()),
                            "h": pa.array([], pa.int64()),
                        }
                    )
                ),
                batch_format="pyarrow",
            )
            contrib = shuffle_join(
                edges,
                lbl,
                on="nbr",
                left_cols=["nbr", "node"],
                right_cols=["nbr", "h"],
            ).map_batches(
                lambda t: (
                    pa.table(
                        {
                            "node": t["node"],
                            "h": t["h"],
                            "old": pa.array(
                                np.zeros(t.num_rows, dtype=np.int8), pa.int8()
                            ),
                        }
                    )
                ),
                batch_format="pyarrow",
                batch_size=None,
            )
        tagged = rd.from_arrow_refs(refs).map_batches(
            tag_old, batch_format="pyarrow"
        )
        labels = hash_partition_map(
            contrib.union(tagged), ["node"], merge_final
        ).materialize()
        refs = labels.to_arrow_refs()
        n_imp = sum(ray.get([count_imp.remote(r) for r in refs]))
        if n_imp == 0:
            core = np.zeros(n_nodes, dtype=np.int64)
            for t in ray.get(refs):
                if t.num_rows and "node" in t.column_names:
                    core[t["node"].to_numpy(zero_copy_only=False)] = t[
                        "h"
                    ].to_numpy(zero_copy_only=False)
            return core
    raise RuntimeError(
        f"k-core propagation did not converge within {_KCORE_MAX_ROUNDS} rounds"
    )


def _kcore_empty_labels() -> pa.Table:
    return pa.table(
        {"node": pa.array([], pa.int64()), "h": pa.array([], pa.int64())}
    )


def _kcore_empty_tagged() -> pa.Table:
    return pa.table(
        {
            "node": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
            "old": pa.array([], pa.int8()),
        }
    )


def crawl_warc_source(sf_dir: str):
    """Pages read FROM WARC — Common Crawl's wire format — instead of
    parquet: ``warc_mirror`` shards the fixture corpus as per-record-gzip
    ``.warc.gz`` (one shard per pages partition), ``read_warc`` parses
    them back into the pages schema as a Dataset, and the rollup digests
    every record per host: page count, html bytes, and the wraparound sum
    of per-record sha1(url|ts_us|html) 32-bit prefixes (order-independent,
    so partials combine across any block split).  tests/test_warc.py
    computes the identical rollup straight from the parquet partitions and
    asserts frame equality — the byte-level WARC round-trip evidence.
    Host cardinality is unbounded at the design point, so the rollup takes
    the hash-shuffle path, never a driver concat."""
    import hashlib
    from urllib.parse import urlsplit

    from scrapy__ray.pipelines.util import collect_arrow, shuffle_agg
    from scrapy__ray.sources.warc import read_warc, warc_mirror

    ds = read_warc(warc_mirror(_corpus()))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ts_us = df["warc_ts"].values.astype("datetime64[us]").astype("int64")
        digs = np.fromiter(
            (
                int.from_bytes(
                    hashlib.sha1(
                        u.encode() + b"|" + str(t).encode() + b"|" + h
                    ).digest()[:4],
                    "big",
                )
                for u, t, h in zip(df["url"], ts_us, df["html"])
            ),
            dtype=np.int64,
            count=len(df),
        )
        g = pd.DataFrame(
            {
                "host": [urlsplit(u).netloc for u in df["url"]],
                "n_pages": np.ones(len(df), dtype=np.int64),
                "html_bytes": df["html"].str.len().values.astype(np.int64),
                "digest_sum": digs,
            }
        )
        return g.groupby("host", as_index=False).sum()

    res = collect_arrow(
        shuffle_agg(
            ds,
            ["host"],
            partial,
            lambda df: df.groupby("host", as_index=False).sum(),
        ),
        pa.schema(
            [
                ("host", pa.string()),
                ("n_pages", pa.int64()),
                ("html_bytes", pa.int64()),
                ("digest_sum", pa.int64()),
            ]
        ),
    )
    return res.to_pandas().sort_values("host").reset_index(drop=True)


_TRAP_MIN_URLS = 5


def crawl_url_templates(sf_dir: str):
    """URL template mining / crawler-trap detection: collapse digit runs
    in the path+query to ``{d}`` and parameter values to ``=``, count
    URLs per (host, template), and report templates covering ≥
    ``_TRAP_MIN_URLS`` URLs — the signal a production frontier uses to
    cap calendar/session-id traps (a template absorbing 10^6 URLs on one
    host is a trap, not content).

    Fully vectorized: two pandas regex passes over the url column (host
    split off first so digits in the hostname survive), then the standard
    partial → hash-shuffle by (host, template) → vectorized final rollup;
    template cardinality is unbounded at the design point (that is the
    trap!) so no driver-side concat.  Independent pure-Python oracle in
    tests/test_warc.py::test_url_templates_oracle."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import collect_arrow, ensure_ctx, shuffle_agg

    ensure_ctx()
    ds = rd.read_parquet(_corpus() + "/pages", columns=["url"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        parts = df["url"].str.extract(r"^([a-z][a-z0-9+.-]*://[^/?#]*)(.*)$")
        rest = (
            parts[1]
            .fillna("")
            .str.replace(r"=[^&#]*", "=", regex=True)
            .str.replace(r"\d+", "{d}", regex=True)
        )
        g = pd.DataFrame(
            {
                "host": parts[0].str.replace(
                    r"^[a-z][a-z0-9+.-]*://", "", regex=True
                ),
                "template": rest,
                "n_urls": np.ones(len(df), dtype=np.int64),
            }
        )
        return g.groupby(["host", "template"], as_index=False).sum()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["host", "template"], as_index=False).sum()
        return g[g["n_urls"] >= _TRAP_MIN_URLS]

    res = collect_arrow(
        shuffle_agg(ds, ["host", "template"], partial, final),
        pa.schema(
            [
                ("host", pa.string()),
                ("template", pa.string()),
                ("n_urls", pa.int64()),
            ]
        ),
    )
    return (
        res.to_pandas()
        .sort_values(["host", "template"])
        .reset_index(drop=True)
    )


QUERIES = {
    "crawl_fetch_log": (crawl_fetch_log, None),
    "crawl_extract_identity": (crawl_extract_identity, None),
    "crawl_metrics": (crawl_metrics, None),
    "crawl_host_summary": (crawl_host_summary, None),
    "crawl_css_extract": (crawl_css_extract, None),
    "crawl_xpath_extract": (crawl_xpath_extract, None),
    "crawl_inlinks": (crawl_inlinks, None),
    "crawl_pagerank": (crawl_pagerank, None),
    "crawl_hits": (crawl_hits, None),
    "crawl_triangles": (crawl_triangles, None),
    "crawl_main_content": (crawl_main_content, None),
    "crawl_paragraph_dedup": (crawl_paragraph_dedup, None),
    "crawl_anchor_text": (crawl_anchor_text, None),
    "crawl_components": (crawl_components, None),
    "crawl_domain_graph": (crawl_domain_graph, None),
    "crawl_seed_distance": (crawl_seed_distance, None),
    "crawl_hyperball": (crawl_hyperball, None),
    "crawl_kcore": (crawl_kcore, None),
    "crawl_clustering_coef": (crawl_clustering_coef, None),
    "crawl_warc_source": (crawl_warc_source, None),
    "crawl_url_templates": (crawl_url_templates, None),
}
