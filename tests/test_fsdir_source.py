"""S3 file:// download-handler analogue (sources/fsdir.py).

A wget-style on-disk mirror (one directory per host) is crawled through the
full engine — frontier shards, dedup, politeness, extract — with bodies read
from the filesystem at fetch time (no pages parquet).  Gates: reachable-set
exactness, byte-identical extracted text vs a direct single-process parse of
each file, cross-host file:// link following, no fault injection on the file
scheme, and the traversal guard on url->path mapping.
"""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from scrapy__ray.config import CrawlConfig
from scrapy__ray.functions.textextract import extract_page_full
from scrapy__ray.sources import fsdir


def _w(root: str, rel: str, html: str) -> None:
    path = os.path.join(root, rel)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", encoding="utf-8") as f:
        f.write(html)


@pytest.fixture(scope="module")
def mirror(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("mirror"))
    _w(
        root,
        "sitea.example/index.html",
        "<html><body><h1>Site A</h1>"
        '<a href="a.html">a</a> <a href="sub/b.html">b</a> '
        '<a href="file://siteb.example/c.html">cross</a> '
        '<a href="http://h99.example/p/0">net</a> '
        '<a href="mailto:x@y">mail</a></body></html>',
    )
    _w(
        root,
        "sitea.example/a.html",
        "<html><body><p>alpha text</p><a href=\"index.html\">home</a></body></html>",
    )
    _w(
        root,
        "sitea.example/sub/b.html",
        '<html><body><p>beta text</p><a href="../a.html">up</a></body></html>',
    )
    _w(root, "sitea.example/orphan.html", "<html><body>never linked</body></html>")
    _w(
        root,
        "siteb.example/index.html",
        '<html><body><p>Site B home</p><a href="c.html">c</a></body></html>',
    )
    _w(root, "siteb.example/c.html", "<html><body><p>gamma text</p></body></html>")
    _w(root, "notadir.txt/ignored", "not html")  # no .html files -> not a host
    return root


def test_build_metadata(mirror, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fscorpus"))
    fsdir.build_fsdir_corpus(mirror, out)
    hosts = pq.read_table(os.path.join(out, "hosts.parquet"))
    assert hosts["host"].to_pylist() == ["sitea.example", "siteb.example"]
    assert hosts["n_pages"].to_pylist() == [4, 2]
    seeds = pq.read_table(os.path.join(out, "seeds.parquet"))
    assert seeds["url"].to_pylist() == [
        "file://sitea.example/index.html",
        "file://siteb.example/index.html",
    ]


def test_mixed_case_host_dir_rejected(tmp_path):
    _w(str(tmp_path), "SiteA.example/index.html", "<html><body>x</body></html>")
    with pytest.raises(ValueError, match="lowercase"):
        fsdir.build_fsdir_corpus(str(tmp_path), str(tmp_path / "out"))


def test_body_path_traversal_guard(mirror):
    assert fsdir.body_path(mirror, "file://sitea.example/a.html") == os.path.join(
        mirror, "sitea.example", "a.html"
    )
    assert fsdir.body_path(mirror, "file://sitea.example/../secret") is None
    assert fsdir.body_path(mirror, "file://sitea.example/a/../../secret") is None
    assert fsdir.body_path(mirror, "file:///etc/passwd") is None
    assert fsdir.body_path(mirror, "http://sitea.example/a.html") is None
    assert fsdir.read_body(mirror, "file://sitea.example/missing.html") is None
    assert b"alpha" in fsdir.read_body(mirror, "file://sitea.example/a.html")


def test_parse_data_uri_vectors():
    import base64

    from scrapy__ray.sources.datauri import parse_data_uri

    html = b"<html><body>hi there</body></html>"
    b64 = base64.b64encode(html).decode()
    assert parse_data_uri(f"data:text/html;base64,{b64}") == html
    # percent-encoded plain payload (the canonicalized form)
    assert (
        parse_data_uri("data:text/html,%3Cb%3Ehi%20x%3C/b%3E") == b"<b>hi x</b>"
    )
    assert parse_data_uri("data:text/plain,plain") == b"plain"
    assert parse_data_uri("data:nocomma") is None  # missing separator
    assert parse_data_uri("data:text/html;base64,!!!notb64") is None
    assert parse_data_uri("http://x/y") is None


def test_data_uri_seed_crawl(ray_session, mirror, tmp_path_factory):
    """A data: seed decodes to HTML whose absolute file:// link pulls the
    engine into the mirror — the upstream handler-chaining behavior."""
    import base64

    import pyarrow as pa

    from scrapy__ray.engine import crawl

    corpus = str(tmp_path_factory.mktemp("datacorpus"))
    fsdir.build_fsdir_corpus(mirror, corpus)
    html = (
        b"<html><body><p>inline seed</p>"
        b'<a href="file://siteb.example/c.html">into mirror</a></body></html>'
    )
    seed = "data:text/html;base64," + base64.b64encode(html).decode()
    pq.write_table(
        pa.table(
            {
                "url": pa.array([seed], pa.string()),
                "seed_order": pa.array([0], pa.int32()),
            }
        ),
        os.path.join(corpus, "seeds.parquet"),
        compression="zstd",
    )
    out = str(tmp_path_factory.mktemp("dataout"))
    summary = crawl(corpus, out, cfg=CrawlConfig(num_shards=2))
    res = pq.read_table(os.path.join(out, "results"))
    by_url = dict(
        zip(res["url"].to_pylist(), zip(res["status"].to_pylist(),
                                        res["extracted_text"].to_pylist()))
    )
    assert by_url[seed][0] == 200
    assert by_url[seed][1] == extract_page_full(html)[0]
    # the file:// link was followed out of the data: page
    assert by_url["file://siteb.example/c.html"][0] == 200
    assert summary.totals["fetched"] == 2
    assert summary.totals["errors"] == 0


def test_fsdir_crawl_end_to_end(ray_session, mirror, tmp_path_factory):
    from scrapy__ray.engine import crawl

    corpus = str(tmp_path_factory.mktemp("fscorpus_run"))
    fsdir.build_fsdir_corpus(mirror, corpus)
    out = str(tmp_path_factory.mktemp("fsout"))
    summary = crawl(corpus, out, cfg=CrawlConfig(num_shards=2))

    res = pq.read_table(os.path.join(out, "results"))
    by_url = {
        u: (st, tx)
        for u, st, tx in zip(
            res["url"].to_pylist(),
            res["status"].to_pylist(),
            res["extracted_text"].to_pylist(),
        )
    }
    reachable = {
        "file://sitea.example/index.html",
        "file://sitea.example/a.html",
        "file://sitea.example/sub/b.html",
        "file://siteb.example/index.html",
        "file://siteb.example/c.html",
    }
    # every reachable file fetched OK exactly once; orphan never fetched;
    # the network url was attempted and 404'd (no corpus behind it); the
    # mailto link never became a request
    assert res.num_rows == len(by_url)
    for u in reachable:
        assert by_url[u][0] == 200, u
    assert "file://sitea.example/orphan.html" not in by_url
    assert by_url["http://h99.example/p/0"][0] == 404
    assert set(by_url) == reachable | {"http://h99.example/p/0"}
    # metrics: the five 200s are fetches; the network 404 lands in errors
    assert summary.totals["fetched"] == len(reachable)
    assert summary.totals["errors"] == 1

    # byte-identical extracted text vs a direct single-process parse
    for u in reachable:
        path = fsdir.body_path(mirror, u)
        with open(path, "rb") as f:
            expect = extract_page_full(f.read())[0]
        assert by_url[u][1] == expect, u
