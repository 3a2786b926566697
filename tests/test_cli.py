"""CLI surface (`python -m scrapy__ray`, SURVEY.md §3.1/§3.2): the
`scrapy crawl` analogue that `ray job submit` invokes.  The crawl
subcommand owns its own Ray session, so the smoke test runs it in a
subprocess rather than under the shared session fixture."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest


def test_parse_set_typing():
    from scrapy__ray.__main__ import _parse_set
    from scrapy__ray.config import CrawlConfig

    out = _parse_set(
        CrawlConfig,
        [
            "retry_times=3",
            "download_delay=0.25",
            "robots_obey=false",
            "allowed_domains=example,other",
            "max_pages=none",
        ],
    )
    assert out == {
        "retry_times": 3,
        "download_delay": 0.25,
        "robots_obey": False,
        "allowed_domains": ("example", "other"),
        "max_pages": None,
    }
    with pytest.raises(SystemExit):
        _parse_set(CrawlConfig, ["not_a_field=1"])
    with pytest.raises(SystemExit):
        _parse_set(CrawlConfig, ["retry_times"])  # missing '='


def test_cli_crawl_smoke(tmp_path):
    import fixtures.gen as fxgen

    corpus = fxgen.generate("sf-small", fxgen.default_dir("sf-small"))
    r = subprocess.run(
        [
            sys.executable,
            "-m",
            "scrapy__ray",
            "crawl",
            "--corpus",
            corpus,
            "--out",
            str(tmp_path / "out"),
            "--max-rounds",
            "2",
            "--set",
            "download_delay=0.5",
        ],
        capture_output=True,
        text=True,
        timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rounds"] == 2
    assert summary["fetched"] > 0
    assert summary["totals"]["fetched"] == summary["fetched"]


def test_cli_mirror_then_crawl(tmp_path):
    root = tmp_path / "mirror"
    (root / "h.example").mkdir(parents=True)
    (root / "h.example" / "index.html").write_text(
        '<html><body><p>home</p><a href="a.html">a</a></body></html>'
    )
    (root / "h.example" / "a.html").write_text("<html><body><p>aa</p></body></html>")
    r = subprocess.run(
        [sys.executable, "-m", "scrapy__ray", "mirror",
         "--root", str(root), "--out", str(tmp_path / "corpus")],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    info = json.loads(r.stdout.strip().splitlines()[-1])
    assert info["hosts"] == 1
    r2 = subprocess.run(
        [sys.executable, "-m", "scrapy__ray", "crawl",
         "--corpus", str(tmp_path / "corpus"), "--out", str(tmp_path / "out")],
        capture_output=True, text=True, timeout=240,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    summary = json.loads(r2.stdout.strip().splitlines()[-1])
    assert summary["fetched"] == 2


def test_cli_mimic_smoke(tmp_path):
    """`python -m scrapy__ray mimic --only <q>` runs the driver-comparator
    sweep for one query, writes the report, exits 0 on green and rejects
    unknown names loudly."""
    out = tmp_path / "mimic.json"
    r = subprocess.run(
        [
            sys.executable, "-m", "scrapy__ray", "mimic",
            "--sf", "/root/testdata/sf0.001",
            "--only", "lineitem_pricing_summary",
            "--out", str(out),
        ],
        capture_output=True, text=True, timeout=240,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    line = json.loads(r.stdout.strip().splitlines()[-1])
    assert line["total"] == 1 and line["green"] == 1
    report = json.loads(out.read_text())
    rec = report["queries"]["lineitem_pricing_summary"]
    assert rec["rows_match"] and rec["schema_match"] and rec["hash_match"]

    bad = subprocess.run(
        [
            sys.executable, "-m", "scrapy__ray", "mimic",
            "--sf", "/root/testdata/sf0.001", "--only", "definitely_not_a_query",
        ],
        capture_output=True, text=True, timeout=240,
    )
    assert bad.returncode != 0
    assert "unknown query name" in (bad.stderr + bad.stdout)
