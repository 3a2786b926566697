"""S2 over real sockets: crawl a stdlib http.server on 127.0.0.1 through
the unchanged engine — real robots gating, real 301 relay (M4), real
503-then-200 retry (M3), byte-identical extraction of real bodies.

Loopback networking works in this sandbox even though the wider network
does not, so the net handler is tested for real, not declared."""

from __future__ import annotations

import http.server
import os
import socketserver
import threading

import pyarrow.parquet as pq
import pytest

from scrapy__ray.config import CrawlConfig
from scrapy__ray.functions.textextract import extract_text

_PAGES = {
    "/": "<html><head><title>root</title></head><body><h1>root</h1>"
         '<ul><li><a href="/p/0">a</a></li><li><a href="/p/1">b</a></li>'
         '<li><a href="/p/2">c</a></li><li><a href="/p/3">denied</a></li>'
         '<li><a href="/old">moved</a></li><li><a href="/flaky">f</a></li>'
         "</ul></body></html>",
    "/p/0": "<html><body><h1>p0</h1><p>zero</p></body></html>",
    "/p/1": "<html><body><h1>p1</h1><p>one</p></body></html>",
    "/p/2": "<html><body><h1>p2</h1><p>two &amp; more</p></body></html>",
    "/p/3": "<html><body><h1>p3</h1><p>robots say no</p></body></html>",
    "/new": "<html><body><h1>new</h1><p>relocated</p></body></html>",
    "/flaky": "<html><body><h1>flaky</h1><p>finally</p></body></html>",
}
_ROBOTS = "User-agent: *\nDisallow: /p/3\n"


class _SiteHandler(http.server.BaseHTTPRequestHandler):
    flaky_hits = 0

    def do_GET(self):  # noqa: N802 (stdlib API name)
        if self.path == "/robots.txt":
            return self._send(200, _ROBOTS.encode())
        if self.path == "/old":
            self.send_response(301)
            self.send_header("Location", "/new")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return None
        if self.path == "/flaky":
            type(self).flaky_hits += 1
            if type(self).flaky_hits == 1:
                return self._send(503, b"try later")
        body = _PAGES.get(self.path)
        if body is None:
            return self._send(404, b"nope")
        return self._send(200, body.encode())

    def _send(self, code: int, body: bytes) -> None:
        self.send_response(code)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def live_site():
    _SiteHandler.flaky_hits = 0
    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), _SiteHandler) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield f"http://127.0.0.1:{port}"
        srv.shutdown()


def test_net_crawl_end_to_end(ray_session, live_site, tmp_path):
    from scrapy__ray.engine import crawl
    from scrapy__ray.sources.netfetch import build_net_corpus

    corpus = build_net_corpus([f"{live_site}/"], str(tmp_path / "corpus"))
    cfg = CrawlConfig(allowed_domains=("127.0.0.1",), max_rounds=8)
    summary = crawl(corpus, str(tmp_path / "out"), cfg=cfg)

    res = pq.read_table(os.path.join(str(tmp_path / "out"), "results"))
    by_url = {}
    for r in res.to_pylist():
        by_url.setdefault(r["url"], []).append(r)

    base = live_site
    # robots: /p/3 linked from the root but never fetched
    assert f"{base}/p/3" not in by_url
    assert summary.totals["robots_denied"] >= 1
    # real redirect relayed by M4: /old logs 301, /new fetched with body
    assert [r["status"] for r in by_url[f"{base}/old"]] == [301]
    assert summary.totals["redirects"] >= 1
    # real 503 retried by M3, then served
    sts = sorted(r["status"] for r in by_url[f"{base}/flaky"])
    assert sts == [200, 503]
    assert summary.totals["retried"] >= 1
    # byte-identical extraction of the real bodies
    for path, html in _PAGES.items():
        if path == "/p/3":
            continue
        rows = [r for r in by_url.get(f"{base}{path}", []) if r["status"] == 200]
        assert rows, path
        assert rows[0]["extracted_text"] == extract_text(html.encode()), path
    # every 200 fetch measured a real (non-simulated) latency
    lats = [r["latency_ms"] for r in res.to_pylist() if r["status"] == 200]
    assert lats and all(l >= 0.0 for l in lats)
    assert summary.total_fetched == len(
        [p for p in _PAGES if p != "/p/3"]
    )


def test_fetch_robots_conventions(live_site):
    """urllib.robotparser status conventions: 200 -> body; 401/403 ->
    disallow-all; 404/errors -> allow-all; schemeless seeds rejected."""
    from scrapy__ray.sources.netfetch import build_net_corpus, fetch_robots

    assert fetch_robots(live_site) == _ROBOTS
    # a refused port -> allow-all (connection-failure convention)
    assert "Allow: /" in fetch_robots("http://127.0.0.1:1")
    with pytest.raises(ValueError, match="absolute"):
        build_net_corpus(["127.0.0.1/x"], "/tmp/nc-bad")


class _Forbidden(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802
        code = 403 if self.path == "/robots.txt" else 200
        body = b"<html><body><p>secret</p></body></html>"
        self.send_response(code)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_403_robots_disallows_everything(ray_session, tmp_path):
    """A bot-blocking site (403 robots.txt) must be crawled NOT AT ALL —
    the RobotFileParser disallow-all convention, end to end."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.sources.netfetch import build_net_corpus

    with socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Forbidden) as srv:
        port = srv.server_address[1]
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        corpus = build_net_corpus(
            [f"http://127.0.0.1:{port}/"], str(tmp_path / "c403")
        )
        cfg = CrawlConfig(allowed_domains=("127.0.0.1",), max_rounds=4)
        summary = crawl(corpus, str(tmp_path / "o403"), cfg=cfg)
        srv.shutdown()
    assert summary.total_fetched == 0
    assert summary.totals["robots_denied"] >= 1


def test_invalid_url_is_terminal_not_retried():
    """http.client.InvalidURL subclasses HTTPException (NOT ValueError);
    it must be classified terminal (NOTFOUND) before the connection-retry
    clause — a junk port cannot become fetchable by retrying."""
    from fixtures import faults
    from scrapy__ray.sources.netfetch import http_fetch

    st, body, loc, _lat = http_fetch("http://127.0.0.1:junkport/x")
    assert st == faults.STATUS_NOTFOUND
    assert body is None and loc == ""


def test_autothrottle_accumulates_measured_latency_in_net_mode(ray_session):
    """T2 over S2: with a net-type corpus the expand stage must feed the
    MEASURED per-row latency_ms into the AutoThrottle accumulator, not the
    simulated fault-model latency (which is a hash of the url — meaningless
    for a live site)."""
    import pyarrow as pa
    import ray

    from fixtures import faults
    from scrapy__ray.stages.crawl_stages import expand_push_batch

    @ray.remote
    class _Sink:
        def __init__(self):
            self.lat_accs = []

        def push(self, sig, tbl, early, lat_acc, cookie_acc):
            if lat_acc:
                self.lat_accs.append(dict(lat_acc))
            return 0

        def get(self):
            return self.lat_accs

    url = "http://h0.example/p/0"
    measured_ms = 7.25

    def mk_batch():
        return pa.table(
            {
                "url": [url],
                "host": ["h0.example"],
                "host_hash": pa.array([0], pa.uint64()),
                "fingerprint": pa.array([b"\x01" * 20], pa.binary()),
                "priority": pa.array([0], pa.int32()),
                "depth": pa.array([0], pa.int32()),
                "disc_round": pa.array([-1], pa.int32()),
                "parent_url": [""],
                "link_idx": pa.array([0], pa.int32()),
                "retry_count": pa.array([0], pa.int32()),
                "redirect_count": pa.array([0], pa.int32()),
                "skip_dedup": [True],
                "cookiejar": pa.array([0], pa.int32()),
                "meta_proxy": [""],
                "round": pa.array([0], pa.int32()),
                "fetch_seq_in_host": pa.array([0], pa.int32()),
                "fetch_vtime": pa.array([0.0], pa.float64()),
                "cookies": [""],
                "status": pa.array([faults.STATUS_OK], pa.int32()),
                "location": [""],
                "latency_ms": pa.array([measured_ms], pa.float32()),
                "extracted_text": ["x"],
                "out_links": pa.array([[]], pa.list_(pa.string())),
                "meta_refresh_url": [""],
                "meta_refresh_delay": pa.array([-1.0], pa.float64()),
                "ajax_crawlable": [False],
            }
        )

    got = {}
    for net_mode in (False, True):
        sink = _Sink.remote()
        cfg = CrawlConfig(autothrottle_enabled=True)
        expand_push_batch(
            mk_batch(), cfg=cfg, shards=[sink], stats=None, net_mode=net_mode
        )
        accs = ray.get(sink.get.remote())
        assert len(accs) == 1 and accs[0]["h0.example"][1] == 1
        got[net_mode] = accs[0]["h0.example"][0]
    assert got[True] == int(round(measured_ms * 1000.0))  # measured, in µs
    assert got[False] == faults.latency_us(url)  # simulated fault model
    assert got[True] != got[False]


# ------------------------------------------------- S3: FTP over loopback
class _MiniFtpHandler(socketserver.StreamRequestHandler):
    """Minimal stdlib FTP server (USER/PASS/TYPE/PASV/RETR/QUIT subset) —
    just enough protocol for ftplib's retrbinary path, serving
    ``server.files`` (path -> bytes).  PASV only; one data connection per
    RETR."""

    def handle(self):  # noqa: D102
        import socket

        files = self.server.files
        rf = self.connection.makefile("rb")
        w = self.connection.makefile("wb")

        def send(line: str) -> None:
            w.write((line + "\r\n").encode())
            w.flush()

        send("220 mini ftp ready")
        data_listener = None
        try:
            while True:
                raw = rf.readline()
                if not raw:
                    break
                line = raw.decode("latin-1").strip()
                cmd, _, arg = line.partition(" ")
                cmd = cmd.upper()
                if cmd == "USER":
                    send("331 password please")
                elif cmd == "PASS":
                    send("230 logged in")
                elif cmd in ("TYPE", "NOOP"):
                    send("200 ok")
                elif cmd == "SYST":
                    send("215 UNIX Type: L8")
                elif cmd == "PASV":
                    if data_listener is not None:
                        data_listener.close()
                    data_listener = socket.create_server(("127.0.0.1", 0))
                    p = data_listener.getsockname()[1]
                    send(f"227 Entering Passive Mode (127,0,0,1,{p >> 8},{p & 0xFF})")
                elif cmd == "RETR":
                    body = files.get(arg)
                    if body is None:
                        send("550 no such file")
                    elif data_listener is None:
                        send("425 use PASV first")
                    else:
                        send("150 opening data connection")
                        conn, _addr = data_listener.accept()
                        conn.sendall(body)
                        conn.close()
                        data_listener.close()
                        data_listener = None
                        send("226 transfer complete")
                elif cmd == "QUIT":
                    send("221 bye")
                    break
                else:
                    send("502 not implemented")
        except (OSError, ValueError):
            pass
        finally:
            if data_listener is not None:
                data_listener.close()


@pytest.fixture(scope="module")
def ftp_site():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _MiniFtpHandler)
    srv.files = {
        "/pub/a.html": b"<html><body><p>ftp body A</p></body></html>",
        "/pub/big.bin": b"x" * 4096,
    }
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"ftp://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_ftp_fetch_ok_notfound_toobig(ftp_site):
    """S3 FTP handler: real RETR over PASV returns the exact bytes; 550 is
    terminal NOTFOUND; maxsize aborts mid-transfer as TOOBIG; a refused
    port is retryable."""
    from fixtures import faults
    from scrapy__ray.sources.netfetch import ftp_fetch, http_fetch

    st, body, loc, lat = ftp_fetch(f"{ftp_site}/pub/a.html")
    assert st == faults.STATUS_OK
    assert body == b"<html><body><p>ftp body A</p></body></html>"
    assert lat >= 0.0 and loc == ""

    # scheme dispatch through the shared entry point
    st2, body2, _, _ = http_fetch(f"{ftp_site}/pub/a.html")
    assert (st2, body2) == (st, body)

    st, body, _, _ = ftp_fetch(f"{ftp_site}/pub/missing.html")
    assert st == faults.STATUS_NOTFOUND and body is None

    st, body, _, _ = ftp_fetch(f"{ftp_site}/pub/big.bin", maxsize=100)
    assert st == faults.STATUS_TOOBIG and body is None

    st, _, _, _ = ftp_fetch("ftp://127.0.0.1:1/pub/a.html")
    assert st == faults.STATUS_RETRY


def test_ftp_robots_convention():
    """robots.txt is an HTTP convention — ftp bases are allow-all without
    any network round trip."""
    from scrapy__ray.sources.netfetch import fetch_robots

    assert fetch_robots("ftp://127.0.0.1:1") == "User-agent: *\nAllow: /\n"


def test_ftp_seed_crawls_through_engine(ray_session, ftp_site, tmp_path):
    """An ftp:// seed rides the UNCHANGED engine: net corpus -> fetch over
    the real FTP data channel -> extract byte-identity."""
    from scrapy__ray.engine import crawl
    from scrapy__ray.functions.textextract import extract_text
    from scrapy__ray.sources.netfetch import build_net_corpus

    corpus = build_net_corpus(
        [f"{ftp_site}/pub/a.html"], str(tmp_path / "ftpc")
    )
    cfg = CrawlConfig(allowed_domains=("127.0.0.1",), max_rounds=3)
    summary = crawl(corpus, str(tmp_path / "ftpo"), cfg=cfg)
    assert summary.total_fetched == 1
    res = pq.read_table(
        str(tmp_path / "ftpo") + "/results",
        columns=["url", "status", "extracted_text"],
    )
    rows = {u: (s, t) for u, s, t in zip(res["url"].to_pylist(),
                                         res["status"].to_pylist(),
                                         res["extracted_text"].to_pylist())}
    u = f"{ftp_site}/pub/a.html"
    assert rows[u][0] == 200
    assert rows[u][1] == extract_text(
        b"<html><body><p>ftp body A</p></body></html>"
    )
