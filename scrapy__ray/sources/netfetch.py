"""Real-network HTTP download handler (S2 over actual sockets — the
``HTTPDownloadHandler`` analogue, completing the handler family next to
the simulated-corpus fetch, the file:// mirror and the data: scheme).

The engine machinery is unchanged: a "net" corpus directory holds ONLY
metadata (seeds, per-host robots fetched once at build time, hosts
table, ``meta.json {"type": "net"}``), and ``fetch_batch`` routes its
urls through :func:`http_fetch` at fetch time — real status codes, real
bodies, real measured latency.  Contracts, pinned to upstream behavior:

  * redirects are NOT followed by the handler — RedirectMiddleware (M4,
    the expand stage) owns them, exactly as in Scrapy; 3xx returns
    ``STATUS_REDIRECT`` plus the resolved Location header.
  * retryable statuses (``RETRY_HTTP_CODES`` =
    {500, 502, 503, 504, 522, 524, 408, 429},
    scrapy/downloadermiddlewares/retry.py defaults) normalize to
    ``STATUS_RETRY`` so M3 retry semantics apply; connection errors
    (refused, timeout) are retryable too, as upstream's
    ``EXCEPTIONS_TO_RETRY``.
  * every other non-2xx surfaces as ``STATUS_NOTFOUND`` class (terminal,
    M11 drops it before the spider); malformed urls (IDNA-invalid labels,
    junk ports — UnicodeError/InvalidURL/ValueError) are terminal too,
    while garbage server responses (BadStatusLine and the rest of
    http.client.HTTPException) join the connection-retry class.
  * a body longer than ``maxsize`` aborts mid-read -> ``STATUS_TOOBIG``
    (DOWNLOAD_MAXSIZE, S2) without buffering the oversize remainder.

Tested end-to-end against a stdlib ``http.server`` on 127.0.0.1
(tests/test_netfetch.py): robots obeyed, redirects relayed, 503-then-200
retried, byte-identical extraction — the sandbox has loopback networking
even though the wider network is unreachable.
"""

from __future__ import annotations

import http.client
import json
import os
import time
import urllib.error
import urllib.request
from urllib.parse import urljoin

import pyarrow as pa
import pyarrow.parquet as pq

import fixtures.gen as fxgen
from fixtures import faults

RETRY_HTTP_CODES = frozenset({500, 502, 503, 504, 522, 524, 408, 429})
_USER_AGENT = "scrapy__ray/1.0 (+engine)"


class _NoRedirect(urllib.request.HTTPRedirectHandler):
    def redirect_request(self, req, fp, code, msg, headers, newurl):
        return None  # surface the 3xx to the caller; M4 owns redirects


_OPENER = urllib.request.build_opener(_NoRedirect)


class _FtpAbort(Exception):
    """Internal: aborts a RETR mid-transfer once maxsize is exceeded."""


def ftp_fetch(
    url: str, timeout: float = 15.0, maxsize: int = 1 << 30
) -> tuple[int, bytes | None, str, float]:
    """S3 FTP download handler over real sockets
    (``scrapy/core/downloader/handlers/ftp.py::FTPDownloadHandler``):
    RETR the url path over a PASV data channel, url userinfo or anonymous
    login (the FTP_USER/FTP_PASSWORD default convention).  Status mapping
    mirrors the handler's terminal-vs-transient split: permanent 5yz
    replies (550 file-missing, 530 login denied) are terminal NOTFOUND;
    transient 4yz replies and connection-level failures are retryable;
    bodies over ``maxsize`` abort mid-transfer -> STATUS_TOOBIG."""
    import ftplib
    from urllib.parse import unquote, urlsplit

    parts = urlsplit(url)
    t0 = time.monotonic()

    def lat() -> float:
        return (time.monotonic() - t0) * 1000.0

    try:
        ftp = ftplib.FTP()
        ftp.connect(parts.hostname or "", parts.port or 21, timeout=timeout)
        ftp.login(
            unquote(parts.username or "") or "anonymous",
            unquote(parts.password or ""),
        )
        chunks: list[bytes] = []
        total = 0

        def cb(b: bytes) -> None:
            nonlocal total
            total += len(b)
            if total > maxsize:
                raise _FtpAbort()
            chunks.append(b)

        try:
            ftp.retrbinary(f"RETR {unquote(parts.path)}", cb)
        except _FtpAbort:
            try:
                ftp.close()
            except OSError:
                pass
            return faults.STATUS_TOOBIG, None, "", lat()
        try:
            ftp.quit()
        except (ftplib.Error, OSError):
            ftp.close()
        return faults.STATUS_OK, b"".join(chunks), "", lat()
    except ftplib.error_perm:
        return faults.STATUS_NOTFOUND, None, "", lat()
    except (ftplib.Error, OSError, UnicodeError):
        # transient replies, protocol garbage, connection failures
        return faults.STATUS_RETRY, None, "", lat()


def http_fetch(
    url: str, timeout: float = 15.0, maxsize: int = 1 << 30
) -> tuple[int, bytes | None, str, float]:
    """One real GET -> (engine status, body|None, location, latency_ms).
    ftp:// urls route to :func:`ftp_fetch` (scheme dispatch, the
    DOWNLOAD_HANDLERS-dict analogue)."""
    if url.startswith("ftp://"):
        return ftp_fetch(url, timeout=timeout, maxsize=maxsize)
    req = urllib.request.Request(url, headers={"User-Agent": _USER_AGENT})
    t0 = time.monotonic()
    try:
        with _OPENER.open(req, timeout=timeout) as resp:
            body = resp.read(maxsize + 1)
            lat = (time.monotonic() - t0) * 1000.0
            if len(body) > maxsize:
                return faults.STATUS_TOOBIG, None, "", lat
            return faults.STATUS_OK, body, "", lat
    except urllib.error.HTTPError as e:
        lat = (time.monotonic() - t0) * 1000.0
        code = e.code
        if code in (301, 302, 303, 307, 308):
            loc = e.headers.get("Location") or ""
            return faults.STATUS_REDIRECT, None, urljoin(url, loc), lat
        if code in RETRY_HTTP_CODES:
            return faults.STATUS_RETRY, None, "", lat
        return faults.STATUS_NOTFOUND, None, "", lat
    except http.client.InvalidURL:
        # malformed URL (junk port etc.) — InvalidURL subclasses
        # HTTPException, NOT ValueError, so it must be caught before the
        # connection-retry clause: it is terminal, retrying cannot help
        return faults.STATUS_NOTFOUND, None, "", (time.monotonic() - t0) * 1000.0
    except (
        urllib.error.URLError,
        http.client.HTTPException,
        TimeoutError,
        ConnectionError,
        OSError,
    ):
        # connection-level failure / malformed response: upstream's
        # EXCEPTIONS_TO_RETRY class (BadStatusLine etc. included)
        return faults.STATUS_RETRY, None, "", (time.monotonic() - t0) * 1000.0
    except (UnicodeError, ValueError):
        # unfetchable URL (IDNA-invalid label): terminal, the sim-mode
        # corpus-miss analogue — never crash the fetch task
        return faults.STATUS_NOTFOUND, None, "", (time.monotonic() - t0) * 1000.0


def fetch_robots(base: str, timeout: float = 15.0) -> str:
    """Fetch ``<base>/robots.txt`` with the urllib.robotparser STATUS
    conventions (RobotFileParser.read): 2xx -> the body; 401/403 ->
    disallow everything; any other status or failure -> allow-all.
    Redirects ARE followed here (a robots fetch goes through the full
    downloader in Scrapy, so its RedirectMiddleware applies) — the
    default urllib opener, unlike http_fetch's non-following one.
    robots.txt is an HTTP convention: ftp bases are allow-all (upstream's
    RobotsTxtMiddleware only ever evaluates HTTP robots responses)."""
    if base.startswith("ftp://"):
        return "User-agent: *\nAllow: /\n"
    try:
        req = urllib.request.Request(
            f"{base}/robots.txt", headers={"User-Agent": _USER_AGENT}
        )
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read(1 << 20).decode("utf-8", "replace")
    except urllib.error.HTTPError as e:
        if e.code in (401, 403):
            return "User-agent: *\nDisallow: /\n"
        return "User-agent: *\nAllow: /\n"
    except (
        urllib.error.URLError, http.client.HTTPException, TimeoutError,
        ConnectionError, OSError, UnicodeError, ValueError,
    ):
        return "User-agent: *\nAllow: /\n"


def build_net_corpus(
    seed_urls: list[str],
    out_dir: str,
    timeout: float = 15.0,
    extra_hosts: list[str] | None = None,
) -> str:
    """Write the metadata corpus for a live-site crawl: seeds in order,
    per-host robots.txt fetched ONCE via :func:`fetch_robots`, the hosts
    table, and ``meta.json {"type": "net"}``.  Bodies are never stored —
    they are fetched by the engine at crawl time.

    Robots coverage caveat (documented limitation): robots are fetched
    for SEED hosts plus ``extra_hosts`` (``"scheme://netloc"`` strings);
    a host reached only by cross-links has no robots entry and the
    frontier treats it as allow-all — list every allowed_domains host
    here for a polite multi-host live crawl.  Hosts are keyed by
    HOSTNAME (ports collapse — the upstream downloader-slot convention;
    two services on different ports of one host share robots and
    politeness)."""
    from scrapy__ray.functions.url import host_of

    os.makedirs(out_dir, exist_ok=True)
    hosts: list[str] = []
    netlocs: dict[str, str] = {}  # host -> scheme://netloc for robots
    for u in list(seed_urls) + list(extra_hosts or []):
        if "://" not in u:
            raise ValueError(
                f"net corpus urls must be absolute with a scheme: {u!r}"
            )
        h = host_of(u)
        if h not in netlocs:
            hosts.append(h)
            scheme, rest = u.split("://", 1)
            netlocs[h] = f"{scheme}://{rest.split('/', 1)[0]}"
    robots = [fetch_robots(netlocs[h], timeout=timeout) for h in hosts]
    pq.write_table(
        pa.table(
            {
                "url": pa.array(seed_urls, pa.string()),
                "seed_order": pa.array(range(len(seed_urls)), pa.int32()),
            }
        ),
        os.path.join(out_dir, "seeds.parquet"),
    )
    pq.write_table(
        pa.table(
            {"host": pa.array(hosts, pa.string()),
             "robots_txt": pa.array(robots, pa.string())}
        ),
        os.path.join(out_dir, "robots.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "host": pa.array(hosts, pa.string()),
                "host_index": pa.array(range(len(hosts)), pa.int32()),
                "n_pages": pa.array([0] * len(hosts), pa.int32()),
                "host_hash": pa.array(
                    [fxgen.host_hash(h) for h in hosts], pa.uint64()
                ),
            }
        ),
        os.path.join(out_dir, "hosts.parquet"),
    )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"type": "net"}, f)
    return out_dir
