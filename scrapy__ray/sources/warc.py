"""WARC source — the format Common Crawl actually ships.

The north rule's corpus is "Common-Crawl-style web pages"; real Common
Crawl arrives as WARC (ISO 28500 / WARC 1.0: a concatenation of records,
each a CRLF-terminated header block + Content-Length-framed payload,
usually gzip-compressed PER RECORD so members concatenate into one
``.warc.gz``).  This module gives the engine that source format end to
end with stdlib only:

  * ``warc_mirror(corpus_dir)`` materializes the fixture corpus's pages
    partitions as ``.warc.gz`` shards (one shard per pages partition, so
    a read parallelizes exactly like the parquet read; per-record gzip
    members with mtime=0 so the mirror is byte-deterministic and cached
    by source identity, the jsonl_mirror convention).
  * ``read_warc(warc_dir)`` is the Ray-Data-first reader:
    ``read_binary_files`` shards by file, one ``map_batches`` parses each
    shard's records into pages-schema rows (url, warc_ts, html) — the
    SAME Dataset pipeline as the parquet read, only the leading node
    changes.

Framing notes (the parts that bite): payload length comes ONLY from
``Content-Length`` — payloads legally contain ``\\r\\n\\r\\nWARC/1.0`` so
scanning for a record separator would mis-split; the two CRLFs after the
payload are a record SEPARATOR, not part of it; ``WARC-Date`` is written
with microseconds (WARC 1.1 allows fractional seconds) so ``warc_ts``
round-trips exactly; non-``response`` records (the leading ``warcinfo``
every real WARC carries) are skipped by type, not position.  Byte
round-trip vs the parquet corpus is asserted in tests/test_warc.py.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"
_GZIP_MAGIC = b"\x1f\x8b"

PAGES_WARC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
    ]
)


def _warc_date(ts_us: int) -> str:
    dt = datetime.fromtimestamp(ts_us / 1_000_000, tz=timezone.utc)
    return dt.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _parse_warc_date(s: str) -> int:
    s = s.rstrip("Z")
    if "." in s:
        dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%f")
    else:
        dt = datetime.strptime(s, "%Y-%m-%dT%H:%M:%S")
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def _response_record(url: str, ts_us: int, html: bytes) -> bytes:
    """One WARC/1.0 response record; the payload is a minimal HTTP/1.1
    response whose body is the html bytes.  Record-ID is a deterministic
    sha1 urn (no uuid4 — determinism rule)."""
    http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\nContent-Length: "
        + str(len(html)).encode()
        + _SEP
        + html
    )
    rid = hashlib.sha1(f"{url}|{ts_us}".encode()).hexdigest()
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        + f"WARC-Record-ID: <urn:sha1:{rid}>\r\n".encode()
        + f"WARC-Date: {_warc_date(ts_us)}\r\n".encode()
        + f"WARC-Target-URI: {url}\r\n".encode()
        + b"Content-Type: application/http;msgtype=response\r\n"
        + f"Content-Length: {len(http)}\r\n".encode()
    )
    return hdr + _CRLF + http + _SEP


def _warcinfo_record(filename: str) -> bytes:
    body = b"software: scrapy__ray warc writer\r\n"
    hdr = (
        b"WARC/1.0\r\n"
        b"WARC-Type: warcinfo\r\n"
        + f"WARC-Filename: {filename}\r\n".encode()
        + f"WARC-Date: {_warc_date(0)}\r\n".encode()
        + b"Content-Type: application/warc-fields\r\n"
        + f"Content-Length: {len(body)}\r\n".encode()
    )
    return hdr + _CRLF + body + _SEP


def write_warc_shard(rows, path: str, *, per_record_gzip: bool = True) -> None:
    """Write (url, ts_us, html) rows as one WARC shard.  Per-record gzip
    members (mtime=0, deterministic) concatenate into a valid multi-member
    ``.warc.gz`` — the Common Crawl layout; a whole-stream gzip or plain
    file parses identically on the read side."""
    name = os.path.basename(path)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        records = [_warcinfo_record(name)] + [
            _response_record(u, t, h) for u, t, h in rows
        ]
        if per_record_gzip:
            for rec in records:
                f.write(gzip.compress(rec, mtime=0))
        else:
            for rec in records:
                f.write(rec)
    os.replace(tmp, path)


def parse_warc(data: bytes) -> tuple[list[str], list[int], list[bytes]]:
    """Parse one WARC shard (gzip-multi-member or plain) into parallel
    (urls, ts_us, htmls) lists.  Content-Length framing only; skips
    records whose WARC-Type is not ``response``."""
    if data[:2] == _GZIP_MAGIC:
        # multi-member streams decompress to the concatenated plain WARC
        data = gzip.decompress(data)
    urls: list[str] = []
    tss: list[int] = []
    htmls: list[bytes] = []
    pos, n = 0, len(data)
    while pos < n:
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            break
        headers: dict[str, str] = {}
        lines = data[pos:hdr_end].split(_CRLF)
        if not lines or not lines[0].startswith(b"WARC/"):
            raise ValueError(f"not a WARC record at offset {pos}")
        for line in lines[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode()] = v.strip().decode()
        clen = int(headers["content-length"])
        payload = data[hdr_end + 4 : hdr_end + 4 + clen]
        pos = hdr_end + 4 + clen + 4  # payload + record separator
        if headers.get("warc-type") != "response":
            continue
        http_end = payload.find(_SEP)
        urls.append(headers["warc-target-uri"])
        tss.append(_parse_warc_date(headers["warc-date"]))
        htmls.append(payload[http_end + 4 :])
    return urls, tss, htmls


def warc_mirror(corpus_dir: str) -> str:
    """Materialize ``<corpus_dir>/pages`` as ``.warc.gz`` shards (one per
    pages partition) and return the mirror directory.  Cached by source
    identity — the marker records each partition's (mtime_ns, size) so a
    regenerated corpus invalidates the mirror (jsonl_mirror convention)."""
    import shutil

    import pyarrow.parquet as pq

    pages = os.path.join(corpus_dir, "pages")
    parts = sorted(
        f for f in os.listdir(pages) if f.endswith(".parquet")
    )
    ident = ";".join(
        f"{f}:{os.stat(os.path.join(pages, f)).st_mtime_ns}"
        f":{os.stat(os.path.join(pages, f)).st_size}"
        for f in parts
    )
    key = hashlib.md5(corpus_dir.encode()).hexdigest()[:16]
    out_dir = f"/tmp/scrapy__ray_warc/{key}"
    marker = os.path.join(out_dir, "_COMPLETE")
    try:
        with open(marker) as f:
            if f.read() == ident:
                return out_dir
    except OSError:
        pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    for f in parts:
        t = pq.read_table(
            os.path.join(pages, f), columns=["url", "warc_ts", "html"]
        )
        ts_us = t["warc_ts"].cast(pa.int64()).to_pylist()
        rows = zip(t["url"].to_pylist(), ts_us, t["html"].to_pylist())
        shard = os.path.join(out_dir, f.replace(".parquet", ".warc.gz"))
        write_warc_shard(rows, shard)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        f.write(ident)
    os.replace(mtmp, marker)
    return out_dir


def read_warc(warc_dir: str):
    """Ray Dataset over WARC shards: ``read_binary_files`` (shards by
    file, so parallelism = shard count, same as the parquet layout) →
    one vectorized parse per shard emitting pages-schema Arrow blocks."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()

    def parse_batch(t: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[int] = []
        htmls: list[bytes] = []
        for blob in t["bytes"].to_pylist():
            u, s, h = parse_warc(blob)
            urls.extend(u)
            tss.extend(s)
            htmls.extend(h)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(
                    np.array(tss, dtype="int64").view("datetime64[us]")
                ),
                "html": pa.array(htmls, pa.binary()),
            }
        )

    return rd.read_binary_files(warc_dir, file_extensions=["gz", "warc"]).map_batches(
        parse_batch, batch_format="pyarrow", batch_size=None
    )
