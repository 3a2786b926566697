"""Deterministic synthetic crawl corpus generator (FIXTURES.md, frozen spec).

Generates the ``pages`` / ``seeds`` / ``robots`` / ``hosts`` tables with
seed=42.  Per-host child PRNGs are seeded from a *stable* hash
(sha1 — Python's builtin ``hash()`` is process-salted and would break
reproducibility, a pinned deviation from the FIXTURES.md pseudo-code), so
generation is order-independent and parallelized over hosts with
multiprocessing (sf-large ~1M pages in well under 60 s).

The ``text`` column is computed by running the frozen extraction function
(scrapy__ray.functions.textextract.extract_text) on the html just built, so
engine-vs-oracle byte-identity is meaningful and the FIXTURES.md §3 spec —
pinned independently by tests/vectors/textextract.jsonl — is the contract.

Output layout (all zstd, row_group_size=8192, fixed row order = (host_index, j)):
    <out>/pages/part-{k}.parquet      k = host_hash % n_parts  (host-hash partitioned)
    <out>/seeds.parquet               url, seed_order
    <out>/robots.parquet              host, robots_txt
    <out>/hosts.parquet               host, host_index, n_pages, host_hash
    <out>/meta.json                   scale params (regen cache key)
"""

from __future__ import annotations

import hashlib
import json
import multiprocessing as mp
import os
import random
import sys
import time
from datetime import datetime, timedelta

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from fixtures.faults import encoding_variant, page_url
from scrapy__ray.functions.textextract import extract_text

MASTER_SEED = 42
EPOCH = datetime(2026, 1, 1, 0, 0, 0)

SCALES = {
    # name: (hosts, cap on pages/host, n seeds, n pages parts, links/page)
    # fanout=3 scales follow the frozen FIXTURES.md §2 spec (oracle replay);
    # sf-bench raises intra-host fanout to 64 (Common-Crawl-like link
    # density) so the throughput bench is fetch/extract/dedup-bound instead
    # of graph-diameter-bound (at fanout 3 a 5000-page host needs ~1700
    # BFS rounds of ~3 fetches — all round overhead, no work).
    "sf-small": dict(hosts=20, cap=1500, seeds=5, n_parts=4, fanout=3),
    "sf-mid": dict(hosts=200, cap=2500, seeds=25, n_parts=16, fanout=3),
    "sf-large": dict(hosts=2000, cap=5000, seeds=100, n_parts=64, fanout=3),
    "sf-bench": dict(hosts=2000, cap=2000, seeds=200, n_parts=64, fanout=64),
    # sf-scale: the 10^10-regime shape in miniature — host count >> cores so
    # every politeness round has cluster-wide parallel work (no big-host
    # tail); used by bench.py --scaling.
    "sf-scale": dict(hosts=20000, cap=256, seeds=500, n_parts=64, fanout=64),
    # sf-gzip: sf-small shape with the FIXTURES.md §2 Content-Encoding
    # variant wired in — pages whose url byte is 96 store gzip'd html and a
    # content_encoding sidecar column (M6 HttpCompressionMiddleware gate).
    "sf-gzip": dict(hosts=20, cap=1500, seeds=5, n_parts=4, fanout=3, gzip=True),
    # sf-ajax: sf-small shape with the M15 AJAX-crawling-scheme variant —
    # pages with j % 5 == 2 serve a stub body carrying
    # <meta name="fragment" content="!"> (no links), and the corpus also
    # holds their ?_escaped_fragment_= variant with the REAL content.  A
    # crawler with ajaxcrawl_enabled must fetch the stub, surface nothing,
    # and re-request the escaped variant; with it disabled the stub is
    # terminal (its text column is the stub text — byte-identity holds in
    # both modes).
    "sf-ajax": dict(hosts=20, cap=1500, seeds=5, n_parts=4, fanout=3, ajax=True),
}

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# fixed 256-word lorem-ish list (deterministic, no PRNG)
_SYL_A = "lo re ip do si am co se te ur ad mi ve ni qu ex".split()
_SYL_B = "rem sum lor met rat ped tas nib mus dui vel leo est nec sed arc".split()
WORDS = tuple(f"{a}{b}" for a in _SYL_A for b in _SYL_B)[:256]
assert len(WORDS) == 256

_ENTITY_SUFFIX = " &amp; x &lt; y &#233; &eacute;"


def host_name(i: int) -> str:
    return f"h{i}.example"


def host_hash(host: str) -> int:
    """Stable 64-bit host hash — THE partition key input (SURVEY.md §4.2)."""
    return int.from_bytes(hashlib.sha1(host.encode("utf-8")).digest()[:8], "big")


def _child_seed(tag: str, host: str) -> int:
    return int.from_bytes(
        hashlib.sha1(f"{tag}:{MASTER_SEED}:{host}".encode()).digest()[:8], "big"
    )


def page_counts(hosts: int, cap: int) -> np.ndarray:
    """Zipf(a=1.3) page counts capped to [1, cap]; h0 forced hot (= cap)."""
    rng = np.random.Generator(np.random.PCG64(MASTER_SEED))
    counts = rng.zipf(1.3, hosts).clip(1, cap)
    counts[0] = cap
    return counts.astype(np.int64)


def _paragraph(rng: random.Random) -> str:
    n = rng.randint(10, 40)
    words = [rng.choice(WORDS) for _ in range(n)]
    if rng.random() < 0.05:
        words[2 % len(words)] = "<b>bold <i>ital</i></b>"
        return " ".join(words) + _ENTITY_SUFFIX
    return " ".join(words)


def _href_for(rng: random.Random, target_j: int, has_base: bool) -> str:
    forms = ["/p/{t}", "../p/{t}"] + (["p/{t}"] if has_base else [])
    href = rng.choice(forms).format(t=target_j)
    if target_j % 10 == 9:
        href += rng.choice(["?a=1&b=2", "?b=2&a=1"])
    return href


def gen_host(args) -> dict:
    """Build all pages of one host. Pure function of
    (host_index, counts[, fanout[, gzip_variant[, ajax_variant]]])."""
    i, counts = args[0], args[1]
    fanout = args[2] if len(args) > 2 else 3
    gzip_variant = args[3] if len(args) > 3 else False
    ajax_variant = args[4] if len(args) > 4 else False
    host = host_name(i)
    n_i = int(counts[i])
    hosts_total = len(counts)
    rng = random.Random(_child_seed("pages", host))

    urls, htmls, texts, langs, encs = [], [], [], [], []
    # M15 variant: escaped-fragment pages appended AFTER the regular range
    # so intra-host link indexing by j stays untouched
    ajax_extras: list[tuple] = []
    for j in range(n_i):
        url = page_url(host, j)
        has_base = rng.random() < 0.10
        lang = rng.choice(["en", "de", "fr"])
        para0 = _paragraph(rng)
        para1 = _paragraph(rng)

        hrefs: list[str] = []
        # (a) intra-host links j+1..j+fanout (mod n); fanout=3 per the frozen
        # FIXTURES.md spec, 64 for the sf-bench link-density variant
        intra = [(j + d) % n_i for d in range(1, fanout + 1)]
        for t in intra:
            hrefs.append(_href_for(rng, t, has_base))
        # (b) cross-host link, p=0.2
        if rng.random() < 0.2:
            i2 = rng.randrange(hosts_total)
            j2 = rng.randrange(int(counts[i2]))
            h2 = page_url(host_name(i2), j2)
            if j2 % 10 == 9 and rng.random() < 0.5:  # shuffled-params variant
                h2 = h2.replace("?a=1&b=2", "?b=2&a=1")
            hrefs.append(h2)
        # (c) canonical-duplicate of link (a.1), p=0.1
        if rng.random() < 0.1:
            t1 = intra[0]
            dup = f"/p/{t1}"
            dup += "?b=2&a=1" if t1 % 10 == 9 else ""
            hrefs.append(dup + "#dup")
        # (d) off-corpus link, p=0.05
        if rng.random() < 0.05:
            hrefs.append("http://external.invalid/x")
        # (e) non-http / ignored-extension link, p=0.05
        if rng.random() < 0.05:
            hrefs.append(
                rng.choice(
                    ["mailto:x@example.org", "javascript:void(0)", "/img/pic.jpg", "/doc.pdf"]
                )
            )

        variant = encoding_variant(url)
        base_tag = '<base href="/">' if has_base else ""
        meta = '<meta charset="iso-8859-1">' if variant == "latin1" else ""
        if variant == "latin1":
            para0 += " café"
        title = f"{host} page {j}"
        lis = "".join(
            f'<li><a href="{h}">anchor {k}</a></li>' for k, h in enumerate(hrefs)
        )
        html_str = (
            f"<html><head><title>{title}</title>{base_tag}{meta}</head>\n"
            f"<body><h1>{title}</h1>\n"
            f"<p>{para0}</p>\n"
            f"<p>{para1}</p>\n"
            f"<ul>{lis}</ul>\n"
            f"</body></html>"
        )
        if variant == "latin1":
            html = html_str.encode("latin-1")
        elif variant == "bom":
            html = b"\xef\xbb\xbf" + html_str.encode("utf-8")
        else:
            html = html_str.encode("utf-8")

        # text is computed BEFORE wire-compression: the oracle column is the
        # post-decode extraction, Content-Encoding is transport-level (M6)
        text = extract_text(html)
        enc = ""
        if gzip_variant and variant == "gzip":
            import gzip as _gzip

            html = _gzip.compress(html, compresslevel=6, mtime=0)
            enc = "gzip"

        if ajax_variant and j % 5 == 2:
            # M15: the plain url serves a stub carrying the AJAX-crawlable
            # meta tag (no links); the real content moves to the
            # ?_escaped_fragment_= variant (Google AJAX-crawling scheme)
            from scrapy__ray.functions.url import escaped_fragment_url

            esc_url = escaped_fragment_url(url)
            ajax_extras.append((esc_url, html, text, lang, enc))
            stub_str = (
                f"<html><head><title>{title}</title>"
                '<meta name="fragment" content="!"></head>\n'
                f"<body><h1>{title}</h1>\n<p>Loading via AJAX.</p>\n"
                f"</body></html>"
            )
            html = stub_str.encode("utf-8")
            text = extract_text(html)
            enc = ""

        urls.append(url)
        htmls.append(html)
        texts.append(text)
        langs.append(lang)
        encs.append(enc)

    for esc_url, e_html, e_text, e_lang, e_enc in ajax_extras:
        urls.append(esc_url)
        htmls.append(e_html)
        texts.append(e_text)
        langs.append(e_lang)
        encs.append(e_enc)

    return {
        "host_index": i,
        "host": host,
        "urls": urls,
        "htmls": htmls,
        "texts": texts,
        "langs": langs,
        "encs": encs,
    }


def _robots_txt(host: str) -> str:
    r = random.Random(_child_seed("robots", host)).random()
    if r < 0.80:
        return "User-agent: *\nAllow: /\n"
    if r < 0.95:
        return "User-agent: *\nDisallow: /p/3\n"
    return "User-agent: *\nDisallow: /\n"


def generate(scale: str, out_dir: str, force: bool = False, processes: int | None = None) -> str:
    """Generate (or reuse a cached) corpus; returns out_dir."""
    params = SCALES[scale]
    meta_path = os.path.join(out_dir, "meta.json")
    meta = {"scale": scale, "seed": MASTER_SEED, "version": 4, **params}
    if not force and os.path.exists(meta_path):
        with open(meta_path) as f:
            if json.load(f) == meta:
                return out_dir

    t0 = time.time()
    hosts_n, cap, n_seeds, n_parts = (
        params["hosts"],
        params["cap"],
        params["seeds"],
        params["n_parts"],
    )
    counts = page_counts(hosts_n, cap)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    procs = processes or min(mp.cpu_count(), 32)
    work = [
        (
            i, counts, params.get("fanout", 3), params.get("gzip", False),
            params.get("ajax", False),
        )
        for i in range(hosts_n)
    ]
    if procs > 1 and hosts_n > 4:
        with mp.Pool(procs) as pool:
            results = pool.map(gen_host, work, chunksize=max(1, hosts_n // (procs * 4)))
    else:
        results = [gen_host(w) for w in work]
    results.sort(key=lambda r: r["host_index"])

    os.makedirs(os.path.join(out_dir, "pages"), exist_ok=True)
    # group hosts into host-hash partitions; fixed row order (host_index, j)
    parts: dict[int, list[dict]] = {}
    for r in results:
        k = host_hash(r["host"]) % n_parts
        parts.setdefault(k, []).append(r)
    gzip_mode = bool(params.get("gzip", False))
    for k in range(n_parts):
        group = parts.get(k, [])
        urls, ts, htmls, texts, langs, encs = [], [], [], [], [], []
        for r in group:
            i = r["host_index"]
            off = int(offsets[i])
            urls.extend(r["urls"])
            ts.extend(
                EPOCH + timedelta(seconds=off + j) for j in range(len(r["urls"]))
            )
            htmls.extend(r["htmls"])
            texts.extend(r["texts"])
            langs.extend(r["langs"])
            encs.extend(r["encs"])
        cols = {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
        if gzip_mode:  # sidecar column exists in the gzip variant only
            cols["content_encoding"] = pa.array(encs, pa.string())
        tbl = pa.table(cols)
        pq.write_table(
            tbl,
            os.path.join(out_dir, "pages", f"part-{k}.parquet"),
            compression="zstd",
            row_group_size=8192,
        )

    # seeds: page 0 of evenly-spaced hosts, h0 first (FIXTURES.md §1.2)
    step = max(1, hosts_n // n_seeds)
    seed_urls = [page_url(host_name(s * step), 0) for s in range(n_seeds)]
    pq.write_table(
        pa.table(
            {
                "url": pa.array(seed_urls, pa.string()),
                "seed_order": pa.array(range(n_seeds), pa.int32()),
            }
        ),
        os.path.join(out_dir, "seeds.parquet"),
        compression="zstd",
    )

    all_hosts = [host_name(i) for i in range(hosts_n)]
    pq.write_table(
        pa.table(
            {
                "host": pa.array(all_hosts, pa.string()),
                "robots_txt": pa.array([_robots_txt(h) for h in all_hosts], pa.string()),
            }
        ),
        os.path.join(out_dir, "robots.parquet"),
        compression="zstd",
    )
    # sitemap (FIXTURES.md §2 / SURVEY.md P6): h1.example lists its first
    # ten pages; consumed by the optional sitemap seed-expansion stage
    if hosts_n > 1:
        sm_host = host_name(1)
        locs = "".join(
            f"<url><loc>{page_url(sm_host, j)}</loc></url>"
            for j in range(min(10, int(counts[1])))
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            f"{locs}</urlset>"
        )
        pq.write_table(
            pa.table(
                {
                    "host": pa.array([sm_host], pa.string()),
                    "sitemap_xml": pa.array([xml], pa.string()),
                }
            ),
            os.path.join(out_dir, "sitemaps.parquet"),
            compression="zstd",
        )

    pq.write_table(
        pa.table(
            {
                "host": pa.array(all_hosts, pa.string()),
                "host_index": pa.array(range(hosts_n), pa.int32()),
                "n_pages": pa.array(counts, pa.int32()),
                "host_hash": pa.array([host_hash(h) for h in all_hosts], pa.uint64()),
            }
        ),
        os.path.join(out_dir, "hosts.parquet"),
        compression="zstd",
    )
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    sys.stderr.write(
        f"[fixtures.gen] {scale}: {int(counts.sum())} pages, {hosts_n} hosts, "
        f"{n_parts} parts in {time.time() - t0:.1f}s -> {out_dir}\n"
    )
    return out_dir


def default_dir(scale: str) -> str:
    return os.path.join("/tmp/scrapy__ray_corpus", scale)


if __name__ == "__main__":
    scale = sys.argv[1] if len(sys.argv) > 1 else "sf-small"
    out = sys.argv[2] if len(sys.argv) > 2 else default_dir(scale)
    generate(scale, out, force="--force" in sys.argv)
