"""Decoded-sorted sidecar cache (sources/corpus.py): layout, staleness,
and lookup equivalence with the parquet source of truth."""

from __future__ import annotations

import os
import shutil
import time

import numpy as np
import pyarrow.parquet as pq

import fixtures.gen as fxgen
from scrapy__ray.sources.corpus import (
    _decode_part,
    _sidecar_path,
    _write_sidecar,
    load_sidecar,
)


def _small_corpus():
    return fxgen.generate("sf-small", fxgen.default_dir("sf-small"))


def test_decode_part_sorted_layout():
    cd = _small_corpus()
    t = _decode_part(cd, 0)
    ref = pq.read_table(
        os.path.join(cd, "pages", "part-0.parquet"), columns=["url", "html"]
    )
    assert t.num_rows == ref.num_rows
    assert "url_fixed" in t.column_names
    urls = t["url"].to_pylist()
    assert urls == sorted(urls)
    # fixed-width column round-trips to the url (null-padded)
    width = t["url_fixed"].type.byte_width
    fixed = [v.rstrip(b"\x00").decode() for v in t["url_fixed"].to_pylist()]
    assert fixed == urls
    assert max(len(u) for u in urls) <= width
    # same url -> html mapping as the parquet source
    d = dict(zip(ref["url"].to_pylist(), ref["html"].to_pylist()))
    assert all(d[u] == h for u, h in zip(urls, t["html"].to_pylist()))


def test_sidecar_write_load_and_staleness(tmp_path):
    src = _small_corpus()
    cd = str(tmp_path / "corpus")
    shutil.copytree(src, cd)
    for junk in ("sorted.arrow",):
        dec = os.path.join(cd, ".decoded")
        if os.path.isdir(dec):
            shutil.rmtree(dec)
    assert load_sidecar(cd, 0) is None  # no sidecar yet
    t = _decode_part(cd, 0)
    _write_sidecar(cd, 0, t)
    got = load_sidecar(cd, 0)
    assert got is not None and got.equals(t)
    # regenerating the partition in place invalidates by mtime
    future = time.time() + 5
    os.utime(os.path.join(cd, "pages", "part-0.parquet"), (future, future))
    assert load_sidecar(cd, 0) is None
    # rebuilt sidecar is fresh again
    _write_sidecar(cd, 0, t)
    os.utime(_sidecar_path(cd, 0), (future + 5, future + 5))
    assert load_sidecar(cd, 0) is not None


def test_sidecar_searchsorted_matches_index_in():
    cd = _small_corpus()
    t = _decode_part(cd, 0)
    width = t["url_fixed"].type.byte_width
    fixed = t["url_fixed"].combine_chunks()
    u_sorted = np.frombuffer(fixed.buffers()[1], dtype=f"S{width}", count=len(fixed))
    urls = t["url"].to_pylist()
    queries = urls[:5] + ["http://missing.example/x", urls[-1]]
    q = np.asarray(queries, dtype="S").astype(u_sorted.dtype)
    pos = np.minimum(np.searchsorted(u_sorted, q), len(u_sorted) - 1)
    valid = u_sorted[pos] == q
    for i, qq in enumerate(queries):
        if valid[i]:
            assert urls[pos[i]] == qq
        else:
            assert qq not in urls
