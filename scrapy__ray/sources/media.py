"""Multimodal (image) source: a deterministic BMP mirror of the documents
table, plus the engine-side BMP codec.

The build brief wants image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool map_batches stages.  The sandbox
has no PIL/torch — but BMP (BITMAPINFOHEADER, 24-bit BI_RGB) is pure
stdlib/numpy territory, so unlike the declared media stubs in
pipelines/textops.py this family is REAL end to end: a deterministic
per-doc BMP is materialized once (the jsonl/ipc mirror-cache shape), and
decode / channel stats / nearest-neighbor resize / linear embed /
average-hash dedup all run on actual pixels with independent
byte-level oracles (oracle_ext struct-based parser vs the numpy decoder
here).

Mirror contract (generation is shared INPUT, not an oracle surface —
both engine and oracle read the same parquet):
  * one row per documents.doc_id: (doc_id, image binary, width int32,
    height int32, fmt='bmp24')
  * width = 16 + 8*(doc_id % 3), height = 16 + 8*((doc_id // 3) % 3)
  * pixels: uint8 from numpy PCG64 seeded with doc_id (stream-stable by
    numpy's bit-generator guarantee)
  * near-dup plant: doc_id % 10 == 9 copies doc_id-1's pixels with ONE
    low bit flipped (pixel [0,0,0] ^= 1) — detectable by average-hash,
    invisible to exact byte dedup
"""

from __future__ import annotations

import hashlib
import os
import shutil
import struct

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def bmp_encode(pixels: np.ndarray) -> bytes:
    """H x W x 3 uint8 RGB -> 24-bit BI_RGB BMP bytes (bottom-up rows,
    BGR byte order, rows padded to 4 bytes — the classic format)."""
    h, w, _ = pixels.shape
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    stride = row_bytes + pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    # BGR, bottom-up, padded — one vectorized assembly
    bgr = pixels[::-1, :, ::-1]
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return header + rows.tobytes()


def bmp_decode(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP bytes -> H x W x 3 uint8 RGB (numpy-vectorized;
    the independent oracle parses the same format with struct + Python
    loops).  Raises ValueError on anything but the mirror's exact
    subformat — decode errors are data bugs here, not fallbacks."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h, planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if hdr_size != 40 or planes != 1 or bpp != 24 or comp != 0 or h <= 0:
        raise ValueError("unsupported BMP variant")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    bgr = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    return bgr[::-1, :, ::-1].copy()


def _gen_pixels(doc_id: int) -> np.ndarray:
    w = 16 + 8 * (doc_id % 3)
    h = 16 + 8 * ((doc_id // 3) % 3)
    rng = np.random.Generator(np.random.PCG64(doc_id))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def media_mirror(sf_dir: str) -> str:
    """Materialize the BMP image table for ``sf_dir``'s documents and
    return its parquet path (cache identity + atomic publish as in
    sources/jsonl.py)."""
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    ident = f"{st.st_mtime_ns}:{st.st_size}"
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:16]
    out_dir = f"/tmp/scrapy__ray_media/{key}"
    path = os.path.join(out_dir, "images.parquet")
    marker = os.path.join(out_dir, "_COMPLETE")
    try:
        with open(marker) as f:
            if f.read() == ident:
                return path
    except OSError:
        pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ids = sorted(
        pq.read_table(src, columns=["doc_id"])["doc_id"].to_pylist()
    )
    id_set = set(ids)
    imgs, ws, hs = [], [], []
    for d in ids:
        if d % 10 == 9 and (d - 1) in id_set:
            px = _gen_pixels(d - 1).copy()
            px[0, 0, 0] ^= 1  # the planted near-dup
        else:
            px = _gen_pixels(d)
        imgs.append(bmp_encode(px))
        hs.append(px.shape[0])
        ws.append(px.shape[1])
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "image": pa.array(imgs, pa.binary()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "fmt": pa.array(["bmp24"] * len(ids), pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        f.write(ident)
    os.replace(mtmp, marker)
    return path


def read_images(sf_dir: str, columns: list[str] | None = None):
    """Dataset over the BMP mirror (column-pruned parquet read)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_parquet(media_mirror(sf_dir), columns=columns)


# ------------------------------------------------------------- audio (WAV)
# 16-bit mono PCM RIFF/WAVE — the canonical 44-byte-header format, pure
# struct territory like BMP.  Mirror contract (shared input):
#   * one row per doc_id: (doc_id, audio binary, sample_rate int32,
#     n_samples int32, fmt='wav16')
#   * sample_rate = 8000 + 8000*(doc_id % 2)
#   * n_samples = 1600 + 160*(doc_id % 7)
#   * samples: int16 from PCG64(doc_id ^ 0xA0D10) — independent of the
#     image stream


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 mono samples -> canonical 44-byte-header PCM WAV bytes."""
    data = samples.astype("<i2").tobytes()
    n = len(data)
    return (
        b"RIFF" + struct.pack("<I", 36 + n) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + struct.pack("<I", n) + data
    )


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """Canonical PCM WAV bytes -> (int16 samples, sample_rate).  Strict:
    anything but 16-bit mono PCM with the 44-byte layout raises."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE" or data[12:16] != b"fmt ":
        raise ValueError("not a canonical WAV")
    fmt_size, audio_fmt, channels, rate = struct.unpack_from("<IHHI", data, 16)
    bits = struct.unpack_from("<H", data, 34)[0]
    if fmt_size != 16 or audio_fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("unsupported WAV variant")
    if data[36:40] != b"data":
        raise ValueError("unsupported chunk layout")
    n = struct.unpack_from("<I", data, 40)[0]
    return np.frombuffer(data, dtype="<i2", count=n // 2, offset=44), rate


def _gen_samples(doc_id: int) -> tuple[np.ndarray, int]:
    rate = 8000 + 8000 * (doc_id % 2)
    n = 1600 + 160 * (doc_id % 7)
    rng = np.random.Generator(np.random.PCG64(doc_id ^ 0xA0D10))
    return rng.integers(-(1 << 15), 1 << 15, size=n, dtype=np.int64).astype(
        np.int16
    ), rate


def audio_mirror(sf_dir: str) -> str:
    """Materialize the WAV audio table for ``sf_dir``'s documents (same
    cache/atomic discipline as media_mirror)."""
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    ident = f"{st.st_mtime_ns}:{st.st_size}"
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:16]
    out_dir = f"/tmp/scrapy__ray_audio/{key}"
    path = os.path.join(out_dir, "audio.parquet")
    marker = os.path.join(out_dir, "_COMPLETE")
    try:
        with open(marker) as f:
            if f.read() == ident:
                return path
    except OSError:
        pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ids = sorted(
        pq.read_table(src, columns=["doc_id"])["doc_id"].to_pylist()
    )
    clips, rates, lens = [], [], []
    for d in ids:
        s, r = _gen_samples(d)
        clips.append(wav_encode(s, r))
        rates.append(r)
        lens.append(len(s))
    tbl = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "audio": pa.array(clips, pa.binary()),
            "sample_rate": pa.array(rates, pa.int32()),
            "n_samples": pa.array(lens, pa.int32()),
            "fmt": pa.array(["wav16"] * len(ids), pa.string()),
        }
    )
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        f.write(ident)
    os.replace(mtmp, marker)
    return path


def read_audio(sf_dir: str, columns: list[str] | None = None):
    """Dataset over the WAV mirror (column-pruned parquet read)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_parquet(audio_mirror(sf_dir), columns=columns)
