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


def _mirror_cached(sf_dir: str, family: str, filename: str, build) -> str:
    """Shared mirror cache/publish discipline for all media families:
    (mtime_ns, size) source-identity marker, hashed sf_dir key, full clear
    before rebuild, pid-unique temp names, data published before marker
    (the jsonl/ipc convention).  ``build(ids) -> pa.Table`` supplies the
    family's payload for the sorted doc_id list."""
    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    ident = f"{st.st_mtime_ns}:{st.st_size}"
    key = hashlib.md5(sf_dir.encode()).hexdigest()[:16]
    out_dir = f"/tmp/scrapy__ray_{family}/{key}"
    path = os.path.join(out_dir, filename)
    marker = os.path.join(out_dir, "_COMPLETE")
    try:
        with open(marker) as f:
            if f.read() == ident:
                return path
    except OSError:
        pass
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ids = sorted(pq.read_table(src, columns=["doc_id"])["doc_id"].to_pylist())
    tbl = build(ids)
    tmp = f"{path}.tmp-{os.getpid()}"
    pq.write_table(tbl, tmp, compression="zstd")
    os.replace(tmp, path)
    mtmp = f"{marker}.tmp-{os.getpid()}"
    with open(mtmp, "w") as f:
        f.write(ident)
    os.replace(mtmp, marker)
    return path


def media_mirror(sf_dir: str) -> str:
    """Materialize the BMP image table for ``sf_dir``'s documents and
    return its parquet path."""

    def build(ids: list[int]) -> pa.Table:
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
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "image": pa.array(imgs, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "fmt": pa.array(["bmp24"] * len(ids), pa.string()),
            }
        )

    return _mirror_cached(sf_dir, "media", "images.parquet", build)


def read_images(sf_dir: str, columns: list[str] | None = None):
    """Dataset over the BMP mirror (column-pruned parquet read, split
    into many blocks: the mirror is ONE parquet file, and a one-block read
    serializes every downstream decode into a single map task no matter
    the stage's concurrency)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_parquet(
        media_mirror(sf_dir), columns=columns, override_num_blocks=32
    )


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
    """Materialize the WAV audio table for ``sf_dir``'s documents
    (shared _mirror_cached discipline)."""

    def build(ids: list[int]) -> pa.Table:
        clips, rates, lens = [], [], []
        for d in ids:
            smp, r = _gen_samples(d)
            clips.append(wav_encode(smp, r))
            rates.append(r)
            lens.append(len(smp))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "audio": pa.array(clips, pa.binary()),
                "sample_rate": pa.array(rates, pa.int32()),
                "n_samples": pa.array(lens, pa.int32()),
                "fmt": pa.array(["wav16"] * len(ids), pa.string()),
            }
        )

    return _mirror_cached(sf_dir, "audio", "audio.parquet", build)


def read_audio(sf_dir: str, columns: list[str] | None = None):
    """Dataset over the WAV mirror (column-pruned parquet read, split
    into many blocks: the mirror is ONE parquet file, and a one-block read
    serializes every downstream decode into a single map task no matter
    the stage's concurrency)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_parquet(
        audio_mirror(sf_dir), columns=columns, override_num_blocks=32
    )


# ---------------------------------------------------------------- video
# Minimal deterministic frame container: b"VID0" + u32 frame count, then
# per frame u32 length + a 24-bit BMP payload.  Mirror contract (shared
# input): one clip per doc_id, 8 + 4*(doc_id % 3) frames of 16x16;
# frame f+1 = frame f with 3 pixels' low bits flipped (slow motion, the
# average-hash is stable across it), EXCEPT at the planted shot cuts —
# frame indices {n//3, (2*n)//3} re-seed the pixels entirely (hash jumps)
# — so shot-boundary detection has ground truth.


def vid_encode(frames: list[np.ndarray]) -> bytes:
    out = [b"VID0", struct.pack("<I", len(frames))]
    for px in frames:
        b = bmp_encode(px)
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


def vid_decode(data: bytes) -> list[np.ndarray]:
    if data[:4] != b"VID0":
        raise ValueError("not a VID0 container")
    n = struct.unpack_from("<I", data, 4)[0]
    off = 8
    frames = []
    for _ in range(n):
        ln = struct.unpack_from("<I", data, off)[0]
        off += 4
        frames.append(bmp_decode(data[off:off + ln]))
        off += ln
    return frames


def video_shot_cuts(n_frames: int) -> tuple[int, int]:
    """The planted cut indices for an n-frame clip (frame i is a cut when
    its content re-seeds relative to frame i-1)."""
    return n_frames // 3, (2 * n_frames) // 3


def _gen_video(doc_id: int) -> list[np.ndarray]:
    n = 8 + 4 * (doc_id % 3)
    cuts = set(video_shot_cuts(n))
    frames: list[np.ndarray] = []
    for f in range(n):
        if f == 0 or f in cuts:
            rng = np.random.Generator(np.random.PCG64((doc_id << 8) | f))
            px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        else:
            px = frames[-1].copy()
            # 3 deterministic low-bit flips — motion the hash ignores
            for k in range(3):
                px[(f + k) % 16, (f * 5 + k) % 16, k] ^= 1
        frames.append(px)
    return frames


def video_mirror(sf_dir: str) -> str:
    """Materialize the video-clip table for ``sf_dir``'s documents
    (shared _mirror_cached discipline)."""

    def build(ids: list[int]) -> pa.Table:
        clips, nframes = [], []
        for d in ids:
            frames = _gen_video(d)
            clips.append(vid_encode(frames))
            nframes.append(len(frames))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "video": pa.array(clips, pa.binary()),
                "n_frames": pa.array(nframes, pa.int32()),
                "fmt": pa.array(["vid0-bmp24"] * len(ids), pa.string()),
            }
        )

    return _mirror_cached(sf_dir, "video", "video.parquet", build)


def read_video(sf_dir: str, columns: list[str] | None = None):
    """Dataset over the video mirror (column-pruned parquet read, split
    into many blocks: the mirror is ONE parquet file, and a one-block read
    serializes every downstream decode into a single map task no matter
    the stage's concurrency)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_parquet(
        video_mirror(sf_dir), columns=columns, override_num_blocks=32
    )


# ----------------------------------------------------------------- PNG
# A REAL raster container (unlike the sandbox-local VID0): ISO/IEC 15948
# PNG, 8-bit truecolor (color type 2) and truecolor+alpha (color type 6),
# non-interlaced, zlib-compressed IDAT, CRC-verified chunks — encodable
# and decodable with stdlib zlib alone, and readable by any external
# image tool.  The encoder deliberately cycles the per-row filter type
# (row % 5: None/Sub/Up/Average/Paeth) so the decoder's full filter
# reconstruction is exercised on every image, not just filter 0.
# Reference precedent: scrapy/pipelines/images.py::ImagesPipeline decodes
# real raster formats; this brings the media family from toy-only
# (BMP/WAV/VID0) to a production wire format.
#
# Mirror contract (shared input, like the BMP mirror):
#   * one row per doc_id: (doc_id, image binary, width int32,
#     height int32, channels int32, fmt='png24'|'png32')
#   * width = 16 + 8*(doc_id % 3), height = 16 + 8*((doc_id // 3) % 3)
#   * RGBA (png32) iff doc_id % 4 == 1, else RGB (png24)
#   * pixels: uint8 from PCG64(doc_id ^ 0x9C6) — independent stream
#   * near-dup plant: doc_id % 10 == 9 copies doc_id-1's pixel array
#     (and channel count) with ONE low bit flipped (pixel [0,0,0] ^= 1)


def _png_chunk(tag: bytes, payload: bytes) -> bytes:
    import zlib as _z

    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", _z.crc32(tag + payload) & 0xFFFFFFFF)
    )


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_encode(pixels: np.ndarray) -> bytes:
    """H x W x C uint8 (C = 3 RGB or 4 RGBA) -> real PNG bytes.  Per-row
    filter = row % 5, exercising all five spec filters; IDAT is one zlib
    stream at default compression."""
    import zlib as _z

    h, w, c = pixels.shape
    if c not in (3, 4):
        raise ValueError("png_encode wants RGB or RGBA pixels")
    color_type = 2 if c == 3 else 6
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    px = pixels.astype(np.int64)
    raw = bytearray()
    prior = np.zeros((w, c), dtype=np.int64)
    for y in range(h):
        row = px[y]
        ft = y % 5
        left = np.zeros_like(row)
        left[1:] = row[:-1]
        if ft == 0:
            filt = row
        elif ft == 1:  # Sub
            filt = row - left
        elif ft == 2:  # Up
            filt = row - prior
        elif ft == 3:  # Average
            filt = row - (left + prior) // 2
        else:  # Paeth
            up_left = np.zeros_like(prior)
            up_left[1:] = prior[:-1]
            p = left + prior - up_left
            pa_ = np.abs(p - left)
            pb = np.abs(p - prior)
            pd = np.abs(p - up_left)
            pred = np.where(
                (pa_ <= pb) & (pa_ <= pd), left, np.where(pb <= pd, prior, up_left)
            )
            filt = row - pred
        raw.append(ft)
        raw.extend((filt % 256).astype(np.uint8).tobytes())
        prior = row
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> np.ndarray:
    """Real PNG bytes -> H x W x C uint8 (C = 3 or 4).  Strict subset:
    8-bit color type 2/6, non-interlaced; chunk CRCs verified; IDAT may
    span multiple chunks (concatenated before inflate, per spec).
    None/Up filters reconstruct fully vectorized; Sub/Average/Paeth carry
    a left-neighbor dependency, resolved pixel-at-a-time along the row
    with the whole channel vector at once."""
    import zlib as _z

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    w = h = c = -1
    idat = bytearray()
    while off < len(data):
        ln = struct.unpack_from(">I", data, off)[0]
        tag = data[off + 4 : off + 8]
        payload = data[off + 8 : off + 8 + ln]
        crc = struct.unpack_from(">I", data, off + 8 + ln)[0]
        if _z.crc32(tag + payload) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, bits, color_type, comp, filt, ilace = struct.unpack(
                ">IIBBBBB", payload
            )
            if bits != 8 or color_type not in (2, 6) or comp or filt or ilace:
                raise ValueError("unsupported PNG variant")
            c = 3 if color_type == 2 else 4
        elif tag == b"IDAT":
            idat.extend(payload)
        elif tag == b"IEND":
            break
        off += 12 + ln
    if w < 0 or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = _z.decompress(bytes(idat))
    stride = 1 + w * c
    if len(raw) != stride * h:
        raise ValueError("PNG pixel payload size mismatch")
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)
    out = np.zeros((h, w, c), dtype=np.int64)
    prior = np.zeros((w, c), dtype=np.int64)
    for y in range(h):
        ft = rows[y, 0]
        filt = rows[y, 1:].reshape(w, c).astype(np.int64)
        if ft == 0:
            recon = filt
        elif ft == 2:  # Up
            recon = (filt + prior) % 256
        elif ft == 1:  # Sub
            # recon[x] = (filt[x] + recon[x-1]) % 256 telescopes to a
            # cumulative sum along the row — fully vectorized
            recon = np.cumsum(filt, axis=0) % 256
        elif ft == 3:  # Average
            recon = filt.copy()
            recon[0] = (recon[0] + prior[0] // 2) % 256
            for x in range(1, w):
                recon[x] = (recon[x] + (recon[x - 1] + prior[x]) // 2) % 256
        elif ft == 4:  # Paeth
            recon = filt.copy()
            recon[0] = (recon[0] + prior[0]) % 256  # left/up-left are 0
            for x in range(1, w):
                left, up, up_left = recon[x - 1], prior[x], prior[x - 1]
                p = left + up - up_left
                pa_ = np.abs(p - left)
                pb = np.abs(p - up)
                pd = np.abs(p - up_left)
                pred = np.where(
                    (pa_ <= pb) & (pa_ <= pd),
                    left,
                    np.where(pb <= pd, up, up_left),
                )
                recon[x] = (recon[x] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = recon
        prior = recon
    return out.astype(np.uint8)


def _gen_png_pixels(doc_id: int) -> np.ndarray:
    w = 16 + 8 * (doc_id % 3)
    h = 16 + 8 * ((doc_id // 3) % 3)
    c = 4 if doc_id % 4 == 1 else 3
    rng = np.random.Generator(np.random.PCG64(doc_id ^ 0x9C6))
    return rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)


def png_mirror(sf_dir: str) -> str:
    """Materialize the PNG image table for ``sf_dir``'s documents
    (shared _mirror_cached discipline)."""

    def build(ids: list[int]) -> pa.Table:
        id_set = set(ids)
        imgs, ws, hs, cs, fmts = [], [], [], [], []
        for d in ids:
            if d % 10 == 9 and (d - 1) in id_set:
                px = _gen_png_pixels(d - 1).copy()
                px[0, 0, 0] ^= 1  # the planted near-dup
            else:
                px = _gen_png_pixels(d)
            imgs.append(png_encode(px))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            cs.append(px.shape[2])
            fmts.append("png24" if px.shape[2] == 3 else "png32")
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "image": pa.array(imgs, pa.binary()),
                "width": pa.array(ws, pa.int32()),
                "height": pa.array(hs, pa.int32()),
                "channels": pa.array(cs, pa.int32()),
                "fmt": pa.array(fmts, pa.string()),
            }
        )

    return _mirror_cached(sf_dir, "png", "images.parquet", build)


def read_png(sf_dir: str, columns: list[str] | None = None):
    """Dataset over the PNG mirror (column-pruned parquet read, split
    into many blocks: the mirror is ONE parquet file, and a one-block read
    serializes every downstream decode into a single map task no matter
    the stage's concurrency)."""
    import ray.data as rd

    from scrapy__ray.pipelines.util import ensure_ctx

    ensure_ctx()
    return rd.read_parquet(
        png_mirror(sf_dir), columns=columns, override_num_blocks=32
    )


def image_decode_rgb(data: bytes) -> np.ndarray:
    """Format-dispatching decode to H x W x 3 RGB: BMP or PNG by magic
    bytes; PNG alpha is DROPPED (pinned contract — perceptual hash and
    embed operate on color channels only, mirrored by the oracle)."""
    if data[:2] == b"BM":
        return bmp_decode(data)
    if data[:8] == _PNG_SIG:
        px = png_decode(data)
        return px[:, :, :3].copy() if px.shape[2] == 4 else px
    raise ValueError("unknown image format")
