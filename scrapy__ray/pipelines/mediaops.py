"""Multimodal image operators over the BMP mirror (sources/media.py) —
the REAL media family (decode, channel stats, resize, linear embed,
perceptual-hash dedup), complementing the declared stubs in textops.py
whose libraries don't exist in this sandbox.

Every op is an actor-pool map_batches stage over the opaque ``image``
binary column: per-actor state (the embed projection matrix) is built in
``__init__`` once, batches decode vectorized with numpy, and all outputs
are integer-exact so the independent struct-based byte-level oracles in
oracle_ext.py compare bit-for-bit (materialized parquet oracles — pixels
are not SQL-expressible).

Pinned numeric contracts (mirrored by the oracles):
  * nearest-neighbor resize, floor rule: source index for output cell i
    of N over dimension D is ``(i * D) // N``
  * channel means int-fixed: ``channel_sum * 10**4 // n_pixels``
  * average-hash: resize to 8x8, gray_fix = r*299 + g*587 + b*114
    (int64, no division), bit j set iff ``gray_j * 64 >= sum(gray)``
    (>= mean in exact integers), bits packed row-major MSB-first
  * embed: resize to 16x16, flatten RGB row-major to 768 ints, multiply
    by the P matrix (768x8 int entries in [-3, 3] from
    blake2b(b"mediaproj-<col>") byte stream: ``b % 7 - 3``)

Scale shape: decode/stats/embed are pure map_batches — ZERO exchanges;
ahash dedup adds ONE narrow hash exchange (16-byte hash + doc_id per
image) and per-partition a<b pair emission, the exact-dedup pattern.
At 10^10 images the binary column never moves — only hashes do.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from scrapy__ray.sources.media import bmp_decode, image_decode_rgb, read_images
from scrapy__ray.pipelines.util import collect_arrow, hash_partition_map

_MEAN_FIX = 10**4
_EMBED_SIDE = 16
_EMBED_DIM = 8
_AHASH_SIDE = 8


def _nn_resize(px: np.ndarray, side: int) -> np.ndarray:
    h, w, _ = px.shape
    yi = (np.arange(side) * h) // side
    xi = (np.arange(side) * w) // side
    return px[yi][:, xi]


def _proj_matrix() -> np.ndarray:
    """Deterministic 768x8 int projection, entries in [-3, 3]."""
    n = _EMBED_SIDE * _EMBED_SIDE * 3
    cols = []
    for c in range(_EMBED_DIM):
        buf = b""
        while len(buf) < n:
            buf += hashlib.blake2b(
                f"mediaproj-{c}-{len(buf)}".encode(), digest_size=64
            ).digest()
        col = np.frombuffer(buf[:n], dtype=np.uint8).astype(np.int64) % 7 - 3
        cols.append(col)
    return np.stack(cols, axis=1)  # (768, 8)


class _DecodeStats:
    """Actor-pool stage: decode + per-image channel statistics."""

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        out = {
            "doc_id": ids, "width": [], "height": [],
            "r_mean_fix": [], "g_mean_fix": [], "b_mean_fix": [],
        }
        for data in t["image"].to_pylist():
            px = bmp_decode(data)
            h, w, _ = px.shape
            n = h * w
            sums = px.reshape(n, 3).astype(np.int64).sum(axis=0)
            out["width"].append(w)
            out["height"].append(h)
            out["r_mean_fix"].append(int(sums[0]) * _MEAN_FIX // n)
            out["g_mean_fix"].append(int(sums[1]) * _MEAN_FIX // n)
            out["b_mean_fix"].append(int(sums[2]) * _MEAN_FIX // n)
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.int64()),
                "width": pa.array(out["width"], pa.int64()),
                "height": pa.array(out["height"], pa.int64()),
                "r_mean_fix": pa.array(out["r_mean_fix"], pa.int64()),
                "g_mean_fix": pa.array(out["g_mean_fix"], pa.int64()),
                "b_mean_fix": pa.array(out["b_mean_fix"], pa.int64()),
            }
        )


def media_bmp_stats(sf_dir: str):
    """Decode every BMP and report (width, height, int-fixed channel
    means) per image — the metadata-extraction stage of an image-curation
    pipeline, on real pixels.  Pure map_batches over the pruned
    (doc_id, image) read; actor pool sized small (stateless decode, the
    pool exists for the pattern and for fair scheduling vs wider ops)."""
    ds = read_images(sf_dir, columns=["doc_id", "image"])
    out = ds.map_batches(
        _DecodeStats, concurrency=2, batch_size=128, batch_format="pyarrow"
    )
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()), ("width", pa.int64()),
                ("height", pa.int64()), ("r_mean_fix", pa.int64()),
                ("g_mean_fix", pa.int64()), ("b_mean_fix", pa.int64()),
            ]
        ),
    )


class _ResizeEmbed:
    """Actor-pool stage: the projection matrix is built ONCE per actor in
    __init__ (the model-load pattern), batches multiply vectorized.
    Format-agnostic decode (BMP or PNG by magic; PNG alpha dropped) so
    the same pipeline serves both image mirrors."""

    def __init__(self) -> None:
        self.P = _proj_matrix()

    def __call__(self, t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        vecs = np.empty((len(ids), _EMBED_DIM), dtype=np.int64)
        for i, data in enumerate(t["image"].to_pylist()):
            px = _nn_resize(image_decode_rgb(data), _EMBED_SIDE)
            flat = px.reshape(-1).astype(np.int64)
            vecs[i] = flat @ self.P
        cols = {"doc_id": pa.array(ids, pa.int64())}
        for c in range(_EMBED_DIM):
            cols[f"e{c}"] = pa.array(vecs[:, c], pa.int64())
        return pa.table(cols)


def _resize_embed_over(ds, concurrency=2):
    # tuple concurrency = autoscaling pool (min, max) — see media_png_stats
    out = ds.map_batches(
        _ResizeEmbed, concurrency=concurrency, batch_size=64,
        batch_format="pyarrow",
    )
    return collect_arrow(
        out,
        pa.schema(
            [("doc_id", pa.int64())]
            + [(f"e{c}", pa.int64()) for c in range(_EMBED_DIM)]
        ),
    )


def media_resize_embed(sf_dir: str):
    """Resize every image to 16x16 (nearest-neighbor, floor rule) and
    project to an 8-dim integer embedding — the image-featurization stage
    (decode -> resize -> batched matmul) with the matrix held per actor.
    Integer-exact end to end, so the struct-based oracle is bit-equal."""
    return _resize_embed_over(read_images(sf_dir, columns=["doc_id", "image"]))


def media_png_resize_embed(sf_dir: str):
    """The SAME featurization pipeline (same actor class, same projection
    matrix, same pinned contracts) over the real-PNG mirror — alpha
    channels dropped at decode per the image_decode_rgb contract."""
    from scrapy__ray.sources.media import read_png

    return _resize_embed_over(
        read_png(sf_dir, columns=["doc_id", "image"]), concurrency=(1, 8)
    )


def _ahash64(px: np.ndarray) -> int:
    small = _nn_resize(px, _AHASH_SIDE).astype(np.int64)
    gray = small[:, :, 0] * 299 + small[:, :, 1] * 587 + small[:, :, 2] * 114
    flat = gray.reshape(-1)
    total = int(flat.sum())
    bits = (flat * (_AHASH_SIDE * _AHASH_SIDE) >= total).astype(np.uint64)
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def _ahash_dups_over(ds):
    def hash_batch(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        hs = [
            f"{_ahash64(image_decode_rgb(d)):016x}"
            for d in t["image"].to_pylist()
        ]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "h": pa.array(hs, pa.string())}
        )

    # small batches so the decode fans out across the task pool (a single
    # parquet-block-sized batch serializes 5k decodes into a few tasks)
    hashed = ds.map_batches(hash_batch, batch_format="pyarrow", batch_size=64)

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        a_out, b_out, h_out = [], [], []
        for h, grp in df.groupby("h"):
            ids = sorted(grp["doc_id"])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a_out.append(ids[i])
                    b_out.append(ids[j])
                    h_out.append(h)
        return pd.DataFrame({"doc_a": a_out, "doc_b": b_out, "ahash": h_out})

    out = hash_partition_map(hashed, ["h"], pairs)
    return collect_arrow(
        out,
        pa.schema(
            [("doc_a", pa.int64()), ("doc_b", pa.int64()), ("ahash", pa.string())]
        ),
    )


def media_ahash_dups(sf_dir: str):
    """Perceptual near-duplicate pairs by average-hash: images whose
    8x8 luminance sketch is bit-identical — catches the mirror's planted
    one-bit-perturbed copies that exact byte dedup cannot (the image
    analogue of SimHash text dedup).  Shape: per-batch hashing (map
    only), ONE hash exchange of (ahash, doc_id), per-partition a<b pair
    emission — the exact-dedup pattern; pixels never shuffle."""
    return _ahash_dups_over(read_images(sf_dir, columns=["doc_id", "image"]))


def media_png_ahash_dups(sf_dir: str):
    """The SAME perceptual-dedup pipeline over the real-PNG mirror —
    catches its planted one-bit-perturbed copies through a real
    zlib/filter decode path."""
    from scrapy__ray.sources.media import read_png

    return _ahash_dups_over(read_png(sf_dir, columns=["doc_id", "image"]))


class _PngStats:
    """Actor-pool stage: real-PNG decode (zlib inflate + all five spec
    filters, CRC-verified) + per-image channel statistics.  a_mean_fix is
    -1 for RGB images (no alpha channel) — pinned, oracle-mirrored."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from scrapy__ray.sources.media import png_decode

        ids = t["doc_id"].to_pylist()
        out = {
            "width": [], "height": [], "channels": [],
            "r_mean_fix": [], "g_mean_fix": [], "b_mean_fix": [],
            "a_mean_fix": [],
        }
        for data in t["image"].to_pylist():
            px = png_decode(data)
            h, w, c = px.shape
            n = h * w
            sums = px.reshape(n, c).astype(np.int64).sum(axis=0)
            out["width"].append(w)
            out["height"].append(h)
            out["channels"].append(c)
            out["r_mean_fix"].append(int(sums[0]) * _MEAN_FIX // n)
            out["g_mean_fix"].append(int(sums[1]) * _MEAN_FIX // n)
            out["b_mean_fix"].append(int(sums[2]) * _MEAN_FIX // n)
            out["a_mean_fix"].append(
                int(sums[3]) * _MEAN_FIX // n if c == 4 else -1
            )
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64())}
            | {k: pa.array(v, pa.int64()) for k, v in out.items()}
        )


def media_png_stats(sf_dir: str):
    """Decode every PNG (a REAL wire format: zlib IDAT, per-row filters,
    chunk CRCs) and report (width, height, channels, int-fixed channel
    means incl. alpha) per image.  Pure map_batches over the pruned
    (doc_id, image) read — zero exchanges; the binary column never
    leaves the task."""
    from scrapy__ray.sources.media import read_png

    ds = read_png(sf_dir, columns=["doc_id", "image"])
    # wider pool than the BMP family: a real PNG decode (inflate + filter
    # reconstruction) costs ~10x a vectorized BMP slice, so 2 actors
    # starve the stage.  AUTOSCALING (1, 8), not a fixed 8: a fixed pool
    # larger than the cluster deadlocks the streaming executor on small
    # sessions (4 actors pending forever reserve the read's resources —
    # observed as a full hang at the 4-cpu test fixture).
    out = ds.map_batches(
        _PngStats, concurrency=(1, 8), batch_size=64, batch_format="pyarrow"
    )
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()), ("width", pa.int64()),
                ("height", pa.int64()), ("channels", pa.int64()),
                ("r_mean_fix", pa.int64()), ("g_mean_fix", pa.int64()),
                ("b_mean_fix", pa.int64()), ("a_mean_fix", pa.int64()),
            ]
        ),
    )





# ---------------------------------------------------------------- audio ops
_FRAME_LEN = 200
_FRAME_HOP = 400
_FRAME_TOPK = 3


class _WavStats:
    """Actor-pool stage: decode + per-clip signal statistics (integer
    exact: energy_fix = sum(s^2) // n; zero crossings = sign flips of
    the (s < 0) predicate between consecutive samples)."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from scrapy__ray.sources.media import wav_decode

        ids = t["doc_id"].to_pylist()
        sr, ns, ef, zc = [], [], [], []
        for data in t["audio"].to_pylist():
            s, rate = wav_decode(data)
            x = s.astype(np.int64)
            sr.append(rate)
            ns.append(len(x))
            ef.append(int((x * x).sum()) // len(x))
            neg = x < 0
            zc.append(int((neg[1:] != neg[:-1]).sum()))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "sample_rate": pa.array(sr, pa.int64()),
                "n_samples": pa.array(ns, pa.int64()),
                "energy_fix": pa.array(ef, pa.int64()),
                "zero_cross": pa.array(zc, pa.int64()),
            }
        )


def media_wav_stats(sf_dir: str):
    """Decode every WAV clip and report per-clip signal features — the
    audio metadata/quality stage (duration, integer-fixed energy, zero
    crossings) on real PCM.  Pure map_batches, zero exchanges."""
    from scrapy__ray.sources.media import read_audio

    ds = read_audio(sf_dir, columns=["doc_id", "audio"])
    out = ds.map_batches(
        _WavStats, concurrency=2, batch_size=128, batch_format="pyarrow"
    )
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()), ("sample_rate", pa.int64()),
                ("n_samples", pa.int64()), ("energy_fix", pa.int64()),
                ("zero_cross", pa.int64()),
            ]
        ),
    )


class _WavFrames:
    """Actor-pool stage: fixed-stride frame sampling — frames of
    _FRAME_LEN samples every _FRAME_HOP, per-frame exact energy, top
    _FRAME_TOPK frames per clip by (energy desc, frame_idx asc).  The
    video/audio frame-sample pattern of the build brief on real data."""

    def __call__(self, t: pa.Table) -> pa.Table:
        from scrapy__ray.sources.media import wav_decode

        out_id, out_fi, out_en = [], [], []
        for did, data in zip(t["doc_id"].to_pylist(), t["audio"].to_pylist()):
            s, _ = wav_decode(data)
            x = s.astype(np.int64)
            frames = []
            fi = 0
            for start in range(0, len(x) - _FRAME_LEN + 1, _FRAME_HOP):
                w = x[start:start + _FRAME_LEN]
                frames.append((int((w * w).sum()), fi))
                fi += 1
            frames.sort(key=lambda e: (-e[0], e[1]))
            for en, idx in frames[:_FRAME_TOPK]:
                out_id.append(did)
                out_fi.append(idx)
                out_en.append(en)
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "frame_idx": pa.array(out_fi, pa.int64()),
                "energy": pa.array(out_en, pa.int64()),
            }
        )


def media_wav_framesample(sf_dir: str):
    """Top-energy frame sampling per audio clip (decode -> stride frames
    -> exact per-frame energy -> per-clip top-k).  Pure map_batches —
    the per-clip top-k needs no exchange because a clip never spans
    batches (one row per clip)."""
    from scrapy__ray.sources.media import read_audio

    ds = read_audio(sf_dir, columns=["doc_id", "audio"])
    out = ds.map_batches(
        _WavFrames, concurrency=2, batch_size=128, batch_format="pyarrow"
    )
    return collect_arrow(
        out,
        pa.schema(
            [
                ("doc_id", pa.int64()), ("frame_idx", pa.int64()),
                ("energy", pa.int64()),
            ]
        ),
    )


# ---------------------------------------------------------------- video ops
_VIDEO_SAMPLE_STRIDE = 4
_SHOT_HAMMING_MIN = 8


class _VideoFrameHash:
    """Actor-pool stage: decode the frame container, average-hash every
    frame (shared _ahash64 kernel), emit either the stride sample or the
    consecutive-pair hamming distances depending on ``mode``."""

    def __init__(self, mode: str) -> None:
        self.mode = mode

    def __call__(self, t: pa.Table) -> pa.Table:
        from scrapy__ray.sources.media import vid_decode

        out_id, out_fi = [], []
        hashes_out: list[str] = []
        hamming_out: list[int] = []
        for did, data in zip(t["doc_id"].to_pylist(), t["video"].to_pylist()):
            hashes = [_ahash64(px) for px in vid_decode(data)]
            if self.mode == "sample":
                for fi in range(0, len(hashes), _VIDEO_SAMPLE_STRIDE):
                    out_id.append(did)
                    out_fi.append(fi)
                    hashes_out.append(f"{hashes[fi]:016x}")
            else:  # shot-boundary mode: frame i vs i-1 hamming distance
                for fi in range(1, len(hashes)):
                    d = bin(hashes[fi] ^ hashes[fi - 1]).count("1")
                    if d >= _SHOT_HAMMING_MIN:
                        out_id.append(did)
                        out_fi.append(fi)
                        hamming_out.append(d)
        cols = {
            "doc_id": pa.array(out_id, pa.int64()),
            "frame_idx": pa.array(out_fi, pa.int64()),
        }
        if self.mode == "sample":
            cols["ahash"] = pa.array(hashes_out, pa.string())
        else:
            cols["hamming"] = pa.array(hamming_out, pa.int64())
        return pa.table(cols)


def media_video_framesample(sf_dir: str):
    """Every _VIDEO_SAMPLE_STRIDE-th frame's perceptual hash per clip —
    the video frame-sampling stage (decode -> per-frame feature) of the
    build brief, on a real frame container.  Pure map_batches; the frame
    payloads never leave the task."""
    from scrapy__ray.sources.media import read_video

    ds = read_video(sf_dir, columns=["doc_id", "video"])
    out = ds.map_batches(
        _VideoFrameHash,
        fn_constructor_args=("sample",),
        concurrency=2,
        batch_size=64,
        batch_format="pyarrow",
    )
    return collect_arrow(
        out,
        pa.schema(
            [("doc_id", pa.int64()), ("frame_idx", pa.int64()), ("ahash", pa.string())]
        ),
    )


def media_video_shot_changes(sf_dir: str):
    """Shot-boundary detection: frames whose average-hash hamming
    distance to the previous frame is >= _SHOT_HAMMING_MIN (the planted
    cuts re-seed content, slow motion only flips low bits the hash
    ignores).  Pure map_batches — a clip never spans batches, so the
    consecutive-pair scan needs no exchange."""
    from scrapy__ray.sources.media import read_video

    ds = read_video(sf_dir, columns=["doc_id", "video"])
    out = ds.map_batches(
        _VideoFrameHash,
        fn_constructor_args=("shots",),
        concurrency=2,
        batch_size=64,
        batch_format="pyarrow",
    )
    return collect_arrow(
        out,
        pa.schema(
            [("doc_id", pa.int64()), ("frame_idx", pa.int64()), ("hamming", pa.int64())]
        ),
    )


QUERIES = {
    "media_bmp_stats": (media_bmp_stats, None),
    "media_resize_embed": (media_resize_embed, None),
    "media_ahash_dups": (media_ahash_dups, None),
    "media_png_stats": (media_png_stats, None),
    "media_png_resize_embed": (media_png_resize_embed, None),
    "media_png_ahash_dups": (media_png_ahash_dups, None),
    "media_wav_stats": (media_wav_stats, None),
    "media_wav_framesample": (media_wav_framesample, None),
    "media_video_framesample": (media_video_framesample, None),
    "media_video_shot_changes": (media_video_shot_changes, None),
}
