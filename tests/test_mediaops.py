"""Media (BMP) family gates: codec roundtrip, planted near-dup recovery,
pinned numeric contracts.  Engine-vs-oracle bit-equality itself is covered
by the driver-mimic suite (materialized struct-based oracles)."""

from __future__ import annotations

import numpy as np

SF_DIR = "/root/testdata/sf0.01"


def test_bmp_codec_roundtrip():
    """encode->decode is the identity for arbitrary sizes, including the
    widths whose 3-byte rows need 4-byte padding (w % 4 != 0)."""
    from scrapy__ray.sources.media import bmp_decode, bmp_encode

    rng = np.random.Generator(np.random.PCG64(7))
    for h, w in [(1, 1), (3, 5), (16, 16), (17, 23), (24, 32), (8, 2)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = bmp_decode(bmp_encode(px))
        assert out.shape == (h, w, 3)
        assert (out == px).all(), (h, w)


def test_oracle_decoder_agrees_with_engine_decoder():
    """The independent struct/bytes parser (oracle_ext) and the numpy
    decoder must agree pixel-for-pixel — two implementations, one format."""
    from scrapy__ray.oracle_ext import _odecode_bmp
    from scrapy__ray.sources.media import bmp_decode, bmp_encode

    rng = np.random.Generator(np.random.PCG64(11))
    px = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    data = bmp_encode(px)
    eng = bmp_decode(data)
    orc = np.array(_odecode_bmp(data), dtype=np.uint8)
    assert (eng == orc).all()


def test_nn_resize_floor_rule():
    """Pinned rule: source index for output cell i of N over dimension D
    is (i*D)//N — spot-checked against a hand computation."""
    from scrapy__ray.pipelines.mediaops import _nn_resize

    px = np.arange(6 * 4 * 3, dtype=np.uint8).reshape(6, 4, 3)
    small = _nn_resize(px, 2)
    # rows 0 and 3 ((0*6)//2, (1*6)//2), cols 0 and 2
    assert (small[0, 0] == px[0, 0]).all()
    assert (small[1, 1] == px[3, 2]).all()


def test_ahash_dups_recover_planted_pairs(ray_session):
    """The mirror plants a one-low-bit-perturbed copy of doc_id-1 at every
    doc_id % 10 == 9; average-hash must pair almost all of them (a plant
    is missed only when the single +-1 luminance nudge crosses a cell's
    exact mean threshold), and every reported pair must share a hash."""
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.mediaops import media_ahash_dups
    from scrapy__ray.sources.media import media_mirror

    got = media_ahash_dups(SF_DIR).to_pandas()
    assert (got["doc_a"] < got["doc_b"]).all()
    ids = set(
        pq.read_table(media_mirror(SF_DIR), columns=["doc_id"])["doc_id"].to_pylist()
    )
    planted = {(d - 1, d) for d in ids if d % 10 == 9 and (d - 1) in ids}
    found = set(zip(got["doc_a"], got["doc_b"]))
    assert planted, "fixture must plant pairs"
    recovered = len(planted & found) / len(planted)
    assert recovered >= 0.8, (recovered, len(planted))


def test_embed_projection_is_deterministic_and_bounded():
    from scrapy__ray.pipelines.mediaops import _proj_matrix

    P = _proj_matrix()
    assert P.shape == (16 * 16 * 3, 8)
    assert P.min() >= -3 and P.max() <= 3
    assert (P == _proj_matrix()).all()


def test_wav_codec_roundtrip():
    from scrapy__ray.sources.media import wav_decode, wav_encode

    rng = np.random.Generator(np.random.PCG64(3))
    for n, rate in [(1, 8000), (200, 16000), (1601, 8000)]:
        s = rng.integers(-(1 << 15), 1 << 15, size=n).astype(np.int16)
        out, r = wav_decode(wav_encode(s, rate))
        assert r == rate and (out == s).all()


def test_wav_oracle_decoder_agrees_with_engine_decoder():
    from scrapy__ray.oracle_ext import _odecode_wav
    from scrapy__ray.sources.media import wav_decode, wav_encode

    rng = np.random.Generator(np.random.PCG64(5))
    s = rng.integers(-(1 << 15), 1 << 15, size=333).astype(np.int16)
    data = wav_encode(s, 16000)
    eng, er = wav_decode(data)
    orc, orr = _odecode_wav(data)
    assert er == orr == 16000
    assert eng.tolist() == orc


def test_wav_framesample_shape(ray_session):
    """Every clip reports at most top-3 frames; frame indices must be
    valid for the clip's stride grid and energies non-negative."""
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.mediaops import media_wav_framesample
    from scrapy__ray.sources.media import audio_mirror

    got = media_wav_framesample(SF_DIR).to_pandas()
    lens = dict(
        zip(
            *[
                pq.read_table(audio_mirror(SF_DIR), columns=["doc_id", "n_samples"])[c].to_pylist()
                for c in ("doc_id", "n_samples")
            ]
        )
    )
    per = got.groupby("doc_id").size()
    assert (per <= 3).all()
    assert set(got["doc_id"]) == set(lens)
    assert (got["energy"] >= 0).all()
    for _, row in got.iterrows():
        max_fi = (lens[row["doc_id"]] - 200) // 400
        assert 0 <= row["frame_idx"] <= max_fi


def test_video_container_roundtrip():
    from scrapy__ray.sources.media import vid_decode, vid_encode

    rng = np.random.Generator(np.random.PCG64(13))
    frames = [
        rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8) for _ in range(5)
    ]
    out = vid_decode(vid_encode(frames))
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert (a == b).all()


def test_video_shot_changes_recover_planted_cuts(ray_session):
    """Every clip plants cuts at {n//3, (2n)//3}; the detector must report
    exactly those indices for almost every clip (slow-motion low-bit
    flips must NOT fire — a miss can only occur when a re-seeded frame
    happens to land hash-close to its predecessor)."""
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.mediaops import media_video_shot_changes
    from scrapy__ray.sources.media import video_mirror, video_shot_cuts

    got = media_video_shot_changes(SF_DIR).to_pandas()
    meta = pq.read_table(video_mirror(SF_DIR), columns=["doc_id", "n_frames"])
    planted = {
        d: set(video_shot_cuts(n))
        for d, n in zip(meta["doc_id"].to_pylist(), meta["n_frames"].to_pylist())
    }
    reported = got.groupby("doc_id")["frame_idx"].agg(set).to_dict()
    exact = sum(1 for d in planted if reported.get(d, set()) == planted[d])
    assert exact / len(planted) >= 0.9, (exact, len(planted))
    # no false positives outside the planted grid anywhere
    fp = sum(
        len(reported.get(d, set()) - planted[d]) for d in planted
    )
    assert fp == 0, fp


# ------------------------------------------------------------------ PNG
def test_png_codec_roundtrip_rgb_and_rgba():
    """encode->decode identity for RGB and RGBA at sizes that exercise
    every per-row filter (the encoder cycles row % 5), including 1-pixel
    rows where left/up-left neighbors are all zero."""
    from scrapy__ray.sources.media import png_decode, png_encode

    rng = np.random.Generator(np.random.PCG64(13))
    for h, w, c in [(1, 1, 3), (5, 3, 3), (6, 6, 4), (17, 23, 3), (9, 2, 4)]:
        px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
        out = png_decode(png_encode(px))
        assert out.shape == (h, w, c)
        assert (out == px).all(), (h, w, c)


def test_png_crc_is_verified():
    import pytest

    from scrapy__ray.sources.media import png_decode, png_encode

    data = bytearray(png_encode(np.zeros((4, 4, 3), dtype=np.uint8)))
    data[40] ^= 0xFF  # corrupt one IDAT byte without fixing the CRC
    with pytest.raises(ValueError, match="CRC"):
        png_decode(bytes(data))


def test_png_multi_idat_chunks_decode():
    """Per spec the IDAT zlib stream may be split across chunks — the
    decoder must concatenate before inflating."""
    import struct
    import zlib

    from scrapy__ray.sources.media import _png_chunk, png_decode, png_encode

    rng = np.random.Generator(np.random.PCG64(17))
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    data = png_encode(px)
    # re-assemble: split the single IDAT payload into two chunks
    sig, off = data[:8], 8
    chunks = []
    while off < len(data):
        ln = struct.unpack_from(">I", data, off)[0]
        chunks.append((data[off + 4 : off + 8], data[off + 8 : off + 8 + ln]))
        off += 12 + ln
    out = sig
    for tag, payload in chunks:
        if tag == b"IDAT":
            mid = len(payload) // 2
            out += _png_chunk(b"IDAT", payload[:mid])
            out += _png_chunk(b"IDAT", payload[mid:])
        else:
            out += _png_chunk(tag, payload)
    assert (png_decode(out) == px).all()


def test_png_oracle_decoder_agrees_with_engine_decoder():
    """Independent pure-Python scalar decoder (oracle_ext, spec §9
    arithmetic) vs the numpy row-vector decoder — two implementations,
    one format, bit equality on RGB and RGBA."""
    from scrapy__ray.oracle_ext import _odecode_png
    from scrapy__ray.sources.media import png_decode, png_encode

    rng = np.random.Generator(np.random.PCG64(19))
    for c in (3, 4):
        px = rng.integers(0, 256, size=(11, 7, c), dtype=np.uint8)
        data = png_encode(px)
        eng = png_decode(data)
        orc = np.array(_odecode_png(data), dtype=np.uint8)
        assert (eng == orc).all(), c


def test_png_alpha_dropped_by_rgb_dispatch():
    from scrapy__ray.sources.media import image_decode_rgb, png_encode

    rng = np.random.Generator(np.random.PCG64(23))
    px = rng.integers(0, 256, size=(6, 6, 4), dtype=np.uint8)
    rgb = image_decode_rgb(png_encode(px))
    assert rgb.shape == (6, 6, 3)
    assert (rgb == px[:, :, :3]).all()


def test_png_ahash_dups_recover_planted_pairs(ray_session):
    """Same planted-near-dup gate as the BMP family, through the real
    zlib/filter decode path."""
    import pyarrow.parquet as pq

    from scrapy__ray.pipelines.mediaops import media_png_ahash_dups
    from scrapy__ray.sources.media import png_mirror

    got = media_png_ahash_dups(SF_DIR).to_pandas()
    assert (got["doc_a"] < got["doc_b"]).all()
    ids = set(
        pq.read_table(png_mirror(SF_DIR), columns=["doc_id"])["doc_id"].to_pylist()
    )
    planted = {(d - 1, d) for d in ids if d % 10 == 9 and (d - 1) in ids}
    found = set(zip(got["doc_a"], got["doc_b"]))
    assert planted, "fixture must plant pairs"
    recovered = len(planted & found) / len(planted)
    assert recovered >= 0.8, (recovered, len(planted))
