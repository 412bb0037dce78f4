"""Multimodal plumbing: Arrow-batched decode path, frame-sample plan."""

from __future__ import annotations

import pytest

from rgd_rnaseq_workflows_spark.multimodal.binary import (
    MEDIA_SCHEMA, decode_audio, frame_sample_plan, image_features)


def _media(spark):
    rows = [
        (1, "image", "image/png", bytearray(b"\x89PNG fake bytes"), {}),
        (2, "image", "image/png", bytearray(b"other fake image"), {}),
        (3, "video", "video/mp4", bytearray(b"vid"), {"n_frames": "95"}),
        (4, "audio", "audio/wav", bytearray(b"aud"), {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_shape_and_determinism(spark):
    feats = image_features(_media(spark).filter("kind = 'image'"))
    rows = {r["media_id"]: r for r in feats.collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["n_bytes"] == 15
    assert rows[1]["width"] >= 64 and rows[1]["height"] >= 64
    # deterministic fake decode: same bytes → same features on re-run
    again = {r["media_id"]: r for r in
             image_features(_media(spark).filter("kind = 'image'")).collect()}
    assert rows[1]["phash"] == again[1]["phash"]
    assert rows[1]["phash"] != rows[2]["phash"]


def _ppm(w, h, pixel_fn):
    """Binary P6 PPM with a comment line (header-parser exercise)."""
    body = bytearray()
    for y in range(h):
        for x in range(w):
            body += bytes(pixel_fn(x, y))
    return (f"P6\n# test image\n{w} {h}\n255\n".encode() + bytes(body))


def test_real_codec_swap_same_contract(spark):
    """The real-codec swap path (r2 VERDICT stretch): a genuine netpbm P6
    decoder + true 8×8 average-hash drops into the SAME mapInPandas
    kernel as the stub — only the codec argument changes."""
    from rgd_rnaseq_workflows_spark.multimodal.binary import ppm_codec

    half = _ppm(16, 16, lambda x, y: (0, 0, 0) if x < 8 else (255, 255, 255))
    grad = _ppm(10, 6, lambda x, y: (25 * x, 25 * x, 25 * x))
    rows = [(1, "image", "image/x-portable-pixmap", bytearray(half), {}),
            (2, "image", "image/x-portable-pixmap", bytearray(grad), {})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = {r["media_id"]: r
             for r in image_features(media, codec=ppm_codec).collect()}
    assert (feats[1]["width"], feats[1]["height"]) == (16, 16)
    assert (feats[2]["width"], feats[2]["height"]) == (10, 6)
    assert feats[1]["n_bytes"] == len(half)
    # half-black/half-white: aHash = right 4 columns set in every row
    row_bits = 0b11110000
    expect = sum(row_bits << (8 * r) for r in range(8))
    expect = expect - (1 << 64) if expect >= (1 << 63) else expect
    assert feats[1]["phash"] == expect
    # non-PPM bytes must fail loudly, not fake-decode
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ppm_codec(b"\x89PNG not a ppm")


def test_frame_sample_plan(spark):
    plan = frame_sample_plan(_media(spark), every_n=30).collect()
    got = sorted(r["frame_idx"] for r in plan)
    assert got == [0, 30, 60, 90]          # 95 frames sampled every 30
    assert all(r["media_id"] == 3 for r in plan)


def _wav(rate=8000, channels=1, bits=16, fmt=1, frames=None, extra_chunk=True):
    """Minimal RIFF/WAVE builder: sine-free deterministic ramps so rms and
    zero crossings are hand-computable."""
    import struct

    import numpy as np
    if frames is None:
        # alternating +/- full-scale square wave, 8 frames
        base = np.tile([0.5, -0.5], 4)
        frames = np.repeat(base[:, None], channels, axis=1)
    n = frames.shape[0]
    if fmt == 3:
        data = frames.astype("<f4").tobytes()
    elif bits == 8:
        data = (frames * 128 + 128).clip(0, 255).astype("u1").tobytes()
    elif bits == 32:
        data = (frames * 2147483648).clip(-2**31, 2**31 - 1) \
            .astype("<i4").tobytes()
    else:
        data = (frames * 32768).clip(-32768, 32767).astype("<i2").tobytes()
    fmt_body = struct.pack("<HHIIHH", fmt, channels, rate,
                           rate * channels * bits // 8,
                           channels * bits // 8, bits)
    chunks = b""
    if extra_chunk:                      # LIST chunk with odd size: the
        chunks += b"LIST" + (5).to_bytes(4, "little") + b"INFOx" + b"\x00"
    chunks += b"fmt " + len(fmt_body).to_bytes(4, "little") + fmt_body
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_wav_codec_formats():
    import numpy as np

    from rgd_rnaseq_workflows_spark.multimodal.binary import wav_codec
    for kwargs in [dict(), dict(bits=8), dict(bits=32),
                   dict(fmt=3, bits=32), dict(channels=2)]:
        rate, nch, n, rms, zc = wav_codec(_wav(**kwargs))
        assert (rate, n) == (8000, 8), kwargs
        assert nch == kwargs.get("channels", 1)
        # |x| = 0.5 everywhere -> rms 0.5 (8-bit quantizes near it)
        assert abs(rms - 0.5) < 0.01, kwargs
        assert zc == 7, kwargs           # sign alternates every frame

    # stereo: channel layout must deinterleave (ch0 constant positive ->
    # zero crossings 0 even though ch1 alternates)
    ch0 = np.full(8, 0.25)
    ch1 = np.tile([0.5, -0.5], 4)
    rate, nch, n, rms, zc = wav_codec(
        _wav(channels=2, frames=np.stack([ch0, ch1], axis=1)))
    assert (nch, n, zc) == (2, 8, 0)


def test_wav_codec_rejects_garbage():
    from rgd_rnaseq_workflows_spark.multimodal.binary import wav_codec
    with pytest.raises(ValueError):
        wav_codec(b"aud")
    with pytest.raises(ValueError):
        wav_codec(b"RIFF\x04\x00\x00\x00WAVE")      # no fmt/data


def test_audio_features_end_to_end(spark):
    from rgd_rnaseq_workflows_spark.multimodal.binary import audio_features
    rows = [
        (1, "audio", "audio/wav", bytearray(_wav()), {}),
        (2, "audio", "audio/wav", bytearray(_wav(rate=16000, channels=2)), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["media_id"]: r for r in decode_audio(media).collect()}
    assert out[1]["sample_rate"] == 8000 and out[1]["n_channels"] == 1
    assert out[1]["duration_ms"] == 1        # 8 frames / 8000 Hz
    assert out[2]["sample_rate"] == 16000 and out[2]["n_channels"] == 2
    assert abs(out[1]["rms"] - 0.5) < 0.01
    assert out[1]["zero_crossings"] == 7


def test_resize_images_plumbing(spark):
    import hashlib
    from rgd_rnaseq_workflows_spark.multimodal.binary import resize_images
    out = {r["media_id"]: r for r in
           resize_images(_media(spark).filter("kind = 'image'"),
                         width=224, height=224).collect()}
    assert set(out) == {1, 2}
    assert all(r["width"] == 224 and r["height"] == 224
               for r in out.values())
    # deterministic fake kernel: md5(source bytes + dims)
    src = {r["media_id"]: bytes(r["content"]) for r in
           _media(spark).filter("kind = 'image'").collect()}
    expect = hashlib.md5(src[1] + b":224x224").digest()
    assert bytes(out[1]["content"]) == expect
    assert bytes(out[1]["content"]) != bytes(out[2]["content"])


def test_phash_dedup_finds_planted_copies(spark):
    from pyspark.sql import functions as F
    from rgd_rnaseq_workflows_spark.multimodal.binary import image_features
    from rgd_rnaseq_workflows_spark.operators.dedup import hamming_near_pairs
    # 3 copies of image A, 2 of image B, 1 unique — expect C(3,2)+C(2,2)=4
    contents = [b"imgA", b"imgA", b"imgA", b"imgB", b"imgB", b"unique"]
    media = spark.createDataFrame(
        [(i, "image", "image/png", c, {}) for i, c in enumerate(contents)],
        "media_id long, kind string, mime string, content binary, "
        "meta map<string,string>")
    feats = image_features(media).select("media_id", "phash")
    pairs = hamming_near_pairs(feats, "phash", "media_id", bits=60,
                               max_hamming=6).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(0, 1), (0, 2), (1, 2), (3, 4)}
    assert all(r.hamming == 0 for r in pairs)
