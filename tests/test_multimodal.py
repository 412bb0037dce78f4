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


def test_audio_stub_is_explicit(spark):
    with pytest.raises(NotImplementedError):
        decode_audio(_media(spark))


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
