"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested, and two REAL pure-numpy codecs prove the
plug-in path end-to-end: ``ppm_codec`` (netpbm P6 decode + true 8×8
average-hash) and ``wav_codec`` (RIFF/WAVE PCM/float decode + waveform
features). The default image codec stays the md5 stub because it is
SQL-expressible (the DuckDB oracle reproduces it); compressed formats
(JPEG, mp3/ogg, video) plug PIL/libvips/ffmpeg into the same kernels.

Design for 100 TB:
- binaries live in a `binary` column read via `spark.read.format("binaryFile")`
  or parquet with a BYTE_ARRAY column — never hex/base64 strings;
- decode/extract runs in `mapInPandas` (Arrow batches, bounded memory via
  `maxRecordsPerBatch`), so a 100-executor fan-out decodes embarrassingly
  parallel with zero shuffle;
- feature outputs are fixed-size arrays → columnar, prunable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),       # image | audio | video
    T.StructField("mime", T.StringType()),
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
])

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("phash", T.LongType()),
])


def read_binary_dir(spark: SparkSession, path: str,
                    glob: str = "*") -> DataFrame:
    """Directory of media files → (path, modificationTime, length, content)."""
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob).load(path))


def _fake_decode(content: bytes) -> tuple[int, int]:
    """Deterministic stand-in for an image decoder: derives a stable
    (width, height) from the content hash. REPLACE with a real decoder
    (PIL.Image.open) when the library is available."""
    h = hashlib.md5(content or b"").digest()
    return 64 + h[0] % 512, 64 + h[1] % 512


def _perceptual_hash(content: bytes) -> int:
    """Deterministic 60-bit content hash standing in for a perceptual hash
    (aHash/pHash need a decoder). Stable across engines and runs."""
    return int(hashlib.md5(content or b"").hexdigest()[:15], 16)


def stub_codec(content: bytes) -> tuple[int, int, int]:
    """Default codec: hash-derived dims + content hash (no pixel access).
    The oracle twin reproduces both md5 derivations."""
    w, h = _fake_decode(content)
    return w, h, _perceptual_hash(content)


def ppm_codec(content: bytes) -> tuple[int, int, int]:
    """REAL image codec for netpbm P6 (binary PPM), pure numpy: parses
    the header (whitespace/#-comment tolerant), reads the raw RGB plane,
    and computes a true 64-bit average-hash — 8×8 block-mean luma
    thresholded by its mean. Proves the swap-in path: same signature as
    ``stub_codec``, dropped into the same mapInPandas kernel; a PIL/
    libvips codec replaces the body, nothing else."""
    import numpy as np

    tokens, i = [], 0
    while len(tokens) < 4 and i < len(content):
        c = content[i:i + 1]
        if c == b"#":
            i = content.index(b"\n", i)
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < len(content) and not content[j:j + 1].isspace():
                j += 1
            tokens.append(content[i:j])
            i = j
    if not tokens or tokens[0] != b"P6":
        raise ValueError("not a P6 PPM")
    w, h, maxval = (int(t) for t in tokens[1:4])
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    px = np.frombuffer(content, dtype=np.uint8,
                       count=w * h * 3, offset=i + 1)
    luma = px.reshape(h, w, 3).astype(np.float64) @ (0.299, 0.587, 0.114)
    # 8×8 block means via integral image (any w/h, no resample lib);
    # bounds clamped to ≥1 pixel so dims < 8 degrade to nearest-pixel
    # sampling instead of empty blocks
    y0 = (np.arange(8) * h) // 8
    y1 = np.maximum(y0 + 1, (np.arange(1, 9) * h) // 8)
    x0 = (np.arange(8) * w) // 8
    x1 = np.maximum(x0 + 1, (np.arange(1, 9) * w) // 8)
    ii = np.zeros((h + 1, w + 1))
    ii[1:, 1:] = luma.cumsum(0).cumsum(1)
    blk = (ii[y1[:, None], x1[None, :]] - ii[y0[:, None], x1[None, :]]
           - ii[y1[:, None], x0[None, :]] + ii[y0[:, None], x0[None, :]])
    area = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    means = blk / area
    bits = (means > means.mean()).ravel()
    hv = int(bits @ (1 << np.arange(64, dtype=object)))
    return w, h, hv - (1 << 64) if hv >= (1 << 63) else hv


def image_features(media: DataFrame, batch_size: int | None = None,
                   codec=stub_codec) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    The UDF signature, output schema, and batch iteration are the
    production shape for any codec. ``codec(bytes) -> (w, h, phash)`` is
    the plug point: ``stub_codec`` (hash-derived, default — the oracle
    twin) or a real decoder like ``ppm_codec`` / PIL."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                w, h, phash = codec(raw)
                rows.append((mid, w, h, len(raw), phash))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "n_bytes", "phash"])

    return (media.select("media_id", "content")
            .mapInPandas(extract, IMAGE_FEATURES_SCHEMA))


RESIZED_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("content", T.BinaryType()),
])


def resize_images(media: DataFrame, width: int,
                  height: int) -> DataFrame:
    """Resize plumbing via mapInPandas: Arrow batches in, fixed target
    dims + resized bytes out. The pixel kernel is a deterministic fake
    (md5 of source bytes + dims → pseudo-content) — swap the body for
    PIL/libvips in production; schema, batch shape, and the
    embarrassingly-parallel zero-shuffle layout are the real contract."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                fake = hashlib.md5(
                    raw + f":{width}x{height}".encode()).digest()
                rows.append((mid, width, height, fake))
            yield pd.DataFrame(rows, columns=[
                "media_id", "width", "height", "content"])

    return (media.select("media_id", "content")
            .mapInPandas(kernel, RESIZED_SCHEMA))


def frame_sample_plan(media: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame-sampling plumbing: explodes a (media_id, frame_idx) plan
    per video from metadata frame counts — the decode of each sampled frame
    is the stubbed kernel. Partitioning: one task per media row group."""
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0))
    return (media
            .filter(F.col("kind") == "video")
            .select("media_id",
                    F.explode(
                        F.sequence(F.lit(0),
                                   F.greatest(n_frames - 1, F.lit(0)),
                                   F.lit(every_n))).alias("frame_idx")))


AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("duration_ms", T.LongType()),
    T.StructField("rms", T.DoubleType()),
    T.StructField("zero_crossings", T.LongType()),
])


def wav_codec(content: bytes) -> tuple[int, int, int, float, int]:
    """REAL audio codec for RIFF/WAVE, pure numpy — no audio library.

    Walks the chunk list (ids + little-endian sizes, even-padded), parses
    ``fmt `` (PCM uint8/int16/int32 and IEEE float32), decodes ``data``
    into normalized [-1, 1] samples, and measures the waveform:
    (sample_rate, n_channels, n_samples_per_channel, rms,
    zero_crossings of channel 0). Signature-compatible with the
    mapInPandas kernel the way ``ppm_codec`` is for images — an
    ffmpeg/soundfile codec for compressed formats replaces the body,
    nothing else.
    """
    import struct

    import numpy as np

    if len(content) < 12 or content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    fmt = data = None
    pos = 12
    while pos + 8 <= len(content):
        cid, size = content[pos:pos + 4], int.from_bytes(
            content[pos + 4:pos + 8], "little")
        body = content[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", body)
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)           # chunks are even-padded
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format, n_channels, sample_rate, _, _, bits = fmt
    if audio_format == 0xFFFE:                 # WAVE_FORMAT_EXTENSIBLE
        audio_format = 1
    dtypes = {(1, 8): (np.uint8, 128.0, 128.0),
              (1, 16): (np.int16, 0.0, 32768.0),
              (1, 32): (np.int32, 0.0, 2147483648.0),
              (3, 32): (np.float32, 0.0, 1.0)}
    if (audio_format, bits) not in dtypes:
        raise ValueError(f"unsupported WAV format {audio_format}/{bits}-bit")
    dtype, center, scale = dtypes[(audio_format, bits)]
    frame = n_channels * (bits // 8)
    n_frames = len(data) // frame
    raw = np.frombuffer(data, dtype=np.dtype(dtype).newbyteorder("<"),
                        count=n_frames * n_channels)
    x = (raw.astype(np.float64) - center) / scale
    x = x.reshape(n_frames, n_channels)
    rms = float(np.sqrt(np.mean(x * x))) if n_frames else 0.0
    ch0 = x[:, 0]
    zc = int(np.count_nonzero(np.signbit(ch0[1:]) != np.signbit(ch0[:-1])))
    return sample_rate, n_channels, n_frames, round(rms, 6), zc


def audio_features(media: DataFrame, codec=wav_codec) -> DataFrame:
    """Decode + feature-extract audio via mapInPandas — the same Arrow
    batch contract as :func:`image_features`, with :func:`wav_codec` (a
    real decoder) as the default plug-in."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                rate, nch, n, rms, zc = codec(raw)
                ms = (n * 1000) // rate if rate else 0
                rows.append((mid, rate, nch, n, ms, rms, zc))
            yield pd.DataFrame(rows, columns=[
                "media_id", "sample_rate", "n_channels", "n_samples",
                "duration_ms", "rms", "zero_crossings"])

    return (media.select("media_id", "content")
            .mapInPandas(extract, AUDIO_FEATURES_SCHEMA))


def decode_audio(media: DataFrame) -> DataFrame:
    """Back-compat alias: earlier rounds declared this a stub; the WAV
    path is now real — see :func:`audio_features` / :func:`wav_codec`.
    Compressed formats (mp3/ogg) still need ffmpeg/soundfile plugged into
    the same kernel."""
    return audio_features(media)
