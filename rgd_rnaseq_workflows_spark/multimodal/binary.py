"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schema, partitioning, Arrow batch shape, UDF
signatures) is real and tested; the codec step itself is stubbed behind a
deterministic fake because image/audio libraries are not in this container
— swap `_decode_image_batch`'s body for PIL/libvips/ffmpeg in production.

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


def image_features(media: DataFrame,
                   batch_size: int | None = None) -> DataFrame:
    """Decode + feature-extract images via mapInPandas (Arrow batches).

    The UDF signature, output schema, and batch iteration are the
    production shape; only the pixel decode is a deterministic fake.
    """
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content) if content is not None else b""
                w, h = _fake_decode(raw)
                rows.append((mid, w, h, len(raw), _perceptual_hash(raw)))
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


def decode_audio(media: DataFrame) -> DataFrame:
    """Audio decode stub: the real implementation feeds ffmpeg/soundfile in
    mapInPandas. Raises to make the stub boundary explicit."""
    raise NotImplementedError(
        "audio codec not available in this environment; production build "
        "plugs soundfile/ffmpeg into the mapInPandas kernel (same shape as "
        "image_features)")
