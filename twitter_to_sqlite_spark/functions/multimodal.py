"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side machinery — schema, partition sizing,
Arrow-batched mapInPandas, deterministic output contract — is real and
tested; the codec step itself (PIL/ffmpeg/librosa are not in this
container) is STUBBED behind `_decode_image_real`, which raises
NotImplementedError, with a deterministic fake used by default so the
pipeline is end-to-end testable.

Reference analogue: the media dimension (utils.py:442-446) stores
URLs + size metadata; here we carry the bytes themselves, which is
what a 100 TB multimodal training pipeline does (parquet binary
columns, ~100-200 MB row groups, metadata pushdown for filtering).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("kind", T.StringType(), False),       # image|audio|video
    T.StructField("mime", T.StringType(), True),
    T.StructField("payload", T.BinaryType(), True),      # opaque bytes
    T.StructField("meta", T.StructType([
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]), True),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), False),
    T.StructField("first_byte", T.IntegerType(), True),
    T.StructField("byte_checksum", T.LongType(), False),
])


def _decode_image_real(payload: bytes):
    """Real codec hook — wire PIL/libvips here on a cluster image.

    STUB: this container has no image libraries.
    """
    raise NotImplementedError("image codec not available in this environment")


def _fake_features(payload: bytes) -> tuple[int, int | None, int]:
    """Deterministic stand-in for decode: byte stats any engine can
    reproduce (length, first byte, additive checksum mod 2^31)."""
    if payload is None:
        return 0, None, 0
    return len(payload), (payload[0] if payload else None), sum(payload) % (2 ** 31)


def extract_features(media: DataFrame, use_real_codec: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps batches columnar end-to-end (Arrow in, Arrow
    out); on a cluster the same function body calls the real codec.
    Partition sizing note: binary rows are fat — repartition so each
    task holds ~128 MB of payload, not a fixed row count.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if use_real_codec:
                    _decode_image_real(payload)  # raises: stub
                n, first, chk = _fake_features(payload)
                feats.append((mid, n, first, chk))
            yield pd.DataFrame(
                feats, columns=["media_id", "n_bytes", "first_byte", "byte_checksum"]
            )

    from twitter_to_sqlite_spark.functions.dedup import spread

    narrow = spread(media.select("media_id", "payload"))
    return narrow.mapInPandas(run, FEATURE_SCHEMA)


def documents_as_media(docs: DataFrame,
                       duration_ms=None) -> DataFrame:
    """Adapter: treat document text bytes as opaque payloads so the
    multimodal plumbing is exercisable on the driver's testdata.
    ``duration_ms`` (an optional Column or int) fills the metadata
    duration — the field ``frame_sample_plan`` samples against."""
    if duration_ms is not None and not isinstance(duration_ms, Column):
        duration_ms = F.lit(duration_ms)
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            (duration_ms if duration_ms is not None
             else F.lit(None)).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame
    timestamp, derived from metadata — the decode of each frame is the
    stubbed codec step. Shows the explode-by-timestamp shape a real
    frame sampler uses (rows stay small; bytes only materialize inside
    the codec UDF)."""
    ts = F.sequence(
        F.lit(0),
        F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
        F.lit(every_ms),
    )
    return media.select(
        "media_id", F.explode(ts).alias("frame_ts_ms")
    )
