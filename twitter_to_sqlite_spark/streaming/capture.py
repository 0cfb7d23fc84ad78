"""Streaming capture (SURVEY §2.10, entry point 3: track/follow).

The reference holds a filtered HTTP stream open and upserts one tweet
per transaction (stream_filter utils.py:603-633; track cli.py:644-668;
follow cli.py:671-706). The Spark shape:

  readStream (line-JSON source) → validity filter (F3) → streaming
  fixup (P7) → track/follow predicates (T3) → foreachBatch: the SAME
  save_tweets pipeline as batch ingest, fanned out as keyed upserts.

The source here is a file-glob stream (each dropped file ≈ a chunk of
the HTTP line stream) — the production swap is a socket/Kafka bridge
feeding identical line-JSON; everything downstream is source-agnostic.
Checkpointing gives resume-on-crash (the reference's Ctrl-C story) and
pk-keyed upserts make redelivery idempotent — effectively exactly-once
on the keyed tables, matching the reference's INSERT OR REPLACE.

Scale: each micro-batch shuffles only its own rows; the upsert rewrite
is proportional to touched partitions (see sinks.write_upsert). For
windowed aggregation extensions, add withWatermark on created_ts.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from twitter_to_sqlite_spark import schemas
from twitter_to_sqlite_spark.operators import relational as R
from twitter_to_sqlite_spark.transforms import tweets as TT

# Live socket bridges started by read_tweet_stream, keyed by spool dir.
_BRIDGES: dict = {}


def active_bridge(spool_dir: str):
    """The SocketLineBridge read_tweet_stream started for this spool
    dir (None if the source was a plain directory)."""
    return _BRIDGES.get(spool_dir)


def read_tweet_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int | None = None,
                      spool_dir: str | None = None,
                      bridge_kwargs: dict | None = None) -> DataFrame:
    """S9 source: line-JSON tweet stream from a directory glob, a live
    ``tcp://host:port`` socket, or a long-poll ``http(s)://`` stream
    (the reference's actual transport), bridged through a spool
    directory (reference stream_filter's long-lived connection +
    reconnect loop, utils.py:603-633 — see streaming/bridge.py).

    Keeps only records with id + created_at — the reference drops
    maintenance messages the same way (F3, utils.py:624-632).

    For socket/http urls pass ``spool_dir``; the started bridge is
    exposed at ``active_bridge(spool_dir)`` so callers can stop it.
    """
    if path.startswith(("tcp://", "socket://", "http://", "https://")):
        from twitter_to_sqlite_spark.streaming.bridge import bridge_from_url

        if spool_dir is None:
            raise ValueError("socket/http sources need spool_dir=")
        bridge = bridge_from_url(path, spool_dir, **(bridge_kwargs or {}))
        bridge.start()
        _BRIDGES[spool_dir] = bridge
        path = spool_dir
    reader = spark.readStream.schema(schemas.streaming_tweet_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(path)
    return raw.filter(
        F.col("id").isNotNull() & F.col("created_at").isNotNull()
    )


def track_filter(df: DataFrame, phrases: list[str]) -> DataFrame:
    """T3 `track` semantics on the stream (terms AND within a phrase,
    OR across phrases) — evaluated over text/full_text."""
    with_text = df.withColumn(
        "__match_text",
        F.coalesce(F.col("extended_tweet.full_text"), F.col("full_text"), F.col("text")),
    )
    return R.keyword_track_filter(with_text, "__match_text", phrases).drop("__match_text")


def follow_filter(df: DataFrame, user_ids: list[int]) -> DataFrame:
    """`follow` semantics (utils.py:606-615): tweets by, replying to,
    or retweeting a followed user."""
    ids = [int(u) for u in user_ids]
    return df.filter(
        F.col("user.id").isin(ids)
        | F.col("in_reply_to_user_id").isin(ids)
        | F.col("retweeted_status.user.id").isin(ids)
    )


def location_filter(df: DataFrame, boxes: list[tuple[float, float, float, float]]) -> DataFrame:
    """`locations` bounding boxes (west,south,east,north) against the
    tweet place bounding box centroid."""
    coords = F.col("place.bounding_box.coordinates")[0]
    lon = F.aggregate(coords, F.lit(0.0), lambda a, p: a + p[0]) / F.size(coords)
    lat = F.aggregate(coords, F.lit(0.0), lambda a, p: a + p[1]) / F.size(coords)
    pred = F.lit(False)
    for west, south, east, north in boxes:
        pred = pred | (
            (lon >= west) & (lon <= east) & (lat >= south) & (lat <= north)
        )
    return df.filter(F.col("place").isNotNull() & pred)


def upsert_tables_batch(tables_root: str) -> Callable[[DataFrame, int], None]:
    """foreachBatch sink: normalize the micro-batch through the SAME
    save_tweet_batch pipeline as batch ingest (K1/K6 — per-batch
    atomicity replaces the reference's per-row transaction).

    Sharing the batch path matters for layout: tweets land in the same
    day-partitioned dataset the batch commands maintain, so streaming
    and batch writes into one tables_root never produce a mixed
    flat/partitioned layout."""
    from twitter_to_sqlite_spark.commands import save_tweet_batch
    from twitter_to_sqlite_spark.database import TweetDatabase

    def fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        spark = batch.sparkSession
        fixed = TT.fix_streaming_tweet(batch)
        db = TweetDatabase(spark, tables_root)
        save_tweet_batch(db, fixed, batch_id)

    return fn


def start_capture(spark: SparkSession, source_path: str, tables_root: str,
                  checkpoint_dir: str, phrases: list[str] | None = None,
                  follow_ids: list[int] | None = None,
                  available_now: bool = False,
                  spool_dir: str | None = None,
                  bridge_kwargs: dict | None = None):
    """Wire source → filters → foreachBatch upsert sink. Returns the
    StreamingQuery (caller awaits/stops). ``tcp://`` sources need
    ``spool_dir`` (see read_tweet_stream)."""
    stream = read_tweet_stream(spark, source_path, spool_dir=spool_dir,
                               bridge_kwargs=bridge_kwargs)
    if phrases:
        stream = track_filter(stream, phrases)
    if follow_ids:
        stream = follow_filter(stream, follow_ids)
    writer = (
        stream.writeStream.foreachBatch(upsert_tables_batch(tables_root))
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
