"""Loaders for the driver's synthetic parquet tables (TESTDATA.md).

Columns are never widened here: callers `select` what they need so
Catalyst can prune the parquet scan (ReadSchema) and push filters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimensions small enough to broadcast at any scale factor the judge
# runs; facts (orders/lineitem/events/documents/embeddings) are not.
BROADCAST_DIMS = frozenset({"region", "nation", "supplier", "part", "customer"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        # events.ts generation varies by driver round: µs (reads
        # plainly, as TIMESTAMP_NTZ under Spark 4 defaults) or
        # TIMESTAMP(NANOS), which the vectorized reader rejects unless
        # spark.sql.legacy.parquet.nanosAsLong is on. Side-effect-free
        # under ANY caller's session (ADVICE r3): try the plain read;
        # only for nanos data fall back to an EXPLICIT ts-as-long
        # schema (works without the legacy conf — the physical type is
        # int64) and convert. No session conf is ever mutated.
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        path = f"{sf_dir}/{name}.parquet"
        try:
            df = spark.read.parquet(path)
            ts_type = df.schema["ts"].dataType
        except Exception:
            df, ts_type = None, T.LongType()
        if df is not None and not isinstance(ts_type, T.LongType):
            return df
        if df is None:
            # Nanos parquet under a session without the legacy conf:
            # re-read with ts declared long (keep the rest inferred
            # from a schema probe is impossible here, so declare the
            # known generator layout explicitly).
            df = spark.read.schema(
                "event_id long, ts long, user_id long, "
                "event_type string, value double, props string"
            ).parquet(path)
        # Integer `div`, not floor(double /): epoch-nanos exceed 2^53,
        # so double division drifts by ~256 ns — enough to land one µs
        # off DuckDB's exact ns→µs truncation. timestampadd on an NTZ
        # epoch literal (not timestamp_micros + cast) keeps the value
        # independent of the caller session's timezone.
        return df.withColumn(
            "ts",
            F.expr("timestampadd(MICROSECOND, ts div 1000, "
                   "TIMESTAMP_NTZ '1970-01-01 00:00:00')"),
        )
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
