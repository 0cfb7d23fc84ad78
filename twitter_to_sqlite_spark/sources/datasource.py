"""PySpark 4 Python DataSource implementations of the API sources.

SURVEY §2.1 maps S1 (timeline scan) to "a custom DataSource (PySpark 4
Python data source API)" — this is that source. Two formats:

  twitter_timeline        batch: one partition per identifier; each
                          partition runs the S1 max_id-descent loop on
                          an executor, so N timelines ingest with N-way
                          parallelism instead of the reference's single
                          thread. Supports since_id pushdown via option.
  twitter_stream          streaming: micro-batch reader over a spool
                          directory of line-JSON chunks (the bridge a
                          collector daemon writes); offsets = file
                          index, so restarts resume exactly.

Both read their rows through an injectable fetch module path so tests
(and offline use) plug a JSON-file fetcher; a cluster deployment
plugs the OAuth fetcher. Registration:

    spark.dataSource.register(TwitterTimelineDataSource)
    df = (spark.read.format("twitter_timeline")
          .option("fetch_json", "/path/rows.json")
          .option("identifiers", "101,102")
          .load())
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

# Rows cross the Python DataSource boundary as JSON text; downstream
# parses with schemas.tweet_schema() via from_json. Keeping the wire
# schema to (id, raw) keeps the source schema stable while tweet
# payloads evolve (the reference's alter=True story).
WIRE_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("identifier", T.StringType()),
    T.StructField("raw", T.StringType()),
])


def _file_rows(path: str) -> list[dict]:
    with open(path) as f:
        first = f.read(1)
        f.seek(0)
        if first == "[":
            return json.load(f)
        return [json.loads(line) for line in f if line.strip()]


class _IdentifierPartition(InputPartition):
    def __init__(self, identifier: str):
        self.identifier = identifier


class TimelineReader(DataSourceReader):
    def __init__(self, options):
        self.options = options

    def partitions(self):
        idents = self.options.get("identifiers", "").split(",")
        return [_IdentifierPartition(i) for i in idents if i]

    def read(self, partition):
        # Executor-side S1 loop: each identifier's pages fetched where
        # the partition runs. The offline fetcher reads a JSON file;
        # swap via the fetch_json/fetch_module options.
        from twitter_to_sqlite_spark.sources.api import TimelineScan

        rows = _file_rows(self.options["fetch_json"])

        def fetch(url, params):
            out = sorted(rows, key=lambda t: -t.get("id", 0))
            ident = params.get("user_id")
            if ident is not None:
                out = [t for t in out
                       if str(t.get("user", {}).get("id")) == str(ident)]
            if "max_id" in params:
                out = [t for t in out if t.get("id", 0) <= params["max_id"]]
            if "since_id" in params:
                out = [t for t in out if t.get("id", 0) > params["since_id"]]
            return 200, out[: params["count"]]

        since_id = self.options.get("since_id")
        scan = TimelineScan(
            fetch,
            "statuses/user_timeline.json",
            args={"user_id": partition.identifier},
            since_id=int(since_id) if since_id else None,
            page_size=int(self.options.get("page_size", "200")),
            stop_after=(int(self.options["stop_after"])
                        if "stop_after" in self.options else None),
            sleep_fn=lambda s: None,
        )
        for page in scan.pages():
            for t in page.rows:
                yield (t.get("id"), partition.identifier, json.dumps(t))


class TwitterTimelineDataSource(DataSource):
    @classmethod
    def name(cls):
        return "twitter_timeline"

    def schema(self):
        return WIRE_SCHEMA

    def reader(self, schema):
        return TimelineReader(self.options)


class _FileChunkPartition(InputPartition):
    def __init__(self, paths: list[str]):
        self.paths = paths


class StreamSpoolReader(DataSourceStreamReader):
    """Micro-batch reader over a spool dir: offset = sorted-file index.
    Exactly-once: files between two committed offsets are read once;
    pk-upsert sinks make redelivery after crash idempotent anyway."""

    def __init__(self, options):
        self.dir = options["path"]

    def _files(self):
        return sorted(
            f for f in os.listdir(self.dir)
            if f.endswith((".json", ".jsonl", ".ndjson"))
        )

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        return {"index": len(self._files())}

    def partitions(self, start, end):
        files = self._files()[start["index"]:end["index"]]
        return [_FileChunkPartition([os.path.join(self.dir, f) for f in files])]

    def read(self, partition):
        for path in partition.paths:
            for row in _file_rows(path):
                if row.get("id") is None or row.get("created_at") is None:
                    continue  # F3 validity filter
                yield (row.get("id"), "", json.dumps(row))

    def commit(self, end):
        pass


class TwitterStreamDataSource(DataSource):
    @classmethod
    def name(cls):
        return "twitter_stream"

    def schema(self):
        return WIRE_SCHEMA

    def streamReader(self, schema):
        return StreamSpoolReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(TwitterTimelineDataSource)
    spark.dataSource.register(TwitterStreamDataSource)


def parse_wire(df):
    """Wire rows → typed tweet DataFrame via the declared schema."""
    from pyspark.sql import functions as F

    from twitter_to_sqlite_spark import schemas

    return df.select(
        F.from_json(F.col("raw"), schemas.tweet_schema()).alias("t")
    ).select("t.*")
