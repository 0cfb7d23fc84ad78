"""Python DataSource API tests: the timeline source reads per-identifier
partitions executor-side; the stream source resumes by file-index offset."""

from __future__ import annotations

import json
import os

import pytest

from twitter_to_sqlite_spark.sources import datasource as DS


@pytest.fixture(scope="module")
def registered(spark):
    DS.register(spark)
    return spark


def fixture_rows():
    path = os.path.join(os.path.dirname(__file__), "fixtures", "tweets.json")
    return [json.loads(line) for line in open(path)]


def test_timeline_datasource_batch(registered, spark, tmp_path):
    src = tmp_path / "rows.json"
    src.write_text(json.dumps(fixture_rows()))
    df = (
        spark.read.format("twitter_timeline")
        .option("fetch_json", str(src))
        .option("identifiers", "101")
        .load()
    )
    rows = df.collect()
    assert sorted(r["id"] for r in rows) == [9001, 9002, 9003]
    assert all(r["identifier"] == "101" for r in rows)
    # typed parse through the declared schema
    typed = DS.parse_wire(df)
    got = {r["id"]: r["full_text"] for r in typed.collect()}
    assert got[9003] == "@tide_watch sampling the north shore today"


def test_timeline_datasource_since_id_pushdown(registered, spark, tmp_path):
    src = tmp_path / "rows.json"
    src.write_text(json.dumps(fixture_rows()))
    df = (
        spark.read.format("twitter_timeline")
        .option("fetch_json", str(src))
        .option("identifiers", "101")
        .option("since_id", "9001")
        .load()
    )
    assert sorted(r["id"] for r in df.collect()) == [9002, 9003]


def test_stream_datasource_microbatches(registered, spark, tmp_path):
    spool = tmp_path / "spool"
    spool.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def chunk(name, rows):
        with open(spool / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    chunk("000.jsonl", [
        {"id": 1, "created_at": "Mon Feb 03 10:20:30 +0000 2020", "full_text": "a"},
        {"limit": {"track": 3}},  # dropped by validity filter
    ])
    q = (
        spark.readStream.format("twitter_stream")
        .option("path", str(spool))
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert [r["id"] for r in spark.read.parquet(out_dir).collect()] == [1]

    # second chunk; restart resumes from committed offset
    chunk("001.jsonl", [
        {"id": 2, "created_at": "Mon Feb 03 11:00:00 +0000 2020", "full_text": "b"},
    ])
    q2 = (
        spark.readStream.format("twitter_stream")
        .option("path", str(spool))
        .load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination(120)
    assert sorted(r["id"] for r in spark.read.parquet(out_dir).collect()) == [1, 2]
