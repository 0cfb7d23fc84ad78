"""Structured-Streaming capture tests (SURVEY §2.10): file-stream
source → track/follow filters → foreachBatch upsert with checkpoint,
including resume idempotence."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.streaming import capture


def minimal_tweet(tid, text, user_id=101, screen_name="robinex",
                  reply_to_user=None, retweet_of_user=None):
    t = {
        "id": tid,
        "id_str": str(tid),
        "created_at": "Mon Feb 03 10:20:30 +0000 2020",
        "text": text[:20],
        "extended_tweet": {"full_text": text} if len(text) > 20 else None,
        "full_text": None,
        "entities": {"hashtags": [], "symbols": [], "user_mentions": [], "urls": []},
        "source": '<a href="https://mobile.example.com">Example Mobile</a>',
        "in_reply_to_user_id": reply_to_user,
        "user": {"id": user_id, "id_str": str(user_id), "screen_name": screen_name,
                 "name": "U", "created_at": "Tue Nov 15 13:18:50 +0000 2016",
                 "entities": {"url": {"urls": []}, "description": {"urls": []}}},
        "retweet_count": 0,
        "favorite_count": 0,
    }
    if retweet_of_user:
        t["retweeted_status"] = {
            "id": tid * 10,
            "id_str": str(tid * 10),
            "created_at": "Sun Feb 02 09:00:00 +0000 2020",
            "full_text": "original " + text,
            "entities": {"hashtags": [], "symbols": [], "user_mentions": [], "urls": []},
            "source": '<a href="https://web.example.com">Example Web</a>',
            "user": {"id": retweet_of_user, "id_str": str(retweet_of_user),
                     "screen_name": "orig", "name": "O",
                     "created_at": "Wed Mar 01 08:00:00 +0000 2017",
                     "entities": {"url": {"urls": []}, "description": {"urls": []}}},
        }
    return t


def write_chunk(src_dir, name, tweets):
    with open(os.path.join(src_dir, name), "w") as f:
        for t in tweets:
            f.write(json.dumps(t) + "\n")


def run_until_done(q):
    q.awaitTermination(120)


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "stream_in"
    src.mkdir()
    return str(src), str(tmp_path / "tables"), str(tmp_path / "ckpt")


def test_capture_track_filter_and_upsert(spark, dirs):
    src, tables, ckpt = dirs
    write_chunk(src, "chunk1.json", [
        minimal_tweet(1, "endangered kakapo parrot spotted on the ridge today"),
        minimal_tweet(2, "completely unrelated message about trains"),
        {"limit": {"track": 5}},  # maintenance message: no id → dropped (F3)
    ])
    q = capture.start_capture(
        spark, src, tables, ckpt, phrases=["kakapo parrot"], available_now=True
    )
    run_until_done(q)
    got = spark.read.parquet(f"{tables}/tweets")
    ids = sorted(r["id"] for r in got.collect())
    assert ids == [1]
    # P7 fixup: extended_tweet.full_text won
    assert got.collect()[0]["full_text"].startswith("endangered kakapo")
    users = spark.read.parquet(f"{tables}/users").collect()
    assert [u["id"] for u in users] == [101]


def test_capture_follow_filter(spark, dirs):
    src, tables, ckpt = dirs
    write_chunk(src, "chunk1.json", [
        minimal_tweet(1, "by the followed user", user_id=555),
        minimal_tweet(2, "reply to followed", reply_to_user=555),
        minimal_tweet(3, "retweet of followed", retweet_of_user=555),
        minimal_tweet(4, "unrelated", user_id=9),
    ])
    q = capture.start_capture(
        spark, src, tables, ckpt, follow_ids=[555], available_now=True
    )
    run_until_done(q)
    ids = sorted(r["id"] for r in spark.read.parquet(f"{tables}/tweets").collect())
    # tweet 3's retweeted_status also lands as its own row (id 30)
    assert ids == [1, 2, 3, 30]


def test_capture_resume_is_idempotent(spark, dirs):
    src, tables, ckpt = dirs
    write_chunk(src, "chunk1.json", [minimal_tweet(1, "kakapo one")])
    q = capture.start_capture(spark, src, tables, ckpt,
                              phrases=["kakapo"], available_now=True)
    run_until_done(q)
    # second chunk, restart from checkpoint: old file not reprocessed,
    # new rows upserted by pk
    write_chunk(src, "chunk2.json", [
        minimal_tweet(1, "kakapo one updated"),
        minimal_tweet(5, "kakapo five"),
    ])
    q2 = capture.start_capture(spark, src, tables, ckpt,
                               phrases=["kakapo"], available_now=True)
    run_until_done(q2)
    rows = {r["id"]: r["full_text"] for r in
            spark.read.parquet(f"{tables}/tweets").collect()}
    assert sorted(rows) == [1, 5]
    assert rows[1] == "kakapo one updated"  # K1 last-write-wins across batches
