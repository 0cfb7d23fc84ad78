"""Migration tests (reference test_migrations.py shape: golden
before/after for convert_source_column; applied-once semantics)."""

from __future__ import annotations

import hashlib
import json

import pytest

from twitter_to_sqlite_spark import migrations as M
from twitter_to_sqlite_spark.database import TweetDatabase


@pytest.fixture()
def db(spark, tmp_path):
    return TweetDatabase(spark, str(tmp_path / "db"))


def _expected_hash(name, url):
    return hashlib.sha1(
        json.dumps({"name": name, "url": url}, separators=(",", ":")).encode()
    ).hexdigest()


def test_convert_source_column(spark, db):
    pre = _expected_hash("Already Done", "https://done.example.com")
    tweets = spark.createDataFrame(
        [
            (1, '<a href="https://old.example.com" rel="nofollow">Old Client</a>'),
            (2, '<a href="https://old.example.com" rel="nofollow">Old Client</a>'),
            (3, pre),  # already migrated: untouched
        ],
        "id long, source string",
    )
    db.overwrite("tweets", tweets)
    assert M.convert_source_column(db) == 2

    out = {r["id"]: r["source"] for r in db.read("tweets").collect()}
    expected = _expected_hash("Old Client", "https://old.example.com")
    assert out == {1: expected, 2: expected, 3: pre}
    sources = {r["id"]: (r["name"], r["url"]) for r in db.read("sources").collect()}
    assert sources == {expected: ("Old Client", "https://old.example.com")}
    # idempotent: second run rewrites nothing (F5 predicate empty)
    assert M.convert_source_column(db) == 0


def test_run_migrations_applied_once(spark, db):
    tweets = spark.createDataFrame(
        [(1, '<a href="https://x.example.com">X</a>')], "id long, source string"
    )
    db.overwrite("tweets", tweets)
    assert M.run_migrations(db) == ["convert_source_column"]
    assert M.run_migrations(db) == []
    assert not db.read("tweets").collect()[0]["source"].startswith("<")
