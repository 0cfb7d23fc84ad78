"""Data-quality check semantics on tiny known inputs, plus the
broadcast shape of the referential check."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import validate as V


def test_not_null_counts_nulls(spark):
    df = spark.createDataFrame([(1,), (None,), (None,)], "v long")
    row = V.not_null(df, "v").collect()[0]
    assert (row["check_name"], row["violations"], row["passed"]) == (
        "not_null(v)", 2, False)


def test_unique_counts_extra_rows_per_key(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,)], "v long")
    row = V.unique(df, ["v"]).collect()[0]
    assert row["violations"] == 2 and not row["passed"]
    ok = spark.createDataFrame([(1,), (2,)], "v long")
    assert V.unique(ok, ["v"]).collect()[0]["passed"]


def test_accepted_range_bounds_and_null_tolerance(spark):
    df = spark.createDataFrame(
        [(-1.0,), (0.0,), (5.0,), (11.0,), (None,)], "v double")
    row = V.accepted_range(df, "v", lo=0, hi=10).collect()[0]
    assert row["violations"] == 2  # -1 and 11; NULL not a violation


def test_foreign_key_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (None,)], "k long")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "p long")
    row = V.foreign_key(child, "k", parent, "p").collect()[0]
    assert row["violations"] == 1 and not row["passed"]  # only 9; NULL exempt


def test_empty_table_violates_nothing(spark):
    df = spark.createDataFrame([], "v long")
    assert V.not_null(df, "v").collect()[0]["passed"]
    assert V.accepted_range(df, "v", lo=0).collect()[0]["passed"]


def test_run_checks_unions_reports(spark):
    df = spark.createDataFrame([(1,), (None,)], "v long")
    rep = V.run_checks([
        V.not_null(df, "v"),
        V.unique(df, ["v"]),
    ]).collect()
    assert [r["check_name"] for r in rep] == ["not_null(v)", "unique(v)"]


def test_foreign_key_broadcasts_small_parent(spark):
    child = spark.range(10000).select(F.col("id").alias("k"))
    parent = spark.range(100).select(F.col("id").alias("p"))
    plan = V.foreign_key(child, "k", parent, "p") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
