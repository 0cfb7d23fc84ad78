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


# -------------------------------------------------------- profile_drift

def _profile(spark, rows):
    from twitter_to_sqlite_spark.functions import sketch

    df = spark.createDataFrame(rows, "a long, b string")
    return sketch.kmv_distinct(df, ["a", "b"], k=64)


def test_profile_drift_stable_passes(spark):
    rows = [(i % 10, f"x{i % 3}") for i in range(50)]
    prof = _profile(spark, rows)
    rep = {r["check_name"]: r for r in
           V.profile_drift(prof, prof, rel_tol=0.1).collect()}
    assert all(r["passed"] for r in rep.values())
    assert all(r["rel_change"] == 0.0 for r in rep.values())


def test_profile_drift_planted_cardinality_jump_fails(spark):
    """A column whose distinct count doubles vs the stored baseline
    flips passed to false; the untouched column stays green."""
    base = _profile(spark, [(i % 10, f"x{i % 3}") for i in range(50)])
    cur = _profile(spark, [(i % 40, f"x{i % 3}") for i in range(80)])
    rep = {r["check_name"]: r for r in
           V.profile_drift(cur, base, rel_tol=0.25).collect()}
    assert not rep["drift(a)"]["passed"]          # 10 -> 40 distinct
    assert rep["drift(a)"]["rel_change"] >= 1.0
    assert rep["drift(b)"]["passed"]              # 3 -> 3 distinct


def test_profile_drift_schema_drift_fails(spark):
    """A column present only on one side (renamed/dropped) is schema
    drift: estimate 0 on the missing side blows any tolerance."""
    from twitter_to_sqlite_spark.functions import sketch

    base = _profile(spark, [(1, "x")])
    cur_df = spark.createDataFrame([(1, "x")], "a long, c string")
    cur = sketch.kmv_distinct(cur_df, ["a", "c"], k=64)
    rep = {r["check_name"]: r for r in
           V.profile_drift(cur, base, rel_tol=0.25).collect()}
    assert rep["drift(a)"]["passed"]
    assert not rep["drift(b)"]["passed"]   # dropped column
    assert not rep["drift(c)"]["passed"]   # new column


def test_profile_drift_schema_drift_fails_even_at_loose_tol(spark):
    """rel_tol >= 1.0 must not mask a dropped column (its rel_change
    is exactly 1.0): passed requires both sides present."""
    from twitter_to_sqlite_spark.functions import sketch

    base = _profile(spark, [(1, "x")])
    cur_df = spark.createDataFrame([(1, "x")], "a long, c string")
    cur = sketch.kmv_distinct(cur_df, ["a", "c"], k=64)
    rep = {r["check_name"]: r for r in
           V.profile_drift(cur, base, rel_tol=1.0).collect()}
    assert not rep["drift(b)"]["passed"]
    assert not rep["drift(c)"]["passed"]
    assert rep["drift(a)"]["passed"]


def test_combine_table_checks_matches_individual(spark):
    """The fused one-scan form publishes exactly the rows the
    individual checks would."""
    from twitter_to_sqlite_spark.functions import validate as V

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 3.0), (2, None)], "k long, v double")
    fused = {r["check_name"]: (r["violations"], r["passed"])
             for r in V.combine_table_checks(df, [
                 V.not_null_expr("k"),
                 V.accepted_range_expr("v", lo=0),
                 V.unique_expr(["k"]),
             ]).collect()}
    singles = {r["check_name"]: (r["violations"], r["passed"])
               for c in (V.not_null(df, "k"),
                         V.accepted_range(df, "v", lo=0),
                         V.unique(df, ["k"]))
               for r in c.collect()}
    assert fused == singles
    assert fused["not_null(k)"] == (1, False)
    assert fused["range(v)"] == (1, False)
    # 4 rows, 2 distinct non-null keys -> 2 beyond-first (NULL-keyed
    # row counts as a violation by the documented pk contract)
    assert fused["unique(k)"] == (2, False)


def test_combine_table_checks_empty_table_violates_nothing(spark):
    from twitter_to_sqlite_spark.functions import validate as V

    df = spark.createDataFrame([], "k long, v double")
    rows = V.combine_table_checks(df, [
        V.not_null_expr("k"), V.accepted_range_expr("v", lo=0),
    ]).collect()
    assert [(r["violations"], r["passed"]) for r in rows] == [
        (0, True), (0, True)]


def test_data_quality_scans_events_once(spark):
    """The fused gate reads events ONCE for its three aggregate
    checks (plus once as the fk child): at most 2 events scans in the
    whole report plan, and 7 report rows as before."""
    from twitter_to_sqlite_spark.plans import catalog

    df = catalog.QUERIES["data_quality"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    import re

    events_scans = len(re.findall(
        r"^\(\d+\) Scan parquet .*events", plan, flags=re.M))
    assert events_scans <= 2
    assert df.count() == 7
