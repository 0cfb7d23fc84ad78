"""Moment-based stats: correlation pairs and Welch A/B test."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import stats


def test_corr_linear_and_constant_and_nulls(spark):
    rows = [(float(i), 2.0 * i + 1, 5.0, float(i) if i < 8 else None)
            for i in range(10)]
    df = spark.createDataFrame(rows, "x double, y double, c double, p double")
    got = {(r["x_col"], r["y_col"]): r for r in stats.corr_pairs(
        df, [("x", "y"), ("x", "c"), ("x", "p")]).collect()}
    assert got[("x", "y")]["corr"] == 1.0
    assert got[("x", "y")]["n"] == 10
    # constant side -> zero variance -> NULL
    assert got[("x", "c")]["corr"] is None
    # pairwise null exclusion: only the 8 complete rows count
    assert got[("x", "p")]["n"] == 8
    assert got[("x", "p")]["corr"] == 1.0


def test_corr_matches_population_formula(spark):
    xs = [1.0, 2.0, 4.0, 8.0, 9.0]
    ys = [3.0, 1.0, 5.0, 2.0, 9.0]
    df = spark.createDataFrame(list(zip(xs, ys)), "x double, y double")
    got = stats.corr_pairs(df, [("x", "y")]).collect()[0]["corr"]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx, syy = sum(a * a for a in xs), sum(b * b for b in ys)
    want = (n * sxy - sx * sy) / math.sqrt(n * sxx - sx * sx) \
        / math.sqrt(n * syy - sy * sy)
    assert got == pytest.approx(want, abs=1e-4)


def test_ab_welch_planted_shift_is_significant(spark):
    rows = []
    for i in range(200):
        rows.append(("t", i, float(10 + (i % 7))))          # arm 0
        rows.append(("t", 1000 + i, float(30 + (i % 7))))   # arm 1 shifted
        rows.append(("u", i, 5.0 + (i % 3)))                # arm 0 only-ish
        rows.append(("u", 1000 + i, 5.0 + ((i + 1) % 3)))   # same dist
    df = spark.createDataFrame(rows, "g string, uid long, v double")
    got = {r["g"]: r for r in stats.ab_welch(
        df, "g", F.col("uid") >= 1000, "v").collect()}
    t = got["t"]
    assert t["n_0"] == t["n_1"] == 200
    assert t["significant"] and abs(t["z_score"]) > 10
    assert t["mean_1"] - t["mean_0"] == pytest.approx(20.0, abs=1e-6)
    assert not got["u"]["significant"]


def test_ab_welch_degenerate_arms(spark):
    df = spark.createDataFrame(
        [("g", 0, 1.0), ("g", 0, 2.0), ("g", 1, 3.0)],
        "g string, a int, v double")
    r = stats.ab_welch(df, "g", F.col("a"), "v").collect()[0]
    # one-sample arm: no z, never significant
    assert r["z_score"] is None and r["significant"] is False
    assert r["n_1"] == 1 and r["mean_1"] == 3.0


def test_describe_numeric_exact_profile(spark):
    df = spark.createDataFrame(
        [(1, 10.5), (2, None), (3, 10.5), (3, -2.25)],
        "a long, b double")
    got = {r["column"]: r for r in stats.describe_numeric(
        df, ["a", "b"]).collect()}
    a, b = got["a"], got["b"]
    assert (a["n_rows"], a["n_null"], a["n_distinct"]) == (4, 0, 3)
    assert (a["min_val"], a["max_val"], a["mean"]) == (1.0, 3.0, 2.25)
    assert (b["n_rows"], b["n_null"], b["n_distinct"]) == (4, 1, 2)
    assert b["mean"] == pytest.approx((10.5 + 10.5 - 2.25) / 3, abs=1e-4)


def test_describe_numeric_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "a long, b double")
    b = {r["column"]: r for r in stats.describe_numeric(
        df, ["b"]).collect()}["b"]
    assert b["n_null"] == 2 and b["n_distinct"] == 0
    assert b["min_val"] is None and b["mean"] is None


def test_grouped_trend_exact_line_and_degenerates(spark):
    rows = []
    for x in range(10):
        rows.append(("lin", float(x), 3.0 * x + 2))   # exact line
        rows.append(("flat", float(x), 7.0))          # constant y
    rows += [("one", 1.0, 5.0)]                        # n=1
    rows += [("constx", 4.0, 1.0), ("constx", 4.0, 9.0)]  # constant x
    df = spark.createDataFrame(rows, "g string, x double, y double")
    got = {r["g"]: r for r in stats.grouped_trend(
        df, "g", "x", "y").collect()}
    lin = got["lin"]
    assert (lin["slope"], lin["intercept"], lin["r2"]) == (3.0, 2.0, 1.0)
    flat = got["flat"]
    assert flat["slope"] == 0.0 and flat["intercept"] == 7.0
    assert flat["r2"] is None          # zero y-variance
    assert got["one"]["slope"] is None
    assert got["constx"]["slope"] is None
