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


def _mini_catalog_events(spark, rows):
    import datetime as dt
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec),
          u, t, None, None)
         for i, (u, sec, t) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string")


def test_key_skew_detects_planted_hot_key(spark, tmp_path):
    import math
    from twitter_to_sqlite_spark.plans import catalog

    rows = [(1, s % 60, "a") for s in range(90)]      # hot user 1
    rows += [(u, u % 60, "a") for u in range(2, 12)]  # 10 cold users
    _mini_catalog_events(spark, rows).write.parquet(
        str(tmp_path / "events.parquet"))
    got = {r["key_col"]: r for r in catalog.q_key_skew(
        spark, str(tmp_path)).collect()}
    uid = got["user_id"]
    assert uid["n_keys"] == 11 and uid["max_freq"] == 90
    assert uid["imbalance"] == round(90 / (100 / 11), 4)
    # entropy: heavily skewed -> far below uniform ceiling
    assert uid["entropy"] < uid["entropy_uniform"] / 2
    probs = [90 / 100] + [1 / 100] * 10
    want_h = -sum(p * math.log(p) for p in probs)
    assert uid["entropy"] == round(want_h, 4)


def test_lateness_profile_counts_out_of_order(spark, tmp_path):
    from twitter_to_sqlite_spark.plans import catalog

    # user 1: arrival order 0..3 with event times 0s, 30s, 10s, 100s
    # -> the 10s event arrives 20s late; everything else on time
    rows = [(1, 0, "a"), (1, 30, "a"), (1, 10, "a"), (1, 100, "a")]
    # seconds above are event-time; arrival order is the row order
    _mini_catalog_events(spark, rows).write.parquet(
        str(tmp_path / "events.parquet"))
    r = catalog.q_lateness_profile(spark, str(tmp_path)).collect()[0]
    assert r["n_events"] == 4 and r["n_late"] == 1
    assert r["n_late_60s"] == 1 and r["n_late_1s"] == 0
    assert r["max_late_us"] == 20 * 1_000_000


def test_chi_square_independent_vs_dependent(spark, tmp_path):
    from twitter_to_sqlite_spark.plans import catalog

    # perfectly independent 2x2 table: chi2 == 0
    rows = []
    for u in range(40):
        rows.append((u, u % 60, "x" if u % 4 < 2 else "y"))
    _mini_catalog_events(spark, rows).write.parquet(
        str(tmp_path / "events.parquet"))
    r = catalog.q_chi_square(spark, str(tmp_path)).collect()[0]
    assert r["chi2"] == 0.0 and r["n_cells"] == 4


def test_chi_square_perfect_dependence(spark, tmp_path):
    from twitter_to_sqlite_spark.plans import catalog

    # event_type fully determined by user parity: chi2 == N
    rows = [(u, u % 60, "x" if u % 2 == 0 else "y") for u in range(40)]
    _mini_catalog_events(spark, rows).write.parquet(
        str(tmp_path / "events.parquet"))
    r = catalog.q_chi_square(spark, str(tmp_path)).collect()[0]
    # n_cells counts the FULL grid (2 types x 2 arms), zeros included
    assert r["chi2"] == 40.0 and r["n_cells"] == 4


def test_seasonal_naive_eval_planted(spark):
    """Hand-built month: hour 5 has exactly 2 events/day in train and
    on even test days only -> pred 2.0, actual_mean 1.0, MAE 1.0;
    hour 7 is unseen in train but appears once in test -> pred 0,
    actual_mean 0.1, MAE 0.1; every other hour is all-zero."""
    from datetime import datetime

    from twitter_to_sqlite_spark.functions import stats as S

    rows = []
    for d in range(1, 21):                     # train: days 1..20
        rows += [(datetime(2024, 1, d, 5, 0),), (datetime(2024, 1, d, 5, 30),)]
    for d in range(21, 31, 2):                 # test: 2 events on odd days
        rows += [(datetime(2024, 1, d, 5, 10),), (datetime(2024, 1, d, 5, 40),)]
    rows.append((datetime(2024, 1, 21, 7, 15),))
    df = spark.createDataFrame(rows, "ts timestamp")
    got = {r["hour"]: r for r in S.seasonal_naive_eval(df).collect()}
    assert len(got) == 24
    assert (got[5]["pred"], got[5]["actual_mean"], got[5]["mae"]) \
        == (2.0, 1.0, 1.0)
    assert (got[7]["pred"], got[7]["actual_mean"], got[7]["mae"]) \
        == (0.0, 0.1, 0.1)
    assert got[3]["pred"] == 0.0 and got[3]["mae"] == 0.0


def test_spearman_perfect_monotone_and_reversed(spark):
    # A strictly increasing mapping has rho = 1 regardless of shape;
    # reversing one side flips the sign exactly.
    rows = [(i, i * i) for i in range(1, 21)]
    df = spark.createDataFrame(rows, "x long, y long")
    r = stats.spearman_rho(df, "x", "y").collect()[0]
    assert (r["n"], r["nx"], r["ny"]) == (20, 20, 20)
    assert r["rho"] == 1.0
    rev = spark.createDataFrame(
        [(x, -y) for x, y in rows], "x long, y long")
    assert stats.spearman_rho(rev, "x", "y").collect()[0]["rho"] == -1.0


def test_spearman_ties_match_scipy_formula(spark):
    # Tie-averaged ranks: hand-check against the definitional Pearson-
    # over-ranks computation done in plain Python.
    xs = [1, 2, 2, 3, 3, 3, 4, 10]
    ys = [5, 5, 7, 7, 9, 9, 9, 1]

    def avg_ranks(vals):
        order = {}
        for v in sorted(set(vals)):
            lo = sum(1 for u in vals if u < v)
            n = vals.count(v)
            order[v] = lo + (n + 1) / 2
        return [order[v] for v in vals]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    cov = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    vx = sum((a - mx) ** 2 for a in rx)
    vy = sum((b - my) ** 2 for b in ry)
    expect = round(cov / math.sqrt(vx * vy), 6)

    df = spark.createDataFrame(list(zip(xs, ys)), "x long, y long")
    got = stats.spearman_rho(df, "x", "y").collect()[0]["rho"]
    assert got == pytest.approx(expect, abs=1e-6)


def test_spearman_constant_marginal_is_null(spark):
    df = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7)], "x long, y long")
    r = stats.spearman_rho(df, "x", "y").collect()[0]
    assert r["rho"] is None and r["ny"] == 1


def test_mutual_info_perfect_and_independent_bits(spark):
    # dim 0: sign == label (MI = ln 2); dim 1: constant sign (MI = 0).
    rows = []
    for i in range(40):
        label = i % 2
        rows.append(([1.0 if label else -1.0, 0.5], label))
    df = spark.createDataFrame(rows, "embedding array<float>, label int")
    out = {r["dim"]: r for r in
           stats.mutual_info_bits(df, n_dims=2).collect()}
    assert out[0]["n"] == 40 and out[1]["n"] == 40
    assert out[0]["mi"] == pytest.approx(math.log(2), abs=1e-6)
    assert out[1]["mi"] == pytest.approx(0.0, abs=1e-9)


def test_mutual_info_partial_dependence_formula(spark):
    # 3:1 alignment between bit and label — check against the
    # closed-form plug-in MI from the contingency table.
    rows = []
    for b, y, c in ((0, 0, 30), (1, 0, 10), (0, 1, 10), (1, 1, 30)):
        rows.extend(([1.0 if b else -1.0], y) for _ in range(c))
    df = spark.createDataFrame(rows, "embedding array<float>, label int")
    n = 80.0
    # cells: (b=0,y=0)=30, (b=1,y=0)=10, (b=0,y=1)=10, (b=1,y=1)=30
    expect = 0.0
    for nbl, b_tot, l_tot in ((30, 40, 40), (10, 40, 40),
                              (10, 40, 40), (30, 40, 40)):
        expect += (nbl / n) * math.log((nbl * n) / (b_tot * l_tot))
    got = stats.mutual_info_bits(df, n_dims=1).collect()[0]["mi"]
    assert got == pytest.approx(round(expect, 6), abs=1e-6)


def test_mad_outliers_resists_single_wild_value(spark):
    # 99 values near 10 plus one at 10^6: mean/σ would swallow
    # moderate outliers; median/MAD must flag exactly the wild one
    # and the deliberate moderate outlier at 60.
    rows = [("a", 10.0 + (i % 5) * 0.5) for i in range(98)]
    rows += [("a", 60.0), ("a", 1e6)]
    df = spark.createDataFrame(rows, "g string, v double")
    r = stats.mad_outliers(df, "g", "v", k=3.0).collect()[0]
    assert r["n"] == 100
    assert 10.0 <= r["median"] <= 12.0
    assert r["mad"] <= 1.0
    assert r["n_outliers"] == 2


def test_mad_outliers_exact_small_case(spark):
    # values 1..5: median 3 (rank ⌈5/2⌉=3), deviations {2,1,0,1,2}
    # → MAD = 1; with k=3 nothing exceeds 3·1.
    df = spark.createDataFrame(
        [("g", float(i)) for i in range(1, 6)], "g string, v double")
    r = stats.mad_outliers(df, "g", "v").collect()[0]
    assert (r["median"], r["mad"], r["n_outliers"]) == (3.0, 1.0, 0)


def test_embed_covariance_matches_numpy_and_is_psd(spark):
    import numpy as np

    rows = [([float(i % 3) - 1.0, 0.5 * ((i % 5) - 2), float(i % 2)],)
            for i in range(60)]
    df = spark.createDataFrame(rows, "embedding array<float>")
    out = stats.embed_covariance(df, n_dims=3).collect()
    assert len(out) == 6  # upper triangle of 3x3
    m = np.zeros((3, 3))
    for r in out:
        m[r["i"], r["j"]] = r["cov"]
        m[r["j"], r["i"]] = r["cov"]
    x = np.array([list(v[0]) for v in rows], dtype=np.float64)
    want = np.cov(x, rowvar=False, bias=True)  # population covariance
    assert np.allclose(m, want, atol=1e-6)
    # PSD up to rounding: eigenvalues of a covariance matrix
    assert np.linalg.eigvalsh(m).min() > -1e-9


def test_embed_covariance_excludes_short_vectors(spark):
    """Ragged-input contract (r7 ADVICE): vectors shorter than n_dims
    are excluded up front, so n counts exactly the rows whose products
    contribute — cov is unbiased and n reflects the population used."""
    from twitter_to_sqlite_spark.functions import stats

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, [5.0])],
        "vec_id long, embedding array<double>")
    rows = {(r["i"], r["j"]): r for r in
            stats.embed_covariance(df, n_dims=2).collect()}
    assert all(r["n"] == 2 for r in rows.values())   # short row excluded
    # population cov of x=[1,3], y=[2,4]: var(x)=1, cov(x,y)=1
    assert rows[(0, 0)]["cov"] == 1.0
    assert rows[(0, 1)]["cov"] == 1.0


def test_spearman_rho_decimal_factors_exact(spark):
    """The moment sums multiply DECIMAL(38,0) factors (r7 ADVICE: a
    LONG inner product wraps at scale). Perfect monotone data must
    give rho exactly 1.0 and anti-monotone -1.0."""
    from twitter_to_sqlite_spark.functions import stats

    up = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(1, 50)],
        "x double, y double")
    assert stats.spearman_rho(up, "x", "y").collect()[0]["rho"] == 1.0
    dn = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(1, 50)],
        "x double, y double")
    assert stats.spearman_rho(dn, "x", "y").collect()[0]["rho"] == -1.0
