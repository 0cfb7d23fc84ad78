"""KMV sketch laws: exact under k, bounded error over k, mergeable,
and scalable plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.functions import sketch

SF = "/root/testdata/sf0.01"


def test_kmv_exact_below_k(spark):
    """Cardinality below k → the k-min set holds every value and the
    estimate IS the exact distinct count."""
    df = spark.range(40).select((F.col("id") % 17).alias("v"))
    row = sketch.kmv_distinct(df, ["v"], k=64).collect()[0]
    assert row["col_name"] == "v"
    assert row["n_kept"] == 17 and row["kmv_estimate"] == 17


def test_kmv_error_bound_above_k(spark):
    """KMV standard error is ~1/sqrt(k−2); at k=64 over 1000 distinct
    values the estimate lands within 4 sigma (±50%) with overwhelming
    probability — and deterministically, given the fixed hash."""
    df = spark.range(5000).select((F.col("id") % 1000).alias("v"))
    row = sketch.kmv_distinct(df, ["v"], k=64).collect()[0]
    assert row["n_kept"] == 64
    assert 500 <= row["kmv_estimate"] <= 1500


def test_kmv_deterministic_and_insensitive_to_duplication(spark):
    """The sketch is a function of the VALUE SET: duplicating every
    row (or re-running) cannot change the estimate."""
    base = spark.range(3000).select((F.col("id") % 700).alias("v"))
    doubled = base.unionByName(base)
    e1 = sketch.kmv_distinct(base, ["v"], k=64).collect()[0]["kmv_estimate"]
    e2 = sketch.kmv_distinct(doubled, ["v"], k=64).collect()[0]["kmv_estimate"]
    e3 = sketch.kmv_distinct(base, ["v"], k=64).collect()[0]["kmv_estimate"]
    assert e1 == e2 == e3


def test_kmv_merge_equals_sketch_of_union(spark):
    """Mergeability: unioning two corpora and sketching equals
    sketching the unioned value set — the property that lets
    per-shard sketches combine without a second pass."""
    a = spark.range(0, 800).select(F.col("id").alias("v"))
    b = spark.range(400, 1200).select(F.col("id").alias("v"))
    merged = sketch.kmv_distinct(a.unionByName(b), ["v"], k=64).collect()[0]
    direct = sketch.kmv_distinct(
        spark.range(0, 1200).select(F.col("id").alias("v")), ["v"], k=64
    ).collect()[0]
    assert merged["kmv_estimate"] == direct["kmv_estimate"]


def test_kmv_topk_plan_no_full_sort(spark):
    """The k-min selection must compile to TakeOrderedAndProject (k
    rows per partition map-side), never a global Sort+Exchange of all
    hashes. One column-pruned scan per column is the DESIGNED shape
    (a fused explode was measured slower and reverted — r8 notes)."""
    e = tables.load_table(spark, SF, "events").select("user_id")
    df = sketch.kmv_distinct(e, ["user_id"], k=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ----------------------------------------------- weighted sample (A-ES)


def test_weighted_sample_exact_size_and_determinism(spark):
    from twitter_to_sqlite_spark.functions import sampling

    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).cast("double").alias("w"))
    s1 = sampling.weighted_sample(df, 50, "w", "k").collect()
    s2 = sampling.weighted_sample(df, 50, "w", "k").collect()
    assert len(s1) == 50
    assert sorted(r["k"] for r in s1) == sorted(r["k"] for r in s2)


def test_weighted_sample_key_monotone_in_weight(spark):
    """u^(1/w) grows with w for u in (0,1): the same row with a higher
    weight gets a higher sample key, hence >= inclusion chance."""
    from twitter_to_sqlite_spark.functions import sampling

    lo = spark.createDataFrame([(1, 0.2)], "k long, w double")
    hi = spark.createDataFrame([(1, 0.9)], "k long, w double")
    sk_lo = sampling.weighted_sample(lo, 1, "w", "k").collect()[0]["__sk"]
    sk_hi = sampling.weighted_sample(hi, 1, "w", "k").collect()[0]["__sk"]
    assert sk_hi > sk_lo


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from twitter_to_sqlite_spark.functions import sampling

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -1.0), (4, 0.5)], "k long, w double")
    got = sorted(r["k"] for r in
                 sampling.weighted_sample(df, 10, "w", "k").collect())
    assert got == [1, 4]


def test_weighted_sample_topk_plan(spark):
    from twitter_to_sqlite_spark.functions import sampling

    df = spark.range(1000).select(
        F.col("id").alias("k"), F.lit(1.0).alias("w"))
    plan = sampling.weighted_sample(df, 10, "w", "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# -------------------------------------------------------- kmv overlap


def test_kmv_overlap_exact_below_k(spark):
    """Below k the sketch holds every hash: jaccard/union/intersection
    are exact."""
    a = spark.range(0, 30).select(F.col("id").alias("v"))
    b = spark.range(20, 50).select(F.col("id").alias("v"))
    row = sketch.kmv_overlap(a, b, "v", "v", k=256).collect()[0]
    assert row["n_kept"] == 50 and row["n_both"] == 10
    assert row["jaccard_est"] == 0.2
    assert row["union_est"] == 50 and row["intersect_est"] == 10


def test_kmv_overlap_disjoint_and_identical(spark):
    a = spark.range(0, 40).select(F.col("id").alias("v"))
    b = spark.range(100, 140).select(F.col("id").alias("v"))
    d = sketch.kmv_overlap(a, b, "v", "v", k=64).collect()[0]
    assert d["n_both"] == 0 and d["jaccard_est"] == 0.0
    assert d["intersect_est"] == 0
    s = sketch.kmv_overlap(a, a, "v", "v", k=64).collect()[0]
    assert s["jaccard_est"] == 1.0 and s["intersect_est"] == s["union_est"]


def test_kmv_overlap_estimate_above_k(spark):
    """Above k: a ~50% overlap of 2000-vs-2000 keys estimates Jaccard
    within sketch error (stderr ≈ sqrt(J(1-J)/k) ≈ 0.06 at k=64; allow
    4 sigma)."""
    a = spark.range(0, 2000).select(F.col("id").alias("v"))
    b = spark.range(1000, 3000).select(F.col("id").alias("v"))
    row = sketch.kmv_overlap(a, b, "v", "v", k=64).collect()[0]
    true_j = 1000 / 3000
    assert abs(row["jaccard_est"] - true_j) < 0.25
    assert 1500 <= row["union_est"] <= 6000


def test_sample_quantiles_exact_below_k(spark):
    """n <= k: the sample IS the population, quantiles are exact
    order statistics (index floor(q*(n-1))+1 of the sorted values)."""
    df = spark.range(0, 101).select(
        F.col("id").alias("key"), (F.col("id") * 2.0).alias("val"))
    got = {r.q: (r.n_sample, r.est)
           for r in sketch.sample_quantiles(
               df, "val", "key", qs=(0.0, 0.25, 0.5, 1.0), k=1024
           ).collect()}
    assert got == {0.0: (101, 0.0), 0.25: (101, 50.0),
                   0.5: (101, 100.0), 1.0: (101, 200.0)}


def test_sample_quantiles_estimate_above_k(spark):
    """n >> k: estimates land within sampling error (rank stderr
    ~ sqrt(q(1-q)/k) ~ 0.016 at k=1024; allow 5 sigma) and are
    monotone in q."""
    df = spark.range(0, 50000).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("val"))
    rows = sorted(
        sketch.sample_quantiles(df, "val", "key", k=1024).collect(),
        key=lambda r: r.q)
    ests = [r.est for r in rows]
    assert ests == sorted(ests)
    for r in rows:
        assert abs(r.est / 50000 - r.q) < 0.08
    assert rows[0].n_sample == 1024


def test_sample_quantiles_partition_invariant(spark):
    """The bottom-k hash sample is a pure function of the key set:
    identical results under any partitioning."""
    df = spark.range(0, 5000).select(
        F.col("id").alias("key"), F.pmod("id", 37).cast("double").alias("val"))
    a = sketch.sample_quantiles(df, "val", "key", k=256).collect()
    b = sketch.sample_quantiles(df.repartition(17), "val", "key",
                                k=256).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sample_quantiles_empty(spark):
    df = spark.range(0).select(
        F.col("id").alias("key"), F.col("id").cast("double").alias("val"))
    assert sketch.sample_quantiles(df, "val", "key").count() == 0


def test_grouped_sample_quantiles_exact_below_k(spark):
    """Each group's sample is its whole population below k: per-group
    order statistics are exact and independent across groups."""
    rows = ([("a", i, float(i)) for i in range(11)]
            + [("b", 100 + i, float(10 * i)) for i in range(5)])
    df = spark.createDataFrame(rows, "g string, key long, val double")
    got = {(r.g, r.q): (r.n_sample, r.est)
           for r in sketch.grouped_sample_quantiles(
               df, "g", "val", "key", qs=(0.0, 0.5, 1.0), k=64
           ).collect()}
    assert got[("a", 0.0)] == (11, 0.0)
    assert got[("a", 0.5)] == (11, 5.0)
    assert got[("a", 1.0)] == (11, 10.0)
    assert got[("b", 0.5)] == (5, 20.0)
    assert got[("b", 1.0)] == (5, 40.0)


def test_grouped_sample_quantiles_caps_per_group(spark):
    """Above k the per-group sample is capped at k rows."""
    rows = [("g", i, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, key long, val double")
    out = sketch.grouped_sample_quantiles(df, "g", "val", "key",
                                          qs=(0.5,), k=32).collect()
    assert len(out) == 1 and out[0].n_sample == 32


# ----------------------------------------------------------- sample_topk

def _py_topk(values, k, top):
    """Python spec of sample_topk: bottom-k md5 domain sample, exact
    counts of sampled values, top by (count desc, value)."""
    import hashlib
    from collections import Counter

    def h(v):
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)

    dom = sorted(set(values), key=lambda v: (h(v), v))[:k]
    counts = Counter(v for v in values if v in set(dom))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    return [(v, n, i + 1) for i, (v, n) in enumerate(ranked)]


def test_sample_topk_matches_spec_and_counts_exact(spark):
    values = [f"k{i % 7}" for i in range(100)] + ["hot"] * 50
    df = spark.createDataFrame([(v,) for v in values], "props string")
    got = sorted((r.value, r.n_occ, r.rank)
                 for r in sketch.sample_topk(df, "props",
                                             k=64, top=5).collect())
    assert got == sorted(_py_topk(values, 64, 5))
    # domain ≤ k: the sample IS the domain, so the top entry is the
    # true heavy hitter with its exact count
    assert ("hot", 50, 1) in got


def test_sample_topk_merge_law(spark):
    """Shard samples union + re-truncate to k, exact counts add:
    sketch(A ∪ B) == combine(sketch parts of A, sketch parts of B).
    Verified via the Python spec on both sides; k < |domain| so the
    sample is a real subset."""
    import hashlib
    from collections import Counter

    a = [f"v{i % 30}" for i in range(60)]
    b = [f"v{(i * 7) % 45}" for i in range(90)]

    def h(v):
        return int(hashlib.md5(v.encode()).hexdigest()[:15], 16)

    k, top = 16, 8
    # shard-side state: bottom-k of the shard domain + exact counts
    def shard(values):
        dom = sorted(set(values), key=lambda v: (h(v), v))[:k]
        return dom, Counter(x for x in values if x in set(dom))

    dom_a, cnt_a = shard(a)
    dom_b, cnt_b = shard(b)
    merged_dom = sorted(set(dom_a) | set(dom_b),
                        key=lambda v: (h(v), v))[:k]
    # a value surviving the merged sample was sampled in EVERY shard
    # whose domain contains it (bottom-k is monotone), so shard counts
    # for it are exact and add
    merged = Counter()
    for v in merged_dom:
        merged[v] = cnt_a.get(v, 0) + cnt_b.get(v, 0)
    ranked = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:top]
    want = [(v, n, i + 1) for i, (v, n) in enumerate(ranked)]

    df = spark.createDataFrame([(v,) for v in a + b], "props string")
    got = sorted((r.value, r.n_occ, r.rank)
                 for r in sketch.sample_topk(df, "props",
                                             k=k, top=top).collect())
    assert got == sorted(want)


# ------------------------------------------------------ kmv_distinct_by

def test_kmv_by_exact_below_k(spark):
    rows = [(g, f"v{g}{i % (3 + g)}") for g in range(3)
            for i in range(40)]
    df = spark.createDataFrame(rows, "g int, v string")
    got = {r.g: (r.n_kept, r.kmv_estimate)
           for r in sketch.kmv_distinct_by(df, "g", "v", k=64).collect()}
    assert got == {0: (3, 3), 1: (4, 4), 2: (5, 5)}


def test_kmv_by_matches_global_per_group(spark):
    """Each group's grouped estimate equals the global sketch run on
    that group alone — the per-group window IS kmv_distinct applied
    groupwise."""
    rows = [(g, f"x{(i * 7 + g) % 200}") for g in range(2)
            for i in range(500)]
    df = spark.createDataFrame(rows, "g int, v string")
    grouped = {r.g: r.kmv_estimate
               for r in sketch.kmv_distinct_by(df, "g", "v",
                                               k=32).collect()}
    for g in (0, 1):
        solo = sketch.kmv_distinct(
            df.filter(F.col("g") == g), ["v"], k=32).collect()[0]
        assert grouped[g] == solo["kmv_estimate"]


# -------------------------------------------------- kmv_merge_distinct

def test_kmv_merge_distinct_equals_direct(spark):
    """Merging per-shard k-min sets == sketching the concatenated
    data, exactly — KMV mergeability, including above k where the
    estimator runs."""
    a = spark.createDataFrame(
        [(f"x{i}",) for i in range(300)], "v string")
    b = spark.createDataFrame(
        [(f"x{i}",) for i in range(150, 450)], "v string")
    merged = sketch.kmv_merge_distinct([a, b], ["v"], k=64).collect()[0]
    direct = sketch.kmv_distinct(a.unionByName(b), ["v"],
                                 k=64).collect()[0]
    assert (merged["n_kept"], merged["kmv_estimate"]) \
        == (direct["n_kept"], direct["kmv_estimate"])


def test_kmv_merge_distinct_exact_below_k(spark):
    a = spark.createDataFrame([("p",), ("q",)], "v string")
    b = spark.createDataFrame([("q",), ("r",)], "v string")
    row = sketch.kmv_merge_distinct([a, b], ["v"], k=64).collect()[0]
    assert row["kmv_estimate"] == 3


def test_join_size_estimate_exact_below_k(spark):
    """Domain smaller than k: the whole domain is sampled, so the
    'estimate' is exactly sum(cA*cB)."""
    from twitter_to_sqlite_spark.functions import sketch

    a = spark.createDataFrame(
        [(k,) for k in [1, 1, 1, 2, 2, 3]], "k long")
    b = spark.createDataFrame(
        [(k,) for k in [1, 2, 2, 2, 4]], "k long")
    r = sketch.join_size_estimate(a, b, "k", k=16).collect()[0]
    # true join size: key1 3*1 + key2 2*3 = 9 (keys 3,4 one-sided)
    assert r["est_join_rows"] == 9
    assert r["n_sampled"] == 4 and r["d_est"] == 4
    assert a.join(b, "k").count() == 9


def test_join_size_estimate_sampled_within_tolerance(spark):
    """Estimator path (domain >> k): planted uniform counts make the
    truth computable; the domain-sampled estimate must land within a
    loose relative band (it is deterministic given the hash, so this
    is a regression pin, not a flaky statistical test)."""
    from twitter_to_sqlite_spark.functions import sketch

    # 2000 keys, c(k) = 1 + (k % 3) on both sides
    rows = [(k,) for k in range(2000) for _ in range(1 + k % 3)]
    df = spark.createDataFrame(rows, "k long")
    r = sketch.join_size_estimate(df, df, "k", k=128).collect()[0]
    exact = sum((1 + k % 3) ** 2 for k in range(2000))
    assert r["n_sampled"] == 128
    assert abs(r["est_join_rows"] - exact) / exact < 0.35
    assert abs(r["d_est"] - 2000) / 2000 < 0.25


def test_join_size_estimate_disjoint_keys_is_zero(spark):
    from twitter_to_sqlite_spark.functions import sketch

    a = spark.createDataFrame([(k,) for k in range(10)], "k long")
    b = spark.createDataFrame([(k,) for k in range(100, 110)], "k long")
    r = sketch.join_size_estimate(a, b, "k", k=8).collect()[0]
    assert r["est_join_rows"] == 0


def test_kmv_per_column_equals_inline_reference(spark):
    """The shipped per-column kmv_distinct (one pruned scan per
    column — the DESIGNED shape; a fused (col,value)-explode form was
    tried, measured 1.7x slower, and reverted in r8, commit 7a7a573)
    must publish exactly what this inline orderBy+limit reference
    computes — same k-min sets, same estimates — including an
    all-NULL column (reports (col, 0, 0)) and a below-k column
    (exact count). Kept as the regression anchor for any future
    re-attempt at scan fusion."""
    rows = [(i % 7, f"v{i % 3}" if i % 5 else None, None)
            for i in range(40)]
    df = spark.createDataFrame(rows, "a long, b string, c string")
    k = 4
    fused = {r["col_name"]: (r["n_kept"], r["kmv_estimate"])
             for r in sketch.kmv_distinct(df, ["a", "b", "c"], k=k)
             .collect()}
    for c in ["a", "b", "c"]:
        vals = (df.select(F.col(c).cast("string").alias("__v"))
                .filter(F.col("__v").isNotNull()).distinct()
                .select(sketch._uniform_hash(F.col("__v")).alias("__u"))
                .orderBy("__u").limit(k).collect())
        n_kept = len(vals)
        if n_kept < k:
            est = n_kept
        else:
            est = round((k - 1) / max(v["__u"] for v in vals))
        assert fused[c] == (n_kept, est), c
    # caller's column order preserved on the bounded output
    got_order = [r["col_name"]
                 for r in sketch.kmv_distinct(df, ["c", "a", "b"], k=k)
                 .collect()]
    assert got_order == ["c", "a", "b"]


def test_kmv_merge_fused_equals_direct(spark):
    """Merge law at the fused form: the merged sketch of disjoint
    shards equals kmv_distinct of the concatenation, column for
    column."""
    rows = [(i, f"u{i % 11}") for i in range(60)]
    df = spark.createDataFrame(rows, "a long, b string")
    sh1, sh2 = df.filter("a % 2 = 0"), df.filter("a % 2 = 1")
    merged = sketch.kmv_merge_distinct([sh1, sh2], ["a", "b"], k=8)
    direct = sketch.kmv_distinct(df, ["a", "b"], k=8)
    assert sorted(map(tuple, merged.collect())) == \
        sorted(map(tuple, direct.collect()))
