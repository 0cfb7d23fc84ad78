"""Unit tests for the r4 graph/ER/event-analytics operators:
interval_join, funnel, entity resolution, triangle counting."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import entity
from twitter_to_sqlite_spark.functions.graph import triangle_count
from twitter_to_sqlite_spark.operators import relational as R


def _ts(minute, second=0, micro=0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(
        minutes=minute, seconds=second, microseconds=micro
    )


# ------------------------------------------------------ interval_join

@pytest.fixture(scope="module")
def iv_frames(spark):
    left = spark.createDataFrame(
        [(i, _ts(m)) for i, m in enumerate([0, 5, 29, 30, 31, 59, 90])],
        "lid long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (100, _ts(0), _ts(30)),   # [00:00, 00:30)
            (200, _ts(30), _ts(60)),  # [00:30, 01:00)
            (300, _ts(55), _ts(55)),  # empty interval -> matches nothing
            (400, _ts(10), _ts(5)),   # end < start -> dropped, no
                                      # fabricated descending buckets
        ],
        "rid long, s timestamp_ntz, e timestamp_ntz",
    )
    return left, right


def test_interval_join_containment(iv_frames):
    left, right = iv_frames
    out = R.interval_join(left, right, "ts", "s", "e",
                          bucket_seconds=1800.0)
    got = sorted((r.lid, r.rid) for r in out.collect())
    # [0,30): minutes 0,5,29. [30,60): minutes 30,31,59. 90 matches none.
    assert got == [(0, 100), (1, 100), (2, 100), (3, 200), (4, 200),
                   (5, 200)]


def test_interval_join_small_buckets_agree(iv_frames):
    """Bucket width far below interval length: more explode, same
    answer."""
    left, right = iv_frames
    out = R.interval_join(left, right, "ts", "s", "e",
                          bucket_seconds=60.0)
    got = sorted((r.lid, r.rid) for r in out.collect())
    assert got == [(0, 100), (1, 100), (2, 100), (3, 200), (4, 200),
                   (5, 200)]


def test_interval_join_no_nested_loop(iv_frames):
    left, right = iv_frames
    out = R.interval_join(left, right, "ts", "s", "e")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_with_key(spark):
    left = spark.createDataFrame(
        [("u1", 1, _ts(5)), ("u2", 2, _ts(5))],
        "k string, lid long, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [("u1", 10, _ts(0), _ts(30))],
        "k string, rid long, s timestamp_ntz, e timestamp_ntz",
    )
    out = R.interval_join(left, right, "ts", "s", "e", keys=["k"])
    assert [(r.lid, r.rid) for r in out.collect()] == [(1, 10)]


# ------------------------------------------------------------- funnel

def _funnel_rows(spark, rows):
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp_ntz, event_type string"
    )
    out = R.funnel(df, "user_id", "ts", "event_type",
                   ["view", "click", "purchase"])
    return {r.step: (r.step_name, r.users) for r in out.collect()}

def test_funnel_ordered_completion(spark):
    got = _funnel_rows(spark, [
        ("a", _ts(1), "view"), ("a", _ts(2), "click"),
        ("a", _ts(3), "purchase"),
        # b clicks BEFORE viewing: the pre-view click must not count,
        # but the later one does.
        ("b", _ts(1), "click"), ("b", _ts(2), "view"),
        ("b", _ts(3), "click"),
        # c only views.
        ("c", _ts(9), "view"),
    ])
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_funnel_strictly_after(spark):
    """A click at EXACTLY the view's timestamp does not advance
    (strict >), matching the conditional-min oracle chain."""
    got = _funnel_rows(spark, [
        ("a", _ts(1), "view"), ("a", _ts(1), "click"),
        ("b", _ts(1), "view"), ("b", _ts(1, 0, 1), "click"),
    ])
    assert got == {1: ("view", 2), 2: ("click", 1), 3: ("purchase", 0)}


def test_funnel_takes_earliest_view(spark):
    """Stage 1 anchors at the MIN view even when later views exist —
    a click between two views counts."""
    got = _funnel_rows(spark, [
        ("a", _ts(1), "view"), ("a", _ts(2), "click"),
        ("a", _ts(3), "view"),
    ])
    assert got == {1: ("view", 1), 2: ("click", 1), 3: ("purchase", 0)}


def test_funnel_empty_and_null_users(spark):
    got = _funnel_rows(spark, [
        (None, _ts(1), "view"), ("a", _ts(1), "error"),
    ])
    assert got == {1: ("view", 0), 2: ("click", 0), 3: ("purchase", 0)}


# -------------------------------------------------- entity resolution

@pytest.fixture(scope="module")
def names_df(spark):
    rows = (
        [("red widget",)] * 3
        + [("red widgets",)] * 2
        + [("blue widget",), ("blue bolt",), ("red bolt",),
           ("chartreuse gasket",)]
    )
    return spark.createDataFrame(rows, "p_name string")


def _blocks():
    return [
        F.regexp_extract("name", r"^(\S+)", 1),
        F.regexp_extract("name", r"(\S+)$", 1),
    ]


def test_match_names_dictionary_counts(names_df):
    out = entity.match_names(names_df, "p_name", _blocks(),
                             max_distance=2).collect()
    pairs = {(r.name1, r.name2): (r.n1, r.n2, r.dist) for r in out}
    # "red widget" ~ "red widgets": dist 1, counts 3 and 2.
    assert pairs[("red widget", "red widgets")] == (3, 2, 1)
    # distance > 2 excluded: red widget vs blue widget is 3 edits.
    assert ("blue widget", "red widget") not in pairs


def test_match_names_multi_pass_recall(names_df):
    """'blue bolt' ~ 'red bolt' share only the LAST token — pass 2
    finds them (dist 4); 'blue widget' ~ 'red widget' likewise
    (dist 3)."""
    out = entity.match_names(names_df, "p_name", _blocks(),
                             max_distance=4).collect()
    pairs = {(r.name1, r.name2) for r in out}
    assert ("blue bolt", "red bolt") in pairs
    assert ("blue widget", "red widget") in pairs


def test_match_names_max_block_drops_hot_keys(names_df):
    """max_block=1 drops every shared blocking key, so nothing pairs."""
    out = entity.match_names(names_df, "p_name", _blocks(),
                             max_distance=3, max_block=1)
    assert out.count() == 0


def test_blocked_pairs_dedups_across_passes(names_df):
    """red widget / red widgets share BOTH blocks; one candidate."""
    d = entity.name_dictionary(names_df, "p_name")
    cand = entity.blocked_pairs(d, _blocks())
    n = cand.filter(
        (F.col("name1") == "red widget") & (F.col("name2") == "red widgets")
    ).count()
    assert n == 1


def test_cluster_entities_planted_misspellings(spark):
    """Planted misspelling clusters resolve to one entity id each —
    including TRANSITIVE chains no single pair covers (acme corp ~
    acme corp. ~ acme corpx may pairwise exceed the distance between
    the extremes), while unrelated names stay singletons."""
    rows = (
        [("acme corp",)] * 4 + [("acme corp.",)] * 2 + [("acme corpxx",)]
        + [("zenith ltd",)] * 3 + [("zenith ltd.",)]
        + [("unrelated gasket",)]
    )
    df = spark.createDataFrame(rows, "p_name string")
    out = entity.cluster_entities(df, "p_name", _blocks(),
                                  max_distance=2).collect()
    ent = {r.name: r.entity_id for r in out}
    n_rec = {r.name: r.n_records for r in out}
    # every dictionary name appears exactly once
    assert len(out) == 6
    # acme cluster: corp ~ corp. (1 edit) and corp. ~ corpxx (2 edits)
    # chain transitively even though corp ~ corpxx is 3 edits > max.
    assert ent["acme corp"] == ent["acme corp."] == ent["acme corpxx"] \
        == "acme corp"
    assert ent["zenith ltd"] == ent["zenith ltd."] == "zenith ltd"
    # singleton keeps itself
    assert ent["unrelated gasket"] == "unrelated gasket"
    # record counts survive the labeling join
    assert n_rec["acme corp"] == 4 and n_rec["zenith ltd"] == 3


def test_cluster_entities_no_pairs_all_singletons(spark):
    df = spark.createDataFrame(
        [("alpha one",), ("beta two",), ("gamma three",)],
        "p_name string")
    out = entity.cluster_entities(df, "p_name", _blocks(),
                                  max_distance=1).collect()
    assert all(r.entity_id == r.name for r in out)
    assert len(out) == 3


# ---------------------------------------------------- windowed funnel

def test_funnel_windowed_gap_constraint(spark):
    """A step landing beyond the window does not advance — and does
    not reset: a later in-window event of the same step can't rescue
    it either, matching the conditional-min chain's empty-set
    semantics."""
    rows = [
        # a: click 10 min after view (inside 15-min window) -> stage 2
        ("a", _ts(0), "view"), ("a", _ts(10), "click"),
        # b: first click 20 min after view (outside); the window is
        # anchored at the min view, so b never reaches stage 2.
        ("b", _ts(0), "view"), ("b", _ts(20), "click"),
        # c: purchase within window of click -> full funnel
        ("c", _ts(0), "view"), ("c", _ts(5), "click"),
        ("c", _ts(15), "purchase"),
        # d: purchase 30 min after click (outside) -> stage 2 only
        ("d", _ts(0), "view"), ("d", _ts(5), "click"),
        ("d", _ts(40), "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp_ntz, event_type string")
    out = R.funnel(df, "user_id", "ts", "event_type",
                   ["view", "click", "purchase"],
                   within_seconds=900.0)
    got = {r.step: r.users for r in out.collect()}
    assert got == {1: 4, 2: 3, 3: 1}
    # sanity: without the window everyone converts as far as they go
    plain = {r.step: r.users
             for r in R.funnel(df, "user_id", "ts", "event_type",
                               ["view", "click", "purchase"]).collect()}
    assert plain == {1: 4, 2: 4, 3: 2}


# ----------------------------------------------------- triangle_count

def _tri(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return triangle_count(df).collect()[0]


def test_triangle_k4(spark):
    """K4: 4 nodes, 6 edges, C(4,3)=4 triangles, clustering 1."""
    edges = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tri(spark, edges)
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (4, 6, 4)
    assert r.clustering == 1.0


def test_triangle_path_none(spark):
    r = _tri(spark, [(1, 2), (2, 3), (3, 4)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 3, 2, 0)
    assert r.clustering == 0.0


def test_triangle_dedup_and_direction_invariance(spark):
    """Duplicate and reversed edges collapse: one triangle."""
    r = _tri(spark, [(1, 2), (2, 1), (2, 3), (3, 1), (1, 3), (1, 3)])
    assert (r.n_edges, r.n_triangles) == (3, 1)


def test_triangle_star_skew(spark):
    """A hub with 10 leaves: 45 wedges at the hub but zero triangles —
    and the oriented plan pivots at leaves (out-degree ≤ 1), so wedge
    candidates stay tiny under skew."""
    r = _tri(spark, [(0, i) for i in range(1, 11)])
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (11, 10, 45, 0)


# ------------------------------------------------------ resample_fill

def test_resample_fill_semantics(spark):
    """Gaps zero-filled, LOCF level carries, leading level null,
    bucket ids exact at bin boundaries (integer div, no float floor)."""
    rows = [
        ("a", _ts(0), 1.0),          # bin 0 (30-min bins)
        ("a", _ts(0, 1), 2.0),       # bin 0
        ("a", _ts(90), 5.0),         # bin 3 — bins 1,2 are gaps
        ("b", _ts(30), 7.0),         # bin 1 exactly on the boundary
    ]
    df = spark.createDataFrame(
        rows, "user_id string, ts timestamp_ntz, value double")
    out = R.resample_fill(df, "user_id", "ts", "value",
                          step_seconds=1800.0)
    got = {(r.user_id, r.bucket_us): (r.n_events, r.v_sum, r.level)
           for r in out.collect()}
    us = 1_800_000_000
    base = 1704067200000000  # 2024-01-01T00:00Z epoch micros
    assert len(got) == 8     # 2 keys x bins 0..3
    assert got[("a", base + 0 * us)] == (2, 3.0, 3.0)
    assert got[("a", base + 1 * us)] == (0, 0.0, 3.0)   # gap: LOCF
    assert got[("a", base + 2 * us)] == (0, 0.0, 3.0)
    assert got[("a", base + 3 * us)] == (1, 5.0, 5.0)
    assert got[("b", base + 0 * us)] == (0, 0.0, None)  # pre-first
    assert got[("b", base + 1 * us)] == (1, 7.0, 7.0)   # boundary bin
    assert got[("b", base + 2 * us)] == (0, 0.0, 7.0)


# ----------------------------------------------------- funnel_latency

def test_funnel_latency_catalog_semantics(spark, sf_dir):
    """The catalog's latency automaton agrees with a direct relational
    computation of the step-to-step latencies on real data."""
    from twitter_to_sqlite_spark.plans import catalog

    got = {(r.from_step, r.to_step): (r.n_users, r.min_s, r.max_s,
                                      r.avg_s)
           for r in catalog.QUERIES["funnel_latency"](
               spark, sf_dir).collect()}
    # Relational recomputation via three conditional-min aggregations.
    e = catalog._t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        " cast(ts as timestamp_ntz))")
    ev = e.withColumn("us", us)
    s1 = (ev.filter("event_type = 'view'")
          .groupBy("user_id").agg(F.min("us").alias("t1")))
    s2 = (ev.filter("event_type = 'click'").join(s1, "user_id")
          .filter(F.col("us") > F.col("t1"))
          .groupBy("user_id").agg(F.min("us").alias("t2"),
                                  F.first("t1").alias("t1")))
    lat1 = [r.t2 - r.t1 for r in s2.collect()]
    if lat1:
        n, mn, mx, avg = got[("view", "click")]
        assert n == len(lat1)
        assert mn == round(min(lat1) / 1e6, 4)
        assert mx == round(max(lat1) / 1e6, 4)
        assert avg == round(sum(lat1) / len(lat1) / 1e6, 4)


# ------------------------------------------------------- scd2_history

def test_scd2_history_intervals(spark):
    """Consecutive identical snapshots collapse; each change opens a
    new interval closing the previous; last interval is current;
    null-safe: NULL->x and x->NULL are changes, NULL->NULL is not."""
    rows = [
        ("u1", 1, _ts(0), "bronze"),
        ("u1", 2, _ts(10), "bronze"),   # no change — collapsed
        ("u1", 3, _ts(20), "gold"),     # change
        ("u1", 4, _ts(30), None),       # change to NULL
        ("u1", 5, _ts(40), None),       # NULL -> NULL: no change
        ("u2", 6, _ts(5), "silver"),
        (None, 7, _ts(0), "x"),         # null key excluded
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp_ntz, "
              "tier string")
    out = R.scd2_history(df, ["user_id"], "event_id", "ts", ["tier"])
    got = sorted(
        ((r.user_id, r.tier, r.valid_from_us, r.valid_to_us,
          r.is_current) for r in out.collect()),
        key=lambda t: (t[0], t[2]),
    )
    base = 1704067200000000
    m = 60_000_000
    assert got == [
        ("u1", "bronze", base, base + 20 * m, False),
        ("u1", "gold", base + 20 * m, base + 30 * m, False),
        ("u1", None, base + 30 * m, None, True),
        ("u2", "silver", base + 5 * m, None, True),
    ]


def test_scd2_history_multi_attr_change(spark):
    """Any one attribute changing opens a new interval."""
    rows = [
        ("u", 1, _ts(0), "a", 1), ("u", 2, _ts(1), "a", 2),
        ("u", 3, _ts(2), "a", 2),
    ]
    df = spark.createDataFrame(
        rows, "k string, event_id long, ts timestamp_ntz, "
              "x string, y long")
    out = R.scd2_history(df, ["k"], "event_id", "ts", ["x", "y"])
    assert out.count() == 2


def test_scd2_single_shuffle(spark):
    """Both windows share the key partitioning: exactly one exchange."""
    df = spark.createDataFrame(
        [("u", 1, _ts(0), "a")],
        "k string, event_id long, ts timestamp_ntz, x string")
    plan = R.scd2_history(df, ["k"], "event_id", "ts", ["x"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --------------------------------------------------------------- ewma

def test_ewma_recurrence(spark):
    """The fold equals the hand-computed recurrence; window truncation
    only matters past W rows; NULLs excluded."""
    rows = [("u", i, float(v)) for i, v in enumerate([10, 20, 30])]
    df = spark.createDataFrame(rows, "k string, o long, value double")
    out = {r.o: r.ewma
           for r in R.ewma(df, "k", "o", "value",
                           alpha=0.5, window=16).collect()}
    # s0 = .5*10 = 5; s1 = .5*5? no: fold over [10,20]: ((0*.5+.5*10)*.5+.5*20)=12.5
    assert out == {0: 5.0, 1: 12.5, 2: 21.25}


def test_ewma_truncation_window(spark):
    """W=2: each row's fold sees only the trailing 2 values."""
    rows = [("u", i, 100.0 if i == 0 else 0.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, o long, value double")
    out = {r.o: r.ewma
           for r in R.ewma(df, "k", "o", "value",
                           alpha=0.5, window=2).collect()}
    # row 2 and beyond no longer see the spike at all
    assert out[0] == 50.0 and out[1] == 25.0
    assert out[2] == 0.0 and out[3] == 0.0


def test_ewma_single_shuffle(spark):
    df = spark.createDataFrame([("u", 1, 1.0)],
                               "k string, o long, value double")
    plan = R.ewma(df, "k", "o", "value") \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# -------------------------------------------------------- salted_join

def test_salted_join_equals_plain_join_under_skew(spark):
    """One hot key dominating the fact side: the salted join returns
    exactly the plain join's multiset (each fact row meets each
    matching dim row once, on its own salt)."""
    fact = spark.createDataFrame(
        [(1 if i % 10 else 2, i) for i in range(500)], "k long, fid long")
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (3, "unmatched")], "k long, label string")
    got = sorted((r.fid, r.label)
                 for r in R.salted_join(fact, dim, "k",
                                        n_salt=8).collect())
    want = sorted((r.fid, r.label)
                  for r in fact.join(dim, "k").collect())
    assert got == want and len(got) == 500


def test_salted_join_spreads_key_over_salts(spark):
    """The physical join key is (k, __salt): the dim side explodes
    n_salt ways so a single hot key occupies n_salt hash groups."""
    fact = spark.createDataFrame([(1, 1)], "k long, fid long")
    dim = spark.createDataFrame([(1, "x")], "k long, label string")
    out = R.salted_join(fact, dim, "k", n_salt=8)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "__salt" in plan


# -------------------------------------------------- weighted_sample_by

def test_weighted_sample_by_exact_size_per_group(spark):
    from twitter_to_sqlite_spark.functions import sampling

    rows = ([("a", f"k{i}", 1.0) for i in range(50)]
            + [("b", f"j{i}", 2.0) for i in range(3)])
    df = spark.createDataFrame(rows, "g string, key string, w double")
    out = sampling.weighted_sample_by(df, "g", 5, "w", "key")
    sizes = {r.g: r.n for r in
             out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert sizes == {"a": 5, "b": 3}  # min(k, |group|)


def test_weighted_sample_by_matches_global_per_group(spark):
    """Each group's grouped sample equals weighted_sample run on that
    group alone — the window IS the global draw applied groupwise."""
    from twitter_to_sqlite_spark.functions import sampling

    rows = [(f"g{i % 3}", f"k{i}", float(1 + i % 7)) for i in range(90)]
    df = spark.createDataFrame(rows, "g string, key string, w double")
    grouped = sampling.weighted_sample_by(df, "g", 4, "w", "key")
    for g in ("g0", "g1", "g2"):
        solo = {r.key for r in sampling.weighted_sample(
            df.filter(F.col("g") == g), 4, "w", "key").collect()}
        got = {r.key for r in
               grouped.filter(F.col("g") == g).collect()}
        assert got == solo


# ---------------------------------------------------- trailing_zscore

def test_trailing_zscore_flags_spike_leakage_free(spark):
    """A spike after a stable history gets a huge z-score; the frame
    excludes the current row, so the spike can't suppress its own
    score; rows without min_points history stay NULL/unflagged."""
    vals = [10.0, 10.2, 9.8, 10.1, 9.9, 10.0, 10.2, 9.8, 10.1, 100.0]
    rows = [("u", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k string, o long, value double")
    out = {r.o: (r.zscore, r.is_anomaly)
           for r in R.trailing_zscore(df, "k", "o", "value",
                                      window=16, min_points=8,
                                      threshold=3.0).collect()}
    # rows 0..7: fewer than 8 preceding points -> NULL, not flagged
    for i in range(8):
        assert out[i] == (None, False)
    # row 9 (the spike) is flagged against the stable history
    z9, flag9 = out[9]
    assert flag9 and z9 > 3.0
    # row 8 is ordinary
    assert not out[8][1]


def test_trailing_zscore_zero_variance_null(spark):
    rows = [("u", i, 5.0) for i in range(12)]
    df = spark.createDataFrame(rows, "k string, o long, value double")
    out = R.trailing_zscore(df, "k", "o", "value", min_points=8)
    assert all(r.zscore is None and not r.is_anomaly
               for r in out.collect())


def test_salted_join_rejects_outer_joins(spark):
    """An outer join would emit unmatched dim rows once per salt
    replica — the operator refuses instead of silently duplicating."""
    f = spark.createDataFrame([(1, 1)], "k long, fid long")
    d = spark.createDataFrame([(1, "x")], "k long, label string")
    with pytest.raises(ValueError, match="fact-preserving"):
        R.salted_join(f, d, "k", how="full")
    with pytest.raises(ValueError, match="fact-preserving"):
        R.salted_join(f, d, "k", how="right")
    # left outer is fact-preserving and allowed
    assert R.salted_join(f, d, "k", how="left").count() == 1


# ------------------------------------------------- snapshot_diff / CDC

def test_snapshot_diff_three_change_types(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "k long, v string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (5, "e"), (4, None)],
        "k long, v string")
    out = {r.k: r.change_type
           for r in R.snapshot_diff(old, new, ["k"], ["v"]).collect()}
    # 1 unchanged (absent), 2 changed, 3 removed, 5 added,
    # 4 NULL==NULL unchanged (null-safe compare)
    assert out == {2: "changed", 3: "removed", 5: "added"}


def test_snapshot_diff_roundtrip_with_changelog(spark):
    """diff(old, new) converted to a changelog and applied to old
    reproduces new exactly — the CDC pair is a true inverse."""
    old = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k long, v double")
    new = spark.createDataFrame(
        [(1, 10.0), (2, 25.0), (4, 40.0)], "k long, v double")
    d = R.snapshot_diff(old, new, ["k"], ["v"])
    log = d.select(
        "k",
        F.col("new_v").alias("v"),
        F.when(F.col("change_type") == "removed", "delete")
        .otherwise("upsert").alias("op"),
        F.lit(1).alias("ord"),
    )
    applied = R.apply_changelog(old, log, ["k"], "op", "ord")
    assert sorted((r.k, r.v) for r in applied.collect()) \
        == sorted((r.k, r.v) for r in new.collect())


def test_apply_changelog_latest_wins_and_inserts(spark):
    snap = spark.createDataFrame([(1, "x"), (2, "y")], "k long, v string")
    log = spark.createDataFrame(
        [
            (1, "x2", "upsert", 1), (1, None, "delete", 2),  # delete wins
            (2, "y2", "upsert", 5),
            (9, "new", "upsert", 1),                          # insert
        ],
        "k long, v string, op string, ord long")
    out = {r.k: r.v
           for r in R.apply_changelog(snap, log, ["k"], "op",
                                      "ord").collect()}
    assert out == {2: "y2", 9: "new"}


# ---------------------------------------------------------------------
# k-core peel
# ---------------------------------------------------------------------

def _sym(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_kcore_planted_clique_survives_chain_peels(spark):
    from twitter_to_sqlite_spark.functions.graph import kcore

    # K5 clique (each node degree 4) + a pendant chain hanging off
    # node 0: the chain peels one link per round at k=2, the clique
    # is the exact 2-core (and 4-core)
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    chain = [(0, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(_sym(clique + chain), "src long, dst long")

    core2 = kcore(edges, k=2, rounds=5).collect()
    assert sorted(r["node_id"] for r in core2) == [0, 1, 2, 3, 4]

    core4 = {r["node_id"]: r["degree"] for r in kcore(edges, k=4, rounds=5).collect()}
    assert sorted(core4) == [0, 1, 2, 3, 4]
    assert all(d == 4 for d in core4.values())


def test_kcore_insufficient_rounds_is_superset(spark):
    from twitter_to_sqlite_spark.functions.graph import kcore

    # chain of 6 at k=2 needs 3 rounds to vanish; 1 round leaves a
    # strict superset of the (empty) 2-core, more rounds converge to it
    chain = [(i, i + 1) for i in range(6)]
    edges = spark.createDataFrame(_sym(chain), "src long, dst long")
    assert len(kcore(edges, k=2, rounds=1).collect()) > 0
    assert kcore(edges, k=2, rounds=4).collect() == []


def test_kcore_monotone_in_k(spark):
    from twitter_to_sqlite_spark.functions.graph import kcore

    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    extra = [(0, 20), (1, 20), (2, 20)]  # node 20 has degree 3
    edges = spark.createDataFrame(_sym(clique + extra), "src long, dst long")
    n3 = {r["node_id"] for r in kcore(edges, k=3, rounds=6).collect()}
    n5 = {r["node_id"] for r in kcore(edges, k=5, rounds=6).collect()}
    assert n5 <= n3
    assert 20 in n3 and 20 not in n5


# ---------------------------------------------------------------------
# label propagation
# ---------------------------------------------------------------------

def test_lpa_two_cliques_with_bridge(spark):
    from twitter_to_sqlite_spark.functions.graph import label_propagation

    # two K4 cliques joined by one bridge edge: LPA must settle each
    # clique on its min node id and keep the two communities distinct
    a = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    b = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    bridge = [(3, 10)]
    edges = spark.createDataFrame(_sym(a + b + bridge), "src long, dst long")
    got = {r["node_id"]: r["community"]
           for r in label_propagation(edges, rounds=6).collect()}
    assert {got[i] for i in range(4)} == {0}
    assert {got[i] for i in range(10, 14)} == {10}


def test_lpa_deterministic_across_runs(spark):
    from twitter_to_sqlite_spark.functions.graph import label_propagation

    edges = spark.createDataFrame(
        _sym([(i, (i * 7) % 20) for i in range(20) if i != (i * 7) % 20]),
        "src long, dst long")
    r1 = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    r2 = sorted(map(tuple, label_propagation(edges, rounds=3).collect()))
    assert r1 == r2


def test_lpa_self_vote_damps_bipartite_flip(spark):
    from twitter_to_sqlite_spark.functions.graph import label_propagation

    # star K1,3: with a self-vote the center (0) and leaves all agree
    # on label 0 within two rounds instead of oscillating
    edges = spark.createDataFrame(
        _sym([(0, 1), (0, 2), (0, 3)]), "src long, dst long")
    got = {r["node_id"]: r["community"]
           for r in label_propagation(edges, rounds=4).collect()}
    assert set(got.values()) == {0}


# ---------------------------------------------------------------------
# conversion attribution
# ---------------------------------------------------------------------

def _attr_events(spark, rows):
    return spark.createDataFrame(
        [(i, u, dt.datetime(2024, 1, 1, 0, 0, s), t)
         for i, (u, s, t) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp, event_type string")


def test_attribution_first_and_last_touch(spark):
    ev = _attr_events(spark, [
        (1, 0, "click"), (1, 10, "view"), (1, 20, "error"),
        (1, 30, "purchase"),
        (2, 5, "purchase"),           # no touches at all
    ])
    got = {r["user_id"]: r for r in R.attribute_conversions(
        ev, "user_id", "ts", "event_id", "event_type",
        "purchase", ["click", "view"]).collect()}
    a = got[1]
    assert a["first_touch_type"] == "click"
    assert a["last_touch_type"] == "view"
    assert a["latency_us"] == 20 * 1_000_000
    assert a["attributed"]
    b = got[2]
    assert not b["attributed"] and b["first_touch_type"] is None


def test_attribution_window_voids_stale_touch(spark):
    ev = _attr_events(spark, [
        (1, 0, "click"), (1, 50, "purchase"),
    ])
    fresh = R.attribute_conversions(
        ev, "user_id", "ts", "event_id", "event_type",
        "purchase", ["click"], within_seconds=60).collect()[0]
    assert fresh["attributed"] and fresh["last_touch_type"] == "click"
    stale = R.attribute_conversions(
        ev, "user_id", "ts", "event_id", "event_type",
        "purchase", ["click"], within_seconds=30).collect()[0]
    assert not stale["attributed"]
    assert stale["last_touch_type"] is None
    # first touch is reported regardless of the lookback window
    assert stale["first_touch_type"] == "click"


def test_attribution_touch_after_conversion_ignored(spark):
    ev = _attr_events(spark, [
        (1, 10, "purchase"), (1, 20, "click"),
    ])
    got = R.attribute_conversions(
        ev, "user_id", "ts", "event_id", "event_type",
        "purchase", ["click"]).collect()[0]
    assert not got["attributed"] and got["first_touch_type"] is None
