"""Z-order layout: interleave correctness and locality."""

from __future__ import annotations

from pyspark.sql import functions as F

from twitter_to_sqlite_spark.operators import bucketing


def _morton(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_interleave(spark):
    pts = [(x, y) for x in (0, 1, 5, 127, 255) for y in (0, 2, 9, 255)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = df.select("x", "y",
                    bucketing.zvalue("x", "y", bits=8).alias("z")).collect()
    for r in got:
        assert r["z"] == _morton(r["x"], r["y"], 8)


def test_zvalue_is_monotone_in_quadrants(spark):
    # all of quadrant (x<128, y<128) sorts before any point with the
    # top bit set in both dims — the prefix property pruning relies on
    df = spark.createDataFrame(
        [(10, 20), (100, 90), (200, 201), (130, 140)], "x long, y long")
    z = {(r["x"], r["y"]): r["z"] for r in df.select(
        "x", "y", bucketing.zvalue("x", "y", bits=8).alias("z")).collect()}
    assert max(z[(10, 20)], z[(100, 90)]) < min(z[(200, 201)], z[(130, 140)])


def test_layout_stats_boxes_are_local(spark):
    # a dense 64x64 grid z-ordered into 16 files: every file's
    # bounding box must stay a small fraction of the full domain —
    # the reason either-column predicates prune
    pts = [(x, y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(pts, "x long, y long")
    stats = bucketing.zorder_layout_stats(
        df, "x", "y", bits=6, n_files=16).collect()
    assert sum(r["n_rows"] for r in stats) == 64 * 64
    for r in stats:
        area = (r["x_max"] - r["x_min"] + 1) * (r["y_max"] - r["y_min"] + 1)
        # full domain is 4096 cells; each of 16 files must cover a
        # bounded box, not a stripe across a whole dimension
        assert area <= 1024
        assert r["x_max"] - r["x_min"] <= 32
        assert r["y_max"] - r["y_min"] <= 32


def test_layout_is_deterministic(spark):
    pts = [((i * 37) % 200, (i * 91) % 200) for i in range(500)]
    df = spark.createDataFrame(pts, "x long, y long")
    a = sorted(map(tuple, bucketing.zorder_layout_stats(
        df, "x", "y", bits=8, n_files=8).collect()))
    b = sorted(map(tuple, bucketing.zorder_layout_stats(
        df, "x", "y", bits=8, n_files=8).collect()))
    assert a == b


def test_shard_move_stats_rendezvous_is_minimal(spark):
    """Growing 8 -> 12 shards: rendezvous moves ~= 4/12 of keys (the
    consistent-hashing guarantee), mod-hash moves far more; equal
    shard counts move nothing under either strategy."""
    from twitter_to_sqlite_spark.operators import bucketing

    df = spark.createDataFrame([(k,) for k in range(3000)], "k long")
    got = {r["strategy"]: r for r in
           bucketing.shard_move_stats(df, "k", 8, 12).collect()}
    assert got["rendezvous"]["n_keys"] == 3000
    # expectation 1/3; deterministic given the hash — loose band
    assert 0.28 < got["rendezvous"]["move_frac"] < 0.39
    assert got["mod"]["move_frac"] > 2 * got["rendezvous"]["move_frac"]

    same = {r["strategy"]: r for r in
            bucketing.shard_move_stats(df, "k", 12, 12).collect()}
    assert same["mod"]["n_moved"] == 0
    assert same["rendezvous"]["n_moved"] == 0


def test_shard_move_stats_rendezvous_monotone_growth(spark):
    """Rendezvous keys never move when the shard set is unchanged at
    the front: growth n -> m only reassigns keys whose winner is a NEW
    shard, so move fraction grows with (m - n)/m."""
    from twitter_to_sqlite_spark.operators import bucketing

    df = spark.createDataFrame([(k,) for k in range(1500)], "k long")
    f_1 = {r["strategy"]: r["move_frac"] for r in
           bucketing.shard_move_stats(df, "k", 8, 9).collect()}
    f_4 = {r["strategy"]: r["move_frac"] for r in
           bucketing.shard_move_stats(df, "k", 8, 12).collect()}
    assert f_1["rendezvous"] < f_4["rendezvous"]
    assert 0.06 < f_1["rendezvous"] < 0.17      # ~1/9
