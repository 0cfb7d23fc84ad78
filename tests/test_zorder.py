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
