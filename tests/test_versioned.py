"""Versioned parquet tables: time travel, retention vacuum, and CDC
between versions (operators/sinks.py write_version family).

The strongest pin composes the version store with the law-tested CDC
pair: apply_changelog(read v1, version_diff(v1 -> v3)) == read v3.
"""

from __future__ import annotations

import threading

import pytest

from twitter_to_sqlite_spark.operators import relational as R
from twitter_to_sqlite_spark.operators import sinks


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, val string")


def test_write_read_versions_and_latest(spark, tmp_path):
    p = str(tmp_path / "tbl")
    v1 = sinks.write_version(_df(spark, [(1, "a"), (2, "b")]), p)
    v2 = sinks.write_version(_df(spark, [(1, "a"), (2, "B"), (3, "c")]), p)
    assert (v1, v2) == (1, 2)
    assert sinks.list_versions(p) == [1, 2]
    as_of_1 = {r["id"]: r["val"]
               for r in sinks.read_version(spark, p, 1).collect()}
    latest = {r["id"]: r["val"]
              for r in sinks.read_version(spark, p).collect()}
    assert as_of_1 == {1: "a", 2: "b"}
    assert latest == {1: "a", 2: "B", 3: "c"}


def test_version_diff_round_trips_through_apply_changelog(spark, tmp_path):
    p = str(tmp_path / "tbl")
    sinks.write_version(_df(spark, [(1, "a"), (2, "b"), (4, "d")]), p)
    sinks.write_version(_df(spark, [(1, "a"), (2, "B")]), p)          # v2
    sinks.write_version(_df(spark, [(1, "a"), (2, "B"), (5, "e")]), p)
    diff = sinks.version_diff(spark, p, 1, 3, ["id"], ["val"])
    ops = {r["id"]: r["change_type"] for r in diff.collect()}
    assert ops == {2: "changed", 4: "removed", 5: "added"}
    # replay: v1 + changelog == v3 exactly
    changelog = diff.selectExpr(
        "id", "new_val AS val",
        "CASE WHEN change_type = 'removed' THEN 'delete' "
        "ELSE 'upsert' END AS op",
        "1 AS seq")
    replayed = R.apply_changelog(
        sinks.read_version(spark, p, 1), changelog, ["id"],
        op_col="op", order_col="seq")
    want = sorted(map(tuple, sinks.read_version(spark, p, 3).collect()))
    got = sorted(map(tuple, replayed.select("id", "val").collect()))
    assert got == want


def test_vacuum_drops_old_versions_and_reads_fail_closed(spark, tmp_path):
    p = str(tmp_path / "tbl")
    for i in range(4):
        sinks.write_version(_df(spark, [(1, f"v{i}")]), p)
    dropped = sinks.vacuum_versions(p, keep_last=2)
    assert dropped == [1, 2]
    assert sinks.list_versions(p) == [3, 4]
    with pytest.raises(ValueError):
        sinks.read_version(spark, p, 1)
    assert sinks.read_version(spark, p).collect()[0]["val"] == "v3"


def test_read_empty_store_raises(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        sinks.read_version(spark, str(tmp_path / "none"))


def test_concurrent_writers_get_distinct_versions(spark, tmp_path):
    p = str(tmp_path / "tbl")
    got = []

    def w(i):
        got.append(sinks.write_version(_df(spark, [(i, str(i))]), p))

    ts = [threading.Thread(target=w, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert sorted(got) == [1, 2, 3, 4]
    assert sinks.list_versions(p) == [1, 2, 3, 4]


def test_crash_orphan_version_dir_never_blocks_next_writer(spark, tmp_path):
    """ADVICE r5: a crash between the staging rename and the manifest
    commit leaves a manifest-invisible vNNNNNN directory. The next
    writer must skip past it (not re-allocate its number and die on
    ENOTEMPTY), and the orphan must stay invisible to readers."""
    import os

    p = str(tmp_path / "tbl")
    sinks.write_version(_df(spark, [(1, "a")]), p)
    # Simulate the crash window: v000002 exists on disk but was never
    # committed to the manifest.
    orphan = os.path.join(p, "v000002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-orphan.parquet"), "wb") as fh:
        fh.write(b"not really parquet")

    v = sinks.write_version(_df(spark, [(1, "b")]), p)
    assert v == 3                      # skipped the orphan's number
    assert sinks.list_versions(p) == [1, 3]
    latest = {r["id"]: r["val"]
              for r in sinks.read_version(spark, p).collect()}
    assert latest == {1: "b"}          # orphan never readable


def test_learned_artifact_roundtrip_loaded_equals_trained(spark, tmp_path):
    """An artifact committed via write_version and read back through
    the manifest is the trained table, row for row — and applying the
    LOADED copy gives the same segmentation as applying the in-memory
    one (the q_artifact_roundtrip law, pinned off-catalog)."""
    from twitter_to_sqlite_spark.functions import bpe

    docs = spark.createDataFrame(
        [(i, "the cat sat on the mat " * (1 + i % 3)) for i in range(6)],
        "doc_id long, text string")
    trained_df = bpe.bpe_train(docs, "text", merges=5)
    trained = sorted(
        ((r["rank"], r["left"], r["right"], r["pair_count"])
         for r in trained_df.collect()))

    store = str(tmp_path / "bpe_merges")
    v = sinks.write_version(trained_df, store)
    loaded = sorted(
        ((r["rank"], r["left"], r["right"], r["pair_count"])
         for r in sinks.read_version(spark, store, v).collect()))
    assert loaded == trained

    seg = lambda rows: {  # noqa: E731
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["syms_per_word"])
        for r in bpe.bpe_segment(docs, rows, "text", "doc_id").collect()}
    assert seg(loaded) == seg(trained)


def test_gc_plan_matches_vacuum_and_counts(spark, tmp_path):
    """gc_plan's dry-run must agree with what vacuum_versions then
    actually drops, and report exact per-version row counts."""
    from twitter_to_sqlite_spark.operators import sinks

    p = str(tmp_path / "tbl")
    for n in (2, 5, 7):
        sinks.write_version(spark.range(n), p)
    plan = {r["version"]: r
            for r in sinks.gc_plan(spark, p, keep_last=1).collect()}
    assert [v for v, r in sorted(plan.items()) if r["expirable"]] == [1, 2]
    assert [plan[v]["n_rows"] for v in (1, 2, 3)] == [2, 5, 7]
    assert plan[1]["reclaim_frac"] == round(7 / 14, 6)
    dropped = sinks.vacuum_versions(p, keep_last=1)
    assert dropped == [1, 2]
    assert sinks.list_versions(p) == [3]


def test_diff_column_profile_attributes_changes(spark, tmp_path):
    from pyspark.sql import functions as F

    from twitter_to_sqlite_spark.operators import sinks

    path = str(tmp_path / "tbl")
    v1 = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k long, s string, p double")
    # key 1: s changes; key 2: p changes; key 3 removed; key 4 added
    v2 = spark.createDataFrame(
        [(1, "X", 10.0), (2, "b", 25.0), (4, "d", 40.0)],
        "k long, s string, p double")
    sinks.write_version(v1, path)
    sinks.write_version(v2, path)
    out = {r["column"]: r["n"] for r in sinks.diff_column_profile(
        spark, path, 1, 2, ["k"], ["s", "p"]).collect()}
    assert out == {"s": 1, "p": 1, "_added": 1, "_removed": 1}
