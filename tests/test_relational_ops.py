

def test_changelog_compact_rule_branches(spark):
    """All compaction rules on one log: insert+update→insert(final);
    insert+delete→gone; bare update stays; update+delete→delete;
    bare delete stays; insert+update+update→insert(last payload)."""
    from twitter_to_sqlite_spark.operators import relational as R

    rows = [
        (1, "insert", 1, 10.0), (1, "update", 2, 20.0),
        (2, "insert", 1, 10.0), (2, "delete", 2, 10.0),
        (3, "update", 5, 30.0),
        (4, "update", 1, 5.0), (4, "delete", 2, 5.0),
        (5, "delete", 9, 1.0),
        (6, "insert", 1, 1.0), (6, "update", 2, 2.0),
        (6, "update", 3, 3.0),
    ]
    ch = spark.createDataFrame(
        rows, "k long, op string, seq int, v double")
    got = {r["k"]: (r["net_op"], r["v"])
           for r in R.changelog_compact(ch, ["k"], "op", "seq", ["v"])
           .collect()}
    assert got == {1: ("insert", 20.0), 3: ("update", 30.0),
                   4: ("delete", 5.0), 5: ("delete", 1.0),
                   6: ("insert", 3.0)}


def test_lateness_sweep_monotone_and_exact(spark):
    """The drop curve is non-increasing in tau, tau=0 counts every
    late event, and a planted 2-user stream with known lags lands on
    exact counts (user 1: lags 0, 5s, 0; user 2: all on time)."""
    from datetime import datetime

    from twitter_to_sqlite_spark.plans import catalog as C
    from pyspark.sql import functions as F  # noqa: F401

    rows = [
        (1, 1, datetime(2024, 1, 1, 0, 0, 0)),
        (2, 1, datetime(2024, 1, 1, 0, 1, 0)),
        (3, 1, datetime(2024, 1, 1, 0, 0, 55)),   # 5s late
        (4, 2, datetime(2024, 1, 1, 0, 0, 0)),
        (5, 2, datetime(2024, 1, 1, 0, 2, 0)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp")
    import tempfile, shutil, os
    d = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(d, "events.parquet"))
        got = sorted((r["tau_us"], r["n_dropped"], r["frac_dropped"])
                     for r in C.q_lateness_sweep(spark, d).collect())
        taus = [t for t, _, _ in got]
        drops = [n for _, n, _ in got]
        assert drops == sorted(drops, reverse=True)  # monotone
        assert got[0] == (0, 1, 0.2)                 # the 5s-late event
        assert dict(zip(taus, drops))[10_000_000] == 0   # 10s covers it
    finally:
        shutil.rmtree(d, ignore_errors=True)
