

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
