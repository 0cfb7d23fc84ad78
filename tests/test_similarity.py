

def test_knn_graph_blocked_neighbors(spark):
    """Two well-separated clusters: neighbors never cross cells; each
    node ranks its own cell-mates by cosine with id tie-break; rank
    list is 1..min(k, cell_size-1)."""
    from twitter_to_sqlite_spark.functions import similarity as S

    # cluster A near +x, cluster B near +y
    rows = [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.8, 0.05]),
            (11, [0.0, 1.0]), (12, [0.1, 0.9])]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0], [0.0, 1.0]]
    got = S.knn_graph(e, cents, k=2).collect()
    a_ids, b_ids = {1, 2, 3}, {11, 12}
    for r in got:
        same = (r["src"] in a_ids) == (r["nbr"] in a_ids)
        assert same, f"cross-cell edge {r}"
    by_src = {}
    for r in got:
        by_src.setdefault(r["src"], []).append(r)
    assert sorted(r["rank"] for r in by_src[1]) == [1, 2]
    assert sorted(r["rank"] for r in by_src[11]) == [1]
    # node 1's nearest cell-mate by cosine is 3 ([0.8,0.05] is more
    # x-aligned than [0.9,0.1])
    assert [r["nbr"] for r in sorted(by_src[1], key=lambda r: r["rank"])] \
        == [3, 2]
