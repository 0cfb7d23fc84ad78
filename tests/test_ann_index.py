"""Materialized ANN index tests (VERDICT r2 #3): the persisted
bucket/cell-partitioned corpus must (a) answer probes identically to
the on-the-fly path and (b) actually prune — the probe scan reads only
the probed partition directories."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.functions import similarity

SF = "/root/testdata/sf0.001"
DIMS = [0, 8, 16, 24]


@pytest.fixture(scope="module")
def emb(spark):
    return tables.load_table(spark, SF, "embeddings")


def rows_of(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in df.collect()
    )


def plan_str(spark, df):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_lsh_index_probe_matches_on_the_fly(spark, emb, tmp_path):
    path = str(tmp_path / "lsh_idx")
    similarity.build_lsh_index(emb, path, dims=DIMS)
    queries = emb.filter(F.col("vec_id") < 5)
    live = similarity.lsh_bucketed_topk(emb, queries, k=3, dims=DIMS)
    idx = similarity.probe_lsh_index(spark, path, queries, k=3)
    assert rows_of(idx) == rows_of(live)
    # multiprobe parity too
    live2 = similarity.lsh_bucketed_topk(emb, queries, k=3, dims=DIMS, multiprobe=1)
    idx2 = similarity.probe_lsh_index(spark, path, queries, k=3, multiprobe=1)
    assert rows_of(idx2) == rows_of(live2)


def test_lsh_probe_scan_is_partition_pruned(spark, emb, tmp_path):
    path = str(tmp_path / "lsh_idx")
    similarity.build_lsh_index(emb, path, dims=DIMS)
    queries = emb.filter(F.col("vec_id") < 2)
    probe = similarity.probe_lsh_index(spark, path, queries, k=3)
    plan = plan_str(spark, probe)
    # the index scan carries a partition filter on bucket...
    assert "PartitionFilters:" in plan
    part_filter = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "bucket" in part_filter
    # ...and only the probed bucket dirs are actually read at runtime
    # (inputFiles() reports the pre-pushdown relation, so check the
    # files the executed scan really touched via input_file_name()).
    q = similarity._side(queries, "vec_id", "embedding", "query_id",
                         "__qv", "__qn").withColumn(
        "bucket", similarity.sign_bucket("__qv", DIMS))
    probed = {r[0] for r in q.select("bucket").distinct().collect()}
    pruned = similarity._pruned_scan(spark, path, "bucket", sorted(probed))
    files = [r[0] for r in
             pruned.select(F.input_file_name()).distinct().collect()]
    assert files, "pruned scan must still read the probed buckets"
    assert all(any(f"bucket={b}/" in f for b in probed) for f in files)
    all_files = spark.read.parquet(path).inputFiles()
    assert len(files) < len(all_files), "probe must not read every bucket"


def test_ivf_index_probe_matches_on_the_fly(spark, emb, tmp_path):
    path = str(tmp_path / "ivf_idx")
    cents = similarity.kmeans_centroids(emb, 8, iters=1)
    similarity.build_ivf_index(emb, path, cents)
    # sidecar roundtrip preserves the centroids the probe depends on
    assert similarity.read_meta(path)["centroids"] == cents
    queries = emb.filter(F.col("vec_id") < 5)
    for n_probe in (1, 2):
        live = similarity.ivf_topk(emb, queries, cents, k=3, n_probe=n_probe)
        idx = similarity.probe_ivf_index(spark, path, queries, k=3, n_probe=n_probe)
        assert rows_of(idx) == rows_of(live)


def test_ivf_probe_scan_is_partition_pruned(spark, emb, tmp_path):
    path = str(tmp_path / "ivf_idx")
    cents = similarity.kmeans_centroids(emb, 8, iters=1)
    similarity.build_ivf_index(emb, path, cents)
    queries = emb.filter(F.col("vec_id") < 2)
    probe = similarity.probe_ivf_index(spark, path, queries, k=3, n_probe=1)
    plan = plan_str(spark, probe)
    assert "PartitionFilters:" in plan
    part_filter = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "cell" in part_filter
    files = set()
    for f in spark.read.parquet(path).inputFiles():
        files.add(f.split("/cell=")[1].split("/")[0])
    assert len(files) > 2, "corpus must span several cells for pruning to matter"


def test_append_equals_rebuild_ivf_and_lsh(spark, tmp_path):
    """Probe-equivalence law: an index built on half the corpus and
    APPENDED with the other half answers every probe exactly like an
    index built from the whole corpus — for both index kinds."""
    from pyspark.sql import functions as F

    from twitter_to_sqlite_spark import tables
    from twitter_to_sqlite_spark.functions import similarity as S

    e = tables.load_table(spark, "/root/testdata/sf0.001", "embeddings") \
        .select("vec_id", "embedding")
    q = e.filter(F.col("vec_id") < 5)
    even, odd = (e.filter(F.col("vec_id") % 2 == 0),
                 e.filter(F.col("vec_id") % 2 == 1))
    cents = S.kmeans_centroids(e, 8, iters=1)

    pa = str(tmp_path / "ivf_app")
    pb = str(tmp_path / "ivf_full")
    S.build_ivf_index(even, pa, cents)
    S.append_ann_index(odd, pa)
    S.build_ivf_index(e, pb, cents)
    got = sorted(map(tuple, S.probe_ivf_index(
        spark, pa, q, k=3, n_probe=2).collect()))
    want = sorted(map(tuple, S.probe_ivf_index(
        spark, pb, q, k=3, n_probe=2).collect()))
    assert got == want and len(got) == 15

    la = str(tmp_path / "lsh_app")
    lb = str(tmp_path / "lsh_full")
    S.build_lsh_index(even, la, dims=[0, 8, 16, 24])
    S.append_ann_index(odd, la)
    S.build_lsh_index(e, lb, dims=[0, 8, 16, 24])
    got = sorted(map(tuple, S.probe_lsh_index(spark, la, q, k=3).collect()))
    want = sorted(map(tuple, S.probe_lsh_index(spark, lb, q, k=3).collect()))
    assert got == want and len(got) > 0


def test_streamed_maintenance_probe_and_law(spark):
    """r10 ann_maintained device end-to-end: the REAL availableNow
    engine folds two parquet spool shards into the base-third index
    via foreachBatch -> append_ann_index; the build itself enforces
    maintain==rebuild by distributed content checksum (it raises on
    divergence), and the resulting index must answer probes exactly
    like the on-the-fly LSH path over the full corpus."""
    from twitter_to_sqlite_spark import tables
    from twitter_to_sqlite_spark.functions import similarity as S
    from twitter_to_sqlite_spark.plans import _q08_eval_ops as Q8

    path = Q8._ann_maintained_index(spark, SF)
    emb = tables.load_table(spark, SF, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    got = rows_of(S.probe_lsh_index(spark, path, queries, k=3))
    want = rows_of(S.lsh_bucketed_topk(emb, queries, k=3, dims=DIMS))
    assert got == want and len(got) == 15


def test_maintained_checksum_discriminates(spark, tmp_path):
    """The content checksum must actually bind the law: a partially
    maintained index (missing shard) hashes DIFFERENT from the full
    rebuild; appending the missing shard restores equality. Guards
    against the checksum degenerating into a constant (which would
    green-light a silently stale index)."""
    from pyspark.sql import functions as F

    from twitter_to_sqlite_spark import tables
    from twitter_to_sqlite_spark.functions import similarity as S
    from twitter_to_sqlite_spark.plans import _q08_eval_ops as Q8

    e = tables.load_table(spark, SF, "embeddings") \
        .select("vec_id", "embedding")
    pa = str(tmp_path / "half")
    pb = str(tmp_path / "full")
    S.build_lsh_index(e.filter(F.col("vec_id") % 2 == 0), pa, dims=DIMS)
    S.build_lsh_index(e, pb, dims=DIMS)
    half = Q8._lsh_index_content_checksum(spark.read.parquet(pa))
    full = Q8._lsh_index_content_checksum(spark.read.parquet(pb))
    assert half != full
    S.append_ann_index(e.filter(F.col("vec_id") % 2 == 1), pa)
    assert Q8._lsh_index_content_checksum(spark.read.parquet(pa)) == full
