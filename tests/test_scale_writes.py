"""Scale guarantee for the K1/K2 writers (VERDICT r1 #1): an upsert of
a table far larger than spark.driver.maxResultSize must succeed — i.e.
the merged table provably never crosses the driver.

Runs in a subprocess with its own SparkSession configured with an
artificially tiny 1m maxResultSize; the old collect()-based writer
fails this with SPARK_JOB_CANCELLED / bigger-than-maxResultSize.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession, functions as F
    from twitter_to_sqlite_spark.operators import sinks

    root = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.maxResultSize", "1m")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    path = f"{root}/big"
    # ~40k rows x ~500B payload ≈ 20 MB collected — 20x over the 1m cap.
    batch = lambda ver: (
        spark.range(40_000)
        .withColumn("payload", F.repeat(F.lit("x"), 500))
        .withColumn("ver", F.lit(ver).cast("long"))
    )
    sinks.write_upsert(spark, batch(1), path, ["id"], "ver")
    sinks.write_upsert(spark, batch(2), path, ["id"], "ver")  # full-table merge
    n = spark.read.parquet(path).count()
    assert n == 40_000, n
    print("OK", n)
    spark.stop()
    """
)


def test_upsert_larger_than_max_result_size(tmp_path):
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT, str(tmp_path)],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK 40000" in proc.stdout
