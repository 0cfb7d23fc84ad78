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


SCAN_SCRIPT = textwrap.dedent(
    """
    import sys
    from pyspark.sql import SparkSession
    from twitter_to_sqlite_spark import commands as C
    from twitter_to_sqlite_spark.database import TweetDatabase

    root = sys.argv[1]
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.driver.maxResultSize", "1m")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    N = 12_000
    PAYLOAD = "y" * 2000  # ~24 MB of text across the replay, 24x the 1m cap

    def make(i):
        return {
            "id": i,
            "created_at": "Mon Feb 03 10:20:30 +0000 2020",
            "full_text": PAYLOAD,
            "source": '<a href="https://x.example.com">X</a>',
            "user": {"id": 101, "screen_name": "u", "followers_count": 1,
                     "friends_count": 1, "listed_count": 0},
            "retweet_count": 0, "favorite_count": 0, "lang": "en",
        }

    def fetch(url, params):
        hi = params.get("max_id", N)
        lo = params.get("since_id", 0)
        page = [make(i) for i in range(hi, max(lo, hi - params["count"]), -1)]
        return 200, page

    db = TweetDatabase(spark, f"{root}/db")
    # Instrument the flush entry point: the driver must never hand more
    # than one chunk (+ one page of slack) to the save pipeline at once.
    seen = []
    orig = C.tweets_dataframe
    def spy(spark_, rows):
        seen.append(len(rows))
        return orig(spark_, rows)
    C.tweets_dataframe = spy

    n = C.user_timeline(spark, fetch, db, 101)
    assert n == N, n
    assert max(seen) <= C.SCAN_CHUNK_ROWS + 200, max(seen)
    assert len(seen) >= N // C.SCAN_CHUNK_ROWS, seen
    ids = db.read("tweets").count()
    assert ids == N, ids
    assert db.watermarks.get("user", "id:101") == N
    print("OK", ids, max(seen))
    spark.stop()
    """
)


def test_scan_replay_larger_than_max_result_size(tmp_path):
    """VERDICT r2 #1: _scan_and_save must stream a replay far larger
    than spark.driver.maxResultSize through chunked saves — the driver
    holds at most one chunk of pages, never the whole scan."""
    proc = subprocess.run(
        [sys.executable, "-c", SCAN_SCRIPT, str(tmp_path)],
        capture_output=True, text=True, timeout=420, cwd="/root/repo",
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "OK 12000" in proc.stdout
