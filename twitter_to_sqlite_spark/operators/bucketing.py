"""Bucketed-table support: shuffle-free co-located joins.

At 100 TB the dominant join cost is the exchange — re-hashing both
sides across the cluster. Spark's bucketing pre-hashes a table into a
fixed number of bucket files AT WRITE TIME (hash(key) % n_buckets, the
same hash the join would use), so two tables bucketed by the same key
into the same bucket count join with NO Exchange on either side: each
task reads bucket i of both tables and merges. The shuffle is paid
once per table lifetime instead of once per query — the right trade
for fact tables joined repeatedly (tweets ⋈ users, events ⋈ orders).

Requires the session catalog (``saveAsTable``): bucket metadata lives
in the table definition, not the files. ``path`` pins the data
location so the catalog entry is a thin pointer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, keys: list[str],
                   num_buckets: int, path: str | None = None) -> None:
    """Persist ``df`` bucketed (and sorted) by ``keys`` into
    ``num_buckets`` files per partition.

    Sorting within buckets upgrades the bucket join from hash to merge
    (no per-task sort at read time). Pick ``num_buckets`` ≈ the
    cluster's target task count for the table's size — it is fixed at
    write time and both join sides must match.
    """
    w = (
        df.write.mode("overwrite").format("parquet")
        .bucketBy(num_buckets, *keys).sortBy(*keys)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  keys: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed catalog tables on their bucket keys.

    With matching bucket specs the physical plan contains no Exchange
    (asserted in test_plans.py::test_bucketed_join_has_no_exchange) —
    each task zips bucket i of both tables. Falls back to a normal
    shuffled join automatically if the specs diverge, so this is safe
    to call on any pair of catalog tables.
    """
    return spark.table(left_table).join(spark.table(right_table), keys, how)
