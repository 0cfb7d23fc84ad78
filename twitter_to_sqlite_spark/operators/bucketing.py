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


def zvalue(x, y, bits: int = 16):
    """Morton (Z-order) interleave of two non-negative integer
    columns, ``bits`` bits each → one 2·bits-bit locality key: rows
    close in BOTH dimensions are close in z, so range-partitioning /
    sorting the table by z gives every file a small bounding box in
    (x, y) — the multi-dimensional data-clustering device (Delta/
    Databricks OPTIMIZE ZORDER, Iceberg sort orders) that lets
    min/max file statistics prune scans on EITHER predicate column,
    where a plain sort only prunes its leading column.

    Pure JVM bit arithmetic (a static unrolled expression — no UDF,
    fully codegen'd); callers clamp/rescale their columns into
    [0, 2^bits) first.
    """
    import functools
    from pyspark.sql import functions as F

    xs = x if not isinstance(x, str) else F.col(x)
    ys = y if not isinstance(y, str) else F.col(y)
    xs, ys = xs.cast("long"), ys.cast("long")
    parts = []
    for i in range(bits):
        xbit = F.shiftright(xs, i).bitwiseAND(F.lit(1))
        ybit = F.shiftright(ys, i).bitwiseAND(F.lit(1))
        parts.append(F.shiftleft(xbit, 2 * i))
        parts.append(F.shiftleft(ybit, 2 * i + 1))
    return functools.reduce(lambda a, b: a + b, parts)


def zorder_layout_stats(df: DataFrame, x_col: str, y_col: str,
                        bits: int = 16, n_files: int = 64):
    """Plan the z-ordered layout of ``df`` and report, per target
    file (z-range bucket), the (x, y) bounding box and row count —
    the min/max statistics a scan planner would prune on. The file id
    is ``z·n_files div 2^(2·bits)`` (contiguous z-ranges of equal
    width), so the layout is a pure function of the data: both
    engines, and every retry, assign identical files.

    Returns (file_id, n_rows, x_min, x_max, y_min, y_max). The
    companion write path is ``df.repartitionByRange(n_files,
    zvalue(...)).sortWithinPartitions(zvalue(...))`` + parquet — the
    stats here are exactly what those files' footers would carry.
    """
    from pyspark.sql import functions as F

    z = zvalue(x_col, y_col, bits=bits)
    span = 1 << (2 * bits)
    d = df.select(
        F.col(x_col).alias("__x"), F.col(y_col).alias("__y"),
        z.alias("__z"))
    d = d.withColumn(
        "file_id", F.expr(f"(__z * {n_files}) div {span}"))
    return (
        d.groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("__x").alias("x_min"), F.max("__x").alias("x_max"),
            F.min("__y").alias("y_min"), F.max("__y").alias("y_max"),
        )
    )


def shard_move_stats(df: DataFrame, key_col: str,
                     n_old: int, n_new: int) -> DataFrame:
    """Shard-rebalance planning: how many keys MOVE when the shard
    count grows n_old → n_new, compared across the two assignment
    strategies a 100 TB table actually chooses between:

      mod         shard = hash(key) % n — the dataset_split /
                  shard_manifest scheme. Cheap, but growing n
                  reassigns ~(1 − 1/lcm-ish) of ALL keys: nearly the
                  whole corpus re-shuffles on reshard.
      rendezvous  shard = argmax_s hash(key, s) (highest-random-
                  weight, Thaler & Ravishankar 1996). Growing n only
                  moves keys whose NEW shards win the argmax —
                  exactly (n_new − n_old)/n_new of keys in
                  expectation, the provable minimum for a uniform
                  balanced scheme.

    Emitted as data — (strategy, n_keys, n_moved, move_frac) — so the
    reshard decision is measured on the real key population, not
    assumed. Both strategies use the portable md5 hash, so the row is
    engine-reproducible and the moved set is deterministic.

    Scale: one distinct on the key, then a narrow projection (the
    argmax is an unrolled array_max over n_new struct literals — pure
    codegen) and one map-side-combined agg. No join, no window.
    """
    from pyspark.sql import functions as F

    h = F.conv(
        F.substring(F.md5(F.col("__k").cast("string")), 1, 15), 16, 10
    ).cast("long")
    keys = (
        df.select(F.col(key_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
        .withColumn("__h", h)
    )

    def rdv(n):
        # array_max over (hash, shard) structs → lexicographic max =
        # highest hash; md5 collisions across (key, s) pairs are the
        # only possible tie and are ~impossible
        pairs = [
            F.struct(
                F.conv(F.substring(
                    F.md5(F.concat(F.col("__k").cast("string"),
                                   F.lit(f"|{s}"))), 1, 15), 16, 10)
                .cast("long").alias("h"),
                F.lit(s).alias("s"),
            )
            for s in range(n)
        ]
        return F.array_max(F.array(*pairs))["s"]

    assigned = keys.select(
        (F.col("__h") % n_old).alias("__mo"),
        (F.col("__h") % n_new).alias("__mn"),
        rdv(n_old).alias("__ro"),
        rdv(n_new).alias("__rn"),
    )
    # ONE aggregate computes both strategies' moved-counts — a
    # per-strategy agg would re-evaluate the key-distinct and the
    # n_old+n_new md5 hashes per key twice (Spark does not CSE
    # sibling aggregates), doubling the dominant cost on a large key
    # population. The 1-row wide result then explodes to 2 rows.
    wide = assigned.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum((F.col("__mo") != F.col("__mn")).cast("long"))
        .alias("__mvm"),
        F.sum((F.col("__ro") != F.col("__rn")).cast("long"))
        .alias("__mvr"),
    )
    rows = [
        F.struct(F.lit(name).alias("strategy"),
                 F.col("__n").alias("n_keys"),
                 F.col(mv).alias("n_moved"))
        for name, mv in (("mod", "__mvm"), ("rendezvous", "__mvr"))
    ]
    return (
        wide.select(F.explode(F.array(*rows)).alias("__s"))
        .select(
            "__s.strategy", "__s.n_keys", "__s.n_moved",
            F.round(F.col("__s.n_moved").cast("double")
                    / F.col("__s.n_keys"), 6).alias("move_frac"),
        )
    )


def compaction_plan(manifest: DataFrame, key_col: str, size_col: str,
                    target_bytes: int) -> DataFrame:
    """Small-file compaction planner (the Delta/Iceberg OPTIMIZE
    bin-packing step): files already at/above `target_bytes` are left
    in place (`action='keep'`, rewriting them would churn data for no
    layout gain); smaller files are packed into output groups of
    ≈`target_bytes` by an exact integer prefix sum in key order —
    `out_group = floor(bytes_before / target)` — so every group except
    possibly the last lands within one file of the target. Returns one
    row per input file: (key, size, action, out_group, group_bytes,
    n_in_group); the actual rewrite is then a repartition keyed on
    out_group, reading ONLY the 'rewrite' files.

    Scale: runs over the MANIFEST (one row per file), never the data —
    the planner for a 100 TB table with 1e6 files is a 1e6-row frame.
    The ordered prefix sum is a single global window over that
    manifest, the same bounded-frame device as shard_move_stats; all
    arithmetic is BIGINT-exact, so the plan is engine-reproducible
    (retrying the planner cannot shuffle files between groups).
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    small = manifest.filter(F.col(size_col) < target_bytes)
    w = (Window.orderBy(key_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gw = Window.partitionBy("out_group")
    packed = (
        small.withColumn("__cum", F.sum(size_col).over(w))
        .withColumn("out_group", F.expr(
            f"CAST((__cum - {size_col}) DIV {target_bytes} AS BIGINT)"))
        .select(
            key_col, size_col, F.lit("rewrite").alias("action"),
            "out_group",
            F.sum(size_col).over(gw).cast("long").alias("group_bytes"),
            F.count(F.lit(1)).over(gw).cast("long").alias("n_in_group"),
        )
    )
    kept = manifest.filter(F.col(size_col) >= target_bytes).select(
        key_col, size_col, F.lit("keep").alias("action"),
        F.lit(None).cast("long").alias("out_group"),
        F.lit(None).cast("long").alias("group_bytes"),
        F.lit(None).cast("long").alias("n_in_group"),
    )
    return packed.unionByName(kept)
