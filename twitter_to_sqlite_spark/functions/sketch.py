"""Deterministic sketches: approximate algorithms whose results are
still bit-reproducible across engines.

Native approximate aggregates (HLL++, t-digest) differ between Spark
and DuckDB implementations, so they can never oracle-match. A KMV
(k-minimum-values) sketch built on the repo's portable md5-derived
uniform hash gives the same estimate in both engines exactly — the
sketch IS a deterministic function of the value set — while keeping
the properties that matter at 100 TB: one pass, bounded state (k
hashes per column), and mergeability (the union of two k-min sets,
re-truncated to k, is the sketch of the union — Spark's
TakeOrderedAndProject computes exactly that shape map-side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: 2^60 — the md5-derived hash is 15 hex chars = 60 bits.
_HASH_SPACE = float(1 << 60)


def _uniform_hash(col):
    """md5-derived uniform draw in (0, 1]: identical in Spark and
    DuckDB (same 15-hex-char prefix → 60-bit integer → divide)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10) \
        .cast("long")
    return h / F.lit(_HASH_SPACE)


def kmv_distinct(df: DataFrame, columns: list[str], k: int = 256) -> DataFrame:
    """KMV (k-minimum-values) distinct-count estimate per column
    (Bar-Yossef et al. 2002): hash every distinct value uniformly into
    (0,1], keep the k smallest hashes; if fewer than k survive the
    count is exact, else estimate (k−1)/u_(k) where u_(k) is the k-th
    smallest hash.

    Returns one row per column: (column, n_kept, kmv_estimate).

    Scale: per column, one distinct (partial-agg shuffle on the
    value) and one top-k by hash (TakeOrderedAndProject — k rows per
    partition map-side, k rows total reduce-side; never a full sort).
    Estimator state is k doubles regardless of cardinality, and two
    sketches merge by unioning their k-min sets and re-truncating —
    the standard KMV union, which is how a 1000-executor profile
    combines per-shard sketches without a second data pass.
    """
    out = None
    for c in columns:
        vals = (
            df.select(F.col(c).cast("string").alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
            .select(_uniform_hash(F.col("__v")).alias("__u"))
        )
        kmin = vals.orderBy("__u").limit(k)
        est = kmin.agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("__u").alias("__umax"),
        ).select(
            F.lit(c).alias("col_name"),
            F.col("n_kept").cast("long").alias("n_kept"),
            F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
            .otherwise(
                F.round(F.lit(float(k - 1)) / F.col("__umax"), 0)
                .cast("long")
            ).alias("kmv_estimate"),
        )
        out = est if out is None else out.unionByName(est)
    return out
