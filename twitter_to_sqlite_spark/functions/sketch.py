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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

#: 2^60 — the md5-derived hash is 15 hex chars = 60 bits.
_HASH_SPACE = float(1 << 60)


def _uniform_hash(col):
    """md5-derived uniform draw in (0, 1]: identical in Spark and
    DuckDB (same 15-hex-char prefix → 60-bit integer → divide)."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10) \
        .cast("long")
    return h / F.lit(_HASH_SPACE)


def _kmv_estimate(agg: DataFrame, k: int, *lead) -> DataFrame:
    """THE one (k−1)/u_(k) estimator select (exact below k), applied
    to an aggregate with columns (n_kept, __umax). Shared by the
    global, grouped, and shard-merged sketches: the three forms must
    stay bit-identical for cross-engine parity — and for the merge-law
    query, whose whole point is that the merged estimate EQUALS the
    direct one."""
    return agg.select(
        *lead,
        F.col("n_kept").cast("long").alias("n_kept"),
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("long"))
        .otherwise(
            F.round(F.lit(float(k - 1)) / F.col("__umax"), 0)
            .cast("long")
        ).alias("kmv_estimate"),
    )


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
    # One scan per column is INTRINSIC here, not a redundant-lineage
    # bug (r8 sweep note): each scan is column-pruned to exactly that
    # column (summed bytes equal a single all-column scan), each
    # distinct shuffles only that column's values, and the k-min is a
    # TakeOrderedAndProject. A fused (column, value)-explode form was
    # measured ~1.7x slower at sf0.1 (it triples the pre-shuffle row
    # stream and forfeits per-scan pruning) and was reverted — see
    # tests/test_sketch.py::test_kmv_fused_equals_per_column_reference
    # which now anchors this form against the same inline reference.
    out = None
    for c in columns:
        vals = (
            df.select(F.col(c).cast("string").alias("__v"))
            .filter(F.col("__v").isNotNull())
            .distinct()
            .select(_uniform_hash(F.col("__v")).alias("__u"))
        )
        kmin = vals.orderBy("__u").limit(k)
        est = _kmv_estimate(
            kmin.agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.max("__u").alias("__umax"),
            ),
            k, F.lit(c).alias("col_name"),
        )
        out = est if out is None else out.unionByName(est)
    return out


def kmv_distinct_by(df: DataFrame, group_col: str, value_col: str,
                    k: int = 256) -> DataFrame:
    """Per-group KMV distinct-count estimate — the grouped member of
    the portable-sketch family (the profile-per-language /
    users-per-segment shape). Same estimator as :func:`kmv_distinct`
    ((k−1)/u_(k), exact below k), but the bottom-k hashes are taken
    PER GROUP via a group-partitioned window ordered by the hash —
    parallel across groups, never a global sort, per-group state ≤ k
    (the grouped_sample_quantiles device). NULL groups/values are
    excluded. Returns (group, n_kept, kmv_estimate).

    Scale: one distinct on (group, value) (partial-agg shuffle), one
    window shuffle on the group; per-group cost is independent of
    group size, and each group's k-min set merges across shards like
    the global sketch.
    """
    h = F.conv(
        F.substring(F.md5(F.col("__v")), 1, 15), 16, 10
    ).cast("long")
    vals = (
        df.filter(F.col(group_col).isNotNull()
                  & F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("__g"),
                F.col(value_col).cast("string").alias("__v"))
        .distinct()
        .select("__g", h.alias("__h"))
    )
    kmin = vals.withColumn(
        "__rn", F.row_number().over(Window.partitionBy("__g").orderBy("__h"))
    ).filter(F.col("__rn") <= k)
    agg = kmin.groupBy("__g").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max(F.col("__h") / F.lit(_HASH_SPACE)).alias("__umax"),
    )
    return _kmv_estimate(agg, k, F.col("__g").alias(group_col))


def _min_hashes(df: DataFrame, col: str, k: int) -> DataFrame:
    """k smallest 60-bit hashes of the column's distinct values:
    (__h long). TakeOrderedAndProject — k rows per partition map-side."""
    return (
        df.select(F.col(col).cast("string").alias("__v"))
        .filter(F.col("__v").isNotNull())
        .distinct()
        .select(
            F.conv(F.substring(F.md5(F.col("__v")), 1, 15), 16, 10)
            .cast("long").alias("__h")
        )
        .orderBy("__h")
        .limit(k)
    )


def kmv_merge_distinct(dfs: list[DataFrame], columns: list[str],
                       k: int = 256) -> DataFrame:
    """Distinct-count estimate of the UNION of several frames computed
    from their per-shard k-min sets — the 1000-executor merge path: a
    fleet profiles its shards independently, then the coordinator
    merges k·shards hashes instead of re-scanning any data. KMV
    mergeability makes the merge EXACT: the k smallest hashes of a
    union are the union of the shards' k-min sets re-truncated to k,
    so the merged estimate equals running :func:`kmv_distinct` on the
    concatenated data bit-for-bit (the oracle pairing exploits exactly
    that — the Spark side merges shard sketches, the oracle sketches
    the whole).

    Returns the kmv_distinct shape: (col_name, n_kept, kmv_estimate).
    Scale: one distinct + TakeOrderedAndProject per (shard, column);
    the merge itself touches ≤ k·|shards| rows.
    """
    out = None
    for c in columns:
        u = None
        for df in dfs:
            m = _min_hashes(df, c, k)
            u = m if u is None else u.unionByName(m)
        kmin = u.distinct().orderBy("__h").limit(k)
        est = _kmv_estimate(
            kmin.agg(
                F.count(F.lit(1)).alias("n_kept"),
                F.max(F.col("__h") / F.lit(_HASH_SPACE))
                .alias("__umax"),
            ),
            k, F.lit(c).alias("col_name"),
        )
        out = est if out is None else out.unionByName(est)
    return out


def kmv_overlap(df_a: DataFrame, df_b: DataFrame,
                a_col: str, b_col: str, k: int = 256) -> DataFrame:
    """KMV Jaccard / intersection estimate between two key sets — the
    screening step before a full decontamination join: two sketches of
    k hashes each answer "how contaminated is corpus A by corpus B"
    without ever joining the corpora.

    K-min of the union is the union of the k-mins re-truncated to k
    (KMV mergeability); the fraction of those union-k-min hashes
    present in BOTH sides estimates Jaccard (Bar-Yossef et al. 2002),
    and × the union estimate gives the intersection size. Below k
    everything is exact. Returns one row:
    (n_kept, n_both, jaccard_est, union_est, intersect_est).

    Scale: each side is one distinct + TakeOrderedAndProject; the
    combine works on ≤ 2k rows regardless of corpus size.
    """
    ka = _min_hashes(df_a, a_col, k).localCheckpoint(eager=False)
    kb = _min_hashes(df_b, b_col, k).localCheckpoint(eager=False)
    union_kmin = ka.unionByName(kb).distinct().orderBy("__h").limit(k)
    flagged = (
        union_kmin
        .join(ka.withColumn("__ina", F.lit(1)), "__h", "left")
        .join(kb.withColumn("__inb", F.lit(1)), "__h", "left")
    )
    agg = flagged.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum((F.col("__ina").isNotNull() & F.col("__inb").isNotNull())
              .cast("long")).alias("n_both"),
        F.max(F.col("__h") / F.lit(_HASH_SPACE)).alias("__umax"),
    )
    jacc = F.col("n_both") / F.greatest(F.col("n_kept"), F.lit(1))
    union_raw = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) / F.col("__umax"))
    return agg.select(
        F.col("n_kept").cast("long").alias("n_kept"),
        F.col("n_both").cast("long").alias("n_both"),
        F.round(jacc, 4).alias("jaccard_est"),
        F.round(union_raw, 0).cast("long").alias("union_est"),
        F.round(jacc * union_raw, 0).cast("long").alias("intersect_est"),
    )


def sample_quantiles(df: DataFrame, value_col: str, key_col: str,
                     qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
                     k: int = 1024) -> DataFrame:
    """Approximate quantiles from a DETERMINISTIC bottom-k hash sample
    — the quantile member of the portable-sketch family (cardinality:
    kmv_distinct, overlap: kmv_overlap).

    Native quantile sketches (t-digest, GK, KLL) are
    merge-order-dependent and engine-specific, so they can never
    oracle-match. Sampling the k rows with the smallest portable hash
    of ``key_col`` gives a uniform random sample that is a pure
    function of the key set: same rows in any engine, any partitioning,
    any run. Quantile estimates are then ORDER STATISTICS of the
    sample — element at 1-based index floor(q·(n−1))+1 of the sorted
    sample, no interpolation — so the estimate is an actual data value
    and bit-identical across engines. Sampling error is the usual
    O(1/√k) in rank; when n ≤ k the sample is the population and the
    order statistics are exact.

    Returns one row per q: (q, n_sample, est). Scale: one
    TakeOrderedAndProject (k rows per partition map-side, k total —
    never a full sort), then an O(k log k) fold on one row; the
    bottom-k sets of two shards merge by union + re-truncate, the
    same map-side-combinable shape as KMV.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    sample = (
        df.filter(F.col(value_col).isNotNull()
                  & F.col(key_col).isNotNull())
        .select(F.col(value_col).alias("__val"), h.alias("__h"))
        # (__h, __val): duplicate keys hash identically, so a bare
        # __h order would resolve ties at the k boundary
        # nondeterministically across runs/engines — the explicit
        # value tie column makes the sample a pure function of the
        # data (same device as grouped_sample_quantiles).
        .orderBy("__h", "__val")
        .limit(k)
    )
    agg = sample.agg(
        F.sort_array(F.collect_list("__val")).alias("__vs"),
        F.count(F.lit(1)).alias("n_sample"),
    )
    rows = agg.select(
        "n_sample",
        F.explode(
            F.array(*[F.lit(float(q)).alias("q") for q in qs])
        ).alias("q"),
        F.col("__vs"),
    )
    idx = (F.floor(F.col("q") * (F.col("n_sample") - 1)) + 1).cast("int")
    return rows.filter(F.col("n_sample") > 0).select(
        "q", "n_sample", F.element_at("__vs", idx).alias("est")
    )


def sample_topk(df: DataFrame, value_col: str,
                k: int = 512, top: int = 20) -> DataFrame:
    """Deterministic heavy-hitters sketch — the top-k-frequency member
    of the portable-sketch family (cardinality: kmv_distinct, overlap:
    kmv_overlap, quantiles: sample_quantiles).

    SpaceSaving/Misra-Gries summaries are merge-order-dependent and
    engine-specific, so they can never oracle-match. The portable
    device is the same bottom-k hash sample: take the ``k`` DISTINCT
    values with the smallest portable hash (a uniform domain sample
    that is a pure function of the value set — same rows in any
    engine, any partitioning), count ONLY those values exactly via a
    broadcast semi-join, and report the ``top`` most frequent of the
    sample. A heavy hitter is included with probability k/D (exact
    coverage when the domain has ≤ k values — the hot-key-detection
    regime); the reported counts are exact, never estimates.

    Returns (value, n_occ, rank) — ``value`` cast to string so the
    sketch is type-generic like kmv_distinct.

    Scale: one distinct + TakeOrderedAndProject for the sample (k rows
    per partition map-side), then a broadcast semi-join that prunes
    the stream BEFORE the count — the aggregate holds ≤ k groups
    regardless of domain size (a full top-k like vocab_stats keeps
    per-value state for the whole domain). Mergeable like the others:
    shard samples union + re-truncate to k, and the exact per-value
    counts of surviving values add.
    """
    vals = (
        df.select(F.col(value_col).cast("string").alias("value"))
        .filter(F.col("value").isNotNull())
    )
    h = F.conv(F.substring(F.md5(F.col("value")), 1, 15), 16, 10) \
        .cast("long")
    samp = (
        vals.distinct()
        .select("value", h.alias("__h"))
        # hash of a DISTINCT value is unique short of md5 collision,
        # but the explicit value tie column keeps the repo convention
        .orderBy("__h", "value")
        .limit(k)
    )
    counted = (
        vals.join(F.broadcast(samp.select("value")), "value", "left_semi")
        .groupBy("value")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    top_rows = counted.orderBy(F.col("n_occ").desc(), "value").limit(top)
    w = Window.orderBy(F.col("n_occ").desc(), F.col("value"))
    return top_rows.withColumn("rank", F.row_number().over(w)).select(
        "value", "n_occ", "rank"
    )


def grouped_sample_quantiles(df: DataFrame, group_col: str,
                             value_col: str, key_col: str,
                             qs: tuple[float, ...] = (0.25, 0.5, 0.9),
                             k: int = 256) -> DataFrame:
    """Per-group form of :func:`sample_quantiles`: a deterministic
    bottom-k portable-hash sample PER GROUP (row_number over a
    group-partitioned window ordered by the hash — parallel across
    groups, never a global sort), then order statistics of each
    group's sorted sample. Returns (group, q, n_sample, est).

    Scale: the window costs one shuffle on the group key; each
    group's downstream state is ≤ k values. For low-cardinality
    groups with huge membership this is the profile-per-language /
    per-source shape: the sample bound makes the per-group quantile
    cost independent of group size.
    """
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 15), 16, 10
    ).cast("long")
    samp = (
        df.filter(F.col(value_col).isNotNull()
                  & F.col(key_col).isNotNull()
                  & F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("__g"),
                F.col(value_col).alias("__val"), h.alias("__h"))
        .withColumn("__rn", F.row_number().over(
            Window.partitionBy("__g").orderBy("__h", "__val")))
        .filter(F.col("__rn") <= k)
    )
    agg = samp.groupBy("__g").agg(
        F.sort_array(F.collect_list("__val")).alias("__vs"),
        F.count(F.lit(1)).alias("n_sample"),
    )
    rows = agg.select(
        "__g", "n_sample", "__vs",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    idx = (F.floor(F.col("q") * (F.col("n_sample") - 1)) + 1).cast("int")
    return rows.select(
        F.col("__g").alias(group_col), "q", "n_sample",
        F.element_at("__vs", idx).alias("est"),
    )


def join_size_estimate(a: DataFrame, b: DataFrame, key_col: str,
                       k: int = 256) -> DataFrame:
    """Sketch-driven equi-join cardinality estimate — the number a
    planner needs BEFORE running a 100 TB join (pick broadcast vs
    shuffle vs salted, size shuffle partitions) without paying for it.

    |A ⋈ B| = Σ_key cA(key)·cB(key); estimated from the deterministic
    bottom-k portable-hash sample of the DISTINCT key domain of A ∪ B
    (the sample_topk device): exact per-key counts for the ≤ k sampled
    keys (broadcast joins — both sides only scan), scaled by D/k where
    D is the KMV domain estimate read off the SAME k-min set. Sampling
    the key DOMAIN (not rows) makes the estimator unbiased under skew:
    a hot key contributes its exact cA·cB whenever sampled, and the
    hash picks keys, not rows, so hot keys are not over-represented.

    Deterministic by construction (hash sample + exact counts + one
    rounded scale), so it cross-engine oracle-matches — unlike a
    row-sampling estimator. Returns ONE row:
    (n_sampled, d_est, est_join_rows).

    Scale: one distinct on the key (partial-agg shuffle), one
    TakeOrderedAndProject (k rows), two broadcast-semi count aggs.
    Estimator state is k keys at any corpus size.
    """
    dom = (
        a.select(F.col(key_col).alias("__k"))
        .unionByName(b.select(F.col(key_col).alias("__k")))
        .filter(F.col("__k").isNotNull())
        .distinct()
        .select("__k", _uniform_hash(F.col("__k")).alias("__u"))
    )
    # the k-row sample feeds three consumers (two count joins + the
    # final left-join spine); materialize it once so the domain
    # distinct + TakeOrderedAndProject — the dominant shuffle — runs
    # once per action, not per consumer
    sample = dom.orderBy("__u").limit(k).localCheckpoint(eager=False)

    def side_counts(df, alias):
        return (
            df.select(F.col(key_col).alias("__k"))
            .join(F.broadcast(sample.select("__k")), "__k")
            .groupBy("__k").agg(F.count(F.lit(1)).alias(alias))
        )

    per_key = (
        sample
        .join(side_counts(a, "__ca"), "__k", "left")
        .join(side_counts(b, "__cb"), "__k", "left")
        .select(
            "__u",
            (F.coalesce("__ca", F.lit(0))
             * F.coalesce("__cb", F.lit(0))).alias("__prod"),
        )
    )
    agg = per_key.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.max("__u").alias("__umax"),
        F.sum("__prod").alias("__sp"),
    )
    # d_est comes from THE shared estimator select (_kmv_estimate) —
    # the (k−1)/u_(k), exact-below-k expression must stay bit-identical
    # across every sketch form for cross-engine parity
    est = _kmv_estimate(agg, k, F.col("__sp").alias("__sp"))
    return est.select(
        F.col("n_kept").cast("long").alias("n_sampled"),
        F.col("kmv_estimate").alias("d_est"),
        F.round(
            F.col("__sp").cast("double")
            * F.col("kmv_estimate").cast("double")
            / F.col("n_kept"), 0).cast("long").alias("est_join_rows"),
    )
