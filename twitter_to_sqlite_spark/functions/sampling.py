"""Deterministic corpus-sampling operators for training-data curation.

Subsampling 100 TB down to a training mix must be REPRODUCIBLE — the
same rows on every run, every engine, every retry of a failed task —
so these operators hash row keys (portable 60-bit md5 prefix, exact in
Spark and the DuckDB oracle alike) instead of `rand()`, whose draw
order is partition- and retry-dependent. Pure column expressions:
whole-stage codegen, no shuffle — a sample is a filter pushed onto the
scan, not a job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_hash(key_col: Column, salt: str = "") -> Column:
    """Portable 60-bit hash: first 15 md5 hex digits as a long —
    identical in every engine with md5 (DuckDB twin:
    ('0x' || substring(md5(x), 1, 15))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 15),
        16, 10,
    ).cast("long")


def hash_sample(df: DataFrame, denom: int, key_col: str,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ~1/denom of rows: hash(key) % denom == 0.

    `salt` decorrelates independent samples over the same keys (two
    different salts give two independent ~1/denom subsets).
    """
    return df.filter(_key_hash(F.col(key_col), salt) % denom == 0)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, int], key_col: str,
                      default_denom: int = 1,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic subsampling: stratum s keeps
    ~1/rates[s] of its rows (denominator 1 = keep all); strata not
    listed use `default_denom`.

    The corpus-rebalancing primitive (downweight a dominant language /
    source / domain in the training mix). One CASE expression over the
    stratum column — no shuffle, no per-stratum scans; the filter
    composes with partition pruning when `strata_col` is a partition
    key.
    """
    denom = None
    for value, d in sorted(rates.items()):
        cond = F.col(strata_col) == F.lit(value)
        denom = F.when(cond, F.lit(int(d))) if denom is None \
            else denom.when(cond, F.lit(int(d)))
    denom = F.lit(int(default_denom)) if denom is None \
        else denom.otherwise(F.lit(int(default_denom)))
    return df.filter(_key_hash(F.col(key_col), salt) % denom == 0)


def write_training_shards(df: DataFrame, path: str, n_shards: int,
                          key_col: str, order_col: str | None = None,
                          salt: str = "") -> None:
    """Write the curated corpus as `n_shards` deterministic shards:
    shard = hash(key) % n_shards (the same portable md5 hash as the
    samplers — NOT a random split), optionally sorted within each
    shard by `order_col` (curriculum / length-bucketing order).

    Determinism is the contract a training run needs: re-running the
    pipeline reproduces byte-wise the same shard membership, so a
    resumed / re-sharded job never changes what example lands where.
    One shuffle (range repartition on the shard id — hash-of-shard-id
    would collide several of the n_shards values into one task and
    leave others idle), then a within-partition sort — no global sort,
    no driver involvement.
    """
    shard = (_key_hash(F.col(key_col), salt) % n_shards).cast("int")
    out = df.withColumn("shard", shard) \
        .repartitionByRange(n_shards, F.col("shard"))
    if order_col is not None:
        out = out.sortWithinPartitions("shard", order_col)
    out.write.mode("overwrite").partitionBy("shard").parquet(path)


def training_order(df: DataFrame, key_col: str, n_shards: int,
                   salt: str = "", order_salt: str = "ord",
                   carry: list[str] | None = None) -> DataFrame:
    """Deterministic global training order: (key, shard, position) —
    the reproducible shuffle a dataloader consumes, the missing last
    step after write_training_shards proves membership. shard =
    hash(key) % n_shards (same portable md5 as every sampler); within
    a shard, examples are ranked by an INDEPENDENTLY-salted hash of
    the key (tie-broken by the key itself), so the reading order is a
    pure function of the data: re-running the pipeline, changing the
    partition count, or re-sharding upstream never changes which
    example is read when — the property that makes a resumed training
    run exactly reproducible.

    ``carry`` names extra input columns to keep in the output (after
    ``position``): the prefix sum materializes its input once anyway
    (localCheckpoint), so carrying a column through is free, while the
    caller's alternative — joining the output back to the input on
    ``key_col`` — re-executes the whole upstream pipeline a second
    time AND pays a corpus-sized join.

    Scale: per-shard rank goes through the two-phase range-split
    prefix sum (operators/relational.py::_range_split_prefix), NOT a
    window partitioned by shard — with few shards a window would sort
    corpus/n_shards rows in single tasks; the prefix sum bounds every
    task at corpus/parallelism and moves only |ranges|x|shards| counts
    through the driver.
    """
    from twitter_to_sqlite_spark.operators.relational import \
        _range_split_prefix

    carry = carry or []
    keyed = df.select(
        F.col(key_col),
        (_key_hash(F.col(key_col), salt) % n_shards).cast("int")
        .alias("shard"),
        _key_hash(F.col(key_col), order_salt).alias("__ord"),
        *[F.col(c) for c in carry],
    )
    ranked = _range_split_prefix(
        keyed, "__ord", tie_cols=[key_col], group_cols=["shard"])
    return ranked.select(
        key_col, "shard",
        (F.col("__off") + F.col("__lval") - 1).cast("long")
        .alias("position"),
        *carry,
    )


def curriculum_order(df: DataFrame, key_col: str, bucket_col: str,
                     n_shards: int, salt: str = "",
                     order_salt: str = "ord") -> DataFrame:
    """Curriculum training order: like :func:`training_order`, but
    examples are staged by a difficulty bucket FIRST — within each
    shard, position ranks by (bucket ASC, salted-hash, key), so a
    dataloader walks easy buckets before hard ones while the order
    inside a bucket stays an unbiased deterministic shuffle (the
    standard curriculum-learning layout: staged difficulty, shuffled
    within stage). Still a pure function of the data. Returns
    (key, shard, bucket, position).

    Scale: per-(shard, bucket) local ranks via the two-phase
    range-split prefix sum; bucket base offsets come from the
    |shards|x|buckets| size table — bounded by design parameters —
    cumulated over bucket order and broadcast back. No task ever
    sorts a shard, let alone the corpus.
    """
    from pyspark.sql import Window

    from twitter_to_sqlite_spark.operators.relational import \
        _range_split_prefix

    keyed = df.select(
        F.col(key_col),
        F.col(bucket_col).cast("int").alias("__bkt"),
        (_key_hash(F.col(key_col), salt) % n_shards).cast("int")
        .alias("shard"),
        _key_hash(F.col(key_col), order_salt).alias("__ord"),
    )
    ranked = _range_split_prefix(
        keyed, "__ord", tie_cols=[key_col], group_cols=["shard", "__bkt"],
        with_totals=True)
    sizes = ranked.select("shard", "__bkt", "__n").distinct()
    wb = (
        Window.partitionBy("shard").orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = F.broadcast(sizes.withColumn(
        "__boff", F.coalesce(F.sum("__n").over(wb),
                             F.lit(0).cast("long"))).drop("__n"))
    out = ranked.join(offs, ["shard", "__bkt"])
    return out.select(
        key_col, "shard", F.col("__bkt").alias("bucket"),
        (F.col("__boff") + F.col("__off") + F.col("__lval") - 1)
        .cast("long").alias("position"),
    )


def mixture_order(df: DataFrame, key_col: str, strata_col: str,
                  salt: str = "", order_salt: str = "ord") -> DataFrame:
    """Proportional stratified interleave: a deterministic global
    reading order in which every stratum (language, source) advances
    at a rate proportional to its size — so any contiguous batch of
    the order is mixed like the corpus, never a run of one source
    (the gradient-diversity property plain concatenation destroys and
    training_order only gives in expectation). Within a stratum the
    order is the salted-hash shuffle; globally, documents sort by
    per-stratum PROGRESS (rank+1)/|stratum| — exact in doubles for any
    realistic stratum size — with a (progress, stratum, key)
    tie-break. A pure function of the data. Returns
    (key, stratum, position).

    Scale: two chained range-split prefix sums (per-stratum rank,
    then the global rank over progress); bounded offset frames
    broadcast back, no task ever sorts the corpus.
    """
    from twitter_to_sqlite_spark.operators.relational import \
        _range_split_prefix

    keyed = df.select(
        F.col(key_col),
        F.col(strata_col).alias("__st"),
        _key_hash(F.col(key_col), order_salt).alias("__ord"),
    )
    ranked = _range_split_prefix(
        keyed, "__ord", tie_cols=[key_col], group_cols=["__st"],
        with_totals=True)
    staged = ranked.select(
        key_col, "__st",
        ((F.col("__off") + F.col("__lval")).cast("double")
         / F.col("__n").cast("double")).alias("__prog"),
    )
    g = _range_split_prefix(
        staged, "__prog", tie_cols=["__st", key_col], group_cols=[])
    return g.select(
        key_col,
        F.col("__st").alias(strata_col),
        (F.col("__off") + F.col("__lval") - 1).cast("long")
        .alias("position"),
    )


def sequence_pack(df: DataFrame, key_col: str, token_col: str,
                  n_shards: int, seq_len: int,
                  salt: str = "", order_salt: str = "ord") -> DataFrame:
    """Concat-and-chunk sequence packing: place every document in the
    deterministic training order (:func:`training_order`'s shard +
    salted-hash rank) and chunk the concatenated token stream into
    fixed ``seq_len`` sequences — the GPT-style packing step that maps
    each doc to its (start_seq, end_seq, offset_in_seq) so a
    dataloader can materialize any sequence without replaying the
    corpus. Zero-token documents are skipped (they occupy no stream
    positions). Returns (key, shard, n_tokens, start_seq, end_seq,
    offset_in_seq).

    Scale: the per-shard running token total goes through the
    two-phase grouped prefix sum (grouped_cumsum_dist) — with few
    shards a window would sort corpus/n_shards rows in one task.
    Sequence ids use integer DIV on the exact BIGINT cumsum (not
    float floor, which loses exactness past 2^53 total tokens).
    """
    from twitter_to_sqlite_spark.operators.relational import \
        grouped_cumsum_dist

    keyed = df.filter(F.col(token_col) > 0).select(
        F.col(key_col),
        (_key_hash(F.col(key_col), salt) % n_shards).cast("int")
        .alias("shard"),
        _key_hash(F.col(key_col), order_salt).alias("__ord"),
        F.col(token_col).cast("long").alias("n_tokens"),
    )
    c = grouped_cumsum_dist(keyed, "shard", "__ord", key_col,
                            "n_tokens", out_col="__cum")
    return c.select(
        key_col, "shard", "n_tokens",
        F.expr(f"CAST((__cum - n_tokens) DIV {seq_len} AS BIGINT)")
        .alias("start_seq"),
        F.expr(f"CAST((__cum - 1) DIV {seq_len} AS BIGINT)")
        .alias("end_seq"),
        F.expr(f"CAST((__cum - n_tokens) % {seq_len} AS BIGINT)")
        .alias("offset_in_seq"),
    )


def mix_corpora(df: DataFrame, strata_col: str, weights: dict[str, float],
                key_col: str, token_col: str, salt: str = "",
                distributed: bool = False) -> DataFrame:
    """Weighted corpus-mixture planning: select the maximal training
    mix whose per-stratum token counts follow ``weights`` exactly.

    The Pile/Dolma-style mixing step: given target proportions per
    source (weights need not sum to 1 — only ratios matter), find the
    largest total budget B such that every stratum s can contribute
    w_s·B tokens, i.e. B = min_s(T_s / w_s), then cut each stratum at
    its budget in deterministic hash order (same md5 key as
    :func:`hash_sample`, so the mix is bit-identical across runs,
    engines, and task retries). Strata not in ``weights`` are excluded
    (weight 0).

    Plan: one map-side-combined agg for the per-stratum totals (rows =
    #strata), a scalar min, a broadcast join of the tiny budget table
    back onto the corpus, and one per-stratum cumulative-sum window —
    the only full shuffle is the window's hash partition by stratum.
    With few huge strata that window skews; ``distributed=True``
    routes the cumsum through the two-phase grouped prefix sum
    (operators/relational.py::grouped_cumsum_dist) so no task ever
    sorts a whole stratum — same answer (token counts are integral,
    offsets add exactly), window form kept as the default because it
    is one job instead of three at bench scale.
    """
    from pyspark.sql import Window

    w_expr = None
    for value, wt in sorted(weights.items()):
        cond = F.col(strata_col) == F.lit(value)
        lit = F.lit(float(wt))
        w_expr = F.when(cond, lit) if w_expr is None else w_expr.when(cond, lit)
    d = df.withColumn("__w", w_expr.otherwise(F.lit(None).cast("double"))) \
          .filter(F.col("__w").isNotNull())
    totals = d.groupBy(strata_col, "__w").agg(
        F.sum(F.col(token_col)).alias("__tot"))
    scale = totals.select(
        F.min(F.col("__tot").cast("double") / F.col("__w")).alias("__scale"))
    budgets = totals.crossJoin(F.broadcast(scale)).select(
        strata_col, (F.col("__w") * F.col("__scale")).alias("__budget"))
    wnd = (
        Window.partitionBy(strata_col)
        .orderBy("__hk", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hashed = d.withColumn("__hk", _key_hash(F.col(key_col), salt))
    if distributed:
        from twitter_to_sqlite_spark.operators.relational import (
            grouped_cumsum_dist,
        )

        ranked = grouped_cumsum_dist(
            hashed, strata_col, "__hk", key_col, token_col,
            out_col="cum_tokens")
    else:
        ranked = hashed.withColumn(
            "cum_tokens", F.sum(F.col(token_col)).over(wnd))
    return (
        ranked.join(F.broadcast(budgets), strata_col)
        .filter(F.col("cum_tokens") <= F.col("__budget"))
        .select(
            key_col, strata_col, token_col,
            F.col("cum_tokens").cast("long").alias("cum_tokens"),
            F.round(F.col("__budget"), 4).alias("budget"),
        )
    )


def assign_splits(df: DataFrame, splits: dict[str, int], key_col: str,
                  salt: str = "") -> DataFrame:
    """Deterministic dataset-split assignment (train/val/test): bucket
    = hash(key) mod Σweights, contiguous bucket ranges per split in
    the dict's insertion order.

    Hash-based so membership is a pure function of the row key —
    stable under reruns, engine changes, task retries, and corpus
    growth (a new row never moves an old row's split), which is the
    property eval-set hygiene depends on. One CASE expression over the
    shared md5 key: no shuffle, composes with any scan.
    """
    total = sum(splits.values())
    bucket = _key_hash(F.col(key_col), salt) % total
    expr = None
    lo = 0
    for name, wt in splits.items():
        cond = (bucket >= lo) & (bucket < lo + wt)
        lit = F.lit(name)
        expr = F.when(cond, lit) if expr is None else expr.when(cond, lit)
        lo += wt
    return df.withColumn("split", expr)


def temperature_mixture(df: DataFrame, strata_col: str,
                        token_col: str, alpha: float = 0.3) -> DataFrame:
    """Temperature-smoothed corpus mixture weights (the multilingual
    sampling rule of mBERT/XLM-R/mT5: q_s ∝ p_s^α): per stratum the
    raw token share p_s, the smoothed share q_s = p_s^α / Σ p_t^α, and
    the implied up/down-sampling factor q_s/p_s. α<1 lifts small
    strata (low-resource languages) and shrinks dominant ones; α=1 is
    proportional sampling, α=0 uniform.

    Everything after the one groupBy shuffle is arithmetic over
    |strata| rows — the totals and the partition function Z join back
    as broadcast scalars, so the plan is one partial-agg pass over the
    corpus regardless of scale.
    """
    # Lazy checkpoint of the bounded |strata|-row aggregate: the
    # totals, the partition function AND the final select all hang
    # off `per` — unpinned, the corpus tokenize+aggregate pass runs
    # three times (the dsir_logweights convention).
    per = df.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(token_col)).cast("long").alias("n_tokens"),
    ).localCheckpoint(eager=False)
    tot = per.agg(F.sum("n_tokens").alias("__tot"))
    withp = per.crossJoin(F.broadcast(tot)).withColumn(
        "__p", F.col("n_tokens").cast("double") / F.col("__tot").cast("double")
    )
    z = withp.agg(F.sum(F.pow(F.col("__p"), F.lit(alpha))).alias("__z"))
    q = F.pow(F.col("__p"), F.lit(alpha)) / F.col("__z")
    return (
        withp.crossJoin(F.broadcast(z))
        .select(
            strata_col, "n_docs", "n_tokens",
            F.round(F.col("__p"), 6).alias("p_raw"),
            F.round(q, 6).alias("p_smoothed"),
            F.round(q / F.col("__p"), 4).alias("upsample"),
        )
    )


def importance_sample(df: DataFrame, prob_col: str, key_col: str,
                      salt: str = "", resolution: int = 1_000_000) -> DataFrame:
    """Per-row weighted acceptance sampling: keep each row with its own
    probability ``prob_col`` (0..1), deterministically.

    The soft-selection step after a quality scorer: instead of a hard
    quality gate, a document survives with probability equal to its
    score, preserving diversity while tilting the corpus toward
    quality. The accept draw is hash(key) scaled to [0, 1) at fixed
    resolution — a pure function of the row key, so membership is
    reproducible across runs, engines, and retries (rand() is none of
    those), and two different salts give independent draws. One narrow
    filter; composes with any scan.
    """
    u = (_key_hash(F.col(key_col), salt) % resolution).cast("double") \
        / F.lit(float(resolution))
    return df.filter(u < F.col(prob_col))


def weighted_sample(df: DataFrame, k: int, weight_col: str, key_col: str,
                    salt: str = "", resolution: int = 1_000_000) -> DataFrame:
    """Fixed-size weighted sampling WITHOUT replacement (Efraimidis &
    Spirakis 2006 A-ES): each row draws u = hash(key) ∈ (0,1] and is
    keyed by u^(1/w); the k largest keys are the sample. Inclusion
    probability is proportional to weight, the draw is a pure function
    of the row key (reproducible across runs/engines/retries), and —
    unlike acceptance sampling (importance_sample) — the output size
    is exactly k.

    The sort key is rounded to 12 decimals before ranking (ties broken
    by the row key): pow/ln differ by ≤1 ulp across libm
    implementations, and rounding absorbs that far below the rounding
    granularity — the same device the classifier/PageRank trajectories
    use. Returns the sampled rows + the sample key (`__sk`).

    Scale: one narrow projection + TakeOrderedAndProject top-k — k
    rows per partition map-side, never a global sort; composes with
    any scan. Weights must be > 0 (rows with NULL/non-positive weight
    are excluded, matching the estimator's domain).
    """
    sk = _aes_key(weight_col, key_col, salt, resolution)
    return (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__sk", sk)
        .orderBy(F.col("__sk").desc(), F.col(key_col))
        .limit(k)
    )


def _aes_key(weight_col: str, key_col: str, salt: str,
             resolution: int):
    """THE one A-ES sample-key expression (u^(1/w) with the rounded-12
    libm absorption), shared by the global and grouped samplers so the
    draw can never fork — the generated grouped oracle reuses the
    global form's keyed CTE on the assumption both Spark forms draw
    identically."""
    u = (
        (_key_hash(F.col(key_col), salt) % resolution) + F.lit(1.0)
    ).cast("double") / F.lit(float(resolution))
    return F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 12)


def weighted_sample_by(df: DataFrame, group_col: str, k: int,
                       weight_col: str, key_col: str, salt: str = "",
                       resolution: int = 1_000_000) -> DataFrame:
    """Per-group fixed-size weighted sampling without replacement:
    the :func:`weighted_sample` A-ES draw, ranked PER GROUP by a
    group-partitioned window instead of a global top-k — exactly k
    rows from every group (fewer only when the group is smaller), the
    stratified form of reproducible quality-tilted selection (k
    best-drawn docs per language/source).

    Scale: the same narrow projection, then one shuffle on the group
    key; per-group downstream state is ≤ k (the
    grouped_sample_quantiles device). Draws stay pure functions of the
    row key, so the sample per group is engine/run/retry-stable.
    NULL groups and non-positive weights are excluded.
    """
    from pyspark.sql import Window

    sk = _aes_key(weight_col, key_col, salt, resolution)
    w = Window.partitionBy(group_col).orderBy(
        F.col("__sk").desc(), F.col(key_col))
    return (
        df.filter((F.col(weight_col) > 0)
                  & F.col(group_col).isNotNull())
        .withColumn("__sk", sk)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def domain_caps(df: DataFrame, domain_col: str, cap: int,
                key_col: str, salt: str = "",
                slices: int = 1024) -> DataFrame:
    """Per-domain document quota (RefinedWeb §3's "max N docs per
    domain"): keep the ``cap`` docs per domain ranked first by the
    deterministic salted hash of the row key — the standard guard
    against one crawler trap / mirror farm owning the training
    mixture. The selection is a pure function of (key, salt): stable
    across runs, engines, and retries, and uniform within each domain.

    Scale — the hot-domain problem is the whole point, so the obvious
    per-domain ``row_number() <= cap`` window (which SORTS every row
    of a 10⁹-doc trap domain in one partition) is replaced by an
    equidepth hash-slice refinement, exact and bounded:

    1. Bucket rows by the top bits of the 60-bit hash into ``slices``
       equal hash-range slices; aggregate (domain, slice) counts — a
       frame bounded by |domains| x slices, with full map-side combine.
    2. A running count over each domain's <= ``slices`` rows finds the
       BOUNDARY slice where the cumulative count crosses ``cap``.
       Slices wholly below it pass outright; slices past it drop.
    3. Only boundary-slice rows — ~n_domain/slices of the domain, 10⁶
       of 10⁹ at the default — enter the exact (hash, key) rank
       window, offset by the count below.

    Every row's final ``domain_rank`` equals the naive per-domain
    row_number over (hash, key) — the refinement changes the plan,
    never the answer (law-tested against the brute-force window).
    Under-cap domains never touch a sort at all. NULL domains/keys are
    excluded. Returns the kept rows + their ``domain_rank``.
    """
    from pyspark.sql import Window

    width = (1 << 60) // slices  # _key_hash is 15 hex digits = 60 bits
    d = (
        df.filter(F.col(domain_col).isNotNull()
                  & F.col(key_col).isNotNull())
        .withColumn("__h", _key_hash(F.col(key_col), salt))
        .withColumn("__qb", F.floor(F.col("__h") / F.lit(width))
                    .cast("int"))
    )
    counts = d.groupBy(domain_col, "__qb").agg(
        F.count(F.lit(1)).alias("__n"))
    wc = (Window.partitionBy(domain_col).orderBy("__qb")
          .rowsBetween(Window.unboundedPreceding, -1))
    marked = (
        counts
        .withColumn("__before",
                    F.coalesce(F.sum("__n").over(wc), F.lit(0)))
        .select(
            domain_col, "__qb", "__before",
            (F.col("__before") + F.col("__n") <= cap).alias("__all"),
            ((F.col("__before") < cap)
             & (F.col("__before") + F.col("__n") > cap))
            .alias("__bnd"),
        )
        .filter(F.col("__all") | F.col("__bnd"))
    )
    j = d.join(marked, [domain_col, "__qb"])
    # rank within the slice, offset by the exact count below it —
    # groups are (domain, slice): a hot domain spreads across slices
    wq = Window.partitionBy(domain_col, "__qb").orderBy("__h", key_col)
    ranked = j.withColumn(
        "domain_rank",
        (F.col("__before") + F.row_number().over(wq)).cast("long"))
    return (
        ranked
        .filter(F.col("__all") | (F.col("domain_rank") <= cap))
        .drop("__h", "__qb", "__before", "__all", "__bnd")
    )


def distribution_match_rates(incoming: DataFrame, target: DataFrame,
                             value_col: str, n_bins: int = 10,
                             resolution: int = 1_000_000,
                             hist: DataFrame | None = None) -> DataFrame:
    """Per-bin acceptance rates that reshape `incoming`'s [0,1]-score
    distribution toward `target`'s (the importance-clipped matcher:
    rate(b) = min(1, target_share(b) / incoming_share(b)) — bins the
    incoming corpus over-represents are thinned, under-represented
    bins keep everything; no upsampling). Rates are EXACT integer
    arithmetic at ppm grain — rate_ppm = min(res, res·t_b·N div
    (T·n_b)) — so the plan is engine-reproducible with no float
    division anywhere. Returns the bounded n_bins-row frame
    (bin, n_target, n_in, rate_ppm). Products stay in BIGINT: fine to
    ~10⁹ rows per side at ppm grain; lift the expression to
    DECIMAL(38,0) beyond that.

    Scale: two histogram aggregates (full map-side combine) + 1-row
    totals broadcast onto the n_bins-row spine — nothing here scales
    with the corpus.

    ``hist`` injects a prebuilt spine-coalesced histogram frame
    (bin, n_target, n_in — exactly the frame this function builds
    from its first two arguments; the caller should have checkpointed
    it) so a pipeline that already maintains the histograms pays only
    the bounded rate tail; ``incoming``/``target`` are ignored then.
    """
    if hist is not None:
        g = hist
    else:
        def bins(df):
            b = F.least(F.floor(F.col(value_col) * n_bins).cast("int"),
                        F.lit(n_bins - 1))
            return (df.filter(F.col(value_col).isNotNull())
                    .groupBy(b.alias("bin"))
                    .agg(F.count(F.lit(1)).alias("n")))

        spark = incoming.sparkSession
        spine = spark.range(n_bins).select(
            F.col("id").cast("int").alias("bin"))
        t = bins(target).withColumnRenamed("n", "__t")
        c = bins(incoming).withColumnRenamed("n", "__n")
        # Lazy checkpoint of the bounded n_bins-row frame: `tot` below
        # re-derives g, and Catalyst does not reuse common subplans —
        # an unpinned g re-runs BOTH histogram scans for the 1-row
        # totals (the dsir_logweights convention).
        g = (spine.join(t, "bin", "left").join(c, "bin", "left")
             .select("bin",
                     F.coalesce("__t", F.lit(0)).alias("n_target"),
                     F.coalesce("__n", F.lit(0)).alias("n_in"))
             .localCheckpoint(eager=False))
    tot = g.agg(F.sum("n_target").alias("__T"), F.sum("n_in").alias("__N"))
    return (
        g.crossJoin(F.broadcast(tot))
        .withColumn(
            "rate_ppm",
            F.when(
                (F.col("n_in") > 0) & (F.col("__T") > 0),
                F.least(
                    F.lit(int(resolution)).cast("long"),
                    F.expr(f"({int(resolution)}L * n_target * __N) "
                           "div (__T * n_in)"),
                ),
            ).otherwise(F.lit(0).cast("long")))
        .select("bin", "n_target", "n_in", "rate_ppm")
    )


def distribution_match(incoming: DataFrame, target: DataFrame,
                       value_col: str, key_col: str, n_bins: int = 10,
                       salt: str = "", resolution: int = 1_000_000,
                       rates: DataFrame | None = None) -> DataFrame:
    """Deterministic distribution-matching subsample: keep each
    incoming row iff hash(key, salt) falls under its bin's acceptance
    rate from :func:`distribution_match_rates`. The draw is a pure
    function of the row key — reproducible across runs/engines/
    retries — and kept bin counts are ∝ the target's shares in
    expectation (clipped at 1). Returns the kept rows + (bin,
    rate_ppm).

    Scale: the bounded rates frame broadcasts onto the corpus scan;
    acceptance is one hash-compare filter — a sample is a filter, not
    a job (the hash_sample contract). A caller that also PUBLISHES
    the rates should compute them once (ideally checkpointed — the
    frame is n_bins rows) and pass them via `rates`, so the two
    histogram scans aren't re-run inside the filter's lineage. A
    supplied `rates` frame must have been built with the SAME
    `n_bins` (asserted — the frame has exactly n_bins rows) and the
    SAME `resolution` (documented contract; not recoverable from the
    frame) as this call.
    """
    if rates is None:
        rates = distribution_match_rates(incoming, target, value_col,
                                         n_bins, resolution)
    else:
        # Consistency guard (r8 ADVICE): a rates frame built with a
        # different n_bins would silently drop rows via the inner bin
        # join below. The count is a deliberate construction-time
        # fail-fast (a wrong n_bins should error at the call site,
        # not deep inside a downstream action); pinning FIRST makes
        # it cost-neutral — the count materializes the bounded
        # n_bins-row checkpoint that the broadcast join below then
        # reuses, so even an unpinned caller-built lineage is derived
        # exactly once, same as without the guard. `resolution`
        # cannot be read off the frame (rate_ppm ≤ resolution holds
        # for any smaller resolution too), so it is a documented
        # contract: the rates MUST have been built with the same
        # `resolution` as this call, or the hash-compare acceptance
        # threshold is mis-scaled.
        rates = rates.localCheckpoint(eager=False)
        got = rates.count()
        if got != n_bins:
            raise ValueError(
                f"rates frame has {got} rows but n_bins={n_bins}; "
                f"build it with distribution_match_rates(..., "
                f"n_bins={n_bins}, resolution={resolution})")
    b = F.least(F.floor(F.col(value_col) * n_bins).cast("int"),
                F.lit(n_bins - 1))
    keyed = (incoming.filter(F.col(value_col).isNotNull()
                             & F.col(key_col).isNotNull())
             .withColumn("bin", b))
    return (
        keyed.join(F.broadcast(rates.select("bin", "rate_ppm")), "bin")
        .filter(_key_hash(F.col(key_col), salt) % resolution
                < F.col("rate_ppm"))
    )


def dsir_logweights(df: DataFrame, is_target: Column,
                    id_col: str = "doc_id", text_col: str = "text",
                    buckets: int = 64, decimals: int = 6) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by how target-like its hashed n-gram profile is, as the
    log-likelihood ratio log p_target(doc) − log p_raw(doc) under two
    multinomial bag-of-features models estimated on hashed word
    bigrams.

    Features are word bigrams hashed into `buckets` buckets with the
    portable 60-bit md5 hash, add-1 smoothed:

        lr_b  = ln((tc_b + 1) / (T + B)) − ln((rc_b + 1) / (R + B))
        w(d)  = Σ_b  n_db · lr_b       (folded in bucket order)

    where tc/rc are per-bucket bigram counts over the target slice /
    whole corpus and T/R their totals. `keep` marks docs whose rounded
    log-weight is ≥ 0 — more target-like than raw — the selection
    DSIR resamples from.

    Scale: two bounded aggregations over the bigram stream (bucket
    domain = B rows) produce a ≤B-row log-ratio table that BROADCASTS
    onto the per-doc bucket counts; the only corpus-sized shuffles are
    the (doc, bucket) and doc-keyed aggs, both map-side combinable.
    The per-doc float sum folds over the ≤B collected buckets in
    bucket order, so the statistic is engine-identical at the rounded
    grain (the zipf_fit ordered-fold device). No driver-side state.
    """
    from twitter_to_sqlite_spark.functions.text import _bigram_explode

    bg = _bigram_explode(df, id_col, text_col)
    flags = df.select(F.col(id_col), is_target.alias("__tgt"))
    b = bg.select(
        F.col(id_col),
        (_key_hash(F.col("__bg")) % buckets).cast("int").alias("bucket"),
    )
    # Three consumers (per-doc terms, raw counts, target counts) hang
    # off this frame; the lazy local checkpoint pins it so the bigram
    # explode + first agg run ONCE, not three times (Catalyst does not
    # exchange-reuse across the differing downstream joins).
    n = (b.groupBy(id_col, "bucket").agg(F.count(F.lit(1)).alias("n"))
         .localCheckpoint(eager=False))
    rc = n.groupBy("bucket").agg(F.sum("n").alias("rc"))
    tc = (n.join(flags.filter(F.col("__tgt")).select(id_col), id_col)
          .groupBy("bucket").agg(F.sum("n").alias("tc")))
    tot_r = rc.agg(F.sum("rc").alias("R"))
    tot_t = tc.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("T"))
    lr = (rc.join(tc, "bucket", "left")
          .crossJoin(F.broadcast(tot_r)).crossJoin(F.broadcast(tot_t))
          .select(
              "bucket",
              (F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1)
                     .cast("double") / (F.col("T") + buckets))
               - F.log((F.col("rc") + 1).cast("double")
                       / (F.col("R") + buckets))).alias("lr")))
    terms = (n.join(F.broadcast(lr), "bucket")
             .groupBy(id_col)
             .agg(F.sum("n").alias("n_feats"),
                  F.sort_array(F.collect_list(F.struct(
                      "bucket",
                      (F.col("n").cast("double") * F.col("lr"))
                      .alias("term")))).alias("ts")))
    w = F.round(
        F.aggregate("ts", F.lit(0.0), lambda acc, s: acc + s["term"]),
        decimals)
    return terms.select(
        F.col(id_col), F.col("n_feats"),
        w.alias("logweight"), (w >= 0.0).alias("keep"))


def temperature_sweep(df: DataFrame, strata_col: str, token_col: str,
                      alphas: list[float], decimals: int = 6) -> DataFrame:
    """Mixture temperature tuning curve: for each candidate α, the
    corpus-level consequences of q_s ∝ p_s^α smoothing — the dominant
    stratum's smoothed share, the smallest stratum's, the smoothed
    distribution's entropy (nats), and the largest implied upsample
    factor. The committed numbers a pipeline reads before fixing its
    sampling temperature: entropy says how uniform the mix becomes,
    max_upsample says how many times the rarest slice gets repeated
    (epoch-level duplication risk).

    Scale: one corpus partial-agg pass (the temperature_mixture
    shuffle); everything after runs on |strata| × |alphas| rows. The
    per-α float sums (partition function Z, entropy) fold over the
    ≤|strata| collected rows IN STRATUM ORDER, so the curve is
    engine- and partition-count-identical at the rounded grain.
    """
    # Lazy checkpoint: `tot` and `withp` both hang off the bounded
    # |strata|-row agg — unpinned, the corpus partial-agg pass runs
    # twice (Catalyst does not reuse common subplans).
    per = df.groupBy(strata_col).agg(
        F.sum(F.col(token_col)).cast("long").alias("__n")) \
        .localCheckpoint(eager=False)
    tot = per.agg(F.sum("__n").alias("__tot"))
    withp = per.crossJoin(F.broadcast(tot)).select(
        F.col(strata_col),
        (F.col("__n").cast("double") / F.col("__tot").cast("double"))
        .alias("__p"))
    aw = withp.select(
        strata_col, "__p",
        F.explode(F.array(*[F.lit(float(a)) for a in alphas]))
        .alias("alpha"),
    ).withColumn("__w", F.pow(F.col("__p"), F.col("alpha")))
    terms = aw.groupBy("alpha").agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sort_array(F.collect_list(
            F.struct(strata_col, "__w", "__p"))).alias("__ts"))
    z = F.aggregate("__ts", F.lit(0.0), lambda acc, s: acc + s["__w"])
    withz = terms.withColumn("__z", z)
    ent = F.aggregate(
        "__ts", F.lit(0.0),
        lambda acc, s: acc - (s["__w"] / F.col("__z"))
        * F.log(s["__w"] / F.col("__z")))
    upmax = F.aggregate(
        "__ts", F.lit(0.0),
        lambda acc, s: F.greatest(acc, (s["__w"] / F.col("__z"))
                                  / s["__p"]))
    return withz.select(
        "alpha", "n_strata",
        F.round(F.array_max(F.transform("__ts", lambda s: s["__w"]))
                / F.col("__z"), decimals).alias("max_share"),
        F.round(F.array_min(F.transform("__ts", lambda s: s["__w"]))
                / F.col("__z"), decimals).alias("min_share"),
        F.round(ent, decimals).alias("entropy"),
        F.round(upmax, 4).alias("max_upsample"),
    )


def padding_waste(df: DataFrame, token_col: str,
                  schemes: dict[str, list[int]],
                  decimals: int = 6) -> DataFrame:
    """Batch-packing efficiency of candidate length-bucket schemes —
    the dynamic-batching tuning curve: every sequence pads up to the
    smallest bucket boundary that fits it (sequences past the last
    boundary truncate down to it), and the scheme's cost is the
    fraction of batch slots spent on padding. The boundary set a
    trainer ships is the cheapest point on this curve; publishing the
    curve is the measure-don't-guess step before committing a
    tokenizer + bucketing config.

    Returns one row per scheme: (scheme, n_docs, total_tokens,
    padded_tokens, truncated_tokens, waste_frac), all counts exact
    BIGINTs, waste_frac = padded / (padded + kept) rounded once.

    Scale: the corpus collapses to its (length, count) histogram —
    bounded by the max sequence length, not row count — in one
    map-side-combined agg; every scheme then prices itself on the
    HISTOGRAM via a broadcast cross join (|schemes|·|lengths| rows).
    Adding a candidate scheme costs zero additional corpus scans.
    """
    tok = F.col(token_col)
    hist = (df.filter(tok.isNotNull() & (tok >= 0))
            .groupBy(tok.cast("long").alias("__len"))
            .agg(F.count(F.lit(1)).alias("__n")))
    spark = df.sparkSession
    srows = [(name, [int(b) for b in sorted(bounds)])
             for name, bounds in sorted(schemes.items())]
    sdf = spark.createDataFrame(srows, "scheme string, __bounds array<long>")
    j = hist.crossJoin(F.broadcast(sdf))
    cap = F.element_at("__bounds", -1)
    fit = F.array_min(F.filter("__bounds", lambda b: b >= F.col("__len")))
    slot = F.coalesce(fit, cap)
    kept = F.least(F.col("__len"), cap)
    per = j.select(
        "scheme", "__n",
        (F.col("__n") * F.col("__len")).alias("__tok"),
        (F.col("__n") * (slot - kept)).alias("__pad"),
        (F.col("__n") * (F.col("__len") - kept)).alias("__trunc"),
        (F.col("__n") * kept).alias("__kept"),
    )
    out = per.groupBy("scheme").agg(
        F.sum("__n").alias("n_docs"),
        F.sum("__tok").alias("total_tokens"),
        F.sum("__pad").alias("padded_tokens"),
        F.sum("__trunc").alias("truncated_tokens"),
        F.sum("__kept").alias("__kept"),
    )
    waste = F.round(
        F.col("padded_tokens").cast("double")
        / (F.col("padded_tokens") + F.col("__kept")).cast("double"),
        decimals)
    return out.select("scheme", "n_docs", "total_tokens",
                      "padded_tokens", "truncated_tokens",
                      waste.alias("waste_frac"))


def epoch_schedule(df: DataFrame, strata_col: str, token_col: str,
                   budget_tokens: int, max_epochs: float = 4.0,
                   decimals: int = 6) -> DataFrame:
    """How many epochs of each source does a token budget imply? The
    sqrt-temperature mixture (the multilingual-training standard:
    weight ∝ tokens^0.5, upweighting small sources) turned into the
    schedule a dataloader actually executes: epochs_s =
    budget·w_s / (W·tokens_s), flagged when it crosses `max_epochs`
    — the repetition ceiling past which additional epochs of a small
    source hurt more than help (Muennighoff et al. 2023's ~4-epoch
    rule of thumb).

    Returns one row per source: (source, tokens, weight_ppm, epochs,
    over_cap). weight_ppm is BIGINT-exact ((10⁶·w) DIV W on integral
    w = floor(√tokens), so both engines publish identical shares);
    epochs is ONE double expression on exact integers, rounded once,
    and over_cap compares the ROUNDED value so the flag never
    disagrees with the printed number.

    Scale: one map-side-combined agg collapses the corpus to
    |sources| rows; the Σw normalizer is a broadcast 1-row scalar.
    """
    per = (df.filter(F.col(strata_col).isNotNull()
                     & F.col(token_col).isNotNull())
           .groupBy(F.col(strata_col).alias("source"))
           .agg(F.sum(F.col(token_col).cast("long")).alias("tokens")))
    w = per.withColumn(
        "__w",
        F.floor(F.sqrt(F.col("tokens").cast("double"))).cast("long"))
    # the normalizer comes from a RENAMED projection and the join's
    # left side renames again: Spark 4's hybrid resolver flags a
    # same-name attribute appearing anywhere in BOTH subtrees of a
    # self-derived join as ambiguous, even when only one side outputs
    # it — distinct names on every path sidestep that entirely
    tot = (w.select(F.col("__w").alias("__wt"))
           .agg(F.sum("__wt").alias("__W")))
    j = w.withColumnRenamed("__w", "__wl").crossJoin(F.broadcast(tot))
    b = float(budget_tokens)
    epochs = F.round(
        (F.lit(b) * F.col("__wl").cast("double"))
        / (F.col("__W").cast("double") * F.col("tokens").cast("double")),
        decimals)
    return (j.withColumn(
                "weight_ppm",
                F.expr("CAST((1000000 * __wl) DIV __W AS BIGINT)"))
            .withColumn("epochs", epochs)
            .select("source", "tokens", "weight_ppm", "epochs",
                    (F.col("epochs") > F.lit(max_epochs)).alias("over_cap")))


def group_kfold(df: DataFrame, group_col: str, k: int,
                salt: str = "kf") -> DataFrame:
    """Grouped k-fold assignment — cross-validation where a GROUP
    (user, session, document cluster) must never straddle folds, the
    leakage rule assign_splits enforces for train/test applied to the
    k-fold protocol. fold = portable_hash(group ∥ salt) mod k, so the
    assignment is stateless, reproducible on any engine, and stable
    under reshuffles/reruns (no global counters, no randomness).

    Returns the fold audit a practitioner actually reviews before
    training: one row per fold — (fold, n_groups, n_rows) — fold
    sizes close to N/k confirm the hash is spreading; a group-overlap
    law belongs in tests (hash is a function of the group, so overlap
    is impossible by construction).

    Scale: one map-side-combined agg; countDistinct on groups is the
    only shuffle and it keys on the fold (k partitions of partial
    distinct sets).
    """
    fold = _key_hash(F.col(group_col), salt) % k
    return (df.filter(F.col(group_col).isNotNull())
            .groupBy(fold.alias("fold"))
            .agg(F.countDistinct(group_col).alias("n_groups"),
                 F.count(F.lit(1)).alias("n_rows")))


def gini_concentration(df: DataFrame, strata_col: str,
                       weight_col: str, decimals: int = 6) -> DataFrame:
    """Gini coefficient of how unequally a weight (tokens, docs,
    bytes) concentrates across strata — the single number that says
    "three domains own 90% of this corpus" before mixture planning
    starts (domain_caps and temperature_mixture are the treatments;
    this is the diagnosis). 0 = perfectly even, →1 = one stratum
    owns everything.

    G = (2·Σᵢ i·xᵢ) / (n·Σx) − (n+1)/n over ascending-sorted stratum
    totals (the rank form of the Lorenz integral) — every sum is an
    exact integer product (rank·total ≤ n·Σx, DECIMAL(38,0)-safe),
    with ONE double expression at the end, same op tree as the twin.

    Scale: the corpus collapses to |strata| totals in one map-side
    agg; the rank window runs over that bounded frame (same
    justification as every count-collapse window in the repo).
    Returns one row: (n_strata, total_weight, gini) — gini NULL for
    an empty input, 0.0 for a single stratum.
    """
    from pyspark.sql import Window

    per = (df.filter(F.col(strata_col).isNotNull()
                     & F.col(weight_col).isNotNull())
           .groupBy(F.col(strata_col).alias("__s"))
           .agg(F.sum(F.col(weight_col).cast("long")).alias("__x")))
    w = Window.orderBy(F.col("__x").asc(), F.col("__s").asc())
    ranked = per.withColumn("__i", F.row_number().over(w))
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_strata"),
        F.sum("__x").alias("total_weight"),
        F.sum(d(F.col("__i")) * d(F.col("__x"))).alias("__ix"))
    n = F.col("n_strata").cast("double")
    sx = F.col("total_weight").cast("double")
    gini = F.when(
        (F.col("n_strata") > 0) & (F.col("total_weight") > 0),
        F.round(
            (2.0 * F.col("__ix").cast("double")) / (n * sx)
            - (n + 1.0) / n, decimals) + F.lit(0.0))
    return agg.select("n_strata", "total_weight", gini.alias("gini"))
