"""Deduplication operators for training-data pipelines.

Five tiers, all expressed as DataFrame plans:

  exact_dedup          md5(content) groupBy — byte-identical dups
  ngram_jaccard_pairs  shingle inverted index → pair join → Jaccard
  minhash_lsh_pairs    MinHash signatures → banded LSH buckets → candidates
  simhash_pairs        64-bit SimHash → banded buckets → Hamming verify
  (embedding cosine near-dup lives in functions/similarity.py)

Hashing is md5-based everywhere (identical in Spark and DuckDB) so the
oracle checks are exact, and hash keys are high-entropy so the groupBy
shuffles have no skew.

Scale design: the naive near-dup formulation is an O(n²) cross join —
never built here. Every near-dup path goes through a *bucketing* key
(shingle, LSH band, simhash band) so the join fan-out is bounded by
bucket size; hot buckets (ubiquitous shingles) are capped with a
document-frequency filter, the standard trick in web-scale dedup.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), r"\W+"), lambda t: F.length(t) > 0)


def _md5_long(col):
    """First 60 bits of md5 as a non-negative long — portable across
    Spark (conv) and DuckDB ('0x…'::bigint), so oracles match exactly."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def spread(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition a narrow input before per-row-heavy compute.

    Small parquet files arrive as one partition (they fit one
    maxPartitionBytes split), which serializes hash/shingle-heavy
    operators on one core. A round-robin repartition costs one tiny
    shuffle and buys full parallelism; row-wise results are unchanged.

    Narrowness is detected from plan metadata only — ``inputFiles()``
    is a driver-side catalog lookup (no job, no RDD conversion, Spark
    Connect-safe; the old ``df.rdd.getNumPartitions()`` probe forced a
    full RDD conversion of the analyzed plan per call). A plan reading
    fewer files than the target parallelism MAY still be wide — Spark
    splits one large file into ~size/maxPartitionBytes scan partitions
    — so when the paths are stat-able their byte size refines the
    estimate and a big single-file scan is left untouched rather than
    repartitioned DOWN (ADVICE r2). Remote (object-store) paths are
    sized through the Hadoop FileSystem API, so an s3:// scan gets the
    same large-file protection as a local one; only when no filesystem
    can size the paths at all does the few-files heuristic fall back
    to spreading (the small-table case this function exists for).
    Non-file plans (in-memory batches) are small by construction and
    always spread.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    files = df.inputFiles()
    if not files:
        return df.repartition(target)
    if len(files) >= target:
        return df
    sizes = _file_sizes(df.sparkSession, files)
    if sizes is None:
        return df.repartition(target)  # unsizable few-file scan
    max_bytes = _max_partition_bytes(df.sparkSession)
    est_splits = sum(max(1, -(-s // max_bytes)) for s in sizes)
    if est_splits >= target:
        return df
    return df.repartition(target)


def _file_sizes(spark, files: list[str]) -> list[int] | None:
    """Byte sizes for scan paths: local stat first, then the Hadoop
    FileSystem API (covers s3a/hdfs/abfs in classic mode), else None
    (Spark Connect with remote paths — no JVM gateway)."""
    try:
        return [
            os.path.getsize(f[5:] if f.startswith("file:") else f)
            for f in files
        ]
    except OSError:
        pass
    try:
        sc = spark.sparkContext
        jvm = sc._jvm
        hconf = sc._jsc.hadoopConfiguration()
        out = []
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            out.append(p.getFileSystem(hconf).getFileStatus(p).getLen())
        return out
    except Exception:  # noqa: BLE001 — any gateway/FS failure
        return None


_SIZE_UNITS = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10,
               "m": 1 << 20, "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30}


def _max_partition_bytes(spark) -> int:
    """spark.sql.files.maxPartitionBytes, parsed ('128MB' or bytes)."""
    raw = str(spark.conf.get("spark.sql.files.maxPartitionBytes",
                             "134217728")).strip().lower()
    i = len(raw)
    while i > 0 and not raw[i - 1].isdigit():
        i -= 1
    num, unit = raw[:i], raw[i:]
    try:
        return int(num) * _SIZE_UNITS.get(unit, 1)
    except ValueError:
        return 128 << 20


def shingle_array(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, __sh: array<string>) of distinct k-word shingles.

    Two-step projection on purpose: the token array materializes as a
    column BEFORE the shingle transform references it. Higher-order
    lambdas are interpreted, and an expression referenced inside a
    lambda body is re-evaluated per element — inlining the tokenizer
    here costs O(tokens²) per document (measured ~5s for 5k docs; ~50ms
    materialized).
    """
    with_toks = df.select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__toks")
    )
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (k - 1), F.lit(1)))
    sh_arr = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, k)))
    )
    return with_toks.select("id", sh_arr.alias("__sh"))


def _pairs_within_buckets(rows: DataFrame, bucket_cols: list[str],
                          item_col: str = "item",
                          max_bucket: int | None = None,
                          on_oversize=None) -> DataFrame:
    """All unordered item pairs sharing a bucket: one shuffle
    (groupBy bucket), pairs generated inside each bucket with array
    expressions — never an n² self-join, and the upstream plan (which
    may be md5-heavy) is executed exactly once.

    `rows` must have bucket_cols + `item_col` (a struct whose FIRST
    field is the ordering id). Returns columns a, b (item structs,
    a.id < b.id). Callers dedup across buckets themselves.

    Scale: cost is Σ bucket_size²; callers bound bucket size by key
    design (bands, shingle max_df). `max_bucket` is the skew guard
    (VERDICT r1 #8): a bucket over that size — correlated keys, an
    adversarial hot value — is dropped from pair generation instead of
    detonating a size² explosion; every other bucket's pairs are
    unchanged. Dropping, not splitting, is the standard LSH treatment
    (a hot bucket's pairs are the least informative — its key carries
    no discrimination). `on_oversize(n_buckets_dropped)` runs an extra
    bounded count job for observability — omit it in hot paths.
    """
    grouped = rows.groupBy(*bucket_cols).agg(
        F.array_sort(F.collect_list(item_col)).alias("items")
    )
    if max_bucket is not None:
        if on_oversize is not None:
            n_over = grouped.filter(F.size("items") > max_bucket).count()
            if n_over:
                on_oversize(n_over)
        grouped = grouped.filter(F.size("items") <= max_bucket)
    items = F.col("items")
    pair_lists = F.transform(
        items,
        lambda x, i: F.transform(
            F.slice(items, i + 2, F.size(items)),
            lambda y: F.struct(x.alias("a"), y.alias("b")),
        ),
    )
    return grouped.select(
        F.explode(F.flatten(pair_lists)).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash, keep the smallest id.

    Returns (content_hash, keep_id, n_dups). Reference analogue: the
    hash_id content-key collapse (utils.py:668-673, archive.py:248).
    Scale: one partial-agg shuffle on a uniform 128-bit key.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = 3, carry: list[str] | None = None) -> DataFrame:
    """Distinct k-word shingles per document: (id, shingle).

    Built by posexplode + a window of ``lead(tok, i)`` concats — fully
    codegen'd — rather than exploding :func:`shingle_array`: the array
    form's per-position ``concat_ws(slice(...))`` lambda is interpreted
    per element (measured 3.2× slower end-to-end at sf0.1). The window
    shuffles on the doc id once; consumers that need per-doc ARRAYS
    (MinHash signatures, fingerprints) keep using ``shingle_array``.

    ``carry`` names extra per-document columns to keep on every
    shingle row (they must be functionally dependent on ``id_col`` —
    they join the distinct key, which is only row-identical when the
    column is constant per id). Carrying a group key here is free
    (the rows already flow through the id-keyed window) and replaces
    the consumer's alternative — a corpus-sized equi-join back on id.
    """
    from pyspark.sql import Window

    carry = carry or []
    base = df.select(F.col(id_col).alias("id"),
                     _tokens(F.col(text_col)).alias("__t"),
                     *[F.col(c) for c in carry])
    # A zero-token document must still emit its single '' shingle —
    # that is what shingle_array's greatest(n-k+1, 1) bound and the
    # DuckDB oracles produce (two punctuation-only docs are an exact
    # Jaccard pair). posexplode of an empty array emits NO row, so
    # substitute a one-empty-token array; the window-lead concat then
    # yields '' exactly like the array path.
    base = base.withColumn(
        "__t",
        F.when(F.size("__t") > 0, F.col("__t"))
        .otherwise(F.array(F.lit(""))),
    )
    toks = base.select(
        "id", F.size("__t").alias("__n"),
        F.posexplode("__t").alias("__pos", "__tok"),
        *carry,
    )
    w = Window.partitionBy("id").orderBy("__pos")
    parts = [F.col("__tok")] + [
        F.lead("__tok", i).over(w) for i in range(1, k)
    ]
    # Position bound mirrors shingle_array's sequence(1, greatest(n-k+1,
    # 1)): a doc SHORTER than k tokens still emits its single short
    # shingle (concat_ws skips the null leads), matching the oracles.
    return (
        toks.select(
            "id", F.concat_ws(" ", *parts).alias("shingle"),
            (F.col("__pos")
             <= F.greatest(F.col("__n") - (k - 1), F.lit(1)) - 1)
            .alias("__keep"),
            *carry,
        )
        .filter(F.col("__keep"))
        .select("id", "shingle", *carry)
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        threshold: float = 0.5,
                        max_df: int | None = None,
                        prefix_filter: bool = False,
                        shingles_df: DataFrame | None = None) -> DataFrame:
    """Near-duplicate pairs by k-gram Jaccard similarity.

    Plan: shingle inverted index → self-join on shingle (id_a < id_b)
    → count(*) = |A∩B| → Jaccard = inter / (|A|+|B|-inter) ≥ threshold.

    Scale: pairs per shingle grow as bucket², so `max_df` drops
    shingles appearing in more than that many docs — the standard
    stop-shingle filter for set-similarity joins (e.g. VernicaJoin).
    Jaccard is then computed over the FILTERED shingle sets (sizes
    post-filter): near-dups still score ≈1 (they share their rare
    shingles), ubiquitous shingles stop inflating both the cost
    (Σ df² pair generation) and the similarity of unrelated docs.
    Returns (id_a, id_b, inter, size_a, size_b, jaccard).

    ``prefix_filter=True`` switches to PPJoin-style prefix filtering
    (Chaudhuri et al. SSJoin / Xiao et al. PPJoin, both public): under
    a global shingle order (ascending document frequency — rarest
    first), any pair with J ≥ τ must share one of each doc's first
    |d| − ⌈τ·|d|⌉ + 1 shingles, so only that prefix is indexed for
    pair generation and candidates are verified with one JVM
    ``array_intersect`` per pair. EXACT — provably no false negatives
    — with pair generation driven by the rarest (lowest-df) shingles,
    so Σ df² shrinks by the df-distribution's head. Wins when the
    corpus is large/skewed; at small SF the extra windows cost more
    than they save (measured — see q_dedup_jaccard), which is why it
    is a flag, not the default.
    ``shingles_df`` injects a precomputed frame equal to
    ``shingles(df, id_col, text_col, k)`` — (id, shingle) distinct
    rows — so a checkpointed corpus shingle build can be shared
    across consumers (shingling is per-document, so a disjoint-id
    union's shingles are the union of its parts' shingles); every
    downstream step (df window, pair bucketing, sizes) is keyed on
    those rows, not on ``df``.
    """
    if shingles_df is not None:
        sh = shingles_df
    else:
        df = spread(df)
        # codegen'd window-lead shingles (3.2× the exploded-array form
        # — see shingles()); same distinct (id, shingle) contract.
        sh = shingles(df, id_col, text_col, k)
    from pyspark.sql import Window

    # document frequency window over the shingle key; stop-shingles
    # drop out before any pair is generated. The prefix path also
    # orders by df, so compute it whenever either consumer needs it.
    if max_df is not None or prefix_filter:
        sh = sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        )
        if max_df is not None:
            sh = sh.filter(F.col("__df") <= max_df)
    if prefix_filter:
        # post-filter set size attached in the SAME pipeline (window
        # over id): the prefix machinery needs sz on every shingle row
        # (prefix length), and the frame is checkpointed right after.
        sh = sh.withColumn(
            "sz", F.count(F.lit(1)).over(Window.partitionBy("id")))
        # The prefix path consumes `sh` THREE times (prefix candidates
        # + both sides of the sets join); materialize once so the
        # md5/window shingle subtree isn't recomputed per branch.
        sh = sh.localCheckpoint()
        plen = (
            F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)) + F.lit(1)
        )
        pre = sh.withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("id").orderBy("__df", "shingle")
            ),
        ).filter(F.col("__rn") <= plen)
        cand = _pairs_within_buckets(
            pre.select("shingle", F.struct("id", "sz").alias("item")),
            ["shingle"],
        ).select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
            F.col("a.sz").alias("size_a"), F.col("b.sz").alias("size_b"),
        ).distinct()
        sets = sh.groupBy("id").agg(F.collect_list("shingle").alias("__set"))
        inter = (
            cand
            .join(sets.select(F.col("id").alias("id_a"),
                              F.col("__set").alias("__sa")), "id_a")
            .join(sets.select(F.col("id").alias("id_b"),
                              F.col("__set").alias("__sb")), "id_b")
            .select(
                "id_a", "id_b", "size_a", "size_b",
                F.size(F.array_intersect("__sa", "__sb")).alias("inter"),
            )
        )
    else:
        # r10 reshape (guide §2.4/§2.3): the old pipeline attached sz
        # via an id-keyed window BETWEEN the shingle-keyed df window
        # and the shingle-keyed pair bucketing, so the full shingle
        # frame crossed the network three times (shingle → id →
        # shingle). Keying df-filter and bucketing back-to-back shares
        # ONE shingle exchange (window output partitioning satisfies
        # the groupBy), and the per-doc sizes ride a map-side-combined
        # aggregate off the same exchange (ReusedExchange) — joined
        # onto the AGGREGATED pairs, which are candidate-sized, not
        # shingle-sized. Values are identical: sizes are still counted
        # over the post-filter shingle sets.
        rows = sh.select("shingle", F.struct("id").alias("item"))
        pairs = _pairs_within_buckets(rows, ["shingle"])
        sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("__sz"))
        inter = (
            pairs.groupBy(
                F.col("a.id").alias("id_a"),
                F.col("b.id").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("inter"))
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("__sz").alias("size_a")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("__sz").alias("size_b")), "id_b")
        )
    return (
        inter.withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "inter", "size_a", "size_b", "jaccard")
    )


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      threshold: float = 0.9,
                      max_df: int | None = None,
                      shingles_df: DataFrame | None = None) -> DataFrame:
    """Directed containment near-dup pairs: C(A⊂B) = |A∩B| / |A| over
    k-gram shingle sets, reported for the SMALLER set of each pair.

    The asymmetric complement of :func:`ngram_jaccard_pairs`: a quote
    or excerpt wholly contained in a longer document has containment
    ≈ 1 while its Jaccard is only |A|/|B| — so symmetric dedup never
    sees it. Pretraining pipelines use exactly this signal to drop
    subsumed fragments (quote pages, partial mirrors, chunked copies)
    while keeping the containing original.

    Same single inverted-index plan as the Jaccard form (shingle
    self-join, id_a < id_b, Σ df² bounded by `max_df` stop-shingles);
    only the normalization differs: inter / min(|A|,|B|). Equal-size
    identical sets report the lesser id as the contained one. Returns
    (contained_id, container_id, inter, size_contained,
    size_container, containment).

    ``shingles_df`` injects a precomputed ``shingles(...)`` frame —
    see :func:`ngram_jaccard_pairs`.
    """
    if shingles_df is not None:
        sh = shingles_df
    else:
        df = spread(df)
        sh = shingles(df, id_col, text_col, k)
    from pyspark.sql import Window

    if max_df is not None:
        sh = sh.withColumn(
            "__df", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
        ).filter(F.col("__df") <= max_df)
    # r10 reshape — same single-shingle-exchange shape as
    # ngram_jaccard_pairs: sizes ride a map-side-combined aggregate
    # (ReusedExchange off the shingle-keyed window) and attach to the
    # candidate-sized pair aggregate, so the full shingle frame
    # crosses the network once instead of three times.
    rows = sh.select("shingle", F.struct("id").alias("item"))
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("__sz"))
    inter = (
        _pairs_within_buckets(rows, ["shingle"])
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
        .join(sizes.select(F.col("id").alias("id_a"),
                           F.col("__sz").alias("size_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"),
                           F.col("__sz").alias("size_b")), "id_b")
    )
    small_first = F.col("size_a") <= F.col("size_b")
    return (
        inter.select(
            F.when(small_first, F.col("id_a")).otherwise(F.col("id_b"))
            .alias("contained_id"),
            F.when(small_first, F.col("id_b")).otherwise(F.col("id_a"))
            .alias("container_id"),
            "inter",
            F.least("size_a", "size_b").alias("size_contained"),
            F.greatest("size_a", "size_b").alias("size_container"),
            F.round(
                F.col("inter") / F.least("size_a", "size_b"), 6
            ).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


def dup_ngram_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    shingles_df: DataFrame | None = None) -> DataFrame:
    """Per-document duplicated-n-gram fraction: of a doc's distinct
    k-gram shingles, what share also occurs in at least one OTHER
    document.

    The corpus-level companion to ``text.repetition_stats`` (which is
    within-doc): pretraining curation pipelines use exactly this
    signal — the fraction of a document's n-grams found elsewhere in
    the corpus — to drop boilerplate-heavy pages without running a
    full pair-generating dedup. Returns
    (doc_id, n_shingles, n_dup, dup_frac).

    Scale: one shuffle for the per-shingle document-frequency window
    (shingle-keyed, uniform md5-like distribution) and one partial-agg
    shuffle back onto the doc id. No pair generation, no joins — cost
    is linear in total shingles at any corpus size.

    ``shingles_df`` injects a precomputed ``shingles(...)`` frame —
    see :func:`ngram_jaccard_pairs`.
    """
    from pyspark.sql import Window

    if shingles_df is not None:
        sh = shingles_df
    else:
        sh = shingles(spread(df), id_col, text_col, k)
    sh = sh.withColumn(
        "__docs", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    return (
        sh.groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum((F.col("__docs") > 1).cast("long")).alias("n_dup"),
        )
        .select(
            id_col, "n_shingles", "n_dup",
            F.round(F.col("n_dup") / F.col("n_shingles"), 4)
            .alias("dup_frac"),
        )
    )


def boilerplate_stats(df: DataFrame, group_col: str = "source",
                      id_col: str = "doc_id", text_col: str = "text",
                      k: int = 2, min_frac: float = 0.5) -> DataFrame:
    """Per-group boilerplate shingle profile: within each group
    (site/domain/source), a k-gram shingle present in at least
    ``min_frac`` of the group's documents is boilerplate — the
    grouped document-frequency device CCNet/RefinedWeb-style cleaners
    use to strip per-site chrome (cookie banners, nav bars, footers)
    that corpus-global dedup can't see because each site's chrome is
    unique to that site.

    Returns one row per group:
    (group, n_docs, n_shingles, n_boiler, boiler_occ_frac) where
    boiler_occ_frac is the share of (doc, shingle) occurrences that
    are boilerplate — the fraction of the group's text surface a
    boilerplate-stripping pass would remove.

    Scale: one shuffle to shingle (doc-keyed window), one equi-join to
    tag each doc's shingles with its group (id-keyed, co-partitioned
    with the shingle window's output), one (group, shingle) partial
    agg, and a broadcast of the per-group doc totals. No pair
    generation; cost is linear in total shingles. Group skew is
    bounded by the (group, shingle) composite key — a hot site spreads
    over its shingle domain.

    Reference parity: twitter-to-sqlite's source-dim extraction
    (utils.py:extract_and_save_source) normalizes per-client
    boilerplate strings into a dimension; this is the statistical
    generalization that *discovers* the boilerplate.
    """
    # The group key rides the shingle explode (carry=) — it is
    # per-document, so carrying it is free on the id-keyed window,
    # and the old corpus-sized equi-join back on id disappears.
    sh = shingles(
        spread(df.withColumnRenamed(group_col, "__grp")),
        id_col, text_col, k, carry=["__grp"])
    totals = (
        df.groupBy(F.col(group_col).alias("__grp"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    dfreq = (
        sh.groupBy("__grp", "shingle")
        .agg(F.count(F.lit(1)).alias("__ndocs"))
    )
    flagged = dfreq.join(F.broadcast(totals), "__grp").withColumn(
        "__boiler",
        F.col("__ndocs") >= F.lit(min_frac) * F.col("n_docs"))
    return (
        flagged.groupBy(F.col("__grp").alias(group_col))
        .agg(
            F.first("n_docs").alias("n_docs"),
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.col("__boiler").cast("long")).alias("n_boiler"),
            F.round(
                F.sum(F.when(F.col("__boiler"), F.col("__ndocs"))
                      .otherwise(F.lit(0)))
                / F.sum("__ndocs"), 6).alias("boiler_occ_frac"),
        )
    )


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k: int = 3,
                       num_hashes: int = 16) -> DataFrame:
    """MinHash signature per doc: for seed i, min over shingles of
    md5(i || shingle). Returns (id, sig array<long> of num_hashes).

    All hashing is md5 → exact oracle parity; at scale the per-doc
    signature is computed inside one array expression (no shuffle at
    all until the LSH groupBy).
    """
    df = spread(df)
    # shingle_array materializes tokens before the shingle lambda, and
    # this projection materializes shingles before the num_hashes
    # array_min expressions — both levels would otherwise re-evaluate
    # per element/hash.
    with_sh = shingle_array(df, id_col, text_col, k)

    def _minhash(i):
        # closure, not a default arg: extra lambda params are read by
        # PySpark as higher-order-function arity.
        return lambda s: _md5_long(F.concat(F.lit(f"{i}|"), s))

    sig = F.array(*[
        F.array_min(F.transform(F.col("__sh"), _minhash(i)))
        for i in range(num_hashes)
    ])
    return with_sh.select("id", sig.alias("sig"))


def minhash_lsh_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", k: int = 3,
                      num_hashes: int = 16, bands: int = 4,
                      max_bucket: int | None = None,
                      on_oversize=None) -> DataFrame:
    """Candidate near-dup pairs via banded MinHash LSH.

    Signatures are split into `bands` bands of num_hashes/bands rows;
    docs sharing any band hash become a candidate pair. With b=4,r=4
    the S-curve threshold is (1/b)^(1/r) ≈ 0.71 Jaccard.

    Scale: candidates come from a groupBy(band, band_hash) — cost is
    Σ bucket², never n². Dedup of pairs found in multiple bands is a
    distinct on (id_a, id_b).
    Returns (id_a, id_b).
    """
    # _band_rows posexplodes over the per-band hash array: one pass
    # over the signatures (a union of per-band selects would recompute
    # them), and the one shared banding definition (see _band_rows).
    all_bands = _band_rows(df, id_col, text_col, k, num_hashes, bands)
    rows = all_bands.select("band", "bh", F.struct("id").alias("item"))
    pairs = _pairs_within_buckets(rows, ["band", "bh"],
                                  max_bucket=max_bucket, on_oversize=on_oversize)
    return (
        pairs.select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 48) -> DataFrame:
    """SimHash document signature (Charikar's tf-weighted bit-vote
    fingerprint).

    Every token OCCURRENCE hashes to `bits` bits (md5-derived); bit j
    of the signature is 1 iff occurrences setting bit j outnumber those
    clearing it. Term-frequency weighting (vs distinct tokens) is what
    gives simhash its discrimination when documents share a vocabulary.
    Returns (id, simhash long).
    """
    # Explode distinct tokens and compute the per-bit votes as `bits`
    # SUM columns of ONE hash aggregate. Array-fold formulations (one
    # F.aggregate per bit, or a single fold with an array accumulator)
    # are interpreted higher-order functions with per-element array
    # copies — 5-40× slower measured. A wide hash-agg is whole-stage
    # codegen with map-side partial aggregation, the same shape at any
    # scale. vote_j > 0  ⇔  2·ones_j > n_tokens (ties → bit 0, matching
    # the sum-of-±1 formulation and the oracle).
    df = spread(df)
    exploded = df.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("__tok"),
    ).select("id", _md5_long(F.col("__tok")).alias("__hv"))
    # The per-bit columns and the 48-term signature sum are rendered
    # as SQL text (one py4j round-trip each) — building them with
    # F.sum/F.when chains cost ~2s of pure driver time per plan
    # (the same pathology as similarity._const_mat); the parsed
    # expressions are identical.
    ones = [
        F.expr(f"sum(shiftright(__hv, {j}) & 1)").alias(f"__s{j}")
        for j in range(bits)
    ]
    g = exploded.groupBy("id").agg(F.count(F.lit(1)).alias("__n"), *ones)
    sig = F.expr(" + ".join(
        f"(CASE WHEN __s{j} * 2 > __n THEN CAST({2 ** j} AS BIGINT)"
        f" ELSE CAST(0 AS BIGINT) END)"
        for j in range(bits)
    ))
    return g.select("id", sig.alias("simhash"))


def simhash_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                  bits: int = 48, bands: int = 4, max_hamming: int = 3,
                  max_bucket: int | None = None,
                  on_oversize=None) -> DataFrame:
    """Near-dup pairs by SimHash: banded bucketing + Hamming verify.

    Pigeonhole: two signatures within `max_hamming` (< bands) differ in
    at most bands-1 bands, so they collide on ≥1 band — bucketing by
    band value finds all true pairs without an n² compare.
    Returns (id_a, id_b, hamming).
    """
    r = bits // bands
    mask = (1 << r) - 1
    sigs = simhash(df, id_col, text_col, bits)
    band_vals = F.array(*[
        F.shiftright(F.col("simhash"), b * r).bitwiseAND(F.lit(mask))
        for b in range(bands)
    ])
    band_rows = sigs.select(
        F.struct("id", "simhash").alias("item"),
        F.posexplode(band_vals).alias("band", "bv"),
    )
    pairs = _pairs_within_buckets(
        band_rows.select("band", "bv", "item"), ["band", "bv"],
        max_bucket=max_bucket, on_oversize=on_oversize,
    )
    cand = pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.col("a.simhash").alias("sig_a"),
        F.col("b.simhash").alias("sig_b"),
    ).distinct()
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def near_dup_components(pairs: DataFrame, id_a: str = "id_a",
                        id_b: str = "id_b",
                        max_iters: int | None = None) -> DataFrame:
    """Connected components over near-duplicate pairs: every document
    in a component gets the component's minimum id as its label —
    turning pairwise dedup output into keep-one-per-cluster groups
    (the step after MinHash/SimHash candidate pairs in a training-data
    pipeline; transitive closure, since near-dup is not transitive
    pairwise).

    Iterative min-label propagation: each round every node takes the
    min of its own and its neighbors' labels; converges in O(component
    diameter) rounds — near-dup clusters are shallow (stars/cliques),
    so a handful. Each round is one join + one partial-agg shuffle;
    ``localCheckpoint`` truncates the growing lineage so round N's plan
    doesn't replay rounds 1..N-1. Convergence probe: labels only ever
    DECREASE (new = min(old, neighbors)), so the label sum is strictly
    monotone until the fixpoint — comparing sums between rounds costs
    one shuffle-free scan-agg over the just-checkpointed partitions,
    replacing a join+count job per round (decimal(38) sum: no overflow
    for any realistic id domain, no float rounding). Only nodes that
    appear in a pair are labeled — singletons are their own trivial
    cluster.
    """
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = (
        edges.union(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    # Seed labels with round 1 already applied: against identity
    # labels, one propagation round yields exactly least(id, min
    # neighbor) — computable as a single partial-agg shuffle over the
    # (symmetric) edge list, replacing the identity-label distinct
    # PLUS the first join+union+groupBy round and its probe.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("__md"))
        .select(
            F.col("src").alias("id"),
            F.least(F.col("src"), F.col("__md")).alias("component"),
        )
        .localCheckpoint()
    )
    # Convergence probe. Numeric ids: labels only DECREASE, so a
    # decimal sum is strictly monotone until the fixpoint — one
    # shuffle-free scan-agg per round. Non-numeric ids (the API
    # accepts any orderable type): a decimal cast would be NULL/throw,
    # so fall back to counting rows whose label changed vs the
    # previous round (join of two checkpointed frames — costlier, but
    # exact for any type).
    import pyspark.sql.types as _T

    _dt = labels.schema["component"].dataType
    # Integral types only: a decimal(38,0) cast of a scaled decimal or
    # float ROUNDS, so distinct labels can collide and a round that
    # changed labels can leave the sum unchanged — false convergence.
    id_numeric = isinstance(
        _dt, (_T.ByteType, _T.ShortType, _T.IntegerType, _T.LongType),
    ) or (isinstance(_dt, _T.DecimalType) and _dt.scale == 0)

    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)"))
        ).collect()[0][0]

    def _changed(new: DataFrame, old: DataFrame) -> int:
        return (
            new.withColumnRenamed("component", "__new")
            .join(old, "id")
            .filter(F.col("__new") != F.col("component"))
            .count()
        )

    # Unbounded by default: the label sum strictly decreases every
    # non-converged round and is bounded below, so termination is
    # guaranteed (≤ component diameter rounds). `max_iters` is a
    # safety valve for callers who want a cap — exceeding it RAISES
    # rather than silently returning half-propagated labels (one real
    # component reported as several).
    prev_sum = _label_sum(labels) if id_numeric else None
    rounds = 0
    while True:
        prev_labels = labels
        nbr = edges.join(
            labels.withColumnRenamed("id", "dst"), "dst"
        ).select(F.col("src").alias("id"), "component")
        labels = (
            labels.union(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        if id_numeric:
            new_sum = _label_sum(labels)
            converged = new_sum == prev_sum
            prev_sum = new_sum
        else:
            converged = _changed(labels, prev_labels) == 0
        if converged:
            return labels
        rounds += 1
        if max_iters is not None and rounds >= max_iters:
            raise RuntimeError(
                f"near_dup_components: not converged after {max_iters} "
                f"rounds (component diameter exceeds the cap); raise "
                f"max_iters or pass None for run-to-fixpoint"
            )


def _band_rows(df: DataFrame, id_col: str, text_col: str,
               k: int, num_hashes: int, bands: int) -> DataFrame:
    """(id, band, bh): one row per (doc, LSH band) with the band's
    hash. THE single definition of the banding — pair generation,
    index build, index probe, and index append all share it, so a
    drift in separator/cast can never make probes silently miss."""
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(df, id_col, text_col, k, num_hashes)
    bh = F.array(*[
        F.md5(F.concat_ws(",", *[F.col("sig")[b * r + j].cast("string")
                                 for j in range(r)]))
        for b in range(bands)
    ])
    return sigs.select("id", F.posexplode(bh).alias("band", "bh"))


def _cross_band_pairs(new_bands: DataFrame, stored_bands: DataFrame,
                      max_bucket: int | None = None) -> DataFrame:
    """Distinct (id_a=stored, id_b=new) pairs sharing a band bucket —
    a plain equi-join on (band, bh): the per-bucket cross product is
    executed BY the join operator, with no per-bucket array
    materialization (an unbounded collect_list on a hot bucket can OOM
    one task) and no shuffle-side state beyond normal join spill.
    `max_bucket` filters hot stored buckets via a count aggregate
    (narrow partial agg) before the join."""
    if max_bucket is not None:
        ok = (
            stored_bands.groupBy("band", "bh")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket)
            .select("band", "bh")
        )
        stored_bands = stored_bands.join(ok, ["band", "bh"], "left_semi")
    return (
        new_bands.select("band", "bh", F.col("id").alias("id_b"))
        .join(stored_bands.select("band", "bh", F.col("id").alias("id_a")),
              ["band", "bh"])
        .select("id_a", "id_b")
        .distinct()
    )


def cross_minhash_pairs(new: DataFrame, stored: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, num_hashes: int = 16, bands: int = 4,
                        max_bucket: int | None = None) -> DataFrame:
    """Incremental near-dup check: MinHash-LSH candidate pairs BETWEEN
    a new batch and an already-ingested corpus — never within a side.

    The steady-state dedup a crawling pipeline actually runs: each
    incoming shard is checked against everything stored, and
    within-shard / within-store pairs are someone else's job (the
    store was deduped when it was ingested). Pair generation is an
    equi-join of the new shard's bands against the store's — the
    within-side (|new_b|² + |stored_b|²)/2 work of running the full
    pairs operator on the union and filtering is never done, which at
    steady state (stored ≫ new) is nearly all of it.

    At scale the stored side's bands should be MATERIALIZED
    (build_minhash_index / probe_minhash_index) so the store is never
    re-sketched. Returns (id_a=stored, id_b=new).
    """
    return _cross_band_pairs(
        _band_rows(new, id_col, text_col, k, num_hashes, bands),
        _band_rows(stored, id_col, text_col, k, num_hashes, bands),
        max_bucket,
    )


def novelty_stats(new: DataFrame, stored: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k: int = 3, decimals: int = 6,
                  new_shingles: DataFrame | None = None,
                  stored_shingles: DataFrame | None = None) -> DataFrame:
    """Per-document novelty of a new shard against the stored corpus:
    the fraction of each new document's distinct k-shingles that occur
    NOWHERE in the store — the data-valuation signal an incremental
    crawl pipeline ranks shards by (a shard of novelty ≈ 0 is paying
    storage for text the corpus already has; near-dup candidates catch
    copies, novelty also prices partial overlap).

    Shape: distinct shingles per new doc (one doc-keyed window), the
    store reduced to its DISTINCT shingle set (map-side combined),
    ONE left equi-join on the shingle — a high-entropy key, so the
    join shuffle is balanced — then one per-doc count agg. Work is
    linear in both sides' shingle counts; nothing is ever pairwise.

    Returns (doc_id, n_shingles, n_novel, novelty) for every new doc;
    novelty = n_novel / n_shingles rounded to `decimals`.

    ``new_shingles`` / ``stored_shingles`` inject precomputed
    ``shingles(...)`` frames for either side — see
    :func:`ngram_jaccard_pairs` (shingling is per-document, so id
    filters and disjoint-id unions commute with it).
    """
    new_sh = (new_shingles if new_shingles is not None
              else shingles(new, id_col, text_col, k))
    stored_sh = (
        (stored_shingles if stored_shingles is not None
         else shingles(stored, id_col, text_col, k))
        .select("shingle").distinct()
        .withColumn("__hit", F.lit(1))
    )
    j = new_sh.join(stored_sh, "shingle", "left")
    per = j.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
        .alias("n_novel"),
    )
    return per.select(
        F.col("id").alias(id_col), "n_shingles", "n_novel",
        F.round(
            F.col("n_novel").cast("double") / F.col("n_shingles"),
            decimals).alias("novelty"),
    )


def build_minhash_index(corpus: DataFrame, path: str,
                        id_col: str = "doc_id", text_col: str = "text",
                        k: int = 3, num_hashes: int = 16,
                        bands: int = 4) -> None:
    """Materialize the stored corpus's MinHash band index:
    (band, bh, id) rows partitioned by band, sketch parameters in the
    sidecar so probes can't drift from the build.

    The steady-state form of :func:`cross_minhash_pairs`: the store is
    sketched ONCE at ingest; each incoming shard only sketches itself
    and joins its bands against this table. Keep it current with
    :func:`append_minhash_index` after accepting a shard — the
    store's text is never re-read for dedup.
    """
    from twitter_to_sqlite_spark.functions.similarity import _write_meta
    from twitter_to_sqlite_spark.operators import sinks

    bands_df = _band_rows(corpus, id_col, text_col, k, num_hashes, bands)
    sinks.write_swap(bands_df, path, partition_by=["band"])
    _write_meta(path, {"kind": "minhash",
                       "k": k, "num_hashes": num_hashes, "bands": bands})


def append_minhash_index(shard: DataFrame, path: str,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> None:
    """Append an ACCEPTED shard's bands to a
    :func:`build_minhash_index` store (sketch params from the sidecar
    — the one banding definition, so future probes collide with it)."""
    from twitter_to_sqlite_spark.functions.similarity import read_meta

    meta = read_meta(path)
    bands_df = _band_rows(shard, id_col, text_col,
                          meta["k"], meta["num_hashes"], meta["bands"])
    bands_df.write.mode("append").partitionBy("band").parquet(path)


def probe_minhash_index(spark, path: str, new: DataFrame,
                        id_col: str = "doc_id", text_col: str = "text",
                        max_bucket: int | None = None) -> DataFrame:
    """Near-dup candidates between a new shard and a
    :func:`build_minhash_index` store — identical output to
    :func:`cross_minhash_pairs` against the store's corpus, without
    re-sketching the store: the shard's bands (small) equi-join the
    band table as-is; Spark broadcasts the shard side, so the store
    is read once and never shuffled."""
    from twitter_to_sqlite_spark.functions.similarity import read_meta

    meta = read_meta(path)
    new_bands = _band_rows(new, id_col, text_col,
                           meta["k"], meta["num_hashes"], meta["bands"])
    stored_bands = spark.read.parquet(path).select("id", "band", "bh")
    return _cross_band_pairs(new_bands, stored_bands, max_bucket)


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 8,
                    positions: DataFrame | None = None) -> DataFrame:
    """Exact substring-duplication spans: maximal token ranges whose
    every ``window``-gram occurs more than once in the corpus.

    The distributed form of exact substring deduplication (Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"):
    the suffix-array formulation is replaced by rolling window hashes —
    a ``window``-token sliding window is hashed at every position, a
    window is *duplicated* if its hash occurs ≥2 times corpus-wide
    (cross- or within-document), and per document the overlapping /
    touching duplicated windows merge into maximal spans
    (gaps-and-islands over positions). A span row ``(doc_id,
    span_start, span_end)`` covers tokens ``[span_start, span_end)``
    (0-based); downstream cleaning cuts those ranges out of the text.

    Scale: two linear shuffles, no pair join ever — occurrence counts
    come from a count window over the 128-bit hash (high entropy, no
    skew), islands from a per-document position window. Unlike the
    near-dup pair generators there is no Σ bucket² term: a hash
    repeated a million times still costs one partition-local count.

    Reference parity: the reference engine has no substring dedup;
    this extends its exact-dedup tier (SURVEY §2 dedup family).

    ``positions`` injects a precomputed :func:`duplicate_positions`
    frame (id, pos, __canon) so the hash-window front — the expensive
    half, one full tokenize + per-position md5 + count window over the
    corpus — is paid once and shared with
    :func:`duplicate_spans_keep_first` instead of per variant. The
    remove-every-occurrence policy uses ALL duplicated positions, so
    the canonical flag is simply ignored; rows are identical to the
    self-computed path (the extra min aggregates the shared front
    carries ride the same per-hash window partition and change no
    rows).
    """
    from pyspark.sql import Window

    if positions is not None:
        return _merge_position_islands(
            positions.select("id", "pos"), window, id_col)
    wins = _window_hashes(df, id_col, text_col, window)
    dup = (
        wins.withColumn(
            "__c", F.count(F.lit(1)).over(Window.partitionBy("h"))
        )
        .filter(F.col("__c") > 1)
        .select("id", "pos")
    )
    return _merge_position_islands(dup, window, id_col)


def _window_hashes(df: DataFrame, id_col: str, text_col: str,
                   window: int) -> DataFrame:
    """(id, pos, h): the md5 of every ``window``-token sliding window
    at every 0-based position — the shared front of the substring-
    dedup family."""
    toks = spread(df).select(
        F.col(id_col).alias("id"), _tokens(F.col(text_col)).alias("__t")
    )
    # Materialize tokens BEFORE the transform lambda (the per-element
    # re-evaluation trap shingle_array documents).
    n = F.size("__t")
    return toks.filter(n >= window).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), n - (window - 1)),
                lambda i: F.struct(
                    (i - 1).cast("long").alias("pos"),
                    F.md5(F.concat_ws(" ", F.slice(F.col("__t"), i, window)))
                    .alias("h"),
                ),
            )
        ).alias("__w"),
    ).select("id", F.col("__w.pos").alias("pos"), F.col("__w.h").alias("h"))


def _merge_position_islands(dup: DataFrame, window: int,
                            id_col: str) -> DataFrame:
    """Gaps-and-islands over duplicated window positions: per document,
    overlapping / touching ``window``-token windows merge into maximal
    (span_start, span_end) ranges. Input: (id, pos) rows."""
    from pyspark.sql import Window

    w_doc = Window.partitionBy("id").orderBy("pos")
    gap = F.col("pos") - F.lag("pos").over(w_doc)
    flagged = dup.withColumn(
        "__new",
        F.when(gap.isNull() | (gap > window), F.lit(1)).otherwise(F.lit(0)),
    )
    sid = F.sum("__new").over(
        w_doc.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        flagged.withColumn("__s", sid)
        .groupBy("id", "__s")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + window).alias("span_end"),
        )
        .select(
            F.col("id").alias(id_col),
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
            (F.col("span_end") - F.col("span_start")).cast("long")
            .alias("n_dup_tokens"),
        )
    )


def duplicate_positions(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text",
                        window: int = 8) -> DataFrame:
    """Duplicated window positions with their canonical flag: (id, pos,
    __canon) rows for every ``window``-gram whose hash occurs ≥2 times
    corpus-wide, ``__canon`` marking the corpus-wide (min doc id, then
    min position within that doc) occurrence.

    The shared front of the substring-dedup family: ONE tokenize +
    per-position md5 + per-hash window pass serves BOTH span policies —
    :func:`duplicate_spans` (remove every occurrence → ignore
    ``__canon``) and :func:`duplicate_spans_keep_first` (keep the
    canonical copy → drop ``__canon`` rows) — via their ``positions``
    parameter. The count/min/conditional-min aggregates are all
    frame-free over the same per-hash partition, so the sharing adds
    no exchange and no sort; output is bounded by the corpus's actual
    duplication (only positions with ``__c > 1`` survive), which is
    what makes it the right frame to checkpoint.
    """
    from pyspark.sql import Window

    wh = Window.partitionBy("h")
    wins = _window_hashes(df, id_col, text_col, window)
    counted = (
        wins
        .withColumn("__c", F.count(F.lit(1)).over(wh))
        .withColumn("__mid", F.min("id").over(wh))
    )
    first_pos = F.min(
        F.when(F.col("id") == F.col("__mid"), F.col("pos"))
    ).over(wh)
    return (
        counted.withColumn("__mpos", first_pos)
        .filter(F.col("__c") > 1)
        .select(
            "id", "pos",
            ((F.col("id") == F.col("__mid"))
             & (F.col("pos") == F.col("__mpos"))).alias("__canon"),
        )
    )


def duplicate_spans_keep_first(df: DataFrame, id_col: str = "doc_id",
                               text_col: str = "text",
                               window: int = 8,
                               positions: DataFrame | None = None) -> DataFrame:
    """Exact substring-duplication spans, KEEP-FIRST policy: like
    :func:`duplicate_spans`, but each duplicated ``window``-gram's
    canonical occurrence — the corpus-wide (min doc id, then min
    position) one — is NOT marked, so one copy of every duplicated
    substring survives removal. This is Lee et al. 2022 §4's actual
    ExactSubstr treatment (remove all BUT one occurrence of a shared
    span); :func:`duplicate_spans` is the aggressive remove-every-
    occurrence variant. Returns (doc_id, span_start, span_end,
    n_dup_tokens) rows covering only non-canonical occurrences;
    :func:`remove_spans` applies them.

    Keep-first is decided per window hash independently; a canonical
    document can still lose part of a kept span to a DIFFERENT hash
    whose canonical copy lives elsewhere — inherent to any greedy
    per-substring policy, and how the suffix-array original behaves
    when duplicated ranges overlap.

    Scale: identical shape to :func:`duplicate_spans` — no pair join,
    no Σ bucket² term. The canonical pick adds two more aggregates
    over the SAME per-hash window partition (count, min id, then min
    pos within the min-id doc): one shuffle on the high-entropy hash
    serves all three, and no per-hash sort is introduced (min/count
    are frame-free). The (min id, min pos) pick is two chained
    unbounded-window aggregates rather than one min-of-struct so the
    DuckDB oracle can state it verbatim, with no overflow-prone
    id*K+pos scalar encoding.

    Reference parity: no counterpart — extends the reference's
    exact-dedup tier (SURVEY §2 dedup family) like duplicate_spans.

    ``positions`` injects a precomputed :func:`duplicate_positions`
    frame so the hash-window front is shared with
    :func:`duplicate_spans` — the keep-first dup set is exactly the
    non-canonical rows of that frame.
    """
    from pyspark.sql import Window

    if positions is not None:
        return _merge_position_islands(
            positions.filter(~F.col("__canon")).select("id", "pos"),
            window, id_col)
    wh = Window.partitionBy("h")
    wins = _window_hashes(df, id_col, text_col, window)
    counted = (
        wins
        .withColumn("__c", F.count(F.lit(1)).over(wh))
        .withColumn("__mid", F.min("id").over(wh))
    )
    # min position within the canonical (min-id) document; rows of
    # other docs contribute NULL, which min() ignores.
    first_pos = F.min(
        F.when(F.col("id") == F.col("__mid"), F.col("pos"))
    ).over(wh)
    dup = (
        counted.withColumn("__mpos", first_pos)
        .filter((F.col("__c") > 1)
                & ~((F.col("id") == F.col("__mid"))
                    & (F.col("pos") == F.col("__mpos"))))
        .select("id", "pos")
    )
    return _merge_position_islands(dup, window, id_col)


def remove_spans(docs: DataFrame, spans: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Cut token ranges out of documents: given span rows ``(id,
    span_start, span_end)`` (0-based, end-exclusive — the output of
    :func:`duplicate_spans`), rebuild each document's text without the
    covered tokens.

    The apply step of exact substring dedup. One shuffle join on the
    document id (spans aggregate to one array row per document first,
    so the join fan-out is 1:1), then per-row array arithmetic — keep
    token i iff no span covers it. Documents with no spans pass
    through unchanged via the left join's null → empty-array fallback.
    """
    per_doc = spans.groupBy(F.col(id_col).alias("__sid")).agg(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"),
                     F.col("span_end").alias("e"))
        ).alias("__spans")
    )
    # r11: spread a narrow corpus scan before the per-row surgery —
    # the span side broadcasts, so the tokenize + O(tokens × spans)
    # keep-index filter otherwise runs inside the scan's 1-2
    # partitions (size-aware; wide scans left untouched).
    toks = spread(docs).select(
        F.col(id_col), _tokens(F.col(text_col)).alias("__t")
    )
    joined = toks.join(
        per_doc, toks[id_col] == per_doc["__sid"], "left"
    ).select(
        id_col, "__t",
        F.coalesce(
            "__spans",
            F.expr("cast(array() as array<struct<s:long,e:long>>)"),
        ).alias("__spans"),
    )
    kept_idx = F.filter(
        F.sequence(F.lit(0).cast("long"),
                   F.size("__t").cast("long") - 1),
        lambda i: ~F.exists(
            F.col("__spans"), lambda sp: (i >= sp["s"]) & (i < sp["e"])
        ),
    )
    staged = joined.filter(F.size("__t") > 0).select(
        id_col, "__t", kept_idx.alias("__keep")
    )
    kept_toks = F.transform(
        F.col("__keep"), lambda i: F.element_at(F.col("__t"), (i + 1).cast("int"))
    )
    return staged.select(
        F.col(id_col),
        F.array_join(kept_toks, " ").alias("text_clean"),
        (F.size("__t") - F.size("__keep")).cast("long")
        .alias("n_removed_tokens"),
    )


def paragraph_dedup(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n\n",
                    min_count: int = 2) -> DataFrame:
    """Paragraph-granularity dedup (RefinedWeb / Penedo et al. 2023):
    drop every paragraph whose exact content repeats >= ``min_count``
    times corpus-wide (boilerplate headers/footers, licence blocks,
    navigation chrome), reassemble the surviving paragraphs in
    document order. Returns (id, n_paras, n_kept, clean_text).

    Sits between dedup at whole-doc granularity (exact_dedup) and
    token-window granularity (duplicate_spans): one explode, one
    corpus-wide count, one per-doc re-agg — zero pair joins, so it
    scales linearly like the substring pass.

    Scale notes: the corpus-wide paragraph count is a groupBy on the
    md5 of the paragraph (fixed-width shuffle key) rather than a
    count-over-window, deliberately — boilerplate paragraphs are by
    definition HOT keys (a footer can appear in half the corpus), and
    a window would move every instance of the hot paragraph into one
    task with no recourse, while the aggregate gets map-side partial
    combine and the count-side join gets AQE skew splitting. The
    per-doc re-agg state is bounded by document size.
    """
    paras = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    ).withColumn("__h", F.md5(F.col("__para")))
    counts = paras.groupBy("__h").agg(F.count(F.lit(1)).alias("__cnt"))
    keep = F.col("__cnt") < F.lit(min_count)
    return (
        paras.join(counts, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.when(keep, F.struct(
                            F.col("__pos").alias("pos"),
                            F.col("__para").alias("para"),
                        )))),
                    lambda x: x["para"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )



def paragraph_hash_counts(df: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text",
                          sep: str = "\n\n") -> DataFrame:
    """The stored artifact of incremental paragraph dedup: corpus-wide
    (para_hash, n) counts — what a pipeline persists after each batch
    so the corpus itself is never rescanned (the paragraph analogue of
    the MinHash band store). Mergeable: counts from two batches add.
    """
    return (
        df.select(F.explode(F.split(F.col(text_col), sep)).alias("__para"))
        .groupBy(F.md5(F.col("__para")).alias("para_hash"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def paragraph_dedup_incremental(new_docs: DataFrame,
                                stored_counts: DataFrame,
                                id_col: str = "doc_id",
                                text_col: str = "text",
                                sep: str = "\n\n",
                                min_count: int = 2) -> DataFrame:
    """Incremental paragraph dedup: clean a NEW batch against the
    stored corpus without rescanning it — a paragraph is dropped when
    its total occurrence count (stored + within-batch) reaches
    ``min_count``, so results equal :func:`paragraph_dedup` run over
    stored ∪ new, restricted to the new ids (the maintain ≡ recompute
    contract, tested). ``stored_counts`` is a
    :func:`paragraph_hash_counts` frame (para_hash, n).

    Scale: the stored corpus participates only as its pre-aggregated
    hash-count table — one equi-join on the fixed-width hash; the
    batch side is the same explode + count + bounded re-agg as the
    batch operator. Update the store by unioning the batch's own
    counts and re-aggregating (counts add), never by re-reading text.
    """
    paras = new_docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias("__pos", "__para"),
    ).withColumn("__h", F.md5(F.col("__para")))
    batch = paras.groupBy("__h").agg(F.count(F.lit(1)).alias("__bn"))
    stored = stored_counts.select(
        F.col("para_hash").alias("__h"), F.col("n").alias("__sn"))
    totals = batch.join(stored, "__h", "left").select(
        "__h",
        (F.col("__bn") + F.coalesce("__sn", F.lit(0).cast("long")))
        .alias("__cnt"),
    )
    keep = F.col("__cnt") < F.lit(min_count)
    return (
        paras.join(totals, "__h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_paras"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(
                        F.when(keep, F.struct(
                            F.col("__pos").alias("pos"),
                            F.col("__para").alias("para"),
                        )))),
                    lambda x: x["para"],
                ),
                sep,
            ).alias("clean_text"),
        )
    )


def normalized_dedup(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Exact dedup over NORMALIZED text (text.normalize_text): the
    standard "fuzzy exact" pass that catches case/punctuation/
    whitespace variants exact_dedup misses while staying one
    fixed-width-key aggregate — run it between exact and MinHash
    passes, where it removes most mirror chrome for hash-agg cost.
    Returns (content_hash, keep_id, n_dups), exact_dedup's shape.
    Scale: identical to exact_dedup — one partial-agg shuffle on a
    uniform 128-bit key; normalization is a narrow JVM projection.
    """
    from twitter_to_sqlite_spark.functions.text import normalize_text

    return (
        df.groupBy(F.md5(normalize_text(F.col(text_col)))
                   .alias("content_hash"))
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )


def lsh_band_plan(pairs: DataFrame, num_hashes: int = 16,
                  tau_num: int = 1, tau_den: int = 2,
                  ppm: int = 1_000_000) -> DataFrame:
    """MinHash banding-parameter planner: for every (bands b, rows r)
    factorization of the signature budget (r a power of two,
    b = num_hashes / r), the EMPIRICAL expected error of banded LSH
    over the observed candidate-pair similarity spectrum — the
    measure-don't-guess step before fixing (b, r), instead of reading
    the (1/b)^(1/r) knee off the S-curve and hoping the corpus
    cooperates.

    For a pair with exact Jaccard s, banded LSH detects it with
    p = 1 − (1 − s^r)^b. Pairs at/above the target threshold
    (tau_num/tau_den, compared EXACTLY as inter·den ≥ union·num)
    contribute their miss probability to fn_ppm; pairs below it
    contribute their detection probability to fp_ppm; chosen marks
    the minimum-total-error leg (ties → smaller r = cheaper bands).

    Engine-exact floats: s is a ratio of exact integers, s^r and
    (1−s^r)^b are evaluated by REPEATED SQUARING (identical
    multiplication trees in Spark and the oracle — no libm pow), and
    each pair's contribution is floored to integer ppm before the
    sum, so the aggregate is BIGINT-exact in any partition order.

    Scale: a handful of multiply columns over the bounded PAIRS frame
    (already capped by max_df at generation), one global 1-row agg
    (map-side combined), a ≤log₂(num_hashes)+1-row output. The
    planner costs one scan of the pairs a dedup run computes anyway.

    Expects the ngram_jaccard_pairs output shape (inter, size_a,
    size_b). Reference scope: parameter planning for dedup has no
    counterpart in twitter-to-sqlite (pipeline-scale extension);
    the S-curve math is MMDS ch.3 (public).
    """
    import math

    def _p2(col, e: int):
        # col**e for e a power of two, by squaring (e=1 → identity)
        for _ in range(e.bit_length() - 1):
            col = col * col
        return col

    legs = []
    r = 1
    while r <= num_hashes:
        legs.append((num_hashes // r, r))
        r *= 2

    union = (F.col("size_a") + F.col("size_b") - F.col("inter"))
    s = F.col("inter").cast("double") / union
    istrue = (F.col("inter") * tau_den) >= (union * tau_num)

    aggs = []
    for b, r in legs:
        miss = _p2(F.lit(1.0) - _p2(s, r), b)
        aggs.append(F.coalesce(F.sum(
            F.when(istrue, F.floor(miss * F.lit(float(ppm))))
            .otherwise(F.lit(0))
        ), F.lit(0)).alias(f"fn_{b}_{r}"))
        aggs.append(F.coalesce(F.sum(
            F.when(istrue, F.lit(0))
            .otherwise(F.floor((F.lit(1.0) - miss) * F.lit(float(ppm))))
        ), F.lit(0)).alias(f"fp_{b}_{r}"))
    wide = pairs.agg(*aggs)

    rows = []
    for b, r in legs:
        knee = round(math.exp(math.log(1.0 / b) / r), 6)
        rows.append(F.struct(
            F.lit(b).cast("long").alias("b"),
            F.lit(r).cast("long").alias("r"),
            F.lit(knee).alias("s_knee"),
            F.col(f"fn_{b}_{r}").alias("fn_ppm"),
            F.col(f"fp_{b}_{r}").alias("fp_ppm"),
        ))
    from pyspark.sql import Window

    long = (wide.select(F.explode(F.array(*rows)).alias("__l"))
            .select("__l.b", "__l.r", "__l.s_knee", "__l.fn_ppm",
                    "__l.fp_ppm",
                    (F.col("__l.fn_ppm") + F.col("__l.fp_ppm"))
                    .alias("cost_ppm")))
    w = Window.orderBy("cost_ppm", "r")   # ≤ log2(H)+1 rows
    return long.withColumn(
        "chosen", F.row_number().over(w) == 1)
