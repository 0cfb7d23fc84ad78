"""Relational operators (SURVEY §2.5 joins, §2.6 aggregations/windows,
§2.7 set ops, §2.9 text search).

Every function is a pure ``DataFrame -> DataFrame`` plan builder — no
actions, no collect — so Catalyst sees the whole plan and can push
filters, prune columns, and choose join strategies. Scale notes are on
each function: what shuffles, what broadcasts, what AQE fixes.

Reference parity citations point at /root/reference (dogsheep/
twitter-to-sqlite v0.22) file:line.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- joins

def anti_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of `left` with no match in `right` (NOT IN).

    Reference: skip-existing filter ``cli.py:483-487`` and the README
    recipe ``followed_id not in (select id from users)`` (README.md:243).
    Scale: Catalyst picks broadcast-anti when `right` is small, else
    shuffle; null-safe because we join on keys, not NOT IN semantics.
    """
    return left.join(right, on=on, how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | str) -> DataFrame:
    """Rows of `left` with ≥1 match in `right` (IN / EXISTS).

    Reference: Datasette pattern ``id in (select tweet from
    timeline_tweets)`` (README.md:212).
    """
    return left.join(right, on=on, how="left_semi")


def key_lookup_join(fact: DataFrame, dim: DataFrame, on, how: str = "inner",
                    broadcast_dim: bool = True) -> DataFrame:
    """FK resolution join of a fact against a dimension.

    Reference: tweet→user/place/source FK wiring ``utils.py:346-354``.
    Scale: dimensions (users/places/sources ≈ region/nation/customer)
    are broadcast so the 100 TB fact side never shuffles.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return fact.join(d, on=on, how=how)


def self_join_fact(fact: DataFrame, left_key: str, right_key: str,
                   lsuffix: str = "_l", rsuffix: str = "_r") -> DataFrame:
    """Fact-to-fact self join (tweet ↔ quoted/retweeted original).

    Reference: self-FKs ``retweeted_status``/``quoted_status`` →
    ``tweets.id`` (utils.py:353-354).
    Scale: a self equi-join shuffles both sides on the key once; with
    bucketed storage on `id` it is shuffle-free.
    """
    l = fact.select([F.col(c).alias(c + lsuffix) for c in fact.columns])
    r = fact.select([F.col(c).alias(c + rsuffix) for c in fact.columns])
    return l.join(r, F.col(left_key + lsuffix) == F.col(right_key + rsuffix))


def mutual_edges(edges: DataFrame, src: str = "follower_id", dst: str = "followed_id") -> DataFrame:
    """Mutual-follow pairs from an edge list: (a,b) where (b,a) exists.

    Reference: ``following(followed_id, follower_id)`` edge list with
    both-direction indexes (utils.py:355-369).
    Returns one row per unordered pair with a < b.
    Scale: self-join shuffles on the join key; both sides are the same
    relation so the exchange is reused. Emit a<b to avoid double pairs.
    """
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).distinct()
    rev = fwd.select(F.col("b").alias("a"), F.col("a").alias("b"))
    return (
        fwd.join(rev, on=["a", "b"], how="left_semi")
        .filter(F.col("a") < F.col("b"))
    )


def m2m_join(left: DataFrame, bridge: DataFrame, right: DataFrame,
             left_on, bridge_left, bridge_right, right_on) -> DataFrame:
    """Two-hop join through an m2m bridge table.

    Reference: ``media_tweets`` bridge joining tweets↔media
    (utils.py:442-446; tests/test_save_tweets.py:361-380).
    """
    return (
        left.join(bridge, left[left_on] == bridge[bridge_left])
        .join(right, bridge[bridge_right] == right[right_on])
    )


# ------------------------------------------------------- aggs / windows

def latest_per_key(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """Most recent row per key (descending `order_col`, ties broken by
    the same column so the result is deterministic).

    Reference: ``select count from count_history where type=? and
    user=? order by datetime desc limit 1`` (utils.py:680-689).
    Scale: single hash-partition window; prefer ``max_by`` for a pure
    agg when only one payload column is needed (map-side partial agg,
    no full sort). We use row_number to keep the whole row.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def change_detection(df: DataFrame, keys: list[str], order_col: str,
                     value_col: str) -> DataFrame:
    """Keep rows where `value_col` differs from the previous observation
    for the same key — SCD-style append of changed values only.

    Reference: ``save_user_counts`` inserts a count_history row only
    when the count changed (utils.py:690-701).
    Scale: one window shuffle per key-partition; at 100 TB this is the
    canonical lag() pattern and partitions by the (type,user) key.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    prev = F.lag(F.col(value_col)).over(w)
    return (
        df.withColumn("__prev", prev)
        .filter(F.col("__prev").isNull() | (F.col(value_col) != F.col("__prev")))
        .drop("__prev")
    )


def top_k(df: DataFrame, order_cols: list, k: int) -> DataFrame:
    """Global top-k (ORDER BY ... LIMIT k).

    Reference: ``--stop_after`` caps (cli.py:200,230,798) and
    ``limit 1`` in the latest-count lookup (utils.py:687).
    Scale: Spark compiles this to TakeOrderedAndProject — per-partition
    heaps then a driver merge; no global sort materialization.
    """
    return df.orderBy(*order_cols).limit(k)


def facet_count(df: DataFrame, col: str, count_alias: str = "n") -> DataFrame:
    """Group-by facet count ordered desc — Datasette ``_facet=user``
    (README.md:212-214).

    Scale: hash agg with map-side partial combine; skewed facets are
    handled by AQE.
    """
    return df.groupBy(col).agg(F.count(F.lit(1)).alias(count_alias))


def page_min_max(df: DataFrame, keys: list[str], id_col: str = "id") -> DataFrame:
    """min/max id per key — the pagination/watermark bounds fold.

    Reference: ``min(t["id"])/max(t["id"])`` per page drive ``max_id``
    descent and the since_id watermark (utils.py:209-213).
    """
    return df.groupBy(*keys).agg(
        F.min(id_col).alias("min_id"), F.max(id_col).alias("max_id")
    )


def batch_chunks(df: DataFrame, order_col: str, chunk_size: int) -> DataFrame:
    """Assign a chunk number to each row in `order_col` order — the
    fixed-size buffering of the reference's writers (100-tweet chunks
    cli.py:312-320, 70/100-id API batches utils.py:475-505).

    Scale caveat: a *global* row_number needs a single ordered
    partition, which does not scale; at cluster scale the same effect
    is achieved per-partition (monotonically_increasing_id) or by the
    sink's own micro-batching. This operator exists for semantic
    parity and small keyed inputs.
    """
    w = Window.orderBy(F.col(order_col).asc())
    return df.withColumn(
        "chunk",
        F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(chunk_size)).cast("long"),
    )


def _range_split_prefix(df: DataFrame, order_col: str, tie_cols: list[str],
                        group_cols: list[str], val_col: str | None = None,
                        num_ranges: int | None = None,
                        with_totals: bool = False) -> DataFrame:
    """The ONE two-phase range-split prefix-sum skeleton behind
    :func:`batch_chunks_dist`, :func:`grouped_ntile_dist` and
    :func:`grouped_cumsum_dist` (they previously re-implemented it
    thrice — VERDICT r3 #6):

      1. materialize the input once (localCheckpoint — three passes
         follow: quantile probe, per-range stats, final join; an
         expensive upstream must not re-execute per pass),
      2. split the ORDER domain into ~balanced ranges via
         approxQuantile boundaries held as literals — the range id is
         a PURE FUNCTION of the order value, so every job recomputing
         the plan assigns identical ranges (repartitionByRange's
         sampling is job-nondeterministic and cannot be used here),
      3. local running stat via a window PARTITIONED BY
         (range, *group_cols) — row_number when ``val_col`` is None,
         running sum of ``val_col`` otherwise; at 1000 executors each
         window partition is one bounded task,
      4. per-(range, group) stat totals — |ranges|·|groups| rows,
         bounded by design parameters — collected, turned into
         per-group prefix offsets on the driver,
      5. offsets broadcast back and joined NULL-SAFELY on
         (range, *group_cols); global value = __off + __lval.

    Group columns keep their input types (the offset frame's schema is
    derived from the aggregate's schema, not hardcoded), group values
    may be NULL (None-safe driver sort + eqNullSafe join), and the
    offset column carries the exact Spark type of the partial stat.

    Returns the input + ``__pid`` (range id), ``__lval`` (local rank /
    running sum), ``__off`` (prefix over earlier ranges of the same
    group) and, when ``with_totals``, ``__n`` (per-group grand total).
    Callers combine and drop the helper columns.
    """
    spark = df.sparkSession
    df = df.localCheckpoint()
    n = num_ranges or spark.sparkContext.defaultParallelism
    probs = [i / n for i in range(1, n)]
    bounds = sorted(set(df.approxQuantile(order_col, probs, 0.001)))
    if bounds:
        barr = F.array(*[F.lit(float(b)) for b in bounds])
        pid = F.size(F.filter(barr, lambda b: b < F.col(order_col).cast("double")))
    else:
        pid = F.lit(0)
    order = [F.col(order_col).asc()] + [F.col(t).asc() for t in tie_cols]
    w = Window.partitionBy("__pid", *group_cols).orderBy(*order)
    if val_col is None:
        lval = F.row_number().over(w)
        stat = F.count(F.lit(1)).alias("__s")
    else:
        lval = F.sum(F.col(val_col)).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        stat = F.sum(F.col(val_col)).alias("__s")
    local = df.withColumn("__pid", pid).withColumn("__lval", lval)
    agg = local.groupBy("__pid", *group_cols).agg(stat)
    rows = agg.collect()
    # Ranges ascending within each group; the group key itself only
    # needs a stable (not semantic) order, so sort on a None-safe
    # stringified key — NULL groups and non-string group types both
    # survive (ADVICE r3).
    rows.sort(key=lambda r: (
        tuple((r[g] is None, str(r[g])) for g in group_cols), r["__pid"]))
    # The zero and the accumulator stay in the stat's own Python type
    # (int / float / Decimal) so the explicit offset schema verifies.
    sdt = agg.schema["__s"].dataType
    if isinstance(sdt, (T.DoubleType, T.FloatType)):
        zero = 0.0
    elif isinstance(sdt, T.DecimalType):
        from decimal import Decimal
        zero = Decimal(0)
    else:
        zero = 0
    acc: dict = {}
    offsets = []
    for r in rows:
        g = tuple(r[g] for g in group_cols)
        offsets.append((r["__pid"], *g, acc.get(g, zero)))
        acc[g] = acc.get(g, zero) + (r["__s"] if r["__s"] is not None else zero)
    # Offset-frame schema derived from the aggregate: group columns
    # keep their real types and __off gets the partial stat's type.
    off_schema = T.StructType(
        [T.StructField("__pid", T.IntegerType())]
        + [T.StructField(g, agg.schema[g].dataType) for g in group_cols]
        + [T.StructField("__off", agg.schema["__s"].dataType)]
    )
    off_df = F.broadcast(spark.createDataFrame(offsets, off_schema))
    cond = local["__pid"] == off_df["__pid"]
    for g in group_cols:
        cond = cond & local[g].eqNullSafe(off_df[g])
    out = local.join(off_df, cond).select(
        *[local[c] for c in local.columns], off_df["__off"])
    if with_totals:
        tot_schema = T.StructType(
            [T.StructField(g, agg.schema[g].dataType) for g in group_cols]
            + [T.StructField("__n", agg.schema["__s"].dataType)]
        )
        tot_df = F.broadcast(spark.createDataFrame(
            [(*g, v) for g, v in acc.items()], tot_schema))
        tcond = F.lit(True)
        for g in group_cols:
            tcond = tcond & out[g].eqNullSafe(tot_df[g])
        out = out.join(tot_df, tcond).select(
            *[out[c] for c in out.columns], tot_df["__n"])
    return out


def batch_chunks_dist(df: DataFrame, order_col: str, chunk_size: int,
                      num_partitions: int | None = None) -> DataFrame:
    """Distributed chunk assignment: identical semantics to
    ``batch_chunks`` for a unique `order_col`, with NO single-partition
    global window — the scale path (VERDICT r1 #3).

    Two-pass prefix sum, the zipWithIndex shape kept in the DataFrame
    API so Catalyst still sees the plan:

      1. split the key domain into ~balanced ranges via approxQuantile
         (driver holds n-1 boundary values — bounded); the range id is
         a PURE FUNCTION of the key, so every job recomputing the plan
         assigns identical ranges (repartitionByRange's sampling is
         job-nondeterministic and cannot be used here),
      2. per-range local ranks via a window PARTITIONED by range id
         (parallel across ranges),
      3. per-range row counts (one row per range) → cumulative offsets,
      4. broadcast the offsets back; global rank = offset + local rank.

    At 1000 executors each window partition is one task; nothing ever
    funnels through a single sorted partition.
    """
    local = _range_split_prefix(df, order_col, [], [], num_ranges=num_partitions)
    return (
        local.withColumn(
            "chunk",
            F.floor((F.col("__off") + F.col("__lval") - 1) / F.lit(chunk_size))
            .cast("long"),
        )
        .drop("__pid", "__lval", "__off")
    )


def distinct_values(df: DataFrame, cols: list[str]) -> DataFrame:
    """SELECT DISTINCT (README.md:326 follow recipe)."""
    return df.select(*cols).distinct()


def union_dedup_by_key(dfs: list[DataFrame], keys: list[str], order_col: str) -> DataFrame:
    """Union several batches and keep the winning row per key (highest
    `order_col`) — the set-union + pk-dedup implicit in every ingest
    loop (SURVEY §2.7).
    """
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d, allowMissingColumns=True)
    return latest_per_key(out, keys, order_col)


# ------------------------------------------------- incremental filters

def watermark_filter(df: DataFrame, id_col: str, since_id: int | None) -> DataFrame:
    """Keep only rows above the stored high-water mark.

    Reference: ``since_id`` request param (utils.py:179-180) + the
    since_ids checkpoint table (utils.py:214-222).
    Scale: a plain comparison predicate — pushed into the parquet scan
    (shows up in PushedFilters), so old data is never read.
    """
    if since_id is None:
        return df
    return df.filter(F.col(id_col) > F.lit(since_id))


# ---------------------------------------------- event-time operators

def sessionize(df: DataFrame, user_col: str, ts_col: str, order_col: str,
               gap_seconds: float = 1800.0) -> DataFrame:
    """Gaps-and-islands sessionization: rows of one user separated by
    more than ``gap_seconds`` start a new session; adds a per-user
    ``session_seq`` (1-based).

    The batch shape of Structured Streaming's ``session_window`` —
    offline replays and backfills sessionize with plain windows so both
    paths agree. The gap is ``timestampdiff(MICROSECOND, prev, ts)``:
    for TIMESTAMP_NTZ inputs that is the NAIVE wall-clock difference —
    independent of the session time zone (a cast through "timestamp"
    would route NTZ values through the session zone and shift gaps
    across a DST fold by up to an hour) and exactly DuckDB's
    ``epoch(ts) - epoch(prev)`` arithmetic; for LTZ inputs it is the
    instant difference, also correct. Microsecond precision is the
    timestamp type's native resolution, so nothing is truncated.

    Scale: one shuffle on ``user_col``; both windows share that
    partitioning (Catalyst plans a single Exchange). Skewed users are
    real sessions — they must sort together by definition.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    with_prev = df.withColumn("__prev", F.lag(F.col(ts_col)).over(w))
    gap = F.expr(f"timestampdiff(MICROSECOND, __prev, `{ts_col}`)")
    new_session = F.when(
        F.col("__prev").isNull()
        | (gap > F.lit(gap_seconds * 1_000_000.0)),
        1,
    ).otherwise(0)
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        with_prev.withColumn("__new", new_session)
        .withColumn("session_seq", F.sum("__new").over(running))
        .drop("__new", "__prev")
    )


def asof_join(left: DataFrame, right: DataFrame, key: str, ts_col: str,
              order_col: str, payload_cols: list[str],
              prefix: str = "asof_") -> DataFrame:
    """As-of join: each left row gains the payload of the LATEST right
    row of the same key with ``right.ts <= left.ts`` (ties on ts broken
    by ``order_col``, nulls when no prior right row exists).

    Spark has no built-in as-of join; the pair-explosion formulation
    (range join + top-1) is O(|L|·|R|) per key. This is the
    merge-union shape instead: tag both sides, union, and take a
    running ``last(payload_struct, ignorenulls=True)`` over (ts, side,
    order) within each key — right rows sort before left rows at equal
    ts, so "<=" semantics fall out of the sort order. One shuffle on
    the key, zero joins, linear in |L|+|R| — the same plan
    pandas.merge_asof parallelizes to, and safe at 100 TB where a
    range join is not.

    The payload travels as ONE struct, not per-column ``last`` calls:
    a right row whose latest value for some column is null must yield
    that null (per-column ignorenulls would back-fill it from an OLDER
    right row, stitching together a row that never existed — the
    struct is non-null per right row, so ignorenulls only skips the
    left-side rows it is meant to skip).
    """
    r = right.select(
        F.col(key),
        F.col(ts_col).alias("__ats"),
        F.col(order_col).alias("__aord"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__apay"),
    ).withColumn("__side", F.lit(0))
    l = (
        left.withColumn("__ats", F.col(ts_col))
        .withColumn("__aord", F.col(order_col))
        .withColumn("__side", F.lit(1))
    )
    merged = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("__ats", "__side", "__aord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__apay", F.last("__apay", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1)
    for c in payload_cols:
        out = out.withColumn(prefix + c, F.col("__apay")[c])
    return out.drop("__ats", "__aord", "__side", "__apay")


# ------------------------------------------------------- text search

def tokenize(df: DataFrame, text_col: str, out_col: str = "term") -> DataFrame:
    """Lowercase word tokenization — the unit of the FTS index.

    Reference: FTS5 on tweets.full_text (utils.py:352) / users fields
    (utils.py:330-332).
    """
    return df.withColumn(
        out_col,
        F.explode(F.split(F.lower(F.col(text_col)), r"\W+")),
    ).filter(F.length(out_col) > 0)


def build_inverted_index(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Materialized inverted index: (term, doc id, term frequency).

    The Spark answer to SQLite FTS5 (SURVEY §2.9 T1/T2): a derived
    table, partitionable by term, that turns text search into an
    equi-join instead of a full scan.
    Scale: explode fans out ~#tokens rows; groupBy(term,id) does a
    map-side partial count first. Persist bucketed by term for reuse.
    """
    return (
        tokenize(df.select(id_col, text_col), text_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __dl): token count per document WITHOUT exploding — a
    codegen'd size(filter(split(...))) per row, exactly sum(tf) of the
    inverted index built from the same tokenizer."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\W+"),
        lambda t: F.length(t) > 0,
    )
    return df.select(
        F.col(id_col), F.size(toks).cast("double").alias("__dl")
    ).filter(F.col("__dl") > 0)  # token-less docs have no index rows


def fts_search(index: DataFrame, id_col: str, terms: list[str],
               mode: str = "all") -> DataFrame:
    """Doc ids matching the query terms via the inverted index.

    mode="all": every term must appear (FTS AND, the FTS5 default);
    mode="any": at least one.
    Scale: broadcast the tiny term list; one partial-agg groupBy.
    """
    terms_l = [t.lower() for t in terms]
    hits = index.filter(F.col("term").isin(terms_l))
    agg = hits.groupBy(id_col).agg(F.countDistinct("term").alias("__nterms"))
    if mode == "all":
        agg = agg.filter(F.col("__nterms") == len(set(terms_l)))
    return agg.select(id_col)


def fts_bm25(index: DataFrame, id_col: str, terms: list[str],
             k1: float = 1.2, b: float = 0.75,
             mode: str = "all",
             doc_lens: DataFrame | None = None) -> DataFrame:
    """Okapi BM25-ranked text search over the inverted index — the
    Spark analogue of FTS5's ``bm25()`` rank function (the reference
    exposes FTS5 search via ``--fts``; FTS5's default rank is bm25 with
    the same k1=1.2, b=0.75 defaults used here).

    ``index`` is a ``build_inverted_index`` output (term, id, tf) —
    pass a persisted/bucketed index at scale so the tokenize fan-out
    runs once, not per query. All corpus statistics (N, avgdl, df) are
    integer-valued and therefore exact in double arithmetic, so the
    score is reproducible across engines up to last-ulp ``ln``
    differences; callers compare on ``round(score, 4)``.

    Scale: df and the (n, avgdl) singleton broadcast; the only wide
    shuffles are the per-doc aggregations, partial-agg'd map-side. No
    UDFs — the score is one codegen'd column expression.

    ``doc_lens`` (optional: (id, __dl)) supplies document lengths from
    a cheaper source than re-aggregating the index — e.g.
    ``doc_lengths`` counts tokens per row with NO explode, saving one
    full index scan when the index isn't persisted. Must equal
    sum(tf) per doc (it does for any tokenizer-consistent source).
    """
    terms_l = sorted({t.lower() for t in terms})
    dl = (doc_lens if doc_lens is not None else
          index.groupBy(id_col).agg(F.sum("tf").cast("double").alias("__dl")))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    hits = index.filter(F.col("term").isin(terms_l))
    dfreq = hits.groupBy("term").agg(
        F.countDistinct(id_col).cast("double").alias("__df")
    )
    tf = F.col("tf").cast("double")
    idf = F.log((F.col("__n") - F.col("__df") + 0.5) / (F.col("__df") + 0.5) + 1)
    score = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl")))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("__s", score)
    )
    agg = scored.groupBy(id_col).agg(
        F.sum("__s").alias("__score"),
        F.countDistinct("term").alias("__nterms"),
    )
    if mode == "all":
        agg = agg.filter(F.col("__nterms") == len(terms_l))
    return agg.select(id_col, F.round("__score", 4).alias("score"))


def keyword_track_filter(df: DataFrame, text_col: str, phrases: list[str]) -> DataFrame:
    """Streaming `track` semantics: a row matches if, for at least one
    phrase, every term of that phrase appears in the lowercased text.

    Reference: track keyword filter (cli.py:644-668, utils.py:603-615)
    — Twitter matches phrases as AND-of-terms, OR across phrases.
    Scale: pure column predicate (token-array containment), stays in
    whole-stage codegen; no UDF.
    """
    toks = F.split(F.lower(F.col(text_col)), r"\W+")
    phrase_preds = []
    for phrase in phrases:
        terms = [t for t in phrase.lower().split() if t]
        pred = F.lit(True)
        for t in terms:
            pred = pred & F.array_contains(toks, t)
        phrase_preds.append(pred)
    combined = phrase_preds[0]
    for p in phrase_preds[1:]:
        combined = combined | p
    return df.filter(combined)


def salted_facet_count(df: DataFrame, col: str, count_alias: str = "n",
                       n_salt: int = 16) -> DataFrame:
    """Two-phase salted facet count for ADVERSARIALLY skewed keys.

    A plain groupBy on a key where one value holds most rows sends
    that value's every record to one reducer. Salting splits each key
    into `n_salt` sub-groups (salt = deterministic row hash, so results
    are reproducible), aggregates partially per (key, salt), then sums
    the ≤ n_salt partials per key — the hot key's work spreads across
    n_salt tasks and the second shuffle carries only
    |distinct keys| × n_salt rows.

    Same answer as :func:`facet_count` for any input (count is
    salt-decomposable; asserted against the same oracle). Prefer AQE's
    runtime skew handling by default; reach for explicit salting when
    the skew is in a GROUP BY (AQE splits skewed JOIN partitions, not
    aggregations) or the engine runs without AQE.

    The salt must NOT depend on row content — a flood of bytewise-
    identical rows (the adversarial case) would hash to ONE salt and
    re-concentrate on a single reducer. monotonically_increasing_id is
    position-based (partition id in the high bits), so identical rows
    spread; the aggregate's value is independent of the assignment, so
    retries/layout changes cannot change the result.
    """
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    partial = (
        df.withColumn("__salt", salt)
        .groupBy(col, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    return partial.groupBy(col).agg(F.sum("__c").alias(count_alias))


def salted_join(fact: DataFrame, dim: DataFrame, key: str,
                n_salt: int = 16, how: str = "inner") -> DataFrame:
    """Skew-mitigated equi-join: the JOIN counterpart of
    :func:`salted_facet_count`. A hot join key sends its every fact
    row to one reducer in a plain shuffle join; here each fact row
    gets a deterministic position-based salt and the (smaller) right
    side is replicated onto ALL `n_salt` salt values, so the join key
    becomes (key, salt) and the hot key's rows spread over n_salt
    tasks.

    Same answer as a plain join for any input (each fact row still
    meets every matching right row exactly once — on its own salt).
    Cost model: the right side is scanned once and exploded n_salt×,
    so use this when the right side is too big to broadcast but far
    smaller than the skewed fact side — the classic mid-size-dimension
    regime. Prefer AQE skew-join handling by default (it splits skewed
    partitions at runtime without replication); reach for explicit
    salting when running without AQE or when the skew is so extreme
    one KEY (not one partition) dominates — AQE cannot split a single
    key's hash group, salting can.

    The salt is position-based (monotonically_increasing_id), not
    content-based, for the same adversarial reason as the salted
    count: identical flooding rows must still spread. The join's
    multiset result is independent of the assignment.

    Only fact-preserving join types are accepted: a right/full outer
    join would emit an unmatched dim row once PER SALT REPLICA (up to
    n_salt null-extended copies) — not the plain join's answer. Salt
    the other side instead for those.
    """
    allowed = {"inner", "left", "left_outer", "leftouter",
               "left_semi", "leftsemi", "left_anti", "leftanti",
               "cross"}
    if how.lower().replace("_", "") not in {
        a.replace("_", "") for a in allowed
    }:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"({sorted(allowed)}); got {how!r} — an outer join would "
            f"duplicate unmatched dim rows once per salt replica"
        )
    salt = F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(n_salt))
    f = fact.withColumn("__salt", salt)
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    return f.join(d, [key, "__salt"], how).drop("__salt")


def grouped_ntile_dist(df: DataFrame, group_col: str, range_col: str,
                       tie_col: str, n_buckets: int,
                       num_ranges: int | None = None,
                       bucket_col: str = "bucket") -> DataFrame:
    """Per-group ntile with NO low-cardinality window — the scale form
    of ``ntile(b) OVER (PARTITION BY group ORDER BY range_col, tie_col)``.

    A per-group window puts EVERY row of a group through one task —
    fine for high-cardinality keys, a single-task sort of billions of
    rows when the group is something like `language`. This is the
    ``batch_chunks_dist`` two-phase prefix-sum generalized to grouped
    ranks:

      1. split the ORDER domain into ~balanced ranges (approxQuantile
         boundaries become literals; the range id is a pure function
         of the order value, and a tie can never straddle a boundary
         because assignment uses strict comparison),
      2. local ranks via a window partitioned by (range, group) — at
         1000 executors each is one bounded task,
      3. per-(range, group) counts (|ranges|·|groups| rows — bounded)
         → per-group prefix offsets and totals on the driver,
      4. broadcast back; global rank = offset + local rank; the bucket
         is standard front-loaded ntile arithmetic over (rank, n).

    ``range_col`` must be numeric and ASCENDING in the desired order
    (negate for DESC — exact for our rounded scores); ``tie_col``
    makes the order total so ranks are engine-independent.

    All the two-phase machinery lives in :func:`_range_split_prefix`;
    this function only adds the front-loaded ntile arithmetic over
    (global rank, per-group total).
    """
    local = _range_split_prefix(df, range_col, [tie_col], [group_col],
                                num_ranges=num_ranges, with_totals=True)
    rank = F.col("__off") + F.col("__lval")
    b = F.lit(n_buckets)
    size = F.floor(F.col("__n") / b)
    rem = F.col("__n") % b
    head = rem * (size + 1)
    bucket = F.when(
        rank <= head, F.floor((rank - 1) / (size + 1)) + 1
    ).otherwise(
        # size can only be 0 when n < b, and then every rank is in the
        # head branch — the else division is never 0/0 on a real row.
        rem + F.floor((rank - head - 1) / size) + 1
    )
    return (
        local.withColumn(bucket_col, bucket.cast("long"))
        .drop("__pid", "__lval", "__off", "__n")
    )


def grouped_cumsum_dist(df: DataFrame, group_col: str, range_col: str,
                        tie_col: str, val_col: str,
                        num_ranges: int | None = None,
                        out_col: str = "cum") -> DataFrame:
    """Per-group running SUM with NO low-cardinality window — the
    scale form of ``sum(val) OVER (PARTITION BY group ORDER BY
    range_col, tie_col ROWS UNBOUNDED PRECEDING)``, the shape behind
    budgeted selection and corpus-mixture cuts.

    Same two-phase machinery as :func:`grouped_ntile_dist`, with the
    per-(range, group) statistic being the SUM of ``val_col`` instead
    of the row count: local running sums parallel across ranges, one
    bounded |ranges|·|groups| aggregate, per-group prefix offsets
    broadcast back. Exact when ``val_col`` is integral (offsets add
    exactly); for float values prefer casting to DECIMAL first.
    All machinery in :func:`_range_split_prefix` (the ``val_col``
    variant: local running sums instead of local ranks).
    """
    local = _range_split_prefix(df, range_col, [tie_col], [group_col],
                                val_col=val_col, num_ranges=num_ranges)
    return (
        local.withColumn(out_col, F.col("__off") + F.col("__lval"))
        .drop("__pid", "__lval", "__off")
    )


# ------------------------------------------------ interval / funnel

def interval_join(left: DataFrame, right: DataFrame, left_ts: str,
                  right_start: str, right_end: str,
                  keys: list[str] | None = None,
                  bucket_seconds: float = 1800.0) -> DataFrame:
    """Interval (range-containment) join: pair each left row with every
    right row whose ``[right_start, right_end)`` interval contains
    ``left.left_ts`` — with or without an equi-key.

    Spark plans a bare inequality join as BroadcastNestedLoopJoin:
    O(|L|·|R|) pair evaluations and a broadcast of one whole side —
    unusable at scale. This is the bucketed formulation instead:
    quantize time into fixed ``bucket_seconds`` buckets, explode each
    right interval onto every bucket it overlaps, and equi-join on
    (bucket [, keys]) BEFORE applying the exact containment predicate.
    The inequality then only runs on co-bucketed candidates.

    Scale: one shuffled equi-join (SMJ/SHJ — never a nested loop; the
    plan test pins this), candidate count = Σ_bucket |L_b|·|R_b|
    instead of |L|·|R|. Pick ``bucket_seconds`` ≥ the typical interval
    length: the per-interval explode factor is
    ceil(len/bucket)+1 ≤ 2 for intervals no longer than a bucket, so
    the right side at most doubles. Degenerate right rows with
    ``end <= start`` (empty intervals) are dropped — they can match
    nothing, and Spark's ``sequence(lo, hi)`` would otherwise step
    DOWNWARD for hi < lo and fabricate buckets.

    Timestamps are converted to epoch micros with an NTZ-to-NTZ
    timestampdiff (not ``unix_micros``) so NTZ inputs are independent
    of the session time zone — the same device as ``q_sessionize``.
    Column names must be disjoint across the two sides apart from
    ``keys``.
    """
    bw = int(bucket_seconds * 1_000_000)

    def _us(c: str):
        return F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
            f"00:00:00', cast(`{c}` as timestamp_ntz))"
        )

    # Bucket ids use integer `div` on the epoch micros, never a float
    # quotient — the resample_fill convention: a double division is
    # exact only below 2^53, so nanos-scale longs could floor into the
    # wrong bucket and drop boundary rows when the two sides round
    # differently.
    l = (
        left.withColumn("__lus", _us(left_ts))
        .withColumn("__bkt", F.expr(f"__lus div {bw}"))
    )
    r = (
        right.withColumn("__sus", _us(right_start))
        .withColumn("__eus", _us(right_end))
        .filter(F.col("__eus") > F.col("__sus"))
        .withColumn(
            "__bkt",
            F.explode(
                F.sequence(
                    F.expr(f"__sus div {bw}"),
                    F.expr(f"(__eus - 1) div {bw}"),
                )
            ),
        )
    )
    on = ["__bkt"] + list(keys or [])
    return (
        l.join(r, on=on, how="inner")
        .filter(
            (F.col("__lus") >= F.col("__sus"))
            & (F.col("__lus") < F.col("__eus"))
        )
        .drop("__bkt", "__lus", "__sus", "__eus")
    )


def funnel_fold(steps: list[str], ts_type,
                with_latencies: bool = False,
                within=None):
    """THE one definition of the ordered-funnel automaton: returns
    ``(zero, step_fn)`` for an ``F.aggregate`` fold over a time-sorted
    array of ``struct(t, y)`` events — shared by :func:`funnel`, the
    latency variant (plans/catalog.py ``q_funnel_latency``), and the
    windowed form, so the batch automata can never drift apart through
    a tweak to one copy (the streaming twin in streaming/analytics.py
    is necessarily separate but agreement-tested).

    The accumulator is ``(stage, t)``: the fold advances to stage k+1
    on the first ``steps[k]`` event strictly later than the stage-k
    timestamp — first-match in sorted order IS the conditional
    minimum, so the result equals the relational chain
    s1 = min ts(step1); s_k = min ts(step_k) > s_{k-1}.

    ``with_latencies`` extends the accumulator with ``lat1..lat{n-1}``
    (step-to-step gaps, recorded on each advance) — requires a numeric
    ``ts_type`` (epoch micros).

    ``within`` adds the windowed-funnel conjunct: an advance past
    stage 1 also requires ``e.t - acc.t <= within`` (same units as
    ``t`` — numeric ``ts_type``). Equivalence to the conditional-min
    chain still holds with the extra conjunct: both predicates depend
    only on the fixed stage-(k-1) timestamp, so the first qualifying
    event in sorted order is still the minimum of the qualifying set.
    An event of type k beyond the window does NOT reset the automaton
    (times only grow, so once past the window stage k is unreachable
    — exactly the chain's empty-set semantics).
    """
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    fields = [F.lit(0).alias("stage"), F.lit(None).cast(ts_type).alias("t")]
    if with_latencies:
        fields += [F.lit(None).cast("long").alias(f"lat{k}")
                   for k in range(1, n)]
    zero = F.struct(*fields)

    def _step(acc, e):
        # The index is clamped: once stage == n the first conjunct is
        # false and Spark's And short-circuits, but relying on
        # evaluation order around an ANSI out-of-bounds element_at is
        # brittle — least() makes the expression total either way.
        nxt = F.element_at(steps_arr, F.least(acc["stage"] + 1, F.lit(n)))
        gate = (acc["stage"] == F.lit(0)) | (e["t"] > acc["t"])
        if within is not None:
            gate = gate & (
                (acc["stage"] == F.lit(0))
                | (e["t"] - acc["t"] <= F.lit(within))
            )
        advance = (acc["stage"] < F.lit(n)) & (e["y"] == nxt) & gate
        out = [(acc["stage"] + 1).alias("stage"), e["t"].alias("t")]
        if with_latencies:
            for k in range(1, n):
                out.append(
                    F.when(acc["stage"] == k, e["t"] - acc["t"])
                    .otherwise(acc[f"lat{k}"]).alias(f"lat{k}")
                )
        return F.when(advance, F.struct(*out)).otherwise(acc)

    return zero, _step


def funnel(df: DataFrame, user_col: str, ts_col: str, type_col: str,
           steps: list[str],
           within_seconds: float | None = None) -> DataFrame:
    """Ordered-funnel analysis: how many users completed step 1, then
    step 2 strictly after it, then step 3 strictly after that, …
    Returns one row per step: (step, step_name, users).

    Spark has no MATCH_RECOGNIZE; the scalable single-pass form is a
    per-user automaton: filter to funnel events, one shuffle to group
    each user's events, sort them by time, and fold a (stage,
    last_ts) accumulator over the sorted list with ``F.aggregate`` —
    all JVM-side expressions, no Python. The fold advances to stage
    k+1 on the first ``steps[k]`` event strictly later than the
    stage-k timestamp, which is exactly the relational chain
    s1 = min ts(step1); s_k = min ts(step_k) > s_{k-1} — first-match
    in sorted order IS the minimum, and the strict ``>`` makes the
    result independent of sort-tie order at equal timestamps.

    Scale: per-user state is the user's FUNNEL events only (already
    filtered to ``steps``); for behavioral event streams that is
    session-bounded. If a key can hold unboundedly many funnel events,
    use the n-aggregation join chain (one conditional-min pass per
    step) instead — same answer, n shuffles, no per-key list.
    Null users are excluded: a funnel requires an identity.

    ``within_seconds`` makes this a WINDOWED funnel: each advance past
    step 1 must land within that many seconds of the previous step's
    timestamp (the real conversion-funnel constraint). The timestamp
    column is then routed through epoch micros (NTZ-safe
    timestampdiff) so the gap arithmetic is exact integers.
    """
    n = len(steps)
    within_us = None
    if within_seconds is not None:
        within_us = int(within_seconds * 1_000_000)
        df = df.withColumn(
            ts_col,
            F.expr(
                "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
                f"00:00:00', cast(`{ts_col}` as timestamp_ntz))"
            ),
        )
    ts_type = df.schema[ts_col].dataType
    ev = df.filter(
        F.col(type_col).isin(steps) & F.col(user_col).isNotNull()
    ).select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__ty"),
    )
    per_user = ev.groupBy("__u").agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("__ts").alias("t"), F.col("__ty").alias("y"))
            )
        ).alias("__evs")
    )
    zero, _step = funnel_fold(steps, ts_type, within=within_us)

    staged = per_user.select(
        F.aggregate("__evs", zero, _step)["stage"].alias("__stage")
    )
    one = staged.agg(
        *[
            F.coalesce(
                F.sum((F.col("__stage") >= F.lit(k + 1)).cast("long")),
                F.lit(0).cast("long"),
            ).alias(f"__s{k + 1}")
            for k in range(n)
        ]
    )
    return one.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k + 1).cast("long").alias("step"),
                        F.lit(steps[k]).alias("step_name"),
                        F.col(f"__s{k + 1}").alias("users"),
                    )
                    for k in range(n)
                ]
            )
        ).alias("r")
    ).select("r.step", "r.step_name", "r.users")


def ewma(df: DataFrame, key_col: str, order_col: str, val_col: str,
         alpha: float = 0.2, window: int = 16,
         out_col: str = "ewma") -> DataFrame:
    """Truncated exponentially-weighted moving average per key: for
    each row, fold the trailing ``window`` values (oldest → newest)
    through ``acc·(1−α) + α·x`` with zero init — the EWMA recurrence
    itself, evaluated over a bounded frame. The standard smoothing
    feature for monitoring/forecasting pipelines.

    Why this shape: the exact infinite-history EWMA is a linear
    recurrence that only a sequential scan computes; truncating at W
    rows bounds per-row state AND the discarded history's influence
    (≤ (1−α)^W ≈ 3% at α=0.2, W=16) while keeping everything a plain
    partitioned window — no pow() (whose libm rounding differs across
    engines), no UDF, no sequential bottleneck. Both engines fold the
    same values in the same order with the same fused arithmetic, so
    results are bit-identical before the final round(6). NULL values
    are excluded up front (they would poison the fold).

    Scale: one shuffle on the key; per-row work is a W-element JVM
    fold inside the ordered window scan.
    """
    one_minus = 1.0 - alpha
    w = (
        Window.partitionBy(key_col).orderBy(order_col)
        .rowsBetween(-(window - 1), 0)
    )
    lst = F.collect_list(F.col(val_col).cast("double")).over(w)
    fold = F.aggregate(
        lst, F.lit(0.0),
        lambda acc, x: acc * F.lit(one_minus) + F.lit(alpha) * x,
    )
    return df.filter(
        F.col(key_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        key_col, order_col, val_col, F.round(fold, 6).alias(out_col)
    )


def snapshot_diff(old: DataFrame, new: DataFrame, key_cols: list[str],
                  compare_cols: list[str]) -> DataFrame:
    """Change-data-capture between two snapshots of a keyed table:
    one row per key whose state changed, labeled ``added`` (key only
    in new), ``removed`` (only in old), or ``changed`` (present in
    both with any compare column differing, null-safely). Unchanged
    keys are not emitted — at 100 TB the diff is the small output, the
    snapshots are the big inputs. This is the reverse direction of the
    reference's upsert machinery (K1 writes changes in; this reads
    changes back out, the Delta CDF idea as a plain plan).

    Returns (key…, change_type, old/new compare columns prefixed).
    Keys must be non-null in both snapshots (enforced by filter — a
    NULL pk identifies nothing).

    Scale: ONE full-outer shuffle join on the key — both sides
    partition by the same key, no window, no driver state. With both
    snapshots bucketed on the key (operators/bucketing.py) the
    exchange disappears entirely.
    """
    o = old
    n = new
    for k in key_cols:
        o = o.filter(F.col(k).isNotNull())
        n = n.filter(F.col(k).isNotNull())
    o = o.select(
        *key_cols,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(True).alias("__in_old"),
    )
    n = n.select(
        *key_cols,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(True).alias("__in_new"),
    )
    j = o.join(n, key_cols, "full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"old_{c}").eqNullSafe(
            F.col(f"new_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        j.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .drop("__in_old", "__in_new")
    )


def apply_changelog(snapshot: DataFrame, changes: DataFrame,
                    key_cols: list[str], op_col: str,
                    order_col: str) -> DataFrame:
    """Apply a CDC changelog (upsert/delete ops) to a snapshot: for
    each key, the LATEST change by ``order_col`` wins — an ``upsert``
    replaces (or inserts) the row, a ``delete`` removes it; keys
    untouched by the log pass through. The inverse of
    :func:`snapshot_diff`, and the generalization of the reference's
    INSERT OR REPLACE (K1) to logs that can also delete.

    ``changes`` carries the snapshot's columns plus ``op_col`` ∈
    {'upsert', 'delete'} and the ordering column. Returns the new
    snapshot (original columns only).

    Scale: one window shuffle on the key over the CHANGELOG (small
    relative to the snapshot), then one key-partitioned outer join
    against the snapshot — the standard merge shape; on Delta this is
    exactly MERGE WHEN MATCHED [AND op='delete'] THEN DELETE.
    """
    cols = snapshot.columns
    w = Window.partitionBy(*key_cols).orderBy(F.col(order_col).desc())
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*key_cols,
                F.col(op_col).alias("__op"),
                *[F.col(c).alias(f"__new_{c}")
                  for c in cols if c not in key_cols])
    )
    j = snapshot.join(latest, key_cols, "full_outer")
    keep = F.col("__op").isNull() | (F.col("__op") == "upsert")
    out_cols = [
        F.col(k) for k in key_cols
    ] + [
        F.when(F.col("__op") == "upsert", F.col(f"__new_{c}"))
        .otherwise(F.col(c)).alias(c)
        for c in cols if c not in key_cols
    ]
    return j.filter(keep).select(*out_cols)


def attribute_conversions(df: DataFrame, user_col: str, ts_col: str,
                          order_col: str, type_col: str,
                          conversion: str, touch_types: list[str],
                          within_seconds: float | None = None
                          ) -> DataFrame:
    """Marketing-style conversion attribution: one row per conversion
    event with its FIRST-touch and LAST-touch attributed events —
    the earliest / latest preceding touch of an allowed type in the
    same user's stream, each as (epoch-micros, type), latency to the
    last touch, and an ``attributed`` flag. ``within_seconds`` voids
    a last-touch attribution older than the lookback window (the
    standard attribution-window rule).

    One user-keyed window shuffle computes everything: first/last
    with ignorenulls over a ROWS UNBOUNDED PRECEDING..1 PRECEDING
    frame of the conditional touch struct — no self-join of
    conversions against touches (the naive range-join formulation
    shuffles the stream twice and explodes on dense users). Epoch
    micros via timestampdiff so NTZ inputs never route through the
    session time zone (the sessionize device).
    """
    us = F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 "
        f"00:00:00', cast(`{ts_col}` as timestamp_ntz))")
    d = df.withColumn("__us", us)
    touch = F.when(
        F.col(type_col).isin(*touch_types),
        F.struct(F.col("__us").alias("t"),
                 F.col(type_col).alias("ty")),
    )
    d = d.withColumn("__touch", touch)
    w = (
        Window.partitionBy(user_col).orderBy("__us", order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    first_t = F.first("__touch", ignorenulls=True).over(w)
    last_t = F.last("__touch", ignorenulls=True).over(w)
    conv = (
        d.withColumn("__ft", first_t)
        .withColumn("__lt", last_t)
        .filter(F.col(type_col) == conversion)
    )
    lt_ok = F.col("__lt").isNotNull()
    if within_seconds is not None:
        lt_ok = lt_ok & (
            F.col("__us") - F.col("__lt.t")
            <= F.lit(int(within_seconds * 1_000_000)))
    return conv.select(
        F.col(order_col), F.col(user_col),
        F.col("__us").alias("conv_us"),
        F.col("__ft.ty").alias("first_touch_type"),
        F.col("__ft.t").alias("first_touch_us"),
        F.when(lt_ok, F.col("__lt.ty")).alias("last_touch_type"),
        F.when(lt_ok, F.col("__lt.t")).alias("last_touch_us"),
        F.when(lt_ok, F.col("__us") - F.col("__lt.t"))
        .alias("latency_us"),
        lt_ok.alias("attributed"),
    )


def weighted_delta_agg(changes: DataFrame, key_cols: list[str],
                       weight_col: str, value_col: str) -> DataFrame:
    """Fold a weighted changelog (+1 insert / −1 retraction rows) into
    per-group aggregate deltas: (keys, n_rows = Σw, v_sum =
    Σ w·value). Updates are encoded as a retraction of the old row
    plus an insertion of the new one — the standard z-relation /
    incremental-view-maintenance encoding. The value term is summed in
    DECIMAL(18,4) so the delta is exact and commutes with the base
    (no float-order drift between maintain-and-merge and recompute).

    Rows whose value is NULL still move ``n_rows`` (a retraction of a
    NULL-valued row must decrement the count) while leaving ``v_sum``
    untouched, matching COUNT(*)/SUM semantics on both engines.

    ``n_vals`` (Σ w over non-NULL values) is maintained alongside:
    without it, a merged partial cannot distinguish "contributions
    canceled to 0" from "only NULL values remain", and SUM's
    all-NULL→NULL contract breaks (caught by the hypothesis law).
    """
    w = F.col(weight_col).cast("long")
    return (
        changes.groupBy(*key_cols)
        .agg(
            F.sum(w).alias("n_rows"),
            F.sum(
                F.when(F.col(value_col).isNotNull(), w)
                .otherwise(F.lit(0))
            ).alias("n_vals"),
            F.sum(
                (w * F.col(value_col)).cast("decimal(18,4)")
            ).alias("v_sum"),
        )
    )


def merge_agg_delta(base: DataFrame, delta: DataFrame,
                    key_cols: list[str], n_col: str = "n_rows",
                    sum_col: str = "v_sum") -> DataFrame:
    """Incremental maintenance of a (COUNT, SUM) materialized
    aggregate: merge the stored per-group partials with a changelog's
    deltas (from :func:`weighted_delta_agg`) WITHOUT rescanning the
    base rows. One full-outer key join of two already-aggregated
    frames; groups whose maintained count reaches 0 disappear, new
    groups appear from the delta side. Because both sides carry exact
    DECIMAL sums, merge(base, delta) is provably equal to recomputing
    the aggregate over the maintained table — the invariant the
    catalog query's oracle checks by doing exactly that recompute.

    Scale: this is THE reason to maintain a 100 TB fact table's
    rollups incrementally — the join touches |groups| + |changed
    groups| rows, never the fact table. With AQE both inputs are
    small enough to broadcast in practice.
    """
    b = base.select(
        *key_cols,
        F.col(n_col).alias("__bn"), F.col("n_vals").alias("__bk"),
        F.col(sum_col).alias("__bv"))
    d = delta.select(
        *key_cols,
        F.col(n_col).alias("__dn"), F.col("n_vals").alias("__dk"),
        F.col(sum_col).alias("__dv"))
    j = b.join(d, key_cols, "full_outer")
    n = (F.coalesce(F.col("__bn"), F.lit(0))
         + F.coalesce(F.col("__dn"), F.lit(0)))
    nv = (F.coalesce(F.col("__bk"), F.lit(0))
          + F.coalesce(F.col("__dk"), F.lit(0)))
    zero = F.lit(0).cast("decimal(18,4)")
    # SUM's all-NULL contract: once no non-NULL contribution remains,
    # the maintained sum must report NULL, not a canceled-out 0
    v = F.when(
        nv == 0, F.lit(None).cast("decimal(18,4)")
    ).otherwise(F.coalesce(F.col("__bv"), zero)
                + F.coalesce(F.col("__dv"), zero))
    return (
        j.select(*key_cols, n.alias(n_col), nv.alias("n_vals"),
                 v.alias(sum_col))
        .filter(F.col(n_col) != 0)
    )


def trailing_zscore(df: DataFrame, key_col: str, order_col: str,
                    val_col: str, window: int = 16,
                    min_points: int = 8,
                    threshold: float = 3.0) -> DataFrame:
    """Leakage-free anomaly scoring: each value's z-score against the
    trailing ``window`` PRECEDING values of its key (frame excludes
    the current row — the score an online monitor could actually have
    computed at event time). Returns (key, order, value, zscore,
    is_anomaly) with zscore NULL until ``min_points`` history exists
    or while the trailing std is 0.

    The anomaly flag is computed from the ROUNDED z-score (round 4),
    so the float boundary both engines compare is identical — the
    repo's standard order-noise absorption, applied before the
    threshold instead of after.

    Scale: one shuffle on the key; mean/std are single-pass window
    aggregates over each key's time-sorted rows.
    """
    w = (
        Window.partitionBy(key_col).orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(val_col).cast("double")
    n = F.count(v).over(w)
    mean = F.avg(v).over(w)
    std = F.stddev_samp(v).over(w)
    z = F.when(
        (n >= min_points) & (std > 0),
        F.round((v - mean) / std, 4),
    )
    return df.filter(
        F.col(key_col).isNotNull() & F.col(val_col).isNotNull()
    ).select(
        key_col, order_col, val_col,
        z.alias("zscore"),
        F.coalesce(F.abs(z) > F.lit(threshold), F.lit(False))
        .alias("is_anomaly"),
    )


def scd2_history(df: DataFrame, key_cols: list[str], order_col: str,
                 ts_col: str, attr_cols: list[str]) -> DataFrame:
    """Type-2 slowly-changing-dimension historization: collapse a
    change stream ``(key, ts, attrs…)`` into validity intervals — one
    row per ATTRIBUTE CHANGE with ``valid_from_us`` / ``valid_to_us``
    epoch-micros bounds and ``is_current`` — the classic warehouse
    historization the reference's LWW upsert (K1) throws away (it
    keeps only the latest row; SCD2 keeps the full timeline
    point-in-time joinable, e.g. by the as-of join).

    Change detection is null-safe (``<=>``): NULL → value and value →
    NULL are changes, NULL → NULL is not. ``order_col`` must be a
    per-key unique ordering (the reference's chronological-id
    convention) so ties can't make the timeline nondeterministic.
    Rows with a NULL key are excluded (the resample_fill null policy).

    Scale: two windows over the SAME key partitioning (Catalyst reuses
    one shuffle): a lag to flag changes, then — on the surviving
    change rows only — a lead for the interval close. No self-join,
    no driver state.
    """
    for k in key_cols:
        df = df.filter(F.col(k).isNotNull())
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
    first = F.lag(order_col).over(w).isNull()
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast(`{ts_col}` as timestamp_ntz))"
    )
    kept = (
        df.withColumn("__chg", first | changed)
        .filter(F.col("__chg"))
        .withColumn("__us", us)
    )
    w2 = Window.partitionBy(*key_cols).orderBy(order_col)
    valid_to = F.lead("__us").over(w2)
    return kept.select(
        *key_cols, *attr_cols,
        F.col("__us").cast("long").alias("valid_from_us"),
        valid_to.cast("long").alias("valid_to_us"),
        valid_to.isNull().alias("is_current"),
    )


def resample_fill(df: DataFrame, key_col: str, ts_col: str, val_col: str,
                  step_seconds: float = 3600.0) -> DataFrame:
    """Time-series resample + gap fill: bucket each key's events into
    fixed ``step_seconds`` bins, then DENSIFY — every key gets a row
    for every bin in the observed global range, with count/sum
    zero-filled and a last-observation-carried-forward ``level`` —
    the dense feature matrix a forecasting / training pipeline needs
    (missing hours are data, not absent rows).

    Returns (key, bucket_us, n_events, v_sum, level): bucket start as
    epoch micros BIGINT, v_sum the bin's sum (0.0 when empty, rounded
    to 4 — order-noise absorption), level the LOCF'd v_sum (null
    before a key's first observation).

    Scale: one partial-agg shuffle onto (key, bin); the spine is
    GENERATED distributively — the 1-row global [min,max] bin range
    broadcast-cross-joined to the distinct keys, then
    ``sequence``-exploded per key, so no driver ever materializes
    keys × bins. The fill join and the LOCF window share the
    key partitioning. Bin ids use integer ``div`` on epoch micros
    (never float division — a double quotient can land an epsilon
    below an exact bin boundary and floor into the wrong bin).

    NULL keys are excluded up front (the funnel/quantile operators'
    explicit null policy): a NULL-key group could never equi-join back
    to its spine rows (NULL = NULL is not true), so its events would
    silently vanish from the output while still widening the global
    bin range — an explicit filter instead of a silent drop.
    """
    step_us = int(step_seconds * 1_000_000)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"cast(`{ts_col}` as timestamp_ntz))"
    )
    df = df.filter(F.col(key_col).isNotNull())
    binned = df.select(
        F.col(key_col).alias("__k"),
        us.alias("__us"),
        F.col(val_col).alias("__v"),
    ).withColumn("__b", F.expr(f"__us div {step_us}"))
    agg = binned.groupBy("__k", "__b").agg(
        F.count(F.lit(1)).alias("__n"),
        F.round(F.sum("__v"), 4).alias("__s"),
    )
    rng = agg.agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    spine = (
        agg.select("__k").distinct()
        .crossJoin(F.broadcast(rng))
        .select("__k", F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"))).alias("__b"))
    )
    j = spine.join(agg, ["__k", "__b"], "left")
    w = (
        Window.partitionBy("__k").orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        F.col("__k").alias(key_col),
        (F.col("__b") * F.lit(step_us)).cast("long").alias("bucket_us"),
        F.coalesce("__n", F.lit(0).cast("long")).alias("n_events"),
        F.coalesce("__s", F.lit(0.0)).alias("v_sum"),
        F.last("__s", ignorenulls=True).over(w).alias("level"),
    )


def _bm25_eval_front(index: DataFrame, id_col: str,
                     queries: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The (k1, b)-independent front of the BM25 retrieval eval: doc
    lengths, 1-row corpus stats, postings hits for the query terms,
    per-(query, term) doc frequencies — joined into the per-posting
    scoring frame — plus the per-query distinct-term counts. THE one
    definition shared by :func:`retrieval_eval` and the fused
    :func:`bm25_param_sweep` so the two can't drift."""
    dl = index.groupBy(id_col).agg(
        F.sum("tf").cast("double").alias("__dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    qn = queries.groupBy("query_id").agg(
        F.countDistinct("term").alias("__qn"))
    hits = index.join(F.broadcast(queries.select("query_id", "term")),
                      "term")
    dfreq = hits.groupBy("query_id", "term").agg(
        F.countDistinct(id_col).cast("double").alias("__df"))
    scored = (
        hits.join(F.broadcast(dfreq), ["query_id", "term"])
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
    )
    return scored, qn


def _bm25_score(k1: float, b: float):
    """Okapi BM25 per-posting score over _bm25_eval_front's columns —
    the only (k1, b)-dependent expression in the eval."""
    tf = F.col("tf").cast("double")
    idf = F.log((F.col("__n") - F.col("__df") + 0.5)
                / (F.col("__df") + 0.5) + 1)
    return (idf * tf * (k1 + 1)
            / (tf + k1 * (1 - b + b * F.col("__dl") / F.col("__avgdl"))))


def retrieval_eval(index: DataFrame, id_col: str, queries: DataFrame,
                   k: int = 10, k1: float = 1.2, b: float = 0.75,
                   front: tuple[DataFrame, DataFrame] | None = None
                   ) -> DataFrame:
    """Retrieval-quality metrics (NDCG@k + MRR@k) for query-keyed BM25
    over the inverted index — the eval loop a RAG / search pipeline
    runs after every index or ranker change.

    ``queries`` is a (query_id, term) frame (tiny: broadcast). For
    each query, every doc matching ≥1 term is scored with Okapi BM25
    (same k1/b and integer-exact corpus stats as :func:`fts_bm25`) and
    ranked by (round(score,4) DESC, id ASC). Graded relevance is TERM
    COVERAGE: rel = #distinct query terms the doc contains, gain
    2^rel − 1; NDCG@k divides the ranking's DCG by the ideal (rel-
    sorted) DCG; MRR@k is 1/rank of the first full-coverage doc in
    the top k (0.0 if none). Per-query float sums fold over the ≤k
    collected rank rows IN RANK ORDER, so the metrics are engine-
    identical at the rounded grain.

    Scale: queries × df fan-out only on matching postings; dfreq and
    the 1-row corpus stats broadcast; the per-(query, doc) and
    per-query aggs are map-side combinable. With |queries| bounded
    (an eval set), everything after the postings join is bounded by
    |queries| × |matching docs|.

    ``front`` (optional, r11): a precomputed `_bm25_eval_front(index,
    id_col, queries)` result — (scored, qn) — e.g. a checkpointed
    frame shared with :func:`bm25_param_sweep` over the same index and
    query set (the shingles_df=/positions= injection convention).
    Defaults to self-computing the front; the injected frame must be
    the same columns over the same (index, queries) or results change.
    """
    scored_base, qn = (front if front is not None
                       else _bm25_eval_front(index, id_col, queries))
    scored = scored_base.withColumn("__s", _bm25_score(k1, b))
    per_doc = scored.groupBy("query_id", id_col).agg(
        F.round(F.sum("__s"), 4).alias("score"),
        F.countDistinct("term").alias("rel"),
    )
    # 2^rel − 1 exactly (integer shift; F.shiftleft only takes a
    # literal bit count, so route through the SQL form)
    gain = (F.expr("shiftleft(1, cast(rel AS int))") - 1).cast("double")
    # r10: the old tail built base/DCG/IDCG/MRR as four consumers of
    # per_doc joined back together — four re-executions of the
    # per-doc aggregate plus three joins. Both rank windows ride the
    # one query_id exchange and ONE per-query aggregate computes all
    # four stats; the DCG folds are the identical rank-ordered
    # sort_array float folds (same device as the fused
    # bm25_param_sweep, which shares this front).
    wq = Window.partitionBy("query_id")
    ranked = (
        per_doc.join(F.broadcast(qn), "query_id")
        .withColumn("__r", F.row_number().over(
            wq.orderBy(F.col("score").desc(), F.col(id_col).asc())))
        .withColumn("__rI", F.row_number().over(
            wq.orderBy(F.col("rel").desc(), F.col(id_col).asc())))
    )

    def _dcg_fold(rcol):
        lst = F.sort_array(F.collect_list(F.when(
            F.col(rcol) <= k,
            F.struct(F.col(rcol).alias("__r"),
                     (gain / F.log2(F.col(rcol) + 1)).alias("__t")))))
        return F.aggregate(lst, F.lit(0.0), lambda acc, s: acc + s["__t"])

    return (
        ranked.groupBy("query_id").agg(
            F.count(F.lit(1)).alias("n_cands"),
            _dcg_fold("__r").alias("__dcg"),
            _dcg_fold("__rI").alias("__idcg"),
            F.round(1.0 / F.min(F.when(
                (F.col("rel") == F.col("__qn")) & (F.col("__r") <= k),
                F.col("__r"))), 6).alias("__mrr"),
        )
        .select(
            "query_id", "n_cands",
            F.round(F.col("__dcg") / F.col("__idcg"), 6).alias("ndcg"),
            F.coalesce("__mrr", F.lit(0.0)).alias("mrr"),
        )
    )


def changelog_compact(changelog: DataFrame, key_cols: list[str],
                      op_col: str, seq_col: str,
                      payload_cols: list[str]) -> DataFrame:
    """Squash a multi-event CDC changelog into its net per-key effect
    (Kafka log-compaction / Debezium event-squash semantics): a key
    INSERTED inside the window and later deleted cancels entirely; an
    insert followed by updates compacts to ONE insert carrying the
    final payload; updates/deletes of a pre-existing key compact to
    the LAST op with the final payload. Replaying the compacted log
    yields the same end state as replaying the full log — with one
    row per surviving key instead of one per event.

    The compaction a 100 TB pipeline runs before shipping a day of
    CDC downstream: ONE key-partitioned aggregation — min_by/max_by
    carry the first/last op and the final payload in the same
    partial-agg pass (map-side combined), so the log shuffles exactly
    once, with no window sort and no self-join. Output bounded by
    |distinct keys|. `seq_col` must be unique per key (CDC offsets
    are), otherwise min_by/max_by ties are undefined.
    """
    aggs = [
        F.expr(f"min_by({op_col}, {seq_col})").alias("__first_op"),
        F.expr(f"max_by({op_col}, {seq_col})").alias("__last_op"),
    ] + [
        F.expr(f"max_by({c}, {seq_col})").alias(c) for c in payload_cols
    ]
    return (
        changelog.groupBy(*key_cols).agg(*aggs)
        .filter(~((F.col("__first_op") == "insert")
                  & (F.col("__last_op") == "delete")))
        .select(
            *key_cols,
            F.when(F.col("__first_op") == "insert", F.lit("insert"))
            .otherwise(F.col("__last_op")).alias("net_op"),
            *payload_cols,
        )
    )


def bm25_param_sweep(index: DataFrame, id_col: str, queries: DataFrame,
                     grid: list[tuple[float, float]],
                     k: int = 10,
                     front: tuple[DataFrame, DataFrame] | None = None
                     ) -> DataFrame:
    """(k1, b) tuning sweep for the BM25 ranker, priced by retrieval
    quality: one :func:`retrieval_eval` leg per grid point over the
    SAME index, reduced to per-leg mean NDCG@k / MRR@k with the best
    leg marked chosen (ties → mean MRR, then smaller k1, b). Pass a
    checkpointed/persisted index so the tokenize fan-out is paid
    once, not per leg.

    Per-leg means fold over the ≤|queries| collected rows in query_id
    order — engine-identical at the rounded grain; the final argmax
    is a |grid|-row window.

    r10 optimization: FUSED. The per-(k1, b) retrieval_eval legs
    shared every input (postings hits, doc lengths, dfreq, corpus
    stats, the ideal/rel ranking and IDCG) and differed ONLY in the
    score expression — so the sweep now runs ONE pipeline: the
    per-(query, doc) aggregation computes every grid point's score as
    its own column, |grid| rank windows + the ideal window ride one
    query_id-keyed exchange (guide §2.4), and one per-query aggregate
    folds every leg's DCG/MRR. Per-leg semantics are pinned by
    sharing retrieval_eval's expression definitions
    (_bm25_eval_front / _bm25_score / the same rank-ordered
    sort_array folds) and by
    tests/test_retrieval_fusion.py::test_bm25_param_sweep_matches_per_leg_eval,
    which re-derives every leg with stand-alone retrieval_eval calls
    and compares row sets.

    ``front`` (optional, r11): a precomputed `_bm25_eval_front`
    result shared with :func:`retrieval_eval` — see there."""
    scored, qn = (front if front is not None
                  else _bm25_eval_front(index, id_col, queries))
    names = [f"__s{i}" for i in range(len(grid))]
    per_doc = scored.groupBy("query_id", id_col).agg(
        *[F.round(F.sum(_bm25_score(k1, b)), 4).alias(nm)
          for nm, (k1, b) in zip(names, grid)],
        F.countDistinct("term").alias("rel"),
    )
    gain = (F.expr("shiftleft(1, cast(rel AS int))") - 1).cast("double")
    wq = Window.partitionBy("query_id")
    ranked = per_doc.join(F.broadcast(qn), "query_id")
    ranked = ranked.withColumn("__rI", F.row_number().over(
        wq.orderBy(F.col("rel").desc(), F.col(id_col).asc())))
    for i, nm in enumerate(names):
        ranked = ranked.withColumn(f"__r{i}", F.row_number().over(
            wq.orderBy(F.col(nm).desc(), F.col(id_col).asc())))

    def _dcg_fold(rcol):
        # Identical to retrieval_eval's _dcg: top-k (rank, term)
        # structs sorted by rank, float-folded in rank order.
        lst = F.sort_array(F.collect_list(F.when(
            F.col(rcol) <= k,
            F.struct(F.col(rcol).alias("__r"),
                     (gain / F.log2(F.col(rcol) + 1)).alias("__t")))))
        return F.aggregate(lst, F.lit(0.0), lambda acc, s: acc + s["__t"])

    aggs = [_dcg_fold("__rI").alias("__idcg")]
    for i in range(len(grid)):
        aggs.append(_dcg_fold(f"__r{i}").alias(f"__dcg{i}"))
        # retrieval_eval's MRR: 1/rank of the first full-coverage doc
        # in the top k; null-min → null → coalesced to 0.0 below.
        aggs.append(F.round(1.0 / F.min(F.when(
            (F.col("rel") == F.col("__qn")) & (F.col(f"__r{i}") <= k),
            F.col(f"__r{i}"))), 6).alias(f"__mrr{i}"))
    qrows = ranked.groupBy("query_id").agg(*aggs)
    legs = qrows.select("query_id", F.explode(F.array(*[
        F.struct(
            F.lit(float(k1)).alias("k1"), F.lit(float(b)).alias("b"),
            F.round(F.col(f"__dcg{i}") / F.col("__idcg"), 6).alias("ndcg"),
            F.coalesce(F.col(f"__mrr{i}"), F.lit(0.0)).alias("mrr"))
        for i, (k1, b) in enumerate(grid)])).alias("L")
    ).select("query_id", "L.k1", "L.b", "L.ndcg", "L.mrr")
    terms = legs.groupBy("k1", "b").agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sort_array(F.collect_list(
            F.struct("query_id", "ndcg", "mrr"))).alias("__ts"))

    def mean(f):
        return (F.aggregate("__ts", F.lit(0.0),
                            lambda acc, s: acc + s[f])
                / F.col("n_queries"))

    scored = terms.select(
        "k1", "b", "n_queries",
        F.round(mean("ndcg"), 6).alias("mean_ndcg"),
        F.round(mean("mrr"), 6).alias("mean_mrr"))
    w = Window.orderBy(F.col("mean_ndcg").desc(),
                       F.col("mean_mrr").desc(), "k1", "b")  # |grid| rows
    return scored.withColumn("chosen", F.row_number().over(w) == 1)
