"""Catalog chunk 7: r7 quantized ANN (PQ/IVFPQ), drift (EMD/PSI), DSIR, planners, kNN graph."""

from __future__ import annotations

from twitter_to_sqlite_spark.plans import _q06_curation_streaming as _prev
from twitter_to_sqlite_spark.plans._q06_curation_streaming import *  # noqa: F401,F403

# ---------------------------------------------------------------------
# Distribution matching, EMD drift, normalized dedup, Zipf fit (r7)
# ---------------------------------------------------------------------

def _drift_sides(spark, sf_dir):
    """The shared drift fixture (q_psi_drift's): base = even doc_ids,
    cur = odd doc_ids + planted low-quality spam — a guaranteed real
    shift for every drift/matching query to price."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 2 == 0)
    planted = d.filter(
        (F.col("doc_id") < 40) & (F.col("doc_id") % 2 == 0)).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.lit(("spam " * 40).strip()).alias("text"))
    cur = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    return base, cur


def _drift_hists_build(spark, sf_dir):
    """Raw (uncached) plan for the shared drift histogram pair: the
    spine-coalesced _PSI_BINS-row quality histograms of BOTH drift
    sides — (bin, n_target = base count, n_in = cur count). This is
    exactly the `g` frame distribution_match_rates builds internally
    (same isNotNull filter, same least(floor(q·n), n−1) binning via
    score_bin_counts, same left-join-spine coalesce), and emd_drift's
    cumulative front reads the same counts under its nb/nc names —
    so ONE build serves both queries' bounded tails."""
    from twitter_to_sqlite_spark.streaming import analytics as SA

    base, cur = _drift_sides(spark, sf_dir)
    # r11: spreading these scans before the quality scoring was tried
    # and measured a WASH at sf1 (4.82s vs 4.65s warm) — the build's
    # cost is not the scoring stage — so the narrow-scan spread is
    # deliberately NOT applied here (unlike _doc_index_build /
    # _trade_pairs_build / remove_spans, where it measurably won).
    spine = spark.range(_PSI_BINS).select(
        F.col("id").cast("int").alias("bin"))
    nb = SA.score_bin_counts(
        text.quality_score(base).select("quality"), "quality",
        _PSI_BINS).withColumnRenamed("n", "__t")
    nc = SA.score_bin_counts(
        text.quality_score(cur).select("quality"), "quality",
        _PSI_BINS).withColumnRenamed("n", "__n")
    return (spine.join(nb, "bin", "left").join(nc, "bin", "left")
            .select("bin",
                    F.coalesce("__t", F.lit(0)).alias("n_target"),
                    F.coalesce("__n", F.lit(0)).alias("n_in")))


def _drift_hists(spark, sf_dir):
    key = (spark, sf_dir)
    if key not in _DRIFT_HISTS_CACHE:
        _DRIFT_HISTS_CACHE[key] = _drift_hists_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _DRIFT_HISTS_CACHE[key]


_DRIFT_SIDES_SQL = f"""base AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
),
cur AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id,
         '{("spam " * 40).strip()}' AS text
  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0
)"""


def q_distribution_match(spark, sf_dir):
    """Distribution-matching subsample report
    (functions/sampling.py::distribution_match): reshape the incoming
    (drifted) shard's quality distribution toward the stored corpus's
    by per-bin deterministic acceptance — rate(b) = min(1,
    target_share/incoming_share) computed in EXACT integer ppm
    arithmetic, accept iff hash(doc_id) ppm < rate. The answer to what
    psi_drift/ks_drift detect: don't just alarm on the spam-shifted
    shard, thin its over-represented bins back to the reference shape.
    Emits per bin (n_target, n_in, rate_ppm, n_kept); the kept rows
    themselves are one broadcast-join filter (the hash_sample
    contract: a sample is a filter, not a job)."""
    from twitter_to_sqlite_spark.functions import sampling

    base, cur = _drift_sides(spark, sf_dir)
    cq = text.quality_score(cur).select("doc_id", "quality")
    # rates derive from the SHARED drift histogram checkpoint
    # (_build:drift_hists — emd_drift reads the same 10-row frame),
    # so this query's own work is only the bounded rate tail plus the
    # kept filter's one per-doc quality scan of cur.
    rates = sampling.distribution_match_rates(
        None, None, "quality", _PSI_BINS,
        hist=_drift_hists(spark, sf_dir)).localCheckpoint(eager=False)
    kept = sampling.distribution_match(cq, None, "quality", "doc_id",
                                       _PSI_BINS, salt="dm", rates=rates)
    nk = kept.groupBy("bin").agg(F.count(F.lit(1)).alias("__k"))
    return (rates.join(nk, "bin", "left")
            .select("bin", "n_target", "n_in", "rate_ppm",
                    F.coalesce("__k", F.lit(0)).alias("n_kept")))


def _distribution_match_sql() -> str:
    quality = SQL_QUALITY_SCORE.replace("FROM documents", "FROM {src}")
    return f"""
WITH {_DRIFT_SIDES_SQL},
qb AS ({quality.replace("{src}", "base")}),
qc AS ({quality.replace("{src}", "cur")}),
tb AS (SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
         AS bin, count(*) AS t FROM qb GROUP BY 1),
nb AS (SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
         AS bin, count(*) AS n FROM qc GROUP BY 1),
spine AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1}))::INT AS bin),
g AS (SELECT s.bin, coalesce(t, 0) AS n_target, coalesce(n, 0) AS n_in
      FROM spine s LEFT JOIN tb ON s.bin = tb.bin
                   LEFT JOIN nb ON s.bin = nb.bin),
tot AS (SELECT sum(n_target) AS T, sum(n_in) AS N FROM g),
rates AS (
  SELECT bin, CAST(n_target AS BIGINT) AS n_target,
         CAST(n_in AS BIGINT) AS n_in,
         CAST(CASE WHEN n_in > 0 AND T > 0
              THEN least(1000000, (1000000 * n_target * N) // (T * n_in))
              ELSE 0 END AS BIGINT) AS rate_ppm
  FROM g, tot
),
kept AS (
  SELECT least(floor(q.quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
           AS bin, count(*) AS k
  FROM qc q
  JOIN rates r
    ON least(floor(q.quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT = r.bin
  WHERE ('0x' || substring(md5(q.doc_id::VARCHAR || 'dm'), 1, 15))::BIGINT
          % 1000000 < r.rate_ppm
  GROUP BY 1
)
SELECT r.bin, r.n_target, r.n_in, r.rate_ppm,
       CAST(coalesce(k.k, 0) AS BIGINT) AS n_kept
FROM rates r LEFT JOIN kept k ON r.bin = k.bin
"""


SQL_DISTRIBUTION_MATCH = _distribution_match_sql()


def q_dm_maintained(spark, sf_dir):
    """Incremental distribution-matching (VERDICT r7 task 8b): the
    acceptance-rate table q_distribution_match derives one-shot, here
    derived from a histogram MAINTAINED across three micro-batches by
    the REAL drift_monitor read-merge-swap path (streaming/
    analytics.py) — certifying that the sampler's control signal can
    be kept LIVE on a stream: maintain-then-derive must equal
    recompute-from-scratch exactly. Bin counts merge by integer
    addition (the drift_monitor agreement law) and the rates are the
    same exact integer-ppm arithmetic as distribution_match_rates, so
    the whole chain is engine-exact with no float surface. The oracle
    recomputes the incoming histogram ONE-SHOT and applies the same
    ppm op tree.

    Fixture bounded by _SBA_DOCS (constant cost at any sf): incoming =
    the slice fed batch-by-batch (doc_id % 3), target = the even-id
    half evaluated once. Maintained table lives in a per-call tempdir
    removed before returning (the version_diff discipline: the output
    is built from the collected ≤n_bins rows)."""
    import shutil
    import tempfile

    from twitter_to_sqlite_spark.streaming import analytics as SA

    docs = _t(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _SBA_DOCS).select("doc_id", "text")
    dq = (text.quality_score(docs)
          .select("doc_id", "quality").localCheckpoint(eager=True))

    root = tempfile.mkdtemp(prefix="dmm-")
    try:
        # n_bins passed explicitly: the SQL twin and the target
        # histogram both derive from _PSI_BINS, so the maintained
        # histogram must too (the _NOISE_DIMS desync class).
        on_psi = SA.drift_monitor(spark, root + "/hist", "quality",
                                  n_bins=_PSI_BINS)
        for b in range(3):
            on_psi(dq.filter(F.col("doc_id") % 3 == b)
                   .select("quality"), b)
        n_in = {r["bin"]: r["n"] for r in
                spark.read.parquet(root + "/hist").collect()}
    finally:
        shutil.rmtree(root, ignore_errors=True)

    tgt = (SA.score_bin_counts(
        dq.filter(F.col("doc_id") % 2 == 0).select("quality"),
        "quality", _PSI_BINS).collect())
    n_t = {r["bin"]: r["n"] for r in tgt}
    T, N = sum(n_t.values()), sum(n_in.values())
    res = 1_000_000
    rows = []
    for b in range(_PSI_BINS):
        t, c = n_t.get(b, 0), n_in.get(b, 0)
        rate = min(res, (res * t * N) // (T * c)) if c and T else 0
        rows.append((b, t, c, rate))
    return spark.createDataFrame(
        rows, "bin int, n_target long, n_in long, rate_ppm long")


def _dm_maintained_sql() -> str:
    quality = SQL_QUALITY_SCORE.replace(
        "FROM documents",
        f"FROM (SELECT doc_id, text FROM documents"
        f" WHERE doc_id < {_SBA_DOCS})")
    return f"""
WITH qf AS ({quality}),
ci AS (
  SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
           AS bin, CAST(count(*) AS BIGINT) AS n
  FROM qf WHERE quality IS NOT NULL GROUP BY 1
),
ct AS (
  SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
           AS bin, CAST(count(*) AS BIGINT) AS n
  FROM qf WHERE quality IS NOT NULL AND doc_id % 2 = 0 GROUP BY 1
),
spine AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1}))::INT AS bin),
g AS (SELECT s.bin, coalesce(ct.n, 0) AS t, coalesce(ci.n, 0) AS c
      FROM spine s LEFT JOIN ct ON s.bin = ct.bin
                   LEFT JOIN ci ON s.bin = ci.bin),
tot AS (SELECT sum(t) AS tt, sum(c) AS nn FROM g)
SELECT g.bin, CAST(g.t AS BIGINT) AS n_target,
       CAST(g.c AS BIGINT) AS n_in,
       CAST(CASE WHEN g.c > 0 AND tot.tt > 0
                 THEN least(1000000, (1000000 * g.t * tot.nn)
                            // (tot.tt * g.c))
                 ELSE 0 END AS BIGINT) AS rate_ppm
FROM g, tot
"""


SQL_DM_MAINTAINED = _dm_maintained_sql()


def q_emd_drift(spark, sf_dir):
    """Earth-mover (Wasserstein-1) drift of the binned quality
    distribution, stored corpus vs incoming shard — PSI's
    transport-metric companion (PSI blows up on empty bins, KS sees
    only the single worst point; EMD prices HOW FAR the mass moved).
    On the shared 10-bin histogram: EMD = Σ_b |F_base(b) − F_cur(b)| ·
    binwidth. Cumulative diffs stay exact integers (|cb·Tc − cc·Tb|)
    until ONE final division, so the statistic is engine-exact at the
    rounded grain — no per-bin float folding at all (stronger than the
    PSI pair's ordered-sum device)."""
    from pyspark.sql import Window

    # The shared drift histogram checkpoint (_build:drift_hists) IS
    # this query's g frame — same spine-coalesced counts under the
    # rates-frame names; only the bounded cumulative tail runs here.
    g = _drift_hists(spark, sf_dir).select(
        "bin", F.col("n_target").alias("nb"), F.col("n_in").alias("nc"))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select(
        "bin",
        F.sum("nb").over(w).alias("cb"),
        F.sum("nc").over(w).alias("cc"))
    tot = g.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    return (
        c.crossJoin(F.broadcast(tot))
        .agg(F.max("tb").alias("n_base"), F.max("tc").alias("n_cur"),
             F.sum(F.abs(F.col("cb") * F.col("tc")
                         - F.col("cc") * F.col("tb"))).alias("__s"))
        .select(
            "n_base", "n_cur",
            F.round(F.col("__s").cast("double")
                    / (F.col("n_base") * F.col("n_cur") * _PSI_BINS)
                    .cast("double"), 6).alias("emd"))
    )


def _emd_sql() -> str:
    quality = SQL_QUALITY_SCORE.replace("FROM documents", "FROM {src}")
    return f"""
WITH {_DRIFT_SIDES_SQL},
qb AS ({quality.replace("{src}", "base")}),
qc AS ({quality.replace("{src}", "cur")}),
cb AS (SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
         AS bin, count(*) AS nb FROM qb GROUP BY 1),
cc AS (SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
         AS bin, count(*) AS nc FROM qc GROUP BY 1),
spine AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1}))::INT AS bin),
g AS (SELECT s.bin, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      FROM spine s LEFT JOIN cb ON s.bin = cb.bin
                   LEFT JOIN cc ON s.bin = cc.bin),
c AS (
  SELECT bin,
         sum(nb) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cb,
         sum(nc) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cc
  FROM g
),
t AS (SELECT sum(nb) AS tb, sum(nc) AS tc FROM g)
SELECT CAST(t.tb AS BIGINT) AS n_base, CAST(t.tc AS BIGINT) AS n_cur,
       round(sum(abs(cb * t.tc - cc * t.tb))::DOUBLE
             / (t.tb * t.tc * {_PSI_BINS})::DOUBLE, 6) AS emd
FROM c, t GROUP BY t.tb, t.tc
"""


SQL_EMD_DRIFT = _emd_sql()


_NORM_PLANT = 9_000_000


def q_dedup_normalized(spark, sf_dir):
    """"Fuzzy exact" dedup (functions/dedup.py::normalized_dedup):
    exact_dedup over aggressively NORMALIZED text (lowercase, strip
    non-[a-z ], squeeze spaces — the C4/RefinedWeb recipe), catching
    the case/punctuation/decoration mirror variants a raw content
    hash misses at plain hash-agg cost. Planted decorated copies
    (uppercased + trailing chrome) of the low-id docs guarantee
    non-trivial groups; same (content_hash, keep_id, n_dups) shape as
    dedup_exact, so the two passes compose."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + _NORM_PLANT).alias("doc_id"),
        F.concat(F.upper(F.col("text")), F.lit("  !!")).alias("text"))
    return dedup.normalized_dedup(d.unionByName(planted))


SQL_DEDUP_NORMALIZED = f"""
WITH d AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_NORM_PLANT} AS doc_id, upper(text) || '  !!' AS text
  FROM documents WHERE doc_id < 30
),
n AS (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z ]', '', 'g'), ' +', ' ', 'g')) AS nt
  FROM d
)
SELECT md5(nt) AS content_hash, min(doc_id) AS keep_id,
       CAST(count(*) AS BIGINT) AS n_dups
FROM n GROUP BY md5(nt)
"""


_ZIPF_K = 500


def q_zipf_fit(spark, sf_dir):
    """Zipf power-law fit of the token frequency spectrum: least-
    squares slope/intercept of ln(freq) on ln(rank) over the top-{k}
    tokens — the corpus-health number (natural text ≈ −1; generated/
    templated text flattens, boilerplate floods steepen). Rank comes
    from a TakeOrderedAndProject top-k (never a global vocabulary
    sort); the regression sums fold in RANK ORDER over the collected
    ≤{k}-row frame (the psi_drift ordered-fold device), so the float
    statistic is engine-identical at the rounded grain."""
    from pyspark.sql import Window

    toks = _t(spark, sf_dir, "documents").select(
        F.explode(text._tokens(F.col("text"))).alias("w"))
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = counts.orderBy(F.col("c").desc(), "w").limit(_ZIPF_K)
    w = Window.orderBy(F.col("c").desc(), "w")   # ≤ _ZIPF_K rows
    ranked = top.withColumn("r", F.row_number().over(w)).select(
        "r",
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"))
    terms = ranked.agg(
        F.sort_array(F.collect_list(F.struct("r", "x", "y")))
        .alias("ts"),
        F.count(F.lit(1)).cast("double").alias("n"))

    def fold(expr):
        return F.aggregate("ts", F.lit(0.0), lambda acc, s: acc + expr(s))

    s = terms.select(
        "n",
        fold(lambda s: s["x"]).alias("sx"),
        fold(lambda s: s["y"]).alias("sy"),
        fold(lambda s: s["x"] * s["y"]).alias("sxy"),
        fold(lambda s: s["x"] * s["x"]).alias("sxx"))
    slope = ((F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
             / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")))
    return s.select(
        F.col("n").cast("long").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6)
        .alias("intercept"))


SQL_ZIPF_FIT = f"""
WITH u AS (SELECT unnest({_SQL_TOKS}) AS w FROM documents),
c AS (SELECT w, count(*) AS c FROM u GROUP BY w),
top AS (SELECT w, c FROM c ORDER BY c DESC, w LIMIT {_ZIPF_K}),
rk AS (SELECT c, row_number() OVER (ORDER BY c DESC, w) AS r FROM top),
t AS (
  SELECT count(*)::DOUBLE AS n,
         list(ln(r::DOUBLE) ORDER BY r) AS xs,
         list(ln(c::DOUBLE) ORDER BY r) AS ys,
         list(ln(r::DOUBLE) * ln(c::DOUBLE) ORDER BY r) AS xys,
         list(ln(r::DOUBLE) * ln(r::DOUBLE) ORDER BY r) AS xxs
  FROM rk
),
s AS (
  SELECT n,
         list_reduce(list_prepend(0.0, xs), (a, b) -> a + b) AS sx,
         list_reduce(list_prepend(0.0, ys), (a, b) -> a + b) AS sy,
         list_reduce(list_prepend(0.0, xys), (a, b) -> a + b) AS sxy,
         list_reduce(list_prepend(0.0, xxs), (a, b) -> a + b) AS sxx
  FROM t
)
SELECT CAST(n AS BIGINT) AS n_terms,
       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx)
             / n, 6) AS intercept
FROM s
"""


# ---------------------------------------------------------------------
# Product-quantized ANN (r7)
# ---------------------------------------------------------------------

_PQ_M, _PQ_KSUB, _PQ_ITERS = 4, 16, 1
_PQ_CANDS = 10


def _pq_codebooks(spark, sf_dir) -> list[list[list[float]]]:
    key = ("pq", sf_dir, _PQ_M, _PQ_KSUB, _PQ_ITERS)
    if key not in _CENTROID_CACHE:
        _CENTROID_CACHE[key] = similarity.pq_codebooks(
            _t(spark, sf_dir, "embeddings"), m=_PQ_M, ksub=_PQ_KSUB,
            iters=_PQ_ITERS, dim=_EMB_DIM)
    return _CENTROID_CACHE[key]


def q_ann_pq(spark, sf_dir):
    """Product-quantized ANN (similarity.pq_topk, Jégou et al. 2011):
    {m} subspace codebooks of {k} centroids each (trained by the SAME
    deterministic Lloyd's as the IVF coarse quantizer), corpus encoded
    as {m} small codes (64× less memory than float32 — the tier below
    SQ8's 4×), candidates ranked by the asymmetric-distance table sum
    as an EXACT e4-integer — no float-order surface in candidate
    selection at all — then top-{c} rescored with exact cosine. Same
    output shape as ann_brute_force, so ann_recall-style evals price
    the quantization loss directly; the oracle replays all {m}
    codebook trainings relationally through the shared k-means CTE
    generator."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return similarity.pq_topk(e, q, _pq_codebooks(spark, sf_dir),
                              k=3, candidates=_PQ_CANDS)


def _pq_pieces():
    """PQ oracle building blocks shared by every PQ-family oracle
    (SQL_ANN_PQ, SQL_PQ_RECALL, SQL_ANN_IVFPQ): the m codebook-
    training CTE chains, and the per-subspace code-assign / ADC-table
    expression builders over those chains' final centroids — one
    definition, so the replayed quantizer can never fork."""
    subdim = _EMB_DIM // _PQ_M
    chains, finals = [], []
    for s in range(_PQ_M):
        lo, hi = s * subdim + 1, (s + 1) * subdim
        joined, final = _kmeans_ctes(
            _PQ_ITERS, None, k=_PQ_KSUB, dim=subdim,
            vexpr=f"(embedding::DOUBLE[])[{lo}:{hi}]", prefix=f"p{s}")
        chains.append(joined)
        finals.append(final)

    def code(vec, s):
        lo, hi = s * subdim + 1, (s + 1) * subdim
        return (f"(SELECT cell FROM {finals[s]} ORDER BY"
                f" list_dot_product({vec}[{lo}:{hi}], cv) DESC,"
                f" cell LIMIT 1)")

    def table(vec, s):
        lo, hi = s * subdim + 1, (s + 1) * subdim
        return (f"(SELECT list(CAST(round(list_dot_product("
                f"{vec}[{lo}:{hi}], cv) * 10000, 0) AS BIGINT)"
                f" ORDER BY cell) FROM {finals[s]})")

    return ",".join(chains), code, table


def _pq_core() -> str:
    """Shared WITH-body of the flat-PQ oracle (codebook trainings →
    codes → ADC tables → integer-exact candidate ranking →
    exact-cosine `ranked`), reused by SQL_ANN_PQ and SQL_PQ_RECALL."""
    chains, code, table = _pq_pieces()

    ev = "(e.embedding::DOUBLE[])"
    codes = ",\n         ".join(
        f"{code(ev, s)} AS c{s}" for s in range(_PQ_M))
    tables = ",\n         ".join(
        f"{table(ev, s)} AS t{s}" for s in range(_PQ_M))
    approx = " + ".join(f"t{s}[c{s} + 1]" for s in range(_PQ_M))
    return f"""{chains},
cx AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b,
         {codes}
  FROM embeddings e
),
qx AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS a,
         {tables}
  FROM embeddings e WHERE vec_id < 5
),
scored AS (
  SELECT query_id, neighbor_id, a, b, {approx} AS approx
  FROM cx, qx WHERE neighbor_id != query_id
),
cand AS (
  SELECT query_id, neighbor_id, a, b FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx DESC, neighbor_id) AS ar
    FROM scored
  ) WHERE ar <= {_PQ_CANDS}
),
ranked AS (
  SELECT query_id, neighbor_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_SQL_COS} DESC, neighbor_id) AS rank
  FROM cand
)"""


SQL_ANN_PQ = (
    "WITH " + _pq_core()
    + "\nSELECT query_id, neighbor_id, cosine, rank"
      " FROM ranked WHERE rank <= 3\n")


def q_pq_recall(spark, sf_dir):
    """Recall@3 of the product-quantized ANN against exact brute force
    (similarity.recall_at_k) — the measurement that prices what 64×
    compression costs in retrieval quality, completing the
    measure-don't-guess loop for the PQ tier exactly as ann_recall
    does for LSH. Both legs are top-k result frames; the eval join
    never touches the corpus."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(e, q, k=3)
    approx = similarity.pq_topk(e, q, _pq_codebooks(spark, sf_dir),
                                k=3, candidates=_PQ_CANDS)
    return similarity.recall_at_k(exact, approx, k=3)


SQL_PQ_RECALL = (
    "WITH " + _pq_core() + f""",
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_SQL_COS} DESC, neighbor_id) AS r
    FROM (SELECT neighbor_id, b FROM cx) c,
         (SELECT query_id, a FROM qx) q
    WHERE neighbor_id != query_id
  ) WHERE r <= 3
),
ap AS (SELECT query_id, neighbor_id FROM ranked WHERE rank <= 3),
hits AS (
  SELECT query_id, count(*) AS n_hits
  FROM ap JOIN ex USING (query_id, neighbor_id)
  GROUP BY query_id
)
SELECT qq.query_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       round(coalesce(h.n_hits, 0) / 3, 4) AS recall
FROM (SELECT DISTINCT query_id FROM ex) qq
LEFT JOIN hits h USING (query_id)
""")


# ---------------------------------------------------------------------
# Exponentially-decayed heavy hitters (r7)
# ---------------------------------------------------------------------

_DECAY_TOPK = 10


def q_decay_topk(spark, sf_dir):
    """Exponentially-decayed per-user activity top-{k}
    (streaming/analytics.py::decay_monitor): the bounded SBA events
    fixture split into three time-ordered micro-batches, the decayed
    count table maintained batch by batch (stored' = stored·½ +
    counts), then the top users by decayed weight. λ = ½ is dyadic, so
    with integer batch counts every maintained double is EXACT and the
    oracle's one-shot Σ_b counts_b·½^(2−b) matches bit-for-bit — the
    decayed weight ships as ×4-scaled BIGINT, no float column at all.
    The forgetting (decay + prune) is what keeps trending state finite
    on an unbounded key domain; rank is a {k}-row
    TakeOrderedAndProject shape on the bounded maintained table."""
    import shutil
    import tempfile

    from pyspark.sql import Window

    from twitter_to_sqlite_spark.streaming import analytics as SA

    e = _t(spark, sf_dir, "events").filter(
        (F.col("event_id") < _SBA_EVENTS) & F.col("user_id").isNotNull()
        & F.col("ts").isNotNull())
    rows = sorted(e.select("event_id", "user_id", "ts").collect(),
                  key=lambda r: (r["ts"], r["event_id"]))  # bounded
    # k = n//3 twice, NOT (2n)//3: the oracle's CASE uses 2*(n//3) and
    # the two differ when n % 3 == 2
    k3 = len(rows) // 3
    parts = [rows[:k3], rows[k3:2 * k3], rows[2 * k3:]]

    root = tempfile.mkdtemp(prefix="decay-")
    try:
        on_b = SA.decay_monitor(spark, root + "/store", "user_id",
                                decay=0.5)
        for b, part in enumerate(parts):
            on_b(spark.createDataFrame(
                [(r["user_id"],) for r in part], "user_id long"), b)
        stored = [(r["user_id"], int(r["decayed"] * 4))
                  for r in spark.read.parquet(root + "/store").collect()]
    finally:
        shutil.rmtree(root, ignore_errors=True)

    out = spark.createDataFrame(stored, "user_id long, decayed_x4 long")
    w = Window.orderBy(F.col("decayed_x4").desc(), F.col("user_id"))
    return (out.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= _DECAY_TOPK))


SQL_DECAY_TOPK = f"""
WITH fx AS (
  SELECT user_id,
         row_number() OVER (ORDER BY ts, event_id) AS rn,
         count(*) OVER () AS n
  FROM events
  WHERE event_id < {_SBA_EVENTS} AND user_id IS NOT NULL
    AND ts IS NOT NULL
),
b AS (
  SELECT user_id,
         CASE WHEN rn <= n // 3 THEN 0
              WHEN rn <= 2 * (n // 3) THEN 1
              ELSE 2 END AS batch
  FROM fx
),
-- one-shot decayed weight, x4-scaled to stay integer:
-- c0*(1/4) + c1*(1/2) + c2  ->  c0 + 2*c1 + 4*c2
d AS (
  SELECT user_id,
         CAST(sum(CASE batch WHEN 0 THEN 1 WHEN 1 THEN 2 ELSE 4 END)
              AS BIGINT) AS decayed_x4
  FROM b GROUP BY user_id
),
r AS (
  SELECT user_id, decayed_x4,
         row_number() OVER (ORDER BY decayed_x4 DESC, user_id) AS rank
  FROM d
)
SELECT user_id, decayed_x4, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= {_DECAY_TOPK}
"""


# ---------------------------------------------------------------------
# IVF+PQ composed index (r7)
# ---------------------------------------------------------------------

_IVFPQ_NPROBE = 2


def q_ann_ivfpq(spark, sf_dir):
    """IVF+PQ composed ANN (similarity.ivfpq_topk — the FAISS IVFPQ
    shape, the standard billion-scale index): the IVF coarse quantizer
    prunes to each query's {n_probe} best cells, PQ's integer-exact
    ADC sum ranks candidates within them, exact cosine rescores the
    top-{c}. Shares the coarse centroids with ann_ivf and the
    codebooks with ann_pq VERBATIM (both `_build:` artifacts), so the
    whole quantization stack is trained once; the oracle replays the
    IVF k-means AND all four codebook trainings through the one shared
    CTE generator. Probe-cell ranking ties mirror `_probe_cells`
    (score DESC, cell DESC)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return similarity.ivfpq_topk(
        e, q, _ivf_centroids(spark, sf_dir),
        _pq_codebooks(spark, sf_dir), k=3, n_probe=_IVFPQ_NPROBE,
        candidates=_PQ_CANDS)


def _ivfpq_sql() -> str:
    ivf_chain, ivf_final = _kmeans_ctes(_IVF_ITERS, _IVF_SAMPLE_MOD)
    pq_chains, code, table = _pq_pieces()
    ev = "(e.embedding::DOUBLE[])"
    codes = ",\n         ".join(
        f"{code(ev, s)} AS c{s}" for s in range(_PQ_M))
    tables = ",\n         ".join(
        f"{table(ev, s)} AS t{s}" for s in range(_PQ_M))
    approx = " + ".join(f"q.t{s}[x.c{s} + 1]" for s in range(_PQ_M))
    return f"""
WITH {ivf_chain},
{pq_chains},
cx AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b,
         (SELECT cell FROM {ivf_final}
          ORDER BY list_dot_product({ev}, cv) DESC, cell LIMIT 1)
           AS cell,
         {codes}
  FROM embeddings e
),
qx AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS a,
         {tables}
  FROM embeddings e WHERE vec_id < 5
),
-- top-n_probe cells per query; ties mirror _probe_cells' reversed
-- ascending sort (score DESC, cell DESC)
qcell AS (
  SELECT query_id, cell FROM (
    SELECT q.query_id, c.cell,
           row_number() OVER (PARTITION BY q.query_id
                              ORDER BY list_dot_product(q.a, c.cv) DESC,
                                       c.cell DESC) AS r
    FROM qx q, {ivf_final} c
  ) WHERE r <= {_IVFPQ_NPROBE}
),
scored AS (
  SELECT q.query_id, x.neighbor_id, q.a, x.b, {approx} AS approx
  FROM cx x
  JOIN qcell qc ON x.cell = qc.cell
  JOIN qx q ON q.query_id = qc.query_id
  WHERE x.neighbor_id != q.query_id
),
cand AS (
  SELECT query_id, neighbor_id, a, b FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx DESC, neighbor_id) AS ar
    FROM scored
  ) WHERE ar <= {_PQ_CANDS}
),
ranked AS (
  SELECT query_id, neighbor_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_SQL_COS} DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


SQL_ANN_IVFPQ = _ivfpq_sql()


# ---------------------------------------------------------------------
# Grouped PSI drift (r7)
# ---------------------------------------------------------------------

def q_psi_drift_by(spark, sf_dir):
    """PER-SOURCE population stability index — psi_drift's grouped
    twin: the aggregate PSI can look calm while one source's
    distribution collapses (the Simpson's-paradox failure grouped_auc
    guards against on the eval side, here on the drift side). Same
    Laplace-smoothed bin shares and bin-ordered float fold as the
    global pair, per source over a (source × bin) dense spine; the
    planted spam rides its original source column, so the sources that
    received plants alarm and the others stay flat. Scale: everything
    is bounded by |sources| × bins after two histogram aggregates
    with full map-side combine."""
    from pyspark.sql import Window  # noqa: F401  (parity with q_psi_drift)

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    base = d.filter(F.col("doc_id") % 2 == 0)
    planted = d.filter(
        (F.col("doc_id") < 40) & (F.col("doc_id") % 2 == 0)).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.lit(("spam " * 40).strip()).alias("text"),
        "source")
    cur = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)

    def bin_counts(side, alias):
        q = text.quality_score(side).select("source", "quality")
        b = F.least(F.floor(F.col("quality") * _PSI_BINS).cast("int"),
                    F.lit(_PSI_BINS - 1))
        return (q.filter(F.col("quality").isNotNull())
                .groupBy("source", b.alias("bin"))
                .agg(F.count(F.lit(1)).alias(alias)))

    spine = d.select("source").distinct().crossJoin(
        spark.range(_PSI_BINS).select(
            F.col("id").cast("int").alias("bin")))
    # Lazy checkpoint of the bounded |sources|×bins frame: `tot` and
    # `gt` both hang off g — unpinned, both per-source histogram scans
    # run twice (the emd_drift/dsir convention).
    g = (spine
         .join(bin_counts(base, "__nb"), ["source", "bin"], "left")
         .join(bin_counts(cur, "__nc"), ["source", "bin"], "left")
         .select("source", "bin",
                 F.coalesce("__nb", F.lit(0)).alias("nb"),
                 F.coalesce("__nc", F.lit(0)).alias("nc"))
         .localCheckpoint(eager=False))
    tot = g.groupBy("source").agg(
        F.sum("nb").alias("tnb"), F.sum("nc").alias("tnc"))
    gt = g.join(tot, "source")
    pb = (F.col("nb") + 1.0) / (F.col("tnb") + _PSI_BINS)
    pc = (F.col("nc") + 1.0) / (F.col("tnc") + _PSI_BINS)
    terms = gt.select(
        "source", "tnb", "tnc",
        F.struct(F.col("bin"),
                 ((pc - pb) * F.log(pc / pb)).alias("x")).alias("s"))
    return (
        terms.groupBy("source")
        .agg(F.sort_array(F.collect_list("s")).alias("terms"),
             F.max("tnb").alias("n_base"),
             F.max("tnc").alias("n_cur"))
        .select(
            "source", "n_base", "n_cur",
            F.round(F.aggregate(
                "terms", F.lit(0.0), lambda acc, s: acc + s["x"]), 6)
            .alias("psi"))
    )


def _psi_by_sql() -> str:
    quality = SQL_QUALITY_SCORE.replace(
        "SELECT doc_id, text,", "SELECT doc_id, source, text,"
    ).replace("SELECT doc_id,\n", "SELECT doc_id, source,\n").replace(
        "FROM documents", "FROM {src}")
    # source must ride through all three SELECTs (f, m, final) of the
    # quality CTE chain — fail loudly if the shared oracle's shape moves
    assert quality.count("source") == 3, \
        "SQL_QUALITY_SCORE shape changed; update _psi_by_sql markers"
    return f"""
WITH base AS (
  SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 0
),
cur AS (
  SELECT doc_id, text, source FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id,
         '{("spam " * 40).strip()}' AS text, source
  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0
),
qb AS ({quality.replace("{src}", "base")}),
qc AS ({quality.replace("{src}", "cur")}),
cb AS (SELECT source,
              least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
                AS bin, count(*) AS nb
       FROM qb GROUP BY 1, 2),
cc AS (SELECT source,
              least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
                AS bin, count(*) AS nc
       FROM qc GROUP BY 1, 2),
spine AS (
  SELECT source, bin FROM (SELECT DISTINCT source FROM documents),
       (SELECT unnest(generate_series(0, {_PSI_BINS - 1}))::INT AS bin)
),
g AS (SELECT s.source, s.bin, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      FROM spine s
      LEFT JOIN cb ON s.source = cb.source AND s.bin = cb.bin
      LEFT JOIN cc ON s.source = cc.source AND s.bin = cc.bin),
t AS (SELECT source, sum(nb) AS tnb, sum(nc) AS tnc FROM g
      GROUP BY source),
terms AS (
  SELECT g.source, g.bin,
         ((nc + 1.0) / (tnc + {_PSI_BINS})
          - (nb + 1.0) / (tnb + {_PSI_BINS}))
         * ln(((nc + 1.0) / (tnc + {_PSI_BINS}))
              / ((nb + 1.0) / (tnb + {_PSI_BINS}))) AS x,
         t.tnb, t.tnc
  FROM g JOIN t ON g.source = t.source
)
SELECT source, CAST(tnb AS BIGINT) AS n_base, CAST(tnc AS BIGINT) AS n_cur,
       round(list_reduce(list_prepend(0.0, list(x ORDER BY bin)),
                         (acc, v) -> acc + v), 6) AS psi
FROM terms GROUP BY source, tnb, tnc
"""


SQL_PSI_DRIFT_BY = _psi_by_sql()


# ---------------------------------------------------------------------
# Tokenizer fertility + length-threshold sweep (r7)
# ---------------------------------------------------------------------

def q_tokenizer_fertility(spark, sf_dir):
    """Per-LANGUAGE tokenizer fertility (BPE symbols per word) — the
    multilingual-fairness number: a vocab trained on a mixed corpus
    over-segments under-represented languages, silently taxing their
    token budget (mBERT/XLM-R literature's fertility metric).
    Recomputed from bpe_segment's exact integer sums (never averaged
    from the per-doc rounded ratios), so one division per language is
    the only float. Shares the trained merge table and the segment
    oracle wholesale — the fertility twin cannot fork from the
    segmenter."""
    from twitter_to_sqlite_spark.functions import bpe

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    seg = bpe.bpe_segment(d, _bpe_merges(spark, sf_dir), "text", "doc_id")
    return (
        seg.join(d.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(F.sum("n_words").alias("n_words"),
             F.sum("n_bpe_tokens").alias("n_bpe_tokens"))
        .select(
            "lang", "n_words", "n_bpe_tokens",
            F.round(F.col("n_bpe_tokens").cast("double")
                    / F.col("n_words").cast("double"), 4)
            .alias("fertility"))
    )


SQL_TOKENIZER_FERTILITY = f"""
WITH seg AS ({SQL_BPE_SEGMENT})
SELECT d.lang,
       CAST(sum(s.n_words) AS BIGINT) AS n_words,
       CAST(sum(s.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
       round(sum(s.n_bpe_tokens)::DOUBLE / sum(s.n_words)::DOUBLE, 4)
         AS fertility
FROM seg s JOIN documents d USING (doc_id)
GROUP BY d.lang
"""


_LEN_TAUS = (5, 10, 20, 40, 80, 160)


def q_length_sweep(spark, sf_dir):
    """Minimum-token-length threshold sweep: docs and token mass
    surviving at each candidate cutoff τ — the tuning curve for the
    Gopher min-length gate (dedup_sweep's sibling for the cheapest
    filter knob). The corpus reduces to ONE per-token-count histogram
    (bounded by the distinct length domain); the τ explode and the
    suffix sums run on that bounded frame only, never the corpus —
    the same touch-the-small-frame discipline as dedup_sweep's
    pairs-only explode."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # Lazy checkpoint: `tot` and `kept` both price off the bounded
    # length histogram — unpinned, the corpus tokenize+agg runs twice.
    hist = (d.select(F.size(text._tokens(F.col("text"))).alias("len"))
            .groupBy("len")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("len").alias("toks"))
            .localCheckpoint(eager=False))
    taus = spark.createDataFrame([(t,) for t in _LEN_TAUS], "tau int")
    tot = hist.agg(F.sum("n").alias("n_total"),
                   F.sum("toks").alias("toks_total"))
    kept = (taus.crossJoin(hist)
            .filter(F.col("len") >= F.col("tau"))
            .groupBy("tau")
            .agg(F.sum("n").alias("n_kept"),
                 F.sum("toks").alias("toks_kept")))
    return (
        taus.join(kept, "tau", "left").crossJoin(F.broadcast(tot))
        .select(
            "tau",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("toks_kept", F.lit(0)).alias("toks_kept"),
            F.round(F.coalesce("n_kept", F.lit(0)).cast("double")
                    / F.col("n_total").cast("double"), 6)
            .alias("doc_frac"),
            F.round(F.coalesce("toks_kept", F.lit(0)).cast("double")
                    / F.col("toks_total").cast("double"), 6)
            .alias("token_frac"))
    )


SQL_LENGTH_SWEEP = f"""
WITH hist AS (
  SELECT len({_SQL_TOKS}) AS len, count(*) AS n,
         sum(len({_SQL_TOKS})) AS toks
  FROM documents GROUP BY 1
),
tot AS (SELECT sum(n) AS n_total, sum(toks) AS toks_total FROM hist),
taus AS (SELECT unnest([{", ".join(str(t) for t in _LEN_TAUS)}])::INT
           AS tau),
kept AS (
  SELECT tau, sum(n) AS n_kept, sum(toks) AS toks_kept
  FROM taus JOIN hist ON hist.len >= taus.tau
  GROUP BY tau
)
SELECT t.tau,
       CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
       CAST(coalesce(k.toks_kept, 0) AS BIGINT) AS toks_kept,
       round(coalesce(k.n_kept, 0)::DOUBLE / tot.n_total::DOUBLE, 6)
         AS doc_frac,
       round(coalesce(k.toks_kept, 0)::DOUBLE / tot.toks_total::DOUBLE, 6)
         AS token_frac
FROM taus t LEFT JOIN kept k ON t.tau = k.tau, tot
"""


# ---------------------------------------------------------------------
# DSIR importance weights (r7)
# ---------------------------------------------------------------------

_DSIR_BUCKETS = 64


def q_dsir_weights(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): per-document importance
    log-weight = log-likelihood ratio of the doc's hashed-bigram
    profile under a target model (the English slice) vs the raw-corpus
    model, add-1 smoothed over 64 hash buckets; `keep` marks docs
    more target-like than raw. The pretraining-scale alternative to
    classifier-based selection: no labels, no training, two streaming
    count aggs + a 64-row broadcast. sampling.dsir_logweights."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    return sampling.dsir_logweights(
        d, F.col("lang") == "en", buckets=_DSIR_BUCKETS)


SQL_DSIR_WEIGHTS = f"""
WITH bg AS ({_SQL_BIGRAMS}),
b AS (
  SELECT doc_id,
         (('0x' || substring(md5(bg), 1, 15))::BIGINT
          % {_DSIR_BUCKETS})::INT AS bucket
  FROM bg
),
n AS (SELECT doc_id, bucket, count(*) AS n FROM b GROUP BY 1, 2),
rc AS (SELECT bucket, sum(n) AS rc FROM n GROUP BY 1),
tc AS (
  SELECT bucket, sum(n) AS tc
  FROM n JOIN documents USING (doc_id)
  WHERE lang = 'en' GROUP BY 1
),
tot AS (
  SELECT (SELECT sum(rc) FROM rc) AS r_total,
         (SELECT coalesce(sum(tc), 0) FROM tc) AS t_total
),
lr AS (
  SELECT rc.bucket,
         ln((coalesce(tc.tc, 0) + 1)::DOUBLE
            / (tot.t_total + {_DSIR_BUCKETS}))
         - ln((rc.rc + 1)::DOUBLE / (tot.r_total + {_DSIR_BUCKETS}))
           AS lr
  FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN tot
),
terms AS (
  SELECT doc_id, sum(n)::BIGINT AS n_feats,
         list(n::DOUBLE * lr ORDER BY bucket) AS ts
  FROM n JOIN lr USING (bucket)
  GROUP BY doc_id
),
w AS (
  SELECT doc_id, n_feats,
         round(list_reduce(list_prepend(0.0, ts), (a, x) -> a + x),
               6) AS logweight
  FROM terms
)
SELECT doc_id, n_feats, logweight, logweight >= 0.0 AS keep FROM w
"""


# ---------------------------------------------------------------------
# Small-file compaction planner (r7)
# ---------------------------------------------------------------------

_COMPACT_TARGET = 6000     # bytes per output file
_COMPACT_SHARDS = 37       # manifest grain: md5(doc_id) % 37
_COMPACT_PLANT = 1000      # planted already-large file ids


def q_compaction_plan(spark, sf_dir):
    """OPTIMIZE-style compaction plan over a file manifest: documents
    hashed into 37 shard files (the shard_manifest grain), plus three
    planted files already ≥ the 6000-byte target; the planner keeps
    the large files in place and bin-packs the rest into ≈target
    output groups via an exact BIGINT prefix sum
    (operators/bucketing.py compaction_plan). Planner cost is
    manifest-sized — one row per FILE — never data-sized."""
    from twitter_to_sqlite_spark.functions.sampling import _key_hash
    from twitter_to_sqlite_spark.operators import bucketing

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    manifest = (
        d.select(
            (_key_hash(F.col("doc_id")) % _COMPACT_SHARDS).cast("long")
            .alias("shard"),
            F.length("text").cast("long").alias("__b"))
        .groupBy("shard").agg(F.sum("__b").alias("n_bytes")))
    planted = spark.range(3).select(
        (F.col("id") + _COMPACT_PLANT).alias("shard"),
        (F.col("id") + 2 * _COMPACT_TARGET).alias("n_bytes"))
    return bucketing.compaction_plan(
        manifest.unionByName(planted), "shard", "n_bytes",
        _COMPACT_TARGET)


SQL_COMPACTION_PLAN = f"""
WITH m AS (
  SELECT (('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT
          % {_COMPACT_SHARDS})::BIGINT AS shard,
         sum(length(text))::BIGINT AS n_bytes
  FROM documents GROUP BY 1
  UNION ALL
  SELECT ({_COMPACT_PLANT} + i)::BIGINT,
         ({2 * _COMPACT_TARGET} + i)::BIGINT
  FROM (SELECT unnest([0, 1, 2]) AS i)
),
packed AS (
  SELECT shard, n_bytes,
         (sum(n_bytes) OVER (ORDER BY shard ROWS UNBOUNDED PRECEDING)
          - n_bytes) // {_COMPACT_TARGET} AS out_group
  FROM m WHERE n_bytes < {_COMPACT_TARGET}
),
g AS (
  SELECT shard, n_bytes, 'rewrite' AS action, out_group::BIGINT AS out_group,
         (sum(n_bytes) OVER (PARTITION BY out_group))::BIGINT AS group_bytes,
         (count(*) OVER (PARTITION BY out_group))::BIGINT AS n_in_group
  FROM packed
)
SELECT * FROM g
UNION ALL
SELECT shard, n_bytes, 'keep', NULL::BIGINT, NULL::BIGINT, NULL::BIGINT
FROM m WHERE n_bytes >= {_COMPACT_TARGET}
"""


# ---------------------------------------------------------------------
# LSH banding-parameter planner (r7)
# ---------------------------------------------------------------------

_LSH_PLAN_H = 16   # signature budget: the dedup_minhash family's n


def q_lsh_planner(spark, sf_dir):
    """Empirical MinHash banding planner (dedup.lsh_band_plan): for
    every (b, r) split of the 16-hash budget, the expected false-
    negative / false-positive mass of banded LSH over the corpus's
    OWN candidate-pair Jaccard spectrum (the dedup_sweep pairs frame,
    planted dups included), with the minimum-error leg marked chosen.
    All pair math is repeated-squaring + integer-ppm floors, so the
    aggregate is BIGINT-exact in any partition order."""
    # r10: consumes the shared `_build:jaccard_pairs` frame (already
    # built at min(_SWEEP_TAUS)) instead of rebuilding the shingle →
    # pair pipeline; the band-plan tail is one aggregate over it.
    pairs = _jaccard_pairs(spark, sf_dir)
    return dedup.lsh_band_plan(pairs, num_hashes=_LSH_PLAN_H)


def _sql_p2(expr: str, e: int) -> str:
    # expr**e for e a power of two — the identical multiplication tree
    # dedup.lsh_band_plan builds Spark-side (no libm pow anywhere).
    for _ in range(e.bit_length() - 1):
        expr = f"({expr} * {expr})"
    return expr


def _lsh_planner_sql() -> str:
    import math

    legs, r = [], 1
    while r <= _LSH_PLAN_H:
        legs.append((_LSH_PLAN_H // r, r))
        r *= 2
    agg_cols, leg_rows = [], []
    for b, r in legs:
        miss = _sql_p2(f"(1.0 - {_sql_p2('s', r)})", b)
        agg_cols.append(
            f"coalesce(sum(CASE WHEN istrue THEN"
            f" CAST(floor({miss} * 1000000.0) AS BIGINT)"
            f" ELSE 0 END), 0) AS fn_{b}_{r}")
        agg_cols.append(
            f"coalesce(sum(CASE WHEN istrue THEN 0 ELSE"
            f" CAST(floor((1.0 - {miss}) * 1000000.0) AS BIGINT)"
            f" END), 0) AS fp_{b}_{r}")
        knee = round(math.exp(math.log(1.0 / b) / r), 6)
        leg_rows.append(
            f"SELECT {b}::BIGINT AS b, {r}::BIGINT AS r,"
            f" CAST({knee!r} AS DOUBLE) AS s_knee,"
            f" fn_{b}_{r} AS fn_ppm, fp_{b}_{r} AS fp_ppm FROM agg")
    return f"""
WITH docs AS ({_SQL_DOCS_PLANTED}),
sh AS ({_SQL_SHINGLES}),
shf AS (
  SELECT id, shingle FROM (
    SELECT id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh
  ) WHERE df <= {_JACCARD_MAX_DF}
),
sz AS (SELECT id, count(*) AS sz FROM shf GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
p AS (
  SELECT inter::DOUBLE / (sa.sz + sb.sz - inter) AS s,
         inter * 2 >= (sa.sz + sb.sz - inter) AS istrue
  FROM inter
  JOIN sz sa ON sa.id = id_a
  JOIN sz sb ON sb.id = id_b
  WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {min(_SWEEP_TAUS)}
),
agg AS (SELECT {", ".join(agg_cols)} FROM p),
legs AS ({" UNION ALL ".join(leg_rows)}),
c AS (
  SELECT b, r, s_knee, CAST(fn_ppm AS BIGINT) AS fn_ppm,
         CAST(fp_ppm AS BIGINT) AS fp_ppm,
         CAST(fn_ppm + fp_ppm AS BIGINT) AS cost_ppm
  FROM legs
)
SELECT b, r, s_knee, fn_ppm, fp_ppm, cost_ppm,
       row_number() OVER (ORDER BY cost_ppm, r) = 1 AS chosen
FROM c
"""


SQL_LSH_PLANNER = _lsh_planner_sql()


# ---------------------------------------------------------------------
# Retrieval-quality eval: NDCG@k + MRR@k (r7)
# ---------------------------------------------------------------------

_RETEVAL_K = 10
_RETEVAL_QS = [(1, "spark"), (1, "join"), (2, "hash"), (2, "merge"),
               (3, "window"), (3, "filter"), (4, "stream"), (4, "batch")]


# r11 (VERDICT r10 'Next round' #3): retrieval_eval and bm25_tuning
# call `_bm25_eval_front` with the IDENTICAL (index, queries) — the
# postings join + doc lengths + corpus stats + dfreq scoring frame.
# ONE (session, sf_dir)-cached checkpoint of that frame now serves
# both, billed per bench pass as `_build:bm25_front` (it consumes the
# `_build:bm25_index` checkpoint, the doc_shingles→jaccard_pairs
# chained-builds convention). qn is an 8-row aggregate of the literal
# query set — not worth pinning. The cache dict `_BM25_FRONT_CACHE`
# lives in plans/_q03_dedup.py with the other per-pass caches so
# clear_caches() drops it every bench pass.


def _reteval_queries(spark):
    return spark.createDataFrame(_RETEVAL_QS,
                                 "query_id long, term string")


def _bm25_front_build(spark, sf_dir):
    """The raw (uncached) eval-front scored frame — plan tests inspect
    THIS (the cached form explains as an RDD-scan)."""
    idx = _doc_index(spark, sf_dir)
    scored, _qn = R._bm25_eval_front(idx, "doc_id",
                                     _reteval_queries(spark))
    return scored


def _bm25_front(spark, sf_dir):
    key = (spark, sf_dir)
    if key not in _BM25_FRONT_CACHE:
        scored = _bm25_front_build(
            spark, sf_dir).localCheckpoint(eager=False)
        qn = _reteval_queries(spark).groupBy("query_id").agg(
            F.countDistinct("term").alias("__qn"))
        _BM25_FRONT_CACHE[key] = (scored, qn)
    return _BM25_FRONT_CACHE[key]


def q_retrieval_eval(spark, sf_dir):
    """Search/RAG eval harness (operators/relational.py
    retrieval_eval): NDCG@10 and MRR@10 of query-keyed BM25 over the
    corpus inverted index for a fixed 4-query eval set, with term-
    coverage graded relevance (gain 2^rel − 1). The regression number
    a pipeline reads after every ranker or index change; per-query
    DCG folds run in rank order over ≤k rows, so the floats are
    engine-identical at the rounded grain. r11: consumes the shared
    `_bm25_front` checkpoint (same frame bm25_tuning scores over)."""
    qs = _reteval_queries(spark)
    return R.retrieval_eval(None, "doc_id", qs, k=_RETEVAL_K,
                            front=_bm25_front(spark, sf_dir))


def _reteval_shared_ctes() -> str:
    # BM25-parameter-independent prefix: tokenize, tf/dl/stats, the
    # query set, and per-(query, term) document frequencies
    vals = ", ".join(f"({q}::BIGINT, '{t}')" for q, t in _RETEVAL_QS)
    return f"""tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY 1, 2
),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl),
q AS (SELECT * FROM (VALUES {vals}) t(query_id, term)),
qn AS (SELECT query_id, count(DISTINCT term) AS qn FROM q GROUP BY 1),
hits AS (
  SELECT q.query_id, tf.doc_id, tf.term, tf.tf FROM tf JOIN q USING (term)
),
dfreq AS (
  SELECT query_id, term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM hits GROUP BY 1, 2
)"""


def _reteval_leg(k1: float, b: float, sfx: str = "") -> str:
    # per-(k1, b) chain ending in res{sfx}: (query_id, n_cands, ndcg,
    # mrr) — the same arithmetic retrieval_eval builds Spark-side
    fold = "list_reduce(list_prepend(0.0, {c}), (a, x) -> a + x)"
    return f"""sc{sfx} AS (
  SELECT h.query_id, h.doc_id, h.term,
         ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
           * h.tf * ({k1!r} + 1)
           / (h.tf + {k1!r} * (1 - {b!r} + {b!r} * dl.dl / stats.avgdl))
           AS s
  FROM hits h
  JOIN dfreq USING (query_id, term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
),
pd{sfx} AS (
  SELECT query_id, doc_id, round(sum(s), 4) AS score,
         count(DISTINCT term) AS rel
  FROM sc{sfx} GROUP BY 1, 2
),
rk{sfx} AS (
  SELECT query_id, doc_id, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS r
  FROM pd{sfx}
),
ik{sfx} AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY rel DESC, doc_id) AS r
  FROM pd{sfx}
),
dcg{sfx} AS (
  SELECT query_id,
         list(((1 << rel) - 1)::DOUBLE / log2(r + 1) ORDER BY r) AS ts
  FROM rk{sfx} WHERE r <= {_RETEVAL_K} GROUP BY 1
),
idcg{sfx} AS (
  SELECT query_id,
         list(((1 << rel) - 1)::DOUBLE / log2(r + 1) ORDER BY r) AS ts
  FROM ik{sfx} WHERE r <= {_RETEVAL_K} GROUP BY 1
),
mrr{sfx} AS (
  SELECT rk{sfx}.query_id, round(1.0 / min(r), 6) AS mrr
  FROM rk{sfx} JOIN qn USING (query_id)
  WHERE r <= {_RETEVAL_K} AND rel = qn GROUP BY 1
),
base{sfx} AS (SELECT query_id, count(*) AS n_cands FROM pd{sfx} GROUP BY 1),
res{sfx} AS (
  SELECT base{sfx}.query_id, base{sfx}.n_cands,
         round({fold.format(c=f"dcg{sfx}.ts")}
               / {fold.format(c=f"idcg{sfx}.ts")}, 6) AS ndcg,
         coalesce(mrr{sfx}.mrr, 0.0) AS mrr
  FROM base{sfx}
  JOIN dcg{sfx} USING (query_id)
  JOIN idcg{sfx} USING (query_id)
  LEFT JOIN mrr{sfx} USING (query_id)
)"""


def _retrieval_eval_sql() -> str:
    return f"""
WITH {_reteval_shared_ctes()},
{_reteval_leg(1.2, 0.75)}
SELECT query_id, n_cands, ndcg, mrr FROM res
"""


SQL_RETRIEVAL_EVAL = _retrieval_eval_sql()


# ---------------------------------------------------------------------
# Per-source diversity report (r7)
# ---------------------------------------------------------------------


def q_source_diversity(spark, sf_dir):
    """Distinct-1 / distinct-2 diversity per source (text.
    distinct_ngram_diversity): the corpus-level templatedness probe —
    a source whose docs individually pass repetition filters but are
    all near-identical shows up here as a collapsed distinct-2."""
    d = _t(spark, sf_dir, "documents").select("source", "text")
    return text.distinct_ngram_diversity(d, "source")


SQL_SOURCE_DIVERSITY = f"""
WITH t AS (SELECT source, {_SQL_TOKS} AS t FROM documents),
uni AS (SELECT source, unnest(t) AS w FROM t),
bg AS (
  SELECT source, unnest(list_transform(
    generate_series(1, len(t) - 1), i -> t[i] || ' ' || t[i + 1])) AS bg
  FROM t WHERE len(t) >= 2
),
u AS (
  SELECT source, count(*)::BIGINT AS n_tokens,
         count(DISTINCT w)::BIGINT AS n_types
  FROM uni GROUP BY 1
),
b AS (
  SELECT source, count(*)::BIGINT AS n_bigrams,
         count(DISTINCT bg)::BIGINT AS n_bigram_types
  FROM bg GROUP BY 1
),
nd AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1)
SELECT source, n_docs, n_tokens, n_types,
       round(n_types::DOUBLE / n_tokens, 6) AS distinct1,
       n_bigrams, n_bigram_types,
       round(n_bigram_types::DOUBLE / n_bigrams, 6) AS distinct2
FROM nd JOIN u USING (source) JOIN b USING (source)
"""


# ---------------------------------------------------------------------
# Version-store GC plan (r7)
# ---------------------------------------------------------------------


def q_version_gc(spark, sf_dir):
    """Retention dry-run on the versioned-table layer (operators/
    sinks.py gc_plan): commit four growing deterministic snapshots of
    orders (version i = keys with o_orderkey % 4 < i), then plan a
    keep-last-2 vacuum — versions 1-2 must be marked expirable with
    exact per-version row counts and the reclaimable row fraction.
    Store protocol (allocate→rename→manifest) is exercised end-to-end;
    per-call tempdir removed before returning (the version_diff
    hygiene), report localCheckpoint-materialized first."""
    import shutil
    import tempfile

    from twitter_to_sqlite_spark.operators import sinks

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    root = tempfile.mkdtemp(prefix="vergc-")
    try:
        path = root + "/tbl"
        for i in range(1, 5):
            sinks.write_version(
                o.filter(F.col("o_orderkey") % 4 < i), path)
        return sinks.gc_plan(spark, path, keep_last=2) \
            .localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_VERSION_GC = """
WITH v AS (
  SELECT i AS version,
         (SELECT count(*) FROM orders WHERE o_orderkey % 4 < i) AS n_rows
  FROM (SELECT unnest([1, 2, 3, 4]) AS i)
),
t AS (
  SELECT sum(n_rows) AS tot,
         sum(CASE WHEN version <= 2 THEN n_rows ELSE 0 END) AS exp
  FROM v
)
SELECT version::BIGINT AS version, n_rows::BIGINT AS n_rows,
       version <= 2 AS expirable,
       round(exp::DOUBLE / tot, 6) AS reclaim_frac
FROM v, t
"""




__all__ = list(_prev.__all__) + [
    "_reteval_queries",
    "_bm25_front_build",
    "_bm25_front",
    "_drift_sides",
    "_drift_hists_build",
    "_drift_hists",
    "_DRIFT_SIDES_SQL",
    "q_distribution_match",
    "_distribution_match_sql",
    "SQL_DISTRIBUTION_MATCH",
    "q_dm_maintained",
    "_dm_maintained_sql",
    "SQL_DM_MAINTAINED",
    "q_emd_drift",
    "_emd_sql",
    "SQL_EMD_DRIFT",
    "_NORM_PLANT",
    "q_dedup_normalized",
    "SQL_DEDUP_NORMALIZED",
    "_ZIPF_K",
    "q_zipf_fit",
    "SQL_ZIPF_FIT",
    "_PQ_CANDS",
    "_pq_codebooks",
    "q_ann_pq",
    "_pq_pieces",
    "_pq_core",
    "SQL_ANN_PQ",
    "q_pq_recall",
    "SQL_PQ_RECALL",
    "_DECAY_TOPK",
    "q_decay_topk",
    "SQL_DECAY_TOPK",
    "_IVFPQ_NPROBE",
    "q_ann_ivfpq",
    "_ivfpq_sql",
    "SQL_ANN_IVFPQ",
    "q_psi_drift_by",
    "_psi_by_sql",
    "SQL_PSI_DRIFT_BY",
    "q_tokenizer_fertility",
    "SQL_TOKENIZER_FERTILITY",
    "_LEN_TAUS",
    "q_length_sweep",
    "SQL_LENGTH_SWEEP",
    "_DSIR_BUCKETS",
    "q_dsir_weights",
    "SQL_DSIR_WEIGHTS",
    "_COMPACT_TARGET",
    "_COMPACT_SHARDS",
    "_COMPACT_PLANT",
    "q_compaction_plan",
    "SQL_COMPACTION_PLAN",
    "_LSH_PLAN_H",
    "q_lsh_planner",
    "_sql_p2",
    "_lsh_planner_sql",
    "SQL_LSH_PLANNER",
    "_RETEVAL_K",
    "_RETEVAL_QS",
    "q_retrieval_eval",
    "_reteval_shared_ctes",
    "_reteval_leg",
    "_retrieval_eval_sql",
    "SQL_RETRIEVAL_EVAL",
    "q_source_diversity",
    "SQL_SOURCE_DIVERSITY",
    "q_version_gc",
    "SQL_VERSION_GC",
]
