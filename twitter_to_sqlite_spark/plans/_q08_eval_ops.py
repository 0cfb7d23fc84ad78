"""Catalog chunk 8: eval metrics, sweeps, certificates, ops/maintenance queries."""

from __future__ import annotations

from twitter_to_sqlite_spark.plans import _q07_quantized_drift as _prev
from twitter_to_sqlite_spark.plans._q07_quantized_drift import *  # noqa: F401,F403

# ---------------------------------------------------------------------
# Cell-blocked kNN graph (r7)
# ---------------------------------------------------------------------

_KNNG_K = 5


# Two consumers (the graph query itself + the kNN-classify eval)
# share one graph build per (session, sf_dir) — the _minhash_pairs
# shape; bench bills it to the "_build:knn_graph" pseudo-entry and
# clear_caches() drops it every timing pass.


def _knn_graph_build(spark, sf_dir) -> DataFrame:
    """Raw (uncached) graph TAIL — the per-node rank window over the
    shared `_cell_pairs` checkpoint (r11: the Σ cell² scoring pass is
    billed to `_build:cell_pairs` and shared with semdedup; plan tests
    inspect `_cell_pairs_build` for the cell-equi-join property and
    THIS for the window tail)."""
    centroids = _ivf_centroids(spark, sf_dir)
    return similarity.knn_graph(
        _embed_base(spark, sf_dir), centroids, k=_KNNG_K,
        pairs=_cell_pairs(spark, sf_dir))


def _knn_graph_frame(spark, sf_dir) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _KNNG_CACHE:
        _KNNG_CACHE[key] = _knn_graph_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _KNNG_CACHE[key]


def q_knn_graph(spark, sf_dir):
    """Approximate kNN graph over the embedding corpus (similarity.
    knn_graph): each vector's top-5 cosine neighbors within its
    k-means cell — the shared IVF centroids, so the graph costs
    Σ cell² and reuses _build:ivf_centroids. The substrate for
    SemDeDup-style clustering, embedding label propagation, and
    connectivity outlier pruning (knn_classify probes this same
    cached frame)."""
    return _knn_graph_frame(spark, sf_dir)


def _knn_graph_ctes() -> str:
    # shared by SQL_KNN_GRAPH and the kNN-classify oracle
    ctes, final = _kmeans_ctes(_IVF_ITERS, _IVF_SAMPLE_MOD)
    return f"""{ctes},
base AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
wc AS (
  SELECT vec_id, v,
         (SELECT cell FROM {final}
          ORDER BY list_dot_product(b.v, cv) DESC, cell LIMIT 1) AS cell
  FROM base b
),
cand AS (
  SELECT x.vec_id AS src, y.vec_id AS nbr,
         round(list_dot_product(x.v, y.v)
               / (sqrt(list_dot_product(x.v, x.v))
                  * sqrt(list_dot_product(y.v, y.v))), 4) AS cosine
  FROM wc x JOIN wc y ON x.cell = y.cell AND x.vec_id <> y.vec_id
),
knng AS (
  SELECT src, nbr, r, cosine
  FROM (
    SELECT src, nbr, cosine,
           row_number() OVER (PARTITION BY src
                              ORDER BY cosine DESC, nbr) AS r
    FROM cand
  )
  WHERE r <= {_KNNG_K}
)"""


SQL_KNN_GRAPH = f"""
WITH {_knn_graph_ctes()}
SELECT src, nbr, r::BIGINT AS rank, cosine FROM knng
"""


# ---------------------------------------------------------------------
# Changelog compaction (r7)
# ---------------------------------------------------------------------


def q_changelog_compact(spark, sf_dir):
    """CDC log compaction (operators/relational.py changelog_compact)
    over a synthetic multi-event changelog on orders: keys %5=0 are
    inserted then updated (net: one insert, final payload), %3≠%5
    keys get a bare update, %7=0 keys a trailing delete — so %35 keys
    cancel entirely (insert→delete) and %21 keys net to a delete.
    Replay-equivalent to the full log at one row per surviving key."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    k = F.col("o_orderkey")
    ins = o.filter(k % 5 == 0).select(
        "o_orderkey", F.lit("insert").alias("op"),
        F.lit(1).alias("seq"), "o_totalprice")
    up5 = o.filter(k % 5 == 0).select(
        "o_orderkey", F.lit("update").alias("op"),
        F.lit(2).alias("seq"),
        (F.col("o_totalprice") * 2).alias("o_totalprice"))
    up3 = o.filter((k % 3 == 0) & (k % 5 != 0)).select(
        "o_orderkey", F.lit("update").alias("op"),
        F.lit(2).alias("seq"),
        (F.col("o_totalprice") + 1).alias("o_totalprice"))
    dels = o.filter(k % 7 == 0).select(
        "o_orderkey", F.lit("delete").alias("op"),
        F.lit(3).alias("seq"), "o_totalprice")
    ch = ins.unionByName(up5).unionByName(up3).unionByName(dels)
    return R.changelog_compact(
        ch, ["o_orderkey"], "op", "seq", ["o_totalprice"])


SQL_CHANGELOG_COMPACT = """
WITH ch AS (
  SELECT o_orderkey, 'insert' AS op, 1 AS seq, o_totalprice
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 'update', 2, o_totalprice * 2
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey, 'update', 2, o_totalprice + 1
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 5 <> 0
  UNION ALL
  SELECT o_orderkey, 'delete', 3, o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0
),
w AS (
  SELECT *,
         row_number() OVER (PARTITION BY o_orderkey ORDER BY seq) AS rf,
         row_number() OVER (PARTITION BY o_orderkey ORDER BY seq DESC)
           AS rl
  FROM ch
),
f AS (SELECT o_orderkey, op AS first_op FROM w WHERE rf = 1),
l AS (
  SELECT o_orderkey, op AS last_op, o_totalprice FROM w WHERE rl = 1
)
SELECT f.o_orderkey,
       CASE WHEN f.first_op = 'insert' THEN 'insert'
            ELSE l.last_op END AS net_op,
       l.o_totalprice
FROM f JOIN l USING (o_orderkey)
WHERE NOT (f.first_op = 'insert' AND l.last_op = 'delete')
"""


# ---------------------------------------------------------------------
# MMR diversification rerank (r7)
# ---------------------------------------------------------------------

# λ=0.75 deliberately: 0.75 and 1−0.75=0.25 are both exact binary
# doubles, so the Spark lit() and the SQL literal are the same number
# (λ=0.7 would make python's 1.0−0.7 ≠ SQL's 0.3 by one ulp).
_MMR_K, _MMR_M, _MMR_LAM = 3, 10, 0.75


def q_mmr_diversify(spark, sf_dir):
    """RAG context diversification (similarity.mmr_diversify): greedy
    MMR over the top-10 cosine candidates of query vector 0 — pick 3
    passages trading relevance against redundancy with the already-
    picked set. The oracle unrolls the same greedy trajectory as
    chained argmax CTEs, so the sequential semantics themselves are
    cross-engine verified."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    qv = e.filter(F.col("vec_id") == 0).select(
        "vec_id", F.col("v").alias("embedding"))
    corpus = e.select("vec_id", F.col("v").alias("embedding"))
    bf = similarity.brute_force_topk(corpus, qv, k=_MMR_M)
    cands = (bf.select(F.col("neighbor_id").alias("id"),
                       F.col("cosine").alias("rel"))
             .join(e.select(F.col("vec_id").alias("id"), "v"), "id"))
    return (similarity.mmr_diversify(cands, k=_MMR_K, lam=_MMR_LAM)
            .withColumnRenamed("id", "vec_id"))


def _mmr_sql() -> str:
    sim = ("round(list_dot_product({x}, {y})"
           " / (sqrt(list_dot_product({x}, {x}))"
           " * sqrt(list_dot_product({y}, {y}))), 4)")
    s_c1 = sim.format(x="c.v", y="s1.v")
    s_c2 = sim.format(x="c.v", y="s2.v")
    return f"""
WITH q AS (SELECT embedding::DOUBLE[] AS a FROM embeddings
           WHERE vec_id = 0),
c0 AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b
       FROM embeddings),
scored AS (
  SELECT neighbor_id, {_SQL_COS} AS cosine
  FROM c0, q WHERE neighbor_id != 0
),
cand AS (
  SELECT neighbor_id AS id, cosine AS rel, b AS v FROM (
    SELECT s.neighbor_id, s.cosine, c0.b,
           row_number() OVER (ORDER BY s.cosine DESC, s.neighbor_id)
             AS r
    FROM scored s JOIN c0 USING (neighbor_id)
  ) WHERE r <= {_MMR_M}
),
s1 AS (SELECT id, v, rel AS sc FROM cand ORDER BY rel DESC, id LIMIT 1),
r2 AS (
  SELECT c.id, c.v,
         round(CAST(0.75 AS DOUBLE) * c.rel
               - CAST(0.25 AS DOUBLE) * {s_c1}, 4) AS sc
  FROM cand c, s1 WHERE c.id <> s1.id
),
s2 AS (SELECT id, v, sc FROM r2 ORDER BY sc DESC, id LIMIT 1),
r3 AS (
  SELECT c.id,
         round(CAST(0.75 AS DOUBLE) * c.rel
               - CAST(0.25 AS DOUBLE) * greatest({s_c1}, {s_c2}), 4)
           AS sc
  FROM cand c, s1, s2 WHERE c.id <> s1.id AND c.id <> s2.id
),
s3 AS (SELECT id, sc FROM r3 ORDER BY sc DESC, id LIMIT 1)
SELECT 1::BIGINT AS rank, id AS vec_id, sc AS mmr_score FROM s1
UNION ALL
SELECT 2::BIGINT, id, sc FROM s2
UNION ALL
SELECT 3::BIGINT, id, sc FROM s3
"""


SQL_MMR_DIVERSIFY = _mmr_sql()


# ---------------------------------------------------------------------
# kNN classification accuracy (r7)
# ---------------------------------------------------------------------


def q_knn_classify(spark, sf_dir):
    """Embedding-space quality probe (similarity.knn_classify_eval):
    per-class accuracy of majority-vote kNN classification over the
    cell-blocked knn_graph, against the embeddings table's own
    labels — the no-model eval that detects a degraded embedding
    space before it degrades retrieval. Probes the shared cached
    graph (_build:knn_graph) — the eval itself never rebuilds it."""
    e = _t(spark, sf_dir, "embeddings")
    return similarity.knn_classify_eval(
        _knn_graph_frame(spark, sf_dir), e.select("vec_id", "label"))


SQL_KNN_CLASSIFY = f"""
WITH {_knn_graph_ctes()},
lab AS (SELECT vec_id, label FROM embeddings),
votes AS (
  SELECT k.src, l.label AS nl, count(*) AS c
  FROM knng k JOIN lab l ON l.vec_id = k.nbr
  GROUP BY 1, 2
),
pred AS (
  SELECT src, nl AS pred FROM (
    SELECT src, nl, row_number() OVER (PARTITION BY src
                                       ORDER BY c DESC, nl) AS r
    FROM votes
  ) WHERE r = 1
)
SELECT l.label,
       count(*)::BIGINT AS n,
       sum(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END)::BIGINT
         AS n_correct,
       round(sum(CASE WHEN p.pred = l.label THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS accuracy
FROM pred p JOIN lab l ON l.vec_id = p.src
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Mixture temperature sweep (r7)
# ---------------------------------------------------------------------

_TEMP_ALPHAS = [0.2, 0.3, 0.5, 0.7, 1.0]


def q_temperature_sweep(spark, sf_dir):
    """Sampling-temperature tuning curve (sampling.temperature_sweep):
    for each candidate α of the q∝p^α rule, the dominant/smallest
    smoothed share, the mix entropy, and the worst upsample factor
    per language — mix_temperature's measure-don't-guess companion
    (dedup_sweep's discipline applied to the mixture knob)."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        F.size(F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                        lambda x: x != "")).cast("long").alias("n_tokens"))
    return sampling.temperature_sweep(d, "lang", "n_tokens", _TEMP_ALPHAS)


SQL_TEMPERATURE_SWEEP = f"""
WITH per AS (
  SELECT lang, sum(len({_SQL_TOKS}))::BIGINT AS n FROM documents
  GROUP BY lang
),
tot AS (SELECT sum(n) AS tot FROM per),
wp AS (SELECT lang, n::DOUBLE / tot::DOUBLE AS p FROM per, tot),
a AS (SELECT CAST(unnest([{", ".join(str(x) for x in _TEMP_ALPHAS)}])
             AS DOUBLE) AS alpha),
aw AS (SELECT alpha, lang, p, pow(p, alpha) AS w FROM wp, a),
terms AS (
  SELECT alpha, count(*)::BIGINT AS n_strata,
         list({{'lang': lang, 'w': w, 'p': p}} ORDER BY lang) AS ts
  FROM aw GROUP BY alpha
),
z AS (
  SELECT *, list_reduce(list_prepend(0.0, list_transform(ts, t -> t.w)),
                        (acc, x) -> acc + x) AS z
  FROM terms
)
SELECT alpha, n_strata,
       round(list_max(list_transform(ts, t -> t.w)) / z, 6) AS max_share,
       round(list_min(list_transform(ts, t -> t.w)) / z, 6) AS min_share,
       round(list_reduce(list_prepend(0.0, list_transform(
               ts, t -> -(t.w / z) * ln(t.w / z))),
             (acc, x) -> acc + x), 6) AS entropy,
       round(list_reduce(list_prepend(0.0, list_transform(
               ts, t -> (t.w / z) / t.p)),
             (acc, x) -> greatest(acc, x)), 4) AS max_upsample
FROM z
"""


# ---------------------------------------------------------------------
# Cross-source duplication matrix (r7)
# ---------------------------------------------------------------------


def q_dup_source_matrix(spark, sf_dir):
    """Which sources duplicate each other: the MinHash near-dup pairs
    (shared cached frame) labeled with each side's source and counted
    per unordered source pair — the mirror-site / syndication
    detector that says WHERE the duplication budget goes, where
    dedup_cluster_profile only says how big the clusters are.
    Planted copies map back to their original's source (id − offset),
    so the diagonal is guaranteed populated. Cost: two doc-keyed
    joins on the bounded pairs frame + one |sources|²-bounded agg."""
    pairs = _minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    src = _t(spark, sf_dir, "documents").select("doc_id", "source")

    def orig(c):
        return F.when(F.col(c) >= _PLANT_OFFSET,
                      F.col(c) - _PLANT_OFFSET).otherwise(F.col(c))

    p = pairs.select(orig("id_a").alias("__oa"),
                     orig("id_b").alias("__ob"))
    j = (p.join(src.select(F.col("doc_id").alias("__oa"),
                           F.col("source").alias("__sa")), "__oa")
         .join(src.select(F.col("doc_id").alias("__ob"),
                          F.col("source").alias("__sb")), "__ob"))
    agg = (j.select(F.least("__sa", "__sb").alias("source_a"),
                    F.greatest("__sa", "__sb").alias("source_b"))
           .groupBy("source_a", "source_b")
           .agg(F.count(F.lit(1)).alias("n_pairs")))
    tot = agg.agg(F.sum("n_pairs").alias("__tot"))
    return agg.crossJoin(F.broadcast(tot)).select(
        "source_a", "source_b", "n_pairs",
        F.round(F.col("n_pairs").cast("double") / F.col("__tot"), 6)
        .alias("share"))


SQL_DUP_SOURCE_MATRIX = f"""
WITH {_SQL_MINHASH_CTES},
src AS (SELECT doc_id, source FROM documents),
p AS (
  SELECT CASE WHEN id_a >= {_PLANT_OFFSET} THEN id_a - {_PLANT_OFFSET}
              ELSE id_a END AS oa,
         CASE WHEN id_b >= {_PLANT_OFFSET} THEN id_b - {_PLANT_OFFSET}
              ELSE id_b END AS ob
  FROM mh_pairs
),
j AS (
  SELECT least(a.source, b.source) AS source_a,
         greatest(a.source, b.source) AS source_b
  FROM p JOIN src a ON a.doc_id = p.oa JOIN src b ON b.doc_id = p.ob
),
agg AS (
  SELECT source_a, source_b, count(*)::BIGINT AS n_pairs
  FROM j GROUP BY 1, 2
),
tot AS (SELECT sum(n_pairs) AS tot FROM agg)
SELECT source_a, source_b, n_pairs,
       round(n_pairs::DOUBLE / tot, 6) AS share
FROM agg, tot
"""


# ---------------------------------------------------------------------
# BM25 parameter tuning (r7)
# ---------------------------------------------------------------------

_BM25_GRID = [(1.2, 0.75), (0.9, 0.4), (1.6, 0.75), (1.2, 0.0)]


def q_bm25_tuning(spark, sf_dir):
    """Ranker parameter sweep priced by retrieval quality: mean
    NDCG@10 / MRR@10 of the fixed eval set for each (k1, b) of the
    grid (operators/relational.py bm25_param_sweep) — ann_tuning's
    measure-don't-guess loop applied to the lexical ranker
    (k1=1.2/b=0.75 are FTS5's defaults; b=0 turns off length
    normalization). One shared inverted index (lazy local checkpoint)
    feeds all legs. On this synthetic corpus's near-uniform
    vocabulary every leg scores a perfect mean NDCG and the tie-break
    decides; the discriminating case is pinned by the planted-corpus
    unit test. r11: consumes the shared `_bm25_front` checkpoint
    (same frame retrieval_eval folds over)."""
    qs = _reteval_queries(spark)
    return R.bm25_param_sweep(None, "doc_id", qs, _BM25_GRID,
                              k=_RETEVAL_K,
                              front=_bm25_front(spark, sf_dir))


def _bm25_tuning_sql() -> str:
    legs = ",\n".join(
        _reteval_leg(k1, b, f"_{i}") for i, (k1, b) in enumerate(_BM25_GRID))
    union = "\nUNION ALL\n".join(
        f"SELECT CAST({k1!r} AS DOUBLE) AS k1, CAST({b!r} AS DOUBLE) AS b,"
        f" query_id, ndcg, mrr FROM res_{i}"
        for i, (k1, b) in enumerate(_BM25_GRID))
    fold = ("list_reduce(list_prepend(0.0, list_transform(ts, t -> t.{f})),"
            " (a, x) -> a + x)")
    return f"""
WITH {_reteval_shared_ctes()},
{legs},
legs AS ({union}),
terms AS (
  SELECT k1, b, count(*)::BIGINT AS n_queries,
         list({{'query_id': query_id, 'ndcg': ndcg, 'mrr': mrr}}
              ORDER BY query_id) AS ts
  FROM legs GROUP BY 1, 2
),
scored AS (
  SELECT k1, b, n_queries,
         round({fold.format(f="ndcg")} / n_queries, 6) AS mean_ndcg,
         round({fold.format(f="mrr")} / n_queries, 6) AS mean_mrr
  FROM terms
)
SELECT k1, b, n_queries, mean_ndcg, mean_mrr,
       row_number() OVER (ORDER BY mean_ndcg DESC, mean_mrr DESC, k1, b)
         = 1 AS chosen
FROM scored
"""


SQL_BM25_TUNING = _bm25_tuning_sql()


# ---------------------------------------------------------------------
# ANN index append (r7)
# ---------------------------------------------------------------------


def q_ann_index_append(spark, sf_dir):
    """ANN index maintenance end-to-end (similarity.append_ann_index):
    build the IVF index on the even half of the corpus, APPEND the odd
    half (assigned with the sidecar centroids — no retrain, existing
    cell files untouched), then probe the same query set as ann_ivf.
    The oracle is ann_ivf's full-corpus SQL verbatim: an appended
    index must answer exactly like one built whole. Per-call tempdir
    removed before returning (version_diff hygiene)."""
    import shutil
    import tempfile

    e = _t(spark, sf_dir, "embeddings")
    root = tempfile.mkdtemp(prefix="annapp-")
    try:
        path = root + "/idx"
        cents = _ivf_centroids(spark, sf_dir)
        similarity.build_ivf_index(
            e.filter(F.col("vec_id") % 2 == 0), path, cents)
        similarity.append_ann_index(
            e.filter(F.col("vec_id") % 2 == 1), path)
        out = similarity.probe_ivf_index(
            spark, path, e.filter(F.col("vec_id") < 5), k=3, n_probe=1)
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_ANN_INDEX_APPEND = SQL_ANN_IVF


# ---------------------------------------------------------------------
# SimHash radius sweep (r7)
# ---------------------------------------------------------------------

_SIMHASH_RADII = [0, 1, 2, 3]


def q_simhash_sweep(spark, sf_dir):
    """Hamming-radius sweep for SimHash dedup (dedup_sweep's
    discipline on the OTHER pairs family): from one verified pairs
    frame at the banding's pigeonhole bound, how many documents the
    drop-the-later-duplicate rule removes at each radius 0..3 with
    the corpus fraction — the number read before fixing the SimHash
    cutoff. The radius explode touches only the bounded pairs frame;
    a spine keeps zero-removal radii visible."""
    d = _docs_with_planted_dups(spark, sf_dir)
    # r10: the pairs frame is parameter-identical to dedup_simhash's —
    # consume the shared `_build:simhash_pairs` checkpoint.
    pairs = _simhash_pairs(spark, sf_dir)
    # r10: countDistinct(id_b | h ≤ r) ≡ count(id_b | min_h ≤ r), and
    # all |radius| counts collapse into ONE global conditional
    # aggregate (1 row out) — no radius explode, no per-radius
    # distinct agg, no spine join; a radius with zero removals
    # naturally reports 0 (same device as dedup_sweep's τ tail).
    hb = pairs.groupBy("id_b").agg(F.min("hamming").alias("__hmin"))
    sums = hb.agg(*[
        F.sum(F.when(F.col("__hmin") <= F.lit(x), 1).otherwise(0))
        .cast("long").alias(f"__rm{i}")
        for i, x in enumerate(_SIMHASH_RADII)
    ])
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    legs = F.explode(F.array(*[
        F.struct(
            F.lit(int(x)).alias("radius"),
            F.coalesce(F.col(f"__rm{i}"), F.lit(0).cast("long"))
            .alias("n_removed"))
        for i, x in enumerate(_SIMHASH_RADII)
    ])).alias("L")
    return (
        sums.crossJoin(F.broadcast(n))
        .select(legs, "n_docs")
        .select(
            F.col("L.radius").alias("radius"),
            F.col("L.n_removed").alias("n_removed"),
            "n_docs",
            F.round(F.col("L.n_removed").cast("double")
                    / F.col("n_docs").cast("double"), 4)
            .alias("frac_removed"),
        )
    )


SQL_SIMHASH_SWEEP = f"""
WITH {{ctes}},
radii AS (SELECT unnest([{", ".join(str(x) for x in _SIMHASH_RADII)}])::INT
          AS radius),
rem AS (
  SELECT radius, count(DISTINCT id_b) AS rm
  FROM radii JOIN ham ON ham.hamming <= radii.radius
  GROUP BY radius
),
n AS (SELECT count(*) AS n_docs FROM docs)
SELECT r.radius,
       CAST(coalesce(rem.rm, 0) AS BIGINT) AS n_removed,
       CAST(n.n_docs AS BIGINT) AS n_docs,
       round(coalesce(rem.rm, 0)::DOUBLE / n.n_docs, 4) AS frac_removed
FROM radii r LEFT JOIN rem ON r.radius = rem.radius, n
""".format(ctes=_simhash_ctes())


# ---------------------------------------------------------------------
# Seasonal-naive forecast eval (r7)
# ---------------------------------------------------------------------


def q_forecast_eval(spark, sf_dir):
    """Capacity-planning baseline (functions/stats.py
    seasonal_naive_eval): predict each hour-of-day's event count as
    the train window's per-day mean (days 1-20), score on the held-out
    days 21-30 with zero-event cells included via a dense generated
    spine — per-hour prediction, actual mean, and MAE. The number any
    deployed forecaster must beat."""
    from twitter_to_sqlite_spark.functions import stats

    e = _t(spark, sf_dir, "events").select("ts")
    return stats.seasonal_naive_eval(e)


SQL_FORECAST_EVAL = """
WITH hours AS (SELECT unnest(generate_series(0, 23))::INT AS hour),
tc AS (
  SELECT EXTRACT(hour FROM ts)::INT AS hour, count(*) AS tc
  FROM events WHERE EXTRACT(day FROM ts) <= 20 GROUP BY 1
),
pred AS (
  SELECT hour, coalesce(tc, 0)::DOUBLE / 20.0 AS pred
  FROM hours LEFT JOIN tc USING (hour)
),
cells AS (
  SELECT hour, pred, unnest(generate_series(21, 30))::INT AS day
  FROM pred
),
ac AS (
  SELECT EXTRACT(day FROM ts)::INT AS day,
         EXTRACT(hour FROM ts)::INT AS hour, count(*) AS ac
  FROM events WHERE EXTRACT(day FROM ts) BETWEEN 21 AND 30
  GROUP BY 1, 2
),
j AS (
  SELECT c.hour, c.day, c.pred, coalesce(ac.ac, 0)::BIGINT AS ac
  FROM cells c LEFT JOIN ac USING (day, hour)
),
t AS (
  SELECT hour, any_value(pred) AS pred, sum(ac) AS atot,
         list(abs(ac::DOUBLE - pred) ORDER BY day) AS es
  FROM j GROUP BY 1
)
SELECT hour, round(pred, 6) AS pred,
       round(atot::DOUBLE / 10.0, 6) AS actual_mean,
       round(list_reduce(list_prepend(0.0, es), (a, x) -> a + x)
             / 10.0, 6) AS mae
FROM t
"""


# ---------------------------------------------------------------------
# Watermark-delay sweep (r7)
# ---------------------------------------------------------------------

_WM_TAUS_US = [0, 1_000_000, 10_000_000, 60_000_000, 300_000_000]


def q_lateness_sweep(spark, sf_dir):
    """Watermark policy sweep — lateness_profile's fixed buckets
    turned into the tuning curve: for each candidate allowed-lateness
    τ, how many events a streaming job with that watermark would DROP
    (lag > τ) and the corpus fraction. One pass over the lag frame
    computes every leg as a conditional aggregate (no explode, no
    per-τ scans); the committed number a pipeline reads before fixing
    `withWatermark`."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(ts as timestamp_ntz))")
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = (e.select(F.col("user_id"), F.col("event_id"), us.alias("__us"))
         .withColumn(
             "__late",
             F.greatest(F.lit(0).cast("long"),
                        F.coalesce(F.max("__us").over(w), F.col("__us"))
                        - F.col("__us"))))
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum((F.col("__late") > t).cast("long")).alias(f"__d{i}")
        for i, t in enumerate(_WM_TAUS_US)
    ]
    wide = d.agg(*aggs)
    rows = [
        F.struct(F.lit(t).cast("long").alias("tau_us"),
                 F.col(f"__d{i}").alias("n_dropped"))
        for i, t in enumerate(_WM_TAUS_US)
    ]
    return (
        wide.select("__n", F.explode(F.array(*rows)).alias("__r"))
        .select(
            F.col("__r.tau_us"),
            F.col("__r.n_dropped"),
            F.col("__n").alias("n_events"),
            F.round(F.col("__r.n_dropped").cast("double")
                    / F.col("__n"), 6).alias("frac_dropped"),
        )
    )


def _lateness_sweep_sql() -> str:
    sums = ",\n       ".join(
        f"sum(CASE WHEN late > {t} THEN 1 ELSE 0 END) AS d{i}"
        for i, t in enumerate(_WM_TAUS_US))
    legs = "\nUNION ALL\n".join(
        f"SELECT {t}::BIGINT AS tau_us, CAST(d{i} AS BIGINT) AS n_dropped,"
        f" CAST(n AS BIGINT) AS n_events,"
        f" round(d{i}::DOUBLE / n, 6) AS frac_dropped FROM agg"
        for i, t in enumerate(_WM_TAUS_US))
    return f"""
WITH d AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         greatest(0, coalesce(max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us)
           AS late
  FROM events WHERE user_id IS NOT NULL
),
agg AS (SELECT count(*) AS n,
       {sums}
FROM d)
{legs}
"""


SQL_LATENESS_SWEEP = _lateness_sweep_sql()



# ---------------------------------------------------------------------
# Scorer agreement: exact Spearman rank correlation (r7 batch 3)
# ---------------------------------------------------------------------

def q_rank_corr(spark, sf_dir):
    """Do two document-quality signals RANK the corpus the same way?
    Exact Spearman rho between n_chars and the whitespace word count
    (functions/stats.py::spearman_rho) — corr_matrix answers linear
    co-movement; curation thresholds care about rank agreement, and
    rho is what says "these two scorers would gate nearly the same
    documents". Both signals are integral so the rank domains are
    bounded; a continuous scorer would be rounded first exactly as
    roc_auc rounds probabilities."""
    from twitter_to_sqlite_spark.functions import stats

    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("x"),
        F.size(text._tokens(F.col("text"))).cast("long").alias("y"))
    return stats.spearman_rho(d, "x", "y")


SQL_RANK_CORR = f"""
WITH base AS (
  SELECT n_chars AS x, len({_SQL_TOKS})::BIGINT AS y
  FROM documents WHERE n_chars IS NOT NULL AND text IS NOT NULL
),
jt AS (SELECT x, y, count(*) AS n FROM base GROUP BY 1, 2),
mx AS (SELECT x, count(*) AS m FROM base GROUP BY 1),
rx AS (SELECT x,
         2 * coalesce(sum(m) OVER (ORDER BY x
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + m + 1 AS rx2
       FROM mx),
my AS (SELECT y, count(*) AS m FROM base GROUP BY 1),
ry AS (SELECT y,
         2 * coalesce(sum(m) OVER (ORDER BY y
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         + m + 1 AS ry2
       FROM my),
j AS (SELECT jt.x, jt.y, jt.n, rx.rx2, ry.ry2
      FROM jt JOIN rx USING (x) JOIN ry USING (y)),
s AS (SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(count(DISTINCT x) AS BIGINT) AS nx,
             CAST(count(DISTINCT y) AS BIGINT) AS ny,
             sum(n::HUGEINT * rx2::HUGEINT) AS sx,
             sum(n::HUGEINT * ry2::HUGEINT) AS sy,
             sum(n::HUGEINT * (rx2::HUGEINT * ry2::HUGEINT)) AS sxy,
             sum(n::HUGEINT * (rx2::HUGEINT * rx2::HUGEINT)) AS sxx,
             sum(n::HUGEINT * (ry2::HUGEINT * ry2::HUGEINT)) AS syy
      FROM j)
SELECT n, nx, ny,
  CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) > 0
        AND (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE) > 0
  THEN round((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)
        / sqrt((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
             * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)), 6)
  END AS rho
FROM s
"""


# ---------------------------------------------------------------------
# Embedding-dimension label signal: sign-bit mutual information
# ---------------------------------------------------------------------

_MI_DIMS = 16


def q_mutual_info(spark, sf_dir):
    """Which embedding dimensions carry label signal? Per-dimension
    mutual information between the sign bit of dims 0..15 and the
    class label (functions/stats.py::mutual_info_bits) — the
    feature-ranking probe run before trusting a representation for
    classification or hard-negative mining. One posexplode scan
    collapses the corpus to a 16x2x|labels| contingency cube; every
    MI term is a ratio of exact counts."""
    from twitter_to_sqlite_spark.functions import stats

    e = _t(spark, sf_dir, "embeddings").select("embedding", "label")
    return stats.mutual_info_bits(e, "embedding", "label",
                                  n_dims=_MI_DIMS)


SQL_MUTUAL_INFO = f"""
WITH dims AS (SELECT unnest(generate_series(1, {_MI_DIMS}))::INT AS i),
e AS (
  SELECT i - 1 AS dim,
         CASE WHEN embedding[i] >= 0 THEN 1 ELSE 0 END AS b,
         label AS y
  FROM embeddings, dims
  WHERE embedding IS NOT NULL AND label IS NOT NULL
),
cube_ AS (SELECT dim, b, y, count(*) AS nbl FROM e GROUP BY 1, 2, 3),
nb AS (SELECT dim, b, sum(nbl) AS nb FROM cube_ GROUP BY 1, 2),
nl AS (SELECT dim, y, sum(nbl) AS nl FROM cube_ GROUP BY 1, 2),
nn AS (SELECT dim, sum(nbl) AS nn FROM cube_ GROUP BY 1),
j AS (SELECT c.dim, c.b, c.y, c.nbl, nb.nb, nl.nl, nn.nn
      FROM cube_ c JOIN nb USING (dim, b) JOIN nl USING (dim, y)
      JOIN nn USING (dim)),
t AS (SELECT dim, CAST(any_value(nn) AS BIGINT) AS n,
             list((nbl::DOUBLE / nn::DOUBLE)
                  * ln((nbl::DOUBLE * nn::DOUBLE)
                       / (nb::DOUBLE * nl::DOUBLE))
                  ORDER BY b, y) AS ts
      FROM j GROUP BY dim)
SELECT dim, n,
       round(list_reduce(list_prepend(0.0, ts), (a, x) -> a + x), 6)
         AS mi
FROM t
"""



# ---------------------------------------------------------------------
# Label-noise screen: nearest-centroid confident learning
# ---------------------------------------------------------------------

_NOISE_MARGIN = 0.02
# Shared with SQL_LABEL_NOISE's dims CTE (the _MI_DIMS/_COV_DIMS
# convention): both engines score over exactly this many dimensions,
# so a dim change in the embeddings table cannot silently desync the
# twin — edit the constant and both sides move together.
_NOISE_DIMS = 64


def q_label_noise(spark, sf_dir):
    """Which class labels look wrong? Confident-learning screen
    (functions/similarity.py::centroid_label_noise): flag a vector
    whose cosine to ANOTHER class centroid beats its own class
    centroid by >= {margin} at the ANN-family round-4 grain; report
    per-label totals and noise rate. Centroids are a bounded
    posexplode mean agg; scoring is one joinless projection over the
    corpus with the centroid literals inlined."""
    from twitter_to_sqlite_spark.functions import similarity

    e = _t(spark, sf_dir, "embeddings")
    e = e.withColumn("embedding", F.slice("embedding", 1, _NOISE_DIMS))
    return similarity.centroid_label_noise(e, margin=_NOISE_MARGIN)


SQL_LABEL_NOISE = f"""
WITH v AS (
  SELECT vec_id, label, embedding[1:{_NOISE_DIMS}]::DOUBLE[] AS v
  FROM embeddings
  WHERE embedding IS NOT NULL AND label IS NOT NULL
),
dims AS (SELECT unnest(generate_series(1, {_NOISE_DIMS}))::INT AS i),
cd AS (
  SELECT label AS cl, i, round(avg(v[i]), 4) AS m
  FROM v, dims GROUP BY 1, 2
),
cents AS (SELECT cl, list(m ORDER BY i) AS c FROM cd GROUP BY 1),
scored AS (
  SELECT v.vec_id, v.label, c.cl,
         round(list_dot_product(v.v, c.c)
               / (sqrt(list_dot_product(v.v, v.v))
                  * sqrt(list_dot_product(c.c, c.c))), 4) AS s
  FROM v CROSS JOIN cents c
),
per AS (
  SELECT vec_id, label,
         max(CASE WHEN cl = label THEN s END) AS own,
         max(CASE WHEN cl <> label THEN s END) AS best_other
  FROM scored GROUP BY 1, 2
)
SELECT label, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN best_other - own >= {_NOISE_MARGIN}
                THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
       round(sum(CASE WHEN best_other - own >= {_NOISE_MARGIN}
                 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
         AS noise_rate
FROM per GROUP BY label
"""



# ---------------------------------------------------------------------
# Semantic benchmark decontamination (embedding-cosine twin)
# ---------------------------------------------------------------------

_SEMDECON_TAU = 0.99


def q_decontaminate_semantic(spark, sf_dir):
    """Paraphrase-level benchmark leakage: training vectors whose
    cosine to any eval vector (vec_id < 20) reaches {tau} — the
    embedding twin of the 5-gram `decontaminate` check (functions/
    similarity.py::semantic_contamination). Planted leaks are the
    eval vectors scaled by 1.01 (cosine exactly 1), the
    embed_near_dup device; the eval side broadcasts, the corpus is
    one fused scan."""
    from twitter_to_sqlite_spark.functions import similarity

    e = _t(spark, sf_dir, "embeddings")
    ev = e.filter(F.col("vec_id") < 20)
    train = e.filter(F.col("vec_id") >= 20).unionByName(
        ev.select((F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
                  F.transform("embedding", lambda x: x * 1.01)
                  .alias("embedding"),
                  "label"))
    return similarity.semantic_contamination(
        train.select("vec_id", "embedding"), ev.select("vec_id", "embedding"),
        threshold=_SEMDECON_TAU)


SQL_DECONTAMINATE_SEMANTIC = f"""
WITH ev AS (
  SELECT vec_id AS eval_id, embedding::DOUBLE[] AS b
  FROM embeddings WHERE vec_id < 20 AND embedding IS NOT NULL
),
train AS (
  SELECT vec_id, embedding::DOUBLE[] AS a
  FROM embeddings WHERE vec_id >= 20 AND embedding IS NOT NULL
  UNION ALL
  SELECT vec_id + {_PLANT_OFFSET} AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 1.01) AS a
  FROM embeddings WHERE vec_id < 20 AND embedding IS NOT NULL
),
scored AS (
  SELECT t.vec_id, ev.eval_id,
         round(list_dot_product(t.a, ev.b)
               / (sqrt(list_dot_product(t.a, t.a))
                  * sqrt(list_dot_product(ev.b, ev.b))), 4) AS cosine
  FROM train t CROSS JOIN ev
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY vec_id
             ORDER BY cosine DESC, eval_id ASC) AS rk
  FROM scored
)
SELECT vec_id, eval_id AS matched_eval_id, cosine
FROM r WHERE rk = 1 AND cosine >= {_SEMDECON_TAU}
"""



# ---------------------------------------------------------------------
# Length-bucket packing efficiency (padding-waste tuning curve)
# ---------------------------------------------------------------------

_PAD_SCHEMES = {
    "coarse": [32, 64, 128],
    "fine": [16, 32, 48, 64, 80, 96, 112, 128],
    "trunc64": [32, 64],
}


def q_padding_waste(spark, sf_dir):
    """Which length-bucket scheme wastes the least batch capacity?
    Per-scheme padding/truncation cost over the document word-count
    histogram (functions/sampling.py::padding_waste) — sequences pad
    up to the smallest fitting boundary, overflow truncates to the
    last one. The corpus collapses to its length histogram once;
    every candidate scheme prices itself on that bounded frame."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select(
        F.size(text._tokens(F.col("text"))).cast("long").alias("n_words"))
    return sampling.padding_waste(d, "n_words", _PAD_SCHEMES)


def _padding_waste_sql() -> str:
    vals = ", ".join(
        f"('{name}', {sorted(bounds)})"
        for name, bounds in sorted(_PAD_SCHEMES.items()))
    return f"""
WITH hist AS (
  SELECT len({_SQL_TOKS})::BIGINT AS l, count(*) AS n
  FROM documents WHERE text IS NOT NULL GROUP BY 1
),
schemes AS (SELECT * FROM (VALUES {vals}) AS s(scheme, bounds)),
j AS (
  SELECT scheme, l, n,
         bounds[-1]::BIGINT AS cap,
         list_min(list_filter(bounds, b -> b >= l))::BIGINT AS fit
  FROM hist CROSS JOIN schemes
),
per AS (
  SELECT scheme, n,
         n * l AS tok,
         n * (coalesce(fit, cap) - least(l, cap)) AS pad,
         n * (l - least(l, cap)) AS trunc,
         n * least(l, cap) AS kept
  FROM j
)
SELECT scheme,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       CAST(sum(pad) AS BIGINT) AS padded_tokens,
       CAST(sum(trunc) AS BIGINT) AS truncated_tokens,
       round(sum(pad)::DOUBLE / (sum(pad) + sum(kept))::DOUBLE, 6)
         AS waste_frac
FROM per GROUP BY scheme
"""


SQL_PADDING_WASTE = _padding_waste_sql()



# ---------------------------------------------------------------------
# Token-budget epoch schedule (sqrt-temperature mixture, epoch cap)
# ---------------------------------------------------------------------

_EPOCH_BUDGET = 1_000_000
_EPOCH_CAP = 4.0


def q_epoch_schedule(spark, sf_dir):
    """The dataloader schedule a 10⁶-token budget implies under the
    sqrt-temperature mixture (functions/sampling.py::epoch_schedule):
    per-source epochs = budget·√tokens_s / (Σ√tokens·tokens_s),
    flagged past the ~4-epoch repetition ceiling (Muennighoff et al.
    2023). Weight shares are BIGINT-exact ppm."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.size(text._tokens(F.col("text"))).cast("long").alias("n_words"))
    return sampling.epoch_schedule(
        d, "source", "n_words", budget_tokens=_EPOCH_BUDGET,
        max_epochs=_EPOCH_CAP)


SQL_EPOCH_SCHEDULE = f"""
WITH per AS (
  SELECT source, CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS tokens
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
),
w AS (SELECT source, tokens,
             CAST(floor(sqrt(tokens::DOUBLE)) AS BIGINT) AS w
      FROM per),
tot AS (SELECT sum(w) AS tw FROM w),
e AS (
  SELECT source, tokens,
         CAST((1000000 * w) // tw AS BIGINT) AS weight_ppm,
         round(({_EPOCH_BUDGET}.0 * w::DOUBLE)
               / (tw::DOUBLE * tokens::DOUBLE), 6) AS epochs
  FROM w, tot
)
SELECT source, tokens, weight_ppm, epochs,
       epochs > {_EPOCH_CAP} AS over_cap
FROM e
"""



# ---------------------------------------------------------------------
# Code-likeness screen (route program text away from prose gates)
# ---------------------------------------------------------------------

_CODE_OFFSET = 3_000_000
_CODE_SNIPPET = (" def compute(x): return [i for i in range(x)];"
                 " import sys; class Foo: x = {1: 2}; print(x[0] >= 1)")


def _docs_with_planted_code(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = d.filter(F.col("doc_id") < 12).select(
        (F.col("doc_id") + _CODE_OFFSET).alias("doc_id"),
        "source",
        F.concat(F.col("text"), F.lit(_CODE_SNIPPET)).alias("text"))
    return d.unionByName(planted)


def q_code_detect(spark, sf_dir):
    """Per-source code-document rate (functions/text.py::code_detect):
    symbol-density + keyword-hit screen that routes program text away
    from the prose quality gates (Gopher stopword/word-length filters
    misfire on code). Planted code-suffixed docs guarantee positives;
    both signals fuse into the corpus's first scan — no UDF, no extra
    pass."""
    d = _docs_with_planted_code(spark, sf_dir)
    flagged = text.code_detect(d)
    return (flagged.groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col("is_code").cast("long")).alias("n_code"))
            .select("source", "n_docs", "n_code",
                    F.round(F.col("n_code").cast("double")
                            / F.col("n_docs").cast("double"), 6)
                    .alias("code_rate")))


_SQL_CODE_KW = "[" + ", ".join(f"'{k}'" for k in text.CODE_KEYWORDS) + "]"

SQL_CODE_DETECT = f"""
WITH base AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + {_CODE_OFFSET} AS doc_id, source,
         text || ' {_CODE_SNIPPET.strip()}' AS text
  FROM documents WHERE doc_id < 12
),
f AS (
  SELECT source,
         round((length(text) - length(regexp_replace(
                  text, '[{{}}()\\[\\];=<>#]', '', 'g')))::DOUBLE
               / greatest(length(text), 1)::DOUBLE, 4) AS sym_ratio,
         len(list_filter({_SQL_TOKS},
                         t -> list_contains({_SQL_CODE_KW}, t)))
           AS kw_hits
  FROM base
)
SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN sym_ratio >= 0.02 AND kw_hits >= 2
                THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
       round(sum(CASE WHEN sym_ratio >= 0.02 AND kw_hits >= 2
                 THEN 1 ELSE 0 END)::DOUBLE / count(*)::DOUBLE, 6)
         AS code_rate
FROM f GROUP BY source
"""



# ---------------------------------------------------------------------
# Grouped k-fold assignment audit
# ---------------------------------------------------------------------

_KFOLD_K = 5


def q_kfold_split(spark, sf_dir):
    """Grouped 5-fold cross-validation audit over events (functions/
    sampling.py::group_kfold): every user's events land in exactly
    one fold (fold = portable hash of user_id mod 5 — leakage-free by
    construction), and the report shows per-fold group/row counts.
    One map-side-combined agg; no window, no randomness."""
    from twitter_to_sqlite_spark.functions import sampling

    e = _t(spark, sf_dir, "events").select("user_id")
    return sampling.group_kfold(e, "user_id", k=_KFOLD_K)


SQL_KFOLD_SPLIT = f"""
SELECT ('0x' || substring(md5(user_id::VARCHAR || 'kf'), 1, 15))::BIGINT
         % {_KFOLD_K} AS fold,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_groups,
       CAST(count(*) AS BIGINT) AS n_rows
FROM events WHERE user_id IS NOT NULL
GROUP BY 1
"""



# ---------------------------------------------------------------------
# Gate ablation: leave-one-out attribution for the Gopher stack
# ---------------------------------------------------------------------

def q_gate_ablation(spark, sf_dir):
    """Which Gopher rule is doing the cutting? Leave-one-out ablation
    (functions/text.py::gate_ablation): per gate, how many documents
    fail it at all and how many it ALONE condemns (what relaxing that
    rule would re-admit) — a five-way pipeline re-run's worth of
    answers from ONE conditional aggregate over one scan."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.gate_ablation(d)


def _gate_ablation_sql() -> str:
    flags = {
        "pass_words": f"(n_words >= {text.GOPHER_MIN_WORDS}"
                      f" AND n_words <= {text.GOPHER_MAX_WORDS})",
        "pass_word_len": f"(mean_wl >= {text.GOPHER_MIN_MEAN_WL}"
                         f" AND mean_wl <= {text.GOPHER_MAX_MEAN_WL})",
        "pass_alpha": f"(alpha_frac >= {text.GOPHER_MIN_ALPHA_FRAC})",
        "pass_stopwords": f"(n_stop_hits >= {text.GOPHER_MIN_STOP_HITS})",
        "pass_symbols": f"(symbol_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO})",
    }
    keep = " AND ".join(flags.values())
    per_gate = []
    for g in text.GOPHER_GATES:
        others = " AND ".join(v for o, v in flags.items() if o != g)
        per_gate.append(
            f"sum(CASE WHEN NOT {flags[g]} THEN 1 ELSE 0 END)"
            f" AS fail_{g},\n"
            f"       sum(CASE WHEN ({others}) AND NOT {flags[g]}"
            f" THEN 1 ELSE 0 END) AS sole_{g}")
    unions = "\nUNION ALL\n".join(
        f"SELECT '{g}' AS gate, CAST(fail_{g} AS BIGINT) AS n_fail,"
        f" CAST(sole_{g} AS BIGINT) AS n_sole_blocker,"
        f" CAST(keep_n AS BIGINT) AS n_keep,"
        f" CAST(n AS BIGINT) AS n_docs FROM a"
        for g in text.GOPHER_GATES)
    gopher_m = GOPHER_M_CTE
    gate_aggs = ",\n       ".join(per_gate)
    return f"""
{gopher_m},
a AS (
  SELECT count(*) AS n,
       sum(CASE WHEN {keep} THEN 1 ELSE 0 END) AS keep_n,
       {gate_aggs}
  FROM m
)
{unions}
"""


# GOPHER_M_CTE is defined next to SQL_GOPHER_FILTER (single source;
# _gate_ablation_sql interpolates it at call time below).
SQL_GATE_ABLATION = _gate_ablation_sql()


# ---------------------------------------------------------------------
# Language-ID router eval (declared lang vs heuristic guess)
# ---------------------------------------------------------------------

def q_langid_eval(spark, sf_dir):
    """Router QA for the language-ID heuristic: confusion matrix of
    the DECLARED lang column vs lang_guess with per-declared-lang
    rates — the check run before trusting a router to split a corpus
    by language (functions/text.py::language_id is the scorer under
    test). Bounded |langs|×|guesses| output; totals join on the tiny
    aggregated frame."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    g = text.language_id(d)
    conf = (g.groupBy("lang", "lang_guess")
            .agg(F.count(F.lit(1)).alias("n")).localCheckpoint())
    tot = (conf.groupBy("lang").agg(F.sum("n").alias("__t")))
    return (conf.join(F.broadcast(tot), "lang")
            .select("lang", "lang_guess", "n",
                    F.round(F.col("n").cast("double")
                            / F.col("__t").cast("double"), 6)
                    .alias("rate")))


SQL_LANGID_EVAL = """
WITH g AS (
  SELECT lang,
         CASE WHEN len(list_filter({toks}, x ->
                  list_contains({stoplist}, x)))::DOUBLE
                  / greatest(len({toks})::DOUBLE, 1.0) >= 0.08
              THEN 'en' ELSE 'other' END AS lang_guess
  FROM documents
),
conf AS (SELECT lang, lang_guess, count(*) AS n FROM g GROUP BY 1, 2),
tot AS (SELECT lang, sum(n) AS t FROM conf GROUP BY 1)
SELECT lang, lang_guess, CAST(n AS BIGINT) AS n,
       round(n::DOUBLE / t::DOUBLE, 6) AS rate
FROM conf JOIN tot USING (lang)
""".format(toks=_SQL_TOKS, stoplist=_SQL_STOPLIST)


# ---------------------------------------------------------------------
# Per-document unigram entropy
# ---------------------------------------------------------------------

def q_token_entropy(spark, sf_dir):
    """Per-document unigram entropy in nats (functions/text.py::
    token_entropy) — the gibberish/boilerplate tail signal the ratio
    gates miss: templated chrome sits low, keyboard mash sits at the
    uniform ceiling ln(n_distinct), prose clusters between. One
    explode + two keyed aggs; the per-doc fold runs in token-sorted
    order so both engines add the same floats."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.token_entropy(d)


SQL_TOKEN_ENTROPY = """
WITH t AS (SELECT doc_id, unnest({toks}) AS tok FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM t GROUP BY 1, 2),
per AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
         CAST(count(*) AS BIGINT) AS n_distinct,
         list(c ORDER BY tok) AS cs
  FROM tc GROUP BY 1
)
SELECT doc_id, n_words, n_distinct,
       round(list_reduce(list_prepend(0.0,
               list_transform(cs, c ->
                 (c::DOUBLE / n_words::DOUBLE)
                 * ln(n_words::DOUBLE / c::DOUBLE))),
             (a, x) -> a + x), 6) AS entropy
FROM per
""".format(toks=_SQL_TOKS)


# ---------------------------------------------------------------------
# Bloom-filter FPR audit (measured vs theoretical)
# ---------------------------------------------------------------------

_BLOOM_FPR_WORDS = 256
_BLOOM_FPR_K = 5


def q_bloom_fpr(spark, sf_dir):
    """Measured vs theoretical Bloom false-positive rate on the real
    orders key population (functions/bloom.py::bloom_fpr_audit):
    1-URGENT keys build the filter, every other order key probes it,
    and the report prices the md5 double-hashing scheme against
    (1-e^(-kn/m))^k — the sizing audit before trusting
    bloom_prune_join's selectivity at 100 TB."""
    from twitter_to_sqlite_spark.functions import bloom

    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    dim = o.filter(F.col("o_orderpriority") == "1-URGENT")
    probes = o.filter(F.col("o_orderpriority") != "1-URGENT")
    return bloom.bloom_fpr_audit(
        dim, probes, "o_orderkey",
        m_words=_BLOOM_FPR_WORDS, k=_BLOOM_FPR_K)


def _bloom_fpr_sql() -> str:
    m_bits = 64 * _BLOOM_FPR_WORDS
    k = _BLOOM_FPR_K
    pos = ("((h & 1073741823) + i * ((h >> 30) & 1073741823))"
           f" % {m_bits}")
    return f"""
WITH dk AS (
  SELECT DISTINCT o_orderkey AS key FROM orders
  WHERE o_orderpriority = '1-URGENT' AND o_orderkey IS NOT NULL
),
pk AS (
  SELECT DISTINCT o_orderkey AS key FROM orders
  WHERE o_orderpriority <> '1-URGENT' AND o_orderkey IS NOT NULL
    AND o_orderkey NOT IN (SELECT key FROM dk)
),
dh AS (SELECT ('0x' || substring(md5(key::VARCHAR), 1, 15))::BIGINT
         AS h FROM dk),
ph AS (SELECT key, ('0x' || substring(md5(key::VARCHAR), 1, 15))::BIGINT
         AS h FROM pk),
is_ AS (SELECT unnest(generate_series(0, {k - 1}))::BIGINT AS i),
dpos AS (SELECT DISTINCT {pos} AS pos FROM dh, is_),
pp AS (SELECT key, i, {pos} AS pos FROM ph, is_),
hits AS (SELECT key, count(*) AS nh
         FROM pp JOIN dpos USING (pos) GROUP BY key),
a AS (
  SELECT (SELECT count(*) FROM dk) AS n_keys,
         (SELECT count(*) FROM pk) AS n_probes,
         (SELECT count(*) FROM hits WHERE nh = {k}) AS n_false_pos
)
SELECT CAST({m_bits} AS BIGINT) AS m_bits,
       CAST({k} AS BIGINT) AS k_hashes,
       CAST(n_keys AS BIGINT) AS n_keys,
       CAST(n_probes AS BIGINT) AS n_probes,
       CAST(n_false_pos AS BIGINT) AS n_false_pos,
       CASE WHEN n_probes > 0 THEN
         round(n_false_pos::DOUBLE / n_probes::DOUBLE, 6) END AS fpr,
       round(power(1.0 - exp((-({k}.0 * n_keys::DOUBLE))
                             / {m_bits}.0), {k}.0), 6) AS fpr_theory
FROM a
"""


SQL_BLOOM_FPR = _bloom_fpr_sql()



# ---------------------------------------------------------------------
# Robust per-group outlier audit (median / MAD)
# ---------------------------------------------------------------------

_MAD_K = 3.0


def q_mad_outliers(spark, sf_dir):
    """Median/MAD robust outlier screen per event type (functions/
    stats.py::mad_outliers) — the anomaly gate a single wild value
    cannot drag the way it drags anomaly_zscore's mean/σ. Exact
    rank-⌈n/2⌉ medians from the count-collapsed value distribution
    (the roc_auc device, applied twice); deviations re-aggregate the
    same bounded count table."""
    from twitter_to_sqlite_spark.functions import stats

    e = _t(spark, sf_dir, "events").select("event_type", "value")
    return stats.mad_outliers(e, "event_type", "value", k=_MAD_K)


SQL_MAD_OUTLIERS = f"""
WITH c AS (
  SELECT event_type AS g, round(value::DOUBLE, 2) AS v, count(*) AS n
  FROM events WHERE event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2
),
m1 AS (
  SELECT g, v, n,
         sum(n) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(n) OVER (PARTITION BY g) AS tot
  FROM c
),
med AS (SELECT g, min(v) AS med FROM m1
        WHERE cum >= (tot + 1) // 2 GROUP BY g),
d AS (SELECT c.g, abs(c.v - med.med) AS v, sum(c.n) AS n
      FROM c JOIN med USING (g) GROUP BY 1, 2),
m2 AS (
  SELECT g, v, n,
         sum(n) OVER (PARTITION BY g ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(n) OVER (PARTITION BY g) AS tot
  FROM d
),
mad AS (SELECT g, min(v) AS mad FROM m2
        WHERE cum >= (tot + 1) // 2 GROUP BY g)
SELECT c.g AS event_type, CAST(sum(c.n) AS BIGINT) AS n,
       any_value(med.med) AS median, any_value(mad.mad) AS mad,
       CAST(sum(CASE WHEN abs(c.v - med.med) > {_MAD_K} * mad.mad
                THEN c.n ELSE 0 END) AS BIGINT) AS n_outliers
FROM c JOIN med USING (g) JOIN mad USING (g)
GROUP BY 1
"""


# ---------------------------------------------------------------------
# Versioned-table change attribution (per-column churn)
# ---------------------------------------------------------------------

def q_diff_profile(spark, sf_dir):
    """Which columns churned between versions? Per-column change
    attribution over the same committed v1→v2 pair version_diff
    certifies (operators/sinks.py::diff_column_profile): one
    conditional aggregate over the CHANGE-volume-bounded diff frame,
    exploded into |cols|+2 report rows ('_added'/'_removed' for
    membership churn). The review a pipeline runs before deciding
    which downstream incrementals must re-run."""
    import shutil
    import tempfile

    from twitter_to_sqlite_spark.operators import sinks

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    v1 = o.filter(F.col("o_orderkey") % 5 != 4)
    v2 = o.filter(F.col("o_orderkey") % 7 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 3 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus")).alias("o_orderstatus"),
        "o_totalprice",
    )
    root = tempfile.mkdtemp(prefix="diffprof-")
    try:
        path = root + "/tbl"
        sinks.write_version(v1, path)
        sinks.write_version(v2, path)
        prof = sinks.diff_column_profile(
            spark, path, 1, 2,
            ["o_orderkey"], ["o_orderstatus", "o_totalprice"])
        return prof.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


SQL_DIFF_PROFILE = """
WITH v1 AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 4
),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN 'X' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders WHERE o_orderkey % 7 <> 0
),
j AS (
  SELECT a.o_orderstatus AS old_s, b.o_orderstatus AS new_s,
         a.o_totalprice AS old_p, b.o_totalprice AS new_p,
         a.o_orderkey IS NOT NULL AS in_old,
         b.o_orderkey IS NOT NULL AS in_new
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey
),
agg AS (
  SELECT
    sum(CASE WHEN NOT in_old THEN 1 ELSE 0 END) AS added,
    sum(CASE WHEN NOT in_new THEN 1 ELSE 0 END) AS removed,
    sum(CASE WHEN in_old AND in_new
             AND old_s IS DISTINCT FROM new_s THEN 1 ELSE 0 END) AS c_s,
    sum(CASE WHEN in_old AND in_new
             AND old_p IS DISTINCT FROM new_p THEN 1 ELSE 0 END) AS c_p
  FROM j
)
SELECT 'o_orderstatus' AS column, CAST(c_s AS BIGINT) AS n FROM agg
UNION ALL
SELECT 'o_totalprice' AS column, CAST(c_p AS BIGINT) AS n FROM agg
UNION ALL
SELECT '_added' AS column, CAST(added AS BIGINT) AS n FROM agg
UNION ALL
SELECT '_removed' AS column, CAST(removed AS BIGINT) AS n FROM agg
"""



# ---------------------------------------------------------------------
# Cross-dimension embedding covariance (PCA/whitening input)
# ---------------------------------------------------------------------

_COV_DIMS = 16


def q_embed_covariance(spark, sf_dir):
    """Exact upper-triangle covariance of embedding dims 0..15
    (functions/stats.py::embed_covariance) — the PCA/whitening input
    that exposes the cross-dim structure embedding_stats' per-dim
    profile can't see. DECIMAL-quantized moment sums (the corr_pairs
    device) so both engines publish identical covariances; one
    inline transform+explode per row, no self-join."""
    from twitter_to_sqlite_spark.functions import stats

    e = _t(spark, sf_dir, "embeddings").select("embedding")
    return stats.embed_covariance(e, "embedding", n_dims=_COV_DIMS)


SQL_EMBED_COVARIANCE = f"""
WITH dims AS (SELECT unnest(generate_series(1, {_COV_DIMS}))::INT AS i),
q AS (
  SELECT list_transform(embedding[1:{_COV_DIMS}],
                        x -> (x::DOUBLE)::DECIMAL(18,4)) AS q
  FROM embeddings
  WHERE embedding IS NOT NULL AND len(embedding) >= {_COV_DIMS}
),
pairs AS (
  SELECT d1.i AS i1, d2.i AS j1, q[d1.i] * q[d2.i] AS xy
  FROM q, dims d1, dims d2 WHERE d2.i >= d1.i
),
ps AS (SELECT i1 - 1 AS i, j1 - 1 AS j, count(*) AS n, sum(xy) AS sxy
       FROM pairs GROUP BY 1, 2),
marg AS (SELECT d.i - 1 AS d, sum(q[d.i]) AS s FROM q, dims d GROUP BY 1)
SELECT i, j, CAST(n AS BIGINT) AS n,
       round(sxy::DOUBLE / n::DOUBLE
             - (mi.s::DOUBLE / n::DOUBLE) * (mj.s::DOUBLE / n::DOUBLE),
             6) + 0.0 AS cov
FROM ps JOIN marg mi ON ps.i = mi.d JOIN marg mj ON ps.j = mj.d
"""



# ---------------------------------------------------------------------
# Vocabulary-size sweep (tokenizer sizing curve)
# ---------------------------------------------------------------------

_VOCAB_GRID = [50, 200, 1000, 5000]


def q_vocab_sweep(spark, sf_dir):
    """Token-occurrence coverage per candidate vocab size
    (functions/text.py::vocab_coverage_sweep) — vocab_coverage's
    fixed N turned into the sizing curve. No per-word ranking: words
    tied at a frequency are interchangeable at the cut, so the curve
    is exact on the count-of-counts frame and the only window runs
    over |distinct frequencies| (~√N under Zipf)."""
    d = _t(spark, sf_dir, "documents").select("text")
    return text.vocab_coverage_sweep(d, "text", _VOCAB_GRID)


def _vocab_sweep_sql() -> str:
    grid = ", ".join(str(v) for v in sorted(_VOCAB_GRID))
    cov = ("CASE WHEN vocab_size >= nd THEN nt"
           " ELSE ct + (vocab_size - cw) * c END")
    return f"""
WITH uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents)
  GROUP BY 1
),
cc AS (SELECT c, count(*) AS nw FROM uni GROUP BY 1),
cum AS (
  SELECT c, nw,
         coalesce(sum(nw) OVER (ORDER BY c DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cw,
         coalesce(sum(nw * c) OVER (ORDER BY c DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS ct
  FROM cc
),
tot AS (SELECT sum(nw) AS nd, sum(nw * c) AS nt FROM cc),
grid AS (SELECT unnest([{grid}])::BIGINT AS vocab_size),
b AS (
  SELECT g.vocab_size, c.c, c.nw, c.cw, c.ct
  FROM grid g LEFT JOIN cum c
    ON c.cw < g.vocab_size AND c.cw + c.nw >= g.vocab_size
)
SELECT vocab_size,
       CAST({cov} AS BIGINT) AS covered,
       CAST(nt AS BIGINT) AS n_total,
       CAST(nd AS BIGINT) AS n_distinct,
       round(({cov})::DOUBLE / nt::DOUBLE, 6) AS coverage,
       round(1.0 - ({cov})::DOUBLE / nt::DOUBLE, 6) AS oov_rate
FROM b, tot
"""


SQL_VOCAB_SWEEP = _vocab_sweep_sql()



# ---------------------------------------------------------------------
# Corpus concentration (Gini), burstiness (Fano), table checksum
# ---------------------------------------------------------------------

def q_gini_sources(spark, sf_dir):
    """How unequally is the corpus concentrated across sources? Gini
    coefficient of per-source token mass (functions/sampling.py::
    gini_concentration) — the diagnosis domain_caps and
    temperature_mixture treat. Exact integer rank·weight sums over
    the bounded |sources| frame; one double expression."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select(
        "source",
        F.size(text._tokens(F.col("text"))).cast("long").alias("n_words"))
    return sampling.gini_concentration(d, "source", "n_words")


SQL_GINI_SOURCES = f"""
WITH per AS (
  SELECT source AS s, CAST(sum(len({_SQL_TOKS})) AS BIGINT) AS x
  FROM documents WHERE source IS NOT NULL AND text IS NOT NULL
  GROUP BY 1
),
r AS (SELECT s, x, row_number() OVER (ORDER BY x ASC, s ASC) AS i
      FROM per),
a AS (SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(x) AS BIGINT) AS total_weight,
             sum(i::HUGEINT * x::HUGEINT) AS ix
      FROM r)
SELECT n_strata, total_weight,
       CASE WHEN n_strata > 0 AND total_weight > 0 THEN
         round((2.0 * ix::DOUBLE)
               / (n_strata::DOUBLE * total_weight::DOUBLE)
               - (n_strata::DOUBLE + 1.0) / n_strata::DOUBLE, 6) + 0.0
       END AS gini
FROM a
"""


def q_fano_factor(spark, sf_dir):
    """Arrival burstiness per event type: Fano factor (variance/mean)
    of per-hour counts over each type's DENSE observed hour range
    (functions/stats.py::fano_factor) — 1 under Poisson, ≫1 bursty.
    Tells capacity planning whether forecast_eval's per-hour means
    are even the right model class."""
    from twitter_to_sqlite_spark.functions import stats

    e = _t(spark, sf_dir, "events").select("event_type", "ts")
    return stats.fano_factor(e, "event_type", "ts")


SQL_FANO_FACTOR = """
WITH c AS (
  SELECT event_type AS g, date_trunc('hour', ts) AS h, count(*) AS c
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
  GROUP BY 1, 2
),
b AS (SELECT g, min(h) AS lo, max(h) AS hi FROM c GROUP BY 1),
spine AS (
  SELECT g, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM b
),
dense AS (
  SELECT s.g, coalesce(c.c, 0) AS c
  FROM spine s LEFT JOIN c ON s.g = c.g AND s.h = c.h
),
a AS (SELECT g, count(*) AS n_hours, sum(c) AS n_events,
             sum(c * c) AS c2
      FROM dense GROUP BY 1)
SELECT g AS event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(n_events AS BIGINT) AS n_events,
       CASE WHEN n_events > 0 THEN
         round((c2::DOUBLE / n_hours::DOUBLE
                - (n_events::DOUBLE / n_hours::DOUBLE)
                  * (n_events::DOUBLE / n_hours::DOUBLE))
               / (n_events::DOUBLE / n_hours::DOUBLE), 6)
       END AS fano
FROM a
"""


_CK_MOD = 1_000_000_007


def q_table_checksum(spark, sf_dir):
    """Portable content checksum of the orders table — the
    cross-engine migration certificate: Σ hash60(key∥fields) mod p
    over every row, order-insensitive, so two engines (or a table
    before/after a rewrite/compaction/engine swap) can certify
    byte-equivalent CONTENT with one aggregate each side. The
    q_stream_batch_agreement checksum device as a first-class query;
    floats enter at an exact integer grain (price·100 rounded).

    Scale: one map-side-combined agg; the modular sum is carried in
    DECIMAL(38,0) so a trillion-row table cannot overflow before the
    final mod."""
    o = _t(spark, sf_dir, "orders")
    ing = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .cast("string"))
    h = F.conv(F.substring(F.md5(ing), 1, 15), 16, 10).cast("long")         % F.lit(_CK_MOD)
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(h.cast("decimal(38,0)")).alias("__s"))
    return agg.select(
        "n_rows",
        F.expr(f"CAST(__s % {_CK_MOD} AS BIGINT)").alias("checksum"))


SQL_TABLE_CHECKSUM = f"""
WITH h AS (
  SELECT ('0x' || substring(md5(
           o_orderkey::VARCHAR || '|' || o_orderstatus || '|'
           || CAST(round(o_totalprice * 100, 0) AS BIGINT)::VARCHAR),
         1, 15))::BIGINT % {_CK_MOD} AS hh
  FROM orders
)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(hh::HUGEINT) % {_CK_MOD} AS BIGINT) AS checksum
FROM h
"""



# ---------------------------------------------------------------------
# Quality-gate threshold sweep
# ---------------------------------------------------------------------

_QSWEEP_TAUS = [0.2, 0.3, 0.4, 0.5, 0.6, 0.7]


def q_quality_sweep(spark, sf_dir):
    """Quality-gate tuning curve: for each candidate cutoff τ, how
    much survives and how good is it — (n_kept, frac_kept,
    mean_kept_quality) per τ. The dedup_sweep discipline applied to
    the soft quality score: the corpus collapses ONCE to its rounded
    score counts (≤10⁴ rows at the round-4 grain), and every τ prices
    itself on that bounded frame with integer-exact v4 sums. The
    curve a curation review reads before fixing the gate
    quality_score/gopher ship."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q = text.quality_score(d).select("quality")
    counts = (q.filter(F.col("quality").isNotNull())
              .groupBy(F.round(F.col("quality") * 10000, 0)
                       .cast("long").alias("__v4"))
              .agg(F.count(F.lit(1)).alias("__n"))
              .localCheckpoint())
    tot = counts.agg(F.sum("__n").alias("__N"))
    taus = spark.createDataFrame(
        [(t, int(round(t * 10000))) for t in _QSWEEP_TAUS],
        "tau double, __t4 long")
    j = (taus.join(F.broadcast(counts),
                   F.col("__v4") >= F.col("__t4"), "left")
         .groupBy("tau")
         .agg(F.sum("__n").alias("__k"),
              F.sum(F.col("__v4") * F.col("__n")).alias("__qsum")))
    out = j.crossJoin(F.broadcast(tot))
    kept = F.coalesce(F.col("__k"), F.lit(0).cast("long"))
    mean_kept = F.when(
        kept > 0,
        F.round(F.col("__qsum").cast("double")
                / (kept.cast("double") * 10000.0), 6))
    return out.select(
        "tau", kept.alias("n_kept"),
        F.round(kept.cast("double") / F.col("__N").cast("double"), 6)
        .alias("frac_kept"),
        mean_kept.alias("mean_kept_quality"))


def _quality_sweep_sql() -> str:
    taus = ", ".join(f"({t}, {int(round(t * 10000))})"
                     for t in _QSWEEP_TAUS)
    return f"""
WITH qf AS ({SQL_QUALITY_SCORE.strip()}),
c AS (
  SELECT CAST(round(quality * 10000, 0) AS BIGINT) AS v4,
         count(*) AS n
  FROM qf WHERE quality IS NOT NULL GROUP BY 1
),
tot AS (SELECT sum(n) AS N FROM c),
taus AS (SELECT * FROM (VALUES {taus}) AS t(tau, t4)),
j AS (
  SELECT tau, sum(n) AS k, sum(v4 * n) AS qsum
  FROM taus LEFT JOIN c ON c.v4 >= taus.t4
  GROUP BY tau
)
SELECT CAST(tau AS DOUBLE) AS tau,
       CAST(coalesce(k, 0) AS BIGINT) AS n_kept,
       round(coalesce(k, 0)::DOUBLE / N::DOUBLE, 6) AS frac_kept,
       CASE WHEN coalesce(k, 0) > 0 THEN
         round(qsum::DOUBLE / (k::DOUBLE * 10000.0), 6) END
         AS mean_kept_quality
FROM j, tot
"""


SQL_QUALITY_SWEEP = _quality_sweep_sql()



# ---------------------------------------------------------------------
# Entity-resolution eval (precision/recall vs planted truth)
# ---------------------------------------------------------------------

def q_er_eval(spark, sf_dir):
    """Precision/recall of the blocked fuzzy matcher against PLANTED
    truth — the eval harness the ER family lacked (retrieval has
    retrieval_eval, ANN has pq_recall; this closes identity
    resolution). Universe: one synthetic name per part key (no
    organic near-dups), plus a variant for every even key — a 1-edit
    typo normally, an unreachable ≥3-edit rewrite for every 10th key
    (the planted misses that keep recall honest). Matcher: first-token
    blocking + Levenshtein ≤ 3 (entity.match_names, the exact config
    entity_match ships). One row: counts + precision/recall/F1, with
    F1 in the 2·tp/(pred+truth) form so both engines divide once."""
    from twitter_to_sqlite_spark.functions import entity

    pk = F.col("p_partkey")
    part = _t(spark, sf_dir, "part").filter(pk < 200)
    base = part.select(
        F.concat(F.lit("ent"), pk.cast("string"), F.lit(" alpha beta"))
        .alias("name"))
    variant = F.when(pk % 10 == 0, F.lit(" gamma delta"))         .otherwise(F.lit(" alpha betq"))
    typos = part.filter(pk % 2 == 0).select(
        F.concat(F.lit("ent"), pk.cast("string"), variant).alias("name"))
    u = base.unionByName(typos)
    pred = entity.match_names(
        u, "name", [F.regexp_extract("name", r"^(\S+)", 1)],
        max_distance=3).select("name1", "name2").localCheckpoint()
    truth = part.filter(pk % 2 == 0).select(
        F.concat(F.lit("ent"), pk.cast("string"), F.lit(" alpha beta"))
        .alias("name1"),
        F.concat(F.lit("ent"), pk.cast("string"), variant).alias("name2")
    ).localCheckpoint()
    tp_df = pred.join(truth, ["name1", "name2"])
    n_pred = pred.count()
    n_truth = truth.count()
    tp = tp_df.count()
    row = [(n_truth, n_pred, tp, n_pred - tp, n_truth - tp)]
    out = spark.createDataFrame(
        row, "n_truth long, n_pred long, tp long, fp long, fn long")
    prec = F.when(F.col("n_pred") > 0,
                  F.round(F.col("tp").cast("double")
                          / F.col("n_pred").cast("double"), 6))
    rec = F.when(F.col("n_truth") > 0,
                 F.round(F.col("tp").cast("double")
                         / F.col("n_truth").cast("double"), 6))
    f1 = F.when(F.col("n_pred") + F.col("n_truth") > 0,
                F.round(2.0 * F.col("tp").cast("double")
                        / (F.col("n_pred") + F.col("n_truth"))
                        .cast("double"), 6))
    return out.select("n_truth", "n_pred", "tp", "fp", "fn",
                      prec.alias("prec"), rec.alias("rec"),
                      f1.alias("f1"))


SQL_ER_EVAL = r"""
WITH pbase AS (SELECT p_partkey AS k FROM part WHERE p_partkey < 200),
u AS (
  SELECT 'ent' || k::VARCHAR || ' alpha beta' AS name FROM pbase
  UNION ALL
  SELECT 'ent' || k::VARCHAR ||
         CASE WHEN k % 10 = 0 THEN ' gamma delta'
              ELSE ' alpha betq' END AS name
  FROM pbase WHERE k % 2 = 0
),
d AS (SELECT DISTINCT name FROM u),
b AS (SELECT regexp_extract(name, '^(\S+)', 1) AS blk, name FROM d),
pr AS (
  SELECT a.name AS name1, c.name AS name2
  FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
  WHERE levenshtein(a.name, c.name) <= 3
),
tr AS (
  SELECT 'ent' || k::VARCHAR || ' alpha beta' AS name1,
         'ent' || k::VARCHAR ||
         CASE WHEN k % 10 = 0 THEN ' gamma delta'
              ELSE ' alpha betq' END AS name2
  FROM pbase WHERE k % 2 = 0
),
a AS (
  SELECT (SELECT count(*) FROM tr) AS n_truth,
         (SELECT count(*) FROM pr) AS n_pred,
         (SELECT count(*) FROM pr JOIN tr USING (name1, name2)) AS tp
)
SELECT CAST(n_truth AS BIGINT) AS n_truth,
       CAST(n_pred AS BIGINT) AS n_pred,
       CAST(tp AS BIGINT) AS tp,
       CAST(n_pred - tp AS BIGINT) AS fp,
       CAST(n_truth - tp AS BIGINT) AS fn,
       CASE WHEN n_pred > 0 THEN
         round(tp::DOUBLE / n_pred::DOUBLE, 6) END AS prec,
       CASE WHEN n_truth > 0 THEN
         round(tp::DOUBLE / n_truth::DOUBLE, 6) END AS rec,
       CASE WHEN n_pred + n_truth > 0 THEN
         round(2.0 * tp::DOUBLE / (n_pred + n_truth)::DOUBLE, 6)
       END AS f1
FROM a
"""



# ---------------------------------------------------------------------
# Per-partition checksums (reconciliation drill-down)
# ---------------------------------------------------------------------

def q_partition_checksums(spark, sf_dir):
    """table_checksum's drill-down: the same order-insensitive
    Σ hash60(row) mod p certificate PER PARTITION KEY (order
    priority) — when the whole-table certificates disagree, this is
    the query both sides run next to localize which partition
    diverged instead of re-diffing the table. Same one-agg shape,
    grouped; the modular sums stay DECIMAL(38,0)-exact per group."""
    o = _t(spark, sf_dir, "orders")
    ing = F.concat_ws(
        "|",
        F.col("o_orderkey").cast("string"),
        F.col("o_orderstatus"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long")
        .cast("string"))
    h = F.conv(F.substring(F.md5(ing), 1, 15), 16, 10).cast("long") \
        % F.lit(_CK_MOD)
    agg = (o.filter(F.col("o_orderpriority").isNotNull())
           .groupBy(F.col("o_orderpriority").alias("partition_key"))
           .agg(F.count(F.lit(1)).alias("n_rows"),
                F.sum(h.cast("decimal(38,0)")).alias("__s")))
    return agg.select(
        "partition_key", "n_rows",
        F.expr(f"CAST(__s % {_CK_MOD} AS BIGINT)").alias("checksum"))


SQL_PARTITION_CHECKSUMS = f"""
WITH h AS (
  SELECT o_orderpriority AS partition_key,
         ('0x' || substring(md5(
            o_orderkey::VARCHAR || '|' || o_orderstatus || '|'
            || CAST(round(o_totalprice * 100, 0) AS BIGINT)::VARCHAR),
          1, 15))::BIGINT % {_CK_MOD} AS hh
  FROM orders WHERE o_orderpriority IS NOT NULL
)
SELECT partition_key, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(hh::HUGEINT) % {_CK_MOD} AS BIGINT) AS checksum
FROM h GROUP BY partition_key
"""


# ---------------------------------------------------------------------
# Streaming-maintained ANN index (r10)
# ---------------------------------------------------------------------


def _lsh_index_content_checksum(df: DataFrame) -> tuple[int, str]:
    """Order-independent content checksum of a persisted LSH index:
    count + DECIMAL(38,0) sum of an md5-prefix integer over
    (neighbor_id, bucket, vec). Computed fully distributed (one
    grouped-free aggregate — constant driver footprint at any index
    size); both sides of the maintain==rebuild law are written by the
    same build code, so double-to-string formatting is identical and
    the comparison is engine-exact with no float surface."""
    h = F.expr(
        "CAST(conv(substring(md5(concat_ws('|', neighbor_id, bucket,"
        " concat_ws(',', transform(vec, v -> CAST(v AS STRING))))),"
        " 1, 15), 16, 10) AS DECIMAL(38,0))")
    r = df.select(F.count(F.lit(1)).alias("n"),
                  F.sum(h).alias("s")).collect()[0]
    return int(r["n"]), str(r["s"])


def _ann_maintained_index(spark, sf_dir) -> str:
    """Build the streaming-MAINTAINED LSH index and certify the
    maintain==rebuild law (VERDICT r9 task 2: the ann_index_append
    twin of dm_maintained — index freshness kept live on a stream).

    Base = the vec_id%3==0 third of the corpus, indexed one-shot
    (build_lsh_index). The two remaining thirds arrive as parquet
    files in an mtime-ordered spool consumed by the REAL Structured
    Streaming engine (availableNow, maxFilesPerTrigger=1); each
    micro-batch is folded into the live index by foreachBatch ->
    similarity.append_ann_index — the sidecar-assigned, rename-promoted
    maintenance path, so per-batch cost is shard-sized regardless of
    index size. The law check then rebuilds the index from the full
    corpus one-shot and compares COMPLETE index content (ids, bucket
    assignments, stored vectors) by distributed integer checksum:
    N-batch maintenance must equal the one-shot build bit-exactly, not
    merely answer the probe set identically. Divergence raises — the
    gate fails loud, never silently serves a stale index.

    Cached per (process, sf_dir): the index is build-once-probe-many
    infrastructure, billed cold to "_build:ann_maintained"; the
    recurring ann_maintained entry measures the probe path."""
    import os
    import shutil
    import tempfile

    if sf_dir in _ANN_MAINT_CACHE:
        return _ANN_MAINT_CACHE[sf_dir]

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    path = _infra_tmpdir("annmaint-") + "/idx"
    similarity.build_lsh_index(
        e.filter(F.col("vec_id") % 3 == 0), path, dims=_LSH_DIMS)

    work = tempfile.mkdtemp(prefix="annmaint-work-")
    try:
        spool = os.path.join(work, "spool")
        os.makedirs(spool)
        for b in (1, 2):
            shard_dir = os.path.join(work, f"shard{b}")
            (e.filter(F.col("vec_id") % 3 == b)
             .coalesce(1).write.mode("overwrite").parquet(shard_dir))
            part = next(f for f in os.listdir(shard_dir)
                        if f.endswith(".parquet"))
            dst = os.path.join(spool, f"b{b}.parquet")
            os.rename(os.path.join(shard_dir, part), dst)
            t = 1_000_000_000 + 100 * b   # mtime order = arrival order
            os.utime(dst, (t, t))

        stream = (spark.readStream.schema(e.schema)
                  .option("maxFilesPerTrigger", 1).parquet(spool))
        q = (stream.writeStream
             .foreachBatch(lambda batch, bid:
                           similarity.append_ann_index(batch, path))
             .option("checkpointLocation", os.path.join(work, "ck"))
             .trigger(availableNow=True).start())
        q.awaitTermination()

        rebuilt = os.path.join(work, "rebuilt")
        similarity.build_lsh_index(e, rebuilt, dims=_LSH_DIMS)
        got = _lsh_index_content_checksum(spark.read.parquet(path))
        want = _lsh_index_content_checksum(spark.read.parquet(rebuilt))
        if got != want:
            raise RuntimeError(
                "ann_maintained law violation: streamed index "
                f"(n,checksum)={got} != one-shot rebuild {want}")
    finally:
        shutil.rmtree(work, ignore_errors=True)

    _ANN_MAINT_CACHE[sf_dir] = path
    return path


def q_ann_maintained(spark, sf_dir):
    """Probe the streaming-maintained LSH index (the partition-pruned
    probe_lsh_index path) with ann_lsh's query set. The oracle is
    ann_lsh's full-corpus SQL verbatim: an index maintained across
    micro-batches must answer exactly like one built whole — and the
    build step already enforced the stronger content-checksum law
    (see _ann_maintained_index), so a green row certifies both the
    engine-run maintenance chain and the probe."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.probe_lsh_index(
        spark, _ann_maintained_index(spark, sf_dir), queries, k=3)


SQL_ANN_MAINTAINED = SQL_ANN_LSH


# =====================================================================
# Registry
# =====================================================================

def _force_build(df: DataFrame) -> None:
    # noop sink: materialize the shared build end-to-end without
    # driver-side row transfer (same device bench.py uses for queries).
    df.write.mode("overwrite").format("noop").save()


# Shared derived-data builds, exposed so bench.py can bill each one to
# a named "_build:" pseudo-entry instead of silently charging it to
# whichever consumer query runs first (VERDICT r5 'What's wrong' #1 —
# dedup_minhash published 0.013s because dedup_recall had already paid
# the pairs build). Split by lifetime:
#
#   SHARED_BUILDS — per-pass DataFrame caches dropped by
#   clear_caches(); bench re-times them every pass like queries.
#   INFRA_BUILDS — build-once-probe-many artifacts (indexes, trained
#   weights, stored baselines) dropped only by
#   clear_caches(include_infra=True); bench times them once, cold.
SHARED_BUILDS: dict[str, Callable[[SparkSession, str], None]] = {
    # bm25_index before bm25_front: the front consumes the index
    # checkpoint, so insertion order keeps each bill incremental
    # (the doc_shingles → jaccard_pairs convention).
    "_build:bm25_index":
        lambda s, d: _force_build(_doc_index(s, d)),
    "_build:bm25_front":
        lambda s, d: _force_build(_bm25_front(s, d)[0]),
    "_build:doc_shingles":
        lambda s, d: _force_build(_doc_shingles(s, d)),
    "_build:minhash_pairs":
        lambda s, d: _force_build(_minhash_pairs(s, d)),
    "_build:jaccard_pairs":
        lambda s, d: _force_build(_jaccard_pairs(s, d)),
    "_build:trade_pairs":
        lambda s, d: _force_build(_trade_pairs(s, d)),
    "_build:simhash_pairs":
        lambda s, d: _force_build(_simhash_pairs(s, d)),
    "_build:lm_scores":
        lambda s, d: _force_build(_lm_scores(s, d)),
    "_build:drift_hists":
        lambda s, d: _force_build(_drift_hists(s, d)),
    "_build:dup_positions":
        lambda s, d: _force_build(_dup_positions(s, d)),
    "_build:dup_spans":
        lambda s, d: _force_build(_dup_spans(s, d)),
    # cell_pairs before knn_graph: the graph ranks the shared pair
    # checkpoint, so insertion order keeps each bill incremental.
    "_build:cell_pairs":
        lambda s, d: _force_build(_cell_pairs(s, d)),
    "_build:knn_graph":
        lambda s, d: _force_build(_knn_graph_frame(s, d)),
}



__all__ = list(_prev.__all__) + [
    "_KNNG_K",
    "_knn_graph_build",
    "_knn_graph_frame",
    "q_knn_graph",
    "_knn_graph_ctes",
    "SQL_KNN_GRAPH",
    "q_changelog_compact",
    "SQL_CHANGELOG_COMPACT",
    "q_mmr_diversify",
    "_mmr_sql",
    "SQL_MMR_DIVERSIFY",
    "q_knn_classify",
    "SQL_KNN_CLASSIFY",
    "_TEMP_ALPHAS",
    "q_temperature_sweep",
    "SQL_TEMPERATURE_SWEEP",
    "q_dup_source_matrix",
    "SQL_DUP_SOURCE_MATRIX",
    "_BM25_GRID",
    "q_bm25_tuning",
    "_bm25_tuning_sql",
    "SQL_BM25_TUNING",
    "q_ann_index_append",
    "SQL_ANN_INDEX_APPEND",
    "_SIMHASH_RADII",
    "q_simhash_sweep",
    "SQL_SIMHASH_SWEEP",
    "q_forecast_eval",
    "SQL_FORECAST_EVAL",
    "_WM_TAUS_US",
    "q_lateness_sweep",
    "_lateness_sweep_sql",
    "SQL_LATENESS_SWEEP",
    "q_rank_corr",
    "SQL_RANK_CORR",
    "_MI_DIMS",
    "q_mutual_info",
    "SQL_MUTUAL_INFO",
    "_NOISE_MARGIN",
    "_NOISE_DIMS",
    "q_label_noise",
    "SQL_LABEL_NOISE",
    "_SEMDECON_TAU",
    "q_decontaminate_semantic",
    "SQL_DECONTAMINATE_SEMANTIC",
    "_PAD_SCHEMES",
    "q_padding_waste",
    "_padding_waste_sql",
    "SQL_PADDING_WASTE",
    "_EPOCH_BUDGET",
    "_EPOCH_CAP",
    "q_epoch_schedule",
    "SQL_EPOCH_SCHEDULE",
    "_CODE_OFFSET",
    "_CODE_SNIPPET",
    "_docs_with_planted_code",
    "q_code_detect",
    "_SQL_CODE_KW",
    "SQL_CODE_DETECT",
    "_KFOLD_K",
    "q_kfold_split",
    "SQL_KFOLD_SPLIT",
    "q_gate_ablation",
    "_gate_ablation_sql",
    "SQL_GATE_ABLATION",
    "q_langid_eval",
    "SQL_LANGID_EVAL",
    "q_token_entropy",
    "SQL_TOKEN_ENTROPY",
    "_BLOOM_FPR_WORDS",
    "_BLOOM_FPR_K",
    "q_bloom_fpr",
    "_bloom_fpr_sql",
    "SQL_BLOOM_FPR",
    "_MAD_K",
    "q_mad_outliers",
    "SQL_MAD_OUTLIERS",
    "q_diff_profile",
    "SQL_DIFF_PROFILE",
    "_COV_DIMS",
    "q_embed_covariance",
    "SQL_EMBED_COVARIANCE",
    "_VOCAB_GRID",
    "q_vocab_sweep",
    "_vocab_sweep_sql",
    "SQL_VOCAB_SWEEP",
    "q_gini_sources",
    "SQL_GINI_SOURCES",
    "q_fano_factor",
    "SQL_FANO_FACTOR",
    "_CK_MOD",
    "q_table_checksum",
    "SQL_TABLE_CHECKSUM",
    "_QSWEEP_TAUS",
    "q_quality_sweep",
    "_quality_sweep_sql",
    "SQL_QUALITY_SWEEP",
    "q_er_eval",
    "SQL_ER_EVAL",
    "q_partition_checksums",
    "SQL_PARTITION_CHECKSUMS",
    "_lsh_index_content_checksum",
    "_ann_maintained_index",
    "q_ann_maintained",
    "SQL_ANN_MAINTAINED",
    "_force_build",
    "SHARED_BUILDS",
]
