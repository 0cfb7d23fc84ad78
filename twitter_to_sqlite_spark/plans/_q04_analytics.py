"""Catalog chunk 4: r2-r4 analytics (ANN tiers, sketches, graph, stats, CDC, sampling)."""

from __future__ import annotations

from twitter_to_sqlite_spark.plans import _q03_dedup as _prev
from twitter_to_sqlite_spark.plans._q03_dedup import *  # noqa: F401,F403

# =====================================================================
# LLM-data-pipeline operators: similarity search
# =====================================================================

_SQL_COS = """round(
  list_dot_product(a, b)
  / (sqrt(list_dot_product(a, a)) * sqrt(list_dot_product(b, b))), 4)"""


def q_ann_brute_force(spark, sf_dir):
    """Brute-force cosine top-3 neighbors for query vectors vec_id<5."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.brute_force_topk(e, queries, k=3)


SQL_ANN_BRUTE_FORCE = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_COS} AS cosine
  FROM c, q WHERE neighbor_id != query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""

_LSH_DIMS = [0, 8, 16, 24]


def _sql_bucket(col: str, dims: list[int] | None = None) -> str:
    return " + ".join(
        f"(CASE WHEN {col}[{d + 1}] > 0 THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(dims or _LSH_DIMS)
    )


def q_ann_lsh(spark, sf_dir):
    """Sign-LSH bucketed approximate top-3: probe only the query's
    hyperplane-sign bucket — the 100 TB scale path."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.lsh_bucketed_topk(e, queries, k=3, dims=_LSH_DIMS)


SQL_ANN_LSH = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a,
                  {_sql_bucket("embedding")} AS bucket
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b,
             {_sql_bucket("embedding")} AS bucket
      FROM embeddings),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_COS} AS cosine
  FROM c JOIN q USING (bucket) WHERE neighbor_id != query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


# Materialized-index paths, one build per (kind, sf_dir) per process:
# an ANN index is persistent infrastructure — built once, probed per
# query — so repeated runs of the indexed queries measure the probe
# path (partition-pruned scan), not a rebuild. The first call pays the
# build; results are identical either way (probe reads the sidecar).


def _infra_tmpdir(prefix: str) -> str:
    """mkdtemp for a process-lifetime infra artifact (ANN indexes,
    MinHash store, drift baseline): reused across queries while the
    process lives, removed at interpreter exit — repeated gate/bench
    processes must not accumulate ann*/mhidx*/profile-baseline-* dirs
    in /tmp (the verdiff leak class ADVICE r6 flagged, one level up)."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _ann_index(spark, sf_dir: str, kind: str) -> str:
    import tempfile

    key = (kind, sf_dir)
    if key not in _ANN_INDEX_CACHE:
        e = _t(spark, sf_dir, "embeddings")
        path = _infra_tmpdir(f"ann{kind}-") + "/idx"
        if kind == "lsh":
            similarity.build_lsh_index(e, path, dims=_LSH_DIMS)
        else:
            similarity.build_ivf_index(e, path, _ivf_centroids(spark, sf_dir))
        _ANN_INDEX_CACHE[key] = path
    return _ANN_INDEX_CACHE[key]


def q_ann_lsh_indexed(spark, sf_dir):
    """Sign-LSH ANN through the MATERIALIZED index: corpus persisted
    partitioned by bucket, probe reads only the probed partitions
    (similarity.build_lsh_index/probe_lsh_index). Same oracle as
    ann_lsh — the index changes the physical plan, not the answer."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.probe_lsh_index(
        spark, _ann_index(spark, sf_dir, "lsh"), queries, k=3)


SQL_ANN_LSH_INDEXED = SQL_ANN_LSH


_IVF_CELLS = 8


_EMB_DIM = 64


# Two Lloyd iterations, full corpus: at the bench SF (sf0.1) iters=2
# measures equal-or-better recall than 3 (0.550/0.683 vs 0.533/0.667
# at n_probe=1/2; sf0.001: 0.600/0.750 vs 0.600/0.800) at one less
# assignment+mean pass — the extra iteration has converged past its
# payoff on this corpus. tests/test_fts_and_recall.py pins the
# multi-iter≥single-iter property independent of this constant. The
# md5-hash sample (sample_mod) is the 100 TB knob — at bench SFs the
# corpus is small enough that halving it costs recall, so the catalog
# query clusters on the full corpus; _ivf_sql generates the oracle for
# either configuration.
_IVF_ITERS = 2
_IVF_SAMPLE_MOD = None


# One Lloyd's run per (sf_dir, params) per process: centroids are
# index infrastructure (the persisted-IVF sidecar stores them), so the
# IVF ANN, SemDeDup, and the index build all quantize around the SAME
# centroid set instead of re-clustering per query — exactly how a
# production pipeline shares a trained coarse quantizer.


def _ivf_centroids(spark, sf_dir: str) -> list[list[float]]:
    key = (sf_dir, _IVF_CELLS, _IVF_ITERS, _IVF_SAMPLE_MOD)
    if key not in _CENTROID_CACHE:
        _CENTROID_CACHE[key] = similarity.kmeans_centroids(
            _t(spark, sf_dir, "embeddings"), _IVF_CELLS,
            iters=_IVF_ITERS, sample_mod=_IVF_SAMPLE_MOD)
    return _CENTROID_CACHE[key]


def q_ann_ivf(spark, sf_dir):
    """IVF approximate top-3: coarse-quantize the corpus into cells
    around k-means centroids (multi-iteration deterministic Lloyd's,
    optionally on a portable md5-hash sample — similarity.
    kmeans_centroids, VERDICT r2 #8), probe the query's best cell.
    Data-adaptive complement to the sign-LSH path; the oracle
    reproduces the identical iterations relationally."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.ivf_topk(
        e, queries, _ivf_centroids(spark, sf_dir), k=3, n_probe=1)


def _kmeans_ctes(iters: int, sample_mod: int | None,
                 k: int | None = None, dim: int | None = None,
                 vexpr: str = "embedding::DOUBLE[]",
                 prefix: str = "") -> tuple[str, str]:
    """DuckDB CTE chain reproducing similarity.kmeans_centroids exactly
    (first-k init, assign→round(mean,4) per iteration, empty cell keeps
    its centroid). Returns (joined CTE SQL, final-centroid CTE name);
    shared by the IVF ANN, SemDeDup, and PQ oracles so the k-means twin
    can never fork into divergeable copies. ``vexpr``/``k``/``dim``/
    ``prefix`` let the PQ oracle train per-subspace codebooks over
    SLICED vectors with namespaced CTEs; the defaults are the IVF
    coarse-quantizer configuration."""
    k = _IVF_CELLS if k is None else k
    dim = _EMB_DIM if dim is None else dim
    p = prefix
    samp_where = (
        f"WHERE ('0x'||substring(md5(vec_id::VARCHAR),1,15))::BIGINT"
        f" % {sample_mod} = 0" if sample_mod else ""
    )
    assign = (
        "(SELECT cell FROM {cents} ORDER BY"
        " list_dot_product({row}.v, cv) DESC, cell LIMIT 1)"
    )
    ctes = [
        f"{p}samp AS (SELECT vec_id, {vexpr} AS v"
        f" FROM embeddings {samp_where})",
        f"{p}cents0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1"
        f" AS cell, v AS cv FROM (SELECT vec_id, v FROM {p}samp"
        f" ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(1, iters + 1):
        prev = f"{p}cents{i - 1}"
        ctes += [
            f"{p}a{i} AS (SELECT s.vec_id, s.v,"
            f" {assign.format(cents=prev, row='s')} AS cell"
            f" FROM {p}samp s)",
            f"{p}dims{i} AS (SELECT cell, i, round(avg(v[i]), 4) AS m"
            f" FROM {p}a{i}, generate_series(1, {dim}) AS t(i)"
            f" GROUP BY cell, i)",
            f"{p}upd{i} AS (SELECT cell, list(m ORDER BY i) AS cv"
            f" FROM {p}dims{i} GROUP BY cell)",
            f"{p}cents{i} AS (SELECT c.cell, coalesce(u.cv, c.cv) AS cv"
            f" FROM {prev} c LEFT JOIN {p}upd{i} u USING (cell))",
        ]
    return ",\n".join(ctes), f"{p}cents{iters}"


def _ivf_sql(iters: int = _IVF_ITERS,
             sample_mod: int | None = _IVF_SAMPLE_MOD) -> str:
    """Generate the DuckDB twin of sampled multi-iteration Lloyd's:
    cents0 = first-k init over the hash sample; each iteration assigns
    the sample to the previous centroids and re-means per cell
    (empty cell keeps its centroid); the FULL corpus and the queries
    assign to the final centroids."""
    joined, final = _kmeans_ctes(iters, sample_mod)
    return f"""
WITH {joined},
c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b,
         (SELECT cell FROM {final}
          ORDER BY list_dot_product(e.embedding::DOUBLE[], cv) DESC, cell
          LIMIT 1) AS cell
  FROM embeddings e
),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS a,
         (SELECT cell FROM {final}
          ORDER BY list_dot_product(e.embedding::DOUBLE[], cv) DESC, cell
          LIMIT 1) AS cell
  FROM embeddings e WHERE vec_id < 5
),
scored AS (
  SELECT query_id, neighbor_id, {_SQL_COS} AS cosine
  FROM c JOIN q USING (cell) WHERE neighbor_id != query_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


SQL_ANN_IVF = _ivf_sql()


def q_ann_ivf_indexed(spark, sf_dir):
    """IVF ANN through the MATERIALIZED index: corpus persisted
    partitioned by coarse cell with k-means centroids in the sidecar,
    probe reads only the best cell's partition (similarity.
    build_ivf_index/probe_ivf_index). Same oracle as ann_ivf."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.probe_ivf_index(
        spark, _ann_index(spark, sf_dir, "ivf"), queries, k=3, n_probe=1)


SQL_ANN_IVF_INDEXED = SQL_ANN_IVF


def q_embed_near_dup(spark, sf_dir):
    """Embedding-cosine near-dup pairs, LSH-bucketed, with planted
    near-identical vectors (v*1.01) so positives exist."""
    e = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    planted = e.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    return similarity.embedding_near_dup_pairs(
        e.unionByName(planted), threshold=0.95, dims=_LSH_DIMS
    )


SQL_EMBED_NEAR_DUP = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {_PLANT_OFFSET} AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 1.01) AS v
  FROM embeddings WHERE vec_id < 10
),
wb AS (SELECT vec_id, v, {_sql_bucket("v")} AS bucket FROM base),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.v AS a, y.v AS b
  FROM wb x JOIN wb y ON x.bucket = y.bucket AND x.vec_id < y.vec_id
)
SELECT id_a, id_b, {_SQL_COS} AS cosine
FROM pairs WHERE {_SQL_COS} >= 0.95
"""


def _embed_base(spark, sf_dir):
    """The double-cast embedding corpus — the base side of every
    cell-blocked pair consumer (semdedup, knn_graph, knn_classify)."""
    e = _t(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )


def _cell_pairs_build(spark, sf_dir):
    """The raw (uncached) Σ cell² in-cell scored pair frame over the
    BASE embeddings + shared IVF centroids — plan tests inspect THIS
    (the cached form explains as an RDD scan). The one pair-scoring
    pass shared by semdedup and the knn_graph build (r11)."""
    centroids = _ivf_centroids(spark, sf_dir)
    return similarity.cell_scored_pairs(
        _embed_base(spark, sf_dir), centroids)


def _cell_pairs(spark, sf_dir):
    key = (spark, sf_dir)
    if key not in _CELL_PAIRS_CACHE:
        _CELL_PAIRS_CACHE[key] = _cell_pairs_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _CELL_PAIRS_CACHE[key]


def q_semdedup(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): k-means-cluster the embedding
    corpus, then near-dup pairs only within each cluster cell — the
    data-adaptive counterpart of embed_near_dup's fixed sign-LSH
    buckets (similarity.semdedup_pairs). Centroids come from the same
    deterministic Lloyd's run as ann_ivf; the planted v*1.01 copies
    guarantee positives and assign to the same cell as their original
    (scaling doesn't move the max-dot-product argmax).

    r11: the base-corpus pair set comes from the shared `_cell_pairs`
    checkpoint (the frame knn_graph ranks); only the pairs involving
    the 10 planted copies are scored fresh, via cell_scored_pairs'
    right= restriction. Every planted id exceeds every base id, so
    pairs(base ∪ planted) = pairs(base) ∪ pairs(base ∪ planted,
    right=planted) exactly — per-row cell/norm/cosine expressions are
    identical, making the decomposition row- and bit-exact (pinned by
    test_semdedup_composed_matches_direct)."""
    centroids = _ivf_centroids(spark, sf_dir)
    base = _embed_base(spark, sf_dir)
    planted = base.filter(F.col("vec_id") < 10).select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
    )
    extra = similarity.cell_scored_pairs(
        base.unionByName(planted), centroids, right=planted)
    pairs = _cell_pairs(spark, sf_dir).unionByName(extra)
    return similarity.semdedup_pairs(
        None, centroids, threshold=0.95, pairs=pairs)


def _semdedup_sql() -> str:
    ctes, final = _kmeans_ctes(_IVF_ITERS, _IVF_SAMPLE_MOD)
    return f"""
WITH {ctes},
base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + {_PLANT_OFFSET} AS vec_id,
         list_transform(embedding::DOUBLE[], x -> x * 1.01) AS v
  FROM embeddings WHERE vec_id < 10
),
wc AS (
  SELECT vec_id, v,
         (SELECT cell FROM {final}
          ORDER BY list_dot_product(b.v, cv) DESC, cell LIMIT 1) AS cell
  FROM base b
),
pairs AS (
  SELECT x.vec_id AS id_a, y.vec_id AS id_b, x.cell AS cell,
         x.v AS a, y.v AS b
  FROM wc x JOIN wc y ON x.cell = y.cell AND x.vec_id < y.vec_id
)
SELECT id_a, id_b, cell, {_SQL_COS} AS cosine
FROM pairs WHERE {_SQL_COS} >= 0.95
"""


SQL_SEMDEDUP = _semdedup_sql()


def q_ann_recall(spark, sf_dir):
    """Recall@3 of the sign-LSH bucketed ANN against exact brute
    force, per query — the index-tuning measurement loop
    (similarity.recall_at_k). Both legs are the same result shapes the
    ann_* queries produce; the eval itself never touches the corpus."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(e, q, k=3)
    approx = similarity.lsh_bucketed_topk(e, q, k=3, dims=_LSH_DIMS)
    return similarity.recall_at_k(exact, approx, k=3)


SQL_ANN_RECALL = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a,
                  {_sql_bucket("embedding")} AS bucket
           FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b,
             {_sql_bucket("embedding")} AS bucket
      FROM embeddings),
ex AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_SQL_COS} DESC, neighbor_id) AS r
    FROM c, q WHERE neighbor_id != query_id
  ) WHERE r <= 3
),
ap AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_SQL_COS} DESC, neighbor_id) AS r
    FROM c JOIN q USING (bucket) WHERE neighbor_id != query_id
  ) WHERE r <= 3
),
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
"""


def q_hybrid_search(spark, sf_dir):
    """Hybrid retrieval: BM25 lexical leg ('spark' AND 'join') fused
    with an embedding-cosine leg (query vector vec_id=0, doc_id joined
    on vec_id) by reciprocal-rank fusion (similarity.rrf_fuse) — the
    standard production two-leg search. Each leg contributes its
    top-20; output is the fused top-10.

    Scale: each leg's candidate set is an orderBy+limit
    (TakeOrderedAndProject — no global sort of the corpus); fusion
    operates on ≤40 rows regardless of corpus size."""
    # r11: the lexical leg rides the shared `_doc_index` checkpoint
    # (the whole text-search family's one index build); doc lengths
    # aggregate off the checkpoint — same exact integers as the old
    # separate no-explode corpus pass, score bit-identical.
    idx = _doc_index(spark, sf_dir)
    bm = R.fts_bm25(idx, "doc_id", ["spark", "join"], mode="all")
    bm_top = bm.orderBy(F.col("score").desc(), "doc_id").limit(20)
    wb = Window.orderBy(F.col("score").desc(), "doc_id")
    lex = bm_top.withColumn("rank", F.row_number().over(wb)).select(
        "doc_id", "rank")
    e = _t(spark, sf_dir, "embeddings")
    sem = similarity.brute_force_topk(
        e, e.filter(F.col("vec_id") == 0), k=20,
    ).select(F.col("neighbor_id").alias("doc_id"), "rank")
    return similarity.rrf_fuse([lex, sem], "doc_id", k=10)


SQL_HYBRID_SEARCH = f"""
WITH {_SQL_BM25_CTES},
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM bm QUALIFY rank <= 20
),
qv AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a
       FROM embeddings WHERE vec_id = 0),
cv AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b
       FROM embeddings),
sem AS (
  SELECT neighbor_id AS doc_id, rank FROM (
    SELECT neighbor_id,
           row_number() OVER (ORDER BY {_SQL_COS} DESC, neighbor_id) AS rank
    FROM cv, qv WHERE neighbor_id != query_id
  ) WHERE rank <= 20
),
unioned AS (
  SELECT doc_id, rank FROM lex
  UNION ALL
  SELECT doc_id, rank FROM sem
),
fused AS (
  SELECT doc_id, round(sum(1.0 / (60 + rank)), 6) AS rrf_score,
         count(*) AS n_legs
  FROM unioned GROUP BY doc_id
)
SELECT doc_id, rrf_score, n_legs,
       row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
FROM fused QUALIFY rank <= 10
"""


def q_dup_ngram_frac(spark, sf_dir):
    """Corpus-level duplicated-n-gram fraction per document
    (dedup.dup_ngram_stats over documents + planted near-copies): the
    share of each doc's distinct 3-gram shingles that occur in at
    least one other document — the boilerplate signal pretraining
    pipelines threshold on without running pairwise dedup. Planted
    near-copies score dup_frac ≈ 1. r10: consumes the shared
    _build:doc_shingles frame unioned with the planted docs' shingles
    (disjoint ids — row-identical to shingling the union)."""
    d = _docs_with_planted_dups(spark, sf_dir)
    sh = _doc_shingles(spark, sf_dir).unionByName(
        _planted_dup_shingles(spark, sf_dir))
    return dedup.dup_ngram_stats(d, "doc_id", "text", k=3, shingles_df=sh)


SQL_DUP_NGRAM_FRAC = f"""
WITH docs AS ({_SQL_DOCS_PLANTED}),
sh AS ({_SQL_SHINGLES}),
dfreq AS (
  SELECT shingle, count(*) AS docs FROM sh GROUP BY shingle
)
SELECT sh.id AS doc_id,
       count(*) AS n_shingles,
       CAST(sum((dfreq.docs > 1)::BIGINT) AS BIGINT) AS n_dup,
       round(sum((dfreq.docs > 1)::BIGINT) / count(*), 4) AS dup_frac
FROM sh JOIN dfreq USING (shingle)
GROUP BY sh.id
"""


_PR_ITERS = 6
_PR_DAMPING = 0.85
#: supplier node ids offset out of the customer id space.
_PR_SUPP_OFFSET = 10_000_000


def _trade_pairs_build(spark, sf_dir):
    """The raw (uncached) distinct customer↔supplier trade pairs —
    the edge source shared by pagerank (full) and kcore /
    lpa_communities (md5-sampled subset). Plan tests inspect THIS."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # Spread the fact side before the join+distinct front (size-aware
    # dedup.spread): a ≤maxPartitionBytes lineitem scan is one
    # partition, and with the dimension side broadcast the whole
    # join + partial-distinct stage would run on one core (measured
    # at the sf1 probe tier — the pagerank family's dominant cost).
    li = dedup.spread(
        _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey"))
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.col("o_custkey").alias("c"),
            (F.col("l_suppkey") + F.lit(_PR_SUPP_OFFSET)).alias("s"),
        )
        .distinct()
    )


def _trade_pairs(spark, sf_dir):
    key = (spark, sf_dir)
    if key not in _TRADE_PAIRS_CACHE:
        _TRADE_PAIRS_CACHE[key] = _trade_pairs_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _TRADE_PAIRS_CACHE[key]


def q_pagerank(spark, sf_dir):
    """PageRank over the symmetrized customer↔supplier trade graph
    (distinct pairs from orders ⋈ lineitem; supplier ids offset by
    10M) — the influence/centrality signal for graph-aware curation
    (functions/graph.py::pagerank, 6 iterations, d=0.85, per-iteration
    round(6) so the oracle replays the trajectory relationally, like
    quality_classifier does for logreg)."""
    pairs = _trade_pairs(spark, sf_dir)
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"),
                               F.col("c").alias("dst")))
    return graph.pagerank(
        edges, iterations=_PR_ITERS, damping=_PR_DAMPING
    ).withColumnRenamed("node", "node_id")


def _pagerank_sql() -> str:
    """Unrolled power-iteration replay: one CTE per iteration, same
    rounding, and literals taken from the SAME Python floats the Spark
    side uses (repr) so base + damped term are bit-identical."""
    base = repr(1.0 - _PR_DAMPING)
    d = repr(_PR_DAMPING)
    ctes = [f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey + {_PR_SUPP_OFFSET} AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT c AS src, s AS dst FROM pairs
  UNION ALL
  SELECT s AS src, c AS dst FROM pairs
),
outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges
),
r0 AS (SELECT node, 1.0::DOUBLE AS rank FROM nodes)"""]
    for i in range(1, _PR_ITERS + 1):
        ctes.append(f"""r{i} AS (
  SELECT n.node,
         round({base} + {d} * coalesce(c.contrib, 0.0), 6) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node, sum(r.rank / d.outdeg) AS contrib
    FROM edges e
    JOIN r{i - 1} r ON r.node = e.src
    JOIN outdeg d ON d.src = e.src
    GROUP BY e.dst
  ) c ON c.node = n.node
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS node_id, rank FROM r{_PR_ITERS}"
    )


SQL_PAGERANK = _pagerank_sql()


_KMV_K = 64
_KMV_COLS = ["user_id", "event_type", "props"]


def q_sketch_profile(spark, sf_dir):
    """KMV distinct-count sketch profile of the events stream
    (functions/sketch.py::kmv_distinct, k=64): approximate cardinality
    per column with bounded state and mergeable k-min sets — yet
    bit-reproducible across engines because the sketch is a
    deterministic function of the md5 hash space (native HLL
    implementations differ per engine and can never oracle-match).
    user_id (150+ distinct at sf≥0.01) exercises the estimator path;
    event_type/props stay under k and come out exact."""
    e = _t(spark, sf_dir, "events").select(*_KMV_COLS)
    return sketch.kmv_distinct(e, _KMV_COLS, k=_KMV_K)


def _kmv_sql(cols: list[str] | None = None, where: str = "") -> str:
    """DuckDB twin of sketch.kmv_distinct over `events`, optionally
    restricted by an extra predicate (the drift oracle profiles a
    time-sliced snapshot with the same sketch)."""
    parts = []
    extra = f" AND {where}" if where else ""
    for c in cols or _KMV_COLS:
        parts.append(f"""SELECT '{c}' AS col_name, count(*)::BIGINT AS n_kept,
       CASE WHEN count(*) < {_KMV_K} THEN count(*)::BIGINT
            ELSE CAST(round({float(_KMV_K - 1)!r} / max(u), 0) AS BIGINT)
       END AS kmv_estimate
FROM (
  SELECT ('0x' || substring(md5({c}::VARCHAR), 1, 15))::BIGINT
         / 1152921504606846976.0 AS u
  FROM (SELECT DISTINCT {c} FROM events WHERE {c} IS NOT NULL{extra})
  ORDER BY u LIMIT {_KMV_K}
)""")
    return "\nUNION ALL\n".join(parts)


SQL_SKETCH_PROFILE = _kmv_sql()


def q_data_quality(spark, sf_dir):
    """Declarative data-quality report (functions/validate.py,
    Deequ-style): pk uniqueness, referential integrity, null and range
    constraints across the warehouse tables — the validation gate a
    training pipeline runs between stages. Includes one deliberately
    failing check (user_id is not a pk of events) so the report
    exercises both outcomes. Each check is one scan-aggregate or one
    anti-join count."""
    from twitter_to_sqlite_spark.functions import validate as V

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey")
    e = _t(spark, sf_dir, "events")
    c = _t(spark, sf_dir, "customer")
    d = _t(spark, sf_dir, "documents")
    # The three aggregate checks on events fuse into ONE scan
    # (combine_table_checks): a validation gate reads each table once
    # no matter how many constraints it carries. Report rows are
    # identical to the per-check form; the driver hash-compare is
    # order-insensitive, and run_checks preserves the listed order.
    events_fused = V.combine_table_checks(e, [
        V.not_null_expr("user_id"),
        V.accepted_range_expr("value", lo=0),
        V.unique_expr(["user_id"]),  # expected FAIL: user_id is no pk
    ])
    return V.run_checks([
        V.unique(o, ["o_orderkey"]),
        V.foreign_key(li, "l_orderkey", o, "o_orderkey"),
        V.foreign_key(e, "user_id", c, "c_custkey",
                      name="fk(user_id->c_custkey)"),
        events_fused,
        V.accepted_range(d, "n_chars", lo=1),
    ])


SQL_DATA_QUALITY = """
SELECT 'unique(o_orderkey)' AS check_name,
       CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations,
       count(*) - count(DISTINCT o_orderkey) = 0 AS passed
FROM orders
UNION ALL
SELECT 'fk(l_orderkey)',
       (SELECT CAST(count(*) AS BIGINT) FROM lineitem
        WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)),
       (SELECT count(*) FROM lineitem
        WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) = 0
UNION ALL
SELECT 'fk(user_id->c_custkey)',
       (SELECT CAST(count(*) AS BIGINT) FROM events
        WHERE user_id IS NOT NULL
          AND user_id NOT IN (SELECT c_custkey FROM customer)),
       (SELECT count(*) FROM events
        WHERE user_id IS NOT NULL
          AND user_id NOT IN (SELECT c_custkey FROM customer)) = 0
UNION ALL
SELECT 'not_null(user_id)',
       CAST(coalesce(sum((user_id IS NULL)::BIGINT), 0) AS BIGINT),
       coalesce(sum((user_id IS NULL)::BIGINT), 0) = 0
FROM events
UNION ALL
SELECT 'range(value)',
       CAST(coalesce(sum((value IS NOT NULL AND value < 0)::BIGINT), 0)
            AS BIGINT),
       coalesce(sum((value IS NOT NULL AND value < 0)::BIGINT), 0) = 0
FROM events
UNION ALL
SELECT 'range(n_chars)',
       CAST(coalesce(sum((n_chars IS NOT NULL AND n_chars < 1)::BIGINT), 0)
            AS BIGINT),
       coalesce(sum((n_chars IS NOT NULL AND n_chars < 1)::BIGINT), 0) = 0
FROM documents
UNION ALL
SELECT 'unique(user_id)',
       CAST(count(*) - count(DISTINCT user_id) AS BIGINT),
       count(*) - count(DISTINCT user_id) = 0 AS passed
FROM events
"""


# Drift gate: columns profiled and the baseline snapshot cut. The
# cutoff is mid-range of the 30-day synthetic stream, so event_id
# (distinct ≈ row count) roughly doubles between baseline and current
# — a guaranteed drift FAIL — while user_id / event_type cardinality
# is stable across halves — guaranteed PASSes. Both outcomes
# exercised deterministically.
_DRIFT_COLS = ["user_id", "event_type", "event_id"]
_DRIFT_CUTOFF = "2024-01-16 00:00:00"
_DRIFT_TOL = 0.25

# One persisted baseline profile per (session, sf_dir): the drift
# check's whole point is comparing against a STORED artifact — the
# profile parquet a previous pipeline run wrote — so the catalog query
# writes it once (write_swap, atomic) and every run reads it back.


def _drift_baseline(spark, sf_dir: str) -> str:
    import tempfile

    key = (spark, sf_dir)
    if key not in _DRIFT_BASELINE_CACHE:
        e = _t(spark, sf_dir, "events").filter(
            F.expr(f"ts < TIMESTAMP_NTZ '{_DRIFT_CUTOFF}'"))
        prof = sketch.kmv_distinct(e, _DRIFT_COLS, k=_KMV_K)
        path = _infra_tmpdir("profile-baseline-") + "/profile"
        sinks.write_swap(prof, path)
        _DRIFT_BASELINE_CACHE[key] = path
    return _DRIFT_BASELINE_CACHE[key]


def q_data_quality_drift(spark, sf_dir):
    """Anomaly-aware data-quality gate (functions/validate.py::
    profile_drift): today's KMV column profile vs the PERSISTED
    baseline profile (sketch_profile's output written to parquet, read
    back) — Deequ's check-against-last-run. event_id cardinality
    roughly doubles vs the mid-stream baseline snapshot (drift FAIL at
    ±25%); user_id / event_type are stable (PASS). The sketches are
    deterministic functions of the value sets, so the oracle
    recomputes both profiles exactly instead of reading the artifact."""
    from twitter_to_sqlite_spark.functions import validate as V

    e = _t(spark, sf_dir, "events")
    current = sketch.kmv_distinct(e, _DRIFT_COLS, k=_KMV_K)
    baseline = spark.read.parquet(_drift_baseline(spark, sf_dir))
    return V.profile_drift(current, baseline, rel_tol=_DRIFT_TOL)


SQL_DATA_QUALITY_DRIFT = f"""
WITH base AS ({_kmv_sql(_DRIFT_COLS,
                        f"ts < TIMESTAMP '{_DRIFT_CUTOFF}'")}),
cur AS ({_kmv_sql(_DRIFT_COLS)})
SELECT 'drift(' || col_name || ')' AS check_name,
       coalesce(base.kmv_estimate, 0)::BIGINT AS baseline_est,
       coalesce(cur.kmv_estimate, 0)::BIGINT AS current_est,
       round(abs(coalesce(cur.kmv_estimate, 0)
                 - coalesce(base.kmv_estimate, 0))
             / greatest(coalesce(base.kmv_estimate, 0), 1), 4)
         AS rel_change,
       base.kmv_estimate IS NOT NULL AND cur.kmv_estimate IS NOT NULL
       AND round(abs(coalesce(cur.kmv_estimate, 0)
                     - coalesce(base.kmv_estimate, 0))
                 / greatest(coalesce(base.kmv_estimate, 0), 1), 4)
           <= {_DRIFT_TOL} AS passed
FROM base FULL OUTER JOIN cur USING (col_name)
"""


def q_scd2_history(spark, sf_dir):
    """Type-2 SCD historization (operators/relational.py::
    scd2_history): the events stream collapsed into per-user
    event_type validity intervals (valid_from/valid_to epoch micros,
    is_current) — the full point-in-time timeline the reference's
    last-write-wins upsert (K1) discards, joinable by the as-of join.
    Null-safe change detection; chronological event_id ordering (the
    reference's integer-id convention)."""
    e = _t(spark, sf_dir, "events")
    return R.scd2_history(e, ["user_id"], "event_id", "ts",
                          ["event_type"])


SQL_SCD2_HISTORY = """
WITH s AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
         lag(event_type) OVER w AS prev,
         lag(event_id) OVER w IS NULL AS first
  FROM events WHERE user_id IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
),
k AS (
  SELECT user_id, event_id, event_type, us FROM s
  WHERE first OR event_type IS DISTINCT FROM prev
)
SELECT user_id, event_type,
       us AS valid_from_us,
       lead(us) OVER w2 AS valid_to_us,
       lead(us) OVER w2 IS NULL AS is_current
FROM k
WINDOW w2 AS (PARTITION BY user_id ORDER BY event_id)
"""


def q_sketch_profile_by(spark, sf_dir):
    """Grouped KMV distinct sketch (functions/sketch.py::
    kmv_distinct_by, k=64): distinct users per event_type from
    per-group bottom-k hash sets — the users-per-segment profile with
    per-group state ≤ k (group-partitioned window, never a global
    sort). ~150 distinct users per type at sf0.01 exercises the
    (k−1)/u_(k) estimator path in every group."""
    e = _t(spark, sf_dir, "events")
    return sketch.kmv_distinct_by(e, "event_type", "user_id", k=_KMV_K)


SQL_SKETCH_PROFILE_BY = f"""
WITH v AS (SELECT DISTINCT event_type AS g, user_id AS v FROM events
           WHERE event_type IS NOT NULL AND user_id IS NOT NULL),
h AS (SELECT g, ('0x' || substring(md5(v::VARCHAR), 1, 15))::BIGINT AS h
      FROM v),
r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM h),
a AS (SELECT g, count(*) AS n_kept,
             max(h / 1152921504606846976.0) AS umax
      FROM r WHERE rn <= {_KMV_K} GROUP BY g)
SELECT g AS event_type, n_kept::BIGINT AS n_kept,
       CASE WHEN n_kept < {_KMV_K} THEN n_kept::BIGINT
            ELSE CAST(round({float(_KMV_K - 1)!r} / umax, 0) AS BIGINT)
       END AS kmv_estimate
FROM a
"""


def q_sketch_merge(spark, sf_dir):
    """KMV mergeability as a driver-gated fact, not just a unit test:
    the Spark side profiles two DISJOINT time shards of events
    independently and merges their k-min sets
    (sketch.kmv_merge_distinct — the 1000-executor no-second-pass
    path); the ORACLE sketches the whole table directly
    (SQL_SKETCH_PROFILE). They hash-match only because k-min of a
    union is exactly the re-truncated union of k-mins — the parity IS
    the merge law, verified cross-engine."""
    e = _t(spark, sf_dir, "events")
    cut = F.expr(f"ts < TIMESTAMP_NTZ '{_DRIFT_CUTOFF}'")
    # the shards must PARTITION the table: a NULL ts satisfies neither
    # `cut` nor `~cut`, so the second shard takes the complement
    # explicitly (NULL-ts rows included) — otherwise their values
    # would be missing from the merge while the oracle's whole-table
    # sketch sees them
    return sketch.kmv_merge_distinct(
        [e.filter(cut), e.filter(cut.isNull() | ~cut)],
        _KMV_COLS, k=_KMV_K)


# the merged-shard sketch must equal the direct whole-table sketch
SQL_SKETCH_MERGE = SQL_SKETCH_PROFILE


_EWMA_ALPHA = 0.2
_EWMA_W = 16


def q_ewma(spark, sf_dir):
    """Truncated EWMA of each user's event values
    (operators/relational.py::ewma, α=0.2, W=16): the recurrence
    acc·(1−α)+α·x folded oldest→newest over a bounded trailing frame —
    no pow() (libm rounding differs across engines), no sequential
    scan; both engines run the identical multiply-add sequence, so
    values are bit-equal before round(6)."""
    e = _t(spark, sf_dir, "events")
    return R.ewma(e, "user_id", "event_id", "value",
                  alpha=_EWMA_ALPHA, window=_EWMA_W)


SQL_EWMA = f"""
SELECT user_id, event_id, value,
       CAST(round(list_reduce(
         list_prepend(0.0, list(CAST(value AS DOUBLE)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN {_EWMA_W - 1} PRECEDING AND CURRENT ROW)),
         (acc, x) -> acc * {1.0 - _EWMA_ALPHA!r} + {_EWMA_ALPHA!r} * x
       ), 6) AS DOUBLE) AS ewma
FROM events
WHERE user_id IS NOT NULL AND value IS NOT NULL
"""


_WINSOR_Q = 0.95
_WINSOR_K = 512


def q_winsorize(spark, sf_dir):
    """Winsorization driven by the quantile sketch — the
    sketch→transform composition a feature pipeline runs: per-group
    (event_type) p95 from the deterministic bottom-k hash sample
    (sketch.grouped_sample_quantiles), broadcast back, values clipped
    at the cap. The cap is an actual data value (sample order
    statistic), so the clip is engine-exact with no float estimate in
    the join."""
    e = _t(spark, sf_dir, "events")
    caps = sketch.grouped_sample_quantiles(
        e, "event_type", "value", "event_id",
        qs=(_WINSOR_Q,), k=_WINSOR_K,
    ).select("event_type", F.col("est").alias("__cap"))
    return (
        e.filter(F.col("event_type").isNotNull()
                 & F.col("value").isNotNull()
                 & F.col("event_id").isNotNull())
        .join(F.broadcast(caps), "event_type")
        .select(
            "event_id", "event_type", "value",
            F.least(F.col("value"), F.col("__cap"))
            .alias("value_winsorized"),
            (F.col("value") > F.col("__cap")).alias("was_clipped"),
        )
    )


SQL_WINSORIZE = f"""
WITH s AS (
  SELECT event_type, value AS val,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY ('0x' || substring(md5(event_id::VARCHAR), 1, 15))
                      ::BIGINT, value) AS rn
  FROM events
  WHERE value IS NOT NULL AND event_id IS NOT NULL
        AND event_type IS NOT NULL
),
samp AS (SELECT event_type, val FROM s WHERE rn <= {_WINSOR_K}),
o AS (
  SELECT event_type, val,
         row_number() OVER (PARTITION BY event_type ORDER BY val) AS vr,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM samp
),
caps AS (
  SELECT event_type, val AS cap FROM o
  WHERE vr = CAST(floor({_WINSOR_Q!r} * (n - 1)) AS BIGINT) + 1
)
SELECT e.event_id, e.event_type, e.value,
       least(e.value, c.cap) AS value_winsorized,
       e.value > c.cap AS was_clipped
FROM events e JOIN caps c USING (event_type)
WHERE e.value IS NOT NULL AND e.event_id IS NOT NULL
"""


def q_skew_join_salted(spark, sf_dir):
    """Skew-mitigated equi-join (operators/relational.py::salted_join):
    lineitem ⋈ orders on the order key with the orders side replicated
    onto 8 deterministic salts — the explicit-salting device for the
    one-hot-KEY regime AQE's partition splitting can't fix (a single
    key's hash group is unsplittable; a salt makes it 16 groups).
    Same answer as the plain join — the oracle IS the plain join —
    aggregated to revenue per order status."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderstatus")
    j = R.salted_join(li, o, "okey", n_salt=8)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
        ).cast("double").alias("revenue"),
    )


SQL_SKEW_JOIN_SALTED = """
SELECT o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderstatus
"""


_WSB_K = 20


def q_weighted_sample_by(spark, sf_dir):
    """Per-language fixed-size weighted sample
    (sampling.weighted_sample_by): exactly 20 docs per lang, inclusion
    ∝ quality, draw a pure function of doc_id — the stratified form of
    weighted_sample (group-partitioned window instead of a global
    top-k, per-group state ≤ k)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text.quality_score(text.token_count(d)).select(
        "doc_id", "lang", "quality")
    from twitter_to_sqlite_spark.functions import sampling

    s = sampling.weighted_sample_by(
        scored, "lang", k=_WSB_K, weight_col="quality",
        key_col="doc_id", resolution=_WS_RES)
    return s.select("doc_id", "lang", "quality",
                    F.col("__sk").alias("sample_key"))


def _weighted_sample_by_sql() -> str:
    base = SQL_WEIGHTED_SAMPLE
    # reuse the quality + keyed CTEs of the global form, swap the
    # global top-k tail for a per-group row_number cut
    marker = "SELECT doc_id, lang, quality, sample_key\nFROM keyed"
    head, found, _tail = base.partition(marker)
    assert found, "SQL_WEIGHTED_SAMPLE tail changed; update the marker"
    # NULL-group exclusion mirrors sampling.weighted_sample_by — a
    # NULL-lang partition would otherwise emit rows only on the oracle
    # side (the Spark operator filters group_col IS NOT NULL)
    return head + f"""SELECT doc_id, lang, quality, sample_key FROM (
  SELECT doc_id, lang, quality, sample_key,
         row_number() OVER (PARTITION BY lang
                            ORDER BY sample_key DESC, doc_id) AS rn
  FROM keyed WHERE lang IS NOT NULL
) WHERE rn <= {_WSB_K}
"""


def q_unpivot(spark, sf_dir):
    """Unpivot/melt (the inverse of q_pivot_status): orders' numeric
    metrics stacked into (o_orderkey, metric, val) long form — the
    wide→long reshape feature stores need. Spark's native unpivot
    (one-pass generator, no shuffle); the oracle is the equivalent
    UNION ALL."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("o_totalprice"),
        F.col("o_custkey").cast("double").alias("o_custkey"),
    )
    return o.unpivot(
        ["o_orderkey"], ["o_totalprice", "o_custkey"],
        "metric", "val",
    )


SQL_UNPIVOT = """
SELECT o_orderkey, 'o_totalprice' AS metric,
       o_totalprice::DOUBLE AS val FROM orders
UNION ALL
SELECT o_orderkey, 'o_custkey', o_custkey::DOUBLE
FROM orders
"""


_SLIDE_STEP_US = 3_600_000_000  # 1 h hop
_SLIDE_N = 2                    # 2 hops per window = 2 h windows


def q_sliding_counts(spark, sf_dir):
    """Hopping-window event counts (2 h windows sliding by 1 h):
    Spark's native F.window(ts, '2 hours', '1 hour') generator — each
    event lands in exactly 2 windows, aggregated by window start
    (epoch micros for cross-engine hashing). The oracle replays the
    explode arithmetic: window starts (bin − off)·hop for off ∈
    {0,1}. The streaming twin of this exact expression is the
    watermarked windowed agg in streaming/."""
    e = _t(spark, sf_dir, "events")
    win = F.window(F.col("ts"), "2 hours", "1 hour")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(win.start as timestamp_ntz))"
    )
    return (
        e.select("user_id", "value", win.alias("win"))
        .select("user_id", "value", us.alias("win_start_us"))
        .groupBy("win_start_us")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


SQL_SLIDING_COUNTS = f"""
SELECT (epoch_us(ts) // {_SLIDE_STEP_US} - off) * {_SLIDE_STEP_US}
         AS win_start_us,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events, (VALUES (0), (1)) t(off)
GROUP BY 1
"""


def q_anomaly_zscore(spark, sf_dir):
    """Trailing z-score anomaly detection
    (operators/relational.py::trailing_zscore): each event's value
    scored against its user's 16 PRECEDING values (frame excludes the
    current row — the leakage-free score an online monitor had at
    event time); flag at |z| > 3 computed from the rounded score so
    both engines compare the identical boundary."""
    e = _t(spark, sf_dir, "events")
    return R.trailing_zscore(e, "user_id", "event_id", "value",
                             window=16, min_points=8, threshold=3.0)


SQL_ANOMALY_ZSCORE = """
WITH s AS (
  SELECT user_id, event_id, value,
         count(value) OVER w AS n,
         avg(value) OVER w AS m,
         stddev_samp(value) OVER w AS sd
  FROM events
  WHERE user_id IS NOT NULL AND value IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN 16 PRECEDING AND 1 PRECEDING)
)
SELECT user_id, event_id, value,
       CASE WHEN n >= 8 AND sd > 0
            THEN round((value - m) / sd, 4) END AS zscore,
       coalesce(abs(CASE WHEN n >= 8 AND sd > 0
                         THEN round((value - m) / sd, 4) END) > 3.0,
                false) AS is_anomaly
FROM s
"""


def q_snapshot_diff(spark, sf_dir):
    """CDC between two snapshots (operators/relational.py::
    snapshot_diff): deterministic arithmetic slices of events play
    'yesterday' (drops event_id % 103 = 0) and 'today' (drops % 101,
    bumps value where % 97 = 0), so the diff provably contains all
    three change types at every SF. One full-outer key join; only
    changed keys are emitted — the diff is the small output, the
    snapshots the big inputs (Delta CDF as a plain plan)."""
    e = _t(spark, sf_dir, "events").select("event_id", "value")
    old = e.filter(F.col("event_id") % 103 != 0)
    new = e.filter(F.col("event_id") % 101 != 0).withColumn(
        "value",
        F.when(F.col("event_id") % 97 == 0, F.col("value") + 1)
        .otherwise(F.col("value")),
    )
    return R.snapshot_diff(old, new, ["event_id"], ["value"])


SQL_SNAPSHOT_DIFF = """
WITH old AS (
  SELECT event_id, value FROM events
  WHERE event_id IS NOT NULL AND event_id % 103 != 0
),
new AS (
  SELECT event_id,
         CASE WHEN event_id % 97 = 0 THEN value + 1 ELSE value END
           AS value
  FROM events WHERE event_id IS NOT NULL AND event_id % 101 != 0
),
j AS (
  SELECT coalesce(old.event_id, new.event_id) AS event_id,
         old.value AS old_value, new.value AS new_value,
         old.event_id IS NOT NULL AS in_old,
         new.event_id IS NOT NULL AS in_new
  FROM old FULL OUTER JOIN new ON old.event_id = new.event_id
)
SELECT event_id, old_value, new_value,
       CASE WHEN NOT in_old THEN 'added'
            WHEN NOT in_new THEN 'removed'
            WHEN old_value IS DISTINCT FROM new_value THEN 'changed'
       END AS change_type
FROM j
WHERE CASE WHEN NOT in_old THEN 'added'
           WHEN NOT in_new THEN 'removed'
           WHEN old_value IS DISTINCT FROM new_value THEN 'changed'
      END IS NOT NULL
"""


def q_apply_changelog(spark, sf_dir):
    """CDC apply (operators/relational.py::apply_changelog): a
    synthetic changelog (delete every event_id % 11 = 0 at order 2;
    upsert value×2 for % 13 = 0 at order 1) merged into the events
    snapshot — latest op per key wins, so keys divisible by both (143)
    end deleted, exercising the conflict path. The generalization of
    the reference's INSERT OR REPLACE to logs that can also delete;
    on Delta this is MERGE WHEN MATCHED THEN DELETE."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id",
                                           "value")
    dels = e.filter(F.col("event_id") % 11 == 0).select(
        "event_id", "user_id", "value",
        F.lit("delete").alias("op"), F.lit(2).alias("ord"),
    )
    ups = e.filter(F.col("event_id") % 13 == 0).select(
        "event_id", "user_id",
        (F.col("value") * 2).alias("value"),
        F.lit("upsert").alias("op"), F.lit(1).alias("ord"),
    )
    return R.apply_changelog(e, dels.unionByName(ups),
                             ["event_id"], "op", "ord")


SQL_APPLY_CHANGELOG = """
WITH ch AS (
  SELECT event_id, user_id, value, 'delete' AS op, 2 AS ord
  FROM events WHERE event_id % 11 = 0
  UNION ALL
  SELECT event_id, user_id, value * 2, 'upsert', 1
  FROM events WHERE event_id % 13 = 0
),
latest AS (
  SELECT event_id, op, user_id AS c_user_id, value AS c_value
  FROM (SELECT *, row_number() OVER (PARTITION BY event_id
                                     ORDER BY ord DESC) AS rn
        FROM ch) WHERE rn = 1
)
SELECT e.event_id,
       CASE WHEN latest.op = 'upsert' THEN latest.c_user_id
            ELSE e.user_id END AS user_id,
       CASE WHEN latest.op = 'upsert' THEN latest.c_value
            ELSE e.value END AS value
FROM events e LEFT JOIN latest USING (event_id)
WHERE latest.op IS NULL OR latest.op = 'upsert'
"""


def q_event_paths(spark, sf_dir):
    """Length-3 user-journey mining: every consecutive
    (type → type → type) window in each user's time-ordered stream,
    counted corpus-wide with its share — the path-frequency extension
    of transition_matrix (order-2 Markov evidence vs its order-1).
    Same cost envelope: ONE user-keyed window shuffle computes both
    leads, one partial-agg shuffle on the path; the path dictionary
    is bounded by |types|³, so the agg state is tiny at any corpus
    size."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                           "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        e.withColumn("t2", F.lead("event_type", 1).over(w))
        .withColumn("t3", F.lead("event_type", 2).over(w))
        .filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .groupBy(
            F.concat_ws(">", "event_type", "t2", "t3").alias("path"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy()
    return paths.select(
        "path", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("share"),
    )


SQL_EVENT_PATHS = """
WITH seq AS (
  SELECT event_type,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
paths AS (
  SELECT event_type || '>' || t2 || '>' || t3 AS path,
         count(*) AS n
  FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
  GROUP BY 1
)
SELECT path, CAST(n AS BIGINT) AS n,
       round(n / sum(n) OVER (), 6) AS share
FROM paths
"""


_CORR_PAIRS = [("l_quantity", "l_extendedprice"),
               ("l_extendedprice", "l_discount"),
               ("l_quantity", "l_tax")]


def q_corr_matrix(spark, sf_dir):
    """Pairwise Pearson correlations over lineitem metrics
    (functions/stats.py::corr_pairs): all three pairs' raw moments
    collected in ONE map-side-combined aggregate scan, the statistic
    derived from the moments in a fixed expression order — the
    profiling shape that cross-engine reproduces where built-in
    corr()'s streaming update formulas don't, and that costs one agg
    job on a 100 TB fact table."""
    li = _t(spark, sf_dir, "lineitem")
    from twitter_to_sqlite_spark.functions import stats

    return stats.corr_pairs(li, _CORR_PAIRS)


def _corr_sql() -> str:
    sel, arms = [], []
    for i, (xc, yc) in enumerate(_CORR_PAIRS):
        # DECIMAL(28,4): int128-backed so DuckDB's product doesn't
        # overflow the int64 decimal kernel (values are identical)
        x = f"CAST({xc} AS DECIMAL(28,4))"
        y = f"CAST({yc} AS DECIMAL(28,4))"
        sel.append(
            f"count(CASE WHEN {xc} IS NOT NULL AND {yc} IS NOT NULL "
            f"THEN 1 END) AS m{i}_0, "
            f"sum(CASE WHEN {yc} IS NOT NULL THEN {x} END)::DOUBLE AS m{i}_1, "
            f"sum(CASE WHEN {xc} IS NOT NULL THEN {y} END)::DOUBLE AS m{i}_2, "
            f"sum({x} * {y})::DOUBLE AS m{i}_3, "
            f"sum(CASE WHEN {yc} IS NOT NULL THEN {x} * {x} END)::DOUBLE "
            f"AS m{i}_4, "
            f"sum(CASE WHEN {xc} IS NOT NULL THEN {y} * {y} END)::DOUBLE "
            f"AS m{i}_5")
        arms.append(f"""SELECT '{xc}' AS x_col, '{yc}' AS y_col,
       m{i}_0 AS n,
       CASE WHEN m{i}_0 >= 2
                 AND m{i}_0 * m{i}_4 - m{i}_1 * m{i}_1 > 0
                 AND m{i}_0 * m{i}_5 - m{i}_2 * m{i}_2 > 0
            THEN round((m{i}_0 * m{i}_3 - m{i}_1 * m{i}_2)
                       / sqrt(m{i}_0 * m{i}_4 - m{i}_1 * m{i}_1)
                       / sqrt(m{i}_0 * m{i}_5 - m{i}_2 * m{i}_2), 4)
       END AS corr
FROM w""")
    return ("WITH w AS (SELECT " + ", ".join(sel)
            + " FROM lineitem)\n" + "\nUNION ALL\n".join(arms))


SQL_CORR_MATRIX = _corr_sql()


_AB_ZCRIT = 1.96


def q_ab_test(spark, sf_dir):
    """Per-event_type Welch z-test (functions/stats.py::ab_welch)
    between the deterministic variant arms user_id % 2 — the
    experiment-analysis readout. One grouped aggregate collects both
    arms' moments via conditional sums (no self-join, no second
    shuffle); the significance flag tests the ROUNDED z so both
    engines decide the 1.96 boundary identically."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
    from twitter_to_sqlite_spark.functions import stats

    return stats.ab_welch(e, "event_type", F.col("user_id") % 2,
                          "value", z_crit=_AB_ZCRIT)


SQL_AB_TEST = f"""
WITH d AS (
  SELECT event_type, (user_id % 2)::INT AS a, value::DOUBLE AS v
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
        AND value IS NOT NULL
),
g AS (
  SELECT event_type,
         sum(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS n_0,
         sum(CASE WHEN a = 0 THEN v END) AS s0,
         sum(CASE WHEN a = 0 THEN v * v END) AS q0,
         sum(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS n_1,
         sum(CASE WHEN a = 1 THEN v END) AS s1,
         sum(CASE WHEN a = 1 THEN v * v END) AS q1
  FROM d GROUP BY event_type
),
z AS (
  SELECT event_type, n_0, n_1,
         round(s0 / n_0, 4) AS mean_0,
         round(s1 / n_1, 4) AS mean_1,
         CASE WHEN n_0 >= 2 AND n_1 >= 2
                   AND (q0 - s0 * s0 / n_0) / (n_0 - 1)
                     + (q1 - s1 * s1 / n_1) / (n_1 - 1) > 0
              THEN round((s1 / n_1 - s0 / n_0)
                         / sqrt((q1 - s1 * s1 / n_1) / (n_1 - 1) / n_1
                              + (q0 - s0 * s0 / n_0) / (n_0 - 1) / n_0),
                         4)
         END AS z_score
  FROM g
)
SELECT event_type, CAST(n_0 AS BIGINT) AS n_0,
       CAST(n_1 AS BIGINT) AS n_1, mean_0, mean_1, z_score,
       coalesce(abs(z_score) > {_AB_ZCRIT!r}, false) AS significant
FROM z
"""


def q_incremental_agg(spark, sf_dir):
    """Incremental materialized-aggregate maintenance (operators/
    relational.py::weighted_delta_agg + merge_agg_delta): 'yesterday's
    per-event_type (COUNT, DECIMAL SUM) rollup is maintained under a
    changelog — late arrivals (event_id % 101 = 0) as +1 rows,
    retractions (% 103 = 0 of rows present in the base) as −1 rows —
    by merging stored partials with the delta aggregate, never
    rescanning the base. The oracle RECOMPUTES the rollup from the
    maintained table directly, so parity IS the view-maintenance law:
    maintain-then-merge ≡ recompute. Exact because both engines sum
    in DECIMAL(18,4)."""
    e = (
        _t(spark, sf_dir, "events")
        .select("event_id", "event_type", "value")
        .filter(F.col("event_type").isNotNull()
                & F.col("event_id").isNotNull())
    )
    base = e.filter(F.col("event_id") % 101 != 0)
    base_agg = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("value").alias("n_vals"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("v_sum"),
    )
    inserts = e.filter(F.col("event_id") % 101 == 0) \
        .withColumn("w", F.lit(1))
    deletes = e.filter((F.col("event_id") % 103 == 0)
                       & (F.col("event_id") % 101 != 0)) \
        .withColumn("w", F.lit(-1))
    delta = R.weighted_delta_agg(
        inserts.unionByName(deletes), ["event_type"], "w", "value")
    merged = R.merge_agg_delta(base_agg, delta, ["event_type"])
    return merged.select(
        "event_type", "n_rows", "n_vals",
        F.col("v_sum").cast("double").alias("v_sum"))


SQL_INCREMENTAL_AGG = """
WITH maintained AS (
  SELECT event_type, value FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    AND NOT (event_id % 103 = 0 AND event_id % 101 != 0)
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(value) AS BIGINT) AS n_vals,
       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS v_sum
FROM maintained GROUP BY event_type
"""


_EQD_QS = (0.25, 0.5, 0.75)


def q_equidepth_histogram(spark, sf_dir):
    """Equi-depth histogram of events.value driven by the quantile
    sketch: bin edges are the deterministic bottom-k sample's
    quartiles (sample_quantiles — actual data values, engine-exact),
    every row assigned to its bin by comparing against the broadcast
    edges, counted per bin with the bin's observed min/max. The
    optimizer-statistics shape (equi-depth histograms are what a CBO
    keeps) built sketch-first: one TakeOrderedAndProject for the
    edges, one broadcast join + partial agg for the counts."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_id").isNotNull())
    qs = sketch.sample_quantiles(e, "value", "event_id",
                                 qs=_EQD_QS, k=1024)
    edges = [r["est"] for r in sorted(qs.collect(),
                                      key=lambda r: r["q"])]
    bin_id = F.lit(len(edges))
    for i, edge in enumerate(reversed(edges)):
        bin_id = F.when(F.col("value") <= F.lit(edge),
                        F.lit(len(edges) - 1 - i)).otherwise(bin_id)
    return (
        e.select("value", bin_id.alias("bin"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.min("value"), 4).alias("bin_min"),
            F.round(F.max("value"), 4).alias("bin_max"),
        )
    )


SQL_EQUIDEPTH_HISTOGRAM = f"""
WITH s AS (
  SELECT value AS val,
         ('0x' || substring(md5(event_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
  ORDER BY h, val LIMIT 1024
),
o AS (
  SELECT val, row_number() OVER (ORDER BY val) AS rn,
         count(*) OVER () AS n
  FROM s
),
edges AS (
  SELECT CAST(q AS DOUBLE) AS q, val AS est
  FROM o, (VALUES {", ".join(f"({q})" for q in _EQD_QS)}) qs(q)
  WHERE rn = CAST(floor(CAST(q AS DOUBLE) * (n - 1)) AS BIGINT) + 1
),
e1 AS (SELECT est FROM edges WHERE q = {_EQD_QS[0]}),
e2 AS (SELECT est FROM edges WHERE q = {_EQD_QS[1]}),
e3 AS (SELECT est FROM edges WHERE q = {_EQD_QS[2]})
SELECT CASE WHEN value <= (SELECT est FROM e1) THEN 0
            WHEN value <= (SELECT est FROM e2) THEN 1
            WHEN value <= (SELECT est FROM e3) THEN 2
            ELSE 3 END AS bin,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(min(value), 4) AS bin_min,
       round(max(value), 4) AS bin_max
FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
GROUP BY 1
"""


_BLOOM_PRICE = 460_000.0


def q_bloom_prune(spark, sf_dir):
    """Runtime Bloom-filter join pruning (functions/bloom.py::
    bloom_prune_join): lineitem ⋈ the ~1.5% of orders that are
    1-URGENT above a price floor. The dim side's keys are folded into
    a 64 Kibit deterministic Bloom filter (distributed bit_or build,
    bounded ≤1024-row collect), and the membership probe is a pure
    column predicate on the fact scan — so ~98% of lineitem never
    reaches the join shuffle. False positives die in the exact join,
    so the oracle is the plain join. The explicit, engine-portable
    form of Spark's runtime row-level filtering — the device that
    makes selective fact⋈dim joins shuffle O(selectivity·|fact|)
    instead of O(|fact|) at 100 TB."""
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"),
        "l_extendedprice", "l_discount", "l_returnflag")
    dim = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_orderpriority") == "1-URGENT")
                & (F.col("o_totalprice") > _BLOOM_PRICE))
        .select("o_orderkey")
    )
    j = bloom.bloom_prune_join(li, dim, "o_orderkey")
    return j.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(18,4)")
        ).cast("double").alias("revenue"),
    )


SQL_BLOOM_PRUNE = f"""
SELECT l.l_returnflag,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
  AND o.o_totalprice > {_BLOOM_PRICE!r}
GROUP BY l.l_returnflag
"""


_CONT_OFFSET = 9_000_000
_CONT_FRAC = 0.4
_CONT_TAU = 0.9
_CONT_MAX_DF = 20


def q_containment(spark, sf_dir):
    """Directed containment dedup (functions/dedup.py::
    containment_pairs): 20 planted excerpt docs — the first 40% of a
    base doc's tokens — must be flagged as contained in their bases
    with containment ≈ 1, though their Jaccard (≈ |A|/|B| ≈ 0.4) is
    invisible to the symmetric pass at τ=0.5. The quote/partial-mirror
    screen of a pretraining pipeline; same inverted-index cost
    envelope as dedup_jaccard (Σ df² with stop-shingle cap)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                    lambda t: F.length(t) > 0)
    excerpts = (
        d.filter(F.col("doc_id") < 20)
        .select(
            (F.col("doc_id") + F.lit(_CONT_OFFSET)).alias("doc_id"),
            F.concat_ws(
                " ",
                F.slice(
                    toks, 1,
                    F.ceil(F.size(toks) * F.lit(_CONT_FRAC)).cast("int"),
                ),
            ).alias("text"),
        )
    )
    # r10: the base corpus side of the shingle frame comes from the
    # shared _build:doc_shingles checkpoint; shingling is per-document
    # and excerpt ids are disjoint, so the union is row-identical to
    # shingling docs ∪ excerpts directly.
    sh = _doc_shingles(spark, sf_dir).unionByName(
        dedup.shingles(excerpts, "doc_id", "text", 3))
    return dedup.containment_pairs(
        d.unionByName(excerpts), "doc_id", "text",
        k=3, threshold=_CONT_TAU, max_df=_CONT_MAX_DF, shingles_df=sh)


SQL_CONTAINMENT = f"""
WITH base AS (SELECT doc_id, text FROM documents),
docs AS (
  SELECT doc_id, text FROM base
  UNION ALL
  SELECT doc_id + {_CONT_OFFSET} AS doc_id,
         array_to_string(
           tk[1:CAST(ceil(len(tk) * {_CONT_FRAC!r}) AS BIGINT)], ' ')
           AS text
  FROM (SELECT doc_id, {_SQL_TOKS} AS tk FROM base)
  WHERE doc_id < 20
),
sh AS ({_SQL_SHINGLES}),
shf AS (
  SELECT id, shingle FROM (
    SELECT id, shingle, count(*) OVER (PARTITION BY shingle) AS df FROM sh
  ) WHERE df <= {_CONT_MAX_DF}
),
sz AS (SELECT id, count(*) AS sz FROM shf GROUP BY id),
inter AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS inter
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY a.id, b.id
),
scored AS (
  SELECT CASE WHEN sa.sz <= sb.sz THEN id_a ELSE id_b END AS contained_id,
         CASE WHEN sa.sz <= sb.sz THEN id_b ELSE id_a END AS container_id,
         inter,
         least(sa.sz, sb.sz) AS size_contained,
         greatest(sa.sz, sb.sz) AS size_container,
         round(inter / least(sa.sz, sb.sz), 6) AS containment
  FROM inter
  JOIN sz sa ON sa.id = id_a
  JOIN sz sb ON sb.id = id_b
)
SELECT * FROM scored WHERE containment >= {_CONT_TAU!r}
"""


_KCORE_K = 4
_KCORE_ROUNDS = 6
_KCORE_MOD = 20


def q_kcore(spark, sf_dir):
    """k-core peel (functions/graph.py::kcore, k=4, 6 rounds) of the
    hash-sparsified trade graph: the customer↔supplier edge list
    thinned to the deterministic 5% of pairs whose md5 ∈ 0 (mod 20) —
    sparsification brings the expander-ish bipartite graph to the
    critical regime where peeling actually cascades (the full graph's
    min degree exceeds k, making the peel a no-op). Fixed rounds make
    the trajectory engine-replayable; at sf0.1 the peel converges
    within the budget so the output IS the exact 4-core."""
    pairs = _trade_pairs(spark, sf_dir).filter(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("c"), F.col("s"))),
                1, 15),
            16, 10,
        ).cast("long") % _KCORE_MOD == 0
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"),
                               F.col("c").alias("dst")))
    return graph.kcore(edges, k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _kcore_sql() -> str:
    """Unrolled peel replay: one (keep, edge) CTE pair per round."""
    ctes = [f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey + {_PR_SUPP_OFFSET} AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
samp AS (
  SELECT c, s FROM pairs
  WHERE ('0x' || substring(md5(c::VARCHAR || ':' || s::VARCHAR), 1, 15))
          ::BIGINT % {_KCORE_MOD} = 0
),
e0 AS (
  SELECT c AS src, s AS dst FROM samp
  UNION ALL
  SELECT s AS src, c AS dst FROM samp
)"""]
    # AS MATERIALIZED: each e{i} is referenced twice (k{i+1} and
    # e{i+1}); DuckDB inlines plain CTEs, which would expand the peel
    # chain 2^rounds-fold (measured 121s -> 0.2s at sf0.01).
    for i in range(1, _KCORE_ROUNDS + 1):
        ctes.append(f"""k{i} AS MATERIALIZED (
  SELECT src FROM e{i - 1} GROUP BY src HAVING count(*) >= {_KCORE_K}
),
e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i - 1} e
  JOIN k{i} a ON e.src = a.src
  JOIN k{i} b ON e.dst = b.src
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT src AS node_id, CAST(count(*) AS BIGINT) AS degree
FROM e{_KCORE_ROUNDS} GROUP BY src"""
    )


SQL_KCORE = _kcore_sql()


def q_key_skew(spark, sf_dir):
    """Join/shuffle-key skew diagnosis for the two natural event
    keys: per key column, the cardinality, hot-key share, imbalance
    factor (max over mean frequency — the number AQE's skew-join
    threshold reasons about), and Shannon entropy vs its uniform
    ceiling. THE measurement that decides between a plain shuffle,
    AQE skew splitting, and the explicit salted join — committed as
    data, not guessed. One groupBy per key column + a scalar agg;
    entropy from Σ n·ln n so the float work is two dozen terms per
    partition partial."""
    e = _t(spark, sf_dir, "events")

    def skew_of(col):
        counts = e.filter(F.col(col).isNotNull()) \
            .groupBy(col).agg(F.count(F.lit(1)).alias("__n"))
        n = F.col("__n").cast("double")
        return counts.agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("__n").alias("n_rows"),
            F.max("__n").alias("max_freq"),
            F.sum(n * F.log(n)).alias("__nlogn"),
        ).select(
            F.lit(col).alias("key_col"),
            "n_keys", "n_rows", "max_freq",
            F.round(F.col("max_freq")
                    / (F.col("n_rows") / F.col("n_keys")), 4)
            .alias("imbalance"),
            F.round(
                F.log(F.col("n_rows").cast("double"))
                - F.col("__nlogn") / F.col("n_rows"), 4)
            .alias("entropy"),
            F.round(F.log(F.col("n_keys").cast("double")), 4)
            .alias("entropy_uniform"),
        )

    return skew_of("user_id").unionByName(skew_of("event_type"))


def _key_skew_sql() -> str:
    arms = []
    for col in ("user_id", "event_type"):
        arms.append(f"""SELECT key_col, n_keys, n_rows, max_freq,
       round(max_freq / (n_rows / n_keys), 4) AS imbalance,
       round(ln(n_rows) - nlogn / n_rows, 4) AS entropy,
       round(ln(n_keys), 4) AS entropy_uniform
FROM (
  SELECT '{col}' AS key_col,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(max(n) AS BIGINT) AS max_freq,
         sum(n::DOUBLE * ln(n::DOUBLE)) AS nlogn
  FROM (SELECT {col}, count(*) AS n FROM events
        WHERE {col} IS NOT NULL GROUP BY {col})
)""")
    return "\nUNION ALL\n".join(arms)


SQL_KEY_SKEW = _key_skew_sql()


_LATE_BUCKETS_US = [0, 1_000_000, 60_000_000]


def q_lateness_profile(spark, sf_dir):
    """Event-time out-of-orderness profile — the measurement that
    sizes a streaming watermark ('measure, don't guess' applied to
    allowed lateness): per event, its lag behind the max event time
    already seen in its user's ARRIVAL order (event_id), bucketed
    into on-time / ≤1s / ≤60s / >60s with the max observed lag. One
    user-keyed window (running max over preceding arrivals), one
    scalar agg."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(ts as timestamp_ntz))")
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = e.select(F.col("user_id"), F.col("event_id"), us.alias("__us"))
    d = d.withColumn(
        "__late",
        F.greatest(F.lit(0).cast("long"),
                   F.max("__us").over(w) - F.col("__us")))
    b0, b1, b2 = _LATE_BUCKETS_US
    return d.agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("__late") > b0).cast("long")).alias("n_late"),
        F.round(
            F.sum((F.col("__late") > b0).cast("long"))
            / F.count(F.lit(1)), 6).alias("p_late"),
        F.sum(((F.col("__late") > b0)
               & (F.col("__late") <= b1)).cast("long"))
        .alias("n_late_1s"),
        F.sum(((F.col("__late") > b1)
               & (F.col("__late") <= b2)).cast("long"))
        .alias("n_late_60s"),
        F.sum((F.col("__late") > b2).cast("long")).alias("n_late_gt"),
        F.max("__late").alias("max_late_us"),
    )


SQL_LATENESS_PROFILE = f"""
WITH d AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         greatest(0, coalesce(max(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), us) - us)
           AS late
  FROM events WHERE user_id IS NOT NULL
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       round(sum(CASE WHEN late > 0 THEN 1 ELSE 0 END) / count(*), 6)
         AS p_late,
       CAST(sum(CASE WHEN late > 0 AND late <= {_LATE_BUCKETS_US[1]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1s,
       CAST(sum(CASE WHEN late > {_LATE_BUCKETS_US[1]}
                     AND late <= {_LATE_BUCKETS_US[2]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late_60s,
       CAST(sum(CASE WHEN late > {_LATE_BUCKETS_US[2]}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_late_gt,
       CAST(max(late) AS BIGINT) AS max_late_us
FROM d
"""


def q_chi_square(spark, sf_dir):
    """Chi-square independence test of event_type × deterministic
    variant (user_id % 2) — the categorical companion of ab_test:
    observed cell counts vs expected row·col/N, χ² summed over the
    contingency table. All counts exact integers, χ² derived in a
    fixed expression order (cells sorted by type then arm), so the
    rounded statistic is engine-stable. One groupBy on the cell pair;
    totals broadcast back."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
    cells = e.groupBy(
        F.col("event_type").alias("t"),
        (F.col("user_id") % 2).alias("a"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_t = cells.groupBy("t").agg(F.sum("o").alias("rt"))
    cols_a = cells.groupBy("a").agg(F.sum("o").alias("ca"))
    tot = cells.agg(F.sum("o").alias("n"))
    # the FULL grid: an unobserved (t, a) cell still contributes
    # (0 - E)^2 / E — dropping zero cells understates chi2 (caught by
    # the perfect-dependence test, where half the statistic lives in
    # the empty cells)
    grid = rows_t.crossJoin(F.broadcast(cols_a))
    j = (grid.join(cells, ["t", "a"], "left")
         .withColumn("o", F.coalesce("o", F.lit(0)))
         .crossJoin(F.broadcast(tot)))
    ex = F.col("rt").cast("double") * F.col("ca") / F.col("n")
    term = (F.col("o") - ex) * (F.col("o") - ex) / ex
    # deterministic summation order: sort_array over collected structs
    return (
        j.select(F.struct(F.col("t"), F.col("a"),
                          term.alias("x")).alias("s"))
        .agg(F.sort_array(F.collect_list("s")).alias("terms"),
             F.count(F.lit(1)).alias("n_cells"))
        .select(
            F.round(F.aggregate(
                "terms", F.lit(0.0), lambda acc, s: acc + s["x"]), 4)
            .alias("chi2"),
            F.col("n_cells").cast("long").alias("n_cells"),
        )
    )


SQL_CHI_SQUARE = """
WITH d AS (
  SELECT event_type AS t, (user_id % 2)::INT AS a
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
),
cells AS (SELECT t, a, count(*) AS o FROM d GROUP BY t, a),
rt AS (SELECT t, sum(o) AS rt FROM cells GROUP BY t),
ca AS (SELECT a, sum(o) AS ca FROM cells GROUP BY a),
n AS (SELECT sum(o) AS n FROM cells),
grid AS (
  SELECT rt.t, ca.a, rt.rt, ca.ca, coalesce(cells.o, 0) AS o
  FROM rt CROSS JOIN ca LEFT JOIN cells USING (t, a)
),
terms AS (
  SELECT t, a,
         (o - rt::DOUBLE * ca / n.n)
           * (o - rt::DOUBLE * ca / n.n)
           / (rt::DOUBLE * ca / n.n) AS x
  FROM grid, n
)
SELECT round(sum_x, 4) AS chi2, n_cells FROM (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         list_reduce(list_prepend(0.0,
           list(x ORDER BY t, a)), (acc, v) -> acc + v) AS sum_x
  FROM terms
)
"""


_WSE_K = 64


def q_window_sketch_error(spark, sf_dir):
    """Per-hopping-window KMV accuracy audit: exact distinct users vs
    the k=64 KMV estimate for every 2h/1h window, with the relative
    error — the committed evidence that the sketch the streaming path
    would carry (bounded state per window) tracks the truth. Exact
    leg = sliding_counts' distinct; estimate leg = the grouped KMV
    keyed by window start; one broadcast-size join of two aggregates."""
    e = _t(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    win = F.window(F.col("ts"), "2 hours", "1 hour")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(win.start as timestamp_ntz))"
    )
    d = e.select("user_id", win.alias("win")) \
        .select("user_id", us.alias("win_start_us"))
    exact = d.groupBy("win_start_us").agg(
        F.countDistinct("user_id").alias("n_exact"))
    est = sketch.kmv_distinct_by(d, "win_start_us", "user_id", k=_WSE_K)
    return exact.join(est, "win_start_us").select(
        "win_start_us", "n_exact", "kmv_estimate",
        F.round(
            F.abs(F.col("kmv_estimate") - F.col("n_exact"))
            / F.col("n_exact"), 4).alias("rel_err"),
    )


SQL_WINDOW_SKETCH_ERROR = f"""
WITH d AS (
  SELECT (epoch_us(ts) // {_SLIDE_STEP_US} - off) * {_SLIDE_STEP_US} AS g,
         user_id AS v
  FROM events, (VALUES (0), (1)) t(off)
  WHERE user_id IS NOT NULL
),
ex AS (SELECT g, count(DISTINCT v) AS n_exact FROM d GROUP BY g),
dv AS (SELECT DISTINCT g, v FROM d),
h AS (SELECT g, ('0x' || substring(md5(v::VARCHAR), 1, 15))::BIGINT AS h
      FROM dv),
r AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
      FROM h),
a AS (SELECT g, count(*) AS n_kept,
             max(h / 1152921504606846976.0) AS umax
      FROM r WHERE rn <= {_WSE_K} GROUP BY g),
est AS (
  SELECT g,
         CASE WHEN n_kept < {_WSE_K} THEN n_kept::BIGINT
              ELSE CAST(round({float(_WSE_K - 1)!r} / umax, 0) AS BIGINT)
         END AS kmv_estimate
  FROM a
)
SELECT ex.g AS win_start_us,
       CAST(ex.n_exact AS BIGINT) AS n_exact,
       est.kmv_estimate,
       round(abs(est.kmv_estimate - ex.n_exact) / ex.n_exact, 4)
         AS rel_err
FROM ex JOIN est ON ex.g = est.g
"""


_DR_TAU = 0.5


def q_dedup_recall(spark, sf_dir):
    """Candidate recall of the MinHash-LSH index against exact
    Jaccard ≥ 0.5 truth — ann_recall's device applied to dedup:
    'measure, don't guess' for the b=4/r=4 banding choice. truth =
    the df-capped exact Jaccard pairs (q_dedup_jaccard's operator),
    candidates = the shared LSH pair frame; one row out with recall
    (how much true duplication the bands surface) and precision (how
    much candidate verification work is wasted). Both legs are the
    catalog's own operators; the output joins only pair KEYS, never
    documents."""
    # r10: truth rides the shared `_build:jaccard_pairs` frame (built
    # at the loosest catalog τ); filtering to τ=0.5 is row-identical
    # to building at τ=0.5 (threshold is a pure post-filter).
    truth = _jaccard_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= F.lit(_DR_TAU)).select("id_a", "id_b")
    cand = _minhash_pairs(spark, sf_dir).select("id_a", "id_b")
    hits = truth.join(cand, ["id_a", "id_b"])
    return (
        truth.agg(F.count(F.lit(1)).alias("n_true"))
        .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
        .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hit")))
        .select(
            "n_true", "n_cand", "n_hit",
            F.round(F.col("n_hit") / F.col("n_true"), 4)
            .alias("recall"),
            F.round(F.col("n_hit") / F.col("n_cand"), 4)
            .alias("precision"),
        )
    )


SQL_DEDUP_RECALL = f"""
WITH {_SQL_MINHASH_CTES},
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
truth AS (
  SELECT id_a, id_b FROM inter
  JOIN sz sa ON sa.id = id_a
  JOIN sz sb ON sb.id = id_b
  WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= {_DR_TAU!r}
),
hits AS (SELECT id_a, id_b FROM truth JOIN mh_pairs USING (id_a, id_b))
SELECT (SELECT count(*) FROM truth)::BIGINT AS n_true,
       (SELECT count(*) FROM mh_pairs)::BIGINT AS n_cand,
       (SELECT count(*) FROM hits)::BIGINT AS n_hit,
       round((SELECT count(*) FROM hits)
             / (SELECT count(*) FROM truth), 4) AS recall,
       round((SELECT count(*) FROM hits)
             / (SELECT count(*) FROM mh_pairs), 4) AS precision
"""


_ATTR_WINDOW_S = 3600.0


def q_attribution(spark, sf_dir):
    """First/last-touch conversion attribution (operators/
    relational.py::attribute_conversions): every purchase attributed
    to the earliest and the latest preceding click/view in the same
    user's stream, last-touch voided beyond a 1-hour lookback. ONE
    user-keyed window (first/last ignorenulls over a preceding-rows
    frame of the conditional touch struct) — no conversions×touches
    self-join, which is the shape that explodes on dense users."""
    e = _t(spark, sf_dir, "events")
    return R.attribute_conversions(
        e, "user_id", "ts", "event_id", "event_type",
        conversion="purchase", touch_types=["click", "view"],
        within_seconds=_ATTR_WINDOW_S)


SQL_ATTRIBUTION = f"""
WITH d AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         CASE WHEN event_type IN ('click', 'view')
              THEN {{'t': epoch_us(ts), 'ty': event_type}} END AS touch
  FROM events
),
wnd AS (
  SELECT event_id, user_id, event_type, us,
         first_value(touch IGNORE NULLS) OVER w AS ft,
         last_value(touch IGNORE NULLS) OVER w AS lt
  FROM d
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT event_id, user_id, us AS conv_us,
       ft.ty AS first_touch_type, ft.t AS first_touch_us,
       CASE WHEN ok THEN lt.ty END AS last_touch_type,
       CASE WHEN ok THEN lt.t END AS last_touch_us,
       CASE WHEN ok THEN us - lt.t END AS latency_us,
       ok AS attributed
FROM (SELECT *, lt IS NOT NULL
             AND us - lt.t <= {int(_ATTR_WINDOW_S * 1_000_000)} AS ok
      FROM wnd)
WHERE event_type = 'purchase'
"""


def q_grouped_trend(spark, sf_dir):
    """Per-event_type OLS trend of value over event time (functions/
    stats.py::grouped_trend): slope/intercept/R² from exact DECIMAL
    moments in ONE grouped aggregate — the per-series drift fit a
    metrics pipeline runs over every key. x is epoch-DAYS since
    1995-01-01 (integer-exact in DECIMAL; epoch-micros would overflow
    the moment products)."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull())
    from twitter_to_sqlite_spark.functions import stats

    d = e.select(
        "event_type", "value",
        F.expr("datediff(cast(ts as date), date'2024-01-01')")
        .cast("long").alias("xday"),
    )
    return stats.grouped_trend(d, "event_type", "xday", "value")


SQL_GROUPED_TREND = """
WITH d AS (
  SELECT event_type,
         CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
              AS DECIMAL(28,4)) AS x,
         CAST(value AS DECIMAL(28,4)) AS y,
         datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) IS NOT NULL
           AND value IS NOT NULL AS ok
  FROM events WHERE event_type IS NOT NULL
),
g AS (
  SELECT event_type, count(*) AS n,
         sum(x)::DOUBLE AS sx, sum(y)::DOUBLE AS sy,
         sum(x * y)::DOUBLE AS sxy,
         sum(x * x)::DOUBLE AS sxx, sum(y * y)::DOUBLE AS syy
  FROM d WHERE ok GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
            THEN round((n * sxy - sx * sy) / (n * sxx - sx * sx), 4)
       END AS slope,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
            THEN round((sy - (n * sxy - sx * sy)
                             / (n * sxx - sx * sx) * sx) / n, 4)
       END AS intercept,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0
                 AND n * syy - sy * sy > 0
            THEN round(((n * sxy - sx * sy) / (n * sxx - sx * sx))
                       * ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                       * (n * sxx - sx * sx) / (n * syy - sy * sy), 4)
       END AS r2
FROM g
"""


_DESC_COLS = ["event_id", "user_id", "value"]


def q_describe(spark, sf_dir):
    """Exact numeric profile of events (functions/stats.py::
    describe_numeric): count / nulls / exact distinct / min / max /
    DECIMAL-exact mean per column, all in ONE aggregate scan (Spark
    plans the multi-distinct via Expand) — df.describe() rebuilt so
    every cell cross-engine matches. The exact companion of the
    KMV-approximate sketch_profile."""
    e = _t(spark, sf_dir, "events")
    from twitter_to_sqlite_spark.functions import stats

    return stats.describe_numeric(e, _DESC_COLS)


def _describe_sql() -> str:
    sel = ["count(*) AS n"]
    arms = []
    for i, c in enumerate(_DESC_COLS):
        sel += [
            f"count({c}) AS k{i}",
            f"count(DISTINCT {c}) AS d{i}",
            f"min({c}::DOUBLE) AS mn{i}",
            f"max({c}::DOUBLE) AS mx{i}",
            f"sum(CAST({c} AS DECIMAL(18,4))) AS s{i}",
        ]
        arms.append(f"""SELECT '{c}' AS "column",
       CAST(n AS BIGINT) AS n_rows,
       CAST(n - k{i} AS BIGINT) AS n_null,
       CAST(d{i} AS BIGINT) AS n_distinct,
       round(mn{i}, 4) AS min_val, round(mx{i}, 4) AS max_val,
       CASE WHEN k{i} > 0 THEN round(s{i}::DOUBLE / k{i}, 4) END AS mean
FROM w""")
    return ("WITH w AS (SELECT " + ", ".join(sel)
            + " FROM events)\n" + "\nUNION ALL\n".join(arms))


SQL_DESCRIBE = _describe_sql()


_Z_BITS = 8
_Z_FILES = 64


def q_zorder_layout(spark, sf_dir):
    """Z-order layout planning (operators/bucketing.py::zvalue +
    zorder_layout_stats): orders quantized on (price div 2048,
    orderdate div 10 days), Morton-interleaved, split into 64 equal
    z-range files, and each file's (x, y) bounding box + row count
    reported — exactly the min/max footer statistics a scan planner
    prunes on. The point of z-ordering: every file's box is small in
    BOTH dimensions, so predicates on EITHER column prune, where a
    plain sort serves only its leading column. Layout is a pure
    function of the data (no sampled range boundaries), so engines
    and retries agree bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    d = o.select(
        F.expr("cast(floor(o_totalprice / 2048) as bigint)").alias("xq"),
        F.expr("cast(datediff(cast(o_orderdate as date), "
               "date'1995-01-01') as bigint) div 10").alias("yq"),
    )
    from twitter_to_sqlite_spark.operators import bucketing

    return bucketing.zorder_layout_stats(
        d, "xq", "yq", bits=_Z_BITS, n_files=_Z_FILES)


def _zorder_sql() -> str:
    z = " + ".join(
        f"(((x >> {i}) & 1) << {2 * i}) + (((y >> {i}) & 1) << {2 * i + 1})"
        for i in range(_Z_BITS))
    span = 1 << (2 * _Z_BITS)
    return f"""
WITH d AS (
  SELECT CAST(floor(o_totalprice / 2048) AS BIGINT) AS x,
         CAST(datediff('day', DATE '1995-01-01',
                       CAST(o_orderdate AS DATE)) AS BIGINT) // 10 AS y
  FROM orders
),
zd AS (SELECT x, y, {z} AS z FROM d)
SELECT (z * {_Z_FILES}) // {span} AS file_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       min(x) AS x_min, max(x) AS x_max,
       min(y) AS y_min, max(y) AS y_max
FROM zd GROUP BY 1
"""


SQL_ZORDER_LAYOUT = _zorder_sql()


_LPA_ROUNDS = 4


def q_lpa_communities(spark, sf_dir):
    """Label-propagation communities (functions/graph.py::
    label_propagation, 4 synchronous rounds, self-vote, min-label
    ties) over the same md5-sampled 5% trade graph the k-core peel
    uses — the density-blind complement: k-core finds the cohesive
    core, LPA partitions everything into communities. Deterministic
    by construction (GraphX's hash tie-break can never oracle-match);
    the oracle replays the vote/argmax trajectory round by round."""
    pairs = _trade_pairs(spark, sf_dir).filter(
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("c"), F.col("s"))),
                1, 15),
            16, 10,
        ).cast("long") % _KCORE_MOD == 0
    )
    edges = pairs.select(
        F.col("c").alias("src"), F.col("s").alias("dst")
    ).unionByName(pairs.select(F.col("s").alias("src"),
                               F.col("c").alias("dst")))
    return graph.label_propagation(edges, rounds=_LPA_ROUNDS)


def _lpa_sql() -> str:
    """Unrolled LPA replay: per round a vote CTE (neighbor labels +
    self-vote) and an argmax CTE (count DESC, label ASC). Materialized
    — each round's labels are referenced twice."""
    ctes = [f"""pairs AS (
  SELECT DISTINCT o_custkey AS c, l_suppkey + {_PR_SUPP_OFFSET} AS s
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
samp AS (
  SELECT c, s FROM pairs
  WHERE ('0x' || substring(md5(c::VARCHAR || ':' || s::VARCHAR), 1, 15))
          ::BIGINT % {_KCORE_MOD} = 0
),
e AS MATERIALIZED (
  SELECT c AS src, s AS dst FROM samp
  UNION ALL
  SELECT s AS src, c AS dst FROM samp
),
l0 AS MATERIALIZED (
  SELECT node, node AS label FROM (
    SELECT src AS node FROM e UNION SELECT dst FROM e)
)"""]
    for i in range(1, _LPA_ROUNDS + 1):
        ctes.append(f"""v{i} AS (
  SELECT node, label, count(*) AS n FROM (
    SELECT e.dst AS node, l.label FROM e
    JOIN l{i - 1} l ON l.node = e.src
    UNION ALL
    SELECT node, label FROM l{i - 1}
  ) GROUP BY node, label
),
l{i} AS MATERIALIZED (
  SELECT node, label FROM (
    SELECT node, label, row_number() OVER (
      PARTITION BY node ORDER BY n DESC, label ASC) AS rn
    FROM v{i}
  ) WHERE rn = 1
)""")
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS node_id, label AS community "
          f"FROM l{_LPA_ROUNDS}"
    )


SQL_LPA_COMMUNITIES = _lpa_sql()


_BP_MINFRAC = 0.5


def q_boilerplate(spark, sf_dir):
    """Per-source boilerplate discovery (functions/dedup.py::
    boilerplate_stats): bigram shingles present in ≥50% of a source's
    documents are that source's chrome. The synthetic corpus has no
    real chrome (max within-source bigram df is ~32%), so the query
    plants a per-source footer on 60% of each source's docs — the
    planted-fixture device the dedup queries use — and the stats must
    find exactly it. Grouped document-frequency, no pair generation:
    the per-site cleaning pass corpus-global dedup can't express."""
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "source",
        F.when(
            F.col("doc_id") % 10 < 6,
            F.concat(F.col("text"), F.lit(" please accept "),
                     F.col("source"), F.lit(" cookie policy")),
        ).otherwise(F.col("text")).alias("text"),
    )
    return dedup.boilerplate_stats(
        d, "source", "doc_id", "text", k=2, min_frac=_BP_MINFRAC)


SQL_BOILERPLATE = f"""
WITH docs AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 10 < 6
              THEN text || ' please accept ' || source || ' cookie policy'
              ELSE text END AS text
  FROM documents
),
t AS (SELECT doc_id, source, {_SQL_TOKS} AS tk FROM docs),
sh AS (
  SELECT DISTINCT doc_id, source, unnest(
    list_transform(generate_series(1, greatest(len(tk) - 1, 1)),
                   i -> array_to_string(tk[i:i+1], ' '))) AS shingle
  FROM t
),
dfq AS (SELECT source, shingle, count(*) AS ndocs
        FROM sh GROUP BY 1, 2),
tot AS (SELECT source, count(*) AS n_docs FROM docs GROUP BY 1)
SELECT t.source,
       t.n_docs,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN d.ndocs >= {_BP_MINFRAC!r} * t.n_docs
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       round(sum(CASE WHEN d.ndocs >= {_BP_MINFRAC!r} * t.n_docs
                      THEN d.ndocs ELSE 0 END) / sum(d.ndocs), 6)
         AS boiler_occ_frac
FROM dfq d JOIN tot t USING (source)
GROUP BY t.source, t.n_docs
"""


_TOPK_SAMPLE_K = 64
_TOPK_TOP = 10


def q_sketch_topk(spark, sf_dir):
    """Deterministic heavy-hitters sketch (functions/sketch.py::
    sample_topk, k=64, top=10) on events.props — hot-key detection
    with bounded aggregate state: a bottom-k hash sample of the
    distinct prop domain (100 values at sf≥0.01, so genuinely
    sampled), exact counts of only the sampled values via a broadcast
    semi-join, top-10 by count. SpaceSaving merges are engine-specific
    and can never oracle-match; this sample is a pure function of the
    value set, so both engines pick the same rows."""
    e = _t(spark, sf_dir, "events")
    return sketch.sample_topk(e, "props",
                              k=_TOPK_SAMPLE_K, top=_TOPK_TOP)


SQL_SKETCH_TOPK = f"""
WITH v AS (SELECT props::VARCHAR AS value FROM events
           WHERE props IS NOT NULL),
samp AS (
  SELECT value FROM (SELECT DISTINCT value FROM v)
  ORDER BY ('0x' || substring(md5(value), 1, 15))::BIGINT, value
  LIMIT {_TOPK_SAMPLE_K}
),
counted AS (
  SELECT v.value, count(*)::BIGINT AS n_occ
  FROM v JOIN samp USING (value) GROUP BY v.value
)
SELECT value, n_occ,
       row_number() OVER (ORDER BY n_occ DESC, value) AS rank
FROM counted QUALIFY rank <= {_TOPK_TOP}
"""


def q_sketch_overlap(spark, sf_dir):
    """KMV overlap screening (sketch.kmv_overlap, k=64): estimate the
    Jaccard/intersection between the event-user key set and the order
    customer key set from two 64-hash sketches — the cheap 'how
    contaminated is A by B' probe run before a full decontamination
    join (true J = 0.1 on this data: users ⊂ customers)."""
    e = _t(spark, sf_dir, "events")
    o = _t(spark, sf_dir, "orders")
    return sketch.kmv_overlap(e, o, "user_id", "o_custkey", k=_KMV_K)


SQL_SKETCH_OVERLAP = f"""
WITH ka AS (
  SELECT ('0x' || substring(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
  ORDER BY h LIMIT {_KMV_K}
),
kb AS (
  SELECT ('0x' || substring(md5(o_custkey::VARCHAR), 1, 15))::BIGINT AS h
  FROM (SELECT DISTINCT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
  ORDER BY h LIMIT {_KMV_K}
),
uk AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb)
  ORDER BY h LIMIT {_KMV_K}
),
flagged AS (
  SELECT uk.h,
         (ka.h IS NOT NULL AND kb.h IS NOT NULL) AS in_both
  FROM uk
  LEFT JOIN ka ON ka.h = uk.h
  LEFT JOIN kb ON kb.h = uk.h
),
agg AS (
  SELECT count(*) AS n_kept,
         CAST(sum(in_both::BIGINT) AS BIGINT) AS n_both,
         max(h / 1152921504606846976.0) AS umax
  FROM flagged
)
SELECT CAST(n_kept AS BIGINT) AS n_kept, n_both,
       round(n_both / greatest(n_kept, 1), 4) AS jaccard_est,
       CAST(round(CASE WHEN n_kept < {_KMV_K} THEN n_kept::DOUBLE
                       ELSE {float(_KMV_K - 1)!r} / umax END, 0) AS BIGINT)
         AS union_est,
       CAST(round((n_both / greatest(n_kept, 1))
                  * CASE WHEN n_kept < {_KMV_K} THEN n_kept::DOUBLE
                         ELSE {float(_KMV_K - 1)!r} / umax END, 0) AS BIGINT)
         AS intersect_est
FROM agg
"""


def q_ann_sq8(spark, sf_dir):
    """SQ8 scalar-quantized ANN (similarity.sq8_topk): candidates
    ranked by int8-range quantized dot products (4× less memory than
    float32 at scale), top-10 rescored with exact cosine, top-3 kept —
    same output shape as ann_brute_force so ann_recall-style evals
    measure the quantization loss directly."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    return similarity.sq8_topk(e, q, k=3, candidates=10)


SQL_ANN_SQ8 = f"""
WITH qx AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a
            FROM embeddings WHERE vec_id < 5),
cx AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b
       FROM embeddings),
qq AS (SELECT query_id, a, sqrt(list_dot_product(a, a)) AS qn,
              greatest(list_max(list_transform(a, x -> abs(x))) / 127.0,
                       1e-30) AS qs
       FROM qx),
qq2 AS (SELECT query_id, a, qn, qs,
               list_transform(a, x -> round(x / qs, 0)) AS qa
        FROM qq),
cc AS (SELECT neighbor_id, b, sqrt(list_dot_product(b, b)) AS cn,
              greatest(list_max(list_transform(b, x -> abs(x))) / 127.0,
                       1e-30) AS cs
       FROM cx),
cc2 AS (SELECT neighbor_id, b, cn, cs,
               list_transform(b, x -> round(x / cs, 0)) AS ca
        FROM cc),
scored AS (
  SELECT query_id, neighbor_id, a, b,
         round(((list_dot_product(qa, ca) * qs) * cs) / (qn * cn), 4)
           AS approx
  FROM cc2, qq2 WHERE neighbor_id != query_id
),
cand AS (
  SELECT query_id, neighbor_id, a, b FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY approx DESC, neighbor_id) AS ar
    FROM scored
  ) WHERE ar <= 10
),
ranked AS (
  SELECT query_id, neighbor_id, {_SQL_COS} AS cosine,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY {_SQL_COS} DESC, neighbor_id) AS rank
  FROM cand
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
"""


# ANN tuning sweep: the actual index knobs, measured in one query so
# the recall/cost frontier is a committed artifact (VERDICT r4 #2).
_TUNE_K = 10
_TUNE_NQ = 20
_TUNE_LSH_BITS = {2: [0, 8], 4: [0, 8, 16, 24],
                  6: [0, 8, 16, 24, 32, 40]}
_TUNE_IVF_PROBES = [1, 2, 4]
_TUNE_SQ8_CANDS = [10, 20, 40]


def q_ann_tuning(spark, sf_dir):
    """Recall@10 sweep over the ANN tuning knobs, one row per setting:
    sign-LSH bits ∈ {2,4,6} (+ the 4-bit multiprobe-1 point), IVF
    n_probe ∈ {1,2,4} (shared cached k-means centroids — the same
    coarse quantizer every IVF query uses), SQ8 rescore depth ∈
    {10,20,40} — "measure, don't guess" as a committed artifact, not a
    single point.

    r10 optimization: FUSED. The 12 per-leg plans (each its own
    corpus×queries pair build, top-k window, recall semi-join and agg
    — 140 Exchange / 40 SortMergeJoin nodes total) collapse into ONE
    pair set: every leg's candidate rule is a per-pair predicate
    (bucket equality per bits setting, probe-array membership by
    position for every n_probe, SQ8 approx-rank prefix for every
    rescore depth), so one query_id-keyed exchange carries the exact
    rank AND the SQ8 candidate rank, one (method, setting, query_id)
    window ranks every leg, and hits need NO join at all — a pair is
    a hit iff its exact rank is also ≤ k (guide §2.4: operations
    keyed the same way share one exchange). Leg semantics are pinned
    to the stand-alone operators by sharing their definitions
    (similarity._sq8_side / sign_bucket / _probe_buckets /
    _probe_cells_arr / ivf_assign) and by
    tests/test_retrieval_fusion.py::test_ann_tuning_matches_per_leg_operators,
    which re-derives every leg with lsh_bucketed_topk / ivf_topk /
    sq8_topk + recall_at_k and compares row sets.

    avg_recall is computed from integer hit counts
    (round(Σ n_hits / (k·n_queries), 4)) so the average is exact and
    engine-stable. Scale: one queries-broadcast × corpus-scan, one
    corpus-sized exchange, then everything is |queries|·k-bounded."""
    e = _t(spark, sf_dir, "embeddings").localCheckpoint(eager=False)
    q = e.filter(F.col("vec_id") < _TUNE_NQ)
    cents = _ivf_centroids(spark, sf_dir)
    max_probe = max(_TUNE_IVF_PROBES)

    # Corpus / query sides: one projection each carrying EVERY leg's
    # probe metadata (SQ8 codes+scale, per-bits LSH buckets, IVF cell
    # / probe array). _sq8_side also yields the exact vector + norm.
    c = similarity._sq8_side(
        similarity._spread(e, "vec_id"), "vec_id", "embedding",
        "neighbor_id", "__cv", "__cn", "__cq", "__cs")
    qs = similarity._sq8_side(q, "vec_id", "embedding",
                              "query_id", "__qv", "__qn", "__qq", "__qs")
    for bits, dims in _TUNE_LSH_BITS.items():
        c = c.withColumn(f"__cb{bits}", similarity.sign_bucket("__cv", dims))
        qs = qs.withColumn(f"__qb{bits}",
                           similarity.sign_bucket("__qv", dims))
    c = c.withColumn("__cell", similarity.ivf_assign(F.col("__cv"), cents))
    qs = qs.withColumn("__mp4", F.array_distinct(similarity._probe_buckets(
        F.col("__qb4"), len(_TUNE_LSH_BITS[4]), 1)))
    qs = qs.withColumn("__probes", similarity._probe_cells_arr(
        F.col("__qv"), cents, max_probe))

    pairs = c.crossJoin(F.broadcast(qs)).filter(
        F.col("neighbor_id") != F.col("query_id"))
    # Same expressions as _score_and_rank / sq8_topk, rounded the same.
    cos = F.round(
        similarity._dot(F.col("__qv"), F.col("__cv"))
        / (F.col("__qn") * F.col("__cn")), 4)
    sq8_approx = F.round(
        (similarity._dot(F.col("__qq"), F.col("__cq"))
         * F.col("__qs")) * F.col("__cs")
        / (F.col("__qn") * F.col("__cn")), 4)
    ivf_pos = F.array_position(F.col("__probes"), F.col("__cell"))
    slim = pairs.select(
        "query_id", "neighbor_id",
        cos.alias("cosine"), sq8_approx.alias("__approx"),
        ivf_pos.alias("__ivf_pos"),
        *[(F.col(f"__cb{b}") == F.col(f"__qb{b}")).alias(f"__lsh{b}")
          for b in _TUNE_LSH_BITS],
        F.array_contains(F.col("__mp4"), F.col("__cb4")).alias("__mp"),
    )
    wq = Window.partitionBy("query_id")
    ranked = (
        slim
        .withColumn("__xr", F.row_number().over(
            wq.orderBy(F.col("cosine").desc(),
                       F.col("neighbor_id").asc())))
        .withColumn("__sqr", F.row_number().over(
            wq.orderBy(F.col("__approx").desc(),
                       F.col("neighbor_id").asc())))
    )

    leg_specs = (
        [("lsh", f"bits={b}", F.col(f"__lsh{b}")) for b in _TUNE_LSH_BITS]
        + [("lsh_multiprobe", "bits=4,probe=1", F.col("__mp"))]
        + [("ivf", f"n_probe={p}",
            (F.col("__ivf_pos") >= 1) & (F.col("__ivf_pos") <= p))
           for p in _TUNE_IVF_PROBES]
        + [("sq8", f"cands={cd}", F.col("__sqr") <= cd)
           for cd in _TUNE_SQ8_CANDS]
    )
    legs = F.array(*[
        F.struct(F.lit(m).alias("method"), F.lit(s).alias("setting"),
                 pred.alias("__m"))
        for m, s, pred in leg_specs])
    member = (
        ranked.select("query_id", "neighbor_id", "cosine", "__xr",
                      F.explode(legs).alias("L"))
        .filter(F.col("L.__m"))
        .select("query_id", "neighbor_id", "cosine", "__xr",
                F.col("L.method").alias("method"),
                F.col("L.setting").alias("setting"))
    )
    wl = Window.partitionBy("method", "setting", "query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    hits = (
        member.withColumn("__ar", F.row_number().over(wl))
        .filter(F.col("__ar") <= _TUNE_K)
        .groupBy("method", "setting")
        .agg(F.sum(F.when(F.col("__xr") <= _TUNE_K, 1).otherwise(0))
             .alias("__h"))
    )
    # n_queries = #queries in the exact leg — identical for every leg
    # (a leg that misses a query still averages over it, recall 0).
    nq = ranked.filter(F.col("__xr") <= _TUNE_K).agg(
        F.countDistinct("query_id").alias("__n"))
    # Left-join the literal leg grid so a leg with ZERO matching pairs
    # still yields its row (hit count 0), exactly as the per-leg aggs did.
    grid = spark.createDataFrame(
        [(m, s) for m, s, _ in leg_specs], "method string, setting string")
    return (
        grid.join(hits, ["method", "setting"], "left")
        .crossJoin(F.broadcast(nq))
        .select(
            "method", "setting",
            F.col("__n").cast("long").alias("n_queries"),
            F.round(F.coalesce(F.col("__h"), F.lit(0))
                    / (F.lit(_TUNE_K) * F.col("__n")), 4)
            .alias("avg_recall"),
        )
    )


def _ann_tuning_sql() -> str:
    """DuckDB twin of the full sweep: every approximate leg replayed
    relationally (bucket CASE sums, xor multiprobe, the shared k-means
    CTE chain with per-query probe ranking, SQ8 quantize+rescore),
    each reduced to its hit count against the shared exact top-k."""
    k, nq = _TUNE_K, _TUNE_NQ
    topk = (
        "SELECT query_id, neighbor_id FROM ("
        "SELECT query_id, neighbor_id, row_number() OVER ("
        "PARTITION BY query_id ORDER BY {cos} DESC, neighbor_id) AS r "
        "FROM {src} WHERE neighbor_id != query_id) WHERE r <= " + str(k)
    )
    ctes = [
        f"q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a "
        f"FROM embeddings WHERE vec_id < {nq})",
        "c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b "
        "FROM embeddings)",
        f"ex AS ({topk.format(cos=_SQL_COS, src='c, q')})",
    ]
    legs: list[tuple[str, str, str]] = []  # (method, setting, cte)
    # --- LSH bit sweep ---
    for bits, dims in _TUNE_LSH_BITS.items():
        name = f"ap_lsh{bits}"
        ctes.append(
            f"qb{bits} AS (SELECT query_id, a, "
            f"{_sql_bucket('a', dims)} AS bucket FROM q)")
        ctes.append(
            f"cb{bits} AS (SELECT neighbor_id, b, "
            f"{_sql_bucket('b', dims)} AS bucket FROM c)")
        ctes.append(f"{name} AS ({topk.format(cos=_SQL_COS, src=f'cb{bits} JOIN qb{bits} USING (bucket)')})")
        legs.append(("lsh", f"bits={bits}", name))
    # --- 4-bit multiprobe radius 1: bucket XOR each single-bit mask ---
    masks = ", ".join(f"({m})" for m in [0, 1, 2, 4, 8])
    ctes.append(
        "qp4 AS (SELECT query_id, a, xor(bucket, m) AS bucket "
        "FROM qb4, (VALUES " + masks + ") masks(m))")
    ctes.append(
        f"ap_mp AS ({topk.format(cos=_SQL_COS, src='cb4 JOIN qp4 USING (bucket)')})")
    legs.append(("lsh_multiprobe", "bits=4,probe=1", "ap_mp"))
    # --- IVF probe sweep over the shared k-means chain ---
    km_ctes, final = _kmeans_ctes(_IVF_ITERS, _IVF_SAMPLE_MOD)
    ctes.append(km_ctes)
    ctes.append(
        f"ca AS (SELECT neighbor_id, b, (SELECT cell FROM {final} "
        "ORDER BY list_dot_product(c.b, cv) DESC, cell LIMIT 1) AS cell "
        "FROM c)")
    # probe ranking mirrors similarity._probe_cells: reversed
    # array_sort of (score, cell) structs == score DESC, cell DESC
    ctes.append(
        "qr AS (SELECT query_id, a, cell, row_number() OVER ("
        "PARTITION BY query_id ORDER BY s DESC, cell DESC) AS pr FROM ("
        f"SELECT q.query_id, q.a, f.cell, "
        f"list_dot_product(q.a, f.cv) AS s FROM q, {final} f))")
    for p in _TUNE_IVF_PROBES:
        name = f"ap_ivf{p}"
        src = f"ca JOIN (SELECT query_id, a, cell FROM qr WHERE pr <= {p}) qp USING (cell)"
        ctes.append(f"{name} AS ({topk.format(cos=_SQL_COS, src=src)})")
        legs.append(("ivf", f"n_probe={p}", name))
    # --- SQ8 rescore-depth sweep (quantize once, one cand CTE per C) ---
    ctes.append(
        "qq AS (SELECT query_id, a, sqrt(list_dot_product(a, a)) AS qn, "
        "greatest(list_max(list_transform(a, x -> abs(x))) / 127.0, "
        "1e-30) AS qs FROM q)")
    ctes.append(
        "qq2 AS (SELECT query_id, a, qn, qs, "
        "list_transform(a, x -> round(x / qs, 0)) AS qa FROM qq)")
    ctes.append(
        "cc AS (SELECT neighbor_id, b, sqrt(list_dot_product(b, b)) AS cn, "
        "greatest(list_max(list_transform(b, x -> abs(x))) / 127.0, "
        "1e-30) AS cs FROM c)")
    ctes.append(
        "cc2 AS (SELECT neighbor_id, b, cn, cs, "
        "list_transform(b, x -> round(x / cs, 0)) AS ca FROM cc)")
    ctes.append(
        "sq_scored AS (SELECT query_id, neighbor_id, a, b, "
        "round(((list_dot_product(qa, ca) * qs) * cs) / (qn * cn), 4) "
        "AS approx FROM cc2, qq2 WHERE neighbor_id != query_id)")
    for cands in _TUNE_SQ8_CANDS:
        name = f"ap_sq{cands}"
        ctes.append(
            f"sq_cand{cands} AS (SELECT query_id, neighbor_id, a, b "
            "FROM (SELECT *, row_number() OVER (PARTITION BY query_id "
            "ORDER BY approx DESC, neighbor_id) AS ar FROM sq_scored) "
            f"WHERE ar <= {cands})")
        ctes.append(
            f"{name} AS ({topk.format(cos=_SQL_COS, src=f'sq_cand{cands}')})")
        legs.append(("sq8", f"cands={cands}", name))
    selects = []
    for method, setting, name in legs:
        selects.append(
            f"SELECT '{method}' AS method, '{setting}' AS setting, "
            "(SELECT count(DISTINCT query_id) FROM ex)::BIGINT "
            "AS n_queries, "
            f"round((SELECT count(*) FROM {name} "
            "JOIN ex USING (query_id, neighbor_id)) "
            f"/ ({k}.0 * (SELECT count(DISTINCT query_id) FROM ex)), 4) "
            "AS avg_recall")
    return "WITH " + ",\n".join(ctes) + "\n" \
        + "\nUNION ALL\n".join(selects)


SQL_ANN_TUNING = _ann_tuning_sql()




_WS_RES = 1_000_000


_SQL_STOPLIST = "[" + ", ".join(f"'{s}'" for s in text.EN_STOPWORDS) + "]"


_WS_K = 100


SQL_WEIGHTED_SAMPLE = f"""
WITH f AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS t FROM documents
),
m AS (
  SELECT doc_id, lang,
    len(t)::DOUBLE AS n_words,
    len(list_filter(t, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE AS n_stop,
    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE AS n_punct,
    len(list_distinct(t))::DOUBLE AS n_distinct,
    length(text)::DOUBLE AS n_chars
  FROM f
),
q AS (
  SELECT doc_id, lang,
    round(least((n_stop / greatest(n_words, 1.0)) * 2, 1.0) * 0.4
          + (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5, 1.0)) * 0.2
          + (1.0 - (1.0 - n_distinct / greatest(n_words, 1.0))) * 0.4, 4) AS quality
  FROM m
),
keyed AS (
  SELECT doc_id, lang, quality,
         round(pow(
           (('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT
            % {_WS_RES} + 1.0) / {float(_WS_RES)!r},
           1.0 / quality), 12) AS sample_key
  FROM q WHERE quality > 0
)
SELECT doc_id, lang, quality, sample_key
FROM keyed ORDER BY sample_key DESC, doc_id LIMIT {_WS_K}
"""


__all__ = list(_prev.__all__) + [
    "_SQL_COS",
    "q_ann_brute_force",
    "SQL_ANN_BRUTE_FORCE",
    "_LSH_DIMS",
    "_sql_bucket",
    "q_ann_lsh",
    "SQL_ANN_LSH",
    "_infra_tmpdir",
    "_ann_index",
    "q_ann_lsh_indexed",
    "SQL_ANN_LSH_INDEXED",
    "_IVF_CELLS",
    "_EMB_DIM",
    "_IVF_ITERS",
    "_IVF_SAMPLE_MOD",
    "_ivf_centroids",
    "q_ann_ivf",
    "_kmeans_ctes",
    "_ivf_sql",
    "SQL_ANN_IVF",
    "q_ann_ivf_indexed",
    "SQL_ANN_IVF_INDEXED",
    "q_embed_near_dup",
    "SQL_EMBED_NEAR_DUP",
    "_embed_base",
    "_cell_pairs_build",
    "_cell_pairs",
    "q_semdedup",
    "_semdedup_sql",
    "SQL_SEMDEDUP",
    "q_ann_recall",
    "SQL_ANN_RECALL",
    "q_hybrid_search",
    "SQL_HYBRID_SEARCH",
    "q_dup_ngram_frac",
    "SQL_DUP_NGRAM_FRAC",
    "_PR_ITERS",
    "_PR_DAMPING",
    "_PR_SUPP_OFFSET",
    "q_pagerank",
    "_pagerank_sql",
    "_trade_pairs_build",
    "_trade_pairs",
    "SQL_PAGERANK",
    "_KMV_K",
    "_KMV_COLS",
    "q_sketch_profile",
    "_kmv_sql",
    "SQL_SKETCH_PROFILE",
    "q_data_quality",
    "SQL_DATA_QUALITY",
    "_DRIFT_COLS",
    "_DRIFT_CUTOFF",
    "_DRIFT_TOL",
    "_drift_baseline",
    "q_data_quality_drift",
    "SQL_DATA_QUALITY_DRIFT",
    "q_scd2_history",
    "SQL_SCD2_HISTORY",
    "q_sketch_profile_by",
    "SQL_SKETCH_PROFILE_BY",
    "q_sketch_merge",
    "SQL_SKETCH_MERGE",
    "_EWMA_ALPHA",
    "_EWMA_W",
    "q_ewma",
    "SQL_EWMA",
    "_WINSOR_Q",
    "_WINSOR_K",
    "q_winsorize",
    "SQL_WINSORIZE",
    "q_skew_join_salted",
    "SQL_SKEW_JOIN_SALTED",
    "_WSB_K",
    "q_weighted_sample_by",
    "_weighted_sample_by_sql",
    "q_unpivot",
    "SQL_UNPIVOT",
    "_SLIDE_STEP_US",
    "_SLIDE_N",
    "q_sliding_counts",
    "SQL_SLIDING_COUNTS",
    "q_anomaly_zscore",
    "SQL_ANOMALY_ZSCORE",
    "q_snapshot_diff",
    "SQL_SNAPSHOT_DIFF",
    "q_apply_changelog",
    "SQL_APPLY_CHANGELOG",
    "q_event_paths",
    "SQL_EVENT_PATHS",
    "_CORR_PAIRS",
    "q_corr_matrix",
    "_corr_sql",
    "SQL_CORR_MATRIX",
    "_AB_ZCRIT",
    "q_ab_test",
    "SQL_AB_TEST",
    "q_incremental_agg",
    "SQL_INCREMENTAL_AGG",
    "_EQD_QS",
    "q_equidepth_histogram",
    "SQL_EQUIDEPTH_HISTOGRAM",
    "_BLOOM_PRICE",
    "q_bloom_prune",
    "SQL_BLOOM_PRUNE",
    "_CONT_OFFSET",
    "_CONT_FRAC",
    "_CONT_TAU",
    "_CONT_MAX_DF",
    "q_containment",
    "SQL_CONTAINMENT",
    "_KCORE_K",
    "_KCORE_ROUNDS",
    "_KCORE_MOD",
    "q_kcore",
    "_kcore_sql",
    "SQL_KCORE",
    "q_key_skew",
    "_key_skew_sql",
    "SQL_KEY_SKEW",
    "_LATE_BUCKETS_US",
    "q_lateness_profile",
    "SQL_LATENESS_PROFILE",
    "q_chi_square",
    "SQL_CHI_SQUARE",
    "_WSE_K",
    "q_window_sketch_error",
    "SQL_WINDOW_SKETCH_ERROR",
    "_DR_TAU",
    "q_dedup_recall",
    "SQL_DEDUP_RECALL",
    "_ATTR_WINDOW_S",
    "q_attribution",
    "SQL_ATTRIBUTION",
    "q_grouped_trend",
    "SQL_GROUPED_TREND",
    "_DESC_COLS",
    "q_describe",
    "_describe_sql",
    "SQL_DESCRIBE",
    "_Z_BITS",
    "_Z_FILES",
    "q_zorder_layout",
    "_zorder_sql",
    "SQL_ZORDER_LAYOUT",
    "_LPA_ROUNDS",
    "q_lpa_communities",
    "_lpa_sql",
    "SQL_LPA_COMMUNITIES",
    "_BP_MINFRAC",
    "q_boilerplate",
    "SQL_BOILERPLATE",
    "_TOPK_SAMPLE_K",
    "_TOPK_TOP",
    "q_sketch_topk",
    "SQL_SKETCH_TOPK",
    "q_sketch_overlap",
    "SQL_SKETCH_OVERLAP",
    "q_ann_sq8",
    "SQL_ANN_SQ8",
    "_TUNE_K",
    "_TUNE_NQ",
    "_TUNE_LSH_BITS",
    "_TUNE_IVF_PROBES",
    "_TUNE_SQ8_CANDS",
    "q_ann_tuning",
    "_ann_tuning_sql",
    "SQL_ANN_TUNING",
    "_WS_RES",
    "_SQL_STOPLIST",
    "_WS_K",
    "SQL_WEIGHTED_SAMPLE",
]
