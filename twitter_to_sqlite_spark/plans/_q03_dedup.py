"""Catalog chunk 3: dedup family (exact/minhash/simhash/jaccard) + clear_caches."""

from __future__ import annotations

from twitter_to_sqlite_spark.plans import _q02_search_events as _prev
from twitter_to_sqlite_spark.plans._q02_search_events import *  # noqa: F401,F403

# =====================================================================
# LLM-data-pipeline operators: dedup
# =====================================================================

_PLANT_OFFSET = 1_000_000


def _docs_with_planted_dups(spark, sf_dir, n: int = 20) -> DataFrame:
    """documents ∪ near-copies of the first n docs (one appended token)
    so near-dup detectors have guaranteed positives to find."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return d.unionByName(planted)


_SQL_DOCS_PLANTED = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id, text || ' zzz' AS text
  FROM documents WHERE doc_id < 20
"""

_SQL_TOKS = r"list_filter(string_split_regex(lower(text), '\W+'), x -> x <> '')"

_SQL_SHINGLES = f"""
  SELECT DISTINCT id, unnest(
    list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id AS id, {_SQL_TOKS} AS t FROM docs)
"""


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (training-data pipeline op;
    reference analogue hash_id, archive.py:248)."""
    d = _t(spark, sf_dir, "documents")
    return dedup.exact_dedup(d, "doc_id", "text")


SQL_DEDUP_EXACT = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY md5(text)
"""


_JACCARD_MAX_DF = 20


def q_dedup_jaccard(spark, sf_dir):
    """N-gram Jaccard near-dup pairs over documents + planted dups.

    Stop-shingles (df > 20 docs) are dropped and Jaccard is computed
    over the filtered sets — near-dups still score ≈1 on their shared
    rare shingles while ubiquitous shingles stop inflating both the
    Σ df² pair-generation cost and the similarity of unrelated docs.
    The oracle applies the identical filter.

    r10: consumes the shared `_build:jaccard_pairs` frame (built at
    the loosest catalog τ) filtered to this query's τ=0.5 — the
    threshold is a pure post-filter on the rounded jaccard column, so
    the rows are identical to building at τ=0.5 directly."""
    return _jaccard_pairs(spark, sf_dir).filter(
        F.col("jaccard") >= F.lit(0.5))


SQL_DEDUP_JACCARD = f"""
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
)
SELECT id_a, id_b, inter, sa.sz AS size_a, sb.sz AS size_b,
       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sz sa ON sa.id = id_a
JOIN sz sb ON sb.id = id_b
WHERE round(inter / (sa.sz + sb.sz - inter), 6) >= 0.5
"""


_MINHASH_N = 16
_MINHASH_BANDS = 4


# One MinHash run per (session, sf_dir) per process: the pairs feed
# three catalog queries (pairs / components / keep_best) that would
# otherwise each recompute the identical signature+band pipeline —
# the same build-once-probe-many shape as the IVF centroids and the
# classifier weights (_LR_CACHE). localCheckpoint(eager=False)
# materializes on first action and truncates lineage, so reuses are
# a cached-block scan, not a re-derivation.
_MINHASH_PAIRS_CACHE: dict[tuple, DataFrame] = {}

# r10 (guide §1.2 step 1 — don't compute things twice): the exact
# k-gram Jaccard pairs frame over documents + planted dups was built
# independently by FOUR queries (dedup_jaccard τ=0.5, dedup_recall's
# truth leg τ=0.5, dedup_sweep τ=0.3, lsh_planner τ=0.3) — the same
# shingle → df-filter → in-bucket pair → size-join pipeline each time,
# ~2s apiece at sf0.1. The threshold is a pure post-filter on the
# rounded jaccard column (functions/dedup.py ngram_jaccard_pairs,
# non-prefix path), so ONE frame at the loosest τ anyone uses serves
# all four exactly: consumers at a tighter τ filter `jaccard >= τ`,
# which is row-identical to building at that τ. Billed per bench pass
# as `_build:jaccard_pairs`, same convention as _build:minhash_pairs.
_JPAIRS_TAU = 0.3  # == min(_SWEEP_TAUS); asserted in _q06
_JACCARD_PAIRS_CACHE: dict[tuple, DataFrame] = {}

# r11 (VERDICT r10 'Next round' #4): semdedup and the knn_graph build
# both generate and cosine-score the identical Σ cell² in-cell pair
# set over the base embeddings + shared IVF centroids — at the sf1
# probe tier the two pair passes were 45.7s + 32.8s, the two largest
# entries in the catalog. ONE cell_scored_pairs checkpoint now serves
# both (builder `_cell_pairs` in plans/_q04_analytics.py next to
# q_semdedup), billed per pass as `_build:cell_pairs`.
_CELL_PAIRS_CACHE: dict[tuple, DataFrame] = {}

# r11: retrieval_eval and bm25_tuning share one checkpointed
# `_bm25_eval_front` scored frame over the shared document index
# (builder `_bm25_front` in plans/_q07_quantized_drift.py next to
# _RETEVAL_QS; the index cache `_BM25_IDX_CACHE` lives in
# plans/_q02_search_events.py next to its six consumers). Billed per
# bench pass as `_build:bm25_front` / `_build:bm25_index`.
_BM25_FRONT_CACHE: dict[tuple, tuple] = {}

# r10: the distinct customer↔supplier trade pairs (orders ⋈ lineitem,
# supplier ids offset) are the edge source for THREE graph queries
# (pagerank full; kcore and lpa_communities on the same md5-sampled
# subset). Built once per (session, sf_dir), billed per bench pass as
# `_build:trade_pairs`; builder lives in plans/_q04_analytics.py next
# to its constants.
_TRADE_PAIRS_CACHE: dict[tuple, DataFrame] = {}

# r10: dedup_simhash and simhash_sweep build the IDENTICAL SimHash
# pairs frame (same bits/bands/max_hamming over docs + planted dups);
# one build per (session, sf_dir), billed as `_build:simhash_pairs`.
_SIMHASH_PAIRS_CACHE: dict[tuple, DataFrame] = {}

# r10: lm_bigram_score, perplexity_buckets and perplexity_buckets_dist
# each scored the whole corpus under the corpus bigram LM — the same
# (doc_id, n_bigrams, avg_logp) frame three times. One build, billed
# as `_build:lm_scores`; builder in plans/_q05_text_multimodal.py.
_LM_SCORE_CACHE: dict[tuple, DataFrame] = {}


def _doc_shingles_build(spark, sf_dir) -> DataFrame:
    """The raw (uncached) distinct (id, shingle) frame of the BASE
    document corpus at k=3 — the tokenize + id-window-lead + distinct
    pass shared by every k=3 shingle consumer. Plan tests inspect THIS
    (the cached form explains as a Scan ExistingRDD checkpoint)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.shingles(dedup.spread(d), "doc_id", "text", 3)


def _doc_shingles(spark, sf_dir) -> DataFrame:
    """Shared (session, sf_dir)-cached base-corpus shingle frame —
    billed per bench pass as `_build:doc_shingles`. Shingling is
    per-document, so consumers over planted/excerpt unions attach
    their extra docs' shingles with a disjoint-id union, and
    split-corpus consumers (novelty) filter on id — both row-identical
    to shingling their composed corpus directly."""
    key = (spark, sf_dir)
    if key not in _DOC_SHINGLES_CACHE:
        _DOC_SHINGLES_CACHE[key] = _doc_shingles_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _DOC_SHINGLES_CACHE[key]


def _planted_dup_shingles(spark, sf_dir, n: int = 20) -> DataFrame:
    """Shingles of ONLY the planted near-copies from
    _docs_with_planted_dups (n docs, ' zzz' appended so their shingle
    sets differ from their sources') — the tiny side of the shared
    shingle union."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < n).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    return dedup.shingles(planted, "doc_id", "text", 3)


def _jaccard_pairs_build(spark, sf_dir) -> DataFrame:
    """The raw (uncached) exact-Jaccard pairs pipeline at the loosest
    catalog threshold — plan tests inspect THIS (the cached form
    explains as a Scan ExistingRDD checkpoint). Consumes the shared
    base-corpus shingle frame (r10): shingles(docs ∪ planted) ≡
    shingles(docs) ∪ shingles(planted), ids disjoint."""
    d = _docs_with_planted_dups(spark, sf_dir)
    sh = _doc_shingles(spark, sf_dir).unionByName(
        _planted_dup_shingles(spark, sf_dir))
    return dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", k=3,
        threshold=_JPAIRS_TAU, max_df=_JACCARD_MAX_DF, shingles_df=sh)


def _jaccard_pairs(spark, sf_dir) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _JACCARD_PAIRS_CACHE:
        _JACCARD_PAIRS_CACHE[key] = _jaccard_pairs_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _JACCARD_PAIRS_CACHE[key]


def clear_caches(include_infra: bool = False) -> None:
    """Drop process-level derived-data caches (bench.py calls this at
    the start of every timing pass so a 'cached' query is re-measured
    as a true build, not a checkpoint-block scan).

    ``include_infra=True`` additionally drops the build-once-probe-many
    infrastructure caches (materialized ANN/minhash indexes, IVF
    centroids, drift baseline, classifier weights) so index BUILD cost
    can be measured deliberately — by default those persist for the
    process lifetime because the consuming queries are designed to
    measure the probe path (VERDICT r5 'What's wrong' #2)."""
    _BM25_IDX_CACHE.clear()
    _BM25_FRONT_CACHE.clear()
    _CELL_PAIRS_CACHE.clear()
    _MINHASH_PAIRS_CACHE.clear()
    _JACCARD_PAIRS_CACHE.clear()
    _TRADE_PAIRS_CACHE.clear()
    _SIMHASH_PAIRS_CACHE.clear()
    _LM_SCORE_CACHE.clear()
    _SPAN_CACHE.clear()
    _DUP_POS_CACHE.clear()
    _DOC_SHINGLES_CACHE.clear()
    _KNNG_CACHE.clear()
    _DRIFT_HISTS_CACHE.clear()
    if include_infra:
        _ANN_INDEX_CACHE.clear()
        _CENTROID_CACHE.clear()
        _DRIFT_BASELINE_CACHE.clear()
        _LR_CACHE.clear()
        _BPE_CACHE.clear()
        _SBA_ENGINE_CACHE.clear()
        _ANN_MAINT_CACHE.clear()


def _minhash_pairs_build(spark, sf_dir) -> DataFrame:
    """The raw (uncached) pairs pipeline — plan tests inspect THIS
    (the cached form explains as a Scan ExistingRDD checkpoint)."""
    d = _docs_with_planted_dups(spark, sf_dir)
    return dedup.minhash_lsh_pairs(
        d, "doc_id", "text", k=3,
        num_hashes=_MINHASH_N, bands=_MINHASH_BANDS,
    )


def _minhash_pairs(spark, sf_dir) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _MINHASH_PAIRS_CACHE:
        _MINHASH_PAIRS_CACHE[key] = _minhash_pairs_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _MINHASH_PAIRS_CACHE[key]


def q_dedup_minhash(spark, sf_dir):
    """MinHash + banded LSH candidate pairs (b=4, r=4 → ~0.71 Jaccard
    knee) over documents + planted dups."""
    return _minhash_pairs(spark, sf_dir)


_R = _MINHASH_N // _MINHASH_BANDS

# CTE body shared by the pairs query and the connected-components
# query (which wraps the same pairs in a recursive closure).
_SQL_MINHASH_CTES = f"""docs AS ({_SQL_DOCS_PLANTED}),
sh AS ({_SQL_SHINGLES}),
mh AS (
  SELECT id, seed,
         min(('0x' || substring(md5(seed::VARCHAR || '|' || shingle), 1, 15))::BIGINT) AS v
  FROM sh, range({_MINHASH_N}) s(seed)
  GROUP BY id, seed
),
bands AS (
  SELECT id, seed // {_R} AS band,
         md5(string_agg(v::VARCHAR, ',' ORDER BY seed)) AS bh
  FROM mh GROUP BY id, seed // {_R}
),
mh_pairs AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.id < b.id
)"""

SQL_DEDUP_MINHASH = f"""
WITH {_SQL_MINHASH_CTES}
SELECT id_a, id_b FROM mh_pairs
"""


def q_dedup_components(spark, sf_dir):
    """Connected components over the MinHash near-dup pairs: transitive
    closure into keep-one-per-cluster groups (min doc id = component
    label), by iterative min-label propagation. The oracle closes the
    same pairs with a recursive CTE."""
    pairs = _minhash_pairs(spark, sf_dir)
    return dedup.near_dup_components(pairs).withColumnRenamed("id", "doc_id")


SQL_DEDUP_COMPONENTS = f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM mh_pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM mh_pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, component) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, w.component FROM walk w JOIN edges e ON e.src = w.id
)
SELECT id AS doc_id, min(component) AS component FROM walk GROUP BY id
"""


# Split weights in bucket units (mod = Σ); insertion order fixes the
# contiguous bucket ranges, mirrored in the oracle CASE. Defined here
# (above its first import-time use in _split_leakage_sql); also used
# by q_dataset_split further down.
_SPLITS = {"train": 8, "val": 1, "test": 1}


def q_split_leakage(spark, sf_dir):
    """Train/eval LEAKAGE audit — the hygiene check a training
    pipeline must run after splitting: near-dup pairs (the shared
    MinHash pair frame) labeled with each side's hash-bucket split
    assignment, counted per split pair. A near-dup pair crossing the
    train/val boundary is exactly the contamination an exact-key split
    cannot see (the planted near-copies guarantee the audit has
    positives at every SF).

    Scale: the pairs frame is the already-bounded LSH output; the
    split labels are a shuffle-free CASE over the hash, joined onto
    ≤|pairs| rows — the audit costs nothing beyond the dedup sweep a
    pipeline already runs."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _docs_with_planted_dups(spark, sf_dir).select("doc_id")
    splits = sampling.assign_splits(d, _SPLITS, key_col="doc_id")
    pairs = _minhash_pairs(spark, sf_dir)
    a = splits.select(F.col("doc_id").alias("id_a"),
                      F.col("split").alias("__sa"))
    b = splits.select(F.col("doc_id").alias("id_b"),
                      F.col("split").alias("__sb"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    lo = F.least("__sa", "__sb")
    hi = F.greatest("__sa", "__sb")
    return j.groupBy(lo.alias("split_lo"), hi.alias("split_hi")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
    ).withColumn("is_leak", F.col("split_lo") != F.col("split_hi"))


def _split_leakage_sql() -> str:
    total = sum(_SPLITS.values())
    cases, lo = [], 0
    for name, wt in _SPLITS.items():
        cases.append(f"WHEN b < {lo + wt} THEN '{name}'")
        lo += wt
    case = f"CASE {' '.join(cases)} END"
    return f"""
WITH {_SQL_MINHASH_CTES},
sp AS (
  SELECT doc_id, {case} AS split FROM (
    SELECT doc_id,
           ('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT
             % {total} AS b
    FROM (SELECT DISTINCT doc_id FROM docs)
  )
)
SELECT least(sa.split, sb.split) AS split_lo,
       greatest(sa.split, sb.split) AS split_hi,
       CAST(count(*) AS BIGINT) AS n_pairs,
       least(sa.split, sb.split) != greatest(sa.split, sb.split)
         AS is_leak
FROM mh_pairs p
JOIN sp sa ON p.id_a = sa.doc_id
JOIN sp sb ON p.id_b = sb.doc_id
GROUP BY 1, 2
"""


SQL_SPLIT_LEAKAGE = _split_leakage_sql()


def q_dedup_keep_best(spark, sf_dir):
    """Canonical-document selection — the step that ENDS a dedup
    pipeline: label every document with its near-dup component
    (singletons are their own), then keep one representative per
    component by the keep-longest rule (length(text) desc, doc_id asc
    tiebreak — the standard web-corpus heuristic: the longest member
    is usually the least-truncated capture).

    Scale: components come from near_dup_components (pairs only — the
    overwhelming singleton majority never enters the iteration); the
    labeling join is broadcast-able when dup clusters are rare, and
    the selection is ONE partial-agg shuffle (max_by + count), not a
    sort or window over the corpus."""
    d = _docs_with_planted_dups(spark, sf_dir)
    pairs = _minhash_pairs(spark, sf_dir)
    comp = dedup.near_dup_components(pairs)
    labeled = d.join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        "text",
        F.coalesce("component", "doc_id").alias("component"),
    )
    return labeled.groupBy("component").agg(
        F.max_by(
            "doc_id",
            F.struct(
                F.length("text").alias("l"), (-F.col("doc_id")).alias("n")
            ),
        ).alias("kept_doc_id"),
        F.count(F.lit(1)).alias("n_members"),
    )


SQL_DEDUP_KEEP_BEST = f"""
WITH RECURSIVE {_SQL_MINHASH_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM mh_pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM mh_pairs
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, component) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, w.component FROM walk w JOIN edges e ON e.src = w.id
),
comp AS (SELECT id, min(component) AS component FROM walk GROUP BY id),
labeled AS (
  SELECT d.doc_id, d.text, coalesce(c.component, d.doc_id) AS component
  FROM docs d LEFT JOIN comp c ON c.id = d.doc_id
)
SELECT component, kept_doc_id, n_members FROM (
  SELECT component, doc_id AS kept_doc_id,
         row_number() OVER (
           PARTITION BY component ORDER BY length(text) DESC, doc_id
         ) AS rn,
         count(*) OVER (PARTITION BY component) AS n_members
  FROM labeled
) WHERE rn = 1
"""

# 48 bits (not 32): documents drawn from a shared small vocabulary
# produce clustered signatures, and at 32 bits the hamming≤3 criterion
# matches thousands of non-duplicates — noisy output AND a candidate
# explosion. 48 bits keeps every power in a signed long and cuts the
# bucket collision rate ~4000×. Bands=4 ⇒ pigeonhole covers hamming≤3.
_SIMHASH_BITS = 48
_SIMHASH_BANDS = 4
_SIMHASH_MAXHAM = 3


def _simhash_pairs_build(spark, sf_dir) -> DataFrame:
    """The raw (uncached) SimHash pairs pipeline — shared verbatim by
    dedup_simhash and simhash_sweep (identical parameters); plan
    tests inspect THIS."""
    d = _docs_with_planted_dups(spark, sf_dir)
    return dedup.simhash_pairs(
        d, "doc_id", "text",
        bits=_SIMHASH_BITS, bands=_SIMHASH_BANDS,
        max_hamming=_SIMHASH_MAXHAM,
    )


def _simhash_pairs(spark, sf_dir) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _SIMHASH_PAIRS_CACHE:
        _SIMHASH_PAIRS_CACHE[key] = _simhash_pairs_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _SIMHASH_PAIRS_CACHE[key]


def q_dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs: banded bucket candidates + Hamming ≤ 3
    verification, over documents + planted dups (the shared
    `_build:simhash_pairs` frame — simhash_sweep consumes the same
    pairs)."""
    return _simhash_pairs(spark, sf_dir)


def _simhash_ctes() -> str:
    # shared by the pairs oracle and the radius-sweep oracle: the full
    # SimHash chain ending in `ham` = verified pairs with their
    # Hamming distance (<= the banding's pigeonhole bound)
    votes = ",\n         ".join(
        f"sum(CASE WHEN (hv >> {j}) & 1 = 1 THEN 1 ELSE -1 END) AS v{j}"
        for j in range(_SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN v{j} > 0 THEN (1::BIGINT << {j}) ELSE 0 END)"
        for j in range(_SIMHASH_BITS)
    )
    r = _SIMHASH_BITS // _SIMHASH_BANDS
    mask = (1 << r) - 1
    bands_sel = "\n  UNION ALL\n".join(
        f"  SELECT id, simhash, {b} AS band, (simhash >> {b * r}) & {mask} AS bv FROM sig"
        for b in range(_SIMHASH_BANDS)
    )
    return f"""docs AS ({_SQL_DOCS_PLANTED}),
tok AS (
  SELECT id, unnest(t) AS token
  FROM (SELECT doc_id AS id, {_SQL_TOKS} AS t FROM docs)
),
h AS (SELECT id, ('0x' || substring(md5(token), 1, 15))::BIGINT AS hv FROM tok),
votes AS (SELECT id, {votes} FROM h GROUP BY id),
sig AS (SELECT id, {sig} AS simhash FROM votes),
bands AS (
{bands_sel}
),
cand AS (
  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
         a.simhash AS sig_a, b.simhash AS sig_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bv = b.bv AND a.id < b.id
),
ham AS (
  SELECT id_a, id_b, bit_count(xor(sig_a, sig_b)) AS hamming
  FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {_SIMHASH_MAXHAM}
)"""


SQL_DEDUP_SIMHASH = f"""
WITH {_simhash_ctes()}
SELECT id_a, id_b, hamming FROM ham
"""




_DRIFT_BASELINE_CACHE: dict[tuple, str] = {}


_SPAN_CACHE: dict[tuple, DataFrame] = {}


#: duplicated window positions + canonical flag — the shared front of
#: the substring-dedup family (see _q05's _dup_positions).
_DUP_POS_CACHE: dict[tuple, DataFrame] = {}


#: distinct (id, shingle) of the base documents at k=3 — the shared
#: front of the jaccard/containment/dup-ngram/novelty consumers.
_DOC_SHINGLES_CACHE: dict[tuple, DataFrame] = {}


_BPE_CACHE: dict[tuple, list[tuple]] = {}


_ANN_INDEX_CACHE: dict[tuple, str] = {}


_SBA_ENGINE_CACHE: dict[str, list] = {}


# Streaming-maintained LSH index (r10): path of the index kept live by
# the availableNow append run, plus its verified maintain==rebuild
# content checksum — build-once-probe-many, so infra lifetime.
_ANN_MAINT_CACHE: dict[str, str] = {}


_LR_CACHE: dict[tuple, list[float]] = {}


_CENTROID_CACHE: dict[tuple, list[list[float]]] = {}


_KNNG_CACHE: dict[tuple, DataFrame] = {}


# r10: distribution_match and emd_drift both reduce the SAME drift
# fixture (base = even docs, cur = odd + planted spam) to the SAME
# spine-coalesced 10-row quality histogram pair before their bounded
# tails — two full tokenize+aggregate corpus scans per query. One
# build per (session, sf_dir), billed as `_build:drift_hists`;
# builder lives in plans/_q07_quantized_drift.py next to
# _drift_sides.
_DRIFT_HISTS_CACHE: dict[tuple, DataFrame] = {}


__all__ = list(_prev.__all__) + [
    "_PLANT_OFFSET",
    "_docs_with_planted_dups",
    "_SQL_DOCS_PLANTED",
    "_SQL_TOKS",
    "_SQL_SHINGLES",
    "q_dedup_exact",
    "SQL_DEDUP_EXACT",
    "_JACCARD_MAX_DF",
    "q_dedup_jaccard",
    "SQL_DEDUP_JACCARD",
    "_MINHASH_N",
    "_MINHASH_BANDS",
    "_MINHASH_PAIRS_CACHE",
    "clear_caches",
    "_minhash_pairs_build",
    "_minhash_pairs",
    "_doc_shingles_build",
    "_doc_shingles",
    "_planted_dup_shingles",
    "_jaccard_pairs_build",
    "_jaccard_pairs",
    "_JPAIRS_TAU",
    "_TRADE_PAIRS_CACHE",
    "_simhash_pairs_build",
    "_simhash_pairs",
    "_LM_SCORE_CACHE",
    "q_dedup_minhash",
    "_R",
    "_SQL_MINHASH_CTES",
    "SQL_DEDUP_MINHASH",
    "q_dedup_components",
    "SQL_DEDUP_COMPONENTS",
    "_SPLITS",
    "q_split_leakage",
    "_split_leakage_sql",
    "SQL_SPLIT_LEAKAGE",
    "q_dedup_keep_best",
    "SQL_DEDUP_KEEP_BEST",
    "_SIMHASH_BITS",
    "_SIMHASH_BANDS",
    "_SIMHASH_MAXHAM",
    "q_dedup_simhash",
    "_simhash_ctes",
    "SQL_DEDUP_SIMHASH",
    "_DRIFT_BASELINE_CACHE",
    "_SPAN_CACHE",
    "_DUP_POS_CACHE",
    "_DOC_SHINGLES_CACHE",
    "_BPE_CACHE",
    "_ANN_INDEX_CACHE",
    "_SBA_ENGINE_CACHE",
    "_ANN_MAINT_CACHE",
    "_LR_CACHE",
    "_CENTROID_CACHE",
    "_KNNG_CACHE",
    "_DRIFT_HISTS_CACHE",
    "_BM25_FRONT_CACHE",
    "_CELL_PAIRS_CACHE",
]
