"""Entity resolution: dictionary reduction + multi-pass blocking +
bounded pairwise edit distance.

The classic record-linkage shape for a training-data pipeline, built
from three standard reductions applied in order:

1. **Dictionary reduction.** Edit distance is a function of the NAME,
   not the record — so resolve over the distinct-name dictionary and
   carry per-name record counts. Real name columns are heavily
   repeated (zipfian), so |dictionary| ≪ |records|; every downstream
   quadratic term shrinks by the square of that ratio. Record-level
   pairs, when needed, are a cheap equi-join back on the name.
2. **Multi-pass blocking.** Instead of the O(n²) all-pairs comparison,
   each name is indexed under several cheap blocking keys (first
   token, last token, a phonetic code, …); only names sharing a key
   become candidates, and the union across passes recovers most of
   the recall any single imperfect key loses — the standard
   Fellegi-Sunter-era practice.
3. **Cheap necessary-condition filters before the expensive one.**
   |len₁ − len₂| ≤ d is necessary for levenshtein ≤ d and costs two
   length() calls; candidates are also deduped across passes first,
   so each surviving pair pays the Levenshtein DP exactly once,
   JVM-side (``F.levenshtein``, whole-stage codegen).

Reference analogue: the reference dedups users/tweets by exact id
(twitter_to_sqlite/utils.py save_tweets upsert pk); fuzzy-identity
resolution is the generalization a 100 TB corpus needs when ids are
absent and names drift.

Scale: candidate count is Σ_block |block|² over DICTIONARY entries,
never |records|². ``max_block`` drops over-frequent
(non-discriminative) blocking keys entirely — a key shared by half
the dictionary carries no identity signal and would otherwise
contribute |dict|²/4 pairs — bounding work by #blocks · max_block².
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def name_dictionary(df: DataFrame, name_col: str) -> DataFrame:
    """Distinct non-null names with record counts: (name, n_records).
    One partial-agg shuffle on the name."""
    return (
        df.filter(F.col(name_col).isNotNull())
        .groupBy(F.col(name_col).alias("name"))
        .agg(F.count(F.lit(1)).alias("n_records"))
    )


def blocked_pairs(names: DataFrame, block_exprs: list[Column],
                  max_block: int | None = None,
                  max_length_diff: int | None = None) -> DataFrame:
    """Candidate name pairs (name1 < name2) from multi-pass blocking
    over a (name, n_records) dictionary, deduped across passes. NULL
    blocking keys index nothing. ``block_exprs`` are column
    expressions over ``name``."""
    sides = []
    for i, be in enumerate(block_exprs):
        sides.append(
            names.select(
                F.concat(F.lit(f"{i}|"), be.cast("string")).alias("__blk"),
                "name", "n_records",
            )
        )
    b = sides[0]
    for s in sides[1:]:
        b = b.unionByName(s)
    # Lazy checkpoint: the hot-block count, its semi-join, and BOTH
    # sides of the pair self-join reference this frame — unpinned,
    # each reference re-derived the dictionary build (12 input scans
    # on the part-names query; Catalyst does not reuse subplans).
    b = b.filter(F.col("__blk").isNotNull()).localCheckpoint(eager=False)
    if max_block is not None:
        keep = (
            b.groupBy("__blk")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") <= max_block)
            .select("__blk")
        )
        b = b.join(keep, "__blk", "left_semi")
    l, r = b.alias("l"), b.alias("r")
    pairs = l.join(r, "__blk").filter(F.col("l.name") < F.col("r.name"))
    if max_length_diff is not None:
        pairs = pairs.filter(
            F.abs(F.length("l.name") - F.length("r.name"))
            <= max_length_diff
        )
    return pairs.select(
        F.col("l.name").alias("name1"),
        F.col("l.n_records").alias("n1"),
        F.col("r.name").alias("name2"),
        F.col("r.n_records").alias("n2"),
    ).distinct()


def _match_dictionary(d: DataFrame, block_exprs: list[Column],
                      max_distance: int,
                      max_block: int | None) -> DataFrame:
    """Matched pairs over an existing (name, n_records) dictionary —
    the shared core of match_names / cluster_entities. Callers pass
    an already-pinned (lazily localCheckpointed) dictionary: the
    multi-block union in blocked_pairs references it once per block
    expression, and cluster_entities reuses the same pin for its
    final labeling join — pinning here too would materialize the
    bounded dictionary twice (r8 ADVICE)."""
    cand = blocked_pairs(
        d, block_exprs,
        max_block=max_block, max_length_diff=max_distance,
    )
    return (
        cand.withColumn(
            "dist", F.levenshtein("name1", "name2").cast("long")
        )
        .filter(F.col("dist") <= max_distance)
    )


def cluster_entities(df: DataFrame, name_col: str,
                     block_exprs: list[Column], max_distance: int = 3,
                     max_block: int | None = None) -> DataFrame:
    """End-to-end entity resolution: fuzzy-matched name pairs
    (:func:`match_names`) fed through min-label connected components
    (functions/dedup.py::near_dup_components — transitive closure,
    since edit-distance matches are not transitive pairwise), then
    every dictionary name labeled with its component's minimum name as
    the canonical ``entity_id``. Singletons are their own entity.
    Returns (name, entity_id, n_records); record-level entity ids are
    one equi-join back on the name.

    Scale: the quadratic work stays confined to the capped-block name
    DICTIONARY (see module docstring); the component iteration runs
    over matched pairs only — the overwhelming singleton majority
    never enters it — and the final labeling is one join on the
    dictionary, broadcast-able when match clusters are rare.
    """
    from twitter_to_sqlite_spark.functions.dedup import near_dup_components

    # pinned ONCE here: both the matcher and the final labeling
    # join reference the dictionary (the blocked_pairs note)
    d = name_dictionary(df, name_col).localCheckpoint(eager=False)
    pairs = _match_dictionary(d, block_exprs, max_distance, max_block)
    comp = near_dup_components(pairs, "name1", "name2")
    return (
        d.join(comp.withColumnRenamed("id", "name"), "name", "left")
        .select(
            "name",
            F.coalesce("component", F.col("name")).alias("entity_id"),
            "n_records",
        )
    )


def match_names(df: DataFrame, name_col: str,
                block_exprs: list[Column], max_distance: int = 3,
                max_block: int | None = None) -> DataFrame:
    """Blocked fuzzy-match over the distinct-name dictionary of
    ``df[name_col]``: candidate pairs whose Levenshtein distance is
    ≤ ``max_distance``. Returns (name1, n1, name2, n2, dist) with
    counts/dist as BIGINT (cross-engine schema stability); record-
    level pairs are an equi-join back on name1/name2."""
    # pinned by the caller contract of _match_dictionary (see there)
    d = name_dictionary(df, name_col).localCheckpoint(eager=False)
    return _match_dictionary(d, block_exprs, max_distance, max_block)
