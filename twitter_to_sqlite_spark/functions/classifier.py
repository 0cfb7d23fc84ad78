"""Distributed-trained quality classifier: full-batch logistic
regression over handcrafted text features.

The production pattern this reproduces: large-corpus pipelines distill
their hand-written quality heuristics (Gopher/C4 rules) into a soft
scorer (a fasttext-style classifier) so documents get a continuous
quality probability instead of a hard gate. Here both the features AND
the training loop are Spark plans:

  - features are rational-arithmetic column expressions (ratios of
    integer counts), bit-identical in any engine;
  - training is deterministic full-batch gradient descent — each
    iteration is ONE distributed aggregation (avg gradient per
    coefficient, map-side combined), and only |features|+1 doubles
    ever reach the driver (the kmeans_centroids shape);
  - per-iteration coefficients are rounded so the trained weights are
    reproducible across engines regardless of float-summation order —
    which is what lets a DuckDB oracle replay the identical training
    relationally (plans/catalog.py::_logreg_sql).

At 100 TB: iters × one partial-agg pass over the corpus, no shuffle
wider than the |features|-column gradient, scoring is a pure per-row
projection. The same loop trains on a hash sample (sampling.
hash_sample) when a pass over the full corpus is too dear.
"""

from __future__ import annotations


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions.text import EN_STOPWORDS, _tokens

#: feature column names produced by quality_features (bias excluded).
FEATURES = ["x_words", "x_wordlen", "x_stop", "x_dup"]


def quality_features(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Per-document feature vector + heuristic label.

    Every feature is a ratio of integer counts (exact in IEEE double,
    identical in any engine — deliberately no log/exp here):
      x_words   words/100            (document length, scaled ~1)
      x_wordlen (Σ word_len / words) / 10   (mean word length, ~0.5)
      x_stop    stopword ratio
      x_dup     1 - distinct/total words    (repetition)

    The training label y distills the hard heuristic gate: 1 iff
    words ≥ 15 AND stopword ratio ≥ 0.02 AND dup fraction ≤ 0.5 —
    integer/rational comparisons, so the label is exact too.
    """
    toks = _tokens(F.col(text_col))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    staged = df.select(
        F.col(id_col),
        F.size(toks).cast("double").alias("__nw"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        .cast("double").alias("__ns"),
        F.size(F.array_distinct(toks)).cast("double").alias("__nd"),
        F.aggregate(toks, F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t).cast("long"))
        .cast("double").alias("__swl"),
    )
    g = F.greatest(F.col("__nw"), F.lit(1.0))
    x_stop = F.col("__ns") / g
    x_dup = F.lit(1.0) - F.col("__nd") / g
    return staged.select(
        id_col,
        (F.col("__nw") / F.lit(100.0)).alias("x_words"),
        ((F.col("__swl") / g) / F.lit(10.0)).alias("x_wordlen"),
        x_stop.alias("x_stop"),
        x_dup.alias("x_dup"),
        ((F.col("__nw") >= 15) & (x_stop >= 0.02) & (x_dup <= 0.5))
        .cast("int").alias("y"),
    )


def _margin(w: list[float]):
    z = F.lit(float(w[0]))
    for j, c in enumerate(FEATURES):
        z = z + F.lit(float(w[j + 1])) * F.col(c)
    return z


def logreg_train(feats: DataFrame, iters: int = 3, lr: float = 1.0,
                 decimals: int = 6) -> list[float]:
    """Deterministic full-batch GD for logistic regression.

    w starts at 0 (first pass scores every doc 0.5); each iteration
    updates w_j ← round(w_j + lr · avg((y − σ(w·x)) · x_j), decimals).
    The round absorbs order-dependent float noise (the ~1e-16 ULP
    wobble of a distributed avg) far below the 1e-6 rounding
    granularity, so in practice every engine replaying the same
    arithmetic lands on the same weights (the oracle does exactly
    that). This is probabilistic, not a hard guarantee: a gradient
    landing within an ULP of a rounding boundary could still diverge;
    accumulate in decimal if a hard guarantee is ever needed.
    """
    # Every iteration is one full pass over the features — |iters|
    # sequential jobs. Materialize the NARROW numeric frame once
    # (y + 4 doubles per row) so the passes read executor-local
    # blocks instead of re-running the scan + tokenize + stopword
    # filter + array_distinct feature extraction each time. Same
    # rows, same per-partition layout as the single-scan plan, so
    # the partial-avg merge order is unchanged.
    feats = feats.select("y", *FEATURES).localCheckpoint(eager=True)
    w = [0.0] * (len(FEATURES) + 1)
    for _ in range(iters):
        resid = F.col("y").cast("double") - (
            F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
        )
        row = feats.agg(
            F.avg(resid).alias("g0"),
            *[F.avg(resid * F.col(c)).alias(f"g{j + 1}")
              for j, c in enumerate(FEATURES)],
        ).collect()[0]
        w = [round(w[j] + lr * float(row[f"g{j}"]), decimals)
             for j in range(len(w))]
    return w


def logreg_score(feats: DataFrame, w: list[float],
                 id_col: str = "doc_id", decimals: int = 4) -> DataFrame:
    """Score documents under trained weights: P(quality) + verdict.

    Pure per-row projection (the weights are literals) — composes with
    any scan, no shuffle. The keep verdict compares the ROUNDED
    probability so the boundary is the same total order everywhere.
    """
    prob = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w))), decimals)
    return feats.select(
        id_col, "y",
        prob.alias("prob"),
        (prob > 0.5).alias("keep"),
    )
