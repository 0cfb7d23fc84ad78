"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen, no Python in the hot
path) so they scan 100 TB of documents at parquet-read speed. Each has
an oracle_sql twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny high-frequency English stopword list for the n-gram/stopword
# heuristic (public knowledge; same list is inlined in the oracle SQL).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), r"\W+"), lambda t: F.length(t) > 0)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    The subword estimate is the standard chars/4 heuristic blended with
    word count (≈ GPT-style BPE averages ~4 chars/token on English),
    deterministic and cheap: tokens ≈ max(words, ceil(chars/4)).
    """
    toks = _tokens(F.col(text_col))
    return df.select(
        "*",
        F.size(toks).alias("n_words"),
        F.length(text_col).alias("n_chars_m"),
        F.greatest(
            F.size(toks).cast("long"),
            F.ceil(F.length(text_col) / F.lit(4.0)).cast("long"),
        ).alias("n_tokens_est"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + a composite score.

    Features (Gopher/C4-style filters, public recipes):
      mean_word_len, stopword_ratio, punct_ratio, dup_word_ratio.
    Composite: a bounded 0..1 score; the exact blend is arbitrary but
    deterministic and monotone in each signal.
    """
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    n_punct = (
        F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    mean_wl = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long"))
        .cast("double") / F.greatest(n_words, F.lit(1.0))
    )
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1.0))
    punct_ratio = n_punct / F.greatest(F.length(text_col).cast("double"), F.lit(1.0))
    dup_ratio = F.lit(1.0) - n_distinct / F.greatest(n_words, F.lit(1.0))
    score = (
        F.least(stop_ratio * 2, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + (F.lit(1.0) - dup_ratio) * 0.4
    )
    return df.select(
        "*",
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(dup_ratio, 4).alias("dup_word_ratio"),
        F.round(score, 4).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English-stopword hit ratio.

    A real system plugs in fastText/CLD3; the engine-side contract is
    the same — a per-row pure function producing (lang_guess,
    lang_score). Kept as a column expression so it runs JVM-side.
    """
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    ratio = n_stop / F.greatest(n_words, F.lit(1.0))
    return df.select(
        "*",
        F.round(ratio, 4).alias("en_score"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                shingle_k: int = 3) -> DataFrame:
    """Document fingerprint: min-hash-of-shingles (one 64-bit value).

    Rolling-hash/winnowing style content fingerprint: hash every
    k-word shingle (md5 → first 60 bits as long — md5 is identical in
    every engine, making the oracle exact) and keep the minimum.
    Identical content ⇒ identical fingerprint; near-identical content
    usually shares it (this is MinHash with one hash function).
    """
    from twitter_to_sqlite_spark.functions.dedup import shingle_array, spread

    # shingle_array materializes the token column first — inlining the
    # tokenizer into the shingle lambda re-evaluates it per element.
    # NB: fingerprint over distinct shingles == over all shingles
    # (min is duplicate-insensitive).
    with_sh = shingle_array(spread(df), id_col, text_col, shingle_k)
    hashes = F.transform(
        F.col("__sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    return with_sh.select(
        F.col("id").alias(id_col),
        F.array_min(hashes).alias("fingerprint"),
    )
