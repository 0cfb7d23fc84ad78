"""End-to-end corpus curation pipeline: the operators composed the way
a training-data run actually chains them, as ONE lazy plan plus one
funnel aggregation.

    scrub PII → quality gate (Gopher) → exact dedup (keep min id)
    → split assignment → sharded write

Design for 100 TB: the per-document stages (scrub, gate, split) are
narrow column expressions that FLAG rows instead of filtering them, so
the whole funnel — input count, per-stage survivor counts, output
count — comes from one aggregation pass; the only shuffle before the
write is the dedup window on md5(text) (high-entropy key, no skew).
Total cost: one aggregation job + one write job over the same plan,
never one count() per stage.

The CLI front door is ``cli.py curate``; the same function is what a
notebook or Airflow job would call.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import sampling, text

#: default split weights (percent-style integers, any scale works)
DEFAULT_SPLITS = {"train": 98, "val": 1, "test": 1}

STEPS = ("pii", "gopher", "dedup", "split")


def curate_flags(docs: DataFrame, steps=STEPS, id_col: str = "doc_id",
                 text_col: str = "text",
                 splits: dict[str, int] | None = None) -> DataFrame:
    """Annotate every document with its curation outcome (no rows
    dropped): cleaned text, per-stage pass flags, split label, and a
    final ``keep``. Filtering is the caller's one-liner; keeping the
    flags makes the funnel auditable and the plan single-pass.
    """
    out = docs
    txt = text_col
    if "pii" in steps:
        scrubbed = text.pii_scrub(out, id_col, text_col)
        out = out.join(scrubbed, id_col)  # 1:1 on the id; Catalyst
        # collapses this to a projection when pii_scrub shares the scan
        txt = "text_clean"
    if "gopher" in steps:
        gate = text.gopher_filter(out.select(id_col, F.col(txt).alias("text")),
                                  id_col, "text").select(
            id_col, F.col("keep").alias("pass_gopher"))
        out = out.join(gate, id_col)
    else:
        out = out.withColumn("pass_gopher", F.lit(True))
    if "dedup" in steps:
        w = Window.partitionBy(F.md5(F.col(txt)))
        out = out.withColumn(
            "pass_dedup", F.col(id_col) == F.min(id_col).over(w))
    else:
        out = out.withColumn("pass_dedup", F.lit(True))
    if "split" in steps:
        out = sampling.assign_splits(out, splits or DEFAULT_SPLITS, id_col)
    else:
        out = out.withColumn("split", F.lit("train"))
    return out.withColumn(
        "keep", F.col("pass_gopher") & F.col("pass_dedup"))


def curate_stats(flagged: DataFrame) -> dict:
    """The funnel, from ONE aggregation over the flagged plan."""
    row = flagged.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.when(F.col("pass_gopher"), 1).otherwise(0)).alias("n_pass_gopher"),
        F.sum(F.when(F.col("pass_dedup"), 1).otherwise(0)).alias("n_pass_dedup"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
        *([F.sum("n_pii").alias("n_pii_redactions")]
          if "n_pii" in flagged.columns else []),
    ).collect()[0]
    return {k: int(v) for k, v in row.asDict().items() if v is not None}


def run_curate(spark, in_path: str, out_dir: str, steps=STEPS,
               splits: dict[str, int] | None = None,
               n_shards: int | None = None,
               id_col: str = "doc_id", text_col: str = "text") -> dict:
    """Read parquet docs, curate, write, return the funnel stats.

    Output layout: ``out_dir/split=<name>/`` partitioned parquet with
    the cleaned text under the original text column name; with
    ``n_shards`` the train split is additionally sharded
    deterministically (sampling.write_training_shards) under
    ``out_dir/train_shards/``.
    """
    docs = spark.read.parquet(in_path)
    # Reserved output names: the funnel adds these; an input corpus
    # that already carries one would produce duplicate/ambiguous
    # columns and a failed write — fail fast instead (ADVICE r3).
    reserved = {"split", "text_clean", "keep", "pass_gopher",
                "pass_dedup", "n_pii"}
    clash = reserved & set(docs.columns)
    if clash:
        raise ValueError(
            f"input columns {sorted(clash)} collide with curate's "
            f"reserved output names; rename them before curating")
    flagged = curate_flags(docs, steps, id_col, text_col, splits)
    stats = curate_stats(flagged)
    kept = flagged.filter("keep")
    final_txt = "text_clean" if "pii" in steps else text_col
    keep_cols = [c for c in docs.columns if c != text_col]
    out = kept.select(*keep_cols, F.col(final_txt).alias(text_col), "split")
    out.write.mode("overwrite").partitionBy("split").parquet(
        f"{out_dir}/curated")
    if n_shards:
        sampling.write_training_shards(
            out.filter(F.col("split") == "train").drop("split"),
            f"{out_dir}/train_shards", n_shards, key_col=id_col)
    stats["out"] = f"{out_dir}/curated"
    return stats
