"""Deterministic corpus-sampling operators for training-data curation.

Subsampling 100 TB down to a training mix must be REPRODUCIBLE — the
same rows on every run, every engine, every retry of a failed task —
so these operators hash row keys (portable 60-bit md5 prefix, exact in
Spark and the DuckDB oracle alike) instead of `rand()`, whose draw
order is partition- and retry-dependent. Pure column expressions:
whole-stage codegen, no shuffle — a sample is a filter pushed onto the
scan, not a job.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _key_hash(key_col: Column, salt: str = "") -> Column:
    """Portable 60-bit hash: first 15 md5 hex digits as a long —
    identical in every engine with md5 (DuckDB twin:
    ('0x' || substring(md5(x), 1, 15))::BIGINT)."""
    return F.conv(
        F.substring(F.md5(F.concat(key_col.cast("string"), F.lit(salt))), 1, 15),
        16, 10,
    ).cast("long")


def hash_sample(df: DataFrame, denom: int, key_col: str,
                salt: str = "") -> DataFrame:
    """Keep a deterministic ~1/denom of rows: hash(key) % denom == 0.

    `salt` decorrelates independent samples over the same keys (two
    different salts give two independent ~1/denom subsets).
    """
    return df.filter(_key_hash(F.col(key_col), salt) % denom == 0)


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, int], key_col: str,
                      default_denom: int = 1,
                      salt: str = "") -> DataFrame:
    """Per-stratum deterministic subsampling: stratum s keeps
    ~1/rates[s] of its rows (denominator 1 = keep all); strata not
    listed use `default_denom`.

    The corpus-rebalancing primitive (downweight a dominant language /
    source / domain in the training mix). One CASE expression over the
    stratum column — no shuffle, no per-stratum scans; the filter
    composes with partition pruning when `strata_col` is a partition
    key.
    """
    denom = None
    for value, d in sorted(rates.items()):
        cond = F.col(strata_col) == F.lit(value)
        denom = F.when(cond, F.lit(int(d))) if denom is None \
            else denom.when(cond, F.lit(int(d)))
    denom = F.lit(int(default_denom)) if denom is None \
        else denom.otherwise(F.lit(int(default_denom)))
    return df.filter(_key_hash(F.col(key_col), salt) % denom == 0)
