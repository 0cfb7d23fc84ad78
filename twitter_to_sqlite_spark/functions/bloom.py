"""Deterministic broadcast Bloom filter: runtime join pruning.

Spark's own runtime row-level filtering (`spark.sql.optimizer.
runtimeFilter.bloomFilter.enabled`) injects a BloomFilterAggregate on
the build side of a join and a might_contain probe on the stream side —
but the filter it builds is engine-private (XXH64 seeds, JVM sketch
layout), so nothing about it can be replayed by another engine and the
optimizer only fires it for selective equi-joins it can prove. This
module is the same idea made *portable and explicit*:

- the filter is built distributively (explode k probe positions,
  bit_or the 64-bit words, collect <= m_words rows — a bounded pull of
  a few KiB, exactly like the centroid / probe-bucket pulls elsewhere
  in this repo);
- every hash is the repo's md5-prefix device, so DuckDB can compute
  bit-identical positions (the parity tests do);
- membership is a pure JVM column expression over an array literal, so
  it lands *under* the join in the fact table's scan/filter stage and
  prunes rows before they ever shuffle.

At 100 TB the point is shuffle avoidance: a fact→dim join where the
dim side keeps 1% of keys shuffles 100× less fact data with the probe
pushed into the scan. False positives only cost wasted shuffle — the
exact join downstream removes them — so the result is *exactly* the
plain join and the DuckDB oracle is the plain join.

Reference parity note: twitter-to-sqlite's skip-existing ingest
(`--since_id` plus sqlite PK probes, twitter_to_sqlite/utils.py) is a
point-lookup membership test against the already-stored set; this is
the distributed analogue for set sizes where a broadcast hash set
would not fit but m/8 bytes of Bloom bits do.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default sizing: 1024 words = 65,536 bits; at k=5 hashes this holds
#: ~6,500 keys under 1% false-positive rate (m/n ~ 10 bits/key).
DEFAULT_WORDS = 1024
DEFAULT_HASHES = 5


def _positions(key: Column, i: int, m_bits: int) -> Column:
    """Probe position i for a key: md5('<i>:'||key) 15-hex prefix →
    60-bit integer → mod m. Engine-portable (DuckDB computes the same
    bytes); the salt prefix makes the k draws independent."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{i}:"), key.cast("string"))),
                    1, 15),
        16, 10,
    ).cast("long")
    return h % F.lit(m_bits)


def build_bloom(df: DataFrame, key_col: str,
                m_words: int = DEFAULT_WORDS,
                k: int = DEFAULT_HASHES) -> list[int]:
    """Build the bit array for the distinct non-null keys of `df`.

    Distributed: each key explodes into k (word, mask) pairs, a single
    hash-aggregate bit_ors the masks per word, and the driver pulls at
    most m_words rows (8 KiB at the default sizing) — the same bounded
    collect contract as the ANN centroid pull. Returns a dense list of
    m_words Python ints (64-bit words).
    """
    m_bits = 64 * m_words
    key = F.col(key_col)
    pairs = (
        df.filter(key.isNotNull())
        .select(key.alias("__k"))
        .select(F.explode(F.array(*[
            _positions(F.col("__k"), i, m_bits) for i in range(k)
        ])).alias("__pos"))
        .select(
            # word/bit split via shifts — integer-exact by construction
            # (the repo's `div` convention, without the expr detour)
            F.shiftright(F.col("__pos"), 6).alias("__word"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"),
                F.col("__pos").bitwiseAND(F.lit(63)).cast("int"))
            .alias("__mask"),
        )
        .groupBy("__word")
        .agg(F.bit_or("__mask").alias("__bits"))
    )
    words = [0] * m_words
    for row in pairs.collect():  # bounded: <= m_words rows
        words[int(row["__word"])] = int(row["__bits"])
    return words


def might_contain(key: Column, words: list[int],
                  k: int = DEFAULT_HASHES) -> Column:
    """Membership probe as a pure column expression: AND over the k
    probe bits. The words array is an inline literal, so the predicate
    is eligible for the scan-side filter stage (no join, no UDF)."""
    m_bits = 64 * len(words)
    lit_words = F.lit(words)
    cond = F.lit(True)
    for i in range(k):
        pos = _positions(key, i, m_bits)
        word = F.element_at(
            lit_words, (F.shiftright(pos, 6) + 1).cast("int"))
        bit = F.call_function(
            "getbit", word, pos.bitwiseAND(F.lit(63)).cast("int"))
        cond = cond & (bit == F.lit(1))
    return cond


def bloom_prune_join(fact: DataFrame, dim: DataFrame, key_col: str,
                     m_words: int = DEFAULT_WORDS,
                     k: int = DEFAULT_HASHES) -> DataFrame:
    """Inner equi-join with the fact side Bloom-pruned before the
    shuffle. Exact: false positives survive the filter but die in the
    join, so the output is precisely `fact JOIN dim USING (key_col)`.
    """
    words = build_bloom(dim, key_col, m_words=m_words, k=k)
    pruned = fact.filter(might_contain(F.col(key_col), words, k=k))
    return pruned.join(dim, key_col)
