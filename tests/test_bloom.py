"""Deterministic Bloom filter: build, probe, and prune-join exactness.

The operator's contract is (a) no false negatives ever, (b) the pruned
join is exactly the plain join, (c) the build-side collect is bounded
by m_words, and (d) the probe predicate sits under the join in the
optimized plan so it can cut the fact shuffle.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from twitter_to_sqlite_spark.functions import bloom


@pytest.fixture(scope="module")
def frames(spark):
    dim = spark.range(0, 300).select((F.col("id") * 13).alias("k"))
    fact = spark.range(0, 8000).select(
        (F.col("id") % 4000).alias("k"), F.col("id").alias("v"))
    return fact, dim


def test_no_false_negatives(spark, frames):
    fact, dim = frames
    words = bloom.build_bloom(dim, "k")
    pruned = fact.filter(bloom.might_contain(F.col("k"), words))
    # every row whose key IS in dim must survive the probe
    true_matches = fact.join(dim.distinct(), "k").count()
    assert pruned.join(dim.distinct(), "k").count() == true_matches


def test_prune_join_equals_plain_join(spark, frames):
    fact, dim = frames
    got = (bloom.bloom_prune_join(fact, dim, "k")
           .orderBy("k", "v").collect())
    want = fact.join(dim, "k").orderBy("k", "v").collect()
    assert got == want


def test_prune_is_selective(spark, frames):
    fact, dim = frames
    words = bloom.build_bloom(dim, "k")
    n_pruned = fact.filter(bloom.might_contain(F.col("k"), words)).count()
    n_match = fact.join(dim.distinct(), "k").count()
    # dim covers multiples of 13 < 3900 → ~7.7% of fact keys; the
    # filter must cut most non-matches (some false positives allowed)
    assert n_match <= n_pruned < fact.count() * 0.2


def test_build_is_bounded_and_deterministic(spark, frames):
    _, dim = frames
    w1 = bloom.build_bloom(dim, "k", m_words=64, k=3)
    w2 = bloom.build_bloom(dim, "k", m_words=64, k=3)
    assert w1 == w2
    assert len(w1) == 64


def test_probe_sits_under_the_join(spark, frames):
    fact, dim = frames
    plan = bloom.bloom_prune_join(fact, dim, "k") \
        ._jdf.queryExecution().optimizedPlan().toString()
    join_at = plan.find("Join")
    probe_at = plan.find("getbit")
    assert join_at != -1 and probe_at != -1
    # optimizedPlan prints top-down: the probe Filter must appear
    # after (i.e. below) the Join node, on the fact branch
    assert probe_at > join_at


def test_null_keys_are_ignored(spark):
    dim = spark.createDataFrame(
        [(1,), (None,), (2,)], "k bigint")
    words = bloom.build_bloom(dim, "k")
    assert any(words)
    fact = spark.createDataFrame([(1, "a"), (None, "b"), (3, "c")],
                                 "k bigint, v string")
    got = bloom.bloom_prune_join(fact, dim, "k").collect()
    assert [(r["k"], r["v"]) for r in got] == [(1, "a")]
