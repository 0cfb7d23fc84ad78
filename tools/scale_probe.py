#!/usr/bin/env python
"""Scale probe: replicate the bench corpus N× (distinct ids/texts per
replica) and time the heavy operators at 1× and N×, printing one JSON
line of {op: {t1, tN, ratio}}.

The point is the SHAPE of the growth, not the absolute numbers: a
bucketed near-dup path should grow ~linearly (Σ bucket² with bounded
buckets), never quadratically; narrow text ops should stay flat per
row. Run:  python tools/scale_probe.py [N] [sf_dir]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.functions import (classifier, dedup, sampling,
                                               similarity, sketch, stats, text)
from twitter_to_sqlite_spark.session import get_spark


def replicate_docs(d, n, distinct: bool):
    """n replicas. distinct=False appends one token per replica — each
    original becomes a genuine n-way near-duplicate cluster, the
    ADVERSARIAL case where the true pair count itself grows ~n²/2.
    distinct=True salts EVERY token, so replicas share no shingles —
    independent corpus growth, where near-linear scaling is the bar."""
    out = None
    for j in range(n):
        if distinct:
            txt = F.regexp_replace(F.col("text"), r"(\S+)", rf"$1x{j}")
        else:
            txt = F.concat(F.col("text"), F.lit(f" r{j}"))
        r = d.select(
            (F.col("doc_id") + j * 10_000_000).alias("doc_id"),
            txt.alias("text"),
            "lang",
        )
        out = r if out is None else out.unionByName(r)
    return out


def replicate_vecs(e, n, distinct: bool):
    """distinct=False scales each replica (cosine 1 with the original:
    n-way duplicate clusters); distinct=True shifts a different
    coordinate per replica, moving the direction so replicas are no
    longer near-dups of each other."""
    out = None
    for j in range(n):
        if distinct:
            emb = F.transform(
                "embedding",
                lambda x, i: x.cast("double")
                + F.when(i == j % 64, F.lit(2.0 + j)).otherwise(F.lit(0.0)),
            )
        else:
            emb = F.transform(
                "embedding", lambda x: x.cast("double") * (1.0 + j * 1e-3))
        r = e.select(
            (F.col("vec_id") + j * 10_000_000).alias("vec_id"),
            emb.alias("embedding"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def force(df):
    df.write.mode("overwrite").format("noop").save()


def _pagerank_ring(d):
    """PageRank growth probe: a symmetric chain over the corpus doc
    ids (doc i ↔ doc i+1 where both exist, built by a distributed
    self-join — no global window), so |E| ≈ 2|V| scales exactly with
    rows and the measured growth is the algorithm's, not the graph
    generator's."""
    from twitter_to_sqlite_spark.functions import graph

    ids = d.select("doc_id")
    fwd = (
        ids.select((F.col("doc_id") + 1).alias("src_next"),
                   F.col("doc_id").alias("src"))
        .join(ids.select(F.col("doc_id").alias("src_next")), "src_next")
        .select("src", F.col("src_next").alias("dst"))
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return graph.pagerank(edges, iterations=4)


def _chain_edges(d):
    """Symmetric chain over doc ids (|E| ≈ 2|V|), shared by the
    graph-shaped growth probes."""
    ids = d.select("doc_id")
    fwd = (
        ids.select((F.col("doc_id") + 1).alias("src_next"),
                   F.col("doc_id").alias("src"))
        .join(ids.select(F.col("doc_id").alias("src_next")), "src_next")
        .select("src", F.col("src_next").alias("dst"))
    )
    return fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def _kcore_chain(d):
    """k-core peel on the chain at k=2: interior nodes form the near-
    fixpoint, endpoints peel — per-round cost is the probe target."""
    from twitter_to_sqlite_spark.functions import graph

    return graph.kcore(_chain_edges(d), k=2, rounds=3)


def _lpa_chain(d):
    from twitter_to_sqlite_spark.functions import graph

    return graph.label_propagation(_chain_edges(d), rounds=3)


def _bloom_probe(d):
    """Fact = all ids, dim = ~1%% of ids: build cost is dim-linear,
    probe cost fact-linear — the ratio should track rows."""
    from twitter_to_sqlite_spark.functions import bloom

    fact = d.select("doc_id", F.length("text").alias("val"))
    dim = d.select("doc_id").filter(F.col("doc_id") % 97 == 0)
    return bloom.bloom_prune_join(fact, dim, "doc_id")


def _incremental_agg_probe(d):
    from twitter_to_sqlite_spark.operators import relational as R

    e = d.select("doc_id", "lang", F.length("text").alias("val"))
    base = e.filter(F.col("doc_id") % 11 != 0)
    base_agg = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("val").alias("n_vals"),
        F.sum(F.col("val").cast("decimal(18,4)")).alias("v_sum"))
    changes = e.filter(F.col("doc_id") % 11 == 0).withColumn(
        "w", F.lit(1))
    delta = R.weighted_delta_agg(changes, ["lang"], "w", "val")
    return R.merge_agg_delta(base_agg, delta, ["lang"])


def _zorder_probe(d):
    from twitter_to_sqlite_spark.operators import bucketing

    pts = d.select((F.col("doc_id") % 256).alias("x"),
                   (F.expr("doc_id div 256") % 256).alias("y"))
    return bucketing.zorder_layout_stats(pts, "x", "y",
                                         bits=8, n_files=64)


def _auc_probe(d):
    """ROC-AUC growth probe: label/score derived per-row from the doc
    id (portable-hash score rounded to 4 decimals — the catalog's
    probability granularity). The corpus collapses to ≤10⁴ score
    groups before the single-partition window, so growth should track
    the scan, never the window."""
    from twitter_to_sqlite_spark.functions import stats

    scored = d.select(
        (F.col("doc_id") % 3 == 0).cast("int").alias("y"),
        F.round(
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                               1, 4), 16, 10).cast("double") / 65536.0,
            4).alias("prob"),
    )
    return stats.roc_auc(scored)


def _embedding_profile_probe(v):
    from twitter_to_sqlite_spark.functions import stats

    return stats.embedding_profile(v, "embedding")


def _join_size_probe(d):
    """Key domain grows linearly with the corpus (doc_id div 4 — ~4
    rows per key at every scale); estimator cost must track the scan,
    never the domain (the sample stays k keys)."""
    from twitter_to_sqlite_spark.functions import sketch

    keyed = d.select(F.expr("doc_id div 4").alias("k"))
    return sketch.join_size_estimate(keyed, keyed, "k", k=256)


def _shard_probe(d):
    from twitter_to_sqlite_spark.operators import bucketing

    return bucketing.shard_move_stats(d, "doc_id", 8, 12)


def _hard_neg_probe(v):
    """Query set fixed (5 vectors), corpus grows: the brute-force
    scan-and-rank must grow linearly in the corpus."""
    from twitter_to_sqlite_spark.functions import similarity

    lab = v.withColumn("label", (F.col("vec_id") % 2).cast("int"))
    return similarity.hard_negative_topk(
        lab, lab.filter(F.col("vec_id") < 5), k=3)


def _bpe_probe(d):
    from twitter_to_sqlite_spark.functions import bpe

    return bpe.bpe_train(d, "text", merges=4)


def _vocab_cov_probe(d):
    from twitter_to_sqlite_spark.functions import text as T

    uni = (d.select(F.explode(T._tokens(F.col("text"))).alias("w"))
           .groupBy("w").agg(F.count(F.lit(1)).alias("c")))
    top = uni.orderBy(F.col("c").desc(), "w").limit(500)
    tot = uni.agg(F.count(F.lit(1)).alias("n_distinct"),
                  F.sum("c").alias("n_total"))
    cov = top.agg(F.sum("c").alias("covered"))
    return cov.crossJoin(F.broadcast(tot))


def _interval_probe(d):
    """Interval-join growth probe: ts = doc_id seconds (replica id
    offsets push each replica into a disjoint time range, so event
    DENSITY stays constant as the corpus grows — the realistic regime:
    more data means more history, not more events per second); every
    10th row opens a 300 s window. Candidates per window stay ~300 at
    every scale, so linear growth is the bar."""
    from twitter_to_sqlite_spark.operators import relational as R

    ev = d.select(
        "doc_id", F.timestamp_seconds(F.col("doc_id")).alias("ts"))
    iv = ev.filter(F.col("doc_id") % 10 == 0).select(
        F.col("doc_id").alias("iv_id"),
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 300 SECONDS")).alias("e"),
    )
    j = R.interval_join(ev.select("doc_id", "ts"), iv, "ts", "s", "e",
                        bucket_seconds=300.0)
    return j.groupBy("iv_id").agg(F.count(F.lit(1)).alias("n"))


def _funnel_probe(d, within_seconds=None):
    """Funnel growth probe: ~50 synthetic events per user (user ids
    disjoint across replicas), event type cycling through the steps —
    per-user state is constant, so linear growth is the bar.
    ``within_seconds`` probes the windowed form (r5) on the same
    stream."""
    from twitter_to_sqlite_spark.operators import relational as R

    ev = d.select(
        (F.col("doc_id") - (F.col("doc_id") % 50)).alias("user_id"),
        F.timestamp_seconds(F.col("doc_id")).alias("ts"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("event_type"),
    )
    return R.funnel(ev, "user_id", "ts", "event_type",
                    ["view", "click", "purchase"],
                    within_seconds=within_seconds)


def _triangle_chain(d):
    """Triangle growth probe: chain graph with chords (i↔i+1, i↔i+2 —
    degree ≤ 4, one triangle per consecutive id triple), built by
    distributed self-joins; |E| and triangles both scale exactly with
    rows, so the measured growth is the counter's."""
    from twitter_to_sqlite_spark.functions.graph import triangle_count

    ids = d.select("doc_id")
    edges = None
    for step in (1, 2):
        e = (
            ids.select((F.col("doc_id") + step).alias("nxt"),
                       F.col("doc_id").alias("src"))
            .join(ids.select(F.col("doc_id").alias("nxt")), "nxt")
            .select("src", F.col("nxt").alias("dst"))
        )
        edges = e if edges is None else edges.unionByName(e)
    return triangle_count(edges)


def _entity_clusters_probe(d):
    """End-to-end ER growth probe (r5): match + min-label components +
    dictionary labeling. Same regimes as _entity_probe; the component
    iteration adds rounds proportional to cluster diameter (constant
    here), so the bar matches entity_match's."""
    from twitter_to_sqlite_spark.functions import entity

    named = d.select(
        F.regexp_extract("text", r"^(\S+\s+\S+)", 1).alias("nm"))
    blocks = [F.regexp_extract("name", r"^(\S+)", 1),
              F.regexp_extract("name", r"(\S+)$", 1)]
    return entity.cluster_entities(named.filter(F.col("nm") != ""),
                                   "nm", blocks, max_distance=3,
                                   max_block=10000)


def _scd2_probe(d):
    """SCD2 growth probe (r5): ~50-change stream per key, attribute
    cycling — two windows on one key shuffle, so linear is the bar."""
    from twitter_to_sqlite_spark.operators import relational as R

    ev = d.select(
        (F.col("doc_id") - (F.col("doc_id") % 50)).alias("k"),
        F.col("doc_id").alias("event_id"),
        F.timestamp_seconds(F.col("doc_id")).alias("ts"),
        (F.col("doc_id") % 3).cast("string").alias("attr"),
    )
    return R.scd2_history(ev, ["k"], "event_id", "ts", ["attr"])


def _entity_probe(d):
    """ER growth probe over the doc texts' two leading tokens as the
    'name': with --distinct the salted tokens keep every blocking key
    replica-local (block count grows, block SIZE does not → linear);
    without it the name dictionary is scale-invariant and the probe
    should stay FLAT — the dictionary reduction visibly decoupling
    cost from row count."""
    from twitter_to_sqlite_spark.functions import entity

    named = d.select(
        F.regexp_extract("text", r"^(\S+\s+\S+)", 1).alias("nm"))
    blocks = [F.regexp_extract("name", r"^(\S+)", 1),
              F.regexp_extract("name", r"(\S+)$", 1)]
    return entity.match_names(named.filter(F.col("nm") != ""), "nm",
                              blocks, max_distance=3, max_block=10000)


def capstone(n: int, sf_dir: str) -> None:
    """Composed end-to-end demo (VERDICT r3 #8): the full
    training-data pipeline — curate (PII→Gopher→exact-dedup→split→
    sharded write), MinHash near-dup sweep (pairs→components→
    keep-best) over the curated train split, and the shard manifest —
    run as ONE composition at 1× and N× corpus scale.

    The N× corpus uses the independent-growth regime (every token
    salted per replica) PLUS a planted near-copy of each low-id doc
    inside every replica, so the duplicate RATE is scale-invariant —
    the realistic shape of corpus growth. Prints one JSON line:
    per-stage seconds and the funnel at both scales.
    """
    import shutil
    import tempfile

    from twitter_to_sqlite_spark.functions import curate
    from twitter_to_sqlite_spark.operators import relational as R

    def replicate_curatable(d, k):
        """Replica j salts every 5th token (offset by j): shingle-level
        Jaccard across replicas drops to ~0.25 (<< the 0.71 LSH knee)
        so replicas are NOT near-dups of each other, while ~80% of
        stopwords survive so the Gopher gate still sees natural text —
        the scale-invariant-duplicate-rate growth a real corpus has.
        (The --distinct regime salts EVERY token, which is right for
        pure dedup throughput but starves a stopword-based gate.)"""
        out = None
        for j in range(k):
            if j == 0:
                txt = F.col("text")
            else:
                toks = F.split(F.col("text"), " ")
                txt = F.array_join(
                    F.transform(
                        toks,
                        _salt_every_fifth(j),
                    ),
                    " ",
                )
            r = d.select(
                (F.col("doc_id") + j * 10_000_000).alias("doc_id"),
                txt.alias("text"),
                "lang",
            )
            out = r if out is None else out.unionByName(r)
        return out

    def _salt_every_fifth(j):
        # closure factory, not default args: PySpark reads HOF arity
        # from the lambda signature
        return lambda x, i: F.when(
            i % 5 == j % 5, F.concat(x, F.lit(f"x{j}"))
        ).otherwise(x)

    spark = get_spark("capstone")
    docs = tables.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    # every replica carries its own near-dup cluster seeds (originals
    # with one appended token, offset +5M stays inside the replica's
    # 10M id range)
    aug = docs.unionByName(
        docs.filter(F.col("doc_id") < 2000).select(
            (F.col("doc_id") + 5_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
            "lang",
        )
    )
    base = tempfile.mkdtemp(prefix="capstone-")
    out = {"n": n, "sf_dir": sf_dir, "scales": {}}
    try:
        for label, k in (("1x", 1), (f"{n}x", n)):
            ipath = f"{base}/in_{label}"
            opath = f"{base}/out_{label}"
            replicate_curatable(aug, k).write.parquet(ipath)
            res = {}
            t0 = time.perf_counter()
            stats = curate.run_curate(spark, ipath, opath, n_shards=32)
            res["curate_s"] = round(time.perf_counter() - t0, 2)
            res["funnel"] = {k2: v for k2, v in stats.items() if k2 != "out"}
            train = spark.read.parquet(f"{opath}/curated").filter(
                F.col("split") == "train")
            t0 = time.perf_counter()
            pairs = dedup.minhash_lsh_pairs(
                train, "doc_id", "text", k=3, num_hashes=16, bands=4)
            comp = dedup.near_dup_components(pairs)
            keep = (
                train.join(comp.withColumnRenamed("id", "doc_id"),
                           "doc_id", "left")
                .select("doc_id", "text",
                        F.coalesce("component", "doc_id").alias("component"))
                .groupBy("component")
                .agg(F.max_by("doc_id",
                              F.struct(F.length("text"),
                                       (-F.col("doc_id")))).alias("kept"),
                     F.count(F.lit(1)).alias("n_members"))
            )
            clusters = keep.filter(F.col("n_members") > 1).count()
            res["near_dup_s"] = round(time.perf_counter() - t0, 2)
            res["dup_clusters"] = clusters
            t0 = time.perf_counter()
            shards = spark.read.parquet(f"{opath}/train_shards")
            manifest = R.facet_count(shards, "shard", "n_docs")
            res["n_shards"] = manifest.count()
            res["manifest_s"] = round(time.perf_counter() - t0, 2)
            out["scales"][label] = res
            print(f"# capstone {label}: {res}", file=sys.stderr, flush=True)
        one, big = out["scales"]["1x"], out["scales"][f"{n}x"]
        out["ratios"] = {
            s: round(big[f"{s}_s"] / max(one[f"{s}_s"], 1e-9), 1)
            for s in ("curate", "near_dup", "manifest")
        }
    finally:
        shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out))


def _training_order_probe(d):
    from twitter_to_sqlite_spark.functions import sampling

    return sampling.training_order(d.select("doc_id"), "doc_id", 8)


def _sequence_pack_probe(d):
    from twitter_to_sqlite_spark.functions import sampling

    toks = d.select("doc_id", F.size(F.split("text", " ")).alias("n_toks"))
    return sampling.sequence_pack(toks, "doc_id", "n_toks", 8, 128)


def _bpe_segment_probe(d):
    from twitter_to_sqlite_spark.functions import bpe

    merges = [(i + 1, a, b, 1) for i, (a, b) in enumerate(
        [("t", "h"), ("th", "e"), ("a", "n"), ("an", "d"),
         ("i", "n"), ("o", "r"), ("e", "r"), ("s", "t")])]
    return bpe.bpe_segment(d, merges, "text", "doc_id")


def _curriculum_probe(d):
    from twitter_to_sqlite_spark.functions import sampling

    b = d.select("doc_id", (F.col("doc_id") % 4).cast("int").alias("bucket"))
    return sampling.curriculum_order(b, "doc_id", "bucket", 8)


def _paragraph_incr_probe(d):
    from twitter_to_sqlite_spark.functions import dedup

    stored = dedup.paragraph_hash_counts(
        d.filter(F.col("doc_id") % 2 == 0), sep=" ")
    return dedup.paragraph_dedup_incremental(
        d.filter(F.col("doc_id") % 2 == 1), stored, sep=" ", min_count=2)


def _auc_bootstrap_probe(d):
    from twitter_to_sqlite_spark.functions import stats

    scored = d.select(
        "doc_id",
        ((F.col("doc_id") % 3) == 0).cast("int").alias("y"),
        (F.round((F.col("doc_id") % 97) / 97.0, 4)).alias("prob"),
    )
    return stats.auc_bootstrap(scored)


def _dsir_probe(d):
    from twitter_to_sqlite_spark.functions import sampling

    return sampling.dsir_logweights(d, F.col("doc_id") % 3 == 0)


def _retrieval_eval_probe(d):
    from twitter_to_sqlite_spark.operators import relational as R

    spark = d.sparkSession
    qs = spark.createDataFrame(
        [(1, "spark"), (1, "join"), (2, "hash"), (2, "merge")],
        "query_id long, term string")
    return R.retrieval_eval(
        R.build_inverted_index(d, "doc_id", "text"), "doc_id", qs, k=10)


def _compaction_probe(d):
    from twitter_to_sqlite_spark.operators import bucketing

    manifest = (d.select((F.col("doc_id") % 997).alias("shard"),
                         F.length("text").cast("long").alias("b"))
                .groupBy("shard").agg(F.sum("b").alias("n_bytes")))
    return bucketing.compaction_plan(manifest, "shard", "n_bytes", 50_000)


def _qsplit(d):
    """base/cur quality frames over the doc_id parity split — the
    shared fixture shape of the drift-family probes."""
    q = text.quality_score(d.select("doc_id", "text"))
    return (q.filter(F.col("doc_id") % 2 == 0),
            q.filter(F.col("doc_id") % 2 == 1))


def _distmatch_probe(d):
    base, cur = _qsplit(d)
    rates = sampling.distribution_match_rates(
        cur.select("doc_id", "quality"), base.select("quality"),
        "quality", 10).localCheckpoint(eager=False)
    return sampling.distribution_match(
        cur.select("doc_id", "quality"), base.select("quality"),
        "quality", "doc_id", 10, salt="p", rates=rates)


def _emd_probe(d):
    from pyspark.sql import Window

    from twitter_to_sqlite_spark.streaming import analytics as SA

    base, cur = _qsplit(d)
    spark = d.sparkSession
    spine = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    g = (spine
         .join(SA.score_bin_counts(base.select("quality"))
               .withColumnRenamed("n", "__nb"), "bin", "left")
         .join(SA.score_bin_counts(cur.select("quality"))
               .withColumnRenamed("n", "__nc"), "bin", "left")
         .select("bin", F.coalesce("__nb", F.lit(0)).alias("nb"),
                 F.coalesce("__nc", F.lit(0)).alias("nc"))
         .localCheckpoint(eager=False))
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    c = g.select("bin", F.sum("nb").over(w).alias("cb"),
                 F.sum("nc").over(w).alias("cc"))
    tot = g.agg(F.sum("nb").alias("tb"), F.sum("nc").alias("tc"))
    return (c.crossJoin(F.broadcast(tot))
            .agg(F.sum(F.abs(F.col("cb") * F.col("tc")
                             - F.col("cc") * F.col("tb"))).alias("s")))


def _psi_by_probe(d):
    base, cur = _qsplit(d)
    src = (F.col("doc_id") % 20).cast("string").alias("source")
    b = F.least(F.floor(F.col("quality") * 10).cast("int"), F.lit(9))

    def counts(side, alias):
        return (side.select(src, b.alias("bin"))
                .groupBy("source", "bin")
                .agg(F.count(F.lit(1)).alias(alias)))

    g = (counts(base, "nb").join(counts(cur, "nc"),
                                 ["source", "bin"], "full")
         .select("source", "bin",
                 F.coalesce("nb", F.lit(0)).alias("nb"),
                 F.coalesce("nc", F.lit(0)).alias("nc"))
         .localCheckpoint(eager=False))
    tot = g.groupBy("source").agg(F.sum("nb").alias("tb"),
                                  F.sum("nc").alias("tc"))
    return g.join(tot, "source").groupBy("source").agg(
        F.sum(F.col("nb") * F.col("tc")
              - F.col("nc") * F.col("tb")).alias("s"))


def _zipf_probe(d):
    from pyspark.sql import Window

    toks = d.select(F.explode(F.split(F.lower("text"), r"\W+"))
                    .alias("w")).filter(F.col("w") != "")
    top = (toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
           .orderBy(F.col("c").desc(), "w").limit(100))
    w = Window.orderBy(F.col("c").desc(), "w")
    return (top.withColumn("r", F.row_number().over(w))
            .agg(F.sum(F.log("r") * F.log("c")).alias("sxy"),
                 F.sum(F.log("r")).alias("sx")))


def _length_sweep_probe(d):
    hist = (d.select(F.size(F.split("text", " ")).alias("len"))
            .groupBy("len")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("len").alias("t"))
            .localCheckpoint(eager=False))
    taus = d.sparkSession.createDataFrame(
        [(5,), (20,), (80,)], "tau int")
    return (taus.crossJoin(hist).filter(F.col("len") >= F.col("tau"))
            .groupBy("tau").agg(F.sum("n").alias("n_kept"),
                                F.sum("t").alias("toks_kept")))


def _dup_source_probe(d):
    pairs = dedup.ngram_jaccard_pairs(
        d, "doc_id", "text", k=3, threshold=0.3, max_df=20) \
        .select("id_a", "id_b").localCheckpoint(eager=False)
    src = d.select("doc_id", (F.col("doc_id") % 20).cast("string")
                   .alias("source"))
    return (pairs
            .join(src.select(F.col("doc_id").alias("id_a"),
                             F.col("source").alias("sa")), "id_a")
            .join(src.select(F.col("doc_id").alias("id_b"),
                             F.col("source").alias("sb")), "id_b")
            .groupBy("sa", "sb").agg(F.count(F.lit(1)).alias("n")))


def _bm25_tuning_probe(d):
    from twitter_to_sqlite_spark.operators import relational as R

    idx = R.build_inverted_index(d, "doc_id", "text") \
        .localCheckpoint(eager=False)
    qs = d.sparkSession.createDataFrame(
        [(1, "the"), (1, "and"), (2, "of"), (2, "to")],
        "query_id long, term string")
    return R.bm25_param_sweep(idx, "doc_id", qs,
                              [(1.2, 0.75), (0.9, 0.4)], k=5)


def _fertility_probe(d):
    seg = _bpe_segment_probe(d)
    return (seg.join(d.select("doc_id", "lang"), "doc_id")
            .groupBy("lang")
            .agg(F.sum("n_words").alias("w"),
                 F.sum("n_bpe_tokens").alias("t")))


def _partition_ck_probe(d):
    h = F.conv(F.substring(F.md5(F.concat_ws(
        "|", F.col("doc_id").cast("string"), F.col("text"))), 1, 15),
        16, 10).cast("long") % F.lit(1_000_000_007)
    return (d.groupBy((F.col("doc_id") % 5).alias("pk"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(h.cast("decimal(38,0)")).alias("s")))


def _changelog_probe(d):
    from twitter_to_sqlite_spark.operators import relational as R

    k = F.col("doc_id")
    base = d.select("doc_id", F.length("text").cast("double").alias("p"))
    ch = (base.filter(k % 5 == 0).select(
              "doc_id", F.lit("insert").alias("op"),
              F.lit(1).alias("seq"), "p")
          .unionByName(base.filter(k % 5 == 0).select(
              "doc_id", F.lit("update").alias("op"),
              F.lit(2).alias("seq"), (F.col("p") * 2).alias("p")))
          .unionByName(base.filter(k % 7 == 0).select(
              "doc_id", F.lit("delete").alias("op"),
              F.lit(3).alias("seq"), "p")))
    return R.changelog_compact(ch, ["doc_id"], "op", "seq", ["p"])


def main():
    only = None
    for a in list(sys.argv[1:]):
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
            sys.argv.remove(a)
    args = [a for a in sys.argv[1:] if a not in ("--distinct", "--capstone")]
    distinct = "--distinct" in sys.argv[1:]
    n = int(args[0]) if args else 10
    if "--capstone" in sys.argv[1:]:
        capstone(n, args[1] if len(args) > 1 else os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
        return
    sf_dir = args[1] if len(args) > 1 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("scale-probe")
    docs = tables.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang")
    vecs = tables.load_table(spark, sf_dir, "embeddings")
    # Materialize the replicated inputs to parquet so both scales read
    # from a scan (not an in-memory union) — same physical shape as a
    # real corpus, and replication cost is excluded from the timings.
    import atexit
    import shutil
    import tempfile
    base = tempfile.mkdtemp(prefix="scaleprobe-")
    # replicated corpora reach 100x sf0.1 (~150 MB) — never leave
    # them behind when the probe exits
    atexit.register(shutil.rmtree, base, ignore_errors=True)
    d1p, dnp = f"{base}/d1", f"{base}/dn"
    v1p, vnp = f"{base}/v1", f"{base}/vn"
    replicate_docs(docs, 1, distinct).write.parquet(d1p)
    replicate_docs(docs, n, distinct).write.parquet(dnp)
    replicate_vecs(vecs, 1, distinct).write.parquet(v1p)
    replicate_vecs(vecs, n, distinct).write.parquet(vnp)

    def load(p):
        return spark.read.parquet(p)

    def d1v():
        return load(v1p)

    _pq_cache: dict = {}

    def _pq_art(v1):
        # trained once, on the 1x vectors, OUTSIDE the timed loop
        # (the probes' warm call pays it)
        if not _pq_cache:
            _pq_cache["books"] = similarity.pq_codebooks(
                v1, m=4, ksub=16, iters=1, dim=64)
            _pq_cache["cents"] = similarity.kmeans_centroids(
                v1, 8, iters=1)
        return _pq_cache

    OPS = {
        "minhash_lsh": lambda d, v: dedup.minhash_lsh_pairs(
            d, "doc_id", "text", k=3, num_hashes=16, bands=4),
        "simhash": lambda d, v: dedup.simhash_pairs(d, "doc_id", "text"),
        "jaccard_dfcap": lambda d, v: dedup.ngram_jaccard_pairs(
            d, "doc_id", "text", k=3, threshold=0.5, max_df=20),
        "substring_spans": lambda d, v: dedup.duplicate_spans(d),
        "substring_spans_keep_first":
            lambda d, v: dedup.duplicate_spans_keep_first(d),
        "tfidf_terms": lambda d, v: text.tfidf_top_terms(d, group_col="lang"),
        "gopher": lambda d, v: text.gopher_filter(d),
        "classifier_score": lambda d, v: classifier.logreg_score(
            classifier.quality_features(d), [0.1, 0.2, 0.3, 0.4, 0.5]),
        "semdedup": lambda d, v: similarity.semdedup_pairs(
            v, similarity.kmeans_centroids(v, 8, iters=1), threshold=0.95,
            max_cell=5000),
        "embed_near_dup": lambda d, v: similarity.embedding_near_dup_pairs(
            v, threshold=0.95, dims=[0, 8, 16, 24], max_bucket=5000),
        "dup_ngram_frac": lambda d, v: dedup.dup_ngram_stats(
            d, "doc_id", "text", k=3),
        "sq8_topk": lambda d, v: similarity.sq8_topk(
            v, v.filter(F.col("vec_id") < 5), k=3, candidates=10),
        # ann_tuning's exact leg: fixed query set, corpus-linear
        # broadcast-scan-and-rank — the 100 TB recall yardstick
        "ann_exact": lambda d, v: similarity.brute_force_topk(
            v, v.filter(F.col("vec_id") < 5), k=10),
        # PQ / IVF+PQ probe paths: quantizers trained ONCE on the 1x
        # corpus (a production index applies a trained quantizer to
        # new data), so the measured growth is encode+rank, not
        # training
        "ann_pq": lambda d, v: similarity.pq_topk(
            v, v.filter(F.col("vec_id") < 5), _pq_art(d1v())["books"],
            k=3, candidates=10),
        "ann_ivfpq": lambda d, v: similarity.ivfpq_topk(
            v, v.filter(F.col("vec_id") < 5), _pq_art(d1v())["cents"],
            _pq_art(d1v())["books"], k=3, n_probe=2, candidates=10),
        # symmetrized doc->doc edge list from shared rare shingles is
        # data-dependent; for a pure growth probe use a synthetic ring
        # over the doc ids (|E| = 2|V| exactly, at both scales)
        "pagerank_ring": lambda d, v: _pagerank_ring(d),
        "interval_join": lambda d, v: _interval_probe(d),
        "funnel": lambda d, v: _funnel_probe(d),
        "triangle_chain": lambda d, v: _triangle_chain(d),
        "entity_match": lambda d, v: _entity_probe(d),
        # --- r5 operators ---
        "entity_clusters": lambda d, v: _entity_clusters_probe(d),
        "scd2_history": lambda d, v: _scd2_probe(d),
        "funnel_windowed": lambda d, v: _funnel_probe(
            d, within_seconds=10.0),
        "sketch_topk": lambda d, v: sketch.sample_topk(
            d.select(F.regexp_extract("text", r"^(\S+)", 1)
                     .alias("tok")).filter(F.col("tok") != ""),
            "tok", k=256, top=20),
        "kmv_by": lambda d, v: sketch.kmv_distinct_by(
            d, "lang", "doc_id", k=256),
        # --- r5 late additions ---
        "boilerplate": lambda d, v: dedup.boilerplate_stats(
            d.withColumn("source", (F.col("doc_id") % 20)
                         .cast("string")),
            "source", "doc_id", "text", k=2, min_frac=0.5),
        "containment": lambda d, v: dedup.containment_pairs(
            d, "doc_id", "text", k=3, threshold=0.9, max_df=20),
        "bloom_prune": lambda d, v: _bloom_probe(d),
        "kcore_chain": lambda d, v: _kcore_chain(d),
        "lpa_chain": lambda d, v: _lpa_chain(d),
        "incremental_agg": lambda d, v: _incremental_agg_probe(d),
        "zorder": lambda d, v: _zorder_probe(d),
        # --- r5 eval/monitoring metrics ---
        "novelty": lambda d, v: dedup.novelty_stats(
            d.filter(F.col("doc_id") % 2 == 1),
            d.filter(F.col("doc_id") % 2 == 0), k=3),
        "pmi": lambda d, v: text.pmi_collocations(
            d, "text", min_count=3, top_k=20),
        "roc_auc": lambda d, v: _auc_probe(d),
        "embedding_profile": lambda d, v: _embedding_profile_probe(v),
        "join_size_estimate": lambda d, v: _join_size_probe(d),
        "shard_rebalance": lambda d, v: _shard_probe(d),
        "hard_negatives": lambda d, v: _hard_neg_probe(v),
        "vocab_coverage": lambda d, v: _vocab_cov_probe(d),
        # BPE: corpus scan once, then rounds on the word DICTIONARY —
        # with non-distinct replication the dictionary barely grows, so
        # near-flat scaling is the bar; distinct replicas grow it ~n×
        "bpe_train": lambda d, v: _bpe_probe(d),
        # --- r6 operators ---
        # word-granularity paragraphs: the finest (adversarial) split,
        # one count key per token occurrence
        "paragraph_dedup": lambda d, v: dedup.paragraph_dedup(
            d, "doc_id", "text", sep=" ", min_count=2),
        "training_order": lambda d, v: _training_order_probe(d),
        "sequence_pack": lambda d, v: _sequence_pack_probe(d),
        # segment with a fixed literal merge table: dictionary-sized
        # folds + one word-key join — near-flat under non-distinct
        # replication (the dictionary barely grows)
        "bpe_segment": lambda d, v: _bpe_segment_probe(d),
        "curriculum_order": lambda d, v: _curriculum_probe(d),
        "paragraph_incr": lambda d, v: _paragraph_incr_probe(d),
        "auc_bootstrap": lambda d, v: _auc_bootstrap_probe(d),
        # --- r7 batch-2 operators ---
        # two bigram-stream aggs + ≤64-row broadcast: linear is the bar
        "dsir": lambda d, v: _dsir_probe(d),
        # Σ cell² within k-means cells. The IVF scale discipline is
        # k ≈ √n (FAISS convention): assignment n·k and pair
        # generation n·(n/k) then BOTH grow as n^1.5 — ratio ≈ 10^1.5
        # /10 ≈ 3.2 per decade is the bar, not 1.0 (fixed k would make
        # pairs quadratic; k ∝ n would make assignment quadratic).
        "knn_graph": lambda d, v: similarity.knn_graph(
            v, similarity.kmeans_centroids(
                v, max(8, math.isqrt(v.count())), iters=1), k=5,
            max_cell=5000),
        # pairs build (df-capped) + 5 multiply columns + 1-row agg
        "lsh_planner": lambda d, v: dedup.lsh_band_plan(
            dedup.ngram_jaccard_pairs(d, "doc_id", "text", k=3,
                                      threshold=0.3, max_df=20)),
        "retrieval_eval": lambda d, v: _retrieval_eval_probe(d),
        # manifest-sized planner: growth should track the GROUP agg,
        # the window itself stays |shards|-bounded
        "compaction_plan": lambda d, v: _compaction_probe(d),
        "changelog_compact": lambda d, v: _changelog_probe(d),
        "source_diversity": lambda d, v: text.distinct_ngram_diversity(
            d.withColumn("source", (F.col("doc_id") % 20)
                         .cast("string")), "source"),
        # --- r7 batch-3 operators ---
        # two count-collapsed rank maps + a joint-domain join: growth
        # tracks the DOMAIN (distinct lengths), near-flat per row
        "spearman": lambda d, v: stats.spearman_rho(
            d.select(F.length("text").alias("x"),
                     F.size(F.split("text", " ")).cast("long")
                     .alias("y")), "x", "y"),
        # one posexplode scan to a 16x2x|labels| cube: linear scan bar
        "mutual_info": lambda d, v: stats.mutual_info_bits(
            v.withColumn("label", (F.col("vec_id") % 10).cast("int"))),
        # joinless centroid scoring: one corpus scan + |labels| agg
        "label_noise": lambda d, v: similarity.centroid_label_noise(
            v.withColumn("label", (F.col("vec_id") % 10).cast("int"))),
        # broadcast eval x one fused corpus scan: linear bar
        "semantic_decon": lambda d, v: similarity.semantic_contamination(
            v, d1v().filter(F.col("vec_id") < 20)),
        # corpus -> length histogram once; schemes priced on histogram
        "padding_waste": lambda d, v: sampling.padding_waste(
            d.select(F.size(F.split("text", " ")).cast("long")
                     .alias("n")), "n",
            {"coarse": [32, 64, 128], "fine": [16, 32, 48, 64, 96, 128]}),
        # fused symbol/keyword projection + per-source agg: scan-speed
        "code_detect": lambda d, v: text.code_detect(d)
        .groupBy((F.col("doc_id") % 20).alias("src"))
        .agg(F.sum(F.col("is_code").cast("long")).alias("n")),
        # --- r7 batch-4 operators ---
        # one conditional agg over the gopher flags: scan-speed bar
        "gate_ablation": lambda d, v: text.gate_ablation(d),
        # explode + two keyed aggs; per-doc term lists bounded by the
        # doc's own vocabulary — linear is the bar
        "token_entropy": lambda d, v: text.token_entropy(d),
        # --- r7 batch-5 operators ---
        # count-collapsed medians: growth tracks the rounded value
        # DOMAIN, which barely grows under replication — flat bar
        "mad_outliers": lambda d, v: stats.mad_outliers(
            d.select((F.col("doc_id") % 20).cast("string").alias("g"),
                     (F.length("text") % 97).cast("double").alias("x")),
            "g", "x"),
        # one token agg + count-of-counts window (~sqrt(N) rows)
        "vocab_sweep": lambda d, v: text.vocab_coverage_sweep(
            d, "text", [50, 500, 5000]),
        # 136-term inline outer product + map-side-combined agg
        "embed_covariance": lambda d, v: stats.embed_covariance(
            v, n_dims=16),
        # --- r8: probes for the staged entries that had neither a
        # --- pin nor a probe (VERDICT r7 task 5); scan-shaped only —
        # --- the bounded-by-construction ones carry pins instead.
        # one normalized-hash partial-agg shuffle: linear bar
        "dedup_normalized": lambda d, v: dedup.normalized_dedup(d),
        # two quality histograms -> checkpointed 10-bin rates ->
        # broadcast filter: growth is the two scans, linear bar
        "distribution_match": lambda d, v: _distmatch_probe(d),
        # same two histograms + bounded cumsum window: linear bar
        "emd_drift": lambda d, v: _emd_probe(d),
        # per-source histograms -> bounded |sources|x bins cube
        "psi_drift_by": lambda d, v: _psi_by_probe(d),
        # token agg + TakeOrderedAndProject top-k + <=k-row window
        "zipf_fit": lambda d, v: _zipf_probe(d),
        # corpus -> length histogram once; taus priced on histogram
        "length_sweep": lambda d, v: _length_sweep_probe(d),
        # one strata partial agg; alphas priced on |strata| frame
        "temperature_sweep": lambda d, v: sampling.temperature_sweep(
            d.select("lang", F.size(F.split("text", " "))
                     .cast("long").alias("n")), "lang", "n",
            [0.3, 0.5, 1.0]),
        # one strata agg + bounded rank window
        "gini_sources": lambda d, v: sampling.gini_concentration(
            d.select((F.col("doc_id") % 20).cast("string").alias("s"),
                     F.length("text").cast("long").alias("w")),
            "s", "w"),
        # (group, hour) agg + per-group bounded spine: hour domain
        # fixed under replication, counts grow — linear agg bar
        "fano_factor": lambda d, v: stats.fano_factor(
            d.select((F.col("doc_id") % 5).cast("string")
                     .alias("event_type"),
                     F.timestamp_seconds(F.col("doc_id") % 100_000)
                     .alias("ts")), "event_type", "ts"),
        # bounded pairs frame + source map joins + |sources|^2 agg
        "dup_source_matrix": lambda d, v: _dup_source_probe(d),
        # shared checkpointed index feeds all grid legs
        "bm25_tuning": lambda d, v: _bm25_tuning_probe(d),
        # segment sums re-aggregated per lang over a broadcast join
        "tokenizer_fertility": lambda d, v: _fertility_probe(d),
        # ONE grouped map-side-combined agg: the canonical linear bar
        "partition_checksums": lambda d, v: _partition_ck_probe(d),
    }
    out = {}
    for name, fn in OPS.items():
        if only is not None and name not in only:
            continue
        res = {}
        for label, (dp, vp) in (("t1", (d1p, v1p)), (f"t{n}", (dnp, vnp))):
            d, v = load(dp), load(vp)
            fn(d, v)  # warm: plan + codegen
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                force(fn(d, v))
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            res[label] = round(best, 2)
        res["ratio"] = round(res[f"t{n}"] / max(res["t1"], 1e-9), 1)
        out[name] = res
        print(f"# {name}: {res}", file=sys.stderr, flush=True)
    print(json.dumps(
        {"n": n, "sf_dir": sf_dir, "distinct": distinct, "ops": out}))


if __name__ == "__main__":
    main()
