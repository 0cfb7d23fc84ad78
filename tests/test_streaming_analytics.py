"""Streaming analytics tests: windowed counts with watermark, stream
dedup, and the applyInPandasWithState running-counts operator — run
with availableNow over file chunks, state checked across restarts."""

from __future__ import annotations

import json
import os

import pytest

from twitter_to_sqlite_spark.streaming import analytics, capture
from tests.test_streaming import minimal_tweet, write_chunk


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    return str(src), str(tmp_path / "out"), str(tmp_path / "ckpt")


def _tw(tid, minute, user_id=101):
    t = minimal_tweet(tid, f"tweet {tid}", user_id=user_id)
    t["created_at"] = f"Mon Feb 03 10:{minute:02d}:30 +0000 2020"
    return t


def run_stream(spark, src, out, ckpt, transform, output_mode="append"):
    stream = capture.read_tweet_stream(spark, src)
    q = (
        transform(stream)
        .writeStream.format("memory")
        .queryName(os.path.basename(out))
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {os.path.basename(out)}")


def test_tweets_per_window(spark, dirs):
    src, out, ckpt = dirs
    write_chunk(src, "c1.json", [
        _tw(1, 0), _tw(2, 0), _tw(3, 1), _tw(4, 5),
    ])
    res = run_stream(
        spark, src, out, ckpt,
        lambda s: analytics.tweets_per_window(s, "1 minute", "2 minutes"),
    )
    rows = {
        (str(r["window_start"]), r["n"]) for r in res.collect()
    }
    # availableNow + append emits finalized windows; the 10:05 window
    # closes only when a later watermark passes — finalized here by the
    # end-of-stream flush? No: append emits only closed windows, so
    # assert the two early windows.
    assert ("2020-02-03 10:00:00", 2) in rows
    assert ("2020-02-03 10:01:00", 1) in rows


def test_stream_dedup(spark, dirs):
    src, out, ckpt = dirs
    write_chunk(src, "c1.json", [_tw(1, 0), _tw(1, 0), _tw(2, 1)])
    res = run_stream(spark, src, out, ckpt, analytics.stream_dedup)
    assert sorted(r["id"] for r in res.collect()) == [1, 2]


def test_running_user_counts_stateful(spark, dirs):
    src, out, ckpt = dirs

    def run_once(collected):
        # foreachBatch sink: supports checkpoint recovery (memory sink
        # does not), so the second run restores the state store.
        stream = capture.read_tweet_stream(spark, src)
        q = (
            analytics.running_user_counts(stream)
            .writeStream.foreachBatch(
                lambda batch, bid: collected.extend(batch.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_chunk(src, "c1.json", [_tw(1, 0, 7), _tw(2, 1, 7), _tw(3, 1, 9)])
    rows1: list = []
    run_once(rows1)
    got = {r["user_id"]: (r["n_tweets"], r["last_id"]) for r in rows1}
    assert got == {7: (2, 2), 9: (1, 3)}

    # second batch: state persists across a restart from the checkpoint
    write_chunk(src, "c2.json", [_tw(10, 2, 7)])
    rows2: list = []
    run_once(rows2)
    got2 = {r["user_id"]: (r["n_tweets"], r["last_id"]) for r in rows2}
    assert got2[7] == (3, 10)  # 2 + 1 new, state carried over


def test_user_sessions_gap_and_close(spark, dirs):
    src, out, ckpt = dirs
    # user 101: bursts at 10:00-10:02 (one session) then 10:40 (a new
    # session after the 30-min gap); user 202: one lone tweet. A late
    # 11:59 sentinel advances the watermark far enough to close and
    # emit every earlier session under append mode.
    write_chunk(src, "c1.json", [
        _tw(1, 0, 101), _tw(2, 1, 101), _tw(3, 2, 101),
        _tw(4, 40, 101),
        _tw(5, 1, 202),
        _tw(6, 59, 303),  # sentinel — 10:59; watermark 1h short? use later file
    ])
    # second chunk far in the future so the watermark passes all
    # sessions above (watermark = max event time - 1h)
    late = minimal_tweet(99, "late", user_id=909)
    late["created_at"] = "Mon Feb 03 13:00:00 +0000 2020"
    write_chunk(src, "c2.json", [late])
    res = run_stream(
        spark, src, out, ckpt,
        lambda s: analytics.user_sessions(s, gap="30 minutes", watermark="1 hour"),
    )
    got = {
        (r["user_id"], str(r["session_start"]), r["n_tweets"])
        for r in res.collect()
    }
    assert (101, "2020-02-03 10:00:30", 3) in got   # burst merged into one session
    assert (101, "2020-02-03 10:40:30", 1) in got   # reopened after the gap
    assert (202, "2020-02-03 10:01:30", 1) in got


def test_trending_terms_topk(spark, dirs):
    """trending_terms emits finalized per-window term counts;
    topk_per_window ranks them deterministically."""
    src, out, ckpt = dirs
    write_chunk(src, "c1.json", [
        _tw(1, 0), _tw(2, 0), _tw(3, 1),
        _tw(4, 30),  # late-window tweet advances the watermark so the
                     # 10:00 window finalizes under availableNow
    ])
    res = run_stream(
        spark, src, out, ckpt,
        lambda s: analytics.trending_terms(s, "5 minutes", watermark="1 minute"),
    )
    rows = {(str(r["window_start"]), r["term"], r["n"]) for r in res.collect()}
    # tweets 1-3 all share the word "tweet" in minute 0/1 → one 10:00
    # window with n=3
    assert ("2020-02-03 10:00:00", "tweet", 3) in rows
    ranked = analytics.topk_per_window(
        spark.sql(f"select * from {os.path.basename(out)}"), k=1
    ).collect()
    by_window = {str(r["window_start"]): r for r in ranked}
    top = by_window.get("2020-02-03 10:00:00")
    assert top is not None and top["n"] == 3 and top["rank"] == 1


def test_streaming_curation_foreachbatch(spark, dirs, tmp_path):
    """Batch/stream unification for the curation pipeline: the SAME
    curate_flags plan runs inside foreachBatch on a document stream,
    and the union of per-batch outputs equals the one-shot batch run
    (dedup is per-batch here, as in any streaming dedup — the
    cross-batch form goes through the MinHash index store)."""
    import json as _json
    from pyspark.sql import functions as F
    from twitter_to_sqlite_spark.functions import curate

    src = tmp_path / "docs_in"
    src.mkdir()
    rows = [
        {"doc_id": i,
         "text": ("the quick brown fox jumps over the lazy dog and then "
                  "keeps going for quite a while longer " + f"u{i}")}
        for i in range(8)
    ] + [{"doc_id": 100, "text": "spam spam spam"}]
    (src / "chunk1.jsonl").write_text(
        "\n".join(_json.dumps(r) for r in rows))
    schema = "doc_id long, text string"
    stream = spark.readStream.schema(schema).json(str(src))
    got = []

    def on_batch(df, epoch_id):
        flagged = curate.curate_flags(df, steps=("pii", "gopher", "dedup"))
        got.extend(flagged.filter("keep").select("doc_id").collect())

    q = (
        stream.writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    want = {
        r["doc_id"]
        for r in curate.curate_flags(
            spark.read.schema(schema).json(str(src)),
            steps=("pii", "gopher", "dedup"),
        ).filter("keep").select("doc_id").collect()
    }
    assert {r["doc_id"] for r in got} == want
    assert 100 not in want and 0 in want


def _write_events(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for uid, minute, ty in rows:
            f.write(json.dumps({
                "user_id": uid,
                "ts": f"2024-01-01T00:{minute:02d}:00",
                "event_type": ty,
            }) + "\n")


def _read_event_stream(spark, src):
    schema = ("user_id long, ts timestamp_ntz, event_type string")
    return spark.readStream.schema(schema).json(src)


def test_funnel_stages_stateful_and_matches_batch(spark, dirs):
    """Streaming funnel: state carries across micro-batch restarts,
    and the final per-user stages aggregate to EXACTLY the batch
    funnel's step counts when events arrive in order — the automaton
    is shared, so batch and stream cannot drift."""
    src, out, ckpt = dirs
    steps = ["view", "click", "purchase"]
    latest: dict = {}

    def run_once():
        stream = _read_event_stream(spark, src)
        q = (
            analytics.funnel_stages(stream, steps)
            .writeStream.foreachBatch(
                lambda batch, bid: latest.update(
                    {r["user_id"]: r["stage"] for r in batch.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    c1 = [(1, 0, "view"), (1, 1, "click"), (2, 0, "view"),
          (3, 0, "click"), (3, 1, "error")]
    _write_events(src, "c1.json", c1)
    run_once()
    assert latest == {1: 2, 2: 1, 3: 0}

    # second chunk: user 1 converts, user 3 finally views — state
    # restored from the checkpoint across the restart.
    c2 = [(1, 2, "purchase"), (3, 2, "view"), (2, 1, "view")]
    _write_events(src, "c2.json", c2)
    run_once()
    assert latest == {1: 3, 2: 1, 3: 1}

    # batch/stream agreement: run the batch automaton over ALL events.
    import datetime as dt

    from twitter_to_sqlite_spark.operators import relational as R

    all_rows = [
        (u, dt.datetime(2024, 1, 1, 0, m), ty) for u, m, ty in c1 + c2
    ]
    bdf = spark.createDataFrame(
        all_rows, "user_id long, ts timestamp_ntz, event_type string")
    batch = {r.step: r.users
             for r in R.funnel(bdf, "user_id", "ts", "event_type",
                               steps).collect()}
    stream_counts = {
        k: sum(1 for s in latest.values() if s >= k) for k in (1, 2, 3)
    }
    assert batch == stream_counts


def test_funnel_stages_windowed_matches_batch(spark, dirs):
    """Windowed streaming funnel (within_seconds): the gap conjunct
    gates advances exactly like the batch windowed automaton — user 1
    clicks 1 min after viewing (inside a 2-min window), user 4 clicks
    5 min after viewing (outside), and the final stages aggregate to
    the batch windowed funnel's counts."""
    src, out, ckpt = dirs
    steps = ["view", "click", "purchase"]
    latest: dict = {}

    rows = [
        (1, 0, "view"), (1, 1, "click"), (1, 2, "purchase"),
        (4, 0, "view"), (4, 5, "click"),
        (5, 0, "view"), (5, 1, "click"), (5, 9, "purchase"),
    ]
    _write_events(src, "w1.json", rows)
    stream = _read_event_stream(spark, src)
    q = (
        analytics.funnel_stages(stream, steps, within_seconds=120.0)
        .writeStream.foreachBatch(
            lambda batch, bid: latest.update(
                {r["user_id"]: r["stage"] for r in batch.collect()}
            )
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert latest == {1: 3, 4: 1, 5: 2}

    import datetime as dt

    from twitter_to_sqlite_spark.operators import relational as R

    bdf = spark.createDataFrame(
        [(u, dt.datetime(2024, 1, 1, 0, m), ty) for u, m, ty in rows],
        "user_id long, ts timestamp_ntz, event_type string")
    batch = {r.step: r.users
             for r in R.funnel(bdf, "user_id", "ts", "event_type",
                               steps, within_seconds=120.0).collect()}
    stream_counts = {
        k: sum(1 for s in latest.values() if s >= k) for k in (1, 2, 3)
    }
    assert batch == stream_counts


def _write_value_events(src, name, rows):
    with open(os.path.join(src, name), "w") as f:
        for uid, minute, val in rows:
            f.write(json.dumps({
                "user_id": uid,
                "ts": f"2024-01-01T00:{minute:02d}:00",
                "value": val,
            }) + "\n")


def test_zscore_stream_matches_batch(spark, dirs):
    """Streaming trailing z-score: ring-buffer state carries across
    micro-batch restarts, each event scored against its PRECEDING
    history only, and the per-event scores agree with the batch
    trailing_zscore over the full stream."""
    src, out, ckpt = dirs
    got: dict = {}

    def run_once():
        stream = (spark.readStream
                  .schema("user_id long, ts timestamp_ntz, value double")
                  .json(src))
        q = (
            analytics.zscore_stream(stream, "user_id", "ts", "value",
                                    window=8, min_points=4,
                                    threshold=2.0)
            .writeStream.foreachBatch(
                lambda batch, bid: got.update(
                    {(r["user_id"], r["ts"]): (r["zscore"],
                                               r["is_anomaly"])
                     for r in batch.collect()}
                )
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    base = [10.0, 10.2, 9.8, 10.1]
    c1 = [(1, i, v) for i, v in enumerate(base)]
    _write_value_events(src, "z1.json", c1)
    run_once()
    # second chunk lands AFTER a restart: the buffer must have been
    # restored for the spike to be scored against the stable history
    c2 = [(1, 4, 9.9), (1, 5, 50.0), (1, 6, 10.0)]
    _write_value_events(src, "z2.json", c2)
    run_once()

    import datetime as dt

    from twitter_to_sqlite_spark.operators import relational as R

    rows = [(u, dt.datetime(2024, 1, 1, 0, m), v) for u, m, v in c1 + c2]
    bdf = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, value double")
    batch = {(r.user_id, r.ts): (r.zscore, r.is_anomaly)
             for r in R.trailing_zscore(
                 bdf, "user_id", "ts", "value",
                 window=8, min_points=4, threshold=2.0).collect()}
    assert set(got) == set(batch)
    for k in batch:
        bz, bflag = batch[k]
        sz, sflag = got[k]
        assert sflag == bflag, k
        if bz is None:
            assert sz is None, k
        else:
            assert sz == pytest.approx(bz, abs=2e-4), k
    # the spike was flagged, through the restart
    spike_key = (1, dt.datetime(2024, 1, 1, 0, 5))
    assert got[spike_key][1]


def test_maintain_rollup_matches_batch_recompute(spark, tmp_path):
    """Streaming IVM: maintaining the rollup across micro-batches
    equals the one-shot aggregate of everything streamed — including
    NULL values moving counts but not sums."""
    import json as _json

    from twitter_to_sqlite_spark.streaming.analytics import maintain_rollup
    from pyspark.sql import functions as F

    spool = tmp_path / "spool"
    spool.mkdir()
    rollup = str(tmp_path / "rollup")

    rows1 = [{"g": "a", "v": 1.5}, {"g": "a", "v": 2.0},
             {"g": "b", "v": None}]
    rows2 = [{"g": "a", "v": -1.5}, {"g": "c", "v": 7.25},
             {"g": "b", "v": 4.0}]
    (spool / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows1))

    schema = "g string, v double"
    on_batch = maintain_rollup(spark, rollup, ["g"], "v")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).json(str(spool))
    q = stream.writeStream.foreachBatch(on_batch) \
        .option("checkpointLocation", str(tmp_path / "ck")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)

    (spool / "b2.json").write_text(
        "\n".join(_json.dumps(r) for r in rows2))
    q = stream.writeStream.foreachBatch(on_batch) \
        .option("checkpointLocation", str(tmp_path / "ck")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = {r["g"]: (r["n_rows"], r["n_vals"], float(r["v_sum"]))
           for r in spark.read.parquet(rollup).collect()}
    every = spark.createDataFrame(
        [(r["g"], r["v"]) for r in rows1 + rows2], schema)
    want = {r["g"]: (r["n_rows"], r["n_vals"],
                     float(r["v_sum"]) if r["v_sum"] is not None else None)
            for r in every.groupBy("g").agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.count("v").alias("n_vals"),
                F.sum(F.col("v").cast("decimal(18,4)")).alias("v_sum"))
            .collect()}
    # NULL-only group: stored sum is NULL; normalize for compare
    got = {k: (a, b, c) for k, (a, b, c) in got.items()}
    assert {k: (a, b) for k, (a, b, _) in got.items()} \
        == {k: (a, b) for k, (a, b, _) in want.items()}
    for k in want:
        if want[k][2] is None:
            continue
        assert got[k][2] == want[k][2]


def test_drift_monitor_matches_batch_psi(spark, tmp_path):
    """Streaming drift maintenance: after N micro-batches the
    maintained histogram equals the one-shot batch histogram of
    everything streamed, and psi_vs_baseline equals the PSI computed
    directly from the one-shot counts — the streaming twin of the
    batch psi_drift query."""
    import json as _json
    import math

    from twitter_to_sqlite_spark.streaming.analytics import (
        drift_monitor, psi_vs_baseline, score_bin_counts)

    spool = tmp_path / "spool"
    spool.mkdir()
    counts = str(tmp_path / "counts")
    baseline = str(tmp_path / "baseline")

    base_vals = [0.05, 0.15, 0.15, 0.85, 0.95, 0.95]
    rows1 = [{"quality": v} for v in (0.05, 0.42, 0.42, 0.87)]
    rows2 = [{"quality": v} for v in (0.42, 0.42, 0.99, 1.0)]

    score_bin_counts(
        spark.createDataFrame([(v,) for v in base_vals],
                              "quality double")).write.parquet(baseline)
    (spool / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows1))

    schema = "quality double"
    on_batch = drift_monitor(spark, counts, "quality")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1).json(str(spool))
    for extra in (None, rows2):
        if extra is not None:
            (spool / "b2.json").write_text(
                "\n".join(_json.dumps(r) for r in extra))
        q = stream.writeStream.foreachBatch(on_batch) \
            .option("checkpointLocation", str(tmp_path / "ck")) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

    # maintained histogram == one-shot histogram of the whole stream
    all_vals = [r["quality"] for r in rows1 + rows2]
    want_bins = {r["bin"]: r["n"] for r in score_bin_counts(
        spark.createDataFrame([(v,) for v in all_vals],
                              "quality double")).collect()}
    got_bins = {r["bin"]: r["n"]
                for r in spark.read.parquet(counts).collect()}
    assert got_bins == want_bins

    # streaming PSI == PSI computed from the one-shot counts
    base_bins = {r["bin"]: r["n"]
                 for r in spark.read.parquet(baseline).collect()}
    tnb, tnc = sum(base_bins.values()), sum(want_bins.values())
    want_psi = 0.0
    for b in range(10):
        pc = (want_bins.get(b, 0) + 1.0) / (tnc + 10)
        pb = (base_bins.get(b, 0) + 1.0) / (tnb + 10)
        want_psi += (pc - pb) * math.log(pc / pb)
    got_psi = psi_vs_baseline(spark, counts, baseline)
    assert got_psi == pytest.approx(want_psi, abs=1e-12)
    assert got_psi > 0.0


def test_value_monitor_matches_batch_ks(spark, tmp_path):
    """Streaming KS maintenance: after N micro-batches the maintained
    score-count table equals the one-shot counts of everything
    streamed, and ks_vs_baseline equals the KS computed directly —
    the streaming twin of the batch ks_drift query."""
    import json as _json

    from twitter_to_sqlite_spark.streaming.analytics import (
        ks_vs_baseline, score_value_counts, value_monitor)

    spool = tmp_path / "spool"
    spool.mkdir()
    counts = str(tmp_path / "counts")
    baseline = str(tmp_path / "baseline")

    base_vals = [0.1, 0.1, 0.2, 0.8, 0.9]
    rows1 = [{"quality": v} for v in (0.1, 0.4, 0.4)]
    rows2 = [{"quality": v} for v in (0.4, 0.9, 1.0)]

    score_value_counts(
        spark.createDataFrame([(v,) for v in base_vals],
                              "quality double")).write.parquet(baseline)
    (spool / "b1.json").write_text(
        "\n".join(_json.dumps(r) for r in rows1))

    on_batch = value_monitor(spark, counts, "quality")
    stream = spark.readStream.schema("quality double").option(
        "maxFilesPerTrigger", 1).json(str(spool))
    for extra in (None, rows2):
        if extra is not None:
            (spool / "b2.json").write_text(
                "\n".join(_json.dumps(r) for r in extra))
        q = stream.writeStream.foreachBatch(on_batch) \
            .option("checkpointLocation", str(tmp_path / "ck")) \
            .trigger(availableNow=True).start()
        q.awaitTermination(120)

    all_vals = [r["quality"] for r in rows1 + rows2]
    want = {r["val"]: r["n"] for r in score_value_counts(
        spark.createDataFrame([(v,) for v in all_vals],
                              "quality double")).collect()}
    got = {r["val"]: r["n"]
           for r in spark.read.parquet(counts).collect()}
    assert got == want

    # streaming statistic == hand-computed KS of the two samples
    tb, tc = len(base_vals), len(all_vals)
    d = 0.0
    cb = cc = 0
    for v in sorted(set(base_vals) | set(all_vals)):
        cb += base_vals.count(v)
        cc += all_vals.count(v)
        d = max(d, abs(cb / tb - cc / tc))
    assert ks_vs_baseline(spark, counts, baseline) == pytest.approx(d)


def test_ks_vs_baseline_empty_table_raises(spark, tmp_path):
    """ADVICE r6: an empty counts table (monitor only ever saw
    null-score batches) must raise a clear ValueError, not
    ZeroDivisionError — drift against nothing is undefined."""
    from twitter_to_sqlite_spark.streaming.analytics import (
        ks_vs_baseline, score_value_counts)

    full = str(tmp_path / "full")
    empty = str(tmp_path / "empty")
    score_value_counts(
        spark.createDataFrame([(0.1,), (0.9,)],
                              "quality double")).write.parquet(full)
    score_value_counts(
        spark.createDataFrame([], "quality double")).write.parquet(empty)

    for counts, baseline in ((empty, full), (full, empty)):
        with pytest.raises(ValueError, match="empty counts table"):
            ks_vs_baseline(spark, counts, baseline)


def test_decay_monitor_matches_batch_decay_exactly(spark, tmp_path):
    """Decayed heavy hitters: N maintained batches (stored' = stored/2
    + counts) equal the one-shot sum of per-batch counts x (1/2)^age
    BIT-FOR-BIT (dyadic decay x integer counts is exact in doubles),
    through a real availableNow stream, and pruned keys vanish."""
    import json as _json

    from twitter_to_sqlite_spark.streaming.analytics import decay_monitor

    spool = tmp_path / "spool"
    spool.mkdir()
    store = str(tmp_path / "store")
    batches = [[1, 1, 1, 2], [1, 3], [2, 2, 3, 3, 3]]
    for b, users in enumerate(batches):
        p = spool / f"b{b}.json"
        p.write_text("\n".join(
            _json.dumps({"user_id": u}) for u in users))
        import os
        os.utime(p, (1_000_000_000 + 100 * b,) * 2)

    on_batch = decay_monitor(spark, store, "user_id", decay=0.5)
    q = (spark.readStream.schema("user_id long")
         .option("maxFilesPerTrigger", 1).json(str(spool))
         .writeStream.foreachBatch(on_batch)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["user_id"]: r["decayed"]
           for r in spark.read.parquet(store).collect()}
    want = {}
    for age, users in enumerate(reversed(batches)):
        for u in users:
            want[u] = want.get(u, 0.0) + 0.5 ** age
    assert got == want  # exact equality, no approx

    # forgetting: a key seen once long ago decays below the prune
    # floor and is dropped from the table
    for b in range(3, 25):
        on_batch(spark.createDataFrame([(99,)], "user_id long"), b)
    final = {r["user_id"]: r["decayed"]
             for r in spark.read.parquet(store).collect()}
    assert 99 in final
    assert 1 not in final and 2 not in final and 3 not in final


def test_mad_from_counts_agrees_with_direct_spec(spark, tmp_path):
    from twitter_to_sqlite_spark.streaming import analytics as SA

    path = str(tmp_path / "counts")
    on_b = SA.value_monitor(spark, path, "q")
    batches = [[0.1, 0.1, 0.2], [0.2, 0.2, 0.9], [0.1, 0.3]]
    for b, vals in enumerate(batches):
        on_b(spark.createDataFrame([(v,) for v in vals], "q double"), b)

    m = SA.mad_from_counts(spark, path, k=3)
    # all 8 values at the v4 grain: [1000x3, 2000x3, 3000, 9000]
    # rank ⌈8/2⌉=4 → median4 = 2000; deviations sorted:
    # {0:3, 1000:4, 7000:1} → rank-4 → mad4 = 1000;
    # outliers beyond 3*1000: only 9000 (dev 7000)
    assert m == {"n": 8, "median4": 2000, "mad4": 1000,
                 "n_outliers": 1}


def test_mad_from_counts_empty_store_fails_loudly(spark, tmp_path):
    import pytest as _pytest

    from twitter_to_sqlite_spark.streaming import analytics as SA

    path = str(tmp_path / "counts")
    on_b = SA.value_monitor(spark, path, "q")
    on_b(spark.createDataFrame([], "q double"), 0)
    with _pytest.raises(ValueError):
        SA.mad_from_counts(spark, path)
