"""Catalog chunk 2: text search (SURVEY §2.9) and event-time operators (sessionization, as-of join)."""

from __future__ import annotations

from twitter_to_sqlite_spark.plans import _q01_relational as _prev
from twitter_to_sqlite_spark.plans._q01_relational import *  # noqa: F401,F403

# =====================================================================
# Text search (SURVEY §2.9)
# =====================================================================

# r11 (guide §1.2 step 1, VERDICT r10 'Next round' #3): SIX catalog
# queries (text_terms, fts_search, fts_bm25, hybrid_search's lexical
# leg, retrieval_eval, bm25_tuning) each re-ran the identical
# tokenize + explode + groupBy inverted-index build over documents —
# the corpus-sized front of the whole text-search family. ONE
# (session, sf_dir)-cached localCheckpoint now serves all six, billed
# per bench pass as `_build:bm25_index` (the _build:doc_shingles
# convention; cleared by plans/_q03_dedup.py clear_caches every pass).
_BM25_IDX_CACHE: dict[tuple, object] = {}


def _doc_index_build(spark, sf_dir):
    """The raw (uncached) inverted index over documents — plan tests
    inspect THIS (the cached form explains as an RDD-scan). The corpus
    is spread before the tokenize+explode front (the size-aware
    dedup.spread device: a narrow scan serializes the fan-out on one
    core; a wide scan is left untouched)."""
    from twitter_to_sqlite_spark.functions import dedup

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return R.build_inverted_index(dedup.spread(d), "doc_id", "text")


def _doc_index(spark, sf_dir):
    key = (spark, sf_dir)
    if key not in _BM25_IDX_CACHE:
        _BM25_IDX_CACHE[key] = _doc_index_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _BM25_IDX_CACHE[key]


def q_text_terms(spark, sf_dir):
    """T1 FTS inverted index: per-term document frequency and total
    term frequency over documents (FTS5 analogue, utils.py:352)."""
    idx = _doc_index(spark, sf_dir)
    return idx.groupBy("term").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.sum("tf").alias("total_tf"),
    )


SQL_TEXT_TERMS = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS term
  FROM documents
)
SELECT term, count(DISTINCT doc_id) AS n_docs, count(*) AS total_tf
FROM tok WHERE term <> '' GROUP BY term
"""


def q_fts_search(spark, sf_dir):
    """T1/T2 FTS AND-query through the inverted index: docs containing
    both 'spark' and 'join'."""
    idx = _doc_index(spark, sf_dir)
    return R.fts_search(idx, "doc_id", ["spark", "join"], mode="all")


SQL_FTS_SEARCH = r"""
SELECT doc_id FROM documents
WHERE list_contains(string_split_regex(lower(text), '\W+'), 'spark')
  AND list_contains(string_split_regex(lower(text), '\W+'), 'join')
"""


def q_fts_bm25(spark, sf_dir):
    """T1 ranked FTS: Okapi BM25 (k1=1.2, b=0.75 — FTS5's rank
    defaults) over the inverted index for docs containing both 'spark'
    and 'join'. Integer-valued corpus stats keep the score exact across
    engines; compared on round(score, 4).

    r11: rides the shared `_doc_index` checkpoint; doc lengths come
    from sum(tf) over the checkpointed index (one cheap block-scan agg)
    instead of a second no-explode corpus pass — the values are the
    same exact integers per doc, so the score is bit-identical (the
    fts_bm25 docstring's tokenizer-consistency contract)."""
    idx = _doc_index(spark, sf_dir)
    return R.fts_bm25(idx, "doc_id", ["spark", "join"], mode="all")


#: BM25 CTE chain ('spark' AND 'join'), shared by the plain ranked-FTS
#: oracle and the hybrid-retrieval oracle.
_SQL_BM25_CTES = r"""tok AS (
  SELECT doc_id, unnest(string_split_regex(lower(text), '\W+')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok2 GROUP BY doc_id, term
), dl AS (
  SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY doc_id
), stats AS (
  SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl FROM dl
), dfreq AS (
  SELECT term, count(DISTINCT doc_id)::DOUBLE AS df
  FROM tf WHERE term IN ('spark', 'join') GROUP BY term
), hits AS (
  SELECT tf.doc_id, tf.term,
         ln((stats.n - dfreq.df + 0.5) / (dfreq.df + 0.5) + 1)
           * tf.tf * (1.2 + 1)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / stats.avgdl)) AS s
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id)
  CROSS JOIN stats
), bm AS (
  SELECT doc_id, round(sum(s), 4) AS score
  FROM hits
  GROUP BY doc_id
  HAVING count(DISTINCT term) = 2
)"""

SQL_FTS_BM25 = f"""
WITH {_SQL_BM25_CTES}
SELECT doc_id, score FROM bm
"""


def q_keyword_track(spark, sf_dir):
    """T3 streaming `track` phrase filter (cli.py:644-668): match if all
    terms of any phrase appear."""
    d = _t(spark, sf_dir, "documents")
    return R.keyword_track_filter(d, "text", ["spark join", "window"]).select(
        "doc_id", "lang"
    )


SQL_KEYWORD_TRACK = r"""
SELECT doc_id, lang FROM documents
WHERE (list_contains(string_split_regex(lower(text), '\W+'), 'spark')
       AND list_contains(string_split_regex(lower(text), '\W+'), 'join'))
   OR list_contains(string_split_regex(lower(text), '\W+'), 'window')
"""


# =====================================================================
# Event-time operators (sessionization, as-of join)
# =====================================================================

def q_tumbling_counts(spark, sf_dir):
    """Event-time tumbling-window aggregation: events and exact value
    sums per (hour, event_type) — the batch twin of the streaming
    windowed counts (streaming/analytics.py), so replays/backfills
    aggregate identically to the live path. date_trunc on the naive
    timestamp is wall-clock bucketing in both engines; one partial-agg
    shuffle on a (bucket, type) key — high cardinality, no skew."""
    e = _t(spark, sf_dir, "events").select("ts", "event_type", "value")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("window_start"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(28,6)")).cast("double")
        .alias("value_sum"),
    )


SQL_TUMBLING_COUNTS = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
"""

def q_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization of the events stream: 30-minute
    inactivity gap per user (the batch twin of Structured Streaming's
    session_window), rolled up per session.

    session_start/end surface as epoch-micros BIGINT, not raw
    timestamps: the values are identical either way, but raw
    sub-second timestamps render differently under pandas-based
    comparators (Spark datetime64[ns] vs DuckDB datetime64[us]) —
    integers compare representation-free. Epoch micros are computed as
    an NTZ-to-NTZ timestampdiff from the epoch literal (not
    unix_micros, which needs TIMESTAMP and would make the value depend
    on the caller session's timezone for NTZ inputs — the driver
    builds its own session)."""
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    s = R.sessionize(e, "user_id", "ts", "event_id", gap_seconds=1800.0)
    epoch_us = (
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast({c} as timestamp_ntz))"
    )
    g = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("_start"),
        F.max("ts").alias("_end"),
    )
    return g.select(
        "user_id", "session_seq", "n_events",
        F.expr(epoch_us.format(c="_start")).alias("session_start"),
        F.expr(epoch_us.format(c="_end")).alias("session_end"),
    )


SQL_SESSIONIZE = """
WITH lagd AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
flag AS (
  SELECT *, CASE WHEN prev IS NULL OR epoch(ts) - epoch(prev) > 1800
                 THEN 1 ELSE 0 END AS new_s
  FROM lagd
),
sess AS (
  SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flag
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       count(*) AS n_events,
       epoch_us(min(ts)) AS session_start, epoch_us(max(ts)) AS session_end
FROM sess GROUP BY user_id, session_seq
"""


def q_asof_join(spark, sf_dir):
    """As-of join: each purchase event picks up the latest click of the
    same user at-or-before it (ties by event_id), via the merge-union
    running-last plan — no range join, no pair explosion."""
    e = _t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    out = R.asof_join(purchases, clicks, "user_id", "ts", "event_id",
                      ["event_id", "value"], prefix="click_")
    return out.select("event_id", "user_id", "click_event_id", "click_value")


SQL_ASOF_JOIN = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'click'
),
pick AS (
  SELECT p.event_id, p.user_id,
         (SELECT c.event_id FROM c
          WHERE c.user_id = p.user_id AND c.ts <= p.ts
          ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) AS click_event_id
  FROM p
)
SELECT pick.event_id, pick.user_id, pick.click_event_id,
       c.value AS click_value
FROM pick LEFT JOIN c ON c.event_id = pick.click_event_id
"""




__all__ = list(_prev.__all__) + [
    "_BM25_IDX_CACHE",
    "_doc_index_build",
    "_doc_index",
    "q_text_terms",
    "SQL_TEXT_TERMS",
    "q_fts_search",
    "SQL_FTS_SEARCH",
    "q_fts_bm25",
    "_SQL_BM25_CTES",
    "SQL_FTS_BM25",
    "q_keyword_track",
    "SQL_KEYWORD_TRACK",
    "q_tumbling_counts",
    "SQL_TUMBLING_COUNTS",
    "q_sessionize",
    "SQL_SESSIONIZE",
    "q_asof_join",
    "SQL_ASOF_JOIN",
]
