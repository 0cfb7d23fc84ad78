"""Catalog chunk 1: core relational operators (SURVEY §2.5-2.8) + shared helpers (_t) and hoisted caches."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from twitter_to_sqlite_spark import tables
from twitter_to_sqlite_spark.functions import (bloom, dedup, entity,
                                               graph, multimodal,
                                               similarity, sketch, text)
from twitter_to_sqlite_spark.operators import relational as R
from twitter_to_sqlite_spark.operators import sinks


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return tables.load_table(spark, sf_dir, name)


# =====================================================================
# Core relational operators (SURVEY §2.5-2.8)
# =====================================================================

def q_facet_count(spark, sf_dir):
    """A6 facet count: events per event_type, ordered desc downstream."""
    return R.facet_count(_t(spark, sf_dir, "events"), "event_type", "n")


SQL_FACET_COUNT = """
SELECT event_type, count(*) AS n FROM events GROUP BY event_type
"""


def q_facet_count_salted(spark, sf_dir):
    """A6 under adversarial skew: the two-phase salted aggregation —
    identical answer to facet_count (same oracle), hot keys spread
    over 16 salt sub-groups before the final combine."""
    return R.salted_facet_count(_t(spark, sf_dir, "events"), "event_type", "n")


def q_latest_per_key(spark, sf_dir):
    """A2 latest-per-key: most recent event per user (order = event_id,
    the reference's chronological-integer-id convention, README.md:374)."""
    ev = _t(spark, sf_dir, "events")
    out = R.latest_per_key(ev, ["user_id"], "event_id")
    return out.select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


SQL_LATEST_PER_KEY = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


def q_change_detection(spark, sf_dir):
    """A3 change-detection append (count_history semantics,
    utils.py:690-701): keep events whose value differs from the user's
    previous event."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return R.change_detection(ev, ["user_id"], "event_id", "value")


SQL_CHANGE_DETECTION = """
SELECT user_id, event_id, value
FROM (SELECT user_id, event_id, value,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS prev
      FROM events)
WHERE prev IS NULL OR value != prev
"""


def q_top_k(spark, sf_dir):
    """A4/A5 order-by-id + limit: top 10 orders by totalprice."""
    o = _t(spark, sf_dir, "orders")
    return R.top_k(
        o.select("o_orderkey", "o_custkey", "o_totalprice"),
        [F.col("o_totalprice").desc(), F.col("o_orderkey").asc()],
        10,
    )


SQL_TOP_K = """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


def q_anti_join(spark, sf_dir):
    """J1/F1 anti-join (skip-existing filter cli.py:483-487; README.md:243
    `followed_id not in (select id from users)`): customers never seen
    as an events user."""
    c = _t(spark, sf_dir, "customer").select(F.col("c_custkey"), "c_name")
    ev = _t(spark, sf_dir, "events").select(F.col("user_id").alias("c_custkey"))
    return R.anti_join(c, ev, "c_custkey")


SQL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT user_id FROM events)
"""


def q_semi_join(spark, sf_dir):
    """J2 semi-join: customers with at least one order (README.md:212
    IN-subquery pattern)."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return R.semi_join(c, o, "c_custkey")


SQL_SEMI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
"""


def q_star_join(spark, sf_dir):
    """J3 key-lookup star join: revenue per region through
    customer→nation→region (broadcast dims), exact DECIMAL sum cast to
    double so Spark and the oracle agree bit-for-bit."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    joined = R.key_lookup_join(o, c, o.o_custkey == c.c_custkey)
    joined = R.key_lookup_join(joined, n, F.col("c_nationkey") == n.n_nationkey)
    joined = R.key_lookup_join(joined, r, F.col("n_regionkey") == r.r_regionkey)
    return joined.groupBy("r_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


SQL_STAR_JOIN = """
SELECT r_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_self_join(spark, sf_dir):
    """J4 fact self-join (tweet→quoted-original shape, utils.py:353-354):
    each lineitem joined to the next line of the same order."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("b.l_linenumber") == F.col("a.l_linenumber") + 1),
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_linenumber").alias("l_linenumber"),
            F.col("b.l_linenumber").alias("next_linenumber"),
            F.col("b.l_quantity").alias("next_quantity"),
        )
    )


SQL_SELF_JOIN = """
SELECT a.l_orderkey AS l_orderkey, a.l_linenumber AS l_linenumber,
       b.l_linenumber AS next_linenumber, b.l_quantity AS next_quantity
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND b.l_linenumber = a.l_linenumber + 1
"""


def q_graph_mutual(spark, sf_dir):
    """J5 graph-edge self-join: mutual pairs over a derived follower
    edge list (following-table semantics, utils.py:355-369)."""
    ev = _t(spark, sf_dir, "events")
    edges = ev.select(
        F.col("user_id").alias("follower_id"),
        (F.col("event_id") % 25).alias("followed_id"),
    )
    return R.mutual_edges(edges, "follower_id", "followed_id")


SQL_GRAPH_MUTUAL = """
WITH e AS (SELECT DISTINCT user_id AS a, event_id % 25 AS b FROM events)
SELECT x.a AS a, x.b AS b
FROM e x JOIN e y ON x.a = y.b AND x.b = y.a
WHERE x.a < x.b
"""


def q_m2m_bridge(spark, sf_dir):
    """J6/K5 m2m bridge traversal (media_tweets shape, utils.py:442-446):
    distinct parts per order through the lineitem bridge."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.countDistinct("l_partkey").alias("n_parts"))
    )


SQL_M2M_BRIDGE = """
SELECT o_orderkey, count(DISTINCT l_partkey) AS n_parts
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey
"""


def q_watermark_filter(spark, sf_dir):
    """F2/C1 since_id watermark: rows above the stored high-water mark
    (utils.py:179-180, 214-222). Watermark = max(event_id) before a
    cutoff, applied as a pushdown-able predicate."""
    ev = _t(spark, sf_dir, "events")
    wm = (
        ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp"))
        .agg(F.max("event_id").alias("__wm"))
    )
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .crossJoin(F.broadcast(wm))
        .filter(F.col("event_id") > F.col("__wm"))
        .drop("__wm")
    )


SQL_WATERMARK_FILTER = """
SELECT event_id, user_id, event_type, value FROM events
WHERE event_id > (SELECT max(event_id) FROM events WHERE ts < TIMESTAMP '2024-01-08')
"""


def q_upsert_lww(spark, sf_dir):
    """K1 keyed last-write-wins upsert (INSERT OR REPLACE,
    utils.py:432-434): replay events split into a stored half and an
    incoming half; final state = winning row per (user_id, event_type)."""
    ev = _t(spark, sf_dir, "events")
    cols = ["user_id", "event_type", "event_id", "value"]
    half = 500
    existing = R.latest_per_key(
        ev.filter(F.col("event_id") < half).select(*cols),
        ["user_id", "event_type"],
        "event_id",
    )
    incoming = ev.filter(F.col("event_id") >= half).select(*cols)
    out = sinks.upsert_plan(existing, incoming, ["user_id", "event_type"], "event_id")
    return out.select(
        "user_id", "event_type",
        F.col("event_id").alias("version_id"),
        F.col("value").alias("last_value"),
    )


SQL_UPSERT_LWW = """
SELECT user_id, event_type, event_id AS version_id, value AS last_value
FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                                   ORDER BY event_id DESC) AS rn
      FROM events) WHERE rn = 1
"""


def q_insert_if_absent(spark, sf_dir):
    """K2 INSERT OR IGNORE (first_seen preservation, utils.py:459-469):
    existing rows win; only genuinely new keys are appended."""
    c = _t(spark, sf_dir, "customer")
    existing = c.filter(F.col("c_custkey") % 2 == 0).select(
        "c_custkey", "c_name", F.lit("old").alias("src")
    )
    incoming = c.select("c_custkey", "c_name", F.lit("new").alias("src"))
    return sinks.insert_if_absent_plan(existing, incoming, ["c_custkey"])


SQL_INSERT_IF_ABSENT = """
SELECT c_custkey, c_name, 'old' AS src FROM customer WHERE c_custkey % 2 = 0
UNION ALL
SELECT c_custkey, c_name, 'new' AS src FROM customer WHERE c_custkey % 2 != 0
"""


def q_hash_id(spark, sf_dir):
    """K4/P13 content-hash surrogate key (sources dim, utils.py:668-673):
    md5 of canonical content; identical rows collapse."""
    d = _t(spark, sf_dir, "documents").select("lang", "source").distinct()
    return d.select(
        F.md5(F.concat_ws("|", "lang", "source")).alias("id"),
        "lang",
        "source",
    )


SQL_HASH_ID = """
SELECT DISTINCT md5(lang || '|' || source) AS id, lang, source FROM documents
"""


def q_source_regex(spark, sf_dir):
    """P4 source-dimension regexp extraction (utils.py:668-673, regex
    utils.py:35): pull url+name out of an anchor tag."""
    d = _t(spark, sf_dir, "documents").select("source").distinct()
    html = F.concat(
        F.lit('<a href="https://'), F.col("source"),
        F.lit('.example.com" rel="nofollow">'), F.upper(F.col("source")), F.lit("</a>"),
    )
    pat = r'<a href="(.*?)".*?>(.*?)</a>'
    return d.select(
        F.regexp_extract(html, pat, 1).alias("url"),
        F.regexp_extract(html, pat, 2).alias("name"),
    )


SQL_SOURCE_REGEX = r"""
WITH s AS (SELECT DISTINCT '<a href="https://' || source || '.example.com" rel="nofollow">'
                  || upper(source) || '</a>' AS html FROM documents)
SELECT regexp_extract(html, '<a href="(.*?)".*?>(.*?)</a>', 1) AS url,
       regexp_extract(html, '<a href="(.*?)".*?>(.*?)</a>', 2) AS name
FROM s
"""


def q_timestamp_iso(spark, sf_dir):
    """P2/P11 timestamp parse→ISO-8601 string (transform_tweet,
    utils.py:310): the reference stores ISO text; we format once at the
    edge and keep typed timestamps internally."""
    o = _t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd'T'HH:mm:ss").alias("created_iso"),
    )


SQL_TIMESTAMP_ISO = """
SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS created_iso
FROM orders
"""


def q_json_extract(spark, sf_dir):
    """P14 JSON decode of a text column (sqlite JSON-text columns,
    SURVEY §1.2)."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
"""


def q_ci_in_list(spark, sf_dir):
    """P12 case-normalized key match (user_ids_for_screen_names,
    utils.py:647-653)."""
    c = _t(spark, sf_dir, "customer")
    return c.filter(
        F.lower(F.col("c_mktsegment")).isin("building", "automobile")
    ).select("c_custkey", "c_mktsegment")


SQL_CI_IN_LIST = """
SELECT c_custkey, c_mktsegment FROM customer
WHERE lower(c_mktsegment) IN ('building', 'automobile')
"""


def q_distinct(spark, sf_dir):
    """A8 SELECT DISTINCT (README.md:326 recipe)."""
    return R.distinct_values(_t(spark, sf_dir, "orders"), ["o_custkey"])


SQL_DISTINCT = "SELECT DISTINCT o_custkey FROM orders"


def q_union_dedup(spark, sf_dir):
    """§2.7 union of overlapping batches + pk dedup (every ingest loop)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type")
    b1 = ev.filter(F.col("event_id") < 300)
    b2 = ev.filter(F.col("event_id") >= 200)
    return b1.unionByName(b2).dropDuplicates(["event_id"])


SQL_UNION_DEDUP = """
SELECT DISTINCT event_id, user_id, event_type FROM (
  SELECT event_id, user_id, event_type FROM events WHERE event_id < 300
  UNION ALL
  SELECT event_id, user_id, event_type FROM events WHERE event_id >= 200
)
"""


def q_page_minmax(spark, sf_dir):
    """A1 per-page min/max id fold (pagination bounds, utils.py:209-213)."""
    return R.page_min_max(_t(spark, sf_dir, "events"), ["event_type"], "event_id")


SQL_PAGE_MINMAX = """
SELECT event_type, min(event_id) AS min_id, max(event_id) AS max_id
FROM events GROUP BY event_type
"""


def q_batch_chunks(spark, sf_dir):
    """A9 fixed-size chunking (100-tweet write buffers, cli.py:312-320)."""
    ev = _t(spark, sf_dir, "events").select("event_id")
    chunked = R.batch_chunks(ev, "event_id", 100)
    return chunked.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


SQL_BATCH_CHUNKS = """
SELECT (row_number() OVER (ORDER BY event_id) - 1) // 100 AS chunk_pre, * FROM events
"""  # replaced below — kept readable via builder


SQL_BATCH_CHUNKS = """
WITH c AS (SELECT event_id,
                  CAST(floor((row_number() OVER (ORDER BY event_id) - 1) / 100) AS BIGINT) AS chunk
           FROM events)
SELECT chunk, count(*) AS n, min(event_id) AS min_id, max(event_id) AS max_id
FROM c GROUP BY chunk
"""


def q_batch_chunks_dist(spark, sf_dir):
    """A9 scale path: chunk ids via range-partition + per-partition
    rank + prefix-sum offsets — no single-partition window anywhere in
    the plan (operators/relational.py batch_chunks_dist)."""
    ev = _t(spark, sf_dir, "events").select("event_id")
    chunked = R.batch_chunks_dist(ev, "event_id", 100)
    return chunked.groupBy("chunk").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
    )


# Same oracle as the global variant: semantics are identical.
SQL_BATCH_CHUNKS_DIST = SQL_BATCH_CHUNKS


def q_rollup_revenue(spark, sf_dir):
    """Hierarchical rollup (region → nation → total) — the Datasette
    facet drill-down generalized; subtotal rows carry NULL keys in both
    engines. Exact DECIMAL sums cast to double."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    out = joined.rollup("r_name", "n_name").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    # subtotal rows get 'ALL' instead of NULL keys: hash/sort-friendly
    # for any comparator, and the data has no genuine NULL names.
    return out.select(
        F.coalesce("r_name", F.lit("ALL")).alias("r_name"),
        F.coalesce("n_name", F.lit("ALL")).alias("n_name"),
        "revenue",
        "n_orders",
    )


SQL_ROLLUP_REVENUE = """
SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_pivot_status(spark, sf_dir):
    """Pivot: order counts per status column, grouped by priority
    (the reference's ni-devices key→column pivot shape, archive.py:132,
    on a relational input). Explicit value list keeps the schema
    static; zero-filled so both engines agree on empty cells."""
    o = _t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[F.coalesce(F.col(s), F.lit(0)).alias(f"n_{s}") for s in ("F", "O", "P")],
    )


SQL_PIVOT_STATUS = """
SELECT o_orderpriority,
       count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_F,
       count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_O,
       count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_P
FROM orders GROUP BY o_orderpriority
"""


def q_entity_expansion(spark, sf_dir):
    """P1 entity URL expansion (expand_entities, utils.py:275-281 —
    SURVEY §7.3 hard-part 1): the general aggregate-fold implementation
    checked against an unrolled-replace oracle. Synthetic entity arrays
    (two t.co URLs per row) are built from documents columns."""
    from twitter_to_sqlite_spark.transforms.tweets import expand_entities

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    text = F.concat(
        F.lit("see https://t.co/"), F.col("source"),
        F.lit(" and https://t.co/"), F.col("lang"), F.lit(" here"),
    )
    ents = F.array(
        F.struct(
            F.concat(F.lit("https://t.co/"), F.col("source")).alias("url"),
            F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com")).alias("expanded_url"),
        ),
        F.struct(
            F.concat(F.lit("https://t.co/"), F.col("lang")).alias("url"),
            F.lit(None).cast("string").alias("expanded_url"),  # null → keep original
        ),
    )
    base = d.select("doc_id", text.alias("__text"), ents.alias("__ents"))
    return base.select(
        "doc_id",
        expand_entities(F.col("__text"), F.col("__ents")).alias("expanded"),
    )


SQL_ENTITY_EXPANSION = """
WITH base AS (
  SELECT doc_id,
         'see https://t.co/' || source || ' and https://t.co/' || lang || ' here' AS t,
         'https://t.co/' || source AS u1,
         'https://' || source || '.example.com' AS e1,
         'https://t.co/' || lang AS u2
  FROM documents
)
SELECT doc_id, replace(replace(t, u1, e1), u2, u2) AS expanded FROM base
"""


def q_html_unescape(spark, sf_dir):
    """P2 HTML unescape (html.unescape in transform_tweet,
    utils.py:301): the five standard entities, decoded in
    html.unescape-compatible order (&amp; last)."""
    from twitter_to_sqlite_spark.transforms.tweets import html_unescape

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    text = F.concat(
        F.lit("A &amp; B &lt;"), F.col("lang"), F.lit("&gt; &quot;"),
        F.col("source"), F.lit("&quot; &#39;x&#39; &amp;lt;"),
    )
    return d.select("doc_id", html_unescape(text).alias("unescaped"))


SQL_HTML_UNESCAPE = """
SELECT doc_id,
  replace(replace(replace(replace(replace(
    'A &amp; B &lt;' || lang || '&gt; &quot;' || source || '&quot; &#39;x&#39; &amp;lt;',
    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS unescaped
FROM documents
"""




__all__ = [
    "Callable",
    "DataFrame",
    "SparkSession",
    "Window",
    "F",
    "tables",
    "bloom",
    "dedup",
    "entity",
    "graph",
    "multimodal",
    "similarity",
    "sketch",
    "text",
    "R",
    "sinks",
    "_t",
    "q_facet_count",
    "SQL_FACET_COUNT",
    "q_facet_count_salted",
    "q_latest_per_key",
    "SQL_LATEST_PER_KEY",
    "q_change_detection",
    "SQL_CHANGE_DETECTION",
    "q_top_k",
    "SQL_TOP_K",
    "q_anti_join",
    "SQL_ANTI_JOIN",
    "q_semi_join",
    "SQL_SEMI_JOIN",
    "q_star_join",
    "SQL_STAR_JOIN",
    "q_self_join",
    "SQL_SELF_JOIN",
    "q_graph_mutual",
    "SQL_GRAPH_MUTUAL",
    "q_m2m_bridge",
    "SQL_M2M_BRIDGE",
    "q_watermark_filter",
    "SQL_WATERMARK_FILTER",
    "q_upsert_lww",
    "SQL_UPSERT_LWW",
    "q_insert_if_absent",
    "SQL_INSERT_IF_ABSENT",
    "q_hash_id",
    "SQL_HASH_ID",
    "q_source_regex",
    "SQL_SOURCE_REGEX",
    "q_timestamp_iso",
    "SQL_TIMESTAMP_ISO",
    "q_json_extract",
    "SQL_JSON_EXTRACT",
    "q_ci_in_list",
    "SQL_CI_IN_LIST",
    "q_distinct",
    "SQL_DISTINCT",
    "q_union_dedup",
    "SQL_UNION_DEDUP",
    "q_page_minmax",
    "SQL_PAGE_MINMAX",
    "q_batch_chunks",
    "SQL_BATCH_CHUNKS",
    "q_batch_chunks_dist",
    "SQL_BATCH_CHUNKS_DIST",
    "q_rollup_revenue",
    "SQL_ROLLUP_REVENUE",
    "q_pivot_status",
    "SQL_PIVOT_STATUS",
    "q_entity_expansion",
    "SQL_ENTITY_EXPANSION",
    "q_html_unescape",
    "SQL_HTML_UNESCAPE",
]
