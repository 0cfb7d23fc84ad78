"""twitter_to_sqlite_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of dogsheep/twitter-to-sqlite.

This is NOT a port: the reference is a single-threaded Python CLI
writing to SQLite (see /root/reference/twitter_to_sqlite/); this
package re-expresses every capability — normalization, keyed upserts,
incremental watermarks, change history, dedup, streaming capture,
text search, relationship/graph queries — as declarative Spark
DataFrame plans so Catalyst/Tungsten pick the physical strategy and
the same code scales from local[32] to a 1000-executor cluster.

Layout:
    session.py            SparkSession factory (AQE, Arrow, UTC)
    schemas.py            explicit StructTypes (no inference in hot path)
    tables.py             testdata table loaders
    operators/relational  joins/windows/aggregations (SURVEY §2.5-2.7)
    operators/sinks       upsert / insert-if-absent / overwrite / hash-id (§2.2)
    operators/checkpoint  since_id watermarks + migrations (§2.8)
    transforms/tweets     tweet/user normalization pipeline (§2.3)
    sources/              batch API source loops + archive reader (§2.1)
    streaming/            structured-streaming capture + track/follow (§2.10)
    functions/text        tokenization, language-ID, quality, fingerprint
    functions/dedup       exact / minhash-LSH / simhash / ngram-jaccard dedup
    functions/similarity  brute-force + LSH-bucketed ANN over embeddings
    functions/multimodal  binary-column decode/feature plumbing (stubbed codecs)
"""

__version__ = "0.1.0"
