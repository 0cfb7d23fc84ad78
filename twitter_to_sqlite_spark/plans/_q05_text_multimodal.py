"""Catalog chunk 5: text analysis + multimodal + substring dedup + weighted sampling."""

from __future__ import annotations

from twitter_to_sqlite_spark.plans import _q04_analytics as _prev
from twitter_to_sqlite_spark.plans._q04_analytics import *  # noqa: F401,F403

# =====================================================================
# LLM-data-pipeline operators: text analysis + multimodal
# =====================================================================

def q_token_count(spark, sf_dir):
    """Token counting: whitespace words + chars/4 BPE-ish estimate."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.token_count(d).select("doc_id", "n_words", "n_tokens_est")


SQL_TOKEN_COUNT = f"""
SELECT doc_id,
       len({_SQL_TOKS}) AS n_words,
       greatest(len({_SQL_TOKS})::BIGINT,
                CAST(ceil(length(text) / 4.0) AS BIGINT)) AS n_tokens_est
FROM documents
"""


def q_quality_score(spark, sf_dir):
    """Document quality features + composite score (Gopher/C4-style)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.quality_score(d).select(
        "doc_id", "mean_word_len", "stopword_ratio", "punct_ratio",
        "dup_word_ratio", "quality",
    )



SQL_QUALITY_SCORE = f"""
WITH f AS (
  SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents
),
m AS (
  SELECT doc_id,
    len(t)::DOUBLE AS n_words,
    len(list_filter(t, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE AS n_stop,
    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE AS n_punct,
    len(list_distinct(t))::DOUBLE AS n_distinct,
    list_sum(list_transform(t, x -> length(x)::BIGINT))::DOUBLE AS sum_wl,
    length(text)::DOUBLE AS n_chars
  FROM f
)
SELECT doc_id,
  round(sum_wl / greatest(n_words, 1.0), 4) AS mean_word_len,
  round(n_stop / greatest(n_words, 1.0), 4) AS stopword_ratio,
  round(n_punct / greatest(n_chars, 1.0), 4) AS punct_ratio,
  round(1.0 - n_distinct / greatest(n_words, 1.0), 4) AS dup_word_ratio,
  round(least((n_stop / greatest(n_words, 1.0)) * 2, 1.0) * 0.4
        + (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5, 1.0)) * 0.2
        + (1.0 - (1.0 - n_distinct / greatest(n_words, 1.0))) * 0.4, 4) AS quality
FROM m
"""


def q_lang_id(spark, sf_dir):
    """Heuristic language ID via English-stopword ratio."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.language_id(d).select("doc_id", "en_score", "lang_guess")


SQL_LANG_ID = f"""
WITH m AS (
  SELECT doc_id,
    len(list_filter({_SQL_TOKS}, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE
      / greatest(len({_SQL_TOKS})::DOUBLE, 1.0) AS ratio
  FROM documents
)
SELECT doc_id, round(ratio, 4) AS en_score,
       CASE WHEN ratio >= 0.08 THEN 'en' ELSE 'other' END AS lang_guess
FROM m
"""


def q_fingerprint(spark, sf_dir):
    """Document fingerprint: min shingle hash (1-hash MinHash)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.fingerprint(d, "doc_id", "text", shingle_k=3)


SQL_FINGERPRINT = f"""
WITH docs AS (SELECT doc_id, text FROM documents),
sh AS ({_SQL_SHINGLES})
SELECT id AS doc_id,
       min(('0x' || substring(md5(shingle), 1, 15))::BIGINT) AS fingerprint
FROM sh GROUP BY id
"""


def q_multimodal_features(spark, sf_dir):
    """Binary-column feature extraction via Arrow mapInPandas (codec
    stubbed with deterministic byte stats; plumbing is real)."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(d)
    return multimodal.extract_features(media)


SQL_MULTIMODAL_FEATURES = """
SELECT doc_id AS media_id,
       octet_length(encode(text))::BIGINT AS n_bytes,
       ascii(substring(text, 1, 1)) AS first_byte,
       (list_sum(list_transform(string_split(text, ''), c -> ascii(c)))
        % 2147483648)::BIGINT AS byte_checksum
FROM documents
"""


# Docs with PII planted into the first 10 (the synthetic corpus has
# none): same literal appended both sides, so the scrubber has
# guaranteed positives and untouched rows prove no false redaction.
_PII_OFFSET = 2_000_000
_PII_SUFFIX = " reach me at alice@example.org or 192.168.0.12 or +1 555-123-4567 today"


def _docs_with_planted_pii(spark, sf_dir) -> DataFrame:
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + _PII_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_PII_SUFFIX)).alias("text"),
    )
    return d.unionByName(planted)


_SQL_DOCS_PII = f"""
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PII_OFFSET} AS doc_id, text || '{_PII_SUFFIX}' AS text
  FROM documents WHERE doc_id < 10
"""


def q_pii_scrub(spark, sf_dir):
    """PII redaction (emails / IPv4 / phone numbers → typed
    placeholders) with per-doc redaction counts, over documents with
    planted PII rows."""
    return text.pii_scrub(_docs_with_planted_pii(spark, sf_dir))


def _pii_ctes(base: str) -> tuple[str, str, str]:
    """Sequential scrub CTEs over `base(doc_id, t)`: returns (CTE text,
    final CTE name, n_pii sum expression) — shared by the standalone
    scrub oracle and the composite pipeline oracle."""
    ctes, prev, ncols = [], base, []
    for i, (pat, repl) in enumerate(text.PII_PATTERNS):
        ncols.append(f"n{i}")
        ctes.append(
            f"s{i} AS (SELECT doc_id, {', '.join(ncols[:-1] + [''])}"
            f" len(regexp_extract_all(t, '{pat}')) AS n{i},"
            f" regexp_replace(t, '{pat}', '{repl}', 'g') AS t"
            f" FROM {prev})"
        )
        prev = f"s{i}"
    return ",\n".join(ctes), prev, " + ".join(ncols)


def _pii_sql() -> str:
    ctes, final, total = _pii_ctes("docs")
    return f"""
WITH docs AS (SELECT doc_id, text AS t FROM ({_SQL_DOCS_PII})),
{ctes}
SELECT doc_id, t AS text_clean, ({total})::INT AS n_pii FROM {final}
"""


SQL_PII_SCRUB = _pii_sql()

_SQL_BIGRAMS = f"""
  SELECT doc_id, u.w1 AS w1, u.bg AS bg
  FROM (
    SELECT doc_id, unnest(list_transform(
      generate_series(1, len(t) - 1),
      i -> {{'w1': t[i], 'bg': t[i] || ' ' || t[i + 1]}})) AS u
    FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents)
    WHERE len(t) >= 2
  )
"""


_CHUNK_SIZE = 32
_CHUNK_STRIDE = 24


def q_chunk_documents(spark, sf_dir):
    """Fixed-size token windows with overlap (size 32, stride 24) —
    the pre-tokenization chunking step for LLM training; zero-shuffle
    narrow plan (text.chunk_documents)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.chunk_documents(d, size=_CHUNK_SIZE, stride=_CHUNK_STRIDE)


SQL_CHUNK_DOCUMENTS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
d AS (
  SELECT doc_id, t, len(t) AS n,
         1 + CAST(ceil(greatest(len(t) - {_CHUNK_SIZE}, 0)::DOUBLE
                       / {_CHUNK_STRIDE}) AS INT) AS n_chunks
  FROM t WHERE len(t) > 0
),
c AS (
  SELECT doc_id, t, unnest(generate_series(0, n_chunks - 1)) AS chunk_id
  FROM d
)
SELECT doc_id,
       chunk_id::BIGINT AS chunk_id,
       len(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                      chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}))::BIGINT
         AS n_tokens,
       array_to_string(
         list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                    chunk_id * {_CHUNK_STRIDE} + {_CHUNK_SIZE}), ' ')
         AS chunk_text
FROM c
"""


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition filters: duplicate-word fraction +
    top-bigram fraction per document."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.repetition_stats(d)


SQL_REPETITION_STATS = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
base AS (
  SELECT doc_id, len(t) AS n_words, len(list_distinct(t)) AS nd FROM t
),
bc AS (SELECT doc_id, bg, count(*) AS c FROM ({_SQL_BIGRAMS}) GROUP BY 1, 2),
agg AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM bc GROUP BY 1)
SELECT b.doc_id,
       b.n_words,
       round(CASE WHEN b.n_words > 0
                  THEN 1.0 - b.nd::DOUBLE / b.n_words::DOUBLE
                  ELSE 0.0 END, 4) AS dup_word_frac,
       round(coalesce(a.top::DOUBLE / a.tot::DOUBLE, 0.0), 4) AS top_bigram_frac
FROM base b LEFT JOIN agg a USING (doc_id)
"""


def _lm_scores_build(spark, sf_dir):
    """The raw (uncached) corpus bigram-LM score frame (doc_id,
    n_bigrams, avg_logp) — shared by lm_bigram_score and both
    perplexity-bucket queries; plan tests inspect THIS."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # Spread a narrow corpus scan before the tokenize+bigram-explode
    # front (size-aware; the _doc_index_build convention).
    return text.lm_bigram_score(dedup.spread(d))


def _lm_scores(spark, sf_dir):
    key = (spark, sf_dir)
    if key not in _LM_SCORE_CACHE:
        _LM_SCORE_CACHE[key] = _lm_scores_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _LM_SCORE_CACHE[key]


def q_lm_bigram_score(spark, sf_dir):
    """Corpus-as-its-own-LM perplexity signal: mean log2 P(w2|w1) of
    each document's bigrams under corpus bigram statistics (the
    shared `_build:lm_scores` frame)."""
    return _lm_scores(spark, sf_dir)


SQL_LM_BIGRAM_SCORE = f"""
WITH bg AS ({_SQL_BIGRAMS}),
cbg AS (SELECT w1, bg, count(*) AS cbg FROM bg GROUP BY 1, 2),
cw1 AS (SELECT w1, sum(cbg) AS cw1 FROM cbg GROUP BY 1),
model AS (
  SELECT bg, log2(cbg::DOUBLE / cw1::DOUBLE) AS logp
  FROM cbg JOIN cw1 USING (w1)
)
SELECT doc_id, count(*) AS n_bigrams, round(avg(logp), 4) AS avg_logp
FROM bg JOIN model USING (bg)
GROUP BY doc_id
"""

# Stratum denominators for the sampling query: keep all of src0,
# halve src1, fifth src2; unlisted sources fall to 1/3.
_SAMPLE_RATES = {"src0": 1, "src1": 2, "src2": 5}
_SAMPLE_DEFAULT = 3


def q_stratified_sample(spark, sf_dir):
    """Deterministic hash-stratified corpus subsampling by source —
    reproducible across runs/engines (md5 keys, not rand())."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.stratified_sample(
        d, "source", _SAMPLE_RATES, key_col="doc_id",
        default_denom=_SAMPLE_DEFAULT)


def _stratified_sql() -> str:
    whens = "\n         ".join(
        f"WHEN source = '{v}' THEN {d}"
        for v, d in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, source FROM documents
WHERE ('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT
      % (CASE {whens} ELSE {_SAMPLE_DEFAULT} END) = 0
"""


SQL_STRATIFIED_SAMPLE = _stratified_sql()

# Exact copies of docs 10..19 planted for the pipeline's dedup stage.
_COPY_OFFSET = 3_000_000


def q_pipeline_clean(spark, sf_dir):
    """End-to-end cleaning pipeline — the operators composed the way a
    training-data run chains them: PII scrub → language filter →
    repetition filter → exact dedup (keep min doc id) → per-doc stats.

    Composition is plan-shaped, not job-shaped: pii_scrub and
    language_id are per-row column operators, so chaining them stays
    one scan; the repetition signals this filter needs (n_words,
    dup_word_frac) are likewise per-row — repetition_stats' bigram
    AGGREGATION isn't required, so no join re-computing the scrub.
    Keep-min-per-content-hash is a window over md5(text) (high-entropy
    partition key). Net physical plan: one scan per union branch
    (each with its own pushed filter), ONE exchange total — verified
    by test_plans.py.
    """
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    pii = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + _PII_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_PII_SUFFIX)).alias("text"),
    )
    copies = d.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)).select(
        (F.col("doc_id") + _COPY_OFFSET).alias("doc_id"), "text",
    )
    base = d.unionByName(pii).unionByName(copies)
    scrubbed = text.pii_scrub(base).select(
        "doc_id", F.col("text_clean").alias("text"), "n_pii")
    lang = text.language_id(scrubbed).filter(F.col("lang_guess") == "en")
    toks = text._tokens(F.col("text"))
    n_words = F.size(toks)
    dup_frac = F.round(
        F.when(n_words > 0,
               F.lit(1.0) - F.size(F.array_distinct(toks)).cast("double")
               / n_words.cast("double"))
        .otherwise(F.lit(0.0)), 4)
    kept = lang.select(
        "doc_id", "text", "n_pii", "en_score",
        n_words.alias("n_words"), dup_frac.alias("dup_word_frac"),
    ).filter(F.col("dup_word_frac") <= 0.8)
    w = Window.partitionBy(F.md5("text"))
    return (
        kept.withColumn("__keep", F.min("doc_id").over(w))
        .filter(F.col("doc_id") == F.col("__keep"))
        .select("doc_id", "n_pii", "en_score", "n_words", "dup_word_frac")
    )


def _pipeline_sql() -> str:
    pii_ctes, pii_final, pii_total = _pii_ctes("d")
    return f"""
WITH docs0 AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_PII_OFFSET} AS doc_id, text || '{_PII_SUFFIX}' AS text
  FROM documents WHERE doc_id < 10
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id >= 10 AND doc_id < 20
),
d AS (SELECT doc_id, text AS t FROM docs0),
{pii_ctes},
sc AS (SELECT doc_id, t AS text, ({pii_total})::INT AS n_pii FROM {pii_final}),
toks AS (SELECT doc_id, {_SQL_TOKS} AS tk FROM sc),
lang AS (
  SELECT doc_id,
    len(list_filter(tk, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE
      / greatest(len(tk)::DOUBLE, 1.0) AS ratio
  FROM toks
),
rep AS (
  SELECT doc_id, len(tk) AS n_words,
         round(CASE WHEN len(tk) > 0
                    THEN 1.0 - len(list_distinct(tk))::DOUBLE / len(tk)::DOUBLE
                    ELSE 0.0 END, 4) AS dup_word_frac
  FROM toks
),
kept AS (
  SELECT sc.doc_id, sc.text, sc.n_pii, round(l.ratio, 4) AS en_score,
         r.n_words, r.dup_word_frac
  FROM sc JOIN lang l USING (doc_id) JOIN rep r USING (doc_id)
  WHERE l.ratio >= 0.08 AND r.dup_word_frac <= 0.8
)
SELECT doc_id, n_pii, en_score, n_words, dup_word_frac
FROM kept
QUALIFY doc_id = min(doc_id) OVER (PARTITION BY md5(text))
"""


SQL_PIPELINE_CLEAN = _pipeline_sql()


def q_corpus_stats(spark, sf_dir):
    """Corpus profiling: per-language doc counts and exact word-count
    percentiles (p50/p90/p99) — the dataset card every training-data
    drop ships with. Exact `percentile` (not approx) so the oracle
    matches bit-for-bit; at 100 TB swap in percentile_approx and drop
    the oracle's exactness, same plan shape (one partial-agg shuffle
    on the 5-value lang key)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    nw = F.size(text._tokens(F.col("text"))).alias("n_words")
    return (
        d.select("lang", nw)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_words"), 4).alias("mean_words"),
            F.round(F.percentile("n_words", F.lit(0.5)), 4).alias("p50_words"),
            F.round(F.percentile("n_words", F.lit(0.9)), 4).alias("p90_words"),
            F.round(F.percentile("n_words", F.lit(0.99)), 4).alias("p99_words"),
        )
    )


SQL_CORPUS_STATS = f"""
SELECT lang,
       count(*) AS n_docs,
       round(avg(nw), 4) AS mean_words,
       round(quantile_cont(nw, 0.5), 4) AS p50_words,
       round(quantile_cont(nw, 0.9), 4) AS p90_words,
       round(quantile_cont(nw, 0.99), 4) AS p99_words
FROM (SELECT lang, len({_SQL_TOKS}) AS nw FROM documents)
GROUP BY lang
"""


def q_multimodal_frames(spark, sf_dir):
    """Video frame-sampling plan over synthetic media: documents as
    opaque payloads with duration_ms = n_chars × 10, one row per
    sampled frame timestamp (1 fps). The explode-by-timestamp shape a
    real frame sampler feeds into the codec UDF — bytes never leave
    the payload column."""
    d = _t(spark, sf_dir, "documents")
    media = multimodal.documents_as_media(
        d, duration_ms=F.col("n_chars") * 10)
    return multimodal.frame_sample_plan(media, every_ms=1000)


SQL_MULTIMODAL_FRAMES = """
SELECT doc_id AS media_id,
       unnest(generate_series(0, greatest(n_chars * 10 - 1, 0), 1000)) AS frame_ts_ms
FROM documents
"""


def q_dedup_incremental(spark, sf_dir):
    """Incremental (cross-corpus) near-dup candidates: a 'new' shard
    (odd doc ids + planted near-copies of stored docs) checked against
    the 'stored' corpus (even doc ids) — pairs BETWEEN sides only, the
    steady-state shape of a crawl pipeline's dedup."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    stored = d.filter(F.col("doc_id") % 2 == 0)
    planted = d.filter((F.col("doc_id") < 40) & (F.col("doc_id") % 2 == 0)).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    new = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    return dedup.cross_minhash_pairs(
        new, stored, k=3, num_hashes=_MINHASH_N, bands=_MINHASH_BANDS)


def _minhash_store(spark, sf_dir: str) -> str:
    """Materialized band index over the stored half of documents —
    built once per process (persistent infrastructure, like the ANN
    indexes); the indexed query then measures probe cost only."""
    import tempfile

    key = ("mh", sf_dir)
    if key not in _ANN_INDEX_CACHE:
        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        stored = d.filter(F.col("doc_id") % 2 == 0)
        path = _infra_tmpdir("mhidx-") + "/idx"
        dedup.build_minhash_index(
            stored, path, k=3, num_hashes=_MINHASH_N, bands=_MINHASH_BANDS)
        _ANN_INDEX_CACHE[key] = path
    return _ANN_INDEX_CACHE[key]


def q_dedup_incremental_indexed(spark, sf_dir):
    """Incremental dedup through the MATERIALIZED band index: the
    stored corpus was sketched once at build; only the new shard is
    sketched per query. Same oracle as dedup_incremental — the index
    changes where the store's bands come from, not the answer."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter((F.col("doc_id") < 40) & (F.col("doc_id") % 2 == 0)).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zzz")).alias("text"),
    )
    new = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    return dedup.probe_minhash_index(
        spark, _minhash_store(spark, sf_dir), new)


def _mh_side_ctes(src: str, suffix: str) -> str:
    """Shingle → minhash → band CTEs for one side of the cross check
    (same maths as _SQL_MINHASH_CTES, parameterized by source CTE)."""
    return f"""sh{suffix} AS (
  SELECT DISTINCT id, unnest(
    list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id AS id, {_SQL_TOKS} AS t FROM {src})
),
mh{suffix} AS (
  SELECT id, seed,
         min(('0x' || substring(md5(seed::VARCHAR || '|' || shingle), 1, 15))::BIGINT) AS v
  FROM sh{suffix}, range({_MINHASH_N}) s(seed)
  GROUP BY id, seed
),
bands{suffix} AS (
  SELECT id, seed // {_R} AS band,
         md5(string_agg(v::VARCHAR, ',' ORDER BY seed)) AS bh
  FROM mh{suffix} GROUP BY id, seed // {_R}
)"""


SQL_DEDUP_INCREMENTAL = f"""
WITH newdocs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id, text || ' zzz' AS text
  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0
),
stored AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
{_mh_side_ctes("stored", "_s")},
{_mh_side_ctes("newdocs", "_n")}
SELECT DISTINCT s.id AS id_a, n.id AS id_b
FROM bands_s s JOIN bands_n n ON s.band = n.band AND s.bh = n.bh
"""

# Decontamination: k-gram size. Longer than the dedup shingles — a
# contamination hit should mean a verbatim benchmark phrase, not
# shared trigram soup.
_DECON_K = 5


def q_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training docs sharing any
    5-gram with the held-out eval set (docs 0..19), with the
    shared-shingle count as evidence. Plan: distinct shingles per
    side, inner join on shingle (eval side tiny → broadcast), groupBy
    doc. The canonical pre-training leakage check."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    ev = d.filter(F.col("doc_id") < 20)
    train = d.filter(F.col("doc_id") >= 20).unionByName(
        ev.select((F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text")
    )
    # the train side carries the shingle work — spread the narrow
    # single-file scan across cores before the md5-heavy explode
    tr_sh = dedup.shingles(dedup.spread(train), "doc_id", "text", k=_DECON_K)
    ev_sh = dedup.shingles(ev, "doc_id", "text", k=_DECON_K) \
        .select("shingle").distinct()
    return (
        tr_sh.join(F.broadcast(ev_sh), "shingle")
        .groupBy(F.col("id").alias("doc_id"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _decon_shingles(src: str, suffix: str, k: int = _DECON_K) -> str:
    return f"""sh{suffix} AS (
  SELECT DISTINCT id, unnest(
    list_transform(generate_series(1, greatest(len(t) - {k - 1}, 1)),
                   i -> array_to_string(t[i:i+{k - 1}], ' '))) AS shingle
  FROM (SELECT doc_id AS id, {_SQL_TOKS} AS t FROM {src})
)"""


SQL_DECONTAMINATE = f"""
WITH ev AS (SELECT doc_id, text FROM documents WHERE doc_id < 20),
train AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= 20
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id, text FROM ev
),
{_decon_shingles("train", "_t")},
{_decon_shingles("ev", "_e")},
evs AS (SELECT DISTINCT shingle FROM sh_e)
SELECT t.id AS doc_id, count(*) AS n_shared
FROM sh_t t JOIN evs USING (shingle)
GROUP BY t.id
"""

# Per-language token budget for the selection query (documents are a
# few dozen to a few hundred words; 2000 tokens ≈ a few dozen docs).
_TOKEN_BUDGET = 2000


def q_token_budget_select(spark, sf_dir):
    """Quality-ranked data mixing under a token budget: per language,
    take documents in descending quality order until the cumulative
    token estimate reaches the budget — the selection step that turns
    scored documents into a training mix. One window (partitioned by
    lang, explicit ROWS frame) — no global sort, no driver loop."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text.quality_score(text.token_count(d))
    w = (
        Window.partitionBy("lang")
        .orderBy(F.col("quality").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        scored.withColumn("cum_tokens", F.sum("n_tokens_est").over(w))
        .filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens_est", "quality", "cum_tokens")
    )


def q_token_budget_select_dist(spark, sf_dir):
    """token_budget_select without the per-language window: the same
    budgeted cut through the two-phase distributed grouped cumsum
    (relational.grouped_cumsum_dist) — no task ever sorts a whole
    language; token counts are integral so range offsets add exactly.
    Same oracle."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text.quality_score(text.token_count(d)).withColumn(
        "__ord", -F.col("quality"))  # DESC quality as ASC key (exact:
    # quality is rounded to 4 decimals)
    out = R.grouped_cumsum_dist(
        scored, "lang", "__ord", "doc_id", "n_tokens_est", out_col="cum_tokens")
    return (
        out.filter(F.col("cum_tokens") <= _TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens_est", "quality", "cum_tokens")
    )


SQL_TOKEN_BUDGET_SELECT = f"""
WITH f AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS t FROM documents
),
m AS (
  SELECT doc_id, lang,
    greatest(len(t)::BIGINT, CAST(ceil(length(text) / 4.0) AS BIGINT)) AS n_tokens_est,
    len(t)::DOUBLE AS n_words,
    len(list_filter(t, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE AS n_stop,
    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE AS n_punct,
    len(list_distinct(t))::DOUBLE AS n_distinct,
    length(text)::DOUBLE AS n_chars
  FROM f
),
q AS (
  SELECT doc_id, lang, n_tokens_est,
    round(least((n_stop / greatest(n_words, 1.0)) * 2, 1.0) * 0.4
          + (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5, 1.0)) * 0.2
          + (1.0 - (1.0 - n_distinct / greatest(n_words, 1.0))) * 0.4, 4) AS quality
  FROM m
),
c AS (
  SELECT doc_id, lang, n_tokens_est, quality,
         sum(n_tokens_est) OVER (
           PARTITION BY lang ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
  FROM q
)
SELECT doc_id, lang, n_tokens_est, quality,
       CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM c WHERE cum_tokens <= {_TOKEN_BUDGET}
"""


#: tokens per packed training bin (small so the bench corpus yields
#: multi-doc bins; production uses the model's context length).
_PACK_BUDGET = 256


def q_pack_sequences(spark, sf_dir):
    """Sequence packing: lay documents head-to-tail in a deterministic
    (portable-hash) order per language and cut the token stream into
    fixed-budget training bins — each document gets (bin_id,
    bin_offset). The layout step between chunking and shard writing: a
    trainer concatenates each bin and pads only its tail, so padding
    waste is bounded by one doc tail per bin.

    Scale: one lang-partitioned window with an explicit ROWS frame —
    no global sort, no driver loop; the order key is the shared md5
    hash (sampling._key_hash), so bins are bit-identical across
    engines and runs."""
    from twitter_to_sqlite_spark.functions.sampling import _key_hash

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    staged = d.select(
        "doc_id", "lang",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                     lambda x: x != "")
        ).cast("long").alias("n_tokens"),
        _key_hash(F.col("doc_id")).alias("__hk"),
    )
    w = (
        Window.partitionBy("lang").orderBy("__hk", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return staged.select(
        "doc_id", "lang", "n_tokens",
        F.floor(start / F.lit(_PACK_BUDGET)).cast("long").alias("bin_id"),
        (start % _PACK_BUDGET).alias("bin_offset"),
    )


SQL_PACK_SEQUENCES = f"""
WITH t AS (
  SELECT doc_id, lang, len({_SQL_TOKS})::BIGINT AS n_tokens,
         ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))::BIGINT AS hk
  FROM documents
),
c AS (
  SELECT doc_id, lang, n_tokens,
         sum(n_tokens) OVER (PARTITION BY lang ORDER BY hk, doc_id
                             ROWS UNBOUNDED PRECEDING) - n_tokens AS start
  FROM t
)
SELECT doc_id, lang, n_tokens,
       (start // {_PACK_BUDGET})::BIGINT AS bin_id,
       (start % {_PACK_BUDGET})::BIGINT AS bin_offset
FROM c
"""


#: rolling-window width (tokens) for exact substring-duplication spans.
_SPAN_WINDOW = 8


# One rolling-hash span computation per (session, sf_dir) per process:
# the span frame feeds both the detect query (substring_dedup) and the
# clean query (substring_clean) — the build is the expensive half
# (every 8-gram of the corpus hashed + a count window), so recomputing
# it per query doubled the gate's slowest entry. Same
# build-once-probe-many shape as _MINHASH_PAIRS_CACHE;
# localCheckpoint(eager=False) materializes on first action.


def _dup_positions_build(spark, sf_dir) -> DataFrame:
    """The raw (uncached) duplicated-positions front — one tokenize +
    per-position md5 + per-hash count/min window pass, the expensive
    half of BOTH span policies. Plan tests inspect THIS (the cached
    form explains as a Scan ExistingRDD checkpoint)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.duplicate_positions(d, window=_SPAN_WINDOW)


def _dup_positions(spark, sf_dir) -> DataFrame:
    """Shared (session, sf_dir)-cached duplicated-positions frame —
    billed per bench pass as `_build:dup_positions`; serves
    duplicate_spans (ignores the canonical flag) and
    duplicate_spans_keep_first (drops canonical rows), so the corpus
    hash-window pass is paid once per pipeline run, not per policy."""
    key = (spark, sf_dir)
    if key not in _DUP_POS_CACHE:
        _DUP_POS_CACHE[key] = _dup_positions_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _DUP_POS_CACHE[key]


def _dup_spans_build(spark, sf_dir) -> DataFrame:
    """The span pipeline over the shared positions frame (islands
    merge only — the hash-window front lives in _dup_positions)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.duplicate_spans(
        d, window=_SPAN_WINDOW, positions=_dup_positions(spark, sf_dir))


def _dup_spans(spark, sf_dir) -> DataFrame:
    key = (spark, sf_dir)
    if key not in _SPAN_CACHE:
        _SPAN_CACHE[key] = _dup_spans_build(
            spark, sf_dir).localCheckpoint(eager=False)
    return _SPAN_CACHE[key]


def q_substring_dedup(spark, sf_dir):
    """Exact substring-duplication spans (Lee et al. 2022 re-expressed
    as rolling window hashes): maximal token ranges whose every 8-gram
    occurs ≥2 times corpus-wide. Two linear shuffles, no pair join."""
    return _dup_spans(spark, sf_dir)


def _substring_sql(d_cte: str, clean: bool) -> str:
    """Shared oracle builder for the substring-dedup family: rolling
    window hashes (t, w) → a caller-supplied duplicated-positions CTE
    `d` → gaps-and-islands span merge (f, s). With ``clean`` the spans
    are aggregated per doc and cut out of the token array (the
    remove_spans twin); otherwise the span rows themselves are
    returned. One definition of the merge/removal algebra, three
    oracles — the policy variants differ ONLY in `d`."""
    head = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS t FROM documents),
w AS (
  SELECT doc_id, i - 1 AS pos,
         md5(array_to_string(list_slice(t, i, i + {_SPAN_WINDOW} - 1), ' ')) AS h
  FROM t, unnest(generate_series(1, len(t) - {_SPAN_WINDOW} + 1)) AS u(i)
  WHERE len(t) >= {_SPAN_WINDOW}
),
d AS ({d_cte}),
f AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {_SPAN_WINDOW}
              THEN 0 ELSE 1 END AS new_span
  FROM d
),
s AS (
  SELECT doc_id, pos,
         sum(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM f
)"""
    if not clean:
        return head + f"""
SELECT doc_id,
       min(pos)::BIGINT AS span_start,
       (max(pos) + {_SPAN_WINDOW})::BIGINT AS span_end,
       (max(pos) + {_SPAN_WINDOW} - min(pos))::BIGINT AS n_dup_tokens
FROM s GROUP BY doc_id, sid
"""
    return head + f""",
spans AS (
  SELECT doc_id, min(pos) AS s, max(pos) + {_SPAN_WINDOW} AS e
  FROM s GROUP BY doc_id, sid
),
per_doc AS (
  SELECT doc_id, list(struct_pack(s := s, e := e)) AS sp
  FROM spans GROUP BY doc_id
),
joined AS (
  SELECT t.doc_id, t.t,
         coalesce(p.sp, CAST([] AS STRUCT(s BIGINT, e BIGINT)[])) AS sp
  FROM t LEFT JOIN per_doc p USING (doc_id)
  WHERE len(t.t) > 0
),
kept AS (
  SELECT doc_id, t,
         list_filter(generate_series(0, len(t) - 1),
                     i -> len(list_filter(sp,
                              x -> i >= x.s AND i < x.e)) = 0) AS keep
  FROM joined
)
SELECT doc_id,
       coalesce(array_to_string(list_transform(keep, i -> t[i + 1]), ' '), '')
         AS text_clean,
       (len(t) - len(keep))::BIGINT AS n_removed_tokens
FROM kept
"""


# every window whose hash occurs ≥2 times corpus-wide (the aggressive
# remove-every-occurrence policy)
_D_ALL_DUPS = """
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, count(*) OVER (PARTITION BY h) AS c FROM w
  ) WHERE c > 1
"""

# same, EXCEPT each hash's canonical corpus-wide occurrence —
# (min doc_id, then min pos within it) — which survives (keep-first)
_D_KEEP_FIRST = """
  SELECT doc_id, pos FROM (
    SELECT doc_id, pos, c, mid,
           min(CASE WHEN doc_id = mid THEN pos END)
             OVER (PARTITION BY h) AS mpos
    FROM (
      SELECT doc_id, pos, h,
             count(*) OVER (PARTITION BY h) AS c,
             min(doc_id) OVER (PARTITION BY h) AS mid
      FROM w
    )
  ) WHERE c > 1 AND NOT (doc_id = mid AND pos = mpos)
"""

SQL_SUBSTRING_DEDUP = _substring_sql(_D_ALL_DUPS, clean=False)

def q_substring_clean(spark, sf_dir):
    """Exact substring dedup, applied: detect duplicated spans
    (q_substring_dedup) and cut them out of the text — the
    'remove every duplicated range' policy of Lee et al. 2022's
    aggressive variant. Detection plus one 1:1 join and per-row
    array surgery; the span frame is shared with substring_dedup
    (_SPAN_CACHE) — built once per (session, sf_dir)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup.remove_spans(d, _dup_spans(spark, sf_dir))


SQL_SUBSTRING_CLEAN = _substring_sql(_D_ALL_DUPS, clean=True)


def q_substring_clean_keep_first(spark, sf_dir):
    """Exact substring dedup, Lee et al. 2022 §4's ACTUAL treatment:
    every duplicated 8-gram keeps its canonical corpus-wide
    occurrence ((min doc_id, min pos)) and all other occurrences are
    cut out — one copy of every shared span survives, unlike
    substring_clean's aggressive remove-every-occurrence policy.
    Detection stays linear (the duplicate_spans shape plus two more
    frame-free aggregates on the same per-hash window partition — no
    pair join, no per-hash sort), then remove_spans' 1:1 join + array
    surgery. New capability staged in round 9 (VERDICT r8 task 2a).
    Detection consumes the shared _dup_positions frame (r10): the
    hash-window front is paid once for both span policies; keep-first
    is the frame minus its canonical rows."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    spans = dedup.duplicate_spans_keep_first(
        d, window=_SPAN_WINDOW, positions=_dup_positions(spark, sf_dir))
    return dedup.remove_spans(d, spans)


SQL_SUBSTRING_CLEAN_KEEP_FIRST = _substring_sql(_D_KEEP_FIRST, clean=True)

# Target mixture proportions per source for q_mix_corpora (ratios,
# need not sum to 1); sources outside the map are excluded.
_MIX_WEIGHTS = {"src0": 0.4, "src1": 0.3, "src2": 0.2, "src3": 0.1}


def q_mix_corpora(spark, sf_dir):
    """Weighted corpus-mixture planning: the largest training mix whose
    per-source token counts follow the target weights exactly — budget
    B = min_s(T_s/w_s), stratum s cut at w_s·B in deterministic hash
    order. Broadcast budget join + one per-stratum cumsum window."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    staged = d.select(
        "doc_id", "source",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                     lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    )
    return sampling.mix_corpora(
        staged, "source", _MIX_WEIGHTS, key_col="doc_id",
        token_col="n_tokens")


def q_mix_corpora_dist(spark, sf_dir):
    """mix_corpora through the distributed grouped cumsum (no
    per-stratum window) — same budgets, same cut, same oracle."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source", "text")
    staged = d.select(
        "doc_id", "source",
        F.size(
            F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                     lambda x: x != "")
        ).cast("long").alias("n_tokens"),
    )
    return sampling.mix_corpora(
        staged, "source", _MIX_WEIGHTS, key_col="doc_id",
        token_col="n_tokens", distributed=True)


def _mix_sql() -> str:
    whens = " ".join(
        f"WHEN '{v}' THEN {w}" for v, w in sorted(_MIX_WEIGHTS.items())
    )
    srcs = ", ".join(f"'{v}'" for v in sorted(_MIX_WEIGHTS))
    return f"""
WITH d AS (
  SELECT doc_id, source, len({_SQL_TOKS})::BIGINT AS n_tokens,
         ('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT AS hk,
         (CASE source {whens} END)::DOUBLE AS w
  FROM documents WHERE source IN ({srcs})
),
tot AS (SELECT source, w, sum(n_tokens) AS tot FROM d GROUP BY 1, 2),
sc AS (SELECT min(tot::DOUBLE / w) AS scale FROM tot),
b AS (SELECT source, w * scale AS budget FROM tot, sc),
c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY hk, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM d
)
SELECT c.doc_id, c.source, c.n_tokens, c.cum_tokens::BIGINT AS cum_tokens,
       round(b.budget, 4) AS budget
FROM c JOIN b USING (source)
WHERE c.cum_tokens <= b.budget
"""


SQL_MIX_CORPORA = _mix_sql()


def q_gopher_filter(spark, sf_dir):
    """Composite Gopher quality gate (Rae et al. 2021 rules) — every
    rule's signal + verdict + the conjunction, one narrow no-shuffle
    pass (text.gopher_filter)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return text.gopher_filter(d)


# The gopher signal CTEs, defined ONCE and interpolated into both
# SQL_GOPHER_FILTER and SQL_GATE_ABLATION so the ablation judges
# exactly the flags the gate publishes — a single definition cannot
# drift (ADVICE r7: the previous second copy could).
GOPHER_M_CTE = f"""WITH t AS (SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents),
m AS (
  SELECT doc_id,
    len(t)::BIGINT AS n_words,
    list_sum(list_transform(t, x -> length(x)))::DOUBLE
      / greatest(len(t)::DOUBLE, 1.0) AS mean_wl,
    len(list_filter(t, x -> regexp_matches(x, '[a-z]')))::DOUBLE
      / greatest(len(t)::DOUBLE, 1.0) AS alpha_frac,
    len(list_filter({_SQL_STOPLIST}, s -> list_contains(t, s)))::BIGINT
      AS n_stop_hits,
    (length(text) - length(regexp_replace(text, '[#…]', '', 'g')))::DOUBLE
      / greatest(len(t)::DOUBLE, 1.0) AS symbol_ratio
  FROM t
)"""

SQL_GOPHER_FILTER = f"""
{GOPHER_M_CTE}
SELECT doc_id, n_words,
       round(mean_wl, 4) AS mean_word_len,
       round(alpha_frac, 4) AS alpha_frac,
       n_stop_hits,
       round(symbol_ratio, 4) AS symbol_ratio,
       (n_words >= {text.GOPHER_MIN_WORDS}
        AND n_words <= {text.GOPHER_MAX_WORDS}) AS pass_words,
       (mean_wl >= {text.GOPHER_MIN_MEAN_WL}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WL}) AS pass_word_len,
       (alpha_frac >= {text.GOPHER_MIN_ALPHA_FRAC}) AS pass_alpha,
       (n_stop_hits >= {text.GOPHER_MIN_STOP_HITS}) AS pass_stopwords,
       (symbol_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}) AS pass_symbols,
       (n_words >= {text.GOPHER_MIN_WORDS}
        AND n_words <= {text.GOPHER_MAX_WORDS}
        AND mean_wl >= {text.GOPHER_MIN_MEAN_WL}
        AND mean_wl <= {text.GOPHER_MAX_MEAN_WL}
        AND alpha_frac >= {text.GOPHER_MIN_ALPHA_FRAC}
        AND n_stop_hits >= {text.GOPHER_MIN_STOP_HITS}
        AND symbol_ratio <= {text.GOPHER_MAX_SYMBOL_RATIO}) AS keep
FROM m
"""

#: vocabulary size cap for q_vocab_stats (tie-broken deterministically).
_VOCAB_TOPK = 100


def q_vocab_stats(spark, sf_dir):
    """Corpus vocabulary statistics — the tokenizer-training /
    stopword-mining prep step: top-k unigrams by occurrence count with
    document frequency; explode → one partial-agg shuffle → top-k
    (deterministic tie-break on the word)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    toks = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                     lambda x: x != "")
        ).alias("word"),
    )
    agg = toks.groupBy("word").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.countDistinct("doc_id").alias("n_docs"),
    )
    return agg.orderBy(F.col("n_occurrences").desc(), "word") \
              .limit(_VOCAB_TOPK)


SQL_VOCAB_STATS = f"""
SELECT word, count(*)::BIGINT AS n_occurrences,
       count(DISTINCT doc_id)::BIGINT AS n_docs
FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS word FROM documents)
GROUP BY word
ORDER BY n_occurrences DESC, word
LIMIT {_VOCAB_TOPK}
"""

# (_SPLITS is defined above q_split_leakage — shared split weights.)


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test assignment: hash-bucketed split
    membership that is a pure function of the row key — stable under
    reruns and corpus growth (sampling.assign_splits). No shuffle."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return sampling.assign_splits(d, _SPLITS, key_col="doc_id")


def _split_sql() -> str:
    total = sum(_SPLITS.values())
    cases, lo = [], 0
    for name, wt in _SPLITS.items():
        cases.append(f"WHEN b < {lo + wt} THEN '{name}'")
        lo += wt
    return f"""
SELECT doc_id, source, CASE {' '.join(cases)} END AS split
FROM (
  SELECT doc_id, source,
         ('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT
           % {total} AS b
  FROM documents
)
"""


SQL_DATASET_SPLIT = _split_sql()

#: per-group rank cutoff for q_topk_per_group.
_GROUP_TOPK = 3


def q_topk_per_group(spark, sf_dir):
    """Per-group top-k: the k highest-quality documents per language
    (rank window, deterministic tie-break) — the per-stratum 'best
    examples' selection; Spark prunes the rank filter into the sort
    via WindowGroupLimit, so each group materializes only k rows."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text.quality_score(text.token_count(d))
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _GROUP_TOPK)
        .select("doc_id", "lang", "quality",
                F.col("rank").cast("int").alias("rank"))
    )


SQL_TOPK_PER_GROUP = f"""
WITH f AS (
  SELECT doc_id, lang, text, {_SQL_TOKS} AS t FROM documents
),
m AS (
  SELECT doc_id, lang,
    len(t)::DOUBLE AS n_words,
    len(list_filter(t, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE AS n_stop,
    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE AS n_punct,
    len(list_distinct(t))::DOUBLE AS n_distinct,
    length(text)::DOUBLE AS n_chars
  FROM f
),
q AS (
  SELECT doc_id, lang,
    round(least((n_stop / greatest(n_words, 1.0)) * 2, 1.0) * 0.4
          + (1.0 - least((n_punct / greatest(n_chars, 1.0)) * 5, 1.0)) * 0.2
          + (1.0 - (1.0 - n_distinct / greatest(n_words, 1.0))) * 0.4, 4) AS quality
  FROM m
),
r AS (
  SELECT doc_id, lang, quality,
         row_number() OVER (PARTITION BY lang
                            ORDER BY quality DESC, doc_id) AS rank
  FROM q
)
SELECT doc_id, lang, quality, rank::INT AS rank
FROM r WHERE rank <= {_GROUP_TOPK}
"""




def q_weighted_sample(spark, sf_dir):
    """Fixed-size quality-weighted sample without replacement
    (sampling.weighted_sample, Efraimidis-Spirakis A-ES): exactly 100
    docs, inclusion probability ∝ quality score, draw a pure function
    of doc_id — the reproducible 'tilt toward quality but keep
    diversity' selection with a guaranteed output size (unlike the
    acceptance-based importance_sample)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = text.quality_score(text.token_count(d)).select(
        "doc_id", "lang", "quality")
    from twitter_to_sqlite_spark.functions import sampling

    s = sampling.weighted_sample(
        scored, k=_WS_K, weight_col="quality", key_col="doc_id",
        resolution=_WS_RES)
    return s.select("doc_id", "lang", "quality",
                    F.col("__sk").alias("sample_key"))




def q_tfidf_terms(spark, sf_dir):
    """Per-language characteristic vocabulary: top-5 terms by TF-IDF
    (text.tfidf_top_terms). idf·Σtf keeps the sum integer until one
    final multiply, so the score is aggregation-order-independent —
    the float-sum-order trap of distributed TF-IDF never arises."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return text.tfidf_top_terms(d, group_col="lang", k=5)


SQL_TFIDF_TERMS = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({_SQL_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, lang, term, count(*) AS tf FROM toks GROUP BY 1, 2, 3),
nd AS (SELECT count(DISTINCT doc_id) AS n FROM tf),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
grp AS (SELECT lang, term, sum(tf) AS tf_sum FROM tf GROUP BY 1, 2),
scored AS (
  SELECT g.lang, g.term, g.tf_sum::BIGINT AS tf_sum, d.df::BIGINT AS df,
         round(ln(nd.n::DOUBLE / d.df::DOUBLE) * g.tf_sum::DOUBLE, 4) AS score
  FROM grp g JOIN dfreq d USING (term), nd
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY lang
                               ORDER BY score DESC, term ASC) AS rank
  FROM scored
)
SELECT lang, term, tf_sum, df, score, rank FROM r WHERE rank <= 5
"""


def q_perplexity_buckets(spark, sf_dir):
    """CCNet-style head/middle/tail perplexity bucketing per language
    (Wenzek et al. 2020): corpus-bigram-LM score (lm_bigram_score) +
    per-language ntile(3) over the rounded score
    (text.perplexity_buckets)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    return text.perplexity_buckets(
        d, group_col="lang", n_buckets=3,
        scored=_lm_scores(spark, sf_dir))


SQL_PERPLEXITY_BUCKETS = f"""
WITH s AS (SELECT * FROM ({SQL_LM_BIGRAM_SCORE})),
j AS (SELECT s.doc_id, d.lang, s.n_bigrams, s.avg_logp
      FROM s JOIN documents d USING (doc_id)),
b AS (
  SELECT *, ntile(3) OVER (PARTITION BY lang
                           ORDER BY avg_logp DESC, doc_id ASC) AS bucket
  FROM j
)
SELECT doc_id, lang, n_bigrams, avg_logp, bucket::BIGINT AS bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 3 THEN 'tail'
            ELSE 'middle' END AS bucket_name
FROM b
"""


def q_perplexity_buckets_dist(spark, sf_dir):
    """perplexity_buckets without the low-cardinality window: a
    per-LANGUAGE ntile puts every document of a language through one
    task, which is a single-task sort of billions of rows at corpus
    scale. This variant computes the identical buckets through the
    two-phase distributed grouped rank (relational.grouped_ntile_dist,
    the batch_chunks_dist machinery generalized) — same oracle."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    scored = _lm_scores(spark, sf_dir)
    j = (
        scored.join(d.select("doc_id", "lang"), "doc_id")
        # DESC score order as an ASC numeric key; avg_logp is rounded
        # to 4 decimals so negation is exact.
        .withColumn("__ord", -F.col("avg_logp"))
    )
    out = R.grouped_ntile_dist(j, "lang", "__ord", "doc_id", 3)
    b = F.col("bucket")
    label = (
        F.when(b == 1, F.lit("head"))
        .when(b == 3, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return out.select(
        "doc_id", "lang", "n_bigrams", "avg_logp", "bucket",
        label.alias("bucket_name"),
    )


_MIX_ALPHA = 0.3


def q_mix_temperature(spark, sf_dir):
    """Temperature-smoothed mixture weights per language (the
    mBERT/XLM-R q_s ∝ p_s^α sampling rule, α=0.3): raw vs smoothed
    token shares + implied upsample factor
    (sampling.temperature_mixture)."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang",
        F.size(F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                        lambda x: x != "")).cast("long").alias("n_tokens"),
    )
    return sampling.temperature_mixture(
        d, "lang", "n_tokens", alpha=_MIX_ALPHA)


SQL_MIX_TEMPERATURE = f"""
WITH per AS (
  SELECT lang, count(*) AS n_docs,
         sum(len({_SQL_TOKS}))::BIGINT AS n_tokens
  FROM documents GROUP BY lang
),
tot AS (SELECT sum(n_tokens) AS tot FROM per),
wp AS (SELECT per.*, n_tokens::DOUBLE / tot::DOUBLE AS p FROM per, tot),
z AS (SELECT sum(pow(p, {_MIX_ALPHA})) AS z FROM wp)
SELECT lang, n_docs, n_tokens,
       round(p, 6) AS p_raw,
       round(pow(p, {_MIX_ALPHA}) / z, 6) AS p_smoothed,
       round((pow(p, {_MIX_ALPHA}) / z) / p, 4) AS upsample
FROM wp, z
"""


def q_importance_sample(spark, sf_dir):
    """Quality-weighted acceptance sampling: each document survives
    with probability = its composite quality score — soft selection
    after scoring (sampling.importance_sample; hash draw, not rand(),
    so the subset is engine- and retry-reproducible)."""
    from twitter_to_sqlite_spark.functions import sampling

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    scored = text.quality_score(d).select("doc_id", "quality")
    return sampling.importance_sample(scored, "quality", "doc_id")


SQL_IMPORTANCE_SAMPLE = f"""
WITH q AS (SELECT doc_id, quality FROM ({SQL_QUALITY_SCORE}))
SELECT doc_id, quality FROM q
WHERE (('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT
       % 1000000)::DOUBLE / 1000000.0 < quality
"""


def q_value_histogram(spark, sf_dir):
    """Fixed-width histogram of event values per event type — the
    profiling pass before choosing filter thresholds. Pure integer
    bucket arithmetic (floor of value/width), one partial-agg shuffle;
    empty buckets are absent by construction in both engines."""
    e = _t(spark, sf_dir, "events").select("event_type", "value")
    bucket = F.floor(F.col("value") / F.lit(10.0)).cast("long")
    return (
        e.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("bucket_lo", (F.col("bucket") * 10.0).cast("double"))
    )


SQL_VALUE_HISTOGRAM = """
SELECT event_type, bucket, count(*) AS n,
       CAST(bucket * 10.0 AS DOUBLE) AS bucket_lo
FROM (SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bucket
      FROM events)
GROUP BY 1, 2
"""


_MANIFEST_SHARDS = 8


def q_shard_manifest(spark, sf_dir):
    """Training-shard manifest: for the deterministic hash sharding of
    sampling.write_training_shards (shard = md5(doc_id) % N), the
    per-shard document count, token total, and byte total — the
    manifest a dataloader consumes. Verifies the shard assignment
    itself against the oracle: membership is a pure function of the
    key, so both engines must produce identical shard populations."""
    from twitter_to_sqlite_spark.functions.sampling import _key_hash

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    shard = (_key_hash(F.col("doc_id")) % _MANIFEST_SHARDS).cast("int")
    toks = F.size(F.filter(F.split(F.lower(F.col("text")), r"\W+"),
                           lambda x: x != "")).cast("long")
    return (
        d.select(shard.alias("shard"), toks.alias("__t"),
                 F.length("text").cast("long").alias("__b"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__t").alias("n_tokens"),
            F.sum("__b").alias("n_bytes"),
        )
    )


SQL_SHARD_MANIFEST = f"""
SELECT (('0x' || substring(md5(doc_id::VARCHAR || ''), 1, 15))::BIGINT
        % {_MANIFEST_SHARDS})::INT AS shard,
       count(*) AS n_docs,
       sum(len({_SQL_TOKS}))::BIGINT AS n_tokens,
       sum(length(text))::BIGINT AS n_bytes
FROM documents GROUP BY 1
"""


def q_cube_revenue(spark, sf_dir):
    """Full CUBE over (order priority × status): every grouping-set
    subtotal in one pass — the all-facets generalization of
    rollup_revenue; Catalyst expands it to a single Expand+agg, no
    per-grouping re-scan. Exact DECIMAL sums cast to double."""
    o = _t(spark, sf_dir, "orders")
    out = o.cube("o_orderpriority", "o_orderstatus").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double")
        .alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    return out.select(
        F.coalesce("o_orderpriority", F.lit("ALL")).alias("o_orderpriority"),
        F.coalesce("o_orderstatus", F.lit("ALL")).alias("o_orderstatus"),
        "revenue",
        "n_orders",
    )


SQL_CUBE_REVENUE = """
SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
"""


def q_running_total(spark, sf_dir):
    """Per-user running total of event values ordered by event id —
    the cumulative-metrics window every activity dashboard needs on
    the reference's count_history-style data. DECIMAL accumulation
    makes every prefix sum exact, so the result is independent of how
    either engine internally associates the window aggregation
    (running fold vs segment tree)."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        F.sum(F.col("value").cast("decimal(28,6)")).over(w)
        .cast("double").alias("cum_value"),
    )


SQL_RUNNING_TOTAL = """
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(28,6)))
            OVER (PARTITION BY user_id ORDER BY event_id
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_value
FROM events
"""


# 16 full-batch iterations at lr=8 reach 86% train accuracy with a
# clear probability separation (mean σ 0.73 for y=1 vs 0.36 for y=0
# at sf0.01) — enough optimization to be a real classifier while
# costing 16 one-aggregation jobs, trained once per corpus (cached).
_LR_ITERS = 16
_LR_LR = 8.0

# One training run per (sf_dir, params) per process — the classifier
# is infrastructure like the IVF centroids: trained once, applied to
# every scoring query.


def _quality_lr(spark, sf_dir) -> list[float]:
    """One classifier training run per (sf_dir, params) per process
    (see _LR_CACHE note above); extracted so bench.py can bill the
    training cost to a named _build: pseudo-entry."""
    from twitter_to_sqlite_spark.functions import classifier

    key = (sf_dir, _LR_ITERS, _LR_LR)
    if key not in _LR_CACHE:
        d = _t(spark, sf_dir, "documents").select("doc_id", "text")
        feats = classifier.quality_features(d)
        _LR_CACHE[key] = classifier.logreg_train(
            feats, iters=_LR_ITERS, lr=_LR_LR)
    return _LR_CACHE[key]


def q_quality_classifier(spark, sf_dir):
    """Distilled quality classifier: full-batch logistic regression
    trained DISTRIBUTEDLY on rational-arithmetic text features with a
    heuristic-gate label (functions/classifier.py) — the fasttext-
    style soft quality scorer of production corpus pipelines, as
    |iters| one-aggregation Spark jobs. Per-iteration rounding makes
    the trajectory engine-independent; the oracle replays the exact
    training relationally."""
    from twitter_to_sqlite_spark.functions import classifier

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    feats = classifier.quality_features(d)
    return classifier.logreg_score(feats, _quality_lr(spark, sf_dir))


def _logreg_parts(iters: int = _LR_ITERS,
                  lr: float = _LR_LR) -> tuple[str, str, str]:
    """Shared CTE chain of the classifier oracles: returns (joined
    CTE SQL, σ(final-weights) expression, final weight CTE name) so
    quality_classifier / classifier_auc / calibration all replay ONE
    training definition instead of three drifting copies."""
    feats = ["x_words", "x_wordlen", "x_stop", "x_dup"]

    def margin(w: str) -> str:
        terms = " + ".join(f"{w}.w{j + 1}*{c}" for j, c in enumerate(feats))
        return f"({w}.b + {terms})"

    def sigma(w: str) -> str:
        return f"(1.0/(1.0+exp(-{margin(w)})))"

    ctes = [
        f"m AS (SELECT doc_id, len(t)::DOUBLE AS n_words,"
        f" len(list_filter(t, x -> list_contains({_SQL_STOPLIST}, x)))::DOUBLE AS ns,"
        f" len(list_distinct(t))::DOUBLE AS nd,"
        f" coalesce(list_sum(list_transform(t, x -> length(x)::BIGINT)), 0)::DOUBLE AS swl"
        f" FROM (SELECT doc_id, {_SQL_TOKS} AS t FROM documents))",
        "mg AS (SELECT m.*, greatest(n_words, 1.0) AS g FROM m)",
        "feat AS (SELECT doc_id, n_words / 100.0 AS x_words,"
        " (swl / g) / 10.0 AS x_wordlen, ns / g AS x_stop,"
        " 1.0 - nd / g AS x_dup,"
        " CASE WHEN n_words >= 15 AND ns / g >= 0.02"
        "      AND (1.0 - nd / g) <= 0.5 THEN 1 ELSE 0 END AS y"
        " FROM mg)",
        "wt0 AS (SELECT 0.0 AS b, "
        + ", ".join(f"0.0 AS w{j + 1}" for j in range(len(feats))) + ")",
    ]
    for t in range(1, iters + 1):
        prev = f"wt{t - 1}"
        resid = f"(y - {sigma(prev)})"
        gsel = ", ".join(
            [f"avg({resid}) AS g0"]
            + [f"avg({resid}*{c}) AS g{j + 1}" for j, c in enumerate(feats)]
        )
        # MATERIALIZED: DuckDB inlines CTEs by default, and each
        # iteration references the previous weights several times —
        # inlining makes the expression tree EXPONENTIAL in iters.
        ctes.append(f"gr{t} AS MATERIALIZED (SELECT {gsel} FROM feat, {prev})")
        wsel = ", ".join(
            [f"round({prev}.b + {lr}*g0, 6) AS b"]
            + [f"round({prev}.w{j + 1} + {lr}*g{j + 1}, 6) AS w{j + 1}"
               for j in range(len(feats))]
        )
        ctes.append(f"wt{t} AS MATERIALIZED (SELECT {wsel} FROM {prev}, gr{t})")
    final = f"wt{iters}"
    return ",\n".join(ctes), sigma(final), final


def _logreg_sql(iters: int = _LR_ITERS, lr: float = _LR_LR) -> str:
    """DuckDB twin of classifier.logreg_train + logreg_score: the same
    features, the same zero init, the same round(w + lr·avg(grad), 6)
    per iteration, the same rounded-σ verdict."""
    joined, sig, final = _logreg_parts(iters, lr)
    return f"""
WITH {joined}
SELECT doc_id, y,
       round({sig}, 4) AS prob,
       round({sig}, 4) > 0.5 AS keep
FROM feat, {final}
"""


SQL_QUALITY_CLASSIFIER = _logreg_sql()


def q_classifier_auc(spark, sf_dir):
    """Exact ROC-AUC of the distilled quality classifier against its
    training labels (functions/stats.py::roc_auc) — the measure-don't-
    guess companion of quality_classifier: before a soft scorer gates
    a corpus, its ranking power is a committed number, not a vibe.
    Tie-aware Mann-Whitney rank-sum on the ROUNDED probability, so
    both engines rank the identical discrete score distribution; the
    corpus collapses to ≤10⁴ score groups before any window runs.
    Shares the cached trained weights with quality_classifier."""
    from twitter_to_sqlite_spark.functions import stats

    return stats.roc_auc(
        q_quality_classifier(spark, sf_dir), "y", "prob")


def _classifier_auc_sql() -> str:
    joined, sig, final = _logreg_parts()
    return f"""
WITH {joined},
scored AS (SELECT y, round({sig}, 4) AS prob FROM feat, {final}),
g AS (SELECT prob, count(*) AS n, sum(y) AS np
      FROM scored GROUP BY prob),
r AS (SELECT n, np,
             coalesce(sum(n) OVER (ORDER BY prob
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM g),
s AS (SELECT sum(np * (2 * before + n + 1)) AS r2,
             CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(n - np) AS BIGINT) AS n_neg
      FROM r)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round((r2::DOUBLE - n_pos::DOUBLE * (n_pos::DOUBLE + 1))
               / (2 * n_pos::DOUBLE * n_neg::DOUBLE), 6)
       END AS auc
FROM s
"""


SQL_CLASSIFIER_AUC = _classifier_auc_sql()


def q_calibration(spark, sf_dir):
    """Reliability-diagram buckets of the distilled classifier
    (functions/stats.py::calibration_bins): per score decile, exact
    mean predicted probability vs empirical positive rate and the
    |gap| — whether 0.8 means 80%. The companion diagnostic to
    classifier_auc (ranking power vs probability honesty); a 100 TB
    scoring table reduces to ≤10 rows in one map-side-combined agg.
    Shares the cached trained weights with quality_classifier."""
    from twitter_to_sqlite_spark.functions import stats

    return stats.calibration_bins(
        q_quality_classifier(spark, sf_dir), "y", "prob", n_bins=10)


def _calibration_sql() -> str:
    joined, sig, final = _logreg_parts()
    return f"""
WITH {joined},
scored AS (SELECT y, round({sig}, 4) AS prob FROM feat, {final})
SELECT least(floor(prob * 10), 9)::INT AS bin,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(CAST(prob AS DECIMAL(18,4)))::DOUBLE / count(*), 6)
         AS avg_score,
       round(sum(y)::DOUBLE / count(*), 6) AS pos_rate,
       round(abs(sum(CAST(prob AS DECIMAL(18,4)))::DOUBLE / count(*)
                 - sum(y)::DOUBLE / count(*)), 6) AS gap
FROM scored GROUP BY 1
"""


SQL_CALIBRATION = _calibration_sql()


def q_embedding_stats(spark, sf_dir):
    """Per-dimension embedding-column profile (functions/stats.py::
    embedding_profile): n/mean/var/min/max per vector position — the
    drift monitor a vector pipeline runs per ingest batch (a collapsed
    dimension, normalization bug, or upstream model swap shows here
    before ANN recall drops). Moments are exact integer sums of the
    2⁻²⁴-quantized float32 values (quantization is the engine-
    portability contract — see the function docstring), one map-side-
    combined agg over ≤ dim groups."""
    from twitter_to_sqlite_spark.functions import stats

    e = _t(spark, sf_dir, "embeddings").select("embedding")
    return stats.embedding_profile(e, "embedding")


SQL_EMBEDDING_STATS = """
WITH ex AS (
  SELECT unnest(generate_series(0, len(embedding) - 1)) AS pos,
         unnest(embedding) AS val
  FROM embeddings WHERE embedding IS NOT NULL
),
q AS (
  SELECT CAST(pos AS BIGINT) AS pos, val::DOUBLE AS v,
         floor(val::DOUBLE * 16777216.0)::BIGINT AS iv
  FROM ex WHERE val IS NOT NULL
)
SELECT pos, CAST(count(*) AS BIGINT) AS n,
       round((sum(iv)::DOUBLE / count(*)) / 16777216.0, 6) AS mean,
       round((sum(iv * iv)::DOUBLE / count(*)
              - (sum(iv)::DOUBLE / count(*))
                * (sum(iv)::DOUBLE / count(*)))
             / 281474976710656.0, 6) AS var,
       round(min(v), 6) AS min_val,
       round(max(v), 6) AS max_val
FROM q GROUP BY pos
"""


def q_novelty(spark, sf_dir):
    """Per-document novelty of a new shard vs the stored corpus
    (functions/dedup.py::novelty_stats): fraction of each new doc's
    distinct 3-shingles absent from the store — the data-valuation
    signal incremental crawls rank shards by; complements
    dedup_incremental (candidates catch copies, novelty prices partial
    overlap). Planted verbatim copies of stored docs pin novelty = 0
    rows. One left equi-join on the high-entropy shingle key + one
    per-doc agg — linear, never pairwise."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    stored = d.filter(F.col("doc_id") % 2 == 0)
    planted = d.filter(
        (F.col("doc_id") < 40) & (F.col("doc_id") % 2 == 0)).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"), "text")
    new = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)
    # r10: both sides' shingles derive from the shared
    # _build:doc_shingles checkpoint — shingling is per-document, so
    # the parity filters commute with it, and the planted copies are
    # VERBATIM text so their shingle sets are their sources' with the
    # id remapped. Row-identical to shingling new/stored directly.
    base_sh = _doc_shingles(spark, sf_dir)
    planted_sh = base_sh.filter(
        (F.col("id") < 40) & (F.col("id") % 2 == 0)).select(
        (F.col("id") + _PLANT_OFFSET).alias("id"), "shingle")
    new_sh = base_sh.filter(F.col("id") % 2 == 1).unionByName(planted_sh)
    stored_sh = base_sh.filter(F.col("id") % 2 == 0)
    return dedup.novelty_stats(new, stored, k=3,
                               new_shingles=new_sh,
                               stored_shingles=stored_sh)


SQL_NOVELTY = f"""
WITH stored AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
newdocs AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id, text
  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0
),
shn AS (
  SELECT DISTINCT id, unnest(
    list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' '))) AS shingle
  FROM (SELECT doc_id AS id, {{toks}} AS t FROM newdocs)
),
shs AS (
  SELECT DISTINCT unnest(
    list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' '))) AS shingle
  FROM (SELECT {{toks}} AS t FROM stored)
)
SELECT n.id AS doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN s.shingle IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       round(sum(CASE WHEN s.shingle IS NULL THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS novelty
FROM shn n LEFT JOIN shs s ON n.shingle = s.shingle
GROUP BY n.id
""".replace("{toks}", _SQL_TOKS)


def q_pmi_collocations(spark, sf_dir):
    """Top-20 collocations by PMI with a min-count floor
    (functions/text.py::pmi_collocations) — the phrase-mining /
    tokenizer-vocab step over the document corpus. Exact integer
    counts, one ln() in a fixed expression order, deterministic
    (pmi, w1, w2) tie-break at the k boundary."""
    d = _t(spark, sf_dir, "documents").select("text")
    return text.pmi_collocations(d, "text", min_count=3, top_k=20)


SQL_PMI_COLLOCATIONS = f"""
WITH toks AS (SELECT {_SQL_TOKS} AS t FROM documents),
uni AS (SELECT w, count(*) AS cw
        FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w),
nt AS (SELECT sum(cw) AS nt FROM uni),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                i -> struct_pack(w1 := t[i], w2 := t[i+1]))) AS p
  FROM toks WHERE len(t) >= 2
),
cab AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS n_pair
        FROM pairs GROUP BY p.w1, p.w2),
nb AS (SELECT sum(n_pair) AS nb FROM cab),
j AS (SELECT w1, w2, n_pair, u1.cw AS c1, u2.cw AS c2
      FROM cab JOIN uni u1 ON cab.w1 = u1.w
               JOIN uni u2 ON cab.w2 = u2.w
      WHERE n_pair >= 3)
SELECT w1, w2, CAST(n_pair AS BIGINT) AS n_pair,
       round(ln((n_pair::DOUBLE * nt * nt)
                / (nb::DOUBLE * c1 * c2)), 4) AS pmi
FROM j, nt, nb
ORDER BY pmi DESC, w1, w2 LIMIT 20
"""


# PSI bin count (fixed-width over the quality score's [0, 1] range).
_PSI_BINS = 10


def q_psi_drift(spark, sf_dir):
    """Population stability index of the quality-score distribution,
    stored corpus vs incoming shard — THE standard drift number ML
    monitoring gates on (PSI < 0.1 stable / > 0.25 investigate).
    Planted low-quality spam docs in the incoming side guarantee a
    real shift. Laplace-smoothed bin shares over a generated dense
    spine (empty bins still contribute), terms folded in bin order so
    the float sum is engine-identical; counts reduce map-side, the
    10-row spine never leaves the executors."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    base = d.filter(F.col("doc_id") % 2 == 0)
    planted = d.filter(
        (F.col("doc_id") < 40) & (F.col("doc_id") % 2 == 0)).select(
        (F.col("doc_id") + _PLANT_OFFSET).alias("doc_id"),
        F.lit(("spam " * 40).strip()).alias("text"))
    cur = d.filter(F.col("doc_id") % 2 == 1).unionByName(planted)

    def bin_counts(side, alias):
        # shared histogram primitive — the streaming drift_monitor
        # maintains exactly this frame incrementally
        from twitter_to_sqlite_spark.streaming import analytics as A

        q = text.quality_score(side).select("quality")
        return A.score_bin_counts(q, "quality", _PSI_BINS) \
            .withColumnRenamed("n", alias)

    spine = spark.range(_PSI_BINS).select(
        F.col("id").cast("int").alias("bin"))
    g = (
        spine
        .join(bin_counts(base, "__nb"), "bin", "left")
        .join(bin_counts(cur, "__nc"), "bin", "left")
        .select(
            "bin",
            F.coalesce("__nb", F.lit(0)).alias("nb"),
            F.coalesce("__nc", F.lit(0)).alias("nc"),
        )
        # totals AND the smoothed terms both hang off g: pin the
        # bounded 10-row frame or both histogram scans run twice
        .localCheckpoint(eager=False)
    )
    tot = g.agg(F.sum("nb").alias("tnb"), F.sum("nc").alias("tnc"))
    gt = g.crossJoin(F.broadcast(tot))
    pb = (F.col("nb") + 1.0) / (F.col("tnb") + _PSI_BINS)
    pc = (F.col("nc") + 1.0) / (F.col("tnc") + _PSI_BINS)
    terms = gt.select(
        "tnb", "tnc",
        F.struct(F.col("bin"),
                 ((pc - pb) * F.log(pc / pb)).alias("x")).alias("s"),
    )
    return (
        terms.agg(
            F.sort_array(F.collect_list("s")).alias("terms"),
            F.max("tnb").alias("n_base"),
            F.max("tnc").alias("n_cur"),
        )
        .select(
            "n_base", "n_cur",
            F.round(F.aggregate(
                "terms", F.lit(0.0), lambda acc, s: acc + s["x"]), 6)
            .alias("psi"),
        )
    )


def _psi_sql() -> str:
    quality = SQL_QUALITY_SCORE.replace("FROM documents", "FROM {src}")
    return f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
cur AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + {_PLANT_OFFSET} AS doc_id,
         '{("spam " * 40).strip()}' AS text
  FROM documents WHERE doc_id < 40 AND doc_id % 2 = 0
),
qb AS ({quality.replace("{src}", "base")}),
qc AS ({quality.replace("{src}", "cur")}),
cb AS (SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
         AS bin, count(*) AS nb FROM qb GROUP BY 1),
cc AS (SELECT least(floor(quality * {_PSI_BINS}), {_PSI_BINS - 1})::INT
         AS bin, count(*) AS nc FROM qc GROUP BY 1),
spine AS (SELECT unnest(generate_series(0, {_PSI_BINS - 1}))::INT AS bin),
g AS (SELECT s.bin, coalesce(nb, 0) AS nb, coalesce(nc, 0) AS nc
      FROM spine s LEFT JOIN cb ON s.bin = cb.bin
                   LEFT JOIN cc ON s.bin = cc.bin),
t AS (SELECT sum(nb) AS tnb, sum(nc) AS tnc FROM g),
terms AS (
  SELECT bin,
         ((nc + 1.0) / (tnc + {_PSI_BINS})
          - (nb + 1.0) / (tnb + {_PSI_BINS}))
         * ln(((nc + 1.0) / (tnc + {_PSI_BINS}))
              / ((nb + 1.0) / (tnb + {_PSI_BINS}))) AS x
  FROM g, t
)
SELECT CAST(t.tnb AS BIGINT) AS n_base, CAST(t.tnc AS BIGINT) AS n_cur,
       round(list_reduce(list_prepend(0.0, list(x ORDER BY bin)),
                         (acc, v) -> acc + v), 6) AS psi
FROM terms, t GROUP BY t.tnb, t.tnc
"""


SQL_PSI_DRIFT = _psi_sql()


# Key-domain sample size for the join-size estimator.
_JSE_K = 256


def q_join_size_estimate(spark, sf_dir):
    """Sketch-driven join cardinality estimate vs truth
    (functions/sketch.py::join_size_estimate) for the events⋈events
    self-join on user_id — the activity-pairing join whose output
    Σc(u)² is exactly what key_skew warns about. The estimate comes
    from the bottom-{k} hash sample of the key domain + the KMV domain
    size; the exact count comes from the per-key count aggregate
    (never the materialized join). The committed (estimate, exact,
    rel_err) row is the measure-don't-guess loop for join planning:
    broadcast vs shuffle vs salt decided from k sampled keys."""
    e = _t(spark, sf_dir, "events").select("user_id")
    est = sketch.join_size_estimate(e, e, "user_id", k=_JSE_K)
    exact = (
        e.filter(F.col("user_id").isNotNull())
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("__c"))
        .agg(F.sum(F.col("__c") * F.col("__c")).alias("exact_join_rows"))
    )
    j = est.crossJoin(F.broadcast(exact))
    return j.select(
        "n_sampled", "d_est", "est_join_rows", "exact_join_rows",
        F.round(
            F.abs(F.col("est_join_rows").cast("double")
                  - F.col("exact_join_rows").cast("double"))
            / F.col("exact_join_rows").cast("double"), 4)
        .alias("rel_err"),
    )


SQL_JOIN_SIZE_ESTIMATE = f"""
WITH dom AS (
  SELECT __k,
         ('0x' || substring(md5(__k::VARCHAR), 1, 15))::BIGINT
           / 1152921504606846976.0 AS u
  FROM (SELECT DISTINCT user_id AS __k FROM events
        WHERE user_id IS NOT NULL)
),
samp AS (SELECT __k, u FROM dom ORDER BY u LIMIT {_JSE_K}),
cnt AS (
  SELECT e.user_id AS __k, count(*) AS c
  FROM events e JOIN samp s ON e.user_id = s.__k
  GROUP BY e.user_id
),
agg AS (
  SELECT count(*) AS n_kept, max(u) AS umax,
         sum(coalesce(c, 0) * coalesce(c, 0)) AS sp
  FROM samp LEFT JOIN cnt USING (__k)
),
est AS (
  SELECT CAST(n_kept AS BIGINT) AS n_sampled,
         CASE WHEN n_kept < {_JSE_K} THEN n_kept::BIGINT
              ELSE CAST(round({float(_JSE_K - 1)!r} / umax, 0) AS BIGINT)
         END AS d_est,
         sp, n_kept
  FROM agg
),
ex AS (
  SELECT CAST(sum(c * c) AS BIGINT) AS exact_join_rows
  FROM (SELECT count(*) AS c FROM events
        WHERE user_id IS NOT NULL GROUP BY user_id)
)
SELECT n_sampled, d_est,
       CAST(round(sp::DOUBLE * d_est::DOUBLE / n_kept, 0) AS BIGINT)
         AS est_join_rows,
       exact_join_rows,
       round(abs(CAST(round(sp::DOUBLE * d_est::DOUBLE / n_kept, 0)
                      AS BIGINT)::DOUBLE - exact_join_rows::DOUBLE)
             / exact_join_rows::DOUBLE, 4) AS rel_err
FROM est, ex
"""


# Shard-rebalance scenario: 8 -> 12 shards.
_SHARD_OLD, _SHARD_NEW = 8, 12


def q_shard_rebalance(spark, sf_dir):
    """Reshard move-fraction comparison (operators/bucketing.py::
    shard_move_stats): growing events' user shards 8 → 12 under
    mod-hash vs rendezvous hashing, measured on the real key
    population. Rendezvous should move ≈ (12−8)/12 = 1/3 of keys (the
    provable minimum); mod-hash nearly all — the committed number
    that justifies consistent hashing before a 100 TB reshard."""
    from twitter_to_sqlite_spark.operators import bucketing

    e = _t(spark, sf_dir, "events").select("user_id")
    return bucketing.shard_move_stats(
        e, "user_id", _SHARD_OLD, _SHARD_NEW)


def _shard_rebalance_sql() -> str:
    def rdv(n: int) -> str:
        terms = ", ".join(
            "{h: ('0x' || substring(md5(k::VARCHAR || '|%d'), 1, 15))"
            "::BIGINT, s: %d}" % (s, s)
            for s in range(n)
        )
        return f"list_max([{terms}]).s"

    arms = []
    for name, old, new in (
        ("mod", f"hh % {_SHARD_OLD}", f"hh % {_SHARD_NEW}"),
        ("rendezvous", rdv(_SHARD_OLD), rdv(_SHARD_NEW)),
    ):
        arms.append(f"""SELECT '{name}' AS strategy,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(CASE WHEN ({old}) <> ({new}) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_moved,
       round(sum(CASE WHEN ({old}) <> ({new}) THEN 1 ELSE 0 END)::DOUBLE
             / count(*), 6) AS move_frac
FROM (SELECT k, ('0x' || substring(md5(k::VARCHAR), 1, 15))::BIGINT AS hh
      FROM (SELECT DISTINCT user_id AS k FROM events
            WHERE user_id IS NOT NULL))""")
    return "\nUNION ALL\n".join(arms)


SQL_SHARD_REBALANCE = _shard_rebalance_sql()


def q_hard_negatives(spark, sf_dir):
    """Hard-negative mining over the labeled embeddings
    (functions/similarity.py::hard_negative_topk): for each query
    vector, the exact top-3 nearest neighbors with a DIFFERENT label —
    the contrastive-training negatives a retriever fine-tune wants
    (near-misses, not random draws). Label-mismatch fused into the
    scan predicate; everything else is the audited brute-force
    scan-and-rank shape."""
    e = _t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    return similarity.hard_negative_topk(e, queries, k=3)


SQL_HARD_NEGATIVES = f"""
WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS a,
                  label AS ql
           FROM embeddings WHERE vec_id < 5 AND label IS NOT NULL),
c AS (SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS b,
             label AS cl
      FROM embeddings WHERE label IS NOT NULL),
scored AS (
  SELECT query_id, neighbor_id, {{cos}} AS cosine
  FROM c, q WHERE neighbor_id != query_id AND cl <> ql
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id ASC)
              AS rank
  FROM scored
)
SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 3
""".replace("{cos}", _SQL_COS)


# Vocabulary size for the coverage metric.
_VOCAB_N = 500


def q_vocab_coverage(spark, sf_dir):
    """Tokenizer-vocabulary coverage: what fraction of all token
    OCCURRENCES the top-{N}-by-frequency vocabulary covers, and the
    complementary OOV rate — the number that sizes a vocab before
    training (Zipf makes it large for small N; the long tail is what
    byte-fallback eats). One token-count agg, one TakeOrderedAndProject
    for the vocab, exact integer sums, two final divisions."""
    d = _t(spark, sf_dir, "documents").select("text")
    uni = (
        d.select(F.explode(text._tokens(F.col("text"))).alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    )
    top = uni.orderBy(F.col("c").desc(), "w").limit(_VOCAB_N)
    tot = uni.agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("n_total"),
    )
    cov = top.agg(
        F.count(F.lit(1)).alias("vocab_size"),
        F.sum("c").alias("covered"),
    )
    j = cov.crossJoin(F.broadcast(tot))
    rate = F.col("covered").cast("double") / F.col("n_total")
    return j.select(
        "vocab_size", "n_distinct", "n_total", "covered",
        F.round(rate, 6).alias("coverage"),
        F.round(1.0 - rate, 6).alias("oov_rate"),
    )


def q_woe_iv(spark, sf_dir):
    """Weight-of-evidence per score decile + the information-value
    terms for the distilled classifier — the scorecard diagnostic that
    complements calibration (probability honesty) and classifier_auc
    (ranking power) with per-bin separation strength; Σ iv_term is the
    headline IV a monitoring gate thresholds (<0.02 useless, >0.3
    strong). Laplace +1 smoothing keeps one-class bins finite; shares
    and the single ln() are derived from exact integer counts in a
    fixed expression order. Shares the cached trained weights; one
    ≤10-group agg over the scoring table."""
    scored = q_quality_classifier(spark, sf_dir)
    b = F.least(F.floor(F.col("prob") * 10).cast("int"), F.lit(9))
    g = scored.groupBy(b.alias("bin")).agg(
        F.sum(F.col("y").cast("long")).alias("n_pos"),
        F.sum(F.lit(1) - F.col("y").cast("long")).alias("n_neg"),
    )
    tot = g.agg(F.sum("n_pos").alias("tp"), F.sum("n_neg").alias("tn"))
    j = g.crossJoin(F.broadcast(tot))
    ps = (F.col("n_pos") + 1.0) / (F.col("tp") + 10)
    ns = (F.col("n_neg") + 1.0) / (F.col("tn") + 10)
    woe = F.log(ps / ns)
    return j.select(
        "bin", "n_pos", "n_neg",
        F.round(woe, 6).alias("woe"),
        F.round((ps - ns) * woe, 6).alias("iv_term"),
    )


def _woe_iv_sql() -> str:
    joined, sig, final = _logreg_parts()
    return f"""
WITH {joined},
scored AS (SELECT y, round({sig}, 4) AS prob FROM feat, {final}),
g AS (
  SELECT least(floor(prob * 10), 9)::INT AS bin,
         CAST(sum(y) AS BIGINT) AS n_pos,
         CAST(sum(1 - y) AS BIGINT) AS n_neg
  FROM scored GROUP BY 1
),
t AS (SELECT sum(n_pos) AS tp, sum(n_neg) AS tn FROM g)
SELECT bin, n_pos, n_neg,
       round(ln(((n_pos + 1.0) / (tp + 10))
                / ((n_neg + 1.0) / (tn + 10))), 6) AS woe,
       round(((n_pos + 1.0) / (tp + 10) - (n_neg + 1.0) / (tn + 10))
             * ln(((n_pos + 1.0) / (tp + 10))
                  / ((n_neg + 1.0) / (tn + 10))), 6) AS iv_term
FROM g, t
"""


SQL_WOE_IV = _woe_iv_sql()


def q_contingency_stats(spark, sf_dir):
    """Full association profile of the event_type × variant
    contingency table: χ² (as in chi_square), Cramér's V
    (χ²-normalized to [0,1] — comparable across table sizes) and
    mutual information in nats (the information-theoretic effect
    size) — one grid, one deterministic fold. Zero cells contribute
    (0−E)²/E to χ² and 0 to MI (the standard 0·ln0 = 0 convention);
    both statistics are summed in cell order so the float totals are
    engine-identical."""
    e = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isNotNull() & F.col("user_id").isNotNull())
    cells = e.groupBy(
        F.col("event_type").alias("t"),
        (F.col("user_id") % 2).alias("a"),
    ).agg(F.count(F.lit(1)).alias("o"))
    rows_t = cells.groupBy("t").agg(F.sum("o").alias("rt"))
    cols_a = cells.groupBy("a").agg(F.sum("o").alias("ca"))
    tot = cells.agg(F.sum("o").alias("n"))
    dims = rows_t.agg(F.count(F.lit(1)).alias("r")).crossJoin(
        F.broadcast(cols_a.agg(F.count(F.lit(1)).alias("c"))))
    grid = rows_t.crossJoin(F.broadcast(cols_a))
    j = (grid.join(cells, ["t", "a"], "left")
         .withColumn("o", F.coalesce("o", F.lit(0)))
         .crossJoin(F.broadcast(tot)))
    od = F.col("o").cast("double")
    nd = F.col("n").cast("double")
    ex = F.col("rt").cast("double") * F.col("ca") / F.col("n")
    chi = (od - ex) * (od - ex) / ex
    mi = F.when(
        F.col("o") > 0,
        (od / nd) * F.log((od * nd)
                          / (F.col("rt").cast("double") * F.col("ca"))),
    ).otherwise(F.lit(0.0))
    folded = (
        j.select(F.struct(F.col("t"), F.col("a"), chi.alias("xc"),
                          mi.alias("xm")).alias("s"),
                 "n")
        .agg(F.sort_array(F.collect_list("s")).alias("terms"),
             F.max("n").alias("__n"),
             F.count(F.lit(1)).alias("n_cells"))
    )
    chi2 = F.aggregate("terms", F.lit(0.0), lambda acc, s: acc + s["xc"])
    mi_sum = F.aggregate("terms", F.lit(0.0), lambda acc, s: acc + s["xm"])
    out = folded.crossJoin(F.broadcast(dims))
    denom = F.col("__n").cast("double") \
        * (F.least(F.col("r"), F.col("c")) - 1).cast("double")
    return out.select(
        F.col("__n").alias("n_obs"),
        F.col("n_cells").cast("long").alias("n_cells"),
        F.round(chi2, 4).alias("chi2"),
        F.round(F.sqrt(chi2 / denom), 6).alias("cramers_v"),
        F.round(mi_sum, 6).alias("mutual_info"),
    )


SQL_CONTINGENCY_STATS = """
WITH d AS (
  SELECT event_type AS t, (user_id % 2)::INT AS a
  FROM events
  WHERE event_type IS NOT NULL AND user_id IS NOT NULL
),
cells AS (SELECT t, a, count(*) AS o FROM d GROUP BY t, a),
rt AS (SELECT t, sum(o) AS rt FROM cells GROUP BY t),
ca AS (SELECT a, sum(o) AS ca FROM cells GROUP BY a),
n AS (SELECT sum(o) AS n FROM cells),
dims AS (SELECT (SELECT count(*) FROM rt) AS r,
                (SELECT count(*) FROM ca) AS c),
grid AS (
  SELECT rt.t, ca.a, rt.rt, ca.ca, coalesce(cells.o, 0) AS o
  FROM rt CROSS JOIN ca LEFT JOIN cells USING (t, a)
),
terms AS (
  SELECT t, a,
         (o - rt::DOUBLE * ca / n.n)
           * (o - rt::DOUBLE * ca / n.n)
           / (rt::DOUBLE * ca / n.n) AS xc,
         CASE WHEN o > 0
              THEN (o::DOUBLE / n.n)
                   * ln((o::DOUBLE * n.n) / (rt::DOUBLE * ca))
              ELSE 0.0 END AS xm,
         n.n AS n
  FROM grid, n
),
folded AS (
  SELECT CAST(max(n) AS BIGINT) AS n_obs,
         CAST(count(*) AS BIGINT) AS n_cells,
         list_reduce(list_prepend(0.0,
           list(xc ORDER BY t, a)), (acc, v) -> acc + v) AS chi2,
         list_reduce(list_prepend(0.0,
           list(xm ORDER BY t, a)), (acc, v) -> acc + v) AS mi
  FROM terms
)
SELECT n_obs, n_cells, round(chi2, 4) AS chi2,
       round(sqrt(chi2 / (n_obs::DOUBLE * (least(r, c) - 1))), 6)
         AS cramers_v,
       round(mi, 6) AS mutual_info
FROM folded, dims
"""


# BPE merge-round count (fixed, replayed by the oracle like the
# classifier's 16 unrolled training iterations).
_BPE_MERGES = 8


# One training run per (sf_dir, merges) per process — the merge table
# is a shipped artifact like the classifier weights (_LR_CACHE): both
# the train query (which re-emits it as a DataFrame) and the segment
# query (which applies it) share ONE training.


def _bpe_merges(spark, sf_dir) -> list[tuple]:
    from twitter_to_sqlite_spark.functions import bpe

    key = (sf_dir, _BPE_MERGES)
    if key not in _BPE_CACHE:
        d = _t(spark, sf_dir, "documents").select("text")
        _BPE_CACHE[key] = [
            (r["rank"], r["left"], r["right"], r["pair_count"])
            for r in bpe.bpe_train(d, "text", merges=_BPE_MERGES).collect()
        ]
    return _BPE_CACHE[key]


def q_bpe_train(spark, sf_dir):
    """Distributed BPE tokenizer training (functions/bpe.py,
    Sennrich et al. 2016): {n} merge rules learned on the document
    corpus — one corpus scan to the word-frequency dictionary, then
    per round one dictionary-sized pair aggregate + a 1-row argmax +
    a JVM merge fold. The oracle replays the identical training as
    {n} unrolled materialized rounds (the quality_classifier device),
    so the learned merge table itself is cross-engine verified."""
    return spark.createDataFrame(
        _bpe_merges(spark, sf_dir),
        "rank int, left string, right string, pair_count long")


def q_bpe_segment(spark, sf_dir):
    """Apply the trained merge table to the corpus (functions/bpe.py
    bpe_segment) — the encode half of the tokenizer loop a pipeline
    actually runs at scale: per document, word count, BPE token count
    and symbols-per-word compression. The merge rules arrive as
    literals, so every merge is a narrow JVM fold at corpus-scan
    parallelism — no shuffle until the final per-doc aggregate. The
    oracle replays training with the word string carried through the
    folds, segments the DICTIONARY once, and joins per-doc word
    multiplicities to dictionary symbol counts — same factorization
    that makes the Spark side dictionary-cheap."""
    from twitter_to_sqlite_spark.functions import bpe

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return bpe.bpe_segment(d, _bpe_merges(spark, sf_dir),
                           "text", "doc_id")


def _bpe_sql(merges: int = _BPE_MERGES, mode: str = "train") -> str:
    """DuckDB twin of bpe.bpe_train / bpe_segment: same dictionary,
    same pair weighting, same (cnt DESC, a, b) argmax, same
    left-to-right non-overlapping merge — the fold carries (out, pend)
    state in one VARCHAR because DuckDB 1.0's list_reduce drops
    struct-of-list accumulator state (empirically verified). The word
    string rides through every fold so ``mode='segment'`` can read the
    fully-merged dictionary (words{merges}) and join per-doc word
    multiplicities to its symbol counts."""
    rs = "chr(30)"
    ctes = [f"""words0 AS MATERIALIZED (
  SELECT w, freq, list_append(string_split(w, ''), '</w>') AS syms
  FROM (SELECT w, count(*) AS freq
        FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents)
        GROUP BY w)
)"""]
    last = merges if mode == "segment" else merges - 1
    for t in range(1, merges + 1):
        prev = f"words{t - 1}"
        ctes.append(f"""p{t} AS MATERIALIZED (
  SELECT p.a AS a, p.b AS b, CAST(sum(freq) AS BIGINT) AS cnt FROM (
    SELECT freq, unnest(list_transform(generate_series(1, len(syms) - 1),
           i -> {{'a': syms[i], 'b': syms[i + 1]}})) AS p
    FROM {prev} WHERE len(syms) >= 2)
  GROUP BY p.a, p.b
)""")
        ctes.append(
            f"m{t} AS MATERIALIZED (SELECT a, b, cnt FROM p{t} "
            f"ORDER BY cnt DESC, a, b LIMIT 1)")
        if t <= last:
            ctes.append(f"""words{t} AS MATERIALIZED (
  SELECT w, freq, string_split(ltrim(
    split_part(folded, {rs}, 1) ||
    CASE WHEN split_part(folded, {rs}, 2) = '' THEN ''
         ELSE ' ' || split_part(folded, {rs}, 2) END), ' ') AS syms
  FROM (
    SELECT w, freq, list_reduce(list_prepend({rs}, syms),
      (acc, x) -> CASE
        WHEN split_part(acc, {rs}, 2) = m{t}.a AND x = m{t}.b
          THEN split_part(acc, {rs}, 1) || ' ' || m{t}.a || m{t}.b || {rs}
        WHEN split_part(acc, {rs}, 2) = ''
          THEN split_part(acc, {rs}, 1) || {rs} || x
        ELSE split_part(acc, {rs}, 1) || ' ' ||
             split_part(acc, {rs}, 2) || {rs} || x
      END) AS folded
    FROM {prev}, m{t})
)""")
    if mode == "segment":
        finals = f"""segd AS (
  SELECT w, len(syms) AS nsym FROM words{merges}
),
docw AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS w FROM documents
),
percount AS (
  SELECT doc_id, w, count(*) AS c FROM docw GROUP BY doc_id, w
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_words,
       CAST(sum(c * nsym) AS BIGINT) AS n_bpe_tokens,
       round(CAST(sum(c * nsym) AS DOUBLE) / sum(c), 4) AS syms_per_word
FROM percount JOIN segd USING (w)
GROUP BY doc_id"""
        return "WITH " + ",\n".join(ctes) + ",\n" + finals
    finals = "\nUNION ALL\n".join(
        f'SELECT {t} AS rank, a AS "left", b AS "right", cnt AS pair_count '
        f"FROM m{t}"
        for t in range(1, merges + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + finals


SQL_BPE_TRAIN = _bpe_sql()
SQL_BPE_SEGMENT = _bpe_sql(mode="segment")


SQL_VOCAB_COVERAGE = f"""
WITH uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest({_SQL_TOKS}) AS w FROM documents)
  GROUP BY w
),
top AS (SELECT * FROM uni ORDER BY c DESC, w LIMIT {_VOCAB_N}),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_distinct,
               CAST(sum(c) AS BIGINT) AS n_total FROM uni),
cov AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(sum(c) AS BIGINT) AS covered FROM top)
SELECT vocab_size, n_distinct, n_total, covered,
       round(covered::DOUBLE / n_total, 6) AS coverage,
       round(1.0 - covered::DOUBLE / n_total, 6) AS oov_rate
FROM cov, tot
"""


def q_funnel_latency(spark, sf_dir):
    """Conversion-latency distribution for the view → click → purchase
    funnel: per converting user, the time from each step to the next
    (same strict-progression automaton as `funnel`, extended to record
    step timestamps), summarized per transition as (n_users, min/max/
    avg seconds). The latencies are exact integer micros; the average
    is one division of exact integers rounded to 4 — engine-stable."""
    e = _t(spark, sf_dir, "events")
    steps = ["view", "click", "purchase"]
    epoch_us = (
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(`__ts` as timestamp_ntz))"
    )
    ev = (
        e.filter(F.col("event_type").isin(steps)
                 & F.col("user_id").isNotNull())
        .select(F.col("user_id").alias("__u"),
                F.col("ts").alias("__ts"),
                F.col("event_type").alias("__ty"))
        .withColumn("__us", F.expr(epoch_us))
    )
    per_user = ev.groupBy("__u").agg(
        F.sort_array(F.collect_list(
            F.struct(F.col("__us").alias("t"), F.col("__ty").alias("y"))
        )).alias("__evs")
    )
    # THE shared automaton (relational.funnel_fold) with the latency
    # accumulator switched on — one fold definition for every batch
    # funnel form.
    zero, _step = R.funnel_fold(steps, "long", with_latencies=True)

    fin = per_user.select(
        F.aggregate("__evs", zero, _step).alias("__a"))
    lats = fin.select(F.col("__a")["lat1"].alias("lat1"),
                      F.col("__a")["lat2"].alias("lat2"))
    out = None
    for i, (frm, to) in enumerate([("view", "click"),
                                   ("click", "purchase")]):
        c = f"lat{i + 1}"
        row = lats.filter(F.col(c).isNotNull()).agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.min(c) / F.lit(1_000_000.0), 4).alias("min_s"),
            F.round(F.max(c) / F.lit(1_000_000.0), 4).alias("max_s"),
            F.round(F.sum(c) / F.count(F.lit(1)) / F.lit(1_000_000.0), 4)
            .alias("avg_s"),
        ).select(
            F.lit(frm).alias("from_step"), F.lit(to).alias("to_step"),
            "n_users", "min_s", "max_s", "avg_s",
        )
        out = row if out is None else out.unionByName(row)
    return out


SQL_FUNNEL_LATENCY = """
WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND epoch_us(e.ts) > s1.t
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND epoch_us(e.ts) > s2.t
       WHERE e.event_type = 'purchase' GROUP BY e.user_id),
l1 AS (SELECT s2.t - s1.t AS lat FROM s1 JOIN s2 USING (user_id)),
l2 AS (SELECT s3.t - s2.t AS lat FROM s2 JOIN s3 USING (user_id))
SELECT 'view' AS from_step, 'click' AS to_step,
       CAST(count(*) AS BIGINT) AS n_users,
       round(min(lat) / 1000000.0, 4) AS min_s,
       round(max(lat) / 1000000.0, 4) AS max_s,
       round(sum(lat) / count(*) / 1000000.0, 4) AS avg_s
FROM l1
UNION ALL
SELECT 'click', 'purchase', CAST(count(*) AS BIGINT),
       round(min(lat) / 1000000.0, 4),
       round(max(lat) / 1000000.0, 4),
       round(sum(lat) / count(*) / 1000000.0, 4)
FROM l2
"""


def q_grouped_quantiles(spark, sf_dir):
    """Per-language document-length quantiles from per-group
    deterministic bottom-k hash samples
    (functions/sketch.py::grouped_sample_quantiles, k=256): the
    profile-per-language shape where a group-partitioned window takes
    each group's bottom-k by the portable hash — parallel across
    groups, never a global sort, per-group cost independent of group
    size."""
    d = _t(spark, sf_dir, "documents")
    return sketch.grouped_sample_quantiles(
        d, "lang", "n_chars", "doc_id", qs=(0.25, 0.5, 0.9), k=256)


SQL_GROUPED_QUANTILES = """
WITH s AS (
  SELECT lang, n_chars AS val,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substring(md5(doc_id::VARCHAR), 1, 15))
                      ::BIGINT, n_chars) AS rn
  FROM documents
  WHERE n_chars IS NOT NULL AND doc_id IS NOT NULL
        AND lang IS NOT NULL
),
samp AS (SELECT lang, val FROM s WHERE rn <= 256),
o AS (
  SELECT lang, val,
         row_number() OVER (PARTITION BY lang ORDER BY val) AS vr,
         count(*) OVER (PARTITION BY lang) AS n
  FROM samp
)
SELECT lang, CAST(q AS DOUBLE) AS q, CAST(n AS BIGINT) AS n_sample,
       val AS est
FROM o, (VALUES (0.25), (0.5), (0.9)) qs(q)
WHERE vr = CAST(floor(CAST(q AS DOUBLE) * (n - 1)) AS BIGINT) + 1
"""


def q_retention_cohorts(spark, sf_dir):
    """Cohort retention over the event stream: users grouped by
    first-activity day (the cohort), then for each (cohort_day,
    active_day) the distinct users still active and the retention
    fraction of the cohort — THE product-analytics query. Day ids are
    integer-div bins of epoch micros (cross-engine exact). Plan: one
    partial-agg shuffle for first-seen, one distinct on (user, day),
    a key-partitioned join, one pair agg, and a broadcast-size cohort
    join back — no window over the whole stream."""
    e = _t(spark, sf_dir, "events")
    day_us = 86_400_000_000
    ud = (
        e.select(F.col("user_id").alias("u"),
                 F.expr(f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ "
                        f"'1970-01-01 00:00:00', cast(ts as timestamp_ntz)) "
                        f"div {day_us}").alias("d"))
        .filter(F.col("u").isNotNull())
        .distinct()
    )
    first = ud.groupBy("u").agg(F.min("d").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users"))
    pairs = (
        ud.join(first, "u")
        .groupBy("cohort_day", F.col("d").alias("active_day"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    return pairs.join(F.broadcast(sizes), "cohort_day").select(
        "cohort_day",
        (F.col("active_day") - F.col("cohort_day")).alias("day_offset"),
        "active_users", "cohort_users",
        F.round(F.col("active_users") / F.col("cohort_users"), 6)
        .alias("retention"),
    )


SQL_RETENTION_COHORTS = """
WITH ud AS (
  SELECT DISTINCT user_id AS u,
         epoch_us(ts) // 86400000000 AS d
  FROM events WHERE user_id IS NOT NULL
),
first AS (SELECT u, min(d) AS cohort_day FROM ud GROUP BY u),
sizes AS (SELECT cohort_day, CAST(count(*) AS BIGINT) AS cohort_users
          FROM first GROUP BY cohort_day),
pairs AS (
  SELECT f.cohort_day, ud.d AS active_day,
         CAST(count(*) AS BIGINT) AS active_users
  FROM ud JOIN first f ON ud.u = f.u
  GROUP BY 1, 2
)
SELECT p.cohort_day,
       CAST(p.active_day - p.cohort_day AS BIGINT) AS day_offset,
       p.active_users, s.cohort_users,
       round(p.active_users / s.cohort_users, 6) AS retention
FROM pairs p JOIN sizes s ON p.cohort_day = s.cohort_day
"""


def q_transition_matrix(spark, sf_dir):
    """Markov transition matrix of the event stream: counts and
    probabilities of event_type → next event_type within each user's
    time-ordered stream (lag window per user, ties broken by
    event_id) — the behavioral-model fit every event pipeline runs.
    One shuffle on user_id for the lag, one partial-agg shuffle on the
    (from, to) pair; probabilities are exact-integer ratios rounded
    to 6."""
    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id",
                                           "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(F.col("n") / F.sum("n").over(tot), 6).alias("p"),
    )


SQL_TRANSITION_MATRIX = """
WITH seq AS (
  SELECT event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
),
pairs AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(n / sum(n) OVER (PARTITION BY from_type), 6) AS p
FROM pairs
"""


def q_resample_fill(spark, sf_dir):
    """Gap-filled 6-hour resample of events per user
    (operators/relational.py::resample_fill): zero-filled counts/sums
    plus a LOCF level over a distributively generated dense spine —
    the missing-bins-are-data densification a time-series feature
    pipeline needs."""
    e = _t(spark, sf_dir, "events")
    return R.resample_fill(e, "user_id", "ts", "value",
                           step_seconds=21600.0)


SQL_RESAMPLE_FILL = """
WITH b AS (
  SELECT user_id AS k, epoch_us(ts) // 21600000000 AS bin, value
  FROM events WHERE user_id IS NOT NULL
),
agg AS (
  SELECT k, bin, CAST(count(*) AS BIGINT) AS n,
         round(sum(value), 4) AS s
  FROM b GROUP BY k, bin
),
rng AS (SELECT min(bin) AS lo, max(bin) AS hi FROM agg),
spine AS (
  SELECT k, unnest(generate_series(lo, hi)) AS bin
  FROM (SELECT DISTINCT k FROM agg), rng
),
j AS (
  SELECT spine.k, spine.bin, agg.n, agg.s
  FROM spine LEFT JOIN agg ON spine.k = agg.k AND spine.bin = agg.bin
)
SELECT k AS user_id,
       CAST(bin * 21600000000 AS BIGINT) AS bucket_us,
       coalesce(n, 0) AS n_events,
       coalesce(s, 0.0) AS v_sum,
       last_value(s IGNORE NULLS)
         OVER (PARTITION BY k ORDER BY bin
               ROWS UNBOUNDED PRECEDING) AS level
FROM j
"""


def q_rolling_window(spark, sf_dir):
    """Trailing 1-hour per-user event features (range-based window on
    epoch micros, NOT row-based): for every event, the count and sum
    of that user's events in the preceding hour inclusive — the
    leakage-free trailing feature an online model trains on. One
    shuffle on user_id; the range frame is computed in a single pass
    over each user's time-sorted rows."""
    e = _t(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        "cast(ts as timestamp_ntz))"
    )
    w = (
        Window.partitionBy("user_id").orderBy(F.col("ts_us"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select("event_id", "user_id", us.alias("ts_us"), "value")
        .select(
            "event_id", "user_id", "ts_us",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 4).alias("sum_1h"),
        )
    )


SQL_ROLLING_WINDOW = """
SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_1h,
       round(sum(value) OVER w, 4) AS sum_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q_sketch_quantiles(spark, sf_dir):
    """Quantile member of the portable-sketch family
    (functions/sketch.py::sample_quantiles): order statistics of a
    deterministic bottom-k hash sample of events.value (keyed by
    event_id, k=1024) — approximate quantiles that are bit-identical
    across engines, unlike t-digest/GK/KLL whose merge order is
    engine-specific. One TakeOrderedAndProject + an O(k log k) fold
    on a single row."""
    e = _t(spark, sf_dir, "events")
    return sketch.sample_quantiles(e, "value", "event_id", k=1024)


SQL_SKETCH_QUANTILES = """
WITH s AS (
  SELECT value AS val,
         ('0x' || substring(md5(event_id::VARCHAR), 1, 15))::BIGINT AS h
  FROM events WHERE value IS NOT NULL AND event_id IS NOT NULL
  ORDER BY h, val LIMIT 1024
),
o AS (
  SELECT val, row_number() OVER (ORDER BY val) AS rn,
         count(*) OVER () AS n
  FROM s
)
SELECT CAST(q AS DOUBLE) AS q, CAST(n AS BIGINT) AS n_sample,
       val AS est
FROM o, (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) qs(q)
WHERE rn = CAST(floor(CAST(q AS DOUBLE) * (n - 1)) AS BIGINT) + 1
"""


def q_interval_join(spark, sf_dir):
    """Interval join via time-bucketed equi-join
    (operators/relational.py::interval_join): purchases landing inside
    the 30-minute window after each signup — the attribution-window
    query every event pipeline runs. No equi-key exists between the
    sides, which is exactly when Spark would fall back to an
    O(|L|·|R|) BroadcastNestedLoopJoin; the bucket trick turns it into
    one shuffled equi-join (plan-tested). Sum rounded to 4 (order-
    noise absorption, repo convention)."""
    e = _t(spark, sf_dir, "events")
    sign = e.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"), F.col("value").alias("p_value")
    )
    j = R.interval_join(pur, sign, "p_ts", "w_start", "w_end",
                        bucket_seconds=1800.0)
    return j.groupBy("signup_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("p_value"), 4).alias("sum_value"),
    )


SQL_INTERVAL_JOIN = """
SELECT s.event_id AS signup_id,
       CAST(count(*) AS BIGINT) AS n_purchases,
       round(sum(p.value), 4) AS sum_value
FROM (SELECT event_id, ts AS w_start,
             ts + INTERVAL 30 MINUTE AS w_end
      FROM events WHERE event_type = 'signup') s
JOIN (SELECT ts AS p_ts, value FROM events
      WHERE event_type = 'purchase') p
  ON p.p_ts >= s.w_start AND p.p_ts < s.w_end
GROUP BY s.event_id
"""


def q_funnel(spark, sf_dir):
    """Ordered funnel view → click → purchase over the events stream
    (operators/relational.py::funnel): users reaching each step with
    strictly-increasing timestamps — the single-pass JVM automaton
    (sorted per-user fold) whose answer equals the sequential
    conditional-min CTE chain the oracle runs."""
    e = _t(spark, sf_dir, "events")
    return R.funnel(e, "user_id", "ts", "event_type",
                    ["view", "click", "purchase"])


SQL_FUNNEL = """
WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS users
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM s3)
"""


def q_funnel_windowed(spark, sf_dir):
    """WINDOWED ordered funnel (operators/relational.py::funnel with
    within_seconds): each step must land within 24 h of the previous
    one — the real conversion-funnel constraint (a purchase a month
    after the click is not attribution). Same single-pass automaton
    with one extra gap conjunct in the shared fold
    (relational.funnel_fold), so the answer still equals the
    conditional-min CTE chain with the matching window conjunct."""
    e = _t(spark, sf_dir, "events")
    return R.funnel(e, "user_id", "ts", "event_type",
                    ["view", "click", "purchase"],
                    within_seconds=86400.0)


_FUNNEL_WIN_US = 86400 * 1_000_000

SQL_FUNNEL_WINDOWED = f"""
WITH s1 AS (SELECT user_id, min(epoch_us(ts)) AS t FROM events
            WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
       JOIN s1 ON e.user_id = s1.user_id AND epoch_us(e.ts) > s1.t
              AND epoch_us(e.ts) - s1.t <= {_FUNNEL_WIN_US}
       WHERE e.event_type = 'click' GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t FROM events e
       JOIN s2 ON e.user_id = s2.user_id AND epoch_us(e.ts) > s2.t
              AND epoch_us(e.ts) - s2.t <= {_FUNNEL_WIN_US}
       WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
       (SELECT CAST(count(*) AS BIGINT) FROM s1) AS users
UNION ALL
SELECT 2, 'click', (SELECT count(*) FROM s2)
UNION ALL
SELECT 3, 'purchase', (SELECT count(*) FROM s3)
"""


_ER_MAX_BLOCK = 4000


def q_entity_match(spark, sf_dir):
    """Entity resolution on part names (functions/entity.py):
    dictionary reduction (distinct names + record counts — the square
    of the repeat ratio off every quadratic term), two-pass blocking
    (first token, last token), hot-block cap, length pre-filter,
    Levenshtein ≤ 3 — fuzzy identity matching when there is no shared
    key, the generalization of the reference's exact-pk upsert
    identity (twitter_to_sqlite/utils.py save_tweets)."""
    p = _t(spark, sf_dir, "part").select("p_name")
    blocks = [
        F.regexp_extract("name", r"^(\S+)", 1),
        F.regexp_extract("name", r"(\S+)$", 1),
    ]
    return entity.match_names(p, "p_name", blocks,
                              max_distance=3, max_block=_ER_MAX_BLOCK)


SQL_ENTITY_MATCH = f"""
WITH d AS (
  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_records
  FROM part WHERE p_name IS NOT NULL GROUP BY p_name
),
b AS (
  SELECT '0|' || regexp_extract(name, '^(\\S+)', 1) AS blk,
         name, n_records FROM d
  UNION ALL
  SELECT '1|' || regexp_extract(name, '(\\S+)$', 1),
         name, n_records FROM d
),
ok AS (SELECT blk FROM b GROUP BY blk
       HAVING count(*) <= {_ER_MAX_BLOCK}),
bb AS (SELECT b.* FROM b JOIN ok USING (blk)),
cand AS (
  SELECT DISTINCT l.name AS name1, l.n_records AS n1,
                  r.name AS name2, r.n_records AS n2
  FROM bb l JOIN bb r
    ON l.blk = r.blk AND l.name < r.name
  WHERE abs(length(l.name) - length(r.name)) <= 3
)
SELECT name1, n1, name2, n2,
       CAST(levenshtein(name1, name2) AS BIGINT) AS dist
FROM cand
WHERE levenshtein(name1, name2) <= 3
"""


def q_entity_clusters(spark, sf_dir):
    """Entity resolution end-to-end (functions/entity.py::
    cluster_entities): the matched name pairs of q_entity_match fed
    through min-label connected components, every part name labeled
    with its cluster's canonical name as entity_id (singletons are
    their own entity) — the (record → entity_id) canonicalization
    real ER delivers, not just pairs. The oracle replays the closure
    with a recursive walk over the symmetric match edges (the
    dedup_components device)."""
    p = _t(spark, sf_dir, "part").select("p_name")
    blocks = [
        F.regexp_extract("name", r"^(\S+)", 1),
        F.regexp_extract("name", r"(\S+)$", 1),
    ]
    return entity.cluster_entities(p, "p_name", blocks,
                                   max_distance=3,
                                   max_block=_ER_MAX_BLOCK)


SQL_ENTITY_CLUSTERS = f"""
WITH RECURSIVE d AS (
  SELECT p_name AS name, CAST(count(*) AS BIGINT) AS n_records
  FROM part WHERE p_name IS NOT NULL GROUP BY p_name
),
b AS (
  SELECT '0|' || regexp_extract(name, '^(\\S+)', 1) AS blk,
         name FROM d
  UNION ALL
  SELECT '1|' || regexp_extract(name, '(\\S+)$', 1),
         name FROM d
),
ok AS (SELECT blk FROM b GROUP BY blk
       HAVING count(*) <= {_ER_MAX_BLOCK}),
bb AS (SELECT b.* FROM b JOIN ok USING (blk)),
cand AS (
  SELECT DISTINCT l.name AS name1, r.name AS name2
  FROM bb l JOIN bb r
    ON l.blk = r.blk AND l.name < r.name
  WHERE abs(length(l.name) - length(r.name)) <= 3
),
matched AS (
  SELECT name1, name2 FROM cand WHERE levenshtein(name1, name2) <= 3
),
edges AS (
  SELECT name1 AS src, name2 AS dst FROM matched
  UNION
  SELECT name2, name1 FROM matched
),
nodes AS (SELECT DISTINCT src AS id FROM edges),
walk(id, component) AS (
  SELECT id, id FROM nodes
  UNION
  SELECT e.dst, w.component FROM walk w JOIN edges e ON e.src = w.id
),
comp AS (SELECT id AS name, min(component) AS component
         FROM walk GROUP BY id)
SELECT d.name, coalesce(comp.component, d.name) AS entity_id,
       d.n_records
FROM d LEFT JOIN comp USING (name)
"""


def q_graph_triangles(spark, sf_dir):
    """Triangle count + clustering coefficient
    (functions/graph.py::triangle_count) of the user co-occurrence
    graph: users PURCHASING in ≥ 2 common hours are connected — the
    interaction-graph construction, then the degree-ordered exact
    count whose wedge work is O(|E|^{3/2}) regardless of degree skew.
    Co-occurrence on the RARE event keeps graph density scale-stable:
    all-event hourly co-occurrence saturates toward the complete graph
    as event density grows (measured: 1.1e9 wedges at sf0.1 vs 1.4e6
    for purchase-hour), and exact triangle counting on a near-complete
    graph is Θ(n³) no matter the algorithm — signal choice, not
    algorithm choice, is what bounds this at 100 TB."""
    e = _t(spark, sf_dir, "events")
    occ = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).cast("string").alias("bkt"),
    ).distinct()
    o1 = occ.select("bkt", F.col("user_id").alias("u1"))
    o2 = occ.select("bkt", F.col("user_id").alias("u2"))
    edges = (
        o1.join(o2, "bkt")
        .filter(F.col("u1") < F.col("u2"))
        .groupBy("u1", "u2")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= 2)
        .select(F.col("u1").alias("src"), F.col("u2").alias("dst"))
    )
    return graph.triangle_count(edges)


SQL_GRAPH_TRIANGLES = """
WITH occ AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('hour', ts) AS VARCHAR) AS bkt
  FROM events WHERE event_type = 'purchase'
),
ed AS (
  SELECT a.user_id AS a, b.user_id AS b
  FROM occ a JOIN occ b ON a.bkt = b.bkt AND a.user_id < b.user_id
  GROUP BY 1, 2 HAVING count(*) >= 2
),
deg AS (
  SELECT n, CAST(count(*) AS BIGINT) AS d
  FROM (SELECT a AS n FROM ed UNION ALL SELECT b FROM ed)
  GROUP BY n
),
e1 AS (
  SELECT ed.a, ed.b, da.d AS da, db.d AS db
  FROM ed JOIN deg da ON ed.a = da.n JOIN deg db ON ed.b = db.n
),
o AS (
  SELECT CASE WHEN (da, a) < (db, b) THEN a ELSE b END AS u,
         CASE WHEN (da, a) < (db, b) THEN b ELSE a END AS v,
         CASE WHEN (da, a) < (db, b) THEN db ELSE da END AS dv
  FROM e1
),
w AS (
  SELECT o1.u, o1.v AS v1, o2.v AS v2
  FROM o o1 JOIN o o2
    ON o1.u = o2.u AND (o1.dv, o1.v) < (o2.dv, o2.v)
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM w
  WHERE EXISTS (SELECT 1 FROM o WHERE o.u = w.v1 AND o.v = w.v2)
),
nodes AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(coalesce(sum((d * (d - 1)) // 2), 0) AS BIGINT)
           AS n_wedges
  FROM deg
),
en AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM ed)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       round(CASE WHEN n_wedges > 0
                  THEN 3.0 * n_triangles / n_wedges
                  ELSE 0.0 END, 6) AS clustering
FROM nodes, en, tri
"""




__all__ = list(_prev.__all__) + [
    # post-split additions (keep every top-level name exported
    # so the chunk chain stays complete):
    "_substring_sql",
    "_D_ALL_DUPS",
    "_D_KEEP_FIRST",
    "q_token_count",
    "SQL_TOKEN_COUNT",
    "q_quality_score",
    "SQL_QUALITY_SCORE",
    "q_lang_id",
    "SQL_LANG_ID",
    "q_fingerprint",
    "SQL_FINGERPRINT",
    "q_multimodal_features",
    "SQL_MULTIMODAL_FEATURES",
    "_PII_OFFSET",
    "_PII_SUFFIX",
    "_docs_with_planted_pii",
    "_SQL_DOCS_PII",
    "q_pii_scrub",
    "_pii_ctes",
    "_pii_sql",
    "SQL_PII_SCRUB",
    "_SQL_BIGRAMS",
    "_CHUNK_SIZE",
    "_CHUNK_STRIDE",
    "q_chunk_documents",
    "SQL_CHUNK_DOCUMENTS",
    "q_repetition_stats",
    "SQL_REPETITION_STATS",
    "q_lm_bigram_score",
    "_lm_scores_build",
    "_lm_scores",
    "SQL_LM_BIGRAM_SCORE",
    "_SAMPLE_RATES",
    "_SAMPLE_DEFAULT",
    "q_stratified_sample",
    "_stratified_sql",
    "SQL_STRATIFIED_SAMPLE",
    "_COPY_OFFSET",
    "q_pipeline_clean",
    "_pipeline_sql",
    "SQL_PIPELINE_CLEAN",
    "q_corpus_stats",
    "SQL_CORPUS_STATS",
    "q_multimodal_frames",
    "SQL_MULTIMODAL_FRAMES",
    "q_dedup_incremental",
    "_minhash_store",
    "q_dedup_incremental_indexed",
    "_mh_side_ctes",
    "SQL_DEDUP_INCREMENTAL",
    "_DECON_K",
    "q_decontaminate",
    "_decon_shingles",
    "SQL_DECONTAMINATE",
    "_TOKEN_BUDGET",
    "q_token_budget_select",
    "q_token_budget_select_dist",
    "SQL_TOKEN_BUDGET_SELECT",
    "_PACK_BUDGET",
    "q_pack_sequences",
    "SQL_PACK_SEQUENCES",
    "_SPAN_WINDOW",
    "_dup_positions_build",
    "_dup_positions",
    "_dup_spans_build",
    "_dup_spans",
    "q_substring_dedup",
    "SQL_SUBSTRING_DEDUP",
    "q_substring_clean",
    "SQL_SUBSTRING_CLEAN",
    "q_substring_clean_keep_first",
    "SQL_SUBSTRING_CLEAN_KEEP_FIRST",
    "_MIX_WEIGHTS",
    "q_mix_corpora",
    "q_mix_corpora_dist",
    "_mix_sql",
    "SQL_MIX_CORPORA",
    "q_gopher_filter",
    "GOPHER_M_CTE",
    "SQL_GOPHER_FILTER",
    "_VOCAB_TOPK",
    "q_vocab_stats",
    "SQL_VOCAB_STATS",
    "q_dataset_split",
    "_split_sql",
    "SQL_DATASET_SPLIT",
    "_GROUP_TOPK",
    "q_topk_per_group",
    "SQL_TOPK_PER_GROUP",
    "q_weighted_sample",
    "q_tfidf_terms",
    "SQL_TFIDF_TERMS",
    "q_perplexity_buckets",
    "SQL_PERPLEXITY_BUCKETS",
    "q_perplexity_buckets_dist",
    "_MIX_ALPHA",
    "q_mix_temperature",
    "SQL_MIX_TEMPERATURE",
    "q_importance_sample",
    "SQL_IMPORTANCE_SAMPLE",
    "q_value_histogram",
    "SQL_VALUE_HISTOGRAM",
    "_MANIFEST_SHARDS",
    "q_shard_manifest",
    "SQL_SHARD_MANIFEST",
    "q_cube_revenue",
    "SQL_CUBE_REVENUE",
    "q_running_total",
    "SQL_RUNNING_TOTAL",
    "_LR_ITERS",
    "_LR_LR",
    "_quality_lr",
    "q_quality_classifier",
    "_logreg_parts",
    "_logreg_sql",
    "SQL_QUALITY_CLASSIFIER",
    "q_classifier_auc",
    "_classifier_auc_sql",
    "SQL_CLASSIFIER_AUC",
    "q_calibration",
    "_calibration_sql",
    "SQL_CALIBRATION",
    "q_embedding_stats",
    "SQL_EMBEDDING_STATS",
    "q_novelty",
    "SQL_NOVELTY",
    "q_pmi_collocations",
    "SQL_PMI_COLLOCATIONS",
    "_PSI_BINS",
    "q_psi_drift",
    "_psi_sql",
    "SQL_PSI_DRIFT",
    "_JSE_K",
    "q_join_size_estimate",
    "SQL_JOIN_SIZE_ESTIMATE",
    "q_shard_rebalance",
    "_shard_rebalance_sql",
    "SQL_SHARD_REBALANCE",
    "q_hard_negatives",
    "SQL_HARD_NEGATIVES",
    "_VOCAB_N",
    "q_vocab_coverage",
    "q_woe_iv",
    "_woe_iv_sql",
    "SQL_WOE_IV",
    "q_contingency_stats",
    "SQL_CONTINGENCY_STATS",
    "_BPE_MERGES",
    "_bpe_merges",
    "q_bpe_train",
    "q_bpe_segment",
    "_bpe_sql",
    "SQL_BPE_TRAIN",
    "SQL_BPE_SEGMENT",
    "SQL_VOCAB_COVERAGE",
    "q_funnel_latency",
    "SQL_FUNNEL_LATENCY",
    "q_grouped_quantiles",
    "SQL_GROUPED_QUANTILES",
    "q_retention_cohorts",
    "SQL_RETENTION_COHORTS",
    "q_transition_matrix",
    "SQL_TRANSITION_MATRIX",
    "q_resample_fill",
    "SQL_RESAMPLE_FILL",
    "q_rolling_window",
    "SQL_ROLLING_WINDOW",
    "q_sketch_quantiles",
    "SQL_SKETCH_QUANTILES",
    "q_interval_join",
    "SQL_INTERVAL_JOIN",
    "q_funnel",
    "SQL_FUNNEL",
    "q_funnel_windowed",
    "_FUNNEL_WIN_US",
    "SQL_FUNNEL_WINDOWED",
    "_ER_MAX_BLOCK",
    "q_entity_match",
    "SQL_ENTITY_MATCH",
    "q_entity_clusters",
    "SQL_ENTITY_CLUSTERS",
    "q_graph_triangles",
    "SQL_GRAPH_TRIANGLES",
]
