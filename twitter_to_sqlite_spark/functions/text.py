"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (whole-stage codegen, no Python in the hot
path) so they scan 100 TB of documents at parquet-read speed. Each has
an oracle_sql twin in __spark_entry__.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny high-frequency English stopword list for the n-gram/stopword
# heuristic (public knowledge; same list is inlined in the oracle SQL).
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "for", "on")


def _tokens(text_col):
    return F.filter(F.split(F.lower(text_col), r"\W+"), lambda t: F.length(t) > 0)


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish subword estimate.

    The subword estimate is the standard chars/4 heuristic blended with
    word count (≈ GPT-style BPE averages ~4 chars/token on English),
    deterministic and cheap: tokens ≈ max(words, ceil(chars/4)).
    """
    toks = _tokens(F.col(text_col))
    return df.select(
        "*",
        F.size(toks).alias("n_words"),
        F.length(text_col).alias("n_chars_m"),
        F.greatest(
            F.size(toks).cast("long"),
            F.ceil(F.length(text_col) / F.lit(4.0)).cast("long"),
        ).alias("n_tokens_est"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document-quality features + a composite score.

    Features (Gopher/C4-style filters, public recipes):
      mean_word_len, stopword_ratio, punct_ratio, dup_word_ratio.
    Composite: a bounded 0..1 score; the exact blend is arbitrary but
    deterministic and monotone in each signal.
    """
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    n_punct = (
        F.length(text_col) - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    ).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    mean_wl = (
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long"))
        .cast("double") / F.greatest(n_words, F.lit(1.0))
    )
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1.0))
    punct_ratio = n_punct / F.greatest(F.length(text_col).cast("double"), F.lit(1.0))
    dup_ratio = F.lit(1.0) - n_distinct / F.greatest(n_words, F.lit(1.0))
    score = (
        F.least(stop_ratio * 2, F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.2
        + (F.lit(1.0) - dup_ratio) * 0.4
    )
    return df.select(
        "*",
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(dup_ratio, 4).alias("dup_word_ratio"),
        F.round(score, 4).alias("quality"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: English-stopword hit ratio.

    A real system plugs in fastText/CLD3; the engine-side contract is
    the same — a per-row pure function producing (lang_guess,
    lang_score). Kept as a column expression so it runs JVM-side.
    """
    toks = _tokens(F.col(text_col))
    n_words = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))).cast("double")
    ratio = n_stop / F.greatest(n_words, F.lit(1.0))
    return df.select(
        "*",
        F.round(ratio, 4).alias("en_score"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("lang_guess"),
    )


# PII patterns applied in order (email first: an address contains dots
# that the IP pattern must not see). Dialect-portable regex subset —
# identical semantics under Java regex (Spark) and RE2 (DuckDB oracle):
# char classes, bounded repeats, \b, no backrefs/lookaround.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
    (r"\+\d[\d .-]{6,14}\d", "[PHONE]"),
)


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII redaction: replace emails, IPv4 addresses, and international
    phone numbers with typed placeholders, counting redactions.

    Standard pre-training hygiene pass (the C4/RefinedWeb recipes all
    carry one). Pure sequential ``regexp_replace`` column expressions —
    whole-stage codegen, one scan, no UDF; each pattern's match count
    is taken on the text state *before* its own replacement, so the
    counts compose exactly like the sequential SQL twin.
    """
    t = F.col(text_col)
    total = F.lit(0)
    for pat, repl in PII_PATTERNS:
        total = total + F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
        t = F.regexp_replace(t, pat, repl)
    return df.select(
        F.col(id_col),
        t.alias("text_clean"),
        total.cast("int").alias("n_pii"),
    )


def _bigram_explode(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, bigram) — one row per adjacent token pair. Tokens are
    materialized as a column FIRST (inlining the tokenizer into the
    slice lambda re-evaluates it per element — the O(n²) trap)."""
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__t"))
    return toks.filter(F.size("__t") >= 2).select(
        F.col(id_col),
        F.explode(F.expr(
            "zip_with(slice(__t, 1, size(__t) - 1),"
            " slice(__t, 2, size(__t) - 1),"
            " (x, y) -> struct(x AS w1, concat(x, ' ', y) AS bg))"
        )).alias("__p"),
    ).select(id_col, F.col("__p.w1").alias("__w1"), F.col("__p.bg").alias("__bg"))


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals: duplicate-word fraction and
    top-bigram fraction per document (Rae et al. 2021's repetition
    filters, the standard cut for loopy/boilerplate text).

    dup_word_frac = 1 - distinct/total words (pure column expression);
    top_bigram_frac = count of the most frequent bigram / total
    bigrams. Both are PER-DOCUMENT stats, so no shuffle is warranted:
    the top-bigram count is the longest run of equal elements in the
    document's SORTED bigram array (array_sort + one linear aggregate
    fold, O(B log B) per row) — the whole query is a narrow map over
    the scan. The earlier explode → groupBy(doc_id, bg) →
    groupBy(doc_id) → join form spent two exchanges plus a join
    re-keying on doc_id for a quantity each row can compute alone.
    """
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__t"))
    bg = F.when(
        F.size("__t") >= 2,
        F.expr(
            "zip_with(slice(__t, 1, size(__t) - 1),"
            " slice(__t, 2, size(__t) - 1),"
            " (x, y) -> concat(x, ' ', y))"
        ),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    staged = toks.select(
        F.col(id_col),
        F.size("__t").alias("n_words"),
        F.size(F.array_distinct("__t")).alias("__nd"),
        F.array_sort(bg).alias("__bg"),
    )

    def _run(acc, x):
        return F.when(
            acc["p"].isNotNull() & (x == acc["p"]), acc["r"] + F.lit(1)
        ).otherwise(F.lit(1))

    top = F.aggregate(
        F.col("__bg"),
        F.struct(
            F.lit(None).cast("string").alias("p"),
            F.lit(0).alias("r"),
            F.lit(0).alias("b"),
        ),
        lambda acc, x: F.struct(
            x.alias("p"),
            _run(acc, x).alias("r"),
            F.greatest(acc["b"], _run(acc, x)).alias("b"),
        ),
        lambda acc: acc["b"],
    )
    return staged.select(
        F.col(id_col),
        F.col("n_words"),
        F.round(
            F.when(F.col("n_words") > 0,
                   F.lit(1.0) - F.col("__nd").cast("double")
                   / F.col("n_words").cast("double"))
            .otherwise(F.lit(0.0)), 4,
        ).alias("dup_word_frac"),
        F.round(
            F.when(F.size("__bg") > 0,
                   top.cast("double") / F.size("__bg").cast("double"))
            .otherwise(F.lit(0.0)), 4,
        ).alias("top_bigram_frac"),
    )


def lm_bigram_score(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Corpus-trained bigram language-model score per document: the
    mean log2 P(w2 | w1) of the document's word bigrams, with
    P(w2 | w1) = corpus_count(w1 w2) / corpus_count(w1 as prefix).

    The distributed form of a perplexity filter (CCNet/Gopher-style
    'does this doc look like the corpus' signal) with the corpus as
    its own LM — no external model, fully relational, so the oracle is
    exact. Docs full of common constructions score near 0; docs of
    rare transitions score very negative. Plan: one explode + two
    count aggs (map-side combined) + one join keyed on the bigram —
    all high-entropy keys; the model table is corpus-sized, never
    driver-side.
    """
    bg = _bigram_explode(df, id_col, text_col)
    # r10 (guide §2.4): the model aggregation and the scoring join
    # previously each re-derived the tokenize+explode subtree (their
    # different grouping/join keys defeat exchange reuse). One
    # explicit bigram-keyed repartition, pinned with a lazy local
    # checkpoint, feeds both: the (w1, bg) counts cluster under
    # hash(bg) with no further exchange, and the scoring join reuses
    # the same partitioning — corpus bigram rows cross the network
    # exactly once and the explode runs once.
    bg = bg.repartition("__bg").localCheckpoint(eager=False)
    c_bg = bg.groupBy("__w1", "__bg").agg(F.count(F.lit(1)).alias("__cbg"))
    c_w1 = c_bg.groupBy("__w1").agg(F.sum("__cbg").alias("__cw1"))
    model = c_bg.join(c_w1, "__w1").select(
        "__bg",
        F.log2(F.col("__cbg").cast("double") / F.col("__cw1").cast("double"))
        .alias("__logp"),
    )
    return (
        bg.join(model, "__bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("__logp"), 4).alias("avg_logp"),
        )
    )


def pmi_collocations(df: DataFrame, text_col: str = "text",
                     min_count: int = 3, top_k: int = 20,
                     decimals: int = 4) -> DataFrame:
    """Top-k collocations (adjacent word pairs) by pointwise mutual
    information — the corpus-statistics step that finds multiword
    units ("new york", "machine learning") for tokenizer vocab and
    phrase-mining pipelines. PMI = ln(P(w1 w2) / (P(w1)·P(w2))) with
    bigram probability over bigram positions and unigram probabilities
    over token positions; a min_count floor screens out the
    rare-pair PMI explosion (standard practice).

    Shape: one explode for unigram counts, one for bigram counts (both
    map-side combined, high-entropy keys), two equi-joins of the
    bigram table against the unigram table, scalar totals broadcast
    back, TakeOrderedAndProject for the top-k — no window, no
    driver-side state. Counts are exact integers; the single ln() is
    evaluated on one fixed expression so the rounded PMI is
    engine-stable. Ties at the k boundary break on (pmi, w1, w2).
    """
    toks = df.select(_tokens(F.col(text_col)).alias("__t"))
    # uni feeds the totals AND both sides of the bigram join; cab
    # feeds its totals and the filtered join — pin both aggregated
    # tables (vocabulary-sized) or each reference re-runs its corpus
    # explode+shuffle (5 scans unpinned; Catalyst does not reuse
    # common subplans).
    uni = (
        toks.select(F.explode("__t").alias("w"))
        .groupBy("w").agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)
    )
    tot = uni.agg(F.sum("cw").alias("__nt"))
    pairs = toks.filter(F.size("__t") >= 2).select(
        F.explode(F.expr(
            "zip_with(slice(__t, 1, size(__t) - 1),"
            " slice(__t, 2, size(__t) - 1),"
            " (x, y) -> struct(x AS w1, y AS w2))"
        )).alias("__p"),
    ).select("__p.w1", "__p.w2")
    cab = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("n_pair")).localCheckpoint(eager=False)
    btot = cab.agg(F.sum("n_pair").alias("__nb"))
    j = (
        cab.filter(F.col("n_pair") >= min_count)
        .join(uni.select(F.col("w").alias("w1"),
                         F.col("cw").alias("__c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"),
                         F.col("cw").alias("__c2")), "w2")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
    )
    pmi = F.round(
        F.log(
            (F.col("n_pair").cast("double") * F.col("__nt") * F.col("__nt"))
            / (F.col("__nb").cast("double") * F.col("__c1") * F.col("__c2"))
        ), decimals)
    return (
        j.select("w1", "w2", "n_pair", pmi.alias("pmi"))
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(top_k)
    )


def chunk_documents(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text",
                    size: int = 32, stride: int = 24) -> DataFrame:
    """Fixed-size token windows with overlap — the pre-tokenization
    chunking step of an LLM training/eval pipeline (stride < size
    leaves size-stride tokens of overlap between consecutive chunks
    so no span is split across a boundary unseen).

    Chunk i covers tokens [i*stride, i*stride+size); a document gets
    1 + ceil(max(n-size, 0)/stride) chunks, so every token is in at
    least one chunk and a short document yields exactly one.

    Scale: one narrow pass — tokens materialized once per row,
    sequence+explode multiplies rows by ~n/stride, slices are per-row
    array ops. No shuffle, no UDF; parallelism is the scan's.
    """
    toks = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("__t"))
    n = F.size("__t")
    n_chunks = (
        F.lit(1)
        + F.ceil(
            F.greatest(n - F.lit(size), F.lit(0)).cast("double")
            / F.lit(float(stride))
        ).cast("int")
    )
    chunks = toks.filter(n > 0).select(
        F.col(id_col),
        F.col("__t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    piece = F.slice(F.col("__t"), F.col("chunk_id") * stride + 1, size)
    return chunks.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                shingle_k: int = 3) -> DataFrame:
    """Document fingerprint: min-hash-of-shingles (one 64-bit value).

    Rolling-hash/winnowing style content fingerprint: hash every
    k-word shingle (md5 → first 60 bits as long — md5 is identical in
    every engine, making the oracle exact) and keep the minimum.
    Identical content ⇒ identical fingerprint; near-identical content
    usually shares it (this is MinHash with one hash function).
    """
    from twitter_to_sqlite_spark.functions.dedup import shingle_array, spread

    # shingle_array materializes the token column first — inlining the
    # tokenizer into the shingle lambda re-evaluates it per element.
    # NB: fingerprint over distinct shingles == over all shingles
    # (min is duplicate-insensitive).
    with_sh = shingle_array(spread(df), id_col, text_col, shingle_k)
    hashes = F.transform(
        F.col("__sh"),
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
    )
    return with_sh.select(
        F.col("id").alias(id_col),
        F.array_min(hashes).alias("fingerprint"),
    )


# Gopher rule thresholds (Rae et al. 2021, Table A1 — public recipe),
# loosened word-count bound for short-document corpora.
GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 2.0
GOPHER_MAX_MEAN_WL = 12.0
GOPHER_MIN_ALPHA_FRAC = 0.6
GOPHER_MIN_STOP_HITS = 2
GOPHER_MAX_SYMBOL_RATIO = 0.1


def gopher_filter(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """The composite Gopher quality gate as one boolean plan: every
    rule's signal AND its pass/fail verdict per document, plus the
    conjunction ``keep``.

    Rules (Rae et al. 2021's quality filters, the standard pre-training
    cut): word count in [min,max]; mean word length in [2,12]; ≥60% of
    words contain an alphabetic character; at least 2 distinct required
    stopwords present (the Gopher "contains 2 of 8 common English
    words" rule, over EN_STOPWORDS); hash/ellipsis symbol-to-word
    ratio ≤ 0.1.

    Pure column expressions — one narrow pass over the scan, no
    shuffle, whole-stage codegen; at 100 TB this filter runs at
    parquet-read speed and composes with q_pipeline_clean's
    single-exchange pipeline.
    """
    toks = _tokens(F.col(text_col))
    staged = df.select(
        F.col(id_col), F.col(text_col).alias("__txt"), toks.alias("__t")
    )
    n_words = F.size("__t")
    mean_wl = (
        F.aggregate(F.col("__t"), F.lit(0).cast("long"),
                    lambda acc, t: acc + F.length(t).cast("long"))
        .cast("double") / F.greatest(n_words.cast("double"), F.lit(1.0))
    )
    alpha_frac = (
        F.size(F.filter(F.col("__t"), lambda t: t.rlike("[a-z]")))
        .cast("double") / F.greatest(n_words.cast("double"), F.lit(1.0))
    )
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop_hits = F.size(
        F.filter(stop_arr, lambda s: F.array_contains(F.col("__t"), s))
    )
    n_symbols = (
        F.length("__txt")
        - F.length(F.regexp_replace(F.col("__txt"), r"[#…]", ""))
    )
    symbol_ratio = (
        n_symbols.cast("double") / F.greatest(n_words.cast("double"), F.lit(1.0))
    )
    out = staged.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(alpha_frac, 4).alias("alpha_frac"),
        n_stop_hits.cast("long").alias("n_stop_hits"),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        ((n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS))
        .alias("pass_words"),
        ((mean_wl >= GOPHER_MIN_MEAN_WL) & (mean_wl <= GOPHER_MAX_MEAN_WL))
        .alias("pass_word_len"),
        (alpha_frac >= GOPHER_MIN_ALPHA_FRAC).alias("pass_alpha"),
        (n_stop_hits >= GOPHER_MIN_STOP_HITS).alias("pass_stopwords"),
        (symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO).alias("pass_symbols"),
    )
    return out.withColumn(
        "keep",
        F.col("pass_words") & F.col("pass_word_len") & F.col("pass_alpha")
        & F.col("pass_stopwords") & F.col("pass_symbols"),
    )


def tfidf_top_terms(df: DataFrame, group_col: str = "lang",
                    id_col: str = "doc_id", text_col: str = "text",
                    k: int = 5) -> DataFrame:
    """Top-k characteristic terms per corpus slice by TF-IDF.

    tf is the term's total occurrence count within the slice; idf is
    the classic ln(N / df) over documents (N = docs with ≥1 token,
    df = docs containing the term). Because idf is constant per term,
    Σ_docs tf·idf = idf · Σ tf — the sum stays INTEGER until one final
    float multiply, so the score is bit-reproducible in any engine
    regardless of aggregation order (the usual float-sum-order trap
    in distributed TF-IDF).

    Scale: one explode + two partial-agg shuffles on high-entropy keys
    ((doc,term) then term/(group,term)); N and the df table are joined
    back by broadcast (vocabulary ≪ corpus); top-k per group is one
    window over (group,term) aggregates, already tiny.
    """
    toks = df.select(
        F.col(id_col).alias("__id"),
        F.col(group_col).alias("__g"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("__id", "__g", "term").agg(
        F.count(F.lit(1)).alias("__tf"))
    n_docs = tf.select("__id").distinct().agg(
        F.count(F.lit(1)).alias("__N"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    grp = tf.groupBy("__g", "term").agg(F.sum("__tf").alias("tf_sum"))
    scored = (
        grp.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.col("__g").alias(group_col),
            "term",
            F.col("tf_sum").cast("long").alias("tf_sum"),
            F.col("df").cast("long").alias("df"),
            F.round(
                F.log(F.col("__N").cast("double") / F.col("df").cast("double"))
                * F.col("tf_sum").cast("double"),
                4,
            ).alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def perplexity_buckets(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", group_col: str = "lang",
                       n_buckets: int = 3,
                       scored: DataFrame | None = None) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the corpus bigram LM (lm_bigram_score), then
    split each language into equal-size head/middle/tail buckets by
    score — head = most corpus-like, the slices CCNet keeps/weights
    differently when building training mixes.

    ntile runs over the ROUNDED score with the doc id as tiebreak, so
    the bucket boundary is a deterministic total order in any engine.
    Per-language window over (doc, score) rows — state is one pass of
    the already-aggregated scores, no data-sized window.

    ``scored`` lets a caller that already holds this corpus's
    lm_bigram_score frame (doc_id, n_bigrams, avg_logp) inject it
    instead of re-deriving the bigram model (r10 shared-build reuse);
    it must be the score frame OF ``df`` — same id domain.
    """
    if scored is None:
        scored = lm_bigram_score(
            df.select(id_col, text_col), id_col, text_col)
    langs = df.select(id_col, group_col)
    j = scored.join(langs, id_col)
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        F.col("avg_logp").desc(), F.col(id_col).asc())
    b = F.ntile(n_buckets).over(w)
    label = (
        F.when(b == 1, F.lit("head"))
        .when(b == n_buckets, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return j.select(
        id_col, group_col, "n_bigrams", "avg_logp",
        b.cast("long").alias("bucket"), label.alias("bucket_name"),
    )


def normalize_text(text_col):
    """Aggressive dedup normalization (C4/RefinedWeb "fuzzy exact"
    recipe): lowercase, strip everything but [a-z ] (punctuation,
    digits, casing and decoration vanish), squeeze runs of spaces,
    trim. Near-exact duplicates that differ only in chrome collapse to
    one canonical string; pure JVM column expression (DuckDB twin uses
    the same two character classes, which mean the same thing in RE2
    and in DuckDB's regex engine)."""
    x = F.lower(text_col if not isinstance(text_col, str)
                else F.col(text_col))
    x = F.regexp_replace(x, "[^a-z ]", "")
    x = F.regexp_replace(x, " +", " ")
    return F.trim(x)


def distinct_ngram_diversity(df: DataFrame, group_col: str,
                             text_col: str = "text",
                             decimals: int = 6) -> DataFrame:
    """Corpus diversity report per group: distinct-1 / distinct-2
    ratios (distinct n-grams over total n-grams, Li et al. 2016's
    generated-text diversity metrics) plus doc/token totals. Low
    distinct-n flags templated, boilerplate-flooded, or synthetically
    generated slices — the corpus-level complement of the per-doc
    repetition_stats filter (a source can look fine doc-by-doc while
    every doc is the SAME doc).

    Scale: two exploded streams (unigrams, bigrams) into group-keyed
    count + count-distinct aggs — all two-phase with map-side partial
    aggregation; no windows, no driver state. Group cardinality =
    |sources|, so the output is a bounded report frame.
    """
    t = df.select(F.col(group_col), _tokens(F.col(text_col)).alias("__t"))
    uni = t.select(group_col, F.explode("__t").alias("__w"))
    bg = t.filter(F.size("__t") >= 2).select(
        F.col(group_col),
        F.explode(F.expr(
            "zip_with(slice(__t, 1, size(__t) - 1),"
            " slice(__t, 2, size(__t) - 1),"
            " (x, y) -> concat(x, ' ', y))")).alias("__bg"))
    u = uni.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("__w").alias("n_types"))
    b = bg.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.countDistinct("__bg").alias("n_bigram_types"))
    nd = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        nd.join(u, group_col).join(b, group_col)
        .select(
            group_col, "n_docs", "n_tokens", "n_types",
            F.round(F.col("n_types").cast("double") / F.col("n_tokens"),
                    decimals).alias("distinct1"),
            "n_bigrams", "n_bigram_types",
            F.round(F.col("n_bigram_types").cast("double")
                    / F.col("n_bigrams"), decimals).alias("distinct2"),
        )
    )


CODE_KEYWORDS = ("def", "return", "import", "var", "function", "class",
                 "void", "int", "if", "else", "for", "while")

_CODE_SYMBOL_RE = r"[{}()\[\];=<>#]"


def code_detect(df: DataFrame, text_col: str = "text",
                symbol_tau: float = 0.02, min_kw: int = 2) -> DataFrame:
    """Code-likeness screen — the curation gate that routes program
    text away from the prose quality filters (Gopher's stopword and
    word-length gates misfire badly on source code, so pipelines
    branch on this flag BEFORE gating). A document is code when its
    programming-symbol density ({}()[];=<># per char, round-4) meets
    `symbol_tau` AND at least `min_kw` tokens are programming
    keywords — both signals cheap enough to fuse into the first scan
    of the corpus, both integer/fixed-point so the flag is
    engine-exact.

    Appends (sym_ratio, kw_hits, is_code) to every row; one
    projection, no shuffle, no UDF.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_sym = n_chars - F.length(F.regexp_replace(t, _CODE_SYMBOL_RE, ""))
    kw = F.array(*[F.lit(k) for k in CODE_KEYWORDS])
    kw_hits = F.size(
        F.filter(_tokens(t), lambda tok: F.array_contains(kw, tok)))
    sym_ratio = F.round(
        n_sym.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double"),
        4)
    return df.select(
        "*",
        sym_ratio.alias("sym_ratio"),
        kw_hits.cast("long").alias("kw_hits"),
        ((sym_ratio >= F.lit(symbol_tau))
         & (kw_hits >= F.lit(min_kw))).alias("is_code"))


GOPHER_GATES = ("pass_words", "pass_word_len", "pass_alpha",
                "pass_stopwords", "pass_symbols")


def gate_ablation(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Leave-one-out attribution for the Gopher gate stack — the
    question a curation review actually asks: which rule is doing the
    cutting, and how many documents does EACH rule alone condemn?
    Per gate: n_fail (docs failing it at all) and n_sole_blocker
    (docs that pass every OTHER rule — exactly what relaxing that one
    rule would re-admit), plus the corpus totals for context.

    Returns one row per gate: (gate, n_fail, n_sole_blocker, n_keep,
    n_docs). Σ n_sole_blocker + n_keep ≤ n_docs, with equality iff no
    document fails two rules.

    Scale: gopher_filter's flags are one narrow no-shuffle pass; the
    ablation is ONE conditional aggregate over those flags (map-side
    combined to a single row) exploded into |gates| report rows — a
    leave-one-out study of a 100 TB corpus for the price of one scan,
    against the naive form that re-runs the pipeline once per rule.
    """
    flags = gopher_filter(df, id_col, text_col)
    aggs = [F.count(F.lit(1)).alias("__n"),
            F.sum(F.col("keep").cast("long")).alias("__keep")]
    for g in GOPHER_GATES:
        others = [F.col(o) for o in GOPHER_GATES if o != g]
        all_others = others[0]
        for o in others[1:]:
            all_others = all_others & o
        aggs.append(F.sum((~F.col(g)).cast("long")).alias(f"__fail_{g}"))
        aggs.append(F.sum((all_others & ~F.col(g)).cast("long"))
                    .alias(f"__sole_{g}"))
    one = flags.agg(*aggs)
    rows = F.explode(F.array(*[
        F.struct(F.lit(g).alias("gate"),
                 F.col(f"__fail_{g}").alias("n_fail"),
                 F.col(f"__sole_{g}").alias("n_sole_blocker"))
        for g in GOPHER_GATES
    ])).alias("__r")
    return (one.select(rows, "__keep", "__n")
            .select(F.col("__r.gate").alias("gate"),
                    F.col("__r.n_fail").alias("n_fail"),
                    F.col("__r.n_sole_blocker").alias("n_sole_blocker"),
                    F.col("__keep").alias("n_keep"),
                    F.col("__n").alias("n_docs")))


def token_entropy(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text",
                  decimals: int = 6) -> DataFrame:
    """Per-document unigram entropy (nats) — the gibberish/boilerplate
    signal the ratio gates miss: keyboard-mash has HIGH distinct-token
    ratio but near-uniform high entropy, templated chrome has LOW
    entropy at normal length; both sit at the tails of this
    distribution while prose clusters in the middle. H(doc) =
    -Σ (c/n)·ln(c/n) over the doc's own token counts.

    Returns (id, n_words, n_distinct, entropy). Entropy folds over
    the per-doc term list in token-sorted order (the forecast_eval
    device) so float addition order is engine-identical.

    Scale: one explode + two keyed aggs, all map-side combinable; the
    per-doc collected term list is bounded by the doc's own distinct
    vocabulary, never corpus-sized.
    """
    toks = _tokens(F.col(text_col))
    tc = (df.select(F.col(id_col), F.explode(toks).alias("__tok"))
          .groupBy(id_col, "__tok")
          .agg(F.count(F.lit(1)).alias("__c")))
    per = tc.groupBy(id_col).agg(
        F.sum("__c").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sort_array(F.collect_list(F.struct("__tok", "__c")))
        .alias("__terms"))
    n = F.col("n_words").cast("double")
    ent = F.aggregate(
        "__terms", F.lit(0.0),
        lambda acc, s: acc + (s["__c"].cast("double") / n)
        * F.log(n / s["__c"].cast("double")))
    return per.select(
        id_col, "n_words", "n_distinct",
        F.round(ent, decimals).alias("entropy"))


def vocab_coverage_sweep(df: DataFrame, text_col: str,
                         sizes: list[int],
                         decimals: int = 6) -> DataFrame:
    """Tokenizer-vocabulary sizing curve: token-occurrence coverage of
    the top-V-by-frequency vocabulary for every candidate V — the
    sweep vocab_coverage's single fixed N reads one point of. The
    number that decides how much byte-fallback a tokenizer eats at
    each size before anyone trains one.

    The scale trick: coverage by "top V words" needs no per-word
    ranking. Words sharing a frequency c are interchangeable at the
    cut — ANY tie-break admits the same token mass — so the curve is
    exact on the count-of-counts frame: (c, words-with-c), cumulated
    in descending-c order. The corpus collapses to one token agg,
    the VOCAB collapses to |distinct frequencies| rows (Zipf: ~√N),
    the single bounded window runs there, and every V prices itself
    by locating its boundary row — covered(V) = tokens above the
    boundary + (V − words above) · c.

    Returns one row per V: (vocab_size, covered, n_total, n_distinct,
    coverage, oov_rate), integer-exact until the two final divisions.
    """
    from pyspark.sql import Window

    uni = (df.select(F.explode(_tokens(F.col(text_col))).alias("__w"))
           .groupBy("__w").agg(F.count(F.lit(1)).alias("__c")))
    cc = (uni.groupBy("__c").agg(F.count(F.lit(1)).alias("__nw"))
          .localCheckpoint())
    w = (Window.orderBy(F.col("__c").desc())
         .rowsBetween(Window.unboundedPreceding, -1))
    cum = (cc
           .withColumn("__cw", F.coalesce(F.sum("__nw").over(w),
                                          F.lit(0).cast("long")))
           .withColumn("__ct", F.coalesce(
               F.sum(F.col("__nw") * F.col("__c")).over(w),
               F.lit(0).cast("long"))))
    tot = cc.agg(F.sum("__nw").alias("__nd"),
                 F.sum(F.col("__nw") * F.col("__c")).alias("__nt"))
    spark = df.sparkSession
    grid = spark.createDataFrame([(int(v),) for v in sorted(sizes)],
                                 "vocab_size long")
    # each V's boundary row: the unique cum row straddling rank V
    bound = (grid.join(
        F.broadcast(cum),
        (F.col("__cw") < F.col("vocab_size"))
        & (F.col("__cw") + F.col("__nw") >= F.col("vocab_size")),
        "left"))
    j = bound.crossJoin(F.broadcast(tot))
    covered = F.when(
        F.col("vocab_size") >= F.col("__nd"), F.col("__nt")).otherwise(
        F.col("__ct")
        + (F.col("vocab_size") - F.col("__cw")) * F.col("__c"))
    out = j.select(
        "vocab_size", covered.alias("covered"),
        F.col("__nt").alias("n_total"), F.col("__nd").alias("n_distinct"))
    cov = F.round(F.col("covered").cast("double")
                  / F.col("n_total").cast("double"), decimals)
    return out.select(
        "vocab_size", "covered", "n_total", "n_distinct",
        cov.alias("coverage"),
        F.round(F.lit(1.0) - F.col("covered").cast("double")
                / F.col("n_total").cast("double"), decimals)
        .alias("oov_rate"))
