"""Text-analysis plans — SURVEY §2 A9/W2/F9/F16 (search tokenization) plus
the training-data text operators (language-ID heuristic, quality scoring,
token counting, document fingerprinting) over the `documents` table.

Everything is built-in-function / higher-order-function only — tokenization
stays in codegen; there is no Python in these pipelines, so they scale to
100 TB of documents with per-partition parallelism and zero serialization
overhead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..sources import testdata as _td
from ..sources.testdata import load_table
from .registry import register

# Non-empty tokens of a space-separated text (both engines split identically
# and drop the empties produced by trailing/double spaces).
_TOKENS = "filter(split({c}, ' '), w -> length(w) > 0)"
_TOKENS_SQL = "list_filter(string_split({c}, ' '), w -> length(w) > 0)"


# --------------------------------------------------------------------------
# A9/W2/F9: order-preserving distinct search words.
# --------------------------------------------------------------------------
@register(
    "part_search_words",
    sql="""
    WITH w AS (
      SELECT p_partkey,
             unnest(string_split(lower(p_name), ' ')) AS word,
             generate_subscripts(string_split(lower(p_name), ' '), 1) AS pos
      FROM part
    ),
    f AS (
      SELECT p_partkey, word, MIN(pos) AS mi
      FROM w WHERE length(word) >= 3
      GROUP BY p_partkey, word
    )
    SELECT p_partkey, string_agg(word, ' ' ORDER BY mi) AS search_words
    FROM f GROUP BY p_partkey
    """,
    survey_ops=("A9", "W2", "F9"),
    doc="Search-word construction: split/lower/len>=3, dedup keeping first "
    "occurrence order, space-joined (migrations/1628163172-location_city_"
    "search_word_order.sql:5-19; regexp_split+lower+length filter "
    "migrations/1593610727:18-27). Spark array_distinct preserves "
    "first-occurrence order, so the whole operator is a zero-shuffle "
    "projection (the oracle mirrors it with unnest + min(pos) + ordered "
    "string_agg, the reference's WITH ORDINALITY shape).",
)
def part_search_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.array_join(
            F.array_distinct(
                F.expr("filter(split(lower(p_name), ' '), w -> length(w) >= 3)")
            ),
            " ",
        ).alias("search_words"),
    )


# --------------------------------------------------------------------------
# F16: surrogate city_id key.
# --------------------------------------------------------------------------
@register(
    "nation_city_id",
    sql="""
    SELECT n_nationkey, n_name,
           lower(concat(n_name, '/', r_name)) AS city_id
    FROM nation JOIN region ON r_regionkey = n_regionkey
    """,
    survey_ops=("F16", "J2"),
    doc="Surrogate key lower(city||state||country) "
    "(migrations/1593782722-consolidate_city_search.sql:24-28).",
)
def nation_city_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return nation.join(
        broadcast(region), col("r_regionkey") == col("n_regionkey")
    ).select(
        "n_nationkey",
        "n_name",
        F.lower(F.concat(col("n_name"), F.lit("/"), col("r_name"))).alias("city_id"),
    )


# --------------------------------------------------------------------------
# Token counting + quality scoring (training-data ops).
# --------------------------------------------------------------------------
@register(
    "doc_token_stats",
    sql=f"""
    WITH t AS (SELECT doc_id, lang, n_chars, text,
                      {_TOKENS_SQL.format(c='text')} AS toks
               FROM documents)
    SELECT doc_id, lang, n_chars,
           CAST(length(text) AS BIGINT) AS text_len,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(CEIL(length(text) / 4.0) AS BIGINT) AS est_bpe_tokens,
           CAST(CAST(list_sum(list_transform(toks, w -> length(w))) AS BIGINT) AS DOUBLE)
             / len(toks) AS avg_word_len,
           CAST(length(replace(text, ' ', '')) AS DOUBLE) / length(text) AS char_density
    FROM t
    """,
    survey_ops=(),
    doc="Token counting + quality scoring for a training-data pipeline: "
    "whitespace tokens, chars/4 BPE estimate, average word length, "
    "non-space density. Pure codegen expressions.",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.expr(_TOKENS.format(c="text"))
    d = docs.withColumn("toks", toks)
    return d.select(
        "doc_id",
        "lang",
        "n_chars",
        F.length("text").cast("long").alias("text_len"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
        (
            F.expr("CAST(aggregate(toks, 0L, (a, w) -> a + length(w)) AS DOUBLE)")
            / F.size("toks")
        ).alias("avg_word_len"),
        (
            F.length(F.regexp_replace(col("text"), " ", "")).cast("double")
            / F.length("text")
        ).alias("char_density"),
    )


_EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


@register(
    "doc_lang_score",
    sql=f"""
    WITH t AS (SELECT doc_id, lang,
                      {_TOKENS_SQL.format(c='text')} AS toks
               FROM documents)
    SELECT doc_id, lang,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, w -> w IN {_EN_STOPWORDS!r})) AS BIGINT) AS en_hits,
           CAST(len(list_filter(toks, w -> w IN {_EN_STOPWORDS!r})) AS DOUBLE)
             / len(toks) AS en_ratio,
           (CAST(len(list_filter(toks, w -> w IN {_EN_STOPWORDS!r})) AS DOUBLE)
             / len(toks)) >= 0.08 AS looks_english
    FROM t
    """,
    survey_ops=(),
    doc="Language-ID heuristic: stopword-hit ratio against an English "
    "function-word list; the n-gram-free analog of fastText-style langid "
    "for a training-data pipeline.",
)
def doc_lang_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stop_sql = ", ".join(f"'{w}'" for w in _EN_STOPWORDS)
    d = docs.withColumn("toks", F.expr(_TOKENS.format(c="text")))
    hits = F.expr(f"size(filter(toks, w -> w IN ({stop_sql})))")
    ratio = hits.cast("double") / F.size("toks")
    return d.select(
        "doc_id",
        "lang",
        F.size("toks").cast("long").alias("n_tokens"),
        hits.cast("long").alias("en_hits"),
        ratio.alias("en_ratio"),
        (ratio >= 0.08).alias("looks_english"),
    )


@register(
    "doc_fingerprint",
    sql=f"""
    WITH t AS (SELECT doc_id,
                      {_TOKENS_SQL.format(c='text')} AS toks
               FROM documents)
    SELECT doc_id,
           md5(text) AS text_md5,
           CAST(CAST(list_sum(list_transform(toks,
                 (w, i) -> (i * 1000003 + length(w) * 129 + ascii(substr(w, 1, 1))) % 1000000007))
               AS BIGINT) % 1000000007 AS BIGINT) AS token_fingerprint
    FROM documents JOIN t USING (doc_id)
    """,
    survey_ops=("F1",),
    doc="Document fingerprinting: whole-text md5 plus a position-weighted "
    "token hash (order-sensitive, commutative-sum form so it is "
    "partition-order independent) — the rolling-hash fingerprint of a "
    "training-data dedup pipeline.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.withColumn("toks", F.expr(_TOKENS.format(c="text")))
    # Spark lambda index is 0-based; DuckDB's is 1-based → use (i+1) here.
    fp = F.expr(
        """
        CAST(aggregate(
               transform(toks, (w, i) ->
                 ((i + 1) * 1000003 + length(w) * 129 + ascii(substr(w, 1, 1))) % 1000000007),
               0L, (a, x) -> a + x) % 1000000007 AS BIGINT)
        """
    )
    return d.select("doc_id", F.md5(col("text")).alias("text_md5"), fp.alias("token_fingerprint"))


# --------------------------------------------------------------------------
# Quality scoring: repetition / vocabulary-diversity filters — the standard
# pre-training corpus quality gate (alongside doc_token_stats' length and
# density signals).
# --------------------------------------------------------------------------
@register(
    "doc_quality_score",
    sql=f"""
    WITH t AS (SELECT doc_id, {_TOKENS_SQL.format(c='text')} AS toks FROM documents),
    tok AS (SELECT doc_id, unnest(toks) AS w FROM t),
    freq AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY doc_id, w),
    agg AS (SELECT doc_id, MAX(c) AS max_tok_freq,
                   COUNT(*) AS n_distinct, SUM(c) AS n_tokens
            FROM freq GROUP BY doc_id)
    SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_distinct AS BIGINT) AS n_distinct,
           CAST(max_tok_freq AS BIGINT) AS max_tok_freq,
           CAST(n_distinct AS DOUBLE) / n_tokens AS distinct_ratio,
           CAST(max_tok_freq AS DOUBLE) / n_tokens AS repetition_ratio,
           (CAST(n_distinct AS DOUBLE) / n_tokens >= 0.15
            AND CAST(max_tok_freq AS DOUBLE) / n_tokens <= 0.2) AS passes_quality
    FROM agg
    """,
    survey_ops=(),
    doc="Document quality gate: vocabulary-diversity (distinct/total tokens) "
    "and repetition (top token share) ratios with a pass flag — the "
    "dedup-adjacent quality filter of a pre-training pipeline. One explode "
    "+ two hash aggregates; the second is map-side (same key prefix).",
)
def doc_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS.format(c="text"))).alias("w")
    )
    freq = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("doc_id").agg(
        F.max("c").alias("max_tok_freq"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("c").alias("n_tokens"),
    )
    distinct_ratio = col("n_distinct").cast("double") / col("n_tokens")
    repetition_ratio = col("max_tok_freq").cast("double") / col("n_tokens")
    return agg.select(
        "doc_id",
        col("n_tokens").cast("long").alias("n_tokens"),
        col("n_distinct").cast("long").alias("n_distinct"),
        col("max_tok_freq").cast("long").alias("max_tok_freq"),
        distinct_ratio.alias("distinct_ratio"),
        repetition_ratio.alias("repetition_ratio"),
        ((distinct_ratio >= 0.15) & (repetition_ratio <= 0.2)).alias("passes_quality"),
    )


# --------------------------------------------------------------------------
# TF-IDF top terms — the classic relevance weighting a training-data /
# retrieval pipeline derives from the inverted-index statistics.
# --------------------------------------------------------------------------
@register(
    "doc_tfidf_top_terms",
    sql=f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL.format(c='text')}) AS term
      FROM documents),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    ranked AS (
      SELECT doc_id, term, tf, df,
             tf * ((n_docs * 1000000) // df) AS tfidf_fp,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tf * ((n_docs * 1000000) // df) DESC,
                                         term) AS rn
      FROM tf JOIN df USING (term) CROSS JOIN n)
    SELECT doc_id, term, tf, df, tfidf_fp FROM ranked WHERE rn <= 3
    """,
    survey_ops=(),
    doc="Top-3 TF-IDF terms per document. Fixed-point rational idf "
    "(tf x (N x 1e6 div df) -- integer arithmetic, so Spark and the oracle "
    "agree bit-for-bit; a float ln() would differ in the last ulp across "
    "engines). Scale shape: ONE corpus scan -- term frequencies are a hash "
    "aggregate, document frequencies a window COUNT over the term "
    "partition of the same tf frame (a tf x df self-join would scan and "
    "aggregate the corpus twice: Spark does not share subplans); top-3 is "
    "a per-doc window over the bounded per-doc vocabulary. No Python "
    "anywhere.",
)
def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS.format(c="text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
        .crossJoin(broadcast(n))
        .withColumn("tfidf_fp", col("tf") * F.expr("(n_docs * 1000000) div df"))
    )
    w = Window.partitionBy("doc_id").orderBy(col("tfidf_fp").desc(), col("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "tfidf_fp")
    )


# --------------------------------------------------------------------------
# Bigram repetition score — boilerplate/looping-text detector (the n-gram
# repetition filter of C4/Gopher-style corpus cleaning), zero-shuffle.
# --------------------------------------------------------------------------
@register(
    "doc_repetition_score",
    sql=f"""
    WITH g AS (
      SELECT doc_id,
             list_filter(
               list_transform(toks, (w, i) ->
                 CASE WHEN i <= len(toks) - 1
                      THEN toks[i] || ' ' || toks[i + 1] END),
               x -> x IS NOT NULL) AS grams
      FROM (SELECT doc_id, {_TOKENS_SQL.format(c='text')} AS toks
            FROM documents) t)
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_bigrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_bigrams,
           CASE WHEN len(grams) = 0 THEN NULL
                ELSE ((len(grams) - len(list_distinct(grams))) * 1000000)
                     // len(grams) END AS dup_fraction_fp,
           CASE WHEN len(grams) = 0 THEN NULL
                ELSE ((len(grams) - len(list_distinct(grams))) * 1000000)
                     // len(grams) > 300000 END AS is_repetitive
    FROM g
    """,
    survey_ops=(),
    doc="Word-bigram repetition fraction per document (duplicated bigrams / "
    "total, fixed-point) with a Gopher-style repetitiveness flag. Pure "
    "higher-order-function projection: tokenize, zip adjacent tokens, "
    "array_distinct -- all codegen, ZERO exchanges in the plan (gated in "
    "tests/test_plans.py), so at 100 TB it runs at scan speed.",
)
def doc_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    grams = F.expr(
        """filter(
             transform(toks, (w, i) ->
               IF(i <= size(toks) - 2,
                  concat_ws(' ', toks[i], toks[i + 1]), NULL)),
             x -> x IS NOT NULL)"""
    )
    d = (
        docs.withColumn("toks", F.expr(_TOKENS.format(c="text")))
        .withColumn("grams", grams)
        .withColumn("n_bigrams", F.size("grams").cast("long"))
        .withColumn("n_distinct_bigrams", F.size(F.array_distinct("grams")).cast("long"))
    )
    # integer div (not /, which is float division in Spark) so both engines
    # compute the identical fixed-point fraction
    dup_fp = F.when(
        col("n_bigrams") > 0,
        F.expr("((n_bigrams - n_distinct_bigrams) * 1000000) div n_bigrams"),
    )
    return d.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        dup_fp.alias("dup_fraction_fp"),
        F.when(col("n_bigrams") > 0, dup_fp > 300000).alias("is_repetitive"),
    )


# --------------------------------------------------------------------------
# PII-shaped pattern scrubbing: global regex redaction + per-pattern match
# counts. The patterns are the standard training-pipeline scrub set (email,
# phone) plus a secret-shaped long-token rule that this corpus actually
# exercises; all three use the regex subset Java (Spark) and RE2 (DuckDB)
# interpret identically — no lookaround, no backreferences.
# --------------------------------------------------------------------------
_SCRUB_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_SCRUB_PHONE = r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
_SCRUB_LONGTOKEN = r"\b[a-z]{8,}\b"


@register(
    "doc_pattern_scrub",
    sql=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_SCRUB_EMAIL}')) AS INT) AS n_email,
           CAST(len(regexp_extract_all(text, '{_SCRUB_PHONE}')) AS INT) AS n_phone,
           CAST(len(regexp_extract_all(text, '{_SCRUB_LONGTOKEN}')) AS INT)
             AS n_secret,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '{_SCRUB_EMAIL}', '[EMAIL]', 'g'),
                   '{_SCRUB_PHONE}', '[PHONE]', 'g'),
                 '{_SCRUB_LONGTOKEN}', '[SECRET]', 'g')) AS scrubbed_md5
    FROM documents
    """,
    survey_ops=("F9",),
    doc="PII/secret scrubbing pass: per document, count matches of each "
    "scrub pattern and emit the md5 of the fully-redacted text (the hash "
    "keeps the oracle row narrow; production writes the redacted text "
    "itself). Pure JVM regexp_replace/regexp_extract_all projection — "
    "zero exchanges, scan-speed at 100 TB. Patterns stay inside the "
    "Java∩RE2 regex subset so both engines redact byte-identically.",
)
def doc_pattern_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col("text"), _SCRUB_EMAIL, "[EMAIL]"),
            _SCRUB_PHONE,
            "[PHONE]",
        ),
        _SCRUB_LONGTOKEN,
        "[SECRET]",
    )
    # column-API regexp_* take the pattern as a plain string/Column — no SQL
    # string-literal escaping pass, so backslashes survive verbatim
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(col("text"), F.lit(_SCRUB_EMAIL), F.lit(0))).alias("n_email"),
        F.size(F.regexp_extract_all(col("text"), F.lit(_SCRUB_PHONE), F.lit(0))).alias("n_phone"),
        F.size(F.regexp_extract_all(col("text"), F.lit(_SCRUB_LONGTOKEN), F.lit(0))).alias(
            "n_secret"
        ),
        F.md5(scrubbed).alias("scrubbed_md5"),
    )


# --------------------------------------------------------------------------
# Hashed linear text classifier — the fastText-style inference shape used
# by pre-training quality/language filters (score = mean of per-token
# bucket weights). Tokens hash into 64 buckets; the bucket weight is a
# fixed multiplicative-hash formula, so both engines derive identical
# integer weights with no weight table to ship. At 100 TB: one explode +
# one per-doc hash aggregate, all codegen, no Python, no broadcast.
# --------------------------------------------------------------------------
_CLS_BUCKETS = 64
# Knuth multiplicative hash on the bucket id, folded to [-500, 500]; stands
# in for trained weights while exercising the exact inference dataflow.
_CLS_W = f"(((b * 2654435761) % 1001) - 500)"


@register(
    "doc_quality_classifier",
    sql=f"""
    WITH tok AS (
      SELECT doc_id,
             unnest({_TOKENS_SQL.format(c='text')}) AS w
      FROM documents),
    feat AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % {_CLS_BUCKETS} AS b
      FROM tok),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_tokens,
             -- CAST: DuckDB SUM(BIGINT) yields HUGEINT -> pandas float64,
             -- which hash-diverges from Spark's int64
             CAST(SUM({_CLS_W}) AS BIGINT) AS score_sum
      FROM feat GROUP BY doc_id)
    SELECT doc_id, n_tokens, score_sum,
           CAST(score_sum AS DOUBLE) / n_tokens AS mean_score,
           CAST(score_sum AS DOUBLE) / n_tokens >= 0.0 AS accept
    FROM agg
    """,
    survey_ops=(),
    doc="Hashed bag-of-words linear classifier inference (fastText shape): "
    "token -> md5 -> one of 64 weight buckets; document score is the mean "
    "bucket weight; accept = score >= 0. Weights are a deterministic "
    "multiplicative-hash formula (integer arithmetic, so the oracle "
    "matches bit-for-bit; the real model would broadcast a 64-entry map). "
    "Scale: explode + single hash aggregate, all whole-stage codegen.",
)
def doc_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS.format(c="text"))).alias("w")
    )
    bucket = (
        F.conv(F.substring(F.md5("w"), 1, 8), 16, 10).cast("long") % _CLS_BUCKETS
    )
    weight = ((bucket * F.lit(2654435761)) % 1001) - 500
    agg = tok.select("doc_id", weight.alias("wgt")).groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("wgt").alias("score_sum"),
    )
    mean_score = col("score_sum").cast("double") / col("n_tokens")
    return agg.select(
        "doc_id",
        "n_tokens",
        "score_sum",
        mean_score.alias("mean_score"),
        (mean_score >= 0.0).alias("accept"),
    )


# --------------------------------------------------------------------------
# Chunk-level exact-substring dedup (ExactSubstr-lite / C4 span dedup):
# split each document into consecutive 16-token chunks, hash them, and
# report how much of each document is covered by chunks that also appear
# verbatim in OTHER documents. The production remedy for boilerplate and
# template text that document-level dedup cannot see.
# --------------------------------------------------------------------------
_CHUNK_TOKENS = 16


@register(
    "doc_chunk_dedup",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL.format(c='text')} AS toks FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest(list_transform(
               range(CAST(ceil(len(toks) / {_CHUNK_TOKENS}.0) AS BIGINT)),
               i -> md5(array_to_string(toks[1 + {_CHUNK_TOKENS} * i:
                                             {_CHUNK_TOKENS} * (i + 1)], ' '))))
               AS chunk_hash
      FROM t),
    df AS (
      SELECT chunk_hash, COUNT(DISTINCT doc_id) AS doc_df
      FROM chunks GROUP BY chunk_hash)
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN d.doc_df >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_shared_chunks,
           CAST(SUM(CASE WHEN d.doc_df >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS shared_fraction
    FROM chunks c JOIN df d USING (chunk_hash)
    GROUP BY c.doc_id
    """,
    survey_ops=(),
    doc=f"Exact-substring dedup at {_CHUNK_TOKENS}-token-chunk granularity: "
    "chunk hashes -> cross-document frequency -> per-document shared-text "
    "fraction. Scale shape: chunk rows shuffle ONCE on chunk_hash (the df "
    "aggregate and the join co-partition on the same key); everything "
    "upstream is a map-side explode of slices. The 100 TB fix for "
    "boilerplate/template text invisible to whole-document dedup.",
)
def doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # sequence(0, n-1) would yield [0, -1] for an empty token list (Spark
    # sequences run DESCENDING when stop < start) — guard with an empty
    # array so tokenless rows contribute no chunks, like the oracle.
    chunks = (
        docs.select("doc_id", F.expr(_TOKENS.format(c="text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"""IF(size(toks) = 0, array(),
                       transform(
                         sequence(0, int(ceil(size(toks) / {_CHUNK_TOKENS}.0)) - 1),
                         i -> md5(concat_ws(' ',
                                slice(toks, 1 + {_CHUNK_TOKENS} * i,
                                      {_CHUNK_TOKENS})))))"""
                )
            ).alias("chunk_hash"),
        )
    )
    df_counts = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("doc_df")
    )
    shared = (col("doc_df") >= 2).cast("int")
    return (
        chunks.join(df_counts, ["chunk_hash"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(shared).alias("n_shared_chunks"),
            (F.sum(shared).cast("double") / F.count(F.lit(1))).alias(
                "shared_fraction"
            ),
        )
    )


# --------------------------------------------------------------------------
# Dataset-card rollup: the per-source summary a corpus release ships with.
# --------------------------------------------------------------------------
@register(
    "corpus_source_stats",
    sql=f"""
    WITH t AS (
      SELECT source, lang, md5(text) AS h,
             len({_TOKENS_SQL.format(c='text')}) AS n_toks
      FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT lang) AS n_langs,
           COUNT(DISTINCT h) AS n_unique,
           COUNT(*) - COUNT(DISTINCT h) AS n_dups,
           CAST(SUM(n_toks) AS BIGINT) AS total_tokens,
           CAST(SUM(n_toks) AS DOUBLE) / COUNT(*) AS mean_tokens
    FROM t
    GROUP BY source
    """,
    survey_ops=("A2", "A3"),
    doc="Dataset-card per-source statistics: document/unique/dup counts, "
    "language coverage, token totals. One groupBy(source) with two "
    "count-distincts (Spark expands to a two-pass hash agg on the same "
    "shuffle key); token counting is a map-side HOF — integer arithmetic "
    "end-to-end, one double division at the end.",
)
def corpus_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        "lang",
        F.md5("text").alias("h"),
        F.size(F.expr(_TOKENS.format(c="text"))).cast("long").alias("n_toks"),
    )
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("h").alias("n_unique"),
        (F.count(F.lit(1)) - F.count_distinct("h")).alias("n_dups"),
        F.sum("n_toks").alias("total_tokens"),
        (F.sum("n_toks").cast("double") / F.count(F.lit(1))).alias("mean_tokens"),
    )


# --------------------------------------------------------------------------
# Unigram LM surprisal scoring — the deterministic stand-in for perplexity
# filtering in a training-data pipeline: score每 document by how surprising
# its tokens are under the corpus's own unigram distribution. Surprisal is
# measured in WHOLE BITS via integer bit-length (length(bin(x)) on both
# engines): bits(token) = bitlen(N_total) - bitlen(count) ≈ log2(N/count),
# which keeps the whole pipeline in exact integer arithmetic — no
# cross-engine log() ulp drift, same filtering power (rare tokens score
# high, stopwords score ~0).
# --------------------------------------------------------------------------
@register(
    "doc_unigram_surprisal",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL.format(c='text')}) AS w
      FROM documents),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab)
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(length(bin(n)) - length(bin(cnt))) AS BIGINT) AS bits_sum,
           CAST(SUM(length(bin(n)) - length(bin(cnt))) AS DOUBLE) / COUNT(*)
             AS mean_bits
    FROM tok JOIN vocab USING (w) CROSS JOIN tot
    GROUP BY doc_id
    """,
    survey_ops=(),
    doc="Unigram-LM surprisal score per document (the perplexity-filter "
    "shape, integer-exact): corpus unigram counts (one shuffle on token), "
    "total from the vocab aggregate (never a second corpus scan), token→ "
    "count join (shuffle on token; at 100 TB the vocab is Zipf-small after "
    "pruning and broadcast-able), per-doc bit sum (shuffle on doc_id). "
    "bitlen via length(bin(x)) is identical integer math on both engines.",
)
def doc_unigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # three consumers of the token rows (vocab, join); materialize once
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS.format(c="text"))).alias("w")
    ).localCheckpoint()
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    # total token count derived from the (small) vocab — not a second
    # pass over the corpus — and broadcast into the scoring projection
    tot = vocab.agg(F.sum("cnt").alias("n"))
    bits = F.length(F.bin("n")) - F.length(F.bin("cnt"))
    return (
        tok.join(vocab, ["w"])
        .crossJoin(broadcast(tot))
        .select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").cast("long").alias("bits_sum"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("mean_bits"),
        )
    )


# --------------------------------------------------------------------------
# PMI collocation mining — phrase/vocab induction for a training-data
# pipeline: rank adjacent bigrams by pointwise mutual information,
# PMI ∝ c_ab·N² / (B·c_a·c_b). The MAGNITUDE is computed through a fixed
# sequence of int64 multiply/truncating-div steps — mathematically a
# truncated PMI ratio, cross-engine BIT-IDENTICAL because both engines
# execute the same integer expression (exactness of the contract matters,
# not decimal precision; log() would differ in ulps).
# --------------------------------------------------------------------------
_PMI_MIN_COUNT = 5
_PMI_TOP = 100


@register(
    "doc_bigram_pmi",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL.format(c='text')} AS toks FROM documents),
    uni AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(toks) AS w FROM tok) t GROUP BY w),
    big AS (
      SELECT w1, w2, COUNT(*) AS c_ab FROM (
        SELECT unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 1
                        THEN struct_pack(w1 := toks[i], w2 := toks[i + 1]) END),
                 p -> p IS NOT NULL)) AS p
        FROM tok) t
      CROSS JOIN LATERAL (SELECT p.w1 AS w1, p.w2 AS w2)
      GROUP BY w1, w2),
    tots AS (
      SELECT (SELECT CAST(SUM(c) AS BIGINT) FROM uni) AS n,
             (SELECT CAST(SUM(c_ab) AS BIGINT) FROM big) AS b)
    SELECT w1, w2, c_ab,
           ((((c_ab * 1000000) // ua.c) * n) // ub.c) * n // b AS pmi_scaled
    FROM big
    JOIN uni ua ON ua.w = w1
    JOIN uni ub ON ub.w = w2
    CROSS JOIN tots
    WHERE c_ab >= {_PMI_MIN_COUNT}
    ORDER BY pmi_scaled DESC, w1, w2
    LIMIT {_PMI_TOP}
    """,
    survey_ops=("W3",),
    doc="Adjacent-bigram PMI collocations: unigram + bigram counts (one "
    "shuffle each on the word key), totals derived from those aggregates "
    "(never a second corpus scan) and broadcast, two count joins (vocab is "
    "Zipf-small — broadcast-able at 100 TB), min-count floor, top-100 via "
    "TakeOrderedAndProject with (w1, w2) tie-break. The phrase-mining / "
    "tokenizer-vocab-induction primitive.",
)
def doc_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.expr(_TOKENS.format(c="text")).alias("toks"))
    tok = tok.localCheckpoint()  # unigram + bigram consumers
    uni = (
        tok.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bigrams = tok.select(
        F.explode(
            F.expr(
                "filter(transform(toks, (w, i) -> CASE WHEN i < size(toks) - 1"
                " THEN struct(toks[i] AS w1, toks[i + 1] AS w2) END),"
                " p -> p IS NOT NULL)"
            )
        ).alias("p")
    ).select(col("p.w1").alias("w1"), col("p.w2").alias("w2"))
    big = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    n_tot = uni.agg(F.sum("c").cast("long").alias("n"))
    b_tot = big.agg(F.sum("c_ab").cast("long").alias("b"))
    ua = uni.select(col("w").alias("w1"), col("c").alias("ca"))
    ub = uni.select(col("w").alias("w2"), col("c").alias("cb"))
    pmi = F.expr("((((c_ab * 1000000) div ca) * n) div cb) * n div b")
    return (
        big.filter(col("c_ab") >= _PMI_MIN_COUNT)
        .join(ua, ["w1"])
        .join(ub, ["w2"])
        .crossJoin(broadcast(n_tot))
        .crossJoin(broadcast(b_tot))
        .select("w1", "w2", "c_ab", pmi.alias("pmi_scaled"))
        .orderBy(col("pmi_scaled").desc(), "w1", "w2")
        .limit(_PMI_TOP)
    )


# --------------------------------------------------------------------------
# Boilerplate pruning — the rewrite companion to doc_chunk_dedup: where
# that query only MEASURES the shared-chunk fraction, this one removes the
# boilerplate chunks and emits the cleaned text (the C4/CCNet move:
# repeated spans — nav bars, license headers, templated footers — are
# deleted at span granularity, not document granularity, so a document
# survives with its unique content intact).
# --------------------------------------------------------------------------
_BP_DF = 2  # a chunk seen in >= this many docs is boilerplate


def chunk_rows_from_text(docs: DataFrame) -> DataFrame:
    """(doc_id, i, chunk_text, chunk_hash) 16-token chunk rows from a
    (doc_id, text) frame — a map-side explode, no shuffle. Shared by the
    batch boilerplate pruner and the incremental chunk-df index
    (operators/chunk_index.py)."""
    return (
        docs.select("doc_id", F.expr(_TOKENS.format(c="text")).alias("toks"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"""IF(size(toks) = 0, array(),
                       transform(
                         sequence(0, int(ceil(size(toks) / {_CHUNK_TOKENS}.0)) - 1),
                         i -> struct(CAST(i AS BIGINT) AS i,
                                     concat_ws(' ',
                                       slice(toks, 1 + {_CHUNK_TOKENS} * i,
                                             {_CHUNK_TOKENS})) AS chunk_text)))"""
                )
            ).alias("c"),
        )
        .select("doc_id", col("c.i").alias("i"), col("c.chunk_text").alias("chunk_text"))
        .withColumn("chunk_hash", F.md5("chunk_text"))
    )


@register(
    "doc_boilerplate_prune",
    sql=f"""
    WITH t AS (
      SELECT doc_id, {_TOKENS_SQL.format(c='text')} AS toks FROM documents),
    ch AS (
      SELECT doc_id, CAST(i AS BIGINT) AS i,
             array_to_string(
               list_slice(toks, 1 + {_CHUNK_TOKENS} * i,
                          {_CHUNK_TOKENS} * (i + 1)), ' ') AS chunk_text
      FROM (SELECT doc_id, toks,
                   unnest(range(CAST(ceil(len(toks) / {_CHUNK_TOKENS}.0)
                                     AS BIGINT))) AS i
            FROM t) z),
    df AS (
      SELECT md5(chunk_text) AS chunk_hash, COUNT(DISTINCT doc_id) AS doc_df
      FROM ch GROUP BY 1)
    SELECT c.doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN d.doc_df >= {_BP_DF} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pruned,
           COALESCE(string_agg(CASE WHEN d.doc_df < {_BP_DF} THEN c.chunk_text END,
                               ' ' ORDER BY c.i), '') AS clean_text
    FROM ch c JOIN df d ON d.chunk_hash = md5(c.chunk_text)
    GROUP BY c.doc_id
    """,
    survey_ops=(),
    doc=f"Span-level boilerplate removal: {_CHUNK_TOKENS}-token chunks "
    f"hashed and counted across documents; chunks appearing in >= {_BP_DF} "
    "docs are deleted and the surviving chunks are re-joined in order into "
    "clean_text. Scale shape: chunk rows shuffle ONCE on chunk_hash (df "
    "aggregate + join co-partition), then ONCE on doc_id for the ordered "
    "rebuild — never on raw text bytes until the final collect_list, and "
    "that list is bounded by the document's own length. The rebuild "
    "ships (position, chunk) structs so reassembly is deterministic "
    "under any partitioning.",
)
def doc_boilerplate_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    chunks = chunk_rows_from_text(docs)
    df_counts = chunks.groupBy("chunk_hash").agg(
        F.count_distinct("doc_id").alias("doc_df")
    )
    return prune_chunks_with_df(chunks.join(df_counts, ["chunk_hash"]))


def prune_chunks_with_df(chunks_with_df: DataFrame, min_df: int = _BP_DF) -> DataFrame:
    """(doc_id, i, chunk_text, doc_df) rows → (doc_id, n_chunks, n_pruned,
    clean_text): chunks with doc_df >= min_df are deleted, survivors
    re-joined in position order. One shuffle on doc_id; the collect_list is
    bounded by the document's own length."""
    pruned = (col("doc_df") >= min_df).cast("long")
    kept_text = F.when(col("doc_df") < min_df, col("chunk_text"))
    return chunks_with_df.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum(pruned).alias("n_pruned"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(col("i"), kept_text.alias("kept")))
                ),
                lambda s: s["kept"],
            ),
            " ",
        ).alias("clean_text"),
    )


# --------------------------------------------------------------------------
# BPE merge-candidate mining — the inner loop of byte-pair-encoding
# tokenizer training (Sennrich et al. 2016): count adjacent symbol pairs
# across the corpus, weighted by word frequency; the argmax pair becomes
# the next merge rule. One training round is exactly this query; a full
# tokenizer run repeats it ~32k times on an ever-shrinking vocab table.
# --------------------------------------------------------------------------
_BPE_TOP = 50


@register(
    "bpe_merge_candidates",
    sql=f"""
    WITH w AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKENS_SQL.format(c='text')}) AS word
            FROM documents) t
      GROUP BY word),
    pairs AS (
      SELECT substr(word, CAST(i AS INTEGER), 2) AS pair,
             CAST(SUM(freq) AS BIGINT) AS pair_count,
             CAST(COUNT(DISTINCT word) AS BIGINT) AS n_words
      FROM (SELECT word, freq, unnest(range(1, length(word))) AS i FROM w) z
      GROUP BY 1)
    SELECT pair, pair_count, n_words
    FROM pairs
    ORDER BY pair_count DESC, pair
    LIMIT {_BPE_TOP}
    """,
    survey_ops=(),
    doc="BPE tokenizer-training inner loop: adjacent character-pair "
    f"frequencies weighted by word frequency, top-{_BPE_TOP} merge "
    "candidates. Scale shape: the ONLY corpus-sized work is the word-"
    "frequency aggregate (map-side combine, one shuffle on word); the "
    "pair explode and everything after runs on the distinct-word VOCAB "
    "table — thousands of rows regardless of corpus size — so 32k merge "
    "rounds cost 32k vocab-sized jobs, not 32k corpus scans. Top-k is "
    "TakeOrderedAndProject (no global sort).",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.expr(_TOKENS.format(c="text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    pairs = words.select(
        "freq",
        "word",
        # sequence(1, 0) runs DESCENDING in Spark, so 1-char words would
        # emit bogus pairs — guard them to an empty array like the oracle's
        # range(1, 1).
        F.explode(
            F.expr(
                "IF(length(word) < 2, array(),"
                " transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2)))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").alias("pair_count"),
            F.count_distinct("word").alias("n_words"),
        )
        .orderBy(col("pair_count").desc(), "pair")
        .limit(_BPE_TOP)
    )


# --------------------------------------------------------------------------
# Quality-aware mixture — DoReMi-lite: bucket documents by their integer
# mean surprisal (the quality/perplexity proxy above), then set per-bucket
# fixed-point resampling rates targeting EQUAL TOKEN contributions across
# buckets, with md5-threshold keep decisions. The composition a training
# run actually wants: "don't let low-surprisal boilerplate dominate the
# token budget" expressed as one deterministic plan.
# --------------------------------------------------------------------------
@register(
    "doc_surprisal_mixture",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKENS_SQL.format(c='text')}) AS w
      FROM documents),
    vocab AS (SELECT w, COUNT(*) AS cnt FROM tok GROUP BY w),
    tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM vocab),
    per_doc AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(SUM(length(bin(n)) - length(bin(cnt))) AS BIGINT) AS bits_sum
      FROM tok JOIN vocab USING (w) CROSS JOIN tot
      GROUP BY doc_id),
    d AS (
      SELECT doc_id, n_tokens, bits_sum // n_tokens AS bucket,
             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)
                  AS BIGINT) % 1000000 AS b
      FROM per_doc),
    bk AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS bucket_tokens
      FROM d GROUP BY bucket),
    bt AS (SELECT CAST(SUM(bucket_tokens) AS BIGINT) AS total_tokens,
                  COUNT(*) AS n_buckets FROM bk),
    r AS (
      SELECT bucket, n_docs, bucket_tokens,
             LEAST(1000000,
                   ((total_tokens // n_buckets) * 1000000) // bucket_tokens)
               AS rate_ppm
      FROM bk, bt)
    SELECT r.bucket, r.n_docs, r.bucket_tokens, r.rate_ppm,
           CAST(SUM(CASE WHEN d.b < r.rate_ppm THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN d.b < r.rate_ppm THEN d.n_tokens ELSE 0 END)
                AS BIGINT) AS kept_tokens
    FROM d JOIN r ON r.bucket = d.bucket
    GROUP BY r.bucket, r.n_docs, r.bucket_tokens, r.rate_ppm
    """,
    survey_ops=(),
    doc="Quality-aware data mixing (DoReMi-lite): documents bucket by "
    "integer mean surprisal (bits_sum div n_tokens — a handful of "
    "map-side buckets, no data-dependent quantile sort), per-bucket "
    "fixed-point ppm rates target equal TOKEN contributions, and each "
    "document's keep decision is an md5 threshold — RNG-free and "
    "cluster-size independent. Scale shape: the surprisal machinery's "
    "token shuffles, then one doc-grain aggregate; the rate table is "
    "bucket-sized and broadcast back; per-bucket report is the only "
    "extra shuffle.",
)
def doc_surprisal_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.explode(F.expr(_TOKENS.format(c="text"))).alias("w")
    ).localCheckpoint()  # vocab + scoring join
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"))
    bits = F.length(F.bin("n")) - F.length(F.bin("cnt"))
    per_doc = (
        tok.join(vocab, ["w"])
        .crossJoin(broadcast(tot))
        .select("doc_id", bits.alias("bits"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("bits").cast("long").alias("bits_sum"),
        )
    )
    b = F.expr(
        "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 12), 16, 10) AS BIGINT)"
        " % 1000000"
    )
    d = per_doc.select(
        "doc_id",
        "n_tokens",
        F.expr("bits_sum div n_tokens").alias("bucket"),
        b.alias("b"),
    )
    bk = d.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bucket_tokens"),
    )
    bt = bk.agg(
        F.sum("bucket_tokens").cast("long").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_buckets"),
    )
    r = bk.crossJoin(broadcast(bt)).select(
        "bucket",
        "n_docs",
        "bucket_tokens",
        F.least(
            F.lit(1000000),
            F.expr("((total_tokens div n_buckets) * 1000000) div bucket_tokens"),
        ).alias("rate_ppm"),
    )
    return (
        d.join(broadcast(r), ["bucket"])
        .groupBy("bucket", "n_docs", "bucket_tokens", "rate_ppm")
        .agg(
            F.sum(F.when(col("b") < col("rate_ppm"), 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(col("b") < col("rate_ppm"), col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("kept_tokens"),
        )
    )


# --------------------------------------------------------------------------
# Bigram-LM surprisal with unigram backoff — the next rung above
# doc_unigram_surprisal on the perplexity-filter ladder: each bigram
# position scores -log2 P(w2|w1) ≈ bitlen(c_w1) - bitlen(c_w1w2) when the
# bigram is attested (count >= floor), else it BACKS OFF to the unigram
# estimate bitlen(N) - bitlen(c_w2) plus a fixed penalty. Same integer
# bit-length trick as the unigram query: exact on both engines, no log().
# --------------------------------------------------------------------------
_BS_MIN_BIGRAM = 2  # below this the position backs off to the unigram model
_BS_BACKOFF_PENALTY = 4  # bits


@register(
    "doc_bigram_surprisal",
    sql=f"""
    WITH tok AS (
      SELECT doc_id, {_TOKENS_SQL.format(c='text')} AS toks FROM documents),
    pos AS (
      SELECT doc_id, p.w1 AS w1, p.w2 AS w2 FROM (
        SELECT doc_id, unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 1
                        THEN struct_pack(w1 := toks[i], w2 := toks[i + 1]) END),
                 p -> p IS NOT NULL)) AS p
        FROM tok) t),
    uni AS (
      SELECT w, COUNT(*) AS c FROM (
        SELECT unnest(toks) AS w FROM tok) t GROUP BY w),
    big AS (SELECT w1, w2, COUNT(*) AS c_ab FROM pos GROUP BY w1, w2),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni)
    SELECT doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(CASE WHEN c_ab >= {_BS_MIN_BIGRAM}
                         THEN length(bin(ua.c)) - length(bin(c_ab))
                         ELSE length(bin(n)) - length(bin(ub.c))
                              + {_BS_BACKOFF_PENALTY} END) AS BIGINT) AS bits_sum,
           CAST(SUM(CASE WHEN c_ab >= {_BS_MIN_BIGRAM} THEN 1 ELSE 0 END)
             AS BIGINT) AS n_attested,
           CAST(SUM(CASE WHEN c_ab >= {_BS_MIN_BIGRAM}
                         THEN length(bin(ua.c)) - length(bin(c_ab))
                         ELSE length(bin(n)) - length(bin(ub.c))
                              + {_BS_BACKOFF_PENALTY} END) AS DOUBLE) / COUNT(*)
             AS mean_bits
    FROM pos
    JOIN big USING (w1, w2)
    JOIN uni ua ON ua.w = pos.w1
    JOIN uni ub ON ub.w = pos.w2
    CROSS JOIN tot
    GROUP BY doc_id
    """,
    survey_ops=(),
    doc="Bigram-LM document surprisal with unigram backoff (Katz-lite): "
    f"attested bigrams (count >= {_BS_MIN_BIGRAM}) score "
    "bitlen(c_w1)-bitlen(c_w1w2); unattested positions back off to the "
    f"unigram bits + {_BS_BACKOFF_PENALTY}-bit penalty. Integer bit-length "
    "arithmetic end to end — no cross-engine log drift. Scale shape: "
    "bigram/unigram counts shuffle once each on their keys; the count "
    "tables are Zipf-small after flooring (broadcast-able at 100 TB), so "
    "the three scoring joins turn map-side; final rollup shuffles doc_id. "
    "With doc_unigram_surprisal this gives the quality-filter pair every "
    "LM data pipeline runs (fluency = low bigram bits, rarity = high "
    "unigram bits).",
)
def doc_bigram_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.expr(_TOKENS.format(c="text")).alias("toks"))
    tok = tok.localCheckpoint()  # unigram + position consumers
    pos = tok.select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(toks, (w, i) -> CASE WHEN i < size(toks) - 1"
                " THEN struct(toks[i] AS w1, toks[i + 1] AS w2) END),"
                " p -> p IS NOT NULL)"
            )
        ).alias("p"),
    ).select("doc_id", col("p.w1").alias("w1"), col("p.w2").alias("w2"))
    pos = pos.localCheckpoint()  # feeds the bigram count AND the scoring join
    uni = (
        tok.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    big = pos.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_ab"))
    tot = uni.agg(F.sum("c").cast("long").alias("n"))
    ua = uni.select(col("w").alias("w1"), col("c").alias("ca"))
    ub = uni.select(col("w").alias("w2"), col("c").alias("cb"))
    bits = F.expr(
        f"CASE WHEN c_ab >= {_BS_MIN_BIGRAM}"
        " THEN length(bin(ca)) - length(bin(c_ab))"
        f" ELSE length(bin(n)) - length(bin(cb)) + {_BS_BACKOFF_PENALTY} END"
    )
    attested = F.expr(f"CASE WHEN c_ab >= {_BS_MIN_BIGRAM} THEN 1 ELSE 0 END")
    return (
        pos.join(big, ["w1", "w2"])
        .join(ua, ["w1"])
        .join(ub, ["w2"])
        .crossJoin(F.broadcast(tot))
        .select("doc_id", bits.alias("bits"), attested.alias("att"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("bits").cast("long").alias("bits_sum"),
            F.sum("att").cast("long").alias("n_attested"),
            (F.sum("bits").cast("double") / F.count(F.lit(1))).alias("mean_bits"),
        )
    )


# --------------------------------------------------------------------------
# Overlapping chunking — the RAG/embedding prep step: fixed-size windows
# with stride < size so no boundary sentence is lost to a hard cut. Chunk
# grain (doc_id, seq, offsets, md5 fingerprint) is exactly what a vector
# store ingests next (embedding_* queries take it from here).
# --------------------------------------------------------------------------
_CHUNK_SIZE = 200
_CHUNK_STRIDE = 150


@register(
    "doc_chunk_overlap",
    sql=f"""
    SELECT doc_id,
           CAST(i + 1 AS BIGINT) AS chunk_seq,
           CAST(i * {_CHUNK_STRIDE} + 1 AS BIGINT) AS char_start,
           CAST(length(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_SIZE}))
                AS BIGINT) AS chunk_len,
           md5(substr(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_SIZE}))
             AS chunk_md5
    FROM (
      SELECT doc_id, text,
             unnest(range(0, CAST(floor((length(text) - 1) / {_CHUNK_STRIDE}) AS BIGINT) + 1))
               AS i
      FROM documents
      WHERE length(text) > 0)
    """,
    survey_ops=("P7",),
    doc="Overlapping document chunking for retrieval/embedding pipelines: "
    f"{_CHUNK_SIZE}-char windows every {_CHUNK_STRIDE} chars (50-char "
    "overlap), one row per chunk with 1-based offsets, actual length "
    "(the tail chunk is shorter), and an md5 content fingerprint for "
    "downstream chunk-level dedup (doc_chunk_dedup's grain). Spark "
    "shape: sequence+explode is a map-side HOF — ZERO shuffle, the "
    "corpus streams once and fans out ~len/stride chunk rows per doc; "
    "at 100 TB this is the embarrassingly-parallel shape chunking must "
    "keep (an aggregate- or window-based chunker would shuffle the "
    "whole corpus for no reason).",
)
def doc_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    d = docs.select(
        "doc_id",
        "text",
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor((F.length("text") - 1) / _CHUNK_STRIDE).cast("long"),
            )
        ).alias("i"),
    )
    chunk = F.expr(f"substring(text, CAST(i * {_CHUNK_STRIDE} + 1 AS INT), {_CHUNK_SIZE})")
    return d.select(
        "doc_id",
        (col("i") + 1).cast("long").alias("chunk_seq"),
        (col("i") * _CHUNK_STRIDE + 1).cast("long").alias("char_start"),
        F.length(chunk).cast("long").alias("chunk_len"),
        F.md5(chunk).alias("chunk_md5"),
    )


# --------------------------------------------------------------------------
# Vocabulary coverage curve — the tokenizer-design metric: what share of
# all corpus token OCCURRENCES does a top-k vocabulary cover? The knee of
# this curve is where a vocab budget stops paying; the residual is the
# UNK/byte-fallback rate a tokenizer of that size would eat. Token grain
# only after the corpus-sized count aggregate — the window runs over the
# VOCABULARY frame, never the corpus.
# --------------------------------------------------------------------------
_VOCAB_SIZES = (10, 100, 1000)


@register(
    "vocab_coverage_curve",
    sql=f"""
    WITH toks AS (
      SELECT unnest({_TOKENS_SQL.format(c='text')}) AS tok FROM documents),
    counts AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_types FROM counts),
    ranked AS (
      SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok ASC) AS rk,
             SUM(c) OVER (ORDER BY c DESC, tok ASC) AS cum
      FROM counts)
    SELECT CAST(v.vocab_size AS BIGINT) AS vocab_size,
           t.n_types,
           CAST(COALESCE(MAX(r.cum), t.total) AS BIGINT) AS covered_tokens,
           CAST(COALESCE(MAX(r.cum), t.total) * 1000000 // t.total AS BIGINT)
             AS coverage_ppm
    FROM (SELECT unnest([{', '.join(str(v) for v in _VOCAB_SIZES)}]) AS vocab_size) v
    CROSS JOIN tot t
    LEFT JOIN ranked r ON r.rk <= v.vocab_size
    GROUP BY CAST(v.vocab_size AS BIGINT), t.n_types, t.total
    """,
    survey_ops=("A2",),
    doc="Coverage of corpus token occurrences by a top-k vocabulary at "
    f"k ∈ {_VOCAB_SIZES} — the tokenizer-budget curve (the residual is "
    "the UNK/byte-fallback rate). One corpus-sized count aggregate; the "
    "rank/cumulative window runs over the VOCABULARY frame (types, not "
    "occurrences) with a (count desc, token) total order so both "
    "engines pick identical prefixes; shares in integer ppm. A k larger "
    "than the type count covers everything (COALESCE to total).",
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.explode(F.expr(_TOKENS.format(c="text"))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    counts = counts.localCheckpoint()  # feeds totals AND the ranked window
    tot = counts.agg(
        F.sum("c").cast("long").alias("total"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    w = Window.orderBy(col("c").desc(), col("tok").asc())
    ranked = counts.select(
        "c",
        F.row_number().over(w).alias("rk"),
        F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).alias("cum"),
    )
    from ..functions.localframe import local_df

    sizes = local_df(
        spark.range(0).sparkSession, [(v,) for v in _VOCAB_SIZES], "vocab_size long"
    )
    j = (
        sizes.crossJoin(F.broadcast(tot))
        .join(ranked, col("rk") <= col("vocab_size"), "left")
        .groupBy("vocab_size", "n_types", "total")
        .agg(F.max("cum").alias("mx"))
    )
    return j.select(
        "vocab_size",
        "n_types",
        F.coalesce(col("mx"), col("total")).cast("long").alias("covered_tokens"),
        F.expr("CAST(coalesce(mx, total) * 1000000 div total AS BIGINT)").alias(
            "coverage_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Iterative BPE trainer — closes the loop bpe_merge_candidates opens: N
# greedy merge rounds over the frequency-weighted WORD table (never the
# corpus), producing the ORDERED merge list a tokenizer ships. Each round:
# count adjacent symbol pairs (weighted by word freq, overlaps counted —
# the classic Sennrich statistics), pick argmax with deterministic
# tie-breaks (count desc, then left/right symbol lexicographic), apply the
# merge greedily left-to-right to every word, repeat.
#
# Cross-engine trick: a word's symbol sequence is ONE STRING with doubled
# \x01 separators ("\x01a\x01\x01b\x01\x01c\x01"), so greedy left-to-right
# merge application is plain replace("\x01x\x01\x01y\x01" → "\x01xy\x01")
# — non-overlapping scan-forward semantics identical in Spark and DuckDB,
# and the doubled separator means adjacent matches never share characters
# ("x y x y" merges BOTH pairs) while merged symbols can never be matched
# mid-symbol (every boundary is \x01\x01).
# --------------------------------------------------------------------------
_BPE_ROUNDS = 8
_BPE_VOCAB = 2000
_S = "chr(1)"  # the separator, engine-side


def _bpe_train_ctes() -> list:
    """The shared CTE chain (w_all … b{N}/w{N}) both BPE queries build on:
    the trainer emits the b{r} rows; the encoder replays them over the
    corpus vocabulary."""
    sep2 = f"{_S} || {_S}"
    ctes = [
        f"""w_all AS (
      SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
      FROM (SELECT unnest({_TOKENS_SQL.format(c='text')}) AS word
            FROM documents) t
      WHERE strpos(word, {_S}) = 0
      GROUP BY word)""",
        f"""w_top AS (
      SELECT word, freq FROM w_all ORDER BY freq DESC, word LIMIT {_BPE_VOCAB})""",
        f"""w0 AS (
      SELECT {_S} || array_to_string(
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, CAST(i AS INTEGER), 1)),
               {sep2}) || {_S} AS ws,
             freq
      FROM w_top)""",
    ]
    for r in range(1, _BPE_ROUNDS + 1):
        ctes.append(
            f"""p{r} AS (
      SELECT s[CAST(i AS INTEGER)] AS x, s[CAST(i AS INTEGER) + 1] AS y,
             CAST(SUM(freq) AS BIGINT) AS c
      FROM (SELECT string_split(trim(ws, {_S}), {sep2}) AS s, freq,
                   unnest(range(1, len(string_split(trim(ws, {_S}), {sep2})))) AS i
            FROM w{r - 1}) z
      GROUP BY 1, 2)"""
        )
        ctes.append(
            f"""b{r} AS (SELECT x, y, c FROM p{r} ORDER BY c DESC, x, y LIMIT 1)"""
        )
        ctes.append(
            f"""w{r} AS (
      SELECT CASE WHEN b.x IS NULL THEN ws
                  ELSE replace(ws, {_S} || b.x || {sep2} || b.y || {_S},
                               {_S} || b.x || b.y || {_S}) END AS ws,
             freq
      FROM w{r - 1} LEFT JOIN b{r} b ON TRUE)"""
        )
    return ctes


def _bpe_train_sql() -> str:
    ctes = _bpe_train_ctes()
    union = "\n      UNION ALL ".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, x AS left_sym, "
        f"y AS right_sym, c AS pair_count FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    )
    return "WITH " + ",\n    ".join(ctes) + f"\n    {union}"


@register(
    "bpe_train_merges",
    sql=_bpe_train_sql(),
    survey_ops=(),
    doc=f"Iterative BPE training: {_BPE_ROUNDS} greedy merge rounds over "
    f"the top-{_BPE_VOCAB} frequency-weighted words, emitting the ordered "
    "merge list (rank, left symbol, right symbol, weighted pair count) — "
    "the artifact a tokenizer actually ships, vs bpe_merge_candidates' "
    "single round of statistics. Deterministic end to end: argmax ties "
    "break on (count desc, pair lexicographic); merge application is "
    "greedy left-to-right via non-overlapping string replace on a "
    "doubled-separator symbol encoding, bit-identical in both engines. "
    "Scale shape: the ONLY corpus-sized work is the word-frequency "
    "aggregate; every round runs on the bounded vocab table (pair explode "
    "+ one TakeOrdered row + a map-side replace), so 32k production "
    "rounds cost 32k vocab-sized jobs, not corpus scans — the "
    "supplier_pagerank iterate-on-the-small-table shape.",
)
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.localframe import local_df

    return local_df(
        spark,
        _bpe_trained_merges(spark, sf_dir),
        "merge_rank long, left_sym string, right_sym string, pair_count long",
    )


def _bpe_trained_merges(
    spark: SparkSession, sf_dir: str, word_freq: DataFrame | None = None
) -> list:
    """The trainer loop proper: [(rank, left, right, weighted_count), ...]
    — driver-resident by design (a tokenizer's merge list is the small
    shipped artifact, ≤ vocab-size rows; production 32k rounds is still
    KB-scale). ``word_freq``: a caller already holding the corpus (word,
    freq) aggregate (bpe_encode_corpus derives it from its checkpointed
    per-doc word table) passes it here so the trainer skips its own
    corpus tokenize pass; default None stays self-contained."""
    sep = "\x01"
    if word_freq is None:
        docs = load_table(spark, sf_dir, "documents")
        word_freq = (
            docs.select(F.explode(F.expr(_TOKENS.format(c="text"))).alias("word"))
            .filter(~col("word").contains(sep))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("freq"))
        )
    words = word_freq.orderBy(col("freq").desc(), "word").limit(_BPE_VOCAB)
    w = words.select(
        F.expr(
            f"concat({_S}, array_join(transform(sequence(1, length(word)),"
            f" i -> substring(word, i, 1)), concat({_S}, {_S})), {_S})"
        ).alias("ws"),
        "freq",
    ).localCheckpoint()
    merges = []
    for r in range(1, _BPE_ROUNDS + 1):
        # sequence(1, 0) runs DESCENDING in Spark (see bpe_merge_candidates)
        # — single-symbol words must emit an empty pair array
        syms_sql = f"split(trim(BOTH {_S} FROM ws), concat({_S}, {_S}))"
        pairs = w.select(
            "freq", F.explode(
                F.expr(
                    f"IF(size({syms_sql}) < 2, array(),"
                    f" transform(sequence(1, size({syms_sql}) - 1),"
                    f" i -> struct(element_at({syms_sql}, i) AS x,"
                    f" element_at({syms_sql}, i + 1) AS y)))"
                )
            ).alias("p"),
        ).select("freq", col("p.x").alias("x"), col("p.y").alias("y"))
        best = (
            pairs.groupBy("x", "y")
            .agg(F.sum("freq").alias("c"))
            .orderBy(col("c").desc(), "x", "y")
            .first()
        )
        if best is None:
            break
        merges.append((r, best.x, best.y, int(best.c)))
        find = f"{sep}{best.x}{sep}{sep}{best.y}{sep}"
        repl = f"{sep}{best.x}{best.y}{sep}"
        w = w.withColumn("ws", F.replace(col("ws"), F.lit(find), F.lit(repl)))
    return merges


def _bpe_encode_sql() -> str:
    sep2 = f"{_S} || {_S}"
    ctes = _bpe_train_ctes()
    ctes.append(
        f"""wd AS (
      SELECT doc_id, word, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM (SELECT doc_id, unnest({_TOKENS_SQL.format(c='text')}) AS word
            FROM documents) t
      WHERE strpos(word, {_S}) = 0
      GROUP BY doc_id, word)"""
    )
    ctes.append(
        f"""enc0 AS (
      SELECT word, {_S} || array_to_string(
               list_transform(range(1, length(word) + 1),
                              i -> substr(word, CAST(i AS INTEGER), 1)),
               {sep2}) || {_S} AS ws
      FROM (SELECT DISTINCT word FROM wd) dw)"""
    )
    for r in range(1, _BPE_ROUNDS + 1):
        ctes.append(
            f"""enc{r} AS (
      SELECT word, CASE WHEN b.x IS NULL THEN ws
                        ELSE replace(ws, {_S} || b.x || {sep2} || b.y || {_S},
                                     {_S} || b.x || b.y || {_S}) END AS ws
      FROM enc{r - 1} LEFT JOIN b{r} b ON TRUE)"""
        )
    ctes.append(
        f"""tok AS (
      SELECT word, CAST(len(string_split(trim(ws, {_S}), {sep2})) AS BIGINT)
               AS ntok
      FROM enc{_BPE_ROUNDS})"""
    )
    return (
        "WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT wd.doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * ntok) AS BIGINT) AS n_tokens,
           CAST(SUM(cnt * length(word)) AS BIGINT) AS n_chars
    FROM wd JOIN tok USING (word)
    GROUP BY wd.doc_id"""
    )


@register(
    "bpe_encode_corpus",
    sql=_bpe_encode_sql(),
    survey_ops=(),
    doc="Tokenizer APPLICATION — the other half of bpe_train_merges: "
    "encode every document with the trained ordered merge list (same "
    "greedy left-to-right doubled-separator replace as training) and emit "
    "per-doc (n_words, n_tokens, n_chars) — the fertility/compression "
    "numbers a data pipeline reports per corpus slice. Scale shape: the "
    "merge chain applies to the DISTINCT-WORD table once (vocabulary "
    "grain, map-side replace chain), then joins back to per-doc word "
    "counts — corpus-sized work is one tokenize + one (doc, word) "
    "aggregate; the encode itself never touches corpus positions. The "
    "oracle replays training AND encoding through one chained-CTE "
    "pipeline, so hash equality covers the full train→encode contract. "
    "All-integer output.",
)
def bpe_encode_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sep = "\x01"
    # ONE tokenize + (doc, word) aggregate, materialized (round 13): wd
    # feeds the distinct-word encode table, the final join-back, AND (as
    # a word-grain re-aggregate) the trainer — previously each consumer
    # re-ran the corpus tokenize from scratch (3 passes in one query).
    wd = (
        docs.select(
            "doc_id", F.explode(F.expr(_TOKENS.format(c="text"))).alias("word")
        )
        .filter(~col("word").contains(sep))
        .groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    word_freq = wd.groupBy("word").agg(F.sum("cnt").alias("freq"))
    enc = wd.select("word").distinct().withColumn(
        "ws",
        F.expr(
            f"concat({_S}, array_join(transform(sequence(1, length(word)),"
            f" i -> substring(word, i, 1)), concat({_S}, {_S})), {_S})"
        ),
    )
    for _r, x, y, _c in _bpe_trained_merges(spark, sf_dir, word_freq=word_freq):
        enc = enc.withColumn(
            "ws",
            F.replace(
                col("ws"),
                F.lit(f"{sep}{x}{sep}{sep}{y}{sep}"),
                F.lit(f"{sep}{x}{y}{sep}"),
            ),
        )
    syms = f"split(trim(BOTH {_S} FROM ws), concat({_S}, {_S}))"
    enc = enc.select("word", F.expr(f"CAST(size({syms}) AS BIGINT)").alias("ntok"))
    return (
        wd.join(enc, ["word"])
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(col("cnt") * col("ntok")).alias("n_tokens"),
            F.sum(col("cnt") * F.length("word").cast("long")).alias("n_chars"),
        )
    )


# --------------------------------------------------------------------------
# Corpus distribution drift — KL divergence between the unigram
# distributions of two corpus halves, in the same WHOLE-BIT integer
# convention the surprisal ladder uses (bitlen via length(bin(x)), no
# cross-engine log() ulps): the distribution-shift monitor a training-
# data pipeline runs between crawl snapshots, train vs eval splits, or
# source mixes. Add-1 smoothing over the union vocabulary keeps every
# term finite; per-token log-ratio ≈ bitlen(ca·Nb) − bitlen(cb·Na)
# (cross-multiplied so no division happens before the log), and
# KL(P‖Q) ≈ Σ ca·d / Na, reported in millibits. The bitlen approximation
# is ±1 bit per term — plenty for MONITORING (the output is a trend
# line, not a loss), and it makes the estimate itself hash-verifiable.
# --------------------------------------------------------------------------
@register(
    "corpus_unigram_drift",
    sql=f"""
    WITH tok AS (
      SELECT doc_id % 2 AS half, unnest({_TOKENS_SQL.format(c='text')}) AS w
      FROM documents),
    c AS (
      SELECT w,
             CAST(COALESCE(SUM(CASE WHEN half = 0 THEN 1 END), 0) + 1 AS BIGINT)
               AS ca,
             CAST(COALESCE(SUM(CASE WHEN half = 1 THEN 1 END), 0) + 1 AS BIGINT)
               AS cb
      FROM tok GROUP BY w),
    t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb
          FROM c),
    d AS (
      SELECT ca, cb,
             CAST(length(bin(ca * nb)) - length(bin(cb * na)) AS BIGINT) AS dab
      FROM c CROSS JOIN t),
    s AS (
      SELECT CAST(SUM(ca - 1) AS BIGINT) AS n_tokens_a,
             CAST(SUM(cb - 1) AS BIGINT) AS n_tokens_b,
             CAST(COUNT(*) FILTER (WHERE ca > 1) AS BIGINT) AS vocab_a,
             CAST(COUNT(*) FILTER (WHERE cb > 1) AS BIGINT) AS vocab_b,
             CAST(COUNT(*) FILTER (WHERE ca > 1 AND cb > 1) AS BIGINT)
               AS vocab_shared,
             CAST(SUM(ca * dab) AS BIGINT) AS sab,
             CAST(SUM(cb * -dab) AS BIGINT) AS sba
      FROM d)
    SELECT n_tokens_a, n_tokens_b, vocab_a, vocab_b, vocab_shared,
           CAST(CASE WHEN sab < 0 THEN -((-sab) * 1000 // (SELECT na FROM t))
                ELSE sab * 1000 // (SELECT na FROM t) END AS BIGINT)
             AS kl_ab_millibits,
           CAST(CASE WHEN sba < 0 THEN -((-sba) * 1000 // (SELECT nb FROM t))
                ELSE sba * 1000 // (SELECT nb FROM t) END AS BIGINT)
             AS kl_ba_millibits
    FROM s
    """,
    survey_ops=(),
    doc="Unigram distribution drift between the two doc_id-parity corpus "
    "halves: add-1-smoothed KL divergence in MILLIBITS, both directions, "
    "plus vocabulary overlap — the snapshot-vs-snapshot / train-vs-eval "
    "distribution-shift monitor. Per-token log-ratio is the whole-bit "
    "integer bitlen(ca·Nb) − bitlen(cb·Na) (the doc_unigram_surprisal "
    "convention; ±1 bit per term, exact integer arithmetic so the "
    "DIVERGENCE ESTIMATE itself hash-verifies). Negative sums route "
    "through sign/abs (Spark div truncates, DuckDB // floors). Scale "
    "shape: one token shuffle to the (word, half-counts) vocab, then "
    "every remaining step runs at vocab grain with a broadcast 1-row "
    "total — the corpus is scanned once.",
)
def corpus_unigram_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.drift import drift_from_counts, half_token_counts

    docs = load_table(spark, sf_dir, "documents")
    return drift_from_counts(half_token_counts(docs))


# --------------------------------------------------------------------------
# Vocabulary growth curve (Heaps' law): distinct shingle vocabulary vs
# corpus prefix size at ten checkpoints — the diversity telemetry that
# distinguishes a corpus that keeps teaching a model new strings from one
# that repeats itself (flattening curve = diminishing novelty = stop
# crawling this source). Shingle vocabulary, not unigrams: the 30-word
# synthetic token vocabulary saturates in one document.
# --------------------------------------------------------------------------
@register(
    "corpus_heaps_curve",
    sql="""
    WITH s AS (
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 2
                        THEN toks[i] || ' ' || toks[i + 1] || ' '
                             || toks[i + 2] END),
                 x -> x IS NOT NULL)) AS shingle
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '),
                                 w -> length(w) > 0) AS toks
              FROM documents) t) u),
    ranks AS (
      SELECT doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY doc_id) AS BIGINT) AS r
      FROM documents),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    ks AS (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS k),
    th AS (SELECT k, (n * k) // 10 AS t FROM ks CROSS JOIN nd),
    fr AS (
      SELECT shingle, CAST(MIN(r) AS BIGINT) AS fr
      FROM s JOIN ranks USING (doc_id) GROUP BY shingle),
    pr AS (
      SELECT r, CAST(COUNT(*) AS BIGINT) AS np
      FROM s JOIN ranks USING (doc_id) GROUP BY r),
    vh AS (
      SELECT (10 * fr + n - 1) // n AS k, CAST(COUNT(*) AS BIGINT) AS nv
      FROM fr CROSS JOIN nd GROUP BY 1),
    ph AS (
      SELECT (10 * r + n - 1) // n AS k, CAST(SUM(np) AS BIGINT) AS npp
      FROM pr CROSS JOIN nd GROUP BY 1),
    cum AS (
      SELECT th.k, th.t,
             CAST(SUM(COALESCE(vh.nv, 0)) OVER (ORDER BY th.k
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS vocab_size,
             CAST(SUM(COALESCE(ph.npp, 0)) OVER (ORDER BY th.k
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_postings
      FROM th LEFT JOIN vh ON vh.k = th.k LEFT JOIN ph ON ph.k = th.k)
    SELECT k AS prefix_decile, t AS n_docs, n_postings, vocab_size,
           CAST(vocab_size * 1000000 // n_postings AS BIGINT) AS novelty_ppm
    FROM cum
    """,
    survey_ops=(),
    doc="Heaps'-law vocabulary growth: distinct word-3-gram vocabulary "
    "and cumulative postings at ten doc_id-ordered prefix checkpoints, "
    "plus novelty (vocab/postings) in ppm — the crawl-source diversity "
    "telemetry. Scale shape: first-occurrence rank per shingle is one "
    "vocab-grain MIN aggregate; per-rank posting counts are doc-grain; "
    "each row maps to its first decile with PURE ARITHMETIC "
    "(k = ceil(10*rank/N)) and the curve is a running sum over a 10-row "
    "histogram — no range join touches the vocab frame. The global "
    "row_number rank is the test-scale stand-in for prefix boundaries; "
    "at 100 TB the checkpoints are crawl-batch/chunk boundaries the "
    "ingest already materializes — no global sort.",
)
def corpus_heaps_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from .dedup import _shingle_rows

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    n_docs = docs.count()
    ranks = docs.select(
        "doc_id",
        F.row_number().over(Window.orderBy("doc_id")).cast("long").alias("r"),
    )
    s = _shingle_rows(spark, sf_dir).join(ranks, ["doc_id"])
    s = s.localCheckpoint()  # consumers: first-occurrence + per-rank counts
    fr = s.groupBy("shingle").agg(F.min("r").cast("long").alias("fr"))
    pr = s.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("np"))
    th = spark.range(1, 11).select(
        col("id").cast("long").alias("k"),
        F.expr(f"(CAST({n_docs} AS BIGINT) * id) div 10").alias("t"),
    )
    # decile ASSIGNMENT instead of a 10x theta join over the vocab frame:
    # k = ceil(10*rank/N) maps each shingle/rank to the first prefix that
    # contains it; the curve is a running sum over the 10-row histogram
    vh = fr.groupBy(
        F.expr(f"(10L * fr + {n_docs}L - 1L) div {n_docs}L").alias("k")
    ).agg(F.count(F.lit(1)).cast("long").alias("nv"))
    ph = pr.groupBy(
        F.expr(f"(10L * r + {n_docs}L - 1L) div {n_docs}L").alias("k")
    ).agg(F.sum("np").cast("long").alias("npp"))
    wcum = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        th.join(vh, ["k"], "left")
        .join(ph, ["k"], "left")
        .select(
            "k",
            "t",
            F.sum(F.coalesce("nv", F.lit(0))).over(wcum).cast("long").alias(
                "vocab_size"
            ),
            F.sum(F.coalesce("npp", F.lit(0))).over(wcum).cast("long").alias(
                "n_postings"
            ),
        )
    )
    return cum.select(
        col("k").alias("prefix_decile"),
        col("t").alias("n_docs"),
        "n_postings",
        "vocab_size",
        F.expr("CAST(vocab_size * 1000000 div n_postings AS BIGINT)").alias(
            "novelty_ppm"
        ),
    )


# --------------------------------------------------------------------------
# Maintained novelty curve — the streaming twin of corpus_heaps_curve:
# checkpoints are CRAWL BATCHES (the boundaries a 100 TB ingest already
# materializes), and every row is served from persisted ShingleVocabState
# instead of a corpus rescan. The marginal column (batch_novelty_ppm) is
# the operational stop-crawling signal corpus_heaps_curve's deciles only
# approximate after the fact.
# --------------------------------------------------------------------------
@register(
    "corpus_novelty_maintained",
    sql=f"""
    WITH {_td.gate_cap_cte()},
    d AS (SELECT doc_id, 1 + ((doc_id // 4) % 2) AS b, text
               FROM capped WHERE doc_id % 4 = 2),
    toks AS (SELECT doc_id, b,
                    list_filter(string_split(text, ' '),
                                w -> length(w) > 0) AS toks
             FROM d),
    s AS (
      SELECT DISTINCT doc_id, b, shingle FROM (
        SELECT doc_id, b,
               unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 2
                        THEN toks[i] || ' ' || toks[i + 1] || ' '
                             || toks[i + 2] END),
                 x -> x IS NOT NULL)) AS shingle
        FROM toks) t),
    fb AS (SELECT shingle, CAST(MIN(b) AS BIGINT) AS fb
           FROM s GROUP BY shingle),
    vh AS (SELECT fb AS k, CAST(COUNT(*) AS BIGINT) AS nv
           FROM fb GROUP BY fb),
    ph AS (SELECT b AS k, CAST(COUNT(*) AS BIGINT) AS np
           FROM s GROUP BY b),
    dh AS (SELECT b AS k, CAST(COUNT(*) AS BIGINT) AS nd
           FROM d GROUP BY b),
    ks AS (SELECT CAST(unnest(generate_series(1, 2)) AS BIGINT) AS k),
    cum AS (
      SELECT ks.k,
             CAST(SUM(COALESCE(dh.nd, 0)) OVER w AS BIGINT) AS n_docs,
             CAST(SUM(COALESCE(ph.np, 0)) OVER w AS BIGINT) AS n_postings,
             CAST(SUM(COALESCE(vh.nv, 0)) OVER w AS BIGINT) AS vocab_size,
             CAST(COALESCE(vh.nv, 0) AS BIGINT) AS n_new_shingles,
             CAST(COALESCE(ph.np, 0) AS BIGINT) AS bnp
      FROM ks LEFT JOIN vh ON vh.k = ks.k
              LEFT JOIN ph ON ph.k = ks.k
              LEFT JOIN dh ON dh.k = ks.k
      WINDOW w AS (ORDER BY ks.k ROWS UNBOUNDED PRECEDING))
    SELECT k AS batch_id, n_docs, n_postings, vocab_size,
           CASE WHEN n_postings = 0 THEN 0
                ELSE CAST(vocab_size * 1000000 // n_postings AS BIGINT)
           END AS novelty_ppm,
           n_new_shingles,
           CASE WHEN bnp = 0 THEN 0
                ELSE CAST(n_new_shingles * 1000000 // bnp AS BIGINT)
           END AS batch_novelty_ppm
    FROM cum
    """,
    survey_ops=(),
    doc="Maintained Heaps/novelty curve gate: the doc_id % 4 == 2 corpus "
    "slice streams in as TWO crawl batches ((doc_id div 4) % 2) folded into a "
    "persisted ShingleVocabState (operators/vocab_state.py — "
    "first-batch-stamped vocabulary + per-batch curve rows, crash-"
    "ordering contract with the curve as replay guard), then the whole "
    "curve is read from STATE. The oracle recomputes every checkpoint "
    "from raw text (first-occurrence batch per shingle), so hash "
    "equality proves the per-crawl folds recorded exactly the batch "
    "Heaps recompute — cumulative AND marginal novelty, the "
    "stop-crawling telemetry served without a corpus rescan.",
)
def corpus_novelty_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..session import gate_shuffle

    with gate_shuffle(spark):
        return _corpus_novelty_maintained_body(spark, sf_dir)


_CURVE_COLS = (
    "batch_id", "n_docs", "n_postings", "vocab_size", "novelty_ppm",
    "n_new_shingles", "batch_novelty_ppm",
)
_CURVE_DDL = (
    "batch_id long, n_docs long, n_postings long, vocab_size long, "
    "novelty_ppm long, n_new_shingles long, batch_novelty_ppm long"
)


def _corpus_novelty_maintained_body(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.vocab_state import ShingleVocabState

    from ..sources.testdata import load_capped_documents

    # fixed-size gate corpus (see pipeline_watermark_audit): the
    # maintained ≡ batch-Heaps contract is size-invariant, so the gate
    # folds the md5-capped sample and the oracle caps identically
    docs = (
        load_capped_documents(spark, sf_dir)
        .select("doc_id", "text")
        .filter(col("doc_id") % 4 == 2)
        .localCheckpoint()
    )
    base = tempfile.mkdtemp(prefix="novelty_state_gate_")
    try:
        st = ShingleVocabState(os.path.join(base, "nov"))
        for wm in (1, 2):
            st.fold(
                spark,
                docs.filter(F.expr("(doc_id div 4) % 2") == wm - 1),
                watermark=wm,
            )
        st.fold(
            spark, docs.filter(F.expr("(doc_id div 4) % 2") == 1), watermark=2
        )  # replay: watermark-guarded no-op
        # curve read served driver-side off the committed state files
        # (bounded: one row per batch) — no terminal Spark scan job,
        # the read-side mirror of the gate's driver-side writes
        from ..functions.localframe import local_df

        rows = [
            tuple(r[c] for c in _CURVE_COLS)
            for r in st.curve.fast_read_rows()
        ]
        rows.sort(key=lambda t: t[0])
        return local_df(spark, rows, _CURVE_DDL)
    finally:
        shutil.rmtree(base, ignore_errors=True)
