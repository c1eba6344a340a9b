"""Lexical retrieval plane: fixed-point BM25 ranking over the documents
corpus — the sparse-retrieval counterpart of the dense plane
(plans/similarity.py knn_* / chunk_retrieval_ivf) and the scoring model the
hybrid RRF query's lexical path approximates with plain IDF.

The whole scorer is integer arithmetic (ppm fixed point) so the DuckDB
oracle hash-verifies ranks AND scores:

- ``idf_ppm  = ((N - df) * 1e6) // (df + 1) + 1e6`` — the Robertson
  ``(N - df + 0.5) / (df + 0.5)`` shape rationalized to integers; strictly
  positive, monotone decreasing in df.
- ``K_ppm    = k1 * (1 - b + b * dl/avgdl)`` in ppm with k1 = 1.2,
  b = 0.75 (the classic defaults).
- ``tf_sat   = tf * (k1 + 1) / (tf + K)`` in ppm — the BM25 saturation.
- ``score_fp = Σ_terms (idf_ppm * tf_sat_ppm) // 1e6``.

Headroom: idf_ppm ≤ N·5e5 and tf_sat_ppm ≤ 2.2e6, so the per-term product
stays inside int64 up to N ≈ 4e6 documents per scored corpus; the
``dl * 1e12`` term in K_ppm independently bounds document length at
dl < 9.2e6 tokens. Beyond either bound, swap the accumulator to
DECIMAL(38,0) (or split the length ratio into quotient·1e6 + scaled
remainder) — the spec (floor division, positive operands) is unchanged.
All divisions have nonnegative operands, so Spark's truncating ``div``
and DuckDB's flooring ``//`` agree exactly.

Scale shape: the corpus contributes one (doc, term) tf aggregate and one
doc-length aggregate, both map-side combinable; query term sets are
probe-sized broadcasts; candidate generation joins query terms against the
tf table with stop terms (df > N/10 + 1) excluded, so the term-join fan-out
is df-bounded — never query × corpus. This is the same rare-first pruning
as the SSJoin prefix filter and the RRF lexical path.

Reference parity: the reference's API tier does name/term search with
PostgreSQL trigram + ts_rank over inventory tables
(src/be_db_gateway.erl:115, migrations add GIN indexes); BM25 over the
maintained postings state (operators/lexical_index.py) is the same
"search the maintained index, never rescan the lake" contract expressed
as the standard ranking function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..sources.testdata import load_table
from .registry import register

_BM25_K1 = 1_200_000  # k1 = 1.2 ppm
_BM25_B = 750_000  # b = 0.75 ppm
_BM25_QMOD = 97  # query docs: doc_id % QMOD == 0 (known-item probes)
_BM25_K = 10  # top-k per query
_BM25_GATE_QMOD = 40  # maintained gate: denser probes over the %4 scope


def term_freq_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) over word-3-gram shingle terms WITH multiplicity.

    Unigram df carries no signal on this corpus (30-word vocabulary, every
    token near-ubiquitous) — the same reason the hybrid-RRF lexical path
    and the whole Jaccard family shingle first. Unlike the dedup family's
    shingle builder this one keeps MULTIPLICITY (no array_distinct): tf is
    what BM25's saturation term saturates over."""
    rows = docs.select(
        "doc_id",
        F.expr("filter(split(text, ' '), w -> length(w) > 0)").alias("toks"),
    ).select(
        "doc_id",
        F.explode(
            F.expr(
                "filter(transform(toks, (w, i) ->"
                " IF(i <= size(toks) - 3,"
                " concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]), NULL)),"
                " s -> s IS NOT NULL)"
            )
        ).alias("term"),
    )
    return rows.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("long").alias("tf")
    )


def bm25_rank_frames(
    tf: DataFrame,
    qmod: int = _BM25_QMOD,
    k: int = _BM25_K,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Rank the corpus against every query doc (doc_id % qmod == 0) with
    fixed-point BM25 over a (doc_id, term, tf) frame.

    Shared by the batch query (tf computed from the corpus) and the
    maintained-index serving path (tf AND dl read from LexicalIndex
    state), so the two paths agree by construction — only the provenance
    of the frames differs. ``dl``: a precomputed (doc_id, dl) frame; when
    None it derives from ``tf`` (the self-contained batch form).

    ONE lazy plan: corpus stats (n_docs, avgdl) ride a broadcast 1-row
    singleton instead of a driver collect, so the maintained serving
    path can run inside foreachBatch without driver round trips, and an
    empty corpus/index yields an empty ranked frame instead of a crash
    (the stats row guards n = 0 with a 1-ppm avgdl sentinel that no
    candidate row ever reads — qt is empty when tf is).
    """
    tf = tf.localCheckpoint(eager=False)  # reused: dl, dfreq, qt, corpus side
    if dl is None:
        dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("__tot"),
    ).select(
        "__n",
        F.expr(
            "IF(__n > 0, (__tot * 1000000L) div __n, 1L)"
        ).alias("__avgdl_ppm"),
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    informative = dfreq.crossJoin(F.broadcast(stats)).filter(
        col("df") <= F.expr("__n div 10L + 1L")
    )
    qt = (
        tf.filter(col("doc_id") % qmod == 0)
        .select(col("doc_id").alias("qid"), "term")
        .distinct()
    )
    cand = (
        tf.join(F.broadcast(qt.join(informative, ["term"])), ["term"])
        .join(dl, ["doc_id"])
        .withColumn(
            "__k_ppm",
            F.expr(
                f"({_BM25_K1}L * (1000000L - {_BM25_B}L"
                f" + ({_BM25_B}L * ((dl * 1000000000000L) div __avgdl_ppm))"
                f" div 1000000L)) div 1000000L"
            ),
        )
        .withColumn(
            "__tf_sat_ppm",
            F.expr(
                f"(tf * {_BM25_K1 + 1_000_000}L * 1000000L)"
                f" div (tf * 1000000L + __k_ppm)"
            ),
        )
        .withColumn(
            "__idf_ppm",
            F.expr("(((__n - df) * 1000000L) div (df + 1L)) + 1000000L"),
        )
    )
    scored = cand.groupBy("qid", "doc_id").agg(
        F.sum(F.expr("(__idf_ppm * __tf_sat_ppm) div 1000000L"))
        .cast("long")
        .alias("score_fp")
    )
    w = Window.partitionBy("qid").orderBy(col("score_fp").desc(), "doc_id")
    return (
        scored.withColumn("bm25_rank", F.row_number().over(w).cast("long"))
        .filter(col("bm25_rank") <= k)
    )


def _bm25_sql(where: str, qmod: int, k: int) -> str:
    """DuckDB oracle mirroring bm25_rank_frames exactly (floor division on
    strictly nonnegative operands == Spark's truncating div)."""
    return f"""
    WITH tf AS (
      SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (
        SELECT doc_id,
               unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 2
                        THEN toks[i] || ' ' || toks[i + 1] || ' '
                             || toks[i + 2] END),
                 s -> s IS NOT NULL)) AS term
        FROM (
          SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             w -> length(w) > 0) AS toks
          FROM documents {where}) t) z
      GROUP BY doc_id, term),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
           FROM tf GROUP BY doc_id),
    stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     (CAST(SUM(dl) AS BIGINT) * 1000000)
                       // CAST(COUNT(*) AS BIGINT) AS avgdl_ppm
              FROM dl),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
              FROM tf GROUP BY term),
    informative AS (SELECT term, df FROM dfreq, stats
                    WHERE df <= n // 10 + 1),
    qt AS (SELECT DISTINCT doc_id AS qid, term FROM tf
           WHERE doc_id % {qmod} = 0),
    scored AS (
      SELECT qid, t.doc_id,
             CAST(SUM(
               (((n - df) * 1000000) // (df + 1) + 1000000)
               * ((t.tf * {_BM25_K1 + 1_000_000} * 1000000)
                  // (t.tf * 1000000
                      + ({_BM25_K1} * (1000000 - {_BM25_B}
                           + ({_BM25_B} * ((d.dl * 1000000000000)
                                           // avgdl_ppm)) // 1000000))
                        // 1000000))
               // 1000000) AS BIGINT) AS score_fp
      FROM qt
      JOIN informative i USING (term)
      JOIN tf t USING (term)
      JOIN dl d ON d.doc_id = t.doc_id
      CROSS JOIN stats
      GROUP BY qid, t.doc_id)
    SELECT qid, doc_id, score_fp,
           CAST(ROW_NUMBER() OVER (PARTITION BY qid
                  ORDER BY score_fp DESC, doc_id) AS BIGINT) AS bm25_rank
    FROM scored QUALIFY bm25_rank <= {k}
    """


# --------------------------------------------------------------------------
# Language-model quality telemetry: trigram stupid-backoff next-token
# prediction, evaluated as argmax ACCURACY so the whole metric is integer
# counting (no float probabilities to hash-diverge). Train = even doc_ids,
# heldout = odd; for each heldout trigram occurrence the model predicts the
# next token from the deepest available context:
#   level 3: argmax over train trigram counts of the (w1, w2) context,
#   level 2: argmax over train bigram continuations of w2,
#   level 1: the global train unigram argmax.
# Ties break (count DESC, token ASC) — deterministic in both engines. This
# is the eval loop a data pipeline runs to compare corpus mixes: a better
# mix raises heldout next-token accuracy; the per-level split shows how
# often the model even HAS the context (coverage drives the backoff rate).
# Scale shape: train tables are corpus-sized aggregates reduced to one
# argmax row per context (window row_number), heldout scoring is two
# context-key hash joins + one broadcast scalar — never corpus x vocab.
# --------------------------------------------------------------------------

_LM_TRI_SQL = """
      SELECT doc_id,
             string_split(tg, ' ')[1] AS w1,
             string_split(tg, ' ')[2] AS w2,
             string_split(tg, ' ')[3] AS w3
      FROM (
        SELECT doc_id,
               unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 2
                        THEN toks[i] || ' ' || toks[i + 1] || ' '
                             || toks[i + 2] END),
                 s -> s IS NOT NULL)) AS tg
        FROM (
          SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             w -> length(w) > 0) AS toks
          FROM documents) t) u
"""


@register(
    "lm_backoff_next_token_eval",
    sql=f"""
    WITH tri AS ({_LM_TRI_SQL}),
    train AS (SELECT w1, w2, w3 FROM tri WHERE doc_id % 2 = 0),
    held AS (SELECT w1, w2, w3 FROM tri WHERE doc_id % 2 = 1),
    c3 AS (SELECT w1, w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM train GROUP BY w1, w2, w3),
    best3 AS (
      SELECT w1, w2, w3 AS pred3 FROM c3
      QUALIFY ROW_NUMBER() OVER (PARTITION BY w1, w2
                                 ORDER BY cnt DESC, w3) = 1),
    c2 AS (SELECT w2, w3, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM train GROUP BY w2, w3),
    best2 AS (
      SELECT w2, w3 AS pred2 FROM c2
      QUALIFY ROW_NUMBER() OVER (PARTITION BY w2
                                 ORDER BY cnt DESC, w3) = 1),
    c1 AS (SELECT w3, CAST(COUNT(*) AS BIGINT) AS cnt FROM train GROUP BY w3),
    best1 AS (
      SELECT w3 AS pred1 FROM c1
      QUALIFY ROW_NUMBER() OVER (ORDER BY cnt DESC, w3) = 1),
    scored AS (
      SELECT CAST(CASE WHEN pred3 IS NOT NULL THEN 3
                       WHEN pred2 IS NOT NULL THEN 2
                       ELSE 1 END AS BIGINT) AS backoff_level,
             CASE WHEN COALESCE(pred3, pred2, pred1) = held.w3
                  THEN 1 ELSE 0 END AS ok
      FROM held
      LEFT JOIN best3 USING (w1, w2)
      LEFT JOIN best2 USING (w2)
      CROSS JOIN best1)
    SELECT backoff_level,
           CAST(COUNT(*) AS BIGINT) AS n_cases,
           CAST(SUM(ok) AS BIGINT) AS n_correct,
           (CAST(SUM(ok) AS BIGINT) * 1000000)
             // CAST(COUNT(*) AS BIGINT) AS acc_ppm
    FROM scored
    GROUP BY backoff_level
    """,
    survey_ops=(),
    doc="Trigram stupid-backoff next-token eval: even doc_ids train the "
    "count tables, odd doc_ids are scored by argmax prediction at the "
    "deepest seen context (trigram -> bigram-continuation -> global "
    "unigram), ties (count DESC, token ASC). Output = cases/correct/"
    "accuracy-ppm per backoff level, pure integer counting. The corpus-mix "
    "eval loop: accuracy moves with mix quality, the level split exposes "
    "context coverage. Train tables reduce to one argmax row per context "
    "before any heldout join; heldout scoring is context-key hash joins "
    "plus one broadcast scalar.",
)
def lm_backoff_next_token_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return lm_backoff_eval_frames(docs)


def lm_backoff_eval_frames(docs: DataFrame) -> DataFrame:
    """Core of lm_backoff_next_token_eval over any (doc_id, text) frame —
    factored out so tests can force every backoff level with synthetic
    vocabularies (tests/test_lexical_index.py)."""
    tri = (
        docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), w -> length(w) > 0)").alias("toks"),
        )
        .filter(F.expr("size(toks) >= 3"))
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(2, size(toks) - 1), i ->"
                    " struct(toks[i - 2] AS w1, toks[i - 1] AS w2,"
                    " toks[i] AS w3))"
                )
            ).alias("g"),
        )
        .select("doc_id", "g.w1", "g.w2", "g.w3")
    )
    # lazy checkpoint (round 14): tri feeds the count-table lineage and
    # the heldout side; eager=False keeps materialize-once while folding
    # the materialization into the first consumer's job
    tri = tri.localCheckpoint(eager=False)
    train = tri.filter(col("doc_id") % 2 == 0).select("w1", "w2", "w3")
    held = tri.filter(col("doc_id") % 2 == 1).select("w1", "w2", "w3")
    c3 = train.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    # c2/c1 re-aggregate c3 instead of the full trigram occurrence stream
    # (round 14, guide §2.3 "aggregate before you shuffle"): COUNT over
    # occurrences == SUM of the trigram counts grouped coarser, exactly —
    # so the two extra full-stream shuffles shrink to distinct-trigram-
    # sized re-aggregations of the checkpointed c3. Bench-neutral at
    # sf0.1 (trigram table is small); at corpus scale the occurrence
    # stream is the term that grows while distinct trigrams saturate.
    c3 = c3.localCheckpoint(eager=False)
    w3w = Window.partitionBy("w1", "w2").orderBy(col("cnt").desc(), "w3")
    best3 = (
        c3.withColumn("__rn", F.row_number().over(w3w))
        .filter(col("__rn") == 1)
        .select("w1", "w2", col("w3").alias("pred3"))
    )
    c2 = c3.groupBy("w2", "w3").agg(F.sum("cnt").cast("long").alias("cnt"))
    w2w = Window.partitionBy("w2").orderBy(col("cnt").desc(), "w3")
    best2 = (
        c2.withColumn("__rn", F.row_number().over(w2w))
        .filter(col("__rn") == 1)
        .select("w2", col("w3").alias("pred2"))
    )
    c1 = c2.groupBy("w3").agg(F.sum("cnt").cast("long").alias("cnt"))
    w1w = Window.orderBy(col("cnt").desc(), "w3")
    best1 = (
        c1.withColumn("__rn", F.row_number().over(w1w))
        .filter(col("__rn") == 1)
        .select(col("w3").alias("pred1"))
    )
    scored = (
        # best3 is context-grain (vocab²-bounded) — no forced broadcast;
        # AQE picks BHJ when it fits, SMJ on the context key when it won't
        held.join(best3, ["w1", "w2"], "left")
        .join(F.broadcast(best2), ["w2"], "left")
        .crossJoin(F.broadcast(best1))
        .select(
            F.expr(
                "CAST(CASE WHEN pred3 IS NOT NULL THEN 3"
                " WHEN pred2 IS NOT NULL THEN 2 ELSE 1 END AS BIGINT)"
            ).alias("backoff_level"),
            F.expr(
                "CASE WHEN coalesce(pred3, pred2, pred1) = w3"
                " THEN 1 ELSE 0 END"
            ).alias("ok"),
        )
    )
    return scored.groupBy("backoff_level").agg(
        F.count(F.lit(1)).cast("long").alias("n_cases"),
        F.sum("ok").cast("long").alias("n_correct"),
        F.expr(
            "(CAST(SUM(ok) AS BIGINT) * 1000000L) div CAST(COUNT(*) AS BIGINT)"
        ).alias("acc_ppm"),
    )


@register(
    "retrieval_bm25_topk",
    sql=_bm25_sql("", _BM25_QMOD, _BM25_K),
    survey_ops=(),
    doc="BM25 top-k lexical retrieval in ppm fixed point (k1=1.2, b=0.75, "
    "rationalized Robertson idf): every doc_id % 97 == 0 document is a "
    "known-item probe whose term set ranks the corpus; stop terms "
    "(df > N/10 + 1) are excluded from candidate generation so term-join "
    "fan-out is df-bounded. Integer scores make the hash cover the full "
    "scoring arithmetic, not just the ordering. Scale shape: one "
    "map-side-combinable (doc, term) tf aggregate over the corpus, "
    "broadcast probe-term frame, shuffle only on term and (qid, doc).",
)
def retrieval_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_rank_frames(term_freq_rows(docs))


@register(
    "retrieval_bm25_maintained",
    sql=_bm25_sql("WHERE doc_id % 4 = 0", _BM25_GATE_QMOD, _BM25_K),
    survey_ops=(),
    doc="Maintained-postings BM25 gate: the doc_id % 4 == 0 corpus slice "
    "is ingested in TWO batches into a persisted LexicalIndex "
    "(operators/lexical_index.py — watermark-guarded postings + doc-length "
    "state), then ranked by reading the MAINTAINED postings — never the "
    "corpus — through the same bm25_rank_frames scorer as the batch "
    "query. The oracle recomputes BM25 from the raw slice, so a hash "
    "match proves the incrementally-built index state is exactly the "
    "batch tf table. This is the serving contract of a streaming search "
    "index at 100 TB: per-crawl delta maintenance, query-time work "
    "bounded by postings of the probe terms.",
)
def retrieval_bm25_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from ..operators.lexical_index import LexicalIndex

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(col("doc_id") % 4 == 0)
    )
    base = tempfile.mkdtemp(prefix="lex_index_gate_")
    try:
        ix = LexicalIndex(os.path.join(base, "lex"))
        b1 = docs.filter(F.expr("(doc_id div 4) % 2 = 0"))
        b2 = docs.filter(F.expr("(doc_id div 4) % 2 = 1"))
        for wm, b in ((1, b1), (2, b2)):
            ix.upsert(spark, b, watermark=wm)
        out = ix.bm25_topk(spark, qmod=_BM25_GATE_QMOD, k=_BM25_K)
        return out.localCheckpoint()
    finally:
        shutil.rmtree(base, ignore_errors=True)


# --------------------------------------------------------------------------
# Positional phrase search — the inverted-index operation BM25 cannot
# answer: exact phrase occurrence via positional postings. Probe phrases
# are the first 5 words of every doc_id % 250 == 0 document (known-item:
# each phrase matches its own doc at position 1, plus every verbatim
# copy elsewhere). The match is the classic positional-postings
# adjacency chain: candidates from the first term's postings, each
# subsequent term verified at pos + i.
# --------------------------------------------------------------------------
_PHRASE_QMOD = 250
_PHRASE_LEN = 5


def _phrase_sql() -> str:
    joins = "\n".join(
        f"    JOIN post p{i} ON p{i}.doc_id = p0.doc_id"
        f" AND p{i}.pos = p0.pos + {i} AND p{i}.term = q.t{i}"
        for i in range(1, _PHRASE_LEN)
    )
    tsel = ", ".join(f"toks[{i + 1}] AS t{i}" for i in range(_PHRASE_LEN))
    return f"""
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '),
                                 w -> length(w) > 0) AS toks
      FROM documents),
    post AS (
      SELECT doc_id, CAST(unnest(range(1, len(toks) + 1)) AS BIGINT) AS pos,
             unnest(toks) AS term
      FROM toks),
    qp AS (
      SELECT doc_id AS qid, {tsel}
      FROM toks WHERE doc_id % {_PHRASE_QMOD} = 0
                  AND len(toks) >= {_PHRASE_LEN})
    SELECT q.qid, p0.doc_id, p0.pos AS match_pos
    FROM qp q
    JOIN post p0 ON p0.term = q.t0
{joins}
    """


@register(
    "doc_phrase_search",
    sql=_phrase_sql(),
    survey_ops=(),
    doc=f"Positional phrase search: 5-word probe phrases (the opening of "
    f"every doc_id % {_PHRASE_QMOD} == 0 document) matched against "
    "positional postings via the adjacency chain — candidates from the "
    "first term's postings, terms 2..5 verified at pos+i with (doc, pos, "
    "term) equi-joins. Known-item by construction (each phrase hits its "
    "own doc at position 1); extra hits are verbatim copies. Scale "
    "shape: each verification join keys on (doc_id, pos, term) — "
    "candidate lists shrink geometrically per hop (measured: the "
    "synthetic 30-word vocabulary cuts ~1/30 per term); probe phrase "
    "frames are broadcast; the postings table is built once and reused "
    "across all hops via localCheckpoint.",
)
def doc_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("filter(split(text, ' '), w -> length(w) > 0)").alias("toks"),
    )
    docs = docs.localCheckpoint()  # consumers: postings + probe phrases
    post = docs.select(
        "doc_id",
        F.posexplode("toks").alias("i0", "term"),
    ).select("doc_id", (col("i0") + 1).cast("long").alias("pos"), "term")
    post = post.localCheckpoint()  # reused by all 5 hops
    qp = docs.filter(
        (col("doc_id") % _PHRASE_QMOD == 0)
        & (F.size("toks") >= _PHRASE_LEN)
    ).select(
        col("doc_id").alias("qid"),
        *[F.expr(f"toks[{i}]").alias(f"t{i}") for i in range(_PHRASE_LEN)],
    )
    cand = post.join(
        F.broadcast(qp.select("qid", "t0")), col("term") == col("t0")
    ).select("qid", "doc_id", "pos")
    for i in range(1, _PHRASE_LEN):
        pi = post.select(
            col("doc_id").alias(f"__d{i}"),
            col("pos").alias(f"__p{i}"),
            col("term").alias(f"__t{i}"),
        )
        cand = (
            cand.join(F.broadcast(qp.select("qid", f"t{i}")), ["qid"])
            .join(
                pi,
                (col(f"__d{i}") == col("doc_id"))
                & (col(f"__p{i}") == col("pos") + i)
                & (col(f"__t{i}") == col(f"t{i}")),
            )
            .select("qid", "doc_id", "pos")
        )
    return cand.select("qid", "doc_id", col("pos").alias("match_pos"))
