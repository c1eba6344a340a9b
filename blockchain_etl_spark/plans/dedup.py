"""Deduplication plans — training-data pipeline operators over `documents`:
exact (hash-groupBy), n-gram Jaccard near-dup, and MinHash+LSH candidates.

MinHash portability note: the 8 hash functions are the 8-hex-char slices
of ``md5('0:'||shingle)`` and ``md5('1:'||shingle)``; each signature element
is the lexicographic MIN of one slice — identical in any engine with md5,
no integer hex-parsing needed, and only two digests per shingle. Bands are concatenations of adjacent signature
elements; candidate pairs collide on at least one band — the standard
shingle→minhash→band→bucket-join pipeline, all expressed as joins and
hash aggregates that scale out (shuffle keys: shingle, then band value).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..sources.testdata import load_table
from .registry import register

_NUM_HASHES = 8
_BAND_SIZE = 2  # → 4 bands

# 60-bit signature (15 md5 hex chars fit in a signed BIGINT on both
# engines), 4 bands x 15 bits. Wide bands matter at scale: on clustered
# vocabularies an 8-bit band collides for ~every pair (an all-pairs blowup
# in disguise); 15-bit bands keep the candidate set near-linear.
_SIMHASH_BITS = 60
_SIMHASH_BANDS = 4
_SIMHASH_MAX_HAMMING = 6

# word 3-gram shingles of the space-tokenized text (Spark: 0-based lambda
# index; DuckDB: 1-based) — each engine builds the same shingle strings.
_SHINGLES_SPARK = """
    array_distinct(filter(
      transform(toks, (w, i) ->
        IF(i <= size(toks) - 3,
           concat_ws(' ', toks[i], toks[i + 1], toks[i + 2]), NULL)),
      s -> s IS NOT NULL))
"""

_SHINGLE_ROWS_SQL = """
      SELECT DISTINCT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_filter(
                 list_transform(toks, (w, i) ->
                   CASE WHEN i <= len(toks) - 2
                        THEN toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] END),
                 s -> s IS NOT NULL)) AS shingle
        FROM (
          SELECT doc_id,
                 list_filter(string_split(text, ' '), w -> length(w) > 0) AS toks
          FROM documents
        ) t
      ) u
"""


def _shingle_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shingle_rows_from_text(load_table(spark, sf_dir, "documents"))

def _shingle_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed (doc_id, shingles) distinct-shingle arrays — the ONE
    construction shared by every dedup query that both explodes shingle
    rows AND verifies candidate pairs against the array form
    (dfcapped, prefix filter, containment)."""
    docs = load_table(spark, sf_dir, "documents")
    arrays = docs.selectExpr(
        "doc_id",
        "filter(split(text, ' '), w -> length(w) > 0) AS toks",
    ).select("doc_id", F.expr(_SHINGLES_SPARK).alias("shingles"))
    return arrays.localCheckpoint()  # consumers: explode side + verify side


def _verify_intersections(cand: DataFrame, arrays: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidates -> exact (doc_a, doc_b, intersection,
    na, nb) via one array_intersect over the joined shingle arrays: the
    intermediate that grows with candidate count is |cand| array-pair
    rows, never a |cand| x shingles/doc exploded re-aggregate."""
    # Spread the candidate frame across the session's cores BEFORE the
    # verify joins: cand is byte-tiny (two longs/row), so AQE's
    # size-based coalescing collapses it to ~one partition — and the
    # array_intersect over two ~80-element string arrays per row, the
    # REAL work of the verify, then runs serially (guide §2: the
    # compute-amplifying stage after a coalesce). The exchange moved
    # here is 16 bytes/row — linear, paid once; measured min-of-4 at
    # sf0.1 it cuts dedup_jaccard_prefix_filter 5.3 s -> 3.0-3.4 s.
    spark = cand.sparkSession
    cand = cand.repartition(spark.sparkContext.defaultParallelism)
    return (
        cand.join(
            arrays.select(col("doc_id").alias("doc_a"), col("shingles").alias("sha")),
            ["doc_a"],
        )
        .join(
            arrays.select(col("doc_id").alias("doc_b"), col("shingles").alias("shb")),
            ["doc_b"],
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("sha", "shb")).cast("long").alias(
                "intersection"
            ),
            F.size("sha").cast("long").alias("na"),
            F.size("shb").cast("long").alias("nb"),
        )
    )



@register(
    "dedup_exact",
    sql="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(text)
    """,
    survey_ops=("X2",),
    doc="Exact deduplication: hash-groupBy on content, keep lowest id as "
    "canonical. One shuffle on the content hash; at 100 TB the md5 is "
    "computed map-side and only (hash, id) pairs move.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5("text").alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


@register(
    "dedup_ngram_jaccard",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersection
      FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b, intersection,
           CAST(intersection AS DOUBLE) / (za.n + zb.n - intersection) AS jaccard
    FROM pairs
    JOIN sz za ON za.doc_id = doc_a
    JOIN sz zb ON zb.doc_id = doc_b
    WHERE CAST(intersection AS DOUBLE) / (za.n + zb.n - intersection) >= 0.012
    """,
    survey_ops=(),
    doc="Near-duplicate detection via word-3-gram Jaccard: distinct "
    "(doc, shingle) rows, self-join on shingle, |A∩B|/|A∪B| filter. "
    "Shuffle key is the shingle — skew from stop-shingles is the known "
    "hazard at scale; the MinHash/LSH variant below is the scale path.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # eager materialization: three consumers (sizes + two join sides);
    # an unmaterialized .cache() would race all of them into computing
    # the shingle pipeline concurrently on first run.
    s = _shingle_rows(spark, sf_dir).localCheckpoint()
    sz = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(col("doc_id").alias("doc_a"), "shingle")
    b = s.select(col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        a.join(b, ["shingle"])
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    za = sz.select(col("doc_id").alias("doc_a"), col("n").alias("na"))
    zb = sz.select(col("doc_id").alias("doc_b"), col("n").alias("nb"))
    jac = col("intersection").cast("double") / (
        col("na") + col("nb") - col("intersection")
    )
    return (
        pairs.join(za, ["doc_a"])
        .join(zb, ["doc_b"])
        .withColumn("jaccard", jac)
        .filter(col("jaccard") >= 0.012)
        .select("doc_a", "doc_b", "intersection", "jaccard")
    )


# Document-frequency cap for candidate generation: a shingle seen in more
# than this many documents is excluded from the candidate self-join (it
# still counts toward the exact Jaccard of any pair found). Caps the
# per-shingle pair fan-out at C(cap, 2) — the quadratic stop-shingle
# blowup of the naive self-join cannot happen, at the cost of missing
# pairs whose ONLY shared shingles are stop-shingles (which are exactly
# the pairs a near-dup detector should not report anyway).
_JACCARD_DF_CAP = 8


@register(
    "dedup_jaccard_dfcapped",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    rare AS (
      SELECT doc_id, shingle FROM s
      WHERE shingle IN (
        SELECT shingle FROM s GROUP BY shingle
        HAVING COUNT(*) <= {_JACCARD_DF_CAP})
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS intersection
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
    )
    SELECT i.doc_a, i.doc_b, i.intersection,
           CAST(i.intersection AS DOUBLE) / (za.n + zb.n - i.intersection) AS jaccard
    FROM inter i
    JOIN sz za ON za.doc_id = i.doc_a
    JOIN sz zb ON zb.doc_id = i.doc_b
    WHERE CAST(i.intersection AS DOUBLE) / (za.n + zb.n - i.intersection) >= 0.012
    """,
    survey_ops=(),
    doc="Skew-safe n-gram Jaccard: candidate pairs come only from shingles "
    f"with document frequency <= {_JACCARD_DF_CAP}; the exact Jaccard of "
    "each candidate is then verified over ALL its shingles. This is the "
    "production form of the shingle self-join — per-shingle pair fan-out "
    "is bounded by C(cap,2), so the stop-shingle quadratic blowup the "
    "naive baseline suffers at 100 TB is structurally impossible. Shuffle "
    "keys: shingle (df + candidates), then (doc_a, doc_b) (verify).",
)
def dedup_jaccard_dfcapped(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Per-doc shingle ARRAYS are computed map-side (array_distinct of the
    # slide transform — zero shuffle); the exploded row form feeds the df
    # count + candidate join, the array form feeds the verify. Verifying
    # with size(array_intersect(..)) joins |cand| rows on doc ids instead
    # of fanning every candidate back out to |cand| x ~shingles/doc rows
    # and re-aggregating them — comparable wall-clock at test SF, but the
    # intermediate that grows with candidate count at 100 TB is |cand|
    # array-pair rows, not a |cand| x shingles/doc exploded aggregate.
    # eager materialization of the shared frames (same rationale as
    # dedup_ngram_jaccard): `arrays` feeds the exploded rows AND
    # doc_stats; `s` feeds three branches (df count, rare candidates,
    # frequent sets); `dfc` feeds the rare AND frequent filters. Without
    # the checkpoints every branch recomputes the document scan + shingle
    # slide transform from scratch inside one DAG. (_shingle_arrays
    # itself checkpoints — no second checkpoint here.)
    arrays = _shingle_arrays(spark, sf_dir)
    s = arrays.select("doc_id", F.explode("shingles").alias("shingle"))
    # df-count FIRST, collect_list ONLY for rare shingles: a stop-shingle
    # appearing in millions of docs must never reach a collect_list
    # aggregation buffer (filtering size(ids) AFTER collecting would
    # materialize the full posting list inside one buffer before dropping
    # it — the exact skew/OOM blowup the cap exists to prevent). The count
    # aggregate is map-side-combinable (one row per shingle per partition
    # crosses the wire); joining s against the surviving rare-shingle set
    # leaves every collect_list group bounded at <= cap rows by
    # construction. Plan-gated in tests/test_plans.py: no size(ids)
    # post-filter may reappear downstream of the collect.
    dfc = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("df")).localCheckpoint()
    rare = dfc.filter(col("df") <= _JACCARD_DF_CAP).select("shingle")
    # Verification via the rare/frequent split: intersection(a, b) =
    # |shared rare shingles| + |shared FREQUENT shingles|. The rare half
    # falls out of the pair expansion itself (one pair row per shared rare
    # shingle — count instead of distinct); the frequent half intersects
    # per-doc FREQUENT-shingle sets, which are tiny (few distinct
    # stop-shingles exist by definition — that is what high df means), so
    # the verify joins ship (n, small set) per doc instead of the full
    # ~80-element shingle arrays. Same exact Jaccard, same oracle.
    rare_pairs = (
        s.join(rare, ["shingle"])
        .groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ids"))
        .select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ids, a -> transform(ids,"
                    " b -> struct(a AS doc_a, b AS doc_b)))),"
                    " p -> p.doc_a < p.doc_b)"
                )
            ).alias("p")
        )
        .select(col("p.doc_a").alias("doc_a"), col("p.doc_b").alias("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("rare_i"))
    )
    # distinct frequent shingles: dimension-sized (stop-shingle vocabulary),
    # broadcast so the frequent-set extraction never shuffles shingle rows
    freq = dfc.filter(col("df") > _JACCARD_DF_CAP).select("shingle")
    freq_sets = (
        s.join(F.broadcast(freq), ["shingle"])
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_set("shingle")).alias("freq_sh"))
    )
    doc_stats = (
        arrays.select("doc_id", F.size("shingles").alias("n"))
        .join(freq_sets, ["doc_id"], "left")
        .select(
            "doc_id",
            "n",
            F.coalesce("freq_sh", F.expr("CAST(array() AS array<string>)")).alias(
                "freq_sh"
            ),
        )
    )
    verified = (
        rare_pairs.join(
            doc_stats.select(
                col("doc_id").alias("doc_a"),
                col("n").alias("na"),
                col("freq_sh").alias("fa"),
            ),
            ["doc_a"],
        )
        .join(
            doc_stats.select(
                col("doc_id").alias("doc_b"),
                col("n").alias("nb"),
                col("freq_sh").alias("fb"),
            ),
            ["doc_b"],
        )
        .select(
            "doc_a",
            "doc_b",
            (col("rare_i") + F.size(F.array_intersect("fa", "fb")))
            .cast("long")
            .alias("intersection"),
            "na",
            "nb",
        )
    )
    jac = col("intersection").cast("double") / (
        col("na") + col("nb") - col("intersection")
    )
    return (
        verified.withColumn("jaccard", jac)
        .filter(col("jaccard") >= 0.012)
        .select("doc_a", "doc_b", "intersection", "jaccard")
    )


@register(
    "dedup_minhash_lsh",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sig AS (
      SELECT doc_id, r.k AS k,
             MIN(substr(CASE WHEN r.k < 4 THEN h0 ELSE h1 END,
                        1 + 8 * (r.k % 4), 8)) AS mh
      FROM (SELECT doc_id, md5('0:' || shingle) AS h0,
                   md5('1:' || shingle) AS h1 FROM s) z
      CROSS JOIN range({_NUM_HASHES}) r(k)
      GROUP BY doc_id, r.k
    ),
    bands AS (
      SELECT doc_id, band_id, string_agg(mh, '|' ORDER BY k) AS band_val
      FROM (SELECT doc_id, k, CAST(k // {_BAND_SIZE} AS BIGINT) AS band_id, mh FROM sig) z
      GROUP BY doc_id, band_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           COUNT(*) AS bands_hit
    FROM bands a
    JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    """,
    survey_ops=(),
    doc="MinHash + LSH near-dup candidates: 8 md5-string min-hashes over "
    "word-3-gram shingles, banded 4×2; documents colliding on any band "
    "become candidate pairs. Scale shape: shuffle on (band_id, band_val) "
    "bucket key only — never a full pairwise join.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # cache: |docs| rows, but lineage covers the shingle hashing — both
    # sides of the band self-join reuse it instead of recomputing.
    sig = minhash_signatures(_shingle_rows(spark, sf_dir)).localCheckpoint()
    return lsh_candidate_pairs(band_rows(sig))


def minhash_signatures(shingles: DataFrame) -> DataFrame:
    """(doc_id, shingle) rows → (doc_id, mh0..mh7) MinHash signatures.

    All k hash values are computed per shingle row (one projection, no
    seed explode), then the signature is k element-wise MIN aggregates in
    a single groupBy — one shuffle over |shingle rows|, not k×|rows|.
    Two md5 digests per shingle, sliced into 8-hex-char (32-bit) hash
    values — 4x fewer digest computations than one md5 per hash function,
    with independent slices preserving the minhash property.
    """
    hashes = shingles.select(
        "doc_id",
        F.md5(F.concat(F.lit("0:"), col("shingle"))).alias("b0"),
        F.md5(F.concat(F.lit("1:"), col("shingle"))).alias("b1"),
    ).select(
        "doc_id",
        *[
            F.substring(f"b{k // 4}", 1 + 8 * (k % 4), 8).alias(f"h{k}")
            for k in range(_NUM_HASHES)
        ],
    )
    return hashes.groupBy("doc_id").agg(
        *[F.min(f"h{k}").alias(f"mh{k}") for k in range(_NUM_HASHES)]
    )


def band_rows(sig: DataFrame) -> DataFrame:
    """Signatures → (doc_id, band_id, band_val) LSH bucket rows (4 bands of
    2 adjacent signature elements, map-side explode — no shuffle)."""
    n_bands = _NUM_HASHES // _BAND_SIZE
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band_id"),
                F.concat_ws(
                    "|",
                    *[col(f"mh{b * _BAND_SIZE + j}") for j in range(_BAND_SIZE)],
                ).alias("band_val"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select("doc_id", F.explode(band_structs).alias("bv")).select(
        "doc_id", col("bv.band_id").alias("band_id"), col("bv.band_val").alias("band_val")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Band rows → (doc_a, doc_b, bands_hit) candidate pairs: equi-join on
    the band bucket key only — never all-pairs."""
    a = bands.select(col("doc_id").alias("doc_a"), "band_id", "band_val")
    b = bands.select(col("doc_id").alias("doc_b"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("bands_hit"))
    )


def shingle_rows_from_text(docs: DataFrame) -> DataFrame:
    """(doc_id, text) frame → distinct (doc_id, shingle) rows — the entry
    point for callers that bring their own document frame (e.g. the
    incremental MinHash index) rather than a table path."""
    return (
        docs.select(
            "doc_id",
            F.expr("filter(split(text, ' '), w -> length(w) > 0)").alias("toks"),
        )
        .select("doc_id", F.explode(F.expr(_SHINGLES_SPARK)).alias("shingle"))
    )


# --------------------------------------------------------------------------
# SimHash near-dup: 32-bit signature from per-token md5 bits, banded LSH
# join, Hamming-distance filter. Token hash = first 8 hex chars of
# md5(token) parsed as a 32-bit int — identical in both engines; signature
# bit i is the sign of the vote sum over tokens (ties → 0).
# --------------------------------------------------------------------------

_SIMHASH_VOTES_SQL = ",\n".join(
    f"             SUM(CASE WHEN (v >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS v{i}"
    for i in range(_SIMHASH_BITS)
)
_SIMHASH_SIG_SQL = " + ".join(
    f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT) ELSE 0 END)"
    for i in range(_SIMHASH_BITS)
)
_SIMHASH_BAND_W = _SIMHASH_BITS // _SIMHASH_BANDS


@register(
    "dedup_simhash",
    sql=f"""
    WITH toks AS (
      SELECT doc_id,
             CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS v
      FROM (SELECT doc_id,
                   unnest(list_filter(string_split(text, ' '),
                                      w -> length(w) > 0)) AS tok
            FROM documents) t),
    votes AS (
      SELECT doc_id,
{_SIMHASH_VOTES_SQL}
      FROM toks GROUP BY doc_id),
    sig AS (SELECT doc_id, {_SIMHASH_SIG_SQL} AS simhash FROM votes),
    bands AS (
      SELECT doc_id, simhash, b.b AS band_id,
             (simhash >> (b.b * {_SIMHASH_BAND_W})) & {(1 << _SIMHASH_BAND_W) - 1} AS band_val
      FROM sig CROSS JOIN range({_SIMHASH_BANDS}) b(b))
    SELECT doc_a, doc_b, hamming FROM (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
             bit_count(xor(a.simhash, b.simhash)) AS hamming
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id) p
    WHERE hamming <= {_SIMHASH_MAX_HAMMING}
    """,
    survey_ops=(),
    doc="SimHash near-dup: 32-bit signatures (vote over per-token md5 bits), "
    "4×8-bit LSH bands for candidate generation, Hamming ≤ 6 filter. Scale "
    "shape: signature is one hash-aggregate over token rows; the pair join "
    "shuffles only on (band_id, band_val) buckets — never all-pairs.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash_candidate_pairs(load_table(spark, sf_dir, "documents"))


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, text) → (doc_id, simhash) 60-bit signatures — the vote
    stage of the SimHash pipeline, factored out so the regime-matrix
    accuracy suite (tests/test_estimator_regimes.py) can probe the
    signature/Hamming relationship directly on controlled token-overlap
    corpora, independent of the candidate band join and its Hamming
    cutoff."""
    toks = docs.select(
        "doc_id",
        F.explode(F.expr("filter(split(text, ' '), w -> length(w) > 0)")).alias("tok"),
    ).select(
        "doc_id",
        F.expr("CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)").alias("v"),
    )

    # Signature strategy: JVM-side collect_list per doc (one hash aggregate,
    # map-side partials), then one Arrow-vectorized scalar pandas UDF that
    # unpacks all 60 bits of every token hash in numpy. Measured ~10× faster
    # than applyInPandas (which pays per-group Python dispatch for |docs|
    # groups) and ~6× faster than a 60-column conditional-sum hash
    # aggregate. The md5 stays JVM-side so Python only sees int64 lists.
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def signature(vs: pd.Series) -> pd.Series:
        out = np.empty(len(vs), dtype=np.int64)
        weights = np.int64(1) << np.arange(_SIMHASH_BITS, dtype=np.int64)
        shifts = np.arange(_SIMHASH_BITS, dtype=np.int64)
        for i, v in enumerate(vs):
            a = np.asarray(v, dtype=np.int64)
            bits = (a[:, None] >> shifts) & 1
            votes = 2 * bits.sum(axis=0) - len(a)
            out[i] = int((weights * (votes > 0)).sum())
        return pd.Series(out)

    return (
        toks.groupBy("doc_id")
        .agg(F.collect_list("v").alias("vs"))
        .select("doc_id", signature("vs").alias("simhash"))
    )


def simhash_candidate_pairs(docs: DataFrame) -> DataFrame:
    """SimHash near-dup pairs over a caller-supplied (doc_id, text) frame —
    the registered query runs it on the full table; the recall gate runs it
    on the deterministic md5-bucket document sample."""
    # tiny output (|docs| rows) with the full token pipeline as lineage —
    # cache so the band self-join's two sides reuse one pass.
    sig = simhash_signatures(docs).localCheckpoint()
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("long").alias("band_id"),
                F.expr(
                    f"(shiftright(simhash, {b * _SIMHASH_BAND_W})) "
                    f"& {(1 << _SIMHASH_BAND_W) - 1}"
                ).alias("band_val"),
            )
            for b in range(_SIMHASH_BANDS)
        ]
    )
    bands = sig.select(
        "doc_id", "simhash", F.explode(band_structs).alias("bv")
    ).select("doc_id", "simhash", col("bv.band_id").alias("band_id"), col("bv.band_val").alias("band_val"))
    a = bands.select(col("doc_id").alias("doc_a"), col("simhash").alias("sig_a"), "band_id", "band_val")
    b = bands.select(col("doc_id").alias("doc_b"), col("simhash").alias("sig_b"), "band_id", "band_val")
    return (
        a.join(b, ["band_id", "band_val"])
        .filter(col("doc_a") < col("doc_b"))
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.expr("sig_a ^ sig_b")).cast("long").alias("hamming"),
        )
        .distinct()
        .filter(col("hamming") <= _SIMHASH_MAX_HAMMING)
    )


# --------------------------------------------------------------------------
# Composed corpus cleaning — the actual deliverable of a training-data
# pipeline: quality-gate each document, then keep one canonical copy per
# exact-content group.
# --------------------------------------------------------------------------
@register(
    "doc_clean_corpus",
    sql="""
    WITH q AS (
      SELECT doc_id, lang, md5(text) AS h,
             CAST(len(toks) AS BIGINT) AS n_tokens,
             CASE WHEN len(toks) = 0 THEN NULL
                  ELSE (len(list_distinct(toks)) * 1000000) // len(toks)
             END AS distinct_fp
      FROM (SELECT doc_id, lang, text,
                   list_filter(string_split(text, ' '), w -> length(w) > 0) AS toks
            FROM documents) t),
    g AS (
      SELECT *, MIN(doc_id) OVER (PARTITION BY h) AS canonical_id,
             COUNT(*) OVER (PARTITION BY h) AS dup_count
      FROM q)
    SELECT doc_id, lang, n_tokens, distinct_fp, dup_count
    FROM g
    WHERE doc_id = canonical_id
      AND n_tokens >= 10 AND distinct_fp >= 150000
    """,
    survey_ops=("X2",),
    doc="End-to-end corpus cleaning in one plan: per-document quality "
    "features computed map-side as pure HOFs (token count, vocabulary "
    "diversity as a fixed-point integer ratio), exact-dup groups via a "
    "content-hash window (ONE shuffle on md5(text) serves both the "
    "canonical pick and the dup count), then the gate: canonical copies "
    "passing quality survive. The min-doc_id canonical rule matches "
    "dedup_exact, so downstream joins agree on which row represents a "
    "group. 100 TB shape: one exchange total; everything else is "
    "scan-speed projection.",
)
def doc_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = "filter(split(text, ' '), w -> length(w) > 0)"
    q = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.expr(f"CAST(size({toks}) AS BIGINT)").alias("n_tokens"),
        F.expr(
            f"CASE WHEN size({toks}) = 0 THEN NULL"
            f" ELSE (size(array_distinct({toks})) * 1000000) div size({toks}) END"
        ).alias("distinct_fp"),
    )
    w = Window.partitionBy("h")
    g = q.withColumn("canonical_id", F.min("doc_id").over(w)).withColumn(
        "dup_count", F.count(F.lit(1)).over(w)
    )
    return g.filter(
        (col("doc_id") == col("canonical_id"))
        & (col("n_tokens") >= 10)
        & (col("distinct_fp") >= 150000)
    ).select("doc_id", "lang", "n_tokens", "distinct_fp", "dup_count")


# --------------------------------------------------------------------------
# Sketch-accuracy evaluation: MinHash/LSH candidate recall against the
# exact Jaccard ground truth — the "measure, don't guess" loop for the
# dedup sketch, mirroring what knn_recall_eval does for the ANN index.
# Both sides are this module's own registered pipelines composed verbatim.
#
# The exact-truth side requires the UNBOUNDED shingle self-join (that is
# what "exact" means), so the whole gate runs on a deterministic md5-bucket
# DOCUMENT sample (same keep rule as doc_sample_stratified): a pair enters
# the evaluation iff BOTH endpoints sample in, on the truth side AND the
# sketch side, so recall/precision measured on the sampled universe are
# unbiased estimates of the full-corpus pair-level rates. This keeps the
# gate itself runnable at any corpus size — the exact side's quadratic
# hazard is bounded by the sample, not by hoping stop-shingles are rare.
# --------------------------------------------------------------------------
_RECALL_J = 0.5  # ground-truth near-dup threshold the sketch must recover
_RECALL_SAMPLE_PCT = 40  # md5-bucket doc sample feeding BOTH gate sides

_RECALL_BUCKET_SPARK = (
    "CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
)
_RECALL_DOCS_SQL = f"""(
      SELECT * FROM documents
      WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              % 100 < {_RECALL_SAMPLE_PCT}) documents"""


def _recall_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gate's document universe: deterministic ~40% md5-bucket sample —
    a map-side filter (no shuffle, no RNG), identical on any engine."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.expr(_RECALL_BUCKET_SPARK) < _RECALL_SAMPLE_PCT)


def _exact_neardup_pairs(s: DataFrame) -> DataFrame:
    """Exact Jaccard >= _RECALL_J ground-truth pairs over (doc_id, shingle)
    rows. Shingle self-join — the gate feeds it SAMPLED shingle rows only
    (plan-gated in tests/test_plans.py); dedup_ngram_jaccard is the one
    registered query allowed to run this shape unsampled."""
    sz = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = s.select(col("doc_id").alias("doc_a"), "shingle")
    b = s.select(col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        a.join(b, ["shingle"])
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    jac = col("i").cast("double") / (col("na") + col("nb") - col("i"))
    return (
        pairs.join(sz.select(col("doc_id").alias("doc_a"), col("n").alias("na")), ["doc_a"])
        .join(sz.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), ["doc_b"])
        .filter(jac >= _RECALL_J)
        .select("doc_a", "doc_b")
    )


def _recall_metrics(exact: DataFrame, cand: DataFrame) -> DataFrame:
    """(truth pairs, candidate pairs) → one recall/precision metrics row.

    Each arm is consumed TWICE (its own count + the hit join), so both
    frames are materialized once: without the checkpoint the full exact
    self-join and the whole sketch pipeline re-execute inside one metrics
    DAG. Pair frames are near-dup pairs over the ~40% doc sample —
    bounded, the same class as a broadcast side."""
    exact = exact.localCheckpoint()
    cand = cand.localCheckpoint()
    n_true = exact.agg(F.count(F.lit(1)).alias("n_true"))
    n_cand = cand.agg(F.count(F.lit(1)).alias("n_cand"))
    n_hit = exact.join(cand, ["doc_a", "doc_b"]).agg(F.count(F.lit(1)).alias("n_hit"))
    return (
        n_hit.crossJoin(broadcast(n_true))
        .crossJoin(broadcast(n_cand))
        .select(
            "n_true",
            "n_cand",
            "n_hit",
            (col("n_hit").cast("double") / F.nullif(col("n_true"), F.lit(0))).alias("recall"),
            (col("n_hit").cast("double") / F.nullif(col("n_cand"), F.lit(0))).alias("precision"),
        )
    )


@register(
    "dedup_minhash_recall",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL.replace("FROM documents", f"FROM {_RECALL_DOCS_SQL}")}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    exact AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) p
      JOIN sz za ON za.doc_id = doc_a
      JOIN sz zb ON zb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= {_RECALL_J}),
    sig AS (
      SELECT doc_id, r.k AS k,
             MIN(substr(CASE WHEN r.k < 4 THEN h0 ELSE h1 END,
                        1 + 8 * (r.k % 4), 8)) AS mh
      FROM (SELECT doc_id, md5('0:' || shingle) AS h0,
                   md5('1:' || shingle) AS h1 FROM s) z
      CROSS JOIN range({_NUM_HASHES}) r(k)
      GROUP BY doc_id, r.k),
    bands AS (
      SELECT doc_id, band_id, string_agg(mh, '|' ORDER BY k) AS band_val
      FROM (SELECT doc_id, k, CAST(k // {_BAND_SIZE} AS BIGINT) AS band_id, mh
            FROM sig) z
      GROUP BY doc_id, band_id),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id),
    hit AS (SELECT COUNT(*) AS n_hit
            FROM exact JOIN cand USING (doc_a, doc_b))
    SELECT (SELECT COUNT(*) FROM exact) AS n_true,
           (SELECT COUNT(*) FROM cand) AS n_cand,
           n_hit,
           CAST(n_hit AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM exact), 0) AS recall,
           CAST(n_hit AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM cand), 0) AS precision
    FROM hit
    """,
    survey_ops=(),
    doc="MinHash/LSH sketch recall/precision against exact Jaccard ground "
    "truth at j>=0.5: composes the exact shingle self-join (truth) and the "
    "banded candidate join (sketch) and counts the overlap — one row of "
    "metrics. Both sides run on the deterministic ~40% md5-bucket document "
    "sample (pair inclusion prob ~16%), so the gate's own cost is bounded "
    "at any corpus size — the unbounded exact self-join never touches the "
    "full corpus. Unbiased for pair-level recall/precision.",
)
def dedup_minhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = shingle_rows_from_text(_recall_sample_docs(spark, sf_dir)).localCheckpoint()
    exact = _exact_neardup_pairs(s)
    cand = (
        lsh_candidate_pairs(band_rows(minhash_signatures(s)))
        .select("doc_a", "doc_b")
    )
    return _recall_metrics(exact, cand)


# --------------------------------------------------------------------------
# SimHash sketch recall — the same sketch-trust harness as
# dedup_minhash_recall, for the OTHER sketch family: does banded SimHash
# (Hamming ≤ 6) recover the exact Jaccard >= 0.5 near-dup pairs?
# Running both gates side by side is how a pipeline picks its sketch.
# --------------------------------------------------------------------------
def _simhash_pairs_sql() -> str:
    from .registry import QUERIES

    return QUERIES["dedup_simhash"].sql


@register(
    "dedup_simhash_recall",
    sql=None,  # bound below from the registered simhash SQL
    survey_ops=(),
    doc="SimHash candidate recall/precision against exact Jaccard ground "
    "truth at j>=0.5 — composes the registered simhash pipeline verbatim "
    "(band-key joins only) with the exact shingle self-join truth side; "
    "one metrics row. Paired with dedup_minhash_recall, this is the "
    "measured basis for choosing a sketch family before a 100 TB run. "
    "Both sides run on the deterministic ~40% md5-bucket document sample, "
    "bounding the exact side's cost at any corpus size.",
)
def dedup_simhash_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    sampled = _recall_sample_docs(spark, sf_dir).localCheckpoint()
    # shingle rows feed three consumers inside _exact_neardup_pairs (size
    # aggregate + both self-join sides): materialize the tokenize/shingle
    # expansion once, as dedup_minhash_recall already does.
    exact = _exact_neardup_pairs(
        shingle_rows_from_text(sampled).localCheckpoint()
    )
    cand = simhash_candidate_pairs(sampled).select("doc_a", "doc_b")
    return _recall_metrics(exact, cand)


def _bind_simhash_recall_sql() -> None:
    from .registry import QUERIES

    # both sides run on the same md5-bucket doc sample as the Spark plan:
    # the shingle CTE and the composed simhash pipeline each swap the raw
    # `documents` scan for the sampled subquery.
    QUERIES["dedup_simhash_recall"].sql = f"""
    WITH s AS ({_SHINGLE_ROWS_SQL.replace("FROM documents", f"FROM {_RECALL_DOCS_SQL}")}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    exact AS (
      SELECT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id) p
      JOIN sz za ON za.doc_id = doc_a
      JOIN sz zb ON zb.doc_id = doc_b
      WHERE CAST(i AS DOUBLE) / (za.n + zb.n - i) >= {_RECALL_J}),
    cand AS (SELECT doc_a, doc_b FROM (
      {_simhash_pairs_sql().replace("FROM documents", f"FROM {_RECALL_DOCS_SQL}")}) sh),
    hit AS (SELECT COUNT(*) AS n_hit
            FROM exact JOIN cand USING (doc_a, doc_b))
    SELECT (SELECT COUNT(*) FROM exact) AS n_true,
           (SELECT COUNT(*) FROM cand) AS n_cand,
           n_hit,
           CAST(n_hit AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM exact), 0) AS recall,
           CAST(n_hit AS DOUBLE)
             / NULLIF((SELECT COUNT(*) FROM cand), 0) AS precision
    FROM hit
    """


_bind_simhash_recall_sql()


# --------------------------------------------------------------------------
# MinHash calibration — est-vs-exact Jaccard per LSH candidate pair. The
# recall gates measure WHICH pairs the sketch finds; this measures HOW WELL
# the signature agreement fraction estimates the Jaccard it stands in for
# (the number that justifies using signature agreement as a cheap ranking
# key before exact verification). Because the minhashes are md5-derived,
# the ESTIMATE itself is deterministic and oracle-exact — both engines
# produce identical estimate, truth, and error columns.
# --------------------------------------------------------------------------
@register(
    "dedup_minhash_estimate",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    sig AS (
      SELECT doc_id, r.k AS k,
             MIN(substr(CASE WHEN r.k < 4 THEN h0 ELSE h1 END,
                        1 + 8 * (r.k % 4), 8)) AS mh
      FROM (SELECT doc_id, md5('0:' || shingle) AS h0,
                   md5('1:' || shingle) AS h1 FROM s) z
      CROSS JOIN range({_NUM_HASHES}) r(k)
      GROUP BY doc_id, r.k
    ),
    bands AS (
      SELECT doc_id, band_id, string_agg(mh, '|' ORDER BY k) AS band_val
      FROM (SELECT doc_id, k, CAST(k // {_BAND_SIZE} AS BIGINT) AS band_id, mh FROM sig) z
      GROUP BY doc_id, band_id
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_val = b.band_val
                  AND a.doc_id < b.doc_id),
    agree AS (
      SELECT c.doc_a, c.doc_b,
             CAST(SUM(CASE WHEN sa.mh = sb.mh THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.doc_a
      JOIN sig sb ON sb.doc_id = c.doc_b AND sb.k = sa.k
      GROUP BY c.doc_a, c.doc_b),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT a.doc_a, a.doc_b, a.n_agree,
           CAST(a.n_agree AS DOUBLE) / {_NUM_HASHES} AS est_jaccard,
           CAST(COALESCE(i.i, 0) AS DOUBLE)
             / (za.n + zb.n - COALESCE(i.i, 0)) AS jaccard,
           ABS(CAST(a.n_agree AS DOUBLE) / {_NUM_HASHES}
               - CAST(COALESCE(i.i, 0) AS DOUBLE)
                 / (za.n + zb.n - COALESCE(i.i, 0))) AS abs_err
    FROM agree a
    LEFT JOIN inter i ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
    JOIN sz za ON za.doc_id = a.doc_a
    JOIN sz zb ON zb.doc_id = a.doc_b
    """,
    survey_ops=(),
    doc=f"MinHash calibration per LSH candidate pair: signature agreement "
    f"fraction (n_agree/{_NUM_HASHES}) beside the exact Jaccard and the "
    "absolute error — the measured basis for trusting signature agreement "
    "as a pre-verification ranking key. Scale shape: candidates come from "
    "the band join (bounded, never all-pairs); the agreement join touches "
    f"{_NUM_HASHES}·|cand| signature rows and the exact side only "
    "candidate pairs' shingle rows. md5-derived minhashes make the "
    "estimate itself engine-exact, so the whole table hash-matches.",
)
def dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _shingle_rows(spark, sf_dir).localCheckpoint()
    sig = minhash_signatures(s).localCheckpoint()  # bands + both agree sides
    cand = lsh_candidate_pairs(band_rows(sig)).select("doc_a", "doc_b")
    agree_expr = sum(
        F.when(col(f"a.mh{k}") == col(f"b.mh{k}"), 1).otherwise(0)
        for k in range(_NUM_HASHES)
    )
    agree = (
        cand.join(sig.alias("a"), col("doc_a") == col("a.doc_id"))
        .join(sig.alias("b"), col("doc_b") == col("b.doc_id"))
        .select("doc_a", "doc_b", agree_expr.cast("long").alias("n_agree"))
    )
    sz = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    # exact intersection via the per-doc shingle sets of candidate pairs
    arrays = s.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh"))
    verified = (
        agree.join(
            arrays.select(col("doc_id").alias("doc_a"), col("sh").alias("sh_a")),
            ["doc_a"],
        )
        .join(
            arrays.select(col("doc_id").alias("doc_b"), col("sh").alias("sh_b")),
            ["doc_b"],
        )
        .join(sz.select(col("doc_id").alias("doc_a"), col("n").alias("na")), ["doc_a"])
        .join(sz.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), ["doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "n_agree",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("i"),
            "na",
            "nb",
        )
    )
    est = col("n_agree").cast("double") / F.lit(_NUM_HASHES)
    jac = col("i").cast("double") / (col("na") + col("nb") - col("i"))
    return verified.select(
        "doc_a",
        "doc_b",
        "n_agree",
        est.alias("est_jaccard"),
        jac.alias("jaccard"),
        F.abs(est - jac).alias("abs_err"),
    )


# --------------------------------------------------------------------------
# SimHash calibration — Hamming distance vs exact Jaccard per accepted
# candidate pair. SimHash has no closed-form distance→similarity mapping
# for vote-based token signatures (unlike MinHash agreement → Jaccard), so
# the threshold is an EMPIRICAL choice — this table is the data that
# choice is made from, refreshed with the corpus.
# --------------------------------------------------------------------------
@register(
    "dedup_simhash_calibration",
    sql=None,  # bound below: composes the registered simhash SQL verbatim
    survey_ops=(),
    doc="SimHash threshold calibration: for every accepted candidate pair "
    "(Hamming <= 6 after the band join), the Hamming distance beside the "
    "exact shingle Jaccard — the empirical basis for the Hamming cutoff, "
    "the way dedup_minhash_estimate calibrates signature agreement. "
    "Scale shape: candidates are band-join bounded; the exact side "
    "touches only candidate docs' shingle sets (collect_set per doc, "
    "array_intersect per pair).",
)
def dedup_simhash_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cand = simhash_candidate_pairs(docs).select("doc_a", "doc_b", "hamming")
    s = shingle_rows_from_text(docs).localCheckpoint()  # arrays + sizes
    arrays = s.groupBy("doc_id").agg(F.collect_set("shingle").alias("sh"))
    sz = s.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    verified = (
        cand.join(
            arrays.select(col("doc_id").alias("doc_a"), col("sh").alias("sh_a")),
            ["doc_a"],
        )
        .join(
            arrays.select(col("doc_id").alias("doc_b"), col("sh").alias("sh_b")),
            ["doc_b"],
        )
        .join(sz.select(col("doc_id").alias("doc_a"), col("n").alias("na")), ["doc_a"])
        .join(sz.select(col("doc_id").alias("doc_b"), col("n").alias("nb")), ["doc_b"])
        .select(
            "doc_a",
            "doc_b",
            "hamming",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("long").alias("i"),
            "na",
            "nb",
        )
    )
    jac = col("i").cast("double") / (col("na") + col("nb") - col("i"))
    return verified.select("doc_a", "doc_b", "hamming", jac.alias("jaccard"))


def _bind_simhash_calibration_sql() -> None:
    from .registry import QUERIES

    QUERIES["dedup_simhash_calibration"].sql = f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    cand AS (SELECT doc_a, doc_b, hamming FROM (
      {_simhash_pairs_sql()}) sh),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS i
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT c.doc_a, c.doc_b, c.hamming,
           CAST(COALESCE(i.i, 0) AS DOUBLE)
             / (za.n + zb.n - COALESCE(i.i, 0)) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
    JOIN sz za ON za.doc_id = c.doc_a
    JOIN sz zb ON zb.doc_id = c.doc_b
    """


_bind_simhash_calibration_sql()


# --------------------------------------------------------------------------
# Prefix-duplication rate — the memorization-risk audit: documents that
# share their opening characters verbatim (boilerplate headers, mirrored
# articles, template spam) are the ones a model most readily memorizes,
# and they evade whole-document hashing the moment anything after the
# prefix differs. One md5-of-prefix aggregate; corpus-sized, single
# shuffle on the prefix hash.
# --------------------------------------------------------------------------
_PREFIX_LEN = 100


@register(
    "doc_prefix_dup_rate",
    sql=f"""
    WITH p AS (
      SELECT md5(substr(text, 1, {_PREFIX_LEN})) AS ph
      FROM documents WHERE length(text) >= {_PREFIX_LEN}),
    g AS (SELECT ph, COUNT(*) AS n FROM p GROUP BY ph)
    SELECT CAST(SUM(n) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_prefix_groups,
           CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) AS BIGINT)
             AS n_dup_docs,
           CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n END), 0) * 1000000
                // SUM(n) AS BIGINT) AS dup_ppm,
           CAST(MAX(n) AS BIGINT) AS largest_group
    FROM g
    """,
    survey_ops=("X2",),
    doc=f"Share of documents whose first {_PREFIX_LEN} characters are "
    "duplicated verbatim elsewhere in the corpus — the memorization-risk "
    "audit whole-document hashing misses (one changed byte after the "
    "prefix defeats it). md5-of-prefix grouping: map-side hash, one "
    "shuffle on the prefix hash, 1-row summary (docs, groups, dup docs, "
    "ppm, largest clone family). Short documents (< prefix length) are "
    "excluded on both engines.",
)
def doc_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _PREFIX_LEN
    )
    g = docs.select(
        F.md5(F.expr(f"substring(text, 1, {_PREFIX_LEN})")).alias("ph")
    ).groupBy("ph").agg(F.count(F.lit(1)).alias("n"))
    return g.agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_prefix_groups"),
        F.coalesce(F.sum(F.when(col("n") > 1, col("n"))), F.lit(0))
        .cast("long")
        .alias("n_dup_docs"),
        F.expr(
            "CAST(coalesce(SUM(CASE WHEN n > 1 THEN n END), 0) * 1000000"
            " div SUM(n) AS BIGINT)"
        ).alias("dup_ppm"),
        F.max("n").cast("long").alias("largest_group"),
    )


# --------------------------------------------------------------------------
# Prefix-filtered exact set-similarity join (the SSJoin/PPJoin candidate
# rule, Bayardo et al. 2007 / Xiao et al. 2008): order every document's
# shingles by a global total order (df asc, shingle asc — rarest first)
# and index only each doc's PREFIX of p = n - ceil(t*n) + 1 tokens. If
# J(A,B) >= t, the smallest shared token in the global order provably
# falls in BOTH prefixes, so joining prefixes loses no qualifying pair —
# and because prefixes hold the RAREST tokens, per-token fan-out is small
# by construction (the stop-shingle blowup prunes itself: frequent
# shingles sort last and fall out of every prefix).
# --------------------------------------------------------------------------
_PREFIX_JACCARD_T = 0.5


@register(
    "dedup_jaccard_prefix_filter",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM s GROUP BY doc_id),
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS intersection
      FROM s a JOIN s b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT doc_a, doc_b, intersection,
           CAST(intersection AS DOUBLE) / (za.n + zb.n - intersection)
             AS jaccard
    FROM pairs
    JOIN sz za ON za.doc_id = doc_a
    JOIN sz zb ON zb.doc_id = doc_b
    WHERE CAST(intersection AS DOUBLE) / (za.n + zb.n - intersection)
          >= {_PREFIX_JACCARD_T}
    """,
    survey_ops=(),
    doc="Exact set-similarity join via PREFIX FILTERING (SSJoin/PPJoin "
    f"candidate rule) at Jaccard >= {_PREFIX_JACCARD_T}: shingles order "
    "globally by (df asc, shingle) and each doc indexes only its "
    "p = n - ceil(t*n) + 1 rarest shingles; candidates must collide "
    "inside both prefixes (provably lossless — the smallest shared token "
    "lands in both), then verify exactly over full shingle arrays with a "
    "size filter (min >= t*max). THE ORACLE IS THE NAIVE ALL-PAIRS "
    "GROUND TRUTH, so the hash match proves the filter's "
    "no-false-negative guarantee, not just self-consistency. Scale "
    "shape: frequent shingles sort LAST and drop out of every prefix, so "
    "the candidate join fans out only on rare tokens — the third exact- "
    "Jaccard strategy beside the naive self-join and the df-cap, and the "
    "one that is both complete AND skew-safe at a high threshold. "
    "Shuffles: shingle (df + prefix join), doc (window), pair (verify).",
)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    t = _PREFIX_JACCARD_T
    # eager materialization of the shared frames (same rationale as
    # dedup_jaccard_dfcapped): `arrays` feeds the exploded rows and the
    # verify's array join; without the checkpoint both branches recompute
    # the document scan + shingle slide transform inside one DAG.
    # (_shingle_arrays itself checkpoints — no second checkpoint here.)
    arrays = _shingle_arrays(spark, sf_dir)
    s = arrays.select("doc_id", F.explode("shingles").alias("shingle"))
    dfc = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # doc size n rides the SAME doc-partitioned window pass as the rarity
    # rank (count over the full partition) instead of a separate
    # size-frame join — one shuffle fewer, measured 8.3s -> 4.7s at sf0.1
    ranked = s.join(dfc, ["shingle"]).select(
        "doc_id",
        "shingle",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("df", "shingle"))
        .alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("doc_id"))
        .cast("long")
        .alias("n"),
    )
    # p = n - ceil(t*n) + 1; t = 0.5 → ceil(n/2) = (n+1) div 2, integer-only
    prefix = ranked.filter(F.expr("rn <= n - (n + 1) DIV 2 + 1")).select(
        "doc_id", "shingle", "n"
    )
    cand = (
        prefix.select(
            col("doc_id").alias("doc_a"), "shingle", col("n").alias("na")
        )
        .join(
            prefix.select(
                col("doc_id").alias("doc_b"), "shingle", col("n").alias("nb")
            ),
            ["shingle"],
        )
        .filter(
            (col("doc_a") < col("doc_b"))
            # length filter: J >= t forces min(n) >= t * max(n)
            & (col("na") * F.lit(int(t * 1000)) <= col("nb") * F.lit(1000))
            & (col("nb") * F.lit(int(t * 1000)) <= col("na") * F.lit(1000))
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    verified = _verify_intersections(cand, arrays)
    jac = col("intersection").cast("double") / (
        col("na") + col("nb") - col("intersection")
    )
    return (
        verified.withColumn("jaccard", jac)
        .filter(col("jaccard") >= t)
        .select("doc_a", "doc_b", "intersection", "jaccard")
    )


# --------------------------------------------------------------------------
# Duplicated-span audit — position-level exact substring duplication (the
# Lee et al. 2022 "Deduplicating Training Data Makes Language Models
# Better" signal, k-gram-hash formulation): a character k-gram occurring
# ≥2 times ANYWHERE in the corpus (across docs or repeated within one)
# marks its start position duplicated. Per-doc duplicated-position ppm is
# the span-level dup rate that document- and chunk-grain hashing both
# miss (a copied paragraph inside an otherwise-unique doc).
# --------------------------------------------------------------------------
_SPAN_K = 24  # characters per gram — long enough that English collisions
# are genuine copies, short enough to flag sub-sentence boilerplate


@register(
    "doc_dup_span_audit",
    sql=f"""
    WITH g AS (
      SELECT doc_id, text,
             unnest(range(1, length(text) - {_SPAN_K} + 2)) AS i
      FROM documents WHERE length(text) >= {_SPAN_K}),
    gd AS (
      SELECT doc_id, md5(substr(text, CAST(i AS INTEGER), {_SPAN_K})) AS h,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM g GROUP BY doc_id, h),
    tot AS (SELECT h, CAST(SUM(k) AS BIGINT) AS c FROM gd GROUP BY h),
    per AS (
      SELECT doc_id,
             CAST(SUM(k) AS BIGINT) AS total_grams,
             CAST(COALESCE(SUM(CASE WHEN c >= 2 THEN k END), 0) AS BIGINT)
               AS dup_grams
      FROM gd JOIN tot USING (h) GROUP BY doc_id)
    SELECT doc_id, total_grams, dup_grams,
           CAST(dup_grams * 1000000 // total_grams AS BIGINT) AS dup_ppm
    FROM per
    """,
    survey_ops=("X2",),
    doc=f"Per-document duplicated-span rate: every character {_SPAN_K}-gram "
    "start position whose gram repeats anywhere in the corpus (cross-doc "
    "OR intra-doc) counts as duplicated; output is (total_grams, "
    "dup_grams, dup_ppm) per doc — the position-level signal behind "
    "exact-substring dedup, which catches a copied paragraph inside an "
    "otherwise-unique document where doc- and chunk-grain hashing see "
    "nothing. Scale shape: grams collapse to (md5, doc) grain map-side "
    "FIRST (intra-doc repeats combine before any shuffle), then one "
    "gram-hash aggregate for corpus totals and one (md5, doc)-grain join "
    "back — two linear shuffles on 16-byte keys, no position-grain join, "
    "never all-pairs. Docs shorter than the gram are excluded on both "
    "engines; integer ppm only.",
)
def doc_dup_span_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") >= _SPAN_K
    )
    gd = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, length(text) - {_SPAN_K} + 1),"
                    f" i -> md5(substring(text, i, {_SPAN_K})))"
                )
            ).alias("h"),
        )
        .groupBy("doc_id", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("k"))
    )
    # corpus totals ride a WINDOW over the gram-hash partition instead of
    # a groupBy+join-back: same h-keyed shuffle once instead of twice over
    # the gram-grain frame — measured 6.9s -> 2.6s at sf0.1
    per = (
        gd.select(
            "doc_id", "k", F.sum("k").over(Window.partitionBy("h")).alias("c")
        )
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("total_grams"),
            F.coalesce(F.sum(F.when(col("c") >= 2, col("k"))), F.lit(0))
            .cast("long")
            .alias("dup_grams"),
        )
    )
    return per.select(
        "doc_id",
        "total_grams",
        "dup_grams",
        F.expr("CAST(dup_grams * 1000000 DIV total_grams AS BIGINT)").alias(
            "dup_ppm"
        ),
    )


def _doc_dup_span_prune_sql() -> str:
    k = _SPAN_K
    return f"""
    WITH g AS (
      SELECT doc_id, text,
             unnest(range(1, length(text) - {k} + 2)) AS i
      FROM documents WHERE length(text) >= {k}),
    gr AS (
      SELECT doc_id, CAST(i AS BIGINT) AS p,
             md5(substr(text, CAST(i AS INTEGER), {k})) AS h
      FROM g),
    dup AS (SELECT h FROM gr GROUP BY h HAVING COUNT(*) >= 2),
    pos AS (SELECT doc_id, p FROM gr JOIN dup USING (h)),
    isl AS (
      SELECT doc_id, p,
             CASE WHEN LAG(p) OVER w IS NULL OR p - LAG(p) OVER w > {k}
                  THEN 1 ELSE 0 END AS ni
      FROM pos WINDOW w AS (PARTITION BY doc_id ORDER BY p)),
    grps AS (
      SELECT doc_id, p,
             SUM(ni) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS UNBOUNDED PRECEDING) AS grp
      FROM isl),
    iv AS (
      SELECT doc_id, MIN(p) AS s, MAX(p) + {k} - 1 AS e
      FROM grps GROUP BY doc_id, grp),
    ivl AS (
      SELECT iv.doc_id, s, e, length(d.text) AS L, d.text
      FROM iv JOIN documents d USING (doc_id)),
    segs AS (
      SELECT doc_id, text, e + 1 AS ks,
             COALESCE(LEAD(s) OVER (PARTITION BY doc_id ORDER BY s) - 1, L)
               AS ke
      FROM ivl
      UNION ALL
      SELECT doc_id, text, 1 AS ks, MIN(s) - 1 AS ke
      FROM ivl GROUP BY doc_id, text),
    kept AS (
      SELECT doc_id, ks,
             substr(text, CAST(ks AS INTEGER), CAST(ke - ks + 1 AS INTEGER))
               AS frag
      FROM segs WHERE ks <= ke),
    rebuilt AS (
      SELECT doc_id, string_agg(frag, '' ORDER BY ks) AS clean_text
      FROM kept GROUP BY doc_id),
    stats AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cut_intervals,
             CAST(SUM(e - s + 1) AS BIGINT) AS chars_cut
      FROM iv GROUP BY doc_id)
    SELECT d.doc_id,
           COALESCE(st.n_cut_intervals, 0) AS n_cut_intervals,
           COALESCE(st.chars_cut, 0) AS chars_cut,
           CASE WHEN st.doc_id IS NULL THEN d.text
                ELSE COALESCE(r.clean_text, '') END AS clean_text
    FROM documents d
    LEFT JOIN stats st USING (doc_id)
    LEFT JOIN rebuilt r USING (doc_id)
    """


@register(
    "doc_dup_span_prune",
    sql=_doc_dup_span_prune_sql(),
    survey_ops=("X2", "F9"),
    doc="The ACTION half of doc_dup_span_audit (boilerplate_prune's span-"
    "grain sibling): duplicated gram start positions merge into maximal "
    "cut intervals (gaps-and-islands — a new island opens when the next "
    f"position is > {_SPAN_K} past the previous, else the spans overlap "
    "or touch), and the document text is rebuilt from the complement "
    "segments in order. Emits per-doc (n_cut_intervals, chars_cut, "
    "clean_text) over ALL documents — untouched docs pass through "
    "verbatim, fully-duplicated docs come back empty (distinguished from "
    "no-intervals via the stats join, not a text coalesce). Scale shape: "
    "the interval merge and rebuild are doc-partitioned windows (one "
    "shuffle on doc_id after the dup-hash join); interval and segment "
    "counts are bounded by text length. The keep-one-copy policy is the "
    "pipeline layer's call (as with dedup representatives) — this "
    "operator cuts every duplicated occurrence deterministically.",
)
def doc_dup_span_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    k = _SPAN_K
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs = docs.localCheckpoint()  # consumers: grams, interval join, final
    gr = docs.filter(F.length("text") >= k).select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, length(text) - {k} + 1),"
                f" i -> md5(substring(text, i, {k})))"
            )
        ).alias("i0", "h"),
    ).select("doc_id", (col("i0") + 1).cast("long").alias("p"), "h")
    dup = gr.groupBy("h").agg(F.count(F.lit(1)).alias("c")).filter(
        col("c") >= 2
    ).select("h")
    pos = gr.join(dup, ["h"]).select("doc_id", "p")
    wp = Window.partitionBy("doc_id").orderBy("p")
    isl = pos.withColumn(
        "ni",
        F.when(
            F.lag("p").over(wp).isNull() | (col("p") - F.lag("p").over(wp) > k),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    grps = isl.withColumn(
        "grp",
        F.sum("ni").over(wp.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = grps.groupBy("doc_id", "grp").agg(
        F.min("p").alias("s"), (F.max("p") + k - 1).alias("e")
    )
    ivl = iv.join(
        docs.select("doc_id", "text", F.length("text").cast("long").alias("L")),
        ["doc_id"],
    )
    ws = Window.partitionBy("doc_id").orderBy("s")
    gaps = ivl.select(
        "doc_id",
        "text",
        (col("e") + 1).alias("ks"),
        F.coalesce(F.lead("s").over(ws) - 1, col("L")).alias("ke"),
    )
    heads = ivl.groupBy("doc_id", "text").agg(
        F.lit(1).cast("long").alias("ks"), (F.min("s") - 1).alias("ke")
    )
    kept = (
        gaps.unionByName(heads)
        .filter(col("ks") <= col("ke"))
        .select(
            "doc_id",
            "ks",
            F.expr("substring(text, CAST(ks AS INT), CAST(ke - ks + 1 AS INT))")
            .alias("frag"),
        )
    )
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr("transform(array_sort(collect_list(struct(ks, frag))),"
                   " x -> x.frag)"),
            "",
        ).alias("clean_text")
    )
    stats = iv.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_cut_intervals"),
        F.sum(col("e") - col("s") + 1).cast("long").alias("chars_cut"),
    )
    return (
        docs.select("doc_id", "text")
        .join(stats, ["doc_id"], "left")
        .join(rebuilt, ["doc_id"], "left")
        .select(
            "doc_id",
            F.coalesce("n_cut_intervals", F.lit(0)).cast("long").alias(
                "n_cut_intervals"
            ),
            F.coalesce("chars_cut", F.lit(0)).cast("long").alias("chars_cut"),
            F.when(col("n_cut_intervals").isNull(), col("text"))
            .otherwise(F.coalesce("clean_text", F.lit("")))
            .alias("clean_text"),
        )
    )


# --------------------------------------------------------------------------
# Asymmetric containment dedup — the case Jaccard structurally misses: a
# short document quoted whole inside a much longer one has tiny Jaccard
# (intersection / union is diluted by the container's size) but
# containment |A∩B| / |A| ≈ 1. Training pipelines need this direction:
# the contained doc is the redundant one to drop, whichever way the pair
# sorts. Candidates reuse the df-capped rare-shingle machinery (fan-out
# bounded at C(cap, 2) per shingle); the exact intersection is verified
# with the prefix-filter's array form.
# --------------------------------------------------------------------------
_CONTAIN_T_PPM = 600_000  # report pairs with max-direction containment >= 0.6
_CONTAIN_MIN_INTER = 2  # ignore single-shingle coincidences


@register(
    "dedup_shingle_containment",
    sql=f"""
    WITH s AS ({_SHINGLE_ROWS_SQL}),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY doc_id),
    rare AS (
      SELECT doc_id, shingle FROM s
      WHERE shingle IN (
        SELECT shingle FROM s GROUP BY shingle
        HAVING COUNT(*) <= {_JACCARD_DF_CAP})
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM rare a JOIN rare b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS intersection
      FROM cand c
      JOIN s sa ON sa.doc_id = c.doc_a
      JOIN s sb ON sb.doc_id = c.doc_b AND sb.shingle = sa.shingle
      GROUP BY c.doc_a, c.doc_b
      HAVING COUNT(*) >= {_CONTAIN_MIN_INTER}
    )
    SELECT i.doc_a, i.doc_b, i.intersection,
           CAST(i.intersection * 1000000 // za.n AS BIGINT) AS cont_a_ppm,
           CAST(i.intersection * 1000000 // zb.n AS BIGINT) AS cont_b_ppm
    FROM inter i
    JOIN sz za ON za.doc_id = i.doc_a
    JOIN sz zb ON zb.doc_id = i.doc_b
    WHERE i.intersection * 1000000 // za.n >= {_CONTAIN_T_PPM}
       OR i.intersection * 1000000 // zb.n >= {_CONTAIN_T_PPM}
    """,
    survey_ops=(),
    doc="Asymmetric shingle-containment near-dup: per df-capped candidate "
    "pair, containment |A∩B|/|A| and |A∩B|/|B| in integer ppm; report "
    "pairs where either direction >= 0.6 (a doc mostly contained in "
    "another is redundant even when Jaccard is diluted by the container's "
    "length — the quote/aggregation-page case symmetric measures miss). "
    "Scale shape identical to dedup_jaccard_dfcapped: candidates only "
    "from shingles with df <= cap (pair fan-out bounded C(cap,2)), exact "
    "intersections verified per candidate via the array form, shuffle on "
    "shingle then (doc_a, doc_b). No symmetric length filter — that "
    "filter is exactly what containment must NOT apply.",
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    # eager materialization of the shared frames (same rationale as
    # dedup_jaccard_dfcapped): `arrays` feeds the exploded rows and the
    # verify's array join, `s` feeds the df count and the candidate join.
    # (_shingle_arrays itself checkpoints — no second checkpoint here.)
    arrays = _shingle_arrays(spark, sf_dir)
    s = arrays.select("doc_id", F.explode("shingles").alias("shingle"))
    dfc = s.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    rare = dfc.filter(col("df") <= _JACCARD_DF_CAP).select("shingle")
    # Candidate pairs via the SAME bounded collect_list expansion as
    # dedup_jaccard_dfcapped (every group provably <= cap rows because
    # only rare shingles survive the join) instead of a rare x rare
    # self-join: one shuffle of the rare rows replaces two join-side
    # shuffles, and the C(cap,2) explode is spread across cores before
    # it amplifies (AQE coalesces the byte-tiny grouped frame to ~one
    # partition; the explode must come after an explicit spread).
    # Measured min-of-4 at sf0.1: the full query 5.8 s -> 3.2-4.2 s.
    cand = (
        s.join(rare, ["shingle"])
        .groupBy("shingle")
        .agg(F.collect_list("doc_id").alias("ids"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(
            F.explode(
                F.expr(
                    "filter(flatten(transform(ids, a -> transform(ids,"
                    " b -> struct(a AS doc_a, b AS doc_b)))),"
                    " p -> p.doc_a < p.doc_b)"
                )
            ).alias("p")
        )
        .select(col("p.doc_a").alias("doc_a"), col("p.doc_b").alias("doc_b"))
        .distinct()
    )
    verified = (
        _verify_intersections(cand, arrays)
        .filter(col("intersection") >= _CONTAIN_MIN_INTER)
        .select(
            "doc_a",
            "doc_b",
            "intersection",
            F.expr("CAST(intersection * 1000000 DIV na AS BIGINT)").alias(
                "cont_a_ppm"
            ),
            F.expr("CAST(intersection * 1000000 DIV nb AS BIGINT)").alias(
                "cont_b_ppm"
            ),
        )
    )
    return verified.filter(
        (col("cont_a_ppm") >= _CONTAIN_T_PPM)
        | (col("cont_b_ppm") >= _CONTAIN_T_PPM)
    )
