"""Similarity-search plans over the `embeddings` table (64-dim float
vectors): brute-force cosine top-k as the exact baseline, sign-LSH bucketing
as the approximate scale path, and per-label centroid aggregation.

Determinism: dot products and squared norms are per-element double products
(IEEE-identical on both engines) scaled to fixed-point BIGINT via
``ROUND(x * 1e12)`` and summed exactly, so cosine values match the oracle
bit-for-bit and the top-k ranking (with vec_id tie-break) selects identical
rows. (High-scale DECIMAL casts of arbitrary doubles are NOT cross-engine
stable — engines disagree by 1 ulp of the last decimal digit near rounding
boundaries; ROUND of an identical double is.)

Scale shape: the query side is broadcast, the corpus side streams — the
brute-force plan is a broadcast nested-loop with map-side top-k (window
within query partition), no corpus shuffle. The LSH variant pre-buckets the
corpus so candidate generation is an equi-join on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..sources.testdata import load_table
from .registry import register

_N_QUERIES = 10
_TOP_K = 5

# exact fixed-point dot product of two float arrays (Spark side):
# per-element double product → ROUND(p * 1e12) → BIGINT sum (exact,
# order-insensitive) → back to double.
_DOT = """
    CAST(aggregate(
      zip_with({a}, {b}, (x, y) ->
        CAST(ROUND(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) * 1e12, 0) AS BIGINT)),
      0L, (acc, v) -> acc + v) AS DOUBLE) / 1e12
"""

_NORMS_SQL = """
      SELECT vec_id,
             sqrt(CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * CAST(v AS DOUBLE) * 1e12)
                                AS BIGINT)) AS DOUBLE) / 1e12) AS nrm
      FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings) t
      GROUP BY vec_id
"""


def _with_norm(df: DataFrame, emb: str, out: str) -> DataFrame:
    return df.withColumn(out, F.sqrt(F.expr(_DOT.format(a=emb, b=emb))))


@register(
    "knn_cosine_bruteforce",
    sql=f"""
    WITH norms AS ({_NORMS_SQL}),
    q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {_N_QUERIES}),
    pairs AS (
      SELECT qid, vec_id,
             CAST(SUM(CAST(ROUND(CAST(qv AS DOUBLE) * CAST(cv AS DOUBLE) * 1e12)
                           AS BIGINT)) AS DOUBLE) / 1e12 AS dot
      FROM (SELECT qid, e.vec_id AS vec_id, unnest(qe) AS qv, unnest(e.embedding) AS cv
            FROM q, embeddings e WHERE e.vec_id <> qid) z
      GROUP BY qid, vec_id
    ),
    scored AS (
      SELECT qid, pairs.vec_id AS neighbor_id,
             dot / (nq.nrm * nc.nrm) AS cosine
      FROM pairs
      JOIN norms nq ON nq.vec_id = qid
      JOIN norms nc ON nc.vec_id = pairs.vec_id
    )
    SELECT qid, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                       ORDER BY cosine DESC, neighbor_id) AS rank
          FROM scored) r
    WHERE rank <= {_TOP_K}
    """,
    survey_ops=(),
    doc="Brute-force cosine top-k ANN baseline: broadcast query vectors, "
    "stream the corpus, exact-decimal dot products, per-query window top-k.",
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = _with_norm(emb.select("vec_id", "embedding"), "embedding", "nrm")
    queries = corpus.filter(col("vec_id") < _N_QUERIES).select(
        col("vec_id").alias("qid"),
        col("embedding").alias("qe"),
        col("nrm").alias("qnrm"),
    )
    pairs = corpus.join(F.broadcast(queries), col("vec_id") != col("qid"))
    scored = pairs.select(
        "qid",
        col("vec_id").alias("neighbor_id"),
        (F.expr(_DOT.format(a="qe", b="embedding")) / (col("qnrm") * col("nrm"))).alias(
            "cosine"
        ),
    )
    w = Window.partitionBy("qid").orderBy(col("cosine").desc(), col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(col("rank") <= _TOP_K)
    )


@register(
    "embedding_lsh_buckets",
    sql="""
    SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec_id,
           COUNT(DISTINCT label) AS n_labels
    FROM (
      SELECT vec_id, label,
             CAST((CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)
                + (CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END)
                + (CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END)
                + (CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END)
                + (CASE WHEN embedding[5] > 0 THEN 16 ELSE 0 END)
                + (CASE WHEN embedding[6] > 0 THEN 32 ELSE 0 END)
                + (CASE WHEN embedding[7] > 0 THEN 64 ELSE 0 END)
                + (CASE WHEN embedding[8] > 0 THEN 128 ELSE 0 END) AS BIGINT) AS bucket
      FROM embeddings
    ) t
    GROUP BY bucket
    """,
    survey_ops=(),
    doc="Sign-LSH bucket assignment (8-bit hypercube code from coordinate "
    "signs) + bucket histogram — the candidate-generation stage of "
    "LSH-bucketed ANN; at scale the knn join runs per-bucket instead of "
    "all-pairs.",
)
def embedding_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    terms = [
        F.when(F.expr(f"embedding[{i}]") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        for i in range(8)
    ]
    bucket = sum(terms[1:], terms[0]).cast("long")
    return (
        emb.select("vec_id", "label", bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.min("vec_id").alias("min_vec_id"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


@register(
    "label_centroids",
    sql="""
    SELECT label, CAST(dim AS BIGINT) AS dim,
           CAST(SUM(CAST(ROUND(CAST(v AS DOUBLE) * 1e12) AS BIGINT)) AS DOUBLE)
             / 1e12 / COUNT(*) AS centroid,
           COUNT(*) AS n
    FROM (SELECT label, unnest(embedding) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings) t
    GROUP BY label, dim
    """,
    survey_ops=("A6",),
    doc="Per-label centroid of the embedding column (posexplode to "
    "(label, dim, value), exact-decimal mean per cell) — the aggregation "
    "kernel of IVF coarse quantization / k-means steps.",
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("pos", "v")
    )
    return (
        exploded.groupBy("label", (col("pos") + 1).cast("long").alias("dim"))
        .agg(
            (
                F.sum(F.round(col("v").cast("double") * F.lit(1e12)).cast("long")).cast("double")
                / F.lit(1e12)
                / F.count(F.lit(1))
            ).alias("centroid"),
            F.count(F.lit(1)).alias("n"),
        )
    )
