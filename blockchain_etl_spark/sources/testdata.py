"""Readers for the driver's deterministic testdata (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under /root/testdata/sf*/.

Design notes for scale (SURVEY §4): we always read with an explicit column
projection downstream (never ``collect`` the raw table), so Catalyst pushes
column pruning + predicate filters into the parquet scan. At 100 TB these
would be partitioned datasets (blocks by height-range, lineitem by date);
``spark.read.parquet`` on a partitioned directory keeps the same code path.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # Pin UTC at read time so any NTZ<->LTZ coercion (and rendering of
    # collected timestamps) matches the oracle's naive-timestamp semantics
    # even when the host session was built with a different timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet. Spark 4.1 reads it as
    TIMESTAMP_NTZ truncated to micros — the canonical type for this engine
    (tz-independent, renders wall-clock like DuckDB's ``CAST(ts AS
    TIMESTAMP)`` which every oracle query uses). Older readers reject nanos
    (PARQUET_TYPE_ILLEGAL) unless the legacy ``nanosAsLong`` conf surfaces
    raw int64; ``to_ntz`` folds every reader behavior to the same NTZ
    column so plans never see an engine-version-dependent type."""
    from ..functions.timeutil import to_ntz

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    return to_ntz(df, "ts")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view (for spark.sql plans)."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# --------------------------------------------------------------------------
# Fixed-size gate corpus for the maintained-plane driver gates. The
# maintained-state ≡ raw-text-recompute contract those gates prove is
# invariant to corpus size (the reference's follower cost is per block,
# never per chain — be_db_follower.erl:86-108), so each gate ingests a
# deterministic md5-sampled document subset CAPPED at a fixed count
# regardless of sf: the correctness check is identical at every scale,
# while the gate's bench cost stops growing with the lake. The sample is
# engine-exact on both sides (Spark TakeOrderedAndProject / DuckDB ORDER
# BY ... LIMIT over md5 of the decimal doc id — the same RNG-free device
# as doc_weighted_sample), so the DuckDB oracle caps identically.
# --------------------------------------------------------------------------
GATE_DOC_CAP = 1200


def gate_cap_cte(cap: int = GATE_DOC_CAP) -> str:
    """DuckDB CTE body ``capped AS (...)`` — the oracle-side mirror of
    load_capped_documents; splice it first in a gate's WITH chain and
    read ``FROM capped`` where the Spark side reads the capped frame."""
    return f"""capped AS (
      SELECT d.* FROM documents d JOIN (
        SELECT doc_id FROM documents
        ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
        LIMIT {cap}) c USING (doc_id))"""


def load_capped_documents(
    spark: SparkSession, sf_dir: str, cap: int = GATE_DOC_CAP
) -> DataFrame:
    """documents rows whose doc_id falls in the deterministic md5-sampled
    top-``cap`` — the gate corpus. The rank runs on an ids-only frame
    (TakeOrderedAndProject: per-partition heads, no text shuffle, no
    global sort) and the winner set broadcast-joins back, so at 100 TB
    the cap costs one ids-only scan, never a corpus shuffle."""
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    ids = (
        docs.select("doc_id")
        .orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
        .limit(cap)
    )
    return docs.join(F.broadcast(ids), ["doc_id"])
