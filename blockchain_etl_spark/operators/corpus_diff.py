"""Snapshot diff between two corpus versions — the dataset-versioning
primitive of an iterative training-data pipeline: which documents were
added, removed, or edited between snapshot N and snapshot N+1 (so
downstream shards/indexes can be refreshed incrementally rather than
rebuilt, cf. the incremental inventory maintenance in streaming/ingest).

Scale shape: ONE full-outer shuffle join on the document key; content
comparison is by md5 computed map-side, so only (key, hash) pairs are
compared — never the text bodies. In production both snapshots would be
bucketed by doc_id on disk (sources/lake.py), making the join
exchange-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import col


def corpus_diff(old: DataFrame, new: DataFrame, key: str = "doc_id",
                content: str = "text") -> DataFrame:
    """Full-outer diff of two (key, content) frames.

    Returns one row per key present in either snapshot with
    ``change_type`` in {'added', 'removed', 'changed', 'unchanged'} and
    the two content hashes (NULL on the absent side).
    """
    o = old.select(col(key).alias("k"), F.md5(content).alias("old_hash"))
    n = new.select(col(key).alias("k"), F.md5(content).alias("new_hash"))
    return (
        o.join(n, ["k"], "full_outer")
        .select(
            col("k").alias(key),
            "old_hash",
            "new_hash",
            F.when(col("old_hash").isNull(), F.lit("added"))
            .when(col("new_hash").isNull(), F.lit("removed"))
            .when(col("old_hash") != col("new_hash"), F.lit("changed"))
            .otherwise(F.lit("unchanged"))
            .alias("change_type"),
        )
    )


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-change-type counts — the dataset-card delta line."""
    return diff.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_docs"))
