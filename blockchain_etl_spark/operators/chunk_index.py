"""Incremental chunk document-frequency index — the streaming face of
span-level boilerplate pruning (plans/text.py::doc_boilerplate_prune) for a
corpus that grows crawl by crawl.

At 100 TB you cannot re-chunk the whole lake to learn which spans are
boilerplate every time a crawl lands: the index keeps two persisted tables
maintained with the inventory MERGE machinery (operators/merge.py —
versioned write-audit-publish, watermark replay guard):

- ``df``   — (chunk_hash, doc_df): how many distinct documents contain each
  16-token chunk. Maintained by ADDITIVE deltas (+1 per new doc containing
  the chunk, -1 per chunk of a re-crawled doc's PREVIOUS text), so each
  upsert's work is ∝ fresh data, never corpus size.
- ``docs`` — (doc_id, chunk_hashes): each document's distinct chunk set,
  merged latest-wins. Exists only so a re-crawl can retract its old
  chunks' df contributions exactly.

Crash ordering: the df merge runs FIRST (its deltas read the docs table as
of the previous publish), then the docs table merges. If the process dies
between the two, the replay's df merge is skipped by the watermark guard
while the docs merge (latest-wins, idempotent) re-applies — state converges
to exactly the once-applied result. The incremental ≡ batch property (any
chunking, with re-crawls and replays) is tested in tests/test_chunk_index.py.

Scale shape: stored rows are md5 hashes (32 bytes per chunk ≈ 1/3 of the
chunk's text bytes for hashes of 16-token spans, and the df table holds one
row per DISTINCT chunk); every merge shuffles on chunk_hash or doc_id only.
``clean()`` prunes an incoming frame against the stored df with one
broadcast-or-bucket join — the pre-training boilerplate filter that never
rescans the lake.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..plans.text import _BP_DF, chunk_rows_from_text, prune_chunks_with_df
from .merge import ParquetMergeTarget, merge_accumulate, merge_latest


class ChunkDFIndex:
    """Persisted chunk document-frequency state with incremental upsert,
    boilerplate-set extraction, and incoming-frame pruning."""

    def __init__(self, path: str):
        self.df_target = ParquetMergeTarget(os.path.join(path, "df"))
        self.docs_target = ParquetMergeTarget(os.path.join(path, "docs"))

    def upsert(
        self, spark: SparkSession, docs: DataFrame, watermark: "int | None" = None
    ) -> DataFrame:
        """Chunk ONLY ``docs`` (doc_id, text), apply ±1 df deltas (new text
        adds, a re-crawled doc's previous text retracts), and merge both
        tables. Returns the merged df table."""
        new_sets = (
            chunk_rows_from_text(docs)
            .select("doc_id", "chunk_hash")
            .distinct()
            .localCheckpoint(eager=False)  # reused by the delta union AND
            # the docs merge; the df merge's publish materializes it
        )
        pos = new_sets.select("chunk_hash", F.lit(1).cast("long").alias("doc_df"))
        old_docs = self.docs_target.read(spark)
        if old_docs is not None:
            recrawled = old_docs.join(
                docs.select("doc_id").distinct(), ["doc_id"]
            )
            neg = recrawled.select(
                F.explode("chunk_hashes").alias("chunk_hash"),
                F.lit(-1).cast("long").alias("doc_df"),
            )
            deltas = pos.unionByName(neg)
        else:
            deltas = pos
        deltas = deltas.groupBy("chunk_hash").agg(F.sum("doc_df").alias("doc_df"))

        merged = self.df_target.merge_with(
            spark,
            deltas,
            lambda target, upd: merge_accumulate(
                target, upd, keys=["chunk_hash"], sum_cols=["doc_df"]
            ).filter(col("doc_df") > 0),
            watermark=watermark,
        )
        doc_sets = new_sets.groupBy("doc_id").agg(
            F.array_sort(F.collect_set("chunk_hash")).alias("chunk_hashes")
        )
        self.docs_target.merge_with(
            spark,
            doc_sets,
            lambda target, upd: merge_latest(
                target, upd, keys=["doc_id"], order=["doc_id"]
            ),
            watermark=watermark,
        )
        return merged

    def doc_df(self, spark: SparkSession) -> DataFrame:
        df = self.df_target.read(spark)
        if df is None:
            raise FileNotFoundError(self.df_target.path)
        return df

    def boilerplate_hashes(
        self, spark: SparkSession, min_df: int = _BP_DF
    ) -> DataFrame:
        """(chunk_hash) set of spans currently considered boilerplate."""
        return self.doc_df(spark).filter(col("doc_df") >= min_df).select("chunk_hash")

    def clean(
        self, spark: SparkSession, docs: DataFrame, min_df: int = _BP_DF
    ) -> DataFrame:
        """Prune an incoming (doc_id, text) frame against the STORED df:
        (doc_id, n_chunks, n_pruned, clean_text). Chunks the index has
        never seen count as df=0 (kept). When the index holds the full
        corpus this equals the batch doc_boilerplate_prune."""
        chunks = chunk_rows_from_text(docs)
        with_df = chunks.join(self.doc_df(spark), ["chunk_hash"], "left").select(
            "doc_id",
            "i",
            "chunk_text",
            F.coalesce("doc_df", F.lit(0).cast("long")).alias("doc_df"),
        )
        return prune_chunks_with_df(with_df, min_df=min_df)
