"""Incremental MinHash/LSH index maintenance — the streaming face of the
corpus-dedup pipeline (plans/dedup.py) for a training-data lake that grows
batch by batch.

At 100 TB you cannot re-shingle the whole corpus every time a crawl lands:
the index is a persisted signature table maintained with the same MERGE
machinery as the chain inventories (operators/merge.py — versioned
write-audit-publish target, watermark replay guard). Each upsert computes
signatures for the NEW documents only (work ∝ fresh data) and merges on
doc_id; candidate generation then band-joins either the whole stored
corpus or just a probe frame against it.

Scale shape: signatures are 8 fixed-width strings per document — the
stored index is ~1e-4 of corpus bytes, and the band join shuffles on
(band_id, band_val) buckets only (plan-gated for the batch twin in
tests/test_plans.py). The incremental ≡ batch property is tested in
tests/test_lsh_index.py with a replayed chunk, mirroring the inventory
stream≡batch tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.dedup import (
    band_rows,
    lsh_candidate_pairs,
    minhash_signatures,
    shingle_rows_from_text,
)
from .merge import ParquetMergeTarget


class MinHashIndex:
    """Persisted (doc_id, mh0..mh7) signature table with incremental upsert
    and LSH candidate generation."""

    def __init__(self, path: str):
        self.target = ParquetMergeTarget(path)

    def upsert(
        self,
        spark: SparkSession,
        docs: DataFrame,
        watermark: "int | None" = None,
        shingles: "DataFrame | None" = None,
    ) -> DataFrame:
        """Shingle + sign ONLY ``docs`` (doc_id, text) and MERGE into the
        stored signatures: new ids insert, re-crawled ids overwrite (update
        wins ties, so a replayed batch converges). ``watermark``: monotone
        batch id making replays of non-idempotent upstream chunking
        exactly-once, as in the chain inventories. ``shingles``: the
        batch's precomputed (doc_id, shingle) rows — callers folding the
        SAME batch into several shingle-grain planes (DocIngest) pass one
        shared frame so the text is shingled once per batch, not once per
        plane; must equal shingle_rows_from_text(docs)."""
        from .merge import merge_latest

        if shingles is None:
            shingles = shingle_rows_from_text(docs)
        sig = minhash_signatures(shingles)
        return self.target.merge_with(
            spark,
            sig,
            lambda target, upd: merge_latest(
                target, upd, keys=["doc_id"], order=["doc_id"]
            ),
            watermark=watermark,
        )

    def upsert_coalesced(
        self,
        spark: SparkSession,
        batches: "list[tuple[int, DataFrame]]",
    ) -> bool:
        """Catch-up fold: sign several pending crawl batches and merge
        them in ONE publish. Signatures are keyed latest-wins on doc_id,
        so for id-disjoint batches this is EXACTLY the sequential-upsert
        state (property-tested); a doc appearing in several batches
        would need per-step text history and is rejected — replay those
        through ``upsert`` in order. The companion of
        ComponentIndex.upsert_coalesced for a follower healing a gap."""
        wm0 = self.target.watermark()
        todo = [(wm, docs) for wm, docs in batches if wm > wm0]
        if not todo:
            return False
        if [wm for wm, _ in todo] != sorted({wm for wm, _ in todo}):
            # validate BEFORE any publish (matches ComponentIndex) — and
            # makes todo[-1] the true max high-mark below
            raise ValueError(
                "upsert_coalesced: watermarks must be strictly increasing"
            )
        from pyspark.sql import functions as F

        union = todo[0][1].select("doc_id", "text")
        for _, docs in todo[1:]:
            union = union.unionByName(docs.select("doc_id", "text"))
        dup = union.groupBy("doc_id").count().filter(F.col("count") > 1)
        if dup.take(1):
            raise ValueError(
                "upsert_coalesced: a doc id appears in more than one "
                "batch — its intermediate text would be lost; replay "
                "those batches through upsert() in order instead"
            )
        self.upsert(spark, union, watermark=todo[-1][0])
        return True

    def delete(
        self, spark: SparkSession, doc_ids: DataFrame, watermark: "int | None" = None
    ) -> bool:
        """Drop the signatures of ``doc_ids`` (a frame with a doc_id
        column) — the retraction path for deleted documents, so their LSH
        band rows stop generating candidate edges. Absent ids are a no-op;
        watermark-replayed batches are skipped (returns False)."""
        if watermark is not None and watermark <= self.target.watermark():
            return False
        from pyspark.sql import functions as F

        from ..plans.dedup import _NUM_HASHES

        keys = doc_ids.select("doc_id").localCheckpoint(eager=False)

        def drop(target: DataFrame | None, upd: DataFrame) -> DataFrame:
            if target is None:  # nothing indexed: empty signature table
                return upd.select(
                    "doc_id",
                    *[
                        F.lit(None).cast("string").alias(f"mh{k}")
                        for k in range(_NUM_HASHES)
                    ],
                ).limit(0)
            return target.join(upd, ["doc_id"], "left_anti")

        self.target.merge_with(spark, keys, drop, watermark=watermark)
        return True

    def signatures(self, spark: SparkSession) -> DataFrame:
        sig = self.target.read(spark)
        if sig is None:
            raise FileNotFoundError(self.target.path)
        return sig

    def candidate_pairs(self, spark: SparkSession) -> DataFrame:
        """All near-dup candidate pairs within the stored corpus — equal to
        the batch dedup_minhash_lsh over the union of every upsert."""
        return lsh_candidate_pairs(band_rows(self.signatures(spark)))

    def probe(self, spark: SparkSession, docs: DataFrame) -> DataFrame:
        """Candidates between incoming ``docs`` and the STORED corpus only
        (doc_a = stored id, doc_b = probe id): the pre-ingest "is this
        crawl page already in the lake?" check. Band join cost ∝ probe
        size, never corpus²."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import col

        probe_bands = band_rows(minhash_signatures(shingle_rows_from_text(docs)))
        stored = band_rows(self.signatures(spark))
        return (
            stored.select(
                col("doc_id").alias("doc_a"), "band_id", "band_val"
            )
            .join(
                probe_bands.select(
                    col("doc_id").alias("doc_b"), "band_id", "band_val"
                ),
                ["band_id", "band_val"],
            )
            .filter(col("doc_a") != col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("bands_hit"))
        )
