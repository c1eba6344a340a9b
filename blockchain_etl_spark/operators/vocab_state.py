"""Incrementally maintained unigram-drift state — the streaming twin of
the registered ``corpus_unigram_drift`` query (plans/text.py), built the
way ``operators/hll_state.py`` maintains the portable HLL: raw per-half
token counts live in a watermark-guarded ``ParquetMergeTarget``, each
document batch folds ADDITIVE count partials (merge_accumulate), and the
read side computes the add-1-smoothed whole-bit KL through the SAME
``functions/drift.py`` code the batch query uses — so the folded state's
drift report is BIT-IDENTICAL to the batch recompute at any chunking,
under replays, and across restarts (tests/test_vocab_state.py).

This is the crawl-pipeline telemetry loop: every ingested batch updates
the distribution counters in O(batch vocab), and ``read_drift()`` answers
"how far has the corpus distribution moved?" without ever rescanning the
corpus — the reference's trigger-maintained stats counters
(src/be_db_stats.erl:63-99) applied to a language-model statistic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import col

from ..functions.drift import drift_from_counts, half_token_counts
from .merge import ParquetMergeTarget, merge_accumulate


class UnigramDriftState:
    """(w, ca0, cb0) raw count state; fold batches, read the drift."""

    def __init__(self, path: str):
        self.target = ParquetMergeTarget(path)

    def watermark(self) -> int:
        return self.target.watermark()

    def fold(self, spark: SparkSession, docs: DataFrame, watermark: int) -> None:
        """Fold one document batch's per-half token counts into the
        state. Counts are additive, so any chunking of the corpus folds
        to the same state; the merge watermark makes a replayed batch a
        no-op (exactly-once under the ingest's crash-replay model)."""
        partial = half_token_counts(docs)
        self.target.merge_with(
            spark,
            partial,
            lambda tgt, upd: merge_accumulate(
                tgt, upd, keys=["w"], sum_cols=["ca0", "cb0"]
            ),
            watermark=watermark,
        )

    def read_counts(self, spark: SparkSession) -> DataFrame | None:
        return self.target.read(spark)

    def read_drift(self, spark: SparkSession) -> DataFrame | None:
        """The 1-row drift report over the folded state — same columns,
        same integer spec, same CODE as the batch query's read side."""
        counts = self.read_counts(spark)
        if counts is None:
            return None
        return drift_from_counts(counts)


class ShingleVocabState:
    """Maintained Heaps'-law telemetry — the streaming twin of the
    ``corpus_heaps_curve`` query (plans/text.py), where the checkpoints
    are CRAWL BATCHES instead of doc-id deciles: exactly the boundaries a
    100 TB ingest already materializes, so the stop-crawling signal
    (marginal novelty per batch) is available the moment a crawl lands,
    without a corpus rescan or a global sort.

    Two persisted tables (operators/merge.py machinery):

    - ``vocab`` — (shingle, first_batch): every distinct word-3-gram
      shingle seen so far, stamped with the batch that introduced it.
      The fold appends ONLY absent shingles (anti-join), so re-applying
      a crashed batch is idempotent and the batch's novel-shingle count
      stays derivable after any replay (count of rows stamped with that
      batch — the reason the stamp exists).
    - ``curve`` — one row per folded batch: cumulative docs / postings /
      vocabulary plus cumulative and MARGINAL novelty ppm. Commits LAST
      with the batch watermark, so it is the replay guard: a crash
      between the two merges replays the batch, the vocab merge skips
      (watermark), and the curve row is recomputed from deterministic
      inputs — state converges to the once-applied result (the
      operators/chunk_index.py crash-ordering contract).

    Maintained ≡ batch: every curve row equals the batch Heaps recompute
    over the union of batches up to that point
    (tests/test_vocab_state.py); the driver-facing proof is the
    ``corpus_novelty_maintained`` registered query, whose oracle
    recomputes the per-checkpoint curve from raw text.

    Scale shape per fold: shingle the batch once (batch-sized), ONE
    anti-join against the vocab table (the fresh set is counted and
    appended verbatim — no per-fold re-aggregate of the cumulative
    vocab; vocab_size rides the curve row as a running total), one
    batch-sized postings aggregate, one appended row. Nothing rescans
    the corpus, and the only stamp-derived full-vocab count sits on the
    rare crash-replay path.
    """

    def __init__(self, path: str):
        self.vocab = ParquetMergeTarget(os.path.join(path, "vocab"))
        self.curve = ParquetMergeTarget(os.path.join(path, "curve"))

    def watermark(self) -> int:
        return self.curve.watermark()

    def fold(
        self,
        spark: SparkSession,
        docs: DataFrame,
        watermark: int,
        shingles: "DataFrame | None" = None,
    ) -> bool:
        """Fold one crawl batch (doc_id, text); returns False on a
        replayed (already-curved) batch. ``shingles``: precomputed
        (doc_id, shingle) rows for the batch (see MinHashIndex.upsert) —
        must equal shingle_rows_from_text(docs)."""
        from ..plans.dedup import shingle_rows_from_text

        if watermark <= self.curve.watermark():
            return False
        sh = (
            shingles
            if shingles is not None
            else shingle_rows_from_text(docs).localCheckpoint(eager=False)
        )

        # Per-batch work ∝ batch: the novel-shingle set is the batch's
        # distinct shingles anti-joined against the vocab ONCE, counted,
        # and appended verbatim — no cumulative-table re-aggregate per
        # fold. vocab_size rides the curve row as a running total.
        # nd counts every batch doc (a sub-3-token doc contributes no
        # shingles but is still a crawled document); np counts distinct
        # (doc, shingle) postings
        batch_agg = docs.select("doc_id").distinct().join(
            sh.select("doc_id", "shingle"), ["doc_id"], "left"
        ).agg(
            F.count("shingle").cast("long").alias("np"),
            F.countDistinct("doc_id").cast("long").alias("nd"),
        )
        if self.vocab.watermark() >= watermark:
            # crash-replay window (vocab committed, curve not): the
            # anti-join would now find nothing, so derive the batch's
            # novel count from the first_batch stamp instead — the rare
            # path the stamp exists for.
            fresh_agg = (
                self.vocab.read(spark)
                .filter(col("first_batch") == watermark)
                .agg(F.count(F.lit(1)).cast("long").alias("n_new"))
            )
            fresh = None
        else:
            fresh = sh.select("shingle").distinct()
            old = self.vocab.read(spark)
            if old is not None:
                fresh = fresh.join(
                    old.select("shingle"), ["shingle"], "left_anti"
                )
            fresh = fresh.withColumn(
                "first_batch", F.lit(watermark).cast("long")
            ).localCheckpoint(eager=False)
            fresh_agg = fresh.agg(
                F.count(F.lit(1)).cast("long").alias("n_new")
            )
        # ONE action serves both counters (1-row cross join of the two
        # aggregates); it also materializes fresh's checkpoint, which the
        # vocab merge below then reuses — one job instead of two.
        batch = batch_agg.crossJoin(fresh_agg).collect()[0]
        n_new = int(batch["n_new"])
        if fresh is not None:
            self.vocab.merge_with(
                spark,
                fresh,
                lambda tgt, u: u if tgt is None else tgt.unionByName(u),
                watermark=watermark,
            )
        prev = self._last_row(spark)
        n_docs = prev["n_docs"] + int(batch["nd"])
        n_postings = prev["n_postings"] + int(batch["np"])
        vocab_size = prev["vocab_size"] + int(n_new)
        row = [
            (
                int(watermark),
                n_docs,
                n_postings,
                vocab_size,
                vocab_size * 1_000_000 // n_postings if n_postings else 0,
                int(n_new),
                int(n_new) * 1_000_000 // int(batch["np"])
                if int(batch["np"])
                else 0,
            )
        ]
        from ..functions.localframe import local_df

        upd = local_df(
            spark,
            row,
            "batch_id long, n_docs long, n_postings long, vocab_size long, "
            "novelty_ppm long, n_new_shingles long, batch_novelty_ppm long",
        )
        self.curve.merge_with(
            spark,
            upd,
            lambda tgt, u: u if tgt is None else tgt.unionByName(u),
            watermark=watermark,
        )
        return True

    def _last_row(self, spark: SparkSession) -> dict:
        zero = {"n_docs": 0, "n_postings": 0, "vocab_size": 0}
        cur = self.curve.read(spark)
        if cur is None:
            return zero
        rows = cur.orderBy(col("batch_id").desc()).limit(1).collect()
        if not rows:
            return zero
        return {
            "n_docs": rows[0]["n_docs"],
            "n_postings": rows[0]["n_postings"],
            "vocab_size": rows[0]["vocab_size"],
        }

    def read_curve(self, spark: SparkSession) -> DataFrame | None:
        """(batch_id, n_docs, n_postings, vocab_size, novelty_ppm,
        n_new_shingles, batch_novelty_ppm) — one row per folded crawl,
        batch_id ascending = the maintained Heaps curve."""
        cur = self.curve.read(spark)
        return None if cur is None else cur
