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

from pyspark.sql import DataFrame, SparkSession

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
