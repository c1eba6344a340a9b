"""Unigram distribution-drift primitives — ONE implementation shared by
the registered batch query (plans/text.py corpus_unigram_drift) and the
incremental state (operators/vocab_state.py), so the folded state's
drift report can be asserted BIT-IDENTICAL to the batch recompute
(the same contract functions/hll.py gives the HLL family).

Spec (engine-neutral, integer-only):
- halves   : doc_id parity (A = even, B = odd)
- counts   : raw per-half unigram counts — ADDITIVE across any document
  chunking, which is what makes incremental folds exactly equal batch
- smoothing: add-1 over the union vocabulary
- log      : whole-bit integer bitlen (length(bin(x))), the surprisal
  ladder's convention — per-token log-ratio = bitlen(ca·Nb) − bitlen(cb·Na)
- KL(P‖Q) ≈ Σ ca·d / Na, reported in millibits; negatives route through
  sign/abs (Spark div truncates, DuckDB // floors)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

TOKENS = "filter(split({c}, ' '), w -> length(w) > 0)"


def half_token_counts(docs: DataFrame) -> DataFrame:
    """RAW ``(w, ca0, cb0)`` per-half unigram counts from a documents
    frame (doc_id, text). Additive across chunkings."""
    tok = docs.select(
        (col("doc_id") % 2).alias("half"),
        F.explode(F.expr(TOKENS.format(c="text"))).alias("w"),
    )
    return tok.groupBy("w").agg(
        F.coalesce(F.sum(F.when(col("half") == 0, 1)), F.lit(0))
        .cast("long")
        .alias("ca0"),
        F.coalesce(F.sum(F.when(col("half") == 1, 1)), F.lit(0))
        .cast("long")
        .alias("cb0"),
    )


def drift_from_counts(counts: DataFrame) -> DataFrame:
    """RAW ``(w, ca0, cb0)`` counts → the 1-row drift report
    (n_tokens_a/b, vocab_a/b/shared, kl_ab/ba_millibits). Smoothing and
    the whole-bit KL happen HERE, once, so every caller is bit-identical
    by construction."""
    c = counts.select(
        (col("ca0") + 1).cast("long").alias("ca"),
        (col("cb0") + 1).cast("long").alias("cb"),
    )
    c = c.localCheckpoint()  # vocab-sized; feeds totals AND the bit terms
    t = c.agg(
        F.sum("ca").cast("long").alias("na"), F.sum("cb").cast("long").alias("nb")
    )
    d = c.crossJoin(broadcast(t)).select(
        "ca",
        "cb",
        (
            F.length(F.bin(col("ca") * col("nb")))
            - F.length(F.bin(col("cb") * col("na")))
        )
        .cast("long")
        .alias("dab"),
        "na",
        "nb",
    )
    s = d.agg(
        F.sum(col("ca") - 1).cast("long").alias("n_tokens_a"),
        F.sum(col("cb") - 1).cast("long").alias("n_tokens_b"),
        F.count(F.when(col("ca") > 1, 1)).alias("vocab_a"),
        F.count(F.when(col("cb") > 1, 1)).alias("vocab_b"),
        F.count(F.when((col("ca") > 1) & (col("cb") > 1), 1)).alias("vocab_shared"),
        F.sum(col("ca") * col("dab")).cast("long").alias("sab"),
        F.sum(col("cb") * -col("dab")).cast("long").alias("sba"),
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
    )
    return s.select(
        "n_tokens_a",
        "n_tokens_b",
        "vocab_a",
        "vocab_b",
        "vocab_shared",
        F.expr(
            "CAST(CASE WHEN sab < 0 THEN -((-sab) * 1000 div na)"
            " ELSE sab * 1000 div na END AS BIGINT)"
        ).alias("kl_ab_millibits"),
        F.expr(
            "CAST(CASE WHEN sba < 0 THEN -((-sba) * 1000 div nb)"
            " ELSE sba * 1000 div nb END AS BIGINT)"
        ).alias("kl_ba_millibits"),
    )
