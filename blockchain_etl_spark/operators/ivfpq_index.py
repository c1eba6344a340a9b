"""Persisted IVF-PQ index — the FAISS-style disk layout that makes ANN over
a 100 TB embedding corpus tractable end to end: the coarse quantizer prunes
WHICH partitions a probe reads (IVF, directory-level pruning like
operators/ann_index.py), and product-quantized codes shrink WHAT those
partitions hold by ~42x (6 bytes of codes per 64-dim vector), so the probed
candidate set is scored without ever decompressing the corpus. A small
cell-partitioned full-vector store serves the final exact rerank over the
ADC shortlist only.

Layout:
  <path>/centroids/              coarse quantizer (k rows, driver-sized)
  <path>/codebook/               per-subspace PQ codewords (M*K rows)
  <path>/codes/cell=N/seg=M/     (vec_id, codes) — the compressed corpus
  <path>/vectors/cell=N/seg=M/   (vec_id, vf) — fixed-point rerank store
  <path>/id_inventory/           vec_id → latest (seg, cell) staleness ledger

Lifecycle mirrors operators/ann_index.py: ``build()`` writes everything
as one ``seg=0`` generation; ``upsert()`` encodes a fresh batch against
the FROZEN quantizers (coarse centroids + PQ codebook — codebook refresh
is a rebuild decision, operators/kmeans.py's job), appends one new
segment under each touched cell in BOTH row stores, and advances the
inventory so queries drop superseded codes AND superseded rerank rows;
``compact()`` folds the segment pile back to one segment per cell in a
fresh generation. All three publish through a single atomic pointer
flip.

Build is deterministic (md5-sampled coarse centroids and codebook seeds —
no RNG, same corpus in → byte-identical index out, the retrain contract the
rest of the repo keeps). Query = probe cells from broadcast centroids →
pruned read of probed ``codes`` partitions → ADC scoring against a
broadcast |queries|*M*K lookup table → top-``shortlist`` per query → pruned
read of probed ``vectors`` partitions filtered to shortlist ids → exact
integer squared-L2 rerank → top-k. The coarse stage ranks cells by the
same fixed-point cosine as the IVF index; the fine stage is L2 over the
fixed-point grid (the PQ distance domain).

tests/test_ivfpq_index.py gates: recall@k against the exact ground truth,
partition pruning via inputFiles(), and build determinism.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

from ..plans.similarity import (
    _PQ_K,
    _PQ_SUB_D2,
    _pq_encode,
    _with_norm,
    pq_subvectors_from,
)
from .ann_index import IVFIndex, VectorIndexMaintenance
from .generations import GenerationalLayout

_FP = "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"


class IVFPQIndex(VectorIndexMaintenance, GenerationalLayout):
    """Cell-partitioned PQ-compressed ANN index with an exact-rerank store.

    The four stores (centroids, codebook, codes, vectors) are rebuilt
    into a fresh GENERATION directory and published with one pointer flip
    (operators/generations.py) — without it, a crash between the
    sequential store writes serves a hybrid index (new centroids against
    old codes), which is silently wrong rather than merely stale."""

    _LEGACY_STORES = ("centroids", "codebook", "codes", "vectors", "id_inventory")

    def __init__(self, path: str):
        self.path = path

    def _p(self, name: str) -> str:
        return self._store(name)

    def _inventory(self):
        from .merge import ParquetMergeTarget

        return ParquetMergeTarget(self._store("id_inventory"))

    def _encode_assigned(self, spark: SparkSession, corpus: DataFrame, seg: int):
        """Assign ``corpus`` (vec_id, embedding, nrm, vf) to cells against
        the LIVE generation's coarse quantizer and PQ-encode against its
        codebook: (assigned rows, packed code rows) — the upsert encode
        kernel (build encodes against its not-yet-published generation's
        stores, and compact never re-encodes)."""
        cent = spark.read.parquet(self._p("centroids"))
        codebook = spark.read.parquet(self._p("codebook"))
        assigned = (
            IVFIndex._nearest_cells(corpus, cent, 1)
            .withColumn("vf", F.expr(_FP))
            .select("vec_id", "vf", "cell", F.lit(seg).cast("long").alias("seg"))
        ).localCheckpoint()  # feeds codes, vectors, and the inventory
        codes = _pq_encode(
            pq_subvectors_from(assigned.select("vec_id", "vf")), codebook
        )
        packed = codes.groupBy("vec_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        return assigned, packed

    def upsert(
        self, spark: SparkSession, vectors: DataFrame, watermark: int | None = None
    ) -> bool:
        """Fold fresh/updated vectors into the compressed index WITHOUT
        rebuilding: encode against the FROZEN coarse quantizer and PQ
        codebook, append one new segment's files under each touched cell
        in BOTH stores (codes and the exact-rerank vectors — they must
        stay row-for-row aligned or the rerank silently drops shortlist
        hits), then advance the vec_id → (seg, cell) inventory. Work is
        O(batch); the stored corpus is never rescanned. The inventory
        merge is the single publish point — segment files written before
        a crash are invisible until it commits, and a replayed batch
        dynamically overwrites the same seg partitions (write-audit-
        publish, exactly the operators/ann_index.py upsert contract).
        Returns False on a watermark-replayed batch."""
        inv = self._inventory()
        if watermark is not None and watermark <= inv.watermark():
            return False
        seg = int(inv.current_version())
        # no vf projection here: _nearest_cells keeps scoring columns
        # only, and _encode_assigned re-derives vf from the surviving
        # embedding column
        corpus = _with_norm(
            vectors.select("vec_id", "embedding"), "embedding", "nrm"
        )
        assigned, packed = self._encode_assigned(spark, corpus, seg)
        (
            packed.join(assigned.select("vec_id", "cell", "seg"), ["vec_id"])
            .repartition("cell")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("cell", "seg")
            .parquet(self._p("codes"))
        )
        assigned.select("vec_id", "vf", "cell", "seg").repartition(
            "cell"
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("cell", "seg").parquet(self._p("vectors"))
        inv.merge(
            spark,
            assigned.select(
                "vec_id", "seg", "cell", F.lit(1).cast("long").alias("upserted")
            ),
            keys=["vec_id"],
            order=["seg"],
            watermark=watermark,
        )
        return True

    def delete(self, spark: SparkSession, ids: DataFrame, watermark: int | None = None) -> bool:
        """Tombstone vectors (see IVFIndex.delete): inventory rows go,
        both stores' copies become invisible to the staleness filter,
        compact() reclaims the bytes."""
        from .ann_index import _tombstone_ids

        return _tombstone_ids(self._inventory(), spark, ids, watermark)

    def compact(self, spark: SparkSession) -> None:
        """Fold the per-cell segment pile into ONE consolidated segment
        per cell in a fresh generation — the LSM merge, PQ edition: the
        LIVE rows of both row stores (codes and rerank vectors, selected
        by the same inventory filter queries serve) are rewritten as
        ``seg=0``; centroids and codebook copy unchanged (compaction
        never re-encodes — the codes are already against the frozen
        codebook). The fresh single-segment inventory carries the old
        watermark so the upsert stream resumes transparently; the
        generation pointer flip is the single commit point, so a crash
        mid-compact leaves the old index serving."""
        old_gen = self._gen()
        inv = self._inventory()
        wm = inv.watermark()
        latest = inv.read(spark)
        # zero live rows → skip: an all-tombstoned compact would write
        # part-file-less store directories the next compact cannot read
        # (see IVFIndex.compact); queries are already empty via the
        # live-cell intersection.
        if latest is None or not latest.take(1):
            return
        new_gen = old_gen + 1
        gdir = self._gen_dir(new_gen)
        for store in ("centroids", "codebook"):
            spark.read.parquet(self._p(store)).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(gdir, store))
        for store in ("codes", "vectors"):
            data = spark.read.option("basePath", self._p(store)).parquet(self._p(store))
            live = self._stale_filtered(spark, data).withColumn(
                "seg", F.lit(0).cast("long")
            )  # single consumer per store; the inventory comes from `latest`
            live.repartition("cell").write.mode("overwrite").partitionBy(
                "cell", "seg"
            ).parquet(os.path.join(gdir, store))
        from .merge import ParquetMergeTarget

        # fresh single-segment inventory straight from the old one (the
        # live-id truth): seg resets, the post-freeze ``upserted`` flag
        # carries forward (the quantizers copied frozen above)
        ninv = ParquetMergeTarget(os.path.join(gdir, "id_inventory"))
        ninv.merge(
            spark,
            latest.select(
                "vec_id",
                F.lit(0).cast("long").alias("seg"),
                "cell",
                self._upserted_col(latest).alias("upserted"),
            ),
            keys=["vec_id"],
            order=["seg"],
            watermark=wm if wm >= 0 else None,
        )
        self._publish_gen(new_gen)
        self._retire_gen(old_gen, self._LEGACY_STORES)

    def build(
        self, spark: SparkSession, vectors: DataFrame, n_cells: int = 8
    ) -> None:
        """``vectors``: (vec_id, embedding). Deterministic build, atomic
        at the generation-pointer flip."""
        old_gen = self._gen()
        gdir = self._gen_dir(old_gen + 1)

        def _np(name: str) -> str:  # store path in the NEW generation
            return os.path.join(gdir, name)

        # corpus keeps vf here: the codebook SEEDS below take their
        # subvectors straight from it (unlike upsert, where assignment
        # re-derives vf)
        corpus = _with_norm(
            vectors.select("vec_id", "embedding"), "embedding", "nrm"
        ).withColumn("vf", F.expr(_FP))
        # coarse quantizer: RNG-free md5 sample (same rule as IVFIndex)
        cent = (
            corpus.withColumn("__r", F.md5(col("vec_id").cast("string")))
            .orderBy("__r")
            .limit(n_cells)
            .withColumn("cell", F.row_number().over(Window.orderBy("__r")) - 1)
            .select("cell", col("embedding").alias("cvec"), col("nrm").alias("cnrm"))
        )
        cent.coalesce(1).write.mode("overwrite").parquet(_np("centroids"))
        cent_r = spark.read.parquet(_np("centroids"))

        # PQ codebook: subvectors of the k smallest-md5 vectors, codes
        # 0..K-1 in md5 order (deterministic; corpus ids are arbitrary so
        # the plans' vec_id < K rule does not apply here)
        seeds = (
            corpus.withColumn("__r", F.md5(col("vec_id").cast("string")))
            .orderBy("__r")
            .limit(_PQ_K)
            .withColumn("code", F.row_number().over(Window.orderBy("__r")) - 1)
            .select(col("code").cast("long").alias("code"), "vf")
        )
        codebook = pq_subvectors_from(
            seeds.select(col("code").alias("vec_id"), "vf")
        ).select("sub", col("vec_id").alias("code"), col("subvec").alias("cvec"))
        codebook.coalesce(1).write.mode("overwrite").parquet(_np("codebook"))
        codebook_r = spark.read.parquet(_np("codebook"))

        # _nearest_cells projects the scoring columns only — re-derive the
        # fixed-point vector from the surviving embedding column. seg=0:
        # the rebuild is the consolidated base segment the upsert stream
        # appends after (seg numbering restarts with the generation).
        assigned = (
            IVFIndex._nearest_cells(corpus, cent_r, 1)
            .withColumn("vf", F.expr(_FP))
            .select("vec_id", "vf", "cell", F.lit(0).cast("long").alias("seg"))
        ).localCheckpoint()
        # encode against the stored codebook; pack one row per vector
        codes = _pq_encode(
            pq_subvectors_from(assigned.select("vec_id", "vf")), codebook_r
        )
        packed = codes.groupBy("vec_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "code"))),
                lambda s: s["code"],
            ).alias("codes")
        )
        (
            packed.join(assigned.select("vec_id", "cell", "seg"), ["vec_id"])
            .repartition("cell")
            .write.mode("overwrite")
            .partitionBy("cell", "seg")
            .parquet(_np("codes"))
        )
        # exact-rerank store: fixed-point vectors, same partitioning
        assigned.select("vec_id", "vf", "cell", "seg").repartition(
            "cell"
        ).write.mode("overwrite").partitionBy("cell", "seg").parquet(_np("vectors"))
        from .merge import ParquetMergeTarget

        ParquetMergeTarget(os.path.join(gdir, "id_inventory")).merge(
            spark,
            assigned.select(
                "vec_id", "seg", "cell", F.lit(0).cast("long").alias("upserted")
            ),
            keys=["vec_id"],
            order=["seg"],
        )
        self._publish_gen(old_gen + 1)  # all five stores flip together
        self._retire_gen(old_gen, self._LEGACY_STORES)

    def _pruned(self, spark: SparkSession, name: str, cells: "list[int]") -> DataFrame:
        base = self._p(name)
        return spark.read.option("basePath", base).parquet(
            *[os.path.join(base, f"cell={c}") for c in sorted(cells)]
        )

    def query(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        probes: int = 2,
        shortlist: int = 50,
    ) -> DataFrame:
        """(qid, embedding) → (qid, neighbor_id, d2_fp, rank ≤ k)."""
        cent = spark.read.parquet(self._p("centroids"))
        codebook = spark.read.parquet(self._p("codebook")).localCheckpoint()
        q = _with_norm(
            queries.select(col("qid").alias("vec_id"), "embedding"), "embedding", "nrm"
        ).withColumn("vf", F.expr(_FP))
        probe_cells = IVFIndex._nearest_cells(q, cent, probes).select(
            col("vec_id").alias("qid"), "cell"
        )
        cells = [r.cell for r in probe_cells.select("cell").distinct().collect()]
        # a probed cell may hold no LIVE vectors (fully superseded, then
        # compacted away — the centroid outlives its population): keep
        # only inventory-live cells so the explicit-path pruned reads
        # never enumerate a missing directory.
        inv_df = self._inventory().read(spark)
        if inv_df is not None:
            live_cells = {r.cell for r in inv_df.select("cell").distinct().collect()}
            cells = [c for c in cells if c in live_cells]
        if not cells:
            return spark.createDataFrame(
                [], "qid long, neighbor_id long, d2_fp long, rank long"
            )

        # ADC over the probed, compressed partitions only
        qsubs = pq_subvectors_from(q.select("vec_id", "vf"))
        lut = (
            qsubs.select(col("vec_id").alias("qid"), "sub", col("subvec").alias("qsub"))
            .join(broadcast(codebook), ["sub"])
            .select(
                "qid",
                "sub",
                "code",
                F.expr(_PQ_SUB_D2.format(a="qsub", b="cvec")).alias("lut_d2"),
            )
            .localCheckpoint()  # tiny; avoids re-deriving under the broadcast
        )
        codes = self._stale_filtered(spark, self._pruned(spark, "codes", cells))
        cand = (
            broadcast(probe_cells)
            .join(codes, ["cell"])
            .select(
                "qid",
                "vec_id",
                F.posexplode("codes").alias("sub", "code"),
            )
            .withColumn("sub", col("sub").cast("long"))
        )
        adc = (
            cand.join(broadcast(lut), ["qid", "sub", "code"])
            .filter(col("vec_id") != col("qid"))
            .groupBy("qid", "vec_id")
            .agg(F.sum("lut_d2").alias("adc_d2_fp"))
        )
        ws = Window.partitionBy("qid").orderBy(col("adc_d2_fp"), col("vec_id"))
        short = (
            adc.withColumn("__rn", F.row_number().over(ws))
            .filter(col("__rn") <= shortlist)
            .select("qid", "vec_id")
        )

        # exact rerank: pruned vector read, shortlist ids ride a broadcast
        vecs = self._stale_filtered(
            spark, self._pruned(spark, "vectors", cells)
        ).select("vec_id", "vf")
        qv = q.select(col("vec_id").alias("qid"), col("vf").alias("qvf"))
        exact = (
            vecs.join(broadcast(short), ["vec_id"])
            .join(broadcast(qv), ["qid"])
            .select(
                "qid",
                "vec_id",
                F.expr(_PQ_SUB_D2.format(a="vf", b="qvf")).alias("d2_fp"),
            )
        )
        wk = Window.partitionBy("qid").orderBy(col("d2_fp"), col("vec_id"))
        return (
            exact.withColumn("rank", F.row_number().over(wk).cast("long"))
            .filter(col("rank") <= k)
            .select("qid", col("vec_id").alias("neighbor_id"), "d2_fp", "rank")
        )

    def recall_probe(
        self,
        spark: SparkSession,
        k: int = 5,
        probes: int = 2,
        shortlist: int = 50,
        n_queries: int = 16,
    ) -> dict:
        """Measured recall@k of the PQ probe (cells → ADC → exact rerank)
        against exact brute-force fixed-point L2 over the LIVE rerank
        store, on a deterministic md5 sample — the drift monitor for BOTH
        frozen quantizers (coarse cells and the PQ codebook). See
        IVFIndex.recall_probe for the cost shape and
        needs_rebuild for the trigger policy."""
        vecs = self._stale_filtered(
            spark,
            spark.read.option("basePath", self._p("vectors")).parquet(
                self._p("vectors")
            ),
        ).select("vec_id", "vf").localCheckpoint()
        q = (
            vecs.withColumn("__r", F.md5(col("vec_id").cast("string")))
            .orderBy("__r")
            .limit(n_queries)
            .select(col("vec_id").alias("qid"), col("vf").alias("qvf"))
            .localCheckpoint()
        )
        exact = (
            vecs.join(broadcast(q))
            .filter(col("vec_id") != col("qid"))
            .select(
                "qid",
                "vec_id",
                F.expr(_PQ_SUB_D2.format(a="vf", b="qvf")).alias("d2"),
            )
        )
        w = Window.partitionBy("qid").orderBy(col("d2"), col("vec_id"))
        truth = {
            (r.qid, r.vec_id)
            for r in exact.withColumn("__rn", F.row_number().over(w))
            .filter(col("__rn") <= k)
            .collect()
        }
        # queries need the float embedding for the probe path: reconstruct
        # from the fixed-point grid (vf = round(x*1e6) — exact for the
        # probe's own cosine/ADC purposes)
        qf = q.select(
            "qid",
            F.expr("transform(qvf, x -> CAST(x AS DOUBLE) / 1000000.0)").alias(
                "embedding"
            ),
        )
        got = {
            (r.qid, r.neighbor_id)
            for r in self.query(
                spark, qf, k=k, probes=probes, shortlist=shortlist
            ).collect()
        }
        recall = len(truth & got) / len(truth) if truth else 1.0
        return {"recall": recall, "k": k, "probes": probes, "n_queries": n_queries}

    def pruned_files(self, spark: SparkSession, cells: "list[int]") -> int:
        """How many code files a probe of ``cells`` opens (test hook;
        tolerates cells emptied by compaction)."""
        base = self._p("codes")
        paths = [
            p
            for c in sorted(cells)
            if os.path.isdir(p := os.path.join(base, f"cell={c}"))
        ]
        if not paths:
            return 0
        return len(
            spark.read.option("basePath", base).parquet(*paths).inputFiles()
        )
