"""Persisted IVF ANN index — the disk-layout scale path for similarity
search that the in-plan query `knn_cosine_ivf` (plans/similarity.py)
promises in its docstring: the corpus is written PARTITIONED BY CELL, so a
probe physically reads only the probed partitions (Catalyst partition
pruning on the directory column) instead of scanning 100 TB of vectors.

Build: deterministic coarse quantizer (the k vectors with the smallest
md5(vec_id) — an RNG-free uniform sample, the same md5-derived-sampling
contract as plans/pipeline.doc_sample_stratified), one broadcast scoring
pass to assign every vector to its nearest cell, one shuffle on cell to
write `cell=N/` partitions. Centroids (k × dim floats — k ≈ √N stays
driver-sized even at 100 TB) are stored next to the data.

Query: nearest `probes` cells per query vector from the broadcast
centroids, then ONE pruned read of exactly those partitions, exact
fixed-point cosine, per-query top-k. The pruning is asserted in
tests/test_ann_index.py via `inputFiles()` — fewer files than cells —
plus recall against the brute-force baseline.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast, col

# fixed-point cosine machinery shared with the in-plan queries
from ..plans.similarity import _fx_dot, _with_norm
from .generations import GenerationalLayout
from .merge import ParquetMergeTarget


def _tombstone_ids(inv, spark: SparkSession, ids: DataFrame, watermark: int | None) -> bool:
    """Shared delete kernel for the inventory-backed vector indexes: fold
    the inventory to target ∖ ids (anti-join on vec_id). The merge commit
    is the single publish point, exactly like upserts."""
    if watermark is not None and watermark <= inv.watermark():
        return False
    keys = ids.select("vec_id").localCheckpoint()

    def drop(target: DataFrame | None, upd: DataFrame) -> DataFrame:
        if target is None:
            # nothing indexed yet: an empty state with the inventory schema
            return upd.select(
                "vec_id",
                F.lit(0).cast("long").alias("seg"),
                F.lit(0).cast("long").alias("cell"),
            ).limit(0)
        return target.join(upd, ["vec_id"], "left_anti")

    inv.merge_with(spark, keys, drop, watermark=watermark)
    return True


class VectorIndexMaintenance:
    """Shared drift-policy and staleness machinery for the inventory-backed
    vector indexes (IVFIndex, IVFPQIndex). Expects ``_inventory()``,
    ``recall_probe(spark, **kw)``, and inventory rows carrying an
    ``upserted`` flag (0 = present when the quantizer was trained/frozen,
    1 = arrived afterwards) — the flag survives compaction, unlike the
    segment number (compact rewrites every live row as seg=0), so the
    structural drift proxy keeps measuring distance from the FROZEN
    quantizer, not from the last compaction."""

    @staticmethod
    def _upserted_col(inv_df: DataFrame):
        """The post-freeze flag, tolerating pre-flag inventories (where
        seg > 0 is the best available proxy until the next rebuild)."""
        proxy = (col("seg") > 0).cast("long")
        if "upserted" in inv_df.columns:
            return F.coalesce(col("upserted"), proxy)
        return proxy

    def _stale_filtered(self, spark: SparkSession, data: DataFrame) -> DataFrame:
        """Drop superseded rows: keep only rows matching the inventory's
        latest (seg, cell) per vec_id. BOTH coordinates matter: the
        dynamic-partition-overwrite replay argument in upsert() covers
        bit-identical retries only, so a crashed batch retried with
        CHANGED content can leave an orphan (old cell, same seg) row — a
        seg-only filter would serve it."""
        inv_df = self._inventory().read(spark)
        if inv_df is None or "seg" not in data.columns:
            return data
        latest = inv_df.select(
            "vec_id", col("seg").alias("__lseg"), col("cell").alias("__lcell")
        )
        return (
            data.join(latest, ["vec_id"])
            .filter((col("seg") == col("__lseg")) & (col("cell") == col("__lcell")))
            .drop("__lseg", "__lcell")
        )

    def upserted_fraction(self, spark: SparkSession) -> float:
        """Share of live vectors indexed AFTER the quantizer was frozen —
        the cheap structural drift proxy (compaction-proof via the
        inventory's ``upserted`` flag)."""
        inv_df = self._inventory().read(spark)
        if inv_df is None:
            return 0.0
        row = inv_df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(self._upserted_col(inv_df)).alias("u"),
        ).first()
        return (row.u or 0) / row.n if row.n else 0.0

    def needs_rebuild(
        self,
        spark: SparkSession,
        recall_floor: float = 0.8,
        max_upserted_frac: float = 0.5,
        **probe_kw,
    ) -> dict:
        """The documented rebuild-trigger policy: rebuild when more than
        ``max_upserted_frac`` of the live corpus arrived after the
        quantizer froze (checked FIRST — it is metadata-cheap and, when
        it already decides the rebuild, the live-corpus recall probe is
        skipped entirely), or when measured recall@k sinks below
        ``recall_floor``. Returns the decision plus the metrics
        (``recall`` is None when the probe was skipped); the caller
        rebuilds with ``build(spark, <live corpus ∪ pending>)``, which
        re-samples the quantizer from the current distribution
        (tests/test_ann_index.py::test_recall_drift_lifecycle shows the
        decay and the rebuild restoring recall).

        An UNBUILT index (no id inventory) returns a clear no-decision —
        ``{"rebuild": False, "unbuilt": True}`` — instead of letting the
        recall probe die on a nonexistent parquet store; the guard lives
        here so every caller gets it, not just the vec-health CLI."""
        if self._inventory().read(spark) is None:
            return {
                "rebuild": False,
                "unbuilt": True,
                "upserted_frac": 0.0,
                "recall": None,
                "probe_skipped": True,
            }
        frac = self.upserted_fraction(spark)
        if frac > max_upserted_frac:
            return {
                "rebuild": True,
                "upserted_frac": frac,
                "recall": None,
                "probe_skipped": True,
            }
        probe = self.recall_probe(spark, **probe_kw)
        return {
            "rebuild": probe["recall"] < recall_floor,
            "upserted_frac": frac,
            "probe_skipped": False,
            **probe,
        }


class IVFIndex(VectorIndexMaintenance, GenerationalLayout):
    """cell-partitioned vector index: ``.../data/cell=N/`` parquet plus
    ``.../centroids`` parquet, grouped into GENERATIONS
    (operators/generations.py): a full ``build()`` writes a complete new
    generation directory (centroids + data + a fresh id inventory) and
    publishes it with one pointer flip — a crash anywhere mid-rebuild
    leaves the previous generation fully intact and serving, instead of a
    wiped data dir pointing nowhere (write-audit-publish, the same
    contract the upsert path keeps via the inventory merge commit)."""

    _LEGACY_STORES = ("data", "centroids", "id_inventory")

    def __init__(self, path: str):
        self.path = path

    @property
    def _data(self) -> str:
        return self._store("data")

    @property
    def _centroids(self) -> str:
        return self._store("centroids")

    def build(
        self, spark: SparkSession, vectors: DataFrame, n_cells: int = 8
    ) -> None:
        """``vectors``: (vec_id, embedding). Deterministic build — same
        corpus in, same index out, no RNG.

        The rebuild lands in a FRESH generation directory (centroids,
        data, id inventory) and only the final pointer flip makes it
        live: a crash before the flip leaves the previous index serving,
        never a wiped-data/dangling-inventory hybrid. The fresh inventory
        also means a rebuild structurally supersedes all prior upserts
        (no cross-generation seg arithmetic); upsert watermarks restart
        with the new generation — resume post-rebuild upserts with
        watermarks from the rebuild's snapshot, not the old stream's."""
        old_gen = self._gen()
        new_gen = old_gen + 1
        gdir = self._gen_dir(new_gen)
        cent_path = os.path.join(gdir, "centroids")
        data_path = os.path.join(gdir, "data")

        corpus = _with_norm(vectors.select("vec_id", "embedding"), "embedding", "nrm")
        # RNG-free uniform centroid sample: smallest md5(vec_id) wins.
        # TakeOrderedAndProject (per-partition top-k) — no global sort.
        cent = (
            corpus.withColumn("__r", F.md5(col("vec_id").cast("string")))
            .orderBy("__r")
            .limit(n_cells)
            .withColumn("cell", F.row_number().over(Window.orderBy("__r")) - 1)
            .select("cell", col("embedding").alias("cvec"), col("nrm").alias("cnrm"))
        )
        cent.coalesce(1).write.mode("overwrite").parquet(cent_path)

        cent_r = spark.read.parquet(cent_path)
        assigned = self._nearest_cells(corpus, cent_r, 1).select(
            "vec_id", "embedding", "nrm", "cell", F.lit(0).cast("long").alias("seg")
        )
        # one shuffle on cell → one directory per cell, clustered files
        assigned.repartition("cell").write.mode("overwrite").partitionBy(
            "cell", "seg"
        ).parquet(data_path)
        inv = ParquetMergeTarget(os.path.join(gdir, "id_inventory"))
        inv.merge(
            spark,
            assigned.select(
                "vec_id", "seg", "cell", F.lit(0).cast("long").alias("upserted")
            ),
            keys=["vec_id"],
            order=["seg"],
        )
        self._publish_gen(new_gen)
        self._retire_gen(old_gen, self._LEGACY_STORES)

    def _inventory(self):
        """vec_id → (latest seg, cell) for the CURRENT generation: the
        staleness ledger incremental upserts maintain (ParquetMergeTarget,
        watermark-guarded)."""
        return ParquetMergeTarget(self._store("id_inventory"))

    def upsert(
        self, spark: SparkSession, vectors: DataFrame, watermark: int | None = None
    ) -> bool:
        """Fold fresh/updated vectors into the index WITHOUT rebuilding:
        assign against the FROZEN coarse quantizer (the production
        contract — operators/kmeans.py CodebookState owns centroid
        refresh), append a new segment's files under each touched
        ``cell=N/`` directory, and advance the vec_id→(seg, cell)
        inventory so queries drop superseded rows. Work is O(batch):
        the stored corpus is never rescanned. Returns False on a
        watermark-replayed batch (nothing written)."""
        inv = self._inventory()
        if watermark is not None and watermark <= inv.watermark():
            return False
        seg = int(inv.current_version())  # strictly increasing per upsert
        corpus = _with_norm(vectors.select("vec_id", "embedding"), "embedding", "nrm")
        cent = spark.read.parquet(self._centroids)
        assigned = self._nearest_cells(corpus, cent, 1).select(
            "vec_id", "embedding", "nrm", "cell", F.lit(seg).cast("long").alias("seg")
        )
        assigned = assigned.localCheckpoint()  # data write + inventory merge
        # The data write is IDEMPOTENT under replay: segment files live in
        # cell=C/seg=N partitions and a replayed batch (crash between this
        # write and the inventory merge commit) dynamically OVERWRITES the
        # same seg=N partitions instead of appending duplicate files. Until
        # the inventory merge publishes, the new seg's rows are invisible
        # to query(): superseded ids still point at an older seg (inner
        # staleness join) and brand-new ids have no inventory row at all —
        # so the merge commit remains the single publish point
        # (write-audit-publish, as in ParquetMergeTarget).
        assigned.repartition("cell").write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("cell", "seg").parquet(self._data)
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
        """Tombstone vectors: remove their inventory rows, which makes
        every stored copy invisible to ``query()`` (the staleness join is
        INNER on the inventory) — the delete path an upsert-only index
        lacks, needed when an entity's vector count SHRINKS (a re-crawled
        document with fewer chunks) rather than merely changes. Bytes are
        reclaimed at the next ``compact()``; deleting absent ids is a
        no-op, so replays are harmless. ``ids``: a frame with a vec_id
        column. Returns False on a watermark-replayed batch."""
        return _tombstone_ids(self._inventory(), spark, ids, watermark)

    def compact(self, spark: SparkSession) -> None:
        """Fold the per-cell segment pile an upsert stream accumulates
        into ONE consolidated segment per cell — the LSM merge for the
        vector index. Every upsert appends a ``seg=N`` directory under
        each touched cell, so at continuous-ingest rates a probe opens
        O(upserts) small files per cell (classic LSM decay); previously
        the only remedy was a full ``build()`` (which re-samples
        centroids and restarts the upsert stream's watermarks).

        Compaction instead materializes exactly the LIVE rows — data
        joined to the inventory's latest (seg, cell) per vec_id, the
        same filter ``query()`` serves — and rewrites them as ``seg=0``
        in a FRESH generation: centroids copied unchanged (the frozen
        coarse quantizer is not compaction's business), one data
        directory per cell, and a fresh single-segment inventory
        carrying the OLD watermark so the upsert stream resumes
        transparently (replays still skip; the next upsert gets
        ``seg=1 > 0``). The generation pointer flip is the single
        commit point (GenerationalLayout): a crash anywhere mid-compact
        leaves the previous generation fully intact and serving, and
        query results are bit-identical before/after
        (tests/test_ann_index.py)."""
        old_gen = self._gen()
        inv = self._inventory()
        wm = inv.watermark()
        # Every vector tombstoned → zero live rows: compacting would write
        # a data directory holding only _SUCCESS (no part files, no
        # schema), and the NEXT compact's parquet read dies with
        # unable-to-infer-schema. Skip instead — query() already returns
        # empty via the inventory live-cell intersection, and the first
        # post-delete upsert's segment compacts normally afterwards.
        inv_df = inv.read(spark)
        if inv_df is None or not inv_df.take(1):
            return
        data = spark.read.option("basePath", self._data).parquet(self._data)
        live = self._stale_filtered(spark, data).select(
            "vec_id", "embedding", "nrm", "cell", F.lit(0).cast("long").alias("seg")
        )  # single consumer (the data write) — the inventory comes from inv_df
        new_gen = old_gen + 1
        gdir = self._gen_dir(new_gen)
        spark.read.parquet(self._centroids).coalesce(1).write.mode(
            "overwrite"
        ).parquet(os.path.join(gdir, "centroids"))
        live.repartition("cell").write.mode("overwrite").partitionBy(
            "cell", "seg"
        ).parquet(os.path.join(gdir, "data"))
        ninv = ParquetMergeTarget(os.path.join(gdir, "id_inventory"))
        # the fresh single-segment inventory rows come straight from the
        # old inventory (it IS the live-id truth): seg resets to 0, the
        # ``upserted`` post-freeze flag carries forward so the drift proxy
        # is compaction-proof (the quantizer copied unchanged above)
        ninv.merge(
            spark,
            inv_df.select(
                "vec_id",
                F.lit(0).cast("long").alias("seg"),
                "cell",
                self._upserted_col(inv_df).alias("upserted"),
            ),
            keys=["vec_id"],
            order=["seg"],
            watermark=wm if wm >= 0 else None,
        )
        self._publish_gen(new_gen)
        self._retire_gen(old_gen, self._LEGACY_STORES)

    @staticmethod
    def _nearest_cells(
        vecs: DataFrame, cent: DataFrame, top: int, id_col: str = "vec_id"
    ) -> DataFrame:
        """Top-``top`` cells per vector by fixed-point cosine against the
        broadcast centroid table."""
        scored = vecs.join(broadcast(cent)).select(
            id_col,
            "embedding",
            "nrm",
            "cell",
            (_fx_dot("embedding", "cvec") / (col("nrm") * col("cnrm"))).alias("score"),
        )
        w = Window.partitionBy(id_col).orderBy(col("score").desc(), col("cell"))
        return scored.withColumn("__rn", F.row_number().over(w)).filter(
            col("__rn") <= top
        )

    def query(
        self,
        spark: SparkSession,
        queries: DataFrame,
        k: int = 5,
        probes: int = 2,
    ) -> DataFrame:
        """(qid, embedding) → (qid, neighbor_id, cosine, rank ≤ k), probing
        each query's ``probes`` nearest cells. The probed cell set is
        collected (an index LOOKUP is an action, bounded by
        |queries|×probes) and pushed into the read as a partition filter —
        only those directories are opened."""
        cent = spark.read.parquet(self._centroids)
        q = _with_norm(queries.select(col("qid").alias("vec_id"), "embedding"), "embedding", "nrm")
        probe_cells = self._nearest_cells(q, cent, probes).select(
            col("vec_id").alias("qid"), "cell"
        )
        cells = [r.cell for r in probe_cells.select("cell").distinct().collect()]
        # a probed cell may hold no LIVE vectors (every member re-crawled
        # into other cells, then compact() dropped the emptied directory —
        # the centroid outlives its population). Intersect with the
        # inventory's live cells (metadata-sized, no filesystem probes)
        # so the explicit-path pruned read never enumerates a missing dir.
        inv_df = self._inventory().read(spark)
        if inv_df is not None:
            live = {r.cell for r in inv_df.select("cell").distinct().collect()}
            cells = [c for c in cells if c in live]
        if not cells:
            return spark.createDataFrame(
                [], "qid long, neighbor_id long, cosine double, rank long"
            )
        data = spark.read.option("basePath", self._data).parquet(
            *[os.path.join(self._data, f"cell={c}") for c in sorted(cells)]
        )
        # staleness filter: an upserted vector's older copies (possibly in
        # other cells) are superseded — candidate-sized join on the
        # inventory's latest (seg, cell) per id (VectorIndexMaintenance).
        data = self._stale_filtered(spark, data)
        qside = q.select(
            col("vec_id").alias("qid"), col("embedding").alias("qe"), col("nrm").alias("qnrm")
        )
        cand = broadcast(probe_cells).join(data, ["cell"]).join(broadcast(qside), ["qid"])
        scored = cand.filter(col("vec_id") != col("qid")).select(
            "qid",
            col("vec_id").alias("neighbor_id"),
            (_fx_dot("qe", "embedding") / (col("qnrm") * col("nrm"))).alias("cosine"),
        )
        w = Window.partitionBy("qid").orderBy(col("cosine").desc(), col("neighbor_id"))
        return scored.withColumn("rank", F.row_number().over(w).cast("long")).filter(
            col("rank") <= k
        )

    def _live(self, spark: SparkSession) -> DataFrame:
        """LIVE corpus rows (vec_id, embedding, nrm): data filtered to the
        inventory's latest (seg, cell) — the same filter query() serves."""
        data = spark.read.option("basePath", self._data).parquet(self._data)
        return self._stale_filtered(spark, data).select("vec_id", "embedding", "nrm")

    def recall_probe(
        self, spark: SparkSession, k: int = 5, probes: int = 2, n_queries: int = 16
    ) -> dict:
        """Measured recall@k of the pruned probe against exact brute-force
        cosine over the LIVE corpus, on a deterministic md5 sample of live
        vectors — the drift monitor for a FROZEN coarse quantizer: upserts
        keep arriving after build(), and once the data distribution drifts
        from the codebook, probed cells stop containing the true
        neighbors. Cost: one live-corpus stream against ``n_queries``
        broadcast queries (metadata-bounded output) plus one index query —
        cheap enough to run per compaction cycle."""
        live = self._live(spark).localCheckpoint()
        q = (
            live.withColumn("__r", F.md5(col("vec_id").cast("string")))
            .orderBy("__r")
            .limit(n_queries)
            .select(col("vec_id").alias("qid"), "embedding", col("nrm").alias("qnrm"))
            .localCheckpoint()
        )
        qb = q.select("qid", col("embedding").alias("qe"), "qnrm")
        exact = (
            live.join(broadcast(qb))
            .filter(col("vec_id") != col("qid"))
            .select(
                "qid",
                "vec_id",
                (_fx_dot("qe", "embedding") / (col("qnrm") * col("nrm"))).alias("cos"),
            )
        )
        w = Window.partitionBy("qid").orderBy(col("cos").desc(), col("vec_id"))
        truth = {
            (r.qid, r.vec_id)
            for r in exact.withColumn("__rn", F.row_number().over(w))
            .filter(col("__rn") <= k)
            .collect()
        }
        got = {
            (r.qid, r.neighbor_id)
            for r in self.query(
                spark, q.select("qid", "embedding"), k=k, probes=probes
            ).collect()
        }
        recall = len(truth & got) / len(truth) if truth else 1.0
        return {"recall": recall, "k": k, "probes": probes, "n_queries": n_queries}

    def pruned_files(self, spark: SparkSession, cells: "list[int]") -> int:
        """How many data files a probe of ``cells`` opens (test hook;
        tolerates cells emptied by compaction)."""
        paths = [
            p
            for c in sorted(cells)
            if os.path.isdir(p := os.path.join(self._data, f"cell={c}"))
        ]
        if not paths:
            return 0
        data = spark.read.option("basePath", self._data).parquet(*paths)
        return len(data.inputFiles())
