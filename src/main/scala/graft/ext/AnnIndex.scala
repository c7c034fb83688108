package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A PERSISTED IVF (inverted-file) ANN index over an embedding
  * column — the embedding-side member of the index-lifecycle family
  * (LSH for text near-dup, BM25 for retrieval, this for vectors),
  * sharing the [[IndexLifecycle]] protocol: batch-partitioned cells,
  * marker-gated ingest, staged-swap compaction, loud-failure
  * recovery.
  *
  * Reference scope note: the reference library has no similarity
  * operators (its rows are opaque — SURVEY §2.2); this is north-star
  * extension surface.  The IVF design follows the standard
  * inverted-file shape (Sivic & Zisserman ICCV'03; the FAISS IVF
  * family): train a coarse quantizer once on the bootstrap corpus,
  * FREEZE it, assign every later batch to its nearest cell — exactly
  * the "train on a sample, add the rest" production contract, which
  * is also what makes increments cheap: appending a batch never
  * touches stored cells.
  *
  * Tables for index `name`:
  *   - `<name>_cells` (cid, id, v double[], nrm), partitioned by
  *     `batch_id`, BUCKETED by `cid` — a probe's `cid IN (...)`
  *     literal filter prunes the scan to the buckets holding its
  *     nProbe cells, so probe cost is O(candidate cells), independent
  *     of corpus size;
  *   - `<name>_codebook` (cid, cv, cnrm) — the frozen quantizer, one
  *     small file;
  *   - `<name>_batches` — the [[IndexLifecycle]] seen-gate markers.
  *
  * Scale shape: cell assignment is ONE shuffle-free codegen'd
  * projection per batch (nCentroids native dot products per row);
  * the append writes O(|batch|) rows; compaction relabels + re-
  * buckets (cells are disjoint across batches — no merge arithmetic
  * at all, so a fold can not change one bit of any similarity);
  * probes read only their pruned buckets.
  */
object AnnIndex {

  /** Build the index for a corpus: train the codebook on it
    * (deterministic cosine k-means, [[Similarity.kmeansCodebook]]),
    * persist it, and land every vector's cell assignment as the
    * bootstrap partition. */
  def writeAnnIndex(emb: DataFrame, idCol: String, vecCol: String,
      name: String, nCentroids: Int, kmeansIters: Int,
      buckets: Int = 16): Unit = {
    val s = emb.sparkSession
    // _purged too: a rebuilt index carries no purge debt — a stale
    // ledger from a prior instance would mask fresh ingests
    Seq("_cells", "_codebook", "_batches", "_purged").foreach(sfx =>
      graft.sources.Tables.dropWithLocation(s, s"$name$sfx"))
    val cents = Similarity.kmeansCodebook(emb, nCentroids, kmeansIters,
      idCol, vecCol)
    import s.implicits._
    cents.toDF("cid", "cv", "cnrm").coalesce(1)
      .write.format("parquet").saveAsTable(s"${name}_codebook")
    writeCells(emb, idCol, vecCol, name, buckets, cents,
      IndexLifecycle.bootstrapBatchId)
  }

  /** Append one ingest batch: assign its vectors against the FROZEN
    * codebook and land them as the batch's own partition — O(|batch|)
    * work, nothing stored is read or rewritten.  Batches must hold
    * ids disjoint from everything already indexed (the family-wide
    * contract).  Replay-safe pre-compaction via dynamic partition
    * overwrite; use [[ingestAnnBatch]] for the marker gate a
    * compaction needs. */
  def appendAnnBatch(emb: DataFrame, batchId: Long, idCol: String,
      vecCol: String, name: String, buckets: Int = 16): Unit = {
    require(batchId >= 0, s"ingest batch ids start at 0, got $batchId " +
      s"(negative ids are reserved for the bootstrap and the base)")
    writeCells(emb, idCol, vecCol, name, buckets,
      loadCodebook(emb.sparkSession, name), batchId)
  }

  /** Marker-gated ingest — returns false (before any write) for a
    * batch id already marked committed, the no-op a replay must be
    * even after compaction folded the batch's partition away. */
  def ingestAnnBatch(emb: DataFrame, batchId: Long, idCol: String,
      vecCol: String, name: String, buckets: Int = 16): Boolean = {
    val s = emb.sparkSession
    if (IndexLifecycle.committedIds(s, name).contains(batchId)) false
    else {
      appendAnnBatch(emb, batchId, idCol, vecCol, name, buckets)
      IndexLifecycle.markBatch(s, name, batchId)
      true
    }
  }

  /** Fold marked batch partitions into the consolidated base.  Cells
    * are disjoint rows — the fold relabels and re-buckets, nothing
    * else — so no probe result can change by a bit.  Unmarked
    * in-flight batches pass through; crash recovery is
    * [[recoverAnnCompaction]], run first. */
  def compactAnnIndex(spark: SparkSession, name: String): Unit = {
    recoverAnnCompaction(spark, name)
    val cells = s"${name}_cells"
    if (!spark.catalog.tableExists(cells)) return
    // an unmarked ledger partition = a crashed purge — replay it
    // before erasing (the shared orphan-ledger guard)
    IndexLifecycle.requireLedgerCommitted(spark, name)
    val committed = IndexLifecycle.committedIds(spark, name)
    // the ERASING leg: purged vectors' rows (probe-masked since their
    // [[graft.ext.Purge.purgeAnnIndex]]) are physically dropped from
    // the folded base; cells are disjoint rows so nothing else moves.
    // The ledger folds to empty LAST.
    val purged = IndexLifecycle.purgedIds(spark, name)
      .map(_.localCheckpoint())
    IndexLifecycle.swapFold(spark, cells, committed,
      (df, base) => purged.fold(df)(p =>
          df.join(broadcast(p), Seq("id"), "left_anti"))
        .withColumn("batch_id", base))
    IndexLifecycle.foldMarkerTable(spark, name)
    IndexLifecycle.foldLedgerEmpty(spark, name, committed)
  }

  /** Finish a compaction swap a crash interrupted (idempotent;
    * returns true if any repair ran). */
  def recoverAnnCompaction(spark: SparkSession, name: String): Boolean = {
    val partitioned = Set(s"${name}_cells",
      IndexLifecycle.purgedTable(name))
    IndexLifecycle.recoverSwaps(spark,
      (partitioned + s"${name}_batches").toSeq, partitioned)
  }

  /** IVF top-k served from the persisted index — result-identical to
    * [[Similarity.ivfTopK]] over the same corpus and codebook
    * (AnnIndexSpec pins it): the probes' cell ranking replays the
    * same bounded window arithmetic over the STORED codebook, and
    * scoring reads stored (v, nrm) doubles, so every cosine comes out
    * bit-equal.
    *
    * The probes' nProbe cell ids collect to the driver (bounded at
    * |probes| × nProbe — the bounded-collect contract) and become an
    * `isin` LITERAL filter, which is what turns into BUCKET pruning
    * on the cells scan: the probe reads only the buckets that can
    * hold its candidate cells.  The collect is ceiling-guarded
    * (`maxLiteralCells`): a probe workload large enough to overflow
    * it touches most cells anyway — the pruning gain is gone — so
    * the fallback simply skips the literal (full cells scan; the
    * broadcast candidate join below already restricts the rows,
    * logged). */
  def annTopKFromIndex(spark: SparkSession, name: String,
      probeIds: Seq[Long], k: Int, nProbe: Int,
      maxLiteralCells: Int = 10000): DataFrame = {
    require(k > 0 && nProbe > 0, s"k and nProbe must be positive")
    // contract check, not a clamp: Int.MaxValue "disables" nothing —
    // the + 1 would overflow negative and reach Spark as limit(<0)
    require(maxLiteralCells >= 0 && maxLiteralCells < Int.MaxValue,
      s"maxLiteralCells must be in [0, Int.MaxValue): got $maxLiteralCells " +
        "(0 forces the full-scan fallback; there is no 'unlimited' value)")
    // purge mask: purged vectors (retracted, rows not yet erased by
    // the compaction) neither serve as probes nor surface as
    // neighbors — one broadcast anti-join on the shared scan; absent
    // a ledger table the bucket-pruned plan is untouched
    val cellsRaw = spark.table(s"${name}_cells")
    val cells = IndexLifecycle.purgedIds(spark, name)
      .fold(cellsRaw)(p => cellsRaw.join(broadcast(p), Seq("id"), "left_anti"))
    val cent = spark.table(s"${name}_codebook")
    // probes rank centroids and keep their nProbe nearest cells —
    // bounded at |probes| × nCentroids rows (the ivfTopK shape)
    val probes = cells.where(col("id").isInCollection(probeIds))
      .select(col("id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val pc = probes.crossJoin(broadcast(cent))
      .select(col("probe_id"), col("cid"),
        (dotD(col("pv"), col("cv")) / (col("pn") * col("cnrm"))).as("ccos"),
        col("pv"), col("pn"))
    val cwin = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("ccos").desc, col("cid").asc)
    val pcells = pc.withColumn("rn", row_number().over(cwin))
      .where(col("rn") <= nProbe).select("probe_id", "cid", "pv", "pn")
    // the candidate cell ids become literals so the bucketed scan
    // prunes (SelectedBucketsCount) — a bounded collect, like the
    // BM25 probe's term list, ceiling-guarded the same way
    val candProbe = pcells.select(col("cid")).distinct()
      .limit(maxLiteralCells + 1).collect().map(_.getLong(0)).toSeq
    val cellsSliced =
      if (candProbe.size <= maxLiteralCells)
        cells.where(col("cid").isin(candProbe: _*))
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"annTopKFromIndex: candidate cell set exceeds " +
            s"maxLiteralCells=$maxLiteralCells — skipping the pruning " +
            "literal (the candidate join below still restricts the rows)")
        cells
      }
    // past the ceiling the candidate frame may be too big to pin a
    // broadcast hint on — let AQE pick there
    val scored = cellsSliced
      .join(if (candProbe.size <= maxLiteralCells) broadcast(pcells)
            else pcells, Seq("cid"))
      .where(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id").as("neighbor_id"),
        cosineWithNorms(dotD(col("pv"), col("v")), col("pn"), col("nrm"))
          .as("cos"))
    Similarity.topK(scored, k)
  }

  /** Within-cell near-duplicate pairs between a NEW batch and the
    * stored index, plus the batch's internal pairs — the incremental
    * pair-emission step of semantic dedup (SemDeDup-style, the q57
    * semantics) against the frozen quantizer.  Call BEFORE ingesting
    * the batch (ids must be disjoint from the stored cells); across a
    * disjoint batch sequence each unordered pair is emitted exactly
    * once — when its LATER member arrives — so the union of all
    * batches' pairs equals the one-shot within-cell pair set, and an
    * incremental closure over them equals the one-shot clustering
    * ([[graft.ext.Components.incrementalComponents]]; gate q116).
    *
    * Scale shape: the batch assigns in one codegen'd projection and
    * BROADCASTS into the stored cells, which are scanned only for
    * the batch's own cell ids (isin literals → bucket pruning) —
    * per-batch cost is O(|batch| × touched-cell occupancy), the
    * stored table never shuffles. */
  def semanticPairsAgainstIndex(emb: DataFrame, idCol: String,
      vecCol: String, name: String, minCos: Double): DataFrame = {
    val s = emb.sparkSession
    val cents = loadCodebook(s, name)
    val b = emb.select(col(idCol).as("bid"), vecD(col(vecCol)).as("bv"))
      .withColumn("bn", normD(col("bv")))
      .withColumn("cid", Similarity.assignCell(col("bv"), col("bn"), cents))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the batch's cell ids as literals: bounded by nCentroids (the
      // codebook is tiny by construction), prunes the stored scan
      val touched = b.select(col("cid")).distinct()
        .collect().map(_.getLong(0)).toSeq
      // purge mask: a stored signature of a purged vector must not
      // pair with the arriving batch (same contract as the LSH probe)
      val storedRaw = s.table(s"${name}_cells")
        .where(col("cid").isin(touched: _*))
      val stored = IndexLifecycle.purgedIds(s, name)
        .fold(storedRaw)(p =>
          storedRaw.join(broadcast(p), Seq("id"), "left_anti"))
      val cross = stored.join(broadcast(b), Seq("cid"))
        .where(cosineWithNorms(dotD(col("bv"), col("v")),
          col("bn"), col("nrm")) >= minCos)
        .select(least(col("id"), col("bid")).as("id_a"),
          greatest(col("id"), col("bid")).as("id_b"))
      val l = b.select(col("cid"), col("bid").as("id_a"),
        col("bv").as("va"), col("bn").as("na"))
      val r = b.select(col("cid"), col("bid").as("id_b"),
        col("bv").as("vb"), col("bn").as("nb"))
      val internal = l.join(r, Seq("cid")).where(col("id_a") < col("id_b"))
        .where(cosineWithNorms(dotD(col("va"), col("vb")),
          col("na"), col("nb")) >= minCos)
        .select(col("id_a"), col("id_b"))
      // materialize before unpersisting the batch projection
      val out = cross.unionByName(internal).localCheckpoint(true)
      out
    } finally b.unpersist()
  }

  /** The frozen quantizer, loaded as driver-side literals (tiny by
    * construction — the [[Similarity.kmeansCodebook]] contract). */
  private def loadCodebook(spark: SparkSession,
      name: String): Seq[(Long, Seq[Double], Double)] =
    spark.table(s"${name}_codebook")
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq, r.getDouble(2)))
      .toIndexedSeq.sortBy(_._1)

  /** Assign `emb` against `cents` and land as `batchId`'s partition
    * of `<name>_cells`. */
  private def writeCells(emb: DataFrame, idCol: String, vecCol: String,
      name: String, buckets: Int, cents: Seq[(Long, Seq[Double], Double)],
      batchId: Long): Unit = {
    val nn = emb.select(col(idCol).as("id"), vecD(col(vecCol)).as("v"))
      .withColumn("nrm", normD(col("v")))
    val asg = nn
      .withColumn("cid", Similarity.assignCell(col("v"), col("nrm"), cents))
      .select(col("cid"), col("id"), col("v"), col("nrm"))
    IndexLifecycle.writeBatchPartition(asg, s"${name}_cells", batchId,
      Some(("cid", buckets)))
  }
}
