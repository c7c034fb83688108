package graft

import graft.ext.{AnnIndex, Dedup, IndexLifecycle, Purge, Retrieval}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The per-family takedown purge for the STANDALONE index lifecycles
  * (BM25 / IVF-ANN / LSH), at unit scale.  Each family's contract:
  * retraction (ledger + probe mask, BM25 additionally signed
  * vocab/stats deltas) serves corpus-minus-purged IMMEDIATELY and
  * bit-identically to the post-erasure index; the family compaction
  * physically erases; the certificate proves zero occurrences; purge
  * batches are marker-gated replay-safe, including the
  * crash-after-ledger-before-marker window.  The q125/q126/q127 gates
  * pin the same lifecycles against DuckDB oracles at corpus scale. */
class StandalonePurgeSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.except(b).isEmpty && b.except(a).isEmpty

  private def drop(tables: String*): Unit =
    tables.foreach(t => graft.sources.Tables.dropWithLocation(spark, t))

  // ---------------------------------------------------------------- BM25

  private val bmDocs: Seq[(Long, String)] = (1L to 40L).map { id =>
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    val len = 3 + (id % 7).toInt
    id -> (0 until len).map(j => vocab(((id + j) % 5).toInt)).mkString(" ")
  }
  private val bmQueries =
    Seq(("qa", "alpha"), ("qa", "beta"), ("qb", "gamma"), ("qb", "delta"))
      .toDF("query_id", "term")

  private def bm25Probe(name: String): DataFrame =
    Retrieval.bm25TopKFromIndex(spark, name, bmQueries, "query_id", "term",
      k = 5, idCol = "doc_id").orderBy("query_id", "rank").localCheckpoint()

  private def bm25Tables(name: String): Seq[String] =
    Seq("_postings", "_vocab", "_stats", "_batches", "_purged")
      .map(name + _)

  test("bm25 purge: masked probe == one-shot over live corpus == " +
    "erased probe; certificate; staggered second purge") {
    val name = "sp_bm25_a"
    drop(bm25Tables(name): _*)
    val docs = bmDocs.toDF("doc_id", "text")
    Retrieval.writeBm25Index(docs.where(col("doc_id") <= 20), "doc_id",
      "text", name)
    assert(Retrieval.ingestBm25Batch(docs.where(col("doc_id") > 20), 0L,
      "doc_id", "text", name))
    val p1 = docs.where(col("doc_id").isin(3L, 17L, 25L))
    assert(Purge.purgeBm25Index(p1, 1L, "doc_id", "text", name))
    assert(!Purge.purgeBm25Index(p1, 1L, "doc_id", "text", name),
      "replay must no-op at the marker")
    val live1 = docs.where(!col("doc_id").isin(3L, 17L, 25L))
    val oneShot1 = Retrieval.bm25TopK(live1, "doc_id", "text", bmQueries,
      "query_id", "term", k = 5).orderBy("query_id", "rank")
    val masked = bm25Probe(name)
    assert(sameRows(masked, oneShot1),
      "the retracted index must serve corpus-minus-purged (mask + " +
        "signed deltas), before any erasure")
    // second, overlapping purge batch: 17 is already in the ledger —
    // its deltas must NOT land twice
    val p2 = docs.where(col("doc_id").isin(17L, 30L))
    assert(Purge.purgeBm25Index(p2, 2L, "doc_id", "text", name))
    val live2 = docs.where(!col("doc_id").isin(3L, 17L, 25L, 30L))
    val oneShot2 = Retrieval.bm25TopK(live2, "doc_id", "text", bmQueries,
      "query_id", "term", k = 5).orderBy("query_id", "rank")
    assert(sameRows(bm25Probe(name), oneShot2),
      "an id re-purged in a later batch must not double-subtract")
    Retrieval.compactBm25Index(spark, name)
    Purge.assertBm25Purged(spark, name,
      Seq(3L, 17L, 25L, 30L).toDF("doc_id"), "doc_id")
    assert(sameRows(bm25Probe(name), oneShot2),
      "erasure must not change one bit of any score")
    assert(spark.table(s"${name}_purged").isEmpty, "ledger folded empty")
    // post-erasure append (column-order pin): the erasing fold's
    // anti-join must not have drifted the staged column order, or
    // this positional insertInto writes columns crosswise
    val extra = Seq((100L, "alpha beta alpha gamma")).toDF("doc_id", "text")
    assert(Retrieval.ingestBm25Batch(extra, 3L, "doc_id", "text", name))
    val oneShot3 = Retrieval.bm25TopK(live2.unionByName(extra), "doc_id",
      "text", bmQueries, "query_id", "term", k = 5)
      .orderBy("query_id", "rank")
    assert(sameRows(bm25Probe(name), oneShot3),
      "an ingest AFTER the erasing compaction must score correctly")
    drop(bm25Tables(name): _*)
  }

  test("bm25 purge: crash after the ledger partition, before the " +
    "marker — the replay recomputes identical deltas") {
    val name = "sp_bm25_b"
    drop(bm25Tables(name): _*)
    val docs = bmDocs.toDF("doc_id", "text")
    Retrieval.writeBm25Index(docs, "doc_id", "text", name)
    // simulate the crash window: the ledger partition landed but
    // nothing else did (no deltas, no marker)
    IndexLifecycle.writeBatchPartition(
      Seq(5L, 9L).toDF("id"), IndexLifecycle.purgedTable(name), 0L, None)
    assert(Purge.purgeBm25Index(
      docs.where(col("doc_id").isin(5L, 9L)), 0L, "doc_id", "text", name),
      "the replay must run (marker never landed)")
    val live = docs.where(!col("doc_id").isin(5L, 9L))
    val oneShot = Retrieval.bm25TopK(live, "doc_id", "text", bmQueries,
      "query_id", "term", k = 5).orderBy("query_id", "rank")
    assert(sameRows(bm25Probe(name), oneShot),
      "the replayed purge must exclude its own half-landed ledger " +
        "partition when computing deltas — no double-subtraction")
    drop(bm25Tables(name): _*)
  }

  test("orphan ledger partition (crashed purge, no marker): probes " +
    "serve the exact pre-purge corpus and the erasing compaction " +
    "refuses loudly until the purge is replayed") {
    val name = "sp_bm25_d"
    drop(bm25Tables(name): _*)
    val docs = bmDocs.toDF("doc_id", "text")
    Retrieval.writeBm25Index(docs, "doc_id", "text", name)
    val preCrash = bm25Probe(name)
    // the crash window: ledger partition landed, deltas + marker did
    // not — compacting NOW would erase postings whose signed deltas
    // never landed (N/avgdl/df permanently overcount) and wedge the
    // replay (its membership require() would find the postings gone)
    IndexLifecycle.writeBatchPartition(
      Seq(5L, 9L).toDF("id"), IndexLifecycle.purgedTable(name), 0L, None)
    assert(sameRows(bm25Probe(name), preCrash),
      "an UNMARKED ledger partition must not mask the probe — its " +
        "stats deltas never landed, so masking would serve a state " +
        "matching neither pre- nor post-purge")
    val e = intercept[IllegalArgumentException] {
      Retrieval.compactBm25Index(spark, name)
    }
    assert(e.getMessage.contains("unmarked batch"),
      s"compaction must refuse the orphan loudly, got: ${e.getMessage}")
    // the documented recovery: replay the purge, then compact
    assert(Purge.purgeBm25Index(
      docs.where(col("doc_id").isin(5L, 9L)), 0L, "doc_id", "text", name))
    Retrieval.compactBm25Index(spark, name)
    Purge.assertBm25Purged(spark, name, Seq(5L, 9L).toDF("doc_id"),
      "doc_id")
    val live = docs.where(!col("doc_id").isin(5L, 9L))
    val oneShot = Retrieval.bm25TopK(live, "doc_id", "text", bmQueries,
      "query_id", "term", k = 5).orderBy("query_id", "rank")
    assert(sameRows(bm25Probe(name), oneShot))
    drop(bm25Tables(name): _*)
  }

  test("bm25 purge: a never-ingested doc with tokens is rejected " +
    "loudly (its stats were never added)") {
    val name = "sp_bm25_c"
    drop(bm25Tables(name): _*)
    val docs = bmDocs.toDF("doc_id", "text")
    Retrieval.writeBm25Index(docs.where(col("doc_id") <= 10), "doc_id",
      "text", name)
    val e = intercept[IllegalArgumentException] {
      Purge.purgeBm25Index(docs.where(col("doc_id") === 35L), 0L,
        "doc_id", "text", name)
    }
    assert(e.getMessage.contains("no stored postings"))
    drop(bm25Tables(name): _*)
  }

  // ----------------------------------------------------------------- ANN

  private val annEmb: Seq[(Long, Seq[Float])] = (0L until 48L).map { id =>
    val phase = (id % 6).toDouble
    id -> (0 until 8).map(d =>
      (math.cos(phase + d * 0.7) + 0.01 * id).toFloat).toSeq
  }

  private def annTables(name: String): Seq[String] =
    Seq("_cells", "_codebook", "_batches", "_purged").map(name + _)

  test("ann purge: mask == erasure; erased cells == fresh same-codebook " +
    "assignment minus purged; certificate") {
    val name = "sp_ann_a"
    val twin = "sp_ann_b"
    drop(annTables(name) ++ annTables(twin): _*)
    val emb = annEmb.toDF("vec_id", "embedding")
    AnnIndex.writeAnnIndex(emb, "vec_id", "embedding", name,
      nCentroids = 4, kmeansIters = 2)
    val purged = Seq(2L, 11L, 30L).toDF("vec_id")
    assert(Purge.purgeAnnIndex(spark, name, purged, "vec_id", 0L))
    assert(!Purge.purgeAnnIndex(spark, name, purged, "vec_id", 0L),
      "replay must no-op at the marker")
    def probe(): DataFrame = AnnIndex.annTopKFromIndex(spark, name,
        Seq(0L, 1L, 3L), k = 3, nProbe = 2)
      .orderBy("vec_id", "neighbor_id").localCheckpoint()
    val masked = probe()
    assert(masked.where(col("neighbor_id").isin(2L, 11L, 30L)).isEmpty,
      "a purged vector must not surface as a neighbor")
    AnnIndex.compactAnnIndex(spark, name)
    Purge.assertAnnPurged(spark, name, purged, "vec_id")
    assert(sameRows(masked, probe()),
      "erasure must not change one bit of any cosine")
    // structural erasure check: the folded cells equal a FRESH build
    // over the same corpus (deterministic codebook) minus the purged
    // rows — the erase dropped exactly the purged vectors
    AnnIndex.writeAnnIndex(emb, "vec_id", "embedding", twin,
      nCentroids = 4, kmeansIters = 2)
    val got = spark.table(s"${name}_cells").drop("batch_id")
    val want = spark.table(s"${twin}_cells").drop("batch_id")
      .where(!col("id").isin(2L, 11L, 30L))
    assert(sameRows(got, want))
    assert(spark.table(s"${name}_purged").isEmpty, "ledger folded empty")
    // post-erasure append (column-order pin): a crosswise positional
    // insert would land vec_id 100 in the cid column
    val extra = Seq((100L, (0 until 8).map(_.toFloat).toSeq))
      .toDF("vec_id", "embedding")
    assert(AnnIndex.ingestAnnBatch(extra, 1L, "vec_id", "embedding", name))
    val appended = spark.table(s"${name}_cells")
      .where(col("id") === 100L).select("cid")
    assert(appended.count() == 1L && appended.first().getLong(0) < 4L,
      "an append AFTER the erasing compaction must keep (cid, id) " +
        "column alignment")
    drop(annTables(name) ++ annTables(twin): _*)
  }

  test("ann purge: a retracted vector's stored cell row must not pair " +
    "with an arriving batch (semanticPairsAgainstIndex mask)") {
    val name = "sp_ann_c"
    drop(annTables(name): _*)
    val emb = annEmb.toDF("vec_id", "embedding")
    AnnIndex.writeAnnIndex(emb, "vec_id", "embedding", name,
      nCentroids = 4, kmeansIters = 2)
    assert(graft.ext.Purge.purgeAnnIndex(spark, name,
      Seq(6L).toDF("vec_id"), "vec_id", 0L))
    // vec 100+6 duplicates PURGED vec 6 exactly (same phase, tiny id
    // offset term) — without the mask the stored row of 6 pairs with
    // it at cosine ~1
    val batch = Seq((106L, annEmb(6)._2)).toDF("vec_id", "embedding")
    val pairs = AnnIndex.semanticPairsAgainstIndex(batch, "vec_id",
      "embedding", name, minCos = 0.9)
    val withPurged = pairs
      .where(col("id_a") === 6L || col("id_b") === 6L).count()
    assert(withPurged == 0L,
      "the ledger must mask the purged vector's still-stored cell row")
    assert(pairs.where(col("id_a") === 0L || col("id_b") === 0L)
        .count() > 0L,
      "fixture: the batch must still pair with LIVE same-phase vectors " +
        "(0, 12, ... share vec 6's phase) — otherwise this test proves " +
        "nothing about the mask specifically")
    drop(annTables(name): _*)
  }

  // ----------------------------------------------------------------- LSH

  private def lshTables(name: String): Seq[String] =
    Seq("_shingles", "_bands", "_batches", "_purged").map(name + _)

  test("lsh purge: ledger masks stored signatures from a post-purge " +
    "ingest; compaction erases index + pairs; certificate") {
    val name = "sp_lsh_a"
    val pairsT = "sp_lsh_a_pairs"
    drop(lshTables(name) :+ pairsT: _*)
    // 1↔2 near-dups (batch 0/1); 5 is a near-dup of PURGED 2,
    // arriving after the purge — the mask must suppress (2,5)
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "p q r s t u v w x y"),
      (4L, "m n o aa bb cc dd ee ff gg"),
      (5L, "a b c d e f g h i l"),
      (6L, "zz yy xx ww vv uu tt ss rr qq")).toDF("doc_id", "text")
    Dedup.writeLshIndex(docs.where(lit(false)), "doc_id", "text", name)
    def ingest(n: Long, cond: org.apache.spark.sql.Column) =
      Dedup.ingestBatchIntoIndex(docs.where(cond), n, "doc_id", "text",
        name, pairsT)
    assert(ingest(0L, col("doc_id") <= 2))
    assert(ingest(1L, col("doc_id") === 3L || col("doc_id") === 4L))
    val purged = Seq(2L).toDF("doc_id")
    assert(Purge.purgeLshIndex(spark, name, purged, "doc_id", 2L))
    assert(!Purge.purgeLshIndex(spark, name, purged, "doc_id", 2L),
      "replay must no-op at the marker")
    assert(ingest(3L, col("doc_id") >= 5L))
    assert(spark.table(pairsT).where(col("batch_id") === 3L)
        .where(col("id_a") === 2L || col("id_b") === 2L).isEmpty,
      "the post-purge ingest must not pair against the purged doc's " +
        "still-stored signature (ledger mask)")
    Dedup.compactLshIndex(spark, name, pairsTables = Seq(pairsT))
    Purge.assertLshPurged(spark, name, purged, "doc_id", Seq(pairsT))
    // resolved pair set == one-shot LSH over the live corpus
    val resolved = spark.table(pairsT)
      .groupBy(col("id_a"), col("id_b"))
      .agg(round(max(col("jaccard")), 6).as("jaccard"))
    val live = docs.where(col("doc_id") =!= 2L)
    val oneShot = Dedup.lshPairs(live, "doc_id", "text")
      .groupBy(col("id_a"), col("id_b"))
      .agg(round(max(col("jaccard")), 6).as("jaccard"))
    assert(sameRows(resolved, oneShot),
      "post-erasure pairs must equal the one-shot LSH over " +
        "corpus-minus-purged")
    assert(spark.table(s"${name}_purged").isEmpty, "ledger folded empty")
    // post-erasure ingest (column-order pin): doc 7 near-dups live
    // doc 1 — the pair must come out (1, 7), not endpoint-swapped or
    // signature-crosswise
    val extra = Seq((7L, "a b c d e f g h i m")).toDF("doc_id", "text")
    assert(Dedup.ingestBatchIntoIndex(extra, 4L, "doc_id", "text", name,
      pairsT))
    val p47 = spark.table(pairsT).where(col("batch_id") === 4L)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(p47.contains((1L, 7L)),
      "an ingest AFTER the erasing compaction must pair against the " +
        "folded index correctly")
    drop(lshTables(name) :+ pairsT: _*)
  }

  test("lsh rebuild drops the stale purge ledger and batch markers — " +
    "a reused name must not inherit a prior instance's takedown debt") {
    val name = "sp_lsh_rb"
    val pairsT = "sp_lsh_rb_pairs"
    drop(lshTables(name) :+ pairsT: _*)
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k")).toDF("doc_id", "text")
    Dedup.writeLshIndex(docs.where(lit(false)), "doc_id", "text", name)
    assert(Dedup.ingestBatchIntoIndex(docs, 0L, "doc_id", "text", name,
      pairsT))
    assert(Purge.purgeLshIndex(spark, name, Seq(2L).toDF("doc_id"),
      "doc_id", 1L))
    // REBUILD under the same name: without the ledger drop, doc 2's
    // fresh ingest would be silently masked out of candidate pairs
    // (and the next compaction would erase it); without the marker
    // drop, batch 0 would no-op entirely
    drop(pairsT)
    Dedup.writeLshIndex(docs.where(lit(false)), "doc_id", "text", name)
    assert(!spark.catalog.tableExists(s"${name}_purged"),
      "rebuild must drop the stale purge ledger")
    assert(!spark.catalog.tableExists(s"${name}_batches"),
      "rebuild must drop the stale batch markers")
    assert(Dedup.ingestBatchIntoIndex(docs, 0L, "doc_id", "text", name,
      pairsT), "batch 0 must land on the rebuilt index (no stale marker)")
    val pair = spark.table(pairsT)
      .where(col("id_a") === 1L && col("id_b") === 2L)
    assert(pair.count() == 1L,
      "the rebuilt index must pair doc 2 (purged in the PRIOR instance) " +
        "normally — no stale mask")
    drop(lshTables(name) :+ pairsT: _*)
  }

  test("lsh purge: the TxLog-committed pair form (ingestBatchIntoIndexTx) " +
    "erases through compactWith; certificate covers the log") {
    val name = "sp_lsh_tx"
    val pairsDir = java.nio.file.Files
      .createTempDirectory("sp_lsh_tx_pairs").toString
    drop(lshTables(name): _*)
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h i k"),
      (3L, "p q r s t u v w x y"),
      (4L, "a b c d e f g h i l")).toDF("doc_id", "text")
    Dedup.writeLshIndex(docs.where(lit(false)), "doc_id", "text", name)
    def ingest(n: Long, cond: org.apache.spark.sql.Column) =
      Dedup.ingestBatchIntoIndexTx(docs.where(cond), n, "doc_id", "text",
        name, pairsDir)
    assert(ingest(0L, col("doc_id") <= 2))
    assert(ingest(1L, col("doc_id") === 3L || col("doc_id") === 4L))
    val purged = Seq(2L).toDF("doc_id")
    assert(graft.ext.Purge.purgeLshIndex(spark, name, purged, "doc_id", 2L))
    // pre-erasure: the log still physically holds (1,2)/(2,4) rows
    val pre = graft.ext.Purge.lshPurgedOccurrences(spark, name, purged,
      "doc_id", pairsTxDirs = Seq(pairsDir)).toMap
    assert(pre(s"$pairsDir.id_a") + pre(s"$pairsDir.id_b") > 0L,
      s"purged pair rows must still be present pre-fold: $pre")
    Dedup.compactLshIndex(spark, name, pairsTxDirs = Seq(pairsDir),
      graceMs = 0L)
    graft.ext.Purge.assertLshPurged(spark, name, purged, "doc_id",
      pairsTxDirs = Seq(pairsDir))
    // resolved pairs == one-shot over the live corpus
    val resolved = graft.sources.TxLog.readCommitted(spark, pairsDir)
      .groupBy(col("id_a"), col("id_b"))
      .agg(round(max(col("jaccard")), 6).as("jaccard"))
    val oneShot = Dedup.lshPairs(docs.where(col("doc_id") =!= 2L),
        "doc_id", "text")
      .groupBy(col("id_a"), col("id_b"))
      .agg(round(max(col("jaccard")), 6).as("jaccard"))
    assert(sameRows(resolved, oneShot))
    drop(lshTables(name): _*)
  }
}
