package graft

import graft.sources.TxLog
import org.scalatest.funsuite.AnyFunSuite

/** The maintenance writer lease: compact/vacuum are single-writer by
  * contract, and since round 7 the contract is ENFORCED — a second
  * concurrent maintainer (or a commit racing maintenance) fails
  * loudly with the holder's identity, never corrupts quietly. */
class TxLogLeaseSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def freshLog(n: Long): String = {
    val dir = java.nio.file.Files.createTempDirectory("txlease").toString
    (0L until n).foreach(i =>
      assert(TxLog.commitBatch(Seq((i, s"b$i")).toDF("id", "v"), dir, i)))
    dir
  }

  test("a second maintainer is refused while the lease is held, log intact") {
    val dir = freshLog(4)
    val before = TxLog.readCommitted(spark, dir).orderBy("id").collect().toSeq
    val token = TxLog.acquireLease(spark, dir, "spec-compactor")
    try {
      // a concurrent compactor fails loudly, naming the holder
      val exC = intercept[IllegalStateException](TxLog.compact(spark, dir))
      assert(exC.getMessage.contains("spec-compactor"))
      val exV = intercept[IllegalStateException](TxLog.vacuum(spark, dir))
      assert(exV.getMessage.contains("spec-compactor"))
      // an ingest racing maintenance fails loudly too — vacuum would
      // reclaim its staged dir as an orphan
      val exI = intercept[IllegalStateException](
        TxLog.commitBatch(Seq((9L, "x")).toDF("id", "v"), dir, 9L))
      assert(exI.getMessage.contains("spec-compactor"))
      assert(TxLog.maintenanceInProgress(spark, dir))
      // nothing was corrupted or half-applied by the refused calls
      assert(TxLog.readCommitted(spark, dir).orderBy("id").collect().toSeq == before)
      assert(TxLog.committedBatchIds(spark, dir) == Seq(0L, 1L, 2L, 3L))
    } finally TxLog.releaseLease(spark, dir, token)
    // the release reopens the log: both maintenance and ingest proceed
    assert(!TxLog.maintenanceInProgress(spark, dir))
    assert(TxLog.compact(spark, dir) == Some(3L))
    assert(TxLog.commitBatch(Seq((4L, "b4")).toDF("id", "v"), dir, 4L))
    assert(TxLog.readCommitted(spark, dir).count() == 5)
  }

  test("two concurrent compactors: no corruption, loser (if any) fails loudly") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val dir = freshLog(6)
    val before = TxLog.readCommitted(spark, dir).orderBy("id").collect().toSeq
    // either they serialize (first folds, second finds <2 markers →
    // None) or they collide (loser throws the lease exception) — the
    // one outcome the lease forbids is both folding concurrently
    val results = Await.result(Future.sequence((1 to 2).map(_ =>
      Future(scala.util.Try(TxLog.compact(spark, dir))))), 2.minutes)
    val folded = results.collect { case scala.util.Success(Some(c)) => c }
    val refused = results.collect { case scala.util.Failure(e: IllegalStateException) => e }
    assert(folded.size <= 1, s"at most one compactor may fold, got $folded")
    assert(folded.size + refused.size +
      results.count(_ == scala.util.Success(None)) == 2)
    refused.foreach(e => assert(e.getMessage.contains("writer lease")))
    assert(TxLog.readCommitted(spark, dir).orderBy("id").collect().toSeq == before,
      "committed rows must be untouched by the race")
    assert(!TxLog.maintenanceInProgress(spark, dir), "lease must be released")
  }

  test("a replayed pre-compaction batch stays a no-op across the boundary") {
    val dir = freshLog(4)
    val before = TxLog.readCommitted(spark, dir).orderBy("id").collect().toSeq
    assert(TxLog.compact(spark, dir) == Some(3L))
    // the folded marker answers for every folded id: a writer
    // replaying batch 1 (crash-recovery, uncheckpointed restart)
    // must be refused EVEN WITH different payload — the commit
    // point was already observed
    assert(TxLog.isCommitted(spark, dir, 1L))
    assert(!TxLog.commitBatch(Seq((99L, "poison")).toDF("id", "v"), dir, 1L),
      "a folded batch id must read as committed, not re-commit")
    assert(TxLog.readCommitted(spark, dir).orderBy("id").collect().toSeq == before,
      "the replay must not have changed a row")
    // the folded id is no longer SEPARABLE — readBatch says so loudly
    val ex = intercept[IllegalStateException](TxLog.readBatch(spark, dir, 1L))
    assert(ex.getMessage.contains("folded by compaction"))
    // and the log keeps accepting genuinely-new batches above the floor
    assert(TxLog.commitBatch(Seq((4L, "b4")).toDF("id", "v"), dir, 4L))
    assert(TxLog.readCommitted(spark, dir).count() == 5)
  }

  test("compactWith folds the base semantically; resolution and replay survive") {
    import org.apache.spark.sql.functions.{col, lit, max_by}
    val dir = java.nio.file.Files.createTempDirectory("txlease").toString
    // an assignment-style delta log: batch 1 remaps node 2, batch 2
    // remaps it again and adds node 4
    assert(TxLog.commitBatch(Seq((1L, 1L), (2L, 2L), (3L, 3L))
      .toDF("id", "component").withColumn("batch", lit(0L)), dir, 0L))
    assert(TxLog.commitBatch(Seq((2L, 1L))
      .toDF("id", "component").withColumn("batch", lit(1L)), dir, 1L))
    assert(TxLog.commitBatch(Seq((2L, 0L), (4L, 0L))
      .toDF("id", "component").withColumn("batch", lit(2L)), dir, 2L))
    val resolve = (df: org.apache.spark.sql.DataFrame) =>
      df.groupBy(col("id"))
        .agg(max_by(col("component"), col("batch")).as("component"))
    val want = resolve(TxLog.readCommitted(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(TxLog.compactWith(spark, dir, (df, c) =>
      resolve(df).withColumn("batch", lit(c))) == Some(2L))
    // the base now holds LIVE rows only (4, not 6): superseded
    // deltas are gone, which is the point of the semantic fold
    val base = TxLog.readCommitted(spark, dir)
    assert(base.count() == 4L, "superseded rows must not survive the fold")
    assert(resolve(base).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      == want, "resolution over the folded base must be unchanged")
    // replay guard holds for semantically-folded ids too
    assert(!TxLog.commitBatch(Seq((2L, 9L))
      .toDF("id", "component").withColumn("batch", lit(1L)), dir, 1L))
    // and a post-fold delta resolves on top of the base as before
    assert(TxLog.commitBatch(Seq((4L, 1L))
      .toDF("id", "component").withColumn("batch", lit(3L)), dir, 3L))
    assert(resolve(TxLog.readCommitted(spark, dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      == want + (4L -> 1L))
  }

  test("forced folds: a one-batch log rewrites, a base-only log refolds " +
    "under the next marker generation, floors and replay survive") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("txforce").toString
    assert(TxLog.commitBatch(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      dir, 0L))
    // default size gate: one live marker → no fold
    assert(TxLog.compactWith(spark, dir, (df, _) =>
      df.where(col("id") =!= 2L)) == None)
    assert(TxLog.readCommitted(spark, dir).count() == 2L)
    // forced (the erasing-fold case): the single batch rewrites
    assert(TxLog.compactWith(spark, dir, (df, _) =>
      df.where(col("id") =!= 2L), force = true) == Some(0L))
    assert(TxLog.readCommitted(spark, dir)
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    assert(TxLog.isCommitted(spark, dir, 0L), "folded id stays committed")
    // base-only refold: same ceiling, next generation marker — the
    // second erase must still rewrite (create-only marker publishes
    // would otherwise wedge it)
    assert(TxLog.compactWith(spark, dir, (df, _) =>
      df.where(col("id") =!= 1L), force = true) == Some(0L))
    assert(TxLog.readCommitted(spark, dir).isEmpty,
      "the generation refold must serve the re-erased base")
    assert(TxLog.lastCompactedId(spark, dir) == Some(0L))
    // and a third one (g1 → g2)
    assert(TxLog.compactWith(spark, dir, (df, _) => df, force = true)
      == Some(0L))
    // the log keeps working: new batches land above the floor and a
    // normal fold retakes the plain-name ceiling
    assert(TxLog.commitBatch(Seq((3L, "c")).toDF("id", "v"), dir, 1L))
    assert(!TxLog.commitBatch(Seq((9L, "x")).toDF("id", "v"), dir, 0L),
      "the refolded ceiling must still refuse folded-id replays")
    assert(TxLog.compact(spark, dir) == Some(1L))
    assert(TxLog.readCommitted(spark, dir)
      .collect().map(_.getLong(0)).toSeq == Seq(3L))
    // nothing force-folds on an empty-marker log
    val empty = java.nio.file.Files.createTempDirectory("txforce2").toString
    assert(TxLog.compactWith(spark, empty, (df, _) => df, force = true)
      == None)
  }

  test("two writers racing one batch id: exactly-once, loser's payload discarded") {
    // deterministic injection of the multi-writer race (the scenario
    // the round-10 torn-crc fix met by accident): writer B commits
    // the SAME batch id while writer A is between its stage write
    // and its marker publish — via the hooked seam, not timing
    val dir = java.nio.file.Files.createTempDirectory("txlease").toString
    val dfA = Seq((1L, "loser")).toDF("id", "v")
    val dfB = Seq((2L, "winner")).toDF("id", "v")
    var bWon = false
    val aResult = TxLog.commitBatchHooked(dfA, dir, 7L, () => {
      bWon = TxLog.commitBatch(dfB, dir, 7L)
    })
    assert(bWon, "writer B (inside A's stage-to-publish window) must commit")
    assert(!aResult, "writer A must observe the lost race, not double-commit")
    // the marker is readable and names exactly the winner's payload
    assert(TxLog.isCommitted(spark, dir, 7L))
    assert(TxLog.committedBatchIds(spark, dir) == Seq(7L))
    val rows = TxLog.readBatch(spark, dir, 7L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows == Seq((2L, "winner")))
    assert(TxLog.readCommitted(spark, dir).count() == 1L)
    // A's orphaned staged dir is vacuum fodder, nothing more
    assert(TxLog.vacuum(spark, dir, graceMs = 0L) == 1,
      "exactly the loser's staged dir should be reclaimed")
    assert(TxLog.readBatch(spark, dir, 7L).count() == 1L,
      "the winner's data must survive the vacuum")
  }

  test("breakLease recovers from a crashed holder") {
    val dir = freshLog(3)
    TxLog.acquireLease(spark, dir, "crashed-maintainer") // never released
    intercept[IllegalStateException](TxLog.compact(spark, dir))
    assert(TxLog.breakLease(spark, dir))
    assert(!TxLog.maintenanceInProgress(spark, dir))
    assert(TxLog.compact(spark, dir) == Some(2L))
    assert(TxLog.readCommitted(spark, dir).count() == 3)
  }

  test("releaseLease with a stale token leaves a re-acquired lease alone") {
    val dir = freshLog(1)
    val stale = TxLog.acquireLease(spark, dir, "old-holder")
    assert(TxLog.breakLease(spark, dir)) // operator recovered
    val fresh = TxLog.acquireLease(spark, dir, "new-holder")
    // the crashed holder resumes and releases: must NOT clobber the
    // new holder's lease (token mismatch)
    TxLog.releaseLease(spark, dir, stale)
    assert(TxLog.maintenanceInProgress(spark, dir),
      "a stale release must not delete the new holder's lease")
    TxLog.releaseLease(spark, dir, fresh)
    assert(!TxLog.maintenanceInProgress(spark, dir))
  }

  test("a zero-grace vacuum mid-stage: commit re-stages, batch lands intact") {
    // the commitBatchHooked seam fires after each stage write and
    // before the pre-publish lease re-check — exactly the window a
    // maintenance cycle can slip into unnoticed.  A zero-grace vacuum
    // there sweeps the unmarked staged dir; the commit must detect the
    // loss and re-stage rather than publish a marker naming deleted
    // data.
    val dir = freshLog(2)
    val vacuumed = new java.util.concurrent.atomic.AtomicInteger(0)
    val committed = TxLog.commitBatchHooked(
      Seq((7L, "x")).toDF("id", "v"), dir, 2L,
      () => if (vacuumed.getAndIncrement() == 0) TxLog.vacuum(spark, dir, graceMs = 0))
    assert(committed, "the re-staged attempt must land the batch")
    assert(vacuumed.get() == 2, "one re-stage after the mid-stage sweep")
    assert(TxLog.committedBatchIds(spark, dir) == Seq(0L, 1L, 2L))
    assert(TxLog.readCommitted(spark, dir).where($"id" === 7L).count() == 1,
      "the batch's rows must be readable — no marker may name deleted data")
  }

  test("a grace-respecting vacuum leaves young staged dirs and tmp bodies alone") {
    val dir = freshLog(1)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a fresh unmarked staged dir — indistinguishable from an
    // in-flight commit's stage write — and a fresh tmp marker body
    // microseconds from its publish rename
    Seq((9L, "inflight")).toDF("id", "v")
      .write.parquet(s"$dir/_staged/1-cafe-inflight-stage")
    val tmpBody = new org.apache.hadoop.fs.Path(s"$dir/_commits/.tmp/pending")
    fs.create(tmpBody, false).close()
    assert(TxLog.vacuum(spark, dir) == 0,
      "default grace must spare everything younger than it")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_staged/1-cafe-inflight-stage")))
    assert(fs.exists(tmpBody))
    // writer-down recovery: zero grace reclaims both
    assert(TxLog.vacuum(spark, dir, graceMs = 0) == 1)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/_staged/1-cafe-inflight-stage")))
    assert(!fs.exists(tmpBody))
  }

  test("lease refusal messages carry the holder's age for breakLease triage") {
    val dir = freshLog(1)
    val token = TxLog.acquireLease(spark, dir, "aged-holder")
    try {
      val ex = intercept[IllegalStateException](
        TxLog.commitBatch(Seq((5L, "y")).toDF("id", "v"), dir, 5L))
      assert(ex.getMessage.contains("aged-holder"))
      assert("held for ~\\d+ s".r.findFirstIn(ex.getMessage).isDefined,
        s"refusal must state how long the lease has existed: ${ex.getMessage}")
    } finally TxLog.releaseLease(spark, dir, token)
  }

  test("negative batch ids are rejected before anything lands") {
    val dir = java.nio.file.Files.createTempDirectory("txlease_neg").toString
    val ex = intercept[IllegalArgumentException](
      TxLog.commitBatch(Seq((1L, "a")).toDF("id", "v"), dir, -1L))
    assert(ex.getMessage.contains("-1"))
    // nothing staged, nothing committed
    val (f, root) = (new org.apache.hadoop.fs.Path(dir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration) ->
      new org.apache.hadoop.fs.Path(dir)
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_staged")))
    assert(!f.exists(new org.apache.hadoop.fs.Path(root, "_commits")))
  }
}
