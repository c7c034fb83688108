package graft

import graft.ext.{Components, Decontaminate, Dedup, Hygiene, Retrieval}
import graft.ext.Hygiene.HygieneState
import graft.sources.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The composed-pipeline invariants at unit scale: a crafted corpus
  * whose batch 1 DEMOTES a previously-kept survivor that OWNS a
  * shared passage — the exact cascade (ownership transfer, owner
  * rebuild, BM25 retraction) the per-family incremental forms never
  * exercise.  The one-shot twin is computed with the batch operators
  * (survivor pick → removeRepeatedPassages → bm25TopK) over the final
  * corpus. */
class HygieneSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  // ---- fixture ----------------------------------------------------------
  // G = the shared 5-token passage.  doc1 owns it (smallest id);
  // doc2 holds a later copy (marked on arrival); doc3 is a near-dup
  // of doc1 with a BETTER quality score, so its arrival merges
  // {1,3} and demotes doc1 — G's ownership must transfer to doc2.
  private val G = "g1 g2 g3 g4 g5"
  private val docs = Seq(
    (1L, s"$G alpha1 alpha2 alpha3 alpha4 alpha5 alpha6 alpha7"),
    (2L, s"beta1 beta2 $G beta3 beta4 beta5 beta6 beta7"),
    (3L, s"$G alpha1 alpha2 alpha3 alpha4 alpha5 alpha6 alpha7 extra9"),
    (4L, "delta1 delta2 delta3 delta4 delta5 delta6 delta7 delta8"))
  private val quality = Map(1L -> 0.5, 2L -> 0.6, 3L -> 0.9, 4L -> 0.7)
  private val batches: Seq[Seq[(Long, String)]] =
    Seq(docs.take(2), docs.slice(2, 3), docs.drop(3))
  private val bench = Seq(("qa", "g3"), ("qa", "beta3"), ("qb", "alpha2"))
    .toDF("query_id", "term")
  private val K = 3
  private val Floor = 0.0001
  private val PassN = 5
  private val MinJac = 0.5

  private def docsDF = docs.toDF("doc_id", "text")
  private def scoresForOf(qual: Map[Long, Double])(ids: DataFrame): DataFrame = {
    val q = qual.toSeq.toDF("doc_id", "q")
    ids.select(col("doc_id")).distinct().join(q, Seq("doc_id"))
      .select(col("doc_id"), col("q"))
  }
  private def rawTextForOf(all: Seq[(Long, String)])(ids: DataFrame): DataFrame =
    all.toDF("doc_id", "text").join(broadcast(ids.select(col("doc_id"))),
      Seq("doc_id"), "left_semi")
  private def scoresFor(ids: DataFrame): DataFrame = scoresForOf(quality)(ids)
  private def rawTextFor(ids: DataFrame): DataFrame = rawTextForOf(docs)(ids)

  private def mkState(tag: String): HygieneState = {
    def dir(n: String) = java.nio.file.Files
      .createTempDirectory(s"hyg_${tag}_$n").toString
    val st = HygieneState(s"hygspec_$tag", dir("pairs"), dir("assign"),
      dir("surv"), dir("emit"), dir("clean"), dir("flag"))
    // LSH bootstrap, the q103 shape: empty index, clean marker slate
    Dedup.writeLshIndex(docsDF.where(lit(false)), "doc_id", "text",
      st.lshName)
    graft.sources.Tables.dropWithLocation(spark, s"${st.lshName}_batches")
    st
  }
  private def dropState(st: HygieneState): Unit = {
    (st.allTables ++ Seq(s"${st.lshName}_shingles", s"${st.lshName}_bands",
      s"${st.lshName}_batches")).foreach(t =>
      graft.sources.Tables.dropWithLocation(spark, t))
    Seq(st.pairsDir, st.assignDir, st.survDir, st.emitDir, st.cleanDir,
      st.flagDir).foreach { d =>
      val p = java.nio.file.Paths.get(d)
      if (java.nio.file.Files.exists(p)) {
        val w = java.nio.file.Files.walk(p)
        try w.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally w.close()
      }
    }
  }

  private def step(st: HygieneState, b: Seq[(Long, String)], k: Long,
      hook: (String, Long) => Unit = (_, _) => ()): Boolean =
    Hygiene.hygieneStep(b.toDF("doc_id", "text"), k, "doc_id", "text",
      scoresFor, "q", rawTextFor, st, bench, "query_id", "term", K,
      Floor, passageN = PassN, minJaccard = MinJac, layerHook = hook)

  // ---- the one-shot twin -------------------------------------------------
  private def oneShotOf(all: Seq[(Long, String)], qual: Map[Long, Double],
      benchDf: DataFrame, k: Int, floor: Double, passN: Int,
      minJac: Double): (Set[Long], Map[Long, (String, Long, Long)],
      Set[Long]) = {
    val allDf = all.toDF("doc_id", "text")
    val pairs = Dedup.lshPairs(allDf, "doc_id", "text",
      minJaccard = minJac)
    val nodes = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val comp = Components.connectedComponents(pairs, "id_a", "id_b",
      nodes, "doc_id")
    val surv = comp.join(scoresForOf(qual)(comp), Seq("doc_id"))
      .groupBy("component")
      .agg(max_by(col("doc_id"), struct(col("q"), -col("doc_id")))
        .as("survivor_id"))
    val losers = comp.join(surv, "component")
      .where(col("doc_id") =!= col("survivor_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = allDf.where(!col("doc_id").isin(losers.toSeq: _*))
    val cleaned = Decontaminate.removeRepeatedPassages(kept, "doc_id",
        "text", passN).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val cleanedDf = cleaned.toSeq
      .map { case (id, (t, nk, nr)) => (id, t) }.toDF("doc_id", "text")
    val flags = Retrieval.bm25TopK(cleanedDf, "doc_id", "text", benchDf,
        "query_id", "term", k)
      .where(col("score") >= floor)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    (losers, cleaned, flags)
  }
  private lazy val oneShot: (Set[Long], Map[Long, (String, Long, Long)],
      Set[Long]) = oneShotOf(docs, quality, bench, K, Floor, PassN, MinJac)

  private def resolved(st: HygieneState): Map[Long, (String, Long, Long)] =
    Hygiene.resolveHygiene(spark, st, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("the fixture demotes a passage owner (doc 1 loses {1,3} to doc 3)") {
    val (losers, _, _) = oneShot
    assert(losers == Set(1L),
      s"fixture must demote exactly doc 1, got $losers — adjust texts/" +
        "minJaccard if the LSH pairing changed")
  }

  test("incremental composition == one-shot (clean texts, flags, final rows)") {
    val st = mkState("e2e")
    try {
      batches.zipWithIndex.foreach { case (b, k) => assert(step(st, b, k.toLong)) }
      val (losers, cleaned, flags) = oneShot
      val want = cleaned.view.filterKeys(id =>
        !losers.contains(id) && !flags.contains(id)).toMap
      assert(resolved(st) == want)
      // the flag log's latest batch equals the one-shot flag set
      // (dropping the per-batch null-id sentinel row that makes
      // empty flag sets representable)
      val got = TxLog.readBatch(spark, st.flagDir,
          TxLog.committedBatchIds(spark, st.flagDir).max)
        .select("doc_id").where(col("doc_id").isNotNull)
        .collect().map(_.getLong(0)).toSet
      assert(got == flags, s"flags: got $got want $flags")
    } finally dropState(st)
  }

  test("demotion transfers gram ownership to the marked kept holder and rebuilds it") {
    val st = mkState("xfer")
    try {
      assert(step(st, batches(0), 0L))
      // pre-demotion: doc1 owns G, doc2's copy is stripped
      val clean0 = Hygiene.resolveClean(spark, st.cleanDir, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(clean0(1L).startsWith(G))
      assert(!clean0(2L).contains("g1"), s"doc2 pre: ${clean0(2L)}")
      assert(step(st, batches(1), 1L))
      // post-demotion: doc2 regains its copy (it is now the smallest
      // kept holder); doc3's copy is stripped against the new owner.
      // Read the UNFILTERED clean log — doc2's restored text makes it
      // a decontamination flag hit, so resolveHygiene would hide it.
      val clean1 = Hygiene.resolveClean(spark, st.cleanDir, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val evicted = Components.resolveEvicted(
        TxLog.readCommitted(spark, st.emitDir), "doc_id", "batch")
        .collect().map(_.getLong(0)).toSet
      assert(evicted == Set(1L), s"demoted set: $evicted")
      assert(clean1(2L).contains(G), s"doc2 post: ${clean1(2L)}")
      assert(!clean1(3L).contains("g1 g2 g3 g4 g5"),
        s"doc3 stripped vs transferred owner: ${clean1(3L)}")
    } finally dropState(st)
  }

  test("mutable BM25 probe == raw scorer over the represented corpus") {
    val st = mkState("bm")
    try {
      batches.zipWithIndex.foreach { case (b, k) => step(st, b, k.toLong) }
      val (losers, cleaned, _) = oneShot
      val corpus = cleaned.toSeq.collect {
        case (id, (t, _, _)) if !losers.contains(id) => (id, t)
      }.toDF("doc_id", "text")
      val raw = Retrieval.bm25TopK(corpus, "doc_id", "text", bench,
        "query_id", "term", K).collect().map(_.toSeq).toSet
      val idx = Hygiene.bm25TopKFromMutable(spark, st, bench, "query_id",
        "term", K, "doc_id").collect().map(_.toSeq).toSet
      assert(idx == raw, s"probe drift:\nidx=$idx\nraw=$raw")
      // term-ceiling fallback: past maxLiteralTerms the scans
      // semi-join against the term frame instead — same rows
      val idxFb = Hygiene.bm25TopKFromMutable(spark, st, bench, "query_id",
          "term", K, "doc_id", maxLiteralTerms = 0)
        .collect().map(_.toSeq).toSet
      assert(idxFb == raw, s"fallback drift:\nidx=$idxFb\nraw=$raw")
    } finally dropState(st)
  }

  test("a marked batch no-ops; a mid-step crash converges on replay") {
    val stA = mkState("crashA") // crashed-then-replayed
    val stB = mkState("crashB") // crash-free twin
    try {
      assert(step(stA, batches(0), 0L)); assert(step(stB, batches(0), 0L))
      // full replay of a marked batch: no-op before any compute
      assert(!step(stA, batches(0), 0L))
      // crash AFTER the passage layer of batch 1 (clean log committed,
      // BM25/flags absent) — the replay must re-run layers 3-4 and
      // recompute layer 2's partitions to identical content
      val boom = intercept[RuntimeException] {
        step(stA, batches(1), 1L, hook = (layer, _) =>
          if (layer == "passage") throw new RuntimeException("crash"))
      }
      assert(boom.getMessage == "crash")
      assert(step(stA, batches(1), 1L), "replay must run, not no-op")
      assert(step(stB, batches(1), 1L))
      assert(step(stA, batches(2), 2L)); assert(step(stB, batches(2), 2L))
      assert(resolved(stA) == resolved(stB))
    } finally { dropState(stA); dropState(stB) }
  }

  test("mid-loop compaction preserves state; a replay across the fold no-ops") {
    val st = mkState("cpt")
    try {
      assert(step(st, batches(0), 0L))
      assert(step(st, batches(1), 1L))
      // the fold must preserve the RESOLVED state exactly — including
      // the flag set, whose live markers the fold replaces with the
      // compacted base (resolving by marker ids instead of the stored
      // batch column would silently drop every flag here)
      val preFold = resolved(st)
      Hygiene.compactHygiene(spark, st)
      assert(resolved(st) == preFold,
        "resolved state must survive the nine-store fold unchanged")
      // replay across the fold boundary: the step marker survives the
      // marker-table fold, so the whole step no-ops
      assert(!step(st, batches(1), 1L))
      assert(step(st, batches(2), 2L))
      val (losers, cleaned, flags) = oneShot
      val want = cleaned.view.filterKeys(id =>
        !losers.contains(id) && !flags.contains(id)).toMap
      assert(resolved(st) == want)
    } finally dropState(st)
  }

  test("ownership death and same-batch re-ownership merge to ONE keeper row (tombstone-recreate)") {
    // doc 1 is G's ONLY holder until its near-dup doc 3 demotes it in
    // batch 1: the transfer finds no marked kept holder (tombstone),
    // and doc 3 — arriving in the SAME batch — holds G, so the novel
    // path re-owns it.  Both decisions land in the same batch
    // partition, where latest-wins can't order them: the writer must
    // merge them to one row (the batch's), or the resolve is
    // nondeterministic.
    val lDocs = Seq(
      (1L, s"$G alpha1 alpha2 alpha3 alpha4 alpha5 alpha6 alpha7"),
      (2L, "beta1 beta2 beta3 beta4 beta5 beta6 beta7 beta8"), // no G
      (3L, s"$G alpha1 alpha2 alpha3 alpha4 alpha5 alpha6 alpha7 extra9"),
      (4L, "delta1 delta2 delta3 delta4 delta5 delta6 delta7 delta8"))
    val st = mkState("tomb")
    def lStep(b: Seq[(Long, String)], k: Long): Boolean =
      Hygiene.hygieneStep(b.toDF("doc_id", "text"), k, "doc_id", "text",
        scoresFor, "q",
        ids => lDocs.toDF("doc_id", "text").join(
          broadcast(ids.select(col("doc_id"))), Seq("doc_id"), "left_semi"),
        st, bench, "query_id", "term", K, Floor, passageN = PassN,
        minJaccard = MinJac)
    try {
      assert(lStep(lDocs.take(2), 0L))
      assert(lStep(lDocs.slice(2, 3), 1L))
      assert(lStep(lDocs.drop(3), 2L))
      // the batch partition must hold ONE row per gram hash
      val dup = spark.table(st.pk).groupBy(col("h"), col("batch_id"))
        .count().where(col("count") > 1).count()
      assert(dup == 0L, s"$dup (h, batch_id) pairs hold multiple rows")
      // doc 3 re-owns G: its clean text keeps the passage, and the
      // one-shot twin agrees (kept set = {2, 3, 4}, G unique to 3)
      val clean = Hygiene.resolveClean(spark, st.cleanDir, "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(clean(3L).contains(G), s"doc3 must keep G: ${clean(3L)}")
      val want = Decontaminate.removeRepeatedPassages(
        lDocs.drop(1).toDF("doc_id", "text"), "doc_id", "text", PassN)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(clean.view.filterKeys(_ != 1L).toMap == want)
    } finally dropState(st)
  }

  // ---- demotion storm: the hub-document skew case ------------------------
  // Batch 1's three hub docs are each a near-identical better-quality
  // twin of a stored passage OWNER, so ONE batch demotes three stored
  // survivors {1,3,5} — past the test ceiling of 2, forcing every
  // repair collect (demotions, transferred owners, changed-doc lists)
  // through the distributed join path.  The hubs also re-hold their
  // twins' non-shared grams, covering tombstone-recreate under the
  // storm path.  Ownership of GA/GB/GC must transfer to the marked
  // kept holders {2,4,6}.
  private val GA = "ga1 ga2 ga3 ga4 ga5"
  private val GB = "gb1 gb2 gb3 gb4 gb5"
  private val GC = "gc1 gc2 gc3 gc4 gc5"
  private val stormDocs = Seq(
    (1L, s"$GA alpha1 alpha2 alpha3 alpha4 alpha5 alpha6 alpha7"),
    (2L, s"beta1 beta2 $GA beta3 beta4 beta5 beta6 beta7"),
    (3L, s"$GB gamma1 gamma2 gamma3 gamma4 gamma5 gamma6 gamma7"),
    (4L, s"delta1 delta2 $GB delta3 delta4 delta5 delta6 delta7"),
    (5L, s"$GC eps1 eps2 eps3 eps4 eps5 eps6 eps7"),
    (6L, s"zeta1 zeta2 $GC zeta3 zeta4 zeta5 zeta6 zeta7"),
    (7L, s"$GA alpha1 alpha2 alpha3 alpha4 alpha5 alpha6 alpha7 hub7"),
    (8L, s"$GB gamma1 gamma2 gamma3 gamma4 gamma5 gamma6 gamma7 hub8"),
    (9L, s"$GC eps1 eps2 eps3 eps4 eps5 eps6 eps7 hub9"))
  private val stormQuality = Map(1L -> 0.5, 2L -> 0.6, 3L -> 0.5,
    4L -> 0.6, 5L -> 0.5, 6L -> 0.6, 7L -> 0.9, 8L -> 0.9, 9L -> 0.9)

  test("a demotion storm past the ceiling takes the join path, bit-equal " +
      "to the literal path and the one-shot") {
    val stormBench = Seq(("qa", "beta3"), ("qb", "alpha2"))
      .toDF("query_id", "term")
    def run(tag: String, maxIds: Int): Map[Long, (String, Long, Long)] = {
      val st = mkState(tag)
      try {
        Seq(stormDocs.take(6), stormDocs.drop(6)).zipWithIndex.foreach {
          case (b, k) =>
            assert(Hygiene.hygieneStep(b.toDF("doc_id", "text"), k.toLong,
              "doc_id", "text", scoresForOf(stormQuality), "q",
              rawTextForOf(stormDocs), st, stormBench, "query_id", "term",
              K, Floor, passageN = PassN, minJaccard = MinJac,
              maxDriverRepairIds = maxIds))
        }
        resolved(st)
      } finally dropState(st)
    }
    val viaJoin = run("stormJ", 2) // 3 demotions > 2 → distributed path
    val viaLit = run("stormL", Hygiene.DefaultMaxDriverRepairIds)
    val (losers, cleaned, flags) = oneShotOf(stormDocs, stormQuality,
      stormBench, K, Floor, PassN, MinJac)
    assert(losers == Set(1L, 3L, 5L),
      s"fixture must demote docs 1,3,5 in one batch, got $losers — " +
        "adjust texts/minJaccard if the LSH pairing changed")
    val want = cleaned.view.filterKeys(id =>
      !losers.contains(id) && !flags.contains(id)).toMap
    assert(viaJoin == want, "storm (join path) diverged from one-shot")
    assert(viaLit == viaJoin, "literal and join paths diverged")
  }

  test("a latest batch whose flag set shrinks to ZERO clears the flags " +
      "(empty sets are representable)") {
    // batch 0: doc 1 is the only zzz holder — high idf, flagged.
    // batch 1: six more zzz docs arrive — df rises, idf collapses,
    // every score drops below the floor, so the latest flag set is
    // EMPTY.  Without the per-batch sentinel, batch 0's stale set
    // would silently apply and doc 1 would stay wrongly excluded.
    val eDocs = Seq(
      (1L, "zzz w1 w2 w3 w4 w5"),
      (2L, "y1 y2 y3 y4 y5 y6")) ++
      (3L to 8L).map(i => (i, s"zzz f${i}1 f${i}2 f${i}3 f${i}4 f${i}5"))
    val eQual = eDocs.map { case (id, _) => id -> 0.5 }.toMap
    val eBench = Seq(("qz", "zzz")).toDF("query_id", "term")
    val eFloor = 0.3
    val st = mkState("eflag")
    try {
      Seq(eDocs.take(2), eDocs.drop(2)).zipWithIndex.foreach {
        case (b, k) =>
          assert(Hygiene.hygieneStep(b.toDF("doc_id", "text"), k.toLong,
            "doc_id", "text", scoresForOf(eQual), "q",
            rawTextForOf(eDocs), st, eBench, "query_id", "term", K,
            eFloor, passageN = PassN, minJaccard = MinJac))
      }
      // fixture guard: batch 0 DID flag doc 1; the latest set IS empty
      val flag0 = TxLog.readBatch(spark, st.flagDir, 0L)
        .where(col("doc_id").isNotNull)
        .collect().map(_.getLong(0)).toSet
      assert(flag0 == Set(1L), s"batch 0 must flag doc 1, got $flag0 — " +
        "retune eFloor if the scores moved")
      val flag1 = TxLog.readBatch(spark, st.flagDir, 1L)
        .where(col("doc_id").isNotNull)
        .collect().map(_.getLong(0)).toSet
      assert(flag1.isEmpty, s"batch 1's flag set must be empty, got $flag1")
      val (losers, cleaned, flags) = oneShotOf(eDocs, eQual, eBench, K,
        eFloor, PassN, MinJac)
      assert(flags.isEmpty && losers.isEmpty)
      val got = resolved(st)
      assert(got.contains(1L),
        "doc 1 must resolve — a stale batch-0 flag is hiding it")
      assert(got == cleaned, "resolved state diverged from one-shot")
      // the compaction fold must keep the EMPTY latest set, not bake
      // in batch 0's stale one
      Hygiene.compactHygiene(spark, st)
      assert(resolved(st) == cleaned,
        "the flag fold baked a stale non-empty set into the base")
    } finally dropState(st)
  }

  test("mutable BM25 probe over an EMPTY represented corpus returns the " +
      "typed empty result (no NaN avgdl)") {
    import graft.ext.IndexLifecycle
    val st = mkState("empty0")
    try {
      // a posting added in batch 0 and tombstoned in batch 1; signed
      // df/stats deltas net to zero — the all-docs-evicted shape
      def bmpRow(tf: Long) = spark.range(1).select(lit("beta3").as("tok"),
        lit(1L).as("id"), lit(tf).as("tf"), lit(6L).as("len"))
      def bmvRow(df: Long) = spark.range(1).select(lit("beta3").as("tok"),
        lit(df).as("df"))
      def bmsRow(n: Long, t: Long) = spark.range(1)
        .select(lit(n).as("n_docs"), lit(t).as("total_len"))
      IndexLifecycle.writeBatchPartition(bmpRow(1L), st.bmp, 0L, Some(("tok", 4)))
      IndexLifecycle.writeBatchPartition(bmpRow(0L), st.bmp, 1L, Some(("tok", 4)))
      IndexLifecycle.writeBatchPartition(bmvRow(1L), st.bmv, 0L, Some(("tok", 4)))
      IndexLifecycle.writeBatchPartition(bmvRow(-1L), st.bmv, 1L, Some(("tok", 4)))
      IndexLifecycle.writeBatchPartition(bmsRow(1L, 6L), st.bms, 0L, None)
      IndexLifecycle.writeBatchPartition(bmsRow(-1L, -6L), st.bms, 1L, None)
      val out = Hygiene.bm25TopKFromMutable(spark, st, bench, "query_id",
        "term", K, "doc_id")
      assert(out.columns.toSeq == Seq("query_id", "doc_id", "score", "rank"))
      assert(out.count() == 0L, "an empty corpus has no hits")
    } finally dropState(st)
  }

  test("a batch-id gap or non-monotone doc ids are rejected loudly") {
    val st = mkState("gap")
    try {
      assert(step(st, batches(0), 0L))
      val gap = intercept[IllegalArgumentException] {
        step(st, batches(2), 2L)
      }
      assert(gap.getMessage.contains("contiguous"))
      val mono = intercept[IllegalArgumentException] {
        step(st, Seq((0L, "z1 z2 z3 z4 z5 z6")), 1L)
      }
      assert(mono.getMessage.contains("id order"))
    } finally dropState(st)
  }
}
