package graft

import graft.ext.{Components, Decontaminate, Dedup, Hygiene, Purge, Retrieval}
import graft.ext.Hygiene.HygieneState
import graft.sources.TxLog
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The purge/takedown cascade at unit scale, against the one-shot
  * pipeline over corpus-minus-purged.  The crafted corpus forces every
  * non-monotone repair the ingest path never needs:
  *
  *  - doc 1 (kept, unpaired) OWNS passage G that kept doc 3 holds
  *    marked → purging 1 must TRANSFER G to 3 and rebuild 3;
  *  - doc 4 is the surviving near-dup of doc 2 (kept at batch 0,
  *    DEMOTED at batch 1) → purging 4 must RE-PROMOTE 2 (a doc with a
  *    stale earlier-era clean row and retracted BM25 state), and 2's
  *    passage T — owned by LIVE doc 5 since 2's demotion — must be
  *    STOLEN back (2 < 5), rebuilding 5 with new marks;
  *  - doc 6 bridges near-dups 8 and 9 (no 8↔9 pair) and out-scores
  *    both → purging 6 SPLITS the component, tombstones its label,
  *    and promotes 8 AND 9;
  *  - id 7 was never ingested → purging it is a silent no-op;
  *  - post-purge batch 4 contains doc 10, a near-dup of PURGED doc 4
  *    whose LSH signature still sits in the index → the ledger must
  *    drop the (4, 10) pair before the closure, or the purged id
  *    re-enters the graph and bridges live clusters.
  *
  * The erasing compaction + certificate close the loop: before it the
  * stores still hold the purged rows (retracted); after it
  * [[Purge.assertPurged]] proves zero occurrences everywhere.
  *
  * SCOPE NOTE — what the certificate does NOT cover: Structured
  * Streaming checkpoint/state directories of stateful consumers
  * (TWS dedup state, priority-sample reservoirs).  The erasure
  * boundary and the two closure contracts (state-TTL horizon, or
  * checkpoint restart post-purge) are documented — per shipped
  * stream, as a table — in SCALE.md §"What purge does NOT erase:
  * streaming checkpoints". */
class PurgeSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val G = "g1 g2 g3 g4 g5"
  private val T = "t1 t2 t3 t4 t5"
  private val docs = Seq(
    (1L, s"$G d1 d2 d3 d4 d5 d6 d7"),
    (2L, s"$T s1 s2 s3 s4 s5 a1 a2"),
    (3L, s"e1 e2 $G e3 e4 e5 e6 e7"),
    (4L, "t4 t5 s1 s2 s3 s4 s5 a1 a2 x9"),
    (5L, s"$T c1 c2 c3 c4 c5 c6 c7"),
    (6L, "m1 m2 m3 m4 m5 m6 m7 m8 n1 n2 n3 n4 n5 n6 n7 n8"),
    (8L, "m1 m2 m3 m4 m5 m6 m7 m8 n1 n2"),
    (9L, "m7 m8 n1 n2 n3 n4 n5 n6 n7 n8"),
    (10L, "t4 t5 s1 s2 s3 s4 s5 a1 a2 y9"),
    (11L, "w1 w2 w3 w4 w5 w6 w7 w8"))
  private val quality = Map(1L -> 0.5, 2L -> 0.5, 3L -> 0.6, 4L -> 0.9,
    5L -> 0.7, 6L -> 0.9, 8L -> 0.6, 9L -> 0.7, 10L -> 0.4, 11L -> 0.5,
    12L -> 0.5, 13L -> 0.6)
  private val purgedIds = Seq(1L, 4L, 6L, 7L)
  private val batches: Seq[Seq[(Long, String)]] = Seq(
    docs.filter(d => Set(1L, 2L, 3L).contains(d._1)),
    docs.filter(d => Set(4L, 5L, 6L).contains(d._1)),
    docs.filter(d => Set(8L, 9L).contains(d._1)),
    docs.filter(d => Set(10L, 11L).contains(d._1)))
  private val bench = Seq(("qa", "e3"), ("qb", "c1"))
    .toDF("query_id", "term")
  private val K = 3
  private val Floor = 0.0001
  private val PassN = 5
  private val MinJac = 0.3

  private def scoresFor(ids: DataFrame): DataFrame = {
    val q = quality.toSeq.toDF("doc_id", "q")
    ids.select(col("doc_id")).distinct().join(q, Seq("doc_id"))
      .select(col("doc_id"), col("q"))
  }
  private def rawTextFor(ids: DataFrame): DataFrame =
    docs.toDF("doc_id", "text").join(broadcast(ids.select(col("doc_id"))),
      Seq("doc_id"), "left_semi")

  private def mkState(tag: String): HygieneState = {
    def dir(n: String) = java.nio.file.Files
      .createTempDirectory(s"purge_${tag}_$n").toString
    val st = HygieneState(s"purgespec_$tag", dir("pairs"), dir("assign"),
      dir("surv"), dir("emit"), dir("clean"), dir("flag"))
    Dedup.writeLshIndex(docs.toDF("doc_id", "text").where(lit(false)),
      "doc_id", "text", st.lshName)
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

  private def step(st: HygieneState, b: Seq[(Long, String)], k: Long): Boolean =
    Hygiene.hygieneStep(b.toDF("doc_id", "text"), k, "doc_id", "text",
      scoresFor, "q", rawTextFor, st, bench, "query_id", "term", K,
      Floor, passageN = PassN, minJaccard = MinJac)

  private def purge(st: HygieneState, k: Long,
      hook: (String, Long) => Unit = (_, _) => ()): Boolean =
    Purge.purgeDocs(purgedIds.toDF("doc_id"), k, "doc_id", "text",
      scoresFor, "q", rawTextFor, st, bench, "query_id", "term", K,
      Floor, passageN = PassN, layerHook = hook)

  private def resolved(st: HygieneState): Map[Long, (String, Long, Long)] =
    Hygiene.resolveHygiene(spark, st, "doc_id").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap

  private def cleanTexts(st: HygieneState): Map[Long, String] =
    Hygiene.resolveClean(spark, st.cleanDir, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  /** One-shot pipeline over an arbitrary final corpus (HygieneSpec's
    * twin, parameterized so it can run over corpus-minus-purged). */
  private def oneShotOf(all: Seq[(Long, String)])
      : (Set[Long], Map[Long, (String, Long, Long)], Set[Long]) = {
    val allDf = all.toDF("doc_id", "text")
    val pairs = Dedup.lshPairs(allDf, "doc_id", "text", minJaccard = MinJac)
    val nodes = pairs.select(col("id_a").as("doc_id"))
      .union(pairs.select(col("id_b").as("doc_id"))).distinct()
    val comp = Components.connectedComponents(pairs, "id_a", "id_b",
      nodes, "doc_id")
    val surv = comp.join(scoresFor(comp), Seq("doc_id"))
      .groupBy("component")
      .agg(max_by(col("doc_id"), struct(col("q"), -col("doc_id")))
        .as("survivor_id"))
    val losers = comp.join(surv, "component")
      .where(col("doc_id") =!= col("survivor_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val kept = allDf.where(!col("doc_id").isin(losers.toSeq: _*))
    val cleaned = Decontaminate.removeRepeatedPassages(kept, "doc_id",
        "text", PassN).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val cleanedDf = cleaned.toSeq
      .map { case (id, (t, _, _)) => (id, t) }.toDF("doc_id", "text")
    val flags = Retrieval.bm25TopK(cleanedDf, "doc_id", "text", bench,
        "query_id", "term", K)
      .where(col("score") >= Floor)
      .select("doc_id").distinct().collect().map(_.getLong(0)).toSet
    (losers, cleaned, flags)
  }

  private lazy val minusPurged: (Set[Long],
      Map[Long, (String, Long, Long)], Set[Long]) =
    oneShotOf(docs.filterNot(d => purgedIds.contains(d._1)))

  test("fixture: LSH pairing and pick shape are as designed") {
    // full-corpus pairs drive the incremental run; the guards name the
    // exact edges every cascade case depends on — adjust texts/MinJac
    // if the banding changed
    val pairs = Dedup.lshPairs(docs.toDF("doc_id", "text"), "doc_id",
        "text", minJaccard = MinJac)
      .select("id_a", "id_b").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Set((2L, 4L), (2L, 10L), (4L, 10L), (6L, 8L), (6L, 9L))
    assert(pairs == want, s"LSH pairs drifted: got $pairs want $want")
    val (losers, _, flags) = minusPurged
    assert(losers == Set(10L), s"minus-purged losers: $losers")
    assert(flags == Set(3L, 5L), s"minus-purged flags: $flags")
  }

  test("mid-stream purge + erasing compaction == one-shot over " +
      "corpus-minus-purged; certificate fails before, passes after") {
    val st = mkState("e2e")
    try {
      (0 to 2).foreach(k => assert(step(st, batches(k), k.toLong)))
      // pre-purge fixture guards: 2/8/9 evicted, 3 stripped of G,
      // 5 owns T (tombstone-recreated at 2's demotion)
      val evictedPre = Components.resolveEvicted(
        TxLog.readCommitted(spark, st.emitDir), "doc_id", "batch")
        .collect().map(_.getLong(0)).toSet
      assert(evictedPre == Set(2L, 8L, 9L), s"pre-purge evicted: $evictedPre")
      val cleanPre = cleanTexts(st)
      assert(!cleanPre(3L).contains(G), s"doc3 pre: ${cleanPre(3L)}")
      assert(cleanPre(5L).contains(T), s"doc5 pre: ${cleanPre(5L)}")
      // ---- the purge --------------------------------------------------
      assert(purge(st, 3L))
      assert(!purge(st, 3L), "a marked purge batch must no-op")
      // promotions landed: 2, 8, 9 are kept again; purged docs evicted
      val evictedPost = Components.resolveEvicted(
        TxLog.readCommitted(spark, st.emitDir), "doc_id", "batch")
        .collect().map(_.getLong(0)).toSet
      assert(evictedPost == Set(1L, 4L, 6L), s"post-purge evicted: $evictedPost")
      val cleanPost = cleanTexts(st)
      assert(cleanPost(3L).contains(G),
        s"doc3 must regain G from purged owner 1: ${cleanPost(3L)}")
      assert(!cleanPost(5L).contains(T),
        s"doc5 must lose stolen T to re-promoted 2: ${cleanPost(5L)}")
      assert(cleanPost(2L).contains(T) && cleanPost(2L).contains("s1"),
        s"re-promoted doc2 must own its text again: ${cleanPost(2L)}")
      // the split: label 6 tombstoned, 8 and 9 self-survivors
      val survPost = Components.resolveSurvivors(
        TxLog.readCommitted(spark, st.survDir), "batch")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!survPost.contains(6L), s"label 6 must die: $survPost")
      assert(survPost.get(8L).contains(8L) && survPost.get(9L).contains(9L),
        s"split components must self-survive: $survPost")
      // ---- post-purge ingest: the ledger masks the stale signature ----
      assert(step(st, batches(3), 4L))
      // ---- certificate: fails pre-compaction, passes post --------------
      val pre = Purge.purgedOccurrences(spark, st,
        purgedIds.toDF("doc_id"), "doc_id").toMap
      assert(pre("clean.id") > 0L && pre("lsh_bands.id") > 0L,
        s"purged rows must still be physically present pre-fold: $pre")
      val boom = intercept[IllegalArgumentException] {
        Purge.assertPurged(spark, st, purgedIds.toDF("doc_id"), "doc_id")
      }
      assert(boom.getMessage.contains("purge certificate FAILED"))
      val preFold = resolved(st)
      Hygiene.compactHygiene(spark, st, graceMs = 0L)
      Purge.assertPurged(spark, st, purgedIds.toDF("doc_id"), "doc_id")
      assert(resolved(st) == preFold,
        "the erasing fold must not change the resolved state")
      // ---- the oracle: one-shot over corpus-minus-purged ---------------
      val (losers, cleaned, flags) = minusPurged
      val want = cleaned.view.filterKeys(id =>
        !losers.contains(id) && !flags.contains(id)).toMap
      assert(resolved(st) == want)
      // ---- ingest AFTER the erasing compaction (column-order pin):
      // the fold's erase anti-joins must keep every table's column
      // order — the step's positional insertIntos would otherwise
      // write crosswise into the folded tables.  12 near-dups 11
      // (pairs against the FOLDED index), 13 is novel.
      val extra = Seq((12L, "w1 w2 w3 w4 w5 w6 w7 w9"),
        (13L, "f1 f2 f3 f4 f5 f6 f7 f8"))
      assert(step(st, extra, 5L))
      val (l2, c2, f2) = oneShotOf(
        docs.filterNot(d => purgedIds.contains(d._1)) ++ extra)
      val want2 = c2.view.filterKeys(id =>
        !l2.contains(id) && !f2.contains(id)).toMap
      assert(resolved(st) == want2,
        "an ingest AFTER the erasing compaction must behave as if " +
          "the purged docs never existed")
      // hstats semantics: the purge batch wrote a NEGATIVE n_docs
      // delta, so the folded sum reads the LIVE ingested count (10
      // ingested − 3 purged-and-ingested + 2 post-purge), not the
      // cumulative-ever-ingested 12.  Never-ingested id 7 subtracts
      // nothing.
      val nLive = spark.table(st.hstats)
        .agg(sum(col("n_docs"))).first().getLong(0)
      assert(nLive == 9L,
        s"hstats sum(n_docs) must be the live ingested count, got $nLive")
    } finally dropState(st)
  }

  test("a mid-purge crash converges on replay; bad inputs fail loudly") {
    val stA = mkState("crashA")
    val stB = mkState("crashB")
    try {
      (0 to 2).foreach { k =>
        assert(step(stA, batches(k), k.toLong))
        assert(step(stB, batches(k), k.toLong))
      }
      // contract guards: non-contiguous batch id; ids above high-water
      val gap = intercept[IllegalArgumentException] { purge(stA, 5L) }
      assert(gap.getMessage.contains("contiguous"))
      val hw = intercept[IllegalArgumentException] {
        Purge.purgeDocs(Seq(99L).toDF("doc_id"), 3L, "doc_id", "text",
          scoresFor, "q", rawTextFor, stA, bench, "query_id", "term",
          K, Floor, passageN = PassN)
      }
      assert(hw.getMessage.contains("high-water"))
      // crash AFTER the passage layer (clean/keeper/marks landed,
      // BM25 + flags absent): the replay must finish the tail and
      // recompute the partitions to identical content
      val boom = intercept[RuntimeException] {
        purge(stA, 3L, hook = (layer, _) =>
          if (layer == "passage") throw new RuntimeException("crash"))
      }
      assert(boom.getMessage == "crash")
      assert(purge(stA, 3L), "replay must run, not no-op")
      assert(purge(stB, 3L))
      assert(step(stA, batches(3), 4L)); assert(step(stB, batches(3), 4L))
      Hygiene.compactHygiene(spark, stA, graceMs = 0L)
      assert(resolved(stA) == resolved(stB))
      Purge.assertPurged(spark, stA, purgedIds.toDF("doc_id"), "doc_id")
    } finally { dropState(stA); dropState(stB) }
  }
}
