package graft

import graft.ext.{Bloom, Components}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ComponentsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  /** Local union-find oracle. */
  private def ufComponents(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // root = min of component because unions always point larger→smaller
    (0 until n).map(i => (i.toLong, find(i).toLong)).toMap
  }

  test("random graphs match a union-find oracle (incl. singletons)") {
    val rnd = new scala.util.Random(29)
    for (trial <- 1 to 3) {
      val n = 60 + trial * 40
      val edges = Seq.fill(n / 2)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val got = Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b",
        (0 until n).map(_.toLong).toDF("id"), "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(got == ufComponents(n, edges), s"trial $trial")
    }
  }

  test("bounded driver path labels identically to the distributed loop") {
    // the r18 optimization: edge sets under maxDriverCloseEdges close
    // on the driver — both paths must emit bit-identical assignments
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val n = 50 + trial * 50
      val edges = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val nodesDf = (0 until n).map(_.toLong).toDF("id")
      def run(ceiling: Int) = Components.connectedComponents(
        edges.toDF("a", "b"), "a", "b", nodesDf, "id",
        maxDriverCloseEdges = ceiling)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(run(1000000) == run(0), s"trial $trial")
    }
  }

  test("long chain converges in O(log n) rounds, not O(diameter)") {
    // a 200-node path — label propagation would need 200 rounds;
    // large-star/small-star must finish well inside maxIter=15
    val edges = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val nodes = (0L until 200L).toDF("id")
    // maxDriverCloseEdges = 0: this test pins the DISTRIBUTED loop's
    // round count — the bounded driver path would skip it entirely
    val got = Components.connectedComponents(edges, "a", "b", nodes, "id",
      maxIter = 15, maxDriverCloseEdges = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 200 && got.forall(_._2 == 0L))
  }

  test("incrementalComponents over edge batches matches one-shot closure") {
    val rnd = new scala.util.Random(31)
    for (trial <- 1 to 3) {
      val n = 80 + trial * 40
      val edges = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      // three arbitrary batches; nodes enter as their batch arrives
      val batches = edges.grouped(math.max(1, edges.size / 3)).toSeq
      def nodesOf(es: Seq[(Long, Long)]) =
        es.flatMap(e => Seq(e._1, e._2)).distinct
      var assign = Components.connectedComponents(
        batches.head.toDF("a", "b"), "a", "b",
        nodesOf(batches.head).toDF("id"), "id")
      for (b <- batches.tail)
        assign = Components.incrementalComponents(
          assign, b.toDF("a", "b"), "a", "b", "id")
      val got = assign.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val oracle = ufComponents(n, edges)
      // incremental covers exactly the nodes that appeared in some batch
      val appeared = nodesOf(edges).toSet
      assert(got.keySet == appeared, s"trial $trial node universe")
      assert(got == oracle.filter(kv => appeared.contains(kv._1)),
        s"trial $trial labels")
    }
  }

  test("incrementalComponents bootstraps from an empty prior and no-ops on an empty batch") {
    val empty = Seq.empty[(Long, Long)].toDF("id", "component")
    val batch = Seq((5L, 3L), (3L, 9L)).toDF("a", "b")
    // empty prior: every endpoint enters as its own root — the first
    // batch IS a one-shot closure over itself
    val boot = Components.incrementalComponents(empty, batch, "a", "b", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(boot == Map(3L -> 3L, 5L -> 3L, 9L -> 3L))
    // empty batch: assignment passes through untouched
    val none = Seq.empty[(Long, Long)].toDF("a", "b")
    val same = Components.incrementalComponents(
      boot.toSeq.toDF("id", "component"), none, "a", "b", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(same == boot)
  }

  test("incrementalComponents: merging two prior clusters relabels to the min") {
    // prior: {0,1,2} labeled 0 and {10,11} labeled 10; the batch edge
    // (2, 11) merges them; a brand-new node 20 arrives isolated via
    // edge (20, 21)
    val prior = Seq((0L, 0L), (1L, 0L), (2L, 0L), (10L, 10L), (11L, 10L))
      .toDF("id", "component")
    val batch = Seq((2L, 11L), (20L, 21L)).toDF("a", "b")
    val got = Components.incrementalComponents(prior, batch, "a", "b", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 10L -> 0L, 11L -> 0L,
      20L -> 20L, 21L -> 20L))
  }

  test("delta form: prior ⊕ delta == full incremental update, delta minimal") {
    val rnd = new scala.util.Random(37)
    for (trial <- 1 to 3) {
      val n = 100 + trial * 30
      val all = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val (histE, batchE) = all.splitAt(all.size * 2 / 3)
      val histNodes = histE.flatMap(e => Seq(e._1, e._2)).distinct
      val prior = Components.connectedComponents(
        histE.toDF("a", "b"), "a", "b", histNodes.toDF("id"), "id")
      val full = Components.incrementalComponents(
        prior, batchE.toDF("a", "b"), "a", "b", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val delta = Components.incrementalComponentsDelta(
        prior, batchE.toDF("a", "b"), "a", "b", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val priorMap = prior.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(priorMap ++ delta == full, s"trial $trial: prior ⊕ delta must equal full")
      // minimality: every delta row differs from prior (or is new)
      delta.foreach { case (k, v) =>
        assert(priorMap.get(k) != Some(v), s"trial $trial: redundant delta row $k -> $v")
      }
    }
  }

  test("bounded driver closure == distributed closure on the root graph") {
    // the driver union-find shortcut (root graph ≤ maxDriverCloseEdges)
    // and the large-star/small-star path must emit IDENTICAL deltas —
    // same components, same min labels — on the same batches.
    // maxDriverCloseEdges = 0 forces the distributed path; the
    // default takes the driver path at this size.
    val rnd = new scala.util.Random(53)
    for (trial <- 1 to 3) {
      val n = 100 + trial * 50
      val all = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val Seq(seed, batch) = all.grouped((all.size + 1) / 2).toSeq
      val prior = Components.connectedComponents(
        seed.toDF("a", "b"), "a", "b",
        seed.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id"), "id")
      val viaDriver = Components.incrementalComponentsDelta(
        prior, batch.toDF("a", "b"), "a", "b", "id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaCluster = Components.incrementalComponentsDelta(
        prior, batch.toDF("a", "b"), "a", "b", "id",
        maxDriverCloseEdges = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDriver == viaCluster,
        s"trial $trial: the two closure paths diverged")
    }
  }

  test("incrementalSurvivors == one-shot pick after every batch") {
    val rnd = new scala.util.Random(41)
    // deterministic "quality": collides across nodes so ties exercise
    // the -id tie-break
    def score(id: Long): Double = ((id * 13) % 7).toDouble
    def oneShotPick(assign: Map[Long, Long]): Map[Long, (Long, Long)] =
      assign.groupBy(_._2).map { case (c, members) =>
        val ids = members.keys.toSeq
        val best = ids.maxBy(id => (score(id), -id))
        c -> (best, ids.size.toLong)
      }
    for (trial <- 1 to 3) {
      val n = 90 + trial * 30
      val all = Seq.fill(n)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
      val batches = all.grouped(math.max(1, all.size / 3)).toSeq
      var assign = Components.connectedComponents(
        batches.head.toDF("a", "b"), "a", "b",
        batches.head.flatMap(e => Seq(e._1, e._2)).distinct.toDF("id"), "id")
      val scores = (0L until n.toLong).map(i => (i, score(i))).toDF("id", "q")
      var surv = assign.join(scores, "id")
        .groupBy("component")
        .agg(count(lit(1)).as("n_members"),
          max_by(col("id"), struct(col("q"), -col("id"))).as("survivor_id"))
        .select(col("component"), col("survivor_id"), col("n_members"))
      for (b <- batches.tail) {
        val delta = Components.incrementalComponentsDelta(
          assign, b.toDF("a", "b"), "a", "b", "id")
        assign = Components.incrementalComponents(
          assign, b.toDF("a", "b"), "a", "b", "id")
        surv = Components.incrementalSurvivors(surv, assign, delta,
          scores, "id", "q")
        val got = surv.collect()
          .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
        val assignMap = assign.collect()
          .map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(got == oneShotPick(assignMap),
          s"trial $trial: maintained survivors diverged from one-shot pick")
      }
    }
  }

  test("survivorDelta tombstones only labels the log holds — no junk rows on a merge") {
    // prior state: component 0 = {0,1,2}, component 5 = {5,6}; the
    // survivor log has picked labels {0, 5}.  A batch edge (2,5)
    // merges 5's cluster into 0: the delta remaps BOTH members 5 and
    // 6, but only 5 ever labeled a component — an ungated delta would
    // also tombstone the never-existed component 6 (O(|members|) junk
    // per merge instead of the documented O(touched) append).
    val assignAfter = Seq((0L, 0L), (1L, 0L), (2L, 0L), (5L, 0L), (6L, 0L))
      .toDF("id", "component")
    val delta = Seq((5L, 0L), (6L, 0L)).toDF("id", "component")
    val scores = Seq(0L, 1L, 2L, 5L, 6L).map(i => (i, (i % 3).toDouble))
      .toDF("id", "q")
    val logComponents = Seq(0L, 5L).toDF("component")
    val rows = Components.survivorDelta(assignAfter, delta, scores, "id", "q",
        logComponents)
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)), r.getLong(2)))
    val (tombs, picks) = rows.partition(_._2.isEmpty)
    assert(picks.toSeq == Seq((0L, Some(2L), 5L)),
      s"re-pick: max q=2.0 is ids {2,5} → min id 2 wins; got ${picks.toSeq}")
    assert(tombs.toSeq == Seq((5L, None, 0L)),
      s"exactly one tombstone, for label 5 only; got ${tombs.toSeq}")
  }

  test("emissionDelta + resolveEvicted: admits, evictions, and merges compose") {
    // batch 1: docs {1,2} pair (root 1, survivor 2 by score), doc 3
    // arrives unpaired → emission admits 2 and 3, evicts 1
    val e1 = Components.emissionDelta(
      assignments = Seq((1L, 1L), (2L, 1L)).toDF("id", "component"),
      delta = Seq((1L, 1L), (2L, 1L)).toDF("id", "component"),
      survivorBatch = Seq((1L, 2L, 2L)).toDF("component", "survivor_id", "n_members"),
      batchIds = Seq(1L, 2L, 3L).toDF("id"), "id")
    assert(e1.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      == Map(1L -> false, 2L -> true, 3L -> true))
    // batch 2: doc 4 joins the cluster and wins the pick → the whole
    // cluster re-emits; 2 (the prior survivor) is EVICTED now
    val e2 = Components.emissionDelta(
      assignments = Seq((1L, 1L), (2L, 1L), (4L, 1L)).toDF("id", "component"),
      delta = Seq((4L, 1L)).toDF("id", "component"),
      survivorBatch = Seq((1L, 4L, 3L)).toDF("component", "survivor_id", "n_members"),
      batchIds = Seq(4L).toDF("id"), "id")
    assert(e2.collect().map(r => (r.getLong(0), r.getBoolean(1))).toMap
      == Map(1L -> false, 2L -> false, 4L -> true))
    // the resolved log: latest row per doc decides; only evictions
    // surface (the read side is the anti-join's broadcast build)
    val log = e1.withColumn("batch", lit(1L))
      .unionByName(e2.withColumn("batch", lit(2L)))
    val evicted = Components.resolveEvicted(log, "id", "batch")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(evicted == Seq(1L, 2L),
      "docs whose LATEST emission is kept=false, and only those")
  }

  test("incrementalSurvivors fails loudly on a missing touched-member score") {
    val prior = Seq((0L, 0L, 2L)).toDF("component", "survivor_id", "n_members")
    val assign = Seq((0L, 0L), (1L, 0L), (5L, 0L)).toDF("id", "component")
    val delta = Seq((5L, 0L)).toDF("id", "component")
    val scores = Seq((0L, 1.0), (5L, 2.0)).toDF("id", "q") // node 1 missing
    val ex = intercept[Exception] {
      Components.incrementalSurvivors(prior, assign, delta, scores, "id", "q")
        .collect()
    }
    assert(ex.getMessage.contains("no score for touched member"))
  }

  test("resolveAssignments keeps the latest batch's row per node") {
    val history = Seq(
      (1L, 1L, 0L), (2L, 2L, 0L), (3L, 3L, 0L), // base
      (2L, 1L, 1L),                             // batch 1 remap
      (2L, 0L, 2L), (4L, 0L, 2L)                // batch 2 remap + new node
    ).toDF("id", "component", "batch")
    val got = Components.resolveAssignments(history, "id", "batch")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 1L, 2L -> 0L, 3L -> 3L, 4L -> 0L))
  }

  test("delta log over TxLog: exactly-once committed deltas resolve to the closure") {
    // the composed continuous-clustering story: per pair batch,
    // resolve the committed log → compute the delta → commit it
    // through TxLog (atomic marker publish).  A crash-replay of an
    // already-committed batch must no-op (exactly-once), and the
    // resolved log must equal the one-shot closure over all pairs.
    import graft.sources.TxLog
    val dir = java.nio.file.Files.createTempDirectory("assign_log").toString
    val rnd = new scala.util.Random(41)
    val n = 120
    val all = Seq.fill(n)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    val batches = all.grouped(math.max(1, all.size / 3)).toSeq
    batches.zipWithIndex.foreach { case (b, i) =>
      val assign =
        if (i == 0) Seq.empty[(Long, Long)].toDF("id", "component")
        else Components.resolveAssignments(
          TxLog.readCommitted(spark, dir), "id", "batch")
      val delta = Components.incrementalComponentsDelta(
        assign, b.toDF("a", "b"), "a", "b", "id")
        .withColumn("batch", lit(i.toLong))
      assert(TxLog.commitBatch(delta, dir, i.toLong), s"batch $i must land")
      assert(!TxLog.commitBatch(delta, dir, i.toLong),
        s"replaying committed batch $i must no-op")
    }
    val got = Components.resolveAssignments(
      TxLog.readCommitted(spark, dir), "id", "batch")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val appeared = all.flatMap(e => Seq(e._1, e._2)).distinct.toSet
    val oracle = ufComponents(n, all).filter(kv => appeared.contains(kv._1))
    assert(got == oracle)
  }

  test("bloom prune rejects mismatched key types loudly") {
    // an INT-vs-BIGINT mismatch would hash apart in the bloom while
    // the exact join casts-and-matches — silent false negatives;
    // the operator must throw instead
    val big = Seq((1, "x")).toDF("k", "v") // k: int
    val small = Seq(1L).toDF("sk")         // sk: bigint
    val e = intercept[IllegalArgumentException] {
      Bloom.semiJoinPrune(big, "k", small, "sk")
    }
    assert(e.getMessage.contains("identical types"))
  }

  test("salted join spreads a hot key even when payloads are identical") {
    // every hot-key row carries the same payload — a content-derived
    // salt would collapse to one bucket; the positional salt must not
    val big = (1 to 400).map(_ => (7L, "same")).toDF("k", "v")
    val small = Seq((7L, "dim7"), (8L, "dim8")).toDF("k", "label")
    val joined = graft.ext.SkewJoin.saltedJoin(big, small, "k", 8)
    assert(joined.count() == 400L)
    val salts = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8L)))
      .select("__salt").distinct().count()
    assert(salts > 1L, "positional salt must fan a hot key across buckets")
  }

  test("bloom semi-join prune == exact semi join (random keys)") {
    val rnd = new scala.util.Random(31)
    val big = Seq.fill(2000)((rnd.nextInt(500).toLong, rnd.nextInt()))
      .toDF("k", "v")
    val small = Seq.fill(40)(rnd.nextInt(500).toLong).toDF("sk")
    val expected = big.join(small.distinct(), big("k") === small("sk"),
      "left_semi").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val got = Bloom.semiJoinPrune(big, "k", small, "sk",
      numBits = 4096, numHashes = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == expected)
  }

  test("reliable-checkpoint path labels identically to localCheckpoint") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 20L))
      .toDF("a", "b")
    val nodes = (1L to 3L) ++ Seq(10L, 11L, 20L, 30L)
    val nodesDf = nodes.toDF("id")
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt").toString
    // maxDriverCloseEdges = 0: this test pins the reliable-checkpoint
    // machinery of the distributed loop, which the bounded driver
    // path (correctly) never touches
    def run(ckpt: Option[String]) =
      Components.connectedComponents(edges, "a", "b", nodesDf, "id",
        checkpointDir = ckpt, maxDriverCloseEdges = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(run(Some(dir)) == run(None))
    // the durable path must actually have written checkpoint data,
    // and superseded rounds must have been deleted: at most the final
    // round's rdd dir survives per run (this graph takes 3+ rounds)
    val rddDirs = scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
      _.filter(p => p.getFileName.toString.startsWith("rdd-")).count())
    assert(rddDirs >= 1, "reliable checkpoint wrote nothing")
    assert(rddDirs <= 1, s"superseded round checkpoints leaked ($rddDirs rdd dirs)")
  }

  test("bloom prune is self-join safe (big and small the same frame)") {
    // big(bigKey) === small(smallKey) resolves BOTH sides to one
    // attribute when the frames are identical — the renamed right-side
    // key keeps the condition unambiguous
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val got = Bloom.semiJoinPrune(df, "k", df, "k", numBits = 1024,
      numHashes = 3).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }
}
