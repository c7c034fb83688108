package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("shuffleShard: dense 1..n positions per shard, exact row permutation") {
    val ids = (0L until 500L)
    val out = Sampling.shuffleShard(ids.toDF("id"), "id", 7).collect()
    assert(out.length == 500)
    // every input id appears exactly once (permutation, nothing dropped/duped)
    assert(out.map(_.getLong(0)).sorted.toSeq == ids)
    // positions are dense 1..shardSize within each shard
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val pos = rows.map(_.getInt(2)).sorted
      assert(pos.toSeq == (1 to rows.length))
    }
  }

  test("shuffleShard: assignment is independent of input partitioning") {
    val df1 = (0L until 300L).toDF("id").repartition(1)
    val df17 = (0L until 300L).toDF("id").repartition(17)
    val a = Sampling.shuffleShard(df1, "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val b = Sampling.shuffleShard(df17, "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("shuffleShard: in-shard order follows ascending id hash") {
    import graft.functions.ColFns
    val out = Sampling.shuffleShard((0L until 200L).toDF("id"), "id", 3)
      .withColumn("hv", ColFns.h60(col("id").cast("string")))
      .collect()
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(byPos.toSeq == byPos.sorted.toSeq)
    }
  }

  test("shuffleShard rejects nShards <= 0") {
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(Seq(1L).toDF("id"), "id", 0)
    }
  }

  test("shuffleShard refuses to overwrite an existing output column") {
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(Seq((1L, 9L)).toDF("id", "shard"), "id", 4)
    }
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(Seq((1L, 9)).toDF("id", "pos"), "id", 4)
    }
  }

  // ---- prioritySample ----------------------------------------------------

  /** Reference priorities computed the same way the operator does. */
  private def refPriorities(rows: Seq[(Long, Long)]): Seq[(Long, Long, Double)] = {
    import graft.functions.ColFns
    val hv = rows.map(_._1).toDF("id")
      .select(col("id"), ColFns.h60(col("id").cast("string")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.map { case (id, w) =>
      (id, w, w.toDouble * 1.152921504606846976e18 / (hv(id) + 1L).toDouble)
    }
  }

  test("prioritySample: selects the k highest priorities, tau = (k+1)-th") {
    val rows = (0L until 100L).map(i => (i, 10L + i % 37))
    val k = 10
    val ref = refPriorities(rows).sortBy { case (id, _, p) => (-p, id) }
    val expected = ref.take(k)
    val tau = ref(k)._3
    val got = Sampling.prioritySample(rows.toDF("id", "w"), "id", "w", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._3).reverse
    assert(got.map(_._1).toSeq == expected.map(_._1))
    assert(got.map(_._3).toSeq == expected.map(_._3)) // bit-identical pri
    got.foreach { case (_, w, _, wHat) =>
      assert(wHat == math.max(w.toDouble, tau))
    }
    // DLT estimator: sum(w_hat) over the sample is within a factor of
    // the true total (a loose sanity band; unbiasedness is the theorem)
    val total = rows.map(_._2).sum.toDouble
    val est = got.map(_._4).sum
    assert(est > total * 0.3 && est < total * 3.0, s"est=$est total=$total")
  }

  test("prioritySample: input smaller than k returns everything, tau = 0") {
    val rows = Seq((1L, 5L), (2L, 7L), (3L, 11L))
    val got = Sampling.prioritySample(rows.toDF("id", "w"), "id", "w", 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
      .sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // tau = 0 → w_hat = w exactly
    got.foreach { case (_, w, wHat) => assert(wHat == w.toDouble) }
  }

  test("prioritySample: selection independent of input partitioning") {
    val rows = (0L until 200L).map(i => (i, 1L + i % 13))
    val a = Sampling.prioritySample(
      rows.toDF("id", "w").repartition(1), "id", "w", 25)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    val b = Sampling.prioritySample(
      rows.toDF("id", "w").repartition(23), "id", "w", 25)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sorted.toSeq
    assert(a == b)
  }

  test("prioritySamplePerGroup: each stratum equals the global sample of that stratum") {
    // independence across strata is the definition: group g's draw
    // (rows, pri, tau, w_hat) must equal prioritySample run on g alone
    val rows = (0L until 300L).map(i => (i, s"s${i % 5}", 1L + i % 29))
    val df = rows.toDF("id", "src", "w")
    val k = 12
    val grouped = Sampling.prioritySamplePerGroup(df, Seq("src"), "id", "w", k)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    for (g <- rows.map(_._2).distinct) {
      val solo = Sampling.prioritySample(
        df.where(col("src") === g), "id", "w", k)
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getDouble(3))).toSet
      assert(grouped(g) == solo, s"stratum $g diverged from its solo sample")
    }
  }

  // ---- capPerGroup -------------------------------------------------------

  test("capPerGroup: keeps the k best per group, ties to the smaller id") {
    val rows = (0L until 120L).map(i =>
      (i, s"g${i % 4}", (i % 6).toDouble)) // many rank ties per group
    val df = rows.toDF("id", "g", "r")
    val got = Sampling.capPerGroup(df, Seq("g"), "id", col("r"), 5)
      .select("g", "id") // the using-join reorders columns: keys first
      .collect().map(r => (r.getString(0), r.getLong(1))).sorted.toSeq
    // oracle: per group, sort by (rank desc, id asc), take 5
    val want = rows.groupBy(_._2).toSeq.flatMap { case (g, rs) =>
      rs.sortBy { case (id, _, r) => (-r, id) }.take(5).map(t => (g, t._1))
    }.sorted
    assert(got == want)
  }

  test("capPerGroup: group smaller than k keeps every row") {
    val df = Seq((1L, "a", 0.5), (2L, "a", 0.4), (3L, "b", 0.9))
      .toDF("id", "g", "r")
    val got = Sampling.capPerGroup(df, Seq("g"), "id", col("r"), 10)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(1L, 2L, 3L))
  }

  // ---- takeByBudget ------------------------------------------------------

  /** Greedy PREFIX oracle: (score desc, id asc) order, keep the
    * longest prefix whose running total stays ≤ budget — the scan
    * STOPS at the first row that no longer fits (no first-fit
    * backfilling from lower-score rows). */
  private def greedyTake(rows: Seq[(Long, Long, Double)],
      budget: Long): Seq[Long] = {
    val sorted = rows.sortBy { case (id, _, q) => (-q, id) }
    val cums = sorted.scanLeft(0L) { case (c, (_, w, _)) => c + w }.tail
    sorted.zip(cums).takeWhile(_._2 <= budget).map(_._1._1)
  }

  test("takeByBudget matches the full greedy scan at several budgets") {
    val rows = (0L until 300L).map(i =>
      (i, 5L + i % 40, ((i * 7) % 100).toDouble / 100.0))
    val df = rows.toDF("id", "w", "q")
    val total = rows.map(_._2).sum
    for (budget <- Seq(0L, total / 10, total / 3, total - 1, total, total + 50)) {
      val got = Sampling.takeByBudget(df, "id", "w", col("q"), budget)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got == greedyTake(rows, budget).sorted,
        s"budget=$budget")
    }
  }

  test("takeByBudget: recursive refinement matches greedy and bounds the sorted residual") {
    // scores distinct (i/512 is dyadic-exact); buckets=4 so level 1's
    // boundary holds ~n/4 rows ≫ maxSortRows=8 — refinement must
    // recurse (scale 4 → 16 → 64 …) until the residual fits, and the
    // result must still equal the full greedy prefix
    val rows = (0L until 512L).map(i => (i, 3L + i % 11, i.toDouble / 512.0))
    val df = rows.toDF("id", "w", "q")
    val total = rows.map(_._2).sum
    for (budget <- Seq(total / 7, total / 3, total / 2)) {
      val (res, residualRows, finestScale) = Sampling.takeByBudgetStats(
        df, "id", "w", col("q"), budget, buckets = 4, maxSortRows = 8L)
      val got = res.collect().map(_.getLong(0)).sorted.toSeq
      assert(got == greedyTake(rows, budget).sorted, s"budget=$budget")
      assert(residualRows <= 8L,
        s"budget=$budget: final window sorts $residualRows rows — the " +
          "refinement must bound the single-task sort, not the knob")
      assert(finestScale > 4L,
        s"budget=$budget: refinement never recursed (scale $finestScale)")
    }
  }

  test("takeByBudget: tie-saturated scores stop refinement honestly, stay exact") {
    // every row shares one score: no histogram resolution can split
    // the bucket, so refinement must detect no-progress after one
    // extra level and fall back to the id-tie-break window over the
    // WHOLE bucket — exactness over a vacuous residual bound
    val rows = (0L until 60L).map(i => (i, 10L, 0.5))
    val (res, residualRows, finestScale) = Sampling.takeByBudgetStats(
      rows.toDF("id", "w", "q"), "id", "w", col("q"), budget = 155L,
      buckets = 4, maxSortRows = 8L)
    val got = res.collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 15L)) // 15 × 10 = 150 ≤ 155 < 160
    assert(residualRows == 60L, "ties: the whole bucket is the residual")
    assert(finestScale == 16L, "exactly one wasted refinement level detects ties")
  }

  test("takeByBudget: bucket-boundary ties break by id inside the sorted bucket") {
    // every row has the SAME score → one bucket, pure id-ordered greedy
    val rows = (0L until 50L).map(i => (i, 10L, 0.5))
    val got = Sampling.takeByBudget(rows.toDF("id", "w", "q"), "id", "w",
      col("q"), budget = 95).collect().map(_.getLong(0)).sorted.toSeq
    assert(got == (0L until 9L)) // 9 rows × 10 = 90 ≤ 95 < 100
  }

  // ---- calibrateMixture --------------------------------------------------

  test("calibrateMixture applies min(1, target·budget/mass) per group") {
    import graft.functions.ColFns
    val rows = (0L until 400L).map(i => (i, s"g${i % 4}", 10L))
    val df = rows.toDF("id", "g", "w")
    // each group mass = 1000; budget 2000; targets: g0 50% → rate 1
    // (capped), g1 25% → rate 0.5, g2 5% → rate 0.1, g3 absent → 0
    val got = Sampling.calibrateMixture(df, "g", "id", "w",
        Map("g0" -> 0.5, "g1" -> 0.25, "g2" -> 0.05, "gX" -> 0.9),
        budget = 2000L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got.count(_._2 == "g0") == 100) // rate 1: everything kept
    assert(!got.exists(_._2 == "g3")) // not targeted → dropped
    // g1/g2 match the hash-threshold rule exactly
    val hv = rows.map(_._1).toDF("id")
      .select(col("id"), ColFns.h60(col("id").cast("string")) % 10000)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def expectKept(g: String, rate: Double) = rows
      .filter(t => t._2 == g && hv(t._1) < math.round(rate * 10000))
      .map(_._1).toSet
    assert(got.filter(_._2 == "g1").map(_._1).toSet ==
      expectKept("g1", 0.25 * 2000 / 1000))
    assert(got.filter(_._2 == "g2").map(_._1).toSet ==
      expectKept("g2", 0.05 * 2000 / 1000))
  }

  test("takeByBudget preserves the input schema") {
    val df = Seq((1L, 2L, 0.3, "x")).toDF("id", "w", "q", "payload")
    val out = Sampling.takeByBudget(df, "id", "w", col("q"), 100L)
    assert(out.columns.toSeq == df.columns.toSeq)
  }
}
