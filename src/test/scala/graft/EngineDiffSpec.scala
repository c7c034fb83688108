package graft

import graft.core._
import graft.engine.DatasetEngine
import graft.simple.Simple
import org.scalatest.funsuite.AnyFunSuite

/** Differential tests: the Spark engine vs the local single-threaded
  * oracle from [[StepsSpec.localRun]] — the exact analog of the
  * reference's hedgehog property `direct xs === FL.fold mrF xs`
  * (`/root/reference/test/Test1.hs:54-57`), over seeded random data
  * and multiple partition counts (partitioning must not change
  * results — the distribution-safety law the reference never needed). */
class EngineDiffSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._
  private val steps = new StepsSpec

  private val rnd = new scala.util.Random(11)

  test("typed engine == local oracle (filter + sum/count/min zip), any partitioning") {
    for (n <- Seq(0, 1, 17, 1000); parts <- Seq(1, 3, 7)) {
      val xs = List.fill(n)(rnd.nextInt(10000))
      val u = Unpack.Filter[Int](_ % 2 == 0)
      val a = Assign.of[Int, Int, Int](_ % 7)(identity)
      val r = Reduce.fromFold[Int, Int, Int](Folds.sum[Int])
        .zip(Reduce.fromFold[Int, Int, Int](Folds.count[Int].map(_.toInt)))
      val expected = steps.localRun(xs, u, a, r)
      val ds = spark.createDataset(xs).repartition(parts)
      val got = DatasetEngine.run(ds, u, a, r).collect().toMap
      assert(got == expected, s"n=$n parts=$parts")
    }
  }

  test("melt engine == local oracle (Explode + mean)") {
    val xs = List.fill(500)(rnd.nextInt(1000))
    val u = Unpack.Explode[Int, Int](x => Seq(x, 2 * x))
    val a = Assign.of[Int, Boolean, Double](_ % 3 == 0)(_.toDouble)
    val r = Reduce.fromFold[Boolean, Double, Double](Folds.mean)
    val expected = steps.localRun(xs, u, a, r)
    val got = DatasetEngine.run(spark.createDataset(xs), u, a, r).collect().toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(math.abs(v - expected(k)) < 1e-9) }
  }

  test("whole-group reduce (mapGroups path) == local oracle") {
    val xs = List.fill(300)(rnd.nextInt(100))
    val u = Unpack.none[Int]
    val a = Assign.of[Int, Int, Int](_ % 5)(identity)
    val r = Simple.processAndLabel[Int, Int, Int, Int](it => it.toSeq.sorted.head)((k, m) => k * 1000 + m)
    val expected = steps.localRun(xs, u, a, r)
    val got = DatasetEngine.run(spark.createDataset(xs), u, a, r).collect().toMap
    assert(got == expected)
  }

  test("keyed fold (key-dependent) routes through mapGroups and agrees") {
    val xs = List.fill(200)(rnd.nextInt(100))
    val a = Assign.of[Int, Int, Int](_ % 4)(identity)
    val r = Reduce.KeyedFold[Int, Int, Int](k => Folds.sum[Int].map(_ * (k + 1)))
    val expected = steps.localRun(xs, Unpack.none[Int], a, r)
    val got = DatasetEngine.run(spark.createDataset(xs), Unpack.none[Int], a, r)
      .collect().toMap
    assert(got == expected)
  }

  test("ordered engine output is key-sorted (groupByOrderedKey semantics)") {
    val xs = List.fill(100)(rnd.nextInt(1000))
    val a = Assign.of[Int, Int, Int](_ % 13)(identity)
    val out = DatasetEngine.run(spark.createDataset(xs), Unpack.none[Int], a,
      Reduce.fromFold[Int, Int, Int](Folds.sum[Int]), ordered = true)
      .collect().map(_._1)
    assert(out.toList == out.toList.sorted)
  }

  test("unpackOnly == filter / flatMap directly") {
    val xs = List.fill(100)(rnd.nextInt(100))
    val f = DatasetEngine.unpackOnly(spark.createDataset(xs),
      Unpack.Filter[Int](_ > 50)).collect().sorted
    assert(f.toList == xs.filter(_ > 50).sorted)
    val m = DatasetEngine.unpackOnly(spark.createDataset(xs),
      Unpack.Explode[Int, Int](x => Seq(x, -x))).collect().sorted
    assert(m.toList == xs.flatMap(x => Seq(x, -x)).sorted)
  }

  test("effectful engine (runM) matches pure twin; effects observed") {
    val xs = List.fill(400)(rnd.nextInt(100))
    val acc = spark.sparkContext.longAccumulator("seen")
    val got = DatasetEngine.runM(spark.createDataset(xs),
      UnpackM.FilterM[Int] { x => acc.add(1); x % 2 == 0 },
      AssignM[Int, Int, Long](x => (x % 7, 1L)),
      ReduceM.fromFold[Int, Long, Long](Folds.count[Long]))
      .collect().toMap
    val expected = xs.filter(_ % 2 == 0).groupBy(_ % 7)
      .map { case (k, g) => k -> g.length.toLong }
    assert(got == expected)
    assert(acc.value == xs.length.toLong)
  }

  test("concatFold merges per-key results (monoid concat, Simple.hs:156-162)") {
    val xs = List.fill(100)(rnd.nextInt(100))
    val perKey = DatasetEngine.run(spark.createDataset(xs), Unpack.none[Int],
      Assign.of[Int, Int, Int](_ % 3)(identity),
      Reduce.fromFold[Int, Int, Int](Folds.sum[Int]))
    val total = Simple.concatFold(perKey.map(_._2))(_ + _)
    assert(total == xs.sum)
  }
}
