package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Pure step-algebra semantics, run through [[Reduce.run]] and a
  * local engine (no Spark): pins the reference's golden examples so
  * melt + applicative composition semantics can't drift.
  * References: `/root/reference/examples/readmeExample.hs:26-28`,
  * `/root/reference/examples/ListStats.hs:72-81`. */
class StepsSpec extends AnyFunSuite {

  /** Local single-threaded engine — the analog of the reference's
    * listEngine (`Engines/List.hs:82-89`), used as differential
    * oracle for the Spark engine. */
  def localRun[X, Y, K, C, D](xs: Seq[X], u: Unpack[X, Y],
      a: Assign[Y, K, C], r: Reduce[K, C, D]): Map[K, D] = {
    val ys: Seq[Y] = u match {
      case f: Unpack.Filter[X @unchecked] => xs.filter(f.p).asInstanceOf[Seq[Y]]
      case e: Unpack.Explode[X, Y @unchecked] => xs.flatMap(x => e.f(x).iterator)
    }
    ys.groupBy(a.key).map { case (k, g) =>
      k -> Reduce.run(r)(k, g.iterator.map(a.value))
    }
  }

  test("readmeExample golden: evens of 1..10 grouped by mult-of-3, summed") {
    // reference readmeExample.hs: fromList [(False,24),(True,6)]
    val out = localRun[Int, Int, Boolean, Int, Int](
      1 to 10,
      Unpack.Filter[Int](_ % 2 == 0),
      Assign.of[Int, Boolean, Int](_ % 3 == 0)(identity),
      Reduce.fromFold(Folds.sum[Int]))
    assert(out == Map(false -> 24, true -> 6))
  }

  test("ListStats golden: sums, means, melt, applicative product on 1..100") {
    val evens = Unpack.Filter[Int](_ % 2 == 0)
    val withTwice = Unpack.Explode[Int, Int](x => Seq(x, 2 * x))
    val byMult3 = Assign.of[Int, Boolean, Double](_ % 3 == 0)(_.toDouble)
    val sums = localRun(1 to 100, evens, byMult3,
      Reduce.fromFold[Boolean, Double, Double](Folds.sum[Double]))
    assert(sums == Map(false -> 1734.0, true -> 816.0))
    val means = localRun(1 to 100, evens, byMult3,
      Reduce.fromFold[Boolean, Double, Double](Folds.mean))
    assert(means == Map(false -> 51.0, true -> 51.0))
    // one grouping, two reductions (Applicative product, Core.hs:211-218)
    val both = localRun(1 to 100, evens, byMult3,
      Reduce.fromFold[Boolean, Double, Double](Folds.sum[Double])
        .zip(Reduce.fromFold[Boolean, Double, Double](Folds.mean)))
    assert(both == Map(false -> ((1734.0, 51.0)), true -> ((816.0, 51.0))))
    // melt: each int and its double, all ints (no filter)
    val smd = localRun(1 to 100, withTwice, byMult3,
      Reduce.fromFold[Boolean, Double, Double](Folds.sum[Double])
        .zip(Reduce.fromFold[Boolean, Double, Double](Folds.mean)))
    assert(smd(true)._1 == 5049.0 && smd(false)._1 == 10101.0)
    assert(smd(true)._2 == 76.5)
    assert(math.abs(smd(false)._2 - 75.38059701492539) < 1e-12)
  }

  test("Unpack.map rewrites Filter to melt (Core.hs:108 semantics)") {
    val u = Unpack.Filter[Int](_ % 2 == 0).map(_ * 10)
    u match {
      case Unpack.Explode(f) =>
        assert(f(4).iterator.toList == List(40) && f(3).iterator.toList == Nil)
      case _ => fail("Filter.map must become Explode")
    }
  }

  test("mixed fold/whole-group zip buffers once and agrees (Core.hs:216-217)") {
    val fold = Reduce.fromFold[String, Int, Int](Folds.sum[Int])
    val whole = graft.simple.Simple.processAndLabel[String, Int, Int, Int](
      it => it.max)((_, m) => m)
    val zipped = fold.zip(whole)
    val d = Reduce.run(zipped)("k", Iterator(3, 1, 4, 1, 5))
    assert(d == ((14, 5)))
  }

  test("Reduce premap/mapWithKey (Profunctor + key-relabel)") {
    val r = Reduce.fromFold[String, Int, Int](Folds.sum[Int])
      .premap[String](_.length)
      .mapWithKey((k, s) => s"$k=$s")
    assert(Reduce.run(r)("g", Iterator("ab", "cde")) == "g=5")
  }

  test("Unpack.premap and Assign.mapValue compose (Profunctor surface)") {
    val u = Unpack.Filter[Int](_ % 2 == 0).premap[String](_.length)
    u match {
      case Unpack.Explode(f) =>
        assert(f("abcd").iterator.toList == List(4))
        assert(f("abc").iterator.toList == Nil)
      case _ => fail("premapped Filter must become Explode")
    }
    val a = Assign.of[Int, Int, Int](_ % 2)(identity).mapValue(_ * 10)
    assert(a.key(7) == 1 && a.value(7) == 70)
  }

  test("ReduceM algebra: map/premap/zip (Applicative ReduceM, Core.hs:220-227)") {
    val count = ReduceM.fromFold[String, Int, Long](Folds.count[Int])
    val sum = ReduceM.fromFold[String, Int, Int](Folds.sum[Int])
    val both = count.zip(sum).map { case (n, s) => s.toDouble / n }
      .premap[String](_.length)
    assert(both.f("k", Iterator("a", "bb", "ccc")) == 2.0)
  }

  test("effectful Simple aliases agree with their pure twins (Simple.hs:112-153)") {
    import graft.simple.Simple
    val xs = (1 to 50).map(i => (i % 4, i.toDouble))
    def runM[D](r: ReduceM[Int, Double, D]): Map[Int, D] =
      xs.groupBy(_._1).map { case (k, g) => k -> r.f(k, g.iterator.map(_._2)) }
    // foldAndLabelM == foldAndLabel
    val pureFL = localRun(xs, Unpack.none[(Int, Double)],
      Assign.of[(Int, Double), Int, Double](_._1)(_._2),
      Simple.foldAndLabel[Int, Double, Double, String](Folds.sumD)((k, s) => s"$k:$s"))
    assert(runM(Simple.foldAndLabelM[Int, Double, Double, String](
      Folds.sumD)((k, s) => s"$k:$s")) == pureFL)
    // processAndLabelM == processAndLabel
    val purePL = localRun(xs, Unpack.none[(Int, Double)],
      Assign.of[(Int, Double), Int, Double](_._1)(_._2),
      Simple.processAndLabel[Int, Double, Double, Double](_.max)((k, m) => m + k))
    assert(runM(Simple.processAndLabelM[Int, Double, Double, Double](_.max)(
      (k, m) => m + k)) == purePL)
    // reduceMMapWithKey == reduceMapWithKey over generalized reduce
    val base = Reduce.fromFold[Int, Double, Double](Folds.sumD)
    val pureMW = localRun(xs, Unpack.none[(Int, Double)],
      Assign.of[(Int, Double), Int, Double](_._1)(_._2),
      Simple.reduceMapWithKey[Int, Double, Double, (Int, Double)]((k, d) => (k, d))(base))
    assert(runM(Simple.reduceMMapWithKey[Int, Double, Double, (Int, Double)](
      (k, d) => (k, d))(ReduceM.generalize(base))) == pureMW)
    // effects fire once per group on the M path
    var calls = 0
    val eff = Simple.foldAndLabelM[Int, Double, Long, Long](
      Folds.count[Double])((k, n) => { calls += 1; n })
    runM(eff)
    assert(calls == 4)
  }

  test("generalize round-trips pure steps into effectful ones") {
    val uM = UnpackM.generalize(Unpack.Filter[Int](_ > 0))
    uM match {
      case UnpackM.FilterM(p) => assert(p(1) && !p(-1))
      case _ => fail("expected FilterM")
    }
    val rM = ReduceM.generalize(Reduce.fromFold[String, Int, Int](Folds.sum[Int]))
    assert(rM.f("k", Iterator(1, 2, 3)) == 6)
  }
}
