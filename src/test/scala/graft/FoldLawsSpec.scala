package graft

import graft.core.{Fold, Folds}
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalatest.funsuite.AnyFunSuite

/** Property-based pinning of the ONE law the distributed engine
  * depends on: for every shipped fold, splitting the input
  * arbitrarily, folding the pieces, and merging the partial buffers
  * must equal the sequential fold (exactly, or within float noise
  * for the non-exact reductions).  This is precisely what map-side
  * partial aggregation does to a Fold at scale.
  */
class FoldLawsSpec extends AnyFunSuite {

  /** Run a ScalaCheck property and fail the suite on falsification. */
  private def check(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  private val inputs: Gen[(List[Int], Int)] = for {
    xs <- Gen.listOfN(300, Gen.chooseNum(-1000, 1000))
    chunk <- Gen.chooseNum(1, 50)
  } yield (xs, chunk)

  private def viaMerge[A, B](f: Fold[A, B], xs: Seq[A], chunk: Int): B = {
    val parts = xs.grouped(chunk).map(_.foldLeft(f.init)(f.step)).toList
    f.done(parts.foldLeft(f.init)(f.merge))
  }

  private def exactLaw[B](f: Fold[Int, B]): Prop =
    forAll(inputs) { case (xs, chunk) => viaMerge(f, xs, chunk) == f.fold(xs) }

  test("merge law: sum/count/min/max/topK/first-nonempty (exact)") {
    check(exactLaw(Folds.sum[Int]))
    check(exactLaw(Folds.count[Int]))
    check(exactLaw(Folds.min[Int]))
    check(exactLaw(Folds.max[Int]))
    check(exactLaw(Folds.topK[Int](5)))
  }

  test("merge law: product/any/all/set (exact), with foldl semantics on empty") {
    check(exactLaw(Folds.product[Int].premap[Int](x => if (x == 0) 1 else x)))
    check(exactLaw(Folds.any[Int](_ % 7 == 0)))
    check(exactLaw(Folds.all[Int](_ % 7 != 0)))
    check(exactLaw(Folds.set[Int]))
    assert(!Folds.any[Int](_ => true).fold(Nil))  // empty → false
    assert(Folds.all[Int](_ => false).fold(Nil))  // vacuous truth
    assert(Folds.product[Int].fold(Nil) == 1)
    assert(Folds.set[Int].fold(Seq(2, 1, 2)) == Set(1, 2))
  }

  test("merge law: minimumBy/maximumBy/elem/notElem (exact, first-wins ties)") {
    // key projection with deliberate collisions (mod 10) — first-wins
    // tie semantics must survive any in-order chunking
    check(exactLaw(Folds.minimumBy[Int, Int](x => math.abs(x) % 10)))
    check(exactLaw(Folds.maximumBy[Int, Int](x => math.abs(x) % 10)))
    check(exactLaw(Folds.elem(42)))
    check(exactLaw(Folds.notElem(42)))
    assert(Folds.minimumBy[Int, Int](identity).fold(Nil).isEmpty)
    // first among equal keys wins: (3,"a") seen before (3,"b")
    assert(Folds.minimumBy[(Int, String), Int](_._1)
      .fold(Seq((3, "a"), (3, "b"), (7, "c"))).contains((3, "a")))
    assert(Folds.maximumBy[(Int, String), Int](_._1)
      .fold(Seq((7, "a"), (3, "b"), (7, "c"))).contains((7, "a")))
    assert(!Folds.elem(1).fold(Nil))
    assert(Folds.notElem(1).fold(Nil))
  }

  test("merge law: find/lastN (exact for in-order merges)") {
    check(exactLaw(Folds.find[Int](_ % 3 == 0)))
    check(exactLaw(Folds.lastN[Int](7)))
    assert(Folds.find[Int](_ > 2).fold(Seq(1, 3, 2, 4)).contains(3))
    assert(Folds.find[Int](_ > 9).fold(Seq(1, 2)).isEmpty)
    assert(Folds.lastN[Int](3).fold(1 to 10) == List(8, 9, 10))
    assert(Folds.lastN[Int](3).fold(Seq(1)) == List(1))
    assert(Folds.lastN[Int](0).fold(1 to 5) == Nil)
  }

  test("merge law: mean/variance within float noise; quantile exact below capacity") {
    check(forAll(inputs) { case (xs, chunk) =>
      val ds = xs.map(_.toDouble)
      val m1 = viaMerge(Folds.mean, ds, chunk)
      val m2 = Folds.mean.fold(ds)
      xs.isEmpty || math.abs(m1 - m2) <= 1e-9 * math.max(1.0, math.abs(m2))
    })
    check(forAll(inputs) { case (xs, chunk) =>
      val ds = xs.map(_.toDouble)
      val v1 = viaMerge(Folds.variance, ds, chunk)
      val v2 = Folds.variance.fold(ds)
      xs.isEmpty || math.abs(v1 - v2) <= 1e-6 * math.max(1.0, math.abs(v2))
    })
    check(forAll(inputs) { case (xs, chunk) =>
      val ds = xs.map(_.toDouble)
      viaMerge(Folds.approxQuantile(1024, 0.5), ds, chunk) ==
        Folds.approxQuantile(1024, 0.5).fold(ds) // exact regime: any split
    })
  }

  test("merge law: hll bit-identical under any split (max-merge idempotence)") {
    val hashes = for {
      xs <- Gen.listOfN(300, Gen.chooseNum(0L, (1L << 60) - 1))
      chunk <- Gen.chooseNum(1, 50)
    } yield (xs, chunk)
    check(forAll(hashes) { case (xs, chunk) =>
      val f = Folds.hll(8)
      java.lang.Double.doubleToLongBits(viaMerge(f, xs, chunk)) ==
        java.lang.Double.doubleToLongBits(f.fold(xs))
    })
  }

  test("zip preserves the merge law (Applicative product of partials)") {
    val f = Folds.sum[Int].zip(Folds.count[Int]).zip(Folds.topK[Int](3))
    check(forAll(inputs) { case (xs, chunk) => viaMerge(f, xs, chunk) == f.fold(xs) })
  }

  test("heavyHitters: exact regime below capacity; MG bound under any split") {
    // exact regime: distinct keys ≤ capacity ⇒ counts are exact for
    // any split (this is what q53's oracle relies on)
    val smallKey = for {
      xs <- Gen.listOfN(300, Gen.chooseNum(0, 30))
      chunk <- Gen.chooseNum(1, 50)
    } yield (xs, chunk)
    check(forAll(smallKey) { case (xs, chunk) =>
      val f = Folds.heavyHitters[Int](32)
      viaMerge(f, xs, chunk) == xs.groupBy(identity).map { case (k, v) =>
        (k, v.size.toLong) }
    })
    // approximate regime: every reported count is an undercount by at
    // most n/(capacity+1), and every key with true frequency above
    // that bound is present — under any split (mergeable-summary bound)
    val skewed = for {
      xs <- Gen.listOfN(400, Gen.frequency(
        6 -> Gen.const(0), 3 -> Gen.const(1), // heavy keys
        8 -> Gen.chooseNum(2, 200)))          // long tail
      chunk <- Gen.chooseNum(1, 50)
    } yield (xs, chunk)
    check(forAll(skewed) { case (xs, chunk) =>
      val cap = 8
      val got = viaMerge(Folds.heavyHitters[Int](cap), xs, chunk)
      val truth = xs.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
      val bound = xs.size.toLong / (cap + 1)
      got.forall { case (k, c) =>
        val t = truth.getOrElse(k, 0L); c <= t && t - c <= bound
      } && truth.forall { case (k, t) => t <= bound || got.contains(k) }
    })
  }

  test("bloom: no false negatives under any split; merge bit-identical to sequential") {
    val hashes = for {
      xs <- Gen.listOfN(300, Gen.chooseNum(Long.MinValue, Long.MaxValue))
      chunk <- Gen.chooseNum(1, 50)
    } yield (xs, chunk)
    check(forAll(hashes) { case (xs, chunk) =>
      val f = Folds.bloom(1024, 5)
      val merged = viaMerge(f, xs, chunk)
      merged == f.fold(xs) && {
        val bits = merged.toArray
        xs.forall(h => Folds.bloomContains(bits, 5, h))
      }
    })
  }
}
