package graft

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

/** Pure fold-algebra laws (no Spark) — mirrors the reference's foldl
  * vocabulary semantics (SURVEY §2.1-G) and the Applicative product
  * law (`Core.hs:211-218`): zip computes the pair of individual
  * results in one pass. */
class FoldSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(7)
  private def sample(n: Int): List[Int] = List.fill(n)(rnd.nextInt(1000) - 500)

  test("sum/count/min/max/mean against direct computation") {
    for (n <- Seq(0, 1, 3, 100, 1000)) {
      val xs = sample(n)
      assert(Folds.sum[Int].fold(xs) == xs.sum)
      assert(Folds.count[Int].fold(xs) == xs.length.toLong)
      assert(Folds.min[Int].fold(xs) == (if (xs.isEmpty) None else Some(xs.min)))
      assert(Folds.max[Int].fold(xs) == (if (xs.isEmpty) None else Some(xs.max)))
      val ds = xs.map(_.toDouble)
      val m = Folds.mean.fold(ds)
      if (xs.isEmpty) assert(m.isNaN)
      else assert(math.abs(m - ds.sum / ds.length) < 1e-9)
    }
  }

  test("zip computes the pair of individual results (Applicative law)") {
    val xs = sample(200).map(_.toDouble)
    val f = Folds.sum[Double].zip(Folds.count[Double])
    assert(f.fold(xs) == ((xs.sum, xs.length.toLong)))
  }

  test("map/premap compose (Functor/Profunctor)") {
    val xs = sample(100)
    val f = Folds.sum[Int].premap[String](_.length).map(_ * 2)
    val strs = xs.map(i => "x" * (math.abs(i) % 10))
    assert(f.fold(strs) == strs.map(_.length).sum * 2)
  }

  test("merge splits arbitrarily = sequential fold (partial aggregation law)") {
    val xs = sample(500)
    val f = Folds.sum[Int].zip(Folds.count[Int]).zip(Folds.min[Int])
    val whole = xs.foldLeft(f.init)(f.step)
    for (k <- Seq(1, 7, 100)) {
      val parts = xs.grouped(k).map(_.foldLeft(f.init)(f.step)).toList
      val merged = parts.reduceOption(f.merge).getOrElse(f.init)
      assert(f.done(merged) == f.done(whole), s"chunk size $k")
    }
  }

  test("list fold preserves order when merged in partition order") {
    val xs = sample(100)
    val f = Folds.list[Int]
    val parts = xs.grouped(9).map(_.foldLeft(f.init)(f.step)).toList
    assert(f.done(parts.reduce(f.merge)) == xs)
  }

  test("variance/stddev merge exactly across arbitrary splits (Chan's update)") {
    val xs = sample(1000).map(_.toDouble)
    val direct = {
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / xs.length
    }
    assert(math.abs(Folds.variance.fold(xs) - direct) < 1e-6)
    for (k <- Seq(3, 17, 250)) {
      val parts = xs.grouped(k).map(_.foldLeft(Folds.variance.init)(Folds.variance.step)).toList
      val merged = Folds.variance.done(parts.reduce(Folds.variance.merge))
      assert(math.abs(merged - direct) < 1e-6, s"chunk $k")
    }
    assert(Folds.variance.fold(Nil).isNaN)
  }

  test("topK keeps the k largest regardless of split") {
    val xs = sample(500)
    val expect = xs.sorted(Ordering[Int].reverse).take(5)
    assert(Folds.topK[Int](5).fold(xs) == expect)
    val parts = xs.grouped(13).map(_.foldLeft(Folds.topK[Int](5).init)(Folds.topK[Int](5).step))
    assert(Folds.topK[Int](5).done(parts.reduce(Folds.topK[Int](5).merge)) == expect)
  }

  test("topK bounded-insert edges: k=1, k>n, duplicates, empty") {
    assert(Folds.topK[Int](1).fold(Seq(5, 1, 9, 9, 3)) == Seq(9))
    assert(Folds.topK[Int](10).fold(Seq(3, 1, 2)) == Seq(3, 2, 1))
    assert(Folds.topK[Int](3).fold(Seq(7, 7, 7, 7)) == Seq(7, 7, 7))
    assert(Folds.topK[Int](3).fold(Nil) == Nil)
    // large k: merge of uneven partial buffers still exact
    val xs = sample(2000)
    val k = 1000
    val expect = xs.sorted(Ordering[Int].reverse).take(k)
    val f = Folds.topK[Int](k)
    val parts = xs.grouped(37).map(_.foldLeft(f.init)(f.step))
    assert(f.done(parts.reduce(f.merge)) == expect)
  }

  test("approxQuantile exact below capacity, any split (percentile_disc)") {
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(900)(rnd.nextDouble() * 1000)
    def disc(q: Double): Double = {
      val v = xs.sorted
      v.zipWithIndex.find { case (_, i) => (i + 1).toDouble >= q * v.length }.get._1
    }
    for (q <- Seq(0.1, 0.5, 0.9); chunk <- Seq(1000, 97, 13)) {
      val f = Folds.approxQuantile(1024, q)
      val parts = xs.grouped(chunk).map(_.foldLeft(f.init)(f.step))
      assert(f.done(parts.reduce(f.merge)) == disc(q), s"q=$q chunk=$chunk")
    }
  }

  test("approxQuantile compaction regime: bounded rank error, conserved weight") {
    val rnd = new scala.util.Random(12)
    val n = 20000
    val xs = Seq.fill(n)(rnd.nextDouble())
    val f = Folds.approxQuantile(256, 0.5)
    // build via uneven partial buffers, like a real shuffle
    val parts = xs.grouped(631).map(_.foldLeft(f.init)(f.step)).toSeq
    val sk = parts.reduce(f.merge)
    assert(sk.n == n.toLong)
    // compaction conserves total weight: Σ |level_i| · 2^i == n
    val weight = sk.levels.zipWithIndex.map { case (b, i) => b.length.toLong << i }.sum
    assert(weight == n.toLong)
    val sorted = xs.sorted.toIndexedSeq
    for (q <- Seq(0.05, 0.25, 0.5, 0.75, 0.95)) {
      val est = sk.quantile(q)
      val trueRank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(trueRank - q) < 0.04, s"q=$q rank=$trueRank est=$est")
    }
    // memory bound: every level buffer within capacity
    assert(sk.levels.forall(_.length <= 256))
  }

  test("hll: bit-identical across merge orders; estimate within 5%") {
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16)
    }
    val distinct = 5000
    val hashes = (1 to distinct).map(i => h60(s"doc$i"))
    val withDups = hashes ++ hashes.take(1700) ++ hashes.take(400)
    val f = Folds.hll(12)
    val direct = f.fold(withDups)
    for (chunk <- Seq(97, 1024, withDups.length)) {
      val parts = withDups.grouped(chunk).map(_.foldLeft(f.init)(f.step))
      val merged = f.done(parts.reduce(f.merge))
      assert(java.lang.Double.doubleToLongBits(merged) ==
        java.lang.Double.doubleToLongBits(direct), s"chunk=$chunk")
    }
    assert(math.abs(direct - distinct) / distinct < 0.05, s"estimate=$direct")
    // idempotent: re-folding the same values changes nothing
    val twice = f.fold(withDups ++ withDups)
    assert(twice == direct)
  }

  test("first/last in sequential order") {
    val xs = sample(50)
    assert(Folds.first[Int].fold(xs) == xs.headOption)
    assert(Folds.last[Int].fold(xs) == xs.lastOption)
    assert(Folds.first[Int].fold(Nil) == None)
  }

  test("ofFunction (functionToFold analog) sees the whole container") {
    val xs = sample(51).map(_.toDouble)
    val medianF = Folds.ofFunction[Double, Double] { s =>
      val v = s.toArray.sorted
      v(v.length / 2)
    }
    assert(medianF.fold(xs) == xs.sorted.apply(25))
  }
}
