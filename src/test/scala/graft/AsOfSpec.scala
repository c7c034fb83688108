package graft

import graft.ext.AsOf
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

class AsOfSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("asOfJoin: backward match, >= tie, and unmatched-null semantics") {
    val left = Seq( // (key, lts, label)
      ("a", 10L, "l1"), ("a", 20L, "l2"), ("a", 5L, "l0"),
      ("b", 7L, "l3")).toDF("k", "t", "label")
    val right = Seq( // (key, rts, payload)
      ("a", 10L, "r@10"), ("a", 15L, "r@15"), ("c", 1L, "r-other"))
      .toDF("k", "t", "p")
    val got = AsOf.asOfJoin(left, right, Seq("k"), "t", "t")
      .select("k", "t", "label", "p")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.getString(3)))).toSet
    assert(got == Set(
      ("a", 10L, "l1", Some("r@10")), // exact tie matches (>= semantics)
      ("a", 20L, "l2", Some("r@15")), // latest prior wins
      ("a", 5L, "l0", None),          // nothing at-or-before
      ("b", 7L, "l3", None)))         // key with no right rows at all
  }

  test("binned range join == naive inequality join, any bin width") {
    import graft.ext.RangeJoin
    val rnd = new scala.util.Random(23)
    val pts = Seq.fill(200)((rnd.nextInt(1000).toLong, rnd.nextInt()))
      .toDF("v", "pid")
    val ivs = Seq.fill(100)({
      val lo = rnd.nextInt(1000).toLong
      (lo, lo + rnd.nextInt(60), rnd.nextInt())
    }).toDF("lo", "hi", "iid")
    val naive = pts.join(ivs, col("v") >= col("lo") && col("v") <= col("hi"))
      .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    for (width <- Seq(1L, 16L, 64L, 5000L)) {
      val binned = RangeJoin.pointInInterval(pts, "v", ivs, "lo", "hi", width)
        .select("pid", "iid").collect().map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(binned == naive, s"binWidth=$width")
    }
  }

  test("asOfJoin rejects payload/name collisions and reserved __ columns loudly") {
    val left = Seq(("a", 10L, "x")).toDF("k", "t", "p")
    val right = Seq(("a", 5L, "y")).toDF("k", "t", "p")
    // right payload 'p' collides with left 'p' → must throw, not emit dup names
    val e1 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(left, right, Seq("k"), "t", "t")
    }
    assert(e1.getMessage.contains("collide"))
    val l2 = Seq(("a", 10L, "x")).toDF("k", "t", "__side")
    val r2 = Seq(("a", 5L, "y")).toDF("k", "t", "q")
    val e2 = intercept[IllegalArgumentException] {
      AsOf.asOfJoin(l2, r2, Seq("k"), "t", "t")
    }
    assert(e2.getMessage.contains("__"))
  }

  test("range join rejects inverted intervals and runaway bin explosions loudly") {
    import graft.ext.RangeJoin
    // task failures arrive wrapped; scan the whole cause chain
    def chain(t: Throwable): String = Iterator.iterate(t)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse(""))
      .mkString("|")
    val pts = Seq((5L, 1)).toDF("v", "pid")
    val inverted = Seq((10L, 2L, 7)).toDF("lo", "hi", "iid")
    val e1 = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "v", inverted, "lo", "hi", 4L).collect()
    }
    assert(chain(e1).contains("inverted interval"))
    val huge = Seq((0L, 10000000L, 7)).toDF("lo", "hi", "iid")
    val e2 = intercept[Exception] {
      RangeJoin.pointInInterval(pts, "v", huge, "lo", "hi", 1L,
        maxBinsPerInterval = 1000L).collect()
    }
    assert(chain(e2).contains("bins"))
  }

  test("asOfJoin keeps every left row exactly once (left-join cardinality)") {
    val rnd = new scala.util.Random(17)
    val left = Seq.fill(500)((rnd.nextInt(20), rnd.nextInt(1000).toLong, rnd.nextInt()))
      .toDF("k", "t", "v")
    val right = Seq.fill(300)((rnd.nextInt(20), rnd.nextInt(1000).toLong, rnd.nextInt()))
      .distinct.groupBy(x => (x._1, x._2)).map(_._2.head).toSeq
      .toDF("k", "t", "p")
    assert(AsOf.asOfJoin(left, right, Seq("k"), "t", "t").count() == 500L)
  }
}
