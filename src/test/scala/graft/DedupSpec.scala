package graft

import graft.ext.Dedup
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("exact(hashKey = true) picks the identical survivors as raw-key grouping") {
    val rnd = new scala.util.Random(21)
    val texts = Seq("alpha beta", "gamma", "alpha beta", "delta epsilon",
      "gamma", "gamma", "zeta")
    val rows = (1 to 200).map { i =>
      (i.toLong, texts(rnd.nextInt(texts.length)), s"extra$i")
    }
    val df = rows.toDF("doc_id", "text", "payload")
    val raw = Dedup.exact(df, Seq("text"), "doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val hashed = Dedup.exact(df, Seq("text"), "doc_id", hashKey = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(hashed == raw)
    assert(raw.map(_._2) == texts.toSet) // one survivor per distinct text
  }

  test("multi-column hash key does not merge across column boundaries") {
    val df = Seq((1L, "a b", "c"), (2L, "a", "b c"), (3L, "a b", "c"))
      .toDF("id", "k1", "k2")
    val out = Dedup.exact(df, Seq("k1", "k2"), "id", hashKey = true)
      .collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L)) // (a b, c) dedups; (a, b c) stays distinct
  }
}
