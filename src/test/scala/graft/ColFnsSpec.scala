package graft

import graft.functions.ColFns
import graft.ext.{Dedup, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Column-function semantics vs plain-Scala reference implementations
  * (shingles, md5-derived hashes, fingerprints) — these are the
  * primitives the DuckDB oracles replicate, so they must be exactly
  * the functions we think they are. */
class ColFnsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def h60Ref(s: String): Long =
    java.lang.Long.parseLong(md5Hex(s).take(15), 16)

  test("h60 = first 15 md5 hex chars as int64") {
    val ss = Seq("hello", "world foo", "", "zh 的 text")
    val got = ss.toDF("s").select(ColFns.h60(col("s"))).as[Long].collect()
    assert(got.toSeq == ss.map(h60Ref))
  }

  test("tokens drops empties, lowercases") {
    val got = Seq("Foo  BAR  baz ").toDF("s")
      .select(ColFns.tokens(col("s"))).as[Seq[String]].collect().head
    assert(got == Seq("foo", "bar", "baz"))
  }

  test("wordShingles n=3") {
    val got = Seq("a b c d e", "a b").toDF("s")
      .select(ColFns.wordShingles(ColFns.tokens(col("s")), 3))
      .as[Seq[String]].collect()
    assert(got(0) == Seq("a b c", "b c d", "c d e"))
    assert(got(1) == Seq.empty)
  }

  test("charShingles n=5") {
    val got = Seq("abcdefg", "abc").toDF("s")
      .select(ColFns.charShingles(col("s"), 5)).as[Seq[String]].collect()
    assert(got(0) == Seq("abcde", "bcdef", "cdefg"))
    assert(got(1) == Seq.empty)
  }

  test("minhash matches scala reference for each permutation") {
    def minhashRef(shingles: Seq[String], i: Int): Long =
      shingles.map { s =>
        (ColFns.MinhashA(i) * (h60Ref(s) % ColFns.MinhashP) + ColFns.MinhashB(i)) % ColFns.MinhashP
      }.min
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val shingles = {
      val t = text.split(" ").toSeq
      t.sliding(3).map(_.mkString(" ")).toSeq.distinct
    }
    val row = Seq(text).toDF("text")
      .select(ColFns.minhashCols(array_distinct(
        ColFns.wordShingles(ColFns.tokens(col("text")), 3))): _*)
      .collect().head
    (0 until ColFns.MinhashA.size).foreach { i =>
      assert(row.getLong(i) == minhashRef(shingles, i), s"perm $i")
    }
  }

  test("fingerprint = polynomial rolling hash over token h60s") {
    def fpRef(text: String): Long =
      text.toLowerCase.split(" ").filter(_.nonEmpty)
        .map(t => h60Ref(t) % ColFns.FpMod)
        .foldLeft(0L)((acc, x) => (acc * ColFns.FpBase + x) % ColFns.FpMod)
    val ss = Seq("one two three", "a", "x y z w", "")
    val got = ss.toDF("text").select(ColFns.fingerprint(ColFns.tokens(col("text"))))
      .as[Long].collect()
    assert(got.toSeq == ss.map(fpRef))
  }

  test("dotD is a strict left-to-right double dot product") {
    val a = Seq(0.1f, 0.2f, 0.3f)
    val b = Seq(0.4f, 0.5f, 0.6f)
    val got = Seq((a, b)).toDF("a", "b")
      .select(ColFns.dotD(ColFns.vecD(col("a")), ColFns.vecD(col("b"))))
      .as[Double].collect().head
    val exp = a.map(_.toDouble).zip(b.map(_.toDouble))
      .foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    assert(got == exp) // exact: same op order
  }

  test("exact dedup keeps min-tiebreak row per key") {
    val df = Seq((3L, "a", "x"), (1L, "a", "y"), (2L, "b", "z"))
      .toDF("id", "k", "payload")
    val out = Dedup.exact(df, Seq("k"), "id")
      .orderBy("k").as[(Long, String, String)].collect().toSeq
    assert(out == Seq((1L, "a", "y"), (2L, "b", "z")))
  }

  test("simhash identical docs get identical hashes; disjoint docs differ") {
    val df = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "delta epsilon zeta eta theta")).toDF("doc_id", "text")
    val out = Dedup.simhash(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Long)].collect()
    assert(out(0)._2 == out(1)._2 && out(0)._3 == out(1)._3)
    assert(out(0)._2 != out(2)._2 || out(0)._3 != out(2)._3)
    assert(out.forall(r => r._2 >= 0 && r._3 >= 0))
  }

  test("langId picks the stopword-argmax language") {
    val df = Seq("the cat is in the hat and the dog",
      "el perro y el gato de la casa y los árboles",
      "der hund und die katze ist nicht mit").toDF("text")
    val got = df.select(TextOps.langIdCol(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "es", "de"))
  }

  test("dedupChunksCol drops repeated chunks, keeps first occurrence in order") {
    val df = Seq(
      // chunks (width 2): "a b" | "c d" | "a b" | "e" → drop 3rd
      "a b c d a b e",
      // all distinct → unchanged
      "a b c d e f",
      // same chunk thrice → one survives
      "x y x y x y",
      // trailing short chunk duplicates nothing ("a" ≠ "a b")
      "a b a",
      "").toDF("text")
    val got = df
      .select(TextOps.tokenChunks(graft.functions.ColFns.tokens(col("text")), 2)
        .as("ch"))
      .select(TextOps.dedupChunks(col("ch")), TextOps.droppedChunkCount(col("ch")))
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(
      ("a b c d e", 1L),
      ("a b c d e f", 0L),
      ("x y", 2L),
      ("a b a", 0L),
      ("", 0L)))
  }
}
