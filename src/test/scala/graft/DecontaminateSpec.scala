package graft

import graft.ext.Decontaminate
import org.scalatest.funsuite.AnyFunSuite

class DecontaminateSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], n: Int,
      maxBroadcast: Long = 4000000L): Map[Long, (String, Long, Long)] =
    Decontaminate.removeRepeatedPassages(docs.toDF("doc_id", "text"),
        "doc_id", "text", n, maxBroadcast)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap

  test("removeRepeatedPassages keeps the canonical (min-id) copy, strips later ones") {
    val shared = "a b c d" // the repeated 4-token passage
    val docs = Seq(
      (1L, s"$shared x y"),      // canonical: keeps everything
      (2L, s"p q $shared r"),    // later copy: loses the 4 shared tokens
      (3L, "p q r s"))           // too short for any 4-gram overlap machinery to fire
    val out = run(docs, n = 4)
    assert(out(1L) == ("a b c d x y", 6L, 0L), s"canonical intact: ${out(1L)}")
    assert(out(2L) == ("p q r", 3L, 4L), s"later copy stripped: ${out(2L)}")
    assert(out(3L) == ("p q r s", 4L, 0L))
  }

  test("overlapping repeated grams remove the union of their spans") {
    // doc 2 repeats tokens 1..5 of doc 1: grams at pos 1 and 2 (n=4)
    // overlap; the removed span is their union (5 tokens), not 8
    val docs = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d e tail1 tail2"))
    val out = run(docs, n = 4)
    assert(out(2L) == ("tail1 tail2", 2L, 5L), s"got ${out(2L)}")
  }

  test("intra-doc repetition inside the canonical doc is untouched") {
    val docs = Seq(
      (1L, "a b c d a b c d"), // repeats internally; no other doc shares it
      (2L, "u v w x y z q r"))
    val out = run(docs, n = 4)
    assert(out(1L)._3 == 0L, "canonical doc must not self-remove")
  }

  test("shorter-than-n documents pass through unchanged") {
    val out = run(Seq((1L, "a b"), (2L, "a b")), n = 4)
    assert(out(1L) == ("a b", 2L, 0L) && out(2L) == ("a b", 2L, 0L))
  }

  test("a doc removed in full round-trips as the empty string") {
    val out = run(Seq((1L, "a b c d"), (2L, "a b c d")), n = 4)
    assert(out(2L) == ("", 0L, 4L), s"got ${out(2L)}")
  }

  test("shuffle-join fallback (marks over the broadcast cap) == broadcast path") {
    val docs = (1L to 40L).map { id =>
      // every doc shares one of two passages; plus unique tail tokens
      val base = if (id % 2 == 0) "m n o p q" else "f g h i j"
      (id, s"$base extra$id tail$id")
    }
    val viaBroadcast = run(docs, n = 5)
    val viaFallback = run(docs, n = 5, maxBroadcast = 1L)
    assert(viaBroadcast == viaFallback)
    // sanity: only ids 1 and 2 are canonical, everyone else stripped
    assert(viaBroadcast.count { case (_, (_, _, removed)) => removed > 0 } == 38)
  }
}
