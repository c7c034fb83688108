package graft

import graft.ext.{Decontaminate, Sampling}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** Broadcast-overflow guards: when the "small" side of a broadcast
  * outgrows its cap, the operators must fall back to a shuffle-safe
  * plan with IDENTICAL rows — oversized inputs degrade, never OOM. */
class GuardrailsSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def rowsOf(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("Decontaminate.overlap fallback (bloom + shuffle semi-join) == broadcast path") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "completely unrelated text with no benchmark overlap here at all"),
      (3L, "the quick brown fox jumps over something else entirely now"))
      .toDF("doc_id", "text")
    val holdout = Seq((100L, "the quick brown fox jumps over the fence"))
      .toDF("doc_id", "text")
    val viaBroadcast = rowsOf(
      Decontaminate.overlap(corpus, holdout, "doc_id", "text"))
    val viaFallback = rowsOf(
      Decontaminate.overlap(corpus, holdout, "doc_id", "text",
        maxBroadcastGrams = 1L))
    assert(viaBroadcast.nonEmpty, "test data must actually overlap")
    assert(viaFallback == viaBroadcast)
  }

  test("samplePerGroup fallback (shuffle semi-join) == broadcast path") {
    val df = (1 to 300).map(i => (s"g${i % 3}", i.toLong)).toDF("grp", "id")
    val viaBroadcast = rowsOf(Sampling.samplePerGroup(df, Seq("grp"), "id", 5))
    val viaFallback = rowsOf(Sampling.samplePerGroup(df, Seq("grp"), "id", 5,
      maxBroadcastPicks = 1L))
    assert(viaBroadcast.size == 15, "3 groups x k=5 picks")
    assert(viaFallback == viaBroadcast)
  }
}
