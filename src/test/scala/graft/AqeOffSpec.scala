package graft

import graft.queries.{PipelineQueries, RefQueries}
import org.scalatest.funsuite.AnyFunSuite

/** The oracle gate always runs with AQE on; a result that silently
  * depended on AQE's runtime re-planning (coalesced shuffle reads,
  * broadcast-join demotion, skew splitting) would never be caught
  * there.  Pin AQE-independence for a representative slice of the
  * engine surfaces: plain agg, LSH band join, bounded top-k +
  * broadcast semi-join, window-partitioning reuse.
  */
class AqeOffSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def sameWithAqeOff(name: String,
      q: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    val on = rows(q(spark, sf))
    // restore the PRIOR value, not a hard-coded "true" — the shared
    // session's default must survive this test unchanged
    val prev = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val off = rows(q(spark, sf))
      assert(off == on, s"$name diverges when AQE is disabled")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.adaptive.enabled", p)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("q01 aggregation, q17 LSH, q45 top-k sample, q76 shuffle-shard are AQE-independent") {
    sameWithAqeOff("q01", RefQueries.q01 _)
    sameWithAqeOff("q17", PipelineQueries.all("q17_minhash_lsh"))
    sameWithAqeOff("q45", PipelineQueries.all("q45_group_sample"))
    sameWithAqeOff("q76", PipelineQueries.all("q76_shuffle_shard"))
  }
}
