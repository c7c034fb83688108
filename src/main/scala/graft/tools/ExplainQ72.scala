package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan audit for the incremental LSH index (q72): prints the
  * formatted physical plan so the stored-band side's shuffle behavior
  * is inspectable (the design claim: bucketed index side does not
  * re-Exchange on the probe join). */
object ExplainQ72 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    graft.ext.Dedup.writeLshIndex(docs.where(col("doc_id") < 400),
      "doc_id", "text", "xq72idx")
    val out = graft.ext.Dedup.lshPairsAgainstIndex(
      docs.where(col("doc_id") >= 400), "doc_id", "text", "xq72idx")
    out.explain("formatted")
    spark.stop()
  }
}
