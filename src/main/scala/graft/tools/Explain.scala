package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for selected queries — the
  * scale-review loop: check predicate pushdown (PushedFilters),
  * column pruning (ReadSchema), WholeStageCodegen spans, join
  * strategies, and shuffle counts.
  * Usage: runMain graft.tools.Explain <sfDir> [queryName...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q01_group_sum", "q02_filter_sum", "q15_ann_bruteforce",
        "q17_minhash_lsh", "q19_ngram_jaccard", "q26_join_agg",
        "q45_group_sample", "q46_pipeline_e2e", "q47_seq_pack")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = graft.SparkEntry.queries
    names.foreach { n =>
      println(s"\n========== $n ==========")
      qs(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
