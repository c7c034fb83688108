package graft.tools

import graft.ext.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the incremental-index claim in SCALE.md: probing a stored
  * LSH index with a new batch vs recomputing the full corpus, on a
  * synthetic corpus big enough for the asymmetry to show (the gate's
  * documents table is a fixed 500 rows).
  * Usage: runMain graft.tools.IndexBench [corpusDocs] [batchDocs]
  */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val nCorpus = if (args.nonEmpty) args(0).toInt else 20000
    val nBatch = if (args.length > 1) args(1).toInt else 500
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic pseudo-text: 8 md5 words per doc (~260 chars),
    // near-random shingle sets → realistic sparse LSH collisions
    def docs(lo: Long, hi: Long) = spark.range(lo, hi).select(col("id"),
      concat_ws(" ",
        (0 to 7).map(k => md5(concat(col("id"), lit(s"_$k")))): _*).as("text"))
    val corpus = docs(0L, nCorpus.toLong)
    val batch = docs(nCorpus.toLong, (nCorpus + nBatch).toLong)

    def best2(label: String)(f: => Any): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.min}%.2f s (best of 2)")
    }
    def once(label: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    best2(f"full_recompute  corpus=${nCorpus + nBatch}%d") {
      val p = Dedup.lshPairs(corpus.unionByName(batch), "id", "text")
      p.count(); Dedup.unpersistInputsOf(p)
    }
    once(f"index_build     corpus=$nCorpus%d (one-time)") {
      Dedup.writeLshIndex(corpus, "id", "text", "ixbench_idx")
    }
    best2(f"probe_batch     batch=$nBatch%d") {
      val p = Dedup.lshPairsAgainstIndex(batch, "id", "text", "ixbench_idx")
      p.count(); Dedup.unpersistInputsOf(p)
    }
    spark.stop()
  }
}
