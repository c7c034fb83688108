package graft.tools

import graft.functions.ColFns
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B micro-benchmarks for expression-level choices.
  * Usage: runMain graft.tools.MicroBench [nRows] [dims]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 200000
    val dims = if (args.length > 1) args(1).toInt else 64
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val vecs = spark.range(n).select(
      transform(sequence(lit(1), lit(dims)),
        i => (col("id") % 97 + i).cast("double") / 97.0).as("v"))
      .cache()
    vecs.count()

    def time(label: String)(f: => Any): Unit = {
      f // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.sorted.apply(1)}%.3f s (median of 3)")
    }

    val hof = aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)
    time("hof_dot   ")(vecs.select(sum(hof)).collect())
    time("native_dot")(vecs.select(sum(ColFns.dotD(col("v"), col("v")))).collect())

    // bloom build pass: n inserts into a 2^20-bit filter (the
    // Bloom.semiJoinPrune build side) — r4 swapped the persistent
    // Vector buffer for an in-place Array (was ~100 words copied per
    // probe; now 1 |= per probe)
    {
      import spark.implicits._
      val bloomUdaf = graft.streaming.StreamingAgg.foldUdaf(
        graft.core.Folds.bloom(1 << 20, 5))
      val keys = spark.range(n).select(xxhash64(col("id")).as("h")).cache()
      keys.count()
      time("bloom_build")(keys.agg(bloomUdaf(col("h"))).collect())
    }
    spark.stop()
  }
}
