package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 optimization profiling: stage-level breakdown of the
  * heavyweight bench blocks (q92's composition, the closure, the BPE
  * kernel) so optimizations target measured cost, not guesses.
  * Usage: runMain graft.tools.ProfileR18 [sfDir]
  */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(label: String)(f: => Any): Unit = {
      f; f // warmup
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[profile] $label: best=${ts.min}%.3f s  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    def sweep(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    import graft.ext.Dedup

    // --- q92 stage breakdown -------------------------------------------
    time("q92 full") {
      graft.queries.PipelineQueries.q92(spark, sfDir).count(); sweep()
    }
    time("lshPairs(minJ=0.5).count") {
      Dedup.lshPairs(docs, "doc_id", "text", minJaccard = 0.5).count(); sweep()
    }
    // pairs materialized once, closure timed alone
    val pairsM = Dedup.lshPairs(docs, "doc_id", "text", minJaccard = 0.5)
      .localCheckpoint()
    val nPairs = pairsM.count()
    println(s"[profile] pairs rows = $nPairs")
    val nodes = pairsM.select(col("id_a").as("doc_id"))
      .union(pairsM.select(col("id_b").as("doc_id"))).distinct()
      .localCheckpoint()
    println(s"[profile] nodes rows = ${nodes.count()}")
    time("connectedComponents over pairs") {
      graft.ext.Components.connectedComponents(
        pairsM, "id_a", "id_b", nodes, "doc_id").count()
    }
    time("quality projection (corpus)") {
      import graft.functions.ColFns.tokens
      docs.select(Seq(col("doc_id"), tokens(col("text")).as("__toks"),
          col("text")): _*)
        .select(Seq(col("doc_id")) ++
          graft.ext.TextOps.qualityColsRawOf(col("__toks"), col("text")): _*)
        .write.format("noop").mode("overwrite").save()
    }

    // --- BPE kernel micro ------------------------------------------------
    {
      import graft.functions.Bpe
      val merges = Bpe.trainMerges(docs, "text", 200)
      println(s"[profile] trained merges = ${merges.length}")
      val d2 = docs.localCheckpoint()
      time("bpe tokenCount (200 merges) over corpus") {
        d2.select(sum(Bpe.tokenCount(col("text"), merges))).collect()
      }
      time("bpe encode+size (200 merges) over corpus") {
        d2.select(sum(size(Bpe.encode(col("text"), merges)))).collect()
      }
      // space-free hazard probe: ONE 20 KB space-free row, single task
      val longWord = ("abcdefgh" * 2500)
      val one = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(longWord)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("text",
            org.apache.spark.sql.types.StringType)))).localCheckpoint()
      time("bpe tokenCount one 20KB space-free row") {
        one.select(sum(Bpe.tokenCount(col("text"), merges))).collect()
      }
    }
    spark.stop()
  }
}
