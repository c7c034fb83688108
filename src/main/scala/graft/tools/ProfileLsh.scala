package graft.tools

import graft.functions.ColFns._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the MinHash-LSH dedup pipeline (q17) so
  * optimization effort goes where the time is.
  * Usage: runMain graft.tools.ProfileLsh [sfDir]
  *
  * CAVEAT: stages 1–4 are an inline REPLICA of `Dedup.lshPairs`
  * internals, rebuilt here without the parallelism floor or the
  * persist (so each stage's marginal cost is visible in isolation);
  * they can drift from the operator as it evolves.  Stage 5 runs the
  * real q17 and is the authoritative end-to-end number — trust it
  * over the sum of the parts.
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(label: String)(f: => Any): Unit = {
      f
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label: ${ts.min}%.3f s (best of 3)")
    }

    val sh = array_sort(array_distinct(wordShingles(tokens(col("text")), 3)))
    val shingleTbl = docs.select(col("doc_id").as("id"), sh.as("sh"))
    time("1 shingles only      ")(shingleTbl.count())
    val hashed = shingleTbl.select(col("id"), shingleHashes(col("sh")).as("hs"))
    time("2 + md5 hashes       ")(hashed.count())
    val sig = hashed.select(Seq(col("id")) ++ minhashColsFromHashes(col("hs")): _*)
    time("3 + 16 minhash perms ")(sig.agg(sum(col("m0"))).collect())
    val bands = 8; val rows = MinhashA.size / bands
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band_id"),
        bandHash((0 until rows).map(r => col(s"m${b * rows + r}"))).as("bh"))
    }
    val banded = sig.select(col("id"), explode(array(bandCols: _*)).as("band"))
      .select(col("id"), col("band.band_id"), col("band.bh"))
    val cands = banded.select(col("band_id"), col("bh"), col("id").as("id_a"))
      .join(banded.select(col("band_id"), col("bh"), col("id").as("id_b")),
        Seq("band_id", "bh"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("4 + band join (no cache)")(cands.count())
    time("5 full q17           ") {
      graft.queries.PipelineQueries.all("q17_minhash_lsh")(spark, sfDir).count()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
