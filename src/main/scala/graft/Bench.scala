package graft

import graft.core._
import graft.queries.RefQueries
import graft.simple.Simple
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: the B1–B5 set from /root/repo/BASELINE.md.
  *
  * B1/B2 transliterate the reference's own criterion workloads
  * (`/root/reference/bench/MapReduce.hs:47-52,280-306`, n=100,000,
  * fixed seed) onto the typed engine; B3–B5 run Q01/Q03/Q08 on the
  * `SPARK_GRAFT_SF_DIR` parquet.  Prints ONE JSON line.
  * Timing: 2 warmups + best of 5 (per BASELINE.md).
  */
object Bench {

  /** 2 warmups (JIT + code cache) then best-of-5.  The workloads are
    * deterministic, so wall-clock variance is one-sided interference
    * noise (GC pauses, co-scheduled processes, page cache misses) —
    * the MINIMUM is the consistent estimator of engine cost, where a
    * median still carries whatever load the machine happened to be
    * under (r2's driver run measured 3.9 s for a query that takes
    * 0.23 s quiet). */
  private def best5(f: => Unit): Double = {
    f; f // warmup
    val ts = (1 to 5).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    ts.min
  }

  /** 1-minute load average from /proc/loadavg (0.0 if unreadable).
    * Stamped before/after each best-of-5 block so a reader of the
    * JSON can tell co-scheduled machine load from a real regression
    * without re-running (r3's driver run measured b6 at 14 s under
    * load-avg ~10; the same binary measures 1.7 s quiet). */
  private def loadAvg(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split("\\s+").head.toDouble
    catch { case _: Throwable => 0.0 }

  /** best5 plus the load average observed around the block. */
  private def best5Loaded(f: => Unit): (Double, Double, Double) = {
    val l0 = loadAvg()
    val t = best5(f)
    (t, l0, loadAvg())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // NOTE: sf0.1 parquet files are single-row-group, so lowering
      // spark.sql.files.maxPartitionBytes cannot parallelize the scan
      // (measured: it only adds empty-split overhead)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // B1 input: 100k (label, value), labels 'A'..'Z', values 1..100
    // (reference bench/MapReduce.hs:47-52; Char → 1-char String).
    val rnd = new scala.util.Random(42)
    val charPairs = (1 to 100000).map { _ =>
      (('A' + rnd.nextInt(26)).toChar.toString, rnd.nextInt(100) + 1)
    }
    // 8 partitions: 100k in-memory rows over 32 tasks is pure
    // scheduling overhead; partition count is sized to data, not cores
    val b1ds = spark.createDataset(charPairs).repartition(8).cache()
    b1ds.count()

    // B2 input: 100k ragged maps, A=l, B=l%47, C=l%13 iff l even
    // (reference bench/MapReduce.hs:280-290).
    val rnd2 = new scala.util.Random(43)
    val ragged = (1 to 100000).map { _ =>
      val l = rnd2.nextInt(100) + 1
      val base = Map("A" -> l, "B" -> l % 47)
      if (l % 2 == 0) base + ("C" -> (l % 13)) else base
    }
    val b2ds = spark.createDataset(ragged).repartition(8).cache()
    b2ds.count()

    val b1 = best5Loaded {
      Simple.hashableMapReduce(b1ds,
        Unpack.Filter[(String, Int)](_._2 % 2 == 0),
        Assign.of[(String, Int), String, Double](_._1)(_._2.toDouble),
        Reduce.fromFold[String, Double, Double](Folds.mean)).count()
    }
    val b2 = best5Loaded {
      Simple.hashableMapReduce(b2ds,
        Unpack.Explode[Map[String, Int], (Int, Double)] { m =>
          for { a <- m.get("A").iterator; b <- m.get("B").iterator
                c <- m.get("C").iterator } yield (c, (a + b).toDouble)
        },
        Assign.of[(Int, Double), Int, Double](_._1)(_._2),
        Reduce.fromFold[Int, Double, Double](Folds.mean)).count()
    }
    val b3 = best5Loaded { RefQueries.q01(spark, sfDir).count() }
    val b4 = best5Loaded { RefQueries.q03(spark, sfDir).count() }
    val b5 = best5Loaded { RefQueries.q08(spark, sfDir).count() }
    // B6-B8: the expensive pipeline operators (MinHash-LSH dedup,
    // n-gram Jaccard near-dup, LSH-bucketed ANN).  q17/q19 persist
    // their prep tables; clear the cache inside the timed body so
    // every iteration measures a cold operator, not a warm cache.
    import graft.queries.PipelineQueries
    val b6 = best5Loaded {
      PipelineQueries.q17(spark, sfDir).count(); spark.catalog.clearCache()
    }
    val b7 = best5Loaded {
      PipelineQueries.q19(spark, sfDir).count(); spark.catalog.clearCache()
    }
    val b8 = best5Loaded { PipelineQueries.q15b(spark, sfDir).count() }

    // B9: the streaming surface's tracked number — runningFoldTws
    // (transformWithState, RocksDB state store, named ValueState)
    // drains 200k rows in 10 micro-batches over 1,000 keys.  Reported
    // in seconds like every bench; rows/sec = 200k / b9.  TimeMode is
    // None (no TTL), so processAllAvailable terminates (with a TTL
    // the clock must advance and the query never quiesces).
    //
    // Production sizing knobs, both load-bearing here: state
    // partitions sized to KEY CARDINALITY, not cores (32 partitions ×
    // 10 batches = 320 RocksDB commits per run for 1k keys — measured
    // 9.9 s; 8 partitions right-sizes it), and RocksDB changelog
    // checkpointing (per-batch delta upload instead of full
    // snapshots — the setting a real cluster runs with).
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    spark.conf.set(
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    spark.conf.set("spark.sql.shuffle.partitions", "8") // b9 runs last; state sizing
    val b9rows = 200000; val b9batches = 10; val b9keys = 1000
    def deleteRec(p: java.nio.file.Path): Unit = {
      val walked = java.nio.file.Files.walk(p)
      try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
        .forEach(f => java.nio.file.Files.deleteIfExists(f))
      finally walked.close()
    }
    def b9run(): Unit = {
      implicit val sq = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("b9_ckpt")
      val q = graft.streaming.StreamingAgg.runningFoldTws(in.toDS(), Folds.sumD)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        val per = b9rows / b9batches
        var i = 0
        while (i < b9batches) {
          val base = i.toLong * per
          in.addData((0 until per).map(j => ((base + j) % b9keys, (j % 97).toDouble)))
          q.processAllAvailable()
          i += 1
        }
      } finally { q.stop(); deleteRec(ckpt) }
    }
    val b9 = best5Loaded { b9run() }

    val qs = Seq("b1_charpair_mean" -> b1, "b2_ragged_mean" -> b2,
      "b3_q01_group_sum" -> b3, "b4_q03_multi_agg" -> b4, "b5_q08_mean" -> b5,
      "b6_q17_minhash_lsh" -> b6, "b7_q19_ngram_jaccard" -> b7,
      "b8_q15b_ann_lsh" -> b8, "b9_running_fold_tws" -> b9)
    val qjson = qs.map { case (k, (v, _, _)) => s""""$k":$v""" }.mkString("{", ",", "}")
    // per-bench [loadavg-before, loadavg-after]: a bench whose load
    // numbers are near the core count was measured under contention
    val ljson = qs.map { case (k, (_, l0, l1)) => s""""$k":[$l0,$l1]""" }.mkString("{", ",", "}")
    val loadMax = qs.map { case (_, (_, l0, l1)) => math.max(l0, l1) }.max
    val total = qs.map(_._2._1).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"load_1m":$ljson,"load_max":$loadMax,"sf":"$sfDir"}""")
    spark.stop()
  }
}
