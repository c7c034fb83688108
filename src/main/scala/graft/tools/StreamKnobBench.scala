package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B the RocksDB state-store knobs on the b9/b10 bench workloads
  * (Bench.scala's streaming blocks), so config changes to the bench
  * are justified by measurement, not lore.
  * Usage: runMain graft.tools.StreamKnobBench [trackRows] [noDataBatches]
  */
object StreamKnobBench {
  def main(args: Array[String]): Unit = {
    val trackRows = if (args.nonEmpty) args(0) else "true"
    val noData = if (args.length > 1) args(1) else "true"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true")
      .config(
        "spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows",
        trackRows)
      .config("spark.sql.streaming.noDataMicroBatches.enabled", noData)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"[knob] trackTotalNumberOfRows=$trackRows noDataMicroBatches=$noData")

    def deleteRec(p: java.nio.file.Path): Unit = {
      def sweep(): Unit = {
        val walked = java.nio.file.Files.walk(p)
        try walked.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
        finally walked.close()
      }
      var left = 5
      while (left > 0)
        try { sweep(); left = 0 }
        catch { case _: java.io.IOException =>
          left -= 1; if (left > 0) Thread.sleep(300) }
    }
    val doneCkpts = scala.collection.mutable.ArrayBuffer.empty[java.nio.file.Path]
    def drainCkpts(): Unit = { doneCkpts.foreach(deleteRec); doneCkpts.clear() }

    def best5(f: => Unit): Double = {
      f; f
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }

    import spark.implicits._
    val rows = 200000; val batches = 10; val keys = 1000
    def b9run(): Unit = {
      implicit val sq = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("kb9_ckpt")
      val q = graft.streaming.StreamingAgg.runningFoldTws(in.toDS(), graft.core.Folds.sumD)
        .writeStream.format("noop").outputMode("update")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        val per = rows / batches
        var i = 0
        while (i < batches) {
          val base = i.toLong * per
          in.addData((0 until per).map(j => ((base + j) % keys, (j % 97).toDouble)))
          q.processAllAvailable()
          i += 1
        }
      } finally { q.stop(); doneCkpts += ckpt }
    }
    def b10run(): Unit = {
      implicit val sq = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("kb10_ckpt")
      val q = graft.streaming.StreamingAgg
        .statefulDedupFirstTws(in.toDS(), "0 seconds", ttlMs = 30000L)
        .writeStream.format("noop").outputMode("append")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        val per = rows / batches
        var i = 0
        while (i < batches) {
          val base = i.toLong * per
          in.addData((0 until per).map { j =>
            val n = base + j
            (n % keys, new java.sql.Timestamp(1700000000000L + n * 10L),
              (j % 97).toDouble)
          })
          q.processAllAvailable()
          i += 1
        }
      } finally { q.stop(); doneCkpts += ckpt }
    }
    val b9 = best5 { b9run() }; drainCkpts()
    println(f"[knob] b9 = $b9%.3f s")
    val b10 = best5 { b10run() }; drainCkpts()
    println(f"[knob] b10 = $b10%.3f s")
    // row-count sanity: the dedup must emit the same rows under any knob
    locally {
      implicit val sq = spark.sqlContext
      val in = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, java.sql.Timestamp, Double)]
      val ckpt = java.nio.file.Files.createTempDirectory("kchk_ckpt")
      val q = graft.streaming.StreamingAgg
        .statefulDedupFirstTws(in.toDS(), "0 seconds", ttlMs = 30000L)
        .writeStream.format("memory").queryName("kchk").outputMode("append")
        .option("checkpointLocation", ckpt.toString).start()
      try {
        val per = rows / batches
        var i = 0
        while (i < batches) {
          val base = i.toLong * per
          in.addData((0 until per).map { j =>
            val n = base + j
            (n % keys, new java.sql.Timestamp(1700000000000L + n * 10L),
              (j % 97).toDouble)
          })
          q.processAllAvailable()
          i += 1
        }
        val cnt = spark.table("kchk").count()
        val sig = spark.table("kchk")
          .selectExpr("sum(_1)", "sum(_3)", "count(distinct _1)")
          .collect()(0).toString
        println(s"[knob] b10 emitted rows = $cnt sig = $sig")
      } finally { q.stop(); doneCkpts += ckpt; drainCkpts() }
    }
    spark.stop()
  }
}
