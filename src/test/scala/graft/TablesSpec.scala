package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class TablesSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("events reader adapts to the stored ts encoding and yields timestamps") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType.typeName == "timestamp")
    val (lo, hi) = ev.agg(min("ts"), max("ts"))
      .as[(java.sql.Timestamp, java.sql.Timestamp)].collect().head
    assert(lo.before(hi))
  }

  test("eventTs dispatches on observed type: long nanos, ntz, ltz — losslessly") {
    import org.apache.spark.sql.types._
    val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z
    // legacy nanos-as-long shape
    val legacy = Seq(micros * 1000L + 789L).toDF("ts") // sub-µs nanos truncate
    val fromLong = legacy.select(Tables.eventTs(legacy).as("ts"))
    assert(fromLong.schema("ts").dataType == TimestampType)
    assert(fromLong.select(unix_micros(col("ts"))).as[Long].collect().head == micros)
    // TIMESTAMP_NTZ micros (current testdata shape); UTC session tz
    // makes the cast value-preserving
    val ntz = legacy.select(
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType).as("ts"))
    assert(ntz.schema("ts").dataType == TimestampNTZType)
    val fromNtz = ntz.select(Tables.eventTs(ntz).as("ts"))
    assert(fromNtz.schema("ts").dataType == TimestampType)
    assert(fromNtz.select(unix_micros(col("ts"))).as[Long].collect().head == micros)
    // already TimestampType: pass through untouched
    val ltz = legacy.select(timestamp_micros(expr("ts div 1000")).as("ts"))
    val fromLtz = ltz.select(Tables.eventTs(ltz).as("ts"))
    assert(fromLtz.select(unix_micros(col("ts"))).as[Long].collect().head == micros)
    // anything else fails loudly, not coerces silently
    val bad = Seq("x").toDF("ts")
    intercept[IllegalArgumentException](Tables.eventTs(bad))
  }

  test("eventTs long path: out-of-range magnitude fails loudly per row") {
    // a corpus that re-encodes ts as PLAIN MICROS (no logical type)
    // also surfaces as LongType — the old reader would silently
    // divide by 1000 and skew every event time 1000×; the guard must
    // raise instead
    val microsShaped = Seq(1700000000123456L).toDF("ts")
    val e = intercept[Exception](
      microsShaped.select(Tables.eventTs(microsShaped).as("ts")).collect())
    assert(e.getMessage.contains("epoch-nanos range"),
      s"magnitude guard must name the suspected drift: ${e.getMessage}")
    // in-range nanos still convert, nulls pass through
    val ok = Seq(Some(1700000000123456L * 1000L), None).toDF("ts")
    val out = ok.select(Tables.eventTs(ok).as("ts"))
      .select(unix_micros(col("ts"))).as[Option[Long]].collect().toSet
    assert(out == Set(Some(1700000000123456L), None))
  }

  test("adaptiveTable normalizes drifted physical schemas per column family") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft_adaptive").toString
    // ids shipped narrow (int32), money shipped decimal(12,2), text ok
    Seq((1, "a", "en", "web", 5), (2, "b", "de", "web", 7))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val docs = Tables.adaptiveTable(spark, dir, "documents")
    assert(docs.schema("doc_id").dataType == LongType)
    assert(docs.schema("n_chars").dataType == LongType)
    assert(docs.select(sum("doc_id")).as[Long].collect().head == 3L)
    // embeddings shipped float (today's corpus) → canonical double
    Seq((1L, Array(1.0f, 2.0f), 0)).toDF("vec_id", "embedding", "label")
      .write.parquet(s"$dir/embeddings.parquet")
    val emb = Tables.adaptiveTable(spark, dir, "embeddings")
    assert(emb.schema("embedding").dataType == ArrayType(DoubleType))
    assert(emb.select(col("embedding")(1)).as[Double].collect().head == 2.0)
    // lineitem money drifting to decimal(12,2): exact within a double
    spark.sql(
      """SELECT CAST(1 AS BIGINT) l_orderkey, CAST(1 AS BIGINT) l_partkey,
        |  CAST(1 AS BIGINT) l_suppkey, CAST(1 AS INT) l_linenumber,
        |  CAST(2 AS DOUBLE) l_quantity, CAST(1.25 AS DECIMAL(12,2)) l_extendedprice,
        |  CAST(0.05 AS DOUBLE) l_discount, CAST(0.01 AS DOUBLE) l_tax,
        |  'N' l_returnflag, 'O' l_linestatus,
        |  TIMESTAMP_NTZ '2024-01-02 00:00:00' l_shipdate
        |""".stripMargin).write.parquet(s"$dir/lineitem.parquet")
    val li = Tables.adaptiveTable(spark, dir, "lineitem")
    assert(li.schema("l_extendedprice").dataType == DoubleType)
    assert(li.select(col("l_extendedprice")).as[Double].collect().head == 1.25)
    // a NARROWING or reinterpreting drift fails loudly, per column
    Seq(("1", "t", "en", "web", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val narrowing = intercept[IllegalArgumentException](
      Tables.adaptiveTable(spark, dir, "documents"))
    assert(narrowing.getMessage.contains("documents.doc_id"))
    // a canonical column vanishing from the file fails loudly too
    Seq((1L, "t")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val missing = intercept[IllegalArgumentException](
      Tables.adaptiveTable(spark, dir, "documents"))
    assert(missing.getMessage.contains("missing canonical column"))
  }

  test("partitioned write enables partition pruning on read") {
    val dir = Files.createTempDirectory("graft_part").toString
    val docs = Tables.table(spark, "/root/testdata/sf0.001", "documents")
    Tables.writePartitioned(docs, dir, Seq("lang"))
    val back = spark.read.parquet(dir).where(col("lang") === "de")
    val plan = back.queryExecution.executedPlan.toString
    // partition filter must be a directory-level prune, not a data filter
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    assert(back.count() == docs.where(col("lang") === "de").count())
  }

  test("writeShards lands per-shard directories with files in pos order") {
    val dir = Files.createTempDirectory("graft-shards").toString
    val sharded = graft.ext.Sampling.shuffleShard(
      (0L until 400L).toDF("id"), "id", 5)
    Tables.writeShards(sharded, dir)
    // one directory per shard, partition pruning works
    val back = spark.read.parquet(dir)
    assert(back.count() == 400)
    assert(back.select("shard").distinct().count() == 5)
    // rows inside each shard's files are physically in ascending pos:
    // read each file INDIVIDUALLY (a whole-directory read could split
    // a file across partitions or interleave two files' row groups
    // under a different maxPartitionBytes, making inferred arrival
    // order flaky) and assert its own collected pos column is sorted
    import org.apache.spark.sql.functions.input_file_name
    val files = back.select(input_file_name().as("f"))
      .distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    files.foreach { f =>
      val pos = spark.read.parquet(f).select("pos")
        .collect().map(_.getInt(0))
      assert(pos.toSeq == pos.sorted.toSeq,
        s"file $f content must be pos-ordered")
    }
    // round trip reproduces the exact shuffled order
    val expect = sharded.select("id", "shard", "pos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val got = back.select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(got.toSeq == expect.toSeq)
  }

  test("repairShards: rewrites only affected shards, recomputes pos, " +
    "deletes fully-purged shards, idempotent, no-op on empty set") {
    import graft.functions.ColFns.h60
    val dir = Files.createTempDirectory("graft-shard-repair").toString
    val nShards = 7
    val docs = (0L until 300L).map(i => (i, s"text of $i"))
      .toDF("id", "text")
    Tables.writeShards(graft.ext.Sampling.shuffleShard(docs, "id", nShards),
      dir)
    // purge set A: a handful of ids — plus, separately, EVERY id of
    // one specific shard (the fully-purged-shard case)
    val shardOf = docs.select(col("id"),
        (h60(col("id").cast("string")) % nShards).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val victimShard = shardOf(0L)
    val wholeShard = shardOf.collect {
      case (id, s) if s == victimShard => id }.toSet
    val purgedIds = wholeShard ++ Set(1L, 2L, 3L)
    val purged = purgedIds.toSeq.toDF("id")
    val affected = Tables.repairShards(spark, dir, purged, "id", nShards)
    assert(affected.toSet ==
      purgedIds.map(id => shardOf(id)),
      "affected = h60(id) % nShards over the purged ids, nothing else")
    // the fully-purged shard's directory is GONE (absent == empty to
    // a Hive-layout reader, and stale files would be an erasure leak)
    assert(!Files.exists(java.nio.file.Paths.get(dir, s"shard=$victimShard")),
      "a shard whose every row is purged must be deleted")
    // repaired == fresh reshard of corpus-minus-purged, positions too
    val back = spark.read.parquet(dir)
      .select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val fresh = graft.ext.Sampling.shuffleShard(
        docs.where(!col("id").isin(purgedIds.toSeq: _*)), "id", nShards)
      .select(col("id"), col("shard"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(back.toSeq == fresh.toSeq,
      "repair must be row-identical to a fresh reshard of the live corpus")
    // idempotent: a second repair rewrites the same shards to the
    // same rows
    Tables.repairShards(spark, dir, purged, "id", nShards)
    val again = spark.read.parquet(dir)
      .select(col("id"), col("shard").cast("long"), col("pos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(again.toSeq == fresh.toSeq)
    // empty purge set: returns Nil before touching anything
    assert(Tables.repairShards(spark, dir,
      docs.where(lit(false)).select("id"), "id", nShards) == Nil)
  }

  test("compactPartitioned preserves a MULTI-LEVEL partition tree verbatim") {
    // q84 gates the single-level case; this pins two-level nesting
    // (lang=X/source=Y) — relative paths must mirror exactly and
    // every leaf must collapse, with content identical
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("tables_compactp").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      docs.repartition(4).write.mode("overwrite")
        .partitionBy("lang", "source").parquet(s"$base/in")
      def leaves(sub: String): Set[String] = {
        def walk(f: java.io.File, rel: String): Seq[(String, Int)] = {
          val parquet = Option(f.listFiles).getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet"))
          if (parquet > 0) Seq((rel, parquet))
          else Option(f.listFiles).getOrElse(Array.empty).filter(_.isDirectory)
            .flatMap(d => walk(d, if (rel.isEmpty) d.getName else s"$rel/${d.getName}")).toSeq
        }
        walk(new java.io.File(s"$base/$sub"), "").map(_._1).toSet
      }
      val in = leaves("in")
      assert(in.nonEmpty && in.forall(_.contains("/")), s"expected two-level leaves: $in")
      val (nLeaves, _) = graft.sources.Tables.compactPartitioned(
        spark, s"$base/in", s"$base/out", parallelism = 3)
      assert(nLeaves == in.size)
      assert(leaves("out") == in, "relative leaf paths must mirror verbatim")
      val cols = spark.read.parquet(s"$base/in").columns.sorted.map(col).toIndexedSeq
      def rows(sub: String): Seq[String] = spark.read.parquet(s"$base/$sub")
        .select(cols: _*).collect().map(_.toString).sorted.toSeq
      assert(rows("in") == rows("out"), "content must round-trip identically")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("compactPartitioned skips empty and metadata-only partition dirs") {
    // real ingest trees contain both shapes (aborted task dirs,
    // _SUCCESS-only commit leftovers); contract: dropped, not
    // mirrored — absent dir == empty dir to a Hive-layout reader
    import org.apache.spark.sql.functions.col
    val base = java.nio.file.Files.createTempDirectory("tables_compacte").toString
    try {
      val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      docs.repartition(2).write.mode("overwrite")
        .partitionBy("lang").parquet(s"$base/in")
      // an empty partition dir and a _SUCCESS-only one, beside real leaves
      assert(new java.io.File(s"$base/in/lang=empty").mkdirs())
      assert(new java.io.File(s"$base/in/lang=metaonly").mkdirs())
      assert(new java.io.File(s"$base/in/lang=metaonly/_SUCCESS").createNewFile())
      val dataLeaves = Option(new java.io.File(s"$base/in").listFiles)
        .getOrElse(Array.empty)
        .filter(d => d.isDirectory &&
          Option(d.listFiles).getOrElse(Array.empty)
            .exists(_.getName.endsWith(".parquet")))
        .map(_.getName).toSet
      assert(dataLeaves.nonEmpty)
      val (nLeaves, _) = graft.sources.Tables.compactPartitioned(
        spark, s"$base/in", s"$base/out", parallelism = 2)
      assert(nLeaves == dataLeaves.size,
        "only data-bearing leaves count toward the leaf total")
      assert(!new java.io.File(s"$base/out/lang=empty").exists(),
        "an empty partition dir must not be mirrored")
      assert(!new java.io.File(s"$base/out/lang=metaonly").exists(),
        "a _SUCCESS-only dir must not be mirrored")
      val outLeaves = Option(new java.io.File(s"$base/out").listFiles)
        .getOrElse(Array.empty).filter(_.isDirectory).map(_.getName).toSet
      assert(outLeaves == dataLeaves, "data-bearing leaves mirror verbatim")
      val cols = spark.read.parquet(s"$base/in").columns.sorted.map(col).toIndexedSeq
      def rows(sub: String): Seq[String] = spark.read.parquet(s"$base/$sub")
        .select(cols: _*).collect().map(_.toString).sorted.toSeq
      assert(rows("in") == rows("out"), "content must round-trip identically")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("compactPartitioned on a tree with no data anywhere is a no-op (0, 0)") {
    val base = java.nio.file.Files.createTempDirectory("tables_compact0").toString
    try {
      assert(new java.io.File(s"$base/in/lang=a").mkdirs())
      assert(new java.io.File(s"$base/in/_SUCCESS").createNewFile())
      assert(graft.sources.Tables.compactPartitioned(
        spark, s"$base/in", s"$base/out") == ((0, 0)))
      assert(!new java.io.File(s"$base/out").exists(), "nothing may be written")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles).getOrElse(Array.empty).foreach(rm)
        f.delete()
      }
      rm(new java.io.File(base))
    }
  }

  test("bucketed tables join without any shuffle exchange") {
    val warehouse = Files.createTempDirectory("graft_wh").toString
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val orders = Tables.table(spark, "/root/testdata/sf0.001", "orders")
      val customer = Tables.table(spark, "/root/testdata/sf0.001", "customer")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
      // a previous JVM's catalog is gone but its warehouse dirs remain;
      // managed-table creation refuses existing locations
      val wh = spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:")
      Seq("b_orders", "b_customer").foreach { t =>
        val d = new java.io.File(wh, t)
        if (d.exists()) {
          def rm(f: java.io.File): Unit = {
            if (f.isDirectory) f.listFiles().foreach(rm)
            f.delete()
          }
          rm(d)
        }
      }
      Tables.writeBucketed(orders.withColumnRenamed("o_custkey", "ck"),
        "b_orders", 4, Seq("ck"), Seq("ck"))
      Tables.writeBucketed(customer.withColumnRenamed("c_custkey", "ck"),
        "b_customer", 4, Seq("ck"), Seq("ck"))
      val joined = spark.table("b_orders").join(spark.table("b_customer"), "ck")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan) // co-located: no shuffle
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
