package graft

import graft.ext.{AnnIndex, IndexLifecycle, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnnIndexSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val Dims = 8
  /** Deterministic synthetic embeddings with distinct directional
    * clusters (so cells are meaningful) and enough spread per cluster
    * (so within-cell ranking is non-trivial). */
  private def vectors(n: Int): Seq[(Long, Seq[Double])] =
    (0L until n.toLong).map { id =>
      val base = (id % 5).toInt
      val v = (0 until Dims).map { d =>
        val anchor = if (d % 5 == base) 4.0 else 0.5
        anchor + 0.3 * math.sin((id * 31 + d * 7).toDouble)
      }
      (id, v)
    }

  private def dropAnn(names: String*): Unit =
    for (n <- names; sfx <- Seq("_cells", "_codebook", "_batches"))
      graft.sources.Tables.dropWithLocation(spark, s"$n$sfx")

  test("index-served IVF equals ivfTopK bit-for-bit on the same corpus") {
    val emb = vectors(120).toDF("vec_id", "embedding")
    val name = "annspec_rt"
    try {
      AnnIndex.writeAnnIndex(emb, "vec_id", "embedding", name,
        nCentroids = 8, kmeansIters = 2, buckets = 4)
      val probes = Seq(3L, 17L, 42L)
      val want = Similarity.ivfTopK(emb, probes, k = 5, nCentroids = 8,
          nProbe = 3, kmeansIters = 2)
        .collect().map(_.toSeq).toSet
      val got = AnnIndex.annTopKFromIndex(spark, name, probes, k = 5,
          nProbe = 3)
        .collect().map(_.toSeq).toSet
      assert(want.nonEmpty && got == want)
      // cell-literal ceiling fallback: past maxLiteralCells the
      // pruning literal is skipped (the candidate join still
      // restricts the rows) — same results
      val gotFb = AnnIndex.annTopKFromIndex(spark, name, probes, k = 5,
          nProbe = 3, maxLiteralCells = 0)
        .collect().map(_.toSeq).toSet
      assert(gotFb == want)
    } finally dropAnn(name)
  }

  test("frozen-codebook increments: two batches + replay equal one batch; " +
      "compaction changes nothing and replays no-op across the boundary") {
    val all = vectors(150)
    val name = "annspec_inc"
    val one = "annspec_one"
    try {
      def slice(lo: Long, hi: Long) =
        all.filter(v => v._1 >= lo && v._1 < hi).toDF("vec_id", "embedding")
      // both indexes train the quantizer on the SAME bootstrap slice
      AnnIndex.writeAnnIndex(slice(0, 60), "vec_id", "embedding", name,
        nCentroids = 8, kmeansIters = 2, buckets = 4)
      AnnIndex.writeAnnIndex(slice(0, 60), "vec_id", "embedding", one,
        nCentroids = 8, kmeansIters = 2, buckets = 4)
      // one lands the rest in a single batch, the other in two + a replay
      AnnIndex.appendAnnBatch(slice(60, 150), 0L, "vec_id", "embedding", one, 4)
      assert(AnnIndex.ingestAnnBatch(slice(60, 100), 0L, "vec_id", "embedding", name, 4))
      assert(AnnIndex.ingestAnnBatch(slice(100, 150), 1L, "vec_id", "embedding", name, 4))
      assert(!AnnIndex.ingestAnnBatch(slice(60, 100), 0L, "vec_id", "embedding", name, 4))
      val probes = Seq(5L, 77L, 131L)
      def probe(n: String) = AnnIndex.annTopKFromIndex(spark, n, probes,
        k = 6, nProbe = 3).collect().map(_.toSeq).toSet
      val want = probe(one)
      assert(want.nonEmpty && probe(name) == want)
      AnnIndex.compactAnnIndex(spark, name)
      assert(spark.table(s"${name}_cells").select("batch_id").distinct()
        .collect().map(_.getLong(0)).toSeq ==
        Seq(IndexLifecycle.compactedBatchId))
      assert(probe(name) == want, "compaction must not change any bit")
      // replay ACROSS the boundary: only the marker prevents a
      // double-ingest now that the partition is folded away
      val rows = spark.table(s"${name}_cells").count()
      assert(!AnnIndex.ingestAnnBatch(slice(100, 150), 1L, "vec_id", "embedding", name, 4))
      assert(spark.table(s"${name}_cells").count() == rows)
      assert(probe(name) == want)
    } finally dropAnn(name, one)
  }

  test("an unmarked in-flight batch survives the fold and replays as a replace") {
    val all = vectors(100)
    val name = "annspec_flight"
    try {
      def slice(lo: Long, hi: Long) =
        all.filter(v => v._1 >= lo && v._1 < hi).toDF("vec_id", "embedding")
      AnnIndex.writeAnnIndex(slice(0, 50), "vec_id", "embedding", name,
        nCentroids = 8, kmeansIters = 1, buckets = 4)
      // half-append: the cells land, the marker never does
      AnnIndex.appendAnnBatch(slice(50, 100), 0L, "vec_id", "embedding", name, 4)
      AnnIndex.compactAnnIndex(spark, name)
      assert(spark.table(s"${name}_cells").select("batch_id").distinct()
        .collect().map(_.getLong(0)).toSet ==
        Set(IndexLifecycle.compactedBatchId, 0L),
        "unmarked in-flight partition must pass through the fold")
      val rows = spark.table(s"${name}_cells").count()
      // the replay replaces the surviving partition and lands the marker
      assert(AnnIndex.ingestAnnBatch(slice(50, 100), 0L, "vec_id", "embedding", name, 4))
      assert(spark.table(s"${name}_cells").count() == rows)
    } finally dropAnn(name)
  }

  test("incremental pair emission covers the one-shot within-cell pair set " +
      "exactly once across a disjoint batch sequence") {
    val all = vectors(120)
    val name = "annspec_pairs"
    try {
      def slice(lo: Long, hi: Long) =
        all.filter(v => v._1 >= lo && v._1 < hi).toDF("vec_id", "embedding")
      AnnIndex.writeAnnIndex(slice(0, 40), "vec_id", "embedding", name,
        nCentroids = 8, kmeansIters = 2, buckets = 4)
      val minCos = 0.9
      def pairsOf(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // bootstrap-internal pairs off the stored cells
      val cells0 = spark.table(s"${name}_cells")
      import graft.functions.ColFns._
      val l = cells0.select(col("cid"), col("id").as("id_a"),
        col("v").as("va"), col("nrm").as("na"))
      val r = cells0.select(col("cid"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      var got = pairsOf(l.join(r, Seq("cid")).where(col("id_a") < col("id_b"))
        .where(cosineWithNorms(dotD(col("va"), col("vb")),
          col("na"), col("nb")) >= minCos)
        .select(col("id_a"), col("id_b")))
      for ((lo, hi, bid) <- Seq((40L, 80L, 0L), (80L, 120L, 1L))) {
        val batchPairs = pairsOf(AnnIndex.semanticPairsAgainstIndex(
          slice(lo, hi), "vec_id", "embedding", name, minCos))
        assert(batchPairs.intersect(got).isEmpty,
          "a pair must be emitted exactly once across batches")
        got ++= batchPairs
        assert(AnnIndex.ingestAnnBatch(slice(lo, hi), bid, "vec_id",
          "embedding", name, 4))
      }
      // one-shot reference: within-cell pairs over the final cells
      val cellsAll = spark.table(s"${name}_cells")
      val la = cellsAll.select(col("cid"), col("id").as("id_a"),
        col("v").as("va"), col("nrm").as("na"))
      val ra = cellsAll.select(col("cid"), col("id").as("id_b"),
        col("v").as("vb"), col("nrm").as("nb"))
      val want = pairsOf(la.join(ra, Seq("cid"))
        .where(col("id_a") < col("id_b"))
        .where(cosineWithNorms(dotD(col("va"), col("vb")),
          col("na"), col("nb")) >= minCos)
        .select(col("id_a"), col("id_b")))
      assert(want.nonEmpty && got == want)
    } finally dropAnn(name)
  }

  test("a crash between cells drop and stage rename is repaired by recovery") {
    val name = "annspec_crash"
    try {
      AnnIndex.writeAnnIndex(vectors(80).toDF("vec_id", "embedding"),
        "vec_id", "embedding", name, nCentroids = 8, kmeansIters = 1,
        buckets = 4)
      val probes = Seq(2L, 40L)
      def probe() = AnnIndex.annTopKFromIndex(spark, name, probes, k = 4,
        nProbe = 2).collect().map(_.toSeq).toSet
      val want = probe()
      val cells = s"${name}_cells"
      val stage = s"${cells}__cstage"
      spark.table(cells).write.partitionBy("batch_id")
        .bucketBy(4, "cid").format("parquet").saveAsTable(stage)
      graft.sources.Tables.dropWithLocation(spark, cells)
      intercept[Exception] { spark.table(cells).count() }
      assert(AnnIndex.recoverAnnCompaction(spark, name))
      assert(probe() == want)
      assert(!AnnIndex.recoverAnnCompaction(spark, name))
    } finally dropAnn(name)
  }
}
