package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for corpus pipelines: image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct.
  *
  * The Spark side — schema, partition-sized batch processing, column
  * pruning (metadata readable without touching bytes), feature
  * schema — is real and tested.  The codec layer is a clearly-marked
  * STUB (this environment has no image/audio libraries): decode is a
  * deterministic fake derived from the content hash, so pipelines are
  * testable end-to-end and swapping in a real codec is a one-function
  * change.
  *
  * Scale design: media rows are large, so all transforms are
  * per-partition streaming (`mapPartitions`, constant memory), never
  * `collect`; metadata-only queries never deserialize `content`
  * (parquet column pruning); derived features are small fixed-width
  * vectors so downstream joins/aggregations shuffle features, not
  * bytes.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque bytes. */
  val MetaSchema: StructType = StructType(Seq(
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("format", StringType, nullable = false),    // png|wav|mp4|...
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", MetaSchema, nullable = false)))

  val FeatureDim = 16

  /** STUB codec: a real implementation would decode `content` with an
    * image/audio library.  The fake is deterministic in the bytes
    * (md5-seeded), returns a unit-norm FeatureDim vector — enough to
    * drive dedup/similarity pipelines end-to-end in tests. */
  def decodeFeaturesStub(content: Array[Byte]): Array[Float] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(content)
    val raw = Array.tabulate(FeatureDim) { i =>
      // two hash bytes per dim, signed, scaled to [-1, 1)
      ((d(2 * i % 16) << 8 | (d((2 * i + 1) % 16) & 0xff)).toFloat / 32768f)
    }
    val n = math.sqrt(raw.map(x => x.toDouble * x).sum).toFloat
    if (n == 0f) raw else raw.map(_ / n)
  }

  /** STUB resize: a real implementation re-encodes pixels; the fake
    * truncates/pads bytes to emulate the size change deterministically. */
  def resizeStub(content: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val target = math.max(16, w * h / 64)
    if (content.length >= target) content.take(target)
    else content ++ Array.fill(target - content.length)(0.toByte)
  }

  /** STUB frame sampler: a real implementation pulls I-frames; the
    * fake slices the byte stream into n deterministic chunks. */
  def frameSampleStub(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val stride = math.max(1, content.length / math.max(n, 1))
    (0 until n).map(i => content.slice(i * stride, i * stride + math.min(stride, 256)))
  }

  /** Extract features per media row — batch-shaped `mapPartitions`
    * (the Scala analog of a vectorized UDF: one iterator pass per
    * partition, no per-row task overhead, constant memory). */
  def withFeatures(media: DataFrame, contentCol: String = "content",
      featureCol: String = "features"): DataFrame = {
    val schema = StructType(media.schema.fields :+
      StructField(featureCol, ArrayType(FloatType, containsNull = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = media.schema.fieldIndex(contentCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        val feats = decodeFeaturesStub(r.getAs[Array[Byte]](idx))
        Row.fromSeq(r.toSeq :+ feats.toSeq)
      }
    }(enc)
  }

  /** Explode videos into sampled frames: (media_id, frame_no, frame). */
  def sampleFrames(media: DataFrame, n: Int): DataFrame = {
    val out = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_no", IntegerType, nullable = false),
      StructField("frame", BinaryType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(out)
    val idIdx = media.schema.fieldIndex("media_id")
    val cIdx = media.schema.fieldIndex("content")
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        frameSampleStub(r.getAs[Array[Byte]](cIdx), n).zipWithIndex.map {
          case (f, i) => Row(r.getLong(idIdx), i, f)
        }
      }
    }(enc)
  }

  /** Deterministic synthetic media table derived from `documents`
    * (text bytes stand in for encoded media) — lets multimodal
    * pipelines run against driver testdata with no binary fixtures. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        lit("image").as("kind"), lit("fake").as("format"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")).as("meta"))
  }

  /** Media near-dup by feature cosine — reuses the Similarity
    * operator on the derived (small) feature vectors, never the raw
    * bytes.  Demonstrates the intended composition at scale. */
  def mediaNearDup(media: DataFrame, minCos: Double, planes: Int): DataFrame =
    Similarity.nearDupPairs(withFeatures(media).select(col("media_id"), col("features")),
      minCos, planes, FeatureDim, idCol = "media_id", vecCol = "features")
}
