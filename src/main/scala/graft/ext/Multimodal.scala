package graft.ext

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing for corpus pipelines: image/audio/video
  * travel as opaque `binary` columns with a typed metadata struct.
  *
  * The IMAGE codec is REAL: encode and decode run through
  * `javax.imageio` (PNG/BMP/GIF/JPEG readers+writers ship with the
  * JDK — zero extra dependencies), so decoded width/height/channels/
  * luma statistics are genuine raster facts, oracle-checkable because
  * the synthetic corpus images are built from a closed-form pixel
  * formula a SQL engine can replay (q29).  The only remaining fake is
  * VIDEO frame sampling ([[frameSampleStub]]) — the JDK has no video
  * demuxer; it is loudly documented below.
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

  /** Features = an 8×8 average-pooled luma grid (64 floats). */
  val GridDim = 8
  val FeatureDim: Int = GridDim * GridDim

  /** Raster facts read back out of the encoded bytes. */
  final case class Decoded(width: Int, height: Int, channels: Int,
      sumLuma: Long, lumaGrid: Array[Float]) {
    def meanLuma: Double = sumLuma.toDouble / (width.toLong * height)
  }

  // ImageIO's default scratch-file cache would have every executor
  // thread hitting java.io.tmpdir; in-memory streams only.
  javax.imageio.ImageIO.setUseCache(false)

  /** REAL decode via `javax.imageio.ImageIO.read`.  Luma is integer
    * math (band 0 for grayscale, Rec.601 integer weights for RGB) so
    * results are bit-deterministic across JVMs.  `None` for bytes no
    * installed reader understands. */
  def decodeImage(content: Array[Byte]): Option[Decoded] = {
    val img =
      // NonFatal, not just IOException: the JDK readers throw
      // ArrayIndexOutOfBounds/IllegalArgument/NegativeArraySize on
      // malformed-but-recognized media, and one corrupt row must not
      // kill the whole partition's task
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val r = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val bands = r.getNumBands
      var sum = 0L
      val cellSum = Array.ofDim[Long](GridDim * GridDim)
      val cellN = Array.ofDim[Int](GridDim * GridDim)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v =
            if (bands >= 3)
              (299 * r.getSample(x, y, 0) + 587 * r.getSample(x, y, 1) +
                114 * r.getSample(x, y, 2)) / 1000
            else r.getSample(x, y, 0)
          sum += v
          val c = (y * GridDim / h) * GridDim + (x * GridDim / w)
          cellSum(c) += v; cellN(c) += 1
          x += 1
        }
        y += 1
      }
      val grid = Array.tabulate(GridDim * GridDim) { i =>
        if (cellN(i) == 0) 0f else (cellSum(i).toDouble / cellN(i)).toFloat
      }
      Some(Decoded(w, h, bands, sum, grid))
    }
  }

  /** REAL encode: an 8-bit grayscale PNG via `ImageIO.write` (the
    * JDK's PNG writer, lossless — decode reads back exact samples). */
  def encodeGrayPng(width: Int, height: Int)(pixel: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { r.setSample(x, y, 0, pixel(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** REAL resize: decode, nearest-neighbor sample the raster (pure
    * integer index math — deterministic, unlike Graphics2D's
    * platform-tunable interpolation), re-encode as grayscale PNG.
    * `None` if the input doesn't decode. */
  def resizeImage(content: Array[Byte], w: Int, h: Int): Option[Array[Byte]] = {
    require(w > 0 && h > 0, s"resize target must be positive, got ${w}x$h")
    val img =
      // NonFatal for the same reason as decodeImage: malformed media
      // throws RuntimeExceptions from the JDK readers
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val r = img.getRaster
      val iw = img.getWidth; val ih = img.getHeight
      val bands = r.getNumBands
      Some(encodeGrayPng(w, h) { (x, y) =>
        val sx = x * iw / w; val sy = y * ih / h
        if (bands >= 3)
          (299 * r.getSample(sx, sy, 0) + 587 * r.getSample(sx, sy, 1) +
            114 * r.getSample(sx, sy, 2)) / 1000
        else r.getSample(sx, sy, 0)
      })
    }
  }

  /** STUB frame sampler — the ONE remaining fake in this module: the
    * JDK has no video demuxer, so a real implementation (pull I-frames
    * via a codec library) cannot exist in this environment.  The fake
    * slices the byte stream into n deterministic chunks; the Spark
    * plumbing around it (explode shape, schema, partition streaming)
    * is real. */
  def frameSampleStub(content: Array[Byte], n: Int): Seq[Array[Byte]] = {
    val stride = math.max(1, content.length / math.max(n, 1))
    (0 until n).map(i => content.slice(i * stride, i * stride + math.min(stride, 256)))
  }

  /** Decode every media row and append the raster facts + pooled-luma
    * feature vector — batch-shaped `mapPartitions` (one iterator pass
    * per partition, no per-row task overhead, constant memory).
    * Undecodable rows get null stats/features rather than failing the
    * batch. */
  def withImageStats(media: DataFrame, contentCol: String = "content"): DataFrame = {
    val schema = StructType(media.schema.fields ++ Seq(
      StructField("width_px", IntegerType, nullable = true),
      StructField("height_px", IntegerType, nullable = true),
      StructField("channels", IntegerType, nullable = true),
      StructField("sum_luma", LongType, nullable = true),
      StructField("mean_luma", DoubleType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = media.schema.fieldIndex(contentCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case Some(d) => Row.fromSeq(r.toSeq ++ Seq(d.width, d.height,
            d.channels, d.sumLuma, d.meanLuma, d.lumaGrid.toSeq))
          case None => Row.fromSeq(r.toSeq ++ Seq(null, null, null, null, null, null))
        }
      }
    }(enc)
  }

  /** Feature-only convenience (the r1-r3 surface, now REAL decode). */
  def withFeatures(media: DataFrame, contentCol: String = "content",
      featureCol: String = "features"): DataFrame = {
    val schema = StructType(media.schema.fields :+
      StructField(featureCol, ArrayType(FloatType, containsNull = false), nullable = true))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = media.schema.fieldIndex(contentCol)
    media.mapPartitions { rows =>
      rows.map { r =>
        decodeImage(r.getAs[Array[Byte]](idx)) match {
          case Some(d) => Row.fromSeq(r.toSeq :+ d.lumaGrid.toSeq)
          case None    => Row.fromSeq(r.toSeq :+ null)
        }
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

  /** Synthetic media derived from `documents`: REAL grayscale PNGs
    * whose dimensions and pixels are a closed-form function of the
    * document row —
    *   width  = len(text) %% 13 + 4, height = len(text) %% 11 + 4,
    *   pixel(x,y) = (doc_id·31 + x·7 + y·13) %% 256
    * — so a SQL oracle can recompute every decoded statistic without
    * an image library (q29's hash check), while the Spark side runs
    * the genuine ImageIO encode→decode round trip. */
  def syntheticMedia(spark: SparkSession, dir: String): DataFrame = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), length(col("text")).cast("int").as("len"))
    val enc = org.apache.spark.sql.Encoders.row(MediaSchema)
    docs.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0); val len = r.getInt(1)
        val w = len % 13 + 4; val h = len % 11 + 4
        val png = encodeGrayPng(w, h)((x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
        Row(id, png, Row("image", "png", w, h, null))
      }
    }(enc)
  }

  /** Media near-dup by feature cosine — reuses the Similarity
    * operator on the derived (small) feature vectors, never the raw
    * bytes.  Demonstrates the intended composition at scale. */
  def mediaNearDup(media: DataFrame, minCos: Double, planes: Int): DataFrame =
    Similarity.nearDupPairs(withFeatures(media).select(col("media_id"), col("features")),
      minCos, planes, FeatureDim, idCol = "media_id", vecCol = "features")
}
