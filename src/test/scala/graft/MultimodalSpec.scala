package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def media() =
    Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")

  test("synthetic media table has the declared schema and real PNG magic") {
    val df = media()
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType == Multimodal.MetaSchema)
    val first = df.select("content").head.getAs[Array[Byte]](0)
    // PNG signature: 89 50 4E 47 0D 0A 1A 0A — the bytes really are PNG
    assert(first.take(4).map(_ & 0xff).toSeq == Seq(0x89, 0x50, 0x4e, 0x47))
  }

  test("ImageIO round trip recovers exact dims and pixel formula") {
    // encode with the closed-form pixels, decode with the REAL reader,
    // compare against an independent in-test computation
    val id = 42L; val w = 9; val h = 6
    val png = Multimodal.encodeGrayPng(w, h)((x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
    val d = Multimodal.decodeImage(png).get
    assert(d.width == w && d.height == h && d.channels == 1)
    val expectedSum = (for { x <- 0 until w; y <- 0 until h }
      yield (id * 31 + x * 7 + y * 13) % 256).sum
    assert(d.sumLuma == expectedSum)
    assert(math.abs(d.meanLuma - expectedSum.toDouble / (w * h)) < 1e-12)
  }

  test("decodeImage returns None for non-image bytes") {
    assert(Multimodal.decodeImage("not a png".getBytes).isEmpty)
    assert(Multimodal.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("resizeImage re-encodes to the target raster size, deterministically") {
    val png = Multimodal.encodeGrayPng(10, 8)((x, y) => (x * 5 + y * 3) % 256)
    val r1 = Multimodal.resizeImage(png, 4, 4).get
    val r2 = Multimodal.resizeImage(png, 4, 4).get
    assert(r1.toSeq == r2.toSeq) // deterministic bytes
    val d = Multimodal.decodeImage(r1).get
    assert(d.width == 4 && d.height == 4)
    // nearest-neighbor: out(0,0) must equal in(0,0)
    assert(d.lumaGrid.nonEmpty)
    assert(Multimodal.resizeImage("junk".getBytes, 4, 4).isEmpty)
  }

  test("withImageStats matches meta dims and appends pooled features") {
    val stats = Multimodal.withImageStats(media())
      .select(col("media_id"), col("width_px"), col("meta.width"),
        col("height_px"), col("meta.height"), col("channels"), size(col("features")))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getInt(1) == r.getInt(2), "decoded width == declared meta width")
      assert(r.getInt(3) == r.getInt(4), "decoded height == declared meta height")
      assert(r.getInt(5) == 1)
      assert(r.getInt(6) == Multimodal.FeatureDim)
    }
  }

  test("withFeatures appends deterministic luma grids in [0,255]") {
    val f1 = Multimodal.withFeatures(media()).select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.withFeatures(media()).select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2) // deterministic
    f1.values.foreach { v =>
      assert(v.length == Multimodal.FeatureDim)
      assert(v.forall(x => x >= 0f && x <= 255f))
    }
  }

  test("metadata-only query never touches content (column pruning)") {
    val plan = media().select("media_id", "meta.width")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("content") || plan.contains("ReadSchema"),
      "projection should prune the binary column")
  }

  test("WAV round trip recovers exact rate/channels/frames/peak/energy") {
    // encode with closed-form samples, decode with the REAL JDK
    // parser, compare against an independent in-test computation
    val id = 7L; val channels = 2; val rate = 16000; val frames = 25
    val samples = Array.tabulate[Short](frames * channels)(j =>
      (((id * 31L + j.toLong * 7919L) % 65536L) - 32768L).toShort)
    val wav = Multimodal.encodeWavPcm16(rate, channels, samples)
    // RIFF....WAVE magic: the bytes really are a WAV container
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val d = Multimodal.decodeAudio(wav).get
    assert(d.sampleRate == rate && d.channels == channels && d.nFrames == frames)
    assert(d.durationMs == frames * 1000L / rate)
    assert(d.peak == samples.map(s => math.abs(s.toInt)).max)
    assert(d.sumSq == samples.map(s => s.toLong * s).sum)
    assert(math.abs(d.rms - math.sqrt(d.sumSq.toDouble / (frames * channels))) < 1e-12)
  }

  test("24-bit and float WAV round trips recover exact stats in their units") {
    val channels = 2; val rate = 16000; val frames = 25
    val base = Array.tabulate[Int](frames * channels)(j =>
      (((7L * 31L + j.toLong * 7919L) % 65536L) - 32768L).toInt)
    // 24-bit: native units are the 16-bit samples scaled by 256
    val wav24 = Multimodal.encodeWavPcm24(rate, channels, base.map(_ * 256))
    val d24 = Multimodal.decodeAudio(wav24).get
    assert(d24.bits == 24 && d24.channels == channels && d24.nFrames == frames)
    assert(d24.peak == base.map(v => math.abs(v * 256)).max)
    assert(d24.sumSq == base.map(v => (v * 256L) * (v * 256L)).sum)
    // float: k/32768 samples decode back to exactly k (16-bit units)
    val wavF = Multimodal.encodeWavFloat32(rate, channels, base.map(_ / 32768f))
    val dF = Multimodal.decodeAudio(wavF).get
    assert(dF.bits == 32 && dF.channels == channels && dF.nFrames == frames)
    assert(dF.peak == base.map(math.abs).max)
    assert(dF.sumSq == base.map(v => v.toLong * v).sum)
    // windowed decode agrees with the whole-file decode on both
    for ((wav, whole) <- Seq((wav24, d24), (wavF, dF))) {
      val wins = Multimodal.decodeAudioWindows(wav, 4).get
      assert(wins.map(_.sumSq).sum == whole.sumSq)
      assert(wins.map(_.nSamples).sum == whole.nSamples)
      assert(wins.map(_.peak).max == whole.peak)
    }
  }

  test("decodeAudio returns None for non-audio bytes") {
    assert(Multimodal.decodeAudio("not a wav".getBytes).isEmpty)
    assert(Multimodal.decodeAudio(Array.emptyByteArray).isEmpty)
  }

  test("withAudioStats matches meta duration; audio meta kind is real") {
    val stats = Multimodal.withAudioStats(
      Multimodal.syntheticAudio(spark, "/root/testdata/sf0.001"))
      .select(col("media_id"), col("duration_ms"), col("meta.duration_ms"),
        col("meta.kind"), col("sample_rate"))
      .collect()
    assert(stats.nonEmpty)
    stats.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), "decoded duration == declared meta")
      assert(r.getString(3) == "audio")
      assert(Set(8000, 16000, 24000).contains(r.getInt(4)))
    }
  }

  test("decodeAudioWindows: per-channel crossings land in the later sample's window") {
    // stereo, winFrames = 2: channel 0 alternates sign every frame,
    // channel 1 stays positive — crossings come from channel 0 only,
    // and the frame-2 crossing (prev = frame 1) counts in window 1
    val samples = Array[Short](100, 50, -100, 60, 100, 70, -100, 80)
    val wav = Multimodal.encodeWavPcm16(8000, 2, samples)
    val wins = Multimodal.decodeAudioWindows(wav, 2).get
    assert(wins.map(_.winNo) == Seq(0, 1))
    assert(wins.map(_.nSamples) == Seq(4L, 4L))
    // window 0: frames 0,1 — one crossing (100 -> -100); window 1:
    // frames 2,3 — crossings (-100 -> 100 at frame 2, counted here,
    // and 100 -> -100 at frame 3)
    assert(wins.map(_.zeroCrossings) == Seq(1L, 2L),
      s"got ${wins.map(_.zeroCrossings)}")
    assert(wins.map(_.peak) == Seq(100, 100))
    assert(wins.map(_.sumSq) ==
      Seq(100L*100*2 + 50L*50 + 60L*60, 100L*100*2 + 70L*70 + 80L*80))
    // stats across windows must agree with the whole-file decode
    val whole = Multimodal.decodeAudio(wav).get
    assert(wins.map(_.sumSq).sum == whole.sumSq)
    assert(wins.map(_.nSamples).sum == whole.nSamples)
  }

  test("demuxFrames splits a concatenated PNG sequence byte-exactly") {
    val frames = (0 until 5).map(k =>
      Multimodal.encodeGrayPng(7, 5)((x, y) => (k * 17 + x * 7 + y * 13) % 256))
    val blob = frames.reduce(_ ++ _)
    val out = Multimodal.demuxFrames(blob)
    assert(out.length == 5)
    out.zip(frames).foreach { case (got, want) => assert(got.sameElements(want)) }
    // every demuxed frame decodes through the real image path
    out.zipWithIndex.foreach { case (f, k) =>
      val d = Multimodal.decodeImage(f).get
      assert(d.width == 7 && d.height == 5)
      assert(d.sumLuma == (for { x <- 0 until 7; y <- 0 until 5 }
        yield (k * 17 + x * 7 + y * 13) % 256).sum)
    }
  }

  test("demuxFrames splits MJPEG (concatenated baseline JPEG) correctly") {
    def jpeg(k: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(12, 9,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until 12).foreach(x => (0 until 9).foreach(y =>
        img.getRaster.setSample(x, y, 0, (k * 40 + x * 3 + y * 5) % 256)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val frames = (0 until 3).map(jpeg)
    val out = Multimodal.demuxFrames(frames.reduce(_ ++ _))
    assert(out.length == 3)
    out.zip(frames).foreach { case (got, want) => assert(got.sameElements(want)) }
    // JPEG is lossy, but dimensions decode exactly
    out.foreach { f =>
      val d = Multimodal.decodeImage(f).get
      assert(d.width == 12 && d.height == 9 && d.channels == 1)
    }
    // mixed-format stream: PNG frame between two JPEGs still splits
    val png = Multimodal.encodeGrayPng(4, 4)((x, y) => x + y)
    val mixed = Multimodal.demuxFrames(frames(0) ++ png ++ frames(1))
    assert(mixed.length == 3)
    assert(mixed(1).sameElements(png))
  }

  test("demuxFrames yields complete frames before a truncated tail") {
    val f0 = Multimodal.encodeGrayPng(5, 5)((x, y) => x * y)
    val f1 = Multimodal.encodeGrayPng(5, 5)((x, y) => x + y)
    val truncated = f0 ++ f1 ++ f0.take(f0.length / 2)
    val out = Multimodal.demuxFrames(truncated)
    assert(out.length == 2)
    assert(out(0).sameElements(f0) && out(1).sameElements(f1))
    assert(Multimodal.demuxFrames("not media at all".getBytes).isEmpty)
  }

  test("an un-demuxable container fails LOUDLY at ingest (upstream-transcode contract)") {
    // a minimal MP4 header: 4-byte box size + 'ftyp' + brand — the
    // shape every real MP4/MOV starts with
    val mp4 = Array[Byte](0, 0, 0, 24) ++ "ftypisom".getBytes("US-ASCII") ++
      Array.fill[Byte](12)(0)
    val ex = intercept[IllegalArgumentException] {
      Multimodal.demuxFramesStrict(mp4)
    }
    assert(ex.getMessage.contains("MP4/MOV"), ex.getMessage)
    assert(ex.getMessage.toLowerCase.contains("transcoded upstream"),
      ex.getMessage)
    // the strict guard passes decodable streams through unchanged...
    val png = Multimodal.encodeGrayPng(4, 3)((x, y) => (x * 7 + y) % 256)
    assert(Multimodal.demuxFramesStrict(png ++ png).length == 2)
    // ...and an empty stream is vacuously fine (no container to flag)
    assert(Multimodal.demuxFramesStrict(Array.emptyByteArray).isEmpty)
  }

  test("sampleIndices: all frames when short, even strides when long") {
    assert(Multimodal.sampleIndices(3, 4) == Seq(0, 1, 2))
    assert(Multimodal.sampleIndices(4, 4) == Seq(0, 1, 2, 3))
    assert(Multimodal.sampleIndices(6, 4) == Seq(0, 1, 3, 4))
    assert(Multimodal.sampleIndices(100, 4) == Seq(0, 25, 50, 75))
    assert(Multimodal.sampleIndices(0, 4).isEmpty)
    // strictly increasing (distinct) for every count > n
    (5 to 40).foreach { c =>
      val s = Multimodal.sampleIndices(c, 4)
      assert(s == s.distinct.sorted && s.length == 4, s"count=$c → $s")
    }
  }

  test("sampleFrames demuxes real sequences and keeps source frame numbers") {
    val vids = Multimodal.syntheticVideo(spark, "/root/testdata/sf0.001").limit(20)
      .persist()
    try {
      val frames = Multimodal.sampleFrames(vids, 4)
      // per video: min(frameCount, 4) rows, frame_no = source index
      val expected = vids.select(col("media_id"),
        (col("meta.duration_ms") / 40).cast("int").as("f")).collect()
        .map(r => r.getLong(0) -> math.min(r.getInt(1), 4)).toMap
      val got = frames.groupBy("media_id").count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected.map { case (k, v) => k -> v.toLong })
      // each sampled frame decodes and matches the closed-form pixels
      val stats = Multimodal.videoFrameStats(vids, 4)
        .select("media_id", "frame_no", "width_px", "height_px", "sum_luma")
        .collect()
      assert(stats.nonEmpty)
      stats.foreach { r =>
        val (id, k, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))
        val want = (for { x <- 0 until w; y <- 0 until h }
          yield (id * 31 + k * 17 + x * 7 + y * 13) % 256).sum
        assert(r.getLong(4) == want, s"media $id frame $k")
      }
    } finally vids.unpersist()
  }

  test("mediaNearDup runs end-to-end on features, not bytes") {
    val pairs = Multimodal.mediaNearDup(media(), minCos = -1.0, planes = 2)
    // with 2 planes = 4 buckets over ~500 docs, some pairs must land together
    assert(pairs.count() > 0)
  }
}
