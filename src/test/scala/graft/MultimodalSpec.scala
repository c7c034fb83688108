package graft

import graft.ext.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def media() =
    Multimodal.syntheticMedia(spark, "/root/testdata/sf0.001")

  test("synthetic media table has the declared schema") {
    val df = media()
    assert(df.schema("content").dataType.typeName == "binary")
    assert(df.schema("meta").dataType == Multimodal.MetaSchema)
    assert(df.count() > 0)
  }

  test("withFeatures appends deterministic unit-norm vectors") {
    val f1 = Multimodal.withFeatures(media()).select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    val f2 = Multimodal.withFeatures(media()).select("media_id", "features")
      .as[(Long, Seq[Float])].collect().toMap
    assert(f1 == f2) // deterministic
    f1.values.foreach { v =>
      assert(v.length == Multimodal.FeatureDim)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-4)
    }
  }

  test("metadata-only query never touches content (column pruning)") {
    val plan = media().select("media_id", "meta.width")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("content") || plan.contains("ReadSchema"),
      "projection should prune the binary column")
  }

  test("sampleFrames explodes to n frames per row") {
    val frames = Multimodal.sampleFrames(media().limit(5), 4)
    assert(frames.count() == 20)
    assert(frames.groupBy("media_id").count().select(max("count")).as[Long].head == 4L)
  }

  test("mediaNearDup runs end-to-end on features, not bytes") {
    val pairs = Multimodal.mediaNearDup(media(), minCos = -1.0, planes = 2)
    // with 2 planes = 4 buckets over ~500 docs, some pairs must land together
    assert(pairs.count() > 0)
  }
}
