package graft

import graft.ext.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("shuffleShard: dense 1..n positions per shard, exact row permutation") {
    val ids = (0L until 500L)
    val out = Sampling.shuffleShard(ids.toDF("id"), "id", 7).collect()
    assert(out.length == 500)
    // every input id appears exactly once (permutation, nothing dropped/duped)
    assert(out.map(_.getLong(0)).sorted.toSeq == ids)
    // positions are dense 1..shardSize within each shard
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val pos = rows.map(_.getInt(2)).sorted
      assert(pos.toSeq == (1 to rows.length))
    }
  }

  test("shuffleShard: assignment is independent of input partitioning") {
    val df1 = (0L until 300L).toDF("id").repartition(1)
    val df17 = (0L until 300L).toDF("id").repartition(17)
    val a = Sampling.shuffleShard(df1, "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    val b = Sampling.shuffleShard(df17, "id", 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("shuffleShard: in-shard order follows ascending id hash") {
    import graft.functions.ColFns
    val out = Sampling.shuffleShard((0L until 200L).toDF("id"), "id", 3)
      .withColumn("hv", ColFns.h60(col("id").cast("string")))
      .collect()
    out.groupBy(_.getLong(1)).foreach { case (_, rows) =>
      val byPos = rows.sortBy(_.getInt(2)).map(_.getLong(3))
      assert(byPos.toSeq == byPos.sorted.toSeq)
    }
  }

  test("shuffleShard rejects nShards <= 0") {
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(Seq(1L).toDF("id"), "id", 0)
    }
  }

  test("shuffleShard refuses to overwrite an existing output column") {
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(Seq((1L, 9L)).toDF("id", "shard"), "id", 4)
    }
    intercept[IllegalArgumentException] {
      Sampling.shuffleShard(Seq((1L, 9)).toDF("id", "pos"), "id", 4)
    }
  }
}
