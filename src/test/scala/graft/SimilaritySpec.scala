package graft

import graft.ext.Similarity
import org.scalatest.funsuite.AnyFunSuite

/** Determinism contract of the IVF codebook: the whole point of the
  * exact-decimal dimension sums is that the trained centroids do not
  * depend on partitioning/merge order (which is also what lets the
  * DuckDB oracle replay them bit-identically). */
class SimilaritySpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private def synthEmb(n: Int, dims: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      (i.toLong, Seq.fill(dims)(rnd.nextFloat() * 2 - 1))
    }.toDF("vec_id", "embedding")
  }

  test("kmeansCodebook is bit-identical across input partitionings") {
    val df = synthEmb(200, 16)
    val a = Similarity.kmeansCodebook(df.repartition(1), 8, 2)
    val b = Similarity.kmeansCodebook(df.repartition(7), 8, 2)
    assert(a.size == 8 && a == b)
  }

  test("kmeansCodebook moves centroids off the seeds (it actually trains)") {
    val df = synthEmb(200, 16)
    val seeds = Similarity.kmeansCodebook(df, 8, 0)
    val trained = Similarity.kmeansCodebook(df, 8, 2)
    assert(seeds.map(_._1) == trained.map(_._1)) // stable cluster ids
    assert(seeds != trained)
  }

  test("ivfTopK returns k neighbors per probe with sims bounded by brute force") {
    val df = synthEmb(200, 16)
    val probes = Seq(1L, 2L, 3L)
    val bf = Similarity.bruteForceTopK(df, probes, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(df, probes, 3, 8, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(ivf.groupBy(_._1).forall(_._2.length == 3))
    // every IVF sim is a real cosine, so it can never beat the exact
    // brute-force top value for that probe
    val bfBest = bf.groupBy(_._1._1).map { case (p, m) => p -> m.values.max }
    ivf.foreach { case (p, _, s) => assert(s <= bfBest(p) + 1e-9) }
  }
}
