package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Scale design: the probe set is small and broadcast; the corpus side
  * streams.  Brute force is the exact baseline (one broadcast-nested-
  * loop join, no shuffle of the corpus); the sign-LSH variant prunes
  * candidates to matching hyperplane-signature buckets first, so the
  * per-probe work drops from O(corpus) to O(bucket).
  *
  * Hyperplanes are deterministic ±1 matrices derived from md5 on the
  * DRIVER and embedded as literals — zero per-row hash cost, and the
  * DuckDB oracle embeds the identical literals (see OracleSql).
  */
object Similarity {

  /** md5-hex of a string, computed driver-side (same bits as the SQL
    * md5 functions). */
  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic ±1 weight for (plane, dim): parity of the 60-bit
    * md5 prefix of "plane_dim" — the driver-side twin of ColFns.h60. */
  def hyperplane(plane: Int, dims: Int): Seq[Double] =
    (0 until dims).map { d =>
      val h = java.lang.Long.parseLong(md5Hex(s"${plane}_$d").take(15), 16)
      if (h % 2 == 0) 1.0 else -1.0
    }

  /** Sign-LSH bucket id: bit j = [ dot(w_j, v) > 0 ]. */
  def signBucket(vecD: Column, planes: Int, dims: Int): Column =
    (0 until planes).map { j =>
      val proj = aggregate(
        zip_with(vecD, typedLit(hyperplane(j, dims)), (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Exact top-k neighbors for each probe id: broadcast the probes,
    * one pass over the corpus, per-probe top-k via window.  Output:
    * (vec_id, neighbor_id, sim) with sim = cosine rounded to 6. */
  def bruteForceTopK(emb: DataFrame, probeIds: Seq[Long], k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withNorm = emb.select(col(idCol), vecD(col(vecCol)).as("v"))
      .withColumn("nrm", normD(col("v")))
    val probes = withNorm.where(col(idCol).isInCollection(probeIds))
      .select(col(idCol).as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))
    val cos = cosineWithNorms(dotD(col("pv"), col("v")), col("pn"), col("nrm"))
    val scored = withNorm.join(broadcast(probes), col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol).as("neighbor_id"), cos.as("cos"))
    topK(scored, k)
  }

  /** LSH-bucketed approximate top-k: candidates must share the probe's
    * sign-LSH bucket.  Same output shape as [[bruteForceTopK]]. */
  def lshTopK(emb: DataFrame, probeIds: Seq[Long], k: Int, planes: Int,
      dims: Int, idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withB = emb.select(col(idCol), vecD(col(vecCol)).as("v"))
      .withColumn("nrm", normD(col("v")))
      .withColumn("bkt", signBucket(col("v"), planes, dims))
    val probes = withB.where(col(idCol).isInCollection(probeIds))
      .select(col(idCol).as("probe_id"), col("v").as("pv"),
        col("nrm").as("pn"), col("bkt").as("pbkt"))
    val cos = cosineWithNorms(dotD(col("pv"), col("v")), col("pn"), col("nrm"))
    val scored = withB.join(broadcast(probes),
        col("bkt") === col("pbkt") && col(idCol) =!= col("probe_id"))
      .select(col("probe_id"), col(idCol).as("neighbor_id"), cos.as("cos"))
    topK(scored, k)
  }

  /** Deterministic cosine k-means codebook: seeds = the `nCentroids`
    * lowest-id vectors, then `iters` Lloyd rounds of (argmax-cosine
    * assignment, per-dimension mean update).  Returns
    * `(cid, centroid, norm)` triples.
    *
    * Determinism (so the DuckDB oracle replays the codebook
    * bit-identically from the table alone): assignment ties break to
    * the lowest cid; each dimension's sum is taken over
    * DECIMAL(38,15) — exact, hence independent of partition/merge
    * order — and only divided (as double) at the end; empty clusters
    * keep their previous centroid; centroid norms are left-to-right
    * sums of squares (the same association as the SQL `list_reduce`).
    *
    * Scale shape: each round is one shuffle-free codegen'd argmax
    * projection over the corpus plus one (nCentroids × dims)-group
    * aggregation; only nCentroids × dims means ever reach the
    * driver.  `iters` is fixed and small — at real scale you'd train
    * the codebook on a sample, which this is the exact kernel of. */
  def kmeansCodebook(emb: DataFrame, nCentroids: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : Seq[(Long, Seq[Double], Double)] = {
    val nn = emb.select(col(idCol).as("id"), vecD(col(vecCol)).as("v"))
    def seqNorm(v: Seq[Double]): Double =
      math.sqrt(v.foldLeft(0.0)((a, x) => a + x * x))
    var cents: Seq[(Long, Seq[Double], Double)] =
      nn.where(col("id") < nCentroids).collect()
        .map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
        .toIndexedSeq
        .sortBy(_._1).map { case (cid, cv) => (cid, cv, seqNorm(cv)) }
    for (_ <- 1 to iters) {
      val cell = assignCell(col("v"), normD(col("v")), cents)
      val dimMeans = nn
        .select(cell.as("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg((sum(col("x").cast("decimal(38,15)")).cast("double")
          / count(lit(1))).as("m"))
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      val byCid = dimMeans.groupBy(_._1).map { case (cid, rows) =>
        cid -> rows.sortBy(_._2).map(_._3).toSeq
      }
      cents = cents.map { case (cid, oldCv, _) =>
        val cv = byCid.getOrElse(cid, oldCv)
        (cid, cv, seqNorm(cv))
      }
    }
    cents
  }

  /** Argmax-cosine cell id over literal centroids: highest cosine,
    * ties to the lowest cid — one codegen'd projection, no shuffle. */
  private[ext] def assignCell(v: Column, nrm: Column,
      cents: Seq[(Long, Seq[Double], Double)]): Column =
    array_max(array(cents.map { case (cid, cv, cnrm) =>
      struct((dotD(v, typedLit(cv)) / (nrm * lit(cnrm))).as("c"),
        lit(-cid).as("n"))
    }.toIndexedSeq: _*)).getField("n") * -1

  /** IVF-flat approximate top-k: a coarse quantizer of `nCentroids`
    * centroids from [[kmeansCodebook]] (`kmeansIters` = 0 degrades to
    * the raw lowest-id seeds), every vector assigned to its
    * nearest-cosine cell, probes searching only their `nProbe`
    * nearest cells.
    *
    * Scale shape: the codebook is tiny by construction and embedded
    * as literals, so cell assignment is ONE shuffle-free codegen'd
    * projection over the corpus (nCentroids native dot products per
    * row); the corpus then shuffles once by cell id, and each probe
    * touches ~corpus×nProbe/nCentroids candidates. */
  def ivfTopK(emb: DataFrame, probeIds: Seq[Long], k: Int, nCentroids: Int,
      nProbe: Int, idCol: String = "vec_id", vecCol: String = "embedding",
      kmeansIters: Int = 2): DataFrame = {
    val spark = emb.sparkSession
    val nn = emb.select(col(idCol).as("id"), vecD(col(vecCol)).as("v"))
      .withColumn("nrm", normD(col("v")))
    val centLocal = kmeansCodebook(emb, nCentroids, kmeansIters, idCol, vecCol)
    import spark.implicits._
    val cent = centLocal.toDF("cid", "cv", "cnrm")
    val asg = nn.withColumn("cid", assignCell(col("v"), col("nrm"), centLocal))
    // probes rank centroids and keep their nProbe nearest cells —
    // the window is bounded at |probes| × nCentroids rows, broadcast
    val pc = nn.where(col("id").isInCollection(probeIds))
      .crossJoin(broadcast(cent))
      .select(col("id").as("probe_id"), col("cid"),
        (dotD(col("v"), col("cv")) / (col("nrm") * col("cnrm"))).as("ccos"),
        col("v").as("pv"), col("nrm").as("pn"))
    val cwin = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("ccos").desc, col("cid").asc)
    val pcells = pc.withColumn("rn", row_number().over(cwin))
      .where(col("rn") <= nProbe).select("probe_id", "cid", "pv", "pn")
    val scored = asg.join(broadcast(pcells), Seq("cid"))
      .where(col("id") =!= col("probe_id"))
      .select(col("probe_id"), col("id").as("neighbor_id"),
        cosineWithNorms(dotD(col("pv"), col("v")), col("pn"), col("nrm")).as("cos"))
    topK(scored, k)
  }

  /** Semantic dedup (SemDeDup-style): k-means cells as the blocking
    * key, exact within-cell cosine ≥ `minCos` as the duplicate edge,
    * connected components as the transitive closure — every vector
    * labeled with its duplicate cluster's minimum id (keep = the rows
    * where id == component).
    *
    * Scale shape: cell assignment is one shuffle-free codegen'd
    * projection (the codebook is literal); the pair join shuffles the
    * corpus ONCE by cell id and compares only within cells
    * (Σcell², with cell sizes ~corpus/nCentroids — at real scale you
    * raise nCentroids to keep cells bounded); the closure runs over
    * the duplicate EDGES only, which are a tiny fraction of the
    * corpus.  Never an all-pairs cross join. */
  def semanticClusters(emb: DataFrame, minCos: Double, nCentroids: Int,
      kmeansIters: Int, idCol: String = "vec_id", vecCol: String = "embedding")
      : DataFrame = {
    val cents = kmeansCodebook(emb, nCentroids, kmeansIters, idCol, vecCol)
    val nn = emb.select(col(idCol).as("id"), vecD(col(vecCol)).as("v"))
      .withColumn("nrm", normD(col("v")))
      .withColumn("cid", assignCell(col("v"), col("nrm"), cents))
    val l = nn.select(col("cid"), col("id").as("id_a"), col("v").as("va"),
      col("nrm").as("na"))
    val r = nn.select(col("cid"), col("id").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"))
    val cos = cosineWithNorms(dotD(col("va"), col("vb")), col("na"), col("nb"))
    val pairs = l.join(r, Seq("cid")).where(col("id_a") < col("id_b"))
      .where(cos >= minCos)
      .select(col("id_a"), col("id_b"))
    Components.connectedComponents(pairs, "id_a", "id_b",
      emb.select(col(idCol)), idCol)
  }

  /** Embedding near-duplicate pairs: sign-LSH blocking then exact
    * cosine ≥ `minCos`.  Never an all-pairs cross join. */
  def nearDupPairs(emb: DataFrame, minCos: Double, planes: Int, dims: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val withB = emb.select(col(idCol).as("id"), vecD(col(vecCol)).as("v"))
      .withColumn("nrm", normD(col("v")))
      .withColumn("bkt", signBucket(col("v"), planes, dims))
    val l = withB.select(col("bkt"), col("id").as("id_a"), col("v").as("va"), col("nrm").as("na"))
    val r = withB.select(col("bkt"), col("id").as("id_b"), col("v").as("vb"), col("nrm").as("nb"))
    val cos = cosineWithNorms(dotD(col("va"), col("vb")), col("na"), col("nb"))
    l.join(r, Seq("bkt")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), cos.as("cos"))
      .where(col("cos") >= minCos)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }

  /** Per-probe top-k as a bounded AGGREGATION, not a window sort: one
    * hash aggregate whose buffer is a k-bounded priority queue
    * (Catalyst `CollectTopK`), so map-side partials already hold ≤ k
    * candidates and the shuffle carries O(probes × k) rows.  The
    * row_number-window shape this replaces shuffled every scored
    * candidate into at most |probes| partitions and fully sorted each
    * — at corpus scale, parallelism collapses to the probe count and
    * one hot partition sorts ~the corpus.
    *
    * Selection order: cos descending, ties to the lowest neighbor_id
    * — encoded as the k largest `(cos, -neighbor_id)` structs under
    * field-wise ordering. */
  private[ext] def topK(scored: DataFrame, k: Int): DataFrame = {
    val item = struct(col("cos").as("cos"), (-col("neighbor_id")).as("nn"))
    scored.groupBy(col("probe_id"))
      .agg(org.apache.spark.sql.graftshim.Bridge.collectTopK(item, k).as("top"))
      .select(col("probe_id").as("vec_id"), explode(col("top")).as("p"))
      .select(col("vec_id"), (-col("p.nn")).as("neighbor_id"),
        round(col("p.cos"), 6).as("sim"))
  }
}
