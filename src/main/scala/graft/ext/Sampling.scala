package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines.
  *
  * Everything here keys on a content-stable hash of the row id
  * (md5-derived [[graft.functions.ColFns.h60]]), NOT on `rand()`:
  * the same row lands in the same split/sample on every run, on any
  * cluster, from any engine — which is what makes train/val/test
  * membership reproducible, joinable across derived tables, and
  * oracle-checkable.  All per-row codegen'd scalars: zero shuffle,
  * linear scans at any scale.
  */
object Sampling {

  /** Hash-bucket resolution for split fractions (1/10000). */
  val SplitMod: Long = 10000L

  private def hashBucket(idCol: Column): Column =
    h60(idCol.cast("string")) % SplitMod

  /** Assign each row a named split (e.g. train/val/test) by hash
    * bucket.  `fractions` must sum to 1 (±1e-9); boundaries are
    * cumulative-fraction thresholds over the 10000 hash buckets, so
    * split sizes are within 1e-4 of the requested fractions in
    * expectation and membership is deterministic in the id. */
  def hashSplit(df: DataFrame, idCol: String,
      fractions: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(fractions.nonEmpty, "need at least one split")
    require(math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must sum to 1, got ${fractions.map(_._2).sum}")
    val h = hashBucket(col(idCol))
    val thresholds = fractions.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * SplitMod))
    val expr = fractions.init.zip(thresholds.init) match {
      case Seq() => lit(fractions.head._1)
      case ((n0, _), t0) +: rest =>
        rest.foldLeft(when(h < lit(t0), lit(n0))) {
          case (c, ((nm, _), t)) => c.when(h < lit(t), lit(nm))
        }.otherwise(lit(fractions.last._1))
    }
    df.withColumn(splitCol, expr)
  }

  /** Deterministic ~`fraction` Bernoulli sample by id hash — the
    * reproducible twin of `df.sample(fraction)`. */
  def sample(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0)
    df.where(hashBucket(col(idCol)) < lit(math.round(fraction * SplitMod)))
  }

  /** Mixture-weighted (per-group-rate) sampling — the data-mixing
    * primitive: each row keeps with its GROUP's rate (e.g. upweight
    * curated sources, downweight crawl), decided by the same
    * deterministic id-hash threshold as [[sample]], so membership is
    * reproducible across runs/engines and joinable.  Unknown groups
    * fall back to `defaultRate`.  Per-row codegen'd scalar — zero
    * shuffle, the rate table folds into the expression as a literal
    * CASE. */
  def sampleByGroupRate(df: DataFrame, groupCol: String, idCol: String,
      rates: Map[String, Double], defaultRate: Double = 0.0): DataFrame = {
    require((defaultRate +: rates.values.toSeq).forall(r => r >= 0.0 && r <= 1.0),
      "rates must be in [0, 1]")
    val thresh = rates.foldLeft(lit(math.round(defaultRate * SplitMod))) {
      case (acc, (g, r)) =>
        when(col(groupCol) === g, lit(math.round(r * SplitMod))).otherwise(acc)
    }
    df.where(hashBucket(col(idCol)) < thresh)
  }

  /** Deterministic global corpus shuffle into `nShards` training
    * shards: shard = id-hash mod nShards, and a dense in-shard
    * position (1..shardSize) by ascending id hash — i.e. the corpus
    * in pseudo-random order, reproducible on any run/cluster/engine
    * (no `rand()`, no partition-count dependence).  This is the
    * "shuffle the corpus before training" step: write each shard
    * ordered by `pos` and readers stream examples in a fixed
    * hash-random order.
    *
    * Scale shape: ONE shuffle (hash-partition by shard) + an
    * in-partition sort for the dense rank — never a global sort.
    * Each shard must sort within one task (Spark's external sort
    * spills, so this is disk-bound, not memory-bound); size
    * `nShards` so a shard is ~1 GB at the target corpus (100 TB →
    * nShards ≈ 100k), which also matches the training-reader file
    * granularity. */
  def shuffleShard(df: DataFrame, idCol: String, nShards: Int,
      shardCol: String = "shard", posCol: String = "pos"): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val hvCol = s"__${posCol}_hv"
    // withColumn silently REPLACES an existing column — fail loudly
    // instead of overwriting caller data (or dropping it with the
    // temp hash column)
    Seq(shardCol, posCol, hvCol).foreach(c =>
      require(!df.columns.contains(c),
        s"shuffleShard output column '$c' already exists in the input"))
    df.withColumn(hvCol, h60(col(idCol).cast("string")))
      .withColumn(shardCol, col(hvCol) % nShards)
      .withColumn(posCol, org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(shardCol)).orderBy(col(hvCol).asc, col(idCol).asc)))
      .drop(hvCol)
  }

  /** Deterministic k-per-group sample: the k rows with the smallest
    * id hashes per group (ties broken by id).  Implemented as a
    * bounded priority-queue aggregation (CollectTopK, reverse=true):
    * map-side partials hold ≤ k ids, the shuffle carries
    * O(groups × k), and the picked ids broadcast back as a semi-join
    * — never a per-group window sort, never a shuffle of the full
    * rows.  The evaluation-set constructor for a 100 TB corpus.
    *
    * Broadcast guard: the pick table is |groups| × k rows — tiny for
    * human-scale group counts, but nothing stops a caller keying on a
    * high-cardinality column.  The pick table is persisted and
    * counted (one cheap extra job over the already-aggregated picks);
    * above `maxBroadcastPicks` the semi-join falls back to a shuffle
    * join with a logged note instead of OOMing the driver.  Release
    * the persisted picks via [[Dedup.unpersistInputsOf]] on the
    * result. */
  def samplePerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      k: Int, maxBroadcastPicks: Long = 4000000L): DataFrame = {
    val h = h60(col(idCol).cast("string"))
    val picks = df
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graftshim.Bridge
        .collectTopK(struct(h.as("h"), col(idCol).as("id")), k, reverse = true)
        .as("top"))
      .select(groupCols.map(col) :+ explode(col("top")).as("p"): _*)
      .select(groupCols.map(col) :+ col("p.id").as(idCol): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPicks = picks.count()
    val picksSide =
      if (nPicks <= maxBroadcastPicks) broadcast(picks)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"samplePerGroup: $nPicks picks exceed maxBroadcastPicks=" +
            s"$maxBroadcastPicks — falling back to a shuffle semi-join")
        picks
      }
    Dedup.registerCleanup(
      df.join(picksSide, groupCols :+ idCol, "left_semi"), picks)
  }
}
