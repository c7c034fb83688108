package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    topKPickJoin(df, groupCols, idCol,
      struct(h.as("h"), col(idCol).as("id")), k, reverse = true,
      maxBroadcastPicks, "samplePerGroup")
  }

  /** Keep at most `k` rows per group, picked by DESCENDING `rankCol`
    * (ties broken by ascending id) — the per-domain / per-source cap
    * every crawl pipeline applies so one giant domain can't dominate
    * the corpus.  Same bounded-top-k + broadcast-back shape as
    * [[samplePerGroup]]: map-side partials hold ≤ k entries, the
    * shuffle carries O(groups × k), the full rows never move for the
    * ranking — never a per-group window sort.  `rankCol` must be
    * deterministic in the row (e.g. a rounded quality score) for the
    * pick to be reproducible. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], idCol: String,
      rankCol: Column, k: Int, maxBroadcastPicks: Long = 4000000L): DataFrame = {
    requireNumericId(df, idCol, "capPerGroup")
    // natural struct order, reverse=false keeps the k LARGEST
    // (rank, -id) pairs = highest rank, then smallest id
    topKPickJoin(df, groupCols, idCol,
      struct(rankCol.as("r"), (-col(idCol)).as("nid"), col(idCol).as("id")),
      k, reverse = false, maxBroadcastPicks, "capPerGroup")
  }

  /** The descending-then-ascending tie-break negates the id, which is
    * only an order-inversion for NUMERIC ids — a string id would cast
    * to a null double and silently break the documented tie rule
    * (unlike [[samplePerGroup]], whose all-ascending struct works for
    * any orderable id). */
  private def requireNumericId(df: DataFrame, idCol: String,
      op: String): Unit = {
    val dt = df.schema(idCol).dataType
    require(dt.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op requires a numeric id column for its (desc, id asc) " +
        s"tie-break; '$idCol' is $dt")
  }

  /** Shared machinery: bounded top-k pick per group (struct item whose
    * LAST field is the id), picks broadcast back as a semi-join. */
  private def topKPickJoin(df: DataFrame, groupCols: Seq[String],
      idCol: String, item: Column, k: Int, reverse: Boolean,
      maxBroadcastPicks: Long, opName: String): DataFrame = {
    val picks = df
      .groupBy(groupCols.map(col): _*)
      .agg(org.apache.spark.sql.graftshim.Bridge
        .collectTopK(item, k, reverse).as("top"))
      .select(groupCols.map(col) :+ explode(col("top")).as("p"): _*)
      .select(groupCols.map(col) :+ col("p.id").as(idCol): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPicks = picks.count()
    val picksSide =
      if (nPicks <= maxBroadcastPicks) broadcast(picks)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"$opName: $nPicks picks exceed maxBroadcastPicks=" +
            s"$maxBroadcastPicks — falling back to a shuffle semi-join")
        picks
      }
    Dedup.registerCleanup(
      df.join(picksSide, groupCols :+ idCol, "left_semi"), picks)
  }

  /** Exact scale factor of [[prioritySample]]'s uniform deviate:
    * 2^60 as a double (a power of two, so the constant and every
    * multiplication by it are exact). */
  private val TwoPow60: Double = 1.152921504606846976e18

  /** Deterministic weighted sample WITHOUT replacement of size ≤ k —
    * priority sampling (Duffield–Lund–Thorup, JACM 54(6) 2007): each
    * row draws a uniform `u = (h60(id)+1) / 2^60` and gets priority
    * `q = w / u`; the k highest-priority rows are the sample, and
    * `w_hat = max(w, tau)` (tau = the (k+1)-th priority, 0 when the
    * input fits entirely) is an unbiased per-row estimator of the
    * row's weight contribution — `sum(w_hat)` over the sample
    * estimates `sum(w)` over the corpus.  The weighted analog of
    * [[sample]]: upweights long/important rows, reproducible in the
    * id on any engine (the priority arithmetic is single-rounded IEEE
    * ops — one multiply by an exact power of two, one divide — so any
    * IEEE-754 engine computes bit-identical priorities).
    *
    * Scale shape: one narrow projection, then a bounded top-(k+1)
    * aggregation — map-side partials hold ≤ k+1 entries, ONE merge of
    * O(partitions × k) items, never a global sort.  Rows with
    * non-positive weight get non-positive priority and are chosen
    * only if fewer than k+1 positive rows exist.
    *
    * Returns (idCol, weightCol, `pri`, `w_hat`) for the selected
    * rows; semi-join on idCol to recover full rows. */
  def prioritySample(df: DataFrame, idCol: String, weightCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireNumericId(df, idCol, "prioritySample")
    finishPriorityTopK(
      df.select(priorityItem(col(idCol), col(weightCol)).as("it"))
        .agg(org.apache.spark.sql.graftshim.Bridge
          .collectTopK(col("it"), k + 1, reverse = false).as("arr")),
      "arr", idCol, weightCol, k)
  }

  /** The per-row item [[prioritySample]] aggregates: `struct(pri,
    * -id, id, w)` whose NATURAL descending order is (priority desc,
    * id asc).  Exposed so a streamed maintenance of the same sample
    * (see [[priorityTopKFold]]) runs the bit-identical priority
    * arithmetic — the two single-rounded IEEE ops documented on
    * [[prioritySample]]. */
  def priorityItem(idCol: Column, weightCol: Column): Column = {
    val u = (h60(idCol.cast("string")) + lit(1L)).cast("double")
    val pri = weightCol.cast("double") * lit(TwoPow60) / u
    struct(pri.as("pri"), (-idCol).as("nid"), idCol.as("id"),
      weightCol.as("w"))
  }

  /** Shared tail of the batch and streamed priority-sample paths:
    * `df` holds ONE row whose `arrCol` is the ≤ k+1 best
    * [[priorityItem]]s in any order (a heap's, a fold buffer's);
    * emits the k selected rows with `tau` = the (k+1)-th priority
    * (0 when the input fit entirely) folded into the unbiased
    * `w_hat = max(w, tau)` estimator.  Factored out so the two
    * engines cannot drift in the estimator arithmetic. */
  def finishPriorityTopK(df: DataFrame, arrCol: String, idName: String,
      weightName: String, k: Int, keep: Seq[String] = Nil): DataFrame = {
    val kp = keep.map(col)
    df.select(kp :+ sort_array(col(arrCol), asc = false).as("arr"): _*)
      .select(kp ++ Seq(col("arr"),
        when(size(col("arr")) === k + 1,
          element_at(col("arr"), k + 1).getField("pri"))
          .otherwise(lit(0.0)).as("tau")): _*)
      .select(kp ++ Seq(explode(slice(col("arr"), 1, k)).as("p"), col("tau")): _*)
      .select(kp ++ Seq(col("p.id").as(idName), col("p.w").as(weightName),
        col("p.pri").as("pri"),
        greatest(col("p.w").cast("double"), col("tau")).as("w_hat")): _*)
  }

  /** STRATIFIED [[prioritySample]]: an independent weighted-without-
    * replacement sample of ≤ `k` rows per group, each with its own
    * per-group threshold `tau` folded into the unbiased `w_hat` —
    * "sample k docs per source, upweighted by length, estimator
    * included", the per-stratum twin of the global sample.  Same
    * priority arithmetic ([[priorityItem]]), same bounded shape as
    * [[capPerGroup]]: map-side partials hold ≤ k+1 items per group,
    * the shuffle carries O(groups × k) — never a per-group window
    * sort.  Returns (groupCols…, idCol, weightCol, `pri`,
    * `w_hat`). */
  def prioritySamplePerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(groupCols.nonEmpty, "need at least one group column")
    requireNumericId(df, idCol, "prioritySamplePerGroup")
    finishPriorityTopK(
      df.select(groupCols.map(col) :+
          priorityItem(col(idCol), col(weightCol)).as("it"): _*)
        .groupBy(groupCols.map(col): _*)
        .agg(org.apache.spark.sql.graftshim.Bridge
          .collectTopK(col("it"), k + 1, reverse = false).as("arr")),
      "arr", idCol, weightCol, k, keep = groupCols)
  }

  /** Bounded per-partition state for a STREAMED priority sample: the
    * [[graft.core.Folds.topK]](k+1) fold over [[priorityItem]] tuples
    * (pri, -id, id, w — Long-typed ids/weights), buffer under a
    * Catalyst product encoder so the streaming state store holds a
    * typed row, not a Kryo blob.  Drop it into a GLOBAL streaming
    * aggregation via [[graft.streaming.StreamingAgg.foldUdaf]]
    * (Complete/Update mode) and finish the final array with
    * [[finishPriorityTopK]]: after any prefix of micro-batches the
    * state is the exact batch sample of the rows seen so far —
    * selection commutes with streaming because top-k states are
    * mergeable.  Per-trigger cost: map-side partials ≤ k+1 items,
    * ONE O(partitions × k) merge — the same scale shape as the batch
    * aggregation, maintained incrementally. */
  def priorityTopKFold(k: Int): graft.core.Fold.Aux[
      (Double, Long, Long, Long),
      List[(Double, Long, Long, Long)],
      List[(Double, Long, Long, Long)]] = {
    require(k > 0, s"k must be positive, got $k")
    graft.core.Fold.withEncoder(
      graft.core.Folds.topK[(Double, Long, Long, Long)](k + 1),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[
        List[(Double, Long, Long, Long)]]())
  }

  /** Calibrate per-group sampling rates to hit a target MIXTURE under
    * a total weight budget, then apply them deterministically — the
    * "50 % web, 30 % books, 20 % code" data-mixing step.  For each
    * group g with target share t_g and observed weight mass W_g, the
    * keep rate is `min(1, t_g × budget / W_g)` (a group without
    * enough mass contributes all it has — no other group absorbs its
    * shortfall; re-run with renormalized targets if that matters).
    * Rates quantize to 1/10000 hash buckets exactly like [[sample]],
    * so membership is reproducible and joinable.  Groups absent from
    * `targets` are dropped (rate 0).
    *
    * Scale shape: one bounded per-group aggregation (≤ |groups| rows,
    * driver-reduced — the same bounded-collect contract as
    * [[takeByBudget]]'s histogram) + one codegen'd filter scan; the
    * corpus never shuffles. */
  def calibrateMixture(df: DataFrame, groupCol: String, idCol: String,
      weightCol: String, targets: Map[String, Double],
      budget: Long): DataFrame = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(targets.values.forall(t => t >= 0.0 && t <= 1.0),
      "target shares must be in [0, 1]")
    require(df.schema(groupCol).dataType ==
        org.apache.spark.sql.types.StringType,
      s"calibrateMixture groups by a string column; '$groupCol' is " +
        s"${df.schema(groupCol).dataType}")
    val mass = df.groupBy(col(groupCol))
      .agg(sum(col(weightCol).cast("long")).as("w"))
      .collect()
      .map { r =>
        // loud, named failures over a bare NPE: a null group value or
        // an all-null weight group is corrupt input, not a rate of 0
        require(!r.isNullAt(0),
          s"calibrateMixture: null value in group column '$groupCol'")
        require(!r.isNullAt(1),
          s"calibrateMixture: group '${r.getString(0)}' has no non-null " +
            s"'$weightCol' values — cannot derive a keep rate")
        r.getString(0) -> r.getLong(1)
      }.toMap
    val rates = targets.flatMap { case (g, t) =>
      mass.get(g).map { w =>
        g -> (if (w <= 0L) 0.0 else math.min(1.0, t * budget / w))
      }
    }
    sampleByGroupRate(df, groupCol, idCol, rates)
  }

  /** Greedy quality-ordered selection under a total weight budget —
    * "take the best documents until the token budget is spent",
    * WITHOUT a global sort.  Rows are bucketed by
    * `floor(score × buckets)` (scores in [0, 1]); a ≤ buckets+1-row
    * histogram (driver-reduced, like a k-means centroid collect)
    * finds the threshold bucket; whole buckets above it are kept with
    * a codegen'd filter.  The ONE boundary bucket is then REFINED
    * recursively: re-histogram it at `buckets`× finer score
    * resolution (bucket × buckets², then × buckets³, …), each level
    * keeping its whole above-threshold sub-buckets, until the
    * residual sub-bucket holds ≤ `maxSortRows` rows — only THAT
    * residual is sorted (score desc, id asc) for the exact greedy
    * prefix under the remaining budget.  Refinement self-tunes the
    * sorted fraction: the knob no longer decides how much data one
    * task sorts (with the old single-level shape, 100 TB / 1000
    * buckets put ~100 GB through one external sort).  Equivalent to
    * the full greedy scan in (score desc, id asc) order keeping the
    * longest PREFIX whose running weight total stays ≤ `budget` —
    * the scan stops at the first row that no longer fits (rows are
    * atomic; no backfilling from lower-score rows).
    *
    * Refinement stops early on two honest limits: when a level fails
    * to SHRINK the residual (score ties at this resolution — finer
    * histograms can't split equal scores; the window's id tie-break
    * is then the only order left) and when the next scale would pass
    * double's 2^53 integer ceiling (`floor(score × scale)` beyond
    * that can't be exact).  In both cases the window falls back to
    * the current residual, which is the pre-refinement behavior.
    *
    * Scale shape: one scan per refinement level (levels are
    * log_buckets(n / maxSortRows) + 1 — two levels at 10^12 rows with
    * the defaults; persist the narrow (id, weight, score) projection
    * when scans are expensive, as q97 does) + one bounded histogram
    * per level; the only sort touches ≤ `maxSortRows` rows
    * (ties/precision caveat above).  Returns the selected rows with
    * the input schema unchanged. */
  def takeByBudget(df: DataFrame, idCol: String, weightCol: String,
      scoreCol: Column, budget: Long, buckets: Int = 1000,
      maxSortRows: Long = 4000000L): DataFrame =
    takeByBudgetStats(df, idCol, weightCol, scoreCol, budget, buckets,
      maxSortRows)._1

  /** Test seam for [[takeByBudget]]: also returns (residualRows = the
    * exact row count the final window sorts, taken from the finest
    * histogram's count column — 0 when everything fits; finestScale =
    * the bucket scale the refinement reached). */
  private[graft] def takeByBudgetStats(df: DataFrame, idCol: String,
      weightCol: String, scoreCol: Column, budget: Long, buckets: Int,
      maxSortRows: Long): (DataFrame, Long, Long) = {
    require(budget >= 0, s"budget must be non-negative, got $budget")
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    require(maxSortRows > 0, s"maxSortRows must be positive, got $maxSortRows")
    var scale = buckets.toLong
    var undecided = df
    var keptParts = List.empty[DataFrame]
    var remaining = budget
    var prevCnt = Long.MaxValue
    var residual: Option[(DataFrame, Long)] = None
    var done = false
    while (!done) {
      val b = floor(scoreCol * scale).cast("long")
      // ≤ buckets+1 rows per level: a bounded reduce, same
      // driver-side contract as the k-means centroid collect
      // (Similarity.scala); count(1) rides along so the residual size
      // is known WITHOUT an extra job
      val hist = undecided.groupBy(b.as("__bb"))
        .agg(sum(col(weightCol).cast("long")).as("w"),
          count(lit(1)).as("cnt"))
        .collect()
        .map { r =>
          // a null bucket means a null score; a null sum means the
          // bucket's weights were all null — both are corrupt input
          // that would otherwise surface as a bare NPE here (or as
          // rows silently matching neither branch below)
          require(!r.isNullAt(0),
            s"takeByBudget: null score value (bucket) in the input")
          require(!r.isNullAt(1),
            s"takeByBudget: bucket ${r.getLong(0)} has no non-null " +
              s"'$weightCol' values")
          (r.getLong(0), r.getLong(1), r.getLong(2))
        }
        .sortBy(-_._1)
      var pre = 0L
      var threshold = 0L
      var cnt = 0L
      var i = 0
      var open = true
      while (open && i < hist.length) {
        val (bucket, w, c) = hist(i)
        if (pre + w <= remaining) { pre += w; i += 1 }
        else { threshold = bucket; cnt = c; open = false }
      }
      if (open) { // everything still undecided fits the budget
        keptParts ::= undecided
        done = true
      } else {
        keptParts ::= undecided.where(b > threshold)
        val boundary = undecided.where(b === threshold)
        remaining -= pre
        if (cnt <= maxSortRows || cnt >= prevCnt ||
            scale > (1L << 53) / buckets) {
          residual = Some((boundary, cnt))
          done = true
        } else {
          undecided = boundary
          prevCnt = cnt
          scale *= buckets
        }
      }
    }
    val above = keptParts.reduce(_ unionByName _)
    residual match {
      case None => (above, 0L, scale)
      case Some((boundary, cnt)) =>
        // only the finest residual sorts — ≤ maxSortRows rows unless
        // ties/precision stopped the refinement first
        val wBound = Window.orderBy(scoreCol.desc, col(idCol).asc)
        val prefix = boundary
          .withColumn("__cum",
            sum(col(weightCol).cast("long")).over(
              wBound.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .where(col("__cum") <= remaining)
          .drop("__cum")
        (above.unionByName(prefix), cnt, scale)
    }
  }
}
