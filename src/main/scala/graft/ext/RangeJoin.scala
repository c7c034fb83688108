package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalable point-in-interval range join.
  *
  * A naive `p.join(i, p.v BETWEEN i.lo AND i.hi)` has no equi-key, so
  * Spark plans a broadcast-nested-loop (or worse, a cartesian) —
  * O(|P|·|I|) comparisons.  The classic distributed fix is BINNING:
  * chop the value domain into fixed-width bins, explode each interval
  * into the bins it overlaps, map each point to its single bin,
  * equi-join on the bin id, and re-check the exact predicate.  Work
  * becomes O(|P| + |I|·avg_bins + matches): one hash shuffle, fully
  * parallel, no nested loop.
  *
  * `binWidth` trades explode factor (long intervals → many bins)
  * against join selectivity (wide bins → more false candidates);
  * size it near the typical interval length.
  */
object RangeJoin {

  /** Join each point row to every interval row whose
    * `[loCol, hiCol]` contains `ptCol` (inclusive).  `ptCol`, `loCol`,
    * `hiCol` must be mutually comparable numeric columns (cast dates
    * to day numbers first).  Output: point columns + interval columns.
    *
    * Misuse fails loudly instead of corrupting the plan: an inverted
    * interval (`lo > hi`) raises rather than silently exploding a
    * descending (empty-semantics) bin sequence, and an interval
    * spanning more than `maxBinsPerInterval` bins raises with a hint
    * to enlarge `binWidth` — long before Spark's own sequence-length
    * cap would kill the job with an opaque error. */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long, maxBinsPerInterval: Long = 65536): DataFrame = {
    require(binWidth > 0, s"binWidth must be > 0, got $binWidth")
    require(maxBinsPerInterval > 0,
      s"maxBinsPerInterval must be > 0, got $maxBinsPerInterval")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(ptCol)))
    val lo = bin(col(loCol))
    val hi = bin(col(hiCol))
    val bins = when(col(loCol) > col(hiCol), raise_error(concat(
        lit("pointInInterval: inverted interval lo > hi ("),
        col(loCol).cast("string"), lit(" > "), col(hiCol).cast("string"),
        lit(")"))))
      .when(hi - lo >= maxBinsPerInterval, raise_error(concat(
        lit(s"pointInInterval: interval spans more than $maxBinsPerInterval " +
          s"bins at binWidth=$binWidth ("),
        col(loCol).cast("string"), lit(", "), col(hiCol).cast("string"),
        lit(") — raise binWidth or maxBinsPerInterval"))))
      .otherwise(sequence(lo, hi))
    val i = intervals.withColumn("__bin", explode(bins))
    p.join(i, Seq("__bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
