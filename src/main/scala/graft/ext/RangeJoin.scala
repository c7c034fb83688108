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
    * to day numbers first).  Output: point columns + interval columns. */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0)
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val p = points.withColumn("__bin", bin(col(ptCol)))
    val i = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    p.join(i, Seq("__bin"))
      .where(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("__bin")
  }
}
