package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch as-of (backward) join — an operator Spark has no native form
  * of: for every left row, attach the single right row with the
  * greatest `rightTs` ≤ `leftTs` for the same key (or nulls when no
  * such row exists).  The point-in-time lookup of feature stores,
  * slowly-changing dimensions and market data.
  *
  * Spark-first shape (no custom physical operator needed): tag and
  * union both sides, then one windowed `last(payload, ignoreNulls)`
  * over (key, time, side) with a rows-frame — a single shuffle on the
  * key and one spill-safe sort per partition, O(|L|+|R|) total work.
  * Right rows sort BEFORE left rows at equal timestamps, so a right
  * row exactly at `leftTs` matches (`>=` semantics, like DuckDB/kdb
  * ASOF).
  *
  * PRECONDITION: `right` must be unique per (keys, rightTs) —
  * pre-aggregate otherwise; with duplicates the surviving payload at
  * a tied timestamp is unspecified.
  */
object AsOf {

  def asOfJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String): DataFrame = {
    val rPayload = right.columns.filterNot(c => keys.contains(c) || c == rightTs)
    require(rPayload.nonEmpty, "right side needs at least one payload column")
    val clashing = left.columns.intersect(rPayload)
    require(clashing.isEmpty,
      s"asOfJoin: right payload column(s) ${clashing.mkString(", ")} collide " +
        "with left columns — rename or drop them on one side first " +
        "(the output carries all left columns plus the right payload)")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("__"))
    require(reserved.isEmpty,
      s"asOfJoin: column(s) ${reserved.distinct.mkString(", ")} use the " +
        "reserved '__' prefix (internal tags __ts/__side/__l/__r/__match)")
    val rStruct = struct(rPayload.map(col).toIndexedSeq: _*)
    val rType = right.select(rStruct.as("__r")).schema("__r").dataType
    val lStruct = struct(left.columns.map(col).toIndexedSeq: _*)
    val lType = left.select(lStruct.as("__l")).schema("__l").dataType
    val l2 = left.select(keys.map(col) ++ Seq(
      col(leftTs).as("__ts"), lit(1).as("__side"),
      lStruct.as("__l"), lit(null).cast(rType).as("__r")): _*)
    val r2 = right.select(keys.map(col) ++ Seq(
      col(rightTs).as("__ts"), lit(0).as("__side"),
      lit(null).cast(lType).as("__l"), rStruct.as("__r")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__l.*") +: rPayload.toIndexedSeq.map(c =>
        col(s"__match.$c").as(c)): _*)
  }
}
