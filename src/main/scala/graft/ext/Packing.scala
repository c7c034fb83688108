package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: group variable-length
  * documents into fixed token-capacity packs (context windows)
  * without splitting documents.
  *
  * Distributed shape: documents are hash-bucketed (deterministic in
  * the id, like [[Sampling]]), ordered by id within bucket, and
  * assigned `pack_id = bucket · 2^32 + prefix_tokens div capacity`
  * where `prefix_tokens` is the running token total EXCLUDING the
  * current document.  A pack can therefore overflow `capacity` by
  * less than one document — the standard no-split greedy fill — and
  * the whole assignment is one windowed prefix sum per bucket:
  * embarrassingly parallel across buckets, one shuffle, spill-safe
  * sort within each.  Size `buckets` to the cluster (bucket ≈ a few
  * GB of documents); packing quality is unaffected by bucket count,
  * only pack LOCALITY is per-bucket.
  */
object Packing {

  /** Add a `pack_id` column assigning each row to a pack of at most
    * ~`capacity` tokens (overflow < one document).  `tokenCol` must
    * be a non-negative integral column; ids must be unique. */
  def packBySize(df: DataFrame, idCol: String, tokenCol: String,
      capacity: Long, buckets: Int, packCol: String = "pack_id"): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val w = Window.partitionBy("__bucket").orderBy(col(idCol))
    df.withColumn("__bucket", h60(col(idCol).cast("string")) % buckets)
      .withColumn("__prefix",
        sum(col(tokenCol).cast("long")).over(w) - col(tokenCol).cast("long"))
      .withColumn(packCol,
        col("__bucket") * lit(1L << 32) + expr(s"__prefix div $capacity"))
      .drop("__bucket", "__prefix")
  }
}
