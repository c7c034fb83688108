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

  /** Concat-and-chunk packing (the GPT-style pretraining format,
    * complementing [[packBySize]]'s no-split form): per bucket, the
    * documents' token-id arrays are concatenated in id order with
    * `eosId` after each document, and the stream is cut into
    * sequences of EXACTLY `capacity` tokens (documents split at
    * chunk boundaries; only each bucket's final sequence may be
    * short).  Output: `seqCol = bucket · 2^32 + chunk` and `outCol:
    * array<bigint>` of the sequence's ids.
    *
    * Preconditions (the [[packBySize]] contract, stated here too):
    * `idCol` values must be UNIQUE — the placement window orders by
    * id, and tied rows would receive the same cumulative sum
    * (overlapping offsets, chunks past capacity).  Rows whose
    * `idsCol` is null are DROPPED (null extends to a null slice and
    * `inline` emits nothing) — upstream encoders ([[graft.functions.Bpe.encode]])
    * are null-intolerant, so a null here means a null document;
    * coalesce to `array()` upstream if such a doc should still
    * contribute its EOS.  `seqCol` packs the chunk index into the low
    * 32 bits, so one bucket supports 2^32 chunks (= 2^32 · capacity
    * tokens; at capacity 256 that is ~10^12 tokens/bucket) — size
    * `buckets` so a bucket stays below that bound.
    *
    * Distributed shape — sized for corpora where one row per TOKEN
    * would be the bottleneck: one windowed prefix sum per bucket
    * places every document at its absolute stream offset, then each
    * document emits `O(1 + len/capacity)` SLICE rows (chunk id,
    * in-chunk offset, `slice()` of its ids — compact long arrays,
    * never exploded tokens), and one hash aggregation per chunk
    * reassembles `array_sort`-by-offset + `flatten`.  Per-chunk state
    * is bounded by `capacity` ids regardless of document sizes, so
    * the aggregation cannot skew; everything is built-in codegen'd
    * collection functions (no UDF). */
  def concatChunk(df: DataFrame, idCol: String, idsCol: String,
      capacity: Int, buckets: Int, eosId: Long,
      seqCol: String = "seq_id", outCol: String = "input_ids"): DataFrame = {
    require(capacity > 0 && buckets > 0)
    val cap = capacity.toLong
    val w = Window.partitionBy("__bucket").orderBy(col(idCol))
    val placed = df
      .withColumn("__bucket", h60(col(idCol).cast("string")) % buckets)
      .withColumn("__ext",
        concat(col(idsCol).cast("array<bigint>"), array(lit(eosId))))
      .withColumn("__len", size(col("__ext")).cast("long"))
      .withColumn("__prefix", sum(col("__len")).over(w) - col("__len"))
    val pieces = placed.select(col("__bucket"), expr(
      s"""inline(transform(
         |  sequence(__prefix div ${cap}L, (__prefix + __len - 1) div ${cap}L),
         |  c -> struct(
         |    c AS __chunk,
         |    greatest(c * ${cap}L, __prefix) - c * ${cap}L AS __off,
         |    slice(__ext,
         |      CAST(greatest(c * ${cap}L, __prefix) - __prefix + 1 AS INT),
         |      CAST(least((c + 1) * ${cap}L, __prefix + __len)
         |        - greatest(c * ${cap}L, __prefix) AS INT)) AS __piece)))"""
        .stripMargin))
    pieces.groupBy(col("__bucket"), col("__chunk"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("__off"), col("__piece")))),
        x => x("__piece"))).as(outCol))
      .select((col("__bucket") * lit(1L << 32) + col("__chunk")).as(seqCol),
        col(outCol))
  }
}
