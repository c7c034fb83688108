package graft.ext

import graft.core.Folds
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Bloom-filter semi-join pruning — the classic runtime-filter
  * pattern for the case where the small side is too big to broadcast
  * as a hash table but its KEY SET compresses into a few hundred KB
  * of bitset: build a bloom over the small side's keys in one
  * distributed pass (our mergeable [[Folds.bloom]] fold through the
  * UDAF bridge — merge is bitwise OR, so partial aggregation applies),
  * ship the bitset to every executor, and drop big-side rows that
  * cannot possibly match BEFORE they reach the join shuffle.
  *
  * Semantics are exactly left-semi join: the bloom never produces
  * false negatives, and its false positives are removed by the exact
  * semi join that follows.  What changes is the PLAN: at 100 TB the
  * big side's shuffle carries ~|matching rows| (+ the fp rate) instead
  * of every row — for selective keys that is a 10-1000× cut in
  * shuffle volume, the difference between a job that finishes and one
  * that doesn't.
  */
object Bloom {

  /** Rows of `big` whose `bigKey` equals some `small.smallKey`
    * (left-semi semantics, exact).  `numBits` sizes the filter
    * (default 2^20 bits = 128 KB shipped per executor; fp ≈ 2% at
    * ~100k distinct keys); `numHashes` per standard k ≈ (m/n)·ln2. */
  def semiJoinPrune(big: DataFrame, bigKey: String,
      small: DataFrame, smallKey: String,
      numBits: Int = 1 << 20, numHashes: Int = 5): DataFrame = {
    // xxhash64 is TYPE-sensitive (an INT 5 and a BIGINT 5 hash
    // differently) while the exact join would cast-and-match — a type
    // mismatch here would mean bloom false NEGATIVES, i.e. silently
    // dropped rows.  Fail loudly instead.
    require(big.schema(bigKey).dataType == small.schema(smallKey).dataType,
      s"semiJoinPrune keys must have identical types, got " +
        s"$bigKey: ${big.schema(bigKey).dataType} vs " +
        s"$smallKey: ${small.schema(smallKey).dataType}")
    val spark = big.sparkSession
    import spark.implicits._
    val fold = Folds.bloom(numBits, numHashes)
    // foldUdaf derives the encoders itself: the bitset lands as a SQL
    // array<bigint> (readable off the Row), never a Kryo blob
    val bloomUdaf = graft.streaming.StreamingAgg.foldUdaf(fold)
    // one distributed pass over the small side's hashed keys; the
    // result is a bounded numBits/8-byte vector on the driver.
    // Null-filter BEFORE projecting the key away — relying on
    // ResolveMissingReferences to resurrect a pruned column works but
    // is rule-order fragile.
    val bits = small.where(col(smallKey).isNotNull)
      .select(xxhash64(col(smallKey)).as("h"))
      .agg(bloomUdaf(col("h")).as("bloom"))
      .head().getSeq[Long](0).toArray
    val bc = spark.sparkContext.broadcast(bits)
    val mightContain = udf((h: Long) =>
      Folds.bloomContains(bc.value, numHashes, h))
    // no .distinct() on the right side: left-semi semantics are
    // unaffected by duplicate keys, and deduping would add a full
    // extra exchange of the key set for zero semantic effect.
    // The right side is renamed to a fresh column name so the join
    // condition stays unambiguous even when `big` and `small` are the
    // same DataFrame (self-join) — `big(bigKey) === small(smallKey)`
    // would otherwise resolve both sides to one attribute.
    val rightKey = s"__graft_semi_$smallKey"
    big.where(mightContain(xxhash64(col(bigKey))))
      .join(small.select(col(smallKey).as(rightKey)),
        col(bigKey) === col(rightKey), "left_semi")
  }
}
