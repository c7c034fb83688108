package graft

import graft.ext.Packing
import graft.functions.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Concat-and-chunk packing ([[Packing.concatChunk]]): exact-capacity
  * sequences, EOS document boundaries, documents splitting across
  * chunk edges, multi-bucket stream reconstruction, and the
  * merge-table end-to-end (which q130's SQL oracle cannot express —
  * the gate pins the byte-fallback table; this spec pins the rest). */
class PackingSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  private val Eos = 999L

  /** Expected chunking of one bucket's stream: docs in id order, each
    * ids :+ EOS, concatenated, cut every `cap`. */
  private def expectedChunks(docs: Seq[(Long, Seq[Long])],
      cap: Int): Seq[Seq[Long]] =
    docs.sortBy(_._1).flatMap { case (_, ids) => ids :+ Eos }
      .grouped(cap).map(_.toSeq).toSeq

  test("single bucket: exact capacity, EOS per doc, docs split at " +
    "chunk boundaries, short tail") {
    // capacity 5, doc lengths 3/7/1 (+EOS each = 4/8/2): doc 2 spans
    // three chunks, the tail chunk is short
    val docs = Seq(
      (1L, Seq(10L, 11L, 12L)),
      (2L, Seq(20L, 21L, 22L, 23L, 24L, 25L, 26L)),
      (3L, Seq(30L)))
    val out = Packing.concatChunk(docs.toDF("doc_id", "ids"),
        "doc_id", "ids", capacity = 5, buckets = 1, eosId = Eos)
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
    val exp = expectedChunks(docs, 5)
    assert(out.map(_._1).toSeq == exp.indices.map(_.toLong))
    assert(out.map(_._2).toSeq == exp)
    // every non-final chunk is EXACTLY capacity
    assert(out.dropRight(1).forall(_._2.length == 5))
    assert(out.last._2.length == (docs.map(_._2.length + 1).sum % 5))
  }

  test("multi-bucket: per-bucket stream reconstructs exactly; only " +
    "each bucket's final chunk may be short") {
    val docs = (0L until 40L).map(i => (i, (0L to i % 7).map(_ + i * 100)))
    val df = docs.toDF("doc_id", "ids")
    val buckets = 4
    val cap = 7
    // the operator's own bucket assignment, read back for the oracle
    val bucketOf = df
      .select(col("doc_id"),
        (graft.functions.ColFns.h60(col("doc_id").cast("string"))
          % buckets).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Packing.concatChunk(df, "doc_id", "ids", cap, buckets, Eos)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1)))
      .sortBy(_._1)
    val byBucket = out.groupBy(_._1 >> 32)
    for (b <- 0L until buckets.toLong) {
      val mine = docs.filter(d => bucketOf(d._1) == b)
      val exp = expectedChunks(mine, cap)
      val got = byBucket.getOrElse(b, Array.empty[(Long, Seq[Long])])
        .sortBy(_._1)
      // chunk ids are dense from 0 within the bucket
      assert(got.map(_._1 & 0xffffffffL).toSeq ==
        exp.indices.map(_.toLong))
      assert(got.map(_._2).toSeq == exp, s"bucket $b stream mismatch")
      assert(got.dropRight(1).forall(_._2.length == cap))
    }
  }

  test("merge-table end-to-end: encode -> concatChunk reassembles the " +
    "exact token stream (no SQL twin)") {
    // interacting, chained merges — q130 gates the byte-fallback
    // table; this pins the real-tokenizer composition
    val merges: Bpe.Merges = Seq(("t", "h"), ("th", "e"), ("a", "b"))
    val texts = Seq(
      (1L, "the table is thick"),
      (2L, "abs and ababs"),
      (3L, ""),
      (4L, "the the the"))
    val df = texts.toDF("doc_id", "text")
      .select(col("doc_id"), Bpe.encode(col("text"), merges).as("ids"))
    val perDoc = df.collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).sortBy(_._1)
    val out = Packing.concatChunk(df, "doc_id", "ids",
        capacity = 4, buckets = 1, eosId = Eos)
      .orderBy("seq_id")
      .collect().map(_.getSeq[Long](1))
    assert(out.flatten.toSeq ==
      perDoc.flatMap { case (_, ids) => ids :+ Eos }.toSeq)
    // merged ids actually present (the table fired)
    assert(out.flatten.exists(_ >= 256L))
  }
}
