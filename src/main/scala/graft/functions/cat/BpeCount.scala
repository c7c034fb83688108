package graft.functions.cat

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled byte-level BPE merge table, shipped to executors as one
  * expression reference object (the "broadcast vocab": it rides the
  * serialized plan, one copy per executor — never per row).  `merges`
  * is the RANKED list (index = rank, lower applies first); symbols
  * are byte strings (ISO-8859-1-decoded single bytes initially,
  * concatenations after merges), so any UTF-8 input round-trips
  * losslessly. */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {
  /** rank lookup keyed `left + ' ' + right` — unambiguous because
    * symbols can never contain a space byte (pre-tokenization splits
    * on it before any symbol exists). */
  @transient lazy val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.length * 2)
    var i = 0
    while (i < merges.length) {
      m.put(merges(i)._1 + " " + merges(i)._2, i)
      i += 1
    }
    m
  }

  /** symbol → token id: the 256 single bytes are ids 0–255, merge i's
    * fused symbol is id 256+i (the standard byte-level vocab layout).
    * Two merges CAN fuse to the same string (e.g. (a,bc) and (ab,c));
    * the lowest rank wins the id, matching the encoder (which can
    * only ever produce the fused string once per adjacency). */
  @transient lazy val symId: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](merges.length * 2 + 512)
    var b = 0
    while (b < 256) {
      m.put(new String(Array(b.toByte),
        java.nio.charset.StandardCharsets.ISO_8859_1), b.toLong)
      b += 1
    }
    var i = 0
    while (i < merges.length) {
      m.putIfAbsent(merges(i)._1 + merges(i)._2, 256L + i)
      i += 1
    }
    m
  }
  override def toString: String = s"BpeTable(${merges.length} merges)"
}

/** Number of byte-level BPE tokens of a string under a fixed merge
  * table — the token-counting primitive every budget-denominated
  * selection operator (packing, takeByBudget, mixture calibration)
  * can be parameterized with instead of whitespace counts.
  *
  * Algorithm (Sennrich et al. 2016 / GPT-2 byte-level form, public):
  * pre-tokenize on ASCII space; each word starts as its UTF-8 byte
  * sequence; repeatedly find the present pair with the LOWEST merge
  * rank and fuse all its non-overlapping occurrences left-to-right,
  * until no mergeable pair remains.  An empty table degenerates to
  * byte count — the oracle-checkable fallback (q129 pins both).
  *
  * Codegen'd via a static kernel call ([[Md5HexSlice]]'s pattern), so
  * the count stays inside whole-stage codegen; the per-word merge
  * loop is O(len² · |present merges|) worst case on word lengths,
  * which natural-language words bound at tens of bytes. */
case class BpeCount(child: Expression, table: BpeTable)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_count"

  override protected def nullSafeEval(input: Any): Any =
    BpeCount.compute(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.cat.BpeCount.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

/** Full byte-level BPE token-id sequence of a string under a fixed
  * merge table — [[BpeCount]]'s sibling that keeps the tokens instead
  * of counting them, so packing can emit REAL packed id sequences
  * (the shard format a training run reads) rather than counts.  Same
  * kernel, same broadcast-vocab shape (the compiled table rides the
  * plan once per executor); ids are the standard byte-level layout —
  * bytes 0–255, merge i = 256+i ([[BpeTable.symId]]).  Never null on
  * non-null input (empty text → empty array), and
  * `size(graft_bpe_encode(s)) == graft_bpe_count(s)` by construction
  * (BpeSpec pins it). */
case class BpeEncode(child: Expression, table: BpeTable)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  override protected def nullSafeEval(input: Any): Any =
    BpeCount.encodeIds(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.cat.BpeCount.encodeIds($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeCount {
  private val ByteStrings: Array[String] =
    (0 until 256).map(b =>
      new String(Array(b.toByte), java.nio.charset.StandardCharsets.ISO_8859_1))
      .toArray

  /** Static per-row kernel for [[BpeEncode]]: the concatenated token
    * ids of the string's space-separated words (spaces are the
    * pre-tokenizer, never tokens — so the id stream's length equals
    * [[compute]]'s count).  Allocation is one exact-size pass: the
    * token count can never exceed the non-space byte count. */
  def encodeIds(s: UTF8String,
      t: BpeTable): org.apache.spark.sql.catalyst.util.ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    val out = new Array[Long](n) // upper bound: one token per byte
    var w = 0
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) {
          if (t.merges.isEmpty) {
            var j = start
            while (j < i) { out(w) = bytes(j) & 0xffL; w += 1; j += 1 }
          } else {
            val syms = encodeRange(bytes, start, i, t)
            var j = 0
            while (j < syms.length) {
              out(w) = t.symId.get(syms(j)); w += 1; j += 1
            }
          }
        }
        start = i + 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(out, w))
  }

  /** Static per-row kernel (called from generated code): total BPE
    * token count across the string's space-separated words. */
  def compute(s: UTF8String, t: BpeTable): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        if (i > start) count += wordTokenCount(bytes, start, i, t)
        start = i + 1
      }
      i += 1
    }
    count
  }

  private def wordTokenCount(b: Array[Byte], lo: Int, hi: Int,
      t: BpeTable): Int =
    if (t.merges.isEmpty) hi - lo
    else encodeRange(b, lo, hi, t).length

  /** One word's BPE token sequence (symbols as ISO-8859-1 byte
    * strings) — the kernel [[compute]] counts and the specs inspect. */
  private def encodeRange(b: Array[Byte], lo: Int, hi: Int,
      t: BpeTable): Array[String] = {
    var syms = new Array[String](hi - lo)
    var j = lo
    while (j < hi) { syms(j - lo) = ByteStrings(b(j) & 0xff); j += 1 }
    var len = syms.length
    var done = false
    while (!done && len > 1) {
      // the present pair with the lowest rank
      var bestRank = Int.MaxValue
      var k = 0
      while (k < len - 1) {
        val r = t.rank.get(syms(k) + " " + syms(k + 1))
        if (r != null && r < bestRank) bestRank = r
        k += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // fuse ALL its non-overlapping occurrences, left to right
        val (l, r) = t.merges(bestRank)
        val merged = l + r
        var w = 0
        var rd = 0
        while (rd < len) {
          if (rd < len - 1 && syms(rd) == l && syms(rd + 1) == r) {
            syms(w) = merged; rd += 2
          } else { syms(w) = syms(rd); rd += 1 }
          w += 1
        }
        len = w
      }
    }
    java.util.Arrays.copyOf(syms, len)
  }

  /** Spec-facing single-word encode: token list of `word` (no space
    * splitting) under `merges`. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val b = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    encodeRange(b, 0, b.length, new BpeTable(merges.toArray)).toSeq
  }
}
