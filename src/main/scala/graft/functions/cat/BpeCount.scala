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
  * losslessly.
  *
  * The executor-side lookup structures are PRIMITIVE (r18): symbols
  * are canonical token ids (bytes 0–255, merge i's fused string =
  * 256+i, lowest rank winning a duplicated string — [[symId]]'s
  * layout), and pair→rank lookups go through an open-addressing
  * long→int table keyed `(idL << 32) | idR` — zero allocation per
  * probe, where the previous string-keyed form allocated a concat
  * string per adjacent pair per merge round (the kernel's hot path).
  * Canonical ids are injective on symbol strings, so id-pair equality
  * IS string-pair equality and the merge semantics are bit-identical
  * (BpeSpec goldens pin them). */
final class BpeTable(val merges: Array[(String, String)]) extends Serializable {
  /** rank lookup keyed `left + ' ' + right` — unambiguous because
    * symbols can never contain a space byte (pre-tokenization splits
    * on it before any symbol exists).  Kept for spec-facing string
    * APIs; the kernel uses [[pairRankKeys]]/[[pairRankVals]]. */
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

  /** Primitive kernel tables, built once per executor on first use:
    *
    *  - `mergeFusedId(i)`: canonical id of merge i's fused string;
    *  - `mergeLeftId/mergeRightId(i)`: canonical ids of merge i's
    *    parts, or -1 when the part string is not a reachable symbol
    *    (no byte or fused string equals it — such a merge can never
    *    fire, exactly as in the string-keyed form);
    *  - `pairRankKeys/pairRankVals`: open-addressing map
    *    `(leftId << 32 | rightId) → rank`, same insert order as
    *    [[rank]] (later duplicates overwrite, preserving its
    *    last-wins behavior bit-for-bit).  Empty slots key = -1
    *    (valid keys are non-negative: ids < 2^31). */
  // volatile: tasks race on first use; the flag is written LAST
  // inside the synchronized block, so a true read guarantees the
  // arrays are visible (classic double-checked init)
  @transient @volatile private var kernelReady = false
  @transient var mergeFusedId: Array[Long] = _
  @transient var mergeLeftId: Array[Long] = _
  @transient var mergeRightId: Array[Long] = _
  @transient var pairRankKeys: Array[Long] = _
  @transient var pairRankVals: Array[Int] = _
  @transient var pairRankMask: Int = _

  def ensureKernel(): Unit = if (!kernelReady) synchronized {
    if (!kernelReady) {
      val n = merges.length
      val fused = new Array[Long](n)
      val lId = new Array[Long](n)
      val rId = new Array[Long](n)
      var cap = 16
      while (cap < n * 4) cap <<= 1
      val keys = new Array[Long](cap)
      java.util.Arrays.fill(keys, -1L)
      val vals = new Array[Int](cap)
      val mask = cap - 1
      def put(key: Long, rank: Int): Unit = {
        var idx = (java.lang.Long.hashCode(key * -7046029254386353131L)) & mask
        while (keys(idx) != -1L && keys(idx) != key) idx = (idx + 1) & mask
        keys(idx) = key; vals(idx) = rank
      }
      var i = 0
      while (i < n) {
        fused(i) = symId.get(merges(i)._1 + merges(i)._2)
        val li = symId.get(merges(i)._1)
        val ri = symId.get(merges(i)._2)
        lId(i) = if (li == null) -1L else li.longValue()
        rId(i) = if (ri == null) -1L else ri.longValue()
        if (lId(i) >= 0 && rId(i) >= 0) put((lId(i) << 32) | rId(i), i)
        i += 1
      }
      mergeFusedId = fused; mergeLeftId = lId; mergeRightId = rId
      pairRankKeys = keys; pairRankVals = vals; pairRankMask = mask
      kernelReady = true
    }
  }

  /** Rank of the id pair, or Int.MaxValue when absent.  Zero
    * allocation; call [[ensureKernel]] first. */
  def pairRank(leftId: Long, rightId: Long): Int = {
    val key = (leftId << 32) | rightId
    val mask = pairRankMask
    var idx = (java.lang.Long.hashCode(key * -7046029254386353131L)) & mask
    val keys = pairRankKeys
    while (true) {
      val k = keys(idx)
      if (k == key) return pairRankVals(idx)
      if (k == -1L) return Int.MaxValue
      idx = (idx + 1) & mask
    }
    Int.MaxValue // unreachable
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
  * the count stays inside whole-stage codegen.  The per-word merge
  * loop is O(unit² ) worst case — bounded (r18) by the documented
  * [[BpeCount.MaxWordBytes]] pre-tokenization ceiling: units longer
  * than the ceiling (space-free CJK text, URLs, base64 blobs — one
  * giant "word" between ASCII spaces) are split at the ceiling first,
  * capping per-row cost at O(len · ceiling) where the unbounded form
  * was O(len²) — a multi-hour executor stall on one 100 KB space-free
  * document.  Natural-language words (tens of bytes) sit far below
  * the ceiling, so results are unchanged for any corpus whose words
  * are shorter than [[BpeCount.MaxWordBytes]] — the same
  * documented-ceiling contract as `maxLiteralTerms` (BpeSpec pins
  * both sides: unchanged below, split at it above). */
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
  /** Pre-tokenization unit ceiling, in bytes: a space-delimited word
    * longer than this is split into ceiling-sized units before the
    * merge loop runs, bounding per-unit cost at O(ceiling²) primitive
    * probes and per-row cost at O(len · ceiling) — where the
    * unbounded loop was O(len²) on space-free documents (CJK, long
    * URLs, base64), a data-dependent executor stall at 100 TB scale.
    * 256 bytes sits far above natural-language word lengths (the
    * corpora this library gates on max out at 8-byte words), so
    * results are unchanged below it; GPT-2's regex pre-tokenizer
    * bounds units the same way in spirit.  Merges cannot fire across
    * a unit boundary, exactly as they cannot across a space. */
  val MaxWordBytes: Int = 256

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
    if (t.merges.isEmpty) {
      // byte fallback: spaces dropped, each remaining byte one token
      var i = 0
      while (i < n) {
        if (bytes(i) != ' ') { out(w) = bytes(i) & 0xffL; w += 1 }
        i += 1
      }
    } else {
      t.ensureKernel()
      val ids = new Array[Long](math.min(n, MaxWordBytes))
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || bytes(i) == ' ') {
          var lo = start
          while (lo < i) { // ceiling-split units of one word
            val hi = math.min(lo + MaxWordBytes, i)
            val len = encodeUnit(bytes, lo, hi, t, ids)
            var j = 0
            while (j < len) { out(w) = ids(j); w += 1; j += 1 }
            lo = hi
          }
          start = i + 1
        }
        i += 1
      }
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
    if (t.merges.isEmpty) {
      var i = 0
      while (i < n) { if (bytes(i) != ' ') count += 1; i += 1 }
    } else {
      t.ensureKernel()
      val ids = new Array[Long](math.min(n, MaxWordBytes))
      var start = 0
      var i = 0
      while (i <= n) {
        if (i == n || bytes(i) == ' ') {
          var lo = start
          while (lo < i) {
            val hi = math.min(lo + MaxWordBytes, i)
            count += encodeUnit(bytes, lo, hi, t, ids)
            lo = hi
          }
          start = i + 1
        }
        i += 1
      }
    }
    count
  }

  /** One pre-tokenization UNIT's BPE merge loop over canonical token
    * ids — the hot kernel.  `ids` is a caller-provided scratch buffer
    * of length ≥ hi - lo (reused across a row's units: zero per-unit
    * allocation); returns the final token count, with the token ids
    * in `ids(0 until count)`.  Semantics are the classic round loop:
    * find the present pair with the lowest rank, fuse ALL its
    * non-overlapping occurrences left-to-right, repeat — identical to
    * the string-symbol form (canonical ids are injective on symbol
    * strings), just allocation-free. */
  private def encodeUnit(b: Array[Byte], lo: Int, hi: Int, t: BpeTable,
      ids: Array[Long]): Int = {
    var len = hi - lo
    var j = 0
    while (j < len) { ids(j) = b(lo + j) & 0xffL; j += 1 }
    var done = len <= 1
    while (!done) {
      // the present pair with the lowest rank
      var bestRank = Int.MaxValue
      var k = 0
      while (k < len - 1) {
        val r = t.pairRank(ids(k), ids(k + 1))
        if (r < bestRank) bestRank = r
        k += 1
      }
      if (bestRank == Int.MaxValue) done = true
      else {
        // fuse ALL its non-overlapping occurrences, left to right
        val l = t.mergeLeftId(bestRank)
        val r = t.mergeRightId(bestRank)
        val fused = t.mergeFusedId(bestRank)
        var w = 0
        var rd = 0
        while (rd < len) {
          if (rd < len - 1 && ids(rd) == l && ids(rd + 1) == r) {
            ids(w) = fused; rd += 2
          } else { ids(w) = ids(rd); rd += 1 }
          w += 1
        }
        len = w
        if (len <= 1) done = true
      }
    }
    len
  }

  /** Spec-facing single-word encode: token list of `word` (no space
    * splitting, no ceiling — the ceiling lives in the word scanner,
    * [[compute]]/[[encodeIds]]) under `merges`, as symbol strings. */
  def encodeWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    val b = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val t = new BpeTable(merges.toArray)
    t.ensureKernel()
    val ids = new Array[Long](b.length)
    val len = encodeUnit(b, 0, b.length, t, ids)
    // canonical id → symbol string (spec readability)
    val idSym = new java.util.HashMap[java.lang.Long, String]()
    t.symId.forEach((s, id) => idSym.putIfAbsent(id, s))
    (0 until len).map(j => idSym.get(ids(j)))
  }
}
