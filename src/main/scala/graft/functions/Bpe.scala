package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-level BPE (Sennrich et al. 2016; the GPT-2 byte-level form —
  * public algorithm) as an engine-native column function, so every
  * token-budget-denominated operator ([[graft.ext.Packing.packBySize]],
  * [[graft.ext.Sampling.takeByBudget]] /
  * [[graft.ext.Sampling.calibrateMixture]], token-count analysis) can
  * run on real subword counts instead of whitespace counts: those
  * operators already take their count COLUMN as a parameter, so the
  * tokenizer plugs in as `Bpe.tokenCount(col("text"), merges)` with no
  * signature changes — q129 gates exactly that composition.
  *
  * Two halves:
  *   - [[trainMerges]]: deterministic merge-table training over a
  *     corpus.  Distributed word-frequency aggregation first (the
  *     corpus never leaves the cluster), then the standard in-memory
  *     pair-count loop over the word-TYPE table (Zipf: word types ≪
  *     corpus; `maxWordTypes` caps the driver copy deterministically
  *     by (count desc, word asc) — at 100 TB train on the top types,
  *     exactly how production subword vocabs are built from samples).
  *     Ties in pair frequency break lexicographically, so the same
  *     corpus always yields the same table on any engine.
  *   - [[tokenCount]]: a codegen'd Catalyst expression
  *     ([[graft.functions.cat.BpeCount]]) over a compiled merge table
  *     that rides the plan to executors once (broadcast-vocab shape);
  *     per-row cost is the per-word merge loop, zero shuffle, scan
  *     speed.  An EMPTY table degenerates to byte count (each UTF-8
  *     byte one token) — the property q129's oracle pins.
  *
  * The reference has no tokenizer (its folds are type-agnostic); this
  * exists because a training-data pipeline budgets in subword tokens.
  */
object Bpe {

  /** Ranked merge list: index = rank, lower rank applies first. */
  type Merges = Seq[(String, String)]

  /** BPE token count of `text` under `merges` — a pure codegen'd
    * scalar column (no UDF, no shuffle). */
  def tokenCount(text: Column, merges: Merges): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.functions.cat.BpeCount(Bridge.expression(text),
      new graft.functions.cat.BpeTable(merges.toArray)))
  }

  /** BPE token-ID sequence (`array<bigint>`, standard byte-level
    * vocab: bytes 0–255, merge i = 256+i) of `text` under `merges` —
    * same codegen'd kernel as [[tokenCount]] but keeping the tokens,
    * the input [[graft.ext.Packing.concatChunk]] packs into training
    * sequences.  `size(encode(t, m)) == tokenCount(t, m)` always. */
  def encode(text: Column, merges: Merges): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    Bridge.column(graft.functions.cat.BpeEncode(Bridge.expression(text),
      new graft.functions.cat.BpeTable(merges.toArray)))
  }

  /** Train `nMerges` byte-level merges on a corpus column.
    *
    * One distributed aggregation builds the (word, count) TYPE table;
    * the top `maxWordTypes` types (deterministic order: count desc,
    * word asc) collect to the driver and the classic BPE loop runs
    * in-memory: count adjacent symbol pairs weighted by word
    * frequency, fuse the most frequent pair (ties lexicographic),
    * repeat.  Training stops early when no pair repeats.  The
    * returned table feeds [[tokenCount]] on any corpus. */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxWordTypes: Int = 1000000): Merges = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    val types = df
      .select(explode(split(col(textCol), " ")).as("w"))
      .where(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(maxWordTypes)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    // words as mutable symbol sequences (ISO-8859-1 byte strings,
    // BpeCount's representation), split at the SAME pre-tokenization
    // byte ceiling the encode kernel applies
    // ([[graft.functions.cat.BpeCount.MaxWordBytes]]): the in-memory
    // pair-count loop is O(unit²) per word type, so one space-free
    // 100 KB type (CJK text, a base64 blob) would otherwise stall the
    // driver the way an unbounded unit stalls an executor.  Below the
    // ceiling — all natural-language words — nothing changes; training
    // and encoding see identical units either way.
    val ceiling = graft.functions.cat.BpeCount.MaxWordBytes
    val words: Array[(Array[String], Long)] = types.flatMap { case (w, n) =>
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .grouped(ceiling).map { unit =>
          (unit.map(b => new String(Array(b),
            java.nio.charset.StandardCharsets.ISO_8859_1)), n)
        }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var current = words
    var it = 0
    var exhausted = false
    while (it < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap
        .empty[(String, String), Long]
      for ((syms, n) <- current; k <- 0 until syms.length - 1) {
        val p = (syms(k), syms(k + 1))
        counts(p) = counts.getOrElse(p, 0L) + n
      }
      if (counts.isEmpty || counts.valuesIterator.max < 2L) exhausted = true
      else {
        // max count, ties lexicographic — deterministic on any engine
        val best = counts.toSeq
          .minBy { case ((l, r), n) => (-n, l, r) }._1
        merges += best
        val fused = best._1 + best._2
        current = current.map { case (syms, n) =>
          val out = new Array[String](syms.length)
          var w = 0; var rd = 0
          while (rd < syms.length) {
            if (rd < syms.length - 1 && syms(rd) == best._1 &&
                syms(rd + 1) == best._2) { out(w) = fused; rd += 2 }
            else { out(w) = syms(rd); rd += 1 }
            w += 1
          }
          (java.util.Arrays.copyOf(out, w), n)
        }
        it += 1
      }
    }
    merges.toSeq
  }
}
