package graft

import graft.functions.Bpe
import graft.functions.cat.BpeCount
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level BPE: encoding goldens (including CHAINED merges, which
  * q129's SQL oracle cannot express — the gate covers the
  * non-interacting two-merge table plus the byte fallback, this spec
  * covers the rest of the algorithm), rank-order semantics, UTF-8
  * byte fallback, training determinism, and the budget-op
  * composition. */
class BpeSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  test("encodeWord goldens: rank order, chained merges, greedy " +
    "non-overlapping fusion") {
    // no merges: one token per byte
    assert(BpeCount.encodeWord("the", Nil) == Seq("t", "h", "e"))
    // one merge
    assert(BpeCount.encodeWord("the", Seq(("t", "h"))) == Seq("th", "e"))
    // CHAINED: (t,h) then (th,e) — the second consumes the first's
    // output, the case no replace()-arithmetic oracle can express
    assert(BpeCount.encodeWord("the", Seq(("t", "h"), ("th", "e")))
      == Seq("the"))
    // rank order decides: with (h,e) ranked FIRST, "the" fuses h+e
    // and the (t,h) merge never fires (no t-h adjacency left)
    assert(BpeCount.encodeWord("the", Seq(("h", "e"), ("t", "h")))
      == Seq("t", "he"))
    // greedy left-to-right non-overlap: "ththt" fuses at 0 and 2
    assert(BpeCount.encodeWord("ththt", Seq(("t", "h")))
      == Seq("th", "th", "t"))
    // all occurrences of the lowest-rank pair fuse before the next
    // rank is considered: (a,b) everywhere, then (ab,ab)
    assert(BpeCount.encodeWord("abab", Seq(("a", "b"), ("ab", "ab")))
      == Seq("abab"))
    // repeated application within one rank: "aaaa" with (a,a) fuses
    // pass-wise to aa,aa then (aa,aa) applies
    assert(BpeCount.encodeWord("aaaa", Seq(("a", "a"), ("aa", "aa")))
      == Seq("aaaa"))
    assert(BpeCount.encodeWord("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
  }

  test("tokenCount column: space pre-tokenization, byte fallback on " +
    "empty table, multibyte UTF-8 counts bytes") {
    val df = Seq(
      (1L, "the table"),
      (2L, "  the   "),       // empty words dropped, spaces not tokens
      (3L, "café")        // é = 2 UTF-8 bytes
    ).toDF("id", "text")
    val rows = df.select(col("id"),
        Bpe.tokenCount(col("text"), Nil).as("bytes"),
        Bpe.tokenCount(col("text"), Seq(("t", "h"), ("th", "e")))
          .as("bpe"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(rows(1L) == ((8L, 6L)),
      "'the table': 8 non-space bytes; 'the'->1 token, 'table'->5 " +
        "(no th adjacency inside 'table'... t,a,b,l,e)")
    assert(rows(2L) == ((3L, 1L)), "'the' alone, whitespace dropped")
    assert(rows(3L) == ((5L, 5L)), "café = c,a,f + 2 bytes of é")
  }

  test("tokenCount runs inside whole-stage codegen (no fallback)") {
    val df = spark.range(100)
      .select(Bpe.tokenCount(concat(lit("the t"), col("id").cast("string")),
        Seq(("t", "h"))).as("n"))
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.exists(_.toString.contains("graft_bpe_count")),
      "the BPE count must sit INSIDE a WholeStageCodegen span, got:\n" +
        df.queryExecution.executedPlan.toString)
    assert(df.agg(sum("n")).first().getLong(0) > 0L)
  }

  test("encode column: byte-level vocab ids (bytes 0-255, merge i = " +
    "256+i), size == tokenCount, multibyte byte fallback") {
    // CHAINED merges — the table q130's SQL oracle cannot express;
    // the id layout is what a training consumer relies on
    val merges: Bpe.Merges = Seq(("t", "h"), ("th", "e"))
    val df = Seq((1L, "the cat"), (2L, "café x"), (3L, "   ")).toDF("id", "text")
    val rows = df.select(col("id"),
        Bpe.encode(col("text"), merges).as("ids"),
        Bpe.tokenCount(col("text"), merges).as("n"),
        Bpe.encode(col("text"), Nil).as("bytes"))
      .collect()
      .map(r => (r.getLong(0), (r.getSeq[Long](1), r.getLong(2),
        r.getSeq[Long](3)))).toMap
    // 'the' -> chained fuse to merge 1 (id 257); 'cat' -> raw bytes
    assert(rows(1L)._1 == Seq(257L, 'c'.toLong, 'a'.toLong, 't'.toLong))
    // byte fallback: exactly the non-space UTF-8 bytes, as unsigned
    assert(rows(2L)._3 ==
      "caféx".getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => (b & 0xff).toLong).toSeq)
    // whitespace-only text: empty sequence, not null
    assert(rows(3L)._1 == Seq.empty[Long])
    // the count/encode contract, on every row and both tables
    for ((_, (ids, n, bytes)) <- rows) {
      assert(ids.length.toLong == n)
      assert(bytes.forall(b => b >= 0L && b <= 255L))
    }
  }

  test("encode runs inside whole-stage codegen (no fallback)") {
    val df = spark.range(100)
      .select(Bpe.encode(concat(lit("the t"), col("id").cast("string")),
        Seq(("t", "h"))).as("ids"))
    val wscg = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wscg.exists(_.toString.contains("graft_bpe_encode")),
      "the BPE encode must sit INSIDE a WholeStageCodegen span, got:\n" +
        df.queryExecution.executedPlan.toString)
    assert(df.select(sum(size(col("ids")))).first().getLong(0) > 0L)
  }

  test("pre-tokenization byte ceiling: space-free units split at " +
    "MaxWordBytes, unchanged below it") {
    val C = BpeCount.MaxWordBytes
    assert(C == 256, "the documented ceiling — update this spec with it")
    val merges: Bpe.Merges = Seq(("a", "b"))
    // below the ceiling: a 200-byte space-free word encodes exactly
    // like the unbounded single-unit form
    val below = "x" * 198 + "ab"
    // at the boundary: byte C-1 is 'a', byte C is 'b' — the ceiling
    // must CUT the pair (merges cannot fire across a unit boundary,
    // exactly as across a space), so the count is one higher than the
    // unbounded form's (C-2 x's + 1 fused ab = C-1 would be unbounded;
    // split gives C-1 singles + b = C)
    val atBoundary = "x" * (C - 1) + "ab" // C+1 bytes, no spaces
    val df = Seq((1L, below), (2L, atBoundary)).toDF("id", "text")
    val got = df.select(col("id"),
        Bpe.tokenCount(col("text"), merges).as("n"),
        Bpe.encode(col("text"), merges).as("ids"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getSeq[Long](2))))
      .toMap
    assert(got(1L)._1 == 199L, "below the ceiling: 198 x + fused ab")
    assert(got(1L)._2 == (Seq.fill(198)('x'.toLong) :+ 256L),
      "below-ceiling ids match the single-unit encode (merge 0 = id 256)")
    // above: unit 1 = (C-1) x's + 'a' (C bytes), unit 2 = 'b'
    assert(got(2L)._1 == (C + 1).toLong,
      s"the ceiling splits the trailing ab pair: ${C - 1} x + a + b " +
        "(the unbounded form would fuse to " + C + " tokens)")
    assert(got(2L)._2.takeRight(2) == Seq('a'.toLong, 'b'.toLong),
      "the pair cut by the unit boundary stays two byte tokens")
    // whole-document cost is now O(len · ceiling): a space-free text
    // of many units encodes unit-by-unit (count = Σ per-unit counts)
    val many = ("ab" * (2 * C)).grouped(C).map(u =>
      BpeCount.encodeWord(u, merges).length.toLong).sum
    val gotMany = Seq((1L, "ab" * (2 * C))).toDF("id", "text")
      .select(Bpe.tokenCount(col("text"), merges)).first().getLong(0)
    assert(gotMany == many, "multi-unit count = sum of per-unit counts")
  }

  test("trainMerges: deterministic, frequency-ranked, fuses chains") {
    // 'aa' dominates, then the trained symbol chains
    val df = Seq.fill(8)("aaab").zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
    // iter 1: (a,a) wins at 16 -> [aa, a, b]; iter 2: (aa,a) and
    // (a,b) tie at 8, lexicographic tie-break picks (a,b) -> [aa, ab];
    // iter 3: (aa,ab) -> [aaab]
    val m = Bpe.trainMerges(df, "text", nMerges = 3)
    assert(m == Seq(("a", "a"), ("a", "b"), ("aa", "ab")), s"got $m")
    // determinism: same corpus, same table
    assert(Bpe.trainMerges(df, "text", 3) == m)
    // early exhaustion: no pair repeats -> stops short
    val one = Seq((1L, "xy")).toDF("id", "text")
    assert(Bpe.trainMerges(one, "text", 10) == Nil,
      "a pair seen once must not train a merge")
  }

  test("trained merges compose with a budget op (the q129 shape, " +
    "trained-table variant)") {
    val docs = (0L until 50L)
      .map(i => (i, if (i % 2 == 0) "the the table" else "scan row"))
      .toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, "text", 8)
    assert(merges.nonEmpty)
    val scored = docs.select(col("doc_id"),
      Bpe.tokenCount(col("text"), merges).as("w"),
      (col("doc_id").cast("double") / 100.0).as("s"))
    val total = scored.agg(sum("w")).first().getLong(0)
    val kept = graft.ext.Sampling.takeByBudget(scored, "doc_id", "w",
      col("s"), budget = total / 2)
    // greedy by score desc = highest doc_ids first; the kept set's
    // weight fits the budget and adding the next-best row would not
    val keptW = kept.agg(sum("w")).first().getLong(0)
    assert(keptW <= total / 2)
    val keptIds = kept.select("doc_id").collect().map(_.getLong(0)).toSet
    val nextBest = (0L until 50L).filterNot(keptIds).max
    val nextW = scored.where(col("doc_id") === nextBest)
      .select("w").first().getLong(0)
    assert(keptW + nextW > total / 2,
      "the greedy prefix must stop exactly at the first non-fitting row")
  }
}
