package graft

import graft.ext.Retrieval
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RetrievalSpec extends AnyFunSuite {
  private val spark = SparkTestBase.spark
  import spark.implicits._

  /** Hand-rolled single-threaded BM25 (Lucene idf) — the differential
    * oracle: every score path in one flat loop, no Spark. */
  private def bm25Direct(docs: Seq[(Long, String)],
      queries: Seq[(String, Seq[String])], k: Int,
      k1: Double = 1.2, b: Double = 0.75): Map[String, Seq[(Long, Double)]] = {
    val toks = docs.map { case (id, t) =>
      id -> t.toLowerCase.split(" ").filter(_.nonEmpty).toSeq
    }.toMap
    val n = docs.size
    val avgdl = toks.values.map(_.size).sum.toDouble / n
    def df(term: String) = toks.values.count(_.contains(term))
    queries.map { case (q, terms) =>
      val scores = toks.toSeq.flatMap { case (id, tk) =>
        val s = terms.distinct.map { t =>
          val tf = tk.count(_ == t).toDouble
          if (tf == 0) BigDecimal(0)
          else {
            val idf = math.log(1.0 + (n.toDouble - df(t) + 0.5) / (df(t) + 0.5))
            // mirror the engine's DECIMAL(38,15) per-term quantization
            BigDecimal(idf * (tf * (k1 + 1.0)) /
              (tf + k1 * ((1.0 - b) + b * tk.size / avgdl)))
              .setScale(15, BigDecimal.RoundingMode.HALF_UP)
          }
        }.sum
        if (s == BigDecimal(0)) None else Some((id, s))
      }
      q -> scores.sortBy { case (id, s) => (-s, id) }.take(k)
        .map { case (id, s) =>
          (id, BigDecimal(s.toDouble).setScale(6,
            BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.toMap
  }

  test("bm25TopK matches a hand-rolled oracle, ranks and rounded scores") {
    // deterministic synthetic corpus over a small vocabulary with
    // skewed frequencies (so idf varies) and varied lengths
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 120L).map { id =>
      val len = 3 + (id % 17).toInt
      val words = (0 until len).map(j => vocab(((id * 7 + j * j) % 36 % 6).toInt))
      (id, words.mkString(" "))
    }
    val queries = Seq(
      ("q_a", Seq("alpha", "gamma")),
      ("q_b", Seq("zeta", "beta", "beta")), // dup term counted once
      ("q_c", Seq("epsilon")))
    val expect = bm25Direct(docs, queries, k = 5)
    val got = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id",
        "text",
        queries.flatMap { case (q, ts) => ts.map((q, _)) }.toDF("qid", "term"),
        "qid", "term", k = 5)
      .collect()
      .groupBy(_.getString(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3)).map(r => (r.getLong(1), r.getDouble(2))).toSeq
      }
    assert(got.keySet == expect.keySet)
    for (q <- expect.keySet)
      assert(got(q) == expect(q), s"query $q: got ${got(q)}, want ${expect(q)}")
  }

  test("bm25TopK: ranks are dense 1..k and scores non-increasing per query") {
    val docs = (1L to 60L).map(id => (id, s"x y z ${"x " * (id % 5).toInt}"))
    val out = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id",
        "text", Seq(("q", "x")).toDF("qid", "term"), "qid", "term", k = 8)
      .collect().sortBy(_.getLong(3))
    assert(out.map(_.getLong(3)).toSeq == (1L to 8L))
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("index-served retrieval equals the raw-corpus path bit-for-bit") {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 150L).map { id =>
      val len = 3 + (id % 13).toInt
      (id, (0 until len).map(j => vocab(((id * 5 + j * 3) % 6).toInt)).mkString(" "))
    }
    val queries = Seq(("qa", "alpha"), ("qa", "delta"), ("qb", "zeta"))
      .toDF("qid", "term")
    val name = "retrspec_idx"
    try {
      graft.ext.Retrieval.writeBm25Index(docs.toDF("doc_id", "text"),
        "doc_id", "text", name, buckets = 4)
      val raw = Retrieval.bm25TopK(docs.toDF("doc_id", "text"), "doc_id",
          "text", queries, "qid", "term", k = 6)
        .collect().map(_.toSeq).toSet
      val idx = Retrieval.bm25TopKFromIndex(spark, name, queries, "qid",
          "term", k = 6, idCol = "doc_id")
        .collect().map(_.toSeq).toSet
      assert(raw.nonEmpty && idx == raw)
      // term-ceiling fallback: past maxLiteralTerms the postings and
      // vocab scans semi-join against the term frame (bucket pruning
      // off) — same rows at any workload size
      val idxFb = Retrieval.bm25TopKFromIndex(spark, name, queries, "qid",
          "term", k = 6, idCol = "doc_id", maxLiteralTerms = 0)
        .collect().map(_.toSeq).toSet
      assert(idxFb == raw)
    } finally Seq("_postings", "_vocab", "_stats").foreach(sfx =>
      graft.sources.Tables.dropWithLocation(spark, s"$name$sfx"))
  }

  test("incremental index ingest + replay equals the one-shot build") {
    val vocab = Vector("alpha", "beta", "gamma", "delta")
    val docs = (1L to 90L).map { id =>
      (id, (0 until 4 + (id % 7).toInt)
        .map(j => vocab(((id * 3 + j) % 4).toInt)).mkString(" "))
    }
    val queries = Seq(("qa", "alpha"), ("qa", "beta"), ("qb", "delta"))
      .toDF("qid", "term")
    val (inc, one) = ("retrspec_inc", "retrspec_one")
    val all = Seq("_postings", "_vocab", "_stats")
    try {
      def part(lo: Long, hi: Long) =
        docs.filter(d => d._1 > lo && d._1 <= hi).toDF("doc_id", "text")
      graft.ext.Retrieval.writeBm25Index(part(0, 30), "doc_id", "text",
        inc, buckets = 4)
      graft.ext.Retrieval.appendBm25Batch(part(30, 60), 0L, "doc_id",
        "text", inc, buckets = 4)
      graft.ext.Retrieval.appendBm25Batch(part(60, 90), 1L, "doc_id",
        "text", inc, buckets = 4)
      val before = spark.table(s"${inc}_postings").count()
      // replay: the batch's partitions are REPLACED, not duplicated
      graft.ext.Retrieval.appendBm25Batch(part(30, 60), 0L, "doc_id",
        "text", inc, buckets = 4)
      assert(spark.table(s"${inc}_postings").count() == before,
        "replayed batch must replace its own partition")
      graft.ext.Retrieval.writeBm25Index(part(0, 90), "doc_id", "text",
        one, buckets = 4)
      val got = Retrieval.bm25TopKFromIndex(spark, inc, queries, "qid",
        "term", k = 7, idCol = "doc_id").collect().map(_.toSeq).toSet
      val want = Retrieval.bm25TopKFromIndex(spark, one, queries, "qid",
        "term", k = 7, idCol = "doc_id").collect().map(_.toSeq).toSet
      assert(want.nonEmpty && got == want)
    } finally all.foreach { sfx =>
      graft.sources.Tables.dropWithLocation(spark, s"$inc$sfx")
      graft.sources.Tables.dropWithLocation(spark, s"$one$sfx")
    }
  }

  private def lifecycleDocs: Seq[(Long, String)] = {
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon")
    (1L to 100L).map { id =>
      (id, (0 until 3 + (id % 9).toInt)
        .map(j => vocab(((id * 7 + j * 2) % 5).toInt)).mkString(" "))
    }
  }
  private def lifecycleQueries =
    Seq(("qa", "alpha"), ("qa", "gamma"), ("qb", "epsilon"))
      .toDF("qid", "term")
  private def dropBm25(names: String*): Unit =
    for (n <- names; sfx <- Seq("_postings", "_vocab", "_stats", "_batches"))
      graft.sources.Tables.dropWithLocation(spark, s"$n$sfx")

  test("compaction folds to one base without changing one bit of any score") {
    val docs = lifecycleDocs
    val name = "retrspec_cmp"
    try {
      def slice(lo: Long, hi: Long) =
        docs.filter(d => d._1 > lo && d._1 <= hi).toDF("doc_id", "text")
      Retrieval.writeBm25Index(slice(0, 40), "doc_id", "text", name, buckets = 4)
      assert(Retrieval.ingestBm25Batch(slice(40, 70), 0L, "doc_id", "text", name, 4))
      assert(Retrieval.ingestBm25Batch(slice(70, 100), 1L, "doc_id", "text", name, 4))
      val before = Retrieval.bm25TopKFromIndex(spark, name,
        lifecycleQueries, "qid", "term", k = 7, idCol = "doc_id")
        .collect().map(_.toSeq).toSet
      Retrieval.compactBm25Index(spark, name)
      // every table folded to the single reserved base partition
      for (sfx <- Seq("_postings", "_vocab", "_stats"))
        assert(spark.table(s"$name$sfx").select("batch_id").distinct()
          .collect().map(_.getLong(0)).toSeq == Seq(Retrieval.compactedBatchId),
          s"$sfx not folded to the base partition")
      // vocab folded to ONE row per term; stats to ONE row
      val v = spark.table(s"${name}_vocab")
      assert(v.count() == v.select("tok").distinct().count())
      assert(spark.table(s"${name}_stats").count() == 1L)
      val after = Retrieval.bm25TopKFromIndex(spark, name,
        lifecycleQueries, "qid", "term", k = 7, idCol = "doc_id")
        .collect().map(_.toSeq).toSet
      assert(before.nonEmpty && after == before)
    } finally dropBm25(name)
  }

  test("marker gate: replay no-ops across the compaction boundary; an " +
      "unmarked in-flight batch passes through and replays as a replace") {
    val docs = lifecycleDocs
    val name = "retrspec_gate"
    try {
      def slice(lo: Long, hi: Long) =
        docs.filter(d => d._1 > lo && d._1 <= hi).toDF("doc_id", "text")
      Retrieval.writeBm25Index(slice(0, 40), "doc_id", "text", name, buckets = 4)
      assert(Retrieval.ingestBm25Batch(slice(40, 70), 0L, "doc_id", "text", name, 4))
      // in-flight half-append: batch 1's tables land but its marker
      // never does (the crash window between append and marker)
      Retrieval.appendBm25Batch(slice(70, 100), 1L, "doc_id", "text", name, 4)
      Retrieval.compactBm25Index(spark, name)
      // batch 1 was unmarked — its partitions must have survived the
      // fold intact, NOT been folded into the base
      assert(spark.table(s"${name}_postings").select("batch_id").distinct()
        .collect().map(_.getLong(0)).toSet ==
        Set(Retrieval.compactedBatchId, 1L))
      // replay of the MARKED batch 0 across the boundary: no-op
      val postingsBefore = spark.table(s"${name}_postings").count()
      assert(!Retrieval.ingestBm25Batch(slice(40, 70), 0L, "doc_id", "text", name, 4))
      assert(spark.table(s"${name}_postings").count() == postingsBefore)
      // replay of the UNMARKED batch 1: replaces its own partition
      // (no duplication) and finally lands the marker
      assert(Retrieval.ingestBm25Batch(slice(70, 100), 1L, "doc_id", "text", name, 4))
      assert(spark.table(s"${name}_postings").count() == postingsBefore)
      // final index serves the same scores as a one-shot build
      val one = "retrspec_gate_one"
      Retrieval.writeBm25Index(slice(0, 100), "doc_id", "text", one, buckets = 4)
      try {
        val got = Retrieval.bm25TopKFromIndex(spark, name,
          lifecycleQueries, "qid", "term", k = 7, idCol = "doc_id")
          .collect().map(_.toSeq).toSet
        val want = Retrieval.bm25TopKFromIndex(spark, one,
          lifecycleQueries, "qid", "term", k = 7, idCol = "doc_id")
          .collect().map(_.toSeq).toSet
        assert(want.nonEmpty && got == want)
      } finally dropBm25(one)
    } finally dropBm25(name)
  }

  test("a crash between table drop and stage rename is repaired by recovery") {
    val docs = lifecycleDocs
    val name = "retrspec_crash"
    try {
      Retrieval.writeBm25Index(docs.toDF("doc_id", "text"), "doc_id",
        "text", name, buckets = 4)
      val want = Retrieval.bm25TopKFromIndex(spark, name,
        lifecycleQueries, "qid", "term", k = 7, idCol = "doc_id")
        .collect().map(_.toSeq).toSet
      // construct the crash window exactly: a complete staged twin of
      // _vocab exists, the live table was dropped, the rename never ran
      val vocab = s"${name}_vocab"
      val stage = s"${vocab}__cstage"
      spark.table(vocab).write.partitionBy("batch_id")
        .bucketBy(4, "tok").format("parquet").saveAsTable(stage)
      graft.sources.Tables.dropWithLocation(spark, vocab)
      // every read in the window fails loudly (table missing) …
      intercept[Exception] { spark.table(vocab).count() }
      // … and recovery finishes the swap
      assert(Retrieval.recoverBm25Compaction(spark, name))
      val got = Retrieval.bm25TopKFromIndex(spark, name,
        lifecycleQueries, "qid", "term", k = 7, idCol = "doc_id")
        .collect().map(_.toSeq).toSet
      assert(got == want)
      // idempotent: nothing left to repair
      assert(!Retrieval.recoverBm25Compaction(spark, name))
    } finally dropBm25(name)
  }

  test("bm25TopK rejects a non-numeric id column") {
    val ex = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(Seq(("a", "x")).toDF("doc_id", "text"), "doc_id",
        "text", Seq(("q", "x")).toDF("qid", "term"), "qid", "term", 3)
    }
    assert(ex.getMessage.contains("numeric id"))
  }

  test("rrfFuse matches a hand-rolled reciprocal-rank fusion") {
    // partial overlap (10/11 in both lists, 12 only in a, 13 only in
    // b) plus a SYMMETRIC rank pattern in q3 (fused scores equal, so
    // the id tie-break decides)
    val a = Seq(("q1", 10L, 1L), ("q1", 11L, 2L), ("q1", 12L, 3L),
      ("q2", 20L, 1L), ("q3", 30L, 1L), ("q3", 31L, 2L))
      .toDF("qid", "id", "r")
    val b = Seq(("q1", 11L, 1L), ("q1", 13L, 2L), ("q1", 10L, 3L),
      ("q2", 22L, 1L), ("q3", 31L, 1L), ("q3", 30L, 2L))
      .toDF("qid", "id", "r")
    def rrf(ranks: Long*): Double = ranks.map(r => 1.0 / (r + 60)).sum
    val expect = Map(
      "q1" -> Seq( // fused: 11 > 10 > 13 > 12, k=3 cuts 12
        (11L, rrf(2, 1), 1L), (10L, rrf(1, 3), 2L), (13L, rrf(2), 3L)),
      "q2" -> Seq((20L, rrf(1), 1L), (22L, rrf(1), 2L)),
      "q3" -> Seq((30L, rrf(1, 2), 1L), (31L, rrf(2, 1), 2L)))
    val got = Retrieval.rrfFuse(a, b, "qid", "id", "r", k = 3)
      .collect().groupBy(_.getString(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(_.getLong(3))
          .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3))).toSeq
      }
    assert(got == expect)
  }

  test("per-suite flag probes union to the one-shot decontamination flag set") {
    // the q118 semantic claim: flagging is per query (top-k within
    // the query, floor on the rounded score), so probing suites one
    // at a time and unioning flags equals one probe of the union set
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    val docs = (1L to 150L).map { id =>
      val len = 4 + (id % 13).toInt
      val words = (0 until len).map(j => vocab(((id * 11 + j * 3) % 42 % 6).toInt))
      (id, words.mkString(" "))
    }.toDF("doc_id", "text")
    val suites = Seq(
      ("s_a", Seq("alpha", "gamma")),
      ("s_b", Seq("zeta", "beta")),
      ("s_c", Seq("epsilon", "delta", "alpha")))
    def flags(qs: Seq[(String, Seq[String])]) =
      Retrieval.bm25TopK(docs, "doc_id", "text",
          qs.flatMap { case (q, ts) => ts.map((q, _)) }.toDF("qid", "term"),
          "qid", "term", k = 9)
        .where(col("score") >= 1.0)
        .select("doc_id").distinct()
        .collect().map(_.getLong(0)).toSet
    val oneShot = flags(suites)
    val unioned = suites.map(s => flags(Seq(s))).reduce(_ ++ _)
    assert(oneShot.nonEmpty && unioned == oneShot)
  }
}
