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

  test("bm25TopK rejects a non-numeric id column") {
    val ex = intercept[IllegalArgumentException] {
      Retrieval.bm25TopK(Seq(("a", "x")).toDF("doc_id", "text"), "doc_id",
        "text", Seq(("q", "x")).toDF("qid", "term"), "qid", "term", 3)
    }
    assert(ex.getMessage.contains("numeric id"))
  }
}
