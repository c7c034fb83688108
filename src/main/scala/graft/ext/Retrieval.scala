package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch full-text retrieval over a document corpus: BM25 scoring +
  * bounded top-k, the ranking layer on top of the q62-style inverted
  * index — what a corpus-QA / decontamination-by-retrieval / hard-
  * negative-mining pipeline runs against training data.
  *
  * Reference scope note: the reference library has no text operators
  * at all (its rows are opaque — SURVEY §2.2); this is north-star
  * extension surface.  BM25 per Robertson et al. (TREC-3, 1994) with
  * the Lucene-style idf `ln(1 + (N - df + 0.5)/(df + 0.5))`, which is
  * always positive.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - the ONLY corpus-wide work is one projection computing each
  *     doc's token array + length — per-row, codegen'd, no shuffle;
  *   - query terms broadcast (a query workload is KBs), and tokens
  *     are semi-joined against them BEFORE any aggregation, so the
  *     tf shuffle carries only postings of query terms —
  *     O(Σ_t df(t)), not O(total tokens);
  *   - per-term contributions are summed as DECIMAL(38,15), making
  *     the score independent of partition/merge order (the
  *     double-sum convention every gate aggregate uses);
  *   - the per-query top-k is a bounded CollectTopK aggregation
  *     (map partials ≤ k, one O(queries × k) merge) — never a
  *     window sort of the scored postings.
  */
object Retrieval {

  /** BM25 top-k documents per query.
    *
    * @param docs    corpus; `idCol` must be numeric (tie-break
    *                contract), `textCol` is tokenized with the
    *                library tokenizer ([[graft.functions.ColFns.tokens]])
    * @param queries (qidCol, termCol) rows — one row per query term,
    *                duplicate terms within a query are counted once
    *                (standard bag-of-words BM25 over distinct terms)
    * @param k       results per query
    * @return (qidCol, idCol, `score` = BM25 rounded to 6 decimals,
    *         `rank` 1..k by (score desc, id asc))
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qidCol: String, termCol: String, k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    require(docs.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"bm25TopK requires a numeric id column for its (score desc, " +
        s"id asc) tie-break; '$idCol' is ${docs.schema(idCol).dataType}")
    // one corpus projection: per-doc token list + length (no shuffle)
    val toked = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("__len"),
        explode(col("__toks")).as("__tok"))
    val terms = queries.select(col(termCol).as("__tok")).distinct()
    // postings of query terms only: the broadcast semi-join runs
    // BEFORE the tf aggregation, so the shuffle is O(query postings)
    val tf = toked.join(broadcast(terms), Seq("__tok"), "left_semi")
      .groupBy(col(idCol), col("__tok"))
      .agg(count(lit(1)).as("__tf"), max(col("__len")).as("__len"))
    // corpus stats: two bounded scalars (count + mean token length).
    // Token counts come from the same per-row projection; the agg is
    // a map-side-partial count/sum, not a shuffle of the corpus.
    val stats = docs.select(size(tokens(col(textCol))).as("__l"))
      .agg(count(lit(1)).as("n"), avg(col("__l")).as("avgdl")).first()
    val nDocs = stats.getLong(0)
    val avgdl = stats.getDouble(1)
    // df per query term — derived from the already-filtered postings
    val dfc = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    val idf = log(lit(1.0) +
      (lit(nDocs.toDouble) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val contrib = idf * (col("__tf") * lit(k1 + 1.0)) /
      (col("__tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("__len") / lit(avgdl)))
    // tf (the big side) streams past the broadcast query/df tables
    val scored = tf
      .join(broadcast(
        queries.select(col(qidCol), col(termCol).as("__tok")).distinct()),
        Seq("__tok"))
      .join(broadcast(dfc), Seq("__tok"))
      .groupBy(col(qidCol), col(idCol))
      // decimal sum: the score is independent of term merge order
      .agg(sum(contrib.cast("decimal(38,15)")).as("__score"))
    // bounded top-k per query: natural struct order keeps the k
    // largest (score, -id) = best score, then smallest id
    scored
      .groupBy(col(qidCol))
      .agg(org.apache.spark.sql.graftshim.Bridge.collectTopK(
        struct(col("__score").as("s"), (-col(idCol)).as("nid"),
          col(idCol).as("id")), k, reverse = false).as("top"))
      .select(col(qidCol),
        posexplode(sort_array(col("top"), asc = false)).as(Seq("__p", "r")))
      .select(col(qidCol), col("r.id").as(idCol),
        round(col("r.s").cast("double"), 6).as("score"),
        (col("__p") + 1).cast("long").as("rank"))
  }
}
