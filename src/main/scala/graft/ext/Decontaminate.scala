package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the overlap check every training
  * pipeline runs before the corpus ships: flag corpus documents that
  * share word n-grams with a held-out evaluation/benchmark set
  * (exact-substring contamination at token granularity).
  *
  * Scale shape: the holdout side is a benchmark suite — megabytes, not
  * terabytes — so its distinct gram-hash table broadcasts and the
  * corpus NEVER shuffles its grams: the overlap join is map-side, and
  * the only exchange is the per-document partial-count aggregation of
  * the matching grams (a tiny fraction of the corpus).  Grams travel
  * as 60-bit md5-slice hashes (primitive longs), not strings.  If the
  * holdout ever outgrows broadcast, [[Bloom.semiJoinPrune]] is the
  * same pattern with a bitset instead of a hash table.
  */
object Decontaminate {

  /** Per-document count of DISTINCT word `n`-grams shared with any
    * holdout document: (idCol, n_shared), only documents with ≥ 1
    * shared gram.  Callers exclude the holdout itself from `corpus`
    * (or every holdout doc trivially flags itself). */
  def overlap(corpus: DataFrame, holdout: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    def gramHashes(t: Column): Column =
      transform(array_distinct(wordShingles(tokens(t), n)), g => h60(g))
    val hg = holdout
      .select(explode(gramHashes(col(textCol))).as("h"))
      .distinct()
    // same parallelism floor as the dedup preps: the per-row md5 pass
    // must not serialize on a few input splits
    val cg = Dedup.parallelized(corpus)
      .select(col(idCol), explode(gramHashes(col(textCol))).as("h"))
    cg.join(broadcast(hg), Seq("h"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_shared"))
  }
}
