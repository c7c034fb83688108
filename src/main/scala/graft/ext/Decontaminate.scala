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
  /** Broadcast guard: the distinct holdout gram table is persisted
    * and counted first; above `maxBroadcastGrams` the map-side
    * broadcast join falls back to [[Bloom.semiJoinPrune]] (bitset
    * prune + exact shuffle semi-join — same rows, bounded driver
    * memory) with a logged note.  Release the persisted gram table
    * via [[Dedup.unpersistInputsOf]] on the result. */
  def overlap(corpus: DataFrame, holdout: DataFrame, idCol: String,
      textCol: String, n: Int = 5,
      maxBroadcastGrams: Long = 20000000L): DataFrame = {
    def gramHashes(t: Column): Column =
      transform(array_distinct(wordShingles(tokens(t), n)), g => h60(g))
    val hg = holdout
      .select(explode(gramHashes(col(textCol))).as("h"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nGrams = hg.count()
    // same parallelism floor as the dedup preps: the per-row md5 pass
    // must not serialize on a few input splits
    val cg = Dedup.parallelized(corpus)
      .select(col(idCol), explode(gramHashes(col(textCol))).as("h"))
    // hg is DISTINCT, so inner join ≡ semi join on membership — both
    // branches keep exactly the corpus grams present in the holdout
    val matched =
      if (nGrams <= maxBroadcastGrams) cg.join(broadcast(hg), Seq("h"))
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"Decontaminate.overlap: $nGrams holdout grams exceed " +
            s"maxBroadcastGrams=$maxBroadcastGrams — bloom-prune + " +
            "shuffle semi-join fallback")
        Bloom.semiJoinPrune(cg, "h", hg, "h")
      }
    Dedup.registerCleanup(
      matched.groupBy(col(idCol)).agg(count(lit(1)).as("n_shared")), hg)
  }

  /** Within-corpus repeated-passage signal (exact-substring dedup at
    * token granularity, the Lee et al. "Deduplicating Training Data"
    * shape): for EVERY document, how many of its distinct word
    * `n`-grams also appear in at least one other document.  Zero for
    * clean docs; near-dup and boilerplate docs score high.
    *
    * Scale shape: both sides of the gram join are the SAME exploded
    * (id, gram-hash) table — one shuffle by gram hash for the
    * document-frequency aggregation, one for the join back, grams as
    * 60-bit longs throughout; never an all-pairs comparison.  The
    * df>1 filter happens before the join back, so only actually-
    * repeated grams (a tiny fraction of a natural corpus) flow into
    * the per-doc count. */
  /** Cross-document repeated-passage REMOVAL — the acting form of
    * [[repeatedPassages]]'s signal (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", ACL 2022, the
    * ExactSubstr variant at word-`n`-gram granularity): re-emit every
    * document with the token spans covered by grams that ALSO occur
    * in an earlier document removed, keeping exactly one copy of
    * every repeated passage corpus-wide.
    *
    * Keep rule (deterministic, engine-independent): a gram's
    * CANONICAL document is the smallest `idCol` containing it; in any
    * later document, all `n` tokens under that gram are dropped.  The
    * canonical document keeps its copy even when the gram repeats
    * within it (intra-doc repetition is
    * [[TextOps.dedupChunks]]'s job).  Documents shorter than `n`
    * tokens pass through unchanged.
    *
    * Scale shape: one (id, pos, gram-hash) exploded table, persisted
    * and read twice (min-id aggregation, join back) — the
    * [[repeatedPassages]] shuffle pair, grams as 60-bit longs; only
    * MARKED positions (repeated grams, a small fraction of a natural
    * corpus) flow into the per-doc mark lists, which broadcast back
    * into the corpus rebuild under a counted guard
    * (`maxBroadcastMarkedDocs`, shuffle-join fallback above it) — the
    * corpus itself never shuffles.  The rebuild is per-row HOFs over
    * the materialized token array (the q98 two-step projection
    * contract).  Release the persisted gram table via
    * [[Dedup.unpersistInputsOf]] on the result.
    *
    * Returns (idCol, `clean_text`, `n_kept`, `n_removed`). */
  def removeRepeatedPassages(corpus: DataFrame, idCol: String,
      textCol: String, n: Int = 8,
      maxBroadcastMarkedDocs: Long = 4000000L): DataFrame = {
    val toked = Dedup.parallelized(corpus)
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
    val grams = toked
      .select(col(idCol), posexplode(wordShingles(col("__toks"), n))
        .as(Seq("__p0", "__g")))
      .select(col(idCol), (col("__p0") + 1).as("__pos"), h60(col("__g")).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keeper = grams.groupBy(col("h")).agg(min(col(idCol)).as("__keeper"))
    // marked docs: per-doc 1-based start positions of dropped spans
    val marks = grams.join(keeper, Seq("h"))
      .where(col("__keeper") < col(idCol))
      .groupBy(col(idCol)).agg(collect_list(col("__pos")).as("__starts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nMarked = marks.count()
    val marksSide =
      if (nMarked <= maxBroadcastMarkedDocs) broadcast(marks)
      else {
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"removeRepeatedPassages: $nMarked marked docs exceed " +
            s"maxBroadcastMarkedDocs=$maxBroadcastMarkedDocs — " +
            "shuffle-join fallback for the rebuild")
        marks
      }
    // two-step rebuild over bound attributes: kept INDICES first
    // (token i survives iff no dropped span s covers it), tokens after
    val kept = toked.join(marksSide, Seq(idCol), "left")
      .select(col(idCol), col("__toks"),
        coalesce(col("__starts"), array().cast("array<int>")).as("__st"))
      .select(col(idCol), col("__toks"),
        // size-0 guard: sequence(1, 0) counts DOWN (TextOps note)
        when(size(col("__toks")) === 0, array().cast("array<int>"))
          .otherwise(filter(sequence(lit(1), size(col("__toks"))),
            i => !exists(col("__st"),
              s => s <= i && s + lit(n - 1) >= i))).as("__keep"))
    Dedup.registerCleanup(
      kept.select(col(idCol),
        concat_ws(" ", transform(col("__keep"),
          i => element_at(col("__toks"), i))).as("clean_text"),
        size(col("__keep")).cast("long").as("n_kept"),
        (size(col("__toks")) - size(col("__keep"))).cast("long").as("n_removed")),
      grams, marks)
  }

  def repeatedPassages(corpus: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    def gramHashes(t: Column): Column =
      transform(array_distinct(wordShingles(tokens(t), n)), g => h60(g))
    // persisted: BOTH the df aggregation and the join-back read the
    // gram table — without the persist the md5 gram pass runs twice
    // (same reasoning as Dedup.lshPairs; release via
    // Dedup.unpersistInputsOf on the result)
    val grams = Dedup.parallelized(corpus)
      .select(col(idCol), explode(gramHashes(col(textCol))).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val docFreq = grams.groupBy("h").agg(count(lit(1)).as("docs"))
    val dupCounts = grams.join(docFreq.where(col("docs") > 1), Seq("h"))
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_dup_grams"))
    Dedup.registerCleanup(
      corpus.select(col(idCol)).distinct()
        .join(dupCounts, Seq(idCol), "left")
        .select(col(idCol),
          coalesce(col("n_dup_grams"), lit(0L)).as("n_dup_grams")),
      grams)
  }
}
