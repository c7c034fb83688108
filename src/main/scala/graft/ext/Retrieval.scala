package graft.ext

import graft.functions.ColFns._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * Two forms, one scoring tail (they cannot drift):
  *   - [[bm25TopK]] scores straight off the raw corpus (one-shot);
  *   - [[writeBm25Index]] + [[bm25TopKFromIndex]] persist the
  *     postings/vocab/stats tables once and serve every subsequent
  *     query workload from them — the production shape: a probe
  *     reads ONLY the buckets holding its query terms (bucket
  *     pruning on the `tok`-bucketed postings table), so probe cost
  *     is O(query postings), independent of corpus size.
  *
  * Scale shape (the part that matters at 100 TB):
  *   - the ONLY corpus-wide work is one projection computing each
  *     doc's token array + length — per-row, codegen'd, no shuffle
  *     (the index BUILD pays the one full tf aggregation, once);
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

  /** BM25 top-k documents per query, scored off the raw corpus.
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
    requireNumericId(docs, idCol, "bm25TopK")
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
    // df per query term — derived from the already-filtered postings
    val dfc = tf.groupBy(col("__tok")).agg(count(lit(1)).as("__df"))
    scoreAndTopK(tf, dfc, queries, qidCol, termCol, idCol, k, k1, b,
      stats.getLong(0), stats.getDouble(1))
  }

  /** The batch_id the initial [[writeBm25Index]] bootstrap lands
    * under — below every ingest batch id (those start at 0), the
    * [[Dedup.bootstrapBatchId]] convention. */
  val bootstrapBatchId: Long = -1L

  /** Persist the BM25 index for a corpus as three `batch_id`-
    * partitioned tables — the build-once half of the production pair,
    * and the base an incremental ingest ([[appendBm25Batch]]) extends:
    *   - `<name>_postings` (tok, id, tf, len), BUCKETED BY `tok` so
    *     a probe's `tok IN (...)` filter prunes to the buckets
    *     holding its query terms (plus parquet row-group pruning via
    *     the same pushed filter);
    *   - `<name>_vocab` (tok, df) — same bucketing; per-partition df
    *     values SUM to the corpus df (batches hold disjoint docs);
    *   - `<name>_stats` (n_docs, total_len) — one row per batch,
    *     both additive.  Totals are LONGS divided once at probe time
    *     (exact at any corpus size, where a running double mean
    *     would drift).
    * The build pays the full corpus-vocabulary tf aggregation once;
    * every subsequent workload probes in O(query postings).  Size
    * `buckets` so one bucket's postings fit a task (vocab is
    * Zipf-distributed: stopword postings dominate — at web scale use
    * O(10³) buckets). */
  def writeBm25Index(docs: DataFrame, idCol: String, textCol: String,
      name: String, buckets: Int = 16): Unit = {
    requireNumericId(docs, idCol, "writeBm25Index")
    val s = docs.sparkSession
    // _purged too: a rebuilt index carries no purge debt — a stale
    // ledger from a prior instance would mask fresh ingests
    Seq("_postings", "_vocab", "_stats", "_batches", "_purged").foreach(
      sfx => graft.sources.Tables.dropWithLocation(s, s"$name$sfx"))
    writeBm25Tables(docs, idCol, textCol, name, buckets, bootstrapBatchId)
  }

  /** Append one ingest batch to a [[writeBm25Index]] index — the
    * incremental half: per batch, ONLY the batch's own postings/
    * vocab/stats aggregate and land as that batch's `batch_id`
    * partitions; nothing already stored is read or rewritten, so
    * per-batch cost is O(|batch| tokens) regardless of index size.
    *
    * Correctness leans on two contracts: batches hold docs DISJOINT
    * from everything already indexed (df and the stats totals are
    * then additive across partitions — the [[Dedup]] index's "batch
    * ids disjoint from indexed ids" rule), and writes are
    * single-writer.  Replay-safe the way the LSH index is: each
    * table lands the batch as a dynamic-overwrite of its OWN
    * partition, so a crash-replay REPLACES the partition instead of
    * duplicating it — q109's gate run replays a batch mid-sequence
    * and must still hash-match the one-shot oracle. */
  def appendBm25Batch(docs: DataFrame, batchId: Long, idCol: String,
      textCol: String, name: String, buckets: Int = 16): Unit = {
    requireNumericId(docs, idCol, "appendBm25Batch")
    require(batchId >= 0, s"ingest batch ids start at 0, got $batchId " +
      s"(negative ids are reserved for the bootstrap)")
    writeBm25Tables(docs, idCol, textCol, name, buckets, batchId)
  }

  /** Shared writer: the batch's postings/vocab/stats as `batchId`'s
    * partitions (creating the partitioned+bucketed tables on first
    * use, dynamic-overwriting the batch's own partition after — the
    * replay-replace contract). */
  private def writeBm25Tables(docs: DataFrame, idCol: String,
      textCol: String, name: String, buckets: Int, batchId: Long): Unit = {
    val s = docs.sparkSession
    val tf = docs.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("len"),
        explode(col("__toks")).as("tok"))
      .groupBy(col("tok"), col(idCol))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
      // canonical column name: the stored id column is always `id`
      // (the probe renames it back to the caller's idCol)
      .select(col("tok"), col(idCol).as("id"), col("tf"), col("len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      writePartition(tf, s"${name}_postings", batchId, Some(buckets))
      // df from the batch's postings (no second corpus pass; the agg
      // rides the persisted frame)
      writePartition(tf.groupBy(col("tok")).agg(count(lit(1)).as("df")),
        s"${name}_vocab", batchId, Some(buckets))
      writePartition(
        docs.select(size(tokens(col(textCol))).as("__l"))
          .agg(count(lit(1)).as("n_docs"),
            coalesce(sum(col("__l").cast("long")), lit(0L)).as("total_len")),
        s"${name}_stats", batchId, None)
    } finally tf.unpersist()
  }

  /** Land `df` as `table`'s `batch_id=batchId` partition (bucketed by
    * `tok` when `buckets` is set) — create-or-dynamic-overwrite, the
    * [[IndexLifecycle]] index-table protocol. */
  private def writePartition(df: DataFrame, table: String, batchId: Long,
      buckets: Option[Int]): Unit =
    IndexLifecycle.writeBatchPartition(df, table, batchId,
      buckets.map(b => ("tok", b)))

  // ---- index lifecycle: marker-gated ingest + compaction ----------------

  /** Reserved batch_id the compacted index base lands under — below
    * [[bootstrapBatchId]] and every real (≥ 0) ingest batch id, the
    * [[IndexLifecycle.compactedBatchId]] convention. */
  val compactedBatchId: Long = IndexLifecycle.compactedBatchId

  /** Marker-gated ingest — the replay gate [[appendBm25Batch]] alone
    * cannot provide ACROSS a compaction: dynamic partition overwrite
    * makes a replay a REPLACE only while the batch's partition still
    * exists; once [[compactBm25Index]] folds it into the base, a raw
    * re-append would re-add the batch's docs and double-count df.
    * So the production loop lands batches through here: a batch id
    * already in `<name>_batches` no-ops BEFORE any write (returns
    * false), otherwise the append runs and the marker lands after
    * all three tables — a crash in between replays as a harmless
    * partition replace (the marker is last, the [[Dedup]] protocol).
    * Single-writer, like every index mutation here. */
  def ingestBm25Batch(docs: DataFrame, batchId: Long, idCol: String,
      textCol: String, name: String, buckets: Int = 16): Boolean = {
    val s = docs.sparkSession
    if (IndexLifecycle.committedIds(s, name).contains(batchId)) false
    else {
      appendBm25Batch(docs, batchId, idCol, textCol, name, buckets)
      IndexLifecycle.markBatch(s, name, batchId)
      true
    }
  }

  /** Fold the index's per-batch partitions into one consolidated
    * base — the BM25 twin of [[Dedup.compactLshIndex]], and the step
    * that bounds probe cost at a real ingest cadence: every append
    * lands ~tasks×buckets new files per table and the probe reads
    * every partition of the pruned buckets, so probe wall time grows
    * with batches-since-compaction until the fold.
    *
    * What folds, per table (marked batches + every negative system
    * partition; an UNMARKED in-flight batch — a crash between append
    * and marker — passes through untouched so its replay-replace
    * still works):
    *   - `_postings`: rows are disjoint across batches — relabel to
    *     [[compactedBatchId]] and re-bucket, one file per bucket;
    *   - `_vocab`: df is additive across disjoint batches — the fold
    *     SUMS per token, so the consolidated base is one row per
    *     term (the probe's sum over partitions reads fewer rows but
    *     computes the same long);
    *   - `_stats`: additive longs — folds to ONE row.
    * The probe is sum-shaped over all three, so compaction cannot
    * change any score bit (RetrievalSpec pins it; q110 gates it).
    *
    * Crash safety is the staged-swap protocol: each table rewrites
    * into `<tbl>__cstage` (live table untouched until the stage is
    * complete), then drop + rename.  A crash between drop and rename
    * leaves the table MISSING — loud, never wrong — and
    * [[recoverBm25Compaction]], run first by every compaction,
    * finishes the swap.  Requires a quiesced index (no concurrent
    * ingest) — the single-maintenance-owner cadence. */
  def compactBm25Index(spark: SparkSession, name: String): Unit = {
    recoverBm25Compaction(spark, name)
    val post = s"${name}_postings"
    val vocab = s"${name}_vocab"
    val stats = s"${name}_stats"
    if (!Seq(post, vocab, stats).forall(spark.catalog.tableExists)) return
    // a ledger partition of an UNMARKED batch = a crashed purge whose
    // signed deltas never landed — erasing past it would permanently
    // corrupt N/avgdl/df and wedge the replay; fail loudly instead
    IndexLifecycle.requireLedgerCommitted(spark, name)
    val committed = IndexLifecycle.committedIds(spark, name)
    // the ERASING leg: purged docs' posting rows (until now only
    // masked at probe time) are physically dropped from the folded
    // base; the vocab fold nets the purge's signed df deltas out and
    // drops zeroed terms (a no-op absent purges — per-batch df is
    // ≥ 1); the stats fold already sums the signed deltas.  The
    // ledger itself folds to empty LAST, below.
    val purged = IndexLifecycle.purgedIds(spark, name)
      .map(_.localCheckpoint())
    // postings: disjoint rows — relabel (and erase purged ids)
    IndexLifecycle.swapFold(spark, post, committed,
      (df, base) => purged.fold(df)(p =>
          df.join(broadcast(p), Seq("id"), "left_anti"))
        .withColumn("batch_id", base))
    // vocab: df sums across disjoint batches — fold to one row per term
    IndexLifecycle.swapFold(spark, vocab, committed,
      (df, base) => df.groupBy(col("tok"))
        .agg(sum(col("df")).as("df")).where(col("df") =!= 0L)
        .withColumn("batch_id", base))
    // stats: additive longs — fold to one row
    IndexLifecycle.swapFold(spark, stats, committed,
      (df, base) => df
        .agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(sum(col("total_len")), lit(0L)).as("total_len"))
        .withColumn("batch_id", base))
    // the marker table folds to one file, preserving EVERY id — the
    // seen gate is what keeps folded partitions replay-safe
    IndexLifecycle.foldMarkerTable(spark, name)
    // ledger last: every erase above landed, nothing references the
    // purged ids any more ([[IndexLifecycle.foldLedgerEmpty]])
    IndexLifecycle.foldLedgerEmpty(spark, name, committed)
  }

  /** Finish a [[compactBm25Index]] swap a crash interrupted between
    * the live-table drop and the stage rename — the only window where
    * a table is missing (every read there fails loudly, never answers
    * from a partial index).  Idempotent; returns true if any repair
    * ran.  Compaction runs it first, so "re-run compaction" is the
    * whole recovery runbook. */
  def recoverBm25Compaction(spark: SparkSession, name: String): Boolean = {
    val partitioned = Set(s"${name}_postings", s"${name}_vocab",
      s"${name}_stats", IndexLifecycle.purgedTable(name))
    IndexLifecycle.recoverSwaps(spark,
      (partitioned + s"${name}_batches").toSeq, partitioned)
  }

  /** Ceiling on the query-term `isin` literal the index probes build
    * ([[bm25TopKFromIndex]], [[Hygiene.bm25TopKFromMutable]]): under
    * it, terms collect to the driver and the literal is what enables
    * bucket pruning; past it the probe falls back to a semi-join
    * against the distinct-term frame (logged) — correct at any term
    * count, and nothing of value is lost, because a term set much
    * larger than the bucket count hits every bucket anyway, so the
    * literal's pruning gain vanishes exactly where the list outgrows
    * the plan. */
  val DefaultMaxLiteralTerms: Int = 10000

  /** Query-term slice of an index table: the bounded-or-fallback
    * dispatch shared by the postings and vocab scans.  `terms` is the
    * DISTINCT cast-to-string term frame; `probe` its
    * `limit(max+1)`-collected prefix. */
  private[ext] def termSlice(table: DataFrame, probe: Seq[String],
      terms: DataFrame, maxLiteralTerms: Int): DataFrame =
    if (probe.size <= maxLiteralTerms)
      table.where(col("tok").isin(probe: _*))
    else
      // no broadcast hint: AQE picks (a just-over-ceiling term frame
      // still broadcasts; a truly huge one shuffles — both correct)
      table.join(terms.select(col("tok")), Seq("tok"), "left_semi")

  /** Collect up to `max + 1` distinct terms — the dispatch probe for
    * [[termSlice]]; logs the fallback once when the set overflows. */
  private[ext] def termProbe(terms: DataFrame, maxLiteralTerms: Int,
      op: String): Seq[String] = {
    // contract check, not a clamp: Int.MaxValue "disables" nothing —
    // the + 1 would overflow negative and reach Spark as limit(<0)
    require(maxLiteralTerms >= 0 && maxLiteralTerms < Int.MaxValue,
      s"maxLiteralTerms must be in [0, Int.MaxValue): got $maxLiteralTerms " +
        "(0 forces the semi-join fallback; there is no 'unlimited' value)")
    val probe = terms.limit(maxLiteralTerms + 1).collect()
      .map(_.getString(0)).toSeq
    if (probe.size > maxLiteralTerms)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"$op: query-term set exceeds maxLiteralTerms=$maxLiteralTerms " +
          "— semi-join fallback (bucket pruning off; a term set this " +
          "large hits every bucket regardless)")
    probe
  }

  /** BM25 top-k served from a persisted [[writeBm25Index]] index —
    * result-identical to [[bm25TopK]] over the same corpus
    * (RetrievalSpec pins it; the scoring tail is shared code).
    *
    * The query-term set collects to the driver (a query workload is
    * KBs — the bounded-collect contract) and becomes an `isin`
    * LITERAL filter, which is what enables BUCKET pruning on the
    * postings/vocab scans: the probe reads only the buckets that can
    * hold its terms (`SelectedBucketsCount` in the plan,
    * PlanShapeSpec-pinned) — probe cost is independent of corpus
    * size.  The collect is guarded: past `maxLiteralTerms` the scans
    * fall back to a semi-join against the term frame
    * ([[termSlice]]), same rows at any workload size. */
  def bm25TopKFromIndex(spark: SparkSession, name: String,
      queries: DataFrame, qidCol: String, termCol: String, k: Int,
      idCol: String = "id", k1: Double = 1.2, b: Double = 0.75,
      maxLiteralTerms: Int = DefaultMaxLiteralTerms): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = queries.select(col(termCol).cast("string").as("tok"))
      .distinct()
    val probe = termProbe(terms, maxLiteralTerms, "bm25TopKFromIndex")
    // purge mask: between a [[graft.ext.Purge.purgeBm25Index]] and
    // the erasing compaction, purged docs' posting rows are still
    // physically present — drop them here (broadcast anti-join, the
    // ledger is takedown-churn-sized).  df/N/avgdl need no mask: the
    // purge landed SIGNED vocab/stats delta partitions and the sums
    // below already net them out.  Absent a ledger table the plan is
    // untouched (the bucket-pruned shape PlanShapeSpec pins).
    val postRaw = termSlice(spark.table(s"${name}_postings"), probe, terms,
      maxLiteralTerms)
    val post = IndexLifecycle.purgedIds(spark, name)
      .fold(postRaw)(p => postRaw.join(broadcast(p), Seq("id"), "left_anti"))
      .select(col("tok").as("__tok"), col("id").as(idCol),
        col("tf").as("__tf"), col("len").as("__len"))
    // per-batch df values sum to the corpus df (disjoint batches);
    // the agg is co-located on the bucket key, no exchange
    val dfc = termSlice(spark.table(s"${name}_vocab"), probe, terms,
        maxLiteralTerms)
      .groupBy(col("tok").as("__tok"))
      .agg(sum(col("df")).as("__df"))
    // stats rows are additive longs, one per batch — divide ONCE here
    val st = spark.table(s"${name}_stats")
      .agg(sum(col("n_docs")).as("n"), sum(col("total_len")).as("t")).first()
    val nDocs = st.getLong(0)
    scoreAndTopK(post, dfc, queries, qidCol, termCol, idCol, k, k1, b,
      nDocs, st.getLong(1).toDouble / nDocs.toDouble)
  }

  /** Shared scoring + bounded top-k tail: `tf` = (idCol, __tok, __tf,
    * __len) postings of the query terms, `dfc` = (__tok, __df).  One
    * definition for both the raw-corpus and index-served paths so the
    * idf/score arithmetic cannot drift between them. */
  private[ext] def scoreAndTopK(tf: DataFrame, dfc: DataFrame,
      queries: DataFrame, qidCol: String, termCol: String, idCol: String,
      k: Int, k1: Double, b: Double, nDocs: Long, avgdl: Double): DataFrame = {
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

  /** Reciprocal-rank fusion of two bounded per-query rank lists:
    * `rrf(d) = Σ_list 1/(rrfK + rank_list(d))`, the score-free fusion
    * for rank lists whose scores live on incomparable scales (BM25 vs
    * cosine; Cormack et al., SIGIR'09).  Each input carries
    * (qidCol, idCol, rankCol); a doc absent from one list contributes
    * 0 for it.  Output: (qidCol, idCol, `rrf_score` = the raw fused
    * double, `rank` 1..k by (rrf desc, id asc)).
    *
    * Scale shape: inputs are top-k lists — bounded at |queries| × k
    * rows each — so the full-outer join and the per-query re-rank
    * window run over ≤ 2k rows per query, never the corpus.  Ranks
    * are small exact integers, so the fused double is bit-stable
    * across engines and runs. */
  def rrfFuse(a: DataFrame, b: DataFrame, qidCol: String, idCol: String,
      rankCol: String, k: Int, rrfK: Int = 60): DataFrame = {
    require(k > 0 && rrfK >= 0, s"k must be positive, rrfK non-negative")
    requireNumericId(a, idCol, "rrfFuse")
    def side(df: DataFrame, tag: String) =
      df.select(col(qidCol), col(idCol), col(rankCol).as(tag))
    val fused = side(a, "__ra").join(side(b, "__rb"),
        Seq(qidCol, idCol), "full_outer")
      .withColumn("rrf_score",
        coalesce(lit(1.0) / (col("__ra") + lit(rrfK)), lit(0.0)) +
          coalesce(lit(1.0) / (col("__rb") + lit(rrfK)), lit(0.0)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(qidCol).orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col(qidCol), col(idCol), col("rrf_score"), col("rank"))
  }

  private def requireNumericId(df: DataFrame, idCol: String,
      op: String): Unit =
    require(df.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op requires a numeric id column for its (score desc, " +
        s"id asc) tie-break; '$idCol' is ${df.schema(idCol).dataType}")
}
