package graft.ext

import graft.functions.ColFns._
import graft.sources.TxLog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The INCREMENTAL/STREAMED twin of the composed corpus-hygiene
  * pipeline (the q122 one-shot: survivor filter → cross-doc passage
  * removal → decontamination by retrieval → quality gate → split).
  * Each arriving batch flows through every stage in ONE per-batch
  * pass, and the resolved logs reproduce the one-shot pipeline
  * bit-for-bit — the composition-level version of the per-family
  * guarantees q93/q103 (dedup), q120/q121 (passages) and q118/q119
  * (decontamination) each pin alone.  This is the reference's
  * composition claim (`/root/reference/src/Control/MapReduce/Core.hs:38-41`
  * — steps compose without re-scanning) held at the whole-pipeline
  * level.
  *
  * Why composition is harder than the sum of the parts: the survivor
  * set is NOT monotone.  A batch's arrivals can merge two clusters
  * and DEMOTE a previously-kept survivor, and that demotion must
  * cascade through derived state the per-family forms never have to
  * repair:
  *
  *   - the demoted doc's passage-gram OWNERSHIP must transfer to the
  *     smallest still-kept holder (or die), and that holder's clean
  *     text must be rebuilt with the transferred grams un-marked;
  *   - the demoted doc's BM25 postings (and the rebuilt holders' old
  *     postings) must LEAVE the retrieval index, or the corpus stats
  *     (N, avgdl, df) — and therefore every decontamination score —
  *     drift from the one-shot values.
  *
  * The machinery that makes the cascade exact and bounded:
  *
  *   - a MARKS log `<name>_pm` (h, id, pos, batch_id): every marked
  *     (non-owner) gram occurrence ever observed.  Owner transfer
  *     needs "the other kept holders of h" — exactly the marked
  *     occurrences, filtered by the evicted set.  Append-only; stale
  *     rows (a holder later promoted to owner, or evicted) are
  *     excluded at read time by anti-joining current ownership /
  *     eviction, so repairs never rewrite it.
  *   - a LATEST-WINS keeper table `<name>_pk` (h, keeper, batch_id):
  *     ownership changes land as new rows in the writing batch's own
  *     partition (keeper NULL = tombstone); readers resolve
  *     max-batch_id per h.  The resolve is a bucket-local
  *     aggregation (the table is h-bucketed), so the probe's shuffle
  *     stays O(batch grams) — stored rows never enter an exchange.
  *   - a MUTABLE BM25 index `<name>_bmp/_bmv/_bms`: postings are
  *     latest-wins per (tok, id) with tf=0 tombstones; vocab rows are
  *     SIGNED df deltas and stats rows signed (n_docs, total_len)
  *     deltas, both plain sums at probe time.  Because the probe
  *     derives every score input (tf, len, df, N, avgdl) from the
  *     resolved/summed values — integers, exact at any partition
  *     order — the probe over the maintained index is bit-equal to
  *     [[Retrieval.bm25TopK]] over the corpus it represents.
  *
  * Ownership invariant (the correctness core): after every batch,
  * `keeper(h) = min(kept holders of h)`.  Induction over batches
  * under the monotone-id ingest contract (require()d): a novel gram's
  * owner is the smallest in-batch holder (no earlier kept holder
  * exists); later arrivals have larger ids, so they mark rather than
  * steal; a demotion transfers to the smallest marked kept holder =
  * the smallest remaining kept holder (every non-owner kept holder is
  * in the marks log by construction).  Hence the final keeper table
  * equals the one-shot `min(id) per gram` over the FINAL kept set,
  * and every clean text matches [[Decontaminate.removeRepeatedPassages]]
  * run once over the final survivors.
  *
  * Per-batch cost (the 100 TB shape): the dedup layers are O(batch +
  * touched) (q103's property); the passage layer is one gram pass
  * over the batch + the keeper-probe join (batch grams shuffle into
  * the stored bucket layout; stored side scanned in place — the
  * documented linear-scan term of the passage index, amortized by
  * batch sizing) + repair work O(demoted docs' grams); the BM25 layer
  * re-derives postings only for changed docs (bounded by batch +
  * touched); the flag probe is bucket-pruned to the benchmark's query
  * terms and its output bounded by |queries| × k.  Nothing corpus-
  * sized moves after the bootstrap.
  *
  * Replay protocol (the house three-layer shape, one level up): the
  * whole step no-ops at the `<name>_batches` marker; below it, every
  * layer is individually idempotent — TxLog commits self-gate, and
  * each index partition is recomputed DETERMINISTICALLY from prior
  * state excluding the batch's own rows (`batch_id != k`, `batch <
  * k`) and landed as a dynamic-overwrite REPLACE.  The marker lands
  * last.  Single-writer per pipeline instance.
  */
object Hygiene {

  /** Ceiling for the repair paths' driver-side id collects (demoted
    * docs, transferred owners, changed-doc lists): up to this many
    * ids collect and drive `isin` LITERAL slices of the stored logs
    * (parquet row-group skipping — the organic-churn fast path);
    * past it — a hub/boilerplate document merging many clusters at
    * once can demote O(stored survivors) in ONE batch — every
    * consumer dispatches to a DISTRIBUTED join path instead
    * (left_semi against the id frame, no broadcast hints, AQE picks
    * the join), trading the pruned scans for shuffles that scale
    * with the storm instead of blowing the driver.  The established
    * bounded-or-distributed contract
    * ([[Components.DefaultMaxDriverCloseEdges]]); `0` forces the
    * distributed path whenever a set is non-empty (specs use this to
    * keep it covered).
    *
    * Default SIZED BY MEASUREMENT (IndexBench `repairids`, round 15,
    * 2M-row clean-log-shaped table, ids spread across row groups —
    * the honest storm shape): boxed ids ~26 B each (0.2 MB at 10^4,
    * ~5 MB at 2x10^5 — never the binding constraint); isin/InSet
    * PLAN-BUILD time is the real cost, 0.19 s at 10^4 but 1.6 s at
    * 10^5 and 7.2 s at 4x10^5 — at 10^5 the plan build alone exceeds
    * the whole distributed semi-join (0.35 s flat at every size).
    * The literal path's row-group-skipping advantage is LOCALITY-
    * dependent (organic demotions are recent, clustered ids; spread
    * sets hit every row group), so the ceiling sits where the
    * literal's worst case is still cheap (≤ ~0.3 s extra) and its
    * clustered best case can win: 10^4.  (Was 10^5 through round 14
    * on the unmeasured "Catalyst can still plan" argument — true,
    * but planning alone already loses to the join there.) */
  val DefaultMaxDriverRepairIds: Int = 10000

  /** Bounded-or-distributed id-set dispatch: collect up to
    * `limit + 1` rows; `Left(ids)` when the set fits (the seq is then
    * COMPLETE), `Right(frame)` when it exceeds the ceiling — the
    * frame is localCheckpoint'd so the storm path's multiple
    * consumers (joins + count) don't recompute the candidate joins
    * per use (the probe itself already ran them once — one recompute
    * total, paid only on storm batches). */
  private def boundedIds(df: DataFrame,
      limit: Int): Either[Seq[Any], DataFrame] = {
    val probe = df.limit(limit + 1).collect().map(_.get(0)).toSeq
    if (probe.size <= limit) Left(probe) else Right(df.localCheckpoint())
  }

  /** The directories + table-name prefix one hygiene pipeline
    * instance owns.  `name` prefixes the LSH index (`<name>_lsh_*`),
    * the passage tables (`_pk`, `_pm`), the BM25 tables (`_bmp`,
    * `_bmv`, `_bms`), the high-water stats (`_hstats`) and the step
    * marker (`_batches`); the five logs are TxLog directories.
    * `flagDir`'s rows carry one NULL-ID SENTINEL per batch (empty
    * flag sets must be representable) — read it through
    * [[Hygiene.latestFlags]], never raw. */
  final case class HygieneState(name: String, pairsDir: String,
      assignDir: String, survDir: String, emitDir: String,
      cleanDir: String, flagDir: String) {
    def lshName: String = s"${name}_lsh"
    def pk: String = s"${name}_pk"
    def pm: String = s"${name}_pm"
    def bmp: String = s"${name}_bmp"
    def bmv: String = s"${name}_bmv"
    def bms: String = s"${name}_bms"
    /** Per-batch (n_docs, max_id) rows, both sum/max-additive:
      * `max(max_id)` is the monotone-ingest high-water mark;
      * `sum(n_docs)` is the LIVE ingested doc count — ingest batches
      * write +|batch|, a [[Purge.purgeDocs]] batch writes the
      * negative erasure delta (and max_id = MinValue, so the
      * high-water never moves).  It still counts evicted/flagged
      * docs (retracted, not erased); only physical purges subtract. */
    def hstats: String = s"${name}_hstats"
    /** The purge LEDGER: ids [[Purge.purgeDocs]] has retracted whose
      * physical rows still await the next erasing [[compactHygiene]].
      * Between purge and compaction it masks the LSH probe's pair
      * increment (a stored signature of a purged doc may still
      * collide); the erasing fold anti-joins every store against it
      * and then folds the ledger itself to empty. */
    def purged: String = s"${name}_purged"
    def allTables: Seq[String] =
      Seq(pk, pm, bmp, bmv, bms, hstats, purged, s"${name}_batches")
  }

  /** ONE batch of the composed pipeline.  Returns false (a no-op,
    * before any compute) when `batchId` is already marked.
    *
    * Layer order, each independently replay-safe:
    *   1. dedup: the full curation protocol
    *      ([[graft.streaming.StreamingAgg.curationStep]] — pairs,
    *      assignment delta, survivor re-pick, emission delta);
    *   2. passage: ownership repair for this batch's demotions, then
    *      keeper-probe cleaning of this batch's admitted docs; clean
    *      rows (admitted + repaired) commit to `cleanDir`;
    *   3. retrieval: BM25 postings/vocab/stats deltas for every doc
    *      the batch changed (added, rebuilt, demoted);
    *   4. flags: one bucket-pruned probe of the maintained index for
    *      the benchmark queries; the CURRENT flag set (bounded by
    *      |queries| × k) commits to `flagDir` as the batch's rows.
    *
    * Contracts (require()d): numeric ids; monotone ingest —
    * min(batch id) must exceed every id already ingested (keeper-ship
    * is first-arrival); contiguous batch ids (next unseen id ==
    * max marked + 1) so a lost upstream batch fails loudly.
    *
    * @param scoresFor  ids → (idCol, scoreCol) quality scores for the
    *                   survivor pick (the curation-loop convention)
    * @param rawTextFor ids → (idCol, textCol) raw-text lookup, used
    *                   to rebuild transferred-ownership docs (bounded
    *                   per batch by the demotions' gram spread)
    * @param bench      decontamination benchmark queries
    *                   (qidCol, termCol), one row per query term
    * @param k / floor  decontamination top-k and rounded-score floor
    * @param maxDriverRepairIds ceiling for the repair paths' driver
    *                   collects ([[DefaultMaxDriverRepairIds]]);
    *                   storm batches past it dispatch to distributed
    *                   join paths — 0 forces them (spec coverage)
    * @param cadenceCheck opt-in amortization warning: log when the
    *                   batch's gram count is >100x below the keeper
    *                   index's recommended cadence
    *                   ([[Decontaminate.recommendedBatchGrams]]) —
    *                   costs one footer-only count of the keeper
    *                   table per batch.  Measured on the ADMITTED
    *                   (post-dedup) grams, not the raw batch: the
    *                   keeper probe only ever scans for admitted
    *                   docs, so admitted grams are the cost the
    *                   cadence contract amortizes — but it means a
    *                   heavily-deduplicated batch can warn even when
    *                   the raw arrival rate meets the cadence (size
    *                   batches on EXPECTED admissions)
    */
  def hygieneStep(batch: DataFrame, batchId: Long, idCol: String,
      textCol: String, scoresFor: DataFrame => DataFrame, scoreCol: String,
      rawTextFor: DataFrame => DataFrame, st: HygieneState,
      bench: DataFrame, qidCol: String, termCol: String, k: Int,
      floor: Double, passageN: Int = 8, lshN: Int = 3, bands: Int = 8,
      buckets: Int = 16, minJaccard: Double = 0.0,
      k1: Double = 1.2, b: Double = 0.75,
      layerHook: (String, Long) => Unit = (_, _) => (),
      maxDriverRepairIds: Int = DefaultMaxDriverRepairIds,
      cadenceCheck: Boolean = false): Boolean = {
    val s = batch.sparkSession
    require(batchId >= 0, s"hygiene batch ids start at 0, got $batchId")
    require(batch.schema(idCol).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"hygieneStep requires a numeric id column; '$idCol' is " +
        s"${batch.schema(idCol).dataType}")
    val marked = IndexLifecycle.committedIds(s, st.name)
    if (marked.contains(batchId)) return false
    val realMarked = marked.filter(_ >= 0L)
    require(realMarked.isEmpty || batchId == realMarked.max + 1L,
      s"hygieneStep($batchId): batch ids must be contiguous — highest " +
        s"marked id is ${realMarked.max}; a gap means a batch was lost " +
        "upstream and every log would silently diverge")
    // monotone-id gate against the stored high-water mark (computed
    // EXCLUDING this batch's own partition so a replay converges)
    val ids = batch.agg(
      coalesce(min(col(idCol)).cast("long"), lit(Long.MaxValue)),
      coalesce(max(col(idCol)).cast("long"), lit(Long.MinValue)),
      count(lit(1))).first()
    if (s.catalog.tableExists(st.hstats)) {
      val storedMax = s.table(st.hstats)
        .where(col("batch_id") =!= lit(batchId))
        .agg(coalesce(max(col("max_id")), lit(Long.MinValue)))
        .first().getLong(0)
      require(ids.getLong(0) > storedMax,
        s"hygieneStep($batchId): batch min id ${ids.getLong(0)} must " +
          s"exceed the ingested high-water mark $storedMax — passage " +
          "keeper-ship is first-arrival, so ingest order must be id order")
    }
    // ---- layer 1: the dedup/curation protocol (self-gated) -------------
    // Between a purge and its erasing compaction the LSH index still
    // holds the purged docs' signatures, so the batch probe can emit
    // pairs against them — the ledger masks those from the closure
    // (O(batch) broadcast anti-joins; the ledger is purge-sized).
    val purgeLedger =
      if (s.catalog.tableExists(st.purged))
        Some(s.table(st.purged).select(col(idCol)))
      else None
    graft.streaming.StreamingAgg.curationStep(batch, batchId, idCol,
      textCol, scoresFor, scoreCol, st.lshName, st.pairsDir, st.assignDir,
      st.survDir, emitDir = Some(st.emitDir), n = lshN, bands = bands,
      buckets = buckets, minJaccard = minJaccard,
      dropPairIds = purgeLedger)
    layerHook("dedup", batchId)
    // the batch's DEMOTION view, derived ONCE for layers 2 and 3
    // (round-15 fusion — the two layers used to run the identical
    // first-demotion-only probe + bounded dispatch independently):
    // previously-KEPT docs this batch evicts, dispatched through the
    // bounded-or-distributed ceiling.  Derived from layer 1's own
    // emission commit, so it is replay-deterministic.
    val emitK = TxLog.readBatch(s, st.emitDir, batchId)
    val demotedCand = emitK.where(!col("kept")).select(col(idCol))
    val demoted = cleanedIdsAmong(s, st, idCol, demotedCand, batchId)
      .join(broadcast(
        evictedAmong(s, st, idCol, demotedCand, ltBatch = Some(batchId))),
        Seq(idCol), "left_anti")
    val dE = boundedIds(demoted, maxDriverRepairIds)
    // ---- layer 2: passage repair + clean --------------------------------
    passageLayer(s, batch, batchId, idCol, textCol, rawTextFor, st,
      passageN, buckets, maxDriverRepairIds, cadenceCheck, emitK, dE)
    layerHook("passage", batchId)
    // ---- layer 3: BM25 index deltas --------------------------------------
    bm25Layer(s, batchId, idCol, st, buckets, maxDriverRepairIds,
      demotedView = Some((demoted, dE)))
    layerHook("bm25", batchId)
    // ---- layer 4: decontamination flag set -------------------------------
    flagsLayer(s, st, bench, qidCol, termCol, k, floor, idCol, k1, b,
      batchId)
    layerHook("flags", batchId)
    // high-water mark + step marker land last
    IndexLifecycle.writeBatchPartition(
      s.range(1).select(lit(ids.getLong(2)).as("n_docs"),
        lit(ids.getLong(1)).as("max_id")),
      st.hstats, batchId, None)
    IndexLifecycle.markBatch(s, st.name, batchId)
    true
  }

  /** The decontamination flag-set commit a step (or a purge) ends its
    * index maintenance with: one bucket-pruned probe of the maintained
    * mutable BM25 index for the benchmark queries; the CURRENT flag
    * set (bounded by |queries| × k) commits to `flagDir` as the
    * batch's rows.  Self-gated at the TxLog marker. */
  private[ext] def flagsLayer(s: SparkSession, st: HygieneState,
      bench: DataFrame, qidCol: String, termCol: String, k: Int,
      floor: Double, idCol: String, k1: Double, b: Double,
      batchId: Long): Unit =
    if (!TxLog.isCommitted(s, st.flagDir, batchId)) {
      val flags = bm25TopKFromMutable(s, st, bench, qidCol, termCol, k,
          idCol, k1, b)
        .where(col("score") >= floor)
        .select(col(idCol)).distinct()
      // EMPTY flag sets must be representable: a sentinel row (null
      // id) pins this batch's presence in the log, so the latest-
      // batch resolve ([[resolveHygiene]], and the compaction fold)
      // sees "this batch's set is empty" instead of silently
      // inheriting the previous batch's stale non-empty set.  Null
      // never matches an equi- or anti-join, so the sentinel is
      // inert even where a reader forgets to drop it.
      val sentinel = s.range(1)
        .select(lit(null).cast(flags.schema(idCol).dataType).as(idCol))
      TxLog.commitBatch(
        flags.unionByName(sentinel).withColumn("batch", lit(batchId)),
        st.flagDir, batchId)
    }

  /** The raw clean log, or a typed empty frame before the first
    * commit. */
  private[ext] def cleanLogOr(s: SparkSession, st: HygieneState,
      idCol: String): DataFrame =
    if (TxLog.committedDirs(s, st.cleanDir).isEmpty)
      s.range(0).select(col("id").as(idCol), lit("").as("clean_text"),
        col("id").as("n_kept"), col("id").as("n_removed"),
        col("id").as("batch"))
    else TxLog.readCommitted(s, st.cleanDir)

  /** The ids among the BOUNDED frame `among` that already hold a
    * clean row below `ltBatch` — a broadcast membership probe over an
    * id-column-only log scan: the corpus-sized log is never resolved,
    * shuffled, or text-read per batch. */
  private[ext] def cleanedIdsAmong(s: SparkSession, st: HygieneState,
      idCol: String, among: DataFrame, ltBatch: Long,
      hint: Boolean = true): DataFrame = {
    val amongIds = among.select(col(idCol))
    cleanLogOr(s, st, idCol).where(col("batch") < lit(ltBatch))
      .select(col(idCol))
      .join(if (hint) broadcast(amongIds) else amongIds, Seq(idCol),
        "left_semi")
      .distinct()
  }

  /** Latest-wins prior clean rows for a SMALL driver-side id set —
    * the `isin` literal pushes to the parquet scan (row-group
    * skipping), so text bytes are read only for the matched rows. */
  private def cleanRowsForIds(s: SparkSession, st: HygieneState,
      idCol: String, ids: Seq[Any], ltBatch: Long): DataFrame = {
    val log = cleanLogOr(s, st, idCol)
    val sliced =
      if (ids.isEmpty) log.where(lit(false))
      else log.where(col("batch") < lit(ltBatch) &&
        col(idCol).isin(ids: _*))
    sliced.groupBy(col(idCol))
      .agg(max_by(struct(col("clean_text"), col("n_kept"),
        col("n_removed")), col("batch")).as("__r"))
      .select(col(idCol), col("__r.clean_text").as("clean_text"),
        col("__r.n_kept").as("n_kept"), col("__r.n_removed").as("n_removed"))
  }

  /** [[cleanRowsForIds]] for an id FRAME past the driver ceiling —
    * the storm path: a left_semi join (no hint, AQE picks) replaces
    * the pushed `isin` literal, trading row-group skipping for a
    * slice that scales with the storm instead of the plan size. */
  private def cleanRowsForIdsFrame(s: SparkSession, st: HygieneState,
      idCol: String, among: DataFrame, ltBatch: Long): DataFrame =
    cleanLogOr(s, st, idCol).where(col("batch") < lit(ltBatch))
      .join(among.select(col(idCol)).distinct(), Seq(idCol), "left_semi")
      .groupBy(col(idCol))
      .agg(max_by(struct(col("clean_text"), col("n_kept"),
        col("n_removed")), col("batch")).as("__r"))
      .select(col(idCol), col("__r.clean_text").as("clean_text"),
        col("__r.n_kept").as("n_kept"), col("__r.n_removed").as("n_removed"))

  /** Eviction state among a BOUNDED id frame: the emission log is
    * broadcast-filtered to the candidates BEFORE the latest-wins
    * aggregation, so the per-batch shuffle is O(matched emission
    * rows), not O(accumulated churn).  `ltBatch` = None reads the
    * full committed log (including the running batch's own
    * emissions). */
  private[ext] def evictedAmong(s: SparkSession, st: HygieneState,
      idCol: String, among: DataFrame, ltBatch: Option[Long],
      hint: Boolean = true): DataFrame = {
    val log = TxLog.readCommitted(s, st.emitDir)
    val sliced = ltBatch.fold(log)(b => log.where(col("batch") < lit(b)))
    val amongIds = among.select(col(idCol))
    graft.ext.Components.resolveEvicted(
      sliced.join(if (hint) broadcast(amongIds) else amongIds, Seq(idCol),
        "left_semi"),
      idCol, "batch")
  }

  /** Latest-wins resolution of the keeper table, tombstones dropped.
    * Bucket-local (the table is h-bucketed): no exchange. */
  private[ext] def resolvedKeepers(s: SparkSession, st: HygieneState,
      excludeBatch: Long): DataFrame =
    if (!s.catalog.tableExists(st.pk))
      s.range(0).select(col("id").as("h"), col("id").as("keeper"))
    else s.table(st.pk).where(col("batch_id") =!= lit(excludeBatch))
      .groupBy(col("h"))
      .agg(max_by(col("keeper"), col("batch_id")).as("keeper"))
      .where(col("keeper").isNotNull)

  /** Latest-wins per-doc resolution of the clean log, optionally
    * restricted to rows from batches below `ltBatch` (the replay-
    * determinism view: "the state before this batch ran"). */
  def resolveClean(s: SparkSession, cleanDir: String, idCol: String,
      ltBatch: Option[Long] = None): DataFrame = {
    // empty-log guard: the first batch resolves against nothing
    val all =
      if (TxLog.committedDirs(s, cleanDir).isEmpty)
        s.range(0).select(col("id").as(idCol),
          lit("").as("clean_text"), col("id").as("n_kept"),
          col("id").as("n_removed"), col("id").as("batch"))
      else TxLog.readCommitted(s, cleanDir)
    val sliced = ltBatch.fold(all)(b => all.where(col("batch") < lit(b)))
    sliced.groupBy(col(idCol))
      .agg(max_by(struct(col("clean_text"), col("n_kept"),
        col("n_removed")), col("batch")).as("__r"))
      .select(col(idCol), col("__r.clean_text").as("clean_text"),
        col("__r.n_kept").as("n_kept"), col("__r.n_removed").as("n_removed"))
  }

  /** @param emitK the batch's own emission commit
    * @param dE the batch's demotion set through the bounded-or-
    *   distributed dispatch, derived ONCE in [[hygieneStep]] and
    *   shared with [[bm25Layer]] (round-15 fusion): previously-KEPT
    *   docs this batch evicts (bounded by touched components),
    *   first-demotion-only (a doc evicted in an earlier batch can be
    *   re-emitted kept=false when its component is touched again,
    *   and repairing it twice would drift the state).  Membership in
    *   the clean log is probed by BROADCASTING the candidate set
    *   into an id-column-only log scan — the corpus-sized log never
    *   resolves or shuffles per batch; the REPAIR work, gram-level
    *   and ~100x bigger, is what the dispatch guards: under the
    *   ceiling the COMPLETE demotion set drives the literal/
    *   broadcast fast path, past it (a hub document demoting
    *   O(stored survivors) in one batch) every consumer joins
    *   against the frame instead. */
  private def passageLayer(s: SparkSession, batch: DataFrame,
      batchId: Long, idCol: String, textCol: String,
      rawTextFor: DataFrame => DataFrame, st: HygieneState, n: Int,
      buckets: Int, maxDriverRepairIds: Int, cadenceCheck: Boolean,
      emitK: DataFrame, dE: Either[Seq[Any], DataFrame]): Unit = {
    val dStorm = dE.isRight
    val dEmpty = dE.left.exists(_.isEmpty)
    // admissions: kept emissions not yet cleaned — by the clean-log
    // invariant exactly this batch's admitted docs
    val admittedIds = emitK.where(col("kept")).select(col(idCol))
    val admitted = admittedIds.join(
      broadcast(cleanedIdsAmong(s, st, idCol, admittedIds, batchId)),
      Seq(idCol), "left_anti")
    val keepPrior = resolvedKeepers(s, st, excludeBatch = batchId)
    // ---- (a) ownership transfer for demoted owners ----------------------
    // candidates = marked kept holders of the dying grams; the new
    // owner is the smallest (the invariant's transfer step).  The
    // eviction probe is restricted to the candidate holders (bounded)
    // and INCLUDES this batch's emissions — a doc demoted alongside
    // the owner must not inherit.
    val updates: DataFrame =
      if (dEmpty)
        keepPrior.limit(0)
      else {
        val owned0 = dE match {
          case Left(ids) => keepPrior.where(col("keeper").isin(ids: _*))
          case Right(df) => keepPrior.join(
            df.select(col(idCol).as("keeper")), Seq("keeper"), "left_semi")
        }
        val owned = owned0
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val marksT =
          if (s.catalog.tableExists(st.pm))
            s.table(st.pm).where(col("batch_id") =!= lit(batchId))
          else s.range(0).select(col("id").as("h"), col("id").as(idCol),
            col("id").cast("int").as("pos"))
        // storm: the dying-gram set is storm-sized — no broadcast
        // hints (AQE picks); the shuffles scale with the storm, which
        // is the trade the dispatch exists to make
        val ownedH = owned.select(col("h"))
        val cands = marksT
          .join(if (dStorm) ownedH else broadcast(ownedH), Seq("h"),
            "left_semi")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val evicted = evictedAmong(s, st, idCol,
          cands.select(col(idCol)).distinct(), ltBatch = None,
          hint = !dStorm)
        val newOwners = cands
          .join(if (dStorm) evicted else broadcast(evicted), Seq(idCol),
            "left_anti")
          .groupBy(col("h")).agg(min(col(idCol)).as("__newOwner"))
        val u = owned.select(col("h"))
          .join(newOwners, Seq("h"), "left")
          .select(col("h"), col("__newOwner").as("keeper"))
          .localCheckpoint() // cut before the inputs unpersist
        owned.unpersist(); cands.unpersist()
        u
      }
    val updatesP = updates
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // ---- (b) rebuild transferred owners --------------------------------
      val oDocs = updatesP.where(col("keeper").isNotNull)
        .select(col("keeper").as(idCol)).distinct()
      // same dispatch for the transferred-owner set: bounded by the
      // dying grams' distinct holders, which a storm makes large
      val oE = boundedIds(oDocs, maxDriverRepairIds)
      val oStorm = oE.isRight
      val oDocsFrame = oE.fold(_ => oDocs, identity)
      val oClean: DataFrame =
        if (oE.left.exists(_.isEmpty)) {
          // zero-row frame with the clean-row schema
          Decontaminate.rebuildClean(
            Decontaminate.tokedOf(batch.limit(0), idCol, textCol),
            s.range(0).select(col("id").as(idCol),
              array().cast("array<int>").as("__starts")), idCol, n)
        } else {
          // effective marks of a transferred owner = its marks-log
          // rows minus the grams it now owns (stale rows self-correct
          // against current ownership — the marks log never rewrites).
          // Ownership rows for the owners: prior rows (grams they
          // owned all along) plus this batch's transfers — disjoint h
          // sets, since a transferred gram's previous owner was a
          // demoted doc, never the transfer target.
          val ownRows = (oE match {
            case Left(ids) =>
              keepPrior.where(col("keeper").isin(ids: _*))
                .unionByName(updatesP.where(col("keeper").isin(ids: _*)))
            case Right(df) =>
              val oKeep = df.select(col(idCol).as("keeper"))
              keepPrior.join(oKeep, Seq("keeper"), "left_semi")
                .unionByName(
                  updatesP.join(oKeep, Seq("keeper"), "left_semi"))
          }).select(col("h"), col("keeper").as(idCol))
          val oMarksBase = s.table(st.pm)
            .where(col("batch_id") =!= lit(batchId))
          val oMarksSliced = oE match {
            case Left(ids) => oMarksBase.where(col(idCol).isin(ids: _*))
            case Right(df) =>
              oMarksBase.join(df, Seq(idCol), "left_semi")
          }
          val oMarks = oMarksSliced
            .join(if (oStorm) ownRows else broadcast(ownRows),
              Seq("h", idCol), "left_anti")
          val oStarts = oMarks.groupBy(col(idCol))
            .agg(collect_list(col("pos")).as("__starts"))
          Decontaminate.rebuildClean(
            Decontaminate.tokedOf(rawTextFor(oDocsFrame), idCol, textCol),
            oStarts, idCol, n)
        }
      // ---- (c) clean the admitted docs against the repaired view ---------
      // The stored-keeper probe joins the batch's gram partials
      // against the PRIOR resolved keepers (bucket-colocated — the
      // stored side never exchanges), then overlays this batch's
      // bounded transfer/tombstone set as a broadcast — never a union
      // with the stored table, which would destroy the bucket join.
      // (Storm: the transfer set is gram-level storm-sized — plain
      // join, AQE picks.)
      val aToked = Decontaminate.tokedOf(
        batch.join(admitted, Seq(idCol), "left_semi"), idCol, textCol)
      val grams = Decontaminate.gramsOf(aToked, idCol, n)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      if (cadenceCheck && s.catalog.tableExists(st.pk))
        Decontaminate.warnIfCadenceLagged(s"hygieneStep($batchId)",
          grams.count(),
          s.table(st.pk).where(col("batch_id") =!= lit(batchId)).count())
      val overlay = updatesP.select(col("h"), lit(true).as("__u"),
        col("keeper").isNotNull.as("__uk"))
      val flag = grams.groupBy(col("h")).agg(min(col(idCol)).as("__bk"))
        .join(keepPrior.select(col("h"), lit(true).as("__hp")),
          Seq("h"), "left")
        .join(if (dStorm) overlay else broadcast(overlay), Seq("h"), "left")
        .select(col("h"), col("__bk"),
          when(col("__u").isNotNull, col("__uk"))
            .otherwise(col("__hp").isNotNull).as("__hit"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        val aMarks = grams.join(flag, Seq("h"))
          .where(col("__hit") || col("__bk") < col(idCol))
          .select(col("h"), col(idCol), col("__pos").cast("int").as("pos"))
        val aStarts = aMarks.groupBy(col(idCol))
          .agg(collect_list(col("pos")).as("__starts"))
        val aClean = Decontaminate.rebuildClean(aToked, aStarts, idCol, n)
        TxLog.commitBatch(
          aClean.unionByName(oClean).withColumn("batch", lit(batchId)),
          st.cleanDir, batchId)
        // novel grams the batch now owns; where a gram died AND the
        // batch holds it, the batch's row wins over the tombstone
        // (both land in the SAME partition, so the overlap must merge
        // here — one row per h per batch)
        val novel = flag.where(!col("__hit"))
          .select(col("h"), col("__bk").as("keeper"))
        val pkRows = updatesP.join(novel, Seq("h"), "left_anti")
          .unionByName(novel)
        IndexLifecycle.writeBatchPartition(pkRows, st.pk, batchId,
          Some(("h", buckets)))
        IndexLifecycle.writeBatchPartition(aMarks, st.pm, batchId,
          Some(("h", buckets)))
      } finally { grams.unpersist(); flag.unpersist() }
    } finally updatesP.unpersist()
  }

  /** BM25 index deltas for everything batch `batchId` changed — reads
    * the batch's OWN emission and clean commits back, so it serves
    * both [[hygieneStep]] and [[Purge.purgeDocs]] (whose retractions
    * are exactly a demotion's shape: prior postings → tf=0
    * tombstones, signed df/stats decrements). */
  /** @param reAdmitted docs whose clean rows predate this batch but
    *   whose INDEX state is absent (postings retracted when they were
    *   demoted) — [[Purge.purgeDocs]]'s re-promoted docs.  They must
    *   be treated as NEW (full postings/df/stats additions), not as
    *   changed docs, or their old rows would be retracted a second
    *   time and the signed df/n_docs sums would drift.  The monotone
    *   ingest path never re-admits, so [[hygieneStep]] passes None.
    * @param demotedView the (frame, bounded-dispatch) demotion view
    *   when the caller already derived it ([[hygieneStep]]'s fused
    *   layer-2/3 share); None derives the same first-demotion-only
    *   view here ([[Purge.purgeDocs]]'s path) */
  private[ext] def bm25Layer(s: SparkSession, batchId: Long, idCol: String,
      st: HygieneState, buckets: Int, maxDriverRepairIds: Int,
      reAdmitted: Option[DataFrame] = None,
      demotedView: Option[(DataFrame, Either[Seq[Any], DataFrame])] = None)
      : Unit = {
    val cleanK = TxLog.readBatch(s, st.cleanDir, batchId)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // same first-demotion-only view as the passage layer: a doc
    // re-emitted kept=false after an earlier eviction must not have
    // its postings/df/stats negated a second time
    val (demoted, dE) = demotedView.getOrElse {
      val emitK = TxLog.readBatch(s, st.emitDir, batchId)
      val demotedCand = emitK.where(!col("kept")).select(col(idCol))
      val d = cleanedIdsAmong(s, st, idCol, demotedCand, batchId)
        .join(broadcast(
          evictedAmong(s, st, idCol, demotedCand, ltBatch = Some(batchId))),
          Seq(idCol), "left_anti")
      (d, boundedIds(d, maxDriverRepairIds))
    }
    // docs whose postings change: the clean rows this batch
    // re-emitted that EXISTED before (the rebuilt transfer targets —
    // tiny), plus the demotions.  Newly admitted docs have no prior
    // rows, so the prior-text read is a small pushed-literal scan.
    // Both sets go through the bounded-or-distributed dispatch: a
    // storm batch's changed-doc lists are O(demoted docs), so past
    // the ceiling the prior-text slice joins against the frames
    // instead of collecting them into isin literals.
    val changed0 = cleanedIdsAmong(s, st, idCol, cleanK.select(col(idCol)),
      batchId)
    val changed = reAdmitted.fold(changed0)(p =>
      changed0.join(p.select(col(idCol)), Seq(idCol), "left_anti"))
    val oE = boundedIds(changed, maxDriverRepairIds)
    val changedOld = (dE, oE) match {
      case (Left(d), Left(o)) =>
        cleanRowsForIds(s, st, idCol, o ++ d, batchId)
      case _ =>
        cleanRowsForIdsFrame(s, st, idCol,
          dE.fold(_ => demoted, identity)
            .unionByName(oE.fold(_ => changed, identity)), batchId)
    }
    // exact sizes for the signed stats delta (a count per storm-side
    // frame — the bounded sides reuse the already-collected seq)
    val dCount = dE.fold(_.size.toLong, _.count())
    val oCount = oE.fold(_.size.toLong, _.count())
    def tfOf(rows: DataFrame): DataFrame = rows
      .select(col(idCol), tokens(col("clean_text")).as("__toks"))
      .select(col(idCol), size(col("__toks")).as("len"),
        explode(col("__toks")).as("tok"))
      .groupBy(col("tok"), col(idCol))
      .agg(count(lit(1)).as("tf"), max(col("len")).as("len"))
    def dlOf(rows: DataFrame): DataFrame = rows
      .select(col(idCol), size(tokens(col("clean_text"))).as("__l"))
    val oldP = tfOf(changedOld)
    val newP = tfOf(cleanK)
    val joined = oldP
      .select(col("tok"), col(idCol), lit(true).as("__o"))
      .join(newP.select(col("tok"), col(idCol), col("tf"), col("len"),
        lit(true).as("__n")), Seq("tok", idCol), "full_outer")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // postings: replacement rows for live (tok, id), tf=0 tombstones
      // for terms the change removed
      IndexLifecycle.writeBatchPartition(
        joined.select(col("tok"), col(idCol).cast("long").as("id"),
          coalesce(col("tf"), lit(0L)).as("tf"),
          coalesce(col("len"), lit(0L)).as("len")),
        st.bmp, batchId, Some(("tok", buckets)))
      // vocab: SIGNED df deltas (gained docs − lost docs per term)
      IndexLifecycle.writeBatchPartition(
        joined.groupBy(col("tok"))
          .agg((sum(when(col("__n").isNotNull, 1L).otherwise(0L))
            - sum(when(col("__o").isNotNull, 1L).otherwise(0L))).as("df"))
          .where(col("df") =!= 0L),
        st.bmv, batchId, Some(("tok", buckets)))
      // stats: signed (n_docs, total_len) deltas — plain sums at probe
      val newLen = dlOf(cleanK).agg(
        coalesce(sum(col("__l").cast("long")), lit(0L))).first().getLong(0)
      val oldLen = dlOf(changedOld).agg(
        coalesce(sum(col("__l").cast("long")), lit(0L))).first().getLong(0)
      val nDelta = (cleanK.count() - oCount) - dCount
      IndexLifecycle.writeBatchPartition(
        s.range(1).select(lit(nDelta).as("n_docs"),
          lit(newLen - oldLen).as("total_len")),
        st.bms, batchId, None)
    } finally { joined.unpersist(); cleanK.unpersist() }
  }

  /** BM25 top-k served from the MUTABLE index: latest-wins postings
    * (tombstones dropped), summed signed df/stats — then the exact
    * scoring tail the frozen index and the raw path share
    * ([[Retrieval]]'s one-definition contract), so the probe is
    * bit-equal to [[Retrieval.bm25TopK]] over the represented corpus.
    * Query terms become an `isin` literal, so both scans are
    * bucket-pruned; the latest-wins aggregation runs only over the
    * pruned rows.  The term collect is ceiling-guarded
    * ([[Retrieval.termSlice]]): past `maxLiteralTerms` both scans
    * fall back to a semi-join against the term frame. */
  def bm25TopKFromMutable(s: SparkSession, st: HygieneState,
      queries: DataFrame, qidCol: String, termCol: String, k: Int,
      idCol: String, k1: Double = 1.2, b: Double = 0.75,
      maxLiteralTerms: Int = Retrieval.DefaultMaxLiteralTerms): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val terms = queries.select(col(termCol).cast("string").as("tok"))
      .distinct()
    val probe = Retrieval.termProbe(terms, maxLiteralTerms,
      "bm25TopKFromMutable")
    val post = Retrieval.termSlice(s.table(st.bmp), probe, terms,
        maxLiteralTerms)
      .groupBy(col("tok"), col("id"))
      .agg(max_by(struct(col("tf"), col("len")), col("batch_id")).as("__r"))
      .select(col("tok").as("__tok"), col("id").as(idCol),
        col("__r.tf").as("__tf"), col("__r.len").as("__len"))
      .where(col("__tf") > 0L)
    val dfc = Retrieval.termSlice(s.table(st.bmv), probe, terms,
        maxLiteralTerms)
      .groupBy(col("tok").as("__tok"))
      .agg(sum(col("df")).as("__df"))
      .where(col("__df") > 0L)
    val stRow = s.table(st.bms)
      .agg(sum(col("n_docs")).as("n"), sum(col("total_len")).as("t")).first()
    // empty-corpus guard: when every doc is evicted the signed stats
    // deltas sum to 0 (or null on an empty table) — avgdl would be
    // NaN and every downstream score comparison silently false.
    // Return the typed empty result instead (the house empty-log
    // convention): an empty corpus has no hits.
    if (stRow.isNullAt(0) || stRow.getLong(0) <= 0L)
      Retrieval.scoreAndTopK(post.limit(0), dfc.limit(0), queries,
        qidCol, termCol, idCol, k, k1, b, 1L, 1.0)
    else {
      val nDocs = stRow.getLong(0)
      Retrieval.scoreAndTopK(post, dfc, queries, qidCol, termCol, idCol,
        k, k1, b, nDocs, stRow.getLong(1).toDouble / nDocs.toDouble)
    }
  }

  /** THE flag-log read: the latest batch's flagged ids.  Every
    * consumer of `flagDir` must come through here (or replicate its
    * two invariants), because the log's row format carries two traps:
    *
    *   - resolution is by the stored `batch` COLUMN, never by live
    *     marker ids — compaction folds the markers into the compacted
    *     base, so resolving via committedBatchIds would silently read
    *     an empty flag set right after a fold;
    *   - every batch commits a NULL-ID SENTINEL row alongside its
    *     flags ([[flagsLayer]]), making an EMPTY latest flag set
    *     representable (max(batch) still lands on the latest batch,
    *     whose data rows are then none); the sentinel is dropped
    *     here.  It is inert in equi/anti-joins (null matches
    *     nothing), but a direct `.getLong(0)`-style reader that
    *     bypassed this accessor would see one null row per batch.
    *
    * Returns a single-column (`idCol`) frame, bounded by |queries| ×
    * k; empty before the first commit. */
  def latestFlags(s: SparkSession, st: HygieneState,
      idCol: String, idType: Option[org.apache.spark.sql.types.DataType] =
        None): DataFrame =
    if (TxLog.committedDirs(s, st.flagDir).isEmpty)
      // pre-first-commit there is no log to derive the id type from;
      // callers that know it (resolveHygiene passes the clean frame's)
      // supply it so the anti-join matches on the EXACT type instead
      // of leaning on implicit numeric coercion from this long
      s.range(0).select(idType.fold(col("id"))(col("id").cast).as(idCol))
    else {
      val log = TxLog.readCommitted(s, st.flagDir)
      val m = log.agg(max(col("batch"))).first()
      if (m.isNullAt(0)) log.select(col(idCol)).limit(0)
      else log.where(col("batch") === lit(m.getLong(0)))
        .select(col(idCol)).where(col(idCol).isNotNull)
    }

  /** The resolved clean corpus a consumer reads: latest clean row per
    * doc, evicted docs filtered (broadcast anti-join — the loser set
    * is bounded by churn), flagged docs filtered (broadcast anti-join
    * — the flag set is bounded by |queries| × k, read through
    * [[latestFlags]]).  Returns (idCol, clean_text, n_kept,
    * n_removed) — feed it the same quality gate / split the one-shot
    * pipeline ends with. */
  def resolveHygiene(s: SparkSession, st: HygieneState,
      idCol: String): DataFrame = {
    val clean = resolveClean(s, st.cleanDir, idCol)
    val evicted = graft.ext.Components.resolveEvicted(
      TxLog.readCommitted(s, st.emitDir), idCol, "batch")
    clean
      .join(broadcast(evicted), Seq(idCol), "left_anti")
      .join(broadcast(latestFlags(s, st, idCol,
        Some(clean.schema(idCol).dataType))), Seq(idCol), "left_anti")
  }

  /** Fold every log and index table of a pipeline instance — the
    * mid-loop LSM maintenance a real cadence runs (q103's fold set,
    * plus the three mutable-table folds):
    *   - keepers: resolve latest-wins, DROP tombstones (an absent row
    *     and a tombstone read identically);
    *   - marks: pure relabel (append-only; stale rows stay —
    *     excluded at read time by ownership/eviction anti-joins);
    *   - postings: resolve latest-wins, drop tf=0; vocab: sum signed
    *     df per term, drop 0; stats: sum to one row;
    *   - the five TxLogs fold with their resolution functions;
    *   - LSH index: minor + major fold ([[Dedup]]).
    * Requires a quiesced loop with NO in-flight batch (require()d:
    * every sub-log's committed max is step-marked) — a mid-batch
    * crash must replay through [[hygieneStep]] BEFORE maintenance, or
    * the batch's `batch < k` prior-state views would see folded rows.
    * Crash-safe via the staged-swap protocol; re-running compaction
    * is the recovery ([[recoverHygieneCompaction]] runs first). */
  /** Invalidate this session's cached relations for every table of
    * the pipeline instance.  A foreachBatch stream writes through a
    * CLONED SparkSession, so the DRIVING session's per-session
    * relation cache (file listings — including the step-marker
    * table's contents) can be stale by whole batches once it has
    * read a table before a streamed epoch appended to it.  Every
    * maintenance entry point that runs in the driving session after
    * streamed epochs ([[compactHygiene]], [[Purge.purgeDocs]]) must
    * refresh first, or it would fold/repair against a partial view —
    * the marker require would (loudly) reject a batch the stream
    * fully committed, and the data folds would (silently) drop its
    * partitions. */
  private[ext] def refreshInstanceTables(s: SparkSession,
      st: HygieneState): Unit =
    (st.allTables ++ Seq(s"${st.lshName}_shingles", s"${st.lshName}_bands",
      s"${st.lshName}_batches"))
      .foreach(t => if (s.catalog.tableExists(t)) s.catalog.refreshTable(t))

  def compactHygiene(s: SparkSession, st: HygieneState,
      idCol: String = "doc_id",
      graceMs: Long = TxLog.defaultVacuumGraceMs): Unit = {
    refreshInstanceTables(s, st)
    recoverHygieneCompaction(s, st)
    val marked = IndexLifecycle.committedIds(s, st.name)
    val subMax = Seq(st.pairsDir, st.assignDir, st.survDir, st.emitDir,
        st.cleanDir, st.flagDir)
      .flatMap(d => TxLog.committedBatchIds(s, d))
    subMax.reduceOption(_ max _).foreach(m =>
      require(marked.contains(m),
        s"compactHygiene: batch $m is committed in a sub-log but not " +
          "step-marked — an in-flight batch must replay through " +
          "hygieneStep before maintenance runs"))
    // the sub-log check above misses one crash window — a purgeDocs
    // that died after its layer-0 ledger write but before its first
    // TxLog commit — so also refuse to erase against an unmarked
    // ledger partition (the shared orphan-ledger guard; recovery is
    // replaying the purge, same as every other mid-purge crash)
    IndexLifecycle.requireLedgerCommitted(s, st.name)
    // ---- the ERASING part of the fold: every store anti-joins the
    // purge ledger, so rows of purged docs are PHYSICALLY dropped
    // from the folded bases (until now they were only retracted —
    // evicted / tombstoned / relabeled).  The ledger itself folds to
    // empty LAST, after every store's erase has landed, so a crash
    // anywhere re-runs with the ledger intact (each erase is an
    // idempotent anti-join).  The folded TxLog staged files are
    // deleted by the compaction's own vacuum — pass `graceMs = 0`
    // from a quiesced maintenance window to reclaim them immediately
    // (the full right-to-erasure runbook: SCALE.md).
    val purgedIds: Option[DataFrame] =
      if (s.catalog.tableExists(st.purged)) {
        val l = s.table(st.purged).select(col(idCol)).distinct()
          .localCheckpoint()
        if (l.isEmpty) None else Some(l)
      } else None
    def erase(df: DataFrame, c: String): DataFrame =
      purgedIds.fold(df)(p => df.join(
        broadcast(p.select(col(idCol).as(c))), Seq(c), "left_anti"))
    import graft.ext.Components
    // erase-carrying folds are FORCED when a purge is pending: a
    // one-batch or base-only log must still rewrite, or its purged
    // rows would survive the "erasing" compaction
    val forceErase = purgedIds.nonEmpty
    TxLog.compactWith(s, st.pairsDir,
      (df, _) => erase(erase(df, "id_a"), "id_b"), graceMs = graceMs,
      force = forceErase)
    TxLog.compactWith(s, st.assignDir, (df, c) =>
      erase(Components.resolveAssignments(df, idCol, "batch"), idCol)
        .withColumn("batch", lit(c)), graceMs = graceMs,
      force = forceErase)
    TxLog.compactWith(s, st.survDir, (df, c) =>
      Components.resolveSurvivors(df, "batch").withColumn("batch", lit(c)),
      graceMs = graceMs, force = forceErase)
    TxLog.compactWith(s, st.emitDir, (df, c) =>
      erase(df.groupBy(col(idCol))
        .agg(max_by(col("kept"), col("batch")).as("kept")), idCol)
        .withColumn("batch", lit(c)), graceMs = graceMs,
      force = forceErase)
    TxLog.compactWith(s, st.cleanDir, (df, c) =>
      erase(df.groupBy(col(idCol))
        .agg(max_by(struct(col("clean_text"), col("n_kept"),
          col("n_removed")), col("batch")).as("__r"))
        .select(col(idCol), col("__r.clean_text").as("clean_text"),
          col("__r.n_kept").as("n_kept"), col("__r.n_removed").as("n_removed")),
        idCol)
        .withColumn("batch", lit(c)), graceMs = graceMs,
      force = forceErase)
    TxLog.compactWith(s, st.flagDir, (df, c) => {
      // every batch carries a null-id sentinel row, so max(batch) is
      // the LATEST batch even when its flag set is empty — the fold
      // keeps that batch's rows (sentinel included, so the next
      // resolve still lands on the folded base) and never bakes a
      // stale earlier set into the compacted base.  The erase is a
      // belt (a purged doc has no postings left to score); the null
      // sentinel survives it — null matches no anti-join key.
      val m = df.agg(coalesce(max(col("batch")), lit(0L))).first().getLong(0)
      erase(df.where(col("batch") === lit(m)), idCol)
        .withColumn("batch", lit(c))
    }, graceMs = graceMs, force = forceErase)
    val committed = IndexLifecycle.committedIds(s, st.name)
    if (s.catalog.tableExists(st.pk))
      IndexLifecycle.swapFold(s, st.pk, committed, (df, base) =>
        df.groupBy(col("h"))
          .agg(max_by(col("keeper"), col("batch_id")).as("keeper"))
          .where(col("keeper").isNotNull)
          .withColumn("batch_id", base))
    if (s.catalog.tableExists(st.pm))
      IndexLifecycle.swapFold(s, st.pm, committed, (df, base) =>
        erase(df, idCol).withColumn("batch_id", base))
    if (s.catalog.tableExists(st.bmp))
      IndexLifecycle.swapFold(s, st.bmp, committed, (df, base) =>
        df.groupBy(col("tok"), col("id"))
          .agg(max_by(struct(col("tf"), col("len")), col("batch_id")).as("__r"))
          .select(col("tok"), col("id"), col("__r.tf").as("tf"),
            col("__r.len").as("len"))
          .where(col("tf") > 0L)
          .withColumn("batch_id", base))
    if (s.catalog.tableExists(st.bmv))
      IndexLifecycle.swapFold(s, st.bmv, committed, (df, base) =>
        df.groupBy(col("tok")).agg(sum(col("df")).as("df"))
          .where(col("df") =!= 0L)
          .withColumn("batch_id", base))
    if (s.catalog.tableExists(st.bms))
      IndexLifecycle.swapFold(s, st.bms, committed, (df, base) =>
        df.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(sum(col("total_len")), lit(0L)).as("total_len"))
          .withColumn("batch_id", base))
    if (s.catalog.tableExists(st.hstats))
      IndexLifecycle.swapFold(s, st.hstats, committed, (df, base) =>
        df.agg(coalesce(sum(col("n_docs")), lit(0L)).as("n_docs"),
          coalesce(max(col("max_id")), lit(Long.MinValue)).as("max_id"))
          .withColumn("batch_id", base))
    IndexLifecycle.foldMarkerTable(s, st.name)
    Dedup.compactLshIndexMinor(s, st.lshName)
    Dedup.compactLshIndex(s, st.lshName, dropIds =
      purgedIds.map(_.select(col(idCol).as("id"))))
    // the ledger folds to empty LAST: every erase above has landed,
    // no store references the purged ids any more, and the monotone
    // ingest contract means a purged (≤ high-water) id can never
    // re-arrive — so the ledger has nothing left to mask.  A crash
    // before this point re-runs compaction with the ledger intact.
    if (s.catalog.tableExists(st.purged))
      IndexLifecycle.swapFold(s, st.purged, committed, (df, base) =>
        df.limit(0).withColumn("batch_id", base))
  }

  /** Finish any staged swap a crash interrupted, and re-sync partition
    * metadata — compaction runs it first, so "re-run compaction" is
    * the whole recovery runbook. */
  def recoverHygieneCompaction(s: SparkSession, st: HygieneState): Boolean = {
    val partitioned = Set(st.pk, st.pm, st.bmp, st.bmv, st.bms, st.hstats,
      st.purged)
    val a = IndexLifecycle.recoverSwaps(s,
      (partitioned + s"${st.name}_batches").toSeq, partitioned)
    val b = Dedup.recoverLshCompaction(s, st.lshName)
    a || b
  }
}
