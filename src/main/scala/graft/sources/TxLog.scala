package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** A minimal manifest commit log giving EXACTLY-ONCE batch appends on
  * plain parquet — the role a transactional table format (Delta,
  * Iceberg) plays, rebuilt from the two primitives every HDFS-like
  * filesystem has: write-to-a-fresh-directory and atomic
  * create-no-overwrite of a single marker file.
  *
  * Layout under `dir`:
  * {{{
  *   _staged/<batchId>-<uuid>/   parquet files for one attempt
  *   _commits/<batchId>          marker; CONTENT = the staged dir name
  * }}}
  *
  * Protocol per batch:
  *  1. write the batch's rows to a fresh `_staged/<batchId>-<uuid>/`
  *     (a crashed attempt leaves an orphan dir no marker references);
  *  2. publish with ONE atomic `create(_commits/<batchId>,
  *     overwrite=false)` whose content names the staged dir.
  *
  * A replay of an already-committed batch is a no-op (the marker
  * exists); a replay of a crashed attempt stages a NEW dir and
  * commits that one — the orphan from the crash is invisible to
  * readers, which resolve content exclusively through markers, and is
  * reclaimed by [[vacuum]].  Two concurrent attempts race on the
  * atomic marker create; exactly one wins, the loser's dir is an
  * orphan.  No reader ever needs a defensive DISTINCT.
  *
  * Scale notes: readers pay one `_commits` listing (one file per
  * batch — at 1 batch/minute that is ~500k files/year, so compact or
  * date-partition the log before that bites); the data files
  * themselves are read with ordinary partitioned parquet scans, so
  * filter pushdown and column pruning are untouched.
  */
object TxLog {

  private def fs(spark: SparkSession, dir: String): (FileSystem, Path) = {
    val p = new Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  def isCommitted(spark: SparkSession, dir: String, batchId: Long): Boolean = {
    val (f, root) = fs(spark, dir)
    f.exists(new Path(root, s"_commits/$batchId"))
  }

  /** Stage `df` and atomically publish it as `batchId`.  Returns true
    * if this call committed, false if the batch was already committed
    * (the staged attempt is then left as an orphan for [[vacuum]]). */
  def commitBatch(df: DataFrame, dir: String, batchId: Long): Boolean = {
    val spark = df.sparkSession
    val (f, root) = fs(spark, dir)
    val marker = new Path(root, s"_commits/$batchId")
    if (f.exists(marker)) return false
    val staged = s"$batchId-${java.util.UUID.randomUUID()}"
    df.write.mode("overwrite").parquet(new Path(root, s"_staged/$staged").toString)
    f.mkdirs(marker.getParent)
    val out =
      try f.create(marker, /*overwrite=*/ false)
      catch { case _: java.io.IOException => return false } // lost the race
    try out.write(staged.getBytes("UTF-8")) finally out.close()
    true
  }

  /** All committed rows: the union of exactly the staged dirs the
    * markers name.  Empty-log reads return an empty frame only if a
    * schema can't be inferred — callers handle the no-commits case. */
  def readCommitted(spark: SparkSession, dir: String): DataFrame = {
    val dirs = committedDirs(spark, dir)
    require(dirs.nonEmpty, s"TxLog at $dir has no committed batches")
    spark.read.parquet(dirs: _*)
  }

  def committedBatchIds(spark: SparkSession, dir: String): Seq[Long] = {
    val (f, root) = fs(spark, dir)
    val commits = new Path(root, "_commits")
    if (!f.exists(commits)) Seq.empty
    else f.listStatus(commits).toSeq.map(_.getPath.getName.toLong).sorted
  }

  private def committedDirs(spark: SparkSession, dir: String): Seq[String] = {
    val (f, root) = fs(spark, dir)
    val commits = new Path(root, "_commits")
    if (!f.exists(commits)) Seq.empty
    else f.listStatus(commits).toSeq.map { st =>
      val in = f.open(st.getPath)
      val staged =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
      new Path(root, s"_staged/$staged").toString
    }
  }

  /** Fold all committed batches into ONE batch, bounding the
    * `_commits` listing cost (the documented knob: compact before the
    * log reaches ~10^5 marker files).  Safe against crashes at any
    * point — the protocol only ever adds a marker atomically and
    * deletes old markers AFTER the combined batch is committed:
    *
    *  1. read all committed rows, stage them as one new batch under
    *     `maxId + 1` and commit it (atomic marker create — a crash
    *     before this point changes nothing);
    *  2. delete the old markers (a crash mid-delete leaves some old
    *     markers alongside the combined one — rows would double-read,
    *     so readers must not run between steps; compact during a
    *     quiet window or hold the writer role while compacting);
    *  3. vacuum the now-orphaned staged dirs.
    *
    * Returns the new batch id, or None when the log has fewer than
    * two committed batches (nothing to fold).  Single-writer, like
    * every append protocol here: concurrent ingest during compaction
    * is the caller's lock to take. */
  def compact(spark: SparkSession, dir: String): Option[Long] = {
    val ids = committedBatchIds(spark, dir)
    if (ids.size < 2) return None
    val combinedId = ids.max + 1
    val all = readCommitted(spark, dir)
    require(commitBatch(all, dir, combinedId),
      s"TxLog.compact: batch $combinedId already exists in $dir — " +
        "a concurrent writer is active; compaction requires the writer role")
    val (f, root) = fs(spark, dir)
    ids.foreach(id => f.delete(new Path(root, s"_commits/$id"), false))
    vacuum(spark, dir)
    Some(combinedId)
  }

  /** Delete staged dirs no marker references (crashed or race-losing
    * attempts).  Returns how many orphans were removed. */
  def vacuum(spark: SparkSession, dir: String): Int = {
    val (f, root) = fs(spark, dir)
    val stagedRoot = new Path(root, "_staged")
    if (!f.exists(stagedRoot)) return 0
    val live = committedDirs(spark, dir).map(new Path(_).getName).toSet
    val orphans = f.listStatus(stagedRoot).toSeq
      .filterNot(st => live.contains(st.getPath.getName))
    orphans.foreach(st => f.delete(st.getPath, true))
    orphans.size
  }
}
