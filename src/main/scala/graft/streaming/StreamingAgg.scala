package graft.streaming

import graft.core.{Fold, FoldAggregator}
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface for the fold algebra (SURVEY §7.6).
  *
  * The reference's "streaming" engines are in-memory pull streams,
  * not event-time streaming (`Engines/Streaming.hs:24-25`); this is
  * the Spark-native extension: because reductions are mergeable
  * [[Fold]]s, they drop into watermarked windowed aggregation and
  * into `mapGroupsWithState` unchanged — the same `init/step/merge/
  * done` shape Spark's incremental execution needs.
  */
object StreamingAgg {

  /** A [[Fold]] as a SQL-callable UDAF column — usable in both batch
    * and streaming `groupBy(...).agg(...)`.  Folds carrying a
    * Catalyst buffer encoder (the shipped vocabulary) keep the
    * codegen'd unsafe-row buffer across the shuffle; only opaque
    * user folds fall back to Kryo. */
  def foldUdaf[C, D](fd: Fold[C, D])(
      implicit ic: Encoder[C], od: Encoder[D]): UserDefinedFunction = {
    val aux: Fold.Aux[C, fd.Buf, D] = fd
    udaf(FoldAggregator.auto(aux), ic)
  }

  /** Event-time tumbling-window aggregation with watermarking:
    * `readStream → withWatermark → groupBy(window, keys) → agg`.
    * Late data beyond `watermarkDelay` is dropped by Spark; state is
    * bounded (windows close).  Works identically on batch frames. */
  def windowedAgg(df: DataFrame, tsCol: String, watermarkDelay: String,
      windowDuration: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Sliding-window variant: windows of `windowDuration` advancing
    * every `slideDuration` (each event lands in w/s windows). */
  def slidingAgg(df: DataFrame, tsCol: String, watermarkDelay: String,
      windowDuration: String, slideDuration: String,
      keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDuration, slideDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Session windows: per-key activity bursts separated by at least
    * `gapDuration` of silence — state closes when the watermark
    * passes a session's end, so state stays bounded. */
  def sessionAgg(df: DataFrame, tsCol: String, watermarkDelay: String,
      gapDuration: String, keys: Seq[Column], aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .groupBy(session_window(col(tsCol), gapDuration) +: keys: _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Continuously-updated per-key fold over a stream — the streaming
    * twin of the batch engine's PerKeyFold path.  State = the fold
    * buffer (mergeable, so recovery/retry-safe); emits the current
    * `done(buffer)` per key on every trigger. */
  def runningFold[K, C, D](ds: Dataset[(K, C)], fd: Fold[C, D])(
      implicit ek: Encoder[K], ekd: Encoder[(K, D)]): Dataset[(K, D)] = {
    implicit val bufEnc: Encoder[fd.Buf] =
      Encoders.kryo(scala.reflect.ClassTag.AnyRef.asInstanceOf[scala.reflect.ClassTag[fd.Buf]])
    ds.groupByKey(_._1)
      .mapGroupsWithState[fd.Buf, (K, D)](GroupStateTimeout.NoTimeout) {
        (k: K, rows: Iterator[(K, C)], state: GroupState[fd.Buf]) =>
          val b0 = if (state.exists) state.get else fd.init
          val b1 = rows.foldLeft(b0)((b, kc) => fd.step(b, kc._2))
          state.update(b1)
          (k, fd.done(b1))
      }
  }

  /** Streaming dedup ON THE KEY COLUMNS ALONE (a duplicate key
    * arriving with a different event time is still dropped), with
    * state bounded by the watermark.  The guarantee is
    * WITHIN-WATERMARK-DELAY dedup, weaker than `Dedup.exact`:
    * `dropDuplicatesWithinWatermark` expires a key's state once the
    * watermark passes its event time plus the delay, so a duplicate
    * arriving AFTER its first occurrence's state expired is emitted
    * again.  That bounded state is exactly what lets it run
    * indefinitely on an unbounded stream — pick the delay ≥ the
    * maximum duplicate spread you need suppressed. */
  def dedupStream(df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermarkDelay: String): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Stream-stream equi-join with an event-time interval bound:
    * right rows join left rows whose timestamp lies in
    * `[right.ts - lowerBound, right.ts + upperBound]`.  BOTH sides
    * must be watermarked (done here) — that plus the time bound is
    * what lets Spark expire join state, so state stays bounded on
    * unbounded streams.  The streaming twin of an as-of/interval
    * join for feature enrichment at ingest. */
  def intervalJoin(left: DataFrame, leftTs: String, right: DataFrame,
      rightTs: String, keys: Seq[String], watermarkDelay: String,
      lowerBound: String, upperBound: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermarkDelay)
    val r = right.withWatermark(rightTs, watermarkDelay)
    val keyCond = keys.map(k => l(k) === r(k)).reduce(_ && _)
    val timeCond =
      l(leftTs) >= r(rightTs) - expr(s"INTERVAL $lowerBound") &&
        l(leftTs) <= r(rightTs) + expr(s"INTERVAL $upperBound")
    // keep one copy of each key column (the left one)
    keys.foldLeft(l.join(r, keyCond && timeCond))((d, k) => d.drop(r(k)))
  }

  /** Convenience: run a streaming Dataset to a named in-memory sink
    * (testing / interactive inspection). */
  def toMemorySink(df: DataFrame, name: String, outputMode: OutputMode)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()

  /** Durable parquet sink with exactly-once file commits: the
    * checkpoint tracks progress, so restarts resume without
    * duplicating output — the production sink for an ingest-dedup /
    * windowed-feature stream. Append mode (parquet sinks can't
    * update), so aggregations need a watermark to finalize rows. */
  def toParquetSink(df: DataFrame, path: String, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpointDir)
      .outputMode(OutputMode.Append)
      .start()
}
