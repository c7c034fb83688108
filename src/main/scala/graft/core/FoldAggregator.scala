package graft.core

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bridge from our [[Fold]] algebra to Spark's typed
  * `Aggregator[IN, BUF, OUT]` — the identical init/step/done(+merge)
  * shape (SURVEY §1.3).  This is what lets a reference-style
  * `ReduceFold` run with map-side partial aggregation instead of
  * materializing each group (reference materializes groups as `Seq`,
  * `src/Control/MapReduce/Engines/List.hs:70-79`; we must do better
  * at 100 TB).
  *
  * The buffer crosses the shuffle, so it needs an `Encoder`.  Product
  * types get Catalyst encoders (caller supplies); anything opaque
  * falls back to Kryo via [[FoldAggregator.kryoBuf]].
  */
final class FoldAggregator[A, S, B](
    val f: Fold.Aux[A, S, B])(
    implicit bufEnc: Encoder[S], outEnc: Encoder[B])
    extends Aggregator[A, S, B] {
  override def zero: S = f.init
  override def reduce(b: S, a: A): S = f.step(b, a)
  override def merge(x: S, y: S): S = f.merge(x, y)
  override def finish(s: S): B = f.done(s)
  override def bufferEncoder: Encoder[S] = bufEnc
  override def outputEncoder: Encoder[B] = outEnc
}

object FoldAggregator {
  def apply[A, S, B](f: Fold.Aux[A, S, B])(
      implicit bufEnc: Encoder[S], outEnc: Encoder[B]): FoldAggregator[A, S, B] =
    new FoldAggregator(f)

  /** Kryo-buffered variant for folds with opaque buffer types (loses
    * codegen on the buffer — acceptable on the typed fallback path;
    * the untyped Column engine is the fast path). */
  def kryoBuf[A, S, B](f: Fold.Aux[A, S, B])(
      implicit outEnc: Encoder[B]): FoldAggregator[A, S, B] = {
    implicit val se: Encoder[S] =
      Encoders.kryo(scala.reflect.ClassTag.AnyRef.asInstanceOf[scala.reflect.ClassTag[S]])
    new FoldAggregator(f)
  }

  /** Preferred constructor: the fold's own product encoder when it
    * has one (codegen'd unsafe-row buffers across the shuffle), Kryo
    * fallback otherwise. */
  def auto[A, S, B](f: Fold.Aux[A, S, B])(
      implicit outEnc: Encoder[B]): FoldAggregator[A, S, B] =
    f.bufEncoder match {
      case Some(enc) => new FoldAggregator(f)(enc, outEnc)
      case None      => kryoBuf(f)
    }
}
