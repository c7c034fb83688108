package graft.simple

import graft.core._
import graft.engine.DatasetEngine
import org.apache.spark.sql.{Dataset, Encoder}

/** User-facing helpers mirroring the reference's `Simple.hs` surface
  * 1:1 (SURVEY §2.1-E) so any reference pipeline transliterates.
  * Engine defaults follow the reference: `mapReduce` = ordered-key
  * output (`mapReduceFold`, `Simple.hs:164-173`), `hashableMapReduce`
  * = unordered (`hashableMapReduceFold`, `Simple.hs:189-212`); under
  * Spark both run the same physical aggregation — only the explicit
  * final sort differs (SURVEY §4-O4).
  */
object Simple {

  /** Reference `noUnpack` (`Simple.hs:86-88`). */
  def noUnpack[X]: Unpack[X, X] = Unpack.none[X]

  /** Reference `simpleUnpack` (`Simple.hs:91-93`). */
  def simpleUnpack[X, Y](f: X => Y): Unpack[X, Y] = Unpack.map1(f)

  /** Reference `filterUnpack` (`Simple.hs:96-98`). */
  def filterUnpack[X](p: X => Boolean): Unpack[X, X] = Unpack.Filter(p)

  /** Reference `assign` (`Simple.hs:101-103`). */
  def assign[Y, K, C](getKey: Y => K)(getCols: Y => C): Assign[Y, K, C] =
    Assign(getKey, getCols)

  /** Reference `processAndLabel` (`Simple.hs:126-141`): whole-group
    * function + key-dependent relabel. */
  def processAndLabel[K, C, Y, Z](process: Iterator[C] => Y)(
      label: (K, Y) => Z): Reduce[K, C, Z] =
    Reduce.WholeGroup((k: K, cs: Iterator[C]) => label(k, process(cs)))

  /** Reference `foldAndLabel` (`Simple.hs:144-153`): fold + relabel —
    * the most-used reducer shape. */
  def foldAndLabel[K, C, Y, Z](fd: Fold[C, Y])(
      label: (K, Y) => Z): Reduce[K, C, Z] =
    Reduce.PerKeyFold[K, C, Y](fd).mapWithKey(label)

  /** Reference `reduceMapWithKey` (`Simple.hs:106-110`). */
  def reduceMapWithKey[K, C, D, E](f: (K, D) => E)(
      r: Reduce[K, C, D]): Reduce[K, C, E] = r.mapWithKey(f)

  /** Reference `reduceMMapWithKey` (`Simple.hs:112-117`): the
    * effectful twin — relabel the result of an effectful reduce. */
  def reduceMMapWithKey[K, C, D, E](f: (K, D) => E)(
      r: ReduceM[K, C, D]): ReduceM[K, C, E] = r.mapWithKey(f)

  /** Reference `processAndLabelM` (`Simple.hs:131-141`): effectful
    * whole-group function + key-dependent relabel.  The effect runs
    * inside the engine's mapGroups (per-partition order, SURVEY §7.5). */
  def processAndLabelM[K, C, Y, Z](process: Iterator[C] => Y)(
      label: (K, Y) => Z): ReduceM[K, C, Z] =
    ReduceM((k: K, cs: Iterator[C]) => label(k, process(cs)))

  /** Reference `foldAndLabelM` (`Simple.hs:148-153`): effectful fold
    * + relabel.  In Scala the "FoldM" is a Fold whose step/done may
    * side-effect; it runs whole-group on the ReduceM path, so effects
    * fire once per group element in group order. */
  def foldAndLabelM[K, C, Y, Z](fd: Fold[C, Y])(
      label: (K, Y) => Z): ReduceM[K, C, Z] =
    ReduceM((k: K, cs: Iterator[C]) => label(k, fd.fold(cs)))

  /** Default engine, ordered-key output — reference `mapReduceFold`
    * (`Simple.hs:164-173`). */
  def mapReduce[X, Y, K, C, D](
      ds: Dataset[X], u: Unpack[X, Y], a: Assign[Y, K, C], r: Reduce[K, C, D])(
      implicit ey: Encoder[Y], ekc: Encoder[(K, C)], ec: Encoder[C],
      ek: Encoder[K], ed: Encoder[D], ekd: Encoder[(K, D)]): Dataset[(K, D)] =
    DatasetEngine.run(ds, u, a, r, ordered = true)

  /** Unordered variant — reference `hashableMapReduceFold`
    * (`Simple.hs:189-212`); result is a bag. */
  def hashableMapReduce[X, Y, K, C, D](
      ds: Dataset[X], u: Unpack[X, Y], a: Assign[Y, K, C], r: Reduce[K, C, D])(
      implicit ey: Encoder[Y], ekc: Encoder[(K, C)], ec: Encoder[C],
      ek: Encoder[K], ed: Encoder[D], ekd: Encoder[(K, D)]): Dataset[(K, D)] =
    DatasetEngine.run(ds, u, a, r, ordered = false)

  /** Effectful default engine — reference `mapReduceFoldM`
    * (`Simple.hs:175-187`): ordered-key output, like its pure twin;
    * per-partition effect order (SURVEY §7.5). */
  def mapReduceM[X, Y, K, C, D](
      ds: Dataset[X], u: UnpackM[X, Y], a: AssignM[Y, K, C], r: ReduceM[K, C, D])(
      implicit ey: Encoder[Y], ekc: Encoder[(K, C)], ek: Encoder[K],
      ekd: Encoder[(K, D)]): Dataset[(K, D)] =
    DatasetEngine.runM(ds, u, a, r, ordered = true)

  /** Unordered effectful engine — reference `hashableMapReduceFoldM`
    * (`Simple.hs:200-212`); result is a bag. */
  def hashableMapReduceM[X, Y, K, C, D](
      ds: Dataset[X], u: UnpackM[X, Y], a: AssignM[Y, K, C], r: ReduceM[K, C, D])(
      implicit ey: Encoder[Y], ekc: Encoder[(K, C)], ek: Encoder[K],
      ekd: Encoder[(K, D)]): Dataset[(K, D)] =
    DatasetEngine.runM(ds, u, a, r, ordered = false)

  /** Reference `unpackOnlyFold` (`Simple.hs:215-222`). */
  def unpackOnly[X, Y](ds: Dataset[X], u: Unpack[X, Y])(
      implicit ey: Encoder[Y]): Dataset[Y] =
    DatasetEngine.unpackOnly(ds, u)

  /** Reference `unpackOnlyFoldM` (`Simple.hs:219-222`). */
  def unpackOnlyM[X, Y](ds: Dataset[X], u: UnpackM[X, Y])(
      implicit ey: Encoder[Y]): Dataset[Y] =
    DatasetEngine.unpackOnlyM(ds, u)

  /** Reference `concatFold` (`Simple.hs:156-162`): monoid-merge the
    * per-key results into one value.  Driver-side by design — only
    * call on demand; the distributed form is simply keeping the
    * `Dataset[(K, D)]` (SURVEY E8). */
  def concatFold[D](ds: Dataset[D])(combine: (D, D) => D): D =
    ds.reduce(combine)

  /** Reference `concatFoldM` (`Simple.hs:160-162`): same merge for
    * results of effectful pipelines — in Scala the effect is inside
    * `combine`, executed driver-side in reduction order. */
  def concatFoldM[D](ds: Dataset[D])(combine: (D, D) => D): D =
    concatFold(ds)(combine)

  /** Reference `postMapM` (`Core.hs:238-241`): post-process an
    * effectful reduce's result. */
  def postMapM[K, C, D, E](f: D => E)(r: ReduceM[K, C, D]): ReduceM[K, C, E] =
    r.map(f)
}
