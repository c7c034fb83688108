package graft.core

/** The four-piece map-reduce algebra, re-expressed for Spark.
  *
  * Mirrors the reference's step GADTs (reference
  * `src/Control/MapReduce/Core.hs:96-259`): Unpack (filter or melt),
  * Assign (key/value extraction), Reduce (whole-group function or
  * per-key fold).  The reference's Functor/Profunctor instances are
  * ordinary `map`/`premap` combinators here.  Effectful (`*M`)
  * variants are plain Scala functions with side effects; the engine
  * runs them via `mapPartitions` with per-partition (not global)
  * ordering — the documented semantic deviation (SURVEY §7.5).
  */
sealed trait Unpack[X, Y] extends Serializable {
  /** Post-map (Functor; reference `Core.hs:107-115`): Filter is
    * rewritten to a melt, mirroring `Core.hs:108`. */
  def map[Z](f: Y => Z): Unpack[X, Z] = this match {
    case Unpack.Filter(p) =>
      Unpack.Explode((x: X) => if (p(x)) Iterator.single(f(x.asInstanceOf[Y])) else Iterator.empty)
    case Unpack.Explode(g) =>
      Unpack.Explode((x: X) => g(x).iterator.map(f))
  }
  /** Pre-map (Profunctor lmap). */
  def premap[W](f: W => X): Unpack[W, Y] = this match {
    case Unpack.Filter(p) =>
      Unpack.Explode((w: W) => { val x = f(w); if (p(x)) Iterator.single(x.asInstanceOf[Y]) else Iterator.empty })
    case Unpack.Explode(g) => Unpack.Explode((w: W) => g(f(w)))
  }
}

object Unpack {
  /** Keep rows passing the predicate — the special-cased fast path
    * (reference `Core.hs:96-97` "faster to do directly"). */
  final case class Filter[X](p: X => Boolean) extends Unpack[X, X]
  /** Melt/explode: each row becomes 0..n rows (reference `Core.hs:98`). */
  final case class Explode[X, Y](f: X => IterableOnce[Y]) extends Unpack[X, Y]

  /** Identity unpack — reference `noUnpack` (`Simple.hs:86-88`). */
  def none[X]: Unpack[X, X] = Filter((_: X) => true)
  /** 1→1 transform — reference `simpleUnpack` (`Simple.hs:91-93`). */
  def map1[X, Y](f: X => Y): Unpack[X, Y] =
    Explode((x: X) => Iterator.single(f(x)))
}

/** Key/value assignment — reference `Assign` (`Core.hs:144-145`),
  * built by `Simple.assign` (`Simple.hs:101-103`). */
final case class Assign[Y, K, C](key: Y => K, value: Y => C)
    extends Serializable {
  /** Post-map the value part (Functor; reference `Core.hs:147-153`). */
  def mapValue[C2](f: C => C2): Assign[Y, K, C2] =
    Assign(key, (y: Y) => f(value(y)))
  def premap[Z](f: Z => Y): Assign[Z, K, C] =
    Assign((z: Z) => key(f(z)), (z: Z) => value(f(z)))
}

object Assign {
  def of[Y, K, C](k: Y => K)(v: Y => C): Assign[Y, K, C] = Assign(k, v)
}

/** Per-key reduction — reference `Reduce` (`Core.hs:179-181`).
  * Three execution classes (the engine's `reduceFunction` dispatch,
  * reference `Engines.hs:62-65`):
  *  - [[Reduce.PerKeyFold]]: key-independent fold → compiled to a
  *    Spark `Aggregator` (partial aggregation, no group
  *    materialization) — strictly better than the reference, which
  *    materializes each group as a `Seq` first (`Engines/List.hs:70-79`);
  *  - [[Reduce.KeyedFold]]: `k -> Fold` (key-dependent fold,
  *    `ReduceFold`'s full generality) → `mapGroups`;
  *  - [[Reduce.WholeGroup]]: sees the entire group (`Reduce.Reduce`)
  *    → `mapGroups` with a streamed iterator.
  */
sealed trait Reduce[K, C, D] extends Serializable {
  /** Post-map the per-key result (Functor; `Core.hs:191-199`). */
  def map[E](f: D => E): Reduce[K, C, E] = this match {
    case Reduce.PerKeyFold(fd)  => Reduce.KeyedFold((_: K) => fd.map(f))
    case Reduce.KeyedFold(g)    => Reduce.KeyedFold((k: K) => g(k).map(f))
    case Reduce.WholeGroup(g)   => Reduce.WholeGroup((k: K, cs: Iterator[C]) => f(g(k, cs)))
  }
  /** Decorate the result with a key-dependent relabel — reference
    * `reduceMapWithKey` (`Simple.hs:106-110`) / the label halves of
    * `foldAndLabel`/`processAndLabel` (`Simple.hs:126-153`). */
  def mapWithKey[E](f: (K, D) => E): Reduce[K, C, E] = this match {
    case Reduce.PerKeyFold(fd) => Reduce.KeyedFold((k: K) => fd.map(d => f(k, d)))
    case Reduce.KeyedFold(g)   => Reduce.KeyedFold((k: K) => g(k).map(d => f(k, d)))
    case Reduce.WholeGroup(g)  => Reduce.WholeGroup((k: K, cs: Iterator[C]) => f(k, g(k, cs)))
  }
  /** Pre-map the per-group values (Profunctor; `Core.hs:201-209`). */
  def premap[B](f: B => C): Reduce[K, B, D] = this match {
    case Reduce.PerKeyFold(fd) => Reduce.PerKeyFold(fd.premap(f))
    case Reduce.KeyedFold(g)   => Reduce.KeyedFold((k: K) => g(k).premap(f))
    case Reduce.WholeGroup(g)  => Reduce.WholeGroup((k: K, bs: Iterator[B]) => g(k, bs.map(f)))
  }
  /** Applicative product: both reductions over the same group in one
    * pass (reference `Core.hs:211-218`).  Mixed fold/whole-group
    * products buffer the group once and run both — mirroring the
    * reference's eager `FL.fold` in the mixed case (`Core.hs:216-217`,
    * preserved per SURVEY §7.7). */
  def zip[E](that: Reduce[K, C, E]): Reduce[K, C, (D, E)] = (this, that) match {
    case (Reduce.PerKeyFold(f1), Reduce.PerKeyFold(f2)) =>
      Reduce.PerKeyFold(f1.zip(f2))
    case (Reduce.KeyedFold(g1), Reduce.KeyedFold(g2)) =>
      Reduce.KeyedFold((k: K) => g1(k).zip(g2(k)))
    case (Reduce.PerKeyFold(f1), Reduce.KeyedFold(g2)) =>
      Reduce.KeyedFold((k: K) => f1.zip(g2(k)))
    case (Reduce.KeyedFold(g1), Reduce.PerKeyFold(f2)) =>
      Reduce.KeyedFold((k: K) => g1(k).zip(f2))
    case (r1, r2) =>
      Reduce.WholeGroup((k: K, cs: Iterator[C]) => {
        val buf = cs.toVector
        (Reduce.run(r1)(k, buf.iterator), Reduce.run(r2)(k, buf.iterator))
      })
  }
}

object Reduce {
  final case class PerKeyFold[K, C, D](fold: Fold[C, D]) extends Reduce[K, C, D]
  final case class KeyedFold[K, C, D](fold: K => Fold[C, D]) extends Reduce[K, C, D]
  final case class WholeGroup[K, C, D](f: (K, Iterator[C]) => D) extends Reduce[K, C, D]

  /** Interpret any Reduce as a whole-group function — the engine-side
    * dispatch (reference `reduceFunction`, `Engines.hs:62-65`). */
  def run[K, C, D](r: Reduce[K, C, D])(k: K, cs: Iterator[C]): D = r match {
    case PerKeyFold(fd) => fd.fold(cs)
    case KeyedFold(g)   => g(k).fold(cs)
    case WholeGroup(f)  => f(k, cs)
  }

  def fromFold[K, C, D](fd: Fold[C, D]): Reduce[K, C, D] = PerKeyFold(fd)
}

/** Effectful twins of the steps — reference `UnpackM`/`AssignM`/
  * `ReduceM` (`Core.hs:120-122,156-157,187-189`).  In Scala, effects
  * are untracked side effects inside the functions; what the `M`
  * types buy is an execution contract: the engine runs them inside
  * `mapPartitions`, per-partition in input order, concurrently
  * across partitions, possibly re-run on task retry (SURVEY §7.5).
  * Effectful steps must therefore be idempotent-ish/commutative
  * (e.g. metric accumulators, per-partition resource handles).
  */
sealed trait UnpackM[X, Y] extends Serializable
object UnpackM {
  final case class FilterM[X](p: X => Boolean) extends UnpackM[X, X]
  final case class ExplodeM[X, Y](f: X => IterableOnce[Y]) extends UnpackM[X, Y]

  /** Lift a pure Unpack — reference `generalizeUnpack` (`Core.hs:138-141`). */
  def generalize[X, Y](u: Unpack[X, Y]): UnpackM[X, Y] = u match {
    case f: Unpack.Filter[X @unchecked]       => FilterM(f.p).asInstanceOf[UnpackM[X, Y]]
    case e: Unpack.Explode[X, Y @unchecked]   => ExplodeM(e.f)
  }
}

/** Reference `AssignM` (`Core.hs:156-171`). */
final case class AssignM[Y, K, C](kv: Y => (K, C)) extends Serializable
object AssignM {
  /** Reference `generalizeAssign` (`Core.hs:169-171`). */
  def generalize[Y, K, C](a: Assign[Y, K, C]): AssignM[Y, K, C] =
    AssignM((y: Y) => (a.key(y), a.value(y)))
}

/** Reference `ReduceM`/`ReduceFoldM` (`Core.hs:187-189`), interpreted
  * whole-group (the `reduceFunctionM` dispatch, `Engines.hs:68-72`). */
final case class ReduceM[K, C, D](f: (K, Iterator[C]) => D) extends Serializable {
  /** Post-map the result — reference `Functor ReduceM` (`Core.hs:195-199`)
    * and the `postMapM` shape (`Core.hs:238-241`). */
  def map[E](g: D => E): ReduceM[K, C, E] =
    ReduceM((k: K, cs: Iterator[C]) => g(f(k, cs)))
  /** Key-dependent relabel — reference `reduceMMapWithKey`
    * (`Simple.hs:112-117`). */
  def mapWithKey[E](g: (K, D) => E): ReduceM[K, C, E] =
    ReduceM((k: K, cs: Iterator[C]) => g(k, f(k, cs)))
  /** Pre-map the per-group values (Profunctor; `Core.hs:205-209`). */
  def premap[B](g: B => C): ReduceM[K, B, D] =
    ReduceM((k: K, bs: Iterator[B]) => f(k, bs.map(g)))
  /** Applicative product — reference `Applicative ReduceM`
    * (`Core.hs:220-227`): both effectful reductions see the same
    * group; the group is buffered once (the reference's eager-fold
    * mixed case, preserved per SURVEY §7.7). */
  def zip[E](that: ReduceM[K, C, E]): ReduceM[K, C, (D, E)] =
    ReduceM { (k: K, cs: Iterator[C]) =>
      val buf = cs.toVector
      (f(k, buf.iterator), that.f(k, buf.iterator))
    }
}
object ReduceM {
  /** Reference `generalizeReduce` (`Core.hs:230-233`). */
  def generalize[K, C, D](r: Reduce[K, C, D]): ReduceM[K, C, D] =
    ReduceM((k: K, cs: Iterator[C]) => Reduce.run(r)(k, cs))
  def fromFold[K, C, D](fd: Fold[C, D]): ReduceM[K, C, D] =
    ReduceM((_: K, cs: Iterator[C]) => fd.fold(cs))
}
