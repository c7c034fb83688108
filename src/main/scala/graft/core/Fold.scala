package graft.core

/** A left fold with an explicitly mergeable buffer.
  *
  * Mirrors the shape of the reference's fold vocabulary
  * (`Control.Foldl.Fold`, re-exported at reference
  * `src/Control/MapReduce/Core.hs:74-79`): `init`/`step`/`done`,
  * plus `merge` which the reference never needs (its engines are
  * single-threaded left folds) but a distributed engine must have:
  * Spark runs `step` partially on every partition and combines the
  * partial buffers with `merge` (map-side partial aggregation).
  * `merge` must be commutative+associative with `init` as identity.
  *
  * The Applicative product of the reference (`Core.hs:211-218`,
  * `examples/ListStats.hs:39-44`) is [[zip]]: both folds run over the
  * same pass, buffers are paired.
  */
trait Fold[A, B] extends Serializable { self =>
  type Buf
  def init: Buf
  def step(b: Buf, a: A): Buf
  def merge(x: Buf, y: Buf): Buf
  def done(b: Buf): B

  /** Catalyst encoder for the buffer, when one exists: buffers with
    * product encoders cross the shuffle codegen'd (unsafe-row),
    * instead of Kryo-serialized blobs.  The shipped vocabulary
    * ([[Folds]]) provides them; opaque user folds fall back to Kryo
    * in the engine. */
  def bufEncoder: Option[org.apache.spark.sql.Encoder[Buf]] = None

  /** Run locally over any collection (the reference's `FL.fold`). */
  final def fold(as: IterableOnce[A]): B =
    done(as.iterator.foldLeft(init)(step))

  /** Post-map the result (Functor; reference `Core.hs:191-199`). */
  final def map[C](f: B => C): Fold.Aux[A, self.Buf, C] =
    new Fold[A, C] {
      type Buf = self.Buf
      def init = self.init
      def step(b: Buf, a: A) = self.step(b, a)
      def merge(x: Buf, y: Buf) = self.merge(x, y)
      def done(b: Buf) = f(self.done(b))
      override def bufEncoder = self.bufEncoder
    }

  /** Pre-map the input (Profunctor lmap; reference `Core.hs:201-209`,
    * `FL.premap` usage at `bench/MapReduce.hs:305-306`). */
  final def premap[Z](f: Z => A): Fold.Aux[Z, self.Buf, B] =
    new Fold[Z, B] {
      type Buf = self.Buf
      def init = self.init
      def step(b: Buf, z: Z) = self.step(b, f(z))
      def merge(x: Buf, y: Buf) = self.merge(x, y)
      def done(b: Buf) = self.done(b)
      override def bufEncoder = self.bufEncoder
    }

  /** Applicative product: one pass, paired buffers
    * (reference `Core.hs:211-218`). */
  final def zip[C](that: Fold[A, C]): Fold.Aux[A, (self.Buf, that.Buf), (B, C)] =
    new Fold[A, (B, C)] {
      type Buf = (self.Buf, that.Buf)
      def init = (self.init, that.init)
      def step(b: Buf, a: A) = (self.step(b._1, a), that.step(b._2, a))
      def merge(x: Buf, y: Buf) =
        (self.merge(x._1, y._1), that.merge(x._2, y._2))
      def done(b: Buf) = (self.done(b._1), that.done(b._2))
      override def bufEncoder = for {
        ea <- self.bufEncoder; eb <- that.bufEncoder
      } yield org.apache.spark.sql.Encoders.tuple(ea, eb)
    }

  final def zipWith[C, D](that: Fold[A, C])(f: (B, C) => D): Fold[A, D] =
    zip(that).map { case (b, c) => f(b, c) }
}

object Fold {
  type Aux[A, S, B] = Fold[A, B] { type Buf = S }

  /** Build a fold from its four pieces.  `z` is BY-NAME and
    * re-evaluated on every `init` call: folds with mutable buffers
    * (e.g. [[Folds.bloom]]'s in-place `Array[Long]`) get a FRESH
    * instance per group — a shared instance would alias every group
    * in a partition.  Immutable buffers are unaffected. */
  def apply[A, S, B](z: => S)(st: (S, A) => S)(mg: (S, S) => S)(
      dn: S => B): Aux[A, S, B] =
    new Fold[A, B] {
      type Buf = S
      def init = z
      def step(b: S, a: A) = st(b, a)
      def merge(x: S, y: S) = mg(x, y)
      def done(b: S) = dn(b)
    }

  /** Monoid fold: init=empty, step=combine, merge=combine. */
  def monoid[A](empty: => A)(combine: (A, A) => A): Aux[A, A, A] =
    apply(empty)(combine)(combine)(identity)

  /** Attach a Catalyst buffer encoder (see [[Fold.bufEncoder]]). */
  def withEncoder[A, S, B](f: Aux[A, S, B],
      enc: org.apache.spark.sql.Encoder[S]): Aux[A, S, B] =
    new Fold[A, B] {
      type Buf = S
      def init = f.init
      def step(b: S, a: A) = f.step(b, a)
      def merge(x: S, y: S) = f.merge(x, y)
      def done(b: S) = f.done(b)
      override def bufEncoder = Some(enc)
    }
}

/** The fold vocabulary the reference actually exercises (SURVEY §2.1-G):
  * sum, mean, count, min, max, list, plus premap/map/zip algebra. */
object Folds {
  private val E = org.apache.spark.sql.Encoders

  /** Native Catalyst encoder for array/map buffer types `Encoders`
    * has no factory for — partial aggregation buffers cross the
    * shuffle as codegen'd unsafe rows instead of Kryo blobs. */
  private def catalystEnc[T: scala.reflect.runtime.universe.TypeTag]
      : org.apache.spark.sql.Encoder[T] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[T]()

  def sum[A](implicit n: Numeric[A]): Fold.Aux[A, A, A] =
    Fold.monoid(n.zero)(n.plus)

  /** [[sum]] over doubles with a codegen'd buffer encoder. */
  def sumD: Fold.Aux[Double, Double, Double] =
    Fold.withEncoder(sum[Double], E.scalaDouble)

  def count[A]: Fold.Aux[A, Long, Long] =
    Fold.withEncoder(
      Fold[A, Long, Long](0L)((s, _) => s + 1L)(_ + _)(identity), E.scalaLong)

  /** (sum, count) buffer; NaN on empty group like SQL AVG of nothing
    * is NULL — we surface Double.NaN, caller decides. */
  def mean: Fold.Aux[Double, (Double, Long), Double] =
    Fold.withEncoder(
      Fold[Double, (Double, Long), Double]((0.0, 0L))((s, a) =>
        (s._1 + a, s._2 + 1L))((x, y) => (x._1 + y._1, x._2 + y._2))(s =>
        if (s._2 == 0L) Double.NaN else s._1 / s._2),
      E.tuple(E.scalaDouble, E.scalaLong))

  def min[A](implicit o: Ordering[A]): Fold.Aux[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](Option.empty[A])((s, a) =>
      Some(s.fold(a)(o.min(_, a))))((x, y) =>
      (x, y) match {
        case (Some(a), Some(b)) => Some(o.min(a, b))
        case _                  => x.orElse(y)
      })(identity)

  def max[A](implicit o: Ordering[A]): Fold.Aux[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](Option.empty[A])((s, a) =>
      Some(s.fold(a)(o.max(_, a))))((x, y) =>
      (x, y) match {
        case (Some(a), Some(b)) => Some(o.max(a, b))
        case _                  => x.orElse(y)
      })(identity)

  /** [[min]]/[[max]] over doubles with codegen'd `Option` buffer
    * encoders (the generic forms can't name one for an arbitrary
    * `A`) — zips of these stay native across shuffles and state
    * stores. */
  def minD: Fold.Aux[Double, Option[Double], Option[Double]] =
    Fold.withEncoder(min[Double], catalystEnc[Option[Double]])
  def maxD: Fold.Aux[Double, Option[Double], Option[Double]] =
    Fold.withEncoder(max[Double], catalystEnc[Option[Double]])

  /** Product of the group — `Control.Foldl.product` parity. */
  def product[A](implicit n: Numeric[A]): Fold.Aux[A, A, A] =
    Fold.monoid(n.one)(n.times)

  /** Element with the smallest projected key — `Control.Foldl
    * .minimumBy` parity.  Strict `<` on the key means the FIRST
    * element among key-ties wins, both sequentially and through any
    * in-order chunked merge (each partial keeps its first-seen min;
    * an earlier partial beats a later tie), so the merge law holds
    * exactly.  Like [[first]], tie-breaking across Spark partitions
    * follows partition order — deterministic results need unique keys
    * or a composite tiebreak key. */
  def minimumBy[A, K](f: A => K)(implicit o: Ordering[K]): Fold.Aux[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](Option.empty[A])((s, a) =>
      Some(s.fold(a)(b => if (o.lt(f(a), f(b))) a else b)))((x, y) =>
      (x, y) match {
        case (Some(a), Some(b)) => Some(if (o.lt(f(b), f(a))) b else a)
        case _                  => x.orElse(y)
      })(identity)

  /** Element with the largest projected key — `Control.Foldl
    * .maximumBy` parity; same first-wins tie semantics as
    * [[minimumBy]]. */
  def maximumBy[A, K](f: A => K)(implicit o: Ordering[K]): Fold.Aux[A, Option[A], Option[A]] =
    minimumBy(f)(o.reverse)

  /** First element satisfying `p` — `Control.Foldl.find` parity.
    * First-wins through in-order merges (each partial keeps its own
    * first match; earlier partials win), so the merge law holds
    * exactly; across Spark partitions "first" follows partition
    * order, like [[first]]. */
  def find[A](p: A => Boolean): Fold.Aux[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](Option.empty[A])((s, a) =>
      if (s.isEmpty && p(a)) Some(a) else s)(_.orElse(_))(identity)

  /** Last `n` elements in encounter order — `Control.Foldl.lastN`
    * parity (bounded buffer: each partial keeps ≤ n, merge
    * concatenates and re-truncates, so the law holds exactly for
    * in-order merges).  Deterministic across Spark partitions only
    * with a single partition or pre-sorted input, like [[last]]. */
  def lastN[A](n: Int): Fold.Aux[A, Vector[A], List[A]] = {
    require(n >= 0, s"lastN needs n >= 0, got $n")
    Fold[A, Vector[A], List[A]](Vector.empty[A])((s, a) =>
      if (n == 0) s else (s :+ a).takeRight(n))((x, y) =>
      (x ++ y).takeRight(n))(_.toList)
  }

  /** Membership test — `Control.Foldl.elem` parity (false on empty). */
  def elem[A](x: A): Fold.Aux[A, Boolean, Boolean] = any[A](_ == x)

  /** Absence test — `Control.Foldl.notElem` parity (vacuously true on
    * empty). */
  def notElem[A](x: A): Fold.Aux[A, Boolean, Boolean] = all[A](_ != x)

  /** True iff any element satisfies `p` — `Control.Foldl.any`
    * (OR-monoid buffer, so merges commute; true on no elements only
    * if none seen, i.e. false on empty like the reference). */
  def any[A](p: A => Boolean): Fold.Aux[A, Boolean, Boolean] =
    Fold.withEncoder(
      Fold[A, Boolean, Boolean](false)((s, a) => s || p(a))(_ || _)(identity),
      E.scalaBoolean)

  /** True iff every element satisfies `p` — `Control.Foldl.all`
    * (AND-monoid; vacuously true on empty, like the reference). */
  def all[A](p: A => Boolean): Fold.Aux[A, Boolean, Boolean] =
    Fold.withEncoder(
      Fold[A, Boolean, Boolean](true)((s, a) => s && p(a))(_ && _)(identity),
      E.scalaBoolean)

  /** Distinct elements as a Set — `Control.Foldl.set` parity.  Like
    * [[list]] this buffers unboundedly (a group's distinct values);
    * prefer [[hll]] for cardinality or exact `distinct` upstream when
    * the value domain is large. */
  def set[A]: Fold.Aux[A, Set[A], Set[A]] =
    Fold[A, Set[A], Set[A]](Set.empty[A])((s, a) => s + a)(_ union _)(identity)

  /** Buffer the whole group — the `functionToFold` escape hatch
    * (reference `Core.hs:250-259`); documented memory-unsafe at scale,
    * merge order follows partition order so treat result as a bag. */
  def list[A]: Fold.Aux[A, List[A], List[A]] =
    Fold[A, List[A], List[A]](List.empty[A])((s, a) => a :: s)((x, y) =>
      y ::: x)(_.reverse)

  /** Adapt a whole-container function into a buffering fold —
    * the reference's `functionToFold` (`Core.hs:250-259`). */
  def ofFunction[A, B](f: Seq[A] => B): Fold[A, B] = list[A].map(f)

  /** First element in partition/merge order — only deterministic when
    * the merge order is (single partition or pre-sorted input). */
  def first[A]: Fold.Aux[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](Option.empty[A])((s, a) =>
      s.orElse(Some(a)))((x, y) => x.orElse(y))(identity)

  /** Last element in partition/merge order (same caveat as [[first]]). */
  def last[A]: Fold.Aux[A, Option[A], Option[A]] =
    Fold[A, Option[A], Option[A]](Option.empty[A])((s, a) =>
      Some(a))((x, y) => y.orElse(x))(identity)

  /** Population variance via Chan's parallel one-pass update —
    * (count, mean, M2) buffer merges exactly, so the result is
    * independent of partitioning up to float noise. */
  def variance: Fold.Aux[Double, (Long, Double, Double), Double] =
    Fold.withEncoder(varianceImpl,
      E.tuple(E.scalaLong, E.scalaDouble, E.scalaDouble))

  private def varianceImpl: Fold.Aux[Double, (Long, Double, Double), Double] =
    Fold[Double, (Long, Double, Double), Double]((0L, 0.0, 0.0)) {
      case ((n, mu, m2), x) =>
        val n1 = n + 1; val d = x - mu; val mu1 = mu + d / n1
        (n1, mu1, m2 + d * (x - mu1))
    } {
      case ((na, mua, m2a), (nb, mub, m2b)) =>
        if (na == 0L) (nb, mub, m2b)
        else if (nb == 0L) (na, mua, m2a)
        else {
          val n = na + nb; val d = mub - mua
          (n, mua + d * nb / n, m2a + m2b + d * d * na * nb / n)
        }
    } { case (n, _, m2) => if (n == 0L) Double.NaN else m2 / n }

  def stddev: Fold[Double, Double] = variance.map(math.sqrt)

  /** Approximate quantile via the mergeable [[QSketch]]: O(k log n)
    * memory per group at ANY group size — the scale-safe twin of a
    * whole-group exact median ([[ofFunction]] + sort).  Exact (and
    * merge-order independent) while n ≤ capacity; bounded rank error
    * after compaction kicks in.  percentile_disc convention. */
  def approxQuantile(capacity: Int, q: Double): Fold.Aux[Double, QSketch, Double] =
    Fold.withEncoder(
      Fold[Double, QSketch, Double](QSketch.empty(capacity))((s, x) =>
        s.insert(x))((a, b) => a.merge(b))(_.quantile(q)),
      org.apache.spark.sql.Encoders.product[QSketch])

  /** [[approxQuantile]]'s sketch-valued sibling: keep the whole
    * mergeable [[QSketch]] as the group result, for callers that need
    * more than one probe of the distribution — e.g. broadcasting
    * per-group sketches and ranking every row against its group
    * (`rankOf`) without a per-group sort or window. */
  def quantileSketch(capacity: Int): Fold.Aux[Double, QSketch, QSketch] =
    Fold.withEncoder(
      Fold[Double, QSketch, QSketch](QSketch.empty(capacity))((s, x) =>
        s.insert(x))((a, b) => a.merge(b))(identity),
      org.apache.spark.sql.Encoders.product[QSketch])

  /** HyperLogLog distinct-count sketch over PRE-HASHED 60-bit values
    * (e.g. `ColFns.h60` upstream): 2^p max-registers, merged by
    * elementwise max — associative, commutative AND idempotent, so
    * the estimate is bit-identical under any partitioning/merge order
    * (and retry-safe).  Flajolet et al. estimator with the
    * linear-counting small-range correction.  Memory: 2^p ints per
    * group regardless of cardinality — the distinct-count analog of
    * [[approxQuantile]]. */
  def hll(p: Int): Fold.Aux[Long, Array[Int], Double] = {
    require(p >= 4 && p <= 16, s"hll precision must be in [4,16], got $p")
    val m = 1 << p
    val width = 60 - p
    // buffer = plain Array[Int], mutated IN PLACE in step (safe: init
    // is by-name → fresh per group; the Aggregator bridge's buffer
    // objects are group-private).  merge stays PURE — fresh output,
    // inputs untouched — so law-spec reuse and the engine's
    // merge-as-step stages see value semantics.  The array encoder
    // keeps partial buffers codegen'd across the shuffle (no Kryo).
    Fold.withEncoder(
      Fold[Long, Array[Int], Double](new Array[Int](m)) { (s, h) =>
        val b = (h & (m - 1)).toInt
        val w = h >>> p
        val r = width + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
        if (r > s(b)) s(b) = r
        s
      } { (x, y) =>
        val out = new Array[Int](m)
        var i = 0
        while (i < m) { out(i) = math.max(x(i), y(i)); i += 1 }
        out
      } { regs =>
        // Flajolet et al. bias-correction constants: the closed form
        // 0.7213/(1+1.079/m) is the asymptotic value, standard only
        // for m >= 128; the small-m registers have their own constants
        val alpha = m match {
          case 16 => 0.673
          case 32 => 0.697
          case 64 => 0.709
          case _  => 0.7213 / (1.0 + 1.079 / m)
        }
        val sum = regs.foldLeft(0.0)((a, r) => a + math.pow(2.0, -r))
        val e = alpha * m * m / sum
        val zeros = regs.count(_ == 0)
        if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
      },
      catalystEnc[Array[Int]])
  }

  /** Top-k by the given ordering, largest first — bounded-size merge
    * (the reduction analog of ORDER BY ... LIMIT k).
    *
    * Buffer: an ascending sorted list of ≤ k elements, head = the
    * current cutoff.  Once warm, a non-qualifying row is rejected in
    * O(1) (compare against the cutoff); a qualifying row is a single
    * O(k) insertion — not the O(k log k) full re-sort per row of the
    * naive shape.  Merge is one linear merge of two sorted lists. */
  def topK[A](k: Int)(implicit o: Ordering[A]): Fold.Aux[A, List[A], List[A]] = {
    require(k > 0, s"topK needs k > 0, got $k")
    // insert into ascending-sorted s (iterative: no stack growth at large k)
    def insertAsc(s: List[A], a: A): List[A] = {
      val smaller = scala.collection.mutable.ListBuffer.empty[A]
      var rest = s
      while (rest.nonEmpty && o.lt(rest.head, a)) { smaller += rest.head; rest = rest.tail }
      smaller.prependToList(a :: rest)
    }
    Fold[A, List[A], List[A]](List.empty[A]) { (s, a) =>
      if (s.lengthCompare(k) >= 0) {
        if (o.lteq(a, s.head)) s else insertAsc(s.tail, a)
      } else insertAsc(s, a)
    } { (x, y) =>
      val out = scala.collection.mutable.ListBuffer.empty[A]
      var (l, r) = (x, y)
      while (l.nonEmpty && r.nonEmpty) {
        if (o.lteq(l.head, r.head)) { out += l.head; l = l.tail }
        else { out += r.head; r = r.tail }
      }
      val merged = out.prependToList(l ::: r)
      val drop = merged.length - k
      if (drop > 0) merged.drop(drop) else merged
    } (_.reverse)
  }

  /** Misra–Gries heavy hitters: at most `capacity` counters per
    * buffer.  EXACT while a group's distinct-key count stays ≤
    * capacity (no decrement ever fires — the regime the oracle
    * checks); beyond it, every reported count is an undercount by at
    * most n/(capacity+1) and every key with true frequency >
    * n/(capacity+1) is guaranteed present (the classic MG bound,
    * preserved under [[merge]] per Agarwal et al., "Mergeable
    * Summaries", PODS'12: sum counters, then subtract the
    * (capacity+1)-th largest count and drop non-positives).
    * Memory: O(capacity) per group at ANY group size — the
    * frequent-items analog of [[approxQuantile]]/[[hll]].
    *
    * Determinism: BELOW capacity (no decrement, no rebase) the result
    * is exact and identical under any partitioning/merge order — the
    * regime the oracle checks.  ABOVE capacity the ERROR BOUND holds
    * under any merge tree, but which near-threshold keys survive (and
    * their exact undercounts) can vary with Spark's reduce-side merge
    * order — inherent to merged MG summaries; size capacity with
    * headroom when stable key sets matter. */
  def heavyHitters[A: scala.reflect.runtime.universe.TypeTag](
      capacity: Int): Fold.Aux[A, Map[A, Long], Map[A, Long]] = {
    require(capacity > 0, s"heavyHitters needs capacity > 0, got $capacity")
    // buffer stays an immutable Map: the hot below-capacity path is a
    // single-node `updated`, and value semantics keep the merge-law
    // spec and merge-as-step engine stages correct for free; the
    // decrement/rebase paths that rebuild the map run at most once
    // per capacity-exceeded step — sublinear churn.  The TypeTag
    // buys a native map encoder instead of Kryo.
    Fold.withEncoder(
      Fold[A, Map[A, Long], Map[A, Long]](Map.empty[A, Long]) { (s, a) =>
        s.get(a) match {
          case Some(c) => s.updated(a, c + 1L)
          case None if s.size < capacity => s.updated(a, 1L)
          case None => // decrement-all: drops ≥1 counter, admits nothing
            s.iterator.collect { case (k, c) if c > 1L => (k, c - 1L) }.toMap
        }
      } { (x, y) =>
        val summed = y.foldLeft(x) { case (m, (k, c)) =>
          m.updated(k, m.getOrElse(k, 0L) + c)
        }
        if (summed.size <= capacity) summed
        else {
          // subtract the (capacity+1)-th largest count, keep positives
          val cut = summed.valuesIterator.toIndexedSeq.sorted(
            Ordering[Long].reverse).apply(capacity)
          summed.iterator.collect {
            case (k, c) if c > cut => (k, c - cut)
          }.toMap
        }
      } (identity),
      catalystEnc[Map[A, Long]])
  }

  /** Bloom-filter fold over PRE-HASHED 64-bit values (e.g.
    * `ColFns.h60` upstream): fixed `numBits` bitset, `numHashes`
    * probes per value by double hashing.  Merge = bitwise OR —
    * associative, commutative AND idempotent, so (like [[hll]]) the
    * filter is bit-identical under any partitioning/merge order and
    * retry-safe.  No false negatives ever; false-positive rate ≈
    * (1-e^(-kn/m))^k.  Use with [[Folds.bloomContains]] for the probe
    * side (same probe derivation by construction). */
  def bloom(numBits: Int, numHashes: Int): Fold.Aux[Long, Array[Long], Vector[Long]] = {
    require(numBits > 0 && numBits % 64 == 0,
      s"numBits must be a positive multiple of 64, got $numBits")
    require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
    val words = numBits / 64
    // buffer = Array[Long] mutated IN PLACE: the old persistent-Vector
    // buffer copied an O(log) node path per probe per row — ~100
    // words copied where the filter build needs 5 bit-sets.  Safe
    // because init is by-name (fresh array per group) and merge is
    // PURE (fresh output); done converts to Vector once per group, so
    // callers keep value semantics. */
    Fold.withEncoder(
      Fold[Long, Array[Long], Vector[Long]](new Array[Long](words)) { (s, h) =>
        var i = 0
        while (i < numHashes) {
          val pos = bloomPos(h, i, numBits)
          s(pos >>> 6) |= 1L << (pos & 63)
          i += 1
        }
        s
      } { (x, y) =>
        val out = new Array[Long](words)
        var i = 0
        while (i < words) { out(i) = x(i) | y(i); i += 1 }
        out
      } (_.toVector),
      catalystEnc[Array[Long]])
  }

  /** Probe a [[bloom]] bitset: true if `h` may have been inserted
    * (false ⇒ definitely absent).  Must be called with the same
    * `numBits`/`numHashes` the filter was built with. */
  def bloomContains(bits: Array[Long], numHashes: Int, h: Long): Boolean = {
    val numBits = bits.length * 64
    var i = 0
    while (i < numHashes) {
      val pos = bloomPos(h, i, numBits)
      if ((bits(pos >>> 6) & (1L << (pos & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** i-th probe position: double hashing (h, odd-ified upper half) —
    * the standard Kirsch–Mitzenmacher construction. */
  private def bloomPos(h: Long, i: Int, numBits: Int): Int = {
    val h2 = (h >>> 33) | 1L
    (((h + i * h2) & Long.MaxValue) % numBits).toInt
  }
}
