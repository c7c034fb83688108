package graft.core

/** Mergeable rank/quantile sketch — a deterministic KLL-style
  * compactor hierarchy (see Karnin-Lang-Liberty, "Optimal Quantile
  * Approximation in Streams", FOCS 2016, and the reference's
  * whole-group quantile escape hatch it replaces at scale:
  * `/root/reference/src/Control/MapReduce/Core.hs:250-259` via
  * `functionToFold` — which buffers the entire group).
  *
  * Structure: level i holds items of weight 2^i in a buffer of at
  * most `k` items.  A full buffer sorts itself and promotes every
  * second item (fixed offset — deterministic, unlike the randomized
  * original; the price is a one-sided bias inside the same O(n/k)
  * empirical rank error) to the level above.  Memory is O(k log(n/k))
  * regardless of group size — the scale-safe twin of an exact
  * whole-group median.
  *
  * EXACT below capacity: until the first compaction (n ≤ k) every
  * value is retained, so quantiles are exact and independent of
  * partitioning/merge order — which is what lets a gate query check
  * it hash-exactly against `quantile_disc`.
  *
  * Quantile convention: `percentile_disc` — the smallest retained
  * value whose cumulative weight reaches q·N.
  */
final case class QSketch(k: Int, n: Long, sizes: List[Int],
    levels: List[List[Double]]) {

  def insert(x: Double): QSketch =
    QSketch.compact(copy(n = n + 1,
      sizes = (sizes.head + 1) :: sizes.tail,
      levels = (x :: levels.head) :: levels.tail))

  def merge(that: QSketch): QSketch = {
    require(k == that.k, s"merging sketches of different capacity: $k vs ${that.k}")
    val depth = math.max(levels.length, that.levels.length)
    val sz = sizes.padTo(depth, 0).lazyZip(that.sizes.padTo(depth, 0))
      .map(_ + _).toList
    val lv = levels.padTo(depth, Nil).lazyZip(that.levels.padTo(depth, Nil))
      .map(_ ::: _).toList
    QSketch.compact(QSketch(k, n + that.n, sz, lv))
  }

  /** Smallest retained value with cumulative weight ≥ q·N
    * (percentile_disc).  NaN on an empty sketch. */
  def quantile(q: Double): Double = {
    if (n == 0L) return Double.NaN
    val items = levels.zipWithIndex
      .flatMap { case (buf, i) => buf.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    val total = items.iterator.map(_._2).sum.toDouble
    val target = q * total
    var cum = 0L
    var out = items.last._1
    val it = items.iterator
    var found = false
    while (it.hasNext && !found) {
      val (v, w) = it.next()
      cum += w
      if (cum.toDouble >= target) { out = v; found = true }
    }
    out
  }

  /** Estimated rank of `x`: total weight of retained values < x. */
  def rankOf(x: Double): Long =
    levels.zipWithIndex.map { case (buf, i) =>
      buf.count(_ < x).toLong << i
    }.sum
}

object QSketch {
  def empty(k: Int): QSketch = {
    require(k >= 2, s"sketch capacity must be >= 2, got $k")
    QSketch(k, 0L, List(0), List(Nil))
  }

  /** Restore the invariant: every level buffer ≤ k items.  Promotes
    * odd-sorted-index items (weight doubles, total weight conserved);
    * an odd leftover stays at its level.  Buffer sizes are tracked
    * explicitly so the per-insert capacity check is O(1), not a walk
    * of the level-0 list. */
  private def compact(s: QSketch): QSketch = {
    var sz = s.sizes.toVector
    var lv = s.levels.toVector
    var i = 0
    while (i < lv.length) {
      if (sz(i) > s.k) {
        val sorted = lv(i).sorted.toVector
        val m = sorted.length / 2 * 2
        val promoted = (1 until m by 2).map(sorted).toList
        lv = lv.updated(i, sorted.drop(m).toList)
        sz = sz.updated(i, sorted.length - m)
        if (i + 1 >= lv.length) { lv = lv :+ Nil; sz = sz :+ 0 }
        lv = lv.updated(i + 1, promoted ::: lv(i + 1))
        sz = sz.updated(i + 1, sz(i + 1) + promoted.length)
      }
      i += 1
    }
    s.copy(sizes = sz.toList, levels = lv.toList)
  }
}
