package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join — the deterministic skew lever for joins, the
  * join-side twin of `DatasetEngine.runSalted` (aggregation skew).
  *
  * A shuffled equi-join sends every row of a hot key to ONE reducer;
  * at 100 TB one hot key serializes the stage.  Salting splits each
  * big-side key into `buckets` sub-keys using a per-row positional
  * salt (`monotonically_increasing_id % buckets` — the same spread
  * `DatasetEngine.runSalted` uses; unlike a payload-content hash it
  * splits a hot key even when its payloads are all identical, and
  * unlike `rand()` it is stable given the input partitioning),
  * replicates the small side `buckets`× (explode of a literal array —
  * no extra shuffle of the big side beyond the join's own), and joins
  * on (key, salt).  The result is row-identical to the plain join FOR
  * ANY salt assignment — every big row matches exactly the small-side
  * replica carrying its salt — so correctness never depends on the
  * salt; only the partitioning does.
  *
  * When to reach for it: the small side is too big to broadcast AND a
  * key is KNOWN hot (AQE's runtime skew-join split handles the
  * discovered-at-runtime case; explicit salting is the planned-for
  * case and also works where AQE cannot re-plan, e.g. under required
  * distributions).  If the small side broadcasts, salting is moot —
  * broadcast joins never shuffle the big side at all.
  */
object SkewJoin {

  /** Inner equi-join of `big` and `small` on `key`, salted into
    * `buckets` sub-keys per key.  `small` must not contain the salt
    * column name; both sides keep their remaining columns. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      buckets: Int): DataFrame = {
    require(buckets > 1, s"buckets must be > 1, got $buckets")
    require(!big.columns.contains("__salt") && !small.columns.contains("__salt"),
      "__salt is reserved by saltedJoin")
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val rep = small.withColumn("__salt",
      explode(array((0 until buckets).map(b => lit(b.toLong)): _*)))
    salted.join(rep, Seq(key, "__salt")).drop("__salt")
  }
}
