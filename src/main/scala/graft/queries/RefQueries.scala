package graft.queries

import graft.core._
import graft.engine.{DatasetEngine, FrameQuery}
import graft.functions.ColFns._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference-parity query inventory Q01–Q13 (SURVEY §2.3), each
  * paired with its DuckDB oracle SQL.  Conventions (shared with the
  * oracle): output sorted by all key columns; floating-point results
  * rounded to 6 decimals; money sums computed exactly over
  * `DECIMAL(18,2)` so results are independent of partition/merge
  * order (SURVEY §7.4 determinism).
  *
  * Q01–Q10 run on the untyped Column fast path ([[FrameQuery]]) —
  * native Catalyst Filter/Generate/Aggregate, whole-stage codegen.
  * Q11–Q13 exercise the typed step algebra (Maybe-unpack on ragged
  * rows, whole-group reduce, effectful filter — reference
  * `Core.hs:96-259` patterns).
  */
object RefQueries {

  /** Schema-adaptive table read — see
    * [[graft.sources.Tables.adaptiveTable]]: observed physical types
    * normalize losslessly into the canonical logical schema or fail
    * loudly per column. */
  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables.adaptiveTable(s, dir, name)

  /** Deterministic avg of a 2-decimal money column. */
  private def avgMoney6(c: org.apache.spark.sql.Column) =
    round(sumMoney(c) / count(lit(1)), 6)

  // Q01 — minimal unpack→assign→group→reduce (Readme.md:28-44 shape).
  def q01(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "lineitem"))
      .assign(col("l_returnflag"))
      .reduce(round(sumMoney(col("l_extendedprice")), 6).as("sum_extprice"))
      .ordered.run()
  val q01Sql: String =
    """SELECT l_returnflag,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),6) AS sum_extprice
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q02 — Filter unpack (reference Core.hs:96-97 fast path).
  def q02(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "lineitem"))
      .filter(col("l_discount") > 0.05)
      .assign(col("l_linestatus"))
      .reduce(round(sumMoney(col("l_quantity")), 6).as("sum_qty"))
      .ordered.run()
  val q02Sql: String =
    """SELECT l_linestatus,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),6) AS sum_qty
      |FROM lineitem WHERE l_discount > 0.05
      |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // Q03 — Applicative reduce product: 5 aggregates, one pass
  // (reference Core.hs:211-218, ListStats.hs:39-44 ≙ one Catalyst Aggregate).
  def q03(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "lineitem"))
      .assign(col("l_returnflag"))
      .reduce(
        round(sumMoney(col("l_extendedprice")), 6).as("sum_price"),
        round(avgMoney(col("l_extendedprice")), 6).as("avg_price"),
        count(lit(1)).as("n"),
        round(min(col("l_extendedprice")), 6).as("min_price"),
        round(max(col("l_extendedprice")), 6).as("max_price"))
      .ordered.run()
  val q03Sql: String =
    """SELECT l_returnflag,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE),6) AS sum_price,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*),6) AS avg_price,
      | count(*) AS n,
      | round(min(l_extendedprice),6) AS min_price,
      | round(max(l_extendedprice),6) AS max_price
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q04 — Unpack melt (reference Core.hs:98; andTwice ListStats.hs:12-15):
  // each row melts into ('disc', l_discount) and ('tax', l_tax).
  def q04(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "lineitem"))
      .meltExpr("stack(2, 'disc', l_discount, 'tax', l_tax) AS (tag, value)")
      .assign(col("tag"))
      .reduce(avgMoney6(col("value")).as("avg_value"))
      .ordered.run()
  val q04Sql: String =
    """SELECT tag,
      | round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)/count(*),6) AS avg_value
      |FROM (SELECT 'disc' AS tag, l_discount AS value FROM lineitem
      |      UNION ALL SELECT 'tax', l_tax FROM lineitem)
      |GROUP BY tag ORDER BY tag""".stripMargin

  // Q05 — key-dependent relabel (reference foldAndLabel, Simple.hs:144-153).
  def q05(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "orders"))
      .assign(col("o_orderstatus"))
      .reduce(count(lit(1)).as("n"))
      .relabel(col("o_orderstatus"),
        concat(col("o_orderstatus"), lit(":"), col("n").cast("string")).as("labeled"))
      .ordered.run()
  val q05Sql: String =
    """SELECT o_orderstatus, o_orderstatus || ':' || CAST(count(*) AS VARCHAR) AS labeled
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // Q06 — unpack-only pipeline (reference unpackOnlyFold, Simple.hs:215-222).
  def q06(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "events"))
      .filter(col("event_type") === "click")
      .reduce(count(lit(1)).as("n_clicks"))
      .run()
  val q06Sql: String =
    "SELECT count(*) AS n_clicks FROM events WHERE event_type = 'click'"

  // Q07 — compound (tuple) keys (SURVEY §1.1.3).
  def q07(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "lineitem"))
      .assign(col("l_returnflag"), col("l_linestatus"))
      .reduce(round(sumMoney(col("l_quantity")), 6).as("sum_qty"))
      .ordered.run()
  val q07Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),6) AS sum_qty
      |FROM lineitem GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // Q08 — FL.mean reducer (reference bench/MapReduce.hs:64).  `value` is
  // a full-precision double, so the sum is taken over DECIMAL(38,15)
  // (exact, order-independent) and only divided at the end.
  def q08(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "events"))
      .assign(col("event_type"))
      .reduce(round(
        sum(col("value").cast("decimal(38,15)")).cast("double") / count(lit(1)), 6)
        .as("avg_value"))
      .ordered.run()
  val q08Sql: String =
    """SELECT event_type,
      | round(CAST(sum(CAST(value AS DECIMAL(38,15))) AS DOUBLE)/count(*),6) AS avg_value
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // Q09 — ordered-key grouping (reference groupByOrderedKey, C2/E9).
  def q09(s: SparkSession, dir: String): DataFrame =
    FrameQuery.on(tbl(s, dir, "customer"))
      .assign(col("c_mktsegment"))
      .reduce(round(sumMoney(col("c_acctbal")), 6).as("sum_acctbal"))
      .ordered.run()
  val q09Sql: String =
    """SELECT c_mktsegment,
      | round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE),6) AS sum_acctbal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // Q10 — concatFold monoid merge (reference Simple.hs:156-162): the
  // per-group sums of Q01's grouping re-merged into one global value.
  // Distributed form: a final global aggregate, never a driver loop.
  def q10(s: SparkSession, dir: String): DataFrame = {
    val one = lit(1.0).cast("decimal(18,2)")
    FrameQuery.on(tbl(s, dir, "lineitem"))
      .reduce(round(
        sum(col("l_extendedprice").cast("decimal(18,2)")
          * (one - col("l_discount").cast("decimal(18,2)"))).cast("double"), 6)
        .as("revenue"))
      .run()
  }
  val q10Sql: String =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      | * (CAST(1.0 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE),6) AS revenue
      |FROM lineitem""".stripMargin

  // Q11 — Maybe-unpack on ragged "dynamic record" rows (reference
  // bench/MapReduce.hs:292-318): orders become Map[String,Double] rows
  // with `custkey` deterministically dropped for every 3rd orderkey;
  // rows missing any required field melt away.  Typed engine path.
  def q11(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ragged = tbl(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .map { case (ok, ck, tp) =>
        val base = Map("orderkey" -> ok.toDouble, "totalprice" -> tp)
        if (ok % 3 == 0) base else base + ("custkey" -> ck.toDouble)
      }
    val unpack = Unpack.Explode[Map[String, Double], (Long, Double)] { m =>
      for {
        _  <- m.get("orderkey").iterator
        ck <- m.get("custkey").iterator
        tp <- m.get("totalprice").iterator
      } yield (ck.toLong % 13, tp)
    }
    val meanPennies: Fold[Double, Double] =
      Fold[Double, (Long, Long), Double]((0L, 0L))((b, x) =>
        (b._1 + math.round(x * 100), b._2 + 1))((x, y) =>
        (x._1 + y._1, x._2 + y._2))(b => b._1.toDouble / 100.0 / b._2)
    val out = DatasetEngine.run(ragged, unpack,
      Assign.of[(Long, Double), Long, Double](_._1)(_._2),
      Reduce.fromFold[Long, Double, Double](meanPennies), ordered = true)
    out.toDF("k", "avg_totalprice")
      .select(col("k"), round(col("avg_totalprice"), 6).as("avg_totalprice"))
  }
  val q11Sql: String =
    """SELECT o_custkey % 13 AS k,
      | round(CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100/count(*),6) AS avg_totalprice
      |FROM orders WHERE o_orderkey % 3 <> 0
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // Q12 — whole-group Reduce (reference Core.hs:179-180 /
  // processAndLabel, Simple.hs:126-141): median sees the full group.
  // mapGroups path — group streamed via iterator, one group in memory.
  def q12(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ds = tbl(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"))
      .as[(String, Double)]
    def median(it: Iterator[Double]): Double = {
      val v = it.toArray
      java.util.Arrays.sort(v)
      val n = v.length
      if (n % 2 == 1) v(n / 2) else (v(n / 2 - 1) + v(n / 2)) / 2.0
    }
    val out = DatasetEngine.run(ds, Unpack.none[(String, Double)],
      Assign.of[(String, Double), String, Double](_._1)(_._2),
      graft.simple.Simple.processAndLabel[String, Double, Double, Double](median)((_, m) => m),
      ordered = true)
    out.toDF("l_returnflag", "median_qty")
      .select(col("l_returnflag"), round(col("median_qty"), 6).as("median_qty"))
  }
  val q12Sql: String =
    """SELECT l_returnflag, round(median(l_quantity),6) AS median_qty
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q13 — effectful filter (reference FilterM, Core.hs:120-121; engine-M
  // path, SURVEY §7.5): the predicate increments a Spark accumulator
  // (the "effect"); result must equal the pure twin (the oracle).
  def q13(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seen = s.sparkContext.longAccumulator("q13_rows_seen")
    val ds = tbl(s, dir, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
    val out = DatasetEngine.runM(ds,
      UnpackM.FilterM[(String, Double)] { x => seen.add(1); x._2 > 10.0 },
      AssignM[(String, Double), String, Long](x => (x._1, 1L)),
      ReduceM.fromFold[String, Long, Long](Folds.count[Long]))
    out.toDF("event_type", "n").orderBy("event_type")
  }
  val q13Sql: String =
    """SELECT event_type, count(*) AS n FROM events WHERE value > 10
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // Q41 — the full effectful Simple surface in one ordered pipeline
  // (reference Simple.hs:112-153, 175-187): FilterM effect →
  // foldAndLabelM (effectful fold + relabel) → reduceMMapWithKey
  // (effectful key-dependent relabel) → mapReduceM (ordered-key
  // default, like the reference's mapReduceFoldM).
  def q41(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seen = s.sparkContext.longAccumulator("q41_rows_seen")
    val ds = tbl(s, dir, "events")
      .select(col("event_type"), col("value"))
      .as[(String, Double)]
    val reduce = graft.simple.Simple.reduceMMapWithKey[String, Long, String, String](
      (k, lbl) => s"$k|$lbl")(
      graft.simple.Simple.foldAndLabelM(Folds.count[Long])((_, n) => s"n=$n"))
    val out = graft.simple.Simple.mapReduceM(ds,
      UnpackM.FilterM[(String, Double)] { x => seen.add(1); x._2 > 10.0 },
      AssignM[(String, Double), String, Long](x => (x._1, 1L)),
      reduce)
    out.toDF("event_type", "labeled")
  }
  val q41Sql: String =
    """SELECT event_type, event_type || '|n=' || CAST(count(*) AS VARCHAR) AS labeled
      |FROM events WHERE value > 10
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q41_effectful_ordered" -> (q41 _),
    "q01_group_sum" -> (q01 _),
    "q02_filter_sum" -> (q02 _),
    "q03_multi_agg" -> (q03 _),
    "q04_melt_avg" -> (q04 _),
    "q05_relabel" -> (q05 _),
    "q06_unpack_only" -> (q06 _),
    "q07_compound_key" -> (q07 _),
    "q08_mean" -> (q08 _),
    "q09_ordered_key" -> (q09 _),
    "q10_concat_merge" -> (q10 _),
    "q11_ragged_maybe" -> (q11 _),
    "q12_whole_group_median" -> (q12 _),
    "q13_effectful_filter" -> (q13 _))

  val oracles: Map[String, String] = Map(
    "q41_effectful_ordered" -> q41Sql,
    "q01_group_sum" -> q01Sql,
    "q02_filter_sum" -> q02Sql,
    "q03_multi_agg" -> q03Sql,
    "q04_melt_avg" -> q04Sql,
    "q05_relabel" -> q05Sql,
    "q06_unpack_only" -> q06Sql,
    "q07_compound_key" -> q07Sql,
    "q08_mean" -> q08Sql,
    "q09_ordered_key" -> q09Sql,
    "q10_concat_merge" -> q10Sql,
    "q11_ragged_maybe" -> q11Sql,
    "q12_whole_group_median" -> q12Sql,
    "q13_effectful_filter" -> q13Sql)
}
