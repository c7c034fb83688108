package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.graftshim.Bridge

/** Untyped fast-path engine: the same unpack → assign → group →
  * reduce pipeline with every step a Catalyst `Column` expression,
  * so the whole plan is native `Filter`/`Generate`/`Aggregate` —
  * whole-stage codegen, map-side partial aggregation, predicate
  * pushdown and column pruning all free (SURVEY §4).
  *
  * This is the path hot queries should take; the typed
  * [[DatasetEngine]] is the general fallback for opaque Scala
  * functions.  Mirrors the reference pipeline order
  * unpack→assign→group→reduce (`Engines/List.hs:86-89`), which also
  * guarantees filtering precedes the shuffle (SURVEY §4-O9).
  */
final case class FrameQuery(
    df: DataFrame,
    keys: Seq[Column] = Nil,
    aggsAcc: Seq[Column] = Nil,
    post: Option[Seq[Column]] = None,
    orderedByKey: Boolean = false) {

  /** Unpack/Filter — native Catalyst `Filter`, pushed down. */
  def filter(cond: Column): FrameQuery = copy(df = df.filter(cond))

  /** Unpack/melt — a projection whose expressions may multiply rows
    * (`explode`, `posexplode`, `stack`, `inline`). */
  def melt(cols: Column*): FrameQuery = copy(df = df.select(cols: _*))

  /** Melt via SQL expression strings — needed for generator functions
    * with multi-column output aliases (`stack(...) AS (tag, value)`). */
  def meltExpr(exprs: String*): FrameQuery = copy(df = df.selectExpr(exprs: _*))

  /** Assign: the key columns.  Value columns are implicit — whatever
    * the aggregate expressions reference; Catalyst prunes the rest. */
  def assign(keyCols: Column*): FrameQuery = copy(keys = keyCols)

  /** Reduce: aggregate expressions (alias each!).  Several exprs =
    * the reference's Applicative reduce product — one pass
    * (`Core.hs:211-218` ≙ one Catalyst Aggregate). */
  def reduce(aggs: Column*): FrameQuery = copy(aggsAcc = aggsAcc ++ aggs)

  /** Key-dependent relabel of the aggregated output — reference
    * `foldAndLabel`/`reduceMapWithKey` (`Simple.hs:106-153`). */
  def relabel(cols: Column*): FrameQuery = copy(post = Some(cols))

  /** Key-sorted output — reference ordered-key grouping (C2). */
  def ordered: FrameQuery = copy(orderedByKey = true)

  def run(): DataFrame = {
    val aggregated =
      if (aggsAcc.isEmpty) df
      else if (keys.isEmpty) df.agg(aggsAcc.head, aggsAcc.tail: _*)
      else df.groupBy(keys: _*).agg(aggsAcc.head, aggsAcc.tail: _*)
    val relabeled = post.fold(aggregated)(cols => aggregated.select(cols: _*))
    if (orderedByKey && keys.nonEmpty) {
      // sort by each key: resolve its NAME against the (possibly
      // relabeled) output.  A key whose name was renamed away by the
      // relabel sorts by the name as seen in the aggregate output —
      // the analyzer pulls it up through the projection.  A nameless
      // computed key sorts by its expression.  Either resolves, or
      // analysis fails loudly — NEVER a silent skip of a sort the
      // API promised.
      val names = relabeled.columns.toSet
      val sortCols = keys.map { k =>
        keyName(k) match {
          case Some(n) if names.contains(n) => relabeled.col(n)
          case Some(n) => org.apache.spark.sql.functions.col(n)
          case None    => unaliased(k)
        }
      }
      relabeled.orderBy(sortCols: _*)
    } else relabeled
  }

  /** Output-column name a key expression binds to, when it has one. */
  private def keyName(k: Column): Option[String] = Bridge.columnName(k)

  /** Strip a top-level alias (aliases are meaningless inside ORDER BY). */
  private def unaliased(k: Column): Column = Bridge.stripAlias(k)
}

object FrameQuery {
  def on(df: DataFrame): FrameQuery = FrameQuery(df)
}
