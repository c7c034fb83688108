package graft

import graft.functions.cat.{DotProductD, DotProductRewrite, Md5HexSlice, MinhashSig, SortedIntersectCount}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SparkSessionExtensions entry point: registers the engine's native
  * Catalyst expressions as SQL-callable functions.
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`; the DataFrame API reaches
  * the same expressions via [[graft.functions.ColFns]] without any
  * registration.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductD].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot(arrayA, arrayB) takes 2 arguments")
        DotProductD(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName,
        "graft_sorted_intersect_count"),
      (children: Seq[Expression]) => {
        require(children.size == 2,
          "graft_sorted_intersect_count(sortedArrayA, sortedArrayB) takes 2 arguments")
        SortedIntersectCount(children.head, children(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_md5_slice"),
      new ExpressionInfo(classOf[Md5HexSlice].getName, "graft_md5_slice"),
      (children: Seq[Expression]) => {
        require(children.size == 3,
          "graft_md5_slice(str, startHexChar, lenHexChars) takes 3 arguments")
        (children(1), children(2)) match {
          case (Literal(s: Int, _), Literal(l: Int, _)) =>
            Md5HexSlice(children.head, s, l)
          case _ => throw new IllegalArgumentException(
            "graft_md5_slice start/len must be integer literals")
        }
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinhashSig].getName, "graft_minhash_sig"),
      (children: Seq[Expression]) => {
        require(children.size == 1,
          "graft_minhash_sig(shingleHashArray) takes 1 argument")
        MinhashSig(children.head)
      }))
    // auto-rewrite the interpreted HOF dot-product shape into the
    // native expression (semantics-preserving, see DotProductRewrite)
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
