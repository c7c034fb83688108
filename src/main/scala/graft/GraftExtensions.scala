package graft

import graft.functions.cat.{DotProductD, DotProductRewrite}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
    // auto-rewrite the interpreted HOF dot-product shape into the
    // native expression (semantics-preserving, see DotProductRewrite)
    ext.injectOptimizerRule(_ => DotProductRewrite)
  }
}
