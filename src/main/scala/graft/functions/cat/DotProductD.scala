package graft.functions.cat

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd dot product of two `array<double>` columns.
  *
  * Semantically identical to
  * `aggregate(zip_with(a, b, _ * _), 0.0d, _ + _)` over equal-length
  * arrays — strict left-to-right IEEE summation from 0.0, so results
  * are bit-identical to the higher-order-function formulation (and to
  * the DuckDB oracle's `list_reduce`).  The difference is execution:
  * HigherOrderFunction lambdas are interpreted per element (closure
  * dispatch + boxing per step), while this compiles into the
  * whole-stage-codegen'd tight loop below — the hot inner loop of
  * every similarity/ANN operator at scale.
  *
  * Null semantics match the HOF form EXACTLY (so the optimizer
  * rewrite is unconditionally semantics-preserving): null array →
  * null; length mismatch → null (`zip_with` null-pads, and the
  * summation lambda then yields null); any null element → null.
  * The per-element null checks compile away when both child array
  * types declare `containsNull = false`.
  */
case class DotProductD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // covariant override: ArrayType is public, AbstractDataType is not
  override def inputTypes: Seq[ArrayType] =
    Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  // null also on length mismatch / null elements, not just null inputs
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemsMayBeNull: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val checkNulls = elemsMayBeNull
    var s = 0.0
    var i = 0
    while (i < n) {
      if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val elemNullCheck =
        if (elemsMayBeNull)
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0d;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $elemNullCheck
         |    $s += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductD =
    copy(left = newLeft, right = newRight)
}
