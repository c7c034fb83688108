package graft.functions.cat

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** `|A ∩ B|` of two SORTED, DISTINCT, null-free arrays as a single
  * merge walk — the hot kernel of set-similarity verification
  * (n-gram / shingle Jaccard over millions of candidate pairs).
  *
  * Spark's `array_intersect` builds a per-pair hash set of one side,
  * probes the other, and materializes the matched elements as a new
  * array that `size(...)` immediately discards — per-pair hashing and
  * allocation dominate blocked near-dup joins.  This expression walks
  * the two sorted arrays with element comparisons only: O(|A|+|B|),
  * zero allocation, whole-stage codegen'd.
  *
  * PRECONDITION (caller-enforced, engine-internal): both arrays
  * ascending-sorted and duplicate-free (`array_sort(array_distinct(…))`)
  * with no null elements; unsorted input undercounts.  Result is the
  * plain set-intersection cardinality — identical to
  * `size(array_intersect(a, b))` and to DuckDB
  * `len(list_intersect(a, b))` on the same sets.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    val m = y.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val cmp = ordering.compare(x.get(i, elemType), y.get(j, elemType))
      if (cmp == 0) { c += 1; i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val et = elemType
      val jt = CodeGenerator.javaType(et)
      val n = ctx.freshName("n"); val m = ctx.freshName("m")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val ea = ctx.freshName("ea"); val eb = ctx.freshName("eb")
      s"""
         |final int $n = $a.numElements();
         |final int $m = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $n && $j < $m) {
         |  $jt $ea = ${CodeGenerator.getValue(a, et, i)};
         |  $jt $eb = ${CodeGenerator.getValue(b, et, j)};
         |  int $cmp = ${ctx.genComp(et, ea, eb)};
         |  if ($cmp == 0) { $c++; $i++; $j++; }
         |  else if ($cmp < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
