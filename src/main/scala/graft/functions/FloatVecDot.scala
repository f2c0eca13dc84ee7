package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns → double.
  *
  * Why a custom Catalyst expression (SURVEY §2.10 preference order (b)):
  * this is the measured hot path of every pair-similarity operator — the
  * declarative form `aggregate(zip_with(a, b, _*_), 0.0, _+_)` allocates an
  * intermediate array and a lambda frame per PAIR, which dominates all-pairs
  * joins (O(n²) invocations). This expression emits a tight primitive loop
  * via `doGenCode` — no allocation, no boxing — and stays inside
  * whole-stage codegen.
  *
  * Parity contract (must hold vs the DuckDB oracle's
  * `list_reduce(list_transform(...), (x,y) -> x+y)`): elements are cast
  * float→double individually and accumulated LEFT-TO-RIGHT in a double —
  * the exact operation sequence of the fold, hence bit-identical results.
  *
  * Null semantics: null array → null (BinaryExpression default). Null
  * ELEMENTS read as 0.0f (ArrayData primitive access), i.e. contribute 0 —
  * the declarative fold would instead null the whole sum. Embedding data
  * carries no null elements, so the two paths agree on real inputs; the
  * divergence is documented here rather than paid for with a per-element
  * branch in the hot loop.
  */
case class FloatVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"float_vec_dot expects array<float>, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0.0
    var i = 0
    while (i < n) {
      sum += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    sum
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {

  /** Column-API form. Requires [[register]] on the session first —
    * [[graft.core.GraftSession.tune]] does it, so every engine entry point
    * has it. (Spark 4 hides the classic Column↔Expression bridge as
    * `private[sql]`; the function registry is the supported door.)
    */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("float_vec_dot", a, b)

  /** Squared L2 norm as self-dot. */
  def norm2(a: Column): Column = dot(a, a)

  // session registration lives in Sketches.registry (single source for
  // both the programmatic and spark.sql.extensions surfaces)
}
