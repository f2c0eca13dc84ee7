package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, LongType}

/** Native dot product over two `array<tinyint>` (int8-quantized embedding)
  * columns → long. Same rationale and shape as [[FloatVecDot]]: the
  * declarative `aggregate(zip_with(...))` form allocates and interprets a
  * lambda frame per PAIR, which dominates the O(|corpus|·|queries|) scoring
  * loop; this emits a tight primitive loop inside whole-stage codegen.
  *
  * All math is exact int64 (max |q| is 127, so a dot overflows only past
  * ~5·10^14 dimensions) — quantized scores are therefore bit-identical in
  * any engine, which is what lets the quantized ANN query carry a full
  * hash-gated oracle while the float paths need careful double-fold parity.
  *
  * Null semantics mirror [[FloatVecDot]]: null array → null; null elements
  * read as 0 (no per-element branch in the hot loop).
  */
case class Int8VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"int8_vec_dot expects array<tinyint>, got $l / $r")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var sum = 0L
    var i = 0
    while (i < n) {
      sum += x.getByte(i).toLong * y.getByte(i).toLong
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
         |long $sum = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $sum += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $sum;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Int8VecDot =
    copy(left = newLeft, right = newRight)
}

object Int8VecDot {

  /** Column-API form; registered via [[Sketches.registry]]. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("int8_vec_dot", a, b)

  /** Squared L2 norm of a quantized vector as self-dot (exact int64). */
  def norm2(a: Column): Column = dot(a, a)
}
