package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe

/** `bpe_encode(text, merges)` → `array<int>` of byte-level BPE token ids.
  *
  * Why a custom Catalyst expression (SURVEY §2.10 preference order (b)):
  * tokenization is per-row imperative string work with a learned lookup
  * table — inexpressible in built-in column functions — and it sits on the
  * token-accounting hot path (packing, mixing, budget queries), where a
  * Scala UDF's per-row encoder/decoder round trip is the measured trap the
  * other native expressions in this package exist to avoid. Codegen emits
  * one virtual call into [[doEncode]] per row; the merge loop itself is
  * primitive-array JVM code with a per-thread word memo
  * ([[graft.text.Bpe.Model.encodeWord]]).
  *
  * The merges table rides the plan as a FOLDABLE `array<int>` literal
  * (`[a0,b0,a1,b1,…]`) rather than a captured object so the expression
  * survives the function-registry door (Spark 4 hides the classic
  * Column↔Expression bridge); the model is rebuilt lazily once per
  * executor from the literal.
  */
case class BpeEncode(text: Expression, mergesFlat: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = mergesFlat

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, mergesFlat.dataType) match {
      case (StringType, ArrayType(IntegerType, false)) if mergesFlat.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, ArrayType(IntegerType, true)) =>
        // a null merge id would NPE at model build, deep inside codegen —
        // refuse at analysis time instead
        TypeCheckResult.TypeCheckFailure(
          "bpe_encode merges must not contain null elements")
      case (StringType, ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_encode merges must be a literal (foldable) array<int>")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode expects (string, array<int>), got $l / $r")
    }

  @transient private lazy val model: Bpe.Model = {
    val arr = mergesFlat.eval(null).asInstanceOf[ArrayData]
    Bpe.Model.fromFlat(arr.toIntArray())
  }

  /** Row kernel, shared by eval and codegen. */
  def doEncode(u: UTF8String): ArrayData =
    new GenericArrayData(model.encode(u.toString))

  override def nullSafeEval(t: Any, m: Any): Any =
    doEncode(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeEncode", this, classOf[BpeEncode].getName)
    nullSafeCodeGen(ctx, ev, (t, _) => s"${ev.value} = $self.doEncode($t);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncode =
    copy(text = newLeft, mergesFlat = newRight)
}
