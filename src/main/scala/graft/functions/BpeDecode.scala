package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.text.Bpe

/** `bpe_decode(ids, merges)` → the original text — the inverse of
  * [[BpeEncode]]. Byte-level BPE is lossless (every token id expands to a
  * fixed byte string; ids 0–255 ARE the bytes), so
  * `bpe_decode(bpe_encode(t, m), m) = t` for any valid UTF-8 `t`.
  *
  * Exists chiefly as the engine-side half of the tokenizer's in-band
  * correctness proof (q86's `roundtrip_ok` gate: the oracle can't run BPE,
  * but it CAN demand the round trip hold on every document) and for
  * sequence-serving paths that materialize packed token windows back to
  * text. Same design constraints as [[BpeEncode]]: merges ride the plan as
  * a foldable `array<int>` literal, the model rebuilds lazily once per
  * executor, and codegen emits one virtual call per row.
  */
case class BpeDecode(ids: Expression, mergesFlat: Expression)
    extends BinaryExpression {

  override def left: Expression = ids
  override def right: Expression = mergesFlat

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    (ids.dataType, mergesFlat.dataType) match {
      case (ArrayType(IntegerType, false), ArrayType(IntegerType, false))
          if mergesFlat.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, false), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckFailure(
          "bpe_decode merges must be a literal (foldable) array<int> " +
            "without nulls")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_decode expects (array<int> without nulls, array<int>), got $l / $r")
    }

  @transient private lazy val model: Bpe.Model = {
    val arr = mergesFlat.eval(null).asInstanceOf[ArrayData]
    Bpe.Model.fromFlat(arr.toIntArray())
  }

  /** Row kernel, shared by eval and codegen. */
  def doDecode(a: ArrayData): UTF8String =
    UTF8String.fromString(model.decode(a.toIntArray()))

  override def nullSafeEval(i: Any, m: Any): Any =
    doDecode(i.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bpeDecode", this, classOf[BpeDecode].getName)
    nullSafeCodeGen(ctx, ev, (i, _) => s"${ev.value} = $self.doDecode($i);")
  }

  override def prettyName: String = "bpe_decode"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeDecode =
    copy(ids = newLeft, mergesFlat = newRight)
}
