package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All `nTables` banded sign-projection bucket keys of a float vector
  * against a FOLDABLE plane matrix, in one pass — the LSH analog of
  * [[IvfArgmaxCell]]/[[IvfProbeCells]], one `array<long>` out per vector.
  *
  * Why a kernel (SURVEY §2.10 preference order (b)): the declarative
  * form — `nTables·bits` separate `when(float_vec_dot(v, planeLit) >= 0,
  * 2^i)` branches summed per table — expands to ~60 independent dot
  * expressions per row; at that operator width the generated code blows
  * past whole-stage-codegen/JIT thresholds and the stage drops to
  * interpreted eval, costing one boxed 64-float fold per plane per row
  * (measured: computing just the key columns for a 200k-vector corpus
  * took 68 s of a 51 s q41 wall at the 100× tier — the key stage WAS the
  * query). This expression is one tight O(nPlanes·dim) loop per row
  * inside codegen.
  *
  * Parity contract with the declarative form it replaces (spec-pinned
  * bit-identical): bit i of table t is `dot(v, plane[t·bits+i]) >= 0`
  * with [[FloatVecDot]]'s left-to-right double accumulation over
  * `min(|v|, |plane|)` elements, and key_t = `t·2^bits + Σ bit_i·2^i` —
  * so q41/q35's DuckDB oracles (which restate exactly that arithmetic)
  * gate this kernel unchanged.
  *
  * `planes` must be a foldable literal (decoded once per operator, like
  * the IVF centroid tables); `bits` is a construction-time parameter and
  * `nTables = planes.length / bits` (enforced exact). Null vector → null.
  */
case class LshBandKeys(first: Expression, second: Expression, bits: Int)
    extends BinaryExpression {

  override def left: Expression = first
  override def right: Expression = second

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(ArrayType(FloatType, _), _)) =>
        if (bits < 1 || bits > 62)
          TypeCheckResult.TypeCheckFailure(
            s"lsh_band_keys needs 1 <= bits <= 62, got $bits")
        else if (!second.foldable)
          TypeCheckResult.TypeCheckFailure(
            "lsh_band_keys expects a literal plane matrix")
        else if (second.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "lsh_band_keys plane matrix must not be null")
        else {
          val n = second.eval().asInstanceOf[ArrayData].numElements()
          if (n == 0 || n % bits != 0)
            TypeCheckResult.TypeCheckFailure(
              s"lsh_band_keys: $n planes do not band evenly into $bits-bit tables")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (v, m) => TypeCheckResult.TypeCheckFailure(
        s"lsh_band_keys expects (array<float>, array<array<float>>), got $v / $m")
    }

  @transient private lazy val planes: Array[Array[Float]] = {
    val matData = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(matData.numElements()) { i =>
      val a = matData.getArray(i)
      require(a != null, s"lsh_band_keys: null plane at index $i")
      a.toFloatArray()
    }
  }

  override def nullSafeEval(v: Any, m: Any): Any =
    LshBandKeys.compute(v.asInstanceOf[ArrayData], planes, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // getCanonicalName, NOT getName: the class name becomes a Java-source
    // cast in the generated code, and an array's getName ("[[F") is not
    // valid source — Janino would fail and the stage would silently fall
    // back to interpreted eval, the exact regression this kernel removes
    val mat = ctx.addReferenceObj("lshPlanes", planes,
      classOf[Array[Array[Float]]].getCanonicalName)
    nullSafeCodeGen(ctx, ev, (v, _) =>
      s"${ev.value} = graft.functions.LshBandKeys.compute($v, $mat, $bits);")
  }

  override protected def withNewChildrenInternal(f: Expression,
      s: Expression): LshBandKeys = copy(first = f, second = s)
}

object LshBandKeys {

  /** The per-row kernel — static so generated code JITs one tight loop.
    * Accumulation order per plane is the [[FloatVecDot]] contract.
    */
  def compute(v: ArrayData, planes: Array[Array[Float]], bits: Int): ArrayData = {
    val nT = planes.length / bits
    val out = new Array[Long](nT)
    var t = 0
    while (t < nT) {
      var key = t.toLong * (1L << bits)
      var i = 0
      while (i < bits) {
        val p = planes(t * bits + i)
        val m = math.min(v.numElements(), p.length)
        var dot = 0.0
        var j = 0
        while (j < m) {
          dot += v.getFloat(j).toDouble * p(j).toDouble
          j += 1
        }
        if (dot >= 0) key += (1L << i)
        i += 1
      }
      out(t) = key
      t += 1
    }
    new GenericArrayData(out)
  }
}
