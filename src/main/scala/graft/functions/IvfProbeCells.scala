package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The `nProbe` nearest-centroid cell ids of a float vector, in rank
  * order — the IVF probe-selection kernel, one `array<int>` out per
  * query vector.
  *
  * Replaces the declarative probe ranking in `Ann.searchIvf` — a
  * `join(broadcast(centroids), lit(true))` + per-query `row_number`
  * window — which materializes |queries|×nCells wide rows and SORTS each
  * query's candidate list just to keep its top nProbe. With √n cells the
  * probe stage alone was Θ(|queries|·√n) rows through an exchange +
  * sort; this kernel keeps a bounded nProbe-entry selection list per row
  * inside whole-stage codegen, exactly the [[IvfArgmaxCell]] treatment
  * of the assignment stage.
  *
  * Parity contract with the window it replaces (spec-pinned):
  * rank order is `row_number() OVER (ORDER BY psim DESC, cell ASC)`,
  * where `psim = dot(v, cvec) / (sqrt(norm2(v)) * sqrt(norm2(cvec)))`
  * in left-fold double arithmetic ([[FloatVecDot]] semantics), NaN
  * greatest (Spark's double total order). The ascending-cell scan with
  * STRICT-greater insertion realizes exactly that stable ranking.
  *
  * `cells`/`centroids` must be foldable literals (decoded once per
  * operator); `nProbe` is a construction-time parameter. Null vector →
  * null.
  */
case class IvfProbeCells(first: Expression, second: Expression,
    third: Expression, nProbe: Int) extends TernaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _),
          ArrayType(ArrayType(FloatType, _), _)) =>
        if (nProbe <= 0)
          TypeCheckResult.TypeCheckFailure(
            s"ivf_probe_cells needs nProbe > 0, got $nProbe")
        else if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "ivf_probe_cells expects literal cell/centroid tables")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "ivf_probe_cells cell/centroid tables must not be null")
        else TypeCheckResult.TypeCheckSuccess
      case (v, c, m) => TypeCheckResult.TypeCheckFailure(
        "ivf_probe_cells expects (array<float>, array<int>, " +
          s"array<array<float>>), got $v / $c / $m")
    }

  @transient private lazy val table: IvfArgmaxCell.Table =
    IvfArgmaxCell.decodeTable(second, third)

  override def nullSafeEval(v: Any, c: Any, m: Any): Any =
    IvfProbeCells.compute(v.asInstanceOf[ArrayData], table, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("ivfTable", table,
      classOf[IvfArgmaxCell.Table].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.IvfProbeCells.compute($v, $tbl, $nProbe);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IvfProbeCells = copy(first = f, second = s, third = t)
}

object IvfProbeCells {

  /** Bounded insertion selection: scan cells ascending, keep the best
    * `nProbe` by (sim desc, cell asc). Strict-greater insertion keeps
    * earlier (lower) cells ahead on sim ties — the row_number stable
    * order. O(nCells · nProbe) worst case with nProbe small (typ. ≤ 8).
    */
  def compute(v: ArrayData, t: IvfArgmaxCell.Table, nProbe: Int): ArrayData = {
    val n = v.numElements()
    var vn2 = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      vn2 += x * x
      i += 1
    }
    val sv = math.sqrt(vn2)
    val k = math.min(nProbe, t.vecs.length)
    val simTop = new Array[Double](k)
    val cellTop = new Array[Int](k)
    var filled = 0
    var c = 0
    while (c < t.vecs.length) {
      val cv = t.vecs(c)
      val m = math.min(n, cv.length)
      var dot = 0.0
      var j = 0
      while (j < m) {
        dot += v.getFloat(j).toDouble * cv(j).toDouble
        j += 1
      }
      val s = dot / (sv * t.norms(c))
      // insertion position: strictly better than the entry it displaces
      // (ties keep the incumbent — lower cell id, scanned earlier)
      if (filled < k || java.lang.Double.compare(s, simTop(filled - 1)) > 0) {
        var p = if (filled < k) filled else k - 1
        while (p > 0 && java.lang.Double.compare(s, simTop(p - 1)) > 0) {
          simTop(p) = simTop(p - 1)
          cellTop(p) = cellTop(p - 1)
          p -= 1
        }
        simTop(p) = s
        cellTop(p) = t.cells(c)
        if (filled < k) filled += 1
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(cellTop, filled))
  }
}
