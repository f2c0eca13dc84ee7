package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** Argmax-cosine cell id of a float vector against a FOLDABLE centroid
  * table — the IVF assignment kernel, one output row per input vector.
  *
  * Why a custom Catalyst expression (SURVEY §2.10 preference order (b)):
  * the declarative assignment — `join(broadcast(centroids), lit(true))`
  * followed by a `max_by` group-by — MATERIALIZES n×nCells wide rows
  * (the embedding array duplicated per candidate cell) through a hash
  * aggregate: ~90M rows at a 100× tier with √n cells, measured 361 s and
  * ~quadratic (`similarity/Ann.scala` q66 history). The assignment is a
  * per-row pure function of the vector and a small constant table, so it
  * belongs in ONE expression: O(nCells·dim) flops per row, zero extra
  * rows, zero shuffle, inside whole-stage codegen (the
  * [[FloatVecDot]]/[[Int8VecDot]] pattern).
  *
  * Parity contract with the max_by formulation it replaces (spec-pinned
  * bit-identical in SimilaritySpec): per cell,
  * `sim = dot(v, cvec) / (sqrt(norm2(v)) * sqrt(norm2(cvec)))` with every
  * product/sum accumulated left-to-right in double exactly like
  * [[FloatVecDot]]; the winner is the MAX of (sim, cell) in Spark's total
  * order for doubles (NaN greatest, so an all-NaN row — a zero vector —
  * resolves to the highest cell id, like `max_by(cell, struct(sim, cell))`
  * did). Cells are scanned in ascending id order with a >=-replace, which
  * realizes exactly that lexicographic max.
  *
  * `cells` (array<int>) and `centroids` (array<array<float>>) must be
  * foldable (literals) — the table is decoded and its norms precomputed
  * ONCE per operator, not per row. Null vector → null (TernaryExpression
  * default); null table entries are rejected by the foldable decode.
  */
case class IvfArgmaxCell(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(IntegerType, _),
          ArrayType(ArrayType(FloatType, _), _)) =>
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            "ivf_argmax_cell expects literal cell/centroid tables")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure(
            "ivf_argmax_cell cell/centroid tables must not be null")
        else TypeCheckResult.TypeCheckSuccess
      case (v, c, m) => TypeCheckResult.TypeCheckFailure(
        "ivf_argmax_cell expects (array<float>, array<int>, " +
          s"array<array<float>>), got $v / $c / $m")
    }

  // ascending cell order (decodeTable sorts) makes the >=-replace scan
  // the lexicographic max of (sim, cell) — the max_by tie-break this
  // kernel must match
  @transient private lazy val table: IvfArgmaxCell.Table =
    IvfArgmaxCell.decodeTable(second, third)

  override def nullSafeEval(v: Any, c: Any, m: Any): Any =
    IvfArgmaxCell.compute(v.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tbl = ctx.addReferenceObj("ivfTable", table,
      classOf[IvfArgmaxCell.Table].getName)
    nullSafeCodeGen(ctx, ev, (v, _, _) =>
      s"${ev.value} = graft.functions.IvfArgmaxCell.compute($v, $tbl);")
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): IvfArgmaxCell = copy(first = f, second = s, third = t)
}

object IvfArgmaxCell {

  /** Decoded centroid table, sorted ascending by cell id; `norms(i)` =
    * sqrt of the left-fold double self-dot of `vecs(i)`.
    */
  final case class Table(cells: Array[Int], vecs: Array[Array[Float]],
      norms: Array[Double])

  /** Decode foldable (cells, centroids) children into a [[Table]] —
    * shared by [[IvfArgmaxCell]] and [[IvfProbeCells]].
    */
  private[functions] def decodeTable(cells: Expression,
      matrix: Expression): Table = {
    val cellsArr = cells.eval().asInstanceOf[ArrayData].toIntArray()
    val matData = matrix.eval().asInstanceOf[ArrayData]
    require(matData.numElements() == cellsArr.length && cellsArr.length > 0,
      s"ivf centroid table: ${cellsArr.length} cells vs " +
        s"${matData.numElements()} centroids")
    val vecs = Array.tabulate(matData.numElements()) { i =>
      val a = matData.getArray(i)
      require(a != null, s"ivf centroid table: null centroid at index $i")
      a.toFloatArray()
    }
    val order = cellsArr.indices.sortBy(cellsArr)
    Table(
      order.map(cellsArr).toArray,
      order.map(vecs).toArray,
      order.map { i =>
        val v = vecs(i)
        var s = 0.0
        var k = 0
        while (k < v.length) {
          val x = v(k).toDouble
          s += x * x
          k += 1
        }
        math.sqrt(s)
      }.toArray)
  }

  /** The per-row kernel — static so generated code JITs one tight loop.
    * Accumulation order and the (sim, cell) total-order compare are the
    * parity contract (see class doc).
    */
  def compute(v: ArrayData, t: Table): Int = {
    val n = v.numElements()
    var vn2 = 0.0
    var i = 0
    while (i < n) {
      val x = v.getFloat(i).toDouble
      vn2 += x * x
      i += 1
    }
    val sv = math.sqrt(vn2)
    var bestCell = t.cells(0)
    var bestSim = simTo(v, n, sv, t, 0)
    var c = 1
    while (c < t.vecs.length) {
      val s = simTo(v, n, sv, t, c)
      // java.lang.Double.compare is Spark's double total order (NaN
      // greatest, -0.0 < 0.0); >= keeps the later (higher) cell on ties
      if (java.lang.Double.compare(s, bestSim) >= 0) {
        bestSim = s
        bestCell = t.cells(c)
      }
      c += 1
    }
    bestCell
  }

  private def simTo(v: ArrayData, n: Int, sv: Double, t: Table,
      c: Int): Double = {
    val cv = t.vecs(c)
    val m = math.min(n, cv.length)
    var dot = 0.0
    var k = 0
    while (k < m) {
      dot += v.getFloat(k).toDouble * cv(k).toDouble
      k += 1
    }
    dot / (sv * t.norms(c))
  }
}
