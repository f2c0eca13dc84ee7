package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{FloatVecDot, MinHashSig, ShingleSet, SimHash64, Sketches, SortedIntersectCount}

/** Spark-submit integration point: registers the engine's native
  * expressions at session build time, so a cluster deployment needs only
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session (including SQL-only clients over Thrift/Connect) sees
  * `float_vec_dot`, `minhash_sig`, `minhash_tokens`, `simhash64`,
  * `sorted_intersect_count`, `shingle_set`. Programmatic entry points get
  * the same registrations through [[graft.core.GraftSession.tune]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("float_vec_dot"),
      info("float_vec_dot", "_FUNC_(a, b) - double dot product of two float vectors"),
      (exprs: Seq[Expression]) => {
        val e = Sketches.arity("float_vec_dot", 2)(exprs)
        FloatVecDot(e.head, e(1))
      }))
    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "_FUNC_(shingles) - 32-long minhash signature"),
      (exprs: Seq[Expression]) => MinHashSig(Sketches.arity("minhash_sig", 1)(exprs).head)))
    ext.injectFunction((FunctionIdentifier("minhash_tokens"),
      info("minhash_tokens", "_FUNC_(tokens) - minhash over in-loop 3-gram shingles"),
      (exprs: Seq[Expression]) =>
        MinHashSig(Sketches.arity("minhash_tokens", 1)(exprs).head, shingleN = 3)))
    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "_FUNC_(tokens) - 64-bit simhash"),
      (exprs: Seq[Expression]) => SimHash64(Sketches.arity("simhash64", 1)(exprs).head)))
    ext.injectFunction((FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "_FUNC_(a, b) - merge-scan intersection count"),
      (exprs: Seq[Expression]) => {
        val e = Sketches.arity("sorted_intersect_count", 2)(exprs)
        SortedIntersectCount(e.head, e(1))
      }))
    ext.injectFunction((FunctionIdentifier("shingle_set"),
      info("shingle_set", "_FUNC_(tokens) - sorted distinct hashed 3-gram shingles"),
      (exprs: Seq[Expression]) => ShingleSet(Sketches.arity("shingle_set", 1)(exprs).head)))
  }
}
