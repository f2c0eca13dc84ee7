package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Sketches

/** Spark-submit integration point: registers the engine's native
  * expressions at session build time, so a cluster deployment needs only
  *
  * {{{ --conf spark.sql.extensions=graft.GraftExtensions }}}
  *
  * and every session (including SQL-only clients over Thrift/Connect) sees
  * the same function surface programmatic sessions get through
  * [[graft.core.GraftSession.tune]]. Both registrars consume
  * [[Sketches.registry]], so the surfaces cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    Sketches.registry.foreach { case (name, usage, n, build) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in"),
        (exprs: Seq[Expression]) => build(Sketches.arity(name, n)(exprs))))
    }
    // §2.10(c) mechanism: optimizer rule injection — the pair-join
    // parallelism safety net rides into SQL-only deployments too
    ext.injectOptimizerRule(_ => graft.plans.ParallelizePairJoins)
  }
}
