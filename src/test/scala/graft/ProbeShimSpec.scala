package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** [[org.apache.spark.sql.GraftShim.checkpointFresh]]: the checkpointed
  * leaf must keep the origin plan's FINAL hash layout (plain
  * Dataset.checkpoint under AQE records UnknownPartitioning — every
  * connected-components round then re-exchanged the static edge list,
  * measured as one full edge-sized exchange per pointer-jump round on
  * q107's 34M-edge graph) while resetting inherited statistics.
  */
class ProbeShimSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("checkpointFresh preserves the final hash layout: a groupBy on the " +
      "repartition key plans NO exchange; rows and stats behave") {
    val df = (1 to 100).map(i => (i.toLong % 7, i.toLong)).toDF("src", "dst")
      .repartition(col("src"))
    val t = org.apache.spark.sql.GraftShim.checkpointFresh(df)
    // the leaf claims a hash layout on src (AQE coalescing may wrap it)
    val leafPart = t.queryExecution.analyzed.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.outputPartitioning
    }.get
    assert(leafPart.toString.contains("hashpartitioning(src"),
      s"checkpointed leaf must keep the hash layout: $leafPart")
    // consumer aggregate on the layout key: no Exchange in the plan
    val agg = t.groupBy("src").count()
    agg.collect()
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"groupBy on the preserved layout must not re-exchange:\n${plan.take(1200)}")
    // rows intact, and a key off the layout still exchanges (the claim is
    // specific, not a blanket no-shuffle flag)
    assert(agg.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      == (0 until 7).map(k => k.toLong -> (100 / 7 + (if (k >= 1 && k <= 100 % 7) 1 else 0)).toLong).toMap)
    val off = t.groupBy("dst").count()
    off.collect()
    assert(off.queryExecution.executedPlan.toString.contains("Exchange"),
      "grouping off the layout key must still exchange")
    // inherited stats are dropped: the leaf reports the session default,
    // not the origin plan's computed estimate
    assert(t.queryExecution.optimizedPlan.stats.sizeInBytes ==
      BigInt(spark.sessionState.conf.defaultSizeInBytes),
      "checkpointFresh must reset statistics to the session default")
  }
}
