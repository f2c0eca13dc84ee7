package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.RepartitionOperation

import graft.core.Tables

/** The ParallelizePairJoins optimizer rule: fires on tiny non-equi joins,
  * defers to explicit layout, and never touches equi-joins.
  */
class PairJoinRuleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir

  private def repartitions(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: RepartitionOperation => r
    }.size

  test("tiny pair join gets a round-robin repartition on the stream side") {
    val e = Tables.embeddings(spark, dir)
    val l = e.select(col("vec_id").as("id_a"))
    val r = e.select(col("vec_id").as("id_b"))
    val pair = l.join(r, col("id_a") < col("id_b"))
    assert(repartitions(pair) == 1, pair.queryExecution.optimizedPlan.toString)
    // and the repartition survives to execution as a round-robin exchange
    val phys = pair.queryExecution.executedPlan.toString
    assert(phys.contains("Exchange RoundRobinPartitioning"), phys.take(1500))
  }

  test("explicit repartition wins — the rule does not stack a second one") {
    val e = Tables.embeddings(spark, dir)
    val l = e.select(col("vec_id").as("id_a")).repartition(8)
    val r = e.select(col("vec_id").as("id_b"))
    val pair = l.join(r, col("id_a") < col("id_b"))
    assert(repartitions(pair) == 1,
      s"author layout must be respected:\n${pair.queryExecution.optimizedPlan}")
  }

  test("equi-joins are left alone (hash shuffle already parallelizes)") {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val j = o.join(c, o("o_custkey") === c("c_custkey"))
    assert(repartitions(j) == 0, j.queryExecution.optimizedPlan.toString)
  }

  test("mixed equi+inequality conditions count as equi (no repartition)") {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val j = o.join(c, o("o_custkey") === c("c_custkey") && o("o_totalprice") > c("c_acctbal"))
    assert(repartitions(j) == 0, j.queryExecution.optimizedPlan.toString)
  }
}
