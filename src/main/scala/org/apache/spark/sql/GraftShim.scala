package org.apache.spark.sql

import org.apache.spark.sql.types.StructType

/** One `private[sql]` bridge the engine needs from Spark's internals.
  *
  * `Dataset.checkpoint()` builds its `LogicalRDD` leaf via
  * `rewriteStatsAndConstraints`, which copies the ORIGIN plan's computed
  * statistics onto the new leaf. For an iterative algorithm whose round
  * contains a self-join (connected components' pointer jump), the
  * inherited `sizeInBytes` therefore SQUARES every round — the BigInt
  * doubles in bit length per iteration, and by round ~14 the driver spends
  * minutes in Toom-Cook multiplication inside
  * `SizeInBytesOnlyStatsPlanVisitor` (measured: 800 s of driver CPU on a
  * 50 k-row graph). Re-wrapping the checkpointed rows in a FRESH
  * `LogicalRDD` (what `internalCreateDataFrame` does) resets the leaf to
  * default statistics, which is also more truthful: post-checkpoint, the
  * origin plan's estimate carries no information the materialized RDD
  * doesn't have.
  */
object GraftShim {

  /** Rebuild `df` as a bare scan of its (already materialized) internal
    * rows, dropping inherited statistics and constraints. The RDD is NOT
    * recomputed — `toRdd` of a checkpointed frame is the checkpoint-backed
    * RDD itself.
    */
  def resetStats(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, StructType(df.schema.fields))
  }
}
