package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Physical-layout utilities — the storage-side half of the scale plan.
  *
  * Bucketing pre-shuffles a table ONCE at write time: both sides of a
  * recurring equi-join written with the same bucket count and key join
  * shuffle-free forever after (Catalyst sees compatible output
  * partitioning and plans SortMergeJoin with zero Exchange). At 100 TB
  * this converts the dominant per-query cost (repeated fact-table
  * shuffles) into a one-time write cost — the standard warehouse layout
  * for fact-to-fact joins. Verified in PlanSpec: a join of two co-bucketed
  * tables plans without a shuffle.
  */
object Layout {

  /** Write `df` as a bucketed managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      buckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }
}
