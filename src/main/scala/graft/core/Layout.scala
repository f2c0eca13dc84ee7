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

  /** Range-sorted layout: global range partition + in-partition sort on
    * `sortCol`, so each output file (and each parquet row group inside it)
    * covers a narrow, disjoint slice of the sort key. Selective predicates
    * on that key then skip whole row groups via parquet min/max stats —
    * the poor man's z-order, and at 100 TB the difference between a
    * point-ish query scanning everything and scanning one file. Verified
    * by scan output-row metrics in PlanSpec (sorted layout emits a
    * fraction of the shuffled layout's rows for the same filter).
    */
  def writeRangeSorted(df: DataFrame, dir: String, sortCol: String,
      partitions: Int): Unit =
    df.repartitionByRange(partitions, org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(dir)

  /** Compact a small-file parquet directory into ~`targetBytes` files.
    *
    * The raw zone appends one file per ingest poll (the reference's
    * 2-minute cadence → ~720 files/day/partition): every downstream scan
    * then pays per-file open/footer costs and schedules thousands of
    * sliver tasks. Compaction rewrites to
    * `ceil(inputBytes / targetBytes)` files via a round-robin shuffle
    * (even output sizes regardless of input skew), staged to a temp dir
    * first. A crash during the write leaves the source untouched; a crash
    * during the swap never destroys rows — they live in the temp dir until
    * its final delete, so recovery is finishing the renames. True atomic
    * swap needs a table format's manifest (Delta/Iceberg), out of scope
    * for a directory-of-parquet zone.
    *
    * Scale note: at 100 TB this runs per partition directory (date=...),
    * parallel across partitions, never globally.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L * 1024 * 1024): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(path).filter(_.getPath.getName.endsWith(".parquet"))
    if (files.isEmpty) return 0L // nothing to compact (also: never read an empty glob)
    val inputBytes = files.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(inputBytes.toDouble / targetBytes).toInt)
    val tmp = new org.apache.hadoop.fs.Path(dir + "__compact_tmp")
    // read EXACTLY the snapshotted file list, not the directory: on a live
    // zone a file ingested between listStatus and the read would otherwise
    // be compacted into the output yet survive the delete loop — its rows
    // duplicated. Pinning the list makes concurrent appends simply invisible
    // to this compaction run.
    spark.read.parquet(files.map(_.getPath.toString).toIndexedSeq: _*)
      .repartition(nOut)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    files.foreach(f => fs.delete(f.getPath, false))
    fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      .zipWithIndex.foreach { case (f, i) =>
        val dest = new org.apache.hadoop.fs.Path(path, f"part-compact-$i%05d.parquet")
        // rename signals failure by RETURNING false (e.g. dest already exists
        // from an interrupted run), not only by throwing — deleting tmp after
        // a false would destroy the only copy of those rows.
        if (!fs.rename(f.getPath, dest))
          throw new java.io.IOException(
            s"compact: rename ${f.getPath} -> $dest failed; " +
              s"temp dir $tmp left intact for recovery")
      }
    fs.delete(tmp, true)
    nOut.toLong
  }
}
