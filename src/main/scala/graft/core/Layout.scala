package graft.core

import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._

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
      buckets: Int, sortCol: Option[String] = None): Unit =
    writeBucketedMulti(df, table, Seq(bucketCol), buckets, sortCol.toSeq)

  /** Multi-key form: bucket (and optionally sort) on a composite key, so a
    * recurring equi-join on ALL bucket columns plans with zero Exchange on
    * this side — e.g. the near-dup band ledger bucketed on (band, bkey).
    */
  def writeBucketedMulti(df: DataFrame, table: String,
      bucketCols: Seq[String], buckets: Int,
      sortCols: Seq[String] = Seq.empty): Unit = {
    require(bucketCols.nonEmpty, "writeBucketedMulti: need >= 1 bucket column")
    val w = df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.isEmpty) w else w.sortBy(sortCols.head, sortCols.tail: _*))
      .saveAsTable(table)
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

  /** Z-curve (Morton) interleave of two normalized non-negative ints:
    * bit i of `a` lands at position 2i+1, of `b` at 2i. Inputs must lie
    * in [0, 2^bits); pure bit-column math, codegen-friendly.
    *
    * Inputs are cast to long FIRST: `shiftleft` on an Int column wraps at
    * bit 31 (32-bit shift), so a direct caller passing ints with
    * bits ≥ 16 would get negative/unordered keys — the long cast makes
    * the interleave well-defined for any input width up to bits = 32.
    */
  def zOrderValue(a: Column, b: Column, bits: Int = 16): Column = {
    val (al, bl) = (a.cast("long"), b.cast("long"))
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_.bitwiseOR(_))
  }

  /** Multi-dimensional clustering: write `df` range-partitioned and
    * sorted by the Z-order value of TWO columns, so parquet row-group
    * min/max stats prune on EITHER dimension (a single-column sort prunes
    * only its own column; the scattered second dimension matches stats in
    * every row group). The Delta/Iceberg OPTIMIZE ZORDER primitive,
    * expressed as plain columns + repartitionByRange.
    *
    * Normalization is affine over the observed [min, max] (one 4-scalar
    * pre-pass — footer-cheap, bounded driver state). A skew-heavy 100 TB
    * column would instead normalize by rank over quantile cuts
    * ([[graft.functions.GraftFunctions.quantileDiscCuts]] broadcast) —
    * affine keeps the write single-pass and is exact for the pruning
    * argument as long as both columns are roughly uniformly spread.
    * Columns must be non-null numeric.
    */
  def writeZOrdered(df: DataFrame, dir: String, colA: String, colB: String,
      partitions: Int, bits: Int = 16): Unit = {
    val s = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val (loA, hiA, loB, hiB) =
      (s.getDouble(0), s.getDouble(1), s.getDouble(2), s.getDouble(3))
    val scale = ((1L << bits) - 1).toDouble
    def norm(c: String, lo: Double, hi: Double): Column =
      if (hi > lo)
        (((col(c).cast("double") - lit(lo)) / lit(hi - lo)) * lit(scale))
          .cast("long")
      else lit(0L)
    df.withColumn("__z",
        zOrderValue(norm(colA, loA, hiA), norm(colB, loB, hiB), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode(SaveMode.Overwrite).parquet(dir)
  }

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
