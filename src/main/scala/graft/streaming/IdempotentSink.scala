package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Exactly-once parquet sink for `foreachBatch` pipelines.
  *
  * Structured Streaming's contract for `foreachBatch` is at-least-once: a
  * micro-batch that fails mid-write is REPLAYED with the same `batchId`
  * after restart, so a plain `append` duplicates every row the first
  * attempt already landed. The standard fix is to make the write
  * idempotent on `batchId`, which is what this sink does:
  *
  *  1. a replayed batch whose output directory already exists is SKIPPED
  *     (the previous attempt completed its rename — step 3);
  *  2. data is written to a scratch directory under the sink root
  *     (same filesystem → same-volume rename);
  *  3. the scratch dir is renamed to `batch=<id>` — one metadata
  *     operation, so readers never observe a half-written directory, and
  *     a crash before the rename leaves only scratch files that the next
  *     attempt overwrites.
  *
  * The layout doubles as a partition scheme: downstream batch reads of
  * `outDir` discover `batch` as a partition column and prune on it.
  * Failure-atomicity of the swap follows the same rename-check discipline
  * as [[graft.core.Layout.compact]] (a false return aborts loudly rather
  * than losing rows).
  */
object IdempotentSink {

  /** The `foreachBatch` function: `stream.writeStream.foreachBatch(writer(dir))`. */
  def writer(outDir: String): (DataFrame, Long) => Unit = (df, batchId) => {
    val spark = df.sparkSession
    val root = new Path(outDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(root, s"batch=$batchId")
    if (!fs.exists(dest)) {
      val scratch = new Path(root, s".inflight-$batchId")
      df.write.mode(SaveMode.Overwrite).parquet(scratch.toString)
      if (!fs.exists(root)) fs.mkdirs(root)
      if (!fs.rename(scratch, dest))
        throw new java.io.IOException(
          s"idempotent sink: rename $scratch -> $dest failed; " +
            "scratch left intact for inspection")
    }
    ()
  }
}
