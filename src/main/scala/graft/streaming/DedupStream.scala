package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.dedup.Dedup

/** Streaming exact dedup: a `foreachBatch` pipeline that admits each
  * micro-batch's first-seen documents and drops everything already seen —
  * in the batch or in ANY previous batch — with exactly-once output.
  *
  * This is the streaming form of [[graft.dedup.Dedup.exactIncremental]]
  * (q100): the "already seen" state is NOT a Spark state store but a
  * persisted FINGERPRINT LEDGER on the sink filesystem, one
  * `batch=<id>` directory of admitted fingerprints per micro-batch,
  * committed through [[IdempotentSink]]'s marker protocol. A state-store
  * design (`dropDuplicates` / flatMapGroupsWithState keyed on
  * fingerprint) holds every fingerprint ever seen in executor state —
  * unbounded growth that checkpoints in full every batch and cannot be
  * compacted, inspected, or shared; the ledger is plain bucketable
  * parquet whose per-batch cost is one batch-side shuffle plus an
  * anti-join that a bloom/bucket layout prunes
  * ([[graft.core.Layout]]-style maintenance applies: periodically
  * compact old `batch=` dirs into one bucketed-by-`fp` segment and the
  * anti-join's ledger exchange disappears).
  *
  * Exactly-once across crash/replay, with NO cross-write transaction
  * (the sink and ledger commit independently):
  *
  *  1. survivors are computed against the COMMITTED ledger only
  *     ([[IdempotentSink.readCommitted]]) — a half-written ledger batch
  *     is invisible, so the computation is a pure function of (batch
  *     data, committed history) and every replay of a `batchId` derives
  *     the identical survivor set;
  *  2. survivors commit FIRST, the ledger LAST. A crash between the two
  *     replays into: survivors marker present → data write skipped;
  *     ledger marker absent → ledger batch rebuilt from the identical
  *     recomputed set. The opposite order would be a data-loss bug: a
  *     committed ledger without its survivors makes the replay see its
  *     own fingerprints as "already seen" and admit nothing.
  *
  * Reference shape: tfl-realtime-lakehouse re-snapshots and re-dedupes
  * whole tables per DAG run (`airflow/dags/tfl_transform_dag.py`); this
  * operator is the incremental form whose per-batch work scales with the
  * batch, not the corpus — the only viable shape at 100 TB ingest.
  */
object DedupStream {

  /** The committed ledger's fingerprints; an empty-but-typed frame before
    * the first commit (the sink owns the schema — there is nothing
    * trustworthy to infer it from, see [[IdempotentSink.readCommitted]]).
    */
  def ledgerFps(spark: SparkSession, ledgerDir: String): DataFrame = {
    val committed = IdempotentSink.readCommitted(spark, ledgerDir)
    if (committed.columns.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("fp", StringType))))
    else committed.select("fp")
  }

  /** The `foreachBatch` function:
    * `stream.writeStream.foreachBatch(DedupStream.writer(out, ledger, "text", "doc_id"))`.
    *
    * Emits one row per admitted fingerprint — (fp, keep_id, n_dups), the
    * [[graft.dedup.Dedup.exact]] survivor contract — under
    * `survivorsDir/batch=<id>`, and the admitted fingerprints under
    * `ledgerDir/batch=<id>`.
    */
  def writer(survivorsDir: String, ledgerDir: String, textCol: String,
      idCol: String): (DataFrame, Long) => Unit = (batch, batchId) => {
    val spark = batch.sparkSession
    val survivors = Dedup.exactIncremental(
      batch, textCol, idCol, ledgerFps(spark, ledgerDir)).persist()
    // both writes action the same plan; the cache keeps the dedup +
    // anti-join from running twice (and pins one consistent result even
    // if it were nondeterministic — it is not, but cheap insurance)
    try {
      IdempotentSink.writer(survivorsDir)(survivors, batchId)
      IdempotentSink.writer(ledgerDir)(survivors.select("fp"), batchId)
    } finally survivors.unpersist()
    ()
  }
}
