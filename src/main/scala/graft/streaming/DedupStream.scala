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

  private val FpSchema = StructType(Seq(StructField("fp", StringType)))

  /** The committed ledger's fingerprints: the fp-bucketed compacted table
    * (if [[compactLedger]] has run) unioned with every `batch=` dir
    * committed since; an empty-but-typed frame before the first commit
    * (the sink owns the schema — see [[IdempotentSink.readCommitted]]).
    * Once all batches are compacted the read is the bucketed table ALONE,
    * so the incremental-dedup anti-join's ledger side plans with zero
    * Exchange (spec-pinned in StreamingDedupSpec).
    *
    * Read ordering vs a completing compaction: the marker is resolved
    * FIRST, and only batch dirs STRICTLY NEWER than the marked generation
    * are then listed and read — every id ≤ the generation is already in
    * the table (absorbed, or a replayed rewrite of an absorbed batch), so
    * a compactor deleting those dirs after our marker read cannot fail or
    * skew this read. The one remaining window — a SECOND compaction
    * completing and deleting `(v, v']` dirs between our listing and the
    * parquet read — is excluded by contract, not code: compaction is a
    * maintenance job run by the ledger's single writer between
    * micro-batches (see [[compactLedger]]), never concurrently with the
    * stream that reads this.
    */
  def ledgerFps(spark: SparkSession, ledgerDir: String): DataFrame =
    currentCompaction(spark, ledgerDir) match {
      case None =>
        IdempotentSink.readCommitted(spark, ledgerDir, Some(FpSchema))
          .select("fp")
      case Some((version, table)) =>
        val compacted = spark.table(table).select("fp")
        val fresh = IdempotentSink.committedBatches(spark, ledgerDir)
          .filter(_ > version)
        if (fresh.isEmpty)
          compacted // preserve the bucketed partitioning — no union node
        else compacted.unionByName(
          spark.read.option("basePath", ledgerDir)
            .parquet(fresh.map(id => s"$ledgerDir/batch=$id"): _*)
            .select("fp"))
    }

  // --- ledger compaction ----------------------------------------------------

  private val CompactedPrefix = "_compactedtable-"

  /** Delete a table's DEFAULT warehouse directory if it exists without a
    * catalog entry — the orphan a crash leaves when the JVM dies after
    * `saveAsTable` but before its marker, and a restart's non-durable
    * metastore has forgotten the table (so `DROP TABLE IF EXISTS` no-ops
    * while the location blocks every re-create with
    * LOCATION_ALREADY_EXISTS). Resolved through the catalog so the
    * current database's `<db>.db/<table>` path is honored.
    */
  private def deleteDefaultLocation(spark: SparkSession, table: String): Unit = {
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table.toLowerCase)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** The current compaction generation: (version, metastore table name),
    * read from the HIGHEST-versioned `_compactedtable-<v>` marker. Marker
    * files are tiny (they hold the table name) and written via
    * tmp + rename, so a reader never sees a half-written name; `_`-prefixed
    * names keep them out of Spark's file listings like the batch markers.
    */
  def currentCompaction(spark: SparkSession,
      ledgerDir: String): Option[(Long, String)] = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(CompactedPrefix))
      .map(p => p.getName.stripPrefix(CompactedPrefix).toLong -> p)
      .sortBy(_._1).lastOption
      .map { case (v, p) =>
        val in = fs.open(p)
        val name = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        (v, name)
      }
  }

  /** Compact every committed `batch=` dir (plus any previous compaction)
    * into ONE fp-bucketed metastore table — the ledger maintenance job the
    * scale story depends on: an anti-join against years of per-batch
    * slivers pays per-file opens and a full ledger exchange every
    * micro-batch, while the bucketed table arrives pre-partitioned on
    * `fp` and joins with zero Exchange on the ledger side.
    *
    * Crash-safe by the same marker discipline as the sink — at every
    * kill point the READ ([[ledgerFps]]) stays complete and correct:
    *
    *  1. the union (previous compacted table + committed batch fps) is
    *     written to a NEW versioned table `…_v<maxBatchId>` — readers
    *     still resolve the old marker;
    *  2. the new `_compactedtable-<v>` marker is renamed into place
    *     (tmp + rename, atomic on the sink's filesystem) — readers now
    *     resolve the new table; fps are temporarily duplicated between
    *     the table and the not-yet-deleted batch dirs, which dedup
    *     semantics tolerate (the anti-join ignores duplicate rows);
    *  3. older compaction markers + their tables are dropped, then each
    *     compacted batch's MARKER then its dir (marker-first: a dir
    *     without a marker is invisible to committed reads).
    *
    * A batch REPLAYED by the stream after its dirs were compacted away
    * (restart from an old checkpoint) recomputes the identical survivor
    * set — its fps are still in the ledger via the table, and the
    * computation is a pure function of (batch, committed fps) — and
    * rewrites its ledger dir: harmless duplication until the next
    * compaction sweeps it. Single concurrent compactor per ledger, like
    * [[graft.similarity.Ann.writeIvfIndex]]'s single-writer contract —
    * and compaction must not run CONCURRENTLY with the stream's
    * micro-batches either: [[ledgerFps]] reads marker-then-dirs in two
    * steps, so run this between batches (e.g. from the stream's own
    * `foreachBatch` cadence check, or with the query stopped).
    *
    * Returns the active compacted table name, or None when the ledger has
    * never committed anything.
    */
  def compactLedger(spark: SparkSession, ledgerDir: String,
      buckets: Int = 8): Option[String] = {
    val root = new org.apache.hadoop.fs.Path(ledgerDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ids = IdempotentSink.committedBatches(spark, ledgerDir)
    val current = currentCompaction(spark, ledgerDir)
    if (ids.isEmpty) return current.map(_._2)

    val version = math.max(ids.max, current.map(_._1 + 1).getOrElse(0L))
    val marker = new org.apache.hadoop.fs.Path(root, s"$CompactedPrefix$version")
    if (!fs.exists(marker)) {
      // deterministic per-ledger table family; the dir hash keys the
      // family so two ledgers in one warehouse never collide
      val digest = java.security.MessageDigest.getInstance("MD5")
        .digest(ledgerDir.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(12)
      val table = s"graft_ledger_${digest}_v$version"
      val batchFps = IdempotentSink
        .readCommitted(spark, ledgerDir, Some(FpSchema)).select("fp")
      val all = current
        .map { case (_, t) => spark.table(t).select("fp").unionByName(batchFps) }
        .getOrElse(batchFps)
        .distinct()
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      // a crash between writeBucketed and the marker rename, followed by a
      // JVM restart with a non-durable metastore, leaves the table's
      // warehouse DIRECTORY behind while the catalog forgot the table —
      // the DROP above is then a no-op and saveAsTable would refuse with
      // LOCATION_ALREADY_EXISTS forever, wedging compaction. Clear the
      // stale location first (same defense, and same single-writer
      // contract, as [[graft.similarity.Ann.writeIvfIndex]]).
      deleteDefaultLocation(spark, table)
      graft.core.Layout.writeBucketed(all, table, "fp", buckets)
      val tmp = new org.apache.hadoop.fs.Path(root, s".$CompactedPrefix$version.tmp")
      val o = fs.create(tmp, true)
      try o.write(table.getBytes("UTF-8")) finally o.close()
      if (!fs.rename(tmp, marker))
        throw new java.io.IOException(
          s"compactLedger: rename $tmp -> $marker failed")
    }
    // cleanup (idempotent — a crashed run resumes here on re-invoke):
    // older compaction generations first, then the absorbed batch dirs
    fs.listStatus(root).toSeq.map(_.getPath)
      .filter(p => p.getName.startsWith(CompactedPrefix) &&
        p.getName.stripPrefix(CompactedPrefix).toLong < version)
      .foreach { p =>
        val in = fs.open(p)
        val old = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
        finally in.close()
        fs.delete(p, false)
        spark.sql(s"DROP TABLE IF EXISTS `$old`")
        // across a restart the metastore may have forgotten `old` while
        // its directory survives — don't leak superseded generations
        deleteDefaultLocation(spark, old)
      }
    ids.foreach { id =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_committed-$id"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"batch=$id"), true)
    }
    currentCompaction(spark, ledgerDir).map(_._2)
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
