package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Generic maintenance engine for the [[IdempotentSink]]-style ledgers the
  * streaming dedup family persists ([[DedupStream]]'s fingerprint ledger,
  * [[NearDupStream]]'s band and shingle-set ledgers): absorb the
  * accumulated `batch=<id>` directories into ONE bucketed metastore table
  * behind a versioned marker, so a long-running stream's per-batch ledger
  * read stops paying per-file opens over an ever-growing dir list and the
  * per-batch join/anti-join plans with ZERO Exchange on the ledger side
  * (the table arrives pre-partitioned on the join key).
  *
  * All ledgers compacted here are ROW SETS under duplication — replayed
  * batches and crash windows may duplicate rows, and every consumer
  * (anti-join, candidate join, verification join) is insensitive to
  * duplicates — so compaction's `distinct()` is semantics-preserving and
  * temporary table/dir overlap during a generation switch is harmless.
  *
  * == Crash safety ==
  * Marker discipline as in [[IdempotentSink]]: the new generation's table
  * is written first, its `_compactedtable-<v>` marker renamed into place
  * second (tmp + rename, atomic), cleanup last — at every kill point
  * [[read]] resolves either the old complete state or the new one.
  * Re-invoking a crashed compaction resumes it (idempotent), including
  * across a JVM restart whose non-durable metastore forgot the half-written
  * table while its warehouse directory survived ([[deleteDefaultLocation]]).
  *
  * == Concurrency with the stream (one-generation deferred cleanup) ==
  * [[read]] resolves the marker, then lists batch dirs, then lazily scans —
  * three steps a concurrent compaction could interleave with. Rather than
  * forbid concurrency, cleanup is DEFERRED BY ONE GENERATION: creating
  * generation `w` deletes only generations OLDER than the previous one `v`
  * and batch dirs `<= v` — never `v`'s table or the dirs in `(v, w]`. A
  * reader that resolved marker `v` (or no marker, before the first
  * generation existed) therefore still finds every path it planned over
  * after ANY single compaction completes mid-read: the paths a new
  * generation deletes were already invisible to that reader. Spec-pinned in
  * StreamingDedupSpec/StreamingNearDupSpec by compacting between plan
  * construction and action. The residual window — TWO further generations
  * completing inside one micro-batch's read — is a cadence bound, not a
  * locking bug: compaction is an occasional maintenance invocation
  * (reference analogue: the raw-zone file compaction cadence of
  * tfl-realtime-lakehouse's `airflow/dags/tfl_ingest_dag.py:80`, daily vs a
  * 2-minute poll), two runs inside one batch is not an operating mode.
  * Single concurrent COMPACTOR per ledger remains the writer contract, as
  * for [[graft.similarity.Ann.writeIvfIndex]].
  */
object LedgerCompaction {

  private val CompactedPrefix = "_compactedtable-"

  private def fsOf(spark: SparkSession, dir: String) = {
    val root = new Path(dir)
    (root, root.getFileSystem(spark.sparkContext.hadoopConfiguration))
  }

  /** Delete a table's DEFAULT warehouse directory if it exists without a
    * catalog entry — the orphan a crash leaves when the JVM dies after
    * `saveAsTable` but before its marker, and a restart's non-durable
    * metastore has forgotten the table (so `DROP TABLE IF EXISTS` no-ops
    * while the location blocks every re-create with
    * LOCATION_ALREADY_EXISTS). Resolved through the catalog so the
    * current database's `<db>.db/<table>` path is honored.
    */
  private def deleteDefaultLocation(spark: SparkSession, table: String): Unit = {
    val loc = new Path(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table.toLowerCase)))
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  /** All generation markers under `dir`, version-sorted ascending. */
  private def generations(spark: SparkSession,
      dir: String): Seq[(Long, Path)] = {
    val (root, fs) = fsOf(spark, dir)
    if (!fs.exists(root)) Seq.empty
    else fs.listStatus(root).toSeq.map(_.getPath)
      .filter(_.getName.startsWith(CompactedPrefix))
      .map(p => p.getName.stripPrefix(CompactedPrefix).toLong -> p)
      .sortBy(_._1)
  }

  private def markerTable(fs: org.apache.hadoop.fs.FileSystem,
      marker: Path): String = {
    val in = fs.open(marker)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  /** The current compaction generation: (version, metastore table name),
    * read from the HIGHEST-versioned `_compactedtable-<v>` marker. Marker
    * files are tiny (they hold the table name) and written via
    * tmp + rename, so a reader never sees a half-written name; `_`-prefixed
    * names keep them out of Spark's file listings like the batch markers.
    */
  def currentCompaction(spark: SparkSession,
      ledgerDir: String): Option[(Long, String)] = {
    val (_, fs) = fsOf(spark, ledgerDir)
    generations(spark, ledgerDir).lastOption
      .map { case (v, p) => (v, markerTable(fs, p)) }
  }

  /** A generation's rows. The durable commit is the MARKER + the table's
    * warehouse DIRECTORY; the catalog entry is convenience that a
    * non-durable metastore forgets across a JVM restart (the local/test
    * deployment — a production Hive metastore keeps it). With the entry
    * present this is the bucketed table scan, partitioning and all;
    * without it, a plain path read of the same files — identical rows,
    * but bucket metadata is catalog-resident, so ledger joins pay an
    * exchange again until the next [[compact]] registers a generation in
    * the restarted JVM's catalog (which it always does: its union reads
    * THROUGH this same fallback).
    */
  private def generationFrame(spark: SparkSession, table: String): DataFrame =
    if (spark.catalog.tableExists(table)) spark.table(table)
    else spark.read.parquet(
      spark.sessionState.catalog.defaultTablePath(
        org.apache.spark.sql.catalyst.TableIdentifier(table.toLowerCase))
        .toString)

  /** The committed ledger rows, projected to `schema`'s columns: the
    * bucketed table of the newest generation (if any) unioned with every
    * `batch=` dir committed SINCE that generation; a typed empty frame
    * before the first commit. Once all batches are absorbed the read is
    * the bucketed table ALONE — no union node — so the table scan's
    * output partitioning survives to the consumer join (spec-pinned:
    * ledger-side joins plan with zero Exchange).
    *
    * Safe against one concurrent compaction completing at any point
    * between the marker resolution here and the scan's execution, by the
    * deferred-cleanup invariant in the object doc: nothing a single new
    * generation deletes is a path this read planned over.
    */
  def read(spark: SparkSession, ledgerDir: String,
      schema: StructType): DataFrame = {
    val fields = schema.fieldNames.toSeq.map(col)
    currentCompaction(spark, ledgerDir) match {
      case None =>
        IdempotentSink.readCommitted(spark, ledgerDir, Some(schema))
          .select(fields: _*)
      case Some((version, table)) =>
        val compacted = generationFrame(spark, table).select(fields: _*)
        val fresh = IdempotentSink.committedBatches(spark, ledgerDir)
          .filter(_ > version)
        if (fresh.isEmpty)
          compacted // preserve the bucketed partitioning — no union node
        else compacted.unionByName(
          spark.read.option("basePath", ledgerDir)
            .parquet(fresh.map(id => s"$ledgerDir/batch=$id"): _*)
            .select(fields: _*))
    }
  }

  /** Absorb every committed `batch=` dir (plus the previous generation's
    * table) into a NEW generation bucketed on `bucketCols`, then run the
    * deferred cleanup sweep. With nothing new to absorb only the sweep
    * runs. Returns the active generation's table name, or None when the
    * ledger has never committed anything.
    *
    * Sequence (each step idempotent — a crashed run resumes on re-invoke):
    *  1. distinct union (previous table + committed batch rows) written to
    *     a NEW versioned table — readers still resolve the old marker;
    *  2. the new marker renamed into place — readers now resolve the new
    *     table; rows temporarily duplicated between table and
    *     not-yet-swept dirs, which set semantics tolerate;
    *  3. deferred sweep: generations older than the SECOND-newest marker
    *     are dropped, batch dirs `<=` the second-newest version deleted
    *     (marker first — a dir without a marker is invisible to committed
    *     reads). The second-newest generation itself survives until the
    *     next one lands, which is what makes concurrent reads safe.
    *
    * A batch REPLAYED by the stream after its dir was swept (restart from
    * an old checkpoint) recomputes the identical output — its rows are
    * still in the ledger via the table, and the computation is a pure
    * function of (batch, committed ledger) — and rewrites its dir:
    * harmless duplication that [[read]] excludes (`> version` filter) and
    * a later sweep removes.
    */
  def compact(spark: SparkSession, ledgerDir: String, schema: StructType,
      bucketCols: Seq[String], buckets: Int): Option[String] = {
    val (root, fs) = fsOf(spark, ledgerDir)
    val ids = IdempotentSink.committedBatches(spark, ledgerDir)
    val current = currentCompaction(spark, ledgerDir)
    val fresh = current.fold(ids) { case (v, _) => ids.filter(_ > v) }
    if (ids.isEmpty && current.isEmpty) return None

    if (fresh.nonEmpty) {
      val version = math.max(ids.max, current.map(_._1 + 1).getOrElse(0L))
      val marker = new Path(root, s"$CompactedPrefix$version")
      if (!fs.exists(marker)) {
        // deterministic per-ledger table family; the dir hash keys the
        // family so two ledgers in one warehouse never collide
        val digest = java.security.MessageDigest.getInstance("MD5")
          .digest(ledgerDir.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(12)
        val table = s"graft_ledger_${digest}_v$version"
        val fields = schema.fieldNames.toSeq.map(col)
        val batchRows = IdempotentSink
          .readCommitted(spark, ledgerDir, Some(schema)).select(fields: _*)
        val all = current
          .map { case (_, t) =>
            generationFrame(spark, t).select(fields: _*).unionByName(batchRows) }
          .getOrElse(batchRows)
          .distinct()
        spark.sql(s"DROP TABLE IF EXISTS `$table`")
        // a crash between writeBucketedMulti and the marker rename,
        // followed by a JVM restart with a non-durable metastore, leaves
        // the table's warehouse DIRECTORY behind while the catalog forgot
        // the table — the DROP above is then a no-op and saveAsTable would
        // refuse with LOCATION_ALREADY_EXISTS forever, wedging compaction.
        // Clear the stale location first (same defense, and same
        // single-writer contract, as graft.similarity.Ann.writeIvfIndex).
        deleteDefaultLocation(spark, table)
        graft.core.Layout.writeBucketedMulti(all, table, bucketCols, buckets)
        val tmp = new Path(root, s".$CompactedPrefix$version.tmp")
        val o = fs.create(tmp, true)
        try o.write(table.getBytes("UTF-8")) finally o.close()
        if (!fs.rename(tmp, marker))
          throw new java.io.IOException(
            s"compactLedger: rename $tmp -> $marker failed")
      }
    }

    // deferred sweep: with >= 2 generations on disk, everything the
    // SECOND-newest had already absorbed is garbage no reader can still
    // reference (any reader holds the newest or second-newest marker;
    // see the concurrency contract in the object doc)
    val gens = generations(spark, ledgerDir)
    if (gens.size >= 2) {
      val keepFrom = gens(gens.size - 2)._1
      gens.filter(_._1 < keepFrom).foreach { case (_, p) =>
        val old = markerTable(fs, p)
        fs.delete(p, false)
        spark.sql(s"DROP TABLE IF EXISTS `$old`")
        // across a restart the metastore may have forgotten `old` while
        // its directory survives — don't leak superseded generations
        deleteDefaultLocation(spark, old)
      }
      IdempotentSink.committedBatches(spark, ledgerDir)
        .filter(_ <= keepFrom)
        .foreach { id =>
          fs.delete(new Path(root, s"_committed-$id"), false)
          fs.delete(new Path(root, s"batch=$id"), true)
        }
    }
    currentCompaction(spark, ledgerDir).map(_._2)
  }
}
