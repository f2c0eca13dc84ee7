package graft.similarity

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VERSIONED deployment of the persisted IVF serving index — the
  * maintenance half [[Ann.writeIvfIndex]] deliberately leaves out.
  *
  * [[Ann.writeIvfIndex]]'s drop/recreate is documented single-writer and
  * NOT reader-safe: a search that loads `<name>_assigned` while a rebuild
  * is mid-swap sees a torn index (tables dropped, half-written, or one
  * old + one new). Fine for a once-per-corpus build; not for the
  * long-lived serving deployment whose coordinate system must be
  * RETRAINED as the corpus drifts ([[Ann.addToIvfIndex]]'s maintenance
  * contract, q118's retrain for the semantic reps family).
  *
  * Versioned protocol (the same marker-gated visibility as
  * [[graft.streaming.IdempotentSink]], applied to catalog tables):
  *
  *  - version V lives in tables `<name>_v<V>_centroids` /
  *    `<name>_v<V>_assigned` — written ONCE, never rewritten in place;
  *  - a version is VISIBLE only when its marker file
  *    `<meta>/_committed-<V>` exists, and the marker is created strictly
  *    AFTER both tables are fully written ([[publish]]);
  *  - readers ([[loadCurrent]]) resolve max(committed version) at load
  *    time — they can never observe a torn index, because nothing a
  *    reader resolves is ever mutated: a crash mid-publish leaves orphan
  *    unmarked tables (invisible; the next publish of that version
  *    number clears and rewrites them via writeIvfIndex's stale-location
  *    handling), and a completed publish flips visibility with one
  *    atomic marker create;
  *  - [[prune]] drops all but the newest `keep` versions (default 2, so
  *    a reader that resolved the previous version keeps working through
  *    one full rebuild cycle — the standard two-generation contract).
  *
  * Single WRITER per name, as before (publishes are rare, deliberate
  * maintenance events — serialize them); any number of concurrent
  * readers.
  */
object IvfServe {

  private def metaRoot(spark: SparkSession, name: String): Path = {
    val wh = spark.sessionState.conf.warehousePath
    new Path(new Path(wh), s"${name}_serve_meta")
  }

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableName(name: String, v: Long, half: String) =
    s"${name}_v${v}_$half"

  /** Committed (visible) versions, ascending. */
  def committedVersions(spark: SparkSession, name: String): Seq[Long] = {
    val root = metaRoot(spark, name)
    val f = fs(spark, root)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case s if s.startsWith("_committed-") =>
        s.stripPrefix("_committed-").toLong }
      .sorted
  }

  /** The version [[loadCurrent]] resolves right now. */
  def currentVersion(spark: SparkSession, name: String): Option[Long] =
    committedVersions(spark, name).lastOption

  /** Write `idx` as the next version and flip visibility to it. The
    * marker create is the LAST step — a crash anywhere before it leaves
    * the current version untouched and the new one invisible. Returns
    * the published version. */
  def publish(idx: Ann.IvfIndex, name: String, buckets: Int = 0): Long = {
    val spark = idx.assigned.sparkSession
    val v = currentVersion(spark, name).map(_ + 1).getOrElse(0L)
    Ann.writeIvfIndex(idx, s"${name}_v$v", buckets)
    val root = metaRoot(spark, name)
    val f = fs(spark, root)
    f.mkdirs(root)
    f.create(new Path(root, s"_committed-$v"), true).close()
    v
  }

  /** Load the current committed version. Readers resolve the version
    * HERE, once — the returned index reads fixed, never-rewritten
    * tables, so a publish racing this load flips later readers to the
    * new version without disturbing this one. */
  def loadCurrent(spark: SparkSession, name: String): Ann.IvfIndex = {
    val v = currentVersion(spark, name).getOrElse(
      throw new IllegalStateException(
        s"no committed version of serving index '$name' — publish first"))
    Ann.loadIvfIndex(spark, s"${name}_v$v")
  }

  /** Drop all but the newest `keep` committed versions (tables AND
    * markers; markers first, so a crash mid-prune can only leave
    * invisible orphan tables, never a visible version with missing
    * tables). Returns the dropped versions. */
  def prune(spark: SparkSession, name: String, keep: Int = 2): Seq[Long] = {
    require(keep >= 1, s"must keep at least the current version: $keep")
    val vs = committedVersions(spark, name)
    val drop = vs.dropRight(keep)
    val root = metaRoot(spark, name)
    val f = fs(spark, root)
    drop.foreach { v =>
      f.delete(new Path(root, s"_committed-$v"), false)
      Seq("centroids", "assigned").foreach { half =>
        spark.sql(s"DROP TABLE IF EXISTS `${tableName(name, v, half)}`")
      }
    }
    drop
  }

  /** Drop every version and marker of `name` — bench/spec hygiene for
    * deterministic re-runs, NOT a production operation (production
    * retires old generations with [[prune]]). */
  def reset(spark: SparkSession, name: String): Unit = {
    val root = metaRoot(spark, name)
    val f = fs(spark, root)
    if (f.exists(root)) f.delete(root, true)
    spark.catalog.listTables().collect()
      .map(_.name).filter(_.startsWith(s"${name}_v"))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS `$t`"))
  }

  /** (cells, max occupancy, mean occupancy) of a version's posting
    * lists — the serving twin of
    * [[graft.streaming.SemanticStream.cellOccupancy]]: one aggregate
    * over the cell-bucketed assigned table, vectors pruned at the scan.
    * Drift concentrates arrivals ([[Ann.addToIvfIndex]] appends against
    * FROZEN centroids) into cells the build-time draw never anticipated;
    * a hot cell is paid on every query that probes it (candidates =
    * occupancy × probing queries). */
  def occupancy(spark: SparkSession, name: String,
      version: Option[Long] = None): (Long, Long, Double) = {
    val v = version.orElse(currentVersion(spark, name)).getOrElse(
      throw new IllegalStateException(s"no committed version of '$name'"))
    val r = spark.table(tableName(name, v, "assigned"))
      .groupBy("cell").agg(count(lit(1)).as("occ"))
      .agg(count(lit(1)), max("occ"), avg("occ")).head()
    if (r.isNullAt(1)) (0L, 0L, 0.0)
    else (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  /** RETRAIN-AND-REPUBLISH: redraw the coordinate system from the
    * current version's own vectors ([[Ann.retrainCentroids]] — portable
    * hash draw + `refineIters` exact Lloyd steps, √n cells sized to the
    * data that actually arrived), re-assign every vector (one
    * [[graft.functions.IvfArgmaxCell]] projection), and [[publish]] as
    * the next version. Readers flip on their next [[loadCurrent]];
    * in-flight searches finish on the version they resolved. Returns
    * the new version. */
  def rebuild(spark: SparkSession, name: String, refineIters: Int = 1,
      buckets: Int = 0): Long = {
    val cur = loadCurrent(spark, name)
    val corpus = cur.assigned
      .select(col("nid").as("vec_id"), col("ce").as("embedding"))
    val cent = Ann.retrainCentroids(corpus, refineIters)
    publish(Ann.indexWithCentroids(corpus, cent), name, buckets)
  }

  /** Drift-triggered rebuild policy, the serving twin of
    * [[graft.streaming.SemanticStream.retrainIfDrifted]]: fire
    * [[rebuild]] when max/mean cell occupancy exceeds `maxOverMean`
    * (ratio, not absolute — a uniform corpus keeps it small at any
    * scale; a drift cone grows it without bound), else do nothing
    * beyond the one monitoring aggregate. Returns the new version when
    * fired. */
  def rebuildIfDrifted(spark: SparkSession, name: String,
      maxOverMean: Double = 8.0, refineIters: Int = 1,
      buckets: Int = 0): Option[Long] = {
    val (cells, maxOcc, meanOcc) = occupancy(spark, name)
    if (cells == 0 || meanOcc == 0.0 || maxOcc / meanOcc <= maxOverMean)
      None
    else Some(rebuild(spark, name, refineIters, buckets))
  }
}
