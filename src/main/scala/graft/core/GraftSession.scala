package graft.core

import org.apache.spark.sql.SparkSession

/** Session construction and parity/scale configuration.
  *
  * Every entry point (Verify, Bench, ScalaTest suites, jobs) funnels through
  * here so the DuckDB-parity and scale decisions live in one place:
  *
  *  - UTC session timezone (SURVEY H3: DuckDB timestamps are naive; pinning
  *    UTC makes Spark's session-TZ-relative timestamps line up).
  *  - Non-ANSI mode (SURVEY H4: Spark 4 defaults to ANSI, where a malformed
  *    cast throws; the reference's staging model nulls malformed input via
  *    DuckDB `try_cast` — `stg_arrivals.sql:24`. We still use `try_`
  *    functions explicitly at every lossy boundary; non-ANSI is belt and
  *    braces for dirty data at scale).
  *  - `nanosAsLong` (SURVEY H2: the `events` fixture carries ns-precision
  *    parquet timestamps, which Spark's reader rejects with
  *    PARQUET_TYPE_ILLEGAL by default; reading them as long-nanos and
  *    truncating to micros reproduces what DuckDB's reader does natively).
  *  - Micros parquet output, so downstream readers (DuckDB, pyarrow) see
  *    exactly the instants we computed.
  *  - AQE on (runtime re-planning, skew-join splitting at scale).
  *
  * Scale note: shuffle partition count is caller-sized (local[32] → 32; a
  * real cluster wants ~2-3× total cores). With AQE coalescing enabled the
  * setting is an upper bound, so erring high is safe on a cluster.
  */
object GraftSession {

  /** Apply runtime-settable parity configs to an existing session. Safe to
    * call repeatedly (idempotent); every table loader calls it so queries
    * behave identically no matter who built the session.
    */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.ansi.enabled", "false")
    c.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    c.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    graft.functions.Sketches.register(spark)
    // the pair-join parallelism safety net (see its scaladoc); contains
    // check keeps repeated tune() calls from stacking duplicates
    if (!spark.experimental.extraOptimizations.contains(graft.plans.ParallelizePairJoins))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.ParallelizePairJoins
    spark
  }

  /** Local session for tests and jobs. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors,
            appName: String = "graft"): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }
}
