package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.QueryDef
import graft.queries._

/** Driver contract — see SURVEY.md §7 and the builder prompt.
  *
  * Every implemented operator from SURVEY §2 gets a `queries` entry
  * (Spark-side) and an `oracleSql` entry (DuckDB side) — ALL queries
  * are oracle-hash-gated: hash-seeded sketches run portable (md5-60)
  * variants and the codec queries gate through lossless-round-trip
  * closed forms; `oracle = None` remains supported for future operators
  * but is currently unused. Parity rules applied throughout (SURVEY
  * H1-H7):
  *  - deterministic output order: every query ends in an ORDER BY over a
  *    unique key, mirrored in the oracle;
  *  - double aggregation goes through exact integer/decimal sums
  *    ([[graft.functions.GraftFunctions]]) so partition order cannot change
  *    the result;
  *  - discrete quantiles use DuckDB's ceil(q·n) element rule;
  *  - identical output column names on both sides (the driver's compare
  *    sorts columns by name).
  */
object SparkEntry {

  private val modules: Seq[graft.core.QueryModule] =
    Seq(Flagship, Relational, Advanced, Extended, Quality, Text, DedupQueries,
      SimilarityQueries, MultimodalQueries, CurationQueries)

  private lazy val defs: Map[String, QueryDef] =
    modules.flatMap(_.queries).toMap

  /** Flagship query on sf=0.001: the reference's headway mart computed over
    * the `events` fixture. Driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q07_headways")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (k, d) => k -> d.build }

  /** DuckDB-equivalent SQL for each hash-verifiable query. */
  def oracleSql: Map[String, String] =
    defs.collect { case (k, QueryDef(_, Some(sql))) => k -> sql }
}
