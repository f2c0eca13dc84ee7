package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable engine query: the Spark-side builder plus (when the
  * semantics are ANSI-SQL-expressible) the DuckDB oracle the driver
  * hash-compares against. `oracle = None` → the driver records a weaker
  * rows-only check (currently unused: every registered query carries an
  * oracle — hash-seeded sketches via portable md5-60 variants, codec
  * queries via lossless-round-trip closed forms).
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A module of related queries (relational core, text, dedup, ...). */
trait QueryModule {
  def queries: Map[String, QueryDef]
}
