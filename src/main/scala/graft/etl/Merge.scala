package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC merge-into: apply an upsert/delete changeset to a table snapshot.
  *
  * The reference refreshes tables by full re-snapshot per DAG run
  * (`airflow/dags/tfl_ingest_dag.py` re-lands the world, dbt rebuilds);
  * at 100 TB the only viable refresh is applying the delta. This is the
  * engine-side MERGE the lakehouse formats (Delta/Iceberg/Hudi) each
  * hand-roll, expressed as a declarative plan Catalyst can optimize:
  *
  *  1. collapse the changeset to its latest change per key
  *     (`versionCol` descending — one window shuffle on the key);
  *  2. survivors = snapshot rows whose key has no change (left-anti join)
  *     UNION the latest non-delete change rows.
  *
  * Scale shape: the changeset is typically ≪ the snapshot, so AQE plans
  * the anti-join as a broadcast (no snapshot shuffle at all); a snapshot
  * bucketed on the merge key at rest ([[graft.core.Layout.writeBucketed]])
  * makes even the sort-merge fallback exchange-free on the big side.
  * Nothing in the plan scales with snapshot × changes. Writing the result
  * back atomically is the rename-protocol discipline of
  * [[graft.core.Layout.compact]] / [[graft.streaming.IdempotentSink]].
  *
  * Contract: `(keys, versionCol)` is unique within `changes` (the standard
  * CDC log guarantee); change rows carry the full snapshot schema plus
  * `versionCol` and boolean `deletedCol`.
  */
object Merge {

  def merge(snapshot: DataFrame, changes: DataFrame, keys: Seq[String],
      versionCol: String, deletedCol: String): DataFrame = {
    val keyCols = keys.map(col)
    val latest = changes
      .withColumn("__rn", row_number().over(
        Window.partitionBy(keyCols: _*).orderBy(col(versionCol).desc)))
      .filter(col("__rn") === 1)
      .drop("__rn")
    snapshot
      .join(latest.select(keyCols: _*), keys, "left_anti")
      .unionByName(latest.filter(!col(deletedCol))
        .drop(versionCol, deletedCol))
  }
}
