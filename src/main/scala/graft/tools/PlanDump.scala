package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool — `runMain graft.tools.PlanDump q33_dedup_jaccard …`: prints
  * the join/exchange/window/scan skeleton of each named query's executed
  * plan on sf0.001. The fast way to check "is this the plan I designed"
  * without reading 300-line explains. Not part of the engine API.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // "exec": run the query to a noop sink first, then dump — shows the
    // FINAL adaptive plan (runtime broadcast conversions, AQE exchange
    // reuse), which the static initial plan cannot
    val exec = args.contains("exec")
    args.filterNot(_ == "exec").foreach { q =>
      println(s"===== $q =====")
      val df = graft.SparkEntry.queries(q)(spark, dir)
      // drive THIS QueryExecution's physical plan (df.write/df.count would
      // clone a fresh one, leaving this AdaptiveSparkPlan unexecuted)
      if (exec) df.queryExecution.executedPlan.execute().count()
      df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => Seq("Join", "Exchange", "Window", "Scan parquet",
          "HashAggregate", "Expand", "Generate", "Reused", "QueryStage")
          .exists(l.contains))
        .foreach(l => println("  " + l.trim.take(160)))
    }
    spark.stop()
  }
}
