package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev timing probe — `runMain graft.tools.TimeQ q13_scalar_zoo [explain]`.
  * Mirrors Bench's session config; times each named query 3× on
  * SPARK_GRAFT_SF_DIR (default sf0.1) and optionally dumps the formatted
  * plan. Not part of the engine API.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val explain = args.contains("explain")
    val names = args.filterNot(_ == "explain")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").count() // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[timeq] $n%-24s ${ts.map(t => f"$t%.3f").mkString(" ")} min=${ts.min}%.3f")
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
