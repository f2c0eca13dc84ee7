package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver.
  *
  * A warmup pass runs each query once at sf0.001 first: it JIT-compiles the
  * generated (whole-stage-codegen) classes and warms Spark's task/scheduler
  * paths, so the timed numbers measure the queries, not JVM startup. The
  * codegen cache is keyed on generated source, which is identical across
  * scale factors, so warmup at the small sf warms exactly the timed plans.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val warmDir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    // a failed query reports -1, never a plausible-looking wall time.
    // Each query is timed twice and the MIN reported: single-sample wall
    // times on a shared machine carry 20-30% GC/scheduler noise, and the
    // minimum is the standard steady-state estimator (any one-off stall
    // inflates only the discarded sample).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val elapsed =
        try math.min(once(), once())
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          -1.0
        }
      name -> elapsed
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout tail-capture can truncate the (long) per-query map — keep a
    // full parseable copy next to the build for anyone reading the numbers
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
