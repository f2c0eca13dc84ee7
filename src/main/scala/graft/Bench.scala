package graft

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line for the driver.
  *
  * A warmup pass runs each query once at sf0.001 first: it JIT-compiles the
  * generated (whole-stage-codegen) classes and warms Spark's task/scheduler
  * paths, so the timed numbers measure the queries, not JVM startup. The
  * codegen cache is keyed on generated source, which is identical across
  * scale factors, so warmup at the small sf warms exactly the timed plans.
  *
  * Each query runs THREE timed passes; the reported wall time is the MIN
  * (the standard steady-state estimator — any one-off machine stall
  * inflates only discarded samples; two samples once let a 4× outlier
  * through as a phantom regression). Alongside wall time the line carries
  * per-query EXECUTED-plan metrics (shuffle bytes written, task count) from
  * a stage listener on the final pass: wall time says "it got slower",
  * shuffle/tasks say whether the PLAN changed or the machine hiccuped —
  * identical plan metrics with a higher wall time is noise, not regression.
  */
object Bench {

  final class StageTotals extends SparkListener {
    val shuffleWriteBytes = new LongAdder
    val tasks = new LongAdder
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
      tasks.add(sc.stageInfo.numTasks.toLong)
    }
    def reset(): Unit = { shuffleWriteBytes.reset(); tasks.reset() }
  }

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
    val totals = new StageTotals
    spark.sparkContext.addSparkListener(totals)

    // optional comma-separated subset (e.g. the scale-sensitive family
    // for an sf1 tier whose dir carries only the LLM-pipeline tables)
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries)(s =>
      SparkEntry.queries.filter { case (n, _) => s(n) })

    val warmDir = "/root/testdata/sf0.001"
    selected.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    // a failed query reports -1, never a plausible-looking wall time
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val w1 = once(); val w2 = once()
        // listener events are delivered async: drain pass-2's stragglers
        // BEFORE the reset (else they pollute pass-3's plan metrics) and
        // pass-3's before reading the totals
        Thread.sleep(150)
        totals.reset()
        val w3 = once()
        Thread.sleep(150)
        (name, math.min(w1, math.min(w2, w3)),
          totals.shuffleWriteBytes.sum(), totals.tasks.sum())
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        (name, -1.0, -1L, -1L)
      }
    }
    val qs = results.map { case (k, v, _, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val metrics = results.map { case (k, w, sb, tk) =>
      "\"" + k + "\":{\"wall\":" + w + ",\"shuffleBytes\":" + sb +
        ",\"tasks\":" + tk + "}"
    }.mkString("{", ",", "}")
    val failed = results.count(_._2 < 0)
    val total = results.map(_._2).filter(_ >= 0).sum
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"metrics":$metrics,"failed":$failed,"sf":"$sfDir"}"""
    println(line)
    // stdout tail-capture can truncate the (long) per-query map — keep a
    // full parseable copy next to the build for anyone reading the numbers
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
