package graft.tools

import java.util.concurrent.atomic.LongAdder

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev I/O probe — `runMain graft.tools.IoProbe q83_quality_bins`.
  *
  * Runs each named query once on SPARK_GRAFT_SF_DIR (default sf0.1) and
  * reports the EXECUTED totals the static `explain` can't show: input
  * records/bytes actually read (after AQE stage reuse dedupes repeated
  * subtrees) and shuffle read/write volume. The input-records count is the
  * ground truth for "how many times did this plan really scan the table".
  * Not part of the engine API.
  */
object IoProbe {

  final class Totals extends SparkListener {
    val inputRecords = new LongAdder
    val inputBytes = new LongAdder
    val shuffleWriteBytes = new LongAdder
    val shuffleReadBytes = new LongAdder
    val tasks = new LongAdder
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        inputRecords.add(m.inputMetrics.recordsRead)
        inputBytes.add(m.inputMetrics.bytesRead)
        shuffleWriteBytes.add(m.shuffleWriteMetrics.bytesWritten)
        shuffleReadBytes.add(m.shuffleReadMetrics.totalBytesRead)
      }
      tasks.add(sc.stageInfo.numTasks.toLong)
    }
    def reset(): Unit = Seq(inputRecords, inputBytes, shuffleWriteBytes,
      shuffleReadBytes, tasks).foreach(_.reset())
  }

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
    val t = new Totals
    spark.sparkContext.addSparkListener(t)
    args.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      fn(spark, "/root/testdata/sf0.001").count() // warm codegen
      Thread.sleep(300); t.reset()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain stage-completed events
      println(f"[ioprobe] $n%-24s wall=$wall%.2fs inRecords=${t.inputRecords.sum()} " +
        f"inBytes=${t.inputBytes.sum()} shufW=${t.shuffleWriteBytes.sum()} " +
        f"shufR=${t.shuffleReadBytes.sum()} tasks=${t.tasks.sum()}")
    }
    spark.stop()
  }
}
