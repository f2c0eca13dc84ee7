package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{DedupStream, NearDupStream}

/** Long-horizon stream-cost-flatness proof — the claim [[LedgerCompaction]]
  * exists to make: with cadence compaction, a stream's per-wave wall and
  * ledger-read task counts do NOT trend upward with stream age. The
  * committed evidence behind BENCH_STREAM_LONG.json:
  * `runMain graft.tools.BenchStreamLong [sfDir] [outJson] [waves]`.
  *
  * Protocol: `waves` (default 50) id-range waves of `documents`, each a
  * fresh AvailableNow cycle over one checkpoint (kill-and-restart per
  * wave), through BOTH streaming dedup paths with their built-in
  * `compactEvery = 8` cadence:
  *
  *  - [[DedupStream]] (exact, fingerprint ledger);
  *  - [[NearDupStream]] (MinHash/LSH admission, band + sset ledgers).
  *
  * Per wave it records the wall and the number of Spark tasks the cycle
  * ran (SparkListener delta — dominated by the ledger-side scans, the
  * thing that grows without compaction). Without compaction both series
  * trend up: every wave re-lists and re-reads one more `batch=` dir per
  * ledger. With the cadence, cost is a bounded sawtooth: dirs accumulate
  * for 8 waves, then a compaction absorbs them into the bucketed table.
  *
  * The tool REQUIRES flatness before writing the artifact:
  *  - task counts at the same cadence phase must not grow across cycles
  *    (first full cycle after warmup vs last cycle, +25% tolerance —
  *    task counts are deterministic modulo AQE coalescing);
  *  - mean wave wall over the last two cadence cycles must be under
  *    1.5× the mean over cycles 2-3 (wall noise tolerance).
  */
object BenchStreamLong {

  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf1")
    val outPath = if (args.length > 1) args(1) else "BENCH_STREAM_LONG.json"
    val nWaves = if (args.length > 2) args(2).toInt else 50
    val cadence = 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val root = Files.createTempDirectory("graft-bench-stream-long").toString

    val taskCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          taskCount.addAndGet(sc.stageInfo.numTasks)
      })
    def tasksDuring(f: => Unit): Long = {
      // settle the async listener bus so a previous wave's stages don't
      // bleed into this wave's delta (the bus has no public flush; 500 ms
      // after an AvailableNow cycle's termination is far past its tail)
      Thread.sleep(500)
      val t0 = taskCount.get()
      f
      Thread.sleep(500)
      taskCount.get() - t0
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0) + 1

    def runSection(name: String, in: String, ckpt: String,
        writer: (org.apache.spark.sql.DataFrame, Long) => Unit)
        : (Seq[Double], Seq[Long]) = {
      def cycle(tag: String): Unit = {
        val q = spark.readStream.schema("doc_id long, text string")
          .parquet(s"$in/*")
          .writeStream
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .foreachBatch(writer)
          .start()
        require(q.awaitTermination(600000), s"$name $tag: did not terminate")
        require(q.exception.isEmpty, s"$name $tag failed: ${q.exception}")
      }
      val walls = Array.ofDim[Double](nWaves)
      val tasks = Array.ofDim[Long](nWaves)
      (0 until nWaves).foreach { b =>
        docs.filter(col("doc_id") >= b * maxId / nWaves &&
            col("doc_id") < (b + 1) * maxId / nWaves)
          .coalesce(1).write.parquet(s"$in/w$b")
        tasks(b) = tasksDuring { walls(b) = timed(cycle(s"wave $b")) }
        System.err.println(
          f"[$name] wave $b%2d wall=${walls(b)}%6.2fs tasks=${tasks(b)}")
      }
      (walls.toSeq, tasks.toSeq)
    }

    // compactEvery = cadence: the writer's own maintenance hook — the
    // exact production configuration the flatness claim is about
    val (dWalls, dTasks) = runSection("dedup", s"$root/inA", s"$root/ckptA",
      DedupStream.writer(s"$root/outA", s"$root/ledgerA", "text", "doc_id",
        compactEvery = cadence))
    val (nWalls, nTasks) = runSection("neardup", s"$root/inC", s"$root/ckptC",
      NearDupStream.writer(s"$root/outC", s"$root/bandsC", s"$root/setsC",
        "text", "doc_id", 0.5, compactEvery = cadence))

    // flatness gates. Cycle-aligned task comparison: wave w and wave
    // w + cadence face the same number of un-absorbed batch dirs, so
    // equal per-cycle task SUMS mean stream age added no recurring cost —
    // the exact pathology compaction exists to kill (without it the
    // ledger scans add one task per accumulated dir per wave,
    // ~cadence² per cycle per ledger). Sums, not per-wave counts:
    // individual waves jitter a few stages on AQE/broadcast decisions.
    // Skip cycle 0 (cold start: empty-ledger fast paths, first
    // compaction not yet run).
    def phaseFlat(tag: String, tasks: Seq[Long]): Unit = {
      val cycles = nWaves / cadence
      val first = tasks.slice(cadence, 2 * cadence).sum
      val last = tasks.slice((cycles - 1) * cadence, cycles * cadence).sum
      require(last <= first * 1.15,
        s"$tag: per-cycle task total trends upward: " +
          s"cycle1=$first lastCycle=$last (all: $tasks)")
    }
    def wallFlat(tag: String, walls: Seq[Double]): Double = {
      val early = walls.slice(cadence, 3 * cadence)
      val late = walls.slice(nWaves - 2 * cadence, nWaves)
      val (e, l) = (early.sum / early.size, late.sum / late.size)
      require(l <= e * 1.5,
        s"$tag: wave wall trends upward: early-mean=$e late-mean=$l")
      l / e
    }
    phaseFlat("dedup", dTasks); phaseFlat("neardup", nTasks)
    val dRatio = wallFlat("dedup", dWalls)
    val nRatio = wallFlat("neardup", nWalls)

    def arrD(xs: Seq[Double]) = xs.map(x => f"$x%.3f").mkString("[", ",", "]")
    def arrL(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    val line =
      s"""{"sf":"$sfDir","waves":$nWaves,"compact_every":$cadence,""" +
      s""""dedup":{"wave_walls":${arrD(dWalls)},"wave_tasks":${arrL(dTasks)},""" +
      s""""late_over_early_wall":${f"$dRatio%.3f"}},""" +
      s""""neardup":{"wave_walls":${arrD(nWalls)},"wave_tasks":${arrL(nTasks)},""" +
      s""""late_over_early_wall":${f"$nRatio%.3f"}}}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
