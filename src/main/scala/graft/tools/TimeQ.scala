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
    val stats = args.contains("stats")
    val names = args.filterNot(a => a == "explain" || a == "stats")
    // per-run shuffle-bytes / task-count probe for plan audits: totals are
    // accumulated across all stages of the timed action
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
    val taskCount = new java.util.concurrent.atomic.AtomicLong
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Long, Int)]
    if (stats) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          shuffleBytes.addAndGet(w)
          taskCount.addAndGet(sc.stageInfo.numTasks)
          // executorRunTime = Σ task wall (ms) — the stage's work volume;
          // divide by cores for its lower-bound contribution to query wall
          stages.add((f"run=${sc.stageInfo.taskMetrics.executorRunTime / 1e3}%.1fs",
            w, sc.stageInfo.numTasks))
        }
      })
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      // materialize through the no-op v2 sink, like Bench — count() lets
      // Catalyst prune not just columns but whole JOINS (measured: q104's
      // verdict groups by the left join's own key, so count() collapses
      // to a distinct count of the batch and the entire admission plan —
      // joins, verify, 644 MB of shuffle — vanishes: 0.9 s / 1.5 MB
      // where the real plan is 15 s; a profile of a shadow)
      var lastDf: org.apache.spark.sql.DataFrame = null
      def once(dir: String): Double = {
        // per-sample cache isolation, mirroring Bench: the engine's
        // compute-once persists are session-lifetime, so without this
        // every run after the first measures a warm-cache shadow
        // (fixture memoization survives — see TransientCache)
        graft.core.TransientCache.clear()
        val t0 = System.nanoTime()
        val df = fn(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        lastDf = df
        (System.nanoTime() - t0) / 1e9
      }
      once("/root/testdata/sf0.001") // warm
      val rows = fn(spark, sfDir).count() // untimed, display only; BEFORE
      // the timed runs so its (count-pruned) stages never reach any
      // sample's stats window
      // per-sample stage snapshots, reported from the MIN-WALL sample:
      // the host throttles under sustained load (measured: 14 → 32 →
      // 86 s across three samples of one run), so "the final warmed
      // run" can be the most-throttled one and its per-stage executor
      // times attribute the stall to whatever stage was running
      case class Snap(wall: Double, mb: Long, tasks: Long,
        st: Seq[(String, Long, Int)])
      val samples = (1 to 3).map { _ =>
        if (stats) {
          Thread.sleep(1000) // let the listener bus drain prior stages
          shuffleBytes.set(0); taskCount.set(0); stages.clear()
        }
        val w = once(sfDir)
        if (stats) Thread.sleep(1000) // drain this sample's stages
        import scala.jdk.CollectionConverters._
        Snap(w, shuffleBytes.get, taskCount.get, stages.asScala.toSeq)
      }
      val ts = samples.map(_.wall)
      println(f"[timeq] $n%-24s ${ts.map(t => f"$t%.3f").mkString(" ")} min=${ts.min}%.3f rows=$rows")
      if (stats) {
        val best = samples.minBy(_.wall)
        println(f"[timeq] $n%-24s shuffleMB=${best.mb / 1e6}%.1f tasks=${best.tasks} (stages from the min-wall sample)")
        best.st.sortBy(-_._2).take(12).foreach { case (nm, w, t) =>
          println(f"[timeq]   stage ${w / 1e6}%8.1fMB tasks=$t%-5d $nm")
        }
        // name every exchange: walk the LAST run's executed plan
        // (recursing into AQE query stages and cached plans, where the
        // scoped-persist mid-frames hide their join exchanges) and print
        // each shuffle's written bytes with its child node — the exact
        // map from the stage table above onto plan nodes
        import org.apache.spark.sql.execution.SparkPlan
        import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
        import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
        val seen = java.util.Collections.newSetFromMap(
          new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean])
        def walk(p: SparkPlan, depth: Int): Unit = if (seen.add(p)) p match {
          case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth)
          case q: QueryStageExec => walk(q.plan, depth)
          case e: ShuffleExchangeExec =>
            val mb = e.metrics.get("shuffleBytesWritten")
              .map(_.value / 1e6).getOrElse(-1.0)
            println(f"[timeq]   xchg${"  " * depth} $mb%8.1fMB <- ${e.child.nodeName} ${e.child.simpleString(4).take(150)}")
            walk(e.child, depth)
          case r: ReusedExchangeExec =>
            println(f"[timeq]   xchg${"  " * depth}    reuse <- ${r.child.nodeName}")
          case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            walk(im.relation.cachedPlan, depth + 1) // scoped-persist interior
          case o => o.children.foreach(walk(_, depth))
        }
        walk(lastDf.queryExecution.executedPlan, 0)
      }
      if (explain) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
