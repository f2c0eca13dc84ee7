package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Executor-CPU accumulator between resets — the machine-readable
  * host-stall marker for the per-wave stream benches: a HOST STALL
  * (page-zeroing, a co-tenant burning the cores, thermal throttle)
  * inflates a wave's WALL but leaves its executor CPU in the band of the
  * neighboring waves; an ENGINE regression inflates both. Artifacts that
  * carry both numbers per wave let a reader separate the two without
  * being there when it ran (round-15 verdict: BENCH_STREAM_CURATION's
  * wave-20 60.9 s outlier was a documented-but-unprovable stall).
  *
  * Listener events drain asynchronously off the bus — callers sleep
  * ~200 ms after the measured action before [[takeSeconds]], the same
  * settle discipline as BenchBandStorm's TaskStats.
  */
final class CpuWaveStats extends SparkListener {
  private val cpuNs = new AtomicLong(0)
  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) { cpuNs.addAndGet(m.executorCpuTime); () }
  }
  /** Executor-CPU seconds accumulated since the last call, then reset. */
  def takeSeconds(): Double = cpuNs.getAndSet(0L) / 1e9
}
