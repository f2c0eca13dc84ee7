package graft.lineage

import java.util.UUID
import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** OpenLineage-shaped run-event emission (SURVEY S12) — the engine-side
  * counterpart of the reference's OpenLineage → Marquez wiring
  * (`airflow/dags/tfl_transform_dag.py:93-96`,
  * `docker-compose.override.yml:9-10,28-29`).
  *
  * Two layers, mirroring how OpenLineage integrates with Spark:
  *
  *  - [[Lineage.tracked]] — job-level START / COMPLETE / FAIL pairs with
  *    declared input/output dataset URIs, wrapped around an entry point
  *    (the analog of the reference's per-Airflow-task events). Synchronous
  *    and deterministic.
  *  - [[LineageListener]] — a `QueryExecutionListener` deriving datasets
  *    from the executed plans themselves (parquet scan root paths in,
  *    insert command output paths out), one event per Spark action. This
  *    is the "observe everything, instrument nothing" layer; events are
  *    delivered on Spark's listener bus (asynchronously, like all Spark
  *    listeners).
  *
  * Emission is a [[LineageSink]]: the environment has zero egress, so the
  * shipped sinks are in-memory / stderr; a deployment POSTs
  * [[RunEvent.toJson]] to an OpenLineage collector (e.g. Marquez) — the
  * JSON carries the OpenLineage core fields (eventType, eventTime, run,
  * job, inputs, outputs, producer).
  */
final case class RunEvent(eventType: String, runId: String, job: String,
    eventTimeMs: Long, inputs: Seq[String], outputs: Seq[String]) {

  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""; case '\\' => "\\\\"; case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def ds(xs: Seq[String]) = xs
      .map(x => s"""{"namespace":"graft","name":"${esc(x)}"}""")
      .mkString("[", ",", "]")
    s"""{"eventType":"$eventType","eventTime":"${java.time.Instant.ofEpochMilli(eventTimeMs)}",""" +
      s""""run":{"runId":"$runId"},"job":{"namespace":"graft","name":"${esc(job)}"},""" +
      s""""inputs":${ds(inputs)},"outputs":${ds(outputs)},""" +
      s""""producer":"graft-lineage"}"""
  }
}

trait LineageSink extends Serializable {
  def emit(e: RunEvent): Unit
}

/** Collecting sink for tests and local inspection. */
final class BufferSink extends LineageSink {
  private val q = new ConcurrentLinkedQueue[RunEvent]()
  def emit(e: RunEvent): Unit = { q.add(e); () }
  def events: Seq[RunEvent] = {
    import scala.jdk.CollectionConverters._
    q.asScala.toSeq
  }
}

/** HTTP transport to an OpenLineage collector (e.g. Marquez's
  * `POST /api/v1/lineage`) — the deployment wiring the reference routes
  * through `docker-compose.override.yml:9-10` / `tfl_transform_dag.py:93-96`,
  * completing S12 to deployment parity.
  *
  * Fire-and-forget with bounded retry: `emit` hands the event to
  * `HttpClient.sendAsync` and RETURNS — lineage must never be a tax on,
  * or a failure mode of, the job path. A non-2xx response or transport
  * error retries up to `maxAttempts` with linear backoff on the client's
  * delayed executor (never the caller thread); exhaustion drops the
  * event with one stderr line and counts it in [[droppedCount]].
  * [[flush]] awaits outstanding deliveries for orderly shutdown/tests.
  * The API key travels in the Authorization header only — never logged
  * (the same redaction discipline as [[graft.ingest.Http]]).
  *
  * BACKPRESSURE: at most `maxInflight` events may be awaiting delivery
  * at once — an unreachable-but-connectable collector under a high emit
  * rate would otherwise accumulate in-flight retries without bound
  * (each pins its event body + a retry chain on the client), i.e.
  * lineage could OOM the driver it exists to observe. Past the cap the
  * NEWEST event drops immediately (counted in [[droppedCount]] exactly
  * like a retry-exhausted one; logged on the first drop and every
  * 1000th — a black-holed endpoint must not turn the log into the
  * flood). Drop-newest, not block: emit() must never stall the job
  * path, and under a dead collector the oldest events are the ones a
  * recovering collector can still use to reconstruct run history.
  */
final class HttpLineageSink(endpoint: String, apiKey: Option[String] = None,
    maxAttempts: Int = 3, backoffMs: Long = 100,
    timeoutMs: Long = 5000, maxInflight: Int = 1024) extends LineageSink {
  import java.net.http.{HttpClient, HttpRequest, HttpResponse}

  @transient private lazy val client = HttpClient.newBuilder()
    .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
  @transient private lazy val inflight =
    new java.util.concurrent.atomic.AtomicInteger(0)
  @transient private lazy val droppedN =
    new java.util.concurrent.atomic.AtomicLong(0)

  def emit(e: RunEvent): Unit = {
    // increment-then-check makes the bound HARD under concurrent emits
    // (a get-then-increment race could overshoot by a thread count)
    if (inflight.incrementAndGet() > maxInflight) {
      inflight.decrementAndGet()
      val d = droppedN.incrementAndGet()
      if (d == 1 || d % 1000 == 0)
        System.err.println(s"[lineage] in-flight cap $maxInflight " +
          s"reached; dropped ${e.eventType} ${e.job} ($d dropped so far)")
    } else attempt(e, 1)
  }

  /** Events currently awaiting delivery (≤ `maxInflight` always). */
  def inflightCount: Int = inflight.get()

  private def attempt(e: RunEvent, n: Int): Unit = {
    val b = HttpRequest.newBuilder(java.net.URI.create(endpoint))
      .timeout(java.time.Duration.ofMillis(timeoutMs))
      .header("Content-Type", "application/json")
    apiKey.foreach(k => b.header("Authorization", s"Bearer $k"))
    val req = b.POST(HttpRequest.BodyPublishers.ofString(e.toJson)).build()
    client.sendAsync(req, HttpResponse.BodyHandlers.discarding())
      .whenComplete { (resp, err) =>
        val ok = err == null &&
          resp.statusCode() >= 200 && resp.statusCode() < 300
        if (ok) { inflight.decrementAndGet(); () }
        else if (n < maxAttempts)
          java.util.concurrent.CompletableFuture
            .delayedExecutor(backoffMs * n,
              java.util.concurrent.TimeUnit.MILLISECONDS)
            .execute(() => attempt(e, n + 1))
        else {
          inflight.decrementAndGet(); droppedN.incrementAndGet()
          System.err.println(s"[lineage] dropped after $maxAttempts " +
            s"attempts: ${e.eventType} ${e.job}")
        }
        ()
      }
    ()
  }

  /** Await outstanding deliveries; true when none remain in flight. */
  def flush(waitMs: Long = 10000): Boolean = {
    val deadline = System.nanoTime() + waitMs * 1000000L
    while (inflight.get() > 0 && System.nanoTime() < deadline)
      Thread.sleep(10)
    inflight.get() == 0
  }

  /** Events abandoned after `maxAttempts` failed deliveries. */
  def droppedCount: Long = droppedN.get()
}

object Lineage {

  /** Default: lineage off — emission must never be a tax on callers that
    * don't ask for it.
    */
  object NoopSink extends LineageSink {
    def emit(e: RunEvent): Unit = ()
  }

  /** Job-level tracking: emit START, run the body, emit COMPLETE (with the
    * declared datasets) or FAIL (then rethrow). One runId ties the pair.
    */
  def tracked[A](sink: LineageSink, job: String, inputs: Seq[String],
      outputs: Seq[String])(body: => A): A = {
    val runId = UUID.randomUUID().toString
    sink.emit(RunEvent("START", runId, job, System.currentTimeMillis(), inputs, Seq.empty))
    try {
      val a = body
      sink.emit(RunEvent("COMPLETE", runId, job, System.currentTimeMillis(), inputs, outputs))
      a
    } catch {
      case e: Throwable =>
        sink.emit(RunEvent("FAIL", runId, job, System.currentTimeMillis(), inputs, Seq.empty))
        throw e
    }
  }
}

/** Plan-derived per-action lineage: register via
  * `spark.listenerManager.register(new LineageListener(sink))`. Inputs are
  * the file-scan root paths of the executed plan; outputs are the insert
  * commands' destination paths. Events arrive on Spark's (async) listener
  * bus.
  */
final class LineageListener(sink: LineageSink, jobPrefix: String = "spark")
    extends QueryExecutionListener {

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    sink.emit(event("COMPLETE", funcName, qe))

  override def onFailure(funcName: String, qe: QueryExecution, error: Exception): Unit =
    sink.emit(event("FAIL", funcName, qe))

  /** File scans of a physical plan. `collect` alone is NOT enough:
    * under AQE (on by default in every engine session) the whole query sits
    * inside an `AdaptiveSparkPlanExec`, which is a LEAF node — a flat
    * collect would find no scans in any plan with an exchange, i.e. every
    * join/aggregate. Descend explicitly through AQE roots and materialized
    * query stages.
    */
  private def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] = {
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p.collect {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.map(_.toString)
    }.flatten
  }

  private def event(tpe: String, fn: String, qe: QueryExecution): RunEvent = {
    val inputs = scans(qe.executedPlan).distinct
    // v1 file writes surface as InsertIntoHadoopFsRelationCommand — on the
    // logical side for command QEs, under DataWritingCommandExec physically;
    // collect from both and dedup, whichever shape this Spark version built
    val logicalOut = qe.logical.collect {
      case c: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand =>
        c.outputPath.toString
    }
    val physicalOut = qe.executedPlan.collect {
      case d: org.apache.spark.sql.execution.command.DataWritingCommandExec =>
        d.cmd match {
          case c: org.apache.spark.sql.execution.datasources.InsertIntoHadoopFsRelationCommand =>
            Seq(c.outputPath.toString)
          case _ => Seq.empty
        }
    }.flatten
    RunEvent(tpe, UUID.randomUUID().toString, s"$jobPrefix.$fn",
      System.currentTimeMillis(), inputs, (logicalOut ++ physicalOut).distinct)
  }
}
