package graft

import java.nio.file.Files
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.SyntheticArrivals
import graft.jobs.Jobs
import graft.lineage.{BufferSink, Lineage, LineageListener, RunEvent}

/** OpenLineage-shaped emission (SURVEY S12): one START/COMPLETE run-event
  * pair per tracked job carrying dataset URIs, FAIL on error, and the
  * plan-derived per-action listener.
  */
class LineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val t0 = Instant.parse("2025-11-20T10:00:00Z")

  test("transform emits one START/COMPLETE pair with dataset URIs") {
    val root = Files.createTempDirectory("graft-lineage").toString
    val raw = s"$root/raw"
    Jobs.ingest(spark, raw, t0, SyntheticArrivals.transport(t0))
    val sink = new BufferSink
    Jobs.transform(spark, raw, s"$root/silver", lineage = sink)

    val es = sink.events
    assert(es.map(_.eventType) == Seq("START", "COMPLETE"),
      s"exactly one ordered pair, got ${es.map(_.eventType)}")
    assert(es.map(_.runId).distinct.size == 1, "one runId ties the pair")
    assert(es.forall(_.job == "graft.transform"))
    assert(es.head.eventTimeMs <= es.last.eventTimeMs)
    val done = es.last
    assert(done.inputs == Seq(raw))
    assert(done.outputs == Seq(s"$root/silver/stg_arrivals", s"$root/silver/fct_headways"))
    // the JSON carries the OpenLineage core fields
    val json = done.toJson
    Seq("\"eventType\":\"COMPLETE\"", "\"run\":{\"runId\":", "\"job\":",
      "\"inputs\":", "\"outputs\":", "\"producer\":\"graft-lineage\"")
      .foreach(f => assert(json.contains(f), s"missing $f in $json"))
  }

  test("a failing job emits START then FAIL and rethrows") {
    val sink = new BufferSink
    intercept[RuntimeException] {
      Lineage.tracked(sink, "boom", Seq("in"), Seq("out")) {
        throw new RuntimeException("boom")
      }
    }
    assert(sink.events.map(_.eventType) == Seq("START", "FAIL"))
    assert(sink.events.map(_.runId).distinct.size == 1)
  }

  test("listener derives datasets from the executed plan (scan in, insert out)") {
    val root = Files.createTempDirectory("graft-lineage-listener").toString
    import spark.implicits._
    Seq((1, "a"), (2, "b")).toDF("id", "v").write.parquet(s"$root/src")

    val sink = new BufferSink
    val listener = new LineageListener(sink)
    spark.listenerManager.register(listener)
    try {
      spark.read.parquet(s"$root/src").filter($"id" > 0)
        .write.parquet(s"$root/dst")
      // listener-bus delivery is async — poll briefly
      def hit: Option[RunEvent] = sink.events.find(e =>
        e.eventType == "COMPLETE" &&
          e.inputs.exists(_.contains("src")) &&
          e.outputs.exists(_.contains("dst")))
      val deadline = System.currentTimeMillis() + 15000
      while (hit.isEmpty && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(hit.isDefined,
        s"expected a COMPLETE event with src input and dst output, got ${sink.events}")
    } finally spark.listenerManager.unregister(listener)
  }
}
