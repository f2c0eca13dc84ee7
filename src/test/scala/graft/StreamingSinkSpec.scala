package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.IdempotentSink

/** Exactly-once contract of the idempotent foreachBatch sink: replayed
  * batchIds never duplicate rows, a crash before the commit rename leaves
  * no visible data, and the end-to-end stream restart adds nothing.
  */
class StreamingSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String) = Files.createTempDirectory(tag).toString

  test("replayed batchId is skipped — no duplicates, first write wins") {
    val out = freshDir("graft-sink")
    val w = IdempotentSink.writer(out)
    w(Seq(1, 2, 3).toDF("x"), 7L)
    // the replay after a post-commit failure re-sends the SAME batch data;
    // a different frame here just proves the skip is on batchId, not data
    w(Seq(4, 5, 6, 7).toDF("x"), 7L)
    val got = spark.read.parquet(out)
    assert(got.count() == 3)
    assert(got.select(sum($"x")).head().getLong(0) == 6L)
  }

  test("crash before rename leaves nothing visible; retry completes cleanly") {
    val out = freshDir("graft-sink")
    // simulate attempt 1 dying after the scratch write, before the rename
    Seq(9, 9).toDF("x").write.parquet(s"$out/.inflight-3")
    // nothing visible: no committed batch=* dir exists yet (dot-dirs are
    // invisible to Spark's file index by default)
    assert(!new java.io.File(out).listFiles().exists(_.getName.startsWith("batch=")))
    IdempotentSink.writer(out)(Seq(1, 2).toDF("x"), 3L)
    val got = spark.read.parquet(out)
    assert(got.count() == 2, "retry must overwrite the dead scratch dir")
    assert(new java.io.File(s"$out/.inflight-3").exists() == false)
  }

  test("dest dir without commit marker is rebuilt — object-store partial-rename case") {
    val out = freshDir("graft-sink")
    // simulate a crash mid-"rename" on an object store: batch=5 exists,
    // half-populated, but the marker (written last) never landed
    Seq(9).toDF("x").write.parquet(s"$out/batch=5")
    assert(IdempotentSink.committedBatches(spark, out).isEmpty)
    IdempotentSink.writer(out)(Seq(1, 2, 3).toDF("x"), 5L)
    assert(IdempotentSink.committedBatches(spark, out) == Seq(5L))
    val got = spark.read.parquet(out)
    assert(got.count() == 3, "unmarked partial dest must be replaced, not trusted")
    // and now that the marker exists, a replay is a no-op
    IdempotentSink.writer(out)(Seq(7, 8).toDF("x"), 5L)
    assert(spark.read.parquet(out).count() == 3)
    assert(IdempotentSink.readCommitted(spark, out).count() == 3)
  }

  test("stream restart over the same checkpoint appends nothing") {
    val root = freshDir("graft-sink-e2e")
    Seq(1, 2, 3).toDF("x").write.parquet(s"$root/in/a")
    Seq(4, 5).toDF("x").write.parquet(s"$root/in/b")
    def run(): Unit = {
      val q = spark.readStream.schema("x int").parquet(s"$root/in/*")
        .writeStream
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(Trigger.AvailableNow())
        .foreachBatch(IdempotentSink.writer(s"$root/out"))
        .start()
      q.awaitTermination(60000)
      assert(q.exception.isEmpty, s"stream failed: ${q.exception}")
    }
    run()
    val first = spark.read.parquet(s"$root/out").count()
    assert(first == 5)
    run() // restart: no new files → no new batches → no new rows
    assert(spark.read.parquet(s"$root/out").count() == first)
    // batch is a discoverable partition column for downstream pruning
    assert(spark.read.parquet(s"$root/out").columns.contains("batch"))
  }
}
