package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{DedupStream, IdempotentSink}

/** Streaming exact dedup against the persisted fingerprint ledger:
  * first-seen-across-all-batches wins, restarts add nothing, and the
  * crash window between the survivor commit and the ledger commit
  * replays to the identical result.
  */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String) = Files.createTempDirectory(tag).toString

  test("3 waves with cross-wave overlap: first occurrence wins, restart adds nothing") {
    val root = freshDir("graft-dedup-stream")
    val in = s"$root/in"; val out = s"$root/out"
    val ledger = s"$root/ledger"; val ckpt = s"$root/ckpt"
    // wave 0: a, b; wave 1: b (dup of wave 0), c, c (batch-internal dup);
    // wave 2: a (dup), d — normalization collapses "  b " onto b's fp
    val waves = Seq(
      Seq((0L, "a doc"), (1L, "b doc")),
      Seq((10L, "  b   doc "), (11L, "c doc"), (12L, "c doc")),
      Seq((20L, "a doc"), (21L, "d doc")))
    def runCycle(): Unit = {
      val q = spark.readStream.schema("doc_id long, text string")
        .parquet(s"$in/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(DedupStream.writer(out, ledger, "text", "doc_id"))
        .start()
      assert(q.awaitTermination(120000), "query did not terminate")
      assert(q.exception.isEmpty, s"stream failed: ${q.exception}")
    }
    waves.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").write.parquet(s"$in/wave$i")
      runCycle() // fresh AvailableNow query per wave = kill-and-restart
    }
    val got = IdempotentSink.readCommitted(spark, out)
      .select("keep_id", "n_dups").as[(Long, Long)].collect().toMap
    // survivors: first wave that saw each fingerprint, min id within it,
    // n_dups counts within the ADMITTING batch only
    assert(got == Map(0L -> 1L, 1L -> 1L, 11L -> 2L, 21L -> 1L),
      s"unexpected survivors: $got")
    // ledger holds exactly the admitted fingerprints
    assert(DedupStream.ledgerFps(spark, ledger).distinct().count() == 4)
    // restart with no new input: no new batches, nothing appended
    val batches = IdempotentSink.committedBatches(spark, out)
    runCycle()
    assert(IdempotentSink.committedBatches(spark, out) == batches)
    assert(IdempotentSink.readCommitted(spark, out).count() == 4)
  }

  test("crash between survivor commit and ledger commit replays identically") {
    val root = freshDir("graft-dedup-crash")
    val out = s"$root/out"; val ledger = s"$root/ledger"
    val w = DedupStream.writer(out, ledger, "text", "doc_id")
    w(Seq((0L, "x"), (1L, "y")).toDF("doc_id", "text"), 0L)
    // simulate the crash window: batch 1 committed its survivors but died
    // before the ledger commit — wipe ledger batch 1 and its marker
    w(Seq((2L, "y"), (3L, "z")).toDF("doc_id", "text"), 1L)
    val fs = new org.apache.hadoop.fs.Path(ledger)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$ledger/_committed-1"), false))
    assert(fs.delete(new org.apache.hadoop.fs.Path(s"$ledger/batch=1"), true))
    // replay of batchId 1 (same data, per the streaming replay contract):
    // survivors skip on their marker, ledger batch is rebuilt identically
    w(Seq((2L, "y"), (3L, "z")).toDF("doc_id", "text"), 1L)
    val survivors = IdempotentSink.readCommitted(spark, out)
      .select("keep_id").as[Long].collect().toSet
    assert(survivors == Set(0L, 1L, 3L), "y admitted once (batch 0), z once")
    assert(DedupStream.ledgerFps(spark, ledger).count() == 3)
    // and a full replay of both commits is a pure no-op
    w(Seq((2L, "y"), (3L, "z")).toDF("doc_id", "text"), 1L)
    assert(IdempotentSink.readCommitted(spark, out).count() == 3)
    assert(DedupStream.ledgerFps(spark, ledger).count() == 3)
  }
}
