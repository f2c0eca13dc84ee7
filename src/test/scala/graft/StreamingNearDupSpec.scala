package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{IdempotentSink, NearDupStream}

/** Streaming near-dup admission: cross-wave rejection against the
  * admitted ledgers, within-batch smaller-id tie-break, kill/restart
  * adds nothing, and the crash window between verdict and ledger
  * commits replays identically — [[StreamingDedupSpec]]'s proof shape
  * on the near-dup operator.
  */
class StreamingNearDupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String) = Files.createTempDirectory(tag).toString

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest before the sun sets tonight"
  private val nearDup = base.replace("green", "dark")
  private val other = "completely different words about spark engines " +
    "processing massive parquet datasets with shuffles joins and windows"
  private val otherNear = other.replace("windows", "sinks")

  test("3 waves: ledger rejection, within-batch tie-break, restart no-op") {
    val root = freshDir("graft-neardup-stream")
    val in = s"$root/in"; val out = s"$root/out"
    val bands = s"$root/bands"; val sets = s"$root/sets"
    val ckpt = s"$root/ckpt"
    // wave 0: base + other admitted; wave 1: near-dup of base (reject vs
    // ledger) + a fresh doc and its within-batch near-dup (smaller id
    // admitted, larger rejected); wave 2: near-dup of the wave-1 ADMITTED
    // doc — proves wave-1 admissions entered the ledger
    val fresh = "entirely novel content mentioning trains stations and " +
      "platforms arriving every few minutes across the network tonight"
    val freshNear = fresh.replace("minutes", "moments")
    val waves = Seq(
      Seq((0L, base), (1L, other)),
      Seq((10L, nearDup), (11L, fresh), (12L, freshNear)),
      Seq((20L, fresh.replace("network", "district"))))
    def runCycle(): Unit = {
      val q = spark.readStream.schema("doc_id long, text string")
        .parquet(s"$in/*")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(NearDupStream.writer(out, bands, sets,
          "text", "doc_id", threshold = 0.5))
        .start()
      assert(q.awaitTermination(120000), "query did not terminate")
      assert(q.exception.isEmpty, s"stream failed: ${q.exception}")
    }
    waves.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("doc_id", "text").write.parquet(s"$in/wave$i")
      runCycle() // fresh AvailableNow query per wave = kill-and-restart
    }
    val got = NearDupStream.verdicts(spark, out)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Boolean]("admitted"),
          Option(r.getAs[java.lang.Long]("first_match")).map(_.toLong))))
      .toMap
    assert(got(0L) == ((true, None)) && got(1L) == ((true, None)),
      s"wave-0 docs admitted: $got")
    assert(got(10L) == ((false, Some(0L))),
      s"near-dup of admitted base rejected with its match: $got")
    assert(got(11L) == ((true, None)), s"fresh doc admitted: $got")
    assert(got(12L) == ((false, Some(11L))),
      s"within-batch near-dup rejected toward the smaller id: $got")
    assert(got(20L) == ((false, Some(11L))),
      s"wave-2 near-dup of the wave-1 ADMISSION rejected: $got")
    // ledgers hold exactly the admitted docs' rows
    assert(NearDupStream.ledgerSets(spark, sets)
      .select("id").as[Long].collect().toSet == Set(0L, 1L, 11L))
    assert(NearDupStream.ledgerBands(spark, bands)
      .select("id").distinct().as[Long].collect().toSet == Set(0L, 1L, 11L))
    // restart with no new input: nothing appended anywhere
    val batches = IdempotentSink.committedBatches(spark, out)
    runCycle()
    assert(IdempotentSink.committedBatches(spark, out) == batches)
    assert(NearDupStream.verdicts(spark, out).count() == 6)
  }

  test("crash between verdict commit and ledger commits replays identically") {
    val root = freshDir("graft-neardup-crash")
    val out = s"$root/out"; val bands = s"$root/bands"; val sets = s"$root/sets"
    val w = NearDupStream.writer(out, bands, sets, "text", "doc_id", 0.5)
    w(Seq((0L, base)).toDF("doc_id", "text"), 0L)
    w(Seq((1L, other), (2L, nearDup)).toDF("doc_id", "text"), 1L)
    val fs = new org.apache.hadoop.fs.Path(bands)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window: batch 1's verdict committed, both ledgers died
    for (dir <- Seq(bands, sets)) {
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/_committed-1"), false))
      assert(fs.delete(new org.apache.hadoop.fs.Path(s"$dir/batch=1"), true))
    }
    // replay: verdict skips on its marker, ledgers rebuild identically —
    // the recompute sees the same COMMITTED (batch-0) ledgers
    w(Seq((1L, other), (2L, nearDup)).toDF("doc_id", "text"), 1L)
    val admitted = NearDupStream.verdicts(spark, out)
      .filter(org.apache.spark.sql.functions.col("admitted"))
      .select("doc_id").as[Long].collect().toSet
    assert(admitted == Set(0L, 1L), s"base once, other once: $admitted")
    assert(NearDupStream.ledgerSets(spark, sets)
      .select("id").as[Long].collect().toSet == Set(0L, 1L))
    // a third near-dup arriving later is rejected against the rebuilt ledger
    w(Seq((3L, otherNear)).toDF("doc_id", "text"), 2L)
    val v3 = NearDupStream.verdicts(spark, out)
      .filter(org.apache.spark.sql.functions.col("doc_id") === 3L).head()
    assert(!v3.getAs[Boolean]("admitted") && v3.getAs[Long]("first_match") == 1L)
  }
}
