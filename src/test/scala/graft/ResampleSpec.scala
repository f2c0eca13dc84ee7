package graft

import java.time.LocalDateTime

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

import graft.etl.Resample

/** Golden gap-fill semantics on a constructed stream: dense spine, zero
  * counts in silent hours, forward fill across the gap.
  */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("hourly gap-fill: dense spine, zero-fill, forward fill across gaps") {
    val t = LocalDateTime.of(2026, 3, 1, 10, 15, 0)
    val df = Seq(
      ("a", t), ("a", t.plusMinutes(10)),       // 10:xx -> 2 events
      ("a", t.plusHours(3)),                    // 13:xx -> 1 event; 11,12 silent
      ("b", t)).toDF("k", "ts")
    val out = Resample.hourlyGapFill(df, "k", "ts")
      .orderBy("k", "hour").collect()
    val a = out.filter(_.getString(0) == "a")
    assert(a.length == 4, "hours 10..13 inclusive")
    assert(a.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 0L, 0L, 1L))
    assert(a.map(_.getAs[Long]("last_seen_n")).toSeq == Seq(2L, 2L, 2L, 1L),
      "silent hours carry the last observation, not zero")
    val b = out.filter(_.getString(0) == "b")
    assert(b.length == 1 && b.head.getAs[Long]("n_events") == 1L)
    // spine hours are exact hour buckets
    assert(a.forall(r => r.getAs[LocalDateTime]("hour").getMinute == 0))
  }
}
