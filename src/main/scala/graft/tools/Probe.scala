package graft.tools

import java.time.Instant

import org.apache.spark.sql.SparkSession

import graft.ingest.{Http, SyntheticArrivals}

/** Dev probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val t0 = Instant.parse("2025-11-20T10:00:00Z")
    val transport = SyntheticArrivals.transport(t0)
    val body = transport("https://api.tfl.gov.uk/StopPoint/940GZZLUTS01/Arrivals").body
    println(s"BODY(first 400): ${body.take(400)}")
    println(s"BODY length: ${body.length}")
    val snap = SyntheticArrivals.snapshot(t0)
    println(s"snapshot rows: ${snap.size}, first: ${snap.headOption}")

    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.GraftSession.tune(spark)
    val df = graft.jobs.Jobs.fetchArrivals(spark, transport)
    println(s"fetchArrivals count (tuned): ${df.count()}")
    val tmp = java.nio.file.Files.createTempDirectory("probe-raw").toString
    val n = graft.jobs.Jobs.ingest(spark, tmp, t0, transport)
    println(s"ingest returned: $n")
    println("raw files: " + new java.io.File(tmp).listFiles().toSeq)
    spark.stop()
  }
}
