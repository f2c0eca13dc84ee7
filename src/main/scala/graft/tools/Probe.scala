package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe for parity hazards (SURVEY H1-H7). Not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    // H2: ns-precision timestamps
    try {
      val ev = spark.read.parquet(s"$dir/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println(s"EVENTS READ FAILED: ${e.getMessage.take(500)}") }
    // whitespace split parity probe
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq("a b  c", " lead", "trail ", "", "one").toDF("s")
    df.select($"s", split($"s", "\\s+").as("sp"), size(split($"s", "\\s+")).as("n")).show(truncate = false)
    spark.stop()
  }
}
