package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    // GraftExtensions via the spark-submit path: functions must resolve in
    // SQL without any programmatic registration.
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sql(
      """SELECT float_vec_dot(array(cast(1.0 as float), cast(2.0 as float)),
        |                     array(cast(3.0 as float), cast(4.0 as float))) AS dot,
        |  simhash64(array('a','b','c')) AS sh,
        |  sorted_intersect_count(array(1L,2L,5L), array(2L,3L,5L)) AS ic,
        |  size(shingle_set(array('w1','w2','w3','w4'))) AS nsh,
        |  minhash_tokens(array('w1','w2','w3','w4'))[0] AS mh
        |""".stripMargin).show(false)
    println("DESCRIBE: " + spark.sql("DESCRIBE FUNCTION float_vec_dot")
      .collect().map(_.getString(0)).mkString(" | "))
    spark.stop()
  }
}
