package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe — not part of the engine API. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.tune(spark)
    graft.core.Tables.registerAll(spark, "/root/testdata/sf0.001")
    // happy path through the SQL surface of the registered expressions
    spark.sql(
      """SELECT vec_id, float_vec_dot(embedding, embedding) AS n2,
        |  simhash64(array('a','b')) AS sh,
        |  minhash_sig(array('a','b'))[0] AS mh
        |FROM embeddings LIMIT 2""".stripMargin).show(false)
    // wrong types
    try spark.sql("SELECT float_vec_dot(1, 2)").show()
    catch { case e: Throwable => println(s"TYPE-ERR OK: ${e.getMessage.linesIterator.next()}") }
    // wrong arity
    try spark.sql("SELECT simhash64()").show()
    catch { case e: Throwable => println(s"ARITY-ERR OK: ${e.getMessage.linesIterator.next()}") }
    // null input
    spark.sql("SELECT float_vec_dot(cast(null as array<float>), array(cast(1.0 as float))) AS d").show()
    spark.stop()
  }
}
