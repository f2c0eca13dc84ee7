package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.similarity.Ann

/** Scale-tier driver for the PERSISTED-INDEX ANN serving shape — the
  * committed evidence behind BENCH_IVF_SERVE.json:
  * `runMain graft.tools.BenchIvfServe [sfDir] [outJson]`.
  *
  * q66 amortizes the IVF build across bench sweeps implicitly (build on
  * first invocation, load after); this measures the two halves
  * EXPLICITLY at a tier, because they are different products: the build
  * (O(n·nCells) assignment + bucketed write) is a once-per-corpus
  * indexing job, the search (probe-cell explode + bucketed join +
  * per-query top-k) is the repeated serving cost a 100 TB deployment
  * actually pays per query batch. Also gates that serving from the
  * persisted index is BIT-IDENTICAL to searching the just-built
  * in-memory index — the round-trip through the bucketed table loses
  * nothing.
  */
object BenchIvfServe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val outPath = if (args.length > 1) args(1) else "BENCH_IVF_SERVE.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") % 10 === 0)
    val name = s"graft_ivfserve_${Tables.fingerprint(spark, s"$sfDir/embeddings.parquet")}"
    def timed(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    // build + persist: the once-per-corpus indexing job
    var built: Ann.IvfIndex = null
    val buildWall = timed {
      built = Ann.buildIvfIndex(emb, nCells0 = 0, refineIters = 0)
      Ann.writeIvfIndex(built, name)
    }
    // search-only: load the bucketed index, run the query batch. Twice —
    // the second run is the steady-state serving wall (JIT/codegen warm,
    // same plans a long-lived serving session reuses).
    def searchOnly(): org.apache.spark.sql.DataFrame =
      Ann.searchIvf(Ann.loadIvfIndex(spark, name), queries, k = 5)
    val searchWallCold = timed {
      searchOnly().write.format("noop").mode("overwrite").save()
    }
    val searchWallWarm = timed {
      searchOnly().write.format("noop").mode("overwrite").save()
    }
    // bit-identical gate: serving from the persisted index ≡ searching
    // the in-memory index that was just built
    val fromDisk = searchOnly().select("qid", "nid", "sim", "rn")
    val fromMem = Ann.searchIvf(built, queries, k = 5)
      .select("qid", "nid", "sim", "rn")
    val identical = fromDisk.exceptAll(fromMem).isEmpty &&
      fromMem.exceptAll(fromDisk).isEmpty
    val rows = fromDisk.count()
    val nVecs = emb.count(); val nQueries = queries.count()

    val line =
      s"""{"sf":"$sfDir","vectors":$nVecs,"queries":$nQueries,"k":5,""" +
      s""""build_wall_s":${f"$buildWall%.3f"},""" +
      s""""search_wall_cold_s":${f"$searchWallCold%.3f"},""" +
      s""""search_wall_warm_s":${f"$searchWallWarm%.3f"},""" +
      s""""result_rows":$rows,"disk_equals_mem":$identical}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    require(identical, "persisted-index search must be bit-identical")
    spark.stop()
  }
}
