package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.SemanticDedup
import graft.similarity.Ann

/** Centroid-drift maintenance at scale — the committed evidence behind
  * BENCH_IVF_RETRAIN.json:
  * `runMain graft.tools.BenchIvfRetrain [sfDir] [outJson]`.
  *
  * The claim this artifact pins: a drifted corpus concentrates in IVF
  * cells the original centroid draw never anticipated — exactly the
  * distinct²-per-cell exposure of the within-cell pairwise operators
  * (semanticAdmit, the semantic wave fold) — and
  * [[SemanticDedup.retrainRemap]] re-spreads it: centroids redrawn from
  * the CURRENT reps ledger + one exact-decimal Lloyd step, every rep
  * remapped through the new table.
  *
  * Protocol: the even-id half of `embeddings` is the pre-drift corpus
  * the v0 draw trains on (an id-RANGE split would be skewed by
  * MakeScale's sparse 10M-offset id space); the odd-id half is PLANTED
  * DRIFT — each vector pulled halfway toward one fixed pivot direction,
  * a ~60° cone v0 has at most a couple of centroids near (so the drift
  * mass piles into them) but wide enough that a redraw separates it (a
  * 0.9 pull was measured unseparable: within a ~5° cone the argmax is
  * decided by each centroid's own axis angle, so one centroid wins
  * globally no matter how many are drawn). Occupancy is measured per
  * cell over the reps before and after retrain; gates (required): the
  * remap is idempotent (remapping the remapped reps through the same
  * table changes nothing — the property the compaction-replay heal leans
  * on), rep count is preserved, and max occupancy drops by ≥ 3×.
  */
object BenchIvfRetrain {

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/testdata/sf10")
    val outPath = if (args.length > 1) args(1) else "BENCH_IVF_RETRAIN.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = emb.count()
    val pivot = emb.orderBy("vec_id").select("embedding").head()
      .getSeq[Float](0)
    // planted drift: the odd-id half pulled halfway toward the pivot
    val preDrift = emb.filter(pmod(col("vec_id"), lit(2)) === 0)
    val drifted = emb.filter(pmod(col("vec_id"), lit(2)) === 1)
      .select(col("vec_id"),
        zip_with(col("embedding"), typedLit(pivot),
          (a, b) => (a * lit(0.5f)) + (b * lit(0.5f))).as("embedding"))
    val corpus = preDrift.unionByName(drifted)

    // v0: the draw the PRE-DRIFT corpus trained (one Lloyd step, like a
    // production build); reps = the full drifted corpus assigned under it
    val cent0 = Ann.retrainCentroids(preDrift, refineIters = 1)
    val reps0 = Ann.indexWithCentroids(corpus, cent0.select("cell", "cvec"))
      .assigned
      .select(col("cell"), col("nid").as("rep"), col("ce"), col("cn2"))
      .persist()

    def occStats(reps: DataFrame): (Long, Long, Double, Seq[Long]) = {
      val occ = reps.groupBy("cell").agg(count(lit(1)).as("cnt")).persist()
      val row = occ.agg(count(lit(1)), max("cnt"), avg("cnt")).head()
      val top = occ.orderBy(col("cnt").desc).limit(10)
        .select("cnt").collect().map(_.getLong(0)).toSeq
      occ.unpersist()
      (row.getLong(0), row.getLong(1), row.getDouble(2), top)
    }
    val (cellsB, maxB, meanB, topB) = occStats(reps0)

    val ((cent1, remapped0), wRetrain) =
      timed(SemanticDedup.retrainRemap(reps0, refineIters = 1))
    val remapped = remapped0.persist()
    val nReps = remapped.count()
    val (cellsA, maxA, meanA, topA) = occStats(remapped)

    // gates: remap idempotence + rep preservation
    val again = SemanticDedup.remapRepsTo(remapped, cent1.select("cell", "cvec"))
      .select("rep", "cell")
    val diff = remapped.select("rep", "cell").exceptAll(again).count() +
      again.exceptAll(remapped.select("rep", "cell")).count()
    val nReps0 = reps0.count()

    def arr(xs: Seq[Long]) = xs.mkString("[", ",", "]")
    val line =
      s"""{"sf":"$sfDir","vectors":$n,"reps":$nReps,""" +
      s""""before":{"cells":$cellsB,"max_occupancy":$maxB,""" +
      s""""mean_occupancy":${f"$meanB%.1f"},"top10":${arr(topB)}},""" +
      s""""after":{"cells":$cellsA,"max_occupancy":$maxA,""" +
      s""""mean_occupancy":${f"$meanA%.1f"},"top10":${arr(topA)}},""" +
      s""""retrain_remap_s":${f"$wRetrain%.3f"},""" +
      s""""remap_idempotent_diff":$diff,"reps_preserved":${nReps == nReps0}}"""
    println(line)
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (line + "\n").getBytes("UTF-8"))
    require(diff == 0, "remap must be idempotent through the committed table")
    require(nReps == nReps0, s"remap must preserve reps: $nReps0 -> $nReps")
    require(maxA * 3 <= maxB,
      s"retrain must rebalance the drift cone: max $maxB -> $maxA")
    spark.stop()
  }
}
