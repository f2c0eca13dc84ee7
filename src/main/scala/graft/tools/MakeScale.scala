package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool — `runMain graft.tools.MakeScale <srcSfDir> <dstDir> [factor]`.
  *
  * Scales the LLM-pipeline tables (`documents`, `embeddings`) by `factor`
  * (default 10, sf0.1 → sf1) for scale benching, DETERMINISTICALLY and
  * with the fixture's near-dup STRUCTURE preserved rather than inflated:
  *
  *  - naive replication would make every document an exact-dup cluster of
  *    `factor` copies — candidate-pair counts in the dedup family would
  *    grow ~factor² and the "benchmark" would measure a workload no real
  *    corpus has. Instead each replica k perturbs every (k+2)-th token
  *    (position-keyed), which (a) keeps each WITHIN-replica near-dup pair
  *    a near-dup — both members get the identical positional edit — and
  *    (b) pushes CROSS-replica Jaccard down to ~0.5, far below the 0.8
  *    thresholds, so the scaled corpus has `factor`× the docs and
  *    `factor`× the near-dup pairs: linear growth, the honest scale test.
  *  - embeddings get a per-replica diagonal distortion
  *    (x_j · (1 + 0.3·sin(j + k))): within-replica cosines are nearly
  *    preserved (same diagonal both sides), cross-replica cosines drop
  *    ~0.96 < the 0.99 near-dup threshold.
  *
  * Replica 0 is the untouched original. Ids offset by k·10⁷ (fixture ids
  * are ≪ 10⁷). Everything is column-expression work — no driver loops —
  * so the same tool generates sf10/sf100 on a cluster by changing
  * `factor`.
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: MakeScale <srcSfDir> <dstDir> [factor]")
    val (src, dst) = (args(0), args(1))
    val factor = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    graft.core.GraftSession.tune(spark)
    spark.sparkContext.setLogLevel("ERROR")

    val ks = explode(sequence(lit(0), lit(factor - 1))).as("k")

    val docs = spark.read.parquet(s"$src/documents.parquet")
    val toks = split(trim(col("text")), "\\s+")
    val perturbed = array_join(
      zip_with(toks, sequence(lit(0), size(toks) - 1),
        (t, j) => when((j + col("k")) % (col("k") + 2) === 0,
          concat(t, lit("_"), col("k"))).otherwise(t)),
      " ")
    docs.select(col("*"), ks)
      .select(
        (col("k") * 10000000L + col("doc_id")).as("doc_id"),
        when(col("k") === 0, col("text")).otherwise(perturbed).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/documents.parquet")

    val embs = spark.read.parquet(s"$src/embeddings.parquet")
    embs.select(col("*"), ks)
      .select(
        (col("k") * 10000000L + col("vec_id")).as("vec_id"),
        zip_with(col("embedding"),
            sequence(lit(0), size(col("embedding")) - 1),
          (x, j) => (x.cast("double") *
            (lit(1.0) + lit(0.3) * sin(j.cast("double") + col("k"))))
            .cast("float")).as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode(SaveMode.Overwrite).parquet(s"$dst/embeddings.parquet")

    // Relational star schema, FK-CONSISTENTLY: every key column in a
    // replica gets the same k·10⁷ offset, so joins land exactly as in the
    // source (each replica is a disjoint consistent sub-universe — the
    // "more tenants" scale model). Dimension leaves (region, nation) stay
    // as-is: real fact growth does not mint new countries. events keeps
    // its timestamps (denser traffic per hour, the realistic stream
    // scale-up) and offsets its ids.
    val keyCols = Map(
      "customer" -> Seq("c_custkey"),
      "supplier" -> Seq("s_suppkey"),
      "part" -> Seq("p_partkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "events" -> Seq("event_id", "user_id"))

    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      df.select(col("*"), ks)
        .select(df.columns.map(c =>
          if (keys.contains(c)) (col(c) + col("k") * 10000000L).as(c)
          else col(c)): _*)
        .repartition(32)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    }

    val counts = (Seq("documents", "embeddings") ++ keyCols.keys)
      .map(t => s"$t=${spark.read.parquet(s"$dst/$t.parquet").count()}")
    println(s"[makescale] wrote $dst at factor $factor: ${counts.mkString(" ")}")
    spark.stop()
  }
}
