package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.FloatVecDot

/** Distributed Lloyd k-means over an embedding column with EXACT,
  * engine-independent arithmetic end to end — the clustering operator a
  * training-data pipeline leans on (cluster-balanced sampling, SemDeDup
  * cells, prototype selection), in a form a plain SQL engine reproduces
  * bit-for-bit so the whole fit is oracle-hash-gatable:
  *
  *  - init = [[Ann.strideCentroids]] (every stride-th id, nothing
  *    hash-seeded — q66/q91/q102's proven engine-independent draw);
  *  - assignment = the native [[graft.functions.IvfArgmaxCell]] codegen
  *    kernel (argmax cosine, left-to-right double accumulation, ties to
  *    the highest cell — the spec-pinned parity contract);
  *  - means = INTEGER-MICRO sums: each component quantizes to
  *    `floor(x·10⁶ + 0.5)` (identical IEEE double ops in Spark and SQL)
  *    and the per-(cell, dim) mean is one exact long sum divided once —
  *    integer partial aggregation is ORDER-INDEPENDENT, so the fit is
  *    deterministic at any parallelism AND reproducible in DuckDB, where
  *    a float `avg` would drift in its last bits per partition order.
  *    (Same move as [[Ann.lloydStep]]'s decimal sums, but integer micros
  *    make the cross-engine story airtight: no decimal rounding-mode
  *    parity to defend.) Empty cells keep their previous centroid.
  *
  * Scale shape (100 TB): per iteration, assignment is one narrow
  * projection (no join/shuffle — the ≤√n centroid table ships as a plan
  * literal) and the mean is one partial-agg shuffle of (cell, dim, long)
  * triples — map-side combine absorbs the corpus, the reduce side is
  * nCells·dim rows. The per-iteration centroid table is collected
  * ([[Ann.materialize]]) — ~√n rows, the same bounded-driver contract as
  * the IVF build.
  */
object KMeans {

  /** `floor(x·10⁶ + 0.5)` as long — the portable quantizer. Float→double
    * is exact, and the remaining three double ops are IEEE-identical in
    * Spark and DuckDB, so both engines land the same integer.
    */
  private def micros(x: Column): Column =
    floor(x.cast("double") * lit(1e6) + lit(0.5)).cast("long")

  /** One Lloyd iteration: kernel assignment → integer-micro means.
    * Returns the next (cell, cvec) table; empty cells carry forward.
    */
  private[similarity] def step(corpus: DataFrame, cent: DataFrame): DataFrame = {
    val assigned = Ann.assign(corpus, cent).select(col("cell"), col("ce"))
    val means = assigned
      .select(col("cell"), posexplode(col("ce")).as(Seq("dim", "x")))
      .groupBy("cell", "dim")
      .agg(sum(micros(col("x"))).as("sq"), count(lit(1)).as("cn"))
      // one exact integer sum, one division, one float round-trip — the
      // division order (sum/n first, then /1e6) is part of the contract
      .withColumn("m",
        (col("sq").cast("double") / col("cn").cast("double") / lit(1e6))
          .cast("float"))
      .groupBy("cell")
      .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
        e => e.getField("m")).as("cvec"))
    cent.select(col("cell"), col("cvec").as("old_cvec"))
      .join(means, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("cvec"), col("old_cvec")).as("cvec"))
  }

  /** Fit `iters` Lloyd iterations from the stride draw and return the
    * final assignment: one row per vector with its cluster id, cosine to
    * the final centroid, and cluster size.
    */
  def kmeans(corpus: DataFrame, iters: Int = 2): DataFrame = {
    val init = Ann.materialize(Ann.strideCentroids(corpus))
    val cent = (1 to iters).foldLeft(init)((c, _) =>
      Ann.materialize(step(corpus, c)))
    val withN = cent.select(col("cell"), col("cvec"),
      FloatVecDot.norm2(col("cvec")).as("cvn2"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("cell")
    // sim re-derives the kernel's winning value declaratively: same
    // dot / (sqrt·sqrt) shape as the searchIvf scoring path
    Ann.assign(corpus, cent)
      .join(broadcast(withN), Seq("cell"))
      .select(col("nid").as("vec_id"), col("cell"),
        (FloatVecDot.dot(col("ce"), col("cvec")) /
          (sqrt(col("cn2")) * sqrt(col("cvn2")))).as("sim"))
      .withColumn("csize", count(lit(1)).over(w))
  }
}
