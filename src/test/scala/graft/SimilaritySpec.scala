package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Tables
import graft.similarity.{Ann, VectorFunctions}

/** Correctness of exact top-k and recall of the LSH scale path on the real
  * embeddings fixture.
  */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("cosine column: hand-checked values") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(0.5f, 0.25f, 0.125f)))
      .toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).head().getDouble(0)
    val exp = (1 * 0.5 + 2 * 0.25 + 3 * 0.125) /
      (math.sqrt(1 + 4 + 9) * math.sqrt(0.25 + 0.0625 + 0.015625))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("brute-force top-k: k rows per query, descending sim, no self") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val r = Ann.bruteForceTopK(emb, emb.filter(col("vec_id") % 50 === 0), k = 5)
      .collect()
    val byQ = r.groupBy(_.getAs[Long]("qid"))
    assert(byQ.forall(_._2.length == 5))
    byQ.values.foreach { rows =>
      val sims = rows.sortBy(_.getAs[Int]("rn")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
      rows.foreach(row => assert(row.getAs[Long]("qid") != row.getAs[Long]("nid")))
    }
  }

  test("LSH top-k: recall vs exact baseline on fixture embeddings") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Ann.bruteForceTopK(emb, queries, k = 5))
    val approx = pairs(Ann.lshTopK(emb, queries, k = 5))
    val recall = (exact & approx).size.toDouble / exact.size
    // banded sign-projection LSH on 64-dim UNIFORM random embeddings (the
    // worst case for LSH): modest recall is expected; the point is the
    // candidate machinery works end-to-end and the floor pins regressions
    assert(recall >= 0.3, s"recall=$recall")
    assert(approx.nonEmpty)
  }

  test("LSH top-k data-planes: recall floor and replay determinism (q41 path)") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Ann.bruteForceTopK(emb, queries, k = 5))
    val a = pairs(Ann.lshTopKDataPlanes(emb, queries, k = 5))
    val b = pairs(Ann.lshTopKDataPlanes(emb, queries, k = 5))
    // stride-drawn corpus vectors as plane normals must behave like the
    // seeded planes: same recall floor, and (being engine-independent)
    // bit-replayable across runs — the property q41's DuckDB oracle gates
    assert(a == b, "data-plane draw must be deterministic")
    val recall = (exact & a).size.toDouble / exact.size
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("IVF top-k: recall vs exact baseline; deterministic across runs") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def pairs(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"))).toSet
    val exact = pairs(Ann.bruteForceTopK(emb, queries, k = 5))
    // explicit refineIters=1: pins the Lloyd path regardless of the
    // default (the benched q66 runs with 0)
    val a = pairs(Ann.ivfTopK(emb, queries, k = 5, refineIters = 1))
    val b = pairs(Ann.ivfTopK(emb, queries, k = 5, refineIters = 1))
    assert(a == b, "hash-seeded centroids + exact-decimal Lloyd means must make IVF replayable")
    val recall = (exact & a).size.toDouble / exact.size
    // nProbe/nCells = 4/16 visits ~25% of a uniform corpus; recall well
    // above that floor means the cell ordering is doing its job
    assert(recall >= 0.3, s"recall=$recall")
  }

  test("IVF index: every corpus vector lands in exactly one cell") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    // every (qid, nid) pair appears once — single-cell membership means no
    // dedup pass is needed, unlike multi-probe LSH
    val got = Ann.ivfTopK(emb, queries, k = 5)
      .groupBy("qid", "nid").count().filter(col("count") > 1)
    assert(got.isEmpty)
  }

  test("incremental IVF add: frozen centroids, batch searchable, single membership") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val base = Ann.buildIvfIndex(emb.filter(col("vec_id") % 2 === 0),
      nCells0 = 0, refineIters = 0)
    val idx = Ann.addToIvfIndex(base, emb.filter(col("vec_id") % 2 === 1))
    // centroids are frozen — the add must not retrain
    assert(idx.centroids eq base.centroids)
    // every vector (old and new) is posted exactly once
    val n = emb.count()
    assert(idx.assigned.count() == n)
    assert(idx.assigned.groupBy("nid").count().filter(col("count") > 1).isEmpty)
    // assignment against frozen centroids is consistent: a clone of an
    // already-indexed vector (same embedding, new id) lands in its cell
    val clones = emb.filter(col("vec_id") % 2 === 0 && col("vec_id") <= 10)
      .select((col("vec_id") + 1000000000L).as("vec_id"), col("embedding"))
    val withClones = Ann.addToIvfIndex(base, clones)
    val cellOf = withClones.assigned
      .select(col("nid"), col("cell")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    clones.select("vec_id").collect().map(_.getLong(0)).foreach { cid =>
      assert(cellOf(cid) == cellOf(cid - 1000000000L),
        "identical embeddings must be posted to the same cell")
    }
    // added postings participate in search: querying each added vector's
    // exact embedding under a fresh id retrieves it at rank 1, sim ≈ 1
    val probes = emb.filter(col("vec_id") % 2 === 1 && col("vec_id") <= 11)
      .select((col("vec_id") + 2000000000L).as("vec_id"), col("embedding"))
    val top = Ann.searchIvf(idx, probes, k = 1).collect()
    assert(top.nonEmpty)
    top.foreach { r =>
      assert(r.getAs[Long]("nid") == r.getAs[Long]("qid") - 2000000000L,
        "the added identical vector must come back as the top hit")
      assert(math.abs(r.getAs[Double]("sim") - 1.0) < 1e-9)
    }
  }

  test("native argmax-cell assignment bit-identical to the max_by formulation") {
    import graft.functions.FloatVecDot
    // the legacy broadcast-true-join + max_by assignment, reproduced here
    // verbatim as the parity reference for the IvfArgmaxCell kernel
    def legacy(corpus: org.apache.spark.sql.DataFrame,
        cent: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      corpus.repartition(spark.sparkContext.defaultParallelism)
        .select(col("vec_id").as("nid"), col("embedding").as("ce"),
          FloatVecDot.norm2(col("embedding")).as("cn2"))
        .join(broadcast(cent), lit(true))
        .groupBy("nid")
        .agg(max_by(col("cell"), struct(
          VectorFunctions.cosinePrenormed(
            FloatVecDot.dot(col("ce"), col("cvec")),
            col("cn2"), col("cvn2")), col("cell"))).as("cell"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    def native(corpus: org.apache.spark.sql.DataFrame,
        cent: org.apache.spark.sql.DataFrame): Map[Long, Int] =
      Ann.assign(corpus, cent)
        .select("nid", "cell").collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap

    // hand-built corner cases: a zero vector (all-NaN sims must resolve
    // to the HIGHEST cell like max_by's NaN-greatest struct order), an
    // exact sim tie from a duplicated centroid (higher cell wins), and
    // duplicate corpus vectors (same cell both)
    val corpus = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0f, 1f, 0f, 0f)),
      (3L, Array(0f, 0f, 0f, 0f)),
      (4L, Array(0.5f, 0.5f, 0f, 0f)),
      (5L, Array(-1f, 0f, 0f, 0f)),
      (6L, Array(0.5f, 0.5f, 0f, 0f))).toDF("vec_id", "embedding")
    val cent = Seq(
      (1, Array(1f, 0f, 0f, 0f)),
      (2, Array(0f, 1f, 0f, 0f)),
      (3, Array(1f, 0f, 0f, 0f))).toDF("cell", "cvec")
      .select(col("cell"), col("cvec"),
        FloatVecDot.norm2(col("cvec")).as("cvn2"))
    assert(native(corpus, cent) == legacy(corpus, cent),
      "kernel must match max_by on ties, NaN rows, and duplicates")

    // and on the real fixture with hash-drawn centroids
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val idx = Ann.buildIvfIndex(emb, nCells0 = 0, refineIters = 0)
    assert(native(emb, idx.centroids) == legacy(emb, idx.centroids),
      "kernel must match max_by on the fixture corpus")
  }

  test("native probe-cells kernel bit-identical to the window ranking") {
    import graft.functions.FloatVecDot
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 25 === 0)
    val idx = Ann.buildIvfIndex(emb, nCells0 = 0, refineIters = 0)
    // the legacy probe ranking: broadcast-true-join + per-query window
    val qw = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("psim").desc, col("cell"))
    val legacy = queries
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
        FloatVecDot.norm2(col("embedding")).as("qn2"))
      .join(broadcast(idx.centroids), lit(true))
      .select(col("qid"), col("cell"),
        VectorFunctions.cosinePrenormed(
          FloatVecDot.dot(col("qe"), col("cvec")),
          col("qn2"), col("cvn2")).as("psim"))
      .withColumn("pr", row_number().over(qw))
      .filter(col("pr") <= 4)
      .select("qid", "pr", "cell")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // the kernel path, as searchIvf now plans it (rank = array position)
    val native = Ann.probesForTest(idx, queries, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(native == legacy,
      "probe (qid, rank, cell) triples must match the window ranking")
  }

  test("persisted IVF index: search skips the assignment pass, results identical") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir)
    val queries = emb.filter(col("vec_id") % 50 === 0)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("qid"), r.getAs[Long]("nid"),
        r.getAs[Double]("sim"), r.getAs[Int]("rn"))).toSet
    val oneShot = rows(Ann.ivfTopK(emb, queries, k = 5, refineIters = 0))

    Ann.writeIvfIndex(Ann.buildIvfIndex(emb, refineIters = 0), "graft_test_ivf")
    val search = Ann.searchIvf(Ann.loadIvfIndex(spark, "graft_test_ivf"),
      queries, k = 5)

    // a second (and every further) query batch pays only the probe join:
    // no O(n·nCells) max_by assignment anywhere in the search plan
    val plan = search.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("max_by"),
      s"search over a prebuilt index must not re-run the assignment:\n$plan")
    // and the corpus side arrives pre-bucketed on the join key — no
    // shuffle of the assigned table (the query side may shuffle; it's tiny)
    val corpusShuffled = search.queryExecution.executedPlan.exists {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec =>
        e.exists {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.toString.contains("graft_test_ivf_assigned")
          case _ => false
        }
      case _ => false
    }
    assert(!corpusShuffled, s"bucketed index scan must not be re-shuffled:\n$plan")

    assert(rows(search) == oneShot,
      "index round-trip must be bit-identical to the one-shot path")
  }

  test("native lsh_band_keys kernel bit-identical to the declarative form") {
    val emb = Tables.embeddings(spark, TestSpark.sfDir).limit(300)
    val n = emb.count()
    val bits = 5
    val nTables = 3
    val planeVecs = emb.filter(col("vec_id") % 7 === 0)
      .orderBy("vec_id").limit(nTables * bits)
      .select("embedding").collect().map(_.getSeq[Float](0).toArray)
    assert(planeVecs.length == nTables * bits)
    val declarative = array((0 until nTables).map { t =>
      (0 until bits).map { i =>
        val p = typedLit(planeVecs(t * bits + i).toSeq)
        when(graft.functions.FloatVecDot.dot(col("embedding"), p) >= 0,
          lit(1L << i)).otherwise(lit(0L))
      }.reduce(_ + _) + lit(t.toLong * (1L << bits))
    }: _*)
    val native = call_function("lsh_band_keys", col("embedding"),
      typedLit(planeVecs.map(_.toSeq).toSeq), lit(bits))
    val diff = emb.select(col("vec_id"), declarative.as("d"), native.as("k"))
      .filter(col("d") =!= col("k")).count()
    assert(diff == 0,
      "kernel keys must equal the when/float_vec_dot expansion bit-for-bit " +
        "— the q41/q35 oracles restate exactly that arithmetic")
  }

  test("kmeans: planted tight clusters separate, sizes exact, sim near 1") {
    import graft.similarity.KMeans
    // three well-separated directions in 4-d; ids chosen so the stride
    // draw (stride = n/ceil(sqrt(n)) = 18/(5... -> every 4th id) seeds at
    // least one centroid near each direction is NOT required — Lloyd must
    // still converge assignments to direction-pure cells in 2 iterations
    def jitter(base: Array[Float], eps: Float, i: Int): Array[Float] =
      base.zipWithIndex.map { case (x, j) => x + (if ((i + j) % 2 == 0) eps else -eps) }
    val dirs = Seq(Array(1f, 0f, 0f, 0f), Array(0f, 1f, 0f, 0f), Array(0f, 0f, 1f, 0f))
    val rows = (0 until 18).map { i =>
      (i.toLong, jitter(dirs(i % 3), 0.01f, i).toSeq, i % 3)
    }
    val df = rows.toDF("vec_id", "embedding", "truth")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("truth"))
    val got = KMeans.kmeans(df.select("vec_id", "embedding"), iters = 2)
      .collect()
    // k-means can over-segment (the stride init may seed several cells
    // inside one planted direction — it never merges cells), so the
    // correctness invariant is CELL PURITY: no cell mixes directions,
    // every direction is covered, and members sit tight on their centroid
    val byCell = got.map(r => r.getAs[Int]("cell") -> r.getAs[Long]("vec_id"))
      .groupBy(_._1).view.mapValues(_.map(_._2 % 3).toSet).toMap
    assert(byCell.values.forall(_.size == 1),
      s"near-orthogonal planted directions must not share a cell: $byCell")
    assert(byCell.values.flatten.toSet == Set(0L, 1L, 2L),
      s"every planted direction must be covered: $byCell")
    assert(got.forall(_.getAs[Double]("sim") > 0.99),
      "members sit within ~1 degree of their centroid")
    val sizes = got.groupBy(_.getAs[Int]("cell"))
      .map { case (_, rs) => rs.head.getAs[Long]("csize") -> rs.length }
    assert(sizes.forall { case (csize, n) => csize == n.toLong },
      s"csize must equal the actual member count per cell: $sizes")
  }

  test("kmeans: deterministic across partitionings (exact integer means)") {
    import graft.similarity.KMeans
    val emb = Tables.embeddings(spark, TestSpark.sfDir).limit(200)
    def run(parts: Int) =
      KMeans.kmeans(emb.repartition(parts), iters = 2)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Int]("cell"),
          r.getAs[Double]("sim")))
        .sortBy(_._1).toSeq
    assert(run(3) == run(17),
      "integer-micro means are partition-order-independent — any drift " +
        "here would also break the DuckDB oracle hash")
  }
}
