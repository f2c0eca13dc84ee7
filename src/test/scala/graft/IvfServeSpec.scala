package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.similarity.{Ann, IvfServe}

/** The versioned ANN serving deployment ([[graft.similarity.IvfServe]]):
  * marker-gated visibility (readers never see a torn index), rebuild =
  * retrain + reassign + publish (results identical under full probing on
  * an undrifted corpus; occupancy rebalanced, probe volume cut, and
  * recall restored on a planted-drift corpus), drift-triggered policy,
  * two-generation pruning.
  */
class IvfServeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Dim = 16

  // seeded synthetic embeddings: cosine geometry, deterministic
  private def vecs(ids: Range, seed: Long,
      base: Option[Array[Float]] = None, spread: Double = 1.0): DataFrame = {
    val rnd = new scala.util.Random(seed)
    ids.map { id =>
      val noise = Array.fill(Dim)(rnd.nextGaussian().toFloat)
      val v = base match {
        case Some(b) => b.zip(noise).map { case (x, n) =>
          x + (spread * n).toFloat }
        case None => noise
      }
      (id.toLong, v)
    }.toDF("vec_id", "embedding")
  }

  // markers + version tables persist in the warehouse across test RUNS;
  // clear both so every run starts from "never published"
  private def resetServe(name: String): Unit = IvfServe.reset(spark, name)

  private def resultSet(df: DataFrame): Set[(Long, Long, Double, Int)] =
    df.select("qid", "nid", "sim", "rn")
      .as[(Long, Long, Double, Int)].collect().toSet

  test("publish/load: marker-gated visibility — a crash mid-publish " +
      "leaves the current version untouched and the new one invisible") {
    val name = "graft_serve_vis"
    resetServe(name)
    val corpus = vecs(0 until 120, seed = 1L)
    assert(IvfServe.currentVersion(spark, name).isEmpty)
    intercept[IllegalStateException](IvfServe.loadCurrent(spark, name))

    val idx0 = Ann.buildIvfIndex(corpus, nCells0 = 4, refineIters = 0)
    assert(IvfServe.publish(idx0, name) == 0L)
    assert(IvfServe.currentVersion(spark, name) == Some(0L))
    val queries = vecs(500 until 510, seed = 2L)
    val viaServe = resultSet(
      Ann.searchIvf(IvfServe.loadCurrent(spark, name), queries, 5, 2))
    assert(viaServe == resultSet(Ann.searchIvf(idx0, queries, 5, 2)),
      "served search must equal the in-memory index's")

    // CRASH MID-PUBLISH, simulated for real: v1's tables fully written,
    // marker never created — readers must keep resolving v0
    val idx1 = Ann.buildIvfIndex(corpus, nCells0 = 8, refineIters = 0)
    Ann.writeIvfIndex(idx1, s"${name}_v1")
    assert(IvfServe.currentVersion(spark, name) == Some(0L),
      "an unmarked version must be invisible")
    assert(resultSet(Ann.searchIvf(
      IvfServe.loadCurrent(spark, name), queries, 5, 2)) == viaServe,
      "readers see the old version bit-identically during the window")
    // the healed re-publish takes version 1, clearing the orphan tables
    assert(IvfServe.publish(idx1, name) == 1L)
    assert(IvfServe.committedVersions(spark, name) == Seq(0L, 1L))
    assert(resultSet(Ann.searchIvf(
        IvfServe.loadCurrent(spark, name), queries, 5, 8)) ==
      resultSet(Ann.searchIvf(idx1, queries, 5, 8)))
  }

  test("rebuild on an undrifted corpus: full-probe search results are " +
      "bit-identical across the version flip") {
    val name = "graft_serve_stable"
    resetServe(name)
    val corpus = vecs(0 until 200, seed = 3L)
    IvfServe.publish(
      Ann.buildIvfIndex(corpus, nCells0 = 8, refineIters = 0), name)
    val queries = vecs(600 until 630, seed = 4L)
    def fullProbe(): Set[(Long, Long, Double, Int)] = {
      val idx = IvfServe.loadCurrent(spark, name)
      val cells = idx.centroids.count().toInt
      resultSet(Ann.searchIvf(idx, queries, 5, nProbe = cells))
    }
    val pre = fullProbe()
    val v = IvfServe.rebuild(spark, name, refineIters = 1)
    assert(v == 1L)
    // the coordinate system changed (different draw, different cell
    // count); under full probing every candidate is examined either way,
    // so the ranked results cannot move
    assert(fullProbe() == pre,
      "a rebuild must not change what full probing returns")
  }

  test("planted drift: trigger fires (uniform does not), occupancy " +
      "rebalances, probe volume drops, recall restored") {
    val name = "graft_serve_drift"
    resetServe(name)
    val uniform = vecs(0 until 1000, seed = 5L)
    IvfServe.publish(
      Ann.buildIvfIndex(uniform, nCells0 = 0, refineIters = 1), name)
    val (c0, max0, mean0) = IvfServe.occupancy(spark, name)
    val ratio0 = max0 / mean0
    // the UNIFORM corpus must not fire the trigger at a knob above its
    // own (small) natural skew
    val knob = math.max(4.0, ratio0 * 1.5)
    assert(IvfServe.rebuildIfDrifted(spark, name, maxOverMean = knob).isEmpty,
      s"uniform corpus must not trigger: ratio $ratio0, knob $knob")
    assert(IvfServe.currentVersion(spark, name) == Some(0L))

    // drift arc: 50 tight sub-clusters (20 vectors each) inside one cone
    // around a new direction — the shape real drift takes (a new topic
    // family), appended against the FROZEN v0 centroids
    // (addToIvfIndex's contract). The whole cone lands in ~one stale
    // cell; its INTERNAL structure is what the retrained coordinate
    // system can see and the stale one cannot.
    val rnd = new scala.util.Random(99L)
    val d = Array.fill(Dim)(rnd.nextGaussian().toFloat)
    def clusterCenter(i: Int): Array[Float] = {
      val cRnd = new scala.util.Random(600L + i)
      d.map(x => (x + 0.15 * cRnd.nextGaussian()).toFloat)
    }
    val cone = (0 until 50).flatMap { i =>
      val c = clusterCenter(i)
      val pRnd = new scala.util.Random(700L + i)
      (0 until 20).map { j =>
        (10000L + i * 20 + j,
          c.map(x => (x + 0.02 * pRnd.nextGaussian()).toFloat))
      }
    }.toDF("vec_id", "embedding")
    IvfServe.publish(
      Ann.addToIvfIndex(IvfServe.loadCurrent(spark, name), cone), name)
    val (c1, max1, mean1) = IvfServe.occupancy(spark, name)
    val ratio1 = max1 / mean1
    assert(ratio1 > knob,
      s"the cone must concentrate occupancy: $ratio1 <= $knob ($max1/$mean1)")

    // recall@5 of drift queries (one near each of 40 sub-cluster
    // centers) vs exact brute force, small fixed nProbe
    val queries = (0 until 40).map { i =>
      val c = clusterCenter(i)
      val qRnd = new scala.util.Random(900L + i)
      (5000L + i, c.map(x => (x + 0.02 * qRnd.nextGaussian()).toFloat))
    }.toDF("vec_id", "embedding")
    val corpusNow = uniform.unionByName(cone)
    val exact = Ann.bruteForceTopK(corpusNow, queries, 5)
      .select("qid", "nid").as[(Long, Long)].collect().toSet
    def recall(nProbe: Int): Double = {
      val got = Ann.searchIvf(IvfServe.loadCurrent(spark, name), queries,
        5, nProbe).select("qid", "nid").as[(Long, Long)].collect().toSet
      got.intersect(exact).size.toDouble / exact.size
    }
    def probeVolume(nProbe: Int): Long = {
      val idx = IvfServe.loadCurrent(spark, name)
      val probes = Ann.probesForTest(idx, queries, nProbe)
      probes.join(idx.assigned, Seq("cell")).count()
    }
    val preRecall = recall(2); val preVolume = probeVolume(2)
    // the drift exposure is COST, not raw recall: the fat cell contains
    // the whole cone, so probing it returns every true neighbor (recall
    // 1.0) — at the price of examining most of the corpus per query
    assert(preRecall == 1.0 && preVolume > corpusNow.count() * 10,
      s"drifted index pays near-corpus candidates per query batch: " +
        s"recall $preRecall, volume $preVolume")

    // the drifted index must trip the trigger and rebuild
    val fired = IvfServe.rebuildIfDrifted(spark, name, maxOverMean = knob,
      refineIters = 1)
    assert(fired == Some(2L), s"drift must trigger the rebuild: $fired")
    val (c2, max2, mean2) = IvfServe.occupancy(spark, name)
    assert(max2 / mean2 < ratio1 / 2,
      s"rebuild must rebalance occupancy: $max1/$mean1 -> $max2/$mean2")
    // RECALL AT COST, the serving claim that actually matters: the
    // rebuilt coordinate system reaches near-exact recall at a small
    // fraction of the pre-rebuild candidate volume (the drifted index
    // could only reach it by scanning its fat cell). Walk nProbe up the
    // rebuilt index until recall ≥ 0.95 and pin the volume it took.
    val hit = Iterator.from(2).map(p => (p, recall(p), probeVolume(p)))
      .take(c2.toInt).find(_._2 >= 0.95)
    assert(hit.isDefined,
      s"rebuilt index must reach 0.95 recall within $c2 probes")
    val (pStar, rStar, vStar) = hit.get
    assert(vStar * 2 <= preVolume,
      s"recall ≥ 0.95 must cost ≤ half the drifted index's candidates: " +
        s"nProbe=$pStar volume $vStar vs pre $preVolume")
    info(f"occupancy ratio $ratio1%.1f -> ${max2 / mean2}%.1f; " +
      f"recall-at-cost: pre 1.0 @ $preVolume candidates, " +
      f"post $rStar%.2f @ $vStar (nProbe=$pStar)")
  }

  test("prune keeps the newest two generations") {
    val name = "graft_serve_prune"
    resetServe(name)
    val corpus = vecs(0 until 100, seed = 8L)
    val idx = Ann.buildIvfIndex(corpus, nCells0 = 4, refineIters = 0)
    IvfServe.publish(idx, name); IvfServe.publish(idx, name)
    IvfServe.publish(idx, name)
    assert(IvfServe.committedVersions(spark, name) == Seq(0L, 1L, 2L))
    assert(IvfServe.prune(spark, name) == Seq(0L))
    assert(IvfServe.committedVersions(spark, name) == Seq(1L, 2L))
    assert(!spark.catalog.tableExists(s"${name}_v0_assigned") &&
      !spark.catalog.tableExists(s"${name}_v0_centroids"),
      "pruned version tables must be dropped")
    // the current version still serves
    assert(Ann.searchIvf(IvfServe.loadCurrent(spark, name),
      vecs(900 until 905, seed = 9L), 3, 2).count() > 0)
  }
}
