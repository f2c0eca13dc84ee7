package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.queries.{Advanced, Extended}

/** Behavior specs for the round-2 Extended module. The oracle gate proves
  * value parity; these pin the SEMANTICS (frame boundaries, session breaks,
  * multiset arithmetic, sketch error/merge laws) on constructed inputs
  * where the expected answer is computable by hand.
  */
class ExtendedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sfDir
  import spark.implicits._

  private def q(name: String) = Extended.queries(name).build(spark, dir)

  test("grouping sets: per-status + per-priority + grand total partition the rows") {
    val rows = q("q46_grouping_sets").collect()
    val byGid = rows.groupBy(_.getAs[Long]("gid"))
    // gid 1 = (status) sets, gid 2 = (priority) sets, gid 3 = grand total
    assert(byGid.keySet == Set(1L, 2L, 3L))
    val total = byGid(3L).head.getAs[Long]("n_orders")
    assert(byGid(1L).map(_.getAs[Long]("n_orders")).sum == total)
    assert(byGid(2L).map(_.getAs[Long]("n_orders")).sum == total)
  }

  test("typed sessionize matches the window-based q45 on shared rows") {
    // q45 includes null-ts rows; q47 filters them — compare on the non-null
    // subset by recomputing q45's pipeline with the same filter
    val typed = q("q47_typed_sessionize")
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
    val windowed = Advanced.queries("q45_sessionize").build(spark, dir)
      .select("user_id", "session_id", "session_start", "session_end", "n_events")
    // two-sided: a typed walk that silently dropped sessions (or returned
    // nothing) must fail, not just one that invented them
    assert(typed.exceptAll(windowed).isEmpty, "typed sessions not in windowed result")
    assert(windowed.exceptAll(typed).isEmpty, "windowed sessions missing from typed result")
  }

  test("session walk: gap strictly over 30min breaks, <=30min continues") {
    import java.time.LocalDateTime
    val base = LocalDateTime.of(2026, 1, 1, 0, 0, 0)
    val evs = Seq(
      Extended.Ev(1L, 1L, base),
      Extended.Ev(1L, 2L, base.plusMinutes(30)),      // exactly 30min -> same session
      Extended.Ev(1L, 3L, base.plusMinutes(61)),      // 31min gap -> break
      Extended.Ev(2L, 4L, base)).toDS()
    val gapUs = 30L * 60L * 1000000L
    val out = evs.groupByKey(_.user_id)
      .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, it: Iterator[Extended.Ev]) =>
        // reuse the production walk via the public query is not possible on
        // a synthetic view, so exercise the same grouping mechanism inline
        var sid = 0L; var prev: LocalDateTime = null
        val b = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
        for (e <- it) {
          if (prev == null || java.time.temporal.ChronoUnit.MICROS.between(prev, e.ts) > gapUs) sid += 1
          b += ((uid, sid, e.event_id)); prev = e.ts
        }
        b
      }.collect().toSet
    assert(out == Set((1L, 1L, 1L), (1L, 1L, 2L), (1L, 2L, 3L), (2L, 1L, 4L)))
  }

  test("set ops: multiset identities hold (|A| = |A intersect_all B| + |A except_all B|)") {
    val rows = q("q48_set_ops").groupBy("op").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nCustomer = core.Tables.customer(spark, dir).count()
    assert(rows.getOrElse("intersect_all", 0L) + rows.getOrElse("except_all", 0L) == nCustomer)
    // distinct intersect is bounded by the multiset intersect
    assert(rows.getOrElse("intersect", 0L) <= rows.getOrElse("intersect_all", 0L))
  }

  test("argmax: max_by returns the key of the row with the max ordering value") {
    val got = q("q49_argmax").filter(col("o_orderpriority").isNotNull).collect()
    val orders = core.Tables.orders(spark, dir)
    got.foreach { r =>
      val prio = r.getAs[String]("o_orderpriority")
      val expected = orders.filter(col("o_orderpriority") === prio)
        .orderBy(col("o_totalprice").desc).select("o_orderkey").head().getLong(0)
      assert(r.getAs[Long]("top_order") == expected, s"priority $prio")
    }
  }

  test("percentile_cont: interpolation formula lower + (n-1)q-frac * (upper-lower)") {
    val df = Seq(1.0, 2.0, 4.0, 8.0).toDF("x")
    val p = df.agg(percentile(col("x"), lit(0.3))).head().getDouble(0)
    // (n-1)*q = 0.9 -> between 1 and 2 at frac 0.9 -> 1.9 (matches DuckDB probe)
    assert(p == 1.9)
  }

  test("value windows: trailing-3 frame boundaries") {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(lit(1)).orderBy("i").rowsBetween(-2, 0)
    val out = (1 to 5).map(_.toDouble).toDF("i")
      .select(col("i"), first("i").over(w).as("f"), nth_value(col("i"), 2).over(w).as("s"))
      .orderBy("i").collect()
    // row 1: frame [1]      -> first 1, second null
    // row 3: frame [1,2,3]  -> first 1, second 2
    // row 5: frame [3,4,5]  -> first 3, second 4
    assert(out(0).getDouble(1) == 1.0 && out(0).isNullAt(2))
    assert(out(2).getDouble(1) == 1.0 && out(2).getDouble(2) == 2.0)
    assert(out(4).getDouble(1) == 3.0 && out(4).getDouble(2) == 4.0)
  }

  test("dynamic pivot infers exactly the static pivot's schema and values") {
    val dynamic = q("q59_dynamic_pivot")
    val static = Advanced.queries("q38_pivot").build(spark, dir)
    assert(dynamic.schema.fieldNames.toSeq == static.schema.fieldNames.toSeq)
    assert(dynamic.exceptAll(static).isEmpty && static.exceptAll(dynamic).isEmpty)
  }

  test("quantile sketch: in-band rank-bound proof holds; exact quantiles ordered") {
    // q65 now computes the rank-error proof itself (pXX_ok) via a second
    // distributed counting pass — the oracle gates these as TRUE; this
    // spec independently re-checks one group's booleans against a direct
    // computation so the in-band proof can't go vacuously true
    val li = core.Tables.lineitem(spark, dir)
    val rows = q("q65_quantile_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("p50_ok"), s"${r.getAs[String]("l_returnflag")} p50")
      assert(r.getAs[Boolean]("p90_ok"), s"${r.getAs[String]("l_returnflag")} p90")
      assert(r.getAs[Double]("p50_exact") <= r.getAs[Double]("p90_exact"))
    }
    val flag = rows.head.getAs[String]("l_returnflag")
    val grp = li.filter(col("l_returnflag") === flag)
    val n = grp.count().toDouble
    val v = grp.agg(graft.functions.GraftFunctions
      .quantileApprox(col("l_extendedprice"), 0.5)).collect().head.getDouble(0)
    val rank = grp.filter(col("l_extendedprice") <= v).count() / n
    assert(math.abs(rank - 0.5) <= 0.01, s"direct recomputation: rank $rank")
  }

  test("corpus filter: keep is the conjunction; canonicality matches exact dedup") {
    val out = graft.pipeline.CorpusFilter(
      core.Tables.documents(spark, dir)).collect()
    out.foreach { r =>
      val expected = r.getAs[Boolean]("ok_lang") && r.getAs[Boolean]("ok_len") &&
        r.getAs[Boolean]("ok_quality") && r.getAs[Boolean]("is_canonical")
      assert(r.getAs[Boolean]("keep") == expected)
    }
    val kept = out.count(_.getAs[Boolean]("keep"))
    assert(kept > 0 && kept < out.length, s"kept $kept of ${out.length}")
    // canonical docs == distinct fingerprints (exact-dedup survivors)
    val canonical = out.count(_.getAs[Boolean]("is_canonical"))
    val nFps = graft.dedup.Dedup.exact(
      core.Tables.documents(spark, dir), "text", "doc_id").count()
    assert(canonical.toLong == nFps)
  }

  test("hll sketch: estimate within 5% of exact, and partition-merge associative") {
    val rows = q("q60_hll_sketch").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_ok"),
        s"${r.getAs[String]("event_type")}: estimate outside the 5% bound " +
          s"(exact ${r.getAs[Long]("exact_users")})")
    }
    // merge law: union of per-group sketches == sketch of the union
    val ev = core.Tables.events(spark, dir)
    val merged = ev.groupBy("event_type").agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).head().getLong(0)
    val direct = ev.agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))))
      .head().getLong(0)
    assert(merged == direct)
  }

  test("recursive CTE closure: planted chain groups resolve to min-id clusters") {
    import spark.implicits._
    // group A = {1,5,9} (same normalized text), group B = {2}, C = {3,4}
    Seq((1L, "Dup One "), (5L, "dup one"), (9L, "DUP ONE"),
      (2L, "solo"), (3L, "pair x"), (4L, "PAIR X"))
      .toDF("doc_id", "text").createOrReplaceTempView("documents")
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
    // the oracle string IS the engine query (portable-SQL form) — run it
    // verbatim over the planted view
    val r = spark.sql(SparkEntry.oracleSql("q95_recursive_cte")).collect()
      .map(x => x.getLong(1) -> x.getLong(0)).toMap
    assert(r == Map(1L -> 1L, 5L -> 1L, 9L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 3L))
  }
}
