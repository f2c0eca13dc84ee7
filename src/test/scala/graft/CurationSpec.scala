package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Curation

/** Planted-value tests for the set-level curation operators — the cases
  * fixture data can't pin precisely: exact shared-gram counts, chunk
  * boundary straddles, and mixture rates.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decontaminate: shared 5-gram flags the doc, clean doc stays clean") {
    val bench = Seq((100L, "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "prefix words alpha beta gamma delta epsilon more words here"),
      (2L, "totally unrelated content with no overlapping grams at all"),
      (3L, "tiny doc")) // < 5 tokens → no grams → clean
      .toDF("doc_id", "text")
    val r = Curation.decontaminate(corpus, bench, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getBoolean(2))).toMap
    // doc 1 contains "alpha beta gamma delta epsilon" and
    // "beta gamma delta epsilon zeta"? no — only the first (no zeta) → 1 shared
    assert(r(1L) == (1L, true))
    assert(r(2L) == (0L, false))
    assert(r(3L) == (0L, false))
  }

  test("decontaminate: all three benchSide modes agree bit-for-bit, and " +
      "the default never shuffles corpus grams") {
    val bench = Seq(
      (100L, "alpha beta gamma delta epsilon zeta"),
      (101L, "one two three four five six seven"))
      .toDF("doc_id", "text")
    val corpus = (1L to 50L).map { i =>
      val body =
        if (i % 5 == 0) "alpha beta gamma delta epsilon planted overlap"
        else s"filler${i}a filler${i}b filler${i}c filler${i}d filler${i}e filler${i}f"
      (i, body)
    }.toDF("doc_id", "text")
    def run(mode: String) =
      Curation.decontaminate(corpus, bench, "text", "doc_id",
          benchSide = mode)
        .orderBy("doc_id").collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getBoolean(2))).toSeq
    val base = run("broadcast")
    assert(base.count(_._3) == 10)
    // bloom prunes map-side but the exact join removes its false
    // positives — results must be identical, not merely equivalent
    assert(run("bloom") == base)
    assert(run("shuffle") == base)
    // default ("broadcast"): the gram-membership join must be a
    // broadcast-hash join — a 100 TB corpus must never exchange its gram
    // table against a fixed eval set
    val plan = Curation.decontaminate(corpus, bench, "text", "doc_id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected a broadcast gram-membership join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"corpus grams regressed to a shuffle join:\n$plan")
  }

  test("packSequences: offsets, chunk ids, and the straddle flag") {
    def words(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val docs = Seq(
      (1L, "en", words(200, "a")),  // [0, 200) → chunk 0
      (2L, "en", words(100, "b")),  // [200, 300) → starts chunk 0, straddles
      (3L, "en", words(56, "c")),   // [300, 356) → chunk 1, fits
      (4L, "de", words(10, "d")))   // separate partition restarts at 0
      .toDF("doc_id", "lang", "text")
    val r = Curation.packSequences(docs, "lang", "doc_id", "text", cap = 256)
      .collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("start_off"), x.getAs[Long]("chunk_id"),
          x.getAs[Boolean]("spans_boundary"))).toMap
    assert(r(1L) == (0L, 0L, false))
    assert(r(2L) == (200L, 0L, true))  // ends at 299 ≥ 256 → straddles
    assert(r(3L) == (300L, 1L, false)) // 300..355 inside chunk 1
    assert(r(4L) == (0L, 0L, false))
  }

  test("packSequences rejects a non-power-of-two cap") {
    val docs = Seq((1L, "en", "a b c")).toDF("doc_id", "lang", "text")
    intercept[IllegalArgumentException] {
      Curation.packSequences(docs, "lang", "doc_id", "text", cap = 100)
    }
  }

  test("splitAssign: pure function of id, sensible fractions on fixture") {
    val docs = graft.core.Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id")
    val a = Curation.splitAssign(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    // stability under corpus growth: a subset assigns identically
    val b = Curation.splitAssign(docs.limit(50), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    b.foreach { case (id, s) => assert(a(id) == s) }
    val n = a.size.toDouble
    val train = a.values.count(_ == "train") / n
    val test = a.values.count(_ == "test") / n
    assert(train > 0.7 && train < 0.9, s"train frac $train")
    assert(test > 0.03 && test < 0.2, s"test frac $test")
  }

  test("quantileDiscCuts: bit-identical to the single-buffer quantileDisc") {
    import graft.functions.GraftFunctions
    val qs = (1 to 9).map(_ / 10.0)
    val fixtures = Seq(
      Seq(0.5),                                 // n = 1
      Seq(1.0, 1.0, 1.0, 1.0),                  // all equal → degenerate lo == hi
      Seq(3.0, 1.0, 2.0, 2.0, 2.0, 9.0, 5.0),   // duplicate-heavy
      (1 to 1000).map(i => (i % 37).toDouble))  // tie runs spanning buckets
    for (data <- fixtures; nBuckets <- Seq(3, 4096)) {
      val df = data.toDF("v").repartition(7)
      val expected = df.agg(array(
        qs.map(GraftFunctions.quantileDisc(col("v"), _)): _*))
        .head().getSeq[Double](0)
      val got = GraftFunctions.quantileDiscCuts(df, "v", qs, nBuckets)
        .head().getSeq[Double](0)
      assert(got == expected, s"n=${data.size}, nBuckets=$nBuckets")
    }
  }

  test("quantileDiscCuts: NaN sorts last, exactly like quantileDisc") {
    import graft.functions.GraftFunctions
    val qs = (1 to 9).map(_ / 10.0)
    // NaN-bearing fixtures: mixed, NaN-heavy, and a NaN that would have
    // poisoned the min/max pre-pass (hi = NaN → one-bucket collapse)
    val fixtures = Seq(
      Seq(3.0, Double.NaN, 1.0, 2.0, Double.NaN, 9.0),
      Seq(Double.NaN, Double.NaN, Double.NaN, 0.5),
      (1 to 200).map(i => if (i % 7 == 0) Double.NaN else (i % 13).toDouble))
    for (data <- fixtures) {
      val df = data.toDF("v").repartition(5)
      val expected = df.agg(array(
        qs.map(GraftFunctions.quantileDisc(col("v"), _)): _*))
        .head().getSeq[Double](0)
      val got = GraftFunctions.quantileDiscCuts(df, "v", qs)
        .head().getSeq[Double](0)
      // == on Seq[Double] treats NaN != NaN — compare bit patterns
      assert(got.map(java.lang.Double.doubleToLongBits) ==
        expected.map(java.lang.Double.doubleToLongBits),
        s"data=$data got=$got expected=$expected")
    }
  }

  test("quantileDiscCuts: inverted knownRange and bad quantiles rejected") {
    import graft.functions.GraftFunctions
    val df = Seq(1.0, 2.0).toDF("v")
    intercept[IllegalArgumentException] {
      GraftFunctions.quantileDiscCuts(df, "v", Seq(0.5), knownRange = Some((1.0, 0.0)))
    }
    intercept[IllegalArgumentException] {
      GraftFunctions.quantileDiscCuts(df, "v", Seq(0.0, 0.5))
    }
  }

  test("quantileDiscCuts plan: no collect_list over the raw corpus") {
    import graft.functions.GraftFunctions
    import org.apache.spark.sql.catalyst.expressions.aggregate.CollectList
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val df = (1 to 500).map(i => (i % 91).toDouble).toDF("v")
    val cuts = GraftFunctions.quantileDiscCuts(df, "v", (1 to 9).map(_ / 10.0))
    val collectAggs = cuts.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(_.exists {
        case _: CollectList => true; case _ => false }) => a
    }
    assert(collectAggs.nonEmpty, "the ordered-cuts assembly uses collect_list")
    collectAggs.foreach { a =>
      assert(a.child.collectFirst { case j: Join => j }.isDefined,
        "every collect_list must sit above the bounded rank-lookup join — " +
          "a collect_list directly over the scan is the single-buffer " +
          "anti-pattern this operator exists to avoid")
    }
  }

  test("domainMix: over-represented domain downsampled, small domain kept") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, "web", "en", words(300)),
      (2L, "web", "en", words(300)),
      (3L, "books", "en", words(200)),
      (4L, "code", "en", words(100)))
      .toDF("doc_id", "source", "lang", "text")
    val r = Curation.domainMix(docs, Seq("source", "lang"), "text")
      .collect().map(x => x.getAs[String]("source") ->
        (x.getAs[Long]("n_tokens"), x.getAs[Double]("token_share"),
          x.getAs[Double]("sample_rate"))).toMap
    assert(r("web")._1 == 600L && r("web")._2 == 0.6666666666666666)
    // target share 1/3; web at 2/3 → rate 1/2; books at 2/9 target 1/3 → keep all
    assert(math.abs(r("web")._3 - 0.5) < 1e-12)
    assert(r("books")._3 == 1.0 && r("code")._3 == 1.0)
  }

  test("ksDrift: identical distributions give D = 0, disjoint give D = 1") {
    val ids = (1L to 300L).toDF("doc_id")
    // same constant value everywhere → every pair's ecdfs coincide
    val same = ids.withColumn("v", lit(42L))
    val r0 = Curation.ksDrift(same, "v", "doc_id")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r0.keySet == Set("train_val", "train_test", "val_test"))
    assert(r0.values.forall(_ == 0.0))
    // value perfectly separates train from val/test → D(train,·) = 1
    val split = Curation.splitAssign(ids, "doc_id")
    val sep = split.withColumn("v",
      when(col("split") === "train", lit(1L)).otherwise(lit(100L)))
      .select("doc_id", "v")
    val r1 = Curation.ksDrift(sep, "v", "doc_id")
      .collect().map(x => x.getString(0) -> x.getDouble(3)).toMap
    assert(r1("train_val") == 1.0 && r1("train_test") == 1.0)
    assert(r1("val_test") == 0.0)
  }

  test("budget select: quality-ordered prefix per domain, boundary doc excluded") {
    val docs = Seq(
      (1L, "a b c d", "A"),   // quality 1.0, 4 tokens
      (2L, "x x x x", "A"),   // quality 0.25 — visits last in A
      (3L, "p q r s", "A"),   // quality 1.0, ties with doc 1 → doc_id order
      (4L, "m n", "B"))       // separate domain, budget independent
      .toDF("doc_id", "text", "source")
    val r = Curation.budgetSelect(docs, "text", "doc_id", "source", budget = 8L)
      .collect().map(x => x.getLong(0) -> ((x.getLong(4), x.getBoolean(5)))).toMap
    // domain A visit order: doc 1 (cum 4), doc 3 (cum 8), doc 2 (cum 12)
    assert(r(1L) == ((4L, true)))
    assert(r(3L) == ((8L, true)))   // exactly at budget — included
    assert(r(2L) == ((12L, false))) // over budget — excluded
    assert(r(4L) == ((2L, true)))
    assertThrows[IllegalArgumentException] {
      Curation.budgetSelect(docs, "text", "doc_id", "source", budget = 0L)
    }
  }

  test("ksDriftAgainst: planted shift trips the statistical trigger, " +
      "a same-distribution draw does not") {
    // deterministic LCG stream; reference = first 2000 draws, wave =
    // next 1000 — same distribution by construction, so the α=0.05
    // bound must NOT fire (values are fixed: the assertion is stable)
    val lcg = Iterator.iterate(12345L)(s => (s * 1103515245L + 12345L)
      & 0x7FFFFFFFL).drop(1).take(3000).map(s => (s % 100).toInt).toSeq
    val ref = lcg.take(2000).toDF("v")
    val sameDraw = lcg.drop(2000).toDF("v")
    val ok = Curation.ksDriftAgainst(ref, sameDraw, "v").head()
    assert(!ok.getAs[Boolean]("drifted"),
      s"same-distribution draw fired the trigger (D=${ok.getAs[Double]("d_stat")})")
    assert(ok.getAs[Long]("n_ref") == 2000L && ok.getAs[Long]("n_wave") == 1000L)
    // the planted arc: the wave's values shift by +15 — D ≈ 0.15 against
    // a bound of 1.358·√(3000/2e6) ≈ 0.053
    val shifted = lcg.drop(2000).map(v => v + 15).toDF("v")
    val bad = Curation.ksDriftAgainst(ref, shifted, "v").head()
    assert(bad.getAs[Boolean]("drifted") && bad.getAs[Double]("d_stat") > 0.10,
      s"planted +15 shift must fire (D=${bad.getAs[Double]("d_stat")})")
  }
}
