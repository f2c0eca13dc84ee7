package graft.queries

import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.pipeline.Curation

/** Set-level curation operators over `documents`: benchmark
  * decontamination, sequence packing, domain-mixture rebalancing. All
  * exact math → all hash-gated.
  */
object CurationQueries extends QueryModule {

  def queries: Map[String, QueryDef] = Map(

    // Decontamination: every 97th doc stands in for the benchmark set;
    // corpus docs sharing any 5-gram with it are flagged. The duplicate
    // clusters in the fixture guarantee real hits.
    "q79_decontaminate" -> QueryDef(
      (s, dir) => {
        val d = Tables.documents(s, dir)
        Curation.decontaminate(
            d.filter(col("doc_id") % 97 =!= 0),
            d.filter(col("doc_id") % 97 === 0),
            "text", "doc_id")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk
             |  FROM documents
             |), g AS (
             |  SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(tk) - 3),
             |    i -> concat_ws(' ', tk[i], tk[i+1], tk[i+2], tk[i+3], tk[i+4])))) AS g
             |  FROM t WHERE len(tk) >= 5
             |), bg AS (
             |  SELECT DISTINCT g FROM g WHERE doc_id % 97 = 0
             |), hits AS (
             |  SELECT g.doc_id, count(*) AS n_shared
             |  FROM g JOIN bg USING (g) WHERE g.doc_id % 97 <> 0 GROUP BY 1
             |)
             |SELECT c.doc_id,
             |  coalesce(n_shared, 0) AS n_shared_grams,
             |  coalesce(n_shared, 0) > 0 AS contaminated
             |FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) c
             |LEFT JOIN hits ON c.doc_id = hits.doc_id
             |ORDER BY c.doc_id""".stripMargin)),

    // Sequence packing: concat-and-chunk at 256 tokens within each lang,
    // id-ordered — chunk assignment, start offset, boundary-straddle flag.
    "q80_seq_pack" -> QueryDef(
      (s, dir) =>
        Curation.packSequences(Tables.documents(s, dir),
            partCol = "lang", idCol = "doc_id", textCol = "text", cap = 256)
          .orderBy("lang", "doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |    len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
             |  FROM documents
             |), o AS (
             |  SELECT doc_id, lang, n_tokens,
             |    cast(coalesce(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
             |  FROM t
             |)
             |SELECT doc_id, lang, n_tokens, start_off,
             |  cast(floor(start_off / 256.0) AS BIGINT) AS chunk_id,
             |  cast(floor((start_off + n_tokens - 1) / 256.0) AS BIGINT)
             |    > cast(floor(start_off / 256.0) AS BIGINT) AS spans_boundary
             |FROM o ORDER BY lang, doc_id""".stripMargin)),

    // PII scrub. The fixture corpus is synthetic words, so the query
    // PLANTS deterministic PII from fixture columns (an email and a
    // zero-padded phone derived from doc_id) before detecting/redacting —
    // both engines construct the identical string, so counts and the
    // redacted text are hash-gated rather than vacuously zero.
    "q82_pii_redact" -> QueryDef(
      (s, dir) => {
        import graft.text.TextFunctions
        val synth = concat(substring(col("text"), 1, 40),
          lit(" contact user"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          lpad(col("doc_id").cast("string"), 4, "0"), lit(" now"))
        Tables.documents(s, dir)
          .select(col("doc_id"), synth.as("synth"))
          .select(col("doc_id"),
            TextFunctions.piiCount(col("synth"), TextFunctions.emailPattern)
              .as("n_emails"),
            TextFunctions.piiCount(col("synth"), TextFunctions.phonePattern)
              .as("n_phones"),
            TextFunctions.redactPii(col("synth")).as("redacted"))
          .orderBy("doc_id")
      },
      Some("""WITH synth AS (
             |  SELECT doc_id,
             |    substring(text, 1, 40) || ' contact user' || cast(doc_id AS varchar)
             |      || '@example.com or call 555-' || lpad(cast(doc_id AS varchar), 4, '0')
             |      || ' now' AS s
             |  FROM documents
             |)
             |SELECT doc_id,
             |  len(regexp_extract_all(s, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
             |  len(regexp_extract_all(s, '\b[0-9]{3}-[0-9]{4}\b')) AS n_phones,
             |  regexp_replace(regexp_replace(s,
             |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             |    '\b[0-9]{3}-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
             |FROM synth ORDER BY doc_id""".stripMargin)),

    // Deterministic eval split: md5-bucket assignment, stable under
    // corpus growth (randomSplit is not), identical in any engine.
    "q84_data_split" -> QueryDef(
      (s, dir) =>
        Curation.splitAssign(
            Tables.documents(s, dir).select("doc_id", "source"), "doc_id")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, source,
             |  substring(md5(cast(doc_id AS varchar)), 1, 2) AS split_bucket,
             |  CASE WHEN substring(md5(cast(doc_id AS varchar)), 1, 2) < 'cd' THEN 'train'
             |       WHEN substring(md5(cast(doc_id AS varchar)), 1, 2) < 'e7' THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Curriculum binning: decile bin per document by quality score.
    // Scale shape: a global ntile window would funnel the corpus through
    // ONE task; instead the 9 decile cuts come from the DISTRIBUTED exact
    // selection (per-value histogram → bucketed cumulative ranks → rank
    // lookup; no aggregation buffer ever holds the corpus), broadcast, and
    // binning is a map-side array count — same semantics, no global sort,
    // no single-partition window, no global collect_list.
    "q83_quality_bins" -> QueryDef(
      (s, dir) => {
        import graft.functions.GraftFunctions
        import graft.text.TextFunctions
        val q = Tables.documents(s, dir)
          .select(col("doc_id"), TextFunctions.qualityScore(col("text")).as("quality"))
        // quality is a mean of three [0,1] terms → known range, no min/max pass
        val cuts = GraftFunctions.quantileDiscCuts(
          q, "quality", (1 to 9).map(_ / 10.0), knownRange = Some((0.0, 1.0)))
        q.crossJoin(broadcast(cuts))
          .select(col("doc_id"), col("quality"),
            size(filter(col("cuts"), c => c < col("quality"))).as("bin"))
          .orderBy("doc_id")
      },
      Some(s"""WITH d AS (
              |  SELECT doc_id, text, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents
              |), m AS (
              |  SELECT doc_id,
              |    cast(len(list_distinct(toks)) AS double) / cast(len(toks) AS double) AS diversity,
              |    least(cast(len(toks) AS double) / 64.0, 1.0) AS length_score,
              |    cast(length(text) - length(regexp_replace(text, '${graft.text.TextFunctions.punctClass}', '', 'g')) AS double)
              |      / cast(length(text) AS double) AS punct_density
              |  FROM d
              |), q AS (
              |  SELECT doc_id,
              |    (diversity + length_score + (1.0 - least(punct_density * 10.0, 1.0))) / 3.0 AS quality
              |  FROM m
              |), c AS (
              |  SELECT quantile_disc(quality, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS cuts
              |  FROM q
              |)
              |SELECT doc_id, quality, len(list_filter(cuts, x -> x < quality)) AS bin
              |FROM q, c ORDER BY doc_id""".stripMargin)),

    // TOKEN-EXACT sequence packing: a byte-level BPE tokenizer trained on
    // the corpus itself (deterministic: histogram cut and pair ties are
    // both totally ordered) replaces the whitespace token accounting in
    // q80 — chunk ids now bill in the unit a training run consumes.
    // BPE is not SQL-expressible, so the query carries its proof IN-BAND
    // (q65's pattern) and the oracle gates the proof per document:
    //  - roundtrip_ok: bpe_decode(bpe_encode(text)) === text — byte-level
    //    BPE is lossless, so any encoder/decoder/merge-table defect fails
    //    the driver gate on the exact document it breaks;
    //  - count_ok: 1 <= n_tokens <= n_bytes for non-empty text (merges
    //    only ever shrink the byte sequence);
    //  - adj_ok: the NEXT doc's pack offset equals start_off + n_tokens —
    //    an independent lead()-window recomputation of packSequences'
    //    cumulative frame, so an off-by-one in the packing window fails
    //    here rather than hiding in engine-only output.
    // n_bytes rides along as the one oracle-computable numeric column.
    // BpeSpec keeps the golden vectors (merge order, token ids).
    "q86_bpe_pack" -> QueryDef(
      (s, dir) => {
        import graft.text.Bpe
        val d = Tables.documents(s, dir)
        // train once per corpus snapshot; the persisted merges table is
        // the reusable artifact (same amortization pattern as q66's IVF
        // index — a 100 TB pipeline never trains per query)
        val name = s"graft_bpe_${Tables.fingerprint(s, s"$dir/documents.parquet")}"
        if (!s.catalog.tableExists(name))
          Bpe.save(Bpe.train(d, "text", nMerges = 200, maxWords = 20000), s, name)
        val model = Bpe.load(s, name)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang").orderBy("doc_id")
        Curation.packSequences(d, partCol = "lang", idCol = "doc_id",
            textCol = "text", cap = 256, tokenCount = Bpe.countCol(_, model))
          .withColumn("adj_ok", coalesce(
            lead(col("start_off"), 1).over(w) ===
              col("start_off") + col("n_tokens"), lit(true)))
          .join(d.select(col("doc_id"), col("text"),
            octet_length(col("text")).cast("long").as("n_bytes")), "doc_id")
          .select(col("doc_id"), col("lang"), col("n_bytes"),
            (Bpe.decodeCol(Bpe.encodeCol(col("text"), model), model)
              === col("text")).as("roundtrip_ok"),
            (col("n_tokens") <= col("n_bytes") &&
              (col("n_bytes") === 0 || col("n_tokens") >= 1)).as("count_ok"),
            col("adj_ok"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id, lang, strlen(text) AS n_bytes,
             |  TRUE AS roundtrip_ok, TRUE AS count_ok, TRUE AS adj_ok
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Domain mixture: per (source, lang) token shares and the uniform-mix
    // downsampling rate.
    "q81_domain_mix" -> QueryDef(
      (s, dir) =>
        Curation.domainMix(Tables.documents(s, dir),
            Seq("source", "lang"), "text")
          .orderBy("source", "lang"),
      Some("""WITH d AS (
             |  SELECT source, lang, count(*) AS n_docs,
             |    cast(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tokens
             |  FROM documents GROUP BY 1, 2
             |), s AS (
             |  SELECT source, lang, n_docs, n_tokens,
             |    cast(n_tokens AS double) / cast(sum(n_tokens) OVER () AS double) AS token_share,
             |    1.0 / cast(count(*) OVER () AS double) AS target_share
             |  FROM d
             |)
             |SELECT source, lang, n_docs, n_tokens, token_share, target_share,
             |  least(target_share / token_share, 1.0) AS sample_rate
             |FROM s ORDER BY source, lang""".stripMargin)),

    // Post-split drift gate: exact two-sample KS statistic between every
    // pair of the q84 splits over n_chars. The cumulative window runs
    // over the per-value HISTOGRAM (bounded by the value domain), not the
    // corpus; the max is order-independent and each double division is
    // mirrored — hash-exact.
    "q94_ks_drift" -> QueryDef(
      (s, dir) =>
        Curation.ksDrift(Tables.documents(s, dir), "n_chars", "doc_id")
          .orderBy("pair"),
      Some("""WITH s AS (
             |  SELECT doc_id, n_chars,
             |    CASE WHEN substring(md5(cast(doc_id AS varchar)), 1, 2) < 'cd' THEN 'train'
             |         WHEN substring(md5(cast(doc_id AS varchar)), 1, 2) < 'e7' THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents
             |), hist AS (
             |  SELECT n_chars AS v,
             |    count(*) FILTER (WHERE split = 'train') AS c_train,
             |    count(*) FILTER (WHERE split = 'val') AS c_val,
             |    count(*) FILTER (WHERE split = 'test') AS c_test
             |  FROM s GROUP BY 1
             |), cum AS (
             |  SELECT v, sum(c_train) OVER w AS a, sum(c_val) OVER w AS b,
             |    sum(c_test) OVER w AS c
             |  FROM hist
             |  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |), n AS (
             |  SELECT count(*) FILTER (WHERE split = 'train') AS n_train,
             |    count(*) FILTER (WHERE split = 'val') AS n_val,
             |    count(*) FILTER (WHERE split = 'test') AS n_test
             |  FROM s
             |), d AS (
             |  SELECT
             |    max(abs(cast(a AS double) / cast(n_train AS double)
             |      - cast(b AS double) / cast(n_val AS double))) AS d_tv,
             |    max(abs(cast(a AS double) / cast(n_train AS double)
             |      - cast(c AS double) / cast(n_test AS double))) AS d_tt,
             |    max(abs(cast(b AS double) / cast(n_val AS double)
             |      - cast(c AS double) / cast(n_test AS double))) AS d_vt,
             |    any_value(n_train) AS n_train, any_value(n_val) AS n_val,
             |    any_value(n_test) AS n_test
             |  FROM cum CROSS JOIN n
             |)
             |SELECT pair, n_a, n_b, d_stat FROM (
             |  SELECT 'train_val' AS pair, n_train AS n_a, n_val AS n_b, d_tv AS d_stat FROM d
             |  UNION ALL
             |  SELECT 'train_test', n_train, n_test, d_tt FROM d
             |  UNION ALL
             |  SELECT 'val_test', n_val, n_test, d_vt FROM d
             |) ORDER BY pair""".stripMargin)),

    // Token-budget corpus selection: per source domain, admit docs in
    // (quality desc, doc_id) order while the running token count stays
    // within budget. One domain-key shuffle + per-domain sort window.
    "q99_budget_select" -> QueryDef(
      (s, dir) =>
        Curation.budgetSelect(Tables.documents(s, dir), "text", "doc_id",
            "source", budget = 2000L)
          .orderBy("doc_id"),
      Some("""WITH base AS (
             |  SELECT doc_id, source AS domain,
             |    cast(len(toks) AS bigint) AS n_tokens,
             |    cast(len(list_distinct(toks)) AS double)
             |      / cast(len(toks) AS double) AS quality
             |  FROM (SELECT doc_id, source,
             |          regexp_split_to_array(trim(text), '\s+') AS toks
             |        FROM documents)
             |)
             |SELECT doc_id, domain, n_tokens, quality, cum_tokens,
             |  cum_tokens <= 2000 AS selected
             |FROM (
             |  SELECT *, cast(sum(n_tokens) OVER (
             |      PARTITION BY domain ORDER BY quality DESC, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS bigint) AS cum_tokens
             |  FROM base)
             |ORDER BY doc_id""".stripMargin)),

    // END-TO-END incremental curation pipeline: quality gate (composite
    // score >= 0.7) -> exact dedup against a fingerprint ledger of every
    // SEEN survivor -> approximate near-dup admission against sig/band
    // ledgers of every ADMITTED doc — the full ingest path a training-
    // data pipeline runs, composed from the same stage kernels the
    // per-stage queries gate (q83's score, q100's fp protocol, q106's
    // estimator admission), folded over 4 waves (doc_id mod 4). Per-doc
    // verdict rows carry STAGE ATTRIBUTION (quality, q_pass, exact_new,
    // admitted, first_match), so the oracle — which unrolls all four
    // waves' admission against the sequentially-admitted ledgers in SQL —
    // gates every stage boundary, not just the final admitted set. The
    // streaming form is graft.streaming.CurationStream.
    "q116_curation_pipeline_incr" -> QueryDef(
      (s, dir) => {
        import graft.dedup.Dedup
        import graft.text.TextFunctions
        val cache: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame = graft.core.TransientCache.persist
        // one parquet scan for all four waves (each wave filters the
        // cached projection, not the source); its count doubles as a
        // safe over-bound for every wave's broadcast gate — one job
        // replaces four per-wave sk.count() gate jobs
        val docs = cache(Tables.documents(s, dir).select("doc_id", "text"))
        val nDocs = docs.count()
        val none = docs.filter(lit(false))
        var fpLedger = none.select(
          TextFunctions.fingerprint(col("text")).as("fp"))
        var bands = Dedup.MinHashLsh.bandsForApprox(
          none, "text", "doc_id", portable = true)
        var sigs = Dedup.MinHashLsh.sigsFor(
          none, "text", "doc_id", portable = true)
        var out: org.apache.spark.sql.DataFrame = null
        (0 until 4).foreach { w =>
          val wave = docs.filter(pmod(col("doc_id"), lit(4)) === w)
          val scored = cache(wave.select(col("doc_id"), col("text"),
            TextFunctions.qualityScore(col("text")).as("quality")))
          val qp = scored.filter(col("quality") >= 0.7)
          val exactNew = cache(qp
            .select(col("doc_id"), col("text"),
              TextFunctions.fingerprint(col("text")).as("fp"))
            .join(fpLedger, Seq("fp"), "left_anti")
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("fp").orderBy("doc_id")))
            .filter(col("rn") === 1).drop("rn"))
          // the wave sketch is cut EAGERLY (not just cached): the verdict
          // plan references it from four subtrees whose AQE stages race
          // the unmaterialized cache chain — tasks of the losing stages
          // sit on BlockInfoManager locks while one computes (measured
          // at sf0.1: 28 s/wave of blocked executorRunTime vs 20 s CPU,
          // and the fused-checkpoint wall drops ~1 s/wave with the leaf)
          val sk = Dedup.MinHashLsh.sigsFor(
            exactNew, "text", "doc_id", portable = true).localCheckpoint()
          val verdict = Dedup.MinHashLsh.nearDupAdmitApproxSketched(
            sk, bands, sigs, threshold = 0.35, cache,
            knownRows = Some(nDocs))
          // ONE per-wave lineage cut (q108's discipline, fused): the
          // wave's ENTIRE product — verdict columns + the fp ledger
          // delta + the admitted-survivor sigs — rides a single
          // localCheckpoint; the three ledger deltas AND the wave's
          // output rows are then leaf PROJECTIONS of it. The previous
          // shape cut the fp delta and the admitted sketch as two
          // separate eager actions and left `out` uncut, so every wave
          // paid two full analyze/plan/schedule round-trips over the
          // nested fold tree and the FINAL action re-analyzed all four
          // waves' verdict subtrees once more — measured at sf0.1 as
          // ~2.5 s of pure driver time for the final noop write alone
          // (0.4 s executor) and 3.3 s wall per admitted-sketch
          // checkpoint. Fused: one action per wave, every consumer
          // (ledgers, final union) bottoms out at ≤ waves leaves, final
          // analysis is over leaf projections. Row/byte cost vs the old
          // checkpoints: + the wave's quality-reject rows (small, and
          // wave-sized either way); `sig` is masked to admitted rows so
          // the leaf never retains a rejected doc's 256 B signature.
          val cpW = scored.select(col("doc_id"), col("quality"),
              (col("quality") >= 0.7).as("q_pass"))
            .join(exactNew.select(col("doc_id"), col("fp"),
              lit(true).as("en")), Seq("doc_id"), "left")
            .join(sk.select(col("id").as("doc_id"), col("sig")),
              Seq("doc_id"), "left")
            .join(verdict.select(col("doc_id"),
              col("admitted").as("adm"), col("first_match")),
              Seq("doc_id"), "left")
            .select(col("doc_id"), col("quality"), col("q_pass"),
              coalesce(col("en"), lit(false)).as("exact_new"),
              coalesce(col("adm"), lit(false)).as("admitted"),
              col("first_match"), col("fp"),
              when(coalesce(col("adm"), lit(false)), col("sig")).as("sig"))
            .localCheckpoint()
          val waveOut = cpW.select(col("doc_id"), col("quality"),
            col("q_pass"), col("exact_new"), col("admitted"),
            col("first_match"))
          out = if (out == null) waveOut else out.unionByName(waveOut)
          fpLedger = fpLedger.unionByName(
            cpW.filter(col("exact_new")).select("fp"))
          // band rows are a pure projection (posexplode of the sig
          // column) of the checkpointed survivors — lazily derived off
          // the same leaf
          val admittedSk = cpW.filter(col("admitted"))
            .select(col("doc_id").as("id"), col("sig"))
          bands = bands.unionByName(
            Dedup.MinHashLsh.bandRowsOfSigs(admittedSk))
          sigs = sigs.unionByName(admittedSk.select("id", "sig"))
        }
        out.orderBy("doc_id")
      },
      Some(curationPipelineOracleSql)),

    // q116 with the remaining production stage composed in: quality gate
    // -> BENCHMARK DECONTAMINATION (q79's n-gram rule, every 97th doc
    // standing in for the eval set) -> exact dedup -> approximate
    // near-dup admission, folded over the same 4 waves. Decontamination
    // runs BEFORE the dedup ledgers on purpose: a contaminated doc must
    // never enter the fp/band ledgers, or it could become the retained
    // survivor that knocks out a CLEAN near-copy — the gate order
    // guarantees eval-set text can never shield (or represent) training
    // text. The benchmark gram set is built ONCE outside the fold (a
    // benchmark is fixed eval data — setup-time state, not per-wave
    // work) and probed via broadcast, so the per-wave cost over q116 is
    // one map-side gram pass on that wave's quality survivors. Verdicts
    // add (n_shared_grams, clean) to the stage attribution; the oracle
    // unrolls the same four waves with the contamination gate applied to
    // the exact-survivor CTE.
    "q119_curation_decontam_incr" -> QueryDef(
      (s, dir) => {
        import graft.dedup.Dedup
        import graft.text.TextFunctions
        val cache: org.apache.spark.sql.DataFrame =>
          org.apache.spark.sql.DataFrame = graft.core.TransientCache.persist
        val all = cache(Tables.documents(s, dir).select("doc_id", "text"))
        val docs = all.filter(pmod(col("doc_id"), lit(97)) =!= 0)
        val bench = all.filter(pmod(col("doc_id"), lit(97)) === 0)
        val benchGrams = cache(Curation.benchGramSet(bench, "text", "doc_id"))
        val nDocs = all.count()
        // contamination is WAVE-INDEPENDENT (fixed gram set, per-doc
        // verdict, no ledger) — the batch fold hoists it OUT of the
        // loop entirely: ONE gram pass over all quality survivors,
        // whose HIT SET (docs sharing ≥1 gram — small by the operator's
        // purpose) broadcasts back onto the scored corpus; the flag
        // columns are then row-local and each wave just FILTERS the
        // flagged frame. The localCheckpoint is the same lineage
        // discipline as the fold's ledgers, for the same measured
        // reason: the gram/broadcast subtree would otherwise be
        // re-ANALYZED by every one of the fold's ~20 downstream actions
        // — stage walls were all sub-second both ways, but driver-side
        // analysis alone put q119 at +8 s over q116 at sf0.1; behind
        // the checkpoint leaf the fold prices at q116 + the one gram
        // pass. The STREAMING writer necessarily grams per wave — it
        // only ever sees the wave — which is the production shape
        // anyway: waves are small and the gram pass is map-side.
        val scoredAll = cache(docs.select(col("doc_id"), col("text"),
          TextFunctions.qualityScore(col("text")).as("quality")))
        val hits = Curation.contaminationHits(
          scoredAll.filter(col("quality") >= 0.7).select("doc_id", "text"),
          benchGrams, "text", "doc_id")
        val scoredFlagged = scoredAll
          .join(broadcast(hits), Seq("doc_id"), "left")
          .select(col("doc_id"), col("text"), col("quality"),
            when(col("quality") >= 0.7, coalesce(col("n_shared"), lit(0L)))
              .as("n_shared_grams"),
            (col("quality") >= 0.7 && col("n_shared").isNull).as("clean"))
          .localCheckpoint()
        val none = all.filter(lit(false))
        var fpLedger = none.select(
          TextFunctions.fingerprint(col("text")).as("fp"))
        var bands = Dedup.MinHashLsh.bandsForApprox(
          none, "text", "doc_id", portable = true)
        var sigs = Dedup.MinHashLsh.sigsFor(
          none, "text", "doc_id", portable = true)
        var out: org.apache.spark.sql.DataFrame = null
        (0 until 4).foreach { w =>
          val scored = scoredFlagged.filter(pmod(col("doc_id"), lit(4)) === w)
          val cleanDocs = scored.filter(col("clean"))
          val exactNew = cache(cleanDocs
            .select(col("doc_id"), col("text"),
              TextFunctions.fingerprint(col("text")).as("fp"))
            .join(fpLedger, Seq("fp"), "left_anti")
            .withColumn("rn", row_number().over(
              org.apache.spark.sql.expressions.Window
                .partitionBy("fp").orderBy("doc_id")))
            .filter(col("rn") === 1).drop("rn"))
          // the wave sketch is cut EAGERLY (not just cached): the verdict
          // plan references it from four subtrees whose AQE stages race
          // the unmaterialized cache chain — tasks of the losing stages
          // sit on BlockInfoManager locks while one computes (measured
          // at sf0.1: 28 s/wave of blocked executorRunTime vs 20 s CPU,
          // and the fused-checkpoint wall drops ~1 s/wave with the leaf)
          val sk = Dedup.MinHashLsh.sigsFor(
            exactNew, "text", "doc_id", portable = true).localCheckpoint()
          val verdict = Dedup.MinHashLsh.nearDupAdmitApproxSketched(
            sk, bands, sigs, threshold = 0.35, cache,
            knownRows = Some(nDocs))
          // same fused per-wave lineage cut as q116 (see its in-fold
          // comment): verdict columns + fp delta + admitted sigs ride
          // ONE localCheckpoint; ledgers and the output union are leaf
          // projections of it
          val cpW = scored.select(col("doc_id"), col("quality"),
              (col("quality") >= 0.7).as("q_pass"),
              col("n_shared_grams"), col("clean"))
            .join(exactNew.select(col("doc_id"), col("fp"),
              lit(true).as("en")), Seq("doc_id"), "left")
            .join(sk.select(col("id").as("doc_id"), col("sig")),
              Seq("doc_id"), "left")
            .join(verdict.select(col("doc_id"),
              col("admitted").as("adm"), col("first_match")),
              Seq("doc_id"), "left")
            .select(col("doc_id"), col("quality"), col("q_pass"),
              col("n_shared_grams"), col("clean"),
              coalesce(col("en"), lit(false)).as("exact_new"),
              coalesce(col("adm"), lit(false)).as("admitted"),
              col("first_match"), col("fp"),
              when(coalesce(col("adm"), lit(false)), col("sig")).as("sig"))
            .localCheckpoint()
          val waveOut = cpW.select(col("doc_id"), col("quality"),
            col("q_pass"), col("n_shared_grams"), col("clean"),
            col("exact_new"), col("admitted"), col("first_match"))
          out = if (out == null) waveOut else out.unionByName(waveOut)
          fpLedger = fpLedger.unionByName(
            cpW.filter(col("exact_new")).select("fp"))
          val admittedSk = cpW.filter(col("admitted"))
            .select(col("doc_id").as("id"), col("sig"))
          bands = bands.unionByName(
            Dedup.MinHashLsh.bandRowsOfSigs(admittedSk))
          sigs = sigs.unionByName(admittedSk.select("id", "sig"))
        }
        out.orderBy("doc_id")
      },
      Some(curationDecontamOracleSql)),

    // INCREMENTAL ingest-drift monitor: each wave (doc_id mod 4, waves
    // 1-3) is KS-tested against the corpus-so-far (waves < w) — "does
    // this batch still look like what I accepted?", the
    // text-distribution sibling of the IVF occupancy trigger. The
    // `drifted` flag is the large-sample KS rejection bound at α=0.05
    // (1.358·√((n_ref+n_wave)/(n_ref·n_wave))), so the trigger
    // tightens as both sides grow instead of being an arbitrary knob.
    // State per check is one per-distinct-value histogram (bounded by
    // the value domain, never the corpus — q94's argument); the fold is
    // 3 independent single-row checks, each one aggregate + one
    // histogram window.
    "q121_ks_drift_incremental" -> QueryDef(
      (s, dir) => {
        val docs = graft.core.TransientCache.persist(
          Tables.documents(s, dir).select("doc_id", "n_chars"))
        var out: org.apache.spark.sql.DataFrame = null
        (1 until 4).foreach { w =>
          val row = Curation.ksDriftAgainst(
              docs.filter(pmod(col("doc_id"), lit(4)) < w),
              docs.filter(pmod(col("doc_id"), lit(4)) === w), "n_chars")
            .select(lit(w.toLong).as("wave"), col("n_ref"), col("n_wave"),
              col("d_stat"), col("drifted"))
          out = if (out == null) row else out.unionByName(row)
        }
        out.orderBy("wave")
      },
      Some(ksDriftIncrOracleSql)))

  /** DuckDB mirror of q116: quality + fingerprint stages are relational
    * (the exact-dedup ledger fold collapses to ONE window — the first
    * (wave, id)-ordered quality-passing doc per fingerprint is the
    * survivor), and the admission stage is UNROLLED wave by wave, each
    * wave's candidate/verify running against the UNION of previous
    * waves' admitted docs (the sequentially-maintained ledger) plus
    * smaller stage-input ids within the wave — q106's estimator verify
    * over the shared portable-sig CTEs.
    */
  /** The per-wave candidate/verify/admit CTE triple of the unrolled
    * pipeline oracles (q116, q119): banded candidates of wave `w`'s
    * exact-survivors against the union of previously-admitted ledgers
    * plus earlier same-wave ids, estimator verify at 0.35, admitted =
    * survivors with no verified match.
    */
  private def pipelineWaveVer(w: Int, prevAdmitted: Seq[String]): String = {
    val ledgerSide =
      if (prevAdmitted.isEmpty) s"(y.doc_id % 4 = $w AND y.doc_id < x.doc_id)"
      else prevAdmitted.map(a => s"y.doc_id IN (SELECT doc_id FROM $a)")
        .mkString("(", " OR ", s" OR (y.doc_id % 4 = $w AND y.doc_id < x.doc_id))")
    s"""v$w AS (
       |  SELECT DISTINCT x.doc_id AS bid, y.doc_id AS mid
       |  FROM enb x JOIN enb y ON x.band = y.band AND x.bkey = y.bkey
       |  WHERE x.doc_id % 4 = $w AND $ledgerSide
       |), r$w AS MATERIALIZED (
       |  SELECT c.bid, c.mid FROM v$w c
       |  JOIN sigl sa ON c.bid = sa.doc_id
       |  JOIN sigl sb ON c.mid = sb.doc_id
       |  WHERE cast(len(list_filter(range(1, len(sa.sigv) + 1),
       |    i -> sa.sigv[i] = sb.sigv[i])) AS double) / 32.0 >= 0.35
       |), a$w AS MATERIALIZED (
       |  SELECT doc_id FROM en
       |  WHERE doc_id % 4 = $w AND doc_id NOT IN (SELECT bid FROM r$w)
       |)""".stripMargin
  }

  private lazy val curationPipelineOracleSql: String = {
    val waves = (0 until 4).map(w =>
      pipelineWaveVer(w, (0 until w).map(p => s"a$p"))).mkString(",\n")
    s"""WITH ${DedupQueries.portableSetsSql},
       |coeff(j, a, b) AS (VALUES ${DedupQueries.coeffValues}
       |), ${DedupQueries.sigBandsSql("sets", "doc_id")}, sigl AS MATERIALIZED (
       |  SELECT doc_id, list(mv ORDER BY j) AS sigv FROM sig GROUP BY doc_id
       |), qm AS MATERIALIZED (
       |  SELECT doc_id, (dv + ls + (1.0 - least(pd * 10.0, 1.0))) / 3.0 AS quality
       |  FROM (
       |    SELECT doc_id,
       |      cast(len(list_distinct(toks)) AS double) / cast(len(toks) AS double) AS dv,
       |      least(cast(len(toks) AS double) / 64.0, 1.0) AS ls,
       |      cast(length(text) - length(regexp_replace(text, '${graft.text.TextFunctions.punctClass}', '', 'g')) AS double)
       |        / cast(length(text) AS double) AS pd
       |    FROM (SELECT doc_id, text,
       |            regexp_split_to_array(trim(text), '\\s+') AS toks
       |          FROM documents)
       |  )
       |), en AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT q.doc_id, row_number() OVER (
       |        PARTITION BY f.fp ORDER BY q.doc_id % 4, q.doc_id) AS rn
       |    FROM (SELECT doc_id FROM qm WHERE quality >= 0.7) q
       |    JOIN (SELECT doc_id,
       |            md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
       |          FROM documents) f ON q.doc_id = f.doc_id
       |  ) WHERE rn = 1
       |), enb AS MATERIALIZED (
       |  SELECT b.* FROM bands b JOIN en ON b.doc_id = en.doc_id
       |),
       |$waves,
       |rej AS (
       |  SELECT bid, min(mid) AS first_match FROM (
       |    SELECT * FROM r0 UNION ALL SELECT * FROM r1
       |    UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
       |  ) GROUP BY bid
       |), adm AS (
       |  SELECT doc_id FROM a0 UNION ALL SELECT doc_id FROM a1
       |  UNION ALL SELECT doc_id FROM a2 UNION ALL SELECT doc_id FROM a3
       |)
       |SELECT d.doc_id, qm.quality, qm.quality >= 0.7 AS q_pass,
       |  d.doc_id IN (SELECT doc_id FROM en) AS exact_new,
       |  d.doc_id IN (SELECT doc_id FROM adm) AS admitted,
       |  rej.first_match
       |FROM documents d
       |JOIN qm ON d.doc_id = qm.doc_id
       |LEFT JOIN rej ON d.doc_id = rej.bid
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB mirror of q119: the q116 oracle with the q79 contamination
    * rule composed in. Benchmark docs (doc_id % 97 = 0) leave the corpus
    * entirely; their distinct 5-grams form `bgm`; `cont` counts shared
    * grams for QUALITY-PASSING corpus docs (the stage input — the engine
    * grams only quality survivors); the exact-survivor CTE `en` then
    * requires cleanliness, so contaminated docs never reach the fp
    * window or the admission waves — exactly the fold's ledger-exclusion
    * contract. Gram CTEs reuse the `d` tokenization the sketch CTEs
    * already built.
    */
  private lazy val curationDecontamOracleSql: String = {
    val waves = (0 until 4).map(w =>
      pipelineWaveVer(w, (0 until w).map(p => s"a$p"))).mkString(",\n")
    s"""WITH ${DedupQueries.portableSetsSql},
       |coeff(j, a, b) AS (VALUES ${DedupQueries.coeffValues}
       |), ${DedupQueries.sigBandsSql("sets", "doc_id")}, sigl AS MATERIALIZED (
       |  SELECT doc_id, list(mv ORDER BY j) AS sigv FROM sig GROUP BY doc_id
       |), qm AS MATERIALIZED (
       |  SELECT doc_id, (dv + ls + (1.0 - least(pd * 10.0, 1.0))) / 3.0 AS quality
       |  FROM (
       |    SELECT doc_id,
       |      cast(len(list_distinct(toks)) AS double) / cast(len(toks) AS double) AS dv,
       |      least(cast(len(toks) AS double) / 64.0, 1.0) AS ls,
       |      cast(length(text) - length(regexp_replace(text, '${graft.text.TextFunctions.punctClass}', '', 'g')) AS double)
       |        / cast(length(text) AS double) AS pd
       |    FROM (SELECT doc_id, text,
       |            regexp_split_to_array(trim(text), '\\s+') AS toks
       |          FROM documents)
       |  )
       |), bgm AS MATERIALIZED (
       |  SELECT DISTINCT unnest(list_distinct(list_transform(range(1, len(toks) - 3),
       |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])))) AS g
       |  FROM d WHERE doc_id % 97 = 0 AND len(toks) >= 5
       |), cont AS MATERIALIZED (
       |  SELECT cg.doc_id, count(*) AS n_shared FROM (
       |    SELECT dd.doc_id, unnest(list_distinct(list_transform(range(1, len(dd.toks) - 3),
       |      i -> concat_ws(' ', dd.toks[i], dd.toks[i+1], dd.toks[i+2], dd.toks[i+3], dd.toks[i+4])))) AS g
       |    FROM d dd JOIN qm ON dd.doc_id = qm.doc_id
       |    WHERE dd.doc_id % 97 <> 0 AND qm.quality >= 0.7 AND len(dd.toks) >= 5
       |  ) cg JOIN bgm USING (g) GROUP BY 1
       |), en AS MATERIALIZED (
       |  SELECT doc_id FROM (
       |    SELECT q.doc_id, row_number() OVER (
       |        PARTITION BY f.fp ORDER BY q.doc_id % 4, q.doc_id) AS rn
       |    FROM (SELECT doc_id FROM qm
       |          WHERE quality >= 0.7 AND doc_id % 97 <> 0
       |            AND doc_id NOT IN (SELECT doc_id FROM cont)) q
       |    JOIN (SELECT doc_id,
       |            md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
       |          FROM documents) f ON q.doc_id = f.doc_id
       |  ) WHERE rn = 1
       |), enb AS MATERIALIZED (
       |  SELECT b.* FROM bands b JOIN en ON b.doc_id = en.doc_id
       |),
       |$waves,
       |rej AS (
       |  SELECT bid, min(mid) AS first_match FROM (
       |    SELECT * FROM r0 UNION ALL SELECT * FROM r1
       |    UNION ALL SELECT * FROM r2 UNION ALL SELECT * FROM r3
       |  ) GROUP BY bid
       |), adm AS (
       |  SELECT doc_id FROM a0 UNION ALL SELECT doc_id FROM a1
       |  UNION ALL SELECT doc_id FROM a2 UNION ALL SELECT doc_id FROM a3
       |)
       |SELECT d.doc_id, qm.quality, qm.quality >= 0.7 AS q_pass,
       |  CASE WHEN qm.quality >= 0.7 THEN coalesce(cont.n_shared, 0) END AS n_shared_grams,
       |  CASE WHEN qm.quality >= 0.7 THEN coalesce(cont.n_shared, 0) = 0
       |       ELSE false END AS clean,
       |  d.doc_id IN (SELECT doc_id FROM en) AS exact_new,
       |  d.doc_id IN (SELECT doc_id FROM adm) AS admitted,
       |  rej.first_match
       |FROM documents d
       |JOIN qm ON d.doc_id = qm.doc_id
       |LEFT JOIN cont ON d.doc_id = cont.doc_id
       |LEFT JOIN rej ON d.doc_id = rej.bid
       |WHERE d.doc_id % 97 <> 0
       |ORDER BY d.doc_id""".stripMargin
  }

  /** DuckDB mirror of q121: three independent two-sample KS checks, each
    * wave w ∈ {1,2,3} against the union of waves < w — per-value
    * histogram, cumulative ECDFs over the histogram, exact max gap, and
    * the α=0.05 rejection bound, every double op mirrored.
    */
  private lazy val ksDriftIncrOracleSql: String = {
    val waves = (1 until 4).map { w =>
      s"""h$w AS (
         |  SELECT n_chars AS v,
         |    count(*) FILTER (WHERE doc_id % 4 < $w) AS c_ref,
         |    count(*) FILTER (WHERE doc_id % 4 = $w) AS c_wave
         |  FROM documents WHERE doc_id % 4 <= $w GROUP BY 1
         |), c$w AS (
         |  SELECT v, sum(c_ref) OVER win AS a, sum(c_wave) OVER win AS b
         |  FROM h$w
         |  WINDOW win AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |), n$w AS (
         |  SELECT count(*) FILTER (WHERE doc_id % 4 < $w) AS n_ref,
         |    count(*) FILTER (WHERE doc_id % 4 = $w) AS n_wave
         |  FROM documents
         |), d$w AS (
         |  SELECT CAST($w AS BIGINT) AS wave, n_ref, n_wave,
         |    max(abs(cast(a AS double) / cast(n_ref AS double)
         |      - cast(b AS double) / cast(n_wave AS double))) AS d_stat
         |  FROM c$w CROSS JOIN n$w GROUP BY 1, 2, 3
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH $waves
       |SELECT wave, n_ref, n_wave, d_stat,
       |  d_stat > 1.358 * sqrt(cast(n_ref + n_wave AS double)
       |    / cast(n_ref * n_wave AS double)) AS drifted
       |FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2
       |      UNION ALL SELECT * FROM d3)
       |ORDER BY wave""".stripMargin
  }
}
