package graft.queries

import java.time.LocalDateTime
import java.time.temporal.ChronoUnit

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.functions.GraftFunctions._

/** Round-2 operator widening: grouping sets, typed sessionization, set
  * operations, arg-max aggregates, interpolated percentiles, value windows,
  * scalar math/regex/date surface, subquery entry path, dynamic pivot, and
  * an HLL distinct sketch. Same composition discipline as the round-1
  * modules — built-in Catalyst operators, exact-arithmetic parity rules,
  * deterministic total ordering on every output.
  */
object Extended extends QueryModule {

  /** One SQL text, two engines (q74): runs verbatim on Spark and DuckDB. */
  /** One dialect-portable recursive-CTE text (q95): transitive closure
    * over exact-duplicate CHAIN edges. Chain edges (rank k → rank k+1
    * within a fingerprint group) bound recursion depth by the largest
    * duplicate group — never the corpus — and every doc is reached
    * exactly once, so the result is the full cluster assignment. Runs
    * verbatim on Spark 4's UnionLoop execution and on DuckDB.
    */
  private val recursiveClosureSql: String =
    """WITH RECURSIVE
      |norm AS (
      |  SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
      |), ranked AS (
      |  SELECT doc_id, fp,
      |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      |  FROM norm
      |), edges AS (
      |  SELECT a.doc_id AS src, b.doc_id AS dst
      |  FROM ranked a JOIN ranked b ON a.fp = b.fp AND b.rn = a.rn + 1
      |), reach AS (
      |  SELECT doc_id AS cluster, doc_id AS node FROM ranked WHERE rn = 1
      |  UNION ALL
      |  SELECT r.cluster, e.dst AS node
      |  FROM reach r JOIN edges e ON e.src = r.node
      |)
      |SELECT cluster, node AS doc_id FROM reach
      |ORDER BY cluster, doc_id""".stripMargin

  private val filteredAggSql: String =
    """SELECT l_linestatus,
      |  count(*) AS n,
      |  count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
      |  cast(sum(cast(l_quantity AS decimal(18,6))) FILTER (WHERE l_discount > 0.05) AS double) AS qty_discounted,
      |  count(*) FILTER (WHERE l_returnflag IS DISTINCT FROM l_linestatus) AS n_flag_differs
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** Typed rows for the Dataset sessionization (q47). Public: Spark's
    * encoder codegen cannot see private case classes.
    */
  case class Ev(user_id: Long, event_id: Long, ts: LocalDateTime)
  case class Session(user_id: Long, session_id: Long,
      session_start: LocalDateTime, session_end: LocalDateTime, n_events: Long)

  def queries: Map[String, QueryDef] = Map(

    // GROUPING SETS — the general form behind rollup (q25) and cube (q39):
    // per-status totals, per-priority totals, and the grand total in ONE
    // pass (Spark expands to a single Expand + hash aggregate, one shuffle,
    // instead of three scans unioned).
    "q46_grouping_sets" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupingSets(
            Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
            col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
            sumExact(col("o_totalprice")).as("sum_price"))
          .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  grouping_id(o_orderstatus, o_orderpriority) AS gid,
             |  count(*) AS n_orders,
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) AS double) AS sum_price
             |FROM orders
             |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Typed-Dataset sessionization: the same gap semantics as q45 but as a
    // per-key imperative walk over `flatMapSortedGroups` — the §2.10 typed
    // custom-operator mechanism. The groups arrive SORTED by (ts, event_id)
    // from the shuffle's sort (no per-group materialize-and-sort), and the
    // walk is a streaming fold: O(1) state per group, one shuffle total —
    // the same scale shape as the window formulation, expressed typed.
    "q47_typed_sessionize" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val gapUs = 30L * 60L * 1000000L
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .select(col("user_id"), col("event_id"), col("ts")).as[Ev]
          .groupByKey(_.user_id)
          .flatMapSortedGroups($"ts", $"event_id") { (uid: Long, evs: Iterator[Ev]) =>
            val out = scala.collection.mutable.ArrayBuffer.empty[Session]
            var cur: Session = null
            var sid = 0L
            var prevTs: LocalDateTime = null
            for (e <- evs) {
              val break = prevTs == null ||
                ChronoUnit.MICROS.between(prevTs, e.ts) > gapUs
              if (break) {
                if (cur != null) out += cur
                sid += 1
                cur = Session(uid, sid, e.ts, e.ts, 1L)
              } else {
                cur = cur.copy(session_end = e.ts, n_events = cur.n_events + 1)
              }
              prevTs = e.ts
            }
            if (cur != null) out += cur
            out
          }
          .toDF()
          .orderBy("user_id", "session_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts - lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_break
             |  FROM events WHERE ts IS NOT NULL
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sessions AS (
             |  SELECT user_id, ts,
             |    cast(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM marked
             |)
             |SELECT user_id, session_id,
             |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
             |FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    // Set operations beyond union (§2.7): INTERSECT / EXCEPT (set) and
    // INTERSECT ALL / EXCEPT ALL (multiset) — each a tagged block of one
    // result. Spark plans these as aggregates/joins on the value, one
    // shuffle each; the repeated scans share the cached file listing.
    "q48_set_ops" -> QueryDef(
      (s, dir) => {
        val c = Tables.customer(s, dir).select(col("c_nationkey").as("nationkey"))
        val sup = Tables.supplier(s, dir).select(col("s_nationkey").as("nationkey"))
        c.intersect(sup).withColumn("op", lit("intersect"))
          .unionByName(c.except(sup).withColumn("op", lit("except")))
          .unionByName(c.intersectAll(sup).withColumn("op", lit("intersect_all")))
          .unionByName(c.exceptAll(sup).withColumn("op", lit("except_all")))
          .select("op", "nationkey")
          .orderBy("op", "nationkey")
      },
      Some("""SELECT 'intersect' AS op, nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
             |UNION ALL
             |SELECT 'except', nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
             |UNION ALL
             |SELECT 'intersect_all', nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer INTERSECT ALL SELECT s_nationkey FROM supplier)
             |UNION ALL
             |SELECT 'except_all', nationkey FROM
             |  (SELECT c_nationkey AS nationkey FROM customer EXCEPT ALL SELECT s_nationkey FROM supplier)
             |ORDER BY op, nationkey""".stripMargin)),

    // Arg-max family + conditional/boolean aggregates. max_by/min_by pick
    // the row-level argument at the ordering extremum — tie-free here by
    // fixture construction (verified: no duplicate per-group max/min
    // o_totalprice at sf0.001/0.01/0.1; DuckDB's arg_max takes no composite
    // ordering key, so a tie would be engine-arbitrary on both sides).
    "q49_argmax" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            max_by(col("o_orderkey"), col("o_totalprice")).as("top_order"),
            min_by(col("o_orderkey"), col("o_totalprice")).as("bottom_order"),
            count_if(col("o_totalprice") > 200000.0).as("n_big"),
            bool_and(col("o_totalprice") > 1000.0).as("all_over_1k"),
            bool_or(col("o_orderstatus") === "P").as("any_pending"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  arg_max(o_orderkey, o_totalprice) AS top_order,
             |  arg_min(o_orderkey, o_totalprice) AS bottom_order,
             |  cast(count_if(o_totalprice > 200000.0) AS BIGINT) AS n_big,
             |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
             |  bool_or(o_orderstatus = 'P') AS any_pending
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Interpolated (continuous) percentiles — the complement of the
    // discrete quantiles in q07/q08. Over integral doubles (l_quantity
    // 1..50) every lower+frac*(upper-lower) step is dyadic-exact, so the
    // engines' interpolation arithmetic cannot diverge. Like quantileDisc
    // this materializes per-group sorted values — bounded groups only;
    // percentile_approx is the unbounded-group path.
    "q52_percentile_cont" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .groupBy("l_returnflag")
          .agg(
            percentile(col("l_quantity"), lit(0.25)).as("q25_qty"),
            median(col("l_quantity")).as("med_qty"),
            percentile(col("l_quantity"), lit(0.75)).as("q75_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  quantile_cont(l_quantity, 0.25) AS q25_qty,
             |  median(l_quantity) AS med_qty,
             |  quantile_cont(l_quantity, 0.75) AS q75_qty,
             |  count(*) AS n
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Frame-navigation value windows: first/last/nth over a sliding ROWS
    // frame (trailing 3 rows) — deterministic under the total order
    // (o_orderkey unique per custkey).
    "q53_value_windows" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
          .rowsBetween(-2, Window.currentRow)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            first("o_totalprice").over(w).as("frame_first"),
            last("o_totalprice").over(w).as("frame_last"),
            nth_value(col("o_totalprice"), 2).over(w).as("frame_second"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  first_value(o_totalprice) OVER w AS frame_first,
             |  last_value(o_totalprice) OVER w AS frame_last,
             |  nth_value(o_totalprice, 2) OVER w AS frame_second
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
             |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Scalar math/null surface (widens q13): integer-safe rounding modes,
    // IEEE-exact sqrt, null-skipping greatest/least, nullif/ifnull.
    // 0-decimal round only: both engines round the same binary double
    // half-away-from-zero, but at fractional scales DuckDB's C-multiply
    // round and Spark's exact-BigDecimal round can disagree on values whose
    // decimal expansion straddles the binary representation error.
    "q54_math_scalars" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_linenumber") === 1)
          .select(col("l_orderkey"),
            round(col("l_extendedprice")).as("price_round"),
            floor(col("l_extendedprice")).cast("double").as("price_floor"),
            ceil(col("l_extendedprice")).cast("double").as("price_ceil"),
            sqrt(col("l_quantity")).as("qty_sqrt"),
            signum(col("l_discount") - lit(0.05)).as("disc_sign"),
            pmod(col("l_partkey"), lit(7L)).as("part_mod7"),
            greatest(col("l_quantity"), col("l_discount") * 100, lit(10.0)).as("g"),
            least(col("l_tax"), col("l_discount")).as("l"),
            nullif(col("l_returnflag"), lit("N")).as("flag_or_null"),
            coalesce(nullif(col("l_linestatus"), lit("F")), lit("fallback")).as("status_norm"))
          .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
             |  round(l_extendedprice) AS price_round,
             |  cast(floor(l_extendedprice) AS double) AS price_floor,
             |  cast(ceil(l_extendedprice) AS double) AS price_ceil,
             |  sqrt(l_quantity) AS qty_sqrt,
             |  cast(sign(l_discount - 0.05) AS double) AS disc_sign,
             |  mod(l_partkey, 7) AS part_mod7,
             |  greatest(l_quantity, l_discount * 100, 10.0) AS g,
             |  least(l_tax, l_discount) AS l,
             |  nullif(l_returnflag, 'N') AS flag_or_null,
             |  coalesce(nullif(l_linestatus, 'F'), 'fallback') AS status_norm
             |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin)),

    // Regex + calendar surface: extract-all, replace, split, last_day,
    // interval arithmetic on NTZ, ISO day-of-week (Spark weekday is Mon=0,
    // DuckDB isodow is Mon=1), day diff vs an epoch date.
    "q55_regex_dates" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .select(col("o_orderkey"),
            regexp_replace(col("o_orderpriority"), "^[0-9]-", "").as("prio_word"),
            array_join(regexp_extract_all(col("o_orderpriority"), lit("[A-Z]+"), lit(0)), ",")
              .as("prio_letters"),
            element_at(split(col("o_orderpriority"), "-"), 1).as("prio_num"),
            // DATE stays out of the output contract: Spark writes date32
            // where DuckDB yields datetime — surface as naive timestamp
            last_day(col("o_orderdate")).cast("timestamp_ntz").as("month_end"),
            (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts"),
            (weekday(col("o_orderdate")) + 1).cast("long").as("isodow"),
            datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
              .cast("long").as("days_since_95"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  regexp_replace(o_orderpriority, '^[0-9]-', '') AS prio_word,
             |  array_to_string(regexp_extract_all(o_orderpriority, '[A-Z]+'), ',') AS prio_letters,
             |  split_part(o_orderpriority, '-', 1) AS prio_num,
             |  cast(last_day(o_orderdate) AS timestamp) AS month_end,
             |  o_orderdate + INTERVAL 30 DAY AS due_ts,
             |  isodow(o_orderdate) AS isodow,
             |  date_diff('day', DATE '1995-01-01', o_orderdate) AS days_since_95
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    // Subquery entry path: correlated EXISTS + an exact-arithmetic scalar
    // subquery, through spark.sql — Spark decorrelates the EXISTS to a
    // semi join and evaluates the scalar subquery once (not per row).
    "q56_exists_subquery" -> QueryDef(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer")
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        s.sql("""
          SELECT c.c_custkey, c.c_name
          FROM customer c
          WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_totalprice > (
                SELECT cast(sum(cast(o_totalprice AS decimal(18,6))) AS double) / count(*)
                FROM orders))
          ORDER BY c.c_custkey""")
      },
      Some("""SELECT c.c_custkey, c.c_name
             |FROM customer c
             |WHERE EXISTS (
             |  SELECT 1 FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |    AND o.o_totalprice > (
             |      SELECT cast(sum(cast(o_totalprice AS decimal(18,6))) AS double) / count(*)
             |      FROM orders))
             |ORDER BY c.c_custkey""".stripMargin)),

    // Dynamic pivot: same wide rollup as q38 but the pivot values come from
    // a runtime DISTINCT scan (Spark collects them to the driver and sorts
    // — the documented cost of dynamic schemas; fine when the dimension is
    // genuinely low-cardinality, an anti-pattern otherwise). The fixture's
    // status domain is exactly {F, O, P}, so the oracle is q38's.
    "q59_dynamic_pivot" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus")
          .agg(count(lit(1)).as("n"),
            sumExact(col("o_totalprice")).as("spend"))
          // fill only columns the discovered pivot domain actually produced —
          // a fixture missing a status would otherwise make na.fill throw
          .transform(df => df.na.fill(0L,
            Seq("F_n", "O_n", "P_n").filter(df.columns.contains)))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F_n",
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) FILTER (WHERE o_orderstatus = 'F') AS double) AS "F_spend",
             |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O_n",
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) FILTER (WHERE o_orderstatus = 'O') AS double) AS "O_spend",
             |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P_n",
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) FILTER (WHERE o_orderstatus = 'P') AS double) AS "P_spend"
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Hopping (sliding) time windows — the batch form of the streaming
    // hop aggregate: every event lands in duration/slide = 3 overlapping
    // 15-minute windows. Spark's window() generator expands each row to
    // its covering windows map-side (an Expand, not a join), then one
    // partial-agg shuffle on the window start — the plan a 100 TB
    // time-series rollup wants. Oracle mirrors the epoch-aligned window
    // arithmetic with an explicit 3-offset unnest.
    "q58_hop_windows" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir).filter(col("ts").isNotNull)
          .groupBy(window(col("ts"), "15 minutes", "5 minutes"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct("user_id").as("n_users"))
          .select(col("window.start").as("window_start"),
            col("window.end").as("window_end"),
            col("n_events"), col("n_users"))
          .orderBy("window_start"),
      Some("""WITH hops AS (
             |  SELECT make_timestamp((epoch_us(ts) // 300000000 - k) * 300000000) AS window_start,
             |    user_id
             |  FROM events, unnest([0, 1, 2]) AS t(k)
             |  WHERE ts IS NOT NULL
             |)
             |SELECT window_start,
             |  window_start + INTERVAL 15 MINUTE AS window_end,
             |  count(*) AS n_events,
             |  count(DISTINCT user_id) AS n_users
             |FROM hops GROUP BY window_start
             |ORDER BY window_start""".stripMargin)),

    // Native session_window operator — the engine-level form of the
    // sessionization family (q45 window arithmetic, q47 typed fold): one
    // aggregate over merged gap intervals, and the ONLY formulation that
    // also runs stateful on an unbounded stream (watermark-evicted state;
    // see streaming.Sessions). Split rule is STRICT: an exactly-gap-length
    // silence merges, only a longer one splits (pinned empirically in
    // StreamingSessionsSpec) — the same `>` rule as q45's lag formulation.
    "q61_session_window" -> QueryDef(
      (s, dir) =>
        graft.streaming.Sessions.sessionAgg(
            Tables.events(s, dir).select("user_id", "ts"), "30 minutes")
          .orderBy("user_id", "session_start"),
      Some("""WITH marked AS (
             |  SELECT user_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts - lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_break
             |  FROM events WHERE ts IS NOT NULL
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
             |), sessions AS (
             |  SELECT user_id, ts,
             |    sum(is_break) OVER (PARTITION BY user_id ORDER BY ts
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
             |  FROM marked
             |)
             |SELECT user_id,
             |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
             |FROM sessions GROUP BY user_id, session_id
             |ORDER BY user_id, session_start""".stripMargin)),

    // Time-series gap-fill/resample (etl.Resample): dense hourly spine per
    // key via sequence+explode (distributed — no driver-side calendar),
    // zero-fill for silent hours, IGNORE-NULLS forward fill of the last
    // observation.
    "q62_gap_fill" -> QueryDef(
      (s, dir) =>
        graft.etl.Resample.hourlyGapFill(
            Tables.events(s, dir).select(col("event_type").as("line_id"), col("ts")),
            "line_id", "ts")
          .orderBy("line_id", "hour"),
      Some("""WITH hourly AS (
             |  SELECT event_type AS line_id, date_trunc('hour', ts) AS hour, count(*) AS n_events
             |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2
             |), bounds AS (
             |  SELECT line_id, min(hour) AS h0, max(hour) AS h1 FROM hourly GROUP BY 1
             |), spine AS (
             |  SELECT line_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour FROM bounds
             |)
             |SELECT s.line_id, s.hour,
             |  coalesce(h.n_events, 0) AS n_events,
             |  last_value(h.n_events IGNORE NULLS) OVER (PARTITION BY s.line_id ORDER BY s.hour
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_seen_n
             |FROM spine s LEFT JOIN hourly h ON s.line_id = h.line_id AND s.hour = h.hour
             |ORDER BY s.line_id, s.hour""".stripMargin)),

    // Stratified seeded sampling (training-data curation): downsample the
    // dominant strata, keep rare ones whole. Membership is a pure
    // (id, seed) scramble — the identical arithmetic runs in DuckDB SQL,
    // so the draw itself is ORACLE-HASH-GATED (not rows-only, as the
    // engine-RNG `Sampling.stratified` variant must be); SamplingSpec
    // additionally pins per-stratum rates and determinism.
    "q63_stratified_sample" -> QueryDef(
      (s, dir) =>
        graft.sampling.Sampling.stratifiedByHash(
            Tables.documents(s, dir), "lang", "doc_id",
            Map("en" -> 0.25, "de" -> 0.5, "fr" -> 0.5, "es" -> 0.5, "xx" -> 1.0),
            seed = 42L)
          .select("doc_id", "lang")
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang FROM (
             |  SELECT doc_id, lang,
             |    ((doc_id % 2147483648) * 2654435761 + 42) % 1048576 AS h,
             |    CASE lang WHEN 'en' THEN 0.25 WHEN 'de' THEN 0.5
             |              WHEN 'fr' THEN 0.5 WHEN 'es' THEN 0.5
             |              WHEN 'xx' THEN 1.0 ELSE 0.0 END AS r
             |  FROM documents
             |) WHERE h < r * 1048576 ORDER BY doc_id""".stripMargin)),

    // Exact heavy hitters over the token stream at bounded memory: a KPS
    // frequent-items sketch proposes candidates (no false negatives above
    // the support), then an exact count of ONLY the candidate set keeps
    // the true > 2% tokens — so the output is exact and ORACLE-HASH-GATED
    // against DuckDB's full group-by, while the engine never shuffles the
    // long tail. SamplingSpec separately pins the sketch's recall
    // guarantee.
    "q64_freq_tokens" -> QueryDef(
      (s, dir) => {
        val toks = Tables.documents(s, dir)
          .select(explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
        graft.sampling.Sampling.heavyHitters(toks, "token", 0.02)
          .orderBy("token")
      },
      Some("""WITH t AS (
             |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
             |  FROM documents
             |), tot AS (SELECT count(*) AS n_tot FROM t)
             |SELECT token, count(*) AS n FROM t, tot
             |GROUP BY token, n_tot
             |HAVING count(*) > 0.02 * n_tot
             |ORDER BY token""".stripMargin)),

    // Approximate percentile sketch (Greenwald-Khanna via
    // percentile_approx) — the bounded-memory unbounded-group path next to
    // the exact quantiles of q07/q08/q52. DuckDB's approx_quantile is a
    // DIFFERENT sketch, so the sketch values themselves can't hash-gate;
    // instead the query PROVES the sketch's contract in-band and the
    // oracle gates the proof: pXX_ok asserts (a) the sketch value is an
    // actual input element and (b) its exact rank — computed by a second
    // distributed counting pass, no group ever materialized — sits within
    // 0.01 of the target, while p50/p90_exact are quantile_disc values
    // DuckDB reproduces bit-for-bit (q08's precedent). The oracle expects
    // every pXX_ok TRUE, so a sketch drifting out of its error bound now
    // FAILS the driver gate instead of passing a row count.
    "q65_quantile_sketch" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_returnflag"), col("l_extendedprice"))
        val sk = li.groupBy("l_returnflag").agg(
          quantileApprox(col("l_extendedprice"), 0.5).as("p50_sk"),
          quantileApprox(col("l_extendedprice"), 0.9).as("p90_sk"),
          quantileDisc(col("l_extendedprice"), 0.5).as("p50_exact"),
          quantileDisc(col("l_extendedprice"), 0.9).as("p90_exact"),
          count(lit(1)).as("n"))
        def rankOk(sv: Column, tgt: Double) =
          (abs(count(when(col("l_extendedprice") <= sv, 1)).cast("double") /
            max("n").cast("double") - lit(tgt)) <= lit(0.01)) &&
            (count(when(col("l_extendedprice") === sv, 1)) >= 1)
        li.join(broadcast(sk), "l_returnflag")
          .groupBy("l_returnflag")
          .agg(
            max("n").as("n"),
            max("p50_exact").as("p50_exact"),
            max("p90_exact").as("p90_exact"),
            rankOk(col("p50_sk"), 0.5).as("p50_ok"),
            rankOk(col("p90_sk"), 0.9).as("p90_ok"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |  quantile_disc(l_extendedprice, 0.5) AS p50_exact,
             |  quantile_disc(l_extendedprice, 0.9) AS p90_exact,
             |  TRUE AS p50_ok, TRUE AS p90_ok
             |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)),

    // CDC-style keep-latest: one surviving row per key, the newest by
    // (ts, event_id) — the upsert-view staple over an append-only zone.
    // The rank-1 filter plans as WindowGroupLimit (verified for q11's
    // sibling shape in PlanSpec): per-key bounded state, no full sort of
    // the history at scale.
    "q69_keep_latest" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"), col("value"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .drop("rn")
          .orderBy("user_id")
      },
      Some("""SELECT user_id, event_id, ts, event_type, value FROM (
             |  SELECT user_id, event_id, ts, event_type, value,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
             |  FROM events WHERE ts IS NOT NULL
             |) WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    // String-function zoo (widens q13/q20): padding, translate, reverse,
    // repeat, substring position, left/right slices, char codes, prefix/
    // containment predicates, first-field split. (initcap omitted: DuckDB
    // 1.0 has no equivalent.)
    "q70_string_zoo" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            lpad(col("lang"), 5, "*").as("lang_pad"),
            rpad(col("lang"), 5, "-").as("lang_rpad"),
            translate(col("lang"), "aeiou", "AEIOU").as("lang_tr"),
            reverse(col("lang")).as("lang_rev"),
            repeat(col("lang"), 2).as("lang_x2"),
            instr(col("text"), "the").cast("long").as("the_pos"),
            substring(col("text"), 1, 2).as("head2"),
            expr("right(text, 2)").as("tail2"),
            ascii(col("lang")).cast("long").as("lang_ascii"),
            col("text").startsWith("The").as("starts_the"),
            col("text").contains("and").as("has_and"),
            substring_index(col("text"), " ", 1).as("first_word"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  lpad(lang, 5, '*') AS lang_pad,
             |  rpad(lang, 5, '-') AS lang_rpad,
             |  translate(lang, 'aeiou', 'AEIOU') AS lang_tr,
             |  reverse(lang) AS lang_rev,
             |  repeat(lang, 2) AS lang_x2,
             |  cast(instr(text, 'the') AS bigint) AS the_pos,
             |  left(text, 2) AS head2,
             |  right(text, 2) AS tail2,
             |  cast(ascii(lang) AS bigint) AS lang_ascii,
             |  starts_with(text, 'The') AS starts_the,
             |  contains(text, 'and') AS has_and,
             |  split_part(text, ' ', 1) AS first_word
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Correlated LATERAL subquery with per-row ORDER BY + LIMIT — top-2
    // orders per customer expressed as a lateral join (the SQL-standard
    // form of per-key top-k; Spark decorrelates it rather than executing
    // the subquery per row). Same rows as a rank()<=2 window, different
    // planner machinery exercised.
    "q71_lateral_topn" -> QueryDef(
      (s, dir) => {
        Tables.customer(s, dir).createOrReplaceTempView("customer")
        Tables.orders(s, dir).createOrReplaceTempView("orders")
        s.sql("""
          SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
          FROM customer c,
          LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders o
            WHERE o.o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
          ) o
          ORDER BY c.c_custkey, o.o_orderkey""")
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
             |FROM customer c,
             |LATERAL (
             |  SELECT o_orderkey, o_totalprice FROM orders o
             |  WHERE o.o_custkey = c.c_custkey
             |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
             |) o
             |ORDER BY c.c_custkey, o.o_orderkey""".stripMargin)),

    // JSON functions surface (F7's parse direction, beyond q15's regex
    // extraction): path extraction, schema-declared from_json, missing-key
    // null tolerance, nested paths and array length — against DuckDB's
    // JSON extension as the oracle. The oracle uses try_cast so a
    // malformed k degrades to a value diff, never an oracle abort; known
    // residual divergence if the fixture ever quotes k ({"k": "7"}):
    // from_json('k LONG') strictly yields NULL where try_cast parses 7.
    "q68_json_ops" -> QueryDef(
      (s, dir) => {
        val k = get_json_object(col("props"), "$.k")
        val doc = concat(lit("{\"a\": {\"b\": ["), k, lit(",2]}}"))
        // five JSON parses per row is exactly the CPU-dense expansion
        // shape the parallelism guard exists for — a single-split events
        // file would otherwise serialize the parse on a handful of cores
        graft.core.Parallelism.ensure(
            Tables.events(s, dir).select(col("event_id"), col("props")))
          .select(col("event_id"),
            k.cast("long").as("k"),
            from_json(col("props"), lit("k LONG")).getField("k").as("k_typed"),
            get_json_object(col("props"), "$.missing").as("k_missing"),
            get_json_object(doc, "$.a.b[0]").cast("long").as("b0"),
            json_array_length(get_json_object(doc, "$.a.b")).cast("long").as("blen"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id,
             |  try_cast(json_extract_string(props, '$.k') AS bigint) AS k,
             |  try_cast(json_extract_string(props, '$.k') AS bigint) AS k_typed,
             |  json_extract_string(props, '$.missing') AS k_missing,
             |  try_cast(json_extract_string('{"a": {"b": [' || json_extract_string(props, '$.k') || ',2]}}', '$.a.b[0]') AS bigint) AS b0,
             |  cast(json_array_length('{"a": {"b": [' || json_extract_string(props, '$.k') || ',2]}}', '$.a.b') AS bigint) AS blen
             |FROM events ORDER BY event_id""".stripMargin)),

    // UNPIVOT — the inverse of the q38/q59 pivot: melt the wide per-status
    // count columns back into (priority, status, n) rows. Spark plans it
    // as a single Expand (same machinery as grouping sets), no shuffle
    // beyond the source aggregate.
    "q72_unpivot" -> QueryDef(
      (s, dir) => {
        val wide = Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)))
          .na.fill(0L, Seq("F", "O", "P"))
        wide.unpivot(Array(col("o_orderpriority")),
            Array(col("F"), col("O"), col("P")), "status", "n")
          .orderBy("o_orderpriority", "status")
      },
      Some("""WITH wide AS (
             |  SELECT o_orderpriority,
             |    count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
             |    count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
             |    count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
             |  FROM orders GROUP BY o_orderpriority
             |)
             |SELECT o_orderpriority, status, n
             |FROM wide UNPIVOT (n FOR status IN ("F", "O", "P"))
             |ORDER BY o_orderpriority, status""".stripMargin)),

    // Running distinct count over an event-time window — no engine supports
    // count(DISTINCT) in a window frame directly, so both sides compose it
    // as distinct-of-collected (Spark collect_set, DuckDB list_distinct of
    // the windowed list): the standard "unique items seen so far" curve.
    "q73_running_distinct" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .filter(col("ts").isNotNull)
          .select(col("user_id"), col("event_id"),
            size(collect_set(col("event_type")).over(w)).cast("long")
              .as("n_types_seen"))
          .orderBy("user_id", "event_id")
      },
      Some("""SELECT user_id, event_id,
             |  len(list_distinct(list(event_type) OVER (
             |    PARTITION BY user_id ORDER BY ts, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))) AS n_types_seen
             |FROM events WHERE ts IS NOT NULL
             |ORDER BY user_id, event_id""".stripMargin)),

    // Aggregate FILTER clauses + IS DISTINCT FROM, as ONE dialect-portable
    // SQL text: the same string runs verbatim on Spark (engine side) and
    // DuckDB (oracle side) — the strongest form of the SQL-surface parity
    // claim, no per-dialect translation at all.
    "q74_filtered_agg" -> QueryDef(
      (s, dir) => {
        Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
        s.sql(filteredAggSql)
      },
      Some(filteredAggSql)),

    // Recursive CTE (Spark 4 UnionLoop): duplicate-cluster transitive
    // closure as one portable SQL text — see recursiveClosureSql. The
    // level limit is raised from the 100 default: depth tracks the
    // largest dup group, which a 100 TB corpus can push past 100 while
    // remaining bounded and tiny relative to corpus size.
    "q95_recursive_cte" -> QueryDef(
      (s, dir) => {
        Tables.documents(s, dir).createOrReplaceTempView("documents")
        s.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
        s.sql(recursiveClosureSql)
      },
      Some(recursiveClosureSql)),

    // HLL distinct sketch (Apache DataSketches via hll_sketch_agg): the
    // mergeable bounded-memory distinct count for 100 TB group-bys. DuckDB's
    // approx_count_distinct is a DIFFERENT HLL, so the estimate itself can't
    // hash-gate; instead the query PROVES the sketch's error contract
    // in-band (q65's pattern): `hll_ok` asserts the estimate sits within 5%
    // of the exact distinct count — at lgConfigK=14 the sketch's relative
    // standard error is ~0.65%, so 5% is a ≥7σ bound that a broken sketch
    // (or a broken merge) cannot pass, while HLL's determinism on fixed
    // input keeps the gate replayable. The oracle expects every hll_ok
    // TRUE plus the exact counts bit-for-bit; ExtendedSpec keeps the
    // partition-merge associativity law.
    "q60_hll_sketch" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(14)))
              .as("approx_users"),
            countDistinct(col("user_id")).as("exact_users"),
            count(lit(1)).as("n_events"))
          .select(col("event_type"), col("exact_users"), col("n_events"),
            (abs(col("approx_users").cast("double") /
                col("exact_users").cast("double") - 1.0d) <= lit(0.05d))
              .as("hll_ok"))
          .orderBy("event_type"),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  count(*) AS n_events, TRUE AS hll_ok
             |FROM events GROUP BY 1 ORDER BY 1""".stripMargin)))
}
