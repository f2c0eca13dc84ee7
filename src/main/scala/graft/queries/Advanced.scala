package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.functions.GraftFunctions._

/** Advanced relational operators beyond the reference's own surface: as-of
  * join, range join, hierarchical rollup, and order-independent statistics —
  * the time-series / OLAP staples a lakehouse engine is expected to carry.
  * Each is composed from built-in operators per the preference order
  * (SURVEY §2.10(a)): Spark's planner handles them well once the
  * composition is shuffle-clean, so no custom physical operator is needed.
  */
object Advanced extends QueryModule {

  /** Typed row for the Dataset-API query (q43). */
  case class Li(l_returnflag: String, l_quantity: Double, l_extendedprice: Double)

  def queries: Map[String, QueryDef] = Map(

    // CDC merge-into: apply a derived changeset (updates on keys % 7,
    // deletes on % 13 — which win over the updates on % 91 via the higher
    // version, inserts key-shifted from % 101) to the orders snapshot.
    // One window shuffle on the changeset + a broadcast/bucketable
    // anti-join against the snapshot; nothing scales with snapshot×changes.
    "q101_merge_upsert" -> QueryDef(
      (s, dir) => {
        val snap = Tables.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
        val updates = snap.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderstatus", lit("X"))
          .withColumn("version", lit(2L)).withColumn("deleted", lit(false))
        val deletes = snap.filter(col("o_orderkey") % 13 === 0)
          .withColumn("version", lit(3L)).withColumn("deleted", lit(true))
        val inserts = snap.filter(col("o_orderkey") % 101 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + lit(10000000L))
          .withColumn("version", lit(1L)).withColumn("deleted", lit(false))
        graft.etl.Merge.merge(snap,
            updates.unionByName(deletes).unionByName(inserts),
            Seq("o_orderkey"), "version", "deleted")
          .orderBy("o_orderkey")
      },
      Some("""WITH snap AS (
             |  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |), changes AS (
             |  SELECT o_orderkey, 'X' AS o_orderstatus, o_totalprice,
             |         2 AS version, false AS deleted
             |  FROM snap WHERE o_orderkey % 7 = 0
             |  UNION ALL
             |  SELECT o_orderkey, o_orderstatus, o_totalprice, 3, true
             |  FROM snap WHERE o_orderkey % 13 = 0
             |  UNION ALL
             |  SELECT o_orderkey + 10000000, o_orderstatus, o_totalprice, 1, false
             |  FROM snap WHERE o_orderkey % 101 = 0
             |), latest AS (
             |  SELECT * FROM (
             |    SELECT *, row_number() OVER (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
             |    FROM changes) WHERE rn = 1
             |)
             |SELECT o_orderkey, o_orderstatus, o_totalprice FROM snap
             |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM latest)
             |UNION ALL
             |SELECT o_orderkey, o_orderstatus, o_totalprice FROM latest WHERE NOT deleted
             |ORDER BY o_orderkey""".stripMargin)),

    // As-of join (point-in-time lookup): for each purchase, the same user's
    // latest click at-or-before it. Composed as union → one window pass:
    // tag both streams, sort by (ts, tag) with clicks first at ties
    // (inclusive semantics), carry the last click forward. ONE shuffle on
    // user_id — the classic scalable formulation; a join-based formulation
    // would need an expensive inequality join.
    "q18_asof_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        // dedupe clicks to one per (user, ts) so at-equal-ts picks are
        // well-defined in both engines
        val clicks = ev.filter(col("event_type") === "click")
          .groupBy("user_id", "ts").agg(max("value").as("click_value"))
          .select(col("user_id"), col("ts"), lit(null).cast("long").as("event_id"),
            col("click_value"), lit(0).as("tag"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(null).cast("double").as("click_value"), lit(1).as("tag"))
        val w = Window.partitionBy("user_id").orderBy("ts", "tag")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionByName(purchases)
          .withColumn("click_ts",
            last(when(col("tag") === 0, col("ts")), ignoreNulls = true).over(w))
          .withColumn("last_click_value",
            last(when(col("tag") === 0, col("click_value")), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id"), col("user_id"), col("ts"),
            col("click_ts"), col("last_click_value").as("click_value"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
             |), c AS (
             |  SELECT user_id, ts AS c_ts, max(value) AS click_value
             |  FROM events WHERE event_type = 'click' GROUP BY 1, 2
             |)
             |SELECT p.event_id, p.user_id, p.ts, c.c_ts AS click_ts, c.click_value
             |FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.c_ts
             |ORDER BY p.event_id""".stripMargin)),

    // Range join: per purchase, how many same-user events landed in the
    // strictly-preceding hour. Scalable shape: events bucket to the hour,
    // each purchase probes its own and the previous bucket (every candidate
    // falls in exactly one, so no dedup), the range predicate filters
    // exactly — an equi-join the planner can hash/shuffle, instead of a
    // quadratic inequality join.
    "q19_range_join" -> QueryDef(
      (s, dir) => {
        val ev = Tables.events(s, dir)
        val usPerHour = 3600L * 1000000L
        // integer `div` for bucketing: a double division + floor can round
        // across a bucket boundary and silently drop candidates
        // buckets derive FROM the epoch-micros columns (integer `div` — a
        // double division could round across a bucket boundary), so the
        // NTZ-cast rule lives only in GraftFunctions.epochUs
        val e = ev.select(col("user_id").as("e_user"), epochUs(col("ts")).as("e_us"))
          .withColumn("e_bucket", expr(s"e_us div $usPerHour"))
        val p = ev.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), epochUs(col("ts")).as("p_us"))
          .withColumn("p_bucket", expr(s"p_us div $usPerHour"))
          .withColumn("probe", explode(array(col("p_bucket") - 1, col("p_bucket"))))
        p.join(e,
            col("user_id") === col("e_user") && col("probe") === col("e_bucket") &&
              col("e_us") >= col("p_us") - usPerHour && col("e_us") < col("p_us"),
            "left")
          .groupBy("event_id", "user_id")
          .agg(count(col("e_us")).as("n_prev_hour"))
          .orderBy("event_id")
      },
      Some("""WITH p AS (
             |  SELECT event_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'
             |)
             |SELECT p.event_id, p.user_id, count(e.ts) AS n_prev_hour
             |FROM p LEFT JOIN events e
             |  ON e.user_id = p.user_id
             |  AND e.ts >= p.p_ts - INTERVAL '1 hour' AND e.ts < p.p_ts
             |GROUP BY 1, 2 ORDER BY p.event_id""".stripMargin)),

    // Hierarchical rollup: status × priority with subtotals + grand total.
    // Explicit NULLS FIRST on both sides (Spark defaults nulls-first,
    // DuckDB nulls-last — the one place their ORDER BY defaults differ).
    "q25_rollup" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .rollup("o_orderstatus", "o_orderpriority")
          .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
            sumExact(col("o_totalprice")).as("sum_price"))
          .select("o_orderstatus", "o_orderpriority", "gid", "n_orders", "sum_price")
          .orderBy(col("gid"), asc_nulls_first("o_orderstatus"),
            asc_nulls_first("o_orderpriority")),
      Some("""SELECT o_orderstatus, o_orderpriority, grouping_id(o_orderstatus, o_orderpriority) AS gid,
             |  count(*) AS n_orders,
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) AS double) AS sum_price
             |FROM orders
             |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
             |ORDER BY gid, o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)),

    // Skew-proof two-stage salted aggregation. The result is IDENTICAL to
    // a direct groupBy (exact decimal partials are associative), so the
    // plain-SQL oracle verifies the technique end-to-end.
    "q27_salted_agg" -> QueryDef(
      (s, dir) =>
        graft.core.Skew.saltedAggregate(
          Tables.lineitem(s, dir),
          keys = Seq("l_returnflag"),
          saltFrom = col("l_orderkey"),
          sums = Map(
            "sum_qty" -> col("l_quantity").cast("decimal(18,6)"),
            "revenue" -> (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
              .cast("decimal(18,6)")))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
             |  cast(sum(cast(l_quantity AS decimal(18,6))) AS double) AS sum_qty,
             |  cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS decimal(18,6))) AS double) AS revenue,
             |  count(*) AS n_rows
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // RANGE window frame: per customer, running order count + spend over a
    // trailing 30-day event-time window (value-based frame, not row-based).
    "q28_range_frame" -> QueryDef(
      (s, dir) => {
        val us30d = 30L * 86400L * 1000000L
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_us"))
          .rangeBetween(-us30d, 0)
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            // o_orderdate arrives as TIMESTAMP_NTZ (parquet ms, not
            // UTC-adjusted); cast to session-TZ timestamp (UTC-pinned) so
            // unix_micros matches DuckDB's epoch_us over the naive value
            unix_micros(col("o_orderdate").cast("timestamp")).as("o_us"),
            col("o_totalprice"))
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
            count(lit(1)).over(w).as("n_30d"),
            sum(col("o_totalprice").cast("decimal(18,6)")).over(w)
              .cast("double").as("spend_30d"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  count(*) OVER w AS n_30d,
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) OVER w AS double) AS spend_30d
             |FROM (SELECT *, epoch_us(o_orderdate) AS o_us FROM orders)
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_us
             |             RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // Edit distance (integer DP — engine-portable): each doc's head vs the
    // previous doc's head within its language, via lag + levenshtein.
    "q29_edit_distance" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("lang").orderBy("doc_id")
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            substring(col("text"), 1, 30).as("head"))
          .withColumn("prev_head", lag("head", 1).over(w))
          .filter(col("prev_head").isNotNull)
          .select(col("doc_id"), col("lang"),
            levenshtein(col("head"), col("prev_head")).as("edit_dist"))
          .orderBy("doc_id")
      },
      Some("""WITH h AS (
             |  SELECT doc_id, lang, substr(text, 1, 30) AS head,
             |    lag(substr(text, 1, 30)) OVER (PARTITION BY lang ORDER BY doc_id) AS prev_head
             |  FROM documents
             |)
             |SELECT doc_id, lang, levenshtein(head, prev_head) AS edit_dist
             |FROM h WHERE prev_head IS NOT NULL ORDER BY doc_id""".stripMargin)),

    // Distribution analytics windows: percent_rank / cume_dist / ntile —
    // all deterministic under a total order (unique tie-break key), so the
    // integer-ratio doubles match across engines bit-for-bit.
    "q36_window_analytics" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).as("quartile"))
          .orderBy("o_custkey", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
             |  percent_rank() OVER w AS pr,
             |  cume_dist() OVER w AS cd,
             |  ntile(4) OVER w AS quartile
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |ORDER BY o_custkey, o_orderkey""".stripMargin)),

    // Ordered string aggregation (DuckDB string_agg ... ORDER BY ≡ sorted
    // collect + join; sort key prepended in a struct so array_sort orders
    // by it, then projected away).
    "q37_string_agg" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_custkey")
          .agg(concat_ws(",",
            transform(
              array_sort(collect_list(struct(col("o_orderkey"), col("o_orderstatus")))),
              x => x.getField("o_orderstatus"))).as("statuses"))
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey,
             |  string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS statuses
             |FROM orders GROUP BY o_custkey ORDER BY o_custkey""".stripMargin)),

    // Pivot (wide rollup): order-status counts + exact spend spread across
    // columns. Explicit pivot values keep the schema static (a dynamic
    // pivot would need a driver-side distinct scan first — an anti-pattern
    // at scale); oracle mirrors with FILTER aggregates.
    "q38_pivot" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .groupBy("o_orderpriority")
          .pivot("o_orderstatus", Seq("F", "O", "P"))
          .agg(count(lit(1)).as("n"),
            sumExact(col("o_totalprice")).as("spend"))
          // an absent (priority, status) cell pivots to NULL but the
          // oracle's count(*) FILTER gives 0 — normalize the count columns
          // (sum cells are NULL on both sides and must stay so)
          .na.fill(0L, Seq("F_n", "O_n", "P_n"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  count(*) FILTER (WHERE o_orderstatus = 'F') AS "F_n",
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) FILTER (WHERE o_orderstatus = 'F') AS double) AS "F_spend",
             |  count(*) FILTER (WHERE o_orderstatus = 'O') AS "O_n",
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) FILTER (WHERE o_orderstatus = 'O') AS double) AS "O_spend",
             |  count(*) FILTER (WHERE o_orderstatus = 'P') AS "P_n",
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) FILTER (WHERE o_orderstatus = 'P') AS double) AS "P_spend"
             |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Cube: all 2^2 grouping combinations of (returnflag, linestatus).
    "q39_cube" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .cube("l_returnflag", "l_linestatus")
          .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
            sumExact(col("l_quantity")).as("sum_qty"))
          .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
            asc_nulls_first("l_linestatus")),
      Some("""SELECT l_returnflag, l_linestatus, grouping_id(l_returnflag, l_linestatus) AS gid,
             |  count(*) AS n,
             |  cast(sum(cast(l_quantity AS decimal(18,6))) AS double) AS sum_qty
             |FROM lineitem
             |GROUP BY CUBE (l_returnflag, l_linestatus)
             |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)),

    // Gap-based sessionization — the canonical events-stream operator:
    // a new session starts after a >30-minute silence per user. Session
    // ids are cumulative break counts (one window pass), rolled up to one
    // row per session. Two window passes + one aggregate, all partitioned
    // by user — a single shuffle of the events table.
    "q45_sessionize" -> QueryDef(
      (s, dir) => {
        val gapUs = 30L * 60L * 1000000L
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        Tables.events(s, dir)
          .select(col("user_id"), col("event_id"), col("ts"))
          .withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("is_break",
            when(col("prev_ts").isNull ||
              epochDiffUs(col("ts"), col("prev_ts")) > gapUs, 1L)
              .otherwise(0L))
          .withColumn("session_id",
            sum("is_break").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .groupBy("user_id", "session_id")
          .agg(min("ts").as("session_start"), max("ts").as("session_end"),
            count(lit(1)).as("n_events"))
          .orderBy("user_id", "session_id")
      },
      Some("""WITH marked AS (
             |  SELECT user_id, event_id, ts,
             |    CASE WHEN lag(ts) OVER w IS NULL
             |           OR epoch_us(ts - lag(ts) OVER w) > 1800000000 THEN 1 ELSE 0 END AS is_break
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
             |), sessions AS (
             |  SELECT user_id, event_id, ts,
             |    cast(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
             |  FROM marked
             |)
             |SELECT user_id, session_id,
             |  min(ts) AS session_start, max(ts) AS session_end, count(*) AS n_events
             |FROM sessions GROUP BY 1, 2 ORDER BY user_id, session_id""".stripMargin)),

    // Pure-SQL entry path: the headway mart expressed as spark.sql text
    // over registered views — proves the SQL API rides the same engine
    // (and the same oracle) as the DataFrame path.
    "q42_sql_headways" -> QueryDef(
      (s, dir) => {
        // only the queried view — registering every fixture here would
        // charge 10 parquet footer reads to this query and couple it to
        // files it never touches
        Tables.events(s, dir).createOrReplaceTempView("events")
        s.sql("""
          WITH arrivals AS (
            SELECT event_type AS line_id, cast(user_id AS string) AS stop_id, ts AS event_ts
            FROM events WHERE ts IS NOT NULL
          ), ordered AS (
            SELECT *, lag(event_ts) OVER (PARTITION BY line_id, stop_id ORDER BY event_ts) AS prev_ts
            FROM arrivals
          ), gaps AS (
            SELECT line_id, stop_id,
                   unix_micros(cast(event_ts AS timestamp)) - unix_micros(cast(prev_ts AS timestamp)) AS headway_us,
                   cast(date_trunc('hour', event_ts) AS timestamp_ntz) AS hour
            FROM ordered WHERE prev_ts IS NOT NULL
          )
          SELECT line_id, stop_id, hour,
            cast(sum(headway_us) AS double) / count(*) / 1000000.0 AS avg_headway_s
          FROM gaps GROUP BY 1, 2, 3
          ORDER BY line_id, stop_id, hour""")
      },
      Some(Flagship.headwayGapsCte +
        """
          |SELECT line_id, stop_id, hour,
          |  cast(sum(headway_us) AS double) / count(*) / 1000000.0 AS avg_headway_s
          |FROM gaps GROUP BY 1, 2, 3
          |ORDER BY line_id, stop_id, hour""".stripMargin)),

    // Typed Dataset path: case-class rows + a custom BigDecimal-exact
    // Aggregator (§2.10's typed-aggregator mechanism), same oracle shape
    // as the SQL casts.
    "q43_typed_agg" -> QueryDef(
      (s, dir) => {
        import s.implicits._
        val ds = Tables.lineitem(s, dir)
          .select("l_returnflag", "l_quantity", "l_extendedprice").as[Li]
        ds.groupByKey(_.l_returnflag)
          .agg(
            new graft.functions.DecimalSum[Li](_.l_quantity).toColumn.name("sum_qty"),
            new graft.functions.DecimalSum[Li](_.l_extendedprice).toColumn.name("sum_price"))
          .toDF("l_returnflag", "sum_qty", "sum_price")
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
             |  cast(sum(cast(l_quantity AS decimal(18,6))) AS double) AS sum_qty,
             |  cast(sum(cast(l_extendedprice AS decimal(18,6))) AS double) AS sum_price
             |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)),

    // Order-independent statistics: variance/stddev/correlation from exact
    // decimal power sums (the engines' native Welford/pairwise streams are
    // summation-order-dependent and would never hash-match). count(distinct)
    // rides along as the exact-dedup aggregate.
    "q26_stats" -> QueryDef(
      (s, dir) => {
        val sx = sum(col("value").cast("decimal(18,6)")).cast("double")
        val sxx = sum((col("value") * col("value")).cast("decimal(24,6)")).cast("double")
        val sy = sum(col("user_id").cast("decimal(18,6)")).cast("double")
        val syy = sum((col("user_id") * col("user_id")).cast("decimal(24,6)")).cast("double")
        val sxy = sum((col("value") * col("user_id")).cast("decimal(24,6)")).cast("double")
        val n = count(lit(1)).cast("double")
        Tables.events(s, dir)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n"),
            countDistinct(col("user_id")).as("n_users"),
            ((sxx - sx * sx / n) / (n - 1)).as("var_value"),
            sqrt((sxx - sx * sx / n) / (n - 1)).as("stddev_value"),
            ((sxy - sx * sy / n) /
              (sqrt(sxx - sx * sx / n) * sqrt(syy - sy * sy / n))).as("corr_value_user"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  count(*) AS n,
             |  count(DISTINCT user_id) AS n_users,
             |  (cast(sum(cast(value * value AS decimal(24,6))) AS double)
             |     - cast(sum(cast(value AS decimal(18,6))) AS double) * cast(sum(cast(value AS decimal(18,6))) AS double) / cast(count(*) AS double))
             |    / (cast(count(*) AS double) - 1) AS var_value,
             |  sqrt((cast(sum(cast(value * value AS decimal(24,6))) AS double)
             |     - cast(sum(cast(value AS decimal(18,6))) AS double) * cast(sum(cast(value AS decimal(18,6))) AS double) / cast(count(*) AS double))
             |    / (cast(count(*) AS double) - 1)) AS stddev_value,
             |  (cast(sum(cast(value * user_id AS decimal(24,6))) AS double)
             |     - cast(sum(cast(value AS decimal(18,6))) AS double) * cast(sum(cast(user_id AS decimal(18,6))) AS double) / cast(count(*) AS double))
             |    / (sqrt(cast(sum(cast(value * value AS decimal(24,6))) AS double)
             |          - cast(sum(cast(value AS decimal(18,6))) AS double) * cast(sum(cast(value AS decimal(18,6))) AS double) / cast(count(*) AS double))
             |       * sqrt(cast(sum(cast(user_id * user_id AS decimal(24,6))) AS double)
             |          - cast(sum(cast(user_id AS decimal(18,6))) AS double) * cast(sum(cast(user_id AS decimal(18,6))) AS double) / cast(count(*) AS double))) AS corr_value_user
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)))
}
