package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}
import graft.functions.GraftFunctions._

/** Relational operator inventory over the TPC-H-ish fixtures: projections,
  * filters, joins (shuffle/broadcast/semi/anti), hash aggregates, window
  * functions, sorts/top-k, set ops, scalar functions (SURVEY §2.2-§2.8).
  *
  * Every query is written plan-first:
  *  - filters and projections sit directly on the scan so Catalyst pushes
  *    them into parquet (`PushedFilters`/`ReadSchema`);
  *  - aggregation happens *before* fact-to-dimension joins where possible
  *    (shrinks shuffle input);
  *  - small dimensions get an explicit `broadcast()` hint;
  *  - doubles are aggregated via exact decimal/integer paths (SURVEY H7)
  *    and every ORDER BY carries a unique tie-break key, so results are
  *    bit-deterministic and hash-match the DuckDB oracle.
  */
object Relational extends QueryModule {

  def queries: Map[String, QueryDef] = Map(

    // P1-P5 + §2.6: pushed filter + projection + top-k with total order.
    "q02_filter_topk" -> QueryDef(
      (s, dir) =>
        Tables.lineitem(s, dir)
          .filter(col("l_shipdate") >= to_timestamp(lit("1995-06-01")) &&
            col("l_discount").between(0.02, 0.09))
          .select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate")
          .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
          .limit(100),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_shipdate
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1995-06-01'
             |  AND l_discount BETWEEN 0.02 AND 0.09
             |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
             |LIMIT 100""".stripMargin)),

    // §2.3 joins: fact-fact equi-join, aggregated *before* the dimension
    // join so the customer join sees one row per customer, not per lineitem.
    "q03_join_revenue" -> QueryDef(
      (s, dir) => {
        val li = Tables.lineitem(s, dir)
          .select(col("l_orderkey"),
            (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
        val o = Tables.orders(s, dir).select("o_orderkey", "o_custkey")
        val perCust = li.join(o, col("l_orderkey") === col("o_orderkey"))
          .groupBy("o_custkey").agg(sumExact(col("rev")).as("revenue"))
        perCust.join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
          .select(col("c_custkey"), col("c_name"), col("revenue"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name,
             |  cast(sum(cast(l_extendedprice * (1.0 - l_discount) AS decimal(18,6))) AS double) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |GROUP BY c_custkey, c_name
             |ORDER BY c_custkey""".stripMargin)),

    // §2.3: snowflake dimension rollup with explicit broadcast of the small
    // dims (region × nation is tiny at any scale factor).
    "q04_region_rollup" -> QueryDef(
      (s, dir) => {
        val dims = Tables.nation(s, dir)
          .join(Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))
          .select("n_nationkey", "r_name")
        Tables.customer(s, dir)
          .join(broadcast(dims), col("c_nationkey") === col("n_nationkey"))
          .groupBy("r_name")
          .agg(count(lit(1)).as("n_customers"),
            sumExact(col("c_acctbal")).as("sum_acctbal"))
          .orderBy("r_name")
      },
      Some("""SELECT r_name,
             |  count(*) AS n_customers,
             |  cast(sum(cast(c_acctbal AS decimal(18,6))) AS double) AS sum_acctbal
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name
             |ORDER BY r_name""".stripMargin)),

    // §2.3: left-semi (EXISTS) — no fan-out, dedup-free by construction.
    "q05_semi_join" -> QueryDef(
      (s, dir) => {
        val big = Tables.lineitem(s, dir).filter(col("l_quantity") > 49)
          .select("l_orderkey")
        Tables.orders(s, dir)
          .join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_totalprice")
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |              WHERE l_orderkey = o_orderkey AND l_quantity > 49)
             |ORDER BY o_orderkey""".stripMargin)),

    // §2.3: left-anti (NOT EXISTS) — customers with no big-ticket order
    // (plain "no orders at all" is empty at every sf; this stays non-trivial).
    "q06_anti_join" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .join(Tables.orders(s, dir)
              .filter(col("o_totalprice") > 300000).select("o_custkey"),
            col("c_custkey") === col("o_custkey"), "left_anti")
          .select("c_custkey", "c_name")
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey, c_name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders
             |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
             |ORDER BY c_custkey""".stripMargin)),

    // A3/H1: discrete quantiles per bounded group (exact, DuckDB rule).
    "q08_quantile_brand" -> QueryDef(
      (s, dir) =>
        Tables.part(s, dir)
          .groupBy("p_brand")
          .agg(
            quantileDisc(col("p_retailprice"), 0.5).as("p50_price"),
            quantileDisc(col("p_retailprice"), 0.9).as("p90_price"),
            min("p_retailprice").as("min_price"),
            max("p_retailprice").as("max_price"),
            count(lit(1)).as("n_parts"))
          .orderBy("p_brand"),
      Some("""SELECT p_brand,
             |  quantile_disc(p_retailprice, 0.5) AS p50_price,
             |  quantile_disc(p_retailprice, 0.9) AS p90_price,
             |  min(p_retailprice) AS min_price,
             |  max(p_retailprice) AS max_price,
             |  count(*) AS n_parts
             |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin)),

    // U1: union-all concatenation (reference's per-stop row-set extend).
    "q09_union" -> QueryDef(
      (s, dir) =>
        Tables.customer(s, dir)
          .select(col("c_name").as("name"), lit("customer").as("kind"))
          .unionByName(Tables.supplier(s, dir)
            .select(col("s_name").as("name"), lit("supplier").as("kind")))
          .orderBy("kind", "name"),
      Some("""SELECT c_name AS name, 'customer' AS kind FROM customer
             |UNION ALL
             |SELECT s_name AS name, 'supplier' AS kind FROM supplier
             |ORDER BY kind, name""".stripMargin)),

    // P8-adjacent: DISTINCT (hash dedup of a projection).
    "q10_distinct" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          .select("o_orderstatus", "o_orderpriority")
          .distinct()
          .orderBy("o_orderstatus", "o_orderpriority"),
      Some("""SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
             |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)),

    // W1-family: ranking trio over a per-customer window; unique tie-break
    // (o_orderkey) keeps row_number deterministic across engines.
    "q11_window_topk" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            row_number().over(w).as("rn"),
            rank().over(w).as("rk"),
            dense_rank().over(w).as("drk"))
          .filter(col("rn") <= 3)
          .orderBy("o_custkey", "rn")
      },
      Some("""SELECT * FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    row_number() OVER w AS rn,
             |    rank() OVER w AS rk,
             |    dense_rank() OVER w AS drk
             |  FROM orders
             |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
             |) WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin)),

    // W1-family: running frame aggregate + lag/lead offsets. The running sum
    // goes through an exact decimal so frame accumulation order can't show.
    "q12_running_total" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        Tables.orders(s, dir)
          .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"),
            sum(col("o_totalprice").cast("decimal(18,6)"))
              .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
              .cast("double").as("running_spend"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"))
          .orderBy("o_custkey", "o_orderdate", "o_orderkey")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) OVER (
             |    PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS double) AS running_spend,
             |  lag(o_totalprice) OVER w AS prev_price,
             |  lead(o_totalprice) OVER w AS next_price
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin)),

    // F4-F8/P2/P9: scalar-function zoo (casts, string ops, conditionals).
    "q13_scalar_zoo" -> QueryDef(
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"),
            upper(substring(col("text"), 1, 12)).as("head_upper"),
            coalesce(nullif(col("lang"), lit("xx")), lit("unknown")).as("lang_norm"),
            when(col("n_chars") >= 300, "long")
              .when(col("n_chars") >= 150, "mid")
              .otherwise("short").as("size_class"),
            length(col("text")).as("len_chars"),
            concat_ws(":", col("lang"), col("source")).as("lang_source"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  upper(substr(text, 1, 12)) AS head_upper,
             |  coalesce(nullif(lang, 'xx'), 'unknown') AS lang_norm,
             |  CASE WHEN n_chars >= 300 THEN 'long'
             |       WHEN n_chars >= 150 THEN 'mid'
             |       ELSE 'short' END AS size_class,
             |  length(text) AS len_chars,
             |  concat_ws(':', lang, source) AS lang_source
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // F1/F9: calendar rollup (date_trunc month + year extraction).
    "q14_month_rollup" -> QueryDef(
      (s, dir) =>
        Tables.orders(s, dir)
          // o_orderdate is NTZ; Spark's date_trunc coerces NTZ→LTZ, so cast
          // back to NTZ to keep the oracle-matching naive annotation
          .groupBy(date_trunc("month", col("o_orderdate"))
            .cast("timestamp_ntz").as("month"))
          .agg(count(lit(1)).as("n_orders"),
            sumExact(col("o_totalprice")).as("sum_price"))
          .orderBy("month"),
      Some("""SELECT date_trunc('month', o_orderdate) AS month,
             |  count(*) AS n_orders,
             |  cast(sum(cast(o_totalprice AS decimal(18,6))) AS double) AS sum_price
             |FROM orders GROUP BY 1 ORDER BY month""".stripMargin)),

    // F7-adjacent: JSON-string field extraction via regex (portable across
    // engines, unlike engine-specific JSON-path functions) + rollup.
    "q15_json_field" -> QueryDef(
      (s, dir) =>
        Tables.events(s, dir)
          .select(regexp_extract(col("props"), "\"k\": ([0-9]+)", 1)
            .cast("int").as("k"))
          .groupBy("k").agg(count(lit(1)).as("n"))
          .orderBy("k"),
      Some("""SELECT try_cast(regexp_extract(props, '"k": ([0-9]+)', 1) AS int) AS k,
             |  count(*) AS n
             |FROM events GROUP BY 1 ORDER BY k""".stripMargin)))
}
