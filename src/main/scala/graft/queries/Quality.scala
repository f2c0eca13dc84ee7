package graft.queries

import graft.core.{QueryDef, QueryModule, Tables}
import graft.quality.Expectations
import graft.quality.Expectations._

/** Data-quality checks as oracle-verifiable queries (SURVEY A5-A7). The
  * whole check battery runs as ONE aggregation pass per table
  * (see [[graft.quality.Expectations]]).
  */
object Quality extends QueryModule {

  def queries: Map[String, QueryDef] = Map(

    // A5: the reference's 9 not_null battery, transplanted onto lineitem.
    "q16_notnull_checks" -> QueryDef(
      (s, dir) =>
        Expectations.check(Tables.lineitem(s, dir), Seq(
          NotNull("l_orderkey"), NotNull("l_partkey"), NotNull("l_suppkey"),
          NotNull("l_quantity"), NotNull("l_extendedprice"),
          NotNull("l_returnflag"), NotNull("l_linestatus"),
          NotNull("l_shipdate"), NotNull("l_discount"))),
      Some("""WITH counts AS (
             |  SELECT
             |    count(*) FILTER (WHERE l_orderkey IS NULL) AS c1,
             |    count(*) FILTER (WHERE l_partkey IS NULL) AS c2,
             |    count(*) FILTER (WHERE l_suppkey IS NULL) AS c3,
             |    count(*) FILTER (WHERE l_quantity IS NULL) AS c4,
             |    count(*) FILTER (WHERE l_extendedprice IS NULL) AS c5,
             |    count(*) FILTER (WHERE l_returnflag IS NULL) AS c6,
             |    count(*) FILTER (WHERE l_linestatus IS NULL) AS c7,
             |    count(*) FILTER (WHERE l_shipdate IS NULL) AS c8,
             |    count(*) FILTER (WHERE l_discount IS NULL) AS c9
             |  FROM lineitem
             |)
             |SELECT check_name, failures, failures = 0 AS passed FROM (
             |  SELECT 'not_null_l_orderkey' AS check_name, c1 AS failures FROM counts
             |  UNION ALL SELECT 'not_null_l_partkey', c2 FROM counts
             |  UNION ALL SELECT 'not_null_l_suppkey', c3 FROM counts
             |  UNION ALL SELECT 'not_null_l_quantity', c4 FROM counts
             |  UNION ALL SELECT 'not_null_l_extendedprice', c5 FROM counts
             |  UNION ALL SELECT 'not_null_l_returnflag', c6 FROM counts
             |  UNION ALL SELECT 'not_null_l_linestatus', c7 FROM counts
             |  UNION ALL SELECT 'not_null_l_shipdate', c8 FROM counts
             |  UNION ALL SELECT 'not_null_l_discount', c9 FROM counts
             |) ORDER BY check_name""".stripMargin)),

    // A6-A7: GX-flavor range checks (null-tolerant) over the events stream.
    "q17_bounds_checks" -> QueryDef(
      (s, dir) =>
        Expectations.check(Tables.events(s, dir), Seq(
          Between("value", 0.0, 100.0),
          Between("user_id", 0.0, 1000000.0),
          NotNull("event_type", Warning))),
      Some("""WITH counts AS (
             |  SELECT
             |    count(*) FILTER (WHERE value IS NOT NULL AND (value < 0.0 OR value > 100.0)) AS c1,
             |    count(*) FILTER (WHERE user_id IS NOT NULL AND (user_id < 0.0 OR user_id > 1000000.0)) AS c2,
             |    count(*) FILTER (WHERE event_type IS NULL) AS c3
             |  FROM events
             |)
             |SELECT check_name, failures, failures = 0 AS passed FROM (
             |  SELECT 'between_value_0.0_100.0' AS check_name, c1 AS failures FROM counts
             |  UNION ALL SELECT 'between_user_id_0.0_1000000.0', c2 FROM counts
             |  UNION ALL SELECT 'not_null_event_type', c3 FROM counts
             |) ORDER BY check_name""".stripMargin)))
}
