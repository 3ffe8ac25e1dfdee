package graft.queries

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL front-end as a first-class entry point: these queries are
  * expressed ENTIRELY as `spark.sql(...)` over temp views — the same
  * Catalyst plans the DataFrame API produces, reached through the
  * parser + catalog instead. Each statement is ANSI-portable enough
  * that the DuckDB oracle is near-verbatim the same text (modulo
  * dialect casts), which is itself the point: a reference user can
  * bring plain SQL to this engine unchanged.
  *
  * Money stays in integer cents through every aggregate (the engine's
  * exactness discipline — see Relational's scaladoc).
  */
object Sql extends QueryModule {

  private def withViews(s: SparkSession, d: String): SparkSession = {
    Tables.lineitem(s, d).createOrReplaceTempView("sql_lineitem")
    Tables.orders(s, d).createOrReplaceTempView("sql_orders")
    Tables.customer(s, d).createOrReplaceTempView("sql_customer")
    s
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q6 shape: single-row filtered revenue aggregate.
    "q_sql_revenue" -> ((s, d) =>
      withViews(s, d).sql("""
        SELECT CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
                 AS revenue_e4,
               count(1) AS n
        FROM sql_lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate <  TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")),

    // CTE + window function through the parser: top-3 orders per
    // market segment by order value.
    "q_sql_cte_window" -> ((s, d) =>
      withViews(s, d).sql("""
        WITH ov AS (
          SELECT c.c_mktsegment AS seg, o.o_orderkey,
                 CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
          FROM sql_orders o JOIN sql_customer c ON o.o_custkey = c.c_custkey),
        ranked AS (
          SELECT seg, o_orderkey, cents,
                 row_number() OVER (PARTITION BY seg
                                    ORDER BY cents DESC, o_orderkey) AS rk
          FROM ov)
        SELECT seg, rk, o_orderkey, cents
        FROM ranked
        WHERE rk <= 3
        ORDER BY seg, rk""")),

    // Multi-way join + aggregate + HAVING through the parser.
    "q_sql_join_agg" -> ((s, d) =>
      withViews(s, d).sql("""
        SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
               count(1) AS n_orders,
               CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS cents_total
        FROM sql_orders o
        JOIN sql_customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, o.o_orderpriority
        HAVING count(1) > 5
        ORDER BY seg, prio"""))
  )

  override def oracles: Map[String, String] = Map(
    "q_sql_revenue" -> """
      SELECT CAST(sum(round(l_extendedprice * 100)::BIGINT
                      * round(l_discount * 100)::BIGINT) AS BIGINT) AS revenue_e4,
             count(1) AS n
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
        AND l_discount BETWEEN 0.05 AND 0.07
        AND l_quantity < 24""",

    "q_sql_cte_window" -> """
      WITH ov AS (
        SELECT c.c_mktsegment AS seg, o.o_orderkey,
               round(o.o_totalprice * 100)::BIGINT AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
      ranked AS (
        SELECT seg, o_orderkey, cents,
               row_number() OVER (PARTITION BY seg
                                  ORDER BY cents DESC, o_orderkey) AS rk
        FROM ov)
      SELECT seg, rk, o_orderkey, cents
      FROM ranked
      WHERE rk <= 3
      ORDER BY seg, rk""",

    "q_sql_join_agg" -> """
      SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio,
             count(1) AS n_orders,
             CAST(sum(round(o.o_totalprice * 100)::BIGINT) AS BIGINT)
               AS cents_total
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment, o.o_orderpriority
      HAVING count(1) > 5
      ORDER BY seg, prio"""
  )
}
