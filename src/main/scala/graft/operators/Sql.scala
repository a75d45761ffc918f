package graft.operators

import graft.{GraftQuery, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The SQL entry path: the same Catalyst pipeline as the DataFrame API,
  * driven through `spark.sql` over registered views — exercising the
  * parser, CTEs, and correlated-subquery decorrelation (Catalyst
  * rewrites EXISTS/IN into semi-joins; there is no iterative executor).
  * Dialect here is deliberately ANSI-common: the oracle strings are
  * near-identical to the Spark SQL itself.
  */
object Sql {

  private def withViews(s: SparkSession, d: String)(sql: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    s.sql(sql)
  }

  private val q3Sql =
    "WITH big AS (SELECT o_orderkey, o_orderdate, o_custkey FROM orders " +
      "WHERE o_totalprice > 1000) " +
      "SELECT l_orderkey, " +
      "CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * " +
      "(CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) " +
      "AS DOUBLE) AS revenue, o_orderdate " +
      "FROM big JOIN lineitem ON l_orderkey = o_orderkey " +
      "GROUP BY l_orderkey, o_orderdate " +
      "ORDER BY revenue DESC, l_orderkey LIMIT 10"

  private val existsSql =
    "SELECT o_orderkey, o_orderstatus FROM orders o " +
      "WHERE EXISTS (SELECT 1 FROM lineitem l " +
      "WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R') " +
      "ORDER BY o_orderkey, o_orderstatus"

  val queries: Seq[GraftQuery] = Seq(

    GraftQuery(
      "q_sql_tpch_q3",
      "TPC-H Q3 shape through spark.sql: CTE + join + decimal-exact " +
        "revenue + top-10. Same Catalyst plan a DataFrame build would " +
        "get; the oracle string is the identical ANSI SQL.",
      (s, d) => withViews(s, d)(q3Sql),
      Some(q3Sql)),

    GraftQuery(
      "q_sql_exists",
      "Correlated EXISTS + NOT EXISTS through spark.sql — Catalyst " +
        "decorrelates both into left-semi and left-anti joins " +
        "(no per-row subquery execution).",
      (s, d) => withViews(s, d)(existsSql),
      Some(existsSql))
  )
}
