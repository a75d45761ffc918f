package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One engine query: a Spark DataFrame program plus (when the
  * semantics are ANSI-SQL-expressible and cross-engine deterministic)
  * an equivalent DuckDB SQL twin used by the driver's differential
  * oracle (SURVEY.md §5). Queries without an oracle get a weaker
  * rows-only check and are covered by ScalaTest instead.
  */
final case class GraftQuery(
    name: String,
    doc: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object GraftQuery {
  /** Exact, order-independent sum of a double column: cast to decimal
    * first so partial-aggregation order can't perturb the result,
    * then cast back to double for a dialect-neutral output type.
    * Mirrors `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)` in DuckDB.
    */
  def decSum(c: Column, prec: Int = 18, scale: Int = 2): Column =
    sum(c.cast(s"decimal($prec,$scale)")).cast("double")

  /** Deterministic mean over ALL rows: exact decimal sum divided by
    * COUNT(*), in double — identical in any engine given identical
    * inputs. NOT SQL AVG semantics on a nullable column (AVG divides
    * by the non-null count): mirror it as
    * `round(SUM(CAST(x AS DECIMAL))/count(*), …)`, never `AVG(x)`,
    * and only apply it to non-null columns. */
  def decAvg(c: Column, prec: Int = 18, scale: Int = 2): Column =
    sum(c.cast(s"decimal($prec,$scale)")).cast("double") / count(lit(1))
}
