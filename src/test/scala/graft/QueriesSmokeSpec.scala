package graft

import org.apache.spark.sql.functions._

/** Smoke + shape checks for every registered query on sf0.001.
  * Value-level correctness is the driver's DuckDB oracle (tools/
  * check_oracles.py mirrors it); these tests pin the structural
  * contract: every query runs, has the aliased schema the oracle
  * compares on, and a few known invariants hold. */
class QueriesSmokeSpec extends SparkSuite {

  // Queries whose empty result at sf0.001 is semantically legitimate.
  private val mayBeEmpty = Set("q_join_anti")

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs and returns rows") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, "schema must be non-empty")
      assert(df.columns.distinct.length == df.columns.length,
        s"duplicate column names: ${df.columns.mkString(",")}")
      val n = df.count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("every oracle key has a matching query") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("decomposed global windows equal their plain-window form") {
    // q_window_ntile / q_window_cume are size-gated: at test scale the
    // query entries take the plain branch, so the decomposition (the
    // branch that runs at 100 TB) is proven equal here row for row
    import graft.operators.Relational
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val agg = Relational.ntileAgg(spark, sf)
    val w = Window.orderBy(desc("spend"), asc("o_custkey"))
    val plainNtile = agg.select(col("o_custkey"), col("spend"),
      ntile(4).over(w).as("quartile"),
      lead(col("spend"), 1).over(w).as("next_spend"))
      .orderBy("o_custkey").collect().toSeq
    assert(Relational.ntileDecomposed(spark, agg).collect().toSeq
      == plainNtile, "ntile decomposition diverged from the true window")
    val plainCume = agg.select(col("o_custkey"), col("spend"),
      round(percent_rank().over(w), 8).as("pct_rank"),
      round(cume_dist().over(w), 8).as("cume"))
      .orderBy("o_custkey").collect().toSeq
    assert(Relational.cumeDecomposed(spark, agg).collect().toSeq
      == plainCume, "cume decomposition diverged from the true window")
  }

  test("entry (flagship) returns the TPC-H Q1 shape") {
    val rows = SparkEntry.entry(spark).collect()
    assert(rows.length == 6) // 3 returnflags x 2 linestatus at sf0.001
    assert(rows.forall(_.getAs[Long]("count_order") > 0))
  }

  test("q_scan count equals direct parquet count") {
    val expected = spark.read.parquet(s"$sf/lineitem.parquet").count()
    val got = SparkEntry.queries("q_scan")(spark, sf)
      .collect().head.getAs[Long]("cnt")
    assert(got == expected)
  }

  test("q_agg_approx HLL counts are within 5% of exact") {
    val rows = SparkEntry.queries("q_agg_approx")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact_parts").toDouble
      assert(math.abs(approx - exact) / exact <= 0.05,
        s"HLL error too high: approx=$approx exact=$exact")
    }
  }

  test("q_topk is the global top-50 by extendedprice") {
    val df = SparkEntry.queries("q_topk")(spark, sf)
    val prices = df.select("l_extendedprice").collect().map(_.getDouble(0))
    assert(prices.length == 50)
    assert(prices.sameElements(prices.sortBy(-_.toDouble)),
      "top-k output must be sorted descending")
  }
}
