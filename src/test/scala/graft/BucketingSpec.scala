package graft

import graft.pipeline.Bucketed
import org.apache.spark.sql.functions._

/** Plan-level properties that matter at 100 TB:
  *  - bucketed tables join with no shuffle Exchange,
  *  - range repartitioning is a set-preserving reshape (the C1
  *    page-union invariance: any partitioning of the key space unions
  *    back to the same set — SURVEY.md §5). */
class BucketingSpec extends SparkSuite {

  test("bucketed join plans without a shuffle exchange") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val ord = spark.read.parquet(s"$sf/orders.parquet")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    Bucketed.writeBucketed(li, "li_b", "l_orderkey")
    Bucketed.writeBucketed(ord, "ord_b", "l_orderkey")
    // at test scale the planner would broadcast instead (which bypasses
    // bucketing); disable it to exercise the large-table code path the
    // bucketing exists for
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketed.colocatedJoin(spark, "li_b", "ord_b", "l_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val expected = li.join(ord, "l_orderkey").count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("page-union invariance: any range partitioning unions to the same set") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val whole = rows.collect().map(_.toString).sorted
    for (n <- Seq(1, 3, 8, 32)) {
      val repart = rows.repartitionByRange(n, col("l_orderkey"),
        col("l_linenumber"))
      assert(repart.rdd.getNumPartitions == n)
      val back = repart.collect().map(_.toString).sorted
      assert(back.sameElements(whole),
        s"range partitioning into $n pages changed the row multiset")
    }
  }
}
