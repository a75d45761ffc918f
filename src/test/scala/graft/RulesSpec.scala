package graft

import graft.functions.{GraftExtensions, RewriteHofDotProduct, VectorDot}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The HOF-dot-product optimizer rewrite: the idiomatic-but-interpreted
  * aggregate(zip_with(...)) form must be rewritten to the codegen'd
  * VectorDot — with bit-identical results (same double fold order) —
  * and must NOT fire where the semantics would change. */
class RulesSpec extends SparkSuite {

  private def dotHof(a: org.apache.spark.sql.Column,
                     b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select(col("vec_id"),
      transform(col("embedding"), _.cast("double")).as("e"))

  test("rule rewrites the double HOF dot product to VectorDot") {
    val df = emb.select(dotHof(col("e"), col("e")).as("d"))
    val optimized = RewriteHofDotProduct(df.queryExecution.analyzed)
    val hit = optimized.expressions.exists(_.exists(_.isInstanceOf[VectorDot]))
    assert(hit, s"VectorDot not produced:\n$optimized")
  }

  test("rewrite is bit-identical to the interpreted HOF evaluation") {
    // both fold left-to-right in double, so exact equality is the law
    val hof = emb.select(col("vec_id"), dotHof(col("e"), col("e")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val native = emb.select(col("vec_id"),
        call_function("vector_dot", col("e"), col("e")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(hof == native)
  }

  test("rule does not fire on a float-typed multiply (would re-round)") {
    val df = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(dotHof(col("embedding"), col("embedding")).as("d"))
    val optimized = RewriteHofDotProduct(df.queryExecution.analyzed)
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[VectorDot])),
      "rewrite fired on a float multiply; products would change rounding")
  }

  test("rule does not fire on a non-sum aggregate") {
    val df = emb.select(
      aggregate(zip_with(col("e"), col("e"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v * v).as("d"))
    val optimized = RewriteHofDotProduct(df.queryExecution.analyzed)
    assert(!optimized.expressions.exists(_.exists(_.isInstanceOf[VectorDot])))
  }

  test("extension-injected session applies the rewrite end to end") {
    val sc = spark.sparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val sp2 = SparkSession.builder()
        .config(sc.getConf)
        .withExtensions(new GraftExtensions())
        .getOrCreate()
      val df = sp2.read.parquet(s"$sf/embeddings.parquet")
        .select(col("vec_id"),
          transform(col("embedding"), _.cast("double")).as("e"))
        .select(dotHof(col("e"), col("e")).as("d"))
      assert(df.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[VectorDot])),
        "optimizer did not apply the injected rule")
      assert(df.count() > 0)
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
