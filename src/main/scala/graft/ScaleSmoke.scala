package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale rehearsal: replicate the fact tables K times (orderkeys
  * shifted per replica so join cardinalities scale, not explode) into a
  * multi-file parquet dir, then time a headline query subset at 1x and
  * Kx and print the time ratios.
  *
  * The point is evidence for SURVEY.md §10: a K-times input should cost
  * ~K times (bounded-key aggregates, map-only scans, TakeOrdered top-k)
  * or ~K log K (total sorts, shuffle joins) — a super-linear ratio
  * flags an operator whose plan would not survive the 100 TB target.
  * Replicated data also arrives as MANY part-files, so this exercises
  * the multi-split path the single-file sf dirs cannot (Tables.spread
  * becomes the documented no-op).
  *
  * Usage: runMain graft.ScaleSmoke [k] [srcDir] [workDir]
  */
object ScaleSmoke {

  private val HeadlineQueries = Seq(
    "q_agg_basic", "q_agg_distinct", "q_filter_range", "q_join_inner",
    "q_sort", "q_topk", "q_window_rank", "q_math_funcs")

  def replicate(spark: SparkSession, src: String, out: String, k: Int): Unit = {
    val li = spark.read.parquet(s"$src/lineitem.parquet")
    val ord = spark.read.parquet(s"$src/orders.parquet")
    val okSpan = ord.agg(max(col("o_orderkey"))).head.getLong(0) + 1
    def shifted(df: DataFrame, keys: Seq[String], span: Long): DataFrame =
      (0 until k).map { i =>
        keys.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * span)))
      }.reduce(_ unionAll _)
    shifted(li, Seq("l_orderkey"), okSpan)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/lineitem.parquet")
    shifted(ord, Seq("o_orderkey"), okSpan)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/orders.parquet")
  }

  def main(args: Array[String]): Unit = {
    val k = if (args.nonEmpty) args(0).toInt else 8
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val work = if (args.length > 2) args(2) else "/tmp/graft_scale"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    replicate(spark, src, work, k)

    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreach(_ => ())
    def time(name: String, dir: String): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      force(SparkEntry.queries(name)(spark, dir))
      (System.nanoTime() - t0) / 1e9
    }
    // warm both paths once, then interleaved min-of-2 (same rationale
    // as Bench: min under asymmetric noise, spaced reps)
    HeadlineQueries.foreach { q => time(q, src); time(q, work) }
    val reps = 2
    val t1 = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    val tk = collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    (1 to reps).foreach { _ =>
      HeadlineQueries.foreach { q =>
        t1(q) ::= time(q, src)
        tk(q) ::= time(q, work)
      }
    }
    val rows = HeadlineQueries.map { q =>
      val a = t1(q).min; val b = tk(q).min
      f""""$q":{"t1":$a%.3f,"tk":$b%.3f,"ratio":${b / a}%.2f}"""
    }
    println(s"""{"metric":"scale_smoke","k":$k,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
