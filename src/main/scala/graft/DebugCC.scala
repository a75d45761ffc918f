package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for dedup phases (delete before round end). */
object DebugCC {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("debugcc")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debugcc] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    time("warm parquet+spread") {
      Tables.spread(docs).select(col("doc_id"), col("text")).count()
    }
    time("explodedShingles warm1") {
      operators.Dedup.explodedShingles(docs)
        .agg(count(lit(1))).collect()
    }
    time("explodedShingles warm2") {
      operators.Dedup.explodedShingles(docs)
        .agg(count(lit(1))).collect()
    }
    val sh = time("explodedShingles mat") {
      val x = operators.Dedup.explodedShingles(docs).cache()
      println(s"[debugcc]   n_sh=${x.count()}")
      x
    }
    val card = sh.groupBy("doc_id").agg(count(lit(1)).as("c"))
    val gdf = time("gdf mat") {
      val g = sh.groupBy("s").agg(count(lit(1)).as("gdf")).cache()
      println(s"[debugcc]   n_distinct_sh=${g.count()}")
      g
    }
    val prefix = time("prefix mat") {
      val w = Window.partitionBy("doc_id").orderBy(asc("gdf"), asc("s"))
      val p = sh.join(gdf, "s")
        .withColumn("rn", row_number().over(w))
        .join(card, "doc_id")
        .filter(col("rn") <= col("c") - ceil(col("c") * 0.8) + 1)
        .select("doc_id", "s").cache()
      println(s"[debugcc]   n_prefix=${p.count()}")
      p
    }
    val cands = time("candidate join mat") {
      val c = prefix.as("a")
        .join(sh.as("b"),
          col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
        .distinct().cache()
      println(s"[debugcc]   n_cands=${c.count()}")
      c
    }
    time("verify") {
      val v = operators.Dedup.verifyJaccard(cands, sh, 0.8)
      println(s"[debugcc]   n_pairs=${v.count()}")
    }
    spark.stop()
  }
}
