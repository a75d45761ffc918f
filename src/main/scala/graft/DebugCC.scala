package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch profiler for q_dedup_groups phases (delete before round end). */
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
    val docs = Tables.documents(spark, sf)
    val pairs = time("jaccardPairs build+count") {
      val p = operators.Dedup.jaccardPairs(docs, 0.8)
      println(s"[debugcc]   n_pairs=${p.count()}")
      p
    }
    val labels = time("connectedComponents") {
      operators.Dedup.connectedComponents(pairs)
    }
    time("labels count") { println(s"[debugcc]   n_nodes=${labels.count()}") }
    spark.stop()
  }
}
