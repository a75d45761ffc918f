package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Single-query [[Explain]]: dump one declared query's
  * `explain("formatted")` without planning the other 129 (several of
  * which execute index builds / localCheckpoints during planning —
  * the full dump is minutes at sf0.1 where one query is seconds).
  * The per-change plan-diff tool of the optimization rounds.
  *
  * Usage: runMain graft.ExplainOne <query> <outFile> <sfDir>
  */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val q = args(0); val out = args(1); val sfDir = args(2)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution
      .explainString(org.apache.spark.sql.execution.FormattedMode)
    Files.writeString(Paths.get(out), plan)
    println(s"plan -> $out")
    spark.stop()
  }
}
