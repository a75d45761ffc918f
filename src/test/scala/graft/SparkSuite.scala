package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession shared by every suite in the test JVM (Test/fork :=
  * true gives the whole run a single forked JVM; session startup is ~10s
  * so per-suite sessions would dominate test time). Config mirrors
  * Verify/Bench so tests see the same semantics the driver checks. */
object TestSpark {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.GraftFunctions.register(s)
    s
  }
  val Smoke = "/root/testdata/sf0.001"
}

abstract class SparkSuite extends AnyFunSuite {
  def spark: SparkSession = TestSpark.session
  def sf: String = TestSpark.Smoke
}
