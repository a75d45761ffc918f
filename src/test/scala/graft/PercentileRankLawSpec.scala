package graft

/** Law: `percentile_approx(x, p, Int.MaxValue)` is Spark's EXACT
  * discrete percentile — the smallest value whose 1-based sorted rank
  * is >= ceil(p*n) — and DuckDB's `quantile_disc` implements the same
  * convention (probed n=1..9 x p in {.2,.5,.9} against DuckDB 1.x
  * during round 9). q_quality_calibrated / q_perplexity_filter lean on
  * this: their cutoff is an actual row value, bit-identical across
  * engines, so the keep compare needs no rounding workaround. If this
  * law ever breaks (a Spark upgrade changing the sketch's exact-mode
  * rank rule), this spec and those two oracles fail loudly.
  */
class PercentileRankLawSpec extends SparkSuite {

  private def rankValue(sorted: Seq[Double], p: Double): Double =
    sorted(math.max(1, math.ceil(p * sorted.size).toInt) - 1)

  test("percentile_approx exact mode = value at rank ceil(p*n)") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(42)
    // sizes that straddle exact p*n boundaries, with duplicates and
    // negatives (rint/2 quantizes so ties are common)
    for (n <- Seq(1, 2, 3, 5, 9, 10, 15, 20, 100);
         p <- Seq(0.1, 0.2, 0.5, 0.9, 0.95)) {
      val xs = Seq.fill(n)(math.rint(rnd.nextDouble() * 20 - 10) / 2.0)
      val got = xs.toDF("x")
        .selectExpr(s"percentile_approx(x, $p, 2147483647) AS v")
        .collect()(0).getDouble(0)
      assert(got == rankValue(xs.sorted, p), s"n=$n p=$p xs=${xs.sorted}")
    }
  }
}
