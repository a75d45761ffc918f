package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The engine's UDAF surface (SURVEY.md §2.10): a typed
  * `Aggregator[IN, BUF, OUT]` computing mean + sample variance from
  * EXACT decimal power sums (Σx, Σx², n kept as BigDecimal).
  *
  * Why exact sums instead of Welford: partial aggregates merge in
  * nondeterministic order under Spark's partial/final split, so any
  * float-accumulating variance is run-order-dependent in the last
  * ulps. Decimal power sums are associative and exact — merge order
  * cannot change the result, which is what lets a DuckDB oracle
  * hash-match the output bit-for-bit (after one well-defined
  * double conversion at finish).
  *
  * Registered for DataFrame use via `functions.udaf(...)` in
  * [[graft.operators.Stats]].
  */
object ExactMoments {

  final case class Buf(s: BigDecimal, ss: BigDecimal, n: Long)
  final case class Moments(mean: Double, var_samp: Double)

  /** `scale` mirrors the CAST(x AS DECIMAL(p, scale)) the oracle
    * applies before summing. */
  final class Agg(scale: Int) extends Aggregator[Double, Buf, Moments] {
    private def dec(x: Double): BigDecimal =
      BigDecimal(x).setScale(scale, BigDecimal.RoundingMode.HALF_UP)

    override def zero: Buf = Buf(BigDecimal(0), BigDecimal(0), 0L)

    override def reduce(b: Buf, x: Double): Buf = {
      val d = dec(x)
      Buf(b.s + d, b.ss + d * d, b.n + 1)
    }

    override def merge(a: Buf, b: Buf): Buf =
      Buf(a.s + b.s, a.ss + b.ss, a.n + b.n)

    override def finish(b: Buf): Moments =
      if (b.n < 2) Moments(
        if (b.n == 0) Double.NaN else b.s.toDouble / b.n, Double.NaN)
      else {
        val s = b.s.toDouble
        val ss = b.ss.toDouble
        val n = b.n.toDouble
        // expression order matches the oracle SQL exactly
        Moments(s / n, (ss - s * s / n) / (n - 1))
      }

    override def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
  }
}
