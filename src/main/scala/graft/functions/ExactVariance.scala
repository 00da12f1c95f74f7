package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF surface (SURVEY §2.12): sample variance accumulated in EXACT
  * decimal arithmetic — n, Σx, Σx² as BigDecimal — so the result is
  * summation-order independent (a double accumulator differs across
  * partition orders; this one is bit-stable and DuckDB-matchable). The
  * buffer is mergeable, so Spark runs it as partial + final aggregation
  * (map-side combine) like any built-in.
  */
case class MomentBuf(n: Long, sx: BigDecimal, sxx: BigDecimal)

object ExactVariance extends Aggregator[Double, MomentBuf, Double] {

  override def zero: MomentBuf = MomentBuf(0L, BigDecimal(0), BigDecimal(0))

  override def reduce(b: MomentBuf, x: Double): MomentBuf = {
    // pin the input scale first (same contract as the dsum helpers: the
    // double is taken at 6 fractional digits, then all arithmetic is exact)
    val d = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    MomentBuf(b.n + 1, b.sx + d, b.sxx + d * d)
  }

  override def merge(a: MomentBuf, b: MomentBuf): MomentBuf =
    MomentBuf(a.n + b.n, a.sx + b.sx, a.sxx + b.sxx)

  /** The recomposition deliberately converts the exact sums to double FIRST
    * and computes the variance in double arithmetic: the DuckDB oracle does
    * the same (CAST exact decimal sums AS DOUBLE, then double math), so both
    * engines evaluate the identical float expression over identical inputs.
    * Exactness lives in the accumulation; the recomposition is one float
    * expression either way.
    */
  override def finish(b: MomentBuf): Double =
    if (b.n < 2) 0.0
    else {
      val n = b.n.toDouble
      val v = (n * b.sxx.toDouble - b.sx.toDouble * b.sx.toDouble) / (n * (n - 1))
      BigDecimal(v).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }

  override def bufferEncoder: Encoder[MomentBuf] = Encoders.product[MomentBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
