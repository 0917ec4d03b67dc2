package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator UDAF (SURVEY.md §2.10 surface proof): geometric mean.
  * Map-side-combinable (reduce/merge are associative), so it aggregates partially
  * before the shuffle exactly like a built-in declarative aggregate.
  * SQL-oracle equivalent: `exp(avg(ln(x)))`.
  */
case class GeoMeanBuf(var sumLn: Double, var n: Long)

object GeoMean extends Aggregator[Double, GeoMeanBuf, Double] {
  override def zero: GeoMeanBuf = GeoMeanBuf(0.0, 0L)

  override def reduce(b: GeoMeanBuf, x: Double): GeoMeanBuf = {
    if (x > 0) { b.sumLn += math.log(x); b.n += 1 }
    b
  }

  override def merge(a: GeoMeanBuf, b: GeoMeanBuf): GeoMeanBuf = {
    a.sumLn += b.sumLn; a.n += b.n; a
  }

  override def finish(b: GeoMeanBuf): Double =
    if (b.n == 0) Double.NaN else math.exp(b.sumLn / b.n)

  override def bufferEncoder: Encoder[GeoMeanBuf] = Encoders.product[GeoMeanBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
