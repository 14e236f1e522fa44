package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregation surface (SURVEY.md §2.2 "UDAF surface"):
  * `Aggregator[IN, BUF, OUT]` is the public Spark API for user-defined
  * aggregates — it plans exactly like a built-in (partial aggregation on
  * the map side via `reduce`, shuffle of the small buffer, `merge` on the
  * reduce side), so a custom aggregate keeps the map-side-combine property
  * that matters at scale.
  */
object Udafs {

  case class StatsBuf(n: Long, sum: Double, min: Double, max: Double)
  case class Stats(n_vals: Long, sum_val: Double, min_val: Double, max_val: Double)

  /** count/sum/min/max in one buffer — one pass, 32-byte shuffle payload
    * per group regardless of group size.
    */
  object StatsAgg extends Aggregator[Double, StatsBuf, Stats] {
    override def zero: StatsBuf = StatsBuf(0L, 0.0, Double.MaxValue, Double.MinValue)
    override def reduce(b: StatsBuf, x: Double): StatsBuf =
      StatsBuf(b.n + 1, b.sum + x, math.min(b.min, x), math.max(b.max, x))
    override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
      StatsBuf(a.n + b.n, a.sum + b.sum, math.min(a.min, b.min), math.max(a.max, b.max))
    override def finish(b: StatsBuf): Stats =
      if (b.n == 0) Stats(0L, 0.0, Double.NaN, Double.NaN)
      else Stats(b.n, b.sum, b.min, b.max)
    override def bufferEncoder: Encoder[StatsBuf] = Encoders.product[StatsBuf]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }
}
