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

  case class VecBuf(sum: Array[Double], n: Long)

  /** Element-wise mean of an embedding column — the class-centroid /
    * domain-embedding aggregate of a training pipeline. The buffer is a
    * single dim-length double vector + count, so the group-by plans with
    * MAP-SIDE COMBINE: each task folds its rows into one 512-byte buffer
    * per group and only buffers cross the exchange — against the naive
    * posexplode + groupBy(label, pos) shape, which amplifies every row
    * ×dim BEFORE its shuffle. At 100 TB of embeddings that is the
    * difference between shuffling ~groups·dim doubles and re-shuffling
    * the corpus 64-fold.
    */
  object CentroidAgg extends Aggregator[Array[Float], VecBuf, Array[Double]] {
    override def zero: VecBuf = VecBuf(Array.empty, 0L)
    override def reduce(b: VecBuf, v: Array[Float]): VecBuf = {
      if (b.n == 0L) {
        val s = new Array[Double](v.length)
        var i = 0; while (i < v.length) { s(i) = v(i).toDouble; i += 1 }
        VecBuf(s, 1L)
      } else {
        val s = b.sum
        var i = 0; while (i < v.length) { s(i) += v(i); i += 1 }
        VecBuf(s, b.n + 1)
      }
    }
    override def merge(a: VecBuf, b: VecBuf): VecBuf =
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        val s = a.sum
        var i = 0; while (i < s.length) { s(i) += b.sum(i); i += 1 }
        VecBuf(s, a.n + b.n)
      }
    override def finish(b: VecBuf): Array[Double] =
      if (b.n == 0L) Array.empty else b.sum.map(_ / b.n)
    override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
    override def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
