package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed exact-percentile rewrite to Spark's built-in
  * `percentile` on a continuous-valued column (events.value — ~every row
  * a distinct double, the worst case for the histogram), so the
  * scale-safe formulation is proved output-identical to the buffering
  * built-in it replaces. The DuckDB oracle already covers the money
  * column; this covers the general case.
  */
class ReshapeSpec extends AnyFunSuite with SparkTest {

  test("exactPercentiles matches the buffering built-in bit-for-bit on continuous doubles") {
    val ps = Seq(0.25, 0.5, 0.9, 0.99)
    val e = graft.core.Tables(spark, sf, "events")
    val ourCols = ps.map(p => max(when(col("p") === p, col("pct"))).as(s"pct_${(p * 100).toInt}"))
    val ours = graft.ops.Reshape.exactPercentiles(e, "event_type", "value", ps)
      .groupBy(col("event_type"))
      .agg(ourCols.head, ourCols.tail: _*)
      .orderBy("event_type")
      .collect()
    val refCols = ps.map(p => expr(s"percentile(value, $p)").as(s"pct_${(p * 100).toInt}"))
    val builtin = e.groupBy(col("event_type"))
      .agg(refCols.head, refCols.tail: _*)
      .orderBy("event_type")
      .collect()
    assert(ours.length == builtin.length && ours.length > 1)
    ours.zip(builtin).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to ps.length).foreach { i =>
        assert(a.getDouble(i) == b.getDouble(i),
          s"group ${a.getString(0)} p=${ps(i - 1)}: ${a.getDouble(i)} != ${b.getDouble(i)}")
      }
    }
  }

  test("randomized equivalence: ties, negatives, singleton and skewed groups") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    (1 to 8).foreach { trial =>
      // Heavy duplication (values snap to a 0.5 grid) exercises the
      // histogram's rank-interval logic; group "g0" is a singleton.
      val rows = ("g0", 3.25) +: Seq.fill(50 + rnd.nextInt(200)) {
        (s"g${1 + rnd.nextInt(3)}", math.floor(rnd.nextGaussian() * 8) / 2)
      }
      val df = rows.toDF("g", "v")
      val ps = Seq(0.01, 0.25, 0.5, 0.77, 0.99)
      val ours = graft.ops.Reshape.exactPercentiles(df, "g", "v", ps)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val refCols2 = ps.map(p => expr(s"percentile(v, $p)").as(s"x${(p * 100).toInt}"))
      val ref = df.groupBy(col("g"))
        .agg(refCols2.head, refCols2.tail: _*)
        .collect().flatMap { r =>
          ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> r.getDouble(i + 1) }
        }.toMap
      assert(ours.keySet == ref.keySet, s"trial $trial: group/p sets differ")
      ours.foreach { case (k, v) =>
        assert(java.lang.Double.doubleToLongBits(v) ==
          java.lang.Double.doubleToLongBits(ref(k)),
          s"trial $trial $k: $v != ${ref(k)}")
      }
    }
  }
}
