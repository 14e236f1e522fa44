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
}
