package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Accuracy contract of the mergeable HLL distinct-count path
  * (q_hll_union). Two pins:
  *  - the MERGE PROPERTY is exact: estimating the union of per-group
  *    sketches equals sketching the whole set, so history is never
  *    re-scanned when a new partition arrives — the entire reason to
  *    maintain sketches instead of exact distincts at 100 TB;
  *  - the error envelope: Spark's DataSketches HLL at the default
  *    lgConfigK=12 is NOT exact even at a few hundred items (measured 393
  *    for 400), so the estimate is bounded at 5% relative error, never
  *    asserted equal — and q_hll_union is a rows-only entry for the same
  *    reason.
  */
class SketchSpec extends AnyFunSuite with SparkTest {

  test("hll estimate stays within 5% at small cardinality") {
    import spark.implicits._
    val df = (0 until 10000).map(i => (i % 400L, i.toLong)).toDF("k", "grp")
    val est = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(k))")).head().getLong(0)
    assert(math.abs(est - 400.0) / 400.0 <= 0.05, s"est $est vs 400")
  }

  test("union of per-day sketches equals sketching the full set, within 5% at high cardinality") {
    import spark.implicits._
    // 50k distinct keys spread over 30 "days" — deep in HLL estimation mode.
    val df = (0 until 50000).map(i => (i.toLong, (i % 30).toLong)).toDF("k", "day")
    // lgConfigK pinned EXPLICITLY on both sides: the merge-exactness
    // property below holds when partials and the global sketch share a
    // config, so the assert must not ride on Spark's default staying 12.
    val unioned = df.groupBy("day").agg(expr("hll_sketch_agg(k, 12)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))")).head().getLong(0)
    val single = df.agg(expr("hll_sketch_estimate(hll_sketch_agg(k, 12))")).head().getLong(0)
    assert(unioned == single,
      s"union-of-partials must equal the single global sketch ($unioned vs $single)")
    val err = math.abs(unioned - 50000.0) / 50000.0
    assert(err <= 0.05, s"relative error $err > 5% (est $unioned)")
  }
}
