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

  test("CMS merge of per-group sketches equals the single global sketch; error is one-sided") {
    import org.apache.spark.util.sketch.CountMinSketch
    import spark.implicits._
    // Zipf-ish: key k appears 1000/k times, split across 10 "days".
    val rows = for { k <- 1 to 50; r <- 1 to 1000 / k } yield (s"key$k", (k + r) % 10)
    val df = rows.toDF("k", "day")
    val dailies = df.groupBy("day")
      .agg(expr("count_min_sketch(k, 0.01d, 0.9d, 7)").as("cms"))
      .collect().map(r => CountMinSketch.readFrom(r.getAs[Array[Byte]]("cms")))
    val merged = dailies.reduce { (a, b) => a.mergeInPlace(b); a }
    val global = CountMinSketch.readFrom(
      df.agg(expr("count_min_sketch(k, 0.01d, 0.9d, 7)").as("cms"))
        .head().getAs[Array[Byte]]("cms"))
    val n = rows.size
    for (k <- 1 to 50) {
      val exact = 1000 / k
      val m = merged.estimateCount(s"key$k")
      // Counter-wise-sum merge with a shared seed: merged == global, exactly.
      assert(m == global.estimateCount(s"key$k"), s"merged!=global for key$k")
      // CMS error is ONE-SIDED: never under, over by at most eps*N w.h.p.
      assert(m >= exact, s"CMS underestimated key$k: $m < $exact")
      assert(m <= exact + math.ceil(0.01 * n).toLong * 2,
        s"CMS overestimate for key$k out of envelope: $m vs $exact (n=$n)")
    }
    // The SQL aggregate and the driver-side estimateCount must hash
    // STRING items identically (UTF-8 bytes through the same murmur) —
    // the property q_cms_heavy_hitters' exact oracle rides on.
    val tiny = Seq(("alpha", 3), ("beta", 2), ("gamma", 1))
      .flatMap { case (s, c) => Seq.fill(c)(s) }.toDF("k")
    val sk = CountMinSketch.readFrom(
      tiny.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 42)").as("cms"))
        .head().getAs[Array[Byte]]("cms"))
    assert(sk.estimateCount("alpha") == 3L && sk.estimateCount("beta") == 2L &&
      sk.estimateCount("gamma") == 1L)
  }
}
