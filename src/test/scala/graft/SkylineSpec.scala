package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_skyline pins: the staged per-price/window rewrite equals the
  * brute-force dominance definition on the fixture AND on a planted tie
  * fixture (equal twins both survive; equal-price-smaller-size and
  * equal-size-higher-price are dominated).
  */
case class SkyPart(p_partkey: Long, p_retailprice: Double, p_size: Int)

class SkylineSpec extends AnyFunSuite with SparkTest {

  /** Brute-force O(n²) skyline — the definition itself. */
  private def naive(pts: Seq[SkyPart]): Set[Long] =
    pts.filter { p =>
      !pts.exists(q => q.p_retailprice <= p.p_retailprice && q.p_size >= p.p_size &&
        (q.p_retailprice < p.p_retailprice || q.p_size > p.p_size))
    }.map(_.p_partkey).toSet

  test("fixture skyline equals the brute-force dominance definition") {
    import spark.implicits._
    val pts = graft.core.Tables(spark, sf, "part")
      .select("p_partkey", "p_retailprice", "p_size").as[SkyPart].collect().toSeq
    val got = SparkEntry.queries("q_skyline")(spark, sf).collect().map(_.getLong(0)).toSet
    assert(got == naive(pts))
    assert(got.nonEmpty)
  }

  test("planted ties: equal twins both survive; same-price-smaller and same-size-dearer are dominated") {
    import spark.implicits._
    val pts = Seq(
      SkyPart(1, 10.0, 5), SkyPart(2, 10.0, 5), // equal twins — both kept
      SkyPart(3, 10.0, 3),                      // same price, smaller size — dominated
      SkyPart(4, 20.0, 5),                      // same size, dearer — dominated
      SkyPart(5, 5.0, 2))                       // cheapest — kept
    val dir = graft.core.TempDirs.create("graft_skyline_spec")
    pts.toDF().write.mode("overwrite").parquet(s"$dir/part.parquet")
    val got = SparkEntry.queries("q_skyline")(spark, dir).collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 5L))
    assert(got == naive(pts))
  }
}
