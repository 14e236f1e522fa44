package graft

import org.scalatest.funsuite.AnyFunSuite

/** The part of q_join_bloom the oracle cannot see: the bloom filter must
  * be SIZED FROM THE DIM SIDE, not a constant — a saturated constant-
  * capacity bloom keeps the join correct (the exact join eliminates false
  * positives) while silently pruning nothing, which is precisely the
  * failure that only shows up at 100x the dim cardinality.
  */
class JoinsSpec extends AnyFunSuite with SparkTest {

  test("bloom capacity grows with dim cardinality (no constant-size saturation)") {
    import spark.implicits._
    val small = (1L to 1000L).toDF("k")
    val large = (1L to 100000L).toDF("k")
    val bfSmall = graft.ops.Joins.bloomFor(small, "k")
    val bfLarge = graft.ops.Joins.bloomFor(large, "k")
    assert(bfLarge.bitSize() > bfSmall.bitSize(),
      s"expected the 100k-key bloom to out-size the 1k-key bloom " +
        s"(${bfLarge.bitSize()} vs ${bfSmall.bitSize()})")
    // And the sized filter actually holds its fpp: keys outside the dim
    // should almost never pass.
    val falsePos = (200000L to 201000L).count(bfLarge.mightContain)
    assert(falsePos < 50, s"fpp degraded: $falsePos of 1000 foreign keys passed")
  }
}
