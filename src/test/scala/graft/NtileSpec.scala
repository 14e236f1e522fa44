package graft

import org.scalatest.funsuite.AnyFunSuite

/** q_win_ntile pins: standard ntile bucket sizing (first n mod k
  * buckets take the extra row) on a planted group, and on the fixture
  * the per-group quartiles are size-balanced, contiguous, and
  * non-overlapping.
  */
case class NtOrder(o_orderkey: Long, o_orderpriority: String, o_totalprice: Double)

class NtileSpec extends AnyFunSuite with SparkTest {

  test("planted 10-row group: sizes 3,3,2,2 with contiguous value ranges") {
    import spark.implicits._
    val rows = (1 to 10).map(i => NtOrder(i.toLong, "P", i.toDouble))
    val dir = graft.core.TempDirs.create("graft_ntile_spec")
    rows.toDF().write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val got = SparkEntry.queries("q_win_ntile")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (1L, 3L, 1.0, 3.0), (2L, 3L, 4.0, 6.0), (3L, 2L, 7.0, 8.0), (4L, 2L, 9.0, 10.0)))
  }

  test("fixture quartiles are balanced (±1), exhaustive, and value-ordered per group") {
    val got = SparkEntry.queries("q_win_ntile")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    val total = graft.core.Tables(spark, sf, "orders").count()
    assert(got.map(_._3).sum == total)
    got.groupBy(_._1).foreach { case (grp, qs) =>
      assert(qs.map(_._2).sorted.toSeq == Seq(1L, 2L, 3L, 4L), s"$grp quartiles")
      val sizes = qs.sortBy(_._2).map(_._3)
      assert(sizes.max - sizes.min <= 1, s"$grp sizes $sizes")
      // Standard ntile: larger buckets come first.
      assert(sizes.sorted.reverse.toSeq == sizes.toSeq, s"$grp extra rows lead")
      val ordered = qs.sortBy(_._2).toSeq
      ordered.sliding(2).foreach { pair =>
        if (pair.length == 2)
          assert(pair(0)._5 <= pair(1)._4, s"$grp ranges overlap: $pair")
      }
    }
  }
}
