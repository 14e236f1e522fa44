package graft

import org.scalatest.funsuite.AnyFunSuite

/** Feature-engineering pins: q_feature_scale's standardization equals a
  * local recomputation with the same explicit-moment formula (planted
  * hand-checkable dims + full fixture equivalence), and q_string_index
  * ranks by frequency with the name tiebreak.
  */
case class FsVec(vec_id: Long, embedding: Array[Float], label: Int)

class FeatureSpec extends AnyFunSuite with SparkTest {

  private def round(x: Double, dp: Int): Double =
    BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_feature_scale planted: hand-checkable means, stds, z-scores") {
    import spark.implicits._
    val vs = Seq(
      FsVec(0, Array(1f, 10f), 0), FsVec(1, Array(3f, 10f), 0),
      FsVec(2, Array(5f, 40f), 1), FsVec(3, Array(7f, 40f), 1))
    val dir = graft.core.TempDirs.create("graft_feature_spec")
    vs.toDF().write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = SparkEntry.queries("q_feature_scale")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    // dim 1: mean 4, var 21-16=5; dim 2: mean 25, var 850-625=225.
    val (s1, s2) = (math.sqrt(5.0), 15.0)
    assert(got((0L, 1L)) == ((4.0, round(s1, 6), round((1 - 4) / s1, 4))))
    assert(got((3L, 2L)) == ((25.0, 15.0, 1.0)))
    assert(got.size == 8)
  }

  test("q_feature_scale matches a local recomputation over the fixture") {
    import spark.implicits._
    val vecs = graft.core.Tables(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    val dim = vecs.head._2.length
    val stats = (0 until dim).map { i =>
      val xs = vecs.map(_._2(i).toDouble)
      val mean = xs.sum / xs.length
      val std = math.sqrt(xs.map(x => x * x).sum / xs.length - mean * mean)
      (mean, std)
    }
    val expected = vecs.filter(_._1 < 5).sortBy(_._1).flatMap { case (id, arr) =>
      (0 until dim).map { i =>
        val (m, s) = stats(i)
        ((id, (i + 1).toLong), (round(m, 6), round(s, 6), round((arr(i) - m) / s, 4)))
      }
    }.toMap
    val got = SparkEntry.queries("q_feature_scale")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got.keySet == expected.keySet && got.nonEmpty)
    got.foreach { case (k, (m, s, z)) =>
      val (em, es, ez) = expected(k)
      // Distributed vs sequential summation order: allow one 1e-6/1e-4 ulp
      // step at the rounding boundary, nothing more.
      assert(math.abs(m - em) <= 1e-6 + 1e-12, s"$k mean $m vs $em")
      assert(math.abs(s - es) <= 1e-6 + 1e-12, s"$k std $s vs $es")
      assert(math.abs(z - ez) <= 1e-4 + 1e-12, s"$k z $z vs $ez")
    }
  }

  test("q_string_index: frequency-descending dense ids with the name tiebreak") {
    import spark.implicits._
    val base = 1700000000000L * 1000000L
    val events = (Seq.fill(3)("beta") ++ Seq.fill(3)("alpha") ++ Seq("gamma"))
      .zipWithIndex.map { case (t, i) =>
        BehaviorSpecEv(i.toLong, base + i * 1000000L, 1L, t, 0.0, "{}")
      }
    val dir = graft.core.TempDirs.create("graft_feature_spec")
    events.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = SparkEntry.queries("q_string_index")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq(("alpha", 3L, 0L), ("beta", 3L, 1L), ("gamma", 1L, 2L)))
  }
}
