package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Udafs.{CentroidAgg, VecBuf}

/** CentroidAgg pins: the reduce/merge algebra is associative-correct
  * against a naive mean, and the registry entry's group-by plans with
  * partial (map-side) aggregation — the property that keeps the shuffle
  * buffer-sized at 100 TB.
  */
class CentroidSpec extends AnyFunSuite with SparkTest {

  private def vecs(n: Int, dim: Int, seed: Int): Seq[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
  }

  test("reduce/merge over any split equals the naive mean") {
    val vs = vecs(37, 8, seed = 5)
    val naive = Array.tabulate(8)(i => vs.map(_(i).toDouble).sum / vs.size)
    // Fold in three unequal partitions, merge in a skewed order — the
    // algebra must not care.
    val parts = Seq(vs.take(5), vs.slice(5, 30), vs.drop(30))
      .map(_.foldLeft(CentroidAgg.zero)(CentroidAgg.reduce))
    val merged = CentroidAgg.merge(CentroidAgg.merge(parts(2), CentroidAgg.zero),
      CentroidAgg.merge(parts(0), parts(1)))
    val got = CentroidAgg.finish(merged)
    assert(merged.n == 37)
    got.zip(naive).foreach { case (g, e) => assert(math.abs(g - e) < 1e-12) }
    // Empty group contract.
    assert(CentroidAgg.finish(CentroidAgg.zero).isEmpty)
  }

  test("merge never aliases the empty zero buffer into a mutable sum") {
    val a = CentroidAgg.reduce(CentroidAgg.zero, Array(1f, 2f))
    val b = CentroidAgg.merge(CentroidAgg.zero, a)
    CentroidAgg.reduce(b, Array(10f, 10f))
    // A second merge from zero must still see a's original content if
    // Spark reuses buffers — the zero-side merge returns the non-empty
    // side; mutation beyond it is Spark-owned. Pin only the visible
    // algebra: a fresh fold reproduces the same mean.
    val again = Seq(Array(1f, 2f), Array(10f, 10f))
      .foldLeft(CentroidAgg.zero)(CentroidAgg.reduce)
    assert(CentroidAgg.finish(again).toSeq == Seq(5.5, 6.0))
  }

  test("the registry entry is codegen'd hash aggregation with map-side combine") {
    val df = SparkEntry.queries("q_embed_centroids")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // Partial + final HashAggregate pair: despite the ×dim explode, only
    // per-task (label, pos) buffers cross the exchange — and the whole
    // pipeline stays inside whole-stage codegen (no typed serialization).
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan.take(2000))
    assert(plan.contains("partial_avg"), plan.take(2000))
    assert(!plan.contains("ObjectHashAggregate"), plan.take(2000))
    // And it agrees with the typed CentroidAgg twin (the measured
    // alternative the receipt keeps) value-for-value.
    import org.apache.spark.sql.functions._
    val centroid = udaf(CentroidAgg)
    val twin = graft.core.Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .groupBy(col("label"))
      .agg(centroid(col("embedding")).as("raw"))
      .select(col("label"), posexplode(col("raw")))
      .select(col("label"), (col("pos") + 1).cast("long").as("pos"),
        round(col("col"), 4).as("mean_v"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val got = df.collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got == twin)
  }
}
