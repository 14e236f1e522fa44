package graft

import org.scalatest.funsuite.AnyFunSuite

/** The staged MinHash near-dup pipeline (exact-collapse → rep LSH →
  * expansion) must be output-identical to the naive verify-every-candidate
  * pipeline.
  */
class DedupSpec extends AnyFunSuite with SparkTest {

  test("staged q_minhash_near_dup equals the naive single-stage pipeline") {
    val staged = SparkEntry.queries("q_minhash_near_dup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val naive = graft.ext.Dedup.minhashNearDupNaive(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(staged.toSeq == naive.toSeq)
  }

  test("staged q_simhash_near_dup equals the naive single-stage pipeline") {
    val staged = SparkEntry.queries("q_simhash_near_dup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val naive = graft.ext.Similarity.simhashNearDupNaive(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(staged.toSeq == naive.toSeq)
  }

  test("q_dedup_cluster_graph equals union-find over the verified pair set") {
    val pairs = SparkEntry.queries("q_minhash_near_dup")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nodes = graft.core.Tables(spark, sf, "documents")
      .select("doc_id").collect().map(_.getLong(0))

    // Driver-side union-find ground truth.
    val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra max rb) = ra min rb
    }
    val truth = nodes.map(n => n -> find(n)).toMap

    val got = graft.ext.Dedup.dedupClusterGraph(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == truth)
    // Invariants: every doc labeled once; cluster_id is the component min.
    assert(got.keySet == nodes.toSet)
    assert(got.values.toSet.forall(cid => got(cid) == cid),
      "a cluster representative must be its own cluster_id")
  }

  test("label propagation handles a chain (diameter > 1)") {
    import spark.implicits._
    // 5-4, 4-3, 3-2, 2-1: one chain component; min label 1 must reach 5.
    val nodes = (1L to 6L).toDF("doc_id")
    val pairs = Seq((2L, 1L), (3L, 2L), (4L, 3L), (5L, 4L)).toDF("doc_a", "doc_b")
    val got = graft.ext.Dedup.clusterByLabelPropagation(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L, 6L -> 6L))
  }
}
