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
}
