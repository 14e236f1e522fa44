package graft

import org.scalatest.funsuite.AnyFunSuite

/** Record-linkage gates: exact self/source matching on the fixture, the
  * blocked-join plan shape (no quadratic nested-loop anywhere), and the
  * documented blocking recall contract.
  */
class LinkageSpec extends AnyFunSuite with SparkTest {

  test("q_fuzzy_join: every dirty record links to its source; self-links are lev 0") {
    val got = SparkEntry.queries("q_fuzzy_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val suppliers = graft.core.Tables(spark, sf, "supplier")
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    // The (source, source) pair exists for every supplier: lev 1 when
    // corrupted (suppkey % 7 == 3), lev 0 otherwise.
    suppliers.foreach { k =>
      val self = got.find(t => t._1 == k && t._2 == k)
      val expectLev = if (k % 7 == 3 || k % 11 == 5) 1L else 0L
      assert(self.contains((k, k, expectLev)), s"supplier $k: $self")
    }
    // Verification is real: no pair exceeds the edit bound, and the
    // cross-matches are the same-prefix neighbors, not arbitrary pairs.
    assert(got.forall(_._3 <= 1))
    assert(got.length > suppliers.size, "cross-block neighbors missing")
  }

  test("the candidate stage is a blocked equi-join — no nested-loop/cartesian anywhere") {
    val df = SparkEntry.queries("q_fuzzy_join")(spark, sf)
    val plan = graft.core.SessionConf.scoped(spark, "spark.sql.adaptive.enabled", "false") {
      df.queryExecution.executedPlan.toString
    }
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"quadratic join in the fuzzy-join plan:\n$plan")
  }

  test("two-pass recall: a prefix-corrupted name the single-pass build provably misses links at lev 1") {
    // "Supplier#0000000XY": pass 1 blocks on the first 16 chars, pass 2
    // on the last 8. The %11==5 corruption sits at position 4 — inside
    // the prefix, OUTSIDE the suffix — so the prefix pass alone cannot
    // link it (proved below by replicating the single-pass join), and
    // the suffix pass must.
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, levenshtein => slev}
    val names = (0 until 40).map(i => f"Supplier#$i%09d")
    val dir = graft.core.TempDirs.create("graft_linkage_spec")
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("s_suppkey", "s_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = SparkEntry.queries("q_fuzzy_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    def dirtyOf(b: Int): String =
      if (b % 7 == 3) names(b).dropRight(1) + "X"
      else if (b % 11 == 5) names(b).take(3) + "X" + names(b).drop(4)
      else names(b)
    // The single-pass (prefix-only) build: replicate it and prove the
    // prefix-corrupted records (5, 16, 27; 38 hits the %7 rule first)
    // do NOT link to their sources through it.
    val s = graft.core.Tables(spark, dir, "supplier").select("s_suppkey", "s_name")
    val dirty = graft.ext.Linkage.dirtyBatch(s)
    val singlePass = s.withColumn("bk", graft.ext.Linkage.prefixKey(col("s_name")))
      .join(dirty.withColumn("bk", graft.ext.Linkage.prefixKey(col("nm"))), "bk")
      .filter(slev(col("s_name"), col("nm")) <= 1)
      .select("s_suppkey", "r_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val prefixCorrupted = (0 until 40).filter(k => k % 11 == 5 && k % 7 != 3)
    prefixCorrupted.foreach { k =>
      assert(!singlePass.contains((k.toLong, k.toLong)),
        s"single-pass unexpectedly linked prefix-corrupted $k")
      assert(got.contains((k.toLong, k.toLong)),
        s"two-pass build missed prefix-corrupted $k")
    }
    // And the full result is exactly the two-pass candidate model:
    // pairs sharing the 16-prefix OR the 8-suffix, within edit 1.
    val expectPairs = for {
      a <- names.indices; b <- names.indices
      dirtyB = dirtyOf(b)
      if names(a).take(16) == dirtyB.take(16) || names(a).takeRight(8) == dirtyB.takeRight(8)
      if levenshtein(names(a), dirtyB) <= 1
    } yield (a.toLong, b.toLong)
    assert(got.sorted.toSeq == expectPairs.sorted)
  }

  test("s_linkage_ingest: the streamed link table equals the batch fuzzy join exactly") {
    val streamed = SparkEntry.queries("s_linkage_ingest")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val batch = SparkEntry.queries("q_fuzzy_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(streamed == batch && batch.nonEmpty)
  }

  /** Plain-Scala Levenshtein twin for the recall-contract oracle. */
  private def levenshtein(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
