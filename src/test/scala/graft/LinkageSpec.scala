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
      val expectLev = if (k % 7 == 3) 1L else 0L
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

  test("blocking recall contract: an edit inside the blocked prefix is unmatchable by design") {
    // "Supplier#0000000XY": the block key is the first 16 chars. An edit
    // at position 17+ (the corruption the operator is built for) stays
    // in its source's block; an edit at position 10 (inside the prefix)
    // moves the record to a different block and CANNOT match — that is
    // the documented trade-off, pinned here so a silent blocking change
    // (shorter key, multi-pass union) shows up as a spec diff.
    import spark.implicits._
    val names = (0 until 40).map(i => f"Supplier#$i%09d")
    val dir = graft.core.TempDirs.create("graft_linkage_spec")
    names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("s_suppkey", "s_name")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/supplier.parquet")
    val got = SparkEntry.queries("q_fuzzy_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // Corrupted rows (k % 7 == 3) edit the LAST char — inside the block,
    // so (source, source) survives:
    assert((0 until 40).filter(_ % 7 == 3).forall(k => got.contains((k.toLong, k.toLong))))
    // All 40 names share the 16-char prefix "Supplier#0000000" here, so
    // every same-block pair within edit 1 appears; none is missed.
    val expectPairs = for {
      a <- names.indices; b <- names.indices
      dirtyB = if (b % 7 == 3) names(b).dropRight(1) + "X" else names(b)
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
