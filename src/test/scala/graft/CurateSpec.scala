package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two late-round curation operators beyond their DuckDB
  * oracles: q_dedup_normalized's collapse property on documents that
  * differ only by formatting, and q_anomaly_mad against an independent
  * recomputation with Spark's buffering built-in `percentile` (the
  * operator itself uses the distributed exactPercentiles — this proves
  * the whole-query plumbing, not just the percentile kernel).
  */
class CurateSpec extends AnyFunSuite with SparkTest {

  test("q_dedup_normalized collapses reformatted copies that raw exact dedup keeps apart") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_curate_")
    Seq(
      (1L, "The Quick Brown Fox", "en", "src1", 19L),
      (2L, "the   quick brown fox ", "en", "src1", 22L), // case + runs + trailing
      (3L, "a different document", "en", "src2", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_dedup_normalized")(spark, dir)
      .orderBy("keep_id").collect()
    assert(got.length == 2, s"expected 2 normalized groups, got ${got.length}")
    assert(got(0).getAs[Long]("keep_id") == 1L && got(0).getAs[Long]("n_copies") == 2L)
    assert(got(1).getAs[Long]("keep_id") == 3L && got(1).getAs[Long]("n_copies") == 1L)
    // raw exact dedup on the same table keeps all three rows apart
    assert(SparkEntry.queries("q_dedup_exact")(spark, dir).count() == 3)
  }

  test("q_dedup_normalized partitions the fixture corpus (groups cover every doc exactly once)") {
    val d = graft.core.Tables(spark, sf, "documents")
    val got = SparkEntry.queries("q_dedup_normalized")(spark, sf)
    assert(got.agg(sum("n_copies")).head.getLong(0) == d.count())
    val byString = d.groupBy(trim(regexp_replace(lower(col("text")), "\\s+", " "))).count()
    assert(got.count() == byString.count())
  }

  test("q_url_dedup collapses planted scheme/case/slash/tracking variants and caps per host") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_urldedup_")
    // doc_id % 4 picks the raw-URL variant class, doc_id % 25 the path:
    // docs 0/25/50 on srcx are variants 0/1/2 of the SAME resource
    // (https, http+utm, HTTPS+case+trailing slash) and must collapse;
    // doc 75 keeps its real ?id= param (distinct canonical). Docs 1-4 on
    // srcy are four DISTINCT resources on one host — the cap (3) must
    // prune exactly the highest keep_id.
    val rows = Seq(0L, 25L, 50L, 75L).map(id => (id, "t", "en", "srcx", 1L)) ++
      Seq(1L, 2L, 3L, 4L).map(id => (id, "t", "en", "srcy", 1L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_url_dedup")(spark, dir).collect()
    val x = got.filter(_.getAs[String]("host") == "srcx.example.com")
    assert(x.length == 2)
    assert(x(0).getAs[Long]("doc_id") == 0L && x(0).getAs[Long]("n_copies") == 3L &&
      x(0).getAs[String]("url") == "https://srcx.example.com/p/0")
    assert(x(1).getAs[Long]("doc_id") == 75L && x(1).getAs[Long]("n_copies") == 1L &&
      x(1).getAs[String]("url") == "https://srcx.example.com/p/0?id=0")
    val y = got.filter(_.getAs[String]("host") == "srcy.example.com")
    assert(y.length == 3, s"host cap must keep 3 of 4, got ${y.length}")
    assert(y.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L, 2L, 3L))
    assert(y.map(_.getAs[Long]("rn")).toSeq == Seq(1L, 2L, 3L))
  }

  test("q_bpe_merges: deterministic greedy merges on a hand-computable corpus") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_bpe_")
    // Vocab: abab (freq 4), cd (freq 2). Round 1: (a,b) n=8 -> 'ab';
    // round 2: (ab,ab) n=4 -> 'abab' (the alias pair, expanded back);
    // round 3: (c,d) n=2 -> 'cd'; then the vocab runs dry and the loop
    // must stop early instead of crashing on an empty argmax.
    Seq((1L, "abab abab abab", "en", "s", 14L), (2L, "abab cd cd", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_bpe_merges")(spark, dir).collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[String]("left_sym"),
        r.getAs[String]("right_sym"), r.getAs[String]("merged_sym"),
        r.getAs[Long]("pair_n")))
    assert(got.toSeq == Seq(
      (1, "a", "b", "ab", 8L),
      (2, "ab", "ab", "abab", 4L),
      (3, "c", "d", "cd", 2L)))
  }

  test("q_bpe_encode: hand-computable corpus tokenizes under the learned merges") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_bpe_")
    // Same corpus as the miner's hand-computed case: merges (a,b)->'ab',
    // (ab,ab)->'abab', (c,d)->'cd', then dry. Encoding: 'abab' collapses
    // through ab->A, AA->B to ONE token 'abab' (freq 4); 'cd' to 'cd'
    // (freq 2). The alias chain must expand back to text with no leaks.
    Seq((1L, "abab abab abab", "en", "s", 14L), (2L, "abab cd cd", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("q_bpe_encode")(spark, dir).collect()
      .map(r => (r.getAs[String]("token"), r.getAs[Long]("n")))
    assert(got.toSeq == Seq(("abab", 4L), ("cd", 2L)))
  }

  test("q_bpe_encode on the fixture corpus: tokens are merges or single chars, counts ordered") {
    val merged = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
      .map(_.getAs[String]("merged_sym")).toSet
    val got = SparkEntry.queries("q_bpe_encode")(spark, sf).collect()
    assert(got.nonEmpty && got.length <= 50)
    got.foreach { r =>
      val t = r.getAs[String]("token")
      // every emitted token is exactly a learned merge or an un-merged
      // single character — alias chars never leak
      assert(t.forall(c => c.isLower && c.isLetter), s"non-text token $t")
      assert(t.length == 1 || merged.contains(t), s"token $t is neither a merge nor a char")
    }
    val ns = got.map(_.getAs[Long]("n")).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("q_bpe_merges on the fixture corpus: 60 rounds, expansions compose, counts non-increasing") {
    val got = SparkEntry.queries("q_bpe_merges")(spark, sf).collect()
    assert(got.length == 60)
    assert(got.map(_.getAs[Int]("step")).toSeq == (1 to 60))
    got.foreach { r =>
      assert(r.getAs[String]("merged_sym") ==
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
      // rendered symbols are always plain corpus text — ids never leak
      assert(r.getAs[String]("merged_sym").forall(c => c.isLower && c.isLetter))
    }
    // a merge can only create pairs no more frequent than itself, and
    // existing pair counts never grow: the argmax sequence is monotone.
    val ns = got.map(_.getAs[Long]("pair_n")).toSeq
    assert(ns == ns.sorted.reverse)
  }

  test("q_anomaly_mad matches an independent built-in-percentile recomputation") {
    val e = graft.core.Tables(spark, sf, "events")
    val med = e.groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("med"))
    val mad = e.join(med, "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
      .groupBy("event_type")
      .agg(round(expr("percentile(adev, 0.5)"), 4).as("mad"))
    val fences = med.join(mad, "event_type")
      .withColumn("cut", round(col("mad") * 4.4478, 4))
    val expected = e.join(fences, "event_type")
      .filter(abs(col("value") - col("med")) > col("cut"))
      .groupBy("event_type").agg(count(lit(1)).as("n_outliers"))
      .orderBy("event_type").collect()
    val got = SparkEntry.queries("q_anomaly_mad")(spark, sf)
      .orderBy("event_type").collect()
    assert(got.length == expected.length && got.nonEmpty)
    got.zip(expected).foreach { case (g, x) =>
      assert(g.getAs[String]("event_type") == x.getAs[String]("event_type"))
      assert(g.getAs[Long]("n_outliers") == x.getAs[Long]("n_outliers"),
        s"group ${g.getAs[String]("event_type")}")
    }
  }
}
