package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The part of q_domain_mix the fixture oracle cannot see: source names
  * outside the fixture's `srcN` shape must degrade to the default weight
  * instead of crashing — Spark 4 runs ANSI mode, where a plain CAST of a
  * non-numeric suffix is a task-killing runtime error.
  */
class CorpusSpec extends AnyFunSuite with SparkTest {

  test("bm25 ranking is partition-layout independent and total on hostile docs") {
    // The determinism claim behind q_bm25's oracle: every score input is
    // integer-derived, so the ranked output cannot depend on how rows
    // are split across partitions — and degenerate documents (empty
    // text, single token, no query hits) must score or drop cleanly,
    // never crash.
    import spark.implicits._
    val docs = (0L until 40L).map { i =>
      val body = i % 4 match {
        case 0 => "spark join merge spark"
        case 1 => "" // empty text
        case 2 => "spark" // single token
        case _ => "alpha beta gamma" // no query hits
      }
      (i, body, "en", s"src${i % 3}", body.length.toLong)
    }
    def runWith(parts: Int): Seq[(Long, Double)] = {
      val dir = graft.core.TempDirs.create("graft_bm25_spec")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .repartition(parts)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      SparkEntry.queries("q_bm25")(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    }
    val one = runWith(1)
    val seven = runWith(7)
    assert(one.nonEmpty && one == seven)
  }

  test("domain mix survives hostile source names (try_cast fallback weight)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "src2", "a b c"), // numeric suffix, even -> weight 3
      (2L, "src3", "d e f"), // numeric suffix, odd -> weight 1
      (3L, "web-crawl!", "g h i"), // non-numeric suffix -> fallback weight 1
      (4L, "s", "j k l") // shorter than the substring offset -> fallback
    ).toDF("doc_id", "source", "text")
    // Must not throw; the most-weighted-per-doc source keeps everything,
    // so at one doc per source the even srcN source survives for sure.
    val out = graft.ext.Corpus.domainMixOf(docs).collect()
    assert(out.exists(_.getString(1) == "src2"), "rate-1.0 source must survive")
    assert(out.forall(r => r.getLong(2) >= 0 && r.getLong(2) < 65536))
  }

  test("hostile source names get the fallback weight, not a crash or a null rate") {
    import spark.implicits._
    // Two sources, same size: one hostile (fallback weight 1), one even
    // srcN (weight 3). Rates normalize so src2 keeps 1.0 and the hostile
    // source keeps 1/3 — i.e. the hostile source must land a rate, not
    // null out of the weight expression.
    val docs = (1L to 300L).map { i =>
      if (i % 2 == 0) (i, "src2", "x y z") else (i, "api/v2", "x y z")
    }.toDF("doc_id", "source", "text")
    val kept = graft.ext.Corpus.domainMixOf(docs)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.getOrElse("src2", 0L) > 0L)
    assert(kept.getOrElse("api/v2", 0L) > 0L, "hostile source must keep ~1/3, not 0 or crash")
    assert(kept("src2") > kept("api/v2"), "weight-3 source must keep more")
  }

  test("weighted sample is deterministic and weight-proportional (E-S keys)") {
    // Determinism: two runs are row-identical (no rand() anywhere).
    val a = SparkEntry.queries("q_weighted_sample")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    val b = SparkEntry.queries("q_weighted_sample")(spark, "/root/testdata/sf0.001")
      .collect().map(_.toString).toSeq
    assert(a.nonEmpty && a == b)
    // Weight-proportionality: u^(1/w) → 1 as w grows, so across many
    // independent groups a 50x-heavier doc must win its group's top slot
    // far more often than the 1/11 a uniform sampler would give it.
    // Exact expectation: P(heavy first) = w_h / (w_h + Σ w_light)
    // = 500/(500+100) ≈ 0.83 per the E-S distribution.
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = (0L until 2000L).map { i =>
      val grp = s"g${i / 20}" // 100 groups of 20 docs
      val words = if (i % 20 == 0) 500 else 10 // one heavy doc per group
      (i, grp, Seq.fill(words)("w").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val winners = graft.ext.Corpus.weightedSampleOf(docs, k = 1)
      .collect().map(r => r.getLong(0))
    val heavyWins = winners.count(_ % 20 == 0)
    assert(heavyWins > 60 && heavyWins < 100,
      s"heavy doc won $heavyWins/100 groups; expected ~83 under E-S, ~5 under uniform")
  }
}
