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
