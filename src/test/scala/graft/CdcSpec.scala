package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

/** Unit tests for the CDC spine against hand-built Canal envelopes —
  * the edge cases from FIXTURES.md: DDL drop, empty data array, null
  * payload values, unparsable event time → dead-letter bucket, DELETE
  * rows surviving the merge.
  */
class CdcSpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val update =
    """{"id": 1, "es": 1585023600000, "ts": 1585023601000, "type": "UPDATE",
      | "isDdl": "false", "database": "qfbap_ods", "table": "code_city",
      | "data": [{"id": "42", "city": "Beijing", "province": "BJ",
      |           "event_time": "2020-03-24 12:00:00"}]}""".stripMargin

  private val ddl =
    """{"id": 2, "es": 1585023600000, "ts": 1585023601000, "type": "CREATE",
      | "isDdl": "true", "database": "qfbap_ods", "table": "code_city",
      | "data": null}""".stripMargin

  private val delete =
    """{"id": 3, "es": 1585023700000, "ts": 1585023701000, "type": "DELETE",
      | "isDdl": "false", "database": "qfbap_ods", "table": "code_city",
      | "data": [{"id": "42", "city": "Beijing", "province": "BJ",
      |           "event_time": "2020-03-24 12:01:40"}]}""".stripMargin

  private val nullPayload =
    """{"id": 4, "es": 1585023800000, "ts": 1585023801000, "type": "INSERT",
      | "isDdl": "false", "database": "qfbap_ods", "table": "code_city",
      | "data": [{"id": "43", "city": null, "province": "SH",
      |           "event_time": "2020-03-24 12:03:20"}]}""".stripMargin

  private def envelope(rows: String*) =
    Cdc.parseEnvelope(rows.toSeq.toDF("value"))

  test("ddlFilter drops isDdl=true, keeps false") {
    val kept = Cdc.ddlFilter(envelope(update, ddl, delete)).select("id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("flatten emits id,es,ts,type + payload in schema order") {
    val out = Cdc.flatten(envelope(update), Seq("id", "city", "province", "event_time"))
      .select("line").as[String].collect()
    assert(out.toSeq == Seq(
      "1,1585023600000,1585023601000,UPDATE,42,Beijing,BJ,2020-03-24 12:00:00"))
  }

  test("flatten with empty data array emits no rows") {
    val empty = update.replace(
      """[{"id": "42", "city": "Beijing", "province": "BJ",
        |           "event_time": "2020-03-24 12:00:00"}]""".stripMargin, "[]")
    assert(Cdc.flatten(envelope(empty), Seq("id")).count() == 0)
  }

  test("flatten skips null payload values in the delimited line") {
    // concat_ws skips nulls — documented divergence from the reference's
    // Java append(null) which prints the literal string "null"
    // (HdfsSink.java:96); pinned here so the behavior is intentional.
    val out = Cdc.flatten(envelope(nullPayload), Seq("id", "city", "province"))
      .select("line").as[String].collect()
    assert(out.toSeq == Seq("4,1585023800000,1585023801000,INSERT,43,SH"))
  }

  test("eventTimeDt derives yyyyMMdd from epoch millis, UTC") {
    val dt = spark.range(1)
      .select(Cdc.eventTimeDt(lit(1585023600000L)).as("dt"))
      .as[String].collect().head
    assert(dt == "20200324")
  }

  test("eventTimeDt null/unparsable goes to dead-letter 00000000") {
    val dt = spark.range(1)
      .select(Cdc.eventTimeDt(lit(null).cast("long")).as("dt"))
      .as[String].collect().head
    assert(dt == "00000000")
  }

  test("latestState keeps exactly the newest row per key, tiebroken") {
    val df = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), // key 1: ts 20 wins
      (2L, 30L, "c"), (2L, 30L, "d")  // key 2: tie on ts, higher id wins
    ).toDF("key", "ts", "v")
      .withColumn("id", monotonically_increasing_id())
    val got = Cdc.latestState(df, "key", "ts", "id")
      .select("key", "v").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "b", 2L -> "d"))
  }

  test("mergeSnapshot: union of keys, delta wins, DELETE survives as a row") {
    val snap = Seq((1L, "UPDATE", "x"), (2L, "INSERT", "y"))
      .toDF("key", "dml_type", "v")
    val delta = Seq((2L, "DELETE", "y2"), (3L, "INSERT", "z"))
      .toDF("key", "dml_type", "v")
    val got = Cdc.mergeSnapshot(snap, delta, "key", Seq("dml_type", "v"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, "UPDATE", "x"),  // snapshot-only key kept
      (2L, "DELETE", "y2"), // delta wins; DELETE is a row, not a removal
      (3L, "INSERT", "z"))) // delta-only key appears
  }

  test("mergeSnapshot is idempotent against an empty delta") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("key", "v")
    val empty = Seq.empty[(Long, String)].toDF("key", "v")
    val got = Cdc.mergeSnapshot(snap, empty, "key", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b")))
  }

  // ---- envelope fuzz (VERDICT r6 #5) -----------------------------------
  // The reference's ONLY error story is the bucket assigner's try/catch →
  // dt=00000000 (EventTimeBucketAssigner.java:25-27). The property here is
  // the distributed version of that guarantee: ANY byte string fed through
  // parseEnvelope → ddlFilter → flatten → eventTimeDt must either be
  // dropped cleanly or land in a well-formed bucket — a task failure (one
  // poison record killing the pipeline) is never acceptable.

  private def fuzzPipeline(raw: Seq[String]): Array[(String, String)] = {
    val parsed = Cdc.parseEnvelope(raw.toDF("value"))
    Cdc.flatten(Cdc.ddlFilter(parsed), Seq("id", "city"))
      .withColumn("dt", Cdc.eventTimeDt(col("es")))
      .select("dt", "line").as[(String, String)].collect()
  }

  test("envelope fuzz: garbage, truncated, and type-confused input never kills a task") {
    // Corpus shared with the streaming twin (StreamingSpec) — see
    // EnvelopeFuzz for the garbage/truncated/type-confused construction.
    (1L to 10L).foreach { seed =>
      val raw = EnvelopeFuzz.corpus(seed)
      // Must not throw — and every surviving row sits in a well-formed
      // bucket: dt is either a digit-only yyyyMMdd or the dead-letter.
      val out = fuzzPipeline(raw)
      out.foreach { case (dt, line) =>
        assert(dt == "00000000" || dt.matches("-?\\d{4,}\\d{4}"),
          s"seed $seed produced bucket '$dt' for line '$line'")
      }
    }
    // Non-vacuity: the valid envelope itself flows through to its bucket.
    val ok = fuzzPipeline(Seq(EnvelopeFuzz.valid))
    assert(ok.length == 1 && ok.head._1 == "20200324")
  }

  test("eventTimeDt dead-letters out-of-range epoch millis instead of overflowing") {
    val dts = Seq(Long.MaxValue, Long.MinValue, Long.MaxValue / 1000 + 1)
      .toDF("es")
      .select(Cdc.eventTimeDt(col("es")).as("dt"))
      .as[String].collect()
    assert(dts.toSeq == Seq("00000000", "00000000", "00000000"))
    // Boundary: the largest representable millis still formats.
    val edge = Seq(Long.MaxValue / 1000).toDF("es")
      .select(Cdc.eventTimeDt(col("es")).as("dt")).as[String].collect().head
    assert(edge.matches("\\+?\\d+"), edge)
  }
}
