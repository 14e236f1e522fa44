package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stream.Streaming

/** Streaming semantics beyond the rows>0 smoke: exact late-data-drop
  * output, stream==batch window equivalence, and out-of-order upsert
  * behavior of the ts-aware merge.
  */
class StreamingSpec extends AnyFunSuite with SparkTest {

  test("s_watermark_late drops the late row from its window") {
    val out = SparkEntry.queries("s_watermark_late")(spark, sf).collect()
    val byWindow = out.map(r => r.getTimestamp(0).toString -> r.getLong(1)).toMap
    // 10:00 window holds the two on-time rows; the late 10:05 replay must
    // NOT have bumped it to 3. 12:00 window holds 12:00 + 12:30.
    assert(byWindow == Map(
      "2024-01-01 10:00:00.0" -> 2L,
      "2024-01-01 12:00:00.0" -> 2L))
  }

  test("s_tumbling equals q_tumbling_batch on the same data") {
    val streamRes = SparkEntry.queries("s_tumbling")(spark, sf).collect()
    val batchRes = SparkEntry.queries("q_tumbling_batch")(spark, sf).collect()
    assert(streamRes.toSeq == batchRes.toSeq)
  }

  test("tsAwareMerge: older delta cannot regress a key; new keys insert") {
    import spark.implicits._
    val cols = Seq("user_id", "v", "ts")
    def df(rows: Seq[(Long, String, String)]) =
      rows.toDF("user_id", "v", "ts_s")
        .select(col("user_id"), col("v"), col("ts_s").cast("timestamp").as("ts"))
    val snap = df(Seq((1L, "new", "2024-01-02 00:00:00"), (2L, "only-snap", "2024-01-01 00:00:00")))
    val delta = df(Seq((1L, "stale", "2024-01-01 00:00:00"), (3L, "inserted", "2024-01-03 00:00:00")))
    val got = Streaming.tsAwareMerge(snap, delta, "user_id", "ts", cols)
      .orderBy("user_id").select("user_id", "v").collect().toSeq
    assert(got == Seq(Row(1L, "new"), Row(2L, "only-snap"), Row(3L, "inserted")))
  }

  test("s_dedup_stateful snapshot equals batch latest-state") {
    val streamRes = SparkEntry.queries("s_dedup_stateful")(spark, sf).collect()
    val batchRes = SparkEntry.queries("q_latest_state")(spark, sf).collect()
    assert(streamRes.toSeq == batchRes.toSeq)
  }
}
