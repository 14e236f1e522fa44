package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.core.{QueryDef, QueryModule, Tables}

/** Behavioral analytics over the event stream — the query family a user
  * of the reference runs on its CDC-landed event tables once they're in
  * the warehouse (README.md:222-252 lands exactly this shape): ordered
  * funnels, cohort retention, and next-event transition matrices.
  *
  * Scale design: every stage keys on `user_id`, so each operator is a
  * small number of co-partitioned hash exchanges over a monotonically
  * shrinking survivor set (funnel), or a single user-partitioned window
  * (transitions). Nothing ever materializes a per-user event list in one
  * buffer, so skewed users cost sort time, not memory.
  */
object Behavior extends QueryModule {

  /** Step-N of a funnel must land within this much of step N-1. */
  private val StepWindow = "INTERVAL 24 HOURS"

  private val FunnelSteps = Seq("signup", "view", "click", "purchase")

  /** Ordered multi-step funnel: for each user, the first `signup`, then
    * the first `view` within 24 h of it, then the first `click` within
    * 24 h of that, then the first `purchase`. Emits one row per step with
    * the surviving-user count.
    *
    * Plan shape: stage k is events⋈survivors_{k-1} on user_id + a
    * min-aggregate — both partial-agg'd map-side and hash-partitioned on
    * the SAME key, so AQE reuses the exchange layout and each stage's
    * right side only shrinks. The alternative single-scan form (collect
    * each user's events into one sorted array) buffers unbounded per-user
    * state; this staged form never does.
    */
  private def funnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"), col("ts"))

    def nextStep(prev: DataFrame, step: String): DataFrame =
      ev.as("e").filter(col("event_type") === step)
        .join(prev.as("p"), "user_id")
        .where(col("e.ts") > col("p.t") &&
          col("e.ts") <= col("p.t") + expr(StepWindow))
        .groupBy("user_id").agg(min(col("e.ts")).as("t"))

    val first = ev.filter(col("event_type") === FunnelSteps.head)
      .groupBy("user_id").agg(min("ts").as("t"))
    val stages = FunnelSteps.tail.scanLeft(first)(nextStep)

    stages.zip(FunnelSteps).zipWithIndex
      .map { case ((df, step), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step"), lit(step).as("event_type"), col("n_users"))
      }
      .reduce(_.unionAll(_))
      .orderBy("step")
  }

  /** Cohort retention: users grouped by first-seen day, counted distinct
    * in each subsequent week-offset. Two shuffles on user_id (first-seen
    * aggregate, then the activity join — same key, co-partitioned) plus
    * one cardinality-bounded distinct: a user contributes at most
    * (#active weeks) rows to the final aggregate regardless of event
    * volume, so the last exchange is users×weeks, not events.
    */
  private def retentionCohort(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events").select(col("user_id"), col("ts"))
    val first = ev.groupBy("user_id")
      .agg(min("ts").cast(DateType).as("cohort_day"))
    ev.join(first, "user_id")
      .select(col("user_id"), col("cohort_day"),
        floor(datediff(col("ts").cast(DateType), col("cohort_day")) / 7)
          .cast(LongType).as("week_offset"))
      .distinct()
      .groupBy("cohort_day", "week_offset")
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_day", "week_offset")
  }

  /** First-order next-event transition matrix (Markov counts +
    * conditional probability). One user-partitioned window for `lead`,
    * then a partial-agg'd groupBy down to |event_type|² rows; the
    * probability normalization windows over that tiny aggregate, not the
    * event stream.
    */
  private def eventTransitions(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pw = Window.partitionBy("event_type")
    Tables(spark, sfDir, "events")
      .select(col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .where(col("next_type").isNotNull)
      .groupBy("event_type", "next_type")
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"), col("next_type"), col("n"),
        round(col("n") * lit(1.0) / sum(col("n")).over(pw), 4).as("p"))
      .orderBy("event_type", "next_type")
  }

  /** Sessionization with explicit session ids — the ETL shape downstream
    * consumers join on (q_session_batch's `session_window` counts
    * sessions; this emits the id-carrying per-session fact row: bounds,
    * event count, value sum). Gaps-and-islands: a 30-min-quiet gap starts
    * a new session; the session index is the running count of
    * gap-starts. One hash exchange on user_id serves BOTH the window and
    * the per-(user, session) aggregate (partitioning on a prefix of the
    * group keys co-locates the groups), so the whole operator is a single
    * shuffle of (user_id, ts, event_id, value) rows — skewed users cost
    * sort time, never memory.
    */
  private def sessionize(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      .withColumn("new_s",
        when(col("ts") > lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES") ||
          lag(col("ts"), 1).over(w).isNull, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(cum))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 2).as("sum_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Shared with s_funnel (stream/Streaming.scala) — the streaming funnel
    * must converge to the batch answer on bounded input.
    */
  private[graft] val funnelOracle: String = """
      WITH s1 AS (SELECT user_id, min(ts) AS t FROM events
                  WHERE event_type = 'signup' GROUP BY user_id),
      s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
             WHERE e.event_type = 'view' AND e.ts > s1.t AND e.ts <= s1.t + INTERVAL 24 HOUR
             GROUP BY e.user_id),
      s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
             WHERE e.event_type = 'click' AND e.ts > s2.t AND e.ts <= s2.t + INTERVAL 24 HOUR
             GROUP BY e.user_id),
      s4 AS (SELECT e.user_id, min(e.ts) AS t FROM events e JOIN s3 ON e.user_id = s3.user_id
             WHERE e.event_type = 'purchase' AND e.ts > s3.t AND e.ts <= s3.t + INTERVAL 24 HOUR
             GROUP BY e.user_id)
      SELECT * FROM (
        SELECT 1 AS step, 'signup' AS event_type, count(*) AS n_users FROM s1
        UNION ALL SELECT 2, 'view', count(*) FROM s2
        UNION ALL SELECT 3, 'click', count(*) FROM s3
        UNION ALL SELECT 4, 'purchase', count(*) FROM s4)
      ORDER BY step"""

  /** Lookback window for a marketing touch to claim a purchase. */
  private val AttributionWindowUs = 3L * 86400L * 1000000L

  /** Last-touch revenue attribution: each `purchase` is credited to the
    * user's most recent preceding marketing touch (`click` or `view`)
    * within a 3-day lookback, else to `direct`. The channel-performance
    * query every event warehouse runs against the CDC-landed stream.
    *
    * Plan shape: ONE user-partitioned window pass — the running "last
    * touch" is `last(conditional, ignoreNulls).over(user, ts rows
    * preceding)`, so no self-join against the touch subset and no
    * per-user buffering (window sort only); the final rollup is a
    * 4-group hash agg. Time math compares exact epoch MICROSECONDS
    * (unix_micros both sides) — no truncation-direction hazard.
    */
  private def attribution(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val isTouch = col("event_type").isin("click", "view")
    val touched = Tables(spark, sfDir, "events")
      .withColumn("touch_type", last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_us", last(when(isTouch, unix_micros(col("ts"))), ignoreNulls = true).over(w))
    touched.filter(col("event_type") === "purchase")
      .select(
        when(col("touch_us").isNotNull &&
            unix_micros(col("ts")) - col("touch_us") <= AttributionWindowUs,
          col("touch_type")).otherwise(lit("direct")).as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"), round(sum(col("value")), 2).as("revenue"))
      .orderBy("channel")
  }

  /** Linear (multi-touch) revenue attribution — the equal-credit twin of
    * [[attribution]]'s last-touch rule: each purchase's value splits
    * evenly across ALL click/view touches inside the 3-day lookback
    * (no touch → `direct` keeps the full value).
    *
    * Plan shape: one user-partitioned RANGE window pass computes the
    * per-purchase touch counts (`count(when(click))` /
    * `count(when(view))` over [ts−3d, ts−1µs] in epoch µs — peers at
    * the purchase's own microsecond are excluded by the frame bound on
    * BOTH engines, no tiebreak column needed); credits then assemble
    * row-locally (explode of three channel structs) into a 3-group
    * hash agg.
    *
    * Determinism contract: credits are EXACT INTEGERS in millionths of
    * the currency unit — value is exact cents (2-dp source), so
    * `cents·10⁴·k DIV n_touch` is integer-truncated identically on
    * both engines and the sums are exact. No floating point anywhere
    * past the window, so no rounding-boundary hazard (the per-channel
    * sums of fractional credits WOULD land on .xx5 halves).
    * NONNEGATIVE-VALUE contract: Spark's `DIV` truncates toward zero
    * while DuckDB's `//` floors, which diverges only for negative
    * dividends — purchase values here are ≥ 0 by the events schema; a
    * refunds-bearing feed would switch both sides to explicit floor
    * division before relying on the hash compare.
    */
  private def attributionLinear(spark: SparkSession, sfDir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
      .rangeBetween(-AttributionWindowUs, -1)
    val counted = Tables(spark, sfDir, "events")
      .withColumn("n_click",
        count(when(col("event_type") === "click", 1)).over(w))
      .withColumn("n_view",
        count(when(col("event_type") === "view", 1)).over(w))
    def channel(name: String, credit: Column, hit: Column): Column =
      struct(lit(name).as("channel"), credit.as("credit"), hit.as("hit"))
    counted.filter(col("event_type") === "purchase")
      .select(
        round(col("value") * 100).cast("long").as("vc"),
        col("n_click"), col("n_view"),
        (col("n_click") + col("n_view")).as("n_touch"))
      .select(explode(array(
        channel("click",
          when(col("n_touch") > 0,
            expr("vc * 10000 * n_click DIV n_touch")).otherwise(0L),
          (col("n_click") > 0).cast("long")),
        channel("direct",
          when(col("n_touch") === 0, col("vc") * 10000L).otherwise(0L),
          (col("n_touch") === 0).cast("long")),
        channel("view",
          when(col("n_touch") > 0,
            expr("vc * 10000 * n_view DIV n_touch")).otherwise(0L),
          (col("n_view") > 0).cast("long")))).as("c"))
      .groupBy(col("c.channel").as("channel"))
      .agg(
        sum(col("c.hit")).as("n_purchases"),
        sum(col("c.credit")).as("revenue_micro"))
      .orderBy("channel")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_attribution_linear" -> QueryDef(attributionLinear, Some("""
      WITH t AS (
        SELECT event_type, value,
               count(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_click,
               count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_view
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                     RANGE BETWEEN 259200000000 PRECEDING AND 1 PRECEDING)),
      p AS (SELECT round(value * 100)::BIGINT AS vc, n_click, n_view,
                   n_click + n_view AS n_touch
            FROM t WHERE event_type = 'purchase'),
      c AS (
        SELECT 'click' AS channel,
               CASE WHEN n_touch > 0 THEN (vc * 10000 * n_click) // n_touch ELSE 0 END AS credit,
               CASE WHEN n_click > 0 THEN 1 ELSE 0 END AS hit FROM p
        UNION ALL
        SELECT 'direct',
               CASE WHEN n_touch = 0 THEN vc * 10000 ELSE 0 END,
               CASE WHEN n_touch = 0 THEN 1 ELSE 0 END FROM p
        UNION ALL
        SELECT 'view',
               CASE WHEN n_touch > 0 THEN (vc * 10000 * n_view) // n_touch ELSE 0 END,
               CASE WHEN n_view > 0 THEN 1 ELSE 0 END FROM p)
      SELECT channel, sum(hit)::BIGINT AS n_purchases,
             sum(credit)::BIGINT AS revenue_micro
      FROM c GROUP BY channel ORDER BY channel""")),
    "q_attribution" -> QueryDef(attribution, Some("""
      WITH t AS (
        SELECT event_type, value, ts,
               last_value(CASE WHEN event_type IN ('click','view') THEN event_type END
                          IGNORE NULLS) OVER w AS touch_type,
               last_value(CASE WHEN event_type IN ('click','view') THEN epoch_us(ts) END
                          IGNORE NULLS) OVER w AS touch_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
      SELECT CASE WHEN touch_us IS NOT NULL AND epoch_us(ts) - touch_us <= 259200000000
                  THEN touch_type ELSE 'direct' END AS channel,
             count(*) AS n_purchases, round(sum(value), 2) AS revenue
      FROM t WHERE event_type = 'purchase'
      GROUP BY 1 ORDER BY channel""")),
    "q_sessionize" -> QueryDef(sessionize, Some("""
      WITH flagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sess AS (
        SELECT user_id, ts, event_id, value,
               CAST(sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
        FROM flagged)
      SELECT user_id, session_idx, min(ts) AS session_start,
             max(ts) AS session_end, count(*) AS n_events,
             round(sum(value), 2) AS sum_value
      FROM sess GROUP BY user_id, session_idx
      ORDER BY user_id, session_idx""")),
    "q_funnel" -> QueryDef(funnel, Some(funnelOracle)),
    "q_retention_cohort" -> QueryDef(retentionCohort, Some("""
      WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
                 FROM events GROUP BY user_id),
      a AS (SELECT DISTINCT e.user_id, f.cohort_day,
              datediff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7 AS week_offset
            FROM events e JOIN f ON e.user_id = f.user_id)
      SELECT cohort_day, week_offset, count(*) AS n_users
      FROM a GROUP BY cohort_day, week_offset
      ORDER BY cohort_day, week_offset""")),
    "q_event_transitions" -> QueryDef(eventTransitions, Some("""
      WITH s AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events)
      SELECT event_type, next_type, count(*) AS n,
             round(count(*) * 1.0 / sum(count(*)) OVER (PARTITION BY event_type), 4) AS p
      FROM s WHERE next_type IS NOT NULL
      GROUP BY event_type, next_type
      ORDER BY event_type, next_type""")))
}
