package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (preference (a) from the build rules: composed from built-ins, no
  * custom plan node needed).
  *
  * Implementation: tag and UNION the tick and quote streams, then one
  * window pass per key ordered by time carries the latest quote forward
  * (`last(..., ignoreNulls)` over an unbounded-preceding frame) onto each
  * tick row. Cost at scale: ONE shuffle on the key + an in-partition sort
  * — strictly cheaper than the naive range-join (shuffle both sides, then
  * per-key backward scan) and never quadratic, because each row is
  * touched once. This is the standard large-scale formulation (quotes and
  * ticks co-partitioned by key, time-sorted within partition).
  */
object AsofJoin extends QueryModule {

  /** For each tick row, attach the most recent quote row (same `key`,
    * `quote.ts <= tick.ts` — inner semantics: unmatched ticks drop).
    *
    * `quoteCols` are carried from the quote side; both inputs must share
    * the `key` and `ts` column names. Ties at equal ts match (>=), which
    * is why quotes sort before ticks within a timestamp. `quoteTiebreak`
    * (a quote column) makes the pick among duplicate (key, ts) quote rows
    * deterministic — the LARGEST tiebreak value wins; without it,
    * `last(ignoreNulls)` would return whichever duplicate the sort
    * happened to place last. Matched-ness is tracked with an explicit
    * marker column, not `quoteCols.head IS NOT NULL`, so a quote row
    * carrying a legitimately-null payload column still matches.
    */
  def asof(ticks: DataFrame, quotes: DataFrame, key: String, ts: String,
      tickCols: Seq[String], quoteCols: Seq[String], quoteTiebreak: String): DataFrame = {
    val nul = (c: String) => lit(null).as(c)
    val tbType = quotes.schema(quoteTiebreak).dataType
    val t = ticks.select(
      (col(key) +: col(ts).as("__t") +: lit(1).as("__is_tick") +:
        lit(null).cast(tbType).as("__qtb") +: lit(null).cast("int").as("__q") +:
        (tickCols.map(col) ++ quoteCols.map(nul))): _*)
    val q = quotes.select(
      (col(key) +: col(ts).as("__t") +: lit(0).as("__is_tick") +:
        col(quoteTiebreak).as("__qtb") +: lit(1).as("__q") +:
        (tickCols.map(nul) ++ quoteCols.map(col))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__t"), col("__is_tick"), col("__qtb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried: Seq[Column] = quoteCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c))
    val matched = last(col("__q"), ignoreNulls = true).over(w).as("__q")
    t.unionByName(q)
      .select((col(key) +: col("__t") +: col("__is_tick") +: matched +:
        (tickCols.map(col) ++ carried)): _*)
      .filter(col("__is_tick") === 1 && col("__q").isNotNull)
      .drop("__is_tick", "__q")
      .withColumnRenamed("__t", ts)
  }

  /** Attribution shape: each click joined to the user's most recent
    * preceding (or simultaneous) view.
    */
  private def asofQuery(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables(spark, sfDir, "events")
    val ticks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val quotes = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
    asof(ticks, quotes, "user_id", "ts", Seq("event_id"), Seq("view_id", "view_ts"),
      quoteTiebreak = "view_id")
      .orderBy("user_id", "event_id")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_asof_join" -> QueryDef(asofQuery, Some("""
      WITH t AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
      q AS (
        SELECT user_id, event_id AS view_id, ts AS view_ts
        FROM events WHERE event_type = 'view')
      SELECT t.user_id AS user_id, t.ts, t.event_id, q.view_id, q.view_ts
      FROM t ASOF JOIN q ON t.user_id = q.user_id AND t.ts >= q.view_ts
      ORDER BY t.user_id, t.event_id""")))
}
