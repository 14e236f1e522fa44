package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine capability: a Spark query plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Queries without an oracle get a weaker rows-only check.
  *
  * Determinism contract (both sides): key-complete ORDER BY, round(x, 2)
  * on double aggregates, UTC session time zone, matching column names and
  * (as close as practical) matching column types.
  */
final case class QueryDef(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

/** A group of related queries (scans, joins, aggregates, ...). */
trait QueryModule {
  def defs: Map[String, QueryDef]
}
