package graft.core

import org.apache.spark.sql.SparkSession

/** Scoped session-conf override: set, run, restore (or unset). A query
  * must not leak conf changes into later queries sharing the
  * SparkSession. Only safe when `body` runs every dependent step that
  * reads the conf: partition-schema inference happens eagerly at
  * `spark.read`, so a DataFrame CREATED inside keeps its inferred schema
  * after restore, but conf read at EXECUTION time (join strategy, AQE)
  * needs the override active around the action instead.
  */
object SessionConf {
  def scoped[T](spark: SparkSession, key: String, value: String)(body: => T): T = {
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, value)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
