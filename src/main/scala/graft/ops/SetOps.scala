package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}

/** Set algebra. UNION ALL is shuffle-free (plan concatenation); the
  * distinct variants (`UNION`/`INTERSECT`/`EXCEPT`) each cost one hash
  * shuffle on the full row — at scale prefer UNION ALL + downstream
  * dedup-by-key when semantics allow.
  */
object SetOps extends QueryModule {

  private def custNations(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "customer").select(col("c_nationkey").as("nationkey"))

  private def suppNations(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "supplier").select(col("s_nationkey").as("nationkey"))

  private def unionAll(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).unionAll(suppNations(spark, sfDir)).orderBy("nationkey")

  private def unionDistinct(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).union(suppNations(spark, sfDir)).distinct().orderBy("nationkey")

  private def intersect(spark: SparkSession, sfDir: String): DataFrame =
    custNations(spark, sfDir).intersect(suppNations(spark, sfDir)).orderBy("nationkey")

  private def except(spark: SparkSession, sfDir: String): DataFrame = {
    // Customers with a finished order but no open one — non-empty at every
    // SF (nation keys fully overlap between customer and supplier, so the
    // nationkey variant would be trivially empty).
    val o = Tables(spark, sfDir, "orders")
    o.filter(col("o_orderstatus") === "F").select(col("o_custkey"))
      .except(o.filter(col("o_orderstatus") === "P").select(col("o_custkey")))
      .orderBy("o_custkey")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_union_all" -> QueryDef(unionAll, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL SELECT s_nationkey FROM supplier
      ORDER BY nationkey""")),
    "q_union" -> QueryDef(unionDistinct, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION SELECT s_nationkey FROM supplier
      ORDER BY nationkey""")),
    "q_intersect" -> QueryDef(intersect, Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT SELECT s_nationkey FROM supplier
      ORDER BY nationkey""")),
    "q_except" -> QueryDef(except, Some("""
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'P'
      ORDER BY o_custkey""")))
}
