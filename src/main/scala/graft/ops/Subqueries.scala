package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.{QueryDef, QueryModule, Tables}

/** Subquery surface: uncorrelated scalar subqueries and correlated
  * scalar subqueries, entered through `spark.sql` like the reference's
  * HiveQL batch half (README.md:222-252 is itself a multi-CTE SQL
  * statement). Catalyst plans the uncorrelated scalar as a one-row
  * subquery broadcast into the predicate, and DECORRELATES the
  * correlated scalar into an aggregate + outer join — the rewrite that
  * makes per-row subqueries feasible at scale (the naive interpretation
  * would be one query per row).
  */
object Subqueries extends QueryModule {

  private def viewName(spark: SparkSession, sfDir: String, table: String): String = {
    val name = table + "_sq_" + java.lang.Integer.toHexString(sfDir.hashCode)
    Tables(spark, sfDir, table).createOrReplaceTempView(name)
    name
  }

  private def scalarSubquery(spark: SparkSession, sfDir: String): DataFrame = {
    val o = viewName(spark, sfDir, "orders")
    spark.sql(s"""
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM $o
      WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM $o)
      ORDER BY o_orderkey""")
  }

  private def correlatedScalar(spark: SparkSession, sfDir: String): DataFrame = {
    val o = viewName(spark, sfDir, "orders")
    val c = viewName(spark, sfDir, "customer")
    spark.sql(s"""
      SELECT c_custkey,
             (SELECT round(max(o_totalprice), 2) FROM $o o
              WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM $c c
      ORDER BY c_custkey""")
  }

  /** `NOT IN (subquery)` over a NULLABLE list — three-valued logic, the
    * one anti-join shape with different semantics from NOT EXISTS (any
    * NULL in the list empties the result). Catalyst plans the
    * single-column broadcastable case as a null-aware anti join
    * (BroadcastHashJoin LeftAnti with isNullAwareAntiJoin=true) instead
    * of the quadratic BroadcastNestedLoopJoin the naive interpretation
    * needs — pinned in PlanSpec. The `nullif` keeps the list provably
    * nullable (so the NAAJ path, not a plain anti join, is what's
    * exercised) while never actually producing a NULL on the fixtures.
    */
  private def joinNullAnti(spark: SparkSession, sfDir: String): DataFrame = {
    val c = viewName(spark, sfDir, "customer")
    val o = viewName(spark, sfDir, "orders")
    spark.sql(s"""
      SELECT c_custkey, c_name FROM $c
      WHERE c_custkey NOT IN
        (SELECT nullif(o_custkey, -1) FROM $o WHERE o_totalprice > 350000)
      ORDER BY c_custkey""")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_join_null_anti" -> QueryDef(joinNullAnti, Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE c_custkey NOT IN
        (SELECT nullif(o_custkey, -1) FROM orders WHERE o_totalprice > 350000)
      ORDER BY c_custkey""")),
    "q_scalar_subquery" -> QueryDef(scalarSubquery, Some("""
      SELECT o_orderkey, round(o_totalprice, 2) AS price
      FROM orders
      WHERE o_totalprice > 1.5 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey""")),
    "q_correlated_scalar" -> QueryDef(correlatedScalar, Some("""
      SELECT c_custkey,
             (SELECT round(max(o_totalprice), 2) FROM orders o
              WHERE o.o_custkey = c.c_custkey) AS max_price
      FROM customer c
      ORDER BY c_custkey""")))
}
