package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}

/** Bucketed co-located join — the zero-shuffle join layout for repeated
  * large-fact joins at scale: both sides are written `bucketBy` the join
  * key (hash-partitioned into files at write time), so the join reads
  * co-located buckets and plans a SortMergeJoin with NO Exchange on
  * either side (pinned in PlanSpec). At 100 TB this converts an
  * every-query shuffle of both tables into a one-time write-side cost —
  * the standard layout for fact tables joined on the same key by many
  * queries.
  */
object Bucketed extends QueryModule {

  private val Buckets = 8

  /** Write both sides bucketed by the join key (idempotent per session /
    * warehouse dir), return the co-located join result.
    */
  def bucketedJoin(spark: SparkSession, sfDir: String): DataFrame = {
    // Table names carry the source dir so different scale factors in one
    // session (Verify vs specs) never reuse each other's buckets.
    val tag = java.lang.Integer.toHexString(sfDir.hashCode)
    val (ot, ct) = (s"orders_bkt_$tag", s"customer_bkt_$tag")
    val catalog = spark.catalog
    if (!catalog.tableExists(ot)) {
      graft.core.Warehouse.clearLocation(spark, ot)
      Tables(spark, sfDir, "orders")
        .write.bucketBy(Buckets, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable(ot)
    }
    if (!catalog.tableExists(ct)) {
      graft.core.Warehouse.clearLocation(spark, ct)
      Tables(spark, sfDir, "customer")
        .write.bucketBy(Buckets, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable(ct)
    }
    val o = spark.table(ot)
    val c = spark.table(ct)
    o.join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy("c_mktsegment")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_bucketed_join" -> QueryDef(bucketedJoin, Some("""
      SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""")))
}
