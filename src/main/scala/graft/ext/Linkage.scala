package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, Tables}

/** Entity resolution / record linkage — the data-cleaning family: match
  * dirty incoming records to a clean reference table WITHOUT an exact
  * key, via blocking + bounded fuzzy verification. The training-data
  * cousin of document dedup: the same blocked-candidates-then-verify
  * shape, at entity (row) granularity over string keys.
  *
  * Scale design — the only shape that survives 100 TB: NEVER the
  * all-pairs `levenshtein` theta-join (O(n²) edit distances). Both
  * sides derive a cheap deterministic BLOCKING key (here: the name
  * prefix); candidates come from a co-partitionable hash equi-join on
  * that key, and the quadratic verifier runs only inside blocks, whose
  * size the key bounds. Recall is exactly the blocking policy (an edit
  * outside the blocked prefix is unmatchable by construction — the
  * standard blocking trade-off); production recall levers are
  * multi-pass blocking (prefix + suffix + phonetic) unioned before
  * verify, which compose as additional equi-joins, not as pair growth.
  */
object Linkage extends QueryModule {

  /** Blocking prefix length: "Supplier#" + the first 7 of 9 digits —
    * blocks are the ≤100 suppliers sharing them.
    */
  private[graft] val BlockLen = 16
  private[graft] val MaxEdit = 1

  /** The deterministically-dirtied incoming batch both engines derive
    * from the fixture (the fixture itself is clean, like
    * q_dq_quarantine's contamination): every 7th supplier's name loses
    * its last digit to an 'X' — edit distance exactly 1 from its
    * source, 0 for the untouched rest.
    */
  private[graft] def dirtyBatch(s: DataFrame): DataFrame =
    s.select(col("s_suppkey").as("r_id"),
      when(col("s_suppkey") % 7 === 3,
        concat(expr("substring(s_name, 1, length(s_name) - 1)"), lit("X")))
        .otherwise(col("s_name")).as("nm"))

  private def fuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_name"))
    // Explicit co-partitioning on the block key with a PINNED partition
    // count: the verify stage's levenshtein work dominates this
    // operator, and its parallelism must come from the BLOCK
    // distribution, not from however many scan splits the input file
    // happened to have (a 3 MB single-file reference = 1 task = 18x
    // slower on the 100k-name receipt). The count must be explicit —
    // `repartition(col)` alone is advisory and AQE coalesces the
    // few-MB exchange back to ONE partition, silently serializing the
    // CPU-bound verify (measured: 70 s either way until pinned). Thin
    // (id, name) rows make the shuffle itself ~free.
    val clean = s.withColumn("bk", substring(col("s_name"), 1, BlockLen))
      .repartition(spark.conf.get("spark.sql.shuffle.partitions").toInt, col("bk"))
    val dirty = dirtyBatch(s).withColumn("bk", substring(col("nm"), 1, BlockLen))
    clean.join(dirty, "bk")
      .select(col("s_suppkey"), col("r_id"),
        levenshtein(col("s_name"), col("nm")).cast("long").as("lev"))
      .filter(col("lev") <= MaxEdit)
      .orderBy("s_suppkey", "r_id")
  }

  /** Shared by q_fuzzy_join and its streaming leg s_linkage_ingest —
    * matching is per-record (stateless), so the streamed link table
    * must equal the batch join exactly.
    */
  private[graft] val fuzzyOracle: String = s"""
      WITH dirty AS (
        SELECT s_suppkey AS r_id,
               CASE WHEN s_suppkey % 7 = 3
                    THEN substring(s_name, 1, length(s_name) - 1) || 'X'
                    ELSE s_name END AS nm
        FROM supplier),
      c AS (SELECT s_suppkey, s_name,
                   substring(s_name, 1, $BlockLen) AS bk FROM supplier),
      d AS (SELECT r_id, nm, substring(nm, 1, $BlockLen) AS bk FROM dirty)
      SELECT c.s_suppkey, d.r_id,
             CAST(levenshtein(c.s_name, d.nm) AS BIGINT) AS lev
      FROM c JOIN d USING (bk)
      WHERE levenshtein(c.s_name, d.nm) <= $MaxEdit
      ORDER BY s_suppkey, r_id"""

  override val defs: Map[String, QueryDef] = Map(
    "q_fuzzy_join" -> QueryDef(fuzzyJoin, Some(fuzzyOracle))
  )
}
