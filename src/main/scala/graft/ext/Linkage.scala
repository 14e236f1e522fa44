package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * sides derive cheap deterministic BLOCKING keys; candidates come from
  * co-partitionable hash equi-joins on those keys, and the quadratic
  * verifier runs only inside blocks, whose size the keys bound.
  *
  * Blocking is MULTI-PASS (r13 — the production recall lever the first
  * cut only documented): a prefix pass and a suffix pass, unioned
  * before the verify. Recall is the union of the passes' guarantees —
  * an edit inside the 16-char prefix (unmatchable by the prefix pass
  * alone) keeps the 8-char suffix intact and links through the second
  * pass; only a record corrupted in BOTH key regions is missed, and
  * more passes (phonetic, q-gram) compose the same way: as additional
  * equi-joins, never as pair growth.
  */
object Linkage extends QueryModule {

  /** Blocking prefix length: "Supplier#" + the first 7 of 9 digits —
    * blocks are the ≤100 suppliers sharing them.
    */
  private[graft] val BlockLen = 16

  /** Second-pass blocking suffix length (the last 8 name chars — for
    * the fixture names, the zero-padded low digits, so suffix blocks
    * are near-singletons). `right()` not `substring(len-k)`: total on
    * short strings with identical semantics in both engines.
    */
  private[graft] val SfxLen = 8
  private[graft] val MaxEdit = 1

  /** The deterministically-dirtied incoming batch both engines derive
    * from the fixture (the fixture itself is clean, like
    * q_dq_quarantine's contamination): every 7th supplier's name loses
    * its last digit to an 'X' (an edit the PREFIX pass matches), and
    * every 11th takes an 'X' at position 4 — INSIDE the blocking
    * prefix, the corruption class the single-pass build provably
    * cannot link (LinkageSpec pins exactly that) and the suffix pass
    * exists for. Rule order matters for keys satisfying both
    * congruences; the oracle CASE mirrors it.
    */
  private[graft] def dirtyBatch(s: DataFrame): DataFrame =
    s.select(col("s_suppkey").as("r_id"),
      when(col("s_suppkey") % 7 === 3,
        concat(expr("substring(s_name, 1, length(s_name) - 1)"), lit("X")))
        .when(col("s_suppkey") % 11 === 5,
          concat(substring(col("s_name"), 1, 3), lit("X"),
            expr("substring(s_name, 5)")))
        .otherwise(col("s_name")).as("nm"))

  private[graft] def prefixKey(c: Column): Column = substring(c, 1, BlockLen)
  private[graft] def suffixKey(c: Column): Column =
    call_function("right", c, lit(SfxLen))

  /** One blocked pass: equi-join on `key`, bounded verify. The clean
    * side is repartitioned on the block key with a PINNED partition
    * count: the verify stage's levenshtein work dominates this operator,
    * and its parallelism must come from the BLOCK distribution, not from
    * however many scan splits the input file happened to have (a 3 MB
    * single-file reference = 1 task = 18x slower on the 100k-name
    * receipt). The count must be explicit — `repartition(col)` alone is
    * advisory and AQE coalesces the few-MB exchange back to ONE
    * partition, silently serializing the CPU-bound verify (measured:
    * 70 s either way until pinned). Thin (id, name) rows make the
    * shuffle itself ~free.
    */
  private def linkPass(s: DataFrame, dirty0: DataFrame, nPart: Int,
      key: Column => Column): DataFrame = {
    val clean = s.withColumn("bk", key(col("s_name")))
      .repartition(nPart, col("bk"))
    val dirty = dirty0.withColumn("bk", key(col("nm")))
    clean.join(dirty, "bk")
      .select(col("s_suppkey"), col("r_id"),
        levenshtein(col("s_name"), col("nm")).cast("long").as("lev"))
      .filter(col("lev") <= MaxEdit)
  }

  private def fuzzyJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val s = Tables(spark, sfDir, "supplier").select(col("s_suppkey"), col("s_name"))
    val dirty0 = dirtyBatch(s)
    val nPart = spark.conf.get("spark.sql.shuffle.partitions").toInt
    // Union-distinct AFTER the bounded verify: a clean record matches
    // through both passes (same pair, same lev), so dedup rides the
    // output-sized link set, never the candidate set.
    linkPass(s, dirty0, nPart, prefixKey)
      .unionByName(linkPass(s, dirty0, nPart, suffixKey))
      .distinct()
      .orderBy("s_suppkey", "r_id")
  }

  /** Shared by q_fuzzy_join and its streaming leg s_linkage_ingest —
    * matching is per-record (stateless), so the streamed link table
    * must equal the batch join exactly. Both blocking passes in SQL,
    * UNION (distinct) before the ORDER.
    */
  private[graft] val fuzzyOracle: String = s"""
      WITH dirty AS (
        SELECT s_suppkey AS r_id,
               CASE WHEN s_suppkey % 7 = 3
                    THEN substring(s_name, 1, length(s_name) - 1) || 'X'
                    WHEN s_suppkey % 11 = 5
                    THEN substring(s_name, 1, 3) || 'X' || substring(s_name, 5)
                    ELSE s_name END AS nm
        FROM supplier),
      c AS (SELECT s_suppkey, s_name FROM supplier),
      links AS (
        SELECT c.s_suppkey, d.r_id,
               CAST(levenshtein(c.s_name, d.nm) AS BIGINT) AS lev
        FROM c JOIN dirty d
          ON substring(c.s_name, 1, $BlockLen) = substring(d.nm, 1, $BlockLen)
        WHERE levenshtein(c.s_name, d.nm) <= $MaxEdit
        UNION
        SELECT c.s_suppkey, d.r_id,
               CAST(levenshtein(c.s_name, d.nm) AS BIGINT) AS lev
        FROM c JOIN dirty d
          ON right(c.s_name, $SfxLen) = right(d.nm, $SfxLen)
        WHERE levenshtein(c.s_name, d.nm) <= $MaxEdit)
      SELECT s_suppkey, r_id, lev FROM links
      ORDER BY s_suppkey, r_id"""

  override val defs: Map[String, QueryDef] = Map(
    "q_fuzzy_join" -> QueryDef(fuzzyJoin, Some(fuzzyOracle))
  )
}
