package graft.ops

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, SessionConf, Tables}

/** File-format source/sink round-trips — the reference's row-format file
  * sink (R5, HdfsSink.java:117-119) generalized to the batch engine's
  * format surface. Each query WRITES the dataset in the format and READS
  * it back as the query result, so the encoder and decoder are both
  * under the DuckDB oracle (which reads the original parquet): a value
  * that does not survive the round-trip fails the hash compare.
  *
  * Scale notes: every writer here is a distributed file-per-partition
  * write (no driver collect); CSV/JSON are row formats kept for
  * interchange parity with the reference, ORC is the columnar
  * alternative to parquet. Doubles survive text formats exactly via
  * shortest-representation printing and exact parse-back.
  */
object Formats extends QueryModule {

  private def src(spark: SparkSession, sfDir: String): DataFrame =
    Tables(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"))

  private def roundtrip(format: String)(spark: SparkSession, sfDir: String): DataFrame = {
    val out = Files.createTempDirectory(s"graft_fmt_$format").toString
    val d = src(spark, sfDir)
    d.write.mode("overwrite").format(format)
      .option("header", "false") // csv only; ignored by json/orc
      .save(out)
    spark.read.format(format).schema(d.schema).load(out)
      .orderBy("o_orderkey")
  }

  private val roundtripOracle = """
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
      FROM orders ORDER BY o_orderkey"""

  /** R10 done physically: write events partitioned by the derived `dt`
    * (the reference's Hive-style layout, R4), then read back ONE
    * partition. The filter must prune at the directory level — pinned in
    * PlanSpec via the scan's PartitionFilters — so at 100 TB the query
    * reads one day, not the table.
    */
  private def partitionedWrite(spark: SparkSession, sfDir: String): DataFrame =
    // dt comes back as a partition DIRECTORY name; keep it a string
    // (inference would turn "20240105" into an int). Partition schema is
    // inferred eagerly at spark.read, so the scoped conf can restore
    // before the query executes.
    SessionConf.scoped(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      val out = Files.createTempDirectory("graft_part").toString
      Tables(spark, sfDir, "events")
        .withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
        .write.mode("overwrite").partitionBy("dt").parquet(out)
      spark.read.parquet(out)
        .filter(col("dt") === "20240106")
        .select(col("event_id"), col("dt"), col("event_type"), col("user_id"))
        .orderBy("event_id")
    }

  /** Compact `df` into files targeting `targetFileBytes` each: measure the
    * source footprint, repartition to ceil(bytes/target), rewrite. The
    * repartition is a round-robin exchange — the one shuffle a compaction
    * pass costs — and the write stays fully distributed. Returns the
    * compacted read-back.
    */
  private[graft] def compactTo(spark: SparkSession, srcDir: String, out: String,
      targetFileBytes: Long): DataFrame = {
    val frag = spark.read.parquet(srcDir)
    val bytes = frag.inputFiles
      .map(f => new java.io.File(new java.net.URI(f)).length()).sum
    val target = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    frag.repartition(target).write.mode("overwrite").parquet(out)
    spark.read.parquet(out)
  }

  /** The small-files problem, end to end: a simulated streaming ingest
    * leaves 64 tiny files (one per sink task — exactly what the
    * reference's rolling file sink produces per trigger interval);
    * compaction rewrites them into size-targeted files. At 100 TB this
    * is the daily maintenance pass that keeps scan task counts sane —
    * file listing, footer reads, and scheduler overhead are all
    * per-file. Content equality with the source is the oracle.
    */
  private def compactFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val frag = Files.createTempDirectory("graft_frag").toString
    val out = Files.createTempDirectory("graft_compact").toString
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .repartition(64)
      .write.mode("overwrite").parquet(frag)
    compactTo(spark, frag, out, targetFileBytes = 128L * 1024 * 1024)
      .orderBy("event_id")
  }

  override val defs: Map[String, QueryDef] = Map(
    "q_compact_files" -> QueryDef(compactFiles, Some("""
      SELECT event_id, user_id, event_type, value, ts
      FROM events ORDER BY event_id""")),
    "q_fmt_csv" -> QueryDef(roundtrip("csv"), Some(roundtripOracle)),
    "q_fmt_json" -> QueryDef(roundtrip("json"), Some(roundtripOracle)),
    "q_fmt_orc" -> QueryDef(roundtrip("orc"), Some(roundtripOracle)),
    "q_partitioned_write" -> QueryDef(partitionedWrite, Some("""
      SELECT event_id, strftime(ts, '%Y%m%d') AS dt, event_type, user_id
      FROM events
      WHERE strftime(ts, '%Y%m%d') = '20240106'
      ORDER BY event_id""")))
}
