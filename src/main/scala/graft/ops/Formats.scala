package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{QueryDef, QueryModule, SessionConf, Tables, TempDirs}

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
    val out = TempDirs.create(s"graft_fmt_$format")
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
      val out = TempDirs.create("graft_part")
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
    // Hadoop FileSystem, not java.io.File: inputFiles are URIs and the
    // compaction substrate at scale is HDFS/S3, where a local-File length
    // probe throws. (FileSystem.get caches per scheme, so this is one FS
    // handle, not one per file.)
    val hconf = spark.sparkContext.hadoopConfiguration
    val bytes = frag.inputFiles.map { f =>
      val p = new Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
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
    val frag = TempDirs.create("graft_frag")
    val out = TempDirs.create("graft_compact")
    Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"), col("ts"))
      .repartition(64)
      .write.mode("overwrite").parquet(frag)
    compactTo(spark, frag, out, targetFileBytes = 128L * 1024 * 1024)
      .orderBy("event_id")
  }

  /** Schema evolution across file generations — the lakehouse reality the
    * reference's fixed Canal envelope sidesteps: an early ingest wrote
    * (event_id, user_id), a later one added (event_type, value). Reading
    * the directory with mergeSchema unions the schemas BY NAME and
    * null-fills columns absent from older files — no rewrite of the old
    * generation. At 100 TB rewriting history for every added column is a
    * non-starter; merge-on-read is the only evolution path. Footer-only
    * schema merge: data pages of the old generation are untouched.
    */
  private def schemaEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val out = TempDirs.create("graft_evolve")
    val e = Tables(spark, sfDir, "events")
    e.filter(col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"))
      .write.mode("overwrite").parquet(s"$out/gen=1")
    e.filter(col("event_id") % 2 === 1)
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .write.mode("overwrite").parquet(s"$out/gen=2")
    spark.read.option("mergeSchema", "true").parquet(s"$out/gen=1", s"$out/gen=2")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .orderBy("event_id")
  }

  /** 16-bit Morton (z-order) code over two 8-bit dimensions, as pure bit
    * expressions (shift/and/or — whole-stage codegen, no UDF): bit i of
    * `a` lands at position 2i+1, bit i of `b` at 2i.
    */
  private[graft] def zval16(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    (0 until 8).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1L)), 2 * i + 1)
        .bitwiseOR(shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ bitwiseOR _)

  /** Z-order clustering — multi-dimensional data skipping for the layout
    * maintenance pass: sort the table by the Morton interleave of
    * (user_id, value-bucket) and range-partition the write, so every
    * output file covers a compact RECTANGLE of the 2-D key space and its
    * parquet min/max stats are tight on BOTH columns. A single-column
    * sort gives perfect skipping on that column and none on the other;
    * z-order trades a little of each for skipping on both (FormatsSpec
    * pins that a value-range predicate touches fewer z-ordered files than
    * single-key-sorted ones). Content is untouched — the oracle is
    * identity — and the z column is dropped before the write; skipping
    * works off the natural columns' file stats.
    */
  private def zorderCluster(spark: SparkSession, sfDir: String): DataFrame = {
    val out = TempDirs.create("graft_zorder")
    zorderWrite(Tables(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"), col("value")), out, nFiles = 8)
    spark.read.parquet(out).orderBy("event_id")
  }

  /** Shared by the query and FormatsSpec: z-order `df` by
    * (user_id, floor(value/2)) into `nFiles` range-partitioned files.
    */
  private[graft] def zorderWrite(df: DataFrame, out: String, nFiles: Int): Unit =
    df.withColumn("z",
        zval16(pmod(col("user_id"), lit(256L)),
          pmod(floor(col("value") / 2).cast("long"), lit(256L))))
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions("z")
      .drop("z")
      .write.mode("overwrite").parquet(out)

  /** Retention pruning — the data-lifecycle maintenance pass: expired `dt`
    * partitions are dropped by DELETING THEIR DIRECTORIES, zero rows read
    * or rewritten (FormatsSpec pins that surviving files are byte-for-byte
    * untouched). At 100 TB this is the difference between a metadata
    * operation and re-writing the table through a filter; it is what the
    * reference's Hive-style dt layout (R4/R10) exists to make cheap.
    */
  private def retentionPrune(spark: SparkSession, sfDir: String): DataFrame =
    SessionConf.scoped(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      val out = TempDirs.create("graft_retain")
      Tables(spark, sfDir, "events")
        .withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
        .select(col("event_id"), col("user_id"), col("event_type"), col("dt"))
        .write.mode("overwrite").partitionBy("dt").parquet(out)
      expirePartitions(spark, out, cutoff = "20240115")
      spark.read.parquet(out)
        .select(col("event_id"), col("user_id"), col("event_type"), col("dt"))
        .orderBy("event_id")
    }

  /** Shared with FormatsSpec: drop dt=<day> partition directories below
    * the cutoff. Pure filesystem metadata — no Spark job — and expressed
    * against the Hadoop FileSystem API so the same pass runs on HDFS/S3
    * (retention at 100 TB is exactly where java.io.File would break).
    */
  private[graft] def expirePartitions(spark: SparkSession, dir: String,
      cutoff: String): Unit = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("dt=") &&
        s.getPath.getName.stripPrefix("dt=") < cutoff)
      .foreach(s => fs.delete(s.getPath, true))
  }

  /** Dynamic partition pruning — the runtime twin of q_partitioned_write's
    * static pruning: the fact side is partitioned by `dt`, the dim side's
    * qualifying days are only known after its filter runs, and Spark
    * injects the dim's dt values into the fact scan's PartitionFilters at
    * runtime (`dynamicpruning` subquery, pinned in PlanSpec). At 100 TB
    * this reads 3 days instead of the table whenever a query joins a
    * filtered calendar/dim — no hand-written IN list needed.
    */
  private def dppJoin(spark: SparkSession, sfDir: String): DataFrame =
    SessionConf.scoped(spark,
      "spark.sql.sources.partitionColumnTypeInference.enabled", "false") {
      val factDir = TempDirs.create("graft_dpp_fact")
      val dimDir = TempDirs.create("graft_dpp_dim")
      Tables(spark, sfDir, "events")
        .withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
        .select(col("event_id"), col("value"), col("dt"))
        .write.mode("overwrite").partitionBy("dt").parquet(factDir)
      val keepDays = Seq("20240105", "20240112", "20240120")
      spark.read.parquet(factDir).select("dt").distinct()
        .withColumn("tag", when(col("dt").isin(keepDays: _*), "keep").otherwise("drop"))
        .write.mode("overwrite").parquet(dimDir)
      val fact = spark.read.parquet(factDir)
      val dim = spark.read.parquet(dimDir).filter(col("tag") === "keep")
      fact.join(dim, "dt")
        .groupBy(col("dt"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy("dt")
    }

  override val defs: Map[String, QueryDef] = Map(
    "q_retention_prune" -> QueryDef(retentionPrune, Some("""
      SELECT event_id, user_id, event_type, strftime(ts, '%Y%m%d') AS dt
      FROM events
      WHERE strftime(ts, '%Y%m%d') >= '20240115'
      ORDER BY event_id""")),
    "q_dpp_join" -> QueryDef(dppJoin, Some("""
      SELECT strftime(ts, '%Y%m%d') AS dt, count(*) AS n,
             round(sum(value), 2) AS sum_value
      FROM events
      WHERE strftime(ts, '%Y%m%d') IN ('20240105', '20240112', '20240120')
      GROUP BY 1 ORDER BY 1""")),
    "q_schema_evolve" -> QueryDef(schemaEvolve, Some("""
      SELECT event_id, user_id,
             CASE WHEN event_id % 2 = 1 THEN event_type END AS event_type,
             CASE WHEN event_id % 2 = 1 THEN value END AS value
      FROM events ORDER BY event_id""")),
    "q_zorder_cluster" -> QueryDef(zorderCluster, Some("""
      SELECT event_id, user_id, value FROM events ORDER BY event_id""")),
    "q_compact_files" -> QueryDef(compactFiles, Some("""
      SELECT event_id, user_id, event_type, value, ts
      FROM events ORDER BY event_id""")),
    "q_fmt_csv" -> QueryDef(roundtrip("csv"), Some(roundtripOracle)),
    "q_fmt_json" -> QueryDef(roundtrip("json"), Some(roundtripOracle)),
    "q_fmt_orc" -> QueryDef(roundtrip("orc"), Some(roundtripOracle)),
    // Avro ships inside spark-sql 4.1 but the short-name "avro" alias
    // lives in the separate spark-avro module's DataSourceRegister
    // service file (absent offline) — the fully-qualified FileFormat
    // class is the documented fallback and exercises the identical
    // read/write path.
    "q_fmt_avro" -> QueryDef(
      roundtrip("org.apache.spark.sql.avro.AvroFileFormat"), Some(roundtripOracle)),
    "q_partitioned_write" -> QueryDef(partitionedWrite, Some("""
      SELECT event_id, strftime(ts, '%Y%m%d') AS dt, event_type, user_id
      FROM events
      WHERE strftime(ts, '%Y%m%d') = '20240106'
      ORDER BY event_id""")))
}
