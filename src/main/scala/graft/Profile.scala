package graft
import org.apache.spark.sql.SparkSession

/** Local profiling harness (not part of the driver contract): time selected
  * queries twice (cold/warm) to separate JIT/IO warmup from plan cost.
  * Usage: runMain graft.Profile <sfDir> <query>[,query...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    // SPARK_GRAFT_NOTAP=1 profiles the production (Bench) form — oracle
    // taps replaced by in-memory materialization, see ext.OracleTap.
    if (sys.env.contains("SPARK_GRAFT_NOTAP"))
      System.setProperty("graft.tap.disabled", "true")
    // Same measurement substrate as Bench (see its disclosure).
    val shm = graft.core.TempDirs.enableMeasurementScratch()
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val builder0 = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m") // fixtures are single small files; split for scan parallelism
      // The streaming entries verify through a MEMORY sink (a driver
      // table) by harness design; at 100x an O(input)-output entry like
      // s_scd2 emits ~10M rows, tripping the default 1g collect cap.
      // Raising it here is a local-harness setting (128 GiB driver) —
      // production sinks are files (s_pipeline), not driver memory.
      .config("spark.driver.maxResultSize", "8g")
      // Production state store + changelog checkpointing, same as
      // Engine.session/Bench/Verify — profiles must measure the certified
      // configuration.
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", sys.env.getOrElse("GRAFT_CHANGELOG", "true"))
    val spark = shm.fold(builder0)(r =>
      builder0.config("spark.local.dir", s"$r/spark_local")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        // toRdd.count() forces every output column (df.count() lets the
        // optimizer prune the work being measured) — same as Bench.
        val n = fn(spark, sfDir).queryExecution.toRdd.count()
        println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
