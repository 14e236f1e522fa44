package graft

import org.apache.spark.sql.SparkSession

/** Shared local session for specs — one JVM-wide session, UTC, small
  * shuffle partition count for tiny fixtures.
  */
trait SparkTest {
  lazy val spark: SparkSession = SparkTest.session
  lazy val sf: String = "/root/testdata/sf0.001"
}

object SparkTest {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Same production state store as Engine.session: specs certify the
      // configuration that runs at scale (RocksDB), not the heap default.
      // Codegen-cache sized to the workload (static conf, default 100):
      // the registry compiles ~209 distinct plans, so the default cache
      // LRU-evicts across a sweep — the class of recompile that forced
      // the canary's own re-warm-up at >155 plans. Sweep totals measured
      // noise-dominated either way; this is the root-cause fix for the
      // eviction class, and how a production deployment running this
      // query surface would size the cache.
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      // Changelog checkpointing: commit the per-batch CHANGELOG instead of
      // a full RocksDB snapshot — the recommended production pairing for the
      // RocksDB provider, and what keeps its per-micro-batch constant cost
      // flat at small state sizes.
      .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // The registry's four DELIBERATE metadata-scale global windows
    // (skyline's per-price frontier, string-index's category rank,
    // hybrid-rank's two ≤100-row RRF lists) would spam WindowExec's
    // "No Partition Defined" warning ~50× per suite run, training
    // readers to ignore it. The guard is structural instead: the plan
    // golden pins a gw= (global-window) count per entry, so an
    // ACCIDENTAL global window fails PlanGoldenSpec with a diff — a
    // strictly stronger signal than a log line. With that pin in place,
    // the warning carries no information in the test log and is
    // silenced for the shared test session only (Verify/Bench logs
    // keep it).
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    s
  }
}
