package graft

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
    // Session conf lives in core.Harness (one certified base for all
    // mains). Profile's deltas: big driver results (streaming entries
    // verify through a memory sink; at 100x an O(input)-output entry
    // like s_scd2 trips the 1g collect cap), the GRAFT_CHANGELOG A/B
    // hook, the measurement scratch, and — preserved from its
    // pre-consolidation conf — the DEFAULT codegen cache: Profile times
    // a handful of plans per run, far under the default 100, so the
    // sweep-sized 2000 is Bench/Verify's concern, not Profile's.
    val spark = graft.core.Harness.session("32",
      bigDriverResults = true,
      changelog = sys.env.getOrElse("GRAFT_CHANGELOG", "true"),
      codegenCache = None,
      measurementScratch = shm)
    // SPARK_GRAFT_JITPASS=1 replicates Bench's pre-timing state so a
    // first-timed-run cost seen ONLY inside Bench sweeps can be
    // reproduced and decomposed in isolation. Since r17 this CALLS
    // Bench's own warmPreTimingState (ADVICE r16 #3: the previous
    // inline copy had drifted back to the r15 protocol — sf0.001
    // warm-up, no ensure* steps — after r16 moved the real warm-up to
    // the measured fixture); one body, no drift. The legacy r15
    // protocol remains reproducible via SPARK_GRAFT_JIT_WARMUP_DIR.
    // GRAFT_SMALL_STATE_WIDTH: paired-receipt hook for the streaming
    // small-fixture state width (spark.graft.stream.smallStateWidth) —
    // same A/B role as GRAFT_CHANGELOG above.
    sys.env.get("GRAFT_SMALL_STATE_WIDTH").foreach(v =>
      spark.conf.set("spark.graft.stream.smallStateWidth", v))
    if (sys.env.contains("SPARK_GRAFT_JITPASS")) {
      Bench.warmPreTimingState(spark, sfDir,
        jitWarmupDir = sys.env.getOrElse("SPARK_GRAFT_JIT_WARMUP_DIR", sfDir),
        tag = "profile")
    }
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
