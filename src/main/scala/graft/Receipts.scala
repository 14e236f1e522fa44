package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 receipt harness (not part of the driver contract): the
  * one-off at-scale measurements VERDICT r7 asked for, committed as a
  * tool so the numbers are reproducible.
  *
  *   runMain graft.Receipts math <sfDir>
  *     q_math_funcs production-form receipt: oracle form (global ORDER
  *     BY + HALF_UP rounds) vs the same projection without the sort,
  *     and without the per-row BigDecimal rounds — the two costs the
  *     §13 attribution named.
  *
  *   runMain graft.Receipts longdocs <outDir> <nDocs> <tokPerDoc>
  *     Deterministic long-document fixture for production-width span
  *     dedup: ~9% exact copies (doc_id % 11 == 1 copies its
  *     predecessor), and docs with seed % 7 == 3 share a 120-token
  *     window (keyed by seed % 5) at positions 300-419 — so width-50
  *     spans exist across DISTINCT documents, exercising the gram-index
  *     path, not just the whole-doc-copy branch.
  *
  *   runMain graft.Receipts span <docsParquet> <width>
  *     Time staged spansOf at the given shingle width over any
  *     documents table (doc_id, text).
  *
  *   runMain graft.Receipts blob <nBlobs> <mbPerBlob>
  *     MB-scale binaryFile ingestion receipt: seed N deterministic
  *     blobs of M MiB each (marker-gated), then time the
  *     q_binary_ingest projection (digest + length, content dies at the
  *     scan) — the amortized-open economics production blobs have,
  *     complementing the r7 tiny-blob worst case.
  */
object Receipts {

  private def session(): SparkSession = {
    // Same measurement substrate as Bench (see its disclosure).
    val shm = graft.core.TempDirs.enableMeasurementScratch()
    // Session conf lives in core.Harness (one certified base for all
    // mains). Receipts' deltas: big driver results (100x memory-sink
    // receipts) + the measurement scratch.
    graft.core.Harness.session("32",
      bigDriverResults = true,
      measurementScratch = shm)
  }

  private def time(label: String, df: => DataFrame): Unit =
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      // toRdd.count() forces every output column — same honesty as Bench.
      val n = df.queryExecution.toRdd.count()
      println(f"[receipt] $label run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }

  /** The symmetric 2M-node ring + 50-chord batch the incremental-graph
    * receipts (princ, lpainc) share: a sparse graph whose batch
    * influence ball stays bounded, so the delta merges' shuffle records
    * measure the OPERATOR discipline, not fixture noise. Edges and
    * batch come back eagerly checkpointed (pre-materialized, the way a
    * 100 TB deployment's bucketed edge table already is).
    */
  private def ringAndBatch(spark: SparkSession,
      n: Long = 2000000L): (DataFrame, DataFrame) = {
    val ring0 = spark.range(0, n).select(col("id").as("src"),
      ((col("id") + 1) % n).as("dst"))
    val base = ring0.unionByName(
      ring0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    val batch0 = spark.range(0, 50).select((col("id") * 40000).as("src"),
      (col("id") * 40000 + 20000 + col("id")).as("dst"))
    val batchSym = batch0.unionByName(
      batch0.select(col("dst").as("src"), col("src").as("dst")))
      .localCheckpoint(true)
    (base, batchSym)
  }

  /** Shuffle-record meter the delta-vs-full receipts share (r15: it
    * used to exist as two inline copies in princ and lpainc). Sums
    * shuffle WRITE records across completed stages around an action;
    * the drain is a deterministic listener-bus wait (not a fixed
    * sleep) — stage-end events still in flight when the action returns
    * would truncate, or bleed into, the printed counts under load.
    */
  private final class ShuffleMeter(spark: SparkSession) {
    private val recs = new java.util.concurrent.atomic.AtomicLong
    private val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        recs.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
        ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    private def drainBus(): Unit =
      org.apache.spark.GraftListenerBridge.waitUntilEmpty(spark.sparkContext, 60000L)
    def measure(label: String, df: => DataFrame): Unit = {
      drainBus(); recs.set(0L)
      val t0 = System.nanoTime()
      val cnt = df.queryExecution.toRdd.count()
      drainBus()
      println(f"[receipt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"($cnt rows, ${recs.get()} shuffle records)")
    }
    def close(): Unit = spark.sparkContext.removeSparkListener(listener)
  }

  def main(args: Array[String]): Unit = args(0) match {

    case "math" =>
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "lineitem").queryExecution.toRdd.count()
      time("math oracle-form (ORDER BY + rounds)", SparkEntry.queries("q_math_funcs")(spark, sfDir))
      time("math prod-form (no ORDER BY)", graft.ops.Scalars.mathProjection(spark, sfDir))
      time("math prod-form (no ORDER BY, no rounds)", graft.ops.Scalars.mathProjectionNoRound(spark, sfDir))
      spark.stop()

    case "longdocs" =>
      val (out, nDocs, tokPerDoc) = (args(1), args(2).toLong, args(3).toInt)
      val spark = session()
      spark.range(nDocs).select(col("id").as("doc_id"))
        .withColumn("c",
          when(col("doc_id") % 11 === 1, col("doc_id") - 1).otherwise(col("doc_id")))
        .withColumn("text", expr(
          s"""concat_ws(' ', transform(sequence(0, $tokPerDoc - 1),
             |  i -> CASE WHEN c % 7 = 3 AND i >= 300 AND i < 420
             |            THEN concat('s', c % 5, '_', i)
             |            ELSE concat('w', pmod(c * 48271 + i * 40503, 999999937)) END))""".stripMargin))
        .select("doc_id", "text")
        .repartition(32)
        .write.mode("overwrite").parquet(out)
      println(s"[receipt] longdocs: $nDocs docs x $tokPerDoc tokens -> $out")
      spark.stop()

    case "concurrent" =>
      // VERDICT r9 #6: a shared 100 TB cluster runs N queries at once;
      // everything else in this file benches serially. Run 8 MIXED
      // registry entries (ANN probes, persisted-index near-dup, dedup,
      // ranking, relational agg, window) first serially then all at
      // once on local[32], and record per-entry latency in both modes.
      // Scheduler fairness + index-reader contention are the subjects:
      // concurrent latency within ~2x of serial per entry = healthy.
      val sfDir = args(1)
      val spark = session()
      val entries = Seq("q_ann_ivf_probe", "q_ann_ivfpq_probe", "q_ann_ivf_batch",
        "q_minhash_incremental", "q_dedup_exact", "q_bm25", "q_agg_group", "q_win_rank",
        // r11 additions: the audit scan family and an iterative-graph
        // job (its per-round actions contend with everything else).
        "q_dq_rules", "q_graph_bfs")
      // Warm-up (seeds, JIT, footer caches) — same discipline as Bench.
      entries.foreach { n =>
        try SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        catch { case _: Throwable => () }
      }
      def once(n: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      val serial = entries.map(n => n -> once(n)).toMap
      val serialWall = serial.values.sum
      val conc = new java.util.concurrent.ConcurrentHashMap[String, Double]()
      val t0 = System.nanoTime()
      val threads = entries.map { n =>
        new Thread(() => conc.put(n, once(n)))
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val concWall = (System.nanoTime() - t0) / 1e9
      entries.foreach { n =>
        val s = serial(n); val c = conc.get(n)
        println(f"[receipt] concurrent $n%-24s serial $s%6.2f s  concurrent $c%6.2f s  (${c / s}%4.1fx)")
      }
      println(f"[receipt] concurrent aggregate: serial wall $serialWall%.1f s, " +
        f"${entries.size}-way concurrent wall $concWall%.1f s (${serialWall / concWall}%.2fx throughput)")
      spark.stop()

    case "canalcrash" =>
      // VERDICT r9 #8: kill-BETWEEN-sink-commit-and-checkpoint proof for
      // the Canal pipeline at scale (run against a ScaleGen 20x dir).
      // Life 1 runs the full parse->filter->flatten->partitioned-sink
      // pipeline in 8 micro-batches; the crash window is simulated by
      // deleting the final checkpoint commit record (sink ledger has the
      // batch, checkpoint doesn't); life 2 must dedup the replayed batch
      // — committed rows and data files byte-identical.
      val sfDir = args(1)
      val spark = session()
      import org.apache.spark.sql.types.{StructType, StructField, StringType}
      spark.conf.set("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      val topic = graft.core.TempDirs.create("graft_canalcrash_topic")
      val out = graft.core.TempDirs.create("graft_canalcrash_out")
      val ckpt = graft.core.TempDirs.create("graft_canalcrash_ckpt")
      val nIn = graft.core.Tables(spark, sfDir, "events")
        .select(to_json(struct(
          col("event_id").as("id"),
          (unix_micros(col("ts")) / lit(1000L)).cast("long").as("es"),
          ((unix_micros(col("ts")) / lit(1000L)).cast("long") + lit(1000L)).as("ts"),
          when(col("event_type") === "error", "CREATE").otherwise("INSERT").as("type"),
          when(col("event_type") === "error", "true").otherwise("false").as("isDdl"),
          lit("qfbap_ods").as("database"), lit("events").as("table"),
          array(map(lit("user_id"), col("user_id").cast("string"),
            lit("event_type"), col("event_type"),
            lit("value"), col("value").cast("string"))).as("data"))).as("value"))
        .repartition(8)
        .write.mode("overwrite").text(topic)
      def life(label: String): Double = {
        val t0 = System.nanoTime()
        val parsed = graft.cdc.Cdc.parseEnvelope(spark.readStream
          .schema(StructType(Seq(StructField("value", StringType))))
          .option("maxFilesPerTrigger", "1").text(topic))
        val q = graft.cdc.Cdc
          .flatten(graft.cdc.Cdc.ddlFilter(parsed), Seq("user_id", "event_type", "value"))
          .withColumn("dt", graft.cdc.Cdc.eventTimeDt(col("es")))
          .writeStream.format("parquet").partitionBy("dt")
          .option("path", out).option("checkpointLocation", ckpt)
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"[receipt] canal $label: $dt%.1f s")
        dt
      }
      life("life 1 (8 micro-batches to completion)")
      val rows1 = spark.read.parquet(out).count()
      def files() = {
        def walk(f: java.io.File): Seq[java.io.File] =
          if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty[java.io.File]).toSeq.flatMap(walk)
          else Seq(f)
        walk(new java.io.File(out))
          .filter(f => f.getName.endsWith(".parquet") && !f.getPath.contains("_spark_metadata"))
          .map(_.getName).sorted
      }
      val files1 = files()
      val commits = new java.io.File(ckpt, "commits").listFiles()
        .filter(_.getName.forall(_.isDigit)).sortBy(_.getName.toInt)
      val last = commits.last
      require(last.delete())
      new java.io.File(last.getParentFile, s".${last.getName}.crc").delete()
      life("life 2 (replay of the crashed batch)")
      val rows2 = spark.read.parquet(out).count()
      require(rows1 == rows2, s"exactly-once violated: $rows1 -> $rows2 rows")
      require(files() == files1, "replay wrote new data files")
      println(s"[receipt] canal exactly-once at scale: $rows1 committed rows, " +
        s"${files1.length} data files, byte-identical across the crash replay")
      spark.stop()

    case "delete" =>
      // Takedown economics at 100x (200k vectors): deletion must be
      // O(delete batch) — an id-list write + manifest swap, never a
      // postings rewrite — and the probe-side tombstone anti-join must
      // cost ~nothing against the pruned candidate scan. Compaction
      // then materializes the drop physically.
      val sfDir = args(1)
      val spark = session()
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      e.queryExecution.toRdd.count()
      import org.apache.spark.sql.functions.max
      val dir = graft.core.TempDirs.create("graft_receipt_delete")
      graft.ext.Similarity.writeIvfIndex(spark, dir, e,
        train = Some(e.filter(col("vec_id") =!= 0)))
      val anchor = e.filter(col("vec_id") === 0)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      def probe() = graft.ext.Similarity
        .probeIvfIndex(spark, dir, anchor, nprobe = 4, k = 10, exclude = Some(0L))
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        println(f"[receipt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
      val pre = timed("probe, no tombstones")(probe().collect().map(_.getLong(0)).toSeq)
      import spark.implicits._
      val ids = pre.take(3)
      timed(s"ivfIndexDelete of ${ids.length} ids (O(batch): id list + manifest swap)") {
        graft.ext.Similarity.ivfIndexDelete(spark, dir, ids.toDF("vec_id"))
      }
      val post = timed("probe, tombstone anti-join active")(
        probe().collect().map(_.getLong(0)).toSeq)
      require(ids.forall(i => !post.contains(i)), s"deleted ids leaked: $post")
      timed("ivfIndexCompact (materializes the drop)") {
        graft.ext.Similarity.ivfIndexCompact(spark, dir)
      }
      val postC = timed("probe, post-compaction (ledger clear)")(
        probe().collect().map(_.getLong(0)).toSeq)
      require(postC == post, "compaction changed the post-delete probe")
      println(s"[receipt] deleted=${ids.mkString(",")} invisible pre+post compaction")
      // MinHash twin at the same scale: takedown of an indexed doc, the
      // probe's pairs against it must vanish at O(delete) cost.
      val docs = graft.core.Tables(spark, sfDir, "documents")
      val mdir = graft.core.TempDirs.create("graft_receipt_mdel")
      timed("minhash index build (seed, untimed in entries)") {
        graft.ext.Dedup.writeMinhashIndex(spark, mdir, docs.filter(col("doc_id") % 2 === 0))
      }
      val mbatch = docs.filter(col("doc_id") % 2 === 1)
      def mprobe() = graft.ext.Dedup.probeMinhashIndex(spark, mdir, mbatch, docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val mpre = timed("minhash probe, no tombstones")(mprobe())
      val victims = mpre.map(_._2).toSeq.sorted.take(3)
      timed(s"minhashIndexDelete of ${victims.length} docs") {
        graft.ext.Dedup.minhashIndexDelete(spark, mdir,
          spark.createDataset(victims)(org.apache.spark.sql.Encoders.scalaLong).toDF("doc_id"))
      }
      val mpost = timed("minhash probe, tombstone anti-join active")(mprobe())
      require(victims.forall(v => !mpost.exists(_._2 == v)), "deleted docs leaked")
      require(mpost == mpre.filterNot(p => victims.contains(p._2)),
        "non-deleted pairs changed")
      println(s"[receipt] minhash deleted=${victims.mkString(",")}: " +
        s"${mpre.size} -> ${mpost.size} pairs, others intact")
      spark.stop()

    case "coarsecells" =>
      // VERDICT r9 #4 receipt: per-probe cell choice cost, linear scan
      // vs the exact branch-and-bound over the grouped centroid index,
      // at an inflated C (a 100 TB corpus quantizes into 10^5-10^6
      // cells; fixtures only reach sqrt(n)). Pure driver compute —
      // what every probe pays before any Spark job runs.
      val c = if (args.length > 1) args(1).toInt else 100000
      val qn = 1000
      val dim = 64
      val rnd = new scala.util.Random(17)
      // Two centroid distributions: CLUSTERED (k-means centroids of real
      // embedding corpora inherit the data's manifold structure — the
      // case the bound prunes) and UNIFORM-RANDOM (an adversarial
      // no-structure worst case where triangle-inequality pruning
      // cannot help and the b&b must merely not lose).
      val hubs = Array.fill(256)(Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat))
      def clustered() = {
        val h = hubs(rnd.nextInt(hubs.length))
        Array.tabulate(dim)(d => h(d) + (rnd.nextDouble() * 2 - 1).toFloat * 0.15f)
      }
      for ((label, gen) <- Seq(
        ("clustered", () => clustered()),
        ("uniform", () => Array.fill(dim)((rnd.nextDouble() * 2 - 1).toFloat)))) {
        val cents = Array.fill(c)(gen())
        val queries = Array.fill(qn)(gen())
        val tb0 = System.nanoTime()
        val ci = graft.ext.Similarity.buildCoarseIndex(cents)
        println(f"[receipt] $label%-9s coarse index build over $c cells: ${(System.nanoTime() - tb0) / 1e9}%.2f s (one-time per index build)")
        def linFull(q: Array[Float]): Seq[Int] = {
          val sims = cents.zipWithIndex
            .map { case (cent, i) => (i, graft.ext.Similarity.cosineKernel(cent, q)) }
          sims.sortBy(-_._2).take(4).map(_._1).toSeq
        }
        val t1 = System.nanoTime()
        val linRes = queries.map(linFull)
        val tLin = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val bbRes = queries.map(q => graft.ext.Similarity.topCellsExact(ci, cents, q, 4))
        val tBb = (System.nanoTime() - t2) / 1e9
        val mismatches = linRes.zip(bbRes).count { case (a, b) => a != b }
        println(f"[receipt] $label%-9s cell choice x$qn queries: linear ${tLin * 1000 / qn}%.2f ms/probe, " +
          f"b&b ${tBb * 1000 / qn}%.2f ms/probe (${tLin / tBb}%.1fx), mismatches=$mismatches")
      }

    case "semdedupinc" =>
      // Incremental-semdedup economics at 100x (200k vectors): the seed
      // index build (one-time, untimed in entries) vs per-batch ingest
      // vs the full recompute a batch would otherwise pay. The ingest
      // must scale with the batch and its touched cells, not the corpus.
      val sfDir = args(1)
      val spark = session()
      val e = graft.core.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      e.queryExecution.toRdd.count()
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId * 9 / 10
      val dir = graft.core.TempDirs.create("graft_receipt_sdi")
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[receipt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      val nSeed = e.filter(col("vec_id") < cut).count()
      timed(s"semdedup index seed over $nSeed vectors (one-time, untimed in entries)") {
        graft.ext.Similarity.writeSemdedupIndex(spark, dir, e.filter(col("vec_id") < cut), tau = 0.4)
      }
      val batchRows = timed("ingest of the top-decile batch (touches ~every cell)") {
        graft.ext.Similarity.semdedupIndexIngest(spark, dir,
          e.filter(col("vec_id") >= cut), tau = 0.4).count()
      }
      // The real incremental shape: a SMALL batch touches few cells, so
      // the member read partition-prunes to its groups and the pair work
      // scales with the batch, not the corpus.
      val smallRows = timed("ingest of a 1000-vector batch (prune-proportional)") {
        graft.ext.Similarity.semdedupIndexIngest(spark, dir,
          e.filter(col("vec_id") >= cut).limit(1000)
            .withColumn("vec_id", col("vec_id") + 1000000000000L), tau = 0.4).count()
      }
      val fullRows = timed("full recompute over the union (what each batch avoids)") {
        graft.ext.Similarity.semdedupPrune(e, tau = 0.4).count()
      }
      println(s"[receipt] semdedupinc: decile batch=$batchRows rows, small=$smallRows, full=$fullRows rows")
      spark.stop()

    case "semdedupdel" =>
      // Takedown economics on the semdedup index at 100x: the delete is
      // an O(delete-batch) id-list publish (never a members rewrite),
      // the next ingest pays one extra anti-join against the ledger, and
      // compaction materializes the drop at one partitioned rewrite.
      val sfDir = args(1)
      val spark = session()
      val e = graft.core.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      e.queryExecution.toRdd.count()
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId * 9 / 10
      val dir = graft.core.TempDirs.create("graft_receipt_sdd")
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[receipt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      timed("semdedup index seed (one-time, untimed in entries)") {
        graft.ext.Similarity.writeSemdedupIndex(spark, dir, e.filter(col("vec_id") < cut), tau = 0.4)
      }
      timed("delete of a 2000-member takedown batch (id-list publish)") {
        graft.ext.Similarity.semdedupIndexDelete(spark, dir,
          e.filter(col("vec_id") < 2000).select(col("vec_id")))
      }
      timed("post-delete ingest of a 1000-vector batch (ledger anti-join riding the pruned read)") {
        graft.ext.Similarity.semdedupIndexIngest(spark, dir,
          e.filter(col("vec_id") >= cut).limit(1000), tau = 0.4).count()
      }
      val before = spark.read.parquet(s"$dir/members").count()
      timed("compaction (materializes the drop, clears the ledger)") {
        graft.ext.Similarity.semdedupIndexCompact(spark, dir)
      }
      val after = spark.read.parquet(s"$dir/members").count()
      println(s"[receipt] semdedupdel: members $before -> $after " +
        s"(tombstones left: ${graft.ext.Dedup.readTombstoneManifest(dir).size})")
      spark.stop()

    case "semdedupstream" =>
      // Streaming semdedup ingest at 100x: the foreachBatch commit cost
      // for a 1000-vector micro-batch arriving over a stream — the
      // incremental-ingest receipt's shape plus the streaming machinery.
      val sfDir = args(1)
      val spark = session()
      val e = graft.core.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      e.queryExecution.toRdd.count()
      val maxId = e.agg(max(col("vec_id"))).head().getLong(0)
      val cut = maxId * 9 / 10
      val dir = graft.core.TempDirs.create("graft_receipt_sds")
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[receipt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      timed("semdedup index seed (one-time, untimed in entries)") {
        graft.ext.Similarity.writeSemdedupIndex(spark, dir,
          e.filter(col("vec_id") < cut), tau = 0.4)
      }
      val srcDir = graft.core.TempDirs.create("graft_receipt_sds_src")
      e.filter(col("vec_id") >= cut).limit(1000)
        .coalesce(1).write.mode("overwrite").parquet(srcDir)
      val schema = spark.read.parquet(srcDir).schema
      timed("streamed 1000-vector micro-batch (foreachBatch dominance-check + commit)") {
        val q = spark.readStream.schema(schema).parquet(srcDir)
          .writeStream
          .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
            if (!b.isEmpty) {
              graft.ext.Similarity.semdedupIndexIngest(spark, dir, b, tau = 0.4,
                ingestKey = Some(s"stream-$batchId")).queryExecution.toRdd.count()
              ()
            }
          }
          .option("checkpointLocation", graft.core.TempDirs.create("graft_receipt_sds_ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      println(s"[receipt] committed batches: ${graft.ext.Dedup.readBatchManifest(dir).size}")
      spark.stop()

    case "semdedupjoin" =>
      // VERDICT r9 #2 receipt: the co-partitioned fine-centroid JOIN
      // assignment vs the closure-map path at scale. Run against a
      // ScaleGen'd embeddings fixture (100x of sf0.1 = ~600k vectors);
      // reports wall for both paths and proves row-identity of the
      // (vec_id -> cell) assignment at that scale.
      val sfDir = args(1)
      val spark = session()
      val e = graft.core.Tables(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))
      e.queryExecution.toRdd.count()
      def cellsOf(force: Boolean): (DataFrame, Double) = {
        val t0 = System.nanoTime()
        val cells = graft.ext.Similarity.semdedupCells(e, targetCell = 64,
          forceJoinAssign = force)
        (cells, (System.nanoTime() - t0) / 1e9)
      }
      val (cClosure, tClosure) = cellsOf(force = false)
      val (cJoin, tJoin) = cellsOf(force = true)
      println(f"[receipt] semdedup closure-assign build: $tClosure%.2f s")
      println(f"[receipt] semdedup join-assign build:    $tJoin%.2f s")
      val diff = cClosure.select(col("vec_id"), col("cell").as("c1"))
        .join(cJoin.select(col("vec_id"), col("cell").as("c2")), Seq("vec_id"), "full")
        .where(col("c1").isNull || col("c2").isNull || col("c1") =!= col("c2"))
        .count()
      println(s"[receipt] assignment mismatches closure vs join: $diff")
      cClosure.unpersist(); cJoin.unpersist()
      spark.stop()

    case "span" =>
      val (docsPath, width) = (args(1), args(2).toInt)
      val spark = session()
      val docs = spark.read.parquet(docsPath)
      docs.queryExecution.toRdd.count()
      time(s"spansOf staged width=$width", graft.ext.Dedup.spansOf(docs, width))
      spark.stop()

    case "session" =>
      // The sessionization scale story: q_session_batch (gaps-and-islands,
      // ONE user_id exchange) is the production path; s_session's
      // state-store merge has an inherent ~24 µs/row floor. The RocksDB
      // leg measures whether the production state store moves that floor.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "events").queryExecution.toRdd.count()
      time("q_session_batch", SparkEntry.queries("q_session_batch")(spark, sfDir))
      // Engine.session now registers RocksDB as the production provider;
      // the heap (HDFSBacked) leg is the documented fallback A/B.
      time("s_session (RocksDB state store, registered)",
        SparkEntry.queries("s_session")(spark, sfDir))
      graft.core.SessionConf.scoped(spark,
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider") {
        time("s_session (heap state store fallback)", SparkEntry.queries("s_session")(spark, sfDir))
      }
      spark.stop()

    case "residual" =>
      // Residual (IVFADC) vs whole-vector PQ, kernel-level, on two
      // controlled distributions: CLUSTERED (the shape a real embedding
      // corpus has — residuals are small within a cell, so the codebook's
      // 256 codes cover a tight ball) and NEAR-UNIFORM (the graded
      // fixture's shape — weak cells, residuals nearly vector-sized, so
      // the schemes are at parity; measured fixture recall moved only
      // 0.913 → 0.925 at nprobe=4). Driver-side kernels only.
      def synth(n: Int, dim: Int, clusters: Int, sigma: Double, seed: Int): Array[Array[Float]] = {
        val rnd = new scala.util.Random(seed)
        val centers = Array.fill(clusters)(Array.fill(dim)((rnd.nextGaussian()).toFloat))
        Array.fill(n) {
          val c = centers(rnd.nextInt(clusters))
          c.map(x => x + (rnd.nextGaussian() * sigma).toFloat)
        }
      }
      def audit(vecs: Array[Array[Float]], label: String): Unit = {
        val cents = graft.ext.Similarity.lloydLocal(
          vecs.map(graft.ext.Similarity.l2Normalize), 64, 10)
        val plainCb = graft.ext.Similarity.pqTrainLocal(vecs, 8, 256, 10)
        val residCb = graft.ext.Similarity.pqTrainResidual(vecs, cents)
        def stats(adcOf: Array[Float] => (Array[Float] => Double)): (Double, Double) = {
          var worst = 0.0; var sum = 0.0; var n = 0
          (0 until vecs.length by math.max(1, vecs.length / 8)).foreach { a =>
            val q = vecs(a)
            val score = adcOf(q)
            vecs.foreach { p =>
              val qn = graft.ext.Similarity.l2Normalize(q)
              val pn = graft.ext.Similarity.l2Normalize(p)
              var exact = 0.0; var i = 0
              while (i < qn.length) { exact += qn(i).toDouble * pn(i); i += 1 }
              val err = math.abs(score(p) - exact)
              sum += err; n += 1; if (err > worst) worst = err
            }
          }
          (sum / n, worst)
        }
        val (pm, pw) = stats { q =>
          val codeOf = (p: Array[Float]) => graft.ext.Similarity.pqEncode(plainCb, p)
          (p: Array[Float]) => graft.ext.Similarity.adcApprox(plainCb, q, codeOf(p))
        }
        val (rm, rw) = stats { q => (p: Array[Float]) =>
          val cell = graft.ext.Similarity.chooseCells(cents, p, 1).head
          graft.ext.Similarity.adcApproxResidual(residCb, cents,
            cell, q, graft.ext.Similarity.pqEncodeResidual(residCb, cents(cell), p))
        }
        println(f"[receipt] residual $label: |ADC-exact| plain mean=$pm%.4f worst=$pw%.4f" +
          f"  residual mean=$rm%.4f worst=$rw%.4f  (mean improvement ${pm / rm}%.1fx)")
      }
      audit(synth(4000, 64, clusters = 64, sigma = 0.15, seed = 7), "clustered")
      audit(synth(4000, 64, clusters = 4000, sigma = 1.0, seed = 7), "near-uniform")

    case "rangejoin" =>
      // Binned-vs-naive band join. At fixture scale the O(n·m)
      // BroadcastNestedLoopJoin is actually FINE (15M comparisons —
      // measured ~0.5 s warm at sf0.1, on par with the rewrite): the
      // rewrite is not a fixture optimization, it's the plan that
      // SURVIVES scale, so the receipt also runs a deterministic
      // synthetic pair sized where n·m explodes (args: nLeft nRight;
      // comparisons = n·m for the naive vs ~matched-density candidate
      // work for the binned plan).
      val sfDir = args(1)
      val (nL, nR) = if (args.length > 3) (args(2).toLong, args(3).toLong)
        else (20000L, 500000L)
      val spark = session()
      graft.core.Tables(spark, sfDir, "supplier").queryExecution.toRdd.count()
      graft.core.Tables(spark, sfDir, "customer").queryExecution.toRdd.count()
      time("q_join_range_binned (fixture, bucket equi join)",
        SparkEntry.queries("q_join_range_binned")(spark, sfDir))
      time("naive theta twin (fixture, BroadcastNestedLoopJoin)",
        graft.ops.Joins.joinRangeNaive(spark, sfDir))
      def bal(c: org.apache.spark.sql.Column) =
        (pmod(c * 2654435761L, lit(11000000L)).cast("double") / 1000.0) - lit(1000.0)
      val sL = spark.range(nL).select(col("id").as("s_suppkey"), bal(col("id")).as("s_acctbal"))
      val sR = spark.range(nR).select(col("id").as("c_custkey"), bal(col("id") + 7L).as("c_acctbal"))
      val w = graft.ops.Joins.RangeBinW
      time(f"binned synthetic (${nL}%d x ${nR}%d)", {
        val l = sL.select(col("s_suppkey"), col("s_acctbal"), floor(col("s_acctbal") / w).as("b"))
          .select(col("s_suppkey"), col("s_acctbal"),
            explode(array(col("b") - 1, col("b"), col("b") + 1)).as("bin"))
        val r = sR.select(col("c_custkey"), col("c_acctbal"), floor(col("c_acctbal") / w).as("bin"))
        l.join(r, "bin").filter(abs(col("s_acctbal") - col("c_acctbal")) < w)
          .select(col("s_suppkey"), col("c_custkey"))
      })
      time(f"naive synthetic (${nL}%d x ${nR}%d = ${nL * nR}%d comparisons)",
        sL.join(sR, abs(col("s_acctbal") - col("c_acctbal")) < w)
          .select(col("s_suppkey"), col("c_custkey")))
      spark.stop()

    case "audit" =>
      // Round-11c batch-audit family at ScaleGen scale: the DQ rule
      // suite (one conditional-agg scan + key-digest PK check + key-only
      // FK anti join), last-touch attribution (one user-window pass),
      // bounded BFS (per-hop frontier joins over the distinct edge
      // projection), and the HLL union (per-day sketch partials). Point
      // at a ScaleGen dir carrying lineitem, orders, events.
      val sfDir = args(1)
      val spark = session()
      Seq("lineitem", "orders", "events").foreach(t =>
        graft.core.Tables(spark, sfDir, t).queryExecution.toRdd.count())
      time("q_dq_rules", SparkEntry.queries("q_dq_rules")(spark, sfDir))
      time("q_attribution", SparkEntry.queries("q_attribution")(spark, sfDir))
      time("q_graph_bfs", SparkEntry.queries("q_graph_bfs")(spark, sfDir))
      time("q_hll_union", SparkEntry.queries("q_hll_union")(spark, sfDir))
      spark.stop()

    case "audit2" =>
      // Round-11d additions at ScaleGen scale: sketch-boundary decile
      // binning (one approx_percentile pass + a row-local assignment
      // scan) and linear multi-touch attribution (one RANGE-window pass
      // + integer-exact credit assembly).
      val sfDir = args(1)
      val spark = session()
      Seq("lineitem", "orders", "events").foreach(t =>
        graft.core.Tables(spark, sfDir, t).queryExecution.toRdd.count())
      time("q_quantile_bins", SparkEntry.queries("q_quantile_bins")(spark, sfDir))
      time("q_attribution_linear", SparkEntry.queries("q_attribution_linear")(spark, sfDir))
      time("q_win_ntile", SparkEntry.queries("q_win_ntile")(spark, sfDir))
      time("q_dq_quarantine", SparkEntry.queries("q_dq_quarantine")(spark, sfDir))
      time("s_dq_monitor", SparkEntry.queries("s_dq_monitor")(spark, sfDir))
      spark.stop()

    case "tapcost" =>
      // Reproducible evidence for the Bench tap-disable disclosure:
      // the same entries timed with oracle taps ON (Verify's form —
      // parquet write + read-back) vs OFF (Bench's production form —
      // lazy localCheckpoint). The delta is pure verification plumbing.
      val sfDir = args(1)
      val spark = session()
      val entries = Seq("q_hll_union", "q_quantile_bins", "q_agg_approx_distinct",
        "q_approx_percentiles", "q_minhash_near_dup", "q_semdedup")
      def once(n: String): Double = {
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }
      entries.foreach(once) // warm both paths' JIT once, untimed
      Seq(("taps ON ", "false"), ("taps OFF", "true")).foreach { case (label, v) =>
        System.setProperty("graft.tap.disabled", v)
        entries.foreach { n =>
          val t = Seq(once(n), once(n)).min
          println(f"[receipt] tapcost $label $n%-24s $t%5.2f s (best of 2)")
        }
      }
      System.clearProperty("graft.tap.disabled")
      spark.stop()

    case "semdedupphases" =>
      // Phase attribution for the most expensive bench family: where do
      // q_semdedup_rebuild's seconds go? (scratch copy | rebuild op |
      // read-back+output). Run against the driver fixture dir.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "embeddings").queryExecution.toRdd.count()
      graft.ext.Similarity.ensureSemdedupEntryCaches(spark, sfDir)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val dir = graft.core.Warehouse.scratchFromSeed(
          graft.ext.Similarity.ensureVictimsDeletedSemdedupSeed(spark, sfDir),
          "graft_semdedup_phase")
        val t1 = System.nanoTime()
        graft.ext.Similarity.semdedupIndexRebuild(spark, dir, tau = 0.4)
        val t2 = System.nanoTime()
        val n = SparkEntry.queries("q_semdedup_rebuild")(spark, sfDir)
          .queryExecution.toRdd.count()
        val t3 = System.nanoTime()
        println(f"[receipt] semdedup phases run$i: copy ${(t1 - t0) / 1e9}%.2f s, " +
          f"rebuild-op ${(t2 - t1) / 1e9}%.2f s, full-entry ${(t3 - t2) / 1e9}%.2f s ($n rows)")
      }
      spark.stop()

    case "features" =>
      // Feature-engineering pair at ScaleGen scale: z-score stats are
      // one posexplode aggregate (n·64 scalar rows fold map-side);
      // dictionary encoding is one map-side-combined groupBy + a
      // metadata-scale rank window. Dir needs embeddings + events.
      val sfDir = args(1)
      val spark = session()
      Seq("embeddings", "events").foreach(t =>
        graft.core.Tables(spark, sfDir, t).queryExecution.toRdd.count())
      time("q_feature_scale", SparkEntry.queries("q_feature_scale")(spark, sfDir))
      time("q_string_index", SparkEntry.queries("q_string_index")(spark, sfDir))
      spark.stop()

    case "cc" =>
      // Connected-components round economics: rounds to fixpoint and
      // wall time for the registry subgraph at the given sfDir, plus a
      // planted 2^14-node path graph (diameter 16383 — the worst case
      // for plain propagation) to show the pointer-jump round count.
      val sfDir = args(1)
      val spark = session()
      val t0 = System.nanoTime()
      val (labels, rounds) = graft.ops.Graph.ccOnSparse(spark, sfDir)
      val n = labels.queryExecution.toRdd.count()
      println(f"[receipt] cc fixture: $rounds rounds, ${(System.nanoTime() - t0) / 1e9}%.2f s ($n nodes)")
      // Incremental merge economics: base labels from the untimed seed,
      // the timed region is the qty=3 batch merge — cost rides on the
      // batch + touched components, never the base edges.
      graft.ops.Graph.ensureCcLabelsSeed(spark, sfDir)
      (1 to 2).foreach { i =>
        val t2 = System.nanoTime()
        val n3 = SparkEntry.queries("q_graph_cc_incremental")(spark, sfDir)
          .queryExecution.toRdd.count()
        println(f"[receipt] cc incremental run$i: ${(System.nanoTime() - t2) / 1e9}%.2f s ($n3 size-classes)")
      }
      val chain = spark.range(16383).select(
        col("id").as("src"), (col("id") + 1L).as("dst"))
      val sym = chain.unionByName(chain.select(col("dst").as("src"), col("src").as("dst")))
      val t1 = System.nanoTime()
      val (labels2, rounds2) = graft.ops.Graph.ccOn(sym)
      val n2 = labels2.queryExecution.toRdd.count()
      println(f"[receipt] cc path-2^14 (diameter 16383): $rounds2 rounds, ${(System.nanoTime() - t1) / 1e9}%.2f s ($n2 nodes)")
      spark.stop()

    case "skyline" =>
      // Skyline at adversarial cardinality: the fixture part table is
      // dimension-sized (and ScaleGen copies it), so the receipt builds
      // an n-point synthetic (price, size) cloud instead — prices on a
      // 2-dp grid (≈100k distinct), sizes 1..50 — and times the staged
      // plan: per-price hash agg (the only table-sized work), window
      // over ≤100k reduced rows, broadcast join back. The O(n²)
      // dominance definition is the oracle's job at fixture scale; at
      // 10M points it would be 10^14 comparisons.
      val n = args(1).toLong
      val spark = session()
      val pts = spark.range(n).select(
        col("id").as("p_partkey"),
        (round(pmod(col("id") * 48271L, lit(100000L)) / lit(100.0), 2) + lit(1.0)).as("p_retailprice"),
        pmod(col("id") * 40503L, lit(50L)).cast("int").as("p_size"))
        .persist()
      pts.queryExecution.toRdd.count()
      time(s"skyline staged ($n pts)", graft.ops.Windows.skylineOn(pts))
      pts.unpersist()
      spark.stop()

    case "pagerank" =>
      // Iterative-graph scale story: the data-sized cost is the edge
      // projection (distinct over lineitem); the iterations themselves
      // touch only node/edge-sized relations. Point at a ScaleGen dir to
      // measure the data-sized leg at 20×/100×.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "lineitem").queryExecution.toRdd.count()
      time("q_pagerank", SparkEntry.queries("q_pagerank")(spark, sfDir))
      spark.stop()

    case "princ" =>
      // Incremental-PageRank economics: the delta-push merge (the entry's
      // timed region — two frontier-pruned edge joins per round + the
      // batch-neighborhood-sized groupBy) against the full 3-iteration
      // power run on the same union graph. The seed build is the
      // disclosed untimed one-time cost, stamped separately here.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "lineitem").queryExecution.toRdd.count()
      val t0 = System.nanoTime()
      graft.ops.Graph.ensurePrRanksSeed(spark, sfDir)
      println(f"[receipt] pr seed (one-time, untimed economics): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      // The entry as shipped (re-derives the edge projections — the
      // data-sized leg both paths share):
      time("q_pagerank_incremental (entry, incl. edge projection)",
        SparkEntry.queries("q_pagerank_incremental")(spark, sfDir))
      // Operator-only comparison where DATA dominates the stage floor
      // (the fixture's 48k-edge graph is floor-bound either way): a 2M-node
      // sparse ring with a 50-chord batch, edges + seed PRE-MATERIALIZED
      // (at 100 TB the edge table is an already-persisted bucketed table,
      // not a per-query lineitem distinct). The full recompute must push
      // every node's contribution through 3 groupBy(dst) exchanges; the
      // delta-push merge exchanges only the batch's bounded-hop frontier.
      // Both wall-clock and actual shuffle-write records are stamped.
      val (base, batchSym) = ringAndBatch(spark)
      val Seq(r1, r2, r3) = graft.ops.Graph.prUnnormRanks(base, 3, eager = true)
      val seed = base.groupBy("src").agg(count(lit(1)).cast("double").as("outdeg"))
        .select(col("src").as("node"), col("outdeg"))
        .join(r1.select(col("node"), col("r").as("r1")), "node")
        .join(r2.select(col("node"), col("r").as("r2")), "node")
        .join(r3.select(col("node"), col("r").as("r3")), "node")
        .localCheckpoint(true)
      val meter = new ShuffleMeter(spark)
      meter.measure("delta-push merge (2M-node ring, 50-chord batch)",
        graft.ops.Graph.prMergeBatch(seed, base, batchSym)
          .orderBy(col("r").desc).limit(100))
      meter.measure("full 3-iter recompute (2M-node ring union)",
        graft.ops.Graph.prUnnormRanks(base.unionByName(batchSym), 3).last
          .orderBy(col("r").desc).limit(100))
      meter.close()
      spark.stop()

    case "phashingest" =>
      // Streaming pHash ingest economics at scale — the multimodal twin
      // of `minhashingest`: per-micro-batch cost of committing
      // (band, bv, doc_id, ph) postings through foreachBatch (O(batch)
      // signature hashing — blobs die in the task), then the probe that
      // must see the streamed docs. ScaleGen replica 1's docs are
      // textual copies of replica 0 ⇒ identical blobs ⇒ Hamming-0 hits
      // against both the seeded and the streamed postings.
      val sfDir = args(1)
      val spark = session()
      val seed = graft.ext.Multimodal.ensurePhashIndex(spark, sfDir)
      val dir = graft.core.Warehouse.scratchFromSeed(seed, "graft_phash_ingest_rcpt")
      val docs = graft.core.Tables(spark, sfDir, "documents")
      docs.queryExecution.toRdd.count()
      val docsPath = new java.io.File(sfDir, "documents.parquet").getPath
      val schema = spark.read.parquet(docsPath).schema
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(docsPath)
        .filter(col("doc_id") >= 400 && col("doc_id") < 1000000000L)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
          if (!b.isEmpty) graft.ext.Multimodal.phashIndexAppend(spark, dir, b,
            ingestKey = Some(s"stream-$batchId"))
        }
        .option("checkpointLocation", graft.core.TempDirs.create("graft_phash_ingest_rcpt_ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println(f"[receipt] phash stream-ingest 4600-doc slice: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(batches=${graft.ext.Dedup.readBatchManifest(dir).size - 1} committed)")
      time("phash probe after ingest (5000-doc batch vs seed+streamed index)",
        graft.ext.Multimodal.probePhashIndex(spark, dir,
          graft.ext.Multimodal.sigsOf(spark,
            docs.filter(col("doc_id") >= 1000000000L && col("doc_id") < 1000005000L))))
      // Lifecycle tail at the same scale: takedown (tombstone-ledger
      // write) and compaction (merged single-batch rewrite + physical
      // tombstone materialization), probe re-run after each.
      locally {
        import spark.implicits._
        val t1 = System.nanoTime()
        graft.ext.Multimodal.phashIndexDelete(spark, dir, Seq(7L).toDF("doc_id"))
        println(f"[receipt] phash delete (1-doc takedown): ${(System.nanoTime() - t1) / 1e9}%.2f s")
        val t2 = System.nanoTime()
        graft.ext.Multimodal.phashIndexCompact(spark, dir)
        println(f"[receipt] phash compact (seed+streamed -> one batch): ${(System.nanoTime() - t2) / 1e9}%.2f s")
      }
      time("phash probe after delete+compact",
        graft.ext.Multimodal.probePhashIndex(spark, dir,
          graft.ext.Multimodal.sigsOf(spark,
            docs.filter(col("doc_id") >= 1000000000L && col("doc_id") < 1000005000L))))
      spark.stop()

    case "centroids" =>
      // Aggregation-shape A/B behind q_embed_centroids' design choice.
      // BOTH shapes partial-aggregate before their exchange (the hash
      // aggregate combines avg map-side too), so the candidate trade was
      // hash-state width per group — dim scalar entries (posexplode) vs
      // one array buffer (the typed CentroidAgg, kept here as the
      // measurement twin, like Scalars.mathProjection) — against the
      // aggregator's per-row object-encoder cost. Measured crossover:
      // the typed path edges ahead at the few-label fixture, the
      // codegen'd posexplode shape wins 3× at row-cardinality group
      // counts — the regime where aggregation shape matters — so the
      // registry entry uses the codegen shape.
      val sfDir = args(1)
      val spark = session()
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      e.queryExecution.toRdd.count()
      val centroid = udaf(graft.functions.Udafs.CentroidAgg)
      time("q_embed_centroids (posexplode codegen, label groups)",
        SparkEntry.queries("q_embed_centroids")(spark, sfDir))
      time("CentroidAgg twin (label groups)",
        e.groupBy(col("label"))
          .agg(centroid(col("embedding")).as("raw"))
          .select(col("label"), posexplode(col("raw")))
          .select(col("label"), (col("pos") + 1).cast("long").as("pos"),
            round(col("col"), 4).as("mean_v"))
          .orderBy("label", "pos"))
      time("posexplode (row-cardinality groups)",
        e.select(col("vec_id").as("g"), posexplode(col("embedding")))
          .groupBy(col("g"), col("pos"))
          .agg(avg(col("col").cast("double")).as("m"))
          .filter(col("pos") === 0).select(col("g"), col("m")))
      time("CentroidAgg (row-cardinality groups)",
        e.groupBy(col("vec_id").as("g"))
          .agg(centroid(col("embedding")).as("raw"))
          .select(col("g"), element_at(col("raw"), 1).as("m1")))
      spark.stop()

    case "timetravel" =>
      // Versioned-snapshot economics: three latest-state commits (each
      // one entity-key exchange + a staged-rename publish) plus the
      // manifest-gated v2↔v3 diff join.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "events").queryExecution.toRdd.count()
      time("q_time_travel", SparkEntry.queries("q_time_travel")(spark, sfDir))
      spark.stop()

    case "ivfappend" =>
      // Incremental-ingest cost of the persisted ANN index: append a
      // 2000-vector batch against the existing quantizer. O(batch·C)
      // assignment + a staged partitioned publish — never a corpus
      // re-scan. The append runs against a SCRATCH COPY of the canonical
      // index (ADVICE r8): the marker-gated probe index is never mutated,
      // so a crash mid-receipt can't leave phantom rows behind a
      // surviving _SEEDED marker.
      val sfDir = args(1)
      val spark = session()
      val canonical = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val scratch = graft.core.TempDirs.create("graft_ivf_receipt")
      graft.core.Warehouse.copyRecursively(
        new java.io.File(canonical), new java.io.File(scratch))
      val batch = graft.core.Tables(spark, sfDir, "embeddings").limit(2000)
        .select((col("vec_id") + lit(10000000L)).as("vec_id"), col("embedding"))
      val t0 = System.nanoTime()
      graft.ext.Similarity.ivfIndexAppend(spark, scratch, batch)
      println(f"[receipt] ivf append 2000 rows: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      val m = graft.ext.Similarity.readIvfManifest(scratch)
      println(s"[receipt] post-append manifest: batches=${m.batches.mkString(",")} " +
        s"imbalance=${m.imbalance} rebuild_needed=${m.rebuildNeeded} " +
        s"cells=${m.cellCounts.size}")
      graft.core.Warehouse.deleteRecursively(new java.io.File(scratch))
      spark.stop()

    case "ivfbatch" =>
      // Batched-probe economics (VERDICT r8 "missing #2"): Q anchors
      // against the persisted index in ONE job vs Q sequential
      // single-anchor probes. Cost must scale with Q·nprobe·(n/C)
      // candidate rows, not Q full probe jobs.
      val sfDir = args(1)
      val q = if (args.length > 2) args(2).toInt else 64
      val spark = session()
      val dir = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      time(s"q_ann_ivf_batch (Q=$q, one job)",
        graft.ext.Similarity.probeIvfIndexBatch(
          spark, dir, e.filter(col("vec_id") < q), nprobe = 4, k = 5))
      val anchors = e.filter(col("vec_id") < q)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      val t0 = System.nanoTime()
      var rows = 0L
      anchors.foreach { case (_, emb) =>
        rows += graft.ext.Similarity.probeIvfIndex(spark, dir, emb, nprobe = 4, k = 5)
          .queryExecution.toRdd.count()
      }
      println(f"[receipt] $q sequential single probes: ${(System.nanoTime() - t0) / 1e9}%.2f s ($rows rows)")
      spark.stop()

    case "range" =>
      // Range-search economics on the persisted index: the radius scan
      // (ALL candidates with cosine >= tau in nprobe pruned cells) vs the
      // exact full-index threshold scan (nprobe = C) vs the top-k probe
      // floor. The narrow probe reads nprobe/C of the postings files; the
      // exact scan is the completeness ceiling a takedown sweep would pay.
      val sfDir = args(1)
      val spark = session()
      val dir = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val anchor = e.filter(col("vec_id") === 0)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      val cCount = spark.read.parquet(s"$dir/centroids").count().toInt
      time("range tau=0.25 (nprobe=8 pruned cells)",
        graft.ext.Similarity.rangeIvfIndex(spark, dir, anchor,
          nprobe = 8, tau = 0.25, exclude = Some(0L)))
      time(s"range tau=0.25 (nprobe=C=$cCount, exact)",
        graft.ext.Similarity.rangeIvfIndex(spark, dir, anchor,
          nprobe = cCount, tau = 0.25, exclude = Some(0L)))
      // Batched: 64 anchors' radius sweeps in ONE job — candidate work
      // Q·nprobe·(n/C), not Q full probes.
      time("batched range tau=0.25 (Q=64, one job)",
        graft.ext.Similarity.rangeIvfIndexBatch(spark, dir,
          e.filter(col("vec_id") < 64), nprobe = 8, tau = 0.25))
      val narrow = graft.ext.Similarity.rangeIvfIndex(spark, dir, anchor,
        nprobe = 8, tau = 0.25, exclude = Some(0L)).count()
      val full = graft.ext.Similarity.rangeIvfIndex(spark, dir, anchor,
        nprobe = cCount, tau = 0.25, exclude = Some(0L)).count()
      time("top-k probe floor (nprobe=8, k=10)",
        graft.ext.Similarity.probeIvfIndex(spark, dir, anchor,
          nprobe = 8, k = 10, exclude = Some(0L)))
      // ADC range at the same low tau (margin keeps most candidates —
      // exact verify is the gate) and at a takedown-grade tau where the
      // codes-only pre-filter actually prunes.
      time("ADC range tau=0.25 (codes-only pre-filter, low-tau worst case)",
        graft.ext.Similarity.rangeIvfPqIndex(spark, dir, anchor,
          nprobe = 8, tau = 0.25, exclude = Some(0L)))
      time("ADC range tau=0.8 (takedown-grade pre-filter)",
        graft.ext.Similarity.rangeIvfPqIndex(spark, dir, anchor,
          nprobe = 8, tau = 0.8, exclude = Some(0L)))
      println(s"[receipt] range rows: narrow=$narrow exact=$full " +
        f"cell_recall=${if (full == 0) 1.0 else narrow.toDouble / full}%.3f")
      spark.stop()

    case "leases" =>
      // Writer-lease economics: the lease serializes writers PER INDEX
      // DIRECTORY, not fleet-wide — four concurrent appends to four
      // separate scratch indexes must run at parallel wall-clock, while
      // a second writer on the SAME directory fails fast instead of
      // corrupting batch-id allocation.
      val sfDir = args(1)
      val spark = session()
      val canonical = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val batch = e.limit(2000)
        .select((col("vec_id") + lit(30000000L)).as("vec_id"), col("embedding"))
        .localCheckpoint(true)
      def scratch(): String = {
        val d = graft.core.Warehouse.scratchFromSeed(canonical, "graft_lease_receipt")
        d
      }
      val dirs = (0 until 4).map(_ => scratch())
      val t0 = System.nanoTime()
      dirs.foreach(d => graft.ext.Similarity.ivfIndexAppend(spark, d, batch))
      val serial = (System.nanoTime() - t0) / 1e9
      val dirs2 = (0 until 4).map(_ => scratch())
      val t1 = System.nanoTime()
      val threads = dirs2.map { d =>
        val t = new Thread(() =>
          graft.ext.Similarity.ivfIndexAppend(spark, d, batch))
        t.start(); t
      }
      threads.foreach(_.join())
      val par = (System.nanoTime() - t1) / 1e9
      println(f"[receipt] 4 appends to 4 indexes: serial ${serial}%.2f s, concurrent ${par}%.2f s (${serial / par}%.2fx)")
      // Same-directory contention: the second writer must fail fast.
      val d0 = dirs2.head
      java.nio.file.Files.write(
        new java.io.File(d0, ".writer.lock").toPath, "other 0".getBytes)
      val refused =
        try { graft.ext.Similarity.ivfIndexAppend(spark, d0, batch); false }
        catch { case e: IllegalStateException => e.getMessage.contains("single-writer") }
      println(s"[receipt] same-dir second writer refused fast: $refused")
      spark.stop()

    case "rebuild" =>
      // Drift-remedy economics at 100x: the skewed append that trips the
      // sentinel, the O(batch) takedown, and the FULL retrain — the one
      // deliberately corpus-sized op in the lifecycle, paid only when
      // the sentinel says the quantizer no longer fits the data.
      val sfDir = args(1)
      val spark = session()
      val canonical = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val dir = graft.core.Warehouse.scratchFromSeed(canonical, "graft_rebuild_receipt")
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val crowd = e.filter(col("vec_id") === 1)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      val rnd = new scala.util.Random(13)
      val skewed = {
        import spark.implicits._
        (0 until 4000).map(i => (20000000L + i,
          crowd.map(v => v + (rnd.nextDouble() * 2 - 1).toFloat * 0.01f)))
          .toDF("vec_id", "embedding")
      }
      def timed[T](label: String)(f: => T): T = {
        val t0 = System.nanoTime(); val r = f
        println(f"[receipt] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
      }
      timed("skewed append (4000 copies into one cell)") {
        graft.ext.Similarity.ivfIndexAppend(spark, dir, skewed)
      }
      println(s"[receipt] sentinel tripped: ${graft.ext.Similarity.readIvfManifest(dir).rebuildNeeded}")
      timed("takedown of the poisoning batch (tombstone publish)") {
        graft.ext.Similarity.ivfIndexDelete(spark, dir, skewed.select(col("vec_id")))
      }
      timed("full rebuild from surviving content (retrain + rewrite, the corpus-sized remedy)") {
        graft.ext.Similarity.ivfIndexRebuild(spark, dir)
      }
      val m = graft.ext.Similarity.readIvfManifest(dir)
      println(s"[receipt] post-rebuild: rebuild_needed=${m.rebuildNeeded} " +
        s"batches=${m.batches.size} tombstones=${m.tombstoneBatches.size}")
      val anchor = e.filter(col("vec_id") === 0)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      time("probe on the rebuilt index",
        graft.ext.Similarity.probeIvfIndex(spark, dir, anchor,
          nprobe = 4, k = 10, exclude = Some(0L)))
      spark.stop()

    case "filtered" =>
      // Filtered-ANN economics on the persisted index: the widened probe
      // (label predicate inside nprobe/s pruned cells) vs the pre-filter
      // plan (label-pushdown scan of ALL postings, exact) vs the
      // unfiltered probe floor. The widened probe reads ~(nprobe/s)·(n/C)
      // rows of nprobe/s/C of the FILES; the pre-filter plan reads every
      // row group the label survives in — the crossover the cost-based
      // cutover encodes.
      val sfDir = args(1)
      val spark = session()
      val dir = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val anchor = e.filter(col("vec_id") === 0)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      val corpus = e.filter(col("vec_id") =!= 0)
      val n = corpus.count()
      val m = corpus.filter(col("label") === 3).count()
      println(s"[receipt] n=$n m=$m selectivity=${m.toDouble / n}")
      time("filtered probe (widened, in-cell predicate)",
        graft.ext.Similarity.probeIvfIndexFiltered(spark, dir, anchor,
          labelValue = 3, n = n, m = m, nprobe = 4, k = 10, exclude = Some(0L)))
      // m forced under the cutover => the pre-filter plan (full postings
      // scan with label pushdown, exact recall) on the same predicate.
      time("pre-filter exact (label-pushdown full scan)",
        graft.ext.Similarity.probeIvfIndexFiltered(spark, dir, anchor,
          labelValue = 3, n = n, m = 1L, nprobe = 4, k = 10, exclude = Some(0L)))
      time("unfiltered probe (floor)",
        graft.ext.Similarity.probeIvfIndex(spark, dir, anchor,
          nprobe = 4, k = 10, exclude = Some(0L)))
      // Filtered × ADC (r10): same widened probe, candidates scanned as
      // 8-byte codes instead of 256-byte vectors — the three prunes
      // (partition × predicate × column) composed.
      time("filtered ADC probe (widened, codes-only candidates)",
        graft.ext.Similarity.probeIvfPqIndexFiltered(spark, dir, anchor,
          labelValue = 3, n = n, m = m, nprobe = 4, k = 10, exclude = Some(0L)))
      spark.stop()

    case "minhashinc" =>
      // Incremental near-dup economics: probing an ingest batch against
      // the persisted band-postings index (O(batch) hashing + bucket
      // join) vs re-running the full staged near-dup pipeline over the
      // whole corpus — the per-ingest cost a 100 TB pipeline actually
      // pays. The index here is the sub-400 slice, so the "batch" is the
      // remaining corpus — a worst-case-large batch; production batches
      // are far smaller, and probe cost scales with the batch.
      val sfDir = args(1)
      val spark = session()
      val dir = graft.ext.Dedup.ensureMinhashIndex(spark, sfDir)
      val docs = graft.core.Tables(spark, sfDir, "documents")
      docs.queryExecution.toRdd.count()
      time("incremental probe (worst-case batch = rest of corpus)",
        graft.ext.Dedup.probeMinhashIndex(spark, dir,
          docs.filter(col("doc_id") >= 400), docs))
      // Representative ingest: a ~1% batch — probe cost must scale with
      // the batch (its hashing + collisions), not the corpus.
      time("incremental probe (5000-doc ingest batch)",
        graft.ext.Dedup.probeMinhashIndex(spark, dir,
          docs.filter(col("doc_id") >= 400 && col("doc_id") < 5400), docs))
      time("full staged near-dup re-run (whole corpus)",
        SparkEntry.queries("q_minhash_near_dup")(spark, sfDir))
      spark.stop()

    case "minhashingest" =>
      // Streaming near-dup ingest economics at scale: the per-micro-batch
      // cost of committing band postings through foreachBatch (O(batch)
      // hashing + staged partitioned publish — the corpus is never
      // re-hashed), then the probe that must see the streamed docs.
      val sfDir = args(1)
      val spark = session()
      val seed = graft.ext.Dedup.ensureMinhashIndex(spark, sfDir)
      val dir = graft.core.Warehouse.scratchFromSeed(seed, "graft_minhash_ingest_rcpt")
      val docs = graft.core.Tables(spark, sfDir, "documents")
      docs.queryExecution.toRdd.count()
      val docsPath = new java.io.File(sfDir, "documents.parquet").getPath
      val schema = spark.read.parquet(docsPath).schema
      // ScaleGen shifts each replica's doc_id by copy*1e9: the streamed
      // slice is replica 0's tail (4600 docs past the seeded sub-400),
      // the probe batch is replica 1's first 5000 docs — textual copies
      // of replica 0, so the probe MUST surface matches against both the
      // seeded and the streamed postings.
      val t0 = System.nanoTime()
      val q = spark.readStream.schema(schema).parquet(docsPath)
        .filter(col("doc_id") >= 400 && col("doc_id") < 1000000000L)
        .writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, batchId: Long) =>
          if (!b.isEmpty) graft.ext.Dedup.minhashIndexAppend(spark, dir, b,
            ingestKey = Some(s"stream-$batchId"))
        }
        .option("checkpointLocation", graft.core.TempDirs.create("graft_minhash_ingest_rcpt_ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      println(f"[receipt] stream-ingest 4600-doc slice: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(batches=${graft.ext.Dedup.readBatchManifest(dir).size - 1} committed)")
      time("probe after ingest (5000-doc batch vs seed+streamed index)",
        graft.ext.Dedup.probeMinhashIndex(spark, dir,
          docs.filter(col("doc_id") >= 1000000000L && col("doc_id") < 1000005000L), docs))
      spark.stop()

    case "recall" =>
      // Operational recall audit — the metric a production ANN deployment
      // tracks continuously: sample Q anchors, compare the persisted-index
      // probe's top-k against the exact brute-force top-k over the same
      // corpus, report mean recall@k. (The specs pin recall on PLANTED
      // twins; this measures it on the real data distribution at scale,
      // for both the full-precision and the ADC probe.)
      val sfDir = args(1)
      val q = if (args.length > 2) args(2).toInt else 32
      val nprobe = if (args.length > 3) args(3).toInt else 4
      val k = 10
      val spark = session()
      val dir = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val anchors = e.orderBy(xxhash64(col("vec_id"))).limit(q)
        .select(col("vec_id"), col("embedding")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
      def exactTopK(id: Long, emb: Array[Float]): Set[Long] =
        e.filter(col("vec_id") =!= id)
          .select(col("vec_id"),
            graft.functions.CosineSim.sim(typedLit(emb), col("embedding")).as("c"))
          .orderBy(col("c").desc, col("vec_id")).limit(k)
          .collect().map(_.getLong(0)).toSet
      var rIvf = 0.0; var rPq = 0.0
      anchors.foreach { case (id, emb) =>
        val truth = exactTopK(id, emb)
        val ivf = graft.ext.Similarity
          .probeIvfIndex(spark, dir, emb, nprobe = nprobe, k = k, exclude = Some(id))
          .collect().map(_.getLong(0)).toSet
        val pq = graft.ext.Similarity
          .probeIvfPqIndex(spark, dir, emb, nprobe = nprobe, k = k, exclude = Some(id))
          .collect().map(_.getLong(0)).toSet
        rIvf += (ivf & truth).size.toDouble / k
        rPq += (pq & truth).size.toDouble / k
      }
      println(f"[receipt] recall@$k over $q sampled anchors (nprobe=$nprobe): " +
        f"ivf=${rIvf / q}%.3f ivfpq=${rPq / q}%.3f")
      spark.stop()

    case "compact" =>
      // Fragmentation economics: N appends leave N batch_id dirs; a probe
      // opens nprobe cell partitions in EVERY batch. Measure probe cost +
      // file count on the fragmented index, compact, re-measure.
      val sfDir = args(1)
      val nAppends = if (args.length > 2) args(2).toInt else 20
      val spark = session()
      val canonical = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      val scratch = graft.core.TempDirs.create("graft_ivf_compact_receipt")
      graft.core.Warehouse.copyRecursively(
        new java.io.File(canonical), new java.io.File(scratch))
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val anchor = e.filter(col("vec_id") === 0)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      val batchSize = 500
      (0 until nAppends).foreach { i =>
        graft.ext.Similarity.ivfIndexAppend(spark, scratch,
          e.limit(batchSize).select(
            (col("vec_id") + lit(20000000L + i.toLong * 100000L)).as("vec_id"),
            col("embedding"), col("label")))
      }
      def fileCount() = {
        var n = 0
        java.nio.file.Files.walk(new java.io.File(scratch, "postings").toPath)
          .forEach(p => if (p.toString.endsWith(".parquet")) n += 1)
        n
      }
      println(s"[receipt] fragmented: ${fileCount()} part files, " +
        s"${graft.ext.Similarity.readIvfManifest(scratch).batches.size} batches")
      time(s"probe on fragmented index ($nAppends appends)",
        graft.ext.Similarity.probeIvfIndex(spark, scratch, anchor,
          nprobe = 4, k = 10, exclude = Some(0L)))
      val t0 = System.nanoTime()
      graft.ext.Similarity.ivfIndexCompact(spark, scratch)
      println(f"[receipt] compact: ${(System.nanoTime() - t0) / 1e9}%.2f s -> " +
        s"${fileCount()} part files, 1 batch")
      time("probe on compacted index",
        graft.ext.Similarity.probeIvfIndex(spark, scratch, anchor,
          nprobe = 4, k = 10, exclude = Some(0L)))
      graft.core.Warehouse.deleteRecursively(new java.io.File(scratch))
      spark.stop()

    case "pq" =>
      // IVF-PQ economics on the persisted index (one layout, two
      // precision modes): (a) exact parquet column-chunk bytes of the
      // 8-byte `code` column vs the 256-byte `embedding` column across
      // the postings — the IO a column-pruned ADC candidate scan streams
      // vs what a full-precision probe streams over the same cells;
      // (b) probe latency, ADC shortlist + bounded exact re-rank vs
      // full-precision in-cell cosine.
      val sfDir = args(1)
      val spark = session()
      val dir = graft.ext.Similarity.ensureIvfIndex(spark, sfDir)
      import scala.jdk.CollectionConverters._
      val conf = spark.sparkContext.hadoopConfiguration
      val root = new org.apache.hadoop.fs.Path(s"$dir/postings")
      val fs = root.getFileSystem(conf)
      val it = fs.listFiles(root, true)
      var embBytes = 0L; var codeBytes = 0L; var otherBytes = 0L; var nFiles = 0
      while (it.hasNext) {
        val f = it.next().getPath
        if (f.getName.endsWith(".parquet")) {
          nFiles += 1
          val rdr = org.apache.parquet.hadoop.ParquetFileReader.open(
            org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
          rdr.getFooter.getBlocks.asScala.foreach { b =>
            b.getColumns.asScala.foreach { c =>
              val p = c.getPath.toDotString
              if (p.startsWith("embedding")) embBytes += c.getTotalSize
              else if (p.startsWith("code")) codeBytes += c.getTotalSize
              else otherBytes += c.getTotalSize
            }
          }
          rdr.close()
        }
      }
      println(f"[receipt] postings ($nFiles files) column bytes: " +
        f"embedding=${embBytes / 1e6}%.2f MB code=${codeBytes / 1e6}%.2f MB " +
        f"other=${otherBytes / 1e6}%.2f MB emb/code=${embBytes.toDouble / codeBytes}%.1f x")
      val e = graft.core.Tables(spark, sfDir, "embeddings")
      val anchor = e.filter(col("vec_id") === 0)
        .head().getSeq[Float](e.columns.indexOf("embedding")).toArray
      time("ADC probe (code col + bounded re-rank)",
        graft.ext.Similarity.probeIvfPqIndex(spark, dir, anchor,
          nprobe = 4, k = 10, exclude = Some(0L)))
      time("full-precision probe (embedding col)",
        graft.ext.Similarity.probeIvfIndex(spark, dir, anchor,
          nprobe = 4, k = 10, exclude = Some(0L)))
      spark.stop()

    case "blob" =>
      val (nBlobs, mbPer) = (args(1).toInt, args(2).toInt)
      val spark = session()
      import spark.implicits._
      val dir = new java.io.File(s"/tmp/graft_blobs_mb/${nBlobs}x${mbPer}mb")
      val marker = new java.io.File(dir, "_SEEDED")
      if (!marker.exists()) {
        graft.core.Warehouse.deleteRecursively(dir)
        dir.mkdirs()
        val path = dir.getPath
        val bytesPer = mbPer * 1024 * 1024
        spark.range(nBlobs).as[Long].foreachPartition { it: Iterator[Long] =>
          it.foreach { id =>
            val buf = new Array[Byte](bytesPer)
            var j = 0
            while (j < bytesPer) { buf(j) = ((id * 31 + j) % 251).toByte; j += 1 }
            java.nio.file.Files.write(java.nio.file.Paths.get(path, s"$id.bin"), buf)
            ()
          }
        }
        java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
        ()
      }
      time(s"binaryFile digest $nBlobs x $mbPer MiB",
        spark.read.format("binaryFile")
          .option("pathGlobFilter", "*.bin")
          .load(dir.getPath)
          .select(
            regexp_extract(col("path"), "([0-9]+)\\.bin$", 1).cast("long").as("doc_id"),
            col("length").as("n_bytes"),
            md5(col("content")).as("digest")))
      spark.stop()

    case "lpa" =>
      // Label-propagation economics at ScaleGen scale: the data-sized
      // cost is the sparse-edge projection (distinct over lineitem);
      // each of the 3 rounds touches node/edge-sized relations only.
      // Point at a dir carrying lineitem.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "lineitem").queryExecution.toRdd.count()
      time("q_graph_label_prop", SparkEntry.queries("q_graph_label_prop")(spark, sfDir))
      spark.stop()

    case "lpainc" =>
      // Delta-LPA economics — the princ twin: the merge (per round, one
      // broadcast-frontier edge filter + a frontier-neighborhood vote
      // agg) against the full 3-round propagation on the same union
      // graph, which must push EVERY node's label through 3
      // groupBy(dst,lbl) exchanges + argmax windows. Ring graph so the
      // batch's influence ball stays bounded; both wall-clock and
      // shuffle-write records stamped.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "lineitem").queryExecution.toRdd.count()
      val t0 = System.nanoTime()
      graft.ops.Graph.ensureLpaLabelsSeed(spark, sfDir)
      println(f"[receipt] lpa seed (one-time, untimed economics): ${(System.nanoTime() - t0) / 1e9}%.2f s")
      time("q_lpa_incremental (entry, incl. edge projection)",
        SparkEntry.queries("q_lpa_incremental")(spark, sfDir))
      val (base, batchSym) = ringAndBatch(spark)
      val seed = graft.ops.Graph.lpaSeedFrame(
        graft.ops.Graph.lpaRoundLabels(base, 3, eager = true))
        .localCheckpoint(true)
      val meter = new ShuffleMeter(spark)
      meter.measure("delta-LPA merge (2M-node ring, 50-chord batch)",
        graft.ops.Graph.lpaMergeBatch(seed, base, batchSym))
      meter.measure("full 3-round LPA (2M-node ring union)",
        graft.ops.Graph.lpaRoundLabels(base.unionByName(batchSym), 3).last)
      meter.close()
      spark.stop()

    case "phash" =>
      // Staged perceptual-hash dedup at ScaleGen scale: the 100x
      // replicas make the corpus ~99% exact signature copies — the
      // collapse-then-band stage must ride the ~5.5k DISTINCT
      // signatures while the doc-level output legitimately carries
      // every replica pair. Point at a dir carrying documents.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "documents").queryExecution.toRdd.count()
      time("q_mm_phash_dedup", SparkEntry.queries("q_mm_phash_dedup")(spark, sfDir))
      spark.stop()

    case "linkage" =>
      // Blocked fuzzy-join economics on n synthetic distinct names
      // (fixture names under ScaleGen replicate, which would inflate
      // block sizes artificially): blocks stay <=100 wide by key
      // construction, so candidate pairs — and the levenshtein work —
      // grow linearly with n while the all-pairs alternative is n^2.
      // args: n.
      val n = args(1).toLong
      val spark = session()
      val dir = s"${graft.core.TempDirs.create("graft_linkage_rcpt")}"
      // Single FILE (not a dir) so the streaming leg's
      // pathGlobFilter=supplier.parquet file stream sees it too — the
      // same layout contract the driver fixtures have. Small row groups
      // keep the one file SPLITTABLE (a single-row-group file is one
      // scan task no matter what maxPartitionBytes says — first cut of
      // this receipt measured 70 s single-threaded vs 4 s parallel).
      spark.range(n).selectExpr("id AS s_suppkey",
          "concat('Supplier#', lpad(cast(id as string), 9, '0')) AS s_name")
        .coalesce(1).write.option("parquet.block.size", (256 * 1024).toString)
        .mode("overwrite").parquet(s"$dir/_tmp_supplier")
      val part = new java.io.File(s"$dir/_tmp_supplier").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        new java.io.File(s"$dir/supplier.parquet").toPath)
      time(s"q_fuzzy_join ($n names)",
        SparkEntry.queries("q_fuzzy_join")(spark, dir))
      time(s"s_linkage_ingest ($n names)",
        SparkEntry.queries("s_linkage_ingest")(spark, dir))
      spark.stop()

    case "contrastive" =>
      // Training-pair construction at ScaleGen scale: the sign random
      // projection is row-local (one scan, zero row shuffles besides
      // the oracle sort) so must track the corpus linearly; negative
      // sampling shares q_knn_join's broadcast + k-bounded-exchange
      // shape with an integer mixer instead of the cosine. Point at a
      // dir carrying documents + embeddings.
      val sfDir = args(1)
      val spark = session()
      Seq("documents", "embeddings").foreach(t =>
        graft.core.Tables(spark, sfDir, t).queryExecution.toRdd.count())
      time("q_embed_project", SparkEntry.queries("q_embed_project")(spark, sfDir))
      time("q_negative_sample", SparkEntry.queries("q_negative_sample")(spark, sfDir))
      spark.stop()

    case "knn" =>
      // kNN-join economics at ScaleGen scale: one corpus scan with the
      // codegen cosine against the broadcast query batch, k-bounded
      // partial heaps into the one exchange. Point at a dir carrying
      // embeddings (100x: cost must track the corpus linearly while the
      // exchange stays at |batch|*k per map partition).
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "embeddings").queryExecution.toRdd.count()
      time("q_knn_join", SparkEntry.queries("q_knn_join")(spark, sfDir))
      // MMR's data-sized leg is the same one-scan shortlist cut; the
      // greedy folds over <=20x20 rounded sims on the driver.
      time("q_mmr_rerank", SparkEntry.queries("q_mmr_rerank")(spark, sfDir))
      spark.stop()

    case "triangles" =>
      // Triangle-count economics on planted graphs: the circulant ring
      // C_n(1,2,3,4) (each node wired to its next 4 neighbors) has
      // degree 8 everywhere, so exactly 28n wedges and C(4,2)*n = 6n
      // triangles (every pair 1<=a<b<=4 closes since b-a<=3) — wedge
      // work grows linearly, so doubling n should double the runtime,
      // and the counts receipt-check themselves. args: n.
      val n = args(1).toLong
      val spark = session()
      val base = spark.range(n)
      val edges = (1 to 4).map(d =>
          base.select(col("id").as("a"), pmod(col("id") + d, lit(n)).as("b")))
        .reduce(_ unionByName _)
        .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
        .distinct().persist()
      edges.queryExecution.toRdd.count()
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val r = graft.ops.Graph.triangleStats(edges).head()
        println(f"[receipt] triangles ring-$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s " +
          s"(nodes=${r.getLong(0)} edges=${r.getLong(1)} wedges=${r.getLong(2)} " +
          s"triangles=${r.getLong(3)} expected=${6 * n})")
      }
      spark.stop()

    case "drift" =>
      // PSI drift monitor at ScaleGen scale: ONE conditional-agg scan of
      // events folds both periods' bin counts; everything after the
      // groupBy is |types|*|bins|-sized. Point at a dir carrying events.
      val sfDir = args(1)
      val spark = session()
      graft.core.Tables(spark, sfDir, "events").queryExecution.toRdd.count()
      time("q_dq_drift", SparkEntry.queries("q_dq_drift")(spark, sfDir))
      time("s_drift_monitor", SparkEntry.queries("s_drift_monitor")(spark, sfDir))
      spark.stop()

    case other => sys.error(s"unknown receipt: $other")
  }
}
