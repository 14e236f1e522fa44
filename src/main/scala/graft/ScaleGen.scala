package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Local scale-up harness (not part of the driver contract): replicate the
  * sf0.1 fixtures N× with shifted keys into a temp dir, so operators can
  * be profiled at ~sf2+ without touching the read-only testdata.
  * Usage: runMain graft.ScaleGen <srcSfDir> <outDir> <factor> [table,...]
  * The optional 4th arg restricts generation to a table subset (e.g.
  * `documents` for a 100x dedup-family receipt that skips the 60M-row
  * lineitem replica).
  */
object ScaleGen {
  def main(args: Array[String]): Unit = {
    val (src, out, fStr) = (args(0), args(1), args(2))
    val factor = fStr.toInt
    val onlyTables: Option[Set[String]] =
      if (args.length > 3) Some(args(3).split(",").map(_.trim).toSet) else None
    def wanted(name: String): Boolean = onlyTables.forall(_.contains(name))
    // Session conf lives in core.Harness (one certified base for all
    // mains). ScaleGen's deltas: no 4m split cap (it writes replicas;
    // source-read split width is irrelevant), no streaming state store /
    // codegen sizing.
    val spark = graft.core.Harness.session("32",
      splitSmallFiles = false, certifiedStreaming = false, codegenCache = None)

    def replicate(name: String, keyCols: Seq[String]): Unit = if (wanted(name)) {
      val df = core.Tables(spark, src, name)
      val copies = spark.range(factor).withColumnRenamed("id", "__copy")
      val shifted0 = keyCols.foldLeft(df.crossJoin(copies)) { (d, k) =>
        d.withColumn(k, col(k) + col("__copy") * lit(1000000000L))
      }.drop("__copy")
      // Tables() reads events.ts as raw TIMESTAMP(NANOS) int64; write the
      // replica in the same physical shape.
      val shifted =
        if (name == "events") shifted0.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
        else shifted0
      if (name == "events") {
        // The streaming sources glob `events.parquet` as a single FILE
        // (the driver-fixture shape); a parquet DIRECTORY reads 0 rows
        // there. Write one part and move it into place so s_* entries can
        // be profiled at scale too.
        val tmp = s"$out/_events_tmp"
        shifted.coalesce(1).write.mode("overwrite").parquet(tmp)
        val fs = org.apache.hadoop.fs.FileSystem.get(
          new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.endsWith(".parquet"))
          .getOrElse(sys.error(s"no part file under $tmp"))
        val dest = new org.apache.hadoop.fs.Path(s"$out/$name.parquet")
        fs.delete(dest, true)
        fs.rename(part, dest)
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      } else {
        shifted.write.mode("overwrite").parquet(s"$out/$name.parquet")
      }
      println(s"[scalegen] $name x$factor -> ${shifted.count()} rows")
    }
    def copy(name: String): Unit = if (wanted(name))
      core.Tables(spark, src, name).write.mode("overwrite")
        .parquet(s"$out/$name.parquet")

    Seq("region", "nation", "customer", "supplier", "part").foreach(copy)
    replicate("orders", Seq("o_orderkey"))
    replicate("lineitem", Seq("l_orderkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"))
    replicate("embeddings", Seq("vec_id"))
    spark.stop()
  }
}
