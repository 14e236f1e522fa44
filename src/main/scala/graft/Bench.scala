package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m") // fixtures are single small files; split for scan parallelism
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warm-up: read every table once so footer caching, reader
    // JIT, and codegen infrastructure aren't billed to the first measured
    // query.
    graft.core.Tables.names.foreach { t =>
      try graft.core.Tables(spark, sfDir, t).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // toRdd.count() consumes the query's own physical plan, forcing
      // every output column to materialize — df.count() would let the
      // optimizer prune the projections being measured.
      try { fn(spark, sfDir).queryExecution.toRdd.count() }
      catch { case _: Throwable => -1L }
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench] $name%-24s $dt%8.2f s")
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
