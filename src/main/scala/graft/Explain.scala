package graft
import org.apache.spark.sql.SparkSession
/** Local plan-inspection harness: print the executed plan of selected
  * queries (not part of the driver contract).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq("q_join_full_merge")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "4m") // fixtures are single small files; split for scan parallelism
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { n =>
      println(s"===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      // Execute to finalize the AQE plan, but never materialize the full
      // result on the driver — this utility must be safe to point at any
      // query at any scale factor.
      df.queryExecution.toRdd.count()
      println(df.queryExecution.executedPlan.toString.take(8000))
    }
    spark.stop()
  }
}
