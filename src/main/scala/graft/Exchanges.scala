package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Shuffle-size receipt tool: run queries with AQE OFF (so the static
  * plan's exchanges are visible and not coalesced away) and print every
  * ShuffleExchangeExec's written data size — the number that decides
  * whether an operator's exchanges carry thin keys (digests, ids, bands)
  * or the full payload at 100 TB. Usage:
  *
  *   runMain graft.Exchanges <sfDir> q_a,q_b
  */
object Exchanges {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    // Session conf lives in core.Harness (one certified base for all
    // mains). Exchanges' deltas: AQE off (static exchanges must stay
    // visible), no streaming state store / codegen sizing (plan
    // inspection over a handful of queries).
    val spark = graft.core.Harness.session("32",
      certifiedStreaming = false, codegenCache = None, staticPlans = true)
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.toRdd.count()
      def walk(p: SparkPlan): Seq[SparkPlan] =
        p +: (p.children ++ p.subqueries).flatMap(walk)
      val exs = walk(df.queryExecution.executedPlan)
        .collect { case e: ShuffleExchangeExec => e }
      println(s"[exchanges] $name: ${exs.size} shuffles")
      exs.foreach { e =>
        val mb = e.metrics.get("dataSize").map(_.value / 1e6).getOrElse(-1.0)
        println(f"[exchanges]   $mb%.2f MB  ${e.outputPartitioning}")
      }
    }
    spark.stop()
  }
}
