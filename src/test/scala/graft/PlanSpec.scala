package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions — the properties that decide 100 TB behavior,
  * pinned so a refactor cannot silently regress them:
  * filter/projection pushdown into the parquet scan, broadcast of dim
  * tables, map-side partial aggregation, and top-k via
  * TakeOrderedAndProject instead of a global sort.
  */
class PlanSpec extends AnyFunSuite with SparkTest {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q_filter_basic pushes predicates into the parquet scan") {
    val p = plan("q_filter_basic")
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("In(o_orderstatus"), p)
  }

  test("q_scan_project prunes columns at the scan (ReadSchema only lists selected)") {
    val p = plan("q_scan_project")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_orderkey") && !readSchema.contains("l_comment")
      && !readSchema.contains("l_shipdate"), readSchema)
  }

  test("q_join_broadcast broadcasts both dim tables") {
    val p = plan("q_join_broadcast")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
  }

  test("q_agg_group plans map-side partial aggregation") {
    val p = plan("q_agg_group")
    assert(p.contains("partial_sum") || p.contains("HashAggregate(keys"), p)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_sort_limit plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q_sort_limit")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q_udaf_stats keeps partial aggregation with a custom Aggregator") {
    val p = plan("q_udaf_stats")
    assert("HashAggregate|ObjectHashAggregate|SortAggregate".r.findAllIn(p).size >= 2, p)
  }

  test("q_bucketed_join joins co-located buckets with no join-side Exchange") {
    val df = SparkEntry.queries("q_bucketed_join")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // The aggregation after the join may shuffle; the join inputs must not.
    val joinSection = p.split("HashAggregate").last
    assert(!joinSection.contains("Exchange hashpartitioning"), p)
  }

  test("whole-stage codegen covers the scan->filter->project spine") {
    // AQE finalizes the plan only on execution; codegen stages show as
    // WholeStageCodegen nodes (or "*(n)" prefixes) in the final plan.
    val df = SparkEntry.queries("q_filter_basic")(spark, sf)
    df.collect() // count() would plan a separate query execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p)
  }
}
