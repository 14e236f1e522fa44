package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide smoke: every registered query runs on sf0.001 and
  * returns rows; every oracle key points at a registered query; the
  * flagship entry produces rows. The value-level correctness gate is the
  * driver's DuckDB compare (scripts/check.py locally).
  */
class QueriesSmokeSpec extends AnyFunSuite with SparkTest {

  test("oracleSql keys are a subset of queries") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.foreach { case (name, fn) =>
    test(s"$name returns rows on sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned 0 rows")
    }
  }
}
