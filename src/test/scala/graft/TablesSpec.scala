package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the resolved-table catalog: resolution is cached per
  * (session, dir, table) — the same immutable plan object comes back —
  * while distinct dirs resolve independently and serve their own data.
  */
class TablesSpec extends AnyFunSuite with SparkTest {

  test("repeat resolution returns the cached plan; distinct dirs stay isolated") {
    import spark.implicits._
    val a = graft.core.Tables(spark, sf, "nation")
    val b = graft.core.Tables(spark, sf, "nation")
    assert(a eq b, "same (session, dir, table) must hit the catalog")
    val dir = graft.core.TempDirs.create("graft_tables_spec")
    Seq((999L, "XX")).toDF("n_nationkey", "n_name")
      .write.mode("overwrite").parquet(s"$dir/nation.parquet")
    val c = graft.core.Tables(spark, dir, "nation")
    assert(!(c eq a), "a different dir must resolve its own entry")
    assert(c.count() == 1 && a.count() > 1)
    assert(c eq graft.core.Tables(spark, dir, "nation"))
  }
}
