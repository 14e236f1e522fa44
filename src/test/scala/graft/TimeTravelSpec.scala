package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

/** Versioned-snapshot store pins: manifest-gated as-of reads resolve
  * only committed versions (a crashed writer's half-written version is
  * invisible), committed versions are immutable across later commits,
  * and the manifest commit is atomic-replace.
  */
class TimeTravelSpec extends AnyFunSuite with SparkTest {

  test("as-of resolves only committed versions; orphan version dirs are invisible") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_tt_spec")
    Cdc.commitVersion(dir, 1, Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    assert(Cdc.committedVersions(dir) == Seq(1))
    // A crashed writer: version directory present, manifest never
    // updated. The as-of read must refuse it.
    Seq((1L, "half")).toDF("id", "v").write
      .parquet(new java.io.File(dir, "version=2").getPath)
    assert(Cdc.committedVersions(dir) == Seq(1))
    val e = intercept[IllegalArgumentException] { Cdc.readAsOf(spark, dir, 2) }
    assert(e.getMessage.contains("uncommitted"))
    // And a version that never existed at all.
    intercept[IllegalArgumentException] { Cdc.readAsOf(spark, dir, 9) }
  }

  test("committed versions stay byte-identical across later commits") {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_tt_immutable")
    Cdc.commitVersion(dir, 1, Seq((1L, 10.0), (2L, 20.0)).toDF("id", "v"))
    val v1Before = Cdc.readAsOf(spark, dir, 1).collect().map(_.toString).sorted.toSeq
    Cdc.commitVersion(dir, 2, Seq((1L, 11.0), (2L, 20.0), (3L, 30.0)).toDF("id", "v"))
    Cdc.commitVersion(dir, 3, Seq((1L, 12.0)).toDF("id", "v"))
    assert(Cdc.committedVersions(dir) == Seq(1, 2, 3))
    val v1After = Cdc.readAsOf(spark, dir, 1).collect().map(_.toString).sorted.toSeq
    assert(v1After == v1Before, "an earlier version's content changed after later commits")
    assert(Cdc.readAsOf(spark, dir, 2).count() == 3)
    assert(Cdc.readAsOf(spark, dir, 3).count() == 1)
  }

  test("the registry diff entry emits exactly the added + updated entities") {
    val out = SparkEntry.queries("q_time_travel")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.nonEmpty)
    val changes = out.map(_.getString(1)).toSet
    assert(changes.subsetOf(Set("added", "updated")))
    // Added rows carry no v2 state; updated rows carry both versions and
    // genuinely differ on the latest event id.
    out.foreach { r =>
      if (r.getString(1) == "added") assert(r.isNullAt(2), r.toString)
      else {
        assert(!r.isNullAt(2) && !r.isNullAt(3))
        assert(r.getLong(2) != r.getLong(3), r.toString)
      }
    }
  }
}
