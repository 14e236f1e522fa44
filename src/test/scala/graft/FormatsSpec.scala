package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The part of q_compact_files the DuckDB oracle cannot see: compaction
  * must actually reduce the file count (content equality alone would pass
  * for a no-op copy).
  */
class FormatsSpec extends AnyFunSuite with SparkTest {

  private def partFiles(dir: String): Int =
    new java.io.File(dir).listFiles().count(f => f.getName.startsWith("part-"))

  test("compactTo collapses a fragmented directory to the size-targeted file count") {
    val frag = Files.createTempDirectory("graft_frag_spec").toString
    val out = Files.createTempDirectory("graft_compact_spec").toString
    graft.core.Tables(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
      .repartition(64)
      .write.mode("overwrite").parquet(frag)
    assert(partFiles(frag) == 64)
    val back = graft.ops.Formats.compactTo(spark, frag, out, targetFileBytes = 128L * 1024 * 1024)
    // The whole fixture is far below one 128 MB target file.
    assert(partFiles(out) == 1, s"expected 1 compacted file, got ${partFiles(out)}")
    assert(back.count() == graft.core.Tables(spark, sf, "events").count())
  }
}
