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
    // file:-qualified URI: the byte sizing must go through the Hadoop
    // FileSystem API (a java.io.File("file:/...") length probe returns 0
    // and the sizing silently degrades), proving HDFS/S3 portability.
    val back = graft.ops.Formats.compactTo(spark, s"file:$frag", out, targetFileBytes = 128L * 1024 * 1024)
    // The whole fixture is far below one 128 MB target file.
    assert(partFiles(out) == 1, s"expected 1 compacted file, got ${partFiles(out)}")
    assert(back.count() == graft.core.Tables(spark, sf, "events").count())
  }

  /** The part of q_retention_prune the oracle cannot see: expiry must be a
    * pure directory delete — surviving partition files byte-for-byte
    * untouched (a filter-and-rewrite implementation would pass the content
    * oracle while re-writing the whole table at 100 TB).
    */
  test("expirePartitions deletes expired dirs and never rewrites survivors") {
    import org.apache.spark.sql.functions.date_format
    val out = Files.createTempDirectory("graft_retain_spec").toString
    graft.core.Tables(spark, sf, "events")
      .withColumn("dt", date_format(col("ts"), "yyyyMMdd"))
      .select(col("event_id"), col("dt"))
      .write.mode("overwrite").partitionBy("dt").parquet(out)
    def files(): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(out)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> (f.length(), f.lastModified())).toMap
    }
    val before = files()
    val cutoff = "20240115"
    // file:-qualified URI, same reason as the compactTo test: the expiry
    // must run through the Hadoop FileSystem API, not java.io.File.
    graft.ops.Formats.expirePartitions(spark, s"file:$out", cutoff)
    val after = files()
    val expired = before.keySet.filter(_.contains("dt=2024010")) // 01..09 all < cutoff
    assert(expired.nonEmpty && (after.keySet & expired).isEmpty, "expired dirs must vanish")
    // Every surviving file is the SAME file: same path, size, mtime.
    assert(after == before.filter { case (p, _) => !p.split("/").exists(seg =>
      seg.startsWith("dt=") && seg.stripPrefix("dt=") < cutoff) })
  }

  /** The part of q_zorder_cluster the identity oracle cannot see: the
    * z-ordered layout must actually enable data skipping on BOTH
    * dimensions. Proxy for parquet row-group stats pruning: the number of
    * FILES whose [min, max] value range intersects a value-band predicate
    * — every skipped file is a scan task a 100 TB reader never schedules.
    * A user_id-sorted layout spreads every value range across all files
    * (zero skipping on value); the z-order interleave must beat it.
    */
  test("z-order layout skips files on the second dimension where single-key sort cannot") {
    // Deterministic 256x256 grid so the skipping arithmetic is exact: with
    // 16 range partitions over uniform z, each file is (nearly) a fixed
    // (a7 b7 a6 b6) bit prefix; the band b < 32 (b7=b6=b5=0) lives only in
    // files with b7=0 AND b6=0 — 4 of 16 (+ boundary-straddle slack from
    // the range partitioner's sampling). A user_id-sorted layout spreads
    // every b value across all 16 files: zero skipping on the second key.
    import spark.implicits._
    val grid = (0 until 65536)
      .map(i => (i.toLong, (i / 256).toLong, (i % 256) * 2.0))
      .toDF("event_id", "user_id", "value")
    val nFiles = 16

    val zDir = Files.createTempDirectory("graft_z_spec").toString
    graft.ops.Formats.zorderWrite(grid, zDir, nFiles)

    val uDir = Files.createTempDirectory("graft_u_spec").toString
    grid.repartitionByRange(nFiles, col("user_id"))
      .sortWithinPartitions("user_id")
      .write.mode("overwrite").parquet(uDir)

    // Files whose min value stat overlaps the band value < 64 — the files
    // a stats-pruning reader must still open; every other file is a scan
    // task a 100 TB reader never schedules.
    def unskippable(dir: String): Int =
      new java.io.File(dir).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
        .count { f =>
          spark.read.parquet(f.getAbsolutePath)
            .agg(min(col("value"))).head().getDouble(0) < 64.0
        }

    val zHit = unskippable(zDir)
    val uHit = unskippable(uDir)
    assert(uHit == nFiles, s"user-sorted layout should be unskippable on value (got $uHit)")
    assert(zHit <= nFiles / 2,
      s"z-order should confine value<64 to a minority of files (hit $zHit of $nFiles)")
  }
}
