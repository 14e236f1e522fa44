package graft.core

import org.apache.spark.sql.SparkSession

/** Warehouse-table hygiene for managed-table queries (bucketed layouts,
  * snapshot overwrites): the warehouse directory outlives the in-memory
  * catalog across JVM runs, and a stale location with no catalog entry
  * fails table creation — drop both the entry and the directory before
  * (re)creating.
  */
object Warehouse {

  def reset(spark: SparkSession, table: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    clearLocation(spark, table)
  }

  /** Remove a stale on-disk location that has no catalog entry. */
  def clearLocation(spark: SparkSession, table: String): Unit = {
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir"))
    deleteRecursively(new java.io.File(
      if (wh.getScheme == null) wh.toString else wh.getPath, table))
  }

  /** Clone an immutable marker-gated seed template into a fresh scratch
    * dir for one run's mutations, dropping the `_SEEDED` marker so the
    * copy is never mistaken for a template. No Spark jobs. The one
    * shared definition of the template-scratch idiom every index family
    * and receipt uses.
    *
    * HARDLINKS, not byte copies (r13 bench reclaim): every index
    * mutation in the codebase writes NEW files — appends and deletes
    * stage fresh directories and atomically rename them, compaction and
    * StagedSwap rebuilds unlink old directories (safe: the template
    * keeps its own link), and manifest commits replace the directory
    * entry via tmp + ATOMIC_MOVE without touching the linked inode.
    * Nothing ever modifies a parquet or manifest file in place, so the
    * template cannot be corrupted through a link. Falls back to a byte
    * copy per file if the filesystem refuses links.
    */
  def scratchFromSeed(seedDir: String, prefix: String): String = {
    val dir = TempDirs.create(prefix)
    linkRecursively(new java.io.File(seedDir), new java.io.File(dir))
    new java.io.File(dir, "_SEEDED").delete()
    dir
  }

  /** Recursive hardlink tree (copy fallback per file). */
  def linkRecursively(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      val children = src.listFiles()
      if (children != null)
        children.foreach(c => linkRecursively(c, new java.io.File(dst, c.getName)))
    } else {
      try {
        java.nio.file.Files.createLink(dst.toPath, src.toPath)
        ()
      } catch {
        case _: UnsupportedOperationException | _: java.io.IOException =>
          java.nio.file.Files.copy(src.toPath, dst.toPath,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          ()
      }
    }
  }

  /** Marker-gated DERIVED seed: a base seed template plus a fixture-
    * deterministic mutation sequence, applied ONCE and cached as a
    * sibling template (`<base>-<suffix>`) — the same disclosed untimed
    * seed economics as the base. Lifecycle entries whose operator under
    * test comes AFTER a deterministic setup mutation (e.g. "append then
    * COMPACT", "poison+takedown then REBUILD") copy this derived
    * template per run, so the timed region is the operator itself, not
    * the setup replayed identically every run. The base tag already
    * carries fixture mtime+length, so staleness invalidates derived
    * templates exactly as it invalidates bases.
    */
  def ensureDerivedSeed(baseSeedDir: String, suffix: String)(build: String => Unit): String = {
    val dir = new java.io.File(baseSeedDir + "-" + suffix)
    val marker = new java.io.File(dir, "_SEEDED")
    if (!marker.exists()) {
      deleteRecursively(dir)
      copyRecursively(new java.io.File(baseSeedDir), dir)
      new java.io.File(dir, "_SEEDED").delete()
      build(dir.getPath)
      java.nio.file.Files.write(marker.toPath, Array.emptyByteArray)
      ()
    }
    dir.getPath
  }

  /** Shared recursive delete (also used by the Derby seed dir). */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }

  /** Recursive file-tree copy (used to clone seeded index layouts into
    * scratch dirs so experiments never mutate a marker-gated canonical
    * directory).
    */
  def copyRecursively(src: java.io.File, dst: java.io.File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      val children = src.listFiles()
      if (children != null)
        children.foreach(c => copyRecursively(c, new java.io.File(dst, c.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      ()
    }
  }
}
