package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.StagedSwap

/** Crash-safety of the staged-rename rebuild protocol: every window —
  * crashed build, crashed swap, crashed GC — leaves the live layout
  * recoverable, and the manifest rename is the single commit point.
  */
class StagedSwapSpec extends AnyFunSuite {

  private def mkLayout(dir: java.io.File, subs: Seq[String], tag: String): Unit = {
    subs.foreach { s =>
      val d = new java.io.File(dir, s); d.mkdirs()
      java.nio.file.Files.write(new java.io.File(d, "data").toPath, s"$tag/$s".getBytes)
    }
    java.nio.file.Files.write(new java.io.File(dir, "manifest.json").toPath,
      s"""{"layout":"$tag"}""".getBytes)
  }

  private def readAll(dir: java.io.File, subs: Seq[String]): Seq[String] =
    subs.map(s => new String(java.nio.file.Files.readAllBytes(
      new java.io.File(new java.io.File(dir, s), "data").toPath))) :+
      new String(java.nio.file.Files.readAllBytes(
        new java.io.File(dir, "manifest.json").toPath))

  private val Subs = Seq("postings", "centroids")

  private def freshLive(name: String): java.io.File = {
    val dir = new java.io.File(graft.core.TempDirs.create(name))
    mkLayout(dir, Subs, "old")
    dir
  }

  test("a completed swap replaces every layout dir and the manifest, and leaves no debris") {
    val dir = freshLive("graft_swap_ok")
    StagedSwap.swapInPlace(dir.getPath, Subs)(stage => mkLayout(new java.io.File(stage), Subs, "new"))
    assert(readAll(dir, Subs) == Seq("new/postings", "new/centroids", """{"layout":"new"}"""))
    assert(dir.listFiles().forall(f => !f.getName.startsWith(".rebuild")),
      "swap left staging/aside debris behind")
  }

  test("a build that crashes (or throws) before completion leaves the live layout untouched") {
    val dir = freshLive("graft_swap_crashbuild")
    intercept[RuntimeException] {
      StagedSwap.swapInPlace(dir.getPath, Subs) { stage =>
        mkLayout(new java.io.File(stage), Seq("postings"), "new") // incomplete
        throw new RuntimeException("executor lost")
      }
    }
    assert(readAll(dir, Subs) == Seq("old/postings", "old/centroids", """{"layout":"old"}"""))
    // An incomplete staged layout (no manifest / missing dirs) must also
    // refuse to swap.
    intercept[IllegalArgumentException] {
      StagedSwap.swapInPlace(dir.getPath, Subs)(stage =>
        mkLayout(new java.io.File(stage), Seq("postings"), "new"))
    }
    assert(readAll(dir, Subs) == Seq("old/postings", "old/centroids", """{"layout":"old"}"""))
    // recover (run by the next mutation) GCs the orphan staging dirs.
    StagedSwap.recover(dir.getPath, Subs)
    assert(dir.listFiles().forall(f => !f.getName.startsWith(".rebuild")))
  }

  test("a crash MID-SWAP is rolled back by recover: old manifest, old layout, no loss") {
    val dir = freshLive("graft_swap_midswap")
    // Reproduce the exact on-disk state of a crash between the two
    // renames of the first sub-dir: live postings sits in the aside dir,
    // the staged layout (with its manifest — pre-commit) is in place.
    val tag = "deadbeef"
    val stage = new java.io.File(dir, s".rebuild.$tag")
    mkLayout(stage, Subs, "new")
    val aside = new java.io.File(dir, s".rebuild-old.$tag"); aside.mkdirs()
    java.nio.file.Files.move(new java.io.File(dir, "postings").toPath,
      new java.io.File(aside, "postings").toPath)
    java.nio.file.Files.move(new java.io.File(stage, "postings").toPath,
      new java.io.File(dir, "postings").toPath)
    StagedSwap.recover(dir.getPath, Subs)
    assert(readAll(dir, Subs) == Seq("old/postings", "old/centroids", """{"layout":"old"}"""),
      "mid-swap recovery did not restore the committed (old) layout")
    assert(dir.listFiles().forall(f => !f.getName.startsWith(".rebuild")))
  }

  test("a crash AFTER the manifest commit keeps the new layout; recover only GCs") {
    val dir = freshLive("graft_swap_postcommit")
    // State after the commit rename but before GC: new layout + new
    // manifest live; old dirs in aside; stage WITHOUT its manifest.
    val tag = "cafebabe"
    val stage = new java.io.File(dir, s".rebuild.$tag")
    mkLayout(stage, Subs, "new")
    val aside = new java.io.File(dir, s".rebuild-old.$tag"); aside.mkdirs()
    Subs.foreach { s =>
      java.nio.file.Files.move(new java.io.File(dir, s).toPath,
        new java.io.File(aside, s).toPath)
      java.nio.file.Files.move(new java.io.File(stage, s).toPath,
        new java.io.File(dir, s).toPath)
    }
    java.nio.file.Files.move(new java.io.File(stage, "manifest.json").toPath,
      new java.io.File(dir, "manifest.json").toPath,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    StagedSwap.recover(dir.getPath, Subs)
    assert(readAll(dir, Subs) == Seq("new/postings", "new/centroids", """{"layout":"new"}"""),
      "post-commit recovery rolled back a committed rebuild")
    assert(dir.listFiles().forall(f => !f.getName.startsWith(".rebuild")))
  }
}
