package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Registry-wide golden-plan guard: every registered query's static-plan
  * fingerprint (exchange counts, join strategies, TakeOrderedAndProject,
  * partial aggregation — see PlanGolden) must match the checked-in
  * golden. PlanSpec pins hand-chosen 100 TB properties entry by entry;
  * this spec catches silent plan regressions on the rest of the registry
  * wholesale — a new entry, a dropped broadcast, or an extra shuffle
  * anywhere shows up as a per-entry diff.
  *
  * Intentional plan changes are reviewed by regenerating:
  *   GRAFT_REGEN_GOLDEN=1 sbt 'testOnly graft.PlanGoldenSpec'
  * and reading the git diff of plan_golden.tsv.
  */
class PlanGoldenSpec extends AnyFunSuite with SparkTest {

  private val goldenPath = Paths.get("src/test/resources/plan_golden.tsv")

  test("every registry entry's plan fingerprint matches the golden file") {
    val current = PlanGolden.renderAll(spark, sf)
    if (sys.env.get("GRAFT_REGEN_GOLDEN").contains("1")) {
      Files.createDirectories(goldenPath.getParent)
      val body = current.map { case (n, fp) => s"$n\t$fp" }.mkString("", "\n", "\n")
      Files.write(goldenPath, body.getBytes(StandardCharsets.UTF_8))
      info(s"regenerated ${goldenPath} with ${current.size} entries")
    } else {
      assert(Files.exists(goldenPath),
        s"golden file missing — regenerate with GRAFT_REGEN_GOLDEN=1 sbt 'testOnly graft.PlanGoldenSpec'")
      val golden = Files.readAllLines(goldenPath, StandardCharsets.UTF_8).asScala
        .filter(_.nonEmpty).map { line =>
          val Array(n, fp) = line.split("\t", 2)
          n -> fp
        }.toMap
      val currentMap = current.toMap
      val missing = golden.keySet -- currentMap.keySet
      val added = currentMap.keySet -- golden.keySet
      val changed = current.collect {
        case (n, fp) if golden.contains(n) && golden(n) != fp =>
          s"$n\n  golden:  ${golden(n)}\n  current: $fp"
      }
      val problems =
        (if (missing.nonEmpty) Seq(s"entries removed from registry: ${missing.toSeq.sorted.mkString(", ")}") else Nil) ++
        (if (added.nonEmpty) Seq(s"entries missing from golden (regenerate): ${added.toSeq.sorted.mkString(", ")}") else Nil) ++
        changed
      assert(problems.isEmpty, s"\n${problems.mkString("\n")}\n")
    }
  }
}
