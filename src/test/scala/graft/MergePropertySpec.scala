package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.cdc.Cdc

/** Property-based invariants of the CDC merge (SURVEY.md §5.3): key
  * algebra, idempotence, and the compaction-distributes-over-time-split
  * law that makes the daily snapshot restore correct for ANY cutoff.
  * Generators are driven directly (the scalatest↔scalacheck bridge is not
  * in the offline cache) with fixed seeds for reproducibility.
  */
case class Ev(key: Long, ts: Long, id: Long, v: String)

class MergePropertySpec extends AnyFunSuite with SparkTest {
  import spark.implicits._

  private val genEvents: Gen[List[Ev]] = for {
    n <- Gen.choose(0, 30)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 5L)
      ts <- Gen.choose(0L, 20L)
      v <- Gen.alphaStr.map(_.take(4))
    } yield (key, ts, v))
  } yield evs.zipWithIndex.map { case ((k, t, v), i) => Ev(k, t, i.toLong, v) }

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))

  private def latest(evs: List[Ev]) =
    Cdc.latestState(evs.toDF(), "key", "ts", "id")

  private def asMap(rows: Array[org.apache.spark.sql.Row]): Map[Long, (Long, Long, String)] =
    rows.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap

  test("merged keys = keys(snapshot) ∪ keys(delta)") {
    (1L to 6L).foreach { seed =>
      val a = sample(genEvents, seed)
      val b = sample(genEvents, seed + 100)
      val merged = Cdc.mergeSnapshot(latest(a), latest(b), "key", Seq("ts", "id", "v"))
      val got = merged.select("key").as[Long].collect().toSet
      assert(got == (a.map(_.key).toSet ++ b.map(_.key).toSet), s"seed $seed")
    }
  }

  test("merge with empty delta is identity") {
    (1L to 4L).foreach { seed =>
      val m = latest(sample(genEvents, seed))
      val merged = Cdc.mergeSnapshot(m, m.limit(0), "key", Seq("ts", "id", "v"))
      assert(asMap(merged.collect()) == asMap(m.select("key", "ts", "id", "v").collect()),
        s"seed $seed")
    }
  }

  test("snapshot restore is cutoff-invariant: merge(latest(<c), latest(>=c)) == latest(all)") {
    (1L to 6L).foreach { seed =>
      val evs = sample(genEvents, seed)
      val cutoff = sample(Gen.choose(0L, 21L), seed + 500)
      val before = evs.filter(_.ts < cutoff)
      val after = evs.filter(_.ts >= cutoff)
      val merged = Cdc.mergeSnapshot(latest(before), latest(after), "key", Seq("ts", "id", "v"))
      val global = latest(evs).select("key", "ts", "id", "v")
      assert(asMap(merged.collect()) == asMap(global.collect()), s"seed $seed cutoff $cutoff")
    }
  }
}
