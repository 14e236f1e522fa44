package graft

import org.scalatest.funsuite.AnyFunSuite

/** Randomized equivalence gates for the behavioral-analytics family: the
  * staged/windowed Spark plans must agree with a direct driver-side
  * evaluation of the semantics on arbitrary small event sets — catching
  * boundary bugs (step-window inclusivity, cohort week arithmetic,
  * transition tie-breaks) that one fixture can miss. Same discipline as
  * the dedup family's staged==naive properties.
  */
/** ts is epoch NANOS as a raw long — the driver fixtures' physical type
  * (TIMESTAMP(NANOS)), which graft.core.Tables truncates to µs on read.
  */
case class BehaviorSpecEv(event_id: Long, ts: Long, user_id: Long,
    event_type: String, value: Double, props: String)

class BehaviorSpec extends AnyFunSuite with SparkTest {

  private type Ev = BehaviorSpecEv
  private def Ev = BehaviorSpecEv
  private implicit class EvMs(e: Ev) { def tsMs: Long = e.ts / 1000000L }

  private val Types = Vector("signup", "view", "click", "purchase", "error")
  private val HourMs = 3600L * 1000L

  /** Random event sets: few users, ts jitter up to ~5 days so funnel
    * windows and week boundaries are both exercised.
    */
  private def randomEvents(seed: Int, n: Int): Seq[Ev] = {
    val rnd = new scala.util.Random(seed)
    val base = 1700000000000L
    (0 until n).map { i =>
      Ev(i.toLong,
        (base + rnd.nextLong(5L * 24 * HourMs)) * 1000000L,
        rnd.nextInt(6).toLong,
        Types(rnd.nextInt(Types.size)),
        rnd.nextDouble() * 100,
        "{}")
    }
  }

  /** Run a registered events-table query against an in-memory event set
    * by writing it as a one-file fixture dir (ts as µs-truncated
    * timestamp, like Tables emits).
    */
  private def runOn(events: Seq[Ev], query: String): Array[org.apache.spark.sql.Row] = {
    import spark.implicits._
    val dir = graft.core.TempDirs.create("graft_behavior_spec")
    events.toDF().write.mode("overwrite").parquet(s"$dir/events.parquet")
    SparkEntry.queries(query)(spark, dir).collect()
  }

  private def naiveFunnel(events: Seq[Ev]): Seq[(Int, String, Long)] = {
    val steps = Seq("signup", "view", "click", "purchase")
    val byUser = events.groupBy(_.user_id)
    // survivors(k): user -> completion ts of step k
    val stages = steps.zipWithIndex.scanLeft(Option.empty[Map[Long, Long]]) {
      case (prev, (step, 0)) =>
        val _ = prev
        Some(byUser.flatMap { case (u, evs) =>
          val ts = evs.filter(_.event_type == step).map(_.tsMs)
          if (ts.isEmpty) None else Some(u -> ts.min)
        })
      case (Some(prev), (step, _)) =>
        Some(prev.flatMap { case (u, t0) =>
          val ts = byUser.getOrElse(u, Nil)
            .filter(e => e.event_type == step &&
              e.tsMs > t0 && e.tsMs <= t0 + 24 * HourMs)
            .map(_.tsMs)
          if (ts.isEmpty) None else Some(u -> ts.min)
        })
      case (None, _) => None
    }.flatten
    stages.zip(steps).zipWithIndex.map { case ((m, s), i) =>
      (i + 1, s, m.size.toLong)
    }
  }

  test("q_funnel matches the naive per-user sequential evaluation on random event sets") {
    for (seed <- 1 to 5) {
      val events = randomEvents(seed, 400)
      val got = runOn(events, "q_funnel")
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
      assert(got == naiveFunnel(events), s"seed=$seed")
    }
  }

  test("funnel counts are monotonically non-increasing by construction") {
    for (seed <- 10 to 12) {
      val counts = naiveFunnel(randomEvents(seed, 300)).map(_._3)
      assert(counts == counts.sorted.reverse, s"seed=$seed: $counts")
    }
  }

  test("q_retention_cohort matches the naive cohort/week-offset evaluation") {
    for (seed <- 1 to 5) {
      val events = randomEvents(seed, 400)
      val got = runOn(events, "q_retention_cohort")
        .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2))).toSeq

      val dayOf = (ms: Long) => java.time.Instant.ofEpochMilli(ms)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      val firstDay = events.groupBy(_.user_id)
        .map { case (u, evs) => u -> dayOf(evs.map(_.tsMs).min) }
      val naive = events
        .map { e =>
          val c = firstDay(e.user_id)
          ((c, java.time.temporal.ChronoUnit.DAYS.between(c, dayOf(e.tsMs)) / 7), e.user_id)
        }
        .distinct
        .groupBy(_._1).map { case ((c, w), us) => (c.toString, w, us.size.toLong) }
        .toSeq.sorted
      assert(got == naive, s"seed=$seed")
    }
  }

  test("q_sessionize matches the naive gaps-and-islands evaluation on random event sets") {
    for (seed <- 1 to 5) {
      val events = randomEvents(seed, 400)
      val got = runOn(events, "q_sessionize").map { r =>
        (r.getLong(0), r.getLong(1), r.getTimestamp(2).getTime,
          r.getTimestamp(3).getTime, r.getLong(4), r.getDouble(5))
      }.toSeq

      val naive = events.groupBy(_.user_id).toSeq.flatMap { case (u, evs) =>
        val sorted = evs.sortBy(e => (e.tsMs, e.event_id))
        val sessions = scala.collection.mutable.ArrayBuffer
          .empty[scala.collection.mutable.ArrayBuffer[Ev]]
        var prev = Option.empty[Long]
        sorted.foreach { e =>
          if (prev.isEmpty || e.tsMs > prev.get + 30 * 60 * 1000L)
            sessions += scala.collection.mutable.ArrayBuffer(e)
          else sessions.last += e
          prev = Some(e.tsMs)
        }
        sessions.zipWithIndex.map { case (s, i) =>
          (u, (i + 1).toLong, s.map(_.tsMs).min, s.map(_.tsMs).max,
            s.size.toLong, s.map(_.value).sum)
        }
      }.sortBy(t => (t._1, t._2))

      assert(got.map(t => (t._1, t._2, t._3, t._4, t._5)) ==
        naive.map(t => (t._1, t._2, t._3, t._4, t._5)), s"seed=$seed")
      // Value sums compare with a tolerance straddling the round(2):
      // Spark's partial-sum order differs from the sequential fold.
      got.zip(naive).foreach { case (g, n) =>
        assert(math.abs(g._6 - n._6) < 0.006, s"seed=$seed $g vs $n")
      }
    }
  }

  test("sessionize gap boundary: exactly 30 min continues, 30 min + 1 ms splits") {
    val base = 1700000000000L
    def ev(id: Long, ms: Long) = Ev(id, ms * 1000000L, 1L, "view", 1.0, "{}")
    val cont = runOn(Seq(ev(0, base), ev(1, base + 30 * 60 * 1000L)), "q_sessionize")
    assert(cont.length == 1 && cont.head.getLong(4) == 2L)
    val split = runOn(Seq(ev(0, base), ev(1, base + 30 * 60 * 1000L + 1)), "q_sessionize")
    assert(split.length == 2 && split.forall(_.getLong(4) == 1L))
  }

  /** Naive last-touch attribution — preceding in (tsUs, event_id) order,
    * 3-day lookback in exact microseconds, else 'direct'.
    */
  private def naiveAttribution(events: Seq[Ev]): Map[String, (Long, Double)] = {
    val windowUs = 3L * 86400L * 1000000L
    def tsUs(e: Ev) = e.ts / 1000L
    val byUser = events.groupBy(_.user_id)
    events.filter(_.event_type == "purchase").map { p =>
      val touch = byUser(p.user_id)
        .filter(e => (e.event_type == "click" || e.event_type == "view") &&
          (tsUs(e) < tsUs(p) || (tsUs(e) == tsUs(p) && e.event_id < p.event_id)))
        .sortBy(e => (tsUs(e), e.event_id)).lastOption
      val channel = touch match {
        case Some(t) if tsUs(p) - tsUs(t) <= windowUs => t.event_type
        case _ => "direct"
      }
      (channel, p.value)
    }.groupBy(_._1).map { case (c, xs) => c -> ((xs.size.toLong, xs.map(_._2).sum)) }
  }

  test("q_attribution planted scenarios: last touch wins, exact 3-day boundary in, 4 days out") {
    val day = 86400L * 1000L
    val base = 1700000000000L
    def ev(id: Long, u: Long, t: String, ms: Long, v: Double = 0.0) =
      Ev(id, ms * 1000000L, u, t, v, "{}")
    val events = Seq(
      ev(1, 1, "click", base), ev(2, 1, "purchase", base + 2 * day, 1.0),      // → click
      ev(3, 2, "view", base), ev(4, 2, "purchase", base + 4 * day, 8.0),       // 4d → direct
      ev(5, 3, "purchase", base + day, 16.0),                                  // no touch → direct
      ev(6, 4, "click", base), ev(7, 4, "view", base + day),
      ev(8, 4, "purchase", base + 2 * day, 2.0),                               // last touch → view
      ev(9, 5, "view", base), ev(10, 5, "purchase", base + 3 * day, 4.0),      // exactly 3d → view
      ev(11, 6, "purchase", base, 32.0), ev(12, 6, "click", base + day))       // touch after → direct
    val got = runOn(events, "q_attribution")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got == Map(
      "click" -> ((1L, 1.0)), "view" -> ((2L, 6.0)), "direct" -> ((3L, 56.0))))
  }

  test("q_attribution matches the naive per-purchase evaluation on random event sets") {
    for (seed <- 1 to 5) {
      val events = randomEvents(seed, 400)
      val got = runOn(events, "q_attribution")
        .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      val naive = naiveAttribution(events)
      assert(got.keySet == naive.keySet, s"seed=$seed")
      naive.foreach { case (c, (n, rev)) =>
        assert(got(c)._1 == n, s"seed=$seed channel=$c count")
        // The entry rounds to 2 dp; compare against the unrounded naive
        // sum with a half-cent-plus-ulp tolerance.
        assert(math.abs(got(c)._2 - rev) < 0.006, s"seed=$seed channel=$c revenue")
      }
    }
  }

  /** Naive linear attribution — integer micro-credits, RANGE-frame
    * semantics (touches with p_us − t_us ∈ [1, 3 days] in µs).
    */
  private def naiveLinear(events: Seq[Ev]): Map[String, (Long, Long)] = {
    val windowUs = 3L * 86400L * 1000000L
    def tsUs(e: Ev) = e.ts / 1000L
    val byUser = events.groupBy(_.user_id)
    val credits = events.filter(_.event_type == "purchase").flatMap { p =>
      val touches = byUser(p.user_id).filter { e =>
        (e.event_type == "click" || e.event_type == "view") &&
          tsUs(p) - tsUs(e) >= 1 && tsUs(p) - tsUs(e) <= windowUs
      }
      val (nc, nv) = (touches.count(_.event_type == "click").toLong,
        touches.count(_.event_type == "view").toLong)
      val nt = nc + nv
      val vc = math.round(p.value * 100)
      Seq(
        ("click", if (nt > 0) vc * 10000 * nc / nt else 0L, if (nc > 0) 1L else 0L),
        ("direct", if (nt == 0) vc * 10000 else 0L, if (nt == 0) 1L else 0L),
        ("view", if (nt > 0) vc * 10000 * nv / nt else 0L, if (nv > 0) 1L else 0L))
    }
    credits.groupBy(_._1).map { case (c, xs) =>
      c -> ((xs.map(_._3).sum, xs.map(_._2).sum))
    }
  }

  test("q_attribution_linear planted: even split, remainder truncation, window edges, direct") {
    val day = 86400L * 1000L
    val base = 1700000000000L
    def ev(id: Long, u: Long, t: String, ms: Long, v: Double = 0.0) =
      Ev(id, ms * 1000000L, u, t, v, "{}")
    val events = Seq(
      // user 1: 2 clicks + 1 view in window → 10.00 splits 2:1 by count
      ev(1, 1, "click", base), ev(2, 1, "click", base + day),
      ev(3, 1, "view", base + day), ev(4, 1, "purchase", base + 2 * day, 10.0),
      // user 2: one view exactly 3 days before → all credit to view
      ev(5, 2, "view", base), ev(6, 2, "purchase", base + 3 * day, 8.0),
      // user 3: one click 4 days before (out) → direct
      ev(7, 3, "click", base), ev(8, 3, "purchase", base + 4 * day, 5.0),
      // user 4: touch at the SAME µs as the purchase → excluded → direct
      ev(9, 4, "click", base), ev(10, 4, "purchase", base, 3.0))
    val got = runOn(events, "q_attribution_linear")
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // user 1: vc=1000 → credit base 1000*10^4 = 10^7: click 2/3 → 6666666,
    // view 1/3 → 3333333 (truncated); user 2: view 8*10^6... in micro: 8000000.
    assert(got == Map(
      "click" -> ((1L, 6666666L)),
      "view" -> ((2L, 3333333L + 8000000L)),
      "direct" -> ((2L, 5000000L + 3000000L))))
    assert(got == naiveLinear(events).map { case (k, (n, c)) => k -> ((n, c)) })
  }

  test("q_attribution_linear matches the naive per-purchase evaluation on random event sets") {
    for (seed <- 1 to 5) {
      val events = randomEvents(seed, 400)
      val got = runOn(events, "q_attribution_linear")
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val naive = naiveLinear(events)
      assert(got == naive, s"seed=$seed")
    }
  }

  test("q_event_transitions matches the naive lead-pair evaluation and rows sum to n - users") {
    for (seed <- 1 to 5) {
      val events = randomEvents(seed, 400)
      val got = runOn(events, "q_event_transitions")
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq

      val naivePairs = events.groupBy(_.user_id).toSeq.flatMap { case (_, evs) =>
        evs.sortBy(e => (e.tsMs, e.event_id)).sliding(2).collect {
          case Seq(a, b) => (a.event_type, b.event_type)
        }
      }
      val naive = naivePairs.groupBy(identity)
        .map { case ((a, b), xs) => (a, b, xs.size.toLong) }.toSeq.sorted
      assert(got == naive, s"seed=$seed")
      // Each user's k events yield exactly k-1 transitions.
      val users = events.map(_.user_id).distinct.size
      assert(got.map(_._3).sum == events.size - users, s"seed=$seed")
    }
  }
}
