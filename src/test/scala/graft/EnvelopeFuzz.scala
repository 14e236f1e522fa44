package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Shared hostile Canal-envelope corpus — used by the batch fuzz property
  * (CdcSpec) and the streaming dead-letter property (StreamingSpec), so
  * both halves of the pipeline face the same adversarial input: random
  * garbage bytes, truncated JSON, and type-confused envelopes (every
  * field with the wrong JSON type, plus epoch-overflow `es` values that
  * found the timestamp_millis ANSI overflow before eventTimeDt's range
  * guard).
  */
object EnvelopeFuzz {

  /** A well-formed envelope on ONE line (the streaming text source frames
    * records by line, so the survivable record must not contain \n).
    */
  val valid: String =
    """{"id": 1, "es": 1585023600000, "ts": 1585023601000, "type": "UPDATE", "isDdl": "false", "database": "qfbap_ods", "table": "code_city", "data": [{"id": "42", "city": "Beijing", "province": "BJ", "event_time": "2020-03-24 12:00:00"}]}"""

  private val confused = Gen.oneOf(
    """{"id": "notanumber", "es": [], "ts": {}, "type": 7, "isDdl": "false", "data": [{"id": "1"}]}""",
    s"""{"id": 1, "es": ${Long.MaxValue}, "ts": 1, "type": "UPDATE", "isDdl": "false", "data": [{"id": "1"}]}""",
    s"""{"id": 1, "es": ${Long.MinValue}, "ts": 1, "type": "UPDATE", "isDdl": "false", "data": [{"id": "1"}]}""",
    """{"id": 1, "es": -9223372036854776, "ts": 1, "type": "UPDATE", "isDdl": "false", "data": [{"id": "1"}]}""",
    """{"id": 1, "es": 99999999999999999999999999, "ts": 1, "type": "UPDATE", "isDdl": "false", "data": [{"id": "1"}]}""",
    """{"id": 1, "es": "soon", "ts": 1, "type": "UPDATE", "isDdl": "false", "data": [{"id": "1"}]}""",
    """{"isDdl": "false", "data": 42}""",
    """{"isDdl": "false", "data": {"id": "1"}}""",
    """{"isDdl": "false", "data": [1, 2, 3]}""",
    """{"isDdl": "false", "data": [{"id": {"nested": true}}]}""",
    """{"isDdl": false, "data": [{"id": "1"}]}""",
    """{"isDdl": "false", "data": [null]}""")

  private val garbage = Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString)

  private val truncated = Gen.choose(0, valid.length).map(valid.take)

  private val gen = Gen.listOfN(40, Gen.frequency(
    3 -> garbage, 3 -> truncated, 3 -> confused, 1 -> Gen.const(valid)))

  /** Deterministic 40-line hostile corpus for a seed. */
  def corpus(seed: Long): List[String] =
    gen.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error(s"gen failed for seed $seed"))
}
