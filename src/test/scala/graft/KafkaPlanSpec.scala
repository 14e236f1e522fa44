package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-level verification of the production Kafka source (R1,
  * HdfsSink.java:47-55 + kafkaConfig.conf:1-6). No broker or connector
  * jar exists offline, so the query can never START — but the option
  * spelling, the conf plumbing, and the provider lookup can all be
  * executed and pinned without one, which is exactly the part of the
  * path that had never run before this spec.
  */
class KafkaPlanSpec extends AnyFunSuite with SparkTest {

  // Structure mirrors the reference's kafkaConfig.conf:1-6.
  private val confText = """
    kafka {
      brokers = "broker1:9092,broker2:9092"
      topic = "qfbap_ods.code_city"
    }"""

  test("conf-driven Kafka options carry the connector contract's exact keys and values") {
    val c = graft.core.Conf.parse(confText)
    assert(graft.ops.Sources.kafkaOptions(c) === Map(
      "kafka.bootstrap.servers" -> "broker1:9092,broker2:9092",
      "subscribe" -> "qfbap_ods.code_city",
      "startingOffsets" -> "earliest"))
  }

  test("the production source executes through to the kafka provider lookup") {
    // With no spark-sql-kafka jar on the classpath the load() must fail AT
    // PROVIDER RESOLUTION — proving the builder path (conf accessors,
    // option wiring, format selection) runs and requests exactly the
    // `kafka` source. Any earlier failure (bad conf path, option typo
    // throwing in our code) would surface as a different exception.
    val c = graft.core.Conf.parse(confText)
    val ex = intercept[Exception] { graft.ops.Sources.kafka(spark, c) }
    assert(ex.getMessage.toLowerCase.contains("kafka"),
      s"expected the kafka provider lookup to be reached, got: ${ex.getMessage}")
  }
}
