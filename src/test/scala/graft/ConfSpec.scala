package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Conf, Engine}

/** R9 config loader: the HOCON-subset parser must handle the exact shape
  * of the reference's kafkaConfig.conf (nested blocks, JDBC URLs with
  * '=' and ':' inside quoted values, comments) and feed Engine/Sources.
  */
class ConfSpec extends AnyFunSuite {

  // Structure mirrors reference kafkaConfig.conf (topic/brokers/group,
  // zookeeper, two MySQL URLs).
  private val sample = """
    |# consumer settings
    |kafka {
    |  topic = "qfbap_ods.code_city"
    |  brokers = "kms-2:9092,kms-3:9092,kms-4:9092"  // three brokers
    |  group: "qfbap_group"
    |}
    |zookeeper {
    |  host = "kms-1:2181"
    |  timeout = 6000
    |}
    |mysql {
    |  url1 = "jdbc:mysql://host1:3306/qfbap?useSSL=false&serverTimezone=UTC"
    |  url2 = "jdbc:mysql://host2:3306/qfbap_ods"
    |}
    |flat.dotted.key = 42
    |toggle = true
    |""".stripMargin

  test("parses blocks, dotted keys, comments, and quoted URLs") {
    val c = Conf.parse(sample)
    assert(c.getString("kafka.topic") == "qfbap_ods.code_city")
    assert(c.getString("kafka.brokers") == "kms-2:9092,kms-3:9092,kms-4:9092")
    assert(c.getString("kafka.group") == "qfbap_group") // ':' separator form
    assert(c.getInt("zookeeper.timeout") == 6000)
    // '=' and ':' inside a quoted value must not split the line
    assert(c.getString("mysql.url1") ==
      "jdbc:mysql://host1:3306/qfbap?useSSL=false&serverTimezone=UTC")
    assert(c.getInt("flat.dotted.key") == 42)
    assert(c.getBoolean("toggle"))
    assert(c.getString("kafka.missing", "dflt") == "dflt")
    assert(intercept[NoSuchElementException](c.getString("kafka.missing"))
      .getMessage.contains("kafka.missing"))
  }

  test("rejects unbalanced blocks") {
    intercept[IllegalArgumentException](Conf.parse("a {\n b = 1\n"))
    intercept[IllegalArgumentException](Conf.parse("}\n"))
  }

  test("a quoted value ending in '{' is a value, not a block open") {
    val c = Conf.parse("prefix = \"{\"\nsuffix = \"x{\"\n")
    assert(c.getString("prefix") == "{")
    assert(c.getString("suffix") == "x{")
  }

  test("bundled engine.conf loads from the classpath and feeds Engine") {
    val c = Conf.load()
    assert(c.getString("kafka.topic") == "qfbap_ods.code_city")
    assert(c.getString("jdbc.partition-column") == "event_id")
    assert(Engine.sessionSettings(c) == (("local[*]", 32)))
  }

  test("fromFile matches the reference Utility.parseConf entry point") {
    val f = java.nio.file.Files.createTempFile("graft-conf", ".conf")
    java.nio.file.Files.write(f, sample.getBytes("UTF-8"))
    try assert(Conf.fromFile(f.toString).getString("zookeeper.host") == "kms-1:2181")
    finally java.nio.file.Files.delete(f)
  }
}
