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

  test("quoted values keep literal backslashes; only \\\" and \\\\ unescape (ADVICE r14)") {
    // Regression pin: collapsing EVERY \x escape to x mangled values
    // with literal backslashes — a Windows path lost its separator, a
    // regex lost its class marker. Unknown escapes now pass through
    // verbatim; the two defined escapes still unescape.
    val text =
      "win = \"C:\\temp\"\n" +     // literal backslash, not an escape
      "re = \"\\d+\"\n" +          // regex stays intact
      "q = \"a\\\"b\"\n" +         // \" -> "
      "bs = \"a\\\\b\"\n"          // \\ -> \
    val c = Conf.parse(text)
    assert(c.getString("win") == "C:\\temp")
    assert(c.getString("re") == "\\d+")
    assert(c.getString("q") == "a\"b")
    assert(c.getString("bs") == "a\\b")
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

  test("parser totality: arbitrary text parses or fails with a clean error only") {
    // A config file is operator-supplied input: a typo must produce the
    // parser's own IllegalArgumentException (which carries the offending
    // line), never an index/null/stack error from parser internals.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val hostile = Gen.listOf(Gen.oneOf(
      Gen.oneOf("{", "}", "=", ":", "\"", "#", "//", "a", "b", ".", " ", "\t"),
      Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString.take(12))
    )).map(_.mkString(" "))
    val text = Gen.listOf(hostile).map(_.mkString("\n"))
    (1L to 30L).foreach { seed =>
      val s = text.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error(s"gen failed for seed $seed"))
      try { Conf.parse(s); () }
      catch { case _: IllegalArgumentException => () } // require() throws this too
    }
  }

  test("generated valid configs round-trip to the exact entry map") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val ident = Gen.choose(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString))
    val genEntries = Gen.choose(1, 8).flatMap(n => Gen.listOfN(n, for {
      section <- ident
      key <- ident
      value <- Gen.oneOf(ident, Gen.choose(0, 999).map(_.toString))
    } yield (section, key, value)))
    (1L to 10L).foreach { seed =>
      val entries = genEntries.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error(s"gen failed for seed $seed"))
        // last-wins on duplicate paths, like the parser's Map builder
        .map { case (s, k, v) => (s"$s.$k", (s, k, v)) }.toMap.values.toList
      val text = entries.map { case (s, k, v) => s"$s {\n  $k = \"$v\"\n}" }.mkString("\n")
      val conf = Conf.parse(text)
      assert(conf.paths == entries.map { case (s, k, _) => s"$s.$k" }.toSet, s"seed $seed")
      entries.foreach { case (s, k, v) =>
        assert(conf.getString(s"$s.$k") == v, s"seed $seed: $s.$k")
      }
    }
  }

  test("escaped quotes inside quoted values survive comments and separators") {
    val conf = Conf.parse(
      """a {
        |  pw = "x\"y" # trailing comment
        |  eq = "a\"=\"b"
        |  bs = "c\\d"
        |}""".stripMargin)
    assert(conf.getString("a.pw") == "x\"y")
    assert(conf.getString("a.eq") == "a\"=\"b")
    assert(conf.getString("a.bs") == "c\\d")
  }
}
