package graft.core

/** HOCON config loader (R9) — the reference boots from a HOCON file via
  * Typesafe Config (`Utility.parseConf`, reference Utility.java:19-23;
  * file kafkaConfig.conf) holding Kafka topic/brokers/group, zookeeper,
  * and the MySQL JDBC URLs. The Typesafe Config artifact is not present
  * in this environment's jar set, so the engine carries a small parser
  * for the HOCON subset such a bootstrap file actually uses:
  *
  *   - `key = value` and `key: value` pairs
  *   - nested `section { ... }` blocks and dotted keys (`a.b = 1`)
  *   - quoted or bare scalar values; `#` and `//` comments
  *
  * The accessor surface mirrors Typesafe Config
  * (`conf.getString("kafka.brokers")`), so swapping the real library in
  * on a cluster deployment is a drop-in change at this one seam.
  */
final class Conf private[core] (entries: Map[String, String]) {

  def hasPath(path: String): Boolean = entries.contains(path)

  def getString(path: String): String =
    entries.getOrElse(path,
      throw new NoSuchElementException(s"no config value at path '$path'"))

  def getString(path: String, default: String): String =
    entries.getOrElse(path, default)

  def getInt(path: String): Int = getString(path).trim.toInt
  def getInt(path: String, default: Int): Int =
    entries.get(path).map(_.trim.toInt).getOrElse(default)

  def getLong(path: String): Long = getString(path).trim.toLong

  def getBoolean(path: String): Boolean = getString(path).trim.toBoolean

  /** All leaf paths, for diagnostics. */
  def paths: Set[String] = entries.keySet
}

object Conf {

  /** Parse HOCON-subset text into path → value entries. */
  def parse(text: String): Conf = {
    val entries = Map.newBuilder[String, String]
    var stack = List.empty[String]

    def fullPath(key: String): String = (key :: stack).reverse.mkString(".")

    // Strip a trailing # or // comment that is OUTSIDE quotes. Inside
    // quotes a backslash escapes the next character (so `"a\""` does not
    // end the string at the escaped quote — without this, a quoted value
    // containing \" would silently keep its trailing comment).
    def stripComment(line: String): String = {
      var inQuote = false
      var i = 0
      while (i < line.length) {
        val c = line.charAt(i)
        if (inQuote && c == '\\') i += 1 // skip the escaped character
        else if (c == '"') inQuote = !inQuote
        else if (!inQuote && (c == '#' ||
          (c == '/' && i + 1 < line.length && line.charAt(i + 1) == '/')))
          return line.substring(0, i)
        i += 1
      }
      line
    }

    // Quoted values unescape \" and \\ ONLY; any other backslash
    // sequence passes through verbatim (ADVICE r14: collapsing every
    // \x to x silently mangled literal backslashes — "C:\temp" became
    // "C:temp", the regex "\d+" became "d+"). The HOCON-subset
    // contract; the reference config uses no escapes at all.
    def unquote(v: String): String = {
      val t = v.trim
      if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) {
        val inner = t.substring(1, t.length - 1)
        if (!inner.contains('\\')) inner
        else {
          val sb = new StringBuilder
          var i = 0
          while (i < inner.length) {
            val c = inner.charAt(i)
            if (c == '\\' && i + 1 < inner.length &&
                (inner.charAt(i + 1) == '"' || inner.charAt(i + 1) == '\\')) {
              sb.append(inner.charAt(i + 1)); i += 2
            } else { sb.append(c); i += 1 }
          }
          sb.toString
        }
      } else t
    }

    // First '=' or ':' outside quotes, -1 if none. Escape-aware like
    // stripComment.
    def sepOutsideQuotes(line: String): Int = {
      var inQuote = false
      var found = -1
      var i = 0
      while (i < line.length && found < 0) {
        val c = line.charAt(i)
        if (inQuote && c == '\\') i += 1
        else if (c == '"') inQuote = !inQuote
        else if (!inQuote && (c == '=' || c == ':')) found = i
        i += 1
      }
      found
    }

    text.linesIterator.foreach { raw =>
      val line = stripComment(raw).trim
      if (line.nonEmpty) {
        val sep = sepOutsideQuotes(line)
        if (line == "}") {
          require(stack.nonEmpty, s"unbalanced '}' in config")
          stack = stack.tail
        } else if (sep > 0) {
          // Key/value wins over the block-open check: a quoted value may
          // legitimately END with '{' (e.g. prefix = "{").
          val key = line.substring(0, sep).trim
          val value = unquote(line.substring(sep + 1))
          entries += fullPath(key) -> value
        } else if (line.endsWith("{")) {
          val key = line.dropRight(1).trim
          require(key.nonEmpty, "anonymous block in config")
          stack = key :: stack
        } else {
          throw new IllegalArgumentException(s"unparsable config line: '$line'")
        }
      }
    }
    require(stack.isEmpty, s"unclosed block(s) in config: ${stack.reverse.mkString(".")}")
    new Conf(entries.result())
  }

  /** Load from the classpath (the engine's bundled engine.conf), exactly
    * the reference's `ConfigFactory.parseResources` usage.
    */
  def load(resource: String = "engine.conf"): Conf = {
    val in = Thread.currentThread().getContextClassLoader.getResourceAsStream(resource)
    require(in != null, s"config resource '$resource' not on classpath")
    try parse(new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8))
    finally in.close()
  }

  /** Load from an explicit file path (`Utility.parseConf(fileName)`). */
  def fromFile(path: String): Conf =
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8))
}
