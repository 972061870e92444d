package graft.streaming

import java.nio.file.{Files, Paths}

import graft.sink.JdbcConfig

/** Pipeline configuration — Spark twin of the reference's YAML config
  * (S6; filebeat-to-ck/main.go:20-70 struct, main.go:206-244 loader).
  *
  * Faithful semantics:
  *   - path resolution: `CONFIG_PATH` env var, else the reference's
  *     default `/etc/filebeat-to-ck/config.yaml` (main.go:207-210);
  *   - a missing/unreadable file is an error, not a silent default
  *     (main.go:212-215);
  *   - defaulting applies AFTER parse, and only to zero values — empty
  *     string or 0 — exactly the reference's rules (main.go:221-241):
  *     server 0.0.0.0:8080, clickhouse localhost:8123, database `logs`,
  *     table `logs_table`.
  *
  * The YAML subset parser below covers the reference's config shape
  * (nested maps, scalars, inline `[a, b]` and dashed `- item` lists,
  * `#` comments) with no external dependency — the environment resolves
  * nothing beyond the Spark jars.
  */
object AppConfig {

  final case class Server(host: String, port: Int)
  final case class ClickHouse(
      host: String, port: Int, database: String, table: String,
      user: String, password: String) {
    /** The JDBC sink config this ClickHouse target maps to. */
    def toJdbcConfig: JdbcConfig = JdbcConfig(
      url = s"jdbc:clickhouse://$host:$port/$database",
      table = s"$database.$table",
      user = if (user.isEmpty) "default" else user, // main.go:536-542
      password = password)
  }
  /** One `inputs.<name>` block; fields absent for a given input type
    * stay at their zero value (mirrors the Go struct's zero values).
    */
  final case class Input(
      enabled: Boolean = false,
      port: Int = 0,
      protocol: String = "",
      brokers: Seq[String] = Nil,
      topics: Seq[String] = Nil,
      groupId: String = "",
      paths: Seq[String] = Nil,
      format: String = "")

  final case class Conf(
      server: Server,
      clickhouse: ClickHouse,
      inputs: Map[String, Input]) {

    /** Enabled inputs → pipeline sources (S8/S10/S11 wiring). Redis and
      * Lumberjack are unsupported, matching the reference's own stubs
      * (main.go:640-645 “当前版本暂不支持”).
      */
    def sources: Seq[IngestPipeline.Source] = {
      val kafka = inputs.get("kafka").filter(_.enabled).map(i =>
        IngestPipeline.KafkaSource(i.brokers.mkString(","), i.topics.mkString(",")))
      val file = inputs.get("file").filter(_.enabled).flatMap(i =>
        i.paths.headOption.map(IngestPipeline.FileSource))
      val tcp = inputs.get("tcp").filter(_.enabled).map(i =>
        IngestPipeline.SocketSource("0.0.0.0", i.port))
      Seq(kafka, file, tcp).flatten
    }
  }

  /** Load + default, reference path-resolution rules. */
  def load(env: Map[String, String] = sys.env.toMap): Conf = {
    val path = env.getOrElse("CONFIG_PATH", "/etc/filebeat-to-ck/config.yaml")
    val p = Paths.get(path)
    if (!Files.isReadable(p))
      throw new IllegalStateException(s"读取配置文件失败: cannot read config at $path")
    fromYaml(Files.readString(p))
  }

  /** Parse + apply the reference's defaulting rules (main.go:221-241). */
  def fromYaml(text: String): Conf = {
    val root = Yaml.parse(text)
    def section(name: String): Map[String, Any] = root.get(name) match {
      case Some(m: Map[String, Any] @unchecked) => m
      case _ => Map.empty
    }
    def str(m: Map[String, Any], k: String): String = m.get(k).collect { case s: String => s }.getOrElse("")
    def int(m: Map[String, Any], k: String): Int =
      m.get(k).collect { case s: String => s.toIntOption }.flatten.getOrElse(0)
    def bool(m: Map[String, Any], k: String): Boolean =
      m.get(k).collect { case s: String => s == "true" }.getOrElse(false)
    def list(m: Map[String, Any], k: String): Seq[String] = m.get(k) match {
      case Some(l: Seq[Any] @unchecked) => l.collect { case s: String => s }
      case _ => Nil
    }
    def orElse(v: String, d: String) = if (v.isEmpty) d else v
    def orElseI(v: Int, d: Int) = if (v == 0) d else v

    val srv = section("server")
    val ch = section("clickhouse")
    val inputs = section("inputs").collect {
      case (name, m: Map[String, Any] @unchecked) =>
        name -> Input(
          enabled = bool(m, "enabled"), port = int(m, "port"),
          protocol = str(m, "protocol"), brokers = list(m, "brokers"),
          topics = list(m, "topics"), groupId = str(m, "group_id"),
          paths = list(m, "paths"), format = str(m, "format"))
    }
    Conf(
      Server(orElse(str(srv, "host"), "0.0.0.0"), orElseI(int(srv, "port"), 8080)),
      ClickHouse(
        orElse(str(ch, "host"), "localhost"), orElseI(int(ch, "port"), 8123),
        orElse(str(ch, "database"), "logs"), orElse(str(ch, "table"), "logs_table"),
        str(ch, "user"), str(ch, "password")),
      inputs)
  }

  /** Indentation-based parser for the YAML subset the reference config
    * uses. Values are kept as strings (typed accessors coerce); nested
    * maps are Map[String, Any]; lists are Seq[String].
    */
  private[streaming] object Yaml {

    def parse(text: String): Map[String, Any] = {
      val lines = text.linesIterator
        .map(stripComment)
        .zipWithIndex
        .filter(_._1.trim.nonEmpty)
        .map { case (l, _) => l }
        .toVector
      parseMap(lines, 0, indentOf(lines.headOption.getOrElse("")))._1
    }

    private def stripComment(l: String): String = {
      // a '#' outside quotes starts a comment; track WHICH quote char
      // opened the string so an apostrophe inside a double-quoted value
      // (or vice versa) cannot flip the state (ADVICE r2)
      var quote: Char = 0; var i = 0
      while (i < l.length) {
        val c = l.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '#') return l.substring(0, i)
        i += 1
      }
      l
    }

    private def indentOf(s: String): Int = s.takeWhile(_ == ' ').length

    private def unquote(s: String): String = {
      val t = s.trim
      if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
        t.substring(1, t.length - 1)
      else t
    }

    private def scalarOrInlineList(v: String): Any = {
      val t = v.trim
      if (t.startsWith("[") && t.endsWith("]"))
        t.substring(1, t.length - 1).split(",").map(unquote).filter(_.nonEmpty).toSeq
      else unquote(t)
    }

    /** Parses a map block starting at `from` with indentation `base`;
      * returns (map, nextIndex).
      */
    private def parseMap(lines: Vector[String], from: Int, base: Int): (Map[String, Any], Int) = {
      var out = Map.empty[String, Any]
      var i = from
      while (i < lines.length && indentOf(lines(i)) == base && !lines(i).trim.startsWith("- ")) {
        val line = lines(i).trim
        val colon = line.indexOf(':')
        require(colon > 0, s"unparseable config line: $line")
        val key = unquote(line.substring(0, colon))
        val rest = line.substring(colon + 1).trim
        if (rest.nonEmpty) {
          out += key -> scalarOrInlineList(rest)
          i += 1
        } else if (i + 1 < lines.length && indentOf(lines(i + 1)) > base) {
          val childIndent = indentOf(lines(i + 1))
          if (lines(i + 1).trim.startsWith("- ")) {
            val (items, next) = parseList(lines, i + 1, childIndent)
            out += key -> items
            i = next
          } else {
            val (m, next) = parseMap(lines, i + 1, childIndent)
            out += key -> m
            i = next
          }
        } else {
          out += key -> ""
          i += 1
        }
      }
      (out, i)
    }

    private def parseList(lines: Vector[String], from: Int, base: Int): (Seq[String], Int) = {
      var items = Vector.empty[String]
      var i = from
      while (i < lines.length && indentOf(lines(i)) == base && lines(i).trim.startsWith("- ")) {
        items :+= unquote(lines(i).trim.substring(2))
        i += 1
      }
      (items, i)
    }
  }
}
