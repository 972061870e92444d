package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{AppConfig, IngestPipeline}

/** Config loader (S6): YAML parse, reference defaulting rules
  * (main.go:206-244), CONFIG_PATH override, source wiring.
  */
class ConfigSpec extends AnyFunSuite {

  private val fullYaml =
    """# comment line
      |server:
      |  host: 127.0.0.1
      |  port: 9999
      |clickhouse:
      |  host: ch-prod      # trailing comment
      |  port: 8124
      |  database: obs
      |  table: app_logs
      |  user: writer
      |  password: "s3cret"
      |inputs:
      |  elasticsearch:
      |    enabled: true
      |    port: 9200
      |  kafka:
      |    enabled: true
      |    brokers: [broker1:9092, broker2:9092]
      |    topics:
      |      - logs
      |      - metrics
      |    group_id: graft
      |  file:
      |    enabled: true
      |    paths:
      |      - /var/log/app
      |  tcp:
      |    enabled: false
      |    port: 5000
      |""".stripMargin

  test("full config parses with every field") {
    val c = AppConfig.fromYaml(fullYaml)
    assert(c.server == AppConfig.Server("127.0.0.1", 9999))
    assert(c.clickhouse.host == "ch-prod" && c.clickhouse.port == 8124)
    assert(c.clickhouse.database == "obs" && c.clickhouse.table == "app_logs")
    assert(c.clickhouse.user == "writer" && c.clickhouse.password == "s3cret")
    assert(c.inputs("kafka").brokers == Seq("broker1:9092", "broker2:9092"))
    assert(c.inputs("kafka").topics == Seq("logs", "metrics"))
    assert(c.inputs("file").paths == Seq("/var/log/app"))
    assert(!c.inputs("tcp").enabled)
  }

  test("zero values get the reference defaults (main.go:221-241)") {
    val c = AppConfig.fromYaml("server:\n  host: \"\"\nclickhouse:\n  port: 0\n")
    assert(c.server == AppConfig.Server("0.0.0.0", 8080))
    assert(c.clickhouse.host == "localhost" && c.clickhouse.port == 8123)
    assert(c.clickhouse.database == "logs" && c.clickhouse.table == "logs_table")
  }

  test("explicit values are NOT overridden by defaults") {
    val c = AppConfig.fromYaml("clickhouse:\n  host: keep-me\n  port: 9000\n")
    assert(c.clickhouse.host == "keep-me" && c.clickhouse.port == 9000)
  }

  test("CONFIG_PATH env override wins; missing file is an error") {
    val p = Files.createTempFile("graft-conf", ".yaml")
    Files.writeString(p, "server:\n  port: 7777\n")
    val c = AppConfig.load(Map("CONFIG_PATH" -> p.toString))
    assert(c.server.port == 7777)
    intercept[IllegalStateException] {
      AppConfig.load(Map("CONFIG_PATH" -> "/nonexistent/conf.yaml"))
    }
    // no CONFIG_PATH and no file at the reference default path → error
    intercept[IllegalStateException] { AppConfig.load(Map.empty) }
  }

  test("ClickHouse block maps to the JDBC sink config") {
    val j = AppConfig.fromYaml(fullYaml).clickhouse.toJdbcConfig
    assert(j.url == "jdbc:clickhouse://ch-prod:8124/obs")
    assert(j.table == "obs.app_logs" && j.user == "writer" && j.password == "s3cret")
    // empty user falls back to the reference default account
    assert(AppConfig.fromYaml("").clickhouse.toJdbcConfig.user == "default")
  }

  test("enabled inputs wire to pipeline sources (kafka/file/tcp)") {
    val srcs = AppConfig.fromYaml(fullYaml).sources
    assert(srcs.contains(IngestPipeline.KafkaSource("broker1:9092,broker2:9092", "logs,metrics")))
    assert(srcs.contains(IngestPipeline.FileSource("/var/log/app")))
    assert(!srcs.exists(_.isInstanceOf[IngestPipeline.SocketSource])) // tcp disabled
  }
}
