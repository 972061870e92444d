package graft.sink

import java.util.Properties

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ingest.Normalize

/** JDBC sink for ClickHouse parity (SURVEY.md §2A K2; reference:
  * `writeToClickHouse`, filebeat-to-ck/main.go:438-558).
  *
  * Semantics mirrored from the reference:
  *   - one micro-batch = one insert batch (the reference's one HTTP
  *     request = one INSERT, main.go:331-338) via foreachBatch;
  *   - at-least-once: a failed batch throws, Structured Streaming
  *     replays it — the same retry contract as Filebeat re-posting on a
  *     500 (main.go:333-338);
  *   - timestamps rendered at second precision for wire parity
  *     (main.go:456) — the string form goes through `formatForSink`;
  *   - 30 s timeout default (main.go:544) via queryTimeout.
  *
  * The ClickHouse JDBC driver is not shipped in this environment, so
  * this path is exercised in integration only; unit tests cover the
  * projection. Any JDBC URL works — the sink is driver-agnostic.
  */
final case class JdbcConfig(
    url: String,                      // e.g. jdbc:clickhouse://host:8123/logs
    table: String = "logs.logs_table",
    user: String = "default",         // reference default, main.go:536-542
    password: String = "",
    driver: Option[String] = None,
    batchSize: Int = 10000,
    queryTimeoutSec: Int = 30)        // main.go:544

object JdbcLogsSink {

  /** Wire projection: second-precision string timestamp, all strings
    * non-null (the table's DEFAULT '' contract, init.sql:9-18).
    */
  def wireProjection(df: DataFrame): DataFrame =
    df.select(
      Normalize.formatForSink(col("timestamp")).as("timestamp"),
      col("message"), col("container"), col("host_name"),
      col("docker_container_id"), col("docker_container_name"),
      col("agent_name"), col("agent_version"), col("log_file_path"),
      col("raw_json"))

  def append(df: DataFrame, cfg: JdbcConfig): Unit = {
    val props = new Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    props.setProperty("batchsize", cfg.batchSize.toString)
    props.setProperty("queryTimeout", cfg.queryTimeoutSec.toString)
    cfg.driver.foreach(d => props.setProperty("driver", d))
    wireProjection(df).write.mode("append").jdbc(cfg.url, cfg.table, props)
  }
}
