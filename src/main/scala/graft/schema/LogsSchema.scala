package graft.schema

import org.apache.spark.sql.types._

/** Schemas for the log-ingestion pipeline.
  *
  * Mirrors the reference's two-sided type system (SURVEY.md §1.2):
  * ingest is schema-on-read over semi-structured JSON (reference:
  * filebeat-to-ck/main.go:72-83, `FilebeatEvent` with open
  * `map[string]interface{}` sub-objects); storage is a fixed 10-column
  * wide row (reference: clickhouse-init/init.sql:7-19).
  */
object LogsSchema {

  /** The at-rest normalized log schema — mirror of init.sql:7-19.
    * Every column has a default (`now()` / `''`) so partial events always
    * materialize a complete row.
    */
  val logsSchema: StructType = StructType(Seq(
    StructField("timestamp",             TimestampNTZType, nullable = false),
    StructField("message",               StringType, nullable = false),
    StructField("container",             StringType, nullable = false),
    StructField("host_name",             StringType, nullable = false),
    StructField("docker_container_id",   StringType, nullable = false),
    StructField("docker_container_name", StringType, nullable = false),
    StructField("agent_name",            StringType, nullable = false),
    StructField("agent_version",         StringType, nullable = false),
    StructField("log_file_path",         StringType, nullable = false),
    StructField("raw_json",              StringType, nullable = false)
  ))

  /** Typed envelope for `from_json` decode — the Spark analogue of
    * `FilebeatEvent` (main.go:72-83). `@timestamp` stays a string (JSON
    * has no time type; the Go side's `interface{}` receives a string
    * too); unknown top-level keys need no `Extra` column because
    * `raw_json` keeps the original line (SURVEY.md §7.3 trap 2).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("@timestamp", StringType),
    StructField("message",    StringType),
    StructField("container",  StructType(Seq(
      StructField("name", StringType), StructField("id", StringType)))),
    StructField("host",       StructType(Seq(StructField("name", StringType)))),
    StructField("docker",     StructType(Seq(
      StructField("container", StructType(Seq(
        StructField("id", StringType), StructField("name", StringType))))))),
    StructField("agent",      StructType(Seq(
      StructField("name", StringType), StructField("version", StringType)))),
    StructField("log",        StructType(Seq(
      StructField("file", StructType(Seq(StructField("path", StringType)))))))
  ))
}
