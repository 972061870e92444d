package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event normalization: raw JSON line → the 10-column logs row
  * (SURVEY.md §2A T1–T9; reference: filebeat-to-ck/main.go:452-516).
  *
  * Pure column projection over `get_json_object` — schema-on-read, no
  * UDFs, fully codegen'd, trivially parallel at any scale. The original
  * input line is preserved verbatim as `raw_json` (strictly more
  * faithful than the reference, which re-marshals and silently drops
  * unknown keys on the typed path — main.go:82 `json:"-"`; documented
  * deviation, SURVEY.md §7.3 trap 2).
  */
object Normalize {

  /** T1 — multi-format timestamp coercion with never-fail fallback
    * (reference `GetTimestamp`, main.go:86-112: five layouts tried in
    * order, nil/unparseable → `time.Now()`).
    *
    * Go layout → Spark pattern:
    *   RFC3339 / RFC3339Nano / "…T….000Z" / "…T…Z" → ISO-8601 forms,
    *   all accepted by try_to_timestamp's default parser or the
    *   explicit offset patterns below; "2006-01-02 15:04:05" → space
    *   form. Fallback is the caller-supplied ingest time — in streaming
    *   that's batch-stable `current_timestamp()`, better-defined than
    *   the reference's per-row `time.Now()` (SURVEY.md §7.3 trap 1).
    */
  def coerceTimestamp(c: Column, fallback: Column = current_timestamp()): Column = {
    val attempts = Seq(
      try_to_timestamp(c),                                        // ISO & "yyyy-MM-dd HH:mm:ss[.S]" forms
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSSSSXXX")), // RFC3339Nano
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX"))            // RFC3339
    )
    // DateTime-at-rest is second precision: the reference formats
    // "2006-01-02 15:04:05" before insert (main.go:456), dropping
    // sub-second intentionally. Truncate BEFORE any compare/order.
    date_trunc("second", coalesce((attempts :+ fallback): _*))
  }

  private def js(sub: Column, path: String): Column =
    coalesce(get_json_object(sub, path), lit(""))

  /** Raw JSON line column → full 10-column logs frame.
    * Field mapping table per reference main.go:452-516 (checked against
    * the reference's own review doc, 代码检查报告.md:19-30).
    *
    * One `json_tuple` parse pulls all seven top-level fields out of the
    * full line; the nested extracts then run over the (small) sub-object
    * strings. The previous formulation called `get_json_object` on the
    * whole line once per output column — ten full Jackson parses per
    * event — and normalize dominated ingest (58k → 16k EPS measured at
    * sf0.1). Same null/missing semantics: both forms yield null for
    * absent fields and raw JSON text for object-valued ones.
    */
  def normalize(df: DataFrame, column: String = "value",
                ingestTs: Column = current_timestamp()): DataFrame = {
    val raw = col(column)
    df.select(raw.as("raw_json"),                                // T8 (main.go:508-511)
        json_tuple(raw, "@timestamp", "message", "container", "host",
          "docker", "agent", "log")
          .as(Seq("ts0", "msg0", "cont0", "host0", "docker0", "agent0", "log0")))
      .select(
        coerceTimestamp(col("ts0"), ingestTs)
          .cast("timestamp_ntz").as("timestamp"),
        coalesce(col("msg0"), lit("")).as("message"),
        // T3 — container := container.name ?? container.id (main.go:462-468)
        coalesce(get_json_object(col("cont0"), "$.name"),
                 get_json_object(col("cont0"), "$.id"), lit("")).as("container"),
        js(col("host0"), "$.name").as("host_name"),              // T4 (main.go:471-475)
        js(col("docker0"), "$.container.id").as("docker_container_id"), // T5 (main.go:478-487)
        js(col("docker0"), "$.container.name").as("docker_container_name"),
        js(col("agent0"), "$.name").as("agent_name"),            // T6 (main.go:490-497)
        js(col("agent0"), "$.version").as("agent_version"),
        js(col("log0"), "$.file.path").as("log_file_path"),      // T7 (main.go:500-506)
        col("raw_json"))
  }

  /** T2 — render at second precision for sink-string parity
    * (main.go:456 `"2006-01-02 15:04:05"`).
    */
  def formatForSink(ts: Column): Column =
    date_format(ts, "yyyy-MM-dd HH:mm:ss")
}
