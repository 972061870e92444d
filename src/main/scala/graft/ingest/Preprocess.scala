package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** T10 — the Filebeat-side processor chain (reference filebeat.yml:13-27),
  * re-expressed schema-on-read over the raw JSON line:
  *
  *   1. `decode_json_fields` (fields: ["message"], target: "",
  *      overwrite_keys: true) — when `message` is itself a JSON object,
  *      its keys merge into the root and WIN on conflict; a
  *      non-JSON message leaves the doc untouched.
  *   2. `add_host_metadata` (when.not.contains.tags: forwarded) — adds
  *      a `host` object when none exists and the doc is not a forward.
  *   3. `rename` @timestamp → timestamp (ignore_missing: true,
  *      fail_on_error: false — so when the target key already exists
  *      the rename errors inside Filebeat and is silently skipped).
  *
  * The doc travels as `map<string,string>`: Spark's JSON reader
  * captures object/array values as their raw JSON text under a string
  * type, so nested structures survive the map representation verbatim
  * and stay queryable with `get_json_object`. All steps are pure
  * codegen'd column ops — no UDFs, no shuffle, row-local at any scale.
  */
object Preprocess {

  private val docType = org.apache.spark.sql.types.MapType(
    org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)

  /** Run the processor chain over a raw-JSON-line column; returns the
    * input frame plus a `doc: map<string,string>` column holding the
    * processed event. `hostName` stands in for add_host_metadata's
    * probe of the local machine — callers pass the real hostname in
    * production; the default is a fixed value so tests and oracle rows
    * stay deterministic.
    */
  def preprocess(df: DataFrame, column: String = "value",
                 hostName: Column = lit("graft-host")): DataFrame =
    df
      .withColumn("doc", from_json(col(column), docType))
      // 1. decode_json_fields: a message that parses as a JSON object
      // merges into the root, message's keys winning (overwrite_keys)
      .withColumn("inner", from_json(col("doc").getItem("message"), docType))
      .withColumn("doc",
        when(col("inner").isNotNull,
          map_concat(
            map_filter(col("doc"), (k, _) => !map_contains_key(col("inner"), k)),
            col("inner")))
          .otherwise(col("doc")))
      .drop("inner")
      // 2. add_host_metadata unless tags contains "forwarded"; Filebeat
      // keeps an existing host, so only absent hosts are filled
      .withColumn("doc",
        when(!map_contains_key(col("doc"), "host") &&
             !coalesce(col("doc").getItem("tags"), lit("")).contains("forwarded"),
          map_concat(col("doc"), map(lit("host"), to_json(struct(hostName.as("name"))))))
          .otherwise(col("doc")))
      // 3. rename @timestamp → timestamp; with fail_on_error:false an
      // existing target key makes the rename a silent no-op
      .withColumn("doc",
        when(map_contains_key(col("doc"), "@timestamp") &&
             !map_contains_key(col("doc"), "timestamp"),
          transform_keys(col("doc"),
            (k, _) => when(k === "@timestamp", lit("timestamp")).otherwise(k)))
          .otherwise(col("doc")))
}
