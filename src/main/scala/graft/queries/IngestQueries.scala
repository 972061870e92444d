package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ingest.{BulkDecoder, EventParser, Normalize, Preprocess}

/** Driver-checkable demonstrations of the §2A ingestion operators.
  *
  * Inputs are inline fixtures (FIXTURES.md §A — the reference's wire
  * formats) rather than the sf tables, with a FIXED ingest-time fallback
  * so results are deterministic; the DuckDB oracles are literal expected
  * rows (golden outputs derived from the reference's semantics,
  * filebeat-to-ck/main.go:255-516). Semantic edge-case coverage beyond
  * these lives in the ScalaTest specs.
  */
object IngestQueries {

  /** Fixed stand-in for `time.Now()` so the never-fail timestamp
    * fallback (main.go:88,106,110) stays deterministic under test.
    */
  private def fixedIngestTs = lit("2025-12-05 00:00:00").cast("timestamp")

  val bulkFixture: Seq[String] = Seq(
    """{"index":{"_index":"filebeat-2025.12.04"}}""",
    """{"@timestamp":"2025-12-04T10:00:00Z","message":"app log line","container":{"name":"app"},"host":{"name":"server1"},"agent":{"name":"filebeat","version":"8.11.0"},"log":{"file":{"path":"/var/lib/docker/containers/abc/abc-json.log"}}}""",
    """{"index":{}}""",
    """{"@timestamp":"2025-12-04T10:01:00.123Z","message":"second line","docker":{"container":{"id":"abc123","name":"app"}}}""",
    """""",
    """{"@timestamp":"2025-12-04 10:02:03","message":"naked doc","container":{"id":"c42"}}""",
    """not json at all""",
    """{"message":"no ts","custom_field":"kept-only-in-raw","service":{"name":"api"}}""",
    """{"delete":null}""",
    """{"@timestamp":"2025-12-04T18:30:00+08:00","message":"offset ts"}""",
    """{"@timestamp":"2025-12-04T10:05:06.123456789Z","message":"nano ts"}"""
  )

  /** P1+P2+P3/P4+T1–T9 end-to-end: bulk NDJSON → framed docs →
    * normalized 10-column rows.
    */
  def bulkNormalize(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val lines = bulkFixture.toDF("value")
    Normalize.normalize(BulkDecoder.frameBulk(lines), ingestTs = fixedIngestTs)
      .orderBy(col("message"))
  }

  /** T1 in isolation: the five accepted layouts + unparseable + absent,
    * each falling through the coalesce chain (main.go:94-111).
    */
  def timestampCoerce(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val inputs = Seq(
      (1L, "2025-12-04T10:00:00Z"),             // RFC3339 zulu
      (2L, "2025-12-04T10:00:00+08:00"),        // RFC3339 offset
      (3L, "2025-12-04T10:00:00.123456789Z"),   // RFC3339Nano
      (4L, "2025-12-04T10:00:00.123Z"),         // millis zulu
      (5L, "2025-12-04 10:00:00"),              // space form
      (6L, "not-a-time"),                       // unparseable → fallback
      (7L, null.asInstanceOf[String])           // absent → fallback
    ).toDF("id", "raw_ts")
    inputs.select(col("id"),
        Normalize.coerceTimestamp(col("raw_ts"), fixedIngestTs)
          .cast("timestamp_ntz").as("ts"))
      .orderBy(col("id"))
  }

  /** S2+S4: array payload + logstash fallback chain + single object,
    * all funneled into the same normalize path.
    */
  def arrayParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val payloads = Seq(
      """[{"@timestamp":"2025-12-04T10:00:00Z","message":"one","host":{"name":"h1"}},{"@timestamp":"2025-12-04 10:00:01","message":"two","fields":{"env":"prod"}}]""",
      """{"@timestamp":"2025-12-04T10:00:02Z","message":"three","custom_field":"kept"}""",
      """totally not json"""
    ).toDF("value")
    Normalize.normalize(EventParser.parseLogstash(payloads), ingestTs = fixedIngestTs)
      .select(col("timestamp"), col("message"), col("host_name"))
      .orderBy(col("message"))
  }

  /** T10 — the Filebeat processor chain (filebeat.yml:13-27) on an
    * inline fixture covering: JSON-message merge with overwrite (incl.
    * the inner doc's own @timestamp winning), non-JSON message
    * passthrough, host metadata gated on the forwarded tag, and the
    * rename's existing-target no-op.
    */
  def preprocessChain(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val docs = Seq(
      (1L, """{"@timestamp":"2025-12-04T10:00:00Z","message":"{\"level\":\"error\",\"message\":\"inner msg\",\"code\":42}","host":{"name":"h1"}}"""),
      (2L, """{"@timestamp":"2025-12-04T10:01:00Z","message":"plain text line"}"""),
      (3L, """{"@timestamp":"2025-12-04T10:02:00Z","message":"fwd line","tags":["forwarded"]}"""),
      (4L, """{"@timestamp":"2025-12-04T10:03:00Z","timestamp":"2025-12-04 09:00:00","message":"has both"}"""),
      (5L, """{"@timestamp":"2025-12-04T10:04:00Z","message":"{\"@timestamp\":\"2025-12-04T12:00:00Z\",\"message\":\"inner wins\"}"}""")
    ).toDF("id", "value")
    Preprocess.preprocess(docs)
      .select(col("id"),
        Normalize.coerceTimestamp(col("doc").getItem("timestamp"), fixedIngestTs)
          .cast("timestamp_ntz").as("ts"),
        coalesce(col("doc").getItem("message"), lit("")).as("message"),
        coalesce(get_json_object(col("doc").getItem("host"), "$.name"), lit("")).as("host_name"),
        coalesce(col("doc").getItem("level"), lit("")).as("level"),
        coalesce(col("doc").getItem("code"), lit("")).as("code"))
      .orderBy(col("id"))
  }
}
