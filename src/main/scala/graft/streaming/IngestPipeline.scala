package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ingest.{BulkDecoder, EventParser, Normalize}
import graft.sink.{JdbcConfig, JdbcLogsSink, ParquetStore}

/** The end-to-end streaming ingest pipeline — Spark twin of the
  * reference's whole converter (SURVEY.md §3.1): source → decode →
  * normalize → dual sink, with micro-batches standing in for HTTP
  * request batches.
  *
  * The HTTP listener itself is out-of-engine glue (like Filebeat is to
  * the reference); payloads land as NDJSON files in `inputDir` and the
  * file source tails the directory — covering the reference's stub
  * file-tail source (S10, main.go:648-651) with a built-in.
  * Kafka would be `spark.readStream.format("kafka")` with the same
  * downstream stages (stub S8, main.go:628-635).
  */
object IngestPipeline {

  sealed trait WireFormat
  case object Bulk     extends WireFormat  // ES bulk NDJSON  (S1)
  case object Events   extends WireFormat  // JSON-array body (S2)
  case object Logstash extends WireFormat  // fallback chain  (S4)

  final case class Config(
      inputDir: String,
      parquetDir: String,
      checkpointDir: String,
      format: WireFormat = Bulk,
      jdbc: Option[JdbcConfig] = None,
      availableNow: Boolean = false)

  /** Decode stage — pure DataFrame transform, shared batch/streaming. */
  def decode(lines: DataFrame, format: WireFormat): DataFrame = format match {
    case Bulk     => BulkDecoder.frameBulk(lines)
    case Events   => EventParser.parseJsonArray(lines)
    case Logstash => EventParser.parseLogstash(lines)
  }

  /** Batch form: same stages, finite input — used for replay/backfill
    * (and by the specs to cross-check streaming results).
    */
  def runBatch(lines: DataFrame, format: WireFormat = Bulk): DataFrame =
    Normalize.normalize(decode(lines, format))

  def start(spark: SparkSession, cfg: Config): StreamingQuery = {
    val lines = spark.readStream.text(cfg.inputDir)
    val normalized = runBatch(lines, cfg.format)
    val writer = normalized.writeStream
      .option("checkpointLocation", cfg.checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // Parquet append is idempotent enough under replay for the
        // at-least-once contract the reference also has (main.go:333-338);
        // the JDBC leg inherits the same replay semantics.
        ParquetStore.append(batch, cfg.parquetDir)
        cfg.jdbc.foreach(j => JdbcLogsSink.append(batch, j))
      }
    (if (cfg.availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
