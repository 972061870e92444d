package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** Ack + metrics surface (K4) — the reference's observable outputs:
  *
  *   - per-request ack: `{"took": n, "errors": false, "items": n}`
  *     (main.go:340-344 — a simplified ES bulk response; Filebeat only
  *     checks the status code and `errors`);
  *   - throughput/latency metrics: defined in README.md:387-391 (EPS,
  *     ingest latency, batch efficiency) but never implemented there.
  *     Here they fall out of `StreamingQueryProgress`, which Structured
  *     Streaming tracks per micro-batch for free.
  */
object Metrics {

  /** The reference's ack payload for a batch of `n` events. */
  def ack(n: Long): String =
    s"""{"took":$n,"errors":false,"items":$n}"""

  final case class BatchProgress(
      batch_id: Long,
      num_input_rows: Long,
      input_rows_per_second: Double,
      processed_rows_per_second: Double,
      batch_duration_ms: Long)

  /** Per-batch progress counts for a running/finished query — the EPS
    * and batch-efficiency metrics the reference defines but never
    * measures. One row per retained micro-batch.
    */
  def progress(spark: SparkSession, q: StreamingQuery): DataFrame = {
    import spark.implicits._
    q.recentProgress.toSeq.map { p =>
      BatchProgress(
        p.batchId,
        p.numInputRows,
        zeroIfNaN(p.inputRowsPerSecond),
        zeroIfNaN(p.processedRowsPerSecond),
        Option(p.durationMs.get("triggerExecution")).map(_.longValue()).getOrElse(0L))
    }.toDF()
  }

  private def zeroIfNaN(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d
}
