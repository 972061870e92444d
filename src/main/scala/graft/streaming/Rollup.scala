package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained rollup — the Spark rendering of ClickHouse's
  * MATERIALIZED VIEW → SummingMergeTree pattern, which is how MergeTree
  * log tables (the reference's storage, init.sql:20-23) serve per-bucket
  * dashboards without rescanning raw events:
  *
  *   - INSERT-time: each micro-batch is aggregated to PARTIAL
  *     per-(minute, event_type) rows and appended under its own
  *     `bid=<batchId>` directory (overwrite — the store's exactly-once
  *     idempotency, ParquetStore.appendBatch's contract);
  *   - read-time: partials are merged by one more aggregate — exactly
  *     SummingMergeTree's merge-on-read semantics, where unmerged parts
  *     sum on the fly;
  *   - maintenance: [[compact]] collapses accrued partials into one
  *     merged generation, the analogue of the background part merge.
  *
  * Scale: the MV write path shuffles only the BATCH's distinct
  * (minute, type) keys — bounded by time-bucket cardinality, not event
  * volume — and the read path scans partial rows, never raw events.
  * The raw store stays the source of truth; the rollup is derived and
  * rebuildable, so no coordination between the two sinks is needed
  * (same at-least-once + idempotent-write story as the main store).
  */
object Rollup {

  /** Per-batch partial aggregate: one row per (minute, event_type)
    * present in the batch. Pure Dataset function — batch and streaming
    * twins share it (unified API), so the spec can cross-check.
    */
  def minutePartials(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("minute", col("ts")).as("m"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** The foreachBatch sink: aggregate the micro-batch, land the
    * partials under `bid=<batchId>` (replay-idempotent overwrite).
    */
  def appendBatch(events: DataFrame, path: String, batchId: Long): Unit =
    minutePartials(events)
      .write.mode("overwrite")
      .parquet(s"$path/bid=$batchId")

  /** Merge-on-read: sum the partials. `round` only here — partial
    * sums must stay exact until the final merge.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(col("m"), col("event_type"))
      .agg(sum(col("n")).as("n"), round(sum(col("sum_value")), 2).as("sum_value"))

  /** Background-merge analogue: rewrite all partials ≤ `upToBatchId`
    * as ONE merged generation under `bid=<upToBatchId>` in `destPath`,
    * so later replays of the merged batches overwrite harmlessly and
    * newer unmerged batches keep accruing beside it — the same
    * snapshot-bound reasoning as ParquetStore.compact.
    */
  def compact(spark: SparkSession, path: String, destPath: String, upToBatchId: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.stripPrefix("bid=").toLongOption.exists(_ <= upToBatchId))
      .map(_.toString).sorted
    require(dirs.nonEmpty, s"no bid<=$upToBatchId partials under $path")
    spark.read.option("basePath", path).parquet(dirs.toIndexedSeq: _*)
      .groupBy(col("m"), col("event_type"))
      .agg(sum(col("n")).as("n"), sum(col("sum_value")).as("sum_value"))
      .write.mode("overwrite")
      .parquet(s"$destPath/bid=$upToBatchId")
  }
}
