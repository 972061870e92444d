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

  /** Registered verdict face of the MV rollup (the K3 row's oracle
    * upgrade): the events table is split into four synthetic "batches"
    * by md5 hash, each aggregated by THE sink's [[minutePartials]] (not
    * a copy), the partials merged by the read path's aggregate, and
    * the merged rollup judged against the direct one-pass aggregate —
    * SummingMergeTree's merge-on-read correctness as a computed
    * theorem (the semanticDedupRefinedVerdict convention: the oracle
    * replays the direct aggregate and the verdict as its expected
    * constant, Spark must actually run both paths to say so).
    *
    * `merged_matches` compares exact integer counts and the two
    * rounded sums at one-cent tolerance — partial-merge and direct
    * summation order differ in low bits by design; the tolerance
    * makes the theorem robust without hiding a real mismatch (any
    * miscounted batch is whole events, not 10⁻¹⁰).
    *
    * 100 TB shape: each leg is the MV write path's own bounded
    * aggregate ((minute, type) cardinality, never event volume); the
    * full-outer join runs on rollup-sized frames.
    */
  def mergeVerdict(spark: SparkSession, dir: String, batches: Int = 4): DataFrame = {
    val ev = graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
    val batched = ev.withColumn("bid",
      expr(s"CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 4), 16, 10) AS BIGINT) % $batches"))
    val partials = (0L until batches.toLong)
      .map(b => minutePartials(batched.filter(col("bid") === b)))
      .reduce(_ unionAll _)
    val merged = partials.groupBy(col("m"), col("event_type"))
      .agg(sum(col("n")).as("n_m"), round(sum(col("sum_value")), 2).as("sv_m"))
    val direct = minutePartials(ev)
      .select(col("m"), col("event_type"), col("n"),
        round(col("sum_value"), 2).as("sum_value"))
    direct.join(merged, Seq("m", "event_type"), "full_outer")
      .select(col("m"), col("event_type"), col("n"), col("sum_value"),
        // coalesce → an explicit FALSE for a one-sided group (a lost
        // batch leaves nulls on one side of the full-outer join, and a
        // null verdict would slip past consumers filtering === false —
        // ADVICE r13)
        coalesce(col("n") === col("n_m") &&
          abs(col("sum_value") - col("sv_m")) <= 0.01, lit(false))
          .as("merged_matches"))
      .orderBy(col("m"), col("event_type"))
  }
}
