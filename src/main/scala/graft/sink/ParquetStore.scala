package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytics store — Spark analogue of the reference's MergeTree
  * table (clickhouse-init/init.sql:20-23, SURVEY.md §1.3):
  *
  *   PARTITION BY toYYYYMM(timestamp)  →  partitionBy("ym")
  *   ORDER BY (timestamp)              →  sortWithinPartitions(timestamp)
  *   sparse index (granularity 8192)   →  parquet row-group min/max stats
  *
  * Sorting before write means a time-range predicate prunes whole
  * row-groups at scan time — the same skipping behavior ClickHouse gets
  * from its primary key, with zero custom code.
  */
object ParquetStore {

  val PartitionCol = "ym"
  val DayCol = "d"
  val BatchCol = "bid"

  /** Exactly-once leg for `foreachBatch` (SURVEY §7.3 trap 4): each
    * micro-batch lands in its own `bid=<batchId>` directory with
    * `overwrite` semantics, so a replayed batch REWRITES its directory
    * instead of appending beside the first attempt — at-least-once
    * replay plus an idempotent write = exactly-once store contents.
    * Readers treat `bid` as one more discovered partition column and
    * drop it; time partition pruning still applies underneath (Spark
    * discovers all levels). Directory-per-batch is the standard
    * idempotent-sink pattern and needs no commit log or read-side
    * dedup at any scale.
    *
    * `daily = true` adds a day level under the month (`ym=.../d=...`,
    * SURVEY §7.3 trap 7): at 100 TB a month partition is ~terabytes,
    * far too coarse for the reference's typical day-window queries —
    * day dirs keep pruning proportional to the queried window. A store
    * path must use ONE layout exclusively: mixing monthly and daily
    * dirs under one root breaks Spark's partition discovery (it
    * requires a consistent directory schema).
    */
  def appendBatch(df: DataFrame, path: String, batchId: Long, daily: Boolean = false): Unit = {
    val ym = df.withColumn(PartitionCol, date_format(col("timestamp"), "yyyyMM"))
    val parted =
      if (daily) ym.withColumn(DayCol, date_format(col("timestamp"), "yyyyMMdd"))
      else ym
    parted
      .sortWithinPartitions(col("timestamp"))
      .write.mode("overwrite")
      .partitionBy((if (daily) Seq(PartitionCol, DayCol) else Seq(PartitionCol)): _*)
      .parquet(s"$path/$BatchCol=$batchId")
  }

  /** Compaction — the analogue of MergeTree's background merges
    * (clickhouse-init/init.sql:20-23 relies on ClickHouse doing this
    * continuously): the exactly-once `bid=<id>` layout accrues one
    * directory per micro-batch, so a long-running ingest builds up many
    * small files — the classic small-files problem that degrades scan
    * planning and read throughput at scale. `compact` rewrites all
    * accumulated batches into a fresh generation root with
    * `filesPerPartition` files per time partition, re-sorted by
    * timestamp so parquet row-group min/max stats stay tight (the
    * ORDER BY parity). Two-generation pattern: readers swap to
    * `destPath`, then the old root is dropped.
    *
    * File-count control: hash-repartitioning on the partition columns
    * sends each time partition to exactly one task → one file per dir;
    * `filesPerPartition > 1` adds a hash salt for that many files.
    *
    * Concurrent appends (round 6): an unbounded compact reads WHATEVER
    * the root holds when the scan lists it — a batch the live ingest
    * appends mid-compaction would miss the new generation and be lost
    * at the swap. `upToBatchId` makes the compaction a SNAPSHOT: only
    * `bid <= upToBatchId` directories are consumed, so racing batches
    * (which always carry higher ids) stay untouched in the old root;
    * after readers swap, the at-least-once engine replays those
    * batches against the new root and the bid-overwrite idempotency
    * lands them exactly once — the same mechanism that makes ordinary
    * replay safe. A long-running ingest therefore compacts with
    * `upToBatchId = lastCommittedBatch` on every cycle and never
    * pauses the stream.
    */
  def compact(spark: SparkSession, path: String, destPath: String,
              filesPerPartition: Int = 1, upToBatchId: Option[Long] = None): Unit = {
    require(filesPerPartition > 0, "filesPerPartition must be positive")
    val snapshot = upToBatchId match {
      case None => spark.read.parquet(path)
      case Some(hi) =>
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        val dirs = fs.listStatus(root).map(_.getPath)
          .filter { d =>
            d.getName.startsWith(s"$BatchCol=") &&
              d.getName.stripPrefix(s"$BatchCol=").toLongOption.exists(_ <= hi)
          }
          .map(_.toString).sorted
        require(dirs.nonEmpty, s"no $BatchCol<=$hi directories under $path")
        // basePath keeps the bid/ym/d partition-column discovery intact
        // while scanning only the snapshot's directories
        spark.read.option("basePath", path).parquet(dirs.toIndexedSeq: _*)
    }
    val df = snapshot.drop(BatchCol)
    val partCols = Seq(PartitionCol, DayCol).filter(df.columns.contains)
    val keyCols = partCols.map(col)
    val parted =
      if (filesPerPartition == 1) df.repartition(keyCols: _*)
      else df.repartition(keyCols :+
        pmod(xxhash64(col("timestamp")), lit(filesPerPartition.toLong)): _*)
    parted
      .sortWithinPartitions(col("timestamp"))
      .write.mode("overwrite")
      .partitionBy(partCols: _*)
      .parquet(destPath)
  }

  /** Register the store as `logs_table` for spark.sql querying (the
    * reference's query surface, README.md:419-424,516-527).
    */
  def registerView(spark: SparkSession, path: String, view: String = "logs_table"): DataFrame = {
    val df = spark.read.parquet(path)
      .drop(PartitionCol).drop(DayCol).drop(BatchCol)
    df.createOrReplaceTempView(view)
    df
  }
}
