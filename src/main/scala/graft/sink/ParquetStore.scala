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

  /** Every store write runs with INT64 (TIMESTAMP_MICROS) parquet
    * timestamps: Spark's default INT96 is a deprecated type parquet
    * collects NO min/max statistics for, which silently voids the
    * store's entire ORDER BY parity — a time predicate cannot skip a
    * single row group over stat-less timestamps (caught by the z-order
    * pruning spec: the time leg scanned everything). Scoped to the
    * write and restored, so a caller's session conf is untouched.
    */
  private val writeLock = new Object

  private def withMicrosTimestamps[T](spark: SparkSession)(body: => T): T =
    // serialized across store writers: two concurrent foreachBatch
    // writers in one session share the SQLConf, and writer A's restore
    // racing writer B's write would land B's files as stat-less INT96 —
    // exactly the degradation this helper exists to prevent (review
    // r12). Store writes are heavy jobs; one JVM lock around them is
    // noise, and non-store writers never touch this key.
    writeLock.synchronized {
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, "TIMESTAMP_MICROS")
      try body
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }

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
    val partCols = if (daily) Seq(PartitionCol, DayCol) else Seq(PartitionCol)
    // partition cols lead the sort for the same reason as in [[compact]]:
    // the planned write otherwise stacks its own Sort(partitionCols) on
    // top and EliminateSorts drops the timestamp sort entirely, leaving
    // row groups in arrival order with useless min/max stats
    withMicrosTimestamps(parted.sparkSession) {
      parted
        .sortWithinPartitions(partCols.map(col) :+ col("timestamp"): _*)
        .write.mode("overwrite")
        .partitionBy(partCols: _*)
        .parquet(s"$path/$BatchCol=$batchId")
    }
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
  /** `zorderBy = Some(col)` switches the within-partition sort from the
    * 1-D timestamp order to the Z-order (Morton) key over (`col` mod
    * 256, minute-of-day mod 256) — the exact key
    * [[graft.queries.LogQueries.eventsZOrderKey]] computes, applied to
    * the store layout it was designed for. The 1-D sort is ideal for
    * time windows but useless for `user = ?` without a time bound;
    * under the Z layout each parquet row group covers one curve
    * quadrant, so min/max stats prune on EITHER predicate — the layout
    * decision that matters when one 100 TB table serves both query
    * shapes (StreamingSpec asserts both prunings against the same
    * data). `col` must be numeric: the mod-256 cell is order-preserving
    * exactly when the id domain is dense, which is also when row-group
    * min/max stats can discriminate it.
    */
  def compact(spark: SparkSession, path: String, destPath: String,
              filesPerPartition: Int = 1, upToBatchId: Option[Long] = None,
              zorderBy: Option[String] = None): Unit = {
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
    val sortKey = zorderBy match {
      case None => col("timestamp")
      case Some(c) => graft.queries.LogQueries.mortonKey(
        pmod(col(c).cast("long"), lit(256L)),
        pmod(hour(col("timestamp")) * 60 + minute(col("timestamp")), lit(256)).cast("long"))
    }
    // The sort MUST lead with the partition columns: Spark's planned
    // write requires the data ordered by them and otherwise inserts its
    // OWN Sort(partitionCols) above this one — at which point the
    // optimizer's EliminateSorts removes ours as redundant and the
    // files land in shuffle-arrival order, silently discarding the
    // clustering this compaction exists to produce (caught by the
    // z-order row-group pruning spec; the 1-D timestamp sort was being
    // dropped the same way). With the partition columns as a prefix,
    // the writer's requirement is already satisfied and no extra sort
    // is planned.
    withMicrosTimestamps(spark) {
      parted
        .sortWithinPartitions(keyCols :+ sortKey: _*)
        .write.mode("overwrite")
        .partitionBy(partCols: _*)
        .parquet(destPath)
    }
  }

  /** TTL expiry — the analogue of ClickHouse `TTL timestamp + INTERVAL
    * … DELETE`, the standard retention policy on MergeTree log tables
    * (the reference's month partitioning, init.sql:21, exists largely
    * to make exactly this cheap). Drops every TIME PARTITION whose
    * month (or day, in the daily layout) is strictly older than
    * `cutoffYm`/`cutoffDay` — a directory delete per expired partition,
    * never a data rewrite, so expiring a month of a 100 TB store costs
    * file-system metadata operations only. Rows inside a partition that
    * straddles the cutoff are KEPT (partition granularity — exactly
    * ClickHouse's TTL-by-partition behavior); a finer cutoff wants the
    * daily layout, which is why it exists.
    *
    * Safe under concurrent appends by the same argument as [[compact]]:
    * expiry only ever removes time-partition directories wholly OLDER
    * than the cutoff, while live batches write current-time partitions;
    * a replayed old batch would re-create an expired directory, which
    * the NEXT expiry cycle removes again (retention is a repeating
    * background job, not a one-shot).
    *
    * Works on BOTH store shapes: the live ingest root (ym dirs nested
    * under `bid=N` batch dirs) and a [[compact]]ed generation root
    * (`ym=...` directly at the top level — no bid layer). Round 8: the
    * bid-only walk silently skipped compacted roots, leaving the
    * documented compact-then-swap flow with no retention path.
    *
    * Returns EVERY directory removed — expired (bid, ym[, d]) leaves
    * plus any ym/bid parents dropped by the emptied-dir cleanup — for
    * the caller's audit log.
    */
  def expire(spark: SparkSession, path: String, cutoffYm: String,
             cutoffDay: Option[String] = None): Seq[String] = {
    require(cutoffYm.matches("\\d{6}"), "cutoffYm must be yyyyMM")
    cutoffDay.foreach(d => require(d.matches("\\d{8}"), "cutoffDay must be yyyyMMdd"))
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Seq.empty
    val removed = scala.collection.mutable.ArrayBuffer.empty[String]

    // expire every ym child of one scope dir; audit entries are
    // prefixed with the scope's name ("bid=N/" or "" for the root)
    def expireScope(scopeDir: org.apache.hadoop.fs.Path, prefix: String): Unit =
      fs.listStatus(scopeDir).map(_.getPath)
        .filter(_.getName.startsWith(s"$PartitionCol=")).foreach { ymDir =>
          val ym = ymDir.getName.stripPrefix(s"$PartitionCol=")
          if (ym < cutoffYm) {
            fs.delete(ymDir, true)
            removed += s"$prefix${ymDir.getName}"
          } else cutoffDay.foreach { cd =>
            // same-or-newer month: expire by day leaf when the daily
            // layout is present and a day cutoff was requested. A
            // MONTHLY-layout month has no d= children — its partition
            // granularity is the month, so a day cutoff cannot expire
            // inside it and the whole directory must be KEPT (the
            // straddling-partition contract above). Distinguishing the
            // layouts by observed d= leaves BEFORE deleting anything is
            // what keeps the emptied-month cleanup from wiping a live
            // monthly dir whose only children are parquet files.
            val dayLeaves = fs.listStatus(ymDir).map(_.getPath)
              .filter(_.getName.startsWith(s"$DayCol="))
            if (dayLeaves.nonEmpty) {
              dayLeaves.foreach { dDir =>
                val d = dDir.getName.stripPrefix(s"$DayCol=")
                if (d < cd) {
                  fs.delete(dDir, true)
                  removed += s"$prefix${ymDir.getName}/${dDir.getName}"
                }
              }
              // a month emptied leaf-by-leaf must go too: Spark's
              // partition discovery tolerates empty dirs, but they
              // accumulate forever on a long-lived store (only
              // partition children count — _SUCCESS markers remain)
              if (!fs.listStatus(ymDir).exists(_.getPath.getName.startsWith(s"$DayCol="))) {
                fs.delete(ymDir, true)
                removed += s"$prefix${ymDir.getName}"
              }
            }
          }
        }

    val bidDirs = fs.listStatus(root).map(_.getPath)
      .filter(_.getName.startsWith(s"$BatchCol="))
    bidDirs.foreach { bidDir =>
      expireScope(bidDir, s"${bidDir.getName}/")
      // drop a batch dir only when THIS pass emptied it of time
      // partitions; an always-empty marker dir (e.g. a zero-row batch
      // holding just _SUCCESS) is live metadata, not expired data
      if (removed.exists(_.startsWith(s"${bidDir.getName}/")) &&
          !fs.listStatus(bidDir).exists(_.getPath.getName.startsWith(s"$PartitionCol="))) {
        fs.delete(bidDir, true)
        removed += bidDir.getName
      }
    }
    // compacted generation root: ym dirs live directly under the root
    // (never deletable itself — it IS the store)
    if (bidDirs.isEmpty) expireScope(root, "")
    removed.toSeq
  }

  /** Generation manifests — the READ-side counterpart of [[compact]]'s
    * snapshot bound (round 13, VERDICT r12 task 9), completing the
    * MergeTree parity: ClickHouse readers hold a consistent part set
    * for a query's lifetime while background merges run; here a
    * manifest freezes the exact FILE list of a store state so a reader
    * opened against it sees those rows and only those rows across
    * concurrent APPENDS (new bids) and COMPACTIONS (which write a new
    * root and leave the old files in place until the swap). Files, not
    * directories: a replayed batch OVERWRITES its bid dir with new
    * file names, so a dir-level pin would silently serve the post-pin
    * rewrite; the file-level pin instead fails LOUDLY
    * (FileNotFoundException) if a pinned batch is replayed under it —
    * a replay of bid ≤ pin is the one churn the pin detects rather
    * than isolates, and at-least-once engines only replay UNCOMMITTED
    * batches, which a reader should never pin in the first place.
    *
    * Layout: `_manifests/gen-<id>.manifest` under the store root — the
    * leading underscore keeps parquet discovery from ever scanning the
    * manifests as data. Line 1 is `upToBatchId=<id>`; each further
    * line is one absolute parquet file path. Both the live bid layout
    * (files under `bid=N` with N ≤ id) and a [[compact]]ed generation
    * root (no bid layer — every file belongs) can be manifested, so
    * the swap protocol becomes: manifest the new root, let new readers
    * open it, and drop the old root only when its last pinned reader
    * closes.
    */
  def writeGenerationManifest(spark: SparkSession, path: String, upToBatchId: Long): String = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val rootUri = root.toUri.getPath
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      val p = f.getPath
      val name = p.getName
      // hidden-segment rule matches Spark's InMemoryFileIndex: a file
      // under ANY '_'/'.'-prefixed directory (committer _temporary
      // attempt dirs of an in-flight write, _manifests itself) must
      // never be pinned — a manifest taken mid-commit would otherwise
      // capture temp paths the job commit immediately moves away
      // (review r13)
      val relSegments = p.toUri.getPath.stripPrefix(rootUri).split('/')
      val hidden = relSegments.exists(s => s.startsWith("_") || s.startsWith("."))
      if (!hidden && name.endsWith(".parquet")) {
        // a file under a bid=N segment belongs iff N parses AND
        // N <= upToBatchId (an unparseable bid= value is excluded,
        // matching [[compact]]'s snapshot filter — ADVICE r13: the two
        // generation-bound paths must judge a malformed layout the same
        // way); a file with no bid segment (compacted root) always
        // belongs
        val bidSeg = p.toString.split('/').find(_.startsWith(s"$BatchCol="))
        val belongs = bidSeg match {
          case None      => true
          case Some(seg) => seg.stripPrefix(s"$BatchCol=").toLongOption.exists(_ <= upToBatchId)
        }
        if (belongs) files += p.toString
      }
    }
    require(files.nonEmpty, s"no parquet files with $BatchCol<=$upToBatchId under $path")
    val manifest = new org.apache.hadoop.fs.Path(root, s"_manifests/gen-$upToBatchId.manifest")
    val out = fs.create(manifest, true)
    try out.write((s"upToBatchId=$upToBatchId\n" + files.sorted.mkString("\n") + "\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    manifest.toString
  }

  /** Open a reader PINNED to a generation manifest: scans exactly the
    * manifested files (basePath keeps bid/ym/d partition-column
    * discovery intact), so concurrent appends, batch replays, and
    * compact-then-swap cycles cannot change what this reader sees —
    * StreamingSpec asserts row identity across a concurrent compact
    * plus a post-pin append.
    *
    * Concurrency (ADVICE r14 — the assumption now lives on the PUBLIC
    * lifecycle API, not only on the drop's internals): pin creation
    * ([[writeGenerationManifest]]), release ([[releaseGeneration]]),
    * and teardown ([[dropRootIfUnpinned]]) must be serialized through
    * ONE coordinator. A plain filesystem has no compare-and-swap, so a
    * pin racing an in-flight drop on a shared store is undetectable —
    * the same single-writer assumption [[appendBatch]]'s bid-overwrite
    * replay contract already makes.
    */
  def openGeneration(spark: SparkSession, path: String, genId: Long): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val manifest = new org.apache.hadoop.fs.Path(root, s"_manifests/gen-$genId.manifest")
    require(fs.exists(manifest), s"no manifest for generation $genId under $path")
    val in = fs.open(manifest)
    val lines =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
      finally in.close()
    require(lines.headOption.exists(_ == s"upToBatchId=$genId"),
      s"manifest header mismatch for generation $genId")
    val files = lines.tail.filter(_.nonEmpty)
    spark.read.option("basePath", path).parquet(files: _*)
  }

  /** Release a generation pin: delete its manifest file. The
    * compact-then-swap lifecycle's reader-side contract — a reader
    * that opened [[openGeneration]] releases when done, and
    * [[dropRootIfUnpinned]] may then tear the superseded root down.
    * Single-coordinator assumption: see [[openGeneration]].
    */
  def releaseGeneration(spark: SparkSession, path: String, genId: Long): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(root, s"_manifests/gen-$genId.manifest"), false)
  }

  /** The swap protocol's FINAL leg (round 14), mechanized:
    * [[writeGenerationManifest]]'s scaladoc promises "drop the old
    * root only when its last pinned reader closes" — this is that
    * drop. The root is deleted IFF
    *
    *   1. no manifest file exists under its `_manifests` — a manifest
    *      only ever references files under its OWN root, so PRESENCE
    *      is the pin check: no parsing, and a zero-byte or
    *      half-written manifest (a crashed [[writeGenerationManifest]])
    *      counts as pinned rather than crashing the drop or, worse,
    *      being judged unpinned (review r14); and
    *   2. every `bid=` directory parses to a batch id ≤ `migratedUpTo`
    *      (the bound the surviving root was compacted/migrated up to):
    *      a committed append that RACED the swap lives only here, and
    *      deleting it would contradict the K3 "racing batches survive"
    *      contract — the caller migrates it (another [[compact]] leg)
    *      and retries. An UNPARSEABLE bid value also refuses (the
    *      loud-safe polarity: [[writeGenerationManifest]] EXCLUDES
    *      malformed bids from a pin, but exclusion from deletion means
    *      refusal).
    *
    * Refusal is always the safe default; returns true iff the root was
    * dropped. Pure FS lifecycle (no Spark job), same tier as
    * [[expire]]. Concurrency: the check-then-delete is NOT atomic —
    * run drops from the same coordinator that serves pin requests (a
    * pin racing the delete on a shared store cannot be detected on a
    * plain filesystem; the same single-writer assumption
    * [[appendBatch]]'s bid-overwrite already makes).
    */
  def dropRootIfUnpinned(spark: SparkSession, path: String,
      migratedUpTo: Long): Boolean = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return false
    val mdir = new org.apache.hadoop.fs.Path(root, "_manifests")
    val pinned = fs.exists(mdir) && fs.listStatus(mdir).nonEmpty
    val unmigrated = !pinned && fs.listStatus(root).map(_.getPath.getName).exists { n =>
      n.startsWith(s"$BatchCol=") &&
        n.stripPrefix(s"$BatchCol=").toLongOption.forall(_ > migratedUpTo)
    }
    if (pinned || unmigrated) false
    // Re-check the pin listing IMMEDIATELY before the recursive delete
    // (ADVICE r14): the bid scan above takes a full root listing, so a
    // same-coordinator pin that slipped in behind the first check (a
    // misuse of the single-writer contract, but a cheap one to absorb)
    // still refuses here; the remaining race window is one FS
    // round-trip wide instead of listing-plus-scan wide.
    else if (fs.exists(mdir) && fs.listStatus(mdir).nonEmpty) false
    else { fs.delete(root, true); true }
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
