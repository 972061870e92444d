package graft.tools

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Dev tool (round 20, VERDICT r19 #2): measured throughput/state for
  * the five heaviest STATEFUL streaming twins — the twins carry spec
  * proofs of correctness and state bounds, but until this round no
  * recorded rows/s, micro-batch duration, or observed state-store
  * size. Replays the given corpus through each twin in `chunks`
  * micro-batches (MemoryStream + processAllAvailable, the spec
  * harness's shape, so batch boundaries are deterministic) and prints
  * one line per twin with wall time, rows/s, mean/max batchDuration
  * from StreamingQueryProgress, and the final state-operator row
  * count — the proven bounds, now observed. Usage:
  *   runMain graft.tools.TimeStreams [sfDir] [chunks]
  */
object TimeStreams {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val chunks = if (args.length > 1) args(1).toInt else 10
    val spark = Smoke.session("32")
    import spark.implicits._
    graft.SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()

    def time[T: Encoder](label: String, data: IndexedSeq[T], mode: String)
        (mk: DataFrame => DataFrame): Unit = {
      val input = MemoryStream[T](spark)
      val q = mk(input.toDF()).writeStream.format("memory")
        .queryName(s"ts_$label").outputMode(mode).start()
      val t0 = System.nanoTime()
      val per = math.max(1, (data.size + chunks - 1) / chunks)
      data.grouped(per).foreach { g => input.addData(g.toSeq: _*); q.processAllAvailable() }
      val wall = (System.nanoTime() - t0) / 1e9
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      val batchMs = prog.map(_.batchDuration)
      val stateRows = prog.lastOption
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      q.stop()
      println(f"[timestreams] $label: rows=${data.size} wall=$wall%.2f s" +
        f" rows_per_s=${data.size / wall}%.0f batches=${batchMs.length}" +
        s" mean_batch_ms=${if (batchMs.nonEmpty) batchMs.sum / batchMs.length else -1}" +
        s" max_batch_ms=${if (batchMs.nonEmpty) batchMs.max else -1}" +
        s" state_rows=$stateRows")
    }

    val docs = graft.Tables.documents(spark, dir)
    val docRows = docs.select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().toIndexedSeq
    val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      .filter(length(col("tok")) > 0).as[String].collect().toIndexedSeq
    val srcText = docs.select(col("source"), col("text"))
      .as[(String, String)].collect().toIndexedSeq
    val langKey = docs.select(col("lang"), col("doc_id").cast("string"))
      .as[(String, String)].collect().toIndexedSeq
    // the standing gate table the nightly batch publishes (the
    // StreamingSpec materialization convention)
    val gates = graft.ext.Dedup.funnelGateFrame(spark, "/root/testdata/sf0.1")
      .select("doc_id", "keep_dedup", "keep_rep", "keep_len",
        "keep_quality", "keep_decontam")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean)].collect().toSeq
    val gatesDf = gates.toDF("doc_id", "keep_dedup", "keep_rep", "keep_len",
      "keep_quality", "keep_decontam")
    graft.ext.Dedup.releaseCaches()
    spark.catalog.clearCache()

    time[Long]("funnel", docRows.map(_._1), "complete")(df =>
      graft.streaming.EventsStream.funnelStream(df.toDF("doc_id"), gatesDf))
    time[String]("heavy_hitters", toks, "update")(df =>
      graft.streaming.EventsStream.heavyHitterCandidates(df.toDF("tok")).toDF())
    time[(String, String)]("kmv_sketch", srcText, "complete")(df =>
      graft.streaming.EventsStream.kmvSketchStream(df.toDF("source", "text")))
    time[(String, String)]("quantile_by_key", langKey, "complete")(df =>
      graft.streaming.EventsStream.quantileLevelByKeyStream(df.toDF("k", "qkey")))
    time[(Long, String)]("neardup", docRows, "append")(df =>
      graft.streaming.EventsStream.nearDupCandidates(df.toDF("doc_id", "text")).toDF())

    spark.stop()
  }
}
