package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (round 20, VERDICT r19 #4): the ingest-path scale point —
  * replay the events corpus at 1× (sf0.1, 100k events) and 10× (the
  * derived corpus, 1M events) through BOTH ingest shapes and record
  * EPS plus checkpoint/store growth:
  *
  *   - `batch_pipeline`: decode → normalize → noop (the bench's own
  *     EPS definition, [[graft.Bench.timedIngestEps]]) — the pure
  *     pipeline cost with no sink.
  *   - `stream_store_sink`: NDJSON text files → streaming file source
  *     → decode → normalize → the exactly-once partitioned parquet
  *     store ([[graft.streaming.IngestPipeline.start]], AvailableNow)
  *     — the production shape, including the store's yyyyMM partition
  *     fan-out and the streaming checkpoint. The JDBC leg stays off:
  *     it is at-least-once by the reference's own contract and its
  *     embedded-Derby stand-in would measure Derby, not the pipeline.
  *
  * The adjudication question this answers: does EPS hold when the
  * store's partition count and the file-source backlog both 10×?
  * Usage: runMain graft.tools.TimeIngestScale [sfDir ...]
  */
object TimeIngestScale {
  def main(args: Array[String]): Unit = {
    val dirs =
      if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/root/repo/target/scale/sf1.0x")
    val spark = Smoke.session("32")
    graft.Bench.warmIngest(spark)
    for (dir <- dirs) {
      val (eps, sec, n) = graft.Bench.timedIngestEps(spark, dir)
      println(f"[ingestscale] $dir batch_pipeline: n=$n sec=$sec%.2f eps=$eps%.0f")

      val base = java.nio.file.Files.createTempDirectory("ingest_scale").toString
      val in = s"$base/in"; val out = s"$base/store"; val ck = s"$base/ckpt"
      graft.Tables.events(spark, dir)
        .select(to_json(struct(col("*"))).as("value"))
        .repartition(32)
        .write.text(in)
      val t0 = System.nanoTime()
      val q = graft.streaming.IngestPipeline.start(spark, graft.streaming.IngestPipeline.Config(
        inputDir = in, parquetDir = out, checkpointDir = ck,
        format = graft.streaming.IngestPipeline.Logstash, availableNow = true))
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9

      def walk(p: java.io.File): Seq[java.io.File] =
        if (p.isDirectory) p.listFiles().toSeq.flatMap(walk) else Seq(p)
      val ckBytes = walk(new java.io.File(ck)).map(_.length()).sum
      val storeFiles = walk(new java.io.File(out))
      val storeBytes = storeFiles.map(_.length()).sum
      val partDirs = storeFiles.map(_.getParent).distinct.size
      println(f"[ingestscale] $dir stream_store_sink: n=$n wall=$wall%.2f s" +
        f" eps=${n / wall}%.0f ckpt_kb=${ckBytes / 1024} store_mb=${storeBytes / 1024 / 1024}" +
        s" store_leaf_dirs=$partDirs")
    }
    spark.stop()
  }
}
