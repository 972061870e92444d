package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (round 15, VERDICT r14 #6): the Bench's `measureEps` leg,
  * alone, on an idle box — same basis (fresh parquet read + to_json
  * inside the timed write, pre-timed count, System.gc() before the
  * timed section, same warmup on sf0.001), so its number adjudicates
  * the sweep artifacts' EPS drift directly. Usage:
  *   runMain graft.tools.EpsOnly [sfDir] [reps]
  */
object EpsOnly {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Smoke.session("32")
    import graft.streaming.IngestPipeline
    def loadavg1(): Double =
      try {
        val src = scala.io.Source.fromFile("/proc/loadavg")
        try src.mkString.split(" ")(0).toDouble finally src.close()
      } catch { case _: Throwable => -1.0 }
    // the Bench's warmup: JIT the decode+normalize path on sf0.001
    locally {
      val warm = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select(to_json(struct(col("*"))).as("value"))
      IngestPipeline.runBatch(warm, IngestPipeline.Logstash)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    (1 to reps).foreach { i =>
      val l0 = loadavg1()
      val lines = spark.read.parquet(s"$dir/events.parquet")
        .select(to_json(struct(col("*"))).as("value"))
      val n = lines.count()
      System.gc()
      val t0 = System.nanoTime()
      IngestPipeline.runBatch(lines, IngestPipeline.Logstash)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[eps] rep $i: ${n / sec}%.0f eps ($sec%.2f s, loadavg $l0%.2f -> ${loadavg1()}%.2f)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
