package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: break the ingest EPS path into stages. */
object ProfileIngest {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Smoke.session("32")
    import graft.streaming.IngestPipeline
    val lines = graft.Tables.events(spark, dir)
      .select(to_json(struct(col("*"))).as("value"))
      .persist()
    val n = lines.count()
    def eps(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[ingest] $label: $sec%.2f s, ${n / sec}%.0f eps")
    }
    eps("noop passthrough")(lines.write.format("noop").mode("overwrite").save())
    eps("decode only")(IngestPipeline.decode(lines, IngestPipeline.Logstash)
      .write.format("noop").mode("overwrite").save())
    eps("decode+normalize")(IngestPipeline.runBatch(lines, IngestPipeline.Logstash)
      .write.format("noop").mode("overwrite").save())
    eps("decode+normalize again")(IngestPipeline.runBatch(lines, IngestPipeline.Logstash)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
