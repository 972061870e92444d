package graft.tools

/** Dev tool: time one query N times in a single JVM (isolates it from
  * run-order/GC effects in the full bench). Usage:
  *   runMain graft.tools.TimeOne <query> [sfDir] [reps]
  */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val q = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Smoke.session("32")
    val fn = graft.SparkEntry.queries(q)
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      println(f"$q rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
