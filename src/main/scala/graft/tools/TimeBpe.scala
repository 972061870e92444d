package graft.tools

/** Dev tool (round 15, VERDICT r14 #7): time the BPE train+apply
  * pipeline at an arbitrary merge count, so the "cost is corpus-scan +
  * row-local application, flat in merges" claim carries a measured
  * 64-vs-256 curve instead of a single 64-merge point. Usage:
  *   runMain graft.tools.TimeBpe <nMerges> [sfDir] [reps]
  */
object TimeBpe {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) {
      System.err.println("usage: runMain graft.tools.TimeBpe <nMerges> [sfDir] [reps]")
      sys.exit(2)
    }
    val n = args(0).toInt
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Smoke.session("32")
    (1 to reps).foreach { i =>
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      graft.ext.TextAnalysis.bpeTokenCounts(spark, dir, n)
        .write.format("noop").mode("overwrite").save()
      println(f"bpe n=$n rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
