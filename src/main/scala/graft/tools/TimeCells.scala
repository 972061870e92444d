package graft.tools

/** Dev tool (round 17, VERDICT r16 #3): the cells-growth A/B — time
  * the within-cell quadratic faces at cells = 16 vs a raised cell
  * count on the same corpus, recording the quadratic-vs-linear read
  * that motivates [[graft.ext.Similarity.cellsFor]]. Each timing
  * clears caches first (the standalone bench shape: the seedAssigned
  * memo would otherwise let the second variant ride the first's
  * assignment frame). Usage:
  *   runMain graft.tools.TimeCells [sfDir] [cellsB]
  */
object TimeCells {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cellsB = if (args.length > 1) args(1).toInt else 64
    val spark = Smoke.session("32")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    def time(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      graft.ext.Dedup.releaseCaches()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[timecells] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    for (c <- Seq(16, cellsB)) {
      time(s"lexrank_exact cells=$c")(graft.ext.Similarity.lexRank(spark, dir, cells = c))
      time(s"knn_consistency cells=$c")(
        graft.ext.Similarity.knnLabelConsistency(spark, dir, cells = c))
      time(s"lexrank_graph cells=$c")(graft.ext.Similarity.lexRankGraph(spark, dir, cells = c))
      // round 19 (VERDICT r18 #4): the steepest measured production
      // slope — NSW's within-cell graph build (~n²/c pair mass until
      // the cellsFor floor crossover at n = 262k) — timed under the
      // floor schedule vs a raised cell count
      time(s"nsw cells=$c")(graft.ext.Similarity.nswSearch(spark, dir, cells = c))
    }
    spark.stop()
  }
}
