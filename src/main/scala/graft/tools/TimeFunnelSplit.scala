package graft.tools

/** Dev tool (round 19 — VERDICT r18 #5): the funnel cost ATTRIBUTION
  * split. `x_filter_funnel` grew 7.7x at the 10x scale point while its
  * own gates are row-local — the hypothesis is that the growth lives
  * entirely in the shared pair-frame/cluster subtree
  * ([[graft.ext.Dedup.verdictsFor]]) that the funnel rides, under the
  * derived corpus's replica-pair density. This times the two halves
  * separately at any scale:
  *   - `verdicts_cold`: the verdictsFor subtree from a flushed state
  *     (pair frame + cluster solve + repetition scores — the shared
  *     chain cost)
  *   - `funnel_increment`: the registered funnel immediately after,
  *     WITHOUT a flush (the keep-warm chain shape) — the quality gate,
  *     decontam probe, first-fail aggregate, and bounded collect the
  *     funnel itself adds
  * Usage: runMain graft.tools.TimeFunnelSplit [sfDir] [reps]
  */
object TimeFunnelSplit {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Smoke.session("32")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    for (r <- 1 to reps) {
      graft.ext.Dedup.releaseCaches()
      spark.catalog.clearCache()
      System.gc()
      val t0 = System.nanoTime()
      graft.ext.Dedup.verdictsFor(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t1 = System.nanoTime()
      // no flush: the funnel prices its own increment over the warm frames
      graft.SparkEntry.queries("x_filter_funnel")(spark, dir)
        .write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[funnelsplit] rep$r verdicts_cold: ${(t1 - t0) / 1e9}%.2f s")
      println(f"[funnelsplit] rep$r funnel_increment: ${(t2 - t1) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
