package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool (round 20, VERDICT r19 #1): the two-level seeding A/B —
  * time [[graft.ext.Similarity.assignCells]] (single-level: one
  * cells×dim literal expression) vs [[graft.ext.Similarity.assignCells2L]]
  * (block-decomposed: ⌈√K⌉ expressions of ≤⌈√K⌉×dim literals each) at
  * cell counts straddling the ~1k single-level edge, on the derived
  * 10× embeddings corpus. Two reps per variant: rep 1 carries the
  * generated-code compilation cost (the quantity the edge is about),
  * rep 2 the steady per-row cost. The printed checksum
  * (sum cell_id, sum cos_centroid) must be IDENTICAL across variants —
  * the associativity equivalence observed at the scale point, not just
  * at spec scale. Usage:
  *   runMain graft.tools.TimeSeed2L [sfDir] [cellsCsv]
  */
object TimeSeed2L {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/repo/target/scale/sf1.0x"
    val cellsList =
      if (args.length > 1) args(1).split(",").map(_.toInt).toSeq else Seq(512, 1024, 2048)
    val spark = Smoke.session("32")
    graft.SparkEntry.queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")
      .write.format("noop").mode("overwrite").save()
    val e = graft.Tables.embeddings(spark, dir)
    for (c <- cellsList) {
      val cents = graft.ext.Similarity.seedCentroids(e, c)
      val variants = Seq(
        "1L" -> (() => graft.ext.Similarity.assignCells(e, cents)),
        "2L" -> (() => graft.ext.Similarity.assignCells2L(e, cents)),
        "K " -> (() => graft.ext.Similarity.assignCellsKernel(e, cents)))
      for ((label, mk) <- variants; rep <- 1 to 2) {
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        val row = mk().agg(
          sum(col("cell_id")).as("sum_cell"),
          round(sum(col("cos_centroid")), 4).as("sum_cos")).collect()(0)
        println(f"[seed2l] cells=$c $label rep$rep: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
          s" checksum=(${row.getLong(0)}, ${row.getDouble(1)})")
      }
    }
    spark.stop()
  }
}
