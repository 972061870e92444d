package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The shared damped-PageRank message-passing kernel (round 15) — one
  * definition of the iteration both graph faces run (`x_textrank`'s
  * word co-occurrence graph, `x_lexrank`'s document similarity graph),
  * so the two rankings cannot drift arithmetically and the oracle-side
  * twin ([[graft.SparkEntry]]'s loop-generated iteration CTEs) has ONE
  * engine-side counterpart.
  *
  * Semantics (Brin & Page 1998, d = 0.85, fixed iteration count):
  * ENTIRELY integer micro-units — r₀ = 10⁶ per node, per-edge
  * contribution (r·wt) div wdeg(u), update r' = 150000 +
  * (85·Σcontrib) div 100. Integer division remainders are lost
  * identically on both engines, making the whole trajectory
  * hash-gateable (the x_kmeans_scalable determinism lesson). Fixed
  * iterations = a deterministic artifact, no convergence test.
  *
  * Shape: each iteration is one shuffle join keyed on the node column
  * + one hash aggregate — the Pregel message-passing step expressed
  * relationally, the standard way to run PageRank without a graph
  * runtime. At crawl scale you would checkpoint the rank frame between
  * iterations and widen r·wt past int64 (decimal(38,0) or coarser
  * units) once node-count·10⁶ × max-edge-weight approaches 2⁶³ — the
  * iterated join-aggregate SHAPE is the scale contract.
  */
object Graph {

  /** Run `iters` damped-PageRank rounds over a symmetric weighted edge
    * frame with columns (w1, w2, wt: long) — node ids of any orderable
    * type. Returns one row per node with (w, r: long micro-units,
    * wdeg: long). Nodes absent from the edge frame (no adjacency) are
    * absent from the ranking by definition.
    */
  def pageRank(ed: DataFrame, iters: Int = 5): DataFrame = {
    val deg = ed.groupBy(col("w1")).agg(sum(col("wt")).as("wdeg"))
    val edges = ed.join(deg, "w1")
    var rank = deg.select(col("w1").as("w"), lit(1000000L).as("r"))
    for (_ <- 1 to iters) {
      val contrib = edges.join(rank, edges("w1") === rank("w"))
        .groupBy(col("w2")).agg(sum(expr("r * wt DIV wdeg")).as("contrib"))
      rank = deg.select(col("w1").as("w"))
        .join(contrib.select(col("w2").as("w"), col("contrib")), Seq("w"), "left")
        .select(col("w"),
          (lit(150000L) + expr("85 * coalesce(contrib, 0L) DIV 100")).as("r"))
    }
    rank.join(deg.select(col("w1").as("w"), col("wdeg")), "w")
  }
}
