package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: time the shared PageRank kernel at different iteration
  * counts, with and without per-iteration lineage checkpointing — the
  * measurement behind the BASELINE iters-linearity note (VERDICT r15
  * task 4). Runs on a deterministic synthetic graph (no fixture
  * dependency) so the timing isolates the kernel's join+aggregate
  * rounds. Usage:
  *   runMain graft.tools.TimeGraph [nNodes] [fanout]
  */
object TimeGraph {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 100000
    val fanout = if (args.length > 1) args(1).toInt else 5
    val spark = Smoke.session("32")
    import spark.implicits._
    // ring-lattice graph: node i → (i+1 .. i+fanout) mod n, symmetric,
    // weights 1..10 by id — deterministic, ~2·n·fanout edges
    val half = spark.range(n).select(col("id").as("w1"),
        explode(expr(s"sequence(1, $fanout)")).as("d"))
      .select(col("w1"), ((col("w1") + col("d")) % n).as("w2"),
        (col("w1") % 10 + 1).as("wt"))
    val ed = half.unionByName(half.select(col("w2").as("w1"),
      col("w1").as("w2"), col("wt"))).persist()
    ed.count() // materialize the input out of every timing
    def time(iters: Int, ck: Boolean): Double = {
      val t0 = System.nanoTime()
      graft.ext.Graph.pageRank(ed, iters, checkpointRanks = ck)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    time(2, ck = false) // warm the JVM/codegen paths
    Seq(5, 10, 20).foreach { it =>
      val raw = time(it, ck = false)
      val ckd = time(it, ck = true)
      println(f"[timegraph] n=$n fanout=$fanout iters=$it raw=$raw%.2f s checkpointed=$ckd%.2f s")
    }
    spark.stop()
  }
}
