package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: micro-timings isolating the minhash pipeline's cost centers. */
object ProfileMicro {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Smoke.session("32")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[micro] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = graft.Tables.documents(spark, dir)
    time("docs count")(docs.count())
    time("docs count again")(docs.count())
    val raw = graft.ext.Dedup.allShingles(docs)
    time("allShingles 1-task")(raw.count())
    val rawPar = graft.ext.Dedup.allShingles(docs.repartition(32))
    time("allShingles 32-task")(rawPar.count())
    time("allShingles 32-task again")(rawPar.count())
    val g = graft.ext.Dedup.shingles(docs.repartition(32)).persist()
    time("df-capped shingles")(g.count())
    val g2 = g.select(col("doc_id"), col("ng").as("h")) // ng is already the shingle hash
    time("builtin count agg")(g2.groupBy(col("doc_id")).agg(count(lit(1))).count())
    time("builtin min agg")(g2.groupBy(col("doc_id")).agg(min(col("h"))).count())
    time("minhash128 agg")(g2.groupBy(col("doc_id")).agg(graft.functions.GraftFunctions.minhash128(col("h"))).count())
    time("minhash128 agg again")(g2.groupBy(col("doc_id")).agg(graft.functions.GraftFunctions.minhash128(col("h"))).count())
    spark.stop()
  }
}
