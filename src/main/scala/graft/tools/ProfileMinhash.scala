package graft.tools

import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timing of the minhash LSH pipeline. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Smoke.session("32")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = graft.Tables.documents(spark, dir)
    val g = graft.ext.Dedup.shingles(docs).persist()
    time("shingles materialize")(println("  g rows: " + g.count()))
    val sig = graft.ext.Dedup.minhashSignatures(g).persist()
    time("signatures")(println("  sig rows: " + sig.count()))
    val rowsPerBand = 4
    val banded = sig.select(col("doc_id"),
      posexplode(expr(s"transform(sequence(0, 31), b -> hash(slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")).as(Seq("band", "bsig"))).persist()
    time("banding")(println("  banded rows: " + banded.count()))
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bsig") === col("b.bsig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .distinct().persist()
    time("candidates")(println("  cand rows: " + cand.count()))
    val n = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n_ng"))
    val shared = cand
      .join(g.select(col("doc_id").as("d1"), col("ng").as("ng1")), "d1")
      .join(g.select(col("doc_id").as("d2"), col("ng").as("ng2")), "d2")
      .filter(col("ng1") === col("ng2"))
      .groupBy(col("d1"), col("d2"))
      .agg(count(lit(1)).as("shared"))
    val out = shared
      .join(n.select(col("doc_id").as("d1"), col("n_ng").as("n1")), "d1")
      .join(n.select(col("doc_id").as("d2"), col("n_ng").as("n2")), "d2")
      .withColumn("jac", col("shared") / (col("n1") + col("n2") - col("shared")))
      .filter(col("jac") >= 0.8)
    time("verify")(println("  pairs: " + out.count()))
    spark.stop()
  }
}
