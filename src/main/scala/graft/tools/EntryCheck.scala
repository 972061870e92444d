package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool emulating the driver's smoke check: a PLAIN session (no
  * graft extensions configured) calling SparkEntry.entry and a sample
  * of registry-dependent queries — proves the library self-registers
  * everything it needs and assumes nothing about the caller's session.
  */
object EntryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-entry-check")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows=$n")
    require(n > 0, "driver smoke check would fail: entry() returned no rows")
    Seq("x_sim_topk", "logs_timerange", "events_asof_merge").foreach { q =>
      val c = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001").count()
      println(s"$q rows=$c")
      require(c > 0, s"$q empty on plain session")
    }
    println("ENTRY CHECK OK")
    spark.stop()
  }
}
