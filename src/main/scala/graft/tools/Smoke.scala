package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Dev-only smoke runner: prints schema + a few rows per table and runs
  * each SparkEntry query at the given sf. Not part of the driver contract.
  */
object Smoke {
  def session(cpus: String = "8"): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-smoke")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("SPARK_GRAFT_PARFIRST", "true"))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        sys.env.getOrElse("SPARK_GRAFT_ADVISORY", "64MB"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = session()
    Tables.names.foreach { t =>
      val df = Tables.load(spark, dir, t)
      println(s"=== $t ${df.count()} rows")
      df.printSchema()
    }
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      println(s"--- query $name")
      try fn(spark, dir).show(5, false)
      catch { case e: Throwable => println(s"FAILED: $e") }
    }
    spark.stop()
  }
}
