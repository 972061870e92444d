package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The analytics store — Spark analogue of the reference's MergeTree
  * table (clickhouse-init/init.sql:20-23, SURVEY.md §1.3):
  *
  *   PARTITION BY toYYYYMM(timestamp)  →  partitionBy("ym")
  *   ORDER BY (timestamp)              →  sortWithinPartitions(timestamp)
  *   sparse index (granularity 8192)   →  parquet row-group min/max stats
  *
  * Sorting before write means a time-range predicate prunes whole
  * row-groups at scan time — the same skipping behavior ClickHouse gets
  * from its primary key, with zero custom code.
  */
object ParquetStore {

  val PartitionCol = "ym"

  def append(df: DataFrame, path: String): Unit =
    df.withColumn(PartitionCol, date_format(col("timestamp"), "yyyyMM"))
      .sortWithinPartitions(col("timestamp"))
      .write.mode("append")
      .partitionBy(PartitionCol)
      .parquet(path)

  /** Register the store as `logs_table` for spark.sql querying (the
    * reference's query surface, README.md:419-424,516-527).
    */
  def registerView(spark: SparkSession, path: String, view: String = "logs_table"): DataFrame = {
    val df = spark.read.parquet(path).drop(PartitionCol)
    df.createOrReplaceTempView(view)
    df
  }
}
