package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew mitigation utilities (SURVEY §4 scale notes: "skewed keys →
  * salting or AQE skew-join").
  *
  * AQE's skew-join split handles sort-merge inputs with oversized
  * partitions, but only AFTER a skewed shuffle materializes, and not
  * for aggregation state. Explicit salting is the preemptive form: it
  * never builds the hot partition in the first place, and it works the
  * same on a 1000-executor cluster. The salt is derived per-row, so
  * results are salt-invariant; only the physical distribution changes.
  */
object Skew {

  /** Skew-safe equi-join: the (small) right side is replicated once per
    * salt; the big side's rows — including every row of a hot key — are
    * spread uniformly across `salts` sub-keys. The join then shuffles
    * on (key, salt): a key holding half the table occupies `salts`
    * reducers instead of one. Cost: `salts`× the small side (bounded —
    * this is for small-enough-to-replicate, too-big-or-too-skewed-to-
    * broadcast dimensions).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val smallS = small.withColumn("_salt", explode(typedLit((0 until salts).toArray)))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase salted aggregation: phase 1 computes the aggregate per
    * (key, salt); the caller merges the `salts` partials per key in
    * phase 2 (a second, now-unskewed groupBy on key alone).
    *
    * ONLY for aggregates whose per-salt partials the caller can merge
    * exactly: sums/counts/min/max (re-sum), collect_list/collect_set
    * (flatten), avg via (sum, count) pairs. Holistic aggregates — exact
    * percentile, median, exact distinct counts — are NOT recombinable
    * from per-salt partials; use a mergeable sketch (approx_percentile,
    * HLL) or a full shuffle for those. For aggregates Spark already
    * partial-aggregates map-side, plain groupBy handles skew; this
    * helper exists for buffer-heavy mergeable state (e.g. collect_*)
    * where one hot key would otherwise build its entire state on a
    * single reducer. Spec: ExtSpec "salted groupBy partials".
    */
  def saltedGroupBy(df: DataFrame, key: Column, salts: Int, aggs: Column*): DataFrame =
    df.withColumn("_salt",
        pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
      .groupBy(key, col("_salt"))
      .agg(aggs.head, aggs.tail: _*)

  /** Oracle-checked demo: lineitem ⋈ part on partkey via the salted
    * join (partkey is the classic hot-dimension shape), revenue per
    * brand. Result is identical to the plain join — the oracle IS the
    * plain join — only the shuffle layout differs.
    */
  def saltedJoinQuery(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_partkey").as("pk"), col("l_extendedprice"), col("l_discount"))
    val part = Tables.part(spark, dir).select(col("p_partkey").as("pk"), col("p_brand"))
    saltedJoin(li, part, "pk", salts)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(col("p_brand"))
  }
}
