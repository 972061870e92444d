package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational operator inventory (SURVEY.md §2B) over the TPC-H-ish
  * testdata. Each method is a pure `(SparkSession, sfDir) => DataFrame`
  * and has a matching DuckDB oracle in [[graft.SparkEntry.oracleSql]].
  *
  * Determinism conventions (required for the driver's hash compare):
  *   - every query ends in a total ORDER BY over a unique key set;
  *   - every floating-point aggregate is `round(_, n)` in BOTH engines,
  *     so partial-aggregation order differences between Spark and DuckDB
  *     cannot flip the last bit;
  *   - NULL ordering is pinned (Spark default = NULLS FIRST for ASC;
  *     DuckDB default = NULLS LAST, so oracles say NULLS FIRST explicitly).
  *
  * Scale notes (the 100 TB design point) are on each query: which side
  * broadcasts, where the shuffles are, what AQE is expected to do.
  */
object Relational {

  /** Q1 — pricing summary (TPC-H Q1 shape). Full scan + hash aggregate.
    * Scale: partial+final HashAggregate (map-side combine) on 6 groups —
    * shuffle is 6 rows/partition regardless of input size. Filter and
    * 7-column projection push to the parquet scan.
    */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** Q2 — filter + projection pushdown. Only 4 columns reach the scan
    * (`ReadSchema`), shipdate range lands in `PushedFilters`.
    */
  def q2FilterProject(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01") &&
              col("l_shipdate") <  lit("1995-02-01") &&
              col("l_returnflag") === lit("R"))
      .select(col("l_orderkey"), col("l_linenumber"),
              // no round here: row-level IEEE arithmetic is bit-identical
              // across engines; rounding would ADD boundary sensitivity
              (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  /** Q3 — top-N: ORDER BY .. DESC LIMIT k lowers to TakeOrderedAndProject
    * (per-partition heap + driver merge — no full sort, no shuffle).
    */
  def q3TopNOrders(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").asc)
      .limit(10)

  /** Q4 — star join: revenue per region/nation (TPC-H Q5 shape).
    * Scale: region(5)/nation(25) are broadcast (explicit hint); at 100 TB
    * customer⋈orders and orders⋈lineitem stay shuffled sort-merge joins on
    * their keys and AQE handles skew. Aggregation is partial+final.
    */
  def q4StarJoinRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val o  = Tables.orders(spark, dir)
    val c  = Tables.customer(spark, dir)
    val n  = broadcast(Tables.nation(spark, dir))
    val r  = broadcast(Tables.region(spark, dir))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
              col("o_orderdate") <  lit("1997-01-01"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Q5 — outer join: every customer with order count/total (kept when 0).
    * Scale: both sides large → shuffled sort-merge left join on custkey.
    */
  def q5LeftJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir)
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_mktsegment"))
      .agg(count(col("o_orderkey")).as("n_orders"),
           round(coalesce(sum(col("o_totalprice")), lit(0.0)), 2).as("total_spent"))
      .orderBy(col("c_custkey"))
  }

  /** Q6 — semi/anti join (EXISTS / NOT EXISTS). */
  def q6SemiAntiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withOrders = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("n")).select(lit("with_orders").as("kind"), col("n"))
    val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("n")).select(lit("without_orders").as("kind"), col("n"))
    withOrders.unionByName(without).orderBy(col("kind"))
  }

  /** Q7 — distinct aggregates. Scale: two count-distincts expand to a
    * two-phase aggregate; cardinality-heavy but still partial+final.
    */
  def q7AggDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
           countDistinct(col("l_suppkey")).as("n_supps"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  /** Q8 — window functions: row_number / rank / lag / running sum per
    * supplier ordered by ship date. Scale: one shuffle on l_suppkey; the
    * window sort is per-partition. Unique (suppkey, shipdate, orderkey,
    * linenumber) ordering keeps ranks deterministic.
    */
  def q8WindowFuncs(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(spark, dir)
      .filter(col("l_suppkey") <= lit(10))
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
              col("l_shipdate"), col("l_quantity"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_qty", lag(col("l_quantity"), 1).over(w))
      .withColumn("running_qty", round(sum(col("l_quantity"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2))
      .filter(col("rn") <= lit(20))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Q9 — ROLLUP hierarchy totals. */
  def q9Rollup(spark: SparkSession, dir: String): DataFrame =
    Tables.lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Q10 — CUBE over orders dims. */
  def q10Cube(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(round(sum(col("o_totalprice")), 2).as("sum_price"),
           count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** Q11 — set operations: customers active in 1995 vs 1996. */
  def q11SetOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    def activeIn(y: Int): DataFrame =
      o.filter(year(col("o_orderdate")) === lit(y)).select(col("o_custkey")).distinct()
    val a = activeIn(1995)
    val b = activeIn(1996)
    val rows = Seq(
      ("union",     a.union(b).distinct()),
      ("intersect", a.intersect(b)),
      ("except",    a.except(b)))
    rows.map { case (k, df) => df.agg(count(lit(1)).as("n")).select(lit(k).as("op"), col("n")) }
      .reduce(_.unionByName(_)).orderBy(col("op"))
  }

  /** Q12 — scalar string/date/math function battery (all codegen'd
    * built-ins, no UDFs): stays inside one WholeStageCodegen span.
    */
  def q12ScalarFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .filter(col("p_partkey") <= lit(100))
      .select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_up"),
        lower(col("p_type")).as("type_lo"),
        substring(col("p_name"), 1, 8).as("name8"),
        length(col("p_name")).cast("long").as("name_len"),
        regexp_extract(col("p_type"), "([A-Z]+)", 1).as("first_word"),
        round(sqrt(col("p_retailprice")), 4).as("price_sqrt"),
        round(col("p_retailprice") % lit(7.0), 4).as("price_mod"),
        (col("p_size") * lit(2) + lit(1)).cast("long").as("size2"),
        concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"))
      .orderBy(col("p_partkey"))

  /** Q13 — range (theta) join against a tiny in-memory band dim.
    * Scale: bands are literally constant → BroadcastNestedLoopJoin; the
    * fact side streams through without a shuffle.
    */
  def q13RangeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bands = Seq(
      ("b1_budget", 0.0, 925.0), ("b2_mid", 925.0, 950.0),
      ("b3_high", 950.0, 975.0), ("b4_premium", 975.0, 100000.0)
    ).toDF("band", "lo", "hi")
    Tables.part(spark, dir)
      .join(broadcast(bands),
        col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"),
           round(avg(col("p_retailprice")), 2).as("avg_price"))
      .orderBy(col("band"))
  }

  /** Q14 — date arithmetic + extraction over orders. */
  def q14DateFuncs(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(year(col("o_orderdate")).cast("long").as("y"),
               quarter(col("o_orderdate")).cast("long").as("q"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 2).as("revenue"),
           countDistinct(col("o_custkey")).as("n_custs"))
      .orderBy(col("y"), col("q"))

  /** Q15 — correlated-style aggregation: each order vs its customer's avg
    * (expressed as join against a pre-aggregate; Catalyst broadcasts the
    * aggregate side when small, AQE decides at runtime otherwise).
    */
  def q15JoinAggregate(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val custAvg = o.groupBy(col("o_custkey").as("ck"))
      .agg(avg(col("o_totalprice")).as("cust_avg"))
    o.join(custAvg, col("o_custkey") === col("ck"))
      .filter(col("o_totalprice") > col("cust_avg") * lit(1.5))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_above"))
      .orderBy(col("o_orderpriority"))
  }
}
