package graft

import org.apache.spark.sql.functions._

import graft.queries.LogQueries

/** The PushNanosTimestampPredicate optimizer rule: the implied raw-long
  * predicate must reach the scan AND preserve exact boundary semantics
  * for all four comparison operators (floor-division edges are where an
  * off-by-one would silently drop rows).
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("implied raw-nanos predicate reaches the parquet scan") {
    val plan = LogQueries.logsTimeRange(spark, dir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,"), s"no pushed lower bound in:\n$plan")
    assert(plan.contains("LessThan(ts,"), s"no pushed upper bound in:\n$plan")
  }

  test("boundary semantics preserved for >=, >, <, <= on a real event timestamp") {
    val e = Tables.events(spark, dir)
    // pick an actual event's (microsecond-truncated) timestamp as the
    // literal so the equality edge is exercised
    val boundary = e.select(col("ts").cast("string")).orderBy(col("ts")).limit(50)
      .as[String].collect()(25)
    val all = e.select(col("ts").cast("string")).as[String].collect().sorted
    def expected(op: (String, String) => Boolean): Long = all.count(t => op(t, boundary)).toLong
    val cases: Seq[(String, Long)] = Seq(
      (s"ts >= '$boundary'", expected(_ >= _)),
      (s"ts > '$boundary'",  expected(_ > _)),
      (s"ts < '$boundary'",  expected(_ < _)),
      (s"ts <= '$boundary'", expected(_ <= _)))
    cases.foreach { case (pred, want) =>
      val got = e.filter(expr(pred)).count()
      assert(got == want, s"pred [$pred]: got $got want $want")
    }
  }

  test("custom AsOfJoinExec plans via the injected strategy and matches the other formulations") {
    val df = LogQueries.eventsAsofOrdersExec(spark, dir)
    val physical = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix, so the node prints as
    // "AsOfJoin" in the PHYSICAL plan (with the hash exchanges + sorts
    // EnsureRequirements added around it)
    assert(physical.contains("AsOfJoin"), s"custom exec not planned:\n$physical")
    assert(physical.contains("Exchange hashpartitioning"), "expected co-partitioning exchanges")
    val exec = df.select(col("event_id"), col("last_order_date").cast("string"))
      .as[(Long, String)].collect().toMap
    val merge = LogQueries.eventsAsofOrdersMerge(spark, dir)
      .select(col("event_id"), col("last_order_date").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(exec == merge)
  }

  test("merge as-of join matches the join+aggregate formulation") {
    val a = LogQueries.eventsAsofOrders(spark, dir)
      .select(col("event_id"), col("last_order_date").cast("string"))
      .as[(Long, String)].collect().toMap
    val b = LogQueries.eventsAsofOrdersMerge(spark, dir)
      .select(col("event_id"), col("last_order_date").cast("string"))
      .as[(Long, String)].collect().toMap
    assert(a == b)
  }
}
