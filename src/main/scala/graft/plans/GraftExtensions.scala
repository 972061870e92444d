package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule restoring predicate pushdown lost to the
  * TIMESTAMP(NANOS) workaround (see graft.Tables.load).
  *
  * The events table stores ns-epoch longs that Spark can only read as
  * raw Long; queries compare the DERIVED column
  * `timestamp_micros(ts div 1000)` to timestamp literals, so the range
  * predicate cannot reach the parquet scan — the audit showed
  * `PushedFilters: [IsNotNull(ts)]` only, i.e. a full scan under any
  * time filter. Since x ↦ timestamp_micros(x div 1000) is monotonic,
  * every comparison against a literal implies an EXACT raw-long bound:
  *
  *   micros(x div 1000) ≥ L  ⟺  x ≥ L·1000
  *   micros(x div 1000) >  L  ⟺  x ≥ (L+1)·1000
  *   micros(x div 1000) <  U  ⟺  x < U·1000
  *   micros(x div 1000) ≤ U  ⟺  x < (U+1)·1000
  *
  * The rule conjoins the implied raw predicate (keeping the original —
  * semantics unchanged); the new plain-long comparison then pushes to
  * the scan through the stock datasource rules. At 100 TB this is the
  * difference between row-group skipping and a full table scan.
  */
object PushNanosTimestampPredicate extends Rule[LogicalPlan] {

  /** Unwraps casts around `timestamp_micros(x div 1000)` → Some(x). */
  private def rawNanos(e: Expression): Option[Expression] = e match {
    case c: Cast => rawNanos(c.child)
    case MicrosToTimestamp(IntegralDivide(x, Literal(1000L, LongType), _)) => Some(x)
    case _ => None
  }

  private def micros(l: Literal): Option[Long] = l.dataType match {
    case TimestampType | TimestampNTZType => l.value match {
      case m: java.lang.Long => Some(m.longValue())
      case _ => None
    }
    case _ => None
  }

  private def implied(cmp: Expression): Option[Expression] = cmp match {
    case GreaterThanOrEqual(e, l: Literal) =>
      for (x <- rawNanos(e); m <- micros(l)) yield GreaterThanOrEqual(x, Literal(m * 1000L, LongType))
    case GreaterThan(e, l: Literal) =>
      for (x <- rawNanos(e); m <- micros(l)) yield GreaterThanOrEqual(x, Literal((m + 1) * 1000L, LongType))
    case LessThan(e, l: Literal) =>
      for (x <- rawNanos(e); m <- micros(l)) yield LessThan(x, Literal(m * 1000L, LongType))
    case LessThanOrEqual(e, l: Literal) =>
      for (x <- rawNanos(e); m <- micros(l)) yield LessThan(x, Literal((m + 1) * 1000L, LongType))
    // literal-first orientations
    case LessThanOrEqual(l: Literal, e) => implied(GreaterThanOrEqual(e, l))
    case LessThan(l: Literal, e)        => implied(GreaterThan(e, l))
    case GreaterThanOrEqual(l: Literal, e) => implied(LessThanOrEqual(e, l))
    case GreaterThan(l: Literal, e)     => implied(LessThan(e, l))
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val extras = scala.collection.mutable.ArrayBuffer.empty[Expression]
      cond.foreach { c =>
        implied(c).foreach { p =>
          // idempotence guard: the optimizer runs to fixpoint, so only
          // conjoin predicates not already present
          val already = cond.exists(_.semanticEquals(p)) || extras.exists(_.semanticEquals(p))
          if (!already) extras += p
        }
      }
      if (extras.isEmpty) f
      else Filter((cond +: extras.toSeq).reduce(And), child)
  }
}

/** Session extensions: the pushdown rule + the custom function, loaded
  * via `spark.sql.extensions=graft.plans.GraftExtensions` (so spark.sql
  * text queries get cosine_sim too, not just the Column API).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushNanosTimestampPredicate)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[graft.functions.CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => graft.functions.CosineSim(exprs(0), exprs(1))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("minhash128"),
      new ExpressionInfo(classOf[graft.functions.MinHash128].getName, "minhash128"),
      (exprs: Seq[Expression]) => graft.functions.MinHash128(exprs(0))))
    def intLit(ex: Expression): Int = ex match {
      case Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(s"expected int literal, got $other")
    }
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("ngram_shingles"),
      new ExpressionInfo(classOf[graft.functions.NgramShingles].getName, "ngram_shingles"),
      (exprs: Seq[Expression]) => graft.functions.NgramShingles(exprs(0), intLit(exprs(1)))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("collect_set_capped"),
      new ExpressionInfo(classOf[graft.functions.CollectSetCapped].getName, "collect_set_capped"),
      (exprs: Seq[Expression]) => graft.functions.CollectSetCapped(exprs(0), intLit(exprs(1)))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("topk_by_score"),
      new ExpressionInfo(classOf[graft.functions.TopKByScore].getName, "topk_by_score"),
      (exprs: Seq[Expression]) => graft.functions.TopKByScore(exprs(0), exprs(1), intLit(exprs(2)))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("topk_by_score_str"),
      new ExpressionInfo(classOf[graft.functions.TopKByScoreStr].getName, "topk_by_score_str"),
      (exprs: Seq[Expression]) => graft.functions.TopKByScoreStr(exprs(0), exprs(1), intLit(exprs(2)))))
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[graft.functions.SimHashAgg].getName, "simhash_md5"),
      (exprs: Seq[Expression]) => graft.functions.SimHashAgg(exprs(0), exprs(1))))
  }
}
