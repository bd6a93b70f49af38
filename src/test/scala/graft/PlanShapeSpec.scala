package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FormattedMode, SimpleMode}
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Relational, TextOps}
import graft.plans.Bucketing
import graft.sources.Tables

/** The physical plans the 100 TB posture depends on, pinned as tests:
  * filter pushdown reaching the parquet scan, column pruning, broadcast
  * side selection, partial aggregation before the one shuffle. A
  * regression here (a new Spark version re-planning, a refactor
  * dropping a hint) fails fast in `sbt test` instead of surfacing as a
  * silent bench slowdown. */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  private def formatted(df: DataFrame): String =
    df.queryExecution.explainString(FormattedMode)
  private def simple(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  test("wordcount: partial+final hash aggregation around exactly one shuffle") {
    val df = TextOps.wordCount(t.documents)
    assert(Bucketing.shuffleExchangeCount(df) === 1, simple(df))
    val plan = formatted(df)
    assert(plan.contains("HashAggregate"), plan)
    assert(plan.contains("partial_count"), plan) // map-side combine before the exchange
  }

  test("q1 pricing summary: shipdate filter pushed to the parquet scan, unused columns pruned") {
    val plan = formatted(Relational.pricingSummary(t.lineitem))
    assert(plan.contains("PushedFilters") && plan.contains("LessThanOrEqual(l_shipdate"), plan)
    val readSchema = plan.linesIterator.filter(_.contains("ReadSchema")).mkString
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_partkey")
      && !readSchema.contains("l_suppkey"), readSchema)
    assert(readSchema.contains("l_quantity") && readSchema.contains("l_shipdate"), readSchema)
  }

  test("q3: filtered customer dim broadcasts; top-k is TakeOrderedAndProject, not a global sort") {
    val plan = simple(Relational.topUnshippedOrders(t))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q5: every dimension join is broadcast — the fact table shuffles for the agg only") {
    val df = Relational.nationRevenue(t, "ASIA")
    val plan = simple(df)
    assert("BroadcastHashJoin".r.findAllIn(plan).size === 5, plan)
    // one exchange for the final agg + one for the presentation sort
    assert(Bucketing.shuffleExchangeCount(df) <= 2, plan)
  }

  test("theta join keeps the equi key hashable — no nested loop") {
    val plan = simple(Relational.lateShipments(t))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("range join broadcasts the tiny band table") {
    val plan = simple(Relational.priceBandCounts(t))
    assert(plan.contains("BroadcastNestedLoop"), plan) // non-equi: NLJ is correct...
    assert(plan.contains("BuildLeft") || plan.contains("BuildRight"), plan) // ...with a broadcast build side
  }

  test("wordcount_x8 pins the 8-row multiplier as the broadcast side") {
    val plan = simple(TextOps.wordCountX8(t.documents))
    // the Range(0..8) side must be the build side of the nested loop
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight"), plan)
  }
}
