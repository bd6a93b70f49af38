package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GroupedTopK

class GroupedTopKSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("custom operator matches the row_number window, plans as partial+final heap exec") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
    val df = GroupedTopK.topKPerKey(orders,
      Seq("o_orderstatus"), Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)

    // the strategy must have planned OUR operator, in both phases
    val plan = df.queryExecution.executedPlan.toString
    assert("GroupedTopK 3".r.findAllIn(plan).size >= 2, plan) // partial + final phases

    val got = df.orderBy(col("o_orderstatus"), desc("o_totalprice"), asc("o_orderkey"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val want = orders.withColumn("rn", row_number().over(w)).where(col("rn") <= 3)
      .orderBy(col("o_orderstatus"), desc("o_totalprice"), asc("o_orderkey"))
      .select(col("o_orderstatus"), col("o_orderkey"), col("o_totalprice"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("groups smaller than k emit whole; ascending order works") {
    import spark.implicits._
    val df = Seq(("a", 1L, 3.0), ("a", 2L, 1.0), ("b", 3L, 2.0)).toDF("g", "id", "v")
    val got = GroupedTopK.topKPerKey(df, Seq("g"), Seq(("v", false), ("id", false)), k = 2)
      .orderBy("g", "v").collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a", 2L), ("a", 1L), ("b", 3L)))
  }

  test("partial-phase overflow passes rows through unreduced and stays exact") {
    // high key cardinality vs a tiny retained-row budget: most rows
    // must overflow the partial phase, and the result must still equal
    // the window formulation exactly
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    def run(maxPartialRows: Int) = GroupedTopK.topKPerKey(orders,
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 2, maxPartialRows = maxPartialRows)
      .orderBy("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val constrained = run(maxPartialRows = 16)
    val unconstrained = run(maxPartialRows = Int.MaxValue)
    assert(constrained === unconstrained)
    assert(constrained.nonEmpty)

    // with AQE off the physical tree is visible: confirm the overflow
    // path actually fired (the semantics above would also pass if the
    // budget were ignored)
    val aqeWas = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val df = GroupedTopK.topKPerKey(orders,
        Seq("o_custkey"), Seq(("o_totalprice", true), ("o_orderkey", false)),
        k = 2, maxPartialRows = 16)
      df.collect()
      val overflowed = df.queryExecution.executedPlan.collect {
        case g: graft.plans.GroupedTopKExec if g.partial => g.metrics("overflowRows").value
      }.sum
      assert(overflowed > 0, "expected partial-phase overflow with a 16-row budget")
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqeWas)
  }
}
