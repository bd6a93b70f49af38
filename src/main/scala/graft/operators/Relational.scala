package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._
import graft.sources.Tables

/** Relational breadth over the TPC-H-ish tables (SURVEY.md §2 [ABSENT]
  * rows / M2): filters, multi-measure aggregation, broadcast + shuffle
  * joins, semi/anti joins, outer joins, rollup/cube, set ops, sorts and
  * top-k. All declarative — Catalyst supplies pushdown, pruning, join
  * selection (broadcast for the small dims) and AQE does runtime
  * re-planning; no hand scheduling (reference had none to begin with:
  * its one plan was compiled in, SURVEY.md §4.1).
  *
  * At 100 TB: the fact tables (lineitem/orders/events) shuffle on their
  * join/group keys; all dimension joins below stay broadcast (region,
  * nation, supplier, part, customer are orders-of-magnitude smaller than
  * the facts), so each query needs at most one fact-fact shuffle.
  */
object Relational {

  /** TPC-H Q1-shaped pricing summary: scan-heavy multi-measure agg with
    * map-side partial aggregation; only 6 tiny groups cross the wire. */
  def pricingSummary(li: DataFrame): DataFrame =
    li.where(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3-shaped: dimension-filtered customer ⋈ orders ⋈ lineitem,
    * revenue top-10. customer side is broadcast; orders⋈lineitem is the
    * one real shuffle; top-k is TakeOrderedAndProject (no global sort). */
  def topUnshippedOrders(t: Tables, segment: String = "BUILDING", k: Int = 10): DataFrame =
    t.customer.where(col("c_mktsegment") === segment)
      .join(t.orders, col("c_custkey") === col("o_custkey"))
      .join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("o_orderkey"))
      .limit(k)

  /** TPC-H Q5-shaped: five-way join down the star schema, revenue per
    * nation within one region. region/nation/supplier/customer broadcast;
    * orders⋈lineitem shuffles once on orderkey. */
  def nationRevenue(t: Tables, regionName: String): DataFrame =
    t.region.where(col("r_name") === regionName)
      .join(t.nation, col("n_regionkey") === col("r_regionkey"))
      .join(t.customer, col("c_nationkey") === col("n_nationkey"))
      .join(t.orders, col("o_custkey") === col("c_custkey"))
      .join(t.lineitem, col("l_orderkey") === col("o_orderkey"))
      .join(t.supplier, col("s_suppkey") === col("l_suppkey") && col("s_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"))
      .agg(dsum6(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** Left-semi: customers having at least one open order (EXISTS). */
  def customersWithOpenOrders(t: Tables): DataFrame =
    t.customer
      .join(t.orders.where(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-anti: customers with no orders at all (NOT EXISTS). */
  def customersWithoutOrders(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))

  /** Left-outer join + agg: order count and spend per customer, zeros
    * kept. count(o_orderkey) skips the nulls the outer join introduces. */
  def ordersPerCustomer(t: Tables): DataFrame =
    t.customer
      .join(t.orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"),
        coalesce(dsum2(col("o_totalprice")), lit(0.0)).as("total_spend"))
      .orderBy(col("c_custkey"))

  /** ROLLUP over (returnflag, linestatus); null markers coalesced to
    * 'ALL' so the output is deterministic, non-null and sortable. */
  def rollupAgg(li: DataFrame): DataFrame =
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum2(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))

  /** CUBE over (orderstatus, orderpriority). */
  def cubeAgg(orders: DataFrame): DataFrame =
    orders.cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(dsum2(col("o_totalprice")).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("orderpriority"),
        col("sum_price"), col("n"))
      .orderBy(col("orderstatus"), col("orderpriority"))

  /** Scalar expression breadth over part: string fns, arithmetic,
    * conditionals — all codegen'd builtins, zero UDFs (SURVEY.md §2.10). */
  def partTransforms(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey"),
      upper(col("p_name")).as("name_upper"),
      length(col("p_name")).as("name_len"),
      substring(col("p_type"), 1, 6).as("type_prefix"),
      split(col("p_type"), " ").getItem(0).as("type_head"),
      (col("p_retailprice") * lit(1.1)).as("marked_up"),
      when(col("p_size") > 25, lit("large"))
        .when(col("p_size") > 10, lit("medium"))
        .otherwise(lit("small")).as("size_class"))
      .orderBy(col("p_partkey"))

  /** Date/time expression breadth over orders. */
  def orderDates(orders: DataFrame): DataFrame =
    orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).as("o_year"),
      quarter(col("o_orderdate")).as("o_quarter"),
      month(col("o_orderdate")).as("o_month"),
      dayofmonth(col("o_orderdate")).as("o_day"),
      date_trunc("month", col("o_orderdate")).as("month_start"),
      datediff(lit("2002-01-01").cast(DateType), col("o_orderdate").cast(DateType)).as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  /** Multi-measure statistics incl. an order-independent population
    * variance computed from exact decimal sums of x and x². */
  def customerStats(customer: DataFrame): DataFrame = {
    val n = count(lit(1))
    val sx = dsum2(col("c_acctbal"))
    val sxx = dsum(col("c_acctbal") * col("c_acctbal"), 4)
    customer.groupBy(col("c_mktsegment"))
      .agg(
        n.as("n_customers"),
        countDistinct(col("c_nationkey")).as("n_nations"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        sx.as("sum_bal"),
        (sx / n).as("avg_bal"),
        ((sxx - sx * sx / n) / n).as("var_pop_bal"))
      .orderBy(col("c_mktsegment"))
  }

  /** Set operations on the nation-key sets of customers vs suppliers.
    * Note Spark `union` is UNION ALL; the distinct variant is explicit. */
  def nationSetOps(t: Tables): DataFrame = {
    val cu = t.customer.select(col("c_nationkey").cast(IntegerType).as("nationkey")).distinct()
    val su = t.supplier.select(col("s_nationkey").cast(IntegerType).as("nationkey")).distinct()
    cu.intersect(su).withColumn("op", lit("both"))
      .union(cu.except(su).withColumn("op", lit("customer_only")))
      .union(su.except(cu).withColumn("op", lit("supplier_only")))
      .orderBy(col("op"), col("nationkey"))
  }

  /** PIVOT with an explicit value list: return flags become columns.
    * Pinning the values keeps the plan single-pass — the value-less
    * overload first runs a distinct query to discover keys, a needless
    * extra scan (and nondeterministic column set) at scale. */
  def pivotReturnFlagQty(li: DataFrame): DataFrame =
    li.groupBy(col("l_linestatus"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dsum2(col("l_quantity")))
      .orderBy(col("l_linestatus"))

  /** UNPIVOT (melt): the four lineitem measures to long form — the
    * inverse reshape; plans as a Generate (row expansion), no shuffle. */
  def unpivotLineitemMeasures(li: DataFrame): DataFrame =
    li.unpivot(
      Array(col("l_orderkey"), col("l_linenumber")),
      Array(col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")),
      "measure", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("measure"))

  /** Global top-k with deterministic tie-break → TakeOrderedAndProject. */
  def topOrdersByPrice(orders: DataFrame, k: Int = 25): DataFrame =
    orders.select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      .limit(k)

  /** FULL OUTER join: per-nation customer vs supplier presence, both
    * unmatched sides kept. */
  def nationPresence(t: Tables): DataFrame = {
    val cu = t.customer.groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val su = t.supplier.groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    cu.join(su, col("c_nationkey") === col("s_nationkey"), "full")
      .select(
        coalesce(col("c_nationkey"), col("s_nationkey")).cast(IntegerType).as("nationkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  /** Theta join (equi key + inequality residual): lineitems shipped
    * more than 30 days after their order date, per order status.
    * Catalyst keeps the equi part hashable and applies the inequality
    * as a join residual — no nested loop. */
  def lateShipments(t: Tables): DataFrame =
    t.lineitem
      .join(t.orders, col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_late"))
      .orderBy(col("o_orderstatus"))

  /** Pure range join (non-equi only): orders against a broadcast band
    * table [lo, hi) — plans as BroadcastNestedLoopJoin with the tiny
    * side broadcast, the right shape for interval/range semantics. */
  def priceBandCounts(t: Tables, bandWidth: Long = 50000L, nBands: Int = 12): DataFrame = {
    val spark = t.spark
    val bands = spark.range(nBands)
      .select(col("id").as("band"),
        (col("id") * bandWidth).cast(DoubleType).as("lo"),
        ((col("id") + 1) * bandWidth).cast(DoubleType).as("hi"))
    t.orders.join(broadcast(bands),
        col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_orders"), dsum2(col("o_totalprice")).as("sum_price"))
      .orderBy(col("band"))
  }

  /** Exact interpolated percentiles per group (Spark `percentile` ==
    * DuckDB `quantile_cont` semantics; outputs rounded to absorb
    * last-bit interpolation-association differences). */
  def pricePercentiles(orders: DataFrame): DataFrame =
    orders.groupBy(col("o_orderstatus"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        round(expr("percentile(o_totalprice, 0.99)"), 4).as("p99"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))

  /** Pearson correlation computed from exact decimal sums — unlike the
    * built-in `corr` (order-dependent double accumulation), every term
    * here is an order-independent decimal sum, so the result is
    * bit-identical across partitionings and engines. */
  def quantityPriceCorr(li: DataFrame): DataFrame = {
    val n = count(lit(1))
    val sx = dsum2(col("l_quantity"))
    val sy = dsum2(col("l_extendedprice"))
    val sxy = dsum(col("l_quantity") * col("l_extendedprice"), 4)
    val sxx = dsum(col("l_quantity") * col("l_quantity"), 4)
    val syy = dsum(col("l_extendedprice") * col("l_extendedprice"), 4)
    li.groupBy(col("l_returnflag"))
      .agg(n.as("n"),
        ((n * sxy - sx * sy) /
          (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_qty_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Per-group simple linear regression (price ~ quantity) in closed
    * form from exact decimal moments — the same device as
    * quantityPriceCorr: slope/intercept/r² are single double ops over
    * order-independent decimal sums, so the result is bit-identical
    * across engines and partitionings (a naive regr_slope/regr_r2
    * accumulates doubles in partition order and is not). One map-side
    * combined aggregate; six moments ride one shuffle row per group. */
  def regressionByFlag(li: DataFrame): DataFrame = {
    val n = count(lit(1))
    val sx = dsum2(col("l_quantity"))
    val sy = dsum2(col("l_extendedprice"))
    val sxy = dsum(col("l_quantity") * col("l_extendedprice"), 4)
    val sxx = dsum(col("l_quantity") * col("l_quantity"), 4)
    val syy = dsum(col("l_extendedprice") * col("l_extendedprice"), 4)
    val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    li.groupBy(col("l_returnflag"))
      .agg(n.as("n_rows"),
        slope.as("slope"),
        ((sy - slope * sx) / n).as("intercept"),
        (((n * sxy - sx * sy) * (n * sxy - sx * sy)) /
          ((n * sxx - sx * sx) * (n * syy - sy * sy))).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  /** Skew-safe equi-join: salts the big (probe) side into `factor`
    * sub-keys and replicates the small (build) side once per salt, so
    * one hot key spreads over `factor` tasks instead of one straggler.
    * The manual fallback when AQE's skew-join split isn't available —
    * e.g. a boilerplate cluster dominating an LSH band bucket
    * (SURVEY.md §7.4). Salt values don't affect the result, only the
    * distribution; the salt column never leaves this function. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, factor: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("__salt", (rand(42) * factor).cast(IntegerType))
    val replicatedSmall = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    saltedBig.join(replicatedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Sketch aggregation: HLL++ approximate distinct parts/suppliers per
    * return flag next to the exact count (rows-only check — sketches
    * are engine-specific by construction). */
  def approxDistincts(li: DataFrame): DataFrame =
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("approx_parts"),
        approx_count_distinct(col("l_suppkey")).as("approx_supps"))
      .orderBy(col("l_returnflag"))

  /** Weighted median per group — the robust center when rows carry
    * unequal mass (a 50-unit line item should pull the "typical
    * price" 50× harder than a 1-unit one). Nearest-rank on the
    * cumulative weight: the smallest value whose running weight
    * reaches half the total. ENTIRELY in exact decimal — values and
    * weights cast to DECIMAL(18,2), the 2·cum >= total cut compares
    * exact decimals, no interpolation — so the picked value is a real
    * data value and the hash cannot flap (the madOutliers discipline).
    *
    * Scale shape: one (group, value) pre-aggregate collapses the fact
    * table to distinct values per group, then two windows on that
    * relation; a hot group costs one partition's sort of its DISTINCT
    * values, not its rows. */
  def weightedMedian(df: DataFrame, groupCol: String, valueCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = df.select(col(groupCol).as("grp"),
        col(valueCol).cast("decimal(18,2)").as("v"),
        col(weightCol).cast("decimal(18,2)").as("wt"))
      .groupBy(col("grp"), col("v")).agg(sum(col("wt")).as("w"))
    val run = Window.partitionBy(col("grp")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g.withColumn("cw", sum(col("w")).over(run))
      .withColumn("tw", sum(col("w")).over(Window.partitionBy(col("grp"))))
      .where(col("cw") * 2 >= col("tw"))
      .groupBy(col("grp"))
      .agg(min(col("v")).as("wm"), max(col("tw")).as("tw"))
      .select(col("grp").as(groupCol),
        col("wm").cast("double").as("weighted_median"),
        col("tw").cast("double").as("total_weight"))
  }

  /** Cross-table reconciliation: does the order header's total agree
    * with the sum of its line amounts (extprice·(1−disc)·(1+tax))?
    * The drift census every warehouse runs between a rollup table and
    * its fact source — headers with no lines and totals outside the
    * tolerance band are the rows a sync job re-derives.
    *
    * Exactness: each line amount is ONE fixed-association double
    * product rounded to 4 dp and DECIMAL-summed (the LM-ladder
    * device); deviations and the permille tolerance compare in exact
    * decimal, so the verdict booleans can't flap. One fact-side
    * aggregate + one header join; output is a one-row census. */
  def orderReconcile(lineitem: DataFrame, orders: DataFrame,
                     tolPermille: Int = 10): DataFrame = {
    val line = lineitem.select(col("l_orderkey").as("ok"),
      round(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * (lit(1.0) + col("l_tax")), 4).cast("decimal(28,4)").as("amt"))
    val computed = line.groupBy(col("ok")).agg(sum(col("amt")).as("computed"))
    orders.select(col("o_orderkey").as("ok"),
        col("o_totalprice").cast("decimal(18,2)").as("tot"))
      .join(computed, Seq("ok"), "left")
      .select(col("tot"),
        col("computed").isNull.as("no_lines"),
        abs(col("tot").cast("decimal(28,4)")
          - coalesce(col("computed"), lit(0).cast("decimal(28,4)"))).as("dev"))
      .agg(count(lit(1)).as("n_orders"),
        sum(when(col("no_lines"), lit(1L)).otherwise(lit(0L))).as("n_no_lines"),
        sum(when(col("dev") === 0, lit(1L)).otherwise(lit(0L))).as("n_exact"),
        sum(when(col("dev") * 1000 <= col("tot").cast("decimal(28,4)") * tolPermille,
          lit(1L)).otherwise(lit(0L))).as("n_within_tol"),
        max(col("dev")).cast("double").as("max_dev"))
  }

  /** Referential-integrity audit — the orphan census run before
    * trusting any star-schema drop: for each declared FK edge, total
    * child rows and rows whose parent key is missing (left-anti
    * semantics via a null-right left join count). One row per edge.
    *
    * Scale shape: each check is one join child⋈parent on the FK —
    * broadcast when the parent is a dim, shuffle otherwise — with the
    * count folded into the same pass; no materialized orphan list
    * unless a caller asks for the rows themselves. */
  def fkIntegrity(edges: Seq[(String, DataFrame, String, DataFrame, String)]): DataFrame = {
    val checks = edges.map { case (name, child, fk, parent, pk) =>
      child.select(col(fk).as("k"))
        .join(parent.select(col(pk).as("k"), lit(1).as("__hit")).distinct(), Seq("k"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("__hit").isNull, lit(1L)).otherwise(lit(0L))).as("n_orphans"))
        .select(lit(name).as("fk_edge"), col("n_rows"), col("n_orphans"))
    }
    checks.reduce(_ unionAll _)
  }
}
