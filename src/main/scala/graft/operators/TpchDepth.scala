package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._
import graft.sources.Tables
import graft.plans.Lineage.TruncateOps

/** Deep-relational plan shapes, TPC-H-flavored and adapted to the test
  * schema (SURVEY.md §2.5/§2.7 depth; the reference has none of these —
  * its single compiled plan is a scan+agg, map_reduce.cpp:128-175).
  * What each query adds beyond the M2 breadth pack is a PLAN SHAPE the
  * engine must get right at 100 TB:
  *
  *  - correlated EXISTS with a non-equi residual  → semi join carrying an
  *    extra-condition filter on the equi key (q4, q21)
  *  - NOT IN over a nullable build side           → null-aware anti join
  *    (one null on the build side empties the result; Spark plans a
  *    broadcast null-aware anti, not a plain anti) (q16)
  *  - disjunctive multi-column predicates         → OR-of-conjunctions kept
  *    join-side so the scan still prunes on the common conjuncts (q19)
  *  - HAVING over a fact-fact aggregate feeding a second join (q18)
  *  - global scalar-subquery threshold + anti join (q22)
  *  - conditional aggregation (CASE inside sum) (q12, q14)
  *
  * All dimension sides stay broadcast; the only shuffles are the
  * fact-table group-bys/joins on their natural keys — same posture as
  * Relational.scala.
  */
object TpchDepth {

  private def revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  /** Q4-shaped priority check: orders in a quarter having at least one
    * lineitem shipped >60 days after the order date. The EXISTS becomes
    * a LEFT SEMI join on orderkey with the lateness residual evaluated
    * inside the join — one shuffle, no duplicate-elimination afterwards
    * (semi join semantics give that for free; a plain join + distinct
    * would shuffle twice). */
  def q4PriorityExists(t: Tables): DataFrame = {
    val o = t.orders.where(
      col("o_orderdate") >= lit("1995-01-01").cast(TimestampType) &&
      col("o_orderdate") < lit("1995-07-01").cast(TimestampType))
    o.join(t.lineitem,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** Q12-shaped shipping-priority split: conditional aggregation (CASE
    * folded into the sum) over the orders⋈lineitem shuffle — the
    * high/low split costs nothing extra because both measures ride the
    * same partial aggregate. */
  def q12PrioritySplit(t: Tables): DataFrame =
    t.orders.join(t.lineitem, col("o_orderkey") === col("l_orderkey"))
      .where(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
             col("l_shipdate") < lit("1996-01-01").cast(TimestampType))
      .groupBy(col("l_linestatus"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L))
          .as("low_line_count"))
      .orderBy(col("l_linestatus"))

  /** Q14-shaped promo share: ratio of two decimal-exact sums over one
    * scan-month of lineitem ⋈ part (part broadcast). The division is a
    * single double op on two exact decimals — deterministic across
    * engines and partitionings. */
  def q14PromoRevenue(t: Tables): DataFrame =
    t.lineitem
      .where(col("l_shipdate") >= lit("1995-09-01").cast(TimestampType) &&
             col("l_shipdate") < lit("1995-10-01").cast(TimestampType))
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * dsum6(when(col("p_type") === "PROMO", revenue).otherwise(lit(0.0))) /
          dsum6(revenue)).as("promo_revenue"))

  /** Q16-shaped supplier count: distinct suppliers per (brand, type)
    * offering small parts, EXCLUDING a NOT-IN subquery of suppliers in
    * deficit. `NOT IN (nullable subquery)` is the null-aware anti join —
    * only the SQL surface plans it (the DataFrame API has no join type
    * for it), and Spark must use the null-aware variant because a plain
    * anti join would be wrong if the build side ever held a NULL.
    * TpchDepthSpec asserts the plan carries the null-aware flag. */
  def q16SupplierCount(t: Tables): DataFrame = {
    t.lineitem.createOrReplaceTempView("q16_lineitem")
    t.part.createOrReplaceTempView("q16_part")
    t.supplier.createOrReplaceTempView("q16_supplier")
    t.spark.sql("""
      |SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM q16_lineitem JOIN q16_part ON l_partkey = p_partkey
      |WHERE p_size <= 15 AND p_type <> 'PROMO'
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM q16_supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type
      |ORDER BY supplier_cnt DESC, p_brand, p_type
      |""".stripMargin)
  }

  /** Q2-shaped minimum-cost supplier: per qualifying part, the
    * region's supplier whose total shipped value for it is MINIMAL —
    * TPC-H Q2's correlated scalar MIN (partsupp is absent from the
    * schema; the (part, supplier, cost) relation derives from
    * lineitem, preserving the shape). Decorrelated by hand: per-part
    * MIN aggregate joined back on (part, cost) — cost values are
    * dsum-exact decimals, so the equality join is deterministic. The
    * region filter semi-joins the supplier side BELOW the cost
    * aggregate (prune before the expensive group-by, the q17 device);
    * dimension sides broadcast. */
  def q2MinCostSupplier(t: Tables, region: String = "EUROPE", k: Int = 20): DataFrame = {
    val regionSupp = t.supplier
      .join(broadcast(t.nation.join(
          broadcast(t.region.where(col("r_name") === region)),
          col("n_regionkey") === col("r_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
    val cost = t.lineitem
      .join(broadcast(regionSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(dsum2(col("l_extendedprice")).as("cost"))
    val minCost = cost.groupBy(col("l_partkey")).agg(min(col("cost")).as("min_cost"))
    cost.join(minCost, Seq("l_partkey"))
      .where(col("cost") === col("min_cost"))
      .join(broadcast(t.part.where(col("p_size") <= 15 && col("p_type") === "SMALL")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(regionSupp), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("l_suppkey").as("s_suppkey"), col("cost"))
      // (p_partkey, s_suppkey) is unique per cost row, so the sort is
      // TOTAL — two suppliers tying on (cost, acctbal) for one part
      // cannot flap the LIMIT cut across engines
      .orderBy(col("s_acctbal").desc, col("p_partkey"), col("s_suppkey"))
      .limit(k)
  }

  /** Q6-shaped forecast revenue: one tight scan-only aggregate — every
    * predicate (year band, discount band, quantity cap) pushes to the
    * parquet scan, no join anywhere; the whole query is a data cliff
    * followed by one exact-decimal sum. The canonical "does the engine
    * skip what it can" probe. */
  def q6ForecastRevenue(t: Tables): DataFrame =
    t.lineitem
      .where(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
             col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
             col("l_discount").between(0.05, 0.07) &&
             col("l_quantity") < 24)
      .agg(dsum6(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** Q9-shaped product-line profit by nation and order year (the
    * schema has no partsupp: unit cost derives from the part's retail
    * price at a fixed margin, preserving the shape — a LIKE-filtered
    * part dim, three broadcast dims, one fact-fact shuffle, profit as
    * a single exact-decimal sum of a multi-column expression). */
  def q9ProductProfit(t: Tables, namePattern: String = "%red%",
                      costFactor: Double = 0.8): DataFrame =
    t.lineitem
      .join(broadcast(t.part.where(col("p_name").like(namePattern))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(dsum6(revenue - lit(costFactor) * col("p_retailprice") * col("l_quantity"))
        .as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)

  /** Q11-shaped important stock: per-part shipped value against a
    * GLOBAL threshold — the grouped aggregate crossed with its own
    * one-row total (the q22 scalar-threshold device applied to the
    * aggregate itself, not the raw fact). The comparison stays in
    * DECIMAL end to end (`value × N > Σvalue`, N = 1/fraction; the default keeps above-average parts — a proper subset): the
    * total is a sum of exact decimals, never float-accumulated, so a
    * borderline part cannot flip with partition order or engine. */
  def q11ImportantStock(t: Tables, invFraction: Long = 1800): DataFrame = {
    val valueDec = t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg(sum((col("l_quantity") * col("p_retailprice")).cast(DecimalType(18, 2)))
        .cast(DecimalType(38, 2)).as("vd"))
    valueDec
      .crossJoin(broadcast(valueDec
        .agg(sum(col("vd")).cast(DecimalType(38, 2)).as("total"))))
      .where(col("vd") * invFraction > col("total"))
      .select(col("l_partkey"), col("vd").cast(DoubleType).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  /** Q7-shaped two-nation volume: shipping revenue between a nation
    * pair, either direction, by ship year — the disjunctive
    * nation-pair predicate rides ABOVE the joins while both nation
    * lookups broadcast; the only shuffles are the fact-fact
    * lineitem⋈orders join and the final small group-by. */
  def q7NationVolume(t: Tables, nationA: String = "NATION_1",
                     nationB: String = "NATION_2"): DataFrame = {
    val sn = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val cn = t.nation.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(cn), col("c_nationkey") === col("c_nk"))
      .where((col("supp_nation") === nationA && col("cust_nation") === nationB) ||
             (col("supp_nation") === nationB && col("cust_nation") === nationA))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast(LongType).as("l_year"))
      .agg(dsum6(revenue).as("volume"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** Q8-shaped market share: one nation's slice of a region's market
    * for a part type, by order year — the ratio of two conditional
    * decimal-exact sums computed on the SAME partial aggregate (the
    * q12/q14 conditional-aggregation device), divided once as doubles
    * and rounded, so engines agree bit-for-bit. */
  def q8MarketShare(t: Tables, region: String = "AMERICA",
                    nation: String = "NATION_5", ptype: String = "PROMO"): DataFrame = {
    val marketCust = t.customer
      .join(broadcast(t.nation.join(
          broadcast(t.region.where(col("r_name") === region)),
          col("n_regionkey") === col("r_regionkey"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val sn = t.nation.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    t.lineitem
      .join(broadcast(t.part.where(col("p_type") === ptype)),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(sn), col("s_nationkey") === col("s_nk"))
      .join(t.orders, col("l_orderkey") === col("o_orderkey"))
      .join(marketCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
      .agg(round(
        dsum6(when(col("supp_nation") === nation, revenue).otherwise(lit(0.0))) /
          dsum6(revenue), 6).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** Q10-shaped returned-item ranking: customers by revenue lost to
    * returns in one quarter — fact-fact join shuffles on orderkey,
    * the customer join carries the grouping payload, nation
    * broadcasts, and the top-k is TakeOrderedAndProject (never a
    * global sort). */
  def q10ReturnedItems(t: Tables, k: Int = 20): DataFrame =
    t.lineitem.where(col("l_returnflag") === "R")
      .join(t.orders.where(
          col("o_orderdate") >= lit("1995-10-01").cast(TimestampType) &&
          col("o_orderdate") < lit("1996-01-01").cast(TimestampType)),
        col("l_orderkey") === col("o_orderkey"))
      .join(t.customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(dsum6(revenue).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(k)

  /** Q13-shaped customer distribution: how many customers placed k
    * orders, EXCLUDING one priority class — the filter lives on the
    * join's ORDER side (pre-join subquery ≡ the ON-clause filter of
    * the spec text), so customers keep their LEFT-join row and land
    * in the k = 0 bucket instead of vanishing. Two-level aggregate:
    * per-customer count, then the count histogram. */
  def q13CustomerDistribution(t: Tables,
                              exclude: Seq[String] = Seq("1-URGENT")): DataFrame = {
    val o = t.orders.where(!col("o_orderpriority").isin(exclude: _*))
    t.customer
      .join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q18-shaped large-volume customers: fact-side HAVING (sum of
    * quantity per order above a threshold) feeding a join back to
    * orders+customer. The big aggregate happens FIRST, on the lineitem
    * shuffle alone; only the few surviving orderkeys join onward —
    * at 100 TB the HAVING is the data cliff, so it must sit below the
    * joins, not above them. */
  def q18LargeVolume(t: Tables, minQty: Double = 110.0, k: Int = 20): DataFrame = {
    val bigOrders = t.lineitem.groupBy(col("l_orderkey"))
      .agg(dsum2(col("l_quantity")).as("total_qty"))
      .where(col("total_qty") > minQty)
    t.orders.join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(desc("total_qty"), asc("o_orderkey"))
      .limit(k)
  }

  /** Q19-shaped disjunctive revenue: three OR'd (brand, size-range,
    * quantity-range) conjunction groups evaluated inside the
    * lineitem ⋈ part join. The common `l_partkey = p_partkey` stays the
    * equi key; the disjunction is a residual — Catalyst still pushes
    * the per-side common conjuncts (quantity bounds to lineitem, size
    * bounds to part) down to the scans. */
  def q19Disjunctive(t: Tables): DataFrame = {
    val cond =
      (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
        col("l_quantity").between(1, 11)) ||
      (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
        col("l_quantity").between(10, 20)) ||
      (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
        col("l_quantity").between(20, 30))
    t.lineitem
      .join(broadcast(t.part), col("l_partkey") === col("p_partkey") && cond)
      .agg(dsum6(revenue).as("revenue"))
  }

  /** Q21-shaped waiting suppliers: for orders with status 'F', count per
    * supplier the orders where THIS supplier shipped late (>90 days
    * after order date) while some OTHER supplier on the same order
    * shipped on time. Two correlated quantifiers — the EXISTS becomes a
    * semi join keyed on orderkey with a `suppkey <>` residual, the
    * lateness is a plain filter. Everything shuffles on orderkey once;
    * supplier names broadcast at the end. */
  def q21WaitingSuppliers(t: Tables, k: Int = 20): DataFrame = {
    val li = t.lineitem.join(
      t.orders.where(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate")),
      col("l_orderkey") === col("o_orderkey"))
    val late = li.where(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey").as("lo"), col("l_suppkey").as("ls")).distinct()
    val onTime = li.where(col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .select(col("l_orderkey").as("oo"), col("l_suppkey").as("os")).distinct()
    // the aggregation key is the SUPPLIER KEY, not the name — two
    // suppliers sharing a name stay distinct rows; s_suppkey also rides
    // the output (and the sort tie-break) so the twin's grouping and
    // the LIMIT boundary are deterministic by construction
    late
      .join(onTime, col("lo") === col("oo") && col("ls") =!= col("os"), "left_semi")
      .groupBy(col("ls"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(t.supplier), col("ls") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("numwait"))
      .orderBy(desc("numwait"), asc("s_suppkey"))
      .limit(k)
  }

  /** Q22-shaped dormant above-average customers: a GLOBAL scalar
    * subquery (average positive balance — one broadcastable number) as
    * the filter threshold, then NOT EXISTS recent orders as an anti
    * join, grouped by nation. The threshold aggregate reduces the whole
    * customer table to one row before anything joins, and the anti
    * join's build side is pre-filtered to the recent window — the right
    * order at any scale. (The synthetic data gives every customer at
    * least one order, so dormancy is "no order since 1998-06-01".) */
  def q22DormantCustomers(t: Tables): DataFrame = {
    val avgBal = t.customer.where(col("c_acctbal") > 0)
      .agg(davg(col("c_acctbal")).as("a"))
    t.customer
      .join(broadcast(avgBal), col("c_acctbal") > lit(0.5) * col("a"))
      .join(t.orders
          .where(col("o_orderdate") >= lit("1998-06-01").cast(TimestampType))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"), dsum2(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  /** Q15-shaped top supplier: a revenue view consumed TWICE — once for
    * its scalar max, once to pick the row(s) attaining it. The view is
    * supplier-count-sized after its aggregation, so it materializes
    * once (localCheckpoint, the Dedup.jaccardPairs device) instead of
    * re-running the lineitem scan+shuffle per consumer; the max side
    * reduces to one broadcast row. Equality on total_revenue is safe
    * across engines because both sides derive it through the same
    * exact-decimal sum (dsum6), then compare the identical doubles. */
  def q15TopSupplier(t: Tables): DataFrame = {
    val rev = t.lineitem
      .where(col("l_shipdate") >= lit("1995-01-01").cast(TimestampType) &&
             col("l_shipdate") < lit("1995-04-01").cast(TimestampType))
      .groupBy(col("l_suppkey"))
      .agg(dsum6(revenue).as("total_revenue"))
      .truncateLineage
    val top = rev.agg(max(col("total_revenue")).as("mx"))
    rev.join(broadcast(top), col("total_revenue") === col("mx"))
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** Q17-shaped small-quantity revenue: the correlated scalar AVG
    * (`l_quantity < 0.2 * avg(l_quantity) WHERE l_partkey = p_partkey`)
    * decorrelated into a per-part aggregate joined back on the key —
    * the classic rewrite, with the brand filter SEMI-JOINED below the
    * aggregate so the per-part stats are computed over 1/25th of the
    * fact table instead of all of it (the pushdown a correlated form
    * hides from the optimizer).
    *
    * Cross-engine exactness: quantities are integers, so the fractional
    * threshold is algebra'd away — q < sum/(5·n) ⇔ 5·n·q < sum —
    * leaving pure BIGINT comparisons; only the final revenue sum is
    * float, and it goes through the exact-decimal device. */
  def q17SmallQuantityRevenue(t: Tables, brand: String = "Brand#4"): DataFrame = {
    val branded = broadcast(
      t.part.where(col("p_brand") === brand).select(col("p_partkey")))
    val li = t.lineitem
      .join(branded, col("l_partkey") === col("p_partkey"), "left_semi")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity").cast(LongType)).as("sum_qty"),
           count(lit(1)).as("n_li"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .where(col("l_quantity").cast(LongType) * lit(5L) * col("n_li") < col("sum_qty"))
      .agg((dsum6(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"))
  }

  /** Q20-shaped dominant suppliers: a NESTED correlated aggregate —
    * suppliers shipping more than a 1/`mult` share of some part's total
    * volume, for a name-prefixed part family. Decorrelated bottom-up:
    * one (part, supplier) aggregate, one per-part rollup OF THAT
    * aggregate (never a second fact scan), an integer-exact dominance
    * filter (mult·qty_ps > qty_p), then a semi join into the supplier
    * dimension. The fact table is touched once, pre-pruned by the
    * broadcast part family; every later stage works on aggregate-sized
    * data. (`mult` defaults to 6 — a >1/6 share, which is selective on
    * the synthetic data's near-uniform supplier spread; the classic
    * >1/2 form is mult = 2.) */
  def q20DominantSuppliers(t: Tables, prefix: String = "red", mult: Int = 6): DataFrame = {
    val family = broadcast(
      t.part.where(col("p_name").startsWith(prefix)).select(col("p_partkey")))
    val shipped = t.lineitem
      .join(family, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("l_quantity").cast(LongType)).as("qty_ps"))
      .truncateLineage // consumed by the rollup AND the filter
    val perPart = shipped.groupBy(col("l_partkey")).agg(sum(col("qty_ps")).as("qty_p"))
    val dominant = shipped.join(perPart, Seq("l_partkey"))
      .where(col("qty_ps") * lit(mult.toLong) > col("qty_p"))
      .select(col("l_suppkey")).distinct()
    t.supplier
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"))
      .orderBy(col("s_suppkey"))
  }
}
