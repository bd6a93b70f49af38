package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Bucketing

class BucketingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("co-located bucketed SMJ + agg runs with zero shuffle exchanges and matches the plain join") {
    val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")

    val df = Bucketing.colocatedSpendPerCustomer(spark, customer, orders, buckets = 4)
    val nShuffles = Bucketing.shuffleExchangeCount(df)
    assert(nShuffles === 0,
      s"expected a shuffle-free plan, got $nShuffles exchanges:\n" +
        df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode))

    val got = df.orderBy("c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val want = customer.join(orders, customer("c_custkey") === orders("o_custkey"))
      .groupBy(customer("c_custkey"))
      .agg(count(lit(1)).as("n_orders"), graft.functions.dsum2(col("o_totalprice")).as("total_spend"))
      .orderBy("c_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq === want.toSeq)
  }
}
