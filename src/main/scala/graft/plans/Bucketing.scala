package graft.plans

import java.nio.file.Files
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bucketed (pre-partitioned) tables: the storage-level mechanism
  * behind the "at most one fact-fact shuffle" posture
  * (Relational.scala:17-20). Writing both join sides bucketed on the
  * join key with the same bucket count lets SortMergeJoin read bucket
  * i of each side as one co-located task — zero Exchange anywhere in
  * the join + aggregate plan (asserted by BucketingSpec). At 100 TB
  * this is the difference between re-shuffling a fact table on every
  * join and paying its shuffle once at ingest time.
  *
  * Reference analog: the static bin → process ownership map
  * (map_reduce.cpp:306) is a hand-rolled bucketing of the output; here
  * the same idea is applied to STORAGE so later queries inherit the
  * partitioning instead of re-deriving it.
  */
object Bucketing {

  /** Save as a bucketed, per-bucket-sorted external data-source table.
    * The bucket spec lives in the catalog; any later scan reports
    * hash(key) % buckets partitioning to the planner. */
  def writeBucketed(df: DataFrame, table: String, path: String, buckets: Int, key: String): Unit =
    df.write.mode("overwrite").option("path", path)
      .bucketBy(buckets, key).sortBy(key).saveAsTable(table)

  // Bucketing is pay-once-at-ingest: the whole point is that ONE write
  // serves every later query. So the demo must not rewrite both tables
  // per invocation — a bench sample would then mostly measure two table
  // writes, and temp dirs would pile up across a long session. Ingest
  // is memoized per (session, input plans, bucket count); all writes
  // share one per-JVM directory.
  private val ingested = scala.collection.concurrent.TrieMap.empty[String, (String, String)]
  private lazy val bucketDir: String = {
    val d = Files.createTempDirectory("graft-bucketed")
    d.toFile.deleteOnExit()
    d.toString
  }

  /** customer ⋈ orders on custkey with BOTH sides pre-bucketed: the
    * join and the per-customer aggregate both reuse the bucket
    * partitioning, so the pipeline runs shuffle-free end to end (the
    * registered query's presentation orderBy is the only exchange).
    * The merge hint pins SMJ so the plan proves co-location rather
    * than falling back to a broadcast. */
  def colocatedSpendPerCustomer(spark: SparkSession, customer: DataFrame, orders: DataFrame,
                                buckets: Int = 8): DataFrame = {
    // Memo key = the FULL fingerprint (a 32-bit hashCode key could
    // collide across (inputs, bucket-count) combos and silently reuse
    // the wrong bucketed tables); table identifiers use a SHA-256
    // prefix of it to stay short.
    val fingerprint = customer.queryExecution.logical.canonicalized.toString +
      orders.queryExecution.logical.canonicalized.toString +
      buckets + ":" + System.identityHashCode(spark)
    val (ct, ot) = ingested.getOrElseUpdate(fingerprint, {
      val digest = java.security.MessageDigest.getInstance("SHA-256")
        .digest(fingerprint.getBytes("UTF-8"))
        .take(6).map(b => f"$b%02x").mkString
      val (ct, ot) = (s"customer_b_$digest", s"orders_b_$digest")
      writeBucketed(customer.select("c_custkey", "c_name"),
        ct, s"$bucketDir/$ct", buckets, "c_custkey")
      writeBucketed(orders.select("o_custkey", "o_totalprice"),
        ot, s"$bucketDir/$ot", buckets, "o_custkey")
      (ct, ot)
    })
    val c = spark.table(ct)
    val o = spark.table(ot)
    c.hint("merge").join(o, c("c_custkey") === o("o_custkey"))
      .groupBy(c("c_custkey"))
      .agg(count(lit(1)).as("n_orders"), graft.functions.dsum2(col("o_totalprice")).as("total_spend"))
  }

  /** Number of shuffle Exchange operators in the physical plan (AQE's
    * initial plan — AQE never inserts exchanges the initial plan
    * lacks, so zero here means zero at runtime). */
  def shuffleExchangeCount(df: DataFrame): Int = {
    val s = df.queryExecution.explainString(org.apache.spark.sql.execution.SimpleMode)
    "Exchange (hash|range)partitioning".r.findAllIn(s).length
  }
}
