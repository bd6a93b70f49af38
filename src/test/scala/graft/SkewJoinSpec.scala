package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew handling: prove AQE's OptimizeSkewedJoin actually
  * splits a hot partition on this engine's configuration — the
  * mechanism the 100 TB posture leans on wherever a key is skewed and
  * manual salting (Relational.saltedJoin) hasn't been applied. The
  * thresholds are lowered so a local fixture exhibits "skew" at test
  * scale; the mechanism under test is identical at any scale. */
class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("AQE splits the hot key's partition: SortMergeJoin reports skew=true") {
    val ss = spark.newSession()
    ss.conf.set("spark.sql.adaptive.enabled", "true")
    ss.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // local-scale thresholds: a partition is "skewed" beyond 64 KB and
    // 2x the median, and splits aim at 32 KB
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    ss.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    ss.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    // the downstream count() imposes a distribution requirement; allow
    // the skew split to insert the extra exchange it needs
    ss.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    // force a sort-merge join (broadcast would dodge the skew entirely)
    ss.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    ss.conf.set("spark.sql.shuffle.partitions", "8")

    import ss.implicits._
    val pad = "x" * 64
    // 50k rows on ONE key vs 5k spread over 100 keys
    val left = ss.range(55000).select(
      when(col("id") < 50000, lit(0L)).otherwise(col("id") % 100 + 1).as("k"),
      concat(col("id").cast("string"), lit(pad)).as("payload"))
    val right = (0L to 100L).toDF("k").withColumn("attr", col("k") * 10)

    val joined = left.join(right, "k")
    // execute THIS dataset's plan (count() would finalize a different
    // QueryExecution and leave this one un-adapted)
    assert(joined.collect().length === 55000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"), finalPlan)
  }
}
