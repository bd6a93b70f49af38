package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TotalOrder

class TotalOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // keys with heavy duplication in the leading sort column so the
  // tie-break does real work, spread over many input partitions
  private lazy val df = spark.range(0, 20000, 1, 16)
    .select((col("id") % 37).as("a"), (col("id") * 1237 % 20000).as("b"))

  test("globalRank equals the single-window row_number at several partition counts") {
    val keys = Seq(desc("a"), asc("b"))
    val naive = df.withColumn("global_rank",
      row_number().over(Window.orderBy(desc("a"), asc("b"))).cast("long"))
    for (parts <- Seq(3, 32)) {
      val got = TotalOrder.globalRank(df, keys, partitions = parts)
      assert(got.columns.sorted === naive.columns.sorted)
      val diff = got.join(naive, Seq("a", "b"))
        .where(got("global_rank") =!= naive("global_rank")).count()
      assert(diff === 0L, s"rank mismatch at partitions=$parts")
      assert(got.count() === df.count())
    }
  }

  test("ranks are a dense permutation of 1..n") {
    val got = TotalOrder.globalRank(df, Seq(asc("b"), asc("a")), partitions = 8)
    val agg = got.agg(min("global_rank"), max("global_rank"),
      countDistinct("global_rank"), count(lit(1))).head()
    assert(agg.getLong(0) === 1L)
    assert(agg.getLong(1) === agg.getLong(3))
    assert(agg.getLong(2) === agg.getLong(3))
  }

  test("prefixSum equals the single-window running sums at several partition counts") {
    val keys = Seq(asc("a"), asc("b"))
    val w = Window.orderBy(asc("a"), asc("b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = df
      .withColumn("cum_a", sum(col("a")).over(w))
      .withColumn("cum_b", sum(col("b")).over(w))
    for (parts <- Seq(3, 32)) {
      val got = TotalOrder.prefixSum(df, keys,
        Seq("a" -> "cum_a", "b" -> "cum_b"), partitions = parts)
      val diff = got.join(naive, Seq("a", "b"))
        .where(got("cum_a") =!= naive("cum_a") || got("cum_b") =!= naive("cum_b"))
        .count()
      assert(diff === 0L, s"prefix-sum mismatch at partitions=$parts")
      assert(got.count() === df.count())
    }
  }

  test("globalNtile equals the ntile window for bucket counts that divide evenly and not") {
    val keys = Seq(asc("b"), asc("a"))
    // 20000 % 4 == 0 (even buckets) and 20000 % 7 == 4 (ragged buckets)
    for (n <- Seq(4, 7)) {
      val naive = df.withColumn("t",
        ntile(n).over(Window.orderBy(asc("b"), asc("a"))).cast("long"))
      val got = TotalOrder.globalNtile(df, keys, n, "t", partitions = 8)
      val diff = got.join(naive.withColumnRenamed("t", "t2"), Seq("a", "b"))
        .where(col("t") =!= col("t2")).count()
      assert(diff === 0L, s"ntile mismatch at n=$n")
    }
  }

  test("globalNtile: fewer rows than buckets assigns bucket = rank") {
    val tiny = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("a", "b")
    val got = TotalOrder.globalNtile(tiny, Seq(asc("b")), 8, "t", partitions = 4)
      .orderBy("b").select("t").as[Long].collect().toSeq
    assert(got === Seq(1L, 2L, 3L))
  }

  test("adaptive variants: window and TeraSort paths agree on both sides of the cutover") {
    val keys = Seq(asc("a"), asc("b"))
    // cutover far above the data → window path; far below → range path
    val viaWindow = TotalOrder.globalRankAuto(df, keys, cutover = Long.MaxValue)
    val viaRange = TotalOrder.globalRankAuto(df, keys, cutover = 1L)
    val d1 = viaWindow.join(viaRange.withColumnRenamed("global_rank", "g2"), Seq("a", "b"))
      .where(col("global_rank") =!= col("g2")).count()
    assert(d1 === 0L)
    val psW = TotalOrder.prefixSumAuto(df, keys, Seq("a" -> "ca"), cutover = Long.MaxValue)
    val psR = TotalOrder.prefixSumAuto(df, keys, Seq("a" -> "ca"), cutover = 1L)
    val d2 = psW.join(psR.withColumnRenamed("ca", "c2"), Seq("a", "b"))
      .where(col("ca") =!= col("c2")).count()
    assert(d2 === 0L)
  }

  test("plan shape: the shuffle is a range exchange, not a single-partition sort") {
    val frag = TotalOrder.rangedByKey(df, Seq(asc("b")), 8)
    val plan = frag.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a RangePartitioning exchange in:\n$plan")
    assert(!plan.contains("SinglePartition"),
      s"row-scale data must never collapse to one partition:\n$plan")
  }

  test("statRowBound: footer-derived bounds are sound and zero-job; fallback only off-parquet") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val n = docs.count()
    // scan / filter / project / aggregate / limit / join shapes all
    // ground out at the parquet footer — each bound must hold (upper)
    // and the scan bound must be EXACT (footers record true counts)
    assert(TotalOrder.statRowBound(docs) === Some(n))
    assert(TotalOrder.statRowBound(
      docs.where(col("doc_id") % 7 === 0).select("doc_id")).exists(_ >= n / 7))
    assert(TotalOrder.statRowBound(docs.agg(count(lit(1)))) === Some(1L))
    assert(TotalOrder.statRowBound(docs.groupBy("lang").count()).exists(_ <= n))
    assert(TotalOrder.statRowBound(docs.limit(13)) === Some(13L))
    val joined = docs.crossJoin(docs.agg(max(col("doc_id")).as("mx")))
    assert(TotalOrder.statRowBound(joined).exists(b => b >= n && b <= 3 * n + 1))
    // the bench-path contract (VERDICT r14 #5): a footer-resolvable
    // input decides the single-task regime WITHOUT the pin+count
    // fallback — the observable is the fallback counter
    val before = TotalOrder.pinCountFallbacks.get()
    val (_, small) = TotalOrder.fitsOneTask(joined)
    assert(small, "fixture-scale input must prove the window regime")
    assert(TotalOrder.pinCountFallbacks.get() === before,
      "footer-resolvable input must not pay a branch-decision count job")
    // a non-parquet leaf (LogicalRDD) is underivable → counted fallback
    val rdd = spark.createDataFrame(docs.select("doc_id").rdd, docs.select("doc_id").schema)
    assert(TotalOrder.statRowBound(rdd).isEmpty)
    val (_, small2) = TotalOrder.fitsOneTask(rdd)
    assert(small2 && TotalOrder.pinCountFallbacks.get() === before + 1)
  }
}
