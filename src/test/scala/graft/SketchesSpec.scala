package graft

import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
  private lazy val lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")

  test("bloom semi-filter: no false negatives, bounded false positives") {
    val urgent = orders.where(col("o_orderpriority") === "1-URGENT")
    val filtered = Sketches.bloomSemiFilter(
        urgent, "o_orderkey", lineitem, "l_orderkey",
        expectedItems = 10000, numBits = 100000)
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSet
    val exact = lineitem.join(urgent, lineitem("l_orderkey") === urgent("o_orderkey"), "left_semi")
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSet
    assert(exact.subsetOf(filtered), "bloom filter produced a false negative")
    // 10 bits/item ≈ 1% FPR: the candidate set must stay close to exact
    val universe = lineitem.select(col("l_orderkey")).distinct().count()
    val fp = (filtered -- exact).size.toDouble
    assert(fp <= math.max(5.0, 0.05 * universe), s"$fp false positives of $universe keys")
    // deterministic across runs (no seed, fixed hashing)
    val again = Sketches.bloomSemiFilter(urgent, "o_orderkey", lineitem, "l_orderkey",
        expectedItems = 10000, numBits = 100000)
      .select(col("l_orderkey")).collect().map(_.getLong(0)).toSet
    assert(again === filtered)
  }

  test("bloom functions work from SQL with a scalar-subquery build") {
    orders.createOrReplaceTempView("orders_bf")
    lineitem.createOrReplaceTempView("lineitem_bf")
    val n = spark.sql(
      """SELECT count(*) AS n FROM lineitem_bf
        |WHERE might_contain(
        |  (SELECT bloom_filter_agg(o_orderkey, 10000L, 100000L)
        |   FROM orders_bf WHERE o_orderpriority = '1-URGENT'),
        |  l_orderkey)""".stripMargin).head().getLong(0)
    val exact = lineitem.join(
        orders.where(col("o_orderpriority") === "1-URGENT"),
        lineitem("l_orderkey") === orders("o_orderkey"), "left_semi").count()
    assert(n >= exact, s"SQL bloom dropped true matches: $n < $exact")
    assert(n <= lineitem.count())
  }

  test("count-min estimates: always >= truth, within eps*N") {
    val sketchBytes = Sketches.countMinSketch(lineitem, "l_orderkey", eps = 0.001)
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val truth = lineitem.groupBy(col("l_orderkey")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = truth.map(_._2).sum
    truth.take(200).foreach { case (k, exact) =>
      val est = cms.estimateCount(k)
      assert(est >= exact, s"count-min under-counted $k: $est < $exact")
      assert(est <= exact + math.ceil(0.001 * n).toLong + 1, s"$k est $est vs $exact (N=$n)")
    }
  }

  test("compacted sink bounds parquet file sizes in both directions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val rows = graft.sources.Sinks.writeCompacted(
      lineitem.select(col("l_orderkey"), col("l_quantity")), dir, targetRowsPerFile = 1000L)
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    val expected = math.ceil(rows / 1000.0).toLong
    assert(files.length >= expected && files.length <= expected * 2,
      s"${files.length} files for $rows rows (target 1000/file)")
    // ceiling respected per file, and nothing was lost
    val back = spark.read.parquet(dir)
    assert(back.count() === rows)
    val maxPerFile = back.groupBy(input_file_name()).count()
      .agg(max(col("count"))).head().getLong(0)
    assert(maxPerFile <= 1000L, s"a file holds $maxPerFile rows")
  }

  test("HLL sketches merge exactly: union of partials == one direct build, error bounded") {
    val c = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
    // partial per-nation sketches unioned up to segment level…
    val merged = c.groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(expr("hll_sketch_agg(c_custkey)").as("sk"))
      .groupBy(col("c_mktsegment"))
      .agg(expr("CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // …must estimate exactly what a single whole-group sketch estimates
    // (sketch state is a commutative monoid; merge loses nothing)
    val direct = c.groupBy(col("c_mktsegment"))
      .agg(expr("CAST(hll_sketch_estimate(hll_sketch_agg(c_custkey)) AS BIGINT)").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(merged === direct)
    // and the estimate tracks the exact distinct count (default lgK=12
    // keeps relative error ~1.6%; keys here are unique per customer)
    val exact = c.groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_custkey")).as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (seg, n) =>
      assert(math.abs(merged(seg) - n) <= math.max(2L, (n * 0.05).toLong),
        s"$seg: est ${merged(seg)} vs exact $n")
    }
  }
}
