package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.TopKByCount

class TopKByCountSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topk(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int): Seq[(String, Long)] =
    df.agg(udaf(new TopKByCount(k, cap), org.apache.spark.sql.Encoders.STRING)(col("v")).as("tk"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))

  test("exact below capacity: matches an independent count, deterministic order") {
    val data = Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq.fill(3)("c") ++ Seq("d")
    val out = topk(data.toDF("v").repartition(4), k = 3, cap = 16)
    assert(out === Seq(("a", 5L), ("b", 3L), ("c", 3L))) // b before c: value tie-break
  }

  test("over capacity: state stays bounded and heavy hitters survive") {
    // 2000 'hot' rows + 3000 singletons; capacity 50 → any value with
    // true frequency > N/capacity = 100 must be present with count
    // error <= 100
    val hot = Seq.fill(2000)("hot")
    val noise = (0 until 3000).map(i => s"u$i")
    val out = topk((hot ++ noise).toDF("v").repartition(8), k = 1, cap = 50)
    assert(out.head._1 === "hot")
    assert(out.head._2 >= 2000L - (5000L / 50) && out.head._2 <= 2000L)
  }

  private def topkImperative(df: org.apache.spark.sql.DataFrame, k: Int, cap: Int): Seq[(String, Long)] = {
    val agg = org.apache.spark.sql.GraftSqlShim.column(
      graft.functions.TopKByCountAgg(
        org.apache.spark.sql.GraftSqlShim.expression(col("v")), k, cap).toAggregateExpression())
    df.agg(agg.as("tk"))
      .head().getSeq[org.apache.spark.sql.Row](0).map(r => (r.getString(0), r.getLong(1)))
  }

  test("imperative-aggregate twin matches the Aggregator exactly under capacity") {
    val data = (Seq.fill(7)("x") ++ Seq.fill(5)("y") ++ Seq.fill(5)("a") ++
      (0 until 40).map(i => s"w$i")).toDF("v").repartition(6)
    val viaAggregator = topk(data, k = 10, cap = 256)
    val viaImperative = topkImperative(data, k = 10, cap = 256)
    assert(viaImperative === viaAggregator)
    // deterministic across runs (exact regime)
    assert(topkImperative(data, k = 10, cap = 256) === viaImperative)
  }

  test("imperative buffer serialization round-trips, including unicode and empty") {
    val agg = graft.functions.TopKByCountAgg(
      org.apache.spark.sql.GraftSqlShim.expression(col("v")), 3)
    val buf = scala.collection.mutable.HashMap("的" -> 9L, "" -> 1L, "plain" -> 4L)
    assert(agg.deserialize(agg.serialize(buf)) === buf)
    assert(agg.deserialize(agg.serialize(scala.collection.mutable.HashMap.empty[String, Long])).isEmpty)
  }

  test("imperative heavy-hitter bound matches the Aggregator contract over capacity") {
    val hot = Seq.fill(2000)("hot")
    val noise = (0 until 3000).map(i => s"u$i")
    val out = topkImperative((hot ++ noise).toDF("v").repartition(8), k = 1, cap = 50)
    assert(out.head._1 === "hot")
    assert(out.head._2 >= 2000L - (5000L / 50) && out.head._2 <= 2000L)
  }
}
