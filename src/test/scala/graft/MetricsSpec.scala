package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MetricsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def shuffleQuery() = {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    orders.groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
  }

  test("summarize reads scan/shuffle/exchange metrics off an executed plan") {
    val df = shuffleQuery()
    val rows = df.collect()
    val s = Metrics.of(df)
    assert(s.scanRows > 0, s.toString)           // the parquet scan counted its rows
    assert(s.shuffleExchanges >= 1, s.toString)  // groupBy shuffled
    assert(s.shuffleRecordsWritten > 0, s.toString)
    assert(s.shuffleBytesWritten > 0, s.toString)
    assert(s.codegenSpans >= 1, s.toString)      // agg pipeline is codegen'd
    assert(s.spillBytes === 0, s.toString)       // nothing spills at this scale
    // the JSON line is well-formed enough to embed in tooling output
    assert(s.jsonLine.contains("\"shuffle_records\":" + s.shuffleRecordsWritten))
    assert(rows.nonEmpty)
  }

  test("spill path engages under memory pressure and is observable") {
    // isolated session: force the window buffers to spill after 16
    // rows — the disk path a 100 TB partition actually exercises,
    // proven working and observable at test scale (WindowExec is the
    // operator family that carries a spillSize SQLMetric; SMJ buffers
    // report to task metrics instead)
    val ss = spark.newSession()
    ss.conf.set("spark.sql.windowExec.buffer.in.memory.threshold", "16")
    ss.conf.set("spark.sql.windowExec.buffer.spill.threshold", "16")
    ss.conf.set("spark.sql.adaptive.enabled", "false")
    val orders = ss.read.parquet("/root/testdata/sf0.001/orders.parquet")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderstatus")).orderBy(col("o_orderkey"))
    // NO rank filter: a `rn <= k` predicate triggers the
    // WindowGroupLimit pushdown and the buffers never fill — the whole
    // partition must flow through WindowExec for the spill to engage
    val ranked = orders.withColumn("rn", row_number().over(w))
      .select(col("o_orderstatus"), col("o_orderkey"), col("rn"))
    ranked.collect()
    val s = Metrics.of(ranked)
    assert(s.spillBytes > 0, s"expected window buffer spill, got $s")
    // and the result is still exact — spilling changes I/O, not answers
    val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("rn", row_number().over(w))
      .select(col("o_orderstatus"), col("o_orderkey"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    val got = ranked.collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === expected)
  }

  test("recorder captures summaries for session actions via the listener bus") {
    val rec = Metrics.install(spark)
    try {
      shuffleQuery().collect()
      // listener callbacks are asynchronous: poll briefly
      val deadline = System.nanoTime() + 30L * 1000000000L
      var got = rec.snapshot
      while (got.isEmpty && System.nanoTime() < deadline) {
        Thread.sleep(50)
        got = rec.snapshot
      }
      assert(got.nonEmpty, "no listener callback within 30s")
      val s = got.last
      assert(s.shuffleExchanges >= 1, s.toString)
      assert(s.durationMs >= 0)
      assert(s.funcName.nonEmpty)
    } finally Metrics.uninstall(spark, rec)
  }
}
