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
