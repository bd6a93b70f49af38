package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.Cbo

class CboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.01"

  test("analyzed tables carry row-count and column statistics") {
    val tbl = Cbo.analyzedTables(spark, dir)
    val ss = Cbo.cboSession(spark)
    // plan statistics are computed under the ACTIVE session's conf —
    // with the CBO-off base session active, rowCount stays hidden even
    // though the catalog has it
    val prev = org.apache.spark.sql.SparkSession.getActiveSession
    org.apache.spark.sql.SparkSession.setActiveSession(ss)
    try tbl.values.foreach { t =>
      val stats = ss.table(t).queryExecution.optimizedPlan.stats
      assert(stats.rowCount.exists(_ > 0), s"$t: no row count from ANALYZE")
      assert(stats.attributeStats.nonEmpty, s"$t: no column stats from ANALYZE")
    } finally prev.foreach(org.apache.spark.sql.SparkSession.setActiveSession)
  }

  test("cost-based reorder joins the selective dim first; result unchanged") {
    val tbl = Cbo.analyzedTables(spark, dir)
    val sql = Cbo.segmentRevenueSql(tbl, "BUILDING")
    val plain = spark.sql(sql)            // base session: CBO off
    val cbo = Cbo.cboSession(spark).sql(sql)
    // the CONTRAST half: today's non-CBO planner keeps the written
    // fact-first order. A Spark minor upgrade could teach non-CBO rules
    // (ReorderJoin / star-schema detection) to reorder conditioned
    // inner joins too — that would erase the contrast, not the property
    // under test, so it is reported rather than failed.
    val writtenFirst = Cbo.innermostJoinTables(plain)
    if (writtenFirst != Set(tbl("lineitem"), tbl("orders")))
      info(s"non-CBO planner also reordered ($writtenFirst); contrast lost, CBO property still asserted")
    // with stats + CBO, the optimizer must NOT start with the two facts:
    // the filtered customer dim joins first
    val reorderedFirst = Cbo.innermostJoinTables(cbo)
    assert(reorderedFirst.contains(tbl("customer")),
      s"CBO did not pull the selective dim into the first join: $reorderedFirst")
    // identical answers either way
    val a = plain.collect().map(_.toString).sorted
    val b = cbo.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
