package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for all suites (creation costs seconds). */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder().withExtensions(new GraftExtensions)
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.ansi.enabled", "false")
    // events.parquet carries TIMESTAMP(NANOS) — see Tables.events
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
