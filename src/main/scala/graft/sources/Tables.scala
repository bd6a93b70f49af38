package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (TESTDATA.md): one
  * parquet file per table under `dir` (e.g. /root/testdata/sf0.01).
  *
  * Parquet is the primary source of the engine (reference analog: the
  * `./RawText/` directory scan, map_reduce.cpp:477-495, replaced by
  * Spark's InMemoryFileIndex + vectorized columnar scan). Filters and
  * projections applied downstream reach the scan via Catalyst pushdown.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = t("region")
  def nation: DataFrame = t("nation")
  def customer: DataFrame = t("customer")
  def supplier: DataFrame = t("supplier")
  def part: DataFrame = t("part")
  def orders: DataFrame = t("orders")
  def lineitem: DataFrame = t("lineitem")
  /** events.ts is nanosecond-precision INT64 parquet, which Spark 4
    * refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]). Read it
    * as raw nanos and floor-divide to microseconds — exactly what
    * DuckDB's CAST(ts_ns AS TIMESTAMP) does, keeping the oracle
    * bit-identical. Integer `div`, not `/`: epoch-nanos ~1.7e18
    * exceeds double precision.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true`, set at
    * session BUILD (Bench/Verify/Explain/TestSpark) — a loader must
    * not mutate session config as a side effect. */
  def events: DataFrame = {
    require(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "set spark.sql.legacy.parquet.nanosAsLong=true at session build to read events.parquet")
    t("events").withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents: DataFrame = t("documents")
  def embeddings: DataFrame = t("embeddings")
}
