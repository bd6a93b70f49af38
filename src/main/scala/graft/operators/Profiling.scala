package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Column profiling — the data-quality summary a pipeline runs before
  * trusting a new source: per column, row count, null count, exact
  * distinct count, and min/max rendered as strings (the long format a
  * catalog stores regardless of column type).
  *
  * Scale shape: ONE scan. Every measure for every column computes in a
  * single global aggregate (partial+final, map-side combined), then the
  * one-row result unpivots driver-free into the long table via an
  * explode over a column-count-sized array of structs. Exact
  * multi-column distincts make Catalyst expand the scan k ways before
  * the partial agg — the price of exactness; at 100 TB profile with the
  * mergeable HLL sketches instead (the `sketch_rollup` posture,
  * Relational.scala) when ±2% suffices.
  *
  * min/max render through `CAST(x AS STRING)`: exact cross-engine for
  * integral/string/date columns. Floating-point columns should be
  * wrapped in an explicit decimal cast BY THE CALLER (the oracle float
  * rule) — engines disagree on float-to-text, not on floats. */
object Profiling {

  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnProfile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast(StringType).as(s"__mn_$c"),
        max(col(c)).cast(StringType).as(s"__mx_$c"))
    }
    val one = df.agg(count(lit(1)).as("__n"), aggs: _*)
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_null"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_s"),
        col(s"__mx_$c").as("max_s"))): _*)).as("p"))
      .select(col("p.*"))
  }
}
