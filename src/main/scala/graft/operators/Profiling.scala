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

  /** Robust outlier screen per group: median + MAD (median absolute
    * deviation) with the 5·MAD rule — the screen that survives the
    * outliers it hunts, where mean/stddev are dragged by the very
    * rows under test (Hampel; public standard practice). Entirely in
    * EXACT DECIMAL arithmetic over nearest-rank medians (the
    * event_gaps device: the picked value is a real data value, no
    * interpolation, so the hash cannot flap) — floats appear only in
    * the final presentation casts.
    *
    * Scale shape: two per-group rank windows (value, then deviation)
    * + one aggregate — parallelism is group count, a hot group is one
    * partition's sort. Output per group: (n, med, mad, n_outliers,
    * max_dev). */
  def madOutliers(df: DataFrame, groupCol: String = "event_type",
                  valueCol: String = "value", idCol: String = "event_id",
                  k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = df.select(col(groupCol).as("grp"), col(idCol).as("id"),
      col(valueCol).cast("decimal(18,2)").as("v"))
    val wAll = Window.partitionBy(col("grp"))
    def pick(in: DataFrame, ordCol: String, outCol: String): DataFrame = {
      val w = Window.partitionBy(col("grp")).orderBy(col(ordCol), col("id"))
      in.withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(wAll))
        .where(col("rn") === ceil(col("n") * lit(0.5)).cast("long"))
        .select(col("grp"), col(ordCol).as(outCol))
    }
    val med = pick(e, "v", "med")
    val dev = e.join(med, "grp").withColumn("dev", abs(col("v") - col("med")))
    val mad = pick(dev.select(col("grp"), col("id"), col("v"), col("dev")), "dev", "mad")
    dev.join(mad, "grp")
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"),
        max(col("med")).as("med_d"), max(col("mad")).as("mad_d"),
        sum(when(col("dev") > col("mad") * k, lit(1L)).otherwise(lit(0L))).as("n_outliers"),
        max(col("dev")).as("max_dev_d"))
      .select(col("grp").as(groupCol), col("n"),
        col("med_d").cast("double").as("med"),
        col("mad_d").cast("double").as("mad"),
        col("n_outliers"),
        col("max_dev_d").cast("double").as("max_dev"))
  }
}
