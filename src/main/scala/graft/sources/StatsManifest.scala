package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** File-level data skipping: a clustered parquet layout plus a
  * per-file min/max statistics manifest — the poor-man's core of
  * every table format (Delta/Iceberg/Hudi file statistics), built
  * from nothing but parquet and one extra column scan.
  *
  * Why it matters at 100 TB: partition pruning only cuts directories;
  * within a partition a 100 TB table is still tens of thousands of
  * files, and a selective range predicate on a CLUSTERED column can
  * skip almost all of them before a single task launches. Parquet's
  * own row-group stats do this one level lower, but only after a task
  * has opened the file; manifest pruning cuts the task list itself —
  * the difference between scheduling 40 000 tasks and 40.
  *
  * Skipping is only as good as the clustering. `writeClustered`
  * range-partitions on the cluster key so per-file intervals are
  * near-disjoint; for multi-column boxes, cluster on [[zValue]] so
  * BOTH dimensions have file-level locality.
  */
object StatsManifest {

  private def dataDir(dir: String) = s"$dir/data"
  private def manifestDir(dir: String) = s"$dir/_manifest"

  /** Bit-interleaved Z-order value of two non-negative ints (16 bits
    * each): consecutive z-values are close in BOTH a and b, so a
    * z-clustered layout gives file-level min/max locality on each
    * dimension at once — the standard multi-dimensional clustering
    * move. Pure shift/or/and expression tree: codegen'd, no UDF. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(a.cast(LongType).bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(b.cast(LongType).bitwiseAND(lit(1L << i)), i + 1))
    }

  /** Write `df` into `nFiles` parquet files clustered on `clusterExpr`
    * (range partition + in-file sort), then write a per-file manifest
    * with min/max of each column in `statsCols` plus row counts.
    *
    * The stats pass re-scans only `statsCols` grouped by
    * `input_file_name` — narrow and parallel. A production writer
    * collects the same numbers from write-task statistics for free;
    * the contract (one manifest row per data file) is identical. */
  def writeClustered(df: DataFrame, dir: String, clusterExpr: Column,
                     statsCols: Seq[String], nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, clusterExpr)
      .sortWithinPartitions(clusterExpr)
      .write.mode("overwrite").parquet(dataDir(dir))
    val spark = df.sparkSession
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    spark.read.parquet(dataDir(dir))
      .select(input_file_name().as("file") +: statsCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(dir))
  }

  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(manifestDir(dir))

  /** Plan a pruned scan for a conjunction of range predicates
    * `lo <= col <= hi`: consult the manifest (file-count-sized,
    * driver-collected — the same scale class as Spark's own file
    * index), load only files whose [min, max] interval intersects
    * EVERY predicate, and re-apply the row-level filter. Returns the
    * dataframe plus (files scanned, files total) so callers — and the
    * spec — can see the skip rate. Multi-column boxes prune well only
    * over a [[zValue]]-clustered layout; a linear layout has file
    * locality on its one sort column alone. */
  def scanPruned(spark: SparkSession, dir: String,
                 preds: Seq[(String, Column, Column)]): (DataFrame, Long, Long) = {
    val m = readManifest(spark, dir)
    val total = m.count()
    val fileHits = preds.foldLeft(m) { case (acc, (c, lo, hi)) =>
      acc.where(col(s"min_$c") <= hi && col(s"max_$c") >= lo)
    }
    val hit = fileHits.select(col("file")).collect().map(_.getString(0))
    val pruned =
      if (hit.isEmpty) spark.read.parquet(dataDir(dir)).where(lit(false))
      else spark.read.parquet(hit.toIndexedSeq: _*)
    val filtered = preds.foldLeft(pruned) { case (acc, (c, lo, hi)) =>
      acc.where(col(c) >= lo && col(c) <= hi)
    }
    (filtered, hit.length.toLong, total)
  }
}
