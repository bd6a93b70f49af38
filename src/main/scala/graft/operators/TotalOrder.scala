package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.plans.Lineage.TruncateOps

/** Total-order operators: exact global ranking over an arbitrarily
  * large table without ever sorting it in one task.
  *
  * The reference's only ordering is a driver-side qsort of the final
  * 30-bin histogram (map_reduce.cpp:583-600) — fine for 30 rows,
  * meaningless at table scale. The Spark-native shape is TeraSort's:
  * range-partition on the sort key so partition i holds keys strictly
  * below partition i+1, sort WITHIN partitions (parallel), then turn
  * per-partition positions into global positions by adding the row
  * counts of the preceding partitions.
  */
object TotalOrder {

  /** Exact `row_number() OVER (ORDER BY sortCols)` at cluster scale.
    *
    * `sortCols` must be a TOTAL order (include a unique tie-break):
    * then the global rank of a row is a pure function of its key, and
    * the result is independent of where the range partitioner happens
    * to place its boundaries — sampling nondeterminism cannot leak
    * into the answer.
    *
    * Construction: one range exchange + in-partition sort (the
    * TeraSort shuffle), materialized ONCE via localCheckpoint so the
    * two consumers below read the same partitioning — per-partition
    * counts and the row-level rank are otherwise separate jobs that
    * would re-run the exchange with independently sampled bounds.
    * Partition counts (≤ `partitions` rows) prefix-sum into offsets on
    * a single-partition window — over dozens of rows, not data — and
    * broadcast-join back; the in-partition position is a window
    * partitioned by partition id, so the row-scale work stays spread
    * across the cluster. Cost: two row-scale shuffles (range + pid
    * hash), one tiny broadcast. */
  /** The TeraSort fragment: range exchange + in-partition sort +
    * partition id. Package-visible so the plan-shape spec can assert
    * the RangePartitioning exchange on the PRE-checkpoint plan (the
    * checkpoint truncates lineage in the composed operator). */
  private[graft] def rangedByKey(df: DataFrame, sortCols: Seq[Column],
                                 partitions: Int): DataFrame =
    df.repartitionByRange(partitions, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())

  def globalRank(df: DataFrame, sortCols: Seq[Column],
                 rankCol: String = "global_rank", partitions: Int = 32): DataFrame = {
    val ranged = rangedByKey(df, sortCols, partitions).truncateLineage
    val offsets = ranged
      .groupBy(col("__pid")).agg(count(lit(1)).as("__cnt"))
      // single-partition window over ≤ `partitions` aggregate rows —
      // the one place a global order is computed, and it never sees
      // row-scale data
      .withColumn("__off", coalesce(
        sum(col("__cnt")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col("__pid"), col("__off"))
    val within = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    ranged
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn(rankCol, row_number().over(within).cast(LongType) + col("__off"))
      .drop("__pid", "__off")
  }

  /** Rows at or below this take a plain single-task ORDER BY window:
    * a few million rows of sort keys fit one task trivially, and the
    * range machinery's FIXED cost — an exchange, a checkpoint, a
    * broadcast, ~2s of scheduling — would dominate. Above it, the
    * TeraSort path is mandatory: this constant is the explicit,
    * tested statement of where "a global window is fine" stops being
    * true. Both paths are value-identical (TotalOrderSpec proves
    * window-equality), so the cutover can never move a hash. */
  val WindowCutover = 4000000L

  /** Static UPPER bound on `df`'s row count, derived with zero Spark
    * jobs: walk the optimized logical plan and bound each node from
    * its children, grounding out at parquet footer record counts
    * (driver metadata reads — no data pages, no tasks). Sound by
    * construction — every case only over-counts (filters keep ≤ child
    * rows, aggregates emit ≤ child rows, joins emit ≤ l·r + l + r) —
    * so a bound at or below [[WindowCutover]] PROVES the single-task
    * window regime is safe, which is the only direction the cutover
    * decision consumes. None = underivable (a generator, a non-parquet
    * leaf, a truncated lineage); the caller falls back to pin+count.
    * VERDICT r14 #5: this is what retires the branch-decision count
    * job — scan/filter/aggregate-shaped inputs (the registered
    * histogram and rank feeds) resolve from footers alone. */
  def statRowBound(df: DataFrame): Option[Long] = {
    import org.apache.spark.sql.catalyst.plans.{logical => L}
    import org.apache.spark.sql.catalyst.plans.{LeftSemi, LeftAnti}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
    def satAdd(a: Long, b: Long): Long =
      { val s = a + b; if (((a ^ s) & (b ^ s)) < 0) Long.MaxValue else s }
    def satMul(a: Long, b: Long): Long =
      if (a != 0 && b > Long.MaxValue / a) Long.MaxValue else a * b
    def boundOf(p: L.LogicalPlan): Option[Long] = p match {
      case n: L.Project => boundOf(n.child)
      case n: L.Filter => boundOf(n.child)
      case n: L.SubqueryAlias => boundOf(n.child)
      case n: L.Sort => boundOf(n.child)
      case n: L.RepartitionOperation => boundOf(n.child)
      case n: L.Window => boundOf(n.child)
      case n: L.Sample =>
        // with-replacement sampling can emit MORE rows than its child
        // (fraction > 1 draws each row multiple times), so a child
        // pass-through would break the upper-bound contract; scale by
        // the ceiling of the sampled fraction instead
        if (!n.withReplacement) boundOf(n.child)
        else boundOf(n.child).map(
          satMul(_, math.max(1L, math.ceil(n.upperBound - n.lowerBound).toLong)))
      case n: L.Deduplicate => boundOf(n.child)
      case n: L.Aggregate =>
        if (n.groupingExpressions.isEmpty) Some(1L) else boundOf(n.child)
      case n: L.GlobalLimit => n.limitExpr match {
        case Literal(v: Int, _) =>
          Some(boundOf(n.child).fold(v.toLong)(math.min(v.toLong, _)))
        case _ => boundOf(n.child)
      }
      case n: L.LocalLimit => boundOf(n.child)
      case n: L.Union =>
        n.children.foldLeft(Option(0L)) { (acc, c) =>
          for (a <- acc; b <- boundOf(c)) yield satAdd(a, b) }
      case n: L.Join => n.joinType match {
        case LeftSemi | LeftAnti => boundOf(n.left)
        case _ => for (l <- boundOf(n.left); r <- boundOf(n.right))
          yield satAdd(satMul(l, r), satAdd(l, r))
      }
      case n: L.Expand =>
        boundOf(n.child).map(satMul(_, n.projections.size.toLong))
      case n: L.LocalRelation => Some(n.data.length.toLong)
      case n: L.Range =>
        if (n.numElements.isValidLong) Some(n.numElements.toLong) else Some(Long.MaxValue)
      case _: L.OneRowRelation => Some(1L)
      case rel: LogicalRelation => rel.relation match {
        case fs: HadoopFsRelation if fs.fileFormat.isInstanceOf[ParquetFileFormat] =>
          graft.sources.Tables.parquetFilesRowCount(df.sparkSession,
            fs.location.inputFiles.toSeq)
        case _ => None
      }
      case _ => None
    }
    if (df.isStreaming) None
    else scala.util.Try(boundOf(df.queryExecution.optimizedPlan)).toOption.flatten
  }

  /** Decide whether `df` fits the single-task window regime. First
    * consults [[statRowBound]]: a footer-proven bound at or below the
    * cutover decides SMALL with zero jobs and no pin (nothing
    * evaluated the frame, so there is nothing to keep from
    * re-running). Otherwise pin once (localCheckpoint) and count —
    * callers reuse the returned frame for either path so upstream
    * work runs exactly once. A bound ABOVE the cutover still counts
    * (it is only an upper bound — a filtered fixture-scale input must
    * not be pushed onto the TeraSort branch's fixed costs by an
    * unselective estimate). */
  /** Count of pin+count fallbacks taken by [[fitsOneTask]] since JVM
    * start — the observable the zero-count-jobs audit reads (a spec
    * asserts footer-resolvable inputs leave it untouched). */
  val pinCountFallbacks = new java.util.concurrent.atomic.AtomicLong(0)

  def fitsOneTask(df: DataFrame, cutover: Long = WindowCutover): (DataFrame, Boolean) = {
    statRowBound(df) match {
      case Some(bound) if bound <= cutover => (df, true)
      case _ =>
        pinCountFallbacks.incrementAndGet()
        val p = df.truncateLineage
        (p, p.count() <= cutover)
    }
  }

  /** Exact `sum(c) OVER (ORDER BY sortCols ROWS UNBOUNDED PRECEDING)`
    * for each (input, output) pair in `sums`, at cluster scale: the
    * same two-level TeraSort decomposition as [[globalRank]] — range
    * exchange + in-partition running sums (parallel), per-partition
    * TOTALS prefix-summed on a ≤`partitions`-row window, broadcast
    * back as offsets. `sortCols` must be a total order so the result
    * is independent of sampled range boundaries. Inputs are summed as
    * LongType — the callers are exact-integer counters by design. */
  def prefixSum(df: DataFrame, sortCols: Seq[Column],
                sums: Seq[(String, String)], partitions: Int = 32): DataFrame = {
    require(sums.nonEmpty, "prefixSum needs at least one (in, out) pair")
    val ranged = rangedByKey(df, sortCols, partitions).truncateLineage
    val totals = ranged.groupBy(col("__pid"))
      .agg(sums.map { case (in, out) =>
        sum(col(in).cast(LongType)).as(s"__t_$out") }.head,
        sums.tail.map { case (in, out) =>
          sum(col(in).cast(LongType)).as(s"__t_$out") }: _*)
    val offsets = sums.foldLeft(totals) { case (acc, (_, out)) =>
      acc.withColumn(s"__off_$out", coalesce(
        sum(col(s"__t_$out")).over(
          Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
    }.select(col("__pid") +: sums.map { case (_, out) => col(s"__off_$out") }: _*)
    val within = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sums.foldLeft(ranged.join(broadcast(offsets), Seq("__pid"))) {
      case (acc, (in, out)) =>
        acc.withColumn(out, sum(col(in).cast(LongType)).over(within) + col(s"__off_$out"))
    }.drop("__pid" +: sums.map { case (_, out) => s"__off_$out" }: _*)
  }

  /** Exact `ntile(n) OVER (ORDER BY sortCols)` at cluster scale:
    * global rank via [[globalRank]] (range-partitioned — no
    * single-task sort), then the SQL-standard bucket arithmetic in
    * pure integers: with N rows the first N mod n buckets hold
    * ⌈N/n⌉ rows and the rest ⌊N/n⌋ — exactly Spark's and DuckDB's
    * NTile, so results are drop-in hash-compatible with the window
    * form. `sortCols` must be a total order (unique tie-break). */
  def globalNtile(df: DataFrame, sortCols: Seq[Column], n: Int,
                  tileCol: String, partitions: Int = 32): DataFrame = {
    val ranked = globalRank(df, sortCols, rankCol = "__rk", partitions)
    // count off the ranked side — its lineage is already truncated at
    // the checkpoint inside globalRank, so this never re-reads `df`
    val cnt = ranked.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(cnt))
      .withColumn(tileCol, expr(
        s"""CASE WHEN __rk <= (__n % $n) * (__n div $n + 1)
           |     THEN (__rk - 1) div (__n div $n + 1) + 1
           |     ELSE (__n % $n) + (__rk - 1 - (__n % $n) * (__n div $n + 1)) div (__n div $n) + 1
           |END""".stripMargin).cast(LongType))
      .drop("__rk", "__n")
  }

  /** Adaptive [[globalRank]]: plain window below [[WindowCutover]],
    * TeraSort path above. One checkpoint + one count either way. */
  def globalRankAuto(df: DataFrame, sortCols: Seq[Column],
                     rankCol: String = "global_rank", partitions: Int = 32,
                     cutover: Long = WindowCutover): DataFrame = {
    val (p, small) = fitsOneTask(df, cutover)
    if (small)
      p.withColumn(rankCol, row_number().over(Window.orderBy(sortCols: _*)).cast(LongType))
    else globalRank(p, sortCols, rankCol, partitions)
  }

  /** Adaptive [[prefixSum]] (same cutover rule). */
  def prefixSumAuto(df: DataFrame, sortCols: Seq[Column],
                    sums: Seq[(String, String)], partitions: Int = 32,
                    cutover: Long = WindowCutover): DataFrame = {
    require(sums.nonEmpty, "prefixSumAuto needs at least one (in, out) pair")
    val (p, small) = fitsOneTask(df, cutover)
    if (small) {
      val w = Window.orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      sums.foldLeft(p) { case (acc, (in, out)) =>
        acc.withColumn(out, sum(col(in).cast(LongType)).over(w))
      }
    } else prefixSum(p, sortCols, sums, partitions)
  }
}
