package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Grouped top-k as a first-class operator: the top `k` rows per key
  * under an explicit ordering — the query every leaderboard / "best n
  * per group" pipeline writes as `row_number().over(window) <= k`.
  *
  * The window formulation SORTS every group in full (a per-partition
  * sort of the whole input after the shuffle). This operator keeps a
  * bounded k-row heap per key instead, in two phases:
  *   partial (map side, before any exchange): each input partition
  *     reduces to at most k rows per key it has seen — correct because
  *     topK(A ∪ B) = topK(topK(A) ∪ topK(B));
  *   final: requires ClusteredDistribution(keys) (Catalyst inserts the
  *     hash exchange), merges the partial heaps, emits each key's rows
  *     in sort order.
  * So the shuffle moves at most k rows per (partition, key) and nothing
  * is ever fully sorted — O(n log k) per partition vs the window's
  * O(n log n).
  *
  * Memory posture at scale: the partial phase holds k rows per distinct
  * key seen in the partition, which is unbounded in key cardinality —
  * so it is SIZE-TRACKED. Once `maxPartialRows` retained rows are held,
  * rows of keys not already tracked pass straight through to the
  * exchange unreduced (the partial phase is an optimization; skipping
  * it is always correct — the same bail-out posture as Spark's own
  * skip-partial-aggregation). The final phase stays exact: after the
  * hash exchange a partition's retained state is at most its share of
  * the RESULT (k rows per key it owns), which the query materializes
  * anyway — the one regime where the window formulation is still
  * preferable is result-bigger-than-memory, where its external sort
  * spills to disk.
  *
  * The whole stack — logical node, planner strategy, two physical
  * operators — registers through SparkSessionExtensions
  * (graft.GraftExtensions), the pattern for whole-operator semantics
  * the built-in operators cannot express (SURVEY.md §2.10 / builder
  * contract option (c)).
  */
case class GroupedTopKNode(k: Int, keys: Seq[Attribute], ordering: Seq[SortOrder],
                           child: LogicalPlan,
                           maxPartialRows: Int = GroupedTopK.DefaultMaxPartialRows) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class GroupedTopKExec(k: Int, keys: Seq[Attribute], ordering: Seq[SortOrder],
                           partial: Boolean, maxPartialRows: Int,
                           child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil else ClusteredDistribution(keys) :: Nil

  override lazy val metrics = Map(
    "overflowRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "rows passed through on partial overflow"))

  override protected def doExecute(): RDD[InternalRow] = {
    // locals only: the closure must not capture `this` (SparkPlans are
    // not serializable), and projections are built per-partition on the
    // executor (UnsafeProjection is not serializable either)
    val kk = k
    val keyExprs = keys
    val ordExprs = ordering
    val childOutput = child.output
    val isPartial = partial
    val maxRows = if (partial) maxPartialRows else Int.MaxValue
    val overflowMetric = longMetric("overflowRows")
    child.execute().mapPartitions { it =>
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(ordExprs, childOutput)
      // per key: a max-heap under the sort order, so the WORST retained
      // row is on top and evicts first — classic bounded top-k
      val heaps = scala.collection.mutable.HashMap.empty[UnsafeRow, scala.collection.mutable.PriorityQueue[InternalRow]]
      var retained = 0L
      // Partial-phase overflow: rows whose key is NOT already tracked
      // once the retained-row budget is spent skip reduction and flow
      // straight to the exchange (correct: partial top-k is an
      // optimization, topK(A ∪ B) = topK(topK(A) ∪ B)). Keys already
      // tracked keep reducing — their heaps cannot grow past k each.
      // The final phase never overflows (maxRows = MaxValue): its state
      // is the partition's share of the result.
      val reduced = it.flatMap { row =>
        val keyRow = keyProj(row) // reused buffer: copy only on first insert
        heaps.get(keyRow) match {
          case Some(heap) =>
            if (heap.size < kk) { heap.enqueue(row.copy()); retained += 1 }
            else if (rowOrd.compare(row, heap.head) < 0) { heap.dequeue(); heap.enqueue(row.copy()) }
            Iterator.empty
          case None if retained >= maxRows && isPartial =>
            overflowMetric += 1
            Iterator.single(row)
          case None =>
            val h = scala.collection.mutable.PriorityQueue.empty[InternalRow](rowOrd)
            h.enqueue(row.copy())
            heaps.put(keyRow.copy(), h)
            retained += 1
            Iterator.empty
        }
      }
      // lazy tail: the heap dump must run only after the input iterator
      // is fully drained
      reduced ++ Iterator.single(()).flatMap(_ =>
        heaps.valuesIterator.flatMap(h => h.dequeueAll.reverseIterator))
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Plans GroupedTopKNode as partial → (exchange from the distribution
  * requirement) → final. */
object GroupedTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupedTopKNode(k, keys, ordering, child, maxPartialRows) =>
      GroupedTopKExec(k, keys, ordering, partial = false, maxPartialRows,
        GroupedTopKExec(k, keys, ordering, partial = true, maxPartialRows,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

object GroupedTopK {
  /** Partial-phase retained-row budget before overflow pass-through:
    * 4M rows ≈ low hundreds of MB at typical row widths — well under
    * an executor-core's share of memory, and far above any leaderboard
    * working set. */
  val DefaultMaxPartialRows: Int = 4 * 1024 * 1024

  /** Top `k` rows per `keyCols` ordered by `orderCols` (name →
    * descending?). Ties broken by the later order columns — supply a
    * unique tie-break for deterministic output, exactly as with
    * row_number. */
  def topKPerKey(df: DataFrame, keyCols: Seq[String], orderCols: Seq[(String, Boolean)],
                 k: Int, maxPartialRows: Int = DefaultMaxPartialRows): DataFrame = {
    val lp = df.queryExecution.analyzed
    def attr(n: String): Attribute = lp.output.find(_.name == n).getOrElse(
      throw new IllegalArgumentException(s"no column $n in ${lp.output.map(_.name)}"))
    val ordering = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftSqlShim.ofRows(df.sparkSession,
      GroupedTopKNode(k, keyCols.map(attr), ordering, lp, maxPartialRows))
  }
}
