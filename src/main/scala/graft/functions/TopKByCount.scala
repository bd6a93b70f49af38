package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10 [NS]): top-k values by count with
  * BOUNDED state — a merge-based Misra-Gries summary (Agarwal et al.,
  * "Mergeable Summaries", PODS 2012).
  *
  * Buffer is a value→count map capped at `capacity` entries: when a
  * partial buffer exceeds 2×capacity, the (capacity+1)-th largest
  * count is subtracted from every counter and non-positive entries are
  * dropped (the batched form of the classic decrement-all step). The
  * summary is MERGEABLE with the bounded error below, but once
  * compression fires the retained counts depend on partitioning/merge
  * order — repeated runs, AQE re-plans, or task retries may produce
  * different (still within-error-bound) results; only the ≤ capacity
  * regime is deterministic, so exact-match oracles must stay under
  * capacity. Per-partition state is ≤ 2×capacity entries regardless of
  * key cardinality, which is what makes the operator safe on an open
  * vocabulary at 100 TB (the unbounded map it replaces melted a single
  * reducer).
  *
  * Exactness contract: if the number of DISTINCT values is ≤ capacity,
  * no compression ever fires and the result is exact (the registered
  * oracle query runs a 31-word vocabulary against capacity 1024).
  * Otherwise counts are lower bounds with error ≤ N/capacity and every
  * value with true frequency > N/capacity is guaranteed present —
  * the standard heavy-hitters guarantee.
  *
  * Output is (value, cnt) pairs ordered by (cnt desc, value asc) —
  * deterministic, oracle-checkable.
  */
class TopKByCount(k: Int, capacity: Int = 1024) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {
  require(capacity >= k, s"capacity=$capacity must be >= k=$k")

  /** Subtract the (capacity+1)-th largest count from everything and
    * drop the non-positive remainder; ≤ capacity entries survive. */
  private def compress(m: Map[String, Long]): Map[String, Long] =
    if (m.size <= 2 * capacity) m
    else {
      val threshold = m.valuesIterator.toArray.sortBy(-_).apply(capacity)
      m.collect { case (v, c) if c > threshold => (v, c - threshold) }
    }

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    compress(b.updated(a, b.getOrElse(a, 0L) + 1L))

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    compress(small.foldLeft(large) { case (acc, (v, c)) => acc.updated(v, acc.getOrElse(v, 0L) + c) })
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
