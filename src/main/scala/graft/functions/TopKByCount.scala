package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.10 [NS]): exact top-k values by count.
  *
  * Buffer is a value→count map, so partial aggregation happens
  * map-side and `merge` is associative+commutative — the same
  * contract the reference's binned-hashmap merge relies on
  * (map_reduce.cpp:426-436), which also makes it usable as a
  * streaming aggregation state. Exact (no pruning): intended for
  * moderate-cardinality keys; for unbounded cardinality compose
  * with a pre-filter or use a sketch.
  *
  * Output is (value, cnt) pairs ordered by (cnt desc, value asc) —
  * deterministic, oracle-checkable.
  */
class TopKByCount(k: Int) extends Aggregator[String, Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.updated(a, b.getOrElse(a, 0L) + 1L)

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foldLeft(large) { case (acc, (v, c)) => acc.updated(v, acc.getOrElse(v, 0L) + c) }
  }

  override def finish(m: Map[String, Long]): Seq[(String, Long)] =
    m.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)

  override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[(String, Long)]] = ExpressionEncoder()
}
