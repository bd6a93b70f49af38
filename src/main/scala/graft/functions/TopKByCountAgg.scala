package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The TypedImperativeAggregate form of [[TopKByCount]]: identical
  * Misra-Gries semantics (bounded state, exact under `capacity`, see
  * that class's scaladoc for the error contract), but implemented at
  * the Catalyst layer instead of the typed `Aggregator` API.
  *
  * Why both exist: the `Aggregator` buffers through an
  * ExpressionEncoder — every partial result crossing the exchange is a
  * Catalyst `MapType` that must be converted to/from a Scala `Map` per
  * merge. A TypedImperativeAggregate holds the live `mutable.HashMap`
  * as a raw JVM object inside the aggregation buffer and serializes it
  * ONCE per partition into a compact length-prefixed byte buffer — the
  * object-vs-encoder tradeoff every engine's imperative aggregates
  * (HLL, percentile sketches, count-min) are built on, demonstrated
  * here as the remaining §2.10 aggregate extension point.
  *
  * Output: array<struct<value string, cnt long>> ordered by
  * (cnt desc, value asc) — identical to [[TopKByCount]], and proven
  * equal in TopKByCountSpec.
  */
case class TopKByCountAgg(
    child: Expression,
    k: Int,
    capacity: Int = 1024,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity >= k, s"capacity=$capacity must be >= k=$k")

  override def children: Seq[Expression] = child :: Nil
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("value", StringType), StructField("cnt", LongType))))
  override def prettyName: String = "topk_by_count"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  /** Batched Misra-Gries decrement: same rule as TopKByCount.compress. */
  private def compress(m: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] =
    if (m.size <= 2 * capacity) m
    else {
      val threshold = m.valuesIterator.toArray.sortBy(-_).apply(capacity)
      m.filterInPlace((_, c) => c > threshold)
      m.mapValuesInPlace((_, c) => c - threshold)
      m
    }

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val s = v.asInstanceOf[UTF8String].toString
      buf.update(s, buf.getOrElse(s, 0L) + 1L)
      compress(buf)
    }
  }

  override def merge(b1: mutable.HashMap[String, Long], b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (small, large) = if (b1.size < b2.size) (b1, b2) else (b2, b1)
    small.foreach { case (v, c) => large.update(v, large.getOrElse(v, 0L) + c) }
    compress(large)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (v, c) => (-c, v) }.take(k)
    new GenericArrayData(top.map { case (v, c) =>
      InternalRow(UTF8String.fromString(v), c)
    }.toArray[Any])
  }

  /** Length-prefixed binary: [n][len,bytes,count]* — one pass, no
    * Catalyst conversion. */
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray
    val byteArrays = entries.map { case (v, _) => v.getBytes(StandardCharsets.UTF_8) }
    val size = 4 + byteArrays.map(_.length + 12).sum
    val bb = ByteBuffer.allocate(size)
    bb.putInt(entries.length)
    var i = 0
    while (i < entries.length) {
      bb.putInt(byteArrays(i).length)
      bb.put(byteArrays(i))
      bb.putLong(entries(i)._2)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      m.update(new String(arr, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByCountAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByCountAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
