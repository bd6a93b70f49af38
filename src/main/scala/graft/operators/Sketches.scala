package graft.operators

import org.apache.spark.sql.{DataFrame, GraftSqlShim}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Probabilistic sketch operators beyond HLL (SURVEY.md §2.3 sketch
  * row): Bloom-filter semi-filtering and count-min frequency estimates,
  * via Spark's built-in sketch aggregates.
  *
  * The Bloom pattern is the scale move for selective semi joins: build
  * a bits-sized filter over the small side, broadcast it, and drop
  * probe rows BEFORE the shuffle — the same runtime-filter idea
  * Spark's own `spark.sql.optimizer.runtimeFilter.bloomFilter` applies,
  * exposed as an explicit operator. No false negatives ever (every
  * true match survives); false positives only cost wasted probe rows
  * downstream, bounded by the bit budget.
  *
  * Both sketches hash deterministically (no seed parameter), so
  * results are stable across runs/retries — rows-only in the oracle
  * gate (DuckDB has no twin), property-checked in SketchesSpec.
  */
object Sketches {

  /** Probe-side rows whose `probeKey` MIGHT appear in `build`'s
    * `buildKey` set, decided by a Bloom filter: a pre-shuffle semi-join
    * reducer. `numBits` trades false-positive rate for filter size
    * (n·10 bits ≈ 1% FPR).
    *
    * The build side is materialized on the driver and shipped as a
    * LITERAL into the probe predicate — exactly how Spark's own
    * runtime bloom filters execute (the optimizer plans the build as a
    * scalar subquery whose result the driver injects), and what
    * BloomFilterMightContain requires: its filter operand must be a
    * constant or scalar subquery, since the filter is deserialized
    * once per task, not per row. The filter aggregate itself runs
    * distributed with map-side partials (BloomFilter.mergeInPlace). */
  def bloomSemiFilter(build: DataFrame, buildKey: String,
                      probe: DataFrame, probeKey: String,
                      expectedItems: Long, numBits: Long): DataFrame = {
    val agg = new BloomFilterAggregate(
      GraftSqlShim.expression(col(buildKey)),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression()
    val bytes = build.agg(GraftSqlShim.column(agg).as("bf"))
      .head().getAs[Array[Byte]](0)
    probe.where(GraftSqlShim.column(BloomFilterMightContain(
      Literal(bytes, BinaryType), GraftSqlShim.expression(col(probeKey)))))
  }

  /** Serialized count-min sketch of `key` (binary). Probe with
    * org.apache.spark.util.sketch.CountMinSketch.readFrom: estimates
    * are always ≥ the true count and ≤ true + eps·N with the given
    * confidence — the mergeable heavy-hitter summary for streams and
    * partial aggregation (cf. the Misra-Gries TopKByCount, which bounds
    * STATE instead of error). */
  def countMinSketch(df: DataFrame, key: String,
                     eps: Double = 0.001, confidence: Double = 0.99,
                     seed: Int = 42): DataFrame =
    df.agg(expr(s"count_min_sketch($key, ${eps}D, ${confidence}D, $seed)").as("cms"))
}
