package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large × large inequality joins (SURVEY.md §2.5). Spark's planner
  * has no shuffle strategy for a join whose only predicate is an
  * inequality: it falls back to BroadcastNestedLoopJoin (or a
  * cartesian product), which is O(|L|·|R|) work and O(|R|) memory —
  * fine when one side is a dozen price bands (Relational
  * .priceBandCounts broadcasts exactly that), fatal when both sides
  * are fact tables.
  *
  * The standard rewrite is BINNING: quantize the value domain into
  * fixed-width bins of exactly the join tolerance, replicate one side
  * into the (bounded number of) adjacent bins a partner could fall
  * in, and equi-join on the bin id with the original predicate kept
  * as a residual filter. The join becomes a plain hash-partitioned
  * equi-join — each side shuffles once on the bin key, AQE's skew
  * splitting applies to hot bins, and the replication factor is a
  * constant 3 regardless of data volume.
  */
object RangeJoins {

  /** `left ⋈ right ON |left(lv) − right(rv)| <= delta` as a binned
    * equi-join. Bin width == delta, so any qualifying partner of a
    * right row r lies in bin(r)−1 .. bin(r)+1: the right side is
    * exploded into those three bins (3× a projected copy — not 3×
    * I/O), the left side is binned once, and the exact predicate is
    * re-checked as a residual. Exactly-once semantics hold because
    * each left row has ONE bin: a (l, r) pair can only meet where
    * bin(l) matches, and the three right copies carry distinct bins.
    *
    * Output: the left columns then the right columns, bin key
    * dropped. Columns must not collide — alias before calling. */
  def absDeltaJoin(left: DataFrame, right: DataFrame,
                   lv: String, rv: String, delta: Double): DataFrame = {
    require(delta > 0, "delta must be positive")
    val lb = left.withColumn("__graft_bin", floor(col(lv) / delta))
    val rBin = floor(col(rv) / delta)
    val rb = right.withColumn("__graft_bin",
      explode(array(rBin - 1, rBin, rBin + 1)))
    lb.join(rb, lb("__graft_bin") === rb("__graft_bin")
        && abs(col(lv) - col(rv)) <= delta)
      .drop("__graft_bin")
  }
}
