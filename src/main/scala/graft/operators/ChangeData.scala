package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Change-data operators: the table-maintenance half of a corpus /
  * warehouse build that the reference (a single hard-coded scan→agg,
  * map_reduce.cpp:452-616) has no analog for, but that any pipeline
  * refreshing a 100 TB dataset needs — applying a CDC batch to a base
  * table and deriving slowly-changing-dimension history from event
  * streams.
  *
  * Both operators are single-shuffle joins/windows on the natural key:
  * they partition by key (never globally), so they scale with the
  * cluster; the change batch in a merge is typically orders of
  * magnitude smaller than the base and broadcasts.
  */
object ChangeData {

  /** Apply a CDC change batch to a base table — MERGE semantics on a
    * copy-on-write table without a table format: one full-outer
    * sort-merge join on the key (the standard CoW merge shape; Spark
    * broadcasts instead when the batch is small enough).
    *
    * `changes` carries the key, an `op` column (`upsert` | `delete`)
    * and the base's payload columns; a NULL payload column in an
    * upsert keeps the base value (partial-update semantics, like
    * `MERGE … UPDATE SET c = coalesce(src.c, tgt.c)`).
    *   - upsert + match    → update (column-wise coalesce)
    *   - upsert + no match → insert
    *   - delete + match    → drop the row
    *   - base-only         → carried through unchanged
    * Keys must be unique on both sides (a CDC batch is deduped to its
    * latest image per key upstream — see Dedup / EventStreams.dedupEvents).
    */
  def mergeApply(base: DataFrame, changes: DataFrame, keyCol: String,
                 opCol: String = "op"): DataFrame = {
    val payload = base.columns.filterNot(_ == keyCol).toSeq
    val b = base.select(col(keyCol) +: payload.map(c => col(c).as(s"__b_$c")): _*)
    val c = changes.select(col(keyCol) +: col(opCol).as("__op") +:
      payload.map(p => col(p).as(s"__c_$p")): _*)
    b.join(c, Seq(keyCol), "full_outer")
      .where(col("__op").isNull || col("__op") === "upsert")
      .select(col(keyCol) +: payload.map(p =>
        coalesce(col(s"__c_$p"), col(s"__b_$p")).as(p)): _*)
  }

  /** Slowly-changing-dimension (type 2) history from a change log:
    * collapse consecutive equal attribute values per key, then emit
    * one validity interval per run — (key, attr, valid_from,
    * valid_to, version, is_current), the standard dimension-table
    * shape for as-of enrichment (see Windows.lastClickBeforePurchase
    * for the lookup side).
    *
    * Two windows, both partitioned BY KEY — parallelism is key
    * cardinality, no stratum-wide or global sort anywhere. `tieCol`
    * makes the per-key order total so re-runs emit identical history.
    * The attribute is assumed non-null (a null-state change should be
    * modeled as an explicit sentinel row, not NULL). */
  def scd2Intervals(log: DataFrame, keyCol: String, attrCol: String,
                    tsCol: String, tieCol: String): DataFrame = {
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changePoints = log
      .select(col(keyCol), col(attrCol), col(tsCol), col(tieCol))
      .withColumn("__prev", lag(col(attrCol), 1).over(byKey))
      .where(col("__prev").isNull || col(attrCol) =!= col("__prev"))
    val byKeyFrom = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changePoints
      .withColumn("valid_to", lead(col(tsCol), 1).over(byKeyFrom))
      .withColumn("version", row_number().over(byKeyFrom).cast(LongType))
      .select(col(keyCol), col(attrCol),
        col(tsCol).as("valid_from"), col("valid_to"), col("version"),
        col("valid_to").isNull.as("is_current"))
  }
}
