package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed time-series similarity search (the Odyssey / distributed
  * data-series line: VLDB 2023, EDBT 2019 — subsequence matching over
  * per-key series): find the k subsequences of the per-user value
  * series nearest to a query pattern under Z-NORMALIZED Euclidean
  * distance — the UCR-suite metric that matches SHAPE, not level
  * (each window is standardized before comparison, so a pattern finds
  * its occurrences at any offset/scale of the raw values).
  *
  * Scale shape: series assemble per KEY (one shuffle, per-key state =
  * that key's series — the time-series norm; a key too large for one
  * buffer takes the windowed-aggregation variant instead), windows
  * explode as (key, start, w-slice) with the W-SIZED slice the only
  * payload, the pattern broadcasts as a literal array, and the global
  * top-k is a TakeOrderedAndProject — never a full sort.
  *
  * Cross-engine exactness (the reason this can be hash-checked at
  * all): every per-window quantity — mean, variance, distance — is a
  * FOLD OVER AN ORDERED ARRAY, so both engines execute the identical
  * association left-to-right and produce bit-equal doubles; no
  * shuffle-order float accumulation exists anywhere. Flat windows
  * (zero variance) carry no shape and are skipped — the z-normal form
  * does not exist for them. Output distances round to 6.
  */
object Series {

  /** Top-k z-normalized matches of `pattern` across all users' series.
    * Series order is (ts, event_id) — a total order, so re-runs build
    * identical windows. Output: (user_id, start, dist_r). */
  def znormSubsequenceTopK(events: DataFrame, pattern: Seq[Double], k: Int = 20,
                           valueCol: String = "value", keyCol: String = "user_id",
                           tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val w = pattern.length
    require(w >= 2, "pattern needs at least 2 points")
    // z-normalize the pattern once, driver-side
    val pMu = pattern.sum / w
    val pSd = math.sqrt(pattern.map(x => (x - pMu) * (x - pMu)).sum / w)
    require(pSd > 0, "a flat pattern has no z-normal form")
    val pz = array(pattern.map(x => lit((x - pMu) / pSd)): _*)

    val series = events
      .select(col(keyCol).as("user_id"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(valueCol).as("__v"))
      .groupBy(col("user_id"))
      .agg(expr("transform(array_sort(collect_list(struct(__ts, __tie, __v))), s -> s.__v)")
        .as("vs"))
    val wins = series.where(size(col("vs")) >= w)
      .select(col("user_id"),
        explode(sequence(lit(1), size(col("vs")) - lit(w - 1))).as("start"), col("vs"))
      .select(col("user_id"), col("start"),
        slice(col("vs"), col("start"), lit(w)).as("win"))
    // ordered folds: identical association on both engines
    val scored = wins
      .withColumn("__pz", pz) // the broadcast-as-literal pattern
      .withColumn("mu", expr(s"aggregate(win, CAST(0.0 AS DOUBLE), (a, x) -> a + x) / ${w}.0"))
      .withColumn("sd", sqrt(
        expr(s"aggregate(transform(win, x -> (x - mu) * (x - mu)), CAST(0.0 AS DOUBLE), (a, y) -> a + y) / ${w}.0")))
      .where(col("sd") > 0) // flat windows have no z-normal form
      .withColumn("dist", expr(
        "aggregate(zip_with(win, __pz, (x, p) -> ((x - mu) / sd - p) * ((x - mu) / sd - p)), CAST(0.0 AS DOUBLE), (a, y) -> a + y)"))
    scored
      .select(col("user_id"), col("start").cast("long").as("pos"),
        round(col("dist"), 6).as("dist_r"))
      .orderBy(col("dist_r"), col("user_id"), col("pos"))
      .limit(k)
  }
}
