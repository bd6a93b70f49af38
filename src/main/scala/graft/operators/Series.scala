package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed time-series similarity search (the Odyssey / distributed
  * data-series line: VLDB 2023, EDBT 2019 — subsequence matching over
  * per-key series): find the k subsequences of the per-user value
  * series nearest to a query pattern under Z-NORMALIZED Euclidean
  * distance — the UCR-suite metric that matches SHAPE, not level
  * (each window is standardized before comparison, so a pattern finds
  * its occurrences at any offset/scale of the raw values).
  *
  * Two window-builders share one scoring fold:
  *  - [[znormSubsequenceTopK]] assembles each key's series in one
  *    per-key collect — simple, exact, fine when per-key history is
  *    human-scale;
  *  - [[znormSubsequenceTopKSegmented]] (the registered path) explodes
  *    overlapping (key, segment) chunks of length L+w−1 — the
  *    `duplicatedSpans` strided-grid device — so per-GROUP state is
  *    segment-sized no matter how long one key's series grows. Both
  *    produce the identical window set, hence bit-identical scores.
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

  /** Z-normalize the pattern driver-side into a literal array column. */
  private def znormPattern(pattern: Seq[Double]): Column = {
    val w = pattern.length
    require(w >= 2, "pattern needs at least 2 points")
    val pMu = pattern.sum / w
    val pSd = math.sqrt(pattern.map(x => (x - pMu) * (x - pMu)).sum / w)
    require(pSd > 0, "a flat pattern has no z-normal form")
    array(pattern.map(x => lit((x - pMu) / pSd)): _*)
  }

  /** Score (user_id, start, win) rows against the z-normed pattern and
    * keep the global top-k — a TakeOrderedAndProject, never a full
    * sort. The ordered folds are the cross-engine-exact part. */
  private def scoreTopK(wins: DataFrame, pz: Column, w: Int, k: Int): DataFrame =
    wins
      .withColumn("__pz", pz) // the broadcast-as-literal pattern
      .withColumn("mu", expr(s"aggregate(win, CAST(0.0 AS DOUBLE), (a, x) -> a + x) / ${w}.0"))
      .withColumn("sd", sqrt(
        expr(s"aggregate(transform(win, x -> (x - mu) * (x - mu)), CAST(0.0 AS DOUBLE), (a, y) -> a + y) / ${w}.0")))
      .where(col("sd") > 0) // flat windows have no z-normal form
      .withColumn("dist", expr(
        "aggregate(zip_with(win, __pz, (x, p) -> ((x - mu) / sd - p) * ((x - mu) / sd - p)), CAST(0.0 AS DOUBLE), (a, y) -> a + y)"))
      .select(col("user_id"), col("start").cast("long").as("pos"),
        round(col("dist"), 6).as("dist_r"))
      .orderBy(col("dist_r"), col("user_id"), col("pos"))
      .limit(k)

  /** Top-k z-normalized matches of `pattern` across all users' series,
    * via one per-key series collect. Series order is (ts, event_id) —
    * a total order, so re-runs build identical windows. Output:
    * (user_id, pos, dist_r). Per-key agg state is that key's full
    * series; for unbounded keys use the segmented variant below. */
  def znormSubsequenceTopK(events: DataFrame, pattern: Seq[Double], k: Int = 20,
                           valueCol: String = "value", keyCol: String = "user_id",
                           tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val w = pattern.length
    val pz = znormPattern(pattern)
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
    scoreTopK(wins, pz, w, k)
  }

  /** The bounded-state variant: the same answer with per-GROUP state
    * capped at `segLen + w - 1` values regardless of series length.
    *
    * Device (the `duplicatedSpans` strided grid, Dedup.duplicatedSpans):
    * each row's 1-based series position `p` (a spillable sort-window
    * row_number, no agg buffer) assigns it to owner segment
    * `g = (p-1) div L`; the first `w-1` rows of each segment ALSO
    * replicate to segment `g-1` as overlap tail, so every window whose
    * start lies in a segment is fully contained in that segment's
    * group. Windows are then built per (key, segment) exactly as the
    * collect path builds them per key, and a window is emitted only by
    * the segment that OWNS its start — each window exists exactly
    * once. Positions within a key are contiguous by construction, so
    * `start = min_pos + i - 1` recovers the global position without
    * carrying it per row.
    *
    * Window set ≡ the collect path's (same slices of the same ordered
    * series), and scoring is the same ordered fold — so results are
    * bit-identical, which SeriesSpec asserts on a multi-segment key. */
  def znormSubsequenceTopKSegmented(events: DataFrame, pattern: Seq[Double], k: Int = 20,
                                    segLen: Int = 4096,
                                    valueCol: String = "value", keyCol: String = "user_id",
                                    tsCol: String = "ts", tieCol: String = "event_id"): DataFrame = {
    val w = pattern.length
    val pz = znormPattern(pattern)
    require(segLen >= w, s"segment length $segLen must cover one window of $w")
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__ts"), col("__tie"))
    val positioned = events
      .select(col(keyCol).as("user_id"), col(tsCol).as("__ts"),
        col(tieCol).as("__tie"), col(valueCol).as("__v"))
      .withColumn("p", row_number().over(byKey).cast("long"))
      .select(col("user_id"), col("p"), col("__v"))
    val owner = expr(s"(p - 1) div $segLen")
    val inOverlapHead = expr(s"(p - 1) % $segLen") <= lit(w - 2)
    val segs = positioned.select(col("user_id"), col("p"), col("__v"),
      explode(when(inOverlapHead && owner > 0, array(owner, owner - 1))
        .otherwise(array(owner))).as("seg"))
    val grouped = segs
      .groupBy(col("user_id"), col("seg"))
      .agg(expr("transform(array_sort(collect_list(struct(p, __v))), s -> s.__v)").as("vs"),
        min(col("p")).as("min_p"))
    val wins = grouped.where(size(col("vs")) >= w)
      .select(col("user_id"), col("seg"), col("min_p"),
        explode(sequence(lit(1), size(col("vs")) - lit(w - 1))).as("i"), col("vs"))
      .withColumn("start", col("min_p") + col("i") - 1)
      // only the segment that owns the start emits the window
      .where(expr(s"(start - 1) div $segLen") === col("seg"))
      .select(col("user_id"), col("start"),
        slice(col("vs"), col("i"), lit(w)).as("win"))
    scoreTopK(wins, pz, w, k)
  }

  /** Rolling z-score anomaly screen over per-key daily event counts —
    * the volume-spike/outage tripwire a pipeline runs on every feed:
    * each (key, day)'s count is scored against the mean/stddev of its
    * own preceding `lookback` observations (ROW-based frame ending at
    * 1 PRECEDING — today never launders itself into its own baseline;
    * row-based so a gap day shrinks the window instead of silently
    * zero-filling). Days with fewer than `minPrior` predecessors emit
    * no score (cold start).
    *
    * Cross-engine exactness: the frame sums are EXACT INTEGERS (count,
    * sum, sum of squares over longs); mean/var/z then evaluate in a
    * fixed association — var = (sumsq − sum·mean)/(n−1), z =
    * (x − mean)/sqrt(var) — identical single-op sequences on both
    * engines, rounded to 6 dp; the anomaly cut compares the ROUNDED z
    * so the boolean can't flap.
    *
    * Scale shape: the event stream collapses to (key, day) counts in
    * one map-side-combined aggregate; the window runs on the daily
    * relation (365 rows per key-year), partitioned by key — no global
    * sort, no state beyond the 8-row frame. */
  def rollingAnomaly(events: DataFrame, keyCol: String = "event_type",
                     tsCol: String = "ts", lookback: Int = 7,
                     minPrior: Int = 4, zCut: Double = 3.0): DataFrame =
    scoreDailyAnomalies(
      events.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n")),
      lookback, minPrior, zCut)

  /** The scoring tail of [[rollingAnomaly]], factored over a
    * pre-aggregated (key, day, n) relation so the STREAMING path — a
    * watermarked 1-day-window count maintained per micro-batch — can
    * feed the identical screen and share the batch oracle. */
  def scoreDailyAnomalies(daily: DataFrame, lookback: Int = 7,
                          minPrior: Int = 4, zCut: Double = 3.0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-lookback, -1)
    daily
      .withColumn("n_prior", count(col("n")).over(w))
      .withColumn("sum_prior", sum(col("n")).over(w))
      .withColumn("sumsq_prior", sum(col("n") * col("n")).over(w))
      .where(col("n_prior") >= minPrior)
      .withColumn("mean", col("sum_prior").cast("double") / col("n_prior").cast("double"))
      .withColumn("vr",
        (col("sumsq_prior").cast("double") - col("sum_prior").cast("double") * col("mean"))
          / (col("n_prior") - 1).cast("double"))
      .withColumn("z",
        when(col("vr") > 0,
          round((col("n").cast("double") - col("mean")) / sqrt(col("vr")), 6)))
      .select(col("key"), col("day"), col("n"), col("n_prior"),
        round(col("mean"), 6).as("mean_prior"), col("z"),
        (col("z").isNotNull && abs(col("z")) > zCut).as("is_anomaly"))
  }

  /** Per-key linear trend: the OLS slope/intercept of daily event
    * volume against day offset — the grow/decay screen run over every
    * feed (a dying source shows up here weeks before it flatlines).
    *
    * Exactness: x is the integer day offset from the key's own first
    * day, y the integer daily count, so ALL four moment sums (Σx, Σy,
    * Σxy, Σx²) are exact longs in one aggregate; slope =
    * (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) is exact-integer numerator and
    * denominator with ONE double division at the end, intercept =
    * (Σy − slope·Σx)/n two more fixed-order ops — no float
    * accumulation anywhere, so cross-engine hashes can't wiggle.
    *
    * Scale shape: events collapse to (key, day) counts map-side; the
    * min-day join and moment aggregate run on the daily relation.
    * Keys with < minDays days or a degenerate x-spread emit nothing. */
  def trendSlopes(events: DataFrame, keyCol: String = "event_type",
                  tsCol: String = "ts", minDays: Int = 3): DataFrame =
    trendFromDaily(
      events.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n")),
      minDays)

  /** The OLS tail of [[trendSlopes]] over a pre-aggregated (key, day,
    * n) relation — the [[scoreDailyAnomalies]] split, so the
    * streaming daily-count path shares the batch oracle. */
  def trendFromDaily(daily: DataFrame, minDays: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // min-day via a window, not a self-join: a self-join on a
    // memory-sink table hits conflicting-attribute resolution
    daily
      .withColumn("day0", min(col("day")).over(Window.partitionBy(col("key"))))
      .select(col("key"), datediff(col("day"), col("day0")).cast("long").as("x"), col("n").as("y"))
      .groupBy("key")
      .agg(count(lit(1)).as("n_days"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .where(col("n_days") >= minDays &&
        (col("n_days") * col("sxx") - col("sx") * col("sx")) =!= 0)
      .withColumn("slope",
        (col("n_days") * col("sxy") - col("sx") * col("sy")).cast("double")
          / (col("n_days") * col("sxx") - col("sx") * col("sx")).cast("double"))
      .select(col("key"), col("n_days"),
        round(col("slope"), 6).as("slope"),
        round((col("sy").cast("double") - col("slope") * col("sx").cast("double"))
          / col("n_days").cast("double"), 6).as("intercept"))
  }

  /** CUSUM change-point detection per key — "WHEN did this feed
    * change": the day maximizing the cumulative deviation of daily
    * volume from the key's own overall mean (Page 1954). A level
    * shift makes |CUSUM| peak exactly at the shift boundary, which a
    * per-day z-score (rollingAnomaly) smears across its lookback.
    *
    * Exactness: the textbook CUSUM Σ(yⱼ−μ) accumulates floats in
    * order — and DuckDB aggregates window frames via segment trees,
    * so float association is NOT reproducible cross-engine. Scaling
    * by n removes every float: n·CUSUMᵢ = n·Sᵢ − i·Σy with Sᵢ the
    * integer running sum — exact longs under ANY association. The
    * only doubles are the final presentation division by n.
    *
    * Scale shape: daily-count relation, one running-sum window and
    * one top-1-per-key window, both partitioned by key. */
  def changePoints(events: DataFrame, keyCol: String = "event_type",
                   tsCol: String = "ts", minDays: Int = 5): DataFrame =
    changePointsFromDaily(
      events.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n")),
      minDays)

  /** Additive STL-style decomposition of the per-key daily series:
    * volume = trend + seasonal + residual. Trend is the centered
    * observed-day moving average (±`halfWindow` ROWS — honest about
    * gaps: the window is over observed days, not calendar days);
    * seasonal is the day-of-week mean of the detrended deviations
    * (dow from epoch-day arithmetic — SQL engines disagree on
    * DAYOFWEEK's anchor, integer math doesn't); residual is what
    * neither explains — the series a feed-health alert should
    * actually threshold, since raw volume confounds weekly shape
    * with real anomalies.
    *
    * Exactness: n is an exact count; trend/seasonal are one rounded
    * division each off integer/DECIMAL sums; the residual is one
    * fixed-association subtraction chain. Scale shape: everything
    * runs on the (key, day) daily relation — two key-partitioned
    * windows and one (key, dow) aggregate, never the event log. */
  def stlDecompose(events: DataFrame, keyCol: String = "event_type",
                   tsCol: String = "ts", halfWindow: Int = 3): DataFrame =
    stlFromDaily(
      events.groupBy(col(keyCol).as("key"), to_date(col(tsCol)).as("day"))
        .agg(count(lit(1)).as("n")),
      halfWindow)

  /** The decomposition math over an ALREADY-built (key, day, n) daily
    * relation — the scoreDailyAnomalies/changePointsFromDaily split
    * that makes the monitor streamable: the stream maintains only
    * per-(key, day) counters, this runs on the tiny finished daily
    * relation, so the batch twin's oracle serves the streaming query
    * unchanged. */
  def stlFromDaily(daily: DataFrame, halfWindow: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val w = Window.partitionBy(col("key")).orderBy(col("day"))
      .rowsBetween(-halfWindow, halfWindow)
    // MICRO-INTEGER arithmetic throughout: round(sum/cnt, 6) is
    // hash-unsafe here (a mean can land ON the 6-dp tie, where
    // Spark's shortest-repr BigDecimal and IEEE-true values round
    // apart — caught at sf0.01), but floor(int*1e6 / cnt) is
    // provably exact: a non-integral ratio sits ≥ 1/cnt from the
    // nearest integer, ~1e9 times the double's error. Components
    // stay exact BIGINT micro-units until one final /1e6 display
    // division, identical on both engines.
    val dv = daily
      .withColumn("trend_u",
        floor((sum(col("n")).over(w) * lit(1000000L)).cast(DoubleType) /
          count(lit(1)).over(w).cast(DoubleType)).cast(LongType))
      .withColumn("dow",
        pmod(datediff(col("day"), to_date(lit("1970-01-05"))), lit(7)).cast(LongType))
      .withColumn("dev_u", col("n") * lit(1000000L) - col("trend_u"))
    // seasonal mean as an unordered (key, dow) window, not a
    // groupBy + self-join: same shuffle, no join — and a self-join
    // over a streaming memory-sink view trips attribute dedup
    val wd = Window.partitionBy(col("key"), col("dow"))
    dv.withColumn("seasonal_u",
        floor(sum(col("dev_u")).over(wd).cast(DoubleType) /
          count(lit(1)).over(wd).cast(DoubleType)).cast(LongType))
      .select(col("key"), col("day"), col("n"),
        (col("trend_u").cast(DoubleType) / lit(1000000.0)).as("trend"),
        col("dow"),
        (col("seasonal_u").cast(DoubleType) / lit(1000000.0)).as("seasonal"),
        ((col("dev_u") - col("seasonal_u")).cast(DoubleType) / lit(1000000.0)).as("residual"))
  }

  /** The CUSUM peak math over an ALREADY-built (key, day, n) daily
    * relation — the split that makes the change-point monitor
    * streamable (the scoreDailyAnomalies device): the stream
    * maintains only per-(key, day) counters, this runs on the tiny
    * finished daily relation, so the batch twin's oracle serves the
    * streaming query unchanged. */
  def changePointsFromDaily(daily: DataFrame, minDays: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wKey = Window.partitionBy(col("key"))
    val wRun = wKey.orderBy(col("day")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = daily
      .withColumn("i", row_number().over(wKey.orderBy(col("day"))).cast("long"))
      .withColumn("run", sum(col("n")).over(wRun))
      .withColumn("n_days", count(lit(1)).over(wKey))
      .withColumn("total", sum(col("n")).over(wKey))
      .where(col("n_days") >= minDays)
      .withColumn("cusum_n", col("n_days") * col("run") - col("i") * col("total"))
    scored
      .withColumn("rk", row_number().over(
        wKey.orderBy(abs(col("cusum_n")).desc, col("day"))))
      .where(col("rk") === 1)
      .select(col("key"), col("day").as("change_day"), col("n_days"),
        round(col("cusum_n").cast("double") / col("n_days").cast("double"), 6)
          .as("peak_cusum"))
  }
}
