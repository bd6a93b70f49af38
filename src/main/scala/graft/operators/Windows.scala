package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions._

/** Analytic window functions and event-time windows over the `events`
  * table (SURVEY.md §2.6, §2.9 [NS]). Batch forms first — they are
  * DuckDB-oracle-checkable; the Structured Streaming versions of the
  * same aggregations live in graft.streaming (same logical plan,
  * incremental execution).
  *
  * Determinism notes for the oracle:
  *  - `ts` is nanosecond-precision parquet; Spark truncates to
  *    microseconds on read, so every ordering includes `event_id` as a
  *    tie-break and the DuckDB twin casts ts to microsecond TIMESTAMP.
  *  - running sums use exact decimal accumulation (see
  *    graft.functions.dsum2) so segment-tree vs streaming window
  *    implementations agree bit-for-bit.
  *
  * At 100 TB: all of these partition by user_id (or bucket key) —
  * a single hash shuffle, then per-partition sorting; no global sort.
  */
object Windows {

  /** Cohort retention matrix — the product-analytics staple: users
    * cohort by FIRST-activity week, and each (cohort week, activity
    * week) cell counts the cohort's users still active, with the
    * retention rate against the cohort's size. Two aggregates and two
    * equi joins; the cohort relation is user-count-sized, the activity
    * relation is distinct-(user, week)-bounded, and nothing windows
    * over the raw events — at 100 TB the only event-scale work is the
    * two shuffles onto user_id. The rate is one double division of two
    * exact longs, rounded — engine-identical. */
  def cohortRetention(events: DataFrame, idCol: String = "user_id",
                      tsCol: String = "ts"): DataFrame = {
    def wk(c: org.apache.spark.sql.Column) = date_trunc("week", c).cast(DateType)
    val cohort = events.groupBy(col(idCol))
      .agg(min(wk(col(tsCol))).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week")).agg(count(lit(1)).as("cohort_size"))
    val active = events.select(col(idCol), wk(col(tsCol)).as("activity_week")).distinct()
    active.join(cohort, Seq(idCol))
      .groupBy(col("cohort_week"), col("activity_week"))
      .agg(count(lit(1)).as("n_users")) // distinct users by construction
      .join(sizes, Seq("cohort_week"))
      .select(col("cohort_week"), col("activity_week"), col("n_users"),
        round(col("n_users").cast(DoubleType) / col("cohort_size"), 6).as("retention"))
  }

  /** Event-sequence pattern matching — the MATCH_RECOGNIZE workload
    * expressed with the engine's own primitives, SESSIONIZE-FIRST so
    * per-key aggregation state is bounded by construction: events
    * first split into inactivity-gap sessions (gaps-and-islands over
    * a spillable sort window — no agg buffer), then each SESSION's
    * events collapse, in total (ts, event_id) order, into one token
    * string, a regex counts non-overlapping occurrences of the
    * behavioral pattern per session, and a final sum rolls sessions
    * up per user. The collected span is one session, never one
    * user's lifetime — a 10M-event bot user becomes many small rows,
    * not one multi-GB aggregation buffer.
    *
    * Boundary semantics (deliberate, mirrored in the oracle twin): a
    * pattern cannot span a session boundary — a funnel interrupted by
    * `gap` of inactivity is two sessions and does not count. That is
    * the standard product-analytics reading of a behavioral funnel. */
  def eventPatternMatches(events: DataFrame,
                          pattern: String = "view click purchase",
                          gapMinutes: Int = 30): DataFrame = {
    // every token renders bracket-delimited ("[view][click]…"), so a
    // pattern token can never match inside a longer event type
    // ("[preview]" does not contain "[view]") and adjacent matches
    // share no boundary character (consecutive funnels both count).
    // Tokens are taken literally; word-only names keep the built
    // regex metacharacter-free on both engines
    val toks = pattern.split(" ").toSeq
    require(toks.nonEmpty && toks.forall(_.matches("\\w+")),
      s"pattern tokens must be word characters: $pattern")
    val regex = toks.map(t => s"\\[$t\\]").mkString
    sessionTokenStrings(events, gapMinutes)
      .select(col("user_id"),
        regexp_count(col("s"), lit(regex)).cast(LongType).as("n"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_matches"))
      .where(col("n_matches") > 0)
  }

  /** The bounded-state sessionization stage of [[eventPatternMatches]],
    * exposed so the state bound is testable: one output row per
    * (user, session), whose `s` token string covers exactly that
    * session's events. Session break = an inactivity gap of
    * `gapMinutes` or more (µs-integer compare on both engines — the
    * same `>=` closing rule as Spark's `session_window`). The break
    * flags come from a lag over a sort window (WindowExec: external
    * spillable sort, no per-key buffer); only the per-SESSION collect
    * materializes an array. */
  def sessionTokenStrings(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("__us", unix_micros(col("ts")))
      // first row of a key: lag is null -> null >= gap is null -> 0,
      // so session indices start at 0 (identical CASE fall-through in
      // the DuckDB twin)
      .withColumn("__brk",
        when(col("__us") - lag(col("__us"), 1).over(w) >= gapUs, lit(1L)).otherwise(lit(0L)))
      .withColumn("sess",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess"))
      .agg(array_sort(collect_list(struct(col("ts"), col("event_id"),
        col("event_type")))).as("seq"))
      .select(col("user_id"), col("sess"),
        array_join(transform(col("seq"),
          x => concat(lit("["), x.getField("event_type"), lit("]"))), "").as("s"))
  }

  /** row_number / rank / lag / lead / running aggregate per user. */
  def perUserAnalytics(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        row_number().over(w).cast(LongType).as("rn"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        sum(col("value").cast(DecimalType(18, 2))).over(wrun).cast(DoubleType).as("running_value"),
        count(lit(1)).over(wrun).as("events_so_far"),
        // event-time RANGE frame: trailing 30-minute sum (frame bounds in
        // microseconds over the µs-truncated ts; the DuckDB twin uses
        // RANGE BETWEEN INTERVAL '30 minutes' PRECEDING — identical
        // peer semantics on identical µs values)
        sum(col("value").cast(DecimalType(18, 2)))
          .over(Window.partitionBy(col("user_id")).orderBy(unix_micros(col("ts")))
            .rangeBetween(-30L * 60 * 1000000, 0))
          .cast(DoubleType).as("trailing_30m_value"))
      .orderBy(col("user_id"), col("rn"))
  }

  /** As-of join expressed as a window carry-forward: for every purchase
    * event, the timestamp and value of the same user's most recent
    * strictly-earlier click. One shuffle on user_id, no self-join —
    * the scalable as-of shape (sort-merge as-of degenerates to this
    * when both sides share a partition key). */
  def lastClickBeforePurchase(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"),
        last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
          .over(w).as("prev_click_ts"),
        last(when(col("event_type") === "click", col("value")), ignoreNulls = true)
          .over(w).as("prev_click_value"))
      .where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("prev_click_ts"), col("prev_click_value"))
      .orderBy(col("event_id"))
  }

  /** Tumbling event-time window: count + sum per (hour, event_type). */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour").as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start"), col("event_type"))

  /** Sliding window: 1-hour windows advancing every 30 minutes — each
    * event contributes to two windows. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("win"))
      .agg(count(lit(1)).as("n"), dsum2(col("value")).as("sum_value"))
      .select(col("win.start").as("win_start"), col("n"), col("sum_value"))
      .orderBy(col("win_start"))

  /** Session windows per user with a fixed inactivity gap: events closer
    * than `gap` merge into one session. Batch form of
    * `session_window` — the oracle reproduces it with the classic
    * gaps-and-islands SQL. */
  def sessionize(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap).as("win"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), dsum2(col("value")).as("sum_value"))
      .select(col("user_id"), col("win.start").as("session_start"), col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))

  /** Ranking-function breadth: dense_rank / ntile / percent_rank /
    * cume_dist per user. percent_rank and cume_dist are exact integer
    * ratios evaluated in double, so they compare bit-equal across
    * engines. */
  def perUserRanks(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events.select(
        col("event_id"), col("user_id"),
        dense_rank().over(w).cast(LongType).as("drnk"),
        ntile(4).over(w).cast(LongType).as("nt"),
        percent_rank().over(w).as("prank"),
        cume_dist().over(w).as("cdist"))
      .orderBy(col("event_id"))
  }

  /** Semi-structured payloads: parse the JSON props column in-plan
    * (from_json with an explicit schema — no inference pass) and
    * aggregate the extracted field. The 100 TB shape for sparse JSON
    * event payloads: schema-on-read projection, pushdown-friendly,
    * no UDF. */
  def propsKeyStats(events: DataFrame): DataFrame =
    events
      .select(col("event_type"),
        from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
          .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** The same payload through Spark 4's VARIANT type: construct a
    * nested object from real columns, `parse_json` it into a variant,
    * and read typed fields back with `variant_get` path expressions.
    * Variant is the open-schema path — no schema declared anywhere,
    * fields typed at EXTRACTION time, binary-encoded storage — the
    * shape for payloads whose schema drifts faster than the table's
    * (from_json with a fixed StructType, propsKeyStats above, is the
    * closed-schema alternative). */
  def variantPropsStats(events: DataFrame): DataFrame = {
    val obj = to_json(struct(col("event_type").as("type"),
      get_json_object(col("props"), "$.k").cast(IntegerType).as("k")))
    events
      .select(parse_json(obj).as("v"))
      .select(
        expr("variant_get(v, '$.type', 'string')").as("vtype"),
        expr("variant_get(v, '$.k', 'int')").as("k"))
      .groupBy(col("vtype"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("vtype"))
  }

  /** Event-time interval join: every (purchase, click) pair of the same
    * user with the click in the 30 minutes up to the purchase. Equi key
    * (user_id) + time-range residual → one hash shuffle per side, no
    * nested loop; the batch twin of the stream-stream join in
    * graft.streaming.EventStreams (whose state-retention bound is this
    * same interval). */
  def purchasesWithRecentClicks(events: DataFrame): DataFrame = {
    val clicks = events.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"), col("event_id").as("click_id"))
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
    purchases.join(clicks, col("c_user") === col("user_id")
        && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES")
        && col("click_ts") <= col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** Ordered funnel analysis — view → click → purchase per (user, day),
    * each stage anchored at the user's FIRST qualifying event of the
    * previous stage (a click counts only at-or-after the first view;
    * a purchase only at-or-after the first qualifying click). The
    * sequencing constraint is what separates this from three
    * independent counts — it is the standard product-analytics funnel.
    *
    * Scale shape: each stage is filter → (day, user) partial-agg →
    * equi-join on (day, user) — every shuffle keys on the user, no
    * window over a whole day's events, no stage sees more than the
    * previous stage's survivors. Day-level rollups at the end are
    * tiny (one row per day). */
  def funnelDaily(events: DataFrame): DataFrame = {
    val e = events.select(
      to_date(col("ts")).as("day"), col("user_id"), col("event_type"), col("ts"))
    def firstAtOrAfter(stage: String, prev: DataFrame, prevTs: String, outTs: String) =
      e.where(col("event_type") === stage)
        .join(prev, Seq("day", "user_id"))
        .where(col("ts") >= col(prevTs))
        .groupBy(col("day"), col("user_id"))
        .agg(min(col("ts")).as(outTs))
    val views = e.where(col("event_type") === "view")
      .groupBy(col("day"), col("user_id")).agg(min(col("ts")).as("t_view"))
    val clicks = firstAtOrAfter("click", views, "t_view", "t_click")
    val buys = firstAtOrAfter("purchase", clicks, "t_click", "t_buy")
    views.groupBy(col("day")).agg(count(lit(1)).as("n_view"))
      .join(clicks.groupBy(col("day")).agg(count(lit(1)).as("n_click")), Seq("day"), "left")
      .join(buys.groupBy(col("day")).agg(count(lit(1)).as("n_buy")), Seq("day"), "left")
      .select(col("day"),
        col("n_view"),
        coalesce(col("n_click"), lit(0L)).as("n_click"),
        coalesce(col("n_buy"), lit(0L)).as("n_buy"))
      .orderBy(col("day"))
  }
}
