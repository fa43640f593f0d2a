package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization — a standard event-stream operator the reference
  * lacks but any event-time feature store needs (and the batch twin of
  * Structured Streaming's `session_window`).
  *
  * Implemented as lag-gap flag + running sum (two same-spec windows → one
  * exchange on user_id + one sort) rather than Spark's `session_window`
  * grouping, so the DuckDB oracle can express the identical computation.
  */
object Sessions {
  /** One row per (user, session): bounds, event count, summed value.
    * Expects an `events`-shaped frame with ts_us BIGINT. */
  def sessionize(events: DataFrame, gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts_us"),
        round(coalesce(col("value"), lit(0.0)) * 100).cast("long").as("value_cents"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("t_start_us"),
        max(col("ts_us")).as("t_end_us"),
        (sum(col("value_cents")) / lit(100.0)).as("value_sum"))
  }

  /** First-order Markov transition matrix over per-user event streams:
    * P(next event type | previous event type), estimated from every adjacent
    * pair in (ts, event_id) order.
    *
    * One exchange on user_id for the lag window; the pair counting is a
    * partial-aggregable groupBy over a tiny (|types|²) domain, and the
    * per-previous totals come from a second window over that domain — no
    * join, no second pass over the events. The probability is the single
    * double division of two exact BIGINTs.
    */
  def markovTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n_trans"))
    pairs
      .withColumn("total_from_prev",
        sum(col("n_trans")).over(Window.partitionBy(col("prev_type"))))
      .withColumn("p_trans",
        col("n_trans").cast("double") / col("total_from_prev").cast("double"))
  }

  /** Cohort retention matrix: users bucketed by the time bucket of their
    * first activity (cohort), then counted as retained in each later bucket
    * they appear in. Buckets are exact integer epoch-micros division
    * (`ts_us DIV bucketUs`), so the offset arithmetic is engine-exact and
    * the bucket width is a free parameter (weekly for the fixture's
    * one-month span; monthly on a real calendar would swap in a
    * year·12+month index).
    *
    * Scale shape: the per-user bucket aggregation and the per-user
    * first-bucket window are ONE exchange on user_id (same key → the
    * window reuses the aggregate's partitioning); the final (cohort,
    * offset) aggregate is bucket²-bounded. The cohort-size denominator is
    * the offset-0 count of the same matrix — a window over the bounded
    * output, not a join back to the events.
    */
  def cohortRetention(events: DataFrame, bucketUs: Long): DataFrame = {
    val midx = expr(s"ts_us DIV ${bucketUs}L")
    val userMonths = events
      .select(col("user_id"), midx.as("midx"))
      .groupBy(col("user_id"), col("midx")).agg(count(lit(1)).as("n_ev"))
    val withCohort = userMonths
      .withColumn("cohort",
        min(col("midx")).over(Window.partitionBy(col("user_id"))))
    val matrix = withCohort
      .groupBy(col("cohort"), (col("midx") - col("cohort")).as("offset_buckets"))
      .agg(count(lit(1)).as("n_active"), sum(col("n_ev")).as("n_events"))
    matrix
      .withColumn("cohort_size",
        max(when(col("offset_buckets") === 0L, col("n_active")))
          .over(Window.partitionBy(col("cohort"))))
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_size").cast("double"))
  }

  /** WINDOW FUNNEL (the ClickHouse `windowFunnel` semantics): per user, the
    * deepest prefix of the ordered pattern view → click → purchase
    * completable inside `windowUs` of the STARTING view — each later stage
    * must occur at-or-after the previous one and at-or-before
    * view_ts + window. Every view event is a candidate start; the user's
    * answer is the best stage over all starts.
    *
    * The greedy chain (EARLIEST qualifying next-stage event) is optimal for
    * this pattern — taking the earliest click can only leave more room for
    * the purchase — so two forward as-of joins ([[graft.ops.Snapshots
    * .asOfJoinForward]], each ONE key-shuffle + incremental window, no
    * range join) compute per-start stages exactly, and a per-user max
    * finishes. The q99 funnel counts lifetime stage sets; this one is the
    * time-budgeted version a conversion analysis actually wants.
    */
  def windowFunnel(events: DataFrame, windowUs: Long): DataFrame = {
    def stageTs(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), col("ts_us")).distinct()
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"))
    val clicks = stageTs("click").withColumn("c_ts", col("ts_us"))
    val purchases = stageTs("purchase").withColumn("p_ts", col("ts_us"))
    // persisted: the first funnel hop splits into the with-click and
    // no-click branches — uncached, the as-of join (and its views/clicks
    // scans) replans once per branch (plan census r8: 5 scans -> 3)
    val v1 = graft.ops.Snapshots.asOfJoinForward(
      views, clicks, "user_id", "ts_us", "c_ts", Seq("c_ts"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // second hop joins on the MATCHED click ts; rows with no click skip it
    val withC = v1.filter(col("c_ts").isNotNull)
      .withColumnRenamed("ts_us", "v_ts")
      .withColumnRenamed("c_ts", "ts_us")
    val v2 = graft.ops.Snapshots.asOfJoinForward(
      withC, purchases, "user_id", "ts_us", "p_ts", Seq("p_ts"))
      .withColumnRenamed("ts_us", "c_ts")
      .withColumnRenamed("v_ts", "ts_us")
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("c_ts"), col("p_ts"))
    val noC = v1.filter(col("c_ts").isNull)
      .withColumn("p_ts", lit(null).cast("long"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        col("c_ts"), col("p_ts"))
    val deadline = col("ts_us") + windowUs
    v2.unionByName(noC)
      .withColumn("stage",
        when(col("c_ts").isNotNull && col("c_ts") <= deadline,
          when(col("p_ts").isNotNull && col("p_ts") <= deadline, 3L)
            .otherwise(2L))
          .otherwise(1L))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_views"), max(col("stage")).as("best_stage"))
  }

  /** PER-KEY OUT-OF-ORDER LATENESS census: within each user's stream in
    * ARRIVAL order (event_id — the ingest sequence stand-in), an event's
    * lateness is how far the key's running max event time had already
    * advanced past it (`maxPrev − ts`, clamped at 0). Aggregated per
    * event_type: events, late events, max and total lateness micros — the
    * exact measurements that size a Structured Streaming watermark delay
    * and a mapGroupsWithState timeout (set the watermark below your
    * observed p-max lateness and you drop those rows).
    *
    * Scale shape: one window PARTITIONED by user_id (the same exchange
    * every per-key op here rides), then a partial-aggregable census on
    * ≤|event types| keys.
    */
  def latenessCensus(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us"))
      .withColumn("late_us",
        greatest(coalesce(max(col("ts_us")).over(w) - col("ts_us"),
          lit(0L)), lit(0L)))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("late_us") > 0L, 1L).otherwise(0L)).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("sum_late_us"))
  }
}
