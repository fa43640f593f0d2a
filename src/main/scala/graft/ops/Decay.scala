package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exponentially time-decayed engagement features — the classic feature-store
  * aggregate the reference family computes with plain rolling sums
  * (reference: jobs/build_feature_views.py:41-54 has only un-weighted window
  * sums; decay weighting is the standard extension every production feature
  * store adds on top).
  *
  * Semantics: bucket events into calendar weeks; for each ACTIVE week `w` of
  * a user, emit
  *
  *   decayed(w) = Σ_{k=0..H} weekly_sum(w-k) · 2^(H-k)
  *
  * i.e. half-life = one week, horizon H weeks, weights frozen per calendar
  * bucket. Because every weight is a power of two and the measures are
  * integer cents, the whole feature is BIGINT-exact — no float drift between
  * engines — and the "real" value is recovered by a single exact dyadic
  * division `x / 2^H` at the end.
  *
  * Scale shape (100 TB): the raw event stream collapses FIRST to one row per
  * (user, week) — a partial-aggregated shuffle on the natural key — and the
  * H+1-way fan-out + re-aggregation runs on that reduced table (≈ |users| ×
  * |weeks| rows, orders of magnitude below the event count). No window over
  * raw events, no self-join on the big side. The active-week filter is a
  * `max(k==0)` flag inside the same aggregation — zero extra joins.
  */
object Decay {

  val WeekUs = 604800000000L // microseconds per week
  val Horizon = 8            // weeks of lookback; max weight 2^8 = 256

  /** df: (user_id long, ts_us long, value double). Output one row per
    * (user_id, active week): integer-exact decayed cents/event-count plus the
    * exact dyadic-normalized double. */
  def decayedFeatures(df: DataFrame): DataFrame = {
    val weekly = df
      .select(col("user_id"),
        // integer DIV, never `/` (double) — a quotient that double-rounds
        // up to an exact integer would land events in the next week vs the
        // oracle's floor division (ts_us ≥ 0, so DIV == floor)
        expr(s"ts_us DIV $WeekUs").as("week"),
        round(col("value") * 100).cast("long").as("cents"))
      .groupBy(col("user_id"), col("week"))
      .agg(sum(col("cents")).as("cents"), count(lit(1)).as("n"))
    weekly
      .select(col("user_id"), col("week"), col("cents"), col("n"),
        explode(sequence(lit(0), lit(Horizon))).as("k"))
      .groupBy(col("user_id"), (col("week") + col("k")).as("week"))
      .agg(
        sum(col("cents") * expr(s"shiftleft(CAST(1 AS BIGINT), $Horizon - k)"))
          .as("decayed_cents_x256"),
        sum(col("n") * expr(s"shiftleft(CAST(1 AS BIGINT), $Horizon - k)"))
          .as("decayed_events_x256"),
        max(when(col("k") === 0, 1).otherwise(0)).as("__active"))
      .filter(col("__active") === 1)
      .drop("__active")
      .withColumn("decayed_cents",
        col("decayed_cents_x256") / lit(1L << Horizon).cast("double"))
  }

  /** DuckDB mirror of [[decayedFeatures]] over the `events` table. */
  val decayedFeaturesSql: String =
    s"""WITH wk AS (
       |  SELECT user_id, epoch_us(ts) // $WeekUs AS week,
       |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1, 2),
       |ex AS (
       |  SELECT user_id, week + k AS week,
       |    cents * (1 << ($Horizon - k)) AS wc,
       |    n * (1 << ($Horizon - k)) AS wn,
       |    CASE WHEN k = 0 THEN 1 ELSE 0 END AS active
       |  FROM wk, (SELECT unnest(range(0, ${Horizon + 1})) AS k))
       |SELECT user_id, week,
       |  CAST(sum(wc) AS BIGINT) AS decayed_cents_x256,
       |  CAST(sum(wn) AS BIGINT) AS decayed_events_x256,
       |  CAST(sum(wc) AS BIGINT) / ${(1L << Horizon).toDouble} AS decayed_cents
       |FROM ex GROUP BY 1, 2 HAVING max(active) = 1""".stripMargin
}
