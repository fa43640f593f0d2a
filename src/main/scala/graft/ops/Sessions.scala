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
}
