package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 25: sessionized bounce rate. */
object Entries46 {

  val all: Seq[Q] = Seq(

    // BOUNCE RATE per day: single-event sessions over all sessions
    // starting that day (30-minute gap sessionization, the q17 operator
    // re-consumed) — the engagement KPI layered on the session grain.
    // Exact integer counts; the ratio stays with the consumer.
    Q("q280_bounce_rate",
      (s, d) => graft.ops.Sessions
        .sessionize(Tables.events(s, d), 30 * 60 * 1000000L)
        // integer DIV, not double division truncated back — the engine's
        // integer-DIV discipline; bit-exact vs the oracle's `//` for any
        // epoch magnitude or sign
        .groupBy(expr("t_start_us DIV 86400000000").as("day"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1L, 1L).otherwise(0L))
            .as("n_bounces")),
      Some("""WITH flagged AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
             |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
             |      THEN 1 ELSE 0 END AS is_new
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_us(ts), event_id)),
             |sess AS (
             |  SELECT user_id,
             |    sum(is_new) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id
             |      ROWS UNBOUNDED PRECEDING) AS session_id,
             |    ts_us
             |  FROM flagged),
             |grouped AS (
             |  SELECT user_id, session_id, count(*) AS n_events,
             |    min(ts_us) AS t_start_us
             |  FROM sess GROUP BY 1, 2)
             |SELECT t_start_us // 86400000000 AS day,
             |  count(*) AS n_sessions,
             |  CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_bounces
             |FROM grouped GROUP BY 1""".stripMargin)))
}
