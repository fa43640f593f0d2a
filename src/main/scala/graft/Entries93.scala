package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-13 batch 9 — the weekly priority-sample estimator, the batch
  * twin of [[graft.streaming.StreamingFeatures.streamPriorityUpsert]]
  * (Duffield–Lund–Thorup 2007, extending q442's one-global-sample
  * operator to the per-week grain the streaming sink maintains):
  *
  *  - q493 WEEKLY PRIORITY SAMPLES: per week the k+1 highest-priority
  *    event rows (priority = w·2e6 DIV ug on the deterministic odd-grid
  *    hash uniform — pq sits on the same cent scale as w), τ = the
  *    (k+1)-th priority (0 for exhaustive weeks), est = Σ max(w, τ)
  *    over the k kept rows — the DLT unbiased estimator of the week's
  *    total — beside the exact weekly total with the error in per-mille
  *    (−1 sentinel for zero-total weeks, the q448 convention). The
  *    sample state is a per-week map-side WindowGroupLimit top-k; the
  *    store this mirrors is replay-absorbing (order statistic of a
  *    keyed row set), driven through restart/checkpoint-loss in
  *    StreamingSpec.
  *
  * Reference anchor: the reference has no sampling surface (775-LoC
  * pandas feature store — SURVEY.md §0); this extends the mandated
  * sketch/sampling family and completes the streaming face's weighted-
  * sampling member.
  */
object Entries93 {

  def all: Seq[Q] = Seq(priorityWeekly)

  private val K = 32

  private val priorityWeekly: Q =
    Q("q493_priority_weekly",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("ts_us DIV 604800000000").as("week"),
            col("event_id"),
            expr("CAST(round(coalesce(value, 0.0) * 100) AS BIGINT)")
              .as("w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pri = ev
          .withColumn("ug",
            (graft.ext.Dedup.contentId(col("event_id").cast("string"))
              % 1000000L) * 2L + 1L)
          .withColumn("pq", expr(
            "CAST(CAST(w AS DECIMAL(38,0)) * 2000000 DIV ug AS BIGINT)"))
        val rk = pri.withColumn("rn", row_number().over(
            Window.partitionBy(col("week"))
              .orderBy(col("pq").desc, col("event_id").asc)))
          .filter(col("rn") <= K + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tau = rk.groupBy(col("week").as("tw"))
          .agg(coalesce(max(when(col("rn") === K + 1, col("pq"))),
            lit(0L)).as("tau"))
        val est = rk.filter(col("rn") <= K)
          .join(tau, col("tw") === col("week"))
          .groupBy(col("week"), col("tau"))
          .agg(count(lit(1)).as("n_kept"),
            sum(greatest(col("w"), col("tau"))).as("est_cents"))
        val exact = ev.groupBy(col("week").as("xw"))
          .agg(sum(col("w")).as("exact_cents"))
        est.join(exact, col("xw") === col("week"))
          .select(col("week"), col("n_kept"), col("tau"),
            col("est_cents"), col("exact_cents"),
            expr("CASE WHEN exact_cents = 0 THEN -1L ELSE" +
              " abs(est_cents - exact_cents) * 1000" +
              " DIV exact_cents END").as("err_pm"))
      },
      Some(s"""WITH ev AS (
              |  SELECT CAST(epoch_us(ts) // 604800000000 AS BIGINT)
              |      AS week, event_id,
              |    CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS w
              |  FROM events),
              |pri AS (
              |  SELECT week, event_id, w,
              |    CAST(CAST(w AS HUGEINT) * 2000000
              |      // (('0x' || substr(md5(CAST(event_id AS VARCHAR)),
              |        1, 12))::BIGINT % 1000000 * 2 + 1) AS BIGINT)
              |      AS pq
              |  FROM ev),
              |rk AS (SELECT *, row_number() OVER (PARTITION BY week
              |         ORDER BY pq DESC, event_id) AS rn FROM pri),
              |tau AS (SELECT week AS tw,
              |          coalesce(max(CASE WHEN rn = ${K + 1} THEN pq
              |            END), 0) AS tau
              |        FROM rk GROUP BY week),
              |est AS (
              |  SELECT week, tau, CAST(count(*) AS BIGINT) AS n_kept,
              |    CAST(sum(CASE WHEN w > tau THEN w ELSE tau END)
              |      AS BIGINT) AS est_cents
              |  FROM rk JOIN tau ON tw = week
              |  WHERE rn <= $K GROUP BY week, tau),
              |ex AS (SELECT week, CAST(sum(w) AS BIGINT) AS exact_cents
              |       FROM ev GROUP BY week)
              |SELECT est.week AS week, n_kept, CAST(tau AS BIGINT)
              |    AS tau, est_cents, exact_cents,
              |  CAST(CASE WHEN exact_cents = 0 THEN -1
              |    ELSE abs(est_cents - exact_cents) * 1000
              |      // exact_cents END AS BIGINT) AS err_pm
              |FROM est JOIN ex ON ex.week = est.week""".stripMargin))
}
