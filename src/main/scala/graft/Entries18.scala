package graft

import org.apache.spark.sql.functions._
import graft.ext.Curation
import graft.ExtEntries.Q

/** Round-6 batch 8: recsys graph construction with the power-user guard. */
object Entries18 {

  val all: Seq[Q] = Seq(

    // Item-item co-engagement edges from the user-item event stream, with
    // the per-user top-10 recency cap applied BEFORE pairing (the guard
    // that keeps the projection O(m²) per user instead of quadratic in a
    // power user's history); edges seen by < 2 users dropped.
    Q("q192_coengagement",
      (s, d) => Curation.coengagementPairs(Tables.events(s, d), 10, 2L),
      Some("""WITH ui AS (
             |  SELECT user_id, props AS item, max(epoch_us(ts)) AS last_ts
             |  FROM events WHERE props IS NOT NULL GROUP BY 1, 2),
             |capped AS (
             |  SELECT user_id, item FROM (
             |    SELECT *, row_number() OVER (PARTITION BY user_id
             |      ORDER BY last_ts DESC, item ASC) AS rn
             |    FROM ui)
             |  WHERE rn <= 10)
             |SELECT a.item AS i1, b.item AS i2,
             |  CAST(count(*) AS BIGINT) AS n_users
             |FROM capped a JOIN capped b
             |  ON a.user_id = b.user_id AND a.item < b.item
             |GROUP BY 1, 2
             |HAVING count(*) >= 2""".stripMargin)),

    // Time-budgeted window funnel (view → click → purchase within 24 h of
    // the starting view; every view is a candidate start, best stage per
    // user). Greedy earliest-next-stage is provably optimal for an ordered
    // pattern, so two forward as-of joins compute it exactly — the oracle
    // is the literal correlated-subquery formulation.
    Q("q193_window_funnel",
      (s, d) => graft.ops.Sessions.windowFunnel(Tables.events(s, d),
        86400000000L),
      Some("""WITH v AS (
             |  SELECT user_id, epoch_us(ts) AS vts FROM events
             |  WHERE event_type = 'view'),
             |c AS (
             |  SELECT DISTINCT user_id, epoch_us(ts) AS cts FROM events
             |  WHERE event_type = 'click'),
             |p AS (
             |  SELECT DISTINCT user_id, epoch_us(ts) AS pts FROM events
             |  WHERE event_type = 'purchase'),
             |s1 AS (
             |  SELECT v.user_id, v.vts,
             |    (SELECT min(c.cts) FROM c
             |     WHERE c.user_id = v.user_id AND c.cts >= v.vts) AS cts
             |  FROM v),
             |s2 AS (
             |  SELECT *, CASE WHEN cts IS NOT NULL THEN
             |    (SELECT min(p.pts) FROM p
             |     WHERE p.user_id = s1.user_id AND p.pts >= s1.cts) END AS pts
             |  FROM s1)
             |SELECT user_id, count(*) AS n_views,
             |  max(CASE WHEN cts IS NOT NULL AND cts <= vts + 86400000000
             |    THEN CASE WHEN pts IS NOT NULL AND pts <= vts + 86400000000
             |      THEN 3 ELSE 2 END
             |    ELSE 1 END) AS best_stage
             |FROM s2 GROUP BY 1""".stripMargin)))
}
