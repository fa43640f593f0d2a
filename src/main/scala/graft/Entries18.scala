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
             |HAVING count(*) >= 2""".stripMargin)))
}
