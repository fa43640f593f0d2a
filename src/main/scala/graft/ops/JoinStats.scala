package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Planner-style join-size and skew estimation from per-key histograms —
  * what a cost-based optimizer (or AQE's skew detector) computes BEFORE
  * committing to a join strategy. The reference hard-codes its one merge
  * with no size reasoning (reference: jobs/make_training_and_train.py:46).
  *
  * For an equi join L ⋈ R on key k, the exact output cardinality is
  * Σ_k |L_k|·|R_k|. Computing it needs only the two key histograms — each a
  * map-side-combinable groupBy that reduces the inputs to |distinct keys|
  * rows — joined on the key. The same pass yields the key-overlap Venn
  * (left-only / right-only / both) and the single heaviest key's share of
  * the output, which is precisely the signal that decides broadcast vs
  * sort-merge vs salted execution at 100 TB. Estimating on histograms this
  * way costs two small shuffles instead of materializing a possibly
  * quadratic join.
  */
object JoinStats {

  /** left/right: one column `key` each (pre-projected). One summary row. */
  def joinEstimate(left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.groupBy(col("key")).agg(count(lit(1)).as("nl"))
    val r = right.groupBy(col("key")).agg(count(lit(1)).as("nr"))
    l.join(r, Seq("key"), "full_outer")
      .agg(
        sum(when(col("nl").isNotNull, 1L).otherwise(0L)).as("distinct_left"),
        sum(when(col("nr").isNotNull, 1L).otherwise(0L)).as("distinct_right"),
        sum(when(col("nl").isNotNull && col("nr").isNotNull, 1L).otherwise(0L))
          .as("overlap_keys"),
        sum(when(col("nr").isNull, 1L).otherwise(0L)).as("left_only_keys"),
        sum(when(col("nl").isNull, 1L).otherwise(0L)).as("right_only_keys"),
        coalesce(sum(col("nl") * col("nr")), lit(0L)).as("join_rows"),
        coalesce(max(col("nl") * col("nr")), lit(0L)).as("max_key_rows"))
      .withColumn("skew_share",
        when(col("join_rows") > 0,
          col("max_key_rows").cast("double") / col("join_rows").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** DuckDB mirror: purchases vs clicks key histograms on events.user_id. */
  val joinEstimateSql: String =
    """WITH l AS (
      |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS nl
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |r AS (
      |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS nr
      |  FROM events WHERE event_type = 'click' GROUP BY 1),
      |j AS (SELECT l.key AS lk, r.key AS rk, nl, nr
      |      FROM l FULL OUTER JOIN r ON l.key = r.key)
      |SELECT
      |  CAST(sum(CASE WHEN lk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS distinct_left,
      |  CAST(sum(CASE WHEN rk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS distinct_right,
      |  CAST(sum(CASE WHEN lk IS NOT NULL AND rk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS overlap_keys,
      |  CAST(sum(CASE WHEN rk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS left_only_keys,
      |  CAST(sum(CASE WHEN lk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS right_only_keys,
      |  CAST(coalesce(sum(nl * nr), 0) AS BIGINT) AS join_rows,
      |  CAST(coalesce(max(nl * nr), 0) AS BIGINT) AS max_key_rows,
      |  CASE WHEN coalesce(sum(nl * nr), 0) > 0
      |    THEN CAST(max(nl * nr) AS DOUBLE) / CAST(sum(nl * nr) AS DOUBLE)
      |    ELSE 0.0 END AS skew_share
      |FROM j""".stripMargin
}
