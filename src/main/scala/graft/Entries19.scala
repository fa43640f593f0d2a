package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ExtEntries.Q

/** Round-6 batch 10: robust means, behavioral path mining, and censored
  * conversion timing.
  */
object Entries19 {

  val all: Seq[Q] = Seq(

    // 5 % trimmed mean per return flag: drop exactly k = n DIV 20 rows from
    // each tail by rank (ties pinned by line identity), BIGINT sum of the
    // rest, one pinned division — the robust mean beside winsorize (q132,
    // caps) and MAD (q123, flags).
    Q("q194_trimmed_mean",
      (s, d) => {
        val ranked = Tables.lineitem(s, d)
          .select(col("l_returnflag"),
            round(col("l_extendedprice") * 100).cast("long").as("cents"),
            col("l_orderkey"), col("l_linenumber"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("l_returnflag"))
              .orderBy(col("cents").asc, col("l_orderkey").asc,
                col("l_linenumber").asc)).cast("long"))
          .withColumn("n", count(lit(1)).over(
            Window.partitionBy(col("l_returnflag"))))
        ranked
          .filter(col("rn") > expr("n DIV 20") &&
            col("rn") <= col("n") - expr("n DIV 20"))
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("sum_kept"))
          .select(col("l_returnflag"), col("n_kept"), col("sum_kept"),
            (col("sum_kept").cast("double") / col("n_kept"))
              .as("trimmed_mean"))
      },
      Some("""WITH r AS (
             |  SELECT l_returnflag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |    CAST(row_number() OVER (PARTITION BY l_returnflag
             |      ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
             |        l_orderkey, l_linenumber) AS BIGINT) AS rn,
             |    CAST(count(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
             |  FROM lineitem)
             |SELECT l_returnflag, count(*) AS n_kept,
             |  CAST(sum(cents) AS BIGINT) AS sum_kept,
             |  CAST(CAST(sum(cents) AS BIGINT) AS DOUBLE) / count(*)
             |    AS trimmed_mean
             |FROM r
             |WHERE rn > n // 20 AND rn <= n - n // 20
             |GROUP BY 1""".stripMargin)),

    // Behavioral path mining: every consecutive 3-step event-type path per
    // user (strict (ts, event_id) order), counted corpus-wide with user
    // reach — the "what do users actually do" trigram table.
    Q("q195_path_trigrams",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .groupBy(col("event_type").as("s1"), col("t2").as("s2"),
            col("t3").as("s3"))
          .agg(count(lit(1)).as("n_paths"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    lead(event_type, 1) OVER w AS t2,
             |    lead(event_type, 2) OVER w AS t3
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |    ORDER BY epoch_us(ts), event_id))
             |SELECT event_type AS s1, t2 AS s2, t3 AS s3,
             |  count(*) AS n_paths,
             |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
             |FROM e WHERE t3 IS NOT NULL
             |GROUP BY 1, 2, 3""".stripMargin)),

    // Censored conversion timing per signup-week cohort: users' first view
    // → first purchase delay in whole days (integer DIV); per cohort the
    // converted count, censored count (no purchase ⇒ still "alive"), and
    // the exact lower-median day among converted — survival-analysis-lite
    // with no floats until nothing is left to divide.
    Q("q196_time_to_convert",
      (s, d) => {
        val ev = Tables.events(s, d)
        val firstView = ev.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("v0"))
        val firstBuy = ev.filter(col("event_type") === "purchase")
          .groupBy(col("user_id")).agg(min(col("ts_us")).as("p0"))
        // persisted: cohorts feeds the median branch AND the census —
        // uncached, both first-event aggregations replan per consumer
        // (plan census r8: 4 events scans -> 2)
        val cohorts = firstView
          .join(firstBuy, Seq("user_id"), "left")
          .withColumn("cohort_week", expr("v0 DIV 604800000000"))
          .withColumn("days", expr(
            "CASE WHEN p0 IS NOT NULL AND p0 >= v0 THEN (p0 - v0) DIV 86400000000 END"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val medW = Window.partitionBy(col("cohort_week"))
          .orderBy(col("days").asc, col("user_id").asc)
        val med = cohorts.filter(col("days").isNotNull)
          .withColumn("rn", row_number().over(medW).cast("long"))
          .withColumn("nc", count(lit(1)).over(
            Window.partitionBy(col("cohort_week"))))
          .filter(col("rn") === expr("(nc + 1) DIV 2"))
          .select(col("cohort_week"), col("days").as("median_days"))
        cohorts.groupBy(col("cohort_week"))
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("days").isNotNull, 1L).otherwise(0L))
              .as("n_converted"),
            sum(when(col("days").isNull || col("p0") < col("v0"), 1L)
              .otherwise(0L)).as("n_censored_or_presale"))
          .join(med, Seq("cohort_week"), "left")
      },
      Some("""WITH fv AS (
             |  SELECT user_id, min(epoch_us(ts)) AS v0 FROM events
             |  WHERE event_type = 'view' GROUP BY 1),
             |fb AS (
             |  SELECT user_id, min(epoch_us(ts)) AS p0 FROM events
             |  WHERE event_type = 'purchase' GROUP BY 1),
             |c AS (
             |  SELECT fv.user_id, v0, p0,
             |    v0 // 604800000000 AS cohort_week,
             |    CASE WHEN p0 IS NOT NULL AND p0 >= v0
             |      THEN (p0 - v0) // 86400000000 END AS days
             |  FROM fv LEFT JOIN fb ON fv.user_id = fb.user_id),
             |med AS (
             |  SELECT cohort_week, days AS median_days FROM (
             |    SELECT cohort_week, days, user_id,
             |      CAST(row_number() OVER (PARTITION BY cohort_week
             |        ORDER BY days, user_id) AS BIGINT) AS rn,
             |      CAST(count(*) OVER (PARTITION BY cohort_week)
             |        AS BIGINT) AS nc
             |    FROM c WHERE days IS NOT NULL)
             |  WHERE rn = (nc + 1) // 2)
             |SELECT c.cohort_week, count(*) AS n_users,
             |  CAST(sum(CASE WHEN days IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_converted,
             |  CAST(sum(CASE WHEN days IS NULL OR p0 < v0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_censored_or_presale,
             |  max(m.median_days) AS median_days
             |FROM c LEFT JOIN med m ON c.cohort_week = m.cohort_week
             |GROUP BY 1""".stripMargin)))
}
