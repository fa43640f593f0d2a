package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 16: LTV milestone detection, rolling percentile bands,
  * decline-streak monitoring, join fan-out guard.
  */
object Entries37 {

  val all: Seq[Q] = Seq(

    // LTV MILESTONE: per user, cumulative purchase spend and the FIRST
    // moment it crosses $200 — running sum + conditional min, one window
    // pass (milestone detection without a self-join; the "time to $X"
    // growth KPI). Users never crossing emit NULLs.
    Q("q261_ltv_milestone",
      (s, d) => {
        val pur = Tables.events(s, d)
          .filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"),
            round(col("value") * 100).cast("long").as("cents"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pur
          .withColumn("cum", sum(col("cents")).over(w))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("user_id"))
              .orderBy(col("ts_us").asc, col("event_id").asc)).cast("long"))
          .groupBy(col("user_id"))
          .agg(sum(col("cents")).as("total_c"),
            count(lit(1)).as("n_purchases"),
            min(when(col("cum") >= 20000L, col("ts_us")))
              .as("milestone_ts"),
            min(when(col("cum") >= 20000L, col("rn")))
              .as("n_to_milestone"))
      },
      Some("""WITH pur AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |cum AS (
             |  SELECT user_id, ts_us, cents,
             |    sum(cents) OVER w AS cum,
             |    row_number() OVER w AS rn
             |  FROM pur
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id
             |    ROWS UNBOUNDED PRECEDING))
             |SELECT user_id, CAST(sum(cents) AS BIGINT) AS total_c,
             |  count(*) AS n_purchases,
             |  CAST(min(CASE WHEN cum >= 20000 THEN ts_us END) AS BIGINT)
             |    AS milestone_ts,
             |  CAST(min(CASE WHEN cum >= 20000 THEN rn END) AS BIGINT)
             |    AS n_to_milestone
             |FROM cum GROUP BY 1""".stripMargin)),

    // ROLLING PERCENTILE BANDS over the global daily revenue series: the
    // last-28-OBSERVATIONS frame (list ≤ 28 — state bounded by width, the
    // q92/q190 discipline) sorted once per row, exact lower P10/P50/P90
    // picked at rank ⌈n·q⌉ — the control-chart band around q227's
    // point forecast. Frame population emitted so short leading frames
    // are visible, never silently shortened.
    Q("q262_rolling_bands",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy((graft.ops.Relational.epochUs(col("o_orderdate"))
            / 86400000000L).cast("long").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        val w = Window.orderBy(col("day").asc).rowsBetween(-27, 0)
        daily
          .withColumn("l", sort_array(collect_list(col("c")).over(w)))
          .withColumn("n", size(col("l")).cast("long"))
          .select(col("day"), col("c"), col("n").as("frame_n"),
            expr("element_at(l, CAST((n * 1 + 9) DIV 10 AS INT))")
              .as("p10_c"),
            expr("element_at(l, CAST((n * 5 + 9) DIV 10 AS INT))")
              .as("p50_c"),
            expr("element_at(l, CAST((n * 9 + 9) DIV 10 AS INT))")
              .as("p90_c"))
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |framed AS (
             |  SELECT day, c,
             |    list_sort(list(c) OVER (ORDER BY day
             |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW)) AS l
             |  FROM daily)
             |SELECT day, c, CAST(len(l) AS BIGINT) AS frame_n,
             |  l[CAST((len(l) * 1 + 9) // 10 AS INT)] AS p10_c,
             |  l[CAST((len(l) * 5 + 9) // 10 AS INT)] AS p50_c,
             |  l[CAST((len(l) * 9 + 9) // 10 AS INT)] AS p90_c
             |FROM framed""".stripMargin)),

    // DECLINE-STREAK MONITOR: per nation, the longest run of CONSECUTIVE
    // weeks with week-over-week revenue decline (gaps-and-islands on the
    // declining weeks — island id = week − row_number, the q156 trick on
    // the sign series). The k-in-a-row alerting rule behind "three down
    // weeks pages someone".
    Q("q263_decline_streaks",
      (s, d) => {
        val weekly = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / 604800000000L).cast("long").as("week"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        val w = Window.partitionBy(col("nation")).orderBy(col("week").asc)
        val declining = weekly
          .withColumn("prev_w", lag(col("week"), 1).over(w))
          .withColumn("prev_c", lag(col("c"), 1).over(w))
          .filter(col("prev_w") === col("week") - 1 &&
            col("c") < col("prev_c"))
        declining
          .withColumn("isl", col("week") - row_number().over(
            Window.partitionBy(col("nation")).orderBy(col("week").asc)))
          .groupBy(col("nation"), col("isl"))
          .agg(count(lit(1)).as("len"))
          .groupBy(col("nation"))
          .agg(max(col("len")).as("max_streak"),
            sum(col("len")).as("n_decline_weeks"),
            count(lit(1)).as("n_streaks"))
      },
      Some("""WITH weekly AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             |    epoch_us(o.o_orderdate) // 604800000000 AS week,
             |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |decl AS (
             |  SELECT nation, week FROM (
             |    SELECT nation, week, c,
             |      lag(week) OVER w AS prev_w, lag(c) OVER w AS prev_c
             |    FROM weekly
             |    WINDOW w AS (PARTITION BY nation ORDER BY week))
             |  WHERE prev_w = week - 1 AND c < prev_c),
             |isl AS (
             |  SELECT nation,
             |    week - row_number() OVER (PARTITION BY nation
             |      ORDER BY week) AS isl
             |  FROM decl),
             |runs AS (
             |  SELECT nation, isl, count(*) AS len
             |  FROM isl GROUP BY 1, 2)
             |SELECT nation, CAST(max(len) AS BIGINT) AS max_streak,
             |  CAST(sum(len) AS BIGINT) AS n_decline_weeks,
             |  count(*) AS n_streaks
             |FROM runs GROUP BY 1""".stripMargin)),

    // JOIN FAN-OUT GUARD: the pipeline-safety contract "fact ⋈ dim must
    // not multiply rows" checked on a deterministically-dirtied dim
    // (every 17th customer duplicated): fact count, joined count, dup-key
    // count and the exact fan-out surplus in one row. The row-count
    // reconciliation that catches a bad dim BEFORE it poisons downstream
    // aggregates (q245's expectations engine, specialized to joins).
    Q("q264_join_guard",
      (s, d) => {
        // persisted: the dirtied dim feeds the dup census AND the join
        // probe; fact feeds its own count and the join — uncached, the
        // customer scan replans 4x, orders 2x (plan census r8)
        val dim = Tables.customer(s, d).select(col("c_custkey"))
        val dirtyDim = dim.unionByName(
          dim.filter(col("c_custkey") % 17 === 0))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val fact = Tables.orders(s, d).select(col("o_custkey"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dupKeys = dirtyDim.groupBy(col("c_custkey"))
          .agg(count(lit(1)).as("n"))
          .filter(col("n") > 1)
        val joined = fact.join(dirtyDim,
          col("o_custkey") === col("c_custkey"))
        fact.agg(count(lit(1)).as("n_fact"))
          .join(joined.agg(count(lit(1)).as("n_joined")))
          .join(dupKeys.agg(count(lit(1)).as("n_dup_keys")))
          .select(col("n_fact"), col("n_joined"), col("n_dup_keys"),
            (col("n_joined") - col("n_fact")).as("fanout_surplus"))
      },
      Some("""WITH dim AS (
             |  SELECT c_custkey FROM customer
             |  UNION ALL
             |  SELECT c_custkey FROM customer WHERE c_custkey % 17 = 0),
             |fact AS (SELECT o_custkey FROM orders),
             |j AS (SELECT * FROM fact JOIN dim
             |  ON o_custkey = c_custkey)
             |SELECT (SELECT count(*) FROM fact) AS n_fact,
             |  (SELECT count(*) FROM j) AS n_joined,
             |  (SELECT count(*) FROM (
             |    SELECT c_custkey FROM dim GROUP BY 1 HAVING count(*) > 1))
             |    AS n_dup_keys,
             |  (SELECT count(*) FROM j) - (SELECT count(*) FROM fact)
             |    AS fanout_surplus""".stripMargin)))
}
