package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 4: temporal absence anti-join, data-adaptive SAX
  * symbolization, integer burstiness/diversity profile, gapped
  * sequence-pattern existence mining.
  */
object Entries25 {

  val all: Seq[Q] = Seq(

    // TEMPORAL ABSENCE anti-join: purchases with NO click by the same user
    // in the preceding hour (window (p−1h, p], as-of ≤ semantics) — the
    // "unprompted purchase" complement of the funnel joins. One backward
    // as-of join (single key shuffle) carries the latest click ts; absence
    // is a row-local predicate on it — never a NOT EXISTS re-scan.
    Q("q219_unprompted_purchases",
      (s, d) => {
        val ev = Tables.events(s, d)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us"))
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_us"), col("ts_us").as("c_ts"))
        graft.ops.Snapshots.asOfJoin(purchases, clicks, "user_id", "ts_us",
          Seq("c_ts"))
          .filter(col("c_ts").isNull ||
            col("c_ts") <= col("ts_us") - 3600000000L)
          .select(col("user_id"), col("event_id"), col("ts_us"))
      },
      Some("""SELECT e.user_id, e.event_id, epoch_us(e.ts) AS ts_us
             |FROM events e
             |WHERE e.event_type = 'purchase' AND NOT EXISTS (
             |  SELECT 1 FROM events c
             |  WHERE c.event_type = 'click' AND c.user_id = e.user_id
             |    AND epoch_us(c.ts) > epoch_us(e.ts) - 3600000000
             |    AND epoch_us(c.ts) <= epoch_us(e.ts))""".stripMargin)),

    // SAX SYMBOLIZATION of the daily revenue series, data-adaptive
    // breakpoints: daily order totals → 7-day PAA chunks (full weeks only
    // — 7 distinct active days; partial windows are dropped, never
    // silently shortened, the q172 discipline) → rank-quartile symbols
    // a–d via ntile(4) on the pinned (sum, week) order. Zero floats: the
    // PAA value is the exact weekly cents SUM (monotone in the mean, so
    // bins are identical). The motif-mining front-end for the series ops.
    Q("q220_sax_symbols",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy((graft.ops.Relational.epochUs(col("o_orderdate"))
            / 86400000000L).cast("long").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        val weekly = daily
          .groupBy((col("day") / 7).cast("long").as("week"))
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("paa_c"))
          .filter(col("n_days") === 7)
        weekly
          .withColumn("q", ntile(4).over(
            Window.orderBy(col("paa_c").asc, col("week").asc)).cast("long"))
          .select(col("week"), col("paa_c"),
            when(col("q") === 1, "a").when(col("q") === 2, "b")
              .when(col("q") === 3, "c").otherwise("d").as("symbol"))
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |weekly AS (
             |  SELECT day // 7 AS week, count(*) AS n_days,
             |    CAST(sum(c) AS BIGINT) AS paa_c
             |  FROM daily GROUP BY 1 HAVING count(*) = 7),
             |binned AS (
             |  SELECT week, paa_c,
             |    ntile(4) OVER (ORDER BY paa_c, week) AS q
             |  FROM weekly)
             |SELECT week, paa_c,
             |  CASE q WHEN 1 THEN 'a' WHEN 2 THEN 'b' WHEN 3 THEN 'c'
             |    ELSE 'd' END AS symbol
             |FROM binned""".stripMargin)),

    // BEHAVIORAL PROFILE per user, all exact rationals: Fano burstiness of
    // the active-day count series (n·Σc² − (Σc)², n·Σc) — variance-to-mean
    // without a float — and Gini IMPURITY of the event-type mix
    // (T² − Σ_t c_t², T²) — the log-free diversity metric (entropy would
    // break the no-transcendentals oracle discipline). Two partial-
    // aggregable reduces (day grain, type grain) joined on the user key.
    Q("q221_behavior_profile",
      (s, d) => {
        val ev = Tables.events(s, d)
        val byDay = ev
          .groupBy(col("user_id"),
            (col("ts_us") / 86400000000L).cast("long").as("day"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_days"), sum(col("c")).as("n_events"),
            (count(lit(1)) * sum(col("c") * col("c")) -
              sum(col("c")) * sum(col("c"))).as("fano_num"),
            (count(lit(1)) * sum(col("c"))).as("fano_den"))
        val byType = ev
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("c"))
          .groupBy(col("user_id"))
          .agg((sum(col("c")) * sum(col("c")) - sum(col("c") * col("c")))
            .as("gini_num"),
            (sum(col("c")) * sum(col("c"))).as("gini_den"))
        byDay.join(byType, Seq("user_id"))
      },
      Some("""WITH byday AS (
             |  SELECT user_id, epoch_us(ts) // 86400000000 AS day,
             |    count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |fano AS (
             |  SELECT user_id, count(*) AS n_days,
             |    CAST(sum(c) AS BIGINT) AS n_events,
             |    CAST(count(*) * sum(c * c) - sum(c) * sum(c) AS BIGINT)
             |      AS fano_num,
             |    CAST(count(*) * sum(c) AS BIGINT) AS fano_den
             |  FROM byday GROUP BY 1),
             |bytype AS (
             |  SELECT user_id, event_type, count(*) AS c
             |  FROM events GROUP BY 1, 2),
             |gini AS (
             |  SELECT user_id,
             |    CAST(sum(c) * sum(c) - sum(c * c) AS BIGINT) AS gini_num,
             |    CAST(sum(c) * sum(c) AS BIGINT) AS gini_den
             |  FROM bytype GROUP BY 1)
             |SELECT f.user_id, n_days, n_events, fano_num, fano_den,
             |  gini_num, gini_den
             |FROM fano f JOIN gini g ON f.user_id = g.user_id""".stripMargin)),

    // GAPPED SEQUENCE-PATTERN existence mining: for every ordered type
    // triple (a, b, c), how many users' event streams contain it as a
    // (not necessarily contiguous) subsequence? Greedy matching — first a,
    // then the EARLIEST b after it, then any c after that — is exact for
    // subsequence existence, so three partial-aggregable reduces replace
    // the triple-correlated EXISTS: min-position per (user, a); earliest
    // b AFTER it (|events|·|types| bounded fan-out); max-position per
    // (user, c). The PrefixSpan-flavored sibling of the contiguous path
    // trigrams (q195).
    Q("q222_seq_patterns",
      (s, d) => {
        // materialized once: three consumers (aMin, ab probe, cMax)
        // would otherwise re-plan the scan+window three times
        val pos = Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("t"),
            row_number().over(Window.partitionBy(col("user_id"))
              .orderBy(col("ts_us").asc, col("event_id").asc))
              .cast("long").as("rn"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val aMin = pos.groupBy(col("user_id"), col("t").as("a"))
          .agg(min(col("rn")).as("a_rn"))
          .select(col("user_id"), col("a"), col("a_rn"))
        val ab = pos.join(aMin, Seq("user_id"))
          .filter(col("rn") > col("a_rn"))
          .groupBy(col("user_id"), col("a"), col("t").as("b"))
          .agg(min(col("rn")).as("ab_rn"))
        val cMax = pos.groupBy(col("user_id"), col("t").as("c"))
          .agg(max(col("rn")).as("c_rn"))
          .select(col("user_id"), col("c"), col("c_rn"))
        ab.join(cMax, Seq("user_id"))
          .filter(col("c_rn") > col("ab_rn"))
          .groupBy(col("a"), col("b"), col("c"))
          .agg(countDistinct(col("user_id")).as("n_users"))
      },
      Some("""WITH pos AS (
             |  SELECT user_id, event_type AS t,
             |    row_number() OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS rn
             |  FROM events),
             |amin AS (
             |  SELECT user_id, t AS a, min(rn) AS a_rn
             |  FROM pos GROUP BY 1, 2),
             |ab AS (
             |  SELECT p.user_id, amin.a, p.t AS b, min(p.rn) AS ab_rn
             |  FROM pos p JOIN amin ON p.user_id = amin.user_id
             |    AND p.rn > amin.a_rn
             |  GROUP BY 1, 2, 3),
             |cmax AS (
             |  SELECT user_id, t AS c, max(rn) AS c_rn
             |  FROM pos GROUP BY 1, 2)
             |SELECT ab.a, ab.b, cm.c,
             |  CAST(count(DISTINCT ab.user_id) AS BIGINT) AS n_users
             |FROM ab JOIN cmax cm ON ab.user_id = cm.user_id
             |  AND cm.c_rn > ab.ab_rn
             |GROUP BY 1, 2, 3""".stripMargin)))
}
