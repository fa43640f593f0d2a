package graft

import org.apache.spark.sql.functions._
import graft.ext._
import graft.ExtEntries.Q

/** Round-4 query surface: interval coalescing, Pareto skyline, the forward
  * as-of join (completing the as-of family), integer sliding kernels, and
  * bounded multi-source BFS. Oracles are independent formulations where the
  * operator has a brute-force equivalent (skyline's NOT EXISTS, forward
  * as-of's min-join) so the check proves the distributed trick, not just
  * the arithmetic.
  */
object Entries5 {

  val all: Seq[Q] = Seq(

    // Span coalescing: 30-minute activity intervals per user, overlapping-
    // or-touching spans merged by the linear window sweep. The oracle
    // replays the identical sweep (same tie order), all integer micros.
    Q("q116_interval_coalesce",
      (s, d) => graft.ops.Relational.coalesceIntervals(
        Tables.events(s, d).select(col("user_id"),
          col("ts_us").as("start_us"),
          (col("ts_us") + 1800000000L).as("end_us"), col("event_id")),
        "user_id", "start_us", "end_us", "event_id"),
      Some("""WITH iv AS (
             |  SELECT user_id, epoch_us(ts) AS start_us,
             |    epoch_us(ts) + 1800000000 AS end_us, event_id
             |  FROM events),
             |pm AS (
             |  SELECT user_id, start_us, end_us, event_id,
             |    max(end_us) OVER (PARTITION BY user_id
             |      ORDER BY start_us, end_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
             |  FROM iv),
             |gg AS (
             |  SELECT user_id, start_us, end_us,
             |    sum(CASE WHEN prev_max IS NULL OR start_us > prev_max
             |        THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
             |      ORDER BY start_us, end_us, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
             |  FROM pm)
             |SELECT user_id, min(start_us) AS interval_start,
             |  max(end_us) AS interval_end, CAST(count(*) AS BIGINT) AS n_rows
             |FROM gg GROUP BY user_id, grp""".stripMargin)),

    // 2-D Pareto skyline (maximize quantity AND price) over distinct pairs
    // of lineitem — "largest + priciest order lines". Spark side is the
    // domain-bounded window sweep; the oracle is the independent
    // brute-force NOT EXISTS dominance check, so the check proves the
    // sweep enumerates exactly the undominated set.
    Q("q117_skyline",
      (s, d) => graft.ops.Relational.skyline2D(
        Tables.lineitem(s, d).select(
          col("l_quantity").cast("long").as("qty"),
          expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("price_cents")),
        "qty", "price_cents"),
      Some("""WITH p AS (
             |  SELECT CAST(l_quantity AS BIGINT) AS qty,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
             |    count(*) AS n_rows
             |  FROM lineitem GROUP BY 1, 2)
             |SELECT qty, price_cents, n_rows FROM p a
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM p b
             |  WHERE b.qty >= a.qty AND b.price_cents >= a.price_cents
             |    AND (b.qty > a.qty OR b.price_cents > a.price_cents))""".stripMargin)),

    // Forward as-of: each purchase matched to the user's EARLIEST click at
    // or after it (ties on click ts broken by id). Spark runs the
    // union-window formulation; the oracle is the independent min-join.
    Q("q118_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        graft.ops.Snapshots.asOfJoinForward(
          ev.filter(col("event_type") === "purchase")
            .select(col("event_id"), col("user_id"), col("ts_us")),
          ev.filter(col("event_type") === "click")
            .select(col("user_id"), col("ts_us"),
              col("event_id").as("click_id"),
              col("ts_us").as("click_ts_us")),
          "user_id", "ts_us", "click_id", Seq("click_id", "click_ts_us"))
      },
      Some("""WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us
             |           FROM events WHERE event_type = 'purchase'),
             |c AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id
             |      FROM events WHERE event_type = 'click'),
             |m AS (SELECT p.event_id, min(c.ts_us) AS m_ts
             |      FROM p LEFT JOIN c ON c.user_id = p.user_id
             |        AND c.ts_us >= p.ts_us
             |      GROUP BY p.event_id),
             |pick AS (SELECT p.event_id, m.m_ts, min(c.event_id) AS cid
             |         FROM p JOIN m ON m.event_id = p.event_id
             |         LEFT JOIN c ON c.user_id = p.user_id AND c.ts_us = m.m_ts
             |         GROUP BY 1, 2)
             |SELECT p.user_id, p.ts_us, p.event_id,
             |  pick.cid AS click_id, pick.m_ts AS click_ts_us
             |FROM p JOIN pick ON pick.event_id = p.event_id""".stripMargin)),

    // Integer sliding kernels per user (causal 8-4-2-1 + centered 1-2-1
    // over cents) — division- and transcendental-free smoothing, exact
    // BIGINT in both engines.
    Q("q119_kernel_smooth",
      (s, d) => graft.ops.Relational.kernelSmooth(
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"), col("value")),
        "user_id", "ts_us", "event_id", "value"),
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events)
             |SELECT user_id, ts_us, event_id, cents,
             |  cents * 8 + coalesce(lag(cents, 1) OVER w, 0) * 4
             |    + coalesce(lag(cents, 2) OVER w, 0) * 2
             |    + coalesce(lag(cents, 3) OVER w, 0) AS causal_w15,
             |  coalesce(lag(cents, 1) OVER w, 0) + cents * 2
             |    + coalesce(lead(cents, 1) OVER w, 0) AS centered_w4
             |FROM e WINDOW w AS (PARTITION BY user_id
             |  ORDER BY ts_us, event_id)""".stripMargin)),

    // Bounded multi-source BFS (3 hops) from seed nodes (node % 50 = 0)
    // over the undirected customer↔supplier purchase graph — exact integer
    // hop distances, Pregel-as-joins, oracle = 3 unrolled CTE rounds.
    Q("q120_bfs_khop",
      (s, d) => Curation.bfsDistances(
        Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst")),
        col("node") % 50 === 0, 3),
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |e AS (SELECT src, dst FROM e0
             |      UNION SELECT dst AS src, src AS dst FROM e0),
             |n AS (SELECT DISTINCT src AS node FROM e),
             |d0 AS (SELECT node, CAST(0 AS BIGINT) AS dist FROM n
             |       WHERE node % 50 = 0),
             |d1 AS (SELECT node, min(dist) AS dist FROM (
             |         SELECT node, dist FROM d0
             |         UNION ALL SELECT e.dst AS node, d0.dist + 1 AS dist
             |         FROM e JOIN d0 ON e.src = d0.node) GROUP BY node),
             |d2 AS (SELECT node, min(dist) AS dist FROM (
             |         SELECT node, dist FROM d1
             |         UNION ALL SELECT e.dst AS node, d1.dist + 1 AS dist
             |         FROM e JOIN d1 ON e.src = d1.node) GROUP BY node),
             |d3 AS (SELECT node, min(dist) AS dist FROM (
             |         SELECT node, dist FROM d2
             |         UNION ALL SELECT e.dst AS node, d2.dist + 1 AS dist
             |         FROM e JOIN d2 ON e.src = d2.node) GROUP BY node)
             |SELECT node, dist FROM d3""".stripMargin))
  )
}
