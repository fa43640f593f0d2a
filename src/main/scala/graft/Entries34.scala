package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 13: time-weighted average balance, order-to-cash latency,
  * growth accounting, sweep-line concurrency.
  */
object Entries34 {

  val all: Seq[Q] = Seq(

    // TIME-WEIGHTED AVERAGE BALANCE per part: the clamped running balance
    // (q212's prefix-min algebra) integrated over time — Σ Sᵢ·(tᵢ₊₁−tᵢ)
    // in balance·seconds as the exact pair (twab_num_s, span_s); the
    // financial exposure metric a point-in-time average gets wrong.
    // Same single key exchange as q212 plus one lead on the same sort.
    Q("q251_twab",
      (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("ts").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .select(col("l_partkey"),
            (graft.ops.Relational.epochUs(col("l_shipdate")) / 1000000L)
              .cast("long").as("ts"),
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_returnflag") === "R",
              round(col("l_quantity")).cast("long"))
              .otherwise(-round(col("l_quantity")).cast("long")).as("delta"))
          .withColumn("p", sum(col("delta")).over(run))
          .withColumn("s",
            col("p") - least(min(col("p")).over(run), lit(0L)))
          .withColumn("nxt", lead(col("ts"), 1).over(w))
          .groupBy(col("l_partkey"))
          .agg(coalesce(sum(col("s") * (col("nxt") - col("ts"))), lit(0L))
            .as("twab_num_s"),
            (max(col("ts")) - min(col("ts"))).as("span_s"),
            count(lit(1)).as("n_lines"))
      },
      Some("""WITH d AS (
             |  SELECT l_partkey, epoch_us(l_shipdate) // 1000000 AS ts,
             |    l_orderkey, l_linenumber,
             |    CASE WHEN l_returnflag = 'R'
             |      THEN CAST(round(l_quantity) AS BIGINT)
             |      ELSE -CAST(round(l_quantity) AS BIGINT) END AS delta
             |  FROM lineitem),
             |w1 AS (
             |  SELECT l_partkey, ts,
             |    sum(delta) OVER (PARTITION BY l_partkey
             |      ORDER BY ts, l_orderkey, l_linenumber
             |      ROWS UNBOUNDED PRECEDING) AS p,
             |    row_number() OVER (PARTITION BY l_partkey
             |      ORDER BY ts, l_orderkey, l_linenumber) AS rn,
             |    lead(ts) OVER (PARTITION BY l_partkey
             |      ORDER BY ts, l_orderkey, l_linenumber) AS nxt
             |  FROM d),
             |w2 AS (
             |  SELECT l_partkey, ts, nxt,
             |    p - least(min(p) OVER (PARTITION BY l_partkey ORDER BY rn
             |      ROWS UNBOUNDED PRECEDING), 0) AS s
             |  FROM w1)
             |SELECT l_partkey,
             |  CAST(coalesce(sum(s * (nxt - ts)), 0) AS BIGINT)
             |    AS twab_num_s,
             |  CAST(max(ts) - min(ts) AS BIGINT) AS span_s,
             |  count(*) AS n_lines
             |FROM w2 GROUP BY 1""".stripMargin)),

    // ORDER-TO-CASH LATENCY decomposition per priority: order → first
    // ship (reaction) and first → last ship (fulfillment spread), exact
    // integer days; per priority the exact lower-median reaction and the
    // max spread. Facts reduce per order BEFORE any window.
    Q("q252_o2c_latency",
      (s, d) => {
        val perOrder = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(min(graft.ops.Relational.epochUs(col("l_shipdate")))
            .as("first_us"),
            max(graft.ops.Relational.epochUs(col("l_shipdate")))
              .as("last_us"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_orderpriority"),
            graft.ops.Relational.epochUs(col("o_orderdate")).as("ord_us")),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority"),
            expr("(first_us - ord_us) DIV 86400000000").as("react_d"),
            expr("(last_us - first_us) DIV 86400000000").as("spread_d"),
            col("l_orderkey"))
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(col("react_d").asc, col("l_orderkey").asc)
        perOrder
          .withColumn("rn", row_number().over(w).cast("long"))
          .withColumn("cnt", count(lit(1)).over(
            Window.partitionBy(col("o_orderpriority"))))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            max(when(col("rn") === expr("(cnt + 1) DIV 2"),
              col("react_d"))).as("median_react_d"),
            max(col("spread_d")).as("max_spread_d"))
      },
      Some("""WITH po AS (
             |  SELECT o.o_orderpriority, l.l_orderkey,
             |    (min(epoch_us(l.l_shipdate)) - epoch_us(o.o_orderdate))
             |      // 86400000000 AS react_d,
             |    (max(epoch_us(l.l_shipdate)) - min(epoch_us(l.l_shipdate)))
             |      // 86400000000 AS spread_d
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  GROUP BY 1, 2, o.o_orderdate),
             |rk AS (
             |  SELECT *, row_number() OVER (PARTITION BY o_orderpriority
             |    ORDER BY react_d, l_orderkey) AS rn,
             |    count(*) OVER (PARTITION BY o_orderpriority) AS cnt
             |  FROM po)
             |SELECT o_orderpriority, count(*) AS n_orders,
             |  CAST(max(CASE WHEN rn = (cnt + 1) // 2 THEN react_d END)
             |    AS BIGINT) AS median_react_d,
             |  CAST(max(spread_d) AS BIGINT) AS max_spread_d
             |FROM rk GROUP BY 1""".stripMargin)),

    // GROWTH ACCOUNTING (new / retained / resurrected / churned) per
    // week: the product-analytics state machine over (user, active-week)
    // rows — new = first week, retained = active previous week too,
    // resurrected = returning after a gap; churned emitted AT week w+1
    // for users active in w but not w+1 (the final corpus week emits no
    // churn — unknowable). All from one distinct reduce + one lag/lead
    // window; counts per (week, class).
    Q("q253_growth_accounting",
      (s, d) => {
        val wu = Tables.events(s, d)
          .select(col("user_id"),
            (col("ts_us") / 604800000000L).cast("long").as("week"))
          .distinct()
          // maxWeek action + tagged window consume it; lazy persist
          // keeps lineage (executor loss recomputes, not fails)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w = Window.partitionBy(col("user_id")).orderBy(col("week").asc)
        val maxWeek = wu.agg(max(col("week"))).head().getLong(0)
        val tagged = wu
          .withColumn("first_w", min(col("week")).over(
            Window.partitionBy(col("user_id"))))
          .withColumn("prev_w", lag(col("week"), 1).over(w))
          .withColumn("next_w", lead(col("week"), 1).over(w))
        val active = tagged.select(col("week"),
          when(col("week") === col("first_w"), "new")
            .when(col("prev_w") === col("week") - 1, "retained")
            .otherwise("resurrected").as("class"))
        val churned = tagged
          .filter(col("week") < maxWeek &&
            (col("next_w").isNull || col("next_w") > col("week") + 1))
          .select((col("week") + 1).as("week"), lit("churned").as("class"))
        active.unionByName(churned)
          .groupBy(col("week"), col("class"))
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""WITH wu AS (
             |  SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS week
             |  FROM events),
             |mx AS (SELECT max(week) AS max_week FROM wu),
             |tagged AS (
             |  SELECT user_id, week,
             |    min(week) OVER (PARTITION BY user_id) AS first_w,
             |    lag(week) OVER w AS prev_w,
             |    lead(week) OVER w AS next_w
             |  FROM wu
             |  WINDOW w AS (PARTITION BY user_id ORDER BY week)),
             |labeled AS (
             |  SELECT week,
             |    CASE WHEN week = first_w THEN 'new'
             |         WHEN prev_w = week - 1 THEN 'retained'
             |         ELSE 'resurrected' END AS class
             |  FROM tagged
             |  UNION ALL
             |  SELECT week + 1, 'churned'
             |  FROM tagged, mx
             |  WHERE week < max_week
             |    AND (next_w IS NULL OR next_w > week + 1))
             |SELECT week, class, count(*) AS n_users
             |FROM labeled GROUP BY 1, 2""".stripMargin)),

    // SWEEP-LINE MAX CONCURRENCY per nation: how many orders were
    // simultaneously in flight ([order date, last ship), half-open)?
    // Each interval emits +1/−1 events; a running sum ordered
    // (ts, delta asc — ends before starts at the same instant, the
    // half-open convention) is the concurrency curve; max + its earliest
    // time per nation. One window over 2 events/order.
    Q("q254_max_concurrency",
      (s, d) => {
        val spans = Tables.lineitem(s, d)
          .groupBy(col("l_orderkey"))
          .agg(max(graft.ops.Relational.epochUs(col("l_shipdate")))
            .as("e"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_custkey"),
            graft.ops.Relational.epochUs(col("o_orderdate")).as("s")),
            col("l_orderkey") === col("o_orderkey"))
          .join(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey")),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nation"),
            col("s"), col("e"), col("o_orderkey"))
          // both union branches consume it; persist keeps lineage
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val evs = spans.select(col("nation"), col("s").as("ts"),
          lit(1L).as("delta"), col("o_orderkey"))
          .unionByName(spans.select(col("nation"), col("e").as("ts"),
            lit(-1L).as("delta"), col("o_orderkey")))
        val w = Window.partitionBy(col("nation"))
          .orderBy(col("ts").asc, col("delta").asc, col("o_orderkey").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        evs
          .withColumn("depth", sum(col("delta")).over(w))
          .withColumn("mx", max(col("depth")).over(
            Window.partitionBy(col("nation"))))
          .groupBy(col("nation"))
          .agg(max(col("depth")).as("max_concurrent"),
            min(when(col("depth") === col("mx"), col("ts")))
              .as("first_peak_ts"))
      },
      Some("""WITH spans AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             |    epoch_us(o.o_orderdate) AS s, le.e, o.o_orderkey
             |  FROM orders o
             |  JOIN (SELECT l_orderkey, max(epoch_us(l_shipdate)) AS e
             |    FROM lineitem GROUP BY 1) le ON le.l_orderkey = o.o_orderkey
             |  JOIN customer c ON o.o_custkey = c.c_custkey),
             |evs AS (
             |  SELECT nation, s AS ts, 1 AS delta, o_orderkey FROM spans
             |  UNION ALL
             |  SELECT nation, e AS ts, -1 AS delta, o_orderkey FROM spans),
             |depth AS (
             |  SELECT nation, ts,
             |    sum(delta) OVER (PARTITION BY nation
             |      ORDER BY ts, delta, o_orderkey
             |      ROWS UNBOUNDED PRECEDING) AS depth
             |  FROM evs),
             |mx AS (
             |  SELECT nation, max(depth) AS max_concurrent
             |  FROM depth GROUP BY 1)
             |SELECT d.nation,
             |  CAST(any_value(m.max_concurrent) AS BIGINT) AS max_concurrent,
             |  CAST(min(CASE WHEN d.depth = m.max_concurrent THEN d.ts END)
             |    AS BIGINT) AS first_peak_ts
             |FROM depth d JOIN mx m ON d.nation = m.nation
             |GROUP BY 1""".stripMargin)))
}
