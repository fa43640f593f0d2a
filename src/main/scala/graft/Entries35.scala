package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 14: forecasting lag-feature matrix, day-of-week profile,
  * repeat-purchase rates.
  */
object Entries35 {

  val all: Seq[Q] = Seq(

    // LAG-FEATURE MATRIX per (nation, day): revenue with DAY-EXACT lags
    // t−1 / t−7 / t−28 and the trailing-7-day sum — the forecasting
    // feature block. Lags are RANGE frames pinned to exactly day−k
    // ([k PRECEDING, k PRECEDING] on the integer day), so a missing
    // calendar day yields NULL instead of silently sliding to the
    // previous row (the row-lag trap q172/q240 guard against). One
    // exchange; all four frames share the sort.
    Q("q255_lag_features",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / 86400000000L).cast("long").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        val base = Window.partitionBy(col("nation")).orderBy(col("day").asc)
        def at(k: Int) = sum(col("c")).over(
          base.rangeBetween(-k, -k)).as(s"lag${k}_c")
        daily.select(col("nation"), col("day"), col("c"),
          at(1), at(7), at(28),
          sum(col("c")).over(base.rangeBetween(-6, 0)).as("ma7_sum_c"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             |    epoch_us(o.o_orderdate) // 86400000000 AS day,
             |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2)
             |SELECT nation, day, c,
             |  CAST(sum(c) OVER (PARTITION BY nation ORDER BY day
             |    RANGE BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT)
             |    AS lag1_c,
             |  CAST(sum(c) OVER (PARTITION BY nation ORDER BY day
             |    RANGE BETWEEN 7 PRECEDING AND 7 PRECEDING) AS BIGINT)
             |    AS lag7_c,
             |  CAST(sum(c) OVER (PARTITION BY nation ORDER BY day
             |    RANGE BETWEEN 28 PRECEDING AND 28 PRECEDING) AS BIGINT)
             |    AS lag28_c,
             |  CAST(sum(c) OVER (PARTITION BY nation ORDER BY day
             |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             |    AS ma7_sum_c
             |FROM daily""".stripMargin)),

    // DAY-OF-WEEK PROFILE: revenue by epoch-relative weekday (day mod 7 —
    // engine-independent integer; 0 = Thursday) with the grand total on
    // every row — the weekly-seasonality share as an exact pair, feeding
    // the q172/q220 seasonal ops.
    Q("q256_dow_profile",
      (s, d) => {
        val byDow = Tables.orders(s, d)
          .groupBy((expr(
            "unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
            % 7).as("dow"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("rev_c"), count(lit(1)).as("n_orders"))
        byDow.withColumn("total_c",
          sum(col("rev_c")).over(Window.partitionBy()))
      },
      Some("""WITH byDow AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 % 7 AS dow,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_c,
             |    count(*) AS n_orders
             |  FROM orders GROUP BY 1)
             |SELECT dow, rev_c, n_orders,
             |  CAST(sum(rev_c) OVER () AS BIGINT) AS total_c
             |FROM byDow""".stripMargin)),

    // REPEAT-PURCHASE RATE per brand: buyers vs buyers with a second
    // order of the same brand — the retail loyalty KPI as exact counts
    // ((customer, brand, order) reduces first; repeat = distinct orders
    // ≥ 2). Aggregate-then-aggregate, both partial-aggregable.
    Q("q257_repeat_rate",
      (s, d) => {
        val cb = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("p_brand"))
          .agg(countDistinct(col("o_orderkey")).as("n_orders"))
        cb.groupBy(col("p_brand"))
          .agg(count(lit(1)).as("n_buyers"),
            sum(when(col("n_orders") >= 2, 1L).otherwise(0L))
              .as("n_repeat_buyers"),
            sum(col("n_orders")).as("n_brand_orders"))
      },
      Some("""WITH cb AS (
             |  SELECT o.o_custkey, p.p_brand,
             |    count(DISTINCT l.l_orderkey) AS n_orders
             |  FROM lineitem l
             |  JOIN part p ON l.l_partkey = p.p_partkey
             |  JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  GROUP BY 1, 2)
             |SELECT p_brand, count(*) AS n_buyers,
             |  CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_repeat_buyers,
             |  CAST(sum(n_orders) AS BIGINT) AS n_brand_orders
             |FROM cb GROUP BY 1""".stripMargin)))
}
