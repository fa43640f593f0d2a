package graft

import org.apache.spark.sql.functions._
import graft.ops.{History, Relational, Tpch}
import graft.ExtEntries.Q

/** Round-5 batch 2: engagement streaks, CDC apply, group-top-k list
  * columns, and three more classic correlated-subquery shapes (Q11 share-
  * of-total, Q15 top-by-max, Q22 rich-idle anti-join) run decorrelated
  * against literal scalar-subquery oracles.
  */
object Entries9 {

  val all: Seq[Q] = Seq(

    // Longest consecutive-day activity streak per user (gaps-and-islands
    // over integer epoch days).
    Q("q156_streaks",
      (s, d) => History.streaks(
        Tables.events(s, d).select(col("user_id"), col("ts_us")),
        "user_id", "ts_us"),
      Some(History.streaksSql)),

    // CDC apply: collapse the I/U/D change feed to final state — last op
    // per key wins (ts desc, event_id tie-break), deletes drop the key.
    Q("q157_cdc_apply",
      (s, d) => History.cdcApply(
        Tables.events(s, d)
          .filter(col("event_type").isin("signup", "click", "error"))
          .select(col("user_id"), col("ts_us"), col("event_id"),
            when(col("event_type") === "signup", "I")
              .when(col("event_type") === "click", "U")
              .otherwise("D").as("op"),
            round(col("value") * 100).cast("long").as("cents")),
        "user_id", "ts_us", "event_id", "op", "cents"),
      Some(History.cdcApplySql)),

    // Per-customer top-3 parts by spend as ONE ordered list column
    // (sort_array over rank structs defeats collect_list arrival order).
    Q("q158_topk_list",
      (s, d) => Relational.groupTopKList(
        Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey"), col("l_partkey"))
          .agg(sum(round(col("l_extendedprice") * 100).cast("long"))
            .as("spend_c")),
        "o_custkey", "l_partkey", "spend_c", 3),
      Some("""WITH ps AS (
             |  SELECT o.o_custkey, l.l_partkey,
             |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             |      AS BIGINT) AS spend_c
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
             |  GROUP BY 1, 2),
             |rk AS (
             |  SELECT *, row_number() OVER (PARTITION BY o_custkey
             |    ORDER BY spend_c DESC, l_partkey ASC) AS rnk
             |  FROM ps)
             |SELECT o_custkey,
             |  string_agg(CAST(l_partkey AS VARCHAR), ',' ORDER BY rnk)
             |    AS top_items,
             |  CAST(count(*) AS BIGINT) AS n_items
             |FROM rk WHERE rnk <= 3 GROUP BY 1""".stripMargin)),

    // TPC-H Q11 shape: parts holding more than 1/2000 of global revenue —
    // integer cross-multiplied share test, sum OVER () on the reduced table.
    Q("q159_revenue_share",
      (s, d) => Tpch.revenueShare(Tables.lineitem(s, d), 2000L),
      Some(Tpch.revenueShareSql(2000L))),

    // TPC-H Q15 shape: top supplier(s) by 1996-Q1 revenue, ties kept.
    Q("q160_top_supplier",
      (s, d) => Tpch.topRevenueSupplier(Tables.lineitem(s, d),
        Tables.supplier(s, d), "1996-01-01 00:00:00", "1996-04-01 00:00:00"),
      Some(Tpch.topRevenueSupplierSql("1996-01-01 00:00:00",
        "1996-04-01 00:00:00"))),

    // TPC-H Q22 shape: above-average-balance customers with no orders
    // since 2000-01-01, exact integer average test + anti join, per
    // market segment.
    Q("q161_rich_idle",
      (s, d) => Tpch.richIdleCustomers(Tables.customer(s, d),
        Tables.orders(s, d), "2000-01-01 00:00:00"),
      Some(Tpch.richIdleCustomersSql("2000-01-01 00:00:00")))
  )
}
