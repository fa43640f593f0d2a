package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 6: seasonal-naive backtest, calendar densification,
  * consistent pseudonymization, incremental join-view maintenance.
  */
object Entries27 {

  val all: Seq[Q] = Seq(

    // SEASONAL-NAIVE FORECAST BACKTEST: forecast(day) = revenue(day − 7),
    // scored per nation with integer MAE and signed-bias numerators (Σ|e|
    // and Σe in cents — no division, the "is last week a good predictor"
    // gate that should precede any fancier forecaster). Facts reduce to
    // the (nation, day) grain FIRST; the lag join is a self equi join on
    // the reduced series.
    Q("q227_seasonal_naive",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / 86400000000L).cast("long").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        val prev = daily.select(col("nation"), (col("day") + 7).as("day"),
          col("c").as("c_prev"))
        daily.join(prev, Seq("nation", "day"))
          .groupBy(col("nation"))
          .agg(count(lit(1)).as("n_evaluated"),
            sum(abs(col("c") - col("c_prev"))).as("mae_num_c"),
            sum(col("c") - col("c_prev")).as("bias_num_c"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             |    epoch_us(o.o_orderdate) // 86400000000 AS day,
             |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2)
             |SELECT a.nation, count(*) AS n_evaluated,
             |  CAST(sum(abs(a.c - b.c)) AS BIGINT) AS mae_num_c,
             |  CAST(sum(a.c - b.c) AS BIGINT) AS bias_num_c
             |FROM daily a JOIN daily b
             |  ON a.nation = b.nation AND b.day = a.day - 7
             |GROUP BY 1""".stripMargin)),

    // CALENDAR DENSIFICATION: per nation, the full min..max order-day
    // spine via sequence() + explode, left-joined against active days —
    // span, active and MISSING-day counts (the densify-before-window step
    // every gap-sensitive series op needs; q172's trend guard is the
    // consumer). The spine is domain-bounded (|nations| × |days|), never
    // fact-sized.
    Q("q228_calendar_densify",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nation"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / 86400000000L).cast("long").as("day"))
          .agg(count(lit(1)).as("n_orders"))
          // spine + left join both consume it (lazy persist keeps lineage)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val spine = daily.groupBy(col("nation"))
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(col("nation"),
            explode(expr("sequence(d0, d1)")).as("day"))
        spine.join(daily, Seq("nation", "day"), "left")
          .groupBy(col("nation"))
          .agg(count(lit(1)).as("n_span"),
            sum(when(col("n_orders").isNotNull, 1L).otherwise(0L))
              .as("n_active"),
            sum(when(col("n_orders").isNull, 1L).otherwise(0L))
              .as("n_missing"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
             |    epoch_us(o.o_orderdate) // 86400000000 AS day,
             |    count(*) AS n_orders
             |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |spine AS (
             |  SELECT nation, unnest(range(min(day), max(day) + 1)) AS day
             |  FROM daily GROUP BY nation)
             |SELECT s.nation, count(*) AS n_span,
             |  CAST(sum(CASE WHEN d.n_orders IS NOT NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_active,
             |  CAST(sum(CASE WHEN d.n_orders IS NULL THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_missing
             |FROM spine s LEFT JOIN daily d
             |  ON s.nation = d.nation AND s.day = d.day
             |GROUP BY 1""".stripMargin)),

    // CONSISTENT PSEUDONYMIZATION: customer keys replaced by a salted
    // 48-bit hash pid EVERYWHERE — the same deterministic mapping applied
    // to both customer and orders, so the FK join survives pseudonymization
    // intact (referential integrity under masking, the release-side
    // companion of the k-anonymity gate; at 100 TB use the full 128-bit
    // digest — 48 bits here keep the oracle's integer arithmetic exact).
    // Output: per pid, order count and balance — joined ON THE PSEUDONYM.
    Q("q229_pseudonymized_join",
      (s, d) => {
        def pid(c: org.apache.spark.sql.Column) =
          conv(substring(md5(concat(lit("salt1|"), c.cast("string"))),
            1, 12), 16, 10).cast("long")
        val cust = Tables.customer(s, d)
          .select(pid(col("c_custkey")).as("pid"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"))
        val ord = Tables.orders(s, d)
          .select(pid(col("o_custkey")).as("pid"))
          .groupBy(col("pid")).agg(count(lit(1)).as("n_orders"))
        cust.join(ord, Seq("pid"), "left")
          .select(col("pid"), col("bal_c"),
            coalesce(col("n_orders"), lit(0L)).as("n_orders"))
      },
      Some("""WITH cust AS (
             |  SELECT ('0x' || substr(md5('salt1|' || c_custkey::VARCHAR),
             |      1, 12))::BIGINT AS pid,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
             |  FROM customer),
             |ord AS (
             |  SELECT ('0x' || substr(md5('salt1|' || o_custkey::VARCHAR),
             |      1, 12))::BIGINT AS pid, count(*) AS n_orders
             |  FROM orders GROUP BY 1)
             |SELECT c.pid, c.bal_c, coalesce(o.n_orders, 0) AS n_orders
             |FROM cust c LEFT JOIN ord o ON c.pid = o.pid""".stripMargin)),

    // INCREMENTAL VIEW MAINTENANCE of a two-fact join view: the revenue
    // aggregate over orders ⋈ lineitem maintained through the four-term
    // delta algebra (both sides split at day 9861 ≈ 1997-01-01); the
    // oracle runs the MONOLITHIC join — equality proves the refresh path
    // loses nothing (ops/Incremental.scala).
    Q("q230_ivm_join",
      (s, d) => graft.ops.Incremental.ivmJoinRevenue(Tables.orders(s, d),
        Tables.lineitem(s, d), 9861L),
      Some(graft.ops.Incremental.ivmJoinRevenueSql)))
}
