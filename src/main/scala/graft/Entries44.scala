package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 23: days-of-supply, new-vs-repeat revenue split. */
object Entries44 {

  val all: Seq[Q] = Seq(

    // DAYS-OF-SUPPLY per part: the closing clamped balance (q212) over
    // the average daily depletion rate, as the exact rational
    // (balance · active_days, total_sold) — "how long does current stock
    // last at the observed rate", the inventory-planning KPI that chains
    // the engine's running-balance and rate primitives with zero floats.
    Q("q276_days_of_supply",
      (s, d) => {
        val w = Window.partitionBy(col("l_partkey"))
          .orderBy(col("ts").asc, col("l_orderkey").asc,
            col("l_linenumber").asc)
        val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.lineitem(s, d)
          .select(col("l_partkey"),
            (graft.ops.Relational.epochUs(col("l_shipdate"))
              / 86400000000L).cast("long").as("ts"),
            col("l_orderkey"), col("l_linenumber"),
            when(col("l_returnflag") === "R",
              round(col("l_quantity")).cast("long"))
              .otherwise(-round(col("l_quantity")).cast("long")).as("delta"),
            when(col("l_returnflag") =!= "R",
              round(col("l_quantity")).cast("long")).otherwise(0L)
              .as("sold"))
          .withColumn("p", sum(col("delta")).over(run))
          .withColumn("s", col("p") - least(min(col("p")).over(run), lit(0L)))
          .withColumn("rn", row_number().over(w).cast("long"))
          .groupBy(col("l_partkey"))
          .agg(max_by(col("s"), col("rn")).as("closing_balance"),
            (max(col("ts")) - min(col("ts")) + 1).as("active_days"),
            sum(col("sold")).as("total_sold"))
          .select(col("l_partkey"), col("closing_balance"),
            col("total_sold"),
            (col("closing_balance") * col("active_days"))
              .as("days_supply_num"),
            col("total_sold").as("days_supply_den"))
      },
      Some("""WITH d AS (
             |  SELECT l_partkey, epoch_us(l_shipdate) // 86400000000 AS ts,
             |    l_orderkey, l_linenumber,
             |    CASE WHEN l_returnflag = 'R'
             |      THEN CAST(round(l_quantity) AS BIGINT)
             |      ELSE -CAST(round(l_quantity) AS BIGINT) END AS delta,
             |    CASE WHEN l_returnflag <> 'R'
             |      THEN CAST(round(l_quantity) AS BIGINT)
             |      ELSE 0 END AS sold
             |  FROM lineitem),
             |w1 AS (
             |  SELECT l_partkey, ts, sold,
             |    sum(delta) OVER win AS p,
             |    row_number() OVER (PARTITION BY l_partkey
             |      ORDER BY ts, l_orderkey, l_linenumber) AS rn
             |  FROM d
             |  WINDOW win AS (PARTITION BY l_partkey
             |    ORDER BY ts, l_orderkey, l_linenumber
             |    ROWS UNBOUNDED PRECEDING)),
             |w2 AS (
             |  SELECT l_partkey, ts, sold, rn,
             |    p - least(min(p) OVER (PARTITION BY l_partkey ORDER BY rn
             |      ROWS UNBOUNDED PRECEDING), 0) AS s
             |  FROM w1)
             |SELECT l_partkey,
             |  CAST(arg_max(s, rn) AS BIGINT) AS closing_balance,
             |  CAST(sum(sold) AS BIGINT) AS total_sold,
             |  CAST(arg_max(s, rn) * (max(ts) - min(ts) + 1) AS BIGINT)
             |    AS days_supply_num,
             |  CAST(sum(sold) AS BIGINT) AS days_supply_den
             |FROM w2 GROUP BY 1""".stripMargin)),

    // NEW vs REPEAT revenue per order month: each order labeled by
    // whether it is its customer's FIRST (min order day per customer —
    // one partial-aggregable reduce broadcast back); monthly revenue and
    // order counts split by the flag. The acquisition-vs-retention lens
    // every retail dashboard leads with; exact cents.
    Q("q277_new_repeat_revenue",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / 86400000000L).cast("long").as("day"))
        val firstDay = o.groupBy(col("o_custkey"))
          .agg(min(col("day")).as("first_day"))
        o.join(firstDay, Seq("o_custkey"))
          .withColumn("is_new", col("day") === col("first_day"))
          .groupBy(expr("day DIV 30").as("month30"))
          .agg(sum(when(col("is_new"), col("cents")).otherwise(0L))
            .as("new_rev_c"),
            sum(when(!col("is_new"), col("cents")).otherwise(0L))
              .as("repeat_rev_c"),
            sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"),
            sum(when(!col("is_new"), 1L).otherwise(0L)).as("n_repeat"))
      },
      Some("""WITH o AS (
             |  SELECT o_orderkey, o_custkey,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             |    epoch_us(o_orderdate) // 86400000000 AS day
             |  FROM orders),
             |fd AS (
             |  SELECT o_custkey, min(day) AS first_day FROM o GROUP BY 1)
             |SELECT o.day // 30 AS month30,
             |  CAST(sum(CASE WHEN o.day = fd.first_day THEN o.cents
             |    ELSE 0 END) AS BIGINT) AS new_rev_c,
             |  CAST(sum(CASE WHEN o.day <> fd.first_day THEN o.cents
             |    ELSE 0 END) AS BIGINT) AS repeat_rev_c,
             |  CAST(sum(CASE WHEN o.day = fd.first_day THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_new,
             |  CAST(sum(CASE WHEN o.day <> fd.first_day THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_repeat
             |FROM o JOIN fd ON o.o_custkey = fd.o_custkey
             |GROUP BY 1""".stripMargin)))
}
