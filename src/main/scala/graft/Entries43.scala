package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 22: revenue waterfall, duplicate-payment screen. */
object Entries43 {

  val all: Seq[Q] = Seq(

    // REVENUE WATERFALL per ship year: gross → −discount → +tax → net,
    // every component an exact BIGINT (gross in cents, discount/tax
    // amounts in 10⁻⁴ dollars via the integer percent lanes) — the
    // finance bridge that explains WHERE the money went, reconciling by
    // construction (net = gross·100 − disc + tax). One scan-aggregate.
    Q("q274_revenue_waterfall",
      (s, d) => Tables.lineitem(s, d)
        .select(year(col("l_shipdate")).cast("long").as("y"),
          round(col("l_extendedprice") * 100).cast("long").as("price_c"),
          round(col("l_discount") * 100).cast("long").as("d_pct"),
          round(col("l_tax") * 100).cast("long").as("t_pct"))
        .groupBy(col("y"))
        .agg(sum(col("price_c")).as("gross_c"),
          sum(col("price_c") * col("d_pct")).as("discount_c100"),
          sum(col("price_c") * (lit(100L) - col("d_pct")) * col("t_pct"))
            .as("tax_c10000"),
          sum(col("price_c") * (lit(100L) - col("d_pct")))
            .as("net_before_tax_c100"),
          count(lit(1)).as("n_lines")),
      Some("""SELECT CAST(year(l_shipdate) AS BIGINT) AS y,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |    AS BIGINT) AS gross_c,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |    * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
             |    AS discount_c100,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT))
             |    * CAST(round(l_tax * 100) AS BIGINT)) AS BIGINT)
             |    AS tax_c10000,
             |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
             |    * (100 - CAST(round(l_discount * 100) AS BIGINT)))
             |    AS BIGINT) AS net_before_tax_c100,
             |  count(*) AS n_lines
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // DUPLICATE-PAYMENT SCREEN: order pairs from the same customer with
    // near-identical totals (same $1000 band) within 90 days — the classic
    // AP audit. Candidates meet on an EQUI join over (custkey, band,
    // 90-day bin) with the right side replicated to its three neighbor
    // bins (the q189 binning trick on the time axis — never a quadratic
    // per-customer blowup); the exact |Δ| ≤ 30 d predicate verifies,
    // (o1 < o2) dedups.
    Q("q275_duplicate_payments",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_orderkey"),
            expr("CAST(round(o_totalprice * 100) AS BIGINT) DIV 100000")
              .as("band"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / 86400000000L).cast("long").as("day"))
        val left = o.withColumn("bin", expr("day DIV 90"))
        val right = o
          .withColumn("b0", expr("day DIV 90"))
          .withColumn("bin", explode(array(col("b0") - 1, col("b0"),
            col("b0") + 1)))
          .select(col("o_custkey"), col("band"), col("bin"),
            col("o_orderkey").as("o2"), col("day").as("day2"))
        left.join(right, Seq("o_custkey", "band", "bin"))
          .filter(col("o_orderkey") < col("o2") &&
            abs(col("day") - col("day2")) <= 90)
          // |Δday| ≤ 90 with 90-day bins ⇒ |Δbin| ≤ 1, and the key order
          // is independent of time order, so the right side replicates to
          // all three neighbor bins; the LEFT carries only its own bin, so
          // each true pair still meets EXACTLY once — no distinct shuffle.
          .select(col("o_custkey"), col("o_orderkey"), col("o2"),
            col("band"), abs(col("day") - col("day2")).as("gap_d"))
      },
      Some("""SELECT a.o_custkey, a.o_orderkey, b.o_orderkey AS o2,
             |  CAST(round(a.o_totalprice * 100) AS BIGINT) // 100000 AS band,
             |  abs(epoch_us(a.o_orderdate) // 86400000000
             |    - epoch_us(b.o_orderdate) // 86400000000) AS gap_d
             |FROM orders a JOIN orders b
             |  ON a.o_custkey = b.o_custkey
             |  AND a.o_orderkey < b.o_orderkey
             |  AND CAST(round(a.o_totalprice * 100) AS BIGINT) // 100000
             |    = CAST(round(b.o_totalprice * 100) AS BIGINT) // 100000
             |  AND abs(epoch_us(a.o_orderdate) // 86400000000
             |    - epoch_us(b.o_orderdate) // 86400000000) <= 90""".stripMargin)))
}
