package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 24: rolling rank-in-window, Laspeyres quantity index. */
object Entries45 {

  val all: Seq[Q] = Seq(

    // ROLLING RANK: where does each day's revenue sit inside its own
    // trailing 28-observation frame? Exact integer pair (n_below, n_frame)
    // — the "is today unusually high" percentile signal the rolling bands
    // (q262) bracket, as a rank instead of fixed quantiles. The frame
    // count is a size() over the bounded collected list — O(width) state.
    Q("q278_rolling_rank",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy((graft.ops.Relational.epochUs(col("o_orderdate"))
            / 86400000000L).cast("long").as("day"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("c"))
        val w = Window.orderBy(col("day").asc).rowsBetween(-27, 0)
        daily
          .withColumn("l", collect_list(col("c")).over(w))
          .select(col("day"), col("c"),
            expr("CAST(size(filter(l, x -> x < c)) AS BIGINT)")
              .as("n_below"),
            size(col("l")).cast("long").as("n_frame"))
      },
      Some("""WITH daily AS (
             |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS c
             |  FROM orders GROUP BY 1),
             |framed AS (
             |  SELECT day, c,
             |    list(c) OVER (ORDER BY day
             |      ROWS BETWEEN 27 PRECEDING AND CURRENT ROW) AS l
             |  FROM daily)
             |SELECT day, c,
             |  CAST(len(list_filter(l, x -> x < c)) AS BIGINT) AS n_below,
             |  CAST(len(l) AS BIGINT) AS n_frame
             |FROM framed""".stripMargin)),

    // LASPEYRES-STYLE QUANTITY INDEX per ship year vs base 1996: quantity
    // growth valued at FROZEN base-year prices — Σ p₀·q_t over Σ p₀·q₀ as
    // an exact integer pair. Base price per part = the MINIMUM exact unit
    // price (price_c·100 DIV qty_c) observed in 1996 (deterministic, no
    // averaging rational); parts never sold in 1996 drop out of the
    // basket (the fixed-basket definition). The price-index economics of
    // "did we sell more stuff, not just pricier stuff".
    Q("q279_laspeyres",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"),
            year(col("l_shipdate")).cast("long").as("y"),
            round(col("l_quantity")).cast("long").as("qty"),
            expr("""CAST(round(l_extendedprice * 100) AS BIGINT) * 100
                    DIV CAST(round(l_quantity * 100) AS BIGINT)""")
              .as("unit_c"))
        // base-year filter on the RAW date column (not year(...)) so the
        // range reaches PushedFilters and parquet row groups outside 1996
        // are min/max-pruned; base is consumed twice (per-part join +
        // denominator reduce) — materialize it ONCE (shared-subtree
        // discipline), cutting the plan from 3 lineitem scans to 2.
        val base = Tables.lineitem(s, d)
          .filter(col("l_shipdate").between("1996-01-01", "1996-12-31"))
          .select(col("l_partkey"),
            round(col("l_quantity")).cast("long").as("qty"),
            expr("""CAST(round(l_extendedprice * 100) AS BIGINT) * 100
                    DIV CAST(round(l_quantity * 100) AS BIGINT)""")
              .as("unit_c"))
          .groupBy(col("l_partkey"))
          .agg(min(col("unit_c")).as("p0"),
            sum(col("qty")).as("q0"))
          // lazy persist, not localCheckpoint: same once-computed sharing
          // across the two consumers, but lineage is kept so a lost
          // executor recomputes instead of killing the job.
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        li.join(base, Seq("l_partkey"))
          .groupBy(col("y"))
          .agg(sum(col("p0") * col("qty")).as("index_num_c"),
            count(lit(1)).as("n_lines"))
          .join(base.agg(sum(col("p0") * col("q0")).as("index_den_c")))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, CAST(year(l_shipdate) AS BIGINT) AS y,
             |    CAST(round(l_quantity) AS BIGINT) AS qty,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) * 100
             |      // CAST(round(l_quantity * 100) AS BIGINT) AS unit_c
             |  FROM lineitem),
             |base AS (
             |  SELECT l_partkey, min(unit_c) AS p0, sum(qty) AS q0
             |  FROM li WHERE y = 1996 GROUP BY 1),
             |den AS (
             |  SELECT CAST(sum(p0 * q0) AS BIGINT) AS index_den_c FROM base)
             |SELECT li.y,
             |  CAST(sum(base.p0 * li.qty) AS BIGINT) AS index_num_c,
             |  count(*) AS n_lines,
             |  (SELECT index_den_c FROM den) AS index_den_c
             |FROM li JOIN base ON li.l_partkey = base.l_partkey
             |GROUP BY 1""".stripMargin)))
}
