package graft

import org.apache.spark.sql.functions._
import graft.ext.TrainPrep
import graft.ops.History
import graft.ExtEntries.Q

/** Round-6 batch 5: exact-budget sampling design and change-point
  * detection.
  */
object Entries15 {

  val all: Seq[Q] = Seq(

    // Largest-remainder proportional allocation of a 100-row budget across
    // market segments + deterministic hash draw — the allocation sums to
    // the budget EXACTLY (floor-only undershoots, rounding overshoots).
    Q("q186_proportional_sample",
      (s, d) => TrainPrep.proportionalAllocate(
        Tables.customer(s, d), "c_mktsegment", "c_custkey", 100L),
      Some("""WITH n AS (SELECT count(*) AS total FROM customer),
             |counts AS (
             |  SELECT c_mktsegment, count(*) AS n_s FROM customer GROUP BY 1),
             |base AS (
             |  SELECT c_mktsegment, n_s,
             |    (100 * n_s) // (SELECT total FROM n) AS floor_q,
             |    (100 * n_s) % (SELECT total FROM n) AS rem
             |  FROM counts),
             |needed AS (
             |  SELECT 100 - CAST(sum(floor_q) AS BIGINT) AS k FROM base),
             |quotas AS (
             |  SELECT c_mktsegment,
             |    floor_q + CASE WHEN row_number() OVER (ORDER BY rem DESC,
             |      c_mktsegment ASC) <= (SELECT k FROM needed)
             |      THEN 1 ELSE 0 END AS quota
             |  FROM base),
             |ranked AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY
             |      ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
             |      ASC) AS BIGINT) AS rn
             |  FROM customer)
             |SELECT r.c_custkey, r.c_mktsegment, q.quota
             |FROM ranked r JOIN quotas q ON r.c_mktsegment = q.c_mktsegment
             |WHERE r.rn <= q.quota""".stripMargin)),

    // CUSUM change-point per nation over the daily revenue series: the
    // epoch-day maximizing |n·S_i − i·S_n| (integer cross-multiplied, no
    // division), ties → earliest day.
    Q("q187_changepoint",
      (s, d) => History.cusumChangepoint(
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
              .as("day"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        "n_name", "day", "cents"),
      Some("""WITH f AS (
             |  SELECT n_name,
             |    epoch_us(o_orderdate) // 86400000000 AS day,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
             |  FROM orders
             |  JOIN customer ON o_custkey = c_custkey
             |  JOIN nation ON c_nationkey = n_nationkey),
             |series AS (
             |  SELECT n_name, day, CAST(sum(cents) AS BIGINT) AS v
             |  FROM f GROUP BY 1, 2),
             |c AS (
             |  SELECT n_name, day, v,
             |    CAST(sum(v) OVER (PARTITION BY n_name ORDER BY day
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS s,
             |    CAST(row_number() OVER (PARTITION BY n_name ORDER BY day)
             |      AS BIGINT) AS i,
             |    CAST(sum(v) OVER (PARTITION BY n_name) AS BIGINT) AS tot,
             |    CAST(count(*) OVER (PARTITION BY n_name) AS BIGINT) AS n
             |  FROM series),
             |d AS (
             |  SELECT n_name, day, n, tot, n * s - i * tot AS dd FROM c)
             |SELECT n_name, n AS n_buckets, day AS cp_bucket, dd AS cusum,
             |  tot AS total
             |FROM (SELECT *, row_number() OVER (PARTITION BY n_name
             |    ORDER BY abs(dd) DESC, day ASC) AS rn FROM d)
             |WHERE rn = 1""".stripMargin)))
}
