package graft

import org.apache.spark.sql.functions._
import graft.ext.TrainPrep
import graft.ops.History
import graft.ExtEntries.Q

/** Round-6 batch 7: robust time-series anomaly flags and the sampling-error
  * measurement gate.
  */
object Entries17 {

  val all: Seq[Q] = Seq(

    // Hampel filter over each nation's daily revenue: centered ±3-row
    // lower-median and MAD, outlier when |v − med| > 3·MAD — all BIGINT,
    // both engines sort the same integer lists.
    Q("q190_hampel_outliers",
      (s, d) => History.hampelOutliers(
        Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)),
            col("o_custkey") === col("c_custkey"))
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("n_name"),
            expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000")
              .as("day"),
            round(col("o_totalprice") * 100).cast("long").as("cents")),
        "n_name", "day", "cents", 3, 3L),
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
             |win AS (
             |  SELECT n_name, day, v,
             |    list_sort(list(v) OVER (PARTITION BY n_name ORDER BY day
             |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS w
             |  FROM series),
             |med AS (
             |  SELECT n_name, day, v, w,
             |    w[(len(w) + 1) // 2] AS med
             |  FROM win),
             |dev AS (
             |  SELECT n_name, day, v, med,
             |    list_sort(list_transform(w, x -> abs(x - med))) AS dw
             |  FROM med)
             |SELECT n_name, day, v, med,
             |  dw[(len(dw) + 1) // 2] AS mad,
             |  (abs(v - med) > 3 * dw[(len(dw) + 1) // 2]) AS is_outlier
             |FROM dev""".stripMargin)),

    // Horvitz–Thompson estimation gate on the largest-remainder sample
    // (budget 100): per segment, truth vs sampled vs inverse-probability
    // estimate — the measured sampling-error row.
    Q("q191_ht_estimate",
      (s, d) => TrainPrep.htEstimate(
        Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"),
            round(col("c_acctbal") * 100).cast("long").as("cents")),
        "c_mktsegment", "c_custkey", "cents", 100L),
      Some("""WITH base_t AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
             |  FROM customer),
             |n AS (SELECT count(*) AS total FROM base_t),
             |counts AS (
             |  SELECT c_mktsegment, count(*) AS n_s FROM base_t GROUP BY 1),
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
             |  SELECT c_custkey, c_mktsegment, cents,
             |    CAST(row_number() OVER (PARTITION BY c_mktsegment ORDER BY
             |      ('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 12))::BIGINT
             |      ASC) AS BIGINT) AS rn
             |  FROM base_t),
             |truth AS (
             |  SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_s,
             |    CAST(sum(cents) AS BIGINT) AS true_sum
             |  FROM base_t GROUP BY 1),
             |samp AS (
             |  SELECT r.c_mktsegment,
             |    CAST(sum(r.cents) AS BIGINT) AS sample_sum,
             |    CAST(max(q.quota) AS BIGINT) AS quota
             |  FROM ranked r JOIN quotas q ON r.c_mktsegment = q.c_mktsegment
             |  WHERE r.rn <= q.quota GROUP BY 1)
             |SELECT t.c_mktsegment, t.n_s, s.quota, t.true_sum, s.sample_sum,
             |  CAST(s.sample_sum AS DOUBLE) * t.n_s / s.quota AS ht_est
             |FROM truth t JOIN samp s ON t.c_mktsegment = s.c_mktsegment"""
        .stripMargin)))
}
