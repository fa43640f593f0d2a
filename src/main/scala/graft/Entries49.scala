package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q
import graft.ext.TrainPrep

/** Round-7 batch 28: exact two-sample drift tests (KS, Mann–Whitney) and
  * the deterministic epoch-shuffle shard plan.
  */
object Entries49 {

  val all: Seq[Q] = Seq(

    // Exact KS numerator per returnflag between the even/odd orderkey
    // halves (two loads standing in): max |cum1·n2 − cum2·n1| over the
    // distinct price-cents series — the continuous drift test.
    Q("q288_ks_drift",
      (s, d) => TrainPrep.ksDrift(
        Tables.lineitem(s, d).withColumn("h", col("l_orderkey") % 2),
        "l_returnflag",
        "h", expr("CAST(round(l_extendedprice * 100) AS BIGINT)")),
      Some("""WITH b AS (
             |  SELECT l_returnflag AS g, l_orderkey % 2 AS h,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS c
             |  FROM lineitem),
             |dom AS (
             |  SELECT g, c,
             |    CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cnt1,
             |    CAST(sum(CASE WHEN h <> 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cnt2
             |  FROM b GROUP BY 1, 2),
             |cum AS (
             |  SELECT g, cnt1, cnt2,
             |    sum(cnt1) OVER (PARTITION BY g ORDER BY c) AS cum1,
             |    sum(cnt2) OVER (PARTITION BY g ORDER BY c) AS cum2,
             |    sum(cnt1) OVER (PARTITION BY g) AS n1,
             |    sum(cnt2) OVER (PARTITION BY g) AS n2
             |  FROM dom)
             |SELECT g AS l_returnflag, CAST(max(n1) AS BIGINT) AS n1,
             |  CAST(max(n2) AS BIGINT) AS n2,
             |  CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num
             |FROM cum GROUP BY g""".stripMargin)),

    // Exact Mann–Whitney rank-sum per market segment between even/odd
    // custkey halves: doubled average ranks keep ties integer
    // (2·avgRank = 2p + cnt + 1), 2·U1 = 2·R1 − n1(n1+1).
    Q("q289_mann_whitney",
      (s, d) => TrainPrep.mannWhitney(
        Tables.customer(s, d).withColumn("h", col("c_custkey") % 2),
        "c_mktsegment",
        "h", expr("CAST(round(c_acctbal * 100) AS BIGINT)")),
      Some("""WITH b AS (
             |  SELECT c_mktsegment AS g, c_custkey % 2 AS h,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS c
             |  FROM customer),
             |dom AS (
             |  SELECT g, c,
             |    CAST(sum(CASE WHEN h = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cnt1,
             |    CAST(sum(CASE WHEN h <> 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS cnt2
             |  FROM b GROUP BY 1, 2),
             |pp AS (
             |  SELECT g, cnt1, cnt2, cnt1 + cnt2 AS cnt,
             |    coalesce(sum(cnt1 + cnt2) OVER (PARTITION BY g ORDER BY c
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS p
             |  FROM dom),
             |agg AS (
             |  SELECT g, CAST(sum(cnt1) AS BIGINT) AS n1,
             |    CAST(sum(cnt2) AS BIGINT) AS n2,
             |    CAST(sum(cnt1 * (p * 2 + cnt + 1)) AS BIGINT) AS r1_x2
             |  FROM pp GROUP BY g)
             |SELECT g AS c_mktsegment, n1, n2, r1_x2,
             |  r1_x2 - n1 * (n1 + 1) AS u1_x2
             |FROM agg""".stripMargin)),

    // Deterministic epoch-shuffle shard plan (2 epochs × 8 shards):
    // md5(epoch|doc_id) assigns shard AND within-shard order — the
    // shard-local permutation training loaders actually run, reproducible
    // on any engine.
    Q("q290_epoch_shuffle",
      (s, d) => TrainPrep.epochShufflePlan(Tables.documents(s, d), 2, 8),
      Some("""WITH ep AS (SELECT unnest(range(0, 2)) AS epoch),
             |h AS (
             |  SELECT d.doc_id, ep.epoch,
             |    ('0x' || substr(md5(CAST(ep.epoch AS VARCHAR) || '|' ||
             |      CAST(d.doc_id AS VARCHAR)), 1, 12))::BIGINT AS h
             |  FROM documents d, ep)
             |SELECT CAST(epoch AS BIGINT) AS epoch,
             |  CAST(h % 8 AS BIGINT) AS shard,
             |  CAST(row_number() OVER (PARTITION BY epoch, h % 8
             |    ORDER BY h, doc_id) AS BIGINT) AS pos,
             |  doc_id, h
             |FROM h""".stripMargin)))
}
