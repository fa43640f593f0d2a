package graft

import org.apache.spark.sql.functions._
import graft.ext.TrainPrep
import graft.ExtEntries.Q

/** Round-6 batch 4: cross-cohort score alignment and reproducible negative
  * sampling.
  */
object Entries14 {

  val all: Seq[Q] = Seq(

    // Quantile normalization: every segment's balance distribution mapped
    // onto the GLOBAL distribution by integer rank arithmetic — the
    // batch-effect correction / cross-cohort score alignment step.
    Q("q184_quantile_normalize",
      (s, d) => TrainPrep.quantileNormalize(
        Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
          round(col("c_acctbal") * 100).cast("long").as("score")),
        "c_mktsegment", "c_custkey", "score"),
      Some("""WITH c AS (
             |  SELECT c_custkey, c_mktsegment,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS score
             |  FROM customer),
             |r AS (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY c_mktsegment
             |      ORDER BY score, c_custkey) AS BIGINT) AS rn,
             |    count(*) OVER (PARTITION BY c_mktsegment) AS ng
             |  FROM c),
             |g AS (
             |  SELECT CAST(row_number() OVER (ORDER BY score, c_custkey)
             |    AS BIGINT) AS idx, score AS norm_score
             |  FROM c),
             |t AS (
             |  SELECT c_custkey, c_mktsegment, score,
             |    CASE WHEN ng = 1
             |      THEN ((SELECT count(*) FROM c) + 1) // 2
             |      ELSE ((rn - 1) * ((SELECT count(*) FROM c) - 1)) // (ng - 1) + 1
             |    END AS idx
             |  FROM r)
             |SELECT t.c_custkey, t.c_mktsegment, t.score, g.norm_score
             |FROM t JOIN g ON t.idx = g.idx""".stripMargin)),

    // Deterministic hash negative sampling: per user (first 50), the 5
    // non-purchased parts with smallest md5(uid|item) — reproducible
    // uniform negatives, positives excluded exactly.
    Q("q185_negative_sample",
      (s, d) => TrainPrep.negativeSample(
        Tables.customer(s, d).filter(col("c_custkey") <= 50)
          .select(col("c_custkey").as("uid")),
        "uid",
        Tables.part(s, d).select(col("p_partkey").as("item")),
        "item",
        Tables.orders(s, d)
          .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("uid"), col("l_partkey").as("item")),
        5),
      Some("""WITH u AS (SELECT c_custkey AS uid FROM customer
             |          WHERE c_custkey <= 50),
             |it AS (SELECT p_partkey AS item FROM part),
             |pos AS (SELECT o_custkey AS uid, l_partkey AS item
             |        FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
             |sc AS (
             |  SELECT u.uid, it.item,
             |    ('0x' || substr(md5(CAST(u.uid AS VARCHAR) || '|' ||
             |      CAST(it.item AS VARCHAR)), 1, 12))::BIGINT AS h
             |  FROM u, it
             |  WHERE NOT EXISTS (SELECT 1 FROM pos p
             |    WHERE p.uid = u.uid AND p.item = it.item))
             |SELECT uid, item, h, neg_rank FROM (
             |  SELECT *, CAST(row_number() OVER (PARTITION BY uid
             |    ORDER BY h) AS BIGINT) AS neg_rank
             |  FROM sc)
             |WHERE neg_rank <= 5""".stripMargin)))
}
