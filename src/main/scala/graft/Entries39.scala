package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 18: price dispersion, split-leakage audit. */
object Entries39 {

  val all: Seq[Q] = Seq(

    // PRICE DISPERSION per part: how many distinct effective unit prices
    // did a part sell at, and how wide is the band? Unit price is the
    // exact integer division price_c·100 DIV qty_c (cents per unit;
    // qty carried as centi-units) — deterministic in both engines, no
    // float ratio. The pricing-consistency screen over the fact table;
    // one partial-aggregable pass.
    Q("q267_price_dispersion",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_partkey"),
          expr("""CAST(round(l_extendedprice * 100) AS BIGINT) * 100
                  DIV CAST(round(l_quantity * 100) AS BIGINT)""")
            .as("unit_c"))
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n_lines"),
          countDistinct(col("unit_c")).as("n_prices"),
          min(col("unit_c")).as("min_unit_c"),
          max(col("unit_c")).as("max_unit_c")),
      Some("""SELECT l_partkey, count(*) AS n_lines,
             |  CAST(count(DISTINCT CAST(round(l_extendedprice * 100)
             |    AS BIGINT) * 100 // CAST(round(l_quantity * 100)
             |    AS BIGINT)) AS BIGINT) AS n_prices,
             |  CAST(min(CAST(round(l_extendedprice * 100) AS BIGINT) * 100
             |    // CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             |    AS min_unit_c,
             |  CAST(max(CAST(round(l_extendedprice * 100) AS BIGINT) * 100
             |    // CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
             |    AS max_unit_c
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // SPLIT-LEAKAGE AUDIT: the q54 hash split's governance receipt as a
    // query — train/test user counts, their INTERSECTION (must be 0: the
    // split is by user, so any overlap is leakage), and each side's event
    // count, one row. The check a training-data release attaches next to
    // the purged-CV gate (q182).
    Q("q268_split_audit",
      (s, d) => {
        val tagged = Tables.events(s, d)
          .select(col("user_id"), col("event_id"))
          .withColumn("bucket",
            pmod(conv(substring(md5(concat(lit("split|"),
              col("user_id").cast("string"))), 1, 12), 16, 10).cast("long"),
              lit(10L)))
          .withColumn("split",
            when(col("bucket") < 8, "train").otherwise("test"))
          // persisted: tagged feeds the user census and the event pivot;
          // users feeds the overlap join (both sides) and the user pivot
          // — uncached, the events scan + md5 replans per consumer
          // (plan census r8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val users = tagged.select(col("user_id"), col("split")).distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val overlap = users.filter(col("split") === "train")
          .select(col("user_id"))
          .join(users.filter(col("split") === "test")
            .select(col("user_id")), Seq("user_id"))
        tagged.groupBy().pivot("split", Seq("train", "test"))
          .agg(count(lit(1)))
          .withColumnRenamed("train", "n_train_events")
          .withColumnRenamed("test", "n_test_events")
          .join(users.groupBy().pivot("split", Seq("train", "test"))
            .agg(count(lit(1)))
            .withColumnRenamed("train", "n_train_users")
            .withColumnRenamed("test", "n_test_users"))
          .join(overlap.agg(count(lit(1)).as("n_leaked_users")))
      },
      Some("""WITH tagged AS (
             |  SELECT user_id, event_id,
             |    CASE WHEN ('0x' || substr(md5('split|' ||
             |      user_id::VARCHAR), 1, 12))::BIGINT % 10 < 8
             |      THEN 'train' ELSE 'test' END AS split
             |  FROM events),
             |users AS (SELECT DISTINCT user_id, split FROM tagged)
             |SELECT
             |  (SELECT count(*) FROM tagged WHERE split = 'train')
             |    AS n_train_events,
             |  (SELECT count(*) FROM tagged WHERE split = 'test')
             |    AS n_test_events,
             |  (SELECT count(*) FROM users WHERE split = 'train')
             |    AS n_train_users,
             |  (SELECT count(*) FROM users WHERE split = 'test')
             |    AS n_test_users,
             |  (SELECT count(*) FROM users a JOIN users b
             |    ON a.user_id = b.user_id AND a.split = 'train'
             |    AND b.split = 'test') AS n_leaked_users""".stripMargin)))
}
