package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 12: nested array-of-struct analytics, column-level row
  * diff, snowflake dimensional build.
  */
object Entries33 {

  val all: Seq[Q] = Seq(

    // NESTED-DATA ANALYTICS: each user's history as ONE array-of-struct
    // column, interrogated entirely with higher-order functions (filter /
    // transform / array_max over struct fields) — the denormalized
    // document-shaped path. The ORACLE computes the same answers
    // RELATIONALLY (plain aggregates over rows): two formulations, one
    // truth — nested manipulation proven against relational semantics.
    Q("q248_nested_ops",
      (s, d) => {
        val arr = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(expr("sort_array(collect_list(struct(ts_us, event_type)))")
            .as("h"))
        arr
          .withColumn("lp", expr(
            "array_max(transform(filter(h, x -> x.event_type = 'purchase'), " +
              "x -> x.ts_us))"))
          .select(col("user_id"),
            size(col("h")).cast("long").as("n_events"),
            col("lp").as("last_purchase_ts"),
            expr("CAST(size(filter(h, x -> x.event_type = 'click' AND " +
              "(lp IS NOT NULL AND x.ts_us > lp))) AS BIGINT)")
              .as("n_clicks_after_last_purchase"),
            expr("array_join(transform(slice(h, 1, 2), x -> x.event_type), ',')")
              .as("first_two_types"))
      },
      Some("""WITH lp AS (
             |  SELECT user_id, max(epoch_us(ts)) AS last_purchase_ts
             |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
             |firsts AS (
             |  SELECT user_id,
             |    array_to_string(
             |      list(event_type ORDER BY epoch_us(ts), event_type)[1:2],
             |      ',') AS first_two_types
             |  FROM events GROUP BY 1)
             |SELECT e.user_id, count(*) AS n_events,
             |  any_value(lp.last_purchase_ts) AS last_purchase_ts,
             |  CAST(sum(CASE WHEN e.event_type = 'click'
             |    AND lp.last_purchase_ts IS NOT NULL
             |    AND epoch_us(e.ts) > lp.last_purchase_ts
             |    THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_clicks_after_last_purchase,
             |  any_value(f.first_two_types) AS first_two_types
             |FROM events e
             |LEFT JOIN lp ON e.user_id = lp.user_id
             |LEFT JOIN firsts f ON e.user_id = f.user_id
             |GROUP BY e.user_id""".stripMargin)),

    // COLUMN-LEVEL ROW DIFF: v2 is v1 with deterministic simulated
    // updates (balance bump on custkey ≡ 0 mod 7, segment masked on
    // custkey ≡ 0 mod 13); the diff emits each changed key with the
    // comma-joined LIST of changed columns — the column-granular CDC
    // the full-outer diff (q67) and merkle drill (q162) stop short of.
    // One co-partitioned join, change detection row-local.
    Q("q249_row_diff_cols",
      (s, d) => {
        val v1 = Tables.customer(s, d)
          .select(col("c_custkey"),
            expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal_c"),
            col("c_mktsegment").as("seg"))
        val v2 = v1.select(col("c_custkey"),
          when(col("c_custkey") % 7 === 0, col("bal_c") + 500L)
            .otherwise(col("bal_c")).as("bal_c"),
          when(col("c_custkey") % 13 === 0, lit("MASKED"))
            .otherwise(col("seg")).as("seg"))
        v1.alias("a").join(v2.alias("b"), Seq("c_custkey"))
          .withColumn("changed_cols", concat_ws(",",
            when(col("a.bal_c") =!= col("b.bal_c"), lit("bal_c")),
            when(col("a.seg") =!= col("b.seg"), lit("seg"))))
          .filter(col("changed_cols") =!= "")
          .select(col("c_custkey"), col("changed_cols"))
      },
      Some("""WITH v1 AS (
             |  SELECT c_custkey,
             |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
             |    c_mktsegment AS seg
             |  FROM customer),
             |v2 AS (
             |  SELECT c_custkey,
             |    CASE WHEN c_custkey % 7 = 0 THEN bal_c + 500
             |      ELSE bal_c END AS bal_c,
             |    CASE WHEN c_custkey % 13 = 0 THEN 'MASKED'
             |      ELSE seg END AS seg
             |  FROM v1)
             |SELECT a.c_custkey,
             |  concat_ws(',',
             |    CASE WHEN a.bal_c <> b.bal_c THEN 'bal_c' END,
             |    CASE WHEN a.seg <> b.seg THEN 'seg' END) AS changed_cols
             |FROM v1 a JOIN v2 b ON a.c_custkey = b.c_custkey
             |WHERE a.bal_c <> b.bal_c OR a.seg <> b.seg""".stripMargin)),

    // SNOWFLAKE DIMENSIONAL BUILD: the warehouse-construction op — carve
    // customer and part dims out of the denormalized join, mint dense
    // SURROGATE keys (distributed rank: range-repartition + partitioned
    // local row_number + broadcast prefix offsets — deterministic,
    // gap-free, and NO single-partition window), rewrite the fact on
    // surrogates, then PROVE the round-trip: revenue through the
    // surrogate joins equals revenue off the original rows, in the same
    // one-row reconciliation the release manifest (q200) style demands.
    Q("q250_snowflake_build",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .join(Tables.orders(s, d).select(col("o_orderkey"),
            col("o_custkey")), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_custkey"), col("l_partkey"),
            (round(col("l_extendedprice") * 100).cast("long") *
              (lit(100L) - round(col("l_discount") * 100).cast("long")))
              .as("rev"))
          // the staging-table step: SIX consumers (two dims, fact, its
          // roundtrip re-join, truth, counts) re-planned the fact join
          // SIXTEEN times uncut (measured in the formatted plan). Lazy
          // persist (not localCheckpoint): the shared subtree is computed
          // once and reused via InMemoryRelation, but lineage is KEPT —
          // on a real cluster a lost executor recomputes the partition
          // instead of failing the job.
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // dims PERSISTED since r13: each dim is referenced three times
        // (fact build, roundtrip re-join, count), and un-cached the whole
        // distinct+global-rank machinery re-executed per reference — the
        // formatted plan showed 36 Exchanges / 56 HashAggregates for five
        // scalar outputs (plans/r13/q250_snowflake_build_before.txt).
        // Domain-bounded (distinct keys), tiny at any SF.
        val dimCust = graft.ops.Relational.surrogateKeys(
          li.select(col("o_custkey")).distinct(), "o_custkey", "cust_sk")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dimPart = graft.ops.Relational.surrogateKeys(
          li.select(col("l_partkey")).distinct(), "l_partkey", "part_sk")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val fact = li
          .join(dimCust, Seq("o_custkey")).join(dimPart, Seq("l_partkey"))
          .select(col("cust_sk"), col("part_sk"), col("rev"))
        val roundtrip = fact
          .join(dimCust, Seq("cust_sk")).join(dimPart, Seq("part_sk"))
          .agg(sum(col("rev")).as("rev_roundtrip"),
            count(lit(1)).as("n_fact"))
        val truth = li.agg(sum(col("rev")).as("rev_orig"))
        roundtrip.join(truth)
          .join(dimCust.agg(count(lit(1)).as("n_dim_customer")))
          .join(dimPart.agg(count(lit(1)).as("n_dim_part")))
          .select(col("n_fact"), col("n_dim_customer"), col("n_dim_part"),
            col("rev_orig"), col("rev_roundtrip"))
      },
      Some("""WITH li AS (
             |  SELECT o.o_custkey, l.l_partkey,
             |    CAST(round(l.l_extendedprice * 100) AS BIGINT)
             |      * (100 - CAST(round(l.l_discount * 100) AS BIGINT))
             |      AS rev
             |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
             |SELECT count(*) AS n_fact,
             |  (SELECT count(DISTINCT o_custkey) FROM li) AS n_dim_customer,
             |  (SELECT count(DISTINCT l_partkey) FROM li) AS n_dim_part,
             |  CAST(sum(rev) AS BIGINT) AS rev_orig,
             |  CAST(sum(rev) AS BIGINT) AS rev_roundtrip
             |FROM li""".stripMargin)))
}
