package graft

import org.apache.spark.sql.functions._
import graft.ops.{Relational, TableDiff}
import graft.ext.Curation
import graft.ExtEntries.Q

/** Round-5 batch 3: table-maintenance and release-gate operators —
  * Merkle-style bucketed version diff, interval gap analysis, k-anonymity
  * audit.
  */
object Entries10 {

  val all: Seq[Q] = Seq(

    // Merkle-style table reconciliation: bucket digests first, row drill
    // only into divergent buckets; vs the same-semantics direct diff
    // oracle. Fixture pair = orders vs its deterministic perturbation.
    Q("q162_merkle_diff",
      (s, d) => {
        val (v1, v2) = TableDiff.perturbedOrders(Tables.orders(s, d))
        TableDiff.merkleDiff(v1, v2, "o_orderkey",
          Seq("cents", "o_orderstatus"), 4096)
      },
      Some(TableDiff.merkleDiffSql(4096))),

    // Idle-gap analysis: 30-minute activity intervals per user, coalesced,
    // then the gaps between consecutive merged intervals.
    Q("q163_interval_gaps",
      (s, d) => Relational.intervalGaps(
        Tables.events(s, d).select(col("user_id"),
          col("ts_us").as("span_start"),
          (col("ts_us") + 1800000000L).as("span_end"),
          col("event_id")),
        "user_id", "span_start", "span_end", "event_id"),
      Some("""WITH iv AS (
             |  SELECT user_id, epoch_us(ts) AS s,
             |    epoch_us(ts) + 1800000000 AS e, event_id
             |  FROM events),
             |marked AS (
             |  SELECT user_id, s, e, event_id,
             |    CASE WHEN max(e) OVER (PARTITION BY user_id
             |        ORDER BY s, e, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |        IS NULL
             |      OR s > max(e) OVER (PARTITION BY user_id
             |        ORDER BY s, e, event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      THEN 1 ELSE 0 END AS new_grp
             |  FROM iv),
             |grp AS (
             |  SELECT *, sum(new_grp) OVER (PARTITION BY user_id
             |    ORDER BY s, e, event_id
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
             |  FROM marked),
             |merged AS (
             |  SELECT user_id, min(s) AS interval_start,
             |    max(e) AS interval_end
             |  FROM grp GROUP BY user_id, g),
             |nxt AS (
             |  SELECT user_id, interval_end,
             |    lead(interval_start) OVER (PARTITION BY user_id
             |      ORDER BY interval_start) AS next_start
             |  FROM merged)
             |SELECT user_id, interval_end AS gap_start,
             |  next_start AS gap_end, next_start - interval_end AS gap_us
             |FROM nxt
             |WHERE next_start IS NOT NULL
             |  AND next_start > interval_end""".stripMargin)),

    // k-anonymity release audit: quasi-identifier cells
    // (nation, segment, 50-dollar balance band) with size and suppression
    // verdict at k=5.
    Q("q164_k_anonymity",
      (s, d) => Curation.kAnonymityAudit(Tables.customer(s, d), 5L),
      Some(Curation.kAnonymityAuditSql(5L))),

    // Semi-structured analytics over the VARIANT type (Spark 4): the JSON
    // payload parses ONCE into the binary variant encoding, typed paths
    // shred out with variant_get, and the aggregation runs on the shredded
    // longs — the open-schema ingestion path (vs q45's per-access
    // get_json_object string re-parse).
    Q("q165_variant_shred",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "long").as("k"))
        .groupBy(col("event_type"), expr("k DIV 10").as("k_bucket"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("k_sum"),
          min(col("k")).as("k_min"), max(col("k")).as("k_max")),
      Some("""SELECT event_type,
             |  CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
             |    AS k_bucket,
             |  CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS BIGINT) AS k_sum,
             |  min(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS k_min,
             |  max(CAST(json_extract_string(props, '$.k') AS BIGINT))
             |    AS k_max
             |FROM events GROUP BY 1, 2""".stripMargin))
  )
}
