package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 20: SCD2 validity lookup. */
object Entries41 {

  val all: Seq[Q] = Seq(

    // SCD2 VALIDITY LOOKUP: every click joined to the dimension version
    // valid AT ITS TIMESTAMP. The warehouse-classic form is a BETWEEN
    // theta join (valid_from ≤ ts < valid_to) — which is what the oracle
    // runs; the engine runs the equivalent BACKWARD AS-OF join against
    // version-start rows (versions partition time, so "latest
    // valid_from ≤ ts" IS the valid version) — one key shuffle, no
    // range-join explosion (the q39/q144 machinery closing the SCD2
    // loop: q148 builds the dimension, this reads it point-in-time).
    // Clicks before a user's first version carry NULLs (LEFT semantics).
    Q("q271_scd2_lookup",
      (s, d) => {
        val dim = graft.ops.History.scd2Build(
          Tables.events(s, d).filter(col("event_type") === "purchase")
            .select(col("user_id"), col("ts_us"),
              round(col("value") * 100).cast("long").as("cents")),
          "user_id", "ts_us", "cents")
          .select(col("user_id"), col("valid_from").as("ts_us"),
            col("version"), col("cents"))
        val clicks = Tables.events(s, d)
          .filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts_us"))
        graft.ops.Snapshots.asOfJoin(clicks, dim, "user_id", "ts_us",
          Seq("version", "cents"))
          .select(col("user_id"), col("event_id"), col("ts_us"),
            col("version"), col("cents"))
      },
      Some("""WITH log AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us,
             |    CAST(round(value * 100) AS BIGINT) AS cents
             |  FROM events WHERE event_type = 'purchase'),
             |chg AS (
             |  SELECT user_id, ts_us, cents FROM (
             |    SELECT *, lag(cents) OVER (PARTITION BY user_id
             |      ORDER BY ts_us) AS prev
             |    FROM log)
             |  WHERE prev IS NULL OR cents <> prev),
             |dim AS (
             |  SELECT user_id, ts_us AS valid_from,
             |    lead(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us)
             |      AS valid_to,
             |    row_number() OVER (PARTITION BY user_id ORDER BY ts_us)
             |      AS version,
             |    cents
             |  FROM chg),
             |clicks AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
             |  FROM events WHERE event_type = 'click')
             |SELECT c.user_id, c.event_id, c.ts_us,
             |  CAST(d.version AS BIGINT) AS version, d.cents
             |FROM clicks c LEFT JOIN dim d
             |  ON c.user_id = d.user_id
             |  AND d.valid_from <= c.ts_us
             |  AND (d.valid_to IS NULL OR c.ts_us < d.valid_to)""".stripMargin)))
}
