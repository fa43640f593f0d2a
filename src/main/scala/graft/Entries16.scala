package graft

import org.apache.spark.sql.functions._
import graft.ops.Relational
import graft.ExtEntries.Q

/** Round-6 batch 6: weighted order statistics and the interval-overlap
  * temporal join class.
  */
object Entries16 {

  private val HalfHourUs = 1800L * 1000000L

  val all: Seq[Q] = Seq(

    // Exact quantity-weighted median price per return flag — smallest value
    // with 2·W(≤v) ≥ W_total, cross-multiplied BIGINTs over the
    // distinct-value reduced series.
    Q("q188_weighted_median",
      (s, d) => Relational.weightedMedian(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          round(col("l_extendedprice") * 100).cast("long").as("cents"),
          col("l_quantity").cast("long").as("qty")),
        "l_returnflag", "cents", "qty"),
      Some("""WITH pv AS (
             |  SELECT l_returnflag,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
             |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
             |  FROM lineitem GROUP BY 1, 2),
             |c AS (
             |  SELECT l_returnflag, cents,
             |    CAST(sum(w) OVER (PARTITION BY l_returnflag ORDER BY cents
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum,
             |    CAST(sum(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
             |  FROM pv)
             |SELECT l_returnflag, min(cents) AS wmedian, max(tot) AS w_total
             |FROM c WHERE cum * 2 >= tot GROUP BY 1""".stripMargin)),

    // Keyless interval-overlap join via hour binning: 30-minute purchase
    // spans × 30-minute error spans, every truly-overlapping pair — the
    // ORACLE is the direct quadratic theta join, so the check proves the
    // binned plan finds exactly the same pairs.
    Q("q189_interval_overlap",
      (s, d) => {
        val ev = Tables.events(s, d)
        def spans(t: String) = ev.filter(col("event_type") === t)
          .select(col("user_id"), col("event_id"),
            col("ts_us").as("span_start"),
            (col("ts_us") + HalfHourUs).as("span_end"))
        Relational.binnedOverlapJoin(spans("purchase"), spans("error"),
          "span_start", "span_end", 3600L * 1000000L)
      },
      Some(s"""WITH p AS (
              |  SELECT user_id, event_id, epoch_us(ts) AS span_start,
              |    epoch_us(ts) + $HalfHourUs AS span_end
              |  FROM events WHERE event_type = 'purchase'),
              |er AS (
              |  SELECT user_id, event_id, epoch_us(ts) AS span_start,
              |    epoch_us(ts) + $HalfHourUs AS span_end
              |  FROM events WHERE event_type = 'error')
              |SELECT p.user_id AS l_user_id, p.event_id AS l_event_id,
              |  p.span_start AS l_span_start, p.span_end AS l_span_end,
              |  e.user_id AS r_user_id, e.event_id AS r_event_id,
              |  e.span_start AS r_span_start, e.span_end AS r_span_end
              |FROM p, er e
              |WHERE p.span_start <= e.span_end
              |  AND e.span_start <= p.span_end""".stripMargin)))
}
