package graft

import org.apache.spark.sql.functions._
import graft.ext.{Eval, TrainPrep}
import graft.ExtEntries.Q

/** Round-6 batch 3: leakage-disciplined temporal cross-validation and
  * score-calibration measurement.
  */
object Entries13 {

  val all: Seq[Q] = Seq(

    // Purged temporal 5-fold with a 24 h embargo over the purchase stream —
    // the de Prado CV discipline: contiguous time folds, rows within the
    // embargo of the NEXT fold's start flagged (their label horizon would
    // leak the validation fold into training).
    Q("q182_purged_folds",
      (s, d) => TrainPrep.purgedTimeFolds(
        Tables.events(s, d).filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_us")),
        "ts_us", "event_id", 5, 86400000000L),
      Some("""WITH p AS (
             |  SELECT user_id, event_id, epoch_us(ts) AS ts_us
             |  FROM events WHERE event_type = 'purchase'),
             |folded AS (
             |  SELECT *, CAST(ntile(5) OVER (ORDER BY ts_us, event_id)
             |    AS BIGINT) AS fold
             |  FROM p),
             |starts AS (
             |  SELECT fold, min(ts_us) AS fold_start FROM folded GROUP BY fold),
             |nx AS (
             |  SELECT fold, lead(fold_start) OVER (ORDER BY fold) AS next_start
             |  FROM starts)
             |SELECT f.fold, f.user_id, f.event_id, f.ts_us,
             |  (nx.next_start IS NOT NULL
             |    AND nx.next_start - f.ts_us <= 86400000000) AS embargoed
             |FROM folded f JOIN nx ON f.fold = nx.fold""".stripMargin)),

    // Calibration bins (reliability diagram) of an integer score against a
    // boolean label: per decile, population, positives, exact score range,
    // and the pinned-division observed-rate / mean-score pair.
    Q("q183_calibration_bins",
      (s, d) => Eval.calibrationBins(
        Tables.customer(s, d)
          .select(col("c_custkey"),
            round(col("c_acctbal") * 100).cast("long").as("score"),
            (col("c_mktsegment") === "BUILDING").as("label")),
        "score", "label", "c_custkey", 10),
      Some("""WITH c AS (
             |  SELECT c_custkey, CAST(round(c_acctbal * 100) AS BIGINT) AS score,
             |    (c_mktsegment = 'BUILDING') AS label
             |  FROM customer),
             |b AS (
             |  SELECT *, CAST(ntile(10) OVER (ORDER BY score, c_custkey)
             |    AS BIGINT) AS bin
             |  FROM c)
             |SELECT bin, count(*) AS n,
             |  CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             |  min(score) AS score_min, max(score) AS score_max,
             |  CAST(CAST(sum(CASE WHEN label THEN 1 ELSE 0 END) AS BIGINT)
             |    AS DOUBLE) / count(*) AS pos_rate,
             |  CAST(CAST(sum(score) AS BIGINT) AS DOUBLE) / count(*)
             |    AS mean_score
             |FROM b GROUP BY bin""".stripMargin)))
}
