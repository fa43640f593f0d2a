package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q
import graft.ext.TextAnalysis

/** Round-7 batch 29: language-ID confusion matrix, per-key out-of-order
  * lateness census.
  */
object Entries50 {

  val all: Seq[Q] = Seq(

    // LID CONFUSION MATRIX: the q32 trigram language identifier evaluated
    // against the declared lang label as (declared, guessed, count) cells —
    // the report that says WHICH languages the heuristic confuses, not
    // just how often it's right.
    Q("q291_langid_confusion",
      (s, d) => TextAnalysis.langId(Tables.documents(s, d))
        .groupBy(col("lang"), col("guess"))
        .agg(count(lit(1)).as("n_docs")),
      Some("""WITH tri AS (
             |  SELECT DISTINCT doc_id, lang,
             |    CAST(ord(substr(text, CAST(i AS INT), 1)) * 65536
             |       + ord(substr(text, CAST(i AS INT) + 1, 1)) * 256
             |       + ord(substr(text, CAST(i AS INT) + 2, 1)) AS BIGINT)
             |      AS tg
             |  FROM documents, (SELECT unnest(range(1, 2000)) AS i) t
             |  WHERE len(text) >= 3 AND i <= len(text) - 2),
             |dict AS (
             |  SELECT tg, lang AS tg_lang FROM (
             |    SELECT tg, lang, row_number() OVER (PARTITION BY tg
             |      ORDER BY count(*) DESC, lang ASC) AS rn
             |    FROM tri GROUP BY tg, lang)
             |  WHERE rn = 1),
             |voted AS (
             |  SELECT doc_id, lang, tg_lang AS guess FROM (
             |    SELECT t.doc_id, t.lang, d.tg_lang,
             |      row_number() OVER (PARTITION BY t.doc_id
             |        ORDER BY count(*) DESC, d.tg_lang ASC) AS rn
             |    FROM tri t JOIN dict d USING (tg)
             |    GROUP BY t.doc_id, t.lang, d.tg_lang)
             |  WHERE rn = 1)
             |SELECT lang, guess, count(*) AS n_docs
             |FROM voted GROUP BY 1, 2""".stripMargin)),

    // OUT-OF-ORDER LATENESS census per event type: per-user running-max
    // event time vs each event in arrival (event_id) order — the exact
    // numbers that size a streaming watermark delay.
    Q("q292_lateness_census",
      (s, d) => graft.ops.Sessions.latenessCensus(Tables.events(s, d)),
      Some("""WITH l AS (
             |  SELECT event_type,
             |    greatest(coalesce(
             |      max(epoch_us(ts)) OVER (PARTITION BY user_id
             |        ORDER BY event_id
             |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      - epoch_us(ts), 0), 0) AS late_us
             |  FROM events)
             |SELECT event_type, count(*) AS n_events,
             |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_late,
             |  CAST(max(late_us) AS BIGINT) AS max_late_us,
             |  CAST(sum(late_us) AS BIGINT) AS sum_late_us
             |FROM l GROUP BY 1""".stripMargin)))
}
