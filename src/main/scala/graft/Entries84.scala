package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 12 — query expansion closes the retrieval
  * loop:
  *
  *  - q465 RM3-STYLE PSEUDO-RELEVANCE FEEDBACK (Lavrenko & Croft 2001;
  *    the RM3 interpolation of Abdul-Jaleel et al. 2004, reduced to its
  *    integer-exact core): for each of the q443 query terms, take its
  *    BM25 top-5 feedback documents and score every OTHER term of those
  *    documents by its summed relevance-model weight — here the
  *    per-document term probability tf/dl on a fixed 1e-6 grid,
  *    w(q,e) = Σ_d ⌊tf_e(d)·10⁶ / dl(d)⌋ — then emit the top-3 expansion
  *    terms per query term. The expansion join walks ONLY the 50
  *    feedback documents' postings, never the full term-term
  *    co-occurrence matrix — the shape that survives a 100 TB corpus.
  *
  * Replays exactly in DuckDB via the shared q443 posting CTEs.
  */
object Entries84 {

  def all: Seq[Q] = Seq(rm3Expansion)

  // ---------------------------------------------------------------- q465

  private val rm3Expansion: Q =
    Q("q465_rm3_expansion",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // feedback sets: the q443 scoring, top-5 docs per query term
        val fb = graft.ext.TextAnalysis.bm25Postings(docs, 10)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("term"))
              .orderBy(col("score_milli").desc, col("doc_id").asc)))
          .filter(col("rank") <= 5)
          .select(col("term").as("qterm"), col("doc_id"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val toks = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tf = toks.groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).as("tf"))
        val dl = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
        val w = fb
          .join(tf, Seq("doc_id"))
          .filter(col("term") =!= col("qterm"))
          .join(dl, Seq("doc_id"))
          .groupBy(col("qterm"), col("term").as("exp_term"))
          .agg(sum(expr("tf * 1000000 DIV dl")).as("w_ppm"))
        w.withColumn("rank", row_number().over(
            Window.partitionBy(col("qterm"))
              .orderBy(col("w_ppm").desc, col("exp_term").asc)))
          .filter(col("rank") <= 3)
          .selectExpr("qterm", "exp_term", "w_ppm", "CAST(rank AS BIGINT)" +
            " AS rank")
      },
      Some(s"""${Entries77.bm25CtesSql},
              |fb AS (
              |  SELECT term AS qterm, doc_id FROM (
              |    SELECT term, doc_id, row_number() OVER (
              |      PARTITION BY term
              |      ORDER BY score_milli DESC, doc_id ASC) AS rank
              |    FROM scored)
              |  WHERE rank <= 5),
              |expw AS (
              |  SELECT fb.qterm, t.term AS exp_term,
              |    CAST(sum(t.tf * 1000000 // d.dl) AS BIGINT) AS w_ppm
              |  FROM fb
              |  JOIN tf t ON t.doc_id = fb.doc_id AND t.term <> fb.qterm
              |  JOIN dl d ON d.doc_id = fb.doc_id
              |  GROUP BY 1, 2)
              |SELECT qterm, exp_term, w_ppm, CAST(rank AS BIGINT) AS rank
              |FROM (
              |  SELECT *, row_number() OVER (PARTITION BY qterm
              |    ORDER BY w_ppm DESC, exp_term ASC) AS rank
              |  FROM expw)
              |WHERE rank <= 3""".stripMargin))
}
