package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 2 — the sampling/retrieval frontier:
  *
  *  - q442 PRIORITY SAMPLING (Duffield, Lund & Thorup 2007 "Priority
  *    sampling for estimation of arbitrary subset sums"): ONE global
  *    k-sample of a weighted fact stream answers any later subset-sum
  *    query with near-optimal variance — the sample an engine keeps when
  *    it cannot know the group-by in advance. Priority = w/u with u a
  *    deterministic per-key hash uniform; keep the k largest; τ = the
  *    (k+1)-th priority; every kept row estimates its weight as
  *    max(w, τ). Per-nation revenue estimates from the one sample vs
  *    exact, err_ppm per row, total gated in the spec.
  *  - q443 BM25 TOP-K RETRIEVAL (Robertson–Spärck Jones / Okapi, k1=6/5,
  *    b=3/4): the full scoring formula with the tf-saturation and
  *    length-normalization parts EXACT rationals (denominators cleared —
  *    k1 and b are dyadic-rational by choice) and only the per-term idf
  *    on the established floor(ln·1e4) grid (knife-edge-audited, one arg
  *    per query term). Completes the retrieval story beside q326's
  *    components and q305's evaluation harness.
  *
  * Both replay in DuckDB; both keep every window partitioned or
  * group-limit-optimized (map-side partial top-k).
  */
object Entries77 {

  /** Sample size for q442. */
  private val PriK = 64

  /** BM25 result depth per query term. (Constants live at the top of the
    * object: the Q vals below interpolate them at INITIALIZATION time,
    * and a forward reference reads the uninitialized 0 — q444's oracle
    * shipped `rank <= 0` before this was hoisted.) */
  private val BmTopK = 5

  def all: Seq[Q] = Seq(prioritySample, bm25TopK, sqlBm25, sqlSuffixStats)

  // SQL-TEXT twins of q443 and q434 over the registerTextIndexViews
  // surface (the q422/q430 discipline extended to the new families): the
  // views are unevaluated plans, so the SQL consumer compiles to the
  // IDENTICAL physical plan — census-pinned, oracle IDENTICAL to the
  // DataFrame sibling's, and Batch77Spec matches the outputs row-for-row.
  private val sqlBm25: Q =
    Q("q444_sql_bm25",
      (s, d) => {
        graft.ext.SqlSurface.registerTextIndexViews(s, Tables.documents(s, d))
        s.sql(s"""SELECT term, rank, doc_id, tf, dl, df, idf_q, score_milli
                 |FROM (SELECT *, CAST(row_number() OVER (PARTITION BY term
                 |    ORDER BY score_milli DESC, doc_id ASC) AS BIGINT)
                 |    AS rank
                 |  FROM graft_bm25_postings)
                 |WHERE rank <= $BmTopK""".stripMargin)
      },
      Some(bm25OracleSql))

  private val sqlSuffixStats: Q =
    Q("q445_sql_suffix_stats",
      (s, d) => {
        graft.ext.SqlSurface.registerTextIndexViews(s, Tables.documents(s, d))
        s.sql("""SELECT doc_id, count(*) AS len, max(r) AS n_ranks,
                |  max(CASE WHEN r = 1 THEN pos END) AS first_sfx_pos,
                |  sum(CAST(conv(substring(md5(concat(CAST(pos AS STRING),
                |    ':', CAST(r AS STRING))), 1, 12), 16, 10) AS BIGINT))
                |    AS sa_hash
                |FROM graft_suffix_ranks GROUP BY doc_id""".stripMargin)
      },
      Some(Entries76.saStatsOracleSql))


  // PRIORITY SAMPLING — the u ~ U(0,1) draw is the deterministic odd-grid
  // hash the suite uses for every "random" draw (DSIR q421): u_grid =
  // 2·(contentId(orderkey) mod 10^6) + 1, representing u = u_grid/(2·10^6)
  // ∈ (0,1); priority q = w/u = w·2·10^6/u_grid, floored to an integer —
  // ties on the floor grid break on (q, orderkey), so the sample is a
  // pure function of the data (ParallelismInvarianceSpec executes that).
  // The top-(k+1) is a GLOBAL row_number ≤ k+1, which Spark compiles to a
  // WindowGroupLimit — each input partition forwards at most k+1 rows
  // (the q427 map-side partial top-k shape, fine at any scale). The
  // estimator: ŵ_i = max(w_i, τ) for the k kept rows, τ = the (k+1)-th
  // priority — unbiased for any subset sum (DLT 2007 Thm 1; the floor
  // grid perturbs u by ≤ 5e-7 relative, documented, replayed by the
  // oracle exactly).
  private val prioritySample: Q =
    Q("q442_priority_sample",
      (s, d) => {
        // one column-pruned pass each: ord feeds the priority ranking AND
        // the exact baseline; geo feeds both rollups (the q438 discipline)
        val ord = Tables.orders(s, d).select(col("o_orderkey"),
          col("o_custkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val geo = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey"))
          .join(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name")),
            col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("n_name"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ranked = ord
          .withColumn("ug",
            (graft.ext.Dedup.contentId(col("o_orderkey").cast("string"))
              % 1000000L) * 2L + 1L)
          .withColumn("pq", expr(
            "CAST(CAST(w AS DECIMAL(38,0)) * 2000000 DIV ug AS BIGINT)"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("pq").desc, col("o_orderkey").asc)))
          .filter(col("rn") <= PriK + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tau = ranked.agg(
          coalesce(max(when(col("rn") === PriK + 1, col("pq"))), lit(0L))
            .as("tau"))
        val est = ranked.filter(col("rn") <= PriK)
          .crossJoin(broadcast(tau))
          .withColumn("w_hat", greatest(col("w"), col("tau")))
          .join(geo, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_sampled"),
            sum(col("w_hat")).as("est_cents"))
        val exact = ord.join(geo, col("o_custkey") === col("c_custkey"))
          .groupBy(col("n_name"))
          .agg(sum(col("w")).as("exact_cents"))
        exact.join(est, Seq("n_name"), "left")
          .selectExpr("n_name",
            "coalesce(n_sampled, 0L) AS n_sampled",
            "coalesce(est_cents, 0L) AS est_cents",
            "exact_cents",
            "abs(coalesce(est_cents, 0L) - exact_cents) * 1000000 " +
              "DIV exact_cents AS err_ppm")
      },
      Some(s"""WITH ord AS (
              |  SELECT o_orderkey, o_custkey,
              |    CAST(round(o_totalprice * 100) AS BIGINT) AS w
              |  FROM orders),
              |geo AS (
              |  SELECT c_custkey, n_name FROM customer
              |  JOIN nation ON c_nationkey = n_nationkey),
              |pr AS (
              |  SELECT o_orderkey, o_custkey, w,
              |    CAST(CAST(w AS HUGEINT) * 2000000 // ug AS BIGINT) AS pq
              |  FROM (SELECT *,
              |    (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
              |      ::BIGINT % 1000000) * 2 + 1 AS ug FROM ord)),
              |ranked AS (
              |  SELECT o_orderkey, o_custkey, w, pq,
              |    row_number() OVER (ORDER BY pq DESC, o_orderkey ASC) AS rn
              |  FROM pr),
              |tau AS (
              |  SELECT coalesce(max(CASE WHEN rn = ${PriK + 1} THEN pq END),
              |    0) AS tau
              |  FROM ranked WHERE rn <= ${PriK + 1}),
              |est AS (
              |  SELECT g.n_name, CAST(count(*) AS BIGINT) AS n_sampled,
              |    CAST(sum(greatest(r.w, t.tau)) AS BIGINT) AS est_cents
              |  FROM ranked r CROSS JOIN tau t
              |  JOIN geo g ON r.o_custkey = g.c_custkey
              |  WHERE r.rn <= $PriK
              |  GROUP BY g.n_name),
              |exact AS (
              |  SELECT g.n_name, CAST(sum(o.w) AS BIGINT) AS exact_cents
              |  FROM ord o JOIN geo g ON o.o_custkey = g.c_custkey
              |  GROUP BY g.n_name)
              |SELECT x.n_name,
              |  coalesce(e.n_sampled, 0) AS n_sampled,
              |  coalesce(e.est_cents, 0) AS est_cents,
              |  x.exact_cents,
              |  abs(coalesce(e.est_cents, 0) - x.exact_cents) * 1000000
              |    // x.exact_cents AS err_ppm
              |FROM exact x LEFT JOIN est e ON x.n_name = e.n_name"""
        .stripMargin))


  // BM25 TOP-K — Okapi BM25 with k1 = 6/5 and b = 3/4 CHOSEN dyadic-
  // rational so the tf-saturation and length-normalization parts clear
  // their denominators exactly:
  //   tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
  //     = 44·tf·L / (20·tf·L + 6·L + 18·dl·N)      with avgdl = L/N.
  // Only the per-term idf touches a transcendental — the established
  // floor(ln·1e4) grid, with the LUCENE idf form
  // ln(1 + (N−df+0.5)/(df+0.5)) = ln((2N+2)/(2df+1)) — an EXACT rational
  // argument (no float addition) that is ALWAYS > 1, so idf > 0 for every
  // term (the classic Robertson form goes negative at df > N/2, which the
  // synthetic fixture's 31-term, 75–83%-df vocabulary would hit on all
  // but one term — and a negative operand would split Spark's
  // truncate-DIV from DuckDB's floor-//). Knife-edge-audited in
  // KnifeEdgeSpec, one arg per query term. Query terms: the 10 highest-df
  // terms (df DESC, term ASC).
  // Scale shape: ONE persisted token explode feeds dl, df and tf; the
  // query-term relation is 10 rows broadcast; per-term top-5 is a
  // term-partitioned window over candidate postings.
  private val bm25TopK: Q =
    Q("q443_bm25_topk",
      (s, d) => {
        graft.ext.TextAnalysis.bm25Postings(Tables.documents(s, d), 10)
          .withColumn("rank", row_number().over(
            Window.partitionBy(col("term"))
              .orderBy(col("score_milli").desc, col("doc_id").asc))
            .cast("long"))
          .filter(col("rank") <= BmTopK)
          .select(col("term"), col("rank"), col("doc_id"), col("tf"),
            col("dl"), col("df"), col("idf_q"), col("score_milli"))
      },
      Some(bm25OracleSql))

  /** The q443 oracle, shared with its SQL-text twin q444 (identical
    * semantics — the view is an unevaluated plan, so the SQL consumer must
    * reproduce the DataFrame pipeline bit-for-bit). A def, not a val:
    * the Q vals above initialize first, and a forward val reference would
    * silently capture null into Some(...). */
  private[graft] def bm25OracleSql: String =
    s"""WITH toks AS (
              |  SELECT doc_id, unnest(string_split(text, ' ')) AS term
              |  FROM documents),
              |dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl
              |       FROM toks GROUP BY 1),
              |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(sum(dl) AS BIGINT) AS l_tot FROM dl),
              |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM (
              |    SELECT DISTINCT doc_id, term FROM toks) GROUP BY 1),
              |qterms AS (
              |  SELECT term, df, n_docs, l_tot,
              |    CAST(floor(ln(CAST(n_docs * 2 + 2 AS DOUBLE) /
              |      CAST(df * 2 + 1 AS DOUBLE)) * 1e4) AS BIGINT) AS idf_q
              |  FROM dft CROSS JOIN stats
              |  ORDER BY df DESC, term ASC LIMIT 10),
              |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
              |       FROM toks GROUP BY 1, 2),
              |scored AS (
              |  SELECT t.term, t.doc_id, t.tf, d.dl, q.df, q.idf_q,
              |    CAST(CAST(q.idf_q AS HUGEINT) * 44 * t.tf * q.l_tot * 1000
              |      // ((CAST(20 AS HUGEINT) * t.tf * q.l_tot + 6 * q.l_tot +
              |      18 * d.dl * q.n_docs) * 10000) AS BIGINT) AS score_milli
              |  FROM tf t JOIN qterms q ON t.term = q.term
              |  JOIN dl d ON t.doc_id = d.doc_id)
              |SELECT term, rank, doc_id, tf, dl, df, idf_q, score_milli
              |FROM (SELECT *, row_number() OVER (PARTITION BY term
              |    ORDER BY score_milli DESC, doc_id ASC) AS rank
              |  FROM scored)
              |WHERE rank <= $BmTopK""".stripMargin
}
