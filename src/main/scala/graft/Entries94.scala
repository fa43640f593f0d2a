package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-13 batch 10 — subset-sum from one sample, Zipf census, and
  * revenue concentration (integer arithmetic only, exact DuckDB oracle
  * mirrors):
  *
  *  - q494 PRIORITY-SAMPLE SUBSET SUMS (Duffield–Lund–Thorup 2007, Thm
  *    2 — the paper's HEADLINE property, completing q442/q493: ONE
  *    stored k=64 sample answers ANY later subset-sum query): the
  *    global event sample is drawn once, then five different subset
  *    queries (one per event_type) are answered from the SAME kept
  *    rows — est_T = Σ_{kept ∩ T} max(w, τ) — beside each subset's
  *    exact total with per-mille error (−1 sentinel for empty-subset
  *    estimates, the q448 convention). At 100 TB the sample is the
  *    artifact you store; the subsets arrive later.
  *
  *  - q495 ZIPF RANK-FREQUENCY CENSUS (Zipf 1949): the word table with
  *    rank, frequency, the rank·freq product (constant under an exact
  *    Zipf law — the diagnostic column) and the cumulative corpus share
  *    in ppm. The rank rides the word-TYPE domain (31 types — bounded),
  *    so the one unpartitioned window is domain-bounded by vocabulary,
  *    not corpus size.
  *
  *  - q496 GINI CONCENTRATION per nation (Gini 1912, the closed rank
  *    form): customer order-revenue inequality, G = (2Σi·x_i −
  *    (n+1)Σx)/(nΣx) on ascending (x, custkey) ranks — the numerator is
  *    provably non-negative for ascending ranks, so the one ppm floor
  *    divides non-negative BIGINTs. Ranks are nation-partitioned
  *    windows; the training-mix analogue (which sources dominate a
  *    bucket) is the 100 TB reading.
  *
  * Reference anchor: no sampling/corpus-statistics surface in the
  * 775-LoC pandas reference (SURVEY.md §0); these extend the sampling,
  * text-analysis and quality-audit families.
  */
object Entries94 {

  def all: Seq[Q] = Seq(prioritySubsets, zipfCensus, giniNations)

  private val K = 64

  // ---------------------------------------------------------------- q494

  private val prioritySubsets: Q =
    Q("q494_priority_subsets",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), col("event_type"),
            expr("CAST(round(coalesce(value, 0.0) * 100) AS BIGINT)")
              .as("w"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rk = ev
          .withColumn("ug",
            (graft.ext.Dedup.contentId(col("event_id").cast("string"))
              % 1000000L) * 2L + 1L)
          .withColumn("pq", expr(
            "CAST(CAST(w AS DECIMAL(38,0)) * 2000000 DIV ug AS BIGINT)"))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("pq").desc, col("event_id").asc)))
          .filter(col("rn") <= K + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tau = rk.agg(
          coalesce(max(when(col("rn") === K + 1, col("pq"))), lit(0L))
            .as("tau"))
        val est = rk.filter(col("rn") <= K)
          .crossJoin(broadcast(tau))
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_kept"),
            sum(greatest(col("w"), col("tau"))).as("est_cents"))
          .select(col("event_type").as("et"), col("n_kept"),
            col("est_cents"))
        val exact = ev.groupBy(col("event_type"))
          .agg(sum(col("w")).as("exact_cents"))
        exact.join(est, col("event_type") === col("et"), "left_outer")
          .select(col("event_type"),
            coalesce(col("n_kept"), lit(0L)).as("n_kept"),
            coalesce(col("est_cents"), lit(0L)).as("est_cents"),
            col("exact_cents"),
            expr("CASE WHEN exact_cents = 0 THEN -1L ELSE" +
              " abs(coalesce(est_cents, 0L) - exact_cents) * 1000" +
              " DIV exact_cents END").as("err_pm"))
      },
      Some(s"""WITH ev AS (
              |  SELECT event_id, event_type,
              |    CAST(round(coalesce(value, 0) * 100) AS BIGINT) AS w
              |  FROM events),
              |rk AS (
              |  SELECT event_type, w,
              |    row_number() OVER (ORDER BY
              |      CAST(CAST(w AS HUGEINT) * 2000000
              |        // (('0x' || substr(md5(CAST(event_id AS VARCHAR)),
              |          1, 12))::BIGINT % 1000000 * 2 + 1) AS BIGINT)
              |      DESC, event_id) AS rn,
              |    CAST(CAST(w AS HUGEINT) * 2000000
              |      // (('0x' || substr(md5(CAST(event_id AS VARCHAR)),
              |        1, 12))::BIGINT % 1000000 * 2 + 1) AS BIGINT)
              |      AS pq
              |  FROM ev),
              |tau AS (SELECT coalesce(max(CASE WHEN rn = ${K + 1}
              |          THEN pq END), 0) AS tau
              |        FROM rk WHERE rn <= ${K + 1}),
              |est AS (
              |  SELECT event_type AS et, CAST(count(*) AS BIGINT)
              |      AS n_kept,
              |    CAST(sum(CASE WHEN w > tau THEN w ELSE tau END)
              |      AS BIGINT) AS est_cents
              |  FROM rk CROSS JOIN tau WHERE rn <= $K
              |  GROUP BY event_type),
              |ex AS (SELECT event_type,
              |         CAST(sum(w) AS BIGINT) AS exact_cents
              |       FROM ev GROUP BY event_type)
              |SELECT ex.event_type AS event_type,
              |  coalesce(n_kept, 0) AS n_kept,
              |  coalesce(est_cents, 0) AS est_cents, exact_cents,
              |  CAST(CASE WHEN exact_cents = 0 THEN -1
              |    ELSE abs(coalesce(est_cents, 0) - exact_cents) * 1000
              |      // exact_cents END AS BIGINT) AS err_pm
              |FROM ex LEFT JOIN est ON est.et = ex.event_type""".stripMargin))

  // ---------------------------------------------------------------- q495

  private val zipfCensus: Q =
    Q("q495_zipf_census",
      (s, d) => {
        val wc = Tables.documents(s, d)
          .select(explode(split(col("text"), " ")).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("freq"))
        val tot = wc.agg(sum(col("freq")).as("n"))
        val rw = Window.orderBy(col("freq").desc, col("w"))
        val cw = Window.orderBy(col("rank"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        wc.withColumn("rank", row_number().over(rw).cast("long"))
          .crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("freq")).over(cw))
          .select(col("w").as("word"), col("rank"), col("freq"),
            (col("rank") * col("freq")).as("rank_freq"),
            expr("cum * 1000000 DIV n").as("cum_share_ppm"))
      },
      Some("""WITH wc AS (
             |  SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
             |    SELECT unnest(string_split(text, ' ')) AS w
             |    FROM documents)
             |  GROUP BY w),
             |tot AS (SELECT CAST(sum(freq) AS BIGINT) AS n FROM wc),
             |rk AS (SELECT w, freq,
             |         row_number() OVER (ORDER BY freq DESC, w) AS r
             |       FROM wc)
             |SELECT w AS word, CAST(r AS BIGINT) AS rank, freq,
             |  CAST(r * freq AS BIGINT) AS rank_freq,
             |  CAST(sum(freq) OVER (ORDER BY r ROWS BETWEEN UNBOUNDED
             |    PRECEDING AND CURRENT ROW) * 1000000 // tot.n
             |    AS BIGINT) AS cum_share_ppm
             |FROM rk CROSS JOIN tot""".stripMargin))

  // ---------------------------------------------------------------- q496

  private val giniNations: Q =
    Q("q496_gini_nations",
      (s, d) => {
        val cs = Tables.customer(s, d)
          .join(Tables.orders(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nation"),
            col("c_custkey").as("ck"))
          .agg(expr("sum(CAST(round(o_totalprice * 100) AS BIGINT))")
            .as("x"))
        val rw = Window.partitionBy(col("nation"))
          .orderBy(col("x").asc, col("ck").asc)
        cs.withColumn("i", row_number().over(rw).cast("long"))
          .groupBy(col("nation"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
            sum(col("i") * col("x")).as("ix"))
          .select(col("nation"), col("n"), col("s"),
            // 2*sum(i*x) >= (n+1)*sum(x) for ascending ranks — the one
            // ppm floor divides non-negative values; the *1e6 lift
            // crosses int64 at sf0.1 (numerator ~1e14 cents), so it
            // runs in DECIMAL(38,0)/HUGEINT
            expr("CAST(CAST(2 * ix - (n + 1) * s AS DECIMAL(38,0))" +
              " * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * s)" +
              " AS BIGINT)").as("gini_ppm"))
      },
      Some("""WITH cs AS (
             |  SELECT c.c_nationkey AS nation, c.c_custkey AS ck,
             |    CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS x
             |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
             |  GROUP BY 1, 2),
             |rk AS (SELECT nation, x,
             |         row_number() OVER (PARTITION BY nation
             |           ORDER BY x, ck) AS i
             |       FROM cs),
             |g AS (SELECT nation, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(x) AS BIGINT) AS s,
             |        CAST(sum(i * x) AS BIGINT) AS ix
             |      FROM rk GROUP BY nation)
             |SELECT nation, n, s,
             |  CAST(CAST(2 * ix - (n + 1) * s AS HUGEINT) * 1000000
             |    // (CAST(n AS HUGEINT) * s) AS BIGINT) AS gini_ppm
             |FROM g""".stripMargin))
}
