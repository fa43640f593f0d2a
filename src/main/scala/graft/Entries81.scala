package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 9 — mergeable-summary and confidence-band
  * closures, and the graph family joins the SQL-text surface:
  *
  *  - q457 MISRA–GRIES ROLLUP (Misra & Gries 1982; mergeability per
  *    Agarwal, Cormode, Huang, Phillips, Wei & Yi 2013 §3.1):
  *    per-partition deterministic MG(k) word-frequency summaries (8
  *    doc-id groups standing in for 8 executors; words are the skewed
  *    domain the summary exists for) — counters ĉ = f − t with
  *    t = the (k+1)-th largest group frequency, so ≤ k survivors and
  *    ĉ(x) ∈ [f(x)−t, f(x)] — merged by counter addition plus one
  *    re-compression, error budget E = Σ t_group + t_merge. The
  *    heavy-hitter protocol a 1000-executor rollup actually ships
  *    (q128's exact pigeonhole needs the full data twice; this needs
  *    k rows per partition, ever). The output carries the guarantee:
  *    exact ∈ [est, est+E] for every surviving item, spec-asserted and
  *    oracle-replayed.
  *  - q458 DKW CONFIDENCE BANDS (Dvoretzky–Kiefer–Wolfowitz, Massart's
  *    constant) for the q449 quantiles: 95% distribution-free rank band
  *    r ± √(n·ln(2/α)/2), with ln(2/0.05) embedded as a BUILD-TIME
  *    integer constant (transcendental policy, escape hatch 2) and the
  *    square root via the q455 exact-isqrt trick — the whole band is
  *    integer arithmetic, and the value bounds are exact order
  *    statistics from the distributed global rank.
  *  - q459 SQL-TEXT MODULARITY over [[graft.ext.SqlSurface.registerGraphViews]]
  *    (the q444/q445 twin discipline): identical oracle to q456, the
  *    view-inlined plan census-matches the DataFrame sibling.
  */
object Entries81 {

  def all: Seq[Q] = Seq(mgRollup, dkwBand, sqlModularity)

  // ---------------------------------------------------------------- q457

  /** MG summary size (counters kept per summary). */
  private val MgK = 8

  private val mgRollup: Q =
    Q("q457_mg_rollup",
      (s, d) => {
        // the "per-executor summary" stream: 8 doc-id groups standing in
        // for 8 partitions, items = corpus words (the skewed domain a
        // heavy-hitter summary exists for — order custkeys are uniform
        // and produce an EMPTY summary at the gate SF)
        val base = Tables.documents(s, d)
          .select((col("doc_id") % 8).as("grp"),
            explode(split(col("text"), " ")).as("item"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val f = base.groupBy(col("grp"), col("item"))
          .agg(count(lit(1)).as("f"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("grp"))
              .orderBy(col("f").desc, col("item").asc)))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // t_grp = the (k+1)-th largest group frequency (0 when < k+1
        // keys): survivors have f > t, so ≤ k rows leave each group —
        // the whole point of the summary at scale
        val t = f.groupBy(col("grp"))
          .agg(coalesce(max(when(col("rn") === MgK + 1, col("f"))),
            lit(0L)).as("t"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val grouped = f.join(t, Seq("grp"))
          .filter(col("f") > col("t"))
          .select(col("grp"), col("item"), (col("f") - col("t")).as("chat"))
        val merged = grouped.groupBy(col("item"))
          .agg(sum(col("chat")).as("cm"))
        // re-compression rank runs over the merged CANDIDATE set —
        // ≤ k·n_weeks rows at any SF (domain-bounded, adjudicated)
        val ranked = merged.withColumn("rn", row_number().over(
          Window.orderBy(col("cm").desc, col("item").asc)))
        val tm = ranked.agg(coalesce(max(when(col("rn") === MgK + 1,
          col("cm"))), lit(0L)).as("tm"))
        val budget = t.agg(sum(col("t")).as("t_sum"))
          .crossJoin(broadcast(tm))
          .selectExpr("t_sum + tm AS e_budget", "tm")
        val exact = base.groupBy(col("item"))
          .agg(count(lit(1)).as("exact"))
        ranked.crossJoin(broadcast(budget))
          .filter(col("cm") > col("tm"))
          .select(col("item"), (col("cm") - col("tm")).as("est"),
            col("e_budget"))
          .join(exact, Seq("item"))
          .selectExpr("item", "est", "e_budget", "exact",
            "CAST(CASE WHEN exact >= est AND exact <= est + e_budget " +
              "THEN 1 ELSE 0 END AS BIGINT) AS within_bound")
      },
      Some(s"""WITH base AS MATERIALIZED (
              |  SELECT doc_id % 8 AS grp,
              |    unnest(string_split(text, ' ')) AS item
              |  FROM documents),
              |f AS MATERIALIZED (
              |  SELECT grp, item, CAST(count(*) AS BIGINT) AS f,
              |    row_number() OVER (PARTITION BY grp
              |      ORDER BY count(*) DESC, item ASC) AS rn
              |  FROM base GROUP BY 1, 2),
              |t AS MATERIALIZED (
              |  SELECT grp, coalesce(max(CASE WHEN rn = ${MgK + 1}
              |    THEN f END), 0) AS t
              |  FROM f GROUP BY 1),
              |grouped AS (
              |  SELECT f.grp, f.item, f.f - t.t AS chat
              |  FROM f JOIN t ON f.grp = t.grp WHERE f.f > t.t),
              |merged AS (
              |  SELECT item, CAST(sum(chat) AS BIGINT) AS cm
              |  FROM grouped GROUP BY 1),
              |ranked AS (
              |  SELECT *, row_number() OVER (ORDER BY cm DESC, item ASC)
              |      AS rn
              |  FROM merged),
              |tm AS (
              |  SELECT coalesce(max(CASE WHEN rn = ${MgK + 1} THEN cm END),
              |    0) AS tm
              |  FROM ranked),
              |budget AS (
              |  SELECT CAST(ts.t_sum + tm.tm AS BIGINT) AS e_budget, tm.tm
              |  FROM (SELECT CAST(sum(t) AS BIGINT) AS t_sum FROM t) ts
              |  CROSS JOIN tm),
              |exact AS (
              |  SELECT item, CAST(count(*) AS BIGINT) AS exact
              |  FROM base GROUP BY 1)
              |SELECT r.item, CAST(r.cm - b.tm AS BIGINT) AS est,
              |  b.e_budget, x.exact,
              |  CAST(CASE WHEN x.exact >= r.cm - b.tm AND
              |    x.exact <= r.cm - b.tm + b.e_budget THEN 1 ELSE 0 END
              |    AS BIGINT) AS within_bound
              |FROM ranked r CROSS JOIN budget b
              |JOIN exact x ON x.item = r.item
              |WHERE r.cm > b.tm""".stripMargin))

  // ---------------------------------------------------------------- q458

  /** ⌊ln(2/0.05)·10¹²⌋ = ⌊ln(40)·10¹²⌋, computed at BUILD time in this
    * JVM and embedded as the same integer literal in both engines'
    * plans (transcendental policy, escape hatch 2). ln(40) is nowhere
    * near a 1e-12 grid boundary (…794541139…), so the floor is stable
    * across faithfully-rounded libms; the value is pinned by
    * Batch81Spec against the literal 3688879454113. */
  private val LnFortyPico: Long = math.floor(math.log(40.0) * 1e12).toLong

  private val dkwBand: Q =
    Q("q458_dkw_band",
      (s, d) => {
        val base = Tables.orders(s, d).selectExpr(
            "CAST(round(o_totalprice * 100) AS BIGINT) AS v")
          .filter(col("v") >= 8L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // dr = ⌊√(⌊n·ln40·1e-12 / 2⌋)⌋ ranks = n·ε for the 95% DKW band,
        // via the q455 exact-isqrt (floor-of-floor is conservative by at
        // most one rank; decimal(38,0) keeps n·L exact at any SF)
        // 3-row relation consumed four times (three rank probes + the
        // final join) — checkpointed once, the q427 one-row discipline
        val targets = graft.Explain.localCheckpointWithProvenance(
          base.agg(count(lit(1)).as("n"))
          .withColumn("x", expr(
            s"CAST(CAST(n AS DECIMAL(38,0)) * $LnFortyPico DIV " +
              "2000000000000 AS BIGINT)"))
          .withColumn("s0",
            expr("CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)"))
          .withColumn("dr", expr(
            "CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1 " +
              "WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END"))
          .selectExpr("n", "dr", "explode(array(50L, 90L, 99L)) AS q_pct")
          .selectExpr("q_pct", "n", "dr",
            "(n * q_pct + 99) DIV 100 AS r")
          .selectExpr("q_pct", "n", "dr", "r",
            "greatest(1L, r - dr) AS r_lo",
            "least(n, r + dr) AS r_hi"))
        val ranked = graft.ops.Ranks.withGlobalRank(base.select(col("v")),
            expr("v DIV 10000"), Seq(col("v").asc), "rk", "n_all")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def at(rankCol: String, out: String) =
          broadcast(targets.select(col("q_pct"), col(rankCol)))
            .join(ranked, col("rk") === col(rankCol))
            .select(col("q_pct"), col("v").as(out))
        targets
          .join(at("r", "v_center"), Seq("q_pct"))
          .join(at("r_lo", "v_lo"), Seq("q_pct"))
          .join(at("r_hi", "v_hi"), Seq("q_pct"))
          .select(col("q_pct"), col("n"), col("dr"), col("r"),
            col("r_lo"), col("r_hi"), col("v_lo"), col("v_center"),
            col("v_hi"))
      },
      Some(s"""WITH base AS MATERIALIZED (
              |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v
              |  FROM orders
              |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 8),
              |nn AS (
              |  SELECT n, CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
              |    WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS dr
              |  FROM (
              |    SELECT n, x, CAST(floor(sqrt(CAST(x AS DOUBLE)))
              |      AS BIGINT) AS s0
              |    FROM (SELECT n, CAST(n::HUGEINT * $LnFortyPico //
              |        2000000000000 AS BIGINT) AS x
              |      FROM (SELECT CAST(count(*) AS BIGINT) AS n
              |            FROM base)))),
              |targets AS (
              |  SELECT CAST(q_pct AS BIGINT) AS q_pct, n, dr,
              |    (n * q_pct + 99) // 100 AS r,
              |    greatest(1, (n * q_pct + 99) // 100 - dr) AS r_lo,
              |    least(n, (n * q_pct + 99) // 100 + dr) AS r_hi
              |  FROM nn, (SELECT unnest([50, 90, 99]) AS q_pct)),
              |ranked AS (
              |  SELECT v, row_number() OVER (ORDER BY v ASC) AS rk
              |  FROM base)
              |SELECT t.q_pct, t.n, t.dr, t.r, t.r_lo, t.r_hi,
              |  lo.v AS v_lo, c.v AS v_center, hi.v AS v_hi
              |FROM targets t
              |JOIN ranked c ON c.rk = t.r
              |JOIN ranked lo ON lo.rk = t.r_lo
              |JOIN ranked hi ON hi.rk = t.r_hi""".stripMargin))

  // ---------------------------------------------------------------- q459

  private val sqlModularity: Q =
    Q("q459_sql_modularity",
      (s, d) => {
        graft.ext.SqlSurface.registerGraphViews(s, Tables.events(s, d))
        s.sql("""WITH mm AS (
                |  SELECT CAST(count(*) AS BIGINT) AS m
                |  FROM graft_coe_edges),
                |ei AS (
                |  SELECT l1.lbl, CAST(count(*) AS BIGINT) AS e_intra
                |  FROM graft_coe_edges e
                |  JOIN graft_lpa_labels l1 ON l1.v = e.i1
                |  JOIN graft_lpa_labels l2 ON l2.v = e.i2
                |  WHERE l1.lbl = l2.lbl
                |  GROUP BY l1.lbl),
                |dg AS (
                |  SELECT v, count(*) AS deg FROM (
                |    SELECT i1 AS v FROM graft_coe_edges
                |    UNION ALL SELECT i2 FROM graft_coe_edges)
                |  GROUP BY v),
                |dm AS (
                |  SELECT l.lbl, CAST(sum(deg) AS BIGINT) AS d_c,
                |    CAST(count(*) AS BIGINT) AS n_members
                |  FROM dg JOIN graft_lpa_labels l ON l.v = dg.v
                |  GROUP BY l.lbl)
                |SELECT dm.lbl AS community, n_members,
                |  coalesce(ei.e_intra, 0L) AS e_intra, d_c, m,
                |  4 * m * coalesce(ei.e_intra, 0L) - d_c * d_c
                |    AS contrib_num
                |FROM dm LEFT JOIN ei ON ei.lbl = dm.lbl CROSS JOIN mm"""
          .stripMargin)
      },
      // IDENTICAL oracle to the q456 DataFrame sibling — the view twin
      // must agree row-for-row (Batch81Spec also matches them directly)
      Entries80.all.find(_.name == "q456_modularity_report").get.sql)
}
