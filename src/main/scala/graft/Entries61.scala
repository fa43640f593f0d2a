package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 5: one-way ANOVA (η² + F), Haar wavelet energy spectrum,
  * Wilson score intervals, Cramér's V, a dyadic-weight EWMA control chart
  * (exact in binary arithmetic), and the Page–Hinkley drift detector made
  * integer-exact by scaling through the mean's denominator.
  *
  * The Haar pyramid follows the Hilbert precedent (q338): the level
  * recursion is GENERATED once in Scala and emitted to both engines, so
  * the dyadic fold cannot drift between them.
  */
object Entries61 {

  private val HaarLevels = 12 // 2^12 = 4096 ≥ any fixture day span

  /** Haar pyramid over (t, x): per level, parent sums and detail
    * coefficients; returns one (level, n_nodes, energy) row per level.
    * Missing days act as implicit zeros (absent children of a groupBy). */
  private def haarEnergies(l0: DataFrame): DataFrame = {
    // SINGLE-PASS pyramid: by linearity, detail d(k, m) = Σ_t x_t ·
    // sign(bit k−1 of t) over t ∈ [m·2^k, (m+1)·2^k) — so each input row
    // contributes ±x to EXACTLY ONE node per level, and the whole pyramid
    // is one explode (12 (level, node, ±x) terms per row) + one groupBy,
    // not a 12-stage groupBy chain. A node exists iff some t in its span
    // exists, identical to the recursive form's support; the sums are the
    // same integers, order-free. One scan + two exchanges at ANY scale —
    // the chained form replayed its prefix per level-energy branch (12
    // chains × 12 shuffles, and 24 orders scans before l0 was cached).
    val terms = (1 to HaarLevels).map { k =>
      struct(lit(k.toLong).as("level"),
        expr(s"t DIV ${1L << k}").as("node"),
        expr(s"CASE WHEN (t DIV ${1L << (k - 1)}) % 2 = 0 THEN x ELSE -x END")
          .as("v"))
    }
    l0.select(explode(array(terms: _*)).as("e"))
      .groupBy(col("e.level").as("level"), col("e.node").as("node"))
      .agg(sum(col("e.v")).as("d"))
      .groupBy(col("level"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(col("d") * col("d")).as("energy"))
  }

  /** The identical pyramid as a generated DuckDB CTE chain; `l0` must
    * provide (t, x). */
  private def haarCte: String = {
    val lvls = (1 to HaarLevels).map { k =>
      s"""l$k AS (
         |  SELECT t // 2 AS t, CAST(sum(x) AS BIGINT) AS x,
         |    CAST(sum(CASE WHEN t % 2 = 0 THEN x ELSE -x END) AS BIGINT)
         |      AS d
         |  FROM l${k - 1} GROUP BY 1)""".stripMargin
    }
    val es = (1 to HaarLevels).map { k =>
      s"""SELECT CAST($k AS BIGINT) AS level,
         |  CAST(count(*) AS BIGINT) AS n_nodes,
         |  CAST(sum(d * d) AS BIGINT) AS energy FROM l$k""".stripMargin
    }
    lvls.mkString(",\n") + "\n" + es.mkString("\nUNION ALL\n")
  }

  /** Shared daily-revenue rollup (integer dollars, day since epoch). */
  private def dailySql: String =
    """daily AS (
      |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |      AS BIGINT) AS day,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      // 100 AS x
      |  FROM orders GROUP BY 1)""".stripMargin

  private def daily(s: org.apache.spark.sql.SparkSession, d: String) =
    Tables.orders(s, d)
      .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
        .cast("long").as("day"))
      .agg(expr("sum(CAST(round(o_totalprice * 100) AS LONG)) DIV 100")
        .as("x"))

  val all: Seq[Q] = Seq(

    // ONE-WAY ANOVA of daily revenue by day-of-week: η² (variance
    // explained) and the F statistic. Per-group contributions are
    // QUANTIZED before the cross-group sum (floats summed across groups
    // would be order-dependent); everything else is two scalar double
    // chains. The "does the calendar matter" gate feeding q256
    // (dow_profile) and q227 (seasonal naive).
    Q("q345_eta_squared",
      (s, d) => {
        val byDay = daily(s, d)
          .select((col("day") % 7).as("dow"),
            expr("x DIV 10").as("v"))
        val g = byDay.groupBy(col("dow"))
          .agg(count(lit(1)).as("n_g"), sum(col("v")).as("s_g"))
          .select(floor(col("s_g").cast("double") * col("s_g").cast("double")
            / col("n_g").cast("double") * 1e3).cast("long").as("term_q"))
          .agg(sum(col("term_q")).as("ssb_raw"), count(lit(1)).as("k"))
        val t = byDay.agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("v") * col("v")).as("ss"))
        g.crossJoin(broadcast(t))
          .select(col("k"), col("n"),
            (col("ssb_raw") - floor(col("s").cast("double") *
              col("s").cast("double") / col("n").cast("double") * 1e3)
              .cast("long")).as("ssb_q"),
            (floor(col("ss").cast("double") * 1e3) -
              floor(col("s").cast("double") * col("s").cast("double")
                / col("n").cast("double") * 1e3).cast("long")).as("sst_q"))
          .select(col("k"), col("n"), col("ssb_q"), col("sst_q"),
            // double ratio of the two quantized BIGINTs (ssb_q·1e6 would
            // overflow long); floor of identical operands is bit-stable
            floor(col("ssb_q").cast("double") / col("sst_q").cast("double")
              * 1e6).cast("long").as("eta2_ppm"),
            floor((col("ssb_q").cast("double") /
              (col("k") - 1).cast("double")) /
              ((col("sst_q") - col("ssb_q")).cast("double") /
                (col("n") - col("k")).cast("double")) * 1000)
              .cast("long").as("f_milli"))
      },
      Some(s"""WITH $dailySql,
             |b AS (SELECT day % 7 AS dow, x // 10 AS v FROM daily),
             |g AS (
             |  SELECT CAST(sum(term_q) AS BIGINT) AS ssb_raw,
             |    CAST(count(*) AS BIGINT) AS k
             |  FROM (SELECT CAST(floor(CAST(sum(v) AS DOUBLE)
             |          * CAST(sum(v) AS DOUBLE)
             |          / CAST(count(*) AS DOUBLE) * 1e3) AS BIGINT)
             |          AS term_q
             |        FROM b GROUP BY dow)),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(v) AS BIGINT) AS s,
             |        CAST(sum(v * v) AS BIGINT) AS ss FROM b),
             |w AS (
             |  SELECT k, n,
             |    ssb_raw - CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE) * 1e3) AS BIGINT) AS ssb_q,
             |    CAST(floor(CAST(ss AS DOUBLE) * 1e3) AS BIGINT)
             |      - CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |        / CAST(n AS DOUBLE) * 1e3) AS BIGINT) AS sst_q
             |  FROM g CROSS JOIN t)
             |SELECT k, n, ssb_q, sst_q,
             |  CAST(floor(CAST(ssb_q AS DOUBLE) / CAST(sst_q AS DOUBLE)
             |    * 1e6) AS BIGINT) AS eta2_ppm,
             |  CAST(floor((CAST(ssb_q AS DOUBLE) / CAST(k - 1 AS DOUBLE)) /
             |    (CAST(sst_q - ssb_q AS DOUBLE) / CAST(n - k AS DOUBLE))
             |    * 1000) AS BIGINT) AS f_milli
             |FROM w""".stripMargin)),

    // HAAR WAVELET ENERGY SPECTRUM of daily revenue: unnormalized Haar
    // (sum/difference — stays integer) folded up 12 dyadic levels, detail
    // energy per level. Level k energy concentrates fluctuations at the
    // 2^k-day scale — the multi-resolution complement to the single-lag
    // ACF (q325). Each level is one hash aggregate of the (already tiny)
    // previous level.
    Q("q346_haar_energy",
      (s, d) => {
        // persisted: the day-grain reduce feeds the min scalar, and every
        // one of the 12 per-level energy aggregates replays the pyramid
        // chain from l0 — without the cache each replay re-scans orders
        // (24 scans in the formatted plan; with it, one)
        val dd = daily(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val mn = dd.agg(min(col("day")).as("d0"))
        // kilodollar grain: top-level Haar sums approach the corpus total
        // and their SQUARES must stay under 2^63 (overflowed in dollars
        // at sf0.1)
        val l0 = dd.crossJoin(broadcast(mn))
          .select((col("day") - col("d0")).as("t"),
            expr("x DIV 1000").as("x"))
        haarEnergies(l0)
      },
      Some(s"""WITH $dailySql,
             |mn AS (SELECT min(day) AS d0 FROM daily),
             |l0 AS (SELECT day - d0 AS t, x // 1000 AS x
             |       FROM daily CROSS JOIN mn),
             |$haarCte""".stripMargin)),

    // WILSON SCORE INTERVALS for per-cohort purchase conversion — the
    // analytic CI companion to the bootstrap (q296) and conformal (q311)
    // intervals: never escapes [0,1], behaves at small n. (k, n) are
    // integers; the bound is one constant-z double chain.
    Q("q347_wilson_bounds",
      (s, d) => {
        val ev = Tables.events(s, d)
        val users = ev.groupBy(col("user_id"))
          .agg(expr("min(ts_us) DIV 604800000000L").as("cw"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("conv"))
        val cohorts = users.groupBy(col("cw"))
          .agg(count(lit(1)).as("n"), sum(col("conv")).as("k"))
        val nD = col("n").cast("double")
        val p = col("k").cast("double") / nD
        val z2 = lit(3.8416)
        val denom = lit(1.0) + z2 / nD
        val center = p + z2 / (lit(2.0) * nD)
        val rad = sqrt(z2) * sqrt(p * (lit(1.0) - p) / nD +
          z2 / (lit(4.0) * nD * nD))
        cohorts.select(col("cw").as("cohort_week"), col("n"), col("k"),
          floor((center - rad) / denom * 1e6).cast("long").as("lo_ppm"),
          floor((center + rad) / denom * 1e6).cast("long").as("hi_ppm"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    min(epoch_us(ts)) // 604800000000 AS cw,
             |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1
             |             ELSE 0 END) AS BIGINT) AS conv
             |  FROM events GROUP BY 1),
             |c AS (SELECT cw, CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(conv) AS BIGINT) AS k
             |      FROM u GROUP BY 1)
             |SELECT cw AS cohort_week, n, k,
             |  CAST(floor(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             |      + 3.8416 / (2.0 * CAST(n AS DOUBLE)))
             |    - sqrt(3.8416) * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             |        / CAST(n AS DOUBLE)
             |        + 3.8416 / (4.0 * CAST(n AS DOUBLE)
             |          * CAST(n AS DOUBLE))))
             |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
             |    AS lo_ppm,
             |  CAST(floor(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             |      + 3.8416 / (2.0 * CAST(n AS DOUBLE)))
             |    + sqrt(3.8416) * sqrt(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
             |        * (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
             |        / CAST(n AS DOUBLE)
             |        + 3.8416 / (4.0 * CAST(n AS DOUBLE)
             |          * CAST(n AS DOUBLE))))
             |    / (1.0 + 3.8416 / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
             |    AS hi_ppm
             |FROM c""".stripMargin)),

    // CRAMÉR'S V for segment × priority — the normalized effect size the
    // raw χ² cells (q93) and MI terms (q318) don't give: comparable
    // across tables of any shape. Per-cell χ² terms quantized (order-free
    // integer sum), V = one sqrt at the end.
    Q("q348_cramers_v",
      (s, d) => {
        val jo = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("r"), col("o_orderpriority").as("c"))
        // persisted contingency cells (≤ 25 rows); n/nrows/ncols derive
        // from the cells, not a second fact pass — every (r, c) value in
        // jo appears in some cell, so the distinct counts are identical
        val cells = jo.groupBy(col("r"), col("c"))
          .agg(count(lit(1)).as("o"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rm = cells.groupBy(col("r")).agg(sum(col("o")).as("nr"))
        val cm = cells.groupBy(col("c")).agg(sum(col("o")).as("nc"))
        val t = cells.agg(sum(col("o")).as("n"),
          countDistinct(col("r")).as("nrows"),
          countDistinct(col("c")).as("ncols"))
        val terms = cells.join(broadcast(rm), Seq("r"))
          .join(broadcast(cm), Seq("c"))
          .crossJoin(broadcast(t))
          .select(floor((col("o") * col("n") - col("nr") * col("nc"))
            .cast("double") * (col("o") * col("n") - col("nr") * col("nc"))
            .cast("double") /
            (col("nr") * col("nc")).cast("double") /
            col("n").cast("double") * 1e6).cast("long").as("term_q"),
            col("n"), col("nrows"), col("ncols"))
        terms.groupBy(col("n"), col("nrows"), col("ncols"))
          .agg(sum(col("term_q")).as("chi2_q"))
          .select(col("n"), col("chi2_q"),
            floor(sqrt(col("chi2_q").cast("double") / 1e6 /
              col("n").cast("double") /
              least(col("nrows") - 1, col("ncols") - 1).cast("double"))
              * 1000).cast("long").as("v_milli"))
      },
      Some("""WITH jo AS (
             |  SELECT c_mktsegment AS r, o_orderpriority AS c
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |cells AS (SELECT r, c, CAST(count(*) AS BIGINT) AS o
             |          FROM jo GROUP BY 1, 2),
             |rm AS (SELECT r, CAST(sum(o) AS BIGINT) AS nr
             |       FROM cells GROUP BY 1),
             |cm AS (SELECT c, CAST(sum(o) AS BIGINT) AS nc
             |       FROM cells GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |        CAST(count(DISTINCT r) AS BIGINT) AS nrows,
             |        CAST(count(DISTINCT c) AS BIGINT) AS ncols FROM jo),
             |terms AS (
             |  SELECT CAST(floor(CAST(o * n - nr * nc AS DOUBLE)
             |      * CAST(o * n - nr * nc AS DOUBLE)
             |      / CAST(nr * nc AS DOUBLE) / CAST(n AS DOUBLE) * 1e6)
             |      AS BIGINT) AS term_q,
             |    n, nrows, ncols
             |  FROM cells JOIN rm USING (r) JOIN cm USING (c)
             |  CROSS JOIN t)
             |SELECT n, CAST(sum(term_q) AS BIGINT) AS chi2_q,
             |  CAST(floor(sqrt(CAST(sum(term_q) AS DOUBLE) / 1e6
             |    / CAST(n AS DOUBLE)
             |    / CAST(least(nrows - 1, ncols - 1) AS DOUBLE)) * 1000)
             |    AS BIGINT) AS v_milli
             |FROM terms GROUP BY n, nrows, ncols""".stripMargin)),

    // EWMA CONTROL CHART with λ = 1/2 over a 20-day band: dyadic weights
    // 2^(19-k) make the smoother EXACT integer arithmetic (λ = 1/2 is the
    // one λ whose weights are all powers of two — chosen for that
    // reason). Out-of-control = scaled EWMA outside μ ± 3σ·sqrt(λ/(2-λ))
    // on the same scale; the limit chain is scalar. The σ-limits are the
    // classic asymptotic ones — approximate near series edges, noted.
    Q("q349_ewma_chart",
      (s, d) => {
        val dl = daily(s, d)
        val stats = dl.agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
          sum(col("x") * col("x")).as("ss"))
        val ks = s.range(0, 20).select(col("id").as("kk"))
        val contrib = dl.crossJoin(broadcast(ks))
          .select((col("day") + col("kk")).as("day"),
            expr("x * shiftleft(1L, CAST(19 - kk AS INT))").as("w"))
        val ew = contrib.groupBy(col("day"))
          .agg(sum(col("w")).as("ewma_scaled"))
          .join(dl.select(col("day")), Seq("day")) // only real days
        val nD = col("n").cast("double")
        val mu = col("s").cast("double") / nD
        val sd = sqrt((nD * col("ss").cast("double") -
          col("s").cast("double") * col("s").cast("double")) / (nD * nD))
        val lim = sd * sqrt(lit(3.0)) / lit(3.0) * lit(3.0) // 3σ·sqrt(1/3)
        ew.crossJoin(broadcast(stats))
          .select(col("day"), col("ewma_scaled"),
            (abs(col("ewma_scaled").cast("double") - mu * lit(1048575.0))
              > lim * lit(1048575.0)).as("ooc"))
      },
      Some(s"""WITH $dailySql,
             |st AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x) AS BIGINT) AS s,
             |         CAST(sum(x * x) AS BIGINT) AS ss FROM daily),
             |co AS (
             |  SELECT day + kk AS day,
             |    CAST(x * (1::BIGINT << (19 - CAST(kk AS INT))) AS BIGINT)
             |      AS w
             |  FROM daily CROSS JOIN (SELECT unnest(range(0, 20)) AS kk)),
             |ew AS (
             |  SELECT day, CAST(sum(w) AS BIGINT) AS ewma_scaled
             |  FROM co GROUP BY 1),
             |re AS (SELECT ew.day, ewma_scaled FROM ew
             |       JOIN daily ON ew.day = daily.day)
             |SELECT day, ewma_scaled,
             |  abs(CAST(ewma_scaled AS DOUBLE)
             |    - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * 1048575.0)
             |  > sqrt((CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)
             |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
             |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
             |    * sqrt(3.0) / 3.0 * 3.0 * 1048575.0 AS ooc
             |FROM re CROSS JOIN st""".stripMargin)),

    // PAGE–HINKLEY drift detector, integer-exact: the running deviation
    // sum m_t = Σ(x_i − μ) is scaled by n (the mean's denominator), so
    // M_t = n·Σx_i − t·S never touches a float. PH = max(M_t − min M_≤t),
    // detection point = the argmax day. The streaming drift family's
    // batch twin (KS q288 compares windows; this finds WHERE the shift
    // begins). Windows run over the calendar-bounded day domain.
    Q("q350_page_hinkley",
      (s, d) => {
        val dl = daily(s, d)
        val t = dl.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
        val wOrd = Window.orderBy(col("day"))
        val wCum = wOrd.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        dl.crossJoin(broadcast(t))
          .withColumn("ti", row_number().over(wOrd).cast("long"))
          .withColumn("m", sum(col("x")).over(wCum) * col("n")
            - col("ti") * col("s"))
          .withColumn("minm", min(col("m")).over(wCum))
          .select(col("day"), col("n"), (col("m") - col("minm")).as("ph"))
          .agg(max(struct((col("ph")).as("ph"), (-col("day")).as("negday")))
            .as("b"), max(col("n")).as("n_days"))
          .select(col("n_days"), col("b.ph").as("ph_scaled"),
            (-col("b.negday")).as("detect_day"))
      },
      Some(s"""WITH $dailySql,
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(x) AS BIGINT) AS s FROM daily),
             |m AS (
             |  SELECT day, n,
             |    CAST(sum(x) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS BIGINT) * n
             |    - CAST(row_number() OVER (ORDER BY day) AS BIGINT) * s
             |      AS m
             |  FROM daily CROSS JOIN t),
             |p AS (
             |  SELECT day, n,
             |    m - min(m) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED
             |      PRECEDING AND CURRENT ROW) AS ph
             |  FROM m),
             |r AS (SELECT day, n, ph,
             |        row_number() OVER (ORDER BY ph DESC, day ASC) AS rk
             |      FROM p)
             |SELECT n AS n_days, ph AS ph_scaled, day AS detect_day
             |FROM r WHERE rk = 1""".stripMargin)))
}
