package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-10 batch 1 — the experimentation / causal-analysis axis a feature
  * store feeds: CUPED variance reduction, Benjamini–Hochberg FDR control
  * (df=2 so the chi-square p-value is the EXACT exp(−x/2), no erf), a
  * Cochran–Mantel–Haenszel pooled odds ratio, McNemar's paired test, a
  * differentially-private histogram release with deterministic inverse-CDF
  * Laplace noise (q296's md5-uniform family), and a Granger-style lagged
  * OLS F-test computed closed-form from integer moment sums.
  *
  * Float discipline (PLANS.md round-9 notes): every cross-row accumulation
  * is a BIGINT sum of exact integers; doubles appear only in final scalar
  * chains over one already-aggregated row, written as the SAME textual
  * expression in the Spark selectExpr and the DuckDB oracle so both engines
  * evaluate the identical IEEE tree. ln/exp stay inside comparisons or
  * coarse floors — never raw in output columns.
  */
object Entries68 {

  /** Shared arithmetic strings — interpolated into BOTH engines' plans so
    * the scalar chains cannot drift (the q338/q346 generated-unroll rule). */
  private val thetaStr =
    "CAST(n*sxy - sx*sy AS DOUBLE) / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0)"
  private val rho2Str =
    "(CAST(n*sxy - sx*sy AS DOUBLE) * CAST(n*sxy - sx*sy AS DOUBLE)) / " +
      "nullif(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE), 0.0)"
  private val meanAdjStr =
    s"CAST(sy_arm AS DOUBLE)/n_arm - ($thetaStr) * " +
      "(CAST(sx_arm AS DOUBLE)/n_arm - CAST(sx AS DOUBLE)/n)"

  /** chi-square over the 2x3 (arm x priority-class) table, generated once:
    * cells c{arm}{cls}, row totals ra/rb, class totals t0/t1/t2, grand n.
    * Margin-zero cells contribute 0 by convention (guarded on the exact
    * integer product, not the double). */
  private[graft] val chi2Str: String = {
    val terms = for {
      (arm, rtot) <- Seq("a" -> "ra", "b" -> "rb")
      (cls, ctot) <- Seq("0" -> "t0", "1" -> "t1", "2" -> "t2")
    } yield {
      val o = s"c$arm$cls"
      s"(CASE WHEN $rtot * $ctot = 0 THEN 0.0 ELSE " +
        s"(CAST($o AS DOUBLE) - CAST($rtot AS DOUBLE)*$ctot/nn) * " +
        s"(CAST($o AS DOUBLE) - CAST($rtot AS DOUBLE)*$ctot/nn) / " +
        s"(CAST($rtot AS DOUBLE)*$ctot/nn) END)"
    }
    terms.mkString(" + ")
  }

  /** Closed-form two-regressor OLS F-test chain (restricted y~y1 vs full
    * y~y1+x1) over centered second moments; one row in, one row out. */
  private val grangerCentered = Seq(
    "c11" -> "CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)*s1/n",
    "c22" -> "CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE)*s2/n",
    "c12" -> "CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE)*s2/n",
    "c1y" -> "CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE)*sy/n",
    "c2y" -> "CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE)*sy/n",
    "cyy" -> "CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)*sy/n")
  private val sseRStr = "cyy - c1y*c1y / nullif(c11, 0.0)"
  private val sseFStr =
    "cyy - ((c1y*c22 - c2y*c12)*c1y + (c2y*c11 - c1y*c12)*c2y) / " +
      "nullif(c11*c22 - c12*c12, 0.0)"

  val all: Seq[Q] = Seq(

    // CUPED variance reduction (Deng et al. 2013): pre-period (<=1996)
    // customer spend is the covariate X, post-period (>=1997) spend the
    // outcome Y, arms split by a deterministic md5 of the customer key.
    // theta = cov(X,Y)/var(X) from pooled BIGINT moments in thousand-dollar
    // units (k$ keeps n*sxy under 2^63 through sf10; at larger SF move the
    // grain to m$ — documented bound, same shape). Output per arm: the
    // CUPED-adjusted mean outcome and the achieved variance-reduction
    // fraction rho2 = corr(X,Y)^2.
    Q("q387_cuped",
      (s, d) => {
        val per = Tables.orders(s, d)
          .groupBy(col("o_custkey").as("cust"))
          .agg(
            sum(when(year(col("o_orderdate")) <= 1996,
              round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
              .as("pre_c"),
            sum(when(year(col("o_orderdate")) >= 1997,
              round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
              .as("post_c"))
          .select(col("cust"),
            expr("pre_c DIV 100000").as("x"),
            expr("post_c DIV 100000").as("y"),
            (conv(substring(md5(col("cust").cast("string")), 1, 12), 16, 10)
              .cast("long") % 2L).as("arm"))
        val mom = per.agg(
          count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
        val arms = per.groupBy(col("arm"))
          .agg(count(lit(1)).as("n_arm"),
            sum(col("x")).as("sx_arm"), sum(col("y")).as("sy_arm"))
        arms.crossJoin(broadcast(mom)).selectExpr(
          "arm", "n_arm", "sx_arm", "sy_arm",
          s"$thetaStr AS theta",
          s"$meanAdjStr AS mean_y_adj",
          s"$rho2Str AS rho2")
      },
      Some(s"""WITH per AS (
              |  SELECT o_custkey AS cust,
              |    CAST(sum(CASE WHEN year(o_orderdate) <= 1996
              |      THEN CAST(round(o_totalprice*100) AS BIGINT)
              |      ELSE 0 END) AS BIGINT) // 100000 AS x,
              |    CAST(sum(CASE WHEN year(o_orderdate) >= 1997
              |      THEN CAST(round(o_totalprice*100) AS BIGINT)
              |      ELSE 0 END) AS BIGINT) // 100000 AS y,
              |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))
              |      ::BIGINT % 2 AS arm
              |  FROM orders GROUP BY o_custkey),
              |mom AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
              |    CAST(sum(x*x) AS BIGINT) AS sxx,
              |    CAST(sum(x*y) AS BIGINT) AS sxy,
              |    CAST(sum(y*y) AS BIGINT) AS syy
              |  FROM per),
              |arms AS (
              |  SELECT arm, CAST(count(*) AS BIGINT) AS n_arm,
              |    CAST(sum(x) AS BIGINT) AS sx_arm,
              |    CAST(sum(y) AS BIGINT) AS sy_arm
              |  FROM per GROUP BY arm)
              |SELECT arm, n_arm, sx_arm, sy_arm,
              |  $thetaStr AS theta,
              |  $meanAdjStr AS mean_y_adj,
              |  $rho2Str AS rho2
              |FROM arms CROSS JOIN mom""".stripMargin)),

    // BENJAMINI–HOCHBERG FDR control over 25 per-nation independence tests
    // (arm x 3 priority classes, df = (2-1)(3-1) = 2, where the chi-square
    // survival is EXACTLY exp(-x/2) — the one df with a closed form, so no
    // erf approximation enters). The BH step-up compare runs on the log
    // scale (chi2 >= -2 ln(rank*q/m)) so ln never reaches an output column;
    // chi2 itself is an identical-IEEE chain over exact cell counts. The
    // rank window is unpartitioned but the domain is the FIXED 25-nation
    // dimension — size-invariant at any data scale (calendar-domain rule).
    Q("q388_bh_fdr",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nation"),
            (conv(substring(md5(col("o_orderkey").cast("string")), 1, 12),
              16, 10).cast("long") % 2L).as("arm"),
            when(substring(col("o_orderpriority"), 1, 1).isin("1", "2"), 0)
              .when(substring(col("o_orderpriority"), 1, 1) === "3", 1)
              .otherwise(2).as("cls"))
        val tab = cells.groupBy(col("nation")).agg(
          sum(when(col("arm") === 0L && col("cls") === 0, 1L).otherwise(0L)).as("ca0"),
          sum(when(col("arm") === 0L && col("cls") === 1, 1L).otherwise(0L)).as("ca1"),
          sum(when(col("arm") === 0L && col("cls") === 2, 1L).otherwise(0L)).as("ca2"),
          sum(when(col("arm") === 1L && col("cls") === 0, 1L).otherwise(0L)).as("cb0"),
          sum(when(col("arm") === 1L && col("cls") === 1, 1L).otherwise(0L)).as("cb1"),
          sum(when(col("arm") === 1L && col("cls") === 2, 1L).otherwise(0L)).as("cb2"))
        val chi = tab.selectExpr("nation", "ca0", "ca1", "ca2", "cb0", "cb1", "cb2",
            "ca0 + ca1 + ca2 AS ra", "cb0 + cb1 + cb2 AS rb",
            "ca0 + cb0 AS t0", "ca1 + cb1 AS t1", "ca2 + cb2 AS t2")
          .selectExpr("nation",
            "CAST(ra + rb AS DOUBLE) AS nn0", "ra", "rb", "t0", "t1", "t2",
            "ca0", "ca1", "ca2", "cb0", "cb1", "cb2")
          .withColumnRenamed("nn0", "nn")
          .selectExpr("nation", s"$chi2Str AS chi2")
        val ranked = chi.selectExpr("nation", "chi2",
          "row_number() OVER (ORDER BY chi2 DESC, nation ASC) AS rk",
          "CAST(count(*) OVER () AS BIGINT) AS m")
        ranked.selectExpr("nation", "CAST(floor(chi2 * 1000000) AS BIGINT) AS chi2_ppm",
            "rk", "m",
            "CASE WHEN chi2 >= -2.0 * ln((CAST(rk AS DOUBLE) * 0.1) / m) THEN rk END AS hit")
          .selectExpr("nation", "chi2_ppm", "rk", "m",
            "coalesce(max(hit) OVER (), 0) AS k_star")
          .selectExpr("nation", "chi2_ppm", "rk",
            "k_star", "rk <= k_star AS rejected")
      },
      Some(s"""WITH cells AS (
              |  SELECT CAST(c_nationkey AS BIGINT) AS nation,
              |    ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
              |      ::BIGINT % 2 AS arm,
              |    CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2') THEN 0
              |         WHEN substr(o_orderpriority, 1, 1) = '3' THEN 1
              |         ELSE 2 END AS cls
              |  FROM orders JOIN customer ON o_custkey = c_custkey),
              |tab AS (
              |  SELECT nation,
              |    CAST(sum(CASE WHEN arm=0 AND cls=0 THEN 1 ELSE 0 END) AS BIGINT) AS ca0,
              |    CAST(sum(CASE WHEN arm=0 AND cls=1 THEN 1 ELSE 0 END) AS BIGINT) AS ca1,
              |    CAST(sum(CASE WHEN arm=0 AND cls=2 THEN 1 ELSE 0 END) AS BIGINT) AS ca2,
              |    CAST(sum(CASE WHEN arm=1 AND cls=0 THEN 1 ELSE 0 END) AS BIGINT) AS cb0,
              |    CAST(sum(CASE WHEN arm=1 AND cls=1 THEN 1 ELSE 0 END) AS BIGINT) AS cb1,
              |    CAST(sum(CASE WHEN arm=1 AND cls=2 THEN 1 ELSE 0 END) AS BIGINT) AS cb2
              |  FROM cells GROUP BY nation),
              |marg AS (
              |  SELECT nation, ca0, ca1, ca2, cb0, cb1, cb2,
              |    ca0 + ca1 + ca2 AS ra, cb0 + cb1 + cb2 AS rb,
              |    ca0 + cb0 AS t0, ca1 + cb1 AS t1, ca2 + cb2 AS t2,
              |    CAST(ca0+ca1+ca2+cb0+cb1+cb2 AS DOUBLE) AS nn
              |  FROM tab),
              |chi AS (SELECT nation, $chi2Str AS chi2 FROM marg),
              |ranked AS (
              |  SELECT nation, chi2,
              |    row_number() OVER (ORDER BY chi2 DESC, nation ASC) AS rk,
              |    CAST(count(*) OVER () AS BIGINT) AS m
              |  FROM chi),
              |hits AS (
              |  SELECT nation, CAST(floor(chi2 * 1000000) AS BIGINT) AS chi2_ppm,
              |    rk, m,
              |    CASE WHEN chi2 >= -2.0 * ln((CAST(rk AS DOUBLE) * 0.1) / m)
              |      THEN rk END AS hit
              |  FROM ranked),
              |ks AS (
              |  SELECT nation, chi2_ppm, rk, m,
              |    coalesce(max(hit) OVER (), 0) AS k_star
              |  FROM hits)
              |SELECT nation, chi2_ppm, rk, k_star,
              |  rk <= k_star AS rejected
              |FROM ks""".stripMargin)),

    // COCHRAN–MANTEL–HAENSZEL pooled odds ratio across region strata:
    // exposure = discount >= 5% (compared on exact cents), outcome =
    // returned line. CMH = sum(a_i d_i / n_i) / sum(b_i c_i / n_i); each
    // stratum term is quantized to ppm AS AN EXACT INTEGER DIVISION
    // (a*d*1e6 DIV n — fits 2^63 through sf1; coarsen to per-mille above)
    // before the cross-stratum sum, so the pooled ratio is order-free.
    Q("q389_cmh_pooled",
      (s, d) => {
        val sup = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("r_name"))
        // persisted: the stratum table (5 rows) feeds BOTH the per-stratum
        // branch and the pooled sum — uncached, the pooled side re-scans
        // and re-aggregates lineitem (plan census r8; exchange reuse does
        // not fire across the differing aggregate layers)
        val base = Tables.lineitem(s, d)
          .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
          .select(col("r_name").as("stratum"),
            (round(col("l_discount") * 100).cast("long") >= 5L).as("e"),
            (col("l_returnflag") === "R").as("r"))
          .groupBy(col("stratum")).agg(
            sum(when(col("e") && col("r"), 1L).otherwise(0L)).as("a"),
            sum(when(col("e") && !col("r"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("e") && col("r"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("e") && !col("r"), 1L).otherwise(0L)).as("d"))
          .selectExpr("stratum", "a", "b", "c", "d",
            "(a * d * 1000000) DIV (a + b + c + d) AS num_q",
            "(b * c * 1000000) DIV (a + b + c + d) AS den_q")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tab = base
          .selectExpr("stratum", "a", "b", "c", "d", "num_q", "den_q",
            "CAST(floor(CAST(num_q AS DOUBLE) * 1000000 / " +
              "nullif(CAST(den_q AS DOUBLE), 0.0)) AS BIGINT) AS or_ppm")
        val pooled = base.groupBy().agg(
            lit("ALL").as("stratum"),
            sum(col("a")).as("a"), sum(col("b")).as("b"),
            sum(col("c")).as("c"), sum(col("d")).as("d"),
            sum(col("num_q")).as("num_q"), sum(col("den_q")).as("den_q"))
          .selectExpr("stratum", "a", "b", "c", "d", "num_q", "den_q",
            "CAST(floor(CAST(num_q AS DOUBLE) * 1000000 / " +
              "nullif(CAST(den_q AS DOUBLE), 0.0)) AS BIGINT) AS or_ppm")
        tab.unionByName(pooled)
      },
      Some("""WITH sup AS (
             |  SELECT s_suppkey, r_name FROM supplier
             |  JOIN nation ON s_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey),
             |tab AS (
             |  SELECT r_name AS stratum,
             |    CAST(sum(CASE WHEN CAST(round(l_discount*100) AS BIGINT) >= 5
             |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS a,
             |    CAST(sum(CASE WHEN CAST(round(l_discount*100) AS BIGINT) >= 5
             |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN CAST(round(l_discount*100) AS BIGINT) < 5
             |      AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(sum(CASE WHEN CAST(round(l_discount*100) AS BIGINT) < 5
             |      AND l_returnflag <> 'R' THEN 1 ELSE 0 END) AS BIGINT) AS d
             |  FROM lineitem JOIN sup ON l_suppkey = s_suppkey
             |  GROUP BY 1),
             |q AS (
             |  SELECT stratum, a, b, c, d,
             |    (a * d * 1000000) // (a + b + c + d) AS num_q,
             |    (b * c * 1000000) // (a + b + c + d) AS den_q
             |  FROM tab),
             |strata AS (
             |  SELECT stratum, a, b, c, d, num_q, den_q,
             |    CAST(floor(CAST(num_q AS DOUBLE) * 1000000 /
             |      nullif(CAST(den_q AS DOUBLE), 0.0)) AS BIGINT) AS or_ppm
             |  FROM q),
             |pooled AS (
             |  SELECT 'ALL' AS stratum, CAST(sum(a) AS BIGINT) AS a,
             |    CAST(sum(b) AS BIGINT) AS b, CAST(sum(c) AS BIGINT) AS c,
             |    CAST(sum(d) AS BIGINT) AS d,
             |    CAST(sum(num_q) AS BIGINT) AS num_q,
             |    CAST(sum(den_q) AS BIGINT) AS den_q
             |  FROM q)
             |SELECT * FROM strata
             |UNION ALL
             |SELECT stratum, a, b, c, d, num_q, den_q,
             |  CAST(floor(CAST(num_q AS DOUBLE) * 1000000 /
             |    nullif(CAST(den_q AS DOUBLE), 0.0)) AS BIGINT) AS or_ppm
             |FROM pooled""".stripMargin)),

    // McNEMAR'S PAIRED TEST: did per-customer return incidence change from
    // 1996 to 1997, on the customers active in BOTH years? The discordant
    // counts b (returned-96-only) and c (returned-97-only) carry all the
    // information; statistic = (b-c)^2/(b+c), with the continuity-corrected
    // variant, both as exact integer-division ppm. One orderkey-partitioned
    // join + one custkey aggregation — no window at all.
    Q("q390_mcnemar",
      (s, d) => {
        val per = Tables.orders(s, d)
          .join(Tables.lineitem(s, d),
            col("o_orderkey") === col("l_orderkey"))
          .select(col("o_custkey").as("cust"),
            year(col("o_orderdate")).as("yr"),
            (col("l_returnflag") === "R").as("ret"))
          .groupBy(col("cust")).agg(
            max(when(col("yr") === 1996, 1L).otherwise(0L)).as("o96"),
            max(when(col("yr") === 1997, 1L).otherwise(0L)).as("o97"),
            max(when(col("yr") === 1996 && col("ret"), 1L).otherwise(0L)).as("r96"),
            max(when(col("yr") === 1997 && col("ret"), 1L).otherwise(0L)).as("r97"))
          .filter(col("o96") === 1L && col("o97") === 1L)
        per.agg(
            count(lit(1)).as("n_pairs"),
            sum(when(col("r96") === 1L && col("r97") === 1L, 1L).otherwise(0L)).as("n11"),
            sum(when(col("r96") === 1L && col("r97") === 0L, 1L).otherwise(0L)).as("b"),
            sum(when(col("r96") === 0L && col("r97") === 1L, 1L).otherwise(0L)).as("c"),
            sum(when(col("r96") === 0L && col("r97") === 0L, 1L).otherwise(0L)).as("n00"))
          .selectExpr("n_pairs", "n11", "b", "c", "n00",
            "CASE WHEN b + c = 0 THEN 0 ELSE ((b - c) * (b - c) * 1000000) DIV (b + c) END AS stat_ppm",
            "CASE WHEN b + c = 0 THEN 0 ELSE (greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0) * 1000000) DIV (b + c) END AS stat_cc_ppm")
      },
      Some("""WITH per AS (
             |  SELECT o_custkey AS cust,
             |    max(CASE WHEN year(o_orderdate) = 1996 THEN 1 ELSE 0 END) AS o96,
             |    max(CASE WHEN year(o_orderdate) = 1997 THEN 1 ELSE 0 END) AS o97,
             |    max(CASE WHEN year(o_orderdate) = 1996 AND l_returnflag = 'R'
             |      THEN 1 ELSE 0 END) AS r96,
             |    max(CASE WHEN year(o_orderdate) = 1997 AND l_returnflag = 'R'
             |      THEN 1 ELSE 0 END) AS r97
             |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
             |  GROUP BY 1),
             |pairs AS (SELECT * FROM per WHERE o96 = 1 AND o97 = 1),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             |    CAST(sum(CASE WHEN r96=1 AND r97=1 THEN 1 ELSE 0 END) AS BIGINT) AS n11,
             |    CAST(sum(CASE WHEN r96=1 AND r97=0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
             |    CAST(sum(CASE WHEN r96=0 AND r97=1 THEN 1 ELSE 0 END) AS BIGINT) AS c,
             |    CAST(sum(CASE WHEN r96=0 AND r97=0 THEN 1 ELSE 0 END) AS BIGINT) AS n00
             |  FROM pairs)
             |SELECT n_pairs, n11, b, c, n00,
             |  CASE WHEN b + c = 0 THEN 0
             |    ELSE ((b - c) * (b - c) * 1000000) // (b + c) END AS stat_ppm,
             |  CASE WHEN b + c = 0 THEN 0
             |    ELSE (greatest(abs(b - c) - 1, 0) * greatest(abs(b - c) - 1, 0)
             |      * 1000000) // (b + c) END AS stat_cc_ppm
             |FROM agg""".stripMargin)),

    // DIFFERENTIALLY-PRIVATE HISTOGRAM RELEASE (epsilon = 1, sensitivity 1):
    // order counts per (region, priority) cell plus Laplace noise drawn by
    // deterministic inverse-CDF from the q296 md5-uniform family — the
    // noise is a pure function of the CELL KEY, so both engines add the
    // same sample and the release is reproducible. u is a dyadic rational
    // (48-bit hash / 2^48, exact in double); the ln stays inside a value
    // that is floored at milli grain. Broadcast dims; one shuffle.
    Q("q391_dp_histogram",
      (s, d) => {
        val geo = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)),
            col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d)),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"), col("r_name"))
        Tables.orders(s, d)
          .join(broadcast(geo), col("o_custkey") === col("c_custkey"))
          .groupBy(col("r_name").as("region"),
            col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("cnt"))
          .selectExpr("region", "priority", "cnt",
            "CAST(conv(substring(md5(concat(region, '|', priority)), 1, 12), 16, 10) AS BIGINT) AS h")
          .selectExpr("region", "priority", "cnt",
            "CAST(h AS DOUBLE) / 281474976710656.0 - 0.5 AS z")
          .selectExpr("region", "priority", "cnt",
            "CAST(floor((CASE WHEN z >= 0.0 THEN -ln(1.0 - 2.0*z) ELSE ln(1.0 + 2.0*z) END) * 1000) AS BIGINT) AS noise_milli")
          .selectExpr("region", "priority",
            "cnt * 1000 + noise_milli AS noisy_milli",
            "CAST(1.0 AS DOUBLE) AS epsilon")
      },
      Some("""WITH geo AS (
             |  SELECT c_custkey, r_name FROM customer
             |  JOIN nation ON c_nationkey = n_nationkey
             |  JOIN region ON n_regionkey = r_regionkey),
             |cells AS (
             |  SELECT r_name AS region, o_orderpriority AS priority,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM orders JOIN geo ON o_custkey = c_custkey
             |  GROUP BY 1, 2),
             |z AS (
             |  SELECT region, priority, cnt,
             |    CAST(('0x' || substr(md5(region || '|' || priority), 1, 12))
             |      ::BIGINT AS DOUBLE) / 281474976710656.0 - 0.5 AS z
             |  FROM cells),
             |nm AS (
             |  SELECT region, priority, cnt,
             |    CAST(floor((CASE WHEN z >= 0.0 THEN -ln(1.0 - 2.0*z)
             |      ELSE ln(1.0 + 2.0*z) END) * 1000) AS BIGINT) AS noise_milli
             |  FROM z)
             |SELECT region, priority,
             |  cnt * 1000 + noise_milli AS noisy_milli,
             |  CAST(1.0 AS DOUBLE) AS epsilon
             |FROM nm""".stripMargin)),

    // GRANGER-STYLE LAG TEST: do yesterday's order counts improve the
    // prediction of today's returned-line counts beyond today's own lag?
    // Daily x = orders placed, y = 'R' lines shipped; consecutive-day
    // triples (y_t, y_{t-1}, x_{t-1}) via a self-join on the CALENDAR
    // domain (~2,400 days at any SF); restricted (y~y1) vs full (y~y1+x1)
    // OLS solved closed-form from ten BIGINT moment sums — the F statistic
    // is one identical scalar chain, no window, no iteration.
    Q("q392_granger",
      (s, d) => {
        val od = Tables.orders(s, d)
          .groupBy((graft.ops.Relational.epochUs(col("o_orderdate"))
            / lit(86400000000L)).cast("long").as("day"))
          .agg(count(lit(1)).as("x"))
        val rd = Tables.lineitem(s, d)
          .filter(col("l_returnflag") === "R")
          .groupBy((graft.ops.Relational.epochUs(col("l_shipdate"))
            / lit(86400000000L)).cast("long").as("day"))
          .agg(count(lit(1)).as("y"))
        val daily = od.join(rd, Seq("day"), "full_outer")
          .select(col("day"),
            coalesce(col("x"), lit(0L)).as("x"),
            coalesce(col("y"), lit(0L)).as("y"))
        val tri = daily.alias("t")
          .join(daily.alias("p"), col("t.day") === col("p.day") + 1L)
          .select(col("t.y").as("yt"), col("p.y").as("y1"),
            col("p.x").as("x1"))
        val mom = tri.agg(
          count(lit(1)).as("n"),
          sum(col("yt")).as("sy"), sum(col("y1")).as("s1"),
          sum(col("x1")).as("s2"),
          sum(col("yt") * col("yt")).as("syy"),
          sum(col("y1") * col("y1")).as("s11"),
          sum(col("x1") * col("x1")).as("s22"),
          sum(col("y1") * col("yt")).as("s1y"),
          sum(col("x1") * col("yt")).as("s2y"),
          sum(col("y1") * col("x1")).as("s12"))
        mom
          .selectExpr(Seq("n", "sy", "s1", "s2", "syy", "s11", "s22",
            "s1y", "s2y", "s12") ++
            grangerCentered.map { case (nm, e) => s"$e AS $nm" }: _*)
          .selectExpr("n", "s1y", "s2y", "s12",
            s"$sseRStr AS sse_r", s"$sseFStr AS sse_f")
          .selectExpr("n", "s1y", "s2y", "s12",
            "CAST(floor(sse_r * 1000) AS BIGINT) AS sse_r_milli",
            "CAST(floor(sse_f * 1000) AS BIGINT) AS sse_f_milli",
            "CAST(floor((sse_r - sse_f) * (n - 3) * 1000 / nullif(sse_f, 0.0)) AS BIGINT) AS f_milli")
      },
      Some(s"""WITH od AS (
              |  SELECT epoch_us(o_orderdate) // 86400000000 AS day,
              |    CAST(count(*) AS BIGINT) AS x
              |  FROM orders GROUP BY 1),
              |rd AS (
              |  SELECT epoch_us(l_shipdate) // 86400000000 AS day,
              |    CAST(count(*) AS BIGINT) AS y
              |  FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
              |daily AS (
              |  SELECT coalesce(od.day, rd.day) AS day,
              |    coalesce(od.x, 0) AS x, coalesce(rd.y, 0) AS y
              |  FROM od FULL OUTER JOIN rd ON od.day = rd.day),
              |tri AS (
              |  SELECT t.y AS yt, p.y AS y1, p.x AS x1
              |  FROM daily t JOIN daily p ON t.day = p.day + 1),
              |mom AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(yt) AS BIGINT) AS sy,
              |    CAST(sum(y1) AS BIGINT) AS s1,
              |    CAST(sum(x1) AS BIGINT) AS s2,
              |    CAST(sum(yt*yt) AS BIGINT) AS syy,
              |    CAST(sum(y1*y1) AS BIGINT) AS s11,
              |    CAST(sum(x1*x1) AS BIGINT) AS s22,
              |    CAST(sum(y1*yt) AS BIGINT) AS s1y,
              |    CAST(sum(x1*yt) AS BIGINT) AS s2y,
              |    CAST(sum(y1*x1) AS BIGINT) AS s12
              |  FROM tri),
              |cen AS (
              |  SELECT n, sy, s1, s2, syy, s11, s22, s1y, s2y, s12,
              |    ${grangerCentered.map { case (nm, e) => s"$e AS $nm" }.mkString(",\n              |    ")}
              |  FROM mom),
              |sse AS (
              |  SELECT n, s1y, s2y, s12,
              |    $sseRStr AS sse_r, $sseFStr AS sse_f
              |  FROM cen)
              |SELECT n, s1y, s2y, s12,
              |  CAST(floor(sse_r * 1000) AS BIGINT) AS sse_r_milli,
              |  CAST(floor(sse_f * 1000) AS BIGINT) AS sse_f_milli,
              |  CAST(floor((sse_r - sse_f) * (n - 3) * 1000 /
              |    nullif(sse_f, 0.0)) AS BIGINT) AS f_milli
              |FROM sse""".stripMargin)))
}
