package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 10: lead–lag cross-correlation, two-way ANOVA with
  * interaction, empirical tail dependence, Cliff's delta (the ordinal
  * effect size), the 2×2 odds-ratio table, and quantile treatment
  * effects — rounding out the stats/causal families.
  */
object Entries66 {

  val all: Seq[Q] = Seq(

    // CROSS-CORRELATION FUNCTION between hourly purchase and click
    // volumes at lags −3…+3 — the lead–lag detector (does clicking
    // predict buying an hour later?). Series live on the bounded hour
    // domain; each lag is one join + the five-sum Pearson fold.
    Q("q375_ccf",
      (s, d) => {
        val hourly = Tables.events(s, d)
          .filter(col("event_type").isin("purchase", "click"))
          .groupBy(expr("ts_us DIV 3600000000L").as("h"),
            col("event_type"))
          .agg(count(lit(1)).as("c"))
        val x = hourly.filter(col("event_type") === "purchase")
          .select(col("h").as("hx"), col("c").as("xa"))
        val y = hourly.filter(col("event_type") === "click")
          .select(col("h").as("hy"), col("c").as("xb"))
        val ks = s.range(-3, 4).select(col("id").as("k"))
        val pairs = x.crossJoin(broadcast(ks))
          .join(y, col("hy") === col("hx") - col("k"))
          .select(col("k"), col("xa"), col("xb"))
        val sums = pairs.groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
            sum(col("xa") * col("xa")).as("sxx"),
            sum(col("xb") * col("xb")).as("syy"),
            sum(col("xa") * col("xb")).as("sxy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        sums.select(col("k"), col("n"),
          floor(((nD * col("sxy").cast("double") - sxD * syD) /
            (sqrt(nD * col("sxx").cast("double") - sxD * sxD) *
              sqrt(nD * col("syy").cast("double") - syD * syD))) * 1e9)
            .cast("long").as("rho_q"))
      },
      Some("""WITH hc AS (
             |  SELECT epoch_us(ts) // 3600000000 AS h, event_type,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM events WHERE event_type IN ('purchase', 'click')
             |  GROUP BY 1, 2),
             |x AS (SELECT h, c AS x FROM hc
             |      WHERE event_type = 'purchase'),
             |y AS (SELECT h, c AS y FROM hc WHERE event_type = 'click'),
             |p AS (
             |  SELECT k, x.x AS xa, y.y AS xb
             |  FROM x CROSS JOIN (SELECT unnest(range(-3, 4)) AS k)
             |  JOIN y ON y.h = x.h - k),
             |s AS (
             |  SELECT k, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(xa) AS BIGINT) AS sx,
             |    CAST(sum(xb) AS BIGINT) AS sy,
             |    CAST(sum(xa * xa) AS BIGINT) AS sxx,
             |    CAST(sum(xb * xb) AS BIGINT) AS syy,
             |    CAST(sum(xa * xb) AS BIGINT) AS sxy
             |  FROM p GROUP BY 1)
             |SELECT CAST(k AS BIGINT) AS k, n,
             |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1e9)
             |    AS BIGINT) AS rho_q
             |FROM s""".stripMargin)),

    // TWO-WAY ANOVA with interaction (priority × day-of-week on order
    // value): SSA, SSB, SSAB and SST, each assembled from per-level /
    // per-cell terms quantized BEFORE their cross-group sums (the q345
    // discipline). A large SSAB with small SSA/SSB = the factors only
    // matter jointly — the thing one-way η² (q345) cannot see.
    Q("q376_twoway_anova",
      (s, d) => {
        // persisted: f feeds the cell reduce AND the total-moment pass;
        // cells (35 rows) then fan out to ma/mb/ssab
        val f = Tables.orders(s, d)
          .select(col("o_orderpriority").as("a"),
            (datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
              .cast("long") % 7).as("b"),
            expr("CAST(round(o_totalprice * 100) AS LONG) DIV 1000")
              .as("v"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cells = f.groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("n_ab"), sum(col("v")).as("s_ab"))
        val ma = cells.groupBy(col("a"))
          .agg(sum(col("n_ab")).as("n_a"), sum(col("s_ab")).as("s_a"))
        val mb = cells.groupBy(col("b"))
          .agg(sum(col("n_ab")).as("n_b"), sum(col("s_ab")).as("s_b"))
        val tot = f.agg(count(lit(1)).as("n"), sum(col("v")).as("s"),
          sum(col("v") * col("v")).as("ss"))
        val muT = col("s").cast("double") / col("n").cast("double")
        val ssa = ma.crossJoin(broadcast(tot))
          .select(floor(col("n_a").cast("double") *
            (col("s_a").cast("double") / col("n_a").cast("double") - muT) *
            (col("s_a").cast("double") / col("n_a").cast("double") - muT)
            * 1e3).cast("long").as("t"))
          .agg(sum(col("t")).as("ssa_q"))
        val ssb = mb.crossJoin(broadcast(tot))
          .select(floor(col("n_b").cast("double") *
            (col("s_b").cast("double") / col("n_b").cast("double") - muT) *
            (col("s_b").cast("double") / col("n_b").cast("double") - muT)
            * 1e3).cast("long").as("t"))
          .agg(sum(col("t")).as("ssb_q"))
        val ssab = cells.join(broadcast(ma), Seq("a"))
          .join(broadcast(mb), Seq("b"))
          .crossJoin(broadcast(tot))
          .select(floor(col("n_ab").cast("double") *
            (col("s_ab").cast("double") / col("n_ab").cast("double")
              - col("s_a").cast("double") / col("n_a").cast("double")
              - col("s_b").cast("double") / col("n_b").cast("double")
              + muT) *
            (col("s_ab").cast("double") / col("n_ab").cast("double")
              - col("s_a").cast("double") / col("n_a").cast("double")
              - col("s_b").cast("double") / col("n_b").cast("double")
              + muT) * 1e3).cast("long").as("t"))
          .agg(sum(col("t")).as("ssab_q"))
        val sst = tot.select(col("n"),
          (floor(col("ss").cast("double") * 1e3) -
            floor(col("s").cast("double") * col("s").cast("double") /
              col("n").cast("double") * 1e3).cast("long")).as("sst_q"))
        ssa.crossJoin(ssb).crossJoin(ssab).crossJoin(sst)
          .select(col("n"), col("ssa_q"), col("ssb_q"), col("ssab_q"),
            col("sst_q"))
      },
      Some("""WITH f AS (
             |  SELECT o_orderpriority AS a,
             |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) % 7 AS b,
             |    CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS v
             |  FROM orders),
             |cells AS (SELECT a, b, CAST(count(*) AS BIGINT) AS n_ab,
             |            CAST(sum(v) AS BIGINT) AS s_ab
             |          FROM f GROUP BY 1, 2),
             |ma AS (SELECT a, CAST(sum(n_ab) AS BIGINT) AS n_a,
             |         CAST(sum(s_ab) AS BIGINT) AS s_a
             |       FROM cells GROUP BY 1),
             |mb AS (SELECT b, CAST(sum(n_ab) AS BIGINT) AS n_b,
             |         CAST(sum(s_ab) AS BIGINT) AS s_b
             |       FROM cells GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS n,
             |        CAST(sum(v) AS BIGINT) AS s,
             |        CAST(sum(v * v) AS BIGINT) AS ss FROM f),
             |ssa AS (
             |  SELECT CAST(sum(CAST(floor(CAST(n_a AS DOUBLE)
             |    * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e3)
             |    AS BIGINT)) AS BIGINT) AS ssa_q
             |  FROM ma CROSS JOIN t),
             |ssb AS (
             |  SELECT CAST(sum(CAST(floor(CAST(n_b AS DOUBLE)
             |    * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             |       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             |       - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e3)
             |    AS BIGINT)) AS BIGINT) AS ssb_q
             |  FROM mb CROSS JOIN t),
             |ssab AS (
             |  SELECT CAST(sum(CAST(floor(CAST(n_ab AS DOUBLE)
             |    * (CAST(s_ab AS DOUBLE) / CAST(n_ab AS DOUBLE)
             |       - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |       - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             |       + CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             |    * (CAST(s_ab AS DOUBLE) / CAST(n_ab AS DOUBLE)
             |       - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
             |       - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
             |       + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) * 1e3)
             |    AS BIGINT)) AS BIGINT) AS ssab_q
             |  FROM cells JOIN ma USING (a) JOIN mb USING (b)
             |  CROSS JOIN t),
             |sst AS (
             |  SELECT n, CAST(floor(CAST(ss AS DOUBLE) * 1e3) AS BIGINT)
             |    - CAST(floor(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
             |      / CAST(n AS DOUBLE) * 1e3) AS BIGINT) AS sst_q
             |  FROM t)
             |SELECT n, ssa_q, ssb_q, ssab_q, sst_q
             |FROM ssa CROSS JOIN ssb CROSS JOIN ssab
             |CROSS JOIN sst""".stripMargin)),

    // EMPIRICAL TAIL DEPENDENCE between price and quantity: of the rows
    // in the quantity p90 tail, what fraction also sit in the price p90
    // tail (and the same for the lower p10 corner). Independence ⇒
    // ≈ 100k ppm; a copula with tail dependence pushes it up — the
    // dependence structure Pearson (q58) and partial-r (q374) are blind
    // to. Exact reduced-domain quantiles, integer exceedance counts.
    Q("q377_tail_dependence",
      (s, d) => {
        // persisted: f feeds four quantile locators (each needing a value
        // reduce + a count) plus the final exceedance pass — nine fact
        // scans without the cache, one with it
        val f = Tables.lineitem(s, d)
          .select(round(col("l_extendedprice") * 100).cast("long").as("x"),
            round(col("l_quantity") * 100).cast("long").as("y"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def quant(c: String, num: Int, den: Int, name: String) = {
          val dom = f.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
          val w = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val n = f.agg(count(lit(1)).as("n"))
          dom.withColumn("cum", sum(col("cnt")).over(w))
            .crossJoin(broadcast(n))
            .agg(min(when(col("cum") >= expr(s"($num * n + $num) DIV $den"),
              col("v"))).as(name))
        }
        val qx90 = quant("x", 9, 10, "qx90")
        val qy90 = quant("y", 9, 10, "qy90")
        val qx10 = quant("x", 1, 10, "qx10")
        val qy10 = quant("y", 1, 10, "qy10")
        f.crossJoin(broadcast(qx90)).crossJoin(broadcast(qy90))
          .crossJoin(broadcast(qx10)).crossJoin(broadcast(qy10))
          .agg(count(lit(1)).as("n"),
            sum(when(col("y") > col("qy90"), 1L).otherwise(0L)).as("n_yu"),
            sum(when(col("y") > col("qy90") && col("x") > col("qx90"), 1L)
              .otherwise(0L)).as("n_joint_u"),
            sum(when(col("y") <= col("qy10"), 1L).otherwise(0L)).as("n_yl"),
            sum(when(col("y") <= col("qy10") && col("x") <= col("qx10"),
              1L).otherwise(0L)).as("n_joint_l"))
          .select(col("n"), col("n_yu"), col("n_joint_u"),
            expr("(n_joint_u * 1000000L) DIV n_yu").as("lambda_u_ppm"),
            col("n_yl"), col("n_joint_l"),
            expr("(n_joint_l * 1000000L) DIV n_yl").as("lambda_l_ppm"))
      },
      Some("""WITH f AS (
             |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
             |    CAST(round(l_quantity * 100) AS BIGINT) AS y
             |  FROM lineitem),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
             |qx AS (
             |  SELECT min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
             |      AS qx90,
             |    min(CASE WHEN cum >= (1 * n + 1) // 10 THEN v END)
             |      AS qx10
             |  FROM (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS
             |          BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS BIGINT) AS cum
             |        FROM (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
             |              FROM f GROUP BY 1)) CROSS JOIN n),
             |qy AS (
             |  SELECT min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
             |      AS qy90,
             |    min(CASE WHEN cum >= (1 * n + 1) // 10 THEN v END)
             |      AS qy10
             |  FROM (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS
             |          BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |          AS BIGINT) AS cum
             |        FROM (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
             |              FROM f GROUP BY 1)) CROSS JOIN n)
             |SELECT CAST(count(*) AS BIGINT) AS n,
             |  CAST(sum(CASE WHEN y > qy90 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_yu,
             |  CAST(sum(CASE WHEN y > qy90 AND x > qx90 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_joint_u,
             |  (CAST(sum(CASE WHEN y > qy90 AND x > qx90 THEN 1
             |    ELSE 0 END) AS BIGINT) * 1000000)
             |    // CAST(sum(CASE WHEN y > qy90 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS lambda_u_ppm,
             |  CAST(sum(CASE WHEN y <= qy10 THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_yl,
             |  CAST(sum(CASE WHEN y <= qy10 AND x <= qx10 THEN 1
             |    ELSE 0 END) AS BIGINT) AS n_joint_l,
             |  (CAST(sum(CASE WHEN y <= qy10 AND x <= qx10 THEN 1
             |    ELSE 0 END) AS BIGINT) * 1000000)
             |    // CAST(sum(CASE WHEN y <= qy10 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS lambda_l_ppm
             |FROM f CROSS JOIN qx CROSS JOIN qy""".stripMargin)),

    // CLIFF'S DELTA between the experiment arms' per-user spend — the
    // ordinal effect size behind Mann–Whitney (q289): P(X₁>X₀) − P(X₁<X₀)
    // computed EXACTLY from the merged value domain (each arm's counts ×
    // the other's cumulative), never from n₁·n₀ pairs.
    Q("q378_cliffs_delta",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L))
            .as("spend"))
          .withColumn("arm", (col("user_id") % 2).cast("long"))
        val dom = users.groupBy(col("spend"))
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("c1"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("c0"))
        val w = Window.orderBy(col("spend"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val cum = dom
          .withColumn("lt0", coalesce(sum(col("c0")).over(w), lit(0L)))
          .withColumn("lt1", coalesce(sum(col("c1")).over(w), lit(0L)))
        val tot = users.groupBy(col("arm")).agg(count(lit(1)).as("n"))
          .agg(max(when(col("arm") === 1, col("n"))).as("n1"),
            max(when(col("arm") === 0, col("n"))).as("n0"))
        cum.agg(sum(col("c1") * col("lt0")).as("gt"),
          sum(col("c0") * col("lt1")).as("lt"))
          .crossJoin(broadcast(tot))
          .select(col("n1"), col("n0"), col("gt"), col("lt"),
            expr("((gt - lt) * 1000000L) DIV (n1 * n0)").as("delta_ppm"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS spend,
             |    user_id % 2 AS arm
             |  FROM events GROUP BY 1),
             |dom AS (
             |  SELECT spend,
             |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS c1,
             |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS c0
             |  FROM u GROUP BY 1),
             |c AS (
             |  SELECT c1, c0,
             |    COALESCE(CAST(sum(c0) OVER (ORDER BY spend ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
             |      AS lt0,
             |    COALESCE(CAST(sum(c1) OVER (ORDER BY spend ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
             |      AS lt1
             |  FROM dom),
             |t AS (
             |  SELECT CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n1,
             |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS n0
             |  FROM u),
             |g AS (
             |  SELECT CAST(sum(c1 * lt0) AS BIGINT) AS gt,
             |    CAST(sum(c0 * lt1) AS BIGINT) AS lt
             |  FROM c)
             |SELECT n1, n0, gt, lt,
             |  ((gt - lt) * 1000000) // (n1 * n0) AS delta_ppm
             |FROM g CROSS JOIN t""".stripMargin)),

    // 2×2 ODDS RATIO / RELATIVE RISK of conversion by arm — the
    // epidemiology table for the same experiment: cells exact, OR kept
    // as an integer rational (a·d, b·c), RR in ppm per arm. The
    // categorical companion to the continuous DiD (q336).
    Q("q379_odds_ratio",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("conv"))
          .withColumn("arm", (col("user_id") % 2).cast("long"))
        users.agg(
          sum(when(col("arm") === 1 && col("conv") === 1, 1L)
            .otherwise(0L)).as("a"),
          sum(when(col("arm") === 1 && col("conv") === 0, 1L)
            .otherwise(0L)).as("b"),
          sum(when(col("arm") === 0 && col("conv") === 1, 1L)
            .otherwise(0L)).as("c"),
          sum(when(col("arm") === 0 && col("conv") === 0, 1L)
            .otherwise(0L)).as("d"))
          .select(col("a"), col("b"), col("c"), col("d"),
            (col("a") * col("d")).as("or_num"),
            (col("b") * col("c")).as("or_den"),
            expr("(a * 1000000L) DIV (a + b)").as("rate_t_ppm"),
            expr("(c * 1000000L) DIV (c + d)").as("rate_c_ppm"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS conv,
             |    user_id % 2 AS arm
             |  FROM events GROUP BY 1)
             |SELECT
             |  CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS a,
             |  CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS b,
             |  CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS c,
             |  CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS d,
             |  CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT)
             |  * CAST(sum(CASE WHEN arm = 0 AND conv = 0 THEN 1
             |      ELSE 0 END) AS BIGINT) AS or_num,
             |  CAST(sum(CASE WHEN arm = 1 AND conv = 0 THEN 1 ELSE 0 END)
             |    AS BIGINT)
             |  * CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1
             |      ELSE 0 END) AS BIGINT) AS or_den,
             |  (CAST(sum(CASE WHEN arm = 1 AND conv = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000)
             |    // CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS rate_t_ppm,
             |  (CAST(sum(CASE WHEN arm = 0 AND conv = 1 THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000)
             |    // CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS rate_c_ppm
             |FROM u""".stripMargin)),

    // QUANTILE TREATMENT EFFECTS: the p25/p50/p75 of per-user spend per
    // arm (exact, reduced domain per arm) and their differences — where
    // in the distribution the treatment acts, which the mean contrast
    // (q336) averages away. Windows partition by arm over spend values.
    Q("q380_quantile_effects",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase",
            round(col("value") * 100).cast("long")).otherwise(0L))
            .as("spend"))
          .withColumn("arm", (col("user_id") % 2).cast("long"))
        val dom = users.groupBy(col("arm"), col("spend"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.partitionBy(col("arm")).orderBy(col("spend"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = users.groupBy(col("arm")).agg(count(lit(1)).as("n"))
        val qs = dom.withColumn("cum", sum(col("cnt")).over(w))
          .join(broadcast(tot), Seq("arm"))
          .groupBy(col("arm"))
          .agg(
            min(when(col("cum") >= expr("(n + 3) DIV 4"), col("spend")))
              .as("p25"),
            min(when(col("cum") >= expr("(n + 1) DIV 2"), col("spend")))
              .as("p50"),
            min(when(col("cum") >= expr("(3 * n + 3) DIV 4"),
              col("spend"))).as("p75"))
        qs.agg(
          max(when(col("arm") === 1, col("p25"))).as("p25_t"),
          max(when(col("arm") === 0, col("p25"))).as("p25_c"),
          max(when(col("arm") === 1, col("p50"))).as("p50_t"),
          max(when(col("arm") === 0, col("p50"))).as("p50_c"),
          max(when(col("arm") === 1, col("p75"))).as("p75_t"),
          max(when(col("arm") === 0, col("p75"))).as("p75_c"))
          .select(col("p25_t"), col("p25_c"),
            (col("p25_t") - col("p25_c")).as("qte_p25"),
            col("p50_t"), col("p50_c"),
            (col("p50_t") - col("p50_c")).as("qte_p50"),
            col("p75_t"), col("p75_c"),
            (col("p75_t") - col("p75_c")).as("qte_p75"))
      },
      Some("""WITH u AS (
             |  SELECT user_id,
             |    CAST(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS spend,
             |    user_id % 2 AS arm
             |  FROM events GROUP BY 1),
             |dom AS (SELECT arm, spend, CAST(count(*) AS BIGINT) AS cnt
             |        FROM u GROUP BY 1, 2),
             |t AS (SELECT arm, CAST(count(*) AS BIGINT) AS n
             |      FROM u GROUP BY 1),
             |c AS (
             |  SELECT dom.arm, spend, n,
             |    CAST(sum(cnt) OVER (PARTITION BY dom.arm ORDER BY spend
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cum
             |  FROM dom JOIN t ON dom.arm = t.arm),
             |q AS (
             |  SELECT arm,
             |    min(CASE WHEN cum >= (n + 3) // 4 THEN spend END) AS p25,
             |    min(CASE WHEN cum >= (n + 1) // 2 THEN spend END) AS p50,
             |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN spend END)
             |      AS p75
             |  FROM c GROUP BY 1)
             |SELECT
             |  max(CASE WHEN arm = 1 THEN p25 END) AS p25_t,
             |  max(CASE WHEN arm = 0 THEN p25 END) AS p25_c,
             |  max(CASE WHEN arm = 1 THEN p25 END)
             |    - max(CASE WHEN arm = 0 THEN p25 END) AS qte_p25,
             |  max(CASE WHEN arm = 1 THEN p50 END) AS p50_t,
             |  max(CASE WHEN arm = 0 THEN p50 END) AS p50_c,
             |  max(CASE WHEN arm = 1 THEN p50 END)
             |    - max(CASE WHEN arm = 0 THEN p50 END) AS qte_p50,
             |  max(CASE WHEN arm = 1 THEN p75 END) AS p75_t,
             |  max(CASE WHEN arm = 0 THEN p75 END) AS p75_c,
             |  max(CASE WHEN arm = 1 THEN p75 END)
             |    - max(CASE WHEN arm = 0 THEN p75 END) AS qte_p75
             |FROM q""".stripMargin)))
}
