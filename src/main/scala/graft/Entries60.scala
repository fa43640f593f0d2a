package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 4: XYZ demand-variability classes, cohort LTV triangle,
  * leave-one-out peer anomaly z-scores, Wald–Wolfowitz runs test, banded
  * Theil–Sen slope with a TWO-PHASE distributed exact median, and Lorenz
  * curve points (the curve behind the q173 Gini scalar).
  *
  * Scale notes: day/week-grain series are calendar-bounded domains — they
  * do not grow with data volume, so windows over them are 100 TB-safe by
  * construction. The Theil–Sen median deliberately avoids a global rank:
  * coarse bucket counts locate the median bucket (tiny cumulative window),
  * then row_number runs only WITHIN that bucket (partitioned).
  */
object Entries60 {

  val all: Seq[Q] = Seq(

    // XYZ DEMAND-VARIABILITY CLASSES (the companion axis to ABC/q174):
    // coefficient of variation of weekly demand per part, zeros included
    // by dividing over the FULL calendar week span (absent weeks
    // contribute 0 to both Σx and Σx², so only the week count W is
    // needed, not a dense grid). The textbook 0.5/1.0 cuts are for smooth
    // demand; this corpus is uniformly intermittent (every part CV ≫ 1,
    // measured 2.9–7.1), so the cuts sit at the intermittent-profile
    // 3.5/4.5 — they are config, not semantics. Census output.
    Q("q339_xyz_classes",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"),
            expr("CAST(datediff(to_date(l_shipdate), '1970-01-01') AS LONG) DIV 7")
              .as("wk"),
            col("l_quantity").cast("long").as("qty"))
        val weeks = li.agg((max(col("wk")) - min(col("wk")) + 1).as("w"))
        val perPartWeek = li.groupBy(col("l_partkey"), col("wk"))
          .agg(sum(col("qty")).as("x"))
        val perPart = perPartWeek.groupBy(col("l_partkey"))
          .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"))
          .crossJoin(broadcast(weeks))
          .withColumn("cv_ppm",
            floor(sqrt(col("w").cast("double") * col("sxx").cast("double")
              - col("sx").cast("double") * col("sx").cast("double"))
              / col("sx").cast("double") * 1e6).cast("long"))
          .withColumn("xyz",
            when(col("cv_ppm") <= 3500000L, "X")
              .when(col("cv_ppm") <= 4500000L, "Y").otherwise("Z"))
        perPart.groupBy(col("xyz"))
          .agg(count(lit(1)).as("n_parts"), sum(col("sx")).as("total_qty"),
            min(col("cv_ppm")).as("cv_ppm_min"),
            max(col("cv_ppm")).as("cv_ppm_max"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey,
             |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) // 7 AS wk,
             |    CAST(l_quantity AS BIGINT) AS qty
             |  FROM lineitem),
             |wks AS (SELECT max(wk) - min(wk) + 1 AS w FROM li),
             |pw AS (SELECT l_partkey, wk, CAST(sum(qty) AS BIGINT) AS x
             |       FROM li GROUP BY 1, 2),
             |pp AS (
             |  SELECT l_partkey, CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM pw GROUP BY 1),
             |cv AS (
             |  SELECT l_partkey, sx,
             |    CAST(floor(sqrt(CAST(w AS DOUBLE) * CAST(sxx AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             |      / CAST(sx AS DOUBLE) * 1e6) AS BIGINT) AS cv_ppm
             |  FROM pp CROSS JOIN wks)
             |SELECT CASE WHEN cv_ppm <= 3500000 THEN 'X'
             |            WHEN cv_ppm <= 4500000 THEN 'Y'
             |            ELSE 'Z' END AS xyz,
             |  CAST(count(*) AS BIGINT) AS n_parts,
             |  CAST(sum(sx) AS BIGINT) AS total_qty,
             |  CAST(min(cv_ppm) AS BIGINT) AS cv_ppm_min,
             |  CAST(max(cv_ppm) AS BIGINT) AS cv_ppm_max
             |FROM cv GROUP BY 1""".stripMargin)),

    // COHORT LTV TRIANGLE: users grouped by first-seen week, purchase
    // revenue laid out by account age (week offset), each cell's share of
    // its cohort's lifetime revenue in ppm. The classic retention-revenue
    // "triangle"; q127 (retention) counts heads, this follows the money.
    // One per-user min, one join back, one (cohort, age) rollup.
    Q("q340_cohort_triangle",
      (s, d) => {
        val ev = Tables.events(s, d)
        // persisted: the per-user cohort map feeds the size census AND the
        // revenue-cell join — each would otherwise replay the events reduce
        val cohorts = ev.groupBy(col("user_id"))
          .agg(expr("min(ts_us) DIV 604800000000L").as("cw"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sizes = cohorts.groupBy(col("cw"))
          .agg(count(lit(1)).as("cohort_users"))
        val cells = ev.filter(col("event_type") === "purchase")
          .join(cohorts, Seq("user_id"))
          .groupBy(col("cw"),
            (expr("ts_us DIV 604800000000L") - col("cw")).as("age_wk"))
          .agg(sum(round(col("value") * 100).cast("long")).as("cents"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val totals = cells.groupBy(col("cw"))
          .agg(sum(col("cents")).as("tot_c"))
        cells.join(broadcast(totals), Seq("cw"))
          .join(broadcast(sizes), Seq("cw"))
          .select(col("cw").as("cohort_week"), col("age_wk"),
            col("cohort_users"), col("cents"),
            expr("CASE WHEN tot_c = 0 THEN 0L ELSE (cents * 1000000L) DIV tot_c END")
              .as("share_ppm"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value
             |  FROM events),
             |co AS (SELECT user_id, min(ts_us) // 604800000000 AS cw
             |       FROM e GROUP BY 1),
             |sz AS (SELECT cw, CAST(count(*) AS BIGINT) AS cohort_users
             |       FROM co GROUP BY 1),
             |cells AS (
             |  SELECT cw, (ts_us // 604800000000) - cw AS age_wk,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS cents
             |  FROM e JOIN co USING (user_id)
             |  WHERE event_type = 'purchase'
             |  GROUP BY 1, 2),
             |t AS (SELECT cw, CAST(sum(cents) AS BIGINT) AS tot_c
             |      FROM cells GROUP BY 1)
             |SELECT cw AS cohort_week, age_wk, cohort_users, cents,
             |  CASE WHEN tot_c = 0 THEN 0
             |       ELSE (cents * 1000000) // tot_c END AS share_ppm
             |FROM cells JOIN t USING (cw) JOIN sz USING (cw)""".stripMargin)),

    // LEAVE-ONE-OUT PEER Z-SCORE: each supplier's revenue against the
    // mean/sd of its nation EXCLUDING ITSELF — the self-masking that
    // keeps a whale from hiding inside statistics it dominates. LOO
    // moments derive algebraically from the group's (n, Σx, Σx²), so the
    // fact table is scanned once; groups under 4 suppliers are dropped
    // (LOO sd undefined). Anomaly family: MAD (q123) and Hampel (q190)
    // are per-series; this is cross-sectional.
    Q("q341_peer_zscore",
      (s, d) => {
        val bySupp = Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            expr("CAST(round(l_extendedprice * 100) AS LONG) DIV 100")
              .as("v"))
          .groupBy(col("l_suppkey")).agg(sum(col("v")).as("x"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
        val gm = bySupp.groupBy(col("s_nationkey"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("n") >= 4)
        val nD = col("n").cast("double")
        val looMean = (col("sx") - col("x")).cast("double") / (nD - 1)
        val looVar = ((col("sxx") - col("x") * col("x")).cast("double")
          - (nD - 1) * looMean * looMean) / (nD - 2)
        bySupp.join(broadcast(gm), Seq("s_nationkey"))
          .select(col("s_nationkey"), col("l_suppkey"), col("x"), col("n"),
            floor((col("x").cast("double") - looMean) / sqrt(looVar)
              * 1000).cast("long").as("z_milli"))
      },
      Some("""WITH bs AS (
             |  SELECT s_nationkey, l_suppkey, CAST(sum(v) AS BIGINT) AS x
             |  FROM (SELECT l_suppkey,
             |          CAST(round(l_extendedprice * 100) AS BIGINT) // 100
             |            AS v
             |        FROM lineitem)
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  GROUP BY 1, 2),
             |gm AS (
             |  SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM bs GROUP BY 1 HAVING count(*) >= 4)
             |SELECT bs.s_nationkey, l_suppkey, x, n,
             |  CAST(floor((CAST(x AS DOUBLE)
             |    - CAST(sx - x AS DOUBLE) / (CAST(n AS DOUBLE) - 1)) /
             |    sqrt((CAST(sxx - x * x AS DOUBLE)
             |      - (CAST(n AS DOUBLE) - 1)
             |        * (CAST(sx - x AS DOUBLE) / (CAST(n AS DOUBLE) - 1))
             |        * (CAST(sx - x AS DOUBLE) / (CAST(n AS DOUBLE) - 1)))
             |      / (CAST(n AS DOUBLE) - 2)) * 1000) AS BIGINT)
             |    AS z_milli
             |FROM bs JOIN gm USING (s_nationkey)""".stripMargin)),

    // WALD–WOLFOWITZ RUNS TEST for randomness of daily revenue around its
    // exact median: too few runs = trending, too many = oscillating. The
    // entire computation lives on the day-grain series (calendar-bounded);
    // ties at the median are dropped per the standard prescription. Joins
    // the drift family (KS q288, MW q289) with a time-ORDER-sensitive
    // test — KS/MW are blind to ordering.
    Q("q342_runs_test",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"))
          .agg(expr("sum(CAST(round(o_totalprice * 100) AS LONG)) DIV 100")
            .as("x"))
        // exact lower/upper-middle median on the day domain
        val wv = Window.orderBy(col("x"), col("day"))
        val ranked = daily.withColumn("rn", row_number().over(wv))
        val cnt = daily.agg(count(lit(1)).as("nd"))
        val med = ranked.crossJoin(broadcast(cnt))
          .filter(col("rn") === expr("(nd + 1) DIV 2"))
          .select(col("x").as("med"))
        val signed = daily.crossJoin(broadcast(med))
          .filter(col("x") =!= col("med"))
          .select(col("day"), (col("x") > col("med")).cast("long").as("s"))
        val wd = Window.orderBy(col("day"))
        val runs = signed
          .withColumn("chg",
            when(lag(col("s"), 1).over(wd).isNull, 1L)
              .when(lag(col("s"), 1).over(wd) =!= col("s"), 1L)
              .otherwise(0L))
          .agg(sum(col("chg")).as("runs"), sum(col("s")).as("n1"),
            sum(lit(1L) - col("s")).as("n2"))
        val n1D = col("n1").cast("double")
        val n2D = col("n2").cast("double")
        val nD = n1D + n2D
        val eR = lit(1.0) + lit(2.0) * n1D * n2D / nD
        val vR = (lit(2.0) * n1D * n2D * (lit(2.0) * n1D * n2D - nD)) /
          (nD * nD * (nD - lit(1.0)))
        runs.select(col("n1"), col("n2"), col("runs"),
          floor((col("runs").cast("double") - eR) / sqrt(vR) * 1000)
            .cast("long").as("z_milli"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) // 100 AS x
             |  FROM orders GROUP BY 1),
             |rk AS (SELECT x, row_number() OVER (ORDER BY x, day) AS rn
             |       FROM daily),
             |c AS (SELECT count(*) AS nd FROM daily),
             |m AS (SELECT x AS med FROM rk CROSS JOIN c
             |      WHERE rn = (nd + 1) // 2),
             |sg AS (
             |  SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS s
             |  FROM daily CROSS JOIN m WHERE x <> med),
             |r AS (
             |  SELECT CAST(sum(CASE WHEN prev IS NULL OR prev <> s THEN 1
             |      ELSE 0 END) AS BIGINT) AS runs,
             |    CAST(sum(s) AS BIGINT) AS n1,
             |    CAST(sum(1 - s) AS BIGINT) AS n2
             |  FROM (SELECT s, lag(s) OVER (ORDER BY day) AS prev FROM sg))
             |SELECT n1, n2, runs,
             |  CAST(floor((CAST(runs AS DOUBLE) - (1.0
             |    + 2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |      / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))) /
             |    sqrt((2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |      * (2.0 * CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
             |        - (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)))) /
             |      ((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
             |       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
             |       * (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 1.0)))
             |    * 1000) AS BIGINT) AS z_milli
             |FROM r""".stripMargin)),

    // BANDED THEIL–SEN TREND: median of pairwise daily-revenue slopes
    // over lags ≤ 30 days (the standard banding that keeps pair count
    // linear in series length). The median itself is TWO-PHASE exact:
    // coarse bucket counts find the middle bucket via a tiny cumulative
    // window, then row_number runs only INSIDE that bucket — no global
    // single-partition rank at any size. Robust-regression counterpart
    // to the OLS slopes of q124/q304.
    Q("q343_theil_sen",
      (s, d) => {
        // persisted: the day-grain reduce feeds both sides of the banded
        // self-join, and the pair relation feeds the bucket counts, the
        // total and the in-bucket rank — six orders scans without caches
        val daily = Tables.orders(s, d)
          .groupBy(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"))
          .agg(expr("sum(CAST(round(o_totalprice * 100) AS LONG)) DIV 100")
            .as("x"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = daily.as("a").join(daily.as("b"),
            col("b.day") > col("a.day") &&
              col("b.day") <= col("a.day") + 30)
          .select(col("a.day").as("d1"), col("b.day").as("d2"),
            // nullif on the day gap: Catalyst pushes the inferred
            // isnotnull(bk) THROUGH this projection into the self-join
            // condition, where it runs on day-equal pairs BEFORE the
            // day>day guard — and Spark 4 ANSI errors even on DOUBLE
            // division by zero. nullif is an identity on every surviving
            // pair, so the oracle needs no change.
            floor((col("b.x") - col("a.x")).cast("double") * 1e6 /
              nullif((col("b.day") - col("a.day")).cast("double"), lit(0.0)))
              .cast("long").as("slope_q"))
          .withColumn("tie", col("d1") * 100000L + col("d2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bucketed = pairs.withColumn("bk",
          floor(col("slope_q").cast("double") / 1e9).cast("long"))
        val bCnt = bucketed.groupBy(col("bk")).agg(count(lit(1)).as("cnt"))
        val wb = Window.orderBy(col("bk"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val bCum = bCnt
          .withColumn("cum0", coalesce(sum(col("cnt")).over(wb), lit(0L)))
        val tot = pairs.agg(count(lit(1)).as("np"))
        val targets = bCum.crossJoin(broadcast(tot))
          .withColumn("k1", expr("(np + 1) DIV 2"))
          .withColumn("k2", expr("np DIV 2 + 1"))
          .filter((col("cum0") < col("k1") &&
            col("k1") <= col("cum0") + col("cnt")) ||
            (col("cum0") < col("k2") &&
              col("k2") <= col("cum0") + col("cnt")))
          .select(col("bk"), col("cum0"), col("k1"), col("k2"), col("np"))
        val wIn = Window.partitionBy(col("bk"))
          .orderBy(col("slope_q"), col("tie"))
        bucketed.join(broadcast(targets), Seq("bk"))
          .withColumn("grank", row_number().over(wIn) + col("cum0"))
          .filter(col("grank") === col("k1") || col("grank") === col("k2"))
          // report BOTH middle order statistics (their mean would hit the
          // Spark-DIV-vs-DuckDB-floor divide on negative sums)
          .agg(max(col("np")).as("n_pairs"),
            min(col("slope_q")).as("med_lo_q"),
            max(col("slope_q")).as("med_hi_q"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) // 100 AS x
             |  FROM orders GROUP BY 1),
             |p AS (
             |  SELECT CAST(floor(CAST(b.x - a.x AS DOUBLE) * 1e6 /
             |      CAST(b.day - a.day AS DOUBLE)) AS BIGINT) AS slope_q,
             |    a.day * 100000 + b.day AS tie
             |  FROM daily a JOIN daily b
             |    ON b.day > a.day AND b.day <= a.day + 30),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS np FROM p),
             |r AS (
             |  SELECT slope_q,
             |    row_number() OVER (ORDER BY slope_q, tie) AS grank
             |  FROM p)
             |SELECT np AS n_pairs,
             |  CAST(min(slope_q) AS BIGINT) AS med_lo_q,
             |  CAST(max(slope_q) AS BIGINT) AS med_hi_q
             |FROM r CROSS JOIN t
             |WHERE grank = (np + 1) // 2 OR grank = np // 2 + 1
             |GROUP BY np""".stripMargin)),

    // LORENZ CURVE POINTS per nation — the distribution behind the q173
    // Gini scalar: at each customer-count decile, the cumulative share of
    // spend in ppm. Windows are partitioned by nation over the
    // per-customer rollup (the q173-accepted shape); decile boundaries
    // pick one row per cell via max(struct), no second pass.
    Q("q344_lorenz_points",
      (s, d) => {
        val perCust = Tables.orders(s, d)
          .select(col("o_custkey"),
            round(col("o_totalprice") * 100).cast("long").as("cents"))
          .groupBy(col("o_custkey")).agg(sum(col("cents")).as("x"))
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_nationkey"))),
            col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy(col("c_nationkey"))
          .orderBy(col("x").asc, col("o_custkey").asc)
        val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wn = Window.partitionBy(col("c_nationkey"))
        perCust
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("cs", sum(col("x")).over(wc))
          .withColumn("n", count(lit(1)).over(wn))
          .withColumn("tot", sum(col("x")).over(wn))
          .withColumn("dec", expr("(i * 10 + n - 1) DIV n"))
          .groupBy(col("c_nationkey"), col("dec"))
          .agg(max(struct(col("i"), col("cs"), col("n"), col("tot")))
            .as("b"))
          .select(col("c_nationkey"), col("dec").as("decile"),
            expr("(b.i * 1000000L) DIV b.n").as("users_ppm"),
            expr("(b.cs * 1000000L) DIV b.tot").as("spend_ppm"))
      },
      Some("""WITH pc AS (
             |  SELECT o_custkey,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS x
             |  FROM orders GROUP BY 1),
             |r AS (
             |  SELECT c.c_nationkey, pc.x, pc.o_custkey,
             |    CAST(row_number() OVER (PARTITION BY c.c_nationkey
             |      ORDER BY pc.x ASC, pc.o_custkey ASC) AS BIGINT) AS i,
             |    CAST(sum(pc.x) OVER (PARTITION BY c.c_nationkey
             |      ORDER BY pc.x ASC, pc.o_custkey ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS BIGINT) AS cs,
             |    CAST(count(*) OVER (PARTITION BY c.c_nationkey)
             |      AS BIGINT) AS n,
             |    CAST(sum(pc.x) OVER (PARTITION BY c.c_nationkey)
             |      AS BIGINT) AS tot
             |  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
             |cell AS (
             |  SELECT c_nationkey, (i * 10 + n - 1) // n AS dec,
             |    i, cs, n, tot,
             |    row_number() OVER (PARTITION BY c_nationkey,
             |      (i * 10 + n - 1) // n ORDER BY i DESC) AS rb
             |  FROM r)
             |SELECT c_nationkey, dec AS decile,
             |  (i * 1000000) // n AS users_ppm,
             |  (cs * 1000000) // tot AS spend_ppm
             |FROM cell WHERE rb = 1""".stripMargin)))
}
