package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 3: rolling-origin forecast backtesting, Neyman optimal
  * stratified allocation, t-closeness (EMD over the ordered sensitive
  * domain — completes the k-anon / l-div privacy triad), difference-in-
  * differences, precision-recall curve points, and a Hilbert space-filling
  * key (the locality-preserving alternative to the q98 Z-order key).
  *
  * The Hilbert unroll is GENERATED once in Scala and emitted to both
  * engines (Column ops for Spark, a CTE chain for DuckDB), so the two
  * sides cannot drift.
  */
object Entries59 {

  // ------------------------------------------------------- Hilbert unroll

  private val HilbertSteps = Seq(128, 64, 32, 16, 8, 4, 2, 1)

  /** xy→d on the 256×256 Hilbert curve, the standard rotate-and-
    * accumulate walk, unrolled over bit planes. Input cols hx, hy in
    * [0, 256); adds hd and consumes hx/hy. All simultaneous-select (the
    * new hx needs the OLD hy), hence withColumns per step. */
  private[graft] def hilbertD(df0: DataFrame): DataFrame =
    HilbertSteps.foldLeft(df0.withColumn("hd", lit(0L))) { (cur, s) =>
      cur
        .withColumns(Map(
          "rx" -> expr(s"CASE WHEN (hx & $s) > 0 THEN 1L ELSE 0L END"),
          "ry" -> expr(s"CASE WHEN (hy & $s) > 0 THEN 1L ELSE 0L END")))
        .withColumns(Map(
          "hx" -> expr(
            s"""CASE WHEN ry = 0
               | THEN (CASE WHEN rx = 1 THEN $s - 1 - hy ELSE hy END)
               | ELSE hx END""".stripMargin.replace("\n", " ")),
          "hy" -> expr(
            s"""CASE WHEN ry = 0
               | THEN (CASE WHEN rx = 1 THEN $s - 1 - hx ELSE hx END)
               | ELSE hy END""".stripMargin.replace("\n", " ")),
          "hd" -> expr(
            s"""hd + $s * $s * (CASE WHEN rx = 0 AND ry = 0 THEN 0
               | WHEN rx = 0 THEN 1 WHEN ry = 0 THEN 3
               | ELSE 2 END)""".stripMargin.replace("\n", " "))))
        .drop("rx", "ry")
    }

  /** The identical walk as a DuckDB CTE chain h0 → h8 (h0 must provide
    * o_orderkey, x, y). */
  private[graft] def hilbertCte: String = {
    val steps = HilbertSteps.zipWithIndex.map { case (s, i) =>
      s"""r$i AS (
         |  SELECT o_orderkey, x, y, hx, hy, hd,
         |    CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END AS rx,
         |    CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END AS ry
         |  FROM h$i),
         |h${i + 1} AS (
         |  SELECT o_orderkey, x, y,
         |    CASE WHEN ry = 0
         |      THEN (CASE WHEN rx = 1 THEN $s - 1 - hy ELSE hy END)
         |      ELSE hx END AS hx,
         |    CASE WHEN ry = 0
         |      THEN (CASE WHEN rx = 1 THEN $s - 1 - hx ELSE hx END)
         |      ELSE hy END AS hy,
         |    hd + $s * $s * (CASE WHEN rx = 0 AND ry = 0 THEN 0
         |      WHEN rx = 0 THEN 1 WHEN ry = 0 THEN 3 ELSE 2 END) AS hd
         |  FROM r$i)""".stripMargin
    }
    steps.mkString(",\n")
  }

  val all: Seq[Q] = Seq(

    // ROLLING-ORIGIN BACKTEST of the seasonal-naive forecaster (the
    // evaluation loop q227 was missing): per priority series at month
    // grain, forecast(t) = actual(t−12), scored on every month with a
    // year-old ancestor. MAE in cents and per-term sMAPE in basis points,
    // all integer (the per-term division is the deterministic part of
    // sMAPE; no float accumulation). The series is the monthly rollup, so
    // the lag join touches |months|·|series| rows regardless of fact size.
    Q("q333_backtest_mae",
      (s, d) => {
        val monthly = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
        monthly.as("a")
          .join(monthly.as("b"),
            col("a.o_orderpriority") === col("b.o_orderpriority") &&
              col("b.m") === col("a.m") - 12)
          .select(col("a.o_orderpriority").as("o_orderpriority"),
            col("a.rev_c").as("act"), col("b.rev_c").as("fc"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_evals"),
            expr("sum(abs(act - fc)) DIV count(1)").as("mae_c"),
            expr("""sum(CASE WHEN act + fc = 0 THEN 0L
                   | ELSE (abs(act - fc) * 10000L) DIV (act + fc)
                   | END) DIV count(1)""".stripMargin.replace("\n", " "))
              .as("smape_bp"))
      },
      Some("""WITH m AS (
             |  SELECT o_orderpriority,
             |    year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_c
             |  FROM orders GROUP BY 1, 2)
             |SELECT a.o_orderpriority,
             |  CAST(count(*) AS BIGINT) AS n_evals,
             |  CAST(sum(abs(a.rev_c - b.rev_c)) AS BIGINT) // count(*)
             |    AS mae_c,
             |  CAST(sum(CASE WHEN a.rev_c + b.rev_c = 0 THEN 0
             |    ELSE (abs(a.rev_c - b.rev_c) * 10000)
             |      // (a.rev_c + b.rev_c) END) AS BIGINT) // count(*)
             |    AS smape_bp
             |FROM m a JOIN m b ON a.o_orderpriority = b.o_orderpriority
             |  AND b.m = a.m - 12
             |GROUP BY 1""".stripMargin)),

    // NEYMAN OPTIMAL ALLOCATION for stratified sampling: n_h ∝ N_h·σ_h.
    // N_h·σ_h = sqrt(n·ΣΣ − Σ²) over integer dollar sums, QUANTIZED to a
    // BIGINT weight before the cross-stratum total, so the denominator is
    // an order-free integer sum (float Σ over strata would be summation-
    // order-dependent). The scale-up of q186's proportional allocation:
    // high-variance strata get oversampled, the map pass stays one scan.
    Q("q334_neyman_alloc",
      (s, d) => {
        val strata = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_linestatus"),
            expr("CAST(round(l_extendedprice * 100) AS LONG) DIV 100")
              .as("v"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n_h"), sum(col("v")).as("sv"),
            sum(col("v") * col("v")).as("svv"))
          .withColumn("wq",
            floor(sqrt(col("n_h").cast("double") *
              col("svv").cast("double") -
              col("sv").cast("double") * col("sv").cast("double")))
              .cast("long"))
        val tot = strata.agg(sum(col("wq")).as("w_tot"))
        strata.crossJoin(broadcast(tot))
          .select(col("l_returnflag"), col("l_linestatus"), col("n_h"),
            col("wq"),
            expr("(wq * 1000000L) DIV w_tot").as("share_ppm"),
            expr("(wq * 10000L) DIV w_tot").as("n_alloc_10k"))
      },
      Some("""WITH st AS (
             |  SELECT l_returnflag, l_linestatus,
             |    CAST(count(*) AS BIGINT) AS n_h,
             |    CAST(sum(v) AS BIGINT) AS sv,
             |    CAST(sum(v * v) AS BIGINT) AS svv
             |  FROM (SELECT l_returnflag, l_linestatus,
             |          CAST(round(l_extendedprice * 100) AS BIGINT) // 100
             |            AS v
             |        FROM lineitem)
             |  GROUP BY 1, 2),
             |w AS (
             |  SELECT *, CAST(floor(sqrt(CAST(n_h AS DOUBLE)
             |    * CAST(svv AS DOUBLE)
             |    - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))) AS BIGINT)
             |    AS wq
             |  FROM st),
             |t AS (SELECT CAST(sum(wq) AS BIGINT) AS w_tot FROM w)
             |SELECT l_returnflag, l_linestatus, n_h, wq,
             |  (wq * 1000000) // w_tot AS share_ppm,
             |  (wq * 10000) // w_tot AS n_alloc_10k
             |FROM w CROSS JOIN t""".stripMargin)),

    // T-CLOSENESS: per QI group (order priority), the Earth Mover's
    // Distance between the group's sensitive-attribute distribution
    // (total-price buckets, an ORDERED domain) and the corpus
    // distribution — EMD on an ordered domain = mean |ΔCDF|, all integer
    // ppm. k-anonymity (q164/q202) bounds re-identification, l-diversity
    // (q294) bounds attribute variety, t-closeness bounds attribute
    // INFERENCE — the triad closes. Windows run over the ≤20-bucket
    // domain per group.
    Q("q335_tcloseness",
      (s, d) => {
        val bucketed = Tables.orders(s, d)
          .select(col("o_orderpriority").as("g"),
            expr("least(19L, CAST(round(o_totalprice * 100) AS LONG) DIV 2500000L)")
              .as("k"))
        // persisted (≤ 100 cells); the grid, the per-group CDF and the
        // overall CDF all derive from it — one orders scan total (the
        // overall marginal is the cell sum over g, identical by algebra)
        val cellCnt = bucketed.groupBy(col("g"), col("k"))
          .agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val grid = cellCnt.select(col("g")).distinct()
          .crossJoin(cellCnt.select(col("k")).distinct())
        val cells = grid.join(cellCnt, Seq("g", "k"), "left")
          .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        val wg = Window.partitionBy(col("g")).orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val gcum = cells
          .withColumn("cum", sum(col("cnt")).over(wg))
          .withColumn("n_g", sum(col("cnt")).over(Window.partitionBy(col("g"))))
          .select(col("g"), col("k"),
            expr("(cum * 1000000L) DIV n_g").as("cum_g_ppm"))
        val overall = cellCnt.groupBy(col("k")).agg(sum(col("cnt")).as("cnt"))
        val wa = Window.orderBy(col("k"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val acum = overall
          .withColumn("cum", sum(col("cnt")).over(wa))
          .withColumn("n_all", sum(col("cnt")).over(
            Window.partitionBy(lit(1))))
          .select(col("k"), expr("(cum * 1000000L) DIV n_all")
            .as("cum_all_ppm"))
        val kCount = overall.agg(count(lit(1)).as("n_k"))
        gcum.join(acum, Seq("k"))
          .groupBy(col("g"))
          .agg(sum(abs(col("cum_g_ppm") - col("cum_all_ppm"))).as("tv"))
          .crossJoin(broadcast(kCount))
          .select(col("g").as("o_orderpriority"),
            expr("tv DIV (n_k - 1)").as("emd_ppm"),
            expr("tv DIV (n_k - 1) <= 200000").as("t02_ok"))
      },
      Some("""WITH b AS (
             |  SELECT o_orderpriority AS g,
             |    least(19, CAST(round(o_totalprice * 100) AS BIGINT)
             |      // 2500000) AS k
             |  FROM orders),
             |cc AS (SELECT g, k, CAST(count(*) AS BIGINT) AS cnt
             |       FROM b GROUP BY 1, 2),
             |grid AS (
             |  SELECT g, k FROM (SELECT DISTINCT g FROM cc)
             |  CROSS JOIN (SELECT DISTINCT k FROM cc)),
             |cells AS (
             |  SELECT grid.g, grid.k, COALESCE(cc.cnt, 0) AS cnt
             |  FROM grid LEFT JOIN cc ON grid.g = cc.g AND grid.k = cc.k),
             |gc AS (
             |  SELECT g, k,
             |    (CAST(sum(cnt) OVER (PARTITION BY g ORDER BY k
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |       AS BIGINT) * 1000000)
             |    // CAST(sum(cnt) OVER (PARTITION BY g) AS BIGINT)
             |      AS cum_g_ppm
             |  FROM cells),
             |oa AS (SELECT k, CAST(count(*) AS BIGINT) AS cnt
             |       FROM b GROUP BY 1),
             |ac AS (
             |  SELECT k,
             |    (CAST(sum(cnt) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED
             |       PRECEDING AND CURRENT ROW) AS BIGINT) * 1000000)
             |    // CAST(sum(cnt) OVER () AS BIGINT) AS cum_all_ppm
             |  FROM oa),
             |nk AS (SELECT CAST(count(*) AS BIGINT) AS n_k FROM oa),
             |tv AS (
             |  SELECT g, CAST(sum(abs(cum_g_ppm - cum_all_ppm)) AS BIGINT)
             |    AS tv
             |  FROM gc JOIN ac USING (k) GROUP BY 1)
             |SELECT g AS o_orderpriority,
             |  tv // (n_k - 1) AS emd_ppm,
             |  tv // (n_k - 1) <= 200000 AS t02_ok
             |FROM tv CROSS JOIN nk""".stripMargin)),

    // DIFFERENCE-IN-DIFFERENCES on purchase value: treatment = odd
    // user_id (the fixture's deterministic assignment idiom), periods
    // split at the corpus time midpoint. All four cell aggregates are
    // integer (cents, counts); the DiD contrast of means is one double
    // chain over eight scalars, reported in milli-cents. The causal-
    // inference step past the raw A/B lift (q258): it nets out the
    // pre-period gap between arms.
    Q("q336_did_estimator",
      (s, d) => {
        val ev = Tables.events(s, d)
        // integer DIV, not `/`: epoch-2024 micros sum to ~3.4e18, past
        // double's 2^53 mantissa — a float midpoint can differ from the
        // oracle's exact // by hundreds of microseconds
        val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2")
          .as("mid_us"))
        val cells = ev.filter(col("event_type") === "purchase")
          .crossJoin(broadcast(mid))
          .select((col("user_id") % 2 === 1).cast("int").as("treat"),
            (col("ts_us") >= col("mid_us")).cast("int").as("post"),
            round(col("value") * 100).cast("long").as("cents"))
          .groupBy(col("treat"), col("post"))
          .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
        val wide = cells.agg(
          max(when(col("treat") === 1 && col("post") === 1, col("s")))
            .as("s_t1"),
          max(when(col("treat") === 1 && col("post") === 1, col("n")))
            .as("n_t1"),
          max(when(col("treat") === 1 && col("post") === 0, col("s")))
            .as("s_t0"),
          max(when(col("treat") === 1 && col("post") === 0, col("n")))
            .as("n_t0"),
          max(when(col("treat") === 0 && col("post") === 1, col("s")))
            .as("s_c1"),
          max(when(col("treat") === 0 && col("post") === 1, col("n")))
            .as("n_c1"),
          max(when(col("treat") === 0 && col("post") === 0, col("s")))
            .as("s_c0"),
          max(when(col("treat") === 0 && col("post") === 0, col("n")))
            .as("n_c0"))
        wide.select(col("s_t1"), col("n_t1"), col("s_t0"), col("n_t0"),
          col("s_c1"), col("n_c1"), col("s_c0"), col("n_c0"),
          floor(((col("s_t1").cast("double") / col("n_t1").cast("double")
            - col("s_t0").cast("double") / col("n_t0").cast("double"))
            - (col("s_c1").cast("double") / col("n_c1").cast("double")
              - col("s_c0").cast("double") / col("n_c0").cast("double")))
            * 1000).cast("long").as("did_millicents"))
      },
      Some("""WITH mid AS (
             |  SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2
             |    AS mid_us
             |  FROM events),
             |cells AS (
             |  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END
             |      AS treat,
             |    CASE WHEN epoch_us(ts) >= mid_us THEN 1 ELSE 0 END
             |      AS post,
             |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
             |      AS s,
             |    CAST(count(*) AS BIGINT) AS n
             |  FROM events CROSS JOIN mid
             |  WHERE event_type = 'purchase'
             |  GROUP BY 1, 2),
             |w AS (
             |  SELECT
             |    max(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s_t1,
             |    max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t1,
             |    max(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s_t0,
             |    max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
             |    max(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s_c1,
             |    max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_c1,
             |    max(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s_c0,
             |    max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0
             |  FROM cells)
             |SELECT s_t1, n_t1, s_t0, n_t0, s_c1, n_c1, s_c0, n_c0,
             |  CAST(floor(((CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)
             |    - CAST(s_t0 AS DOUBLE) / CAST(n_t0 AS DOUBLE))
             |    - (CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)
             |      - CAST(s_c0 AS DOUBLE) / CAST(n_c0 AS DOUBLE)))
             |    * 1000) AS BIGINT) AS did_millicents
             |FROM w""".stripMargin)),

    // PRECISION-RECALL CURVE POINTS: label = purchased in the last 7
    // corpus days, score = engagement count (views+clicks) — one point
    // per DISTINCT SCORE (threshold = "predict positive at score ≥ θ").
    // tp/fp come from a descending cumsum over the score-level
    // aggregation, so the curve costs O(|distinct scores|) after one
    // per-user rollup. Completes the eval family: ROC-AUC (q125),
    // calibration (q183), now the class-imbalance-honest curve.
    Q("q337_pr_points",
      (s, d) => {
        val ev = Tables.events(s, d)
        val horizon = ev.agg(max(col("ts_us")).as("max_us"))
        val users = ev.crossJoin(broadcast(horizon))
          .groupBy(col("user_id"))
          .agg(max(when(col("event_type") === "purchase" &&
            col("ts_us") >= col("max_us") - lit(604800000000L), 1L)
            .otherwise(0L)).as("label"),
            sum(when(col("event_type").isin("view", "click"), 1L)
              .otherwise(0L)).as("score"))
        // p_total is a CELL SUM of the persisted score-level table — one
        // per-user rollup, not one per consumer (plan census r8)
        val byScore = users.groupBy(col("score"))
          .agg(sum(col("label")).as("npos"),
            sum(lit(1L) - col("label")).as("nneg"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wDesc = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val totals = byScore.agg(sum(col("npos")).as("p_total"))
        byScore
          .withColumn("tp", sum(col("npos")).over(wDesc))
          .withColumn("fp", sum(col("nneg")).over(wDesc))
          .crossJoin(broadcast(totals))
          .select(col("score").as("threshold"), col("tp"), col("fp"),
            (col("p_total") - col("tp")).as("fn"),
            expr("(tp * 1000000L) DIV (tp + fp)").as("prec_ppm"),
            expr("(tp * 1000000L) DIV p_total").as("rec_ppm"))
      },
      Some("""WITH h AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
             |u AS (
             |  SELECT user_id,
             |    CAST(max(CASE WHEN event_type = 'purchase'
             |      AND epoch_us(ts) >= max_us - 604800000000 THEN 1
             |      ELSE 0 END) AS BIGINT) AS label,
             |    CAST(sum(CASE WHEN event_type IN ('view', 'click')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS score
             |  FROM events CROSS JOIN h
             |  GROUP BY 1),
             |bs AS (
             |  SELECT score, CAST(sum(label) AS BIGINT) AS npos,
             |    CAST(sum(1 - label) AS BIGINT) AS nneg
             |  FROM u GROUP BY 1),
             |t AS (SELECT CAST(sum(label) AS BIGINT) AS p_total FROM u),
             |c AS (
             |  SELECT score,
             |    CAST(sum(npos) OVER (ORDER BY score DESC ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp,
             |    CAST(sum(nneg) OVER (ORDER BY score DESC ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fp
             |  FROM bs)
             |SELECT score AS threshold, tp, fp, p_total - tp AS fn,
             |  (tp * 1000000) // (tp + fp) AS prec_ppm,
             |  (tp * 1000000) // p_total AS rec_ppm
             |FROM c CROSS JOIN t""".stripMargin)),

    // HILBERT SPACE-FILLING KEY on (customer, order-day): unlike the
    // Z-order key (q98), consecutive Hilbert addresses are always
    // spatially adjacent — strictly better multi-dimensional clustering
    // for range scans at 100 TB. The rotate-and-accumulate walk is
    // unrolled over 8 bit planes at codegen time (pure integer CASE
    // arithmetic — whole-stage codegen keeps it one map pass), and the
    // SAME generated steps are emitted as the oracle's CTE chain.
    Q("q338_hilbert_key",
      (s, d) => {
        val base = Tables.orders(s, d).select(col("o_orderkey"),
          (col("o_custkey") % 256).as("x"),
          (datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long") % 256).as("y"))
        hilbertD(base.withColumn("hx", col("x")).withColumn("hy", col("y")))
          .select(col("o_orderkey"), col("x"), col("y"),
            col("hd").as("hilbert_key"))
      },
      Some(s"""WITH h0 AS (
             |  SELECT o_orderkey,
             |    o_custkey % 256 AS x,
             |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) % 256 AS y,
             |    o_custkey % 256 AS hx,
             |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) % 256 AS hy,
             |    0 AS hd
             |  FROM orders),
             |$hilbertCte
             |SELECT o_orderkey, x, y, CAST(hd AS BIGINT) AS hilbert_key
             |FROM h8""".stripMargin)))
}
