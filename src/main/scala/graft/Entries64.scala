package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q
import graft.ext.Dedup

/** Round-9 batch 8: histogram-intersection similarity, a MEASURED Z-order
  * vs Hilbert locality comparison, hold-out evaluation of the Markov
  * next-event predictor, the dedup threshold-sweep tuning table, Kleinberg-
  * style burst windows, and a 2-D equi-depth grid histogram.
  */
object Entries64 {

  val all: Seq[Q] = Seq(

    // HISTOGRAM INTERSECTION similarity between priority price profiles:
    // HI(P,Q) = Σ_k min(p_k, q_k) over the bucketed distributions, kept
    // in integer ppm shares. The bounded-domain cousin of PSI (q303) and
    // KS (q288): symmetric, in [0,1], zero only on disjoint support. One
    // tiny share table joined to itself on bucket.
    Q("q363_hist_intersect",
      (s, d) => {
        val b = Tables.orders(s, d)
          .select(col("o_orderpriority").as("g"),
            expr("least(19L, CAST(round(o_totalprice * 100) AS LONG) DIV 2500000L)")
              .as("k"))
        // group totals are CELL SUMS of the persisted histogram; shares is
        // persisted for the self-join — uncached, the orders scan replans
        // once per consumer (plan census r8: 4 scans -> 1)
        val cells = b.groupBy(col("g"), col("k"))
          .agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = cells.groupBy(col("g")).agg(sum(col("cnt")).as("n"))
        val shares = cells
          .join(broadcast(tot), Seq("g"))
          .select(col("g"), col("k"),
            expr("(cnt * 1000000L) DIV n").as("s_ppm"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        shares.as("a").join(shares.as("b"),
            col("a.k") === col("b.k") && col("a.g") < col("b.g"))
          .groupBy(col("a.g").as("g1"), col("b.g").as("g2"))
          .agg(sum(least(col("a.s_ppm"), col("b.s_ppm"))).as("hi_ppm"))
      },
      Some("""WITH b AS (
             |  SELECT o_orderpriority AS g,
             |    least(19, CAST(round(o_totalprice * 100) AS BIGINT)
             |      // 2500000) AS k
             |  FROM orders),
             |t AS (SELECT g, CAST(count(*) AS BIGINT) AS n
             |      FROM b GROUP BY 1),
             |sh AS (
             |  SELECT b.g, k, (CAST(count(*) AS BIGINT) * 1000000) // n
             |    AS s_ppm
             |  FROM b JOIN t ON b.g = t.g GROUP BY b.g, k, n)
             |SELECT a.g AS g1, c.g AS g2,
             |  CAST(sum(least(a.s_ppm, c.s_ppm)) AS BIGINT) AS hi_ppm
             |FROM sh a JOIN sh c ON a.k = c.k AND a.g < c.g
             |GROUP BY 1, 2""".stripMargin)),

    // MEASURED CURVE LOCALITY — the experiment behind choosing q338 over
    // q98: for both space-filling keys on the SAME distinct (x, y) cell
    // set, the total and max Manhattan jump between key-consecutive
    // cells. Hilbert's defining property (unit steps on a full grid)
    // should beat Morton's quadrant seams even on sparse data; the spec
    // pins it. Windows run over the ≤ 2^16 distinct-cell domain.
    Q("q364_curve_locality",
      (s, d) => {
        val cells = Tables.orders(s, d)
          .select((col("o_custkey") % 256).as("x"),
            (datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
              .cast("long") % 256).as("y"))
          .distinct()
        val z = cells.withColumn("key",
          graft.ops.ZOrder.zValue(col("x"), col("y")))
          .withColumn("curve", lit("zorder"))
        val h = Entries59.hilbertD(
          cells.withColumn("o_orderkey", col("x") * 256 + col("y"))
            .withColumn("hx", col("x")).withColumn("hy", col("y")))
          .select(col("x"), col("y"), col("hd").as("key"))
          .withColumn("curve", lit("hilbert"))
        val w = Window.partitionBy(col("curve")).orderBy(col("key"))
        z.select(col("curve"), col("x"), col("y"), col("key"))
          .unionByName(h.select(col("curve"), col("x"), col("y"),
            col("key")))
          .withColumn("jump",
            abs(col("x") - lag(col("x"), 1).over(w)) +
              abs(col("y") - lag(col("y"), 1).over(w)))
          .filter(col("jump").isNotNull)
          .groupBy(col("curve"))
          .agg(count(lit(1)).as("n_steps"), sum(col("jump")).as("total_jump"),
            max(col("jump")).as("max_jump"))
      },
      Some(s"""WITH cells AS (
              |  SELECT DISTINCT o_custkey % 256 AS x,
              |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
              |      AS BIGINT) % 256 AS y
              |  FROM orders),
              |h0 AS (
              |  SELECT x * 256 + y AS o_orderkey, x, y, x AS hx, y AS hy,
              |    0 AS hd
              |  FROM cells),
              |${Entries59.hilbertCte},
              |keyed AS (
              |  SELECT 'zorder' AS curve, x, y,
              |    ${graft.ops.ZOrder.zValueSql("x", "y")} AS key
              |  FROM cells
              |  UNION ALL
              |  SELECT 'hilbert', x, y, hd FROM h8),
              |j AS (
              |  SELECT curve,
              |    abs(x - lag(x) OVER (PARTITION BY curve ORDER BY key))
              |    + abs(y - lag(y) OVER (PARTITION BY curve ORDER BY key))
              |      AS jump
              |  FROM keyed)
              |SELECT curve, CAST(count(*) AS BIGINT) AS n_steps,
              |  CAST(sum(jump) AS BIGINT) AS total_jump,
              |  CAST(max(jump) AS BIGINT) AS max_jump
              |FROM j WHERE jump IS NOT NULL
              |GROUP BY 1""".stripMargin)),

    // MARKOV NEXT-EVENT PREDICTOR, EVALUATED: majority next-type per
    // current type learned on the first half of the corpus (by time),
    // accuracy measured on the second half — the held-out eval the raw
    // transition matrix (q126) never gets. Ties in the majority vote
    // break to the lexicographically smallest type (deterministic).
    Q("q365_markov_eval",
      (s, d) => {
        val ev = Tables.events(s, d)
        // integer DIV: epoch-2024 micros sum past 2^53, where a double
        // midpoint would round differently than the oracle's exact //
        val mid = ev.agg(expr("(min(ts_us) + max(ts_us)) DIV 2")
          .as("mid_us"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        // persisted: the (cur, nxt) transition pairs feed the train count
        // table AND the test scoring branch — uncached, the per-user lead
        // window over events replans per split (plan census r8)
        val pairs = ev
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type").as("cur"))
          .withColumn("nxt", lead(col("cur"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .crossJoin(broadcast(mid))
          .withColumn("split",
            when(col("ts_us") < col("mid_us"), "train").otherwise("test"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tr = pairs.filter(col("split") === "train")
          .groupBy(col("cur"), col("nxt")).agg(count(lit(1)).as("cnt"))
        val wm = Window.partitionBy(col("cur"))
          .orderBy(col("cnt").desc, col("nxt").asc)
        val maj = tr
          .withColumn("rk", row_number().over(wm))
          .withColumn("n_train",
            sum(col("cnt")).over(Window.partitionBy(col("cur"))))
          .filter(col("rk") === 1)
          .select(col("cur"), col("nxt").as("pred"), col("n_train"))
        pairs.filter(col("split") === "test")
          .join(broadcast(maj), Seq("cur"))
          .groupBy(col("cur"), col("pred"), col("n_train"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("nxt") === col("pred"), 1L).otherwise(0L))
              .as("n_correct"))
          .select(col("cur"), col("pred"), col("n_train"), col("n_test"),
            col("n_correct"),
            expr("(n_correct * 1000000L) DIV n_test").as("acc_ppm"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
             |    event_type AS cur
             |  FROM events),
             |mid AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid_us
             |        FROM e),
             |p AS (
             |  SELECT user_id, ts_us, cur,
             |    lead(cur) OVER (PARTITION BY user_id
             |      ORDER BY ts_us, event_id) AS nxt
             |  FROM e),
             |sp AS (
             |  SELECT cur, nxt,
             |    CASE WHEN ts_us < mid_us THEN 'train' ELSE 'test' END
             |      AS split
             |  FROM p CROSS JOIN mid WHERE nxt IS NOT NULL),
             |tr AS (SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
             |       FROM sp WHERE split = 'train' GROUP BY 1, 2),
             |maj AS (
             |  SELECT cur, nxt AS pred, n_train FROM (
             |    SELECT cur, nxt, cnt,
             |      CAST(sum(cnt) OVER (PARTITION BY cur) AS BIGINT)
             |        AS n_train,
             |      row_number() OVER (PARTITION BY cur
             |        ORDER BY cnt DESC, nxt ASC) AS rk
             |    FROM tr)
             |  WHERE rk = 1)
             |SELECT sp.cur, pred, n_train,
             |  CAST(count(*) AS BIGINT) AS n_test,
             |  CAST(sum(CASE WHEN sp.nxt = pred THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_correct,
             |  (CAST(sum(CASE WHEN sp.nxt = pred THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
             |    AS acc_ppm
             |FROM sp JOIN maj ON sp.cur = maj.cur
             |WHERE split = 'test'
             |GROUP BY 1, 2, 3""".stripMargin)),

    // DEDUP THRESHOLD SWEEP: cumulative exact-Jaccard pair counts at
    // thresholds 0.3 … 0.9 — the tuning table that says what a chosen
    // cutoff would keep, from ONE pass over the exact pair set (the q21
    // inverted-index formulation, never recomputed per threshold).
    Q("q366_threshold_sweep",
      (s, d) => {
        // persisted: the corpus-wide shingle explode feeds the size census
        // and both self-join sides (plan census r8: 4 Generates -> 1)
        val sh = Dedup.shingleIds(Tables.documents(s, d), 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cnt = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val pairs = sh.as("a").join(sh.as("b"),
            col("a.sid") === col("b.sid") &&
              col("a.doc_id") < col("b.doc_id"))
          .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
          .agg(count(lit(1)).as("ix"))
          .join(cnt.select(col("doc_id").as("d1"), col("n").as("na")),
            Seq("d1"))
          .join(cnt.select(col("doc_id").as("d2"), col("n").as("nb")),
            Seq("d2"))
          .select(expr("(ix * 1000000L) DIV (na + nb - ix)").as("j_ppm"))
          .filter(col("j_ppm") >= 300000L)
        val buckets = pairs
          .groupBy((expr("j_ppm DIV 100000L") * 100000L).as("t_ppm"))
          .agg(count(lit(1)).as("cnt"))
        val w = Window.orderBy(col("t_ppm").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        buckets.withColumn("pairs_ge", sum(col("cnt")).over(w))
          .select(col("t_ppm"), col("cnt").as("pairs_in_band"),
            col("pairs_ge"))
      },
      Some(s"""WITH ${ExtEntries.shinglesCte}, ${ExtEntries.shingleIdCte},
              |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              |        FROM shid GROUP BY 1),
              |pr AS (
              |  SELECT a.doc_id AS d1, b.doc_id AS d2,
              |    CAST(count(*) AS BIGINT) AS ix
              |  FROM shid a JOIN shid b
              |    ON a.sid = b.sid AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |j AS (
              |  SELECT (ix * 1000000) // (ca.n + cb.n - ix) AS j_ppm
              |  FROM pr JOIN cnt ca ON d1 = ca.doc_id
              |          JOIN cnt cb ON d2 = cb.doc_id
              |  WHERE (ix * 1000000) // (ca.n + cb.n - ix) >= 300000),
              |bk AS (
              |  SELECT (j_ppm // 100000) * 100000 AS t_ppm,
              |    CAST(count(*) AS BIGINT) AS cnt
              |  FROM j GROUP BY 1)
              |SELECT t_ppm, cnt AS pairs_in_band,
              |  CAST(sum(cnt) OVER (ORDER BY t_ppm DESC ROWS BETWEEN
              |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              |    AS pairs_ge
              |FROM bk""".stripMargin)),

    // BURST WINDOWS (Kleinberg-lite): per event type, maximal runs of
    // HOURS whose event count reaches the exact p95 of that type's
    // active-hour counts — a rate-relative threshold that stays
    // non-degenerate on any traffic shape (a 3×-median alarm never
    // fires on this uniform synthetic corpus). Gaps-and-islands over
    // the bounded hour domain, p95 from the reduced count domain. The
    // alarm-shaped output (burst count, longest burst, hours in burst)
    // the lateness/skew censuses don't give.
    Q("q367_burst_windows",
      (s, d) => {
        // persisted (plan census r9): the p95 domain rollup, the totals
        // and the burst islands all consume the hourly counts
        val mc = Tables.events(s, d)
          .groupBy(col("event_type"),
            expr("ts_us DIV 3600000000L").as("hour"))
          .agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dom = mc.groupBy(col("event_type"), col("cnt"))
          .agg(count(lit(1)).as("m"))
        val wc = Window.partitionBy(col("event_type")).orderBy(col("cnt"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = mc.groupBy(col("event_type"))
          .agg(count(lit(1)).as("nm"))
        val thr = dom.withColumn("cum", sum(col("m")).over(wc))
          .join(broadcast(tot), Seq("event_type"))
          .groupBy(col("event_type"), col("nm"))
          .agg(min(when(col("cum") >= expr("(19 * nm + 19) DIV 20"),
            col("cnt"))).as("p95"))
        val wi = Window.partitionBy(col("event_type"))
          .orderBy(col("hour"))
        val bursts = mc.join(broadcast(thr), Seq("event_type"))
          .filter(col("cnt") >= col("p95"))
          .withColumn("isl",
            col("hour") - row_number().over(wi).cast("long"))
          .groupBy(col("event_type"), col("isl"))
          .agg(count(lit(1)).as("len"))
        bursts.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_bursts"),
            sum(col("len")).as("burst_hours"),
            max(col("len")).as("max_burst_len"))
      },
      Some("""WITH mc AS (
             |  SELECT event_type, epoch_us(ts) // 3600000000 AS hour,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |dom AS (SELECT event_type, cnt, CAST(count(*) AS BIGINT)
             |          AS m
             |        FROM mc GROUP BY 1, 2),
             |tot AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nm
             |        FROM mc GROUP BY 1),
             |th AS (
             |  SELECT dom.event_type,
             |    min(CASE WHEN cum >= (19 * nm + 19) // 20 THEN cnt END)
             |      AS p95
             |  FROM (SELECT event_type, cnt,
             |          CAST(sum(m) OVER (PARTITION BY event_type
             |            ORDER BY cnt ROWS BETWEEN UNBOUNDED PRECEDING
             |            AND CURRENT ROW) AS BIGINT) AS cum
             |        FROM dom) dom
             |  JOIN tot ON dom.event_type = tot.event_type
             |  GROUP BY 1),
             |fl AS (
             |  SELECT mc.event_type, hour,
             |    hour - row_number() OVER (PARTITION BY mc.event_type
             |      ORDER BY hour) AS isl
             |  FROM mc JOIN th ON mc.event_type = th.event_type
             |  WHERE cnt >= p95),
             |b AS (SELECT event_type, isl, CAST(count(*) AS BIGINT)
             |        AS len
             |      FROM fl GROUP BY 1, 2)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_bursts,
             |  CAST(sum(len) AS BIGINT) AS burst_hours,
             |  CAST(max(len) AS BIGINT) AS max_burst_len
             |FROM b GROUP BY 1""".stripMargin)),

    // 2-D EQUI-DEPTH GRID HISTOGRAM over (price, quantity): marginal
    // quartiles on each axis (reduced domains), 16 cells, per-cell count
    // and its deviation from independence in ppm — the joint-statistics
    // upgrade of q309 that a join-cardinality estimator (q319) would
    // consume to fix correlated-predicate misestimates.
    Q("q368_grid_histogram",
      (s, d) => {
        // persisted: two quartile locators (value reduce + count each),
        // the driver count and the final binning pass all read fact
        val fact = Tables.lineitem(s, d)
          .select(round(col("l_extendedprice") * 100).cast("long").as("x"),
            round(col("l_quantity") * 100).cast("long").as("y"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        def quartiles(c: String) = {
          val dom = fact.groupBy(col(c).as("v"))
            .agg(count(lit(1)).as("cnt"))
          val w = Window.orderBy(col("v"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
          val n = fact.agg(count(lit(1)).as("n"))
          dom.withColumn("cum", sum(col("cnt")).over(w))
            .crossJoin(broadcast(n))
            .agg(
              min(when(col("cum") >= expr("(n + 3) DIV 4"), col("v")))
                .as(s"${c}_q1"),
              min(when(col("cum") >= expr("(n + 1) DIV 2"), col("v")))
                .as(s"${c}_q2"),
              min(when(col("cum") >= expr("(3 * n + 3) DIV 4"), col("v")))
                .as(s"${c}_q3"))
        }
        val qx = quartiles("x")
        val qy = quartiles("y")
        val n = fact.count()
        fact.crossJoin(broadcast(qx)).crossJoin(broadcast(qy))
          .select(
            (when(col("x") <= col("x_q1"), 0L)
              .when(col("x") <= col("x_q2"), 1L)
              .when(col("x") <= col("x_q3"), 2L).otherwise(3L)).as("gx"),
            (when(col("y") <= col("y_q1"), 0L)
              .when(col("y") <= col("y_q2"), 1L)
              .when(col("y") <= col("y_q3"), 2L).otherwise(3L)).as("gy"))
          .groupBy(col("gx"), col("gy"))
          .agg(count(lit(1)).as("cnt"))
          .select(col("gx"), col("gy"), col("cnt"),
            expr(s"(cnt * 16L * 1000000L) DIV ${n}L").as("dev_ppm"))
      },
      Some("""WITH f AS (
             |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS x,
             |    CAST(round(l_quantity * 100) AS BIGINT) AS y
             |  FROM lineitem),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM f),
             |dx AS (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
             |       FROM f GROUP BY 1),
             |cx AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN
             |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS cum
             |       FROM dx),
             |qx AS (
             |  SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
             |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS q2,
             |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
             |  FROM cx CROSS JOIN n),
             |dy AS (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
             |       FROM f GROUP BY 1),
             |cy AS (SELECT v, CAST(sum(cnt) OVER (ORDER BY v ROWS BETWEEN
             |         UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |         AS cum
             |       FROM dy),
             |qy AS (
             |  SELECT min(CASE WHEN cum >= (n + 3) // 4 THEN v END) AS q1,
             |    min(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS q2,
             |    min(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS q3
             |  FROM cy CROSS JOIN n)
             |SELECT
             |  CASE WHEN x <= qx.q1 THEN 0 WHEN x <= qx.q2 THEN 1
             |       WHEN x <= qx.q3 THEN 2 ELSE 3 END AS gx,
             |  CASE WHEN y <= qy.q1 THEN 0 WHEN y <= qy.q2 THEN 1
             |       WHEN y <= qy.q3 THEN 2 ELSE 3 END AS gy,
             |  CAST(count(*) AS BIGINT) AS cnt,
             |  (CAST(count(*) AS BIGINT) * 16 * 1000000) // max(n)
             |    AS dev_ppm
             |FROM f CROSS JOIN qx CROSS JOIN qy CROSS JOIN n
             |GROUP BY 1, 2""".stripMargin)))
}
