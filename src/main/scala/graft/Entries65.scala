package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 9: run-length sequence compression, state occupancy,
  * Ljung–Box whiteness diagnostic, the Fisher ideal price index
  * (completing Laspeyres/Paasche), covariate balance via standardized mean
  * differences, and partial correlation (controlling a confounder).
  */
object Entries65 {

  val all: Seq[Q] = Seq(

    // RUN-LENGTH ENCODING census of per-user event-type sequences:
    // n_runs / n_events per user — the sequence-compressibility signal
    // (ratio near 0 = repetitive streaks, near 1 = type churn). One lag
    // window partitioned by user; runs counted as lag-changes.
    Q("q369_rle_sessions",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"))
          .withColumn("chg",
            when(lag(col("event_type"), 1).over(w).isNull, 1L)
              .when(lag(col("event_type"), 1).over(w) =!= col("event_type"),
                1L).otherwise(0L))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), sum(col("chg")).as("n_runs"))
          .withColumn("rle_k", expr("(1000L * n_runs) DIV n_events"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events)
             |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |  CAST(sum(CASE WHEN prev IS NULL OR prev <> event_type
             |    THEN 1 ELSE 0 END) AS BIGINT) AS n_runs,
             |  (1000 * CAST(sum(CASE WHEN prev IS NULL
             |    OR prev <> event_type THEN 1 ELSE 0 END) AS BIGINT))
             |    // CAST(count(*) AS BIGINT) AS rle_k
             |FROM e GROUP BY 1""".stripMargin)),

    // STATE OCCUPANCY: total dwell time per event type, where a user
    // "occupies" the state of their last event until the next one — the
    // state-machine view (seconds per state) that raw event counts
    // misrepresent when types differ in how long they hold. One lead
    // window per user; the census is exact integer seconds.
    Q("q370_state_occupancy",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts_us"), col("event_id"),
            col("event_type"))
          .withColumn("dwell_us", lead(col("ts_us"), 1).over(w)
            - col("ts_us"))
          .filter(col("dwell_us").isNotNull)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_intervals"),
            expr("sum(dwell_us) DIV 1000000L").as("dwell_sec"),
            expr("(sum(dwell_us) DIV count(1)) DIV 1000000L")
              .as("mean_dwell_sec"))
      },
      Some("""WITH e AS (
             |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
             |    lead(epoch_us(ts)) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS nxt
             |  FROM events)
             |SELECT event_type, CAST(count(*) AS BIGINT) AS n_intervals,
             |  CAST(sum(nxt - ts_us) AS BIGINT) // 1000000 AS dwell_sec,
             |  (CAST(sum(nxt - ts_us) AS BIGINT)
             |    // CAST(count(*) AS BIGINT)) // 1000000
             |    AS mean_dwell_sec
             |FROM e WHERE nxt IS NOT NULL GROUP BY 1""".stripMargin)),

    // LJUNG–BOX whiteness statistic over the q325 pairwise-complete
    // daily-revenue ACF, lags 1..7: per-lag terms n(n+2)·ρ_k²/(n−k) are
    // QUANTIZED to integers before summing (order-free), using each
    // lag's own pair count. Large LB = the series is not white noise —
    // the formal gate on q227/q333's forecasting assumptions.
    Q("q371_ljung_box",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"),
            round(col("o_totalprice") * 100).cast("long").as("c"))
          .groupBy(col("day"))
          .agg(expr("sum(c) DIV 1000").as("x"))
        val nd = daily.count()
        val ks = s.range(1, 8).select(col("id").as("k"))
        val pairs = daily.as("a").crossJoin(broadcast(ks))
          .join(daily.as("b"), col("b.day") === col("a.day") - col("k"))
          .select(col("k"), col("a.x").as("xa"), col("b.x").as("xb"))
        val sums = pairs.groupBy(col("k"))
          .agg(count(lit(1)).as("n"),
            sum(col("xa")).as("sx"), sum(col("xb")).as("sy"),
            sum(col("xa") * col("xa")).as("sxx"),
            sum(col("xb") * col("xb")).as("syy"),
            sum(col("xa") * col("xb")).as("sxy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        val rho = (nD * col("sxy").cast("double") - sxD * syD) /
          (sqrt(nD * col("sxx").cast("double") - sxD * sxD) *
            sqrt(nD * col("syy").cast("double") - syD * syD))
        val terms = sums.select(col("k"),
          floor(lit(nd.toDouble) * lit(nd.toDouble + 2.0) * rho * rho /
            (lit(nd.toDouble) - col("k").cast("double")) * 1000)
            .cast("long").as("term_q"))
        terms.agg(count(lit(1)).as("n_lags"),
          sum(col("term_q")).as("lb_milli"))
          .select(lit(nd).as("n_days"), col("n_lags"), col("lb_milli"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) // 1000 AS x
             |  FROM orders GROUP BY 1),
             |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM daily),
             |p AS (
             |  SELECT k, a.x AS xa, b.x AS xb
             |  FROM daily a
             |  CROSS JOIN (SELECT unnest(range(1, 8)) AS k)
             |  JOIN daily b ON b.day = a.day - k),
             |s AS (
             |  SELECT k, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(xa) AS BIGINT) AS sx,
             |    CAST(sum(xb) AS BIGINT) AS sy,
             |    CAST(sum(xa * xa) AS BIGINT) AS sxx,
             |    CAST(sum(xb * xb) AS BIGINT) AS syy,
             |    CAST(sum(xa * xb) AS BIGINT) AS sxy
             |  FROM p GROUP BY 1),
             |t AS (
             |  SELECT k,
             |    CAST(floor(CAST(nd AS DOUBLE) * (CAST(nd AS DOUBLE) + 2.0)
             |      * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             |      * ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |        (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |            - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))
             |      / (CAST(nd AS DOUBLE) - CAST(k AS DOUBLE)) * 1000)
             |      AS BIGINT) AS term_q
             |  FROM s CROSS JOIN nd)
             |SELECT max(nd) AS n_days, CAST(count(*) AS BIGINT) AS n_lags,
             |  CAST(sum(term_q) AS BIGINT) AS lb_milli
             |FROM t CROSS JOIN nd""".stripMargin)),

    // FISHER IDEAL PRICE INDEX between the first and last shipping years:
    // geometric mean of Laspeyres (q279's base-weighted) and Paasche
    // (current-weighted), closing the index-number family. Unit prices
    // are integer floor cents (rev DIV qty) so both engines quantize
    // identically; the only double is the final sqrt of a ppm product.
    Q("q372_fisher_index",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), year(col("l_shipdate")).as("yr"),
            round(col("l_extendedprice") * 100).cast("long").as("rev_c"),
            col("l_quantity").cast("long").as("qty"))
        val yrs = li.agg(min(col("yr")).as("y0"), max(col("yr")).as("y1"))
        val pp = li.crossJoin(broadcast(yrs))
          .filter(col("yr") === col("y0") || col("yr") === col("y1"))
          .groupBy(col("l_partkey"),
            when(col("yr") === col("y0"), 0L).otherwise(1L).as("period"))
          .agg(sum(col("rev_c")).as("rev"), sum(col("qty")).as("q"))
          .withColumn("up_c", expr("rev DIV q"))
        val both = pp.groupBy(col("l_partkey"))
          .agg(max(when(col("period") === 0L, col("up_c"))).as("p0"),
            max(when(col("period") === 0L, col("q"))).as("q0"),
            max(when(col("period") === 1L, col("up_c"))).as("p1"),
            max(when(col("period") === 1L, col("q"))).as("q1"))
          .filter(col("p0").isNotNull && col("p1").isNotNull)
        both.agg(count(lit(1)).as("n_parts"),
          sum(col("p1") * col("q0")).as("l_num"),
          sum(col("p0") * col("q0")).as("l_den"),
          sum(col("p1") * col("q1")).as("p_num"),
          sum(col("p0") * col("q1")).as("p_den"))
          .select(col("n_parts"),
            expr("(l_num * 1000000L) DIV l_den").as("laspeyres_ppm"),
            expr("(p_num * 1000000L) DIV p_den").as("paasche_ppm"),
            floor(sqrt((expr("(l_num * 1000000L) DIV l_den") *
              expr("(p_num * 1000000L) DIV p_den")).cast("double")))
              .cast("long").as("fisher_ppm"))
      },
      Some("""WITH li AS (
             |  SELECT l_partkey, year(l_shipdate) AS yr,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS rev_c,
             |    CAST(l_quantity AS BIGINT) AS qty
             |  FROM lineitem),
             |yrs AS (SELECT min(yr) AS y0, max(yr) AS y1 FROM li),
             |pp AS (
             |  SELECT l_partkey,
             |    CASE WHEN yr = y0 THEN 0 ELSE 1 END AS period,
             |    CAST(sum(rev_c) AS BIGINT) AS rev,
             |    CAST(sum(qty) AS BIGINT) AS q
             |  FROM li CROSS JOIN yrs
             |  WHERE yr = y0 OR yr = y1
             |  GROUP BY 1, 2),
             |up AS (SELECT *, rev // q AS up_c FROM pp),
             |b AS (
             |  SELECT l_partkey,
             |    max(CASE WHEN period = 0 THEN up_c END) AS p0,
             |    max(CASE WHEN period = 0 THEN q END) AS q0,
             |    max(CASE WHEN period = 1 THEN up_c END) AS p1,
             |    max(CASE WHEN period = 1 THEN q END) AS q1
             |  FROM up GROUP BY 1
             |  HAVING max(CASE WHEN period = 0 THEN up_c END) IS NOT NULL
             |    AND max(CASE WHEN period = 1 THEN up_c END) IS NOT NULL),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n_parts,
             |    CAST(sum(p1 * q0) AS BIGINT) AS l_num,
             |    CAST(sum(p0 * q0) AS BIGINT) AS l_den,
             |    CAST(sum(p1 * q1) AS BIGINT) AS p_num,
             |    CAST(sum(p0 * q1) AS BIGINT) AS p_den
             |  FROM b)
             |SELECT n_parts,
             |  (l_num * 1000000) // l_den AS laspeyres_ppm,
             |  (p_num * 1000000) // p_den AS paasche_ppm,
             |  CAST(floor(sqrt(CAST(((l_num * 1000000) // l_den)
             |    * ((p_num * 1000000) // p_den) AS DOUBLE)))
             |    AS BIGINT) AS fisher_ppm
             |FROM agg""".stripMargin)),

    // COVARIATE BALANCE for the q336 experiment: standardized mean
    // difference of user-level covariates (activity, purchases, spend)
    // between the odd/even arms — |SMD| ≲ 0.1 is the "arms are
    // exchangeable" gate a DiD readout should carry. Integer sums per
    // arm; one double chain per covariate row.
    Q("q373_smd_balance",
      (s, d) => {
        val users = Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("n_purch"),
            sum(when(col("event_type") === "purchase",
              round(col("value") * 100).cast("long")).otherwise(0L))
              .as("spend_c"))
          .withColumn("treat", (col("user_id") % 2 === 1).cast("long"))
        val covs = Seq("n_events", "n_purch", "spend_c")
        covs.map { cv =>
          users.groupBy(col("treat"))
            .agg(count(lit(1)).as("n"), sum(col(cv)).as("sx"),
              sum(col(cv) * col(cv)).as("sxx"))
            .agg(
              max(when(col("treat") === 1, col("n"))).as("n1"),
              max(when(col("treat") === 1, col("sx"))).as("s1"),
              max(when(col("treat") === 1, col("sxx"))).as("ss1"),
              max(when(col("treat") === 0, col("n"))).as("n0"),
              max(when(col("treat") === 0, col("sx"))).as("s0"),
              max(when(col("treat") === 0, col("sxx"))).as("ss0"))
            .select(lit(cv).as("covariate"), col("n1"), col("n0"),
              floor((col("s1").cast("double") / col("n1").cast("double")
                - col("s0").cast("double") / col("n0").cast("double")) /
                sqrt((
                  (col("n1").cast("double") * col("ss1").cast("double")
                    - col("s1").cast("double") * col("s1").cast("double")) /
                    (col("n1").cast("double") * col("n1").cast("double"))
                    + (col("n0").cast("double") * col("ss0").cast("double")
                    - col("s0").cast("double") * col("s0").cast("double")) /
                    (col("n0").cast("double") * col("n0").cast("double"))
                  ) / lit(2.0)) * 1000).cast("long").as("smd_milli"))
        }.reduce(_.unionByName(_))
      },
      Some("""WITH u AS (
             |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
             |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1
             |      ELSE 0 END) AS BIGINT) AS n_purch,
             |    CAST(sum(CASE WHEN event_type = 'purchase'
             |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END)
             |      AS BIGINT) AS spend_c,
             |    CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat
             |  FROM events GROUP BY 1),
             |l AS (
             |  SELECT covariate, treat,
             |    CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x * x) AS BIGINT) AS sxx
             |  FROM (
             |    SELECT treat, 'n_events' AS covariate, n_events AS x
             |    FROM u
             |    UNION ALL
             |    SELECT treat, 'n_purch', n_purch FROM u
             |    UNION ALL
             |    SELECT treat, 'spend_c', spend_c FROM u)
             |  GROUP BY 1, 2),
             |w AS (
             |  SELECT covariate,
             |    max(CASE WHEN treat = 1 THEN n END) AS n1,
             |    max(CASE WHEN treat = 1 THEN sx END) AS s1,
             |    max(CASE WHEN treat = 1 THEN sxx END) AS ss1,
             |    max(CASE WHEN treat = 0 THEN n END) AS n0,
             |    max(CASE WHEN treat = 0 THEN sx END) AS s0,
             |    max(CASE WHEN treat = 0 THEN sxx END) AS ss0
             |  FROM l GROUP BY 1)
             |SELECT covariate, n1, n0,
             |  CAST(floor((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
             |    - CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) /
             |    sqrt(((CAST(n1 AS DOUBLE) * CAST(ss1 AS DOUBLE)
             |        - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
             |        (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE))
             |      + (CAST(n0 AS DOUBLE) * CAST(ss0 AS DOUBLE)
             |        - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE)) /
             |        (CAST(n0 AS DOUBLE) * CAST(n0 AS DOUBLE))) / 2.0)
             |    * 1000) AS BIGINT) AS smd_milli
             |FROM w""".stripMargin)),

    // PARTIAL CORRELATION of price and quantity CONTROLLING discount:
    // r_xy·z from the three pairwise Pearsons, all ten sufficient
    // statistics gathered in ONE aggregate pass over the fact table
    // (dollars/qty/discount-% integer grains keep Σx² under 2^63).
    // Near-zero partial with nonzero marginals = the confounder test.
    Q("q374_partial_corr",
      (s, d) => {
        val f = Tables.lineitem(s, d).select(
          expr("CAST(round(l_extendedprice * 100) AS LONG) DIV 100")
            .as("x"),
          col("l_quantity").cast("long").as("y"),
          round(col("l_discount") * 100).cast("long").as("z"))
        val t = f.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("z")).as("sz"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("z") * col("z")).as("szz"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("z")).as("sxz"),
          sum(col("y") * col("z")).as("syz"))
        val nD = col("n").cast("double")
        def r(sab: String, sa: String, sb: String, saa: String,
              sbb: String) =
          (nD * col(sab).cast("double") -
            col(sa).cast("double") * col(sb).cast("double")) /
            (sqrt(nD * col(saa).cast("double") -
              col(sa).cast("double") * col(sa).cast("double")) *
              sqrt(nD * col(sbb).cast("double") -
                col(sb).cast("double") * col(sb).cast("double")))
        val rxy = r("sxy", "sx", "sy", "sxx", "syy")
        val rxz = r("sxz", "sx", "sz", "sxx", "szz")
        val ryz = r("syz", "sy", "sz", "syy", "szz")
        t.select(col("n"),
          floor(rxy * 1e9).cast("long").as("rxy_q"),
          floor(rxz * 1e9).cast("long").as("rxz_q"),
          floor(ryz * 1e9).cast("long").as("ryz_q"),
          floor((rxy - rxz * ryz) /
            (sqrt(lit(1.0) - rxz * rxz) * sqrt(lit(1.0) - ryz * ryz))
            * 1e9).cast("long").as("partial_q"))
      },
      Some("""WITH f AS (
             |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) // 100
             |      AS x,
             |    CAST(l_quantity AS BIGINT) AS y,
             |    CAST(round(l_discount * 100) AS BIGINT) AS z
             |  FROM lineitem),
             |t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(y) AS BIGINT) AS sy,
             |    CAST(sum(z) AS BIGINT) AS sz,
             |    CAST(sum(x * x) AS BIGINT) AS sxx,
             |    CAST(sum(y * y) AS BIGINT) AS syy,
             |    CAST(sum(z * z) AS BIGINT) AS szz,
             |    CAST(sum(x * y) AS BIGINT) AS sxy,
             |    CAST(sum(x * z) AS BIGINT) AS sxz,
             |    CAST(sum(y * z) AS BIGINT) AS syz
             |  FROM f),
             |r AS (
             |  SELECT n,
             |    (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS rxy,
             |    (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
             |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS rxz,
             |    (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
             |      - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(szz AS DOUBLE)
             |        - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))) AS ryz
             |  FROM t)
             |SELECT n,
             |  CAST(floor(rxy * 1e9) AS BIGINT) AS rxy_q,
             |  CAST(floor(rxz * 1e9) AS BIGINT) AS rxz_q,
             |  CAST(floor(ryz * 1e9) AS BIGINT) AS ryz_q,
             |  CAST(floor((rxy - rxz * ryz) /
             |    (sqrt(1.0 - rxz * rxz) * sqrt(1.0 - ryz * ryz)) * 1e9)
             |    AS BIGINT) AS partial_q
             |FROM r""".stripMargin)))
}
