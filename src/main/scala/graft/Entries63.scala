package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 7: quantile-forecast evaluation (pinball), empirical-
  * Bayes rate shrinkage, consistent-hash ring resize census, decile lift
  * table, forecast scorecard (WAPE + MASE), and a cold-start census for
  * train/serve splits.
  */
object Entries63 {

  val all: Seq[Q] = Seq(

    // PINBALL (QUANTILE) LOSS of the exact per-priority p90 as a constant
    // quantile forecast: loss×10 = Σ [y>ŷ: 9(y−ŷ); else (ŷ−y)] stays
    // BIGINT end to end. By construction ~10% of mass sits above p90, so
    // the asymmetric penalty is what the spec pins. Evaluation twin of
    // the interval gates (q295/q311) for QUANTILE predictions.
    Q("q357_pinball_loss",
      (s, d) => {
        val fact = Tables.orders(s, d)
          .select(col("o_orderpriority").as("g"),
            round(col("o_totalprice") * 100).cast("long").as("v"))
        val dom = fact.groupBy(col("g"), col("v"))
          .agg(count(lit(1)).as("cnt"))
        val wg = Window.partitionBy(col("g")).orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = fact.groupBy(col("g")).agg(count(lit(1)).as("n"))
        val p90 = dom.withColumn("cum", sum(col("cnt")).over(wg))
          .join(broadcast(tot), Seq("g"))
          .groupBy(col("g"), col("n"))
          .agg(min(when(col("cum") >= expr("(9 * n + 9) DIV 10"), col("v")))
            .as("p90_c"))
        fact.join(broadcast(p90), Seq("g"))
          .groupBy(col("g"), col("n"), col("p90_c"))
          .agg(sum(when(col("v") > col("p90_c"),
            lit(9L) * (col("v") - col("p90_c")))
            .otherwise(col("p90_c") - col("v"))).as("loss10"))
          .select(col("g").as("o_orderpriority"), col("n"), col("p90_c"),
            col("loss10"))
      },
      Some("""WITH f AS (
             |  SELECT o_orderpriority AS g,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders),
             |dom AS (SELECT g, v, CAST(count(*) AS BIGINT) AS cnt
             |        FROM f GROUP BY 1, 2),
             |tot AS (SELECT g, CAST(count(*) AS BIGINT) AS n
             |        FROM f GROUP BY 1),
             |cum AS (
             |  SELECT g, v, CAST(sum(cnt) OVER (PARTITION BY g ORDER BY v
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS cum
             |  FROM dom),
             |p90 AS (
             |  SELECT cum.g, n,
             |    min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
             |      AS p90_c
             |  FROM cum JOIN tot ON cum.g = tot.g GROUP BY 1, 2)
             |SELECT f.g AS o_orderpriority, n, p90_c,
             |  CAST(sum(CASE WHEN v > p90_c THEN 9 * (v - p90_c)
             |           ELSE p90_c - v END) AS BIGINT) AS loss10
             |FROM f JOIN p90 ON f.g = p90.g
             |GROUP BY 1, 2, 3""".stripMargin)),

    // EMPIRICAL-BAYES SHRINKAGE of per-part return rates toward the
    // corpus rate (beta-binomial, method of moments): small-n parts pull
    // hard toward the prior, big-n parts barely move. Cross-part moments
    // are taken on QUANTIZED ppm rates (integer sums — no order-dependent
    // float accumulation); the prior strength is clamped to ≥ 1 when the
    // rate spread is wider than a beta can carry. The missing middle
    // between raw rates and the global mean that every catalog ranking
    // needs.
    Q("q358_eb_shrinkage",
      (s, d) => {
        val parts = Tables.lineitem(s, d)
          .groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("k"))
          .filter(col("n") >= 3)
          .withColumn("r_ppm", expr("(k * 1000000L) DIV n"))
        val mom = parts.agg(count(lit(1)).as("p"),
          sum(col("r_ppm")).as("sr"),
          sum(col("r_ppm") * col("r_ppm")).as("srr"))
        val pD = col("p").cast("double")
        val m = col("sr").cast("double") / pD / 1e6
        val v = (pD * col("srr").cast("double") -
          col("sr").cast("double") * col("sr").cast("double")) /
          (pD * pD) / 1e12
        val strength = greatest(m * (lit(1.0) - m) / v - lit(1.0), lit(1.0))
        parts.crossJoin(broadcast(mom))
          .select(col("l_partkey"), col("n"), col("k"), col("r_ppm"),
            floor((col("k").cast("double") + m * strength) /
              (col("n").cast("double") + strength) * 1e6)
              .cast("long").as("shrunk_ppm"))
      },
      Some("""WITH parts AS (
             |  SELECT l_partkey, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
             |      AS BIGINT) AS k
             |  FROM lineitem GROUP BY 1 HAVING count(*) >= 3),
             |r AS (SELECT *, (k * 1000000) // n AS r_ppm FROM parts),
             |mom AS (SELECT CAST(count(*) AS BIGINT) AS p,
             |          CAST(sum(r_ppm) AS BIGINT) AS sr,
             |          CAST(sum(r_ppm * r_ppm) AS BIGINT) AS srr FROM r)
             |SELECT l_partkey, n, k, r_ppm,
             |  CAST(floor((CAST(k AS DOUBLE)
             |    + (CAST(sr AS DOUBLE) / CAST(p AS DOUBLE) / 1e6)
             |      * greatest((CAST(sr AS DOUBLE) / CAST(p AS DOUBLE) / 1e6)
             |        * (1.0 - CAST(sr AS DOUBLE) / CAST(p AS DOUBLE) / 1e6)
             |        / ((CAST(p AS DOUBLE) * CAST(srr AS DOUBLE)
             |            - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
             |          / (CAST(p AS DOUBLE) * CAST(p AS DOUBLE)) / 1e12)
             |        - 1.0, 1.0)) /
             |    (CAST(n AS DOUBLE)
             |      + greatest((CAST(sr AS DOUBLE) / CAST(p AS DOUBLE) / 1e6)
             |        * (1.0 - CAST(sr AS DOUBLE) / CAST(p AS DOUBLE) / 1e6)
             |        / ((CAST(p AS DOUBLE) * CAST(srr AS DOUBLE)
             |            - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
             |          / (CAST(p AS DOUBLE) * CAST(p AS DOUBLE)) / 1e12)
             |        - 1.0, 1.0)) * 1e6) AS BIGINT) AS shrunk_ppm
             |FROM r CROSS JOIN mom""".stripMargin)),

    // CONSISTENT-HASH RING RESIZE CENSUS: growing 8 → 9 shards, what
    // fraction of keys move under (a) modulo sharding and (b) a 16-vnode
    // hash ring. The measured version of the classic claim (modulo moves
    // ~8/9 of keys, the ring ~1/9): vnode positions are build-time md5
    // literals, the successor lookup a row-local sorted-array probe — the
    // key side is ONE scan-project, no shuffle at all before the final
    // scalar aggregate. Partner to rendezvous hashing (q217).
    Q("q359_ring_resize",
      (s, d) => {
        def h48(c: Column) =
          conv(substring(md5(c), 1, 12), 16, 10).cast("long")
        val keys = Tables.customer(s, d)
          .select(h48(concat(lit("k:"), col("c_custkey"))).as("h"))
        // The ring is 16 vnodes per node — 128/144 BUILD-TIME constants
        // (Scala MD5 of the same "node:n:v" strings Spark's md5 would
        // hash), so the successor lookup is a ROW-LOCAL probe of a sorted
        // literal array: smallest packed (pos·256+node) ≥ h·256, wrapping
        // to the array head. Packing keeps the (pos, node) lexicographic
        // tie-break of a struct-min. Zero joins, zero extra shuffles — the
        // first draft cross-joined keys × vnodes and grouped back by key,
        // which shuffled |keys| rows per ring for what is a scalar
        // function of h (the q402/q406/q414 build-time-constant pattern).
        def md48(sIn: String): Long = {
          val dg = java.security.MessageDigest.getInstance("MD5")
            .digest(sIn.getBytes("UTF-8"))
          var h = 0L; var i = 0
          while (i < 6) { h = (h << 8) | (dg(i) & 0xffL); i += 1 }
          h
        }
        def assign(nNodes: Int, outCol: String): Column = {
          val packed = (for (node <- 0 until nNodes; v <- 0 until 16)
            yield md48(s"node:$node:$v") * 256L + node).sorted
          val arr = array(packed.map(lit): _*)
          (coalesce(
            array_min(filter(arr, p => p >= col("h") * 256L)),
            lit(packed.head)) % 256L).as(outCol)
        }
        keys.select(col("h"), assign(8, "ring8"), assign(9, "ring9"))
          .agg(count(lit(1)).as("n_keys"),
            sum(when(pmod(col("h"), lit(8L)) =!= pmod(col("h"), lit(9L)),
              1L).otherwise(0L)).as("moved_mod"),
            sum(when(col("ring8") =!= col("ring9"), 1L).otherwise(0L))
              .as("moved_ring"))
          .select(col("n_keys"), col("moved_mod"), col("moved_ring"),
            expr("(moved_mod * 1000000L) DIV n_keys").as("mod_ppm"),
            expr("(moved_ring * 1000000L) DIV n_keys").as("ring_ppm"))
      },
      Some("""WITH keys AS (
             |  SELECT ('0x' || substr(md5('k:' || CAST(c_custkey
             |    AS VARCHAR)), 1, 12))::BIGINT AS h
             |  FROM customer),
             |vn AS (
             |  SELECT node, v,
             |    ('0x' || substr(md5('node:' || CAST(node AS VARCHAR)
             |      || ':' || CAST(v AS VARCHAR)), 1, 12))::BIGINT AS pos
             |  FROM (SELECT unnest(range(0, 9)) AS node)
             |  CROSS JOIN (SELECT unnest(range(0, 16)) AS v)),
             |a8 AS (
             |  SELECT h,
             |    COALESCE(
             |      min(CASE WHEN pos >= h THEN pos END),
             |      min(pos)) AS tgt
             |  FROM keys CROSS JOIN vn WHERE node < 8 GROUP BY h),
             |a8n AS (
             |  SELECT a8.h, vn.node AS ring8 FROM a8
             |  JOIN vn ON vn.pos = a8.tgt AND vn.node < 8),
             |a9 AS (
             |  SELECT h,
             |    COALESCE(
             |      min(CASE WHEN pos >= h THEN pos END),
             |      min(pos)) AS tgt
             |  FROM keys CROSS JOIN vn GROUP BY h),
             |a9n AS (
             |  SELECT a9.h, vn.node AS ring9 FROM a9
             |  JOIN vn ON vn.pos = a9.tgt)
             |SELECT CAST(count(*) AS BIGINT) AS n_keys,
             |  CAST(sum(CASE WHEN keys.h % 8 <> keys.h % 9 THEN 1
             |    ELSE 0 END) AS BIGINT) AS moved_mod,
             |  CAST(sum(CASE WHEN ring8 <> ring9 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS moved_ring,
             |  (CAST(sum(CASE WHEN keys.h % 8 <> keys.h % 9 THEN 1
             |    ELSE 0 END) AS BIGINT) * 1000000)
             |    // CAST(count(*) AS BIGINT) AS mod_ppm,
             |  (CAST(sum(CASE WHEN ring8 <> ring9 THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000)
             |    // CAST(count(*) AS BIGINT) AS ring_ppm
             |FROM keys JOIN a8n ON keys.h = a8n.h
             |          JOIN a9n ON keys.h = a9n.h""".stripMargin)),

    // DECILE LIFT TABLE: engagement-score deciles vs purchase response —
    // response rate and cumulative capture per decile, the campaign-
    // targeting view the PR curve (q337) and calibration bins (q183)
    // don't give. Deciles are assigned at the SCORE-BUCKET level (ties
    // stay together, cum boundaries on the reduced score domain), so no
    // per-user global rank exists anywhere.
    Q("q360_lift_table",
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
        // totals are CELL SUMS of the persisted score-level table — the
        // per-user rollup (and the events scan under it) runs once, not
        // once per consumer (plan census r8: 4 scans -> 2)
        val byScore = users.groupBy(col("score"))
          .agg(count(lit(1)).as("nu"), sum(col("label")).as("np"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val wDesc = Window.orderBy(col("score").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val tot = byScore.agg(sum(col("nu")).as("u"),
          sum(col("np")).as("p"))
        byScore
          .withColumn("cum0", coalesce(sum(col("nu")).over(wDesc), lit(0L)))
          .crossJoin(broadcast(tot))
          .withColumn("decile", expr("(cum0 * 10) DIV u + 1"))
          .groupBy(col("decile"))
          .agg(sum(col("nu")).as("n_users"), sum(col("np")).as("n_pos"),
            max(col("u")).as("u"), max(col("p")).as("p"))
          .withColumn("resp_ppm", expr("(n_pos * 1000000L) DIV n_users"))
          .withColumn("cum_pos", sum(col("n_pos")).over(
            Window.orderBy(col("decile"))
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .select(col("decile"), col("n_users"), col("n_pos"),
            col("resp_ppm"),
            expr("(cum_pos * 1000000L) DIV p").as("capture_ppm"))
      },
      Some("""WITH h AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
             |u AS (
             |  SELECT user_id,
             |    CAST(max(CASE WHEN event_type = 'purchase'
             |      AND epoch_us(ts) >= max_us - 604800000000 THEN 1
             |      ELSE 0 END) AS BIGINT) AS label,
             |    CAST(sum(CASE WHEN event_type IN ('view', 'click')
             |      THEN 1 ELSE 0 END) AS BIGINT) AS score
             |  FROM events CROSS JOIN h GROUP BY 1),
             |bs AS (
             |  SELECT score, CAST(count(*) AS BIGINT) AS nu,
             |    CAST(sum(label) AS BIGINT) AS np
             |  FROM u GROUP BY 1),
             |t AS (SELECT CAST(count(*) AS BIGINT) AS uu,
             |        CAST(sum(label) AS BIGINT) AS p FROM u),
             |dc AS (
             |  SELECT score, nu, np,
             |    (COALESCE(CAST(sum(nu) OVER (ORDER BY score DESC
             |       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |       AS BIGINT), 0) * 10) // uu + 1 AS decile,
             |    uu, p
             |  FROM bs CROSS JOIN t),
             |g AS (
             |  SELECT decile, CAST(sum(nu) AS BIGINT) AS n_users,
             |    CAST(sum(np) AS BIGINT) AS n_pos,
             |    max(uu) AS uu, max(p) AS p
             |  FROM dc GROUP BY 1)
             |SELECT decile, n_users, n_pos,
             |  (n_pos * 1000000) // n_users AS resp_ppm,
             |  (CAST(sum(n_pos) OVER (ORDER BY decile ROWS BETWEEN
             |    UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             |    * 1000000) // p AS capture_ppm
             |FROM g""".stripMargin)),

    // FORECAST SCORECARD: WAPE (scale-free, in bp) for the seasonal-naive
    // and naive-1 models on the same monthly eval window, plus MASE
    // (seasonal MAE over naive MAE) — the one-table answer to "is the
    // seasonal model actually better than persistence". All sums BIGINT;
    // MASE is the only double, a ratio of two integer MAE sums.
    Q("q361_forecast_scorecard",
      (s, d) => {
        // persisted (plan census r9): the scorecard self-joins the
        // monthly aggregate three ways (actual, lag-12, lag-1)
        val monthly = Tables.orders(s, d)
          .groupBy(col("o_orderpriority"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("m"))
          .agg(sum(round(col("o_totalprice") * 100).cast("long"))
            .as("rev_c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        monthly.as("a")
          .join(monthly.as("s12"),
            col("a.o_orderpriority") === col("s12.o_orderpriority") &&
              col("s12.m") === col("a.m") - 12)
          .join(monthly.as("n1"),
            col("a.o_orderpriority") === col("n1.o_orderpriority") &&
              col("n1.m") === col("a.m") - 1)
          .select(col("a.o_orderpriority").as("o_orderpriority"),
            col("a.rev_c").as("y"), col("s12.rev_c").as("f12"),
            col("n1.rev_c").as("f1"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_evals"),
            sum(abs(col("y") - col("f12"))).as("ae12"),
            sum(abs(col("y") - col("f1"))).as("ae1"),
            sum(col("y")).as("sy"))
          .select(col("o_orderpriority"), col("n_evals"),
            expr("(ae12 * 10000L) DIV sy").as("wape12_bp"),
            expr("(ae1 * 10000L) DIV sy").as("wape1_bp"),
            floor(col("ae12").cast("double") / col("ae1").cast("double")
              * 1000).cast("long").as("mase_milli"))
      },
      Some("""WITH m AS (
             |  SELECT o_orderpriority,
             |    year(o_orderdate) * 12 + month(o_orderdate) AS m,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_c
             |  FROM orders GROUP BY 1, 2),
             |j AS (
             |  SELECT a.o_orderpriority, a.rev_c AS y,
             |    s12.rev_c AS f12, n1.rev_c AS f1
             |  FROM m a
             |  JOIN m s12 ON a.o_orderpriority = s12.o_orderpriority
             |    AND s12.m = a.m - 12
             |  JOIN m n1 ON a.o_orderpriority = n1.o_orderpriority
             |    AND n1.m = a.m - 1),
             |g AS (
             |  SELECT o_orderpriority,
             |    CAST(count(*) AS BIGINT) AS n_evals,
             |    CAST(sum(abs(y - f12)) AS BIGINT) AS ae12,
             |    CAST(sum(abs(y - f1)) AS BIGINT) AS ae1,
             |    CAST(sum(y) AS BIGINT) AS sy
             |  FROM j GROUP BY 1)
             |SELECT o_orderpriority, n_evals,
             |  (ae12 * 10000) // sy AS wape12_bp,
             |  (ae1 * 10000) // sy AS wape1_bp,
             |  CAST(floor(CAST(ae12 AS DOUBLE) / CAST(ae1 AS DOUBLE)
             |    * 1000) AS BIGINT) AS mase_milli
             |FROM g""".stripMargin)),

    // COLD-START CENSUS at the temporal split point: customers first seen
    // AFTER the midpoint, and the post-period revenue they carry — the
    // number that says how much of serving traffic a model trained on the
    // first half has never seen. Partner to holdout-leakage (q299) and
    // split-audit (q268), which look at the overlap; this counts the gap.
    Q("q362_coldstart_census",
      (s, d) => {
        val o = Tables.orders(s, d)
          .select(col("o_custkey"),
            unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
            round(col("o_totalprice") * 100).cast("long").as("c"))
        val mid = o.agg(((min(col("t")) + max(col("t"))) / lit(2L))
          .cast("long").as("mid"))
        val perCust = o.crossJoin(broadcast(mid))
          .groupBy(col("o_custkey"))
          .agg(min(col("t")).as("first_t"), max(col("mid")).as("mid"),
            sum(when(col("t") >= col("mid"), col("c")).otherwise(0L))
              .as("post_c"))
        perCust
          .filter(col("post_c") > 0L)
          .agg(count(lit(1)).as("n_post_customers"),
            sum(when(col("first_t") >= col("mid"), 1L).otherwise(0L))
              .as("n_cold"),
            sum(col("post_c")).as("post_rev_c"),
            sum(when(col("first_t") >= col("mid"), col("post_c"))
              .otherwise(0L)).as("cold_rev_c"))
          .select(col("n_post_customers"), col("n_cold"),
            col("post_rev_c"), col("cold_rev_c"),
            expr("(n_cold * 1000000L) DIV n_post_customers")
              .as("cold_ppm"),
            expr("(cold_rev_c * 1000000L) DIV post_rev_c")
              .as("cold_rev_ppm"))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, epoch_us(o_orderdate) AS t,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
             |  FROM orders),
             |mid AS (SELECT (min(t) + max(t)) // 2 AS mid FROM o),
             |pc AS (
             |  SELECT o_custkey, min(t) AS first_t, max(mid) AS mid,
             |    CAST(sum(CASE WHEN t >= mid THEN c ELSE 0 END) AS BIGINT)
             |      AS post_c
             |  FROM o CROSS JOIN mid GROUP BY 1)
             |SELECT CAST(count(*) AS BIGINT) AS n_post_customers,
             |  CAST(sum(CASE WHEN first_t >= mid THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_cold,
             |  CAST(sum(post_c) AS BIGINT) AS post_rev_c,
             |  CAST(sum(CASE WHEN first_t >= mid THEN post_c ELSE 0 END)
             |    AS BIGINT) AS cold_rev_c,
             |  (CAST(sum(CASE WHEN first_t >= mid THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
             |    AS cold_ppm,
             |  (CAST(sum(CASE WHEN first_t >= mid THEN post_c ELSE 0 END)
             |    AS BIGINT) * 1000000) // CAST(sum(post_c) AS BIGINT)
             |    AS cold_rev_ppm
             |FROM pc WHERE post_c > 0""".stripMargin)))
}
