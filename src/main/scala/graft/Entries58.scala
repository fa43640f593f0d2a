package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 2: per-dimension SQ8 quantization with measured top-1
  * recall, co-purchase degree assortativity, inter-arrival burstiness
  * (Goh–Barabási), Gini–Simpson behavioral diversity, exact Kendall τ-b on
  * the reduced cell domain, and a discrete-time survival hazard table.
  *
  * Shared discipline: integers end-to-end, one final div/sqrt chain per
  * statistic quantized at 1e9/1e6 — bit-identical across engines. Where a
  * statistic is classically O(n²) (Kendall), it is computed on the joint
  * DISTINCT-VALUE domain (≤ |x-domain|·|y-domain| cells), so cost is
  * data-value-bounded, not row-bounded.
  */
object Entries58 {

  val all: Seq[Q] = Seq(

    // SCALAR QUANTIZATION (per-dimension affine int8) + measured top-1
    // recall: codes = floor((v−min_d)·255/(max_d−min_d)); ground truth =
    // exact L2 on the milli-quantized grid (deterministic, no float-sum
    // ambiguity). Complements q94 (per-VECTOR maxabs int8) and the
    // IVF/PQ/truncation gates (q28/q142/q171): this is the cheapest
    // memory-bound ANN rung — 4 bytes/dim → 1. Probe set is a fixed 1/37
    // slice; corpus side broadcasts only the probes, so the scan stays
    // one pass at any corpus size.
    Q("q327_sq8_recall",
      (s, d) => {
        // persisted (plan census r9): the per-dim limits, the SQ8
        // encoding and the exact re-rank all read the same vectors
        val emb = Tables.embeddings(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val lims = emb
          .select(posexplode(col("embedding")).as(Seq("pos", "v")))
          .groupBy(col("pos"))
          .agg(min(col("v").cast("double")).as("mn"),
            max(col("v").cast("double")).as("mx"))
          .agg(expr("transform(array_sort(collect_list(struct(pos, mn))), t -> t.mn)").as("mns"),
            expr("transform(array_sort(collect_list(struct(pos, mx))), t -> t.mx)").as("mxs"))
        val coded = emb.crossJoin(broadcast(lims)).select(col("vec_id"),
          expr("""transform(sequence(0, 63), i -> CAST(floor(
                 |  (CAST(element_at(embedding, i + 1) AS DOUBLE)
                 |    - element_at(mns, i + 1)) * 255.0D
                 |  / (element_at(mxs, i + 1) - element_at(mns, i + 1)))
                 |  AS BIGINT))""".stripMargin.replace("\n", " "))
            .as("code"),
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0D) AS BIGINT))")
            .as("mq"))
        val probes = coded.filter(col("vec_id") % 37 === 0)
          .select(col("vec_id").as("p_id"), col("code").as("pc"),
            col("mq").as("pm"))
        coded.crossJoin(broadcast(probes))
          .filter(col("vec_id") =!= col("p_id"))
          .select(col("p_id"), col("vec_id").as("cand"),
            expr("aggregate(zip_with(pc, code, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
              .as("d8"),
            expr("aggregate(zip_with(pm, mq, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)")
              .as("dx"))
          .groupBy(col("p_id"))
          .agg(min(struct(col("d8"), col("cand"))).as("b8"),
            min(struct(col("dx"), col("cand"))).as("bx"))
          .select(col("p_id"), col("b8.cand").as("nn_sq8"),
            col("b8.d8").as("d8"), col("bx.cand").as("nn_exact"),
            col("bx.dx").as("dx"),
            (col("b8.cand") === col("bx.cand")).as("hit"))
      },
      Some("""WITH dims AS (
             |  SELECT i, min(CAST(embedding[i] AS DOUBLE)) AS mn,
             |    max(CAST(embedding[i] AS DOUBLE)) AS mx
             |  FROM embeddings
             |  CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
             |  GROUP BY i),
             |lims AS (SELECT list(mn ORDER BY i) AS mns,
             |                list(mx ORDER BY i) AS mxs FROM dims),
             |coded AS (
             |  SELECT vec_id,
             |    list_transform(range(1, 65), i -> CAST(floor(
             |      (CAST(embedding[i] AS DOUBLE) - mns[i]) * 255.0
             |      / (mxs[i] - mns[i])) AS BIGINT)) AS code,
             |    list_transform(embedding,
             |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))
             |      AS mq
             |  FROM embeddings CROSS JOIN lims),
             |pr AS (SELECT vec_id AS p_id, code AS pc, mq AS pm
             |       FROM coded WHERE vec_id % 37 = 0),
             |j AS (
             |  SELECT p_id, vec_id AS cand,
             |    CAST(list_sum(list_transform(range(1, 65),
             |      i -> (pc[i] - code[i]) * (pc[i] - code[i]))) AS BIGINT)
             |      AS d8,
             |    CAST(list_sum(list_transform(range(1, 65),
             |      i -> (pm[i] - mq[i]) * (pm[i] - mq[i]))) AS BIGINT)
             |      AS dx
             |  FROM coded CROSS JOIN pr WHERE vec_id <> p_id),
             |r AS (
             |  SELECT p_id, cand, d8, dx,
             |    row_number() OVER (PARTITION BY p_id ORDER BY d8, cand)
             |      AS r8,
             |    row_number() OVER (PARTITION BY p_id ORDER BY dx, cand)
             |      AS rx
             |  FROM j)
             |SELECT p_id,
             |  max(CASE WHEN r8 = 1 THEN cand END) AS nn_sq8,
             |  max(CASE WHEN r8 = 1 THEN d8 END) AS d8,
             |  max(CASE WHEN rx = 1 THEN cand END) AS nn_exact,
             |  max(CASE WHEN rx = 1 THEN dx END) AS dx,
             |  max(CASE WHEN r8 = 1 THEN cand END)
             |    = max(CASE WHEN rx = 1 THEN cand END) AS hit
             |FROM r GROUP BY 1""".stripMargin)),

    // DEGREE ASSORTATIVITY of the co-purchase graph (Newman 2002): Pearson
    // correlation of endpoint degrees over directed edge instances.
    // Positive = hubs buy with hubs. Edge mining = one self-join on
    // l_orderkey (lines per order is small and bounded) + distinct; the
    // degree map joins back by part key — all key-partitioned shuffles.
    Q("q328_assortativity",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"))
        // persisted: the edge mine (self-join + distinct) feeds the degree
        // map AND the moment pass — without the cache each consumer
        // re-runs the fact self-join (q271 scan-dedup discipline)
        val edges = li.as("a").join(li.as("b"), Seq("l_orderkey"))
          .filter(col("a.l_partkey") < col("b.l_partkey"))
          .select(col("a.l_partkey").as("pa"), col("b.l_partkey").as("pb"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dir = edges.select(col("pa").as("u"), col("pb").as("w"))
          .unionByName(edges.select(col("pb").as("u"), col("pa").as("w")))
        val deg = dir.groupBy(col("u")).agg(count(lit(1)).as("deg"))
        val sums = dir
          .join(deg.select(col("u"), col("deg").as("du")), Seq("u"))
          .join(deg.select(col("u").as("w"), col("deg").as("dw")), Seq("w"))
          .agg(count(lit(1)).as("n"),
            sum(col("du")).as("sx"), sum(col("dw")).as("sy"),
            sum(col("du") * col("du")).as("sxx"),
            sum(col("dw") * col("dw")).as("syy"),
            sum(col("du") * col("dw")).as("sxy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        sums.select(col("n").as("n_directed_edges"),
          floor(((nD * col("sxy").cast("double") - sxD * syD) /
            (sqrt(nD * col("sxx").cast("double") - sxD * sxD) *
              sqrt(nD * col("syy").cast("double") - syD * syD))) * 1e9)
            .cast("long").as("r_q"))
      },
      Some("""WITH e AS (
             |  SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
             |  FROM lineitem a JOIN lineitem b
             |    ON a.l_orderkey = b.l_orderkey
             |   AND a.l_partkey < b.l_partkey),
             |dir AS (SELECT pa AS u, pb AS w FROM e
             |        UNION ALL SELECT pb, pa FROM e),
             |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS deg
             |        FROM dir GROUP BY 1),
             |s AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(du.deg) AS BIGINT) AS sx,
             |    CAST(sum(dw.deg) AS BIGINT) AS sy,
             |    CAST(sum(du.deg * du.deg) AS BIGINT) AS sxx,
             |    CAST(sum(dw.deg * dw.deg) AS BIGINT) AS syy,
             |    CAST(sum(du.deg * dw.deg) AS BIGINT) AS sxy
             |  FROM dir JOIN deg du ON dir.u = du.u
             |           JOIN deg dw ON dir.w = dw.u)
             |SELECT n AS n_directed_edges,
             |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1e9)
             |    AS BIGINT) AS r_q
             |FROM s""".stripMargin)),

    // BURSTINESS (Goh–Barabási B = (σ−μ)/(σ+μ)) of per-user inter-arrival
    // gaps, by event type: −1 = metronome, 0 = Poisson, →1 = bursty. Gaps
    // come from ONE lag window partitioned by (type, user) — thousands of
    // partitions, row-parallel; the B fold is three BIGINT sums (gap
    // minutes: Σgap² ≈ 1e16 at sf0.1, safe) and one sqrt chain.
    Q("q329_burstiness",
      (s, d) => {
        val w = Window.partitionBy(col("event_type"), col("user_id"))
          .orderBy(col("ts_us"), col("event_id"))
        val gaps = Tables.events(s, d)
          .select(col("event_type"), col("user_id"), col("ts_us"),
            col("event_id"))
          .withColumn("gap_m",
            expr("(ts_us - lag(ts_us) OVER (PARTITION BY event_type, user_id ORDER BY ts_us, event_id)) DIV 60000000L"))
          .filter(col("gap_m").isNotNull)
        val sums = gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"), sum(col("gap_m")).as("sg"),
            sum(col("gap_m") * col("gap_m")).as("sgg"))
        val nD = col("n").cast("double")
        val sD = col("sg").cast("double")
        val root = sqrt(nD * col("sgg").cast("double") - sD * sD)
        sums.select(col("event_type"), col("n").as("n_gaps"),
          floor((root - sD) / (root + sD) * 1e9).cast("long").as("b_q"))
      },
      Some("""WITH g AS (
             |  SELECT event_type,
             |    (ts_us - lag(ts_us) OVER (PARTITION BY event_type, user_id
             |       ORDER BY ts_us, event_id)) // 60000000 AS gap_m
             |  FROM (SELECT event_type, user_id, epoch_us(ts) AS ts_us,
             |          event_id FROM events)),
             |s AS (
             |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(gap_m) AS BIGINT) AS sg,
             |    CAST(sum(gap_m * gap_m) AS BIGINT) AS sgg
             |  FROM g WHERE gap_m IS NOT NULL GROUP BY 1)
             |SELECT event_type, n AS n_gaps,
             |  CAST(floor((sqrt(CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)
             |      - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
             |      - CAST(sg AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE)
             |      - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
             |      + CAST(sg AS DOUBLE)) * 1e9) AS BIGINT) AS b_q
             |FROM s""".stripMargin)),

    // GINI–SIMPSON behavioral diversity per user: 1 − Σ(cᵢ/n)², kept
    // integer as 1000 − 1000·Σcᵢ² DIV n². Two hash aggregates, no
    // windows; the per-user event mix in one number (0 = monomaniac,
    // →1 − 1/k = uniform over k types). The no-ln substitute for entropy.
    Q("q330_simpson_diversity",
      (s, d) => {
        val tc = Tables.events(s, d)
          .groupBy(col("user_id"), col("event_type"))
          .agg(count(lit(1)).as("cnt"))
        tc.groupBy(col("user_id"))
          .agg(sum(col("cnt")).as("n"), count(lit(1)).as("k_types"),
            sum(col("cnt") * col("cnt")).as("s2"))
          .select(col("user_id"), col("n"), col("k_types"),
            expr("1000L - (1000L * s2) DIV (n * n)").as("simpson_k"))
      },
      Some("""WITH tc AS (
             |  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS cnt
             |  FROM events GROUP BY 1, 2),
             |u AS (
             |  SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n,
             |    CAST(count(*) AS BIGINT) AS k_types,
             |    CAST(sum(cnt * cnt) AS BIGINT) AS s2
             |  FROM tc GROUP BY 1)
             |SELECT user_id, n, k_types,
             |  1000 - (1000 * s2) // (n * n) AS simpson_k
             |FROM u""".stripMargin)),

    // EXACT KENDALL τ-b between quantity and discount per returnflag —
    // classically O(n²) in rows, here O(|cells|²) on the joint DISTINCT
    // domain (≤ 50·11 cells per group, invariant in row count): concordant
    // /discordant mass from a cell×cell self-join with count products, tie
    // terms from the marginals. The rank-correlation pair with q321:
    // Spearman for continuous, τ-b for heavily-tied discrete columns.
    Q("q331_kendall_tau",
      (s, d) => {
        // persisted: the joint-cell reduce (≤ 50×11 cells per flag) feeds
        // the concordance self-join and three tie-count passes — five
        // fact scans without the cache, one with it
        val cells = Tables.lineitem(s, d)
          .groupBy(col("l_returnflag").as("g"),
            round(col("l_quantity") * 100).cast("long").as("x"),
            round(col("l_discount") * 100).cast("long").as("y"))
          .agg(count(lit(1)).as("cnt"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cd = cells.as("a").join(cells.as("b"),
            col("a.g") === col("b.g") && col("a.x") < col("b.x"))
          .groupBy(col("a.g").as("g"))
          .agg(sum(when(col("a.y") < col("b.y"),
            col("a.cnt") * col("b.cnt")).otherwise(0L)).as("conc"),
            sum(when(col("a.y") > col("b.y"),
              col("a.cnt") * col("b.cnt")).otherwise(0L)).as("disc"))
        val n0 = cells.groupBy(col("g"))
          .agg(sum(col("cnt")).as("n"))
          .select(col("g"), col("n"),
            expr("(n * (n - 1)) DIV 2").as("n0"))
        val n1 = cells.groupBy(col("g"), col("x"))
          .agg(sum(col("cnt")).as("nx"))
          .groupBy(col("g"))
          .agg(sum(expr("(nx * (nx - 1)) DIV 2")).as("n1"))
        val n2 = cells.groupBy(col("g"), col("y"))
          .agg(sum(col("cnt")).as("ny"))
          .groupBy(col("g"))
          .agg(sum(expr("(ny * (ny - 1)) DIV 2")).as("n2"))
        cd.join(n0, Seq("g")).join(n1, Seq("g")).join(n2, Seq("g"))
          .select(col("g").as("l_returnflag"), col("n"), col("conc"),
            col("disc"),
            floor((col("conc") - col("disc")).cast("double") /
              sqrt((col("n0") - col("n1")).cast("double") *
                (col("n0") - col("n2")).cast("double")) * 1e9)
              .cast("long").as("tau_q"))
      },
      Some("""WITH cells AS (
             |  SELECT l_returnflag AS g,
             |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
             |    CAST(round(l_discount * 100) AS BIGINT) AS y,
             |    CAST(count(*) AS BIGINT) AS cnt
             |  FROM lineitem GROUP BY 1, 2, 3),
             |cd AS (
             |  SELECT a.g,
             |    CAST(sum(CASE WHEN a.y < b.y THEN a.cnt * b.cnt
             |             ELSE 0 END) AS BIGINT) AS conc,
             |    CAST(sum(CASE WHEN a.y > b.y THEN a.cnt * b.cnt
             |             ELSE 0 END) AS BIGINT) AS disc
             |  FROM cells a JOIN cells b ON a.g = b.g AND a.x < b.x
             |  GROUP BY 1),
             |m0 AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
             |         (CAST(sum(cnt) AS BIGINT)
             |          * (CAST(sum(cnt) AS BIGINT) - 1)) // 2 AS n0
             |       FROM cells GROUP BY 1),
             |m1 AS (SELECT g, CAST(sum((nx * (nx - 1)) // 2) AS BIGINT)
             |         AS n1
             |       FROM (SELECT g, x, CAST(sum(cnt) AS BIGINT) AS nx
             |             FROM cells GROUP BY 1, 2) GROUP BY 1),
             |m2 AS (SELECT g, CAST(sum((ny * (ny - 1)) // 2) AS BIGINT)
             |         AS n2
             |       FROM (SELECT g, y, CAST(sum(cnt) AS BIGINT) AS ny
             |             FROM cells GROUP BY 1, 2) GROUP BY 1)
             |SELECT cd.g AS l_returnflag, n, conc, disc,
             |  CAST(floor(CAST(conc - disc AS DOUBLE) /
             |    sqrt(CAST(n0 - n1 AS DOUBLE) * CAST(n0 - n2 AS DOUBLE))
             |    * 1e9) AS BIGINT) AS tau_q
             |FROM cd JOIN m0 USING (g) JOIN m1 USING (g)
             |  JOIN m2 USING (g)""".stripMargin)),

    // DISCRETE-TIME SURVIVAL HAZARD TABLE over user lifetimes: per tenure
    // week, the risk set (users surviving ≥ t), observed endings, and
    // right-censored users (still active within 30 days of corpus end —
    // their lifetime is a lower bound, not an ending). hazard_ppm =
    // d·1e6 DIV n_risk is the Kaplan–Meier factor numerator; the risk-set
    // cumsum runs over the ~dozens-row week domain. New family: survival /
    // churn-hazard analytics beside the fixed-horizon label (q15).
    Q("q332_hazard_table",
      (s, d) => {
        val ev = Tables.events(s, d)
        val users = ev.groupBy(col("user_id"))
          .agg(min(col("ts_us")).as("first_us"),
            max(col("ts_us")).as("last_us"))
        val horizon = ev.agg(max(col("ts_us")).as("max_us"))
        val weekly = users.crossJoin(broadcast(horizon))
          .select(expr("(last_us - first_us) DIV 604800000000L").as("week"),
            when(col("last_us") > col("max_us") - lit(2592000000000L), 1L)
              .otherwise(0L).as("cens"))
          .groupBy(col("week"))
          .agg(sum(lit(1) - col("cens")).as("d_events"),
            sum(col("cens")).as("c_censored"))
        val w = Window.orderBy(col("week").desc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        weekly
          .withColumn("n_risk",
            sum(col("d_events") + col("c_censored")).over(w))
          .select(col("week"), col("n_risk"), col("d_events"),
            col("c_censored"),
            expr("(d_events * 1000000L) DIV n_risk").as("hazard_ppm"))
      },
      Some("""WITH u AS (
             |  SELECT user_id, min(epoch_us(ts)) AS first_us,
             |    max(epoch_us(ts)) AS last_us
             |  FROM events GROUP BY 1),
             |h AS (SELECT max(epoch_us(ts)) AS max_us FROM events),
             |wk AS (
             |  SELECT (last_us - first_us) // 604800000000 AS week,
             |    CASE WHEN last_us > max_us - 2592000000000 THEN 1
             |         ELSE 0 END AS cens
             |  FROM u CROSS JOIN h),
             |byw AS (
             |  SELECT week, CAST(sum(1 - cens) AS BIGINT) AS d_events,
             |    CAST(sum(cens) AS BIGINT) AS c_censored
             |  FROM wk GROUP BY 1)
             |SELECT week,
             |  CAST(sum(d_events + c_censored) OVER (ORDER BY week DESC
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS BIGINT) AS n_risk,
             |  d_events, c_censored,
             |  (d_events * 1000000) // CAST(sum(d_events + c_censored)
             |    OVER (ORDER BY week DESC ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS BIGINT) AS hazard_ppm
             |FROM byw""".stripMargin)))
}
