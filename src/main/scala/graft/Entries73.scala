package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-10 batch 6 — sequential monitoring and decision-policy axis:
  * O'Brien–Fleming group-sequential looks (boundary z's as literals from
  * the published K=4 table), inverse-propensity off-policy evaluation
  * (IPS + self-normalized variant, integer-quantized weights), and the
  * Syntetos–Boylan demand-intermittency quadrant. Transcendental-free
  * throughout; every division is guarded or provably nonzero.
  */
object Entries73 {

  /** Two-sided 5% boundaries for K=4 equally-spaced looks from the
    * Lan–DeMets O'Brien–Fleming-TYPE alpha-spending function (Lan &
    * DeMets 1983, Biometrika 70:659-663) — note these are the spending
    * approximation's values, not the classical O'Brien–Fleming
    * c_B·sqrt(K/k) boundaries of Jennison & Turnbull Table 2.3 (which
    * would be 4.049/2.863/2.337/2.024). Micro-quantized literals — no
    * inverse normal CDF runs in-engine. */
  private val obfBoundaryMicro: Map[Int, Long] =
    Map(1 -> 4333000L, 2 -> 2963000L, 3 -> 2359000L, 4 -> 2014000L)

  /** Pooled two-proportion z, shared verbatim: cumulative cells
    * n1,x1,n2,x2 (BIGINT), all-double chain (div/mul/sqrt = bit-exact). */
  private val zStr =
    "(CAST(x1 AS DOUBLE)/n1 - CAST(x2 AS DOUBLE)/n2) / " +
      "sqrt(nullif((CAST(x1 + x2 AS DOUBLE)/(n1 + n2)) * " +
      "(1.0 - CAST(x1 + x2 AS DOUBLE)/(n1 + n2)) * " +
      "(1.0/n1 + 1.0/n2), 0.0))"

  val all: Seq[Q] = Seq(

    // O'BRIEN–FLEMING GROUP-SEQUENTIAL MONITOR: four quarterly looks over
    // 1996, arms split by a deterministic md5 of the order key, metric =
    // share of orders with a returned line. Each look's CUMULATIVE cells
    // come from one conditional aggregation (quarter <= look, a 4-literal
    // cross join — the look dimension is fixed, not data-sized); z is one
    // bit-exact chain; boundaries are published literals. The early-stop
    // discipline q402's SPRT lacks (fixed looks, spent alpha).
    Q("q415_obrien_fleming",
      (s, d) => {
        val base = Tables.orders(s, d)
          .filter(year(col("o_orderdate")) === 1996)
          .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
            .select(col("l_orderkey")).distinct(),
            col("o_orderkey") === col("l_orderkey"), "left")
          .select(
            (conv(substring(md5(col("o_orderkey").cast("string")), 1, 12),
              16, 10).cast("long") % 2L).as("arm"),
            quarter(col("o_orderdate")).as("qtr"),
            when(col("l_orderkey").isNotNull, 1L).otherwise(0L).as("ret"))
        val looks = base.sparkSession.range(1)
          .selectExpr("explode(array(1, 2, 3, 4)) AS look")
        val cells = base.crossJoin(broadcast(looks))
          .filter(col("qtr") <= col("look"))
          .groupBy(col("look")).agg(
            sum(when(col("arm") === 0L, 1L).otherwise(0L)).as("n1"),
            sum(when(col("arm") === 0L, col("ret")).otherwise(0L)).as("x1"),
            sum(when(col("arm") === 1L, 1L).otherwise(0L)).as("n2"),
            sum(when(col("arm") === 1L, col("ret")).otherwise(0L)).as("x2"))
        val boundary = obfBoundaryMicro.map { case (k, b) =>
          s"WHEN look = $k THEN ${b}L"
        }.mkString("CASE ", " ", " END")
        cells.selectExpr("look", "n1", "x1", "n2", "x2",
            s"CAST(floor(($zStr) * 1000000) AS BIGINT) AS z_micro",
            s"$boundary AS boundary_micro")
          .selectExpr("look", "n1", "x1", "n2", "x2", "z_micro",
            "boundary_micro",
            "abs(z_micro) >= boundary_micro AS crossed")
      },
      Some {
        val boundary = obfBoundaryMicro.map { case (k, b) =>
          s"WHEN look = $k THEN $b"
        }.mkString("CASE ", " ", " END")
        s"""WITH base AS (
           |  SELECT ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))
           |      ::BIGINT % 2 AS arm,
           |    quarter(o_orderdate) AS qtr,
           |    CASE WHEN o_orderkey IN (
           |      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
           |      THEN 1 ELSE 0 END AS ret
           |  FROM orders WHERE year(o_orderdate) = 1996),
           |looks AS (SELECT CAST(unnest([1, 2, 3, 4]) AS BIGINT) AS look),
           |cells AS (
           |  SELECT look,
           |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
           |    CAST(sum(CASE WHEN arm = 0 THEN ret ELSE 0 END) AS BIGINT) AS x1,
           |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
           |    CAST(sum(CASE WHEN arm = 1 THEN ret ELSE 0 END) AS BIGINT) AS x2
           |  FROM base CROSS JOIN looks
           |  WHERE qtr <= look
           |  GROUP BY 1)
           |SELECT look, n1, x1, n2, x2,
           |  CAST(floor(($zStr) * 1000000) AS BIGINT) AS z_micro,
           |  $boundary AS boundary_micro,
           |  abs(CAST(floor(($zStr) * 1000000) AS BIGINT))
           |    >= ($boundary) AS crossed
           |FROM cells""".stripMargin
      }),

    // OFF-POLICY EVALUATION (IPS + SNIPS): logged policy = the observed
    // order priority per market segment; target policy = always
    // '1-URGENT'; reward = order revenue cents when no line was returned.
    // Propensities are EXACT segment-level count ratios, so the importance
    // weight 1/p = n_seg/n_seg_a is a ratio of BIGINTs — quantized to
    // milli as an exact integer division BEFORE the sums, keeping both
    // estimators order-free. The counterfactual "what if we always
    // expedited" revenue readout.
    Q("q416_ips_policy_value",
      (s, d) => {
        val rew = Tables.orders(s, d)
          .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
            .select(col("l_orderkey")).distinct(),
            col("o_orderkey") === col("l_orderkey"), "left")
          .join(broadcast(Tables.customer(s, d)
            .select(col("c_custkey"), col("c_mktsegment"))),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("seg"),
            col("o_orderpriority").as("act"),
            when(col("l_orderkey").isNull,
              round(col("o_totalprice") * 100).cast("long"))
              .otherwise(0L).as("r_cents"))
          // persisted: the propensity table and the weighted pass both
          // read rew — each would replay the lineitem distinct + join
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val prop = rew.groupBy(col("seg"), col("act"))
          .agg(count(lit(1)).as("n_seg_a"))
        val segTot = prop.groupBy(col("seg")).agg(sum(col("n_seg_a")).as("n_seg"))
        val weighted = rew
          .join(broadcast(prop), Seq("seg", "act"))
          .join(broadcast(segTot), Seq("seg"))
          .selectExpr("seg", "act", "r_cents",
            "CASE WHEN act = '1-URGENT' THEN (n_seg * 1000) DIV n_seg_a ELSE 0 END AS w_milli")
        weighted.agg(
            count(lit(1)).as("n"),
            sum(when(col("w_milli") > 0L, 1L).otherwise(0L)).as("matched"),
            sum(col("w_milli") * col("r_cents")).as("wr"),
            sum(col("w_milli")).as("w"))
          .selectExpr("n", "matched",
            "wr DIV (n * 1000) AS ips_cents_per_order",
            "CASE WHEN w > 0 THEN wr DIV w ELSE NULL END AS snips_cents")
      },
      Some("""WITH rew AS (
             |  SELECT c_mktsegment AS seg, o_orderpriority AS act,
             |    CASE WHEN o_orderkey IN (
             |      SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
             |      THEN 0
             |      ELSE CAST(round(o_totalprice * 100) AS BIGINT) END
             |      AS r_cents
             |  FROM orders JOIN customer ON o_custkey = c_custkey),
             |prop AS (
             |  SELECT seg, act, CAST(count(*) AS BIGINT) AS n_seg_a
             |  FROM rew GROUP BY 1, 2),
             |segtot AS (
             |  SELECT seg, CAST(sum(n_seg_a) AS BIGINT) AS n_seg
             |  FROM prop GROUP BY 1),
             |weighted AS (
             |  SELECT rew.seg, rew.act, r_cents,
             |    CASE WHEN rew.act = '1-URGENT'
             |      THEN (n_seg * 1000) // n_seg_a ELSE 0 END AS w_milli
             |  FROM rew
             |  JOIN prop ON prop.seg = rew.seg AND prop.act = rew.act
             |  JOIN segtot ON segtot.seg = rew.seg),
             |agg AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN w_milli > 0 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS matched,
             |    CAST(sum(w_milli * r_cents) AS BIGINT) AS wr,
             |    CAST(sum(w_milli) AS BIGINT) AS w
             |  FROM weighted)
             |SELECT n, matched, wr // (n * 1000) AS ips_cents_per_order,
             |  CASE WHEN w > 0 THEN wr // w ELSE NULL END AS snips_cents
             |FROM agg""".stripMargin)),

    // DEMAND-INTERMITTENCY QUADRANT (Syntetos–Boylan): per brand, the
    // average inter-demand interval ADI = calendar weeks / non-zero weeks
    // and CV² of the non-zero weekly sizes — BOTH pure integer ratios
    // (cv2_milli = 1000·n(n·Σx²−(Σx)²)/((n−1)·(Σx)²)) — classified against
    // the published 1.32 / 0.49 cutoffs as milli literals. The CV²
    // numerator runs on 128-bit intermediates (Spark DECIMAL(38,0),
    // DuckDB HUGEINT): per-brand Σx grows ~linearly with SF while nz is
    // calendar-fixed, so n·(n·Σx²−(Σx)²)·1000 exceeds 2^63 past ~sf1 —
    // and DuckDB raises on BIGINT overflow while Spark wraps, so the
    // engines would silently diverge (the q413 remedy; bounded by
    // nz²·(Σx)²·1000 < 1e38 through sf100+). n·Σx² ≥ (Σx)² by
    // Cauchy–Schwarz, so operands stay non-negative and trunc (Spark
    // DIV) agrees with floor (DuckDB //). Decides Croston/SBA vs
    // exponential smoothing upstream of q227/q411.
    Q("q417_intermittency_class",
      (s, d) => {
        val weekly = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            (graft.ops.Relational.epochUs(col("l_shipdate"))
              / lit(604800000000L)).cast("long").as("week"))
          .agg(sum(round(col("l_quantity")).cast("long")).as("x"))
        val span = weekly.agg(
          (max(col("week")) - min(col("week")) + 1L).as("cal_weeks"))
        weekly.filter(col("x") > 0L)
          .groupBy(col("brand")).agg(
            count(lit(1)).as("nz"),
            sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("nz") > 1L)
          .crossJoin(broadcast(span))
          .selectExpr("brand", "nz", "cal_weeks",
            "(cal_weeks * 1000) DIV nz AS adi_milli",
            "CAST((CAST(nz AS DECIMAL(38,0)) * " +
              "(CAST(nz AS DECIMAL(38,0)) * sxx - " +
              "CAST(sx AS DECIMAL(38,0)) * sx) * 1000) DIV " +
              "(CAST(nz - 1 AS DECIMAL(38,0)) * sx * sx) AS BIGINT) " +
              "AS cv2_milli")
          .selectExpr("brand", "nz", "cal_weeks", "adi_milli", "cv2_milli",
            "CASE WHEN adi_milli < 1320 AND cv2_milli < 490 THEN 'smooth' " +
              "WHEN adi_milli >= 1320 AND cv2_milli < 490 THEN 'intermittent' " +
              "WHEN adi_milli < 1320 THEN 'erratic' " +
              "ELSE 'lumpy' END AS demand_class")
      },
      Some("""WITH weekly AS (
             |  SELECT p_brand AS brand,
             |    epoch_us(l_shipdate) // 604800000000 AS week,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |span AS (
             |  SELECT max(week) - min(week) + 1 AS cal_weeks FROM weekly),
             |mom AS (
             |  SELECT brand, CAST(count(*) AS BIGINT) AS nz,
             |    CAST(sum(x) AS BIGINT) AS sx,
             |    CAST(sum(x*x) AS BIGINT) AS sxx
             |  FROM weekly WHERE x > 0 GROUP BY 1),
             |cv AS (
             |  SELECT brand, nz, CAST(cal_weeks AS BIGINT) AS cal_weeks,
             |    (cal_weeks * 1000) // nz AS adi_milli,
             |    CAST((CAST(nz AS HUGEINT) *
             |      (CAST(nz AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx)
             |      * 1000) // (CAST(nz - 1 AS HUGEINT) * sx * sx)
             |      AS BIGINT) AS cv2_milli
             |  FROM mom CROSS JOIN span
             |  WHERE nz > 1)
             |SELECT brand, nz, cal_weeks, adi_milli, cv2_milli,
             |  CASE WHEN adi_milli < 1320 AND cv2_milli < 490 THEN 'smooth'
             |    WHEN adi_milli >= 1320 AND cv2_milli < 490
             |      THEN 'intermittent'
             |    WHEN adi_milli < 1320 THEN 'erratic'
             |    ELSE 'lumpy' END AS demand_class
             |FROM cv""".stripMargin)),

    // MOORE–LEWIS CROSS-ENTROPY-DIFFERENCE SELECTION (Moore & Lewis, ACL
    // 2010 "Intelligent selection of language model training data") — the
    // classic targeted data-selection primitive the curation family was
    // missing: train TWO add-one-smoothed bigram LMs on the train split
    // (IN-domain = the lang='en' documents; OUT = the full pool), then
    // score every test document by its summed per-bigram log-likelihood
    // difference. score_q = Σ(lp_out − lp_in) on q300's 1e-4 integer grid
    // (BIGINT sum, one floored ln per term — the proven cross-engine
    // shape); a doc reading more in-domain than general scores negative,
    // and selection is the integer rational threshold avg < −0.1 nat
    // (score_q < −1000·n_bigrams) — no double sort, no double compare.
    // Scale shape: the corpus is exploded ONCE into a persisted
    // token-position relation feeding both LM builds and the test scoring
    // (q300's census discipline); each LM is two count tables hash-joined
    // against the test bigrams — no driver state, fully partial-aggregable.
    Q("q418_moore_lewis",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sp = graft.ext.TrainPrep.hashSplit(docs, "doc_id")
        val toks = sp
          .withColumn("w", split(col("text"), " "))
          .select(col("doc_id"), col("lang"), col("split"),
            explode(expr(
              "transform(sequence(1, size(w)), " +
                "i -> struct(element_at(w, i) AS w1, " +
                "CASE WHEN i < size(w) THEN element_at(w, i + 1) END AS w2))"))
              .as("bg"))
          .select(col("doc_id"), col("lang"), col("split"),
            col("bg.w1"), col("bg.w2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tr = toks.filter(col("split") === "train")
        def lm(t: org.apache.spark.sql.DataFrame, tag: String) = {
          val c2 = t.filter(col("w2").isNotNull)
            .groupBy(col("w1"), col("w2"))
            .agg(count(lit(1)).as(s"c2_$tag"))
          val c1 = c2.groupBy(col("w1"))
            .agg(sum(col(s"c2_$tag")).as(s"c1_$tag"))
          val v = t.agg(countDistinct(col("w1")).as(s"v_$tag"))
          (c2, c1, v)
        }
        val (c2i, c1i, vi) = lm(tr.filter(col("lang") === "en"), "in")
        val (c2o, c1o, vo) = lm(tr, "out")
        def lpq(c2: org.apache.spark.sql.Column,
                c1: org.apache.spark.sql.Column,
                v: org.apache.spark.sql.Column) =
          floor(log((coalesce(c2, lit(0L)) + 1L).cast("double") /
            (coalesce(c1, lit(0L)) + v).cast("double")) * 1e4).cast("long")
        toks.filter(col("split") === "test" && col("w2").isNotNull)
          .join(c2i, Seq("w1", "w2"), "left")
          .join(c1i, Seq("w1"), "left")
          .join(c2o, Seq("w1", "w2"), "left")
          .join(c1o, Seq("w1"), "left")
          .crossJoin(broadcast(vi)).crossJoin(broadcast(vo))
          .select(col("doc_id"), col("lang"),
            (lpq(col("c2_out"), col("c1_out"), col("v_out")) -
              lpq(col("c2_in"), col("c1_in"), col("v_in"))).as("d_q"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("d_q")).as("score_q"))
          .select(col("doc_id"), col("lang"), col("n_bigrams"),
            col("score_q"),
            (col("score_q") < col("n_bigrams") * lit(-1000L)).as("selected"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, lang, text,
             |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM (SELECT *,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
             |      % 10 AS b FROM documents)),
             |bg AS (
             |  SELECT doc_id, lang, split, w[i] AS w1, w[i + 1] AS w2
             |  FROM (SELECT doc_id, lang, split,
             |          string_split(text, ' ') AS w FROM sp) d,
             |       (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE i <= len(w) - 1),
             |c2i AS (SELECT w1, w2, count(*) AS c2_in FROM bg
             |        WHERE split = 'train' AND lang = 'en' GROUP BY 1, 2),
             |c1i AS (SELECT w1, CAST(sum(c2_in) AS BIGINT) AS c1_in
             |        FROM c2i GROUP BY 1),
             |vi AS (SELECT count(DISTINCT tok) AS v_in FROM (
             |  SELECT unnest(string_split(text, ' ')) AS tok
             |  FROM sp WHERE split = 'train' AND lang = 'en')),
             |c2o AS (SELECT w1, w2, count(*) AS c2_out FROM bg
             |        WHERE split = 'train' GROUP BY 1, 2),
             |c1o AS (SELECT w1, CAST(sum(c2_out) AS BIGINT) AS c1_out
             |        FROM c2o GROUP BY 1),
             |vo AS (SELECT count(DISTINCT tok) AS v_out FROM (
             |  SELECT unnest(string_split(text, ' ')) AS tok
             |  FROM sp WHERE split = 'train')),
             |scored AS (
             |  SELECT bg.doc_id, bg.lang,
             |    CAST(floor(ln(CAST(coalesce(c2o.c2_out, 0) + 1 AS DOUBLE) /
             |        CAST(coalesce(c1o.c1_out, 0) + vo.v_out AS DOUBLE))
             |        * 1e4) AS BIGINT)
             |    - CAST(floor(ln(CAST(coalesce(c2i.c2_in, 0) + 1 AS DOUBLE) /
             |        CAST(coalesce(c1i.c1_in, 0) + vi.v_in AS DOUBLE))
             |        * 1e4) AS BIGINT) AS d_q
             |  FROM bg CROSS JOIN vi CROSS JOIN vo
             |  LEFT JOIN c2i ON bg.w1 = c2i.w1 AND bg.w2 = c2i.w2
             |  LEFT JOIN c1i ON bg.w1 = c1i.w1
             |  LEFT JOIN c2o ON bg.w1 = c2o.w1 AND bg.w2 = c2o.w2
             |  LEFT JOIN c1o ON bg.w1 = c1o.w1
             |  WHERE bg.split = 'test')
             |SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
             |  CAST(sum(d_q) AS BIGINT) AS score_q,
             |  CAST(sum(d_q) AS BIGINT) < CAST(count(*) AS BIGINT) * -1000
             |    AS selected
             |FROM scored GROUP BY 1, 2""".stripMargin)))
}
