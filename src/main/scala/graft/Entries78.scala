package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 6 — completing three measured-estimator
  * families:
  *
  *  - q448 THETA A-NOT-B: the set-difference estimator that completes the
  *    q427/q433 theta algebra (build/merge/union/intersect → difference).
  *    Unlike the HLL inclusion–exclusion route, the difference is estimated
  *    DIRECTLY from retained samples below θ_d = min(θ_a, θ_b), so the
  *    relative error stays bounded on the RESULT even when the difference
  *    is small relative to the union (the q426 err_ppm pathology).
  *  - q449 HDR HISTOGRAM (log-linear buckets, the HdrHistogram/DDSketch
  *    family): quantile sketch with a FIXED relative-error bound (12.5% =
  *    8 sub-buckets per octave) whose bucket index is EXACT integer
  *    arithmetic — exponent = len(bin(v))−1, sub-bucket = linear split of
  *    the octave — no transcendental, no grid policy needed. Bucket counts
  *    are a commutative monoid: the query builds per-week histograms and
  *    MERGES them (the rollup an engine ships to 1000 executors), then
  *    reads p50/p90/p99 off the merged CDF and gates them against the
  *    exact order statistics (ops/Ranks distributed global rank — no
  *    fact-sized unpartitioned window).
  *  - q450 ROUGE-1/2 F1 on LSH candidate pairs: the n-gram overlap metric
  *    (Lin 2004) as EXACT integer arithmetic — for clipped multiset
  *    overlap o, F1 = 2o/(n1+n2) exactly, so the score needs no P/R
  *    division at all; reported in ppm. Runs on the q23 minhash banding
  *    candidates ONLY (never all-pairs), giving the eval-metric view of
  *    the dedup candidate set: how much literal n-gram overlap each
  *    banding collision actually has.
  *
  * Reference semantics: the reference's dedup/quality jobs stop at
  * signatures (reference jobs/dedup.py:1-60 via SURVEY §2.10); these are
  * the 100 TB extensions the north-star prescribes. All three replay
  * exactly in DuckDB.
  */
object Entries78 {

  /** Theta sample size (matches q427/q433). */
  private val ThetaK = 64

  /** Hash space: contentId is a 48-bit md5 prefix. */
  private val HSpace = 281474976710656L

  /** milli-estimate n/θ · |H|, exact in decimal(38,0). */
  private def thetaEst(n: String, th: String): String =
    s"CAST(CAST($n AS DECIMAL(38,0)) * $HSpace * 1000 DIV $th AS BIGINT)"

  def all: Seq[Q] = Seq(thetaAnotB, hdrHistogram, rougePairs)

  // ---------------------------------------------------------------- q448

  private val thetaAnotB: Q =
    Q("q448_theta_anotb",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(when(col("o_orderpriority") === "1-URGENT", "a")
            .otherwise("b").as("tag"), col("o_custkey"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val h = graft.ext.Dedup.contentId(col("o_custkey").cast("string"))
        val hv = ord.select(col("tag"), h.as("hv")).distinct()
        // per-set k+1 smallest hashes: rn ≤ k+1 over a tag-partitioned
        // window compiles to WindowGroupLimit — each input partition
        // forwards at most k+1 rows per tag (the q427 shape)
        val kept = hv.withColumn("rn", row_number().over(
            Window.partitionBy(col("tag")).orderBy(col("hv").asc)))
          .filter(col("rn") <= ThetaK + 1)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val th = kept.groupBy(col("tag"))
          .agg(coalesce(max(when(col("rn") === ThetaK + 1, col("hv"))),
            lit(HSpace)).as("theta"))
        val ret = kept.join(th, Seq("tag"))
          .filter(col("hv") < col("theta"))
          .select(col("tag"), col("hv"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val thWide = th.agg(
            coalesce(max(when(col("tag") === "a", col("theta"))),
              lit(HSpace)).as("th_a"),
            coalesce(max(when(col("tag") === "b", col("theta"))),
              lit(HSpace)).as("th_b"))
          .withColumn("th_d", least(col("th_a"), col("th_b")))
        val retA = ret.filter(col("tag") === "a").select(col("hv"))
        val retB = ret.filter(col("tag") === "b").select(col("hv"))
        // A\B sketch: A's retained hashes below θ_d that B's sample does
        // not contain (anti join; B entries ≥ θ_d can't collide — a hash
        // below θ_d present in B is by definition in B's retained set,
        // whose threshold θ_b ≥ θ_d)
        def diff(x: DataFrame, y: DataFrame, out: String) =
          x.join(y, Seq("hv"), "left_anti")
            .crossJoin(broadcast(thWide.select(col("th_d"))))
            .filter(col("hv") < col("th_d"))
            .agg(count(lit(1)).as(out))
        val nAb = diff(retA, retB, "n_ab")
        val nBa = diff(retB, retA, "n_ba")
        // exact class counts — the q426 guarded one-row aggregation
        val exact = ord.groupBy(col("o_custkey"))
          .agg(countDistinct(col("tag")).as("nt"), min(col("tag")).as("t0"))
          .select(when(col("nt") === 2, "inter")
            .otherwise(col("t0")).as("cls"))
          .agg(
            coalesce(sum(when(col("cls") === "a", 1L)), lit(0L)).as("xa"),
            coalesce(sum(when(col("cls") === "b", 1L)), lit(0L)).as("xb"))
        thWide.crossJoin(broadcast(nAb)).crossJoin(broadcast(nBa))
          .crossJoin(broadcast(exact))
          .selectExpr("*",
            s"${thetaEst("n_ab", "th_d")} AS eab",
            s"${thetaEst("n_ba", "th_d")} AS eba")
          .selectExpr("stack(2, " +
            "'a_not_b', xa, eab, " +
            "'b_not_a', xb, eba) AS (set_name, n_exact, theta_milli)")
          // sentinel -99999999 for n_exact = 0, NOT nullif->NULL: a NULL
          // would flip this int64 column to float64 in the driver's pandas
          // compare (the q454 convention; ADVICE r12)
          .selectExpr("set_name", "n_exact", "theta_milli",
            "CASE WHEN n_exact = 0 THEN -99999999L ELSE " +
              "abs(theta_milli - n_exact * 1000) * 1000000 DIV " +
              "(n_exact * 1000) END AS err_ppm")
      },
      Some(s"""WITH ord AS MATERIALIZED (
              |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
              |    ELSE 'b' END AS tag, o_custkey
              |  FROM orders
              |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
              |hv AS (
              |  SELECT DISTINCT tag,
              |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))
              |      ::BIGINT AS hv
              |  FROM ord),
              |kept AS MATERIALIZED (
              |  SELECT tag, hv, rn FROM (
              |    SELECT tag, hv, row_number() OVER (PARTITION BY tag
              |      ORDER BY hv ASC) AS rn FROM hv)
              |  WHERE rn <= ${ThetaK + 1}),
              |th AS (
              |  SELECT tag, coalesce(max(CASE WHEN rn = ${ThetaK + 1}
              |    THEN hv END), $HSpace) AS theta
              |  FROM kept GROUP BY 1),
              |ret AS MATERIALIZED (
              |  SELECT k.tag, k.hv FROM kept k JOIN th t ON k.tag = t.tag
              |  WHERE k.hv < t.theta),
              |tw AS (
              |  SELECT *, least(th_a, th_b) AS th_d FROM (
              |    SELECT coalesce(max(CASE WHEN tag = 'a' THEN theta END),
              |        $HSpace) AS th_a,
              |      coalesce(max(CASE WHEN tag = 'b' THEN theta END),
              |        $HSpace) AS th_b
              |    FROM th)),
              |nab AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_ab
              |  FROM ret a CROSS JOIN tw
              |  WHERE a.tag = 'a' AND a.hv < tw.th_d AND NOT EXISTS
              |    (SELECT 1 FROM ret b WHERE b.tag = 'b' AND b.hv = a.hv)),
              |nba AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n_ba
              |  FROM ret a CROSS JOIN tw
              |  WHERE a.tag = 'b' AND a.hv < tw.th_d AND NOT EXISTS
              |    (SELECT 1 FROM ret b WHERE b.tag = 'a' AND b.hv = a.hv)),
              |exa AS (
              |  SELECT CASE WHEN count(DISTINCT tag) = 2 THEN 'inter'
              |    ELSE min(tag) END AS cls
              |  FROM ord GROUP BY o_custkey),
              |xc AS (SELECT
              |    CAST(coalesce(sum(CASE WHEN cls = 'a' THEN 1 END), 0)
              |      AS BIGINT) AS xa,
              |    CAST(coalesce(sum(CASE WHEN cls = 'b' THEN 1 END), 0)
              |      AS BIGINT) AS xb
              |  FROM exa),
              |wide AS (
              |  SELECT *,
              |    CAST(n_ab::HUGEINT * $HSpace * 1000 // th_d AS BIGINT)
              |      AS eab,
              |    CAST(n_ba::HUGEINT * $HSpace * 1000 // th_d AS BIGINT)
              |      AS eba
              |  FROM tw CROSS JOIN nab CROSS JOIN nba CROSS JOIN xc)
              |SELECT set_name, n_exact, theta_milli,
              |  CAST(CASE WHEN n_exact = 0 THEN -99999999 ELSE
              |    abs(theta_milli - n_exact * 1000) * 1000000 //
              |    (n_exact * 1000) END AS BIGINT) AS err_ppm
              |FROM (
              |  SELECT 'a_not_b' AS set_name, xa AS n_exact,
              |    eab AS theta_milli FROM wide
              |  UNION ALL
              |  SELECT 'b_not_a', xb, eba FROM wide)""".stripMargin))

  // ---------------------------------------------------------------- q449

  private val hdrHistogram: Q =
    Q("q449_hdr_histogram",
      (s, d) => {
        // one pruned pass feeds the bucket build AND the exact baseline
        val base = Tables.orders(s, d).selectExpr(
            "datediff(o_orderdate, DATE '1970-01-01') DIV 7 AS wk",
            "CAST(round(o_totalprice * 100) AS BIGINT) AS v")
          .filter(col("v") >= 8L)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // log-linear bucket: exponent from the binary-string length (exact
        // — no log2 double), 8 linear sub-buckets per octave → the value
        // lies in [lb, lb·9/8): ≤ 12.5% relative error by construction
        val weekly = base
          .selectExpr("wk", "CAST(length(bin(v)) - 1 AS INT) AS e", "v")
          .selectExpr("wk", "e",
            "CAST((v - shiftleft(CAST(1 AS BIGINT), e)) * 8 DIV " +
              "shiftleft(CAST(1 AS BIGINT), e) AS INT) AS sub")
          .groupBy(col("wk"), col("e"), col("sub"))
          .agg(count(lit(1)).as("c"))
        // the MERGE: weekly histograms sum into the global one — counts
        // are a commutative monoid, the shape a 1000-executor rollup ships
        val merged = weekly.groupBy(col("e"), col("sub"))
          .agg(sum(col("c")).as("c"))
          .withColumn("b_id", expr("CAST(e AS BIGINT) * 8 + sub"))
          .withColumn("lb", expr("shiftleft(CAST(8 + sub AS BIGINT), e - 3)"))
        // CDF over the BUCKET DOMAIN (≤ 8·63 rows at any SF) — the
        // adjudicated domain-bounded window class, never fact-sized
        val cum = merged.withColumn("cum",
          sum(col("c")).over(Window.orderBy(col("b_id"))))
        val targets = base.agg(count(lit(1)).as("n"))
          .selectExpr("n", "explode(array(50L, 90L, 99L)) AS q_pct")
          .selectExpr("q_pct", "n", "(n * q_pct + 99) DIV 100 AS r")
        val est = broadcast(targets).join(cum, col("cum") >= col("r"))
          .groupBy(col("q_pct"), col("n"), col("r"))
          .agg(min(col("lb")).as("est_lb"))
        // exact order statistics via the distributed global rank ($100
        // buckets — monotone in v, domain bounded by the price range)
        val ranked = graft.ops.Ranks.withGlobalRank(base.select(col("v")),
          expr("v DIV 10000"), Seq(col("v").asc), "rk", "n_all")
        val exact = broadcast(targets.select(col("q_pct"), col("r")))
          .join(ranked, col("rk") === col("r"))
          .select(col("q_pct"), col("v").as("exact_v"))
        est.join(exact, Seq("q_pct"))
          .selectExpr("q_pct", "r AS rank_r", "n", "est_lb", "exact_v",
            "abs(exact_v - est_lb) * 1000000 DIV exact_v AS err_ppm")
      },
      Some("""WITH base AS MATERIALIZED (
             |  SELECT date_diff('day', DATE '1970-01-01', o_orderdate) // 7
             |      AS wk,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
             |  FROM orders
             |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 8),
             |weekly AS (
             |  SELECT wk, e, (v - (1::BIGINT << e)) * 8 // (1::BIGINT << e)
             |      AS sub,
             |    count(*) AS c
             |  FROM (SELECT wk, v, CAST(length(bin(v)) - 1 AS INT) AS e
             |        FROM base)
             |  GROUP BY 1, 2, 3),
             |merged AS (
             |  SELECT e, sub, CAST(sum(c) AS BIGINT) AS c,
             |    CAST(e AS BIGINT) * 8 + sub AS b_id,
             |    (CAST(8 + sub AS BIGINT) << (e - 3)) AS lb
             |  FROM weekly GROUP BY 1, 2),
             |cum AS (
             |  SELECT *, CAST(sum(c) OVER (ORDER BY b_id) AS BIGINT) AS cum
             |  FROM merged),
             |targets AS (
             |  SELECT CAST(q_pct AS BIGINT) AS q_pct, n,
             |    (n * q_pct + 99) // 100 AS r
             |  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM base),
             |    (SELECT unnest([50, 90, 99]) AS q_pct)),
             |est AS (
             |  SELECT q_pct, n, r, min(lb) AS est_lb
             |  FROM targets JOIN cum ON cum.cum >= targets.r
             |  GROUP BY 1, 2, 3),
             |ranked AS (
             |  SELECT v, row_number() OVER (ORDER BY v ASC) AS rk
             |  FROM base),
             |exact AS (
             |  SELECT q_pct, v AS exact_v
             |  FROM targets JOIN ranked ON rk = r)
             |SELECT e.q_pct, e.r AS rank_r, e.n, e.est_lb, x.exact_v,
             |  CAST(abs(x.exact_v - e.est_lb) * 1000000 // x.exact_v
             |    AS BIGINT) AS err_ppm
             |FROM est e JOIN exact x USING (q_pct)""".stripMargin))

  // ---------------------------------------------------------------- q450

  private val rougePairs: Q =
    Q("q450_rouge_pairs",
      (s, d) => {
        import graft.ext.Dedup
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cands = Dedup.minhashLshCandidates(Dedup.shingleIds(docs, 3))
          .toDF("d1", "d2")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tok = docs
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val uni = tok.groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("c"))
        val nlen = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val big = tok.as("t1")
          .join(tok.as("t2"), col("t1.doc_id") === col("t2.doc_id") &&
            col("t1.pos") + 1 === col("t2.pos"))
          .select(col("t1.doc_id").as("doc_id"),
            concat_ws(" ", col("t1.w"), col("t2.w")).as("w"))
          .groupBy(col("doc_id"), col("w"))
          .agg(count(lit(1)).as("c"))
        // clipped multiset overlap per candidate pair — joined through the
        // candidate list, never the all-pairs token cross product
        def overlap(counts: DataFrame, out: String) =
          cands
            .join(counts.toDF("d1", "w", "c1"), Seq("d1"))
            .join(counts.toDF("d2", "w", "c2"), Seq("d2", "w"))
            .groupBy(col("d1"), col("d2"))
            .agg(sum(least(col("c1"), col("c2"))).as(out))
        val o1 = overlap(uni, "o1")
        val o2 = overlap(big, "o2")
        cands
          .join(nlen.toDF("d1", "n1"), Seq("d1"))
          .join(nlen.toDF("d2", "n2"), Seq("d2"))
          .join(o1, Seq("d1", "d2"), "left")
          .join(o2, Seq("d1", "d2"), "left")
          .selectExpr("d1", "d2", "n1", "n2",
            "coalesce(o1, 0L) AS o1", "coalesce(o2, 0L) AS o2",
            // F1 = 2PR/(P+R) = 2o/(n1+n2) for clipped overlap — exact
            "coalesce(o1, 0L) * 2000000 DIV (n1 + n2) AS rouge1_f_ppm",
            "coalesce(o2, 0L) * 2000000 DIV nullif(n1 + n2 - 2, 0) " +
              "AS rouge2_f_ppm")
      },
      Some(s"""WITH ${ExtEntries.shinglesCte}, ${ExtEntries.shingleIdCte},
              |${ExtEntries.minhashLongCte},
              |wide AS (
              |  SELECT doc_id,
              |    ${(0 until 16).map(j =>
                     s"min(CASE WHEN j = $j THEN minh END) AS h$j")
                     .mkString(", ")}
              |  FROM sigs GROUP BY doc_id),
              |bands AS (
              |  ${(0 until 4).map(b =>
                   s"SELECT doc_id, $b AS band, " +
                   (0 until 4).map(r => s"CAST(h${b * 4 + r} AS VARCHAR)")
                     .mkString(" || ',' || ") +
                   " AS sig FROM wide").mkString(" UNION ALL ")}),
              |cands AS (
              |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
              |  FROM bands x JOIN bands y
              |    ON x.band = y.band AND x.sig = y.sig
              |      AND x.doc_id < y.doc_id),
              |tok AS (
              |  SELECT doc_id, i AS pos, ws[i] AS w
              |  FROM (SELECT doc_id, string_split(text, ' ') AS ws
              |        FROM documents),
              |       (SELECT unnest(range(1, 1000)) AS i)
              |  WHERE i <= len(ws)),
              |uni AS (
              |  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
              |  FROM tok GROUP BY 1, 2),
              |nlen AS (
              |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              |  FROM tok GROUP BY 1),
              |big AS (
              |  SELECT t1.doc_id, t1.w || ' ' || t2.w AS w,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM tok t1 JOIN tok t2
              |    ON t1.doc_id = t2.doc_id AND t2.pos = t1.pos + 1
              |  GROUP BY 1, 2),
              |ov1 AS (
              |  SELECT c.d1, c.d2, CAST(sum(least(u1.c, u2.c)) AS BIGINT)
              |      AS o1
              |  FROM cands c
              |  JOIN uni u1 ON u1.doc_id = c.d1
              |  JOIN uni u2 ON u2.doc_id = c.d2 AND u2.w = u1.w
              |  GROUP BY 1, 2),
              |ov2 AS (
              |  SELECT c.d1, c.d2, CAST(sum(least(u1.c, u2.c)) AS BIGINT)
              |      AS o2
              |  FROM cands c
              |  JOIN big u1 ON u1.doc_id = c.d1
              |  JOIN big u2 ON u2.doc_id = c.d2 AND u2.w = u1.w
              |  GROUP BY 1, 2)
              |SELECT c.d1, c.d2, na.n AS n1, nb.n AS n2,
              |  CAST(coalesce(ov1.o1, 0) AS BIGINT) AS o1,
              |  CAST(coalesce(ov2.o2, 0) AS BIGINT) AS o2,
              |  CAST(coalesce(ov1.o1, 0) * 2000000 // (na.n + nb.n)
              |    AS BIGINT) AS rouge1_f_ppm,
              |  CAST(coalesce(ov2.o2, 0) * 2000000 //
              |    nullif(na.n + nb.n - 2, 0) AS BIGINT) AS rouge2_f_ppm
              |FROM cands c
              |JOIN nlen na ON na.doc_id = c.d1
              |JOIN nlen nb ON nb.doc_id = c.d2
              |LEFT JOIN ov1 ON ov1.d1 = c.d1 AND ov1.d2 = c.d2
              |LEFT JOIN ov2 ON ov2.d1 = c.d1 AND ov2.d2 = c.d2"""
        .stripMargin))
}
