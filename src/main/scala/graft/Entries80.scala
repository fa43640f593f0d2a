package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 8 — eval-metric, mixing and graph-quality
  * closures:
  *
  *  - q454 PAIRWISE LOG-BLEU (Papineni et al. 2002) on the LSH candidate
  *    pairs: modified n-gram precisions n=1..4 with reference clipping as
  *    EXACT integers, the brevity penalty's log as an exact rational
  *    (log BP = min(0, 1−r/c) — no transcendental), and only the four
  *    ln(p_n) terms on the established floor(ln·1e4) grid, floored
  *    PER-TERM before summation (transcendental policy, escape hatch 3;
  *    knife-edge audited). Score = 4·logBP + Σ ln p_n in 1e-4 nats at ×4
  *    scale — no division, so no truncate-vs-floor hazard on the
  *    negative-valued sum.
  *  - q455 TEMPERATURE-SCALED SOURCE MIXING (the UniMax/multilingual-
  *    sampling T=2 rule, Conneau & Lample 2019 §3; Chung et al. 2023):
  *    target source shares ∝ √(corpus share). √ is made EXACT integer
  *    arithmetic — isqrt(chars·10⁶) via double sqrt plus a ±1 integer
  *    correction (IEEE sqrt is correctly rounded; the correction makes
  *    the result libm-independent anyway) — and the 1M-token budget is
  *    allocated by the largest-remainder (Hamilton) method: base = ⌊B·sᵢ/S⌋,
  *    the deficit goes to the largest remainders (ties to source name).
  *    Every output column is a BIGINT; the oracle replays bit-for-bit.
  *  - q456 MODULARITY REPORT (Newman & Girvan 2004) for the q453 LPA
  *    communities: per community, intra-edge count e_c, degree mass d_c,
  *    and the EXACT modularity contribution numerator 4m·e_c − d_c² over
  *    the common denominator 4m² — kept as an integer numerator (it can
  *    be negative, and a negative value must never meet integer division
  *    cross-engine). Σ contrib/4m² = the graph's modularity Q.
  *
  * All three replay exactly in DuckDB.
  */
object Entries80 {

  def all: Seq[Q] = Seq(bleuPairs, temperatureMix, modularityReport)

  // ---------------------------------------------------------------- q454

  private val bleuPairs: Q =
    Q("q454_bleu_pairs",
      (s, d) => {
        import graft.ext.Dedup
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("text"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val cands = Dedup.minhashLshCandidates(Dedup.shingleIds(docs, 3))
          .toDF("d1", "d2")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val seqd = docs
          .select(col("doc_id"), posexplode(split(col("text"), " ")))
          .toDF("doc_id", "pos", "w1")
          .withColumn("w2", lead(col("w1"), 1).over(w))
          .withColumn("w3", lead(col("w1"), 2).over(w))
          .withColumn("w4", lead(col("w1"), 3).over(w))
        // n-grams n=1..4 in one long relation (g = space-joined words)
        val grams = Seq(
            seqd.select(col("doc_id"), lit(1).as("n"), col("w1").as("g")),
            seqd.filter(col("w2").isNotNull).select(col("doc_id"),
              lit(2).as("n"), concat_ws(" ", col("w1"), col("w2")).as("g")),
            seqd.filter(col("w3").isNotNull).select(col("doc_id"),
              lit(3).as("n"),
              concat_ws(" ", col("w1"), col("w2"), col("w3")).as("g")),
            seqd.filter(col("w4").isNotNull).select(col("doc_id"),
              lit(4).as("n"), concat_ws(" ", col("w1"), col("w2"),
                col("w3"), col("w4")).as("g")))
          .reduce(_ unionByName _)
          .groupBy(col("doc_id"), col("n"), col("g"))
          .agg(count(lit(1)).as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tots = grams.groupBy(col("doc_id"), col("n"))
          .agg(sum(col("c")).as("tot"))
        // clipped matches per pair and n — joined through the candidate
        // list only, never an all-pairs gram product
        val clips = cands
          .join(grams.toDF("d1", "n", "g", "c1"), Seq("d1"))
          .join(grams.toDF("d2", "n", "g", "c2"), Seq("d2", "n", "g"))
          .groupBy(col("d1"), col("d2"), col("n"))
          .agg(sum(least(col("c1"), col("c2"))).as("clip"))
        val clipCols = (1 to 4).map(n =>
          coalesce(max(when(col("n") === n, col("clip"))), lit(0L))
            .as(s"clip$n"))
        val wideClip = cands.join(clips, Seq("d1", "d2"), "left")
          .groupBy(col("d1"), col("d2"))
          .agg(clipCols.head, clipCols.tail: _*)
        val totCols = (1 to 4).map(n =>
          coalesce(max(when(col("n") === n, col("tot"))), lit(0L))
            .as(s"tot$n"))
        val wideTot = tots.groupBy(col("doc_id"))
          .agg(totCols.head, totCols.tail: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        wideClip
          .join(wideTot.select(col("doc_id").as("d1"), col("tot1"),
            col("tot2"), col("tot3"), col("tot4"),
            col("tot1").as("c_len")), Seq("d1"))
          .join(wideTot.select(col("doc_id").as("d2"),
            col("tot1").as("r_len")), Seq("d2"))
          .selectExpr(Seq("d1", "d2", "c_len", "r_len") ++
            (1 to 4).map(n => s"clip$n") ++ Seq(
            // log BP = min(0, 1 − r/c) exactly, on the 1e-4 grid: the
            // negative branch is −ceil((r−c)·1e4/c) with NON-NEGATIVE
            // operands (truncate-DIV == floor-// there)
            "CASE WHEN c_len >= r_len THEN 0L ELSE " +
              "-(((r_len - c_len) * 10000 + c_len - 1) DIV c_len) END " +
              "AS bp_q") ++
            // sentinel −99999999 for a zero clip (|ln p_n|·1e4 ≤
            // ln(1000)·1e4 ≈ 6.9e4 ≪ sentinel; NULL would turn the int64
            // column into float64 in the driver's pandas compare)
            (1 to 4).map(n =>
              s"CASE WHEN clip$n = 0 THEN -99999999L ELSE " +
                s"CAST(floor(ln(CAST(clip$n AS DOUBLE) / tot$n) * 1e4) " +
                s"AS BIGINT) END AS p${n}_q"): _*)
          .selectExpr("d1", "d2", "c_len", "r_len",
            "clip1", "clip2", "clip3", "clip4", "bp_q",
            "p1_q", "p2_q", "p3_q", "p4_q",
            "CASE WHEN clip1 = 0 OR clip2 = 0 OR clip3 = 0 OR clip4 = 0 " +
              "THEN -99999999L ELSE 4 * bp_q + p1_q + p2_q + p3_q + p4_q " +
              "END AS bleu_q4",
            "CAST(CASE WHEN clip1 = 0 OR clip2 = 0 OR clip3 = 0 OR " +
              "clip4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS zero_ngram")
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
              |ws AS (SELECT doc_id, string_split(text, ' ') AS ws
              |       FROM documents),
              |grams AS MATERIALIZED (
              |  SELECT doc_id, n, array_to_string(ws[i:i+n-1], ' ') AS g,
              |    CAST(count(*) AS BIGINT) AS c
              |  FROM ws,
              |    (SELECT unnest(range(1, 1000)) AS i),
              |    (SELECT unnest([1, 2, 3, 4]) AS n)
              |  WHERE i <= len(ws) - n + 1
              |  GROUP BY 1, 2, 3),
              |tots AS (
              |  SELECT doc_id, n, CAST(sum(c) AS BIGINT) AS tot
              |  FROM grams GROUP BY 1, 2),
              |clips AS (
              |  SELECT c.d1, c.d2, g1.n,
              |    CAST(sum(least(g1.c, g2.c)) AS BIGINT) AS clip
              |  FROM cands c
              |  JOIN grams g1 ON g1.doc_id = c.d1
              |  JOIN grams g2 ON g2.doc_id = c.d2 AND g2.n = g1.n
              |    AND g2.g = g1.g
              |  GROUP BY 1, 2, 3),
              |wclip AS (
              |  SELECT c.d1, c.d2,
              |    ${(1 to 4).map(n =>
                     s"coalesce(max(CASE WHEN cl.n = $n THEN cl.clip END)," +
                     s" 0) AS clip$n").mkString(", ")}
              |  FROM cands c LEFT JOIN clips cl
              |    ON cl.d1 = c.d1 AND cl.d2 = c.d2
              |  GROUP BY 1, 2),
              |wtot AS (
              |  SELECT doc_id,
              |    ${(1 to 4).map(n =>
                     s"coalesce(max(CASE WHEN n = $n THEN tot END), 0) " +
                     s"AS tot$n").mkString(", ")}
              |  FROM tots GROUP BY 1),
              |scored AS (
              |  SELECT w.d1, w.d2, t1.tot1 AS c_len, t2.tot1 AS r_len,
              |    clip1, clip2, clip3, clip4,
              |    CASE WHEN t1.tot1 >= t2.tot1 THEN 0 ELSE
              |      -(((t2.tot1 - t1.tot1) * 10000 + t1.tot1 - 1)
              |        // t1.tot1) END AS bp_q,
              |    ${(1 to 4).map(n =>
                     s"CASE WHEN clip$n = 0 THEN CAST(-99999999 AS BIGINT) " +
                     s"ELSE CAST(floor(ln(CAST(clip$n AS DOUBLE) / " +
                     s"t1.tot$n) * 1e4) AS BIGINT) END AS p${n}_q")
                     .mkString(", ")}
              |  FROM wclip w
              |  JOIN wtot t1 ON t1.doc_id = w.d1
              |  JOIN wtot t2 ON t2.doc_id = w.d2)
              |SELECT d1, d2, c_len, r_len, clip1, clip2, clip3, clip4,
              |  CAST(bp_q AS BIGINT) AS bp_q, p1_q, p2_q, p3_q, p4_q,
              |  CASE WHEN clip1 = 0 OR clip2 = 0 OR clip3 = 0 OR clip4 = 0
              |    THEN CAST(-99999999 AS BIGINT)
              |    ELSE 4 * CAST(bp_q AS BIGINT) + p1_q + p2_q + p3_q + p4_q
              |    END AS bleu_q4,
              |  CAST(CASE WHEN clip1 = 0 OR clip2 = 0 OR clip3 = 0 OR
              |    clip4 = 0 THEN 1 ELSE 0 END AS BIGINT) AS zero_ngram
              |FROM scored""".stripMargin))

  // ---------------------------------------------------------------- q455

  /** Token budget allocated across sources. */
  private val MixBudget = 1000000L

  private val temperatureMix: Q =
    Q("q455_temperature_mix",
      (s, d) => {
        val src = Tables.documents(s, d)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
          // exact integer sqrt of chars·10⁶: IEEE sqrt is correctly
          // rounded and the operand is < 2^53 (exact in double); the ±1
          // correction makes the result libm-independent regardless
          .withColumn("x", col("chars") * lit(1000000L))
          .withColumn("s0",
            expr("CAST(floor(sqrt(CAST(x AS DOUBLE))) AS BIGINT)"))
          .withColumn("s", expr(
            "CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1 " +
              "WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = src.agg(sum(col("s")).as("stot"))
        val based = src.crossJoin(broadcast(tot))
          .withColumn("base", expr(s"$MixBudget * s DIV stot"))
          .withColumn("rem", expr(s"$MixBudget * s % stot"))
        val deficit = based.agg((lit(MixBudget) - sum(col("base")))
          .as("D"))
        // largest-remainder top-up: rank over the SOURCE DOMAIN (a
        // catalog-bounded handful of rows — never fact-sized)
        based.crossJoin(broadcast(deficit))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rem").desc, col("source").asc)))
          .withColumn("extra",
            when(col("rk") <= col("D"), 1L).otherwise(0L))
          .selectExpr("source", "n_docs", "chars", "s", "base", "extra",
            "base + extra AS quota",
            "(base + extra) * 1000000 DIV chars AS rate_ppm")
      },
      Some(s"""WITH src AS MATERIALIZED (
              |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(sum(n_chars) AS BIGINT) AS chars,
              |    CAST(sum(n_chars) AS BIGINT) * 1000000 AS x
              |  FROM documents GROUP BY 1),
              |isq AS (
              |  SELECT *, CASE WHEN (s0 + 1) * (s0 + 1) <= x THEN s0 + 1
              |    WHEN s0 * s0 > x THEN s0 - 1 ELSE s0 END AS s
              |  FROM (SELECT *, CAST(floor(sqrt(CAST(x AS DOUBLE)))
              |    AS BIGINT) AS s0 FROM src)),
              |based AS (
              |  SELECT *, CAST($MixBudget * s // stot AS BIGINT) AS base,
              |    CAST($MixBudget * s % stot AS BIGINT) AS rem
              |  FROM isq, (SELECT CAST(sum(s) AS BIGINT) AS stot FROM isq)),
              |topped AS (
              |  SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC)
              |      AS rk,
              |    (SELECT $MixBudget - CAST(sum(base) AS BIGINT)
              |     FROM based) AS D
              |  FROM based)
              |SELECT source, n_docs, chars, s,
              |  base, CAST(CASE WHEN rk <= D THEN 1 ELSE 0 END AS BIGINT)
              |    AS extra,
              |  base + CASE WHEN rk <= D THEN 1 ELSE 0 END AS quota,
              |  (base + CASE WHEN rk <= D THEN 1 ELSE 0 END) * 1000000
              |    // chars AS rate_ppm
              |FROM topped""".stripMargin))

  // ---------------------------------------------------------------- q456

  private val modularityReport: Q =
    Q("q456_modularity_report",
      (s, d) => {
        val edges = graft.ext.Curation
          .coengagementPairs(Tables.events(s, d), 10, 2L)
          .select(col("i1"), col("i2"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sym = edges.select(col("i1").as("v"), col("i2").as("u"))
          .unionByName(edges.select(col("i2").as("v"), col("i1").as("u")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val labels = Entries79.lpaLabels(sym)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val m = edges.agg(count(lit(1)).as("m"))
        // e_c: intra-community edges; d_c: community degree mass
        val eIntra = edges
          .join(labels.select(col("v").as("i1"), col("lbl").as("l1")),
            Seq("i1"))
          .join(labels.select(col("v").as("i2"), col("lbl").as("l2")),
            Seq("i2"))
          .filter(col("l1") === col("l2"))
          .groupBy(col("l1").as("lbl"))
          .agg(count(lit(1)).as("e_intra"))
        val dMass = sym.groupBy(col("v")).agg(count(lit(1)).as("deg"))
          .join(labels, Seq("v"))
          .groupBy(col("lbl"))
          .agg(sum(col("deg")).as("d_c"), count(lit(1)).as("n_members"))
        dMass.join(eIntra, Seq("lbl"), "left")
          .crossJoin(broadcast(m))
          .selectExpr("lbl AS community", "n_members",
            "coalesce(e_intra, 0L) AS e_intra", "d_c", "m",
            // contribution numerator over the common denominator 4m²;
            // MAY be negative — kept as an integer, never divided
            "4 * m * coalesce(e_intra, 0L) - d_c * d_c AS contrib_num")
      },
      Some(s"""WITH ${Entries79.symCte},
              |${Entries79.lpaCtes},
              |mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
              |ei AS (
              |  SELECT l1.lbl, CAST(count(*) AS BIGINT) AS e_intra
              |  FROM edges e
              |  JOIN l${Entries79.LpaRounds} l1 ON l1.v = e.i1
              |  JOIN l${Entries79.LpaRounds} l2 ON l2.v = e.i2
              |  WHERE l1.lbl = l2.lbl
              |  GROUP BY 1),
              |dm AS (
              |  SELECT l.lbl, CAST(sum(deg) AS BIGINT) AS d_c,
              |    CAST(count(*) AS BIGINT) AS n_members
              |  FROM (SELECT v, count(*) AS deg FROM sym GROUP BY 1) dg
              |  JOIN l${Entries79.LpaRounds} l ON l.v = dg.v
              |  GROUP BY 1)
              |SELECT dm.lbl AS community, n_members,
              |  coalesce(ei.e_intra, 0) AS e_intra, d_c, m,
              |  4 * m * coalesce(ei.e_intra, 0) - d_c * d_c AS contrib_num
              |FROM dm LEFT JOIN ei ON ei.lbl = dm.lbl CROSS JOIN mm"""
        .stripMargin))
}
