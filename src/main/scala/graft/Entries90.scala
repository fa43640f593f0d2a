package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-13 batch 6 — collocation mining, calibration error, and
  * inter-rater agreement (integer/grid arithmetic only, exact DuckDB
  * oracle mirrors):
  *
  *  - q484 CHI-SQUARE COLLOCATION detection (Manning & Schütze, FSNLP
  *    1999 §5.3.3 — the hypothesis-test member of the collocation
  *    family, beside q437's likelihood-ratio WordPiece criterion): per
  *    adjacent bigram the 2×2 contingency (a,b,c,d) against corpus
  *    totals, χ² = N(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) emitted in milli.
  *    ad−bc may be negative — it is SQUARED before the one DECIMAL(38,0)
  *    ÷ HUGEINT division (non-negative operands, the DIV-vs-// parity
  *    regime). The rank orders on the EMITTED chi2_milli grain in both
  *    engines — ranking on a finer grain than the output column would
  *    let the engines agree on values yet disagree on rank ties.
  *
  *  - q485 EXPECTED CALIBRATION ERROR report (Naeini, Cooper &
  *    Hauskrecht, AAAI 2015): the $10-price-bin purchase-rate model is
  *    FIT on the even-event_id half and EVALUATED on the odd half
  *    (deterministic parity split — no RNG); per bin: train confidence
  *    ppm, test accuracy ppm, |gap| ppm, and the n_b-weighted ECE
  *    contribution in ppm — all floor divisions on non-negative
  *    operands, absolute differences taken after both ppm floors.
  *    Bin-domain-bounded output (≤ ~34 rows at any SF).
  *
  *  - q486 COHEN'S KAPPA (Cohen, Educ. Psychol. Meas. 1960) between two
  *    deterministic document raters (length ≥ 40 tokens vs type/token
  *    ratio ≥ 1/2): the 2×2 agreement cells, observed/expected agreement
  *    in ppm, and kappa as the INTEGER (numerator, denominator) pair —
  *    kappa itself can be negative, and a signed quantity must never
  *    meet cross-engine integer division (the q456 integer-numerator
  *    report discipline). One-row output; the fixture's raters land
  *    below chance (kappa_num < 0), which the spec pins as a sign
  *    check, not an accident.
  *
  * Reference anchor: no collocation/calibration/agreement surface in
  * the 775-LoC pandas reference (SURVEY.md §0); these extend the text-
  * analysis, train-prep-eval and quality-audit families.
  */
object Entries90 {

  def all: Seq[Q] = Seq(chi2Collocations, eceReport, cohensKappa)

  // ---------------------------------------------------------------- q484

  private val chi2Collocations: Q =
    Q("q484_chi2_collocations",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val tok = toks
          .withColumn("w2", lead(col("w"), 1).over(wd))
          .filter(col("w2").isNotNull)
          .select(col("w").as("w1"), col("w2"))
        val bg = tok.groupBy(col("w1"), col("w2"))
          .agg(count(lit(1)).as("a"))
        val c1 = tok.groupBy(col("w1").as("k1"))
          .agg(count(lit(1)).as("c1"))
        val c2 = tok.groupBy(col("w2").as("k2"))
          .agg(count(lit(1)).as("c2"))
        val nn = tok.agg(count(lit(1)).as("n"))
        val cont = bg
          .join(c1, col("w1") === col("k1"))
          .join(c2, col("w2") === col("k2"))
          .crossJoin(nn)
          .select(col("w1"), col("w2"), col("a"),
            (col("c1") - col("a")).as("b"),
            (col("c2") - col("a")).as("c"),
            (col("n") - col("c1") - col("c2") + col("a")).as("d"),
            col("n"))
          .select(col("w1"), col("w2"), col("a"),
            expr("CAST(CAST(n AS DECIMAL(38,0)) * (a * d - b * c)" +
              " * (a * d - b * c) * 1000 DIV" +
              " (CAST((a + b) * (c + d) AS DECIMAL(38,0))" +
              " * ((a + c) * (b + d))) AS BIGINT)").as("chi2_milli"))
        val rw = Window.orderBy(col("chi2_milli").desc, col("w1"),
          col("w2"))
        cont.withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 20)
          .select(col("w1"), col("w2"), col("a"), col("chi2_milli"),
            col("rank").cast("int").as("rank"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, i AS pos, w[i] AS w1, w[i + 1] AS w2
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents) d,
             |       (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE i < len(w)),
             |bg AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS a
             |       FROM tok GROUP BY 1, 2),
             |c1 AS (SELECT w1 AS k1, CAST(count(*) AS BIGINT) AS c1
             |       FROM tok GROUP BY 1),
             |c2 AS (SELECT w2 AS k2, CAST(count(*) AS BIGINT) AS c2
             |       FROM tok GROUP BY 1),
             |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
             |cont AS (
             |  SELECT bg.w1 AS w1, bg.w2 AS w2, bg.a AS a,
             |    c1.c1 - bg.a AS b, c2.c2 - bg.a AS c,
             |    nn.n - c1.c1 - c2.c2 + bg.a AS d, nn.n AS n
             |  FROM bg JOIN c1 ON c1.k1 = bg.w1
             |  JOIN c2 ON c2.k2 = bg.w2 CROSS JOIN nn),
             |sc AS (
             |  SELECT w1, w2, a,
             |    CAST(CAST(n AS HUGEINT) * (a * d - b * c)
             |      * (a * d - b * c) * 1000
             |      // (CAST((a + b) * (c + d) AS HUGEINT)
             |      * ((a + c) * (b + d))) AS BIGINT) AS chi2_milli
             |  FROM cont)
             |SELECT w1, w2, a, chi2_milli, CAST(rank AS INT) AS rank
             |FROM (SELECT *, row_number() OVER (
             |    ORDER BY chi2_milli DESC, w1, w2) AS rank FROM sc)
             |WHERE rank <= 20""".stripMargin))

  // ---------------------------------------------------------------- q485

  private val eceReport: Q =
    Q("q485_ece_report",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(expr("CAST(round(coalesce(value, 0.0) * 100)" +
            " AS BIGINT) DIV 1000").as("bin"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("y"),
            pmod(col("event_id"), lit(2)).as("half"))
        val train = ev.filter(col("half") === 0)
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_train"), sum(col("y")).as("s_train"))
          .select(col("bin"), col("n_train"),
            expr("s_train * 1000000 DIV n_train").as("conf_ppm"))
        val test = ev.filter(col("half") === 1)
          .groupBy(col("bin").as("tb"))
          .agg(count(lit(1)).as("n_test"), sum(col("y")).as("s_test"))
          .select(col("tb"), col("n_test"),
            expr("s_test * 1000000 DIV n_test").as("acc_ppm"))
        val nTot = ev.filter(col("half") === 1)
          .agg(count(lit(1)).as("n_tot"))
        train.join(test, col("bin") === col("tb"))
          .crossJoin(nTot)
          .select(col("bin"), col("n_train"), col("conf_ppm"),
            col("n_test"), col("acc_ppm"),
            abs(col("acc_ppm") - col("conf_ppm")).as("gap_ppm"),
            expr("n_test * abs(acc_ppm - conf_ppm) DIV n_tot")
              .as("ece_contrib_ppm"))
      },
      Some("""WITH ev AS (
             |  SELECT CAST(round(coalesce(value, 0) * 100) AS BIGINT)
             |      // 1000 AS bin,
             |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
             |      AS y,
             |    event_id % 2 AS half
             |  FROM events),
             |train AS (
             |  SELECT bin, CAST(count(*) AS BIGINT) AS n_train,
             |    CAST(sum(y) * 1000000 // count(*) AS BIGINT)
             |      AS conf_ppm
             |  FROM ev WHERE half = 0 GROUP BY bin),
             |test AS (
             |  SELECT bin AS tb, CAST(count(*) AS BIGINT) AS n_test,
             |    CAST(sum(y) * 1000000 // count(*) AS BIGINT) AS acc_ppm
             |  FROM ev WHERE half = 1 GROUP BY bin),
             |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_tot
             |       FROM ev WHERE half = 1)
             |SELECT bin, n_train, conf_ppm, n_test, acc_ppm,
             |  CAST(abs(acc_ppm - conf_ppm) AS BIGINT) AS gap_ppm,
             |  CAST(n_test * abs(acc_ppm - conf_ppm) // n_tot AS BIGINT)
             |    AS ece_contrib_ppm
             |FROM train JOIN test ON tb = bin CROSS JOIN nt""".stripMargin))

  // ---------------------------------------------------------------- q486

  private val cohensKappa: Q =
    Q("q486_cohens_kappa",
      (s, d) => {
        val rated = Tables.documents(s, d)
          .select(
            when(size(split(col("text"), " ")) >= 40, 1L).otherwise(0L)
              .as("ra"),
            when(size(array_distinct(split(col("text"), " "))) * 2 >=
              size(split(col("text"), " ")), 1L).otherwise(0L).as("rb"))
        rated.agg(
            count(lit(1)).as("n"),
            sum(when(col("ra") === 1 && col("rb") === 1, 1L)
              .otherwise(0L)).as("n11"),
            sum(when(col("ra") === 1 && col("rb") === 0, 1L)
              .otherwise(0L)).as("n10"),
            sum(when(col("ra") === 0 && col("rb") === 1, 1L)
              .otherwise(0L)).as("n01"),
            sum(when(col("ra") === 0 && col("rb") === 0, 1L)
              .otherwise(0L)).as("n00"))
          .select(col("n"), col("n11"), col("n10"), col("n01"),
            col("n00"),
            expr("(n11 + n00) * 1000000 DIV n").as("po_ppm"),
            expr("((n11 + n10) * (n11 + n01) + (n00 + n01)" +
              " * (n00 + n10)) * 1000000 DIV (n * n)").as("pe_ppm"),
            expr("n * (n11 + n00) - ((n11 + n10) * (n11 + n01)" +
              " + (n00 + n01) * (n00 + n10))").as("kappa_num"),
            expr("n * n - ((n11 + n10) * (n11 + n01) + (n00 + n01)" +
              " * (n00 + n10))").as("kappa_den"))
      },
      Some("""WITH feat AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok,
             |    len(list_distinct(string_split(text, ' '))) AS n_types
             |  FROM documents),
             |rated AS (
             |  SELECT doc_id,
             |    CASE WHEN n_tok >= 40 THEN 1 ELSE 0 END AS ra,
             |    CASE WHEN n_types * 2 >= n_tok THEN 1 ELSE 0 END AS rb
             |  FROM feat),
             |cells AS (
             |  SELECT CAST(count(*) AS BIGINT) AS n,
             |    CAST(sum(CASE WHEN ra = 1 AND rb = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n11,
             |    CAST(sum(CASE WHEN ra = 1 AND rb = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n10,
             |    CAST(sum(CASE WHEN ra = 0 AND rb = 1 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n01,
             |    CAST(sum(CASE WHEN ra = 0 AND rb = 0 THEN 1 ELSE 0 END)
             |      AS BIGINT) AS n00
             |  FROM rated)
             |SELECT n, n11, n10, n01, n00,
             |  CAST((n11 + n00) * 1000000 // n AS BIGINT) AS po_ppm,
             |  CAST(((n11 + n10) * (n11 + n01) + (n00 + n01)
             |    * (n00 + n10)) * 1000000 // (n * n) AS BIGINT)
             |    AS pe_ppm,
             |  CAST(n * (n11 + n00) - ((n11 + n10) * (n11 + n01)
             |    + (n00 + n01) * (n00 + n10)) AS BIGINT) AS kappa_num,
             |  CAST(n * n - ((n11 + n10) * (n11 + n01) + (n00 + n01)
             |    * (n00 + n10)) AS BIGINT) AS kappa_den
             |FROM cells""".stripMargin))
}
