package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-10 batch 2 — corpus-distribution and data-valuation axis: a
  * rational (transcendental-free) corpus divergence, per-source vocabulary
  * marginals (leave-one-source-out value), a Kaplan–Meier repeat-purchase
  * survival table, recommender catalog coverage, a Poisson-vs-NBD
  * dispersion gate, and a linearized DoReMi-style mixture reweighting
  * step.
  *
  * Float discipline: q393 uses TRIANGULAR DISCRIMINATION (p−q)²/(p+q)
  * instead of Jensen–Shannon precisely because it is a div/mul chain on
  * identical operands — bit-exact across engines (verify SKILL: no ln/exp
  * in oracle-checked outputs) — quantized per token BEFORE the cross-token
  * BIGINT sum. q395 ships the EXACT (d_t, c_t, n_at_risk) product-limit
  * table — S(t) and log-survival are one exact rational product away and
  * left to the consumer (the r6 floored-ln column lost hash parity to a
  * ±1 ulp libm difference at a grid boundary; the q299 PSI/Zipf rows set
  * the emit-the-exact-table precedent). Everything else is pure integer
  * arithmetic.
  */
object Entries69 {

  /** Triangular-discrimination per-token term, shared across engines. */
  private val tdTermStr =
    "CAST(floor(((CAST(a AS DOUBLE)/la - CAST(c AS DOUBLE)/lc) * " +
      "(CAST(a AS DOUBLE)/la - CAST(c AS DOUBLE)/lc) / " +
      "(CAST(a AS DOUBLE)/la + CAST(c AS DOUBLE)/lc)) * 1000000000000) AS BIGINT)"

  val all: Seq[Q] = Seq(

    // CORPUS DIVERGENCE, rational form: triangular discrimination between
    // each language's token distribution and the corpus-wide distribution,
    // Δ(p,q) = Σ_tok (p−q)²/(p+q) ∈ [0,2]. NO lang×vocab grid is ever
    // built (broadcasting a 100 TB corpus vocabulary is the anti-shape):
    // tokens ABSENT from a language contribute exactly q = c/C each, so
    // their total is the closed form (C − Σ_present c)/C and only the
    // PRESENT (lang,tok) cells are enumerated. Present terms are quantized
    // to pico grain as BIGINTs before the per-language sum (order-free);
    // the absent remainder is one more bit-exact division.
    Q("q393_corpus_divergence",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // persisted: the (lang, tok) reduce feeds the corpus marginal, the
        // language totals AND the present-cell join — without the cache
        // each consumer replays the tokenize-explode over documents
        val tl = Entries57.tokenCounts(docs)
          .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy(col("lang"), col("tok")).agg(sum(col("cnt")).as("a"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val corpus = tl.groupBy(col("tok")).agg(sum(col("a")).as("c"))
        val langTot = tl.groupBy(col("lang")).agg(sum(col("a")).as("la"))
        val ctot = corpus.agg(sum(col("c")).as("lc"))
        val present = tl.join(corpus, Seq("tok"))
          .join(broadcast(langTot), Seq("lang"))
          .crossJoin(broadcast(ctot))
        present.selectExpr("lang", "la", "lc", "c",
            s"$tdTermStr AS term_pico")
          .groupBy(col("lang")).agg(
            max(col("la")).as("n_tokens"),
            count(lit(1)).as("vocab_lang"),
            sum(col("term_pico")).as("present_pico"),
            max(col("lc")).as("lc"),
            sum(col("c")).as("c_present"))
          .selectExpr("lang", "n_tokens", "vocab_lang",
            "present_pico + CAST(floor(CAST(lc - c_present AS DOUBLE) / lc * 1000000000000) AS BIGINT) AS td_pico")
      },
      Some(s"""WITH ${Entries57.tokenCountsCte},
              |tl AS (
              |  SELECT lang, tok, CAST(sum(cnt) AS BIGINT) AS a
              |  FROM tc JOIN documents USING (doc_id)
              |  GROUP BY 1, 2),
              |corpus AS (
              |  SELECT tok, CAST(sum(a) AS BIGINT) AS c FROM tl GROUP BY 1),
              |lt AS (
              |  SELECT lang, CAST(sum(a) AS BIGINT) AS la FROM tl GROUP BY 1),
              |ct AS (SELECT CAST(sum(c) AS BIGINT) AS lc FROM corpus),
              |present AS (
              |  SELECT tl.lang, tl.a, lt.la, corpus.c, ct.lc
              |  FROM tl JOIN corpus USING (tok)
              |  JOIN lt ON lt.lang = tl.lang
              |  CROSS JOIN ct),
              |agg AS (
              |  SELECT lang, CAST(max(la) AS BIGINT) AS n_tokens,
              |    CAST(count(*) AS BIGINT) AS vocab_lang,
              |    CAST(sum($tdTermStr) AS BIGINT) AS present_pico,
              |    CAST(max(lc) AS BIGINT) AS lc,
              |    CAST(sum(c) AS BIGINT) AS c_present
              |  FROM present GROUP BY 1)
              |SELECT lang, n_tokens, vocab_lang,
              |  present_pico + CAST(floor(CAST(lc - c_present AS DOUBLE)
              |    / lc * 1000000000000) AS BIGINT) AS td_pico
              |FROM agg""".stripMargin)),

    // SOURCE VOCABULARY MARGINAL (leave-one-source-out value): for each
    // ingest source, the vocabulary types that would VANISH from the corpus
    // if the source were dropped (types no other source contains) and the
    // token occurrences they carry — the data-valuation number a curation
    // pipeline weighs against a source's licensing/toxicity cost. Two
    // aggregations on the (source, tok) reduced domain; no window.
    Q("q394_source_marginal",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // persisted: the (source, tok) reduce feeds the spread marginal
        // AND the final census — each would replay the tokenize-explode
        val st = Entries57.tokenCounts(docs)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"), col("tok")).agg(sum(col("cnt")).as("occ"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val spread = st.groupBy(col("tok"))
          .agg(count(lit(1)).as("n_sources"))
        val nd = docs.groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        st.join(broadcast(spread), Seq("tok"))
          .groupBy(col("source")).agg(
            sum(col("occ")).as("n_tokens"),
            count(lit(1)).as("vocab_types"),
            sum(when(col("n_sources") === 1L, 1L).otherwise(0L))
              .as("sole_types"),
            sum(when(col("n_sources") === 1L, col("occ")).otherwise(0L))
              .as("sole_occ"))
          .join(nd, Seq("source"))
      },
      Some(s"""WITH ${Entries57.tokenCountsCte},
              |st AS (
              |  SELECT source, tok, CAST(sum(cnt) AS BIGINT) AS occ
              |  FROM tc JOIN documents USING (doc_id)
              |  GROUP BY 1, 2),
              |spread AS (
              |  SELECT tok, CAST(count(*) AS BIGINT) AS n_sources
              |  FROM st GROUP BY 1),
              |nd AS (
              |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
              |  FROM documents GROUP BY 1)
              |SELECT source,
              |  CAST(sum(occ) AS BIGINT) AS n_tokens,
              |  CAST(count(*) AS BIGINT) AS vocab_types,
              |  CAST(sum(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS sole_types,
              |  CAST(sum(CASE WHEN n_sources = 1 THEN occ ELSE 0 END)
              |    AS BIGINT) AS sole_occ,
              |  CAST(max(n_docs) AS BIGINT) AS n_docs
              |FROM st JOIN spread USING (tok)
              |JOIN nd USING (source)
              |GROUP BY 1""".stripMargin)),

    // KAPLAN–MEIER repeat-purchase survival: T = days from a customer's
    // first order to their second (event) or to the corpus horizon
    // (right-censored). The product-limit curve is reported as the EXACT
    // (d_t, c_t, n_at_risk) table — S(t) = Π(1 − d/n) and its log are one
    // rational product away and left to the consumer (same stance as
    // q299's PSI/Zipf rows: never ship a transcendental the reader can
    // apply themselves). The unpartitioned window runs on the distinct-T
    // day domain — calendar-bounded, size-invariant at any SF.
    Q("q395_kaplan_meier",
      (s, d) => {
        // persisted: the distinct (cust, day) grid feeds the per-customer
        // ranking AND the corpus horizon — uncached, the orders scan +
        // distinct replans per consumer (plan census r8: 4 scans -> 1)
        val od = Tables.orders(s, d)
          .select(col("o_custkey").as("cust"),
            (graft.ops.Relational.epochUs(col("o_orderdate"))
              / lit(86400000000L)).cast("long").as("day"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ranked = od.withColumn("rn",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cust")).orderBy(col("day").asc)))
        val firstTwo = ranked.filter(col("rn") <= 2)
          .groupBy(col("cust")).agg(
            min(when(col("rn") === 1, col("day"))).as("d1"),
            min(when(col("rn") === 2, col("day"))).as("d2"))
        val horizon = od.agg(max(col("day")).as("hz"))
        val spells = firstTwo.crossJoin(broadcast(horizon))
          .selectExpr("cust",
            "CASE WHEN d2 IS NOT NULL THEN d2 - d1 ELSE hz - d1 END AS t",
            "CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev")
        // byT is the reduced day-domain table (calendar-bounded); n_total
        // is ITS cell sum, not a second pass over spells — persist it for
        // the two consumers (cum + total)
        val byT = spells.groupBy(col("t")).agg(
          sum(col("ev")).as("d_t"),
          sum(lit(1L) - col("ev")).as("c_t"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = byT.agg(sum(col("d_t") + col("c_t")).as("n_total"))
        val w = org.apache.spark.sql.expressions.Window.orderBy(col("t").asc)
          .rowsBetween(Long.MinValue, -1)
        val cum = byT.crossJoin(broadcast(n))
          .withColumn("left_before",
            coalesce(sum(col("d_t") + col("c_t")).over(w), lit(0L)))
          .withColumn("n_at_risk", col("n_total") - col("left_before"))
          .filter(col("d_t") > 0L)
          .selectExpr("t", "d_t", "c_t", "n_at_risk")
        cum
      },
      Some("""WITH od AS (
             |  SELECT DISTINCT o_custkey AS cust,
             |    epoch_us(o_orderdate) // 86400000000 AS day
             |  FROM orders),
             |ranked AS (
             |  SELECT cust, day, row_number() OVER (
             |    PARTITION BY cust ORDER BY day ASC) AS rn
             |  FROM od),
             |ft AS (
             |  SELECT cust,
             |    min(CASE WHEN rn = 1 THEN day END) AS d1,
             |    min(CASE WHEN rn = 2 THEN day END) AS d2
             |  FROM ranked WHERE rn <= 2 GROUP BY 1),
             |hz AS (SELECT max(day) AS hz FROM od),
             |spells AS (
             |  SELECT cust,
             |    CASE WHEN d2 IS NOT NULL THEN d2 - d1 ELSE hz.hz - d1 END AS t,
             |    CASE WHEN d2 IS NOT NULL THEN 1 ELSE 0 END AS ev
             |  FROM ft CROSS JOIN hz),
             |byt AS (
             |  SELECT t, CAST(sum(ev) AS BIGINT) AS d_t,
             |    CAST(sum(1 - ev) AS BIGINT) AS c_t
             |  FROM spells GROUP BY 1),
             |n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM spells),
             |cum AS (
             |  SELECT t, d_t, c_t,
             |    CAST(n.n_total - coalesce(sum(d_t + c_t) OVER (ORDER BY t ASC
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             |      AS BIGINT) AS n_at_risk
             |  FROM byt CROSS JOIN n)
             |SELECT t, d_t, c_t, n_at_risk
             |FROM cum WHERE d_t > 0""".stripMargin)),

    // RECOMMENDER CATALOG COVERAGE: top-3 co-purchase recommendations per
    // part (same-order pairs, count desc, key asc tie-break), then the
    // aggregate health check — what share of the catalog is ever
    // recommended, and how popularity-concentrated the recommended set is
    // (mean recommended-part popularity, in ppm of total lines). Pair
    // generation is bounded by order width (~7 lines), top-3 is a
    // part-partitioned window — both scale linearly.
    Q("q396_catalog_coverage",
      (s, d) => {
        // persisted: the distinct (order, part) relation feeds FOUR
        // consumers (both pair sides, the popularity census, the line
        // total) — uncached, the scan + distinct replans per consumer
        // (plan census r8)
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
          .distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val pairs = li.alias("a")
          .join(li.alias("b"), col("a.ok") === col("b.ok") &&
            col("a.pk") =!= col("b.pk"))
          .groupBy(col("a.pk").as("p1"), col("b.pk").as("p2"))
          .agg(count(lit(1)).as("cop"))
        val top3 = pairs.withColumn("rn",
            row_number().over(org.apache.spark.sql.expressions.Window
              .partitionBy(col("p1"))
              .orderBy(col("cop").desc, col("p2").asc)))
          .filter(col("rn") <= 3)
        val recs = top3.select(col("p2")).distinct()
        val pop = li.groupBy(col("pk")).agg(count(lit(1)).as("pop"))
        val catalog = Tables.part(s, d).agg(count(lit(1)).as("catalog_n"))
        val lines = li.agg(count(lit(1)).as("total_lines"))
        val recPop = recs.join(pop, col("p2") === col("pk"))
          .agg(count(lit(1)).as("recommended_n"), sum(col("pop")).as("rec_pop"))
        recPop.crossJoin(broadcast(catalog)).crossJoin(broadcast(lines))
          .selectExpr("catalog_n", "recommended_n",
            "(recommended_n * 1000000) DIV catalog_n AS coverage_ppm",
            "(rec_pop * 1000000) DIV (recommended_n * total_lines) AS mean_rec_pop_ppm")
      },
      Some("""WITH li AS (
             |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
             |  FROM lineitem),
             |pairs AS (
             |  SELECT a.pk AS p1, b.pk AS p2, count(*) AS cop
             |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
             |  GROUP BY 1, 2),
             |top3 AS (
             |  SELECT p1, p2 FROM (
             |    SELECT p1, p2, row_number() OVER (PARTITION BY p1
             |      ORDER BY cop DESC, p2 ASC) AS rn
             |    FROM pairs) WHERE rn <= 3),
             |recs AS (SELECT DISTINCT p2 FROM top3),
             |pop AS (SELECT pk, CAST(count(*) AS BIGINT) AS pop
             |        FROM li GROUP BY 1),
             |cat AS (SELECT CAST(count(*) AS BIGINT) AS catalog_n FROM part),
             |tot AS (SELECT CAST(count(*) AS BIGINT) AS total_lines FROM li),
             |rp AS (
             |  SELECT CAST(count(*) AS BIGINT) AS recommended_n,
             |    CAST(sum(pop) AS BIGINT) AS rec_pop
             |  FROM recs JOIN pop ON p2 = pk)
             |SELECT catalog_n, recommended_n,
             |  (recommended_n * 1000000) // catalog_n AS coverage_ppm,
             |  (rec_pop * 1000000) // (recommended_n * total_lines)
             |    AS mean_rec_pop_ppm
             |FROM rp CROSS JOIN cat CROSS JOIN tot""".stripMargin)),

    // DISPERSION GATE (Poisson vs negative-binomial): weekly demand units
    // per brand; the variance-to-mean ratio reduces to the PURE INTEGER
    // ratio (n·Σx² − (Σx)²) / ((n−1)·Σx) — no doubles anywhere, quantized
    // to milli by exact integer division. VMR ≈ 1 → Poisson; >> 1 →
    // overdispersed, fit NBD. The decision every demand-forecast model
    // upstream of a feature store makes.
    Q("q397_dispersion_gate",
      (s, d) => {
        val weekly = Tables.lineitem(s, d)
          .join(broadcast(Tables.part(s, d)
            .select(col("p_partkey"), col("p_brand"))),
            col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            (graft.ops.Relational.epochUs(col("l_shipdate"))
              / lit(604800000000L)).cast("long").as("week"))
          .agg(sum(round(col("l_quantity")).cast("long")).as("x"))
        weekly.groupBy(col("brand")).agg(
            count(lit(1)).as("n_weeks"),
            sum(col("x")).as("units"),
            sum(col("x") * col("x")).as("sxx"))
          .filter(col("n_weeks") > 1L && col("units") > 0L)
          .selectExpr("brand", "n_weeks", "units",
            "((n_weeks * sxx - units * units) * 1000) DIV ((n_weeks - 1) * units) AS vmr_milli")
          .selectExpr("brand", "n_weeks", "units", "vmr_milli",
            "vmr_milli > 1000 AS overdispersed")
      },
      Some("""WITH weekly AS (
             |  SELECT p_brand AS brand,
             |    epoch_us(l_shipdate) // 604800000000 AS week,
             |    CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS x
             |  FROM lineitem JOIN part ON l_partkey = p_partkey
             |  GROUP BY 1, 2),
             |mom AS (
             |  SELECT brand, CAST(count(*) AS BIGINT) AS n_weeks,
             |    CAST(sum(x) AS BIGINT) AS units,
             |    CAST(sum(x*x) AS BIGINT) AS sxx
             |  FROM weekly GROUP BY 1)
             |SELECT brand, n_weeks, units,
             |  ((n_weeks * sxx - units * units) * 1000)
             |    // ((n_weeks - 1) * units) AS vmr_milli,
             |  ((n_weeks * sxx - units * units) * 1000)
             |    // ((n_weeks - 1) * units) > 1000 AS overdispersed
             |FROM mom WHERE n_weeks > 1 AND units > 0""".stripMargin)),

    // MIXTURE REWEIGHTING STEP (linearized DoReMi / Hedge): one
    // multiplicative-weights update of per-source sampling weights from an
    // excess-"loss" signal (here: how far the source's mean document
    // length falls below the corpus mean — short docs as the quality-loss
    // proxy). The linearized update score = 1e6 + eta·excess, floored at
    // 10%, keeps the whole step in exact integers: ppm weights sum to ~1e6
    // with only integer-division dust missing. The exp() of true DoReMi is
    // deliberately traded for its first-order expansion so the update is
    // bit-reproducible across engines (documented deviation).
    Q("q398_mixture_reweight",
      (s, d) => {
        val docs = Tables.documents(s, d)
        // ONE tokenize-explode: the per-source moment table (20 rows,
        // persisted) is the only pass over the corpus; the global moments
        // are ITS sums — each doc has exactly one source, so Σ n_docs and
        // Σ occ over sources equal the global distinct-doc and token
        // totals exactly. The first draft ran the explode twice (per-src,
        // global) and re-ran it twice more through the scored fan-out.
        val moments = Entries57.tokenCounts(docs)
          .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source")).agg(
            sum(col("cnt")).as("occ"),
            countDistinct(col("doc_id")).as("n_docs"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val perSrc = moments
          .selectExpr("source", "n_docs",
            "(occ * 1000) DIV n_docs AS mean_len_milli")
        val glob = moments
          .agg(sum(col("occ")).as("occ_g"), sum(col("n_docs")).as("docs_g"))
          .selectExpr("(occ_g * 1000) DIV docs_g AS glob_milli")
        val scored = perSrc.crossJoin(broadcast(glob))
          .selectExpr("source", "n_docs", "mean_len_milli",
            // milli-scaled so no division touches the signed excess (DIV
            // truncates toward zero in Spark but DuckDB // floors — they
            // disagree exactly on negatives)
            "greatest(1000000000 + (glob_milli - mean_len_milli) * 200, 100000000) AS score_q")
        val tot = scored.agg(sum(col("score_q")).as("score_tot"))
        scored.crossJoin(broadcast(tot))
          .selectExpr("source", "n_docs", "mean_len_milli", "score_q",
            "(score_q * 1000000) DIV score_tot AS weight_ppm")
      },
      Some(s"""WITH ${Entries57.tokenCountsCte},
              |per AS (
              |  SELECT source,
              |    CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
              |    (CAST(sum(cnt) AS BIGINT) * 1000)
              |      // CAST(count(DISTINCT doc_id) AS BIGINT) AS mean_len_milli
              |  FROM tc JOIN documents USING (doc_id)
              |  GROUP BY 1),
              |gl AS (
              |  SELECT (CAST(sum(cnt) AS BIGINT) * 1000)
              |    // CAST(count(DISTINCT doc_id) AS BIGINT) AS glob_milli
              |  FROM tc),
              |scored AS (
              |  SELECT source, n_docs, mean_len_milli,
              |    greatest(1000000000 + (glob_milli - mean_len_milli) * 200,
              |      100000000) AS score_q
              |  FROM per CROSS JOIN gl),
              |tot AS (SELECT CAST(sum(score_q) AS BIGINT) AS score_tot
              |        FROM scored)
              |SELECT source, n_docs, mean_len_milli, score_q,
              |  (score_q * 1000000) // score_tot AS weight_ppm
              |FROM scored CROSS JOIN tot""".stripMargin)))
}
