package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-9 batch 1: rank statistics (Spearman), market concentration (HHI),
  * Gopher-style document quality gates, lexical diversity, daily-revenue
  * autocorrelation, BM25 term-frequency components.
  *
  * Determinism discipline (see verify SKILL): everything integer until the
  * final rho/score, which is a div/mul/sqrt chain on bit-identical operands
  * in both engines — no ln/exp anywhere.
  */
object Entries57 {

  /** Doubled average rank (2·avgrank is always an integer, even with ties)
    * computed on the REDUCED value domain: groupBy(g, v).count, then a
    * cumulative window over the distinct values. The window input is
    * |distinct values| per group, not |rows| — the q132 winsorize shape. */
  private def doubledRanks(fact: DataFrame, g: String, v: String,
                           out: String): DataFrame = {
    val w = Window.partitionBy(col(g)).orderBy(col(v))
      .rowsBetween(Window.unboundedPreceding, -1)
    fact.groupBy(col(g), col(v)).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .select(col(g), col(v),
        (lit(2L) * col("cum") + col("cnt") + lit(1L)).as(out))
  }

  /** token counts per (doc_id, tok) — the shared reduced relation for the
    * text-quality family (one explode, then everything is aggregates). */
  private[graft] def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("cnt"))

  private[graft] val tokenCountsCte =
    """tc AS (
      |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS cnt
      |  FROM (SELECT doc_id,
      |          unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |        FROM documents)
      |  GROUP BY 1, 2)""".stripMargin

  val all: Seq[Q] = Seq(

    // SPEARMAN RANK CORRELATION quantity↔price per returnflag — the robust
    // cousin of the Pearson matrix (q58). Ranks are doubled average ranks
    // (integers under ties) from the reduced value domain; every sum is
    // BIGINT (max Σ cnt·(2n)² ≈ 3e16 at sf0.1, safe under 2^63 through
    // sf1); rho is one double div/sqrt chain → floor(·1e9). At 100 TB the
    // only windows run over |distinct quantities| and |distinct prices|.
    Q("q321_spearman_corr",
      (s, d) => {
        // persisted (plan census r9): both rank ladders and the pair
        // domain read the same three columns
        val fact = Tables.lineitem(s, d).select(
          col("l_returnflag").as("g"),
          round(col("l_quantity") * 100).cast("long").as("x"),
          round(col("l_extendedprice") * 100).cast("long").as("y"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val rx = doubledRanks(fact, "g", "x", "rx2")
        val ry = doubledRanks(fact, "g", "y", "ry2")
        val dxy = fact.groupBy(col("g"), col("x"), col("y"))
          .agg(count(lit(1)).as("cnt"))
        val sums = dxy.join(rx, Seq("g", "x")).join(ry, Seq("g", "y"))
          .groupBy(col("g"))
          .agg(sum(col("cnt")).as("n"),
            sum(col("cnt") * col("rx2")).as("sx"),
            sum(col("cnt") * col("ry2")).as("sy"),
            sum(col("cnt") * col("rx2") * col("rx2")).as("sxx"),
            sum(col("cnt") * col("ry2") * col("ry2")).as("syy"),
            sum(col("cnt") * col("rx2") * col("ry2")).as("sxy"))
        val nD = col("n").cast("double")
        val sxD = col("sx").cast("double")
        val syD = col("sy").cast("double")
        sums.select(col("g").as("l_returnflag"), col("n"),
          floor(((nD * col("sxy").cast("double") - sxD * syD) /
            (sqrt(nD * col("sxx").cast("double") - sxD * sxD) *
              sqrt(nD * col("syy").cast("double") - syD * syD))) * 1e9)
            .cast("long").as("rho_q"))
      },
      Some("""WITH f AS (
             |  SELECT l_returnflag AS g,
             |    CAST(round(l_quantity * 100) AS BIGINT) AS x,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
             |  FROM lineitem),
             |dx AS (SELECT g, x, CAST(count(*) AS BIGINT) AS cnt
             |       FROM f GROUP BY 1, 2),
             |rx AS (SELECT g, x,
             |    2 * COALESCE(CAST(sum(cnt) OVER (PARTITION BY g ORDER BY x
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS BIGINT), 0) + cnt + 1 AS rx2
             |  FROM dx),
             |dy AS (SELECT g, y, CAST(count(*) AS BIGINT) AS cnt
             |       FROM f GROUP BY 1, 2),
             |ry AS (SELECT g, y,
             |    2 * COALESCE(CAST(sum(cnt) OVER (PARTITION BY g ORDER BY y
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             |      AS BIGINT), 0) + cnt + 1 AS ry2
             |  FROM dy),
             |dxy AS (SELECT g, x, y, CAST(count(*) AS BIGINT) AS cnt
             |        FROM f GROUP BY 1, 2, 3),
             |s AS (
             |  SELECT g, CAST(sum(cnt) AS BIGINT) AS n,
             |    CAST(sum(cnt * rx2) AS BIGINT) AS sx,
             |    CAST(sum(cnt * ry2) AS BIGINT) AS sy,
             |    CAST(sum(cnt * rx2 * rx2) AS BIGINT) AS sxx,
             |    CAST(sum(cnt * ry2 * ry2) AS BIGINT) AS syy,
             |    CAST(sum(cnt * rx2 * ry2) AS BIGINT) AS sxy
             |  FROM dxy JOIN rx USING (g, x) JOIN ry USING (g, y)
             |  GROUP BY g)
             |SELECT g AS l_returnflag, n,
             |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1e9)
             |    AS BIGINT) AS rho_q
             |FROM s""".stripMargin)),

    // HERFINDAHL–HIRSCHMAN INDEX of supplier revenue per nation — market
    // concentration beside Gini (q173) and market share (q207). Shares are
    // integer ppm (rev·1e6 DIV total, max ~2e16 safe), HHI = Σ share_ppm²
    // ≤ 1e12. One shuffle on l_suppkey; supplier/nation dims broadcast;
    // nation totals re-broadcast for the share division.
    Q("q322_hhi_concentration",
      (s, d) => {
        val bySupp = Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            round(col("l_extendedprice") * 100).cast("long").as("c"))
          .groupBy(col("l_suppkey")).agg(sum(col("c")).as("rev_c"))
          .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey"))),
            col("l_suppkey") === col("s_suppkey"))
          .join(broadcast(Tables.nation(s, d)
            .select(col("n_nationkey"), col("n_name"))),
            col("s_nationkey") === col("n_nationkey"))
          // persisted: per-supplier revenue (|suppliers| rows) feeds the
          // nation totals AND the share join — uncached, the lineitem
          // aggregation replans twice (plan census r8)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = bySupp.groupBy(col("n_name"))
          .agg(sum(col("rev_c")).as("tot_c"))
        bySupp.join(broadcast(tot), Seq("n_name"))
          .withColumn("share_ppm",
            expr("rev_c * 1000000L DIV tot_c"))
          .groupBy(col("n_name"))
          .agg(count(lit(1)).as("n_suppliers"),
            max(col("tot_c")).as("tot_c"),
            sum(col("share_ppm") * col("share_ppm")).as("hhi_q"),
            max(col("share_ppm")).as("top_share_ppm"))
      },
      Some("""WITH bs AS (
             |  SELECT n_name,
             |    CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_c
             |  FROM lineitem
             |  JOIN supplier ON l_suppkey = s_suppkey
             |  JOIN nation ON s_nationkey = n_nationkey
             |  GROUP BY n_name, l_suppkey),
             |t AS (SELECT n_name, CAST(sum(rev_c) AS BIGINT) AS tot_c
             |      FROM bs GROUP BY 1),
             |sh AS (SELECT bs.n_name, tot_c,
             |         rev_c * 1000000 // tot_c AS share_ppm
             |       FROM bs JOIN t ON bs.n_name = t.n_name)
             |SELECT n_name, CAST(count(*) AS BIGINT) AS n_suppliers,
             |  CAST(max(tot_c) AS BIGINT) AS tot_c,
             |  CAST(sum(share_ppm * share_ppm) AS BIGINT) AS hhi_q,
             |  CAST(max(share_ppm) AS BIGINT) AS top_share_ppm
             |FROM sh GROUP BY 1""".stripMargin)),

    // GOPHER-STYLE QUALITY GATES (Rae et al. 2021 §A1.1 shape): word-count
    // bounds, mean word length, top-token repetition cap, stopword
    // presence — each doc gets a fail bitmask, output is the per-source
    // census. Everything derives from ONE (doc, tok) count relation: one
    // explode + two hash aggregates; no windows, no joins on rows.
    Q("q323_gopher_rules",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val byDoc = tokenCounts(docs)
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_words"),
            max(col("cnt")).as("top_cnt"),
            sum(col("cnt") * length(col("tok"))).as("char_sum"),
            sum(when(col("tok").isin("the", "a"), 1L).otherwise(0L))
              .as("stop_hits"))
        val flagged = byDoc.withColumn("fail_mask",
          when(expr("n_words BETWEEN 30 AND 100000"), lit(0L)).otherwise(1L)
            + when(expr("100 * char_sum DIV n_words BETWEEN 250 AND 800"),
                lit(0L)).otherwise(2L)
            + when(col("top_cnt") * 100 <= col("n_words") * 12, lit(0L))
                .otherwise(4L)
            + when(col("stop_hits") >= 1, lit(0L)).otherwise(8L))
        flagged.join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
          .groupBy(col("source"), col("fail_mask"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("words"))
      },
      Some(s"""WITH $tokenCountsCte,
             |d AS (
             |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
             |    CAST(max(cnt) AS BIGINT) AS top_cnt,
             |    CAST(sum(cnt * len(tok)) AS BIGINT) AS char_sum,
             |    CAST(sum(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0 END)
             |      AS BIGINT) AS stop_hits
             |  FROM tc GROUP BY 1),
             |f AS (
             |  SELECT doc_id, n_words,
             |    CASE WHEN n_words BETWEEN 30 AND 100000 THEN 0 ELSE 1 END
             |    + CASE WHEN 100 * char_sum // n_words BETWEEN 250 AND 800
             |        THEN 0 ELSE 2 END
             |    + CASE WHEN top_cnt * 100 <= n_words * 12 THEN 0 ELSE 4 END
             |    + CASE WHEN stop_hits >= 1 THEN 0 ELSE 8 END AS fail_mask
             |  FROM d)
             |SELECT source, CAST(fail_mask AS BIGINT) AS fail_mask,
             |  CAST(count(*) AS BIGINT) AS n_docs,
             |  CAST(sum(n_words) AS BIGINT) AS words
             |FROM f JOIN documents USING (doc_id)
             |GROUP BY 1, 2""".stripMargin)),

    // LEXICAL DIVERSITY per language: type-token ratio and hapax-legomena
    // share, aggregated from the same (doc, tok) reduced relation. The
    // corpus-health metric next to vocab growth (q259) / Zipf slope
    // (q298): falling TTR at constant volume = dedup failure upstream.
    Q("q324_lexical_diversity",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val byDoc = tokenCounts(docs)
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_types"),
            sum(col("cnt")).as("n_words"),
            sum(when(col("cnt") === 1, 1L).otherwise(0L)).as("hapax"))
          .withColumn("ttr_k", expr("1000 * n_types DIV n_words"))
        byDoc.join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("docs"),
            sum(col("n_words")).as("words"),
            sum(col("n_types")).as("types"),
            sum(col("hapax")).as("hapax"),
            sum(col("ttr_k")).as("ttr_k_sum"),
            min(col("ttr_k")).as("ttr_k_min"),
            max(col("ttr_k")).as("ttr_k_max"))
      },
      Some(s"""WITH $tokenCountsCte,
             |d AS (
             |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_types,
             |    CAST(sum(cnt) AS BIGINT) AS n_words,
             |    CAST(sum(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             |      AS hapax
             |  FROM tc GROUP BY 1),
             |e AS (SELECT *, 1000 * n_types // n_words AS ttr_k FROM d)
             |SELECT lang, CAST(count(*) AS BIGINT) AS docs,
             |  CAST(sum(n_words) AS BIGINT) AS words,
             |  CAST(sum(n_types) AS BIGINT) AS types,
             |  CAST(sum(hapax) AS BIGINT) AS hapax,
             |  CAST(sum(ttr_k) AS BIGINT) AS ttr_k_sum,
             |  CAST(min(ttr_k) AS BIGINT) AS ttr_k_min,
             |  CAST(max(ttr_k) AS BIGINT) AS ttr_k_max
             |FROM e JOIN documents USING (doc_id)
             |GROUP BY 1""".stripMargin)),

    // AUTOCORRELATION of daily revenue at lags 1..7 — the seasonality
    // detector feeding q227 (seasonal naive) / q172 (decompose): Pearson
    // rho between (day t, day t−k) pairs. The series is the DAILY rollup
    // (|days| rows, ~2.4k), so the lag join is a join on a tiny relation
    // regardless of fact size; values in integer decicents keep every sum
    // far under 2^63.
    Q("q325_acf_daily",
      (s, d) => {
        val daily = Tables.orders(s, d)
          .select(datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("day"),
            round(col("o_totalprice") * 100).cast("long").as("c"))
          .groupBy(col("day"))
          .agg(expr("sum(c) DIV 1000").as("x"))
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
        sums.select(col("k"), col("n"),
          floor(((nD * col("sxy").cast("double") - sxD * syD) /
            (sqrt(nD * col("sxx").cast("double") - sxD * sxD) *
              sqrt(nD * col("syy").cast("double") - syD * syD))) * 1e9)
            .cast("long").as("rho_q"))
      },
      Some("""WITH daily AS (
             |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
             |      AS BIGINT) AS day,
             |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
             |      AS BIGINT) // 1000 AS x
             |  FROM orders GROUP BY 1),
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
             |  FROM p GROUP BY 1)
             |SELECT CAST(k AS BIGINT) AS k, n,
             |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             |      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             |    (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
             |     sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             |        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))) * 1e9)
             |    AS BIGINT) AS rho_q
             |FROM s""".stripMargin)),

    // BM25 TERM COMPONENTS (Robertson/Spärck Jones, k1=1.2 b=0.75) for a
    // fixed query-term set: per (doc, term) the saturated/length-normalized
    // tf weight, plus the df and N the idf would use (kept as integers —
    // no ln in oracle-checked output). Extends the IR family q59 (TF-IDF) /
    // q137 (phrase search). avgdl is computed ONCE as a double and reused,
    // so the div/mul chain is bit-identical across engines.
    Q("q326_bm25_components",
      (s, d) => {
        val terms = Seq("spark", "join", "window", "table")
        val docs = Tables.documents(s, d)
        // persisted: the (doc, token) count relation feeds the doc-length
        // census and the term filter — uncached, the corpus tokenize-
        // explode replans per consumer (plan census r8: 4 Generates -> 1)
        val tc = tokenCounts(docs)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val byDoc = tc.groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("dl"))
        val totals = byDoc.agg(sum(col("dl")).as("totw"),
          count(lit(1)).as("n_docs"))
        val tf = tc.filter(col("tok").isin(terms: _*))
          .select(col("doc_id"), col("tok").as("term"), col("cnt").as("tf"))
        val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
        val avgdl = col("totw").cast("double") / col("n_docs").cast("double")
        tf.join(byDoc, Seq("doc_id"))
          .join(broadcast(df), Seq("term"))
          .crossJoin(broadcast(totals))
          .select(col("term"), col("doc_id"), col("tf"), col("dl"),
            col("df"), col("n_docs"),
            floor((col("tf").cast("double") * lit(2.2) /
              (col("tf").cast("double") + lit(1.2) *
                (lit(0.25) + lit(0.75) * col("dl").cast("double") / avgdl)))
              * 1e6).cast("long").as("tfnorm_q"))
      },
      Some(s"""WITH $tokenCountsCte,
             |d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS dl
             |      FROM tc GROUP BY 1),
             |t AS (SELECT CAST(sum(dl) AS BIGINT) AS totw,
             |        CAST(count(*) AS BIGINT) AS n_docs FROM d),
             |tf AS (SELECT doc_id, tok AS term, cnt AS tf FROM tc
             |       WHERE tok IN ('spark', 'join', 'window', 'table')),
             |df AS (SELECT term, CAST(count(*) AS BIGINT) AS df
             |       FROM tf GROUP BY 1)
             |SELECT term, doc_id, tf, dl, df, n_docs,
             |  CAST(floor((CAST(tf AS DOUBLE) * 2.2 /
             |    (CAST(tf AS DOUBLE) + 1.2 *
             |      (0.25 + 0.75 * CAST(dl AS DOUBLE) /
             |        (CAST(totw AS DOUBLE) / CAST(n_docs AS DOUBLE)))))
             |    * 1e6) AS BIGINT) AS tfnorm_q
             |FROM tf JOIN d USING (doc_id) JOIN df USING (term)
             |CROSS JOIN t""".stripMargin)))
}
