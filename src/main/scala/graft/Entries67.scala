package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q
import graft.ext.Dedup

/** Round-9 batch 11 — training-pipeline planning axis: vocabulary coverage
  * curve, context-window truncation loss, filter length-bias check, LSH
  * bucket occupancy, exact token water-filling across sources, and a
  * MinHash estimate-error census.
  */
object Entries67 {

  val all: Seq[Q] = Seq(

    // VOCABULARY COVERAGE CURVE: share of corpus token OCCURRENCES covered
    // by the top-k vocabulary, k ∈ {5, 10, 20, 40} — the truncation
    // planning table behind q73 (vocab encode) and q242 (OOV rate): pick
    // the k where the curve flattens. One frequency table, one ranked
    // cumulative on the vocabulary domain.
    Q("q381_vocab_coverage",
      (s, d) => {
        val freq = Entries57.tokenCounts(Tables.documents(s, d))
          .groupBy(col("tok")).agg(sum(col("cnt")).as("f"))
        val w = Window.orderBy(col("f").desc, col("tok").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val ranked = freq
          .withColumn("rk", row_number().over(
            Window.orderBy(col("f").desc, col("tok").asc)))
          .withColumn("cum", sum(col("f")).over(w))
        val tot = freq.agg(sum(col("f")).as("total"),
          count(lit(1)).as("vocab_n"))
        val ks = s.createDataFrame(Seq(Tuple1(5L), Tuple1(10L),
          Tuple1(20L), Tuple1(40L))).toDF("k")
        ranked.crossJoin(broadcast(ks))
          .filter(col("rk") <= col("k"))
          .groupBy(col("k"))
          .agg(max(col("cum")).as("covered"),
            count(lit(1)).as("vocab_used"))
          .crossJoin(broadcast(tot))
          .select(col("k"), col("vocab_used"), col("vocab_n"),
            col("covered"), col("total"),
            expr("(covered * 1000000L) DIV total").as("cov_ppm"))
      },
      Some(s"""WITH ${Entries57.tokenCountsCte},
              |freq AS (SELECT tok, CAST(sum(cnt) AS BIGINT) AS f
              |         FROM tc GROUP BY 1),
              |rk AS (
              |  SELECT tok, f,
              |    row_number() OVER (ORDER BY f DESC, tok ASC) AS rk,
              |    CAST(sum(f) OVER (ORDER BY f DESC, tok ASC ROWS BETWEEN
              |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              |  FROM freq),
              |t AS (SELECT CAST(sum(f) AS BIGINT) AS total,
              |        CAST(count(*) AS BIGINT) AS vocab_n FROM freq)
              |SELECT k, CAST(count(*) AS BIGINT) AS vocab_used, vocab_n,
              |  CAST(max(cum) AS BIGINT) AS covered, total,
              |  (CAST(max(cum) AS BIGINT) * 1000000) // total AS cov_ppm
              |FROM rk CROSS JOIN (SELECT unnest([5, 10, 20, 40]) AS k)
              |CROSS JOIN t
              |WHERE rk <= k
              |GROUP BY k, vocab_n, total""".stripMargin)),

    // CONTEXT-WINDOW TRUNCATION LOSS at max_len = 64 tokens: per source,
    // the docs that fit, the tokens kept, and the ppm of token mass lost
    // to truncation — the "what does this context length cost ME" table
    // beside sequence packing (q60/q131). One pass, all integer.
    Q("q382_truncation_loss",
      (s, d) => {
        Tables.documents(s, d)
          .select(col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long")
              .as("n_words"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("docs"),
            sum(col("n_words")).as("tokens"),
            sum(least(col("n_words"), lit(64L))).as("tokens_kept"),
            sum(when(col("n_words") <= 64L, 1L).otherwise(0L))
              .as("docs_fit"))
          .select(col("source"), col("docs"), col("tokens"),
            col("tokens_kept"), col("docs_fit"),
            expr("((tokens - tokens_kept) * 1000000L) DIV tokens")
              .as("loss_ppm"),
            expr("(docs_fit * 1000000L) DIV docs").as("fit_ppm"))
      },
      Some("""WITH d AS (
             |  SELECT source,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+'))
             |      AS BIGINT) AS n_words
             |  FROM documents)
             |SELECT source, CAST(count(*) AS BIGINT) AS docs,
             |  CAST(sum(n_words) AS BIGINT) AS tokens,
             |  CAST(sum(least(n_words, 64)) AS BIGINT) AS tokens_kept,
             |  CAST(sum(CASE WHEN n_words <= 64 THEN 1 ELSE 0 END)
             |    AS BIGINT) AS docs_fit,
             |  ((CAST(sum(n_words) AS BIGINT)
             |    - CAST(sum(least(n_words, 64)) AS BIGINT)) * 1000000)
             |    // CAST(sum(n_words) AS BIGINT) AS loss_ppm,
             |  (CAST(sum(CASE WHEN n_words <= 64 THEN 1 ELSE 0 END)
             |    AS BIGINT) * 1000000) // CAST(count(*) AS BIGINT)
             |    AS fit_ppm
             |FROM d GROUP BY 1""".stripMargin)),

    // FILTER LENGTH-BIAS CHECK: point-biserial correlation between
    // passing the q323 Gopher gates and document length — a strongly
    // positive r_pb means the "quality" filter is secretly a length
    // filter, the classic curation failure mode. Integer sufficient
    // statistics; one double chain.
    Q("q383_length_bias",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val byDoc = Entries57.tokenCounts(docs)
          .groupBy(col("doc_id"))
          .agg(sum(col("cnt")).as("n_words"),
            max(col("cnt")).as("top_cnt"),
            sum(col("cnt") * length(col("tok"))).as("char_sum"),
            sum(when(col("tok").isin("the", "a"), 1L).otherwise(0L))
              .as("stop_hits"))
        val flagged = byDoc.select(col("doc_id"),
          (expr("n_words BETWEEN 30 AND 100000") &&
            expr("100 * char_sum DIV n_words BETWEEN 250 AND 800") &&
            (col("top_cnt") * 100 <= col("n_words") * 12) &&
            (col("stop_hits") >= 1)).cast("long").as("pass"))
        val joined = flagged
          .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        val t = joined.agg(count(lit(1)).as("n"),
          sum(col("pass")).as("sb"),
          sum(col("n_chars")).as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"),
          sum(col("pass") * col("n_chars")).as("sbx"))
        val nD = col("n").cast("double")
        val sbD = col("sb").cast("double")
        val sxD = col("sx").cast("double")
        t.select(col("n"), col("sb").as("n_pass"),
          floor(((nD * col("sbx").cast("double") - sbD * sxD) /
            (sqrt(nD * sbD - sbD * sbD) *
              sqrt(nD * col("sxx").cast("double") - sxD * sxD))) * 1e9)
            .cast("long").as("rpb_q"))
      },
      Some(s"""WITH ${Entries57.tokenCountsCte},
              |d AS (
              |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_words,
              |    CAST(max(cnt) AS BIGINT) AS top_cnt,
              |    CAST(sum(cnt * len(tok)) AS BIGINT) AS char_sum,
              |    CAST(sum(CASE WHEN tok IN ('the', 'a') THEN 1 ELSE 0
              |      END) AS BIGINT) AS stop_hits
              |  FROM tc GROUP BY 1),
              |f AS (
              |  SELECT doc_id,
              |    CASE WHEN n_words BETWEEN 30 AND 100000
              |      AND 100 * char_sum // n_words BETWEEN 250 AND 800
              |      AND top_cnt * 100 <= n_words * 12
              |      AND stop_hits >= 1 THEN 1 ELSE 0 END AS pass
              |  FROM d),
              |j AS (SELECT pass, n_chars FROM f
              |      JOIN documents USING (doc_id)),
              |t AS (
              |  SELECT CAST(count(*) AS BIGINT) AS n,
              |    CAST(sum(pass) AS BIGINT) AS sb,
              |    CAST(sum(n_chars) AS BIGINT) AS sx,
              |    CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
              |    CAST(sum(pass * n_chars) AS BIGINT) AS sbx
              |  FROM j)
              |SELECT n, sb AS n_pass,
              |  CAST(floor(((CAST(n AS DOUBLE) * CAST(sbx AS DOUBLE)
              |      - CAST(sb AS DOUBLE) * CAST(sx AS DOUBLE)) /
              |    (sqrt(CAST(n AS DOUBLE) * CAST(sb AS DOUBLE)
              |        - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)) *
              |     sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              |        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))) * 1e9)
              |    AS BIGINT) AS rpb_q
              |FROM t""".stripMargin)),

    // LSH BUCKET OCCUPANCY: per band of the q23 MinHash banding, the
    // bucket-size distribution (buckets, max size, singleton share, and
    // candidate pairs Σ s·(s−1)/2) — the capacity-planning view of the
    // banding: a hot bucket is the LSH skew axis at 100 TB.
    Q("q384_lsh_occupancy",
      (s, d) => {
        // persisted: the wide signature table feeds one union branch PER
        // BAND — uncached, the corpus shingle explode + 64-hash min
        // replans once per band (plan census r8: 4 scans -> 1)
        val wide = Dedup.minhashWide(Tables.documents(s, d), 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bands = (0 until Dedup.NumHashes / Dedup.BandSize).map { b =>
          wide.select(lit(b.toLong).as("band"),
            concat_ws(",", (0 until Dedup.BandSize).map(r =>
              col(s"h${b * Dedup.BandSize + r}")): _*).as("sig"))
        }.reduce(_.unionByName(_))
        bands.groupBy(col("band"), col("sig"))
          .agg(count(lit(1)).as("sz"))
          .groupBy(col("band"))
          .agg(count(lit(1)).as("n_buckets"),
            sum(col("sz")).as("n_docs"),
            max(col("sz")).as("max_bucket"),
            sum(when(col("sz") === 1, 1L).otherwise(0L)).as("singletons"),
            expr("sum((sz * (sz - 1)) DIV 2)").as("cand_pairs"))
      },
      Some(s"""WITH ${ExtEntries.shinglesCte}, ${ExtEntries.shingleIdCte},
              |${ExtEntries.minhashLongCte},
              |bs AS (
              |  SELECT doc_id, j // 4 AS band,
              |    string_agg(CAST(minh AS VARCHAR), ',' ORDER BY j)
              |      AS sig
              |  FROM sigs GROUP BY 1, 2),
              |bu AS (SELECT band, sig, CAST(count(*) AS BIGINT) AS sz
              |       FROM bs GROUP BY 1, 2)
              |SELECT CAST(band AS BIGINT) AS band,
              |  CAST(count(*) AS BIGINT) AS n_buckets,
              |  CAST(sum(sz) AS BIGINT) AS n_docs,
              |  CAST(max(sz) AS BIGINT) AS max_bucket,
              |  CAST(sum(CASE WHEN sz = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |    AS singletons,
              |  CAST(sum((sz * (sz - 1)) // 2) AS BIGINT) AS cand_pairs
              |FROM bu GROUP BY 1""".stripMargin)),

    // EXACT TOKEN WATER-FILLING: split a token budget (half the corpus)
    // across sources with a common cap L — the closed-form level search
    // on the sorted source domain (prefix sums locate the threshold, no
    // iteration): sources below L keep everything, the rest are capped.
    // The budgeted version of mixture sampling (q103).
    Q("q385_token_waterfill",
      (s, d) => {
        // persisted: the per-source token totals (|sources| rows) feed the
        // grand total, the ranked level search, and the final allocation —
        // uncached, the corpus tokenize replans per consumer (census r8)
        val src = Tables.documents(s, d)
          .select(col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("nw"))
          .groupBy(col("source")).agg(sum(col("nw")).as("t"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = src.agg(sum(col("t")).as("tt"),
          count(lit(1)).as("ns"))
        val w = Window.orderBy(col("t"), col("source"))
        val wc = w.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val ranked = src
          .withColumn("i", row_number().over(w).cast("long"))
          .withColumn("p", sum(col("t")).over(wc))
          .crossJoin(broadcast(tot))
          .withColumn("budget", expr("tt DIV 2"))
        val lvl = ranked
          .filter(col("p") - col("t") +
            (col("ns") - col("i") + 1) * col("t") >= col("budget"))
          .agg(min(struct(col("i"), col("p"), col("t"), col("ns"),
            col("budget"))).as("th"))
          .select(expr("(th.budget - (th.p - th.t)) DIV (th.ns - th.i + 1)")
            .as("level"))
        src.crossJoin(broadcast(lvl))
          .crossJoin(broadcast(tot))
          .select(col("source"), col("t").as("tokens"),
            least(col("t"), col("level")).as("alloc"),
            (col("t") > col("level")).as("capped"),
            col("level"), expr("tt DIV 2").as("budget"))
      },
      Some("""WITH src AS (
             |  SELECT source,
             |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
             |      AS BIGINT) AS t
             |  FROM documents GROUP BY 1),
             |tot AS (SELECT CAST(sum(t) AS BIGINT) AS tt,
             |          CAST(count(*) AS BIGINT) AS ns FROM src),
             |rk AS (
             |  SELECT source, t,
             |    CAST(row_number() OVER (ORDER BY t, source) AS BIGINT)
             |      AS i,
             |    CAST(sum(t) OVER (ORDER BY t, source ROWS BETWEEN
             |      UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
             |    tt, ns, tt // 2 AS budget
             |  FROM src CROSS JOIN tot),
             |th AS (
             |  SELECT i, p, t, ns, budget,
             |    row_number() OVER (ORDER BY i) AS rn
             |  FROM rk
             |  WHERE p - t + (ns - i + 1) * t >= budget),
             |lvl AS (
             |  SELECT (budget - (p - t)) // (ns - i + 1) AS level
             |  FROM th WHERE rn = 1)
             |SELECT source, t AS tokens,
             |  least(t, level) AS alloc,
             |  t > level AS capped,
             |  level, tt // 2 AS budget
             |FROM src CROSS JOIN lvl CROSS JOIN tot""".stripMargin)),

    // MINHASH ESTIMATE ERROR CENSUS: on every exact-Jaccard pair ≥ 0.3,
    // the 16-hash MinHash estimate (matches/16) against the exact value —
    // summed absolute and signed errors kept as INTEGER ppm sums (no
    // division, so no truncation-direction mismatch on the signed bias).
    // The measured companion to the analytic S-curve (q177).
    Q("q386_minhash_error",
      (s, d) => {
        // persisted: sh feeds the size census and both self-join sides;
        // sigs feeds both signature sides — uncached, the two corpus-wide
        // explodes replan 8 times total (plan census r8)
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
          .withColumn("exact_ppm",
            expr("(ix * 1000000L) DIV (na + nb - ix)"))
          .filter(col("exact_ppm") >= 300000L)
        val sigs = Dedup.minhashLong(Tables.documents(s, d), 3)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val est = pairs
          .join(sigs.select(col("doc_id").as("d1"), col("j"),
            col("minh").as("ma")), Seq("d1"))
          .join(sigs.select(col("doc_id").as("d2"), col("j"),
            col("minh").as("mb")), Seq("d2", "j"))
          .groupBy(col("d1"), col("d2"), col("exact_ppm"))
          .agg(sum(when(col("ma") === col("mb"), 1L).otherwise(0L))
            .as("matches"))
          .withColumn("est_ppm", expr("(matches * 1000000L) DIV 16L"))
        est.agg(count(lit(1)).as("n_pairs"),
          sum(abs(col("est_ppm") - col("exact_ppm"))).as("abs_err_sum"),
          sum(col("est_ppm") - col("exact_ppm")).as("signed_err_sum"))
      },
      Some(s"""WITH ${ExtEntries.shinglesCte}, ${ExtEntries.shingleIdCte},
              |${ExtEntries.minhashLongCte},
              |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
              |        FROM shid GROUP BY 1),
              |pr AS (
              |  SELECT a.doc_id AS d1, b.doc_id AS d2,
              |    CAST(count(*) AS BIGINT) AS ix
              |  FROM shid a JOIN shid b
              |    ON a.sid = b.sid AND a.doc_id < b.doc_id
              |  GROUP BY 1, 2),
              |ex AS (
              |  SELECT d1, d2,
              |    (ix * 1000000) // (ca.n + cb.n - ix) AS exact_ppm
              |  FROM pr JOIN cnt ca ON d1 = ca.doc_id
              |          JOIN cnt cb ON d2 = cb.doc_id
              |  WHERE (ix * 1000000) // (ca.n + cb.n - ix) >= 300000),
              |est AS (
              |  SELECT d1, d2, exact_ppm,
              |    (CAST(sum(CASE WHEN sa.minh = sb.minh THEN 1 ELSE 0
              |      END) AS BIGINT) * 1000000) // 16 AS est_ppm
              |  FROM ex
              |  JOIN sigs sa ON sa.doc_id = d1
              |  JOIN sigs sb ON sb.doc_id = d2 AND sb.j = sa.j
              |  GROUP BY 1, 2, 3)
              |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              |  CAST(sum(abs(est_ppm - exact_ppm)) AS BIGINT)
              |    AS abs_err_sum,
              |  CAST(sum(est_ppm - exact_ppm) AS BIGINT)
              |    AS signed_err_sum
              |FROM est""".stripMargin)))
}
