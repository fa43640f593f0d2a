package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q
import graft.ext.UnigramLm

/** Round-11 batch 1 — the tokenizer-training and data-selection frontier
  * from the round-10 build list: unigram-LM (SentencePiece-style) tokenizer
  * training with its encode twin (the missing trainable family beside the
  * q121/q138 BPE pair), and DSIR hashed-ngram importance resampling (the
  * importance-weighting complement of q418's Moore–Lewis selection).
  * Everything replays in DuckDB: integer counts, the q300 1e-4 integer-log
  * grid (one floored ln per term), deterministic md5-derived uniforms.
  */
object Entries74 {

  def all: Seq[Q] = base ++ hll ++ Seq(hllRollup, hllOverlap)

  private val base: Seq[Q] = Seq(

    // UNIGRAM-LM TOKENIZER TRAINING (Kudo 2018, arXiv:1804.10959), hard-EM
    // variant: substring seed vocab -> integer-log seed scores -> 2 rounds
    // of (Viterbi E-step as a 12-round relational DP unroll, add-one
    // M-step re-score). Output = the final vocabulary with freq-weighted
    // usage counts and smoothed scores. The oracle replays the ENTIRE
    // training loop (every DP round a materialized CTE) bit-for-bit.
    Q("q419_unigram_lm",
      (s, d) => UnigramLm.train(Tables.documents(s, d)),
      Some(unigramTrainOracle(UnigramLm.Iters))),

    // UNIGRAM ENCODE (apply twin, mirroring q138's BPE encode): segment
    // the word types with the trained scores — one more Viterbi pass under
    // the final lp. Encoding the training corpus with its own model is
    // exactly what the oracle replays.
    Q("q420_unigram_encode",
      (s, d) => UnigramLm.encode(Tables.documents(s, d)),
      Some(unigramEncodeOracle(UnigramLm.Iters))),

    // DSIR — DATA SELECTION VIA IMPORTANCE RESAMPLING (Xie et al. 2023,
    // arXiv:2302.03169): hashed-bigram features (md5 -> 256 buckets),
    // target = the lang='en' train docs, raw/proposal = the full train
    // pool, add-one-smoothed bucket models. Per test doc the log
    // importance weight is the summed per-bigram lp_target − lp_raw on
    // q418's 1e-4 integer grid; RESAMPLING is the deterministic-hash
    // rejection form of the paper's weighted sampling (the q103
    // discipline): doc accepted iff ln(u) < logw − logw_max with
    // u = (2·(md5(doc_id) mod 1e6)+1)/2e6 — one floored ln per doc,
    // acceptance probability proportional to the importance weight, no
    // RNG state. Scale shape: ONE persisted hashed-bigram relation feeds
    // both bucket models and the test scoring (q418's census discipline);
    // the models are 256-row broadcasts.
    Q("q421_dsir_resample",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val sp = graft.ext.TrainPrep.hashSplit(docs, "doc_id")
        val toks = sp
          .withColumn("w", split(col("text"), " "))
          .where(size(col("w")) >= 2) // 1-token docs have no bigrams
          .select(col("doc_id"), col("lang"), col("split"),
            explode(expr(
              "transform(sequence(1, size(w) - 1), " +
                "i -> struct(element_at(w, i) AS w1, " +
                "element_at(w, i + 1) AS w2))")).as("bg"))
          .select(col("doc_id"), col("lang"), col("split"),
            pmod(graft.ext.Dedup.contentId(
              concat(col("bg.w1"), lit(" "), col("bg.w2"))), lit(256L))
              .as("b"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ct = toks.filter(col("split") === "train" && col("lang") === "en")
          .groupBy(col("b")).agg(count(lit(1)).as("ctb"))
        val cr = toks.filter(col("split") === "train")
          .groupBy(col("b")).agg(count(lit(1)).as("crb"))
        val tt = ct.agg(sum(col("ctb")).as("tt"))
        val tr = cr.agg(sum(col("crb")).as("tr"))
        def lpq(c: org.apache.spark.sql.Column,
                t: org.apache.spark.sql.Column) =
          floor(log((coalesce(c, lit(0L)) + lit(1L)).cast("double") /
            (t + lit(256L)).cast("double")) * 1e4).cast("long")
        val scored = toks.filter(col("split") === "test")
          .join(broadcast(ct), Seq("b"), "left")
          .join(broadcast(cr), Seq("b"), "left")
          .crossJoin(broadcast(tt)).crossJoin(broadcast(tr))
          .select(col("doc_id"), col("lang"),
            (lpq(col("ctb"), col("tt")) - lpq(col("crb"), col("tr")))
              .as("d_q"))
          .groupBy(col("doc_id"), col("lang"))
          .agg(count(lit(1)).as("n_bigrams"), sum(col("d_q")).as("logw_q"))
        val mx = scored.agg(max(col("logw_q")).as("mx"))
        scored.crossJoin(broadcast(mx))
          .withColumn("lnu_q",
            floor(log((pmod(graft.ext.Dedup.contentId(
              col("doc_id").cast("string")), lit(1000000L)) * 2L + 1L)
              .cast("double") / lit(2000000.0)) * 1e4).cast("long"))
          .select(col("doc_id"), col("lang"), col("n_bigrams"),
            col("logw_q"), col("lnu_q"),
            (col("lnu_q") < col("logw_q") - col("mx")).as("selected"))
      },
      Some("""WITH sp AS (
             |  SELECT doc_id, lang, text,
             |    CASE WHEN b < 8 THEN 'train' WHEN b = 8 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM (SELECT *,
             |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT
             |      % 10 AS b FROM documents)),
             |hb AS (
             |  SELECT doc_id, lang, split,
             |    ('0x' || substr(md5(w[i] || ' ' || w[i + 1]), 1, 12))::BIGINT
             |      % 256 AS b
             |  FROM (SELECT doc_id, lang, split,
             |          string_split(text, ' ') AS w FROM sp) d,
             |       (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE i <= len(w) - 1),
             |ct AS (SELECT b, CAST(count(*) AS BIGINT) AS ctb FROM hb
             |       WHERE split = 'train' AND lang = 'en' GROUP BY 1),
             |cr AS (SELECT b, CAST(count(*) AS BIGINT) AS crb FROM hb
             |       WHERE split = 'train' GROUP BY 1),
             |tt AS (SELECT CAST(coalesce(sum(ctb), 0) AS BIGINT) AS tt FROM ct),
             |tr AS (SELECT CAST(coalesce(sum(crb), 0) AS BIGINT) AS tr FROM cr),
             |scored AS (
             |  SELECT hb.doc_id, hb.lang,
             |    CAST(floor(ln(CAST(coalesce(ct.ctb, 0) + 1 AS DOUBLE) /
             |        CAST(tt.tt + 256 AS DOUBLE)) * 1e4) AS BIGINT)
             |    - CAST(floor(ln(CAST(coalesce(cr.crb, 0) + 1 AS DOUBLE) /
             |        CAST(tr.tr + 256 AS DOUBLE)) * 1e4) AS BIGINT) AS d_q
             |  FROM hb CROSS JOIN tt CROSS JOIN tr
             |  LEFT JOIN ct ON hb.b = ct.b
             |  LEFT JOIN cr ON hb.b = cr.b
             |  WHERE hb.split = 'test'),
             |agg AS (
             |  SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
             |    CAST(sum(d_q) AS BIGINT) AS logw_q
             |  FROM scored GROUP BY 1, 2),
             |mx AS (SELECT max(logw_q) AS mx FROM agg)
             |SELECT doc_id, lang, n_bigrams, logw_q,
             |  CAST(floor(ln(CAST(
             |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
             |        ::BIGINT % 1000000) * 2 + 1 AS DOUBLE)
             |      / 2000000.0) * 1e4) AS BIGINT) AS lnu_q,
             |  CAST(floor(ln(CAST(
             |      (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
             |        ::BIGINT % 1000000) * 2 + 1 AS DOUBLE)
             |      / 2000000.0) * 1e4) AS BIGINT) < logw_q - mx AS selected
             |FROM agg CROSS JOIN mx""".stripMargin)),

    // UNIGRAM COMPRESSION REPORT: the tokenizer's training objective as a
    // one-row readout — total corpus code length under the trained model
    // (nats on the 1e-4 grid, BIGINT-exact), fertility (pieces per word
    // instance, milli), used-vocab size. The oracle replays the full
    // training + encode and aggregates the same integers.
    Q("q425_unigram_report",
      (s, d) => UnigramLm.report(Tables.documents(s, d)),
      Some(unigramReportOracle(UnigramLm.Iters))),

    // SQL-TEXT SURFACE over the curation/dedup families (r10 verdict #8):
    // the DataFrame-only relations (LSH near-dup pairs, quality scores)
    // registered as lazy temp views by SqlSurface, then the quality-gated
    // dedup KEEP LIST written in PURE SQL — drop the lower-quality member
    // of every verified near-dup pair (ties break to the larger doc_id).
    // Catalyst inlines the views, so the physical plan is the q23 banded
    // pipeline + one broadcast join — identical to the DataFrame form.
    Q("q422_sql_dedup_keep",
      (s, d) => {
        graft.ext.SqlSurface.registerCurationViews(s, Tables.documents(s, d))
        s.sql("""WITH losers AS (
                |  SELECT DISTINCT
                |    CASE WHEN qa.quality_score < qb.quality_score THEN p.d1
                |         WHEN qb.quality_score < qa.quality_score THEN p.d2
                |         ELSE greatest(p.d1, p.d2) END AS doc_id
                |  FROM graft_neardup_pairs p
                |  JOIN graft_quality qa ON p.d1 = qa.doc_id
                |  JOIN graft_quality qb ON p.d2 = qb.doc_id)
                |SELECT q.doc_id, q.n_tokens, q.quality_score,
                |  CAST(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END AS INT)
                |    AS keep
                |FROM graft_quality q
                |LEFT JOIN losers l ON q.doc_id = l.doc_id""".stripMargin)
      },
      Some(s"""WITH ${ExtEntries.shinglesCte}, ${ExtEntries.shingleIdCte},
              |${ExtEntries.minhashLongCte}, ${ExtEntries.shingleCountCte},
              |${ExtEntries.shingleInterCte},
              |wide AS (
              |  SELECT doc_id,
              |    ${(0 until 16).map(j => s"min(CASE WHEN j = $j THEN minh END) AS h$j").mkString(", ")}
              |  FROM sigs GROUP BY doc_id),
              |bands AS (
              |  ${(0 until 4).map(b =>
                   s"SELECT doc_id, $b AS band, " +
                   (0 until 4).map(r => s"CAST(h${b * 4 + r} AS VARCHAR)").mkString(" || ',' || ") +
                   " AS sig FROM wide").mkString(" UNION ALL ")}),
              |cands AS (
              |  SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
              |  FROM bands x JOIN bands y
              |    ON x.band = y.band AND x.sig = y.sig AND x.doc_id < y.doc_id),
              |ndpairs AS (
              |  SELECT c.d1, c.d2
              |  FROM cands c
              |  JOIN shint ON c.d1 = shint.d1 AND c.d2 = shint.d2
              |  JOIN shcnt ca ON c.d1 = ca.doc_id
              |  JOIN shcnt cb ON c.d2 = cb.doc_id
              |  WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.5),
              |quality AS (
              |  SELECT doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
              |    least(greatest(CAST(nu AS DOUBLE) / len(w)
              |      - 0.5 * (CAST(ns AS DOUBLE) / len(w)), 0.0), 1.0)
              |      AS quality_score
              |  FROM (
              |    SELECT doc_id, w,
              |      len(list_filter(w, x -> list_contains(
              |        ['the','a','of','and','to'], x))) AS ns,
              |      len(list_distinct(w)) AS nu
              |    FROM (SELECT doc_id, string_split(text, ' ') AS w
              |          FROM documents))),
              |losers AS (
              |  SELECT DISTINCT
              |    CASE WHEN qa.quality_score < qb.quality_score THEN p.d1
              |         WHEN qb.quality_score < qa.quality_score THEN p.d2
              |         ELSE greatest(p.d1, p.d2) END AS doc_id
              |  FROM ndpairs p
              |  JOIN quality qa ON p.d1 = qa.doc_id
              |  JOIN quality qb ON p.d2 = qb.doc_id)
              |SELECT q.doc_id, q.n_tokens, q.quality_score,
              |  CAST(CASE WHEN l.doc_id IS NULL THEN 1 ELSE 0 END AS INT)
              |    AS keep
              |FROM quality q
              |LEFT JOIN losers l ON q.doc_id = l.doc_id""".stripMargin)))

  /** HyperLogLog alpha for m = 256 registers (Flajolet et al. 2007:
    * 0.7213/(1+1.079/m)), micro-quantized at BUILD TIME — the same
    * embedded-literal escape hatch as the SPRT/Bloom constants. */
  private[graft] val hllAlphaMicro: Long =
    math.floor(0.7213 / (1.0 + 1.079 / 256.0) * 1e6).toLong

  private val hll: Seq[Q] = Seq(

    // HYPERLOGLOG AS RELATIONAL ALGEBRA: the approximate COUNT(DISTINCT)
    // member of the sketch suite (bitmap = exact distincts, KLL =
    // quantiles, CMS = frequencies, Bloom = membership). No custom
    // aggregate is needed — an HLL register table IS `groupBy(key, j)
    // .agg(max(rho))`, and `max` is the merge, so the sketch is mergeable,
    // map-side-combining, and layout-free BY ALGEBRA (the same argument as
    // the bitmap OR). h = 48-bit md5 prefix; j = h mod 256 (p = 8);
    // rho = leading zeros of the remaining 40 bits + 1, computed with the
    // q315 bit-math idiom length(bin(w)) — no float log in the register
    // build. The raw estimate alpha*m^2/sum(2^-M[j]) is scaled by 2^41
    // into an exact BIGINT harmonic sum (missing registers contribute
    // 2^41 each), the one division runs on 128-bit intermediates (Spark
    // DECIMAL(38,0) DIV = DuckDB HUGEINT // on non-negative operands —
    // q413/q417), and the standard small-range rule applies LINEAR
    // COUNTING m*ln(m/V) when raw <= 2.5m and V > 0 (one floored ln on
    // the 1e-4 grid — KnifeEdge-audited; the 256/V argument has only 255
    // possible values). Keyed on orders.o_custkey per priority: the sf0.01
    // gate exercises the raw regime, sf0.001 the linear-counting branch.
    // Output keeps the exact count beside the estimate with err_ppm, the
    // measured-gate discipline of q295/q354.
    Q("q423_hll_registers",
      (s, d) => {
        val ord = Tables.orders(s, d)
        val h = graft.ext.Dedup.contentId(col("o_custkey").cast("string"))
        val regs = ord
          .select(col("o_orderpriority").as("grp"), (h % 256L).as("j"),
            (h.cast("long") / lit(256L)).cast("long").as("w"))
          .select(col("grp"), col("j"),
            when(col("w") === 0L, lit(41L))
              .otherwise(lit(41L) - length(bin(col("w"))).cast("long"))
              .as("rho"))
          .groupBy(col("grp"), col("j"))
          .agg(max(col("rho")).as("m_j"))
        val sums = regs.groupBy(col("grp"))
          .agg(count(lit(1)).as("n_regs"),
            sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(41 - m_j AS INT))"))
              .as("s_seen"))
          .select(col("grp"), (lit(256L) - col("n_regs")).as("v_zero"),
            (col("s_seen") +
              (lit(256L) - col("n_regs")) * lit(1L << 41)).as("s_scaled"))
        val exact = ord.groupBy(col("o_orderpriority").as("grp"))
          .agg(countDistinct(col("o_custkey")).as("n_exact"))
        sums.join(exact, Seq("grp"))
          .selectExpr("grp", "n_exact", "v_zero", "s_scaled",
            s"CAST(CAST($hllAlphaMicro AS DECIMAL(38,0)) * 65536 * " +
              "CAST(shiftleft(CAST(1 AS BIGINT), 41) AS DECIMAL(38,0)) DIV " +
              "(CAST(s_scaled AS DECIMAL(38,0)) * 1000) AS BIGINT) " +
              "AS raw_milli")
          // linear counting: 256 * floor(ln(256/V)*1e4) is on the 1e-4
          // grid; DIV 10 brings it to milli (operands non-negative)
          .selectExpr("grp", "n_exact", "v_zero", "s_scaled", "raw_milli",
            "CASE WHEN v_zero > 0 THEN (256 * CAST(floor(ln(256.0 / " +
              "CAST(v_zero AS DOUBLE)) * 1e4) AS BIGINT)) DIV 10 END " +
              "AS lc_milli")
          .selectExpr("grp", "n_exact", "v_zero", "s_scaled", "raw_milli",
            "lc_milli",
            "CASE WHEN raw_milli <= 640000 AND v_zero > 0 THEN lc_milli " +
              "ELSE raw_milli END AS est_milli")
          .selectExpr("grp", "n_exact", "v_zero", "s_scaled", "raw_milli",
            "lc_milli", "est_milli",
            "abs(est_milli - n_exact * 1000) * 1000000 DIV " +
              "(n_exact * 1000) AS err_ppm")
      },
      Some(s"""WITH h AS (
              |  SELECT o_orderpriority AS grp,
              |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))
              |      ::BIGINT AS hv
              |  FROM orders),
              |rho AS (
              |  SELECT grp, hv % 256 AS j,
              |    CASE WHEN hv // 256 = 0 THEN 41
              |         ELSE 41 - length(bin(hv // 256)) END AS rho
              |  FROM h),
              |regs AS (
              |  SELECT grp, j, max(rho) AS m_j
              |  FROM rho GROUP BY 1, 2),
              |sums AS (
              |  SELECT grp,
              |    256 - count(*) AS v_zero,
              |    CAST(sum(1::BIGINT << CAST(41 - m_j AS INT)) AS BIGINT)
              |      + (256 - count(*)) * (1::BIGINT << 41) AS s_scaled
              |  FROM regs GROUP BY 1),
              |exact AS (
              |  SELECT o_orderpriority AS grp,
              |    CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_exact
              |  FROM orders GROUP BY 1),
              |est0 AS (
              |  SELECT s.grp, e.n_exact,
              |    CAST(s.v_zero AS BIGINT) AS v_zero, s.s_scaled,
              |    CAST(($hllAlphaMicro::HUGEINT * 65536 *
              |      (1::HUGEINT << 41)) //
              |      (s.s_scaled::HUGEINT * 1000) AS BIGINT) AS raw_milli,
              |    CASE WHEN s.v_zero > 0 THEN
              |      (256 * CAST(floor(ln(256.0 /
              |        CAST(s.v_zero AS DOUBLE)) * 1e4) AS BIGINT)) // 10
              |    END AS lc_milli
              |  FROM sums s JOIN exact e ON s.grp = e.grp),
              |est AS (
              |  SELECT grp, n_exact, v_zero, s_scaled, raw_milli, lc_milli,
              |    CASE WHEN raw_milli <= 640000 AND v_zero > 0
              |         THEN lc_milli ELSE raw_milli END AS est_milli
              |  FROM est0)
              |SELECT grp, n_exact, v_zero, s_scaled, raw_milli, lc_milli,
              |  est_milli,
              |  abs(est_milli - n_exact * 1000) * 1000000
              |    // (n_exact * 1000) AS err_ppm
              |FROM est""".stripMargin)))

  /** Shared estimate SQL from (grp, v_zero, s_scaled) — raw HLL with the
    * linear-counting branch, identical in both engines modulo DIV/// and
    * DECIMAL/HUGEINT spellings. */
  private[graft] def hllEstSpark: String =
    s"""CASE WHEN (CAST(CAST($hllAlphaMicro AS DECIMAL(38,0)) * 65536 *
       |  CAST(shiftleft(CAST(1 AS BIGINT), 41) AS DECIMAL(38,0)) DIV
       |  (CAST(s_scaled AS DECIMAL(38,0)) * 1000) AS BIGINT)) <= 640000
       |  AND v_zero > 0
       |THEN (256 * CAST(floor(ln(256.0 / CAST(v_zero AS DOUBLE)) * 1e4)
       |  AS BIGINT)) DIV 10
       |ELSE CAST(CAST($hllAlphaMicro AS DECIMAL(38,0)) * 65536 *
       |  CAST(shiftleft(CAST(1 AS BIGINT), 41) AS DECIMAL(38,0)) DIV
       |  (CAST(s_scaled AS DECIMAL(38,0)) * 1000) AS BIGINT) END""".stripMargin
      .replace("\n", " ")

  // MONTHLY ROLLUP OF WEEKLY HLL REGISTERS — the re-aggregation story for
  // approximate distincts, sibling of the bitmap (q140), CMS (q176) and
  // KLL (q320) rollups: weekly register tables merge to month level by
  // MAX ALONE (no raw-data repass), then estimate. "month" here is a
  // 30-day EPOCH bucket, (week*7) DIV 30 — NOT a calendar month; for a
  // rollup-algebra demonstration the bucket definition is immaterial and
  // the oracle replays the same formula. The rolled-up month
  // estimate is gated against the exact month distinct count computed
  // from the raw facts — proving register max-merge loses nothing vs
  // building the month sketch directly (they are identical sets of maxima
  // by associativity; the oracle replays the whole chain).
  private val hllRollup: Q =
    Q("q424_hll_rollup",
      (s, d) => {
        val ev = Tables.events(s, d)
        val h = graft.ext.Dedup.contentId(col("user_id").cast("string"))
        val weekly = ev
          .select(expr("ts_us DIV 604800000000").as("week"),
            (h % 256L).as("j"),
            (h.cast("long") / lit(256L)).cast("long").as("w"))
          .select(col("week"), expr("(week * 7) DIV 30").as("month"),
            col("j"),
            when(col("w") === 0L, lit(41L))
              .otherwise(lit(41L) - length(bin(col("w"))).cast("long"))
              .as("rho"))
          .groupBy(col("week"), col("month"), col("j"))
          .agg(max(col("rho")).as("m_j"))
        // the rollup: month registers = max over the WEEK REGISTERS only
        val monthly = weekly.groupBy(col("month"), col("j"))
          .agg(max(col("m_j")).as("m_j"))
        val sums = monthly.groupBy(col("month"))
          .agg(count(lit(1)).as("n_regs"),
            sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(41 - m_j AS INT))"))
              .as("s_seen"))
          .select(col("month"), (lit(256L) - col("n_regs")).as("v_zero"),
            (col("s_seen") +
              (lit(256L) - col("n_regs")) * lit(1L << 41)).as("s_scaled"))
        val exact = ev
          .select(expr("(ts_us DIV 604800000000) * 7 DIV 30").as("month"),
            col("user_id"))
          .groupBy(col("month"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        sums.join(exact, Seq("month"))
          .selectExpr("month", "n_exact", "v_zero", "s_scaled",
            s"$hllEstSpark AS est_milli")
          .selectExpr("month", "n_exact", "v_zero", "s_scaled", "est_milli",
            "abs(est_milli - n_exact * 1000) * 1000000 DIV " +
              "(n_exact * 1000) AS err_ppm")
      },
      Some(s"""WITH h AS (
              |  SELECT epoch_us(ts) // 604800000000 AS week,
              |    ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
              |      ::BIGINT AS hv,
              |    user_id
              |  FROM events),
              |weekly AS (
              |  SELECT week, (week * 7) // 30 AS month, hv % 256 AS j,
              |    max(CASE WHEN hv // 256 = 0 THEN 41
              |             ELSE 41 - length(bin(hv // 256)) END) AS m_j
              |  FROM h GROUP BY 1, 2, 3),
              |monthly AS (
              |  SELECT month, j, max(m_j) AS m_j
              |  FROM weekly GROUP BY 1, 2),
              |sums AS (
              |  SELECT month,
              |    256 - count(*) AS v_zero,
              |    CAST(sum(1::BIGINT << CAST(41 - m_j AS INT)) AS BIGINT)
              |      + (256 - count(*)) * (1::BIGINT << 41) AS s_scaled
              |  FROM monthly GROUP BY 1),
              |exact AS (
              |  SELECT (epoch_us(ts) // 604800000000 * 7) // 30 AS month,
              |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
              |  FROM events GROUP BY 1),
              |est0 AS (
              |  SELECT s.month, e.n_exact,
              |    CAST(s.v_zero AS BIGINT) AS v_zero, s.s_scaled,
              |    CAST(($hllAlphaMicro::HUGEINT * 65536 *
              |      (1::HUGEINT << 41)) //
              |      (s.s_scaled::HUGEINT * 1000) AS BIGINT) AS raw_milli
              |  FROM sums s JOIN exact e ON s.month = e.month)
              |SELECT month, n_exact, v_zero, s_scaled,
              |  CASE WHEN raw_milli <= 640000 AND v_zero > 0
              |       THEN (256 * CAST(floor(ln(256.0 /
              |         CAST(v_zero AS DOUBLE)) * 1e4) AS BIGINT)) // 10
              |       ELSE raw_milli END AS est_milli,
              |  abs(CASE WHEN raw_milli <= 640000 AND v_zero > 0
              |       THEN (256 * CAST(floor(ln(256.0 /
              |         CAST(v_zero AS DOUBLE)) * 1e4) AS BIGINT)) // 10
              |       ELSE raw_milli END - n_exact * 1000) * 1000000
              |    // (n_exact * 1000) AS err_ppm
              |FROM est0""".stripMargin))

  // HLL SET-OPERATION ESTIMATES — the q166 bitmap-overlap sibling for
  // approximate distincts, completing the HLL family (build q423, rollup
  // q424, overlap here): the union sketch of two sets is register max
  // (built directly from the combined rho relation — identical to maxing
  // the per-set registers by associativity), |A∩B| comes from
  // inclusion–exclusion on the three estimates, and every row carries the
  // exact count + err_ppm (nullif-guarded). All the q423 arithmetic,
  // reused verbatim.
  private val hllOverlap: Q =
    Q("q426_hll_overlap",
      (s, d) => {
        val ord = Tables.orders(s, d)
          .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
          .select(when(col("o_orderpriority") === "1-URGENT", "a")
            .otherwise("b").as("tag"), col("o_custkey"))
        val h = graft.ext.Dedup.contentId(col("o_custkey").cast("string"))
        val rho = ord
          .select(col("tag"), (h % 256L).as("j"),
            (h.cast("long") / lit(256L)).cast("long").as("w"))
          .select(col("tag"), col("j"),
            when(col("w") === 0L, lit(41L))
              .otherwise(lit(41L) - length(bin(col("w"))).cast("long"))
              .as("rho"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val regs = rho.groupBy(col("tag"), col("j"))
          .agg(max(col("rho")).as("m_j"))
          .unionByName(rho.groupBy(col("j")).agg(max(col("rho")).as("m_j"))
            .select(lit("union").as("tag"), col("j"), col("m_j")))
        val est = regs.groupBy(col("tag"))
          .agg(count(lit(1)).as("n_regs"),
            sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(41 - m_j AS INT))"))
              .as("s_seen"))
          .select(col("tag"), (lit(256L) - col("n_regs")).as("v_zero"),
            (col("s_seen") +
              (lit(256L) - col("n_regs")) * lit(1L << 41)).as("s_scaled"))
          .selectExpr("tag", s"$hllEstSpark AS est_milli")
        // one guaranteed-one-row aggregation for all three class counts:
        // the first cut filtered the class relation three times and
        // crossJoined the one-row frames, so an EMPTY class at some SF
        // would empty the whole output while the oracle's guarded sums
        // still emit 4 rows — a latent cross-engine divergence
        val exact = ord.groupBy(col("o_custkey"))
          .agg(countDistinct(col("tag")).as("nt"),
            min(col("tag")).as("t0"))
          .select(
            when(col("nt") === 2, "inter")
              .otherwise(col("t0")).as("cls"))
          .agg(
            coalesce(sum(when(col("cls") === "a", 1L)), lit(0L)).as("xa"),
            coalesce(sum(when(col("cls") === "b", 1L)), lit(0L)).as("xb"),
            coalesce(sum(when(col("cls") === "inter", 1L)), lit(0L)).as("xi"))
        // exact a/b include the intersection; union = a-only + b-only + inter
        val wide = est.groupBy()
          .pivot(col("tag"), Seq("a", "b", "union"))
          .agg(first(col("est_milli")))
          .crossJoin(broadcast(exact))
        wide.selectExpr(
          "stack(4, " +
            "'a', xa + xi, a, " +
            "'b', xb + xi, b, " +
            "'union', xa + xb + xi, union, " +
            "'inter', xi, a + b - union) AS (set_name, n_exact, est_milli)")
          .selectExpr("set_name", "n_exact", "est_milli",
            "abs(est_milli - n_exact * 1000) * 1000000 DIV " +
              "nullif(n_exact * 1000, 0) AS err_ppm")
      },
      Some(s"""WITH ord AS (
              |  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'a'
              |    ELSE 'b' END AS tag, o_custkey
              |  FROM orders
              |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
              |rho AS (
              |  SELECT tag, hv % 256 AS j,
              |    CASE WHEN hv // 256 = 0 THEN 41
              |         ELSE 41 - length(bin(hv // 256)) END AS rho
              |  FROM (SELECT tag,
              |    ('0x' || substr(md5(CAST(o_custkey AS VARCHAR)), 1, 12))
              |      ::BIGINT AS hv FROM ord)),
              |regs AS (
              |  SELECT tag, j, max(rho) AS m_j FROM rho GROUP BY 1, 2
              |  UNION ALL
              |  SELECT 'union', j, max(rho) FROM rho GROUP BY 2),
              |est0 AS (
              |  SELECT tag, 256 - count(*) AS v_zero,
              |    CAST(sum(1::BIGINT << CAST(41 - m_j AS INT)) AS BIGINT)
              |      + (256 - count(*)) * (1::BIGINT << 41) AS s_scaled
              |  FROM regs GROUP BY 1),
              |est1 AS (
              |  SELECT tag,
              |    CAST(($hllAlphaMicro::HUGEINT * 65536 *
              |      (1::HUGEINT << 41)) //
              |      (s_scaled::HUGEINT * 1000) AS BIGINT) AS raw_milli,
              |    v_zero
              |  FROM est0),
              |est AS (
              |  SELECT tag,
              |    CASE WHEN raw_milli <= 640000 AND v_zero > 0
              |      THEN (256 * CAST(floor(ln(256.0 /
              |        CAST(v_zero AS DOUBLE)) * 1e4) AS BIGINT)) // 10
              |      ELSE raw_milli END AS est_milli
              |  FROM est1),
              |exact AS (
              |  SELECT CASE WHEN count(DISTINCT tag) = 2 THEN 'inter'
              |    ELSE min(tag) END AS cls
              |  FROM ord GROUP BY o_custkey),
              |xc AS (SELECT
              |    CAST(coalesce(sum(CASE WHEN cls = 'a' THEN 1 END), 0)
              |      AS BIGINT) AS xa,
              |    CAST(coalesce(sum(CASE WHEN cls = 'b' THEN 1 END), 0)
              |      AS BIGINT) AS xb,
              |    CAST(coalesce(sum(CASE WHEN cls = 'inter' THEN 1 END), 0)
              |      AS BIGINT) AS xi
              |  FROM exact),
              |wide AS (
              |  SELECT
              |    (SELECT est_milli FROM est WHERE tag = 'a') AS ea,
              |    (SELECT est_milli FROM est WHERE tag = 'b') AS eb,
              |    (SELECT est_milli FROM est WHERE tag = 'union') AS eu,
              |    xa, xb, xi FROM xc),
              |rows_ AS (
              |  SELECT 'a' AS set_name, xa + xi AS n_exact, ea AS est_milli
              |    FROM wide
              |  UNION ALL SELECT 'b', xb + xi, eb FROM wide
              |  UNION ALL SELECT 'union', xa + xb + xi, eu FROM wide
              |  UNION ALL SELECT 'inter', xi, ea + eb - eu FROM wide)
              |SELECT set_name, n_exact, est_milli,
              |  abs(est_milli - n_exact * 1000) * 1000000
              |    // nullif(n_exact * 1000, 0) AS err_ppm
              |FROM rows_""".stripMargin))

  // ------------------------------------------------- unigram oracle codegen

  /** Shared header: word types, candidate pieces, seed vocabulary, and the
    * round-0 scores from raw seed occurrence counts. Mirrors
    * [[UnigramLm.wordTypes]] / [[UnigramLm.candidates]] exactly. */
  private[graft] def unigramHeader: String =
    s"""w0 AS MATERIALIZED (
       |  SELECT w, CAST(count(*) AS BIGINT) AS freq, len(w) AS len FROM (
       |    SELECT unnest(string_split(text, ' ')) AS w FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+${"$"}')
       |    AND len(w) <= ${UnigramLm.MaxLen}
       |  GROUP BY w),
       |cand AS MATERIALIZED (
       |  SELECT w, freq, CAST(i AS INT) AS ci, CAST(k AS INT) AS ck,
       |    substr(w, CAST(i AS INT), CAST(k AS INT)) AS piece
       |  FROM w0,
       |    (SELECT unnest(range(1, ${UnigramLm.MaxLen + 1})) AS i) ii,
       |    (SELECT unnest(range(1, ${UnigramLm.MaxPiece + 1})) AS k) kk
       |  WHERE i + k - 1 <= len),
       |seedv AS MATERIALIZED (SELECT DISTINCT piece FROM cand),
       |v0 AS (SELECT CAST(count(*) AS BIGINT) AS v0 FROM seedv),
       |c0 AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
       |  FROM cand GROUP BY 1),
       |t0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM c0),
       |lp0 AS MATERIALIZED (
       |  SELECT piece, cnt,
       |    CAST(floor(ln(CAST(cnt AS DOUBLE) / CAST(tt AS DOUBLE)) * 1e4)
       |      AS BIGINT) AS lp_q
       |  FROM c0 CROSS JOIN t0)""".stripMargin

  /** One Viterbi DP (the E-step lattice), [[UnigramLm.MaxLen]] unrolled
    * rounds: b{tag}_i = best prefix ending exactly at position i (per-word
    * top-1 with the (score DESC, path ASC) tie-break), f{tag}_i = all best
    * prefixes so far. Every CTE MATERIALIZED — each state is referenced by
    * multiple downstream CTEs (the BPE-oracle lesson). */
  private[graft] def dpBlock(tag: String, lpName: String,
      candName: String = "cand"): String = {
    val rounds = (1 to UnigramLm.MaxLen).map { i =>
      s"""b${tag}_$i AS MATERIALIZED (
         |  SELECT w, $i AS pos, score_q, path FROM (
         |    SELECT f.w, f.score_q + s.lp_q AS score_q,
         |      CASE WHEN f.pos = 0 THEN s.piece
         |           ELSE f.path || '|' || s.piece END AS path,
         |      row_number() OVER (PARTITION BY f.w
         |        ORDER BY f.score_q + s.lp_q DESC,
         |          CASE WHEN f.pos = 0 THEN s.piece
         |               ELSE f.path || '|' || s.piece END ASC) AS rk
         |    FROM f${tag}_${i - 1} f JOIN sc$tag s
         |      ON s.w = f.w AND s.ci = f.pos + 1 AND s.ci + s.ck = ${i + 1})
         |  WHERE rk = 1),
         |f${tag}_$i AS MATERIALIZED (
         |  SELECT * FROM f${tag}_${i - 1}
         |  UNION ALL SELECT * FROM b${tag}_$i)""".stripMargin
    }.mkString(",\n")
    s"""sc$tag AS MATERIALIZED (
       |  SELECT c.w, c.ci, c.ck, c.piece, l.lp_q
       |  FROM $candName c JOIN $lpName l ON c.piece = l.piece),
       |f${tag}_0 AS MATERIALIZED (
       |  SELECT w, 0 AS pos, CAST(0 AS BIGINT) AS score_q, '' AS path
       |  FROM w0),
       |$rounds""".stripMargin
  }

  /** One EM round r: E-step DP under lp{r-1}, segmentation extraction,
    * freq-weighted recount, add-one re-score over the seed vocab. */
  private def emBlock(r: Int): String =
    s"""${dpBlock(r.toString, s"lp${r - 1}")},
       |seg$r AS MATERIALIZED (
       |  SELECT f.w, f.path FROM f${r}_${UnigramLm.MaxLen} f
       |  JOIN w0 ON f.w = w0.w AND f.pos = w0.len),
       |c$r AS MATERIALIZED (
       |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
       |    SELECT w0.freq, unnest(string_split(s.path, '|')) AS piece
       |    FROM seg$r s JOIN w0 ON s.w = w0.w)
       |  GROUP BY 1),
       |t$r AS (SELECT CAST(sum(cnt) AS BIGINT) AS tt FROM c$r),
       |lp$r AS MATERIALIZED (
       |  SELECT sv.piece, CAST(coalesce(c.cnt, 0) AS BIGINT) AS cnt,
       |    CAST(floor(ln(CAST(coalesce(c.cnt, 0) + 1 AS DOUBLE) /
       |      CAST(t.tt + v.v0 AS DOUBLE)) * 1e4) AS BIGINT) AS lp_q
       |  FROM seedv sv LEFT JOIN c$r c ON sv.piece = c.piece
       |  CROSS JOIN t$r t CROSS JOIN v0 v)""".stripMargin

  private[graft] def unigramCtes(iters: Int): String =
    "WITH " + unigramHeader + ",\n" +
      (1 to iters).map(emBlock).mkString(",\n")

  /** Report oracle: the encode replay plus the code-length aggregation. */
  private[graft] def unigramReportOracle(iters: Int): String =
    unigramCtes(iters) + ",\n" + dpBlock("e", s"lp$iters") +
      s""",
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(freq) AS BIGINT) AS n_words FROM w0),
         |pieces AS (
         |  SELECT w0.freq, unnest(string_split(f.path, '|')) AS piece
         |  FROM fe_${UnigramLm.MaxLen} f
         |  JOIN w0 ON f.w = w0.w AND f.pos = w0.len),
         |rep AS (
         |  SELECT CAST(count(DISTINCT p.piece) AS BIGINT) AS vocab_used,
         |    CAST(sum(p.freq) AS BIGINT) AS total_pieces,
         |    CAST(sum(p.freq * -l.lp_q) AS BIGINT) AS code_len_q
         |  FROM pieces p JOIN lp$iters l ON p.piece = l.piece)
         |SELECT n_types, n_words, vocab_used, total_pieces,
         |  (total_pieces * 1000) // n_words AS fertility_milli,
         |  code_len_q, code_len_q // n_words AS nats_q_per_word
         |FROM rep CROSS JOIN tot""".stripMargin

  /** Train oracle: the full EM replay, answer = final vocab with counts. */
  private[graft] def unigramTrainOracle(iters: Int): String =
    unigramCtes(iters) +
      s"""
         |SELECT piece, cnt, lp_q FROM lp$iters WHERE cnt > 0""".stripMargin

  /** Encode oracle: the full EM replay plus ONE more Viterbi pass under
    * the final scores, answer = per-word segmentations. */
  private[graft] def unigramEncodeOracle(iters: Int): String =
    unigramCtes(iters) + ",\n" + dpBlock("e", s"lp$iters") +
      s"""
         |SELECT f.w, w0.freq,
         |  CAST(len(string_split(f.path, '|')) AS BIGINT) AS n_pieces,
         |  f.path AS encoding
         |FROM fe_${UnigramLm.MaxLen} f
         |JOIN w0 ON f.w = w0.w AND f.pos = w0.len""".stripMargin
}
