package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 10 — the audio member of the perceptual
  * family, and curriculum pacing:
  *
  *  - q460 AUDIO ZCR/ENERGY FINGERPRINT: the classic frame-level audio
  *    signature (zero-crossing rate + short-time energy, the features of
  *    every pre-neural audio classifier; cf. Scheirer & Slaney 1997) on
  *    the deterministic fake decode (payload bytes as PCM samples — the
  *    q29/q446 stub contract). Samples are MEAN-CENTERED by exact
  *    cross-multiplication (b·n > Σb — ascii payloads are all-positive,
  *    so raw sign never crosses), framed at 16 samples; each frame emits
  *    a 2-bit symbol (energy above doc average × ZCR ≥ half the
  *    transitions), and the fingerprint is the md5 of the frame-ordered
  *    symbol string. Shared-fingerprint groups give exact audio dedup —
  *    candidates by fingerprint equality, never all-pairs.
  *  - q461 CURRICULUM TIERS (competence-based pacing, Bengio et al. 2009;
  *    Platanios et al. 2019): rank the corpus by length (the standard
  *    short→long difficulty proxy), cut into 5 tiers with the exact
  *    ntile-from-global-rank formula (ops/Ranks — no fact-sized window),
  *    and report each tier's doc/char mass plus the cumulative unlock
  *    budget in ppm — the schedule a trainer consumes directly.
  *
  * Both replay exactly in DuckDB.
  */
object Entries82 {

  def all: Seq[Q] = Seq(audioZcr, curriculumTiers)

  // ---------------------------------------------------------------- q460

  private val audioZcr: Q =
    Q("q460_audio_zcr",
      (s, d) => {
        // ROW-LOCAL since r13 (the q446/q451 rewrite, optimization guide
        // §1.2/§2.4): samples, the doc mean, per-frame ZCR/energy, the
        // 4-symbol coding and the order-pinned fingerprint are all
        // functions of one document's bytes — HOF folds per row replace
        // the persisted char explode + lag window + three exchanges
        // (sf0.1 cold 8.8 s → ~1 s). Frame f covers 0-based positions
        // [16f, 16f+16); transitions at frame starts (pos % 16 = 0) are
        // excluded from ZCR exactly as the windowed form did. Per-row
        // state is O(len) longs — bounded by the 1024-char doc pin.
        val sigs = Tables.documents(s, d)
          .filter(length(col("text")) >= 64)
          // full 16-sample frames only
          .select(col("doc_id"), col("text"),
            expr("CAST((length(text) DIV 16) * 16 AS BIGINT)").as("nu"))
          .withColumn("bs", expr(
            "transform(sequence(1L, nu), i -> " +
              "CAST(ascii(substring(text, CAST(i AS INT), 1)) AS BIGINT))"))
          .withColumn("tt", expr("aggregate(bs, 0L, (a, x) -> a + x)"))
          // mean-centered: sample sign = b·nu > tt, exactly
          .withColumn("ens", expr(
            "transform(sequence(0L, nu DIV 16 - 1), f -> " +
              "aggregate(sequence(16 * f + 1, 16 * f + 16), 0L, (a, i) -> " +
              "a + (element_at(bs, CAST(i AS INT)) * nu - tt) * " +
              "(element_at(bs, CAST(i AS INT)) * nu - tt)))"))
          .withColumn("zcrs", expr(
            "transform(sequence(0L, nu DIV 16 - 1), f -> " +
              "aggregate(sequence(16 * f + 2, 16 * f + 16), 0L, (a, i) -> " +
              "a + CASE WHEN (element_at(bs, CAST(i AS INT)) * nu > tt) = " +
              "(element_at(bs, CAST(i - 1 AS INT)) * nu > tt) " +
              "THEN 0L ELSE 1L END))"))
          .withColumn("se", expr("aggregate(ens, 0L, (a, x) -> a + x)"))
          .withColumn("nf", expr("nu DIV 16"))
          .withColumn("syms", expr(
            "transform(sequence(1L, nf), f -> CAST(" +
              "CASE WHEN element_at(ens, CAST(f AS INT)) * nf >= se " +
              "THEN 2 ELSE 0 END + " +
              "CASE WHEN element_at(zcrs, CAST(f AS INT)) >= 8 " +
              "THEN 1 ELSE 0 END AS INT))"))
          .select(Seq(col("doc_id"), col("nf")) ++
            (0 to 3).map(k => expr(
              s"aggregate(syms, 0L, (a, x) -> a + " +
                s"CASE WHEN x = $k THEN 1L ELSE 0L END)").as(s"c$k")) :+
            md5(expr("concat_ws('', transform(syms, " +
              "x -> CAST(x AS STRING)))")).as("fp"): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        sigs.join(sigs.groupBy(col("fp")).agg(count(lit(1)).as("n_same_fp")),
            Seq("fp"))
          .selectExpr("doc_id", "nf AS n_frames", "c0", "c1", "c2", "c3",
            "fp", "n_same_fp")
      },
      Some("""WITH docs AS (
              |  SELECT doc_id, text, (len(text) // 16) * 16 AS nu
              |  FROM documents WHERE len(text) >= 64),
              |cells AS MATERIALIZED (
              |  SELECT doc_id, nu, i - 1 AS pos,
              |    CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) AS BIGINT)
              |      AS b
              |  FROM docs, (SELECT unnest(range(1, 1024)) AS i) t
              |  WHERE i <= nu),
              |tot AS (
              |  SELECT doc_id, nu, CAST(sum(b) AS BIGINT) AS tt
              |  FROM cells GROUP BY 1, 2),
              |signed AS (
              |  SELECT c.doc_id, c.pos, c.pos // 16 AS fr,
              |    c.b * c.nu > t.tt AS sgn,
              |    (c.b * c.nu - t.tt) * (c.b * c.nu - t.tt) AS e2,
              |    lag(c.b * c.nu > t.tt) OVER (PARTITION BY c.doc_id
              |      ORDER BY c.pos) AS psgn
              |  FROM cells c JOIN tot t ON t.doc_id = c.doc_id),
              |frames AS (
              |  SELECT doc_id, fr,
              |    CAST(sum(CASE WHEN pos % 16 <> 0 AND psgn <> sgn
              |      THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
              |    CAST(sum(e2) AS BIGINT) AS en
              |  FROM signed GROUP BY 1, 2),
              |perdoc AS (
              |  SELECT doc_id, CAST(sum(en) AS BIGINT) AS se,
              |    CAST(count(*) AS BIGINT) AS nf
              |  FROM frames GROUP BY 1),
              |syms AS (
              |  SELECT f.doc_id, f.fr, p.nf,
              |    CASE WHEN f.en * p.nf >= p.se THEN 2 ELSE 0 END +
              |    CASE WHEN f.zcr >= 8 THEN 1 ELSE 0 END AS sym
              |  FROM frames f JOIN perdoc p ON p.doc_id = f.doc_id),
              |sigs AS MATERIALIZED (
              |  SELECT doc_id, nf,
              |    CAST(sum(CASE WHEN sym = 0 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS c0,
              |    CAST(sum(CASE WHEN sym = 1 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS c1,
              |    CAST(sum(CASE WHEN sym = 2 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS c2,
              |    CAST(sum(CASE WHEN sym = 3 THEN 1 ELSE 0 END) AS BIGINT)
              |      AS c3,
              |    md5(string_agg(CAST(sym AS VARCHAR), '' ORDER BY fr))
              |      AS fp
              |  FROM syms GROUP BY 1, 2)
              |SELECT s.doc_id, s.nf AS n_frames, c0, c1, c2, c3, s.fp,
              |  g.n_same_fp
              |FROM sigs s JOIN (
              |  SELECT fp, CAST(count(*) AS BIGINT) AS n_same_fp
              |  FROM sigs GROUP BY 1) g ON g.fp = s.fp""".stripMargin))

  // ---------------------------------------------------------------- q461

  /** Curriculum tier count. */
  private val Tiers = 5

  private val curriculumTiers: Q =
    Q("q461_curriculum_tiers",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"))
        val ranked = graft.ops.Ranks.withGlobalRank(docs,
          expr("n_chars DIV 16"), Seq(col("n_chars").asc, col("doc_id").asc),
          "rk", "n_all")
        // 5-row relation consumed three times (running window, the total,
        // the final projection) — checkpointed once
        val tiers = graft.Explain.localCheckpointWithProvenance(ranked
          .withColumn("tier",
            graft.ops.Ranks.ntileFromRank(col("rk"), col("n_all"), Tiers))
          .groupBy(col("tier"))
          .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"),
            min(col("n_chars")).as("min_chars"),
            max(col("n_chars")).as("max_chars")))
        // the unlock schedule: running char budget over the TIER DOMAIN
        // (5 rows — never fact-sized)
        tiers
          .withColumn("cum_chars",
            sum(col("chars")).over(Window.orderBy(col("tier"))))
          .crossJoin(broadcast(tiers.agg(sum(col("chars")).as("tc"))))
          .selectExpr("tier", "n_docs", "chars", "min_chars", "max_chars",
            "cum_chars", "cum_chars * 1000000 DIV tc AS unlock_ppm")
      },
      Some(s"""WITH ranked AS (
              |  SELECT doc_id, n_chars,
              |    ntile($Tiers) OVER (ORDER BY n_chars ASC, doc_id ASC)
              |      AS tier
              |  FROM documents),
              |tiers AS (
              |  SELECT tier, CAST(count(*) AS BIGINT) AS n_docs,
              |    CAST(sum(n_chars) AS BIGINT) AS chars,
              |    CAST(min(n_chars) AS BIGINT) AS min_chars,
              |    CAST(max(n_chars) AS BIGINT) AS max_chars
              |  FROM ranked GROUP BY 1)
              |SELECT CAST(tier AS BIGINT) AS tier, n_docs, chars,
              |  min_chars, max_chars,
              |  CAST(sum(chars) OVER (ORDER BY tier) AS BIGINT)
              |    AS cum_chars,
              |  CAST(CAST(sum(chars) OVER (ORDER BY tier) AS BIGINT)
              |    * 1000000 // (SELECT CAST(sum(chars) AS BIGINT)
              |      FROM tiers) AS BIGINT) AS unlock_ppm
              |FROM tiers""".stripMargin))
}
