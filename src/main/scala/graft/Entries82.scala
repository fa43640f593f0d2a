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
        val docs = Tables.documents(s, d)
          .filter(length(col("text")) >= 64)
        // full 16-sample frames only; pos is 0-based
        val cells = docs
          .selectExpr("doc_id", "(length(text) DIV 16) * 16 AS nu",
            "posexplode(transform(sequence(1, (length(text) DIV 16) * 16)," +
              " i -> ascii(substring(text, i, 1))))")
          .selectExpr("doc_id", "nu", "pos", "CAST(col AS BIGINT) AS b")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val tot = cells.groupBy(col("doc_id"), col("nu"))
          .agg(sum(col("b")).as("tt"))
        // mean-centered sign and per-frame ZCR/energy: the lag window is
        // doc-partitioned; transitions at frame boundaries are excluded
        val frames = cells.join(tot, Seq("doc_id", "nu"))
          .withColumn("sgn", col("b") * col("nu") > col("tt"))
          .withColumn("psgn", lag(col("sgn"), 1).over(
            Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
          .groupBy(col("doc_id"), expr("pos DIV 16").as("fr"))
          .agg(
            sum(when(col("pos") % 16 =!= 0 && col("psgn") =!= col("sgn"),
              1L).otherwise(0L)).as("zcr"),
            sum(expr("(b * nu - tt) * (b * nu - tt)")).as("en"))
        val perDoc = frames.groupBy(col("doc_id"))
          .agg(sum(col("en")).as("se"), count(lit(1)).as("nf"))
        val syms = frames.join(perDoc, Seq("doc_id"))
          .selectExpr("doc_id", "fr", "nf",
            "CAST(CASE WHEN en * nf >= se THEN 2 ELSE 0 END + " +
              "CASE WHEN zcr >= 8 THEN 1 ELSE 0 END AS INT) AS sym")
        val sigs = syms
          .groupBy(col("doc_id"), col("nf"))
          .agg(
            sum(when(col("sym") === 0, 1L).otherwise(0L)).as("c0"),
            sum(when(col("sym") === 1, 1L).otherwise(0L)).as("c1"),
            sum(when(col("sym") === 2, 1L).otherwise(0L)).as("c2"),
            sum(when(col("sym") === 3, 1L).otherwise(0L)).as("c3"),
            md5(concat_ws("", expr(
              "transform(array_sort(collect_list(named_struct(" +
                "'f', fr, 'sc', CAST(sym AS STRING)))), x -> x.sc)")))
              .as("fp"))
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
