package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ExtEntries.Q

/** Round-13 batch 2 — time-series similarity, the PCSA ancestor sketch,
  * and content-defined chunking:
  *
  *  - q472 MATRIX PROFILE (Yeh et al., ICDM 2016 — the brute-force exact
  *    STAMP distance profile, not the FFT path): per supplier nation, the
  *    weekly-revenue series' m=4 subsequence self-join distance profile
  *    with a full-window exclusion zone (|i−j| ≥ m). Distances are INTEGER
  *    squared-Euclidean over floor-dollar values — no z-normalization, so
  *    the whole profile replays exactly in DuckDB. Scale posture: the
  *    pair/term joins are per-nation (series-partitioned); nothing crosses
  *    nations, and a 1000× corpus only widens the nation dimension.
  *
  *  - q473 FLAJOLET–MARTIN / PCSA registers (Flajolet & Martin, JCSS
  *    1985): 64 trailing-zero bitmaps per event_type, built weekly and
  *    OR-merged (the monoid the paper is ABOUT — bit_or is the whole merge
  *    operator), with the direct one-pass build emitted beside the merged
  *    rollup so the oracle PROVES merge-equivalence row-for-row. The
  *    estimate column keeps to integer powers of two (64·2^(ΣR÷64)) — no
  *    φ-correction float leaves the engine; n_exact rides alongside as the
  *    measured-error gate (the q448 discipline).
  *
  *  - q474 CONTENT-DEFINED CHUNKING census (Muthitacharoen, Chen &
  *    Mazières, SOSP 2001 — the LBFS primitive behind restic/borgbackup
  *    dedup): chunk boundaries wherever the 8-char rolling gram's
  *    md5-derived hash ≡ 0 (mod 64) (expected 64-char chunks), plus the
  *    document end; per-source dedup census (unique-chunk bytes over total
  *    bytes, ppm). Boundary detection is stateless per position — unlike
  *    min/max-size CDC variants there is no sequential dependency, so the
  *    scan parallelizes per document with no cross-row state. The min-size
  *    floor of production CDC is deliberately omitted (documented
  *    deviation: it would reintroduce a sequential scan; the boundary
  *    DENSITY census this emits is the tuning signal either way).
  *
  * Reference anchor: no time-series/sketch/chunking surface exists in the
  * 775-LoC pandas reference (SURVEY.md §0); these extend the mandated
  * sketch-algebra, dedup and time-series families.
  */
object Entries86 {

  def all: Seq[Q] = Seq(matrixProfile, fmSketch, cdcChunks)

  private def md5Long(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  // ---------------------------------------------------------------- q472

  private val matrixProfile: Q =
    Q("q472_matrix_profile",
      (s, d) => {
        val ser = Tables.lineitem(s, d)
          .select(col("l_suppkey"),
            // NTZ vintage: cast is an instant-identity under the UTC session
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
              " DIV 604800000000").as("wk"),
            expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
          .join(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_nationkey")),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nk"), col("wk"))
          // floor dollars keep (a.v − b.v)² far from the int64 edge at any SF
          .agg(expr("sum(cents) DIV 100").as("v"))
        val el = ser
          .withColumn("p", row_number().over(
            Window.partitionBy(col("nk")).orderBy(col("wk"))))
          .select(col("nk"), col("p"), col("v"))
          .persist(StorageLevel.MEMORY_AND_DISK) // starts + both term sides
        val starts = el
          .join(el.groupBy(col("nk")).agg(max(col("p")).as("maxp")), Seq("nk"))
          .filter(col("p") <= col("maxp") - 3)
          .select(col("nk"), col("p").as("i"))
        val pairs = starts
          .join(starts.select(col("nk"), col("i").as("j")), Seq("nk"))
          .filter(abs(col("i") - col("j")) >= 4) // full exclusion zone
        val dist = pairs
          .join(el.select(col("nk"), col("p").as("pa"), col("v").as("va")),
            Seq("nk"))
          .filter(col("pa") >= col("i") && col("pa") <= col("i") + 3)
          .join(el.select(col("nk"), col("p").as("pb"), col("v").as("vb")),
            Seq("nk"))
          .filter(col("pb") === col("j") + (col("pa") - col("i")))
          .groupBy(col("nk"), col("i"), col("j"))
          .agg(sum((col("va") - col("vb")) * (col("va") - col("vb")))
            .as("dist"))
        dist.withColumn("rn", row_number().over(
            Window.partitionBy(col("nk"), col("i"))
              .orderBy(col("dist").asc, col("j").asc)))
          .filter(col("rn") === 1)
          .select(col("nk").as("nation"), col("i").cast("long").as("pos"),
            col("dist").as("mp_dist"), col("j").cast("long").as("mp_pos"))
      },
      Some("""WITH ser AS (
             |  SELECT s_nationkey AS nk,
             |    epoch_us(l_shipdate) // 604800000000 AS wk,
             |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
             |  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey),
             |wkv AS (SELECT nk, wk, sum(cents) // 100 AS v
             |        FROM ser GROUP BY nk, wk),
             |el AS (SELECT nk,
             |         row_number() OVER (PARTITION BY nk ORDER BY wk) AS p,
             |         v FROM wkv),
             |mx AS (SELECT nk, max(p) AS maxp FROM el GROUP BY nk),
             |st AS (SELECT el.nk, el.p AS i FROM el JOIN mx USING (nk)
             |       WHERE el.p <= maxp - 3),
             |pr AS (SELECT a.nk, a.i, b.i AS j
             |       FROM st a JOIN st b ON a.nk = b.nk
             |       WHERE abs(a.i - b.i) >= 4),
             |dist AS (
             |  SELECT pr.nk, pr.i, pr.j,
             |    sum((a.v - b.v) * (a.v - b.v)) AS dist
             |  FROM pr
             |  JOIN el a ON a.nk = pr.nk
             |    AND a.p >= pr.i AND a.p <= pr.i + 3
             |  JOIN el b ON b.nk = pr.nk AND b.p = pr.j + (a.p - pr.i)
             |  GROUP BY 1, 2, 3)
             |SELECT nk AS nation, CAST(i AS BIGINT) AS pos,
             |  CAST(dist AS BIGINT) AS mp_dist, CAST(j AS BIGINT) AS mp_pos
             |FROM (SELECT *, row_number() OVER (PARTITION BY nk, i
             |        ORDER BY dist ASC, j ASC) AS rn FROM dist)
             |WHERE rn = 1""".stripMargin))

  // ---------------------------------------------------------------- q473

  private val fmSketch: Q =
    Q("q473_fm_sketch",
      (s, d) => {
        val hashed = Tables.events(s, d)
          .select(col("event_type"), col("user_id"),
            expr("ts_us DIV 604800000000").as("wk"),
            md5Long(concat(lit("u"), col("user_id"))).as("h"))
          .withColumn("bkt", col("h") % 64)
          .withColumn("y", expr("h DIV 64"))
          // ρ = trailing zeros of the remaining 42 hash bits; y=0 is the
          // (2^-42) degenerate tail, pinned to the max register
          .withColumn("rho", expr(
            "CASE WHEN y = 0 THEN 42 ELSE bit_count((y & -y) - 1) END"))
          .withColumn("bit", expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(rho AS INT))"))
          .persist(StorageLevel.MEMORY_AND_DISK) // weekly, direct, exact
        val weekly = hashed.groupBy(col("event_type"), col("wk"), col("bkt"))
          .agg(expr("bit_or(bit)").as("bm"))
        val merged = weekly.groupBy(col("event_type"), col("bkt"))
          .agg(expr("bit_or(bm)").as("bmm"))
        val direct = hashed.groupBy(col("event_type"), col("bkt"))
          .agg(expr("bit_or(bit)").as("bmd"))
        // R = index of the lowest ZERO bit: ((bm+1) & ~bm) isolates it
        val r = direct.join(merged, Seq("event_type", "bkt"))
          .withColumn("rd", expr("bit_count(((bmd + 1) & ~bmd) - 1)"))
          .withColumn("rm", expr("bit_count(((bmm + 1) & ~bmm) - 1)"))
          .groupBy(col("event_type"))
          .agg(sum(col("rd")).as("sum_r"), sum(col("rm")).as("sum_r_merged"))
        val exact = hashed.groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_exact"))
        r.join(exact, Seq("event_type"))
          .select(col("event_type"), col("n_exact"), col("sum_r"),
            col("sum_r_merged"),
            expr("64 * shiftleft(CAST(1 AS BIGINT)," +
              " CAST(sum_r DIV 64 AS INT))").as("est_pow2"))
      },
      Some("""WITH hashed AS (
             |  SELECT event_type, user_id,
             |    epoch_us(ts) // 604800000000 AS wk, h,
             |    h % 64 AS bkt, h // 64 AS y
             |  FROM (SELECT *,
             |      ('0x' || substr(md5('u' || user_id::VARCHAR), 1, 12))
             |        ::BIGINT AS h
             |    FROM events)),
             |bits AS (
             |  SELECT event_type, wk, bkt,
             |    (1::BIGINT << (CASE WHEN y = 0 THEN 42
             |      ELSE bit_count((y & (-y)) - 1) END)::INT) AS bit
             |  FROM hashed),
             |weekly AS (SELECT event_type, wk, bkt, bit_or(bit) AS bm
             |           FROM bits GROUP BY 1, 2, 3),
             |merged AS (SELECT event_type, bkt, bit_or(bm) AS bmm
             |           FROM weekly GROUP BY 1, 2),
             |direct AS (SELECT event_type, bkt, bit_or(bit) AS bmd
             |           FROM bits GROUP BY 1, 2),
             |r AS (
             |  SELECT d.event_type,
             |    sum(bit_count(((bmd + 1) & (~bmd)) - 1)) AS sum_r,
             |    sum(bit_count(((bmm + 1) & (~bmm)) - 1)) AS sum_r_merged
             |  FROM direct d JOIN merged m
             |    ON d.event_type = m.event_type AND d.bkt = m.bkt
             |  GROUP BY 1),
             |exact AS (SELECT event_type,
             |            CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
             |          FROM events GROUP BY 1)
             |SELECT r.event_type, e.n_exact,
             |  CAST(r.sum_r AS BIGINT) AS sum_r,
             |  CAST(r.sum_r_merged AS BIGINT) AS sum_r_merged,
             |  CAST(64 * (1::BIGINT << (r.sum_r // 64)::INT) AS BIGINT)
             |    AS est_pow2
             |FROM r JOIN exact e ON r.event_type = e.event_type"""
        .stripMargin))

  // ---------------------------------------------------------------- q474

  private val cdcChunks: Q =
    Q("q474_cdc_chunks",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"),
            length(col("text")).as("len"))
          .persist(StorageLevel.MEMORY_AND_DISK) // boundaries + chunk text
        // hash boundary AFTER position p when the trailing 8-gram's hash
        // ≡ 0 (mod 64); the doc end is always a boundary
        val hashBounds = docs.filter(col("len") >= 8)
          .select(col("doc_id"),
            explode(sequence(lit(8), col("len"))).as("p"),
            col("text"))
          .filter(md5Long(expr("substring(text, p - 7, 8)")) % 64 === 0)
          .select(col("doc_id"), col("p"))
        val bounds = hashBounds
          .unionByName(docs.select(col("doc_id"), col("len").as("p")))
          .distinct()
        val wB = Window.partitionBy(col("doc_id")).orderBy(col("p"))
        val chunks = bounds
          .withColumn("start",
            coalesce(lag(col("p"), 1).over(wB) + 1, lit(1)))
          .join(docs.select(col("doc_id"), col("source"), col("text")),
            Seq("doc_id"))
          .select(col("doc_id"), col("source"),
            (col("p") - col("start") + 1).as("clen"),
            md5(expr("substring(text, start, p - start + 1)")).as("chash"))
        val per = chunks.groupBy(col("source")).agg(
          count(lit(1)).as("n_chunks"),
          sum(col("clen")).as("total_bytes"))
        val uniq = chunks.groupBy(col("source"), col("chash"))
          .agg(max(col("clen")).as("clen"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_unique"), sum(col("clen")).as("uniq_bytes"))
        per.join(uniq, Seq("source"))
          .select(col("source"), col("n_chunks"), col("n_unique"),
            col("total_bytes"), col("uniq_bytes"),
            expr("(uniq_bytes * 1000000) DIV total_bytes").as("dedup_ppm"))
      },
      Some("""WITH docs AS (
             |  SELECT doc_id, source, text, length(text) AS len
             |  FROM documents),
             |hb AS (
             |  SELECT doc_id, i AS p
             |  FROM docs, (SELECT unnest(range(8, 4000)) AS i) t
             |  WHERE len >= 8 AND i <= len
             |    AND ('0x' || substr(md5(substr(text, i - 7, 8)), 1, 12))
             |      ::BIGINT % 64 = 0),
             |bounds AS (
             |  SELECT DISTINCT doc_id, p FROM (
             |    SELECT doc_id, p FROM hb
             |    UNION ALL SELECT doc_id, len AS p FROM docs)),
             |chunks AS (
             |  SELECT b.doc_id, d.source, b.p - b.start + 1 AS clen,
             |    md5(substr(d.text, b.start, b.p - b.start + 1)) AS chash
             |  FROM (SELECT doc_id, p,
             |          coalesce(lag(p) OVER (PARTITION BY doc_id
             |            ORDER BY p) + 1, 1) AS start
             |        FROM bounds) b
             |  JOIN docs d USING (doc_id)),
             |per AS (SELECT source, count(*) AS n_chunks,
             |          sum(clen) AS total_bytes FROM chunks GROUP BY 1),
             |uq AS (
             |  SELECT source, count(*) AS n_unique, sum(clen) AS uniq_bytes
             |  FROM (SELECT source, chash, max(clen) AS clen
             |        FROM chunks GROUP BY 1, 2)
             |  GROUP BY 1)
             |SELECT source, CAST(n_chunks AS BIGINT) AS n_chunks,
             |  CAST(n_unique AS BIGINT) AS n_unique,
             |  CAST(total_bytes AS BIGINT) AS total_bytes,
             |  CAST(uniq_bytes AS BIGINT) AS uniq_bytes,
             |  CAST((uniq_bytes * 1000000) // total_bytes AS BIGINT)
             |    AS dedup_ppm
             |FROM per JOIN uq USING (source)""".stripMargin))
}
