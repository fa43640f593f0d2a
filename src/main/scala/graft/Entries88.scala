package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ExtEntries.Q

/** Round-13 batch 4 — winnowing fingerprints, leave-one-out target
  * encoding, and CUSUM changepoint detection (integer/grid arithmetic
  * only, exact DuckDB oracle mirrors):
  *
  *  - q478 WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken,
  *    SIGMOD 2003 — the MOSS local fingerprinting algorithm): k=8 char
  *    grams hashed to 48-bit md5 ids, fingerprint = the minimum hash of
  *    every w=8 gram window, per-doc DISTINCT fingerprint set. The paper's
  *    guarantee — expected density 2/(w+1) ≈ 0.222, every match of length
  *    ≥ k+w−1 shares a fingerprint — is what the census measures:
  *    per-doc n_fp / n_grams density in ppm (fixture ≈ 0.21) plus the
  *    q434-style order-free md5-sum pin over the fingerprint SET, so the
  *    oracle certifies every selected value without dumping the set.
  *    Scale posture: gram explode + window min are doc-partitioned; no
  *    cross-doc relation exists at all (the pair-join consumer would
  *    df-cap its postings like q23 banding — documented, not built here).
  *
  *  - q479 LEAVE-ONE-OUT TARGET ENCODING with m-estimate smoothing
  *    (Micci-Barreca, SIGKDD Expl. 2001): encode o_orderpriority against
  *    the return-flag target; enc(row) = (s_c − y + m·p_global) /
  *    (n_c − 1 + m) with m = 20, kept EXACT by clearing the global-rate
  *    denominator: ((s_c − y)·n_g + 20·s_g)·10⁶ DIV ((n_c − 1 + 20)·n_g).
  *    The LOO encoding is constant on every (category, y) cell, so the
  *    output is the 10-row cell table, not a fact-sized frame — the
  *    training-join consumer broadcast-joins it back. All operands
  *    non-negative (the DIV-vs-// parity regime); empty cells are
  *    filtered, never divided.
  *
  *  - q480 CUSUM changepoint detection (Page, Biometrika 1954): per
  *    supplier-nation weekly revenue, the one-sided positive CUSUM
  *    S_t = max(0, S_{t−1} + x_t − k) rewritten into its closed prefix
  *    form S_t = (Σ_{s≤t}(x_s − k)) − min_{s≤t} Σ(x_s − k) — the
  *    sequential recursion becomes two nation-partitioned running
  *    windows over the bounded week domain, embarrassingly parallel.
  *    Drift k = per-series integer mean; alarm at S_t > 2k; output is
  *    the per-nation alarm census (max excursion, first alarm week with
  *    a −1 sentinel — never NULL in an int64 column, the q454/q448
  *    convention). Cents arithmetic throughout; the prefix sums may go
  *    negative but no negative quantity ever meets integer division.
  *
  * Reference anchor: the reference has no fingerprinting/encoding/
  * changepoint surface (775-LoC pandas feature store — SURVEY.md §0);
  * these extend the mandated dedup, train-prep and time-series families.
  */
object Entries88 {

  def all: Seq[Q] = Seq(winnowing, looTargetEnc, cusum)

  private def md5Long(c: Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  // ---------------------------------------------------------------- q478

  private val winnowing: Q =
    Q("q478_winnowing_fps",
      (s, d) => {
        val g = Tables.documents(s, d)
          // guard: Spark sequence() DESCENDS when start > stop, so a
          // sub-8-char doc would explode a bogus position ladder
          .filter(length(col("text")) >= 8)
          .select(col("doc_id"),
            explode(sequence(lit(1), length(col("text")) - lit(7)))
              .as("pos"),
            col("text"))
          .select(col("doc_id"), col("pos"),
            md5Long(expr("substring(text, pos, 8)")).as("h"))
          .persist(StorageLevel.MEMORY_AND_DISK) // window pass + n_grams
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(-7, Window.currentRow)
        val fps = g
          .withColumn("fp", min(col("h")).over(wd))
          .withColumn("wn", count(lit(1)).over(wd))
          .filter(col("wn") === 8) // full windows only
          .select(col("doc_id"), col("fp")).distinct()
        val ng = g.groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_grams"))
        fps.join(ng, Seq("doc_id"))
          .groupBy(col("doc_id"), col("n_grams"))
          .agg(count(lit(1)).as("n_fp"),
            sum(md5Long(col("fp").cast("string"))).cast("long")
              .as("fp_md5sum"))
          .select(col("doc_id"), col("n_grams"), col("n_fp"),
            expr("n_fp * 1000000 DIV n_grams").as("fp_density_ppm"),
            col("fp_md5sum"))
      },
      Some("""WITH g AS (
             |  SELECT doc_id, i AS pos,
             |    ('0x' || substr(md5(substr(text, i, 8)), 1, 12))::BIGINT
             |      AS h
             |  FROM documents, (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE i + 7 <= len(text)),
             |wm AS (
             |  SELECT doc_id, pos,
             |    min(h) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS fp,
             |    count(*) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS wn
             |  FROM g),
             |fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE wn = 8),
             |ng AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
             |       FROM g GROUP BY doc_id)
             |SELECT fps.doc_id AS doc_id, ng.n_grams AS n_grams,
             |  CAST(count(*) AS BIGINT) AS n_fp,
             |  CAST(count(*) * 1000000 // ng.n_grams AS BIGINT)
             |    AS fp_density_ppm,
             |  CAST(sum(('0x' || substr(md5(CAST(fp AS VARCHAR)), 1, 12))
             |    ::BIGINT) AS BIGINT) AS fp_md5sum
             |FROM fps JOIN ng ON ng.doc_id = fps.doc_id
             |GROUP BY fps.doc_id, ng.n_grams""".stripMargin))

  // ---------------------------------------------------------------- q479

  private val looTargetEnc: Q =
    Q("q479_loo_target_enc",
      (s, d) => {
        val base = Tables.lineitem(s, d)
          .join(Tables.orders(s, d),
            col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("cat"),
            when(col("l_returnflag") === "R", 1L).otherwise(0L).as("y0"))
        val gl = base.agg(count(lit(1)).as("n_g"),
          sum(col("y0")).as("s_g"))
        val c = base.groupBy(col("cat"))
          .agg(count(lit(1)).as("n_c"), sum(col("y0")).as("s_c"))
        c.crossJoin(gl)
          .select(col("cat"), col("n_c"), col("s_c"), col("n_g"),
            col("s_g"),
            explode(array(lit(0), lit(1))).as("y"))
          .filter(when(col("y") === 1, col("s_c"))
            .otherwise(col("n_c") - col("s_c")) > 0)
          .select(col("cat"), col("n_c"), col("s_c"), col("y"),
            expr("((s_c - y) * n_g + 20 * s_g) * 1000000" +
              " DIV ((n_c - 1 + 20) * n_g)").as("enc_ppm"))
      },
      Some("""WITH base AS (
             |  SELECT o.o_orderpriority AS cat,
             |    CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END AS y
             |  FROM lineitem l JOIN orders o
             |    ON o.o_orderkey = l.l_orderkey),
             |gl AS (SELECT CAST(count(*) AS BIGINT) AS n_g,
             |         CAST(sum(y) AS BIGINT) AS s_g FROM base),
             |c AS (SELECT cat, CAST(count(*) AS BIGINT) AS n_c,
             |        CAST(sum(y) AS BIGINT) AS s_c
             |      FROM base GROUP BY cat)
             |SELECT c.cat AS cat, c.n_c AS n_c, c.s_c AS s_c,
             |  ys.y AS y,
             |  CAST(((c.s_c - ys.y) * gl.n_g + 20 * gl.s_g) * 1000000
             |    // ((c.n_c - 1 + 20) * gl.n_g) AS BIGINT) AS enc_ppm
             |FROM c CROSS JOIN gl
             |CROSS JOIN (SELECT unnest([0, 1]) AS y) ys
             |WHERE (CASE WHEN ys.y = 1 THEN c.s_c
             |       ELSE c.n_c - c.s_c END) > 0""".stripMargin))

  // ---------------------------------------------------------------- q480

  private val cusum: Q =
    Q("q480_cusum_alarms",
      (s, d) => {
        val wk = Tables.lineitem(s, d)
          .join(Tables.supplier(s, d),
            col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nation"),
            expr("unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
              " DIV 604800000000").as("week"))
          .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
            .as("rev_c"))
        val k = wk.groupBy(col("nation").as("kn"))
          .agg(expr("sum(rev_c) DIV count(1)").as("drift"))
        val wc = Window.partitionBy(col("nation")).orderBy(col("week"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val sp = wk.join(k, col("nation") === col("kn"))
          .withColumn("cum", sum(col("rev_c") - col("drift")).over(wc))
          // the prefix min must include the EMPTY prefix (cum_0 = 0) or
          // S_1 degenerates to 0 and the first excursion is lost
          .withColumn("s_plus",
            col("cum") - least(lit(0L), min(col("cum")).over(wc)))
        sp.groupBy(col("nation"))
          .agg(count(lit(1)).as("n_weeks"),
            max(col("drift")).as("drift_c"),
            max(col("s_plus")).as("max_s_plus"),
            coalesce(min(when(col("s_plus") > lit(2) * col("drift"),
              col("week"))), lit(-1L)).as("first_alarm_week"),
            sum(when(col("s_plus") > lit(2) * col("drift"), 1L)
              .otherwise(0L)).as("n_alarms"))
      },
      Some("""WITH wk AS (
             |  SELECT s.s_nationkey AS nation,
             |    CAST(epoch_us(CAST(l.l_shipdate AS TIMESTAMP))
             |      // 604800000000 AS BIGINT) AS week,
             |    CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT))
             |      AS BIGINT) AS rev_c
             |  FROM lineitem l JOIN supplier s
             |    ON s.s_suppkey = l.l_suppkey
             |  GROUP BY 1, 2),
             |k AS (SELECT nation,
             |        CAST(sum(rev_c) // count(*) AS BIGINT) AS drift
             |      FROM wk GROUP BY nation),
             |cs AS (
             |  SELECT wk.nation AS nation, wk.week AS week,
             |    k.drift AS drift,
             |    sum(wk.rev_c - k.drift) OVER (PARTITION BY wk.nation
             |      ORDER BY wk.week ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW) AS cum
             |  FROM wk JOIN k ON k.nation = wk.nation),
             |sp AS (
             |  SELECT nation, week, drift, cum,
             |    cum - least(0, min(cum) OVER (PARTITION BY nation
             |      ORDER BY week ROWS BETWEEN UNBOUNDED PRECEDING
             |      AND CURRENT ROW)) AS s_plus
             |  FROM cs)
             |SELECT nation, CAST(count(*) AS BIGINT) AS n_weeks,
             |  CAST(max(drift) AS BIGINT) AS drift_c,
             |  CAST(max(s_plus) AS BIGINT) AS max_s_plus,
             |  CAST(coalesce(min(CASE WHEN s_plus > 2 * drift
             |    THEN week END), -1) AS BIGINT) AS first_alarm_week,
             |  CAST(sum(CASE WHEN s_plus > 2 * drift THEN 1 ELSE 0 END)
             |    AS BIGINT) AS n_alarms
             |FROM sp GROUP BY nation""".stripMargin))
}
