package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ExtEntries.Q

/** Round-13 batch 11 — BWT repetitiveness, Copeland fusion, and exact
  * 1-D Wasserstein drift (integer arithmetic only, exact DuckDB oracle
  * mirrors):
  *
  *  - q497 BWT RUN CENSUS (Burrows & Wheeler 1994; the r/n
  *    repetitiveness measure of Gagie–Navarro–Prezza 2018): the
  *    Burrows–Wheeler transform read directly off the q434 suffix
  *    array — bwt[i] = text[SA[i]−1], with a chr(1) sentinel for the
  *    full-text suffix (the SA-derived BWT without the terminator
  *    row; documented, oracle-mirrored semantics). The number of
  *    equal-letter runs r, normalized r/n in ppm, is THE
  *    compressibility/repetitiveness statistic behind bzip2-class
  *    codecs and run-length FM-indexes — a low runs_ppm flags
  *    templated/boilerplate docs the same way q440's repeat coverage
  *    does, from the opposite (codec) direction. All windows are
  *    doc-partitioned (the SA family's bound); the run count and the
  *    order-pinned md5 of the BWT string pin the whole permutation.
  *
  *  - q498 COPELAND PAIRWISE-MAJORITY FUSION (Copeland 1951; the
  *    Condorcet-consistent member beside q490's Borda and q181's RRF):
  *    on the Borda top-50 head, candidate i beats j when ≥ 2 of the 3
  *    rankers put i first (3 rankers, row_number ranks — no pair ties,
  *    so wins + losses = 49 exactly). Copeland score = wins − losses;
  *    Σ scores = 0 (every pair hands out +1/−1), spec-pinned. O(k²)
  *    on the 50-row head only — the full corpus never pairs.
  *
  *  - q499 EXACT 1-D WASSERSTEIN-1 WEEKLY DRIFT (Monge 1781/Kantorovich
  *    1942; the earth-mover member of the drift family beside q288 KS,
  *    q303 PSI, q363 histogram intersection): between consecutive
  *    weeks' order-price distributions, W1 = ∫|F−G| dx evaluated
  *    EXACTLY on the merged support — Σ |cumA·nB − cumB·nA| · gap over
  *    distinct support points, divided once by nA·nB in
  *    DECIMAL(38,0)/HUGEINT (the ops/Ranks idiv regime). KS reads the
  *    sup of |F−G|, W1 its integral — it sees mean shifts KS
  *    underweights; W1 ≥ |mean_A − mean_B| always (Jensen), emitted
  *    beside it and executed in the spec. Windows partition per week
  *    pair (bounded by weekly volume); at 100 TB the same algebra runs
  *    on a binned CDF (the q309 equi-depth grid) instead of raw
  *    points — the merged-support sweep is the exact small-week path.
  *
  * Reference anchor: no compression/rank-fusion/drift surface in the
  * 775-LoC pandas reference (SURVEY.md §0); these extend the
  * exact-substring, rank-aggregation and drift families.
  */
object Entries95 {

  def all: Seq[Q] = Seq(bwtRuns, copeland, wassersteinDrift)

  // ---------------------------------------------------------------- q497

  private val bwtRuns: Q =
    Q("q497_bwt_runs",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        val sa = Entries76.suffixRanks(docs)
        // bwt char at SA rank r = the char immediately before the suffix
        // (1-based index pos, since pos is 0-based); pos = 0 -> sentinel
        val bw = sa.join(docs, Seq("doc_id"))
          .select(col("doc_id"), col("r"),
            when(col("pos") === 0L, lit("\u0001"))
              .otherwise(expr("substring(text, CAST(pos AS INT), 1)"))
              .as("c"))
        val byR = Window.partitionBy(col("doc_id")).orderBy(col("r"))
        bw.withColumn("p", lag(col("c"), 1).over(byR))
          .withColumn("b",
            when(col("p").isNull || col("p") =!= col("c"), 1L)
              .otherwise(0L))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("len"),
            sum(col("b")).as("n_runs"),
            graft.ext.Dedup.contentId(
              expr("array_join(transform(array_sort(collect_list(" +
                "struct(r, c))), x -> x.c), '')")).as("bwt_hash"))
          .select(col("doc_id"), col("len"), col("n_runs"),
            expr("n_runs * 1000000 DIV len").as("runs_ppm"),
            col("bwt_hash"))
      },
      Some(s"""WITH ${Entries76.saCtes},
              |bw AS (
              |  SELECT s.doc_id AS doc_id, s.r AS r,
              |    CASE WHEN s.pos = 0 THEN chr(1)
              |      ELSE substr(d.text, CAST(s.pos AS INT), 1) END AS c
              |  FROM sa s JOIN documents d ON d.doc_id = s.doc_id),
              |rb AS (
              |  SELECT doc_id, r, c,
              |    CASE WHEN lag(c) OVER (PARTITION BY doc_id ORDER BY r)
              |      IS DISTINCT FROM c THEN 1 ELSE 0 END AS b
              |  FROM bw)
              |SELECT doc_id, CAST(count(*) AS BIGINT) AS len,
              |  CAST(sum(b) AS BIGINT) AS n_runs,
              |  CAST(sum(b) * 1000000 // count(*) AS BIGINT) AS runs_ppm,
              |  ('0x' || substr(md5(string_agg(c, '' ORDER BY r)), 1,
              |    12))::BIGINT AS bwt_hash
              |FROM rb GROUP BY doc_id""".stripMargin))

  // ---------------------------------------------------------------- q498

  private val copeland: Q =
    Q("q498_copeland",
      (s, d) => {
        val rw = Window.orderBy(col("borda").desc, col("doc_id"))
        val top = Entries92.bordaTable(s, d)
          .withColumn("brank", row_number().over(rw))
          .filter(col("brank") <= 50)
          .persist(StorageLevel.MEMORY_AND_DISK) // both pair sides
        val a = top.select(col("doc_id").as("da"), col("r1").as("a1"),
          col("r2").as("a2"), col("r3").as("a3"))
        val b = top.select(col("doc_id").as("db"), col("r1").as("b1"),
          col("r2").as("b2"), col("r3").as("b3"))
        // 3 rankers, row_number ranks: the vote is never split 1.5/1.5,
        // so every pair produces exactly one winner
        val pairs = a.join(b, col("da") < col("db"))
          .withColumn("awins", expr(
            "CASE WHEN (CASE WHEN a1 < b1 THEN 1 ELSE 0 END + " +
              "CASE WHEN a2 < b2 THEN 1 ELSE 0 END + " +
              "CASE WHEN a3 < b3 THEN 1 ELSE 0 END) >= 2 " +
              "THEN 1L ELSE 0L END"))
        val votes = pairs.select(col("da").as("doc"), col("awins").as("w"))
          .unionByName(pairs.select(col("db").as("doc"),
            (lit(1L) - col("awins")).as("w")))
        votes.groupBy(col("doc"))
          .agg(count(lit(1)).as("n_opp"), sum(col("w")).as("wins"))
          .select(col("doc").as("doc_id"), col("wins"),
            (col("n_opp") - col("wins")).as("losses"),
            (lit(2L) * col("wins") - col("n_opp")).as("copeland"))
          .withColumn("crank", row_number().over(
            Window.orderBy(col("copeland").desc, col("doc_id")))
            .cast("int"))
      },
      Some(Entries92.bordaCtes +
        """,
          |top AS (
          |  SELECT doc_id, r1, r2, r3 FROM (
          |    SELECT *, row_number() OVER (ORDER BY borda DESC, doc_id)
          |      AS brank FROM agg)
          |  WHERE brank <= 50),
          |pr AS (
          |  SELECT a.doc_id AS da, b.doc_id AS db,
          |    CASE WHEN (CASE WHEN a.r1 < b.r1 THEN 1 ELSE 0 END +
          |      CASE WHEN a.r2 < b.r2 THEN 1 ELSE 0 END +
          |      CASE WHEN a.r3 < b.r3 THEN 1 ELSE 0 END) >= 2
          |      THEN 1 ELSE 0 END AS awins
          |  FROM top a JOIN top b ON a.doc_id < b.doc_id),
          |vt AS (
          |  SELECT da AS doc, awins AS w FROM pr
          |  UNION ALL SELECT db, 1 - awins FROM pr),
          |cp AS (
          |  SELECT doc AS doc_id, CAST(count(*) AS BIGINT) AS n_opp,
          |    CAST(sum(w) AS BIGINT) AS wins FROM vt GROUP BY doc)
          |SELECT doc_id, wins,
          |  CAST(n_opp - wins AS BIGINT) AS losses,
          |  CAST(2 * wins - n_opp AS BIGINT) AS copeland,
          |  CAST(row_number() OVER (ORDER BY 2 * wins - n_opp DESC,
          |    doc_id) AS INT) AS crank
          |FROM cp""".stripMargin))

  // ---------------------------------------------------------------- q499

  private val wassersteinDrift: Q =
    Q("q499_wasserstein_weekly",
      (s, d) => {
        val wk = Tables.orders(s, d).select(
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
            " DIV 604800000000").as("week"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
          .persist(StorageLevel.MEMORY_AND_DISK) // A side, B side, totals
        val wz = wk.groupBy(col("week"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        val pr = wz.select(col("week").as("pw"), col("n").as("na"),
          col("sx").as("sxa"))
          .join(wz.select((col("week") - 1L).as("wb"), col("n").as("nb"),
            col("sx").as("sxb")), col("pw") === col("wb"))
          .select(col("pw"), col("na"), col("nb"), col("sxa"), col("sxb"))
        val u = wk.select(col("week").as("uw"), col("x"),
          lit(1L).as("ca"), lit(0L).as("cb"))
          .unionByName(wk.select((col("week") - 1L).as("uw"), col("x"),
            lit(0L).as("ca"), lit(1L).as("cb")))
        // distinct merged support per pair, then one cumulative sweep
        val pts = u.join(broadcast(pr), col("uw") === col("pw"))
          .groupBy(col("pw"), col("na"), col("nb"), col("sxa"),
            col("sxb"), col("x"))
          .agg(sum(col("ca")).as("da"), sum(col("cb")).as("db"))
        val byX = Window.partitionBy(col("pw")).orderBy(col("x"))
        val run = byX.rowsBetween(Window.unboundedPreceding,
          Window.currentRow)
        val cum = pts
          .withColumn("cva", sum(col("da")).over(run))
          .withColumn("cvb", sum(col("db")).over(run))
          // past the max of both weeks F = G = 1: the last gap is 0
          .withColumn("gap",
            coalesce(lead(col("x"), 1).over(byX) - col("x"), lit(0L)))
          .withColumn("term",
            abs(col("cva") * col("nb") - col("cvb") * col("na"))
              * col("gap"))
        cum.groupBy(col("pw"), col("na"), col("nb"), col("sxa"),
          col("sxb"))
          .agg(sum(col("term")).as("num"))
          .select(col("pw").as("week"), (col("pw") + 1L).as("next_week"),
            col("na").as("n_a"), col("nb").as("n_b"),
            expr("CAST(CAST(num AS DECIMAL(38,0)) DIV" +
              " (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)")
              .as("w1_cents"),
            expr("CAST(CAST(abs(sxa * nb - sxb * na) AS DECIMAL(38,0))" +
              " DIV (CAST(na AS DECIMAL(38,0)) * nb) AS BIGINT)")
              .as("mean_gap_cents"))
      },
      Some("""WITH wk AS (
             |  SELECT CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP))
             |      // 604800000000 AS BIGINT) AS week,
             |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
             |  FROM orders),
             |wz AS (SELECT week, CAST(count(*) AS BIGINT) AS n,
             |         CAST(sum(x) AS BIGINT) AS sx
             |       FROM wk GROUP BY week),
             |pr AS (SELECT a.week AS pw, a.n AS na, b.n AS nb,
             |         a.sx AS sxa, b.sx AS sxb
             |       FROM wz a JOIN wz b ON b.week = a.week + 1),
             |u AS (SELECT week AS uw, x, 1 AS ca, 0 AS cb FROM wk
             |      UNION ALL SELECT week - 1, x, 0, 1 FROM wk),
             |pts AS (SELECT pr.pw, pr.na, pr.nb, pr.sxa, pr.sxb, u.x,
             |          CAST(sum(u.ca) AS BIGINT) AS da,
             |          CAST(sum(u.cb) AS BIGINT) AS db
             |        FROM u JOIN pr ON pr.pw = u.uw
             |        GROUP BY 1, 2, 3, 4, 5, 6),
             |cm AS (SELECT pw, na, nb, sxa, sxb, x,
             |         sum(da) OVER w AS cva, sum(db) OVER w AS cvb,
             |         coalesce(lead(x) OVER (PARTITION BY pw
             |           ORDER BY x) - x, 0) AS gap
             |       FROM pts WINDOW w AS (PARTITION BY pw ORDER BY x
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
             |SELECT pw AS week, pw + 1 AS next_week, na AS n_a,
             |  nb AS n_b,
             |  CAST(CAST(sum(abs(cva * nb - cvb * na) * gap) AS HUGEINT)
             |    // (CAST(na AS HUGEINT) * nb) AS BIGINT) AS w1_cents,
             |  CAST(CAST(abs(sxa * nb - sxb * na) AS HUGEINT)
             |    // (CAST(na AS HUGEINT) * nb) AS BIGINT)
             |    AS mean_gap_cents
             |FROM cm GROUP BY pw, na, nb, sxa, sxb""".stripMargin))
}
