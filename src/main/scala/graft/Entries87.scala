package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ExtEntries.Q

/** Round-13 batch 3 — neighborhood-function sketching, the SQL-text
  * calibration twin, and RAKE keyphrase extraction (integer/grid
  * arithmetic only, exact DuckDB oracle mirrors):
  *
  *  - q475 HyperBall (Boldi & Vigna, WebSci 2013 "In-core computation of
  *    geometric centralities with HyperBall"): per-node neighborhood-ball
  *    counters over the part–supplier bipartite purchase graph, advanced
  *    two rounds by the paper's register MAX-MERGE along edges — and the
  *    oracle PROVES the HyperBall theorem row-for-row: after t rounds the
  *    propagated register state equals the direct HLL register state of
  *    the EXACT radius-t ball (max over members), so `reg_sum_prop` and
  *    `reg_sum_direct` must both equal the oracle's exact-ball register
  *    sum. Registers are (idx = h mod 16, rho = 1 + trailing-zeros(h div
  *    16)) over the 48-bit md5 node hash — pure BIGINT bit math on both
  *    engines (`bit_count((x & -x) - 1)`), no harmonic-mean float ever
  *    leaves the engine; `n_ball` rides alongside as the measured-error
  *    gate (the q448/q473 discipline). Scale posture: one round = one
  *    shuffle of the (node, idx, rho) long-form state on the edge key +
  *    a (node, idx) max-regroup — state is O(V·16) regardless of corpus
  *    size, the exact-ball side is the oracle's burden (bounded domain),
  *    not the scale path; at 100 TB you run ONLY the propagation.
  *
  *  - q476 SQL-TEXT PAV TWIN over
  *    [[graft.ext.SqlSurface.registerCalibrationViews]] (the q459/q430
  *    view-twin discipline extended to the train-prep calibration
  *    family): the identical max_{j<=i} min_{k>=i} avg-pool closed form
  *    of q470, phrased as pure SQL against the registered
  *    `graft_calib_bins` view. IDENTICAL oracle to q470 — the view twin
  *    must agree with the DataFrame sibling row-for-row.
  *
  *  - q477 RAKE keyphrases (Rose, Engel, Cramer & Cowley 2010, "Automatic
  *    keyword extraction from individual documents"): candidate phrases =
  *    maximal stopword-free token runs (capped at 8 tokens, the standard
  *    RAKE candidate bound), word score = deg(w)/freq(w) on the 1e6 ppm
  *    grid where deg sums the lengths of every phrase occurrence
  *    containing w, phrase score = sum of member-token word scores,
  *    top-20 by (score desc, phrase asc). All-integer replay: ppm scores
  *    are BIGINT floor-division on non-negative operands (the DIV-vs-//
  *    parity regime). Scale posture: segmentation is a doc-partitioned
  *    running sum; phrase assembly is a doc-local groupBy; word stats
  *    live on the word-TYPE domain; the only unpartitioned window is the
  *    top-20 rank, which Spark executes as a map-side WindowGroupLimit.
  *
  * Reference anchor: the reference has no graph/text surface (775-LoC
  * pandas feature store — SURVEY.md §0); these extend the mandated graph,
  * SQL-surface and text-analysis families of the 100 TB pipeline charter.
  */
object Entries87 {

  def all: Seq[Q] = Seq(hyperBall, sqlPavTwin, rakeKeyphrases)

  private def md5Long(c: Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  // ---------------------------------------------------------------- q475

  /** One HyperBall round: max-merge every node's register set with its
    * in-neighbors' register sets (st long-form: node, idx, rho). */
  private def hbRound(edges: DataFrame, st: DataFrame): DataFrame = {
    val e = edges.select(col("src").as("e_src"), col("dst").as("e_dst"))
    st.union(
        e.join(st, e("e_src") === st("node"))
          .select(col("e_dst").as("node"), st("idx"), st("rho")))
      .groupBy(col("node"), col("idx"))
      .agg(max(col("rho")).as("rho"))
  }

  private val hyperBall: Q =
    Q("q475_hyperball",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val e0 = li.select(
            md5Long(concat(lit("p"), col("l_partkey"))).as("src"),
            md5Long(concat(lit("s"), col("l_suppkey"))).as("dst"))
          .distinct()
        val edges = e0
          .union(e0.select(col("dst").as("src"), col("src").as("dst")))
          .persist(StorageLevel.MEMORY_AND_DISK) // 2 rounds + exact ball
        val sup = li.select(col("l_suppkey").as("suppkey")).distinct()
          .select(col("suppkey"),
            md5Long(concat(lit("s"), col("suppkey"))).as("node"))
          .persist(StorageLevel.MEMORY_AND_DISK) // root pairs + final join
        // rho(h) = 1 + trailing-zeros(h div 16); 45 caps the (never-hit
        // on 48-bit md5) zero case identically on both engines
        val rhoSql = (c: String) =>
          s"CASE WHEN $c DIV 16 = 0 THEN 45 ELSE " +
            s"bit_count((($c DIV 16) & -($c DIV 16)) - 1) END + 1"
        val nodes = edges.select(col("src").as("node")).distinct()
        val st0 = nodes.select(col("node"),
          expr("node % 16").as("idx"), expr(rhoSql("node")).as("rho"))
        // round 1 feeds round 2's self AND neighbor branches — pin it
        val st1 = hbRound(edges, st0)
          .persist(StorageLevel.MEMORY_AND_DISK)
        // round 2 TARGETED at the output roots (the HyperBall state is
        // per-node, but only supplier balls leave the query — merging
        // into the 20× part majority would be wasted shuffle)
        val supN = sup.select(col("node").as("sn"))
        val eSup = edges.join(supN, edges("dst") === col("sn"))
          .select(col("src").as("e_src"), col("dst").as("e_dst"))
        val st2 = st1
          .join(supN, st1("node") === col("sn"))
          .select(st1("node"), st1("idx"), st1("rho"))
          .union(eSup.join(st1, col("e_src") === st1("node"))
            .select(col("e_dst").as("node"), st1("idx"), st1("rho")))
          .groupBy(col("node"), col("idx"))
          .agg(max(col("rho")).as("rho"))
        val prop = st2.groupBy(col("node"))
          .agg(sum(col("rho")).cast("long").as("reg_sum_prop"))
        // exact radius-2 ball membership pairs, supplier roots only
        val e1 = edges.select(col("src").as("r1s"), col("dst").as("r1d"))
        val e2 = edges.select(col("src").as("r2s"), col("dst").as("r2d"))
        val p1 = sup.select(col("node").as("v"), col("node").as("m"))
          .union(e1.join(sup, col("r1s") === sup("node"))
            .select(col("r1s").as("v"), col("r1d").as("m")))
        val p2 = p1
          .union(p1.join(e2, p1("m") === col("r2s"))
            .select(p1("v"), col("r2d").as("m")))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK) // registers + n_ball
        val direct = p2
          .select(col("v"), expr("m % 16").as("idx"),
            expr(rhoSql("m")).as("rho"))
          .groupBy(col("v"), col("idx")).agg(max(col("rho")).as("rho"))
          .groupBy(col("v"))
          .agg(sum(col("rho")).cast("long").as("reg_sum_direct"))
          .select(col("v").as("dv"), col("reg_sum_direct"))
        val nb = p2.groupBy(col("v")).agg(count(lit(1)).as("n_ball"))
          .select(col("v").as("bv"), col("n_ball"))
        val propN = prop.select(col("node").as("pn"), col("reg_sum_prop"))
        sup.join(propN, sup("node") === col("pn"))
          .join(direct, sup("node") === col("dv"))
          .join(nb, sup("node") === col("bv"))
          .select(col("suppkey"), col("n_ball"),
            col("reg_sum_prop"), col("reg_sum_direct"))
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT
             |    ('0x' || substr(md5('p' || l_partkey), 1, 12))::BIGINT
             |      AS src,
             |    ('0x' || substr(md5('s' || l_suppkey), 1, 12))::BIGINT
             |      AS dst
             |  FROM lineitem),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |sup AS (SELECT DISTINCT l_suppkey AS suppkey,
             |    ('0x' || substr(md5('s' || l_suppkey), 1, 12))::BIGINT
             |      AS node
             |  FROM lineitem),
             |p1 AS (SELECT node AS v, node AS m FROM sup
             |       UNION SELECT e.src, e.dst
             |       FROM e JOIN sup ON sup.node = e.src),
             |p2 AS (SELECT v, m FROM p1
             |       UNION SELECT p1.v, e.dst
             |       FROM p1 JOIN e ON e.src = p1.m),
             |reg AS (
             |  SELECT v, m % 16 AS idx,
             |    max(CASE WHEN m // 16 = 0 THEN 45
             |        ELSE bit_count(((m // 16) & (-(m // 16))) - 1)
             |        END + 1) AS rho
             |  FROM p2 GROUP BY 1, 2),
             |agg AS (SELECT v, CAST(sum(rho) AS BIGINT) AS reg_sum
             |        FROM reg GROUP BY v),
             |nb AS (SELECT v, CAST(count(*) AS BIGINT) AS n_ball
             |       FROM p2 GROUP BY v)
             |SELECT sup.suppkey, nb.n_ball, agg.reg_sum AS reg_sum_prop,
             |  agg.reg_sum AS reg_sum_direct
             |FROM agg JOIN nb ON nb.v = agg.v
             |JOIN sup ON sup.node = agg.v""".stripMargin))

  // ---------------------------------------------------------------- q476

  private val sqlPavTwin: Q =
    Q("q476_sql_pav_twin",
      (s, d) => {
        graft.ext.SqlSurface.registerCalibrationViews(
          s, Tables.events(s, d))
        s.sql("""WITH pre AS (SELECT * FROM graft_calib_bins),
                |pairs AS (
                |  SELECT j.bin AS jb, k.bin AS kb,
                |    ((k.cs - j.psp) * 1000000) DIV (k.cw - j.pwp)
                |      AS avg_ppm
                |  FROM pre j JOIN pre k ON j.bin <= k.bin),
                |mink AS (
                |  SELECT i.bin AS ib, i.n, i.s, p.jb, min(p.avg_ppm) AS m
                |  FROM pairs p JOIN pre i
                |    ON p.jb <= i.bin AND i.bin <= p.kb
                |  GROUP BY 1, 2, 3, 4),
                |fit AS (SELECT ib, n, s, max(m) AS fitted_ppm
                |        FROM mink GROUP BY 1, 2, 3)
                |SELECT ib AS bin, n, (s * 1000000) DIV n AS mean_ppm,
                |  fitted_ppm
                |FROM fit""".stripMargin)
      },
      // IDENTICAL oracle to the q470 DataFrame sibling — the view twin
      // must agree row-for-row (Batch87Spec also matches them directly)
      Entries85.all.find(_.name == "q470_isotonic_pav").get.sql)

  // ---------------------------------------------------------------- q477

  private val rakeKeyphrases: Q =
    Q("q477_rake_keyphrases",
      (s, d) => {
        val stop = Seq("the", "a", "of", "and", "to", "in", "is", "on")
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
          .withColumn("stp",
            when(col("w").isin(stop: _*), 1).otherwise(0))
        // phrase id = running stopword count (doc-partitioned window)
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val seg = toks.withColumn("phid", sum(col("stp")).over(wd))
          .filter(col("stp") === 0)
          .persist(StorageLevel.MEMORY_AND_DISK) // phrases + word stats
        val ph = seg.groupBy(col("doc_id"), col("phid"))
          .agg(
            expr("array_join(transform(" +
              "array_sort(collect_list(struct(pos, w))), x -> x.w), ' ')")
              .as("phrase"),
            count(lit(1)).as("plen"))
          .filter(col("plen") <= 8) // the standard RAKE candidate cap
        val wtok = seg
          .join(ph, Seq("doc_id", "phid"))
          .select(col("doc_id"), col("phid"), col("w"), col("plen"))
        // word-TYPE-domain scores: deg/freq on the ppm grid
        val ws = wtok.groupBy(col("w"))
          .agg(expr("(sum(plen) * 1000000) DIV count(1)").as("ws_ppm"))
        val inst = wtok.join(ws, Seq("w"))
          .groupBy(col("doc_id"), col("phid"))
          .agg(sum(col("ws_ppm")).cast("long").as("score_ppm"))
        val pt = ph.join(inst, Seq("doc_id", "phid"))
          .groupBy(col("phrase"))
          .agg(count(lit(1)).as("n_occ"), max(col("plen")).as("plen"),
            max(col("score_ppm")).as("score_ppm"))
        // top-20 rank: map-side WindowGroupLimit under the k<=20 filter
        val rw = Window.orderBy(col("score_ppm").desc, col("phrase").asc)
        pt.withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 20)
          .select(col("phrase"), col("n_occ"), col("plen"),
            col("score_ppm"), col("rank").cast("int").as("rank"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, i AS pos, w[i] AS w,
             |    CASE WHEN w[i] IN
             |      ('the','a','of','and','to','in','is','on')
             |      THEN 1 ELSE 0 END AS stp
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents) d,
             |       (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE i <= len(w)),
             |seg AS (
             |  SELECT doc_id, pos, w, stp,
             |    sum(stp) OVER (PARTITION BY doc_id ORDER BY pos
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS phid
             |  FROM tok),
             |ph AS (
             |  SELECT doc_id, phid,
             |    string_agg(w, ' ' ORDER BY pos) AS phrase,
             |    CAST(count(*) AS BIGINT) AS plen
             |  FROM seg WHERE stp = 0 GROUP BY doc_id, phid
             |  HAVING count(*) <= 8),
             |wtok AS (
             |  SELECT s.doc_id, s.phid, s.w, p.plen
             |  FROM seg s JOIN ph p
             |    ON p.doc_id = s.doc_id AND p.phid = s.phid
             |  WHERE s.stp = 0),
             |ws AS (
             |  SELECT w,
             |    CAST((sum(plen) * 1000000) // count(*) AS BIGINT)
             |      AS ws_ppm
             |  FROM wtok GROUP BY w),
             |inst AS (
             |  SELECT t.doc_id, t.phid,
             |    CAST(sum(ws.ws_ppm) AS BIGINT) AS score_ppm
             |  FROM wtok t JOIN ws ON ws.w = t.w GROUP BY t.doc_id, t.phid),
             |pt AS (
             |  SELECT ph.phrase, CAST(count(*) AS BIGINT) AS n_occ,
             |    max(ph.plen) AS plen, max(i.score_ppm) AS score_ppm
             |  FROM ph JOIN inst i
             |    ON i.doc_id = ph.doc_id AND i.phid = ph.phid
             |  GROUP BY ph.phrase)
             |SELECT phrase, n_occ, plen, score_ppm,
             |  CAST(rank AS INT) AS rank FROM (
             |  SELECT *, row_number() OVER (
             |      ORDER BY score_ppm DESC, phrase ASC) AS rank
             |  FROM pt) WHERE rank <= 20""".stripMargin))
}
