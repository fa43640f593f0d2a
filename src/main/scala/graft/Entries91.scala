package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ExtEntries.Q

/** Round-13 batch 7 — vocabulary-growth census, time-decayed sketching,
  * and personalized PageRank (integer/grid arithmetic only, exact DuckDB
  * oracle mirrors):
  *
  *  - q487 HEAPS'-LAW TYPE-TOKEN CENSUS (Heaps 1978; the vocabulary-
  *    growth curve V(n) ~ K·n^β every tokenizer-budget decision reads):
  *    cumulative token and TYPE counts at 100-doc checkpoints, for word
  *    types AND char-4-gram types (the synthetic corpus's 31-word
  *    vocabulary saturates instantly — the gram domain is where the
  *    curve is live). DISTINCT-SO-FAR without any fact-sized window:
  *    each type's FIRST document via groupBy-min, then a checkpoint
  *    broadcast join counts types with first-doc ≤ cp — checkpoint-
  *    domain-bounded work at any SF (the q183-family rank trick applied
  *    to vocabulary growth).
  *
  *  - q488 TIME-DECAYED CMS in the Hokusai item-aggregation style
  *    (Matusevych, Smola & Ahmed, UAI 2012): weekly d=2 × w=16 CMS
  *    sketches over event counts keyed by event_type, aged by integer
  *    halving per week of age (counter DIV 2^age — floors are applied
  *    per (week, cell) identically in both engines, so the replay is
  *    exact), merged by addition. Point query = min over rows; the
  *    exact decayed count (same per-week floor ladder on the true
  *    counts) rides beside with the overcount in ppm — floor
  *    superadditivity guarantees est ≥ exact, which the spec executes.
  *    Mergeable-monoid posture: aging and merge commute per cell.
  *
  *  - q489 PERSONALIZED PAGERANK (Haveliveala, WWW 2002 / the PPR form
  *    of q107's exact fixed-point iteration): restart mass pinned to
  *    the BUILDING-segment customers on the symmetric customer–supplier
  *    purchase graph, 3 unrolled rounds of m' = 150000·is_seed +
  *    850000·Σ(m/outdeg) DIV 10⁶ — all BIGINT grid arithmetic, the
  *    restart term re-injected via a full-outer join with the seed set
  *    each round (a seed with no incoming mass must still hold its
  *    teleport mass). Top-20 by (mass, node) total order, node decoded
  *    to (kind, key). One shuffle per round on the edge key.
  *
  * Reference anchor: no vocabulary/sketch/graph surface in the 775-LoC
  * pandas reference (SURVEY.md §0); these extend the text-analysis,
  * sketch-algebra and graph families of the 100 TB charter.
  */
object Entries91 {

  def all: Seq[Q] = Seq(heapsCensus, decayedCms, personalizedPr)

  private def md5Long(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  // ---------------------------------------------------------------- q487

  private val heapsCensus: Q =
    Q("q487_heaps_census",
      (s, d) => {
        // persisted (r13): the corpus feeds three independent explodes
        // (token counts, word first-seen, gram first-seen) and dt feeds
        // two consumers — uncached this query ran NINE corpus scans
        // (census row), each paying the fan-out exchange again
        val docs = Tables.documents(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val dt = docs.select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val ck = dt.filter(expr("(doc_id + 1) % 100 = 0"))
          .select(col("doc_id").as("cp"))
          .union(dt.agg(max(col("doc_id")).as("cp")))
          .distinct()
        val wfirst = docs
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("w")).agg(min(col("doc_id")).as("fd"))
        val gfirst = docs
          .filter(length(col("text")) >= 4)
          .select(col("doc_id"),
            explode(sequence(lit(1), length(col("text")) - lit(3)))
              .as("i"), col("text"))
          .select(col("doc_id"),
            expr("substring(text, i, 4)").as("g"))
          .groupBy(col("g")).agg(min(col("doc_id")).as("fd"))
        val tok = broadcast(ck).join(dt, col("doc_id") <= col("cp"))
          .groupBy(col("cp")).agg(sum(col("n_tok")).as("toks"))
        val wty = broadcast(ck.select(col("cp").as("wcp")))
          .join(wfirst, col("fd") <= col("wcp"))
          .groupBy(col("wcp")).agg(count(lit(1)).as("w_types"))
        val gty = broadcast(ck.select(col("cp").as("gcp")))
          .join(gfirst, col("fd") <= col("gcp"))
          .groupBy(col("gcp")).agg(count(lit(1)).as("g_types"))
        tok.join(wty, col("wcp") === col("cp"))
          .join(gty, col("gcp") === col("cp"))
          .select(col("cp").as("checkpoint"), col("toks").as("n_tokens"),
            col("w_types"), col("g_types"),
            expr("g_types * 1000000 DIV toks").as("gram_ttr_ppm"))
      },
      Some("""WITH dt AS (
             |  SELECT doc_id, len(string_split(text, ' ')) AS n_tok
             |  FROM documents),
             |ck AS (
             |  SELECT doc_id AS cp FROM dt WHERE (doc_id + 1) % 100 = 0
             |  UNION SELECT max(doc_id) FROM dt),
             |wfirst AS (
             |  SELECT w, min(doc_id) AS fd FROM (
             |    SELECT doc_id, unnest(string_split(text, ' ')) AS w
             |    FROM documents)
             |  GROUP BY w),
             |gfirst AS (
             |  SELECT g, min(doc_id) AS fd FROM (
             |    SELECT doc_id, substr(text, i, 4) AS g
             |    FROM documents, (SELECT unnest(range(1, 1000)) AS i) t
             |    WHERE i + 3 <= len(text))
             |  GROUP BY g),
             |tok AS (SELECT ck.cp AS cp, CAST(sum(dt.n_tok) AS BIGINT)
             |          AS toks
             |        FROM ck JOIN dt ON dt.doc_id <= ck.cp GROUP BY 1),
             |wty AS (SELECT ck.cp AS cp, CAST(count(*) AS BIGINT)
             |          AS w_types
             |        FROM ck JOIN wfirst ON wfirst.fd <= ck.cp
             |        GROUP BY 1),
             |gty AS (SELECT ck.cp AS cp, CAST(count(*) AS BIGINT)
             |          AS g_types
             |        FROM ck JOIN gfirst ON gfirst.fd <= ck.cp
             |        GROUP BY 1)
             |SELECT tok.cp AS checkpoint, tok.toks AS n_tokens,
             |  wty.w_types AS w_types, gty.g_types AS g_types,
             |  CAST(gty.g_types * 1000000 // tok.toks AS BIGINT)
             |    AS gram_ttr_ppm
             |FROM tok JOIN wty ON wty.cp = tok.cp
             |JOIN gty ON gty.cp = tok.cp""".stripMargin))

  // ---------------------------------------------------------------- q488

  private val decayedCms: Q =
    Q("q488_decayed_cms",
      (s, d) => {
        val ev = Tables.events(s, d).select(col("event_type"),
          expr("ts_us DIV 604800000000").as("week"))
        val mx = ev.agg(max(col("week")).as("mw"))
        val rows = s.range(0, 2).select(col("id").cast("int").as("r"))
        val cells = ev.crossJoin(broadcast(rows))
          .groupBy(col("week"), col("r"),
            expr("CASE WHEN r = 0 THEN" +
              " conv(substr(md5(concat('a', event_type)), 1, 12), 16, 10)" +
              " % 16 ELSE" +
              " conv(substr(md5(concat('b', event_type)), 1, 12), 16, 10)" +
              " % 16 END").cast("long").as("bucket"))
          .agg(count(lit(1)).as("c"))
        val aged = cells.crossJoin(broadcast(mx))
          .groupBy(col("r"), col("bucket"))
          .agg(sum(expr(
            "c DIV shiftleft(1L, CAST(least(mw - week, 40) AS INT))"))
            .cast("long").as("ac"))
        val et = ev.groupBy(col("event_type").as("qk"), col("week"))
          .agg(count(lit(1)).as("c"))
        val exact = et.crossJoin(broadcast(mx))
          .groupBy(col("qk"))
          .agg(sum(expr(
            "c DIV shiftleft(1L, CAST(least(mw - week, 40) AS INT))"))
            .cast("long").as("decayed_exact"))
        val probes = exact.select(col("qk"),
          expr("conv(substr(md5(concat('a', qk)), 1, 12), 16, 10) % 16")
            .cast("long").as("b0"),
          expr("conv(substr(md5(concat('b', qk)), 1, 12), 16, 10) % 16")
            .cast("long").as("b1"),
          col("decayed_exact"))
        val a0 = aged.filter(col("r") === 0)
          .select(col("bucket").as("k0"), col("ac").as("c0"))
        val a1 = aged.filter(col("r") === 1)
          .select(col("bucket").as("k1"), col("ac").as("c1"))
        probes
          .join(a0, col("b0") === col("k0"))
          .join(a1, col("b1") === col("k1"))
          .select(col("qk").as("event_type"), col("decayed_exact"),
            least(col("c0"), col("c1")).as("decayed_est"))
          .withColumn("over_ppm",
            expr("CASE WHEN decayed_exact = 0 THEN -1L ELSE" +
              " (decayed_est - decayed_exact) * 1000000" +
              " DIV decayed_exact END"))
      },
      Some("""WITH ev AS (
             |  SELECT event_type,
             |    CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week
             |  FROM events),
             |mx AS (SELECT max(week) AS mw FROM ev),
             |cells AS (
             |  SELECT week, r.r AS r,
             |    CASE WHEN r.r = 0
             |      THEN ('0x' || substr(md5('a' || event_type), 1, 12))
             |        ::BIGINT % 16
             |      ELSE ('0x' || substr(md5('b' || event_type), 1, 12))
             |        ::BIGINT % 16 END AS bucket,
             |    CAST(count(*) AS BIGINT) AS c
             |  FROM ev CROSS JOIN (SELECT unnest([0, 1]) AS r) r
             |  GROUP BY 1, 2, 3),
             |aged AS (
             |  SELECT r, bucket,
             |    CAST(sum(c // (1::BIGINT
             |      << CAST(least(mx.mw - week, 40) AS INT))) AS BIGINT)
             |      AS ac
             |  FROM cells CROSS JOIN mx GROUP BY 1, 2),
             |et AS (SELECT event_type AS qk, week,
             |         CAST(count(*) AS BIGINT) AS c
             |       FROM ev GROUP BY 1, 2),
             |exact AS (
             |  SELECT qk,
             |    CAST(sum(c // (1::BIGINT
             |      << CAST(least(mx.mw - week, 40) AS INT))) AS BIGINT)
             |      AS decayed_exact
             |  FROM et CROSS JOIN mx GROUP BY qk),
             |probes AS (
             |  SELECT qk,
             |    ('0x' || substr(md5('a' || qk), 1, 12))::BIGINT % 16
             |      AS b0,
             |    ('0x' || substr(md5('b' || qk), 1, 12))::BIGINT % 16
             |      AS b1,
             |    decayed_exact
             |  FROM exact)
             |SELECT qk AS event_type, decayed_exact,
             |  least(a0.ac, a1.ac) AS decayed_est,
             |  CASE WHEN decayed_exact = 0 THEN -1
             |    ELSE CAST((least(a0.ac, a1.ac) - decayed_exact)
             |      * 1000000 // decayed_exact AS BIGINT) END AS over_ppm
             |FROM probes
             |JOIN (SELECT bucket, ac FROM aged WHERE r = 0) a0
             |  ON a0.bucket = probes.b0
             |JOIN (SELECT bucket, ac FROM aged WHERE r = 1) a1
             |  ON a1.bucket = probes.b1""".stripMargin))

  // ---------------------------------------------------------------- q489

  /** One PPR round: spread along the (renamed) edge list, then re-inject
    * the teleport mass at every seed via a full-outer join. */
  private def pprRound(e: DataFrame, deg: DataFrame, seeds: DataFrame,
                       m: DataFrame): DataFrame = {
    // every input is renamed per branch: m and seeds share lineage
    // across rounds, and attribute refs from both sides of a self-join
    // trip Spark 4's failAmbiguousSelfJoin (the q475 lesson)
    val mm = m.select(col("node").as("mn"), col("mass").as("mmass"))
    val sd = seeds.select(col("node").as("sd_node"))
    val spread = e
      .join(deg, col("es") === col("ds"))
      .join(mm, col("es") === col("mn"))
      .filter(col("mmass") > 0)
      .groupBy(col("ed").as("sn"))
      .agg(sum(expr("mmass DIV outdeg")).as("im"))
    spread.join(sd, col("sn") === col("sd_node"), "full_outer")
      .select(coalesce(col("sn"), col("sd_node")).as("node"),
        (when(col("sd_node").isNotNull, 150000L).otherwise(0L) +
          expr("850000 * coalesce(im, 0L) DIV 1000000")).as("mass"))
  }

  private val personalizedPr: Q =
    Q("q489_personalized_pr",
      (s, d) => {
        val e0 = Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_custkey"))
          .join(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_suppkey")),
            col("o_orderkey") === col("l_orderkey"))
          .select((col("o_custkey") * 2).as("src"),
            (col("l_suppkey") * 2 + 1).as("dst"))
          .distinct()
          .persist(StorageLevel.MEMORY_AND_DISK) // both directions + seeds
        val eSym = e0
          .union(e0.select(col("dst").as("src"), col("src").as("dst")))
        val e = eSym.select(col("src").as("es"), col("dst").as("ed"))
          .persist(StorageLevel.MEMORY_AND_DISK) // 3 rounds + degrees
        val deg = eSym.groupBy(col("src").as("ds"))
          .agg(count(lit(1)).as("outdeg"))
        val seeds = Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING")
          .select((col("c_custkey") * 2).as("node"))
          .join(e0.select(col("src").as("gs")).distinct(),
            col("node") === col("gs"))
          .select(col("node"))
          .persist(StorageLevel.MEMORY_AND_DISK) // re-injected per round
        val m0 = seeds.select(col("node"), lit(1000000L).as("mass"))
        val m3 = pprRound(e, deg, seeds,
          pprRound(e, deg, seeds, pprRound(e, deg, seeds, m0)))
        val rw = Window.orderBy(col("mass").desc, col("node"))
        m3.filter(col("mass") > 0)
          .withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 20)
          .select(
            when(pmod(col("node"), lit(2)) === 0, "customer")
              .otherwise("supplier").as("kind"),
            expr("node DIV 2").as("key"), col("mass"),
            col("rank").cast("int").as("rank"))
      },
      Some("""WITH e0 AS (
             |  SELECT DISTINCT o.o_custkey * 2 AS src,
             |    l.l_suppkey * 2 + 1 AS dst
             |  FROM orders o JOIN lineitem l
             |    ON l.l_orderkey = o.o_orderkey),
             |e AS (SELECT src, dst FROM e0
             |      UNION SELECT dst, src FROM e0),
             |deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg
             |        FROM e GROUP BY src),
             |seeds AS (
             |  SELECT DISTINCT c.c_custkey * 2 AS node
             |  FROM customer c JOIN e0 ON e0.src = c.c_custkey * 2
             |  WHERE c.c_mktsegment = 'BUILDING'),
             |m0 AS (SELECT node, CAST(1000000 AS BIGINT) AS mass
             |       FROM seeds),
             |s1 AS (SELECT e.dst AS node,
             |         CAST(sum(m.mass // d.outdeg) AS BIGINT) AS im
             |       FROM e JOIN deg d ON e.src = d.src
             |       JOIN m0 m ON m.node = e.src
             |       WHERE m.mass > 0 GROUP BY e.dst),
             |m1 AS (SELECT coalesce(s1.node, sd.node) AS node,
             |         CAST(CASE WHEN sd.node IS NOT NULL THEN 150000
             |           ELSE 0 END
             |           + 850000 * coalesce(s1.im, 0) // 1000000
             |           AS BIGINT) AS mass
             |       FROM s1 FULL JOIN seeds sd ON sd.node = s1.node),
             |s2 AS (SELECT e.dst AS node,
             |         CAST(sum(m.mass // d.outdeg) AS BIGINT) AS im
             |       FROM e JOIN deg d ON e.src = d.src
             |       JOIN m1 m ON m.node = e.src
             |       WHERE m.mass > 0 GROUP BY e.dst),
             |m2 AS (SELECT coalesce(s2.node, sd.node) AS node,
             |         CAST(CASE WHEN sd.node IS NOT NULL THEN 150000
             |           ELSE 0 END
             |           + 850000 * coalesce(s2.im, 0) // 1000000
             |           AS BIGINT) AS mass
             |       FROM s2 FULL JOIN seeds sd ON sd.node = s2.node),
             |s3 AS (SELECT e.dst AS node,
             |         CAST(sum(m.mass // d.outdeg) AS BIGINT) AS im
             |       FROM e JOIN deg d ON e.src = d.src
             |       JOIN m2 m ON m.node = e.src
             |       WHERE m.mass > 0 GROUP BY e.dst),
             |m3 AS (SELECT coalesce(s3.node, sd.node) AS node,
             |         CAST(CASE WHEN sd.node IS NOT NULL THEN 150000
             |           ELSE 0 END
             |           + 850000 * coalesce(s3.im, 0) // 1000000
             |           AS BIGINT) AS mass
             |       FROM s3 FULL JOIN seeds sd ON sd.node = s3.node)
             |SELECT CASE WHEN node % 2 = 0 THEN 'customer'
             |    ELSE 'supplier' END AS kind,
             |  node // 2 AS key, mass, CAST(rank AS INT) AS rank FROM (
             |  SELECT node, mass, row_number() OVER (
             |      ORDER BY mass DESC, node) AS rank
             |  FROM m3 WHERE mass > 0)
             |WHERE rank <= 20""".stripMargin))
}
