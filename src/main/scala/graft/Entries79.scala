package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 7 — the perceptual-hash family completed and
  * two graph-structure operators the suite lacked:
  *
  *  - q451 IMAGE DIFFERENCE-HASH (dHash): the gradient member of the
  *    perceptual pair (q446 aHash = brightness-vs-mean; dHash =
  *    brightness-vs-NEIGHBOR). A 8×9 cell grid over the deterministic fake
  *    decode, bit = left cell brighter than its right neighbor, compared
  *    by exact cross-multiplication (cs_l·cn_r > cs_r·cn_l) — dHash is
  *    more robust to global brightness shifts than aHash because every
  *    comparison is local. Same banded candidate machinery as q446
  *    (8 bands × 8 bits, pigeonhole recall at Hamming ≤ 7, exact verify
  *    on candidates only).
  *  - q452 WEISFEILER–LEHMAN COLOR REFINEMENT (Weisfeiler & Leman 1968;
  *    the WL-kernel feature map of Shervashidze et al. 2011): iterative
  *    neighborhood hashing on the q192 co-engagement item graph —
  *    color₀ = degree, colorₜ₊₁ = md5(colorₜ ‖ sorted neighbor colorₜ
  *    multiset). Two rounds, then the color-class histogram: the
  *    structural fingerprint used for graph dedup/isomorphism screening
  *    at corpus scale. Every step is groupBy/join relational algebra on
  *    the item domain (bounded by the catalog, never fact-sized).
  *  - q453 LABEL PROPAGATION (Raghavan et al. 2007, synchronous variant):
  *    community detection on the same graph — 3 fixed synchronous rounds,
  *    deterministic tie-break (max neighbor-label count, then smallest
  *    label), then community rollup. The argmax is a per-NODE partitioned
  *    window — no global window at any scale. Complements the component
  *    operators (q48/q89) with sub-component community structure.
  *
  * All three replay exactly in DuckDB (md5 hex and string_agg-with-order
  * are engine-identical; everything else is integer algebra).
  */
object Entries79 {

  def all: Seq[Q] = Seq(imageDhash, wlColors, labelProp)

  /** Symmetrized co-engagement edges (v, u) — both directions of the q192
    * pair list (top-10 recency cap per user, support ≥ 2 users). */
  private[graft] def symEdges(s: org.apache.spark.sql.SparkSession,
                       d: String): DataFrame = {
    val edges = graft.ext.Curation
      .coengagementPairs(Tables.events(s, d), 10, 2L)
      .select(col("i1"), col("i2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.select(col("i1").as("v"), col("i2").as("u"))
      .unionByName(edges.select(col("i2").as("v"), col("i1").as("u")))
  }

  /** The q192 edge list + symmetrization as oracle CTEs. */
  private[graft] val symCte =
    """ui AS (
      |  SELECT user_id, props AS item, max(epoch_us(ts)) AS last_ts
      |  FROM events WHERE props IS NOT NULL GROUP BY 1, 2),
      |capped AS (
      |  SELECT user_id, item FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY last_ts DESC, item ASC) AS rn
      |    FROM ui)
      |  WHERE rn <= 10),
      |edges AS MATERIALIZED (
      |  SELECT a.item AS i1, b.item AS i2
      |  FROM capped a JOIN capped b
      |    ON a.user_id = b.user_id AND a.item < b.item
      |  GROUP BY 1, 2
      |  HAVING count(*) >= 2),
      |sym AS (
      |  SELECT i1 AS v, i2 AS u FROM edges
      |  UNION ALL
      |  SELECT i2 AS v, i1 AS u FROM edges)""".stripMargin

  // ---------------------------------------------------------------- q451

  private val imageDhash: Q =
    Q("q451_image_dhash",
      (s, d) => {
        // 72 cells = 8 rows × 9 columns over the fake decode (payload
        // bytes as pixels — the q446/q29 stub contract: swap ascii() for
        // a real decoder's luma and nothing else changes). len ≥ 72
        // guarantees every cell is non-empty.
        // ROW-LOCAL since r13 (the q446 rewrite, optimization guide
        // §1.2/§2.4): the 72 cell sums and the 8 adjacent-cell-gradient
        // band bytes are functions of one document's bytes — HOF folds
        // per row replace the char explode + exchange + cell self-join
        // (sf0.1 cold 10.1 s → ~2 s). Cell g covers 0-based positions
        // [⌈g·len/72⌉, ⌈(g+1)·len/72⌉); bit (g, g%9<8) compares cell g
        // vs g+1 means by exact cross-multiplication.
        val wide = Tables.documents(s, d)
          .filter(length(col("text")) >= 72)
          .select(col("doc_id"), col("text"),
            length(col("text")).cast("long").as("len"))
          .withColumn("cs72", expr(
            "transform(sequence(0L, 71L), g -> aggregate(" +
              "sequence(1 + (g * len + 71) DIV 72, " +
              "((g + 1) * len + 71) DIV 72), 0L, " +
              "(a, i) -> a + ascii(substring(text, CAST(i AS INT), 1))))"))
          .select(Seq(col("doc_id")) ++ (0 until 8).map(j =>
            expr(s"aggregate(sequence(${9 * j}L, ${9 * j + 7}L), 0L, " +
              "(a, g) -> a + CASE WHEN " +
              "element_at(cs72, CAST(g + 1 AS INT)) * " +
              "(((g + 2) * len + 71) DIV 72 - ((g + 1) * len + 71) DIV 72)" +
              " > element_at(cs72, CAST(g + 2 AS INT)) * " +
              "(((g + 1) * len + 71) DIV 72 - (g * len + 71) DIV 72) " +
              "THEN shiftleft(1L, CAST(g % 9 AS INT)) ELSE 0L END)")
              .as(s"b$j")): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val sig = wide
          .select(col("doc_id"), posexplode(array(
            (0 until 8).map(j => col(s"b$j")): _*)))
          .select(col("doc_id"), col("pos").cast("long").as("band"),
            col("col").as("v"))
        // the q446 banded-candidate + exact-Hamming machinery
        val ham = sig.select(col("doc_id").as("d1"), col("band"), col("v"))
          .join(sig.select(col("doc_id").as("d2"), col("band"), col("v")),
            Seq("band", "v"))
          .filter(col("d1") < col("d2"))
          .select(col("d1"), col("d2")).distinct()
          .join(sig.selectExpr("doc_id AS d1", "band", "v AS v1"), Seq("d1"))
          .join(sig.selectExpr("doc_id AS d2", "band", "v AS v2"),
            Seq("d2", "band"))
          .groupBy(col("d1"), col("d2"))
          .agg(sum(expr("bit_count(CAST(v1 AS BIGINT) ^ v2)")).cast("long")
            .as("hamming"))
        val perDoc = ham.select(col("d1").as("doc_id"), col("hamming"))
          .unionByName(ham.select(col("d2").as("doc_id"), col("hamming")))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_cand"), min(col("hamming")).as("min_ham"))
        wide
          .withColumn("popcnt", expr(
            (0 until 8).map(j => s"bit_count(b$j)").mkString(
              "CAST(", " + ", " AS BIGINT)")))
          .join(perDoc, Seq("doc_id"), "left")
          .selectExpr(Seq("doc_id") ++ (0 until 8).map(j => s"b$j") ++ Seq(
            "popcnt",
            "coalesce(n_cand, 0L) AS n_cand",
            "coalesce(min_ham, -1L) AS min_hamming"): _*)
      },
      Some("""WITH docs AS (
              |  SELECT doc_id, text, len(text) AS len FROM documents
              |  WHERE len(text) >= 72),
              |cells AS (
              |  SELECT doc_id, (i - 1) * 72 // len AS g,
              |    CAST(ascii(substr(text, CAST(i AS BIGINT), 1)) AS BIGINT)
              |      AS b
              |  FROM docs, (SELECT unnest(range(1, 1024)) AS i) t
              |  WHERE i <= len),
              |bycell AS MATERIALIZED (
              |  SELECT doc_id, g, CAST(sum(b) AS BIGINT) AS cs,
              |    CAST(count(*) AS BIGINT) AS cn
              |  FROM cells GROUP BY 1, 2),
              |sig AS MATERIALIZED (
              |  SELECT doc_id, g // 9 AS band,
              |    CAST(sum(CASE WHEN bit THEN
              |      CAST(1 AS BIGINT) << CAST(gm AS INT) ELSE 0 END)
              |      AS BIGINT) AS v
              |  FROM (
              |    SELECT l.doc_id, l.g, l.g % 9 AS gm,
              |      l.cs * r.cn > r.cs * l.cn AS bit
              |    FROM bycell l JOIN bycell r
              |      ON l.doc_id = r.doc_id AND r.g = l.g + 1
              |    WHERE l.g % 9 < 8)
              |  GROUP BY 1, 2),
              |cand AS (
              |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
              |  FROM sig a JOIN sig b
              |    ON a.band = b.band AND a.v = b.v AND a.doc_id < b.doc_id),
              |ham AS (
              |  SELECT c.d1, c.d2,
              |    CAST(sum(bit_count(xor(s1.v, s2.v))) AS BIGINT) AS hamming
              |  FROM cand c
              |  JOIN sig s1 ON s1.doc_id = c.d1
              |  JOIN sig s2 ON s2.doc_id = c.d2 AND s2.band = s1.band
              |  GROUP BY 1, 2),
              |perdoc AS (
              |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_cand,
              |    CAST(min(hamming) AS BIGINT) AS min_ham
              |  FROM (SELECT d1 AS doc_id, hamming FROM ham
              |        UNION ALL SELECT d2 AS doc_id, hamming FROM ham)
              |  GROUP BY 1),
              |wide AS (
              |  SELECT doc_id,
              |    coalesce(max(CASE WHEN band = 0 THEN v END), 0) AS b0,
              |    coalesce(max(CASE WHEN band = 1 THEN v END), 0) AS b1,
              |    coalesce(max(CASE WHEN band = 2 THEN v END), 0) AS b2,
              |    coalesce(max(CASE WHEN band = 3 THEN v END), 0) AS b3,
              |    coalesce(max(CASE WHEN band = 4 THEN v END), 0) AS b4,
              |    coalesce(max(CASE WHEN band = 5 THEN v END), 0) AS b5,
              |    coalesce(max(CASE WHEN band = 6 THEN v END), 0) AS b6,
              |    coalesce(max(CASE WHEN band = 7 THEN v END), 0) AS b7
              |  FROM sig GROUP BY 1)
              |SELECT w.doc_id, b0, b1, b2, b3, b4, b5, b6, b7,
              |  CAST(bit_count(b0) + bit_count(b1) + bit_count(b2) +
              |    bit_count(b3) + bit_count(b4) + bit_count(b5) +
              |    bit_count(b6) + bit_count(b7) AS BIGINT) AS popcnt,
              |  coalesce(p.n_cand, 0) AS n_cand,
              |  coalesce(p.min_ham, -1) AS min_hamming
              |FROM wide w LEFT JOIN perdoc p ON w.doc_id = p.doc_id"""
        .stripMargin))

  // ---------------------------------------------------------------- q452

  private val wlColors: Q =
    Q("q452_wl_colors",
      (s, d) => {
        val sym = symEdges(s, d)
        val c0 = sym.groupBy(col("v"))
          .agg(count(lit(1)).as("deg"))
          .select(col("v"), col("deg").cast("string").as("c"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // colorₜ₊₁(v) = md5(colorₜ(v) ‖ '|' ‖ sorted neighbor colors):
        // sort_array(collect_list) = a canonical multiset encoding — the
        // oracle's string_agg(... ORDER BY ...) builds the same string
        def refine(c: DataFrame): DataFrame = {
          val nb = sym
            .join(c.select(col("v").as("u"), col("c").as("cu")), Seq("u"))
            .groupBy(col("v"))
            .agg(concat_ws(",", sort_array(collect_list(col("cu"))))
              .as("ns"))
          c.select(col("v"), col("c").as("cv"))
            .join(nb, Seq("v"))
            .select(col("v"), md5(concat(col("cv"), lit("|"), col("ns")))
              .as("c"))
        }
        val c1 = refine(c0)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val c2 = refine(c1)
        c2.groupBy(col("c").as("color"))
          .agg(count(lit(1)).as("n_nodes"), min(col("v")).as("min_item"))
      },
      Some(s"""WITH $symCte,
              |c0 AS MATERIALIZED (
              |  SELECT v, CAST(count(*) AS VARCHAR) AS c
              |  FROM sym GROUP BY 1),
              |c1 AS MATERIALIZED (
              |  SELECT s0.v, md5(c0v.c || '|' ||
              |    string_agg(c0u.c, ',' ORDER BY c0u.c)) AS c
              |  FROM sym s0
              |  JOIN c0 c0u ON c0u.v = s0.u
              |  JOIN c0 c0v ON c0v.v = s0.v
              |  GROUP BY s0.v, c0v.c),
              |c2 AS (
              |  SELECT s1.v, md5(c1v.c || '|' ||
              |    string_agg(c1u.c, ',' ORDER BY c1u.c)) AS c
              |  FROM sym s1
              |  JOIN c1 c1u ON c1u.v = s1.u
              |  JOIN c1 c1v ON c1v.v = s1.v
              |  GROUP BY s1.v, c1v.c)
              |SELECT c AS color, CAST(count(*) AS BIGINT) AS n_nodes,
              |  min(v) AS min_item
              |FROM c2 GROUP BY 1""".stripMargin))

  // ---------------------------------------------------------------- q453

  /** Rounds of synchronous label propagation. */
  private[graft] val LpaRounds = 3

  /** The q453 synchronous-LPA label assignment after [[LpaRounds]] rounds
    * — shared with q456's modularity report. `sym` must be the
    * symmetrized edge list (persisted by the caller). */
  private[graft] def lpaLabels(sym: DataFrame): DataFrame = {
    val labels0 = sym.select(col("v")).distinct()
      .select(col("v"), col("v").as("lbl"))
    def round(labels: DataFrame): DataFrame =
      sym
        .join(labels.select(col("v").as("u"), col("lbl")), Seq("u"))
        .groupBy(col("v"), col("lbl"))
        .agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("v"))
            .orderBy(col("n").desc, col("lbl").asc)))
        .filter(col("rn") === 1)
        .select(col("v"), col("lbl"))
    (1 to LpaRounds).foldLeft(labels0)((l, _) => round(l))
  }

  /** The q453 round-unroll as oracle CTEs (l0 … l`LpaRounds`). */
  private[graft] def lpaCtes: String = {
    val rounds = (1 to LpaRounds).map { t =>
      s"""l$t AS (
         |  SELECT v, lbl FROM (
         |    SELECT s.v, l.lbl, count(*) AS n,
         |      row_number() OVER (PARTITION BY s.v
         |        ORDER BY count(*) DESC, l.lbl ASC) AS rn
         |    FROM sym s JOIN l${t - 1} l ON l.v = s.u
         |    GROUP BY s.v, l.lbl)
         |  WHERE rn = 1)""".stripMargin
    }.mkString(",\n")
    s"l0 AS (SELECT DISTINCT v, v AS lbl FROM sym),\n$rounds"
  }

  private val labelProp: Q =
    Q("q453_label_prop",
      (s, d) => {
        val sym = symEdges(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // each synchronous round: every node adopts the most frequent
        // label among its neighbors, ties to the smallest label — a
        // per-node partitioned argmax window (never global)
        lpaLabels(sym).groupBy(col("lbl").as("community"))
          .agg(count(lit(1)).as("n_members"), min(col("v")).as("min_item"))
      },
      Some(
        s"""WITH $symCte,
           |$lpaCtes
           |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS n_members,
           |  min(v) AS min_item
           |FROM l$LpaRounds GROUP BY 1""".stripMargin))
}
