package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
import graft.ExtEntries.Q

/** Round-13 batch 8 — rank aggregation, rank-agreement measurement, and
  * Katz centrality (integer arithmetic only, exact DuckDB oracle
  * mirrors):
  *
  *  - q490 BORDA COUNT rank aggregation (Borda 1781; Dwork, Kumar, Naor
  *    & Sivakumar, WWW 2001 for the web-ranking revival): three
  *    deterministic document rankers (length, type richness, content-
  *    hash baseline) fused by Borda score Σ(N − rank). Every ranker is
  *    an ops/Ranks DISTRIBUTED global rank (bucket offsets + partitioned
  *    windows — no fact-sized unpartitioned window, the T3/q461
  *    discipline); the only corpus-wide window is the top-20 readout.
  *
  *  - q491 KENDALL TAU rank agreement (Kendall, Biometrika 1938) between
  *    each ranker and its peers over the Borda top-50: concordant/
  *    discordant pair counts as exact integers, tau numerator C − D
  *    SIGNED as an integer column beside n_pairs (the q456 integer-
  *    numerator discipline — a signed quantity never meets cross-engine
  *    integer division). The O(k²) pair enumeration runs on the
  *    top-k subset ONLY — rank agreement at 100 TB is always measured
  *    on the head, not the corpus.
  *
  *  - q492 KATZ CENTRALITY (Katz, Psychometrika 1953): 3 unrolled rounds
  *    of k' = β + Σ_in ⌊k/8⌋ with β = 10⁶ and the attenuation α = 1/8
  *    EXACT as integer division per in-edge (dyadic α keeps the replay
  *    bit-identical; the per-term floor is the documented grid). The
  *    additive, degree-unnormalized propagation distinguishes it from
  *    PageRank (q107), HITS (q466) and PPR (q489) — word-TYPE-domain
  *    state on the co-occurrence graph, one shuffle per round.
  *
  * Reference anchor: no ranking/graph surface in the 775-LoC pandas
  * reference (SURVEY.md §0); these extend the retrieval-eval and graph
  * families of the 100 TB charter.
  */
object Entries92 {

  def all: Seq[Q] = Seq(bordaFusion, kendallTau, katz)

  private def md5Long(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 12), 16, 10).cast("long")

  // ---------------------------------------------------------------- q490

  /** The three-ranker Borda relation (doc_id, r1, r2, r3, borda) —
    * shared verbatim by q491's agreement measurement. */
  private[graft] def bordaTable(s: org.apache.spark.sql.SparkSession,
                                d: String): DataFrame = {
    val feat = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_types"),
        md5Long(col("text")).as("h"))
    def ranked(bucket: org.apache.spark.sql.Column,
               order: Seq[org.apache.spark.sql.Column],
               name: String): DataFrame =
      graft.ops.Ranks.withGlobalRank(feat, bucket, order, name, "n_all")
        .select(col("doc_id").as(s"${name}_doc"), col(name),
          col("n_all"))
    val r1 = ranked(-(col("n_chars").cast("long")) ,
      Seq(col("n_chars").desc, col("doc_id").asc), "r1")
    val r2 = ranked(-col("n_types"),
      Seq(col("n_types").desc, col("doc_id").asc), "r2")
      .drop("n_all")
    val r3 = ranked(expr("h DIV 68719476736"),
      Seq(col("h").asc, col("doc_id").asc), "r3")
      .drop("n_all")
    r1.join(r2, col("r1_doc") === col("r2_doc"))
      .join(r3, col("r1_doc") === col("r3_doc"))
      .select(col("r1_doc").as("doc_id"), col("r1"), col("r2"),
        col("r3"),
        (lit(3) * col("n_all") - col("r1") - col("r2") - col("r3"))
          .cast("long").as("borda"))
  }

  /** q490/q491 shared oracle prefix: the three rankers and the Borda
    * aggregate as DuckDB CTEs. */
  private[graft] val bordaCtes: String =
    """WITH feat AS (
      |  SELECT doc_id, n_chars,
      |    len(list_distinct(string_split(text, ' '))) AS n_types,
      |    ('0x' || substr(md5(text), 1, 12))::BIGINT AS h
      |  FROM documents),
      |r1 AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY n_chars DESC, doc_id) AS r FROM feat),
      |r2 AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY n_types DESC, doc_id) AS r FROM feat),
      |r3 AS (SELECT doc_id, row_number() OVER (
      |         ORDER BY h, doc_id) AS r FROM feat),
      |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM feat),
      |agg AS (
      |  SELECT r1.doc_id AS doc_id, r1.r AS r1, r2.r AS r2, r3.r AS r3,
      |    CAST(3 * nn.n - r1.r - r2.r - r3.r AS BIGINT) AS borda
      |  FROM r1 JOIN r2 ON r2.doc_id = r1.doc_id
      |  JOIN r3 ON r3.doc_id = r1.doc_id CROSS JOIN nn)""".stripMargin

  private val bordaFusion: Q =
    Q("q490_borda_fusion",
      (s, d) => {
        val agg = bordaTable(s, d)
        val rw = Window.orderBy(col("borda").desc, col("doc_id"))
        agg.withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 20)
          .select(col("doc_id"), col("r1"), col("r2"), col("r3"),
            col("borda"), col("rank").cast("int").as("rank"))
      },
      Some(bordaCtes +
        """
          |SELECT doc_id, CAST(r1 AS BIGINT) AS r1,
          |  CAST(r2 AS BIGINT) AS r2, CAST(r3 AS BIGINT) AS r3, borda,
          |  CAST(rank AS INT) AS rank FROM (
          |  SELECT *, row_number() OVER (ORDER BY borda DESC, doc_id)
          |    AS rank FROM agg)
          |WHERE rank <= 20""".stripMargin))

  // ---------------------------------------------------------------- q491

  private val kendallTau: Q =
    Q("q491_kendall_tau",
      (s, d) => {
        val rw = Window.orderBy(col("borda").desc, col("doc_id"))
        val top = bordaTable(s, d)
          .withColumn("brank", row_number().over(rw))
          .filter(col("brank") <= 50)
          .persist(StorageLevel.MEMORY_AND_DISK) // both pair sides
        val a = top.select(col("doc_id").as("da"), col("r1").as("a1"),
          col("r2").as("a2"), col("r3").as("a3"))
        val b = top.select(col("doc_id").as("db"), col("r1").as("b1"),
          col("r2").as("b2"), col("r3").as("b3"))
        val pairs = a.join(b, col("da") < col("db"))
        def agree(x: String): org.apache.spark.sql.Column =
          expr(s"CASE WHEN (a$x < b$x) = (a${(x.toInt % 3) + 1}" +
            s" < b${(x.toInt % 3) + 1}) THEN 1L ELSE 0L END")
        // ranker pairs (1,2), (2,3), (3,1) via the x -> x%3+1 cycle
        val rows = Seq("1", "2", "3").map { x =>
          val y = ((x.toInt % 3) + 1).toString
          pairs.agg(
            count(lit(1)).as("n_pairs"),
            sum(agree(x)).cast("long").as("concordant"))
            .select(lit(s"r$x~r$y").as("ranker_pair"), col("n_pairs"),
              col("concordant"),
              (col("n_pairs") - col("concordant")).as("discordant"),
              (lit(2) * col("concordant") - col("n_pairs")).cast("long")
                .as("tau_num"))
        }
        rows.reduce(_ unionByName _)
      },
      Some(bordaCtes +
        """,
          |top AS (
          |  SELECT doc_id, r1, r2, r3 FROM (
          |    SELECT *, row_number() OVER (ORDER BY borda DESC, doc_id)
          |      AS brank FROM agg)
          |  WHERE brank <= 50),
          |pr AS (
          |  SELECT a.r1 AS a1, a.r2 AS a2, a.r3 AS a3,
          |    b.r1 AS b1, b.r2 AS b2, b.r3 AS b3
          |  FROM top a JOIN top b ON a.doc_id < b.doc_id),
          |k AS (
          |  SELECT 'r1~r2' AS ranker_pair,
          |    CAST(count(*) AS BIGINT) AS n_pairs,
          |    CAST(sum(CASE WHEN (a1 < b1) = (a2 < b2) THEN 1 ELSE 0
          |      END) AS BIGINT) AS concordant FROM pr
          |  UNION ALL
          |  SELECT 'r2~r3', CAST(count(*) AS BIGINT),
          |    CAST(sum(CASE WHEN (a2 < b2) = (a3 < b3) THEN 1 ELSE 0
          |      END) AS BIGINT) FROM pr
          |  UNION ALL
          |  SELECT 'r3~r1', CAST(count(*) AS BIGINT),
          |    CAST(sum(CASE WHEN (a3 < b3) = (a1 < b1) THEN 1 ELSE 0
          |      END) AS BIGINT) FROM pr)
          |SELECT ranker_pair, n_pairs, concordant,
          |  n_pairs - concordant AS discordant,
          |  2 * concordant - n_pairs AS tau_num
          |FROM k""".stripMargin))

  // ---------------------------------------------------------------- q492

  private val katz: Q =
    Q("q492_katz_centrality",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        val wd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val e0 = toks
          .withColumn("w2", lead(col("w"), 1).over(wd))
          .filter(col("w2").isNotNull && col("w") =!= col("w2"))
          .select(md5Long(col("w")).as("src"),
            md5Long(col("w2")).as("dst"))
          .distinct()
        val e = e0
          .union(e0.select(col("dst").as("src"), col("src").as("dst")))
          // Spark union = UNION ALL; the oracle's UNION dedups, and the
          // word graph holds both directions of many pairs — dedup or
          // every in-sum double-counts
          .distinct()
          .select(col("src").as("es"), col("dst").as("ed"))
          .persist(StorageLevel.MEMORY_AND_DISK) // 3 rounds + node set
        val nodes = e.select(col("es").as("node")).distinct()
        def round(k: DataFrame): DataFrame = {
          val kk = k.select(col("node").as("kn"), col("katz").as("km"))
          val in = e.join(kk, col("es") === col("kn"))
            .groupBy(col("ed").as("node"))
            .agg(sum(expr("km DIV 8")).as("im"))
          nodes.join(in, Seq("node"), "left_outer")
            .select(col("node"),
              (lit(1000000L) + coalesce(col("im"), lit(0L)))
                .cast("long").as("katz"))
        }
        val k0 = nodes.select(col("node"), lit(1000000L).as("katz"))
        val k3 = round(round(round(k0)))
        val wid = toks.select(col("w")).distinct()
          .select(col("w"), md5Long(col("w")).as("wn"))
        val rw = Window.orderBy(col("katz").desc, col("word").asc)
        k3.join(wid, col("node") === col("wn"))
          .select(col("w").as("word"), col("katz"))
          .withColumn("rank", row_number().over(rw))
          .filter(col("rank") <= 20)
          .select(col("word"), col("katz"),
            col("rank").cast("int").as("rank"))
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, i AS pos, w[i] AS w1, w[i + 1] AS w2
             |  FROM (SELECT doc_id, string_split(text, ' ') AS w
             |        FROM documents) d,
             |       (SELECT unnest(range(1, 1000)) AS i) t
             |  WHERE i < len(w)),
             |e0 AS (
             |  SELECT DISTINCT
             |    ('0x' || substr(md5(w1), 1, 12))::BIGINT AS src,
             |    ('0x' || substr(md5(w2), 1, 12))::BIGINT AS dst
             |  FROM tok WHERE w1 <> w2),
             |e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
             |n AS (SELECT DISTINCT src AS node FROM e),
             |k0 AS (SELECT node, CAST(1000000 AS BIGINT) AS katz FROM n),
             |k1 AS (SELECT n.node AS node,
             |         CAST(1000000 + coalesce(i.im, 0) AS BIGINT) AS katz
             |       FROM n LEFT JOIN (
             |         SELECT e.dst AS node,
             |           CAST(sum(k.katz // 8) AS BIGINT) AS im
             |         FROM e JOIN k0 k ON k.node = e.src
             |         GROUP BY e.dst) i ON i.node = n.node),
             |k2 AS (SELECT n.node AS node,
             |         CAST(1000000 + coalesce(i.im, 0) AS BIGINT) AS katz
             |       FROM n LEFT JOIN (
             |         SELECT e.dst AS node,
             |           CAST(sum(k.katz // 8) AS BIGINT) AS im
             |         FROM e JOIN k1 k ON k.node = e.src
             |         GROUP BY e.dst) i ON i.node = n.node),
             |k3 AS (SELECT n.node AS node,
             |         CAST(1000000 + coalesce(i.im, 0) AS BIGINT) AS katz
             |       FROM n LEFT JOIN (
             |         SELECT e.dst AS node,
             |           CAST(sum(k.katz // 8) AS BIGINT) AS im
             |         FROM e JOIN k2 k ON k.node = e.src
             |         GROUP BY e.dst) i ON i.node = n.node),
             |wid AS (
             |  SELECT DISTINCT w AS word,
             |    ('0x' || substr(md5(w), 1, 12))::BIGINT AS node
             |  FROM (SELECT unnest(string_split(text, ' ')) AS w
             |        FROM documents))
             |SELECT word, katz, CAST(rank AS INT) AS rank FROM (
             |  SELECT wid.word AS word, k3.katz AS katz,
             |    row_number() OVER (ORDER BY k3.katz DESC, wid.word)
             |      AS rank
             |  FROM k3 JOIN wid ON wid.node = k3.node)
             |WHERE rank <= 20""".stripMargin))
}
