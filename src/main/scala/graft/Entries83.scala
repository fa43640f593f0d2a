package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-12 continuation batch 11 — local graph structure and dedup
  * survivorship:
  *
  *  - q462 LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998): per-node
  *    triangle density cc = 2·tri/(deg·(deg−1)) in exact ppm on the
  *    co-engagement graph — triangles enumerated once from the ordered
  *    edge list (a<b<c, the q114 shape: each triangle counted exactly
  *    once), never per-node neighborhood materialization.
  *  - q463 K-TRUSS PEELING (Cohen 2008, k=3): iteratively drop edges
  *    supported by no triangle — 3 synchronous peels (a bounded driver
  *    loop over distributed joins, the q130 k-core discipline), output =
  *    surviving edges with their final support. The truss is the
  *    community-core primitive one level finer than k-core.
  *  - q464 DEDUP SURVIVORSHIP (the "canonical selection" step every
  *    dedup pipeline ends with; cf. the q178 entity golden record): for
  *    each q48 near-dup cluster, keep the longest document (ties to the
  *    smallest doc_id), and emit keep/canonical columns for every doc —
  *    the keep-list a 100 TB curation job feeds downstream.
  *
  * All three replay exactly in DuckDB (the q48 recursive-CTE closure for
  * clusters; per-round CTE unrolls for the peels).
  */
object Entries83 {

  def all: Seq[Q] = Seq(clusteringCoeff, ktruss, clusterCanon)

  /** Peel rounds for q463. */
  private val TrussPeels = 3

  private def persistDF(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Ordered (a < b) co-engagement edges, persisted. */
  private def orderedEdges(s: org.apache.spark.sql.SparkSession,
                           d: String): DataFrame =
    persistDF(graft.ext.Curation
      .coengagementPairs(Tables.events(s, d), 10, 2L)
      .select(col("i1").as("a"), col("i2").as("b")))

  /** Triangles (a<b<c) of an ordered edge list. */
  private def triangles(e: DataFrame): DataFrame =
    e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"), col("e3.a") === col("e1.a") &&
        col("e3.b") === col("e2.b"))
      .select(col("e1.a").as("a"), col("e1.b").as("b"),
        col("e2.b").as("c"))

  /** Per-edge triangle support of an ordered edge list. */
  private def support(e: DataFrame): DataFrame = {
    val tri = triangles(e)
    tri.select(col("a"), col("b"))
      .unionByName(tri.select(col("b").as("a"), col("c").as("b")))
      .unionByName(tri.select(col("a"), col("c").as("b")))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("support"))
  }

  // ---------------------------------------------------------------- q462

  private val clusteringCoeff: Q =
    Q("q462_clustering_coeff",
      (s, d) => {
        val e = orderedEdges(s, d)
        val tri = triangles(e)
        val perNode = tri.select(col("a").as("v"))
          .unionByName(tri.select(col("b").as("v")))
          .unionByName(tri.select(col("c").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("tri"))
        val deg = e.select(col("a").as("v"))
          .unionByName(e.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("deg"))
        deg.join(perNode, Seq("v"), "left")
          .selectExpr("v", "deg", "coalesce(tri, 0L) AS tri",
            "CASE WHEN deg >= 2 THEN coalesce(tri, 0L) * 2000000 DIV " +
              "(deg * (deg - 1)) ELSE 0L END AS cc_ppm")
      },
      Some(s"""WITH ${Entries79.symCte},
              |e AS (SELECT i1 AS a, i2 AS b FROM edges),
              |tri AS (
              |  SELECT e1.a, e1.b, e2.b AS c
              |  FROM e e1 JOIN e e2 ON e2.a = e1.b
              |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
              |pernode AS (
              |  SELECT v, CAST(count(*) AS BIGINT) AS tri FROM (
              |    SELECT a AS v FROM tri
              |    UNION ALL SELECT b FROM tri
              |    UNION ALL SELECT c FROM tri)
              |  GROUP BY 1),
              |deg AS (
              |  SELECT v, CAST(count(*) AS BIGINT) AS deg
              |  FROM sym GROUP BY 1)
              |SELECT d.v, d.deg, coalesce(p.tri, 0) AS tri,
              |  CAST(CASE WHEN d.deg >= 2 THEN coalesce(p.tri, 0) *
              |    2000000 // (d.deg * (d.deg - 1)) ELSE 0 END AS BIGINT)
              |    AS cc_ppm
              |FROM deg d LEFT JOIN pernode p ON p.v = d.v"""
        .stripMargin))

  // ---------------------------------------------------------------- q463

  private val ktruss: Q =
    Q("q463_ktruss",
      (s, d) => {
        val e0 = orderedEdges(s, d)
        // each peel CHECKPOINTS: the triangle join references the edge
        // set 3× and the support union another 3× — with plain persist
        // the LOGICAL plan still embeds ~9 copies of the previous
        // round's tree per round (9³ by round 3 — an OOM in plan
        // stringification, hit in development), while an eager
        // localCheckpoint truncates lineage to an RDD scan per round
        val eFinal = (1 to TrussPeels).foldLeft(e0) { (e, _) =>
          graft.Explain.localCheckpointWithProvenance(
            e.join(support(e), Seq("a", "b"))
              .filter(col("support") >= 1)
              .select(col("a"), col("b")))
        }
        eFinal.join(support(eFinal), Seq("a", "b"), "left")
          .selectExpr("a", "b", "coalesce(support, 0L) AS support")
      },
      Some {
        val rounds = (1 to TrussPeels).map { t =>
          s"""tri$t AS (
             |  SELECT e1.a, e1.b, e2.b AS c
             |  FROM e${t - 1} e1 JOIN e${t - 1} e2 ON e2.a = e1.b
             |  JOIN e${t - 1} e3 ON e3.a = e1.a AND e3.b = e2.b),
             |sup$t AS (
             |  SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
             |    SELECT a, b FROM tri$t
             |    UNION ALL SELECT b AS a, c AS b FROM tri$t
             |    UNION ALL SELECT a, c AS b FROM tri$t)
             |  GROUP BY 1, 2),
             |e$t AS (
             |  SELECT e.a, e.b FROM e${t - 1} e
             |  JOIN sup$t s ON s.a = e.a AND s.b = e.b
             |  WHERE s.support >= 1)""".stripMargin
        }.mkString(",\n")
        s"""WITH ${Entries79.symCte},
           |e0 AS (SELECT i1 AS a, i2 AS b FROM edges),
           |$rounds,
           |trif AS (
           |  SELECT e1.a, e1.b, e2.b AS c
           |  FROM e$TrussPeels e1 JOIN e$TrussPeels e2 ON e2.a = e1.b
           |  JOIN e$TrussPeels e3 ON e3.a = e1.a AND e3.b = e2.b),
           |supf AS (
           |  SELECT a, b, CAST(count(*) AS BIGINT) AS support FROM (
           |    SELECT a, b FROM trif
           |    UNION ALL SELECT b AS a, c AS b FROM trif
           |    UNION ALL SELECT a, c AS b FROM trif)
           |  GROUP BY 1, 2)
           |SELECT e.a, e.b, coalesce(s.support, 0) AS support
           |FROM e$TrussPeels e
           |LEFT JOIN supf s ON s.a = e.a AND s.b = e.b""".stripMargin
      })

  // ---------------------------------------------------------------- q464

  private val clusterCanon: Q =
    Q("q464_cluster_canon",
      (s, d) => {
        import graft.ext.Dedup
        val docs = persistDF(Tables.documents(s, d)
          .select(col("doc_id"), col("n_chars"), col("text")))
        val clusters = persistDF(Dedup.nearDupClusters(docs,
          Dedup.ngramJaccardPairs(docs, 3, 0.5)))
        val sized = persistDF(clusters
          .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
          .withColumn("rn", row_number().over(
            Window.partitionBy(col("cluster_id"))
              .orderBy(col("n_chars").desc, col("doc_id").asc))))
        val canon = sized.filter(col("rn") === 1)
          .select(col("cluster_id"), col("doc_id").as("canon_id"))
        sized.join(canon, Seq("cluster_id"))
          .join(sized.groupBy(col("cluster_id"))
            .agg(count(lit(1)).as("cluster_size")), Seq("cluster_id"))
          .selectExpr("doc_id", "cluster_id", "n_chars", "cluster_size",
            "canon_id",
            "CAST(CASE WHEN doc_id = canon_id THEN 1 ELSE 0 END AS BIGINT)" +
              " AS keep")
      },
      Some(s"""WITH RECURSIVE ${ExtEntries.shinglesCte},
              |${ExtEntries.shingleIdCte}, ${ExtEntries.shingleCountCte},
              |${ExtEntries.shingleInterCte},
              |pairs AS (
              |  SELECT d1, d2 FROM shint
              |  JOIN shcnt ca ON d1 = ca.doc_id
              |  JOIN shcnt cb ON d2 = cb.doc_id
              |  WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.5),
              |ee AS (SELECT d1 AS a, d2 AS b FROM pairs
              |       UNION ALL SELECT d2, d1 FROM pairs),
              |reach(doc_id, r) AS (
              |  SELECT doc_id, doc_id FROM documents
              |  UNION
              |  SELECT reach.doc_id, e.b FROM reach JOIN ee e
              |    ON e.a = reach.r),
              |clusters AS (
              |  SELECT doc_id, min(r) AS cluster_id FROM reach
              |  GROUP BY doc_id),
              |sized AS (
              |  SELECT c.doc_id, c.cluster_id, d.n_chars,
              |    row_number() OVER (PARTITION BY c.cluster_id
              |      ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn
              |  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id),
              |canon AS (
              |  SELECT cluster_id, doc_id AS canon_id FROM sized
              |  WHERE rn = 1),
              |csize AS (
              |  SELECT cluster_id, CAST(count(*) AS BIGINT)
              |    AS cluster_size
              |  FROM sized GROUP BY 1)
              |SELECT s.doc_id, s.cluster_id, s.n_chars, z.cluster_size,
              |  k.canon_id,
              |  CAST(CASE WHEN s.doc_id = k.canon_id THEN 1 ELSE 0 END
              |    AS BIGINT) AS keep
              |FROM sized s
              |JOIN canon k ON k.cluster_id = s.cluster_id
              |JOIN csize z ON z.cluster_id = s.cluster_id"""
        .stripMargin))
}
