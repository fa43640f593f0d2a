package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Density-based clustering (DBSCAN) over a 2-D embedding slice, composed
  * entirely from operators the engine already has — the grid-cell
  * ε-neighborhood join (q201) for the neighbor graph and big-star
  * contraction (Dedup.ccBigStar) for the core-graph components — so every
  * stage inherits their scale shapes: candidate generation is an EQUI join
  * on cell ids (never a quadratic theta join), degree counting and border
  * assignment are partial-aggregable groupBys, and the only iteration is
  * the O(log n)-round star contraction.
  *
  * Determinism contract (DBSCAN's classic order-dependence, pinned):
  *  - core = strictly more than `minPts` neighbors within ε EXCLUDING the
  *    point itself (documented, counted once);
  *  - cluster id = MIN core vec_id of the component (label = min, as all
  *    the engine's CC operators);
  *  - border points (non-core with ≥1 core neighbor) join the MINIMUM
  *    cluster id among their core neighbors — the standard "first come"
  *    assignment made order-invariant;
  *  - everything else is noise (role 'noise', NULL cluster).
  */
object Density {

  /** Directed ε-neighborhood edges (u → v, u ≠ v, d² ≤ ε²) via 3×3 grid
    * cells: each true neighbor pair meets in exactly one cell — the
    * neighbor's own cell — so no distinct-dedup shuffle is needed. */
  def epsEdges2D(pts: DataFrame, eps: Double): DataFrame = {
    val own = pts
      .withColumn("cx", floor(col("x") / eps).cast("long"))
      .withColumn("cy", floor(col("y") / eps).cast("long"))
    val nine = own
      .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
      .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
      .select(col("vec_id").as("v"), col("x").as("x2"), col("y").as("y2"),
        (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
    val d2 = (col("x") - col("x2")) * (col("x") - col("x2")) +
      (col("y") - col("y2")) * (col("y") - col("y2"))
    own.join(nine, Seq("cx", "cy"))
      .filter(col("vec_id") =!= col("v"))
      .filter(d2 <= eps * eps)
      .select(col("vec_id").as("u"), col("v"))
  }

  /** DBSCAN. `pts` must carry (vec_id, x, y). Output:
    * (vec_id, role ∈ {core,border,noise}, cluster_id nullable). */
  def dbscan(pts: DataFrame, eps: Double, minPts: Long): DataFrame = {
    val edges = epsEdges2D(pts, eps).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK) // read 3× below
    val coreIds = edges.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= minPts)
      .select(col("u").as("vec_id"))
    val coreEdges = edges
      .join(coreIds.withColumnRenamed("vec_id", "u"), Seq("u"), "left_semi")
      .join(coreIds.withColumnRenamed("vec_id", "v"), Seq("v"), "left_semi")
      .select(col("u").as("d1"), col("v").as("d2"))
    val clusters = Dedup.ccBigStar(
      coreIds.withColumnRenamed("vec_id", "doc_id"), coreEdges)
      .select(col("doc_id").as("vec_id"), col("cluster_id"))
    val border = edges
      .join(coreIds.withColumnRenamed("vec_id", "u"), Seq("u"), "left_anti")
      .join(clusters.withColumnRenamed("vec_id", "v")
        .withColumnRenamed("cluster_id", "c"), Seq("v"))
      .groupBy(col("u"))
      .agg(min(col("c")).as("cluster_id"))
      .select(col("u").as("vec_id"), col("cluster_id"))
    pts.select(col("vec_id"))
      .join(clusters.withColumnRenamed("cluster_id", "core_c"),
        Seq("vec_id"), "left")
      .join(border.withColumnRenamed("cluster_id", "border_c"),
        Seq("vec_id"), "left")
      .select(col("vec_id"),
        when(col("core_c").isNotNull, "core")
          .when(col("border_c").isNotNull, "border")
          .otherwise("noise").as("role"),
        coalesce(col("core_c"), col("border_c")).as("cluster_id"))
  }

  /** DuckDB mirror of [[dbscan]] — quadratic theta join for the neighbor
    * graph, recursive-CTE reachability for the components (the q89
    * pattern), identical min-label and border rules. */
  def dbscanSql(eps: Double, minPts: Long): String = {
    val eps2 = eps * eps
    s"""WITH RECURSIVE p AS (
       |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
       |    CAST(embedding[2] AS DOUBLE) AS y
       |  FROM embeddings),
       |e AS (
       |  SELECT a.vec_id AS u, b.vec_id AS v
       |  FROM p a JOIN p b ON a.vec_id <> b.vec_id
       |    AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= $eps2),
       |core AS (
       |  SELECT u AS vec_id FROM e GROUP BY 1 HAVING count(*) >= $minPts),
       |ce AS (
       |  SELECT u, v FROM e
       |  WHERE u IN (SELECT vec_id FROM core)
       |    AND v IN (SELECT vec_id FROM core)),
       |reach AS (
       |  SELECT vec_id AS id, vec_id AS r FROM core
       |  UNION
       |  SELECT reach.id, ce.v FROM reach JOIN ce ON ce.u = reach.r),
       |cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY 1),
       |border AS (
       |  SELECT e.u AS vec_id, min(cl.cluster_id) AS cluster_id
       |  FROM e JOIN cl ON e.v = cl.id
       |  WHERE e.u NOT IN (SELECT vec_id FROM core)
       |  GROUP BY 1)
       |SELECT p.vec_id,
       |  CASE WHEN c.id IS NOT NULL THEN 'core'
       |       WHEN b.vec_id IS NOT NULL THEN 'border'
       |       ELSE 'noise' END AS role,
       |  coalesce(c.cluster_id, b.cluster_id) AS cluster_id
       |FROM p
       |LEFT JOIN cl c ON p.vec_id = c.id
       |LEFT JOIN border b ON p.vec_id = b.vec_id""".stripMargin
  }
}
