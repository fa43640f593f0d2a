package graft

import org.apache.spark.sql.functions._
import graft.ext.Curation
import graft.ExtEntries.Q

/** Round-6 batch 13: 2-D epsilon spatial join and privacy-enforcing
  * export.
  */
object Entries21 {

  val all: Seq[Q] = Seq(

    // 2-D ε-neighborhood self-join via GRID CELLS (ε = 0.0625, binary-exact):
    // left points carry their own cell, right points replicate to the 3×3
    // neighborhood, candidates meet on a cell equi join (each true pair
    // exactly once — the neighbor cell of one side IS the own cell of the
    // other), exact d² ≤ ε² verifies. The spatial sibling of the 1-D
    // binned joins (q115/q189); oracle = the quadratic theta join.
    Q("q201_epsilon_join_2d",
      (s, d) => {
        val pts = Tables.embeddings(s, d).select(col("vec_id"),
          expr("CAST(embedding[0] AS DOUBLE)").as("x"),
          expr("CAST(embedding[1] AS DOUBLE)").as("y"))
        val eps = 0.0625
        val own = pts
          .withColumn("cx", floor(col("x") / eps).cast("long"))
          .withColumn("cy", floor(col("y") / eps).cast("long"))
        val nine = own
          .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
          .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
          .select(col("vec_id").as("v2"), col("x").as("x2"),
            col("y").as("y2"), (col("cx") + col("dx")).as("cx"),
            (col("cy") + col("dy")).as("cy"))
        val d2 = (col("x") - col("x2")) * (col("x") - col("x2")) +
          (col("y") - col("y2")) * (col("y") - col("y2"))
        own.join(nine, Seq("cx", "cy"))
          .filter(col("vec_id") < col("v2"))
          .filter(d2 <= eps * eps)
          .select(col("vec_id").as("v1"), col("v2"), d2.as("d2"))
      },
      Some("""WITH p AS (
             |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
             |    CAST(embedding[2] AS DOUBLE) AS y
             |  FROM embeddings)
             |SELECT a.vec_id AS v1, b.vec_id AS v2,
             |  (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS d2
             |FROM p a JOIN p b ON a.vec_id < b.vec_id
             |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
             |  <= 0.00390625""".stripMargin)),

    // k-anonymity SUPPRESSION export (k=5): the audit's verdict applied
    // row-level — small-cell records leave with all three
    // quasi-identifiers nulled, the rest keep the generalized band.
    Q("q202_kanon_suppress",
      (s, d) => Curation.kAnonymitySuppress(Tables.customer(s, d), 5L),
      Some(Curation.kAnonymitySuppressSql(5L))))
}
