package graft

import org.apache.spark.sql.functions._
import graft.ExtEntries.Q

/** Round-7 batch 3: rendezvous-hash shard assignment with rebalance diff,
  * and grid-based DBSCAN.
  */
object Entries24 {

  /** Rendezvous (highest-random-weight) shard of a doc over `n` shards,
    * as ONE partial-aggregable max: the candidate score packs the
    * tie-break into the value — 48-bit md5 score · 16 + shard (< 2⁵³) —
    * so `max(...) % 16` IS the argmax shard with a strict total order.
    * No window, no per-doc sort; map-side combine does the work. */
  private def rendezvousShard(n: Int) = {
    val score = (i: Int) =>
      conv(substring(md5(concat(col("doc_id").cast("string"), lit("|"),
        lit(i.toString))), 1, 12), 16, 10).cast("long") * 16 + i
    greatest((0 until n).map(score): _*) % 16
  }

  val all: Seq[Q] = Seq(

    // RENDEZVOUS-HASH SHARD MAP + REBALANCE DIFF: assign every document a
    // shard under 8 and under 9 shards, count both layouts per shard plus
    // ARRIVALS (docs that changed shard). Highest-random-weight hashing
    // guarantees minimal movement — every moved doc lands on the NEW
    // shard — so arrivals is 0 for shards 0–7 and the whole diff for
    // shard 8, a property the oracle-checked output shows directly. The
    // partitioning-design operator for a 100 TB store: resharding cost is
    // |moved| ≈ n/9, not a full rewrite. The per-doc argmax needs no
    // shuffle at all (greatest() over 8 scored expressions is a pure
    // projection); only the |shards|-sized counts aggregate.
    Q("q217_rendezvous_shards",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"))
        // persisted (plan census r9): the two shard histograms and the
        // mover census all re-evaluate the 16-way rendezvous hash
        val both = docs
          .withColumn("s8", rendezvousShard(8))
          .withColumn("s9", rendezvousShard(9))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val c8 = both.groupBy(col("s8").as("shard"))
          .agg(count(lit(1)).as("n_8"))
        val c9 = both.groupBy(col("s9").as("shard"))
          .agg(count(lit(1)).as("n_9"))
        val mv = both.filter(col("s8") =!= col("s9"))
          .groupBy(col("s9").as("shard"))
          .agg(count(lit(1)).as("arrivals"))
        c9.join(c8, Seq("shard"), "full_outer")
          .join(mv, Seq("shard"), "full_outer")
          .select(col("shard"), coalesce(col("n_8"), lit(0L)).as("n_8"),
            coalesce(col("n_9"), lit(0L)).as("n_9"),
            coalesce(col("arrivals"), lit(0L)).as("arrivals"))
      },
      Some("""WITH sc AS (
             |  SELECT doc_id,
             |    CAST(max(CASE WHEN sh.s < 8 THEN
             |      ('0x' || substr(md5(doc_id::VARCHAR || '|' || sh.s::VARCHAR), 1, 12))::BIGINT * 16 + sh.s
             |      END) % 16 AS BIGINT) AS s8,
             |    CAST(max(('0x' || substr(md5(doc_id::VARCHAR || '|' || sh.s::VARCHAR), 1, 12))::BIGINT * 16 + sh.s)
             |      % 16 AS BIGINT) AS s9
             |  FROM documents, (SELECT unnest(range(0, 9)) AS s) sh
             |  GROUP BY doc_id),
             |c8 AS (SELECT s8 AS shard, count(*) AS n_8 FROM sc GROUP BY 1),
             |c9 AS (SELECT s9 AS shard, count(*) AS n_9 FROM sc GROUP BY 1),
             |mv AS (SELECT s9 AS shard, count(*) AS arrivals FROM sc
             |  WHERE s8 <> s9 GROUP BY 1)
             |SELECT coalesce(c9.shard, c8.shard) AS shard,
             |  coalesce(n_8, 0) AS n_8, coalesce(n_9, 0) AS n_9,
             |  coalesce(arrivals, 0) AS arrivals
             |FROM c9
             |FULL JOIN c8 ON c9.shard = c8.shard
             |FULL JOIN mv ON coalesce(c9.shard, c8.shard) = mv.shard""".stripMargin)),

    // DBSCAN over the 2-D embedding slice (ε = 0.03125, minPts = 5):
    // density clustering composed from the grid-cell ε-join (q201) and
    // star-contraction CC (q89) — roles core/border/noise plus min-label
    // cluster ids, order-invariant by construction (ext/Density.scala).
    // Oracle: quadratic neighbor graph + recursive-CTE reachability.
    Q("q218_dbscan",
      (s, d) => graft.ext.Density.dbscan(
        // persisted (plan census r9): the grid self-join reads the
        // points twice and the final role labeling a third time
        Tables.embeddings(s, d).select(col("vec_id"),
          expr("CAST(embedding[0] AS DOUBLE)").as("x"),
          expr("CAST(embedding[1] AS DOUBLE)").as("y"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
        0.03125, 5L),
      Some(graft.ext.Density.dbscanSql(0.03125, 5L))))
}
