package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view upkeep shape
  * for 100 TB gold tables: keep per-key aggregate STATES, and on new data
  * aggregate only the delta and merge states, never rescanning the base.
  *
  * Works for any algebraic aggregate (sum/count/min/max here; avg = sum
  * pair; variance = sufficient-statistic sums, see q41). The merge is a
  * union of two state tables + one re-aggregation — at scale the base
  * states are orders of magnitude smaller than the base fact table, and
  * the delta is small by definition, so upkeep cost is O(delta), not
  * O(base). The same state schema is what a Structured Streaming
  * foreachBatch upsert maintains (StreamingFeatures.streamOnlineMaterialize).
  */
object Incremental {

  /** Per-user aggregate state over an events slice: additive counters plus
    * a max — every field mergeable by sum/max. */
  def userAggState(events: DataFrame): DataFrame =
    events
      .withColumn("vc", round(coalesce(col("value"), lit(0.0)) * 100).cast("long"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("vc")).as("spend_cents"),
        max(col("ts_us")).as("last_ts_us"))

  /** Merge two state tables: keys present in either side survive; counters
    * add, maxes max. Associative and commutative, so states can be merged
    * in any tree shape (per-partition, per-day, per-region ...). */
  def mergeUserAggStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("user_id"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("spend_cents")).as("spend_cents"),
        max(col("last_ts_us")).as("last_ts_us"))
}
