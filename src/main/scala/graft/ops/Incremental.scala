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

  /** INCREMENTAL VIEW MAINTENANCE of a two-fact JOIN view — the delta
    * algebra Δ(A ⋈ B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB applied to a revenue
    * aggregate over orders ⋈ lineitem, both sides split at `splitDay`
    * (epoch days; orders by order date, lineitem by ship date — the
    * late-arrival shape). The maintained view is the OLD-state aggregate
    * plus the three delta terms, merged by SUM — never a re-join of
    * A₀⋈B₀ against the full history at refresh time. The oracle runs the
    * monolithic join, pinning that the decomposition loses nothing.
    *
    * At 100 TB: refresh cost is O(|Δ| · join fan-out), not O(|A|·…); the
    * A₀⋈ΔB term probes old orders only for the delta's orderkeys (a
    * semi-filtered scan in practice — partition pruning on the date makes
    * A₀ cheap to re-read for exactly those keys).
    */
  def ivmJoinRevenue(orders: DataFrame, lineitem: DataFrame,
                     splitDay: Long): DataFrame = {
    // each side feeds TWO of the four delta terms, and all four join on
    // the same key: repartition once on that key and persist, so the
    // old/new filters (partitioning-preserving) and every term's join
    // reuse ONE exchange per side instead of shuffling each term's inputs
    // independently (8 exchange legs -> 2)
    val o = orders.select(col("o_orderkey"), col("o_orderpriority"),
      (Relational.epochUs(col("o_orderdate")) / 86400000000L).cast("long")
        .as("od"))
      .repartition(col("o_orderkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val l = lineitem.select(col("l_orderkey"),
      (round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")))
        .as("rev_c100"),
      (Relational.epochUs(col("l_shipdate")) / 86400000000L).cast("long")
        .as("ld"))
      .repartition(col("l_orderkey"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val oOld = o.filter(col("od") < splitDay)
    val oNew = o.filter(col("od") >= splitDay)
    val lOld = l.filter(col("ld") < splitDay)
    val lNew = l.filter(col("ld") >= splitDay)
    def term(a: DataFrame, b: DataFrame) = a
      .join(b, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("rev_c100")).as("rev"), count(lit(1)).as("n"))
    // old state (materialized once in production) + the three delta terms
    val terms = Seq(term(oOld, lOld), term(oNew, lOld), term(oOld, lNew),
      term(oNew, lNew))
    terms.reduce(_ unionByName _)
      .groupBy(col("o_orderpriority"))
      .agg(sum(col("rev")).as("revenue_c100"), sum(col("n")).as("n_lines"))
  }

  /** DuckDB mirror of [[ivmJoinRevenue]] — the MONOLITHIC join the delta
    * decomposition must equal. */
  def ivmJoinRevenueSql: String =
    """SELECT o.o_orderpriority,
      |  CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
      |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT))) AS BIGINT)
      |    AS revenue_c100,
      |  count(*) AS n_lines
      |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |GROUP BY 1""".stripMargin
}
