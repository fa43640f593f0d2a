package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retail-domain analytics the reference's feature pipeline points at but
  * never ships: RFM segmentation and market-basket association rules.
  * Both are integer-exact with one pinned double expression at the end.
  */
object Retail {

  /** RFM quintile scoring — the classic retail customer segmentation:
    * Recency (days since last order, vs the corpus max date), Frequency
    * (order count), Monetary (lifetime cents). Each metric is scored 1–5
    * by `ntile(5)` with a customer-id tie-break for determinism (reference
    * computes per-customer aggregates of exactly this shape, without the
    * scoring: jobs/build_feature_views.py:41-58).
    *
    * Scale shape: orders collapse to one row per customer FIRST (partial-
    * aggregated shuffle); the three ntile windows run on |customers| rows.
    * A global ntile is a single-partition sort of the reduced table — at
    * true 100 TB (billions of customers) swap in quantile-bin thresholds
    * from approx_percentile (q57's shape) instead; the quintile semantics
    * here follow the standard exact definition.
    *
    * orders: (o_custkey, o_orderdate ts, o_totalprice double). */
  def rfmScores(orders: DataFrame): DataFrame = {
    val perCust = orders
      .select(col("o_custkey").as("customer_id"),
        Relational.epochUs(col("o_orderdate")).as("ts_us"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("customer_id"))
      .agg(max(col("ts_us")).as("last_ts_us"),
        count(lit(1)).as("frequency"),
        sum(col("cents")).as("monetary_cents"))
      .withColumn("recency_days",
        expr("(max(last_ts_us) OVER () - last_ts_us) DIV 86400000000"))
    // recency: smaller = better = higher score → ntile over DESC days
    val rW = Window.orderBy(col("recency_days").desc, col("customer_id").asc)
    val fW = Window.orderBy(col("frequency").asc, col("customer_id").asc)
    val mW = Window.orderBy(col("monetary_cents").asc, col("customer_id").asc)
    perCust
      .withColumn("r_score", ntile(5).over(rW).cast("long"))
      .withColumn("f_score", ntile(5).over(fW).cast("long"))
      .withColumn("m_score", ntile(5).over(mW).cast("long"))
      .select(col("customer_id"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score"))
          .as("rfm_cell"))
  }

  /** DuckDB mirror of [[rfmScores]] over orders. */
  val rfmScoresSql: String =
    """WITH pc AS (
      |  SELECT o_custkey AS customer_id,
      |    max(epoch_us(o_orderdate)) AS last_ts_us,
      |    CAST(count(*) AS BIGINT) AS frequency,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS monetary_cents
      |  FROM orders GROUP BY 1),
      |rec AS (
      |  SELECT *, (max(last_ts_us) OVER () - last_ts_us) // 86400000000
      |    AS recency_days
      |  FROM pc)
      |SELECT customer_id, recency_days, frequency, monetary_cents,
      |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, customer_id ASC)
      |    AS BIGINT) AS r_score,
      |  CAST(ntile(5) OVER (ORDER BY frequency ASC, customer_id ASC)
      |    AS BIGINT) AS f_score,
      |  CAST(ntile(5) OVER (ORDER BY monetary_cents ASC, customer_id ASC)
      |    AS BIGINT) AS m_score,
      |  CAST(ntile(5) OVER (ORDER BY recency_days DESC, customer_id ASC) * 100
      |    + ntile(5) OVER (ORDER BY frequency ASC, customer_id ASC) * 10
      |    + ntile(5) OVER (ORDER BY monetary_cents ASC, customer_id ASC)
      |    AS BIGINT) AS rfm_cell
      |FROM rec""".stripMargin

  /** GINI CONCENTRATION of customer revenue per nation, as the EXACT
    * RATIONAL (gini_num, gini_den): with per-customer revenues x₁≤…≤xₙ,
    *   G = (2·Σ i·xᵢ − (n+1)·Σ xᵢ) / (n·Σ xᵢ)
    * — the inequality KPI (is revenue concentrated in few whales?) with
    * zero division, zero floats. Ties in x are order-invariant for the
    * formula (swapping equal values leaves Σ i·xᵢ unchanged); the id
    * tie-break just pins the row order.
    *
    * Scale shape: facts collapse to one row per customer (partial-agg
    * exchange), the rank runs per nation on the reduced table, and the
    * final aggregate is |nations| rows. */
  def giniByNation(orders: DataFrame, customer: DataFrame): DataFrame = {
    val perCust = orders
      .select(col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("x"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("x").asc, col("o_custkey").asc)
    perCust
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("x")).as("total_cents"),
        (sum(col("i") * col("x")) * 2).as("__2six"))
      .select(col("c_nationkey"), col("n_customers"), col("total_cents"),
        (col("__2six") - (col("n_customers") + 1) * col("total_cents"))
          .as("gini_num"),
        (col("n_customers") * col("total_cents")).as("gini_den"))
  }

  /** DuckDB mirror of [[giniByNation]]. */
  val giniByNationSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |r AS (
      |  SELECT c.c_nationkey, pc.x,
      |    CAST(row_number() OVER (PARTITION BY c.c_nationkey
      |      ORDER BY pc.x ASC, pc.o_custkey ASC) AS BIGINT) AS i
      |  FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey)
      |SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(x) AS BIGINT) AS total_cents,
      |  CAST(2 * sum(i * x) - (count(*) + 1) * sum(x) AS BIGINT) AS gini_num,
      |  CAST(count(*) * sum(x) AS BIGINT) AS gini_den
      |FROM r GROUP BY 1""".stripMargin

  /** ABC (Pareto) CLASSIFICATION of parts by revenue within brand: rank by
    * revenue desc, class A while the inclusive cumulative share is ≤ 80 %
    * of the brand total, B while ≤ 95 %, else C — the inventory-priority
    * segmentation, all thresholds integer cross-multiplications.
    *
    * Scale shape: one partial-agg exchange to per-(brand, part) revenue,
    * one brand-partitioned window pass for rank + running sum, a narrow
    * classification Project. */
  def abcClasses(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val rev = lineitem
      .select(col("l_partkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("rev_c"))
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("rev_c").desc, col("l_partkey").asc)
    rev
      .withColumn("cum_c",
        sum(col("rev_c")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("total_c",
        sum(col("rev_c")).over(Window.partitionBy(col("p_brand"))))
      .select(col("p_brand"), col("l_partkey"), col("rev_c"), col("cum_c"),
        when(col("cum_c") * 100 <= col("total_c") * 80, "A")
          .when(col("cum_c") * 100 <= col("total_c") * 95, "B")
          .otherwise("C").as("abc_class"))
  }

  /** DuckDB mirror of [[abcClasses]]. */
  val abcClassesSql: String =
    """WITH rev AS (
      |  SELECT l.l_partkey, p.p_brand,
      |    CAST(sum(CAST(round(l.l_extendedprice * (1.0 - l.l_discount)
      |      * 100) AS BIGINT)) AS BIGINT) AS rev_c
      |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |  GROUP BY 1, 2),
      |c AS (
      |  SELECT p_brand, l_partkey, rev_c,
      |    CAST(sum(rev_c) OVER (PARTITION BY p_brand
      |      ORDER BY rev_c DESC, l_partkey ASC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum_c,
      |    CAST(sum(rev_c) OVER (PARTITION BY p_brand) AS BIGINT) AS total_c
      |  FROM rev)
      |SELECT p_brand, l_partkey, rev_c, cum_c,
      |  CASE WHEN cum_c * 100 <= total_c * 80 THEN 'A'
      |       WHEN cum_c * 100 <= total_c * 95 THEN 'B'
      |       ELSE 'C' END AS abc_class
      |FROM c""".stripMargin

  /** Market-basket association rules over order item-sets with A-PRIORI
    * pruning — the scale trick that makes pair mining feasible: an item
    * pair can only reach `minPairSupport` if BOTH items individually do,
    * so infrequent items are semi-joined away BEFORE the quadratic
    * per-order pair expansion. Per pair (a < b): support counts,
    * confidence in both directions, and lift — all from exact BIGINT
    * counts, divisions pinned at the end.
    *
    * Scale shape: baskets = distinct (order, item) — one shuffle;
    * frequent-item filter broadcasts (items table ≪ facts); the pair
    * expansion is a per-order self-join that only ever sees frequent
    * items; pair counting partial-aggregates map-side.
    *
    * lineitem: (l_orderkey, l_partkey). */
  def assocRules(lineitem: DataFrame, minItemSupport: Long,
                 minPairSupport: Long): DataFrame = {
    val baskets = lineitem
      .select(col("l_orderkey").as("oid"), col("l_partkey").as("item"))
      .distinct()
      // four consumers (nOrders action, item census, both pair sides) —
      // uncut, the distinct subtree evaluates four times
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nOrders = baskets.select(col("oid")).distinct().count()
    val itemCnt = baskets.groupBy(col("item"))
      .agg(count(lit(1)).as("n_item"))
      .filter(col("n_item") >= minItemSupport)
    val frequent = baskets.join(broadcast(itemCnt), Seq("item"))
    val pairs = frequent.select(col("oid"), col("item").as("a"), col("n_item").as("n_a"))
      .join(frequent.select(col("oid"), col("item").as("b"), col("n_item").as("n_b")),
        Seq("oid"))
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairSupport)
    pairs.select(col("a"), col("b"), col("n_a"), col("n_b"), col("n_ab"),
      (col("n_ab").cast("double") / col("n_a").cast("double")).as("conf_a_b"),
      (col("n_ab").cast("double") / col("n_b").cast("double")).as("conf_b_a"),
      (col("n_ab").cast("double") * lit(nOrders).cast("double") /
        (col("n_a").cast("double") * col("n_b").cast("double"))).as("lift"))
  }

  /** DuckDB mirror of [[assocRules]] over lineitem. */
  def assocRulesSql(minItemSupport: Long, minPairSupport: Long): String =
    s"""WITH baskets AS (
       |  SELECT DISTINCT l_orderkey AS oid, l_partkey AS item FROM lineitem),
       |n AS (SELECT CAST(count(DISTINCT oid) AS BIGINT) AS n_orders FROM baskets),
       |ic AS (
       |  SELECT item, CAST(count(*) AS BIGINT) AS n_item
       |  FROM baskets GROUP BY 1 HAVING count(*) >= $minItemSupport),
       |freq AS (SELECT b.oid, b.item, ic.n_item
       |         FROM baskets b JOIN ic ON b.item = ic.item),
       |pairs AS (
       |  SELECT f1.item AS a, f2.item AS b, f1.n_item AS n_a, f2.n_item AS n_b,
       |    CAST(count(*) AS BIGINT) AS n_ab
       |  FROM freq f1 JOIN freq f2 ON f1.oid = f2.oid AND f1.item < f2.item
       |  GROUP BY 1, 2, 3, 4 HAVING count(*) >= $minPairSupport)
       |SELECT a, b, n_a, n_b, n_ab,
       |  CAST(n_ab AS DOUBLE) / CAST(n_a AS DOUBLE) AS conf_a_b,
       |  CAST(n_ab AS DOUBLE) / CAST(n_b AS DOUBLE) AS conf_b_a,
       |  CAST(n_ab AS DOUBLE) * CAST(n.n_orders AS DOUBLE)
       |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS lift
       |FROM pairs, n""".stripMargin
}
