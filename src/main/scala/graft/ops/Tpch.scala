package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TPC-H-shaped relational breadth: the two classic correlated-subquery
  * patterns, each implemented as its DECORRELATED aggregate/join rewrite —
  * the form that scales — while the DuckDB oracle runs the literal
  * EXISTS / scalar-subquery SQL, pinning the equivalence of the rewrite.
  * (The reference has no multi-table SQL at all; this is the relational
  * surface a user would expect from an engine claiming its workload:
  * SURVEY.md §2.3/§2.5 "free in Spark" rows, made concrete.)
  */
object Tpch {

  /** TPC-H Q21 shape — "the only late supplier": suppliers who, in a
    * multi-supplier order, were the ONLY one to ship late (> `lateDays`
    * after the order date; the fixtures carry no commit/receipt dates, so
    * ship-vs-order lateness stands in). Classic form is a correlated
    * EXISTS (another supplier in the order) + NOT EXISTS (another LATE
    * supplier) per lineitem; that nested-loop shape is O(lineitem²) per
    * order and un-shardable.
    *
    * Decorrelated rewrite: collapse lineitem to one row per
    * (order, supplier) with a `late` flag (partial-agg shuffle), then one
    * more aggregate per order counting suppliers and late suppliers; the
    * qualifying orders (`n_supp > 1 AND n_late = 1`) re-join the per-pair
    * rows to attribute the wait to the single late supplier. Both
    * aggregates pre-combine map-side; the orders dim join is
    * broadcast-able; output is |suppliers| rows.
    */
  def onlyLateSupplier(lineitem: DataFrame, orders: DataFrame,
                       supplier: DataFrame, lateDays: Int): DataFrame = {
    val lateUs = lateDays * 86400000000L
    val pairs = lineitem
      .select(col("l_orderkey"), col("l_suppkey"),
        Relational.epochUs(col("l_shipdate")).as("ship_us"))
      .join(broadcast(orders.select(col("o_orderkey"),
        Relational.epochUs(col("o_orderdate")).as("order_us"))),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(max(when(col("ship_us") > col("order_us") + lateUs, 1L)
        .otherwise(0L)).as("late"))
    val perOrder = pairs
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_supp"), sum(col("late")).as("n_late"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
    pairs.filter(col("late") === 1)
      .join(perOrder, Seq("l_orderkey"), "left_semi")
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("numwait"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_name"), col("numwait"))
  }

  /** DuckDB mirror of [[onlyLateSupplier]] — the LITERAL correlated
    * EXISTS / NOT EXISTS formulation, proving the decorrelated rewrite. */
  def onlyLateSupplierSql(lateDays: Int): String =
    s"""WITH pairs AS (
       |  SELECT l.l_orderkey, l.l_suppkey,
       |    max(CASE WHEN l.l_shipdate > o.o_orderdate
       |          + INTERVAL $lateDays DAY THEN 1 ELSE 0 END) AS late
       |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
       |  GROUP BY 1, 2)
       |SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
       |FROM pairs p1 JOIN supplier s ON p1.l_suppkey = s.s_suppkey
       |WHERE p1.late = 1
       |  AND EXISTS (SELECT 1 FROM pairs p2
       |    WHERE p2.l_orderkey = p1.l_orderkey
       |      AND p2.l_suppkey <> p1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM pairs p3
       |    WHERE p3.l_orderkey = p1.l_orderkey
       |      AND p3.l_suppkey <> p1.l_suppkey AND p3.late = 1)
       |GROUP BY 1""".stripMargin

  /** TPC-H Q17 shape — small-quantity-order revenue: total revenue from
    * lineitems of one brand whose quantity is below 20% of that part's
    * average lineitem quantity. Classic form is a correlated SCALAR
    * subquery (`l_quantity < 0.2 * (SELECT avg ... WHERE same part)`)
    * re-scanning lineitem per row.
    *
    * Decorrelated rewrite: one partial-aggregated pass builds per-part
    * `(sum_qty, n)` sufficient stats; the predicate is the exact integer
    * cross-multiplication `5 · qty · n < sum_qty` (quantities carried as
    * cents — no 0.2·avg double in sight, so Spark and the oracle agree
    * bit-for-bit). The stats side is |parts|-sized → broadcast join.
    * Output: one row (revenue cents, qualifying line count).
    */
  def smallQtyRevenue(lineitem: DataFrame, part: DataFrame,
                      brand: String): DataFrame = {
    val li = lineitem
      .join(broadcast(part.filter(col("p_brand") === brand)
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"),
        round(col("l_quantity") * 100).cast("long").as("qty_c"),
        round(col("l_extendedprice") * 100).cast("long").as("price_c"))
    val stats = li.groupBy(col("l_partkey"))
      .agg(sum(col("qty_c")).as("sum_qty_c"), count(lit(1)).as("n_li"))
    li.join(broadcast(stats), Seq("l_partkey"))
      .filter(col("qty_c") * 5 * col("n_li") < col("sum_qty_c"))
      .agg(coalesce(sum(col("price_c")), lit(0L)).as("revenue_cents"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q11 shape — share-of-total filter: parts whose revenue exceeds
    * `1/denom` of GLOBAL revenue. Classic form compares a per-group sum
    * against a scalar subquery over the whole fact table (a second full
    * scan). Rewrite: one partial-aggregated pass to per-part sums, then the
    * global total as `sum OVER ()` on the |parts|-sized aggregate — the
    * predicate is the exact integer cross-multiplication
    * `part_cents · denom > total_cents`. The single-partition window runs
    * over the REDUCED table (domain-bounded, the q117/q125 trick), never
    * the fact rows.
    */
  def revenueShare(lineitem: DataFrame, denom: Long): DataFrame = {
    val perPart = lineitem
      .select(col("l_partkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(sum(col("cents")).as("part_cents"))
    perPart
      .withColumn("total_cents",
        sum(col("part_cents")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .filter(col("part_cents") * denom > col("total_cents"))
      .select(col("l_partkey"), col("part_cents"))
  }

  /** DuckDB mirror of [[revenueShare]] — literal scalar-subquery HAVING. */
  def revenueShareSql(denom: Long): String =
    s"""WITH pp AS (
       |  SELECT l_partkey, CAST(sum(CAST(round(l_extendedprice
       |      * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS part_cents
       |  FROM lineitem GROUP BY 1)
       |SELECT l_partkey, part_cents FROM pp
       |WHERE part_cents * $denom > (SELECT sum(part_cents) FROM pp)""".stripMargin

  /** TPC-H Q15 shape — top supplier(s) by revenue inside a time window,
    * ties kept (the classic `= (SELECT max(...))` view pattern). Rewrite:
    * per-supplier sums (one partial-agg exchange), then `max OVER ()` on
    * the |suppliers|-sized aggregate instead of a second scan.
    */
  def topRevenueSupplier(lineitem: DataFrame, supplier: DataFrame,
                         fromDate: String, toDate: String): DataFrame = {
    val perSupp = lineitem
      .filter(col("l_shipdate") >= lit(fromDate).cast("timestamp") &&
        col("l_shipdate") < lit(toDate).cast("timestamp"))
      .select(col("l_suppkey"),
        round(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100)
          .cast("long").as("cents"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("cents")).as("total_rev_cents"))
    perSupp
      .withColumn("__mx",
        max(col("total_rev_cents")).over(org.apache.spark.sql.expressions
          .Window.partitionBy()))
      .filter(col("total_rev_cents") === col("__mx"))
      .join(broadcast(supplier.select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_rev_cents"))
  }

  /** DuckDB mirror of [[topRevenueSupplier]] — literal `= (SELECT max)`. */
  def topRevenueSupplierSql(fromDate: String, toDate: String): String =
    s"""WITH ps AS (
       |  SELECT l_suppkey, CAST(sum(CAST(round(l_extendedprice
       |      * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT)
       |    AS total_rev_cents
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '$fromDate'
       |    AND l_shipdate < TIMESTAMP '$toDate'
       |  GROUP BY 1)
       |SELECT s.s_suppkey, s.s_name, ps.total_rev_cents
       |FROM ps JOIN supplier s ON ps.l_suppkey = s.s_suppkey
       |WHERE ps.total_rev_cents = (SELECT max(total_rev_cents) FROM ps)""".stripMargin

  /** TPC-H Q22 shape — rich-but-idle customers: per market segment, the
    * count and total balance of customers whose balance (cents) is
    * strictly above the average POSITIVE balance and who have placed no
    * orders since `idleSince`. The average test is the exact
    * cross-multiplication `bal_c · n_pos > sum_pos_c` (no double average),
    * the "no recent orders" test a left-anti join with the date predicate
    * pushed INTO the anti side's scan (the decorrelated NOT EXISTS).
    */
  def richIdleCustomers(customer: DataFrame, orders: DataFrame,
                        idleSince: String): DataFrame = {
    val cust = customer.select(col("c_custkey"), col("c_mktsegment"),
      round(col("c_acctbal") * 100).cast("long").as("bal_c"))
    val posStats = cust.filter(col("bal_c") > 0)
      .agg(sum(col("bal_c")).as("sum_pos"), count(lit(1)).as("n_pos"))
    cust.crossJoin(broadcast(posStats))
      .filter(col("bal_c") * col("n_pos") > col("sum_pos"))
      .join(orders
        .filter(col("o_orderdate") >= lit(idleSince).cast("timestamp"))
        .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_custs"), sum(col("bal_c")).as("total_bal_cents"))
  }

  /** DuckDB mirror of [[richIdleCustomers]] — literal scalar-avg +
    * NOT EXISTS (cross-multiplied identically). */
  def richIdleCustomersSql(idleSince: String): String =
    s"""WITH cust AS (
       |  SELECT c_custkey, c_mktsegment,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c
       |  FROM customer)
       |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
       |  CAST(sum(bal_c) AS BIGINT) AS total_bal_cents
       |FROM cust c1
       |WHERE c1.bal_c * (SELECT count(*) FROM cust WHERE bal_c > 0)
       |    > (SELECT CAST(sum(bal_c) AS BIGINT) FROM cust WHERE bal_c > 0)
       |  AND NOT EXISTS (SELECT 1 FROM orders o
       |    WHERE o.o_custkey = c1.c_custkey
       |      AND o.o_orderdate >= TIMESTAMP '$idleSince')
       |GROUP BY 1""".stripMargin

  /** DuckDB mirror of [[smallQtyRevenue]] — the LITERAL correlated scalar
    * subquery, in the same exact integer form. */
  def smallQtyRevenueSql(brand: String): String =
    s"""WITH li AS (
       |  SELECT l.l_partkey,
       |    CAST(round(l.l_quantity * 100) AS BIGINT) AS qty_c,
       |    CAST(round(l.l_extendedprice * 100) AS BIGINT) AS price_c
       |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |  WHERE p.p_brand = '$brand')
       |SELECT CAST(coalesce(sum(price_c), 0) AS BIGINT) AS revenue_cents,
       |  CAST(count(*) AS BIGINT) AS n_lines
       |FROM li l1
       |WHERE l1.qty_c * 5 * (SELECT count(*) FROM li l2
       |    WHERE l2.l_partkey = l1.l_partkey)
       |  < (SELECT sum(qty_c) FROM li l3
       |    WHERE l3.l_partkey = l1.l_partkey)""".stripMargin
}
