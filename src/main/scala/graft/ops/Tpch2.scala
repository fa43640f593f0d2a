package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TPC-H relational suite, part 2 — the remaining classic shapes the
  * fixture schema can express (no `partsupp`, no commit/receipt dates, so
  * Q2/Q11/Q12/Q16/Q20 have no faithful form; Q9/Q19 run in adapted form).
  * Together with Tpch.scala (Q21/Q17/Q11-share/Q15/Q22) and the earlier
  * entries (Q1 q03, Q4 q167, Q18 q199) this closes out the expressible
  * TPC-H surface — the relational breadth a user switching engines expects
  * (SURVEY.md §2.3/§2.5).
  *
  * Arithmetic discipline: every money value is BIGINT from the first
  * expression — `price_c = round(l_extendedprice·100)` cents and
  * `d_pct = round(l_discount·100)` integer percent, so the revenue term
  * `price_c · (100 − d_pct)` is an exact BIGINT in 10⁻⁴ dollars and the
  * DuckDB oracle matches bit-for-bit (no float sum order dependence; the
  * float-parity lesson of SURVEY §7 "fidelity gotchas").
  */
object Tpch2 {

  private val DayUs = 86400000000L

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** lineitem projected to integer money columns. */
  private def liMoney(lineitem: DataFrame): DataFrame =
    lineitem.select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_shipdate"),
      cents(col("l_extendedprice")).as("price_c"),
      cents(col("l_discount")).as("d_pct"),
      cents(col("l_quantity")).as("qty_c"))

  private def revC100: Column = col("price_c") * (lit(100L) - col("d_pct"))

  private val revSql =
    "CAST(round(l_extendedprice * 100) AS BIGINT) * " +
      "(100 - CAST(round(l_discount * 100) AS BIGINT))"

  // ------------------------------------------------------------------- Q3

  /** TPC-H Q3 — shipping priority: the 10 highest-revenue orders of one
    * market segment not yet shipped at `cutoff`. Scale shape: customer is
    * a semi-filter on orders (broadcast the segment's keys is wrong at
    * 100 TB — customers are fact-sized — so it stays a shuffle join on
    * custkey, with the segment filter pushed to the customer scan);
    * lineitem ⋈ orders co-partitions on orderkey; the top-10 is
    * TakeOrderedAndProject (per-partition heap + driver merge of 10-row
    * heads, never a global sort). Ties pinned by (day, orderkey).
    */
  def shippingPriority(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String,
                       cutoff: String): DataFrame = {
    val cut = to_date(lit(cutoff))
    val cust = customer.filter(col("c_mktsegment") === segment)
      .select(col("c_custkey"))
    val ord = orders.filter(col("o_orderdate") < cut)
      .select(col("o_orderkey"), col("o_custkey"),
        (Relational.epochUs(col("o_orderdate")) / DayUs).cast("long")
          .as("order_day"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    liMoney(lineitem).filter(col("l_shipdate") > cut)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("order_day"))
      .agg(sum(revC100).as("revenue_c100"))
      .orderBy(col("revenue_c100").desc, col("order_day").asc,
        col("l_orderkey").asc)
      .limit(10)
  }

  def shippingPrioritySql(segment: String, cutoff: String): String =
    s"""SELECT l.l_orderkey,
       |  epoch_us(o.o_orderdate) // 86400000000 AS order_day,
       |  CAST(sum($revSql) AS BIGINT) AS revenue_c100
       |FROM customer c
       |JOIN orders o ON o.o_custkey = c.c_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |WHERE c.c_mktsegment = '$segment'
       |  AND o.o_orderdate < DATE '$cutoff'
       |  AND l.l_shipdate > DATE '$cutoff'
       |GROUP BY 1, 2
       |ORDER BY revenue_c100 DESC, order_day, l_orderkey
       |LIMIT 10""".stripMargin

  // ------------------------------------------------------------------- Q5

  /** TPC-H Q5 — local supplier volume: revenue per nation of one region
    * from orders where the customer and the lineitem's supplier share that
    * nation, over one year of orders. Scale shape: nation⋈region collapse
    * to a ≤25-row broadcast dim; supplier (small side) broadcasts with its
    * nationkey attached; customer⋈orders and orders⋈lineitem are the two
    * key-partitioned shuffles; the `c_nationkey = s_nationkey` locality
    * predicate is a row-local filter once both sides are attached — never
    * a join condition that would force a second distribution.
    */
  def localSupplierVolume(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, supplier: DataFrame,
                          nation: DataFrame, region: DataFrame,
                          regionName: String, from: String,
                          until: String): DataFrame = {
    val nat = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val supp = supplier
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val ord = orders
      .filter(col("o_orderdate") >= to_date(lit(from)) &&
        col("o_orderdate") < to_date(lit(until)))
      .select(col("o_orderkey"), col("o_custkey"))
      .join(customer.select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_nationkey"))
    liMoney(lineitem)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(revC100).as("revenue_c100"))
  }

  def localSupplierVolumeSql(regionName: String, from: String,
                             until: String): String =
    s"""SELECT n.n_name, CAST(sum($revSql) AS BIGINT) AS revenue_c100
       |FROM customer c
       |JOIN orders o ON o.o_custkey = c.c_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |  AND c.c_nationkey = s.s_nationkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN region r ON n.n_regionkey = r.r_regionkey
       |WHERE r.r_name = '$regionName'
       |  AND o.o_orderdate >= DATE '$from'
       |  AND o.o_orderdate < DATE '$until'
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------- Q6

  /** TPC-H Q6 — forecasting revenue change: the discount total
    * (`price · discount`) forfeited on small-quantity lines in a discount
    * band over one shipping year. Pure scan-aggregate: every predicate
    * pushes to the parquet scan, the sum pre-combines map-side, output is
    * ONE row — the canonical "filters reach the scan" probe at 100 TB.
    *
    * The predicates run on the RAW columns, not the derived integer ones:
    * `round(l_discount·100) BETWEEN 5 AND 7` is opaque to parquet (cast +
    * round block pushdown — measured, not guessed: the posture spec pins
    * PushedFilters), while `l_discount BETWEEN 0.05 AND 0.07` reaches the
    * row-group stats. Selected rows are identical — discounts exist only
    * at exact percent points, and both engines parse the same literals to
    * the same doubles. The revenue ARITHMETIC stays integer afterwards.
    */
  def forecastRevenue(lineitem: DataFrame, from: String, until: String,
                      dLo: String, dHi: String, qtyBelow: Long): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= to_date(lit(from)) &&
        col("l_shipdate") < to_date(lit(until)) &&
        col("l_discount") >= lit(dLo).cast("double") &&
        col("l_discount") <= lit(dHi).cast("double") &&
        col("l_quantity") < qtyBelow)
      .select(cents(col("l_extendedprice")).as("price_c"),
        cents(col("l_discount")).as("d_pct"))
      .agg(coalesce(sum(col("price_c") * col("d_pct")), lit(0L))
        .as("discount_c100"),
        count(lit(1)).as("n_lines"))

  def forecastRevenueSql(from: String, until: String, dLo: String,
                         dHi: String, qtyBelow: Long): String =
    s"""SELECT CAST(coalesce(sum(
       |    CAST(round(l_extendedprice * 100) AS BIGINT)
       |    * CAST(round(l_discount * 100) AS BIGINT)), 0) AS BIGINT)
       |  AS discount_c100,
       |  count(*) AS n_lines
       |FROM lineitem
       |WHERE l_shipdate >= DATE '$from' AND l_shipdate < DATE '$until'
       |  AND l_discount >= $dLo AND l_discount <= $dHi
       |  AND l_quantity < $qtyBelow""".stripMargin

  // ------------------------------------------------------------------- Q7

  /** TPC-H Q7 — volume shipping between two nations: revenue per
    * (supplier nation, customer nation, ship year) for the two directed
    * pairs, over a two-year shipping window. Scale shape: both nation
    * filters broadcast (supplier side as a ≤|suppliers| dim with the
    * nation name attached; customer side is fact-sized so its nation
    * attaches via the ≤25-row nation broadcast and filters AFTER the
    * custkey join); lineitem⋈orders⋈customer are the key-partitioned
    * shuffles; the directed-pair predicate is row-local.
    */
  def volumeShipping(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, supplier: DataFrame,
                     nation: DataFrame, n1: String, n2: String,
                     from: String, until: String): DataFrame = {
    val natN = broadcast(nation
      .filter(col("n_name").isin(n1, n2))
      .select(col("n_nationkey"), col("n_name")))
    val supp = supplier
      .join(natN, col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(natN, col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    liMoney(lineitem)
      .filter(col("l_shipdate") >= to_date(lit(from)) &&
        col("l_shipdate") <= to_date(lit(until)))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter((col("supp_nation") === n1 && col("cust_nation") === n2) ||
        (col("supp_nation") === n2 && col("cust_nation") === n1))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("long").as("l_year"))
      .agg(sum(revC100).as("revenue_c100"))
  }

  def volumeShippingSql(n1: String, n2: String, from: String,
                        until: String): String =
    s"""SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
       |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       |  CAST(sum($revSql) AS BIGINT) AS revenue_c100
       |FROM lineitem l
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
       |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
       |WHERE l.l_shipdate >= DATE '$from' AND l.l_shipdate <= DATE '$until'
       |  AND ((ns.n_name = '$n1' AND nc.n_name = '$n2')
       |    OR (ns.n_name = '$n2' AND nc.n_name = '$n1'))
       |GROUP BY 1, 2, 3""".stripMargin

  // ------------------------------------------------------------------- Q8

  /** TPC-H Q8 — national market share: per order year, the share of one
    * part type's revenue (into one region's customers) supplied by one
    * nation. The share leaves as the exact integer pair
    * `(mkt_num_c100, mkt_den_c100)` — numerator and denominator of the
    * same sum, never a double division (the q159/q173 rational-output
    * discipline). Scale shape: part-type filter broadcasts as the part
    * dim; supplier broadcasts with its nation name; region-filtered
    * customers attach via the nation broadcast after the custkey shuffle.
    */
  def marketShare(customer: DataFrame, orders: DataFrame,
                  lineitem: DataFrame, supplier: DataFrame,
                  part: DataFrame, nation: DataFrame, region: DataFrame,
                  suppNation: String, regionName: String, pType: String,
                  from: String, until: String): DataFrame = {
    val regionNat = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"))
    val cust = customer
      .join(broadcast(regionNat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val supp = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val ord = orders
      .filter(col("o_orderdate") >= to_date(lit(from)) &&
        col("o_orderdate") <= to_date(lit(until)))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .join(cust, col("o_custkey") === col("c_custkey"), "left_semi")
    liMoney(lineitem)
      .join(broadcast(part.filter(col("p_type") === pType)
        .select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(sum(when(col("supp_nation") === suppNation, revC100)
        .otherwise(lit(0L))).as("mkt_num_c100"),
        sum(revC100).as("mkt_den_c100"))
  }

  def marketShareSql(suppNation: String, regionName: String, pType: String,
                     from: String, until: String): String =
    s"""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       |  CAST(sum(CASE WHEN ns.n_name = '$suppNation' THEN $revSql
       |    ELSE 0 END) AS BIGINT) AS mkt_num_c100,
       |  CAST(sum($revSql) AS BIGINT) AS mkt_den_c100
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |JOIN customer c ON o.o_custkey = c.c_custkey
       |JOIN nation nc ON c.c_nationkey = nc.n_nationkey
       |JOIN region r ON nc.n_regionkey = r.r_regionkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation ns ON s.s_nationkey = ns.n_nationkey
       |WHERE r.r_name = '$regionName' AND p.p_type = '$pType'
       |  AND o.o_orderdate >= DATE '$from'
       |  AND o.o_orderdate <= DATE '$until'
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- Q9 (adapted)

  /** TPC-H Q9 shape — product-type profit by supplier nation and year.
    * The fixture has no `partsupp`, so `p_retailprice` stands in for the
    * supply cost: profit = revenue − units·cost, all in 10⁻⁴ dollars
    * (`qty_c DIV 100` recovers exact integer units — quantities are whole
    * numbers; `retail_c · 100` lifts cents to the revenue scale). Filter:
    * parts whose name contains `namePart` (the classic LIKE probe). Scale
    * shape: the filtered part dim broadcasts with its cost; supplier
    * broadcasts with the nation name; orders attach the year on the
    * orderkey shuffle; profit is a partial-aggregable BIGINT sum.
    */
  def productProfit(orders: DataFrame, lineitem: DataFrame,
                    supplier: DataFrame, part: DataFrame,
                    nation: DataFrame, namePart: String): DataFrame = {
    val p = part.filter(col("p_name").contains(namePart))
      .select(col("p_partkey"), cents(col("p_retailprice")).as("retail_c"))
    val supp = supplier
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    liMoney(lineitem)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select(col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(revC100 -
        (expr("qty_c DIV 100") * col("retail_c") * lit(100L)))
        .as("profit_c100"))
  }

  def productProfitSql(namePart: String): String =
    s"""SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       |  CAST(sum($revSql
       |    - (CAST(round(l_quantity * 100) AS BIGINT) // 100)
       |      * CAST(round(p.p_retailprice * 100) AS BIGINT) * 100)
       |    AS BIGINT) AS profit_c100
       |FROM lineitem l
       |JOIN part p ON l.l_partkey = p.p_partkey
       |JOIN supplier s ON l.l_suppkey = s.s_suppkey
       |JOIN nation n ON s.s_nationkey = n.n_nationkey
       |JOIN orders o ON l.l_orderkey = o.o_orderkey
       |WHERE contains(p.p_name, '$namePart')
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------ Q10

  /** TPC-H Q10 — returned-item reporting: the 20 customers with the most
    * revenue lost to returns (`l_returnflag = 'R'`) from orders placed in
    * one quarter. Scale shape: the quarter filter prunes orders at the
    * scan; lineitem⋈orders co-partition on orderkey; the per-customer
    * aggregate reduces to |customers| rows BEFORE the customer-attribute
    * join (aggregate-then-join, never join-then-aggregate on fact rows);
    * the top-20 is TakeOrderedAndProject with ties pinned by custkey.
    */
  def returnedItems(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, nation: DataFrame,
                    from: String, until: String): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= to_date(lit(from)) &&
        col("o_orderdate") < to_date(lit(until)))
      .select(col("o_orderkey"), col("o_custkey"))
    val perCust = liMoney(lineitem.filter(col("l_returnflag") === "R"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(sum(revC100).as("revenue_c100"))
    perCust
      .join(customer.select(col("c_custkey"), col("c_name"),
        cents(col("c_acctbal")).as("acctbal_c"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue_c100"),
        col("acctbal_c"), col("n_name"))
      .orderBy(col("revenue_c100").desc, col("c_custkey").asc)
      .limit(20)
  }

  def returnedItemsSql(from: String, until: String): String =
    s"""SELECT c.c_custkey, c.c_name,
       |  CAST(sum($revSql) AS BIGINT) AS revenue_c100,
       |  CAST(round(c.c_acctbal * 100) AS BIGINT) AS acctbal_c,
       |  n.n_name
       |FROM customer c
       |JOIN orders o ON o.o_custkey = c.c_custkey
       |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       |JOIN nation n ON c.c_nationkey = n.n_nationkey
       |WHERE l.l_returnflag = 'R'
       |  AND o.o_orderdate >= DATE '$from'
       |  AND o.o_orderdate < DATE '$until'
       |GROUP BY 1, 2, 4, 5
       |ORDER BY revenue_c100 DESC, c.c_custkey
       |LIMIT 20""".stripMargin

  // ------------------------------------------------------------------ Q13

  /** TPC-H Q13 — customer order-count distribution: how many customers
    * placed exactly k orders, INCLUDING k = 0 (the left join no inner
    * form can express). Scale shape: orders pre-aggregate to
    * (custkey, count) — a partial-aggregable reduce — then LEFT join from
    * customer keys fills the zeros; the distribution aggregate runs over
    * |customers| rows. Never count after a row-multiplying join.
    */
  def custOrderDistribution(customer: DataFrame,
                            orders: DataFrame): DataFrame = {
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c_count"))
    customer.select(col("c_custkey"))
      .join(perCust, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  def custOrderDistributionSql: String =
    """WITH pc AS (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1)
      |SELECT c_count, count(*) AS custdist
      |FROM pc GROUP BY 1""".stripMargin

  // ------------------------------------------------------------- Q19 (adapted)

  /** TPC-H Q19 shape — discounted revenue from three OR'd brand/quantity/
    * size windows (the fixture has no container/shipmode, so size stands
    * in for the container class). Scale shape: the part dim filters to
    * three brands BEFORE broadcasting; the OR predicate is row-local
    * after the single broadcast hash join — Catalyst pushes the common
    * brand `isin` into the part scan, and the disjunction never becomes
    * three scans.
    */
  def discountedRevenue(lineitem: DataFrame, part: DataFrame,
                        arms: Seq[(String, Long, Long, Long)]): DataFrame = {
    val brands = arms.map(_._1)
    val p = part.filter(col("p_brand").isin(brands: _*))
      .select(col("p_partkey"), col("p_brand"), col("p_size"))
    val pred = arms.map { case (b, qLo, qHi, sizeHi) =>
      col("p_brand") === b &&
        col("qty_c").between(qLo * 100, qHi * 100) &&
        col("p_size").between(1, sizeHi.toInt)
    }.reduce(_ || _)
    liMoney(lineitem)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(coalesce(sum(revC100), lit(0L)).as("revenue_c100"),
        count(lit(1)).as("n_lines"))
  }

  def discountedRevenueSql(arms: Seq[(String, Long, Long, Long)]): String = {
    val pred = arms.map { case (b, qLo, qHi, sizeHi) =>
      s"""(p.p_brand = '$b' AND l.l_quantity BETWEEN $qLo AND $qHi
         |    AND p.p_size BETWEEN 1 AND $sizeHi)""".stripMargin
    }.mkString("(", "\n  OR ", ")")
    s"""SELECT CAST(coalesce(sum($revSql), 0) AS BIGINT) AS revenue_c100,
       |  count(*) AS n_lines
       |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       |WHERE $pred""".stripMargin
  }
}
