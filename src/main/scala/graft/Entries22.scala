package graft

import graft.ExtEntries.Q
import graft.ops.Tpch2

/** Round-7 batch 1: the remaining expressible TPC-H shapes (Q3, Q5, Q6,
  * Q7, Q8, Q9-adapted, Q10, Q13, Q19-adapted) — closing out the classic
  * relational suite alongside Tpch.scala's Q21/Q17/Q11/Q15/Q22 and the
  * earlier Q1/Q4/Q18. All money is exact BIGINT 10⁻⁴ dollars (see
  * ops/Tpch2.scala scaladoc).
  */
object Entries22 {

  private def t = Tables

  val all: Seq[Q] = Seq(

    Q("q203_shipping_priority",
      (s, d) => Tpch2.shippingPriority(t.customer(s, d), t.orders(s, d),
        t.lineitem(s, d), "BUILDING", "2000-03-15"),
      Some(Tpch2.shippingPrioritySql("BUILDING", "2000-03-15"))),

    Q("q204_local_supplier_volume",
      (s, d) => Tpch2.localSupplierVolume(t.customer(s, d), t.orders(s, d),
        t.lineitem(s, d), t.supplier(s, d), t.nation(s, d), t.region(s, d),
        "ASIA", "1996-01-01", "1997-01-01"),
      Some(Tpch2.localSupplierVolumeSql("ASIA", "1996-01-01", "1997-01-01"))),

    Q("q205_forecast_revenue",
      (s, d) => Tpch2.forecastRevenue(t.lineitem(s, d),
        "1997-01-01", "1998-01-01", "0.05", "0.07", 24L),
      Some(Tpch2.forecastRevenueSql("1997-01-01", "1998-01-01",
        "0.05", "0.07", 24L))),

    Q("q206_volume_shipping",
      (s, d) => Tpch2.volumeShipping(t.customer(s, d), t.orders(s, d),
        t.lineitem(s, d), t.supplier(s, d), t.nation(s, d),
        "NATION_3", "NATION_7", "1996-01-01", "1997-12-31"),
      Some(Tpch2.volumeShippingSql("NATION_3", "NATION_7",
        "1996-01-01", "1997-12-31"))),

    Q("q207_market_share",
      (s, d) => Tpch2.marketShare(t.customer(s, d), t.orders(s, d),
        t.lineitem(s, d), t.supplier(s, d), t.part(s, d), t.nation(s, d),
        t.region(s, d), "NATION_6", "AMERICA", "ECONOMY",
        "1996-01-01", "1997-12-31"),
      Some(Tpch2.marketShareSql("NATION_6", "AMERICA", "ECONOMY",
        "1996-01-01", "1997-12-31"))),

    Q("q208_product_profit",
      (s, d) => Tpch2.productProfit(t.orders(s, d), t.lineitem(s, d),
        t.supplier(s, d), t.part(s, d), t.nation(s, d), "red"),
      Some(Tpch2.productProfitSql("red"))),

    Q("q209_returned_items",
      (s, d) => Tpch2.returnedItems(t.customer(s, d), t.orders(s, d),
        t.lineitem(s, d), t.nation(s, d), "1996-10-01", "1997-01-01"),
      Some(Tpch2.returnedItemsSql("1996-10-01", "1997-01-01"))),

    Q("q210_cust_order_dist",
      (s, d) => Tpch2.custOrderDistribution(t.customer(s, d),
        t.orders(s, d)),
      Some(Tpch2.custOrderDistributionSql)),

    Q("q211_discounted_revenue",
      (s, d) => Tpch2.discountedRevenue(t.lineitem(s, d), t.part(s, d),
        Seq(("Brand#9", 1L, 11L, 5L), ("Brand#13", 10L, 20L, 10L),
          ("Brand#20", 20L, 30L, 15L))),
      Some(Tpch2.discountedRevenueSql(
        Seq(("Brand#9", 1L, 11L, 5L), ("Brand#13", 10L, 20L, 10L),
          ("Brand#20", 20L, 30L, 15L))))))
}
