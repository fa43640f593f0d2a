package graft

import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("plan metrics report scan rows, shuffle volume, and exchange count") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val agg = ev.groupBy($"user_id").agg(count(lit(1)).as("c"))
    val m = Metrics.run(agg)
    assert(m.scanRows == n, s"scanRows ${m.scanRows} != $n")
    assert(m.numExchanges == 1, m.toString)
    assert(m.shuffleBytes > 0, m.toString)
  }

  test("a pure projection shuffles nothing") {
    val m = Metrics.run(
      Tables.events(spark, sf).select($"event_id", $"user_id"))
    assert(m.numExchanges == 0 && m.shuffleBytes == 0, m.toString)
  }

  test("a broadcast join reports both scans but no shuffle exchange") {
    val li = Tables.lineitem(spark, sf).select($"l_orderkey", $"l_suppkey")
    val supp = Tables.supplier(spark, sf).select($"s_suppkey")
    val m = Metrics.run(
      li.join(broadcast(supp), $"l_suppkey" === $"s_suppkey"))
    val expected = li.count() + supp.count()
    assert(m.scanRows == expected, s"${m.scanRows} != $expected")
    assert(m.numExchanges == 0, m.toString)
  }
}
