package graft

import org.apache.spark.sql.functions._

/** Bounds the approx-distinct scale path against exact counts (q43 has no
  * cross-engine oracle — HLL sketches are engine-specific). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct at rsd=0.01 is within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val both = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.01).as("approx"),
        countDistinct($"l_partkey").as("exact"))
      .select($"approx", $"exact").as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    }
  }
}
