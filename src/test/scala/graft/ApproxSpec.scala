package graft

import org.apache.spark.sql.functions._

/** Bounds the approx-distinct scale path against exact counts (q43 has no
  * cross-engine oracle — HLL sketches are engine-specific). */
class ApproxSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct at rsd=0.02 (the q43 setting) is within 5% of exact") {
    val li = Tables.lineitem(spark, sf)
    val both = li.groupBy($"l_returnflag")
      .agg(approx_count_distinct($"l_partkey", 0.02).as("approx"),
        countDistinct($"l_partkey").as("exact"))
      .select($"approx", $"exact").as[(Long, Long)].collect()
    assert(both.nonEmpty)
    both.foreach { case (a, e) =>
      assert(math.abs(a - e).toDouble / e < 0.05, s"approx $a vs exact $e")
    }
  }

  test("percentile_approx (accuracy 10000) is within 1% of the exact rank value") {
    val base = Tables.lineitem(spark, sf)
      .withColumn("cents", round($"l_extendedprice" * 100).cast("long"))
    val approx = base.groupBy($"l_returnflag")
      .agg(percentile_approx($"cents", lit(0.5), lit(10000)).as("a50"),
        percentile_approx($"cents", lit(0.99), lit(10000)).as("a99"))
    val exact = graft.ext.TrainPrep.groupPercentiles(
      base.withColumn("rid", monotonically_increasing_id()),
      "l_returnflag", "cents", "rid")
      .select($"l_returnflag", $"p50", $"p99")
    val joined = approx.join(exact, "l_returnflag")
      .select($"a50", $"p50", $"a99", $"p99")
      .as[(Long, Long, Long, Long)].collect()
    assert(joined.nonEmpty)
    joined.foreach { case (a50, p50, a99, p99) =>
      assert(math.abs(a50 - p50).toDouble / p50 < 0.01, s"p50 $a50 vs $p50")
      assert(math.abs(a99 - p99).toDouble / p99 < 0.01, s"p99 $a99 vs $p99")
    }
  }
}
