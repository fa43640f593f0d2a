package graft

import org.apache.spark.sql.functions._
import graft.ops.Snapshots

/** The custom physical as-of join (plans/AsOfJoin.scala) against the
  * union-window composition form — identical results on hand frames and on
  * real data, and the plan must contain the custom exec node. */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native exec node appears in the plan and matches hand expectations") {
    val left = Seq((1L, 100L, "l1"), (1L, 250L, "l2"), (2L, 10L, "early"))
      .toDF("user_id", "ts_us", "tag")
    val right = Seq((1L, 50L, 1.0), (1L, 100L, 2.0), (1L, 200L, 3.0), (2L, 50L, 9.0))
      .toDF("user_id", "ts_us", "v")
    val got = Snapshots.asOfJoinNative(left, right, "user_id", "ts_us", Seq("v"))
    assert(got.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val rows = got.orderBy($"user_id", $"ts_us")
      .select($"tag", $"v").collect()
    assert(rows(0).getString(0) == "l1" && rows(0).getDouble(1) == 2.0)
    assert(rows(1).getString(0) == "l2" && rows(1).getDouble(1) == 3.0)
    assert(rows(2).getString(0) == "early" && rows(2).isNullAt(1))
  }

  test("native exec: NULL key/ts rows never match (no key-0 aliasing)") {
    val left = Seq((Some(1L), Some(100L), "ok"), (None, Some(100L), "nullkey"),
      (Some(0L), Some(100L), "zerokey"), (Some(1L), None, "nullts"))
      .toDF("user_id", "ts_us", "tag")
    val right = Seq((Some(0L), Some(50L), 7.0), (Some(1L), Some(50L), 1.0),
      (None, Some(10L), 99.0))
      .toDF("user_id", "ts_us", "v")
    val got = Snapshots.asOfJoinNative(left, right, "user_id", "ts_us", Seq("v"))
      .select($"tag", $"v").collect().map(r =>
        r.getString(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got("ok") == Some(1.0))       // normal match
    assert(got("zerokey") == Some(7.0))  // key 0 matches only key 0
    assert(got("nullkey") == None)       // null key matches nothing
    assert(got("nullts") == None)        // null ts matches nothing
  }

  test("native exec rejects non-long key/ts at construction") {
    val l = Seq(("a", 1L, 1.0)).toDF("k", "ts_us", "x")
    val r = Seq(("a", 1L, 2.0)).toDF("k", "ts_us", "v")
    val e = intercept[IllegalArgumentException] {
      Snapshots.asOfJoinNative(l, r, "k", "ts_us", Seq("v"))
    }
    assert(e.getMessage.contains("LongType"))
  }

  test("native operator equals the union-window composition on real data") {
    val ev = Tables.events(spark, sf)
    val l = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us", $"event_id")
    val r = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts_us").agg(max($"value").as("r_value"))
    val native = Snapshots.asOfJoinNative(l, r, "user_id", "ts_us", Seq("r_value"))
    val composed = Snapshots.asOfJoin(l, r, "user_id", "ts_us", Seq("r_value"))
      .withColumnRenamed("r_value", "r2")
    assert(native.count() == l.count())
    val joined = native.join(composed, Seq("user_id", "ts_us", "event_id"), "full")
    assert(joined.filter(
      ($"r_value".isNull =!= $"r2".isNull) ||
      (($"r_value".isNotNull) && $"r_value" =!= $"r2")).count() == 0)
  }

  test("multi-partition correctness (keys spread over shuffle partitions)") {
    val n = 500
    val left = (0 until n).map(i => ((i % 37).toLong, (i * 1000).toLong, i.toLong))
      .toDF("user_id", "ts_us", "lid")
    val right = (0 until n).map(i => ((i % 37).toLong, (i * 777).toLong, i.toDouble))
      .toDF("user_id", "ts_us", "v")
      .groupBy($"user_id", $"ts_us").agg(max($"v").as("v"))
    val native = Snapshots.asOfJoinNative(left, right, "user_id", "ts_us", Seq("v"))
    val composed = Snapshots.asOfJoin(left, right, "user_id", "ts_us", Seq("v"))
      .withColumnRenamed("v", "v2")
    val cmp = native.join(composed, Seq("user_id", "ts_us", "lid"), "full")
    assert(native.count() == n)
    assert(cmp.filter(($"v".isNull =!= $"v2".isNull) ||
      ($"v".isNotNull && $"v" =!= $"v2")).count() == 0)
  }
}
