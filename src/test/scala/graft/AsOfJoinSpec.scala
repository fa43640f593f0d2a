package graft

import graft.ops.Snapshots

/** As-of join semantics on hand-built frames: backward match, exact-ts
  * inclusivity, no-match nulls, per-key isolation. */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def frame(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "ts_us", "tag")

  test("picks the latest right row at-or-before each left ts") {
    val left = frame((1L, 100L, "l1"), (1L, 250L, "l2"))
    val right = Seq((1L, 50L, 1.0), (1L, 100L, 2.0), (1L, 200L, 3.0))
      .toDF("user_id", "ts_us", "v")
    val got = Snapshots.asOfJoin(left, right, "user_id", "ts_us", Seq("v"))
      .orderBy($"ts_us").select($"tag", $"v").as[(String, Double)].collect()
    // left@100 matches right@100 (inclusive); left@250 matches right@200
    assert(got.toSeq == Seq(("l1", 2.0), ("l2", 3.0)))
  }

  test("left rows before any right row get null") {
    val left = frame((1L, 10L, "early"))
    val right = Seq((1L, 50L, 1.0)).toDF("user_id", "ts_us", "v")
    val got = Snapshots.asOfJoin(left, right, "user_id", "ts_us", Seq("v"))
      .select($"v").collect()
    assert(got(0).isNullAt(0))
  }

  test("matches never cross keys") {
    val left = frame((1L, 100L, "l1"))
    val right = Seq((2L, 50L, 9.0)).toDF("user_id", "ts_us", "v")
    val got = Snapshots.asOfJoin(left, right, "user_id", "ts_us", Seq("v"))
      .select($"v").collect()
    assert(got(0).isNullAt(0))
  }

  test("a matched right row with a NULL value yields NULL, not a stale value") {
    // right@100 has v=null; left@150 must see NULL (the match), not the
    // earlier non-null v=1.0 — and both carried columns must come from the
    // same right row
    val left = frame((1L, 150L, "l1"))
    val right = Seq((1L, 50L, Some(1.0), Some("a")), (1L, 100L, None, Some("b")))
      .toDF("user_id", "ts_us", "v", "s")
    val got = Snapshots.asOfJoin(left, right, "user_id", "ts_us", Seq("v", "s"))
      .select($"v", $"s").collect()(0)
    assert(got.isNullAt(0) && got.getString(1) == "b")
  }

  test("left row count is always preserved (no fan-out)") {
    val ev = Tables.events(spark, sf)
    import org.apache.spark.sql.functions._
    val l = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_us", $"event_id")
    val r = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts_us").agg(max($"value").as("v"))
    assert(Snapshots.asOfJoin(l, r, "user_id", "ts_us", Seq("v")).count() ==
      l.count())
  }
}
