package graft

import graft.ops.Snapshots

/** J3/J4 snapshot determinism, incl. the duplicate-timestamp tie-break
  * (SURVEY §7.6: the reference takes positional last; we pin event_id). */
class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, Long, String, Double)*) =
    rows.toDF("user_id", "event_id", "ts_us", "event_type", "value")

  test("latestPerKey returns exactly one row per key, tie-broken by event_id") {
    val df = ev(
      (1L, 1L, 100L, "a", 1.0), (1L, 2L, 100L, "b", 2.0), // tied timestamps
      (2L, 3L, 50L, "c", 3.0))
    val got = Snapshots.latestPerKey(df, "user_id", "ts_us", "event_id")
      .orderBy($"user_id").select($"event_id").as[Long].collect()
    assert(got.toSeq == Seq(2L, 3L)) // higher event_id wins the tie
  }

  test("asOf excludes rows after the cutoff; keys with none disappear") {
    val df = ev(
      (1L, 1L, 100L, "a", 1.0), (1L, 2L, 300L, "b", 2.0),
      (2L, 3L, 500L, "c", 3.0))
    val got = Snapshots.asOf(df, "user_id", "ts_us", "event_id", 300L)
    assert(rows(got).map(r => (r("user_id"), r("event_id"))).toSet ==
      Set((1L, 2L))) // ts=300 inclusive; user 2 has no row ≤ 300
  }

  test("asOf at exact boundary timestamp is inclusive") {
    val df = ev((1L, 1L, 300L, "a", 1.0))
    assert(Snapshots.asOf(df, "user_id", "ts_us", "event_id", 300L).count() == 1)
  }
}
