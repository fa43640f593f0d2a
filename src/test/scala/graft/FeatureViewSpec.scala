package graft

import org.apache.spark.sql.functions._
import graft.ops.Features

/** Pins the reference's tricky window semantics (SURVEY.md §5.2 / §7 gotchas)
  * on hand-built frames where the expected values are computed by hand. */
class FeatureViewSpec extends SparkSpec {
  import spark.implicits._

  private val DayUs = Features.DayUs

  /** events-shaped frame builder: (user, event, ts_us, type, value, props). */
  private def ev(rows: (Long, Long, Long, String, Double, String)*) =
    rows.toDF("user_id", "event_id", "ts_us", "event_type", "value", "props")

  test("window frame is [t-w, t] inclusive on BOTH ends (closed='both')") {
    // events at t=0, t=DayUs exactly, t=DayUs+1: the 1d frame at the last
    // event must include the t=1 event (boundary +1µs) but NOT t=0.
    val df = ev(
      (1L, 1L, 0L, "purchase", 10.0, "a"),
      (1L, 2L, 1L, "purchase", 20.0, "b"),
      (1L, 3L, DayUs + 1L, "purchase", 30.0, "c"))
    val got = Features.featureView(df).orderBy($"event_id")
      .select($"txn_count_1d").as[Long].collect()
    // event 3's 1d frame = [1, DayUs+1]: includes events 2 and 3, excludes 1
    assert(got.toSeq == Seq(1L, 2L, 2L))
  }

  test("boundary event exactly at t-w IS included (closed lower end)") {
    val df = ev(
      (1L, 1L, 0L, "purchase", 10.0, "a"),
      (1L, 2L, DayUs, "purchase", 20.0, "b"))
    val got = Features.featureView(df).orderBy($"event_id")
      .select($"txn_count_1d").as[Long].collect()
    assert(got.toSeq == Seq(1L, 2L)) // frame [0, DayUs] includes both
  }

  test("ratio guards: zero-txn window yields 0-valued ratios, not null") {
    val df = ev((1L, 1L, 0L, "error", 50.0, "a")) // single cancel event
    val r = Features.featureView(df).collect()(0)
    assert(r.getAs[Double]("avg_basket_value_1d") == 0.0) // 0 / max(0,1)=0
    assert(r.getAs[Double]("cancel_rate_1d") == 1.0)      // 1 / max(1,1)=1
    assert(r.getAs[Long]("txn_count_1d") == 0L)
  }

  test("cancel events contribute 0 spend but count toward cancel_rate") {
    val df = ev(
      (1L, 1L, 0L, "purchase", 100.0, "a"),
      (1L, 2L, 1000L, "error", 999.0, "b"))
    val r = Features.featureView(df).orderBy($"event_id").collect()(1)
    assert(r.getAs[Double]("spend_1d") == 100.0)   // error's 999 excluded
    assert(r.getAs[Double]("cancel_rate_1d") == 0.5) // 1 cancel / (1+1)
  }

  test("tenure_days is floor of elapsed 86400s periods, not calendar datediff") {
    // second event is 1.5 days after the first → tenure 1 (floor), where a
    // midnight-boundary datediff could say 2.
    val df = ev(
      (1L, 1L, 0L, "purchase", 1.0, "a"),
      (1L, 2L, DayUs * 3 / 2, "purchase", 1.0, "b"))
    val got = Features.featureView(df).orderBy($"event_id")
      .select($"tenure_days").as[Long].collect()
    assert(got.toSeq == Seq(0L, 1L))
  }

  test("unique_skus is exact distinct over the frame, all event classes") {
    val df = ev(
      (1L, 1L, 0L, "purchase", 1.0, "x"),
      (1L, 2L, 10L, "error", 1.0, "x"), // same sku, cancel class still counted
      (1L, 3L, 20L, "purchase", 1.0, "y"))
    val got = Features.featureView(df).orderBy($"event_id")
      .select($"unique_skus_1d").as[Long].collect()
    assert(got.toSeq == Seq(1L, 1L, 2L))
  }

  test("duplicate (user, ts) rows are preserved (per-line grain)") {
    val df = ev(
      (1L, 1L, 100L, "purchase", 1.0, "a"),
      (1L, 2L, 100L, "purchase", 2.0, "b"))
    val out = Features.featureView(df)
    assert(out.count() == 2)
    // both rows see the full same-timestamp frame (range frame is by value)
    val counts = out.select($"txn_count_1d").as[Long].collect().toSeq
    assert(counts == Seq(2L, 2L))
  }
}
