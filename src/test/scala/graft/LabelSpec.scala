package graft

import org.apache.spark.sql.functions._
import graft.ops.{Features, Labels}

/** J2 interval-label semantics (SURVEY.md §7.2): the horizon is STRICTLY
  * after t_ref, INCLUSIVE at t_ref + h — off-by-one here silently flips
  * labels. Also proves window and join formulations agree. */
class LabelSpec extends SparkSpec {
  import spark.implicits._

  private val H = 7 * Features.DayUs

  private def purchases(rows: (Long, Long, Long)*) =
    rows.toDF("user_id", "event_id", "ts_us")

  test("an event exactly AT t_ref does not rescue churn (strict lower bound)") {
    // two events at the same instant: neither sees the other as "future"
    val df = purchases((1L, 1L, 1000L), (2L, 2L, 1000L))
    val got = Labels.churnLabelsWindow(df, H)
      .orderBy($"event_id").select($"churn").as[Int].collect()
    assert(got.toSeq == Seq(1, 1))
  }

  test("an event exactly at t_ref + h DOES rescue churn (inclusive upper)") {
    val df = purchases((1L, 1L, 0L), (1L, 2L, H))
    val got = Labels.churnLabelsWindow(df, H)
      .orderBy($"event_id").select($"churn").as[Int].collect()
    assert(got.toSeq == Seq(0, 1)) // event 1 rescued by event 2 at exactly +h
  }

  test("an event at t_ref + h + 1µs does NOT rescue churn") {
    val df = purchases((1L, 1L, 0L), (1L, 2L, H + 1L))
    val got = Labels.churnLabelsWindow(df, H)
      .orderBy($"event_id").select($"churn").as[Int].collect()
    assert(got.toSeq == Seq(1, 1))
  }

  test("labels are per-customer: other users' events never rescue") {
    val df = purchases((1L, 1L, 0L), (2L, 2L, 1000L))
    val got = Labels.churnLabelsWindow(df, H)
      .orderBy($"event_id").select($"churn").as[Int].collect()
    assert(got.toSeq == Seq(1, 1))
  }

  test("window and range-join formulations agree on real data") {
    val p = Tables.events(spark, sf).filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_us")
    val w = Labels.churnLabelsWindow(p, H)
    val j = Labels.churnLabelsJoin(p, H)
    assert(w.count() == j.count())
    assert(w.join(j.withColumnRenamed("churn", "churn2"),
      Seq("user_id", "event_id", "ts_us"))
      .filter($"churn" =!= $"churn2").count() == 0)
  }

  test("orderedSplit: exact 80/20 prefix in (user, ts) order, integer math") {
    val df = purchases((1L to 10L).map(i => (i, i, i * 1000L)): _*)
    val got = Labels.orderedSplit(df, Seq("user_id", "ts_us", "event_id"))
    assert(got.filter($"split" === "train").count() == 8)
    assert(got.filter($"split" === "test")
      .select($"user_id").as[Long].collect().toSet == Set(9L, 10L))
  }

  test("topK tie-break: count desc, value asc") {
    val df = Seq("b", "b", "a", "a", "c").toDF("v")
    val got = Labels.topKByFreq(df, "v", 2).select($"v").as[String].collect()
    assert(got.toSeq == Seq("a", "b")) // a and b tie at 2; a wins lexicographically
  }
}
