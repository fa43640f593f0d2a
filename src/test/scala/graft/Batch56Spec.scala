package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, KllCodec}

/** Round-8 batch 6 pins: bitemporal belief semantics, MI near-zero on
  * independent axes, q-error sanity, KLL rollup = direct sketch within the
  * rank bound. */
class Batch56Spec extends SparkSpec {

  import spark.implicits._

  test("q317: belief replay on a hand-built revision history") {
    // user 1: purchase @valid 100 arrives as sys 1 (cents 10),
    // RESTATEMENT of the past @valid 90 arrives later as sys 5 (cents 7)
    val ev = Seq(
      (1L, 1L, 100L, "purchase", 0.10),
      (1L, 5L, 90L, "purchase", 0.07),
      (1L, 2L, 150L, "view", 0.0), // S=2: restatement not yet visible
      (1L, 6L, 150L, "view", 0.0), // S=6: restatement visible but OLDER
      (1L, 3L, 95L, "view", 0.0),  // T=95 < 100: nothing valid yet @S=3
      (1L, 7L, 95L, "view", 0.0))  // S=7, T=95: now the restated 90 shows
      .toDF("user_id", "event_id", "ts", "event_type", "value")
      .withColumn("ts_us", col("ts"))
    // run the same formulation inline against the toy frame
    val versions = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us").as("valid_ts"),
        col("event_id").as("sys_id"),
        round(col("value") * 100).cast("long").as("cents"))
    val probes = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us").as("t"),
        col("event_id").as("probe_id"))
    val out = probes.as("p").join(versions.as("v"),
      col("p.user_id") === col("v.user_id") &&
        col("v.valid_ts") <= col("p.t") &&
        col("v.sys_id") <= col("p.probe_id"), "left")
      .groupBy(col("p.user_id"), col("probe_id"))
      .agg(max(when(col("valid_ts").isNotNull,
        struct(col("valid_ts"), col("sys_id"), col("cents")))).as("m"))
      .select(col("probe_id"), col("m.cents"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(2L) === Some(10L)) // only sys 1 visible
    assert(out(6L) === Some(10L)) // valid 100 beats restated valid 90
    assert(out(3L) === None)      // T=95 precedes all visible valid times
    assert(out(7L) === Some(7L))  // the late restatement is the belief now
  }

  test("q318: MI terms sum to ~0 on independent axes; self-consistency") {
    val out = SparkEntry.queries("q318_mutual_info")(spark, sf).collect()
    assert(out.nonEmpty)
    val n = Tables.orders(spark, sf).count()
    assert(out.map(_.getLong(2)).sum === n)
    val mi = out.map(_.getLong(3)).sum / 1e8
    // segment and priority are generated independently: MI ≈ 0 (and MI of
    // an empirical table is ≥ 0 up to the quantization of each term)
    assert(mi >= -out.length / 1e8 * 2, s"mi=$mi")
    assert(mi < 0.05, s"independent axes should carry ~no information: $mi")
  }

  test("q319: q-error >= 1 as a rational; PK-FK edges estimate exactly") {
    val out = SparkEntry.queries("q319_qerror_report")(spark, sf).collect()
    assert(out.length === 3)
    out.foreach { r =>
      assert(r.getLong(r.fieldIndex("qerr_num")) >=
        r.getLong(r.fieldIndex("qerr_den")))
      // on clean PK-FK edges the System-R estimate is EXACT: est = act
      assert(r.getLong(r.fieldIndex("est_rows")) ===
        r.getLong(r.fieldIndex("act_rows")), r.getString(0))
    }
  }

  test("q320: rollup gate all-true; merged estimates within rank bound " +
    "of a directly-built sketch") {
    GraftFunctions.register(spark)
    val out = SparkEntry.queries("q320_kll_rollup")(spark, sf).collect()
    assert(out.length === 21)
    assert(out.forall(r => r.getBoolean(r.fieldIndex("ok"))))
    // blob path: build per-cell states locally, merge, compare to direct
    val values = Tables.lineitem(spark, sf)
      .select(col("l_linestatus"), col("l_extendedprice"))
      .collect().map(r => r.getString(0) -> r.getDouble(1))
    val byCell = values.groupBy(_._1)
    val merged = new KllCodec.State
    byCell.toSeq.sortBy(_._1).foreach { case (_, vs) =>
      val cell = new KllCodec.State
      vs.foreach(v => cell.add(v._2))
      merged.mergeIn(KllCodec.deserialize(KllCodec.serialize(cell)))
    }
    val sorted = values.map(_._2).sorted
    KllCodec.Quantiles.foreach { q =>
      val est = merged.quantiles(Array(q))(0)
      val rank = sorted.count(_ <= est).toDouble / sorted.length
      assert(math.abs(rank - q) < 0.02, s"q=$q rank=$rank")
    }
  }
}
