package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 3 pins: Shapley efficiency axiom, safety-stock dominance
  * over mean demand, power-analysis monotonicity in baseline rate, SPRT
  * decision-boundary consistency, Little's-law exact rational identity,
  * newsvendor quantile bracketing. */
class Batch70Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q399: Shapley efficiency — the three phi values sum to " +
    "6*(v(N) - v(empty)) sixths, i.e. conversions with non-empty paths") {
    val out = q("q399_shapley_attribution").collect()
    assert(out.length === 3)
    val ev = Tables.events(spark, sf)
    val fp = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("fp"))
    val nonEmpty = ev.join(fp, Seq("user_id"))
      .filter(col("event_type").isin("click", "view", "signup") &&
        col("ts_us") < col("fp"))
      .select("user_id").distinct().count()
    assert(out.map(_.getAs[Long]("phi_sixths")).sum === 6L * nonEmpty,
      s"efficiency: expected 6*$nonEmpty")
    out.foreach(r => assert(r.getAs[Long]("phi_sixths") >= 0L))
  }

  test("q400: the reorder point covers at least mean lead-time demand " +
    "(z-term is non-negative) and EOQ grows with volume") {
    val out = q("q400_safety_stock").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val meanDemandMilli =
        r.getAs[Long]("sx") * r.getAs[Long]("sl") * 1000 /
          (r.getAs[Long]("nw") * r.getAs[Long]("nl") * 7)
      assert(r.getAs[Long]("rop_milli") >= meanDemandMilli - 1,
        s"rop below mean LT demand: $r")
      assert(r.getAs[Long]("eoq_milli") > 0L)
    }
    val sorted = out.sortBy(_.getAs[Long]("sx"))
    assert(sorted.head.getAs[Long]("eoq_milli") <=
      sorted.last.getAs[Long]("eoq_milli"))
  }

  test("q401: required n is positive and decreases as the baseline rate " +
    "(hence the absolute effect) grows") {
    val out = q("q401_power_analysis").collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Long]("n_per_arm") > 0L))
    // relative MDE: higher p1 → bigger absolute delta → smaller n
    val byRate = out.sortBy(r =>
      r.getAs[Long]("events").toDouble / r.getAs[Long]("trials"))
    assert(byRate.head.getAs[Long]("n_per_arm") >=
      byRate.last.getAs[Long]("n_per_arm"))
  }

  test("q402: SPRT decisions agree with the boundary arithmetic") {
    val bound = math.floor(math.log(19.0) * 1e6).toLong
    q("q402_sprt_decision").collect().foreach { r =>
      val llr = r.getAs[Long]("llr_micro")
      val want =
        if (llr >= bound) "reject_h0"
        else if (llr <= -bound) "accept_h0"
        else "continue"
      assert(r.getAs[String]("decision") === want)
      assert(r.getAs[Long]("c1") + r.getAs[Long]("c0") > 0L)
    }
  }

  test("q403: Little's law holds exactly in the quantized rationals " +
    "(l_micro == sum_lat * 1e6 DIV horizon) across priorities") {
    val out = q("q403_littles_law").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("l_micro") ===
        r.getAs[Long]("sum_lat_days") * 1000000L / r.getAs[Long]("horizon"))
      assert(r.getAs[Long]("w_milli") > 0L)
      assert(r.getAs[Long]("lambda_micro") > 0L)
    }
  }

  test("q404: the order-up-to level is an attained demand value at or " +
    "above the median") {
    val out = q("q404_newsvendor").collect()
    assert(out.nonEmpty)
    val weekly = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"),
        (graft.ops.Relational.epochUs(col("l_shipdate"))
          / lit(604800000000L)).cast("long"))
      .agg(sum(round(col("l_quantity")).cast("long")).as("x"))
      .groupBy(col("p_brand"))
      .agg(expr("percentile_approx(x, 0.5)").as("med"),
        max(col("x")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    out.foreach { r =>
      val (med, mx) = weekly(r.getAs[String]("brand"))
      val q75 = r.getAs[Long]("order_up_to")
      assert(q75 >= med, s"q75 $q75 below median $med")
      assert(q75 <= mx)
    }
  }
}
