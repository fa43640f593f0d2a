package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 7 pins: pinball asymmetry at p90, shrinkage direction and
  * monotonicity in n, the consistent-hashing movement claim (ring ≪
  * modulo), lift-table budget accounting, MASE coherence with the two
  * WAPEs, cold-start bounds. */
class Batch63Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q357: the p90 forecast leaves ~10% of mass above (pinball " +
    "asymmetry is real) and p90 bounds are genuine values") {
    q("q357_pinball_loss").collect().foreach { r =>
      val n = r.getAs[Long]("n")
      assert(r.getAs[Long]("loss10") > 0L, s"$r")
      // at most ~10% strictly above p90 by the ceil-rank definition
      val above = Tables.orders(spark, sf)
        .filter(col("o_orderpriority") === r.getAs[String]("o_orderpriority"))
        .filter(round(col("o_totalprice") * 100).cast("long")
          > r.getAs[Long]("p90_c")).count()
      assert(above * 10 <= n, s"$above above p90 of $n")
    }
  }

  test("q358: shrinkage pulls toward the corpus mean, harder for small n") {
    val out = q("q358_eb_shrinkage").collect()
    assert(out.nonEmpty)
    // corpus mean in ppm (unweighted across parts, as the query defines)
    val mPpm = out.map(_.getAs[Long]("r_ppm")).sum / out.length
    out.foreach { r =>
      val raw = r.getAs[Long]("r_ppm")
      val sh = r.getAs[Long]("shrunk_ppm")
      // shrunk sits between raw and the mean (floor slack 1)
      assert(sh >= math.min(raw, mPpm) - 2000L &&
        sh <= math.max(raw, mPpm) + 2000L, s"$r mean=$mPpm")
    }
    // a small-n part moves a larger fraction of the way to the mean than
    // a big-n part with the same raw rate — check on the formula itself
    val strength = 50.0
    def shrunk(k: Double, n: Double) =
      (k + (mPpm / 1e6) * strength) / (n + strength)
    val small = shrunk(1, 4) // raw 0.25
    val big = shrunk(250, 1000) // raw 0.25
    assert(math.abs(small - mPpm / 1e6) < math.abs(0.25 - mPpm / 1e6))
    assert(math.abs(big - 0.25) < math.abs(small - 0.25))
  }

  test("q359: the ring moves an order of magnitude fewer keys than " +
    "modulo resharding") {
    val r = q("q359_ring_resize").head()
    val modPpm = r.getAs[Long]("mod_ppm")
    val ringPpm = r.getAs[Long]("ring_ppm")
    // modulo 8→9 moves ~8/9 of keys; the ring should move ~1/9
    assert(modPpm > 800000L, s"mod=$modPpm")
    assert(ringPpm < 400000L, s"ring=$ringPpm")
    assert(ringPpm * 2 < modPpm, s"ring=$ringPpm mod=$modPpm")
    assert(r.getAs[Long]("moved_ring") <= r.getAs[Long]("n_keys"))
  }

  test("q360: lift table conserves users and positives; capture is " +
    "monotone and ends at 1e6") {
    val out = q("q360_lift_table").collect().sortBy(_.getAs[Long]("decile"))
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(out.map(_.getAs[Long]("n_users")).sum === users)
    assert(out.last.getAs[Long]("capture_ppm") === 1000000L)
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("capture_ppm") <= b.getAs[Long]("capture_ppm"))
      case _ =>
    }
    out.foreach(r => assert(r.getAs[Long]("resp_ppm") <= 1000000L))
  }

  test("q361: MASE equals the WAPE ratio up to quantization and both " +
    "WAPEs are positive") {
    q("q361_forecast_scorecard").collect().foreach { r =>
      val w12 = r.getAs[Long]("wape12_bp")
      val w1 = r.getAs[Long]("wape1_bp")
      assert(w12 > 0L && w1 > 0L, s"$r")
      // mase = ae12/ae1 = (wape12/wape1) up to the bp floors
      val mase = r.getAs[Long]("mase_milli")
      val approx = w12.toDouble / w1.toDouble * 1000
      assert(math.abs(mase - approx) < 100, s"mase=$mase approx=$approx")
    }
  }

  test("q362: cold-start counts and revenue are bounded by their " +
    "denominators and ppm fields agree") {
    val r = q("q362_coldstart_census").head()
    assert(r.getAs[Long]("n_cold") <= r.getAs[Long]("n_post_customers"))
    assert(r.getAs[Long]("cold_rev_c") <= r.getAs[Long]("post_rev_c"))
    assert(r.getAs[Long]("cold_ppm") ===
      r.getAs[Long]("n_cold") * 1000000L / r.getAs[Long]("n_post_customers"))
    assert(r.getAs[Long]("cold_rev_ppm") ===
      r.getAs[Long]("cold_rev_c") * 1000000L / r.getAs[Long]("post_rev_c"))
  }
}
