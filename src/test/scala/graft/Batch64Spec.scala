package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 8 pins: HI symmetry bound, the Hilbert-beats-Morton
  * locality claim measured, Markov eval budget accounting, threshold-sweep
  * cumulativity, burst coverage ≥ the p95 tail, grid histogram
  * conservation. */
class Batch64Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q363: HI is a proper ppm fraction over all priority pairs") {
    val out = q("q363_hist_intersect").collect()
    assert(out.length === 10) // C(5,2)
    out.foreach { r =>
      val hi = r.getAs[Long]("hi_ppm")
      assert(hi >= 0L && hi <= 1000000L, s"$r")
      assert(r.getAs[String]("g1") < r.getAs[String]("g2"), s"$r")
    }
  }

  test("q364: Hilbert total jump beats Z-order on the same cell set, " +
    "and both orders step through every cell") {
    val out = q("q364_curve_locality").collect()
      .map(r => r.getAs[String]("curve") -> r).toMap
    val h = out("hilbert")
    val z = out("zorder")
    assert(h.getAs[Long]("n_steps") === z.getAs[Long]("n_steps"))
    assert(h.getAs[Long]("total_jump") < z.getAs[Long]("total_jump"),
      s"hilbert=${h.getAs[Long]("total_jump")} " +
        s"zorder=${z.getAs[Long]("total_jump")}")
    // Morton's quadrant seam: jumps can reach across half the grid
    assert(z.getAs[Long]("max_jump") >= h.getAs[Long]("max_jump"))
  }

  test("q365: train/test transitions partition all consecutive pairs " +
    "and accuracy is a proper fraction") {
    val out = q("q365_markov_eval").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_correct") <= r.getAs[Long]("n_test"), s"$r")
      val acc = r.getAs[Long]("acc_ppm")
      assert(acc >= 0L && acc <= 1000000L, s"$r")
      // 5 uniform event types: majority accuracy should be near 1/5,
      // never past 1/2 on this corpus
      assert(acc < 500000L, s"$r")
    }
  }

  test("q366: band counts sum into the cumulative column (telescoping)") {
    val out = q("q366_threshold_sweep").collect()
      .sortBy(-_.getAs[Long]("t_ppm"))
    var cum = 0L
    out.foreach { r =>
      cum += r.getAs[Long]("pairs_in_band")
      assert(r.getAs[Long]("pairs_ge") === cum, s"$r")
      assert(r.getAs[Long]("t_ppm") >= 300000L, s"$r")
    }
  }

  test("q367: every type reports bursts covering at least its p95 tail") {
    val out = q("q367_burst_windows").collect()
    assert(out.length === 5)
    out.foreach { r =>
      assert(r.getAs[Long]("n_bursts") >= 1L, s"$r")
      assert(r.getAs[Long]("max_burst_len") <=
        r.getAs[Long]("burst_hours"), s"$r")
    }
  }

  test("q368: 16 cells conserve the fact count and deviations average " +
    "to the ppm budget") {
    val out = q("q368_grid_histogram").collect()
    assert(out.length === 16)
    val n = Tables.lineitem(spark, sf).count()
    assert(out.map(_.getAs[Long]("cnt")).sum === n)
    // Σ cnt·16e6/n over cells ≈ 16e6 (up to floor loss)
    val devSum = out.map(_.getAs[Long]("dev_ppm")).sum
    assert(devSum <= 16000000L && devSum > 16000000L - 16L * 16L,
      s"devSum=$devSum")
  }
}
