package graft

/** Round-13 batch 3 pins: HyperBall neighborhood sketch (q475), SQL-text
  * PAV calibration twin (q476), RAKE keyphrases (q477). */
class Batch87Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q475

  test("q475: HyperBall — propagated registers equal the direct exact-" +
    "ball registers (the max-merge theorem), ball bounded by graph size") {
    val out = q("q475_hyperball").collect()
    assert(out.length === 10, "one row per fixture supplier")
    out.foreach { r =>
      assert(r.getAs[Long]("reg_sum_prop") ===
        r.getAs[Long]("reg_sum_direct"),
        s"supplier ${r.getAs[Long]("suppkey")}: two rounds of register " +
          "max-merge along edges must equal the HLL registers of the " +
          "exact radius-2 ball")
      val nb = r.getAs[Long]("n_ball")
      // the 2-ball of a supplier holds itself, its parts, and co-suppliers:
      // bounded by 1 + 200 parts + 10 suppliers at sf0.001
      assert(nb > 1L && nb <= 211L)
      // 16 registers, each 0 < rho <= 45
      assert(r.getAs[Long]("reg_sum_prop") > 0L &&
        r.getAs[Long]("reg_sum_prop") <= 16L * 45L)
    }
  }

  test("q475: rho register arithmetic — trailing-zero ladder") {
    // rho(h) = 1 + tz(h div 16): h = 16 -> h div 16 = 1 -> tz = 0 -> rho 1
    // h = 64 -> 4 -> tz = 2 -> rho 3 ; the bit trick (x & -x) - 1 popcount
    def tz(x: Long): Int = java.lang.Long.bitCount((x & -x) - 1)
    assert(tz(1L) === 0); assert(tz(4L) === 2); assert(tz(12L) === 2)
    assert(tz(1L << 40) === 40)
  }

  // ---------------------------------------------------------------- q476

  test("q476: SQL-text PAV twin matches the q470 DataFrame sibling " +
    "row-for-row") {
    val a = q("q470_isotonic_pav").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("mean_ppm"), r.getAs[Long]("fitted_ppm")))
      .sortBy(_._1)
    val b = q("q476_sql_pav_twin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("n"),
        r.getAs[Long]("mean_ppm"), r.getAs[Long]("fitted_ppm")))
      .sortBy(_._1)
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq,
      "the view-phrased SQL plan must reproduce the DataFrame output")
  }

  test("q476: fitted curve is monotone non-decreasing in bin " +
    "(the isotonic contract)") {
    val fit = q("q476_sql_pav_twin").collect()
      .map(r => (r.getAs[Long]("bin"), r.getAs[Long]("fitted_ppm")))
      .sortBy(_._1)
    fit.sliding(2).foreach {
      case Array((b1, f1), (b2, f2)) =>
        assert(f1 <= f2, s"fitted_ppm must not decrease: bin $b1 -> $b2")
      case _ =>
    }
  }

  // ---------------------------------------------------------------- q477

  test("q477: RAKE — ranks contiguous from 1, phrases stopword-free and " +
    "within the candidate cap, scores positive and ordered") {
    val out = q("q477_rake_keyphrases").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 20)
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to 20))
    val stop = Set("the", "a", "of", "and", "to", "in", "is", "on")
    out.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.length === r.getAs[Long]("plen"))
      assert(words.length <= 8, "candidate cap")
      assert(words.forall(w => !stop.contains(w)),
        "candidate phrases are maximal stopword-free runs")
      assert(r.getAs[Long]("score_ppm") > 0L)
      assert(r.getAs[Long]("n_occ") >= 1L)
    }
    val scores = out.map(_.getAs[Long]("score_ppm")).toSeq
    assert(scores === scores.sorted.reverse, "rank follows score desc")
  }

  test("q477: RAKE word-score arithmetic — deg/freq on the ppm grid") {
    // a word in phrases of lengths 3 and 5 (one occurrence each):
    // deg = 8, freq = 2 -> 4.0 -> 4000000 ppm exactly
    assert((3L + 5L) * 1000000L / 2L === 4000000L)
  }
}
