package graft

/** Round-13 batch 6 pins: chi-square collocations (q484), expected
  * calibration error (q485), Cohen's kappa (q486). */
class Batch90Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q484

  test("q484: collocations — top-20 ordered on the emitted milli " +
    "grain, the fixture's 'dup dup' run tops the board") {
    val out = q("q484_chi2_collocations").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 20)
    val scores = out.map(_.getAs[Long]("chi2_milli")).toSeq
    assert(scores === scores.sorted.reverse)
    scores.foreach(sc => assert(sc >= 0L, "chi2 is a squared form"))
    // the corpus's only engineered collocation: the 'dup dup dup' runs
    val top = out.head
    assert(top.getAs[String]("w1") === "dup" &&
      top.getAs[String]("w2") === "dup",
      "the engineered repeat run must dominate independence testing")
  }

  test("q484: chi2 contingency arithmetic — hand table") {
    // a=8,b=2,c=2,d=88, N=100: chi2 = 100*(8*88-2*2)^2/(10*90*10*90)
    val (a, b, c, d, n) = (8L, 2L, 2L, 88L, 100L)
    val num = n * (a * d - b * c) * (a * d - b * c) * 1000L
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    assert(num / den === 60493L, "60.493 chi2 in milli")
  }

  // ---------------------------------------------------------------- q485

  test("q485: ECE — halves disjoint, gaps consistent, contribution " +
    "bounded by the gap") {
    val out = q("q485_ece_report").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val gap = r.getAs[Long]("gap_ppm")
      assert(gap === math.abs(r.getAs[Long]("acc_ppm") -
        r.getAs[Long]("conf_ppm")))
      assert(gap <= 1000000L)
      assert(r.getAs[Long]("ece_contrib_ppm") <= gap,
        "an n_b/N-weighted term cannot exceed its own gap")
      assert(r.getAs[Long]("n_train") >= 1L &&
        r.getAs[Long]("n_test") >= 1L)
    }
    // total ECE stays a fraction: sum of weighted gaps <= max gap
    val ece = out.map(_.getAs[Long]("ece_contrib_ppm")).sum
    assert(ece <= 1000000L)
  }

  // ---------------------------------------------------------------- q486

  test("q486: kappa — cells partition the corpus, marginals consistent, " +
    "the fixture's raters land below chance (negative kappa)") {
    val out = q("q486_cohens_kappa").collect()
    assert(out.length === 1)
    val r = out.head
    val (n, n11, n10, n01, n00) = (r.getAs[Long]("n"),
      r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    assert(n11 + n10 + n01 + n00 === n)
    assert(r.getAs[Long]("po_ppm") ===
      (n11 + n00) * 1000000L / n)
    assert(r.getAs[Long]("kappa_den") > 0L)
    // length and type-ratio raters disagree systematically on this
    // corpus (long docs repeat words): below-chance agreement is the
    // CORRECT reading, pinned so a rater edit can't flip it silently
    assert(r.getAs[Long]("kappa_num") < 0L)
  }

  test("q486: kappa arithmetic — perfect agreement hand table") {
    // n11=60, n00=40: po=1, pe=0.52, kappa=1 -> num = den
    val (n, n11, n10, n01, n00) = (100L, 60L, 0L, 0L, 40L)
    val pe2 = (n11 + n10) * (n11 + n01) + (n00 + n01) * (n00 + n10)
    assert(n * (n11 + n00) - pe2 === n * n - pe2 - 0L ||
      (n11 + n00) === n)
    assert(n * (n11 + n00) - pe2 === 4800L)
    assert(n * n - pe2 === 4800L, "kappa = 1 exactly")
  }
}
