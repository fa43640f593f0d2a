package graft

/** Round-12 continuation batch 6 pins: theta set-difference estimator
  * (q448), HDR log-linear quantile histogram (q449), ROUGE-1/2 candidate
  * overlap (q450). */
class Batch78Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q448

  test("q448: theta A-not-B — both directions present, exact counts " +
    "positive, and the direct difference estimate lands within the k=64 " +
    "sampling budget") {
    val out = q("q448_theta_anotb").collect()
    assert(out.map(_.getAs[String]("set_name")).sorted.toSeq ===
      Seq("a_not_b", "b_not_a"))
    out.foreach { r =>
      val n = r.getAs[Long]("n_exact")
      val est = r.getAs[Long]("theta_milli")
      assert(n > 0L, s"${r.getAs[String]("set_name")}: empty exact class")
      assert(est > 0L)
      // measured err_ppm at sf0.001/0.01/0.1: 65k–73k / 72k–254k /
      // 12k–88k — the k=64 sketch keeps only ~θ_d/|H|·|A\B| difference
      // samples, so the relative σ is ≈ 1/√(retained). Gate at 60%
      // (the q442 discipline: catches a θ/space unit mix-up, which
      // doubles-plus the estimate, never the estimator's real variance)
      assert(r.getAs[Long]("err_ppm") < 600000L,
        s"${r.getAs[String]("set_name")}: est $est vs exact $n")
    }
  }

  test("q448: the estimator arithmetic is exact in the sub-sample regime " +
    "(θ = |H| ⇒ estimate = n·1000, the identity the milli-grid preserves)") {
    // replicate thetaEst driver-side: n/θ·|H|·1000 with θ = |H| = 2^48
    val h = 281474976710656L
    Seq(0L, 1L, 17L, 64L).foreach { n =>
      assert((BigInt(n) * h * 1000 / h).toLong === n * 1000L)
    }
  }

  // ---------------------------------------------------------------- q449

  test("q449: HDR histogram — p50/p90/p99 rows, est ≤ exact, the 12.5% " +
    "log-linear error bound holds, and estimates are monotone in q") {
    val out = q("q449_hdr_histogram").collect()
      .sortBy(_.getAs[Long]("q_pct"))
    assert(out.map(_.getAs[Long]("q_pct")).toSeq === Seq(50L, 90L, 99L))
    out.foreach { r =>
      val est = r.getAs[Long]("est_lb")
      val exact = r.getAs[Long]("exact_v")
      assert(est <= exact, s"q${r.getAs[Long]("q_pct")}: bucket lower " +
        s"bound $est above the exact order statistic $exact")
      // value ∈ [lb, lb·9/8) ⇒ (exact−est)/exact ≤ 1/9 ≈ 111111 ppm
      assert(r.getAs[Long]("err_ppm") <= 111112L,
        s"q${r.getAs[Long]("q_pct")}: err ${r.getAs[Long]("err_ppm")} ppm " +
          "violates the structural 1/9 bound")
      assert(r.getAs[Long]("rank_r") >= 1L &&
        r.getAs[Long]("rank_r") <= r.getAs[Long]("n"))
    }
    val ests = out.map(_.getAs[Long]("est_lb"))
    assert(ests(0) <= ests(1) && ests(1) <= ests(2),
      "quantile estimates must be monotone in q")
  }

  test("q449: the log-linear bucket mapping is exact on hand values " +
    "(octave boundaries and interior points)") {
    // replicate the bucket arithmetic driver-side: e = len(bin(v))-1,
    // sub = (v - 2^e)*8 / 2^e, lb = (8+sub) << (e-3)
    def bucket(v: Long): (Int, Long, Long) = {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val sub = (v - (1L << e)) * 8 / (1L << e)
      (e, sub, (8L + sub) << (e - 3))
    }
    assert(bucket(8L) === ((3, 0L, 8L)))           // exact power of two
    assert(bucket(15L) === ((3, 7L, 15L)))         // top of the octave
    assert(bucket(16L) === ((4, 0L, 16L)))         // next octave boundary
    assert(bucket(1000L) === ((9, 7L, 960L)))      // interior: lb ≤ v
    val (_, _, lb) = bucket(1000L)
    assert(lb <= 1000L && 1000L < lb + (1L << 9) / 8 * 1)
    // bound check across a range: v always ∈ [lb, lb + 2^e/8)
    (8L to 4096L).foreach { v =>
      val (e, _, l) = bucket(v)
      assert(l <= v && v < l + math.max(1L, (1L << e) / 8),
        s"v=$v e=$e lb=$l")
    }
  }

  // ---------------------------------------------------------------- q450

  test("q450: ROUGE pairs — candidates exist, overlaps respect clipping " +
    "bounds, and F1 ppm stays in [0, 1e6]") {
    val out = q("q450_rouge_pairs").collect()
    assert(out.nonEmpty, "fixture has near-dup docs; banding must fire")
    out.foreach { r =>
      val (n1, n2) = (r.getAs[Long]("n1"), r.getAs[Long]("n2"))
      val (o1, o2) = (r.getAs[Long]("o1"), r.getAs[Long]("o2"))
      assert(n1 > 0L && n2 > 0L)
      assert(o1 >= 0L && o1 <= math.min(n1, n2),
        s"unigram clipped overlap $o1 exceeds min($n1, $n2)")
      assert(o2 >= 0L && o2 <= math.max(0L, math.min(n1, n2) - 1L),
        s"bigram clipped overlap $o2 exceeds min(n−1)")
      val f1 = r.getAs[Long]("rouge1_f_ppm")
      assert(f1 >= 0L && f1 <= 1000000L)
      // identical docs score exactly 1e6 − only−rounding; a doc pair
      // with zero shared unigrams scores exactly 0
      if (o1 === 0L) assert(f1 === 0L)
    }
  }

  test("q450: ROUGE F1 arithmetic on a hand pair — F1 = 2o/(n1+n2) " +
    "reproduces the textbook P/R harmonic mean") {
    // cand = 4 tokens, ref = 6 tokens, clipped unigram overlap = 3:
    // P = 3/4, R = 3/6 = 1/2 → F1 = 2·(3/4)·(1/2)/((3/4)+(1/2)) = 3/5
    val (o, n1, n2) = (3L, 4L, 6L)
    val p = o.toDouble / n1
    val rr = o.toDouble / n2
    val f1Classic = 2 * p * rr / (p + rr)
    val f1Integer = o * 2000000L / (n1 + n2)
    assert(math.abs(f1Classic * 1e6 - f1Integer) < 1.0)
  }
}
