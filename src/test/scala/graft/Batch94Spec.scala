package graft

/** Round-13 batch 10 pins: priority subset sums (q494), Zipf census
  * (q495), Gini concentration (q496). */
class Batch94Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q494

  test("q494: one sample answers all five subset queries — kept rows " +
    "partition across subsets, errors within the k=64 band") {
    val out = q("q494_priority_subsets").collect()
    assert(out.length === 5, "one row per event_type subset")
    assert(out.map(_.getAs[Long]("n_kept")).sum === 64L,
      "the k kept rows partition across the subsets")
    out.foreach { r =>
      assert(r.getAs[Long]("exact_cents") > 0L)
      // sigma ~ W/sqrt(k-1) per DLT; the loose whole-band gate
      assert(r.getAs[Long]("err_pm") >= 0L &&
        r.getAs[Long]("err_pm") <= 1000L,
        s"${r.getAs[String]("event_type")}: subset estimate strayed " +
          "beyond the whole-total band")
    }
  }

  // ---------------------------------------------------------------- q495

  test("q495: Zipf census — ranks contiguous over the vocabulary, " +
    "frequencies non-increasing, cumulative share reaches 1e6") {
    val out = q("q495_zipf_census").collect()
      .sortBy(_.getAs[Long]("rank"))
    assert(out.length === 31, "fixture vocabulary")
    assert(out.map(_.getAs[Long]("rank")).toSeq ===
      (1L to 31L))
    val freqs = out.map(_.getAs[Long]("freq")).toSeq
    assert(freqs === freqs.sorted.reverse)
    out.foreach(r => assert(r.getAs[Long]("rank_freq") ===
      r.getAs[Long]("rank") * r.getAs[Long]("freq")))
    assert(out.last.getAs[Long]("cum_share_ppm") >= 999999L,
      "the full vocabulary accounts for the whole corpus (floor may " +
        "shave 1 ppm)")
    val shares = out.map(_.getAs[Long]("cum_share_ppm")).toSeq
    assert(shares === shares.sorted)
  }

  // ---------------------------------------------------------------- q496

  test("q496: Gini — per-nation coefficients in [0, 1e6), zero only " +
    "for perfectly equal nations, hand identity") {
    val out = q("q496_gini_nations").collect()
    assert(out.length === 25, "TPC-H nations")
    out.foreach { r =>
      val g = r.getAs[Long]("gini_ppm")
      assert(g >= 0L && g < 1000000L,
        s"nation ${r.getAs[Int]("nation")}: gini out of range")
      assert(r.getAs[Long]("n") >= 1L && r.getAs[Long]("s") > 0L)
    }
    // hand identity: x = (1, 3) -> G = (2*(1*1+2*3) - 3*4)/(2*4) = 1/4
    val (n, s, ix) = (2L, 4L, 7L)
    assert((2 * ix - (n + 1) * s) * 1000000L / (n * s) === 250000L)
    // equality: x = (5, 5) -> G = 0
    assert((2 * (5L + 10L) - 3L * 10L) === 0L)
  }
}
