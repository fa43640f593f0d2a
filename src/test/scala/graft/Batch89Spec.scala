package graft

/** Round-13 batch 5 pins: resource-allocation link prediction (q481),
  * weekly-revenue ACF (q482), item-item co-occurrence top-3 (q483). */
class Batch89Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q481

  test("q481: RA link prediction — top-20 ordered, every term bounded " +
    "by 1/min-degree") {
    val out = q("q481_ra_linkpred").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 20)
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to 20))
    val scores = out.map(_.getAs[Long]("ra_ppm")).toSeq
    assert(scores === scores.sorted.reverse)
    out.foreach { r =>
      val nc = r.getAs[Long]("n_common")
      assert(nc >= 1L)
      // a common neighbor has degree >= 2 (it touches both endpoints),
      // so each RA term is at most 500000 ppm
      assert(r.getAs[Long]("ra_ppm") <= nc * 500000L)
      assert(r.getAs[Long]("s1") < r.getAs[Long]("s2"),
        "canonical pair orientation")
    }
  }

  test("q481: RA arithmetic — hand pair") {
    // common neighbors with degrees {2, 4}: 500000 + 250000
    assert(1000000L / 2L + 1000000L / 4L === 750000L)
  }

  // ---------------------------------------------------------------- q482

  test("q482: ACF — 6 lags per nation, overlap shrinks with lag, " +
    "r2 in range, sign well-formed") {
    val out = q("q482_acf_weekly").collect()
    val byNation = out.groupBy(_.getAs[Int]("nation"))
    assert(byNation.size === 10, "fixture supplier nations")
    byNation.foreach { case (nat, rows) =>
      assert(rows.length === 6, s"nation $nat: lags 1..6")
      // NOTE: n(lag) is NOT monotone in lag — calendar gaps in the week
      // sequence kill exactly-k-apart pairs selectively (a first cut
      // asserted monotonicity and the fixture's gaps refuted it)
      rows.foreach(r => assert(r.getAs[Long]("n") >= 1L,
        s"nation $nat: empty lag overlap should not emit a row"))
      rows.foreach { r =>
        val r2 = r.getAs[Long]("r2_ppm")
        assert(r2 === -1L || (r2 >= 0L && r2 <= 1000000L),
          s"nation $nat lag ${r.getAs[Long]("lag")}: r2 out of range")
        assert(Set(1L, -1L).contains(r.getAs[Long]("r_sign")))
      }
    }
  }

  test("q482: paired-lag Pearson arithmetic — hand series") {
    // x = (1,2,3), y = (2,4,6): perfectly correlated -> r2 = 1e6 exactly
    val (n, sx, sy, sxy, sxx, syy) = (3L, 6L, 12L, 28L, 14L, 56L)
    val num = n * sxy - sx * sy                  // 84 - 72 = 12
    val d1 = n * sxx - sx * sx                   // 42 - 36 = 6
    val d2 = n * syy - sy * sy                   // 168 - 144 = 24
    assert(num * num * 1000000L / (d1 * d2) === 1000000L)
  }

  // ---------------------------------------------------------------- q483

  test("q483: item-item — per-part ranks contiguous, cos2 bounded by " +
    "1e6, co-counts symmetric") {
    val out = q("q483_item_item_top3").collect()
    assert(out.nonEmpty)
    val co = out.map(r => (r.getAs[Long]("p1"), r.getAs[Long]("p2")) ->
      r.getAs[Long]("c12")).toMap
    out.groupBy(_.getAs[Long]("p1")).foreach { case (p1, rows) =>
      val rks = rows.map(_.getAs[Int]("rk")).sorted.toSeq
      assert(rks === (1 to rks.length), s"part $p1: ranks not contiguous")
      assert(rks.length <= 3)
    }
    out.foreach { r =>
      // c12 <= min(c1, c2) -> c12^2 <= c1*c2 -> cos2 <= 1e6
      assert(r.getAs[Long]("cos2_ppm") <= 1000000L)
      assert(r.getAs[Long]("c12") >= 1L)
      // symmetry where the mirrored pair also survived its top-3
      co.get((r.getAs[Long]("p2"), r.getAs[Long]("p1"))).foreach(m =>
        assert(m === r.getAs[Long]("c12"), "co-count must be symmetric"))
    }
  }
}
