package graft

/** Round-12 continuation batch 9 pins: Misra–Gries rollup guarantee
  * (q457), DKW confidence bands (q458), SQL-text modularity twin (q459). */
class Batch81Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q457

  test("q457: MG rollup — ≤ k survivors, the mergeable-summary guarantee " +
    "exact ∈ [est, est+E] holds on EVERY row, and estimates never " +
    "overshoot the exact count") {
    val out = q("q457_mg_rollup").collect()
    assert(out.nonEmpty)
    assert(out.length <= 8, "re-compression must leave ≤ k = 8 survivors")
    val e = out.head.getAs[Long]("e_budget")
    assert(e >= 0L)
    out.foreach { r =>
      assert(r.getAs[Long]("e_budget") === e, "one global error budget")
      val (est, exact) = (r.getAs[Long]("est"), r.getAs[Long]("exact"))
      assert(est > 0L)
      assert(r.getAs[Long]("within_bound") === 1L,
        s"item ${r.getAs[String]("item")}: exact $exact outside " +
          s"[$est, ${est + e}] — the MG merge guarantee is broken")
      assert(est <= exact, "MG counters are always underestimates")
    }
  }

  test("q457: MG summary arithmetic on a hand week — counters are " +
    "f − t(k+1-th largest) and at most k survive") {
    // frequencies 10,7,5,3,2 with k=2: t = 3rd largest = 5 →
    // survivors (10−5)=5 and (7−5)=2; both underestimates within +t
    val fs = Seq(10L, 7L, 5L, 3L, 2L)
    val t = fs.sorted(Ordering[Long].reverse)(2)
    val survivors = fs.filter(_ > t).map(_ - t)
    assert(t === 5L && survivors === Seq(5L, 2L))
    assert(survivors.size <= 2)
    fs.filter(_ > t).zip(survivors).foreach { case (f, c) =>
      assert(c <= f && f <= c + t)
    }
  }

  // ---------------------------------------------------------------- q458

  test("q458: DKW bands — bounds bracket the point estimate, ranks are " +
    "clamped to [1, n], the band is symmetric in RANK space, and the " +
    "build-time ln(40) constant is the pinned literal") {
    val out = q("q458_dkw_band").collect().sortBy(_.getAs[Long]("q_pct"))
    assert(out.map(_.getAs[Long]("q_pct")).toSeq === Seq(50L, 90L, 99L))
    out.foreach { r =>
      val (lo, c, hi) = (r.getAs[Long]("v_lo"), r.getAs[Long]("v_center"),
        r.getAs[Long]("v_hi"))
      assert(lo <= c && c <= hi, "order statistics are monotone in rank")
      val (rLo, rr, rHi) = (r.getAs[Long]("r_lo"), r.getAs[Long]("r"),
        r.getAs[Long]("r_hi"))
      val (n, dr) = (r.getAs[Long]("n"), r.getAs[Long]("dr"))
      assert(rLo === math.max(1L, rr - dr))
      assert(rHi === math.min(n, rr + dr))
      assert(dr > 0L && dr < n, "a non-degenerate band at fixture sizes")
      // dr = ⌊√(⌊n·ln40/2·1e-12⌋)⌋ exactly
      val x = (BigInt(n) * 3688879454113L / 2000000000000L).toLong
      assert(BigInt(dr) * dr <= x && BigInt(dr + 1) * (dr + 1) > x,
        s"dr=$dr is not the exact isqrt of $x")
    }
    // the build-time constant itself (escape hatch 2: computed once in
    // this JVM, embedded as a literal in BOTH engines' SQL)
    assert(math.floor(math.log(40.0) * 1e12).toLong === 3688879454113L,
      "ln(40) grid constant drifted — both oracles embed this literal")
  }

  // ---------------------------------------------------------------- q459

  test("q459: SQL-text modularity twin matches the q456 DataFrame " +
    "sibling row-for-row") {
    val a = q("q456_modularity_report").collect()
      .map(r => (r.getAs[String]("community"), r.getAs[Long]("n_members"),
        r.getAs[Long]("e_intra"), r.getAs[Long]("d_c"),
        r.getAs[Long]("m"), r.getAs[Long]("contrib_num"))).sortBy(_._1)
    val b = q("q459_sql_modularity").collect()
      .map(r => (r.getAs[String]("community"), r.getAs[Long]("n_members"),
        r.getAs[Long]("e_intra"), r.getAs[Long]("d_c"),
        r.getAs[Long]("m"), r.getAs[Long]("contrib_num"))).sortBy(_._1)
    assert(a.nonEmpty)
    assert(a.toSeq === b.toSeq,
      "the view-inlined SQL plan must reproduce the DataFrame output")
  }
}
