package graft

/** Round-13 batch 8 pins: Borda fusion (q490), Kendall tau agreement
  * (q491), Katz centrality (q492). */
class Batch92Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q490

  test("q490: Borda — top-20 ordered, scores consistent with the " +
    "component ranks, ranks within bounds") {
    val out = q("q490_borda_fusion").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 20)
    val scores = out.map(_.getAs[Long]("borda")).toSeq
    assert(scores === scores.sorted.reverse)
    val n = 500L // fixture corpus
    out.foreach { r =>
      val (r1, r2, r3) = (r.getAs[Long]("r1"), r.getAs[Long]("r2"),
        r.getAs[Long]("r3"))
      Seq(r1, r2, r3).foreach(rk => assert(rk >= 1L && rk <= n))
      assert(r.getAs[Long]("borda") === 3 * n - r1 - r2 - r3,
        "borda = sum of (N - rank) over the three rankers")
    }
  }

  // ---------------------------------------------------------------- q491

  test("q491: Kendall tau — C + D = n(n-1)/2 on the top-50 (total " +
    "orders, no ties), tau_num = C - D, hash ranker near independence") {
    val out = q("q491_kendall_tau").collect()
    assert(out.length === 3)
    out.foreach { r =>
      val (c, dd, np) = (r.getAs[Long]("concordant"),
        r.getAs[Long]("discordant"), r.getAs[Long]("n_pairs"))
      assert(np === 50L * 49L / 2L)
      assert(c + dd === np, "every pair is concordant xor discordant")
      assert(r.getAs[Long]("tau_num") === c - dd)
    }
    // the md5-hash ranker is noise: |tau| vs either content ranker
    // stays well under the correlated pair's (length vs types share
    // signal on this corpus)
    val byPair = out.map(r =>
      r.getAs[String]("ranker_pair") -> r.getAs[Long]("tau_num")).toMap
    assert(math.abs(byPair("r2~r3")) < byPair.values.map(math.abs).max
      || math.abs(byPair("r3~r1")) < byPair.values.map(math.abs).max)
  }

  test("q491: concordance arithmetic — hand pairs") {
    // rankings a=(1,2,3), b=(1,3,2): pairs (1,2),(1,3) concordant,
    // (2,3) discordant -> tau_num = 2 - 1 = 1
    val a = Map(1 -> 1, 2 -> 2, 3 -> 3); val b = Map(1 -> 1, 2 -> 3, 3 -> 2)
    val pairs = Seq((1, 2), (1, 3), (2, 3))
    val c = pairs.count { case (i, j) => (a(i) < a(j)) == (b(i) < b(j)) }
    assert(2L * c - pairs.length === 1L)
  }

  // ---------------------------------------------------------------- q492

  test("q492: Katz — degree-dominant words lead, beta floor holds, " +
    "hand-graph round arithmetic") {
    val out = q("q492_katz_centrality").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 20)
    val ks = out.map(_.getAs[Long]("katz")).toSeq
    assert(ks === ks.sorted.reverse)
    // every node holds at least the beta teleport floor after any round
    ks.foreach(k => assert(k >= 1000000L))
    // 31-type vocabulary: max in-degree 30, alpha = 1/8, 3 rounds:
    // k <= 1e6 * (1 + 30/8 + (30/8)^2 + (30/8)^3) < 7.2e7
    ks.foreach(k => assert(k <= 72000000L))
    // hand round: node with two neighbors at katz 1e6 each:
    // 1e6 + 2*floor(1e6/8) = 1250000
    assert(1000000L + 2L * (1000000L / 8L) === 1250000L)
  }
}
