package graft

/** Round-13 batch 1 pins: HITS (q466), CountSketch (q467), NN-descent
  * (q468), log-rank (q469), isotonic PAV (q470), TextRank (q471). */
class Batch85Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q466

  test("q466: HITS — bipartite roles (hubs even/customer nodes, " +
    "authorities odd/supplier nodes) and L1 grid normalization") {
    val out = q("q466_hits_scores").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val node = r.getAs[Long]("node")
      val hub = r.getAs[Long]("hub_ppm")
      val auth = r.getAs[Long]("auth_ppm")
      assert(hub >= 0L && auth >= 0L)
      if (node % 2 == 0) assert(auth === 0L,
        s"customer node $node must have no authority score")
      else assert(hub === 0L,
        s"supplier node $node must have no hub score")
    }
    // floor-normalized L1 mass: total ≤ 1e6 and within one ulp-per-node
    val hubTot = out.map(_.getAs[Long]("hub_ppm")).sum
    val authTot = out.map(_.getAs[Long]("auth_ppm")).sum
    val nHub = out.count(_.getAs[Long]("node") % 2 == 0)
    val nAuth = out.length - nHub
    assert(hubTot <= 1000000L && hubTot >= 1000000L - nHub)
    assert(authTot <= 1000000L && authTot >= 1000000L - nAuth)
  }

  // ---------------------------------------------------------------- q467

  test("q467: CountSketch — full driver-side replay of the d=3 × w=8 " +
    "signed sketch from the raw corpus") {
    import org.apache.spark.sql.functions._
    val freq = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getAs[String]("w") -> r.getAs[Long]("count")).toMap
    def md5l(x: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(x.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      java.lang.Long.parseLong(hex, 16)
    }
    val counters = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    for ((w, f) <- freq; i <- 0L to 2L) {
      val b = md5l(s"$w#b$i") % 8
      val sgn = 1L - 2L * (md5l(s"$w#s$i") % 2)
      counters((i, b)) += sgn * f
    }
    val expected = freq.map { case (w, f) =>
      val ests = (0L to 2L).map { i =>
        val b = md5l(s"$w#b$i") % 8
        val sgn = 1L - 2L * (md5l(s"$w#s$i") % 2)
        sgn * counters((i, b))
      }
      w -> (ests.sum - ests.max - ests.min)
    }
    val out = q("q467_count_sketch").collect()
      .map(r => r.getAs[String]("word") ->
        (r.getAs[Long]("f_exact"), r.getAs[Long]("f_est"),
          r.getAs[Long]("err"))).toMap
    assert(out.keySet === freq.keySet, "one row per word type")
    expected.foreach { case (w, est) =>
      val (fx, fe, err) = out(w)
      assert(fx === freq(w), s"'$w': exact frequency")
      assert(fe === est, s"'$w': sketch estimate must match the replay")
      assert(err === math.abs(fe - fx), s"'$w': err = |est − exact|")
    }
  }

  // ---------------------------------------------------------------- q468

  test("q468: NN-descent — refinement never loses recall, lists are " +
    "ranked 1..m with non-increasing cosine") {
    val out = q("q468_nn_descent").collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (qid, rows) =>
      val byRound = rows.groupBy(_.getAs[Int]("round"))
      assert(byRound.keySet.subsetOf(Set(0, 1)))
      byRound.foreach { case (_, rr) =>
        val sorted = rr.sortBy(_.getAs[Int]("rank"))
        assert(sorted.map(_.getAs[Int]("rank")).toSeq ===
          (1 to sorted.length).toSeq)
        assert(sorted.length <= 5)
        val coss = sorted.map(_.getAs[Double]("cos"))
        assert(coss.zip(coss.tail).forall { case (a, b) => a >= b },
          s"q$qid: cosine non-increasing in rank")
      }
      // candidates ⊇ round-0 list and brute ties break identically, so
      // round-1 hits dominate round-0 hits (see Entries85 scaladoc)
      val hits0 = byRound.getOrElse(0, Array.empty[org.apache.spark.sql.Row])
        .map(_.getAs[Int]("hit")).sum
      val hits1 = byRound.getOrElse(1, Array.empty[org.apache.spark.sql.Row])
        .map(_.getAs[Int]("hit")).sum
      assert(hits1 >= hits0,
        s"q$qid: NN-descent round must not lose brute-force hits " +
          s"($hits0 -> $hits1)")
    }
  }

  // ---------------------------------------------------------------- q469

  test("q469: log-rank — two arms, integer components consistent") {
    val out = q("q469_logrank_test").collect()
    assert(out.length === 2)
    assert(out.map(_.getAs[Long]("grp")).sorted.toSeq === Seq(0L, 1L))
    val vs = out.map(_.getAs[Long]("var_ppm")).distinct
    assert(vs.length === 1, "the pooled variance is arm-independent")
    assert(vs.head > 0L)
    out.foreach { r =>
      assert(r.getAs[Long]("observed") >= 0L)
      assert(r.getAs[Long]("observed") <= r.getAs[Long]("n_users"))
      assert(r.getAs[Long]("expected_ppm") >= 0L)
    }
    // expectations partition the deaths: Σ_g E_g ≈ Σ_t d_t · 1e6, the gap
    // only the per-term floors (≤ 2 ppm-units per event time)
    val o = out.map(_.getAs[Long]("observed")).sum
    val e = out.map(_.getAs[Long]("expected_ppm")).sum
    assert(e <= o * 1000000L)
  }

  test("q469: the variance-term arithmetic — sequential floors, " +
    "overflow-free order") {
    // d=2, n=10, n0=4, n1=6: v = ((((2*8)//9)*4)//10)*6*1e6//10
    //   = ((1*4)//10)*6e6//10 = 0 — floors bite early on small counts
    assert(((((2L * 8L) / 9L) * 4L) / 10L) * 6L * 1000000L / 10L === 0L)
    // d=50, n=100, n0=40, n1=60:
    //   2500//99=25 → *40=1000 → //100=10 → *60*1e6//100 = 6e6
    assert(((((50L * 50L) / 99L) * 40L) / 100L) * 60L * 1000000L / 100L
      === 6000000L)
  }

  // ---------------------------------------------------------------- q470

  test("q470: isotonic PAV — fitted values are monotone non-decreasing " +
    "in bin and bounded by the observed mean range") {
    val out = q("q470_isotonic_pav").collect().sortBy(_.getAs[Long]("bin"))
    assert(out.nonEmpty)
    val fitted = out.map(_.getAs[Long]("fitted_ppm"))
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b },
      "PAV output must be non-decreasing")
    val means = out.map(_.getAs[Long]("mean_ppm"))
    assert(fitted.min >= means.min - 1 && fitted.max <= means.max + 1,
      "pooling cannot escape the observed mean range (±1 floor slack)")
  }

  test("q470: the max-min closed form equals sequential PAV on a hand " +
    "violator sequence") {
    // unit-weight bins with means 3,1,2 → PAV pools all three to 2
    val y = Array(3L, 1L, 2L)
    val s = y.scanLeft(0L)(_ + _) // prefix sums, s(i) = Σ y(0..i-1)
    def avgPpm(j: Int, k: Int): Long =
      (s(k + 1) - s(j)) * 1000000L / (k + 1 - j).toLong
    val fitted = y.indices.map { i =>
      (0 to i).map { j =>
        (i until y.length).map(k => avgPpm(j, k)).min
      }.max
    }
    assert(fitted === Seq(2000000L, 2000000L, 2000000L))
    // an already-isotonic sequence is a fixpoint
    val y2 = Array(1L, 2L, 5L)
    val s2 = y2.scanLeft(0L)(_ + _)
    def avg2(j: Int, k: Int): Long =
      (s2(k + 1) - s2(j)) * 1000000L / (k + 1 - j).toLong
    val fit2 = y2.indices.map { i =>
      (0 to i).map(j => (i until y2.length).map(k => avg2(j, k)).min).max
    }
    assert(fit2 === Seq(1000000L, 2000000L, 5000000L))
  }

  // ---------------------------------------------------------------- q471

  test("q471: TextRank — ranked 1..20 keywords, mass non-increasing, " +
    "every keyword is a corpus word type") {
    import org.apache.spark.sql.functions._
    val vocab = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("w"))
      .distinct().collect().map(_.getString(0)).toSet
    val out = q("q471_textrank_keywords").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === math.min(20, vocab.size))
    assert(out.map(_.getAs[Int]("rank")).toSeq === (1 to out.length).toSeq)
    val masses = out.map(_.getAs[Long]("mass"))
    assert(masses.zip(masses.tail).forall { case (a, b) => a >= b })
    assert(masses.forall(_ >= 150000L),
      "PageRank floor: every node keeps the 0.15 teleport mass")
    out.foreach(r => assert(vocab.contains(r.getAs[String]("word"))))
  }
}
