package graft

/** Round-13 batch 11 pins: BWT run census (q497), Copeland fusion
  * (q498), exact 1-D Wasserstein weekly drift (q499). */
class Batch95Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q497

  test("q497: BWT runs match an independent in-memory suffix sort on " +
    "a doc sample; bounds hold corpus-wide") {
    val out = q("q497_bwt_runs").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("len"), r.getAs[Long]("n_runs"),
          r.getAs[Long]("runs_ppm"))).toMap
    assert(out.size === 500, "one row per fixture doc")
    out.foreach { case (id, (len, runs, ppm)) =>
      assert(len >= 1L && runs >= 1L && runs <= len,
        s"doc $id: runs out of [1, len]")
      assert(ppm === runs * 1000000L / len, s"doc $id: ppm identity")
    }
    // independent oracle: plain JVM suffix sort + run count (a different
    // algorithm from both the prefix-doubling chain and the DuckDB CTEs)
    val sample = Tables.documents(spark, sf)
      .select("doc_id", "text").limit(25).collect()
    assert(sample.nonEmpty)
    sample.foreach { r =>
      val id = r.getAs[Long]("doc_id"); val t = r.getAs[String]("text")
      val bwt = t.indices.sortBy(t.substring(_))
        .map(p => if (p == 0) '\u0001' else t(p - 1))
      val brute = 1 + bwt.sliding(2).count(w =>
        w.length == 2 && w(0) != w(1))
      assert(out(id)._1 === t.length.toLong, s"doc $id: len")
      assert(out(id)._2 === brute.toLong,
        s"doc $id: BWT run count differs from the in-memory suffix sort")
    }
  }

  // ---------------------------------------------------------------- q498

  test("q498: Copeland — every pair hands out one win, scores sum to " +
    "zero, rank is a permutation") {
    val out = q("q498_copeland").collect()
    assert(out.length === 50, "the Borda top-50 head")
    out.foreach { r =>
      val w = r.getAs[Long]("wins"); val l = r.getAs[Long]("losses")
      assert(w + l === 49L, "49 opponents, no pair ties possible")
      assert(r.getAs[Long]("copeland") === w - l)
    }
    assert(out.map(_.getAs[Long]("copeland")).sum === 0L,
      "every pair contributes +1/-1")
    assert(out.map(_.getAs[Int]("crank")).sorted.toSeq ===
      (1 to 50).toSeq)
    // a Condorcet winner (beats everyone) must sit at rank 1
    out.filter(_.getAs[Long]("wins") === 49L)
      .foreach(r => assert(r.getAs[Int]("crank") === 1))
  }

  // ---------------------------------------------------------------- q499

  test("q499: W1 equals the independent quantile-coupling form on " +
    "every week pair, and dominates the mean gap") {
    val out = q("q499_wasserstein_weekly").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("next_week") === r.getAs[Long]("week") + 1L)
      assert(r.getAs[Long]("w1_cents") >= r.getAs[Long]("mean_gap_cents"),
        s"week ${r.getAs[Long]("week")}: W1 below the mean shift " +
          "(violates Jensen)")
    }
    // independent derivation: W1 = ∫|F⁻¹−G⁻¹| via nB-/nA-fold
    // replication (quantile coupling) — a different formula from the
    // query's merged-support CDF sweep; both equal nA·nB·W1 in integers
    val byWeek = Tables.orders(spark, sf)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP))" +
        " DIV 604800000000 AS wkn",
        "CAST(round(o_totalprice * 100) AS BIGINT) AS x")
      .collect().groupBy(_.getAs[Long]("wkn"))
      .view.mapValues(_.map(_.getAs[Long]("x")).sorted.toVector).toMap
    out.take(40).foreach { r =>
      val (wa, wb) = (r.getAs[Long]("week"), r.getAs[Long]("next_week"))
      val (xa, xb) = (byWeek(wa), byWeek(wb))
      val (na, nb) = (xa.length, xb.length)
      val aRep = xa.flatMap(Vector.fill(nb)(_)).sorted
      val bRep = xb.flatMap(Vector.fill(na)(_)).sorted
      val num = aRep.zip(bRep).map { case (a, b) => (a - b).abs }.sum
      assert(r.getAs[Long]("w1_cents") === num / (na.toLong * nb),
        s"pair ($wa,$wb): quantile-coupling W1 differs")
      assert(r.getAs[Long]("n_a") === na.toLong &&
        r.getAs[Long]("n_b") === nb.toLong)
    }
  }
}
