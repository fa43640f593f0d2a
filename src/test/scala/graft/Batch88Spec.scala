package graft

/** Round-13 batch 4 pins: winnowing fingerprints (q478), leave-one-out
  * target encoding (q479), CUSUM changepoint alarms (q480). */
class Batch88Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q478

  test("q478: winnowing — density stays under the 2/(w+1) guarantee " +
    "(w=8 -> 222222 ppm before dedup), every doc fingerprinted") {
    val out = q("q478_winnowing_fps").collect()
    assert(out.length === 500, "one row per fixture doc")
    out.foreach { r =>
      val nfp = r.getAs[Long]("n_fp")
      val ng = r.getAs[Long]("n_grams")
      assert(nfp >= 1L && nfp <= ng)
      // 2/(w+1) is an EXPECTATION — short docs carry boundary excess
      // (the first window always contributes), so per-doc only a loose
      // sanity bound holds
      assert(r.getAs[Long]("fp_density_ppm") <= 500000L,
        s"doc ${r.getAs[Long]("doc_id")}: density far above the " +
          "winnowing expectation")
    }
    // the corpus AVERAGE is where the 2/(w+1) ≈ 222222 ppm guarantee
    // bites (dedup of repeated grams pulls it slightly under)
    val avg = out.map(_.getAs[Long]("fp_density_ppm")).sum / out.length
    assert(avg >= 180000L && avg <= 235000L,
      s"corpus mean density $avg ppm strayed from the 2/(w+1) band")
  }

  test("q478: winnowing selects the window minimum — hand window") {
    // hashes 5,3,9,1,... in a w=4 window -> min is 1; sliding one step
    // keeps 1 until it leaves scope (the local-min stability the
    // guarantee rests on)
    val w = Seq(5L, 3L, 9L, 1L)
    assert(w.min === 1L)
    assert(Seq(3L, 9L, 1L, 7L).min === 1L)
  }

  // ---------------------------------------------------------------- q479

  test("q479: LOO encoding — removing a positive lowers the cell " +
    "estimate, cells consistent") {
    val out = q("q479_loo_target_enc").collect()
    assert(out.length === 10, "5 priorities x 2 target values")
    val byCat = out.groupBy(_.getAs[String]("cat"))
    assert(byCat.size === 5)
    byCat.foreach { case (cat, rows) =>
      val e0 = rows.find(_.getAs[Int]("y") === 0).get
        .getAs[Long]("enc_ppm")
      val e1 = rows.find(_.getAs[Int]("y") === 1).get
        .getAs[Long]("enc_ppm")
      assert(e1 < e0,
        s"$cat: leaving out a positive must lower the LOO mean")
      rows.foreach(r =>
        assert(r.getAs[Long]("s_c") <= r.getAs[Long]("n_c")))
    }
  }

  test("q479: m-estimate arithmetic — hand cell") {
    // cat: n_c=5, s_c=2; global: n_g=100, s_g=30; m=20, y=0
    // enc = (2*100 + 20*30)/((5-1+20)*100) = 800/2400 -> 333333 ppm
    assert((2L * 100L + 20L * 30L) * 1000000L /
      ((5L - 1L + 20L) * 100L) === 333333L)
  }

  // ---------------------------------------------------------------- q480

  test("q480: CUSUM — alarm census consistent (sentinel iff no alarms, " +
    "non-negative excursions)") {
    val out = q("q480_cusum_alarms").collect()
    assert(out.length === 10, "one row per fixture supplier nation")
    out.foreach { r =>
      assert(r.getAs[Long]("n_weeks") > 0L)
      assert(r.getAs[Long]("max_s_plus") >= 0L)
      val alarms = r.getAs[Long]("n_alarms")
      val first = r.getAs[Long]("first_alarm_week")
      assert((alarms === 0L) === (first === -1L),
        s"nation ${r.getAs[Long]("nation")}: -1 sentinel iff zero alarms")
      if (alarms > 0L)
        assert(r.getAs[Long]("max_s_plus") >
          2L * r.getAs[Long]("drift_c"))
    }
  }

  test("q480: the closed prefix form equals the imperative CUSUM " +
    "recursion on a hand series") {
    val xs = Seq(5L, -3L, 8L, -20L, 9L, 4L) // already drift-subtracted
    // imperative: S_t = max(0, S_{t-1} + x_t)
    val imperative = xs.scanLeft(0L)((s, x) => math.max(0L, s + x)).tail
    // closed: S_t = cum_t - min(0, min_{s<=t} cum_s) — the 0 is the
    // EMPTY prefix; dropping it was a bug this test caught pre-commit
    val cums = xs.scanLeft(0L)(_ + _).tail
    val closed = cums.zipWithIndex.map { case (c, i) =>
      c - math.min(0L, cums.take(i + 1).min)
    }
    assert(imperative === closed)
  }
}
