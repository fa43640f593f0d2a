package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 2 pins: SQ8 probe coverage + self-exclusion, symmetric
  * edge counts, burstiness closed forms (metronome = −1), Simpson identity
  * on uniform mixes, Kendall τ on fully concordant toys, hazard-table
  * telescoping. */
class Batch58Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q327: one row per probe, neighbors never the probe itself, and " +
    "SQ8 top-1 recall is high at 8 bits/dim") {
    val out = q("q327_sq8_recall").collect()
    val nProbes = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 37 === 0).count()
    assert(out.length.toLong === nProbes)
    out.foreach { r =>
      assert(r.getAs[Long]("nn_sq8") !== r.getAs[Long]("p_id"))
      assert(r.getAs[Long]("nn_exact") !== r.getAs[Long]("p_id"))
      assert(r.getAs[Long]("d8") >= 0L && r.getAs[Long]("dx") >= 0L)
    }
    val hits = out.count(_.getAs[Boolean]("hit"))
    // the fixture embeddings are isotropic noise, so top-1 margins are
    // near-ties and 8-bit rounding legitimately flips some winners; the
    // pin is therefore "well above chance" (chance ~ 1/|corpus|), not
    // "near-perfect" — that would be a property of clustered data, not
    // of the operator
    assert(hits * 2 >= out.length, s"recall ${hits}/${out.length}")
  }

  test("q328: assortativity bounded, directed edge count even and " +
    "consistent with the undirected edge set") {
    val r = q("q328_assortativity").head()
    assert(math.abs(r.getAs[Long]("r_q")) <= 1000000000L)
    val nDir = r.getAs[Long]("n_directed_edges")
    assert(nDir % 2 === 0L, "each undirected edge appears twice")
    assert(nDir > 0L)
  }

  test("q329: burstiness in [-1, 1]; a metronome folds to exactly -1e9") {
    q("q329_burstiness").collect().foreach { r =>
      assert(math.abs(r.getAs[Long]("b_q")) <= 1000000000L, s"$r")
    }
    // constant gaps: sigma = 0 -> B = (0 - mu) / (0 + mu) = -1 exactly
    val n = 10.0
    val gap = 7.0
    val (s, ss) = (n * gap, n * gap * gap)
    val root = math.sqrt(n * ss - s * s)
    assert(math.floor((root - s) / (root + s) * 1e9).toLong === -1000000000L)
  }

  test("q330: simpson_k in [0, 1000) and equals the closed form on a " +
    "uniform k-type mix") {
    q("q330_simpson_diversity").collect().foreach { r =>
      val sk = r.getAs[Long]("simpson_k")
      assert(sk >= 0L && sk < 1000L, s"$r")
      assert(r.getAs[Long]("k_types") <= r.getAs[Long]("n"), s"$r")
      // single-type users must be exactly 0
      if (r.getAs[Long]("k_types") === 1L) assert(sk === 0L, s"$r")
    }
    // uniform mix of k types, c each: 1000 - 1000*k*c^2 DIV (kc)^2
    //   = 1000 - 1000 DIV k (floor)
    for (k <- 2 to 5) {
      val c = 4L
      val n = k * c
      val s2 = k * c * c
      assert(1000L - (1000L * s2) / (n * n) === 1000L - 1000L / k)
    }
  }

  test("q331: tau bounded; fully concordant cells give tau ~ 1") {
    q("q331_kendall_tau").collect().foreach { r =>
      assert(math.abs(r.getAs[Long]("tau_q")) <= 1000000000L, s"$r")
      assert(r.getAs[Long]("conc") >= 0L && r.getAs[Long]("disc") >= 0L)
    }
    // toy: 3 cells on the diagonal, counts 2/3/4, no ties across cells
    // in either margin -> tau-b = 1 up to the sqrt ulp
    val cnt = Seq(2L, 3L, 4L)
    val conc = (for (i <- 0 until 3; j <- i + 1 until 3)
      yield cnt(i) * cnt(j)).sum
    val n = cnt.sum
    val n0 = n * (n - 1) / 2
    val n1 = cnt.map(c => c * (c - 1) / 2).sum
    val tau = (conc - 0L).toDouble /
      math.sqrt((n0 - n1).toDouble * (n0 - n1).toDouble)
    assert(math.abs(tau - 1.0) < 1e-12)
  }

  test("q332: risk set telescopes to the user count and hazards are " +
    "proper fractions") {
    val out = q("q332_hazard_table").collect().sortBy(_.getAs[Long]("week"))
    val totalUsers = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    // earliest week carries the full risk set
    assert(out.head.getAs[Long]("n_risk") === totalUsers)
    assert(out.map(r => r.getAs[Long]("d_events") +
      r.getAs[Long]("c_censored")).sum === totalUsers)
    out.foreach { r =>
      assert(r.getAs[Long]("hazard_ppm") >= 0L &&
        r.getAs[Long]("hazard_ppm") <= 1000000L, s"$r")
      assert(r.getAs[Long]("d_events") <= r.getAs[Long]("n_risk"), s"$r")
    }
    // risk set is non-increasing in week
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_risk") >= b.getAs[Long]("n_risk"))
      case _ =>
    }
  }
}
