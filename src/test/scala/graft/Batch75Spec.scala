package graft

/** Round-12 batch pins: theta-sketch set-operation identities and error
  * gates (q427), unigram prune accounting (q428), nprobe-sweep
  * monotonicity (q429), and SQL-text/DataFrame agreement for the new
  * surface (q430/q431). */
class Batch75Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q427: four sets, exact counts satisfy inclusion-exclusion, and " +
    "both estimators land within the k=64 error budget on a/b/union") {
    val out = q("q427_theta_sketch").collect()
      .map(r => r.getAs[String]("set_name") -> r).toMap
    assert(out.keySet === Set("a", "b", "union", "inter"))
    def nx(s: String) = out(s).getAs[Long]("n_exact")
    // union = a + b − inter by construction of the exact class counts
    assert(nx("union") === nx("a") + nx("b") - nx("inter"))
    assert(nx("a") > 0 && nx("b") > 0 && nx("union") > 0)
    // measured gate: theta with k=64 has ~1/√64 = 12.5% relative error on
    // the sets it SAMPLES (a, b, union); 4 sigma = 50% is the loose pin
    // that still catches a formula bug (off-by-2^x scaling, swapped θ)
    Seq("a", "b", "union").foreach { s =>
      val err = out(s).getAs[Long]("theta_err_ppm")
      assert(err < 500000L, s"theta err on '$s' = $err ppm (gate 500000)")
      assert(out(s).getAs[Long]("theta_milli") > 0L)
    }
    // the theta intersection estimate must be non-negative (it is a
    // scaled count) — unlike HLL inclusion–exclusion, which may go
    // negative; that contrast is the point of the query
    assert(out("inter").getAs[Long]("theta_milli") >= 0L)
  }

  test("q427: in exact mode (n ≤ k) every theta estimate equals the true " +
    "count — the sketch degenerates to the set") {
    // the estimator formula at θ = 2^48: n·2^48·1000 DIV 2^48 = n·1000.
    // Execute the arithmetic identity the empty/small-set path relies on
    // (the query pins θ to 2^48 whenever rank k+1 is absent).
    val hSpace = java.math.BigInteger.valueOf(281474976710656L)
    (0L to 64L by 8L).foreach { n =>
      val est = java.math.BigInteger.valueOf(n)
        .multiply(hSpace).multiply(java.math.BigInteger.valueOf(1000L))
        .divide(hSpace).longValueExact()
      assert(est === n * 1000L)
    }
  }

  test("q428: prune shrinks the vocabulary, both stages report positive " +
    "code lengths, and used ≤ size") {
    val out = q("q428_unigram_prune").collect()
      .map(r => r.getAs[String]("stage") -> r).toMap
    assert(out.keySet === Set("pre", "post"))
    val pre = out("pre"); val post = out("post")
    assert(post.getAs[Long]("vocab_size") < pre.getAs[Long]("vocab_size"),
      "the prune round must remove pieces")
    Seq(pre, post).foreach { r =>
      assert(r.getAs[Long]("vocab_used") <= r.getAs[Long]("vocab_size"))
      assert(r.getAs[Long]("vocab_used") > 0L)
      assert(r.getAs[Long]("code_len_q") > 0L)
      assert(r.getAs[Long]("total_pieces") > 0L)
      assert(r.getAs[Long]("nats_q_per_word") > 0L)
    }
    // both stages segment the SAME corpus: word-instance mass is fixed
    assert(pre.getAs[Long]("total_pieces") >= 1L)
  }

  test("q429: recall and candidate cost are monotone non-decreasing in " +
    "nprobe, and possible = |queries| · k") {
    val rows = q("q429_ivf_nprobe_sweep").collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L, 8L))
    rows.foreach(r => assert(r.getAs[Long]("possible") === 100L))
    val recalls = rows.map(_.getAs[Long]("recall_milli"))
    val costs = rows.map(_.getAs[Long]("n_candidates"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as nprobe grows: ${recalls.mkString(",")}")
    assert(costs.zip(costs.tail).forall { case (a, b) => a < b },
      s"candidate cost must strictly grow with nprobe: ${costs.mkString(",")}")
    // nprobe=2 is the q168 operating point — its hits must match q168
    val q168hits = q("q168_ann_recall").collect()
      .map(_.getAs[Long]("hits")).sum
    assert(rows(1).getAs[Long]("hits") === q168hits,
      "sweep point nprobe=2 must reproduce the q168 gate measurement")
  }

  test("q430: the pure-SQL recall readout equals the DataFrame q168 " +
    "pipeline per query") {
    val sql = q("q430_sql_ivf_recall").collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("hits")).toMap
    val df = q("q168_ann_recall").collect()
      .map(r => r.getAs[Long]("q_id") -> r.getAs[Long]("hits")).toMap
    assert(sql === df,
      "SQL-text consumer of the IVF view diverged from the DataFrame form")
  }

  test("q432: the trained-centroid sweep keeps the q429 invariants " +
    "(monotone recall and cost, possible = |queries| · k)") {
    val rows = q("q432_ivf_trained_sweep").collect()
      .sortBy(_.getAs[Long]("nprobe"))
    assert(rows.map(_.getAs[Long]("nprobe")).toSeq === Seq(1L, 2L, 4L, 8L))
    rows.foreach(r => assert(r.getAs[Long]("possible") === 100L))
    val recalls = rows.map(_.getAs[Long]("recall_milli"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => a <= b },
      s"recall must not drop as nprobe grows: ${recalls.mkString(",")}")
    val costs = rows.map(_.getAs[Long]("n_candidates"))
    assert(costs.zip(costs.tail).forall { case (a, b) => a <= b },
      s"candidate cost must not drop with nprobe: ${costs.mkString(",")}")
  }

  test("q433: the weekly->monthly theta rollup is lossless (zero sample " +
    "mismatches vs the direct build) and exact-mode months estimate " +
    "exactly") {
    val rows = q("q433_theta_rollup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_mismatch") === 0L,
        s"month ${r.getAs[Long]("month")}: merged sample diverged from " +
          "the direct build — the rollup lost values")
      val theta = r.getAs[Long]("theta")
      if (theta == 281474976710656L) {
        // exact mode: the sample is the hash set; estimate == distinct
        // hashes, which md5 collisions can only shrink below n_exact
        val est = r.getAs[Long]("est_milli")
        val nx = r.getAs[Long]("n_exact")
        assert(est <= nx * 1000L && est >= (nx - 1) * 1000L)
      }
    }
  }

  test("q431: the three splits partition the corpus and token totals are " +
    "positive") {
    val rows = q("q431_sql_split_budget").collect()
    assert(rows.map(_.getAs[String]("split")).toSet ===
      Set("train", "val", "test"))
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs === Tables.documents(spark, sf).count())
    rows.foreach { r =>
      assert(r.getAs[Long]("total_tokens") >= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("total_unique") <= r.getAs[Long]("total_tokens"))
    }
  }
}
