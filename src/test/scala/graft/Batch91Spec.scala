package graft

/** Round-13 batch 7 pins: Heaps'-law census (q487), time-decayed CMS
  * (q488), personalized PageRank (q489). */
class Batch91Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  // ---------------------------------------------------------------- q487

  test("q487: Heaps census — tokens and types cumulative and " +
    "monotone, word types saturate at the fixture vocabulary") {
    val out = q("q487_heaps_census").collect()
      .sortBy(_.getAs[Long]("checkpoint"))
    assert(out.length === 5, "100-doc checkpoints over 500 docs")
    out.sliding(2).foreach {
      case Array(a, b) =>
        assert(b.getAs[Long]("n_tokens") > a.getAs[Long]("n_tokens"))
        assert(b.getAs[Long]("w_types") >= a.getAs[Long]("w_types"))
        assert(b.getAs[Long]("g_types") >= a.getAs[Long]("g_types"))
        // the type-token ratio falls as the corpus grows (Heaps beta<1)
        assert(b.getAs[Long]("gram_ttr_ppm") <=
          a.getAs[Long]("gram_ttr_ppm"))
      case _ =>
    }
    assert(out.last.getAs[Long]("w_types") === 31L,
      "the synthetic vocabulary saturates — the documented reason the " +
        "gram domain carries the curve")
    assert(out.last.getAs[Long]("g_types") >
      out.last.getAs[Long]("w_types") * 10)
  }

  // ---------------------------------------------------------------- q488

  test("q488: decayed CMS — est >= exact (floor superadditivity), " +
    "overcount ppm consistent") {
    val out = q("q488_decayed_cms").collect()
    assert(out.length === 5, "one row per event_type")
    out.foreach { r =>
      val ex = r.getAs[Long]("decayed_exact")
      val est = r.getAs[Long]("decayed_est")
      assert(ex > 0L)
      assert(est >= ex,
        s"${r.getAs[String]("event_type")}: a CMS cell aggregates its " +
          "bucket's keys, and floor(a+b) >= floor(a)+floor(b) per week")
      assert(r.getAs[Long]("over_ppm") === (est - ex) * 1000000L / ex)
    }
  }

  test("q488: aging arithmetic — halving ladder") {
    // counter 100 aged 0,1,2,3 weeks: 100, 50, 25, 12
    assert(Seq(0, 1, 2, 3).map(a => 100L / (1L << a)) ===
      Seq(100L, 50L, 25L, 12L))
    // floor superadditivity: floor(7/4)+floor(9/4) <= floor(16/4)
    assert(7L / 4L + 9L / 4L <= 16L / 4L)
  }

  // ---------------------------------------------------------------- q489

  test("q489: PPR — top-20 ordered, suppliers adjacent to BUILDING " +
    "seeds dominate, masses on the 1e6 grid") {
    val out = q("q489_personalized_pr").collect()
      .sortBy(_.getAs[Int]("rank"))
    assert(out.length === 20)
    val masses = out.map(_.getAs[Long]("mass")).toSeq
    assert(masses === masses.sorted.reverse)
    out.foreach { r =>
      assert(r.getAs[Long]("mass") > 0L)
      assert(Set("customer", "supplier")
        .contains(r.getAs[String]("kind")))
    }
    // after an ODD number of rounds from customer-side seeds on a
    // bipartite graph, spread mass sits on the supplier side; customers
    // hold only teleport mass — suppliers must lead the board
    assert(out.head.getAs[String]("kind") === "supplier")
  }

  test("q489: restart injection — a seed with zero incoming mass " +
    "still holds its teleport mass (the full-outer identity)") {
    // mirrors pprRound's arithmetic: im = 0 -> mass = 150000
    assert(150000L + 850000L * 0L / 1000000L === 150000L)
  }
}
