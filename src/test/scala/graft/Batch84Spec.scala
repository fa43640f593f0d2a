package graft

/** Round-12 continuation batch 12 pin: RM3 pseudo-relevance feedback
  * (q465). */
class Batch84Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q465: RM3 expansion — ≤ 3 ranked expansions per query term, " +
    "none echoing the query term itself, weights positive and monotone " +
    "in rank") {
    val out = q("q465_rm3_expansion").collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getAs[String]("qterm"))
    assert(byQ.size === 10, "one expansion set per q443 query term")
    byQ.foreach { case (qt, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ===
        (1L to sorted.length).toSeq)
      assert(sorted.length <= 3)
      sorted.foreach { r =>
        assert(r.getAs[String]("exp_term") !== qt,
          "expansion must not echo the query term")
        assert(r.getAs[Long]("w_ppm") > 0L)
      }
      assert(sorted.map(_.getAs[Long]("w_ppm")).toSeq ===
        sorted.map(_.getAs[Long]("w_ppm")).sorted.reverse,
        s"'$qt': weights must be non-increasing in rank")
    }
  }

  test("q465: the relevance-model weight arithmetic — tf/dl on the 1e-6 " +
    "grid sums per feedback doc") {
    // doc A: tf=3, dl=50; doc B: tf=1, dl=40 → w = 60000 + 25000
    assert(3L * 1000000L / 50L + 1L * 1000000L / 40L === 85000L)
  }
}
