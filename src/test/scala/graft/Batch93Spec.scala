package graft

/** Round-13 batch 9 pin: weekly priority-sample estimator (q493), the
  * batch twin of streamPriorityUpsert (restart/replay driven in
  * StreamingSpec). */
class Batch93Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q493: weekly priority samples — exhaustive weeks estimate " +
    "exactly, sampling weeks carry a live tau, estimator consistent") {
    val out = q("q493_priority_weekly").collect()
    assert(out.length === 5, "fixture event weeks")
    out.foreach { r =>
      val (tau, est, ex) = (r.getAs[Long]("tau"),
        r.getAs[Long]("est_cents"), r.getAs[Long]("exact_cents"))
      assert(r.getAs[Long]("n_kept") <= 32L)
      if (tau === 0L)
        assert(est === ex,
          s"week ${r.getAs[Long]("week")}: exhaustive sample must be " +
            "exact (every w > tau = 0 keeps its own weight)")
      else {
        assert(r.getAs[Long]("n_kept") === 32L,
          "a live tau means the sample is full")
        // DLT unbiasedness is in expectation; the per-week realization
        // stays within the loose 1000-per-mille band the q442 gate uses
        assert(r.getAs[Long]("err_pm") >= 0L &&
          r.getAs[Long]("err_pm") <= 1000L)
      }
      assert(ex > 0L, "fixture weeks all carry purchase value")
    }
  }

  test("q493: the estimator arithmetic — hand sample") {
    // kept weights (10, 50) with tau = 30: est = max(10,30)+max(50,30)
    assert(math.max(10L, 30L) + math.max(50L, 30L) === 80L)
    // priority grid: w=100 cents, ug=3 -> pq = 100*2e6/3 = 66666666
    assert(100L * 2000000L / 3L === 66666666L)
  }
}
