package graft

import org.apache.spark.sql.functions._

/** Round-8 batch 2 pins: leakage census containment, bigram-NLL positivity
  * and smoothing floor, Welch t cross-check against a direct two-pass
  * computation, blocking metrics ranges, PSI non-negativity, rolling-slope
  * brute-force window check. */
class Batch52Spec extends SparkSpec {

  test("q299: exact leaks are a subset of near leaks; counts bounded") {
    val out = SparkEntry.queries("q299_holdout_leakage")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_test"))
      val ex = r.getLong(r.fieldIndex("n_exact_leak"))
      val nr = r.getLong(r.fieldIndex("n_near_leak"))
      // identical text ⇒ identical shingle set ⇒ 100% containment, and the
      // fixture docs are all ≥ 3 words, so every exact leak is a near leak
      assert(ex <= nr, s"${r.getString(0)}: exact $ex > near $nr")
      assert(nr <= n)
    }
  }

  test("q300: NLL positive and bounded below by the smoothing floor") {
    val out = SparkEntry.queries("q300_bigram_nll")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nll = r.getDouble(r.fieldIndex("avg_nll"))
      assert(nll > 0.0, s"${r.getString(0)} nll=$nll")
      // p ≤ 1 always, and p ≥ 1/(c1+V) > e^-20 at fixture scale
      assert(nll < 20.0)
    }
  }

  test("q301: Welch t matches a direct double-precision computation") {
    val cents = Tables.events(spark, sf)
      .select(col("event_type"), round(col("value") * 100)
        .cast("long").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val by = cents.groupBy(_._1).view.mapValues(_.map(_._2.toDouble)).toMap
    def mv(xs: Array[Double]) = {
      val n = xs.length.toDouble
      val m = xs.sum / n
      (n, m, xs.map(x => (x - m) * (x - m)).sum / (n - 1))
    }
    val (n0, m0, v0) = mv(by("purchase").toArray)
    val out = SparkEntry.queries("q301_welch_t")(spark, sf).collect()
    assert(out.length === by.keys.size - 1)
    out.foreach { r =>
      val (n1, m1, v1) = mv(by(r.getString(0)).toArray)
      val se = v1 / n1 + v0 / n0
      val tExp = (m1 - m0) / math.sqrt(se)
      val dofExp = se * se /
        ((v1 / n1) * (v1 / n1) / (n1 - 1) + (v0 / n0) * (v0 / n0) / (n0 - 1))
      assert(math.abs(r.getDouble(r.fieldIndex("t_stat")) - tExp) < 1e-6)
      assert(math.abs(r.getDouble(r.fieldIndex("dof")) - dofExp)
        / dofExp < 1e-6)
    }
  }

  test("q302: metric ranges and count consistency") {
    val r = SparkEntry.queries("q302_blocking_metrics")(spark, sf).head()
    val nDocs = r.getLong(r.fieldIndex("n_docs"))
    val truth = r.getLong(r.fieldIndex("n_truth_pairs"))
    val cand = r.getLong(r.fieldIndex("n_cand_pairs"))
    val found = r.getLong(r.fieldIndex("n_found_pairs"))
    assert(nDocs > 0)
    assert(found <= truth && found <= cand)
    val pc = r.getDouble(r.fieldIndex("pair_completeness"))
    val rr = r.getDouble(r.fieldIndex("reduction_ratio"))
    assert(pc >= 0.0 && pc <= 1.0)
    // a window-2 blocker must prune almost everything
    assert(rr > 0.9 && rr <= 1.0)
  }

  test("q303: PSI terms non-negative; bands partition all orders") {
    val out = SparkEntry.queries("q303_psi_drift")(spark, sf).collect()
    assert(out.nonEmpty)
    val nOrders = Tables.orders(spark, sf).count()
    assert(out.map(r => r.getLong(1) + r.getLong(2)).sum === nOrders)
    out.foreach(r =>
      assert(r.getLong(r.fieldIndex("psi_term_q")) >= 0L,
        s"band ${r.getLong(0)}"))
  }

  test("q304: brute-force re-check of one nation's rolling windows") {
    val out = SparkEntry.queries("q304_rolling_slope")(spark, sf)
      .filter(col("nation") === 3L).collect()
      .map(r => (r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
      .sortBy(_._1)
    assert(out.nonEmpty)
    val daily = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === 3)
      .groupBy((graft.ops.Relational.epochUs(col("o_orderdate"))
        / 86400000000L).cast("long").as("day"))
      .agg(count(lit(1)).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.foreach { case (day, k, slope) =>
      val win = daily.filter { case (dy, _) => dy >= day - 27 && dy <= day }
      assert(win.size.toLong === k)
      val n = win.size.toDouble
      val sx = win.keys.sum.toDouble
      val sy = win.values.sum.toDouble
      val sxy = win.map { case (x, y) => x.toDouble * y }.sum
      val sxx = win.keys.map(x => x.toDouble * x).sum
      val den = n * sxx - sx * sx
      if (den == 0.0) assert(slope.isEmpty)
      else {
        val exp = (n * sxy - sx * sy) / den
        assert(math.abs(slope.get - exp) < 1e-9, s"day $day")
      }
    }
  }
}
