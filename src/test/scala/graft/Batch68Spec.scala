package graft

import org.apache.spark.sql.functions._

/** Round-10 batch 1 pins: CUPED mean-preservation identity, BH step-up
  * internal consistency, CMH stratum/pooled accounting, McNemar cell
  * conservation, DP-release noise bound + determinism, Granger SSE
  * dominance of the nested OLS models. */
class Batch68Spec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q387: CUPED adjustment preserves the overall mean exactly " +
    "(sum n_a * mean_adj == sum y) and rho2 lies in [0,1]") {
    val out = q("q387_cuped").collect()
    assert(out.length === 2)
    val thetas = out.map(_.getAs[Double]("theta")).distinct
    assert(thetas.length === 1, "theta is pooled, must agree across arms")
    // Σ_a n_a·(ȳ_a − θ(x̄_a − x̄)) = Σy − θ·0 = Σy — the algebraic identity
    // CUPED is built on; holds to float round-off here.
    val adjTotal = out.map(r =>
      r.getAs[Long]("n_arm") * r.getAs[Double]("mean_y_adj")).sum
    val yTotal = out.map(_.getAs[Long]("sy_arm")).sum.toDouble
    assert(math.abs(adjTotal - yTotal) < 1e-6 * math.max(1.0, yTotal),
      s"adj=$adjTotal raw=$yTotal")
    out.foreach { r =>
      val rho2 = r.getAs[Double]("rho2")
      assert(rho2 >= 0.0 && rho2 <= 1.0, s"rho2=$rho2")
    }
  }

  test("q388: ranks are a permutation, chi2 is non-increasing in rank, " +
    "and the rejected set is exactly the step-up prefix") {
    val out = q("q388_bh_fdr").collect()
    val ranks = out.map(_.getAs[Int]("rk").toLong).sorted
    assert(ranks === (1L to out.length.toLong).toArray)
    val byRank = out.sortBy(_.getAs[Int]("rk"))
    byRank.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("chi2_ppm") >= b.getAs[Long]("chi2_ppm"))
      case _ =>
    }
    val kStars = out.map(_.getAs[Int]("k_star")).distinct
    assert(kStars.length === 1)
    out.foreach { r =>
      assert(r.getAs[Boolean]("rejected") ===
        (r.getAs[Int]("rk") <= kStars.head))
    }
  }

  test("q389: the ALL row is the exact column-sum of the strata, and " +
    "every count cell is non-negative") {
    val out = q("q389_cmh_pooled").collect()
    val (pooled, strata) = out.partition(_.getAs[String]("stratum") == "ALL")
    assert(pooled.length === 1 && strata.nonEmpty)
    for (c <- Seq("a", "b", "c", "d", "num_q", "den_q")) {
      assert(pooled.head.getAs[Long](c) === strata.map(_.getAs[Long](c)).sum,
        s"column $c")
    }
    strata.foreach { r =>
      Seq("a", "b", "c", "d").foreach(c => assert(r.getAs[Long](c) >= 0L))
    }
  }

  test("q390: McNemar cells conserve the pair count and the continuity-" +
    "corrected statistic never exceeds the raw one") {
    val r = q("q390_mcnemar").head()
    val cells = Seq("n11", "b", "c", "n00").map(r.getAs[Long])
    assert(cells.sum === r.getAs[Long]("n_pairs"))
    assert(r.getAs[Long]("stat_cc_ppm") <= r.getAs[Long]("stat_ppm"))
    assert(r.getAs[Long]("stat_ppm") >= 0L)
  }

  test("q391: the DP release is deterministic and each noisy count sits " +
    "within the Laplace tail bound of the true count") {
    val a = q("q391_dp_histogram").collect().sortBy(r =>
      (r.getAs[String]("region"), r.getAs[String]("priority")))
    val b = q("q391_dp_histogram").collect().sortBy(r =>
      (r.getAs[String]("region"), r.getAs[String]("priority")))
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
    // true counts, recomputed independently
    val truth = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.nation(spark, sf),
        col("c_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "o_orderpriority").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    a.foreach { r =>
      val t = truth((r.getAs[String]("region"), r.getAs[String]("priority")))
      // |Laplace(1)| from a 48-bit uniform is < ln(2^49) ≈ 34
      assert(math.abs(r.getAs[Long]("noisy_milli") - 1000L * t) <= 34000L,
        s"cell $r true=$t")
      assert(r.getAs[Double]("epsilon") === 1.0)
    }
  }

  test("q392: the full model's SSE never exceeds the restricted model's " +
    "(nested OLS), and the F statistic is non-negative") {
    val r = q("q392_granger").head()
    assert(r.getAs[Long]("n") > 10L)
    assert(r.getAs[Long]("sse_f_milli") <= r.getAs[Long]("sse_r_milli"))
    // floor() can shave one milli below zero in exact-fit corner cases
    assert(r.getAs[Long]("f_milli") >= -1L)
  }
}
