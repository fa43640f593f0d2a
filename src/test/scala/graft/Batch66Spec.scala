package graft

import org.apache.spark.sql.functions._

/** Round-9 batch 10 pins: CCF bounds and lag coverage, ANOVA variance
  * partition, tail-dependence independence levels, Cliff's delta from an
  * independent pair count, odds-ratio cell conservation, QTE ordering. */
class Batch66Spec extends SparkSpec {

  import spark.implicits._

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sf)

  test("q375: 7 lags, |rho| <= 1e9, symmetric lag set present") {
    val out = q("q375_ccf").collect()
    assert(out.map(_.getAs[Long]("k")).sorted.toSeq === (-3L to 3L))
    out.foreach { r =>
      assert(math.abs(r.getAs[Long]("rho_q")) <= 1000000000L, s"$r")
      assert(r.getAs[Long]("n") > 0L)
    }
  }

  test("q376: the variance partition holds: SSA + SSB + SSAB <= SST") {
    val r = q("q376_twoway_anova").head()
    val (ssa, ssb, ssab, sst) = (r.getAs[Long]("ssa_q"),
      r.getAs[Long]("ssb_q"), r.getAs[Long]("ssab_q"),
      r.getAs[Long]("sst_q"))
    assert(ssa >= 0L && ssb >= 0L && ssab >= 0L)
    // SSE = SST - (SSA+SSB+SSAB) >= 0 up to quantization slack
    assert(ssa + ssb + ssab <= sst + 1000L,
      s"ssa=$ssa ssb=$ssb ssab=$ssab sst=$sst")
  }

  test("q377: independent columns put both tail lambdas near the " +
    "marginal tail mass (~10%)") {
    val r = q("q377_tail_dependence").head()
    for (c <- Seq("lambda_u_ppm", "lambda_l_ppm")) {
      val v = r.getAs[Long](c)
      assert(v >= 0L && v <= 1000000L, s"$c=$v")
      // independence ⇒ conditional ≈ marginal tail mass; the price p90
      // cut puts ~10% above, so expect 5%–20% with sampling noise
      assert(v > 30000L && v < 300000L, s"$c=$v")
    }
    assert(r.getAs[Long]("n_joint_u") <= r.getAs[Long]("n_yu"))
    assert(r.getAs[Long]("n_joint_l") <= r.getAs[Long]("n_yl"))
  }

  test("q378: delta matches a brute-force pair count on the fixture") {
    val r = q("q378_cliffs_delta").head()
    val users = Tables.events(spark, sf)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
        round(col("value") * 100).cast("long")).otherwise(0L)).as("spend"))
      .withColumn("arm", (col("user_id") % 2).cast("long"))
      .collect().map(x => (x.getAs[Long]("arm"), x.getAs[Long]("spend")))
    val t = users.filter(_._1 == 1L).map(_._2)
    val c = users.filter(_._1 == 0L).map(_._2)
    var (gt, lt) = (0L, 0L)
    for (a <- t; b <- c) {
      if (a > b) gt += 1 else if (a < b) lt += 1
    }
    assert(r.getAs[Long]("gt") === gt)
    assert(r.getAs[Long]("lt") === lt)
    assert(r.getAs[Long]("delta_ppm") ===
      (gt - lt) * 1000000L / (t.length.toLong * c.length))
  }

  test("q379: cells partition the user universe and the OR rational is " +
    "consistent with the rates") {
    val r = q("q379_odds_ratio").head()
    val users = Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    val cells = Seq("a", "b", "c", "d").map(r.getAs[Long](_))
    assert(cells.sum === users)
    assert(r.getAs[Long]("or_num") === r.getAs[Long]("a") * r.getAs[Long]("d"))
    assert(r.getAs[Long]("or_den") === r.getAs[Long]("b") * r.getAs[Long]("c"))
    assert(r.getAs[Long]("rate_t_ppm") <= 1000000L)
    assert(r.getAs[Long]("rate_c_ppm") <= 1000000L)
  }

  test("q380: per-arm quantiles are ordered and the QTEs are their " +
    "differences") {
    val r = q("q380_quantile_effects").head()
    for (arm <- Seq("t", "c")) {
      assert(r.getAs[Long](s"p25_$arm") <= r.getAs[Long](s"p50_$arm"))
      assert(r.getAs[Long](s"p50_$arm") <= r.getAs[Long](s"p75_$arm"))
    }
    for (p <- Seq("p25", "p50", "p75")) {
      assert(r.getAs[Long](s"qte_$p") ===
        r.getAs[Long](s"${p}_t") - r.getAs[Long](s"${p}_c"))
    }
  }
}
